package graft.sql

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame

/**
 * EXACTLY-ONCE Structured-Streaming writer into a DURABLE graft
 * catalog table: pass [[upsertBatch]] (partially applied) to
 * `writeStream.foreachBatch`, and every micro-batch commits ONE delta
 * version to the table's on-disk log — the same change-set format,
 * optimistic claim protocol, and incremental index maintenance SQL
 * DML uses, so the stream's output is time-travelable, CDC-readable
 * (`graft_changes`), compactable (`OPTIMIZE`), and replayable from any
 * later session like any other table version.
 *
 * Exactly-once across restarts rides a per-query transaction marker
 * (`_txn_<txnId>`, Delta's txn appId/version idea): the marker
 * advances to the batch id only AFTER the delta commit completes, and
 * `foreachBatch`'s at-least-once redelivery of ids at or below it is
 * skipped. A crash BETWEEN the commit and the marker advance
 * re-delivers a batch whose change sets are pure key upserts
 * (last-write-wins), so the re-apply is a content no-op — it costs one
 * duplicate history version, never wrong data. Concurrent batch
 * writers and SQL DML statements interleave safely: every commit
 * claims its version atomically and the loser retries on top of the
 * winner ([[GraftTables.commitChange]]).
 *
 * The batch frame may carry the table's full schema or any column
 * subset that includes the key columns — missing NULLABLE columns fill
 * with NULL (the additive-evolution alignment all writers get).
 */
object GraftCatalogSink {

  private def txnMarker(path: String, txnId: String): Path = {
    val safe = txnId.map(c =>
      if (c.isLetterOrDigit || c == '-' || c == '_') c else '_')
    new Path(path, s"_txn_$safe")
  }

  /** Last batch id whose commit COMPLETED for `txnId` (Long.MinValue
    * when the stream has never committed). */
  def lastCommittedBatch(sp: org.apache.spark.sql.SparkSession,
      path: String, txnId: String): Long = {
    val p = new Path(path)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      p.toUri, sp.sparkContext.hadoopConfiguration)
    graft.MarkerFile.readLong(fs, txnMarker(path, txnId))
      .getOrElse(Long.MinValue)
  }

  /** The `foreachBatch` body: upsert `batch` into the graft table at
    * `path` as one durable delta version, exactly-once under `txnId`
    * (use a stable name per logical stream — surviving restarts — not
    * the run id). */
  def upsertBatch(path: String, txnId: String)(
      batch: DataFrame, batchId: Long): Unit = {
    val sp = batch.sparkSession
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new Path(path).toUri, sp.sparkContext.hadoopConfiguration)
    val marker = txnMarker(path, txnId)
    if (graft.MarkerFile.readLong(fs, marker).exists(batchId <= _))
      return // restart redelivery of an already-committed batch
    val schema = GraftTables.current(sp, path)._2.schema
    GraftTables.commitChange(sp, path, truncate = false, None,
      Some(GraftTables.alignTo(batch, schema)))
    graft.MarkerFile.writeLong(fs, marker, batchId)
  }
}
