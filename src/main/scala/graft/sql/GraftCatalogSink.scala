package graft.sql

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
 * Exactly-once across restarts rides a per-query transaction tag
 * (Delta's `txnAppId`/`txnVersion` idea): the (txnId, batchId) pair is
 * written INTO the version dir BEFORE the commit record, so the dedup
 * tag is ATOMIC WITH THE COMMIT — there is no crash window between
 * "the data committed" and "the marker advanced" (the r15 design had
 * exactly that window, costing a duplicate history version on
 * restart). `foreachBatch`'s at-least-once redelivery of a batch id at
 * or below the greatest committed tag is skipped, so a foreachBatch
 * body writing SEVERAL graft tables (corpus + stats) under the same
 * txnId is exactly-once into EACH: on restart, tables whose commit
 * completed skip, tables the crash interrupted apply. The tags survive
 * OPTIMIZE/VACUUM (folded history collapses into per-app floor
 * markers) and concurrent writers (every commit claims its version
 * atomically and the loser retries on top of the winner —
 * [[GraftTables.commitChange]]).
 *
 * The batch frame may carry the table's full schema or any column
 * subset that includes the key columns — missing NULLABLE columns fill
 * with NULL (the additive-evolution alignment all writers get).
 */
object GraftCatalogSink {

  /** Last batch id whose commit COMPLETED for `txnId` (Long.MinValue
    * when the stream has never committed). Authoritative: resolved
    * from the commit-atomic tags in the delta log, not from a marker
    * that could lag a crash. */
  def lastCommittedBatch(sp: org.apache.spark.sql.SparkSession,
      path: String, txnId: String): Long =
    GraftTables.lastTxnVersion(sp, path, txnId)

  /** The `foreachBatch` body: upsert `batch` into the graft table at
    * `path` as one durable delta version, exactly-once under `txnId`
    * (use a stable name per logical stream — surviving restarts — not
    * the run id). Call once per target table inside a multi-table
    * `foreachBatch` body, same `txnId`: each table dedups
    * independently against its own log. */
  def upsertBatch(path: String, txnId: String)(
      batch: DataFrame, batchId: Long): Unit = {
    val sp = batch.sparkSession
    if (GraftTables.txnAlreadyCommitted(sp, path, txnId, batchId))
      return // restart redelivery of an already-committed batch
    // the auto-evolution gate streams share with batch writers: under
    // spark.graft.schema.autoMerge, a batch carrying new columns first
    // commits an additive ADD COLUMNS schema delta
    if (GraftTables.autoMergeEnabled(sp))
      GraftTables.autoEvolveFor(sp, path, batch.schema)
    val schema = GraftTables.current(sp, path)._2.schema
    GraftTables.commitChange(sp, path, truncate = false, None,
      Some(GraftTables.alignTo(batch, schema)), txn = Some((txnId, batchId)))
  }

  /** ATOMIC multi-table `foreachBatch` body: commit `writes` — one
    * (table path, delete-key frame, upsert frame) per target — into
    * SEVERAL graft tables ALL-OR-NOTHING (one coordinator marker is
    * the single commit point; see [[GraftTables.commitTxnChange]]) and
    * exactly-once under `txnId` across restarts. Because the commit is
    * atomic, a redelivered batch either skips every table or applies
    * to every table — the corpus-plus-stats pattern with no
    * half-applied restart states at all. */
  def transactBatch(sp: org.apache.spark.sql.SparkSession,
      writes: Seq[(String, Option[DataFrame], Option[DataFrame])],
      txnId: String, batchId: Long): Unit = {
    require(writes.nonEmpty, "transactBatch needs at least one table")
    // atomicity makes one table's tag authoritative for the whole set
    if (GraftTables.txnAlreadyCommitted(sp, writes.head._1, txnId, batchId))
      return
    GraftTables.commitTxnChange(sp, writes, txn = Some((txnId, batchId)))
  }
}
