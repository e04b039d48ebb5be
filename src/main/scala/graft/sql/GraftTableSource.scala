package graft.sql

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset => V1Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.graftbridge.ExpressionBridge
import org.apache.spark.sql.types.StructType

/**
 * STREAMING READS from a graft catalog table — the outbound twin of
 * [[GraftCatalogSink]]: `spark.readStream.format("graft").load(path)`
 * turns the table's durable delta log into a CHANGE FEED. Offsets are
 * table VERSIONS; each micro-batch carries the change rows of the
 * newly committed versions, read STRAIGHT from the delta parquet (the
 * per-statement change sets are the feed — no diff joins, no corpus
 * scans; batch cost is the delta, never the table). Rows are the
 * table's columns plus `_change_type` (`upsert` | `delete`; deletes
 * carry keys with NULL value columns) and `_commit_version`.
 *
 * Options: `startingVersion` — emit changes of versions STRICTLY
 * GREATER than it (0 = the full retained log; default = the table's
 * version when the stream starts, i.e. only new commits). The usual
 * retention contract applies: OPTIMIZE/VACUUM must not fold versions
 * an active stream has yet to read (exactly Delta's rule).
 *
 * Every producer lands in the same feed because every writer — SQL
 * DML, MERGE, writer-API appends, [[GraftCatalogSink]] batches,
 * RESTORE — commits through the same claimed-delta protocol this
 * source tails.
 */
class GraftTableSource(sqlContext: SQLContext, path: String,
    startingVersion: Long) extends Source {

  private val sp = sqlContext.sparkSession
  private val feedSchema: StructType = GraftTables.changeFeedSchema(sp, path)

  override def schema: StructType = feedSchema

  override def getOffset: Option[V1Offset] = {
    val v = GraftTables.currentVersion(sp, path)
    if (v <= startingVersion) None else Some(LongOffset(v))
  }

  private def ver(o: V1Offset): Long = o match {
    case l: LongOffset => l.offset
    case s: SerializedOffset => LongOffset(s).offset
    case other => other.json.trim.toLong
  }

  override def getBatch(start: Option[V1Offset], end: V1Offset): DataFrame = {
    val from = start.map(ver).getOrElse(startingVersion)
    val df = GraftTables.changeFeedBatch(sp, path, from, ver(end), feedSchema)
    ExpressionBridge.internalStreamingDF(
      sp, df.queryExecution.toRdd, feedSchema)
  }

  override def stop(): Unit = ()

  override def toString: String =
    s"GraftTableSource[$path, startingVersion=$startingVersion]"
}
