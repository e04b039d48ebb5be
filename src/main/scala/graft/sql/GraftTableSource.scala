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
 * table's columns plus `_change_type` (`insert` | `upsert` |
 * `delete`; deletes carry keys with NULL value columns) and
 * `_commit_version`.
 *
 * Options:
 *  - `startingVersion` — emit changes of versions STRICTLY GREATER
 *    than it (default = the table's version when the stream starts,
 *    i.e. only new commits). `startingVersion = 0` is the
 *    BACKFILL-THEN-TAIL mode (Delta's CDF shape): the stream's FIRST
 *    batch carries the oldest readable version's full content as
 *    `insert` rows — so a consumer attaching to a long-lived (even
 *    compacted) table starts from a complete snapshot — followed by
 *    every retained delta. The usual retention contract applies to
 *    any other start: OPTIMIZE/VACUUM must not fold versions an
 *    active stream has yet to read (exactly Delta's rule; a violated
 *    stream fails loudly rather than silently skipping history).
 *  - `maxVersionsPerTrigger` — bound how many table versions one
 *    micro-batch advances (default unbounded): a consumer attaching
 *    behind a long-lived table catches up in rate-limited batches
 *    instead of one giant one. The initial snapshot is indivisible —
 *    its batch always reaches the snapshot version — and rate
 *    limiting applies to every delta batch after it.
 *
 * Every producer lands in the same feed because every writer — SQL
 * DML, MERGE, writer-API appends, [[GraftCatalogSink]] batches,
 * RESTORE — commits through the same claimed-delta protocol this
 * source tails.
 */
class GraftTableSource(sqlContext: SQLContext, path: String,
    startingVersion: Long, maxVersionsPerTrigger: Option[Long] = None)
    extends Source {

  private val sp = sqlContext.sparkSession
  private val feedSchema: StructType = GraftTables.changeFeedSchema(sp, path)

  /** Highest offset this source has handed out (resynced from the
    * checkpoint by [[getBatch]] on restart) — the rate limiter's
    * progress cursor. */
  @volatile private var lastEnd: Long = Long.MinValue

  override def schema: StructType = feedSchema

  override def getOffset: Option[V1Offset] = {
    val cur = GraftTables.currentVersion(sp, path)
    // the snapshot point: the oldest readable version, pushed past any
    // RENAME/DROP evolution (the snapshot covers the versions the feed
    // cannot express)
    val first = GraftTables.snapshotVersion(sp, path)
    // with a full-snapshot start, offset `first` is always available
    // (the snapshot itself) — even on a table with no deltas yet
    val avail = if (startingVersion == 0) math.max(cur, first) else cur
    val prev = math.max(lastEnd, startingVersion)
    val end = maxVersionsPerTrigger match {
      case Some(n) =>
        // the snapshot batch is indivisible: never offer an end below
        // the snapshot version (after it, prev >= first and the floor
        // is inert)
        val floor = if (startingVersion == 0) first else Long.MinValue
        math.min(avail, math.max(prev + n, floor))
      case None => avail
    }
    if (end <= startingVersion && startingVersion != 0) None
    else if (end < 0) None
    else { lastEnd = math.max(lastEnd, end); Some(LongOffset(end)) }
  }

  private def ver(o: V1Offset): Long = o match {
    case l: LongOffset => l.offset
    case s: SerializedOffset => LongOffset(s).offset
    case other => other.json.trim.toLong
  }

  override def getBatch(start: Option[V1Offset], end: V1Offset): DataFrame = {
    val to = ver(end)
    lastEnd = math.max(lastEnd, to) // restart resync for the rate limiter
    // `start = None` is exactly the stream's first (possibly replayed
    // but never yet committed) batch — where the snapshot belongs
    val snapshot = startingVersion == 0 && start.isEmpty
    val first = GraftTables.snapshotVersion(sp, path)
    val from = if (snapshot) first else start.map(ver).getOrElse(startingVersion)
    val changes = GraftTables.changeFeedBatch(sp, path, from, to, feedSchema)
    val df =
      if (snapshot)
        GraftTables.changeFeedSnapshot(sp, path, first, feedSchema)
          .unionByName(changes)
      else changes
    ExpressionBridge.internalStreamingDF(
      sp, df.queryExecution.toRdd, feedSchema)
  }

  override def stop(): Unit = ()

  override def toString: String =
    s"GraftTableSource[$path, startingVersion=$startingVersion" +
      maxVersionsPerTrigger.map(n => s", maxVersionsPerTrigger=$n")
        .getOrElse("") + "]"
}
