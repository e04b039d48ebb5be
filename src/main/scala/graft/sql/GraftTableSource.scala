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
 *    than it. Absent = only commits AFTER the stream starts (and a
 *    fresh table still at version 0 yields an EMPTY first batch, not
 *    its corpus). An EXPLICIT `startingVersion = 0` is the
 *    BACKFILL-THEN-TAIL mode (Delta's CDF shape): the stream's FIRST
 *    batch carries the oldest readable version's full content as
 *    `insert` rows — so a consumer attaching to a long-lived (even
 *    compacted) table starts from a complete snapshot — followed by
 *    every retained delta. The usual retention contract applies to
 *    any other start: OPTIMIZE/VACUUM must not fold versions an
 *    active stream has yet to read (exactly Delta's rule; a violated
 *    stream fails loudly rather than silently skipping history).
 *  - `startingTimestamp` — epoch millis or a `java.sql.Timestamp`
 *    string (the same wall-clock form `TIMESTAMP AS OF` accepts):
 *    emit the changes of every version COMMITTED AT OR AFTER it,
 *    resolved against the persisted per-version commit stamps. A
 *    timestamp at or before the oldest readable commit degrades to
 *    the backfill-then-tail snapshot (the pre-history it asks for is
 *    only expressible as a snapshot); one after the newest commit
 *    tails new commits only. Mutually exclusive with
 *    `startingVersion`.
 *  - `maxVersionsPerTrigger` — bound how many table versions one
 *    micro-batch advances (default unbounded): a consumer attaching
 *    behind a long-lived table catches up in rate-limited batches
 *    instead of one giant one. The initial snapshot is indivisible —
 *    its batch always reaches the snapshot version — and rate
 *    limiting applies to every delta batch after it. Arithmetic is
 *    saturating: `Long.MaxValue` means unbounded, not overflow.
 *  - `maxBytesPerTrigger` — bound a micro-batch by the APPROXIMATE
 *    byte size of the delta files it reads (each batch still advances
 *    at least one version so the stream always progresses — Delta's
 *    soft-limit rule). Composes with `maxVersionsPerTrigger` (the
 *    tighter bound wins); the snapshot batch is indivisible here too.
 *
 * Every producer lands in the same feed because every writer — SQL
 * DML, MERGE, writer-API appends, [[GraftCatalogSink]] batches,
 * RESTORE — commits through the same claimed-delta protocol this
 * source tails.
 */
class GraftTableSource(sqlContext: SQLContext, path: String,
    startingVersion: Option[Long], maxVersionsPerTrigger: Option[Long] = None,
    maxBytesPerTrigger: Option[Long] = None)
    extends Source {

  private val sp = sqlContext.sparkSession
  private val feedSchema: StructType = GraftTables.changeFeedSchema(sp, path)

  /** Only an EXPLICIT `startingVersion = 0` backfills: a default that
    * happens to resolve to version 0 (a just-created table) must tail
    * only new commits, not replay the version-0 corpus. */
  private val backfill: Boolean = startingVersion.contains(0L)

  /** The resolved start: emit versions STRICTLY GREATER than this.
    * Resolved ONCE at source construction (the stream's start), like
    * the pre-option default always was. */
  private val startVer: Long =
    startingVersion.getOrElse(GraftTables.currentVersion(sp, path))

  /** Highest offset this source has handed out (resynced from the
    * checkpoint by [[getBatch]] on restart) — the rate limiter's
    * progress cursor. */
  @volatile private var lastEnd: Long = Long.MinValue

  override def schema: StructType = feedSchema

  /** `a + b` clamped at Long.MaxValue (both non-negative here):
    * `maxVersionsPerTrigger = Long.MaxValue` must mean "unbounded",
    * never wrap negative and stall the stream. */
  private def satAdd(a: Long, b: Long): Long =
    if (a > Long.MaxValue - b) Long.MaxValue else a + b

  /** Largest end version in `(prev, avail]` whose cumulative delta
    * bytes fit `budget` — always at least `prev + 1` (a batch must
    * advance or the stream starves; Delta's maxBytesPerTrigger is the
    * same soft limit). */
  private def byteCappedEnd(prev: Long, avail: Long, budget: Long): Long = {
    var end = prev + 1 // always take at least one version
    var spent = GraftTables.deltaBytes(sp, path, end)
    while (end < avail && {
      val next = GraftTables.deltaBytes(sp, path, end + 1)
      if (spent + next <= budget) { spent += next; true } else false
    }) end += 1
    end
  }

  override def getOffset: Option[V1Offset] = {
    val cur = GraftTables.currentVersion(sp, path)
    // the snapshot point: the oldest readable version, pushed past any
    // RENAME/DROP evolution (the snapshot covers the versions the feed
    // cannot express)
    val first = GraftTables.snapshotVersion(sp, path)
    // with a full-snapshot start, offset `first` is always available
    // (the snapshot itself) — even on a table with no deltas yet
    val avail = if (backfill) math.max(cur, first) else cur
    val prev = math.max(lastEnd, startVer)
    val verCap = maxVersionsPerTrigger.map(satAdd(prev, _))
      .getOrElse(Long.MaxValue)
    val byteCap = maxBytesPerTrigger match {
      case Some(b) if prev < avail => byteCappedEnd(prev, avail, b)
      case _ => Long.MaxValue // caught up (or unbounded) — floor below
    }
    // the snapshot batch is indivisible: never offer an end below the
    // snapshot version (after it, prev >= first and the floor is inert)
    val floor = if (backfill) first else Long.MinValue
    val end = math.min(avail, math.max(math.min(verCap, byteCap), floor))
    if (end <= startVer && !backfill) None
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
    val snapshot = backfill && start.isEmpty
    val first = GraftTables.snapshotVersion(sp, path)
    val from = if (snapshot) first else start.map(ver).getOrElse(startVer)
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
    s"GraftTableSource[$path, startingVersion=" +
      startingVersion.map(_.toString).getOrElse("latest") +
      maxVersionsPerTrigger.map(n => s", maxVersionsPerTrigger=$n")
        .getOrElse("") +
      maxBytesPerTrigger.map(n => s", maxBytesPerTrigger=$n")
        .getOrElse("") + "]"
}
