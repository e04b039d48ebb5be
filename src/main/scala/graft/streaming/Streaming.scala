package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.storage.StorageLevel

import graft.IndexedRDD
import graft.keys.KeySerializer

/**
 * Streaming surface. The reference engine has no streaming at all; its
 * closest concept is the lazy delta chain (reference
 * LazyPartition.scala:29-37), which is exactly the shape of a
 * streaming state log — here made explicit with Structured Streaming:
 *
 *  - [[windowedStats]]: event-time tumbling windows + watermark. The
 *    transform is input-agnostic: apply it to `readStream` for a live
 *    query or to a batch DataFrame for backfill — same plan, same
 *    results (tested both ways).
 *  - [[sessionize]]: custom state via `flatMapGroupsWithState` — gap
 *    sessionization per user with processing guarantees.
 *  - [[IndexedUpsertSink]]: `foreachBatch` upsert into a live
 *    [[IndexedRDD]] — every micro-batch produces a new queryable
 *    version via `multiputRDD` (one-sided shuffle of the batch only),
 *    the streaming analogue of the reference's COW update chain.
 *  - [[CheckpointedUpsertSink]]: the exactly-once restartable twin —
 *    base snapshot + per-batch delta log + commit marker under a
 *    checkpoint dir, so a killed query restores and skips redelivered
 *    batches.
 */
object Streaming {

  /** Tumbling event-time stats per event_type; `withWatermark` bounds
    * state for append-mode streams. */
  def windowedStats(events: DataFrame, windowLen: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"), col("total"))

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)
  case class Session(user_id: Long, start: Timestamp, end: Timestamp,
      n_events: Long, total_value: Double)
  case class SessionState(startMs: Long, endMs: Long, n: Long, sum: Double)

  /**
   * Gap-based sessionization: a user's session closes once an event
   * arrives more than `gapMs` after the session's last event, OR — on a
   * streaming input — once the event-time WATERMARK passes the gap
   * after its last event (`GroupStateTimeout.EventTimeTimeout`), so
   * trailing sessions flush and their state is dropped instead of
   * pinning the state store forever. On a batch input (backfill)
   * timeouts don't exist; every session closes at end-of-input
   * semantics except the per-user trailing one, which stays open
   * exactly as in a stream that has not yet crossed the watermark.
   */
  def sessionize(events: Dataset[Event], gapMs: Long = 30 * 60 * 1000L,
      watermark: String = "1 hour"): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val streaming = events.isStreaming
    val src = if (streaming) events.withWatermark("ts", watermark) else events
    src.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed last-event + gap with no new events:
            // flush the open session and DROP its state
            val s = state.get
            state.remove()
            Iterator.single(Session(userId,
              new Timestamp(s.startMs), new Timestamp(s.endMs), s.n, s.sum))
          } else {
            val sorted = batch.toSeq.sortBy(_.ts.getTime)
            var cur = state.getOption
            val closed = Seq.newBuilder[Session]
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.endMs <= gapMs =>
                  // late (out-of-order) events may extend the session
                  // backwards as well as forwards
                  cur = Some(SessionState(math.min(s.startMs, t),
                    math.max(s.endMs, t), s.n + 1, s.sum + e.value))
                case Some(s) =>
                  closed += Session(userId, new Timestamp(s.startMs), new Timestamp(s.endMs), s.n, s.sum)
                  cur = Some(SessionState(t, t, 1L, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1L, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // arm the event-time alarm (never below the current
              // watermark — a deeply late session closes next batch);
              // batch runs have no watermark and no timeouts to arm
              if (streaming) state.setTimeoutTimestamp(
                math.max(s.endMs + gapMs, state.getCurrentWatermarkMs + 1))
            }
            closed.result().iterator
          }
      }
  }

  /**
   * Streaming exact dedup for a training-data ingest path: drop rows
   * whose CONTENT was already seen within the watermark window — the
   * streaming twin of `Dedup.exactDedup`.
   * `dropDuplicatesWithinWatermark` keeps state only until the
   * watermark passes (bounded state, unlike `dropDuplicates`' forever
   * state), which is the right trade for dedup-on-ingest: a duplicate
   * arriving later than the watermark delay is let through and caught
   * by the batch dedup pass downstream.
   *
   * The dedup key is (64-bit content hash, content length), NOT the
   * hash alone: dropping a distinct document on a bare hash collision
   * is silent and unrecoverable downstream, and keying on the full
   * content would put the whole payload in the state store. The
   * composite key keeps state at 16 bytes/row while a false drop now
   * needs an xxhash64 collision between two EQUAL-LENGTH documents in
   * the same watermark window — at ~1 B rows/window the residual
   * expected collisions are ~1/37 (birthday bound on 2^64·|len
   * classes|), vs the certainty of the batch-path dedup catching true
   * duplicates the window misses.
   */
  def dedupStream(df: DataFrame, contentCol: String, tsCol: String = "ts",
      watermark: String = "1 hour"): DataFrame =
    df.withWatermark(tsCol, watermark)
      .withColumn("__h", xxhash64(col(contentCol)))
      .withColumn("__len", length(col(contentCol)))
      .dropDuplicatesWithinWatermark("__h", "__len")
      .drop("__h", "__len")

  /**
   * Stream-stream INTERVAL JOIN: pair each left event with the right
   * events of the same user arriving within `[left.ts, left.ts +
   * window]` — the attribution/conversion join (click → purchase).
   * Both sides carry watermarks and the join condition bounds the
   * event-time skew, so Structured Streaming can expire buffered rows:
   * state is O(events inside the watermark horizon), not O(stream).
   * The transform is input-agnostic (batch backfill ≡ streaming —
   * spec-tested both ways, same plan).
   *
   * `joinType = "left_outer"` additionally emits every UNMATCHED left
   * event (null right columns) — the "click with no conversion" shape.
   * On a stream the unmatched left flushes exactly once, after the
   * watermark passes `l_ts + window` (only then can the engine prove no
   * matching right event can still arrive); on a batch input the nulls
   * appear immediately. Same final row set either way.
   */
  def intervalJoin(left: DataFrame, right: DataFrame,
      keyCol: String = "user_id", window: String = "30 minutes",
      watermark: String = "1 hour", joinType: String = "inner"): DataFrame = {
    require(joinType == "inner" || joinType == "left_outer",
      s"intervalJoin supports inner / left_outer, got $joinType")
    val l = left.withWatermark("ts", watermark)
      .select(col(keyCol).as("l_key"), col("ts").as("l_ts"),
        col("event_id").as("l_event"))
    val r = right.withWatermark("ts", watermark)
      .select(col(keyCol).as("r_key"), col("ts").as("r_ts"),
        col("event_id").as("r_event"), col("value").as("r_value"))
    l.join(r, col("l_key") === col("r_key") &&
        col("r_ts") >= col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $window"), joinType)
      .select(col("l_key").as(keyCol), col("l_event"), col("r_event"),
        col("l_ts"), col("r_ts"), col("r_value"))
  }

  /**
   * foreachBatch sink maintaining a live IndexedRDD: each micro-batch
   * is upserted copy-on-write, so point lookups (`current.get`) are
   * served from the indexed snapshot while the stream keeps appending.
   * Old versions stay valid until unpersisted — time travel for free.
   */
  class IndexedUpsertSink[K: scala.reflect.ClassTag: KeySerializer,
      V: scala.reflect.ClassTag](initial: IndexedRDD[K, V],
      merge: (K, V, V) => V = null) extends Serializable {

    @volatile private var state: IndexedRDD[K, V] =
      initial.persist(StorageLevel.MEMORY_AND_DISK)

    def current: IndexedRDD[K, V] = state

    /** The function to pass to `writeStream.foreachBatch`. */
    def upsertBatch(batch: Dataset[(K, V)], batchId: Long): Unit =
      upsertRdd(batch.rdd, batchId)

    @volatile private var lastBatchId: Long = Long.MinValue

    /** RDD-shaped twin (composes with [[IndexedLookupSink]], whose
      * per-batch enrichment is already an RDD). foreachBatch is
      * at-least-once: a batch id at or below the last applied one is a
      * REPLAY and is skipped — re-applying would be harmless for plain
      * last-write-wins but double-counts under a `merge` function. */
    def upsertRdd(batch: org.apache.spark.rdd.RDD[(K, V)], batchId: Long): Unit = {
      if (batchId <= lastBatchId) return
      val prev = state
      val next =
        (if (merge == null) prev.multiputRDD(batch)
         else prev.multiputRDD[V](batch, (_, v) => v, merge))
          .persist(StorageLevel.MEMORY_AND_DISK)
      next.count() // materialize the new version before exposing it
      state = next
      lastBatchId = batchId
      prev.unpersist(blocking = false)
    }
  }

  /**
   * TIME TRAVEL: copy-on-write versions ARE the history. Each
   * micro-batch's `multiputRDD` returns a NEW index sharing structure
   * with the previous one, so retaining the last `keep` versions costs
   * ~delta memory per version — not a copy — and every retained
   * snapshot stays fully point-queryable. `asOf(b)` answers "the state
   * after the latest applied batch ≤ b": the reproducibility primitive
   * (pin the exact corpus snapshot a training run read; audit what a
   * dashboard showed at batch N). Older versions unpersist as the
   * window slides; asking for an evicted version fails loudly rather
   * than answering from the wrong snapshot.
   */
  class VersionedUpsertSink[K: scala.reflect.ClassTag: KeySerializer,
      V: scala.reflect.ClassTag](initial: IndexedRDD[K, V], keep: Int = 8)
      extends Serializable {
    require(keep >= 2, s"keep=$keep: need at least the current + one prior")

    // (batchId, state AFTER that batch); -1 = the initial snapshot
    private val hist = scala.collection.mutable.ArrayBuffer[(Long, IndexedRDD[K, V])](
      (-1L, initial.persist(StorageLevel.MEMORY_AND_DISK)))

    def current: IndexedRDD[K, V] = hist.synchronized { hist.last._2 }
    def versions: Seq[Long] = hist.synchronized { hist.map(_._1).toSeq }

    /** State after the latest applied batch ≤ `batchId`. */
    def asOf(batchId: Long): IndexedRDD[K, V] = hist.synchronized {
      hist.reverseIterator.find(_._1 <= batchId).map(_._2).getOrElse(
        throw new NoSuchElementException(
          s"no retained version <= batch $batchId (window keep=$keep slid past it)"))
    }

    /** The function to pass to `writeStream.foreachBatch`. foreachBatch
      * is at-least-once: a replayed batch id is skipped — appending it
      * again would burn a retention slot on a duplicate version and
      * evict a real one early. */
    def upsertBatch(batch: Dataset[(K, V)], batchId: Long): Unit = {
      if (hist.synchronized { batchId <= hist.last._1 }) return
      val next = current.multiputRDD(batch.rdd)
        .persist(StorageLevel.MEMORY_AND_DISK)
      next.count() // materialize before exposing
      hist.synchronized {
        hist += ((batchId, next))
        while (hist.length > keep) hist.remove(0)._2.unpersist(blocking = false)
      }
    }
  }

  /**
   * EXACTLY-ONCE RESTARTABLE upsert sink: [[IndexedUpsertSink]] whose
   * state survives a killed query. Layout under `checkpointDir`:
   *
   *  - `base/` — the initial snapshot via [[graft.IndexedRDDIO]]
   *    (partitioner included), written once at first construction
   *  - `delta_<batchId>/` — each micro-batch's pairs, written BEFORE
   *    application; the batch is then applied BY READING THE WRITTEN
   *    FILES BACK, so the live state and any later restore replay
   *    identical bytes
   *  - `_latest` — the newest APPLIED batch id, written only after the
   *    new snapshot is fully materialized: the commit point
   *
   * Crash anywhere: a delta without `_latest` advanced is garbage
   * (overwritten on redelivery); `foreachBatch`'s at-least-once
   * redelivery of batch ids at or below `_latest` is skipped — the
   * same dedup that guards in-session replays guards restarts, which
   * is exactly-once for the stored state. Restoring costs the base
   * load plus one `multiputRDD` per committed delta (each a one-sided
   * shuffle of that delta only — the corpus never reshuffles);
   * [[compact]] folds committed deltas into a fresh base so long
   * streams restart in one load.
   *
   * K and V must be java-serializable (the delta log rides object
   * files; keys additionally need their [[KeySerializer]] for the
   * base snapshot, as everywhere else).
   */
  class CheckpointedUpsertSink[K: scala.reflect.ClassTag: KeySerializer,
      V: scala.reflect.ClassTag](sc: org.apache.spark.SparkContext,
      initial: => IndexedRDD[K, V], checkpointDir: String,
      merge: (K, V, V) => V = null) extends Serializable {

    private def fs = org.apache.hadoop.fs.FileSystem.get(
      new org.apache.hadoop.fs.Path(checkpointDir).toUri,
      sc.hadoopConfiguration)
    private def latestPath = new org.apache.hadoop.fs.Path(checkpointDir, "_latest")
    private def deltaDir(id: Long) = s"$checkpointDir/delta_$id"

    /** The commit pointer, read TOLERANTLY: a torn `_latest` (crash
      * mid-rewrite) surfaces as None and the restore derives the
      * pointer from the delta files themselves — never a
      * NumberFormatException that bricks the sink. */
    private def readLatest(): Option[Long] =
      graft.MarkerFile.readLong(fs, latestPath)

    /** Atomic tmp+rename advance of the commit pointer (a crash can
      * leave the OLD value or — on rename-no-clobber stores — a brief
      * absence, never a half-written file). */
    private def writeLatest(id: Long): Unit =
      graft.MarkerFile.writeLong(fs, latestPath, id)

    private def committedDeltaIds(upTo: Long): Seq[Long] = {
      val f = fs
      val dir = new org.apache.hadoop.fs.Path(checkpointDir)
      if (!f.exists(dir)) Nil
      else f.listStatus(dir).iterator.map(_.getPath.getName)
        .filter(_.startsWith("delta_")).map(_.stripPrefix("delta_").toLong)
        .filter(_ <= upTo).toSeq.sorted
    }

    /** Delta ids whose write COMPLETED (the Hadoop committer's
      * `_SUCCESS` landed) — the fallback source of truth for the
      * commit pointer when `_latest` is torn: a complete delta at id n
      * means batch n was delivered in full, and replaying it equals
      * the at-least-once redelivery that would otherwise rewrite and
      * apply identical bytes. */
    private def completeDeltaIds(): Seq[Long] = {
      val f = fs
      val dir = new org.apache.hadoop.fs.Path(checkpointDir)
      if (!f.exists(dir)) Nil
      else f.listStatus(dir).iterator.map(_.getPath.getName)
        .filter(_.startsWith("delta_")).map(_.stripPrefix("delta_").toLong)
        .filter(id => f.exists(new org.apache.hadoop.fs.Path(
          deltaDir(id), "_SUCCESS")))
        .toSeq.sorted
    }

    private def applyDelta(st: IndexedRDD[K, V], id: Long): IndexedRDD[K, V] = {
      val pairs = sc.objectFile[(K, V)](deltaDir(id))
      if (merge == null) st.multiputRDD(pairs)
      else st.multiputRDD[V](pairs, (_, v) => v, merge)
    }

    /** Newest batch id the BASE SAVE already contains (written into
      * the base dir by [[compact]] before the swap): restore replays
      * only deltas beyond it, so a crash between the swap and the
      * delta cleanup cannot double-apply a folded batch under a
      * `merge` function. */
    private def baseUpto(): Long = graft.MarkerFile.readLong(fs,
      new org.apache.hadoop.fs.Path(s"$checkpointDir/base", "_upto"))
      .getOrElse(Long.MinValue)

    /** Crash recovery for [[compact]]'s swap: a complete `.base_next`
      * with the base missing promotes into place; leftovers drop. */
    private def recoverBase(): Unit = {
      val f = fs
      val basePath = new org.apache.hadoop.fs.Path(s"$checkpointDir/base")
      val next = new org.apache.hadoop.fs.Path(s"$checkpointDir/.base_next")
      val marker = new org.apache.hadoop.fs.Path(basePath, "_partitioner")
      if (!f.exists(marker) &&
          f.exists(new org.apache.hadoop.fs.Path(next, "_partitioner"))) {
        f.delete(basePath, true)
        require(f.rename(next, basePath), "checkpoint base recovery failed")
      }
      f.delete(next, true)
      f.delete(new org.apache.hadoop.fs.Path(s"$checkpointDir/.base_old"), true)
      ()
    }

    @volatile private var lastBatchId: Long = Long.MinValue
    @volatile private var state: IndexedRDD[K, V] = {
      recoverBase()
      val baseMarker = new org.apache.hadoop.fs.Path(
        s"$checkpointDir/base", "_partitioner")
      if (!fs.exists(baseMarker)) {
        // TRUE first construction (no base on disk): seed and persist
        // the base BEFORE any delta can commit, so a restore always
        // has its floor. Keyed on the base's existence, NOT `_latest`:
        // a restart with a base but a torn/unwritten pointer must
        // restore, never re-seed over the durable state.
        val base = initial.persist(StorageLevel.MEMORY_AND_DISK)
        graft.IndexedRDDIO.save(base, s"$checkpointDir/base")
        base
      } else {
        val latest = readLatest()
          .orElse(completeDeltaIds().lastOption).getOrElse(Long.MinValue)
        lastBatchId = latest
        val upto = baseUpto()
        var st = graft.IndexedRDDIO.load[K, V](sc, s"$checkpointDir/base")
        if (latest != Long.MinValue)
          committedDeltaIds(latest).filter(_ > upto)
            .foreach(id => st = applyDelta(st, id))
        val restored = st.persist(StorageLevel.MEMORY_AND_DISK)
        restored.count()
        restored
      }
    }

    def current: IndexedRDD[K, V] = state
    def lastCommittedBatch: Long = lastBatchId

    /** The function to pass to `writeStream.foreachBatch`. */
    def upsertBatch(batch: Dataset[(K, V)], batchId: Long): Unit =
      upsertRdd(batch.rdd, batchId)

    def upsertRdd(batch: org.apache.spark.rdd.RDD[(K, V)],
        batchId: Long): Unit = {
      if (batchId <= lastBatchId) return // replay or restart redelivery
      val dir = deltaDir(batchId)
      fs.delete(new org.apache.hadoop.fs.Path(dir), true) // crash leftovers
      batch.saveAsObjectFile(dir)
      val prev = state
      val next = applyDelta(prev, batchId)
        .persist(StorageLevel.MEMORY_AND_DISK)
      next.count() // materialize fully before the commit point
      writeLatest(batchId)
      state = next
      lastBatchId = batchId
      prev.unpersist(blocking = false)
    }

    /** Fold every committed delta into a fresh base save and drop the
      * delta files — the next restore pays ONE load. Safe at any
      * point between batches, and crash-safe at any step: the new
      * base writes complete into `.base_next` (carrying an `_upto`
      * fence = the folded batch id) before a two-rename swap, restore
      * promotes a stranded `.base_next`, and the fence stops a
      * crash-between-swap-and-cleanup from double-applying folded
      * deltas. The LIVE state rebinds to a load of the new base so
      * its lineage stops referencing the deleted delta files —
      * Spark's recompute-on-eviction contract stays intact. */
    def compact(): Unit = {
      val f = fs
      val next = new org.apache.hadoop.fs.Path(s"$checkpointDir/.base_next")
      f.delete(next, true)
      graft.IndexedRDDIO.save(state, next.toString)
      graft.MarkerFile.writeLong(f,
        new org.apache.hadoop.fs.Path(next, "_upto"), lastBatchId)
      val basePath = new org.apache.hadoop.fs.Path(s"$checkpointDir/base")
      val old = new org.apache.hadoop.fs.Path(s"$checkpointDir/.base_old")
      f.delete(old, true)
      require(f.rename(basePath, old), "checkpoint compaction swap-out failed")
      require(f.rename(next, basePath), "checkpoint compaction swap-in failed")
      f.delete(old, true)
      committedDeltaIds(lastBatchId).foreach(id =>
        f.delete(new org.apache.hadoop.fs.Path(deltaDir(id)), true))
      val prev = state
      val reloaded = graft.IndexedRDDIO.load[K, V](sc, s"$checkpointDir/base")
        .persist(StorageLevel.MEMORY_AND_DISK)
      reloaded.count()
      state = reloaded
      prev.unpersist(blocking = false)
    }
  }

  /** Convenience: start a stream of (K, V) upserts into a versioned sink. */
  def versionedStream[K: scala.reflect.ClassTag: KeySerializer,
      V: scala.reflect.ClassTag](pairs: Dataset[(K, V)],
      sink: VersionedUpsertSink[K, V], queryName: String)(
      implicit spark: SparkSession): org.apache.spark.sql.streaming.StreamingQuery =
    pairs.writeStream
      .queryName(queryName)
      .outputMode(OutputMode.Update)
      .foreachBatch((b: Dataset[(K, V)], id: Long) => sink.upsertBatch(b, id))
      .start()

  /**
   * CDC sink: [[IndexedUpsertSink]] plus a CHANGELOG — before each
   * batch upserts, the old values of exactly the touched keys are
   * probed via [[IndexedRDD.lookupJoinLeft]] (O(batch) point reads;
   * the state is never scanned), and (key, batchId) → (old, new) rows
   * land copy-on-write in a SECOND live index keyed by the
   * (key, batch) pair. Both the current state and the full change
   * history stay point-queryable while the stream runs — the
   * downstream-consumer shape (cache invalidation, audit, incremental
   * view maintenance) where each batch's cost is the batch, never the
   * history.
   */
  class IndexedChangelogSink[K: scala.reflect.ClassTag, V: scala.reflect.ClassTag](
      initial: IndexedRDD[K, V], logPartitions: Int = 16)(
      implicit kSer: KeySerializer[K], pairSer: KeySerializer[(K, Long)])
      extends Serializable {

    private val out = new IndexedUpsertSink[K, V](initial)
    @volatile private var log: IndexedRDD[(K, Long), (Option[V], V)] =
      IndexedRDD(initial.sparkContext
        .emptyRDD[((K, Long), (Option[V], V))]
        .partitionBy(new org.apache.spark.HashPartitioner(logPartitions)))
        .persist(StorageLevel.MEMORY_AND_DISK)

    def current: IndexedRDD[K, V] = out.current
    def changelog: IndexedRDD[(K, Long), (Option[V], V)] = log

    @volatile private var lastBatchId: Long = Long.MinValue

    /** The function to pass to `writeStream.foreachBatch`. foreachBatch
      * is at-least-once: a REPLAYED batch is skipped outright — probing
      * state that already contains the batch's own writes would record
      * (new, new) and permanently lose the true old values. */
    def upsertBatch(batch: Dataset[(K, V)], batchId: Long): Unit = {
      if (batchId <= lastBatchId) return
      // dedupe in-batch key collisions ONCE and feed BOTH the changelog
      // and the state from the same pinned winner set: two independent
      // last-write-wins shuffles could otherwise pick different winners,
      // and the changelog would no longer replay to the state
      val rows = batch.rdd.reduceByKey((_, b) => b)
        .persist(StorageLevel.MEMORY_AND_DISK)
      rows.count() // pin the winners before either consumer runs
      val delta = out.current.lookupJoinLeft(rows) { (k, old, v) =>
        ((k, batchId), (old, v))
      }
      val prevLog = log
      val nextLog = prevLog.multiputRDD(delta)
        .persist(StorageLevel.MEMORY_AND_DISK)
      nextLog.count() // materialize before exposing / before state moves
      log = nextLog
      prevLog.unpersist(blocking = false)
      out.upsertRdd(rows, batchId)
      lastBatchId = batchId
      rows.unpersist(blocking = false)
    }
  }

  /** Convenience: start a stream of (K, V) upserts into a changelog sink. */
  def changelogStream[K, V](pairs: Dataset[(K, V)],
      sink: IndexedChangelogSink[K, V], queryName: String)(
      implicit spark: SparkSession): org.apache.spark.sql.streaming.StreamingQuery =
    pairs.writeStream
      .queryName(queryName)
      .outputMode(OutputMode.Update)
      .foreachBatch((b: Dataset[(K, V)], id: Long) => sink.upsertBatch(b, id))
      .start()

  /**
   * Per-micro-batch stream ENRICHMENT against a static indexed
   * dimension: each batch keys its rows by the dimension key and
   * probes the index via [[IndexedRDD.lookupJoin]] — ONE one-sided
   * shuffle of the batch to the index's partitioning, then O(batch)
   * point probes; the dimension itself is never scanned, moved, or
   * re-hashed (Catalyst's stream-static join re-scans and re-hashes
   * the static side per batch unless it is broadcast-small). The
   * streaming lookup-join shape at 100 TB: per-batch cost scales with
   * the batch. Enriched rows land copy-on-write in `out`, so the
   * joined result is itself a live queryable index; a production
   * pipeline could equally write the enriched RDD to any downstream
   * sink.
   */
  class IndexedLookupSink[K: scala.reflect.ClassTag, V,
      U: scala.reflect.ClassTag, RK, RV](
      dim: IndexedRDD[K, V], out: IndexedUpsertSink[RK, RV],
      f: (K, V, U) => (RK, RV))(
      implicit rkTag: scala.reflect.ClassTag[RK],
      rvTag: scala.reflect.ClassTag[RV]) extends Serializable {

    def current: IndexedRDD[RK, RV] = out.current

    /** The function to pass to `writeStream.foreachBatch`. */
    def lookupBatch(batch: Dataset[(K, U)], batchId: Long): Unit =
      out.upsertRdd(dim.lookupJoin(batch.rdd)(f), batchId)
  }

  /** Convenience: start a stream of (K, U) lookups into a sink. */
  def lookupStream[K, U, RK, RV](pairs: Dataset[(K, U)],
      sink: IndexedLookupSink[K, _, U, RK, RV], queryName: String)(
      implicit spark: SparkSession): org.apache.spark.sql.streaming.StreamingQuery =
    pairs.writeStream
      .queryName(queryName)
      .outputMode(OutputMode.Update)
      .foreachBatch((b: Dataset[(K, U)], id: Long) => sink.lookupBatch(b, id))
      .start()

  /** Convenience: start a stream of (K, V) pairs into a sink. */
  def upsertStream[K: scala.reflect.ClassTag: KeySerializer,
      V: scala.reflect.ClassTag](pairs: Dataset[(K, V)],
      sink: IndexedUpsertSink[K, V], queryName: String)(
      implicit spark: SparkSession): org.apache.spark.sql.streaming.StreamingQuery =
    pairs.writeStream
      .queryName(queryName)
      .outputMode(OutputMode.Update)
      .foreachBatch((b: Dataset[(K, V)], id: Long) => sink.upsertBatch(b, id))
      .start()
}
