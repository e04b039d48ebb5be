package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{IndexedRDD, SparkSessionFixture}
import graft.streaming.Streaming.{Event, IndexedUpsertSink}

class StreamingSpec extends AnyFunSuite {

  private lazy val spark = SparkSessionFixture.spark
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("windowedStats: streaming (append + watermark) matches batch on same data") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val events = (0 until 120).map { i =>
      Event(i.toLong, ts(i % 60), i % 5, if (i % 2 == 0) "click" else "view", i * 1.0)
    }
    val stream = Streaming.windowedStats(
      input.toDF().withColumn("ts", col("ts").cast("timestamp")), "10 minutes", "20 minutes")
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("win_out").start()
    try {
      input.addData(events: _*)
      q.processAllAvailable()
      // advance the watermark far enough to close all windows
      input.addData(Event(999L, Timestamp.valueOf("2024-01-01 13:00:00"), 0L, "click", 0.0))
      q.processAllAvailable()
      val streamed = spark.table("win_out")
        .filter($"ws" < Timestamp.valueOf("2024-01-01 12:00:00"))
        .select($"ws", $"event_type", $"n", $"total")
        .collect().map(_.toSeq).toSet
      val batch = Streaming.windowedStats(events.toDF(), "10 minutes", "20 minutes")
        .select($"ws", $"event_type", $"n", $"total")
        .collect().map(_.toSeq).toSet
      assert(streamed === batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("intervalJoin: stream-stream attribution join matches the batch join") {
    implicit val sqlCtx = spark.sqlContext
    val lIn = MemoryStream[Event]
    val rIn = MemoryStream[Event]
    // left = clicks at minute 0/10/20 per user; right = purchases that
    // land inside / outside the 30-minute attribution window
    val clicks = (0 until 3).flatMap(u => Seq(0, 10, 20).map(m =>
      Event((u * 100 + m).toLong, ts(m), u.toLong, "click", 0.0)))
    val buys = Seq(
      Event(1000L, ts(15), 0L, "purchase", 9.99),   // joins clicks at 0 and 10
      Event(1001L, ts(55), 1L, "purchase", 5.0),    // outside every window
      Event(1002L, ts(21), 2L, "purchase", 1.0))    // joins 0(no: 21>30? within 0+30 yes), 10, 20
    val joined = Streaming.intervalJoin(lIn.toDF(), rIn.toDF())
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ij_out").start()
    try {
      lIn.addData(clicks: _*)
      rIn.addData(buys: _*)
      q.processAllAvailable()
      // push both watermarks forward so buffered state flushes
      lIn.addData(Event(9998L, ts(300), 9L, "click", 0.0))
      rIn.addData(Event(9999L, ts(300), 9L, "purchase", 0.0))
      q.processAllAvailable()
      val streamed = spark.table("ij_out")
        .filter($"user_id" < 9)
        .select($"user_id", $"l_event", $"r_event", $"r_value")
        .collect().map(_.toSeq).toSet
      val batch = Streaming.intervalJoin(clicks.toDF(), buys.toDF())
        .select($"user_id", $"l_event", $"r_event", $"r_value")
        .collect().map(_.toSeq).toSet
      assert(streamed === batch)
      assert(streamed.nonEmpty)
      // the out-of-window purchase attributed to nothing
      assert(!streamed.exists(_(2) == 1001L))
      // purchase at minute 15 attributed to user 0's clicks at 0 AND 10
      assert(streamed.count(r => r(0) == 0L && r(2) == 1000L) === 2)
    } finally q.stop()
  }

  test("intervalJoin left_outer: unmatched clicks flush exactly once; matches batch") {
    implicit val sqlCtx = spark.sqlContext
    val lIn = MemoryStream[Event]
    val rIn = MemoryStream[Event]
    // user 0's click converts inside the 30-min window; user 1's click
    // NEVER converts (its only purchase is 55 min later); user 2 has no
    // purchase at all
    val clicks = Seq(
      Event(100L, ts(0), 0L, "click", 0.0),
      Event(101L, ts(0), 1L, "click", 0.0),
      Event(102L, ts(5), 2L, "click", 0.0))
    val buys = Seq(
      Event(1000L, ts(15), 0L, "purchase", 9.99),
      Event(1001L, ts(55), 1L, "purchase", 5.0))
    val joined = Streaming.intervalJoin(lIn.toDF(), rIn.toDF(),
      joinType = "left_outer")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ijo_out").start()
    try {
      lIn.addData(clicks: _*)
      rIn.addData(buys: _*)
      q.processAllAvailable()
      // watermark far past every click + window: unmatched lefts flush
      lIn.addData(Event(9998L, ts(300), 9L, "click", 0.0))
      rIn.addData(Event(9999L, ts(300), 9L, "purchase", 0.0))
      q.processAllAvailable()
      // one more pair of batches: a second flush of the same clicks
      // would now DUPLICATE rows if the outer state were not dropped
      lIn.addData(Event(9996L, ts(330), 9L, "click", 0.0))
      rIn.addData(Event(9997L, ts(330), 9L, "purchase", 0.0))
      q.processAllAvailable()
      val streamed = spark.table("ijo_out")
        .filter($"user_id" < 9)
        .select($"user_id", $"l_event", $"r_event", $"r_value")
        .collect().map(_.toSeq).toSet
      val batch = Streaming.intervalJoin(clicks.toDF(), buys.toDF(),
          joinType = "left_outer")
        .select($"user_id", $"l_event", $"r_event", $"r_value")
        .collect().map(_.toSeq).toSet
      assert(streamed === batch)
      // converted click joined; non-converting clicks emitted with nulls
      assert(streamed.contains(Seq(0L, 100L, 1000L, 9.99)))
      assert(streamed.contains(Seq(1L, 101L, null, null)))
      assert(streamed.contains(Seq(2L, 102L, null, null)))
      // exactly once: one row per non-converting click, not one per flush
      val unmatchedRows = spark.table("ijo_out").filter($"user_id" < 9)
        .filter($"r_event".isNull).collect()
      assert(unmatchedRows.length === 2)
    } finally q.stop()
  }

  test("sessionize: gap splits sessions; totals correct") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = Streaming.sessionize(input.toDS(), gapMs = 10 * 60 * 1000L)
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_out").start()
    try {
      // user 1: events at 10:02, then a LATE 10:00 event in the next
      // batch (extends the session backwards), then 10:30 (new session)
      input.addData(Event(1, ts(2), 1, "click", 1.0))
      q.processAllAvailable()
      input.addData(
        Event(2, ts(0), 1, "click", 2.0),
        Event(3, ts(30), 1, "click", 4.0))
      q.processAllAvailable()
      val sessions = spark.table("sess_out")
        .as[Streaming.Session].collect().sortBy(_.start.getTime)
      // the first session must be closed (gap exceeded by the 10:30 event)
      assert(sessions.length === 1)
      assert(sessions(0).n_events === 2 && sessions(0).total_value === 3.0)
      assert(sessions(0).start === ts(0) && sessions(0).end === ts(2))
    } finally q.stop()
  }

  test("sessionize: trailing session closes via event-time timeout when the watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = Streaming.sessionize(input.toDS(), gapMs = 10 * 60 * 1000L,
        watermark = "20 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_timeout_out").start()
    try {
      // user 7's only events: 10:00 and 10:05, then silence forever
      input.addData(Event(1, ts(0), 7, "click", 1.0), Event(2, ts(5), 7, "click", 2.0))
      q.processAllAvailable()
      // other users keep the stream moving; watermark after this batch =
      // 11:00 - 20min = 10:40 > user 7's last event + gap (10:15)
      input.addData(Event(3, Timestamp.valueOf("2024-01-01 11:00:00"), 8, "view", 1.0))
      q.processAllAvailable()
      // one more batch so the timeout fires against the advanced watermark
      input.addData(Event(4, Timestamp.valueOf("2024-01-01 11:05:00"), 8, "view", 1.0))
      q.processAllAvailable()
      val flushed = spark.table("sess_timeout_out").as[Streaming.Session]
        .filter(_.user_id == 7L).collect()
      // the trailing session flushed with NO further user-7 events
      assert(flushed.length === 1)
      assert(flushed(0).n_events === 2 && flushed(0).total_value === 3.0)
      assert(flushed(0).start === ts(0) && flushed(0).end === ts(5))
    } finally q.stop()
  }

  test("sessionize: batch lane with sentinel flush equals the streaming output") {
    implicit val sqlCtx = spark.sqlContext
    val gapMs = 10 * 60 * 1000L
    val events = Seq(
      Event(1, ts(0), 1, "a", 1.0), Event(2, ts(5), 1, "a", 2.0), // u1 session 1
      Event(3, ts(40), 1, "a", 3.0), // u1 session 2 (gap > 10 min)
      Event(4, ts(2), 2, "a", 4.0), Event(5, ts(9), 2, "a", 5.0)) // u2 session 1
    // STREAM: watermark passes every session's end + gap, flushing all
    val input = MemoryStream[Event]
    val q = Streaming.sessionize(input.toDS(), gapMs, watermark = "1 minute")
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_parity_out").start()
    val streamed = try {
      input.addData(events: _*)
      q.processAllAvailable()
      input.addData(Event(98, Timestamp.valueOf("2024-01-01 13:00:00"), 9, "x", 0.0))
      q.processAllAvailable()
      input.addData(Event(99, Timestamp.valueOf("2024-01-01 13:05:00"), 9, "x", 0.0))
      q.processAllAvailable()
      spark.table("sess_parity_out").as[Streaming.Session]
        .filter(_.user_id <= 2L).collect().toSet
    } finally q.stop()
    // BATCH: the q_sessionize shape — one sentinel per user two gaps
    // past the global max closes every real trailing session
    val sentinelTs = new Timestamp(events.map(_.ts.getTime).max + 2 * gapMs)
    val sentinels = events.map(_.user_id).distinct
      .map(u => Event(-1L, sentinelTs, u, "sentinel", 0.0))
    val batch = Streaming.sessionize((events ++ sentinels).toDS(), gapMs)
      .filter($"start" =!= lit(sentinelTs))
      .as[Streaming.Session].collect().toSet
    assert(batch === streamed)
    assert(batch.size === 3) // two u1 sessions + one u2 session
  }

  test("dedupStream: duplicate content within the watermark window is dropped across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = Streaming.dedupStream(input.toDF(), "event_type", watermark = "30 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    try {
      input.addData(
        Event(1, ts(0), 1, "content-A", 1.0),
        Event(2, ts(1), 2, "content-A", 2.0), // dup in same batch
        Event(3, ts(2), 3, "content-B", 3.0))
      q.processAllAvailable()
      input.addData(Event(4, ts(5), 4, "content-A", 4.0)) // dup across batches
      q.processAllAvailable()
      val out = spark.table("dedup_out").as[Event].collect()
      assert(out.map(_.event_type).sorted.toSeq === Seq("content-A", "content-B"))
      assert(out.map(_.event_id).toSet === Set(1L, 3L))
    } finally q.stop()
  }

  test("dedupStream: content reappears once its state evicts past the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = Streaming.dedupStream(input.toDF(), "event_type", watermark = "30 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_evict_out").start()
    try {
      input.addData(Event(1, ts(0), 1, "content-A", 1.0))
      q.processAllAvailable()
      // advance the watermark far past content-A's expiry
      input.addData(Event(2, ts(120), 2, "content-X", 2.0))
      q.processAllAvailable()
      // same content arrives again: its state is gone, so it re-emits —
      // the documented residual the batch-path dedup mops up
      input.addData(Event(3, ts(130), 3, "content-A", 3.0))
      q.processAllAvailable()
      val out = spark.table("dedup_evict_out").as[Event].collect()
      assert(out.map(_.event_id).toSet === Set(1L, 2L, 3L))
    } finally q.stop()
  }

  test("IndexedUpsertSink: micro-batches upsert into a live point-queryable index") {
    implicit val sqlCtx = spark.sqlContext
    implicit val sp = spark
    val initial = IndexedRDD(spark.sparkContext.parallelize(
      (1L to 10L).map(k => (k, 100.0)), 4))
    val sink = new IndexedUpsertSink[Long, Double](initial,
      merge = (_, old, nw) => old + nw)
    val input = MemoryStream[(Long, Double)]
    val q = Streaming.upsertStream(input.toDS(), sink, "upsert_test")
    try {
      input.addData((1L, 5.0), (11L, 7.0))
      q.processAllAvailable()
      assert(sink.current.get(1L) === Some(105.0)) // merged
      assert(sink.current.get(11L) === Some(7.0))  // inserted
      assert(sink.current.count() === 11)
      input.addData((1L, 5.0), (12L, 1.0))
      q.processAllAvailable()
      assert(sink.current.get(1L) === Some(110.0))
      assert(sink.current.count() === 12)
      assert(sink.current.get(2L) === Some(100.0)) // untouched keys preserved
    } finally q.stop()
  }

  test("VersionedUpsertSink: asOf pins past versions; the window evicts loudly") {
    implicit val sqlCtx = spark.sqlContext
    implicit val sp = spark
    val init = IndexedRDD(spark.sparkContext.parallelize(
      Seq((1L, 10.0), (2L, 20.0)), 4))
    val sink = new Streaming.VersionedUpsertSink[Long, Double](init, keep = 3)
    val input = MemoryStream[(Long, Double)]
    val q = Streaming.versionedStream(input.toDS(), sink, "versions_test")
    try {
      input.addData((1L, 11.0)); q.processAllAvailable() // batch 0
      input.addData((2L, 22.0)); q.processAllAvailable() // batch 1
      assert(sink.asOf(0L).get(1L) === Some(11.0))
      assert(sink.asOf(0L).get(2L) === Some(20.0)) // batch 1 invisible at 0
      assert(sink.asOf(1L).get(2L) === Some(22.0))
      assert(sink.asOf(99L).get(1L) === Some(11.0)) // latest ≤ 99 = batch 1
      assert(sink.versions === Seq(-1L, 0L, 1L))
      input.addData((1L, 13.0)); q.processAllAvailable() // batch 2: evicts init
      assert(sink.versions === Seq(0L, 1L, 2L))
      assert(sink.current.get(1L) === Some(13.0))
      assert(sink.asOf(1L).get(1L) === Some(11.0)) // retained version intact
      intercept[NoSuchElementException](sink.asOf(-1L)) // evicted: loud
      // at-least-once replay: a duplicate batch id must not burn a
      // retention slot or fork the version list
      sink.upsertBatch(Seq((1L, 77.0)).toDS(), 2L)
      assert(sink.versions === Seq(0L, 1L, 2L))
      assert(sink.current.get(1L) === Some(13.0))
    } finally q.stop()
  }

  test("IndexedChangelogSink: per-batch old/new history; state and log stay queryable") {
    implicit val sqlCtx = spark.sqlContext
    implicit val sp = spark
    val init = IndexedRDD(spark.sparkContext.parallelize(
      Seq((1L, 10.0), (2L, 20.0)), 4))
    val sink = new Streaming.IndexedChangelogSink[Long, Double](init, logPartitions = 4)
    val input = MemoryStream[(Long, Double)]
    val q = Streaming.changelogStream(input.toDS(), sink, "changelog_test")
    try {
      input.addData((1L, 11.0), (3L, 30.0)) // update + brand-new key
      q.processAllAvailable()
      input.addData((1L, 12.0)) // second update sees batch-0's value
      q.processAllAvailable()
      assert(sink.current.get(1L) === Some(12.0))
      assert(sink.current.get(2L) === Some(20.0)) // untouched
      assert(sink.current.get(3L) === Some(30.0))
      assert(sink.changelog.get((1L, 0L)) === Some((Some(10.0), 11.0)))
      assert(sink.changelog.get((3L, 0L)) === Some((None, 30.0))) // insert: no old
      assert(sink.changelog.get((1L, 1L)) === Some((Some(11.0), 12.0)))
      assert(sink.changelog.get((2L, 0L)) === None) // untouched keys never log
      assert(sink.changelog.count() === 3)
      // at-least-once replay: re-delivering batch 1 must NOT rewrite
      // history (a naive re-probe would record (new, new) and lose the
      // true old value forever)
      sink.upsertBatch(Seq((1L, 99.0)).toDS(), 1L)
      assert(sink.current.get(1L) === Some(12.0))
      assert(sink.changelog.get((1L, 1L)) === Some((Some(11.0), 12.0)))
      // in-batch duplicate keys: ONE winner feeds both the changelog
      // and the state, so the history always replays to the state
      sink.upsertBatch(Seq((9L, 1.0), (9L, 2.0)).toDS(), 7L)
      val logged = sink.changelog.get((9L, 7L)).get._2
      assert(sink.current.get(9L) === Some(logged))
    } finally q.stop()
  }

  test("IndexedLookupSink: batches enrich against a static indexed dimension") {
    implicit val sqlCtx = spark.sqlContext
    implicit val sp = spark
    // dimension: id -> multiplier; stream: (dimKey, (outKey, amount))
    val dim = IndexedRDD(spark.sparkContext.parallelize(
      (1L to 5L).map(k => (k, k * 10.0)), 4))
    val out = new IndexedUpsertSink[Long, Double](IndexedRDD(
      spark.sparkContext.emptyRDD[(Long, Double)]
        .partitionBy(new org.apache.spark.HashPartitioner(4))))
    val sink = new Streaming.IndexedLookupSink[
      Long, Double, (Long, Double), Long, Double](dim, out,
      (_, mult, u) => (u._1, u._2 * mult))
    val input = MemoryStream[(Long, (Long, Double))]
    val q = Streaming.lookupStream(input.toDS(), sink, "lookup_test")
    try {
      input.addData((1L, (100L, 2.0)), (3L, (101L, 1.0)), (99L, (102L, 4.0)))
      q.processAllAvailable()
      assert(sink.current.get(100L) === Some(20.0)) // 2.0 * 10
      assert(sink.current.get(101L) === Some(30.0)) // 1.0 * 30
      assert(sink.current.get(102L) === None) // dim key 99 absent: dropped
      input.addData((5L, (103L, 0.5)))
      q.processAllAvailable()
      assert(sink.current.get(103L) === Some(25.0))
      assert(sink.current.count() === 3)
    } finally q.stop()
  }

  private def freshCkpt(name: String): String = {
    val d = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), s"graft_ckpt_$name").toString
    new scala.reflect.io.Directory(new java.io.File(d)).deleteRecursively()
    d
  }

  test("CheckpointedUpsertSink: restart restores state, skips redelivered batches") {
    val sc = spark.sparkContext
    val dir = freshCkpt("restore")
    val init = IndexedRDD(sc.parallelize((1L to 20L).map(k => (k, 0.0)), 4))
    val sink = new Streaming.CheckpointedUpsertSink[Long, Double](sc, init, dir)
    sink.upsertRdd(sc.parallelize(Seq((1L, 1.0), (21L, 1.0))), 0)
    sink.upsertRdd(sc.parallelize(Seq((2L, 2.0))), 1)
    val expect = sink.current.map(identity).collect().toMap
    // "kill the query": a NEW sink instance shares nothing in-memory —
    // and `initial` must never be evaluated on a restore
    val sink2 = new Streaming.CheckpointedUpsertSink[Long, Double](sc,
      sys.error("initial evaluated on restore"), dir)
    assert(sink2.lastCommittedBatch === 1)
    assert(sink2.current.map(identity).collect().toMap === expect)
    // foreachBatch is at-least-once: the redelivered batch is a no-op
    sink2.upsertRdd(sc.parallelize(Seq((2L, 99.0))), 1)
    assert(sink2.current.get(2L) === Some(2.0))
    // fresh batches keep applying after the restart
    sink2.upsertRdd(sc.parallelize(Seq((3L, 3.0))), 2)
    assert(sink2.current.get(3L) === Some(3.0))
    assert(sink2.current.count() === 21)
  }

  test("CheckpointedUpsertSink: an uncommitted delta (crash before commit) is not replayed") {
    val sc = spark.sparkContext
    val dir = freshCkpt("crash")
    val init = IndexedRDD(sc.parallelize((1L to 10L).map(k => (k, 0.0)), 4))
    val sink = new Streaming.CheckpointedUpsertSink[Long, Double](sc, init, dir)
    sink.upsertRdd(sc.parallelize(Seq((1L, 1.0))), 0)
    // simulate dying between the delta write and the _latest commit
    sc.parallelize(Seq((9L, 9.0))).saveAsObjectFile(s"$dir/delta_5")
    val sink2 = new Streaming.CheckpointedUpsertSink[Long, Double](sc,
      sys.error("initial evaluated on restore"), dir)
    assert(sink2.lastCommittedBatch === 0)
    assert(sink2.current.get(9L) === Some(0.0)) // garbage delta ignored
    // the engine redelivers batch 5: the stale delta is overwritten
    sink2.upsertRdd(sc.parallelize(Seq((9L, 10.0))), 5)
    assert(sink2.current.get(9L) === Some(10.0))
  }

  test("CheckpointedUpsertSink: a torn _latest marker derives from the delta log") {
    val sc = spark.sparkContext
    val dir = freshCkpt("torn")
    val init = IndexedRDD(sc.parallelize((1L to 10L).map(k => (k, 0.0)), 4))
    val sink = new Streaming.CheckpointedUpsertSink[Long, Double](sc, init, dir)
    sink.upsertRdd(sc.parallelize(Seq((1L, 1.0))), 0)
    sink.upsertRdd(sc.parallelize(Seq((2L, 2.0))), 1)
    val expect = sink.current.map(identity).collect().toMap
    // a crash mid-rewrite leaves an EMPTY _latest: the restore must
    // derive the commit point from the complete deltas on disk — and
    // must NOT re-seed the base over the durable state
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "_latest"),
      Array.empty[Byte])
    val sink2 = new Streaming.CheckpointedUpsertSink[Long, Double](sc,
      sys.error("initial evaluated on restore"), dir)
    assert(sink2.lastCommittedBatch === 1)
    assert(sink2.current.map(identity).collect().toMap === expect)
    // redelivery of the derived batches stays a no-op; new ones apply
    sink2.upsertRdd(sc.parallelize(Seq((2L, 99.0))), 1)
    assert(sink2.current.get(2L) === Some(2.0))
    sink2.upsertRdd(sc.parallelize(Seq((3L, 3.0))), 2)
    assert(sink2.current.get(3L) === Some(3.0))
  }

  test("CheckpointedUpsertSink: compact folds deltas; restore equals pre-compact state") {
    val sc = spark.sparkContext
    val dir = freshCkpt("compact")
    val init = IndexedRDD(sc.parallelize((1L to 10L).map(k => (k, 0.0)), 4))
    val sink = new Streaming.CheckpointedUpsertSink[Long, Double](sc, init, dir)
    (0 to 4).foreach(i => sink.upsertRdd(sc.parallelize(Seq((i.toLong, i * 1.0))), i))
    val expect = sink.current.map(identity).collect().toMap
    sink.compact()
    assert(!new java.io.File(s"$dir/delta_3").exists())
    val sink2 = new Streaming.CheckpointedUpsertSink[Long, Double](sc,
      sys.error("initial evaluated on restore"), dir)
    assert(sink2.current.map(identity).collect().toMap === expect)
    assert(sink2.lastCommittedBatch === 4)
  }

  test("CheckpointedUpsertSink: a real query killed and restarted continues exactly-once") {
    val sc = spark.sparkContext
    val dir = freshCkpt("query")
    val qCkpt = freshCkpt("query_engine")
    val init = IndexedRDD(sc.parallelize((1L to 5L).map(k => (k, 0.0)), 2))
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Double)]
    def start(sink: Streaming.CheckpointedUpsertSink[Long, Double]) =
      input.toDS().writeStream
        .queryName(s"ckpt_sink_${System.nanoTime()}")
        .option("checkpointLocation", qCkpt)
        .outputMode("update")
        .foreachBatch((b: org.apache.spark.sql.Dataset[(Long, Double)], id: Long) =>
          sink.upsertBatch(b, id))
        .start()
    val sink1 = new Streaming.CheckpointedUpsertSink[Long, Double](sc, init, dir)
    val q1 = start(sink1)
    try {
      input.addData(Seq((1L, 10.0)))
      q1.processAllAvailable()
      input.addData(Seq((2L, 20.0)))
      q1.processAllAvailable()
    } finally q1.stop()
    // restart: fresh sink from the sink checkpoint, same engine
    // checkpoint — the engine resumes from its offset log, the sink
    // from its own commit marker
    val sink2 = new Streaming.CheckpointedUpsertSink[Long, Double](sc,
      sys.error("initial evaluated on restore"), dir)
    assert(sink2.current.get(2L) === Some(20.0))
    val q2 = start(sink2)
    try {
      input.addData(Seq((3L, 30.0)))
      q2.processAllAvailable()
    } finally q2.stop()
    assert(sink2.current.map(identity).collect().toMap ===
      Map(1L -> 10.0, 2L -> 20.0, 3L -> 30.0, 4L -> 0.0, 5L -> 0.0))
  }
}
