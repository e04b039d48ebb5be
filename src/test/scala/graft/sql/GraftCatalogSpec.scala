package graft.sql

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSessionFixture

/**
 * Persistent graft tables ([[GraftTableProvider]] + [[GraftTables]]):
 * `CREATE TABLE ... USING graft` persists the index, SQL-text DML
 * commits change-set deltas to the on-disk log, and a NEW session —
 * whose handle cache is empty, so nothing in-memory can answer —
 * replays base + deltas to the identical state, with point/range/
 * secondary routing intact from the reloaded sidecars.
 */
class GraftCatalogSpec extends AnyFunSuite {

  private lazy val spark = SparkSessionFixture.spark
  import spark.implicits._

  private def freshPath(name: String): String = {
    val p = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), s"graft_catspec_$name").toString
    new scala.reflect.io.Directory(new java.io.File(p)).deleteRecursively()
    p
  }

  test("CTAS + DML survive a session reopen bit-for-bit") {
    val path = freshPath("dml")
    spark.sql("DROP TABLE IF EXISTS catspec_t")
    (1L to 100L).map(k => (k, s"v$k", k * 1.0)).toDF("k", "name", "bal")
      .createOrReplaceTempView("catspec_src")
    spark.sql(s"""CREATE TABLE catspec_t USING graft
      |OPTIONS (key 'k') LOCATION '$path' AS SELECT * FROM catspec_src""".stripMargin)
    spark.sql("UPDATE catspec_t SET bal = bal + 1000 WHERE k <= 10")
    spark.sql("DELETE FROM catspec_t WHERE k > 90")
    Seq((5L, 0.5), (200L, 2.0)).toDF("sk", "v")
      .createOrReplaceTempView("catspec_msrc")
    spark.sql(
      """MERGE INTO catspec_t t USING catspec_msrc s ON t.k = s.sk
        |WHEN MATCHED THEN UPDATE SET bal = s.v
        |WHEN NOT MATCHED THEN INSERT (k, name, bal) VALUES (s.sk, 'new', s.v)
        |WHEN NOT MATCHED BY SOURCE AND t.k = 77 THEN DELETE""".stripMargin)
    spark.sql("INSERT INTO catspec_t VALUES (300, 'ins', 3.0)")
    val live = spark.sql("SELECT * FROM catspec_t ORDER BY k")
      .collect().map(_.toSeq).toSeq
    // 100 - 10 (k>90) - 1 (NBS delete of 77) + 200 + 300
    assert(live.length === 91)
    val s2 = spark.newSession()
    val re = s2.sql("SELECT * FROM catspec_t ORDER BY k")
      .collect().map(_.toSeq).toSeq
    assert(re === live)
    // delta log on disk: base + 4 statements
    assert(s2.sql("SELECT count(*) FROM graft_history('catspec_t')")
      .collect()(0).getLong(0) === 5)
    spark.sql("DROP TABLE IF EXISTS catspec_t")
  }

  test("reloaded table routes point, range, and secondary probes") {
    implicit val sp: org.apache.spark.sql.SparkSession = spark
    val path = freshPath("route")
    // persist an ORDERED handle with a secondary index — the sidecars
    // ride the save — then ATTACH it as a catalog table
    val df = (1L to 500L).map(k => (k, k % 13, s"n${k % 20}")).toDF("k", "grp", "name")
    val h0 = IndexedFrame.index(df, "k", ordered = true, numPartitions = 4)
    h0.addSecondaryIndex("name")
    IndexedFrame.save(h0, path)
    val s2 = spark.newSession()
    s2.sql("DROP TABLE IF EXISTS catspec_route")
    s2.sql(s"CREATE TABLE catspec_route USING graft LOCATION '$path'")
    val h = GraftTables.current(s2, path)._2.handleAny
      .asInstanceOf[IndexedFrame.Handle[_]]
    assert(s2.sql("SELECT name FROM catspec_route WHERE k = 42")
      .collect().map(_.getString(0)).toSeq === Seq("n2"))
    assert(h.lastScanKind === "point")
    assert(s2.sql("SELECT count(*) FROM catspec_route WHERE k BETWEEN 100 AND 199")
      .collect()(0).getLong(0) === 100)
    // counting a pushed range routes through the no-scan range-count
    // service on the reloaded trie
    assert(h.lastScanKind === "range_count")
    assert(s2.sql("SELECT count(*) FROM catspec_route WHERE name = 'n7'")
      .collect()(0).getLong(0) === 25)
    assert(h.lastScanKind === "secondary_point")
    s2.sql("DROP TABLE IF EXISTS catspec_route")
  }

  test("VERSION AS OF, graft_changes, and OPTIMIZE read the durable log") {
    val path = freshPath("ver")
    spark.sql("DROP TABLE IF EXISTS catspec_v")
    (1L to 50L).map(k => (k, k * 1.0)).toDF("k", "bal")
      .createOrReplaceTempView("catspec_vsrc")
    spark.sql(s"""CREATE TABLE catspec_v USING graft
      |OPTIONS (key 'k') LOCATION '$path' AS SELECT * FROM catspec_vsrc""".stripMargin)
    spark.sql("UPDATE catspec_v SET bal = 0 WHERE k <= 5") // v1
    spark.sql("DELETE FROM catspec_v WHERE k > 45")        // v2
    val s2 = spark.newSession()
    assert(s2.sql("SELECT count(*) FROM catspec_v VERSION AS OF 0")
      .collect()(0).getLong(0) === 50)
    assert(s2.sql("SELECT count(*) FROM catspec_v VERSION AS OF 1 WHERE bal = 0")
      .collect()(0).getLong(0) === 5)
    assert(s2.sql("SELECT count(*) FROM catspec_v").collect()(0).getLong(0) === 45)
    val ch = s2.sql(
      """SELECT _change_type, count(*) AS n FROM graft_changes('catspec_v', 0, 2)
        |GROUP BY 1 ORDER BY 1""".stripMargin)
    assert(ch.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ===
      Seq(("delete", 5L), ("update_postimage", 5L), ("update_preimage", 5L)))
    // the CDC diff zips co-partitioned replayed versions: no shuffle
    val plan = s2.sql("SELECT * FROM graft_changes('catspec_v', 1, 2)")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"CDC diff must not shuffle:\n$plan")
    // OPTIMIZE compacts: content identical, replay depth resets, and
    // version NUMBERS stay stable (Delta semantics) — the current
    // version keeps its number, folded ones "no longer exist"
    val tsBeforeOptimize =
      new java.sql.Timestamp(System.currentTimeMillis()).toString
    Thread.sleep(50) // the compaction's file times must be strictly later
    val m = s2.sql("OPTIMIZE catspec_v").collect()(0)
    assert(m.getLong(1) === 45 && m.getInt(4) <= 2)
    assert(s2.sql("SELECT count(*) FROM catspec_v").collect()(0).getLong(0) === 45)
    assert(s2.sql("SELECT count(*) FROM catspec_v VERSION AS OF 2")
      .collect()(0).getLong(0) === 45)
    intercept[Exception](s2.sql(
      "SELECT count(*) FROM catspec_v VERSION AS OF 0").collect())
    // the rebased version keeps its ORIGINAL commit stamp: a wall
    // clock between the last DML and the OPTIMIZE still resolves by
    // timestamp (without the persisted stamp it would read the
    // compaction's file time, later than this clock, and fail)
    assert(s2.sql(
      s"SELECT count(*) FROM catspec_v TIMESTAMP AS OF '$tsBeforeOptimize'")
      .collect()(0).getLong(0) === 45)
    spark.sql("DROP TABLE IF EXISTS catspec_v")
  }

  test("VACUUM on a catalog table folds old versions, keeps numbering stable") {
    val path = freshPath("vac")
    spark.sql("DROP TABLE IF EXISTS catspec_vac")
    (1L to 40L).map(k => (k, k * 1.0)).toDF("k", "bal")
      .createOrReplaceTempView("catspec_vac_src")
    spark.sql(s"""CREATE TABLE catspec_vac USING graft
      |OPTIONS (key 'k') LOCATION '$path' AS SELECT * FROM catspec_vac_src""".stripMargin)
    (1 to 4).foreach(i =>
      spark.sql(s"UPDATE catspec_vac SET bal = ${-i} WHERE k = $i")) // v1..v4
    val row = spark.sql("VACUUM catspec_vac RETAIN 2 VERSIONS").collect()(0)
    assert((row.getLong(1), row.getLong(2), row.getLong(3)) === ((3L, 3L, 4L)))
    // a REOPENED session reads the retained window only
    val s2 = spark.newSession()
    assert(s2.sql("SELECT bal FROM catspec_vac VERSION AS OF 3 WHERE k = 4")
      .collect()(0).getDouble(0) === 4.0) // v4's update not yet applied at v3
    assert(s2.sql("SELECT bal FROM catspec_vac VERSION AS OF 4 WHERE k = 4")
      .collect()(0).getDouble(0) === -4.0)
    assert(s2.sql("SELECT bal FROM catspec_vac VERSION AS OF 3 WHERE k = 3")
      .collect()(0).getDouble(0) === -3.0)
    intercept[Exception](s2.sql(
      "SELECT * FROM catspec_vac VERSION AS OF 1").collect())
    // history lists versions 3..4, newest current
    val hist = s2.sql("SELECT version, is_current FROM graft_history('catspec_vac') ORDER BY version")
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).toSeq
    assert(hist === Seq((3L, false), (4L, true)))
    // and DML keeps appending AFTER the fold
    s2.sql("UPDATE catspec_vac SET bal = -1 WHERE k = 10") // v5
    assert(s2.sql("SELECT bal FROM catspec_vac WHERE k = 10")
      .collect()(0).getDouble(0) === -1.0)
    assert(s2.sql("SELECT bal FROM catspec_vac VERSION AS OF 4 WHERE k = 10")
      .collect()(0).getDouble(0) === 10.0)
    spark.sql("DROP TABLE IF EXISTS catspec_vac")
  }

  test("CREATE INDEX on a catalog table persists sidecars across a reopen") {
    val path = freshPath("ddl")
    spark.sql("DROP TABLE IF EXISTS catspec_ddl")
    (1L to 400L).map(k => (k, k % 13, s"n${k % 20}")).toDF("k", "grp", "name")
      .createOrReplaceTempView("catspec_ddl_src")
    spark.sql(s"""CREATE TABLE catspec_ddl USING graft
      |OPTIONS (key 'k') LOCATION '$path' AS SELECT * FROM catspec_ddl_src""".stripMargin)
    spark.sql("CREATE INDEX name_ix ON catspec_ddl (name)")
    // the sidecars landed beside the base save...
    assert(new java.io.File(s"$path/sec_0").exists())
    // ...so a REOPENED session routes secondary probes with no rebuild
    val s2 = spark.newSession()
    val h = GraftTables.current(s2, path)._2.handleAny
      .asInstanceOf[IndexedFrame.Handle[_]]
    assert(s2.sql("SELECT count(*) FROM catspec_ddl WHERE name = 'n7'")
      .collect()(0).getLong(0) === 20)
    assert(h.lastScanKind === "secondary_point")
    // DML maintains the index: the post-UPDATE handle (a fresh COW
    // snapshot) re-derives the manifest's secondaries, so routing
    // survives the statement in-session AND in yet another session
    s2.sql("UPDATE catspec_ddl SET grp = -1 WHERE k = 5")
    assert(s2.sql("SELECT count(*) FROM catspec_ddl WHERE name = 'n7'")
      .collect()(0).getLong(0) === 20)
    val h2b = GraftTables.current(s2, path)._2.handleAny
      .asInstanceOf[IndexedFrame.Handle[_]]
    assert(h2b.lastScanKind === "secondary_point")
    val s2b = spark.newSession()
    assert(s2b.sql("SELECT count(*) FROM catspec_ddl WHERE name = 'n5'")
      .collect()(0).getLong(0) === 20)
    assert(GraftTables.current(s2b, path)._2.handleAny
      .asInstanceOf[IndexedFrame.Handle[_]].lastScanKind === "secondary_point")
    // DROP INDEX re-persists the (now empty) manifest: the next
    // session scans instead of probing
    s2.sql("DROP INDEX name_ix ON catspec_ddl")
    val s3 = spark.newSession()
    val h3 = GraftTables.current(s3, path)._2.handleAny
      .asInstanceOf[IndexedFrame.Handle[_]]
    assert(s3.sql("SELECT count(*) FROM catspec_ddl WHERE name = 'n7'")
      .collect()(0).getLong(0) === 20)
    assert(h3.lastScanKind !== "secondary_point")
    spark.sql("DROP TABLE IF EXISTS catspec_ddl")
  }

  test("composite-key catalog table: CTAS options, DML, reopen replay") {
    val path = freshPath("comp")
    spark.sql("DROP TABLE IF EXISTS catspec_comp")
    (1L to 200L).map(k => (k % 10, k, k * 1.0)).toDF("a", "b", "v")
      .createOrReplaceTempView("catspec_comp_src")
    spark.sql(s"""CREATE TABLE catspec_comp USING graft
      |OPTIONS (key 'a,b') LOCATION '$path' AS SELECT * FROM catspec_comp_src""".stripMargin)
    spark.sql("UPDATE catspec_comp SET v = -1 WHERE b <= 20")
    spark.sql("DELETE FROM catspec_comp WHERE a = 3 AND b > 100")
    Seq((2L, 12L, 99.0), (9L, 999L, 9.0)).toDF("sa", "sb", "sv")
      .createOrReplaceTempView("catspec_comp_msrc")
    spark.sql(
      """MERGE INTO catspec_comp t USING catspec_comp_msrc s
        |ON t.a = s.sa AND t.b = s.sb
        |WHEN MATCHED THEN UPDATE SET v = s.sv
        |WHEN NOT MATCHED THEN INSERT (a, b, v) VALUES (s.sa, s.sb, s.sv)""".stripMargin)
    val live = spark.sql("SELECT * FROM catspec_comp ORDER BY a, b")
      .collect().map(_.toSeq).toSeq
    val s2 = spark.newSession()
    val re = s2.sql("SELECT * FROM catspec_comp ORDER BY a, b")
      .collect().map(_.toSeq).toSeq
    assert(re === live)
    assert(s2.sql("SELECT v FROM catspec_comp WHERE a = 2 AND b = 12")
      .collect()(0).getDouble(0) === 99.0)
    assert(s2.sql("SELECT count(*) FROM catspec_comp WHERE a = 3 AND b > 100")
      .collect()(0).getLong(0) === 0)
    spark.sql("DROP TABLE IF EXISTS catspec_comp")
  }

  test("writer API: save, load, append as an upsert delta") {
    val path = freshPath("writer")
    val df = (1L to 40L).map(k => (k, k * 2.0)).toDF("k", "v")
    df.write.format("graft").option("key", "k").save(path)
    assert(spark.read.format("graft").load(path).count() === 40)
    // append upserts: 5 replaced keys + 5 new
    (36L to 45L).map(k => (k, -1.0)).toDF("k", "v")
      .write.format("graft").mode("append").save(path)
    val s2 = spark.newSession()
    val out = s2.read.format("graft").load(path)
    assert(out.count() === 45)
    assert(out.filter($"v" === -1.0).count() === 10)
    // composite keys round-trip through the provider too
    val path2 = freshPath("writer2")
    val cdf = (1L to 60L).map(k => (k % 5, k, s"x$k")).toDF("a", "b", "s")
    cdf.write.format("graft").option("key", "a,b").save(path2)
    val back = s2.read.format("graft").load(path2)
    assert(back.count() === 60)
    assert(back.filter($"a" === 2L && $"b" === 7L).count() === 1)
  }

  test("two concurrent committers: both statements land (optimistic claims)") {
    val path = freshPath("conc")
    spark.sql("DROP TABLE IF EXISTS catspec_conc")
    (1L to 100L).map(k => (k, k * 1.0)).toDF("k", "bal")
      .createOrReplaceTempView("catspec_conc_src")
    spark.sql(s"""CREATE TABLE catspec_conc USING graft
      |OPTIONS (key 'k') LOCATION '$path'
      |AS SELECT * FROM catspec_conc_src""".stripMargin)
    val start = new java.util.concurrent.CountDownLatch(1)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    def writer(sql: String): Thread = {
      val ss = spark.newSession()
      val t = new Thread(() => {
        try { start.await(); ss.sql(sql); () }
        catch { case e: Throwable => errs.add(e); () }
      })
      t.start(); t
    }
    val a = writer("UPDATE catspec_conc SET bal = bal + 1000 WHERE k <= 50")
    val b = writer("UPDATE catspec_conc SET bal = bal - 7 WHERE k > 50")
    start.countDown()
    a.join(120000); b.join(120000)
    if (!errs.isEmpty) throw errs.peek()
    val s2 = spark.newSession()
    // BOTH updates present in the replayed state — neither clobbered
    assert(s2.sql("SELECT sum(bal) FROM catspec_conc").collect()(0)
      .getDouble(0) === (1 to 100).map(_.toDouble).sum + 50 * 1000 - 50 * 7)
    // and in the durable log: base + exactly two delta versions
    assert(s2.sql("SELECT count(*) FROM graft_history('catspec_conc')")
      .collect()(0).getLong(0) === 3)
    spark.sql("DROP TABLE IF EXISTS catspec_conc")
  }

  test("claim conflict: the loser replays the rival's commit and retries") {
    implicit val sp: org.apache.spark.sql.SparkSession = spark
    val path = freshPath("claim")
    spark.sql("DROP TABLE IF EXISTS catspec_claim")
    (1L to 20L).map(k => (k, k * 1.0)).toDF("k", "bal")
      .createOrReplaceTempView("catspec_claim_src")
    spark.sql(s"""CREATE TABLE catspec_claim USING graft
      |OPTIONS (key 'k') LOCATION '$path'
      |AS SELECT * FROM catspec_claim_src""".stripMargin)
    // a "rival mid-commit": version 1 is claimed but not yet committed
    assert(GraftTables.claimDelta(spark, path, 1L))
    assert(!GraftTables.claimDelta(spark, path, 1L)) // second claim loses
    // our UPDATE conflicts on version 1 and must wait, not clobber
    val done = new java.util.concurrent.CountDownLatch(1)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val ss = spark.newSession()
    new Thread(() => {
      try ss.sql("UPDATE catspec_claim SET bal = 0 WHERE k <= 5")
      catch { case e: Throwable => errs.add(e); () }
      finally done.countDown()
    }).start()
    Thread.sleep(300)
    assert(done.getCount === 1) // still waiting on the rival
    // the rival completes its commit (an upsert of one row) under the
    // claim it holds; the waiter must then retry as version 2
    val h = GraftTables.current(spark, path)._2
    GraftTables.writeDelta(spark, path, 1L, truncate = false, None,
      Some(Seq((21L, 21.0)).toDF("k", "bal")), h.schema, h.keyCols)
    assert(done.await(60, java.util.concurrent.TimeUnit.SECONDS))
    if (!errs.isEmpty) throw errs.peek()
    val s2 = spark.newSession()
    val m = s2.sql("SELECT k, bal FROM catspec_claim").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(m(21L) === 21.0) // the rival's commit survived
    assert((1L to 5L).forall(m(_) === 0.0)) // and so did ours
    assert(s2.sql("SELECT count(*) FROM graft_history('catspec_claim')")
      .collect()(0).getLong(0) === 3)
    spark.sql("DROP TABLE IF EXISTS catspec_claim")
  }

  test("an abandoned claim (crashed writer) is stolen after the timeout") {
    val path = freshPath("steal")
    spark.sql("DROP TABLE IF EXISTS catspec_steal")
    (1L to 10L).map(k => (k, k * 1.0)).toDF("k", "bal")
      .createOrReplaceTempView("catspec_steal_src")
    spark.sql(s"""CREATE TABLE catspec_steal USING graft
      |OPTIONS (key 'k') LOCATION '$path'
      |AS SELECT * FROM catspec_steal_src""".stripMargin)
    assert(GraftTables.claimDelta(spark, path, 1L)) // never completes
    val saved = GraftTables.claimTimeoutMillis
    GraftTables.claimTimeoutMillis = 500L
    try spark.sql("UPDATE catspec_steal SET bal = -1 WHERE k = 3")
    finally GraftTables.claimTimeoutMillis = saved
    val s2 = spark.newSession()
    assert(s2.sql("SELECT bal FROM catspec_steal WHERE k = 3")
      .collect()(0).getDouble(0) === -1.0)
    assert(s2.sql("SELECT count(*) FROM graft_history('catspec_steal')")
      .collect()(0).getLong(0) === 2)
    spark.sql("DROP TABLE IF EXISTS catspec_steal")
  }

  test("a LIVE writer slower than the claim timeout is never stolen " +
      "from — it commits under a later version, log uncorrupted") {
    val path = freshPath("slow")
    spark.sql("DROP TABLE IF EXISTS catspec_slow")
    (1L to 50L).map(k => (k, k * 1.0)).toDF("k", "bal")
      .createOrReplaceTempView("catspec_slow_src")
    spark.sql(s"""CREATE TABLE catspec_slow USING graft
      |OPTIONS (key 'k') LOCATION '$path'
      |AS SELECT * FROM catspec_slow_src""".stripMargin)
    val saved = GraftTables.claimTimeoutMillis
    GraftTables.claimTimeoutMillis = 400L
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    try {
      // writer A: its delta parquet write is artificially stalled far
      // past the claim timeout (the scan sleeps inside the write job —
      // the pre-fence protocol would have had A holding the claim
      // through this, and B would steal and corrupt the log)
      val ssA = spark.newSession()
      val a = new Thread(() => {
        try {
          import ssA.implicits._
          val slowUp = ssA.createDataset((1L to 10L).toSeq).repartition(1)
            .mapPartitions { it => Thread.sleep(1500); it }
            .map(k => (k, -5.0)).toDF("k", "bal")
          GraftTables.commitChange(ssA, path, truncate = false, None,
            Some(slowUp))
        } catch { case e: Throwable => errs.add(e); () }
      })
      a.start()
      Thread.sleep(300) // A is mid-staging (its write sleeps 1.5 s)
      // writer B commits quickly meanwhile
      spark.newSession()
        .sql("UPDATE catspec_slow SET bal = bal + 100 WHERE k > 40")
      a.join(120000)
      if (!errs.isEmpty) throw errs.peek()
    } finally GraftTables.claimTimeoutMillis = saved
    // BOTH statements landed, and a cold replay agrees bit-for-bit
    val s2 = spark.newSession()
    val m = s2.sql("SELECT k, bal FROM catspec_slow").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert((1L to 10L).forall(m(_) === -5.0)) // A's slow upsert survived
    assert((41L to 50L).forall(k => m(k) === k + 100.0)) // and B's update
    assert((11L to 40L).forall(k => m(k) === k * 1.0))
    assert(s2.sql("SELECT count(*) FROM graft_history('catspec_slow')")
      .collect()(0).getLong(0) === 3) // base + exactly two commits
    spark.sql("DROP TABLE IF EXISTS catspec_slow")
  }

  test("a heartbeated claim is honored past the timeout; only a dead " +
      "one is reclaimed") {
    val path = freshPath("hb")
    spark.sql("DROP TABLE IF EXISTS catspec_hb")
    (1L to 10L).map(k => (k, k * 1.0)).toDF("k", "bal")
      .createOrReplaceTempView("catspec_hb_src")
    spark.sql(s"""CREATE TABLE catspec_hb USING graft
      |OPTIONS (key 'k') LOCATION '$path'
      |AS SELECT * FROM catspec_hb_src""".stripMargin)
    assert(GraftTables.claimDelta(spark, path, 1L, "owner-alive"))
    val hb = GraftTables.heartbeatForTest(spark, path, 1L)
    val saved = GraftTables.claimTimeoutMillis
    GraftTables.claimTimeoutMillis = 300L
    val done = new java.util.concurrent.CountDownLatch(1)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    try {
      val ss = spark.newSession()
      new Thread(() => {
        try ss.sql("UPDATE catspec_hb SET bal = 7 WHERE k = 1")
        catch { case e: Throwable => errs.add(e); () }
        finally done.countDown()
      }).start()
      Thread.sleep(1500) // 5x the timeout — the owner is heartbeating
      assert(done.getCount === 1) // the live claim was honored
      hb.stop() // the owner "dies": heartbeat goes stale
      assert(done.await(60, java.util.concurrent.TimeUnit.SECONDS))
      if (!errs.isEmpty) throw errs.peek()
    } finally {
      hb.stop()
      GraftTables.claimTimeoutMillis = saved
    }
    val s2 = spark.newSession()
    assert(s2.sql("SELECT bal FROM catspec_hb WHERE k = 1")
      .collect()(0).getDouble(0) === 7.0)
    assert(s2.sql("SELECT count(*) FROM graft_history('catspec_hb')")
      .collect()(0).getLong(0) === 2)
    spark.sql("DROP TABLE IF EXISTS catspec_hb")
  }

  test("DML maintains indexes incrementally: postings, distinct counts, zones") {
    implicit val sp: org.apache.spark.sql.SparkSession = spark
    val path = freshPath("incr")
    spark.sql("DROP TABLE IF EXISTS catspec_incr")
    (1L to 200L).map(k => (k, k % 10, k * 1.0))
      .toDF("k", "grp", "bal").createOrReplaceTempView("catspec_incr_src")
    spark.sql(s"""CREATE TABLE catspec_incr USING graft
      |OPTIONS (key 'k') LOCATION '$path'
      |AS SELECT * FROM catspec_incr_src""".stripMargin)
    spark.sql("CREATE INDEX grp_ix ON catspec_incr (grp)")
    spark.sql("CREATE INDEX bal_zx ON catspec_incr USING ZONEMAP (bal)")
    // UPDATE moves keys 1..20 from their old grp postings to grp 99
    spark.sql("UPDATE catspec_incr SET grp = 99 WHERE k <= 20")
    assert(spark.sql("SELECT count(*) FROM catspec_incr WHERE grp = 99")
      .collect()(0).getLong(0) === 20)
    assert(spark.sql("SELECT sum(k) FROM catspec_incr WHERE grp = 1")
      .collect()(0).getLong(0) === (21L to 191L by 10).sum)
    // DELETE empties grp 99 entirely: its postings entry must DROP so
    // the inverted index's size stays the exact count(DISTINCT grp)
    spark.sql("DELETE FROM catspec_incr WHERE grp = 99")
    assert(spark.sql("SELECT count(DISTINCT grp) FROM catspec_incr")
      .collect()(0).getLong(0) === 10) // residues 0..9 all survive k>20
    assert(spark.sql("SELECT count(*) FROM catspec_incr WHERE grp = 99")
      .collect()(0).getLong(0) === 0)
    // MERGE inserts a NEW grp value (its entry must APPEAR) and
    // re-points an existing key
    Seq((300L, 55L, 3.0), (25L, 55L, -1.0)).toDF("sk", "sg", "sb")
      .createOrReplaceTempView("catspec_incr_msrc")
    spark.sql(
      """MERGE INTO catspec_incr t USING catspec_incr_msrc s ON t.k = s.sk
        |WHEN MATCHED THEN UPDATE SET grp = s.sg, bal = s.sb
        |WHEN NOT MATCHED THEN INSERT (k, grp, bal) VALUES (s.sk, s.sg, s.sb)
        |""".stripMargin)
    assert(spark.sql("SELECT k FROM catspec_incr WHERE grp = 55")
      .collect().map(_.getLong(0)).sorted.toSeq === Seq(25L, 300L))
    assert(spark.sql("SELECT count(DISTINCT grp) FROM catspec_incr")
      .collect()(0).getLong(0) === 11) // 0..9 plus the new 55
    // the reopened session (full re-derive path) agrees on everything
    val s2 = spark.newSession()
    assert(s2.sql("SELECT count(DISTINCT grp) FROM catspec_incr")
      .collect()(0).getLong(0) === 11)
    assert(s2.sql("SELECT k FROM catspec_incr WHERE grp = 55")
      .collect().map(_.getLong(0)).sorted.toSeq === Seq(25L, 300L))
    assert(s2.sql("SELECT sum(bal) FROM catspec_incr").collect()(0)
      .getDouble(0) ===
        spark.sql("SELECT sum(bal) FROM catspec_incr").collect()(0).getDouble(0))
    spark.sql("DROP TABLE IF EXISTS catspec_incr")
  }

  test("ALTER TABLE ADD COLUMNS: additive evolution, DML, reopen, time travel") {
    val path = freshPath("evolve")
    spark.sql("DROP TABLE IF EXISTS catspec_ev")
    (1L to 50L).map(k => (k, k * 1.0)).toDF("k", "bal")
      .createOrReplaceTempView("catspec_ev_src")
    spark.sql(s"""CREATE TABLE catspec_ev USING graft
      |OPTIONS (key 'k') LOCATION '$path'
      |AS SELECT * FROM catspec_ev_src""".stripMargin)
    spark.sql("UPDATE catspec_ev SET bal = 0 WHERE k = 1") // pre-evolve DML
    val out = spark.sql(
      "ALTER TABLE catspec_ev ADD COLUMNS (tier STRING, bonus DOUBLE)")
      .collect()(0)
    assert(out.getInt(1) === 2 && out.getLong(2) === 2L)
    // existing rows read NULL in the appended columns
    assert(spark.sql("SELECT count(*) FROM catspec_ev WHERE tier IS NULL")
      .collect()(0).getLong(0) === 50)
    // post-evolution DML writes the new columns
    spark.sql("UPDATE catspec_ev SET tier = 'gold' WHERE k <= 10")
    spark.sql("INSERT INTO catspec_ev VALUES (100, 5.0, 'new', 1.5)")
    // a pre-evolution writer (old column set) keeps working: missing
    // nullable columns fill with NULL on the way in
    Seq((200L, 7.0)).toDF("k", "bal")
      .write.format("graft").mode("append").save(path)
    val s2 = spark.newSession()
    assert(s2.sql("SELECT * FROM catspec_ev").columns.toSeq ===
      Seq("k", "bal", "tier", "bonus"))
    assert(s2.sql("SELECT count(*) FROM catspec_ev WHERE tier = 'gold'")
      .collect()(0).getLong(0) === 10)
    assert(s2.sql("SELECT bonus FROM catspec_ev WHERE k = 100")
      .collect()(0).getDouble(0) === 1.5)
    assert(s2.sql("SELECT tier FROM catspec_ev WHERE k = 200")
      .collect()(0).isNullAt(0))
    // time travel BEFORE the evolution keeps the OLD schema
    assert(s2.sql("SELECT * FROM catspec_ev VERSION AS OF 1").columns.toSeq
      === Seq("k", "bal"))
    // CDC across the evolution boundary diffs under the WIDER schema:
    // version 1 (pre-evolution) vs current reports the tier updates
    // with the appended columns NULL-filled on the pre side
    val chg = s2.sql(
      """SELECT _change_type, count(*) AS n
        |FROM graft_changes('catspec_ev', 1)
        |GROUP BY _change_type ORDER BY _change_type""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // 10 tier updates (pre+post) + 2 inserts (k=100 and k=200)
    assert(chg === Seq(("insert", 2L), ("update_postimage", 10L),
      ("update_preimage", 10L)))
    // RESTORE to the pre-evolution version rolls back the DATA under
    // the CURRENT schema (added columns null again, inserts gone)
    s2.sql("RESTORE TABLE catspec_ev TO VERSION AS OF 1")
    assert(s2.sql("SELECT count(*) FROM catspec_ev")
      .collect()(0).getLong(0) === 50)
    assert(s2.sql("SELECT count(*) FROM catspec_ev WHERE tier IS NOT NULL")
      .collect()(0).getLong(0) === 0)
    assert(s2.sql("SELECT * FROM catspec_ev").columns.toSeq ===
      Seq("k", "bal", "tier", "bonus"))
    // OPTIMIZE folds the widening + restore layers into the base; a
    // fresh session then reads the evolved schema straight from the save
    s2.sql("OPTIMIZE catspec_ev")
    val s3 = spark.newSession()
    assert(s3.sql("SELECT count(*) FROM catspec_ev")
      .collect()(0).getLong(0) === 50)
    assert(s3.sql("SELECT count(*) FROM catspec_ev WHERE tier IS NOT NULL")
      .collect()(0).getLong(0) === 0)
    assert(s3.sql("SELECT bal FROM catspec_ev WHERE k = 1")
      .collect()(0).getDouble(0) === 0.0) // the pre-evolve UPDATE held
    // a NON-graft statement falls through to Spark's own ALTER
    val e = intercept[Exception](
      spark.sql("ALTER TABLE catspec_no_such ADD COLUMNS (x INT)"))
    assert(e.getMessage.toLowerCase.contains("table") ||
      e.getMessage.toLowerCase.contains("not found"))
    spark.sql("DROP TABLE IF EXISTS catspec_ev")
  }

  test("OPTIMIZE re-splits partitions that outgrew the persisted skew cap") {
    val path = freshPath("skew")
    spark.sql("DROP TABLE IF EXISTS catspec_skew")
    // every key a multiple of 8: a vanilla 8-bucket hash build piles
    // the whole corpus into partition 0
    (1L to 50L).map(i => (i * 8, i * 1.0)).toDF("k", "bal")
      .createOrReplaceTempView("catspec_skew_src")
    spark.sql(s"""CREATE TABLE catspec_skew USING graft
      |OPTIONS (key 'k', partitions '8', maxpart '100') LOCATION '$path'
      |AS SELECT * FROM catspec_skew_src""".stripMargin)
    def sizes(s: org.apache.spark.sql.SparkSession): Array[Long] =
      GraftTables.current(s, path)._2.idxAny.partitionSizes()
    // 50 hot-bucket rows are under the cap: single-level layout stands
    assert(sizes(spark).length === 8 && sizes(spark).max === 50)
    // 250 more hot-bucket keys regrow partition 0 far past the cap
    (51L to 300L).map(i => (i * 8, -1.0)).toDF("k", "bal")
      .write.format("graft").mode("append").save(path)
    assert(sizes(spark).max === 300)
    spark.sql("OPTIMIZE catspec_skew")
    val after = sizes(spark)
    assert(after.sum === 300)
    // the hot bucket split three ways (ceil(300/cap)); the second hash
    // is deterministic on this fixed key set, sub-partitions land near
    // the 100-row expectation — and far under the 300-row pile
    assert(after.length === 10)
    assert(after.max <= 130, s"max ${after.max} of ${after.toSeq}")
    // routing stays a pure key function through the two-level
    // partitioner: point probes, IN probes, and a reopen all work
    val s2 = spark.newSession()
    assert(s2.sql("SELECT bal FROM catspec_skew WHERE k = 80")
      .collect()(0).getDouble(0) === 10.0)
    assert(s2.sql("SELECT count(*) FROM catspec_skew WHERE k IN (8, 800, 2400)")
      .collect()(0).getLong(0) === 3)
    assert(s2.sql("SELECT sum(bal) FROM catspec_skew").collect()(0)
      .getDouble(0) === (1L to 50L).map(_.toDouble).sum - 250.0)
    spark.sql("DROP TABLE IF EXISTS catspec_skew")
  }

  test("OPTIMIZE keeps the index-name manifest (maintenance survives)") {
    val path = freshPath("optix")
    spark.sql("DROP TABLE IF EXISTS catspec_optix")
    (1L to 100L).map(k => (k, k % 7, k * 1.0)).toDF("k", "grp", "bal")
      .createOrReplaceTempView("catspec_optix_src")
    spark.sql(s"""CREATE TABLE catspec_optix USING graft
      |OPTIONS (key 'k') LOCATION '$path'
      |AS SELECT * FROM catspec_optix_src""".stripMargin)
    spark.sql("CREATE INDEX g_ix ON catspec_optix (grp)")
    spark.sql("UPDATE catspec_optix SET grp = 50 WHERE k <= 5")
    spark.sql("OPTIMIZE catspec_optix")
    // the manifest survived the base swap: post-OPTIMIZE DML still
    // maintains the index, and the name still resolves for DROP
    spark.sql("UPDATE catspec_optix SET grp = 60 WHERE k IN (1, 2)")
    assert(spark.sql("SELECT count(*) FROM catspec_optix WHERE grp = 60")
      .collect()(0).getLong(0) === 2)
    assert(spark.sql("SELECT count(*) FROM catspec_optix WHERE grp = 50")
      .collect()(0).getLong(0) === 3)
    val s2 = spark.newSession()
    assert(s2.sql("SELECT count(*) FROM catspec_optix WHERE grp = 60")
      .collect()(0).getLong(0) === 2)
    s2.sql("DROP INDEX g_ix ON catspec_optix") // name must still resolve
    spark.sql("DROP TABLE IF EXISTS catspec_optix")
  }

  test("VACUUM RETAIN n HOURS: wall-clock retention, tables and views") {
    val path = freshPath("vh")
    spark.sql("DROP TABLE IF EXISTS catspec_vh")
    (1L to 40L).map(k => (k, k * 1.0)).toDF("k", "bal")
      .createOrReplaceTempView("catspec_vh_src")
    spark.sql(s"""CREATE TABLE catspec_vh USING graft
      |OPTIONS (key 'k') LOCATION '$path'
      |AS SELECT * FROM catspec_vh_src""".stripMargin)
    spark.sql("UPDATE catspec_vh SET bal = 0 WHERE k <= 5")
    spark.sql("DELETE FROM catspec_vh WHERE k > 35")
    // fresh history is younger than a 72h cutoff: nothing folds
    val noop = spark.sql("VACUUM catspec_vh RETAIN 72 HOURS").collect()(0)
    assert(noop.getLong(1) === 0 && noop.getLong(2) === 0)
    // cutoff "now": everything but the current version folds, the
    // survivor keeps its number
    val out = spark.sql("VACUUM catspec_vh RETAIN 0 HOURS").collect()(0)
    assert(out.getLong(1) === 2 && out.getLong(2) === 2 && out.getLong(3) === 2)
    val s2 = spark.newSession()
    assert(s2.sql("SELECT count(*) FROM graft_history('catspec_vh')")
      .collect()(0).getLong(0) === 1)
    assert(s2.sql("SELECT count(*) FROM catspec_vh")
      .collect()(0).getLong(0) === 35)
    // the folded version is gone (matches the RETAIN n VERSIONS verb)
    intercept[Exception](
      s2.sql("SELECT * FROM catspec_vh VERSION AS OF 0").collect())
    // the in-session VIEW chain takes the same verb
    implicit val sp: org.apache.spark.sql.SparkSession = spark
    val h = IndexedFrame.index(
      (1L to 20L).map(k => (k, k * 2.0)).toDF("k", "v"), "k")
    h.toDF.createOrReplaceTempView("catspec_vh_view")
    spark.sql("UPDATE catspec_vh_view SET v = -1 WHERE k <= 3")
    spark.sql("DELETE FROM catspec_vh_view WHERE k = 20")
    val vout = spark.sql("VACUUM catspec_vh_view RETAIN 0 HOURS").collect()(0)
    assert(vout.getLong(1) === 2)
    assert(spark.sql("SELECT count(*) FROM catspec_vh_view")
      .collect()(0).getLong(0) === 19)
    spark.sql("DROP TABLE IF EXISTS catspec_vh")
  }

  test("batched replay equals sequential: interleaved ops, evolution fences") {
    val path = freshPath("batch")
    spark.sql("DROP TABLE IF EXISTS catspec_batch")
    (1L to 30L).map(k => (k, k * 1.0)).toDF("k", "bal")
      .createOrReplaceTempView("catspec_batch_src")
    spark.sql(s"""CREATE TABLE catspec_batch USING graft
      |OPTIONS (key 'k') LOCATION '$path'
      |AS SELECT * FROM catspec_batch_src""".stripMargin)
    // a run of plain deltas with keys touched MULTIPLE times (delete
    // then re-insert, update then update) — last-op-per-key must equal
    // the sequential fold the live session applied
    spark.sql("UPDATE catspec_batch SET bal = bal + 1 WHERE k <= 10")
    spark.sql("DELETE FROM catspec_batch WHERE k BETWEEN 5 AND 8")
    spark.sql("INSERT INTO catspec_batch VALUES (5, 555.0)")
    spark.sql("UPDATE catspec_batch SET bal = bal * 2 WHERE k <= 3")
    // a schema-evolution FENCE mid-chain, then more plain deltas
    spark.sql("ALTER TABLE catspec_batch ADD COLUMNS (note STRING)")
    spark.sql("UPDATE catspec_batch SET note = 'x' WHERE k <= 4")
    spark.sql("DELETE FROM catspec_batch WHERE k = 1")
    val live = spark.sql("SELECT * FROM catspec_batch ORDER BY k")
      .collect().map(_.toSeq).toSeq
    val re = spark.newSession().sql("SELECT * FROM catspec_batch ORDER BY k")
      .collect().map(_.toSeq).toSeq
    assert(re === live)
    assert(live.length === 26) // 30 - 4 deleted (6,7,8 and 1) ; 5 re-inserted
    val m = live.map(r => r.head -> r(1)).toMap
    assert(m(5L) === 555.0 && m(2L) === 6.0 && m(3L) === 8.0)
    spark.sql("DROP TABLE IF EXISTS catspec_batch")
  }

  test("GraftCatalogSink: micro-batches become table versions, exactly-once") {
    val path = freshPath("sink")
    spark.sql("DROP TABLE IF EXISTS catspec_sink")
    (1L to 20L).map(k => (k, 0.0)).toDF("k", "v")
      .createOrReplaceTempView("catspec_sink_src")
    spark.sql(s"""CREATE TABLE catspec_sink USING graft
      |OPTIONS (key 'k') LOCATION '$path'
      |AS SELECT * FROM catspec_sink_src""".stripMargin)
    val sink = GraftCatalogSink.upsertBatch(path, "spec-stream") _
    sink(Seq((1L, 1.0), (21L, 1.0)).toDF("k", "v"), 0L)
    sink(Seq((2L, 2.0)).toDF("k", "v"), 1L)
    assert(GraftCatalogSink.lastCommittedBatch(spark, path, "spec-stream") === 1L)
    // redelivery (restart at-least-once) of a committed id: skipped —
    // no new version, the stale payload never applies
    sink(Seq((2L, 99.0)).toDF("k", "v"), 1L)
    assert(spark.sql("SELECT v FROM catspec_sink WHERE k = 2")
      .collect()(0).getDouble(0) === 2.0)
    assert(spark.sql("SELECT count(*) FROM graft_history('catspec_sink')")
      .collect()(0).getLong(0) === 3) // base + 2 committed batches
    // each batch is an ordinary table version: time travel + CDC work
    assert(spark.sql("SELECT count(*) FROM catspec_sink VERSION AS OF 1")
      .collect()(0).getLong(0) === 21)
    // a reopened session replays the streamed state bit-for-bit
    val s2 = spark.newSession()
    assert(s2.sql("SELECT sum(v) FROM catspec_sink").collect()(0)
      .getDouble(0) === 4.0)
    assert(s2.sql("SELECT count(*) FROM catspec_sink")
      .collect()(0).getLong(0) === 21)
    // crash between delta commit and marker advance: the re-apply of
    // the same upsert batch is a content no-op (one extra version)
    val (fs, _) = (org.apache.hadoop.fs.FileSystem.get(
      new org.apache.hadoop.fs.Path(path).toUri,
      spark.sparkContext.hadoopConfiguration),
      ())
    fs.delete(new org.apache.hadoop.fs.Path(path, "_txn_spec-stream"), false)
    sink(Seq((2L, 2.0)).toDF("k", "v"), 1L) // "redelivered" after the crash
    assert(spark.sql("SELECT sum(v) FROM catspec_sink").collect()(0)
      .getDouble(0) === 4.0) // same content
    spark.sql("DROP TABLE IF EXISTS catspec_sink")
  }

  test("CHECK constraints gate every writer; durable across reopen/OPTIMIZE") {
    val path = freshPath("check")
    spark.sql("DROP TABLE IF EXISTS catspec_check")
    (1L to 50L).map(k => (k, k * 1.0)).toDF("k", "bal")
      .createOrReplaceTempView("catspec_check_src")
    spark.sql(s"""CREATE TABLE catspec_check USING graft
      |OPTIONS (key 'k') LOCATION '$path'
      |AS SELECT * FROM catspec_check_src""".stripMargin)
    assert(spark.sql(
      "ALTER TABLE catspec_check ADD CONSTRAINT pos CHECK (bal >= 0)")
      .collect()(0).getString(2) === "added")
    // a violated ADD is rejected against the existing corpus
    intercept[Exception](spark.sql(
      "ALTER TABLE catspec_check ADD CONSTRAINT big CHECK (bal > 100)"))
    // violating DML aborts BEFORE committing: no new version, no change
    val vBefore = spark.sql(
      "SELECT count(*) FROM graft_history('catspec_check')")
      .collect()(0).getLong(0)
    val e = intercept[Exception](spark.sql(
      "UPDATE catspec_check SET bal = -5 WHERE k = 1"))
    assert(e.getMessage.contains("pos"))
    assert(spark.sql("SELECT count(*) FROM graft_history('catspec_check')")
      .collect()(0).getLong(0) === vBefore)
    assert(spark.sql("SELECT bal FROM catspec_check WHERE k = 1")
      .collect()(0).getDouble(0) === 1.0)
    // passing DML commits; the writer API gates too
    spark.sql("UPDATE catspec_check SET bal = 5 WHERE k = 1")
    intercept[Exception](Seq((60L, -1.0)).toDF("k", "bal")
      .write.format("graft").mode("append").save(path))
    Seq((60L, 60.0)).toDF("k", "bal")
      .write.format("graft").mode("append").save(path)
    // UNKNOWN passes (SQL CHECK semantics): a NULL-valued row commits
    spark.sql("ALTER TABLE catspec_check ADD COLUMNS (note STRING)")
    spark.sql(
      "ALTER TABLE catspec_check ADD CONSTRAINT short CHECK (length(note) < 5)")
    spark.sql("INSERT INTO catspec_check VALUES (61, 1.0, NULL)")
    intercept[Exception](spark.sql(
      "INSERT INTO catspec_check VALUES (62, 1.0, 'toolong')"))
    // the sidecar is durable: a REOPENED session still enforces
    val s2 = spark.newSession()
    intercept[Exception](s2.sql(
      "UPDATE catspec_check SET bal = -1 WHERE k = 2"))
    // ... and survives OPTIMIZE's base swap
    s2.sql("OPTIMIZE catspec_check")
    intercept[Exception](s2.sql(
      "UPDATE catspec_check SET bal = -1 WHERE k = 2"))
    // DROP releases the gate
    s2.sql("ALTER TABLE catspec_check DROP CONSTRAINT pos")
    s2.sql("UPDATE catspec_check SET bal = -1 WHERE k = 2")
    assert(s2.sql("SELECT bal FROM catspec_check WHERE k = 2")
      .collect()(0).getDouble(0) === -1.0)
    spark.sql("DROP TABLE IF EXISTS catspec_check")
  }

  test("CLONE: independent snapshot table carrying indexes and constraints") {
    val srcPath = freshPath("clone_src")
    val dstPath = freshPath("clone_dst")
    spark.sql("DROP TABLE IF EXISTS catspec_csrc")
    spark.sql("DROP TABLE IF EXISTS catspec_cdst")
    (1L to 100L).map(k => (k, k % 7, k * 1.0)).toDF("k", "grp", "bal")
      .createOrReplaceTempView("catspec_clone_src")
    spark.sql(s"""CREATE TABLE catspec_csrc USING graft
      |OPTIONS (key 'k') LOCATION '$srcPath'
      |AS SELECT * FROM catspec_clone_src""".stripMargin)
    spark.sql("CREATE INDEX cg_ix ON catspec_csrc (grp)")
    spark.sql("ALTER TABLE catspec_csrc ADD CONSTRAINT pos CHECK (bal >= 0)")
    spark.sql("UPDATE catspec_csrc SET bal = bal + 10 WHERE k <= 20") // v1
    spark.sql("DELETE FROM catspec_csrc WHERE k > 90")                // v2
    val out = spark.sql(s"""CREATE TABLE catspec_cdst CLONE catspec_csrc
      |VERSION AS OF 1 LOCATION '$dstPath'""".stripMargin).collect()(0)
    assert(out.getLong(1) === 1L && out.getLong(2) === 100L)
    // v1 content: the UPDATE applied, the DELETE not yet
    assert(spark.sql("SELECT count(*) FROM catspec_cdst")
      .collect()(0).getLong(0) === 100)
    assert(spark.sql("SELECT bal FROM catspec_cdst WHERE k = 1")
      .collect()(0).getDouble(0) === 11.0)
    // the secondary index came along (derived for the historical
    // snapshot) and routes
    assert(spark.sql("SELECT count(*) FROM catspec_cdst WHERE grp = 3")
      .collect()(0).getLong(0) === 14) // k ≡ 3 (mod 7), k ≤ 100
    // the constraint came along: a violating write on the CLONE aborts
    intercept[Exception](spark.sql(
      "UPDATE catspec_cdst SET bal = -1 WHERE k = 5"))
    // independence, both directions
    spark.sql("UPDATE catspec_cdst SET bal = 999 WHERE k = 50")
    assert(spark.sql("SELECT bal FROM catspec_csrc WHERE k = 50")
      .collect()(0).getDouble(0) === 50.0)
    spark.sql("DELETE FROM catspec_csrc WHERE k = 60")
    assert(spark.sql("SELECT count(*) FROM catspec_cdst WHERE k = 60")
      .collect()(0).getLong(0) === 1)
    // the clone replays from ITS OWN log in a reopened session
    val s2 = spark.newSession()
    assert(s2.sql("SELECT bal FROM catspec_cdst WHERE k = 50")
      .collect()(0).getDouble(0) === 999.0)
    assert(s2.sql("SELECT count(*) FROM graft_history('catspec_cdst')")
      .collect()(0).getLong(0) === 2) // clone base + its one UPDATE
    // SHALLOW syntax is accepted (aliases deep)
    val dst2 = freshPath("clone_dst2")
    spark.sql("DROP TABLE IF EXISTS catspec_cdst2")
    spark.sql(s"""CREATE TABLE catspec_cdst2 SHALLOW CLONE catspec_csrc
      |LOCATION '$dst2'""".stripMargin)
    assert(spark.sql("SELECT count(*) FROM catspec_cdst2")
      .collect()(0).getLong(0) === 89) // 90 retained - k=60 deleted
    spark.sql("DROP TABLE IF EXISTS catspec_csrc")
    spark.sql("DROP TABLE IF EXISTS catspec_cdst")
    spark.sql("DROP TABLE IF EXISTS catspec_cdst2")
  }

  test("readStream from a graft table: the delta log streams as a change feed") {
    val path = freshPath("feed")
    spark.sql("DROP TABLE IF EXISTS catspec_feed_t")
    (1L to 20L).map(k => (k, k * 1.0)).toDF("k", "v")
      .createOrReplaceTempView("catspec_feed_src")
    spark.sql(s"""CREATE TABLE catspec_feed_t USING graft
      |OPTIONS (key 'k') LOCATION '$path'
      |AS SELECT * FROM catspec_feed_src""".stripMargin)
    val q = spark.readStream.format("graft").option("path", path)
      .option("startingVersion", "0").load()
      .writeStream.format("memory").queryName("catspec_feed")
      .outputMode("append").start()
    // startingVersion 0 = backfill-then-tail: the version-0 corpus
    // arrives as `insert` rows ahead of the delta tail
    val snap = (1L to 20L).map(k => (k, k * 1.0, "insert", 0L)).toSet
    try {
      spark.sql("UPDATE catspec_feed_t SET v = 100 WHERE k <= 3")
      q.processAllAvailable()
      val r1 = spark.table("catspec_feed").collect()
        .map(r => (r.getLong(0), r.get(1), r.getString(2), r.getLong(3)))
      assert(r1.toSet === snap ++ (1L to 3L).map(k => (k, 100.0, "upsert", 1L)))
      spark.sql("DELETE FROM catspec_feed_t WHERE k >= 19")
      q.processAllAvailable()
      val r2 = spark.table("catspec_feed").collect()
        .map(r => (r.getLong(0), r.get(1), r.getString(2), r.getLong(3)))
      // delete rows carry keys with NULL value columns
      assert(r2.toSet === snap ++ (1L to 3L).map(k => (k, 100.0, "upsert", 1L))
        ++ Seq((19L, null, "delete", 2L), (20L, null, "delete", 2L)))
    } finally q.stop()
    // default start: a late subscriber sees only commits AFTER it joins
    val q2 = spark.readStream.format("graft").option("path", path).load()
      .writeStream.format("memory").queryName("catspec_feed2")
      .outputMode("append").start()
    try {
      spark.sql("UPDATE catspec_feed_t SET v = 7 WHERE k = 10")
      q2.processAllAvailable()
      val r3 = spark.table("catspec_feed2").collect()
        .map(r => (r.getLong(0), r.get(1), r.getString(2), r.getLong(3)))
      assert(r3.toSeq === Seq((10L, 7.0, "upsert", 3L)))
    } finally q2.stop()
    spark.sql("DROP TABLE IF EXISTS catspec_feed_t")
  }

  test("change feed: snapshot from a compacted table, rate-limited " +
      "catch-up, and no re-snapshot across a checkpointed restart") {
    val path = freshPath("feedlim")
    spark.sql("DROP TABLE IF EXISTS catspec_fl_t")
    (1L to 10L).map(k => (k, k * 1.0)).toDF("k", "v")
      .createOrReplaceTempView("catspec_fl_src")
    spark.sql(s"""CREATE TABLE catspec_fl_t USING graft
      |OPTIONS (key 'k') LOCATION '$path'
      |AS SELECT * FROM catspec_fl_src""".stripMargin)
    (1 to 3).foreach(i =>
      spark.sql(s"UPDATE catspec_fl_t SET v = ${100 + i} WHERE k = $i"))
    // fold versions 1..3 away: the oldest READABLE version is now 3 —
    // a backfill consumer must get ITS content as the snapshot
    spark.sql("VACUUM catspec_fl_t RETAIN 1 VERSIONS")
    (4 to 9).foreach(i =>
      spark.sql(s"UPDATE catspec_fl_t SET v = ${100 + i} WHERE k = $i"))
    val ckpt = freshPath("feedlim_ckpt")
    val batches =
      new java.util.concurrent.ConcurrentLinkedQueue[(Long, Seq[Long])]()
    def start() = spark.readStream.format("graft").option("path", path)
      .option("startingVersion", "0")
      .option("maxVersionsPerTrigger", "2").load()
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        batches.add((id, df.select("_commit_version").collect()
          .map(_.getLong(0)).toSeq.distinct.sorted))
        ()
      }.start()
    val q = start()
    try q.processAllAvailable() finally q.stop()
    import scala.jdk.CollectionConverters._
    val got = batches.asScala.toSeq.sortBy(_._1)
    // batch 0 = the indivisible snapshot at version 3 (snapshot rows
    // AND version <=3 deltas are all stamped 3); then versions two at
    // a time: (4,5), (6,7), (8,9)
    assert(got.map(_._2) === Seq(Seq(3L), Seq(4L, 5L), Seq(6L, 7L),
      Seq(8L, 9L)), got)
    // restart against the same checkpoint: nothing re-emits (no
    // second snapshot), and a NEW commit flows as an ordinary delta
    batches.clear()
    spark.sql("UPDATE catspec_fl_t SET v = 42 WHERE k = 10")
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val got2 = batches.asScala.toSeq.sortBy(_._1)
    assert(got2.map(_._2) === Seq(Seq(10L)), got2)
    spark.sql("DROP TABLE IF EXISTS catspec_fl_t")
  }

  test("default-start stream on a FRESH table (version 0) emits " +
      "nothing until the first commit — no accidental backfill") {
    val path = freshPath("fresh0")
    spark.sql("DROP TABLE IF EXISTS catspec_fr_t")
    (1L to 20L).map(k => (k, k * 1.0)).toDF("k", "v")
      .createOrReplaceTempView("catspec_fr_src")
    spark.sql(s"""CREATE TABLE catspec_fr_t USING graft
      |OPTIONS (key 'k') LOCATION '$path'
      |AS SELECT * FROM catspec_fr_src""".stripMargin)
    // the table is still at version 0: the DEFAULT start (no
    // startingVersion option) must tail only NEW commits — only an
    // EXPLICIT startingVersion=0 asks for the corpus snapshot
    val q = spark.readStream.format("graft").option("path", path).load()
      .writeStream.format("memory").queryName("catspec_fr")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("catspec_fr").isEmpty,
        "a default-start subscriber of a fresh table got a backfill")
      spark.sql("UPDATE catspec_fr_t SET v = 7 WHERE k = 3")
      q.processAllAvailable()
      val r = spark.table("catspec_fr").collect()
        .map(x => (x.getLong(0), x.get(1), x.getString(2), x.getLong(3)))
      assert(r.toSeq === Seq((3L, 7.0, "upsert", 1L)))
    } finally q.stop()
    spark.sql("DROP TABLE IF EXISTS catspec_fr_t")
  }

  test("startingTimestamp resolves against commit stamps: at-or-after " +
      "rule, pre-history degrades to the snapshot") {
    val path = freshPath("feedts")
    spark.sql("DROP TABLE IF EXISTS catspec_ts_t")
    (1L to 5L).map(k => (k, k * 1.0)).toDF("k", "v")
      .createOrReplaceTempView("catspec_ts_src")
    spark.sql(s"""CREATE TABLE catspec_ts_t USING graft
      |OPTIONS (key 'k') LOCATION '$path'
      |AS SELECT * FROM catspec_ts_src""".stripMargin)
    spark.sql("UPDATE catspec_ts_t SET v = 101 WHERE k = 1") // v1
    Thread.sleep(60) // separate the commit stamps
    spark.sql("UPDATE catspec_ts_t SET v = 102 WHERE k = 2") // v2
    val stamps = GraftTables.deltaTimes(spark, path)
    // ts = v2's own stamp: "at or after" emits exactly v2
    val q = spark.readStream.format("graft").option("path", path)
      .option("startingTimestamp", stamps(1).toString).load()
      .writeStream.format("memory").queryName("catspec_ts")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val r = spark.table("catspec_ts").collect()
        .map(x => (x.getLong(0), x.get(1), x.getString(2), x.getLong(3)))
      assert(r.toSeq === Seq((2L, 102.0, "upsert", 2L)))
    } finally q.stop()
    // ts before every commit = the backfill-then-tail snapshot
    val q2 = spark.readStream.format("graft").option("path", path)
      .option("startingTimestamp", (stamps.head - 10000).toString).load()
      .writeStream.format("memory").queryName("catspec_ts2")
      .outputMode("append").start()
    try {
      q2.processAllAvailable()
      val types = spark.table("catspec_ts2").collect()
        .map(_.getString(2)).groupBy(identity).view.mapValues(_.length).toMap
      assert(types("insert") === 5 && types("upsert") === 2)
    } finally q2.stop()
    // both start options at once is a loud error
    intercept[Exception] {
      spark.readStream.format("graft").option("path", path)
        .option("startingVersion", "0")
        .option("startingTimestamp", "12345").load()
        .writeStream.format("memory").queryName("catspec_ts3")
        .outputMode("append").start().processAllAvailable()
    }
    spark.sql("DROP TABLE IF EXISTS catspec_ts_t")
  }

  test("maxBytesPerTrigger bounds catch-up batches by delta size and " +
      "always advances; huge maxVersionsPerTrigger never overflows") {
    val path = freshPath("feedbytes")
    spark.sql("DROP TABLE IF EXISTS catspec_fb_t")
    (1L to 10L).map(k => (k, k * 1.0)).toDF("k", "v")
      .createOrReplaceTempView("catspec_fb_src")
    spark.sql(s"""CREATE TABLE catspec_fb_t USING graft
      |OPTIONS (key 'k') LOCATION '$path'
      |AS SELECT * FROM catspec_fb_src""".stripMargin)
    (1 to 3).foreach(i =>
      spark.sql(s"UPDATE catspec_fb_t SET v = ${100 + i} WHERE k = $i"))
    val batches =
      new java.util.concurrent.ConcurrentLinkedQueue[Seq[Long]]()
    def run(options: Map[String, String]): Unit = {
      batches.clear()
      val q = options.foldLeft(
        spark.readStream.format("graft").option("path", path)
          .option("startingVersion", "0")) {
        case (r, (k, v)) => r.option(k, v)
      }.load().writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          batches.add(df.select("_commit_version").collect()
            .map(_.getLong(0)).toSeq.distinct.sorted)
          ()
        }.start()
      try q.processAllAvailable() finally q.stop()
    }
    import scala.jdk.CollectionConverters._
    // a 1-byte budget still advances one version per batch (soft
    // limit, Delta's rule) — the snapshot batch stays indivisible
    run(Map("maxBytesPerTrigger" -> "1"))
    assert(batches.asScala.toSeq === Seq(Seq(0L, 1L), Seq(2L), Seq(3L)),
      batches.asScala.toSeq)
    // a generous budget takes the whole log in one batch
    run(Map("maxBytesPerTrigger" -> (64L * 1024 * 1024).toString))
    assert(batches.asScala.toSeq === Seq(Seq(0L, 1L, 2L, 3L)))
    // maxVersionsPerTrigger = Long.MaxValue means unbounded — the
    // rate-limit add must saturate, not wrap negative and stall
    run(Map("maxVersionsPerTrigger" -> Long.MaxValue.toString))
    assert(batches.asScala.toSeq === Seq(Seq(0L, 1L, 2L, 3L)))
    spark.sql("DROP TABLE IF EXISTS catspec_fb_t")
  }

  test("byte-budgeted + timestamp-started stream across a checkpointed " +
      "restart: no re-emission, the rate cursor resyncs") {
    val path = freshPath("feedbr")
    spark.sql("DROP TABLE IF EXISTS catspec_br_t")
    (1L to 10L).map(k => (k, k * 1.0)).toDF("k", "v")
      .createOrReplaceTempView("catspec_br_src")
    spark.sql(s"""CREATE TABLE catspec_br_t USING graft
      |OPTIONS (key 'k') LOCATION '$path'
      |AS SELECT * FROM catspec_br_src""".stripMargin)
    spark.sql("UPDATE catspec_br_t SET v = 101 WHERE k = 1") // v1
    Thread.sleep(60)
    (2 to 4).foreach(i =>
      spark.sql(s"UPDATE catspec_br_t SET v = ${100 + i} WHERE k = $i"))
    val ts = GraftTables.deltaTimes(spark, path)(1) // v2's stamp
    val ckpt = freshPath("feedbr_ckpt")
    val batches = new java.util.concurrent.ConcurrentLinkedQueue[Seq[Long]]()
    def start() = spark.readStream.format("graft").option("path", path)
      .option("startingTimestamp", ts.toString)
      .option("maxBytesPerTrigger", "1").load()
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        batches.add(df.select("_commit_version").collect()
          .map(_.getLong(0)).toSeq.distinct.sorted)
        ()
      }.start()
    val q = start()
    try q.processAllAvailable() finally q.stop()
    import scala.jdk.CollectionConverters._
    // at-or-after v2, one version per 1-byte batch
    assert(batches.asScala.toSeq === Seq(Seq(2L), Seq(3L), Seq(4L)),
      batches.asScala.toSeq)
    // restart: nothing re-emits; a new commit flows rate-limited
    batches.clear()
    spark.sql("UPDATE catspec_br_t SET v = 105 WHERE k = 5")
    spark.sql("UPDATE catspec_br_t SET v = 106 WHERE k = 6")
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    assert(batches.asScala.toSeq === Seq(Seq(5L), Seq(6L)),
      batches.asScala.toSeq)
    spark.sql("DROP TABLE IF EXISTS catspec_br_t")
  }

  test("historical reads never route through newer-version sidecars") {
    val path = freshPath("stale")
    spark.sql("DROP TABLE IF EXISTS catspec_stale")
    (1L to 100L).map(k => (k, k % 5, k * 1.0)).toDF("k", "grp", "bal")
      .createOrReplaceTempView("catspec_stale_src")
    spark.sql(s"""CREATE TABLE catspec_stale USING graft
      |OPTIONS (key 'k') LOCATION '$path'
      |AS SELECT * FROM catspec_stale_src""".stripMargin)
    // v1 moves keys 1..10 into grp 9, THEN the index persists — its
    // postings reflect v1, not the base version
    spark.sql("UPDATE catspec_stale SET grp = 9 WHERE k <= 10")
    spark.sql("CREATE INDEX sg_ix ON catspec_stale (grp)")
    // a reopened HISTORICAL read at v0 must see v0's groups exactly —
    // pre-fix, the restored v1 postings dropped k=5 and k=10 from
    // grp 0 (false negatives)
    val s2 = spark.newSession()
    assert(s2.sql(
      "SELECT count(*) FROM catspec_stale VERSION AS OF 0 WHERE grp = 0")
      .collect()(0).getLong(0) === 20)
    assert(s2.sql(
      "SELECT count(*) FROM catspec_stale VERSION AS OF 0 WHERE grp = 9")
      .collect()(0).getLong(0) === 0)
    // the CURRENT version still routes (and is right) after the strip
    assert(s2.sql("SELECT count(*) FROM catspec_stale WHERE grp = 9")
      .collect()(0).getLong(0) === 10)
    assert(s2.sql("SELECT count(*) FROM catspec_stale WHERE grp = 0")
      .collect()(0).getLong(0) === 18)
    spark.sql("DROP TABLE IF EXISTS catspec_stale")
  }

  test("incremental index maintenance on a COMPOSITE-key table") {
    val path = freshPath("incr2")
    spark.sql("DROP TABLE IF EXISTS catspec_incr2")
    (1L to 120L).map(k => (k % 4, k, k % 6, k * 1.0))
      .toDF("a", "b", "grp", "bal").createOrReplaceTempView("catspec_incr2_src")
    spark.sql(s"""CREATE TABLE catspec_incr2 USING graft
      |OPTIONS (key 'a,b') LOCATION '$path'
      |AS SELECT * FROM catspec_incr2_src""".stripMargin)
    spark.sql("CREATE INDEX g2_ix ON catspec_incr2 (grp)")
    // move every b<=12 into grp 50; the composite transplant must
    // retract old postings and add new ones
    spark.sql("UPDATE catspec_incr2 SET grp = 50 WHERE b <= 12")
    assert(spark.sql("SELECT count(*) FROM catspec_incr2 WHERE grp = 50")
      .collect()(0).getLong(0) === 12)
    assert(spark.sql("SELECT sum(b) FROM catspec_incr2 WHERE grp = 1")
      .collect()(0).getLong(0) === (13L to 115L by 6).sum)
    // empty a grp entirely: exact distinct count must drop
    spark.sql("DELETE FROM catspec_incr2 WHERE grp = 50")
    assert(spark.sql("SELECT count(DISTINCT grp) FROM catspec_incr2")
      .collect()(0).getLong(0) === 6) // residues 0..5 all survive b>12
    val s2 = spark.newSession()
    assert(s2.sql("SELECT count(DISTINCT grp) FROM catspec_incr2")
      .collect()(0).getLong(0) === 6)
    assert(s2.sql("SELECT count(*) FROM catspec_incr2")
      .collect()(0).getLong(0) === 108)
    spark.sql("DROP TABLE IF EXISTS catspec_incr2")
  }

  test("zone maps widen with upserts: out-of-bounds rows are never falsely pruned") {
    val path = freshPath("zones")
    spark.sql("DROP TABLE IF EXISTS catspec_zones")
    (1L to 200L).map(k => (k, k * 1.0)).toDF("k", "bal")
      .createOrReplaceTempView("catspec_zones_src")
    spark.sql(s"""CREATE TABLE catspec_zones USING graft
      |OPTIONS (key 'k') LOCATION '$path'
      |AS SELECT * FROM catspec_zones_src""".stripMargin)
    spark.sql("CREATE INDEX bz ON catspec_zones USING ZONEMAP (bal)")
    // every partition's bal bound is <= 200; upsert a value FAR above
    // — the incremental widen must grow the owning partition's bounds,
    // else the pruned scan would falsely drop the row
    spark.sql("UPDATE catspec_zones SET bal = 100000 WHERE k = 7")
    assert(spark.sql("SELECT k FROM catspec_zones WHERE bal > 50000")
      .collect().map(_.getLong(0)).toSeq === Seq(7L))
    spark.sql("INSERT INTO catspec_zones VALUES (500, -100000)")
    assert(spark.sql("SELECT k FROM catspec_zones WHERE bal < -50000")
      .collect().map(_.getLong(0)).toSeq === Seq(500L))
    // deletes keep sound (wide) bounds; values still correct
    spark.sql("DELETE FROM catspec_zones WHERE k = 7")
    assert(spark.sql("SELECT count(*) FROM catspec_zones WHERE bal > 50000")
      .collect()(0).getLong(0) === 0)
    spark.sql("DROP TABLE IF EXISTS catspec_zones")
  }

  test("DESCRIBE HISTORY / DESCRIBE DETAIL: the operator-facing verbs") {
    val path = freshPath("desc")
    spark.sql("DROP TABLE IF EXISTS catspec_desc")
    (1L to 60L).map(k => (k, k * 1.0)).toDF("k", "bal")
      .createOrReplaceTempView("catspec_desc_src")
    spark.sql(s"""CREATE TABLE catspec_desc USING graft
      |OPTIONS (key 'k', maxpart '1000') LOCATION '$path'
      |AS SELECT * FROM catspec_desc_src""".stripMargin)
    spark.sql("CREATE INDEX db_ix ON catspec_desc (bal)")
    spark.sql("ALTER TABLE catspec_desc ADD CONSTRAINT pos CHECK (bal >= 0)")
    spark.sql("UPDATE catspec_desc SET bal = 0 WHERE k = 1")
    // HISTORY = the graft_history TVF as a statement
    val hist = spark.sql("DESCRIBE HISTORY catspec_desc").collect()
    assert(hist.length === 2 &&
      hist.map(_.getLong(0)).toSeq === Seq(0L, 1L))
    val d = spark.sql("DESC DETAIL catspec_desc").collect()(0)
    assert(d.getString(0) === "catspec_desc" && d.getString(1) === "graft")
    assert(d.getString(3) === "k")
    assert(d.getLong(4) === 60 && d.getLong(6) === 0 && d.getLong(7) === 1)
    assert(d.getString(8).contains("db_ix"))
    assert(d.getString(9).contains("pos: CHECK"))
    assert(d.getLong(10) === 1000L)
    spark.sql("DROP TABLE IF EXISTS catspec_desc")
  }

  test("a torn _tver marker self-heals from the delta walk") {
    val path = freshPath("torn")
    spark.sql("DROP TABLE IF EXISTS catspec_torn")
    (1L to 30L).map(k => (k, k * 1.0)).toDF("k", "bal")
      .createOrReplaceTempView("catspec_torn_src")
    spark.sql(s"""CREATE TABLE catspec_torn USING graft
      |OPTIONS (key 'k') LOCATION '$path'
      |AS SELECT * FROM catspec_torn_src""".stripMargin)
    spark.sql("UPDATE catspec_torn SET bal = 100 WHERE k <= 3")
    spark.sql("DELETE FROM catspec_torn WHERE k = 30")
    // a crash mid-rewrite leaves an EMPTY _tver; reads must derive the
    // version from the committed deltas instead of throwing
    java.nio.file.Files.write(java.nio.file.Paths.get(path, "_tver"),
      Array.empty[Byte])
    val s2 = spark.newSession()
    assert(s2.sql("SELECT count(*) FROM catspec_torn")
      .collect()(0).getLong(0) === 29)
    assert(s2.sql("SELECT bal FROM catspec_torn WHERE k = 2")
      .collect()(0).getDouble(0) === 100.0)
    assert(s2.sql("SELECT count(*) FROM graft_history('catspec_torn')")
      .collect()(0).getLong(0) === 3)
    // and the next DML repairs the marker on its way through
    s2.sql("UPDATE catspec_torn SET bal = 7 WHERE k = 9")
    val s3 = spark.newSession()
    assert(s3.sql("SELECT bal FROM catspec_torn WHERE k = 9")
      .collect()(0).getDouble(0) === 7.0)
    spark.sql("DROP TABLE IF EXISTS catspec_torn")
  }
}
