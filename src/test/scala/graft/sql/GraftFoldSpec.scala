package graft.sql

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSessionFixture

/**
 * Tiered delta folding ([[GraftTables.maybeFold]]): every K commits,
 * runs of plain deltas pre-merge into `_tfold_<lo>_<hi>` sidecars and
 * adjacent equal-span folds tier-merge LSM-style, so a cold reopen
 * covers the log with O(K log_K n) segments instead of replaying every
 * delta — with ZERO user OPTIMIZE calls. Folds are acceleration, not
 * truth: raw deltas stay (time travel, change feed), torn folds are
 * ignored, and replay through folds must be bit-identical to the
 * sequential statement chain.
 */
class GraftFoldSpec extends AnyFunSuite {

  private lazy val spark = SparkSessionFixture.spark
  import spark.implicits._

  private def freshPath(name: String): String = {
    val p = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), s"graft_foldspec_$name").toString
    new scala.reflect.io.Directory(new java.io.File(p)).deleteRecursively()
    p
  }

  private def foldDirs(path: String): Seq[String] = {
    val d = new java.io.File(path)
    Option(d.list()).map(_.toSeq.filter(_.startsWith("_tfold_")).sorted)
      .getOrElse(Nil)
  }

  private def withFoldEvery[A](k: Int)(body: => A): A = {
    // synchronous folds: these specs assert on fold/manifest state
    // right after specific statements
    val saved = (GraftTables.foldEvery, GraftTables.foldAsync)
    GraftTables.foldEvery = k
    GraftTables.foldAsync = false
    try body finally {
      GraftTables.foldEvery = saved._1
      GraftTables.foldAsync = saved._2
    }
  }

  test("ASYNC fold maintenance: a stuck folder never blocks commits, " +
      "and the pass catches up once unstuck") {
    val path = freshPath("async")
    val savedK = GraftTables.foldEvery
    val savedA = GraftTables.foldAsync
    GraftTables.foldEvery = 3
    GraftTables.foldAsync = true
    val gate = new java.util.concurrent.CountDownLatch(1)
    GraftTables.foldPassHook = () => gate.await()
    try {
      spark.sql("DROP TABLE IF EXISTS foldspec_async")
      (1L to 30L).map(k => (k, k * 1.0)).toDF("k", "bal")
        .createOrReplaceTempView("foldspec_async_src")
      spark.sql(s"""CREATE TABLE foldspec_async USING graft
        |OPTIONS (key 'k') LOCATION '$path'
        |AS SELECT * FROM foldspec_async_src""".stripMargin)
      // 7 commits while the fold worker is STUCK on the hook: every
      // statement must return promptly (the fold job is off the
      // statement path) and no fold lands yet
      (1 to 7).foreach(i =>
        spark.sql(s"UPDATE foldspec_async SET bal = ${100 + i} WHERE k = $i"))
      assert(foldDirs(path).isEmpty,
        "a stuck fold worker must not have produced folds")
      assert(spark.sql("SELECT bal FROM foldspec_async WHERE k = 3")
        .collect()(0).getDouble(0) === 103.0)
      // unstick: the queued (coalesced) pass folds the whole backlog
      GraftTables.foldPassHook = () => ()
      gate.countDown()
      assert(GraftTables.awaitFolds(), "fold drain timed out")
      assert(foldDirs(path).nonEmpty,
        "the unstuck worker should have folded the backlog")
      // cold replay through the late folds is exact
      val cold = spark.newSession()
        .sql("SELECT k, bal FROM foldspec_async ORDER BY k").collect()
        .map(r => (r.getLong(0), r.getDouble(1)))
      (1 to 7).foreach(i => assert(cold(i - 1) === ((i.toLong, 100.0 + i))))
      assert(cold(9) === ((10L, 10.0)))
    } finally {
      GraftTables.foldPassHook = () => ()
      gate.countDown()
      GraftTables.foldEvery = savedK
      GraftTables.foldAsync = savedA
      spark.sql("DROP TABLE IF EXISTS foldspec_async")
    }
  }

  test("tiered folds appear at the cadence and replay bit-for-bit") {
    val path = freshPath("tier")
    spark.sql("DROP TABLE IF EXISTS foldspec_t")
    (1L to 60L).map(k => (k, k * 1.0)).toDF("k", "bal")
      .createOrReplaceTempView("foldspec_src")
    withFoldEvery(3) {
      spark.sql(s"""CREATE TABLE foldspec_t USING graft
        |OPTIONS (key 'k') LOCATION '$path'
        |AS SELECT * FROM foldspec_src""".stripMargin)
      // 9 plain statements: level-0 folds at v=3,6,9 then the tier
      // merge collapses the three span-3 folds into one span-9 fold
      (1 to 9).foreach { i =>
        if (i % 4 == 0)
          spark.sql(s"DELETE FROM foldspec_t WHERE k = ${50 + i}")
        else
          spark.sql(s"UPDATE foldspec_t SET bal = bal + $i WHERE k <= ${i * 3}")
      }
    }
    val dirs = foldDirs(path)
    assert(dirs.contains("_tfold_000001_000009"), s"tier fold missing: $dirs")
    assert(dirs.contains("_tfold_000001_000003"), s"level-0 fold missing: $dirs")
    // a brand-new session replays base + folds; the LIVE chain never
    // used them — the two must agree on every row
    val live = spark.sql("SELECT k, bal FROM foldspec_t ORDER BY k")
      .collect().map(_.toSeq).toSeq
    val re = spark.newSession()
      .sql("SELECT k, bal FROM foldspec_t ORDER BY k")
      .collect().map(_.toSeq).toSeq
    assert(re === live)
    assert(live.size === 58) // 60 - deletes of k=54, k=58
    // time travel INTO the middle of a fold still reads the raw deltas
    val mid = spark.newSession()
      .sql("SELECT bal FROM foldspec_t VERSION AS OF 2 WHERE k = 1")
      .collect()(0).getDouble(0)
    assert(mid === 4.0) // base 1.0 + statements 1 and 2
    // history intact: base + 9 commits
    assert(spark.newSession()
      .sql("SELECT count(*) FROM graft_history('foldspec_t')")
      .collect()(0).getLong(0) === 10)
    spark.sql("DROP TABLE IF EXISTS foldspec_t")
  }

  test("folds never span a schema-evolution fence; replay stays exact") {
    val path = freshPath("fence")
    spark.sql("DROP TABLE IF EXISTS foldspec_f")
    (1L to 30L).map(k => (k, k * 1.0)).toDF("k", "bal")
      .createOrReplaceTempView("foldspec_fsrc")
    withFoldEvery(3) {
      spark.sql(s"""CREATE TABLE foldspec_f USING graft
        |OPTIONS (key 'k') LOCATION '$path'
        |AS SELECT * FROM foldspec_fsrc""".stripMargin)
      (1 to 2).foreach(i =>
        spark.sql(s"UPDATE foldspec_f SET bal = bal + 1 WHERE k <= $i"))
      spark.sql("ALTER TABLE foldspec_f ADD COLUMN tag STRING") // v3 fence
      (1 to 6).foreach(i =>
        spark.sql(s"UPDATE foldspec_f SET tag = 't$i' WHERE k = $i"))
    }
    // versions 1..2 sit before the fence and must stay unfolded;
    // 4..9 fold in two span-3 chunks
    val dirs = foldDirs(path)
    assert(dirs.forall(_.stripPrefix("_tfold_").split("_")(0).toLong > 3),
      s"a fold crossed the schema fence: $dirs")
    assert(dirs.contains("_tfold_000004_000006"), s"post-fence folds: $dirs")
    val re = spark.newSession()
      .sql("SELECT k, bal, tag FROM foldspec_f WHERE k <= 6 ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
    assert(re.toSeq === (1L to 6L).map(k =>
      (k, k + (if (k <= 1) 2.0 else if (k <= 2) 1.0 else 0.0), s"t$k")))
    spark.sql("DROP TABLE IF EXISTS foldspec_f")
  }

  test("a torn fold (no _meta) is invisible; replay falls back to raw deltas") {
    val path = freshPath("torn")
    spark.sql("DROP TABLE IF EXISTS foldspec_torn")
    (1L to 10L).map(k => (k, k * 1.0)).toDF("k", "bal")
      .createOrReplaceTempView("foldspec_tornsrc")
    withFoldEvery(0) { // no real folds
      spark.sql(s"""CREATE TABLE foldspec_torn USING graft
        |OPTIONS (key 'k') LOCATION '$path'
        |AS SELECT * FROM foldspec_tornsrc""".stripMargin)
      (1 to 4).foreach(i =>
        spark.sql(s"UPDATE foldspec_torn SET bal = bal + 1 WHERE k <= $i"))
    }
    // a crashed folder's torn attempt: the dir exists, `_meta` does not
    assert(new java.io.File(s"$path/_tfold_000001_000003/up").mkdirs())
    val re = spark.newSession()
      .sql("SELECT sum(bal) FROM foldspec_torn").collect()(0).getDouble(0)
    assert(re === (1L to 10L).map(_.toDouble).sum + 4 + 3 + 2 + 1)
    spark.sql("DROP TABLE IF EXISTS foldspec_torn")
  }

  test("VACUUM keeps folds inside the retained range, drops the rest") {
    val path = freshPath("vac")
    spark.sql("DROP TABLE IF EXISTS foldspec_v")
    (1L to 20L).map(k => (k, k * 1.0)).toDF("k", "bal")
      .createOrReplaceTempView("foldspec_vsrc")
    withFoldEvery(2) {
      spark.sql(s"""CREATE TABLE foldspec_v USING graft
        |OPTIONS (key 'k') LOCATION '$path'
        |AS SELECT * FROM foldspec_vsrc""".stripMargin)
      (1 to 8).foreach(i =>
        spark.sql(s"UPDATE foldspec_v SET bal = bal + 1 WHERE k <= $i"))
      // folds now cover 1..8 in tiers; retain the last 3 versions
      // (6, 7, 8) — every fold touching v <= 5 must drop
      spark.sql("VACUUM foldspec_v RETAIN 3 VERSIONS")
    }
    val dirs = foldDirs(path)
    assert(dirs.forall(_.stripPrefix("_tfold_").split("_")(0).toLong > 5),
      s"a fold survived into the folded-away range: $dirs")
    val re = spark.newSession()
      .sql("SELECT bal FROM foldspec_v WHERE k = 1").collect()(0).getDouble(0)
    assert(re === 9.0)
    assert(spark.newSession()
      .sql("SELECT count(*) FROM graft_history('foldspec_v')")
      .collect()(0).getLong(0) === 3)
    spark.sql("DROP TABLE IF EXISTS foldspec_v")
  }

  test("secondary indexes and zones survive a FOLDED reopen and keep routing") {
    implicit val sp: org.apache.spark.sql.SparkSession = spark
    val path = freshPath("sidecar")
    spark.sql("DROP TABLE IF EXISTS foldspec_sc")
    (1L to 200L).map(k => (k, k % 10, k * 1.0))
      .toDF("k", "grp", "bal").createOrReplaceTempView("foldspec_scsrc")
    withFoldEvery(3) {
      spark.sql(s"""CREATE TABLE foldspec_sc USING graft
        |OPTIONS (key 'k') LOCATION '$path'
        |AS SELECT * FROM foldspec_scsrc""".stripMargin)
      spark.sql("CREATE INDEX grp_ix ON foldspec_sc (grp)")
      spark.sql("CREATE INDEX bal_zx ON foldspec_sc USING ZONEMAP (bal)")
      (1 to 8).foreach(i => spark.sql(
        s"UPDATE foldspec_sc SET grp = 99 WHERE k = ${i * 7}"))
    }
    assert(foldDirs(path).nonEmpty)
    // the reopened session's replay runs THROUGH fold segments with
    // the incremental sidecar carry — postings must route the moved
    // keys exactly (no stale grp entries, no missing 99s)
    val s2 = spark.newSession()
    val moved = s2.sql("SELECT k FROM foldspec_sc WHERE grp = 99 ORDER BY k")
      .collect().map(_.getLong(0)).toSeq
    assert(moved === (1 to 8).map(_ * 7L))
    val h = GraftTables.current(s2, path)._2.handleAny
      .asInstanceOf[IndexedFrame.Handle[_]]
    assert(h.lastScanKind.startsWith("secondary"), h.lastScanKind)
    // keys moved OUT of their old postings
    assert(s2.sql("SELECT count(*) FROM foldspec_sc WHERE grp = 7")
      .collect()(0).getLong(0) ===
      (7L to 200L by 10).count(k => !(1 to 8).map(_ * 7L).contains(k)))
    spark.sql("DROP TABLE IF EXISTS foldspec_sc")
  }

  test("orphan sweep GCs abandoned stage/grave/foldtmp dirs by age") {
    val path = freshPath("sweep")
    spark.sql("DROP TABLE IF EXISTS foldspec_s")
    (1L to 10L).map(k => (k, k * 1.0)).toDF("k", "bal")
      .createOrReplaceTempView("foldspec_ssrc")
    spark.sql(s"""CREATE TABLE foldspec_s USING graft
      |OPTIONS (key 'k') LOCATION '$path'
      |AS SELECT * FROM foldspec_ssrc""".stripMargin)
    Seq("_tstage_dead", "_tgrave_x", "_tfoldtmp_y").foreach(n =>
      assert(new java.io.File(s"$path/$n").mkdirs()))
    val saved = GraftTables.orphanSweepAgeMillis
    try {
      // young orphans survive a sweep...
      GraftTables.orphanSweepAgeMillis = 3600000L
      spark.sql("OPTIMIZE foldspec_s")
      // (OPTIMIZE rebases through a sibling-dir swap, which itself
      // drops root orphans — so re-create and sweep via VACUUM, the
      // non-rewriting maintenance verb, for the age assertion)
      Seq("_tstage_dead2", "_tgrave_x2", "_tfoldtmp_y2").foreach(n =>
        assert(new java.io.File(s"$path/$n").mkdirs()))
      spark.sql("VACUUM foldspec_s RETAIN 1 VERSIONS")
      val names = new java.io.File(path).list().toSeq
      assert(names.contains("_tstage_dead2") && names.contains("_tgrave_x2"))
      // ...old ones are GCed
      GraftTables.orphanSweepAgeMillis = 0L
      Thread.sleep(20)
      spark.sql("VACUUM foldspec_s RETAIN 1 VERSIONS")
      val after = new java.io.File(path).list().toSeq
      assert(!after.exists(n => n.startsWith("_tstage_") ||
        n.startsWith("_tgrave_") || n.startsWith("_tfoldtmp_")), after)
    } finally GraftTables.orphanSweepAgeMillis = saved
    spark.sql("DROP TABLE IF EXISTS foldspec_s")
  }
}
