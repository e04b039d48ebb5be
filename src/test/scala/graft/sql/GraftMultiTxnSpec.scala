package graft.sql

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSessionFixture

/**
 * Atomic multi-table transactions ([[GraftTables.commitTxnChange]]):
 * one coordinator marker is the single commit point for a write set
 * spanning several graft tables — a crash ANYWHERE before it leaves
 * every table at its pre-transaction version (the pending members are
 * reclaimed like any crashed claim), a crash anywhere after it commits
 * every table (readers honor pending metas whose coordinator exists
 * and finalize them on read).
 */
class GraftMultiTxnSpec extends AnyFunSuite {

  private lazy val spark = SparkSessionFixture.spark
  import spark.implicits._

  private def freshPath(name: String): String = {
    val p = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), s"graft_mtxn_$name").toString
    new scala.reflect.io.Directory(new java.io.File(p)).deleteRecursively()
    p
  }

  private def mkTable(name: String, path: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    (1L to 10L).map(k => (k, k * 1.0)).toDF("k", "v")
      .createOrReplaceTempView(s"${name}_src")
    spark.sql(s"""CREATE TABLE $name USING graft
      |OPTIONS (key 'k') LOCATION '$path'
      |AS SELECT * FROM ${name}_src""".stripMargin)
  }

  private def state(name: String): (Long, Map[Long, Double]) = {
    val s2 = spark.newSession() // cold: disk is the only truth
    val n = s2.sql(s"SELECT count(*) FROM graft_history('$name')")
      .collect()(0).getLong(0)
    val m = s2.sql(s"SELECT k, v FROM $name").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    (n, m)
  }

  test("commit: both tables advance together, replayable cold") {
    val (pa, pb) = (freshPath("ca"), freshPath("cb"))
    mkTable("mtxn_a", pa); mkTable("mtxn_b", pb)
    GraftTables.commitTxnChange(spark, Seq(
      (pa, Some(Seq(Tuple1(10L)).toDF("k")), Some(Seq((1L, -1.0)).toDF("k", "v"))),
      (pb, None, Some(Seq((99L, 9.0)).toDF("k", "v")))))
    val (va, ma) = state("mtxn_a")
    val (vb, mb) = state("mtxn_b")
    assert(va === 2 && vb === 2)
    assert(ma(1L) === -1.0 && !ma.contains(10L) && ma.size === 9)
    assert(mb(99L) === 9.0 && mb.size === 11)
    spark.sql("DROP TABLE IF EXISTS mtxn_a")
    spark.sql("DROP TABLE IF EXISTS mtxn_b")
  }

  test("a crash BETWEEN the promotes and the coordinator aborts BOTH " +
      "tables; the slots are reclaimed and later writers proceed") {
    val (pa, pb) = (freshPath("aa"), freshPath("ab"))
    mkTable("mtxn_aa", pa); mkTable("mtxn_ab", pb)
    val savedTimeout = GraftTables.claimTimeoutMillis
    GraftTables.txnCrashHook = phase =>
      if (phase == "promoted") sys.error("simulated crash before commit point")
    try {
      intercept[RuntimeException](GraftTables.commitTxnChange(spark, Seq(
        (pa, None, Some(Seq((1L, 111.0)).toDF("k", "v"))),
        (pb, None, Some(Seq((1L, 222.0)).toDF("k", "v"))))))
      GraftTables.txnCrashHook = _ => ()
      // NOTHING committed: both cold-read at their pre-txn versions
      val (va, ma) = state("mtxn_aa")
      val (vb, mb) = state("mtxn_ab")
      assert(va === 1 && vb === 1)
      assert(ma(1L) === 1.0 && mb(1L) === 1.0)
      // the dead pending members are reclaimed (the abort) and an
      // ordinary writer commits the version number they squatted
      GraftTables.claimTimeoutMillis = 400L
      spark.sql("UPDATE mtxn_aa SET v = 5 WHERE k = 2")
      spark.sql("UPDATE mtxn_ab SET v = 6 WHERE k = 2")
      val (va2, ma2) = state("mtxn_aa")
      val (vb2, mb2) = state("mtxn_ab")
      assert(va2 === 2 && ma2(2L) === 5.0 && ma2(1L) === 1.0)
      assert(vb2 === 2 && mb2(2L) === 6.0 && mb2(1L) === 1.0)
    } finally {
      GraftTables.txnCrashHook = _ => ()
      GraftTables.claimTimeoutMillis = savedTimeout
    }
    spark.sql("DROP TABLE IF EXISTS mtxn_aa")
    spark.sql("DROP TABLE IF EXISTS mtxn_ab")
  }

  test("a member claim stolen between promote and the commit point " +
      "aborts the WHOLE transaction — never a half-applied commit") {
    val (pa, pb) = (freshPath("sa"), freshPath("sb"))
    mkTable("mtxn_sa", pa); mkTable("mtxn_sb", pb)
    // a rival's stealDead reclaims table B's pending member (claim
    // re-owned under a stealer id) while the coordinator has not
    // landed — the pre-coordinator ownership re-check must abort with
    // NOTHING committed on EITHER table, not land the coordinator and
    // commit the surviving member
    GraftTables.txnCrashHook = phase =>
      if (phase == "promoted") {
        val fs = org.apache.hadoop.fs.FileSystem.get(
          new org.apache.hadoop.fs.Path(pb).toUri,
          spark.sparkContext.hadoopConfiguration)
        val claim = new org.apache.hadoop.fs.Path(
          f"$pb%s/_tdelta_${1L}%06d/_claim")
        fs.delete(claim, false)
        val out = fs.create(claim, false)
        try out.write(s"steal-rival:${System.currentTimeMillis()}".getBytes(
          java.nio.charset.StandardCharsets.UTF_8))
        finally out.close()
      }
    try {
      val e = intercept[IllegalArgumentException](
        GraftTables.commitTxnChange(spark, Seq(
          (pa, None, Some(Seq((1L, 111.0)).toDF("k", "v"))),
          (pb, None, Some(Seq((1L, 222.0)).toDF("k", "v"))))))
      assert(e.getMessage.contains("transaction integrity"), e.getMessage)
    } finally GraftTables.txnCrashHook = _ => ()
    // nothing committed anywhere: both cold-read at their pre-txn state
    val (va, ma) = state("mtxn_sa")
    val (vb, mb) = state("mtxn_sb")
    assert(va === 1 && vb === 1)
    assert(ma(1L) === 1.0 && mb(1L) === 1.0)
    spark.sql("DROP TABLE IF EXISTS mtxn_sa")
    spark.sql("DROP TABLE IF EXISTS mtxn_sb")
  }

  test("a crash AFTER the coordinator commits BOTH tables: cold readers " +
      "honor the pending members and finalize them") {
    val (pa, pb) = (freshPath("pa"), freshPath("pb"))
    mkTable("mtxn_pa", pa); mkTable("mtxn_pb", pb)
    GraftTables.txnCrashHook = phase =>
      if (phase == "committed") sys.error("simulated crash after commit point")
    try {
      intercept[RuntimeException](GraftTables.commitTxnChange(spark, Seq(
        (pa, None, Some(Seq((1L, 111.0)).toDF("k", "v"))),
        (pb, None, Some(Seq((1L, 222.0)).toDF("k", "v"))))))
    } finally GraftTables.txnCrashHook = _ => ()
    // the coordinator landed: BOTH tables committed, even though no
    // _tver advanced and no meta finalized before the "crash"
    val (va, ma) = state("mtxn_pa")
    val (vb, mb) = state("mtxn_pb")
    assert(va === 2 && vb === 2)
    assert(ma(1L) === 111.0 && mb(1L) === 222.0)
    spark.sql("DROP TABLE IF EXISTS mtxn_pa")
    spark.sql("DROP TABLE IF EXISTS mtxn_pb")
  }

  test("transactBatch: atomic AND exactly-once — a redelivered batch " +
      "skips every table") {
    val (pa, pb) = (freshPath("ta"), freshPath("tb"))
    mkTable("mtxn_ta", pa); mkTable("mtxn_tb", pb)
    def writes(v: Double) = Seq(
      (pa, None, Some(Seq((1L, v)).toDF("k", "v"))),
      (pb, None, Some(Seq((1L, v * 10)).toDF("k", "v"))))
    GraftCatalogSink.transactBatch(spark, writes(5.0), "stream-t", 0L)
    // restart redelivery of batch 0: no new versions anywhere
    GraftCatalogSink.transactBatch(spark, writes(5.0), "stream-t", 0L)
    assert(state("mtxn_ta")._1 === 2 && state("mtxn_tb")._1 === 2)
    // the next batch flows into both
    GraftCatalogSink.transactBatch(spark, writes(7.0), "stream-t", 1L)
    val (va, ma) = state("mtxn_ta")
    val (vb, mb) = state("mtxn_tb")
    assert(va === 3 && ma(1L) === 7.0)
    assert(vb === 3 && mb(1L) === 70.0)
    spark.sql("DROP TABLE IF EXISTS mtxn_ta")
    spark.sql("DROP TABLE IF EXISTS mtxn_tb")
  }

  test("a CHECK violation on EITHER table aborts the whole transaction " +
      "before anything claims") {
    val (pa, pb) = (freshPath("ka"), freshPath("kb"))
    mkTable("mtxn_ka", pa); mkTable("mtxn_kb", pb)
    spark.sql("ALTER TABLE mtxn_kb ADD CONSTRAINT nonneg CHECK (v >= 0)")
    val e = intercept[Exception](GraftTables.commitTxnChange(spark, Seq(
      (pa, None, Some(Seq((1L, 5.0)).toDF("k", "v"))),
      (pb, None, Some(Seq((1L, -5.0)).toDF("k", "v"))))))
    assert(e.getMessage.contains("CHECK constraint 'nonneg'"), e.getMessage)
    // NEITHER table advanced — not even the one whose rows were valid
    assert(state("mtxn_ka")._1 === 1 && state("mtxn_kb")._1 === 1)
    assert(state("mtxn_ka")._2(1L) === 1.0)
    spark.sql("DROP TABLE IF EXISTS mtxn_ka")
    spark.sql("DROP TABLE IF EXISTS mtxn_kb")
  }

  test("rival single-table DML racing the transaction: both land, " +
      "no corruption") {
    val (pa, pb) = (freshPath("ra"), freshPath("rb"))
    mkTable("mtxn_ra", pa); mkTable("mtxn_rb", pb)
    // a rival claims the next version of table A before the txn runs —
    // the txn must release, wait, and retry on top of it
    assert(GraftTables.claimDelta(spark, pa, 1L))
    val done = new java.util.concurrent.CountDownLatch(1)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    new Thread(() => {
      try GraftTables.commitTxnChange(spark, Seq(
        (pa, None, Some(Seq((50L, 1.0)).toDF("k", "v"))),
        (pb, None, Some(Seq((50L, 2.0)).toDF("k", "v")))))
      catch { case e: Throwable => errs.add(e); () }
      finally done.countDown()
    }).start()
    Thread.sleep(400)
    assert(done.getCount === 1) // blocked on the rival's claim
    val h = GraftTables.current(spark, pa)._2
    GraftTables.writeDelta(spark, pa, 1L, truncate = false, None,
      Some(Seq((60L, 6.0)).toDF("k", "v")), h.schema, h.keyCols)
    assert(done.await(60, java.util.concurrent.TimeUnit.SECONDS))
    if (!errs.isEmpty) throw errs.peek()
    val (va, ma) = state("mtxn_ra")
    val (vb, mb) = state("mtxn_rb")
    assert(va === 3 && ma(60L) === 6.0 && ma(50L) === 1.0)
    assert(vb === 2 && mb(50L) === 2.0)
    spark.sql("DROP TABLE IF EXISTS mtxn_ra")
    spark.sql("DROP TABLE IF EXISTS mtxn_rb")
  }
}
