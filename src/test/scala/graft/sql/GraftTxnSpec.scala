package graft.sql

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSessionFixture

/**
 * Idempotent writer tags ([[GraftTables.lastTxnVersion]] +
 * [[GraftCatalogSink.upsertBatch]]): the (txnAppId, txnVersion) pair
 * commits ATOMICALLY with the version (written into the version dir
 * before `_meta`), so a foreachBatch body writing SEVERAL graft tables
 * is exactly-once into each across any crash/restart interleaving —
 * including the crash-between-commit-and-marker window the r15 design
 * left open — and the dedup survives OPTIMIZE/VACUUM.
 */
class GraftTxnSpec extends AnyFunSuite {

  private lazy val spark = SparkSessionFixture.spark
  import spark.implicits._

  private def freshPath(name: String): String = {
    val p = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), s"graft_txnspec_$name").toString
    new scala.reflect.io.Directory(new java.io.File(p)).deleteRecursively()
    p
  }

  private def mkTable(name: String, path: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    (1L to 5L).map(k => (k, 0.0)).toDF("k", "v")
      .createOrReplaceTempView(s"${name}_src")
    spark.sql(s"""CREATE TABLE $name USING graft
      |OPTIONS (key 'k') LOCATION '$path'
      |AS SELECT * FROM ${name}_src""".stripMargin)
  }

  private def versions(name: String): Long =
    spark.sql(s"SELECT count(*) FROM graft_history('$name')")
      .collect()(0).getLong(0)

  test("a crash between two tables' commits replays exactly-once into both") {
    val pCorpus = freshPath("corpus")
    val pStats = freshPath("stats")
    mkTable("txnspec_corpus", pCorpus)
    mkTable("txnspec_stats", pStats)
    val corpus = GraftCatalogSink.upsertBatch(pCorpus, "pipeline-x") _
    val stats = GraftCatalogSink.upsertBatch(pStats, "pipeline-x") _
    def batch(id: Long, v: Double) = Seq((id + 1, v)).toDF("k", "v")
    // batch 0 lands in both tables
    corpus(batch(0, 10.0), 0L); stats(batch(0, 0.1), 0L)
    // batch 1: corpus commits, then the process "crashes" before the
    // stats write — foreachBatch will redeliver batch 1 on restart
    corpus(batch(1, 20.0), 1L)
    // restart: the SAME batch 1 arrives again
    corpus(batch(1, 20.0), 1L) // must dedup — no duplicate version
    stats(batch(1, 0.2), 1L) // must apply — stats never saw it
    assert(versions("txnspec_corpus") === 3) // base + batches 0, 1
    assert(versions("txnspec_stats") === 3)
    val c = spark.sql("SELECT k, v FROM txnspec_corpus ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(c(1L) === 10.0 && c(2L) === 20.0)
    val s = spark.sql("SELECT k, v FROM txnspec_stats ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(s(1L) === 0.1 && s(2L) === 0.2)
    spark.sql("DROP TABLE IF EXISTS txnspec_corpus")
    spark.sql("DROP TABLE IF EXISTS txnspec_stats")
  }

  test("the dedup tag is atomic with the commit: a lost hint marker " +
      "cannot cause a duplicate") {
    val path = freshPath("hint")
    mkTable("txnspec_hint", path)
    val sink = GraftCatalogSink.upsertBatch(path, "app-h") _
    sink(Seq((9L, 1.0)).toDF("k", "v"), 0L)
    // simulate a crash BEFORE the post-commit hint write: the r15
    // design's root marker is exactly this file — delete it
    new java.io.File(s"$path/_txnhint_app-h").delete()
    // redelivery must STILL dedup (the tag lives inside the version
    // dir, found by the unbounded fallback scan)
    sink(Seq((9L, 1.0)).toDF("k", "v"), 0L)
    assert(versions("txnspec_hint") === 2)
    assert(GraftCatalogSink.lastCommittedBatch(spark, path, "app-h") === 0L)
    spark.sql("DROP TABLE IF EXISTS txnspec_hint")
  }

  test("dedup tags survive OPTIMIZE (folded history collapses to floors)") {
    val path = freshPath("opt")
    mkTable("txnspec_opt", path)
    val sink = GraftCatalogSink.upsertBatch(path, "app-o") _
    (0L to 3L).foreach(i => sink(Seq((i + 10, i * 1.0)).toDF("k", "v"), i))
    spark.sql("OPTIMIZE txnspec_opt") // folds versions 1..4 into the base
    assert(versions("txnspec_opt") === 1)
    // redelivery of any folded batch must still dedup
    sink(Seq((10L, 0.0)).toDF("k", "v"), 2L)
    assert(versions("txnspec_opt") === 1)
    assert(GraftCatalogSink.lastCommittedBatch(spark, path, "app-o") === 3L)
    // and a genuinely new batch still flows
    sink(Seq((99L, 9.0)).toDF("k", "v"), 4L)
    assert(versions("txnspec_opt") === 2)
    spark.sql("DROP TABLE IF EXISTS txnspec_opt")
  }
}
