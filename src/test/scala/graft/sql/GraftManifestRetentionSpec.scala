package graft.sql

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSessionFixture

/**
 * Manifest RETENTION ([[GraftTables.refreshManifest]] + fold-carried
 * stamps): fold-covered versions leave the checkpointed manifest —
 * their commit stamps ride the fold's own meta — so the rewritten
 * blob is O(K log_K n), bounded as the commit count grows, while
 * graft_history / TIMESTAMP AS OF stay exact over the full retained
 * log.
 */
class GraftManifestRetentionSpec extends AnyFunSuite {

  private lazy val spark = SparkSessionFixture.spark
  import spark.implicits._

  private def freshPath(name: String): String = {
    val p = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), s"graft_manret_$name").toString
    new scala.reflect.io.Directory(new java.io.File(p)).deleteRecursively()
    p
  }

  private def withFoldEvery[A](k: Int)(body: => A): A = {
    val saved = (GraftTables.foldEvery, GraftTables.foldAsync)
    GraftTables.foldEvery = k
    GraftTables.foldAsync = false
    try body finally {
      GraftTables.foldEvery = saved._1
      GraftTables.foldAsync = saved._2
    }
  }

  test("the manifest's per-version records stay bounded as commits " +
      "grow; history and time travel stay exact off fold stamps") {
    val path = freshPath("b")
    spark.sql("DROP TABLE IF EXISTS manret_t")
    withFoldEvery(4) {
      (1L to 60L).map(k => (k, 0.0)).toDF("k", "v")
        .createOrReplaceTempView("manret_src")
      spark.sql(s"""CREATE TABLE manret_t USING graft
        |OPTIONS (key 'k') LOCATION '$path'
        |AS SELECT * FROM manret_src""".stripMargin)
      var metasAt30 = -1
      var bytesAt30 = -1L
      (1 to 60).foreach { i =>
        spark.sql(s"UPDATE manret_t SET v = $i WHERE k = ${1 + i % 60}")
        if (i == 30) {
          metasAt30 = GraftBenchBridge.manifestMetaCount(spark, path)
          bytesAt30 = GraftBenchBridge.manifestBytes(spark, path)
        }
      }
      val metasAt60 = GraftBenchBridge.manifestMetaCount(spark, path)
      val bytesAt60 = GraftBenchBridge.manifestBytes(spark, path)
      // fold-covered versions are pruned: the record count is bounded
      // by the uncovered tail (one fold cadence deep), NOT the commit
      // count — and it does not grow between 30 and 60 commits
      assert(metasAt60 <= 8,
        s"manifest still carries $metasAt60 per-version records")
      assert(metasAt60 <= math.max(metasAt30, 4),
        s"records grew: $metasAt30 at 30 commits -> $metasAt60 at 60")
      assert(bytesAt60 <= bytesAt30 * 2,
        s"manifest bytes grew $bytesAt30 -> $bytesAt60")
      // history remains EXACT over the full log: one stamp per commit,
      // strictly non-decreasing, served from fold metas
      val times = GraftTables.historyTimes(spark, path)
      assert(times.length === 61) // base + 60 commits
      assert(times.sliding(2).forall(w => w(0) <= w(1)))
      // graft_history agrees (it walks the same stamps)
      assert(spark.newSession()
        .sql("SELECT count(*) FROM graft_history('manret_t')")
        .collect()(0).getLong(0) === 61L)
      // time travel to a fold-covered version replays exactly
      assert(spark.sql("SELECT v FROM manret_t VERSION AS OF 10 WHERE k = 7")
        .collect()(0).getDouble(0) === 6.0) // statement 6 set k=7 to 6
      // ... and a cold session pays a BOUNDED number of per-version
      // meta reads for the current-version cover
      val s2 = spark.newSession()
      assert(s2.sql("SELECT count(*) FROM manret_t")
        .collect()(0).getLong(0) === 60L)
      assert(GraftBenchBridge.coverUsedManifest,
        "reopen did not use the manifest")
      assert(GraftBenchBridge.coverMetaReads <= 8,
        s"reopen paid ${GraftBenchBridge.coverMetaReads} meta reads")
    }
    spark.sql("DROP TABLE IF EXISTS manret_t")
  }
}
