package graft.sql

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSessionFixture

/**
 * The z-projection AUTO-REBUILD policy ([[GraftTables.maybeRebuildZProj]],
 * riding the fold-maintenance worker): under steady DML a stale
 * projection's delta overlay deepens monotonically — once the span
 * crosses [[GraftTables.zprojRebuildAfter]] (or a fence lands), the
 * background pass re-materializes the projection at the current
 * version, so the overlay depth stays BOUNDED with zero user OPTIMIZE
 * calls, boxed scans return to the plain pruned shape, and answers
 * stay exact throughout.
 */
class GraftZProjRebuildSpec extends AnyFunSuite {

  private lazy val spark = SparkSessionFixture.spark
  import spark.implicits._

  private def freshPath(name: String): String = {
    val p = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), s"graft_zreb_$name").toString
    new scala.reflect.io.Directory(new java.io.File(p)).deleteRecursively()
    p
  }

  private def withPolicy[A](foldK: Int, rebuildAfter: Int)(body: => A): A = {
    val saved = (GraftTables.foldEvery, GraftTables.foldAsync,
      GraftTables.zprojRebuildAfter)
    GraftTables.foldEvery = foldK
    GraftTables.foldAsync = false
    GraftTables.zprojRebuildAfter = rebuildAfter
    try body finally {
      GraftTables.foldEvery = saved._1
      GraftTables.foldAsync = saved._2
      GraftTables.zprojRebuildAfter = saved._3
    }
  }

  test("steady DML keeps the overlay depth bounded: the background " +
      "pass rebuilds the projection and answers stay exact") {
    val path = freshPath("dml")
    spark.sql("DROP TABLE IF EXISTS zreb_t")
    withPolicy(foldK = 3, rebuildAfter = 5) {
      (1L to 400L).map(k => (k, (k * 37) % 100, ((k * 53) % 1000) * 1.0))
        .toDF("k", "x", "y").createOrReplaceTempView("zreb_src")
      spark.sql(s"""CREATE TABLE zreb_t USING graft
        |OPTIONS (key 'k', partitions '8') LOCATION '$path'
        |AS SELECT * FROM zreb_src""".stripMargin)
      spark.sql("OPTIMIZE zreb_t ZORDER BY (x, y)")
      val built = GraftBenchBridge.zprojVersion(spark, path)
      assert(built.nonEmpty, "OPTIMIZE did not persist a projection")
      def box = spark.sql(
        """SELECT k, x, y FROM zreb_t
          |WHERE x BETWEEN 10 AND 29 AND y BETWEEN 100 AND 399""".stripMargin)
      // a 50-statement DML stream: keys OUTSIDE the box churn (the box
      // answer is stable, making staleness bugs visible), overlay
      // depth must never exceed the fold cadence + rebuild threshold
      def inBox(k: Long): Boolean = {
        val x = (k * 37) % 100
        val y = ((k * 53) % 1000).toDouble
        x >= 10 && x <= 29 && y >= 100 && y <= 399
      }
      val churn = (1L to 400L).filterNot(inBox)
      val expect = box.collect().map(_.toSeq).toSet
      var maxDepth = 0L
      (1 to 50).foreach { i =>
        spark.sql(
          s"UPDATE zreb_t SET y = y + 1000 WHERE k = ${churn(i % churn.size)}")
        GraftBenchBridge.awaitFolds()
        val pv = GraftBenchBridge.zprojVersion(spark, path).get
        val dv = GraftTables.diskVersion(spark, path)
        maxDepth = math.max(maxDepth, dv - pv)
        assert(box.collect().map(_.toSeq).toSet === expect,
          s"wrong box answer at statement $i (overlay depth ${dv - pv})")
      }
      // folds fire every 3 commits and rebuild triggers at depth >= 5,
      // so depth can reach at most rebuildAfter + foldK - 1
      assert(maxDepth <= 7, s"overlay depth grew to $maxDepth")
      val rebuiltAt = GraftBenchBridge.zprojVersion(spark, path).get
      assert(rebuiltAt > built.get,
        "the background pass never rebuilt the projection")
      // after the last rebuild the box serves from the projection
      // (possibly through a SHALLOW overlay) — still pruned
      box.count()
      val (kind, kept) = GraftBenchBridge.h1ScanInfo(spark, path)
      assert(kind === "full_zproj", kind)
      assert(kept > 0 && kept < 256)
      // a cold session attaches the REBUILT projection
      val s2 = spark.newSession()
      assert(s2.sql("SELECT count(*) FROM zreb_t").collect()(0).getLong(0)
        === 400L)
      assert(box.collect().map(_.toSeq).toSet === expect)
    }
    spark.sql("DROP TABLE IF EXISTS zreb_t")
  }

  test("plain OPTIMIZE re-absorbs a stale projection and VACUUM keeps " +
      "it alive through the fold — boxed scans stay pruned with no " +
      "ZORDER re-run") {
    val path = freshPath("mnt")
    spark.sql("DROP TABLE IF EXISTS zreb_m")
    withPolicy(foldK = 100, rebuildAfter = 100) { // background path off
      (1L to 300L).map(k => (k, (k * 37) % 100, ((k * 53) % 1000) * 1.0))
        .toDF("k", "x", "y").createOrReplaceTempView("zreb_msrc")
      spark.sql(s"""CREATE TABLE zreb_m USING graft
        |OPTIONS (key 'k', partitions '8') LOCATION '$path'
        |AS SELECT * FROM zreb_msrc""".stripMargin)
      spark.sql("OPTIMIZE zreb_m ZORDER BY (x, y)")
      def box = spark.sql(
        """SELECT k, x, y FROM zreb_m
          |WHERE x BETWEEN 10 AND 29 AND y BETWEEN 100 AND 399""".stripMargin)
      val expect = box.collect().map(_.toSeq).toSet
      // go stale: DML past the build version, then a PLAIN compact —
      // the documented contract is "the next OPTIMIZE re-absorbs" the
      // overlay, so post-OPTIMIZE the projection must exist AT the
      // compacted version and serve without one
      spark.sql("UPDATE zreb_m SET y = y + 1000 WHERE k = 1")
      spark.sql("DELETE FROM zreb_m WHERE k = 2")
      spark.sql("OPTIMIZE zreb_m")
      val dv = GraftTables.diskVersion(spark, path)
      assert(GraftBenchBridge.zprojVersion(spark, path) === Some(dv),
        "plain OPTIMIZE did not re-absorb the stale projection")
      assert(box.collect().map(_.toSeq).toSet === expect)
      box.count()
      val (kind, kept) = GraftBenchBridge.h1ScanInfo(spark, path)
      assert(kind === "full_zproj", kind)
      assert(kept > 0 && kept < 256)
      // VACUUM folds history under the projection — it must survive
      // the swap (carried when its build version is retained, rebuilt
      // when the fold dropped it) and keep serving pruned
      spark.sql("UPDATE zreb_m SET y = y + 1000 WHERE k = 4")
      spark.sql("UPDATE zreb_m SET y = y + 1000 WHERE k = 5")
      spark.sql("VACUUM zreb_m RETAIN 1 VERSIONS")
      assert(GraftBenchBridge.zprojVersion(spark, path).nonEmpty,
        "VACUUM dropped the projection")
      assert(box.collect().map(_.toSeq).toSet === expect)
      // a cold session attaches whatever survived and stays exact
      val s2 = spark.newSession()
      assert(s2.sql(
        """SELECT k, x, y FROM zreb_m
          |WHERE x BETWEEN 10 AND 29 AND y BETWEEN 100 AND 399""".stripMargin)
        .collect().map(_.toSeq).toSet === expect)
    }
    spark.sql("DROP TABLE IF EXISTS zreb_m")
  }

  test("a fence (truncate) triggers the rebuild even below the depth " +
      "threshold — the projection comes back without an OPTIMIZE") {
    val path = freshPath("fence")
    spark.sql("DROP TABLE IF EXISTS zreb_f")
    withPolicy(foldK = 3, rebuildAfter = 50) {
      (1L to 300L).map(k => (k, (k * 37) % 100, ((k * 53) % 1000) * 1.0))
        .toDF("k", "x", "y").createOrReplaceTempView("zreb_fsrc")
      spark.sql(s"""CREATE TABLE zreb_f USING graft
        |OPTIONS (key 'k', partitions '8') LOCATION '$path'
        |AS SELECT * FROM zreb_fsrc""".stripMargin)
      spark.sql("OPTIMIZE zreb_f ZORDER BY (x, y)")
      val built = GraftBenchBridge.zprojVersion(spark, path).get
      // the fence: INSERT OVERWRITE commits a truncate delta — the
      // overlay cannot bridge it, so scans fall back to the primary
      spark.sql("INSERT OVERWRITE zreb_f SELECT * FROM zreb_fsrc")
      def box = spark.sql(
        """SELECT k, x, y FROM zreb_f
          |WHERE x BETWEEN 10 AND 29 AND y BETWEEN 100 AND 399""".stripMargin)
      val expect = box.collect().map(_.toSeq).toSet
      // enough commits to reach a fold pass (every 3) — the pass sees
      // the fence and rebuilds regardless of the depth threshold
      (1 to 3).foreach { i =>
        spark.sql(s"UPDATE zreb_f SET y = y WHERE k = $i")
      }
      GraftBenchBridge.awaitFolds()
      assert(GraftBenchBridge.zprojVersion(spark, path).get > built,
        "the fence did not trigger a projection rebuild")
      assert(box.collect().map(_.toSeq).toSet === expect)
      box.count()
      assert(GraftBenchBridge.h1ScanInfo(spark, path)._1 === "full_zproj")
    }
    spark.sql("DROP TABLE IF EXISTS zreb_f")
  }
}
