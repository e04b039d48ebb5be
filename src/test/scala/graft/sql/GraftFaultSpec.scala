package graft.sql

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSessionFixture

/**
 * OBJECT-STORE SEMANTICS under fault injection: on a filesystem whose
 * `rename` FAILS (returns false — the no-atomic-rename store shape),
 * the rename-promoted accelerators must DEGRADE, never corrupt:
 *  - fold promotes that fail leave no fold — replay walks the raw
 *    deltas, bit-identical, just slower;
 *  - checkpoint-manifest swaps that fail leave the old (or no)
 *    manifest — reads fall back to the listing walk;
 *  - marker writes (`_tver` etc.) fall back to delete+rename and, if
 *    still refused, readers derive the value from the log itself.
 * Commits themselves ride atomic CREATE (claims, `_meta`, the txn
 * coordinator), which object stores provide as conditional PUT — the
 * spec proves the rename-dependent layer is pure acceleration.
 */
class GraftFaultSpec extends AnyFunSuite {

  private lazy val spark = SparkSessionFixture.spark
  import spark.implicits._

  private def freshDir(name: String): String = {
    val p = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), s"graft_faultspec_$name").toString
    new scala.reflect.io.Directory(new java.io.File(p)).deleteRecursively()
    p
  }

  test("failed fold/manifest renames degrade to raw-delta replay — " +
      "state exact, and folding resumes when renames recover") {
    spark.sparkContext.hadoopConfiguration.set(
      "fs.fault.impl", classOf[FaultInjectingFileSystem].getName)
    val local = freshDir("folds")
    val path = s"fault://$local"
    val savedK = GraftTables.foldEvery
    val savedA = GraftTables.foldAsync
    GraftTables.foldEvery = 3
    GraftTables.foldAsync = false
    FaultInjectingFileSystem.reset()
    spark.sql("DROP TABLE IF EXISTS faultspec_t")
    try {
      (1L to 30L).map(k => (k, k * 1.0)).toDF("k", "bal")
        .createOrReplaceTempView("faultspec_src")
      spark.sql(s"""CREATE TABLE faultspec_t USING graft
        |OPTIONS (key 'k') LOCATION '$path'
        |AS SELECT * FROM faultspec_src""".stripMargin)
      // every fold-sidecar and manifest rename now FAILS
      FaultInjectingFileSystem.failRenameTo.set(n =>
        n.startsWith("_tfold_") || n == "_tmanifest")
      (1 to 7).foreach(i =>
        spark.sql(s"UPDATE faultspec_t SET bal = ${100 + i} WHERE k = $i"))
      assert(FaultInjectingFileSystem.failed.get() > 0,
        "the injected faults never fired — the spec is not testing anything")
      val dirNames = Option(new java.io.File(local).list()).toSeq.flatten
      assert(!dirNames.exists(_.startsWith("_tfold_")),
        s"a fold landed despite failed renames: $dirNames")
      // correctness is untouched: live and cold reads replay the raw
      // deltas (the orphaned _tfoldtmp_ staging dirs are swept later)
      def state(s: org.apache.spark.sql.SparkSession): Map[Long, Double] =
        s.sql("SELECT k, bal FROM faultspec_t").collect()
          .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val expect = (1L to 30L).map(k =>
        k -> (if (k <= 7) 100.0 + k else k * 1.0)).toMap
      assert(state(spark) === expect)
      assert(state(spark.newSession()) === expect)
      // renames recover: the next cadence commit folds (and
      // checkpoints) the backlog
      FaultInjectingFileSystem.reset()
      (8 to 9).foreach(i =>
        spark.sql(s"UPDATE faultspec_t SET bal = ${100 + i} WHERE k = $i"))
      val after = Option(new java.io.File(local).list()).toSeq.flatten
      assert(after.exists(_.startsWith("_tfold_")),
        s"folding did not resume after renames recovered: $after")
      assert(after.contains("_tmanifest"))
      val expect2 = (1L to 30L).map(k =>
        k -> (if (k <= 9) 100.0 + k else k * 1.0)).toMap
      assert(state(spark.newSession()) === expect2)
    } finally {
      FaultInjectingFileSystem.reset()
      GraftTables.foldEvery = savedK
      GraftTables.foldAsync = savedA
      spark.sql("DROP TABLE IF EXISTS faultspec_t")
    }
  }

  test("failed marker renames (_tver hint) never break version " +
      "derivation — the log walk is the truth") {
    spark.sparkContext.hadoopConfiguration.set(
      "fs.fault.impl", classOf[FaultInjectingFileSystem].getName)
    val local = freshDir("markers")
    val path = s"fault://$local"
    FaultInjectingFileSystem.reset()
    spark.sql("DROP TABLE IF EXISTS faultspec_m")
    try {
      (1L to 10L).map(k => (k, k * 1.0)).toDF("k", "bal")
        .createOrReplaceTempView("faultspec_msrc")
      spark.sql(s"""CREATE TABLE faultspec_m USING graft
        |OPTIONS (key 'k') LOCATION '$path'
        |AS SELECT * FROM faultspec_msrc""".stripMargin)
      // the version-hint marker can no longer be (re)written: the
      // MarkerFile fallback deletes the old value, so the hint reads
      // ABSENT — and diskVersion's walk over the commit metas must
      // still find every version
      FaultInjectingFileSystem.failRenameTo.set(_ == "_tver")
      (1 to 3).foreach(i =>
        spark.sql(s"UPDATE faultspec_m SET bal = ${100 + i} WHERE k = $i"))
      assert(FaultInjectingFileSystem.failed.get() > 0)
      val cold = spark.newSession()
      assert(cold.sql("SELECT bal FROM faultspec_m WHERE k = 2")
        .collect()(0).getDouble(0) === 102.0)
      assert(cold.sql("SELECT count(*) FROM graft_history('faultspec_m')")
        .collect()(0).getLong(0) === 4) // base + 3, all walked
    } finally {
      FaultInjectingFileSystem.reset()
      spark.sql("DROP TABLE IF EXISTS faultspec_m")
    }
  }

  test("a rebase swap's BURIED stage recovers: the staged dir moved " +
      "INSIDE a recreated headless table dir is pulled out and " +
      "promoted on the next read") {
    // the crash shape: rebase deleted the table dir, a rival's
    // fs.create recreated it (parent mkdirs), and the rename moved the
    // complete stage one level DOWN instead of into place — without
    // burial detection the table is headless forever while its only
    // copy sits where no sibling listing finds it
    val local = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), "graft_fault_bury").toString
    new scala.reflect.io.Directory(new java.io.File(local)).deleteRecursively()
    spark.sql("DROP TABLE IF EXISTS faultspec_b")
    try {
      (1L to 100L).map(k => (k, k * 3.0)).toDF("k", "v")
        .createOrReplaceTempView("faultspec_bsrc")
      spark.sql(s"""CREATE TABLE faultspec_b USING graft
        |OPTIONS (key 'k') LOCATION '$local'
        |AS SELECT * FROM faultspec_bsrc""".stripMargin)
      spark.sql("UPDATE faultspec_b SET v = -1 WHERE k = 7")
      val expect = spark.sql("SELECT k, v FROM faultspec_b")
        .collect().map(_.toSeq).toSet
      // fabricate the buried state: the table dir becomes a headless
      // skeleton whose only content is the COMPLETE stage (a valid
      // table dir IS a valid stage — same layout the rebase writes)
      val p = new java.io.File(local)
      val parent = p.getParentFile
      val stageName = s".${p.getName}_compact_tmp"
      val aside = new java.io.File(parent, s"${p.getName}_aside")
      assert(p.renameTo(aside))
      assert(p.mkdirs()) // the rival's recreated skeleton
      assert(aside.renameTo(new java.io.File(p, stageName)))
      assert(!new java.io.File(p, "_frame").exists())
      // a COLD session's first read runs recovery: unbury + promote
      val cold = spark.newSession()
      assert(cold.sql("SELECT k, v FROM faultspec_b")
        .collect().map(_.toSeq).toSet === expect)
      assert(new java.io.File(p, "_frame").exists(), "stage not promoted")
      assert(!new java.io.File(p, stageName).exists(), "burial left behind")
      // and DML keeps working on the recovered table
      spark.sql("UPDATE faultspec_b SET v = -2 WHERE k = 8")
      assert(spark.sql("SELECT v FROM faultspec_b WHERE k = 8")
        .collect()(0).getDouble(0) === -2.0)
    } finally {
      spark.sql("DROP TABLE IF EXISTS faultspec_b")
    }
  }
}
