package graft.sql

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSessionFixture

/**
 * `EXPORT TABLE t TO '<dir>'` ([[GraftExportCommand]]): the current
 * content lands as PLAIN parquet — readable with `spark.read.parquet`
 * alone, no graft extension, no delta log, no marker files — and the
 * export is a snapshot (later DML never mutates it; re-EXPORT
 * refreshes).
 */
class GraftExportSpec extends AnyFunSuite {

  private lazy val spark = SparkSessionFixture.spark
  import spark.implicits._

  private def freshPath(name: String): String = {
    val p = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), s"graft_export_$name").toString
    new scala.reflect.io.Directory(new java.io.File(p)).deleteRecursively()
    p
  }

  test("EXPORT writes the current snapshot as plain parquet; DML " +
      "afterwards leaves it untouched; re-EXPORT refreshes") {
    val path = freshPath("t")
    val out = freshPath("out")
    spark.sql("DROP TABLE IF EXISTS export_t")
    (1L to 100L).map(k => (k, s"name_$k", k * 1.5)).toDF("k", "name", "v")
      .createOrReplaceTempView("export_src")
    spark.sql(s"""CREATE TABLE export_t USING graft
      |OPTIONS (key 'k') LOCATION '$path'
      |AS SELECT * FROM export_src""".stripMargin)
    spark.sql("UPDATE export_t SET v = -1 WHERE k = 7")
    spark.sql("DELETE FROM export_t WHERE k = 13")
    val res = spark.sql(s"EXPORT TABLE export_t TO '$out'").collect()
    assert(res.length === 1)
    assert(res(0).getString(1) === out)
    assert(res(0).getLong(3) === 99L)
    // the export is ORDINARY parquet: no graft artifacts inside, and a
    // bare parquet read (no extension machinery involved) sees the
    // exact table content
    val files = new java.io.File(out).listFiles().map(_.getName)
    assert(!files.exists(f => f.startsWith("_t") || f == "_meta"),
      s"graft internals leaked into the export: ${files.mkString(", ")}")
    def table = spark.sql("SELECT k, name, v FROM export_t")
      .collect().map(_.toSeq).toSet
    def exported = spark.read.parquet(out).selectExpr("k", "name", "v")
      .collect().map(_.toSeq).toSet
    assert(exported === table)
    assert(exported.exists(_(2) == -1.0))
    // snapshot semantics: DML does NOT touch the exported files
    spark.sql("UPDATE export_t SET v = 999 WHERE k = 1")
    assert(!exported.exists(_(2) == 999.0), "export mutated after DML")
    // re-EXPORT refreshes to the new content
    spark.sql(s"EXPORT TABLE export_t TO '$out'")
    assert(exported === table)
    assert(exported.exists(_(2) == 999.0))
    spark.sql("DROP TABLE IF EXISTS export_t")
  }

  test("EXPORT of a non-graft name fails loudly") {
    val e = intercept[Exception](
      spark.sql("EXPORT TABLE no_such_graft_table TO '/tmp/nowhere'"))
    assert(e.getMessage.contains("not a graft catalog table"))
  }
}
