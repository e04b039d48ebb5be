package graft.sql

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSessionFixture

/**
 * `RESTORE [TABLE] <name> TO VERSION|TIMESTAMP AS OF <x>`
 * ([[GraftRestoreCommand]]): Delta's rollback verb. A restore commits
 * a NEW version whose content is the target's — history stays intact
 * (the pre-restore current is still time-travelable, `graft_history`
 * grows by one), catalog tables write only the inverse DIFF to the
 * durable log (a reopened session replays to the rolled-back state),
 * and temp views are a pure pointer swap.
 */
class GraftRestoreSpec extends AnyFunSuite {

  private lazy val spark = SparkSessionFixture.spark
  import spark.implicits._

  private def mkTable(name: String): String = {
    implicit val sp: org.apache.spark.sql.SparkSession = spark
    val path = java.nio.file.Files
      .createTempDirectory(s"graft_restore_$name").toString
    new scala.reflect.io.Directory(new java.io.File(path)).deleteRecursively()
    spark.sql(s"DROP TABLE IF EXISTS $name")
    (1L to 100L).map(k => (k, s"v$k", k * 1.0)).toDF("k", "name", "bal")
      .createOrReplaceTempView(s"${name}_src")
    spark.sql(s"""CREATE TABLE $name USING graft
      |OPTIONS (key 'k', partitions '4') LOCATION '$path'
      |AS SELECT * FROM ${name}_src""".stripMargin)
    path
  }

  private def content(sp: org.apache.spark.sql.SparkSession,
      name: String): Seq[(Long, String, Double)] =
    sp.sql(s"SELECT * FROM $name ORDER BY k")
      .as[(Long, String, Double)](
        org.apache.spark.sql.Encoders.product[(Long, String, Double)])
      .collect().toSeq

  test("catalog table: restore commits the inverse diff as a new version") {
    mkTable("grs_tab")
    val v0 = content(spark, "grs_tab")
    spark.sql("UPDATE grs_tab SET bal = bal * 10 WHERE k <= 20") // v1
    val v1 = content(spark, "grs_tab")
    spark.sql("DELETE FROM grs_tab WHERE k % 2 = 0") // v2
    spark.sql( // v3: inserts + updates on top
      "INSERT INTO grs_tab VALUES (500, 'new', 5.0), (1, 'one', -1.0)")
    assert(content(spark, "grs_tab").size === 51)

    val m = spark.sql("RESTORE TABLE grs_tab TO VERSION AS OF 1").collect()
    assert(m.length === 1)
    assert(m.head.getString(0) === "grs_tab")
    assert(m.head.getLong(1) === 1L) // restored_to_version
    assert(m.head.getLong(2) === 4L) // new_version
    // diff, not corpus: deletes = the insert key 500; upserts = the 50
    // deleted evens + the overwritten key 1
    assert(m.head.getLong(3) === 1L, s"deleted_rows ${m.head.getLong(3)}")
    assert(m.head.getLong(4) === 51L, s"upserted_rows ${m.head.getLong(4)}")
    assert(content(spark, "grs_tab") === v1)

    // history intact: pre-restore versions still read
    val preRestore = spark.sql(
        "SELECT k FROM grs_tab VERSION AS OF 2 ORDER BY k")
      .as[Long].collect()
    assert(preRestore.length === 50 && preRestore.forall(_ % 2 == 1))
    assert(spark.sql("SELECT * FROM graft_history('grs_tab')").count() === 5)

    // restore BACK to v0 works too (restore-of-restore)
    spark.sql("RESTORE TABLE grs_tab TO VERSION AS OF 0")
    assert(content(spark, "grs_tab") === v0)
  }

  test("catalog table: the restored state survives a reopen") {
    mkTable("grs_reopen")
    spark.sql("UPDATE grs_reopen SET bal = -1 WHERE k <= 50") // v1
    val v1 = content(spark, "grs_reopen")
    spark.sql("DELETE FROM grs_reopen WHERE k <= 99") // v2
    spark.sql("RESTORE TABLE grs_reopen TO VERSION AS OF 1") // v3
    val fresh = spark.newSession()
    assert(content(fresh, "grs_reopen") === v1)
    // and the reopened session sees the full history incl. the restore
    assert(fresh.sql("SELECT * FROM graft_history('grs_reopen')")
      .count() === 4)
  }

  test("catalog table: TIMESTAMP AS OF resolves to the floored version") {
    mkTable("grs_ts")
    spark.sql("UPDATE grs_ts SET bal = 0 WHERE k <= 30") // v1
    val v1 = content(spark, "grs_ts")
    Thread.sleep(30)
    val mid = new java.sql.Timestamp(System.currentTimeMillis())
    Thread.sleep(30)
    spark.sql("DELETE FROM grs_ts WHERE k > 10") // v2
    spark.sql(s"RESTORE TABLE grs_ts TO TIMESTAMP AS OF '$mid'")
    assert(content(spark, "grs_ts") === v1)
  }

  test("restore to the current version is a no-op (no new version)") {
    mkTable("grs_noop")
    spark.sql("UPDATE grs_noop SET bal = 1 WHERE k = 1") // v1
    val m = spark.sql("RESTORE TABLE grs_noop TO VERSION AS OF 1").collect()
    assert(m.head.getLong(1) === 1L && m.head.getLong(2) === 1L)
    assert(spark.sql("SELECT * FROM graft_history('grs_noop')").count() === 2)
  }

  test("errors: unknown version, folded version, unknown name") {
    mkTable("grs_err")
    spark.sql("UPDATE grs_err SET bal = 2 WHERE k = 2") // v1
    val e1 = intercept[IllegalArgumentException](
      spark.sql("RESTORE TABLE grs_err TO VERSION AS OF 9"))
    assert(e1.getMessage.contains("no version 9"))
    // VACUUM folds v0 away; restoring to it must fail like Delta
    spark.sql("UPDATE grs_err SET bal = 3 WHERE k = 3") // v2
    spark.sql("VACUUM grs_err RETAIN 1 VERSIONS")
    val e2 = intercept[IllegalArgumentException](
      spark.sql("RESTORE TABLE grs_err TO VERSION AS OF 0"))
    assert(e2.getMessage.contains("compacted away"))
    val e3 = intercept[IllegalArgumentException](
      spark.sql("RESTORE TABLE grs_no_such TO VERSION AS OF 0"))
    assert(e3.getMessage.contains("no recorded versions"))
  }

  test("temp view: restore is a pointer swap; later DML lands on top") {
    implicit val sp: org.apache.spark.sql.SparkSession = spark
    val df = (1L to 50L).map(k => (k, k * 1.0)).toDF("k", "bal")
    IndexedFrame.index(df, "k", numPartitions = 4)
      .toDF.createOrReplaceTempView("grs_view")
    spark.sql("UPDATE grs_view SET bal = 0 WHERE k <= 25") // v1
    val v1 = spark.sql("SELECT * FROM grs_view ORDER BY k")
      .as[(Long, Double)].collect().toSeq
    spark.sql("DELETE FROM grs_view WHERE k <= 49") // v2
    val m = spark.sql("RESTORE grs_view TO VERSION AS OF 1").collect()
    assert(m.head.getLong(1) === 1L && m.head.getLong(2) === 3L)
    assert(m.head.isNullAt(3) && m.head.isNullAt(4)) // nothing recomputed
    assert(spark.sql("SELECT * FROM grs_view ORDER BY k")
      .as[(Long, Double)].collect().toSeq === v1)
    // the pre-restore current is still readable; changes across the
    // restore boundary are the exact inverse of the deleted range
    assert(spark.sql("SELECT count(*) FROM grs_view VERSION AS OF 2")
      .as[Long].head() === 1L)
    assert(spark.sql(
        "SELECT count(*) FROM graft_changes('grs_view', 2, 3)")
      .as[Long].head() === 49L) // 49 inserts restore the deleted rows
    // and DML keeps working on the restored binding
    spark.sql("UPDATE grs_view SET bal = 99 WHERE k = 50")
    assert(spark.sql("SELECT bal FROM grs_view WHERE k = 50")
      .as[Double].head() === 99.0)
  }
}
