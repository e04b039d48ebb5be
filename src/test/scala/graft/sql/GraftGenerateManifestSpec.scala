package graft.sql

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSessionFixture

/**
 * `GENERATE MANIFEST FOR TABLE t TO '<dir>'`
 * ([[GraftGenerateManifestCommand]]): a plain-parquet MIRROR plus a
 * `_graft_manifest/manifest` file listing its leaf parquet files —
 * foreign readers load exactly those paths with no graft extension.
 * The first call writes the full mirror; repeat calls against the
 * same dir rewrite ONLY the mirror partitions whose keys a delta
 * touched since the last generated version (the 100 TB point: a
 * small MERGE refreshes kilobytes, where EXPORT rewrites the corpus).
 */
class GraftGenerateManifestSpec extends AnyFunSuite {

  private lazy val spark = SparkSessionFixture.spark
  import spark.implicits._

  private def freshPath(name: String): String = {
    val p = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), s"graft_manifest_$name").toString
    new scala.reflect.io.Directory(new java.io.File(p)).deleteRecursively()
    p
  }

  private def manifestFiles(out: String): Seq[String] = {
    val f = java.nio.file.Paths.get(out, "_graft_manifest", "manifest")
    new String(java.nio.file.Files.readAllBytes(f),
      java.nio.charset.StandardCharsets.UTF_8)
      .split("\n").toSeq.filter(_.nonEmpty)
  }

  /** Read ONLY the manifest's listed paths — what a vanilla session
    * or DuckDB does. Leaf-file reads do no partition discovery, so
    * the mirror's internal __part dirs never surface as a column. */
  private def readViaManifest(out: String) =
    spark.read.parquet(manifestFiles(out): _*)

  test("GENERATE MANIFEST: full mirror + manifest on first call; a " +
      "small DML refreshes incrementally (few partitions, not the " +
      "corpus); deletes empty their mirror partitions") {
    val path = freshPath("t")
    val out = freshPath("out")
    spark.sql("DROP TABLE IF EXISTS man_t")
    (1L to 500L).map(k => (k, s"name_$k", k * 1.5)).toDF("k", "name", "v")
      .createOrReplaceTempView("man_src")
    spark.sql(s"""CREATE TABLE man_t USING graft
      |OPTIONS (key 'k') LOCATION '$path'
      |AS SELECT * FROM man_src""".stripMargin)
    def table = spark.sql("SELECT k, name, v FROM man_t")
      .collect().map(_.toSeq).toSet

    val r1 = spark.sql(s"GENERATE MANIFEST FOR TABLE man_t TO '$out'")
      .collect().head
    assert(r1.getString(5) === "full")
    assert(r1.getInt(3) === manifestFiles(out).size)
    val viaManifest1 = readViaManifest(out)
    assert(viaManifest1.columns.sorted.toSeq === Seq("k", "name", "v"),
      s"mirror internals leaked: ${viaManifest1.columns.mkString(",")}")
    assert(viaManifest1.collect().map(_.toSeq).toSet === table)

    // small DML -> incremental refresh: only the touched partitions
    // rewrite, and the refreshed manifest read equals the new snapshot
    spark.sql("UPDATE man_t SET v = -1 WHERE k = 7")
    spark.sql("DELETE FROM man_t WHERE k = 13")
    val r2 = spark.sql(s"GENERATE MANIFEST FOR TABLE man_t TO '$out'")
      .collect().head
    assert(r2.getString(5) === "incremental")
    val total = r1.getInt(4) // full pass rewrote every mirror partition
    assert(r2.getInt(4) <= 2 && r2.getInt(4) < total,
      s"2-key DML rewrote ${r2.getInt(4)} of $total mirror partitions")
    assert(readViaManifest(out).collect().map(_.toSeq).toSet === table)

    // no change -> noop, manifest still serves the snapshot
    val r3 = spark.sql(s"GENERATE MANIFEST FOR TABLE man_t TO '$out'")
      .collect().head
    assert(r3.getString(5) === "noop" && r3.getInt(4) === 0)
    assert(readViaManifest(out).collect().map(_.toSeq).toSet === table)

    // a delete that empties a whole mirror partition drops its dir
    // (dynamic overwrite alone would leave the stale files behind)
    spark.sql("DELETE FROM man_t WHERE pmod(xxhash64(k), " +
      s"${r1.getInt(4)}) = 3")
    spark.sql(s"GENERATE MANIFEST FOR TABLE man_t TO '$out'")
    assert(readViaManifest(out).collect().map(_.toSeq).toSet === table)
    assert(!new java.io.File(s"$out/data/__part=3").exists(),
      "emptied mirror partition left stale files")
    spark.sql("DROP TABLE IF EXISTS man_t")
  }

  test("staleness contract: graft_manifest_stale detects DML with no " +
      "data reads; WITH AUTO REFRESH keeps the mirror fresh through " +
      "plain DML commits") {
    val path = freshPath("s")
    val out = freshPath("sout")
    spark.sql("DROP TABLE IF EXISTS man_s")
    (1L to 300L).map(k => (k, s"n_$k", k * 1.5)).toDF("k", "name", "v")
      .createOrReplaceTempView("man_ssrc")
    spark.sql(s"""CREATE TABLE man_s USING graft
      |OPTIONS (key 'k') LOCATION '$path'
      |AS SELECT * FROM man_ssrc""".stripMargin)
    // read the truth COLD: the direct commitTxnChange call below does
    // not refresh this session's relation cache (the SQL DML commands
    // do that part), and the mirror must be compared against the log
    def table = spark.newSession().sql("SELECT k, name, v FROM man_s")
      .collect().map(_.toSeq).toSet
    def stale = spark.sql(
      s"SELECT * FROM graft_manifest_stale('man_s', '$out')")
      .collect().head
    // no mirror yet: stale, exported_version = -1
    assert(stale.getBoolean(4) && stale.getLong(2) === -1L)
    spark.sql(s"GENERATE MANIFEST FOR TABLE man_s TO '$out'")
    assert(!stale.getBoolean(4), "fresh mirror read as stale")
    assert(stale.getLong(2) === stale.getLong(3))
    // DML leaves a point-in-time mirror detectably stale
    spark.sql("UPDATE man_s SET v = -1 WHERE k = 7")
    val afterDml = stale
    assert(afterDml.getBoolean(4), "stale mirror not detected after DML")
    assert(afterDml.getLong(2) < afterDml.getLong(3))
    // ... and refresh closes it; the foreign read equals the snapshot
    spark.sql(s"GENERATE MANIFEST FOR TABLE man_s TO '$out'")
    assert(!stale.getBoolean(4))
    assert(readViaManifest(out).collect().map(_.toSeq).toSet === table)

    // AUTO REFRESH: registering the mirror makes every later DML
    // commit refresh it (delta cost) with NO further GENERATE calls
    spark.sql(
      s"GENERATE MANIFEST FOR TABLE man_s TO '$out' WITH AUTO REFRESH")
    spark.sql("UPDATE man_s SET v = -2 WHERE k = 11")
    spark.sql("DELETE FROM man_s WHERE k = 13")
    assert(!stale.getBoolean(4),
      "auto-registered mirror stale after DML — post-commit refresh " +
        "did not run")
    assert(readViaManifest(out).collect().map(_.toSeq).toSet === table,
      "auto-refreshed mirror does not equal the snapshot")
    // a REOPENED session's DML honors the durable registration too
    val s2 = spark.newSession()
    s2.sql("INSERT INTO man_s VALUES (9001, 'nine', 9.0)")
    assert(!stale.getBoolean(4), "reopened-session DML left mirror stale")
    assert(readViaManifest(out).collect().map(_.toSeq).toSet === table)
    // the registration SURVIVES OPTIMIZE's whole-dir rebase swap
    // (losing it would silently end mirror refresh — the same failure
    // class the _indexnames carry guards against)
    spark.sql("OPTIMIZE man_s")
    spark.sql("UPDATE man_s SET v = -3 WHERE k = 17")
    assert(!stale.getBoolean(4), "registration lost across OPTIMIZE")
    assert(readViaManifest(out).collect().map(_.toSeq).toSet === table)
    // ... and the atomic multi-table txn path refreshes too ("every
    // DML commit" includes BEGIN/COMMIT members)
    import spark.implicits._
    GraftTables.commitTxnChange(spark, Seq(
      (path, Some(Seq(Tuple1(19L)).toDF("k")),
        Some(Seq((9002L, "txn", 2.0)).toDF("k", "name", "v")))))
    assert(!stale.getBoolean(4), "txn commit left mirror stale")
    assert(readViaManifest(out).collect().map(_.toSeq).toSet === table)
    spark.sql("DROP TABLE IF EXISTS man_s")
  }

  test("GENERATE MANIFEST falls back to a full rewrite when the " +
      "delta window cannot be answered (schema evolution inside it)") {
    val path = freshPath("f")
    val out = freshPath("fout")
    spark.sql("DROP TABLE IF EXISTS man_f")
    (1L to 100L).map(k => (k, k * 2)).toDF("k", "v")
      .createOrReplaceTempView("man_fsrc")
    spark.sql(s"""CREATE TABLE man_f USING graft
      |OPTIONS (key 'k') LOCATION '$path'
      |AS SELECT * FROM man_fsrc""".stripMargin)
    spark.sql(s"GENERATE MANIFEST FOR TABLE man_f TO '$out'")
    spark.sql("ALTER TABLE man_f ADD COLUMN (w BIGINT)")
    spark.sql("UPDATE man_f SET w = k + 1 WHERE k <= 10")
    val r = spark.sql(s"GENERATE MANIFEST FOR TABLE man_f TO '$out'")
      .collect().head
    assert(r.getString(5) === "full")
    assert(readViaManifest(out).collect().map(_.toSeq).toSet ===
      spark.sql("SELECT k, v, w FROM man_f").collect().map(_.toSeq).toSet)
    spark.sql("DROP TABLE IF EXISTS man_f")
  }
}
