package graft.sql

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSessionFixture

/**
 * The checkpointed log manifest (`_tmanifest`): every fold pass
 * rewrites one root file enumerating the live cover — committed
 * folds, per-version commit records (stamps, fences) — so a cold
 * reopen reads the manifest plus only the post-manifest tail instead
 * of listing every `_tdelta_`/`_tfold_` dir ever committed. The
 * manifest is acceleration, never truth: torn/absent/stale manifests
 * degrade to the full walk, and replay through the manifest must be
 * bit-identical to the listing-based walk.
 */
class GraftManifestSpec extends AnyFunSuite {

  private lazy val spark = SparkSessionFixture.spark
  import spark.implicits._

  private def freshPath(name: String): String = {
    val p = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), s"graft_manspec_$name").toString
    new scala.reflect.io.Directory(new java.io.File(p)).deleteRecursively()
    p
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

  private def content(name: String,
      s: org.apache.spark.sql.SparkSession): Map[Long, Double] =
    s.sql(s"SELECT k, bal FROM $name").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap

  private def mk(name: String, path: String, commits: Int): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    (1L to 50L).map(k => (k, 0.0)).toDF("k", "bal")
      .createOrReplaceTempView(s"${name}_src")
    spark.sql(s"""CREATE TABLE $name USING graft
      |OPTIONS (key 'k') LOCATION '$path'
      |AS SELECT * FROM ${name}_src""".stripMargin)
    (1 to commits).foreach(i =>
      spark.sql(s"UPDATE $name SET bal = $i WHERE k <= ${i % 50 + 1}"))
  }

  test("cold reopen reads the manifest: no directory listing for fold " +
      "discovery and only tail metas, state bit-identical") {
    val path = freshPath("reopen")
    withFoldEvery(4) { mk("manspec_r", path, 23) }
    val expect = content("manspec_r", spark)
    // the manifest exists (written by the last fold pass, at v=20)
    assert(new java.io.File(path, "_tmanifest").exists())
    val s2 = spark.newSession()
    val cold = content("manspec_r", s2)
    assert(cold === expect)
    assert(GraftTables.lastCoverUsedManifest,
      "reopen did not use the checkpoint manifest")
    // post-manifest tail = versions 21..23 → at most 3 meta reads
    assert(GraftTables.lastCoverMetaReads <= 3,
      s"reopen read ${GraftTables.lastCoverMetaReads} metas — the " +
        "manifest should cover everything but the tail")
  }

  test("an ABSENT or TORN manifest degrades to the full walk — same " +
      "state, never an error") {
    val path = freshPath("torn")
    withFoldEvery(4) { mk("manspec_t", path, 17) }
    val expect = content("manspec_t", spark)
    val f = new java.io.File(path, "_tmanifest")
    // absent
    assert(f.delete())
    val s2 = spark.newSession()
    assert(content("manspec_t", s2) === expect)
    assert(!GraftTables.lastCoverUsedManifest)
    // torn (garbage bytes)
    val out = new java.io.FileOutputStream(f)
    out.write(Array[Byte](1, 2, 3, 4, 5)); out.close()
    val s3 = spark.newSession()
    assert(content("manspec_t", s3) === expect)
    assert(!GraftTables.lastCoverUsedManifest)
  }

  test("OPTIMIZE and VACUUM install a FRESH manifest for the rebased " +
      "log; history times and time travel stay exact") {
    val path = freshPath("rebase")
    withFoldEvery(4) { mk("manspec_v", path, 13) }
    val expect = content("manspec_v", spark)
    val timesBefore = GraftTables.historyTimes(spark, path)
    spark.sql("VACUUM manspec_v RETAIN 5 VERSIONS")
    // retained stamps carry exactly (versions 9..13 plus the rebased
    // seed at 9)
    val timesAfter = GraftTables.historyTimes(spark, path)
    assert(timesAfter === timesBefore.drop(9))
    val s2 = spark.newSession()
    assert(content("manspec_v", s2) === expect)
    assert(GraftTables.lastCoverUsedManifest,
      "post-VACUUM reopen did not use the fresh manifest")
    // the dropped history is gone, the retained tail travels
    intercept[Exception](
      s2.sql("SELECT * FROM manspec_v VERSION AS OF 3").collect())
    assert(s2.sql("SELECT count(*) FROM manspec_v VERSION AS OF 10")
      .collect()(0).getLong(0) === 50)
    spark.sql("DROP TABLE IF EXISTS manspec_v")
  }

  test("a manifest checkpoint never regresses and rival folds are " +
      "adopted: concurrent writers, cold replay exact") {
    val path = freshPath("race")
    spark.sql("DROP TABLE IF EXISTS manspec_c")
    withFoldEvery(3) {
      (1L to 40L).map(k => (k, 0.0)).toDF("k", "bal")
        .createOrReplaceTempView("manspec_c_src")
      spark.sql(s"""CREATE TABLE manspec_c USING graft
        |OPTIONS (key 'k') LOCATION '$path'
        |AS SELECT * FROM manspec_c_src""".stripMargin)
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val threads = (0 until 2).map { t =>
        new Thread(() => {
          try {
            val ss = spark.newSession()
            (1 to 6).foreach { i =>
              ss.sql(s"""UPDATE manspec_c SET bal = ${t * 100 + i}
                |WHERE k % 2 = $t AND k > ${2 * (i - 1)}
                |AND k <= ${2 * i}""".stripMargin)
            }
          } catch { case e: Throwable => errs.add(e); () }
        })
      }
      threads.foreach(_.start())
      threads.foreach(_.join(300000))
      if (!errs.isEmpty) throw errs.peek()
    }
    val expect = (1L to 40L).map { k =>
      val t = (k % 2).toInt
      val i = ((k + 1) / 2).toInt
      k -> (if (i <= 6) (t * 100 + i).toDouble else 0.0)
    }.toMap
    assert(content("manspec_c", spark.newSession()) === expect)
    assert(spark.newSession()
      .sql("SELECT count(*) FROM graft_history('manspec_c')")
      .collect()(0).getLong(0) === 13) // base + 12 commits
    spark.sql("DROP TABLE IF EXISTS manspec_c")
    spark.sql("DROP TABLE IF EXISTS manspec_r")
    spark.sql("DROP TABLE IF EXISTS manspec_t")
  }
}
