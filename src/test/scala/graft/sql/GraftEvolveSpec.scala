package graft.sql

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSessionFixture

/**
 * Phase-2 schema evolution ([[GraftTables.evolveSchema]]): RENAME
 * COLUMN (pure metadata — key columns included), DROP COLUMN (logical
 * projection), and ALTER COLUMN TYPE widening (int->long,
 * float->double) commit as schema deltas carrying a per-field mapping
 * — nothing rewrites, DML keeps flowing under the new shape, replay
 * applies every delta under the schema current at ITS commit, and time
 * travel to pre-evolution versions keeps the old names and types.
 */
class GraftEvolveSpec extends AnyFunSuite {

  private lazy val spark = SparkSessionFixture.spark
  import spark.implicits._

  private def freshPath(name: String): String = {
    val p = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), s"graft_evolve_$name").toString
    new scala.reflect.io.Directory(new java.io.File(p)).deleteRecursively()
    p
  }

  test("rename + widen + drop + DML replay bit-for-bit across a reopen") {
    val path = freshPath("full")
    spark.sql("DROP TABLE IF EXISTS evspec_t")
    (1L to 50L).map(k => (k, k.toInt * 10, k.toFloat / 2, s"n$k"))
      .toDF("k", "cnt", "ratio", "name")
      .createOrReplaceTempView("evspec_src")
    spark.sql(s"""CREATE TABLE evspec_t USING graft
      |OPTIONS (key 'k') LOCATION '$path'
      |AS SELECT * FROM evspec_src""".stripMargin)
    spark.sql("UPDATE evspec_t SET cnt = cnt + 1 WHERE k <= 5") // v1
    spark.sql("ALTER TABLE evspec_t RENAME COLUMN cnt TO hits") // v2
    spark.sql("UPDATE evspec_t SET hits = hits + 100 WHERE k <= 2") // v3
    spark.sql("ALTER TABLE evspec_t ALTER COLUMN hits TYPE bigint") // v4
    spark.sql( // v5: a value only a bigint can hold
      "UPDATE evspec_t SET hits = 4000000000 WHERE k = 1")
    spark.sql("ALTER TABLE evspec_t DROP COLUMN name") // v6
    spark.sql("UPDATE evspec_t SET ratio = 9.5 WHERE k = 3") // v7
    assert(spark.table("evspec_t").columns.toSeq ===
      Seq("k", "hits", "ratio"))
    val live = spark.sql("SELECT k, hits, ratio FROM evspec_t ORDER BY k")
      .collect().map(_.toSeq).toSeq
    assert(live(0) === Seq(1L, 4000000000L, 0.5f))
    assert(live(1) === Seq(2L, 121L, 1.0f))
    assert(live(2) === Seq(3L, 31L, 9.5f))
    assert(live(9) === Seq(10L, 100L, 5.0f))
    // a FRESH session replays base + 7 deltas through both fences
    val s2 = spark.newSession()
    val re = s2.sql("SELECT k, hits, ratio FROM evspec_t ORDER BY k")
      .collect().map(_.toSeq).toSeq
    assert(re === live)
    // time travel BEFORE the evolution keeps old names and types
    val old = s2.sql("SELECT k, cnt, name FROM evspec_t VERSION AS OF 1 " +
      "WHERE k = 1").collect()(0)
    assert(old.getInt(1) === 11 && old.getString(2) === "n1")
    // ... and the widened column reads back as INT there
    assert(s2.table("evspec_t").schema("hits").dataType ===
      org.apache.spark.sql.types.LongType)
    spark.sql("DROP TABLE IF EXISTS evspec_t")
  }

  test("key column rename keeps routing, DML, and reopen exact") {
    val path = freshPath("key")
    spark.sql("DROP TABLE IF EXISTS evspec_k")
    (1L to 30L).map(k => (k, k * 1.0)).toDF("id", "v")
      .createOrReplaceTempView("evspec_ksrc")
    spark.sql(s"""CREATE TABLE evspec_k USING graft
      |OPTIONS (key 'id') LOCATION '$path'
      |AS SELECT * FROM evspec_ksrc""".stripMargin)
    spark.sql("ALTER TABLE evspec_k RENAME COLUMN id TO doc_id")
    // point routing under the new key name (index untouched)
    assert(spark.sql("SELECT v FROM evspec_k WHERE doc_id = 7")
      .collect()(0).getDouble(0) === 7.0)
    spark.sql("UPDATE evspec_k SET v = -1 WHERE doc_id = 7")
    spark.sql("DELETE FROM evspec_k WHERE doc_id = 30")
    val s2 = spark.newSession()
    assert(s2.sql("SELECT v FROM evspec_k WHERE doc_id = 7")
      .collect()(0).getDouble(0) === -1.0)
    assert(s2.sql("SELECT count(*) FROM evspec_k")
      .collect()(0).getLong(0) === 29)
    spark.sql("DROP TABLE IF EXISTS evspec_k")
  }

  test("composite-key tables evolve too: rename a key component, widen " +
      "and drop value columns, routing and reopen exact") {
    val path = freshPath("comp")
    spark.sql("DROP TABLE IF EXISTS evspec_c")
    (for (a <- 1L to 10L; b <- 1L to 5L) yield (a, b, (a * 10 + b).toInt, "x"))
      .toDF("a", "b", "cnt", "junk")
      .createOrReplaceTempView("evspec_csrc")
    spark.sql(s"""CREATE TABLE evspec_c USING graft
      |OPTIONS (key 'a,b') LOCATION '$path'
      |AS SELECT * FROM evspec_csrc""".stripMargin)
    spark.sql("ALTER TABLE evspec_c RENAME COLUMN a TO user_id") // v1
    spark.sql("UPDATE evspec_c SET cnt = 0 WHERE user_id = 3 AND b = 2")
    spark.sql("ALTER TABLE evspec_c ALTER COLUMN cnt TYPE bigint") // v3
    spark.sql( // v4: bigint-only value
      "UPDATE evspec_c SET cnt = 5000000000 WHERE user_id = 1 AND b = 1")
    spark.sql("ALTER TABLE evspec_c DROP COLUMN junk") // v5
    assert(spark.table("evspec_c").columns.toSeq ===
      Seq("user_id", "b", "cnt"))
    // composite point routing under the renamed leading key
    assert(spark.sql(
      "SELECT cnt FROM evspec_c WHERE user_id = 3 AND b = 2")
      .collect()(0).getLong(0) === 0L)
    val s2 = spark.newSession()
    val re = s2.sql("SELECT user_id, b, cnt FROM evspec_c ORDER BY user_id, b")
      .collect().map(_.toSeq).toSeq
    assert(re.length === 50)
    assert(re.head === Seq(1L, 1L, 5000000000L))
    assert(re(11) === Seq(3L, 2L, 0L))
    assert(re(21) === Seq(5L, 2L, 52L))
    // pre-evolution time travel: old key name, INT type, junk present
    val old = s2.sql(
      "SELECT a, cnt, junk FROM evspec_c VERSION AS OF 0 WHERE a = 3 AND b = 2")
      .collect()(0)
    assert(old.getInt(1) === 32 && old.getString(2) === "x")
    spark.sql("DROP TABLE IF EXISTS evspec_c")
  }

  test("change feed across a rename fails loudly; startingVersion=0 " +
      "snapshots AT the evolution point and tails cleanly") {
    val path = freshPath("feed")
    spark.sql("DROP TABLE IF EXISTS evspec_f")
    (1L to 10L).map(k => (k, k * 1.0)).toDF("k", "val0")
      .createOrReplaceTempView("evspec_fsrc")
    spark.sql(s"""CREATE TABLE evspec_f USING graft
      |OPTIONS (key 'k') LOCATION '$path'
      |AS SELECT * FROM evspec_fsrc""".stripMargin)
    spark.sql("UPDATE evspec_f SET val0 = 11 WHERE k = 1") // v1 (old name)
    spark.sql("ALTER TABLE evspec_f RENAME COLUMN val0 TO v") // v2
    spark.sql("UPDATE evspec_f SET v = 33 WHERE k = 3") // v3
    // a feed asked to read across the rename must refuse, not NULL out
    val e = intercept[Exception] {
      val q = spark.readStream.format("graft").option("path", path)
        .option("startingVersion", "1").load()
        .writeStream.format("memory").queryName("evspec_feed_bad")
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }
    assert(e.getMessage.contains("RENAME/DROP COLUMN") ||
      Option(e.getCause).exists(_.getMessage.contains("RENAME/DROP COLUMN")),
      e.getMessage)
    // the documented remedy: a snapshot stream — its snapshot sits AT
    // the evolution (v2, renamed schema) and the tail starts after it
    val q2 = spark.readStream.format("graft").option("path", path)
      .option("startingVersion", "0").load()
      .writeStream.format("memory").queryName("evspec_feed_ok")
      .outputMode("append").start()
    try q2.processAllAvailable() finally q2.stop()
    val rows = spark.table("evspec_feed_ok").collect()
      .map(r => (r.getLong(0), r.get(1), r.getString(2), r.getLong(3)))
    val snap = (1L to 10L).map(k =>
      (k, if (k == 1) 11.0 else k * 1.0, "insert", 2L)).toSet
    assert(rows.toSet === snap + ((3L, 33.0, "upsert", 3L)))
    spark.sql("DROP TABLE IF EXISTS evspec_f")
  }

  test("the feed fence derives from the committed log: it survives a " +
      "lost root hint, and a pure type widening does NOT fence") {
    val path = freshPath("fence")
    spark.sql("DROP TABLE IF EXISTS evspec_fc")
    (1L to 8L).map(k => (k, k.toInt)).toDF("k", "cnt")
      .createOrReplaceTempView("evspec_fcsrc")
    spark.sql(s"""CREATE TABLE evspec_fc USING graft
      |OPTIONS (key 'k') LOCATION '$path'
      |AS SELECT * FROM evspec_fcsrc""".stripMargin)
    spark.sql("UPDATE evspec_fc SET cnt = 11 WHERE k = 1") // v1
    // a WIDENING is served exactly by the feed's casts — no fence
    spark.sql("ALTER TABLE evspec_fc ALTER COLUMN cnt TYPE bigint") // v2
    spark.sql("UPDATE evspec_fc SET cnt = 5000000000 WHERE k = 3") // v3
    assert(GraftTables.latestFeedFence(spark, path).isEmpty,
      "a pure type widening must not fence the change feed")
    val q = spark.readStream.format("graft").option("path", path)
      .option("startingVersion", "1").load()
      .writeStream.format("memory").queryName("evspec_fc_ok")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val rows = spark.table("evspec_fc_ok").collect()
      .map(r => (r.getLong(0), r.get(1), r.getString(2), r.getLong(3)))
    assert(rows.toSet === Set((3L, 5000000000L, "upsert", 3L)))
    // now a RENAME (v4) — and simulate the pre-fix crash window by
    // deleting the root `_evolvever` hint after the commit: the fence
    // must still hold, derived from the version dir's own marker
    spark.sql("ALTER TABLE evspec_fc RENAME COLUMN cnt TO n") // v4
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new org.apache.hadoop.fs.Path(path).toUri,
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path, "_evolvever"), false)
    // a reader (fresh session here; a fresh process would scan the
    // whole tail the same way) must still see the fence
    val s2 = SparkSessionFixture.spark.newSession()
    assert(GraftTables.latestFeedFence(s2, path) === Some(4L),
      "the fence must derive from the committed log, not the root hint")
    // and the self-heal restored the hint
    assert(fs.exists(new org.apache.hadoop.fs.Path(path, "_evolvever")))
    val e = intercept[Exception] {
      val qb = s2.readStream.format("graft").option("path", path)
        .option("startingVersion", "1").load()
        .writeStream.format("memory").queryName("evspec_fc_bad")
        .outputMode("append").start()
      try qb.processAllAvailable() finally qb.stop()
    }
    assert(e.getMessage.contains("RENAME/DROP COLUMN") ||
      Option(e.getCause).exists(_.getMessage.contains("RENAME/DROP COLUMN")),
      e.getMessage)
    spark.sql("DROP TABLE IF EXISTS evspec_fc")
  }

  test("mergeSchema auto-evolution: gated appends ADD new columns, " +
      "ungated ones abort loudly, and auto-evolve races DML safely") {
    val path = freshPath("automerge")
    spark.sql("DROP TABLE IF EXISTS evspec_am")
    (1L to 60L).map(k => (k, k * 1.0)).toDF("k", "bal")
      .createOrReplaceTempView("evspec_amsrc")
    spark.sql(s"""CREATE TABLE evspec_am USING graft
      |OPTIONS (key 'k') LOCATION '$path'
      |AS SELECT * FROM evspec_amsrc""".stripMargin)
    // ungated: loud abort, schema untouched
    intercept[Exception](Seq((1L, 2.0, "x")).toDF("k", "bal", "tag")
      .write.format("graft").mode("append").save(path))
    assert(spark.table("evspec_am").columns.toSeq === Seq("k", "bal"))
    // the session conf gates it too (not just the writer option)
    spark.conf.set("spark.graft.schema.autoMerge", "true")
    try {
      // RACE: an auto-evolving append (new column) vs rival plain DML
      // — both commit under the claim protocol, cold replay exact
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val tEvolve = new Thread(() => {
        try {
          val ss = spark.newSession()
          ss.conf.set("spark.graft.schema.autoMerge", "true")
          (41L to 50L).map(k => (k, -1.0, s"t$k")).toDF("k", "bal", "tag")
            .write.format("graft").mode("append").save(path)
        } catch { case e: Throwable => errs.add(e); () }
      })
      val tDml = new Thread(() => {
        try {
          val ss = spark.newSession()
          (1 to 5).foreach(i =>
            ss.sql(s"UPDATE evspec_am SET bal = ${100 + i} WHERE k = $i"))
        } catch { case e: Throwable => errs.add(e); () }
      })
      tEvolve.start(); tDml.start()
      tEvolve.join(300000); tDml.join(300000)
      if (!errs.isEmpty) throw errs.peek()
      val cold = spark.newSession()
      assert(cold.table("evspec_am").columns.toSeq === Seq("k", "bal", "tag"))
      val rows = cold.sql("SELECT k, bal, tag FROM evspec_am ORDER BY k")
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
      (1L to 5L).foreach(k => assert(rows(k.toInt - 1) === ((k, 100.0 + k, null))))
      (41L to 50L).foreach(k =>
        assert(rows(k.toInt - 1) === ((k, -1.0, s"t$k"))))
      assert(rows(10) === ((11L, 11.0, null))) // untouched row, NULL fill
      // the streaming sink evolves under the same conf
      graft.sql.GraftCatalogSink.upsertBatch(path, "am_stream")(
        Seq((51L, 7.0, "s", 9L)).toDF("k", "bal", "tag", "gen"), 0L)
      val cold2 = spark.newSession()
      assert(cold2.table("evspec_am").columns.toSeq ===
        Seq("k", "bal", "tag", "gen"))
      assert(cold2.sql("SELECT gen FROM evspec_am WHERE k = 51")
        .collect()(0).getLong(0) === 9L)
    } finally spark.conf.unset("spark.graft.schema.autoMerge")
    spark.sql("DROP TABLE IF EXISTS evspec_am")
  }

  test("a RENAME racing concurrent DML: both commit under the claim " +
      "protocol, cold replay exact in either serialization") {
    val path = freshPath("race")
    spark.sql("DROP TABLE IF EXISTS evspec_r")
    (1L to 40L).map(k => (k, k * 1.0)).toDF("k", "val0")
      .createOrReplaceTempView("evspec_rsrc")
    spark.sql(s"""CREATE TABLE evspec_r USING graft
      |OPTIONS (key 'k') LOCATION '$path'
      |AS SELECT * FROM evspec_rsrc""".stripMargin)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val aborted = new java.util.concurrent.atomic.AtomicInteger(0)
    def causes(e: Throwable): Seq[Throwable] =
      Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(8).toSeq
    val dml = new Thread(() => {
      try {
        val ss = spark.newSession()
        // a statement that staged under the pre-rename schema ABORTS
        // LOUDLY at its claim (metadata conflict — nothing commits)
        // and the caller re-runs it against the evolved schema: the
        // Delta-style contract this spec pins down
        (1 to 6).foreach { i =>
          var done = false
          var tries = 0
          while (!done) {
            try {
              ss.sql(s"UPDATE evspec_r SET ${
                if (ss.table("evspec_r").columns.contains("val0")) "val0"
                else "v"
              } = ${100 + i} WHERE k = $i")
              done = true
            } catch {
              case e: Throwable
                  if causes(e).exists(
                    _.isInstanceOf[java.util.ConcurrentModificationException]) =>
                aborted.incrementAndGet()
                // "re-run against the evolved schema": refresh this
                // session's catalog entry so the retry resolves the
                // NEW column names
                ss.catalog.refreshTable("evspec_r")
                tries += 1
                if (tries > 3) throw e
            }
          }
        }
      } catch { case e: Throwable => errs.add(e); () }
    })
    val ren = new Thread(() => {
      try {
        Thread.sleep(150)
        spark.newSession().sql("ALTER TABLE evspec_r RENAME COLUMN val0 TO v")
      } catch { case e: Throwable => errs.add(e); () }
    })
    dml.start(); ren.start()
    dml.join(120000); ren.join(120000)
    if (!errs.isEmpty) throw errs.peek()
    val s2 = spark.newSession()
    assert(s2.table("evspec_r").columns.toSeq === Seq("k", "v"))
    val m = s2.sql("SELECT k, v FROM evspec_r").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    (1L to 6L).foreach(k => assert(m(k) === 100.0 + k, s"k=$k"))
    assert(s2.sql("SELECT count(*) FROM graft_history('evspec_r')")
      .collect()(0).getLong(0) === 8) // base + 6 DML + 1 rename
    spark.sql("DROP TABLE IF EXISTS evspec_r")
  }

  test("RESTORE to a pre-rename version rolls the data back under the " +
      "evolved schema") {
    val path = freshPath("restore")
    spark.sql("DROP TABLE IF EXISTS evspec_rs")
    (1L to 10L).map(k => (k, k * 1.0, s"x$k")).toDF("k", "val0", "tag")
      .createOrReplaceTempView("evspec_rssrc")
    spark.sql(s"""CREATE TABLE evspec_rs USING graft
      |OPTIONS (key 'k') LOCATION '$path'
      |AS SELECT * FROM evspec_rssrc""".stripMargin)
    spark.sql("UPDATE evspec_rs SET val0 = 99 WHERE k = 1") // v1
    spark.sql("ALTER TABLE evspec_rs RENAME COLUMN val0 TO v") // v2
    spark.sql("ALTER TABLE evspec_rs DROP COLUMN tag") // v3
    spark.sql("UPDATE evspec_rs SET v = 77 WHERE k = 2") // v4
    spark.sql("INSERT INTO evspec_rs VALUES (50, 5.0)") // v5
    // back to v1's CONTENT under the CURRENT (renamed, narrowed) shape
    spark.sql("RESTORE TABLE evspec_rs TO VERSION AS OF 1")
    val m = spark.sql("SELECT k, v FROM evspec_rs").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(m.size === 10 && m(1L) === 99.0 && m(2L) === 2.0 &&
      !m.contains(50L))
    assert(spark.table("evspec_rs").columns.toSeq === Seq("k", "v"))
    // the restore is itself a DELTA version: cold replay agrees
    val re = spark.newSession().sql("SELECT k, v FROM evspec_rs").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(re === m)
    // the CDC TVF diffs ACROSS the evolution too: the old endpoint
    // remaps through the schema chain and the diff emits under the
    // NEW names (v1 value 99 vs the restored... compare v1 -> v4)
    val cdc = spark.sql("SELECT * FROM graft_changes('evspec_rs', 1, 4)")
    assert(cdc.columns.toSeq === Seq("k", "v", "_change_type"))
    val updated = cdc.collect().map(r =>
      (r.getLong(0), r.getDouble(1), r.getString(2))).toSet
    assert(updated === Set((2L, 2.0, "update_preimage"),
      (2L, 77.0, "update_postimage")))
    spark.sql("DROP TABLE IF EXISTS evspec_rs")
  }

  test("guards: referenced, keyed, and lossy evolutions are refused") {
    val path = freshPath("guard")
    spark.sql("DROP TABLE IF EXISTS evspec_g")
    (1L to 10L).map(k => (k, k.toInt, k * 1.0)).toDF("k", "grp", "v")
      .createOrReplaceTempView("evspec_gsrc")
    spark.sql(s"""CREATE TABLE evspec_g USING graft
      |OPTIONS (key 'k') LOCATION '$path'
      |AS SELECT * FROM evspec_gsrc""".stripMargin)
    spark.sql("CREATE INDEX g_ix ON evspec_g (grp)")
    spark.sql("ALTER TABLE evspec_g ADD CONSTRAINT vp CHECK (v >= 0)")
    assert(intercept[Exception](spark.sql(
      "ALTER TABLE evspec_g RENAME COLUMN grp TO grp2"))
      .getMessage.contains("referenced by index"))
    assert(intercept[Exception](spark.sql(
      "ALTER TABLE evspec_g DROP COLUMN v"))
      .getMessage.contains("referenced by CHECK constraint"))
    assert(intercept[Exception](spark.sql(
      "ALTER TABLE evspec_g DROP COLUMN k"))
      .getMessage.contains("key column"))
    assert(intercept[Exception](spark.sql(
      "ALTER TABLE evspec_g ALTER COLUMN k TYPE int"))
      .getMessage.contains("key column"))
    // lossy narrowing is refused (bigint -> int)
    spark.sql("ALTER TABLE evspec_g ADD COLUMN big BIGINT")
    assert(intercept[Exception](spark.sql(
      "ALTER TABLE evspec_g ALTER COLUMN big TYPE int"))
      .getMessage.contains("lossless widenings"))
    // after DROP INDEX the rename flows, and the index can re-create
    // under the new name
    spark.sql("DROP INDEX g_ix ON evspec_g")
    spark.sql("ALTER TABLE evspec_g RENAME COLUMN grp TO grp2")
    spark.sql("CREATE INDEX g_ix2 ON evspec_g (grp2)")
    assert(spark.sql("SELECT count(*) FROM evspec_g WHERE grp2 = 3")
      .collect()(0).getLong(0) === 1)
    spark.sql("DROP TABLE IF EXISTS evspec_g")
  }
}
