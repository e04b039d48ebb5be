package graft.sql

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSessionFixture
import graft.pipeline.Similarity

/**
 * The DURABLE vector index ([[GraftVectorIndex]] + the `graft_ann`
 * TVF): `CREATE INDEX ... USING IVF (vec)` on a graft catalog table
 * persists the list-partitioned layout beside the delta log, DML
 * maintains it at delta cost (appends against the saved centroids;
 * deletes resolve at probe time), a REOPENED session probes without
 * any rebuild, and a full probe (nprobe = nlist) equals exact
 * brute-force top-k over the live content.
 */
class GraftVectorIndexSpec extends AnyFunSuite {

  private lazy val spark = SparkSessionFixture.spark
  import spark.implicits._

  private def freshPath(name: String): String = {
    val p = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), s"graft_vec_$name").toString
    new scala.reflect.io.Directory(new java.io.File(p)).deleteRecursively()
    p
  }

  /** Deterministic 8-dim vectors. */
  private def vec(k: Long): Array[Double] =
    Array.tabulate(8)(j => math.sin(k * 0.37 + j * 1.13))

  private val query: Array[Double] = vec(7)
  private def queryLit: String =
    query.map(_.toString).mkString("array(", ", ", ")")

  test("CREATE INDEX USING IVF + graft_ann: full probe equals brute " +
      "force, DML maintains at delta cost, reopen probes cold") {
    val path = freshPath("t")
    spark.sql("DROP TABLE IF EXISTS zvec_t")
    (1L to 400L).map(k => (k, vec(k))).toDF("id", "emb")
      .createOrReplaceTempView("zvec_src")
    spark.sql(s"""CREATE TABLE zvec_t USING graft
      |OPTIONS (key 'id') LOCATION '$path'
      |AS SELECT * FROM zvec_src""".stripMargin)
    spark.sql("CREATE INDEX emb_ivf ON zvec_t USING IVF (emb)")
    // the sidecar is on disk, list-partitioned
    val lists = new java.io.File(s"$path/_tivf_emb_ivf/lists")
    assert(lists.isDirectory)
    assert(lists.listFiles().exists(_.getName.startsWith("__list=")))
    def ann(s: org.apache.spark.sql.SparkSession, nprobe: Int) =
      s.sql(s"SELECT * FROM graft_ann('zvec_t', 'emb_ivf', $queryLit, " +
        s"10, $nprobe)")
    def brute(s: org.apache.spark.sql.SparkSession) =
      Similarity.bruteTopK(
        s.sql("SELECT id, emb FROM zvec_t"), "id", "emb", query, 10)
    // full probe == exact brute force (bit-identical cosine kernel)
    assert(ann(spark, 16).collect().map(_.toSeq).toSeq ===
      brute(spark).collect().map(_.toSeq).toSeq)
    // a partial probe returns a subset of the vector space — top-1 is
    // the query's own vector (id 7 dominates its home list)
    val partial = ann(spark, 4).collect()
    assert(partial.nonEmpty && partial.head.getLong(0) === 7L)
    // DML: delete one of the true top ids, insert a new near-query
    // vector, update another id's vector INTO the neighborhood — the
    // probe must see all three without any rebuild
    val top = brute(spark).collect().map(_.getLong(0))
    spark.sql(s"DELETE FROM zvec_t WHERE id = ${top(1)}")
    spark.sql(s"INSERT INTO zvec_t VALUES (9001, $queryLit)")
    spark.sql(s"UPDATE zvec_t SET emb = $queryLit WHERE id = 200")
    assert(ann(spark, 16).collect().map(_.toSeq).toSeq ===
      brute(spark).collect().map(_.toSeq).toSeq)
    val ids = ann(spark, 16).collect().map(_.getLong(0)).toSet
    assert(!ids.contains(top(1)), "deleted id still probed")
    assert(ids.contains(9001L), "inserted vector not probed")
    assert(ids.contains(200L), "updated vector not probed")
    // a REOPENED session probes the durable index cold — no rebuild,
    // same answers
    val s2 = spark.newSession()
    assert(ann(s2, 16).collect().map(_.toSeq).toSeq ===
      brute(s2).collect().map(_.toSeq).toSeq)
    // DROP INDEX removes the sidecar
    spark.sql("DROP INDEX emb_ivf ON zvec_t")
    assert(!new java.io.File(s"$path/_tivf_emb_ivf").exists())
    intercept[Exception](ann(spark, 16).collect())
    spark.sql("DROP TABLE IF EXISTS zvec_t")
  }

  test("OPTIMIZE and VACUUM carry the durable vector index through " +
      "the base-rewrite swap: probes stay brute-equal, DML maintenance " +
      "keeps running") {
    val path = freshPath("mv")
    spark.sql("DROP TABLE IF EXISTS zvec_mv")
    (1L to 300L).map(k => (k, vec(k))).toDF("id", "emb")
      .createOrReplaceTempView("zvec_mvsrc")
    spark.sql(s"""CREATE TABLE zvec_mv USING graft
      |OPTIONS (key 'id') LOCATION '$path'
      |AS SELECT * FROM zvec_mvsrc""".stripMargin)
    spark.sql("CREATE INDEX e ON zvec_mv USING IVF (emb)")
    def ann(nprobe: Int) =
      spark.sql(s"SELECT * FROM graft_ann('zvec_mv', 'e', $queryLit, " +
        s"10, $nprobe)")
    def brute = Similarity.bruteTopK(
      spark.sql("SELECT id, emb FROM zvec_mv"), "id", "emb", query, 10)
    // DML so OPTIMIZE has deltas to fold, then the base-rewrite swap
    spark.sql("DELETE FROM zvec_mv WHERE id = 7")
    spark.sql(s"INSERT INTO zvec_mv VALUES (9001, $queryLit)")
    spark.sql("OPTIMIZE zvec_mv")
    assert(new java.io.File(s"$path/_tivf_e/lists").isDirectory,
      "OPTIMIZE dropped the vector-index sidecar")
    // OPTIMIZE also COMPACTS the index: dead entries (the deleted key,
    // superseded versions) rewrite away — the lists hold exactly the
    // live content — and buildVersion advances to the compacted
    // version, re-arming the probe's read-mostly zero-join fast path
    val liveN = spark.sql("SELECT count(*) FROM zvec_mv")
      .collect()(0).getLong(0)
    assert(spark.read.parquet(s"$path/_tivf_e/lists").count() === liveN,
      "OPTIMIZE left dead entries in the index lists")
    assert(GraftVectorIndex.readMeta(spark, path, "e")
      .map(_.buildVersion) === Some(GraftTables.diskVersion(spark, path)),
      "index compaction did not advance buildVersion")
    assert(ann(16).collect().map(_.toSeq).toSeq ===
      brute.collect().map(_.toSeq).toSeq)
    // maintenance still runs after the swap: new vectors are probed
    spark.sql(s"INSERT INTO zvec_mv VALUES (9002, $queryLit)")
    assert(ann(16).collect().map(_.getLong(0)).contains(9002L),
      "post-OPTIMIZE DML no longer maintains the index")
    // VACUUM folds history — the index must ride that swap too
    spark.sql(s"UPDATE zvec_mv SET emb = $queryLit WHERE id = 250")
    spark.sql("VACUUM zvec_mv RETAIN 1 VERSIONS")
    assert(new java.io.File(s"$path/_tivf_e/lists").isDirectory,
      "VACUUM dropped the vector-index sidecar")
    assert(ann(16).collect().map(_.toSeq).toSeq ===
      brute.collect().map(_.toSeq).toSeq)
    // and a reopened session probes the carried index cold
    val s2 = spark.newSession()
    assert(s2.sql(s"SELECT * FROM graft_ann('zvec_mv', 'e', $queryLit, " +
      "10, 16)").collect().map(_.toSeq).toSeq ===
      brute.collect().map(_.toSeq).toSeq)
    spark.sql("DROP TABLE IF EXISTS zvec_mv")
  }

  test("CREATE INDEX USING IVFPQ: codes-only lists (no raw vectors), " +
      "full probe + full re-rank equals brute force across DML and " +
      "reopen, partial probe finds the home list") {
    val path = freshPath("pq")
    spark.sql("DROP TABLE IF EXISTS zvec_pq")
    // 150 live rows with k=10: the ADC shortlist (16·k = 160) covers
    // every row at nprobe = nlist, so the exact re-rank must equal
    // brute-force top-k BIT-FOR-BIT — no recall slack in this spec
    (1L to 150L).map(k => (k, vec(k))).toDF("id", "emb")
      .createOrReplaceTempView("zvec_pqsrc")
    spark.sql(s"""CREATE TABLE zvec_pq USING graft
      |OPTIONS (key 'id') LOCATION '$path'
      |AS SELECT * FROM zvec_pqsrc""".stripMargin)
    spark.sql("CREATE INDEX epq ON zvec_pq USING IVFPQ (emb)")
    // the lists hold CODES and versions only — the raw vector column
    // never lands in the index (the memory-bandwidth contract)
    val lists = new java.io.File(s"$path/_tivf_epq/lists")
    assert(lists.isDirectory)
    assert(lists.listFiles().exists(_.getName.startsWith("__list=")))
    val listCols = spark.read.parquet(s"$path/_tivf_epq/lists").columns.toSet
    assert(listCols === Set("id", "__codes", "__ver", "__list"))
    assert(new java.io.File(s"$path/_tivf_epq/books").isDirectory)
    def ann(s: org.apache.spark.sql.SparkSession, nprobe: Int) =
      s.sql(s"SELECT * FROM graft_ann('zvec_pq', 'epq', $queryLit, " +
        s"10, $nprobe)")
    def brute(s: org.apache.spark.sql.SparkSession) =
      Similarity.bruteTopK(
        s.sql("SELECT id, emb FROM zvec_pq"), "id", "emb", query, 10)
    assert(ann(spark, 16).collect().map(_.toSeq).toSeq ===
      brute(spark).collect().map(_.toSeq).toSeq)
    // partial probe: the query's own vector dominates its home list
    val partial = ann(spark, 4).collect()
    assert(partial.nonEmpty && partial.head.getLong(0) === 7L)
    // DML maintains the codes at delta cost (no rebuild): delete a
    // true-top id, insert a near-query vector, update one in
    val top = brute(spark).collect().map(_.getLong(0))
    spark.sql(s"DELETE FROM zvec_pq WHERE id = ${top(1)}")
    spark.sql(s"INSERT INTO zvec_pq VALUES (9001, $queryLit)")
    spark.sql(s"UPDATE zvec_pq SET emb = $queryLit WHERE id = 120")
    assert(ann(spark, 16).collect().map(_.toSeq).toSeq ===
      brute(spark).collect().map(_.toSeq).toSeq)
    val ids = ann(spark, 16).collect().map(_.getLong(0)).toSet
    assert(!ids.contains(top(1)), "deleted id still probed")
    assert(ids.contains(9001L), "inserted vector not probed")
    assert(ids.contains(120L), "updated vector not probed")
    // reopened session: cold durable probe, same answers
    val s2 = spark.newSession()
    assert(ann(s2, 16).collect().map(_.toSeq).toSeq ===
      brute(s2).collect().map(_.toSeq).toSeq)
    spark.sql("DROP INDEX epq ON zvec_pq")
    assert(!new java.io.File(s"$path/_tivf_epq").exists())
    spark.sql("DROP TABLE IF EXISTS zvec_pq")
  }

  test("IVFPQ OPTIONS (nlist, m, ks) are honored; m must divide dim") {
    val path = freshPath("pqopt")
    spark.sql("DROP TABLE IF EXISTS zvec_po")
    (1L to 100L).map(k => (k, vec(k))).toDF("id", "emb")
      .createOrReplaceTempView("zvec_posrc")
    spark.sql(s"""CREATE TABLE zvec_po USING graft
      |OPTIONS (key 'id') LOCATION '$path'
      |AS SELECT * FROM zvec_posrc""".stripMargin)
    spark.sql("CREATE INDEX epo ON zvec_po USING IVFPQ (emb) " +
      "OPTIONS (nlist '4', m '4', ks '8')")
    val books = spark.read.parquet(s"$path/_tivf_epo/books")
    assert(books.select("mm").distinct().count() === 4)   // m subspaces
    assert(books.count() === 4 * 8)                       // m × ks codes
    assert(spark.read.parquet(s"$path/_tivf_epo/centroids").count() === 4)
    val r = spark.sql(s"SELECT * FROM graft_ann('zvec_po', 'epo', " +
      s"$queryLit, 5, 4)").collect()
    assert(r.length === 5 && r.head.getLong(0) === 7L)
    // 8-dim vectors cannot split into 3 subspaces
    val e = intercept[Exception](spark.sql(
      "CREATE INDEX ebad ON zvec_po USING IVFPQ (emb) OPTIONS (m '3')"))
    assert(e.getMessage.contains("divide"), e.getMessage)
    spark.sql("DROP TABLE IF EXISTS zvec_po")
  }

  test("filtered vector search: the 6th graft_ann arg constrains the " +
      "pool BEFORE top-k (k best among matching), equals filtered " +
      "brute force for IVF and IVFPQ, stays correct across DML") {
    val path = freshPath("flt")
    spark.sql("DROP TABLE IF EXISTS zvec_flt")
    (1L to 250L).map(k => (k, vec(k), k % 5)).toDF("id", "emb", "lab")
      .createOrReplaceTempView("zvec_fltsrc")
    spark.sql(s"""CREATE TABLE zvec_flt USING graft
      |OPTIONS (key 'id') LOCATION '$path'
      |AS SELECT * FROM zvec_fltsrc""".stripMargin)
    spark.sql("CREATE INDEX e ON zvec_flt USING IVF (emb)")
    spark.sql("CREATE INDEX epq ON zvec_flt USING IVFPQ (emb)")
    def ann(idx: String) = spark.sql(
      s"SELECT * FROM graft_ann('zvec_flt', '$idx', $queryLit, 10, 16, " +
        "'lab = 2')")
    def bruteF = Similarity.bruteTopK(
      spark.sql("SELECT id, emb FROM zvec_flt WHERE lab = 2"),
      "id", "emb", query, 10)
    val r = ann("e").collect()
    assert(r.map(_.toSeq).toSeq === bruteF.collect().map(_.toSeq).toSeq)
    // before-top-k semantics: only 1/5 of rows carry lab = 2, so a
    // post-filter on unconstrained top-10 could not fill k — the
    // filtered search must still return a full k among matching rows
    assert(r.length === 10)
    assert(r.forall(_.getLong(0) % 5 === 2), "a non-matching row leaked")
    assert(ann("epq").collect().map(_.toSeq).toSeq ===
      bruteF.collect().map(_.toSeq).toSeq)
    // DML: drop the filtered best, add a better matching vector — both
    // visible through the filter on the next probe
    val best = r.head.getLong(0)
    spark.sql(s"DELETE FROM zvec_flt WHERE id = $best")
    spark.sql(s"INSERT INTO zvec_flt VALUES (9002, $queryLit, 2)")
    val r2 = ann("e").collect()
    assert(r2.map(_.toSeq).toSeq === bruteF.collect().map(_.toSeq).toSeq)
    assert(r2.head.getLong(0) === 9002L && !r2.map(_.getLong(0)).contains(best))
    assert(ann("epq").collect().map(_.toSeq).toSeq ===
      bruteF.collect().map(_.toSeq).toSeq)
    // a predicate naming a non-existent column fails loudly
    intercept[Exception](spark.sql(
      s"SELECT * FROM graft_ann('zvec_flt', 'e', $queryLit, 10, 16, " +
        "'no_such_col = 1')").collect())
    spark.sql("DROP TABLE IF EXISTS zvec_flt")
  }

  test("probeBatch: one job answers every query from the durable IVF " +
      "index — per-query results equal the single-query probe across " +
      "DML; ivfpq batches too (per-query ADC LUT columns)") {
    val path = freshPath("bat")
    spark.sql("DROP TABLE IF EXISTS zvec_bat")
    (1L to 300L).map(k => (k, vec(k))).toDF("id", "emb")
      .createOrReplaceTempView("zvec_batsrc")
    spark.sql(s"""CREATE TABLE zvec_bat USING graft
      |OPTIONS (key 'id') LOCATION '$path'
      |AS SELECT * FROM zvec_batsrc""".stripMargin)
    spark.sql("CREATE INDEX e ON zvec_bat USING IVF (emb)")
    spark.sql("DELETE FROM zvec_bat WHERE id % 31 = 4")
    spark.sql(s"INSERT INTO zvec_bat VALUES (9001, $queryLit)")
    val qids = Seq(7L, 50L, 123L, 250L)
    val queries = qids.map(q => (q, vec(q))).toDF("qid", "qv")
    val (_, h) = GraftTables.current(spark, path)
    val batch = GraftVectorIndex.probeBatch(spark, path, "e",
      h.toDF(spark), h.keyCols, queries, "qid", "qv", k = 5, nprobe = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(t => (-t._3, t._2)).map(_._2).toSeq).toMap
    qids.foreach { q =>
      val lit = vec(q).map(_.toString).mkString("array(", ", ", ")")
      val single = spark.sql(
        s"SELECT * FROM graft_ann('zvec_bat', 'e', $lit, 5, 16)")
        .collect().map(_.getLong(0)).toSeq
      assert(batch(q) === single, s"query $q: batch != single probe")
    }
    // ivfpq batches too: each query row carries its own codegen'd ADC
    // LUT — per-query results equal the looped single-query probe
    // (same nprobe, same shortlist arithmetic)
    spark.sql("CREATE INDEX epq ON zvec_bat USING IVFPQ (emb)")
    val batchPq = GraftVectorIndex.probeBatch(spark, path, "epq",
      h.toDF(spark), h.keyCols, queries, "qid", "qv", k = 5, nprobe = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(t => (-t._3, t._2)).map(_._2).toSeq).toMap
    qids.foreach { q =>
      val lit = vec(q).map(_.toString).mkString("array(", ", ", ")")
      val single = spark.sql(
        s"SELECT * FROM graft_ann('zvec_bat', 'epq', $lit, 5, 16)")
        .collect().map(_.getLong(0)).toSeq
      assert(batchPq(q) === single, s"query $q: batch PQ != single probe")
    }
    // reserved output/internal column names are refused up front
    val e = intercept[IllegalArgumentException](
      GraftVectorIndex.probeBatch(spark, path, "e", h.toDF(spark),
        h.keyCols, queries.withColumnRenamed("qid", "cos"), "cos",
        "qv", 5, 16))
    assert(e.getMessage.contains("cos"), e.getMessage)
    spark.sql("DROP TABLE IF EXISTS zvec_bat")
  }

  test("a crash between compaction's delete and rename recovers: the " +
      "staged sibling promotes on the next read; a stale sibling " +
      "beside a healthy index is swept") {
    val path = freshPath("rec")
    spark.sql("DROP TABLE IF EXISTS zvec_rec")
    (1L to 200L).map(k => (k, vec(k))).toDF("id", "emb")
      .createOrReplaceTempView("zvec_recsrc")
    spark.sql(s"""CREATE TABLE zvec_rec USING graft
      |OPTIONS (key 'id') LOCATION '$path'
      |AS SELECT * FROM zvec_recsrc""".stripMargin)
    spark.sql("CREATE INDEX e ON zvec_rec USING IVF (emb)")
    def ann = spark.sql(
      s"SELECT * FROM graft_ann('zvec_rec', 'e', $queryLit, 10, 16)")
    val expect = ann.collect().map(_.toSeq).toSeq
    // simulate the crash window: the full layout sits staged in the
    // sibling, the index dir is gone (rename never ran)
    val idx = new java.io.File(s"$path/_tivf_e")
    val tmp = new java.io.File(s"$path/_tivftmp_e")
    assert(idx.renameTo(tmp))
    assert(!idx.exists() && tmp.exists())
    assert(ann.collect().map(_.toSeq).toSeq === expect,
      "probe did not recover the staged compaction")
    assert(idx.exists() && !tmp.exists(), "recovery did not promote")
    // the other crash shape: stage complete but the DELETE never ran —
    // the healthy index wins. A YOUNG stage is a live rival's
    // in-flight rewrite and must survive recovery (r18's unconditional
    // sweep could delete an in-flight OPTIMIZE's stage); once it AGES
    // past staleStageMs it is provably dead and sweeps.
    // the r20 stage shape: prefix + "_" + exactly 32 hex chars (the
    // un-nestable form isStageOf recognizes)
    val hex32 = "deadbeef" * 4
    val tmp2 = new java.io.File(s"$path/_tivftmp_e_$hex32")
    org.apache.hadoop.fs.FileUtil.copy(
      org.apache.hadoop.fs.FileSystem.getLocal(
        spark.sparkContext.hadoopConfiguration),
      new org.apache.hadoop.fs.Path(idx.toString),
      org.apache.hadoop.fs.FileSystem.getLocal(
        spark.sparkContext.hadoopConfiguration),
      new org.apache.hadoop.fs.Path(tmp2.toString),
      false, spark.sparkContext.hadoopConfiguration)
    assert(ann.collect().map(_.toSeq).toSeq === expect)
    assert(idx.exists() && tmp2.exists(),
      "a young (possibly in-flight) stage must NOT be swept")
    assert(tmp2.setLastModified(
      System.currentTimeMillis() - 2 * GraftVectorIndex.staleStageMs))
    // recovery memoizes its listing on healthy indexes — force the
    // next probe to re-list so the aged sweep is observable now
    val savedInterval = GraftVectorIndex.recoveryCheckIntervalMs
    GraftVectorIndex.recoveryCheckIntervalMs = 0
    try {
      // a LIVE heartbeat inside the stage keeps it safe even with an
      // ancient root mtime — a long rewrite only touches deep files,
      // so the root mtime alone would read as abandonment (ADVICE r19)
      val lfs = org.apache.hadoop.fs.FileSystem.getLocal(
        spark.sparkContext.hadoopConfiguration)
      graft.MarkerFile.writeLong(lfs,
        new org.apache.hadoop.fs.Path(tmp2.toString, "_hb"),
        System.currentTimeMillis())
      assert(tmp2.setLastModified(
        System.currentTimeMillis() - 2 * GraftVectorIndex.staleStageMs))
      assert(ann.collect().map(_.toSeq).toSeq === expect)
      assert(idx.exists() && tmp2.exists(),
        "a heartbeat-live stage with an old root mtime was swept")
      // heartbeat gone stale too -> provably dead, sweeps
      graft.MarkerFile.writeLong(lfs,
        new org.apache.hadoop.fs.Path(tmp2.toString, "_hb"),
        System.currentTimeMillis() - 2 * GraftVectorIndex.staleStageMs)
      assert(tmp2.setLastModified(
        System.currentTimeMillis() - 2 * GraftVectorIndex.staleStageMs))
      assert(ann.collect().map(_.toSeq).toSeq === expect)
      assert(idx.exists() && !tmp2.exists(), "aged dead stage not swept")
    } finally GraftVectorIndex.recoveryCheckIntervalMs = savedInterval
    spark.sql("DROP TABLE IF EXISTS zvec_rec")
  }

  test("stage names are un-nestable across sibling indexes: a headless " +
      "'e' never promotes a stage of 'e_2', and DROP INDEX e leaves " +
      "e_2's in-flight stage alone") {
    val path = freshPath("nest")
    spark.sql("DROP TABLE IF EXISTS zvec_nest")
    (1L to 200L).map(k => (k, vec(k))).toDF("id", "emb")
      .createOrReplaceTempView("zvec_nestsrc")
    spark.sql(s"""CREATE TABLE zvec_nest USING graft
      |OPTIONS (key 'id') LOCATION '$path'
      |AS SELECT * FROM zvec_nestsrc""".stripMargin)
    spark.sql("CREATE INDEX e ON zvec_nest USING IVF (emb)")
    spark.sql("CREATE INDEX e_2 ON zvec_nest USING IVF (emb)")
    def ann(name: String) = spark.sql(
      s"SELECT * FROM graft_ann('zvec_nest', '$name', $queryLit, 10, 16)")
    val expect2 = ann("e_2").collect().map(_.toSeq).toSeq
    // a COMPLETE staged rewrite of e_2, as REINDEX/compaction leave it
    // when crashed mid-swap
    val lfs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val stage2 = s"$path/_tivftmp_e_2_${"0123456789abcdef" * 2}"
    org.apache.hadoop.fs.FileUtil.copy(lfs,
      new org.apache.hadoop.fs.Path(s"$path/_tivf_e_2"), lfs,
      new org.apache.hadoop.fs.Path(stage2), false,
      spark.sparkContext.hadoopConfiguration)
    // e goes headless (crash wiped it); before the un-nestable match,
    // e's recovery would promote e_2's stage as e — wrong layout,
    // silently wrong probes
    new scala.reflect.io.Directory(
      new java.io.File(s"$path/_tivf_e")).deleteRecursively()
    val savedInterval = GraftVectorIndex.recoveryCheckIntervalMs
    GraftVectorIndex.recoveryCheckIntervalMs = 0
    try {
      val e1 = intercept[Exception](ann("e").collect())
      assert(e1.getMessage.contains("no IVF index"), e1.getMessage)
      assert(new java.io.File(stage2).exists(),
        "headless e's recovery consumed e_2's stage")
      // DROP INDEX e sweeps only e's OWN stages
      spark.sql("DROP INDEX e ON zvec_nest")
      assert(new java.io.File(stage2).exists(),
        "DROP INDEX e swept e_2's in-flight stage")
      // e_2's own recovery still promotes ITS stage when headless
      new scala.reflect.io.Directory(
        new java.io.File(s"$path/_tivf_e_2")).deleteRecursively()
      assert(ann("e_2").collect().map(_.toSeq).toSeq === expect2,
        "e_2's recovery did not promote its own staged layout")
      assert(new java.io.File(s"$path/_tivf_e_2").exists())
    } finally GraftVectorIndex.recoveryCheckIntervalMs = savedInterval
    spark.sql("DROP TABLE IF EXISTS zvec_nest")
  }

  test("IVF on a temp view is refused (needs a durable table); " +
      "non-array columns are refused") {
    val path = freshPath("rej")
    spark.sql("DROP TABLE IF EXISTS zvec_r")
    (1L to 50L).map(k => (k, vec(k), k * 1.0)).toDF("id", "emb", "v")
      .createOrReplaceTempView("zvec_rsrc")
    spark.sql(s"""CREATE TABLE zvec_r USING graft
      |OPTIONS (key 'id') LOCATION '$path'
      |AS SELECT * FROM zvec_rsrc""".stripMargin)
    val e = intercept[Exception](
      spark.sql("CREATE INDEX bad ON zvec_r USING IVF (v)"))
    assert(e.getMessage.contains("array vector"), e.getMessage)
    val h = IndexedFrame.index(
      (1L to 50L).map(k => (k, k * 1.0)).toDF("id", "v"), "id")
    h.toDF(spark).createOrReplaceTempView("zvec_view")
    val e2 = intercept[Exception](
      spark.sql("CREATE INDEX bad2 ON zvec_view USING IVF (v)"))
    assert(e2.getMessage.contains("CATALOG table"), e2.getMessage)
    spark.sql("DROP TABLE IF EXISTS zvec_r")
  }

  test("legacy untagged _meta layouts parse and migrate to the " +
      "tagged format; garbage _meta fails loudly, not as 'no index'") {
    val path = freshPath("mig")
    spark.sql("DROP TABLE IF EXISTS zvec_mig")
    (1L to 100L).map(k => (k, vec(k))).toDF("id", "emb")
      .createOrReplaceTempView("zvec_migsrc")
    spark.sql(s"""CREATE TABLE zvec_mig USING graft
      |OPTIONS (key 'id') LOCATION '$path'
      |AS SELECT * FROM zvec_migsrc""".stripMargin)
    spark.sql("CREATE INDEX e ON zvec_mig USING IVF (emb)")
    val expect = spark.sql(
      s"SELECT * FROM graft_ann('zvec_mig', 'e', $queryLit, 5, 16)")
      .collect().map(_.toSeq).toSeq
    val m0 = GraftVectorIndex.readMeta(spark, path, "e").get
    val metaF = new java.io.File(s"$path/_tivf_e/_meta")
    def rewrite(write: java.io.ObjectOutputStream => Unit): Unit = {
      val out = new java.io.ObjectOutputStream(
        new java.io.FileOutputStream(metaF))
      try { write(out); out.flush() } finally out.close()
      // drop the checksum sidecar so the local ChecksumFileSystem
      // accepts the hand-written legacy bytes
      new java.io.File(s"$path/_tivf_e/._meta.crc").delete()
      ()
    }
    // r17 layout: vecCol first, no kind/m/ks, no version tag. A
    // legacy meta cannot carry the v3 lists schema — it parses with
    // "" (probes fall back to footer inference)
    val m0Legacy = m0.copy(listsSchemaJson = "")
    rewrite { out =>
      out.writeObject(m0.vecCol); out.writeInt(m0.nlist)
      out.writeLong(m0.buildVersion)
    }
    assert(GraftVectorIndex.readMeta(spark, path, "e").contains(m0Legacy))
    // ... and the read MIGRATED the sidecar to the tagged layout
    val in = new java.io.ObjectInputStream(
      new java.io.FileInputStream(metaF))
    try assert(in.readInt() === 0x47564958, "meta not migrated")
    finally in.close()
    // r18 layout: kind first, still untagged
    rewrite { out =>
      out.writeObject(m0.kind); out.writeObject(m0.vecCol)
      out.writeInt(m0.nlist); out.writeLong(m0.buildVersion)
      out.writeInt(m0.m); out.writeInt(m0.ks)
    }
    assert(GraftVectorIndex.readMeta(spark, path, "e").contains(m0Legacy))
    assert(spark.sql(
      s"SELECT * FROM graft_ann('zvec_mig', 'e', $queryLit, 5, 16)")
      .collect().map(_.toSeq).toSeq === expect)
    // garbage content in an EXISTING _meta throws — silently reading
    // it as absent would stop DML maintenance while probes fail as
    // "no index" (the r18 behavior this tag exists to prevent)
    rewrite { out => out.writeInt(12345); out.writeInt(999) }
    intercept[IllegalStateException](
      GraftVectorIndex.readMeta(spark, path, "e"))
    rewrite { out => // restore a valid legacy meta, then clean up
      out.writeObject(m0.vecCol); out.writeInt(m0.nlist)
      out.writeLong(m0.buildVersion)
    }
    assert(GraftVectorIndex.readMeta(spark, path, "e").contains(m0Legacy))
    spark.sql("DROP TABLE IF EXISTS zvec_mig")
  }

  test("hash-ordered training sample: key-clustered ingest (key order " +
      "= cluster order) still trains balanced lists") {
    val path = freshPath("skw")
    spark.sql("DROP TABLE IF EXISTS zvec_skw")
    // 2000 rows in 4 well-separated clusters with keys ordered BY
    // cluster — the r18 first-512-keys sample saw ONLY cluster 0 and
    // trained every centroid there, collapsing the other 1500 rows
    // onto a handful of lists
    def cvec(k: Long): Array[Double] = {
      val c = ((k - 1) / 500).toInt
      Array.tabulate(8)(j =>
        (if (j == c * 2) 10.0 else 0.0) + 0.1 * math.sin(k * 0.7 + j))
    }
    (1L to 2000L).map(k => (k, cvec(k))).toDF("id", "emb")
      .createOrReplaceTempView("zvec_skwsrc")
    spark.sql(s"""CREATE TABLE zvec_skw USING graft
      |OPTIONS (key 'id') LOCATION '$path'
      |AS SELECT * FROM zvec_skwsrc""".stripMargin)
    spark.sql("CREATE INDEX e ON zvec_skw USING IVF (emb)")
    val sizes = spark.read.parquet(s"$path/_tivf_e/lists")
      .groupBy("__list").count().collect().map(_.getLong(1))
    assert(sizes.max.toDouble / 2000 < 0.4,
      s"largest list holds ${sizes.max} of 2000 rows — skewed training")
    assert(sizes.length >= 8, s"only ${sizes.length} non-empty lists")
    // and the full probe stays exact over this layout
    val brute = Similarity.bruteTopK(
      spark.sql("SELECT id, emb FROM zvec_skw"), "id", "emb", query, 10)
    assert(spark.sql(s"SELECT * FROM graft_ann('zvec_skw', 'e', " +
      s"$queryLit, 10, 16)").collect().map(_.toSeq).toSeq ===
      brute.collect().map(_.toSeq).toSeq)
    spark.sql("DROP TABLE IF EXISTS zvec_skw")
  }

  test("OPTIMIZE t REINDEX e retrains under drift: recall at fixed " +
      "nprobe degrades after a shifted ingest, REINDEX restores it, " +
      "and a reopened session probes the retrained layout") {
    val path = freshPath("drf")
    spark.sql("DROP TABLE IF EXISTS zvec_drf")
    // phase 1: a radius-10 cloud — CREATE trains 16 centroids over it
    // and they FREEZE
    def aVec(k: Long): Array[Double] =
      Array.tabulate(8)(j => 10.0 * math.sin(k * 0.37 + j * 1.13))
    (1L to 300L).map(k => (k, aVec(k))).toDF("id", "emb")
      .createOrReplaceTempView("zvec_drfsrc")
    spark.sql(s"""CREATE TABLE zvec_drf USING graft
      |OPTIONS (key 'id') LOCATION '$path'
      |AS SELECT * FROM zvec_drfsrc""".stripMargin)
    spark.sql("CREATE INDEX e ON zvec_drf USING IVF (emb)")
    // phase 2 ingest: a dense cloud centered on the MIDPOINT of two
    // frozen centroids, wide enough to straddle several Voronoi cells
    // — the drifted mass sits where the frozen quantizer has a
    // boundary, so true neighbors split across lists and a 1-list
    // probe structurally misses a chunk of them
    val cents = spark.read.parquet(s"$path/_tivf_e/centroids")
      .orderBy("list").collect()
      .map(r => r.getSeq[Double](r.fieldIndex("centroid")).toArray)
    val (ca, cb) = (cents(0), cents(1))
    val mid = ca.zip(cb).map { case (x, y) => (x + y) / 2 }
    val span = math.sqrt(ca.zip(cb).map { case (x, y) =>
      (x - y) * (x - y) }.sum)
    def bVec(k: Long): Array[Double] =
      Array.tabulate(8)(j => mid(j) + span * math.sin(k * 0.91 + j * 0.57))
    (1000L to 1999L).map(k => (k, bVec(k))).toDF("id", "emb")
      .createOrReplaceTempView("zvec_drfins")
    spark.sql("INSERT INTO zvec_drf SELECT * FROM zvec_drfins")
    val q = mid
    val qLit = q.map(_.toString).mkString("array(", ", ", ")")
    def recall(s: org.apache.spark.sql.SparkSession, np: Int): Double = {
      val got = s.sql(
        s"SELECT * FROM graft_ann('zvec_drf', 'e', $qLit, 20, $np)")
        .collect().map(_.getLong(0)).toSet
      val want = Similarity.bruteTopK(
        s.sql("SELECT id, emb FROM zvec_drf"), "id", "emb", q, 20)
        .collect().map(_.getLong(0)).toSet
      got.intersect(want).size / 20.0
    }
    val before = recall(spark, 1)
    // DRIFT OBSERVABILITY (the "when is REINDEX worth O(corpus)"
    // signal): the shifted ingest piles its mass into the few lists
    // near the frozen boundary, so graft_index_stats' live list-size
    // skew must READ HIGH before the retrain — a user watches this
    // TVF instead of benchmarking recall themselves
    def statsRow = spark.sql(
      "SELECT * FROM graft_index_stats('zvec_drf')").collect().head
    val sBefore = statsRow
    assert(sBefore.getString(0) === "e" && sBefore.getString(1) === "ivf")
    assert(sBefore.getInt(3) === 16)
    assert(sBefore.getLong(8) === 1300L, // 300 base + 1000 drifted, live
      s"live_entries=${sBefore.getLong(8)}")
    assert(sBefore.getLong(6) > 0, "commits_since_build should be > 0")
    val skewBefore = sBefore.getDouble(12)
    val r = spark.sql("OPTIMIZE zvec_drf REINDEX e").collect().head
    assert(r.getString(1) === "e" && r.getString(2) === "ivf")
    val after = recall(spark, 1)
    assert(before < 0.9, s"drift did not degrade recall (before=$before)")
    assert(after > before,
      s"REINDEX did not improve drift recall ($before -> $after)")
    // ... and the retrain rebalances the lists: skew falls, the
    // build-version age resets
    val sAfter = statsRow
    val skewAfter = sAfter.getDouble(12)
    assert(skewAfter < skewBefore,
      s"REINDEX did not reduce list skew ($skewBefore -> $skewAfter)")
    assert(sAfter.getLong(6) === 0L,
      "commits_since_build should reset after REINDEX")
    assert(sAfter.getLong(7) === sAfter.getLong(8),
      "retrained lists should hold exactly the live entries")
    // full probe stays exact over the retrained layout
    assert(recall(spark, 16) === 1.0)
    // a REOPENED session probes the retrained layout cold
    assert(recall(spark.newSession(), 1) === after)
    spark.sql("DROP TABLE IF EXISTS zvec_drf")
  }

  test("graft_ann_at probes a historical version exactly: pre-DML " +
      "results reproduce, live results differ, vacuumed versions " +
      "refuse loudly") {
    val path = freshPath("tt")
    spark.sql("DROP TABLE IF EXISTS zvec_tt")
    (1L to 300L).map(k => (k, vec(k))).toDF("id", "emb")
      .createOrReplaceTempView("zvec_ttsrc")
    spark.sql(s"""CREATE TABLE zvec_tt USING graft
      |OPTIONS (key 'id') LOCATION '$path'
      |AS SELECT * FROM zvec_ttsrc""".stripMargin)
    spark.sql("CREATE INDEX e ON zvec_tt USING IVF (emb)")
    val v0 = GraftTables.currentVersion(spark, path)
    val expectAt = Similarity.bruteTopK(
      spark.sql("SELECT id, emb FROM zvec_tt"), "id", "emb", query, 10)
      .collect().map(_.toSeq).toSeq
    // DML moves the live top-k: the historical probe must NOT see it
    val top = expectAt.head.head.asInstanceOf[Long]
    spark.sql(s"DELETE FROM zvec_tt WHERE id = $top")
    spark.sql(s"INSERT INTO zvec_tt VALUES (9001, $queryLit)")
    def annAt(v: Long) = spark.sql(
      s"SELECT * FROM graft_ann_at('zvec_tt', 'e', $v, $queryLit, 10)")
    assert(annAt(v0).collect().map(_.toSeq).toSeq === expectAt,
      "historical probe does not reproduce the pre-DML result")
    val live = spark.sql(
      s"SELECT * FROM graft_ann('zvec_tt', 'e', $queryLit, 10, 16)")
      .collect().map(_.toSeq).toSeq
    assert(live !== expectAt)
    assert(annAt(GraftTables.currentVersion(spark, path))
      .collect().map(_.toSeq).toSeq === live,
      "probe at the current version must equal the live full probe")
    // an unknown index refuses with the usual no-index error
    val e1 = intercept[Exception](spark.sql(
      s"SELECT * FROM graft_ann_at('zvec_tt', 'nope', $v0, $queryLit, 10)")
      .collect())
    assert(e1.getMessage.contains("no IVF index"), e1.getMessage)
    // a vacuumed-away version refuses loudly, never serves live data
    spark.sql("VACUUM zvec_tt RETAIN 1 VERSIONS")
    intercept[Exception](annAt(v0).collect())
    spark.sql("DROP TABLE IF EXISTS zvec_tt")
  }

  test("a churned table's batch probe stays bounded to the probed " +
      "lists: static partition prune BELOW the dedup window") {
    val path = freshPath("bnd")
    spark.sql("DROP TABLE IF EXISTS zvec_bnd")
    (1L to 300L).map(k => (k, vec(k))).toDF("id", "emb")
      .createOrReplaceTempView("zvec_bndsrc")
    spark.sql(s"""CREATE TABLE zvec_bnd USING graft
      |OPTIONS (key 'id') LOCATION '$path'
      |AS SELECT * FROM zvec_bndsrc""".stripMargin)
    spark.sql("CREATE INDEX e ON zvec_bnd USING IVF (emb)")
    // one stray upsert: r18's batch path then windowed over the WHOLE
    // lists layout before its join, defeating partition pruning
    spark.sql(s"INSERT INTO zvec_bnd VALUES (9001, $queryLit)")
    val queries = Seq(7L, 9L).map(q => (q, vec(q))).toDF("qid", "qv")
    val (_, h) = GraftTables.current(spark, path)
    val df = GraftVectorIndex.probeBatch(spark, path, "e",
      h.toDF(spark), h.keyCols, queries, "qid", "qv", k = 5, nprobe = 2)
    val rows = df.collect()
    assert(rows.groupBy(_.getLong(0)).forall(_._2.length == 5))
    // the scan is bounded by the batch's distinct probed ids, churn
    // or not — at most |Q|·nprobe of the 16 lists
    assert(GraftVectorIndex.lastBatchProbedLists > 0 &&
      GraftVectorIndex.lastBatchProbedLists <= 4,
      s"probed ${GraftVectorIndex.lastBatchProbedLists} lists")
    // ... and it is a STATIC PartitionFilters entry on the lists scan,
    // visible in the executed plan (not just runtime DPP)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("__list"),
      "lists scan lost its static partition filter")
    spark.sql("DROP TABLE IF EXISTS zvec_bnd")
  }
}
