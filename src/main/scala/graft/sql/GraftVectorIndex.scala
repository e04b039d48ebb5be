package graft.sql

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * DURABLE VECTOR INDEX — `CREATE INDEX e ON t USING IVF (embedding)`
 * (raw vectors in the lists) or `USING IVFPQ (embedding)` (residual
 * product-quantization codes — Jégou et al. TPAMI 2011) on a graft
 * catalog table: the persistent IVF layout
 * ([[graft.pipeline.Similarity.ivfBuild]]'s shape) promoted into the
 * catalog as a first-class index type beside HASH/BTREE/ZONEMAP.
 *
 * Layout, beside the table's delta log at `<table>/_tivf_<name>/`:
 *  - `centroids/` — the coarse quantizer (nlist rows; trained ONCE at
 *    CREATE on a deterministic sample, exactly like the library build;
 *    ivfpq trains in normalized space)
 *  - `lists/` — parquet PARTITIONED BY `__list`: (key columns, `__v`
 *    vector, `__ver` commit version) for ivf; (key columns, `__codes`
 *    m small ints, `__ver`) for ivfpq — NO raw vectors, ~30× fewer
 *    bytes per probed row at d=64
 *  - `books/` — ivfpq only: the m per-subspace residual codebooks
 *    (`OPTIONS (nlist 'N', m 'M', ks 'K')` at CREATE)
 *  - `_meta` — (kind, vector column, nlist, build version, m, ks)
 *
 * Maintenance is DELTA-COST and retrain-free: every DML commit's
 * upserts assign against the SAVED centroids and APPEND into the list
 * partitions (the existing entries are never read or rewritten — the
 * `ann_ivf_appended` growth path, now automatic). Deletes append
 * nothing: liveness is resolved at probe time.
 *
 * Probe (the `graft_ann` TVF): read ONLY the query's `nprobe` nearest
 * list partitions (parquet partition pruning), take each key's
 * NEWEST entry (`__ver` max — an updated vector supersedes its old
 * assignment), drop keys no longer in the table (broadcast left-semi
 * against the current snapshot — handles DELETE and TRUNCATE), then
 * score. ivf scores survivors by exact cosine directly; ivfpq scores
 * them by ADC (per-list constant + m LUT lookups, a codegen'd Column
 * fold over the codes) and re-ranks the 16·k shortlist by exact
 * cosine against the LIVE primary via a broadcast-sized key join.
 * With `nprobe = nlist` the ivf result is EXACT brute-force top-k
 * over the live table (the oracle lane's configuration) and the
 * ivfpq result is deterministic ADC-shortlist + exact re-rank (its
 * oracle replays the codebooks and scores bit-for-bit); smaller
 * `nprobe` trades recall for reading `nprobe/nlist` of the corpus,
 * and an update that moved a key's vector across lists is visible
 * exactly when its new list is probed.
 *
 * Scale shape at 100 TB: the corpus is assigned once; every query
 * reads `nprobe` directories; every commit appends its delta. The one
 * O(corpus) op is CREATE itself (unavoidable — it IS the assignment).
 */
private[sql] object GraftVectorIndex {

  def dir(path: String, name: String): String = s"$path/_tivf_$name"

  private def fsOf(sp: SparkSession, path: String) = {
    val p = new Path(path)
    (p.getFileSystem(sp.sparkContext.hadoopConfiguration), p)
  }

  /** `kind` ∈ ivf (raw vectors in the lists — exact at nprobe=nlist) |
    * ivfpq (m×log2(ks)-bit PQ codes in the lists — ADC shortlist,
    * exact re-rank against the LIVE primary). `m`/`ks` are 0 for ivf. */
  final case class IvfMeta(kind: String, vecCol: String, nlist: Int,
      buildVersion: Long, m: Int, ks: Int)

  private def writeMeta(sp: SparkSession, idxDir: String,
      m: IvfMeta): Unit = {
    val (fs, _) = fsOf(sp, idxDir)
    graft.MarkerFile.writeAtomic(fs, new Path(idxDir, "_meta")) { raw =>
      val out = new java.io.ObjectOutputStream(raw)
      out.writeObject(m.kind); out.writeObject(m.vecCol)
      out.writeInt(m.nlist); out.writeLong(m.buildVersion)
      out.writeInt(m.m); out.writeInt(m.ks)
      out.flush()
    }
  }

  private def tmpDir(path: String, name: String): String =
    s"$path/_tivftmp_$name"

  /** Crash recovery for [[compactIndex]]'s swap, mirroring the table's
    * own [[GraftTables]] rebase recovery: a headless index dir beside
    * a COMPLETE staged sibling promotes the sibling; a stale sibling
    * beside a healthy index is swept. Cheap no-op in the common case
    * (one exists check on a dir that is normally absent). */
  private def recoverIfNeeded(sp: SparkSession, path: String,
      name: String): Unit = {
    val (fs, _) = fsOf(sp, path)
    val tmp = new Path(tmpDir(path, name))
    try {
      if (fs.exists(tmp)) {
        val idx = new Path(dir(path, name))
        if (fs.exists(new Path(idx, "_meta"))) fs.delete(tmp, true)
        else if (fs.exists(new Path(tmp, "_meta"))) {
          fs.delete(idx, true)
          if (fs.rename(tmp, idx)) invalidate(idx.toString)
        }
        ()
      }
    } catch { case scala.util.control.NonFatal(_) => () }
  }

  def readMeta(sp: SparkSession, path: String,
      name: String): Option[IvfMeta] = {
    recoverIfNeeded(sp, path, name)
    val (fs, _) = fsOf(sp, path)
    val f = new Path(dir(path, name), "_meta")
    try {
      if (!fs.exists(f)) None
      else {
        val in = new java.io.ObjectInputStream(fs.open(f))
        try Some(IvfMeta(in.readObject().asInstanceOf[String],
          in.readObject().asInstanceOf[String],
          in.readInt(), in.readLong(), in.readInt(), in.readInt()))
        finally in.close()
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  // repeated-probe (dashboard) serving cost: centroids are immutable
  // per build (keyed by build version — a rebuild swaps them) and the
  // lists source only gains files per COMMIT (keyed by table version),
  // so neither pays parquet re-listing / re-collection per query —
  // the same memoization the z projection's base source uses
  private val centroidMemo = new scala.collection.concurrent.TrieMap[
    String, (Long, Array[Array[Double]])]()
  private val booksMemo = new scala.collection.concurrent.TrieMap[
    String, (Long, Array[Array[Array[Double]]])]()
  private val listsMemo = new scala.collection.concurrent.TrieMap[
    String, (Long, DataFrame)]()

  private[sql] def invalidate(idxDir: String): Unit = {
    centroidMemo.remove(idxDir)
    booksMemo.remove(idxDir)
    listsMemo.remove(idxDir)
    ()
  }

  private def centroidsOf(sp: SparkSession, idxDir: String,
      buildVersion: Long): Array[Array[Double]] =
    centroidMemo.get(idxDir) match {
      case Some((v, c)) if v == buildVersion => c
      case _ =>
        val c = sp.read.parquet(s"$idxDir/centroids")
          .orderBy(col("list")).collect()
          .map(r => r.getSeq[Double](r.fieldIndex("centroid")).toArray)
        centroidMemo.put(idxDir, (buildVersion, c))
        c
    }

  private def booksOf(sp: SparkSession, idxDir: String,
      buildVersion: Long): Array[Array[Array[Double]]] =
    booksMemo.get(idxDir) match {
      case Some((v, b)) if v == buildVersion => b
      case _ =>
        val rows = sp.read.parquet(s"$idxDir/books")
          .orderBy(col("mm"), col("cid")).collect()
        val b = rows.groupBy(r => r.getInt(r.fieldIndex("mm")))
          .toArray.sortBy(_._1).map(_._2
            .map(r => r.getSeq[Double](r.fieldIndex("cent")).toArray))
        booksMemo.put(idxDir, (buildVersion, b))
        b
    }

  private def listsOf(sp: SparkSession, idxDir: String,
      tableVersion: Long): DataFrame =
    listsMemo.get(idxDir) match {
      case Some((v, df)) if v == tableVersion && (df.sparkSession eq sp) => df
      case _ =>
        val df = sp.read.parquet(s"$idxDir/lists")
        listsMemo.put(idxDir, (tableVersion, df))
        df
    }

  private def assigned(df: DataFrame, keyCols: Seq[String], vecCol: String,
      centroids: Array[Array[Double]], v: Long): DataFrame =
    df.select(keyCols.map(col) :+ col(vecCol).as("__v"): _*)
      .where(col("__v").isNotNull)
      .withColumn("__ver", lit(v))
      .withColumn("__list",
        graft.functions.NearestCentroid.nearestCentroid(col("__v"), centroids))

  /** Unit-normalized (keys..., __vn) — the multi-key twin of the
    * library's normalization stage, same arithmetic order so codes
    * replay bit-for-bit in the SQL oracle. */
  private def normalized(df: DataFrame, keyCols: Seq[String],
      vecCol: String): DataFrame =
    df.select(keyCols.map(col) :+
        transform(col(vecCol), x => x.cast("double")).as("__raw"): _*)
      .where(col("__raw").isNotNull)
      .withColumn("__n", sqrt(graft.pipeline.Dedup.dotCols(col("__raw"), col("__raw"))))
      .select(keyCols.map(col) :+
        transform(col("__raw"), x => x / col("__n")).as("__vn"): _*)

  /** IVFPQ row encoding: coarse list + residual PQ codes (Jégou et al.
    * §IV — quantize vn − c_list), exactly [[graft.pipeline.Similarity
    * .ivfPqTopK]]'s staged pipeline with the codebooks loaded from the
    * index instead of trained inline. Stores NO raw vectors. */
  private def encoded(vn: DataFrame, keyCols: Seq[String],
      coarse: Array[Array[Double]], books: Array[Array[Array[Double]]],
      m: Int, sub: Int, v: Long): DataFrame = {
    val coarseLit = typedLit(coarse.map(_.toSeq).toSeq)
    vn.withColumn("__list",
        graft.functions.NearestCentroid.nearestCentroid(col("__vn"), coarse))
      .withColumn("__rv", zip_with(col("__vn"),
        element_at(coarseLit, col("__list").cast("int")), (a, b) => a - b))
      .withColumn("__codes",
        graft.pipeline.Similarity.pqCodesCol(books, m, sub, "__rv"))
      .withColumn("__ver", lit(v))
      .select(keyCols.map(col) :+ col("__codes") :+ col("__ver") :+
        col("__list"): _*)
  }

  /** Build at CREATE INDEX: train the quantizer on a deterministic
    * sample of the current content, assign every row, write the
    * list-partitioned layout. One corpus pass. */
  def build(sp: SparkSession, path: String, name: String,
      df: DataFrame, keyCols: Seq[String], vecCol: String, nlist: Int,
      v: Long): Unit = {
    import sp.implicits._
    val idxDir = dir(path, name)
    val (fs, _) = fsOf(sp, idxDir)
    fs.delete(new Path(idxDir), true)
    val sample = df.select(keyCols.map(col) :+ col(vecCol): _*)
      .where(col(vecCol).isNotNull)
      .orderBy(keyCols.map(col): _*).limit(512)
      .select(transform(col(vecCol), x => x.cast("double")))
      .collect().map(_.getSeq[Double](0).toArray)
    require(sample.nonEmpty,
      s"CREATE INDEX USING IVF: no non-null '$vecCol' vectors to train on")
    val centroids = graft.pipeline.Similarity.kmeans(sample, nlist, 5)
    assigned(df, keyCols, vecCol, centroids, v)
      .write.mode("overwrite").partitionBy("__list")
      .parquet(s"$idxDir/lists")
    centroids.zipWithIndex
      .map { case (c, i) => ((i + 1).toLong, c.toSeq) }.toSeq
      .toDF("list", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$idxDir/centroids")
    writeMeta(sp, idxDir, IvfMeta("ivf", vecCol, nlist, v, 0, 0))
    invalidate(idxDir) // a re-CREATE swaps the layout under the memos
  }

  /** Build at `CREATE INDEX ... USING IVFPQ`: train the coarse
    * quantizer AND the per-subspace residual codebooks on one
    * deterministic normalized sample (first 512 keys), then write the
    * list-partitioned CODES — m small ints per row instead of the
    * d-float vector, the memory-bandwidth scale path (a probe reads
    * `nprobe/nlist` of ~9 bytes/row; raw vectors are touched only for
    * the re-rank shortlist, fetched from the LIVE primary). */
  def buildPq(sp: SparkSession, path: String, name: String,
      df: DataFrame, keyCols: Seq[String], vecCol: String, nlist: Int,
      m: Int, ks: Int, v: Long): Unit = {
    import sp.implicits._
    val idxDir = dir(path, name)
    val (fs, _) = fsOf(sp, idxDir)
    fs.delete(new Path(idxDir), true)
    val vn = normalized(df, keyCols, vecCol)
    val sample = vn.orderBy(keyCols.map(col): _*).limit(512)
      .select(col("__vn")).collect().map(_.getSeq[Double](0).toArray)
    require(sample.length >= math.max(nlist, ks),
      s"CREATE INDEX USING IVFPQ: needs at least ${math.max(nlist, ks)} " +
        s"non-null '$vecCol' vectors to train on, got ${sample.length}")
    val dim = sample.head.length
    require(dim % m == 0, s"IVFPQ: dim $dim must divide into m=$m subspaces")
    val sub = dim / m
    val coarse = graft.pipeline.Similarity.kmeans(sample, nlist, 5)
    // the books learn the sample's RESIDUALS against the trained coarse
    // centroids — within-cell displacement, not absolute position
    val rsample = sample.map { p =>
      val c = coarse(graft.pipeline.Similarity.assignIdx(p, coarse))
      Array.tabulate(dim)(i => p(i) - c(i))
    }
    val books = graft.pipeline.Similarity.pqCodebooks(rsample, m, sub, ks, 3)
    encoded(vn, keyCols, coarse, books, m, sub, v)
      .write.mode("overwrite").partitionBy("__list")
      .parquet(s"$idxDir/lists")
    coarse.zipWithIndex
      .map { case (c, i) => ((i + 1).toLong, c.toSeq) }.toSeq
      .toDF("list", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$idxDir/centroids")
    books.zipWithIndex.flatMap { case (book, mm) =>
      book.zipWithIndex.map { case (c, ci) => (mm, (ci + 1).toLong, c.toSeq) }
    }.toSeq.toDF("mm", "cid", "cent")
      .coalesce(1).write.mode("overwrite").parquet(s"$idxDir/books")
    writeMeta(sp, idxDir, IvfMeta("ivfpq", vecCol, nlist, v, m, ks))
    invalidate(idxDir)
  }

  /** Delta-cost maintenance on commit `v`: assign the statement's
    * upserts against the saved centroids and append into the list
    * partitions. Skips quietly only when the index is gone or a schema
    * evolution removed the vector column from the upsert (the index is
    * then stale by construction; DROP or re-CREATE it) — any other
    * failure propagates so the caller can surface it. */
  def append(sp: SparkSession, path: String, name: String,
      up: DataFrame, keyCols: Seq[String], v: Long): Unit =
    readMeta(sp, path, name).foreach { m =>
      if (up.columns.contains(m.vecCol)) {
        val idxDir = dir(path, name)
        val coarse = centroidsOf(sp, idxDir, m.buildVersion)
        val rows =
          if (m.kind == "ivfpq")
            encoded(normalized(up, keyCols, m.vecCol), keyCols, coarse,
              booksOf(sp, idxDir, m.buildVersion), m.m,
              coarse.head.length / m.m, v)
          else assigned(up, keyCols, m.vecCol, coarse, v)
        rows.write.mode("append").partitionBy("__list")
          .parquet(s"$idxDir/lists")
      }
    }

  /** OPTIMIZE-time index compaction: rewrite the lists to exactly the
    * LIVE newest-entry-per-key content and stamp `buildVersion = v`.
    * Two wins for a churned table: dead entries (superseded versions,
    * deleted keys) stop inflating every probe's scan, and — because
    * the probe's read-mostly fast path keys on `changeFlagsSince
    * (buildVersion)` — probes return to the zero-join path until the
    * next DML. Retrain-free: centroids and codebooks carry verbatim,
    * so assignments never move. Crash-safe the same way the table's
    * own rebase is: the full layout stages in a sibling dir and swaps
    * in one rename; [[recoverIfNeeded]] promotes a complete stage if
    * the swap was interrupted. O(index), riding a verb that is
    * already O(corpus). */
  def compactIndex(sp: SparkSession, path: String, name: String,
      live: DataFrame, keyCols: Seq[String], v: Long): Unit =
    readMeta(sp, path, name).foreach { m =>
      val idxDir = dir(path, name)
      val (fs, _) = fsOf(sp, idxDir)
      val tmp = new Path(tmpDir(path, name))
      fs.delete(tmp, true)
      val w = Window.partitionBy(keyCols.map(col): _*)
        .orderBy(col("__ver").desc)
      sp.read.parquet(s"$idxDir/lists")
        .withColumn("__rn", row_number().over(w))
        .where(col("__rn") === 1).drop("__rn")
        .join(live.select(keyCols.map(col): _*), keyCols, "left_semi")
        .write.partitionBy("__list").parquet(s"$tmp/lists")
      Seq("centroids", "books").foreach { d =>
        val src = new Path(idxDir, d)
        if (fs.exists(src))
          org.apache.hadoop.fs.FileUtil.copy(fs, src, fs,
            new Path(tmp, d), false, sp.sparkContext.hadoopConfiguration)
      }
      writeMeta(sp, tmp.toString, m.copy(buildVersion = v))
      fs.delete(new Path(idxDir), true)
      require(fs.rename(tmp, new Path(idxDir)),
        s"vector-index compaction rename failed for $idxDir")
      invalidate(idxDir)
    }

  /** The `graft_ann` probe — see the object doc for semantics. Returns
    * (key columns..., cos) ordered by cosine desc, keys. `pred` is an
    * optional SQL predicate over the TABLE's columns (filtered vector
    * search): it constrains the candidate pool BEFORE top-k — the k
    * best rows AMONG those matching, not matching rows among the k
    * best — evaluated against the live snapshot (so it may name any
    * column, not just indexed ones) and applied through the same
    * probe-bounded semi-join the liveness check uses. */
  def probe(sp: SparkSession, path: String, name: String,
      live: DataFrame, keyCols: Seq[String], query: Array[Double],
      k: Int, nprobe: Int, pred: Option[String] = None): DataFrame = {
    val m = readMeta(sp, path, name).getOrElse(
      throw new IllegalArgumentException(
        s"no IVF index '$name' at $path — CREATE INDEX ... USING IVF first"))
    val idxDir = dir(path, name)
    val centroids = centroidsOf(sp, idxDir, m.buildVersion)
    // ivfpq centroids live in normalized space — rank lists against
    // the normalized query there (same ranking the build's assignment
    // used); the flat layout keeps the raw-space ranking
    val qRank =
      if (m.kind == "ivfpq") graft.pipeline.Similarity.unitQuery(query)
      else query
    val qd = centroids.map(c => c.zip(qRank).map { case (a, b) =>
      (a - b) * (a - b) }.sum)
    val probeLists = qd.zipWithIndex.sortBy(_._1)
      .take(math.min(nprobe, centroids.length))
      .map { case (_, i) => (i + 1).toLong }
    // the read-mostly fast path: when NO delete/upsert committed since
    // the build, entries are exact — skip the per-key dedup and the
    // liveness join entirely (one O(K log_K n) metadata walk decides)
    val (anyDel, anyUp) = GraftTables.changeFlagsSince(sp, path,
      m.buildVersion)
    val cands = listsOf(sp, idxDir, GraftTables.diskVersion(sp, path))
      .filter(col("__list").isin(probeLists: _*))
    // newest entry per key: an UPDATE's re-appended vector supersedes
    // the stale assignment (within the probed subset)
    val latest =
      if (!anyUp) cands
      else {
        val w = Window.partitionBy(keyCols.map(col): _*)
          .orderBy(col("__ver").desc)
        cands.withColumn("__rn", row_number().over(w))
          .where(col("__rn") === 1)
      }
    // liveness + filter: deleted/truncated keys drop out, and a
    // filtered search's predicate constrains the pool here too. An
    // INNER join on the keys projection, not a left-semi: table keys
    // are unique (it is the primary), so the two are equivalent — but
    // Spark can only broadcast the RIGHT side of a semi join (the
    // corpus keys, exactly the side that grows with the table), while
    // an inner join lets AQE broadcast the probe-bounded candidate
    // side and keep the corpus shuffle-free at scale. For ivfpq this
    // must precede the shortlist or dead/filtered-out rows would crowd
    // real candidates out of the re-rank pool.
    val liveF = pred.map(p => live.where(expr(p))).getOrElse(live)
    val alive =
      if (!anyDel && pred.isEmpty) latest
      else latest.join(liveF.select(keyCols.map(col): _*), keyCols)
    if (m.kind == "ivfpq")
      probePq(sp, idxDir, m, centroids, alive, liveF, keyCols, query, k)
    else alive
      .withColumn("cos",
        graft.pipeline.Similarity.cosineToQuery(col("__v"), query))
      .orderBy(col("cos").desc +: keyCols.map(col): _*)
      .limit(k)
      .select(keyCols.map(col) :+ col("cos"): _*)
  }

  /** BATCH probe of a durable IVF index: the k nearest live rows for
    * EVERY query row in ONE job — the decontamination-at-scale shape,
    * reusing the SAVED assignment instead of retraining per call
    * (contrast [[graft.pipeline.Similarity.ivfTopKJoin]], which
    * trains inline for ad-hoc corpora). Each query ranks the centroid
    * literal and explodes into its `nprobe` list ids; the equi-join on
    * `__list` — a PARTITION column of the lists parquet — lets Spark's
    * dynamic partition pruning skip unprobed list directories at run
    * time, so the index scan stays `(distinct probed lists)/nlist` of
    * the corpus even for query batches. Newest-entry-per-key dedup and
    * the liveness join follow the single-query probe exactly (skipped
    * on read-mostly tables via the same metadata walk). IVF only: the
    * ivfpq ADC table is query-specific, so batch PQ callers loop
    * [[probe]]. Returns (queryId, key columns..., cos). */
  def probeBatch(sp: SparkSession, path: String, name: String,
      live: DataFrame, keyCols: Seq[String], queries: DataFrame,
      queryIdCol: String, vecCol: String, k: Int,
      nprobe: Int): DataFrame = {
    val m = readMeta(sp, path, name).getOrElse(
      throw new IllegalArgumentException(
        s"no IVF index '$name' at $path — CREATE INDEX ... USING IVF first"))
    require(m.kind == "ivf",
      s"probeBatch serves IVF indexes; '$name' is ${m.kind} — its ADC " +
        "table is query-specific, loop the single-query probe instead")
    require(!keyCols.contains(queryIdCol),
      s"query id column '$queryIdCol' collides with a table key column")
    val idxDir = dir(path, name)
    val centroids = centroidsOf(sp, idxDir, m.buildVersion)
    val np = math.min(nprobe, centroids.length)
    // per-query probe lists: rank ||q - c||^2 over the centroid
    // literal (row-constant q·q dropped), keep the nprobe best
    val probeArr = array(centroids.zipWithIndex.map { case (c, i) =>
      val cc = c.map(x => x * x).sum
      struct(
        (lit(cc) - lit(2.0) * graft.pipeline.Dedup.dotCols(
          col("__qv"), typedLit(c.toSeq))).as("d"),
        lit((i + 1).toLong).as("l"))
    }: _*)
    val qv = queries.where(col(vecCol).isNotNull)
      .select(col(queryIdCol).as("__qid"),
        transform(col(vecCol), x => x.cast("double")).as("__qv"))
      .withColumn("__probe", slice(array_sort(probeArr), 1, np))
      .select(col("__qid"), col("__qv"),
        explode(col("__probe").getField("l")).as("__list"))
    val (anyDel, anyUp) = GraftTables.changeFlagsSince(sp, path,
      m.buildVersion)
    val lists = listsOf(sp, idxDir, GraftTables.diskVersion(sp, path))
    val latest =
      if (!anyUp) lists
      else {
        val w = Window.partitionBy(keyCols.map(col): _*)
          .orderBy(col("__ver").desc)
        lists.withColumn("__rn", row_number().over(w))
          .where(col("__rn") === 1).drop("__rn")
      }
    val alive =
      if (!anyDel) latest
      else latest.join(live.select(keyCols.map(col): _*), keyCols)
    val wq = Window.partitionBy(col("__qid"))
      .orderBy(col("cos").desc +: keyCols.map(col): _*)
    qv.join(alive, "__list")
      .withColumn("cos", graft.pipeline.Dedup.dotCols(col("__qv"), col("__v")) /
        (sqrt(graft.pipeline.Dedup.dotCols(col("__qv"), col("__qv"))) *
          sqrt(graft.pipeline.Dedup.dotCols(col("__v"), col("__v")))))
      .withColumn("__rnq", row_number().over(wq))
      .where(col("__rnq") <= k)
      .select(col("__qid").as(queryIdCol) +: keyCols.map(col) :+
        col("cos"): _*)
  }

  /** ADC re-rank pool multiplier (shortlist·k rows re-rank exactly) —
    * [[graft.pipeline.Similarity.ivfPqTopK]]'s default. */
  private val PqShortlist = 16

  /** The ivfpq scoring tail: ADC over the probed (live) codes — the
    * per-list constant qn·c_list plus the m LUT lookups, a codegen'd
    * Column fold over ~9 bytes/row — then the shortlist fetches its
    * exact vectors from the LIVE primary (a broadcast-sized key join;
    * deleted keys already dropped upstream) for the exact-cosine
    * re-rank. Raw vectors are never stored in the index. */
  private def probePq(sp: SparkSession, idxDir: String, m: IvfMeta,
      coarse: Array[Array[Double]], alive: DataFrame, live: DataFrame,
      keyCols: Seq[String], query: Array[Double], k: Int): DataFrame = {
    val qn = graft.pipeline.Similarity.unitQuery(query)
    val books = booksOf(sp, idxDir, m.buildVersion)
    val sub = coarse.head.length / m.m
    val lutLit = typedLit(
      graft.pipeline.Similarity.pqLut(qn, books, m.m, sub, m.ks))
    val qcLit = typedLit(coarse.map(c =>
      c.zip(qn).map { case (a, b) => a * b }.sum).toSeq)
    val ks = m.ks
    val codesSum = aggregate(
      transform(col("__codes"),
        (c, i) => element_at(lutLit, (i * ks + c).cast("int"))),
      lit(0.0d), (acc, x) => acc + x)
    val shortlist = alive
      .withColumn("__adc",
        element_at(qcLit, col("__list").cast("int")) + codesSum)
      .orderBy(col("__adc").desc +: keyCols.map(col): _*)
      .limit(PqShortlist * k)
      .select(keyCols.map(col): _*)
    shortlist
      .join(live.select(keyCols.map(col) :+
        col(m.vecCol).as("__v"): _*), keyCols)
      .withColumn("cos",
        graft.pipeline.Similarity.cosineToQuery(col("__v"), query))
      .orderBy(col("cos").desc +: keyCols.map(col): _*)
      .limit(k)
      .select(keyCols.map(col) :+ col("cos"): _*)
  }

  def drop(sp: SparkSession, path: String, name: String): Unit = {
    val (fs, _) = fsOf(sp, path)
    fs.delete(new Path(dir(path, name)), true)
    invalidate(dir(path, name))
  }
}
