package graft.sql

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * DURABLE VECTOR INDEX — `CREATE INDEX e ON t USING IVF (embedding)`
 * on a graft catalog table: the persistent IVF layout
 * ([[graft.pipeline.Similarity.ivfBuild]]'s shape) promoted into the
 * catalog as a first-class index type beside HASH/BTREE/ZONEMAP.
 *
 * Layout, beside the table's delta log at `<table>/_tivf_<name>/`:
 *  - `centroids/` — the coarse quantizer (nlist rows; trained ONCE at
 *    CREATE on a deterministic sample, exactly like the library build)
 *  - `lists/` — (key columns, `__v` vector, `__ver` commit version,
 *    `__list` assignment) parquet PARTITIONED BY `__list`
 *  - `_meta` — (vector column, nlist, build version)
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
 * exact cosine + top-k over the survivors. With `nprobe = nlist` the
 * result is EXACT brute-force top-k over the live table (the oracle
 * lane's configuration); smaller `nprobe` trades recall for reading
 * `nprobe/nlist` of the corpus, and an update that moved a key's
 * vector across lists is visible exactly when its new list is probed.
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

  final case class IvfMeta(vecCol: String, nlist: Int, buildVersion: Long)

  private def writeMeta(sp: SparkSession, idxDir: String,
      m: IvfMeta): Unit = {
    val (fs, _) = fsOf(sp, idxDir)
    graft.MarkerFile.writeAtomic(fs, new Path(idxDir, "_meta")) { raw =>
      val out = new java.io.ObjectOutputStream(raw)
      out.writeObject(m.vecCol); out.writeInt(m.nlist)
      out.writeLong(m.buildVersion)
      out.flush()
    }
  }

  def readMeta(sp: SparkSession, path: String,
      name: String): Option[IvfMeta] = {
    val (fs, _) = fsOf(sp, path)
    val f = new Path(dir(path, name), "_meta")
    try {
      if (!fs.exists(f)) None
      else {
        val in = new java.io.ObjectInputStream(fs.open(f))
        try Some(IvfMeta(in.readObject().asInstanceOf[String],
          in.readInt(), in.readLong()))
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
  private val listsMemo = new scala.collection.concurrent.TrieMap[
    String, (Long, DataFrame)]()

  private[sql] def invalidate(idxDir: String): Unit = {
    centroidMemo.remove(idxDir)
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
    writeMeta(sp, idxDir, IvfMeta(vecCol, nlist, v))
    invalidate(idxDir) // a re-CREATE swaps the layout under the memos
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
        assigned(up, keyCols, m.vecCol,
          centroidsOf(sp, idxDir, m.buildVersion), v)
          .write.mode("append").partitionBy("__list")
          .parquet(s"$idxDir/lists")
      }
    }

  /** The `graft_ann` probe — see the object doc for semantics. Returns
    * (key columns..., cos) ordered by cosine desc, keys. */
  def probe(sp: SparkSession, path: String, name: String,
      live: DataFrame, keyCols: Seq[String], query: Array[Double],
      k: Int, nprobe: Int): DataFrame = {
    val m = readMeta(sp, path, name).getOrElse(
      throw new IllegalArgumentException(
        s"no IVF index '$name' at $path — CREATE INDEX ... USING IVF first"))
    val idxDir = dir(path, name)
    val centroids = centroidsOf(sp, idxDir, m.buildVersion)
    val qd = centroids.map(c => c.zip(query).map { case (a, b) =>
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
    // liveness: deleted/truncated keys drop out (the candidate side is
    // probe-bounded, so Catalyst broadcasts it into the semi join)
    val alive =
      if (!anyDel) latest
      else latest.join(live.select(keyCols.map(col): _*),
        keyCols, "left_semi")
    alive
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
