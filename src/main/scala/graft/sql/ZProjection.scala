package graft.sql

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{col, lit, shiftleft, shiftright, when}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan,
  GreaterThanOrEqual, LessThan, LessThanOrEqual}

/**
 * Z-ORDER SORT PROJECTION — `OPTIMIZE t ZORDER BY (x, y, ...)` on
 * VALUE columns (C-Store/Vertica's sort projection; the effect of
 * Delta's ZORDER, at Delta's arity: any 2..8 columns). A keyed store
 * CANNOT re-cluster its primary by non-key columns: partition
 * assignment must stay a pure key function or point routing and
 * one-sided COW shuffles break. So the value-column form materializes
 * a READ PROJECTION instead: the same rows re-written as parquet
 * directory-partitioned by `zb` — the Morton interleave of every
 * column's EQUAL-DEPTH bucket rank ([[bitsFor]] bits per dimension
 * from approx-quantiles; 256-512 z cells at any arity). A full-lane
 * scan whose pushed filters box ANY subset of the dimensions reads
 * only the `zb=` directories whose cell intersects the box (Catalyst
 * partition pruning does the file skipping, parquet row-group stats
 * skip inside them); point lanes, joins, and DML keep the key-routed
 * primary.
 *
 * Rank-space z-ordering (buckets from quantiles, not raw bit
 * interleave of values) is what Delta does too: it makes the cells
 * EQUAL-POPULATION, so skew in either dimension cannot collapse the
 * curve into a handful of giant cells.
 *
 * The projection is valid for EXACTLY the table version it was built
 * at: DML produces new handles without it (scans fall back to the
 * primary — correct, just unpruned) and the next `OPTIMIZE ... ZORDER
 * BY` rebuilds it. NULLs in either dimension sit in that dimension's
 * bucket 0: a query constraining the OTHER dimension still reads
 * them; a comparison on the null's own dimension can never match, so
 * excluding them when that dimension's bucket range starts above 0 is
 * exact.
 */
private[sql] object ZProjection {

  /** Buckets per dimension for the classic 2-dim layout (kept for the
    * gauges/specs that reason about the 256-cell case). */
  val BucketsPerDim = 16

  val MaxDims = 8

  /** Morton bits per dimension by arity — chosen so the total cell
    * count stays in the 64..512 range: enough cells that a selective
    * box prunes hard, few enough that partition discovery stays O(1)
    * metadata work. 2 dims -> 16 buckets each (256 cells, the classic
    * layout); 3 -> 8 (512); 4 -> 4 (256); 5..8 -> 2 (32..256). */
  def bitsFor(n: Int): Int = n match {
    case 2 => 4
    case 3 => 3
    case 4 => 2
    case d if d >= 5 && d <= MaxDims => 1
    case d => throw new IllegalArgumentException(
      s"a z sort projection takes 2..$MaxDims value columns (got $d)")
  }

  /** The projection's partition-column name — reserved (double
    * underscore) so it can never collide with and silently overwrite
    * a user table column; the write path requires it absent anyway. */
  val ZbCol = "__graft_zb"

  /** One committed projection: its parquet dir and, per dimension,
    * (column name, equal-depth bucket edges — at most buckets - 1
    * each; fewer when the column has few distinct quantiles).
    * `overlay` is the STALE-projection delta bridge: when the
    * projection was built at an earlier version than the serving
    * snapshot, the thunk lazily builds the last-op-per-key frame of
    * the versions in between (table columns + `__del`); the scan then
    * reads (projection ANTI-JOIN touched keys) UNION (surviving
    * overlay rows) — exact, with the anti side still zb-pruned and
    * the overlay delta-sized. None = the projection reflects the
    * snapshot exactly. */
  final case class ZProjInfo(dir: String, dims: Seq[(String, Array[Double])],
      pv: Long = -1L,
      overlay: Option[() => Option[org.apache.spark.sql.DataFrame]] = None) {
    def bits: Int = bitsFor(dims.size)
    def cells: Int = 1 << (bits * dims.size)
    // the parquet source memoizes per serving session — see
    // [[ZProjection.baseFor]]; instance-level memoization was lost on
    // every post-DML re-attach (attach copies this info), re-paying
    // the 256-dir discovery job per statement
    private[sql] def base(sp: org.apache.spark.sql.SparkSession,
        dataSchema: org.apache.spark.sql.types.StructType)
        : org.apache.spark.sql.DataFrame = baseFor(sp, dir, dataSchema, pv)
  }

  /** Shared parquet source per projection DIR: partition discovery
    * (256 zb dirs → one distributed listing job) happens ONCE per
    * committed projection per session, not per boxed query and not
    * per DML re-attach. The read schema is EXPLICIT (the table schema
    * being served, plus the int cell column) — schema inference over
    * a 256/512-file source launched a one-task-per-file footer job on
    * every cold attach. Files always carry exactly the table columns
    * (the writer selects them), so the explicit schema is exact.
    * [[invalidateBase]] drops the entry whenever a rebuild promotes
    * new files into the same dir (stale listings would pin deleted
    * paths); a session swap re-reads too. */
  // entries carry the projection BUILD VERSION they were listed at: a
  // rival process rebuilding the projection (delete+promote into the
  // same dir) bumps pv, so this session's next attach MISSES the memo
  // and re-lists instead of serving a listing that pins deleted files
  // (invalidateBase only ever runs in the rebuilding JVM)
  private val baseMemo = new scala.collection.concurrent.TrieMap[
    String, (Long, org.apache.spark.sql.DataFrame)]()

  // the memo key NORMALIZES through Path: the same dir arrives as
  // file:/tmp/x (catalog URI), file:///tmp/x (DML-time location) and
  // /tmp/x depending on the entry point, and a spelling miss re-pays
  // the 256-dir listing job per statement (the r19 memo-key trap)
  private def baseKey(dir: String): String =
    new org.apache.hadoop.fs.Path(dir).toString

  private[sql] def invalidateBase(dir: String): Unit = {
    baseMemo.remove(baseKey(dir))
    ()
  }

  private[sql] def baseFor(sp: org.apache.spark.sql.SparkSession,
      dir: String, dataSchema: org.apache.spark.sql.types.StructType,
      pv: Long = -1L): org.apache.spark.sql.DataFrame = {
    val readSchema = org.apache.spark.sql.types.StructType(
      dataSchema.fields.map(_.copy(nullable = true)) :+
        org.apache.spark.sql.types.StructField(ZbCol,
          org.apache.spark.sql.types.IntegerType, nullable = true))
    baseMemo.get(baseKey(dir)) match {
      case Some((memoPv, df)) if memoPv == pv && (df.sparkSession eq sp) &&
          df.schema.fieldNames.sameElements(readSchema.fieldNames) => df
      case _ =>
        val df = sp.read.schema(readSchema).parquet(dir)
        baseMemo.put(baseKey(dir), (pv, df))
        df
    }
  }

  /** Row-side bucket rank: #{edges e : v > e}, NULL -> 0. */
  def bucketOf(v: Double, bounds: Array[Double]): Int = {
    var b = 0
    var i = 0
    while (i < bounds.length) {
      if (v > bounds(i)) b += 1
      i += 1
    }
    b
  }

  /** The same rank as a codegen-friendly Column (a chain of at most
    * 15 double comparisons — identical semantics to [[bucketOf]]). */
  def bucketCol(c: Column, bounds: Array[Double]): Column =
    bounds.foldLeft(lit(0))((acc, e) =>
      acc + when(c.isNotNull && c.cast("double") > lit(e), 1).otherwise(0))

  /** N-way Morton interleave of `bits`-wide bucket ranks: bit `i` of
    * dimension `j` lands at position `i*n + (n-1-j)` — dimension 0
    * takes the most significant slot of each bit group, so for n = 2,
    * bits = 4 this is exactly the classic interleave4(a, b) layout. */
  def interleaveN(ranks: Seq[Int], bits: Int): Int = {
    val n = ranks.length
    var z = 0
    var i = 0
    while (i < bits) {
      var j = 0
      while (j < n) {
        z |= ((ranks(j) >> i) & 1) << (i * n + (n - 1 - j))
        j += 1
      }
      i += 1
    }
    z
  }

  /** 4-bit 2-dim Morton interleave (a in the odd bit positions). */
  def interleave4(a: Int, b: Int): Int = interleaveN(Seq(a, b), 4)

  /** The projection's partition column: zb = [[interleaveN]] of every
    * dimension's bucket rank, as a Column. */
  def zbCol(dims: Seq[(Column, Array[Double])]): Column = {
    val n = dims.size
    val bits = bitsFor(n)
    val ranked = dims.map { case (c, bounds) => bucketCol(c, bounds) }
    (for (i <- 0 until bits; j <- 0 until n) yield
      shiftleft(shiftright(ranked(j), i).bitwiseAND(lit(1)),
        i * n + (n - 1 - j)))
      .reduce(_ + _)
  }

  /** The `zb` values whose cell intersects the filters' box — None
    * when no pushed comparison constrains ANY projected column (the
    * projection buys nothing; the caller scans the primary);
    * Some(Nil) when the box is provably empty. Only numeric literals
    * participate (a non-numeric literal leaves its dimension
    * unconstrained — sound, never wrong). */
  def zbSetFor(filters: Array[Filter], info: ZProjInfo): Option[Seq[Int]] = {
    def num(v: Any): Option[Double] = v match {
      case n: java.lang.Number => Some(n.doubleValue())
      case _ => None
    }
    def rangeFor(name: String,
        bounds: Array[Double]): (Int, Int, Boolean) = {
      var lo = 0
      var hi = bounds.length // max bucket rank
      var constrained = false
      filters.foreach {
        case EqualTo(c, v) if c == name => num(v).foreach { d =>
          val b = bucketOf(d, bounds)
          lo = math.max(lo, b); hi = math.min(hi, b); constrained = true
        }
        case GreaterThan(c, v) if c == name => num(v).foreach { d =>
          lo = math.max(lo, bucketOf(d, bounds)); constrained = true
        }
        case GreaterThanOrEqual(c, v) if c == name => num(v).foreach { d =>
          lo = math.max(lo, bucketOf(d, bounds)); constrained = true
        }
        case LessThan(c, v) if c == name => num(v).foreach { d =>
          hi = math.min(hi, bucketOf(d, bounds)); constrained = true
        }
        case LessThanOrEqual(c, v) if c == name => num(v).foreach { d =>
          hi = math.min(hi, bucketOf(d, bounds)); constrained = true
        }
        case _ => ()
      }
      (lo, hi, constrained)
    }
    val ranges = info.dims.map { case (name, bounds) =>
      rangeFor(name, bounds) }
    if (!ranges.exists(_._3)) None
    else if (ranges.exists(r => r._1 > r._2)) Some(Nil)
    else {
      val bits = info.bits
      def cross(rs: List[(Int, Int, Boolean)]): Seq[List[Int]] = rs match {
        case Nil => Seq(Nil)
        case (lo, hi, _) :: tail =>
          for (v <- lo to hi; rest <- cross(tail)) yield v :: rest
      }
      Some(cross(ranges.toList).map(interleaveN(_, bits)).distinct)
    }
  }

  /** The pushed comparisons on the projected columns as one Column
    * (row-group skipping inside kept partitions); None when none
    * translate. Spark re-applies every filter above the scan, so this
    * is pure acceleration. */
  def residualFilter(filters: Array[Filter], info: ZProjInfo): Option[Column] = {
    val own = info.dims.map(_._1).toSet
    val cs = filters.toSeq.collect {
      case EqualTo(c, v) if own(c) => col(c) === lit(v)
      case GreaterThan(c, v) if own(c) => col(c) > lit(v)
      case GreaterThanOrEqual(c, v) if own(c) => col(c) >= lit(v)
      case LessThan(c, v) if own(c) => col(c) < lit(v)
      case LessThanOrEqual(c, v) if own(c) => col(c) <= lit(v)
    }
    cs.reduceOption(_ && _)
  }
}
