package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deterministic sketch operators for corpus-scale statistics — the
 * approximate plumbing a 100 TB pipeline needs where exact answers
 * are unaffordable or unnecessary:
 *
 *  - '''count-min''': a depth×width counter matrix over a hashed key
 *    stream; point-frequency estimates that only ever OVER-estimate.
 *    The matrix is produced by one map-side-combinable aggregation
 *    (the stream is never collected), and is d·w integers regardless
 *    of input size.
 *  - '''KMV distinct''' (k minimum values): per-group distinct-count
 *    estimates from the k smallest hash values of the group — a
 *    bounded per-group state (k longs) where exact `count(distinct)`
 *    needs the full key set per group.
 *  - '''Bloom-filter join pruning''': a compact bitset of the build
 *    side's key hashes, broadcast to filter the probe side BEFORE the
 *    join shuffle — the classic way to join a 100 TB fact stream
 *    against a selective dimension without shuffling non-matching
 *    rows. No false negatives; false-positive rate set by bits/key.
 *
 * Every hash is affine arithmetic mod the Mersenne prime 2^31-1
 * (products stay below 2^62, safe under ANSI overflow checks), so a
 * SQL oracle recomputes identical sketches cross-engine — estimates
 * and all. The reference engine has no sketch surface (its only
 * aggregate is a user reduce, reference IndexedRDD.scala:294-297);
 * these follow Cormode & Muthukrishnan (count-min, J.Algorithms 2005),
 * Bar-Yossef et al. (KMV, RANDOM 2002) and Bloom (CACM 1970).
 */
object Sketches {

  private val P31 = (1L << 31) - 1

  /** Affine row constants (a_j, b_j) for the sketch hash families —
    * fixed public LCG multipliers, graft-visible so oracle builders
    * embed the same literals in SQL. */
  private[graft] val RowConsts: Seq[(Long, Long)] = Seq(
    (1103515245L, 12345L),
    (1566083941L, 1L),
    (69069L, 362437L),
    (1664525L, 1013904223L))

  private def affine(h: Column, a: Long, b: Long): Column =
    pmod(h * lit(a) + lit(b), lit(P31))

  // ------------------------------------------------------------ count-min

  /**
   * Count-min counter matrix of a (already 31-bit-hashed) key column:
   * one row per (row j, bucket) with its collision count. ONE
   * groupBy over the exploded d positions — partial aggregation
   * combines map-side, so the shuffle carries at most d·width rows
   * per map task no matter how many keys stream through.
   */
  def countMinCounters(df: DataFrame, hashCol: String,
      depth: Int = 4, width: Int = 2048): DataFrame = {
    require(depth >= 1 && depth <= RowConsts.size, s"depth must be 1..${RowConsts.size}")
    df.select(posexplode(array(RowConsts.take(depth).map { case (a, b) =>
        pmod(affine(col(hashCol), a, b), lit(width.toLong))
      }: _*)).as(Seq("j", "pos")))
      .groupBy("j", "pos").agg(count(lit(1)).as("c"))
  }

  /** Point-frequency estimate for each distinct key in `keys`
    * (hashCol must carry the same 31-bit hash the counters were built
    * from): est = min_j counters[j][pos_j(h)]. The d counter lookups
    * are a broadcast join against the (tiny) counter matrix. */
  def countMinEstimate(keys: DataFrame, hashCol: String, counters: DataFrame,
      depth: Int = 4, width: Int = 2048): DataFrame = {
    val positions = keys.withColumn("__pos", array(RowConsts.take(depth).map {
        case (a, b) => pmod(affine(col(hashCol), a, b), lit(width.toLong))
      }: _*))
      .select(col("*"), posexplode(col("__pos")).as(Seq("j", "pos")))
      .drop("__pos")
    // LEFT join: a bucket the stream never touched has no counter row,
    // and true count-min semantics treat it as ZERO (the min then
    // reports 0 for never-seen keys instead of dropping them)
    positions.join(broadcast(counters), Seq("j", "pos"), "left")
      .groupBy(keys.columns.map(col): _*)
      .agg(min(coalesce(col("c"), lit(0L))).as("cm_est"))
  }

  // ----------------------------------------------------------------- KMV

  /**
   * Per-group distinct-count estimate from the k minimum hash values:
   * est = (k-1) · P / h_(k) when the group has ≥ k distinct hashes,
   * the exact distinct count otherwise (all hashes are retained below
   * k — the sketch IS the key set there).
   *
   * The k-smallest selection is [[graft.functions.KmvSketchAgg]] — a
   * single map-side-combinable aggregate whose per-group state is AT
   * MOST k longs at every moment (update, partial serialization,
   * merge). No distinct pre-pass, no window, no per-group sort of the
   * full hash stream: the shuffle carries one ≤k-long buffer per group
   * per map task regardless of input size, and an empty-`groupCols`
   * global call reduces tiny partial buffers instead of serializing
   * one task that sorts every distinct hash.
   *
   * Output: `n_kept` = |sketch| = min(distinct, k) — the exact
   * distinct count whenever it is below k — and `kmv_est`.
   *
   * Key domain: NON-NEGATIVE keys below 2^31-1 hash injectively; keys
   * congruent mod 2^31-1 collapse (both columns then count hash
   * classes, not keys), and negative keys would diverge from a plain
   * SQL `%` replication.
   */
  def kmvDistinct(df: DataFrame, groupCols: Seq[String], keyCol: String,
      k: Int = 64): DataFrame = {
    val (a, b) = RowConsts.head
    val g = groupCols.map(col)
    // NULL keys are excluded from the distinct count on BOTH the engine
    // and oracle sides (the aggregate would skip a null hash anyway;
    // the explicit filter pins the semantics rather than leaving them
    // to the update path)
    val hashed = df.filter(col(keyCol).isNotNull).select(g :+
        affine(pmod(col(keyCol).cast("long"), lit(P31)), a, b).as("__h"): _*)
    hashed.groupBy(g: _*)
      .agg(graft.functions.KmvSketchAgg.kmvSketch(col("__h"), k).as("__sk"))
      .select(g ++ Seq(
        size(col("__sk")).cast("long").as("n_kept"),
        // unrounded: the estimate is bit-identical cross-engine; rounding
        // a half-boundary double is the one observed divergence
        when(size(col("__sk")) < k, size(col("__sk")).cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(P31.toDouble)
            / element_at(col("__sk"), k).cast("double"))
          .as("kmv_est")): _*)
  }

  // ----------------------------------------------------------------- HLL

  /**
   * Per-group HyperLogLog register summary with m = 2^p registers over
   * the 31-bit affine key hash: register = top p hash bits, rho =
   * leading-zero count of the remaining W = 31-p bits, plus one.
   * Per-group state is ≤ m small rows at every stage — the
   * (group, register) max-rho aggregate combines map-side, so the
   * shuffle carries at most m rows per group per map task no matter
   * how many keys stream through — vs `count(distinct)`'s full key
   * set: the 100 TB cardinality shape, and (unlike KMV) registers
   * MERGE by pointwise max, so shards/days union for free.
   *
   * Output per group: `hll_used` (registers hit), `hll_sum_inv`
   * (Σ_j 2^-M_j over ALL m registers — an empty register contributes
   * 1), and `hll_raw` = α_m·m²/Σ, the raw HLL estimator. Every step
   * is integer shifts/masks, a comparison cascade for the
   * leading-zero rank (NO transcendental log), and exact powers of
   * two: each 2^-M_j is a multiple of 2^-W and the sum stays well
   * inside a double's 53 bits, so it is EXACT and order-independent;
   * α_m·m²/Σ is one fixed-order IEEE expression — a SQL oracle
   * reproduces all three columns bit-for-bit. The standard
   * small/large-range corrections need ln(), whose last-ulp rounding
   * is engine-specific; callers apply them on top of
   * (hll_used, hll_raw) — the sketch itself stays bit-checkable.
   *
   * Key domain: as [[kmvDistinct]] — non-negative keys; values
   * congruent mod 2^31-1 collapse into one hash class.
   */
  def hllDistinct(df: DataFrame, groupCols: Seq[String], keyCol: String,
      p: Int = 8): DataFrame = {
    require(p >= 4 && p <= 16, s"p must be 4..16, got $p")
    val m = 1 << p
    val w = 31 - p
    val (a, b) = RowConsts.head
    val g = groupCols.map(col)
    val h = affine(pmod(col(keyCol).cast("long"), lit(P31)), a, b)
    val reg = shiftright(h, w)
    val rest = h.bitwiseAND(lit((1L << w) - 1))
    // rho = W - floor(log2(rest)) for rest > 0, W+1 for rest = 0 —
    // outermost branch tests the largest threshold (rho = 1)
    val rho = (w to 1 by -1).foldLeft(lit((w + 1).toLong): Column) { (acc, j) =>
      when(rest >= lit(1L << (w - j)), lit(j.toLong)).otherwise(acc)
    }
    val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(m.toDouble))
    val perReg = df.filter(col(keyCol).isNotNull)
      .select(g ++ Seq(reg.as("__reg"), rho.as("__rho")): _*)
      .groupBy(groupCols.map(col) :+ col("__reg"): _*)
      .agg(max(col("__rho")).as("__m"))
    val sumInv = col("__ss") + (lit(m.toDouble) - col("hll_used").cast("double"))
    perReg.groupBy(g: _*)
      .agg(count(lit(1)).as("hll_used"),
        sum(expr("1.0 / CAST(shiftleft(CAST(1 AS BIGINT), CAST(__m AS INT)) AS DOUBLE)"))
          .as("__ss"))
      .select(g ++ Seq(
        col("hll_used"),
        sumInv.as("hll_sum_inv"),
        (alpha * lit(m.toDouble) * lit(m.toDouble) / sumInv).as("hll_raw")): _*)
  }

  // ----------------------------------------------------- histogram quantiles

  /**
   * Approximate per-group quantiles from a fixed-width histogram: one
   * bounds pass (exact min/max/count — order-independent aggregates),
   * one binning pass (map-side-combinable count per bin), then linear
   * interpolation inside the first bin whose cumulative count reaches
   * q·n. Per-group state is `bins` counters — constant — where the
   * exact `percentile` needs the group's full value set; the estimate
   * shares a bin with the ceil(q·n)-th order statistic, so the value
   * error is bounded by one bin width around that statistic. Every
   * arithmetic step is plain IEEE ops in a fixed order, so a SQL
   * oracle reproduces the estimates bit-for-bit (unlike t-digest/GK
   * sketches, whose results depend on merge order).
   */
  def histogramQuantiles(df: DataFrame, groupCols: Seq[String], valueCol: String,
      bins: Int = 64, qs: Seq[Double] = Seq(0.25, 0.5, 0.9, 0.99)): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = groupCols.map(col)
    val vals = df.filter(col(valueCol).isNotNull)
    val bounds = vals.groupBy(g: _*).agg(
      min(col(valueCol)).as("__mn"), max(col(valueCol)).as("__mx"),
      count(lit(1)).as("__n"))
    def width: Column = (col("__mx") - col("__mn")) / lit(bins.toDouble)
    val binned = vals.join(broadcast(bounds), groupCols)
      .withColumn("__bin",
        when(width === 0.0, lit(0L))
          .otherwise(least(floor((col(valueCol) - col("__mn")) / width).cast("double"),
            lit((bins - 1).toDouble)).cast("long")))
    val hist = binned.groupBy((g :+ col("__bin")): _*).agg(count(lit(1)).as("__c"))
      .join(broadcast(bounds), groupCols)
    val cum = hist.withColumn("__cum",
      sum(col("__c")).over(Window.partitionBy(g: _*).orderBy(col("__bin"))))
    val withQ = cum.select(g ++ Seq(col("__bin"), col("__c"), col("__cum"),
      col("__mn"), col("__mx"), col("__n"), explode(typedLit(qs)).as("q")): _*)
    val target = col("q") * col("__n").cast("double")
    val first = withQ.filter(col("__cum").cast("double") >= target)
      .withColumn("__rn", row_number().over(
        Window.partitionBy((g :+ col("q")): _*).orderBy(col("__bin"))))
      .filter(col("__rn") === 1)
    // unrounded for the same half-boundary reason as kmvDistinct
    first.withColumn("est",
        col("__mn") + width * col("__bin").cast("double") +
          width * (target - (col("__cum") - col("__c")).cast("double"))
            / col("__c").cast("double"))
      .select((g ++ Seq(col("q"), col("est"))): _*)
  }

  // --------------------------------------------------------------- bloom

  /** Bloom filter of a key column as a driver-side bitset: `depth`
    * partitioned blocks of `mBits` bits (depth·mBits/8 bytes — 24 KB
    * at the defaults). The collect is bounded by the SKETCH size,
    * never by the build side's row count: only distinct SET POSITIONS
    * come back to the driver, already deduplicated by the
    * aggregation. */
  def bloomFilterOf(build: DataFrame, keyCol: String,
      mBits: Int = 65536, depth: Int = 3): Array[Long] = {
    require(Integer.bitCount(mBits) == 1 && mBits >= 64,
      "mBits must be a power of two >= 64")
    // positions fold into 64-bit words BEFORE the collect (bit_or per
    // word), so the driver receives at most mBits·depth/64 rows — the
    // word count of the bitset itself — not one row per set position
    val wordRows = build
      .select(pmod(col(keyCol).cast("long"), lit(P31)).as("__h")).distinct()
      .select(explode(array(RowConsts.take(depth).zipWithIndex.map {
        case ((a, b), j) =>
          pmod(affine(col("__h"), a, b), lit(mBits.toLong)) + lit(j.toLong * mBits)
      }: _*)).as("p"))
      .selectExpr("p div 64 as w", "shiftleft(1L, cast(p % 64 as int)) as m")
      .groupBy("w").agg(expr("bit_or(m)").as("m"))
      .collect()
    val words = new Array[Long]((mBits.toLong * depth / 64).toInt)
    wordRows.foreach(r => words(r.getLong(0).toInt) = r.getLong(1))
    words
  }

  /** Membership test column against [[bloomFilterOf]] bits: true iff
    * every row's bit is set. The bitset ships as a plan literal
    * (broadcast with the task binary); the test is pure codegen'd
    * arithmetic — element_at + shiftright + mask per row, no UDF, no
    * shuffle. */
  def bloomMightContain(bits: Array[Long], key: Column,
      mBits: Int = 65536, depth: Int = 3): Column = {
    import org.apache.spark.sql.graftbridge.ExpressionBridge.{column => toCol, expression => toExpr}
    val h = pmod(key.cast("long"), lit(P31))
    val lt = typedLit(bits.toSeq)
    RowConsts.take(depth).zipWithIndex.map { case ((a, b), j) =>
      val p = pmod(affine(h, a, b), lit(mBits.toLong)) + lit(j.toLong * mBits)
      // word >> (p % 64) & 1 — ShiftRight takes a column shift amount
      // at the Catalyst layer (the functions._ wrapper only accepts a
      // literal Int)
      val word = element_at(lt, (p / 64).cast("int") + 1)
      val shifted = toCol(org.apache.spark.sql.catalyst.expressions.ShiftRight(
        toExpr(word), toExpr((p % 64).cast("int"))))
      shifted.bitwiseAND(lit(1L)) === 1L
    }.reduce(_ && _)
  }

  /** Bitset size (bytes) above which [[bloomPrune]] ships the filter as
    * a broadcast variable instead of a plan literal. Below it, the
    * literal is smaller than the broadcast bookkeeping and keeps the
    * whole pipeline replicable in a single SQL statement (the oracle
    * lane); above it, embedding the bits in every serialized task is
    * the classic plan-bloat failure at production m. */
  val BroadcastThresholdBytes: Long = 1L << 18 // 256 KB

  /** Membership test column whose bitset rides a broadcast variable —
    * identical bits, identical verdicts to [[bloomMightContain]], but
    * the plan carries only a broadcast handle. Use for production-size
    * filters (m ≫ the default). */
  def bloomMightContainBcast(
      bits: org.apache.spark.broadcast.Broadcast[Array[Long]], key: Column,
      mBits: Int = 65536, depth: Int = 3): Column =
    graft.functions.BloomMightContainBcast.mightContain(
      bits, key, mBits, depth, RowConsts)

  /** Prune `probe` to rows whose key might be in `build`'s key set —
    * the pre-shuffle filter of a bloom join. Guarantees every true
    * match survives; a fraction ~(fill)^depth of non-matches leak
    * through and are eliminated by the exact join that follows.
    *
    * Lane selection: small bitsets (≤ [[BroadcastThresholdBytes]])
    * embed as a plan literal; larger ones ship as a broadcast variable
    * so the plan and task binaries stay bitset-free. */
  def bloomPrune(probe: DataFrame, probeKey: String,
      build: DataFrame, buildKey: String,
      mBits: Int = 65536, depth: Int = 3): DataFrame = {
    val bits = bloomFilterOf(build, buildKey, mBits, depth)
    if (bits.length.toLong * 8 > BroadcastThresholdBytes) {
      val bc = probe.sparkSession.sparkContext.broadcast(bits)
      probe.filter(bloomMightContainBcast(bc, col(probeKey), mBits, depth))
    } else {
      probe.filter(bloomMightContain(bits, col(probeKey), mBits, depth))
    }
  }
}
