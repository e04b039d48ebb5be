package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.SimHash64.{hamming64, simhash64}
import graft.functions.TextFunctions._

/**
 * Deduplication operators for training-data curation, each designed as
 * a declarative Spark plan so the same code scales from local tests to
 * a 1000-executor cluster:
 *
 *  - '''exact''': hash-groupBy on content — one shuffle of (hash, id),
 *    never the full payload.
 *  - '''minhash LSH''': shingle → k-permutation minhash signature →
 *    banded bucket join. Only the candidate pairs that share a bucket
 *    are compared; bucket sizes are capped so a degenerate bucket
 *    cannot quadratically blow up a task.
 *  - '''simhash''': 64-bit signature via a native codegen expression,
 *    banded into 4×16-bit sub-keys (pigeonhole: any pair within
 *    hamming distance 3 shares at least one of 4 bands).
 *  - '''n-gram Jaccard''': exact verification on LSH candidates only.
 *  - '''embedding cosine''': brute-force O(n²) baseline (oracle), and
 *    a random-hyperplane-LSH bucketed variant as the scale path.
 *
 * ==Choosing knobs at corpus scale==
 *
 * The defaults (`maxBucketSize = 1000`, 16×4 banding) are tuned for
 * the sf0.01-sf0.1 fixtures; at a 100 TB corpus pick them from the
 * workload, not the defaults:
 *
 *  - '''maxBucketSize''' bounds per-task work AND recall: a bucket of
 *    size s verifies s·(s−1)/2 pairs inside one task, so the cap is
 *    the per-task quadratic budget (1000 → ≤ ~500k cheap verdicts,
 *    fine; 100k → 5·10^9, not fine). Oversized buckets are DROPPED,
 *    which silently skips their pairs — at web scale boilerplate
 *    buckets (empty strings, cookie banners) routinely exceed any
 *    cap, and dropping them is usually the desired behavior (they are
 *    near-identical junk best handled by exact dedup first). Run
 *    `exactDedup` before LSH so degenerate content never reaches the
 *    banded join, then set the cap to the largest s whose s²/2
 *    verdicts fit your task-time budget (10^3-10^4 in practice).
 *  - '''bands × rows''' (16 bands × 4 rows here) set the match curve:
 *    P(candidate) = 1 − (1 − j^r)^b for Jaccard j. More bands = more
 *    recall and more shuffle volume (one exploded row per band). At
 *    fixed signature width k = b·r, raise r to cut false candidates
 *    on huge corpora (tighter curve), raise b to catch lower-j pairs.
 *  - Bucket join skew: band keys hash-distribute; the size cap is
 *    also the skew guard, so AQE skew-join handling is optional, not
 *    load-bearing.
 */
object Dedup {

  // ----------------------------------------------------------------- exact

  /** Exact duplicate groups by content: one row per distinct content
    * with the keeper id (min id) and copy count. */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(col(textCol))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))
      .select("keep_id", "n_copies")

  /** Remove exact duplicates, keeping the smallest id per content.
    * Shuffles only (content-hash, id), then semi-joins keepers back —
    * the payload never moves twice. */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val keepers = df.select(col(idCol), xxhash64(col(textCol)).as("__h"))
      .groupBy("__h").agg(min(col(idCol)).as(idCol))
      .select(idCol)
    df.join(keepers, Seq(idCol), "left_semi")
  }

  // --------------------------------------------------------------- minhash

  /** Mersenne prime 2^31-1: permutation arithmetic stays below 2^62,
    * so it is safe under Spark's default ANSI overflow checking. */
  private val P31 = (1L << 31) - 1

  /** Deterministic affine permutation constants (31-bit) for k minhashes
    * (graft-visible so the DuckDB oracle builder can embed the same
    * constants as SQL literals). */
  private[graft] def perms(k: Int): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(0x5eed5eedL)
    Seq.fill(k)((rnd.nextLong().abs % (P31 - 1) + 1, rnd.nextLong().abs % P31))
  }

  /** k-component minhash signature from a feature-hash column — a
    * single-pass native expression (graft.functions.MinHashSignature).
    * Keep the input a bound column reference (staged projection), not
    * an inline subtree, so project-collapsing can't duplicate the
    * shingle pipeline into consumers. */
  def minhashFromHashes(hashes: Column, numHashes: Int = 64): Column = {
    val ps = perms(numHashes)
    graft.functions.MinHashSignature.minhashSignature(hashes,
      ps.map(_._1).toArray, ps.map(_._2).toArray)
  }

  /** 31-bit shingle hash set of a text column (minhash input).
    * `shingleHashes` already emits values in [0, 2^31-1). */
  def shingleHashes31(text: Column, shingleN: Int): Column =
    shingleHashes(text, shingleN)

  /** One-expression minhash signature (convenience; prefer the staged
    * [[shingleHashes31]] -> [[minhashFromHashes]] form in plans). */
  def minhashSignature(text: Column, shingleN: Int = 3, numHashes: Int = 64): Column =
    minhashFromHashes(shingleHashes31(text, shingleN), numHashes)

  /** Banded bucket keys from a SIGNATURE column: one 31-bit key per
    * band (folded mod P31 — overflow-free). The fold input is the
    * 64-long signature, not the shingle set, so this costs ~nothing
    * next to the permutation pass — when the signature is already
    * materialized (minhashPairs pins it), deriving bands from it beats
    * [[bandKeysFromHashes]]'s second 64-permutation sweep over every
    * shingle. */
  private def bandKeys(sig: Column, bands: Int, rows: Int): Column =
    array((0 until bands).map { j =>
      aggregate(slice(sig, j * rows + 1, rows), lit(977L),
        (acc, x) => pmod(acc * lit(31L) + x, lit(P31)))
    }: _*)

  /** Band keys straight from the 31-bit feature-hash column in one
    * native pass (signature internal — no sig column, no cache
    * boundary, whole projection stays codegen). */
  private def bandKeysFromHashes(hashes: Column, bands: Int, rows: Int): Column = {
    val ps = perms(bands * rows)
    graft.functions.MinHashBandKeys.minhashBandKeys(hashes,
      ps.map(_._1).toArray, ps.map(_._2).toArray, bands, rows)
  }

  /**
   * Pin a signature table for multi-branch reuse. Signature DataFrames
   * are consumed by three branches (band explode + both join sides);
   * left unpinned, Catalyst's project-collapsing can re-inline the
   * signature expression tree into every consumer — measured ~1000×
   * slowdown (band keys × sig components × shingle pipeline). The
   * table is small (id + k longs per row), so persisting it is also
   * the right call on a cluster.
   *
   * The pin is EAGER: the table is materialized here, once, on the
   * scan's natural parallelism. Left lazy, the consuming branches (band
   * explode + both payload join sides + AQE's broadcast-exchange
   * futures, which all run concurrently) race to first-compute the same
   * cache blocks and serialize on the per-block cache locks — measured
   * at sf0.1 as 32 tasks blocked seconds each, and 3-10× run-to-run
   * variance on the dedup queries.
   *
   * Every pin is registered in a [[PinScope]]; callers own the
   * lifecycle. Single-pipeline drivers can ignore scopes entirely: pins
   * land in [[defaultPins]] and [[releasePinned]] frees them (the bench
   * and verify drivers sweep persistent RDDs between queries, which is
   * equivalent). A MULTI-TENANT driver running concurrent pipelines
   * passes each pipeline its own scope — releasing one pipeline's
   * tables leaves every other pipeline's cached tables intact:
   *
   * {{{
   * implicit val myPins: Dedup.PinScope = new Dedup.PinScope
   * val pairs = Dedup.minhashPairs(docs, "id", "text")
   * pairs.write.parquet(...)   // materialize first
   * myPins.release()           // frees ONLY this pipeline's pins
   * }}}
   */
  final class PinScope extends AutoCloseable {
    private val pins = new java.util.concurrent.ConcurrentLinkedQueue[() => Unit]()
    private[pipeline] def add(f: () => Unit): Unit = pins.add(f)
    /** Free every table pinned in THIS scope. Results already
      * materialized stay valid; un-materialized plans will recompute. */
    def release(): Unit = {
      var f = pins.poll()
      while (f != null) { f(); f = pins.poll() }
    }
    override def close(): Unit = release()
  }

  /** Where pins land when the caller supplies no scope of its own. */
  val defaultPins: PinScope = new PinScope

  private def pin(df: DataFrame)(implicit scope: PinScope): DataFrame = {
    val p = df.persist(StorageLevel.MEMORY_AND_DISK)
    p.count()
    scope.add(() => p.unpersist(blocking = false))
    p
  }

  /** Free every table pinned in the DEFAULT scope. Call after
    * materializing the DataFrames the pipelines returned. Pipelines
    * run under an explicit [[PinScope]] are NOT touched — release
    * those through their own scope. */
  def releasePinned(): Unit = defaultPins.release()

  /**
   * Shared bucket machinery: given (id, payload, bands array), emit the
   * VERIFIED pairs (a < b) that co-occur in some non-degenerate bucket,
   * where `verdict(pa, pb)` scores a pair from the two payloads and
   * `keep(v)` decides survival.
   *
   * The whole candidate-generate-verify step runs inside ONE shuffle:
   * each bucket gathers (id, payload) structs, and ordered pairs are
   * generated AND verified inside the array lambdas — losing pairs are
   * never materialized as rows. Compared to the join formulation
   * (candidate ids -> distinct -> join payloads twice -> verify), this
   * removes two joins and a multi-million-row distinct; the final
   * distinct only sees surviving pairs (a pair that shares several
   * buckets is re-verified per bucket — verdicts are cheap arithmetic,
   * so redundant verification is far cheaper than the extra shuffles).
   * Pathological buckets (stopword-like content at 100 TB) are dropped
   * by the size cap, so a degenerate bucket cannot create O(n²) work
   * in one task; the cap also bounds the per-bucket payload buffer to
   * maxBucketSize × payload-width.
   */
  private def bucketVerifiedPairs(withBands: DataFrame, idCol: String,
      payloadCol: String, maxBucketSize: Int,
      verdict: (Column, Column) => Column,
      keep: Column => Column, verdictName: String): DataFrame = {
    val exploded = withBands.select(
      col(idCol), col(payloadCol).as("__pl"),
      posexplode(col("__bands")).as(Seq("band", "bkey")))
    val buckets = exploded.groupBy("band", "bkey")
      .agg(array_sort(collect_list(struct(col(idCol).as("id"), col("__pl")))).as("items"))
      .filter(size(col("items")).between(2, maxBucketSize))
    buckets
      .select(explode(flatten(transform(col("items"), (x, i) =>
        filter(
          transform(slice(col("items"), i + lit(2), size(col("items"))),
            y => struct(x.getField("id").as("a"), y.getField("id").as("b"),
              verdict(x.getField("__pl"), y.getField("__pl")).as("v"))),
          s => keep(s.getField("v")))))).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"), col("p.v").as(verdictName))
      .distinct()
  }

  /**
   * Wide-payload variant: buckets carry IDs only; candidate pairs are
   * dedup'd FIRST (the distinct's partial aggregation collapses the
   * cross-band duplicates map-side), then payloads join back and the
   * verdict runs exactly once per unique pair. Shuffle volume per doc
   * is #bands × 16 B + 2 × payload, vs #bands × payload for the
   * in-bucket variant — cheaper for multi-hundred-byte signatures /
   * vectors with many bands, and an expensive verdict (array zip /
   * set intersection) is never re-evaluated per co-occurrence.
   * `withBands` is consumed by three branches — each branch's pruned
   * projection must be either cheap to recompute or cached by the
   * caller (the minhash/ngram callers make every derived column a
   * single native expression, so recompute is one codegen pass).
   */
  private def bucketVerifiedPairsJoin(withBands: DataFrame, idCol: String,
      payloadCol: String, maxBucketSize: Int,
      verdict: (Column, Column) => Column,
      keep: Column => Column, verdictName: String): DataFrame = {
    val exploded = withBands.select(
      col(idCol), posexplode(col("__bands")).as(Seq("band", "bkey")))
    val buckets = exploded.groupBy("band", "bkey")
      .agg(array_sort(collect_list(col(idCol))).as("ids"))
      .filter(size(col("ids")).between(2, maxBucketSize))
    val pairs = buckets
      .select(explode(flatten(transform(col("ids"), (x, i) =>
        transform(slice(col("ids"), i + lit(2), size(col("ids"))),
          y => struct(x.as("a"), y.as("b")))))).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .distinct()
    val sl = withBands.select(col(idCol).as("a"), col(payloadCol).as("__pla"))
    val sr = withBands.select(col(idCol).as("b"), col(payloadCol).as("__plb"))
    pairs.join(sl, "a").join(sr, "b")
      .withColumn(verdictName, verdict(col("__pla"), col("__plb")))
      .filter(keep(col(verdictName)))
      .select(col("a"), col("b"), col(verdictName))
  }

  /**
   * MinHash-LSH near-duplicate pairs with estimated Jaccard >=
   * `threshold`. numHashes = bands * rowsPerBand.
   */
  def minhashPairs(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, bands: Int = 16, rowsPerBand: Int = 4,
      threshold: Double = 0.5, maxBucketSize: Int = 1000)(
      implicit scope: PinScope = defaultPins): DataFrame = {
    val k = bands * rowsPerBand
    // pinned: the bucket machinery consumes this table from THREE
    // branches (band explode + both payload join sides); without the
    // cache boundary project-collapsing re-runs the 64-permutation
    // minhash over every shingle once per branch — the dominant cost of
    // the whole query (measured 14% at sf0.1). The pinned table is
    // narrow (id + 64+16 longs). Bands derive from the SIGNATURE (a
    // 64-element fold), so the shingle set is traversed by exactly ONE
    // permutation sweep.
    val sigs = pin(df
      .select(col(idCol), shingleHashes31(col(textCol), shingleN).as("__sh"))
      .select(col(idCol), minhashFromHashes(col("__sh"), k).as("__sig"))
      .select(col(idCol), col("__sig"),
        bandKeys(col("__sig"), bands, rowsPerBand).as("__bands")))
    val est = (sa: Column, sb: Column) =>
      aggregate(zip_with(sa, sb, (x, y) => when(x === y, 1).otherwise(0)),
        lit(0), (acc, v) => acc + v).cast("double") / lit(k)
    bucketVerifiedPairsJoin(sigs, idCol, "__sig", maxBucketSize,
      est, _ >= threshold, "est_jaccard")
      .select(col("a"), col("b"), round(col("est_jaccard"), 4).as("est_jaccard"))
  }

  /**
   * INCREMENTAL minhash dedup: near-dup pairs (a = corpus id, b =
   * delta id, est_jaccard) between an EXISTING corpus and a NEW
   * batch — the corpus-growth path. Both sides compute signatures and
   * banded bucket keys, but only CROSS-SET bucket collisions verify:
   * growing a 100 TB corpus by a batch costs O(delta + collisions)
   * and never re-pairs corpus × corpus. The per-bucket cap applies to
   * the CORPUS side (a boilerplate-heavy bucket would otherwise fan
   * every delta doc out maxBucket-wide); capped buckets drop, the
   * standard LSH recall trade.
   */
  def minhashPairsIncremental(corpus: DataFrame, delta: DataFrame,
      idCol: String, textCol: String,
      shingleN: Int = 3, bands: Int = 16, rowsPerBand: Int = 4,
      threshold: Double = 0.5, maxBucketSize: Int = 1000)(
      implicit scope: PinScope = defaultPins): DataFrame = {
    val k = bands * rowsPerBand
    def sigsOf(df: DataFrame): DataFrame = pin(df
      .select(col(idCol), shingleHashes31(col(textCol), shingleN).as("__sh"))
      .select(col(idCol), minhashFromHashes(col("__sh"), k).as("__sig"))
      .select(col(idCol), col("__sig"),
        bandKeys(col("__sig"), bands, rowsPerBand).as("__bands")))
    val cs = sigsOf(corpus)
    val ds = sigsOf(delta)
    def bandRows(s: DataFrame): DataFrame = s.select(
      col(idCol), posexplode(col("__bands")).as(Seq("band", "bkey")))
    // corpus buckets once (sorted id lists for determinism), then one
    // shuffle join of the delta's band rows against them
    val cb = bandRows(cs).groupBy("band", "bkey")
      .agg(array_sort(collect_list(col(idCol))).as("cids"))
      .filter(size(col("cids")) <= maxBucketSize)
    val cand = bandRows(ds).join(cb, Seq("band", "bkey"))
      .select(explode(col("cids")).as("a"), col(idCol).as("b"))
      .distinct()
    val est = (sa: Column, sb: Column) =>
      aggregate(zip_with(sa, sb, (x, y) => when(x === y, 1).otherwise(0)),
        lit(0), (acc, v) => acc + v).cast("double") / lit(k)
    cand
      .join(cs.select(col(idCol).as("a"), col("__sig").as("__sa")), "a")
      .join(ds.select(col(idCol).as("b"), col("__sig").as("__sb")), "b")
      .withColumn("est_jaccard", est(col("__sa"), col("__sb")))
      .filter(col("est_jaccard") >= threshold)
      .select(col("a"), col("b"), round(col("est_jaccard"), 4).as("est_jaccard"))
  }

  /**
   * Resolve near-duplicate PAIRS into clusters, electing one keeper per
   * connected component (the minimum id), in two phases:
   *
   *  1. ONE round of min-label propagation over the self-looped pair
   *     graph — a single shuffle that fully resolves near-cliques, the
   *     common LSH shape. The graph is then CONTRACTED by those
   *     labels; for clique-shaped inputs the contraction is empty and
   *     the algorithm stops here.
   *  2. Alternating LARGE-STAR / SMALL-STAR rounds (Kiveris et al.,
   *     "Connected Components in MapReduce and Beyond") on the
   *     contracted edges: large-star hangs every bigger neighbor under
   *     the neighborhood min, small-star re-hangs the smaller ones.
   *     Deep chains collapse in O(log) alternations where plain
   *     min-propagation needs one round per hop of diameter.
   *
   * Convergence is checked on the per-node minimum parent (exact
   * decimal sums — labels only decrease, so an unchanged signature is
   * the fixpoint), bounded by `maxIters` star alternations. At 100 TB
   * the edge set (near-dup pairs) is a small fraction of the corpus
   * and every round shuffles contracted edges only — never documents.
   *
   * Returns (id, keep_id) for every id that appears in some pair;
   * `keep_id = id` marks the cluster keeper. Unpaired documents are
   * their own trivial cluster and are not emitted.
   */
  def resolveClusters(pairs: DataFrame, aCol: String = "a", bCol: String = "b",
      maxIters: Int = 20)(implicit scope: PinScope = defaultPins): DataFrame = {
    // bidirectional edges PLUS self-loops, all from ONE scan of `pairs`
    // (a union of selects would run the upstream pair pipeline once per
    // branch into the pin). Self-loops make "min over neighbors"
    // include the node's own label, so a propagation round is a SINGLE
    // join + min — no second join against the previous labels.
    // bidirectional edges from ONE scan of `pairs` (a union of selects
    // would run the upstream pair pipeline once per branch into the
    // pin). NOT deduplicated: every consumer below is a min/grouping,
    // so duplicates cost a little shuffle volume where a distinct
    // would cost a whole extra shuffle of the edge set.
    val edges = pin(pairs.select(explode(array(
        struct(col(aCol).as("src"), col(bCol).as("dst")),
        struct(col(bCol).as("src"), col(aCol).as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst")))

    // localCheckpoint blocks are RDD-level persists — Dataset.unpersist
    // does NOT release them (it only uncaches CacheManager entries), so
    // free each round's blocks through the underlying LogicalRDD
    def ckRdd(df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
      df.queryExecution.logical.collectFirst {
        case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
      }
    // Each round persists its edges (the signature scan materializes them),
    // and every CKPT_EVERY-th round TRUNCATES LINEAGE with an eager
    // localCheckpoint instead: a persisted round still nests the
    // previous round's plan (read from cache at runtime, but the PLAN
    // tree grows per round — a long chain OOMed on plan stringification
    // alone), while checkpointing every round would cost a second job
    // per round. LSH dup clusters are near-cliques (2-3 rounds), so the
    // common case never checkpoints and pays exactly one job per round.
    val CkptEvery = 8
    def materialize(df: DataFrame, round: Int): (DataFrame, () => Unit) =
      if (round % CkptEvery == CkptEvery - 1) {
        val ck = df.localCheckpoint(true)
        (ck, () => ckRdd(ck).foreach(_.unpersist(false)))
      } else {
        val p = df.persist(StorageLevel.MEMORY_AND_DISK)
        (p, () => { p.unpersist(blocking = false); () })
      }

    // Round 0 falls straight out of the self-looped edges:
    // label = min(self, neighbors) — `least` with the group key plays
    // the self-loop's role without doubling the exploded edge rows.
    val (labels0, freeLabels0) = materialize(
      edges.groupBy(col("src")).agg(min(col("dst")).as("m"))
        .select(col("src").as("id"), least(col("src"), col("m")).as("label")), 0)

    // CONTRACT by round-0 labels: an edge survives only if its
    // endpoints resolved to different labels. Near-clique inputs
    // contract to NOTHING — the loop below never runs for them.
    // Duplicates are harmless (every consumer is a min/grouping), so
    // no distinct here either. (A one-join "propagate once and compare
    // label sums" check was tried instead of building the contraction —
    // it BENCHED SLOWER: these label joins broadcast under AQE at test
    // scale and sort-merge at cluster scale either way, while the sum
    // check's groupBy genuinely shuffles every propagation row, where
    // the sig() below aggregates the near-EMPTY contracted set.)
    val lSrc = labels0.select(col("id").as("src"), col("label").as("ls"))
    val lDst = labels0.select(col("id").as("dst"), col("label").as("ld"))
    val contracted = edges.filter(col("src") < col("dst"))
      .join(lSrc, "src").join(lDst, "dst")
      .select(greatest(col("ls"), col("ld")).as("x"),
        least(col("ls"), col("ld")).as("p"))
      .filter(col("x") =!= col("p"))

    // large-star: every neighbor BIGGER than s hangs under
    // min(Γ(s) ∪ {s}); small-star re-hangs each node's smaller
    // parents (and itself) under its minimum parent. Window mins, not
    // joins — one shuffle each plus the dedup.
    val w = org.apache.spark.sql.expressions.Window
    def largeStar(e: DataFrame): DataFrame = {
      val bidir = e.select(col("x").as("s"), col("p").as("d"))
        .union(e.select(col("p").as("s"), col("x").as("d")))
      bidir.withColumn("m", least(min(col("d")).over(w.partitionBy("s")), col("s")))
        .filter(col("d") > col("s"))
        .select(col("d").as("x"), col("m").as("p"))
        .distinct()
    }
    def smallStar(e: DataFrame): DataFrame =
      e.withColumn("m", min(col("p")).over(w.partitionBy("x")))
        .select(explode(array(
          struct(col("p").as("n"), col("m")),
          struct(col("x").as("n"), col("m")))).as("e2"))
        .select(col("e2.n").as("x"), col("e2.m").as("p"))
        .filter(col("x") =!= col("p"))
        .distinct()

    // fixpoint signature: per-node minimum parent, summed exactly.
    // Parents only DECREASE round over round (each star op hangs nodes
    // under neighborhood minima), so an unchanged (count, Σx, Σp)
    // triple means no node's label moved — and a label fixpoint is
    // componentwise-correct (any edge between differently-labeled
    // nodes would drop the bigger label in the next large-star). The
    // agg doubles as the action that fills the round's cache.
    def sig(e: DataFrame): (Long, java.math.BigDecimal, java.math.BigDecimal) = {
      val r = e.groupBy(col("x")).agg(min(col("p")).as("mp"))
        .agg(count(lit(1)), sum(col("x").cast("decimal(38,0)")),
          sum(col("mp").cast("decimal(38,0)"))).head()
      (r.getLong(0), r.getDecimal(1), r.getDecimal(2))
    }

    var (cur, freeCur) = materialize(contracted, 1)
    var prevSig = sig(cur)
    var converged = prevSig._1 == 0L
    var i = 0
    while (!converged && i < maxIters) {
      // EAGER localCheckpoint every star round: each round's plan
      // would otherwise nest the previous round's (window + union +
      // explode + distinct) tree and Catalyst re-analysis grows
      // superlinearly — a 13-round chain spent seconds per round on
      // the DRIVER before this. Star rounds only run for chain-shaped
      // residues (the clique fast path never gets here), so the extra
      // checkpoint job per round is paid exactly where lineage
      // truncation is worth it.
      val next = smallStar(largeStar(cur)).localCheckpoint(true)
      val freeNext = () => { ckRdd(next).foreach(_.unpersist(false)); () }
      val s = sig(next)
      converged = s == prevSig
      // the checkpointed round no longer reads the previous round —
      // free it as soon as the new one is materialized
      freeCur()
      cur = next
      freeCur = freeNext
      prevSig = s
      i += 1
    }
    lastResolveRounds = i
    if (!converged) {
      // inconsistent labels would silently keep/drop the wrong
      // documents downstream — refuse instead
      freeCur(); freeLabels0(); edges.unpersist()
      throw new IllegalStateException(
        s"resolveClusters did not converge within $maxIters star rounds; " +
          "raise maxIters")
    }
    if (prevSig._1 == 0L && i == 0) {
      // clique fast path: the contraction emptied the graph, so the
      // round-0 labels ARE the components — no compose join, the
      // common LSH case returns after ONE grouping + one join-sig pass
      freeCur(); edges.unpersist()
      scope.add(freeLabels0)
      labels0.select(col("id"), col("label").as("keep_id"))
    } else {
      // compose: id --round-0--> label --star-roots--> component min
      val roots = cur.groupBy(col("x")).agg(min(col("p")).as("root"))
        .select(col("x").as("label"), col("root"))
      val (labels, freeLabels) = materialize(
        labels0.join(roots, Seq("label"), "left")
          .select(col("id"), coalesce(col("root"), col("label")).as("keep_id")), 0)
      labels.count() // fill the final cache before freeing its inputs
      freeCur(); freeLabels0(); edges.unpersist()
      // the returned plan reads the final round's blocks; the caller
      // owns them through its PinScope like every other pinned table
      scope.add(freeLabels)
      labels.select(col("id"), col("keep_id"))
    }
  }

  /** Star alternations the last [[resolveClusters]] call needed after
    * contraction (0 = the round-0 contraction already emptied the
    * graph). Observability for tests and round-count audits. */
  @volatile var lastResolveRounds: Int = -1

  // --------------------------------------------------------------- simhash

  /** Two-lane bit spread of a 31-bit token hash into 62 usable bits:
    * each lane is an affine transform mod 2^31-1 then SQUARED mod
    * 2^31-1 (quadratic-residue scrambling — measured to match a
    * table-lookup reference hash on near-dup pair counts, where plain
    * affine lanes leave bit correlations that inflate close pairs),
    * concatenated. Replicable in DuckDB SQL, unlike xxhash64; bits
    * 62-63 are always 0, which is hamming-invariant across documents. */
  private[graft] val SimLaneA1 = 1566083941L
  private[graft] val SimLaneB1 = 1L
  private[graft] val SimLaneA2 = 1103515245L
  private[graft] val SimLaneB2 = 12345L

  /** 62-bit simhash of the token stream (native codegen expression over
    * oracle-replicable polynomial token hashes). */
  def simhashColumn(text: Column): Column = {
    val th = graft.functions.TokenShingleHashes.tokenShingleHashes(tokens(text), 1)
    def lane(a: Long, b: Long, p: Column): Column = {
      val x = pmod(p * lit(a) + lit(b), lit(P31))
      pmod(x * x, lit(P31))
    }
    val spread = transform(th, p =>
      lane(SimLaneA1, SimLaneB1, p) * lit(1L << 31) + lane(SimLaneA2, SimLaneB2, p))
    simhash64(spread)
  }

  /**
   * SimHash near-duplicate pairs with hamming distance <= maxHamming
   * (<= 3 guarantees no false negatives with 4 bands, by pigeonhole).
   */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, maxBucketSize: Int = 10000)(
      implicit scope: PinScope = defaultPins): DataFrame = {
    // pin before deriving bands: simhashColumn contains a higher-order
    // transform (no codegen CSE), so the 4 band projections + payload
    // would otherwise each recompute the simhash after project collapse
    val sigs = pin(df.select(col(idCol), simhashColumn(col(textCol)).as("__sh")))
      .withColumn("__bands", array((0 until 4).map { j =>
        shiftright(col("__sh"), j * 16).bitwiseAND(lit(0xffffL))
          .bitwiseOR(lit(j.toLong << 32))
      }: _*))
    bucketVerifiedPairs(sigs, idCol, "__sh", maxBucketSize,
      hamming64, _ <= maxHamming, "hamming")
  }

  // --------------------------------------------------- n-gram Jaccard exact

  /**
   * Exact n-gram Jaccard pairs >= threshold, using minhash LSH for
   * candidate generation (loose internal threshold) and exact set
   * Jaccard for the verdict.
   */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, threshold: Double = 0.6,
      maxBucketSize: Int = 1000)(implicit scope: PinScope = defaultPins): DataFrame = {
    // pinned for the same three-branch reuse as minhashPairs: without
    // the cache boundary each branch re-tokenizes and re-hashes the
    // shingle sets (payload = the hash set itself, so both join sides
    // recompute it)
    val sigs = pin(df
      .select(col(idCol), shingleHashes(col(textCol), shingleN).as("__sh"))
      .select(col(idCol), col("__sh"),
        bandKeysFromHashes(col("__sh"), 16, 4).as("__bands")))
    val jac = (sa: Column, sb: Column) =>
      size(array_intersect(sa, sb)).cast("double") / size(array_union(sa, sb))
    bucketVerifiedPairsJoin(sigs, idCol, "__sh", maxBucketSize,
      jac, _ >= threshold, "jaccard")
  }

  /**
   * Near-CONTAINMENT pairs: |A ∩ B| / min(|A|, |B|) ≥ threshold over
   * n-gram hash sets — catches quotes and near-subsets that symmetric
   * Jaccard misses (a short document quoted verbatim inside a long one
   * has low Jaccard but containment ≈ 1). Candidate generation is the
   * same banded-minhash bucketing as [[ngramJaccardPairs]]; note
   * minhash recall tracks SYMMETRIC similarity, so extremely
   * asymmetric pairs (tiny quote in a huge doc) may not share a
   * bucket — the operator targets near-dup-sized quoting, the
   * dominant curation case.
   */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, threshold: Double = 0.9,
      maxBucketSize: Int = 1000)(implicit scope: PinScope = defaultPins): DataFrame = {
    val sigs = pin(df
      .select(col(idCol), shingleHashes(col(textCol), shingleN).as("__sh"))
      .select(col(idCol), col("__sh"),
        bandKeysFromHashes(col("__sh"), 16, 4).as("__bands")))
    val cont = (sa: Column, sb: Column) =>
      size(array_intersect(sa, sb)).cast("double") / least(size(sa), size(sb))
    bucketVerifiedPairsJoin(sigs, idCol, "__sh", maxBucketSize,
      cont, _ >= threshold, "containment")
  }

  // ------------------------------------------------------ embedding cosine

  /** Dot product of two array<double> columns (native fused expression). */
  def dotCols(a: Column, b: Column): Column =
    graft.functions.VectorDot.vectorDot(a, b)

  /** Cosine similarity of two array<double> columns. */
  def cosine(a: Column, b: Column): Column =
    dotCols(a, b) / (sqrt(dotCols(a, a)) * sqrt(dotCols(b, b)))

  private def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** Unit-normalized vectors, staged and pinned: norms are computed once
    * per ROW here so pairwise similarity later is a single dot product —
    * 3× less work than cosine-per-pair, and the multi-use table can't be
    * re-inlined by project collapsing. */
  private def normalized(df: DataFrame, idCol: String, vecCol: String,
      idAs: String, vecAs: String)(implicit scope: PinScope): DataFrame = pin(
    df.select(col(idCol).as(idAs), asDouble(col(vecCol)).as("__raw"))
      .select(col(idAs), col("__raw"),
        sqrt(dotCols(col("__raw"), col("__raw"))).as("__n"))
      .select(col(idAs), transform(col("__raw"), x => x / col("__n")).as(vecAs)))

  /** Brute-force embedding near-dup pairs (O(n²) — correctness baseline
    * and DuckDB-oracle query; use [[embeddingPairsLsh]] at scale). */
  def embeddingPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double)(implicit scope: PinScope = defaultPins): DataFrame = {
    val va = normalized(df, idCol, vecCol, "a", "__va")
    val vb = normalized(df, idCol, vecCol, "b", "__vb")
    va.crossJoin(vb).where(col("a") < col("b"))
      .withColumn("cos", dotCols(col("__va"), col("__vb")))
      .filter(col("cos") > threshold)
      .select(col("a"), col("b"), round(col("cos"), 2).as("cos"))
  }

  /** Deterministic Rademacher (±1) hyperplane pool for sign-LSH;
    * `table` selects a disjoint slice so hash tables are independent.
    * ±1 entries are as good as gaussian for sign-random-projection and
    * — generated by pure integer arithmetic (squared-LCG parity mod
    * 2^31-1) — the exact same planes are reproducible inside a DuckDB
    * oracle query, making bucket membership cross-engine verifiable. */
  private[graft] def planeSign(dim: Int, bits: Int, table: Int, bit: Int, d: Int): Double = {
    val idx = (table.toLong * bits + bit) * dim + d
    val q = (1103515245L * idx + 12345L) % P31
    if ((q * q % P31) % 2 == 0) 1.0 else -1.0
  }

  private[graft] def planesForTable(dim: Int, bits: Int, table: Int): Seq[Seq[Double]] =
    Seq.tabulate(bits)(j => Seq.tabulate(dim)(d => planeSign(dim, bits, table, j, d)))

  /** Sign-random-projection bucket key for one hash table: one bit per
    * hyperplane. */
  def srpKeyTable(vec: Column, dim: Int, bits: Int, table: Int): Column =
    planesForTable(dim, bits, table).zipWithIndex.foldLeft(lit(0L)) {
      case (acc, (plane, j)) =>
        val d = dotCols(vec, typedLit(plane))
        acc.bitwiseOR(when(d > 0, lit(1L << j)).otherwise(lit(0L)))
    }

  /** ALL tagged SRP keys (key | t<<32, one per table) in a single
    * native one-pass expression — same dots, same sign decisions as
    * `tables × bits` srpKeyTable calls, one vector traversal. */
  def srpKeysTagged(vec: Column, dim: Int, bits: Int, tables: Int): Column = {
    val planes = (0 until tables)
      .flatMap(t => planesForTable(dim, bits, t)).map(_.toArray).toArray
    graft.functions.SrpKeys.srpKeys(vec, planes, bits)
  }

  /**
   * SEMANTIC dedup (SemDeDup shape): k-means cluster the NORMALIZED
   * embeddings with the same deterministic quantizer the IVF index
   * trains (sample = first `sampleSize` ids, Lloyd with first-index
   * ties, empty clusters keep their centroid), then verify exact
   * cosine ONLY within a cluster. Candidate work is Σ per-cluster
   * |c|² (capped by `maxBucketSize`), never n² — the scale shape of
   * embedding-level dedup over a corpus. Cross-cluster near-dups are
   * out of reach by construction (the method's documented trade);
   * identical vectors always share a cluster, so exact copies are
   * never missed. Returns (a, b, cos) with cos > threshold, a < b.
   */
  def semanticPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, nlist: Int = 16, sampleSize: Int = 512,
      iters: Int = 5, maxBucketSize: Int = 2000)(
      implicit scope: PinScope = defaultPins): DataFrame = {
    val base = normalized(df, idCol, vecCol, idCol, "__v")
    val sample = base.orderBy(col(idCol)).limit(sampleSize)
      .select(col("__v")).collect().map(_.getSeq[Double](0).toArray)
    if (sample.isEmpty)
      // no rows survive normalization → no centroids to seed (kmeans
      // needs a non-empty sample); an empty pair set is the right
      // answer, matching embeddingPairs on the same input
      return df.sparkSession.emptyDataFrame
        .select(lit(null).cast(df.schema(idCol).dataType).as("a"),
          lit(null).cast(df.schema(idCol).dataType).as("b"),
          lit(null).cast("double").as("cos"))
        .limit(0)
    val cents = Similarity.kmeans(sample, nlist, iters)
    // one band per row: the 1-based cluster id (same cc − 2·dot argmin
    // expression as IVF list assignment — bit-identical to the oracle)
    val v = pin(base.withColumn("__bands", array(
      graft.functions.NearestCentroid.nearestCentroid(col("__v"), cents))))
    bucketVerifiedPairsJoin(v, idCol, "__v", maxBucketSize,
      dotCols, _ > threshold, "cos")
  }

  /**
   * LSH-bucketed embedding near-dup: L independent SRP hash tables;
   * candidates share a bucket in any table; exact cosine verifies
   * (zero false positives; recall grows with `tables`). Linear in n
   * per table instead of O(n²).
   */
  def embeddingPairsLsh(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, dim: Int, bitsPerBucket: Int = 6, tables: Int = 8,
      maxBucketSize: Int = 2000)(implicit scope: PinScope = defaultPins): DataFrame = {
    // SRP sign bits are norm-invariant, so bucketing the normalized
    // vectors is equivalent and the verify step becomes a plain dot.
    // The bands projection is pinned like the minhash signature table:
    // the bucket machinery reads it from three branches, and each
    // would otherwise recompute the tables×bits SRP pass per row
    val base = normalized(df, idCol, vecCol, idCol, "__v")
    val v = pin(base.withColumn("__bands",
      srpKeysTagged(col("__v"), dim, bitsPerBucket, tables)))
    bucketVerifiedPairsJoin(v, idCol, "__v", maxBucketSize,
      dotCols, _ > threshold, "cos")
  }

  // ------------------------------------------------- duplicated spans

  /**
   * Cross-document duplicated-SPAN detection — the substring-level
   * complement of the doc-level near-dup family (cf. Lee et al.,
   * "Deduplicating Training Data Makes Language Models Better", ACL
   * 2022, which removes verbatim repeated substrings rather than whole
   * documents). A token position is duplicated when the k-token window
   * starting there occurs in ≥ 2 DISTINCT documents (within-doc
   * repetition is deliberately excluded — [[graft.functions.RepetitionStats]]
   * covers that); overlapping duplicated windows merge into maximal
   * spans, one output row per span:
   * `(idCol, span_start, span_end, n_dup_tokens)` with `[start, end)`
   * half-open 0-based token offsets.
   *
   * Scale shape (the reference paper's suffix-array build is a
   * single-machine design; this is the distributed re-expression):
   *  - grams ship as their 64-bit xxhash, never the k-token text —
   *    the wide shuffle moves 8-byte keys (a hash collision could
   *    mark a non-duplicated window, with probability ~n²/2⁶⁴ —
   *    vanishing at any real corpus size and acceptable for a dedup
   *    SIGNAL; the merge step needs no gram payload at all);
   *  - one aggregation shuffle on gram hash finds hashes spanning ≥ 2
   *    docs, one more co-partitioned join marks duplicated starts
   *    (both sides already hash-clustered, AQE plans the second as a
   *    local zip when partitioning matches);
   *  - the interval merge is one window pass per document — a single
   *    shuffle on doc id, streaming within each partition (running
   *    cummax + running group sum; no per-doc materialization).
   */
  def duplicatedSpans(df: DataFrame, idCol: String, textCol: String,
      k: Int = 8)(implicit scope: PinScope = defaultPins): DataFrame = {
    // (id, pos, gram-hash) for every k-token window start; pinned
    // because the dup-hash aggregate and the mark join both scan it
    val grams = pin(gramStarts(df, idCol, textCol, k))
    val dup = grams.groupBy(col("__gh"))
      .agg(countDistinct(col("__id")).as("__nd"))
      .filter(col("__nd") >= 2).select("__gh")
    mergeSpans(grams.join(dup, "__gh"), idCol, k)
  }

  /**
   * INCREMENTAL duplicated spans: mark the spans of `delta` documents
   * whose k-token windows already occur ANYWHERE in `corpus` —
   * cross-set only, the span-level twin of [[incrementalPairs]] (a new
   * crawl batch checked against the standing corpus before admission).
   * No distinct-doc count is needed: the sets are disjoint by
   * contract, so any hit is cross-set. The corpus side reduces to a
   * DISTINCT gram-hash set — in a standing pipeline that set (or a
   * bloom filter over it, for a one-sided no-shuffle check that
   * tolerates the filter's false-positive rate) is built once and
   * probed per batch; per-batch cost scales with the delta.
   */
  def duplicatedSpansAgainst(corpus: DataFrame, delta: DataFrame,
      idCol: String, textCol: String, k: Int = 8): DataFrame = {
    val cg = gramStarts(corpus, idCol, textCol, k).select("__gh").distinct()
    mergeSpans(gramStarts(delta, idCol, textCol, k).join(cg, "__gh"), idCol, k)
  }

  /**
   * ZERO-SHUFFLE span admission check: the corpus's k-token gram
   * hashes fold into a BLOOM filter (one aggregation down to the
   * bitset's own words — at most m·depth/64 rows reach the driver;
   * above [[Sketches.BroadcastThresholdBytes]] the bits ride a
   * broadcast variable, not the plan), and each delta window is kept
   * by pure codegen'd membership arithmetic — the delta side never
   * shuffles before the per-doc merge window. The price is the
   * filter's false-positive rate: output spans are a SUPERSET of
   * [[duplicatedSpansAgainst]]'s (every truly duplicated window
   * survives; ~fill^depth of clean windows leak in) — the right trade
   * for a pre-filter in front of an exact check. Grams hash with the
   * 31-bit polynomial shingle hash (not xxhash64) so the verdicts —
   * false positives included — are bit-replicable in the SQL oracle.
   */
  def duplicatedSpansAgainstBloom(corpus: DataFrame, delta: DataFrame,
      idCol: String, textCol: String, k: Int = 8,
      mBits: Int = 1 << 23, depth: Int = 3): DataFrame = {
    def starts31(df: DataFrame): DataFrame = gramStartsBy(df, idCol, k,
      t => graft.functions.TokenShingleHashes.tokenShingleHashes(t, k))(textCol)
    val kept = Sketches.bloomPrune(starts31(delta), "__gh",
      starts31(corpus).select("__gh"), "__gh", mBits, depth)
    mergeSpans(kept.select(col("__id"), col("__pos")), idCol, k)
  }

  /** (id, pos, gram-hash) rows, one per k-token window start — grams
    * leave the row as 64-bit hashes, never as text. */
  private def gramStarts(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame =
    gramStartsBy(df, idCol, k, t => transform(
      sequence(lit(0), size(t) - k),
      i => xxhash64(array_join(slice(t, i + 1, lit(k)), " "))))(textCol)

  /** Shared window-start enumeration for the span family: tokenize,
    * drop sub-window docs, posexplode the per-start hash array built by
    * `hashes` (xxhash64 windows for the exact lanes, the SQL-replicable
    * 31-bit polynomial for the bloom lane). ONE shape to fix if the
    * window arithmetic ever changes. */
  private def gramStartsBy(df: DataFrame, idCol: String, k: Int,
      hashes: Column => Column)(textCol: String): DataFrame =
    df.select(col(idCol).as("__id"), tokens(col(textCol)).as("__t"))
      .filter(size(col("__t")) >= k)
      .select(col("__id"), posexplode(hashes(col("__t"))))
      .select(col("__id"), col("pos").cast("long").as("__pos"),
        col("col").as("__gh"))

  /** Duplicated starts → equal-length intervals [pos, pos+k), merged
    * per doc by the classic cummax sweep (a new group opens where the
    * interval starts past everything seen so far) — one window pass,
    * streaming within each doc's partition. */
  private def mergeSpans(starts: DataFrame, idCol: String, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    starts
      .select(col("__id"), col("__pos").as("__s"), (col("__pos") + k).as("__e"))
      .withColumn("__pm", max(col("__e")).over(w.partitionBy("__id")
        .orderBy("__s").rowsBetween(w.unboundedPreceding, -1)))
      .withColumn("__ng",
        when(col("__pm").isNull || col("__s") > col("__pm"), 1).otherwise(0))
      .withColumn("__g", sum(col("__ng")).over(w.partitionBy("__id").orderBy("__s")))
      .groupBy(col("__id"), col("__g"))
      .agg(min(col("__s")).as("span_start"), max(col("__e")).as("span_end"))
      .select(col("__id").as(idCol), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start")).as("n_dup_tokens"))
  }
}
