package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/**
 * Corpus-curation operators every training pipeline needs around the
 * dedup/quality core:
 *
 *  - [[assignSplits]]: DETERMINISTIC train/val/test assignment by an
 *    arithmetic hash of the id — independent of partitioning, ordering,
 *    cluster size, or run; the same row lands in the same split on any
 *    engine (the hash is plain mod-2^31-1 arithmetic, so the DuckDB
 *    oracle reproduces assignments exactly).
 *  - [[contamination]]: test rows whose content fingerprint appears in
 *    the training corpus (eval-set leakage detection). Shuffles only
 *    (fingerprint, id) pairs — never documents — and the train side is
 *    reduced to distinct fingerprints first.
 */
object Curation {

  private val P31 = (1L << 31) - 1

  /** Cumulative upper split thresholds — the exact IEEE doubles
    * [[assignSplits]] compares against (`0.8 + 0.1` is
    * `0.9000000000000001`, not `0.9`). Oracle builders must derive
    * their CASE branches from THESE values (e.g. via
    * `java.lang.Double.toString`, whose shortest-round-trip output
    * parses back to the identical double in any IEEE-754 engine), so a
    * fraction change can never desynchronize Spark and oracle
    * assignments. */
  def cumThresholds(splits: Seq[(String, Double)]): Seq[Double] =
    splits.scanLeft(0.0)(_ + _._2).tail

  /**
   * Assign each row to a named split with the given fractions (must sum
   * to 1). The unit-interval point is `((id mod P)·a + b mod P) / P` —
   * affine mod a Mersenne prime, safe under ANSI overflow checking and
   * replicable in SQL.
   */
  def assignSplits(df: DataFrame, idCol: String,
      splits: Seq[(String, Double)],
      a: Long = 1103515245L, b: Long = 12345L): DataFrame = {
    require(splits.nonEmpty && math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      "split fractions must sum to 1")
    // integral non-null ids only: a silent cast-to-null would drop every
    // such row into the LAST split with no error
    df.schema(idCol).dataType match {
      case org.apache.spark.sql.types.LongType
           | org.apache.spark.sql.types.IntegerType
           | org.apache.spark.sql.types.ShortType => ()
      case other => throw new IllegalArgumentException(
        s"assignSplits requires an integral id column, got ${other.catalogString}" +
          " (hash string ids to a long first, e.g. via xxhash64)")
    }
    val u = pmod(pmod(col(idCol).cast("long"), lit(P31)) * lit(a) + lit(b), lit(P31))
      .cast("double") / lit(P31.toDouble)
    val cum = cumThresholds(splits)
    val assign = splits.zip(cum).dropRight(1)
      .foldRight(lit(splits.last._1): Column) {
        case (((name, _), c), els) => when(u < lit(c), lit(name)).otherwise(els)
      }
    df.withColumn("split", assign)
  }

  /**
   * Deterministic uniform sample without replacement: the `n` rows
   * whose affine id hash is smallest (ties broken by id). Same row set
   * on any engine, run, partitioning or cluster size — the property
   * that makes a sampled eval slice reproducible — and the plan is
   * TakeOrderedAndProject (per-partition top-n, then a driver merge of
   * n·partitions candidates), never a global sort. The hash constants
   * differ from [[assignSplits]]'s so the sample is independent of
   * split assignment.
   */
  def deterministicSample(df: DataFrame, idCol: String, n: Int,
      a: Long = 69069L, b: Long = 362437L): DataFrame =
    df.withColumn("__u",
        pmod(pmod(col(idCol).cast("long"), lit(P31)) * lit(a) + lit(b), lit(P31)))
      .orderBy(col("__u"), col(idCol)).limit(n)
      .drop("__u")

  /**
   * Stratified deterministic sample: the `nPerGroup` smallest-hash
   * rows WITHIN each group — balanced representation across strata
   * (sources, languages, ...) regardless of how skewed the corpus is,
   * with the same reproducibility contract as
   * [[deterministicSample]]. One shuffle on the group columns; the
   * per-group top-n is a window rank, never a global sort.
   */
  def stratifiedSample(df: DataFrame, idCol: String, groupCols: Seq[String],
      nPerGroup: Int, a: Long = 69069L, b: Long = 362437L): DataFrame = {
    val u = pmod(pmod(col(idCol).cast("long"), lit(P31)) * lit(a) + lit(b), lit(P31))
    df.withColumn("__u", u)
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(groupCols.map(col): _*)
          .orderBy(col("__u"), col(idCol))))
      .filter(col("__rn") <= nPerGroup)
      .drop("__u", "__rn")
  }

  /**
   * Per-document mean inverse corpus frequency of its tokens — a
   * rarity / informativeness signal (→1 when every token is unique in
   * the corpus, →0 for boilerplate): score(d) = (Σ_t 1/freq(t)) / n_d.
   * Frequencies are an exact map-side-combinable wordcount; the
   * per-document sum is a POSITION-ORDERED left fold over the doc's
   * tokens, so the resulting double is bit-reproducible across engines
   * (IEEE division and addition in a deterministic order — never a
   * partition-order-dependent SQL sum).
   */
  def rarityScores(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = df.select(col(idCol),
        posexplode(TextFunctions.tokens(col(textCol))).as(Seq("__pos", "__tok")))
      .filter(col("__tok") =!= "")
    val freqs = tok.groupBy(col("__tok")).agg(count(lit(1)).as("__cnt"))
    tok.join(freqs, "__tok")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_scored"),
        array_sort(collect_list(struct(col("__pos"), col("__cnt")))).as("__l"))
      // unrounded: the position-ordered fold is bit-identical
      // cross-engine; rounding a half-boundary double is the one
      // observed divergence
      .withColumn("rarity",
        aggregate(col("__l"), lit(0.0d),
          (acc, s) => acc + lit(1.0d) / s.getField("__cnt").cast("double"))
          / col("n_scored").cast("double"))
      .select(col(idCol), col("n_scored"), col("rarity"))
  }

  /**
   * Within-document repetition signals (the MassiveText/Gopher-style
   * quality filters): per document, the fraction of its word-2-gram
   * occurrences claimed by the single most frequent 2-gram
   * (`top2_frac`) and the fraction of word-3-gram occurrences whose
   * gram occurs more than once in the document (`dup3_frac`). High
   * values flag looping/boilerplate text that near-dup passes miss
   * because the repetition is INSIDE one document, not across two.
   *
   * Shape for scale: a ZERO-SHUFFLE narrow map. Every gram of a
   * document lives in that document's own row, so the per-gram counts
   * never need a cluster-wide groupBy: one native expression
   * ([[graft.functions.RepetitionStats]]) tokenizes once and counts
   * both gram sizes in a per-row map bounded by the document's own
   * size. An explode + groupBy(doc, gram) shape would shuffle ~2
   * copies of every corpus token; this shape shuffles nothing,
   * parallelism is the scan's, and skew is bounded by the max document
   * size (which a curation pipeline already bounds) rather than by
   * gram distribution. N-grams follow
   * [[TextFunctions.wordShingles]] (shorter-than-n docs contribute the
   * whole text as one gram, making `top2_frac` 1.0 — a degenerate doc
   * IS all one gram).
   */
  def repetitionSignals(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    // one native pass: tokenize once, count both gram sizes in-row
    df.select(col(idCol),
        graft.functions.RepetitionStats.repetitionStats(
          TextFunctions.tokens(col(textCol))).as("__st"))
      .filter(col("__st").isNotNull)
      .select(col(idCol),
        (col("__st.top2").cast("double") / col("__st.tot2").cast("double"))
          .as("top2_frac"),
        (col("__st.dup3").cast("double") / col("__st.tot3").cast("double"))
          .as("dup3_frac"))
  }

  /**
   * Ids of `test` rows whose content fingerprint (whitespace-invariant
   * rolling hash, [[TextFunctions.fingerprint]]) appears anywhere in
   * `train` — the eval-contamination check run before any benchmark
   * score is trusted. Exact-match semantics on the fingerprint; pair
   * with the near-dup pipeline for fuzzier leakage.
   */
  def contamination(test: DataFrame, train: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val tf = test.select(col(idCol),
      TextFunctions.fingerprint(col(textCol)).as("__fp"))
    val rf = train.select(TextFunctions.fingerprint(col(textCol)).as("__fp"))
      .distinct()
    tf.join(rf, Seq("__fp"), "left_semi").select(col(idCol))
  }

  /**
   * Deterministic TOKEN-BUDGET sampling: keep documents in affine-hash
   * priority order (ties by id) until the cumulative whitespace-token
   * count reaches `budget` — "give me ~10 B tokens of this corpus,
   * reproducibly". A document is kept iff the running token total
   * THROUGH it stays <= budget.
   *
   * Scale shape — never a global sort or single-partition window: the
   * hash space splits into `buckets` ORDERED ranges; a tiny aggregate
   * (`buckets` rows) prefix-sums on the driver, and each bucket
   * independently window-scans only its own rows with its bucket's
   * offset added. Cross-bucket concatenation equals global (hash, id)
   * order because bucket boundaries are hash ranges; buckets whose
   * offset already exceeds the budget are pruned before the window
   * runs. Driver-side state is `buckets` longs — the same bounded
   * shape as the IVF centroid collect.
   */
  def tokenBudgetSample(df: DataFrame, idCol: String, textCol: String,
      budget: Long, buckets: Int = 64,
      a: Long = 69069L, b: Long = 362437L): DataFrame = {
    val width = (P31 + buckets - 1) / buckets
    val u = pmod(pmod(col(idCol).cast("long"), lit(P31)) * lit(a) + lit(b),
      lit(P31))
    val t = df.select(col(idCol), u.as("__u"),
        TextFunctions.tokenCount(col(textCol)).cast("long").as("__t"))
      .withColumn("__b", floor(col("__u") / lit(width)).cast("long"))
    val sums = t.groupBy(col("__b")).agg(sum(col("__t")).as("__s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    var acc = 0L
    val offsets = sums.keys.toSeq.sorted.map { bid =>
      val o = (bid, acc); acc += sums(bid); o
    }.filter(_._2 < budget) // a bucket starting past the budget keeps nothing
    val spark = df.sparkSession
    import spark.implicits._
    val offDf = offsets.toDF("__b", "__off")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__b")).orderBy(col("__u"), col(idCol))
    t.join(broadcast(offDf), Seq("__b"))
      .withColumn("__run", sum(col("__t")).over(w))
      .filter(col("__off") + col("__run") <= budget)
      .select(col(idCol), col("__t").as("n_tokens"))
  }

  /**
   * Deterministic TRAINING ORDER (epoch shuffle): every document gets
   * a global 0-based position under a seed-keyed hash permutation —
   * "shuffle the corpus for epoch `seed`, reproducibly, on any
   * cluster". Order is (u, id) with u = ((id mod P)·a + 362437) mod P
   * and a = (1103515245 + seed·2654435761) mod P: the multiplier is
   * LARGE so the product wraps mod P even for small contiguous ids (a
   * small multiplier like 69069 leaves any id range below ~31k
   * monotone — no shuffle at all), and the seed rescales it by a big
   * odd constant so epochs get genuinely different multipliers (a
   * seed added directly shifts u by only ±id, which almost never
   * swaps ranks). Each epoch is a different pseudo-random order;
   * re-runs are bit-stable.
   *
   * Scale shape — never a global sort: hash-range buckets count on the
   * driver (`buckets` longs), prefix-sum to per-bucket position
   * offsets, and each bucket independently ranks only its own rows.
   * Cross-bucket concatenation equals global (u, id) order because
   * bucket boundaries are hash ranges — the same two-phase prefix as
   * [[tokenBudgetSample]], ranking instead of token-summing.
   */
  def trainingOrder(df: DataFrame, idCol: String, seed: Long = 0L,
      buckets: Int = 64): DataFrame = {
    val width = (P31 + buckets - 1) / buckets
    val a = java.lang.Math.floorMod(1103515245L + seed * 2654435761L, P31)
    require(a != 0, s"degenerate seed $seed (multiplier 0 mod 2^31-1)")
    val u = pmod(pmod(col(idCol).cast("long"), lit(P31)) * lit(a) + lit(362437L),
      lit(P31))
    val t = df.select(col(idCol), u.as("__u"))
      .withColumn("__b", floor(col("__u") / lit(width)).cast("long"))
    val sums = t.groupBy(col("__b")).agg(count(lit(1)).as("__n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    var acc = 0L
    val offsets = sums.keys.toSeq.sorted.map { bid =>
      val o = (bid, acc); acc += sums(bid); o
    }
    val spark = df.sparkSession
    import spark.implicits._
    val offDf = offsets.toDF("__b", "__off")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__b")).orderBy(col("__u"), col(idCol))
    t.join(broadcast(offDf), Seq("__b"))
      .withColumn("__rn", row_number().over(w))
      .select(col(idCol), (col("__off") + col("__rn") - 1L).as("pos"))
  }

  /**
   * Gopher/MassiveText-style RULE-BASED quality filter — the document
   * keep/drop decision every corpus build runs BEFORE dedup: token
   * count in [minTokens, maxTokens], mean token length in
   * [minMeanTokLen, maxMeanTokLen] (garbage/binary text skews long,
   * char-soup skews short), stopword ratio >= minStopRatio (real prose
   * contains function words), and within-document repetition below the
   * Gopher thresholds (top-2-gram occupancy <= maxTop2Frac,
   * duplicated-3-gram fraction <= maxDup3Frac). Emits one row per
   * document with the per-rule verdicts and the combined `keep` —
   * keeping the rule booleans observable is deliberate (corpus builds
   * audit WHY documents drop; a bare filter would hide the histogram).
   *
   * Shape for scale: a ZERO-SHUFFLE narrow map — every signal
   * (including both repetition fractions, via the native
   * [[graft.functions.RepetitionStats]] pass) derives from the
   * document's own row. At 100 TB this is a single scan with no
   * exchange; compose with `.filter($"keep")` ahead of the dedup
   * stages so their shuffles only carry surviving documents.
   */
  def qualityFilter(df: DataFrame, idCol: String, textCol: String,
      minTokens: Long = 50L, maxTokens: Long = 100000L,
      minMeanTokLen: Double = 3.0, maxMeanTokLen: Double = 10.0,
      stopwords: Seq[String] = Seq("the", "a", "and", "of", "to"),
      minStopRatio: Double = 0.02,
      maxTop2Frac: Double = 0.20, maxDup3Frac: Double = 0.18): DataFrame = {
    val st = graft.functions.RepetitionStats.repetitionStats(
      TextFunctions.tokens(col(textCol)))
    df.select(col(idCol),
        TextFunctions.tokenCount(col(textCol)).cast("long").as("__n"),
        TextFunctions.meanTokenLen(col(textCol)).as("__mtl"),
        TextFunctions.stopwordRatio(col(textCol), stopwords).as("__stop"),
        st.as("__st"))
      .select(col(idCol),
        (col("__n") >= minTokens && col("__n") <= maxTokens).as("ok_len"),
        (col("__mtl") >= minMeanTokLen && col("__mtl") <= maxMeanTokLen)
          .as("ok_wordlen"),
        (col("__stop") >= minStopRatio).as("ok_stop"),
        (col("__st.top2").cast("double") / col("__st.tot2").cast("double")
          <= maxTop2Frac
          && col("__st.dup3").cast("double") / col("__st.tot3").cast("double")
          <= maxDup3Frac).as("ok_rep"))
      .withColumn("keep",
        col("ok_len") && col("ok_wordlen") && col("ok_stop") && col("ok_rep"))
  }

  /**
   * Deterministic DATA-MIXTURE sampling: per-source token budgets —
   * "30% web, 30% code, 40% books" realized as absolute token targets —
   * kept reproducibly. Within EACH source, documents are taken in
   * affine-hash priority order (ties by id) until that source's running
   * token total reaches its budget; sources absent from `budgets`
   * contribute nothing. The keep rule matches [[tokenBudgetSample]]
   * exactly, applied per source: a document is kept iff the running
   * total THROUGH it stays <= the source's budget.
   *
   * Scale shape — the same bucketed two-phase prefix as
   * [[tokenBudgetSample]], keyed by (source, bucket): a tiny aggregate
   * (sources x buckets rows) prefix-sums per source on the driver, and
   * each (source, bucket) cell independently window-scans only its own
   * rows with its cell's offset added. Never a global sort; never a
   * per-source single-partition window — a 100 TB source spreads over
   * `buckets` cells. Cells whose offset already exceeds their source's
   * budget are pruned before the window runs.
   */
  def mixtureSample(df: DataFrame, idCol: String, textCol: String,
      sourceCol: String, budgets: Map[String, Long], buckets: Int = 64,
      a: Long = 69069L, b: Long = 362437L): DataFrame = {
    require(budgets.nonEmpty, "mixtureSample needs at least one source budget")
    val width = (P31 + buckets - 1) / buckets
    val u = pmod(pmod(col(idCol).cast("long"), lit(P31)) * lit(a) + lit(b),
      lit(P31))
    val t = df
      .filter(col(sourceCol).isInCollection(budgets.keys.toSeq))
      .select(col(idCol), col(sourceCol), u.as("__u"),
        TextFunctions.tokenCount(col(textCol)).cast("long").as("__t"))
      .withColumn("__b", floor(col("__u") / lit(width)).cast("long"))
    val sums = t.groupBy(col(sourceCol), col("__b"))
      .agg(sum(col("__t")).as("__s"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val offsets = sums.keys.groupBy(_._1).toSeq.flatMap { case (src, cells) =>
      var acc = 0L
      cells.toSeq.map(_._2).sorted.map { bid =>
        val o = (src, bid, acc, budgets(src)); acc += sums((src, bid)); o
      }
    }.filter { case (_, _, off, budget) => off < budget }
    val spark = df.sparkSession
    import spark.implicits._
    val offDf = offsets.toDF(sourceCol, "__b", "__off", "__budget")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(sourceCol), col("__b")).orderBy(col("__u"), col(idCol))
    t.join(broadcast(offDf), Seq(sourceCol, "__b"))
      .withColumn("__run", sum(col("__t")).over(w))
      .filter(col("__off") + col("__run") <= col("__budget"))
      .select(col(idCol), col(sourceCol), col("__t").as("n_tokens"))
  }

  /**
   * Train-side decontamination by n-gram collision (the GPT-3-style
   * eval-leakage rule): ids of `train` rows sharing ANY word n-gram
   * (default n=13) with any `test` row — looser than
   * [[contamination]]'s exact-fingerprint match, catching partial
   * quotes and truncated copies.
   *
   * Scale shape: the test side reduces to DISTINCT n-gram hashes and is
   * broadcast (eval sets are tiny next to a 100 TB train corpus); the
   * train side streams (id, hash) through a broadcast semi-join — the
   * corpus never shuffles. Hashes ride
   * [[TextFunctions.shingleHashes]] (31-bit rolling polynomial,
   * oracle-replicable; shingle strings never materialize).
   */
  def contaminationNgram(test: DataFrame, train: DataFrame,
      idCol: String, textCol: String, n: Int = 13): DataFrame = {
    val tg = test
      .select(explode(TextFunctions.shingleHashes(col(textCol), n)).as("__h"))
      .distinct()
    train
      .select(col(idCol),
        explode(TextFunctions.shingleHashes(col(textCol), n)).as("__h"))
      .join(broadcast(tg), Seq("__h"), "left_semi")
      .select(col(idCol)).distinct()
  }

  /** One reduce task per shard: the greedy fold is sequential within a
    * shard, so shard identity IS the partition. */
  private final class ShardPartitioner(n: Int)
      extends org.apache.spark.Partitioner {
    override def numPartitions: Int = n
    override def getPartition(key: Any): Int =
      key.asInstanceOf[(Long, Long)]._1.toInt
  }

  /**
   * Greedy SEQUENCE PACKING for training batches: documents hash into
   * shards (the same affine arithmetic as [[assignSplits]] —
   * partition/order/run-invariant), and within each shard the docs are
   * scanned in id order, opening a new bin whenever the next document's
   * token count exceeds the bin's remaining capacity; an oversize
   * document (tokens > capTokens) occupies a bin of its own. Returns
   * (id, shard, bin, n_tokens) — bin ids are 1-based per shard.
   *
   * Deterministic on any cluster: the shard hash and in-shard order fix
   * the scan, so the DuckDB oracle replays the greedy fold exactly
   * (recursive CTE).
   *
   * Scale shape: the shuffle carries only (id, shard, tokens) triples —
   * never the payload — into a SECONDARY SORT
   * (`repartitionAndSortWithinPartitions` on (shard, id), one reduce
   * partition per shard), and the greedy fold STREAMS over each
   * partition's sort-merged iterator. No shard is ever materialized on
   * a task's heap (the sorter spills), so a skewed or huge shard costs
   * disk, not OOM. Parallelism equals the shard count; `shards = 0`
   * (the default) derives one shard per ~1M documents (min 16) so the
   * task count scales with the corpus instead of pinning at a
   * constant.
   */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
      capTokens: Long = 2048, shards: Int = 0,
      a: Long = 1103515245L, b: Long = 12345L): DataFrame = {
    require(capTokens > 0 && shards >= 0,
      "capTokens must be positive; shards must be >= 0 (0 = derive from size)")
    val spark = df.sparkSession
    import spark.implicits._
    val nShards =
      if (shards > 0) shards
      else math.max(16L, math.min(1L << 18, df.count() / 1000000L + 1L)).toInt
    val keyed = df.select(col(idCol).cast("long"),
        pmod(pmod(col(idCol).cast("long"), lit(P31)) * lit(a) + lit(b), lit(P31))
          .mod(lit(nShards.toLong)),
        TextFunctions.tokenCount(col(textCol)).cast("long"))
      .as[(Long, Long, Long)].rdd
      .map { case (id, shard, t) => ((shard, id), t) }
    implicit val pairOrd: Ordering[(Long, Long)] =
      Ordering.Tuple2(Ordering.Long, Ordering.Long)
    val sorted = keyed.repartitionAndSortWithinPartitions(new ShardPartitioner(nShards))
    spark.createDataset(sorted.mapPartitions { it =>
      // streaming greedy fold: one pass, O(1) state, no buffering
      var bin = 0L
      var remaining = -1L
      it.map { case ((shard, id), t) =>
        if (bin == 0L || t > remaining) { bin += 1; remaining = capTokens }
        remaining -= t
        (id, shard, bin, t)
      }
    }).toDF(idCol, "shard", "bin", "n_tokens")
  }
}
