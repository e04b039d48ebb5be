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
}
