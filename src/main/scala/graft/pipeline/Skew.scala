package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Skew-mitigation utilities. Spark's partial aggregation already
 * absorbs most groupBy skew map-side, and AQE splits skewed join
 * partitions at runtime — but a pathologically hot key in a
 * high-cardinality aggregation (or any agg where partial aggregation
 * is disabled/ineffective, e.g. exact distinct counting) still lands
 * on one reducer. Salting splits each hot key across `saltBuckets`
 * reducers and recombines in a second, tiny aggregation.
 */
object Skew {

  /**
   * Salted two-phase sum/count aggregation: phase 1 groups by
   * (keys, salt) spreading each key over `saltBuckets` reducers;
   * phase 2 recombines per key. Output: keys ++ {sum_<col>, cnt}.
   * The salt is derived from a hash of the whole row's random-ish
   * column rather than rand() so results stay deterministic.
   */
  def saltedSumCount(df: DataFrame, keys: Seq[String], sumCol: String,
      saltBuckets: Int = 16): DataFrame = {
    // Salt from a per-row id, NOT a row-content hash: hashing columns
    // would send fully IDENTICAL duplicate rows (a common skew shape in
    // raw training data) to one bucket, defeating the salt.
    // monotonically_increasing_id is deterministic for a fixed partition
    // layout, which keeps the phase-1 plan re-executable; the final
    // per-key result is salt-independent either way.
    val salt = pmod(xxhash64(monotonically_increasing_id()), lit(saltBuckets))
    val phase1 = df
      .withColumn("__salt", salt)
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(sum(col(sumCol)).as("__psum"), count(lit(1)).as("__pcnt"))
    phase1
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__psum")).as(s"sum_$sumCol"), sum(col("__pcnt")).as("cnt"))
  }

  /** Deterministic salt column for salted JOINS: replicate the small
    * side `saltBuckets` times (explode) and salt the big side's key, so
    * one hot key spreads over `saltBuckets` tasks. */
  def saltColumn(saltBuckets: Int, cols: Column*): Column =
    pmod(xxhash64(cols: _*), lit(saltBuckets))

  /** Explode a small dimension table into `saltBuckets` replicas keyed
    * by (key, salt) — join it against a salted fact side. */
  def replicateForSalt(dim: DataFrame, saltBuckets: Int): DataFrame =
    dim.withColumn("__salt",
      explode(sequence(lit(0L), lit(saltBuckets - 1L))))
}
