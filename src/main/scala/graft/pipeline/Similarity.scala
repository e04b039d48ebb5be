package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import Dedup.dotCols

/**
 * Approximate-nearest-neighbor search over an embedding column.
 *
 *  - [[bruteTopK]] / [[bruteAbove]]: exact cosine against every row —
 *    the correctness baseline (one scan, no shuffle until the final
 *    top-k, which is `TakeOrderedAndProject`).
 *  - [[lshTopK]]: sign-random-projection bucketing; the query probes
 *    only its own bucket plus all buckets within hamming distance 1
 *    (multiprobe), turning a full scan into a >100× partition-pruned
 *    probe at scale.
 */
object Similarity {

  private def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** Normalized query literal: dividing by the query norm up front
    * turns per-row cosine into dot/row-norm. */
  private def queryLit(q: Array[Double]): Column = {
    val n = math.sqrt(q.map(x => x * x).sum)
    typedLit(q.map(_ / n).toSeq)
  }

  /** Per-row cosine against a pre-normalized query: one dot product and
    * one row-norm, staged so the norm subtree isn't duplicated. */
  private def cosTo(df: DataFrame, idCol: String, vecCol: String,
      query: Array[Double]): DataFrame =
    df.select(col(idCol), asDouble(col(vecCol)).as("__v"))
      .select(col(idCol), (dotCols(col("__v"), queryLit(query)) /
        sqrt(dotCols(col("__v"), col("__v")))).as("cos"))

  /** Exact top-k by cosine (ties broken by id for determinism). */
  def bruteTopK(df: DataFrame, idCol: String, vecCol: String,
      query: Array[Double], k: Int): DataFrame =
    cosTo(df, idCol, vecCol, query)
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
      .select(col(idCol), round(col("cos"), 2).as("cos"))

  /** All rows with cosine above a threshold (order-free, oracle-friendly). */
  def bruteAbove(df: DataFrame, idCol: String, vecCol: String,
      query: Array[Double], threshold: Double): DataFrame =
    cosTo(df, idCol, vecCol, query)
      .filter(col("cos") > threshold)
      .select(col(idCol), round(col("cos"), 2).as("cos"))

  /**
   * Bucketed approximate top-k with L independent SRP hash tables
   * (standard multi-table LSH): a row is a candidate if ANY table puts
   * it in the query's bucket or a hamming-1 neighbor (multiprobe). At
   * scale each table is a pre-bucketed join key, so the query touches
   * a small fraction of partitions instead of scanning everything.
   * Recall is tested against [[bruteTopK]] in the spec.
   */
  def lshTopK(df: DataFrame, idCol: String, vecCol: String,
      query: Array[Double], k: Int, dim: Int, bits: Int = 6,
      tables: Int = 6): DataFrame = {
    val v = df.select(col(idCol), asDouble(col(vecCol)).as("__v"))
    val isCandidate = (0 until tables).map { t =>
      val rowKey = Dedup.srpKeyTable(col("__v"), dim, bits, t)
      val qKey = signKeyTable(query, dim, bits, t)
      val probes = qKey +: (0 until bits).map(j => qKey ^ (1L << j))
      rowKey.isin(probes: _*)
    }.reduce(_ || _)
    v.filter(isCandidate)
      .withColumn("cos", dotCols(col("__v"), queryLit(query)) /
        sqrt(dotCols(col("__v"), col("__v"))))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
      .select(col(idCol), round(col("cos"), 2).as("cos"))
  }

  /** Driver-side SRP key of a query vector (same planes as the row-side
    * [[Dedup.srpKeyTable]]). */
  private def signKeyTable(q: Array[Double], dim: Int, bits: Int, table: Int): Long = {
    val planes = Dedup.planesForTable(dim, bits, table)
    planes.zipWithIndex.foldLeft(0L) { case (acc, (plane, j)) =>
      val d = q.zip(plane).map { case (x, p) => x * p }.sum
      if (d > 0) acc | (1L << j) else acc
    }
  }
}
