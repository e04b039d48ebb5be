package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Distributed band/range join: pair left rows with right rows whose
 * numeric value falls inside a per-left-row interval
 * `[lo(left), hi(left)]`.
 *
 * A naive formulation is a cartesian product with an inequality filter
 * (Catalyst plans `BroadcastNestedLoopJoin` — O(|L|·|R|)). This
 * operator bucketizes instead (composition, not a custom physical
 * node): right rows land in one bucket of width `bucketWidth`; each
 * left interval explodes to the buckets it overlaps; an EQUI-join on
 * the bucket id finds candidates and the exact predicate filters.
 * Cost: O(|L|·(span/width) + |R|) shuffled rows and a hash join, so it
 * scales like a normal join as long as intervals span few buckets —
 * choose `bucketWidth` of the order of the typical interval length.
 */
object RangeJoin {

  /**
   * @param left          left table
   * @param lo, hi        Columns over `left` giving the inclusive interval
   * @param right         right table
   * @param rVal          right numeric column to test against the interval
   * @param bucketWidth   bucket size in `rVal` units
   * @return left columns ++ right columns for each (left, right) pair
   *         with `lo <= rVal <= hi`
   */
  def bandJoin(left: DataFrame, lo: Column, hi: Column,
      right: DataFrame, rVal: String, bucketWidth: Double): DataFrame = {
    val lb = left
      .withColumn("__lo", lo)
      .withColumn("__hi", hi)
      .withColumn("__b", explode(sequence(
        floor(col("__lo") / bucketWidth).cast("long"),
        floor(col("__hi") / bucketWidth).cast("long"))))
    val rb = right.withColumn("__b",
      floor(col(rVal) / bucketWidth).cast("long"))
    lb.join(rb, "__b")
      .filter(col(rVal) >= col("__lo") && col(rVal) <= col("__hi"))
      .drop("__b", "__lo", "__hi")
  }
}
