package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Distributed as-of join, composed from built-ins (union + carry-forward
 * window — preference order (a) from the build brief: no custom physical
 * operator is needed because Catalyst's window machinery already
 * expresses the semantics with ONE shuffle on the join key).
 *
 * For each left row, attaches the value of the LATEST right row with the
 * same key and `rightTime <= leftTime` (null when no such row — left-join
 * semantics). Equal timestamps count as "at or before" (right rows sort
 * before left rows at the same instant).
 *
 * Scale: one hash shuffle of `|left| + |right|` rows on the key, then a
 * per-key time sort — the same cost envelope as any keyed window; skewed
 * keys can be pre-split with [[graft.pipeline.Skew]] helpers.
 */
object AsOf {

  /**
   * @param outCol name of the appended carried-forward value column
   * @return `left`'s columns plus `outCol`
   */
  def asofJoinLast(left: DataFrame, lKey: String, lTime: String,
      right: DataFrame, rKey: String, rTime: String, rVal: String,
      outCol: String): DataFrame = {
    val rValType = right.schema(rVal).dataType
    val leftCols = left.columns.toSeq
    val lFull = left
      .select(Seq[Column](col(lKey).cast(right.schema(rKey).dataType).as("__k"),
        col(lTime).as("__t"), lit(1).as("__isL"),
        lit(null).cast(rValType).as("__rv")) ++ leftCols.map(col): _*)
    val rFull = right
      .select(Seq[Column](col(rKey).as("__k"), col(rTime).as("__t"),
        lit(0).as("__isL"), col(rVal).as("__rv")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__isL"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lFull.unionByName(rFull)
      .withColumn(outCol, last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__isL") === 1)
      .select(leftCols.map(col) :+ col(outCol): _*)
  }
}
