package graft.sql

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSessionFixture

/** Co-located joins via bucketed tables: pre-bucketing both sides on
  * the join key lets Catalyst's EnsureRequirements elide the exchanges
  * entirely — the SQL-surface equivalent of IndexedRDD's co-partitioned
  * narrow joins, and the standard way to amortize one shuffle across
  * many joins at 100 TB. */
class BucketingSpec extends AnyFunSuite {

  private lazy val spark = SparkSessionFixture.spark
  import spark.implicits._

  test("join of two tables bucketed on the key plans no shuffle exchange") {
    val dir = "/root/testdata/sf0.001"
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
    try {
      spark.sql("DROP TABLE IF EXISTS b_cust")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.read.parquet(s"$dir/customer.parquet")
        .write.bucketBy(4, "c_custkey").sortBy("c_custkey")
        .mode("overwrite").saveAsTable("b_cust")
      spark.read.parquet(s"$dir/orders.parquet")
        .write.bucketBy(4, "o_custkey").sortBy("o_custkey")
        .mode("overwrite").saveAsTable("b_orders")

      val joined = spark.table("b_cust")
        .join(spark.table("b_orders"), $"c_custkey" === $"o_custkey")
      val exchanges = joined.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(exchanges.isEmpty,
        s"expected exchange-free bucketed join, got:\n${joined.queryExecution.executedPlan}")
      // and it still computes the right thing
      assert(joined.count() ===
        spark.read.parquet(s"$dir/orders.parquet").count())
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS b_cust")
      spark.sql("DROP TABLE IF EXISTS b_orders")
    }
  }
}
