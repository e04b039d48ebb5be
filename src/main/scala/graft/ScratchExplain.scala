package graft

import org.apache.spark.sql.SparkSession

object ScratchExplain extends App {
  val spark = SparkSession.builder().master("local[8]")
    .config("spark.sql.shuffle.partitions", 8)
    .config("spark.ui.enabled", "false").getOrCreate()
  spark.sparkContext.setLogLevel("ERROR")
  val dir = "/root/testdata/sf0.01"
  for (name <- Seq("q1_agg", "q3_topk", "q5_join", "q_asof_join", "dedup_exact_keep", "q_events_window")) {
    val plan = SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString
    val exch = plan.linesIterator.count(_.contains("Exchange"))
    val bcast = plan.linesIterator.count(_.contains("BroadcastExchange"))
    val pushed = plan.linesIterator.filter(_.contains("PushedFilters")).take(3).mkString(" | ")
    println(s"=== $name exchanges=$exch broadcasts=$bcast")
    println(s"    pushed: ${pushed.take(300)}")
    val wsc = plan.linesIterator.count(_.contains("WholeStageCodegen"))
    println(s"    wholestagecodegen spans: $wsc")
  }
  spark.stop()
}
