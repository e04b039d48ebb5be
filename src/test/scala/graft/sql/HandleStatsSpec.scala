package graft.sql

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSessionFixture

/** Handle statistics reach Catalyst: a handle-backed relation reports
  * its exact memoized row count × default row width as `sizeInBytes`,
  * so JoinSelection broadcasts a small handle in a mixed plan WITHOUT
  * a hint (a v1 relation without the override reports
  * `defaultSizeInBytes` = effectively infinite and always sort-merges). */
class HandleStatsSpec extends AnyFunSuite {

  private lazy val spark = SparkSessionFixture.spark
  import spark.implicits._

  test("optimizedPlan stats reflect the handle's exact cardinality") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val small = (1L to 100L).map(k => (k, s"n$k")).toDF("k", "name")
    val big = (1L to 50000L).map(k => (k, s"n$k")).toDF("k", "name")
    val hs = IndexedFrame.index(small, "k", numPartitions = 4)
    val hb = IndexedFrame.index(big, "k", numPartitions = 4)
    val ss = hs.toDF.queryExecution.optimizedPlan.stats.sizeInBytes
    val sb = hb.toDF.queryExecution.optimizedPlan.stats.sizeInBytes
    assert(ss > 0 && sb > 0)
    // 500× the rows must read ~500× the bytes (same schema)
    assert(sb / ss === 500)
    // and nowhere near the "unknown size" default that blocks broadcast
    assert(ss < (1L << 20), s"small handle reported $ss bytes")
  }

  test("small handle joining a plain table picks BroadcastHashJoin unhinted") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    // q5 shape: a small indexed dimension against a plain fact table,
    // joined on a NON-key column so no indexed strategy intercepts —
    // the vanilla planner must decide, and it can only broadcast the
    // handle if the relation reports a real size
    val dim = (1L to 200L).map(k => (k, k % 11, s"d$k")).toDF("k", "grp", "dname")
    val fact = (1L to 60000L).map(i => (i, i % 11, i * 1.5))
      .toDF("fid", "fgrp", "amt")
    val h = IndexedFrame.index(dim, "k", numPartitions = 4)
    val joined = fact.join(h.toDF, $"fgrp" === $"grp")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected unhinted broadcast of the handle side:\n$plan")
    assert(joined.count() === fact.join(dim, $"fgrp" === $"grp").count())
  }

  test("reloaded handles answer stats from the persisted save-time count") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val path = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), "graft_statsspec_count").toString
    new scala.reflect.io.Directory(new java.io.File(path)).deleteRecursively()
    val df = (1L to 1234L).map(k => (k, s"v$k")).toDF("k", "v")
    IndexedFrame.save(IndexedFrame.index(df, "k", numPartitions = 4), path)
    val h = IndexedFrame.load(spark, path)
    // the save-time count rode back in the _count sidecar: planning a
    // reloaded 100 TB table must never launch a counting job
    assert(h.presetStatsCount === Some(1234L))
    val size = h.toDF.queryExecution.optimizedPlan.stats.sizeInBytes
    assert(size === BigInt(1234L * (h.schema.map(_.dataType.defaultSize).sum + 8L)))
  }

  test("huge estimated handle does not broadcast under a tiny threshold") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1024")
      val dim = (1L to 5000L).map(k => (k, k % 11, s"d$k")).toDF("k", "grp", "dname")
      val fact = (1L to 10000L).map(i => (i, i % 11)).toDF("fid", "fgrp")
      val h = IndexedFrame.index(dim, "k", numPartitions = 4)
      val joined = fact.join(h.toDF, $"fgrp" === $"grp")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin"),
        s"5000-row handle (~200KB) must not broadcast under a 1KB threshold:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
