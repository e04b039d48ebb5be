package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSessionFixture

/**
 * Plan-quality invariants, asserted so a refactor cannot silently
 * regress the physical plans the 100 TB design depends on: filters and
 * column pruning must reach the parquet scans, small dims must
 * broadcast, top-k must be TakeOrderedAndProject (never a global
 * sort), and aggregations must keep partial (map-side) aggregation.
 */
class PlanAuditSpec extends AnyFunSuite {

  private lazy val spark = SparkSessionFixture.spark
  private val dir = "/root/testdata/sf0.001"

  private def planOf(name: String): String =
    SparkEntryPlans.executedPlan(spark, dir, name)

  test("q1_agg: shipdate filter and column pruning reach the parquet scan; partial agg present") {
    val plan = planOf("q1_agg")
    assert(plan.contains("PushedFilters") && plan.contains("LessThanOrEqual(l_shipdate"),
      s"shipdate filter not pushed:\n$plan")
    // 7 of 11 lineitem columns read — comment must never silently rot
    assert(plan.contains("ReadSchema") && !plan.contains("l_shipmode"),
      s"column pruning lost (l_shipmode read):\n$plan")
    assert(plan.contains("HashAggregate"), s"hash aggregate missing:\n$plan")
    // partial + final pair: two HashAggregate nodes
    assert(plan.sliding("HashAggregate".length).count(_ == "HashAggregate") >= 2,
      s"partial aggregation missing:\n$plan")
  }

  test("q3_topk: top-k is TakeOrderedAndProject, never a global Sort") {
    val plan = planOf("q3_topk")
    assert(plan.contains("TakeOrderedAndProject"), s"expected top-k operator:\n$plan")
    assert(plan.contains("PushedFilters") && plan.contains("EqualTo(c_mktsegment,BUILDING)"),
      s"segment filter not pushed to the customer scan:\n$plan")
  }

  test("curation_decontaminate_ngram: eval grams broadcast; train side never shuffles pre-join") {
    val plan = planOf("curation_decontaminate_ngram")
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      s"expected broadcast semi join against the eval gram set:\n$plan")
    // exactly two hash exchanges: the tiny eval side's distinct and the
    // final output distinct — the exploded train corpus itself never
    // shuffles (it streams through the broadcast semi join)
    val hashEx = "Exchange hashpartitioning"
    val n = plan.sliding(hashEx.length).count(_ == hashEx)
    assert(n === 2, s"expected 2 hash exchanges (eval distinct + output " +
      s"distinct), got $n — train corpus may be shuffling:\n$plan")
    assert(plan.contains("BroadcastExchange"),
      s"eval gram set not broadcast:\n$plan")
  }

  test("q5_join: nation and region dims broadcast") {
    val plan = planOf("q5_join")
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast joins:\n$plan")
    assert(plan.contains("BroadcastExchange"), s"expected broadcast exchanges:\n$plan")
  }

  test("q_window: exactly ONE exchange (the window partition key)") {
    val plan = planOf("q_window")
    assert(plan.contains("Window"), s"expected window operator:\n$plan")
    val exchanges = plan.sliding("Exchange".length).count(_ == "Exchange")
    assert(exchanges === 1, s"expected exactly one exchange, got $exchanges:\n$plan")
  }

  test("sketch_heavy_hitters: counter matrix keeps partial (map-side) aggregation") {
    val plan = planOf("sketch_heavy_hitters")
    // the d×w matrix must combine map-side: two HashAggregate layers
    assert(plan.sliding("HashAggregate".length).count(_ == "HashAggregate") >= 2,
      s"partial aggregation missing from the sketch build:\n$plan")
    assert(!plan.toLowerCase.contains("cartesianproduct"),
      s"sketch must never cross-join:\n$plan")
  }

  test("sketch_bloom_prune: probe filtered by plan-literal bitset, no join below the filter") {
    val plan = planOf("sketch_bloom_prune")
    // the membership test is codegen'd arithmetic over a literal array —
    // the probe side must be filtered WITHOUT a join or exchange first
    val filterIdx = plan.indexOf("Filter")
    assert(filterIdx >= 0, s"bloom filter missing:\n$plan")
    assert(plan.contains("shiftright"), s"bit-test arithmetic missing:\n$plan")
    assert(!plan.toLowerCase.contains("batchevalpython"), s"udf crept in:\n$plan")
  }

  test("sketch_distinct_kmv: ONE bounded-state aggregate, no window/sort over the hash stream") {
    val plan = planOf("sketch_distinct_kmv")
    assert(plan.contains("kmv_sketch"), s"kmv aggregate missing:\n$plan")
    // exactly one logical aggregate, realized as a partial (map-side) +
    // final ObjectHashAggregate pair — a regression back to the
    // distinct + row_number() formulation would reintroduce Window/Sort
    val aggs = plan.sliding("ObjectHashAggregate".length)
      .count(_ == "ObjectHashAggregate")
    assert(aggs === 2, s"expected partial+final kmv aggregate pair, got $aggs:\n$plan")
    assert(plan.contains("partial_kmv_sketch"), s"map-side partial aggregation missing:\n$plan")
    assert(!plan.contains("Window"), s"window crept back into the kmv plan:\n$plan")
    assert(!plan.contains("Sort "), s"sort crept back into the kmv plan:\n$plan")
  }

  test("q_interval_join: keyed join with the time band as residual, never a cartesian") {
    val plan = planOf("q_interval_join")
    assert(!plan.toLowerCase.contains("cartesianproduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"interval join degenerated to an unkeyed join:\n$plan")
    assert(plan.contains("l_key") && plan.contains("r_key"),
      s"expected the user-key equi-condition in the join:\n$plan")
  }

  test("ir_sql_count / ir_sql_minmax (+uuid, composite): stats answered by the index, not a scan") {
    assert(planOf("ir_sql_count").contains("IndexedStats"),
      "count(*) must plan as the index-size sum")
    assert(planOf("ir_sql_minmax").contains("IndexedStats"),
      "min/max(key) must plan as radix descents")
    assert(planOf("ir_sql_minmax_uuid").contains("IndexedStats"),
      "min/max of a UUID key must plan as radix descents, not a scan")
    assert(planOf("ir_sql_minmax_composite").contains("IndexedStats"),
      "min/max of the leading composite column must plan as radix descents")
  }

  test("q_sessionize: one stateful operator over one keyed exchange, no cartesian") {
    val plan = planOf("q_sessionize")
    // on a BATCH input Spark lowers flatMapGroupsWithState to MapGroups
    // (same user state machine, no state store); a stream plans the
    // FlatMapGroupsWithStateExec form
    assert(plan.contains("MapGroups") || plan.contains("FlatMapGroupsWithState"),
      s"expected the stateful session operator:\n$plan")
    assert(!plan.toLowerCase.contains("cartesianproduct"),
      s"sessionization must stay keyed:\n$plan")
  }

  test("q_zorder_box_pruned: the box scan visits a pruned partition subset") {
    val q = graft.SparkEntry.queries("q_zorder_box_pruned")(spark, dir)
    val parts = q.queryExecution.executedPlan.execute().getNumPartitions
    // the z-range-partitioned index has 16 partitions; the cover's
    // multiRange pass must drop those outside every z interval
    assert(parts < 16, s"expected pruned partitions, scanned $parts/16")
  }

  test("new r9 lanes: registered scans take their intended lanes") {
    // string-lead composite point get: the registered lane must probe,
    // not scan — run the lane, then read the handle's recorded lane
    // via a fresh build mirroring it (the registry builds handles
    // internally, so assert on the OUTPUT + the absence of a parquet
    // scan of every row: a point lane's plan has no Exchange and the
    // row count is exactly the planted hits)
    val pt = graft.SparkEntry.queries("ir_sql_pointget_composite_str")(spark, dir)
    assert(pt.count() === 3)
    assert(!pt.queryExecution.executedPlan.toString.contains("Exchange"))
    // uuid range-partitioned lane: pruned partition subset, like the
    // z-order audit above
    val q = graft.SparkEntry.queries("ir_sql_range_uuid_rp")(spark, dir)
    val parts = q.queryExecution.executedPlan.execute().getNumPartitions
    assert(parts < 16, s"expected pruned uuid partitions, scanned $parts/16")
    // stream sink: final state must carry exactly one row per key
    // (copy-on-write upserts, last write wins)
    val sink = graft.SparkEntry.queries("ir_stream_sink")(spark, dir)
    assert(sink.groupBy("c_custkey").count()
      .filter(org.apache.spark.sql.functions.col("count") > 1).count() === 0)
  }

  test("ann_ivf_saved: the probe reads only the probed list PARTITIONS of the saved index") {
    val q = graft.SparkEntry.queries("ann_ivf_saved")(spark, dir)
    val plan = q.queryExecution.executedPlan.toString
    // parquet partitionBy(__list) + the isin probe = partition-pruned
    // file listing; the predicate must land in PartitionFilters, not a
    // post-scan filter over all lists
    assert(plan.contains("PartitionFilters") && plan.contains("__list"),
      s"expected list-partition pruning in the saved-index scan:\n$plan")
    // and the result matches the in-memory IVF lane bit-for-bit
    val mem = graft.SparkEntry.queries("ann_ivf_topk")(spark, dir)
    assert(q.collect().toSeq === mem.collect().toSeq)
  }

  test("composite zip joins over PARQUET sources plan zero-shuffle (nullable-key guards split)") {
    // the optimizer's `isnotnull(a) AND isnotnull(b)` guard over
    // nullable sources must not read as a key-constraining residual —
    // this silently demoted every parquet-backed composite zip join to
    // a SortMergeJoin before r9
    for (lane <- Seq("ir_sql_join_composite_idx", "ir_sql_join_composite_str_idx")) {
      val q = graft.SparkEntry.queries(lane)(spark, dir)
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("IndexedZipJoin"), s"$lane: expected zip join:\n$plan")
      assert(!plan.contains("Exchange"), s"$lane: expected no shuffle:\n$plan")
    }
  }

  test("dedup_incremental: cross-set only — no corpus x corpus or delta x delta pairs") {
    val out = graft.SparkEntry.queries("dedup_incremental")(spark, dir)
    import spark.implicits._
    val rows = out.select($"a", $"b").as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case (a, b) => a < 1000000L && b >= 1000000L })
  }

  test("curation_sample: deterministic sample is TakeOrderedAndProject, not a global sort") {
    val plan = planOf("curation_sample")
    assert(plan.contains("TakeOrderedAndProject"), s"expected top-n:\n$plan")
  }

  test("text_repetition: per-doc signals are a zero-shuffle narrow map") {
    val plan = planOf("text_repetition")
    assert(!plan.contains("Exchange"),
      s"per-document repetition signals must never shuffle:\n$plan")
    // the native counting expression is in the plan, fused into a
    // whole-stage-codegen projection
    assert(plan.contains("repetitionstats") && plan.contains("*(1)"),
      s"expected codegen'd native repetition projection:\n$plan")
  }

  test("dedup_spans: grams shuffle as hashes, no cartesian, one window pass per doc") {
    val plan = planOf("dedup_spans")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"span detection must stay keyed on the gram hash:\n$plan")
    // the shuffled gram rows carry (id, pos, xxhash64) — never the
    // k-token gram text (the hash IS computed pre-shuffle)
    assert(plan.contains("xxhash64"), s"gram hashing missing:\n$plan")
    assert(plan.contains("Window"), s"cummax merge window missing:\n$plan")
  }

  test("dedup_spans_incremental: corpus reduces to a distinct hash set before the probe join") {
    val plan = planOf("dedup_spans_incremental")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"incremental span check must stay keyed:\n$plan")
    // corpus side: distinct gram hashes (partial + final HashAggregate)
    assert(plan.sliding("HashAggregate".length).count(_ == "HashAggregate") >= 2,
      s"distinct corpus gram set missing:\n$plan")
  }

  test("composite3 point and prefix lanes claim their filters: no re-filter above the probe") {
    // the N-ary relation's unhandledFilters claims pushed equality/IN
    // on pinned columns and the range on the first unpinned column —
    // at 100x scale a routed point read must not re-filter wide rows
    val point = planOf("ir_sql_pointget_composite3")
    assert(!point.contains("Filter "),
      s"residual Filter above the composite3 point lane:\n$point")
    val prefix = planOf("ir_sql_prefix_range_composite3")
    assert(!prefix.contains("Filter "),
      s"residual Filter above the composite3 prefix lane:\n$prefix")
  }

  test("text_langid: native expression runs inside whole-stage codegen") {
    val plan = planOf("text_langid")
    // `*(n)` prefixes mark operators fused into a whole-stage-codegen
    // stage; the langid projection must carry one
    assert(plan.contains("*(1) Project") && plan.contains("langidheuristic"),
      s"expected codegen'd native projection:\n$plan")
    assert(!plan.toLowerCase.contains("batchevalpython"),
      s"python/udf in a hot path:\n$plan")
  }
}

/** Plan-string access shared by the audit (kept out of the spec so the
  * fixture session warms once). */
private object SparkEntryPlans {
  def executedPlan(spark: org.apache.spark.sql.SparkSession, dir: String,
      name: String): String =
    graft.SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString
}
