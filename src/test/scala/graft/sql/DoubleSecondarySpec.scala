package graft.sql

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSessionFixture
import graft.keys.KeySerializer

/**
 * FP (double/float) ordered secondaries: the sortable-bits serializer,
 * the DoubleCodec order algebra, histogram-served sum/avg/percentile
 * (no-scan), extrema, and range probes on a double column.
 */
class DoubleSecondarySpec extends AnyFunSuite {

  private lazy val spark = SparkSessionFixture.spark
  import spark.implicits._

  test("DoubleSerializer: round-trip and byte order == Double.compare total order") {
    val ser = KeySerializer.DoubleSerializer
    val vals = Seq(Double.NegativeInfinity, -1.5e308, -2.0, -1.0,
      -Double.MinPositiveValue, 0.0, Double.MinPositiveValue, 0.5, 1.0,
      1.5e308, Double.PositiveInfinity, Double.NaN)
    vals.foreach { d =>
      val rt = ser.fromBytes(ser.toBytes(d))
      assert(java.lang.Double.compare(rt, d) === 0, s"round-trip $d -> $rt")
    }
    for (a <- vals; b <- vals) {
      val c = java.util.Arrays.compareUnsigned(ser.toBytes(a), ser.toBytes(b))
      assert(math.signum(c) === math.signum(java.lang.Double.compare(a, b)),
        s"order mismatch: $a vs $b")
    }
  }

  test("sortableBits: signed-long order equals Double.compare order") {
    val vals = Seq(Double.NegativeInfinity, -3.14, -1e-300, 0.0, 1e-300,
      2.71, Double.PositiveInfinity, Double.NaN)
    for (a <- vals; b <- vals) {
      val c = java.lang.Long.compare(
        IndexedFrame.sortableBits(a), IndexedFrame.sortableBits(b))
      assert(math.signum(c) === math.signum(java.lang.Double.compare(a, b)))
      assert(java.lang.Double.compare(
        IndexedFrame.fromSortableBits(IndexedFrame.sortableBits(a)), a) === 0)
    }
  }

  test("sum/avg/median of a double ordered secondary route through IndexedStats") {
    implicit val sp: org.apache.spark.sql.SparkSession = spark
    IndexedAgg.enable(spark)
    import org.apache.spark.sql.functions.{avg, count, expr, sum => fSum}
    val rows = (1L to 1000L).map(k => (k, (k % 97) * 1.25 - 30.0))
    val df = rows.toDF("k", "v")
    val h = IndexedFrame.index(df, "k", numPartitions = 4)
      .addSecondaryIndex("v", ordered = true)
    val agg = h.toDF.agg(fSum($"v").as("s"), avg($"v").as("a"),
      expr("percentile(v, 0.5)").as("m"), count($"v").as("c"))
    assert(agg.queryExecution.executedPlan.toString.contains("IndexedStats"),
      agg.queryExecution.executedPlan.toString)
    val (s, a, m, c) = agg.as[(Double, Double, Double, Long)].head()
    val vs = rows.map(_._2)
    val exactSum = vs.map(v => BigDecimal(v)).sum.toDouble
    assert(math.abs(s - exactSum) < 1e-9, s"sum $s vs $exactSum")
    assert(math.abs(a - exactSum / 1000.0) < 1e-9)
    val sorted = vs.sorted
    val med = (sorted(499) + sorted(500)) / 2.0
    assert(math.abs(m - med) < 1e-9, s"median $m vs $med")
    assert(c === 1000L)
    // min/max from the inverted index's extrema descents
    val mm = h.toDF.agg(org.apache.spark.sql.functions.min($"v"),
      org.apache.spark.sql.functions.max($"v")).as[(Double, Double)].head()
    assert(mm === ((sorted.head, sorted.last)))
  }

  test("double secondary equality and range probes prune to point reads") {
    implicit val sp: org.apache.spark.sql.SparkSession = spark
    val df = (1L to 500L).map(k => (k, k * 0.5)).toDF("k", "v")
    val h = IndexedFrame.index(df, "k", numPartitions = 4)
      .addSecondaryIndex("v", ordered = true)
    val eq = h.toDF.filter($"v" === 100.0).select($"k").as[Long].collect().toSeq
    assert(eq === Seq(200L))
    assert(h.lastScanKind === "secondary_point")
    val rg = h.toDF.filter($"v" >= 10.0 && $"v" < 12.0).select($"k")
      .as[Long].collect().sorted.toSeq
    assert(rg === (20L to 23L))
    assert(h.lastScanKind === "secondary_range")
  }

  test("scaled decimal secondary: exact unscaled-long histogram serves sum/median/extrema and range probes") {
    implicit val sp: org.apache.spark.sql.SparkSession = spark
    IndexedAgg.enable(spark)
    import org.apache.spark.sql.functions.{count, expr, max, min, sum => fSum}
    // decimal(12, 2): money-like column, values k * 0.25
    val df = (1L to 800L).map(k => (k, BigDecimal(k * 25, 2))).toDF("k", "amt")
      .select($"k", $"amt".cast("decimal(12,2)").as("amt"))
    val h = IndexedFrame.index(df, "k", numPartitions = 4)
      .addSecondaryIndex("amt", ordered = true)
    val agg = h.toDF.agg(fSum($"amt").as("s"),
      expr("percentile(amt, 0.5)").as("m"), count($"amt").as("c"))
    assert(agg.queryExecution.executedPlan.toString.contains("IndexedStats"),
      agg.queryExecution.executedPlan.toString)
    val row = agg.collect().head
    // exact: sum of k*0.25 for k=1..800 = 0.25 * 800*801/2 = 80100.00
    assert(row.getDecimal(0) === new java.math.BigDecimal("80100.00"))
    assert(row.getDouble(1) === 100.125) // median of 0.25..200: (100.0+100.25)/2
    assert(row.getLong(2) === 800L)
    val (mn, mx) = h.toDF.agg(min($"amt"), max($"amt"))
      .collect().head match { case r => (r.getDecimal(0), r.getDecimal(1)) }
    assert(mn === new java.math.BigDecimal("0.25") &&
      mx === new java.math.BigDecimal("200.00"))
    // equality and range probes route through the ordered secondary
    val eq = h.toDF.filter($"amt" === new java.math.BigDecimal("50.00"))
      .select($"k").as[Long].collect().toSeq
    assert(eq === Seq(200L))
    assert(h.lastScanKind === "secondary_point")
    val rg = h.toDF
      .filter($"amt" >= new java.math.BigDecimal("10.00") &&
        $"amt" < new java.math.BigDecimal("11.00"))
      .select($"k").as[Long].collect().sorted.toSeq
    assert(rg === (40L to 43L))
    assert(h.lastScanKind === "secondary_range")
  }

  test("NULLs stay out of the secondary; sum/avg of all-null column is NULL") {
    implicit val sp: org.apache.spark.sql.SparkSession = spark
    IndexedAgg.enable(spark)
    import org.apache.spark.sql.functions.{avg, sum => fSum}
    val df = (1L to 50L).map(k =>
      (k, if (k % 2 == 0) Some(k * 1.5) else None)).toDF("k", "v")
    val h = IndexedFrame.index(df, "k", numPartitions = 2)
      .addSecondaryIndex("v", ordered = true)
    val (s, a) = h.toDF.agg(fSum($"v"), avg($"v")).as[(Double, Double)].head()
    val expect = (2L to 50L by 2).map(_ * 1.5).sum
    assert(math.abs(s - expect) < 1e-9)
    assert(math.abs(a - expect / 25.0) < 1e-9)
    val allNull = (1L to 10L).map(k => (k, None: Option[Double])).toDF("k", "v")
    val h2 = IndexedFrame.index(allNull, "k", numPartitions = 2)
      .addSecondaryIndex("v", ordered = true)
    val r = h2.toDF.agg(fSum($"v"), avg($"v")).collect().head
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("filtered agg: WHERE sec = v + sum/avg/count routes through IndexedFilteredAgg") {
    implicit val sp: org.apache.spark.sql.SparkSession = spark
    IndexedAgg.enable(spark)
    import org.apache.spark.sql.functions.{avg, count, lit, sum => fSum}
    val rows = (1L to 1000L).map(k => (k, k % 7, k * 0.5))
    val df = rows.toDF("k", "g", "v")
    val h = IndexedFrame.index(df, "k", numPartitions = 4)
      .addSecondaryIndex("g")
    val q = h.toDF.filter($"g" === 3L)
      .agg(fSum($"v").as("s"), avg($"v").as("a"),
        count($"v").as("cv"), count(lit(1)).as("cr"))
    assert(q.queryExecution.executedPlan.toString.contains("IndexedFilteredAgg"),
      q.queryExecution.executedPlan.toString)
    val (s, a, cv, cr) = q.as[(Double, Double, Long, Long)].head()
    val grp = rows.filter(_._2 == 3L).map(_._3)
    assert(math.abs(s - grp.sum) < 1e-9)
    assert(math.abs(a - grp.sum / grp.size) < 1e-9)
    assert(cv === grp.size && cr === grp.size)
    // a value with no rows: sum/avg NULL, counts 0
    val r0 = h.toDF.filter($"g" === 99L)
      .agg(fSum($"v"), avg($"v"), count($"v"), count(lit(1))).collect().head
    assert(r0.isNullAt(0) && r0.isNullAt(1) && r0.getLong(2) === 0L &&
      r0.getLong(3) === 0L)
    // repeated probes answer from the memo: jobs stop after the first
    val sc = spark.sparkContext
    h.toDF.filter($"g" === 1L).agg(fSum($"v")).collect() // warms (already warm)
    val before = sc.statusTracker.getJobIdsForGroup(null).length
    (2L to 6L).foreach { g =>
      h.toDF.filter($"g" === g).agg(fSum($"v")).collect()
    }
    val after = sc.statusTracker.getJobIdsForGroup(null).length
    assert(after === before, s"expected zero jobs for warm probes, got ${after - before}")
    // integral agg column folds exactly; null agg values excluded
    val df2 = (1L to 100L).map(k =>
      (k, k % 5, if (k % 10 == 0) None else Some(k))).toDF("k", "g", "w")
    val h2 = IndexedFrame.index(df2, "k", numPartitions = 2)
      .addSecondaryIndex("g")
    val (s2, c2) = h2.toDF.filter($"g" === 0L)
      .agg(fSum($"w"), count($"w")).as[(Long, Long)].head()
    val grp2 = (1L to 100L).filter(k => k % 5 == 0 && k % 10 != 0)
    assert(s2 === grp2.sum && c2 === grp2.size)
    // IN-list probes combine disjoint groups driver-side; min/max ride
    // the same grouped fold
    import org.apache.spark.sql.functions.{max, min}
    val q2 = h.toDF.filter($"g".isin(1L, 4L, 99L))
      .agg(fSum($"v").as("s"), min($"v").as("mn"), max($"v").as("mx"),
        count(lit(1)).as("cr"))
    assert(q2.queryExecution.executedPlan.toString.contains("IndexedFilteredAgg"),
      q2.queryExecution.executedPlan.toString)
    val (sIn, mnIn, mxIn, crIn) = q2.as[(Double, Double, Double, Long)].head()
    val grpIn = rows.filter(r => r._2 == 1L || r._2 == 4L).map(_._3)
    assert(math.abs(sIn - grpIn.sum) < 1e-9)
    assert(mnIn === grpIn.min && mxIn === grpIn.max && crIn === grpIn.size)
    // integral min/max narrow back to the column type
    val (mn2, mx2) = h2.toDF.filter($"g" === 2L)
      .agg(min($"w"), max($"w")).as[(Long, Long)].head()
    val grpW = (1L to 100L).filter(k => k % 5 == 2 && k % 10 != 0)
    assert(mn2 === grpW.min && mx2 === grpW.max)
  }

  test("float column: ordered secondary sum/extrema and a float composite component") {
    implicit val sp: org.apache.spark.sql.SparkSession = spark
    IndexedAgg.enable(spark)
    import org.apache.spark.sql.functions.{max, min, sum => fSum}
    val df = (1L to 300L).map(k => (k, (k % 31).toFloat * 0.25f)).toDF("k", "v")
    val h = IndexedFrame.index(df, "k", numPartitions = 2)
      .addSecondaryIndex("v", ordered = true)
    val s = h.toDF.agg(fSum($"v")).as[Double].head()
    val expect = (1L to 300L).map(k => ((k % 31).toFloat * 0.25f).toDouble).sum
    assert(math.abs(s - expect) < 1e-6)
    val (mn, mx) = h.toDF.agg(min($"v"), max($"v")).as[(Float, Float)].head()
    assert(mn === 0.0f && mx === 7.5f)
    // a double component inside an N-ary composite key round-trips
    val cdf = (for (a <- 1L to 3L; d <- Seq(0.5, 1.5, 2.5))
      yield (a, d, s"$a-$d")).toDF("ka", "kd", "payload")
    val ch = IndexedFrame.indexCompositeN(cdf, Seq("ka", "kd"), ordered = true)
    val got = ch.toDF.filter($"ka" === 2L && $"kd" === 1.5)
      .select($"payload").as[String].collect().toSeq
    assert(got === Seq("2-1.5"))
  }
}
