package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{IndexedRDD, SparkSessionFixture}

class ZOrderSpec extends AnyFunSuite {

  private lazy val spark = SparkSessionFixture.spark

  import spark.implicits._

  test("zValue Column matches the driver-side interleave bit-for-bit") {
    val rnd = new scala.util.Random(42)
    val pts = Seq.fill(200)((rnd.nextInt(1 << 21).toLong, rnd.nextInt(1 << 21).toLong))
    val got = pts.toDF("x", "y")
      .select($"x", $"y", ZOrder.zValue($"x", $"y", 21).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) =>
      assert(z === ZOrder.interleave(x, y, 21), s"($x, $y)")
    }
  }

  test("interleave is monotone within each dimension") {
    // fixing one coordinate, z grows with the other (not globally
    // monotone — that's the point of the curve — but per-dimension
    // monotonicity is what makes quad intervals contiguous)
    for (y <- Seq(0L, 5L, 1000L); x <- 1L to 100L) {
      assert(ZOrder.interleave(x, y) > ZOrder.interleave(x - 1, y))
      assert(ZOrder.interleave(y, x) > ZOrder.interleave(y, x - 1))
    }
  }

  test("zCover is a complete, disjoint, sorted cover of the box") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 50) {
      val x1 = rnd.nextInt(500).toLong; val x2 = x1 + rnd.nextInt(200)
      val y1 = rnd.nextInt(500).toLong; val y2 = y1 + rnd.nextInt(200)
      val cover = ZOrder.zCover(x1, x2, y1, y2, bits = 21, splitLevels = 6)
      // sorted + disjoint (merged)
      cover.sliding(2).foreach {
        case Seq((_, aHi), (bLo, _)) => assert(aHi + 1 < bLo || aHi < bLo)
        case _ =>
      }
      // complete: every point of the box has its z inside some interval
      for (_ <- 1 to 100) {
        val px = x1 + (rnd.nextLong().abs % (x2 - x1 + 1))
        val py = y1 + (rnd.nextLong().abs % (y2 - y1 + 1))
        val z = ZOrder.interleave(px, py)
        assert(cover.exists { case (lo, hi) => z >= lo && z <= hi },
          s"point ($px, $py) z=$z escaped the cover of [$x1,$x2]x[$y1,$y2]")
      }
    }
  }

  test("tighter covers (more splits) never lose points and shrink total measure") {
    val (x1, x2, y1, y2) = (10L, 200L, 50L, 120L)
    val loose = ZOrder.zCover(x1, x2, y1, y2, splitLevels = 3)
    val tight = ZOrder.zCover(x1, x2, y1, y2, splitLevels = 8)
    def measure(c: Seq[(Long, Long)]) = c.map { case (lo, hi) => hi - lo + 1 }.sum
    assert(measure(tight) <= measure(loose))
    // the box itself is (x2-x1+1)*(y2-y1+1) points; tight cover within 4x
    assert(measure(tight) <= 4L * (x2 - x1 + 1) * (y2 - y1 + 1),
      s"tight cover measure ${measure(tight)} too loose")
  }

  test("a z-range-partitioned index PRUNES partitions for box range scans") {
    // synthetic unique grid: one row per (x, y) in a 128x128 square
    val rows = for (x <- 0L until 128L; y <- 0L until 128L)
      yield (ZOrder.interleave(x, y), (x, y))
    val idx = IndexedRDD.rangePartitioned(
      spark.sparkContext.parallelize(rows.toSeq, 16), 16)
    idx.cached.count()
    val cover = ZOrder.zCover(10, 20, 100, 110, splitLevels = 6)
    // every interval's pruned scan touches FEWER partitions than the
    // index has (PartitionPruningRDD drops non-overlapping ones)
    val total = idx.partitionsRDD.partitions.length
    val touched = cover.map { case (lo, hi) =>
      idx.range(lo, hi + 1).partitions.length
    }
    assert(touched.forall(_ <= total))
    assert(touched.sum < cover.size * total,
      s"no pruning: every one of ${cover.size} scans touched all $total partitions")
    // and the union of pruned scans + residual equals the exact box
    val got = cover.flatMap { case (lo, hi) =>
      idx.range(lo, hi + 1).collect()
    }.map(_._2).filter { case (x, y) => x >= 10 && x <= 20 && y >= 100 && y <= 110 }
    assert(got.toSet === (for (x <- 10L to 20L; y <- 100L to 110L) yield (x, y)).toSet)
    idx.unpersist()
  }
}
