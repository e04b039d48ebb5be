package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSessionFixture

class RangeJoinSpec extends AnyFunSuite {

  private lazy val spark = SparkSessionFixture.spark
  import spark.implicits._

  test("bandJoin equals the cartesian-filter oracle, including bucket edges") {
    val left = Seq((1L, 10.0), (2L, 95.0), (3L, 250.0)).toDF("lid", "center")
    val right = (0 until 300 by 7).map(i => (i.toLong, i.toDouble)).toDF("rid", "v")
    val got = RangeJoin.bandJoin(left, $"center" - 15.0, $"center" + 15.0,
        right, "v", bucketWidth = 10.0)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    val want = left.crossJoin(right)
      .filter($"v" >= $"center" - 15.0 && $"v" <= $"center" + 15.0)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(got === want && got.nonEmpty)
  }

  test("negative values and intervals matching nothing") {
    val left = Seq((1L, -100.0), (2L, 1e6)).toDF("lid", "center")
    val right = Seq((1L, -95.0), (2L, 0.0)).toDF("rid", "v")
    val got = RangeJoin.bandJoin(left, $"center" - 10.0, $"center" + 10.0,
        right, "v", 25.0)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 1L))) // -95 within [-110, -90]; 1e6 matches nothing
  }
}
