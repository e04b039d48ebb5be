package graft.sql

import org.apache.spark.sql.Row
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSessionFixture

/**
 * Model-based testing of the SQL face: random sequences of upserts
 * applied in parallel to an ordered [[IndexedFrame.Handle]] and to an
 * immutable `Map` oracle must answer every access path — pushed point
 * reads, pushed range scans, full scans — consistently with the oracle
 * at every step.
 */
class IndexedFrameModelSpec extends AnyFunSuite {

  private lazy val spark = SparkSessionFixture.spark
  private implicit def sp: org.apache.spark.sql.SparkSession = spark
  import spark.implicits._

  private val keyGen = Gen.choose(0L, 30L) // small key space → overwrites

  private case class Upsert(kvs: Seq[(Long, Double)])
  private val genOp: Gen[Upsert] =
    Gen.listOfN(3, Gen.zip(keyGen, Gen.choose(0, 1000).map(_.toDouble))).map(Upsert(_))

  test("random upsert sequences: point / range / full scans == Map oracle at every step") {
    val prop = Prop.forAll(Gen.listOfN(6, genOp)) { ops =>
      var model = (1L to 15L).map(k => (k, k * 1.0)).toMap
      var handle = IndexedFrame.index(
        model.toSeq.toDF("k", "v"), "k", ordered = true, numPartitions = 4)
      ops.forall { op =>
        model = model ++ op.kvs.toMap // later duplicates win, like upsert
        handle = handle.upsert(op.kvs.map { case (k, v) => Row(k, v) })
        val pointKeys = Seq(0L, 7L, 15L, 30L, 99L)
        val pointsOk = pointKeys.forall { k =>
          val got = handle.toDF.filter($"k" === k).select($"v").as[Double].collect()
          got.toSeq == model.get(k).toSeq
        }
        val rangeGot = handle.toDF.filter($"k".between(5L, 20L))
          .select($"k", $"v").as[(Long, Double)].collect().toMap
        val rangeOk = rangeGot == model.filter { case (k, _) => k >= 5 && k <= 20 }
        val fullOk = handle.toDF.select($"k", $"v").as[(Long, Double)]
          .collect().toMap == model
        pointsOk && rangeOk && fullOk
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }
}
