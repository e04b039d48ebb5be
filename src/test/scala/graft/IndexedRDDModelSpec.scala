package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/**
 * Model-based testing: random sequences of mutating operations applied
 * in parallel to an IndexedRDD and to an immutable `Map` oracle must
 * converge to the same contents, and every intermediate version must
 * answer point reads consistently with the oracle at that step.
 */
class IndexedRDDModelSpec extends AnyFunSuite {

  private lazy val sc = SparkSessionFixture.spark.sparkContext

  sealed trait Op
  case class Put(k: Long, v: Int) extends Op
  case class MultiPut(kvs: Map[Long, Int]) extends Op
  case class Delete(ks: Seq[Long]) extends Op
  case class FilterOdd() extends Op
  case class MapValuesPlus(d: Int) extends Op

  private val keyGen = Gen.choose(0L, 40L) // small key space → collisions
  private val genOp: Gen[Op] = Gen.frequency(
    4 -> (for { k <- keyGen; v <- Gen.choose(0, 1000) } yield Put(k, v)),
    3 -> Gen.mapOfN(3, Gen.zip(keyGen, Gen.choose(0, 1000))).map(MultiPut),
    3 -> Gen.listOfN(3, keyGen).map(Delete),
    1 -> Gen.const(FilterOdd()),
    2 -> Gen.choose(1, 9).map(MapValuesPlus))

  private def applyModel(m: Map[Long, Int], op: Op): Map[Long, Int] = op match {
    case Put(k, v)        => m + (k -> v)
    case MultiPut(kvs)    => m ++ kvs
    case Delete(ks)       => m -- ks
    case FilterOdd()      => m.filter { case (k, _) => k % 2 == 1 }
    case MapValuesPlus(d) => m.map { case (k, v) => (k, v + d) }
  }

  private def applyEngine(r: IndexedRDD[Long, Int], op: Op): IndexedRDD[Long, Int] = op match {
    case Put(k, v)        => r.put(k, v)
    case MultiPut(kvs)    => r.multiput(kvs)
    case Delete(ks)       => r.delete(ks.toArray)
    case FilterOdd()      => r.filter { case (k, _) => k % 2 == 1 }
    case MapValuesPlus(d) => r.mapValues((v: Int) => v + d)
  }

  test("random op sequences: engine == Map oracle at every step") {
    val prop = Prop.forAll(Gen.listOfN(12, genOp)) { ops =>
      var model = (1L to 20L).map(k => (k, k.toInt)).toMap
      var engine = IndexedRDD(sc.parallelize(model.toSeq, 4))
      val probes = Array(0L, 1L, 7L, 20L, 40L)
      ops.forall { op =>
        model = applyModel(model, op)
        engine = applyEngine(engine, op)
        val contentsOk = engine.collect().toMap == model
        val probesOk = probes.forall(k => engine.get(k) == model.get(k))
        val countOk = engine.count() == model.size
        contentsOk && probesOk && countOk
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }
}
