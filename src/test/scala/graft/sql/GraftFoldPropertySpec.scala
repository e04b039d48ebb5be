package graft.sql

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSessionFixture

/**
 * Property-style guarantees for tiered delta folding: for RANDOM
 * statement sequences (upserts, deletes, overlapping key slices) the
 * cold-reopen replay must be BIT-IDENTICAL across fold cadences —
 * unfolded (foldEvery = 0), aggressive (2), and default-ish (3) — and
 * time travel to every intermediate version must match the
 * sequentially-maintained expectation. Deterministic seeds: the suite
 * is reproducible, not flaky.
 */
class GraftFoldPropertySpec extends AnyFunSuite {

  private lazy val spark = SparkSessionFixture.spark
  import spark.implicits._

  private def freshPath(name: String): String = {
    val p = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), s"graft_foldprop_$name").toString
    new scala.reflect.io.Directory(new java.io.File(p)).deleteRecursively()
    p
  }

  /** Apply one deterministic pseudo-random statement; mirror it into
    * the driver-side model map; return the SQL run. */
  private def applyOp(table: String, i: Int, seed: Int,
      model: scala.collection.mutable.Map[Long, Double]): Unit = {
    val rnd = new scala.util.Random(seed * 1000 + i)
    rnd.nextInt(3) match {
      case 0 => // slice update
        val m = rnd.nextInt(7) + 2
        val r = rnd.nextInt(m)
        val v = rnd.nextInt(1000)
        spark.sql(s"UPDATE $table SET v = $v + k WHERE k % $m = $r")
        model.keys.toSeq.filter(_ % m == r)
          .foreach(k => model(k) = (v + k).toDouble)
      case 1 => // point delete (possibly absent — a no-op)
        val k = rnd.nextInt(60) + 1
        spark.sql(s"DELETE FROM $table WHERE k = $k")
        model.remove(k.toLong)
        ()
      case 2 => // insert-or-replace a small batch
        val base = rnd.nextInt(80) + 1
        val v = rnd.nextInt(1000)
        spark.sql(s"INSERT INTO $table VALUES ($base, $v), (${base + 1}, ${v + 1})")
        model(base.toLong) = v.toDouble
        model(base.toLong + 1) = (v + 1).toDouble
    }
  }

  private def content(name: String, session: org.apache.spark.sql.SparkSession)
      : Map[Long, Double] =
    session.sql(s"SELECT k, v FROM $name").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("random statement sequences replay identically at every fold cadence") {
    val saved = GraftTables.foldEvery
    try {
      for (seed <- 1 to 3; cadence <- Seq(0, 2, 3)) {
        GraftTables.foldEvery = cadence
        val tag = s"s${seed}c$cadence"
        val path = freshPath(tag)
        spark.sql(s"DROP TABLE IF EXISTS foldprop_$tag")
        (1L to 40L).map(k => (k, k * 1.0)).toDF("k", "v")
          .createOrReplaceTempView(s"foldprop_src_$tag")
        spark.sql(s"""CREATE TABLE foldprop_$tag USING graft
          |OPTIONS (key 'k') LOCATION '$path'
          |AS SELECT * FROM foldprop_src_$tag""".stripMargin)
        val model = scala.collection.mutable.Map(
          (1L to 40L).map(k => k -> k * 1.0): _*)
        val checkpoints = scala.collection.mutable.Map.empty[Int, Map[Long, Double]]
        (1 to 11).foreach { i =>
          applyOp(s"foldprop_$tag", i, seed, model)
          checkpoints(i) = model.toMap
        }
        // the live chain, a cold reopen, and the model all agree
        val live = content(s"foldprop_$tag", spark)
        assert(live === model.toMap, s"live vs model ($tag)")
        val cold = content(s"foldprop_$tag", spark.newSession())
        assert(cold === model.toMap, s"cold vs model ($tag)")
        // time travel to every version matches its checkpoint (raw
        // deltas still serve mid-fold versions)
        val s2 = spark.newSession()
        Seq(3, 7, 11).foreach { i =>
          val tt = s2.sql(
            s"SELECT k, v FROM foldprop_$tag VERSION AS OF $i").collect()
            .map(r => r.getLong(0) -> r.getDouble(1)).toMap
          assert(tt === checkpoints(i), s"version $i vs checkpoint ($tag)")
        }
        spark.sql(s"DROP TABLE IF EXISTS foldprop_$tag")
      }
    } finally GraftTables.foldEvery = saved
  }

  test("folds race rival committers: 4 writers x 8 statements, cold " +
      "replay exact, history complete") {
    val saved = GraftTables.foldEvery
    GraftTables.foldEvery = 3
    val path = freshPath("race")
    spark.sql("DROP TABLE IF EXISTS foldprop_race")
    try {
      (1L to 100L).map(k => (k, 0.0)).toDF("k", "v")
        .createOrReplaceTempView("foldprop_race_src")
      spark.sql(s"""CREATE TABLE foldprop_race USING graft
        |OPTIONS (key 'k') LOCATION '$path'
        |AS SELECT * FROM foldprop_race_src""".stripMargin)
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val threads = (0 until 4).map { t =>
        new Thread(() => {
          try {
            val ss = spark.newSession()
            // each writer owns a disjoint key stripe and each of its
            // statements a disjoint band within it: the serialized
            // final state is order-independent and per-key checkable
            (1 to 8).foreach { i =>
              ss.sql(s"""UPDATE foldprop_race SET v = ${t * 100 + i}
                |WHERE k % 4 = $t AND k > ${4 * (i - 1)}
                |AND k <= ${4 * i}""".stripMargin)
            }
          } catch { case e: Throwable => errs.add(e); () }
        })
      }
      threads.foreach(_.start())
      threads.foreach(_.join(300000))
      if (!errs.isEmpty) throw errs.peek()
      val expect = (1L to 100L).map { k =>
        val t = (k % 4).toInt
        // writer t's only statement touching k is the band i =
        // ceil(k/4); none when k > 32
        val i = ((k + 3) / 4).toInt
        k -> (if (i <= 8) (t * 100 + i).toDouble else 0.0)
      }.toMap
      val cold = content("foldprop_race", spark.newSession())
      assert(cold === expect)
      assert(spark.newSession()
        .sql("SELECT count(*) FROM graft_history('foldprop_race')")
        .collect()(0).getLong(0) === 33) // base + 32 commits, none lost
    } finally {
      GraftTables.foldEvery = saved
      spark.sql("DROP TABLE IF EXISTS foldprop_race")
    }
  }
}
