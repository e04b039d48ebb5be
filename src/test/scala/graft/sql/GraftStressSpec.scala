package graft.sql

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSessionFixture

/**
 * CONCURRENCY + FAULT stress harness (the round-17 TOCTOU was found by
 * a 2-writer race — this cranks the dial): N writer sessions x M
 * statements each, racing while every ADVISORY rename (`_tver` hints,
 * marker tmp staging, fold sidecars, the checkpoint manifest)
 * intermittently FAILS, the object-store shape where rename is not a
 * primitive. The commit protocol itself rides atomic create, so the
 * invariants must hold exactly:
 *  - EXACTLY-ONCE: every statement commits exactly one version — the
 *    history is base + N*M commits, no statement lost or doubled;
 *  - NO LOST UPDATES: writers increment the SAME keys, so any stale
 *    read-modify-write would corrupt the sum. The commit-time
 *    data-conflict guard aborts the loser loudly
 *    (ConcurrentModificationException — Delta's semantics) and the
 *    writer re-runs the statement against the fresh snapshot;
 *  - the final state equals the commutative sum of all statements;
 *  - REPLAY EQUALITY: a cold session's replay reproduces the live
 *    state bit-for-bit (markers/folds/manifest are acceleration only).
 */
class GraftStressSpec extends AnyFunSuite {

  private lazy val spark = SparkSessionFixture.spark
  import spark.implicits._

  private def freshDir(name: String): String = {
    val p = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), s"graft_stress_$name").toString
    new scala.reflect.io.Directory(new java.io.File(p)).deleteRecursively()
    p
  }

  test("N writers x M statements under intermittent advisory-rename " +
      "failures: exactly-once, commutative sum exact, cold replay equal") {
    spark.sparkContext.hadoopConfiguration.set(
      "fs.fault.impl", classOf[FaultInjectingFileSystem].getName)
    val local = freshDir("nm")
    val path = s"fault://$local"
    val savedK = GraftTables.foldEvery
    val savedA = GraftTables.foldAsync
    GraftTables.foldEvery = 3
    GraftTables.foldAsync = true // the background worker races too
    FaultInjectingFileSystem.reset()
    spark.sql("DROP TABLE IF EXISTS stress_t")
    try {
      (1L to 20L).map(k => (k, 0.0)).toDF("k", "bal")
        .createOrReplaceTempView("stress_src")
      spark.sql(s"""CREATE TABLE stress_t USING graft
        |OPTIONS (key 'k') LOCATION '$path'
        |AS SELECT * FROM stress_src""".stripMargin)
      // every 3rd rename of an ADVISORY artifact fails — hint markers
      // (and their staged tmps), fold sidecars, the manifest. Commit
      // records themselves are create-based and stay untouched.
      val tick = new java.util.concurrent.atomic.AtomicInteger(0)
      FaultInjectingFileSystem.failRenameTo.set { n =>
        val advisory = n == "_tver" || n == "_tmanifest" ||
          n.startsWith("_tfold_") ||
          (n.startsWith(".") && n.endsWith(".tmp"))
        advisory && tick.incrementAndGet() % 3 == 0
      }
      val writers = 3
      val statements = 8
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val threads = (0 until writers).map { t =>
        new Thread(() => {
          try {
            val ss = spark.newSession()
            (1 to statements).foreach { i =>
              // commutative increments on SHARED keys: any
              // serialization order yields the same final state, so a
              // lost update (stale read-modify-write committed over a
              // rival) is VISIBLE in the sum. The conflict guard
              // aborts the stale loser — re-run until it lands.
              var done = false
              var attempts = 0
              while (!done) {
                try {
                  ss.sql(s"""UPDATE stress_t SET bal = bal + ${t * 100 + i}
                    |WHERE k <= 20""".stripMargin)
                  done = true
                } catch {
                  case e: Throwable
                      if Iterator.iterate(e: Throwable)(_.getCause)
                        .takeWhile(_ != null).take(8).exists(
                          _.isInstanceOf[
                            java.util.ConcurrentModificationException]) =>
                    attempts += 1
                    require(attempts <= 200,
                      s"writer $t statement $i starved out")
                }
              }
            }
          } catch { case e: Throwable => errs.add(e); () }
        })
      }
      threads.foreach(_.start())
      threads.foreach(_.join(300000))
      if (!errs.isEmpty) throw errs.peek()
      assert(FaultInjectingFileSystem.failed.get() > 0,
        "the injected faults never fired — the spec is not testing anything")
      FaultInjectingFileSystem.reset()
      GraftTables.awaitFolds()
      val total = (0 until writers)
        .flatMap(t => (1 to statements).map(i => t * 100 + i)).sum.toDouble
      def state(s: org.apache.spark.sql.SparkSession): Map[Long, Double] =
        s.sql("SELECT k, bal FROM stress_t").collect()
          .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val expect = (1L to 20L).map(_ -> total).toMap
      assert(state(spark) === expect)
      // exactly-once: base + one version per statement
      assert(spark.newSession()
        .sql("SELECT count(*) FROM graft_history('stress_t')")
        .collect()(0).getLong(0) === (1 + writers * statements).toLong)
      // replay equality: a COLD session reproduces the state from the
      // log alone (whatever subset of hints/folds survived the faults)
      assert(state(spark.newSession()) === expect)
    } finally {
      FaultInjectingFileSystem.reset()
      GraftTables.foldEvery = savedK
      GraftTables.foldAsync = savedA
      spark.sql("DROP TABLE IF EXISTS stress_t")
    }
  }
}
