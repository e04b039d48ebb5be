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

  test("writers x concurrent OPTIMIZE/REINDEX x probes under advisory-" +
      "rename faults: no lost update, the vector index is never " +
      "bricked, and the final full probe is exact") {
    spark.sparkContext.hadoopConfiguration.set(
      "fs.fault.impl", classOf[FaultInjectingFileSystem].getName)
    val local = freshDir("mx")
    val path = s"fault://$local"
    val savedK = GraftTables.foldEvery
    val savedA = GraftTables.foldAsync
    GraftTables.foldEvery = 3
    GraftTables.foldAsync = true
    FaultInjectingFileSystem.reset()
    spark.sql("DROP TABLE IF EXISTS stress_m")
    try {
      def vec(k: Long): Array[Double] =
        Array.tabulate(8)(j => math.sin(k * 0.37 + j * 1.13))
      (1L to 60L).map(k => (k, vec(k), 0.0)).toDF("k", "emb", "bal")
        .createOrReplaceTempView("stress_msrc")
      spark.sql(s"""CREATE TABLE stress_m USING graft
        |OPTIONS (key 'k') LOCATION '$path'
        |AS SELECT * FROM stress_msrc""".stripMargin)
      spark.sql("CREATE INDEX e ON stress_m USING IVF (emb)")
      val tick = new java.util.concurrent.atomic.AtomicInteger(0)
      FaultInjectingFileSystem.failRenameTo.set { n =>
        val advisory = n == "_tver" || n == "_tmanifest" ||
          n.startsWith("_tfold_") ||
          (n.startsWith(".") && n.endsWith(".tmp"))
        advisory && tick.incrementAndGet() % 3 == 0
      }
      def retriable(e: Throwable): Boolean =
        Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(12)
          .exists { c =>
            c.isInstanceOf[java.util.ConcurrentModificationException] ||
            c.isInstanceOf[java.io.FileNotFoundException] ||
            // statements racing maintenance can observe a just-swapped
            // layout's or just-compacted log's files vanish, or the
            // index dir headless mid-swap — all transient by design
            // (nothing committed; the retry replans against the fresh
            // snapshot, the optimistic-concurrency client pattern)
            c.getMessage != null && (
              c.getMessage.contains("FAILED_READ_FILE") ||
              c.getMessage.contains("does not exist") ||
              c.getMessage.contains("no IVF index") ||
              // an index/lists read in a swap's headless instant
              c.getMessage.contains("UNABLE_TO_INFER_SCHEMA") ||
              c.getMessage.contains("stage swap rename") ||
              c.getMessage.contains("vanished before its swap") ||
              // a read in the rebase swap's headless instant (between
              // delete and rename) — the next attempt sees the
              // promoted dir
              c.getMessage.contains("missing _frame sidecar") ||
              // a statement's _tstage_ scratch wiped by the swap while
              // staging (pre-claim, nothing committed — re-stage)
              c.getMessage.contains("No such file or directory") ||
              c.getMessage.contains("_tstage_"))
          }
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      def loopThread(label: String)(body: => Unit): Thread =
        new Thread(() => {
          try body
          catch { case e: Throwable =>
            errs.add(new RuntimeException(label, e)); () }
        })
      def withRetry(label: String, max: Int)(body: => Unit): Unit = {
        var done = false; var attempts = 0
        var lastE: Throwable = null
        while (!done)
          try { body; done = true }
          catch {
            case e: Throwable if retriable(e) =>
              attempts += 1; lastE = e
              require(attempts <= max, s"$label starved out after $max" +
                s" (last: ${Iterator.iterate(lastE)(_.getCause)
                  .takeWhile(_ != null).take(12).toSeq.last.getMessage})")
              Thread.sleep(100) // a swap window outlives a hot spin
          }
      }
      val writers = (0 until 2).map { t =>
        loopThread(s"writer$t") {
          val ss = spark.newSession()
          (1 to 6).foreach { i =>
            withRetry(s"writer$t stmt $i", 200) {
              ss.sql(s"UPDATE stress_m SET bal = bal + ${t * 100 + i} " +
                "WHERE k <= 60")
            }
          }
        }
      }
      val maintenance = loopThread("maintenance") {
        val ss = spark.newSession()
        (1 to 3).foreach { _ =>
          withRetry("optimize", 50)(ss.sql("OPTIMIZE stress_m"))
          withRetry("reindex", 50)(ss.sql("OPTIMIZE stress_m REINDEX e"))
        }
      }
      val q = vec(7)
      val qLit = q.map(_.toString).mkString("array(", ", ", ")")
      val prober = loopThread("prober") {
        val ss = spark.newSession()
        (1 to 25).foreach { _ =>
          withRetry("probe", 200) {
            val n = ss.sql("SELECT * FROM graft_ann('stress_m', 'e', " +
              s"$qLit, 10, 16)").collect().length
            assert(n === 10, s"probe returned $n rows")
          }
        }
      }
      val threads = writers :+ maintenance :+ prober
      threads.foreach(_.start())
      threads.foreach(_.join(300000))
      if (!errs.isEmpty) throw errs.peek()
      FaultInjectingFileSystem.reset()
      GraftTables.awaitFolds()
      // the index is alive (meta readable) and the final full probe is
      // EXACT against brute force over the settled content
      assert(GraftVectorIndex.readMeta(spark, path, "e").nonEmpty,
        "vector index bricked by the maintenance race")
      val want = graft.pipeline.Similarity.bruteTopK(
        spark.sql("SELECT k, emb FROM stress_m"), "k", "emb", q, 10)
        .collect().map(_.toSeq).toSeq
      assert(spark.sql("SELECT * FROM graft_ann('stress_m', 'e', " +
        s"$qLit, 10, 16)").collect().map(_.toSeq).toSeq === want)
      // no lost update: every increment landed exactly once — checked
      // against the COLD replay (the durable log is the truth) AND the
      // live handle (cache coherence across the maintenance swaps)
      val total = (0 until 2)
        .flatMap(t => (1 to 6).map(i => t * 100 + i)).sum.toDouble
      val cold = spark.newSession()
        .sql("SELECT DISTINCT bal FROM stress_m").collect()
        .map(_.getDouble(0)).toSeq
      val live = spark.sql("SELECT DISTINCT bal FROM stress_m").collect()
        .map(_.getDouble(0)).toSeq
      assert(cold === Seq(total), s"LOG lost an update (cold=$cold)")
      assert(live === Seq(total), s"live handle diverged (live=$live, " +
        s"cold=$cold)")
    } finally {
      FaultInjectingFileSystem.reset()
      GraftTables.foldEvery = savedK
      GraftTables.foldAsync = savedA
      spark.sql("DROP TABLE IF EXISTS stress_m")
    }
  }

  test("steal-while-alive: a rebase owner stalls past the steal age, " +
      "a rival steals the lock and swaps, the woken owner aborts " +
      "loudly — no burial, exactly-once preserved") {
    val path = freshDir("steal")
    val savedTimeout = GraftTables.claimTimeoutMillis
    GraftTables.claimTimeoutMillis = 400
    spark.sql("DROP TABLE IF EXISTS stress_s")
    try {
      (1L to 20L).map(k => (k, 0.0)).toDF("k", "bal")
        .createOrReplaceTempView("stress_ssrc")
      spark.sql(s"""CREATE TABLE stress_s USING graft
        |OPTIONS (key 'k') LOCATION '$path'
        |AS SELECT * FROM stress_ssrc""".stripMargin)
      (1 to 3).foreach(i =>
        spark.sql(s"UPDATE stress_s SET bal = bal + $i WHERE k <= 20"))
      val stalled = new java.util.concurrent.CountDownLatch(1)
      val wake = new java.util.concurrent.CountDownLatch(1)
      // the owner's stall: heartbeat dies with the "paused process",
      // the rival sees a dead lock and reclaims
      GraftTables.rebaseStallHook = hb => {
        GraftTables.rebaseStallHook = _ => () // the rival must not stall
        hb.stop()
        stalled.countDown()
        wake.await(60, java.util.concurrent.TimeUnit.SECONDS)
        ()
      }
      val ownerErr =
        new java.util.concurrent.atomic.AtomicReference[Throwable]()
      val owner = new Thread(() => {
        try { spark.newSession().sql("OPTIMIZE stress_s"); () }
        catch { case e: Throwable => ownerErr.set(e) }
      })
      owner.start()
      assert(stalled.await(60, java.util.concurrent.TimeUnit.SECONDS))
      Thread.sleep(GraftTables.claimTimeoutMillis + 300) // owner looks dead
      spark.sql("OPTIMIZE stress_s") // the rival steals and swaps
      wake.countDown()
      owner.join(120000)
      // the woken owner must abort LOUDLY (its lock was stolen), never
      // acknowledge an OPTIMIZE that did not swap
      val e = ownerErr.get()
      assert(e != null, "stalled owner acknowledged a stolen rebase")
      assert(Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(8)
        .exists(_.isInstanceOf[java.util.ConcurrentModificationException]),
        s"owner failed with the wrong class: $e")
      // no burial, no lost state: the table is healthy, content exact,
      // later DML lands, and a cold session replays the same state
      val expect = (1 to 3).sum.toDouble
      assert(spark.sql("SELECT DISTINCT bal FROM stress_s").collect()
        .map(_.getDouble(0)).toSeq === Seq(expect))
      spark.sql("UPDATE stress_s SET bal = bal + 100 WHERE k <= 20")
      assert(spark.newSession()
        .sql("SELECT DISTINCT bal FROM stress_s").collect()
        .map(_.getDouble(0)).toSeq === Seq(expect + 100))
      // the rival's lock must still have been respected: no leftover
      // lock files (the owner's release must not delete a thief's)
      val lockF = new java.io.File(
        new java.io.File(path).getParent,
        s".${new java.io.File(path).getName}_rebaselock")
      assert(!lockF.exists(), "rebase lock leaked after the steal dance")
    } finally {
      GraftTables.rebaseStallHook = _ => ()
      GraftTables.claimTimeoutMillis = savedTimeout
      spark.sql("DROP TABLE IF EXISTS stress_s")
    }
  }

  test("rival OPTIMIZEs stage disjointly: the loser aborts on the live " +
      "lock without corrupting the winner's stage or losing carried " +
      "commits (the r20 unique-stage fix)") {
    val path = freshDir("rival")
    spark.sql("DROP TABLE IF EXISTS stress_rv")
    try {
      (1L to 20L).map(k => (k, 0.0)).toDF("k", "bal")
        .createOrReplaceTempView("stress_rvsrc")
      spark.sql(s"""CREATE TABLE stress_rv USING graft
        |OPTIONS (key 'k') LOCATION '$path'
        |AS SELECT * FROM stress_rvsrc""".stripMargin)
      (1 to 3).foreach(i =>
        spark.sql(s"UPDATE stress_rv SET bal = bal + $i WHERE k <= 20"))
      val stalled = new java.util.concurrent.CountDownLatch(1)
      val wake = new java.util.concurrent.CountDownLatch(1)
      // the owner stalls INSIDE the locked window with its heartbeat
      // ALIVE — exactly when the old fixed-name scheme let a rival's
      // pre-lock `delete(tmp) + saveTo(tmp)` rewrite the stage the
      // owner was about to promote
      GraftTables.rebaseStallHook = hb => {
        GraftTables.rebaseStallHook = _ => ()
        stalled.countDown()
        wake.await(60, java.util.concurrent.TimeUnit.SECONDS)
        ()
      }
      val ownerErr =
        new java.util.concurrent.atomic.AtomicReference[Throwable]()
      val owner = new Thread(() => {
        try { spark.newSession().sql("OPTIMIZE stress_rv"); () }
        catch { case e: Throwable => ownerErr.set(e) }
      })
      owner.start()
      assert(stalled.await(60, java.util.concurrent.TimeUnit.SECONDS))
      // the rival stages its own (disjoint) dir, then aborts LOUDLY on
      // the live lock — it must not be acknowledged, and it must not
      // have touched the owner's stage
      val e = intercept[Throwable](spark.sql("OPTIMIZE stress_rv"))
      assert(Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(8)
        .exists(_.isInstanceOf[java.util.ConcurrentModificationException]),
        s"rival failed with the wrong class: $e")
      wake.countDown()
      owner.join(120000)
      assert(ownerErr.get() === null,
        s"the stalled-but-live owner failed: ${ownerErr.get()}")
      // the owner's swap carried everything: content exact, cold
      // replay equal, and no stage siblings leak
      val expect = (1 to 3).sum.toDouble
      assert(spark.sql("SELECT DISTINCT bal FROM stress_rv").collect()
        .map(_.getDouble(0)).toSeq === Seq(expect))
      assert(spark.newSession()
        .sql("SELECT DISTINCT bal FROM stress_rv").collect()
        .map(_.getDouble(0)).toSeq === Seq(expect))
      val parent = new java.io.File(path).getParentFile
      val leaks = parent.listFiles().filter(_.getName.startsWith(
        s".${new java.io.File(path).getName}_compact_tmp"))
      assert(leaks.isEmpty,
        s"rebase stages leaked: ${leaks.map(_.getName).mkString(",")}")
    } finally {
      GraftTables.rebaseStallHook = _ => ()
      spark.sql("DROP TABLE IF EXISTS stress_rv")
    }
  }

  test("post-commit maintenance failure is absorbed, gauged, and " +
      "loudly visible: the statement succeeds, the counter increments, " +
      "the next statement heals") {
    val path = freshDir("pc")
    spark.sql("DROP TABLE IF EXISTS stress_pc")
    try {
      (1L to 30L).map(k => (k, 0.0)).toDF("k", "bal")
        .createOrReplaceTempView("stress_pcsrc")
      spark.sql(s"""CREATE TABLE stress_pc USING graft
        |OPTIONS (key 'k') LOCATION '$path'
        |AS SELECT * FROM stress_pcsrc""".stripMargin)
      spark.sql("CREATE INDEX bal_ix ON stress_pc (bal)")
      val before = GraftTables.postCommitFailureCount(path)
      GraftTables.postCommitHook =
        () => throw new RuntimeException("injected post-commit failure")
      try {
        // the record is durable before the hook fires: the statement
        // must SUCCEED (propagating would double-apply on retry)
        spark.sql("UPDATE stress_pc SET bal = bal + 7 WHERE k <= 30")
      } finally GraftTables.postCommitHook = () => ()
      val after = GraftTables.postCommitFailureCount(path)
      assert(after === before + 1,
        s"absorbed maintenance failure not gauged ($before -> $after)")
      // the commit IS in the log and the next statement heals the
      // caches and the secondary index maintenance
      assert(spark.sql("SELECT DISTINCT bal FROM stress_pc").collect()
        .map(_.getDouble(0)).toSeq === Seq(7.0))
      spark.sql("UPDATE stress_pc SET bal = bal + 1 WHERE k <= 30")
      assert(spark.sql(
        "SELECT count(*) FROM stress_pc WHERE bal = 8.0")
        .collect()(0).getLong(0) === 30L)
      assert(GraftTables.postCommitFailureCount(path) === after,
        "a healthy commit incremented the failure gauge")
    } finally {
      GraftTables.postCommitHook = () => ()
      spark.sql("DROP TABLE IF EXISTS stress_pc")
    }
  }
}
