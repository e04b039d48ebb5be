package graft.sql

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSessionFixture
import graft.pipeline.Similarity

/**
 * The DURABLE vector index ([[GraftVectorIndex]] + the `graft_ann`
 * TVF): `CREATE INDEX ... USING IVF (vec)` on a graft catalog table
 * persists the list-partitioned layout beside the delta log, DML
 * maintains it at delta cost (appends against the saved centroids;
 * deletes resolve at probe time), a REOPENED session probes without
 * any rebuild, and a full probe (nprobe = nlist) equals exact
 * brute-force top-k over the live content.
 */
class GraftVectorIndexSpec extends AnyFunSuite {

  private lazy val spark = SparkSessionFixture.spark
  import spark.implicits._

  private def freshPath(name: String): String = {
    val p = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), s"graft_vec_$name").toString
    new scala.reflect.io.Directory(new java.io.File(p)).deleteRecursively()
    p
  }

  /** Deterministic 8-dim vectors. */
  private def vec(k: Long): Array[Double] =
    Array.tabulate(8)(j => math.sin(k * 0.37 + j * 1.13))

  private val query: Array[Double] = vec(7)
  private def queryLit: String =
    query.map(_.toString).mkString("array(", ", ", ")")

  test("CREATE INDEX USING IVF + graft_ann: full probe equals brute " +
      "force, DML maintains at delta cost, reopen probes cold") {
    val path = freshPath("t")
    spark.sql("DROP TABLE IF EXISTS zvec_t")
    (1L to 400L).map(k => (k, vec(k))).toDF("id", "emb")
      .createOrReplaceTempView("zvec_src")
    spark.sql(s"""CREATE TABLE zvec_t USING graft
      |OPTIONS (key 'id') LOCATION '$path'
      |AS SELECT * FROM zvec_src""".stripMargin)
    spark.sql("CREATE INDEX emb_ivf ON zvec_t USING IVF (emb)")
    // the sidecar is on disk, list-partitioned
    val lists = new java.io.File(s"$path/_tivf_emb_ivf/lists")
    assert(lists.isDirectory)
    assert(lists.listFiles().exists(_.getName.startsWith("__list=")))
    def ann(s: org.apache.spark.sql.SparkSession, nprobe: Int) =
      s.sql(s"SELECT * FROM graft_ann('zvec_t', 'emb_ivf', $queryLit, " +
        s"10, $nprobe)")
    def brute(s: org.apache.spark.sql.SparkSession) =
      Similarity.bruteTopK(
        s.sql("SELECT id, emb FROM zvec_t"), "id", "emb", query, 10)
    // full probe == exact brute force (bit-identical cosine kernel)
    assert(ann(spark, 16).collect().map(_.toSeq).toSeq ===
      brute(spark).collect().map(_.toSeq).toSeq)
    // a partial probe returns a subset of the vector space — top-1 is
    // the query's own vector (id 7 dominates its home list)
    val partial = ann(spark, 4).collect()
    assert(partial.nonEmpty && partial.head.getLong(0) === 7L)
    // DML: delete one of the true top ids, insert a new near-query
    // vector, update another id's vector INTO the neighborhood — the
    // probe must see all three without any rebuild
    val top = brute(spark).collect().map(_.getLong(0))
    spark.sql(s"DELETE FROM zvec_t WHERE id = ${top(1)}")
    spark.sql(s"INSERT INTO zvec_t VALUES (9001, $queryLit)")
    spark.sql(s"UPDATE zvec_t SET emb = $queryLit WHERE id = 200")
    assert(ann(spark, 16).collect().map(_.toSeq).toSeq ===
      brute(spark).collect().map(_.toSeq).toSeq)
    val ids = ann(spark, 16).collect().map(_.getLong(0)).toSet
    assert(!ids.contains(top(1)), "deleted id still probed")
    assert(ids.contains(9001L), "inserted vector not probed")
    assert(ids.contains(200L), "updated vector not probed")
    // a REOPENED session probes the durable index cold — no rebuild,
    // same answers
    val s2 = spark.newSession()
    assert(ann(s2, 16).collect().map(_.toSeq).toSeq ===
      brute(s2).collect().map(_.toSeq).toSeq)
    // DROP INDEX removes the sidecar
    spark.sql("DROP INDEX emb_ivf ON zvec_t")
    assert(!new java.io.File(s"$path/_tivf_emb_ivf").exists())
    intercept[Exception](ann(spark, 16).collect())
    spark.sql("DROP TABLE IF EXISTS zvec_t")
  }

  test("IVF on a temp view is refused (needs a durable table); " +
      "non-array columns are refused") {
    val path = freshPath("rej")
    spark.sql("DROP TABLE IF EXISTS zvec_r")
    (1L to 50L).map(k => (k, vec(k), k * 1.0)).toDF("id", "emb", "v")
      .createOrReplaceTempView("zvec_rsrc")
    spark.sql(s"""CREATE TABLE zvec_r USING graft
      |OPTIONS (key 'id') LOCATION '$path'
      |AS SELECT * FROM zvec_rsrc""".stripMargin)
    val e = intercept[Exception](
      spark.sql("CREATE INDEX bad ON zvec_r USING IVF (v)"))
    assert(e.getMessage.contains("array vector"), e.getMessage)
    val h = IndexedFrame.index(
      (1L to 50L).map(k => (k, k * 1.0)).toDF("id", "v"), "id")
    h.toDF(spark).createOrReplaceTempView("zvec_view")
    val e2 = intercept[Exception](
      spark.sql("CREATE INDEX bad2 ON zvec_view USING IVF (v)"))
    assert(e2.getMessage.contains("CATALOG table"), e2.getMessage)
    spark.sql("DROP TABLE IF EXISTS zvec_r")
  }
}
