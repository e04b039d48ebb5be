package graft.operators

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSessionFixture

class AsOfSpec extends AnyFunSuite {

  private lazy val spark = SparkSessionFixture.spark
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("asofJoinLast: latest at-or-before match per key; null when none") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "e1"),
      (1L, ts("2024-01-01 12:00:00"), "e2"),
      (1L, ts("2024-01-01 09:00:00"), "e0"), // before any right row
      (2L, ts("2024-01-01 10:30:00"), "e3"),
      (3L, ts("2024-01-01 10:00:00"), "e4")  // key with no right rows
    ).toDF("k", "t", "name")
    val right = Seq(
      (1L, ts("2024-01-01 09:30:00"), 100.0),
      (1L, ts("2024-01-01 11:00:00"), 200.0),
      (2L, ts("2024-01-01 10:30:00"), 300.0)  // equal timestamp: counts
    ).toDF("k", "t", "v")
    val out = AsOf.asofJoinLast(left, "k", "t", right, "k", "t", "v", "last_v")
      .select("name", "last_v").collect()
      .map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(out("e0") === None)          // nothing at or before 09:00
    assert(out("e1") === Some(100.0))   // 09:30 row
    assert(out("e2") === Some(200.0))   // 11:00 beats 09:30
    assert(out("e3") === Some(300.0))   // equal timestamp is "at or before"
    assert(out("e4") === None)          // no right rows for key 3
  }

  test("left columns are preserved unchanged") {
    val left = Seq((1L, ts("2024-01-01 10:00:00"), "payload")).toDF("k", "t", "p")
    val right = Seq((1L, ts("2024-01-01 09:00:00"), 5.0)).toDF("k", "t", "v")
    val out = AsOf.asofJoinLast(left, "k", "t", right, "k", "t", "v", "lv")
    assert(out.columns.toSeq === Seq("k", "t", "p", "lv"))
    assert(out.head().getString(2) === "payload")
  }
}
