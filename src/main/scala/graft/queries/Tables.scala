package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture-table loaders (TESTDATA.md). Plain parquet scans — Catalyst
  * pushes filters/column pruning into these. */
object Tables {
  def table(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  def customer(s: SparkSession, dir: String): DataFrame = table(s, dir, "customer")
  def orders(s: SparkSession, dir: String): DataFrame = table(s, dir, "orders")
  def lineitem(s: SparkSession, dir: String): DataFrame = table(s, dir, "lineitem")
  def supplier(s: SparkSession, dir: String): DataFrame = table(s, dir, "supplier")
  def part(s: SparkSession, dir: String): DataFrame = table(s, dir, "part")
  def nation(s: SparkSession, dir: String): DataFrame = table(s, dir, "nation")
  def region(s: SparkSession, dir: String): DataFrame = table(s, dir, "region")
  /** events.ts has shipped in three parquet encodings across fixture
    * generations: TIMESTAMP(NANOS) (Spark 4 refuses to map it to a
    * timestamp type, so it surfaces as long nanos under the legacy
    * conf), TIMESTAMP(MICROS) not-UTC-adjusted (loads as
    * TIMESTAMP_NTZ), and plain TIMESTAMP(MICROS). Branch on the actual
    * loaded type and normalize all three to a session-zoned TIMESTAMP —
    * every entry point (Verify/Bench/specs) runs with the session
    * timezone pinned to UTC, so the NTZ→TZ cast is value-preserving
    * and downstream epoch arithmetic matches the DuckDB oracle. */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", raw("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, dir: String): DataFrame = table(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = table(s, dir, "embeddings")
}
