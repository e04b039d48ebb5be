package graft.queries

import org.apache.spark.sql.types.TimestampType
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSessionFixture

/**
 * Fixture-loader contract. events.ts has shipped in three parquet
 * encodings across driver fixture generations (TIMESTAMP(NANOS)-as-long,
 * non-UTC-adjusted TIMESTAMP(MICROS) = TIMESTAMP_NTZ, plain
 * TIMESTAMP(MICROS)); round 9 went red because the loader assumed one of
 * them. This pins the normalized output type so drift surfaces here, in
 * one named test, instead of as 16 erroring oracle lanes.
 */
class TablesSpec extends AnyFunSuite {

  private lazy val spark = SparkSessionFixture.spark

  for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
    test(s"events loader normalizes ts to a session-zoned TIMESTAMP ($sf)") {
      val ev = Tables.events(spark, s"/root/testdata/$sf")
      assert(ev.schema("ts").dataType == TimestampType,
        s"ts loaded as ${ev.schema("ts").dataType} — fixture encoding drifted again; " +
          "extend the Tables.events dtype branch")
      // the 2024-01 fixture window must survive normalization: a wrong
      // zone/scale conversion lands outside it (nanos misread as micros
      // → year 1970; micros re-divided → 1970; tz-shifted → still 2024
      // under the UTC session, so the window check is shift-tolerant
      // but catches scale errors, the class that actually occurred)
      val bounds = ev.agg(
        org.apache.spark.sql.functions.min("ts"),
        org.apache.spark.sql.functions.max("ts")).head
      val (lo, hi) = (bounds.getTimestamp(0), bounds.getTimestamp(1))
      assert(lo.toInstant.toString.startsWith("2024-") &&
        hi.toInstant.toString.startsWith("2024-"),
        s"events ts window [$lo, $hi] escaped 2024 — unit-scale conversion bug")
    }
  }
}
