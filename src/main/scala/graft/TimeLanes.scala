package graft

/** Dev utility: time individual registry lanes by name (best of 3,
  * cache-cleared between runs) without paying a full [[Bench]] sweep.
  * `runMain graft.TimeLanes q1_agg ir_sql_zone_prune ...`; the SF dir
  * comes from SPARK_GRAFT_SF_DIR (default sf0.1). */
object TimeLanes {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.sql.GraftSqlExtension")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.read.parquet(s"$sfDir/region.parquet").count() // warm the JVM/FS
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      val secs = (0 until 3).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val s = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
        s
      }
      println(f"TIMING $name best=${secs.min}%.3f all=${secs.map(x => f"$x%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
