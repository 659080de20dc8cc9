package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-loop timer for individual corpus queries — the per-query slice
  * of Bench without the other 150 entries, for iterating on one plan.
  *
  * Usage: runMain graft.tools.TimeQuery q1,q2 [sfDir] [reps]
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(',').map(_.trim).filter(_.nonEmpty)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.SessionTuning(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.lake.sql.LakeSqlExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // scheduler/codegen warmup so rep 1 isn't charged for Spark startup
    spark.range(1000000).selectExpr("sum(id)").collect()
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        graft.queries.QueryCaches.clear()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"TIME $name%-28s min=${times.min}%.3f reps=${times.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
