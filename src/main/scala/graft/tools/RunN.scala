package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-loop utility: run one named corpus query N times with timing —
  * catches cost that grows across invocations (the bench reps shape). */
object RunN {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val n = if (args.length > 2) args(2).toInt else 4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = graft.SessionTuning(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.lake.sql.LakeSqlExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect() // warmup
    graft.queries.Corpus.prepare(spark, sfDir)
    val fn = graft.SparkEntry.queries(name)
    for (i <- 0 until n) {
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      graft.queries.QueryCaches.clear()
      println(f"RUNN $name rep=$i sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    spark.stop()
  }
}
