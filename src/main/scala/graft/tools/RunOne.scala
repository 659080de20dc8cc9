package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-loop utility: run one named corpus query with timing, optionally
  * printing the formatted physical plan (`explain` as 3rd arg). Keeps
  * plan iteration (`.explain` until it's the plan you'd want) off the
  * full-corpus Bench path. */
object RunOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val explain = args.contains("explain")
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
    val fn = graft.SparkEntry.queries(name)
    val df = fn(spark, sfDir)
    if (explain) df.explain("formatted")
    val t0 = System.nanoTime()
    val n = df.count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"RUNONE $name rows=$n sec=$sec%.2f")
    graft.queries.QueryCaches.clear()
    // second run exposes warm/index-cached cost
    val t1 = System.nanoTime()
    fn(spark, sfDir).count()
    println(f"RUNONE $name warm_sec=${(System.nanoTime() - t1) / 1e9}%.2f")
    spark.stop()
  }
}
