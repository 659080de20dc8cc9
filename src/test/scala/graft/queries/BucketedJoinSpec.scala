package graft.queries

import org.apache.spark.sql.functions._
import graft.lake.LakeSuite

/** The bucketed join must be exchange-free: with broadcast disabled,
  * two tables bucketed+sorted on the join key join as a SortMergeJoin
  * with NO shuffle on either side. */
class BucketedJoinSpec extends LakeSuite {

  test("bucketed fact-fact join plans with zero exchanges") {
    val d = "/root/testdata/sf0.001"
    val wh = java.nio.file.Files.createTempDirectory("graft_bkt_spec_").toString
    spark.sql("DROP TABLE IF EXISTS spec_bkt_orders")
    spark.sql("DROP TABLE IF EXISTS spec_bkt_lineitem")
    spark.read.parquet(s"$d/orders.parquet").write.format("parquet")
      .option("path", s"$wh/o").bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("spec_bkt_orders")
    spark.read.parquet(s"$d/lineitem.parquet").write.format("parquet")
      .option("path", s"$wh/l").bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("spec_bkt_lineitem")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("spec_bkt_orders")
        .join(spark.table("spec_bkt_lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_orderkey"), col("l_extendedprice"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
      // and it is not just a pretty plan — the rows are right
      val expected = spark.read.parquet(s"$d/lineitem.parquet").count()
      assert(joined.count() === expected)
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }
}
