package graft.queries

import graft.lake.LakeSuite
import org.apache.spark.sql.types.TimestampType

/** The round-18 Tables internals: the footer-schema catalog must hand
  * back exactly the schema a fresh inference would, and `spread`'s
  * planning-free split estimate must make the same repartition decision
  * the old `df.rdd.getNumPartitions` check made on both sides of the
  * threshold. */
class TablesSpec extends LakeSuite {

  private val d = "/root/testdata/sf0.001"

  test("schema catalog returns the inferred schema and the same rows") {
    val viaCatalog = Tables.orders(spark, d) // first call populates, second hits
    val again = Tables.orders(spark, d)
    val inferred = spark.read.parquet(s"$d/orders.parquet")
    assert(again.schema === inferred.schema)
    assert(viaCatalog.schema === inferred.schema)
    assert(again.count() === inferred.count())
    val a = again.orderBy("o_orderkey").limit(5).collect().toSeq
    val b = inferred.orderBy("o_orderkey").limit(5).collect().toSeq
    assert(a === b)
  }

  test("events ts normalizes to TimestampType through the catalog") {
    Tables.events(spark, d) // populate
    assert(Tables.events(spark, d).schema("ts").dataType === TimestampType)
  }

  test("spread fans a single-file scan to session parallelism") {
    val target = spark.sparkContext.defaultParallelism
    val sp = Tables.spread(Tables.orders(spark, d))
    assert(sp.rdd.getNumPartitions === target)
  }

  test("spread is a no-op when the scan already carries enough splits") {
    val dir = java.nio.file.Files.createTempDirectory("graft_spread_").toString
    // 12 files: openCost padding alone estimates >= defaultParallelism
    // splits, so spread must hand the frame back without a repartition
    spark.range(0, 1200, 1, 12).write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
    assert(Tables.spread(df) eq df)
  }

  test("spread falls back to planned partitions for non-file sources") {
    val target = spark.sparkContext.defaultParallelism
    val local = spark.range(0, 100, 1, 1).toDF("v")
    assert(Tables.spread(local).rdd.getNumPartitions === target)
    val wide = spark.range(0, 100, 1, target + 2).toDF("v")
    assert(Tables.spread(wide) eq wide)
  }
}
