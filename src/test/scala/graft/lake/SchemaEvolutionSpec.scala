package graft.lake

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema evolution: metadata-only commits; old files project new
  * columns as null, dropped columns disappear without rewrites, and
  * mixed-schema cohorts scan under the current schema. */
class SchemaEvolutionSpec extends LakeSuite {

  test("addColumn: old files read null, new appends carry values") {
    val cat = LakeCatalog.open(freshWarehouse())
    val t = cat.createTable("ns", "evolving", ordersDF.schema)
    t.appendData(ordersDF)
    val nOld = ordersDF.count()

    t.refresh().addColumn("o_channel", StringType)
    assert(t.schema.fieldNames.contains("o_channel"))
    val afterAdd = t.newScan().toDF(spark)
    assert(afterAdd.count() === nOld)
    assert(afterAdd.filter(col("o_channel").isNotNull).count() === 0)

    val newRows = ordersDF.limit(10).withColumn("o_channel", lit("web"))
    t.appendData(newRows)
    val mixed = t.refresh().newScan().toDF(spark)
    assert(mixed.count() === nOld + 10)
    assert(mixed.filter(col("o_channel") === "web").count() === 10)
  }

  test("dropColumn: projection ignores stored bytes; no rewrite happened") {
    val cat = LakeCatalog.open(freshWarehouse())
    val t = cat.createTable("ns", "dropping", ordersDF.schema)
    t.appendData(ordersDF)
    val filesBefore = t.refresh().metadata.currentFiles.map(_.path).toSet

    t.dropColumn("o_orderpriority")
    assert(!t.schema.fieldNames.contains("o_orderpriority"))
    val df = t.newScan().toDF(spark)
    assert(!df.columns.contains("o_orderpriority"))
    assert(df.count() === ordersDF.count())
    assert(t.metadata.currentFiles.map(_.path).toSet === filesBefore)
  }

  test("guards: duplicate add, missing drop, partition-source drop all fail") {
    val cat = LakeCatalog.open(freshWarehouse())
    val t = cat.createTable("ns", "guarded", ordersDF.schema,
      spec = Seq(PartitionField("o_orderdate", "year")))
    assertThrows[IllegalArgumentException](t.addColumn("o_custkey", LongType))
    assertThrows[IllegalArgumentException](t.dropColumn("nope"))
    assertThrows[IllegalArgumentException](t.dropColumn("o_orderdate"))
  }

  test("renameColumn: old files resolve the renamed column by field ID") {
    val cat = LakeCatalog.open(freshWarehouse())
    val t = cat.createTable("ns", "renaming", ordersDF.schema)
    t.appendData(ordersDF)
    val expectedSum = ordersDF.agg(sum(col("o_custkey"))).head.getLong(0)

    t.refresh().renameColumn("o_custkey", "buyer_id")
    assert(t.schema.fieldNames.contains("buyer_id"))
    assert(!t.schema.fieldNames.contains("o_custkey"))
    val df = t.newScan().toDF(spark)
    // values come back under the NEW name from files written under the
    // OLD one — name-based projection would read all-null here
    assert(df.filter(col("buyer_id").isNotNull).count() === ordersDF.count())
    assert(df.agg(sum(col("buyer_id"))).head.getLong(0) === expectedSum)

    // appends under the new name mix with pre-rename files
    val more = ordersDF.limit(10).withColumnRenamed("o_custkey", "buyer_id")
      .select(t.schema.fieldNames.map(col): _*)
    t.appendData(more)
    assert(t.refresh().newScan().toDF(spark)
      .filter(col("buyer_id").isNotNull).count() === ordersDF.count() + 10)
  }

  test("renameColumn: stats keys follow, pruning stays exact; restart-durable") {
    val wh = freshWarehouse()
    val cat = LakeCatalog.open(wh)
    val t = cat.createTable("ns", "rn_prune", ordersDF.schema)
    // two files clustered on the key so pruning has bounds to work with
    t.appendData(ordersDF.filter(col("o_orderkey") < 10000).coalesce(1))
    t.refresh().appendData(ordersDF.filter(col("o_orderkey") >= 10000).coalesce(1))
    t.refresh().renameColumn("o_orderkey", "order_id")

    val scan = t.newScan(LakePredicate.Lt("order_id", 10000L))
    assert(scan.planFiles.size === 1) // stats were remapped, still prune
    assert(scan.toDF(spark).count() ===
      ordersDF.filter(col("o_orderkey") < 10000).count())

    val re = LakeCatalog.open(wh).loadTable("ns", "rn_prune")
    assert(re.schema.fieldNames.contains("order_id"))
    assert(re.newScan().toDF(spark)
      .filter(col("order_id").isNotNull).count() === ordersDF.count())
    assertThrows[IllegalArgumentException](re.renameColumn("nope", "x"))
    assertThrows[IllegalArgumentException](re.renameColumn("order_id", "o_custkey"))
  }

  test("schema change survives restart and keeps snapshots intact") {
    val wh = freshWarehouse()
    val cat = LakeCatalog.open(wh)
    val t = cat.createTable("ns", "durable", ordersDF.schema)
    t.appendData(ordersDF)
    t.refresh().addColumn("extra", DoubleType)
    val re = LakeCatalog.open(wh).loadTable("ns", "durable")
    assert(re.schema.fieldNames.contains("extra"))
    assert(re.snapshots.size === 1)
    assert(re.newScan().toDF(spark).count() === ordersDF.count())
  }
}
