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
