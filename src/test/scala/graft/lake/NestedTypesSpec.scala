package graft.lake

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Nested COLUMN types (struct / array / map) are first-class table
  * columns: Spark's parquet source reads and writes them natively, the
  * stats harvester simply records no bounds for non-atomic columns
  * (pruning on them is conservatively off; top-level atomic columns
  * keep pruning), and every row-level strategy carries them through.
  * What stays refused — loudly, at ALTER time — is nested-FIELD
  * evolution: the schema-evolution model is top-level-column only. */
class NestedTypesSpec extends LakeSuite {

  private def nestedDF = {
    import spark.implicits._
    (1L to 100L).map(i =>
      (i, (s"name$i", i * 10), Seq(i.toDouble, i + 0.5), Map(s"k$i" -> i)))
      .toDF("id", "s", "arr", "m")
  }

  test("struct/array/map columns round-trip through append, scan, pruning, CoW and MoR") {
    val cat = LakeCatalog.open(freshWarehouse())
    val df = nestedDF
    val t = cat.createTable("ns", "nested", df.schema, sortOrder = Seq("id"))
    t.appendData(df, numFiles = 4)

    val back = t.refresh().newScan().toDF(spark)
    assert(back.count() === 100L)
    // parquet reads surface as nullable: compare names + erased types
    assert(back.schema.fields.map(f => (f.name, f.dataType.simpleString)).toSeq
      === df.schema.fields.map(f => (f.name, f.dataType.simpleString)).toSeq)
    assert(back.filter(col("id") === 7L).select(col("s._2")).head.getLong(0) === 70L)
    assert(back.filter(col("id") === 7L).select(element_at(col("arr"), 2))
      .head.getDouble(0) === 7.5)

    // pruning on the top-level atomic column works alongside nested cols
    assert(t.newScan(LakePredicate.Le("id", Long.box(25L))).planFiles.size
      < t.refresh().metadata.currentFiles.size)
    assert(t.newScan(LakePredicate.Le("id", Long.box(25L))).toDF(spark).count() === 25L)

    // copy-on-write update on an atomic column carries nested data intact
    t.refresh().updateWhere(spark, LakePredicate.Le("id", Long.box(10L)),
      Map("id" -> (col("id") + 1000L)))
    val upd = t.refresh().newScan().toDF(spark)
    assert(upd.filter(col("id") === 1007L).select(col("s._1")).head.getString(0)
      === "name7")

    // merge-on-read delete composes with nested columns (ids 90..100)
    t.refresh().deleteWhereMoR(spark, LakePredicate.And(
      LakePredicate.Ge("id", Long.box(90L)), LakePredicate.Le("id", Long.box(100L))))
    assert(t.refresh().newScan().toDF(spark).count() === 89L)

    // a rename of the nested COLUMN itself is metadata-only and old
    // files resolve it by field ID
    t.refresh().renameColumn("s", "person")
    val ren = t.refresh().newScan().toDF(spark)
    assert(ren.select(col("person._1")).count() === 89L)
  }

  test("SQL surface reads nested columns; nested-field ALTER refuses loudly") {
    val wh = freshWarehouse()
    spark.conf.set("spark.sql.catalog.nest", classOf[sql.LakeSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.nest.warehouse", wh)
    spark.sql("CREATE NAMESPACE nest.ns")
    spark.sql("CREATE TABLE nest.ns.t (id BIGINT, s STRUCT<name:STRING, x:BIGINT>, " +
      "arr ARRAY<DOUBLE>, m MAP<STRING, BIGINT>)")
    val t = LakeCatalog.open(wh).loadTable("ns", "t")
    t.appendData(nestedDF.withColumnRenamed("_1", "id")
      .select(col("id"),
        col("s").cast("struct<name:string,x:bigint>").as("s"), col("arr"), col("m")))
    assert(spark.sql("SELECT count(*) FROM nest.ns.t WHERE s.x > 500").head.getLong(0)
      === nestedDF.filter(col("s._2") > 500).count())
    assert(spark.sql("SELECT sum(arr[0]) FROM nest.ns.t").head.getDouble(0)
      === nestedDF.select(sum(element_at(col("arr"), 1))).head.getDouble(0))
    // nested-FIELD evolution is out of the schema model: refuse, never
    // half-apply
    val e = intercept[Exception](
      spark.sql("ALTER TABLE nest.ns.t RENAME COLUMN s.name TO label"))
    assert(e.getMessage.contains("nested"))
  }
}
