package graft.lake

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Nested COLUMN types (struct / array / map) are first-class table
  * columns: Spark's parquet source reads and writes them natively, the
  * stats harvester simply records no bounds for non-atomic columns
  * (pruning on them is conservatively off; top-level atomic columns
  * keep pruning), and every row-level strategy carries them through.
  * Nested-FIELD evolution (add/rename/drop of `s.f`) is field-ID
  * addressed like top-level columns: IDs live under dotted paths,
  * writes stamp them as nested parquet field IDs, and old files resolve
  * renamed nested fields by ID. Type changes inside structs stay
  * refused — loudly, at ALTER time. */
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

  test("SQL surface reads nested columns; nested type changes refuse loudly") {
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
    // nested TYPE changes take the same lossless-widening contract as
    // top-level ones (WidenSpec covers the allowed set); a lossy change
    // refuses, never half-applies
    val e = intercept[Exception](
      spark.sql("ALTER TABLE nest.ns.t ALTER COLUMN s.x TYPE DOUBLE"))
    assert(e.getMessage.contains("lossless"))
  }

  test("nested-field add/rename/drop: ID-addressed, metadata-only, old files resolve") {
    val wh = freshWarehouse()
    val cat = LakeCatalog.open(wh)
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("s", StructType(Seq(
        StructField("name", StringType, nullable = false),
        StructField("x", LongType, nullable = false))), nullable = false)))
    val t = cat.createTable("ns", "evo", schema, sortOrder = Seq("id"))
    import spark.implicits._
    val batch1 = (1L to 50L).map(i => (i, s"name$i", i * 10)).toDF("id", "n", "x")
      .select(col("id"), struct(col("n").as("name"), col("x").as("x")).as("s"))
    t.appendData(batch1, numFiles = 2)

    // rename a nested field, add another: metadata-only commits
    val filesBefore = t.refresh().metadata.currentFiles.map(_.path).toSet
    t.refresh().renameColumn("s.name", "label")
    t.refresh().addColumn("s.flag", IntegerType)
    assert(t.refresh().metadata.currentFiles.map(_.path).toSet === filesBefore)
    assert(t.schema("s").dataType.asInstanceOf[StructType].fieldNames.toSeq
      === Seq("label", "x", "flag"))

    // OLD files resolve the renamed field BY ID (name matching would
    // read null) and project null for the added one
    val afterEvo = t.newScan().toDF(spark)
    assert(afterEvo.count() === 50L)
    assert(afterEvo.filter(col("s.label").isNull).count() === 0L)
    assert(afterEvo.filter(col("id") === 7L).select("s.label").head.getString(0)
      === "name7")
    assert(afterEvo.filter(col("s.flag").isNotNull).count() === 0L)

    // a second batch under the NEW schema: both generations coexist
    val batch2 = (51L to 80L).map(i => (i, s"name$i", i * 10, i.toInt))
      .toDF("id", "n", "x", "f")
      .select(col("id"), struct(col("n").as("label"), col("x").as("x"),
        col("f").as("flag")).as("s"))
    t.refresh().appendData(batch2, numFiles = 1)
    val mixed = t.refresh().newScan().toDF(spark)
    assert(mixed.count() === 80L)
    assert(mixed.filter(col("s.label").isNull).count() === 0L)
    assert(mixed.filter(col("s.flag").isNotNull).count() === 30L)
    assert(mixed.filter(col("id") === 60L).select("s.flag").head.getInt(0) === 60)

    // pruning on sibling TOP-LEVEL columns stays exact through the
    // nested evolution
    assert(t.newScan(LakePredicate.Le("id", Long.box(25L))).planFiles.size
      < t.refresh().metadata.currentFiles.size)
    assert(t.newScan(LakePredicate.Le("id", Long.box(25L))).toDF(spark).count() === 25L)

    // drop the nested field: projection omits it everywhere; its ID
    // retires (never reused)
    t.refresh().alterSchema(Seq(SchemaChange.Drop("s.flag")))
    val dropped = t.refresh().newScan().toDF(spark)
    assert(dropped.select("s.*").columns.toSeq === Seq("label", "x"))
    assert(dropped.count() === 80L)
    assert(!t.metadata.fieldIds.contains("s.flag"))

    // restart durability: dotted field IDs round-trip the metadata JSON
    val re = LakeCatalog.open(wh).loadTable("ns", "evo")
    assert(re.metadata.fieldIds("s.label") === t.metadata.fieldIds("s.label"))
    assert(re.newScan().toDF(spark).filter(col("id") === 7L)
      .select("s.label").head.getString(0) === "name7")
  }

  test("SQL nested-field evolution: ADD/RENAME/DROP COLUMN s.f") {
    val wh = freshWarehouse()
    spark.conf.set("spark.sql.catalog.nevo", classOf[sql.LakeSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.nevo.warehouse", wh)
    spark.sql("CREATE NAMESPACE nevo.ns")
    spark.sql("CREATE TABLE nevo.ns.t (id BIGINT, s STRUCT<name:STRING, x:BIGINT>)")
    val t = LakeCatalog.open(wh).loadTable("ns", "t")
    import spark.implicits._
    t.appendData((1L to 20L).map(i => (i, s"n$i", i)).toDF("id", "n", "x")
      .select(col("id"), struct(col("n").as("name"), col("x").as("x")).as("s")))

    spark.sql("ALTER TABLE nevo.ns.t RENAME COLUMN s.name TO label")
    spark.sql("ALTER TABLE nevo.ns.t ADD COLUMN s.note STRING")
    assert(spark.sql("SELECT s.label FROM nevo.ns.t WHERE id = 3").head.getString(0)
      === "n3")
    assert(spark.sql("SELECT count(*) FROM nevo.ns.t WHERE s.note IS NULL")
      .head.getLong(0) === 20L)
    spark.sql("ALTER TABLE nevo.ns.t DROP COLUMN s.note")
    assert(!spark.table("nevo.ns.t").schema("s").dataType
      .asInstanceOf[StructType].fieldNames.contains("note"))
    // guards: duplicate target, missing field, last-field drop
    assertThrows[Exception](
      spark.sql("ALTER TABLE nevo.ns.t RENAME COLUMN s.label TO x"))
    assertThrows[Exception](
      spark.sql("ALTER TABLE nevo.ns.t DROP COLUMN s.nope"))
  }
}
