package graft.lake

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Collection-element evolution (the last §2.G refusal): add / rename /
  * drop / widen of FIELDS inside array-element and map-value structs,
  * addressed through Iceberg's path markers (`arr.element.f`,
  * `m.value.f`) — field-ID addressed and metadata-only, like every
  * other evolution. Map KEYS are identity and stay unaddressable.
  * ElementIdProbeSpec pins the parquet mechanism (ID-based resolve
  * inside collections) this rides on. */
class CollectionEvolutionSpec extends LakeSuite {

  private def mk(rows: Seq[(Int, Seq[(Int, String)], Map[String, Tuple1[Int]])]) = {
    import spark.implicits._
    rows.toDF("id", "arr", "m")
      .select(col("id"),
        col("arr").cast("array<struct<a:int,b:string>>").as("arr"),
        col("m").cast("map<string,struct<x:int>>").as("m"))
  }

  test("rename/add/widen/drop inside array elements and map values, ID-addressed") {
    val cat = LakeCatalog.open(freshWarehouse())
    val v1 = mk((1 to 20).map(i =>
      (i, Seq((i, s"b$i"), (i + 1, s"c$i")), Map(s"k$i" -> Tuple1(i)))))
    val t = cat.createTable("ns", "coll", v1.schema)
    t.appendData(v1, numFiles = 2)

    // element paths got IDs at creation
    assert(t.metadata.fieldIds.contains("arr.element.a"))
    assert(t.metadata.fieldIds.contains("m.value.x"))
    val aId = t.metadata.fieldIds("arr.element.a")

    // RENAME by ID: old files keep resolving the renamed element field
    t.refresh().alterSchema(Seq(
      SchemaChange.Rename("arr.element.a", "qty"),
      SchemaChange.Rename("m.value.x", "score")))
    assert(t.refresh().metadata.fieldIds("arr.element.qty") === aId)
    val renamed = t.refresh().newScan().toDF(spark)
    assert(renamed.select(expr("arr[0].qty")).where(col("id") === 5)
      .head().getInt(0) === 5)
    assert(renamed.select(expr("m['k7'].score")).where(col("id") === 7)
      .head().getInt(0) === 7)

    // WIDEN inside the element (int → bigint): metadata-only, old files
    // widen at read; ADD a new element field: old files project null
    t.refresh().alterSchema(Seq(
      SchemaChange.Widen("arr.element.qty", LongType),
      SchemaChange.Add("arr.element.disc", IntegerType)))
    val widened = t.refresh().newScan().toDF(spark)
    assert(widened.schema("arr").dataType.asInstanceOf[ArrayType]
      .elementType.asInstanceOf[StructType]("qty").dataType === LongType)
    assert(widened.select(expr("arr[1].qty")).where(col("id") === 5)
      .head().getLong(0) === 6L)
    assert(widened.select(expr("arr[0].disc")).where(col("id") === 5)
      .head().isNullAt(0))

    // post-evolution files carry real values; both generations mix
    import spark.implicits._
    val v2 = (21 to 30).map(i =>
      (i, Seq((i.toLong, s"b$i", 9)), Map(s"k$i" -> Tuple1(i))))
      .toDF("id", "arr", "m")
      .select(col("id"),
        col("arr").cast("array<struct<qty:bigint,b:string,disc:int>>").as("arr"),
        col("m").cast("map<string,struct<score:int>>").as("m"))
    t.refresh().appendData(v2)
    val mixed = t.refresh().newScan().toDF(spark)
    assert(mixed.count() === 30L)
    assert(mixed.where(expr("arr[0].disc = 9")).count() === 10L)
    assert(mixed.where(expr("arr[0].disc IS NULL")).count() === 20L)
    assert(mixed.select(sum(expr("arr[0].qty"))).head().getLong(0) ===
      (1 to 30).map(_.toLong).sum)

    // DROP an element field: projection drops it, bytes stay behind
    t.refresh().alterSchema(Seq(SchemaChange.Drop("arr.element.b")))
    val dropped = t.refresh().newScan().toDF(spark)
    assert(!dropped.schema("arr").dataType.asInstanceOf[ArrayType]
      .elementType.asInstanceOf[StructType].fieldNames.contains("b"))
    assert(!t.refresh().metadata.fieldIds.contains("arr.element.b"))
    assert(dropped.count() === 30L)

    // restart durability: reopen and read the evolved shape
    val re = LakeCatalog.open(cat.warehouse.uri).loadTable("ns", "coll")
    assert(re.newScan().toDF(spark)
      .select(sum(expr("arr[0].qty"))).head().getLong(0) ===
      (1 to 30).map(_.toLong).sum)

    // map KEYS stay unaddressable; lossy element changes refuse
    intercept[IllegalArgumentException](
      t.refresh().alterSchema(Seq(SchemaChange.Rename("m.key", "kk"))))
    intercept[IllegalArgumentException](
      t.refresh().alterSchema(Seq(
        SchemaChange.Widen("arr.element.qty", IntegerType))))
  }

  test("SQL surface: ALTER TABLE through element paths; reads stay exact") {
    val wh = freshWarehouse()
    spark.conf.set("spark.sql.catalog.cev", classOf[sql.LakeSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.cev.warehouse", wh)
    try {
      spark.sql("CREATE NAMESPACE cev.ns")
      spark.sql("CREATE TABLE cev.ns.t (id INT, pts ARRAY<STRUCT<x: INT, y: INT>>)")
      spark.sql("INSERT INTO cev.ns.t VALUES " +
        "(1, array(named_struct('x', 10, 'y', 11))), " +
        "(2, array(named_struct('x', 20, 'y', 21)))")
      spark.sql("ALTER TABLE cev.ns.t RENAME COLUMN pts.element.x TO lon")
      spark.sql("ALTER TABLE cev.ns.t ADD COLUMN pts.element.z INT")
      spark.sql("ALTER TABLE cev.ns.t ALTER COLUMN pts.element.lon TYPE BIGINT")
      val rows = spark.sql(
        "SELECT id, pts[0].lon, pts[0].z FROM cev.ns.t ORDER BY id").collect()
      assert(rows.map(_.getLong(1)).toSeq === Seq(10L, 20L))
      assert(rows.forall(_.isNullAt(2)))
      spark.sql("INSERT INTO cev.ns.t VALUES " +
        "(3, array(named_struct('lon', CAST(30 AS BIGINT), 'y', 31, 'z', 32)))")
      assert(spark.sql("SELECT sum(pts[0].lon) FROM cev.ns.t").head().getLong(0) === 60L)
      assert(spark.sql("SELECT count(*) FROM cev.ns.t WHERE pts[0].z IS NULL")
        .head().getLong(0) === 2L)
    } finally {
      spark.conf.unset("spark.sql.catalog.cev")
      spark.conf.unset("spark.sql.catalog.cev.warehouse")
    }
  }
}
