package graft.lake

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Lossless type widening (Iceberg's promotion set): metadata-only —
  * the field keeps its ID, Spark's parquet reader widens old files'
  * narrower physical values at read, manifest stat strings parse under
  * the new type, and equality tombstones keep applying through the
  * same ID-matched read. */
class WidenSpec extends LakeSuite {

  private def df100 = {
    import spark.implicits._
    (1 to 100).map(i => (i, i * 1.5f, s"r$i")).toDF("i", "f", "s")
  }

  test("int→bigint and float→double widen across old and new files; pruning stays exact") {
    val cat = LakeCatalog.open(freshWarehouse())
    val t = cat.createTable("ns", "w", df100.schema, sortOrder = Seq("i"))
    t.appendData(df100, numFiles = 4)
    val filesBefore = t.refresh().metadata.currentFiles.map(_.path).toSet

    t.refresh().alterSchema(Seq(
      SchemaChange.Widen("i", LongType), SchemaChange.Widen("f", DoubleType)))
    // metadata-only: no file was touched
    assert(t.refresh().metadata.currentFiles.map(_.path).toSet === filesBefore)
    assert(t.schema("i").dataType === LongType)

    // old files read back widened, values intact
    val back = t.newScan().toDF(spark)
    assert(back.schema("i").dataType === LongType)
    assert(back.schema("f").dataType === DoubleType)
    assert(back.agg(sum("i")).head.getLong(0) === (1 to 100).map(_.toLong).sum)

    // a post-widen append mixes wide files with narrow ones
    import spark.implicits._
    val more = (101L to 200L).map(i => (i, i * 1.5d, s"r$i")).toDF("i", "f", "s")
    t.refresh().appendData(more, numFiles = 4)
    val all = t.refresh().newScan().toDF(spark)
    assert(all.count() === 200L)

    // stats pruning stays exact over the MIXED files (old stats strings
    // parse under the widened type)
    val pred = LakePredicate.Le("i", Long.box(50L))
    assert(t.newScan(pred).planFiles.size < t.metadata.currentFiles.size)
    assert(t.newScan(pred).toDF(spark).count() === 50L)
    assert(t.newScan(LakePredicate.Ge("i", Long.box(150L))).toDF(spark).count() === 51L)

    // refusals: narrowing, non-numeric, unknown column
    intercept[IllegalArgumentException](t.refresh().widenColumn("i", IntegerType))
    intercept[IllegalArgumentException](t.refresh().widenColumn("s", LongType))
    intercept[IllegalArgumentException](t.refresh().widenColumn("nope", LongType))
  }

  test("SQL ALTER COLUMN TYPE widens; equality tombstones survive a key widening") {
    val wh = freshWarehouse()
    spark.conf.set("spark.sql.catalog.wd", classOf[sql.LakeSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.wd.warehouse", wh)
    spark.sql("CREATE NAMESPACE wd.ns")
    spark.sql("CREATE TABLE wd.ns.t (i INT, f FLOAT, s STRING)")
    val t = LakeCatalog.open(wh).loadTable("ns", "t")
    t.appendData(df100)

    // MoR upsert keyed on the INT column, tombstones live...
    import spark.implicits._
    val upd = (1 to 10).map(i => (i, i * 100.0f, s"u$i")).toDF("i", "f", "s")
    t.refresh().mergeIntoMoR(spark, upd, Seq("i"))
    // ...then widen the KEY column while the tombstones are live
    spark.sql("ALTER TABLE wd.ns.t ALTER COLUMN i TYPE BIGINT")
    val out = t.refresh().newScan().toDF(spark)
    assert(out.count() === 100L)
    // the upserted rows won (old-key rows stay tombstoned through the
    // widened, ID-matched key read)
    assert(out.filter(col("i") <= 10L && !col("s").startsWith("u")).count() === 0L)
    // SQL agrees
    assert(spark.sql("SELECT count(*) FROM wd.ns.t WHERE s LIKE 'u%'").head.getLong(0)
      === 10L)
    // narrowing refuses through SQL too
    intercept[Exception](spark.sql("ALTER TABLE wd.ns.t ALTER COLUMN i TYPE INT"))
  }

  test("nested field widens in place: old files' narrower leaves read widened, new files mix") {
    import spark.implicits._
    val df = (1 to 60).map(i => (i, (s"t$i", i, i * 1.5f))).toDF("id", "s")
    val cat = LakeCatalog.open(freshWarehouse())
    val t = cat.createTable("ns", "nw", df.schema)
    t.appendData(df, numFiles = 2)

    t.refresh().alterSchema(Seq(
      SchemaChange.Widen("s._2", LongType), SchemaChange.Widen("s._3", DoubleType)))
    val st = t.refresh().schema("s").dataType.asInstanceOf[StructType]
    assert(st("_2").dataType === LongType)
    assert(st("_3").dataType === DoubleType)

    // old files (int/float leaves) read back widened, values intact
    val back = t.newScan().toDF(spark)
    assert(back.select(sum("s._2")).head.getLong(0) === (1 to 60).map(_.toLong).sum)

    // new files land with the wide types and both generations mix
    val more = (61 to 80).map(i => (i, (s"t$i", i.toLong, i * 1.5d))).toDF("id", "s")
    t.refresh().appendData(more)
    val all = t.refresh().newScan().toDF(spark)
    assert(all.select(sum("s._2")).head.getLong(0) === (1 to 80).map(_.toLong).sum)
    assert(math.abs(all.select(sum("s._3")).head.getDouble(0) -
      (1 to 80).map(_ * 1.5d).sum) < 1e-6)

    // nested rename AFTER the widen still resolves by field ID
    t.refresh().renameColumn("s._2", "cnt")
    assert(t.refresh().newScan().toDF(spark)
      .select(sum("s.cnt")).head.getLong(0) === (1 to 80).map(_.toLong).sum)

    // narrowing / non-numeric nested changes refuse
    intercept[IllegalArgumentException](
      t.refresh().widenColumn("s.cnt", IntegerType))
    intercept[IllegalArgumentException](
      t.refresh().widenColumn("s._1", LongType))

    // SQL surface: ALTER COLUMN s.f TYPE BIGINT on a DDL-created table
    val wh2 = freshWarehouse()
    spark.conf.set("spark.sql.catalog.wn", classOf[sql.LakeSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.wn.warehouse", wh2)
    try {
      spark.sql("CREATE NAMESPACE wn.ns")
      spark.sql("CREATE TABLE wn.ns.t (id INT, s STRUCT<a: STRING, n: INT>)")
      val t2 = LakeCatalog.open(wh2).loadTable("ns", "t")
      val src = (1 to 30).map(i => (i, (s"a$i", i))).toDF("id", "s")
      t2.appendData(src.select(col("id"), col("s").cast(t2.schema("s").dataType)))
      spark.sql("ALTER TABLE wn.ns.t ALTER COLUMN s.n TYPE BIGINT")
      assert(spark.sql("SELECT sum(s.n) FROM wn.ns.t").head.getLong(0)
        === (1 to 30).map(_.toLong).sum)
    } finally {
      spark.conf.unset("spark.sql.catalog.wn")
      spark.conf.unset("spark.sql.catalog.wn.warehouse")
    }
  }

  test("bare collection elements widen: array<int>→array<bigint>, map values; keys refuse") {
    import spark.implicits._
    val df = (1 to 60).map(i =>
      (i, Seq(i, i + 1), Map(s"k$i" -> i), Seq(i * 1.5f))).toDF("id", "arr", "m", "fs")
    val cat = LakeCatalog.open(freshWarehouse())
    val t = cat.createTable("ns", "ew", df.schema)
    t.appendData(df, numFiles = 2)
    val filesBefore = t.refresh().metadata.currentFiles.map(_.path).toSet

    t.refresh().alterSchema(Seq(
      SchemaChange.Widen("arr.element", LongType),
      SchemaChange.Widen("m.value", LongType),
      SchemaChange.Widen("fs.element", DoubleType)))
    // metadata-only: no file rewritten
    assert(t.refresh().metadata.currentFiles.map(_.path).toSet === filesBefore)
    assert(t.refresh().schema("arr").dataType
      .asInstanceOf[ArrayType].elementType === LongType)
    assert(t.refresh().schema("m").dataType
      .asInstanceOf[MapType].valueType === LongType)

    // old (narrow) files read back widened, values intact
    val back = t.newScan().toDF(spark)
    assert(back.schema("arr").dataType.asInstanceOf[ArrayType].elementType === LongType)
    assert(back.select(sum(expr("aggregate(arr, 0L, (a, x) -> a + x)")))
      .head.getLong(0) === (1 to 60).map(i => 2L * i + 1).sum)
    assert(back.select(sum(expr("element_at(map_values(m), 1)")))
      .head.getLong(0) === (1 to 60).map(_.toLong).sum)

    // post-widen append mixes wide files with narrow ones
    val more = (61 to 80).map(i =>
      (i, Seq(i.toLong, i + 1L), Map(s"k$i" -> i.toLong), Seq(i * 1.5d)))
      .toDF("id", "arr", "m", "fs")
    t.refresh().appendData(more)
    val all = t.refresh().newScan().toDF(spark)
    assert(all.count() === 80L)
    assert(all.select(sum(expr("aggregate(arr, 0L, (a, x) -> a + x)")))
      .head.getLong(0) === (1 to 80).map(i => 2L * i + 1).sum)

    // refusals: map key, non-numeric element, narrowing, struct leaf
    val te = t.refresh()
    intercept[IllegalArgumentException](te.widenColumn("m.key", LongType))
    intercept[IllegalArgumentException](te.widenColumn("arr.element", IntegerType))
    intercept[IllegalArgumentException](
      cat.createTable("ns", "sarr",
        new StructType().add("a", ArrayType(StringType)))
        .widenColumn("a.element", LongType))

    // SQL surface over a DDL-created table, mixed generations
    val wh2 = freshWarehouse()
    spark.conf.set("spark.sql.catalog.we", classOf[sql.LakeSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.we.warehouse", wh2)
    try {
      spark.sql("CREATE NAMESPACE we.ns")
      spark.sql("CREATE TABLE we.ns.t (id INT, xs ARRAY<INT>)")
      val t2 = LakeCatalog.open(wh2).loadTable("ns", "t")
      t2.appendData((1 to 30).map(i => (i, Seq(i))).toDF("id", "xs"))
      spark.sql("ALTER TABLE we.ns.t ALTER COLUMN xs.element TYPE BIGINT")
      spark.sql("INSERT INTO we.ns.t VALUES (31, array(9999999999))")
      assert(spark.sql(
        "SELECT sum(aggregate(xs, 0L, (a, x) -> a + x)) FROM we.ns.t")
        .head.getLong(0) === (1 to 30).map(_.toLong).sum + 9999999999L)
    } finally {
      spark.conf.unset("spark.sql.catalog.we")
      spark.conf.unset("spark.sql.catalog.we.warehouse")
    }
  }
}
