package graft.lake

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Probe: parquet field-ID write + ID-based read resolution for struct
  * fields INSIDE array elements and map values (the mechanism
  * collection-element evolution needs). */
class ElementIdProbeSpec extends LakeSuite {

  private def meta(id: Int) = new MetadataBuilder()
    .putLong("parquet.field.id", id.toLong).build()

  test("renamed struct fields inside array elements and map values resolve by field ID") {
    import org.apache.spark.sql.graftbridge.SessionBridge
    val dir = java.nio.file.Files.createTempDirectory("graft-el-probe").toString
    import spark.implicits._
    val df = Seq(
      (1, Seq((10, "a")), Map("k" -> (100, "x"))),
      (2, Seq((20, "b"), (21, "c")), Map("k2" -> (200, "y")))
    ).toDF("id", "arr", "m")

    // write with field IDs: id=1, arr=2, arr.element.p1=3, arr.element.p2=4,
    // m=5, m.value.q1=6, m.value.q2=7
    val writeSchema = StructType(Seq(
      StructField("id", IntegerType, nullable = false, meta(1)),
      StructField("arr", ArrayType(StructType(Seq(
        StructField("_1", IntegerType, nullable = false, meta(3)),
        StructField("_2", StringType, nullable = true, meta(4)))), containsNull = true),
        nullable = true, meta(2)),
      StructField("m", MapType(StringType, StructType(Seq(
        StructField("_1", IntegerType, nullable = false, meta(6)),
        StructField("_2", StringType, nullable = true, meta(7)))), valueContainsNull = true),
        nullable = true, meta(5))))
    SessionBridge.withConfs(
      SessionBridge.withSchema(df, writeSchema),
      Map("spark.sql.parquet.fieldId.write.enabled" -> "true"))
      .write.mode("overwrite").parquet(dir)

    // read with RENAMED nested field names but the same IDs
    val readSchema = StructType(Seq(
      StructField("id", IntegerType, nullable = false, meta(1)),
      StructField("arr", ArrayType(StructType(Seq(
        StructField("renamed1", IntegerType, nullable = true, meta(3)),
        StructField("renamed2", StringType, nullable = true, meta(4)))), containsNull = true),
        nullable = true, meta(2)),
      StructField("m", MapType(StringType, StructType(Seq(
        StructField("vr1", IntegerType, nullable = true, meta(6)),
        StructField("vr2", StringType, nullable = true, meta(7)))), valueContainsNull = true),
        nullable = true, meta(5))))
    val back = SessionBridge
      .sessionWithConfs(spark, Map("spark.sql.parquet.fieldId.read.enabled" -> "true"))
      .read.schema(readSchema).parquet(dir)
      .orderBy("id")
    val rows = back.select(col("id"),
      expr("arr[0].renamed1"), expr("arr[0].renamed2"),
      expr("m['k'].vr1")).collect()
    assert(rows(0).getInt(1) === 10 && rows(0).getString(2) === "a")
    assert(rows(0).getInt(3) === 100)
    assert(rows(1).getInt(1) === 20)

    // and a field ADDED to the element (ID with no match) projects null
    val addedSchema = StructType(Seq(
      StructField("id", IntegerType, nullable = false, meta(1)),
      StructField("arr", ArrayType(StructType(Seq(
        StructField("renamed1", IntegerType, nullable = true, meta(3)),
        StructField("fresh", IntegerType, nullable = true, meta(9)))), containsNull = true),
        nullable = true, meta(2))))
    val withAdded = SessionBridge
      .sessionWithConfs(spark, Map("spark.sql.parquet.fieldId.read.enabled" -> "true"))
      .read.schema(addedSchema).parquet(dir).orderBy("id")
      .select(expr("arr[0].renamed1"), expr("arr[0].fresh")).collect()
    assert(withAdded(0).getInt(0) === 10 && withAdded(0).isNullAt(1))
  }
}
