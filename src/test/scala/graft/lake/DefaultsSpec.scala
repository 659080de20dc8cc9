package graft.lake

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Initial column defaults (Iceberg v3's initial-default): a column
  * added with a default reads the default from every file written
  * BEFORE the add — resolved per FILE by the parquet reader's
  * existence-default machinery, never a blanket coalesce (a null
  * explicitly WRITTEN after the add stays null). ID-keyed, so renames
  * keep the default and drops retire it. */
class DefaultsSpec extends LakeSuite {

  test("pre-add files read the default; post-add values and explicit nulls are untouched") {
    import spark.implicits._
    val v1 = (1 to 40).map(i => (i, s"d$i")).toDF("id", "body")
    val cat = LakeCatalog.open(freshWarehouse())
    val t = cat.createTable("ns", "dflt", v1.schema)
    t.appendData(v1, numFiles = 2)

    t.refresh().addColumnWithDefault("src", StringType, "web")
    // every pre-add row reads the default
    val afterAdd = t.refresh().newScan().toDF(spark)
    assert(afterAdd.where(col("src") === "web").count() === 40L)

    // post-add appends carry real values — and explicitly written NULLs
    // STAY null (existence default ≠ coalesce)
    val v2 = (41 to 60).map(i => (i, s"d$i", "api")).toDF("id", "body", "src")
    val v3 = (61 to 70).map(i => (i, s"d$i", null: String)).toDF("id", "body", "src")
    t.refresh().appendData(v2)
    t.refresh().appendData(v3)
    val all = t.refresh().newScan().toDF(spark)
    assert(all.where(col("src") === "web").count() === 40L)
    assert(all.where(col("src") === "api").count() === 20L)
    assert(all.where(col("src").isNull).count() === 10L)

    // stats pruning on OTHER columns composes (defaulted col has no
    // stats in pre-add files — conservative, never wrong)
    assert(t.refresh().newScan(LakePredicate.Le("id", Int.box(10)))
      .toDF(spark).count() === 10L)

    // rename keeps the default (ID-keyed)
    t.refresh().renameColumn("src", "origin")
    assert(t.refresh().newScan().toDF(spark)
      .where(col("origin") === "web").count() === 40L)

    // a CoW update rewrite MATERIALIZES defaults into real bytes
    t.refresh().updateWhere(spark, LakePredicate.Le("id", Int.box(5)),
      Map("body" -> lit("rewritten")))
    val post = t.refresh().newScan().toDF(spark)
    assert(post.where(col("id") <= 5 && col("origin") === "web").count() === 5L)

    // numeric default + restart durability
    t.refresh().addColumnWithDefault("score", IntegerType, 7)
    val reopened = LakeCatalog.open(cat.warehouse.uri).loadTable("ns", "dflt")
    val re = reopened.newScan().toDF(spark)
    assert(re.where(col("score") === 7).count() === 70L)

    // drop retires the default; re-adding plain reads null everywhere
    reopened.refresh().dropColumn("score")
    reopened.refresh().addColumn("score", IntegerType)
    assert(reopened.refresh().newScan().toDF(spark)
      .where(col("score").isNotNull).count() === 0L)

    // defaults refuse on nested paths and complex types
    intercept[IllegalArgumentException](
      reopened.refresh().alterSchema(Seq(
        SchemaChange.AddWithDefault("s.x", IntegerType, "1"))))
  }

  test("SQL surface: CREATE TABLE DEFAULT, INSERT filling, ALTER ADD COLUMN DEFAULT") {
    val wh = freshWarehouse()
    spark.conf.set("spark.sql.catalog.dft", classOf[sql.LakeSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.dft.warehouse", wh)
    try {
      spark.sql("CREATE NAMESPACE dft.ns")
      spark.sql("CREATE TABLE dft.ns.t (id INT, src STRING DEFAULT 'web')")
      // INSERT omitting the column fills the CURRENT default
      spark.sql("INSERT INTO dft.ns.t (id) VALUES (1)")
      spark.sql("INSERT INTO dft.ns.t VALUES (2, 'api')")
      val rows = spark.sql("SELECT id, src FROM dft.ns.t ORDER BY id").collect()
      assert(rows.map(r => (r.getInt(0), r.getString(1))).toSeq ===
        Seq((1, "web"), (2, "api")))

      // ALTER ADD COLUMN DEFAULT: rows already written read the default
      spark.sql("ALTER TABLE dft.ns.t ADD COLUMN score BIGINT DEFAULT 7")
      assert(spark.sql("SELECT count(*) FROM dft.ns.t WHERE score = 7")
        .head.getLong(0) === 2L)
      // and a post-add INSERT that omits it ALSO fills 7 (current
      // default), while explicit values land verbatim
      spark.sql("INSERT INTO dft.ns.t (id, src) VALUES (3, 'cli')")
      spark.sql("INSERT INTO dft.ns.t VALUES (4, 'sdk', 9)")
      val scores = spark.sql("SELECT id, score FROM dft.ns.t ORDER BY id").collect()
      assert(scores.map(r => (r.getInt(0), r.getLong(1))).toSeq ===
        Seq((1, 7L), (2, 7L), (3, 7L), (4, 9L)))
    } finally {
      spark.conf.unset("spark.sql.catalog.dft")
      spark.conf.unset("spark.sql.catalog.dft.warehouse")
    }
  }

  test("addFiles-imported files missing a defaulted column read the default") {
    import spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("graft-ext-dflt").toString
    (1 to 30).map(i => (i, s"d$i")).toDF("id", "body")
      .write.mode("overwrite").parquet(src)

    val cat = LakeCatalog.open(freshWarehouse())
    val t = cat.createTable("ns", "impd", StructType(Seq(
      StructField("id", IntegerType), StructField("body", StringType))))
    t.addFiles(spark, src)
    t.refresh().addColumnWithDefault("lang", StringType, "en")
    val back = t.refresh().newScan().toDF(spark)
    assert(back.where(col("lang") === "en").count() === 30L)
  }
}
