package graft.lake.sql

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.lake.{LakeCatalog, LakeSuite, MergeClauseSpec}

/** Full-grammar `MERGE INTO` (round-12 headline): clause conditions,
  * WHEN MATCHED DELETE, multiple first-match-wins clauses, partial
  * inserts, WHEN NOT MATCHED BY SOURCE, NULL-key sources, duplicate-key
  * refusal, MERGE WITH SCHEMA EVOLUTION — through SQL and through the
  * Scala API ([[graft.lake.LakeTable.mergeIntoConditional]]). */
class ConditionalMergeSpec extends LakeSuite {

  private def freshCat(tag: String): (String, LakeCatalog) = {
    val wh = freshWarehouse()
    val name = s"cmrg$tag"
    spark.conf.set(s"spark.sql.catalog.$name", classOf[LakeSqlCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $name.ns")
    (name, LakeCatalog.open(wh))
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[Row] =
    df.collect().toSeq

  test("CDC batch: conditioned DELETE / UPDATE / filtered INSERT in one MERGE") {
    val (c, cat) = freshCat("cdc")
    spark.sql(s"CREATE TABLE $c.ns.t (id BIGINT, qty INT, status STRING)")
    spark.sql(s"INSERT INTO $c.ns.t VALUES (1,10,'A'),(2,20,'A'),(3,30,'A'),(4,40,'A')")
    spark.sql(
      """SELECT * FROM VALUES
        |  (1L, 5,  'B',  'U'),
        |  (2L, 0,  CAST(NULL AS STRING), 'D'),
        |  (5L, 50, 'A',  'I'),
        |  (6L, 60, 'A',  'D')
        |AS src(id, qty, status, op)""".stripMargin)
      .createOrReplaceTempView("cdc_src")
    spark.sql(
      s"""MERGE INTO $c.ns.t AS t USING cdc_src AS s ON t.id = s.id
         |WHEN MATCHED AND s.op = 'D' THEN DELETE
         |WHEN MATCHED THEN UPDATE SET qty = s.qty, status = s.status
         |WHEN NOT MATCHED AND s.op <> 'D' THEN
         |  INSERT (id, qty, status) VALUES (s.id, s.qty, s.status)""".stripMargin)
    val got = rows(spark.sql(s"SELECT * FROM $c.ns.t ORDER BY id"))
    assert(got === Seq(
      Row(1L, 5, "B"),    // matched, op=U → second clause updates
      Row(3L, 30, "A"),   // untouched (2 deleted by first clause)
      Row(4L, 40, "A"),
      Row(5L, 50, "A")))  // inserted; 6 filtered out by insert condition
    // the mutation is one snapshot (one atomic commit)
    assert(cat.loadTable("ns", "t").metadata.currentSnapshot.get.operation
      === "overwrite")
  }

  test("first-match-wins across multiple MATCHED clauses, condition on OLD row") {
    val (c, _) = freshCat("fmw")
    spark.sql(s"CREATE TABLE $c.ns.t (id BIGINT, qty INT, status STRING)")
    spark.sql(s"INSERT INTO $c.ns.t VALUES (1,5,'x'),(2,20,'x'),(3,35,'x')")
    spark.sql("SELECT * FROM VALUES (1L),(2L),(3L) AS s(id)")
      .createOrReplaceTempView("fmw_src")
    spark.sql(
      s"""MERGE INTO $c.ns.t AS t USING fmw_src AS s ON t.id = s.id
         |WHEN MATCHED AND t.qty >= 30 THEN UPDATE SET status = 'BIG'
         |WHEN MATCHED AND t.qty >= 20 THEN UPDATE SET status = 'MID'
         |WHEN MATCHED THEN UPDATE SET status = 'SMALL'""".stripMargin)
    assert(rows(spark.sql(s"SELECT * FROM $c.ns.t ORDER BY id")) === Seq(
      Row(1L, 5, "SMALL"), Row(2L, 20, "MID"), Row(3L, 35, "BIG")))
  }

  test("conditional UPDATE assignments read the OLD row (swap semantics)") {
    val (c, _) = freshCat("swap")
    spark.sql(s"CREATE TABLE $c.ns.t (id BIGINT, a INT, b INT)")
    spark.sql(s"INSERT INTO $c.ns.t VALUES (1, 10, 20), (2, 1, 2)")
    spark.sql("SELECT * FROM VALUES (1L, true) AS s(id, doswap)")
      .createOrReplaceTempView("swap_src")
    spark.sql(
      s"""MERGE INTO $c.ns.t AS t USING swap_src AS s ON t.id = s.id
         |WHEN MATCHED AND s.doswap THEN UPDATE SET a = t.b, b = t.a""".stripMargin)
    assert(rows(spark.sql(s"SELECT * FROM $c.ns.t ORDER BY id")) === Seq(
      Row(1L, 20, 10), Row(2L, 1, 2)))
  }

  test("WHEN NOT MATCHED BY SOURCE: conditioned UPDATE and DELETE") {
    val (c, _) = freshCat("nmbs")
    spark.sql(s"CREATE TABLE $c.ns.t (id BIGINT, qty INT, status STRING)")
    spark.sql(
      s"INSERT INTO $c.ns.t VALUES (1,10,'A'),(2,20,'A'),(3,30,'OLD'),(4,40,'OLD')")
    // source covers only id=1; 2/3/4 are not-matched-by-source
    spark.sql("SELECT * FROM VALUES (1L, 11) AS s(id, qty)")
      .createOrReplaceTempView("nmbs_src")
    spark.sql(
      s"""MERGE INTO $c.ns.t AS t USING nmbs_src AS s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET qty = s.qty
         |WHEN NOT MATCHED BY SOURCE AND t.status = 'OLD' THEN DELETE
         |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET status = 'STALE'""".stripMargin)
    assert(rows(spark.sql(s"SELECT * FROM $c.ns.t ORDER BY id")) === Seq(
      Row(1L, 11, "A"),      // matched update
      Row(2L, 20, "STALE"))) // 3,4 deleted (status OLD); 2 marked stale
  }

  test("partial INSERT leaves unassigned columns NULL; NULL-key source rows insert") {
    val (c, _) = freshCat("pins")
    spark.sql(s"CREATE TABLE $c.ns.t (id BIGINT, qty INT, status STRING)")
    spark.sql(s"INSERT INTO $c.ns.t VALUES (1,10,'A')")
    spark.sql(
      "SELECT * FROM VALUES (7L, 70), (CAST(NULL AS BIGINT), 99) AS s(id, qty)")
      .createOrReplaceTempView("pins_src")
    spark.sql(
      s"""MERGE INTO $c.ns.t AS t USING pins_src AS s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET qty = s.qty
         |WHEN NOT MATCHED THEN INSERT (id, qty) VALUES (s.id, s.qty)""".stripMargin)
    // NULL-key row matches nothing (NULL = NULL is not TRUE) → inserts
    assert(rows(spark.sql(
      s"SELECT * FROM $c.ns.t ORDER BY id NULLS FIRST")) === Seq(
      Row(null, 99, null), Row(1L, 10, "A"), Row(7L, 70, null)))
  }

  test("duplicate non-NULL source keys refuse loudly") {
    val (c, _) = freshCat("dup")
    spark.sql(s"CREATE TABLE $c.ns.t (id BIGINT, qty INT)")
    spark.sql(s"INSERT INTO $c.ns.t VALUES (1, 10)")
    spark.sql("SELECT * FROM VALUES (1L, 1), (1L, 2) AS s(id, qty)")
      .createOrReplaceTempView("dup_src")
    val e = intercept[Exception] {
      spark.sql(
        s"""MERGE INTO $c.ns.t AS t USING dup_src AS s ON t.id = s.id
           |WHEN MATCHED AND s.qty > 0 THEN UPDATE SET qty = s.qty""".stripMargin)
    }
    assert(e.getMessage.contains("duplicate merge-key"))
  }

  test("MERGE WITH SCHEMA EVOLUTION: new source column lands with NULL backfill") {
    val (c, cat) = freshCat("sev")
    spark.sql(s"CREATE TABLE $c.ns.t (id BIGINT, qty INT)")
    spark.sql(s"INSERT INTO $c.ns.t VALUES (1, 10), (2, 20)")
    spark.sql("SELECT * FROM VALUES (2L, 21, 'fresh'), (3L, 30, 'new') " +
      "AS s(id, qty, note)").createOrReplaceTempView("sev_src")
    spark.sql(
      s"""MERGE WITH SCHEMA EVOLUTION INTO $c.ns.t AS t USING sev_src AS s
         |ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    // the evolved column exists in table metadata, with a field ID
    val t = cat.loadTable("ns", "t")
    assert(t.schema.fieldNames.toSeq === Seq("id", "qty", "note"))
    assert(rows(spark.sql(s"SELECT * FROM $c.ns.t ORDER BY id")) === Seq(
      Row(1L, 10, null),      // pre-evolution row: NULL backfill
      Row(2L, 21, "fresh"),   // updated with the new column's value
      Row(3L, 30, "new")))    // inserted
  }

  test("MERGE WITH SCHEMA EVOLUTION + conditional clauses") {
    val (c, _) = freshCat("sevc")
    spark.sql(s"CREATE TABLE $c.ns.t (id BIGINT, qty INT)")
    spark.sql(s"INSERT INTO $c.ns.t VALUES (1, 10), (2, 20)")
    spark.sql("SELECT * FROM VALUES (1L, 11, 'D'), (2L, 21, 'U'), (3L, 31, 'U') " +
      "AS s(id, qty, op)").createOrReplaceTempView("sevc_src")
    spark.sql(
      s"""MERGE WITH SCHEMA EVOLUTION INTO $c.ns.t AS t USING sevc_src AS s
         |ON t.id = s.id
         |WHEN MATCHED AND s.op = 'D' THEN DELETE
         |WHEN MATCHED THEN UPDATE SET qty = s.qty, op = s.op
         |WHEN NOT MATCHED THEN INSERT (id, qty, op) VALUES (s.id, s.qty, s.op)""".stripMargin)
    assert(rows(spark.sql(s"SELECT * FROM $c.ns.t ORDER BY id")) === Seq(
      Row(2L, 21, "U"), Row(3L, 31, "U")))
  }

  test("Scala API mergeIntoConditional: prefixed namespace, empty source + NMBS") {
    val cat = LakeCatalog.open(freshWarehouse())
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("qty", IntegerType)))
    val t = cat.createTable("ns", "t", schema)
    import spark.implicits._
    t.appendData(Seq((1L, 10), (2L, 20)).toDF("id", "qty"))
    // empty source + unconditional NOT MATCHED BY SOURCE DELETE = truncate
    val empty = Seq.empty[(Long, Int)].toDF("id", "qty")
    t.refresh().mergeIntoConditional(spark, empty, Seq("id"),
      matched = Nil, notMatched = Nil,
      notMatchedBySource = Seq(MergeClauseSpec(None, isDelete = true, Nil)))
    assert(t.refresh().newScan().toDF(spark).count() === 0L)

    // conditional matched-update through the __t_/__s_ namespace
    t.refresh().appendData(Seq((1L, 1), (2L, 2), (3L, 3)).toDF("id", "qty"))
    val src = Seq((2L, 200), (9L, 900)).toDF("id", "qty")
    t.refresh().mergeIntoConditional(spark, src, Seq("id"),
      matched = Seq(MergeClauseSpec(Some(col("__t_qty") < col("__s_qty")),
        isDelete = false, Seq("qty" -> col("__s_qty")))),
      notMatched = Seq(MergeClauseSpec(None, isDelete = false,
        Seq("id" -> col("__s_id"), "qty" -> col("__s_qty")))))
    assert(t.refresh().newScan().toDF(spark).orderBy("id").as[(Long, Int)]
      .collect().toSeq === Seq((1L, 1), (2L, 200), (3L, 3), (9L, 900)))
  }

  test("MERGE on a key equality needing a lossy cast is refused (not canonicalized)") {
    val (c, _) = freshCat("cast")
    spark.sql(s"CREATE TABLE $c.ns.t (id INT, qty INT)")
    spark.sql(s"INSERT INTO $c.ns.t VALUES (1, 10)")
    // source key is BIGINT: the analyzer wraps t.id in CAST(... AS BIGINT),
    // which is a safe up-cast and must still merge
    spark.sql("SELECT * FROM VALUES (1L, 11), (2L, 22) AS s(id, qty)")
      .createOrReplaceTempView("cast_src")
    spark.sql(
      s"""MERGE INTO $c.ns.t AS t USING cast_src AS s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET qty = s.qty
         |WHEN NOT MATCHED THEN INSERT (id, qty) VALUES (s.id, s.qty)""".stripMargin)
    assert(rows(spark.sql(s"SELECT * FROM $c.ns.t ORDER BY id")) === Seq(
      Row(1, 11), Row(2, 22)))
    // a DOWN-cast key equality (string key vs int col) is not a safe
    // canonical key — refused loudly rather than matched under the
    // table's narrower type
    spark.sql("SELECT * FROM VALUES ('1', 5) AS s(id, qty)")
      .createOrReplaceTempView("cast_bad_src")
    val e = intercept[Exception] {
      spark.sql(
        s"""MERGE INTO $c.ns.t AS t USING cast_bad_src AS s ON t.id = s.id
           |WHEN MATCHED THEN UPDATE SET qty = s.qty""".stripMargin)
    }
    assert(e.getMessage.contains("not a target.k = source.k equality"))
  }
}
