package graft.lake

import org.apache.spark.sql.functions._

/** Row lineage (Iceberg v3 first-row-id/next-row-id): stable per-row
  * identities assigned inside the commit CAS. What the oracle entry
  * (`lake_row_lineage`, which pins exact id VALUES) cannot see:
  * uniqueness/high-water invariants, stability of ids under appends and
  * DV deletes read back-to-back, and the loud-refusal contract once a
  * rewrite-shaped commit re-ids surviving rows. */
class RowLineageSpec extends LakeSuite {

  private def lineageIds(t: LakeTable): Map[Long, Long] =
    t.refresh().newScan().rowLineage(spark)
      .select(col("o_orderkey"), col("_row_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("ids are unique, dense per commit, and stable across appends + DV deletes") {
    val cat = LakeCatalog.open(freshWarehouse())
    val t = cat.createTable("ns", "rl", ordersDF.schema)
    t.setProperty("write.delete.vector.enabled", "true")
    val half = ordersDF.filter(col("o_orderkey") % 2 === 0)
      .repartition(1).sortWithinPartitions(col("o_orderkey"))
    t.refresh().appendData(half)
    val ids1 = lineageIds(t)
    val n1 = ids1.size.toLong
    assert(ids1.values.toSeq.sorted == (0L until n1), "first commit: ids 0..n-1")
    assert(t.refresh().metadata.nextRowId == n1, "high-water mark advanced")

    // second append: fresh ids continue from the mark; old ids untouched
    val rest = ordersDF.filter(col("o_orderkey") % 2 === 1)
      .repartition(1).sortWithinPartitions(col("o_orderkey"))
    t.refresh().appendData(rest)
    val ids2 = lineageIds(t)
    assert(ids2.size > ids1.size)
    ids1.foreach { case (k, rid) =>
      assert(ids2(k) == rid, s"append moved id of key $k") }
    assert(ids2.values.toSet.size == ids2.size, "ids must stay unique")
    assert(ids2.values.max == t.refresh().metadata.nextRowId - 1)

    // DV delete: survivors keep their exact ids (files never rewritten)
    t.refresh().deleteWhereMoR(spark,
      LakePredicate.Ge("o_totalprice", Double.box(300000.0)))
    val ids3 = lineageIds(t)
    assert(ids3.size < ids2.size, "delete removed nothing — fixture drift")
    ids3.foreach { case (k, rid) =>
      assert(ids2(k) == rid, s"DV delete moved id of key $k") }
    // deletes assign no new ids
    assert(t.refresh().metadata.nextRowId == ids2.values.max + 1)
  }

  test("rewrite-shaped commits break lineage loudly and stay broken") {
    val cat = LakeCatalog.open(freshWarehouse())
    val t = cat.createTable("ns", "rlc", ordersDF.schema)
    (0 until 4).foreach(i =>
      t.refresh().appendData(ordersDF.filter(col("o_orderkey") % 4 === i)))
    assert(lineageIds(t).size == ordersDF.count())
    t.refresh().compact(spark, targetFiles = 1)
    val e = intercept[IllegalArgumentException] {
      t.refresh().newScan().rowLineage(spark).collect()
    }
    assert(e.getMessage.contains("rewrite-shaped"))
    // the flag is sticky: later pure appends don't un-break identity
    t.refresh().appendData(ordersDF.limit(5))
    intercept[IllegalArgumentException] {
      t.refresh().newScan().rowLineage(spark).collect()
    }
    // plain reads are untouched by the broken flag
    assert(t.refresh().newScan().toDF(spark).count() == ordersDF.count() + 5)
  }

  test("SQL surface: _row_id metadata column resolves, stays out of *, survives DELETE") {
    val wh = freshWarehouse()
    spark.conf.set("spark.sql.catalog.rlc", classOf[sql.LakeSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.rlc.warehouse", wh)
    try {
      spark.sql("CREATE NAMESPACE rlc.ns")
      spark.sql("CREATE TABLE rlc.ns.t (k BIGINT, v STRING)")
      spark.sql("ALTER TABLE rlc.ns.t SET TBLPROPERTIES " +
        "('write.delete.vector.enabled'='true')")
      spark.sql("INSERT INTO rlc.ns.t VALUES (1, 'a'), (2, 'b'), (3, 'c')")
      spark.sql("INSERT INTO rlc.ns.t VALUES (4, 'd')")
      val rows = spark.sql("SELECT k, _row_id FROM rlc.ns.t ORDER BY _row_id")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(rows.map(_._2).toSeq == (0L to 3L), s"ids not dense: ${rows.toSeq}")
      assert(rows.find(_._1 == 4L).exists(_._2 == 3L),
        "second commit's row must carry the next id")
      // `*` never leaks the metadata column
      assert(spark.sql("SELECT * FROM rlc.ns.t").columns.toSeq == Seq("k", "v"))
      // a DV delete keeps survivors' ids stable through the SQL read
      spark.sql("DELETE FROM rlc.ns.t WHERE k = 2")
      val after = spark.sql("SELECT k, _row_id FROM rlc.ns.t ORDER BY _row_id")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(after.toSeq == rows.filterNot(_._1 == 2L).toSeq,
        "DV delete moved a surviving row's id")
    } finally {
      spark.conf.unset("spark.sql.catalog.rlc")
      spark.conf.unset("spark.sql.catalog.rlc.warehouse")
    }
  }

  test("manifest round-trip preserves firstRowId; pre-lineage entries read back None") {
    val f = DataFileEntry("/w/d1.parquet", 10L, 100L,
      Map.empty, Map.empty, Map.empty, Map.empty, firstRowId = Some(42L))
    val json = MetadataJson.writeManifest(Seq(f))
    assert(json.contains("\"firstRowId\":42"))
    val back = MetadataJson.readManifest(json)
    assert(back.head.firstRowId.contains(42L))
    // a pre-lineage document (no field) defaults to None
    val legacy = MetadataJson.writeManifest(Seq(f.copy(firstRowId = None)))
    assert(!legacy.contains("firstRowId"))
    assert(MetadataJson.readManifest(legacy).head.firstRowId.isEmpty)
  }
}
