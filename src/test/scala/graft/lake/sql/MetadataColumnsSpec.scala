package graft.lake.sql

import org.apache.spark.sql.functions._
import graft.lake.{LakeCatalog, LakePredicate, LakeSuite}

/** Hidden metadata columns `_file`/`_pos` (Iceberg's inspection
  * columns) on the SQL surface: resolvable when referenced, absent
  * from `SELECT *`, stable ORIGINAL coordinates under merge-on-read
  * tombstones, and composing with WHERE pushdown. */
class MetadataColumnsSpec extends LakeSuite {

  test("_file/_pos resolve on demand, stay out of SELECT *, and survive MoR deletes") {
    val wh = freshWarehouse()
    spark.conf.set("spark.sql.catalog.mc", classOf[LakeSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.mc.warehouse", wh)
    try {
      spark.sql("CREATE NAMESPACE mc.ns")
      spark.sql(s"CREATE TABLE mc.ns.t (${ordersDF.schema.toDDL})")
      val t = LakeCatalog.open(wh).loadTable("ns", "t")
      t.appendData(ordersDF, numFiles = 4)
      val total = ordersDF.count()

      // hidden: star expansion never leaks the metadata columns
      assert(spark.sql("SELECT * FROM mc.ns.t").schema.fieldNames.toSeq
        === ordersDF.schema.fieldNames.toSeq)

      // on demand: coordinates are real (4 files, 0-based positions,
      // every row addressed exactly once)
      val coords = spark.sql("SELECT _file, _pos, o_orderkey FROM mc.ns.t")
      assert(coords.count() === total)
      assert(coords.select(countDistinct(col("_file"))).head.getLong(0) === 4L)
      assert(coords.agg(min(col("_pos"))).head.getLong(0) === 0L)
      assert(coords.select(col("_file"), col("_pos")).distinct().count() === total)
      // per-file positions are dense 0..n-1: max+1 sums to the total
      val sumMax = spark.sql(
        "SELECT sum(mx + 1) FROM (SELECT max(_pos) AS mx FROM mc.ns.t GROUP BY _file)")
        .head.getLong(0)
      assert(sumMax === total)

      // composes with a data-column filter (pruning predicate flows)
      val f = spark.sql(
        "SELECT _file, o_orderkey FROM mc.ns.t WHERE o_orderstatus = 'F'")
      assert(f.count() === ordersDF.filter("o_orderstatus = 'F'").count())

      // MoR delete: survivors keep their ORIGINAL coordinates — the
      // surviving (file, pos) pairs are a strict subset of the
      // pre-delete pairs, never renumbered
      val before = coords.select(col("_file"), col("_pos"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      t.refresh().deleteWhereMoR(spark, LakePredicate.Lt("o_orderkey", 500L))
      val after = spark.sql("SELECT _file, _pos FROM mc.ns.t")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      val expectAfter = ordersDF.filter("o_orderkey >= 500").count()
      assert(after.size.toLong === expectAfter)
      assert(after.subsetOf(before), "MoR survivors must keep original coordinates")
      assert(after.size < before.size)
    } finally {
      spark.conf.unset("spark.sql.catalog.mc")
      spark.conf.unset("spark.sql.catalog.mc.warehouse")
    }
  }

  test("_spec_id/_partition report each file's OWN spec across a spec evolution") {
    val wh = freshWarehouse()
    spark.conf.set("spark.sql.catalog.mp", classOf[LakeSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.mp.warehouse", wh)
    try {
      spark.sql("CREATE NAMESPACE mp.ns")
      spark.sql(s"CREATE TABLE mp.ns.t (${ordersDF.schema.toDDL})")
      val t = LakeCatalog.open(wh).loadTable("ns", "t")
      val even = ordersDF.filter("o_orderkey % 2 = 0")
      val odd = ordersDF.filter("o_orderkey % 2 = 1")
      t.appendData(even) // spec 0: unpartitioned
      spark.sql("ALTER TABLE mp.ns.t ADD PARTITION FIELD o_orderstatus")
      // partition-aligned batches so each new file carries one value
      Seq("F", "O", "P").foreach { st =>
        t.refresh().appendData(odd.filter(col("o_orderstatus") === st))
      }
      val bySpec = spark.sql(
        "SELECT _spec_id, count(*) AS n FROM mp.ns.t GROUP BY _spec_id")
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(bySpec === Map(0 -> even.count(), 1 -> odd.count()))
      // old files: empty partition map; new files: their own value
      val parts = spark.sql(
        """SELECT DISTINCT _spec_id, _partition['o_orderstatus'] AS st
          |FROM mp.ns.t""".stripMargin)
        .collect().map(r => (r.getInt(0), Option(r.getString(1)))).toSet
      assert(parts === Set((0, None), (1, Some("F")), (1, Some("O")), (1, Some("P"))))
    } finally {
      spark.conf.unset("spark.sql.catalog.mp")
      spark.conf.unset("spark.sql.catalog.mp.warehouse")
    }
  }

  test("a DATA column named _file is never shadowed by the metadata column") {
    val wh = freshWarehouse()
    spark.conf.set("spark.sql.catalog.metashadow", classOf[LakeSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.metashadow.warehouse", wh)
    spark.sql("CREATE NAMESPACE metashadow.ns")
    spark.sql("CREATE TABLE metashadow.ns.t (_file STRING, v BIGINT)")
    spark.sql("INSERT INTO metashadow.ns.t VALUES ('user-data-1', 1), ('user-data-2', 2)")
    // SELECT _file must return the USER's column, not parquet paths
    val vals = spark.sql("SELECT _file FROM metashadow.ns.t ORDER BY _file")
      .collect().map(_.getString(0)).toSeq
    assert(vals === Seq("user-data-1", "user-data-2"),
      "the metadata substitution shadowed a real data column")
    // and it participates in expressions/filters like any data column
    assert(spark.sql(
      "SELECT v FROM metashadow.ns.t WHERE _file = 'user-data-2'")
      .head.getLong(0) === 2L)
  }
}
