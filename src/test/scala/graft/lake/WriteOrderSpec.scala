package graft.lake

import org.apache.spark.sql.functions._

/** Clustering-on-write (the Iceberg write-order concept): a per-table
  * sort order applied by every data-file write, so file min/max stats
  * become disjoint on the cluster key and stats pruning shrinks the
  * copy-on-write rewrite span — the real 100 TB cost driver for CoW
  * updates over unclustered tables. */
class WriteOrderSpec extends LakeSuite {

  private def rewrittenFiles(t: LakeTable): Long =
    t.refresh().metadata.currentSnapshot.get.summary("removed-data-files").toLong

  test("a clustered table rewrites strictly fewer files for the same CoW update") {
    val cat = LakeCatalog.open(freshWarehouse())
    val src = ordersDF

    val flat = cat.createTable("ns", "flat", src.schema)
    flat.appendData(src, numFiles = 8)
    flat.refresh().updateWhere(spark, LakePredicate.Eq("o_orderstatus", "F"),
      Map("o_orderpriority" -> lit("0-REWRITTEN")))
    val flatRewrites = rewrittenFiles(flat)

    val clustered = cat.createTable("ns", "clustered", src.schema,
      sortOrder = Seq("o_orderstatus"))
    clustered.appendData(src, numFiles = 8)
    clustered.refresh().updateWhere(spark, LakePredicate.Eq("o_orderstatus", "F"),
      Map("o_orderpriority" -> lit("0-REWRITTEN")))
    val clusteredRewrites = rewrittenFiles(clustered)

    // every unclustered file straddles all statuses → the update rewrote
    // the whole table; the clustered table rewrote only files whose
    // min/max range contains 'F'
    assert(flatRewrites === 8L)
    assert(clusteredRewrites < flatRewrites,
      s"clustered table rewrote $clusteredRewrites of $flatRewrites files")
    assert(clusteredRewrites >= 1L)

    // ...and both tables answer identically after the update
    val expected = src
      .withColumn("o_orderpriority",
        when(col("o_orderstatus") === "F", "0-REWRITTEN").otherwise(col("o_orderpriority")))
      .orderBy("o_orderkey").collect()
    assert(flat.refresh().newScan().toDF(spark).orderBy("o_orderkey").collect()
      === expected)
    assert(clustered.refresh().newScan().toDF(spark).orderBy("o_orderkey").collect()
      === expected)
  }

  test("a high-cardinality write order prunes range deletes; compaction re-clusters") {
    val cat = LakeCatalog.open(freshWarehouse())
    val src = ordersDF
    val t = cat.createTable("ns", "bykey", src.schema)
    t.appendData(src, numFiles = 8) // unclustered history
    // setWriteOrder is metadata-only: no rewrite happens here
    val filesBefore = t.refresh().metadata.currentFiles.map(_.path).toSet
    t.setWriteOrder("o_orderkey")
    assert(t.refresh().metadata.currentFiles.map(_.path).toSet === filesBefore)
    // compaction re-clusters existing data under the new order
    t.refresh().compact(spark, targetFiles = 8)
    val files = t.refresh().metadata.currentFiles
    val key = t.metadata.statKey("o_orderkey").get
    val ranges = files.map(f => (f.minValues(key).toLong, f.maxValues(key).toLong))
      .sortBy(_._1)
    // disjoint min/max ranges on the cluster key across all files
    ranges.sliding(2).foreach {
      case Seq((_, max1), (min2, _)) => assert(max1 <= min2,
        s"overlapping key ranges after re-cluster: $ranges")
      case _ =>
    }
    // a selective key-range delete now touches only the overlapping files
    val maxKey = ranges.head._2 // delete only keys inside the first file's range
    t.refresh().deleteWhere(spark, LakePredicate.Le("o_orderkey", maxKey))
    assert(rewrittenFiles(t) === 1L)
    assert(t.refresh().newScan().toDF(spark).count()
      === src.filter(col("o_orderkey") > maxKey).count())
  }

  test("write order persists across restart, renames with its column, guards drops") {
    val wh = freshWarehouse()
    val cat = LakeCatalog.open(wh)
    val t = cat.createTable("ns", "t", ordersDF.schema, sortOrder = Seq("o_orderstatus"))
    assert(LakeCatalog.open(wh).loadTable("ns", "t").metadata.sortOrder
      === Seq("o_orderstatus")) // JSON round-trip
    t.renameColumn("o_orderstatus", "status")
    assert(t.metadata.sortOrder === Seq("status"))
    assertThrows[IllegalArgumentException](t.dropColumn("status"))
    t.setWriteOrder() // clear
    assert(t.refresh().metadata.sortOrder === Nil)
    t.dropColumn("status") // now legal
    assertThrows[IllegalArgumentException](t.setWriteOrder("nope"))
  }

  test("SQL DDL: TBLPROPERTIES write.sort-order sets the table's write order") {
    val wh = freshWarehouse()
    spark.conf.set("spark.sql.catalog.sqlwo", classOf[sql.LakeSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.sqlwo.warehouse", wh)
    spark.sql("CREATE NAMESPACE sqlwo.ns")
    spark.sql("CREATE TABLE sqlwo.ns.t (o_orderkey BIGINT, o_orderstatus STRING) " +
      "TBLPROPERTIES ('write.sort-order'='o_orderstatus, o_orderkey')")
    assert(LakeCatalog.open(wh).loadTable("ns", "t").metadata.sortOrder
      === Seq("o_orderstatus", "o_orderkey"))
  }

  test("SQL DDL: ALTER TABLE SET TBLPROPERTIES routes write.sort-order for real") {
    val wh = freshWarehouse()
    spark.conf.set("spark.sql.catalog.sqlwo2", classOf[sql.LakeSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.sqlwo2.warehouse", wh)
    spark.sql("CREATE NAMESPACE sqlwo2.ns")
    spark.sql("CREATE TABLE sqlwo2.ns.t (o_orderkey BIGINT, o_orderstatus STRING)")
    val t = LakeCatalog.open(wh).loadTable("ns", "t")
    assert(t.metadata.sortOrder === Nil)

    // linear order: applied to the REAL sort-order metadata, not a
    // shadowed plain property (a silent no-op that read back as set)
    spark.sql("ALTER TABLE sqlwo2.ns.t SET TBLPROPERTIES " +
      "('write.sort-order'='o_orderstatus')")
    assert(t.refresh().metadata.sortOrder === Seq("o_orderstatus"))
    assert(t.metadata.sortOrderKind === "linear")

    // zorder form routes to setZOrder (with its validation)
    spark.sql("ALTER TABLE sqlwo2.ns.t SET TBLPROPERTIES " +
      "('write.sort-order'='zorder(o_orderkey, o_orderstatus)')")
    assert(t.refresh().metadata.sortOrder === Seq("o_orderkey", "o_orderstatus"))
    assert(t.metadata.sortOrderKind === "zorder")
    // a bad column fails loudly instead of persisting junk
    assertThrows[Exception](spark.sql(
      "ALTER TABLE sqlwo2.ns.t SET TBLPROPERTIES ('write.sort-order'='nope')"))

    // UNSET clears the order
    spark.sql("ALTER TABLE sqlwo2.ns.t UNSET TBLPROPERTIES ('write.sort-order')")
    assert(t.refresh().metadata.sortOrder === Nil)
  }
}
