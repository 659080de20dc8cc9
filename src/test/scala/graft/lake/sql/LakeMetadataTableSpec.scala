package graft.lake.sql

import org.apache.spark.sql.functions._
import graft.lake.{LakeCatalog, LakePredicate, LakeSuite}

/** Metadata tables: `SELECT * FROM cat.ns.t.{snapshots, history, files,
  * delete_files, manifests, properties}` — the commit log and file
  * inventory as queryable relations. */
class LakeMetadataTableSpec extends LakeSuite {

  test("snapshots, history, files, delete_files, manifests, properties answer through SQL") {
    val wh = freshWarehouse()
    spark.conf.set("spark.sql.catalog.meta", classOf[LakeSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.meta.warehouse", wh)
    spark.sql("CREATE NAMESPACE meta.ns")
    spark.sql(s"CREATE TABLE meta.ns.t (${ordersDF.schema.toDDL})")
    val t = LakeCatalog.open(wh).loadTable("ns", "t")
    val first = t.appendData(ordersDF.filter(col("o_orderkey") % 2 === 0), numFiles = 2)
    t.refresh().appendData(ordersDF.filter(col("o_orderkey") % 2 === 1), numFiles = 2)
    t.refresh().deleteWhereMoR(spark, LakePredicate.Eq("o_orderstatus", "F"))

    // snapshots: the commit log, oldest first, with real rollups
    val snaps = spark.sql(
      "SELECT snapshot_id, parent_id, operation, file_count FROM meta.ns.t.snapshots " +
        "ORDER BY snapshot_id").collect()
    assert(snaps.length === 3)
    assert(snaps.map(_.getString(2)).toSeq === Seq("append", "append", "delete"))
    assert(snaps(0).isNullAt(1) && snaps(1).getLong(1) === first.snapshotId)
    assert(snaps(2).getLong(3) === 4L) // MoR delete rewrote no data file

    // summary map survives as map<string,string>
    val added = spark.sql(
      "SELECT summary['added-data-files'] FROM meta.ns.t.snapshots " +
        s"WHERE snapshot_id = ${first.snapshotId}").head.getString(0)
    assert(added === "2")

    // history: all three snapshots are current ancestors (linear history)
    val hist = spark.sql(
      "SELECT is_current_ancestor FROM meta.ns.t.history").collect()
    assert(hist.length === 3 && hist.forall(_.getBoolean(0)))

    // files: 4 live data files with NAME-keyed bounds
    val files = spark.sql(
      "SELECT content, record_count, lower_bounds['o_orderkey'], " +
        "upper_bounds['o_orderkey'], null_counts['o_orderkey'] FROM meta.ns.t.files")
      .collect()
    assert(files.length === 4)
    assert(files.forall(_.getString(0) == "data"))
    assert(files.map(_.getLong(1)).sum === ordersDF.count())
    assert(files.forall(r => r.getString(2).toLong <= r.getString(3).toLong))
    assert(files.forall(_.getLong(4) === 0L))

    // delete_files: the live positional tombstones
    val dels = spark.sql(
      "SELECT content, record_count FROM meta.ns.t.delete_files").collect()
    assert(dels.nonEmpty && dels.forall(_.getString(0) == "positional"))
    assert(dels.map(_.getLong(1)).sum
      === ordersDF.filter(col("o_orderstatus") === "F").count())

    // manifests: data + delete manifest refs of the current snapshot
    val mans = spark.sql(
      "SELECT content, file_count FROM meta.ns.t.manifests").collect()
    assert(mans.map(_.getString(0)).toSet === Set("data", "deletes"))

    // properties: the exactly-once ledger home, queryable
    t.refresh().appendDataExactlyOnce(
      ordersDF.limit(5).withColumn("o_orderkey", col("o_orderkey") + 800000000L),
      "metaprobe", 1L)
    val props = spark.sql(
      "SELECT value FROM meta.ns.t.properties " +
        "WHERE key = 'streaming.last-batch-id.metaprobe'").collect()
    assert(props.map(_.getString(0)).toSeq === Seq("1"))

    // metadata tables compose with plain SQL (join the file inventory
    // against the live row count)
    val nRows = spark.sql(
      "SELECT sum(record_count) FROM meta.ns.t.files").head.getLong(0)
    assert(nRows === ordersDF.count() + 5)
    // a rename keeps bounds NAME-keyed under the new name
    t.refresh().renameColumn("o_orderkey", "okey")
    assert(spark.sql("SELECT lower_bounds['okey'] FROM meta.ns.t.files").collect()
      .forall(!_.isNullAt(0)))
  }

  test("partitions table aggregates per partition tuple") {
    val wh = freshWarehouse()
    spark.conf.set("spark.sql.catalog.metap", classOf[LakeSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.metap.warehouse", wh)
    spark.sql("CREATE NAMESPACE metap.ns")
    val cat = LakeCatalog.open(wh)
    val t = cat.createTable("ns", "p", ordersDF.schema,
      spec = Seq(graft.lake.PartitionField("o_orderstatus", "identity")))
    t.appendData(ordersDF, numFiles = 6)
    val parts = spark.sql(
      "SELECT partition['o_orderstatus'] AS st, file_count, record_count " +
        "FROM metap.ns.p.partitions ORDER BY st").collect()
    val expected = ordersDF.groupBy(org.apache.spark.sql.functions.col("o_orderstatus"))
      .count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(parts.map(_.getString(0)).toSeq === expected.keys.toSeq.sorted)
    parts.foreach(r => assert(r.getLong(2) === expected(r.getString(0))))
    assert(parts.map(_.getLong(1)).sum === t.refresh().metadata.currentFiles.size.toLong)
  }

  test("row-per-file metadata tables guard driver memory via the rollup cap") {
    val wh = freshWarehouse()
    spark.conf.set("spark.sql.catalog.metag", classOf[LakeSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.metag.warehouse", wh)
    spark.sql("CREATE NAMESPACE metag.ns")
    val cat = LakeCatalog.open(wh)
    val t = cat.createTable("ns", "g", ordersDF.schema)
    t.appendData(ordersDF, numFiles = 6)
    // a tiny cap models the million-file table: files/partitions refuse
    // LOUDLY (before loading any manifest) instead of materializing
    def causes(x: Throwable): Seq[Throwable] =
      if (x == null) Nil else x +: causes(x.getCause)
    t.refresh().setProperty("metadata-tables.max-rows", "5")
    for (kind <- Seq("files", "partitions")) {
      val e = intercept[Exception](spark.sql(s"SELECT * FROM metag.ns.g.$kind").collect())
      assert(causes(e).exists(c => Option(c.getMessage)
        .exists(_.contains("metadata-tables.max-rows"))), s"$kind did not guard")
    }
    // O(manifests) inventory still answers (the documented alternative),
    // and raising the cap restores the full listing
    assert(spark.sql("SELECT sum(file_count) FROM metag.ns.g.manifests")
      .head.getLong(0) === 6L)
    t.refresh().setProperty("metadata-tables.max-rows", "1000")
    assert(spark.sql("SELECT count(*) FROM metag.ns.g.files").head.getLong(0) === 6L)
  }
}
