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

  test("position_deletes expands tombstone parquet and DV bitmaps to coordinates") {
    val wh = freshWarehouse()
    spark.conf.set("spark.sql.catalog.metapd", classOf[LakeSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.metapd.warehouse", wh)
    spark.sql("CREATE NAMESPACE metapd.ns")
    val cat = LakeCatalog.open(wh)
    val nF = ordersDF.filter(col("o_orderstatus") === "F").count()

    // positional-parquet tombstones
    val t = cat.createTable("ns", "pd", ordersDF.schema)
    t.appendData(ordersDF, numFiles = 3)
    t.refresh().deleteWhereMoR(spark, graft.lake.LakePredicate.Eq("o_orderstatus", "F"))
    val pd = spark.sql(
      "SELECT file_path, pos, content FROM metapd.ns.pd.position_deletes").collect()
    assert(pd.length.toLong === nF)
    assert(pd.forall(_.getString(2) == "positional"))
    // coordinates address live data files at valid ordinals
    val dataPaths = spark.sql("SELECT file_path FROM metapd.ns.pd.files")
      .collect().map(_.getString(0)).toSet
    assert(pd.map(_.getString(0)).toSet.subsetOf(dataPaths))
    assert(pd.forall(_.getLong(1) >= 0))
    // the MoR scan drops exactly these coordinates
    assert(spark.sql("SELECT count(*) FROM metapd.ns.pd").head.getLong(0)
      === ordersDF.count() - nF)

    // deletion-vector bitmaps expand to the same coordinate space
    val tv = cat.createTable("ns", "pdv", ordersDF.schema)
    tv.setProperty("write.delete.vector.enabled", "true")
    tv.refresh().appendData(ordersDF, numFiles = 3)
    tv.refresh().deleteWhereMoR(spark, graft.lake.LakePredicate.Eq("o_orderstatus", "F"))
    val dv = spark.sql(
      "SELECT content, count(*) AS n FROM metapd.ns.pdv.position_deletes " +
        "GROUP BY content").collect()
    assert(dv.map(r => r.getString(0) -> r.getLong(1)).toMap === Map("dv" -> nF))
  }

  test("partition statistics files serve the partitions table without manifests") {
    val wh = freshWarehouse()
    spark.conf.set("spark.sql.catalog.metaps", classOf[LakeSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.metaps.warehouse", wh)
    spark.sql("CREATE NAMESPACE metaps.ns")
    val cat = LakeCatalog.open(wh)
    val t = cat.createTable("ns", "ps", ordersDF.schema,
      spec = Seq(graft.lake.PartitionField("o_orderstatus", "identity")))
    t.appendData(ordersDF, numFiles = 6)
    // manifest-walk baseline, BEFORE stats exist
    val baseline = spark.sql(
      "SELECT partition['o_orderstatus'] AS st, file_count, record_count, " +
        "total_size_bytes FROM metaps.ns.ps.partitions ORDER BY st").collect()
    val row = spark.sql(
      s"CALL metaps.system.compute_partition_stats('ns.ps')").head
    assert(row.getLong(0) === t.refresh().currentSnapshotId)
    assert(row.getInt(1) === baseline.length)
    // stats-file-served path answers IDENTICALLY — under a row cap
    // that would refuse the manifest walk (the 3-status fixture lands
    // ~3-4 partition-clustered files; +1 from the append below) but
    // admits the 3-partition rollup — proving the doc serves, while
    // partition CARDINALITY still guards on the doc path too
    t.refresh().setProperty("metadata-tables.max-rows", "3")
    val served = spark.sql(
      "SELECT partition['o_orderstatus'] AS st, file_count, record_count, " +
        "total_size_bytes FROM metaps.ns.ps.partitions ORDER BY st").collect()
    assert(served.map(_.toSeq).toSeq === baseline.map(_.toSeq).toSeq)
    // a new commit outdates the doc: falls back (and the tiny cap now
    // refuses loudly, proving the stale doc is NOT served)
    t.refresh().appendData(ordersDF.limit(7)
      .withColumn("o_orderkey", col("o_orderkey") + 700000000L))
    val e = intercept[Exception](
      spark.sql("SELECT * FROM metaps.ns.ps.partitions").collect())
    def causes(x: Throwable): Seq[Throwable] =
      if (x == null) Nil else x +: causes(x.getCause)
    assert(causes(e).exists(c => Option(c.getMessage)
      .exists(_.contains("metadata-tables.max-rows"))))
    // expiry dereferences the old snapshot's doc; orphan sweep reclaims
    t.refresh().setProperty("metadata-tables.max-rows", "1000000")
    val docName = t.refresh().metadata.partitionStats.head.name
    t.refresh().expireSnapshots(keepLast = 1)
    assert(t.refresh().metadata.partitionStats.isEmpty)
    t.removeOrphanFiles()
    assert(cat.backend.get(cat.metadataDir("ns", "ps").resolve(docName)).isEmpty)
  }

  test("entries, all_data_files, all_manifests, metadata_log_entries") {
    val wh = freshWarehouse()
    spark.conf.set("spark.sql.catalog.metae", classOf[LakeSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.metae.warehouse", wh)
    spark.sql("CREATE NAMESPACE metae.ns")
    val cat = LakeCatalog.open(wh)
    val t = cat.createTable("ns", "e", ordersDF.schema)
    val first = t.appendData(
      ordersDF.filter(col("o_orderkey") % 2 === 0), numFiles = 2)
    t.refresh().appendData(
      ordersDF.filter(col("o_orderkey") % 2 === 1), numFiles = 3)
    val second = t.refresh().currentSnapshotId

    // entries: per-file status against the CURRENT snapshot — the 3
    // files of the second append are status 1 (added), the 2 of the
    // first are status 0 (existing); snapshot_id = the adding commit
    val entries = spark.sql(
      "SELECT status, snapshot_id, file_path FROM metae.ns.e.entries").collect()
    assert(entries.length === 5)
    assert(entries.count(_.getInt(0) == 1) === 3)
    assert(entries.filter(_.getInt(0) == 0)
      .forall(_.getLong(1) === first.snapshotId))
    assert(entries.filter(_.getInt(0) == 1).forall(_.getLong(1) === second))

    // a MoR delete adds tombstone entries; data entries flip to existing
    t.refresh().deleteWhereMoR(spark, graft.lake.LakePredicate.Eq("o_orderstatus", "F"))
    val afterDel = spark.sql(
      "SELECT content, status FROM metae.ns.e.entries").collect()
    assert(afterDel.filter(_.getString(0) == "data").forall(_.getInt(1) == 0))
    assert(afterDel.exists(r => r.getString(0) == "positional" && r.getInt(1) == 1))

    // all_data_files: union across snapshots, one row per distinct path
    // (the 5 data files, each live in 2+ snapshots)
    val allFiles = spark.sql(
      "SELECT file_path FROM metae.ns.e.all_data_files").collect()
    assert(allFiles.length === 5)
    assert(allFiles.map(_.getString(0)).distinct.length === 5)

    // all_manifests: manifest refs of EVERY snapshot, tagged by it; the
    // current snapshot's slice matches the plain manifests table
    val mans = spark.sql(
      s"SELECT content FROM metae.ns.e.all_manifests " +
        s"WHERE reference_snapshot_id = ${t.refresh().currentSnapshotId}").collect()
    assert(mans.map(_.getString(0)).sorted ===
      spark.sql("SELECT content FROM metae.ns.e.manifests").collect()
        .map(_.getString(0)).sorted)
    assert(spark.sql(
      "SELECT count(DISTINCT reference_snapshot_id) FROM metae.ns.e.all_manifests")
      .head.getLong(0) === 3L)

    // all_entries: per-snapshot entry view — a file rows as ADDED under
    // its own commit and EXISTING under each later carrying snapshot
    val allEnt = spark.sql(
      "SELECT reference_snapshot_id, status, count(*) AS n " +
        "FROM metae.ns.e.all_entries WHERE content = 'data' " +
        "GROUP BY 1, 2 ORDER BY 1, 2").collect()
    // snap1: 2 added; snap2: 2 existing + 3 added; snap3 (MoR delete):
    // all 5 existing
    assert(allEnt.map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
      .map { case (_, st, n) => (st, n) } === Seq((1, 2L), (0, 2L), (1, 3L), (0, 5L)))

    // metadata_log_entries: one row per metadata version; the latest
    // row points at the current snapshot, the create version at none
    val log = spark.sql(
      "SELECT file, latest_snapshot_id FROM metae.ns.e.metadata_log_entries " +
        "ORDER BY file").collect()
    assert(log.length >= 4) // create + 2 appends + MoR delete
    assert(log.head.getString(0) === "v1.json" && log.head.isNullAt(1))
    val latest = log.maxBy(_.getString(0).stripPrefix("v").stripSuffix(".json").toInt)
    assert(latest.getLong(1) === t.refresh().currentSnapshotId)
  }
}
