package graft.lake

import org.apache.spark.sql.functions._

/** Snapshot rollback (Iceberg's rollback_to_snapshot): a metadata-only
  * commit that restores an existing snapshot as current — the recovery
  * path for a bad write. Nothing is deleted: the abandoned lineage
  * stays time-travelable until expiry retires it. */
class RollbackSpec extends LakeSuite {

  // float sums from different plans differ in the last ulps
  private def close(a: Double, b: Double) = math.abs(a - b) <= 1e-9 * math.abs(b)

  test("rollback restores an old snapshot; abandoned lineage stays readable") {
    val cat = LakeCatalog.open(freshWarehouse())
    val t = cat.createTable("ns", "rb", ordersDF.schema)
    val even = ordersDF.filter(col("o_orderkey") % 2 === 0)
    val first = t.appendData(even)
    val second = t.refresh().appendData(ordersDF.filter(col("o_orderkey") % 2 === 1))
    val filesBefore = t.refresh().metadata.snapshots.flatMap(_.files).map(_.path).toSet

    t.refresh().rollbackTo(first.snapshotId)
    // current state is the first snapshot again
    assert(t.refresh().currentSnapshotId === first.snapshotId)
    assert(t.newScan().toDF(spark).count() === even.count())
    // metadata-only: no file was touched, the abandoned snapshot still
    // time-travels
    assert(t.metadata.snapshots.flatMap(_.files).map(_.path).toSet === filesBefore)
    assert(t.asOf(second.snapshotId).toDF(spark).count() === ordersDF.count())
    // unknown / expired ids refuse
    intercept[IllegalArgumentException](t.rollbackTo(9999L))
  }

  test("post-rollback commits parent from the restored snapshot; expiry reclaims the rest") {
    val cat = LakeCatalog.open(freshWarehouse())
    val t = cat.createTable("ns", "rb2", ordersDF.schema)
    val even = ordersDF.filter(col("o_orderkey") % 2 === 0)
    val odd = ordersDF.filter(col("o_orderkey") % 2 === 1)
    val first = t.appendData(even)
    t.refresh().appendData(odd) // the bad write
    t.refresh().rollbackTo(first.snapshotId)
    val redo = t.refresh().appendData(odd.withColumn("o_totalprice", col("o_totalprice") * 2))

    // new lineage: parent is the restored snapshot, id advanced past the
    // abandoned one (sequence numbers stay monotonic)
    val snap = t.refresh().metadata.currentSnapshot.get
    assert(snap.parentId === Some(first.snapshotId))
    assert(redo.snapshotId > first.snapshotId + 1)
    // the feed since `first` sees only the REDO rows, not the abandoned write
    val changed = t.changesSince(spark, first.snapshotId)
    assert(changed.count() === odd.count())
    assert(close(changed.agg(sum("o_totalprice")).head.getDouble(0),
      odd.agg(sum(col("o_totalprice") * 2)).head.getDouble(0)))

    // expiry retires the abandoned snapshot; the orphan sweep reclaims
    // its unique files; the table still answers exactly
    t.expireSnapshots(keepLast = 1) // only the current (redo) snapshot survives
    assert(t.removeOrphanFiles().nonEmpty)
    val expected = even.unionByName(odd.withColumn("o_totalprice", col("o_totalprice") * 2))
    assert(t.refresh().newScan().toDF(spark).count() === expected.count())
    assert(close(t.newScan().toDF(spark).agg(sum("o_totalprice")).head.getDouble(0),
      expected.agg(sum("o_totalprice")).head.getDouble(0)))
  }

  test("rollback composes with MoR tombstones: the restored snapshot's view is exact") {
    val cat = LakeCatalog.open(freshWarehouse())
    val t = cat.createTable("ns", "rb3", ordersDF.schema)
    t.appendData(ordersDF, numFiles = 4)
    t.refresh().deleteWhereMoR(spark, LakePredicate.Eq("o_orderstatus", "F"))
    val withDelete = t.refresh().currentSnapshotId
    val survivors = ordersDF.filter(col("o_orderstatus") =!= "F").count()
    // a later bad overwrite...
    t.refresh().overwriteAll(ordersDF.limit(10))
    // ...rolled back to the tombstoned snapshot: tombstones apply again
    t.refresh().rollbackTo(withDelete)
    assert(t.refresh().newScan().toDF(spark).count() === survivors)
    assert(t.newScan().toDF(spark).filter(col("o_orderstatus") === "F").count() === 0L)
  }

  test("snapshot ids never reuse across rollback + expiry") {
    // id reuse at or below a streaming checkpoint's offset makes the
    // source treat NEW commits as already read (silent loss); the
    // metadata high-water mark must keep allocation monotone
    val cat = LakeCatalog.open(freshWarehouse())
    val t = cat.createTable("ns", "mono", ordersDF.schema)
    t.appendData(ordersDF.limit(5))                       // id 1
    t.refresh().appendData(ordersDF.limit(5))             // id 2
    t.refresh().appendData(ordersDF.limit(5))             // id 3
    t.refresh().rollbackTo(1L)
    // the abandoned 2 and 3 expire (not current, not ref-pinned)
    t.expireSnapshotsOlderThan(System.currentTimeMillis() + 60000)
    assert(t.refresh().snapshots.map(_.id) === Seq(1L))
    // the next commit must allocate PAST the high-water mark
    t.refresh().appendData(ordersDF.limit(5))
    assert(t.refresh().currentSnapshotId === 4L,
      "rollback + expiry must not let snapshot ids recycle")
    // durable across a cold reopen too
    val re = LakeCatalog.open(t.location.stripSuffix("/ns/mono"))
      .loadTable("ns", "mono")
    re.appendData(ordersDF.limit(3))
    assert(re.refresh().currentSnapshotId === 5L)
  }
}
