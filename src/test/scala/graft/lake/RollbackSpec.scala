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
}
