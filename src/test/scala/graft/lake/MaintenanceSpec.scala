package graft.lake

import org.apache.spark.sql.functions._

/** Snapshot expiration + orphan-file cleanup: expired history stops
  * being time-travelable, current data survives byte-for-byte, and
  * orphan removal only ever deletes unreferenced files. */
class MaintenanceSpec extends LakeSuite {

  test("expireSnapshots keeps the tail; orphan cleanup frees compacted-away files") {
    val cat = LakeCatalog.open(freshWarehouse())
    val t = cat.createTable("ns", "maint", ordersDF.schema)
    (0 until 4).foreach(i =>
      t.refresh().appendData(ordersDF.filter(col("o_orderkey") % 4 === i).coalesce(1)))
    t.refresh().compact(spark, targetFiles = 1)
    assert(t.refresh().snapshots.size === 5)
    val rows = t.newScan().toDF(spark).count()

    val expired = t.expireSnapshots(keepLast = 1)
    assert(expired.size === 4)
    assert(t.snapshots.size === 1)
    // pre-compaction files are now unreferenced -> orphans; so are the
    // manifest documents only the expired snapshots referenced
    val removed = t.removeOrphanFiles()
    assert(removed.count(_.endsWith(".parquet")) === 4)
    assert(removed.count(_.contains("manifest-")) === 4)
    // current data unharmed
    assert(t.newScan().toDF(spark).count() === rows)
    // time travel to an expired snapshot now fails
    assertThrows[NoSuchElementException](t.asOf(expired.head))
    // idempotent: second pass finds nothing
    assert(t.removeOrphanFiles().isEmpty)
  }

  test("orphan cleanup with full history present removes nothing") {
    val cat = LakeCatalog.open(freshWarehouse())
    val t = cat.createTable("ns", "noorphans", ordersDF.schema)
    t.appendData(ordersDF.coalesce(1))
    t.refresh().compact(spark, targetFiles = 1)
    // both snapshots still reference their files
    assert(t.refresh().removeOrphanFiles().isEmpty)
    assert(t.newScan().toDF(spark).count() === ordersDF.count())
  }

  test("expireSnapshots refuses keepLast < 1") {
    val cat = LakeCatalog.open(freshWarehouse())
    val t = cat.createTable("ns", "guard", ordersDF.schema)
    t.appendData(ordersDF.coalesce(1))
    assertThrows[IllegalArgumentException](t.refresh().expireSnapshots(0))
  }
}
