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

  test("expireSnapshotsOlderThan drops old history, never the current snapshot") {
    val cat = LakeCatalog.open(freshWarehouse())
    val t = cat.createTable("ns", "aged", ordersDF.schema)
    t.appendData(ordersDF.limit(10).coalesce(1))
    t.refresh().appendData(ordersDF.limit(10).coalesce(1))
    Thread.sleep(15)
    val cutoff = System.currentTimeMillis()
    Thread.sleep(15)
    t.refresh().appendData(ordersDF.limit(10).coalesce(1))
    val expired = t.refresh().expireSnapshotsOlderThan(cutoff)
    assert(expired.size === 2) // the two pre-cutoff snapshots
    assert(t.snapshots.size === 1)
    assert(t.newScan().toDF(spark).count() === 30)
    // cutoff in the future: everything but the current snapshot goes
    val t2 = cat.createTable("ns", "aged2", ordersDF.schema)
    t2.appendData(ordersDF.limit(5).coalesce(1))
    t2.refresh().appendData(ordersDF.limit(5).coalesce(1))
    assert(t2.refresh().expireSnapshotsOlderThan(Long.MaxValue).size === 1)
    assert(t2.snapshots.map(_.id) === Seq(t2.currentSnapshotId))
  }

  test("binpack compaction rewrites only small files; healthy files survive by reference") {
    val cat = LakeCatalog.open(freshWarehouse())
    val t = cat.createTable("ns", "binpack", ordersDF.schema)
    t.appendData(ordersDF, numFiles = 1) // one healthy file
    (0 until 4).foreach(_ =>
      t.refresh().appendData(ordersDF.limit(20).coalesce(1))) // four tiny files
    val files = t.refresh().metadata.currentFiles
    val healthy = files.maxBy(_.sizeBytes)
    val smallBytes = healthy.sizeBytes // everything below the big file
    val expected = t.newScan().toDF(spark).count()
    assert(t.compactSmallFiles(spark, smallBytes).isDefined)
    val after = t.refresh().metadata.currentFiles
    assert(after.map(_.path).contains(healthy.path),
      "the healthy file must survive as-is")
    assert(after.size < files.size)
    assert(t.newScan().toDF(spark).count() === expected)
    // CONVERGENCE: floor-sizing graduates outputs past the threshold,
    // so a second scheduled pass finds nothing and COMMITS nothing
    // (no snapshot-log growth from quiet maintenance runs)
    val snapsBefore = t.refresh().snapshots.size
    assert(t.compactSmallFiles(spark, smallBytes).isEmpty)
    assert(t.refresh().snapshots.size === snapsBefore)
  }

  test("expireSnapshots refuses keepLast < 1") {
    val cat = LakeCatalog.open(freshWarehouse())
    val t = cat.createTable("ns", "guard", ordersDF.schema)
    t.appendData(ordersDF.coalesce(1))
    assertThrows[IllegalArgumentException](t.refresh().expireSnapshots(0))
  }

  test("no-op maintenance commits nothing: metadata versions converge") {
    val cat = LakeCatalog.open(freshWarehouse())
    val t = cat.createTable("ns", "quiet", ordersDF.schema)
    t.appendData(ordersDF, numFiles = 2)
    val v0 = t.refresh().version0
    // nothing to expire, nothing to rewrite: a 5-minute cron loop on a
    // quiet table must not write a byte-identical v{N+1}.json per tick
    (0 until 3).foreach { _ =>
      t.refresh().expireSnapshots(keepLast = 5)
      t.refresh().rewriteManifests(minManifests = 100)
    }
    assert(t.refresh().version0 === v0,
      "identity transforms must not mint metadata versions")
    // a REAL change still commits
    t.refresh().setProperty("k", "v")
    assert(t.refresh().version0 === v0 + 1)
    // and setting the SAME value again converges too
    t.refresh().setProperty("k", "v")
    assert(t.refresh().version0 === v0 + 1)
  }
}
