package graft.lake

import org.apache.spark.sql.functions._

/** Compaction + copy-on-write mutation invariants (SURVEY.md §2.B):
  * rewrite shrinks file count but preserves every record; delete/update
  * only rewrite files that may contain matches. */
class CompactionSpec extends LakeSuite {

  test("compact: 8 one-commit files -> 2, totalRecords unchanged, old snapshot intact") {
    val cat = LakeCatalog.open(freshWarehouse())
    val t = cat.createTable("ns", "compacted", ordersDF.schema)
    (0 until 8).foreach(i =>
      t.refresh().appendData(ordersDF.filter(col("o_orderkey") % 8 === i).coalesce(1)))
    val before = t.refresh().metadata
    assert(before.currentFiles.size === 8)
    val rows = before.currentSnapshot.get.totalRecords

    val report = t.compact(spark, targetFiles = 2)
    val after = t.refresh().metadata
    assert(after.currentFiles.size === 2)
    assert(after.currentSnapshot.get.totalRecords === rows)
    assert(report.addedDataFiles === 2)
    assert(t.newScan().toDF(spark).count() === rows)
    // the pre-compaction snapshot is still scannable (time travel)
    assert(t.asOf(before.currentSnapshotId).toDF(spark).count() === rows)
  }

  test("compact honors targetFiles on a PARTITIONED table") {
    val cat = LakeCatalog.open(freshWarehouse())
    val t = cat.createTable("ns", "pcompact", ordersDF.schema,
      spec = Seq(PartitionField("o_orderdate", "year")))
    t.appendData(ordersDF, numFiles = 12)
    assert(t.refresh().metadata.currentFiles.size === 12)
    t.compact(spark, targetFiles = 2)
    // the spec clustering must not re-shuffle past the target count
    assert(t.refresh().metadata.currentFiles.size === 2)
    assert(t.newScan().toDF(spark).count() === ordersDF.count())
  }

  test("copy-on-write delete removes rows and leaves disjoint files untouched") {
    val cat = LakeCatalog.open(freshWarehouse())
    val t = cat.createTable("ns", "deleted", ordersDF.schema,
      spec = Seq(PartitionField("o_orderdate", "year")))
    t.appendData(ordersDF, numFiles = 12)
    val files = t.refresh().metadata.currentFiles
    assume(files.size > 1)
    // delete only 1995 rows: files fully outside 1995 must survive as-is
    val pred = LakePredicate.Lt("o_orderdate",
      java.sql.Timestamp.valueOf("1996-01-01 00:00:00"))
    val untouched = files.filterNot(pred.mayMatch(_, t.metadata)).map(_.path).toSet
    t.deleteWhere(spark, pred)
    val after = t.refresh().metadata.currentFiles.map(_.path).toSet
    assert(untouched.subsetOf(after), "disjoint files must not be rewritten")
    val expected = ordersDF.filter(!(col("o_orderdate") <
      lit("1996-01-01 00:00:00").cast("timestamp"))).count()
    assert(t.newScan().toDF(spark).count() === expected)
  }

  test("copy-on-write update rewrites matching rows in place") {
    val cat = LakeCatalog.open(freshWarehouse())
    val t = cat.createTable("ns", "updated", ordersDF.schema)
    t.appendData(ordersDF)
    t.refresh().updateWhere(spark, LakePredicate.Eq("o_orderstatus", "F"),
      Map("o_orderpriority" -> lit("0-X")))
    val df = t.refresh().newScan().toDF(spark)
    assert(df.filter(col("o_orderstatus") === "F" && col("o_orderpriority") =!= "0-X").count() === 0)
    assert(df.filter(col("o_orderstatus") =!= "F" && col("o_orderpriority") === "0-X").count() === 0)
    assert(df.count() === ordersDF.count())
  }

  test("delete with no matching files is a no-op commit") {
    val cat = LakeCatalog.open(freshWarehouse())
    val t = cat.createTable("ns", "noop", ordersDF.schema)
    t.appendData(ordersDF)
    val before = t.refresh().metadata.currentFiles.map(_.path).toSet
    val r = t.deleteWhere(spark, LakePredicate.Gt("o_totalprice", Double.box(1e12)))
    assert(r.addedDataFiles === 0)
    assert(t.refresh().metadata.currentFiles.map(_.path).toSet === before)
  }

  test("compaction racing a MoR delete re-reads instead of resurrecting") {
    import org.apache.spark.sql.functions.col
    val cat = LakeCatalog.open(freshWarehouse())
    val t = cat.createTable("ns", "race", ordersDF.schema)
    t.appendData(ordersDF, numFiles = 4)
    // a handle loaded BEFORE the concurrent delete: its compact() plans
    // the rewrite from the pre-delete state
    val stale = cat.loadTable("ns", "race")
    cat.loadTable("ns", "race")
      .deleteWhereMoR(spark, LakePredicate.Eq("o_orderstatus", "F"))
    // without validateNoNewDeletesSince this commit would BOTH drop the
    // concurrent tombstones (dropDeletes) and re-append the rows they
    // deleted; the in-CAS conflict + retry re-reads the real state
    stale.compact(spark, targetFiles = 2)
    val live = cat.loadTable("ns", "race").newScan().toDF(spark)
    assert(live.filter(col("o_orderstatus") === "F").count() === 0L)
    assert(live.count() === ordersDF.filter(col("o_orderstatus") =!= "F").count())
    // tombstones materialized by the retried compaction
    assert(cat.loadTable("ns", "race").metadata.currentSnapshot
      .exists(s => s.deleteFiles.isEmpty && s.dvFiles.isEmpty))
  }
}
