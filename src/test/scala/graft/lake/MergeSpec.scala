package graft.lake

import org.apache.spark.sql.functions._

/** Keyed MERGE invariants: upsert semantics, copy-on-write locality
  * (files outside the source key range survive untouched), and guards. */
class MergeSpec extends LakeSuite {

  test("merge updates matching keys, inserts new ones, leaves the rest") {
    val cat = LakeCatalog.open(freshWarehouse())
    val t = cat.createTable("ns", "merged", ordersDF.schema)
    t.appendData(ordersDF)
    val source = ordersDF.filter(col("o_orderkey") < 100)
      .withColumn("o_totalprice", lit(1.0))
      .unionByName(ordersDF.filter(col("o_orderkey") < 10)
        .withColumn("o_orderkey", col("o_orderkey") + 1000000L))
    t.refresh().mergeInto(spark, source, Seq("o_orderkey"))

    val out = t.refresh().newScan().toDF(spark)
    val nOrig = ordersDF.count()
    val nInserts = ordersDF.filter(col("o_orderkey") < 10).count()
    assert(out.count() === nOrig + nInserts)
    assert(out.filter(col("o_orderkey") < 100 && col("o_orderkey") >= 0 &&
      col("o_totalprice") =!= 1.0).filter(col("o_orderkey") < 100).count() === 0)
    assert(out.filter(col("o_orderkey") >= 1000000L).count() === nInserts)
  }

  test("merge only rewrites files overlapping the source key range") {
    val cat = LakeCatalog.open(freshWarehouse())
    val t = cat.createTable("ns", "merge_cow", ordersDF.schema,
      spec = Seq(PartitionField("o_orderkey", "identity")))
    t.appendData(ordersDF, numFiles = 10) // range-clustered on the key
    val before = t.refresh().metadata.currentFiles
    val source = ordersDF.filter(col("o_orderkey") < 50)
      .withColumn("o_orderstatus", lit("M"))
    t.mergeInto(spark, source, Seq("o_orderkey"))
    val after = t.refresh().metadata.currentFiles.map(_.path).toSet
    val untouched = before.filter(f =>
      Stats.cmp(org.apache.spark.sql.types.LongType,
        f.minValues(t.metadata.statKey("o_orderkey").get), "50") > 0).map(_.path)
    assert(untouched.nonEmpty, "need files beyond the source range")
    assert(untouched.forall(after.contains), "out-of-range files must survive")
    assert(t.newScan(LakePredicate.Eq("o_orderstatus", "M")).toDF(spark).count()
      === source.count())
  }

  test("merge with an empty source is a no-op commit, not an NPE") {
    val cat = LakeCatalog.open(freshWarehouse())
    val t = cat.createTable("ns", "merge_empty", ordersDF.schema)
    t.appendData(ordersDF.limit(20))
    val before = t.refresh().metadata.currentFiles.map(_.path).toSet
    val r = t.mergeInto(spark, ordersDF.filter(lit(false)), Seq("o_orderkey"))
    assert(r.addedDataFiles === 0)
    assert(t.refresh().metadata.currentFiles.map(_.path).toSet === before)
    assert(t.newScan().toDF(spark).count() === 20)
  }

  test("merge guards: bad key and schema mismatch fail fast") {
    val cat = LakeCatalog.open(freshWarehouse())
    val t = cat.createTable("ns", "merge_guard", ordersDF.schema)
    t.appendData(ordersDF.limit(10))
    assertThrows[IllegalArgumentException](
      t.refresh().mergeInto(spark, ordersDF, Seq("nope")))
    assertThrows[IllegalArgumentException](
      t.mergeInto(spark, ordersDF.drop("o_orderpriority"), Seq("o_orderkey")))
  }

  test("replaceWhere: one-commit slice backfill; stray rows refuse; tombstones apply") {
    import org.apache.spark.sql.functions.{col, lit}
    val cat = LakeCatalog.open(freshWarehouse())
    val t = cat.createTable("ns", "rw", ordersDF.schema)
    t.appendData(ordersDF, numFiles = 4)
    val before = t.refresh().currentSnapshotId

    // a replacement row OUTSIDE the slice refuses pre-commit: it would
    // silently land in a slice the caller never asked to touch
    val stray = ordersDF.limit(5) // mixed statuses
    val e = intercept[IllegalArgumentException](t.refresh().replaceWhere(
      spark, LakePredicate.Eq("o_orderstatus", "P"), stray))
    assert(e.getMessage.contains("must all match"))
    assert(t.refresh().currentSnapshotId === before) // nothing committed

    // MoR-delete part of the slice first: the replace must not
    // resurrect tombstoned rows from the files it rewrites
    t.refresh().deleteWhereMoR(spark, LakePredicate.Ge("o_totalprice",
      Double.box(400000.0)))
    val backfill = ordersDF.filter(col("o_orderstatus") === "P")
      .withColumn("o_orderpriority", lit("0-BF"))
    val r = t.refresh().replaceWhere(spark,
      LakePredicate.Eq("o_orderstatus", "P"), backfill)
    assert(r.snapshotId === before + 2) // ONE commit for the whole swap
    val live = t.refresh().newScan().toDF(spark)
    // the slice is exactly the backfill (including rows the tombstones
    // had removed — a backfill REGENERATES its slice)
    assert(live.filter(col("o_orderstatus") === "P")
      .filter(col("o_orderpriority") =!= "0-BF").count() === 0L)
    assert(live.filter(col("o_orderstatus") === "P").count() === backfill.count())
    // outside the slice the tombstones still hold
    assert(live.filter(col("o_orderstatus") =!= "P" &&
      col("o_totalprice") >= 400000.0).count() === 0L)
  }
}
