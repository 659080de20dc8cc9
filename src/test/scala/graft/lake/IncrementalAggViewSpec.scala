package graft.lake

import org.apache.spark.sql.functions._

/** Incremental view maintenance invariants the value oracle cannot
  * see: refreshes consume only the delta (watermark-to-head), a no-op
  * refresh commits nothing, each refresh is ONE commit moving contents
  * and watermark together, MoR tombstone deltas maintain correctly,
  * and a randomized mutation sequence converges to the direct
  * recompute. */
class IncrementalAggViewSpec extends LakeSuite {

  private val keys = Seq("o_orderpriority")
  private def sums = Seq(
    "cents" -> expr("CAST(floor(o_totalprice * 100) AS LONG)"))

  private def mkTables(): (LakeTable, LakeTable) = {
    import org.apache.spark.sql.types._
    val cat = LakeCatalog.open(freshWarehouse())
    val base = cat.createTable("ns", "b", ordersDF.schema)
    val view = cat.createTable("ns", "v", StructType(Seq(
      StructField("o_orderpriority", StringType),
      StructField("cnt", LongType), StructField("cents", LongType))))
    (base, view)
  }

  private def direct(t: LakeTable): Seq[(String, Long, Long)] =
    t.refresh().newScan().toDF(spark)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("cnt"),
        sum(expr("CAST(floor(o_totalprice * 100) AS LONG)")).as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq

  private def viewRows(v: LakeTable): Seq[(String, Long, Long)] =
    v.refresh().newScan().toDF(spark)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq

  test("refreshes are incremental, atomic, and no-op-stable") {
    val (base, view) = mkTables()
    base.refresh().appendData(ordersDF, numFiles = 2)
    val r1 = IncrementalAggView.refresh(spark, base, view, keys, sums)
    assert(r1.refreshed && r1.fromSnapshotId == 0L)
    assert(viewRows(view) == direct(base))
    val v1 = view.refresh().metadata.snapshots.size

    // no-op: head == watermark → zero commits, report says so
    val r2 = IncrementalAggView.refresh(spark, base, view, keys, sums)
    assert(!r2.refreshed && r2.deltaRows == 0L)
    assert(view.refresh().metadata.snapshots.size == v1, "no-op committed")

    // incremental: the next refresh starts AT the previous head, and
    // one refresh = one commit even over two base commits
    base.refresh().deleteWhere(spark,
      LakePredicate.Ge("o_totalprice", Double.box(450000.0)))
    base.refresh().appendData(ordersDF.filter(col("o_orderkey") % 7 === 0))
    val r3 = IncrementalAggView.refresh(spark, base, view, keys, sums)
    assert(r3.refreshed && r3.fromSnapshotId == r1.toSnapshotId,
      s"refresh must start at the prior watermark: $r3")
    assert(view.refresh().metadata.snapshots.size == v1 + 1,
      "one refresh must be one commit")
    assert(viewRows(view) == direct(base))
    assert(view.refresh().metadata.properties(
      IncrementalAggView.WatermarkProp).toLong == r3.toSnapshotId)
  }

  test("MoR tombstones and group-moving updates maintain correctly") {
    val (base, view) = mkTables()
    base.refresh().appendData(ordersDF, numFiles = 2)
    IncrementalAggView.refresh(spark, base, view, keys, sums)
    // MoR delete: the batch changelog reconstructs tombstoned pre-images
    base.refresh().deleteWhereMoR(spark,
      LakePredicate.Ge("o_totalprice", Double.box(400000.0)))
    // CoW update moving rows BETWEEN groups (delete+insert pair)
    base.refresh().updateWhere(spark,
      LakePredicate.Eq("o_orderstatus", "F"),
      Map("o_orderpriority" -> lit("9-MOVED")))
    IncrementalAggView.refresh(spark, base, view, keys, sums)
    assert(viewRows(view) == direct(base))
  }

  test("randomized mutation sequence converges to the direct recompute") {
    val (base, view) = mkTables()
    base.refresh().appendData(ordersDF.filter(col("o_orderkey") % 3 === 0))
    IncrementalAggView.refresh(spark, base, view, keys, sums)
    val rnd = new scala.util.Random(14)
    (0 until 6).foreach { i =>
      rnd.nextInt(4) match {
        case 0 => base.refresh().appendData(
          ordersDF.filter(col("o_orderkey") % 5 === rnd.nextInt(5))
            .withColumn("o_orderkey", col("o_orderkey") + (i + 1) * 10000000L))
        case 1 => base.refresh().deleteWhere(spark,
          LakePredicate.Le("o_totalprice", Double.box(20000.0 * (i + 1))))
        case 2 => base.refresh().updateWhere(spark,
          LakePredicate.Eq("o_orderstatus", Seq("F", "O", "P")(rnd.nextInt(3))),
          Map("o_orderpriority" -> lit(s"$i-SHUFFLED")))
        case 3 => base.refresh().compact(spark, targetFiles = 2)
      }
      if (rnd.nextBoolean()) {
        IncrementalAggView.refresh(spark, base, view, keys, sums)
        assert(viewRows(view) == direct(base), s"diverged after step $i")
      }
    }
    IncrementalAggView.refresh(spark, base, view, keys, sums)
    assert(viewRows(view) == direct(base))
  }
}
