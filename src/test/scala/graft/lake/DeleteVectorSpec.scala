package graft.lake

import org.apache.spark.sql.functions._

/** Deletion vectors (Iceberg v3's MoR storage): per-data-file compressed
  * bitmaps replace row-granular (file_path, pos) parquet tombstones.
  * One blob object per commit, at most one live DV per data file
  * (writers merge, commits replace), and reads subtract tombstoned rows
  * with a broadcast codegen'd map-side FILTER — no join, no shuffle —
  * degrading to a distributed expand + anti-join above the broadcast
  * budget. */
class DeleteVectorSpec extends LakeSuite {

  test("bitmap core: build/contains/union/serialize across sparse and dense containers") {
    // sparse, dense, and container-boundary positions, far-apart highs
    val dense = (0L until 60000L by 3L)
    val positions = (dense ++ Seq(65535L, 65536L, 1L << 21, (1L << 40) + 7L))
      .distinct.sorted
    val dv = DeleteVector.fromSorted(positions.iterator)
    assert(dv.cardinality === positions.size.toLong)
    positions.foreach(p => assert(dv.contains(p), s"missing $p"))
    Seq(1L, 2L, 59999L, 65534L, 1L << 22, (1L << 40) + 8L).foreach(p =>
      assert(!dv.contains(p), s"phantom $p"))
    assert(dv.positions.toSeq === positions)

    val rt = DeleteVector.deserialize(dv.serialize)
    assert(rt.cardinality === dv.cardinality)
    assert(rt.positions.toSeq === positions)

    val other = DeleteVector.fromSorted(Iterator(2L, 65534L, (1L << 40) + 7L))
    val merged = dv.union(other)
    assert(merged.cardinality === dv.cardinality + 2) // one overlaps
    assert(merged.contains(2L) && merged.contains(65534L))

    // blob packing round-trips multiple files' vectors
    val blob = DeleteVector.writeBlob(Seq("f1" -> dv, "f2" -> other))
    val back = DeleteVector.readBlob(blob)
    assert(back.map(_._1) === Seq("f1", "f2"))
    assert(back.head._2.positions.toSeq === positions)
  }

  test("DV delete: one blob per commit, one live DV per file, filter-based reads, merge on overlap") {
    val cat = LakeCatalog.open(freshWarehouse())
    val t = cat.createTable("ns", "dv", ordersDF.schema)
    t.appendData(ordersDF, numFiles = 4)
    t.refresh().setProperty("write.delete.vector.enabled", "true")
    val before = t.refresh().metadata.currentFiles.map(_.path).sorted
    val fCount = ordersDF.filter(col("o_orderstatus") === "F").count()

    val r1 = t.refresh().deleteWhereMoR(spark, LakePredicate.Eq("o_orderstatus", "F"))
    val s1 = t.refresh().metadata.currentSnapshot.get
    // data files untouched; tombstones are DVs, not positional parquet
    assert(t.refresh().metadata.currentFiles.map(_.path).sorted === before)
    assert(s1.deleteFiles.isEmpty)
    assert(s1.dvFiles.nonEmpty)
    // ONE blob object for the whole commit, entries keyed by data file
    assert(s1.dvFiles.map(_.path).distinct.size === 1)
    assert(s1.dvFiles.map(_.path).head.endsWith(".gdv"))
    assert(s1.dvFiles.map(LakeTable.dvRef).distinct.size === s1.dvFiles.size)
    assert(s1.dvFiles.map(_.recordCount).sum === fCount)
    // the delete meters see DV cardinalities as positional deletes
    assert(r1.totalPositionalDeletes === fCount)
    // reads subtract via the DV filter — with codegen fallback OFF, so
    // a broken DvContains doGenCode throws instead of silently
    // interpreting
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val live = t.refresh().newScan().toDF(spark)
      assert(live.filter(col("o_orderstatus") === "F").count() === 0L)
      assert(live.count() === ordersDF.count() - fCount)
    } finally spark.conf.set("spark.sql.codegen.fallback", "true")

    // overlapping second delete: DVs MERGE (already-tombstoned rows not
    // re-recorded) and each touched file keeps exactly ONE live DV
    val r2 = t.refresh().deleteWhereMoR(spark,
      LakePredicate.Ge("o_totalprice", Double.box(300000.0)))
    val survivors = ordersDF.filter(
      !(col("o_orderstatus") === "F" || col("o_totalprice") >= 300000.0))
    val s2 = t.refresh().metadata.currentSnapshot.get
    assert(s2.dvFiles.map(LakeTable.dvRef).distinct.size === s2.dvFiles.size)
    assert(s2.dvFiles.map(_.recordCount).sum === ordersDF.count() - survivors.count())
    assert(r2.totalPositionalDeletes === ordersDF.count() - survivors.count())
    assert(t.refresh().newScan().toDF(spark).count() === survivors.count())

    // time travel sees each snapshot's own DV state
    assert(t.asOf(s1.id).toDF(spark).count() === ordersDF.count() - fCount)

    // stats-aggregate pushdown refuses while DVs are live
    assert(t.refresh().newScan().countStarFromStats.isEmpty)

    // above the broadcast budget the read degrades to the distributed
    // expansion + anti-join — identical rows
    t.refresh().setProperty("read.delete.broadcast-bytes", "0")
    val viaAntiJoin = t.refresh().newScan().toDF(spark)
    assert(viaAntiJoin.count() === survivors.count())
    assert(viaAntiJoin.filter(col("o_orderstatus") === "F").count() === 0L)
    t.refresh().removeProperty("read.delete.broadcast-bytes")

    // MoR UPDATE under DVs: tombstones via bitmap, updated rows appended
    t.refresh().setProperty("write.update.mode", "merge-on-read")
    t.refresh().updateWhereMoR(spark, LakePredicate.Eq("o_orderstatus", "O"),
      Map("o_orderpriority" -> lit("9-DV")))
    val updated = t.refresh().newScan().toDF(spark)
    assert(updated.count() === survivors.count())
    assert(updated.filter(col("o_orderstatus") === "O")
      .filter(col("o_orderpriority") =!= "9-DV").count() === 0L)

    // compact materializes: DVs retire, rows stay exact
    t.refresh().compact(spark, targetFiles = 2)
    val s3 = t.refresh().metadata.currentSnapshot.get
    assert(s3.dvFiles.isEmpty && s3.deleteFiles.isEmpty)
    assert(t.refresh().newScan().toDF(spark).count() === survivors.count())
    // pushdown comes back
    assert(t.refresh().newScan().countStarFromStats.contains(survivors.count()))
  }

  test("DV maintenance: rewrite_position_deletes retires DVs; orphan sweep honors blob liveness") {
    val cat = LakeCatalog.open(freshWarehouse())
    val t = cat.createTable("ns", "dvm", ordersDF.schema)
    t.appendData(ordersDF, numFiles = 4)
    t.refresh().setProperty("write.delete.vector.enabled", "true")
    t.refresh().deleteWhereMoR(spark, LakePredicate.Eq("o_orderstatus", "F"))
    val blob = t.refresh().metadata.currentSnapshot.get.dvFiles.head.path
    val survivors = ordersDF.filter(col("o_orderstatus") =!= "F").count()

    // the live blob survives an orphan sweep
    t.refresh().removeOrphanFiles()
    assert(DataFs.readBytes(blob).nonEmpty)

    // rewrite_position_deletes targets exactly the DV-referenced files
    assert(t.refresh().rewritePositionDeletes(spark).isDefined)
    val after = t.refresh().metadata.currentSnapshot.get
    assert(after.dvFiles.isEmpty)
    assert(t.refresh().newScan().toDF(spark).count() === survivors)

    // once history expires, the sweep reclaims the orphaned blob
    t.refresh().expireSnapshots(keepLast = 1)
    val removed = t.refresh().removeOrphanFiles()
    assert(removed.exists(_.endsWith(".gdv")))
    assert(t.refresh().newScan().toDF(spark).count() === survivors)
  }

  test("DV tables through SQL and CDC: substituted reads, metadata table, changes feed") {
    val wh = freshWarehouse()
    spark.conf.set("spark.sql.catalog.dvc", classOf[sql.LakeSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.dvc.warehouse", wh)
    try {
      spark.sql("CREATE NAMESPACE dvc.ns")
      spark.sql("CREATE TABLE dvc.ns.t (id INT, status STRING) " +
        "TBLPROPERTIES ('write.delete.vector.enabled'='true', " +
        "'write.delete.mode'='merge-on-read')")
      import spark.implicits._
      val df = (1 to 100).map(i => (i, if (i % 4 == 0) "F" else "O")).toDF("id", "status")
      df.writeTo("dvc.ns.t").append()
      val t = LakeCatalog.open(wh).loadTable("ns", "t")
      val firstSnap = t.metadata.currentSnapshotId

      // SQL DELETE routes through MoR → DVs; the substitution rule keeps
      // SQL reads exact over live DVs
      spark.sql("DELETE FROM dvc.ns.t WHERE status = 'F'")
      assert(t.refresh().metadata.currentSnapshot.get.dvFiles.nonEmpty)
      assert(spark.sql("SELECT count(*) FROM dvc.ns.t").head().getLong(0) === 75L)
      assert(spark.sql("SELECT count(*) FROM dvc.ns.t WHERE status = 'F'")
        .head().getLong(0) === 0L)

      // delete_files metadata table surfaces the DV entries
      val kinds = spark.sql("SELECT content FROM dvc.ns.t.delete_files")
        .collect().map(_.getString(0)).toSet
      assert(kinds === Set("dv"))

      // CDC: the append since firstSnap minus current tombstones
      assert(t.refresh().changesSince(spark, firstSnap).count() === 0L)
    } finally {
      spark.conf.unset("spark.sql.catalog.dvc")
      spark.conf.unset("spark.sql.catalog.dvc.warehouse")
    }
  }

  test("property: random bitmaps round-trip and compose exactly vs a set model") {
    // the codec is data-loss-class: a wrong bit silently deletes (or
    // resurrects) a row. Drive random position sets — sparse, dense,
    // container-boundary-straddling, high-key — through serialize/
    // deserialize/union/minus/positions against plain Sets
    for (seed <- Seq(3, 17, 99)) {
      val rng = new scala.util.Random(seed)
      def randomSet(): Set[Long] = {
        val style = rng.nextInt(4)
        val base = (rng.nextInt(4).toLong << 16) // container boundaries
        val n = 1 + rng.nextInt(2000)
        (0 until n).map { _ =>
          style match {
            case 0 => base + rng.nextInt(100)           // dense cluster
            case 1 => rng.nextLong(1L << 40)            // sparse high keys
            case 2 => base + 65530 + rng.nextInt(12)    // straddle boundary
            case _ => rng.nextInt(1 << 20).toLong       // mid-density
          }
        }.toSet
      }
      for (_ <- 0 until 20) {
        val a = randomSet()
        val b = randomSet()
        val dvA = DeleteVector.fromSorted(a.toSeq.sorted.iterator)
        val dvB = DeleteVector.fromSorted(b.toSeq.sorted.iterator)
        // round-trip
        val rt = DeleteVector.deserialize(dvA.serialize)
        assert(rt.positions.toSet === a, s"seed=$seed roundtrip")
        // membership on members and near-misses
        a.take(50).foreach(p => assert(rt.contains(p)))
        a.take(50).foreach(p => if (!a(p + 1)) assert(!rt.contains(p + 1)))
        // union / minus vs the set model
        assert(dvA.union(dvB).positions.toSet === (a ++ b), s"seed=$seed union")
        assert(dvA.minus(dvB).positions.toSet === (a -- b), s"seed=$seed minus")
        // cardinality-consistent
        assert(dvA.positions.size === a.size)
      }
    }
  }
}
