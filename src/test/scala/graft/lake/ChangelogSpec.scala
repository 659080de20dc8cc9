package graft.lake

import org.apache.spark.sql.functions._

/** Per-commit changelog (Iceberg's create_changelog_view): inserts AND
  * full-pre-image deletes, commit by commit, across every tombstone
  * format — positional parquet, deletion-vector deltas (bitmap
  * `minus`), equality tombstones (MoR upsert), and copy-on-write
  * file-granular gross changes. Replace commits (compaction) emit
  * nothing; an expired snapshot inside the range refuses. */
class ChangelogSpec extends LakeSuite {

  private def byType(df: org.apache.spark.sql.DataFrame, snap: Long, tpe: String) =
    df.where(col("_commit_snapshot_id") === snap && col("_change_type") === tpe)

  test("appends, MoR positional deletes, MoR update, and CoW emit exact per-commit changes") {
    import spark.implicits._
    val cat = LakeCatalog.open(freshWarehouse())
    val v = (1 to 100).map(i => (i, if (i % 4 == 0) "F" else "O", i * 10.0))
      .toDF("id", "status", "amt")
    val t = cat.createTable("ns", "cl", v.schema)
    t.appendData(v.filter($"id" <= 60), numFiles = 2) // snap 1
    t.refresh().appendData(v.filter($"id" > 60))      // snap 2
    t.refresh().deleteWhereMoR(spark, LakePredicate.Eq("status", "F")) // snap 3
    t.refresh().updateWhereMoR(spark, LakePredicate.Ge("amt", Double.box(900.0)),
      Map("status" -> lit("X")))                      // snap 4
    t.refresh().compact(spark, targetFiles = 1)       // snap 5: replace → silent
    t.refresh().deleteWhere(spark, LakePredicate.Le("id", Int.box(5))) // snap 6: CoW

    val cl = t.refresh().changelog(spark, fromSnapshotId = 0L)
    assert(byType(cl, 1L, "insert").count() === 60L)
    assert(byType(cl, 2L, "insert").count() === 40L)
    assert(byType(cl, 1L, "delete").count() === 0L)
    // snap 3: every F row deleted, original values intact
    val d3 = byType(cl, 3L, "delete")
    assert(d3.count() === 25L)
    assert(d3.where($"status" =!= "F").count() === 0L)
    assert(d3.agg(sum($"amt")).head().getDouble(0) ===
      (1 to 100).filter(_ % 4 == 0).map(_ * 10.0).sum)
    // snap 4: MoR update = delete of pre-image + insert of post-image
    // (amt >= 900 and not already deleted: ids 90..100 minus F rows)
    val touched = (90 to 100).filterNot(_ % 4 == 0)
    val d4 = byType(cl, 4L, "delete")
    val i4 = byType(cl, 4L, "insert")
    assert(d4.select("id").as[Int].collect().sorted.toSeq === touched)
    assert(d4.where($"status" === "X").count() === 0L) // pre-image
    assert(i4.select("id").as[Int].collect().sorted.toSeq === touched)
    assert(i4.where($"status" =!= "X").count() === 0L) // post-image
    // snap 5 (compaction): no logical change
    assert(cl.where($"_commit_snapshot_id" === 5L).count() === 0L)
    // snap 6 (CoW delete): gross file-granular changes — the rewritten
    // file's parent-live rows delete, survivors re-insert; net = ids
    // 1-5 minus id 4 (already MoR-deleted at snap 3 — no re-delete)
    val d6 = byType(cl, 6L, "delete")
    val i6 = byType(cl, 6L, "insert")
    assert(d6.select("id").except(i6.select("id")).as[Int].collect().sorted.toSeq
      === Seq(1, 2, 3, 5))
    assert(i6.select("id").except(d6.select("id")).count() === 0L)

    // range endpoints: from snap 2 (exclusive) to snap 3 (inclusive)
    val window = t.refresh().changelog(spark, 2L, Some(3L))
    assert(window.select("_commit_snapshot_id").distinct().as[Long].collect()
      .toSeq === Seq(3L))

    // an expired snapshot inside the range refuses
    t.refresh().expireSnapshots(keepLast = 2)
    intercept[IllegalStateException](t.refresh().changelog(spark, 0L))
  }

  test("deletion-vector deltas and equality tombstones feed the changelog") {
    import spark.implicits._
    val cat = LakeCatalog.open(freshWarehouse())
    val v = (1 to 50).map(i => (i, s"u$i", i * 1.0)).toDF("id", "name", "score")
    val t = cat.createTable("ns", "cldv", v.schema)
    t.setProperty("write.delete.vector.enabled", "true")
    t.refresh().appendData(v, numFiles = 2)
    val del1 = t.refresh()
      .deleteWhereMoR(spark, LakePredicate.Le("id", Int.box(10))).snapshotId
    // overlapping delete: the DV delta is ONLY the newly-deleted rows
    val del2 = t.refresh()
      .deleteWhereMoR(spark, LakePredicate.Le("id", Int.box(15))).snapshotId
    // MoR upsert: equality tombstones + replacement rows in one commit
    val up = Seq((20, "u20-v2", 99.0), (51, "u51", 51.0)).toDF("id", "name", "score")
    val upId = t.refresh().mergeIntoMoR(spark, up, keys = Seq("id")).snapshotId

    val cl = t.refresh().changelog(spark, 0L)
    assert(byType(cl, del1, "delete").select("id").as[Int].collect().sorted.toSeq
      === (1 to 10))
    // the bitmap delta: 11..15 only, not a re-delete of 1..10
    assert(byType(cl, del2, "delete").select("id").as[Int].collect().sorted.toSeq
      === (11 to 15))
    // upsert: the replaced key's pre-image deletes, both source rows insert
    val d5 = byType(cl, upId, "delete").select("id", "name").as[(Int, String)].collect()
    assert(d5.toSeq === Seq((20, "u20")))
    assert(byType(cl, upId, "insert").select("id").as[Int].collect().sorted.toSeq
      === Seq(20, 51))
    // folding the changelog reproduces the live table
    val live = t.refresh().newScan().toDF(spark)
    val folded = cl.where($"_change_type" === "insert").select("id", "name", "score")
      .except(cl.where($"_change_type" === "delete").select("id", "name", "score"))
    assert(folded.except(live).count() === 0L)
    assert(live.except(folded).count() === 0L)
  }

  test("SQL: CALL create_changelog_view registers the feed as a temp view") {
    val wh = freshWarehouse()
    spark.conf.set("spark.sql.catalog.clv", classOf[sql.LakeSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.clv.warehouse", wh)
    try {
      spark.sql("CREATE NAMESPACE clv.ns")
      spark.sql("CREATE TABLE clv.ns.t (id INT, s STRING) " +
        "TBLPROPERTIES ('write.delete.mode'='merge-on-read')")
      spark.sql("INSERT INTO clv.ns.t VALUES (1, 'a'), (2, 'b'), (3, 'c')")
      spark.sql("DELETE FROM clv.ns.t WHERE id = 2")
      val view = spark.sql(
        "CALL clv.system.create_changelog_view('ns.t', 0, 0)").head().getString(0)
      assert(view === "ns_t_changes")
      val rows = spark.sql(s"SELECT id, _change_type FROM $view " +
        "ORDER BY _commit_snapshot_id, id").collect()
      assert(rows.map(r => (r.getInt(0), r.getString(1))).toSeq ===
        Seq((1, "insert"), (2, "insert"), (3, "insert"), (2, "delete")))
    } finally {
      spark.conf.unset("spark.sql.catalog.clv")
      spark.conf.unset("spark.sql.catalog.clv.warehouse")
    }
  }
}
