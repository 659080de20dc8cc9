package graft.lake.sql

import org.apache.spark.sql.functions._
import graft.lake.{LakeCatalog, LakeSuite}

/** `df.writeTo(t).overwrite(cond)` — DSv2 SupportsOverwrite routed onto
  * the atomic [[graft.lake.LakeTable.replaceWhere]] backfill: one
  * serializable commit deletes the matching slice and lands its
  * replacement. */
class ReplaceWhereSqlSpec extends LakeSuite {

  test("writeTo.overwrite(cond) replaces exactly the matching slice in one commit") {
    import spark.implicits._
    val wh = freshWarehouse()
    spark.conf.set("spark.sql.catalog.rws", classOf[LakeSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.rws.warehouse", wh)
    try {
      spark.sql("CREATE NAMESPACE rws.ns")
      spark.sql("CREATE TABLE rws.ns.t (id INT, day STRING, v DOUBLE)")
      val v1 = (1 to 60).map(i => (i, s"d${i % 3}", i * 1.0)).toDF("id", "day", "v")
      v1.writeTo("rws.ns.t").append()
      val t = LakeCatalog.open(wh).loadTable("ns", "t")
      val before = t.metadata.currentSnapshotId

      // regenerate one day's slice
      val backfill = (101 to 110).map(i => (i, "d1", i * 2.0)).toDF("id", "day", "v")
      backfill.writeTo("rws.ns.t").overwrite($"day" === "d1")
      assert(t.refresh().metadata.currentSnapshotId === before + 1) // ONE commit
      val rows = spark.sql("SELECT day, count(*) AS n, min(id) AS lo FROM rws.ns.t " +
        "GROUP BY day ORDER BY day").collect()
      assert(rows.map(r => (r.getString(0), r.getLong(1))).toSeq ===
        Seq(("d0", 20L), ("d1", 10L), ("d2", 20L)))
      assert(rows(1).getInt(2) === 101) // the slice IS the backfill

      // a replacement row outside the condition refuses
      val stray = Seq((999, "d2", 0.0)).toDF("id", "day", "v")
      val e = intercept[Exception](stray.writeTo("rws.ns.t").overwrite($"day" === "d1"))
      assert(e.getMessage.contains("must all match") ||
        Option(e.getCause).exists(_.getMessage.contains("must all match")))

      // a condition with no exact manifest form refuses (never widens):
      // Spark itself rejects untranslatable expressions before our
      // builder; anything translatable-but-inexact refuses in the
      // builder with the manifest-predicate message
      val f = intercept[Exception](backfill.writeTo("rws.ns.t")
        .overwrite(lower($"day") === "d1"))
      assert(f.getMessage.contains("does not support overwrite by expression") ||
        f.getMessage.contains("no exact manifest-predicate form"))
    } finally {
      spark.conf.unset("spark.sql.catalog.rws")
      spark.conf.unset("spark.sql.catalog.rws.warehouse")
    }
  }
}
