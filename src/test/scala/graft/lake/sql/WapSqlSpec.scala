package graft.lake.sql

import org.apache.spark.sql.functions._
import graft.lake.{LakeCatalog, LakePredicate, LakeSuite}

/** `spark.wap.branch` — SQL write-audit-publish (Iceberg's conf, same
  * name): while set, INSERT/DELETE/UPDATE/MERGE commit onto the named
  * branch (auto-created at the current head on first write) and reads
  * in the same session resolve the staged head, so audit queries see
  * exactly what would publish; `CALL system.fast_forward` publishes.
  * Unset-conf sessions keep reading main throughout. */
class WapSqlSpec extends LakeSuite {

  private def withWap[A](branch: String)(body: => A): A = {
    spark.conf.set(Wap.Conf, branch)
    try body finally spark.conf.unset(Wap.Conf)
  }

  test("SQL WAP: writes stage on the conf branch, same-session reads audit it, fast_forward publishes") {
    val wh = freshWarehouse()
    spark.conf.set("spark.sql.catalog.wapcat", classOf[LakeSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.wapcat.warehouse", wh)
    spark.sql("CREATE NAMESPACE wapcat.ns")
    spark.sql(
      """CREATE TABLE wapcat.ns.t
        |  (o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE)""".stripMargin)
    val t = LakeCatalog.open(wh).loadTable("ns", "t")
    val df = ordersDF.select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    t.appendData(df, numFiles = 4)
    val mainCount = df.count()

    withWap("audit") {
      // INSERT stages: the branch auto-creates at the current head
      spark.sql("INSERT INTO wapcat.ns.t VALUES (900000001, 'O', 42.5)")
      assert(t.refresh().refs.contains("audit"))
      // same-session read sees the staged row...
      assert(spark.sql("SELECT count(*) FROM wapcat.ns.t").head.getLong(0)
        === mainCount + 1)
      // DELETE and UPDATE keep staging on the branch
      spark.sql("DELETE FROM wapcat.ns.t WHERE o_orderstatus = 'F'")
      spark.sql(
        "UPDATE wapcat.ns.t SET o_totalprice = 0.0 WHERE o_orderkey = 900000001")
      val expected = df.filter(col("o_orderstatus") =!= "F").count() + 1
      assert(spark.sql("SELECT count(*) FROM wapcat.ns.t").head.getLong(0)
        === expected)
      assert(spark.sql(
        "SELECT o_totalprice FROM wapcat.ns.t WHERE o_orderkey = 900000001")
        .head.getDouble(0) === 0.0)
      // MERGE stages too
      spark.sql(
        """MERGE INTO wapcat.ns.t dst USING
          |  (SELECT 900000002L AS o_orderkey, 'O' AS o_orderstatus,
          |          7.0D AS o_totalprice) src
          |ON dst.o_orderkey = src.o_orderkey
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      assert(spark.sql("SELECT count(*) FROM wapcat.ns.t").head.getLong(0)
        === expected + 1)
      // explicit AS OF wins over the conf (pre-stage head = main's)
      assert(spark.sql(
        s"SELECT count(*) FROM wapcat.ns.t VERSION AS OF 'main'")
        .head.getLong(0) === mainCount)
    }

    // conf unset: main is untouched by ALL of the staged mutations
    assert(spark.sql("SELECT count(*) FROM wapcat.ns.t").head.getLong(0)
      === mainCount)
    assert(t.refresh().newScan().toDF(spark).count() === mainCount)

    // publish, then everyone sees the audited state
    spark.sql("CALL wapcat.system.fast_forward('ns.t', 'audit')")
    val published = df.filter(col("o_orderstatus") =!= "F").count() + 2
    assert(spark.sql("SELECT count(*) FROM wapcat.ns.t").head.getLong(0)
      === published)
    assert(spark.sql(
      "SELECT count(*) FROM wapcat.ns.t WHERE o_orderstatus = 'F'")
      .head.getLong(0) === 0L)
  }

  test("spark.wap.id stages invisible snapshots; cherrypick_snapshot publishes in order") {
    val wh = freshWarehouse()
    spark.conf.set("spark.sql.catalog.wapcat3", classOf[LakeSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.wapcat3.warehouse", wh)
    spark.sql("CREATE NAMESPACE wapcat3.ns")
    spark.sql("CREATE TABLE wapcat3.ns.t (k BIGINT, v STRING)")
    val t = LakeCatalog.open(wh).loadTable("ns", "t")
    spark.sql("INSERT INTO wapcat3.ns.t VALUES (1, 'a'), (2, 'b')")
    val headBefore = t.refresh().currentSnapshotId

    spark.conf.set(Wap.IdConf, "etl-2026-08-13")
    try {
      spark.sql("INSERT INTO wapcat3.ns.t VALUES (3, 'c')")
      // invisible: reads (this session included) still see the old head
      assert(spark.sql("SELECT count(*) FROM wapcat3.ns.t").head.getLong(0) === 2L)
      assert(t.refresh().currentSnapshotId === headBefore)
      // the auditor finds the staged snapshot via the summary...
      val staged = t.metadata.snapshots
        .find(_.summary.get("wap.id").contains("etl-2026-08-13")).get
      // ...audits it by id...
      assert(spark.sql(
        s"SELECT count(*) FROM wapcat3.ns.t VERSION AS OF ${staged.id}")
        .head.getLong(0) === 3L)
      // a duplicate wap.id refuses (orchestrator retry)
      val dup = intercept[Exception](
        spark.sql("INSERT INTO wapcat3.ns.t VALUES (9, 'x')"))
      assert(dup.getMessage.contains("already staged") ||
        Option(dup.getCause).exists(_.getMessage.contains("already staged")))
      // row-level ops refuse instead of silently landing on main
      val del = intercept[Exception](
        spark.sql("DELETE FROM wapcat3.ns.t WHERE k = 1"))
      assert(del.getMessage.contains("spark.wap.branch") ||
        Option(del.getCause).exists(_.getMessage.contains("spark.wap.branch")))
      // ...and publishes
      spark.sql(s"CALL wapcat3.system.cherrypick_snapshot('ns.t', ${staged.id})")
      assert(spark.sql("SELECT count(*) FROM wapcat3.ns.t").head.getLong(0) === 3L)
    } finally spark.conf.unset(Wap.IdConf)

    // fast-forward-only: a snapshot staged on a SUPERSEDED head refuses
    spark.conf.set(Wap.IdConf, "stale-etl")
    try spark.sql("INSERT INTO wapcat3.ns.t VALUES (4, 'd')")
    finally spark.conf.unset(Wap.IdConf)
    val stale = t.refresh().metadata.snapshots
      .find(_.summary.get("wap.id").contains("stale-etl")).get
    spark.sql("INSERT INTO wapcat3.ns.t VALUES (5, 'e')") // head moves on
    val e = intercept[Exception](spark.sql(
      s"CALL wapcat3.system.cherrypick_snapshot('ns.t', ${stale.id})"))
    assert(e.getMessage.contains("fast-forward") ||
      Option(e.getCause).exists(_.getMessage.contains("fast-forward")))

    // both confs set refuses before anything writes
    spark.conf.set(Wap.Conf, "b")
    spark.conf.set(Wap.IdConf, "i")
    try {
      val both = intercept[Exception](
        spark.sql("INSERT INTO wapcat3.ns.t VALUES (6, 'f')"))
      assert(both.getMessage.contains("both set") ||
        Option(both.getCause).exists(_.getMessage.contains("both set")))
    } finally { spark.conf.unset(Wap.Conf); spark.conf.unset(Wap.IdConf) }
  }

  test("SQL WAP guards: tag refuses, INSERT OVERWRITE refuses, empty table refuses, MoR modes stage") {
    val wh = freshWarehouse()
    spark.conf.set("spark.sql.catalog.wapcat2", classOf[LakeSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.wapcat2.warehouse", wh)
    spark.sql("CREATE NAMESPACE wapcat2.ns")
    spark.sql("CREATE TABLE wapcat2.ns.t (k BIGINT, v STRING)")
    val t = LakeCatalog.open(wh).loadTable("ns", "t")

    // empty table: nothing to branch from yet — loud, actionable refusal
    withWap("stage") {
      val e = intercept[Exception](
        spark.sql("INSERT INTO wapcat2.ns.t VALUES (1, 'a')"))
      assert(e.getMessage.contains("no snapshot to branch from"))
    }
    spark.sql("INSERT INTO wapcat2.ns.t VALUES (1, 'a'), (2, 'b'), (3, 'c')")

    // a TAG under the conf name refuses (reads AND writes)
    t.refresh().createTag("pin", t.currentSnapshotId)
    withWap("pin") {
      val e = intercept[Exception](
        spark.sql("INSERT INTO wapcat2.ns.t VALUES (4, 'd')"))
      assert(e.getMessage.contains("requires a branch"))
      val r = intercept[Exception](
        spark.sql("SELECT count(*) FROM wapcat2.ns.t").head)
      assert(r.getMessage.contains("requires a branch"))
    }

    // INSERT OVERWRITE refuses under WAP — and must NOT auto-create
    withWap("stage") {
      val e = intercept[Exception](
        spark.sql("INSERT OVERWRITE wapcat2.ns.t VALUES (9, 'z')"))
      assert(e.getMessage.contains("stageable audit unit"))
      assert(!t.refresh().refs.contains("stage"))
    }
    assert(spark.sql("SELECT count(*) FROM wapcat2.ns.t").head.getLong(0) === 3L)

    // MoR write modes stage tombstones on the branch head, main clean
    spark.sql("ALTER TABLE wapcat2.ns.t SET TBLPROPERTIES " +
      "('write.delete.mode'='merge-on-read')")
    withWap("stage") {
      spark.sql("DELETE FROM wapcat2.ns.t WHERE k = 2")
      assert(spark.sql("SELECT count(*) FROM wapcat2.ns.t").head.getLong(0) === 2L)
    }
    assert(spark.sql("SELECT count(*) FROM wapcat2.ns.t").head.getLong(0) === 3L)
    assert(t.refresh().metadata.currentSnapshot.exists(_.deleteFiles.isEmpty))
    val staged = t.refresh().scanRef("stage", LakePredicate.AlwaysTrue)
    assert(staged.toDF(spark).count() === 2L)
  }
}
