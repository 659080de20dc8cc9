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
