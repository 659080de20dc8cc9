package graft.lake.sql

import org.apache.spark.sql.functions._
import graft.lake.{LakeCatalog, LakeSuite, TableRef}

/** `ALTER TABLE ... CREATE/DROP BRANCH/TAG` DDL (Iceberg's ref DDL via
  * the injected parser): metadata-only pointer commits over the same
  * ref API the procedures use. */
class RefDdlSpec extends LakeSuite {

  test("CREATE/DROP BRANCH and TAG DDL: AS OF VERSION, RETAIN, IF [NOT] EXISTS, kind guards") {
    val wh = freshWarehouse()
    spark.conf.set("spark.sql.catalog.refddl", classOf[LakeSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.refddl.warehouse", wh)
    try {
      spark.sql("CREATE NAMESPACE refddl.ns")
      spark.sql(s"CREATE TABLE refddl.ns.t (${ordersDF.schema.toDDL})")
      val t = LakeCatalog.open(wh).loadTable("ns", "t")
      val first = t.appendData(ordersDF.filter(col("o_orderkey") % 2 === 0))
      t.refresh().appendData(ordersDF.filter(col("o_orderkey") % 2 === 1))

      spark.sql("ALTER TABLE refddl.ns.t CREATE BRANCH audit")
      spark.sql(
        s"ALTER TABLE refddl.ns.t CREATE TAG v1 AS OF VERSION ${first.snapshotId} RETAIN 30 DAYS")
      val refs = t.refresh().refs
      assert(refs("audit").kind === TableRef.Branch)
      assert(refs("audit").snapshotId === t.currentSnapshotId)
      assert(refs("v1").kind === TableRef.Tag)
      assert(refs("v1").snapshotId === first.snapshotId)
      assert(refs("v1").maxRefAgeMs === Some(30L * 86400000L))

      // the tag pins the first append's state
      assert(t.scanRef("v1").toDF(spark).count() ===
        ordersDF.filter(col("o_orderkey") % 2 === 0).count())

      // IF NOT EXISTS no-ops on an existing ref; plain CREATE refuses
      spark.sql("ALTER TABLE refddl.ns.t CREATE BRANCH IF NOT EXISTS audit")
      intercept[Exception](
        spark.sql("ALTER TABLE refddl.ns.t CREATE BRANCH audit"))

      // kind guard: DROP BRANCH on a tag refuses either way, and
      // CREATE BRANCH IF NOT EXISTS over an existing TAG refuses too
      // (only same-kind existence is forgiven)
      intercept[Exception](spark.sql("ALTER TABLE refddl.ns.t DROP BRANCH v1"))
      intercept[Exception](
        spark.sql("ALTER TABLE refddl.ns.t DROP BRANCH IF EXISTS v1"))
      intercept[Exception](
        spark.sql("ALTER TABLE refddl.ns.t CREATE BRANCH IF NOT EXISTS v1"))

      // parser patterns must fail in LINEAR time on near-miss
      // statements (the nested-quantifier identifier regex froze the
      // session on long names; a hang here = regression)
      val longName = "a" + ("_x" * 40)
      val t0 = System.nanoTime()
      intercept[Exception](spark.sql(
        s"ALTER TABLE refddl.ns.$longName ADD COLUMNS (c INT)"))
      assert((System.nanoTime() - t0) / 1e9 < 10.0, "parser near-miss took too long")

      spark.sql("ALTER TABLE refddl.ns.t DROP TAG v1")
      spark.sql("ALTER TABLE refddl.ns.t DROP BRANCH audit")
      assert(t.refresh().refs.isEmpty)
      // absent ref: IF EXISTS no-ops, plain refuses
      spark.sql("ALTER TABLE refddl.ns.t DROP BRANCH IF EXISTS audit")
      intercept[Exception](spark.sql("ALTER TABLE refddl.ns.t DROP TAG v1"))
    } finally {
      spark.conf.unset("spark.sql.catalog.refddl")
      spark.conf.unset("spark.sql.catalog.refddl.warehouse")
    }
  }
}
