package graft.lake.sql

import org.apache.spark.sql.connector.catalog.{Identifier, ViewChange}
import graft.lake.{LakeCatalog, LakeSuite}

/** SQL views persisted in the lake catalog (the Iceberg view-spec
  * analog): CREATE/SELECT/REPLACE/DROP/SHOW through spark.sql, the
  * version log, definer-context capture for unqualified names, name
  * collisions, persistence across a catalog reopen, and the
  * ViewCatalog API surface. */
class LakeViewSpec extends LakeSuite {

  private def register(name: String): String = {
    val wh = freshWarehouse()
    spark.conf.set(s"spark.sql.catalog.$name", classOf[LakeSqlCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
    wh
  }

  test("view DDL end-to-end: create, select, filter pushdown, replace with history, drop") {
    val wh = register("vc")
    try {
      spark.sql("CREATE NAMESPACE vc.ns")
      spark.sql(s"CREATE TABLE vc.ns.orders (${ordersDF.schema.toDDL})")
      LakeCatalog.open(wh).loadTable("ns", "orders").appendData(ordersDF)

      spark.sql(
        """CREATE VIEW vc.ns.status_rollup AS
          |SELECT o_orderstatus AS st, count(*) AS n,
          |       round(sum(o_totalprice), 2) AS total
          |FROM vc.ns.orders GROUP BY o_orderstatus""".stripMargin)

      val viaView = spark.sql(
        "SELECT st, n FROM vc.ns.status_rollup WHERE st = 'F'").collect()
      val direct = spark.sql(
        """SELECT o_orderstatus AS st, count(*) AS n FROM vc.ns.orders
          |WHERE o_orderstatus = 'F' GROUP BY o_orderstatus""".stripMargin).collect()
      assert(viaView.toSeq === direct.toSeq)

      // CREATE without OR REPLACE refuses an existing name; IF NOT
      // EXISTS forgives it
      intercept[Exception](spark.sql(
        "CREATE VIEW vc.ns.status_rollup AS SELECT 1 AS one"))
      spark.sql(
        "CREATE VIEW IF NOT EXISTS vc.ns.status_rollup AS SELECT 1 AS one")
      assert(spark.sql("SELECT * FROM vc.ns.status_rollup").schema
        .fieldNames.toSeq === Seq("st", "n", "total"))

      // REPLACE appends to the version log; the old definition stays
      spark.sql(
        """CREATE OR REPLACE VIEW vc.ns.status_rollup AS
          |SELECT o_orderstatus AS st, count(*) AS n
          |FROM vc.ns.orders GROUP BY o_orderstatus""".stripMargin)
      assert(spark.sql("SELECT * FROM vc.ns.status_rollup").schema
        .fieldNames.toSeq === Seq("st", "n"))
      val doc = LakeCatalog.open(wh).loadView("ns", "status_rollup").get
      assert(doc.versions.map(_.versionId) === Seq(1, 2))
      assert(doc.currentVersionId === 2)
      assert(doc.versions.head.sql.contains("round(sum(o_totalprice)"))

      // DESCRIBE shows the stored schema; SHOW CREATE round-trips the
      // definition text; DESCRIBE of the TABLE still takes Spark's path
      val desc = spark.sql("DESCRIBE vc.ns.status_rollup").collect()
      assert(desc.map(_.getString(0)).toSeq === Seq("st", "n"))
      val descExt = spark.sql("DESCRIBE EXTENDED vc.ns.status_rollup").collect()
      assert(descExt.exists(_.getString(0) == "View Text"))
      val created = spark.sql("SHOW CREATE TABLE vc.ns.status_rollup")
        .head.getString(0)
      assert(created.startsWith("CREATE VIEW vc.ns.status_rollup AS"))
      assert(created.contains("GROUP BY o_orderstatus"))
      assert(spark.sql("DESCRIBE vc.ns.orders").collect()
        .map(_.getString(0)).toSeq === ordersDF.schema.fieldNames.toSeq)

      // SHOW VIEWS lists it; DROP removes it
      val shown = spark.sql("SHOW VIEWS IN vc.ns").collect()
      assert(shown.map(_.getString(1)).toSeq === Seq("status_rollup"))
      spark.sql("DROP VIEW vc.ns.status_rollup")
      assert(spark.sql("SHOW VIEWS IN vc.ns").collect().isEmpty)
      intercept[Exception](spark.sql("DROP VIEW vc.ns.status_rollup"))
      spark.sql("DROP VIEW IF EXISTS vc.ns.status_rollup") // no throw
    } finally {
      spark.conf.unset("spark.sql.catalog.vc")
      spark.conf.unset("spark.sql.catalog.vc.warehouse")
    }
  }

  test("definer context: unqualified names in view SQL resolve in the stored catalog.namespace") {
    val wh = register("vd")
    try {
      spark.sql("CREATE NAMESPACE vd.ns")
      spark.sql(s"CREATE TABLE vd.ns.orders (${ordersDF.schema.toDDL})")
      LakeCatalog.open(wh).loadTable("ns", "orders").appendData(ordersDF)
      // author the view from WITHIN the catalog+namespace: names inside
      // the SQL are unqualified and must be captured
      spark.sql("USE vd.ns")
      try {
        spark.sql(
          """CREATE VIEW big_orders AS
            |SELECT o_orderkey, o_totalprice FROM orders
            |WHERE o_totalprice > 100000.0""".stripMargin)
      } finally spark.sql("USE spark_catalog.default")
      // read from a session pointed elsewhere: the stored context, not
      // the reader's, resolves `orders`
      val n = spark.sql("SELECT count(*) FROM vd.ns.big_orders").head.getLong(0)
      val expect = ordersDF.filter("o_totalprice > 100000.0").count()
      assert(n === expect && n > 0)

      // a view over the view (nested resolution) + CTE names stay local
      spark.sql(
        """CREATE VIEW vd.ns.big_capped AS
          |WITH orders AS (SELECT * FROM vd.ns.big_orders WHERE o_orderkey < 1000)
          |SELECT count(*) AS n FROM orders""".stripMargin)
      val capped = spark.sql("SELECT n FROM vd.ns.big_capped").head.getLong(0)
      assert(capped === ordersDF
        .filter("o_totalprice > 100000.0 AND o_orderkey < 1000").count())
    } finally {
      spark.conf.unset("spark.sql.catalog.vd")
      spark.conf.unset("spark.sql.catalog.vd.warehouse")
    }
  }

  test("collisions, cyclic replace, reopen persistence, and the ViewCatalog API") {
    val wh = register("ve")
    try {
      spark.sql("CREATE NAMESPACE ve.ns")
      spark.sql(s"CREATE TABLE ve.ns.t (${ordersDF.schema.toDDL})")
      spark.sql("CREATE VIEW ve.ns.v AS SELECT 1 AS one")

      // one name universe: a view name refuses a table and vice versa
      intercept[Exception](spark.sql("CREATE TABLE ve.ns.v (x INT)"))
      intercept[Exception](spark.sql("CREATE VIEW ve.ns.t AS SELECT 1 AS one"))

      // a direct self-reference in REPLACE is refused with a clear error
      val cyc = intercept[Exception](spark.sql(
        "CREATE OR REPLACE VIEW ve.ns.v AS SELECT * FROM ve.ns.v"))
      assert(cyc.getMessage.contains("cyclic"))

      // reopen: a second catalog name over the same warehouse sees the
      // view (pure metadata durability, nothing session-resident)
      spark.conf.set("spark.sql.catalog.ve2", classOf[LakeSqlCatalog].getName)
      spark.conf.set("spark.sql.catalog.ve2.warehouse", wh)
      try {
        assert(spark.sql("SELECT one FROM ve2.ns.v").head.getInt(0) === 1)
      } finally {
        spark.conf.unset("spark.sql.catalog.ve2")
        spark.conf.unset("spark.sql.catalog.ve2.warehouse")
      }

      // ViewCatalog API: alterView properties, renameView, loadView fields
      val cat = spark.sessionState.catalogManager.catalog("ve")
        .asInstanceOf[LakeSqlCatalog]
      val ident = Identifier.of(Array("ns"), "v")
      cat.alterView(ident, ViewChange.setProperty("owner", "graft"))
      assert(cat.loadView(ident).properties.get("owner") === "graft")
      cat.alterView(ident, ViewChange.removeProperty("owner"))
      assert(!cat.loadView(ident).properties.containsKey("owner"))

      // the SQL surface of the same: SET/UNSET TBLPROPERTIES
      spark.sql("ALTER VIEW ve.ns.v SET TBLPROPERTIES ('tier' = 'gold')")
      assert(cat.loadView(ident).properties.get("tier") === "gold")
      intercept[Exception](spark.sql(
        "ALTER VIEW ve.ns.v UNSET TBLPROPERTIES ('nope')"))
      spark.sql("ALTER VIEW ve.ns.v UNSET TBLPROPERTIES IF EXISTS ('nope')")
      spark.sql("ALTER VIEW ve.ns.v UNSET TBLPROPERTIES ('tier')")
      assert(!cat.loadView(ident).properties.containsKey("tier"))
      assert(cat.loadView(ident).query === "SELECT 1 AS one")
      cat.renameView(ident, Identifier.of(Array("ns"), "v2"))
      assert(!cat.viewExists(ident))
      assert(spark.sql("SELECT one FROM ve.ns.v2").head.getInt(0) === 1)
      assert(cat.listViews("ns").map(_.name).toSeq === Seq("v2"))
    } finally {
      spark.conf.unset("spark.sql.catalog.ve")
      spark.conf.unset("spark.sql.catalog.ve.warehouse")
    }
  }
}
