package graft.lake.sql

import org.apache.spark.sql.functions._
import graft.lake.{LakeCatalog, LakePredicate, LakeSuite}

/** `ALTER TABLE ... WRITE ORDERED BY / ZORDER BY / UNORDERED` DDL:
  * metadata-only write-order commits; future writes cluster under the
  * order so stats pruning goes tight. */
class WriteOrderDdlSpec extends LakeSuite {

  test("WRITE ORDERED BY clusters future writes; ZORDER and UNORDERED set their modes") {
    val wh = freshWarehouse()
    spark.conf.set("spark.sql.catalog.wod", classOf[LakeSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.wod.warehouse", wh)
    try {
      spark.sql("CREATE NAMESPACE wod.ns")
      spark.sql(s"CREATE TABLE wod.ns.t (${ordersDF.schema.toDDL})")
      val t = LakeCatalog.open(wh).loadTable("ns", "t")

      spark.sql("ALTER TABLE wod.ns.t WRITE ORDERED BY o_orderkey")
      assert(t.refresh().metadata.sortOrder === Seq("o_orderkey"))
      assert(t.refresh().metadata.sortOrderKind === "linear")

      // ordered append: a narrow key range prunes
      t.refresh().appendData(ordersDF, numFiles = 8)
      val survivors = t.refresh()
        .newScan(LakePredicate.Lt("o_orderkey", Long.box(200L))).planFiles.size
      assert(survivors < 8, s"$survivors of 8 files survive")

      spark.sql("ALTER TABLE wod.ns.t WRITE ZORDER BY (o_custkey, o_totalprice)")
      assert(t.refresh().metadata.sortOrderKind === "zorder")
      assert(t.refresh().metadata.sortOrder === Seq("o_custkey", "o_totalprice"))

      spark.sql("ALTER TABLE wod.ns.t WRITE UNORDERED")
      assert(t.refresh().metadata.sortOrder.isEmpty)

      // refusals: unknown column; single-column zorder
      intercept[Exception](
        spark.sql("ALTER TABLE wod.ns.t WRITE ORDERED BY nope"))
      intercept[Exception](
        spark.sql("ALTER TABLE wod.ns.t WRITE ZORDER BY (o_custkey)"))
    } finally {
      spark.conf.unset("spark.sql.catalog.wod")
      spark.conf.unset("spark.sql.catalog.wod.warehouse")
    }
  }
}
