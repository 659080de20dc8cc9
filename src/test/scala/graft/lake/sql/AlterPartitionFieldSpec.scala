package graft.lake.sql

import org.apache.spark.sql.functions._
import graft.lake.{LakeCatalog, LakeSuite, PartitionField}

/** `ALTER TABLE ... ADD/DROP PARTITION FIELD` DDL (the parser-extension
  * form of spec evolution): metadata-only commits against the CURRENT
  * spec; old files keep pruning under the spec that derived their
  * partition values. */
class AlterPartitionFieldSpec extends LakeSuite {

  test("ADD/DROP PARTITION FIELD evolve the spec; future writes partition, old files keep pruning") {
    val wh = freshWarehouse()
    spark.conf.set("spark.sql.catalog.apf", classOf[LakeSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.apf.warehouse", wh)
    try {
      spark.sql("CREATE NAMESPACE apf.ns")
      spark.sql(s"CREATE TABLE apf.ns.t (${ordersDF.schema.toDDL})")
      val t = LakeCatalog.open(wh).loadTable("ns", "t")
      t.appendData(ordersDF.filter(col("o_orderkey") % 2 === 0))

      spark.sql("ALTER TABLE apf.ns.t ADD PARTITION FIELD o_orderstatus")
      assert(t.refresh().metadata.spec ===
        Seq(PartitionField("o_orderstatus", "identity")))

      // post-evolution append clusters on the partition value; a status
      // filter prunes to the matching partitions among the NEW files
      t.refresh().newAppend()
        .appendData(ordersDF.filter(col("o_orderkey") % 2 === 1), numFiles = 6)
        .commit()
      val scan = t.refresh().newScan(
        graft.lake.LakePredicate.Eq("o_orderstatus", "F"))
      assert(scan.planFiles.size < t.metadata.currentFiles.size)
      assert(spark.sql("SELECT count(*) FROM apf.ns.t").head.getLong(0)
        === ordersDF.count())

      spark.sql("ALTER TABLE apf.ns.t ADD PARTITION FIELD bucket(4, o_custkey)")
      assert(t.refresh().metadata.spec === Seq(
        PartitionField("o_orderstatus", "identity"),
        PartitionField("o_custkey", "bucket[4]")))
      spark.sql("ALTER TABLE apf.ns.t DROP PARTITION FIELD bucket(4, o_custkey)")
      assert(t.refresh().metadata.spec ===
        Seq(PartitionField("o_orderstatus", "identity")))
      // the spec log retains every historical spec
      assert(t.refresh().metadata.allSpecs.size === 4)
      assert(spark.sql("SELECT count(*) FROM apf.ns.t").head.getLong(0)
        === ordersDF.count())

      // refusals: duplicate add, missing drop, unknown transform/column
      intercept[Exception](spark.sql(
        "ALTER TABLE apf.ns.t ADD PARTITION FIELD o_orderstatus"))
      intercept[Exception](spark.sql(
        "ALTER TABLE apf.ns.t DROP PARTITION FIELD day(o_orderdate)"))
      intercept[Exception](spark.sql(
        "ALTER TABLE apf.ns.t ADD PARTITION FIELD mod(4, o_custkey)"))
      intercept[Exception](spark.sql(
        "ALTER TABLE apf.ns.t ADD PARTITION FIELD nope"))

      // the injected parser delegates everything else verbatim: plain
      // SQL works, and a delegated ALTER still analyzes (and so refuses
      // its own way on a missing column)
      assert(spark.sql("SELECT 1 + 1").head.getInt(0) === 2)
      intercept[Exception](spark.sql(
        "ALTER TABLE apf.ns.t ALTER COLUMN o_comment_exists_not TYPE BIGINT"))
    } finally {
      spark.conf.unset("spark.sql.catalog.apf")
      spark.conf.unset("spark.sql.catalog.apf.warehouse")
    }
  }

  test("quoted identifiers and leading comments parse; degenerate order list refuses") {
    val wh = freshWarehouse()
    spark.conf.set("spark.sql.catalog.apfq", classOf[LakeSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.apfq.warehouse", wh)
    try {
      spark.sql("CREATE NAMESPACE apfq.ns")
      spark.sql("CREATE TABLE apfq.ns.t (region STRING, k BIGINT)")
      val t = LakeCatalog.open(wh).loadTable("ns", "t")
      // backtick-quoted field + quoted transform argument
      spark.sql("ALTER TABLE apfq.ns.t ADD PARTITION FIELD `region`")
      assert(t.refresh().metadata.spec ===
        Seq(PartitionField("region", "identity")))
      spark.sql("ALTER TABLE apfq.ns.t ADD PARTITION FIELD bucket(4, `k`)")
      assert(t.refresh().metadata.spec === Seq(
        PartitionField("region", "identity"), PartitionField("k", "bucket[4]")))
      // a LEADING COMMENT must not punt lake DDL to the delegate
      spark.sql("-- evolve\nALTER TABLE apfq.ns.t DROP PARTITION FIELD bucket(4, `k`)")
      assert(t.refresh().metadata.spec ===
        Seq(PartitionField("region", "identity")))
      spark.sql("/* block */ ALTER TABLE apfq.ns.t DROP PARTITION FIELD `region`")
      assert(t.refresh().metadata.spec === Nil)
      // WRITE ORDERED BY with a degenerate list refuses instead of
      // silently clearing the order
      spark.sql("ALTER TABLE apfq.ns.t WRITE ORDERED BY k")
      assert(t.refresh().metadata.sortOrder === Seq("k"))
      val e = intercept[Exception](
        spark.sql("ALTER TABLE apfq.ns.t WRITE ORDERED BY ,"))
      assert(e.getMessage.contains("at least one column"))
      assert(t.refresh().metadata.sortOrder === Seq("k")) // untouched
    } finally {
      spark.conf.unset("spark.sql.catalog.apfq")
      spark.conf.unset("spark.sql.catalog.apfq.warehouse")
    }
  }
}
