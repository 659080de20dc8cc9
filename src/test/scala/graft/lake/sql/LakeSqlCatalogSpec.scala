package graft.lake.sql

import org.apache.spark.sql.functions._
import graft.lake.{LakeCatalog, LakeSuite, PartitionField}

/** The SQL surface over the lake: DDL (namespace/table with partition
  * transforms), SELECT through the V2 catalog with correct results,
  * read-only enforcement (INSERT fails at analysis), fresh-snapshot
  * resolution on re-query, and interop — tables created via SQL are the
  * same tables the Scala API commits to. */
class LakeSqlCatalogSpec extends LakeSuite {

  test("SQL DDL + SELECT round-trip against the lake catalog") {
    val wh = freshWarehouse()
    spark.conf.set("spark.sql.catalog.sqllake", classOf[LakeSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.sqllake.warehouse", wh)

    spark.sql("CREATE NAMESPACE sqllake.ns1")
    spark.sql(
      """CREATE TABLE sqllake.ns1.orders_lake (
        |  o_orderkey BIGINT, o_custkey BIGINT, o_totalprice DOUBLE)
        |PARTITIONED BY (bucket(4, o_custkey))""".stripMargin)

    // the SQL-created table IS a lake table: same metadata, same spec
    val cat = LakeCatalog.open(wh)
    val t = cat.loadTable("ns1", "orders_lake")
    assert(t.spec === Seq(PartitionField("o_custkey", "bucket[4]")))

    // mutations go through the transactional Scala API...
    val df = ordersDF.select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    t.appendData(df)

    // ...and SQL reads see them, with correct filtered results
    assert(spark.sql("SELECT count(*) FROM sqllake.ns1.orders_lake")
      .head.getLong(0) === df.count())
    assert(spark.sql(
      "SELECT count(*) FROM sqllake.ns1.orders_lake WHERE o_totalprice > 100000")
      .head.getLong(0) === df.filter(col("o_totalprice") > 100000).count())

    assert(spark.sql("SHOW TABLES IN sqllake.ns1")
      .collect().map(_.getString(1)).contains("orders_lake"))
    assert(spark.sql("SHOW NAMESPACES IN sqllake")
      .collect().map(_.getString(0)).contains("ns1"))

    // read-only: INSERT must fail (a bare parquet append would bypass
    // the manifest/commit protocol)
    intercept[Exception](
      spark.sql("INSERT INTO sqllake.ns1.orders_lake VALUES (1, 1, 1.0)"))

    // each SQL query resolves the CURRENT snapshot
    t.refresh().appendData(df.limit(5))
    assert(spark.sql("SELECT count(*) FROM sqllake.ns1.orders_lake")
      .head.getLong(0) === df.count() + 5)

    spark.sql("DROP TABLE sqllake.ns1.orders_lake")
    assert(!cat.tableExists("ns1", "orders_lake"))
    spark.sql("DROP NAMESPACE sqllake.ns1")
  }

  test("unsupported surfaces fail loudly, missing tables raise analysis errors") {
    val wh = freshWarehouse()
    spark.conf.set("spark.sql.catalog.sqllake2", classOf[LakeSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.sqllake2.warehouse", wh)
    spark.sql("CREATE NAMESPACE sqllake2.ns")
    spark.sql("CREATE TABLE sqllake2.ns.t (id BIGINT)")
    intercept[Exception](spark.sql("SELECT * FROM sqllake2.ns.missing").collect())
    intercept[Exception](spark.sql("ALTER TABLE sqllake2.ns.t ADD COLUMN x BIGINT"))
    // empty table (no snapshot yet) still answers SQL
    assert(spark.sql("SELECT count(*) FROM sqllake2.ns.t").head.getLong(0) === 0L)
  }
}
