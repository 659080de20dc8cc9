package graft.lake.sql

import org.apache.spark.sql.functions._
import graft.lake.{LakeCatalog, LakeSuite}

/** Ad-hoc SQL read shapes the oracle corpus never exercises (its
  * queries alias every aggregate and project explicitly — the
  * discipline that hid the unaliased-aggregate analyzer crash until
  * round 14). Every shape runs twice: against a clean table and
  * against a live-tombstone (MoR) table, where the substitution rule
  * rewrites the relation mid-analysis. */
class SqlReadShapesSpec extends LakeSuite {

  private def setup(): Long = {
    val wh = freshWarehouse()
    spark.conf.set("spark.sql.catalog.shapes", classOf[LakeSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.shapes.warehouse", wh)
    spark.sql("CREATE NAMESPACE shapes.ns")
    spark.sql(s"CREATE TABLE shapes.ns.clean (${ordersDF.schema.toDDL})")
    spark.sql(s"CREATE TABLE shapes.ns.mor (${ordersDF.schema.toDDL})")
    val cat = LakeCatalog.open(wh)
    cat.loadTable("ns", "clean").appendData(ordersDF)
    val m = cat.loadTable("ns", "mor")
    m.appendData(ordersDF)
    m.refresh().deleteWhereMoR(spark,
      graft.lake.LakePredicate.Ge("o_totalprice", Double.box(400000.0)))
    ordersDF.filter(col("o_totalprice") < 400000.0).count()
  }

  test("a dozen read shapes analyze and agree across clean and MoR tables") {
    val morRows = setup()
    val allRows = ordersDF.count()
    def rows(tbl: String): Long = if (tbl == "clean") allRows else morRows
    try {
      Seq("clean", "mor").foreach { tbl =>
        val t = s"shapes.ns.$tbl"
        // DISTINCT over a projection
        assert(spark.sql(s"SELECT DISTINCT o_orderstatus FROM $t").count() == 3)
        // ORDER BY a column the select drops
        assert(spark.sql(s"SELECT o_orderkey FROM $t ORDER BY o_totalprice " +
          "LIMIT 7").count() == 7)
        // unaliased HAVING aggregate
        assert(spark.sql(s"SELECT o_orderstatus FROM $t GROUP BY 1 " +
          "HAVING count(*) > 0").count() == 3)
        // window over the lake read
        assert(spark.sql("SELECT o_orderkey, row_number() OVER (" +
          s"PARTITION BY o_orderstatus ORDER BY o_orderkey) AS rn FROM $t")
          .count() == rows(tbl))
        // self-join through a CTE
        assert(spark.sql(s"WITH c AS (SELECT * FROM $t) SELECT count(*) " +
          "FROM c a JOIN c b ON a.o_orderkey = b.o_orderkey").head.getLong(0)
          == rows(tbl))
        // correlated EXISTS with the lake table INSIDE the subquery
        assert(spark.sql("SELECT count(*) FROM VALUES ('F'), ('Z') v(s) " +
          s"WHERE EXISTS (SELECT 1 FROM $t WHERE o_orderstatus = v.s)")
          .head.getLong(0) == 1L)
        // scalar subquery
        assert(spark.sql(s"SELECT (SELECT max(o_orderkey) FROM $t)").head
          .getLong(0) >= 0L)
        // UNION ALL of two lake reads
        assert(spark.sql(s"SELECT o_orderkey FROM $t UNION ALL " +
          s"SELECT o_orderkey FROM $t").count() == 2 * rows(tbl))
        // join against a non-lake source
        ordersDF.select(col("o_orderkey")).limit(100)
          .createOrReplaceTempView("shapes_src")
        assert(spark.sql(s"SELECT count(*) FROM $t JOIN shapes_src USING " +
          "(o_orderkey)").head.getLong(0) > 0L)
        // global aggregate with FILTER clause, unaliased
        assert(spark.sql(s"SELECT count(*) FILTER (WHERE o_orderstatus = 'F') " +
          s"FROM $t").head.getLong(0) > 0L)
        // metadata column mixed with data columns + grouping
        assert(spark.sql(s"SELECT _file, count(*) FROM $t GROUP BY _file")
          .count() >= 1)
        // LATERAL VIEW / explode over a computed array
        assert(spark.sql(s"SELECT count(*) FROM $t " +
          "LATERAL VIEW explode(array(1, 2)) x AS v").head.getLong(0)
          == 2 * rows(tbl))
      }
    } finally {
      spark.conf.unset("spark.sql.catalog.shapes")
      spark.conf.unset("spark.sql.catalog.shapes.warehouse")
    }
  }
}
