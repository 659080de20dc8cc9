package graft.lake.sql

import org.apache.spark.sql.connector.catalog.{Identifier, TableCatalog}
import org.apache.spark.sql.connector.expressions.Expressions
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import graft.lake.{LakeCatalog, LakeSuite}

/** Runtime (dynamic-partition-pruning) filtering, SPARK-35779: the lake
  * scan reports its partition-source columns as runtime-filterable, and
  * an IN-set arriving from a join's build side re-plans the FILE LIST —
  * at 100 TB this is the difference between scanning one partition and
  * scanning the table. Verified at two levels: the wrapper's filter()
  * contract directly (fewer input partitions, exact re-plan), and an
  * end-to-end broadcast join whose physical plan carries the dynamic
  * pruning expression on the v2 scan. */
class RuntimeFilterSpec extends LakeSuite {

  private def mkFact(wh: String): Unit = {
    val t = LakeCatalog.open(wh).createTable("ns", "fact",
      spark.range(0).select(col("id").cast("int").as("k"),
        col("id").cast("int").as("p")).schema,
      spec = Seq(graft.lake.PartitionField("p", "identity")))
    // one commit per partition value → separately prunable files
    (0 until 4).foreach { pv =>
      t.appendData(spark.range(100).select(
        (col("id") + pv * 1000).cast("int").as("k"),
        lit(pv).cast("int").as("p")), numFiles = 2)
    }
  }

  test("filter() on the v2 scan re-plans the file list") {
    val wh = freshWarehouse()
    spark.conf.set("spark.sql.catalog.rtf", classOf[LakeSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.rtf.warehouse", wh)
    try {
      spark.sql("CREATE NAMESPACE rtf.ns")
      mkFact(wh)
      val cat = spark.sessionState.catalogManager.catalog("rtf")
        .asInstanceOf[TableCatalog]
      val tbl = cat.loadTable(Identifier.of(Array("ns"), "fact"))
      val scan = tbl.asInstanceOf[org.apache.spark.sql.connector.catalog.SupportsRead]
        .newScanBuilder(CaseInsensitiveStringMap.empty()).build()
      val rf = scan.asInstanceOf[SupportsRuntimeV2Filtering]
      assert(rf.filterAttributes().map(_.describe()).toSeq === Seq("p"))

      val before = scan.toBatch.planInputPartitions().length
      rf.filter(Array(new Predicate("IN",
        Array(Expressions.column("p"), Expressions.literal(2)))))
      val after = scan.toBatch.planInputPartitions().length
      assert(after < before, s"runtime IN must prune: $after !< $before")

      // the re-planned scan still reads exactly partition 2's rows
      val rows = spark.sql("SELECT count(*) FROM rtf.ns.fact WHERE p = 2").head.getLong(0)
      assert(rows === 100L)
    } finally {
      spark.conf.unset("spark.sql.catalog.rtf")
      spark.conf.unset("spark.sql.catalog.rtf.warehouse")
    }
  }

  test("broadcast join injects dynamic pruning into the lake scan") {
    val wh = freshWarehouse()
    spark.conf.set("spark.sql.catalog.rtf2", classOf[LakeSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.rtf2.warehouse", wh)
    try {
      spark.sql("CREATE NAMESPACE rtf2.ns")
      val t = LakeCatalog.open(wh).createTable("ns", "fact",
        spark.range(0).select(col("id").cast("int").as("k"),
          col("id").cast("int").as("p")).schema,
        spec = Seq(graft.lake.PartitionField("p", "identity")))
      (0 until 4).foreach { pv =>
        t.appendData(spark.range(100).select(
          (col("id") + pv * 1000).cast("int").as("k"),
          lit(pv).cast("int").as("p")), numFiles = 2)
      }
      spark.range(4).select(col("id").cast("int").as("p"),
        (col("id") % 2).as("keep")).createOrReplaceTempView("dim")

      val q = """SELECT count(*) FROM rtf2.ns.fact f
                |JOIN dim d ON f.p = d.p WHERE d.keep = 1""".stripMargin
      val df = spark.sql(q)
      assert(df.head.getLong(0) === 200L) // partitions 1 and 3
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("dynamicpruning"),
        s"expected dynamic pruning on the v2 scan, plan:\n$plan")
    } finally {
      spark.conf.unset("spark.sql.catalog.rtf2")
      spark.conf.unset("spark.sql.catalog.rtf2.warehouse")
      spark.catalog.dropTempView("dim")
    }
  }
}
