package graft.lake

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Aggregate pushdown from manifest stats (Iceberg's
  * SupportsPushDownAggregates analog): a filterless global
  * COUNT(*)/COUNT(col)/MIN/MAX answers from the manifests alone — the
  * physical plan is a driver-local scan, no data file is opened. The
  * pushdown is complete-or-nothing and declines the moment exactness is
  * at risk (tombstones, missing stats, floats/strings, group-bys). */
class AggPushdownSpec extends LakeSuite {

  /** One catalog NAME per test: Spark caches catalog instances, so
    * re-pointing a name at a fresh warehouse would silently keep the
    * old instance. */
  private def withCat[A](cat: String)(f: String => A): A = {
    val wh = freshWarehouse()
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[sql.LakeSqlCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    try { spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.ns"); f(wh) }
    finally {
      spark.conf.unset(s"spark.sql.catalog.$cat")
      spark.conf.unset(s"spark.sql.catalog.$cat.warehouse")
    }
  }

  private def isMetadataOnly(sqlText: String): Boolean = {
    val plan = spark.sql(sqlText).queryExecution.executedPlan.toString
    plan.contains("LocalTableScan") && !plan.contains("BatchScan")
  }

  test("global COUNT/MIN/MAX answer from manifests — plan is driver-local, survives data-file loss") {
    import spark.implicits._
    withCat("apd1") { wh =>
      val df = (1 to 100).map(i =>
        (i, if (i % 10 == 0) null else s"s$i",
          java.sql.Date.valueOf(f"2024-01-${(i % 28) + 1}%02d"))).toDF("id", "tag", "d")
      spark.sql("CREATE TABLE apd1.ns.t (id INT, tag STRING, d DATE)")
      df.where($"id" <= 50).writeTo("apd1.ns.t").append()
      df.where($"id" > 50).writeTo("apd1.ns.t").append()

      val q = "SELECT count(*) AS c, count(tag) AS ct, min(id) AS mn, " +
        "max(id) AS mx, min(d) AS mnd, max(d) AS mxd FROM apd1.ns.t"
      assert(isMetadataOnly(q), "expected a driver-local (metadata-only) plan")
      val r = spark.sql(q).head()
      assert(r.getLong(0) === 100L)
      assert(r.getLong(1) === 90L) // 10 nulls
      assert(r.getInt(2) === 1 && r.getInt(3) === 100)
      assert(r.getDate(4).toString === "2024-01-01")
      assert(r.getDate(5).toString === "2024-01-28")

      // time travel pushes too, against ITS snapshot
      val snaps = spark.sql("SELECT snapshot_id FROM apd1.ns.t.snapshots ORDER BY committed_at")
        .collect().map(_.getLong(0))
      val tt = s"SELECT count(*) FROM apd1.ns.t VERSION AS OF ${snaps.head}"
      assert(isMetadataOnly(tt))
      assert(spark.sql(tt).head().getLong(0) === 50L)

      // nuclear proof: remove every data file from disk — the global
      // aggregate still answers (nothing ever opens a file)
      val lake = LakeCatalog.open(wh)
      lake.loadTable("ns", "t").newScan().planFiles.foreach(e =>
        java.nio.file.Files.delete(java.nio.file.Paths.get(
          new java.net.URI(e.path).getPath)))
      assert(spark.sql("SELECT count(*) FROM apd1.ns.t").head().getLong(0) === 100L)
    }
  }

  test("pushdown declines exactly when exactness is at risk") {
    import spark.implicits._
    withCat("apd2") { wh =>
      spark.sql("CREATE TABLE apd2.ns.u (id INT, f DOUBLE, s STRING)")
      (1 to 40).map(i => (i, i / 2.0, s"v$i")).toDF("id", "f", "s")
        .writeTo("apd2.ns.u").append()

      // a WHERE keeps the normal scan (residual filters block agg
      // pushdown) and stays correct
      val w = "SELECT count(*) FROM apd2.ns.u WHERE id <= 10"
      assert(!isMetadataOnly(w))
      assert(spark.sql(w).head().getLong(0) === 10L)

      // float bounds order NaN wrong, string bounds may be truncated:
      // both decline (scan runs) and stay correct
      val fl = "SELECT min(f) AS a, max(f) AS b FROM apd2.ns.u"
      assert(!isMetadataOnly(fl))
      assert(spark.sql(fl).head().getDouble(0) === 0.5)
      val st = "SELECT max(s) FROM apd2.ns.u"
      assert(!isMetadataOnly(st))
      assert(spark.sql(st).head().getString(0) === "v9")

      // group-by declines
      assert(!isMetadataOnly("SELECT id % 2, count(*) FROM apd2.ns.u GROUP BY 1"))

      // live MoR tombstones make counts lie: API-level refusal, and the
      // SQL read (substituted onto the MoR path) stays correct
      val lake = LakeCatalog.open(wh)
      val t = lake.loadTable("ns", "u")
      t.deleteWhereMoR(spark, LakePredicate.Le("id", Int.box(5)))
      assert(t.refresh().newScan().countStarFromStats.isEmpty)
      assert(spark.sql("SELECT count(*) FROM apd2.ns.u").head().getLong(0) === 35L)

      // compaction retires the tombstones — pushdown comes back
      t.refresh().compact(spark, targetFiles = 1)
      assert(t.refresh().newScan().countStarFromStats.contains(35L))
      assert(isMetadataOnly("SELECT count(*) FROM apd2.ns.u"))
    }
  }

  test("columns added after data exists: bounds refuse unless files are provably all-null") {
    import spark.implicits._
    val cat = LakeCatalog.open(freshWarehouse())
    val t = cat.createTable("ns", "later", (1 to 20).map(i => (i, s"b$i"))
      .toDF("id", "body").schema)
    t.appendData((1 to 20).map(i => (i, s"b$i")).toDF("id", "body"))

    // plain add: old files lack stats AND aren't provably all-null for
    // the column (no nullCount recorded) → min/max refuse; count(col)
    // refuses too
    t.refresh().addColumn("score", IntegerType)
    val s1 = t.refresh().newScan()
    assert(s1.minFromStats("score").isEmpty)
    assert(s1.countColumnFromStats("score").isEmpty)
    // count(*) is unaffected
    assert(s1.countStarFromStats.contains(20L))

    // post-add files carry real stats; a file that writes the column
    // all-null is provably null (nullCount == recordCount) and drops
    // out of the bound instead of blocking it... but the PRE-add files
    // still lack even a nullCount, so the refusal stands until they
    // are rewritten
    import org.apache.spark.sql.Row
    t.refresh().appendData(spark.createDataFrame(
      (21 to 30).map(i => Row(i, s"b$i", Int.box(i * 10))).asJava0,
      t.refresh().schema))
    assert(t.refresh().newScan().maxFromStats("score").isEmpty)

    // compaction materializes the nulls → stats exist everywhere →
    // bounds answer (pre-add rows are real nulls, ignored by min/max)
    t.refresh().compact(spark, targetFiles = 1)
    val s2 = t.refresh().newScan()
    assert(s2.maxFromStats("score") === Some(Some(300)))
    assert(s2.countColumnFromStats("score").contains(10L))

    // a column with an initial DEFAULT never lets absent files drop
    // out: "missing from the file" means the default there, not null
    t.refresh().addColumnWithDefault("rank", IntegerType, 5)
    assert(t.refresh().newScan().minFromStats("rank").isEmpty)
    assert(t.refresh().newScan().countColumnFromStats("rank").isEmpty)
  }
}
