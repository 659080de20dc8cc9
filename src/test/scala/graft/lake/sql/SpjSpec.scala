package graft.lake.sql

import org.apache.spark.sql.functions._
import graft.lake.{LakeCatalog, LakeSuite, PartitionField}

/** Storage-partitioned joins (SPARK-37375): two lake tables identity-
  * partitioned on the same column report KeyGroupedPartitioning with
  * per-partition-value input groups, and Spark joins them WITHOUT
  * shuffling either side — the co-located-join shape that, at
  * warehouse scale, removes the dominant network cost of fact-to-fact
  * joins. Declines (and the join still answers correctly through
  * normal shuffles) whenever grouping exactness is at risk. */
class SpjSpec extends LakeSuite {

  private def mkTable(wh: String, name: String, rows: Int): Unit = {
    val t = LakeCatalog.open(wh).createTable("ns", name,
      spark.range(0).select(col("id").cast("int").as("k"),
        col("id").cast("int").as("p"),
        col("id").cast("long").as("v")).schema,
      spec = Seq(PartitionField("p", "identity")))
    (0 until 4).foreach { pv =>
      t.appendData(spark.range(rows).select(
        (col("id") + pv * 1000).cast("int").as("k"),
        lit(pv).cast("int").as("p"),
        (col("id") * 2).cast("long").as("v")), numFiles = 2)
    }
  }

  test("co-partitioned lake tables join with no shuffle on either side") {
    val wh = freshWarehouse()
    spark.conf.set("spark.sql.catalog.spj", classOf[LakeSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.spj.warehouse", wh)
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // join keys (p, k) are a superset of the cluster key (p): allow
    // co-partitioning on the subset instead of demanding exact match
    spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
    try {
      spark.sql("CREATE NAMESPACE spj.ns")
      mkTable(wh, "a", 50)
      mkTable(wh, "b", 30)

      val q = """SELECT a.p, count(*) AS n, sum(a.v + b.v) AS s
                |FROM spj.ns.a a JOIN spj.ns.b b ON a.p = b.p AND a.k = b.k
                |GROUP BY a.p ORDER BY a.p""".stripMargin
      val df = spark.sql(q)
      val rows = df.collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      // per partition: k ranges overlap on 30 of 50 keys
      assert(rows.length === 4)
      assert(rows.forall(_._2 === 30L))

      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ, plan:\n$plan")
      // the ONLY exchange is the final ORDER BY's range partitioning:
      // the join shuffles neither side AND the group-by(p) reuses the
      // key-grouped distribution (no hash exchange anywhere)
      assert(!plan.contains("Exchange hashpartitioning"),
        s"SPJ must not shuffle either join side, plan:\n$plan")

      // sanity twin: with v2 bucketing OFF the same query answers the
      // same rows through ordinary shuffles
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
      val df2 = spark.sql(q)
      assert(df2.collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
        === rows.toSeq)
      assert(df2.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally {
      spark.conf.unset("spark.sql.catalog.spj")
      spark.conf.unset("spark.sql.catalog.spj.warehouse")
      spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.requireAllClusterKeysForCoPartition")
    }
  }

  test("bucket-partitioned tables storage-partition-join via the function catalog") {
    val wh = freshWarehouse()
    spark.conf.set("spark.sql.catalog.spjb", classOf[LakeSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.spjb.warehouse", wh)
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
    try {
      spark.sql("CREATE NAMESPACE spjb.ns")
      def mk(name: String, rows: Int): Unit = {
        val t = LakeCatalog.open(wh).createTable("ns", name,
          spark.range(0).select(col("id").cast("int").as("k"),
            col("id").cast("long").as("v")).schema,
          spec = Seq(PartitionField("k", "bucket[4]")))
        // partition-aligned ingestion per bucket — `hash` here IS the
        // write path's transform (murmur3 seed 42), so every file is
        // single-bucket-valued and the scan is key-groupable
        (0 until 4).foreach { b =>
          t.appendData(spark.range(rows)
            .select(col("id").cast("int").as("k"), (col("id") * 3).cast("long").as("v"))
            .filter(pmod(hash(col("id").cast("int")), lit(4)) === b))
        }
      }
      mk("a", 80)
      mk("b", 60)
      val q = """SELECT count(*) AS n, sum(a.v + b.v) AS s
                |FROM spjb.ns.a a JOIN spjb.ns.b b ON a.k = b.k""".stripMargin
      val df = spark.sql(q)
      assert(df.head.getLong(0) === 60L)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ, plan:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucket SPJ must not shuffle either join side, plan:\n$plan")
    } finally {
      spark.conf.unset("spark.sql.catalog.spjb")
      spark.conf.unset("spark.sql.catalog.spjb.warehouse")
      spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.requireAllClusterKeysForCoPartition")
    }
  }

  test("month-partitioned tables storage-partition-join via the temporal transform") {
    val wh = freshWarehouse()
    spark.conf.set("spark.sql.catalog.spjm", classOf[LakeSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.spjm.warehouse", wh)
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
    try {
      spark.sql("CREATE NAMESPACE spjm.ns")
      def mk(name: String, rows: Int): Unit = {
        val t = LakeCatalog.open(wh).createTable("ns", name,
          spark.range(0).select(
            lit(java.sql.Date.valueOf("2024-01-01")).as("d"),
            col("id").as("v")).schema,
          spec = Seq(PartitionField("d", "month")))
        // month-aligned ingestion: each append stays inside one month,
        // so footer bounds derive a single month value per file
        (0 until 3).foreach { m =>
          t.appendData(spark.range(rows).select(
            date_add(add_months(lit(java.sql.Date.valueOf("2024-01-01")), m),
              pmod(col("id"), lit(25)).cast("int")).as("d"),
            col("id").as("v")))
        }
      }
      mk("a", 50)
      mk("b", 30)
      val q = """SELECT count(*) AS n FROM spjm.ns.a a JOIN spjm.ns.b b
                |ON a.d = b.d AND a.v = b.v""".stripMargin
      val df = spark.sql(q)
      assert(df.head.getLong(0) === 90L) // 30 matches x 3 months
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ, plan:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"month SPJ must not shuffle either join side, plan:\n$plan")
      // shuffled twin answers identically
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
      assert(spark.sql(q).head.getLong(0) === 90L)
    } finally {
      spark.conf.unset("spark.sql.catalog.spjm")
      spark.conf.unset("spark.sql.catalog.spjm.warehouse")
      spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.requireAllClusterKeysForCoPartition")
    }
  }

  test("truncate-partitioned tables storage-partition-join on string prefixes") {
    val wh = freshWarehouse()
    spark.conf.set("spark.sql.catalog.spjt", classOf[LakeSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.spjt.warehouse", wh)
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
    try {
      spark.sql("CREATE NAMESPACE spjt.ns")
      def mk(name: String, rows: Int): Unit = {
        val t = LakeCatalog.open(wh).createTable("ns", name,
          spark.range(0).select(lit("x").as("s"), col("id").as("v")).schema,
          spec = Seq(PartitionField("s", "truncate[3]")))
        // prefix-aligned ingestion: one 3-char prefix per append
        Seq("abc", "def", "ghi").foreach { p =>
          t.appendData(spark.range(rows).select(
            concat(lit(p), pmod(col("id"), lit(7)).cast("string")).as("s"),
            col("id").as("v")))
        }
      }
      mk("a", 40)
      mk("b", 25)
      val q = """SELECT count(*) AS n FROM spjt.ns.a a JOIN spjt.ns.b b
                |ON a.s = b.s AND a.v = b.v""".stripMargin
      val df = spark.sql(q)
      assert(df.head.getLong(0) === 75L) // 25 matches x 3 prefixes
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ, plan:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"truncate SPJ must not shuffle either join side, plan:\n$plan")
    } finally {
      spark.conf.unset("spark.sql.catalog.spjt")
      spark.conf.unset("spark.sql.catalog.spjt.warehouse")
      spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.requireAllClusterKeysForCoPartition")
    }
  }

  test("SPJ declines on a non-identity-partitioned table; join still correct") {
    val wh = freshWarehouse()
    spark.conf.set("spark.sql.catalog.spj2", classOf[LakeSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.spj2.warehouse", wh)
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      spark.sql("CREATE NAMESPACE spj2.ns")
      // unpartitioned: no identity fields → UnknownPartitioning
      val t = LakeCatalog.open(wh).createTable("ns", "u",
        spark.range(0).select(col("id").cast("int").as("k"),
          col("id").cast("int").as("p")).schema)
      t.appendData(spark.range(200).select(col("id").cast("int").as("k"),
        (col("id") % 4).cast("int").as("p")))
      mkTable(wh, "a", 50)

      val df = spark.sql(
        """SELECT count(*) FROM spj2.ns.a a JOIN spj2.ns.u u
          |ON a.p = u.p AND a.k = u.k""".stripMargin)
      // k 0..49 per partition in a; u has k 0..199 with p = k % 4:
      // matches are rows of u with k < 50 whose p equals both sides'
      val expected = (0 until 200).count(k => k < 1000 &&
        (0 until 4).exists(pv => k >= 0 && k < 50 + pv * 1000 && k >= pv * 1000 && (k % 4) == pv))
      assert(df.head.getLong(0) > 0L)
      assert(df.queryExecution.executedPlan.toString.contains("Exchange"))
      assert(expected >= 0) // the exact-count twin below pins values
      // exact check against a plain-Spark recompute
      val a = spark.sql("SELECT k, p FROM spj2.ns.a")
      val u = spark.sql("SELECT k, p FROM spj2.ns.u")
      val ref = a.join(u, Seq("p", "k")).count()
      assert(df.head.getLong(0) === ref)
    } finally {
      spark.conf.unset("spark.sql.catalog.spj2")
      spark.conf.unset("spark.sql.catalog.spj2.warehouse")
      spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
