package graft.lake.sql

import org.apache.spark.sql.functions._
import graft.lake.{LakeCatalog, LakePredicate, LakeSuite}

/** `CREATE MATERIALIZED VIEW` end-to-end (round-16 verdict ask #3):
  * create → mutate base → `CALL refresh_agg_view(v)` (one arg, spec
  * read from the stored table properties) → read; DESCRIBE EXTENDED
  * surfaces the stored spec; the WHERE form maintains a filtered
  * rollup; malformed definitions refuse at CREATE time. */
class LakeMaterializedViewSpec extends LakeSuite {

  private var n = 0
  private def sqlCat(): (String, String) = {
    n += 1
    val wh = freshWarehouse()
    val cat = s"mvsql$n"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[LakeSqlCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE $cat.ns")
    spark.sql(s"CREATE TABLE $cat.ns.t (${ordersDF.schema.toDDL})")
    (cat, wh)
  }

  /** Ground-truth queries in this suite run with the transparent MV
    * rewrite DISABLED: a GROUP BY shaped exactly like the view's
    * definition would otherwise be re-planned onto the very view under
    * test, collapsing the assertion into view == view. */
  private def onBase[T](body: => T): T = {
    spark.conf.set(LakeMvRewrite.ConfKey, "false")
    try body finally spark.conf.set(LakeMvRewrite.ConfKey, "true")
  }

  private def direct(cat: String, where: String = "true"): Seq[Row] =
    onBase(spark.sql(
      s"""SELECT o_orderpriority, count(*) AS cnt,
         |  sum(CAST(floor(o_totalprice * 100) AS LONG)) AS cents,
         |  max(CAST(floor(o_totalprice * 100) AS LONG)) AS max_cents
         |FROM $cat.ns.t WHERE $where
         |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
      .collect().toSeq)
  private type Row = org.apache.spark.sql.Row

  test("create -> mutate -> 1-arg refresh -> read; DESCRIBE carries the spec") {
    val (cat, wh) = sqlCat()
    val t = LakeCatalog.open(wh).loadTable("ns", "t")
    t.appendData(ordersDF, numFiles = 2)
    spark.sql(
      s"""CREATE MATERIALIZED VIEW $cat.ns.v AS
         |SELECT o_orderpriority, count(*) AS cnt,
         |  sum(CAST(floor(o_totalprice * 100) AS LONG)) AS cents,
         |  max(CAST(floor(o_totalprice * 100) AS LONG)) AS max_cents
         |FROM $cat.ns.t GROUP BY o_orderpriority""".stripMargin)
    // sum over a NULLABLE input decomposes onto __slot/__nn columns
    // (stored maintenance state) — the user-facing columns are selected
    // by name, exactly as a reader of the definition would
    def viewRows: Seq[Row] = spark.sql(
      s"SELECT o_orderpriority, cnt, cents, max_cents FROM $cat.ns.v " +
        "ORDER BY o_orderpriority").collect().toSeq
    // populated at create
    assert(viewRows == direct(cat))

    // DESCRIBE EXTENDED surfaces the stored spec properties
    val desc = spark.sql(s"DESCRIBE TABLE EXTENDED $cat.ns.v")
      .collect().map(_.mkString("|")).mkString("\n")
    assert(desc.contains("incr-view.base") && desc.contains("ns.t"),
      s"DESCRIBE must carry the stored base ref:\n$desc")
    assert(desc.contains("incr-view.keys") && desc.contains("incr-view.aggs"),
      s"DESCRIBE must carry keys + aggs:\n$desc")

    // mutate the base (delete retracts stored maxes -> rescan path),
    // then the 1-arg CALL brings the view back to the direct rollup
    t.refresh().deleteWhere(spark,
      LakePredicate.Ge("o_totalprice", Double.box(300000.0)))
    t.refresh().appendData(ordersDF.filter(col("o_orderkey") % 7 === 0)
      .filter(col("o_totalprice") < 300000.0)
      .withColumn("o_orderkey", col("o_orderkey") + 800000000L))
    val r = spark.sql(s"CALL $cat.system.refresh_agg_view('ns.v')").head
    assert(r.getBoolean(4), "refresh must report refreshed=true")
    assert(viewRows == direct(cat))
    // idempotent: nothing changed underneath
    assert(!spark.sql(s"CALL $cat.system.refresh_agg_view('ns.v')")
      .head.getBoolean(4))
  }

  test("a WHERE-filtered materialized view maintains the filtered rollup") {
    val (cat, wh) = sqlCat()
    val t = LakeCatalog.open(wh).loadTable("ns", "t")
    t.appendData(ordersDF, numFiles = 2)
    spark.sql(
      s"""CREATE MATERIALIZED VIEW $cat.ns.vf AS
         |SELECT o_orderpriority, count(*) AS cnt,
         |  sum(CAST(floor(o_totalprice * 100) AS LONG)) AS cents,
         |  max(CAST(floor(o_totalprice * 100) AS LONG)) AS max_cents
         |FROM $cat.ns.t WHERE o_orderstatus = 'F'
         |GROUP BY o_orderpriority""".stripMargin)
    def viewRows: Seq[Row] = spark.sql(
      s"SELECT o_orderpriority, cnt, cents, max_cents FROM $cat.ns.vf " +
        "ORDER BY o_orderpriority").collect().toSeq
    assert(viewRows == direct(cat, "o_orderstatus = 'F'"))
    // a mutation that TOUCHES filtered-out rows must not leak into the
    // view; one that touches 'F' rows must land
    t.refresh().deleteWhere(spark, LakePredicate.Ge("o_totalprice",
      Double.box(350000.0)))
    spark.sql(s"CALL $cat.system.refresh_agg_view('ns.vf')")
    assert(viewRows == direct(cat, "o_orderstatus = 'F'"))
  }

  test("malformed definitions refuse at CREATE time") {
    val (cat, _) = sqlCat()
    // fractional sum: the floor-cents requirement
    val e1 = intercept[Exception](spark.sql(
      s"""CREATE MATERIALIZED VIEW $cat.ns.bad1 AS
         |SELECT o_orderpriority, count(*) AS cnt,
         |  sum(o_totalprice) AS total
         |FROM $cat.ns.t GROUP BY o_orderpriority""".stripMargin))
    assert(e1.getMessage.contains("integer units") &&
      e1.getMessage.contains("DECIMAL"), e1.getMessage)
    // missing count
    val e2 = intercept[Exception](spark.sql(
      s"""CREATE MATERIALIZED VIEW $cat.ns.bad2 AS
         |SELECT o_orderpriority,
         |  sum(CAST(floor(o_totalprice * 100) AS LONG)) AS cents
         |FROM $cat.ns.t GROUP BY o_orderpriority""".stripMargin))
    assert(e2.getMessage.contains("cnt"), e2.getMessage)
    // unsupported DISTINCT aggregate: count(DISTINCT …) decomposes onto
    // a companion table (round-18), but sum(DISTINCT …) has no exact
    // companion form and must still refuse
    val e3 = intercept[Exception](spark.sql(
      s"""CREATE MATERIALIZED VIEW $cat.ns.bad3 AS
         |SELECT o_orderpriority, count(*) AS cnt,
         |  sum(DISTINCT o_custkey) AS d
         |FROM $cat.ns.t GROUP BY o_orderpriority""".stripMargin))
    assert(e3.getMessage.contains("DISTINCT"), e3.getMessage)
    // avg over DOUBLE refuses, teaching both exact rewrites (integer
    // units or a DECIMAL cast, which decomposes automatically)
    val e3b = intercept[Exception](spark.sql(
      s"""CREATE MATERIALIZED VIEW $cat.ns.bad3b AS
         |SELECT o_orderpriority, count(*) AS cnt, avg(o_totalprice) AS a
         |FROM $cat.ns.t GROUP BY o_orderpriority""".stripMargin))
    assert(e3b.getMessage.contains("DECIMAL") &&
      e3b.getMessage.contains("integer units"), e3b.getMessage)
    // nondeterministic definitions refuse (unsound under delta
    // re-evaluation); subqueried WHERE likewise
    val e5 = intercept[Exception](spark.sql(
      s"""CREATE MATERIALIZED VIEW $cat.ns.bad5 AS
         |SELECT o_orderpriority, count(*) AS cnt,
         |  sum(CAST(floor(o_totalprice * rand()) AS LONG)) AS r
         |FROM $cat.ns.t GROUP BY o_orderpriority""".stripMargin))
    assert(e5.getMessage.contains("nondeterministic"), e5.getMessage)
    val e6 = intercept[Exception](spark.sql(
      s"""CREATE MATERIALIZED VIEW $cat.ns.bad6 AS
         |SELECT o_orderpriority, count(*) AS cnt,
         |  sum(CAST(floor(o_totalprice) AS LONG)) AS s
         |FROM $cat.ns.t
         |WHERE o_custkey IN (SELECT o_custkey FROM $cat.ns.t)
         |GROUP BY o_orderpriority""".stripMargin))
    assert(e6.getMessage.contains("subquery-free"), e6.getMessage)
    // count(col) is null-skipping; the maintenance tracks row count —
    // accepting it would silently store a different statistic
    // (round-16 advisory)
    val e7 = intercept[Exception](spark.sql(
      s"""CREATE MATERIALIZED VIEW $cat.ns.bad7 AS
         |SELECT o_orderpriority, count(o_orderstatus) AS cnt,
         |  sum(CAST(floor(o_totalprice * 100) AS LONG)) AS cents
         |FROM $cat.ns.t GROUP BY o_orderpriority""".stripMargin))
    assert(e7.getMessage.contains("count(*)"), e7.getMessage)
    // count(NULL) is 0 in SQL, not the row count — the literal guard
    // must refuse a null literal (round-17 advisory)
    val e7b = intercept[Exception](spark.sql(
      s"""CREATE MATERIALIZED VIEW $cat.ns.bad7b AS
         |SELECT o_orderpriority, count(NULL) AS cnt,
         |  sum(CAST(floor(o_totalprice * 100) AS LONG)) AS cents
         |FROM $cat.ns.t GROUP BY o_orderpriority""".stripMargin))
    assert(e7b.getMessage.contains("count(*)"), e7b.getMessage)
    // a refresh of a table with no stored spec names the fix
    spark.sql(s"CREATE TABLE $cat.ns.plain (k STRING, cnt BIGINT)")
    val e4 = intercept[Exception](spark.sql(
      s"CALL $cat.system.refresh_agg_view('ns.plain')").collect())
    def msgs(t: Throwable): String =
      if (t == null) "" else t.getMessage + "\n" + msgs(t.getCause)
    assert(msgs(e4).contains("CREATE MATERIALIZED VIEW"), msgs(e4))
  }

  test("avg and fractional sums decompose onto exact slots + derived outputs") {
    val (cat, wh) = sqlCat()
    val t = LakeCatalog.open(wh).loadTable("ns", "t")
    t.appendData(ordersDF, numFiles = 2)
    // avg(decimal), sum(decimal) — DECIMAL(18,2) built exactly from the
    // double via the floor-cents device — and avg(bigint); the view
    // stores LONG slots (cnt already required) and re-derives the
    // outputs at every refresh write
    val decPrice = "CAST(CAST(floor(o_totalprice * 100) AS BIGINT) " +
      "AS DECIMAL(18,2)) / 100"
    spark.sql(
      s"""CREATE MATERIALIZED VIEW $cat.ns.va AS
         |SELECT o_orderpriority, count(*) AS cnt,
         |  avg(CAST($decPrice AS DECIMAL(18,2))) AS avg_price,
         |  sum(CAST($decPrice AS DECIMAL(18,2))) AS total_price,
         |  avg(o_orderkey) AS avg_key
         |FROM $cat.ns.t GROUP BY o_orderpriority""".stripMargin)
    def expect(): Seq[org.apache.spark.sql.Row] = onBase(spark.sql(
      s"""SELECT o_orderpriority, count(*) AS cnt,
         |  (CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
         |    / 100.0) / CAST(count(*) AS DOUBLE) AS avg_price,
         |  CAST(CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
         |    AS DECIMAL(38,0)) / 100 AS DECIMAL(38,2)) AS total_price,
         |  CAST(sum(o_orderkey) AS DOUBLE) / CAST(count(*) AS DOUBLE)
         |    AS avg_key
         |FROM $cat.ns.t GROUP BY o_orderpriority
         |ORDER BY o_orderpriority""".stripMargin).collect().toSeq)
    def got(): Seq[org.apache.spark.sql.Row] = spark.sql(
      s"""SELECT o_orderpriority, cnt, avg_price, total_price, avg_key
         |FROM $cat.ns.va ORDER BY o_orderpriority""".stripMargin)
      .collect().toSeq
    assert(got() == expect(), "derived outputs diverged at create")
    // the derived values RE-DERIVE through an incremental refresh
    t.refresh().deleteWhere(spark,
      LakePredicate.Ge("o_totalprice", Double.box(300000.0)))
    t.refresh().appendData(ordersDF.filter(col("o_orderkey") % 9 === 0)
      .filter(col("o_totalprice") < 300000.0)
      .withColumn("o_orderkey", col("o_orderkey") + 700000000L))
    val r = spark.sql(s"CALL $cat.system.refresh_agg_view('ns.va')").head
    assert(r.getBoolean(4))
    assert(got() == expect(), "derived outputs diverged after refresh")
    // DESCRIBE surfaces the derived spec next to the slots
    val desc = spark.sql(s"DESCRIBE TABLE EXTENDED $cat.ns.va")
      .collect().map(_.mkString("|")).mkString("\n")
    assert(desc.contains("incr-view.derived"), desc)
  }

  test("dim-enriched view through the SQL grammar: create, refresh, dim-move, rebuild") {
    val (cat, wh) = sqlCat()
    val lake = LakeCatalog.open(wh)
    val t = lake.loadTable("ns", "t")
    t.appendData(ordersDF, numFiles = 2)
    spark.sql(s"CREATE TABLE $cat.ns.dim " +
      "(o_orderpriority STRING, prio_class STRING)")
    val dimT = lake.loadTable("ns", "dim")
    val dimDF = ordersDF.select(col("o_orderpriority")).distinct()
      .withColumn("prio_class", when(col("o_orderpriority") < lit("3"),
        lit("HOT")).otherwise(lit("COLD")))
    dimT.appendData(dimDF)
    // ON-form equi condition over aliased sides maps onto DimJoin;
    // the group key lives on the DIM side
    spark.sql(
      s"""CREATE MATERIALIZED VIEW $cat.ns.vd AS
         |SELECT prio_class, count(*) AS cnt,
         |  sum(CAST(floor(o_totalprice * 100) AS LONG)) AS cents
         |FROM $cat.ns.t b JOIN $cat.ns.dim d
         |  ON b.o_orderpriority = d.o_orderpriority
         |GROUP BY prio_class""".stripMargin)
    def direct(): Seq[Row] = onBase(spark.sql(
      s"""SELECT prio_class, count(*) AS cnt,
         |  sum(CAST(floor(o_totalprice * 100) AS LONG)) AS cents
         |FROM $cat.ns.t JOIN $cat.ns.dim USING (o_orderpriority)
         |GROUP BY prio_class ORDER BY prio_class""".stripMargin)
      .collect().toSeq)
    def got(): Seq[Row] = spark.sql(
      s"SELECT prio_class, cnt, cents FROM $cat.ns.vd " +
        "ORDER BY prio_class").collect().toSeq
    assert(got() == direct(), "enriched create diverged")
    // base churn maintains through the stored-spec 1-arg CALL
    t.refresh().deleteWhere(spark,
      LakePredicate.Ge("o_totalprice", Double.box(350000.0)))
    assert(spark.sql(s"CALL $cat.system.refresh_agg_view('ns.vd')")
      .head.getBoolean(4))
    assert(got() == direct(), "enriched refresh diverged")
    // a dim commit refuses the refresh toward rebuild; the SQL escape
    // CALL rebuild_agg_view re-pins and converges on the new dim
    dimT.refresh().appendData(dimDF.limit(1)
      .withColumn("o_orderpriority", lit("9-EXTRA"))
      .withColumn("prio_class", lit("COLD")))
    t.refresh().appendData(ordersDF.limit(50)
      .withColumn("o_orderkey", col("o_orderkey") + 880000000L)
      .filter(col("o_totalprice") < 350000.0))
    def msgs(x: Throwable): String =
      if (x == null) "" else x.getMessage + "\n" + msgs(x.getCause)
    val e = intercept[Exception](
      spark.sql(s"CALL $cat.system.refresh_agg_view('ns.vd')").collect())
    assert(msgs(e).contains("rebuild"), msgs(e))
    spark.sql(s"CALL $cat.system.rebuild_agg_view('ns.vd')").collect()
    assert(got() == direct(), "SQL rebuild diverged from the new dim")
  }

  test("avg/sum skip NULL inputs; all-null groups read NULL (SQL semantics)") {
    val (cat, wh) = sqlCat()
    val t = LakeCatalog.open(wh).loadTable("ns", "t")
    t.appendData(ordersDF, numFiles = 2)
    // nullable input: NULL for every 'P'-status row -> the P group is
    // ALL-null (native avg/sum say NULL); other groups mix nulls in
    // (avg must divide by the NON-null count, not cnt)
    val arg = "CAST(CASE WHEN o_orderstatus = 'P' OR o_orderkey % 7 = 0 " +
      "THEN NULL ELSE floor(o_totalprice * 100) END AS LONG)"
    val decArg = s"CAST($arg AS DECIMAL(18,2))"
    // sl = sum over a NULLABLE integral input (round-17 advisory): it
    // must decompose onto an __nn slot like the decimal path — a direct
    // LONG slot would coalesce the all-null group's NULL to 0 on the
    // first incremental refresh and permanently diverge from SQL SUM
    spark.sql(
      s"""CREATE MATERIALIZED VIEW $cat.ns.vn AS
         |SELECT o_orderstatus, count(*) AS cnt,
         |  avg($arg) AS a, sum($decArg) AS s, sum($arg) AS sl
         |FROM $cat.ns.t GROUP BY o_orderstatus""".stripMargin)
    // native avg/sum are the ground truth here: at this scale the
    // integer-valued double sums are exact, so bit-equality holds
    def direct(): Seq[Row] = onBase(spark.sql(
      s"""SELECT o_orderstatus, count(*) AS cnt, avg($arg) AS a,
         |  sum($decArg) AS s, sum($arg) AS sl
         |FROM $cat.ns.t GROUP BY o_orderstatus
         |ORDER BY o_orderstatus""".stripMargin).collect().toSeq)
    def got(): Seq[Row] = spark.sql(
      s"SELECT o_orderstatus, cnt, a, s, sl FROM $cat.ns.vn " +
        "ORDER BY o_orderstatus").collect().toSeq
    assert(got() == direct(), "null-skipping create diverged")
    val allNull = got().find(_.getString(0) == "P")
    assert(allNull.exists(r => r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4)),
      s"the all-null group must read NULL, got $allNull")
    // and through an incremental refresh (the refresh is where the
    // NULL->0 flip lived: the merge coalesces slots through 0)
    t.refresh().deleteWhere(spark,
      LakePredicate.Ge("o_totalprice", Double.box(300000.0)))
    spark.sql(s"CALL $cat.system.refresh_agg_view('ns.vn')")
    assert(got() == direct(), "null-skipping refresh diverged")
    val allNull2 = got().find(_.getString(0) == "P")
    assert(allNull2.exists(r => r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4)),
      s"the all-null group flipped NULL->0 through the refresh: $allNull2")
  }

  test("explicit-args refresh refuses on a stored-spec view") {
    val (cat, wh) = sqlCat()
    val t = LakeCatalog.open(wh).loadTable("ns", "t")
    t.appendData(ordersDF)
    spark.sql(
      s"""CREATE MATERIALIZED VIEW $cat.ns.vs AS
         |SELECT o_orderpriority, count(*) AS cnt,
         |  sum(CAST(floor(o_totalprice * 100) AS LONG)) AS cents
         |FROM $cat.ns.t GROUP BY o_orderpriority""".stripMargin)
    // passing explicit args would silently drop a stored dim join /
    // derived columns — the call must refuse toward the 1-arg form
    def msgs(x: Throwable): String =
      if (x == null) "" else x.getMessage + "\n" + msgs(x.getCause)
    val e = intercept[Exception](spark.sql(
      s"CALL $cat.system.refresh_agg_view('ns.vs', 'ns.t', " +
        "'o_orderpriority', 'cents:CAST(floor(o_totalprice * 100) AS LONG)')")
      .collect())
    assert(msgs(e).contains("1-arg"), msgs(e))
  }

  test("USING-form dim join + avg + WHERE compose in one definition") {
    val (cat, wh) = sqlCat()
    val lake = LakeCatalog.open(wh)
    val t = lake.loadTable("ns", "t")
    t.appendData(ordersDF, numFiles = 2)
    spark.sql(s"CREATE TABLE $cat.ns.dim2 " +
      "(o_orderpriority STRING, prio_class STRING)")
    val dimT = lake.loadTable("ns", "dim2")
    dimT.appendData(ordersDF.select(col("o_orderpriority")).distinct()
      .withColumn("prio_class", when(col("o_orderpriority") < lit("3"),
        lit("HOT")).otherwise(lit("COLD"))))
    spark.sql(
      s"""CREATE MATERIALIZED VIEW $cat.ns.vu AS
         |SELECT prio_class, count(*) AS cnt,
         |  avg(CAST(floor(o_totalprice * 100) AS LONG)) AS avg_cents
         |FROM $cat.ns.t JOIN $cat.ns.dim2 USING (o_orderpriority)
         |WHERE o_orderstatus = 'F'
         |GROUP BY prio_class""".stripMargin)
    def direct(): Seq[Row] = onBase(spark.sql(
      s"""SELECT prio_class, count(*) AS cnt,
         |  CAST(sum(CAST(floor(o_totalprice * 100) AS LONG)) AS DOUBLE)
         |    / CAST(count(*) AS DOUBLE) AS avg_cents
         |FROM $cat.ns.t JOIN $cat.ns.dim2 USING (o_orderpriority)
         |WHERE o_orderstatus = 'F'
         |GROUP BY prio_class ORDER BY prio_class""".stripMargin)
      .collect().toSeq)
    def got(): Seq[Row] = spark.sql(
      s"SELECT prio_class, cnt, avg_cents FROM $cat.ns.vu " +
        "ORDER BY prio_class").collect().toSeq
    assert(got() == direct(), "composed create diverged")
    t.refresh().deleteWhere(spark,
      LakePredicate.Ge("o_totalprice", Double.box(250000.0)))
    spark.sql(s"CALL $cat.system.refresh_agg_view('ns.vu')")
    assert(got() == direct(), "composed refresh diverged")
  }

  test("multi-dim star join: per-dim pins, per-dim staleness refusal, rebuild") {
    val (cat, wh) = sqlCat()
    val lake = LakeCatalog.open(wh)
    val t = lake.loadTable("ns", "t")
    t.appendData(ordersDF, numFiles = 2)
    spark.sql(s"CREATE TABLE $cat.ns.pdim " +
      "(o_orderpriority STRING, prio_class STRING)")
    spark.sql(s"CREATE TABLE $cat.ns.sdim " +
      "(o_orderstatus STRING, status_class STRING)")
    val pdim = lake.loadTable("ns", "pdim")
    val sdim = lake.loadTable("ns", "sdim")
    val pdimDF = ordersDF.select(col("o_orderpriority")).distinct()
      .withColumn("prio_class", when(col("o_orderpriority") < lit("3"),
        lit("HOT")).otherwise(lit("COLD")))
    val sdimDF = ordersDF.select(col("o_orderstatus")).distinct()
      .withColumn("status_class", when(col("o_orderstatus") === "F",
        lit("DONE")).otherwise(lit("OPEN")))
    pdim.appendData(pdimDF)
    sdim.appendData(sdimDF)
    // group keys drawn from BOTH dims (the round-18 verdict's ask)
    spark.sql(
      s"""CREATE MATERIALIZED VIEW $cat.ns.vstar AS
         |SELECT prio_class, status_class, count(*) AS cnt,
         |  sum(CAST(floor(o_totalprice * 100) AS LONG)) AS cents,
         |  max(CAST(floor(o_totalprice * 100) AS LONG)) AS max_cents
         |FROM $cat.ns.t b
         |  JOIN $cat.ns.pdim p ON b.o_orderpriority = p.o_orderpriority
         |  JOIN $cat.ns.sdim s ON b.o_orderstatus = s.o_orderstatus
         |GROUP BY prio_class, status_class""".stripMargin)
    def direct(): Seq[Row] = onBase(spark.sql(
      s"""SELECT prio_class, status_class, count(*) AS cnt,
         |  sum(CAST(floor(o_totalprice * 100) AS LONG)) AS cents,
         |  max(CAST(floor(o_totalprice * 100) AS LONG)) AS max_cents
         |FROM $cat.ns.t JOIN $cat.ns.pdim USING (o_orderpriority)
         |  JOIN $cat.ns.sdim USING (o_orderstatus)
         |GROUP BY prio_class, status_class
         |ORDER BY prio_class, status_class""".stripMargin).collect().toSeq)
    def got(): Seq[Row] = spark.sql(
      s"SELECT prio_class, status_class, cnt, cents, max_cents " +
        s"FROM $cat.ns.vstar ORDER BY prio_class, status_class")
      .collect().toSeq
    assert(got() == direct(), "star create diverged")
    // base churn refreshes through both pinned dims (the delete
    // retracts stored maxes -> the rescan re-joins BOTH dims)
    t.refresh().deleteWhere(spark,
      LakePredicate.Ge("o_totalprice", Double.box(300000.0)))
    assert(spark.sql(s"CALL $cat.system.refresh_agg_view('ns.vstar')")
      .head.getBoolean(4))
    assert(got() == direct(), "star refresh diverged")
    // moving the SECOND dim must refuse naming that dim, toward rebuild
    sdim.refresh().appendData(sdimDF.limit(1)
      .withColumn("o_orderstatus", lit("Z"))
      .withColumn("status_class", lit("OPEN")))
    def msgs(x: Throwable): String =
      if (x == null) "" else x.getMessage + "\n" + msgs(x.getCause)
    val e = intercept[Exception](
      spark.sql(s"CALL $cat.system.refresh_agg_view('ns.vstar')").collect())
    assert(msgs(e).contains("rebuild") && msgs(e).contains("sdim"), msgs(e))
    spark.sql(s"CALL $cat.system.rebuild_agg_view('ns.vstar')").collect()
    assert(got() == direct(), "star rebuild diverged")
    // and incremental refreshes resume against the re-pinned dims
    t.refresh().deleteWhere(spark,
      LakePredicate.Le("o_totalprice", Double.box(50000.0)))
    assert(spark.sql(s"CALL $cat.system.refresh_agg_view('ns.vstar')")
      .head.getBoolean(4))
    assert(got() == direct(), "star post-rebuild refresh diverged")
  }

  test("count(DISTINCT) maintains exactly via the companion slot table") {
    val (cat, wh) = sqlCat()
    val t = LakeCatalog.open(wh).loadTable("ns", "t")
    t.appendData(ordersDF, numFiles = 2)
    // one bare-column distinct and one EXPRESSION distinct whose value
    // is NULL for a slice (SQL count(DISTINCT) skips NULLs)
    spark.sql(
      s"""CREATE MATERIALIZED VIEW $cat.ns.vdc AS
         |SELECT o_orderpriority, count(*) AS cnt,
         |  sum(CAST(floor(o_totalprice * 100) AS LONG)) AS cents,
         |  count(DISTINCT o_custkey) AS n_cust,
         |  count(DISTINCT CASE WHEN o_orderstatus = 'P' THEN NULL
         |                      ELSE o_orderstatus END) AS n_status
         |FROM $cat.ns.t GROUP BY o_orderpriority""".stripMargin)
    def direct(): Seq[Row] = onBase(spark.sql(
      s"""SELECT o_orderpriority, count(*) AS cnt,
         |  sum(CAST(floor(o_totalprice * 100) AS LONG)) AS cents,
         |  count(DISTINCT o_custkey) AS n_cust,
         |  count(DISTINCT CASE WHEN o_orderstatus = 'P' THEN NULL
         |                      ELSE o_orderstatus END) AS n_status
         |FROM $cat.ns.t GROUP BY o_orderpriority
         |ORDER BY o_orderpriority""".stripMargin).collect().toSeq)
    def got(): Seq[Row] = spark.sql(
      s"SELECT o_orderpriority, cnt, cents, n_cust, n_status " +
        s"FROM $cat.ns.vdc ORDER BY o_orderpriority").collect().toSeq
    assert(got() == direct(), "distinct create diverged")
    // append (new values + repeats of existing values)
    t.refresh().appendData(ordersDF.filter(col("o_orderkey") % 5 === 0)
      .withColumn("o_orderkey", col("o_orderkey") + 700000000L))
    spark.sql(s"CALL $cat.system.refresh_agg_view('ns.vdc')")
    assert(got() == direct(), "distinct append refresh diverged")
    // CoW delete: values whose LAST occurrence dies must leave the
    // count; values with surviving repeats must not
    t.refresh().deleteWhere(spark,
      LakePredicate.Ge("o_totalprice", Double.box(250000.0)))
    spark.sql(s"CALL $cat.system.refresh_agg_view('ns.vdc')")
    assert(got() == direct(), "distinct CoW-delete refresh diverged")
    // MoR upsert (equality-delete tombstones): moved rows change both
    // their group and their distinct value multiplicities
    val upd = spark.sql(s"SELECT * FROM $cat.ns.t").limit(0) // schema
    val moved = ordersDF.filter(col("o_orderkey") % 7 === 0)
      .filter(col("o_totalprice") < 250000.0)
      .withColumn("o_orderpriority", lit("9-MOVED"))
      .select(upd.columns.map(col).toIndexedSeq: _*)
    t.refresh().mergeIntoMoR(spark, moved, Seq("o_orderkey"))
    spark.sql(s"CALL $cat.system.refresh_agg_view('ns.vdc')")
    assert(got() == direct(), "distinct MoR-upsert refresh diverged")
    // the companion is a real table next to the view
    val desc = spark.sql(s"SHOW TABLES IN $cat.ns").collect()
      .map(_.getString(1)).toSet
    assert(desc.contains("vdc__dc_n_cust") && desc.contains("vdc__dc_n_status"),
      s"companion tables missing: $desc")
  }

  test("a failed populating rebuild drops the just-created view (round-16 advisory)") {
    val (cat, wh) = sqlCat()
    val t = LakeCatalog.open(wh).loadTable("ns", "t")
    t.appendData(ordersDF)
    // analysis-clean but runtime-failing sum input: assert_true types
    // as NULL (castable to LONG, deterministic) on the empty typing
    // frame, then throws on the first real row during the rebuild
    intercept[Exception](spark.sql(
      s"""CREATE MATERIALIZED VIEW $cat.ns.vboom AS
         |SELECT o_orderpriority, count(*) AS cnt,
         |  sum(CAST(assert_true(o_totalprice < 0) AS LONG)) AS s
         |FROM $cat.ns.t GROUP BY o_orderpriority""".stripMargin))
    // no orphaned empty view carrying the stored spec may remain —
    // a re-issued (corrected) CREATE must succeed
    assert(spark.sql(s"SHOW TABLES IN $cat.ns").collect()
      .forall(_.getString(1) != "vboom"),
      "failed CREATE left an orphaned view table behind")
    spark.sql(
      s"""CREATE MATERIALIZED VIEW $cat.ns.vboom AS
         |SELECT o_orderpriority, count(*) AS cnt,
         |  sum(CAST(floor(o_totalprice * 100) AS LONG)) AS cents
         |FROM $cat.ns.t GROUP BY o_orderpriority""".stripMargin)
    assert(spark.sql(s"SELECT sum(cnt) FROM $cat.ns.vboom").head.getLong(0)
      == ordersDF.count())
  }
}
