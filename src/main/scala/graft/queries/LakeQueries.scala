package graft.queries

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.lake._

/** End-to-end lake-layer operators exposed as oracled queries: each one
  * builds a real catalog+table in a temp warehouse, runs commits against
  * it, and scans back — so the correctness gate covers the table format
  * itself (create/append/scan A5-A11, time travel, stats pruning,
  * compaction, copy-on-write delete/update from SURVEY.md §2.B), not
  * just Catalyst.
  */
object LakeQueries {
  import Tables._

  private def freshCatalog(): LakeCatalog =
    LakeCatalog.open(Files.createTempDirectory("graft_lake_").toString, new SimpleMetrics)

  /** Round trip: two append commits (even/odd orderkeys), full scan.
    * Mirrors the reference's 2-commit write-then-read-back-count oracle
    * (LocalIcebergCatalogTest.java:86-156) at table scale. */
  def lakeRoundtrip(s: SparkSession, d: String): DataFrame = {
    val src = orders(s, d)
    val cat = freshCatalog()
    val t = cat.createTable("lakeq", "orders_rt", src.schema)
    t.appendData(src.filter(col("o_orderkey") % 2 === 0))
    t.appendData(src.filter(col("o_orderkey") % 2 === 1))
    t.refresh().newScan().toDF(s).orderBy(col("o_orderkey"))
  }

  /** URI-addressed warehouse: the same two-commit round trip, but the
    * catalog opens a `file://` URI — which routes the warehouse through
    * the scheme-addressed plumbing + Hadoop FS commit backend, the
    * exact code path an `s3a://bucket/wh` deployment runs (the
    * reference is S3FileIO-first, LocalIcebergCatalog.java:121-127). */
  def lakeUriRoundtrip(s: SparkSession, d: String): DataFrame = {
    val src = orders(s, d)
    val cat = LakeCatalog.open(
      s"file://${Files.createTempDirectory("graft_lake_uri_")}", new SimpleMetrics)
    val t = cat.createTable("lakeq", "orders_uri", src.schema)
    t.appendData(src.filter(col("o_orderkey") % 2 === 0))
    t.appendData(src.filter(col("o_orderkey") % 2 === 1))
    t.refresh().newScan().toDF(s).orderBy(col("o_orderkey"))
  }

  /** Partition-spec evolution: half the table written under a
    * month(o_orderdate) spec, the spec evolved (metadata-only) to
    * identity(o_orderstatus), the other half written under it, then one
    * date-range scan over the mixed-spec table — pre-evolution files
    * prune under THEIR spec, post-evolution files under theirs, and the
    * row filter keeps the result exact either way. */
  def lakeSpecEvolution(s: SparkSession, d: String): DataFrame = {
    val src = orders(s, d)
    val cat = freshCatalog()
    val t = cat.createTable("lakeq", "orders_ev", src.schema,
      spec = Seq(PartitionField("o_orderdate", "month")))
    t.appendData(src.filter(col("o_orderkey") % 2 === 0), numFiles = 4)
    t.evolveSpec(Seq(PartitionField("o_orderstatus", "identity")))
    t.appendData(src.filter(col("o_orderkey") % 2 === 1), numFiles = 4)
    val pred = LakePredicate.And(
      LakePredicate.Ge("o_orderdate", java.sql.Timestamp.valueOf("1996-01-01 00:00:00")),
      LakePredicate.Lt("o_orderdate", java.sql.Timestamp.valueOf("1997-01-01 00:00:00")))
    t.refresh().newScan(pred).toDF(s).orderBy(col("o_orderkey"))
  }

  /** Time travel: scan the first snapshot after a second commit landed. */
  def lakeTimeTravel(s: SparkSession, d: String): DataFrame = {
    val src = orders(s, d)
    val cat = freshCatalog()
    val t = cat.createTable("lakeq", "orders_tt", src.schema)
    val first = t.appendData(src.filter(col("o_orderkey") % 2 === 0))
    t.appendData(src.filter(col("o_orderkey") % 2 === 1))
    t.asOf(first.snapshotId).toDF(s).orderBy(col("o_orderkey"))
  }

  /** Snapshot rollback (Iceberg rollback_to_snapshot): a bad second
    * commit is abandoned by restoring the first snapshot as current,
    * then the corrected data is re-committed — the gate verifies the
    * post-rollback lineage end-to-end (restored rows + redo rows,
    * none of the abandoned write's). */
  def lakeRollback(s: SparkSession, d: String): DataFrame = {
    val src = orders(s, d)
    val cat = freshCatalog()
    val t = cat.createTable("lakeq", "orders_rb", src.schema)
    val first = t.appendData(src.filter(col("o_orderkey") % 2 === 0))
    // the bad write: odd keys with a corrupted (negated) price
    t.refresh().appendData(src.filter(col("o_orderkey") % 2 === 1)
      .withColumn("o_totalprice", -col("o_totalprice")))
    t.refresh().rollbackTo(first.snapshotId)
    // the redo: odd keys, correct prices
    t.refresh().appendData(src.filter(col("o_orderkey") % 2 === 1))
    t.refresh().newScan().toDF(s).orderBy(col("o_orderkey"))
  }

  /** Write-audit-publish: the odd keys are staged onto a BRANCH (main
    * keeps serving the even half), audited by a branch read, then
    * published with fastForward — the gate verifies the post-publish
    * lineage is exactly base + staged. */
  def lakeWap(s: SparkSession, d: String): DataFrame = {
    val src = orders(s, d)
    val cat = freshCatalog()
    val t = cat.createTable("lakeq", "orders_wap", src.schema)
    t.appendData(src.filter(col("o_orderkey") % 2 === 0))
    t.createBranch("audit")
    t.refresh().appendDataToBranch("audit", src.filter(col("o_orderkey") % 2 === 1))
    // the audit: the staged branch must carry the full set before publish
    require(t.refresh().scanRef("audit").toDF(s).count() == src.count(),
      "audit failed: staged branch incomplete")
    t.fastForward("audit")
    t.refresh().newScan().toDF(s).orderBy(col("o_orderkey"))
  }

  /** Stats-based file skipping: lineitem clustered on l_shipdate, then a
    * date-range scan — planFiles drops non-overlapping files, the same
    * predicate re-filters rows exactly. */
  def lakePrune(s: SparkSession, d: String): DataFrame = {
    val src = lineitem(s, d)
    val cat = freshCatalog()
    val t = cat.createTable("lakeq", "lineitem_pr", src.schema,
      spec = Seq(PartitionField("l_shipdate", "month")))
    t.appendData(src, numFiles = 8)
    val pred = LakePredicate.And(
      LakePredicate.Ge("l_shipdate", java.sql.Timestamp.valueOf("1997-01-01 00:00:00")),
      LakePredicate.Lt("l_shipdate", java.sql.Timestamp.valueOf("1997-07-01 00:00:00")))
    t.refresh().newScan(pred).toDF(s)
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  /** Z-order clustering-on-write: the table is written sorted on the
    * Morton code of (o_custkey, o_totalprice), then scanned with a
    * range predicate on the SECOND dimension — the case a linear order
    * cannot prune (its files all span the full o_totalprice domain) and
    * z-order can (ZOrderSpec asserts the pruning; this gate asserts the
    * z-clustered scan stays exact). */
  def lakeZorder(s: SparkSession, d: String): DataFrame = {
    val src = orders(s, d)
    val cat = freshCatalog()
    val t = cat.createTable("lakeq", "orders_z", src.schema)
    t.setZOrder("o_custkey", "o_totalprice")
    t.refresh().appendData(src, numFiles = 8)
    val pred = LakePredicate.And(
      LakePredicate.Ge("o_totalprice", Double.box(100000.0)),
      LakePredicate.Lt("o_totalprice", Double.box(200000.0)))
    t.refresh().newScan(pred).toDF(s).orderBy(col("o_orderkey"))
  }

  /** Compaction: 6 small commits rewritten into 2 files; data identical. */
  def lakeCompact(s: SparkSession, d: String): DataFrame = {
    val src = orders(s, d)
    val cat = freshCatalog()
    val t = cat.createTable("lakeq", "orders_cp", src.schema)
    (0 until 6).foreach(i => t.appendData(src.filter(col("o_orderkey") % 6 === i)))
    t.refresh().compact(s, targetFiles = 2)
    t.refresh().newScan().toDF(s).orderBy(col("o_orderkey"))
  }

  /** Merge-on-read delete: positional tombstones instead of rewrites —
    * the data files survive byte-identical; the scan subtracts the
    * (file_path, pos) coordinates with a broadcast anti-join. Same
    * oracle shape as the CoW delete, so the gate proves both write
    * strategies produce identical answers. */
  def lakeDeleteMor(s: SparkSession, d: String): DataFrame = {
    val src = orders(s, d)
    val cat = freshCatalog()
    val t = cat.createTable("lakeq", "orders_mor", src.schema)
    t.appendData(src, numFiles = 4)
    t.refresh().deleteWhereMoR(s, LakePredicate.Ge("o_totalprice", Double.box(400000.0)))
    t.refresh().newScan().toDF(s).orderBy(col("o_orderkey"))
  }

  /** Deletion vectors (Iceberg v3 MoR): the same delete as
    * `lake_delete_mor`, stored as per-file compressed bitmaps in ONE
    * blob object and subtracted at read by a broadcast codegen'd
    * map-side filter — no tombstone join, no shuffle; two stacked
    * deletes prove the one-live-DV-per-file merge. */
  def lakeDeleteDv(s: SparkSession, d: String): DataFrame = {
    val src = orders(s, d)
    val cat = freshCatalog()
    val t = cat.createTable("lakeq", "orders_dv", src.schema)
    t.setProperty("write.delete.vector.enabled", "true")
    t.refresh().appendData(src, numFiles = 4)
    t.refresh().deleteWhereMoR(s, LakePredicate.Ge("o_totalprice", Double.box(400000.0)))
    // overlapping second delete merges bitmaps per file
    t.refresh().deleteWhereMoR(s, LakePredicate.Eq("o_orderstatus", "F"))
    t.refresh().newScan().toDF(s).orderBy(col("o_orderkey"))
  }

  /** Row lineage (Iceberg v3): every commit assigns its data files a
    * table-unique first-row-id inside the CAS, and `_row_id` =
    * firstRowId + parquet row_index is a STABLE per-row identity — the
    * CDC/audit primitive incremental consumers key on. The scenario
    * appends two single-file sorted batches (ids fully determined by
    * the data), then DV-deletes a slice: survivors keep their original
    * ids (the tombstones never touch the data files), which the oracle
    * reconstructs from the relational data alone. */
  def lakeRowLineage(s: SparkSession, d: String): DataFrame = {
    val src = orders(s, d)
    val cat = freshCatalog()
    val t = cat.createTable("lakeq", "orders_rl",
      src.select(col("o_orderkey"), col("o_totalprice")).schema)
    t.setProperty("write.delete.vector.enabled", "true")
    def batch(parity: Int) = src
      .filter(col("o_orderkey") % 2 === parity)
      .select(col("o_orderkey"), col("o_totalprice"))
      .repartition(1).sortWithinPartitions(col("o_orderkey"))
    t.refresh().appendData(batch(0)) // firstRowId 0
    t.refresh().appendData(batch(1)) // firstRowId = |even batch|
    t.refresh().deleteWhereMoR(s,
      graft.lake.LakePredicate.Ge("o_totalprice", Double.box(400000.0)))
    // round 14: lineage now survives MAINTENANCE — the compaction
    // materializes every survivor's id into the rewritten file
    // (coalesce(_row_id, firstRowId+pos) on read), and the CoW delete
    // after re-carries those materialized cells; the oracle still
    // reconstructs the ids from the original append order alone
    t.refresh().compact(s, targetFiles = 1)
    t.refresh().deleteWhere(s,
      graft.lake.LakePredicate.Lt("o_totalprice", Double.box(30000.0)))
    t.refresh().newScan().rowLineage(s)
      .select(col("o_orderkey"), col("_row_id").as("row_id"))
      .orderBy(col("o_orderkey"))
  }

  /** Incremental materialized aggregate view
    * ([[graft.lake.IncrementalAggView]] — classic delta maintenance
    * over the batch changelog): a per-priority (count, exact-cents sum)
    * rollup refreshed THROUGH a CoW delete, an append, and a CoW
    * update at O(delta + |view|) cost — the base is never rescanned
    * after the initial build, and each refresh is one atomic commit
    * moving the contents and the base-snapshot watermark together.
    * The oracle recomputes the final rollup relationally from the
    * mutation sequence. */
  def lakeIncrMv(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val src = orders(s, d)
    val cat = freshCatalog()
    val base = cat.createTable("lakeq", "orders_mvb", src.schema)
    val view = cat.createTable("lakeq", "orders_mv", StructType(Seq(
      StructField("o_orderpriority", org.apache.spark.sql.types.StringType),
      StructField("cnt", LongType),
      StructField("cents", LongType),
      StructField("min_cents", LongType),
      StructField("max_cents", LongType))))
    val keys = Seq("o_orderpriority")
    val cents = expr("CAST(floor(o_totalprice * 100) AS LONG)")
    // min/max ride the non-distributive path: the >=400k delete below
    // retracts every group's stored max, forcing the affected-group
    // rescan (planFiles-pruned + semi-joined) instead of a full rebuild
    def refresh() = graft.lake.IncrementalAggView.refresh(
      s, base, view, keys, Seq("cents" -> cents),
      mins = Seq("min_cents" -> cents), maxs = Seq("max_cents" -> cents))
    base.refresh().appendData(src, numFiles = 4)
    refresh() // initial build (delta = the whole first commit)
    base.refresh().deleteWhere(s,
      LakePredicate.Ge("o_totalprice", Double.box(400000.0)))
    base.refresh().appendData(
      src.filter(col("o_orderkey") % 10 === 7)
        .withColumn("o_orderkey", col("o_orderkey") + 1000000000L))
    refresh() // two commits in one incremental delta
    base.refresh().updateWhere(s, LakePredicate.Eq("o_orderstatus", "F"),
      Map("o_orderpriority" -> lit("9-MOVED")))
    refresh() // update moves mass between groups via delete+insert pair
    view.refresh().newScan().toDF(s).orderBy(col("o_orderpriority"))
  }

  /** WHERE-filtered incremental view (round-16): the rollup maintains
    * over only the rows passing the view predicate — the delta filters
    * BEFORE the net pass (deltas of filtered-out rows cost nothing
    * downstream), updates moving rows ACROSS the filter boundary
    * add/remove them through the delete+insert pair's signs, and the
    * extremum-retraction rescan re-aggregates the FILTERED base. */
  def lakeIncrMvFiltered(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val src = orders(s, d)
    val cat = freshCatalog()
    val base = cat.createTable("lakeq", "orders_mvfb", src.schema)
    val view = cat.createTable("lakeq", "orders_mvf", StructType(Seq(
      StructField("o_orderpriority", org.apache.spark.sql.types.StringType),
      StructField("cnt", LongType),
      StructField("cents", LongType),
      StructField("min_cents", LongType),
      StructField("max_cents", LongType))))
    val keys = Seq("o_orderpriority")
    val cents = expr("CAST(floor(o_totalprice * 100) AS LONG)")
    def refresh() = graft.lake.IncrementalAggView.refresh(
      s, base, view, keys, Seq("cents" -> cents),
      mins = Seq("min_cents" -> cents), maxs = Seq("max_cents" -> cents),
      where = Some(col("o_orderstatus") === "F"))
    base.refresh().appendData(src, numFiles = 4)
    refresh() // filtered initial build
    // the delete retracts filtered-group extrema (rescan re-aggregates
    // ONLY status-F rows); the update moves low-price rows INTO the
    // filter — their inserts count, their pre-images never did
    base.refresh().deleteWhere(s,
      LakePredicate.Ge("o_totalprice", Double.box(400000.0)))
    base.refresh().updateWhere(s, LakePredicate.Le("o_totalprice",
      Double.box(50000.0)), Map("o_orderstatus" -> lit("F")))
    refresh()
    view.refresh().newScan().toDF(s).orderBy(col("o_orderpriority"))
  }

  /** Broadcast-dim-ENRICHED materialized view through the SQL grammar
    * (round-17 — the round-16 verdict's ask #3): `CREATE MATERIALIZED
    * VIEW … FROM base JOIN dim ON base.k = dim.k GROUP BY dim_attr`
    * maps onto [[graft.lake.IncrementalAggView.DimJoin]] — every
    * maintained row is base ⋈ dim (inner broadcast equi-join, zero
    * extra shuffles), the dim SNAPSHOT is pinned in the view
    * properties, and the group key lives on the DIM side. The scenario
    * exercises the full contract: a CoW delete (extremum-retraction
    * rescan re-joins the pinned dim) and a group-moving update refresh
    * through the 1-arg stored-spec CALL — the moved rows' new priority
    * is NOT in the dim yet, so inner-join semantics drop them; then a
    * dim append + `CALL rebuild_agg_view` re-pins the dim and the
    * moved rows reappear under the new class. The oracle reconstructs
    * the dim relationally (class = priority-prefix rule) and replays
    * the same join. */
  private val incrMvDimCatalogs = new SessionMemo[String]()

  def lakeIncrMvDim(s: SparkSession, d: String): DataFrame = {
    val catName = incrMvDimCatalogs.getOrBuild(s, d) {
      val src = orders(s, d)
      val wh = Files.createTempDirectory("graft_lakemvdim_").toString
      val name = s"lakemvdim_${java.lang.Long.toHexString(System.nanoTime())}"
      s.conf.set(s"spark.sql.catalog.$name",
        classOf[graft.lake.sql.LakeSqlCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
      s.sql(s"CREATE NAMESPACE $name.q")
      s.sql(s"CREATE TABLE $name.q.orders (${src.schema.toDDL})")
      s.sql(s"CREATE TABLE $name.q.prio_dim " +
        "(o_orderpriority STRING, prio_class STRING)")
      val lake = LakeCatalog.open(wh)
      val base = lake.loadTable("q", "orders")
      val dim = lake.loadTable("q", "prio_dim")
      base.appendData(src, numFiles = 4)
      val dimDF = src.select(col("o_orderpriority")).distinct()
        .withColumn("prio_class", when(col("o_orderpriority") < lit("3"),
          lit("HOT")).otherwise(lit("COLD")))
      dim.appendData(dimDF)
      s.sql(
        s"""CREATE MATERIALIZED VIEW $name.q.mv_dim AS
           |SELECT prio_class, count(*) AS cnt,
           |  sum(CAST(floor(o_totalprice * 100) AS LONG)) AS cents,
           |  max(CAST(floor(o_totalprice * 100) AS LONG)) AS max_cents
           |FROM $name.q.orders b JOIN $name.q.prio_dim p
           |  ON b.o_orderpriority = p.o_orderpriority
           |GROUP BY prio_class""".stripMargin)
      // CoW delete retracts stored maxes (rescan re-joins the pinned
      // dim); the update moves F-rows to a priority NOT in the dim —
      // inner-join maintenance drops them
      base.refresh().deleteWhere(s,
        LakePredicate.Ge("o_totalprice", Double.box(400000.0)))
      base.refresh().updateWhere(s, LakePredicate.Eq("o_orderstatus", "F"),
        Map("o_orderpriority" -> lit("9-MOVED")))
      s.sql(s"CALL $name.system.refresh_agg_view('q.mv_dim')").collect()
      // dim movement: the new class arrives, refresh would refuse —
      // the SQL rebuild re-pins and the moved rows reappear
      dim.refresh().appendData(
        s.createDataFrame(java.util.Arrays.asList(
          org.apache.spark.sql.Row("9-MOVED", "COLD")), dimDF.schema))
      s.sql(s"CALL $name.system.rebuild_agg_view('q.mv_dim')").collect()
      name
    }
    s.sql(s"SELECT prio_class, cnt, cents, max_cents " +
      s"FROM $catName.q.mv_dim ORDER BY prio_class")
  }

  /** `CREATE MATERIALIZED VIEW` with AVG and a fractional (DECIMAL)
    * SUM (round-17 — the round-16 verdict's "first wall a real MV user
    * hits"): both decompose at CREATE time onto exact LONG slots (the
    * scale-shifted integer sum, next to the mandatory `cnt`), with the
    * user-facing value RE-DERIVED from the slots at every refresh
    * write — `avg` as slot/cnt double division, `sum(decimal)` as
    * slot/10^s re-cast to DECIMAL(38,s). Every float/decimal input is
    * an exact integer, so the derivation is bit-deterministic across
    * engines; the view maintains through a CoW delete + append via the
    * 1-arg stored-spec `CALL refresh_agg_view`. The result projects
    * the fractional sum back to exact cents (the corpus' house unit)
    * and compares the avg doubles raw — both sides compute the same
    * IEEE ops on the same integers. */
  private val incrMvAvgCatalogs = new SessionMemo[String]()

  def lakeIncrMvAvg(s: SparkSession, d: String): DataFrame = {
    val catName = incrMvAvgCatalogs.getOrBuild(s, d) {
      val src = orders(s, d)
      val wh = Files.createTempDirectory("graft_lakemvavg_").toString
      val name = s"lakemvavg_${java.lang.Long.toHexString(System.nanoTime())}"
      s.conf.set(s"spark.sql.catalog.$name",
        classOf[graft.lake.sql.LakeSqlCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
      s.sql(s"CREATE NAMESPACE $name.q")
      s.sql(s"CREATE TABLE $name.q.orders (o_orderkey BIGINT, " +
        "o_orderstatus STRING, o_orderpriority STRING, price DECIMAL(18,2))")
      val t = LakeCatalog.open(wh).loadTable("q", "orders")
      // price = exact floor-cents rendered as DECIMAL(18,2) — no
      // double-rounding ambiguity enters the decimal column
      def rows(df: DataFrame) = df.select(col("o_orderkey"),
        col("o_orderstatus"), col("o_orderpriority"),
        expr("CAST(CAST(CAST(floor(o_totalprice * 100) AS BIGINT) " +
          "AS DECIMAL(20,0)) / 100 AS DECIMAL(18,2))").as("price"))
      t.appendData(rows(src), numFiles = 4)
      s.sql(
        s"""CREATE MATERIALIZED VIEW $name.q.mv AS
           |SELECT o_orderpriority, count(*) AS cnt,
           |  avg(price) AS avg_price, sum(price) AS total_price,
           |  avg(o_orderkey) AS avg_key
           |FROM $name.q.orders GROUP BY o_orderpriority""".stripMargin)
      t.refresh().deleteWhere(s, LakePredicate.Eq("o_orderstatus", "F"))
      t.refresh().appendData(rows(src.filter(col("o_orderkey") % 10 === 3)
        .withColumn("o_orderkey", col("o_orderkey") + 500000000L)))
      s.sql(s"CALL $name.system.refresh_agg_view('q.mv')").collect()
      name
    }
    s.sql(
      s"""SELECT o_orderpriority, cnt, avg_price,
         |  CAST(total_price * 100 AS BIGINT) AS total_cents, avg_key
         |FROM $catName.q.mv ORDER BY o_orderpriority""".stripMargin)
  }

  /** Multi-dim STAR-join materialized view through the SQL grammar
    * (round-18 verdict ask #5): `FROM base JOIN d1 … JOIN d2 …` maps
    * onto a [[graft.lake.IncrementalAggView.DimJoin]] SEQUENCE with
    * per-dim pinned snapshots — group keys drawn from BOTH dims, a CoW
    * delete maintaining through the extremum-retraction rescan (which
    * re-joins both pinned dims), and a second-dim append refusing the
    * refresh toward `CALL rebuild_agg_view` (per-dim staleness). The
    * oracle reconstructs both dims relationally and replays the star
    * join. */
  private val incrMvStarCatalogs = new SessionMemo[String]()

  def lakeIncrMvStar(s: SparkSession, d: String): DataFrame = {
    val catName = incrMvStarCatalogs.getOrBuild(s, d) {
      val src = orders(s, d)
      val wh = Files.createTempDirectory("graft_lakemvstar_").toString
      val name = s"lakemvstar_${java.lang.Long.toHexString(System.nanoTime())}"
      s.conf.set(s"spark.sql.catalog.$name",
        classOf[graft.lake.sql.LakeSqlCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
      s.sql(s"CREATE NAMESPACE $name.q")
      s.sql(s"CREATE TABLE $name.q.orders (${src.schema.toDDL})")
      s.sql(s"CREATE TABLE $name.q.prio_dim " +
        "(o_orderpriority STRING, prio_class STRING)")
      s.sql(s"CREATE TABLE $name.q.status_dim " +
        "(o_orderstatus STRING, status_class STRING)")
      val lake = LakeCatalog.open(wh)
      val base = lake.loadTable("q", "orders")
      val pdim = lake.loadTable("q", "prio_dim")
      val sdim = lake.loadTable("q", "status_dim")
      base.appendData(src, numFiles = 4)
      pdim.appendData(src.select(col("o_orderpriority")).distinct()
        .withColumn("prio_class", when(col("o_orderpriority") < lit("3"),
          lit("HOT")).otherwise(lit("COLD"))))
      val sdimDF = src.select(col("o_orderstatus")).distinct()
        .withColumn("status_class", when(col("o_orderstatus") === lit("F"),
          lit("DONE")).otherwise(lit("OPEN")))
      sdim.appendData(sdimDF)
      s.sql(
        s"""CREATE MATERIALIZED VIEW $name.q.mv_star AS
           |SELECT prio_class, status_class, count(*) AS cnt,
           |  sum(CAST(floor(o_totalprice * 100) AS LONG)) AS cents,
           |  max(CAST(floor(o_totalprice * 100) AS LONG)) AS max_cents
           |FROM $name.q.orders b
           |  JOIN $name.q.prio_dim p ON b.o_orderpriority = p.o_orderpriority
           |  JOIN $name.q.status_dim t ON b.o_orderstatus = t.o_orderstatus
           |GROUP BY prio_class, status_class""".stripMargin)
      // CoW delete retracts stored maxes — the rescan re-joins BOTH
      // pinned dims; refresh through the 1-arg stored-spec CALL
      base.refresh().deleteWhere(s,
        LakePredicate.Ge("o_totalprice", Double.box(400000.0)))
      s.sql(s"CALL $name.system.refresh_agg_view('q.mv_star')").collect()
      // second-dim movement: per-dim staleness refuses the refresh;
      // the SQL rebuild re-pins BOTH dims
      sdim.refresh().appendData(
        s.createDataFrame(java.util.Arrays.asList(
          org.apache.spark.sql.Row("Z-NEW", "OPEN")), sdimDF.schema))
      s.sql(s"CALL $name.system.rebuild_agg_view('q.mv_star')").collect()
      name
    }
    s.sql(s"SELECT prio_class, status_class, cnt, cents, max_cents " +
      s"FROM $catName.q.mv_star ORDER BY prio_class, status_class")
  }

  /** `count(DISTINCT …)` in CREATE MATERIALIZED VIEW (round-18 verdict
    * ask #4): the distinct count maintains EXACTLY via a companion
    * slot table keyed on (group keys, value) — a value's last
    * occurrence dying removes its companion row, repeats keep it —
    * through an append (repeat custkeys), a CoW delete (some custkeys'
    * last rows die, others survive via repeats), and a MoR upsert
    * (equality tombstones moving rows' custkeys). The oracle replays
    * the mutation sequence relationally and compares native
    * count(DISTINCT). */
  private val incrMvDistinctCatalogs = new SessionMemo[String]()

  def lakeIncrMvDistinct(s: SparkSession, d: String): DataFrame = {
    val catName = incrMvDistinctCatalogs.getOrBuild(s, d) {
      val src = orders(s, d)
      val wh = Files.createTempDirectory("graft_lakemvdc_").toString
      val name = s"lakemvdc_${java.lang.Long.toHexString(System.nanoTime())}"
      s.conf.set(s"spark.sql.catalog.$name",
        classOf[graft.lake.sql.LakeSqlCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
      s.sql(s"CREATE NAMESPACE $name.q")
      s.sql(s"CREATE TABLE $name.q.orders (${src.schema.toDDL})")
      val t = LakeCatalog.open(wh).loadTable("q", "orders")
      t.appendData(src, numFiles = 4)
      s.sql(
        s"""CREATE MATERIALIZED VIEW $name.q.mv_dc AS
           |SELECT o_orderpriority, count(*) AS cnt,
           |  sum(CAST(floor(o_totalprice * 100) AS LONG)) AS cents,
           |  count(DISTINCT o_custkey) AS n_cust
           |FROM $name.q.orders GROUP BY o_orderpriority""".stripMargin)
      // append: every %10=3 order again under a fresh key — its
      // custkey becomes a REPEAT (multiplicity 2)
      t.refresh().appendData(src.filter(col("o_orderkey") % 10 === 3)
        .withColumn("o_orderkey", col("o_orderkey") + 500000000L))
      // CoW delete: high-price rows die; a custkey leaves n_cust only
      // when its LAST occurrence dies
      t.refresh().deleteWhere(s,
        LakePredicate.Ge("o_totalprice", Double.box(400000.0)))
      s.sql(s"CALL $name.system.refresh_agg_view('q.mv_dc')").collect()
      // MoR upsert (equality tombstones): %10=6 survivors move to a
      // new priority AND a shifted custkey — mass moves between
      // groups and between distinct values in one op
      val moved = src.filter(col("o_orderkey") % 10 === 6)
        .filter(col("o_totalprice") < 400000.0)
        .withColumn("o_orderpriority", lit("9-UP"))
        .withColumn("o_custkey", col("o_custkey") + 10000000L)
      t.refresh().mergeIntoMoR(s, moved, Seq("o_orderkey"))
      s.sql(s"CALL $name.system.refresh_agg_view('q.mv_dc')").collect()
      name
    }
    s.sql(s"SELECT o_orderpriority, cnt, cents, n_cust " +
      s"FROM $catName.q.mv_dc ORDER BY o_orderpriority")
  }

  /** Transparent MV rewrite end-to-end (round-18 verdict ask #3 —
    * [[graft.lake.sql.LakeMvRewrite]]): the base churns (CoW delete),
    * the view refreshes, and then TWO aggregates that never name the
    * view run through plain `spark.sql` over the BASE — the exact
    * group-by (re-planned to a view Project) and the global rollup
    * (re-planned to a view re-aggregation: count→sum(cnt), sums add,
    * max nests). Plan shape is pinned by LakeMvRewriteSpec; this
    * corpus entry proves the SERVED VALUES equal the direct rollup
    * under the DuckDB oracle at every SF. */
  private val mvRewriteCatalogs = new SessionMemo[String]()

  def lakeMvRewrite(s: SparkSession, d: String): DataFrame = {
    val catName = mvRewriteCatalogs.getOrBuild(s, d) {
      val src = orders(s, d)
      val wh = Files.createTempDirectory("graft_lakemvrw_").toString
      val name = s"lakemvrw_${java.lang.Long.toHexString(System.nanoTime())}"
      s.conf.set(s"spark.sql.catalog.$name",
        classOf[graft.lake.sql.LakeSqlCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
      s.sql(s"CREATE NAMESPACE $name.q")
      s.sql(s"CREATE TABLE $name.q.orders (${src.schema.toDDL})")
      val t = LakeCatalog.open(wh).loadTable("q", "orders")
      t.appendData(src, numFiles = 4)
      s.sql(
        s"""CREATE MATERIALIZED VIEW $name.q.mv_rw AS
           |SELECT o_orderpriority, count(*) AS cnt,
           |  sum(CAST(floor(o_totalprice * 100) AS LONG)) AS cents,
           |  max(CAST(floor(o_totalprice * 100) AS LONG)) AS max_cents
           |FROM $name.q.orders GROUP BY o_orderpriority""".stripMargin)
      t.refresh().deleteWhere(s,
        LakePredicate.Ge("o_totalprice", Double.box(400000.0)))
      s.sql(s"CALL $name.system.refresh_agg_view('q.mv_rw')").collect()
      name
    }
    s.sql(
      s"""SELECT 'by_prio' AS shape, o_orderpriority, count(*) AS cnt,
         |  sum(CAST(floor(o_totalprice * 100) AS LONG)) AS cents,
         |  max(CAST(floor(o_totalprice * 100) AS LONG)) AS max_cents
         |FROM $catName.q.orders GROUP BY o_orderpriority
         |UNION ALL
         |SELECT 'total' AS shape, 'ALL' AS o_orderpriority,
         |  count(*) AS cnt,
         |  sum(CAST(floor(o_totalprice * 100) AS LONG)) AS cents,
         |  max(CAST(floor(o_totalprice * 100) AS LONG)) AS max_cents
         |FROM $catName.q.orders
         |ORDER BY shape, o_orderpriority""".stripMargin)
  }

  /** VARIANT-typed column through the full lake life cycle (round-16,
    * Iceberg v3 / Spark 4 `VariantType`): `events.props` JSON parses
    * into a variant column stored IN the lake schema (field-ID carried
    * like any column; per-file stats = none — variants are opaque to
    * min/max pruning), survives append + MoR delete (tombstones) + a
    * copy-on-write update that REWRITES variant cells, and reads back
    * through `variant_get` typed extraction. The oracle twin runs the
    * same pipeline over the raw JSON strings in DuckDB — so the binary
    * variant encoding is proven value-preserving end-to-end. */
  def qEvVariant(s: SparkSession, d: String): DataFrame = {
    val src = events(s, d).select(col("event_id"), col("event_type"),
      expr("parse_json(props)").as("props"))
    val cat = freshCatalog()
    val t = cat.createTable("lakeq", "events_var", src.schema)
    t.appendData(src, numFiles = 4)
    // MoR delete: variant rows die by tombstone, files untouched
    t.refresh().deleteWhereMoR(s, LakePredicate.Eq("event_type", "view"))
    // CoW update: the rewrite reads live variant cells (applying the
    // tombstones above) and writes NEW variant binaries
    t.refresh().updateWhere(s, LakePredicate.Eq("event_type", "error"),
      Map("props" -> expr("parse_json('{\"k\": -1}')")))
    t.refresh().newScan().toDF(s)
      .select(col("event_type"),
        expr("variant_get(props, '$.k', 'long')").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      .orderBy(col("event_type"))
  }

  /** Tombstone-materializing maintenance: a clustered table takes a MoR
    * delete (tombstones land on the price-sorted tail files only), then
    * rewrite_position_deletes materializes ONLY the affected files and
    * retires every delete manifest — the self-heal for heavy-churn
    * tables. The scan after must be tombstone-free and exact. */
  def lakeRewriteDeletes(s: SparkSession, d: String): DataFrame = {
    val src = orders(s, d)
    val cat = freshCatalog()
    val t = cat.createTable("lakeq", "orders_rpd", src.schema,
      sortOrder = Seq("o_totalprice"))
    t.refresh().appendData(src, numFiles = 4)
    t.refresh().deleteWhereMoR(s, LakePredicate.Ge("o_totalprice", Double.box(400000.0)))
    t.refresh().rewritePositionDeletes(s)
    val snap = t.refresh().metadata.currentSnapshot
    require(snap.exists(sn => sn.deleteFiles.isEmpty && sn.eqDeleteFiles.isEmpty),
      "rewrite_position_deletes left live tombstones")
    t.newScan().toDF(s).orderBy(col("o_orderkey"))
  }

  /** In-place migration (Iceberg's add_files): foreign parquet written
    * WITHOUT engine field IDs registers as ONE metadata commit — no
    * byte rewritten — with footer stats pruning from the first scan.
    * The post-import column RENAME proves the frozen name mapping:
    * imported files resolve the renamed column by their import-time
    * name, exactly like native files resolve it by field ID. */
  def lakeAddFiles(s: SparkSession, d: String): DataFrame = {
    val src = orders(s, d)
    val ext = Files.createTempDirectory("graft_lake_ext_").toString
    src.repartitionByRange(4, col("o_orderkey"))
      .write.mode("overwrite").parquet(ext)
    val cat = freshCatalog()
    val t = cat.createTable("lakeq", "orders_af", src.schema)
    t.addFiles(s, ext)
    t.refresh().renameColumn("o_totalprice", "o_price")
    t.refresh().newScan(LakePredicate.Ge("o_price", Double.box(100000.0)))
      .toDF(s).orderBy(col("o_orderkey"))
  }

  /** Collection-element evolution: rename + widen + add of fields
    * INSIDE an array-element struct (`items.element.*`), field-ID
    * addressed and metadata-only — pre-evolution files resolve the
    * renamed field by ID, widen at read, and project null for the added
    * field; post-evolution files carry real values. Output is exploded
    * flat so the oracle reproduces it relationally. */
  def lakeElementEvolution(s: SparkSession, d: String): DataFrame = {
    val src = orders(s, d)
    def items(df: DataFrame) = df.select(col("o_orderkey"), array(
      struct((col("o_orderkey") % 5).cast("int").as("qty"), lit("x").as("tag")),
      struct((col("o_orderkey") % 7).cast("int").as("qty"), lit("y").as("tag")))
      .as("items"))
    val cat = freshCatalog()
    val v1 = items(src.filter(col("o_orderkey") % 2 === 0))
    val t = cat.createTable("lakeq", "orders_el", v1.schema)
    t.appendData(v1, numFiles = 2)
    t.refresh().alterSchema(Seq(
      SchemaChange.Rename("items.element.qty", "quantity"),
      SchemaChange.Widen("items.element.quantity",
        org.apache.spark.sql.types.LongType),
      SchemaChange.Add("items.element.discount",
        org.apache.spark.sql.types.IntegerType)))
    val v2 = src.filter(col("o_orderkey") % 2 === 1).select(col("o_orderkey"), array(
      struct((col("o_orderkey") % 5).as("quantity"), lit("x").as("tag"),
        lit(7).as("discount")),
      struct((col("o_orderkey") % 7).as("quantity"), lit("y").as("tag"),
        lit(7).as("discount"))).as("items"))
    t.refresh().appendData(v2)
    t.refresh().newScan().toDF(s)
      .select(col("o_orderkey"), explode(col("items")).as("it"))
      .select(col("o_orderkey"), col("it.quantity").as("quantity"),
        col("it.tag").as("tag"), col("it.discount").as("discount"))
      .orderBy(col("o_orderkey"), col("tag"))
  }

  /** BARE collection-element type promotion (Iceberg's primitive
    * promotion applied to array elements): `array<int>` → `array<bigint>`
    * as ONE metadata commit — no file rewritten. Pre-widen files' int32
    * leaves widen at the parquet read; the post-widen append lands
    * genuinely-64-bit values both generations scan together. Output is
    * posexploded flat so the oracle reproduces it relationally. */
  def lakeElementWiden(s: SparkSession, d: String): DataFrame = {
    val src = orders(s, d)
    val v1 = src.filter(col("o_orderkey") % 2 === 0).select(col("o_orderkey"),
      array((col("o_orderkey") % 5).cast("int"),
        (col("o_orderkey") % 7).cast("int")).as("qs"))
    val cat = freshCatalog()
    val t = cat.createTable("lakeq", "orders_elw", v1.schema)
    t.appendData(v1, numFiles = 2)
    t.refresh().alterSchema(Seq(SchemaChange.Widen("qs.element",
      org.apache.spark.sql.types.LongType)))
    // post-widen values overflow int32 — only a real bigint read survives
    val v2 = src.filter(col("o_orderkey") % 2 === 1).select(col("o_orderkey"),
      array((col("o_orderkey") % 5) * 1000000000L,
        col("o_orderkey") % 7).as("qs"))
    t.refresh().appendData(v2)
    t.refresh().newScan().toDF(s)
      .select(col("o_orderkey"), posexplode(col("qs")).as(Seq("pos", "q")))
      .orderBy(col("o_orderkey"), col("pos"))
  }

  /** ANALYZE (column statistics for CBO): one aggregation pass stores
    * NDV/null/length stats in table properties; this entry surfaces the
    * EXACT parts (null counts from the pass, key bounds decoded from
    * manifest rollups — the same values the DSv2 columnStats serve) so
    * the oracle can recompute them relationally. NDV is HLL-approximate
    * and stays out of the oracled output (ColStatsSpec bounds it). */
  def lakeAnalyze(s: SparkSession, d: String): DataFrame = {
    val src = orders(s, d)
    val cat = freshCatalog()
    val t = cat.createTable("lakeq", "orders_an", src.schema)
    t.appendData(src, numFiles = 4)
    t.refresh().analyzeColumns(s,
      Seq("o_orderkey", "o_totalprice", "o_orderstatus"))
    val m = t.refresh().metadata
    val stats = graft.lake.LakeTable.parseColStats(t.colStatsJson.get)
    val keyId = m.statKey("o_orderkey").get
    val files = m.currentFiles
    val minK = files.map(_.minValues(keyId).toLong).min
    val maxK = files.map(_.maxValues(keyId).toLong).max
    import s.implicits._
    Seq(
      ("o_orderkey", stats("o_orderkey")._2, Some(minK), Some(maxK)),
      ("o_orderstatus", stats("o_orderstatus")._2,
        Option.empty[Long], Option.empty[Long]),
      ("o_totalprice", stats("o_totalprice")._2,
        Option.empty[Long], Option.empty[Long]))
      .toDF("col", "nulls", "min_key", "max_key").orderBy(col("col"))
  }

  /** Initial column defaults (Iceberg v3): a column added with a
    * default reads the default from every file written BEFORE the add
    * (per FILE, via the parquet reader's existence-default machinery),
    * while post-add appends carry real values — all metadata-only. */
  def lakeColumnDefaults(s: SparkSession, d: String): DataFrame = {
    val src = orders(s, d)
    val cat = freshCatalog()
    val t = cat.createTable("lakeq", "orders_cd", src.schema)
    t.appendData(src.filter(col("o_orderkey") % 2 === 0), numFiles = 2)
    t.refresh().addColumnWithDefault("channel", org.apache.spark.sql.types.StringType, "legacy")
    t.refresh().appendData(
      src.filter(col("o_orderkey") % 2 === 1).withColumn("channel", lit("fresh")))
    t.refresh().newScan().toDF(s).orderBy(col("o_orderkey"))
  }

  /** Atomic predicate-scoped overwrite (replaceWhere — the backfill
    * primitive): one commit deletes the P-status slice and lands its
    * regenerated replacement; readers never see the gap a
    * delete-then-append pair exposes. */
  def lakeReplaceWhere(s: SparkSession, d: String): DataFrame = {
    val src = orders(s, d)
    val cat = freshCatalog()
    val t = cat.createTable("lakeq", "orders_rw", src.schema)
    t.appendData(src, numFiles = 4)
    val backfill = src.filter(col("o_orderstatus") === "P")
      .withColumn("o_orderpriority", lit("0-BACKFILL"))
    t.refresh().replaceWhere(s, LakePredicate.Eq("o_orderstatus", "P"), backfill)
    t.refresh().newScan().toDF(s).orderBy(col("o_orderkey"))
  }

  /** Per-commit CHANGELOG over a deletion-vector table: two appends, a
    * DV delete, a DV MoR update — emitted as insert/delete rows with
    * full pre-images and commit ids (delete deltas come from bitmap
    * `minus` against the parent's DV). The oracle reconstructs the feed
    * relationally. */
  def lakeChangelog(s: SparkSession, d: String): DataFrame = {
    val src = orders(s, d)
    val cat = freshCatalog()
    val t = cat.createTable("lakeq", "orders_cl", src.schema)
    t.setProperty("write.delete.vector.enabled", "true")
    t.refresh().appendData(src.filter(col("o_orderkey") % 2 === 0), numFiles = 2)
    t.refresh().appendData(src.filter(col("o_orderkey") % 2 === 1))
    t.refresh().deleteWhereMoR(s, LakePredicate.Ge("o_totalprice", Double.box(400000.0)))
    t.refresh().updateWhereMoR(s, LakePredicate.Eq("o_orderstatus", "P"),
      Map("o_orderpriority" -> lit("9-CL")))
    t.refresh().changelog(s, fromSnapshotId = 0L)
      .orderBy(col("_commit_snapshot_id"), col("_change_type"), col("o_orderkey"))
  }

  /** The STREAMING changelog under the hash oracle (round 16): the
    * exact scenario of [[lakeChangelog]] — two appends, a DV-backed MoR
    * delete, a MoR update — drained through the `.changes` streaming
    * source (AvailableNow) into parquet and compared against the same
    * DuckDB twin the batch feed matches. This is the MoR-tombstone-
    * delta streaming path (positional/DV deltas as per-partition
    * bitmap filters) proven VALUE-exact, not just spec-consistent;
    * micro-batches write distributed, nothing materializes on the
    * driver. */
  def lakeChangelogStream(s: SparkSession, d: String): DataFrame = {
    val src = orders(s, d)
    val wh = Files.createTempDirectory("graft_clstream_").toString
    val name = s"clstream_${java.lang.Long.toHexString(System.nanoTime())}"
    s.conf.set(s"spark.sql.catalog.$name",
      classOf[graft.lake.sql.LakeSqlCatalog].getName)
    s.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
    s.sql(s"CREATE NAMESPACE $name.q")
    s.sql(s"CREATE TABLE $name.q.orders (${src.schema.toDDL}) " +
      "TBLPROPERTIES ('write.delete.vector.enabled'='true')")
    val t = LakeCatalog.open(wh).loadTable("q", "orders")
    t.refresh().appendData(src.filter(col("o_orderkey") % 2 === 0), numFiles = 2)
    t.refresh().appendData(src.filter(col("o_orderkey") % 2 === 1))
    t.refresh().deleteWhereMoR(s, LakePredicate.Ge("o_totalprice",
      Double.box(400000.0)))
    t.refresh().updateWhereMoR(s, LakePredicate.Eq("o_orderstatus", "P"),
      Map("o_orderpriority" -> lit("9-CL")))
    val out = Files.createTempDirectory("graft_clstream_out_").toString
    val q = s.readStream.option("stream-from", "beginning")
      .table(s"$name.q.orders.changes")
      .writeStream
      .option("checkpointLocation",
        Files.createTempDirectory("graft_clstream_ck_").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (df: DataFrame, _: Long) =>
        df.drop("_row_id").write.mode("append").parquet(out); ()
      }
      .start()
    q.awaitTermination()
    s.read.parquet(out)
      .orderBy(col("_commit_snapshot_id"), col("_change_type"), col("o_orderkey"))
  }

  /** Branch-scoped mutations (WAP for row-level ops): a CoW delete and
    * update stage on a branch — main untouched until fastForward
    * publishes the audited state. */
  def lakeBranchMutations(s: SparkSession, d: String): DataFrame = {
    val src = orders(s, d)
    val cat = freshCatalog()
    val t = cat.createTable("lakeq", "orders_bm", src.schema)
    t.appendData(src, numFiles = 4)
    t.createBranch("stage")
    t.refresh().deleteWhere(s, LakePredicate.Eq("o_orderstatus", "F"),
      branch = Some("stage"))
    t.refresh().updateWhere(s, LakePredicate.Eq("o_orderstatus", "O"),
      Map("o_orderpriority" -> lit("9-STAGED")), branch = Some("stage"))
    t.refresh().fastForward("stage")
    t.refresh().newScan().toDF(s).orderBy(col("o_orderkey"))
  }

  /** SQL write-audit-publish via `spark.wap.branch` (Iceberg's session
    * conf, same name): while set, SQL DELETE + UPDATE stage on an
    * auto-created branch and same-session reads audit the staged head —
    * main provably untouched (`VERSION AS OF 'main'` is the unstaged
    * escape hatch) — then `CALL system.fast_forward` publishes. Same
    * oracle as [[lakeBranchMutations]]: the SQL conf surface and the
    * explicit Scala branch API stage identical states. */
  private val sqlWapCatalogs = new SessionMemo[String]()

  def lakeSqlWap(s: SparkSession, d: String): DataFrame = {
    val catName = sqlOrdersCatalog(sqlWapCatalogs, s, d, "lakesqlwap",
      numFiles = 4) { name =>
      val mainCount = s.sql(s"SELECT count(*) FROM $name.q.orders").head.getLong(0)
      s.conf.set("spark.wap.branch", "audit")
      try {
        s.sql(s"DELETE FROM $name.q.orders WHERE o_orderstatus = 'F'")
        s.sql(s"UPDATE $name.q.orders SET o_orderpriority = '9-STAGED' " +
          "WHERE o_orderstatus = 'O'")
        val staged = s.sql(s"SELECT count(*) FROM $name.q.orders").head.getLong(0)
        val main = s.sql(
          s"SELECT count(*) FROM $name.q.orders VERSION AS OF 'main'").head.getLong(0)
        require(main == mainCount && staged < main,
          s"WAP isolation broken: main $main (was $mainCount), staged $staged")
      } finally s.conf.unset("spark.wap.branch")
      s.sql(s"CALL $name.system.fast_forward('q.orders', 'audit')")
      ()
    }
    s.sql(s"SELECT * FROM $catName.q.orders ORDER BY o_orderkey")
  }

  /** Copy-on-write delete: rows vanish, untouched files survive. */
  def lakeDeleteCow(s: SparkSession, d: String): DataFrame = {
    val src = orders(s, d)
    val cat = freshCatalog()
    val t = cat.createTable("lakeq", "orders_del", src.schema)
    t.appendData(src)
    t.refresh().deleteWhere(s, LakePredicate.Ge("o_totalprice", Double.box(400000.0)))
    t.refresh().newScan().toDF(s).orderBy(col("o_orderkey"))
  }

  /** Keyed MERGE: update every 10th order (doubled price) + insert
    * clones under shifted keys, then scan. */
  def lakeMergeUpsert(s: SparkSession, d: String): DataFrame = {
    val src = orders(s, d)
    val cat = freshCatalog()
    val t = cat.createTable("lakeq", "orders_mg", src.schema)
    t.appendData(src)
    val tenth = src.filter(col("o_orderkey") % 10 === 0)
      .withColumn("o_totalprice", col("o_totalprice") * 2)
    val updates = tenth
    val inserts = tenth.withColumn("o_orderkey", col("o_orderkey") + 100000000L)
    t.refresh().mergeInto(s, updates.unionByName(inserts), Seq("o_orderkey"))
    t.refresh().newScan().toDF(s).orderBy(col("o_orderkey"))
  }

  /** Merge-on-read keyed upsert: ONE commit of the source rows + an
    * equality tombstone of their keys — the table itself is never read
    * (O(source) at any table size, the CDC-at-100TB shape). Mirrors
    * [[lakeMergeUpsert]] exactly so the same oracle proves the MoR and
    * CoW strategies produce identical answers. */
  def lakeMergeMor(s: SparkSession, d: String): DataFrame = {
    val src = orders(s, d)
    val cat = freshCatalog()
    val t = cat.createTable("lakeq", "orders_mgmor", src.schema)
    t.appendData(src, numFiles = 4)
    val tenth = src.filter(col("o_orderkey") % 10 === 0)
      .withColumn("o_totalprice", col("o_totalprice") * 2)
    val inserts = tenth.withColumn("o_orderkey", col("o_orderkey") + 100000000L)
    t.refresh().mergeIntoMoR(s, tenth.unionByName(inserts), Seq("o_orderkey"))
    t.refresh().newScan().toDF(s).orderBy(col("o_orderkey"))
  }

  /** Copy-on-write update: targeted rewrite of matching rows. */
  def lakeUpdateCow(s: SparkSession, d: String): DataFrame = {
    val src = orders(s, d)
    val cat = freshCatalog()
    val t = cat.createTable("lakeq", "orders_up", src.schema)
    t.appendData(src)
    t.refresh().updateWhere(s, LakePredicate.Eq("o_orderstatus", "F"),
      Map("o_orderpriority" -> lit("0-REWRITTEN")))
    t.refresh().newScan().toDF(s).orderBy(col("o_orderkey"))
  }

  /** Merge-on-read update: ONE commit of positional tombstones + new
    * files carrying the updated rows — O(matched rows), no data-file
    * rewrite. Same oracle as the CoW update, so the gate proves both
    * update strategies produce identical answers. */
  def lakeUpdateMor(s: SparkSession, d: String): DataFrame = {
    val src = orders(s, d)
    val cat = freshCatalog()
    val t = cat.createTable("lakeq", "orders_upmor", src.schema)
    t.appendData(src, numFiles = 4)
    t.refresh().updateWhereMoR(s, LakePredicate.Eq("o_orderstatus", "F"),
      Map("o_orderpriority" -> lit("0-REWRITTEN")))
    t.refresh().newScan().toDF(s).orderBy(col("o_orderkey"))
  }

  /** Maintenance: compact, expire history, drop orphans — the surviving
    * table must still read back exactly. */
  def lakeMaintenance(s: SparkSession, d: String): DataFrame = {
    val src = orders(s, d)
    val cat = freshCatalog()
    val t = cat.createTable("lakeq", "orders_mt", src.schema)
    (0 until 4).foreach(i => t.refresh().appendData(src.filter(col("o_orderkey") % 4 === i)))
    // the full maintenance cycle a scheduled job runs: manifest
    // consolidation (metadata-only) → data compaction → history expiry
    // → orphan reclaim
    t.refresh().rewriteManifests(minManifests = 2)
    t.refresh().compact(s, targetFiles = 2)
    t.expireSnapshots(keepLast = 1)
    t.removeOrphanFiles()
    t.refresh().newScan().toDF(s).orderBy(col("o_orderkey"))
  }

  /** Column rename WITHOUT data rewrite: files written under the old
    * name must come back fully populated under the new one (field-ID
    * projection; name-based matching would return all nulls and the
    * oracle would catch it). */
  def lakeRename(s: SparkSession, d: String): DataFrame = {
    val src = orders(s, d)
    val cat = freshCatalog()
    val t = cat.createTable("lakeq", "orders_rn", src.schema)
    t.appendData(src)
    t.refresh().renameColumn("o_totalprice", "amount")
    t.newScan().toDF(s).orderBy(col("o_orderkey"))
  }

  /** Nested-FIELD evolution: rename + add inside a struct column are
    * metadata-only, ID-addressed commits — files written under the old
    * nested name must come back fully populated under the new one
    * (nested parquet field IDs; name matching would project null and
    * the oracle would catch it), and pre-add files read null for the
    * added field. */
  def lakeNestedEvolution(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types._
    val src = orders(s, d)
    val cat = freshCatalog()
    val schema = StructType(Seq(
      StructField("o_orderkey", LongType),
      StructField("info", StructType(Seq(
        StructField("status", StringType),
        StructField("price", DoubleType))))))
    val t = cat.createTable("lakeq", "orders_ne", schema)
    t.appendData(src.select(col("o_orderkey"),
      struct(col("o_orderstatus").as("status"),
        col("o_totalprice").as("price")).as("info")))
    t.refresh().renameColumn("info.status", "state")
    t.refresh().addColumn("info.flag", IntegerType)
    t.refresh().appendData(src.select(
      (col("o_orderkey") + 100000000L).as("o_orderkey"),
      struct(col("o_orderstatus").as("state"), col("o_totalprice").as("price"),
        lit(1).as("flag")).as("info")))
    t.refresh().newScan().toDF(s)
      .select(col("o_orderkey"), col("info.state").as("state"),
        col("info.price").as("price"), col("info.flag").as("flag"))
      .orderBy(col("o_orderkey"))
  }

  /** Incremental scan: the rows added AFTER a snapshot — the feed a
    * downstream pipeline tails (Iceberg incremental-append analog). */
  def lakeChanges(s: SparkSession, d: String): DataFrame = {
    val src = orders(s, d)
    val cat = freshCatalog()
    val t = cat.createTable("lakeq", "orders_ch", src.schema)
    val first = t.appendData(src.filter(col("o_orderkey") % 2 === 0))
    t.refresh().appendData(src.filter(col("o_orderkey") % 2 === 1))
    t.refresh().changesSince(s, first.snapshotId).orderBy(col("o_orderkey"))
  }

  /** Streaming SOURCE under the oracle gate: readStream tails a lake
    * table's append commits (offset = snapshot id, Trigger.AvailableNow)
    * and an exactly-once lake sink lands each micro-batch — the
    * lake→lake pipeline end-to-end. Oracle = the full input, which only
    * holds if every appended row flows through exactly once. */
  private val streamReadCatalogs = new SessionMemo[String]()

  def lakeStreamRead(s: SparkSession, d: String): DataFrame = {
    val memo = streamReadCatalogs.getOrBuild(s, d) {
      val src = orders(s, d)
      val wh = Files.createTempDirectory("graft_lakestream_").toString
      val name = s"lakestream_${java.lang.Long.toHexString(System.nanoTime())}"
      s.conf.set(s"spark.sql.catalog.$name", classOf[graft.lake.sql.LakeSqlCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
      s.sql(s"CREATE NAMESPACE $name.q")
      s.sql(s"CREATE TABLE $name.q.orders (${src.schema.toDDL})")
      val t = LakeCatalog.open(wh).loadTable("q", "orders")
      t.appendData(src.filter(col("o_orderkey") % 2 === 0))
      t.refresh().appendData(src.filter(col("o_orderkey") % 2 === 1))
      val dstWh = Files.createTempDirectory("graft_lakestream_dst_").toString
      val dst = LakeCatalog.open(dstWh).createTable("q", "orders_dst", src.schema)
      val q = s.readStream.option("stream-from", "beginning")
        .table(s"$name.q.orders")
        .writeStream
        .option("checkpointLocation",
          Files.createTempDirectory("graft_lakestream_ck_").toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (df: DataFrame, batchId: Long) =>
          dst.refresh().appendDataExactlyOnce(df, "gate", batchId)
          ()
        }
        .start()
      q.awaitTermination()
      dstWh
    }
    LakeCatalog.open(memo).loadTable("q", "orders_dst")
      .refresh().newScan().toDF(s).orderBy(col("o_orderkey"))
  }

  /** Native DSv2 streaming SINK under the oracle gate: readStream over
    * the source lake table → `writeStream.toTable` into the destination
    * lake table — NO foreachBatch anywhere; executors stream parquet,
    * the driver lands exactly-once epoch commits. Oracle = the full
    * input, which only holds if every row flows through exactly once. */
  private val streamSinkCatalogs = new SessionMemo[String]()

  def lakeStreamSink(s: SparkSession, d: String): DataFrame = {
    val memo = streamSinkCatalogs.getOrBuild(s, d) {
      val src = orders(s, d)
      val wh = Files.createTempDirectory("graft_lakesink_").toString
      val name = s"lakesink_${java.lang.Long.toHexString(System.nanoTime())}"
      s.conf.set(s"spark.sql.catalog.$name", classOf[graft.lake.sql.LakeSqlCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
      s.sql(s"CREATE NAMESPACE $name.q")
      s.sql(s"CREATE TABLE $name.q.orders (${src.schema.toDDL})")
      s.sql(s"CREATE TABLE $name.q.orders_dst (${src.schema.toDDL})")
      val t = LakeCatalog.open(wh).loadTable("q", "orders")
      t.appendData(src.filter(col("o_orderkey") % 2 === 0))
      t.refresh().appendData(src.filter(col("o_orderkey") % 2 === 1))
      val q = s.readStream.option("stream-from", "beginning")
        .table(s"$name.q.orders")
        .writeStream
        .option("checkpointLocation",
          Files.createTempDirectory("graft_lakesink_ck_").toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .toTable(s"$name.q.orders_dst")
      q.awaitTermination()
      wh
    }
    LakeCatalog.open(memo).loadTable("q", "orders_dst")
      .refresh().newScan().toDF(s).orderBy(col("o_orderkey"))
  }

  /** ONE catalog registration + temp warehouse + populated orders table
    * per (session, corpus dir, prefix) — a per-invocation registration
    * accumulated catalog instances, session confs, and undeleted temp
    * warehouses across a corpus run. `afterLoad` runs once at build
    * (e.g. the SQL DELETE a mutation query exercises). */
  private def sqlOrdersCatalog(memo: SessionMemo[String], s: SparkSession,
      d: String, prefix: String, numFiles: Int = 0)(
      afterLoad: String => Unit): String =
    memo.getOrBuild(s, d) {
      val src = orders(s, d)
      val wh = Files.createTempDirectory(s"graft_${prefix}_").toString
      val name = s"${prefix}_${java.lang.Long.toHexString(System.nanoTime())}"
      s.conf.set(s"spark.sql.catalog.$name", classOf[graft.lake.sql.LakeSqlCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
      s.sql(s"CREATE NAMESPACE $name.q")
      s.sql(s"CREATE TABLE $name.q.orders (${src.schema.toDDL})")
      LakeCatalog.open(wh).loadTable("q", "orders").appendData(src, numFiles)
      afterLoad(name)
      name
    }

  /** The SQL surface end-to-end: DDL through the V2 catalog plugin,
    * a transactional append through the Scala API, and an aggregation
    * read back with spark.sql over `<catalog>.<ns>.<table>`. */
  private val sqlCatalogs = new SessionMemo[String]()

  /** The INSPECTION metadata tables under the correctness gate: a
    * 2-commit table queried through `entries` / `all_data_files` /
    * `all_manifests` / `metadata_log_entries`, reduced to invariants
    * DuckDB reconstructs relationally from the source rows (snapshot
    * ids and paths are run-specific; row counts and version/file/ref
    * counts are not). */
  def lakeInspect(s: SparkSession, d: String): DataFrame = {
    val src = orders(s, d)
    val wh = Files.createTempDirectory("graft_lakeins_").toString
    val name = s"lakeins_${java.lang.Long.toHexString(System.nanoTime())}"
    s.conf.set(s"spark.sql.catalog.$name", classOf[graft.lake.sql.LakeSqlCatalog].getName)
    s.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
    s.sql(s"CREATE NAMESPACE $name.q")
    s.sql(s"CREATE TABLE $name.q.orders (${src.schema.toDDL})")
    val t = LakeCatalog.open(wh).loadTable("q", "orders")
    t.appendData(src.filter(col("o_orderkey") % 2 === 0), numFiles = 2)
    t.refresh().appendData(src.filter(col("o_orderkey") % 2 === 1), numFiles = 2)
    s.sql(
      s"""SELECT 'rows_existing_commit1' AS metric, sum(record_count) AS value
         |FROM $name.q.orders.entries WHERE status = 0
         |UNION ALL
         |SELECT 'rows_added_commit2', sum(record_count)
         |FROM $name.q.orders.entries WHERE status = 1
         |UNION ALL
         |SELECT 'live_files_ever', count(*) FROM $name.q.orders.all_data_files
         |UNION ALL
         |SELECT 'metadata_versions', count(*)
         |FROM $name.q.orders.metadata_log_entries
         |UNION ALL
         |SELECT 'snapshots_with_manifests', count(DISTINCT reference_snapshot_id)
         |FROM $name.q.orders.all_manifests
         |ORDER BY metric""".stripMargin)
  }

  /** CTAS → RTAS through the V2 catalog: CREATE TABLE AS SELECT
    * derives schema + data from a query in one statement, REPLACE
    * TABLE AS SELECT swaps the definition wholesale; the read back
    * proves the replace (not the original) is what's served, through
    * the same manifest-commit write path as INSERT. */
  def lakeCtas(s: SparkSession, d: String): DataFrame = {
    val src = orders(s, d)
    val wh = Files.createTempDirectory("graft_ctas_").toString
    val name = s"ctas_${java.lang.Long.toHexString(System.nanoTime())}"
    s.conf.set(s"spark.sql.catalog.$name", classOf[graft.lake.sql.LakeSqlCatalog].getName)
    s.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
    s.sql(s"CREATE NAMESPACE $name.q")
    src.createOrReplaceTempView(s"${name}_orders_src")
    s.sql(
      s"""CREATE TABLE $name.q.big AS
         |SELECT o_orderstatus, o_totalprice FROM ${name}_orders_src""".stripMargin)
    s.sql(
      s"""REPLACE TABLE $name.q.big AS
         |SELECT o_orderstatus AS st, count(*) AS n,
         |  round(sum(o_totalprice), 2) AS sum_price
         |FROM ${name}_orders_src GROUP BY o_orderstatus""".stripMargin)
    s.sql(s"SELECT st, n, sum_price FROM $name.q.big ORDER BY st")
  }

  def lakeSqlSelect(s: SparkSession, d: String): DataFrame = {
    val catName = sqlOrdersCatalog(sqlCatalogs, s, d, "lakesql")(_ => ())
    s.sql(
      s"""SELECT o_orderstatus, count(*) AS n,
         |  round(sum(o_totalprice), 2) AS sum_price,
         |  min(o_orderdate) AS first_date
         |FROM $catName.q.orders
         |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
  }

  /** SQL VIEW persisted in the lake catalog, through the correctness
    * gate: CREATE OR REPLACE VIEW over the lake table (each invocation
    * appends one more version to the view's definition log — the
    * replace path, not just create), then a filtered aggregate read
    * through the view. The stored SQL substitutes at resolution and
    * the WHERE pushes through the view boundary into manifest pruning
    * like any subquery — a view costs one metadata read, never a
    * materialization. */
  def lakeView(s: SparkSession, d: String): DataFrame = {
    val catName = sqlOrdersCatalog(sqlCatalogs, s, d, "lakesql")(_ => ())
    s.sql(
      s"""CREATE OR REPLACE VIEW $catName.q.orders_by_status AS
         |SELECT o_orderstatus AS st, o_orderpriority AS pri,
         |  o_totalprice, o_orderkey
         |FROM $catName.q.orders""".stripMargin)
    s.sql(
      s"""SELECT st, pri, count(*) AS n,
         |  round(sum(o_totalprice), 2) AS sum_price,
         |  min(o_orderkey) AS min_key
         |FROM $catName.q.orders_by_status
         |WHERE st <> 'P'
         |GROUP BY st, pri ORDER BY st, pri""".stripMargin)
  }

  /** Hidden metadata columns `_file`/`_pos` through the correctness
    * gate: a 4-file table queried for per-file position invariants —
    * exactly 4 distinct files, positions dense and 0-based in every
    * file (per-file max+1 sums to the corpus rowcount, every per-file
    * min is 0). File paths themselves are engine-private, so the
    * oracle verifies these derived exact integers instead. */
  private val metaCatalogs = new SessionMemo[String]()

  def lakeMetadataCols(s: SparkSession, d: String): DataFrame = {
    val catName = sqlOrdersCatalog(metaCatalogs, s, d, "lakemeta", numFiles = 4)(_ => ())
    s.sql(
      s"""SELECT CAST(count(*) AS BIGINT) AS n_files,
         |  CAST(sum(mx + 1) AS BIGINT) AS n_rows,
         |  CAST(min(mn) AS BIGINT) AS min_pos,
         |  CAST(max(mn) AS BIGINT) AS max_min_pos
         |FROM (SELECT _file, max(_pos) AS mx, min(_pos) AS mn
         |      FROM $catName.q.orders GROUP BY _file)""".stripMargin)
  }

  /** `_spec_id`/`_partition` through the correctness gate: the
    * identity-partitioned SPJ fixture ingests one batch per status, so
    * every file carries a single partition value — counts grouped by
    * the inspection columns reconstruct exactly from the relational
    * data (all files live under spec 0 with their status value). */
  def lakePartitionMeta(s: SparkSession, d: String): DataFrame = {
    val catName = ensureSpjCatalog(s, d)
    s.sql(
      s"""SELECT CAST(_spec_id AS BIGINT) AS spec_id,
         |  _partition['o_orderstatus'] AS st, count(*) AS n
         |FROM $catName.q.facts
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
  }

  /** Storage-partitioned join through the corpus gate: two lake tables
    * identity-partitioned on the same column, joined on (partition key,
    * row key) under `spark.sql.sources.v2.bucketing.enabled` — the
    * shuffle-free co-located join SpjSpec proves plan-shape for; this
    * entry proves the RESULT through that exact path against the
    * DuckDB relational reconstruction. The SPJ confs ride a cloned
    * session (never leaked into the shared one). */
  private val spjCatalogs = new SessionMemo[String]()

  private def ensureSpjCatalog(s: SparkSession, d: String): String =
    spjCatalogs.getOrBuild(s, d) {
      val src = orders(s, d)
      val wh = Files.createTempDirectory("graft_lakespj_").toString
      val name = s"lakespj_${java.lang.Long.toHexString(System.nanoTime())}"
      s.conf.set(s"spark.sql.catalog.$name", classOf[graft.lake.sql.LakeSqlCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
      s.sql(s"CREATE NAMESPACE $name.q")
      val a = src.select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      val b = src.filter(col("o_totalprice") > 100000.0)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_custkey"))
      s.sql(s"CREATE TABLE $name.q.facts (${a.schema.toDDL}) PARTITIONED BY (o_orderstatus)")
      s.sql(s"CREATE TABLE $name.q.big (${b.schema.toDDL}) PARTITIONED BY (o_orderstatus)")
      val cat = LakeCatalog.open(wh)
      // partition-aligned ingestion (one batch per status, the shape a
      // real pipeline lands): every file carries a single partition
      // value, which is what makes the scan key-groupable — a bulk
      // append that mixes values in one file would decline SPJ
      Seq("F", "O", "P").foreach { st =>
        cat.loadTable("q", "facts").appendData(a.filter(col("o_orderstatus") === st))
        cat.loadTable("q", "big").appendData(b.filter(col("o_orderstatus") === st))
      }
      name
    }

  def lakeCopartitionJoin(s: SparkSession, d: String): DataFrame = {
    val catName = ensureSpjCatalog(s, d)
    val spj = org.apache.spark.sql.graftbridge.SessionBridge.sessionWithConfs(s, Map(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.requireAllClusterKeysForCoPartition" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1"))
    spj.sql(
      s"""SELECT a.o_orderstatus, count(*) AS n,
         |  round(sum(a.o_totalprice), 2) AS sum_price,
         |  sum(b.o_custkey) AS sum_ck
         |FROM $catName.q.facts a JOIN $catName.q.big b
         |  ON a.o_orderstatus = b.o_orderstatus AND a.o_orderkey = b.o_orderkey
         |GROUP BY a.o_orderstatus ORDER BY a.o_orderstatus""".stripMargin)
  }

  /** Dynamic partition pruning through the corpus gate: a partitioned
    * lake fact joined to a small SELECTIVELY FILTERED dim — Spark
    * injects the dim's surviving keys into the lake scan at execution
    * time (SupportsRuntimeV2Filtering) and the file list re-plans to
    * the matching partitions (RuntimeFilterSpec pins the plan shape
    * and pruning; this entry proves the RESULT through that path).
    * Reuses the co-partitioned warehouse: facts is identity-partitioned
    * by o_orderstatus with per-status files, exactly what runtime
    * IN-sets prune. */
  def lakeRuntimeFilterJoin(s: SparkSession, d: String): DataFrame = {
    val catName = ensureSpjCatalog(s, d)
    val dim = orders(s, d).select(col("o_orderstatus")).distinct()
      .withColumn("keep", when(col("o_orderstatus") === "F", 1).otherwise(0))
    dim.createOrReplaceTempView("lake_rtf_dim")
    s.sql(
      s"""SELECT f.o_orderstatus, count(*) AS n,
         |  round(sum(f.o_totalprice), 2) AS sum_price
         |FROM $catName.q.facts f JOIN lake_rtf_dim d
         |  ON f.o_orderstatus = d.o_orderstatus
         |WHERE d.keep = 1
         |GROUP BY f.o_orderstatus ORDER BY f.o_orderstatus""".stripMargin)
  }

  /** Aggregate pushdown: a filterless global COUNT/MIN/MAX over a lake
    * table answers from MANIFEST STATS alone — the physical plan is a
    * driver-local scan, zero data files open, zero tasks launch
    * (AggPushdownSpec proves the plan shape and that the answer
    * survives deleting every data file). At 100 TB this is a metadata
    * lookup standing in for a full-table scan. Shares the read-only
    * lakesql table (appends only — no tombstones, so pushdown fires). */
  def lakeAggPushdown(s: SparkSession, d: String): DataFrame = {
    val catName = sqlOrdersCatalog(sqlCatalogs, s, d, "lakesql")(_ => ())
    s.sql(
      s"""SELECT count(*) AS n_rows, count(o_orderstatus) AS n_status,
         |  min(o_orderkey) AS min_key, max(o_orderkey) AS max_key,
         |  min(o_orderdate) AS min_date, max(o_orderdate) AS max_date
         |FROM $catName.q.orders""".stripMargin)
  }

  /** SQL row-level mutation end-to-end: DDL + append, then DELETE FROM
    * through the DSv2 SupportsDelete path (strict predicate conversion →
    * the transactional copy-on-write delete), read back with spark.sql.
    * Memoized like [[lakeSqlSelect]]; the mutation sequence is
    * deterministic, so re-invocations just re-run the SELECT. */
  private val sqlDeleteCatalogs = new SessionMemo[String]()

  def lakeSqlDelete(s: SparkSession, d: String): DataFrame = {
    val catName = sqlOrdersCatalog(sqlDeleteCatalogs, s, d, "lakesqldel",
      numFiles = 4) { name =>
      s.sql(s"DELETE FROM $name.q.orders " +
        "WHERE o_totalprice < 50000.0 OR o_orderstatus = 'F'")
      ()
    }
    s.sql(
      s"""SELECT o_orderstatus, count(*) AS n,
         |  round(sum(o_totalprice), 2) AS sum_price,
         |  min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
         |FROM $catName.q.orders
         |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
  }

  /** SQL UPDATE through the [[graft.lake.sql.LakeSqlExtensions]] rule:
    * a copy-on-write rewrite of only the stats-overlapping files, then
    * an aggregation read-back whose oracle applies the same CASE. */
  private val sqlUpdateCatalogs = new SessionMemo[String]()

  def lakeSqlUpdate(s: SparkSession, d: String): DataFrame = {
    val catName = sqlOrdersCatalog(sqlUpdateCatalogs, s, d, "lakesqlupd",
      numFiles = 4) { name =>
      s.sql(s"UPDATE $name.q.orders SET o_totalprice = o_totalprice * 2, " +
        "o_orderpriority = '1-BUMPED' WHERE o_orderstatus = 'F'")
      ()
    }
    s.sql(
      s"""SELECT o_orderstatus, o_orderpriority, count(*) AS n,
         |  round(sum(o_totalprice), 2) AS sum_price
         |FROM $catName.q.orders
         |GROUP BY o_orderstatus, o_orderpriority
         |ORDER BY o_orderstatus, o_orderpriority""".stripMargin)
  }

  /** SQL MERGE INTO (canonical upsert) through the extensions rule:
    * keyed copy-on-write merge — updated prices for every 10th order +
    * inserted clones under shifted keys, mirroring [[lakeMergeUpsert]]
    * so the same oracle shape verifies the SQL path. */
  private val sqlMergeCatalogs = new SessionMemo[String]()

  def lakeSqlMerge(s: SparkSession, d: String): DataFrame = {
    val catName = sqlOrdersCatalog(sqlMergeCatalogs, s, d, "lakesqlmrg",
      numFiles = 4) { name =>
      orders(s, d).filter(col("o_orderkey") % 10 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 2)
        .createOrReplaceTempView("lake_sql_merge_src_upd")
      s.sql(
        s"""MERGE INTO $name.q.orders AS t USING (
           |  SELECT * FROM lake_sql_merge_src_upd
           |  UNION ALL
           |  SELECT o_orderkey + 100000000 AS o_orderkey, o_custkey,
           |    o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
           |  FROM lake_sql_merge_src_upd
           |) AS s
           |ON t.o_orderkey = s.o_orderkey
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      ()
    }
    s.sql(s"SELECT * FROM $catName.q.orders ORDER BY o_orderkey")
  }

  /** UPDATE/DELETE with SUBQUERY conditions (round 12): an UPDATE whose
    * WHERE combines an uncorrelated `IN (GROUP BY … HAVING …)` subquery
    * with a plain residual conjunct, then a DELETE keyed by a
    * correlated EXISTS — both decorrelated onto the flagged
    * copy-on-write rewrite ([[graft.lake.LakeTable.updateWhereFlagged]]):
    * the subquery joins as a DISTINCT key set against only the pruned
    * file read, row multiplicity preserved. Oracle reconstructs both
    * mutations relationally. */
  private val sqlUpdSubqCatalogs = new SessionMemo[String]()

  def lakeSqlUpdateSubquery(s: SparkSession, d: String): DataFrame = {
    val catName = sqlOrdersCatalog(sqlUpdSubqCatalogs, s, d, "lakesqlsubq",
      numFiles = 4) { name =>
      orders(s, d).createOrReplaceTempView("lake_subq_orders_in")
      s.sql(
        s"""UPDATE $name.q.orders SET o_orderpriority = '7-HOT'
           |WHERE o_custkey IN (SELECT o_custkey FROM lake_subq_orders_in
           |                    GROUP BY o_custkey HAVING count(*) >= 8)
           |  AND o_orderstatus = 'O'""".stripMargin)
      s.sql("SELECT o_orderkey AS k FROM lake_subq_orders_in WHERE o_orderkey % 100 = 0")
        .createOrReplaceTempView("lake_subq_dead_keys")
      s.sql(
        s"""DELETE FROM $name.q.orders
           |WHERE EXISTS (SELECT 1 FROM lake_subq_dead_keys x
           |              WHERE x.k = o_orderkey)""".stripMargin)
      ()
    }
    s.sql(s"SELECT * FROM $catName.q.orders ORDER BY o_orderkey")
  }

  /** Correlated scalar aggregates in UPDATE/DELETE WHERE (round 13 —
    * previously a loud refusal): `WHERE (SELECT count(*) … WHERE inner
    * = outer) = 1` and `WHERE price = (SELECT max(…) …)` decorrelate
    * onto a per-key aggregate left-joined against the touched-files
    * read. The inner source is restricted to EVEN order keys so both
    * empty-group semantics appear under the oracle: count over an
    * empty group reads 0 (the decorrelation count-bug, fixed by the
    * on-empty-relation default), max reads NULL (comparison unknown →
    * no match). max/count only — integer-exact selection aggregates,
    * never a double sum. */
  private val sqlCorrAggCatalogs = new SessionMemo[String]()

  def lakeSqlUpdateCorrAgg(s: SparkSession, d: String): DataFrame = {
    val catName = sqlOrdersCatalog(sqlCorrAggCatalogs, s, d, "lakesqlcagg",
      numFiles = 4) { name =>
      orders(s, d).filter(col("o_orderkey") % 2 === 0)
        .createOrReplaceTempView("lake_corr_evens")
      s.sql(
        s"""UPDATE $name.q.orders t SET o_orderpriority = '8-SOLO'
           |WHERE (SELECT count(*) FROM lake_corr_evens o2
           |       WHERE o2.o_custkey = t.o_custkey) = 1""".stripMargin)
      s.sql(
        s"""DELETE FROM $name.q.orders t
           |WHERE o_orderstatus = 'F' AND o_totalprice =
           |  (SELECT max(o2.o_totalprice) FROM lake_corr_evens o2
           |   WHERE o2.o_custkey = t.o_custkey)""".stripMargin)
      ()
    }
    s.sql(s"SELECT * FROM $catName.q.orders ORDER BY o_orderkey")
  }

  /** Array/map ELEMENT paths in UPDATE / MERGE SET (round 13 —
    * previously a loud refusal): `SET tags[1] = v`, `SET m['k'] = v`
    * lower through [[graft.lake.sql.ElementAssignmentParser]] onto the
    * [[graft.lake.sql.LakeElementSet]] whole-root rebuild and ride the
    * existing CoW application sites unchanged. Exercises in-bounds
    * array replace, map update-in-place, map upsert-append,
    * out-of-bounds no-op, and a MERGE-clause element SET; the oracle
    * reconstructs the final table relationally from `documents`. */
  private val sqlElemCatalogs = new SessionMemo[String]()

  def lakeSqlUpdateElement(s: SparkSession, d: String): DataFrame = {
    val catName = sqlElemCatalogs.getOrBuild(s, d) {
      val wh = Files.createTempDirectory("graft_lakesqlel_").toString
      val name = s"lakesqlel_${java.lang.Long.toHexString(System.nanoTime())}"
      s.conf.set(s"spark.sql.catalog.$name", classOf[graft.lake.sql.LakeSqlCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
      s.sql(s"CREATE NAMESPACE $name.q")
      val src = documents(s, d).select(col("doc_id"),
        expr("slice(split(text, ' '), 1, 3)").as("tags"),
        map(lit("n"), size(split(col("text"), " ")).cast("long"),
          lit("v"), col("doc_id")).as("meta"),
        array(col("doc_id"), col("doc_id") * 2, col("doc_id") * 3).as("scores"))
      s.sql(s"CREATE TABLE $name.q.docs (${src.schema.toDDL})")
      LakeCatalog.open(wh).loadTable("q", "docs").appendData(src, 4)
      s.sql(s"UPDATE $name.q.docs SET tags[1] = 'X' WHERE doc_id % 3 = 0")
      s.sql(s"UPDATE $name.q.docs SET meta['n'] = meta['n'] + 100 WHERE doc_id % 4 = 0")
      s.sql(s"UPDATE $name.q.docs SET meta['new'] = doc_id WHERE doc_id % 5 = 0")
      // scores has exactly 3 elements: index 7 is the out-of-bounds
      // row-preserving no-op
      s.sql(s"UPDATE $name.q.docs SET scores[7] = -1 WHERE doc_id % 7 = 0")
      documents(s, d).select(col("doc_id")).filter(col("doc_id") % 6 === 0)
        .createOrReplaceTempView("lake_elem_merge_src")
      s.sql(
        s"""MERGE INTO $name.q.docs t USING lake_elem_merge_src m
           |ON t.doc_id = m.doc_id
           |WHEN MATCHED THEN UPDATE SET t.tags[0] = 'M'""".stripMargin)
      name
    }
    // Collections are projected to deterministic STRINGS for the gate:
    // the driver's row-sort comparator cannot hash raw array/map cells
    // (round-13 `err`). Sorted-key k=v join for the map; comma join for
    // the arrays — the q_array_funcs head3 precedent.
    s.sql(
      s"""SELECT doc_id,
         |  concat_ws(',', tags) AS tags,
         |  concat_ws(',', transform(array_sort(map_keys(meta)),
         |    k -> concat(k, '=', CAST(meta[k] AS STRING)))) AS meta,
         |  concat_ws(',', scores) AS scores
         |FROM $catName.q.docs ORDER BY doc_id""".stripMargin)
  }

  /** FULL-grammar SQL MERGE (round 12): ONE CDC batch carrying
    * conditioned deletes (`WHEN MATCHED AND s.op='D' THEN DELETE`),
    * conditioned updates, filtered partial inserts AND a
    * NOT-MATCHED-BY-SOURCE re-prioritization — the general WHEN grammar
    * routed through the conditional copy-on-write merge
    * ([[graft.lake.LakeTable.mergeIntoConditional]]): one full-outer
    * join over only the key-bounds/condition-overlapping files, one
    * atomic serializable commit. The oracle reconstructs the final
    * table relationally from the same input. */
  private val sqlMergeFullCatalogs = new SessionMemo[String]()

  def lakeSqlMergeFull(s: SparkSession, d: String): DataFrame = {
    val catName = sqlOrdersCatalog(sqlMergeFullCatalogs, s, d, "lakesqlmrgf",
      numFiles = 4) { name =>
      val src = orders(s, d)
      src.filter(col("o_orderkey") % 10 === 0)
        .select(col("o_orderkey"), col("o_totalprice"), lit("D").as("op"))
        .unionByName(src.filter(col("o_orderkey") % 10 === 3)
          .select(col("o_orderkey"),
            (col("o_totalprice") * 2).as("o_totalprice"), lit("U").as("op")))
        .unionByName(src.filter(col("o_orderkey") % 10 === 7)
          .select((col("o_orderkey") + 100000000L).as("o_orderkey"),
            col("o_totalprice"), lit("I").as("op")))
        .createOrReplaceTempView("lake_sql_merge_full_src")
      s.sql(
        s"""MERGE INTO $name.q.orders AS t USING lake_sql_merge_full_src AS s
           |ON t.o_orderkey = s.o_orderkey
           |WHEN MATCHED AND s.op = 'D' THEN DELETE
           |WHEN MATCHED THEN UPDATE SET o_totalprice = s.o_totalprice,
           |  o_orderpriority = '5-MERGED'
           |WHEN NOT MATCHED AND s.op = 'I' THEN INSERT (o_orderkey, o_custkey,
           |  o_orderstatus, o_totalprice, o_orderpriority)
           |  VALUES (s.o_orderkey, CAST(-1 AS BIGINT), 'I', s.o_totalprice,
           |          '0-NEW')
           |WHEN NOT MATCHED BY SOURCE AND t.o_orderstatus = 'F'
           |  AND t.o_totalprice > 300000.0 THEN
           |  UPDATE SET o_orderpriority = '9-STALE'""".stripMargin)
      ()
    }
    s.sql(s"SELECT * FROM $catName.q.orders ORDER BY o_orderkey")
  }

  /** MERGE-ON-READ twin of [[lakeSqlMergeFull]]: identical CDC batch on
    * a `write.merge.mode=merge-on-read` table — ONE commit of
    * positional tombstones for only the affected rows plus the
    * updated/inserted data files
    * ([[graft.lake.LakeTable.mergeIntoConditionalMoR]]); KEEP rows cost
    * nothing. Shares lakeSqlMergeFull's oracle, so the gate proves the
    * CoW and MoR strategies produce identical answers for the FULL
    * grammar. */
  private val sqlMergeFullMorCatalogs = new SessionMemo[String]()

  def lakeSqlMergeFullMor(s: SparkSession, d: String): DataFrame = {
    val catName = sqlOrdersCatalog(sqlMergeFullMorCatalogs, s, d, "lakesqlmrgfm",
      numFiles = 4) { name =>
      s.sql(s"ALTER TABLE $name.q.orders SET TBLPROPERTIES(" +
        "'write.merge.mode'='merge-on-read')")
      val src = orders(s, d)
      src.filter(col("o_orderkey") % 10 === 0)
        .select(col("o_orderkey"), col("o_totalprice"), lit("D").as("op"))
        .unionByName(src.filter(col("o_orderkey") % 10 === 3)
          .select(col("o_orderkey"),
            (col("o_totalprice") * 2).as("o_totalprice"), lit("U").as("op")))
        .unionByName(src.filter(col("o_orderkey") % 10 === 7)
          .select((col("o_orderkey") + 100000000L).as("o_orderkey"),
            col("o_totalprice"), lit("I").as("op")))
        .createOrReplaceTempView("lake_sql_merge_full_mor_src")
      s.sql(
        s"""MERGE INTO $name.q.orders AS t USING lake_sql_merge_full_mor_src AS s
           |ON t.o_orderkey = s.o_orderkey
           |WHEN MATCHED AND s.op = 'D' THEN DELETE
           |WHEN MATCHED THEN UPDATE SET o_totalprice = s.o_totalprice,
           |  o_orderpriority = '5-MERGED'
           |WHEN NOT MATCHED AND s.op = 'I' THEN INSERT (o_orderkey, o_custkey,
           |  o_orderstatus, o_totalprice, o_orderpriority)
           |  VALUES (s.o_orderkey, CAST(-1 AS BIGINT), 'I', s.o_totalprice,
           |          '0-NEW')
           |WHEN NOT MATCHED BY SOURCE AND t.o_orderstatus = 'F'
           |  AND t.o_totalprice > 300000.0 THEN
           |  UPDATE SET o_orderpriority = '9-STALE'""".stripMargin)
      ()
    }
    s.sql(s"SELECT * FROM $catName.q.orders ORDER BY o_orderkey")
  }

  /** SQL read over LIVE merge-on-read tombstones: a positional delete
    * (deleteWhereMoR) and an equality-delete upsert (mergeIntoMoR) are
    * both live — never compacted — when spark.sql reads the table, so
    * the gate proves the analyzer substitution
    * ([[graft.lake.sql.LakeMoRScanSubstitution]]) subtracts both
    * tombstone kinds through SQL exactly as the Scala API does. The
    * merge source is restricted to delete survivors so the oracle is a
    * single WHERE + CASE over the input. */
  private val sqlMorCatalogs = new SessionMemo[String]()

  def lakeSqlMor(s: SparkSession, d: String): DataFrame = {
    val catName = sqlOrdersCatalog(sqlMorCatalogs, s, d, "lakesqlmor",
      numFiles = 4) { name =>
      val t = LakeCatalog.open(s.conf.get(s"spark.sql.catalog.$name.warehouse"))
        .loadTable("q", "orders")
      t.deleteWhereMoR(s, LakePredicate.Ge("o_totalprice", Double.box(400000.0)))
      val upd = orders(s, d)
        .filter(col("o_orderkey") % 10 === 0 && col("o_totalprice") < 400000.0)
        .withColumn("o_totalprice", col("o_totalprice") * 2)
      t.refresh().mergeIntoMoR(s, upd, Seq("o_orderkey"))
      ()
    }
    s.sql(s"SELECT * FROM $catName.q.orders ORDER BY o_orderkey")
  }

  /** SQL RENAME TABLE under the oracle gate: two append commits, then
    * `ALTER TABLE … RENAME TO`, then ONE result that reads the renamed
    * name twice — the current table AND `VERSION AS OF` the first
    * snapshot — so the gate verifies both that the rename is a pure
    * metadata pointer swap (full data under the new name) and that
    * time travel survives it (reference: a JDBC-catalog rename moves
    * the name→location row, never the data, LocalIcebergCatalog.java:99-142). */
  private val sqlRenameCatalogs = new SessionMemo[String]()

  def lakeRenameTable(s: SparkSession, d: String): DataFrame = {
    val memo = sqlRenameCatalogs.getOrBuild(s, d) {
      val src = orders(s, d)
      val wh = Files.createTempDirectory("graft_lakesqlrnt_").toString
      val name = s"lakesqlrnt_${java.lang.Long.toHexString(System.nanoTime())}"
      s.conf.set(s"spark.sql.catalog.$name", classOf[graft.lake.sql.LakeSqlCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
      s.sql(s"CREATE NAMESPACE $name.q")
      s.sql(s"CREATE TABLE $name.q.orders (${src.schema.toDDL})")
      val t = LakeCatalog.open(wh).loadTable("q", "orders")
      val first = t.appendData(src.filter(col("o_orderkey") % 2 === 0))
      t.refresh().appendData(src.filter(col("o_orderkey") % 2 === 1))
      s.sql(s"ALTER TABLE $name.q.orders RENAME TO $name.q.orders_renamed")
      s"$name ${first.snapshotId}"
    }
    val Array(catName, snap) = memo.split(' ')
    s.sql(
      s"""SELECT 'current' AS view, * FROM $catName.q.orders_renamed
         |UNION ALL
         |SELECT 'v1' AS view, * FROM $catName.q.orders_renamed VERSION AS OF $snap
         |ORDER BY view, o_orderkey""".stripMargin)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "lake_rename_table" -> lakeRenameTable,
    "lake_sql_mor" -> lakeSqlMor,
    "lake_sql_update" -> lakeSqlUpdate,
    "lake_sql_merge" -> lakeSqlMerge,
    "lake_sql_merge_full" -> lakeSqlMergeFull,
    "lake_sql_merge_full_mor" -> lakeSqlMergeFullMor,
    "lake_sql_update_subquery" -> lakeSqlUpdateSubquery,
    "lake_sql_update_element" -> lakeSqlUpdateElement,
    "lake_sql_update_corr_agg" -> lakeSqlUpdateCorrAgg,
    "lake_sql_delete" -> lakeSqlDelete,
    "lake_maintenance" -> lakeMaintenance,
    "lake_rename" -> lakeRename,
    "lake_nested_evolution" -> lakeNestedEvolution,
    "lake_changes" -> lakeChanges,
    "lake_sql_select" -> lakeSqlSelect,
    "lake_view" -> lakeView,
    "lake_inspect" -> lakeInspect,
    "lake_ctas" -> lakeCtas,
    "lake_metadata_cols" -> lakeMetadataCols,
    "lake_partition_meta" -> lakePartitionMeta,
    "lake_copartition_join" -> lakeCopartitionJoin,
    "lake_runtime_filter" -> lakeRuntimeFilterJoin,
    "lake_roundtrip" -> lakeRoundtrip,
    "lake_uri_roundtrip" -> lakeUriRoundtrip,
    "lake_spec_evolution" -> lakeSpecEvolution,
    "lake_time_travel" -> lakeTimeTravel,
    "lake_prune" -> lakePrune,
    "lake_zorder" -> lakeZorder,
    "lake_rollback" -> lakeRollback,
    "lake_stream_read" -> lakeStreamRead,
    "lake_stream_sink" -> lakeStreamSink,
    "lake_wap" -> lakeWap,
    "lake_compact" -> lakeCompact,
    "lake_delete_cow" -> lakeDeleteCow,
    "lake_delete_mor" -> lakeDeleteMor,
    "lake_delete_dv" -> lakeDeleteDv,
    "lake_row_lineage" -> lakeRowLineage,
    "lake_incr_mv" -> lakeIncrMv,
    "lake_incr_mv_filtered" -> lakeIncrMvFiltered,
    "lake_incr_mv_avg" -> lakeIncrMvAvg,
    "lake_incr_mv_dim" -> lakeIncrMvDim,
    "lake_incr_mv_star" -> lakeIncrMvStar,
    "lake_incr_mv_distinct" -> lakeIncrMvDistinct,
    "lake_mv_rewrite" -> lakeMvRewrite,
    "q_ev_variant" -> qEvVariant,
    "lake_rewrite_deletes" -> lakeRewriteDeletes,
    "lake_add_files" -> lakeAddFiles,
    "lake_column_defaults" -> lakeColumnDefaults,
    "lake_element_evolution" -> lakeElementEvolution,
    "lake_element_widen" -> lakeElementWiden,
    "lake_analyze" -> lakeAnalyze,
    "lake_changelog" -> lakeChangelog,
    "lake_changelog_stream" -> lakeChangelogStream,
    "lake_replace_where" -> lakeReplaceWhere,
    "lake_agg_pushdown" -> lakeAggPushdown,
    "lake_branch_mutations" -> lakeBranchMutations,
    "lake_sql_wap" -> lakeSqlWap,
    "lake_update_cow" -> lakeUpdateCow,
    "lake_update_mor" -> lakeUpdateMor,
    "lake_merge_upsert" -> lakeMergeUpsert,
    "lake_merge_mor" -> lakeMergeMor,
  )

  private val oracles0: Map[String, String] = Map(
    // ids reconstruct from the data alone: batch 1 = even keys sorted
    // (ids 0..n_even−1), batch 2 = odd keys sorted (ids n_even..);
    // the DV delete filters rows but never moves an id, and neither do
    // the compaction (materialized carry-through) nor the CoW delete
    // after it (re-carried) — only their row filters show in the oracle
    "lake_row_lineage" ->
      """WITH ids AS (
        |  SELECT o_orderkey, o_totalprice,
        |    row_number() OVER (ORDER BY o_orderkey) - 1 AS row_id
        |  FROM orders WHERE o_orderkey % 2 = 0
        |  UNION ALL
        |  SELECT o_orderkey, o_totalprice,
        |    (SELECT count(*) FROM orders WHERE o_orderkey % 2 = 0)
        |      + row_number() OVER (ORDER BY o_orderkey) - 1 AS row_id
        |  FROM orders WHERE o_orderkey % 2 = 1
        |)
        |SELECT o_orderkey, CAST(row_id AS BIGINT) AS row_id
        |FROM ids WHERE o_totalprice < 400000.0 AND o_totalprice >= 30000.0
        |ORDER BY o_orderkey""".stripMargin,
    // the view after: survivors of the price delete, plus the appended
    // key%10=7 copies (appended AFTER the delete, so unfiltered), with
    // the F-status re-prioritization applied to the final row set
    "lake_incr_mv" ->
      """WITH finalrows AS (
        |  SELECT CASE WHEN o_orderstatus = 'F' THEN '9-MOVED'
        |              ELSE o_orderpriority END AS o_orderpriority,
        |    o_totalprice
        |  FROM orders WHERE o_totalprice < 400000.0
        |  UNION ALL
        |  SELECT CASE WHEN o_orderstatus = 'F' THEN '9-MOVED'
        |              ELSE o_orderpriority END AS o_orderpriority,
        |    o_totalprice
        |  FROM orders WHERE o_orderkey % 10 = 7
        |)
        |SELECT o_orderpriority, count(*) AS cnt,
        |  CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS cents,
        |  CAST(min(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS min_cents,
        |  CAST(max(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS max_cents
        |FROM finalrows GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    // the FILTERED view after: price-delete survivors, low-price rows
    // moved INTO the status-F filter by the update, rolled up over
    // status-F rows only
    "lake_incr_mv_filtered" ->
      """WITH finalrows AS (
        |  SELECT o_orderpriority, o_totalprice,
        |    CASE WHEN o_totalprice <= 50000.0 THEN 'F'
        |         ELSE o_orderstatus END AS o_orderstatus
        |  FROM orders WHERE o_totalprice < 400000.0
        |)
        |SELECT o_orderpriority, count(*) AS cnt,
        |  CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS cents,
        |  CAST(min(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS min_cents,
        |  CAST(max(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS max_cents
        |FROM finalrows WHERE o_orderstatus = 'F'
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    // the dim-enriched MV after: >=400k delete survivors, F-rows moved
    // to '9-MOVED' (absent from the dim at refresh, present after the
    // dim append + rebuild), joined against the relationally-rebuilt
    // dim and rolled up by the dim-side class
    "lake_incr_mv_dim" ->
      """WITH finalrows AS (
        |  SELECT CASE WHEN o_orderstatus = 'F' THEN '9-MOVED'
        |              ELSE o_orderpriority END AS o_orderpriority,
        |    CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders WHERE o_totalprice < 400000.0
        |), dim AS (
        |  SELECT o_orderpriority,
        |    CASE WHEN o_orderpriority < '3' THEN 'HOT'
        |         ELSE 'COLD' END AS prio_class
        |  FROM (SELECT DISTINCT o_orderpriority FROM orders)
        |  UNION ALL SELECT '9-MOVED', 'COLD'
        |)
        |SELECT prio_class, count(*) AS cnt,
        |  CAST(sum(cents) AS BIGINT) AS cents,
        |  CAST(max(cents) AS BIGINT) AS max_cents
        |FROM finalrows JOIN dim USING (o_orderpriority)
        |GROUP BY prio_class ORDER BY prio_class""".stripMargin,
    // the star MV after: >=400k delete survivors joined against BOTH
    // relationally-reconstructed dims (the Z-NEW status never matches
    // a base row; the rebuild re-pins it without changing contents)
    "lake_incr_mv_star" ->
      """WITH finalrows AS (
        |  SELECT o_orderpriority, o_orderstatus,
        |    CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders WHERE o_totalprice < 400000.0
        |), pdim AS (
        |  SELECT o_orderpriority,
        |    CASE WHEN o_orderpriority < '3' THEN 'HOT'
        |         ELSE 'COLD' END AS prio_class
        |  FROM (SELECT DISTINCT o_orderpriority FROM orders)
        |), sdim AS (
        |  SELECT o_orderstatus,
        |    CASE WHEN o_orderstatus = 'F' THEN 'DONE'
        |         ELSE 'OPEN' END AS status_class
        |  FROM (SELECT DISTINCT o_orderstatus FROM orders)
        |)
        |SELECT prio_class, status_class, count(*) AS cnt,
        |  CAST(sum(cents) AS BIGINT) AS cents,
        |  CAST(max(cents) AS BIGINT) AS max_cents
        |FROM finalrows JOIN pdim USING (o_orderpriority)
        |  JOIN sdim USING (o_orderstatus)
        |GROUP BY prio_class, status_class
        |ORDER BY prio_class, status_class""".stripMargin,
    // the distinct MV after the full mutation replay: append %10=3
    // repeats, CoW-delete >=400k, then the MoR upsert moving %10=6
    // sub-400k rows to priority 9-UP with shifted custkeys — native
    // count(DISTINCT) over the reconstructed final rows
    "lake_incr_mv_distinct" ->
      """WITH finalrows AS (
        |  SELECT CASE WHEN o_orderkey % 10 = 6 THEN '9-UP'
        |              ELSE o_orderpriority END AS o_orderpriority,
        |    CASE WHEN o_orderkey % 10 = 6 THEN o_custkey + 10000000
        |         ELSE o_custkey END AS o_custkey,
        |    CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders WHERE o_totalprice < 400000.0
        |  UNION ALL
        |  SELECT o_orderpriority, o_custkey,
        |    CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders
        |  WHERE o_orderkey % 10 = 3 AND o_totalprice < 400000.0
        |)
        |SELECT o_orderpriority, count(*) AS cnt,
        |  CAST(sum(cents) AS BIGINT) AS cents,
        |  count(DISTINCT o_custkey) AS n_cust
        |FROM finalrows GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    // the transparently-rewritten aggregates: both shapes recompute
    // over the delete survivors — the values the VIEW serves must be
    // indistinguishable from the direct rollup
    "lake_mv_rewrite" ->
      """WITH finalrows AS (
        |  SELECT o_orderpriority,
        |    CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders WHERE o_totalprice < 400000.0
        |)
        |SELECT 'by_prio' AS shape, o_orderpriority, count(*) AS cnt,
        |  CAST(sum(cents) AS BIGINT) AS cents,
        |  CAST(max(cents) AS BIGINT) AS max_cents
        |FROM finalrows GROUP BY o_orderpriority
        |UNION ALL
        |SELECT 'total' AS shape, 'ALL' AS o_orderpriority,
        |  count(*) AS cnt, CAST(sum(cents) AS BIGINT) AS cents,
        |  CAST(max(cents) AS BIGINT) AS max_cents
        |FROM finalrows
        |ORDER BY shape, o_orderpriority""".stripMargin,
    // the derived-output MV after: status-F delete survivors plus the
    // appended %10=3 copies (appended AFTER the delete, so their F rows
    // survive); avg doubles recomputed with the engine's exact spelling
    // — every float input is the same exact integer on both sides
    "lake_incr_mv_avg" ->
      """WITH finalrows AS (
        |  SELECT o_orderkey, o_orderpriority,
        |    CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders WHERE o_orderstatus <> 'F'
        |  UNION ALL
        |  SELECT o_orderkey + 500000000, o_orderpriority,
        |    CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders WHERE o_orderkey % 10 = 3
        |)
        |SELECT o_orderpriority, count(*) AS cnt,
        |  (CAST(sum(cents) AS DOUBLE) / 100.0)
        |    / CAST(count(*) AS DOUBLE) AS avg_price,
        |  CAST(sum(cents) AS BIGINT) AS total_cents,
        |  CAST(sum(o_orderkey) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) AS avg_key
        |FROM finalrows GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    // the variant life cycle's surviving rows: MoR-deleted 'view' rows
    // gone, 'error' rows' variant cells rewritten to {"k": -1} by the
    // CoW update, everything else extracting the original props.k
    "q_ev_variant" ->
      """WITH rows0 AS (
        |  SELECT event_type,
        |    CASE WHEN event_type = 'error' THEN CAST(-1 AS BIGINT)
        |         ELSE CAST(json_extract_string(props, '$.k') AS BIGINT)
        |    END AS k
        |  FROM events WHERE event_type <> 'view'
        |)
        |SELECT event_type, count(*) AS n,
        |  CAST(sum(k) AS BIGINT) AS sum_k,
        |  CAST(min(k) AS BIGINT) AS min_k,
        |  CAST(max(k) AS BIGINT) AS max_k
        |FROM rows0 GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
    // correlated scalar aggregates over the EVEN-key inner domain:
    // count()=1 → '8-SOLO' (absent key counts 0); then F-orders at
    // their customer's even-max price die (absent key → NULL → keep)
    "lake_sql_update_corr_agg" ->
      """WITH ev AS (
        |  SELECT o_custkey, count(*) AS n, max(o_totalprice) AS mx
        |  FROM orders WHERE o_orderkey % 2 = 0 GROUP BY 1
        |)
        |SELECT o.o_orderkey, o.o_custkey, o.o_orderstatus, o.o_totalprice,
        |  o.o_orderdate,
        |  CASE WHEN coalesce(ev.n, 0) = 1 THEN '8-SOLO'
        |       ELSE o.o_orderpriority END AS o_orderpriority
        |FROM orders o LEFT JOIN ev USING (o_custkey)
        |WHERE NOT coalesce(o.o_orderstatus = 'F'
        |                   AND o.o_totalprice = ev.mx, false)
        |ORDER BY o_orderkey""".stripMargin,
    // element-path UPDATE/MERGE SET: tags[1]='X' (%3), meta['n']+=100
    // (%4), meta['new'] upsert-append (%5), scores[7] OOB no-op (%7),
    // MERGE tags[0]='M' (%6) — reconstructed relationally
    "lake_sql_update_element" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    string_split(text, ' ')[1:3] AS tags0,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n0
        |  FROM documents
        |)
        |SELECT doc_id,
        |  array_to_string(list_transform(generate_series(1, len(tags0)),
        |    j -> CASE WHEN j = 1 AND doc_id % 6 = 0 THEN 'M'
        |              WHEN j = 2 AND doc_id % 3 = 0 THEN 'X'
        |              ELSE tags0[j] END), ',') AS tags,
        |  'n=' || CAST(CASE WHEN doc_id % 4 = 0 THEN n0 + 100 ELSE n0 END
        |               AS VARCHAR)
        |    || CASE WHEN doc_id % 5 = 0
        |            THEN ',new=' || CAST(doc_id AS VARCHAR) ELSE '' END
        |    || ',v=' || CAST(doc_id AS VARCHAR) AS meta,
        |  array_to_string([doc_id, doc_id * 2, doc_id * 3], ',') AS scores
        |FROM base ORDER BY doc_id""".stripMargin,
    // matched D-rows (key%10=0) delete; matched U-rows (key%10=3) take the
    // doubled price + '5-MERGED'; I-rows insert under shifted keys with
    // NULL o_orderdate (partial INSERT); every row the source does NOT
    // match (key%10 ∉ {0,3}) re-prioritizes to '9-STALE' when it is an
    // expensive 'F' order (the NOT MATCHED BY SOURCE clause)
    // UPDATE: 'O'-status orders of customers with ≥ 8 orders re-prioritize;
    // DELETE: every 100th key dies via the correlated EXISTS
    "lake_sql_update_subquery" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
        |  CASE WHEN o_orderstatus = 'O' AND o_custkey IN (
        |         SELECT o_custkey FROM orders GROUP BY o_custkey
        |         HAVING count(*) >= 8)
        |       THEN '7-HOT' ELSE o_orderpriority END AS o_orderpriority
        |FROM orders WHERE o_orderkey % 100 <> 0
        |ORDER BY o_orderkey""".stripMargin,
    "lake_sql_merge_full_mor" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus,
        |  CASE WHEN o_orderkey % 10 = 3 THEN o_totalprice * 2
        |       ELSE o_totalprice END AS o_totalprice,
        |  o_orderdate,
        |  CASE WHEN o_orderkey % 10 = 3 THEN '5-MERGED'
        |       WHEN o_orderkey % 10 NOT IN (0, 3) AND o_orderstatus = 'F'
        |            AND o_totalprice > 300000.0 THEN '9-STALE'
        |       ELSE o_orderpriority END AS o_orderpriority
        |FROM orders WHERE o_orderkey % 10 <> 0
        |UNION ALL
        |SELECT o_orderkey + 100000000, CAST(-1 AS BIGINT), 'I', o_totalprice,
        |  CAST(NULL AS TIMESTAMP), '0-NEW'
        |FROM orders WHERE o_orderkey % 10 = 7
        |ORDER BY o_orderkey""".stripMargin,
    // same oracle as the MoR twin above: CoW and MoR must agree exactly
    "lake_sql_merge_full" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus,
        |  CASE WHEN o_orderkey % 10 = 3 THEN o_totalprice * 2
        |       ELSE o_totalprice END AS o_totalprice,
        |  o_orderdate,
        |  CASE WHEN o_orderkey % 10 = 3 THEN '5-MERGED'
        |       WHEN o_orderkey % 10 NOT IN (0, 3) AND o_orderstatus = 'F'
        |            AND o_totalprice > 300000.0 THEN '9-STALE'
        |       ELSE o_orderpriority END AS o_orderpriority
        |FROM orders WHERE o_orderkey % 10 <> 0
        |UNION ALL
        |SELECT o_orderkey + 100000000, CAST(-1 AS BIGINT), 'I', o_totalprice,
        |  CAST(NULL AS TIMESTAMP), '0-NEW'
        |FROM orders WHERE o_orderkey % 10 = 7
        |ORDER BY o_orderkey""".stripMargin,
    "lake_rename_table" ->
      """SELECT 'current' AS view, * FROM orders
        |UNION ALL
        |SELECT 'v1' AS view, * FROM orders WHERE o_orderkey % 2 = 0
        |ORDER BY view, o_orderkey""".stripMargin,
    // MoR delete removes price >= 400000; the live-tombstone upsert
    // doubles every surviving 10th key's price
    "lake_sql_mor" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus,
        |  CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice * 2
        |       ELSE o_totalprice END AS o_totalprice,
        |  o_orderdate, o_orderpriority
        |FROM orders WHERE o_totalprice < 400000.0
        |ORDER BY o_orderkey""".stripMargin,
    "lake_sql_update" ->
      """SELECT o_orderstatus,
        |  CASE WHEN o_orderstatus = 'F' THEN '1-BUMPED'
        |       ELSE o_orderpriority END AS o_orderpriority,
        |  count(*) AS n,
        |  round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice * 2
        |                 ELSE o_totalprice END), 2) AS sum_price
        |FROM orders
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "lake_sql_merge" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus,
        |  CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice * 2
        |       ELSE o_totalprice END AS o_totalprice,
        |  o_orderdate, o_orderpriority
        |FROM orders
        |UNION ALL
        |SELECT o_orderkey + 100000000, o_custkey, o_orderstatus,
        |  o_totalprice * 2, o_orderdate, o_orderpriority
        |FROM orders WHERE o_orderkey % 10 = 0
        |ORDER BY o_orderkey""".stripMargin,
    // DELETE removes rows where the condition is TRUE; the corpus has no
    // NULLs in these columns, so NOT(...) is the exact survivor set
    "lake_sql_delete" ->
      """SELECT o_orderstatus, count(*) AS n,
        |  round(sum(o_totalprice), 2) AS sum_price,
        |  min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
        |FROM orders
        |WHERE NOT (o_totalprice < 50000.0 OR o_orderstatus = 'F')
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "lake_maintenance" -> "SELECT * FROM orders ORDER BY o_orderkey",
    "lake_rename" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice AS amount,
        |  o_orderdate, o_orderpriority
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    // batch 1 predates info.flag (reads NULL) and wrote the renamed
    // field under its old name (ID-resolved); batch 2 wrote the new
    // shape with flag = 1
    "lake_nested_evolution" ->
      """SELECT o_orderkey, o_orderstatus AS state, o_totalprice AS price,
        |  CAST(NULL AS INTEGER) AS flag
        |FROM orders
        |UNION ALL
        |SELECT o_orderkey + 100000000, o_orderstatus, o_totalprice, 1
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin,
    "lake_changes" ->
      "SELECT * FROM orders WHERE o_orderkey % 2 = 1 ORDER BY o_orderkey",
    "lake_sql_select" ->
      """SELECT o_orderstatus, count(*) AS n,
        |  round(sum(o_totalprice), 2) AS sum_price,
        |  min(o_orderdate) AS first_date
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "lake_view" ->
      """SELECT o_orderstatus AS st, o_orderpriority AS pri, count(*) AS n,
        |  round(sum(o_totalprice), 2) AS sum_price,
        |  min(o_orderkey) AS min_key
        |FROM orders WHERE o_orderstatus <> 'P'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "lake_ctas" ->
      """SELECT o_orderstatus AS st, count(*) AS n,
        |  round(sum(o_totalprice), 2) AS sum_price
        |FROM orders GROUP BY o_orderstatus ORDER BY st""".stripMargin,
    // 3 metadata versions = create + 2 appends; 4 files = 2 pinned per
    // commit; the entries split mirrors the even/odd commit split
    "lake_inspect" ->
      """SELECT 'rows_existing_commit1' AS metric,
        |  CAST(count(*) AS BIGINT) AS value FROM orders WHERE o_orderkey % 2 = 0
        |UNION ALL
        |SELECT 'rows_added_commit2', count(*) FROM orders WHERE o_orderkey % 2 = 1
        |UNION ALL SELECT 'live_files_ever', 4
        |UNION ALL SELECT 'metadata_versions', 3
        |UNION ALL SELECT 'snapshots_with_manifests', 2
        |ORDER BY metric""".stripMargin,
    "lake_metadata_cols" ->
      """SELECT CAST(4 AS BIGINT) AS n_files, count(*) AS n_rows,
        |  CAST(0 AS BIGINT) AS min_pos, CAST(0 AS BIGINT) AS max_min_pos
        |FROM orders""".stripMargin,
    "lake_partition_meta" ->
      """SELECT CAST(0 AS BIGINT) AS spec_id, o_orderstatus AS st,
        |  count(*) AS n
        |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "lake_runtime_filter" ->
      """SELECT o_orderstatus, count(*) AS n,
        |  round(sum(o_totalprice), 2) AS sum_price
        |FROM orders WHERE o_orderstatus = 'F'
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "lake_copartition_join" ->
      """WITH b AS (
        |  SELECT o_orderkey, o_orderstatus, o_custkey FROM orders
        |  WHERE o_totalprice > 100000.0
        |)
        |SELECT a.o_orderstatus, count(*) AS n,
        |  round(sum(a.o_totalprice), 2) AS sum_price,
        |  CAST(sum(b.o_custkey) AS BIGINT) AS sum_ck
        |FROM orders a JOIN b
        |  ON a.o_orderstatus = b.o_orderstatus AND a.o_orderkey = b.o_orderkey
        |GROUP BY a.o_orderstatus ORDER BY a.o_orderstatus""".stripMargin,
    "lake_roundtrip" -> "SELECT * FROM orders ORDER BY o_orderkey",
    "lake_uri_roundtrip" -> "SELECT * FROM orders ORDER BY o_orderkey",
    "lake_spec_evolution" ->
      """SELECT * FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |ORDER BY o_orderkey""".stripMargin,
    "lake_time_travel" ->
      "SELECT * FROM orders WHERE o_orderkey % 2 = 0 ORDER BY o_orderkey",
    "lake_prune" ->
      """SELECT * FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-07-01 00:00:00'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    // rollback abandons the corrupted odd-key write; the redo restores
    // the original rows, so the oracle is simply the full table
    "lake_rollback" -> "SELECT * FROM orders ORDER BY o_orderkey",
    // every appended row flows through the stream + exactly-once sink once
    "lake_stream_read" -> "SELECT * FROM orders ORDER BY o_orderkey",
    // the NATIVE DSv2 sink (writeStream.toTable): same exactly-once claim
    "lake_stream_sink" -> "SELECT * FROM orders ORDER BY o_orderkey",
    // staged branch published via fastForward = the full input
    "lake_wap" -> "SELECT * FROM orders ORDER BY o_orderkey",
    "lake_zorder" ->
      """SELECT * FROM orders
        |WHERE o_totalprice >= 100000.0 AND o_totalprice < 200000.0
        |ORDER BY o_orderkey""".stripMargin,
    "lake_compact" -> "SELECT * FROM orders ORDER BY o_orderkey",
    "lake_delete_cow" ->
      "SELECT * FROM orders WHERE NOT (o_totalprice >= 400000.0) ORDER BY o_orderkey",
    "lake_delete_mor" ->
      "SELECT * FROM orders WHERE NOT (o_totalprice >= 400000.0) ORDER BY o_orderkey",
    // the deletion-vector twin: stacked deletes, bitmap-merged per file
    "lake_delete_dv" ->
      """SELECT * FROM orders
        |WHERE NOT (o_totalprice >= 400000.0) AND NOT (o_orderstatus = 'F')
        |ORDER BY o_orderkey""".stripMargin,
    // identical survivors to lake_delete_mor — but read AFTER
    // rewrite_position_deletes retired every tombstone
    "lake_rewrite_deletes" ->
      "SELECT * FROM orders WHERE NOT (o_totalprice >= 400000.0) ORDER BY o_orderkey",
    // in-place import + post-import rename: imported (ID-less) files
    // resolve o_price by the frozen import-time name o_totalprice
    "lake_add_files" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus,
        |  o_totalprice AS o_price, o_orderdate, o_orderpriority
        |FROM orders WHERE o_totalprice >= 100000.0
        |ORDER BY o_orderkey""".stripMargin,
    // answered from manifest stats on the Spark side (driver-local
    // plan); the oracle recomputes from rows — equality IS the proof
    // the metadata answer is exact
    "lake_agg_pushdown" ->
      """SELECT count(*) AS n_rows, count(o_orderstatus) AS n_status,
        |  min(o_orderkey) AS min_key, max(o_orderkey) AS max_key,
        |  min(o_orderdate) AS min_date, max(o_orderdate) AS max_date
        |FROM orders""".stripMargin,
    // the P slice replaced in one commit: same rows, backfilled priority
    "lake_replace_where" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |  o_orderdate,
        |  CASE WHEN o_orderstatus = 'P' THEN '0-BACKFILL'
        |       ELSE o_orderpriority END AS o_orderpriority
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    // the changelog feed, reconstructed relationally: snap 1/2 insert
    // even/odd keys; snap 3 deletes the high-price rows (DV delta);
    // snap 4 is the MoR update's delete-pre-image + insert-post-image
    // over P rows that survived snap 3
    "lake_changelog" ->
      """SELECT * FROM (
        |  SELECT o.*, 'insert' AS _change_type,
        |    CAST(1 AS BIGINT) AS _commit_snapshot_id
        |  FROM orders o WHERE o_orderkey % 2 = 0
        |  UNION ALL
        |  SELECT o.*, 'insert', 2 FROM orders o WHERE o_orderkey % 2 = 1
        |  UNION ALL
        |  SELECT o.*, 'delete', 3 FROM orders o WHERE o_totalprice >= 400000.0
        |  UNION ALL
        |  SELECT o.*, 'delete', 4 FROM orders o
        |  WHERE o_orderstatus = 'P' AND o_totalprice < 400000.0
        |  UNION ALL
        |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |    o_orderdate, '9-CL' AS o_orderpriority, 'insert', 4
        |  FROM orders WHERE o_orderstatus = 'P' AND o_totalprice < 400000.0
        |) ORDER BY _commit_snapshot_id, _change_type, o_orderkey""".stripMargin,
    // even keys wrote pre-evolution (renamed field resolves by ID,
    // widens at read, added field reads null); odd keys post-evolution
    "lake_element_evolution" ->
      """SELECT o_orderkey, quantity, tag, discount FROM (
        |  SELECT o_orderkey, o_orderkey % 5 AS quantity, 'x' AS tag,
        |    CASE WHEN o_orderkey % 2 = 1 THEN 7 END AS discount FROM orders
        |  UNION ALL
        |  SELECT o_orderkey, o_orderkey % 7, 'y',
        |    CASE WHEN o_orderkey % 2 = 1 THEN 7 END FROM orders
        |) ORDER BY o_orderkey, tag""".stripMargin,
    // analyze stores exact null counts; key bounds decode from manifest
    // rollups — both recomputable relationally (NDV stays spec-bounded)
    "lake_analyze" ->
      """SELECT col, nulls, min_key, max_key FROM (
        |  SELECT 'o_orderkey' AS col,
        |    count(*) - count(o_orderkey) AS nulls,
        |    min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
        |  FROM orders
        |  UNION ALL
        |  SELECT 'o_orderstatus', count(*) - count(o_orderstatus),
        |    CAST(NULL AS BIGINT), CAST(NULL AS BIGINT) FROM orders
        |  UNION ALL
        |  SELECT 'o_totalprice', count(*) - count(o_totalprice),
        |    CAST(NULL AS BIGINT), CAST(NULL AS BIGINT) FROM orders
        |) ORDER BY col""".stripMargin,
    // even keys wrote int32 elements pre-widen (read widened); odd keys
    // post-widen with values past int range
    "lake_element_widen" ->
      """SELECT o_orderkey, pos, q FROM (
        |  SELECT o_orderkey, 0 AS pos,
        |    CAST(o_orderkey % 5 AS BIGINT) AS q FROM orders WHERE o_orderkey % 2 = 0
        |  UNION ALL
        |  SELECT o_orderkey, 1, CAST(o_orderkey % 7 AS BIGINT)
        |  FROM orders WHERE o_orderkey % 2 = 0
        |  UNION ALL
        |  SELECT o_orderkey, 0, (o_orderkey % 5) * 1000000000
        |  FROM orders WHERE o_orderkey % 2 = 1
        |  UNION ALL
        |  SELECT o_orderkey, 1, o_orderkey % 7
        |  FROM orders WHERE o_orderkey % 2 = 1
        |) ORDER BY o_orderkey, pos""".stripMargin,
    // pre-add rows (even keys) read the initial default; post-add rows
    // (odd keys) carry their written value
    "lake_column_defaults" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |  o_orderdate, o_orderpriority,
        |  CASE WHEN o_orderkey % 2 = 0 THEN 'legacy' ELSE 'fresh' END AS channel
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    // staged delete (F rows) + staged update (O rows get 9-STAGED),
    // published via fastForward
    "lake_branch_mutations" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
        |  CASE WHEN o_orderstatus = 'O' THEN '9-STAGED'
        |       ELSE o_orderpriority END AS o_orderpriority
        |FROM orders WHERE NOT (o_orderstatus = 'F')
        |ORDER BY o_orderkey""".stripMargin,
    // the SQL spark.wap.branch surface stages the IDENTICAL state
    "lake_sql_wap" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
        |  CASE WHEN o_orderstatus = 'O' THEN '9-STAGED'
        |       ELSE o_orderpriority END AS o_orderpriority
        |FROM orders WHERE NOT (o_orderstatus = 'F')
        |ORDER BY o_orderkey""".stripMargin,
    "lake_merge_upsert" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus,
        |  CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice * 2
        |       ELSE o_totalprice END AS o_totalprice,
        |  o_orderdate, o_orderpriority
        |FROM orders
        |UNION ALL
        |SELECT o_orderkey + 100000000, o_custkey, o_orderstatus,
        |  o_totalprice * 2, o_orderdate, o_orderpriority
        |FROM orders WHERE o_orderkey % 10 = 0
        |ORDER BY o_orderkey""".stripMargin,
    "lake_update_cow" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
        |  CASE WHEN o_orderstatus = 'F' THEN '0-REWRITTEN' ELSE o_orderpriority END AS o_orderpriority
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "lake_update_mor" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
        |  CASE WHEN o_orderstatus = 'F' THEN '0-REWRITTEN' ELSE o_orderpriority END AS o_orderpriority
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "lake_merge_mor" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus,
        |  CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice * 2
        |       ELSE o_totalprice END AS o_totalprice,
        |  o_orderdate, o_orderpriority
        |FROM orders
        |UNION ALL
        |SELECT o_orderkey + 100000000, o_custkey, o_orderstatus,
        |  o_totalprice * 2, o_orderdate, o_orderpriority
        |FROM orders WHERE o_orderkey % 10 = 0
        |ORDER BY o_orderkey""".stripMargin,
  )

  // the stream drains the SAME scenario the batch feed runs — one
  // DuckDB twin, two engine-side surfaces under it
  val oracles: Map[String, String] =
    oracles0 + ("lake_changelog_stream" -> oracles0("lake_changelog"))
}
