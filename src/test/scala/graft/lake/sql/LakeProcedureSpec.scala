package graft.lake.sql

import org.apache.spark.sql.functions._
import graft.lake.{LakeCatalog, LakeSuite}

/** SQL stored procedures (`CALL cat.system.<proc>(...)`): the Iceberg
  * maintenance-procedure surface over the transactional Scala API. */
class LakeProcedureSpec extends LakeSuite {

  private var n = 0
  private def sqlCat(): (String, String) = {
    n += 1
    val wh = freshWarehouse()
    val cat = s"proc$n"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[LakeSqlCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE $cat.ns")
    spark.sql(s"CREATE TABLE $cat.ns.t (${ordersDF.schema.toDDL})")
    (cat, wh)
  }

  test("rollback_to_snapshot restores state and reports both snapshot ids") {
    val (cat, wh) = sqlCat()
    val t = LakeCatalog.open(wh).loadTable("ns", "t")
    val first = t.appendData(ordersDF.filter(col("o_orderkey") % 2 === 0))
    t.refresh().appendData(ordersDF.filter(col("o_orderkey") % 2 === 1))
    val row = spark.sql(
      s"CALL $cat.system.rollback_to_snapshot('ns.t', ${first.snapshotId})").head
    assert(row.getLong(0) === first.snapshotId + 1)
    assert(row.getLong(1) === first.snapshotId)
    assert(spark.sql(s"SELECT count(*) FROM $cat.ns.t").head.getLong(0)
      === ordersDF.filter(col("o_orderkey") % 2 === 0).count())
  }

  test("rewrite_data_files compacts (and re-clusters under the write order)") {
    val (cat, wh) = sqlCat()
    val t = LakeCatalog.open(wh).loadTable("ns", "t")
    (0 until 4).foreach(i =>
      t.refresh().appendData(ordersDF.filter(col("o_orderkey") % 4 === i)))
    spark.sql(s"CALL $cat.system.set_write_order('ns.t', 'o_orderkey')")
    val row = spark.sql(s"CALL $cat.system.rewrite_data_files('ns.t', 2)").head
    assert(row.getLong(0) === 4L) // all four input files rewritten
    assert(row.getLong(1) === 2L)
    // re-clustered: disjoint key ranges across the compacted files
    val m = t.refresh().metadata
    val key = m.statKey("o_orderkey").get
    val ranges = m.currentFiles.map(f =>
      (f.minValues(key).toLong, f.maxValues(key).toLong)).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, max1), (min2, _)) => assert(max1 <= min2)
      case _ =>
    }
    assert(spark.sql(s"SELECT count(*) FROM $cat.ns.t").head.getLong(0)
      === ordersDF.count())
  }

  test("rewrite_data_files_where compacts only the matching files; inexact WHERE refuses") {
    val (cat, wh) = sqlCat()
    val t = LakeCatalog.open(wh).loadTable("ns", "t")
    // files range-clustered on o_orderkey: a key-range WHERE hits a few
    t.setWriteOrder("o_orderkey")
    t.refresh().appendData(ordersDF, numFiles = 8)
    val before = t.refresh().metadata.currentFiles.map(_.path).toSet
    assert(before.size === 8)
    val maxKey = ordersDF.agg(max(col("o_orderkey"))).head.getLong(0)
    val row = spark.sql(s"CALL $cat.system.rewrite_data_files_where(" +
      s"'ns.t', 1, 'o_orderkey >= ${maxKey / 2}')").head
    assert(row.getLong(0) > 0L && row.getLong(0) < 8L) // a strict subset rewrote
    val after = t.refresh().metadata.currentFiles.map(_.path).toSet
    assert((before intersect after).nonEmpty) // non-matching files survive
    assert(spark.sql(s"SELECT count(*) FROM $cat.ns.t").head.getLong(0)
      === ordersDF.count())
    // a WHERE with no exact manifest form refuses instead of widening
    val e = intercept[Exception](spark.sql(
      s"CALL $cat.system.rewrite_data_files_where('ns.t', 1, " +
        "'o_orderpriority LIKE \\'%URGENT\\'')"))
    assert(e.getMessage.contains("no exact manifest-predicate form") ||
      Option(e.getCause).exists(_.getMessage.contains("no exact manifest-predicate form")))
    // nothing-matches is a no-op, not a commit
    val none = spark.sql(s"CALL $cat.system.rewrite_data_files_where(" +
      s"'ns.t', 1, 'o_orderkey < 0')").head
    assert(none.getLong(0) === 0L && none.getLong(1) === 0L)
  }

  test("expire_snapshots + remove_orphan_files reclaim history") {
    val (cat, wh) = sqlCat()
    val t = LakeCatalog.open(wh).loadTable("ns", "t")
    t.appendData(ordersDF, numFiles = 4)
    t.refresh().compact(spark, targetFiles = 1)
    val expired = spark.sql(s"CALL $cat.system.expire_snapshots('ns.t', 1)").head.getLong(0)
    assert(expired === 1L)
    val orphans = spark.sql(s"CALL $cat.system.remove_orphan_files('ns.t', 0)").head.getLong(0)
    assert(orphans >= 4L) // the pre-compaction files
    assert(spark.sql(s"SELECT count(*) FROM $cat.ns.t").head.getLong(0)
      === ordersDF.count())
  }

  test("rewrite_position_deletes retires tombstones touching only affected files") {
    val (cat, wh) = sqlCat()
    val t = LakeCatalog.open(wh).loadTable("ns", "t")
    // clustered files = disjoint key ranges: the MoR delete's tombstones
    // reference few files, so materialization must leave the rest alone
    t.setWriteOrder("o_orderkey")
    t.refresh().appendData(ordersDF, numFiles = 4)
    val cutoff = ordersDF.selectExpr("percentile(o_orderkey, 0.2)").head.getDouble(0).toLong
    t.refresh().deleteWhereMoR(spark,
      graft.lake.LakePredicate.Lt("o_orderkey", Long.box(cutoff)))
    val before = t.refresh().metadata.currentFiles.map(_.path).toSet
    assert(spark.sql(s"SELECT count(*) FROM $cat.ns.t.delete_files").head.getLong(0) >= 1L)

    val row = spark.sql(s"CALL $cat.system.rewrite_position_deletes('ns.t')").head
    assert(row.getLong(2) >= 1L) // delete files retired
    // 0 live tombstones after the call; data rows unchanged
    assert(spark.sql(s"SELECT count(*) FROM $cat.ns.t.delete_files").head.getLong(0) === 0L)
    val survivors = ordersDF.filter(col("o_orderkey") >= cutoff).count()
    assert(spark.sql(s"SELECT count(*) FROM $cat.ns.t").head.getLong(0) === survivors)
    // only the tombstone-affected file(s) were rewritten: most of the
    // clustered files survive by reference (identical paths)
    val after = t.refresh().metadata.currentFiles.map(_.path).toSet
    val untouched = (before intersect after).size
    assert(row.getLong(0) < before.size) // strict subset rewritten
    assert(untouched >= before.size - row.getLong(0).toInt - 1)
    assert(untouched >= 2)

    // a second call with no live tombstones is a no-op (no commit)
    val snapBefore = t.refresh().currentSnapshotId
    val zero = spark.sql(s"CALL $cat.system.rewrite_position_deletes('ns.t')").head
    assert(zero.getLong(0) === 0L && zero.getLong(2) === 0L)
    assert(t.refresh().currentSnapshotId === snapBefore)
  }

  test("rewrite_position_deletes materializes equality tombstones by key overlap") {
    val (cat, wh) = sqlCat()
    val t = LakeCatalog.open(wh).loadTable("ns", "t")
    t.setWriteOrder("o_orderkey")
    t.refresh().appendData(ordersDF, numFiles = 4)
    // MoR upsert over a narrow key band: eq tombstones' key stats
    // overlap only the low-range clustered file(s)
    val loKeys = ordersDF.orderBy("o_orderkey").limit(40)
      .withColumn("o_totalprice", col("o_totalprice") * 2)
    t.refresh().mergeIntoMoR(spark, loKeys, Seq("o_orderkey"))
    val expect = t.refresh().newScan().toDF(spark)
      .agg(sum("o_totalprice")).head.getDouble(0)

    val row = spark.sql(s"CALL $cat.system.rewrite_position_deletes('ns.t')").head
    assert(row.getLong(2) >= 1L)
    assert(spark.sql(s"SELECT count(*) FROM $cat.ns.t.delete_files").head.getLong(0) === 0L)
    assert(spark.sql(s"SELECT count(*) FROM $cat.ns.t").head.getLong(0) === ordersDF.count())
    val got = spark.sql(s"SELECT sum(o_totalprice) FROM $cat.ns.t").head.getDouble(0)
    assert(math.abs(got - expect) <= 1e-6 * math.abs(expect))
    // the upsert's own data files and the untouched high-range files
    // survive; only key-overlapping older files were rewritten
    assert(row.getLong(0) >= 1L && row.getLong(0) < 5L)
  }

  test("expire_snapshots_older_than retires aged history; current always survives") {
    val (cat, wh) = sqlCat()
    val t = LakeCatalog.open(wh).loadTable("ns", "t")
    t.appendData(ordersDF.filter(col("o_orderkey") % 2 === 0))
    t.refresh().appendData(ordersDF.filter(col("o_orderkey") % 2 === 1))
    Thread.sleep(5)
    // cutoff after both commits: the older snapshot expires, current survives
    val row = spark.sql(s"CALL $cat.system.expire_snapshots_older_than(" +
      s"'ns.t', ${System.currentTimeMillis()})").head
    assert(row.getLong(0) === 1L)
    assert(spark.sql(s"SELECT count(*) FROM $cat.ns.t").head.getLong(0)
      === ordersDF.count())
    // nothing older remains: converged
    val again = spark.sql(s"CALL $cat.system.expire_snapshots_older_than(" +
      s"'ns.t', ${System.currentTimeMillis()})").head
    assert(again.getLong(0) === 0L)
  }

  test("rewrite_manifests consolidates planning metadata through SQL") {
    val (cat, wh) = sqlCat()
    val t = LakeCatalog.open(wh).loadTable("ns", "t")
    (0 until 5).foreach(i =>
      t.refresh().appendData(ordersDF.filter(col("o_orderkey") % 5 === i)))
    val row = spark.sql(
      s"CALL $cat.system.rewrite_manifests('ns.t', 100000)").head
    assert(row.getLong(0) === 5L && row.getLong(1) === 1L)
    assert(spark.sql(s"SELECT count(*) FROM $cat.ns.t").head.getLong(0)
      === ordersDF.count())
    // converged: nothing left to consolidate
    val again = spark.sql(
      s"CALL $cat.system.rewrite_manifests('ns.t', 100000)").head
    assert(again.getLong(0) === 0L && again.getLong(1) === 0L)
  }

  test("evolve_spec changes future writes' partitioning; old files keep their spec") {
    val (cat, wh) = sqlCat()
    val t = LakeCatalog.open(wh).loadTable("ns", "t")
    t.appendData(ordersDF.filter(col("o_orderkey") % 2 === 0))
    val row = spark.sql(
      s"CALL $cat.system.evolve_spec('ns.t', 'bucket(4, o_custkey), o_orderstatus')").head
    assert(row.getInt(0) === 1)
    assert(row.getString(1) === "bucket[4](o_custkey), o_orderstatus")
    t.refresh().appendData(ordersDF.filter(col("o_orderkey") % 2 === 1))
    // both generations read whole; new files carry the new spec id
    assert(spark.sql(s"SELECT count(*) FROM $cat.ns.t").head.getLong(0)
      === ordersDF.count())
    assert(t.refresh().metadata.currentFiles.map(_.specId).toSet === Set(0, 1))
    // date transform + identity parse; empty spec unpartitions
    spark.sql(s"CALL $cat.system.evolve_spec('ns.t', 'day(o_orderdate)')")
    assert(t.refresh().spec.map(_.render) === Seq("day(o_orderdate)"))
    spark.sql(s"CALL $cat.system.evolve_spec('ns.t', '')")
    assert(t.refresh().spec.isEmpty)
    // guards: unknown transform and unknown column refuse
    val bad = intercept[Exception](spark.sql(
      s"CALL $cat.system.evolve_spec('ns.t', 'mod(4, o_custkey)')"))
    assert(bad.getMessage.contains("unknown partition transform") ||
      Option(bad.getCause).exists(_.getMessage.contains("unknown partition transform")))
    val nocol = intercept[Exception](spark.sql(
      s"CALL $cat.system.evolve_spec('ns.t', 'nope')"))
    assert(nocol.getMessage.contains("not a column") ||
      Option(nocol.getCause).exists(_.getMessage.contains("not a column")))
  }

  test("rollback_to_timestamp and set_current_snapshot retarget the head") {
    val (cat, wh) = sqlCat()
    val t = LakeCatalog.open(wh).loadTable("ns", "t")
    val first = t.appendData(ordersDF.filter(col("o_orderkey") % 2 === 0))
    val tsAfterFirst = t.refresh().metadata
      .snapshot(first.snapshotId).get.timestampMs
    Thread.sleep(5)
    t.refresh().appendData(ordersDF.filter(col("o_orderkey") % 2 === 1))
    val second = t.refresh().currentSnapshotId
    // timestamp rollback lands on the latest snapshot STRICTLY BEFORE
    // the cutoff (Iceberg semantics: a snapshot committed exactly at the
    // cutoff is rolled past), so cutoff+1 keeps the first snapshot
    val row = spark.sql(s"CALL $cat.system.rollback_to_timestamp(" +
      s"'ns.t', ${tsAfterFirst + 1})").head
    assert(row.getLong(0) === second && row.getLong(1) === first.snapshotId)
    assert(spark.sql(s"SELECT count(*) FROM $cat.ns.t").head.getLong(0)
      === ordersDF.filter(col("o_orderkey") % 2 === 0).count())
    // set_current_snapshot re-targets FORWARD onto the abandoned commit
    val fwd = spark.sql(
      s"CALL $cat.system.set_current_snapshot('ns.t', $second)").head
    assert(fwd.getLong(1) === second)
    assert(spark.sql(s"SELECT count(*) FROM $cat.ns.t").head.getLong(0)
      === ordersDF.count())
    // pre-history timestamp refuses
    val e = intercept[Exception](spark.sql(
      s"CALL $cat.system.rollback_to_timestamp('ns.t', 1)"))
    assert(e.getMessage.contains("strictly before") ||
      Option(e.getCause).exists(_.getMessage.contains("strictly before")))
    // data_files metadata-table alias answers like files
    assert(spark.sql(s"SELECT count(*) FROM $cat.ns.t.data_files").head.getLong(0)
      === spark.sql(s"SELECT count(*) FROM $cat.ns.t.files").head.getLong(0))
  }

  test("snapshot_table creates + imports a parquet directory in place") {
    val (cat, wh) = sqlCat()
    val src = freshWarehouse() + "/foreign"
    ordersDF.write.parquet(src)
    val row = spark.sql(
      s"CALL $cat.system.snapshot_table('ns.imported', '$src')").head
    assert(row.getLong(1) === ordersDF.count())
    // full SQL read-back through the new table; schema was inferred
    assert(spark.sql(s"SELECT count(*) FROM $cat.ns.imported").head.getLong(0)
      === ordersDF.count())
    assert(spark.table(s"$cat.ns.imported").schema.fieldNames.toSeq
      === ordersDF.schema.fieldNames.toSeq)
    // the files were registered, not copied: paths point at the source
    val lt = LakeCatalog.open(wh).loadTable("ns", "imported")
    assert(lt.metadata.currentFiles.nonEmpty)
    assert(lt.metadata.currentFiles.forall(_.path.contains("/foreign")))
    // a second call refuses (table exists) — migrate is one-shot
    val e = intercept[Exception](spark.sql(
      s"CALL $cat.system.snapshot_table('ns.imported', '$src')"))
    assert(e.getMessage.contains("already exists") ||
      Option(e.getCause).exists(_.getMessage.contains("already exists")))
  }

  test("ancestors_of lists the parent chain, newest first; rollback forks it") {
    val (cat, wh) = sqlCat()
    val t = LakeCatalog.open(wh).loadTable("ns", "t")
    val first = t.appendData(ordersDF.filter(col("o_orderkey") % 2 === 0))
    t.refresh().appendData(ordersDF.filter(col("o_orderkey") % 2 === 1))
    val second = t.refresh().currentSnapshotId
    // 0 = current: both appends, newest first, operations carried
    val cur = spark.sql(s"CALL $cat.system.ancestors_of('ns.t', 0)").collect()
    assert(cur.map(_.getLong(0)).toSeq === Seq(second, first.snapshotId))
    assert(cur.forall(_.getString(2) === "append"))
    // an explicit historical snapshot sees only ITS lineage
    val old = spark.sql(
      s"CALL $cat.system.ancestors_of('ns.t', ${first.snapshotId})").collect()
    assert(old.map(_.getLong(0)).toSeq === Seq(first.snapshotId))
    // after a rollback + new append, the fork's lineage skips `second`
    spark.sql(s"CALL $cat.system.rollback_to_snapshot('ns.t', ${first.snapshotId})")
    t.refresh().appendData(ordersDF.limit(3)
      .withColumn("o_orderkey", col("o_orderkey") + 900000000L))
    val forked = spark.sql(s"CALL $cat.system.ancestors_of('ns.t', 0)").collect()
    assert(forked.length === 2 && !forked.map(_.getLong(0)).contains(second))
    // unknown snapshot refuses loudly
    val e = intercept[Exception](
      spark.sql(s"CALL $cat.system.ancestors_of('ns.t', 123456789)").collect())
    assert(e.getMessage.contains("no snapshot") ||
      Option(e.getCause).exists(_.getMessage.contains("no snapshot")))
  }

  test("set_write_order parses linear and zorder forms; unknown procedures refuse") {
    val (cat, wh) = sqlCat()
    val linear = spark.sql(
      s"CALL $cat.system.set_write_order('ns.t', 'o_custkey')").head
    assert(linear.getString(0) === "o_custkey" && linear.getString(1) === "linear")
    val z = spark.sql(
      s"CALL $cat.system.set_write_order('ns.t', 'zorder(o_custkey, o_totalprice)')").head
    assert(z.getString(0) === "o_custkey,o_totalprice" && z.getString(1) === "zorder")
    assert(LakeCatalog.open(wh).loadTable("ns", "t").metadata.sortOrderKind === "zorder")
    val e = intercept[Exception](spark.sql(s"CALL $cat.system.no_such_proc()"))
    assert(e.getMessage.contains("no procedure") ||
      Option(e.getCause).exists(_.getMessage.contains("no procedure")))
  }

  test("register_table binds a name to existing metadata without copying") {
    val (cat, wh) = sqlCat()
    val t = LakeCatalog.open(wh).loadTable("ns", "t")
    t.appendData(ordersDF)
    val physical = s"$wh/ns/t"
    // a SECOND catalog (fresh warehouse) imports the same table by
    // reference — the no-copy path Iceberg's register_table provides
    val (cat2, wh2) = sqlCat()
    val row = spark.sql(
      s"CALL $cat2.system.register_table('ns.imported', '$physical')").head
    assert(row.getLong(0) === t.refresh().metadata.currentSnapshotId)
    assert(row.getLong(1) === t.metadata.currentFiles.size.toLong)
    // the registered name reads the ORIGINAL table's data
    assert(spark.table(s"$cat2.ns.imported").count() === ordersDF.count())
    // and writes through it: an append lands in the shared metadata,
    // visible from BOTH names (pointer semantics, not a copy)
    LakeCatalog.open(wh2).loadTable("ns", "imported")
      .appendData(ordersDF.limit(3))
    assert(spark.table(s"$cat.ns.t").count() === ordersDF.count() + 3)
    // re-registering the live name refuses; a bogus location refuses
    val dup = intercept[Exception](spark.sql(
      s"CALL $cat2.system.register_table('ns.imported', '$physical')").collect())
    assert(dup.getMessage.contains("already exists") ||
      Option(dup.getCause).exists(_.getMessage.contains("already exists")))
    val bogus = intercept[Exception](spark.sql(
      s"CALL $cat2.system.register_table('ns.other', '$wh2/ns/nope')").collect())
    assert(bogus.getMessage.contains("no table metadata") ||
      Option(bogus.getCause).exists(_.getMessage.contains("no table metadata")))
  }

  test("refresh_agg_view maintains the rollup through SQL CALLs") {
    val (cat, wh) = sqlCat()
    val t = LakeCatalog.open(wh).loadTable("ns", "t")
    spark.sql(s"CREATE TABLE $cat.ns.v (o_orderpriority STRING, " +
      "cnt BIGINT, cents BIGINT, max_cents BIGINT)")
    t.appendData(ordersDF, numFiles = 2)
    val call = s"CALL $cat.system.refresh_agg_view('ns.v', 'ns.t', " +
      "'o_orderpriority', 'cents:CAST(floor(o_totalprice * 100) AS LONG);" +
      "max_cents:max:CAST(floor(o_totalprice * 100) AS LONG)')"
    val r1 = spark.sql(call).head
    assert(r1.getBoolean(4) && r1.getLong(0) == 0L)
    // no-op: nothing changed underneath
    assert(!spark.sql(call).head.getBoolean(4))
    // mutate, refresh incrementally, compare against the direct rollup.
    // The >=300k delete retracts every group's stored max, so the
    // extremum path must report rescanned groups.
    t.refresh().deleteWhere(spark,
      graft.lake.LakePredicate.Ge("o_totalprice", Double.box(300000.0)))
    val r2 = spark.sql(call).head
    assert(r2.getBoolean(4) && r2.getLong(0) == r1.getLong(1),
      "refresh must start at the prior watermark")
    assert(r2.getLong(3) > 0L, "max retraction must rescan affected groups")
    val got = spark.sql(s"SELECT * FROM $cat.ns.v ORDER BY o_orderpriority")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    val want = spark.sql(s"SELECT o_orderpriority, count(*), " +
      s"sum(CAST(floor(o_totalprice * 100) AS LONG)), " +
      s"max(CAST(floor(o_totalprice * 100) AS LONG)) FROM $cat.ns.t " +
      "GROUP BY o_orderpriority ORDER BY o_orderpriority")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == want)
    // both leading params are strings: a call written against a
    // (base, view, ...) order binds with no type error — the resolved
    // view is validated before any refresh (round-16 advisory)
    def msgs(t: Throwable): String =
      if (t == null) "" else t.getMessage + "\n" + msgs(t.getCause)
    val swapped = intercept[Exception](spark.sql(
      s"CALL $cat.system.refresh_agg_view('ns.t', 'ns.v', " +
        "'o_orderpriority', 'cents:CAST(floor(o_totalprice * 100) AS LONG)')")
      .collect())
    assert(msgs(swapped).contains("swapped") ||
      msgs(swapped).contains("cnt"), msgs(swapped))
    val selfRef = intercept[Exception](spark.sql(
      s"CALL $cat.system.refresh_agg_view('ns.v', 'ns.v', " +
        "'o_orderpriority', 'cents:cents')").collect())
    assert(msgs(selfRef).contains("same table"), msgs(selfRef))
  }
}
