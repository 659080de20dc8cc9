package graft.lake

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property: pruned scan ≡ full scan + filter, for arbitrary predicates —
  * pruning may only skip files that provably contain no matching row
  * (SURVEY.md §5 test-oracle plan). Plus a determinism check that
  * pruning actually skips files when the data is clustered.
  * (No scalatest↔scalacheck bridge in the offline cache, so predicates
  * are drawn with a fixed seed and asserted in a plain loop.) */
class PruningSpec extends LakeSuite {
  import LakePredicate._

  private lazy val (table, metrics) = {
    val m = new SimpleMetrics
    val cat = LakeCatalog.open(freshWarehouse(), m)
    val t = cat.createTable("prune", "orders", ordersDF.schema,
      spec = Seq(PartitionField("o_orderdate", "year")))
    // 24 range-clustered files over ~7 years: several files per year, so
    // most sit inside one year (partition value derivable) and date
    // predicates can skip files
    t.appendData(ordersDF, numFiles = 24)
    (t.refresh(), m)
  }

  private val genPred: Gen[LakePredicate] = {
    val price = Gen.choose(0.0, 600000.0)
    val key = Gen.choose(0L, 15000L)
    val status = Gen.oneOf("F", "O", "P")
    val date = Gen.choose(0L, 2400L).map(d =>
      java.sql.Timestamp.valueOf(java.time.LocalDate.of(1995, 1, 1).plusDays(d).atStartOfDay()))
    val leaf: Gen[LakePredicate] = Gen.oneOf(
      price.map(v => Gt("o_totalprice", Double.box(v))),
      price.map(v => Le("o_totalprice", Double.box(v))),
      key.map(v => Lt("o_orderkey", Long.box(v))),
      key.map(v => Ge("o_orderkey", Long.box(v))),
      status.map(v => Eq("o_orderstatus", v)),
      date.map(v => Ge("o_orderdate", v)),
      date.map(v => Lt("o_orderdate", v)),
      Gen.listOfN(3, status).map(vs => In("o_orderstatus", vs)),
      Gen.const(NotNull("o_custkey")),
      Gen.const(IsNull("o_custkey")))
    def node(depth: Int): Gen[LakePredicate] =
      if (depth == 0) leaf
      else Gen.frequency(
        3 -> leaf,
        1 -> Gen.zip(node(depth - 1), node(depth - 1)).map { case (a, b) => And(a, b) },
        1 -> Gen.zip(node(depth - 1), node(depth - 1)).map { case (a, b) => Or(a, b) },
        1 -> node(depth - 1).map(Not(_)))
    node(2)
  }

  test("∀ predicate: pruned scan returns exactly full-scan + filter") {
    val full = table.newScan().toDF(spark).cache()
    val preds = Gen.listOfN(40, genPred)
      .apply(Gen.Parameters.default, Seed(42L))
      .getOrElse(fail("generator exhausted"))
    preds.foreach { pred =>
      val pruned = table.newScan(pred).toDF(spark).count()
      val expected = full.filter(pred.toColumn).count()
      assert(pruned === expected, s"for predicate ${pred.render}")
    }
  }

  test("∀ predicate: pruning stays exact over a Z-ORDERED table, and both z-dims skip") {
    val cat = LakeCatalog.open(freshWarehouse())
    val zt = cat.createTable("prune", "orders_z", ordersDF.schema)
    zt.setZOrder("o_custkey", "o_totalprice")
    zt.refresh().appendData(ordersDF, numFiles = 16)
    val t = zt.refresh()
    val full = t.newScan().toDF(spark).cache()
    val preds = Gen.listOfN(40, genPred)
      .apply(Gen.Parameters.default, Seed(99L))
      .getOrElse(fail("generator exhausted"))
    preds.foreach { pred =>
      assert(t.newScan(pred).toDF(spark).count() === full.filter(pred.toColumn).count(),
        s"for predicate ${pred.render}")
    }
    // and the clustering is real: narrow ranges on EITHER z-dimension
    // skip files
    val total = t.metadata.currentFiles.size
    val byKey = t.newScan(And(Ge("o_custkey", Long.box(100L)),
      Lt("o_custkey", Long.box(140L)))).planFiles.size
    val byPrice = t.newScan(And(Ge("o_totalprice", Double.box(100000.0)),
      Lt("o_totalprice", Double.box(110000.0)))).planFiles.size
    assert(byKey < total, s"custkey range scanned $byKey/$total files")
    assert(byPrice < total, s"totalprice range scanned $byPrice/$total files")
  }

  test("∀ predicate: pruning stays exact across a partition-spec evolution") {
    val cat = LakeCatalog.open(freshWarehouse())
    val t = cat.createTable("prune", "orders_ev", ordersDF.schema,
      spec = Seq(PartitionField("o_orderdate", "year")))
    t.appendData(ordersDF.filter(col("o_orderkey") % 2 === 0), numFiles = 8)
    // metadata-only evolution: nothing rewritten, future writes cluster
    // (and derive partition values) under the NEW spec
    val filesBefore = t.refresh().metadata.currentFiles.map(_.path).toSet
    t.evolveSpec(Seq(PartitionField("o_orderstatus", "identity")))
    assert(t.refresh().metadata.currentFiles.map(_.path).toSet === filesBefore)
    t.appendData(ordersDF.filter(col("o_orderkey") % 2 === 1), numFiles = 8)
    val evolved = t.refresh()
    assert(evolved.metadata.allSpecs.size === 2)
    assert(evolved.metadata.currentFiles.map(_.specId).toSet === Set(0, 1))

    // the same ∀-predicate exactness property over the mixed-spec table
    val full = evolved.newScan().toDF(spark).cache()
    val preds = Gen.listOfN(25, genPred)
      .apply(Gen.Parameters.default, Seed(7L))
      .getOrElse(fail("generator exhausted"))
    preds.foreach { pred =>
      val pruned = evolved.newScan(pred).toDF(spark).count()
      val expected = full.filter(pred.toColumn).count()
      assert(pruned === expected, s"for predicate ${pred.render}")
    }
    full.unpersist(blocking = false)

    // PartitionEq on each spec's field prunes ONLY that spec's files,
    // exactly (old files prune under their own spec after evolution)
    val oldField = PartitionField("o_orderdate", "year")
    val newField = PartitionField("o_orderstatus", "identity")
    for ((pe, expect) <- Seq(
        PartitionEq(oldField, "1996") -> evolved.newScan().toDF(spark)
          .filter(year(col("o_orderdate")) === 1996).count(),
        PartitionEq(newField, "F") -> evolved.newScan().toDF(spark)
          .filter(col("o_orderstatus") === "F").count())) {
      assert(evolved.newScan(pe).toDF(spark).filter(pe.toColumn).count() === expect)
      assert(evolved.newScan(pe).planFiles.size
        < evolved.metadata.currentFiles.size, s"${pe.render} pruned nothing")
    }

    // a rename of a HISTORICAL spec's source column keeps old files
    // pruning (spec log renames; positional values untouched)
    t.alterSchema(Seq(SchemaChange.Rename("o_orderdate", "odate")))
    val renamed = t.refresh()
    val peRenamed = PartitionEq(PartitionField("odate", "year"), "1996")
    assert(renamed.newScan(peRenamed).planFiles.size
      < renamed.metadata.currentFiles.size)
  }

  test("a narrow range predicate on the clustered column skips files") {
    val total = table.metadata.currentFiles.size
    assume(total > 1, "needs multiple data files to show pruning")
    val pred = And(
      Ge("o_orderdate", java.sql.Timestamp.valueOf("1996-01-01 00:00:00")),
      Lt("o_orderdate", java.sql.Timestamp.valueOf("1996-02-01 00:00:00")))
    val survivors = table.newScan(pred).planFiles.size
    assert(survivors < total,
      s"expected pruning: $survivors of $total files survive")
  }

  test("PartitionEq prunes on derived partition values and matches row filter") {
    val pf = PartitionField("o_orderdate", "year")
    val pred = PartitionEq(pf, "1996")
    val total = table.metadata.currentFiles.size
    val survivors = table.newScan(pred).planFiles.size
    assert(survivors < total, s"$survivors of $total files survive")
    val got = table.newScan(pred).toDF(spark).count()
    val expected = table.newScan().toDF(spark)
      .filter(year(col("o_orderdate")) === 1996).count()
    assert(got === expected)
  }

  // Second corpus: lineitem clustered by a STRING identity partition,
  // exercising lexicographic stat bounds (Stats.cmp string path) and
  // the wider column mix — the round-1 generator only drew from orders.
  private lazy val liTable = {
    val cat = LakeCatalog.open(freshWarehouse())
    val t = cat.createTable("prune", "lineitem", lineitemDF.schema,
      spec = Seq(PartitionField("l_returnflag", "identity")))
    t.appendData(lineitemDF, numFiles = 12)
    t.refresh()
  }

  private val genLiPred: Gen[LakePredicate] = {
    val flag = Gen.oneOf("A", "N", "R")
    val status = Gen.oneOf("F", "O")
    val qty = Gen.choose(1.0, 50.0)
    val disc = Gen.choose(0.0, 0.1)
    val date = Gen.choose(0L, 2500L).map(d =>
      java.sql.Timestamp.valueOf(java.time.LocalDate.of(1992, 6, 1).plusDays(d).atStartOfDay()))
    val leaf: Gen[LakePredicate] = Gen.oneOf(
      flag.map(v => Eq("l_returnflag", v)),
      flag.map(v => Gt("l_returnflag", v)), // string range: lexicographic bounds
      flag.map(v => Le("l_returnflag", v)),
      status.map(v => Eq("l_linestatus", v)),
      qty.map(v => Ge("l_quantity", Double.box(v))),
      qty.map(v => Lt("l_quantity", Double.box(v))),
      disc.map(v => Gt("l_discount", Double.box(v))),
      date.map(v => Ge("l_shipdate", v)),
      date.map(v => Lt("l_shipdate", v)),
      Gen.listOfN(2, status).map(vs => In("l_linestatus", vs)),
      Gen.const(NotNull("l_returnflag")))
    def node(depth: Int): Gen[LakePredicate] =
      if (depth == 0) leaf
      else Gen.frequency(
        3 -> leaf,
        1 -> Gen.zip(node(depth - 1), node(depth - 1)).map { case (a, b) => And(a, b) },
        1 -> Gen.zip(node(depth - 1), node(depth - 1)).map { case (a, b) => Or(a, b) },
        1 -> node(depth - 1).map(Not(_)))
    node(2)
  }

  test("∀ predicate over string-clustered lineitem: pruned ≡ full + filter") {
    val full = liTable.newScan().toDF(spark).cache()
    val preds = Gen.listOfN(30, genLiPred)
      .apply(Gen.Parameters.default, Seed(7L))
      .getOrElse(fail("generator exhausted"))
    preds.foreach { pred =>
      val pruned = liTable.newScan(pred).toDF(spark).count()
      val expected = full.filter(pred.toColumn).count()
      assert(pruned === expected, s"for predicate ${pred.render}")
    }
  }

  test("string equality on the clustered flag column skips files") {
    val total = liTable.metadata.currentFiles.size
    assume(total > 1)
    val survivors = liTable.newScan(Eq("l_returnflag", "A")).planFiles.size
    assert(survivors < total, s"$survivors of $total files survive")
  }

  test("manifest-list skip stats: a selective scan never opens non-matching manifest docs") {
    val wh = freshWarehouse()
    val reports = scala.collection.mutable.ArrayBuffer[ScanReport]()
    val rec: MetricsReporter = {
      case s: ScanReport => reports += s
      case _ => ()
    }
    val cat = LakeCatalog.open(wh, rec)
    val t = cat.createTable("prune", "orders_mf", ordersDF.schema,
      spec = Seq(PartitionField("o_orderdate", "year")))
    // one commit per year → one data manifest per year, each with a
    // tight rollup over o_orderdate and a single-valued p0 summary
    val years = Seq(1995, 1996, 1997)
    years.foreach(y =>
      t.appendData(ordersDF.filter(year(col("o_orderdate")) === y), numFiles = 2))
    assert(t.refresh().metadata.currentSnapshot.get.dataManifests.size === 3)

    // reopen COLD: a skipped manifest is never parsed, not just unused
    val cat2 = LakeCatalog.open(wh, rec)
    val t2 = cat2.loadTable("prune", "orders_mf")
    val parsedBefore = cat2.metaCacheSizes._1
    val pred = And(
      Ge("o_orderdate", java.sql.Timestamp.valueOf("1996-01-01 00:00:00")),
      Lt("o_orderdate", java.sql.Timestamp.valueOf("1997-01-01 00:00:00")))
    val got = t2.newScan(pred).toDF(spark).count()
    assert(got === ordersDF.filter(year(col("o_orderdate")) === 1996).count())
    val rep = reports.last
    assert(rep.scannedDataManifests === 1L,
      s"expected 1 manifest opened, got ${rep.scannedDataManifests}")
    assert(rep.skippedDataManifests === 2L,
      s"expected 2 manifests skipped, got ${rep.skippedDataManifests}")
    assert(cat2.metaCacheSizes._1 - parsedBefore === 1,
      "only the matching manifest document should be parsed")

    // PartitionEq skips on the partition-value summary too
    val pe = PartitionEq(PartitionField("o_orderdate", "year"), "1995")
    t2.newScan(pe).planFiles
    assert(reports.last.skippedDataManifests === 2L)

    // and the rollup is conservative: the full scan opens everything
    t2.newScan().planFiles
    assert(reports.last.skippedDataManifests === 0L)
    assert(reports.last.scannedDataManifests === 3L)
  }

  test("distributed planFiles: over-budget planning parses manifests in executors, identically") {
    val wh = freshWarehouse()
    val cat = LakeCatalog.open(wh)
    val t = cat.createTable("prune", "orders_dp", ordersDF.schema)
    // several manifests with many entries each
    (0 until 3).foreach(i =>
      t.refresh().appendData(ordersDF.filter(col("o_orderkey") % 3 === i),
        numFiles = 8))
    val pred = Ge("o_orderkey", Long.box(750L))
    val driverPlanned = t.refresh().newScan(pred).planFiles.map(_.path).toSet
    assert(driverPlanned.nonEmpty)

    // force the distributed path: budget below the 24 live entries.
    // Reopen COLD and watch the document cache — executor-side parsing
    // must leave the DRIVER's manifest cache untouched (the bounded-
    // allocation claim, observable).
    spark.conf.set("graft.plan.driverEntryBudget", "4")
    try {
      val cat2 = LakeCatalog.open(wh)
      val t2 = cat2.loadTable("prune", "orders_dp")
      val before = cat2.metaCacheSizes._1
      val scan = t2.newScan(pred)
      assert(scan.planFiles.map(_.path).toSet === driverPlanned)
      assert(cat2.metaCacheSizes._1 === before,
        "distributed planning must not parse manifest documents on the driver")
      // the full read over the distributed plan stays exact
      assert(scan.toDF(spark).count() ===
        ordersDF.filter(col("o_orderkey") >= 750L).count())
    } finally spark.conf.unset("graft.plan.driverEntryBudget")
  }

  test("planDegraded: executor-side failure falls back to the driver AND is counted") {
    val wh = freshWarehouse()
    val reports = scala.collection.mutable.ArrayBuffer[ScanReport]()
    val rec: MetricsReporter = {
      case s: ScanReport => reports += s
      case _ => ()
    }
    val cat = LakeCatalog.open(wh, rec)
    val t = cat.createTable("prune", "orders_deg", ordersDF.schema)
    (0 until 3).foreach(i =>
      t.refresh().appendData(ordersDF.filter(col("o_orderkey") % 3 === i),
        numFiles = 8))
    val pred = Ge("o_orderkey", Long.box(750L))
    val want = t.refresh().newScan(pred).planFiles.map(_.path).toSet
    assert(want.nonEmpty)
    assert(reports.last.planDegraded === 0L) // under budget: no attempt

    // over budget + a hadoop conf executors cannot build a FileSystem
    // from (session confs flow into sessionState.newHadoopConf, which
    // is exactly the conf the distributed parse ships): the attempt
    // fails, the driver re-plan answers, and the degrade is visible
    spark.conf.set("graft.plan.driverEntryBudget", "4")
    spark.conf.set("fs.file.impl", "no.such.FileSystem")
    spark.conf.set("fs.file.impl.disable.cache", "true")
    try {
      val got = t.refresh().newScan(pred).planFiles.map(_.path).toSet
      assert(got === want)
      assert(reports.last.planDegraded === 1L,
        "a swallowed distributed-planning failure must be counted")
    } finally {
      spark.conf.unset("fs.file.impl")
      spark.conf.unset("fs.file.impl.disable.cache")
    }
    // same scan with a healthy conf: distributed path, no degrade
    try {
      val again = t.refresh().newScan(pred).planFiles.map(_.path).toSet
      assert(again === want)
      assert(reports.last.planDegraded === 0L)
    } finally spark.conf.unset("graft.plan.driverEntryBudget")
  }

  test("partition values derived for clustered files use the year transform") {
    val withPv = table.metadata.currentFiles.filter(_.partitionValues.nonEmpty)
    assert(withPv.nonEmpty, "at least some files should sit inside one year")
    withPv.foreach { f =>
      assert(f.partitionValues.keySet === Set("p0")) // spec position 0 = year(o_orderdate)
      assert(f.partitionValues.values.head.matches("\\d{4}"))
    }
  }
}
