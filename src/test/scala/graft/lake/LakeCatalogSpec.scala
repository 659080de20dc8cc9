package graft.lake

import org.apache.spark.sql.functions._

/** Mirrors the reference's LocalIcebergCatalogTest life-cycle oracles:
  * create/load/schema-identity (:74-84), two append commits (:86-108),
  * restart + reopen-from-dir durability (:114-156), location invariant
  * (:126), read-back count == rows written (:145-153). */
class LakeCatalogSpec extends LakeSuite {

  test("create + load round-trips the schema identically") {
    val wh = freshWarehouse()
    val cat = LakeCatalog.open(wh)
    cat.createTable("mynamespace", "mytable", canonicalSchema)
    val loaded = cat.loadTable("mynamespace", "mytable")
    assert(loaded.schema === canonicalSchema)
    assert(loaded.name === "mynamespace.mytable")
    assert(loaded.location.startsWith(wh))
    assert(loaded.location.endsWith("mynamespace/mytable"))
  }

  test("two append commits accumulate snapshots; read-back count == rows written") {
    val cat = LakeCatalog.open(freshWarehouse())
    val t = cat.createTable("mynamespace", "mytable", canonicalSchema)
    // one file per row, one commit per file — the reference's exact
    // pathological pattern (IntegrationTest.java:78-100)
    canonicalRows.foreach { row =>
      val df = spark.createDataFrame(Seq(row).asJava0, canonicalSchema)
      t.refresh().appendData(df.coalesce(1))
    }
    val reloaded = cat.loadTable("mynamespace", "mytable")
    assert(reloaded.snapshots.size === 2)
    assert(reloaded.newScan().toDF(spark).count() === 2L)
    assert(reloaded.metadata.currentSnapshot.get.totalRecords === 2L)
  }

  test("restart durability: reopening the warehouse dir sees identical state") {
    val wh = freshWarehouse()
    val cat1 = LakeCatalog.open(wh)
    val t1 = cat1.createTable("ns", "t", ordersDF.schema)
    t1.appendData(ordersDF)
    val before = t1.refresh().metadata

    val cat2 = LakeCatalog.open(wh) // "restart"
    val t2 = cat2.loadTable("ns", "t")
    assert(t2.metadata === before)
    assert(t2.newScan().toDF(spark).count() === ordersDF.count())

    t2.appendData(ordersDF.limit(10))
    val cat3 = LakeCatalog.open(wh)
    assert(cat3.loadTable("ns", "t").snapshots.size === 2)
  }

  test("hadoop-fs backend: full lifecycle through the FileSystem API, local-fs interop") {
    val wh = freshWarehouse()
    val cat = LakeCatalog.open(wh, backend = new HadoopFsCommitBackend)
    val t = cat.createTable("ns", "hfs", ordersDF.schema)
    t.appendData(ordersDF, numFiles = 4)
    t.refresh().deleteWhere(spark, LakePredicate.Le("o_orderkey", 100L))
    t.refresh().compact(spark, targetFiles = 1)
    val expected = ordersDF.filter(
      org.apache.spark.sql.functions.col("o_orderkey") > 100).count()
    assert(t.refresh().newScan().toDF(spark).count() === expected)
    // a restart through the SAME backend sees identical state...
    val re = LakeCatalog.open(wh, backend = new HadoopFsCommitBackend)
      .loadTable("ns", "hfs")
    assert(re.snapshots.size === 3)
    assert(re.newScan().toDF(spark).count() === expected)
    // ...and so does one through the POSIX backend: the document layout
    // is backend-agnostic (file:// warehouses can switch CAS providers)
    assert(LakeCatalog.open(wh).loadTable("ns", "hfs")
      .newScan().toDF(spark).count() === expected)
  }

  test("file:// URI warehouse end-to-end: the object-store-shaped path") {
    // the URI form exercises the SAME code an s3a://bucket/wh warehouse
    // runs: scheme-addressed catalog plumbing + the Hadoop FS backend
    // (selected by default for URI warehouses), Spark parquet I/O
    // against URI data paths, orphan cleanup through FileSystem listing
    val wh = s"file://${freshWarehouse()}"
    val cat = LakeCatalog.open(wh)
    assert(cat.backend.isInstanceOf[HadoopFsCommitBackend])
    val t = cat.createTable("ns", "uri", ordersDF.schema)
    assert(t.location.startsWith("file://"))
    val first = t.appendData(ordersDF, numFiles = 2)
    t.refresh().deleteWhere(spark, LakePredicate.Le("o_orderkey", 100L))
    val expected = ordersDF.filter(
      org.apache.spark.sql.functions.col("o_orderkey") > 100).count()
    assert(t.refresh().newScan().toDF(spark).count() === expected)
    // time travel + restart durability through the URI
    assert(t.asOf(first.snapshotId).toDF(spark).count() === ordersDF.count())
    val re = LakeCatalog.open(wh).loadTable("ns", "uri")
    assert(re.snapshots.size === 2)
    assert(re.newScan().toDF(spark).count() === expected)
    // maintenance: expiry + orphan sweep walk the store through the
    // FileSystem API, not java.nio
    re.expireSnapshots(keepLast = 1)
    val removed = re.removeOrphanFiles()
    assert(removed.nonEmpty) // the pre-delete files are now orphans
    assert(LakeCatalog.open(wh).loadTable("ns", "uri")
      .newScan().toDF(spark).count() === expected)
  }

  test("mem:// object-store warehouse end-to-end: no atomic rename, PUT-at-close") {
    // the same lifecycle over an in-process FileSystem with REAL
    // object-store semantics (MemFileSystem: flat keys, visibility at
    // close, copy+delete rename that silently replaces) — what MinIO
    // gives the reference (LocalIcebergCatalog.java:104-131), without
    // containers. The write-then-publish CAS and Spark parquet I/O must
    // both survive it.
    val wh = "mem://lifecycle/wh"
    val cat = LakeCatalog.open(wh)
    assert(cat.backend.isInstanceOf[HadoopFsCommitBackend])
    val t = cat.createTable("ns", "obj", ordersDF.schema)
    assert(t.location.startsWith("mem://"))
    val first = t.appendData(ordersDF, numFiles = 2)
    t.refresh().deleteWhere(spark, LakePredicate.Le("o_orderkey", 100L))
    val expected = ordersDF.filter(
      org.apache.spark.sql.functions.col("o_orderkey") > 100).count()
    assert(t.refresh().newScan().toDF(spark).count() === expected)
    // time travel + reopen-from-store durability
    assert(t.asOf(first.snapshotId).toDF(spark).count() === ordersDF.count())
    val re = LakeCatalog.open(wh).loadTable("ns", "obj")
    assert(re.snapshots.size === 2)
    assert(re.newScan().toDF(spark).count() === expected)
    // maintenance walks the store through the FileSystem API
    re.expireSnapshots(keepLast = 1)
    assert(re.removeOrphanFiles().nonEmpty)
    assert(LakeCatalog.open(wh).loadTable("ns", "obj")
      .newScan().toDF(spark).count() === expected)
  }

  test("namespaces and table listing") {
    val cat = LakeCatalog.open(freshWarehouse())
    cat.createNamespace("a")
    cat.createTable("a", "t1", canonicalSchema)
    cat.createTable("a", "t2", canonicalSchema)
    cat.createTable("b", "t3", canonicalSchema)
    assert(cat.listNamespaces() === Seq("a", "b"))
    assert(cat.listTables("a") === Seq("t1", "t2"))
    assert(cat.tableExists("b", "t3"))
    assert(!cat.tableExists("b", "nope"))
    cat.dropTable("a", "t2")
    assert(cat.listTables("a") === Seq("t1"))
  }

  test("stray files in the warehouse root are not namespaces") {
    val wh = freshWarehouse()
    val cat = LakeCatalog.open(wh)
    cat.createTable("real_ns", "t", canonicalSchema)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(wh, ".DS_Store"), "junk")
    assert(cat.listNamespaces() === Seq("real_ns"))
    assert(cat.dropNamespace("real_ns"))
    assert(cat.listNamespaces().isEmpty)
    assert(!cat.dropNamespace("real_ns")) // already gone
  }

  test("comparisons against NULL literals prune exactly and never crash") {
    val cat = LakeCatalog.open(freshWarehouse())
    val t = cat.createTable("ns", "nullpred", ordersDF.schema)
    t.appendData(ordersDF.coalesce(1))
    // NULL = x is never TRUE: zero files scanned, zero rows, no NPE
    val scan = t.refresh().newScan(
      LakePredicate.In("o_orderstatus", Seq("F", null)))
    assert(scan.toDF(spark).count() === ordersDF
      .filter(org.apache.spark.sql.functions.col("o_orderstatus") === "F").count())
    assert(t.newScan(LakePredicate.Eq("o_orderstatus", null)).planFiles.isEmpty)
    assert(t.newScan(LakePredicate.Eq("o_orderstatus", null)).toDF(spark).count() === 0L)
  }

  test("duplicate create fails; loading a missing table fails") {
    val cat = LakeCatalog.open(freshWarehouse())
    cat.createTable("ns", "t", canonicalSchema)
    assertThrows[IllegalArgumentException](cat.createTable("ns", "t", canonicalSchema))
    assertThrows[NoSuchElementException](cat.loadTable("ns", "missing"))
    // dropTable nonexistence is consistent across both flavors: a name
    // that never existed throws exactly like a renamed-away one
    assertThrows[NoSuchElementException](cat.dropTable("ns", "missing"))
  }

  test("DROP NAMESPACE cascade succeeds after an in-namespace rename") {
    val cat = LakeCatalog.open(freshWarehouse())
    val t = cat.createTable("ns", "a", ordersDF.schema)
    t.appendData(ordersDF.limit(10))
    cat.renameTable("ns", "a", "ns", "b")
    // a's tombstoned directory still hosts b's storage — but b is IN
    // this namespace, so the cascade legitimately drops it
    assert(cat.listTables("ns") === Seq("b"))
    assert(cat.dropNamespace("ns"))
    assert(cat.listNamespaces().isEmpty)
  }

  test("DROP NAMESPACE refuses while hosting a table renamed into ANOTHER namespace") {
    val cat = LakeCatalog.open(freshWarehouse())
    val t = cat.createTable("ns", "a", ordersDF.schema)
    t.appendData(ordersDF.limit(10))
    cat.createNamespace("other")
    cat.renameTable("ns", "a", "other", "b")
    // ns.a's directory physically hosts other.b's live storage: dropping
    // ns must fail loudly BEFORE destroying anything...
    val e = intercept[IllegalStateException](cat.dropNamespace("ns"))
    assert(e.getMessage.contains("renamed away"))
    // ...and other.b is untouched and still readable
    assert(cat.loadTable("other", "b").newScan().toDF(spark).count() === 10L)
    // dropping the hosted table first unblocks the namespace drop
    cat.dropTable("other", "b")
    assert(cat.dropNamespace("ns"))
  }

  test("commit CAS: a concurrent writer racing the commit forces a retry, attempts = 2") {
    val cat = LakeCatalog.open(freshWarehouse())
    val t = cat.createTable("ns", "t", ordersDF.schema)
    val md = java.nio.file.Paths.get(t.location, "metadata")
    // simulate a concurrent winner landing BETWEEN the version read and
    // the rename: the first transform invocation plants v2.json
    var calls = 0
    // the transform must make a REAL change: identity transforms now
    // short-circuit without committing (no-op convergence), which would
    // bypass the CAS race this test exercises
    val (_, version, attempts) = cat.commit("ns", "t") { latest =>
      calls += 1
      if (calls == 1)
        java.nio.file.Files.writeString(md.resolve("v2.json"),
          MetadataJson.write(latest))
      latest.copy(properties = latest.properties + ("probe" -> "1"))
    }
    assert(attempts === 2)
    assert(version === 3) // v2 was the interloper; our commit landed as v3
    assert(cat.loadTable("ns", "t").version0 === 3)
  }

  test("metadata caches stay bounded on a write-only workload") {
    // a long-lived driver that commits frequently but rarely reads used
    // to grow manifestCache/listCache without bound: the 16k clear only
    // ran on the read-miss path. The write path now goes through the
    // same bound. Exercised directly against writeManifest (16k real
    // commits would dominate the suite) on a cheap in-memory backend.
    val cat = LakeCatalog.open(freshWarehouse(), backend = new InMemoryCommitBackend)
    val md = LakePath("/wh/ns/t/metadata")
    val file = DataFileEntry("f.parquet", 1L, 1L, Map.empty, Map.empty, Map.empty, Map.empty)
    (1 to LakeCatalog.CacheBound + 100).foreach { _ =>
      cat.writeManifest(md, Seq(file))
      cat.writeManifestList(md, Nil)
    }
    val (mSize, lSize) = cat.metaCacheSizes
    assert(mSize <= LakeCatalog.CacheBound + 1, s"manifestCache grew to $mSize")
    assert(lSize <= LakeCatalog.CacheBound + 1, s"listCache grew to $lSize")
  }

  test("time travel: asOf(first snapshot) ignores later commits") {
    val cat = LakeCatalog.open(freshWarehouse())
    val t = cat.createTable("ns", "t", ordersDF.schema)
    val first = t.appendData(ordersDF.filter(col("o_orderkey") % 2 === 0))
    t.refresh().appendData(ordersDF.filter(col("o_orderkey") % 2 === 1))
    val expected = ordersDF.filter(col("o_orderkey") % 2 === 0).count()
    assert(t.refresh().asOf(first.snapshotId).toDF(spark).count() === expected)
    assert(t.newScan().toDF(spark).count() === ordersDF.count())
  }
}
