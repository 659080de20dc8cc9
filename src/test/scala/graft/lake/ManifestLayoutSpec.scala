package graft.lake

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._

/** The layered-metadata contract (Iceberg's manifest-list + manifest
  * shape, reference IntegrationTest.java:92-98): the versioned metadata
  * document holds the snapshot LOG and manifest POINTERS only; file
  * entries live in immutable per-commit manifest documents. The
  * commit-cost property this buys — metadata bytes written per append
  * is O(new files), not O(table history) — is what the single-JSON
  * round-2 design lacked. */
class ManifestLayoutSpec extends LakeSuite {

  private def metadataFiles(t: LakeTable): Seq[java.nio.file.Path] = {
    val md = Paths.get(t.location, "metadata")
    val s = Files.list(md)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator.asScala.toSeq
    } finally s.close()
  }

  test("metadata document carries no file entries; manifests do") {
    val cat = LakeCatalog.open(freshWarehouse())
    val t = cat.createTable("ns", "layout", ordersDF.schema)
    t.appendData(ordersDF, numFiles = 4)
    t.refresh().appendData(ordersDF, numFiles = 4)
    val md = metadataFiles(t)
    val metaDoc = Files.readString(
      md.find(_.getFileName.toString == "v3.json").get)
    // data-file paths appear ONLY in manifest documents
    assert(!metaDoc.contains(".parquet"),
      "metadata document must not embed file entries")
    val manifests = md.filter(_.getFileName.toString.startsWith("manifest-"))
    assert(manifests.size === 2, "one manifest per append commit")
    manifests.foreach(m =>
      assert(Files.readString(m).contains(".parquet")))
    // and the table still reads back whole
    assert(t.refresh().newScan().toDF(spark).count() === 2 * ordersDF.count())
  }

  test("append commit cost is O(new files), independent of table file count") {
    val one = ordersDF.limit(100).coalesce(1)
    def newBytesForAppend(t: LakeTable): Long = {
      val before = metadataFiles(t).map(p => p.toString -> Files.size(p)).toMap
      t.refresh().appendData(one)
      metadataFiles(t).collect {
        case p if !before.contains(p.toString) => Files.size(p)
      }.sum
    }
    // identical histories (1 prior commit), wildly different file counts
    val cat = LakeCatalog.open(freshWarehouse())
    val big = cat.createTable("ns", "big", ordersDF.schema)
    big.appendData(ordersDF, numFiles = 60)
    val small = cat.createTable("ns", "small", ordersDF.schema)
    small.appendData(ordersDF, numFiles = 1)
    val bigBytes = newBytesForAppend(big)
    val smallBytes = newBytesForAppend(small)
    // the 60-file table's append writes the same documents as the 1-file
    // table's: a 1-file manifest, a 2-ref manifest list, a 2-snapshot
    // metadata doc. The round-2 single-JSON design re-embedded all 60
    // entries (~40 KB) into the new version document.
    assert(bigBytes < smallBytes + 512,
      s"append to 60-file table wrote $bigBytes bytes vs $smallBytes to 1-file table")
    // the newest manifest holds exactly the one appended file, carried
    // alongside the prior manifest by reference
    val snap = big.refresh().metadata.currentSnapshot.get
    assert(snap.manifests.map(_.fileCount) === Seq(60L, 1L))
    assert(snap.fileCount === 61)
  }

  test("append commit cost grows only with the snapshot log, never the file entries") {
    val cat = LakeCatalog.open(freshWarehouse())
    val t = cat.createTable("ns", "history", ordersDF.schema)
    val one = ordersDF.limit(100).coalesce(1)
    def appendOnce(): Seq[java.nio.file.Path] = {
      val before = metadataFiles(t).map(_.toString).toSet
      t.refresh().appendData(one)
      metadataFiles(t).filterNot(p => before(p.toString))
    }
    (0 until 10).foreach(_ => appendOnce())
    val newDocs = appendOnce()
    // the 11th append writes exactly one 1-file manifest, one list, one
    // metadata doc — and of those only the manifest carries file entries
    val manifest = newDocs.filter(_.getFileName.toString.startsWith("manifest-"))
    assert(manifest.size === 1)
    val firstManifest = metadataFiles(t)
      .filter(_.getFileName.toString.startsWith("manifest-"))
      .map(Files.size(_)).min
    // every per-commit manifest is the same 1-file size — no manifest
    // rewrite ever happened on this append-only history
    assert(Files.size(manifest.head) <= firstManifest + 64)
  }

  test("rename rewrites no manifest document (stats are field-ID-keyed)") {
    val cat = LakeCatalog.open(freshWarehouse())
    // identity spec → range-clustered files → disjoint key bounds, so
    // stats pruning has something to prove after the rename
    val t = cat.createTable("ns", "renames", ordersDF.schema,
      spec = Seq(PartitionField("o_orderkey", "identity")))
    t.appendData(ordersDF, numFiles = 3)
    val manifestsBefore = metadataFiles(t)
      .filter(_.getFileName.toString.startsWith("manifest-"))
      .map(p => p.getFileName.toString -> Files.getLastModifiedTime(p)).toMap
    t.refresh().renameColumn("o_orderkey", "order_id")
    val manifestsAfter = metadataFiles(t)
      .filter(_.getFileName.toString.startsWith("manifest-"))
      .map(p => p.getFileName.toString -> Files.getLastModifiedTime(p)).toMap
    assert(manifestsAfter === manifestsBefore,
      "a rename must not write or touch any manifest")
    // pruning still exact through the rename: the renamed column resolves
    // to the same field ID the stats were written under
    val total = t.refresh().metadata.currentFiles.size
    val survivors = t.newScan(LakePredicate.Le("order_id", 10L)).planFiles.size
    assert(survivors < total, "stats pruning must survive the rename")
    assert(t.newScan(LakePredicate.Le("order_id", 10L)).toDF(spark).count()
      === ordersDF.filter(col("o_orderkey") <= 10).count())
  }

  test("CoW delete rewrites only manifests that lose files") {
    val cat = LakeCatalog.open(freshWarehouse())
    val t = cat.createTable("ns", "cowman", ordersDF.schema,
      spec = Seq(PartitionField("o_orderkey", "identity")))
    // two commits = two manifests with disjoint key ranges
    t.appendData(ordersDF.filter(col("o_orderkey") <= 1000), numFiles = 2)
    t.refresh().appendData(ordersDF.filter(col("o_orderkey") > 1000), numFiles = 2)
    val Seq(lowManifest, highManifest) =
      t.refresh().metadata.currentSnapshot.get.manifests
    t.deleteWhere(spark, LakePredicate.Le("o_orderkey", 10L))
    val after = t.refresh().metadata.currentSnapshot.get.manifests.map(_.name)
    // the high-range manifest survives BY REFERENCE (same document); the
    // low-range one was rewritten (its name is gone), plus one manifest
    // of the rewritten files
    assert(after.contains(highManifest.name))
    assert(!after.contains(lowManifest.name))
    assert(t.newScan().toDF(spark).count()
      === ordersDF.filter(col("o_orderkey") > 10).count())
  }

  test("serializable validation: a racing append inside a delete predicate conflicts") {
    val cat = LakeCatalog.open(freshWarehouse())
    val t = cat.createTable("ns", "ser", ordersDF.schema)
    t.appendData(ordersDF.coalesce(1))
    val handle = cat.loadTable("ns", "ser")
    val pred = LakePredicate.Le("o_orderkey", 100L)
    // interleave: another writer appends rows matching the predicate
    // between this handle's read and its commit — with retries disabled
    // the delete must fail loudly rather than leave the appended
    // matching rows alive
    val racerRows = ordersDF.filter(col("o_orderkey") <= 100).limit(5).coalesce(1)
    cat.loadTable("ns", "ser").appendData(racerRows)
    val ex = intercept[CommitConflictException](
      handle.deleteWhere(spark, pred, conflictRetries = 0))
    assert(ex.getMessage.contains("conflicts"))
    // with retries the delete re-runs against fresh metadata and removes
    // the racer's rows too (serial order: append, then delete)
    handle.refresh().deleteWhere(spark, pred)
    assert(handle.refresh().newScan(pred).toDF(spark).count() === 0)
  }

  test("disjoint CoW ops sharing a manifest do not conflict (file-path-level validation)") {
    val cat = LakeCatalog.open(freshWarehouse())
    val t = cat.createTable("ns", "disjoint", ordersDF.schema,
      spec = Seq(PartitionField("o_orderkey", "identity")))
    // ONE manifest holding range-clustered files across the key space
    t.appendData(ordersDF, numFiles = 4)
    val handle = cat.loadTable("ns", "disjoint") // base = snapshot 1
    // writer W rewrites the HIGH end of the shared manifest: untouched
    // low-range files are carried into a NEW survivor manifest
    cat.loadTable("ns", "disjoint")
      .deleteWhere(spark, LakePredicate.Gt("o_orderkey", 4000L))
    // handle H deletes the LOW end from its stale base. The survivor
    // manifest is new BY NAME, but its low-range files existed at H's
    // base — a manifest-name-level diff misread them as added-since-base
    // and failed H even though serial execution succeeds.
    val report = handle.deleteWhere(spark,
      LakePredicate.Le("o_orderkey", 10L), conflictRetries = 0)
    assert(report.attempts === 1)
    assert(cat.loadTable("ns", "disjoint").newScan().toDF(spark).count()
      === ordersDF.filter(col("o_orderkey") > 10 && col("o_orderkey") <= 4000).count())
  }

  test("serializable validation: merge vs racing append with overlapping keys") {
    val cat = LakeCatalog.open(freshWarehouse())
    val t = cat.createTable("ns", "mergeser", ordersDF.schema)
    t.appendData(ordersDF.filter(col("o_orderkey") > 100).coalesce(1))
    val handle = cat.loadTable("ns", "mergeser")
    // the merge source upserts keys 1..50 (insert-path: none live yet)
    val source = ordersDF.filter(col("o_orderkey") <= 50).coalesce(1)
    // a racer appends rows INSIDE the merge's key bounds between the
    // handle's read and its commit — without validation both commits
    // land and keys 1..50 exist twice (the upsert's distinct-key
    // invariant breaks silently)
    cat.loadTable("ns", "mergeser")
      .appendData(ordersDF.filter(col("o_orderkey") <= 50).coalesce(1))
    val ex = intercept[CommitConflictException](
      handle.mergeInto(spark, source, Seq("o_orderkey"), conflictRetries = 0))
    assert(ex.getMessage.contains("conflicts"))
    // with retries the merge re-runs on fresh metadata: the racer's rows
    // are now the match targets, so every key stays single
    handle.refresh().mergeInto(spark, source, Seq("o_orderkey"))
    val dupKeys = handle.refresh().newScan().toDF(spark)
      .groupBy(col("o_orderkey")).count().filter(col("count") > 1).count()
    assert(dupKeys === 0L, "upsert must leave every key single")
    // survivors: the initial >100 set, plus the ≤50 keys (racer's copies
    // replaced by the merge) — keys in (50, 100] were never written
    assert(handle.newScan().toDF(spark).count()
      === ordersDF.filter(col("o_orderkey") > 100 || col("o_orderkey") <= 50).count())
  }

  test("serializable validation: a racing append OUTSIDE the predicate commits clean") {
    val cat = LakeCatalog.open(freshWarehouse())
    val t = cat.createTable("ns", "ser2", ordersDF.schema)
    t.appendData(ordersDF.filter(col("o_orderkey") <= 1000).coalesce(1))
    val handle = cat.loadTable("ns", "ser2")
    // the racer's rows are provably outside the delete predicate's
    // range, so stats-based validation lets the delete commit first try
    cat.loadTable("ns", "ser2")
      .appendData(ordersDF.filter(col("o_orderkey") > 5000).coalesce(1))
    val report = handle.deleteWhere(spark,
      LakePredicate.Le("o_orderkey", 10L), conflictRetries = 0)
    assert(report.attempts === 1)
    assert(handle.refresh().newScan().toDF(spark).count()
      === ordersDF.filter(col("o_orderkey") > 10 && col("o_orderkey") <= 1000).count()
        + ordersDF.filter(col("o_orderkey") > 5000).count())
  }

  test("rewriteManifests consolidates metadata only: files untouched, seq scoping and history survive") {
    val cat = LakeCatalog.open(freshWarehouse())
    val t = cat.createTable("ns", "rwm", ordersDF.schema)
    (0 until 6).foreach(i =>
      t.refresh().appendData(ordersDF.filter(col("o_orderkey") % 6 === i)))
    // an eq-tombstone upsert BEFORE consolidation: its scoping (applies
    // to entries with strictly smaller seq) must survive the rewrite
    val upd = ordersDF.filter(col("o_orderkey") % 10 === 0)
      .withColumn("o_totalprice", col("o_totalprice") * 2)
    t.refresh().mergeIntoMoR(spark, upd, Seq("o_orderkey"))
    val expect = t.refresh().newScan().toDF(spark)
      .orderBy("o_orderkey").collect().toSeq
    val pathsBefore = t.metadata.currentFiles.map(_.path).toSet
    val cur = t.metadata.currentSnapshot.get
    assert(cur.manifests.count(_.content == ManifestRef.Data) === 7)
    val preId = t.currentSnapshotId

    val rep = t.rewriteManifests(minManifests = 2)
    assert(rep.nonEmpty && rep.get.addedDataFiles === 0L)
    val after = t.refresh().metadata.currentSnapshot.get
    assert(after.manifests.count(_.content == ManifestRef.Data) === 1)
    // no data file was touched — same paths, same per-entry seqs
    assert(t.metadata.currentFiles.map(_.path).toSet === pathsBefore)
    assert(t.metadata.currentFiles.map(f => f.path -> f.seq).toMap
      === cur.files.map(f => f.path -> f.seq).toMap)
    // eq tombstones still live, still subtracting exactly as before
    assert(after.eqDeleteFiles.nonEmpty)
    assert(t.newScan().toDF(spark).orderBy("o_orderkey").collect().toSeq === expect)
    // rollups carried exactly
    assert(after.fileCount === cur.fileCount &&
      after.totalRecords === cur.totalRecords)
    // history: the pre-consolidation snapshot still time-travels
    assert(t.asOf(preId).toDF(spark).count() === expect.size)
    // converges: a second run refuses to churn
    assert(t.rewriteManifests(minManifests = 2).isEmpty)
  }

  test("rewriteManifests racing appends loses no commit: the CAS transform re-consolidates") {
    val cat = LakeCatalog.open(freshWarehouse())
    val t = cat.createTable("ns", "rwrace", ordersDF.schema)
    (0 until 4).foreach(i =>
      t.refresh().appendData(ordersDF.filter(col("o_orderkey") % 4 === i)))
    val extra = ordersDF.limit(9)
      .withColumn("o_orderkey", col("o_orderkey") + 850000000L)
    // interleave: consolidation and appends race through the same CAS
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      val consolidate = pool.submit(new java.util.concurrent.Callable[AnyRef] {
        def call(): AnyRef = {
          cat.loadTable("ns", "rwrace").rewriteManifests(minManifests = 2); null
        }
      })
      val append = pool.submit(new java.util.concurrent.Callable[AnyRef] {
        def call(): AnyRef = {
          cat.loadTable("ns", "rwrace").appendData(extra); null
        }
      })
      consolidate.get(); append.get()
    } finally pool.shutdown()
    // every row of every commit survives, whoever won the race
    assert(t.refresh().newScan().toDF(spark).count()
      === ordersDF.count() + 9L)
  }
}
