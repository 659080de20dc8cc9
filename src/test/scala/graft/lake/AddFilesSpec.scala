package graft.lake

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** addFiles — Iceberg's add_files/migrate story: foreign parquet
  * (no engine field IDs) registers IN PLACE as ONE metadata commit.
  * Columns freeze into the table's name mapping, so renames after
  * import stay metadata-only; footer stats make pruning cover the
  * imported files from the first scan; compaction lazily upgrades
  * them to native ID-stamped files. */
class AddFilesSpec extends LakeSuite {

  private def extDir(name: String): String = {
    val d = Files.createTempDirectory(s"graft-ext-$name")
    d.toFile.deleteOnExit()
    d.toString
  }

  private def extRows = {
    import spark.implicits._
    (1 to 400).map(i => (i, i * 2.5d, s"doc$i")).toDF("id", "score", "body")
  }

  test("in-place registration: metadata-only commit, frozen-name reads across rename, stats pruning") {
    val src = extDir("reg")
    // range-disjoint files so footer stats have something to prune on
    extRows.repartitionByRange(4, col("id")).write.mode("overwrite").parquet(src)

    val cat = LakeCatalog.open(freshWarehouse())
    val t = cat.createTable("ns", "imp", extRows.schema)
    val report = t.addFiles(spark, src)
    assert(report.addedRecords === 400L)

    // the commit registered the SOURCE paths — no byte was rewritten
    val entries = t.refresh().metadata.currentFiles
    assert(entries.forall(_.nameMapped))
    assert(entries.forall(e =>
      new org.apache.hadoop.fs.Path(e.path).toUri.getPath.startsWith(src)))

    // reads resolve through the name mapping
    val back = t.newScan().toDF(spark)
    assert(back.count() === 400L)
    assert(back.agg(sum("id")).head.getLong(0) === (1 to 400).map(_.toLong).sum)

    // footer stats prune imported files like native ones
    val pruned = t.newScan(LakePredicate.Le("id", Int.box(50)))
    assert(pruned.planFiles.size < entries.size)
    assert(pruned.toDF(spark).count() === 50L)

    // rename AFTER import: mapping froze the import-time name, so the
    // renamed column keeps resolving in imported (ID-less) files
    t.refresh().renameColumn("score", "quality")
    val renamed = t.refresh().newScan().toDF(spark)
    assert(renamed.columns.contains("quality"))
    assert(math.abs(renamed.agg(sum("quality")).head.getDouble(0) -
      (1 to 400).map(_ * 2.5d).sum) < 1e-6)

    // a SECOND import whose files carry the ORIGINAL name still lands
    val src2 = extDir("reg2")
    import spark.implicits._
    (401 to 500).map(i => (i, i * 2.5d, s"doc$i")).toDF("id", "score", "body")
      .repartition(1).write.mode("overwrite").parquet(src2)
    t.refresh().addFiles(spark, src2)
    assert(t.refresh().newScan().toDF(spark).count() === 500L)

    // …but files carrying the RENAMED name would shadow the frozen
    // mapping (their bytes would go unread) — refused
    val src3 = extDir("reg3")
    (501 to 510).map(i => (i, i * 2.5d, s"doc$i")).toDF("id", "quality", "body")
      .repartition(1).write.mode("overwrite").parquet(src3)
    val e = intercept[IllegalArgumentException](t.refresh().addFiles(spark, src3))
    assert(e.getMessage.contains("pre-rename"))

    // column added after import projects null in imported files —
    // never an accidental by-name match
    t.refresh().addColumn("lang", StringType)
    val withLang = t.refresh().newScan().toDF(spark)
    assert(withLang.where(col("lang").isNotNull).count() === 0L)

    // duplicate registration refuses
    val dup = intercept[IllegalArgumentException](t.refresh().addFiles(spark, src))
    assert(dup.getMessage.contains("already-registered"))

    // type mismatch refuses
    val bad = extDir("badtype")
    (1 to 5).map(i => (s"$i", 1.0d, "x")).toDF("id", "score", "body")
      .write.mode("overwrite").parquet(bad)
    intercept[IllegalArgumentException](t.refresh().addFiles(spark, bad))
  }

  test("imported files compose with MoR tombstones, CoW, and compaction upgrade") {
    val src = extDir("mor")
    extRows.repartition(2).write.mode("overwrite").parquet(src)

    val cat = LakeCatalog.open(freshWarehouse())
    val t = cat.createTable("ns", "mix", extRows.schema)
    t.addFiles(spark, src)
    // native rows alongside imported ones
    import spark.implicits._
    t.refresh().appendData(
      (401 to 450).map(i => (i, i * 2.5d, s"doc$i")).toDF("id", "score", "body"))
    assert(t.refresh().newScan().toDF(spark).count() === 450L)

    // positional MoR delete lands tombstones on IMPORTED file paths
    t.refresh().deleteWhereMoR(spark, LakePredicate.Le("id", Int.box(100)))
    assert(t.refresh().newScan().toDF(spark).count() === 350L)

    // CoW update rewrites touched imported rows as native files
    t.refresh().updateWhere(spark, LakePredicate.Ge("id", Int.box(401)),
      Map("score" -> lit(0.0d)))
    val afterUpdate = t.refresh().newScan().toDF(spark)
    assert(afterUpdate.where(col("score") === 0.0d).count() === 50L)

    // compaction materializes everything into native ID-stamped files…
    t.refresh().compact(spark, targetFiles = 2)
    val post = t.refresh().metadata.currentFiles
    assert(post.forall(!_.nameMapped))
    assert(t.refresh().newScan().toDF(spark).count() === 350L)

    // …and the orphan sweep never touches the external directory
    t.refresh().removeOrphanFiles()
    val extLeft = Files.list(Paths.get(src)).toArray.length
    assert(extLeft >= 2, "external source files must survive maintenance")
  }

  test("nested struct import: internals resolve by name; nested rename refuses while imported files live") {
    import spark.implicits._
    val src = extDir("nested")
    val df = (1 to 50).map(i => (i, (s"t$i", i.toLong))).toDF("id", "s")
    df.write.mode("overwrite").parquet(src)

    val cat = LakeCatalog.open(freshWarehouse())
    val t = cat.createTable("ns", "nest", df.schema)
    t.addFiles(spark, src)
    val back = t.refresh().newScan().toDF(spark)
    assert(back.select(sum("s._2")).head.getLong(0) === (1 to 50).map(_.toLong).sum)

    // nested rename would silently null the field in ID-less imports
    val e = intercept[IllegalArgumentException](
      t.refresh().renameColumn("s._1", "title"))
    assert(e.getMessage.contains("imported"))

    // top-level rename is fine (mapping-frozen), and after compaction
    // materializes the imports, nested rename unblocks
    t.refresh().renameColumn("id", "doc_id")
    assert(t.refresh().newScan().toDF(spark).agg(sum("doc_id")).head.getLong(0)
      === (1 to 50).map(_.toLong).sum)
    t.refresh().compact(spark, targetFiles = 1)
    t.refresh().expireSnapshots(keepLast = 1)
    t.refresh().renameColumn("s._1", "title")
    assert(t.refresh().newScan().toDF(spark)
      .where(col("s.title").isNotNull).count() === 50L)

    // a SAME-SHAPE struct with DIFFERENT inner names refuses: mapped
    // reads resolve struct internals by name, so a structural-only
    // check would import cleanly and then read NULL for every field
    val src2 = extDir("nested-shape")
    (1 to 5).map(i => (i, (s"x$i", i.toLong))).toDF("id", "s")
      .select(col("id"), col("s").cast("struct<other:string,thing:bigint>").as("s"))
      .write.mode("overwrite").parquet(src2)
    val cat2 = LakeCatalog.open(freshWarehouse())
    val t2 = cat2.createTable("ns", "shape", df.schema)
    val mismatch = intercept[IllegalArgumentException](t2.addFiles(spark, src2))
    assert(mismatch.getMessage.contains("struct<other:string,thing:bigint>"))
  }

  test("SQL surface: CALL add_files registers; SELECT reads through the substitution; streaming refuses imports") {
    val wh = freshWarehouse()
    spark.conf.set("spark.sql.catalog.afc", classOf[sql.LakeSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.afc.warehouse", wh)
    try {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS afc.ns")
      spark.sql("CREATE TABLE afc.ns.ext (id INT, score DOUBLE, body STRING)")
      val src = extDir("sql")
      extRows.repartition(2).write.mode("overwrite").parquet(src)

      val res = spark.sql(s"CALL afc.system.add_files('ns.ext', '$src')").head
      assert(res.getLong(0) === 2L)
      assert(res.getLong(1) === 400L)

      // batch SQL reads route through the engine substitution (the
      // direct parquet path cannot resolve ID-less imported files)
      assert(spark.sql("SELECT sum(id) FROM afc.ns.ext").head.getLong(0)
        === (1 to 400).map(_.toLong).sum)
      assert(spark.sql("SELECT count(*) FROM afc.ns.ext WHERE id <= 50").head.getLong(0)
        === 50L)

      // a stream tailing the table refuses the import commit loudly
      val chk = Files.createTempDirectory("graft-addfiles-chk").toString
      val q = spark.readStream
        .option("stream-from", "beginning")
        .table("afc.ns.ext")
        .writeStream
        .format("memory")
        .queryName("addfiles_stream")
        .option("checkpointLocation", chk)
        .start()
      val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      q.stop()
      assert(err.getMessage.contains("addFiles import") ||
        Option(err.getCause).exists(_.getMessage.contains("addFiles import")))
    } finally {
      spark.conf.unset("spark.sql.catalog.afc")
      spark.conf.unset("spark.sql.catalog.afc.warehouse")
    }
  }
}
