package graft.lake

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured-Streaming SOURCE over a lake table: readStream tails
  * append commits (offset = snapshot id), skips compactions, refuses
  * mutation snapshots, and — paired with the exactly-once lake sinks —
  * closes the lake→lake exactly-once loop. */
class LakeStreamSourceSpec extends LakeSuite {

  private var n = 0
  private def sqlTable(): (String, LakeTable) = {
    n += 1
    val wh = freshWarehouse()
    val cat = s"strsrc$n"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[sql.LakeSqlCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE $cat.ns")
    spark.sql(s"CREATE TABLE $cat.ns.t (${ordersDF.schema.toDDL})")
    (s"$cat.ns.t", LakeCatalog.open(wh).loadTable("ns", "t"))
  }

  private def runAvailable(name: String, checkpoint: String,
      opts: Map[String, String] = Map.empty)(
      onBatch: (org.apache.spark.sql.DataFrame, Long) => Unit): Unit = {
    var reader = spark.readStream.option("stream-from", "beginning")
    opts.foreach { case (k, v) => reader = reader.option(k, v) }
    val q = reader.table(name).writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch(onBatch)
      .start()
    q.awaitTermination()
  }

  test("beginning mode replays appends once; checkpoint restart reads only new commits") {
    val (name, t) = sqlTable()
    val even = ordersDF.filter(col("o_orderkey") % 2 === 0)
    val odd = ordersDF.filter(col("o_orderkey") % 2 === 1)
    t.appendData(even)
    t.refresh().appendData(odd)

    val ckpt = Files.createTempDirectory("graft_src_ck_").toString
    val seen = scala.collection.mutable.ArrayBuffer.empty[Long]
    runAvailable(name, ckpt) { (df, _) => seen += df.count() }
    assert(seen.sum === ordersDF.count()) // both appends, exactly once

    // a third append: the SAME checkpoint resumes past what it read
    val extra = ordersDF.filter(col("o_orderkey") % 100 === 0)
      .withColumn("o_orderkey", col("o_orderkey") + 500000000L)
    t.refresh().appendData(extra)
    seen.clear()
    runAvailable(name, ckpt) { (df, _) => seen += df.count() }
    assert(seen.sum === extra.count())

    // and a re-run with nothing new emits nothing
    seen.clear()
    runAvailable(name, ckpt) { (df, _) => seen += df.count() }
    assert(seen.sum === 0L)
  }

  test("compaction snapshots stream no rows; mutation snapshots refuse unless skipped") {
    val (name, t) = sqlTable()
    t.appendData(ordersDF.filter(col("o_orderkey") % 2 === 0), numFiles = 3)
    t.refresh().appendData(ordersDF.filter(col("o_orderkey") % 2 === 1), numFiles = 3)
    t.refresh().compact(spark, targetFiles = 1)

    // replace (compact) skipped: full history streams each row ONCE
    val ckpt = Files.createTempDirectory("graft_src_ck2_").toString
    var total = 0L
    runAvailable(name, ckpt) { (df, _) => total += df.count() }
    assert(total === ordersDF.count())

    // a CoW delete is a mutation: the stream must refuse...
    t.refresh().deleteWhere(spark, LakePredicate.Eq("o_orderstatus", "F"))
    t.refresh().appendData(ordersDF.limit(7).withColumn("o_orderkey",
      col("o_orderkey") + 900000000L))
    val e = intercept[Exception] {
      runAvailable(name, ckpt) { (_, _) => () }
    }
    def causes(x: Throwable): Seq[Throwable] =
      if (x == null) Nil else x +: causes(x.getCause)
    assert(causes(e).exists(_.getMessage.contains("skip-mutation-snapshots")))

    // ...and with the option set it streams past, delivering the append
    total = 0L
    runAvailable(name, ckpt, Map("skip-mutation-snapshots" -> "true")) {
      (df, _) => total += df.count()
    }
    assert(total === 7L)
  }

  test("lake-to-lake pipeline is exactly-once end to end") {
    val (srcName, src) = sqlTable()
    val cat = LakeCatalog.open(freshWarehouse())
    val dst = cat.createTable("ns", "dst", ordersDF.schema)
    src.appendData(ordersDF.filter(col("o_orderkey") % 2 === 0))
    src.refresh().appendData(ordersDF.filter(col("o_orderkey") % 2 === 1))

    val ckpt = Files.createTempDirectory("graft_src_ck3_").toString
    def pump(): Unit = runAvailable(srcName, ckpt) { (df, batchId) =>
      dst.refresh().appendDataExactlyOnce(df, "pipe", batchId)
      ()
    }
    pump()
    assert(dst.refresh().newScan().toDF(spark).count() === ordersDF.count())
    // pumping again with nothing new adds nothing; a new source commit
    // flows through exactly once
    pump()
    assert(dst.refresh().newScan().toDF(spark).count() === ordersDF.count())
    val extra = ordersDF.limit(11).withColumn("o_orderkey", col("o_orderkey") + 700000000L)
    src.refresh().appendData(extra)
    pump()
    assert(dst.refresh().newScan().toDF(spark).count() === ordersDF.count() + 11L)
    assert(dst.newScan().toDF(spark).select("o_orderkey").distinct().count()
      === ordersDF.count() + 11L)
  }

  test("max-files-per-trigger drains a backlog as bounded micro-batches") {
    val (name, t) = sqlTable()
    // 4 append commits x 2 files: an 8-file backlog
    (0 until 4).foreach { i =>
      t.refresh().appendData(ordersDF.filter(col("o_orderkey") % 4 === i), numFiles = 2)
    }
    val ckpt = Files.createTempDirectory("graft_src_ck5_").toString
    val batches = scala.collection.mutable.ArrayBuffer.empty[Long]
    runAvailable(name, ckpt, Map("max-files-per-trigger" -> "4")) {
      (df, _) => batches += df.count()
    }
    // bounded batches (2 commits = 4 files each), nothing lost, nothing twice
    assert(batches.count(_ > 0L) === 2)
    assert(batches.sum === ordersDF.count())
  }

  test("max-bytes-per-trigger bounds batches by rollup deltas; composes with the file cap") {
    val (name, t) = sqlTable()
    (0 until 4).foreach { i =>
      t.refresh().appendData(ordersDF.filter(col("o_orderkey") % 4 === i), numFiles = 2)
    }
    // per-commit added bytes from the rollup ladder
    val m = t.refresh().metadata
    val perCommit = m.snapshots.sortBy(_.id).map(_.totalSizeBytes)
      .sliding(2).map(p => p(1) - p(0)).toSeq
    val oneCommit = perCommit.max
    val ckpt = Files.createTempDirectory("graft_src_ck7_").toString
    val batches = scala.collection.mutable.ArrayBuffer.empty[Long]
    // cap below two commits' bytes: the backlog drains one commit per batch
    runAvailable(name, ckpt, Map("max-bytes-per-trigger" -> oneCommit.toString)) {
      (df, _) => batches += df.count()
    }
    assert(batches.count(_ > 0L) === 4)
    assert(batches.sum === ordersDF.count())

    // composed caps: a generous byte cap with a 4-file cap → file cap rules
    t.refresh().appendData(ordersDF.limit(5)
      .withColumn("o_orderkey", col("o_orderkey") + 800000000L), numFiles = 2)
    t.refresh().appendData(ordersDF.limit(6)
      .withColumn("o_orderkey", col("o_orderkey") + 810000000L), numFiles = 2)
    val batches2 = scala.collection.mutable.ArrayBuffer.empty[Long]
    runAvailable(name, ckpt, Map(
      "max-bytes-per-trigger" -> (oneCommit * 100).toString,
      "max-files-per-trigger" -> "4")) { (df, _) => batches2 += df.count() }
    assert(batches2.count(_ > 0L) === 1) // 2 commits x 2 files fit one batch
    assert(batches2.sum === 11L)
  }

  test("a cherry-picked wap.id snapshot streams as a normal append, exactly once") {
    val (name, t) = sqlTable()
    t.appendData(ordersDF.filter(col("o_orderkey") % 2 === 0))
    val ckpt = Files.createTempDirectory("graft_src_ck8_").toString
    var total = 0L
    runAvailable(name, ckpt) { (df, _) => total += df.count() }
    assert(total === ordersDF.filter(col("o_orderkey") % 2 === 0).count())

    // stage invisibly, pump (nothing flows), publish, pump (flows once)
    val staged = t.refresh().stageAppend(
      ordersDF.filter(col("o_orderkey") % 2 === 1), "etl-1")
    total = 0L
    runAvailable(name, ckpt) { (df, _) => total += df.count() }
    assert(total === 0L) // unpublished = invisible to the stream
    t.refresh().cherrypick(staged.snapshotId)
    runAvailable(name, ckpt) { (df, _) => total += df.count() }
    assert(total === ordersDF.filter(col("o_orderkey") % 2 === 1).count())
  }

  test("the branch option tails a staged branch; main commits stay invisible to it") {
    val (name, t) = sqlTable()
    val base = ordersDF.filter(col("o_orderkey") % 2 === 0)
    t.appendData(base)
    t.createBranch("stage")
    t.refresh().appendDataToBranch("stage", ordersDF.filter(col("o_orderkey") % 4 === 1))
    // an unrelated main commit: the branch stream must not deliver it
    t.refresh().appendData(ordersDF.limit(9)
      .withColumn("o_orderkey", col("o_orderkey") + 300000000L))
    t.refresh().appendDataToBranch("stage", ordersDF.filter(col("o_orderkey") % 4 === 3))

    val ckpt = Files.createTempDirectory("graft_src_ck6_").toString
    var total = 0L
    var reader = spark.readStream.option("stream-from", "beginning")
      .option("branch", "stage")
    val q = reader.table(name).writeStream
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        total += df.count(); ()
      }.start()
    q.awaitTermination()
    // base + both staged halves — and NOT the main-only commit (the
    // branch lineage never contains it)
    assert(total === ordersDF.count())
  }

  test("expired checkpoint offset refuses — never re-streams the live set as appends") {
    val (name, t) = sqlTable()
    t.appendData(ordersDF.filter(col("o_orderkey") % 2 === 0))
    t.refresh().appendData(ordersDF.filter(col("o_orderkey") % 2 === 1))
    val ckpt = Files.createTempDirectory("graft_src_ck7_").toString
    var total = 0L
    runAvailable(name, ckpt) { (df, _) => total += df.count() }
    assert(total === ordersDF.count()) // checkpointed offset = snapshot 2

    // two more commits, then routine expiry that removes the OFFSET
    // snapshot itself: snapshot 3's parent (the offset, id 2) no longer
    // resolves — its added-files delta is unknowable, and resolving it
    // to "empty parent" would re-stream snapshot 3's ENTIRE live file
    // set into the exactly-once sink
    t.refresh().appendData(ordersDF.limit(5)
      .withColumn("o_orderkey", col("o_orderkey") + 800000000L))
    t.refresh().appendData(ordersDF.limit(5)
      .withColumn("o_orderkey", col("o_orderkey") + 810000000L))
    t.refresh().expireSnapshots(keepLast = 2)
    assert(t.refresh().metadata.snapshot(2L).isEmpty) // the offset is gone

    val e = intercept[Exception] {
      runAvailable(name, ckpt) { (_, _) => () }
    }
    def causes(x: Throwable): Seq[Throwable] =
      if (x == null) Nil else x +: causes(x.getCause)
    assert(causes(e).exists(c => Option(c.getMessage)
      .exists(_.contains("restart from a fresh checkpoint"))))
  }

  test("streaming tails appends over a table carrying live MoR tombstones") {
    val (name, t) = sqlTable()
    t.appendData(ordersDF, numFiles = 2)
    t.refresh().deleteWhereMoR(spark, LakePredicate.Eq("o_orderstatus", "F"))
    assert(t.refresh().metadata.currentSnapshot.exists(_.deleteFiles.nonEmpty))
    // start AFTER the tombstone commit: the stream tails appends only
    // and never reads tombstoned files — building the BATCH delegate
    // here (which refuses live tombstones without the extensions, and
    // plans the full file list) would fail the stream start for nothing
    val fromId = t.refresh().currentSnapshotId
    val extra = ordersDF.limit(7)
      .withColumn("o_orderkey", col("o_orderkey") + 900000000L)
    t.refresh().appendData(extra)
    val ckpt = Files.createTempDirectory("graft_src_ck8_").toString
    var total = 0L
    runAvailable(name, ckpt, Map("stream-from-snapshot" -> fromId.toString)) {
      (df, _) => total += df.count()
    }
    assert(total === 7L)
  }

  test("a MoR upsert mid-stream refuses by default — CDC consumers cannot double-read keys") {
    val (name, t) = sqlTable()
    t.appendData(ordersDF.filter(col("o_orderkey") % 2 === 0))
    val ckpt = Files.createTempDirectory("graft_src_ck9_").toString
    var total = 0L
    runAvailable(name, ckpt) { (df, _) => total += df.count() }

    // an MoR upsert is snapshot-typed 'overwrite' (it retroactively
    // replaces same-key rows via equality tombstones), NOT an append —
    // an append-only feed streaming its data files would deliver
    // replacement rows for keys it already emitted (a silent double
    // read). The mutation refusal covers it; skip-mutation-snapshots
    // documents the opt-out (new-data-only pipelines, replaced keys
    // intentionally dropped).
    val upd = ordersDF.filter(col("o_orderkey") % 10 === 0)
      .withColumn("o_totalprice", col("o_totalprice") * 2)
    t.refresh().mergeIntoMoR(spark, upd, Seq("o_orderkey"))
    val after = ordersDF.limit(3)
      .withColumn("o_orderkey", col("o_orderkey") + 910000000L)
    t.refresh().appendData(after)

    val e = intercept[Exception] {
      runAvailable(name, ckpt) { (_, _) => () }
    }
    def causes(x: Throwable): Seq[Throwable] =
      if (x == null) Nil else x +: causes(x.getCause)
    assert(causes(e).exists(c => Option(c.getMessage)
      .exists(_.contains("skip-mutation-snapshots"))))

    // with the opt-out, the upsert commit is skipped wholesale (its
    // replacement rows are dropped, not double-delivered) and the
    // later plain append flows through
    var skipped = 0L
    runAvailable(name, ckpt, Map("skip-mutation-snapshots" -> "true")) {
      (df, _) => skipped += df.count()
    }
    assert(skipped === 3L)
  }

  test("native DSv2 streaming sink: writeStream.toTable is exactly-once, no foreachBatch") {
    val (srcName, src) = sqlTable()
    val (dstName, dst) = sqlTable()
    src.appendData(ordersDF.filter(col("o_orderkey") % 2 === 0))
    src.refresh().appendData(ordersDF.filter(col("o_orderkey") % 2 === 1))

    val ckpt = Files.createTempDirectory("graft_sink_ck_").toString
    def pump(): Unit = {
      val q = spark.readStream.option("stream-from", "beginning").table(srcName)
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .toTable(dstName)
      q.awaitTermination()
    }
    pump()
    val out = dst.refresh().newScan().toDF(spark)
    assert(out.count() === ordersDF.count())
    assert(out.select("o_orderkey").distinct().count() === ordersDF.count())
    // values survive the executor-side parquet write (float-sum order
    // differs across partitionings; compare within ulp-scale tolerance)
    val sum0 = ordersDF.agg(sum("o_totalprice")).head.getDouble(0)
    val sum1 = out.agg(sum("o_totalprice")).head.getDouble(0)
    assert(math.abs(sum1 - sum0) <= 1e-9 * math.abs(sum0))

    // replay with nothing new: the (queryId, epoch) ledger no-ops
    pump()
    assert(dst.refresh().newScan().toDF(spark).count() === ordersDF.count())
    // a new source commit flows through exactly once
    val extra = ordersDF.limit(13)
      .withColumn("o_orderkey", col("o_orderkey") + 600000000L)
    src.refresh().appendData(extra)
    pump()
    assert(dst.refresh().newScan().toDF(spark).count() === ordersDF.count() + 13L)
    // timestamps wrote as micros with footer stats: pruning still works
    assert(dst.newScan(LakePredicate.Ge("o_orderkey", Long.box(600000000L)))
      .toDF(spark).count() === 13L)
  }

  test("streaming writes stage on a WAP branch; fastForward publishes; wap.id still refuses") {
    val (srcName, src) = sqlTable()
    val (dstName, dst) = sqlTable()
    src.appendData(ordersDF.filter(col("o_orderkey") % 2 === 1))
    // the branch needs a snapshot to fork from: seed main
    val seed = ordersDF.filter(col("o_orderkey") % 2 === 0)
    dst.appendData(seed)

    val ckpt = Files.createTempDirectory("graft_wapsink_ck_").toString
    def pump(): Unit = {
      val q = spark.readStream.option("stream-from", "beginning").table(srcName)
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .toTable(dstName)
      q.awaitTermination()
    }
    spark.conf.set("spark.wap.branch", "audit")
    try {
      pump()
      // main untouched; the branch staged seed + streamed epochs
      assert(dst.refresh().newScan().toDF(spark).count() === seed.count())
      assert(dst.scanRef("audit").toDF(spark).count() === ordersDF.count())
      // replay with nothing new: the epoch ledger no-ops on the branch
      pump()
      assert(dst.refresh().scanRef("audit").toDF(spark).count() === ordersDF.count())
      // audit passed: one pointer move publishes the streamed prefix
      dst.refresh().fastForward("audit")
      assert(dst.refresh().newScan().toDF(spark).count() === ordersDF.count())
      // wap.id keeps refusing for streams (no publishable unit)
      spark.conf.unset("spark.wap.branch")
      spark.conf.set("spark.wap.id", "stream-audit-1")
      val e = intercept[Exception] {
        val more = ordersDF.limit(7)
          .withColumn("o_orderkey", col("o_orderkey") + 700000000L)
        src.refresh().appendData(more)
        pump()
      }
      def causes(x: Throwable): Seq[Throwable] =
        if (x == null) Nil else x +: causes(x.getCause)
      assert(causes(e).exists(c => Option(c.getMessage)
        .exists(_.contains("spark.wap.id"))))
    } finally {
      spark.conf.unset("spark.wap.branch")
      spark.conf.unset("spark.wap.id")
    }
  }

  test("historical AS OF handles do not stream; offsets survive rollback monotonically") {
    val (name, t) = sqlTable()
    val first = t.appendData(ordersDF.filter(col("o_orderkey") % 2 === 0))
    t.refresh().appendData(ordersDF.filter(col("o_orderkey") % 2 === 1))

    // VERSION AS OF handles advertise no MICRO_BATCH_READ capability
    val historical = new sql.LakeSqlTable(t.refresh(), Some(first.snapshotId))
    assert(!historical.capabilities().contains(
      org.apache.spark.sql.connector.catalog.TableCapability.MICRO_BATCH_READ))

    // stream, roll back the second append, then redo: the checkpoint
    // keeps working because ids stay monotonic and the abandoned
    // lineage is not an ancestor of later offsets
    val ckpt = Files.createTempDirectory("graft_src_ck4_").toString
    var total = 0L
    runAvailable(name, ckpt) { (df, _) => total += df.count() }
    assert(total === ordersDF.count())
    t.refresh().rollbackTo(first.snapshotId)
    val redo = ordersDF.filter(col("o_orderkey") % 2 === 1)
      .withColumn("o_totalprice", col("o_totalprice") * 2)
    t.refresh().appendData(redo)
    total = 0L
    runAvailable(name, ckpt) { (df, _) => total += df.count() }
    assert(total === redo.count())
  }
}
