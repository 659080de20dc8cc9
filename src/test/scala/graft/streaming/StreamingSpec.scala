package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.lake.LakeSuite

/** Streaming ≡ batch equivalence on a bounded input: the streaming
  * windowed agg and the stateful per-user totals must agree with their
  * batch formulations over the same files. */
class StreamingSpec extends LakeSuite {

  private lazy val stagedDir: String = {
    // stage a normalized (micros-timestamp) copy of events for the
    // file-stream source
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_").toString
    graft.queries.Tables.events(spark, "/root/testdata/sf0.001")
      .write.mode("overwrite").parquet(dir)
    dir
  }

  private lazy val staticEvents = spark.read.parquet(stagedDir)

  test("streaming windowed counts == batch windowed counts") {
    val streamed = EventStream.runToMemory(
      EventStream.windowedCounts(spark, staticEvents.schema, stagedDir),
      "win_counts", OutputMode.Complete())
    val batch = staticEvents
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))
    assert(streamed.count() === batch.count())
    assert(streamed.except(batch).count() === 0)
    assert(batch.except(streamed).count() === 0)
  }

  test("flatMapGroupsWithState sessionization == batch gap-detection counts") {
    val streamed = EventStream.runToMemory(
      EventStream.sessionize(spark, staticEvents.schema, stagedDir).toDF(),
      "sessions", OutputMode.Append())
    val finals = streamed.groupBy(col("user_id"))
      .agg(max(col("n_sessions")).as("n_sessions"), max(col("n_events")).as("n_events"))
    val batch = graft.queries.EventQueries.qEvSessionize(spark, "/root/testdata/sf0.001")
    assert(finals.except(batch).count() === 0)
    assert(batch.except(finals).count() === 0)
  }

  test("sessionization does NOT double-count sessions spanning two micro-batches") {
    import org.apache.spark.sql.functions.col
    // split events at the median ts into two files delivered as two
    // separate micro-batches against one running query
    val dir = java.nio.file.Files.createTempDirectory("graft_stream2_").toString
    val all = staticEvents.orderBy(col("ts"))
    val n = all.count()
    val firstHalf = all.limit((n / 2).toInt)
    val cut = firstHalf.agg(org.apache.spark.sql.functions.max(col("ts"))).head.getTimestamp(0)
    firstHalf.write.mode("overwrite").parquet(s"$dir/batch")
    val q = EventStream.sessionize(spark, staticEvents.schema, s"$dir/batch").toDF()
      .writeStream.format("memory").queryName("sess2")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append()).start()
    try {
      q.processAllAvailable() // batch 1
      all.filter(col("ts") > cut).write.mode("append").parquet(s"$dir/batch")
      q.processAllAvailable() // batch 2
    } finally q.stop()
    val finals = spark.table("sess2").groupBy(col("user_id"))
      .agg(org.apache.spark.sql.functions.max(col("n_sessions")).as("n_sessions"),
        org.apache.spark.sql.functions.max(col("n_events")).as("n_events"))
    val batch = graft.queries.EventQueries.qEvSessionize(spark, "/root/testdata/sf0.001")
    assert(finals.except(batch).count() === 0)
    assert(batch.except(finals).count() === 0)
  }

  test("streaming dedup drops re-delivered events; clean stream passes through") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream3_").toString
    // duplicate delivery: every event arrives twice (at-least-once source)
    staticEvents.write.mode("overwrite").parquet(s"$dir/in")
    staticEvents.write.mode("append").parquet(s"$dir/in")
    val deduped = EventStream.runToMemory(
      EventStream.dedupedEvents(spark, staticEvents.schema, s"$dir/in"),
      "deduped", OutputMode.Append())
    assert(deduped.count() === staticEvents.count())
    assert(deduped.select(col("event_id")).distinct().count() === staticEvents.count())
  }

  test("stateful mapGroupsWithState totals == batch groupBy totals") {
    val streamed = EventStream.runToMemory(
      EventStream.runningUserTotals(spark, staticEvents.schema, stagedDir).toDF(),
      "user_totals", OutputMode.Update())
    // Update-mode emits one row per user per batch; bounded input in one
    // batch -> final state per user
    val finalState = streamed.groupBy(col("user_id"))
      .agg(max(col("n_events")).as("n_events"))
    val batch = staticEvents.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"))
    assert(finalState.except(batch).count() === 0)
    assert(batch.except(finalState).count() === 0)
  }

  test("streaming last-touch attribution == batch q_ev_attribution, across micro-batches") {
    // carried-touch state must survive the batch cut: a click in
    // micro-batch 1 attributes a purchase in micro-batch 2
    val dir = java.nio.file.Files.createTempDirectory("graft_attr_").toString
    val cut = staticEvents.orderBy(col("ts"))
      .limit((staticEvents.count() / 2).toInt)
      .agg(max(col("ts"))).head.getTimestamp(0)
    staticEvents.filter(col("ts") <= cut).write.mode("overwrite").parquet(s"$dir/in")
    val q = EventStream.attributionProgress(spark, staticEvents.schema, s"$dir/in").toDF()
      .writeStream.format("memory").queryName("attr_prog")
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      staticEvents.filter(col("ts") > cut).write.mode("append").parquet(s"$dir/in")
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("attr_prog")
      // each purchase appears exactly once across all micro-batches
      .groupBy(col("touch_type"))
      .agg(count(lit(1)).as("n_purchases"), sum(col("cents")).as("revenue_cents"))
    val batch = graft.queries.EventQueries
      .qEvAttribution(spark, "/root/testdata/sf0.001")
    assert(streamed.except(batch).count() === 0)
    assert(batch.except(streamed).count() === 0)
    val total = spark.table("attr_prog").count()
    val dedup = spark.table("attr_prog").select(col("event_id")).distinct().count()
    assert(total === dedup, "a purchase was attributed more than once")
  }

  test("streaming funnel final stages == batch funnel counts, across micro-batches") {
    // two chronological micro-batches against one running query — step
    // transitions spanning the cut (view in batch 1, click in batch 2)
    // must survive through state
    val dir = java.nio.file.Files.createTempDirectory("graft_funnel_").toString
    // split on ts <= median-cut / ts > cut: exhaustive regardless of
    // timestamp ties (a limit(n/2) split can silently drop a tied event
    // from BOTH batches)
    val cut = staticEvents.orderBy(col("ts"))
      .limit((staticEvents.count() / 2).toInt)
      .agg(max(col("ts"))).head.getTimestamp(0)
    staticEvents.filter(col("ts") <= cut).write.mode("overwrite").parquet(s"$dir/in")
    val q = EventStream.funnelProgress(spark, staticEvents.schema, s"$dir/in").toDF()
      .writeStream.format("memory").queryName("funnel_prog")
      .outputMode(OutputMode.Append()).start()
    val afterBatch1 = try {
      q.processAllAvailable()
      val snap = spark.table("funnel_prog").groupBy(col("user_id"))
        .agg(max(col("stage")).as("stage")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      staticEvents.filter(col("ts") > cut).write.mode("append").parquet(s"$dir/in")
      q.processAllAvailable()
      snap
    } finally q.stop()
    val finals = spark.table("funnel_prog").groupBy(col("user_id"))
      .agg(max(col("stage")).as("stage"))
    // streaming per-user stage k ⟺ the user converts through step k in
    // the batch funnel, so stage-weighted counts reproduce q_ev_funnel
    val streamedCounts = (1 to 3).map(k =>
      finals.filter(col("stage") >= k).count())
    val batch = graft.queries.EventQueries
      .qEvFunnel(spark, "/root/testdata/sf0.001").collect()
      .map(r => r.getLong(2))
    assert(streamedCounts == batch.toSeq,
      s"streaming $streamedCounts != batch ${batch.toSeq}")
    // stages only ever move FORWARD across batches: the batch-1 snapshot
    // never exceeds the final stage for any user (state loss/reset would
    // show as a decrease)
    val finalByUser = finals.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    afterBatch1.foreach { case (user, s1) =>
      assert(finalByUser.getOrElse(user, -1L) >= s1,
        s"user $user regressed from stage $s1 to ${finalByUser.get(user)}")
    }
  }

  test("streaming lake sink: one append commit per micro-batch, replay-idempotent") {
    import graft.lake.{LakeCatalog, LakePredicate}
    val cat = LakeCatalog.open(freshWarehouse())
    val t = cat.createTable("ns", "stream_sink", staticEvents.schema)
    val ckpt = java.nio.file.Files.createTempDirectory("graft_sink_ckpt_").toString
    val q = EventStream.lakeAppendSink(
      spark.readStream.schema(staticEvents.schema).parquet(stagedDir),
      t, ckpt)
    try q.processAllAvailable() finally q.stop()
    val total = staticEvents.count()
    assert(t.refresh().newScan().toDF(spark).count() === total)
    // every commit is a real snapshot stamped with its sink + batch id
    val snaps = t.snapshots
    assert(snaps.nonEmpty)
    assert(snaps.forall(_.summary.contains("streaming-batch-id")))
    val sinkId = EventStream.sinkIdFor(spark, ckpt)
    assert(snaps.forall(_.summary.get("streaming-sink-id").contains(sinkId)))
    // recovering the SAME checkpoint reuses the sink id
    assert(EventStream.sinkIdFor(spark, ckpt) === sinkId)
    // a checkpoint-recovery REPLAY of an already-committed batch is a
    // no-op: the ledger lives in table properties
    val lastBatch = t.lastCommittedBatchId(sinkId).get
    assert(!EventStream.appendBatchIdempotent(t, staticEvents.limit(50), sinkId, lastBatch))
    assert(t.refresh().newScan().toDF(spark).count() === total)
    assert(t.snapshots.size === snaps.size)
    // the ledger SURVIVES snapshot expiry: replay still a no-op after
    // all append snapshots are expired (summaries are gone; properties
    // are not) — the double-append hole a summary-scan ledger leaves
    t.expireSnapshots(keepLast = 1)
    assert(!EventStream.appendBatchIdempotent(t, staticEvents.limit(50), sinkId, lastBatch))
    assert(t.refresh().newScan().toDF(spark).count() === total)
    // a NEW batch id on the same sink commits normally
    assert(EventStream.appendBatchIdempotent(t, staticEvents.limit(5), sinkId, lastBatch + 1))
    assert(t.refresh().newScan().toDF(spark).count() === total + 5)
    // a DIFFERENT sink (fresh checkpoint) starts its own ledger at 0
    val ckpt2 = java.nio.file.Files.createTempDirectory("graft_sink_ckpt2_").toString
    val sink2 = EventStream.sinkIdFor(spark, ckpt2)
    assert(sink2 !== sinkId)
    assert(EventStream.appendBatchIdempotent(t, staticEvents.limit(3), sink2, 0L))
    assert(t.refresh().newScan().toDF(spark).count() === total + 8)
  }

  test("streaming upsert sink: per-batch MERGE, replay-idempotent, updates win") {
    import graft.lake.LakeCatalog
    val cat = LakeCatalog.open(freshWarehouse())
    val t = cat.createTable("ns", "upsert_sink", staticEvents.schema)
    // seed: every event with value zeroed — the stream must OVERWRITE these
    t.appendData(staticEvents.withColumn("value", lit(0.0)))
    val ckpt = java.nio.file.Files.createTempDirectory("graft_upsert_ckpt_").toString
    val q = EventStream.lakeUpsertSink(
      spark.readStream.schema(staticEvents.schema).parquet(stagedDir),
      t, Seq("event_id"), ckpt)
    try q.processAllAvailable() finally q.stop()
    // same cardinality (every key existed), real values restored
    assert(t.refresh().newScan().toDF(spark).count() === staticEvents.count())
    val sumBefore = staticEvents.agg(round(sum(col("value")), 2)).head.getDouble(0)
    assert(t.newScan().toDF(spark).agg(round(sum(col("value")), 2)).head.getDouble(0)
      === sumBefore)
    // replaying a committed batch through the merge path is a no-op
    val sinkId = EventStream.sinkIdFor(spark, ckpt)
    val last = t.lastCommittedBatchId(sinkId).get
    assert(t.mergeIntoExactlyOnce(spark, staticEvents.limit(5)
      .withColumn("value", lit(9.9)), Seq("event_id"), sinkId, last).isEmpty)
    assert(t.refresh().newScan().toDF(spark).agg(round(sum(col("value")), 2))
      .head.getDouble(0) === sumBefore)
    // a NEW batch merges: 5 updated + no inserts
    assert(t.mergeIntoExactlyOnce(spark, staticEvents.limit(5)
      .withColumn("value", lit(0.0)), Seq("event_id"), sinkId, last + 1).isDefined)
    assert(t.refresh().newScan().toDF(spark).count() === staticEvents.count())
  }

  test("streaming upsert sink, merge-on-read strategy: O(batch) commits, same answers") {
    import graft.lake.LakeCatalog
    val cat = LakeCatalog.open(freshWarehouse())
    val t = cat.createTable("ns", "upsert_mor", staticEvents.schema)
    t.appendData(staticEvents.withColumn("value", lit(0.0))) // seed to overwrite
    val seeded = t.refresh().metadata.currentFiles.map(_.path).toSet
    val ckpt = java.nio.file.Files.createTempDirectory("graft_mor_ckpt_").toString
    val q = EventStream.lakeUpsertSink(
      spark.readStream.schema(staticEvents.schema).parquet(stagedDir),
      t, Seq("event_id"), ckpt, strategy = "mor")
    try q.processAllAvailable() finally q.stop()
    // merge-on-read: the seed files were never rewritten...
    assert(seeded.subsetOf(t.refresh().metadata.currentFiles.map(_.path).toSet))
    // ...yet every key reads back its streamed (non-zero) value
    assert(t.newScan().toDF(spark).count() === staticEvents.count())
    val sumBefore = staticEvents.agg(round(sum(col("value")), 2)).head.getDouble(0)
    assert(t.newScan().toDF(spark).agg(round(sum(col("value")), 2)).head.getDouble(0)
      === sumBefore)
    // compaction folds the tombstones down; answers unchanged
    t.refresh().compact(spark, targetFiles = 2)
    assert(t.refresh().newScan().toDF(spark)
      .agg(round(sum(col("value")), 2)).head.getDouble(0) === sumBefore)
  }

  test("upsert sink per-key ordering: orderBy column makes last-write-wins deterministic") {
    import graft.lake.LakeCatalog
    val cat = LakeCatalog.open(freshWarehouse())
    val t = cat.createTable("ns", "upsert_lww", staticEvents.schema)
    // a CDC-shaped batch: every event arrives THREE times with versions
    // v=1,2,3 encoded as ts+v hours and value=v, shuffled so arrival
    // order never matches version order
    val versioned = staticEvents.crossJoin(
        spark.range(1, 4).toDF("v"))
      .withColumn("ts", timestamp_millis(unix_millis(col("ts")) + col("v") * 3600000L))
      .withColumn("value", col("v").cast("double"))
      .drop("v")
      .repartition(7) // scatter versions across tasks: arrival order is arbitrary
    val dir = java.nio.file.Files.createTempDirectory("graft_lww_").toString + "/in"
    versioned.write.parquet(dir)
    val ckpt = java.nio.file.Files.createTempDirectory("graft_lww_ckpt_").toString
    val q = EventStream.lakeUpsertSink(
      spark.readStream.schema(staticEvents.schema).parquet(dir),
      t, Seq("event_id"), ckpt, orderBy = Some("ts"))
    try q.processAllAvailable() finally q.stop()
    // one row per key survived, and for EVERY key it is the v=3 row
    val out = t.refresh().newScan().toDF(spark)
    assert(out.count() === staticEvents.count())
    assert(out.filter(col("value") =!= 3.0).count() === 0L)
    // without orderBy, the same duplicate-key batch is REFUSED (the
    // documented contract), not landed with an arbitrary winner
    val e = intercept[Exception](t.mergeInto(spark,
      spark.read.parquet(dir), Seq("event_id")))
    assert(e.getMessage.contains("duplicate") || e.getMessage.contains("distinct"))
  }
}
