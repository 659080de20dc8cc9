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
}
