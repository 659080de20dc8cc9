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
