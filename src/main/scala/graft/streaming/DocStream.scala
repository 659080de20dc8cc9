package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Streaming twins of the document-pipeline operators: an ingest
  * stream of raw documents deduplicated and profiled AS IT ARRIVES —
  * the shape a production crawl ingest runs (new shards land on object
  * storage, the stream keeps a running keeper table), where the batch
  * corpus queries are the offline re-runs.
  */
object DocStream {

  /** Streaming exact-dedup — the twin of `TextQueries.qDedupExact`:
    * per text fingerprint, keeper = min doc_id plus copy count, as a
    * streaming aggregation. The fingerprint is sha2(text) so state
    * stores 32 bytes per distinct doc, not the text itself (the same
    * trick the batch `doc_fingerprint` output is for). Bounded twin
    * runs Complete mode into a memory sink; an unbounded production
    * stream runs the identical pipeline in Update mode feeding the
    * keeper table as a stream of upserts (a MERGE per micro-batch via
    * foreachBatch into the lake table), with
    * dropDuplicatesWithinWatermark ahead of the agg once re-delivery
    * windows are bounded. */
  def dedupKeepers(spark: SparkSession, schema: StructType, dir: String): DataFrame =
    spark.readStream.schema(schema).parquet(dir)
      .select(col("doc_id"), sha2(col("text"), 256).as("fp"))
      .groupBy(col("fp"))
      .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_copies"))
      .select(col("fp"), col("keeper"), col("n_copies"))

  /** The production sink for [[dedupKeepers]]: Update-mode foreachBatch
    * lands each micro-batch's CHANGED keeper rows as one exactly-once
    * MERGE into a lake table keyed by fingerprint — O(changed keys) per
    * batch on the wire, the (sinkId, batchId) ledger making checkpoint
    * replays durable no-ops. Update mode is what makes the aggregate
    * stream incremental: Complete would re-emit the whole keeper table
    * every batch. */
  def keeperUpsertSink(keepers: DataFrame, table: graft.lake.LakeTable,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery = {
    val sinkId = EventStream.sinkIdFor(keepers.sparkSession, checkpointDir)
    keepers.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Update)
      .foreachBatch((batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          batchId: Long) => {
        table.mergeIntoExactlyOnce(batch.sparkSession, batch.toDF(),
          Seq("fp"), sinkId, batchId)
        ()
      })
      .start()
  }

  /** Streaming corpus profile — running per-lang doc and token totals,
    * the ingest-time dashboard row (`text_stats`' streaming twin; the
    * token count is the same whitespace split as the batch side). */
  def langProfile(spark: SparkSession, schema: StructType, dir: String): DataFrame =
    spark.readStream.schema(schema).parquet(dir)
      .select(col("lang"), size(split(col("text"), " ")).cast("long").as("toks"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("n_tokens"))
}
