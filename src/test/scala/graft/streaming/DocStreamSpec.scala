package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.lake.LakeSuite

/** Streaming ≡ batch equivalence for the document-ingest twins: the
  * running keeper table and the lang profile must agree with their
  * batch corpus formulations, including when the input arrives split
  * across micro-batches in keeper-hostile order. */
class DocStreamSpec extends LakeSuite {

  private val sfDir = "/root/testdata/sf0.001"

  private lazy val stagedDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_docs_").toString
    graft.queries.Tables.documents(spark, sfDir)
      .write.mode("overwrite").parquet(dir)
    dir
  }

  private lazy val staticDocs = spark.read.parquet(stagedDir)

  test("streaming dedup keepers == batch dedup_exact") {
    val streamed = EventStream.runToMemory(
      DocStream.dedupKeepers(spark, staticDocs.schema, stagedDir),
      "doc_keepers", OutputMode.Complete())
      .select(col("keeper"), col("n_copies"))
    val batch = graft.queries.TextQueries.qDedupExact(spark, sfDir)
    assert(streamed.count() === batch.count())
    assert(streamed.except(batch).count() === 0)
    assert(batch.except(streamed).count() === 0)
  }

  test("keeper state updates downward across micro-batches") {
    // deliver the HIGH doc_ids first, the low ids in a second
    // micro-batch: every duplicate group's keeper must still end at
    // the global min, i.e. the agg state is genuinely revised by later
    // batches rather than first-write-wins
    val dir = java.nio.file.Files.createTempDirectory("graft_docs2_").toString
    val cut = staticDocs.agg(avg(col("doc_id"))).head.getDouble(0).toLong
    staticDocs.filter(col("doc_id") >= cut)
      .write.mode("overwrite").parquet(s"$dir/in")
    val q = DocStream.dedupKeepers(spark, staticDocs.schema, s"$dir/in")
      .writeStream.format("memory").queryName("doc_keepers2")
      .outputMode(OutputMode.Complete()).start()
    try {
      q.processAllAvailable()
      staticDocs.filter(col("doc_id") < cut)
        .write.mode("append").parquet(s"$dir/in")
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("doc_keepers2")
      .select(col("keeper"), col("n_copies"))
    val batch = graft.queries.TextQueries.qDedupExact(spark, sfDir)
    assert(streamed.except(batch).count() === 0)
    assert(batch.except(streamed).count() === 0)
  }

  test("keeper stream upserts into a lake table exactly-once, Update mode") {
    import graft.lake.LakeCatalog
    val cat = LakeCatalog.open(freshWarehouse())
    val keeperSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("fp", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("keeper", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("n_copies", org.apache.spark.sql.types.LongType)))
    val t = cat.createTable("ns", "doc_keepers", keeperSchema)
    // two micro-batches, keeper-hostile order (high ids first)
    val dir = java.nio.file.Files.createTempDirectory("graft_docs3_").toString
    val cut = staticDocs.agg(avg(col("doc_id"))).head.getDouble(0).toLong
    staticDocs.filter(col("doc_id") >= cut)
      .write.mode("overwrite").parquet(s"$dir/in")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_docs3_ckpt_").toString
    val q = DocStream.keeperUpsertSink(
      DocStream.dedupKeepers(spark, staticDocs.schema, s"$dir/in"), t, ckpt)
    try {
      q.processAllAvailable()
      staticDocs.filter(col("doc_id") < cut)
        .write.mode("append").parquet(s"$dir/in")
      q.processAllAvailable()
    } finally q.stop()
    // the lake keeper table converged to the batch answer — later
    // micro-batches REVISED existing fingerprints through the merge
    val batch = graft.queries.TextQueries.qDedupExact(spark, sfDir)
    val landed = t.refresh().newScan().toDF(spark)
      .select(col("keeper"), col("n_copies"))
    assert(landed.except(batch).count() === 0)
    assert(batch.except(landed).count() === 0)
    // checkpoint-replay of the last batch is a durable no-op
    val sinkId = EventStream.sinkIdFor(spark, ckpt)
    val last = t.lastCommittedBatchId(sinkId).get
    val replay = spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row("bogus", 1L, 99L)), keeperSchema)
    assert(t.mergeIntoExactlyOnce(spark, replay, Seq("fp"), sinkId, last).isEmpty)
    assert(t.refresh().newScan().toDF(spark).count() === batch.count())
  }

  test("streaming lang profile == batch per-lang rollup") {
    val streamed = EventStream.runToMemory(
      DocStream.langProfile(spark, staticDocs.schema, stagedDir),
      "lang_profile", OutputMode.Complete())
    val batch = staticDocs
      .select(col("lang"), size(split(col("text"), " ")).cast("long").as("toks"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("n_tokens"))
    assert(streamed.except(batch).count() === 0)
    assert(batch.except(streamed).count() === 0)
  }
}
