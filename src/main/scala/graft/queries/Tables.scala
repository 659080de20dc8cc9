package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Loaders for the driver test tables (`TESTDATA.md`, schemas in
  * `FIXTURES.md` §2). Reads use the parquet footer schema (never inferred
  * beyond it), mirroring the reference's explicit-schema discipline
  * (reference: IntegrationTest.java:59-64 declares schemas up front).
  *
  * `events.ts` is physically `timestamp[ns]`; Spark has no nanosecond
  * timestamp type, so [[events]] normalizes whatever the reader produced
  * (LongType nanos under `nanosAsLong`, or TimestampNTZ) to a microsecond
  * `TimestampType` so window/date functions and the DuckDB oracle agree.
  */
object Tables {
  /** Footer-schema catalog: a bare `spark.read.parquet(path)` re-infers
    * the schema on every call (~80 ms warm — footer fetch + merge), and
    * the corpus references these nine immutable tables hundreds of times
    * per bench pass, so inference alone charged every query a fixed
    * driver tax. Production engines hold exactly this in the metastore; caching
    * the STRUCT (never data) keeps every run computing from the parquet
    * inputs. Keyed on path + the one conf that changes what the footer
    * maps to (`nanosAsLong` flips events.ts between long and ntz). */
  private val schemaCatalog =
    new java.util.concurrent.ConcurrentHashMap[String, StructType]()

  /** Resolved-relation memo, the second catalog layer: even with the
    * schema known, each `spark.read.schema(s).parquet(path)` re-resolves
    * the DataSource and re-lists the path (~14 ms — non-catalog reads
    * get a NoopCache). Spark's own metastore path caches the resolved
    * LogicalRelation for exactly this reason; these nine corpus paths
    * are immutable, and the memo holds a LAZY plan — every action still
    * computes from the parquet files. Session-keyed like every other
    * session-bound artifact (a dead session's relation must not leak
    * into a new one). */
  private val frameMemo = new SessionMemo[DataFrame]

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    frameMemo.getOrBuild(spark, path) {
      val key = path + "#" +
        spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").getOrElse("")
      val cached = schemaCatalog.get(key)
      if (cached != null) spark.read.schema(cached).parquet(path)
      else {
        val df = spark.read.parquet(path)
        schemaCatalog.put(key, df.schema)
        df
      }
    }
  }

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Fan an UNSPLITTABLE scan across the session's cores (guide §2.5
    * "input skew: one huge unsplittable file — repartition immediately
    * after the read"). The driver corpus ships each table as ONE
    * single-row-group parquet file, so every scan plans exactly one
    * task and CPU-heavy per-row map work (shingling, codecs, md5
    * passes) runs single-threaded regardless of core count. Applied
    * SELECTIVELY at the call sites whose downstream per-row work
    * dwarfs the source bytes — never blanket (trivial consumers would
    * pay a shuffle for nothing), and a no-op whenever the scan already
    * carries enough splits (a production table of row-grouped files
    * skips straight through, so this never costs a heavy corpus a
    * shuffle at scale). Round-robin keeps no key skew; Spark's
    * sort-before-repartition keeps the assignment deterministic under
    * task retry. */
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (estimatedScanPartitions(df) >= target) df else df.repartition(target)
  }

  /** How many partitions the file scan under `df` will plan, WITHOUT
    * planning it: `df.rdd.getNumPartitions` runs the whole analyzer/
    * optimizer/physical-planning pipeline (~60 ms warm per call) just to
    * read one integer. The estimate replays Spark's own split math
    * (`FilePartition.maxSplitBytes`: openCost-padded bytes per core,
    * clamped to maxPartitionBytes) against the relation's cached file
    * statistics — same decision, no planning. Falls back to the planned
    * count for non-file sources. */
  private def estimatedScanPartitions(df: DataFrame): Int = {
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    // analyzed, not logical: a schema-given read's raw plan is still an
    // UnresolvedDataSource leaf; analysis is memoized and paid anyway
    val rel = df.queryExecution.analyzed.collectFirst {
      case l: LogicalRelation if l.relation.isInstanceOf[HadoopFsRelation] =>
        l.relation.asInstanceOf[HadoopFsRelation]
    }
    rel match {
      case Some(fs) =>
        val conf = df.sparkSession.sessionState.conf
        val openCost = conf.filesOpenCostInBytes
        val maxPart = conf.filesMaxPartitionBytes
        val cores = df.sparkSession.sparkContext.defaultParallelism
        val files = math.max(1L, fs.location.inputFiles.length.toLong)
        val padded = fs.location.sizeInBytes + files * openCost
        val maxSplit = math.min(maxPart, math.max(openCost, padded / cores))
        math.min(Int.MaxValue.toLong, (padded + maxSplit - 1) / maxSplit).toInt
      case None => df.rdd.getNumPartitions
    }
  }

  def events(s: SparkSession, d: String): DataFrame =
    frameMemo.getOrBuild(s, s"$d/events.parquet#normalized") { eventsUncached(s, d) }

  private def eventsUncached(s: SparkSession, d: String): DataFrame = {
    // Spark has no nanosecond TimestampType and by default refuses
    // TIMESTAMP(NANOS) parquet columns outright (PARQUET_TYPE_ILLEGAL);
    // read them as raw long nanos and convert below. Harness sessions
    // (Bench/Verify) declare the conf at build time; this set is the
    // fallback for ad-hoc sessions. It cannot be save/restored per-read
    // because the conf is consulted again at execution time — a scoped
    // reset would break the lazy read. Session-wide effect is acceptable:
    // events is the only ns-annotated source, the lake writer always
    // emits micros.
    if (!s.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"))
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType => // nanosAsLong: integer nanos since epoch; `div`
        // (integer division) truncates like DuckDB's ns→µs cast — `/`
        // would round through double and drift by 1µs
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _: TimestampNTZType => // wall time == instant under UTC session TZ
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
}
