package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.StructType

/** Structured Streaming surface: the streaming twins of the batch
  * event-time operators in queries.EventQueries — `readStream` sources,
  * watermarked windowed aggregation, and arbitrary stateful processing
  * via mapGroupsWithState (SURVEY.md §2.C streaming analog; driver
  * events table is batch, so these are exercised by StreamingSpec with
  * a file source + memory sink).
  */
object EventStream {

  final case class EventRow(event_id: Long, ts: java.sql.Timestamp,
      user_id: Long, event_type: String, value: Double)

  final case class UserRunning(user_id: Long, n_events: Long, sum_value: Double)

  /** Watermarked tumbling-window counts — same semantics as the batch
    * q_ev_tumbling on a bounded input. */
  def windowedCounts(spark: SparkSession, schema: StructType, dir: String): DataFrame =
    spark.readStream.schema(schema).parquet(dir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Arbitrary stateful op: running per-user event count + value sum via
    * mapGroupsWithState (the KeyValueGroupedDataset custom-state path). */
  def runningUserTotals(spark: SparkSession, schema: StructType, dir: String): Dataset[UserRunning] = {
    import spark.implicits._
    spark.readStream.schema(schema).parquet(dir)
      .selectExpr("event_id", "ts", "user_id", "event_type", "value")
      .as[EventRow]
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[EventRow], state: GroupState[UserRunning]) =>
          val prev = state.getOption.getOrElse(UserRunning(user, 0L, 0.0))
          val (n, sv) = rows.foldLeft((prev.n_events, prev.sum_value)) {
            case ((c, s), r) => (c + 1, s + r.value)
          }
          val next = UserRunning(user, n, sv)
          state.update(next)
          next
      }
  }

  final case class UserSessions(user_id: Long, n_sessions: Long, n_events: Long)

  /** Cross-batch session state: counts + the last seen event time, so a
    * session spanning two micro-batches is not double-counted. */
  final case class SessionState(user_id: Long, n_sessions: Long,
      n_events: Long, last_ms: Long)

  /** Sessionization via flatMapGroupsWithState: per user, a >gap silence
    * starts a new session. The previous batch's last event time is
    * carried in state and prepended to the gap scan, so a batch whose
    * first event continues the prior batch's session adds no session.
    * Bounded-input formulation sorts the group's events in memory (a
    * production unbounded stream would use event-time timeout; the
    * state machine is the same). */
  def sessionize(spark: SparkSession, schema: StructType, dir: String,
      gapMs: Long = 1800000L): Dataset[UserSessions] = {
    import spark.implicits._
    spark.readStream.schema(schema).parquet(dir)
      .selectExpr("event_id", "ts", "user_id", "event_type", "value")
      .as[EventRow]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[EventRow], state: GroupState[SessionState]) =>
          val ts = rows.map(_.ts.getTime).toArray.sorted
          if (ts.isEmpty) Iterator.empty
          else {
            val prev = state.getOption
            val scan = prev.map(_.last_ms).toArray ++ ts
            val newSessions = (if (prev.isEmpty) 1L else 0L) +
              scan.sliding(2).count(w => w.length == 2 && w(1) - w(0) > gapMs)
            val next = SessionState(user,
              prev.map(_.n_sessions).getOrElse(0L) + newSessions,
              prev.map(_.n_events).getOrElse(0L) + ts.length,
              math.max(prev.map(_.last_ms).getOrElse(Long.MinValue), ts.last))
            state.update(next)
            Iterator.single(UserSessions(user, next.n_sessions, next.n_events))
          }
      }
  }

  final case class FunnelProgress(user_id: Long, stage: Long,
      t1_ms: Long, t2_ms: Long, t3_ms: Long)

  /** Cross-batch funnel state: the three step anchors (ms since epoch,
    * MinValue = not reached). Greedy first-qualifying transitions over
    * chronologically delivered events equal the batch min-anchored
    * definition in [[graft.queries.EventQueries.qEvFunnel]]. */
  final case class FunnelState(t1: Long, t2: Long, t3: Long)

  /** Streaming ordered funnel — the stateful twin of the batch
    * `q_ev_funnel` (view → click → purchase, 7-day horizon from the
    * first view). Per user, flatMapGroupsWithState carries the step
    * anchors across micro-batches and applies the strictly-ordered
    * state machine: a click counts only after the first view, a
    * purchase only after that click, both inside the horizon.
    *
    * Bounded-input formulation (the sessionize convention): each
    * group's batch slice is sorted in memory and batches are assumed
    * chronological — the file-replay shape. A production out-of-order
    * stream would buffer inside the watermark with an event-time
    * timeout before folding; the transition function is the same.
    * Emits the user's current stage each batch (monotone — Append
    * mode; the memory-sink max per user is the final stage). */
  def funnelProgress(spark: SparkSession, schema: StructType, dir: String,
      horizonMs: Long = 7L * 24 * 3600 * 1000): Dataset[FunnelProgress] = {
    import spark.implicits._
    spark.readStream.schema(schema).parquet(dir)
      .selectExpr("event_id", "ts", "user_id", "event_type", "value")
      .as[EventRow]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[EventRow], state: GroupState[FunnelState]) =>
          val Unset = Long.MinValue
          var st = state.getOption.getOrElse(FunnelState(Unset, Unset, Unset))
          // (ts, event_id) pins a TOTAL order on the batch slice —
          // events sharing a millisecond must not apply in
          // shuffle-dependent order (the batch corpus's tie-break)
          val evs = rows.map(r => (r.ts.getTime, r.event_id, r.event_type))
            .toArray.sortBy(e => (e._1, e._2))
          evs.foreach { case (ms, _, tpe) =>
            tpe match {
              case "view" if st.t1 == Unset => st = st.copy(t1 = ms)
              case "click" if st.t2 == Unset && st.t1 != Unset &&
                ms > st.t1 && ms <= st.t1 + horizonMs => st = st.copy(t2 = ms)
              case "purchase" if st.t3 == Unset && st.t2 != Unset &&
                ms > st.t2 && ms <= st.t1 + horizonMs => st = st.copy(t3 = ms)
              case _ =>
            }
          }
          state.update(st)
          val stage = (if (st.t1 != Unset) 1L else 0L) +
            (if (st.t2 != Unset) 1L else 0L) + (if (st.t3 != Unset) 1L else 0L)
          Iterator.single(FunnelProgress(user, stage, st.t1, st.t2, st.t3))
      }
  }

  final case class AttributedPurchase(user_id: Long, event_id: Long,
      touch_type: String, cents: Long)

  /** Cross-batch attribution state: the user's latest touch (ms since
    * epoch + type). O(1) per user regardless of history length. */
  final case class TouchState(ms: Long, tpe: String)

  /** Streaming last-touch attribution — the stateful twin of the batch
    * `q_ev_attribution`: each purchase is credited, AT ARRIVAL, to the
    * user's most recent preceding `click`/`view` within the 7-day
    * lookback, else to `none`. The state is a single (ms, type) pair
    * per user — the carry-forward the batch query materializes with a
    * window — so an unbounded stream attributes with constant per-key
    * state and emits each purchase exactly once (Append mode).
    *
    * Bounded-input formulation (the funnel/sessionize convention):
    * each group's batch slice sorts by the `(ts, event_id)` total
    * order and batches are assumed chronological — the file-replay
    * shape. Tie semantics match the batch side exactly: a touch at
    * the purchase's own timestamp counts iff its event_id is smaller. */
  def attributionProgress(spark: SparkSession, schema: StructType, dir: String,
      lookbackMs: Long = 7L * 24 * 3600 * 1000): Dataset[AttributedPurchase] = {
    import spark.implicits._
    spark.readStream.schema(schema).parquet(dir)
      .selectExpr("event_id", "ts", "user_id", "event_type", "value")
      .as[EventRow]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[EventRow], state: GroupState[TouchState]) =>
          var st = state.getOption.orNull
          val evs = rows.toArray.sortBy(r => (r.ts.getTime, r.event_id))
          val out = scala.collection.mutable.Buffer.empty[AttributedPurchase]
          evs.foreach { r =>
            r.event_type match {
              case "click" | "view" => st = TouchState(r.ts.getTime, r.event_type)
              case "purchase" =>
                val tpe =
                  if (st != null && st.ms >= r.ts.getTime - lookbackMs) st.tpe
                  else "none"
                out += AttributedPurchase(user, r.event_id, tpe,
                  math.floor(r.value * 100).toLong)
              case _ =>
            }
          }
          if (st != null) state.update(st)
          out.iterator
      }
  }

  /** Streaming exact dedup — the unbounded twin of the batch
    * dedup_exact operator, for at-least-once sources that re-deliver.
    * dropDuplicatesWithinWatermark keeps a key's dedup state only
    * inside the watermark horizon, so state is bounded by event-time
    * skew instead of growing with the corpus (a batch groupBy holds
    * every key; an unbounded stream cannot). */
  def dedupedEvents(spark: SparkSession, schema: StructType, dir: String): DataFrame =
    spark.readStream.schema(schema).parquet(dir)
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

  /** Idempotent micro-batch append: delegates to the table's
    * exactly-once commit path — the (sinkId, batchId) ledger lives in
    * TABLE PROPERTIES (snapshot expiry cannot erase it) and the
    * decisive newer-than check runs inside the commit CAS (two racing
    * drivers on the same batch cannot both land). Returns whether a
    * commit happened. */
  def appendBatchIdempotent(table: graft.lake.LakeTable, batch: DataFrame,
      sinkId: String, batchId: Long): Boolean =
    table.appendDataExactlyOnce(batch, sinkId, batchId).isDefined

  /** Stable sink identity tied to the CHECKPOINT's lifetime: a uuid doc
    * created once next to the checkpoint state. Batch ids only mean
    * anything relative to one checkpoint — wiping the checkpoint resets
    * them to 0, and a ledger keyed by a surviving sink id would then
    * silently drop the first N batches as replays. Recovering the SAME
    * checkpoint reuses the id, which is exactly when skip-on-replay is
    * correct.
    *
    * The marker is written through [[graft.lake.HadoopFsCommitBackend]]'s
    * conditional put — write-temp-then-publish, so a racing reader can
    * never observe a torn/empty marker and two racing creators resolve
    * to ONE surviving uuid (a hand-rolled create(false)+write here had
    * exactly those two races). */
  private[streaming] def sinkIdFor(spark: SparkSession, checkpointDir: String): String = {
    val backend = new graft.lake.HadoopFsCommitBackend(spark.sessionState.newHadoopConf())
    val ckpt = graft.lake.LakePath(checkpointDir)
    val marker = ckpt.resolve("graft-sink-id")
    backend.ensureDir(ckpt)
    backend.putIfAbsent(marker, java.util.UUID.randomUUID.toString) // loser = no-op
    backend.get(marker).getOrElse(
      throw new IllegalStateException(s"sink-id marker vanished under $checkpointDir")).trim
  }

  /** Structured-Streaming sink into a lake table: every micro-batch is
    * ONE exactly-once append commit (never a bare parquet write),
    * observable through the usual CommitReport metrics and incrementally
    * consumable downstream via `changesSince`. */
  def lakeAppendSink(df: DataFrame, table: graft.lake.LakeTable,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery = {
    val sinkId = sinkIdFor(df.sparkSession, checkpointDir)
    df.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .foreachBatch((batch: Dataset[org.apache.spark.sql.Row], batchId: Long) => {
        appendBatchIdempotent(table, batch.toDF(), sinkId, batchId)
        ()
      })
      .start()
  }

  /** Structured-Streaming UPSERT sink: each micro-batch MERGEs into the
    * lake table on `keys` (same-key rows replaced, new keys inserted) as
    * one exactly-once commit — the streaming shape of a CDC/upsert feed.
    *
    * Per-key ordering: with `orderBy` set to an event-time/version
    * column, a batch carrying several updates for one key reduces to
    * the row with the LARGEST `orderBy` value before the merge —
    * last-write-wins, deterministic even when the distributed batch
    * delivers a key's rows out of order (ties break on the remaining
    * columns, so equal-version duplicates still reduce reproducibly).
    * The reduction shuffles on the same keys the merge itself hashes
    * on, so it adds no extra exchange at scale. Without `orderBy` the
    * batch must carry distinct non-NULL keys (pre-aggregate upstream)
    * — the merge REFUSES duplicate keys rather than landing an
    * arbitrary winner (mergeInto's null-key/distinct-key contract). */
  def lakeUpsertSink(df: DataFrame, table: graft.lake.LakeTable,
      keys: Seq[String],
      checkpointDir: String,
      orderBy: Option[String] = None,
      strategy: String = "cow"): org.apache.spark.sql.streaming.StreamingQuery = {
    require(strategy == "cow" || strategy == "mor", s"unknown upsert strategy $strategy")
    val sinkId = sinkIdFor(df.sparkSession, checkpointDir)
    df.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .foreachBatch((batch: Dataset[org.apache.spark.sql.Row], batchId: Long) => {
        val b = batch.toDF()
        val reduced = orderBy match {
          case Some(versionCol) => latestPerKey(b, keys, versionCol)
          case None => b
        }
        // "mor" = merge-on-read upsert: each batch writes O(batch) —
        // data + equality tombstones, never reading the table — the
        // sustainable shape for a high-rate CDC stream into a huge
        // table; schedule compact() to fold tombstones down. "cow"
        // rewrites key-overlapping files: zero read overhead after.
        if (strategy == "mor")
          table.mergeIntoMoRExactlyOnce(batch.sparkSession, reduced, keys, sinkId, batchId)
        else
          table.mergeIntoExactlyOnce(batch.sparkSession, reduced, keys, sinkId, batchId)
        ()
      })
      .start()
  }

  /** Reduce a batch to one row per key: the row with the largest
    * `versionCol`, ties broken by the remaining columns descending —
    * a total order, so the winner is engine- and arrival-order-
    * independent. One hash shuffle on `keys` (the window partition),
    * the same keys the downstream merge co-locates on. */
  private[streaming] def latestPerKey(df: DataFrame, keys: Seq[String],
      versionCol: String): DataFrame = {
    require(df.columns.contains(versionCol), s"no such order column $versionCol")
    val others = df.columns.filterNot(c => keys.contains(c) || c == versionCol)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
      .orderBy((desc(versionCol) +: others.map(desc)): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Drive a streaming DF synchronously into a memory sink and return
    * the collected table (dev/test harness for bounded inputs). */
  def runToMemory(df: DataFrame, name: String, outputMode: OutputMode): DataFrame = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode(outputMode).start()
    try q.processAllAvailable() finally q.stop()
    df.sparkSession.table(name)
  }
}
