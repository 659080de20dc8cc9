package graft.lake

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong
import scala.jdk.CollectionConverters._

/** Scan/commit observability, mirroring the reference's metrics surface
  * (reference: MicrometerMetricsReporter.java:41-76 dispatches on
  * CommitReport/ScanReport; exact meter set asserted in
  * IntegrationTest.java:106-117 and MicrometerMetricsReporterTest.java:43-47).
  *
  * Reports are case classes of a sealed trait, so the reference's
  * reflection-based field extraction (MicrometerMetricsReporter.java:94-113)
  * and its unknown-report IllegalArgumentException (:73-75) become
  * compile-time guarantees here.
  */
sealed trait MetricsReport { def tableName: String }

/** One per snapshot commit — 11 metrics, the reference's exact meter
  * suffixes (IntegrationTest.java:106-117) under the `lake.` prefix. */
final case class CommitReport(
    tableName: String,
    snapshotId: Long,
    attempts: Long, // first try counts as attempt 1, like Iceberg
    addedDataFiles: Long,
    addedRecords: Long,
    addedFilesSizeInBytes: Long,
    totalDataFiles: Long,
    totalDeleteFiles: Long,
    totalRecords: Long,
    totalFilesSizeInBytes: Long,
    totalPositionalDeletes: Long,
    totalEqualityDeletes: Long,
    totalDurationMs: Long) extends MetricsReport {
  def counters: Map[String, Long] = Map(
    "attempts" -> attempts,
    "addedDataFiles" -> addedDataFiles,
    "addedRecords" -> addedRecords,
    "addedFilesSizeInBytes" -> addedFilesSizeInBytes,
    "totalDataFiles" -> totalDataFiles,
    "totalDeleteFiles" -> totalDeleteFiles,
    "totalRecords" -> totalRecords,
    "totalFilesSizeInBytes" -> totalFilesSizeInBytes,
    "totalPositionalDeletes" -> totalPositionalDeletes,
    "totalEqualityDeletes" -> totalEqualityDeletes)

  /** Durations are TIMERS (count + accumulated time), not counters —
    * the reference records Iceberg TimerResults via timer.record()
    * (MicrometerMetricsReporter.java:78-92), so one commit bumps the
    * timer count by 1 and its total by the duration. */
  def timers: Map[String, Long] = Map("totalDuration" -> totalDurationMs)
}

/** One per scan planning — 3 metrics (MicrometerMetricsReporterTest.java:43-47). */
final case class ScanReport(
    tableName: String,
    snapshotId: Long,
    filter: String, // rendered predicate; "true" = alwaysTrue default
    resultDataFiles: Long,
    resultDeleteFiles: Long,
    totalFileSizeInBytes: Long,
    planningDurationMs: Long,
    // Manifest-list skip tier: documents pruned by rollup stats without
    // being opened vs documents actually parsed. Report fields only —
    // NOT meters, so the exported meter set stays exactly the
    // reference's three (MicrometerMetricsReporterTest.java:43-47);
    // observers that want them read the report (reporter injection).
    skippedDataManifests: Long = 0L,
    scannedDataManifests: Long = 0L,
    // Round-11: 1 when the distributed planFiles attempt swallowed an
    // executor-side failure and fell back to the driver parse. The
    // fallback is always correct, but at the 1M-file scale the
    // distributed path exists for, a PERSISTENT degrade silently
    // reintroduces the driver bottleneck — operators must be able to
    // see it (alert on rate > 0), so it is counted, not just logged.
    planDegraded: Long = 0L) extends MetricsReport {
  def counters: Map[String, Long] = Map(
    "resultDataFiles" -> resultDataFiles,
    "resultDeleteFiles" -> resultDeleteFiles,
    "totalFileSizeInBytes" -> totalFileSizeInBytes)

  /** Planning time as a timer, named after Iceberg's ScanMetricsResult
    * TimerResult field (totalPlanningDuration) that the reference's
    * reflective extraction would surface (MicrometerMetricsReporter
    * .java:94-113 collects TimerResult fields; :78-92 records them). */
  def timers: Map[String, Long] = Map("totalPlanningDuration" -> planningDurationMs)
}

trait MetricsReporter {
  def report(r: MetricsReport): Unit
}

object MetricsReporter {
  /** Drop-everything reporter for callers that don't observe. */
  val noop: MetricsReporter = (_: MetricsReport) => ()
}

/** In-memory registry of named counters AND timers tagged by table name
  * — the SimpleMeterRegistry analog. Counters accumulate a sum; timers
  * accumulate (invocation count, total duration), Micrometer Timer
  * semantics (reference: timer.record(count, unit),
  * MicrometerMetricsReporter.java:89-92). */
final class SimpleMetrics extends MetricsReporter {
  private val counters = new ConcurrentHashMap[(String, String), AtomicLong]()
  private val timers = new ConcurrentHashMap[(String, String), (AtomicLong, AtomicLong)]()

  private def add(name: String, table: String, v: Long): Unit =
    counters.computeIfAbsent((name, table), _ => new AtomicLong()).addAndGet(v)

  private def record(name: String, table: String, durMs: Long): Unit = {
    val (n, total) = timers.computeIfAbsent((name, table),
      _ => (new AtomicLong(), new AtomicLong()))
    n.incrementAndGet()
    total.addAndGet(durMs)
  }

  override def report(r: MetricsReport): Unit = r match {
    case c: CommitReport =>
      c.counters.foreach { case (k, v) => add(s"lake.commitReport.$k", c.tableName, v) }
      c.timers.foreach { case (k, v) => record(s"lake.commitReport.$k", c.tableName, v) }
    case s: ScanReport =>
      s.counters.foreach { case (k, v) => add(s"lake.scanReport.$k", s.tableName, v) }
      s.timers.foreach { case (k, v) => record(s"lake.scanReport.$k", s.tableName, v) }
  }

  /** All meter names emitted for a table (the metric-set-equality
    * oracle): counters and timers in one namespace, like a Micrometer
    * registry. */
  def meterNames(table: String): Set[String] =
    (counters.keySet.asScala ++ timers.keySet.asScala)
      .collect { case (n, t) if t == table => n }.toSet

  def counterValue(name: String, table: String): Long =
    Option(counters.get((name, table))).map(_.get()).getOrElse(0L)

  /** Timer invocation count (Micrometer Timer.count). */
  def timerCount(name: String, table: String): Long =
    Option(timers.get((name, table))).map(_._1.get()).getOrElse(0L)

  /** Timer accumulated duration in ms (Micrometer Timer.totalTime). */
  def timerTotalMs(name: String, table: String): Long =
    Option(timers.get((name, table))).map(_._2.get()).getOrElse(0L)
}
