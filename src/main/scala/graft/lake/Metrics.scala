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
    "totalEqualityDeletes" -> totalEqualityDeletes,
    "totalDuration" -> totalDurationMs)
}

/** One per scan planning — 3 metrics (MicrometerMetricsReporterTest.java:43-47). */
final case class ScanReport(
    tableName: String,
    snapshotId: Long,
    filter: String, // rendered predicate; "true" = alwaysTrue default
    resultDataFiles: Long,
    resultDeleteFiles: Long,
    totalFileSizeInBytes: Long,
    planningDurationMs: Long) extends MetricsReport {
  def counters: Map[String, Long] = Map(
    "resultDataFiles" -> resultDataFiles,
    "resultDeleteFiles" -> resultDeleteFiles,
    "totalFileSizeInBytes" -> totalFileSizeInBytes)
}

trait MetricsReporter {
  def report(r: MetricsReport): Unit
}

object MetricsReporter {
  /** Drop-everything reporter for callers that don't observe. */
  val noop: MetricsReporter = (_: MetricsReport) => ()
}

/** In-memory registry of named counters tagged by table name — the
  * SimpleMeterRegistry analog. Counters accumulate across reports. */
final class SimpleMetrics extends MetricsReporter {
  private val counters = new ConcurrentHashMap[(String, String), AtomicLong]()

  private def add(name: String, table: String, v: Long): Unit =
    counters.computeIfAbsent((name, table), _ => new AtomicLong()).addAndGet(v)

  override def report(r: MetricsReport): Unit = r match {
    case c: CommitReport =>
      c.counters.foreach { case (k, v) => add(s"lake.commitReport.$k", c.tableName, v) }
    case s: ScanReport =>
      s.counters.foreach { case (k, v) => add(s"lake.scanReport.$k", s.tableName, v) }
  }

  /** All meter names emitted for a table (the metric-set-equality oracle). */
  def meterNames(table: String): Set[String] =
    counters.keySet.asScala.collect { case (n, t) if t == table => n }.toSet

  def counterValue(name: String, table: String): Long =
    Option(counters.get((name, table))).map(_.get()).getOrElse(0L)
}
