package graft.lake

import java.util.concurrent.TimeUnit

/** The external-registry shape the bridge publishes into — the minimal
  * structural slice of a Micrometer-style tag-aware meter registry
  * (`registry.counter(name, tags).increment`, `registry.timer(name,
  * tags).record`). A deployment hands the engine a ~3-line
  * implementation delegating to its real registry (Micrometer,
  * Dropwizard, OpenTelemetry, …); the engine never links against any
  * of them. */
object MeterRegistry {
  trait Counter { def increment(amount: Double): Unit }
  trait Timer { def record(amount: Long, unit: TimeUnit): Unit }
}

trait MeterRegistry {
  def counter(name: String, tags: Map[String, String]): MeterRegistry.Counter
  def timer(name: String, tags: Map[String, String]): MeterRegistry.Timer
}

/** Bridge from the engine's [[MetricsReporter]] to an external
  * tag-aware registry — the analog of the reference's second main
  * class, which is exactly this adapter over Micrometer
  * (MicrometerMetricsReporter.java:41-92: dispatch on
  * CommitReport/ScanReport, a configurable metric prefix, counters
  * incremented and durations recorded as Timers, a `tableName` tag).
  * Differences, both deliberate: the sealed report trait replaces the
  * reference's reflective field extraction (:94-113) and its
  * unknown-report IllegalArgumentException (:73-75) with compile-time
  * dispatch, and timers carry the `tableName` tag that the reference
  * only applies to counters (:57-66), so every meter stays
  * per-table-attributable. A null registry or report no-ops like the
  * reference's null guards (:44-50). */
final class RegistryMetricsReporter(
    registry: MeterRegistry,
    metricPrefix: String = "lake.") extends MetricsReporter {

  override def report(r: MetricsReport): Unit = {
    if (registry == null || r == null) return
    val (prefix, tags, counters, timers) = r match {
      case c: CommitReport =>
        (s"${metricPrefix}commitReport.", Map("tableName" -> c.tableName),
          c.counters, c.timers)
      case s: ScanReport =>
        (s"${metricPrefix}scanReport.", Map("tableName" -> s.tableName),
          s.counters, s.timers)
    }
    counters.foreach { case (k, v) =>
      registry.counter(prefix + k, tags).increment(v.toDouble)
    }
    timers.foreach { case (k, v) =>
      registry.timer(prefix + k, tags).record(v, TimeUnit.MILLISECONDS)
    }
  }
}
