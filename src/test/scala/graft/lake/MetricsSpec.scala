package graft.lake

import org.apache.spark.sql.functions._

/** Mirrors the reference's metric oracles: exact meter-NAME-set equality
  * after commit (the 11 commit meters, IntegrationTest.java:106-117) and
  * scan (3 counters, MicrometerMetricsReporterTest.java:43-47, plus the
  * planning timer), counter values, the per-table tag
  * (MicrometerMetricsReporterTest.java:84-97), and Micrometer Timer
  * semantics for durations — count+total, not a flat counter
  * (timer.record, MicrometerMetricsReporter.java:89-92). */
class MetricsSpec extends LakeSuite {

  private val commitMeters = Set(
    "attempts", "addedDataFiles", "addedRecords", "addedFilesSizeInBytes",
    "totalDataFiles", "totalDeleteFiles", "totalRecords",
    "totalFilesSizeInBytes", "totalPositionalDeletes",
    "totalEqualityDeletes", "totalDuration").map("lake.commitReport." + _)

  private val scanMeters = Set(
    "resultDataFiles", "resultDeleteFiles", "totalFileSizeInBytes",
    "totalPlanningDuration").map("lake.scanReport." + _)

  test("append commit emits exactly the 11 commit meters, tagged by table") {
    val metrics = new SimpleMetrics
    val cat = LakeCatalog.open(freshWarehouse(), metrics)
    val t = cat.createTable("mynamespace", "mytable", ordersDF.schema)
    t.appendData(ordersDF.coalesce(1))
    assert(metrics.meterNames("mynamespace.mytable") === commitMeters)
    assert(metrics.counterValue("lake.commitReport.attempts", "mynamespace.mytable") === 1L)
    assert(metrics.counterValue("lake.commitReport.addedDataFiles", "mynamespace.mytable") === 1L)
    assert(metrics.counterValue("lake.commitReport.addedRecords", "mynamespace.mytable")
      === ordersDF.count())
    assert(metrics.counterValue("lake.commitReport.totalDeleteFiles", "mynamespace.mytable") === 0L)
    assert(metrics.counterValue("lake.commitReport.totalPositionalDeletes", "mynamespace.mytable") === 0L)
    // totalDuration is a TIMER: one commit = one recorded invocation,
    // and it is absent from the counter namespace
    assert(metrics.timerCount("lake.commitReport.totalDuration", "mynamespace.mytable") === 1L)
    assert(metrics.timerTotalMs("lake.commitReport.totalDuration", "mynamespace.mytable") >= 0L)
    assert(metrics.counterValue("lake.commitReport.totalDuration", "mynamespace.mytable") === 0L)
    // an unrelated table name has no meters (tag isolation)
    assert(metrics.meterNames("other.table").isEmpty)
  }

  test("two commits accumulate counters (totals grow per commit)") {
    val metrics = new SimpleMetrics
    val cat = LakeCatalog.open(freshWarehouse(), metrics)
    val t = cat.createTable("ns", "t", ordersDF.schema)
    t.appendData(ordersDF.coalesce(1))
    t.refresh().appendData(ordersDF.coalesce(1))
    // totalRecords accumulates n + 2n across the two reports
    assert(metrics.counterValue("lake.commitReport.totalRecords", "ns.t")
      === 3 * ordersDF.count())
    assert(metrics.counterValue("lake.commitReport.attempts", "ns.t") === 2L)
    // timer count tracks invocations (2 commits), independent of duration
    assert(metrics.timerCount("lake.commitReport.totalDuration", "ns.t") === 2L)
  }

  /** The external-registry bridge: a tiny tag-aware registry (what a
    * deployment wires to Micrometer/OTel in ~3 lines) fed through a
    * REAL commit + scan, checked with the reference's own oracles —
    * meter-name-set equality (IntegrationTest.java:106-117), the
    * tableName tag (MicrometerMetricsReporterTest.java:84-97), and
    * Timer record semantics (MicrometerMetricsReporter.java:89-92). */
  test("registry bridge publishes the exact meter set into a tag-aware registry") {
    import java.util.concurrent.TimeUnit
    val counters = scala.collection.concurrent.TrieMap
      .empty[(String, Map[String, String]), Double]
    val timers = scala.collection.concurrent.TrieMap
      .empty[(String, Map[String, String]), (Long, Long)]
    val registry = new MeterRegistry {
      def counter(name: String, tags: Map[String, String]) = (amount: Double) => {
        counters.updateWith((name, tags)) {
          case Some(v) => Some(v + amount); case None => Some(amount)
        }
        ()
      }
      def timer(name: String, tags: Map[String, String]) =
        (amount: Long, unit: TimeUnit) => {
          timers.updateWith((name, tags)) {
            case Some((n, tot)) => Some((n + 1, tot + unit.toMillis(amount)))
            case None => Some((1L, unit.toMillis(amount)))
          }
          ()
        }
    }
    val cat = LakeCatalog.open(freshWarehouse(), new RegistryMetricsReporter(registry))
    val t = cat.createTable("ns", "bridged", ordersDF.schema)
    t.appendData(ordersDF.coalesce(1))
    t.refresh().newScan().planFiles

    val tag = Map("tableName" -> "ns.bridged")
    val names = (counters.keySet ++ timers.keySet)
      .collect { case (n, tags) if tags == tag => n }
    assert(names === commitMeters ++ scanMeters)
    // counters increment (attempts = 1 first-try commit), timers record
    // one invocation per report — and durations never leak into the
    // counter namespace
    assert(counters((s"lake.commitReport.attempts", tag)) === 1.0)
    assert(counters((s"lake.commitReport.addedRecords", tag)) === ordersDF.count().toDouble)
    assert(timers((s"lake.commitReport.totalDuration", tag))._1 === 1L)
    assert(timers((s"lake.scanReport.totalPlanningDuration", tag))._1 === 1L)
    assert(!counters.keySet.exists(_._1.endsWith("Duration")))
    // a custom prefix reroutes every meter name, reference :28-31
    val counters2 = scala.collection.concurrent.TrieMap
      .empty[(String, Map[String, String]), Double]
    val registry2 = new MeterRegistry {
      def counter(name: String, tags: Map[String, String]) = (amount: Double) => {
        counters2.put((name, tags), amount); ()
      }
      def timer(name: String, tags: Map[String, String]) =
        (_: Long, _: TimeUnit) => ()
    }
    new RegistryMetricsReporter(registry2, "custom.").report(ScanReport(
      "ns.bridged", 1L, "true", 1L, 0L, 10L, 5L))
    assert(counters2.keySet.map(_._1) ===
      Set("custom.scanReport.resultDataFiles", "custom.scanReport.resultDeleteFiles",
        "custom.scanReport.totalFileSizeInBytes"))
    // null registry / null report no-op (reference :44-50)
    new RegistryMetricsReporter(null).report(ScanReport("t", 1L, "true", 0L, 0L, 0L, 0L))
    new RegistryMetricsReporter(registry).report(null)
  }

  test("scan planning emits the 3 scan counters plus the planning timer") {
    val metrics = new SimpleMetrics
    val cat = LakeCatalog.open(freshWarehouse(), metrics)
    val t = cat.createTable("ns", "scanned", ordersDF.schema)
    t.appendData(ordersDF.coalesce(1))
    val metricsAfterCommit = metrics.meterNames("ns.scanned")
    t.refresh().newScan().planFiles
    assert(metrics.meterNames("ns.scanned") -- metricsAfterCommit === scanMeters)
    assert(metrics.counterValue("lake.scanReport.resultDataFiles", "ns.scanned") === 1L)
    assert(metrics.counterValue("lake.scanReport.resultDeleteFiles", "ns.scanned") === 0L)
    assert(metrics.counterValue("lake.scanReport.totalFileSizeInBytes", "ns.scanned") > 0L)
    assert(metrics.timerCount("lake.scanReport.totalPlanningDuration", "ns.scanned") === 1L)
  }
}
