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
