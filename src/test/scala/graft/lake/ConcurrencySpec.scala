package graft.lake

import scala.concurrent.{Await, Future}
import scala.concurrent.duration._
import scala.concurrent.ExecutionContext.Implicits.global

/** Real contention on the commit CAS: N threads race appendFile commits
  * against one table; every commit must land (no lost updates) and the
  * attempt counters must reflect the retries the losers performed. */
class ConcurrencySpec extends LakeSuite {

  test("8 concurrent append commits all land; no lost updates") {
    val metrics = new SimpleMetrics
    val cat = LakeCatalog.open(freshWarehouse(), metrics)
    val t = cat.createTable("ns", "contended", ordersDF.schema)
    // stage data files sequentially (Spark jobs), then race ONLY the
    // metadata commits — that is where the CAS lives
    val batches = (0 until 8).map { i =>
      t.writeDataFiles(ordersDF.filter(
        org.apache.spark.sql.functions.col("o_orderkey") % 8 === i).coalesce(1))
    }
    val reports = Await.result(
      Future.sequence(batches.map { b =>
        Future(cat.loadTable("ns", "contended").newAppend()
          .appendFile(b.head).commit())
      }), 120.seconds)

    val re = cat.loadTable("ns", "contended")
    assert(re.snapshots.size === 8)
    assert(re.metadata.currentFiles.size === 8)
    assert(re.metadata.currentSnapshot.get.totalRecords === ordersDF.count())
    assert(re.newScan().toDF(spark).count() === ordersDF.count())
    // every commit succeeded exactly once; contention shows up as
    // attempts > 1 somewhere (not guaranteed per-thread, but the SUM of
    // attempts must be >= number of commits)
    assert(reports.map(_.attempts).sum >= 8)
    assert(reports.map(_.snapshotId).distinct.size === 8)
  }
}
