package graft.lake

import org.apache.spark.sql.functions._

/** `write.target-file-size-bytes` (Iceberg's target file size): writes
  * roll into target-sized files via a rows-per-file cap derived from
  * the table's own manifest-measured average row size. */
class TargetFileSizeSpec extends LakeSuite {

  test("appends roll into target-sized files once the table has a size basis") {
    val cat = LakeCatalog.open(freshWarehouse())
    val t = cat.createTable("ns", "tfs", ordersDF.schema)
    // seed commit establishes the avg-row-size basis
    t.appendData(ordersDF.limit(300), numFiles = 1)
    val seed = t.refresh().metadata.currentFiles
    assert(seed.size === 1)
    val avgRow = seed.map(_.sizeBytes).sum / seed.map(_.recordCount).sum

    // target ~200 rows per file
    t.setProperty("write.target-file-size-bytes", (avgRow * 200).toString)
    t.refresh().appendData(ordersDF, numFiles = 1)
    val files = t.refresh().metadata.currentFiles.filterNot(
      f => seed.map(_.path).contains(f.path))
    // the single-partition append rolled into multiple bounded files
    assert(files.size > 1, s"expected rolling, got ${files.size} file(s)")
    assert(files.forall(_.recordCount <= 220L),
      s"rows per file: ${files.map(_.recordCount)}")
    assert(files.map(_.recordCount).sum === ordersDF.count())

    // rows all intact
    assert(t.refresh().newScan().toDF(spark).count() ===
      ordersDF.count() + 300L)

    // unset → next append writes per partitioning again
    t.setProperty("write.target-file-size-bytes", "0")
    t.refresh().appendData(ordersDF.limit(500)
      .withColumn("o_orderkey", col("o_orderkey") + 800000000L), numFiles = 1)
    val third = t.refresh().metadata.currentFiles
      .filterNot(f => (seed ++ files).map(_.path).contains(f.path))
    assert(third.size === 1)
  }
}
