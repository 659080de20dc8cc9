package graft.lake

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Parquet bloom filters on write: point lookups on high-cardinality
  * columns OUTSIDE the sort order skip row groups min/max stats cannot
  * rule out. Enabled per column via Iceberg's property names; the
  * reader consults the filters automatically for pushed equality
  * predicates. */
class BloomFilterSpec extends LakeSuite {

  private def bloomOffsets(path: String, column: String): Seq[Long] = {
    val conf = spark.sessionState.newHadoopConf()
    val reader = ParquetFileReader.open(
      HadoopInputFile.fromPath(new Path(path), conf))
    try reader.getFooter.getBlocks.asScala.toSeq.flatMap(
      _.getColumns.asScala.find(_.getPath.toDotString == column)
        .map(_.getBloomFilterOffset))
    finally reader.close()
  }

  test("bloom-enabled columns carry filters in the footer; reads stay exact") {
    import spark.implicits._
    val cat = LakeCatalog.open(freshWarehouse())
    val v = (1 to 5000).map(i => (i, s"key-${i * 2654435761L % 100000}", i % 7))
      .toDF("id", "ukey", "bucket")
    val t = cat.createTable("ns", "bloom", v.schema)

    // default: no blooms anywhere
    t.appendData(v)
    val plain = t.refresh().metadata.currentFiles.head.path
    assert(bloomOffsets(plain, "ukey").forall(_ < 0))

    // enable on ukey only; new files carry the filter for exactly it
    t.refresh().setProperty("write.parquet.bloom-filter-enabled.column.ukey", "true")
    t.refresh().overwriteAll(v)
    val files = t.refresh().metadata.currentFiles.map(_.path)
    assert(files.forall(p => bloomOffsets(p, "ukey").forall(_ >= 0)))
    assert(files.forall(p => bloomOffsets(p, "id").forall(_ < 0)))

    // point lookups stay exact through the Scala and SQL read paths
    val hit = s"key-${42L * 2654435761L % 100000}"
    assert(t.refresh().newScan(LakePredicate.Eq("ukey", hit)).toDF(spark)
      .where($"ukey" === hit).count() >= 1L)
    assert(t.refresh().newScan().toDF(spark)
      .where($"ukey" === "key-absent").count() === 0L)

    // CoW rewrites and compaction keep writing them (same write path)
    t.refresh().updateWhere(spark, LakePredicate.Eq("bucket", Int.box(3)),
      Map("bucket" -> lit(99)))
    assert(t.refresh().metadata.currentFiles.map(_.path)
      .forall(p => bloomOffsets(p, "ukey").forall(_ >= 0)))
  }
}
