package graft.lake

import java.nio.file.Files
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Shared session + fixtures for lake-layer suites. */
trait LakeSuite extends AnyFunSuite {
  lazy val spark: SparkSession = LakeSuite.spark

  /** The reference's canonical 4-column schema (FIXTURES.md §1;
    * reference: IntegrationTest.java:59-64). */
  val canonicalSchema: StructType = StructType(Seq(
    StructField("text", StringType, nullable = false),
    StructField("count", IntegerType, nullable = false),
    StructField("amazing", BooleanType, nullable = false),
    StructField("event_timestamp", TimestampType, nullable = false)))

  /** The reference's canonical rows: +05:00 offsets stored as UTC
    * instants (reference: IntegrationTest.java:39-41). */
  def canonicalRows: Seq[Row] = Seq(
    Row("Hello world", 22, true,
      java.sql.Timestamp.from(java.time.OffsetDateTime.parse("2005-12-01T00:00+05:00").toInstant)),
    Row("Hello moon", 33, false,
      java.sql.Timestamp.from(java.time.OffsetDateTime.parse("2005-12-24T00:00+05:00").toInstant)))

  def canonicalDF = spark.createDataFrame(
    new java.util.ArrayList[Row](canonicalRows.asJava0), canonicalSchema)

  implicit class SeqOps[T](s: Seq[T]) {
    def asJava0: java.util.List[T] = {
      val l = new java.util.ArrayList[T]()
      s.foreach(l.add)
      l
    }
  }

  def freshWarehouse(): String =
    Files.createTempDirectory("graft_test_wh_").toString

  def ordersDF = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
  def lineitemDF = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
}

object LakeSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.extensions", "graft.lake.sql.LakeSqlExtensions")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}
