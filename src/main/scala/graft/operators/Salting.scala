package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Key-salting for skewed aggregations: two-phase groupBy where the
  * partial phase adds a salt bucket to the key, spreading a hot key
  * over `saltBuckets` reducers, and the final phase re-aggregates the
  * partials. Exact for decomposable aggregates (sum/count/min/max).
  *
  * At 100 TB this is the standard answer when AQE skew handling isn't
  * enough (e.g. one key holding >50% of rows in a groupBy); at test
  * scale it is oracle-verified equal to the direct groupBy
  * (q_salted_agg).
  */
object Salting {

  /** Partition-derived salt: rows of a hot key are spread over however
    * many input partitions hold them, regardless of row content —
    * value-derived hashes collapse when the hot key's rows are
    * duplicates (the common dedup-corpus case), and RNG salts break
    * exactly-once guarantees under task retry. Deterministic given the
    * input partitioning, which the final re-aggregation makes
    * irrelevant to the result anyway. */
  private def salt(buckets: Int): Column =
    pmod(spark_partition_id(), lit(buckets))

  /** groupBy(keys).agg(sum, count, min, max of valueCol), salted. */
  def saltedStats(df: DataFrame, keys: Seq[String], valueCol: String,
      saltBuckets: Int = 16): DataFrame = {
    df.withColumn("__salt", salt(saltBuckets))
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(
        sum(col(valueCol)).as("__sum"),
        count(lit(1)).as("__cnt"),
        min(col(valueCol)).as("__min"),
        max(col(valueCol)).as("__max"))
      .groupBy(keys.map(col): _*)
      .agg(
        sum(col("__sum")).as("sum_v"),
        sum(col("__cnt")).as("n"),
        min(col("__min")).as("min_v"),
        max(col("__max")).as("max_v"))
  }
}
