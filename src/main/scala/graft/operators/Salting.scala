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

  /** Hybrid salt: content hash of all columns combined with the input
    * partition id. The content hash spreads distinct-valued hot-key
    * rows wherever they sit; the partition id additionally spreads
    * FULL-duplicate rows that arrive in different partitions. (The
    * irreducible residual — identical rows co-located in one partition
    * — would need a nondeterministic per-row id, which breaks
    * exactly-once under task retry; accepted and documented.) */
  private def salt(df: DataFrame, buckets: Int): Column =
    pmod(hash((df.columns.map(col) :+ spark_partition_id()): _*), lit(buckets))

  /** groupBy(keys).agg(sum, count, min, max of valueCol), salted. */
  def saltedStats(df: DataFrame, keys: Seq[String], valueCol: String,
      saltBuckets: Int = 16): DataFrame = {
    df.withColumn("__salt", salt(df, saltBuckets))
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
