package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.CoreQueries.q1PricingSummary(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.CoreQueries.queries ++
      graft.queries.AggWindowQueries.queries ++
      graft.queries.FunctionQueries.queries ++
      graft.queries.EventQueries.queries ++
      graft.queries.LakeQueries.queries ++
      graft.queries.TextQueries.queries ++
      graft.queries.SimilarityQueries.queries ++
      graft.queries.JoinExtraQueries.queries ++
      graft.queries.SqlSourceQueries.queries ++
      graft.queries.OperatorQueries.queries ++
      graft.queries.GraphQueries.queries
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.CoreQueries.oracles ++
      graft.queries.AggWindowQueries.oracles ++
      graft.queries.FunctionQueries.oracles ++
      graft.queries.EventQueries.oracles ++
      graft.queries.LakeQueries.oracles ++
      graft.queries.TextQueries.oracles ++
      graft.queries.SimilarityQueries.oracles ++
      graft.queries.JoinExtraQueries.oracles ++
      graft.queries.SqlSourceQueries.oracles ++
      graft.queries.OperatorQueries.oracles ++
      graft.queries.GraphQueries.oracles
}
