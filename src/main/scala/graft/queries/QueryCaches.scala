package graft.queries

import org.apache.spark.sql.DataFrame

/** Registry for DataFrames a query builder persisted for intra-query
  * reuse. Query functions return lazy plans, so they cannot unpersist
  * after their own terminal action — the harness (Bench/Verify/specs)
  * calls [[clear]] once the action completes instead. Without this,
  * corpus runs that execute all queries in one session accumulate
  * cached blocks until eviction pressure.
  *
  * Deliberately NOT used for cross-invocation indexes (bucketed tables,
  * the IVF quantizer): those are memoized per corpus dir by design.
  */
object QueryCaches {
  private val persisted = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Register a persisted DataFrame for later cleanup; returns it. */
  def track(df: DataFrame): DataFrame = { persisted.add(df); df }

  /** Unpersist everything registered since the last clear. */
  def clear(): Unit = {
    var df = persisted.poll()
    while (df != null) {
      df.unpersist(blocking = false)
      df = persisted.poll()
    }
  }
}
