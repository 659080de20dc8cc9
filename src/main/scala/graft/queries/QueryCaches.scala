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

/** Memo for cross-invocation index artifacts (bucketed tables, the IVF
  * inverted file, SQL catalog registrations) keyed by (SparkSession,
  * corpus dir) — NOT by dir alone: the artifacts hold session-bound
  * state (persisted blocks, session-catalog table names, catalog-plugin
  * confs), so a second SparkSession in the same JVM must rebuild rather
  * than inherit a dead session's handles. Entries for stopped sessions
  * are dropped lazily on the next lookup. */
final class SessionMemo[T] {
  private val map = new java.util.concurrent.ConcurrentHashMap[
    (org.apache.spark.sql.SparkSession, String), T]()

  def getOrBuild(s: org.apache.spark.sql.SparkSession, d: String)(build: => T): T = {
    map.keySet.removeIf(_._1.sparkContext.isStopped) // GC dead sessions' entries
    map.computeIfAbsent((s, d), _ => build)
  }
}
