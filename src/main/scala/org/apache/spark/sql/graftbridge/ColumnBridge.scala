package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal access shim: Spark 4's Column↔Expression bridge
  * (classic.ExpressionUtils) is private[sql], so custom Catalyst
  * expressions need one forwarding object inside the sql package tree.
  * Nothing else of Spark's internals is touched. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

/** Session-scoped conf without global mutation: cloneSession() (shared
  * SparkContext + cache, copied SQLConf) is private[sql], so the lake
  * writer reaches it through this shim to pin parquet writer confs per
  * write instead of set/restore races on the shared session (two
  * concurrent writers interleaving set/restore would leak the conf
  * session-wide — the bug class this replaces). */
object SessionBridge {
  import org.apache.spark.sql.{DataFrame, SparkSession}
  import org.apache.spark.sql.classic.{Dataset => CDataset, SparkSession => CSparkSession}

  /** Rebind `df`'s logical plan to a cloned session carrying `confs`.
    * Right for WRITES (the write command runs under the new session);
    * for reads use [[sessionWithConfs]] — a file relation captures its
    * session when `.parquet()` resolves it, so the read must be BUILT
    * on the configured session, not rebound after. */
  def withConfs(df: DataFrame, confs: Map[String, String]): DataFrame =
    CDataset.ofRows(sessionWithConfs(df.sparkSession, confs)
      .asInstanceOf[CSparkSession], df.queryExecution.logical)

  /** A cloned session (shared context + cache, copied conf) with the
    * given confs applied. */
  def sessionWithConfs(s: SparkSession, confs: Map[String, String]): SparkSession = {
    val clone = s.asInstanceOf[CSparkSession].cloneSession()
    confs.foreach { case (k, v) => clone.conf.set(k, v) }
    clone
  }
}
