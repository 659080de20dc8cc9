package graft.queries

import graft.lake.LakeSuite
import org.apache.spark.sql.catalyst.expressions.SubqueryExpression
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Window => LWindow}

/** Corpus-wide lint: an UNPARTITIONED window funnels its whole input
  * through one task — the scale-killer class the round-12 verdict
  * flagged (`q_ev_rfm`'s three ntile(5)s, `perplexity_buckets`'
  * ntile(3), both since re-planned onto [[HistogramNtile]]). This spec
  * pins the class closed: every query in the 173-entry corpus is
  * planned and any `Window` with an empty partitionSpec in its
  * OPTIMIZED logical plan must be allowlisted here with a stated
  * bounded-input justification. A new query that sneaks in a global
  * sort-window over corpus-sized data fails the build, not the 100-TB
  * run. */
class GlobalWindowLintSpec extends LakeSuite {

  private val d = "/root/testdata/sf0.001"

  /** query → why its unpartitioned window's input is BOUNDED (never
    * corpus-sized). Keep this under 10 entries — past that the class
    * is regrowing. */
  private val allow: Map[String, String] = Map(
    // HistogramNtile's mass cumulative is partitioned by metric id, so
    // q_ev_rfm / perplexity_buckets no longer appear here at all
    "rrf_fusion" -> ("rank windows over the union of two TakeOrdered " +
      "top-50 lists — ≤100 rows by construction (SimilarityQueries " +
      "pins the limit upstream)"),
    "data_mixture_temperature" -> ("share windows over the per-source " +
      "rollup — |sources| rows (single-digit in the documents corpus; " +
      "dimension-sized, never row-sized)"),
    "q_pareto_frontier" -> ("suffix-max window over the cents-div-65536 " +
      "bucket rollup (value-domain-bounded, ~770 rows) and the verify " +
      "window over histogram-pruned survivors gated by " +
      "graft.pareto.budget (loud refusal past 2^21)"))

  private def unpartitionedWindows(p: LogicalPlan): Seq[LWindow] = {
    val here = p.collect { case w: LWindow if w.partitionSpec.isEmpty => w }
    val subPlans = p.flatMap(n => n.expressions.flatMap(_.collect {
      case s: SubqueryExpression => s.plan
    }))
    here ++ subPlans.flatMap(unpartitionedWindows)
  }

  test("no corpus query plans an unpartitioned window unless allowlisted") {
    Corpus.prepare(spark, d)
    val offenders = scala.collection.mutable.ListBuffer.empty[String]
    val unusedAllow = scala.collection.mutable.Set(allow.keySet.toSeq: _*)
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, d)
        val n = unpartitionedWindows(df.queryExecution.optimizedPlan).size
        if (n > 0) {
          if (allow.contains(name)) unusedAllow -= name
          else offenders += s"$name ($n unpartitioned window(s))"
        }
      } finally QueryCaches.clear()
    }
    assert(offenders.isEmpty,
      "unpartitioned windows outside the allowlist:\n  " +
        offenders.mkString("\n  "))
    assert(unusedAllow.isEmpty,
      s"stale allowlist entries (no longer plan a global window): $unusedAllow")
    assert(allow.size < 10, "allowlist is regrowing the global-window class")
  }
}
