package graft.queries

import graft.lake.LakeSuite

/** The dedup_simhash pair-budget gate (round 12): under the budget the
  * query materializes the exact pair set it always did; past the
  * budget it refuses loudly and points at the linear-output
  * `simhash_clusters` twin (round 14 — previously the shingle-jaccard
  * clusters) — never a silently truncated pair table. */
class SimhashGateSpec extends LakeSuite {

  private val d = "/root/testdata/sf0.001"

  test("default budget: pair set unchanged; tiny budget: loud refusal") {
    val base = TextQueries.qSimhashDedup(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    QueryCaches.clear()
    assert(base.nonEmpty)

    // a 1-pair budget trips the gate deterministically
    spark.conf.set("graft.simhashDedup.pairBudget", "1")
    try {
      val e = intercept[IllegalStateException] {
        TextQueries.qSimhashDedup(spark, d).collect()
      }
      assert(e.getMessage.contains("simhash_clusters"))
      assert(e.getMessage.contains("pairBudget"))
    } finally {
      spark.conf.unset("graft.simhashDedup.pairBudget")
      QueryCaches.clear()
    }

    // budget ≤ 0 disables the gate (no estimate job) and must produce
    // the identical pair set
    spark.conf.set("graft.simhashDedup.pairBudget", "0")
    try {
      val ungated = TextQueries.qSimhashDedup(spark, d).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(ungated === base)
    } finally {
      spark.conf.unset("graft.simhashDedup.pairBudget")
      QueryCaches.clear()
    }
  }
}
