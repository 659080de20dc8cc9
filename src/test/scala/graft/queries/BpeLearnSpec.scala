package graft.queries

import graft.lake.LakeSuite

/** Structural BPE-training invariants beyond the oracle's exact 5-row
  * pin. */
class BpeLearnSpec extends LakeSuite {

  private val d = "/root/testdata/sf0.001"

  test("merge sequence: counts non-increasing, round 1 = the pair statistic") {
    val rows = TextQueries.qBpeLearnMerges(spark, d).collect()
    assert(rows.map(_.getLong(0)).toSeq == (1L to 5L))
    rows.foreach { r =>
      assert(r.getString(3) == r.getString(1) + r.getString(2),
        s"merged symbol must be the concatenation: $r")
      assert(r.getLong(4) > 0L)
    }
    // merging can only remove occurrences of other pairs or create new
    // pairs bounded by their constituents' old counts, so the argmax
    // sequence is non-increasing — a violated bound means the rewrite
    // corrupted the symbol stream
    val counts = rows.map(_.getLong(4)).toSeq
    assert(counts == counts.sorted.reverse, s"counts must not increase: $counts")

    // round 1's winner IS the top row of the standalone pair statistic
    // (two operators, one definition)
    val top = TextQueries.qBpePairCounts(spark, d).collect().head
    assert(rows.head.getString(1) == top.getString(0) &&
      rows.head.getString(2) == top.getString(1) &&
      rows.head.getLong(4) == top.getLong(2),
      s"round-1 merge ${rows.head} != pair-statistic top $top")
  }
}
