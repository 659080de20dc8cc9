package graft.queries

import graft.lake.LakeSuite

/** Quality floor for the PQ candidate-generate + exact-re-rank path —
  * the property the hash oracle (which pins exact hit counts) cannot
  * EXPRESS: that 32 bits of code keep enough of the true neighborhood
  * inside the 50-candidate working set to be a usable index. Both
  * sides of the recall are deterministic integer arithmetic, so the
  * floor is a fixed fact of the corpus, not a flaky statistic. */
class PqRecallSpec extends LakeSuite {

  private val d = "/root/testdata/sf0.001"

  test("PQ ADC+rerank recall@5: every query ≥ 2/5, mean ≥ 0.5") {
    val rows = SimilarityQueries.qPqRecall(spark, d).collect()
    QueryCaches.clear()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getLong(2) >= 2L,
        s"query ${r.getLong(1)} recall collapsed: ${r.getLong(2)}/5")
    }
    val total = rows.map(_.getLong(2)).sum
    assert(total >= 13L, s"mean recall below 0.5: $total/25")
  }

  test("pq codes: 8 nibbles, qerr non-negative and bounded by 8 subspace diameters") {
    val rows = SimilarityQueries.qPqEncode(spark, d).collect()
    QueryCaches.clear()
    assert(rows.length == 500)
    rows.foreach { r =>
      val code = r.getLong(1)
      assert(code >= 0L && code < (1L << 32), s"code out of 32-bit range: $r")
      assert(r.getLong(2) >= 0L, s"negative reconstruction error: $r")
    }
  }
}
