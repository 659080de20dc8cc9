package graft.queries

import graft.lake.LakeSuite

/** Structural properties of the cross-document n-gram novelty profile
  * that the DuckDB oracle (which pins the exact 30-row list) does not
  * state explicitly. */
class NgramNoveltySpec extends LakeSuite {

  private val d = "/root/testdata/sf0.001"

  test("novelty is a valid permyriad, internally consistent, ordered") {
    val rows = TextQueries.qNgramNovelty(spark, d).collect()
    assert(rows.length == 30)

    rows.foreach { r =>
      val (n, seen, nov) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(n >= 1L && seen >= 0L && seen <= n)
      assert(nov == (n - seen) * 10000L / n, s"formula drift: $r")
      assert(nov >= 0L && nov <= 10000L)
    }

    val keys = rows.map(r => (r.getLong(3), r.getLong(0))).toSeq
    assert(keys == keys.sorted, "output must be (novelty asc, doc_id)")
  }

  test("the least-novel surface actually finds duplicated mass") {
    // the corpus carries real near-dups (the dedup family's fixtures),
    // so the BOTTOM of the novelty ranking must sit strictly below
    // fully-novel — otherwise the operator measured nothing
    val rows = TextQueries.qNgramNovelty(spark, d).collect()
    assert(rows.exists(_.getLong(3) < 10000L),
      "no document shares any shingle with an earlier one")
    // and a doc whose every shingle was seen earlier scores exactly 0
    // if present; either way the minimum is the list head
    assert(rows.head.getLong(3) == rows.map(_.getLong(3)).min)
  }
}
