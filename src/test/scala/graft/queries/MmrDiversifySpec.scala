package graft.queries

import graft.lake.LakeSuite

/** Structural MMR properties beyond the oracle's exact 8-row pin. */
class MmrDiversifySpec extends LakeSuite {

  private val d = "/root/testdata/sf0.001"

  test("greedy invariants: head pick, distinctness, formula, diversity bites") {
    val rows = SimilarityQueries.qMmrDiversify(spark, d).collect()
    assert(rows.map(_.getLong(0)).toSeq == (1L to 8L))
    val ids = rows.map(_.getLong(1))
    assert(ids.distinct.length == 8, "re-selected a vector")

    rows.foreach { r =>
      assert(r.getLong(4) == r.getLong(2) - r.getLong(3), s"mmr formula: $r")
    }
    // pick 1 maximizes pure relevance (redundancy 0 by definition)
    assert(rows.head.getLong(3) == 0L)
    val rels = rows.map(_.getLong(2))
    assert(rows.head.getLong(2) == rels.max,
      "first pick must be the most relevant candidate")
    // later picks pay a strictly positive redundancy somewhere, and the
    // selection ORDER must differ from pure relevance order — otherwise
    // the diversity term never fired on this corpus and the operator is
    // indistinguishable from top-k
    assert(rows.tail.exists(_.getLong(3) > 0L), "redundancy never engaged")
    assert(rels.toSeq != rels.sorted.reverse.toSeq,
      "selection order degenerated to pure relevance ranking")
  }
}
