package graft.queries

import graft.lake.LakeSuite

/** Structural properties of the hybrid-retrieval RRF fusion that the
  * DuckDB oracle (which pins the exact fused list) does not state
  * explicitly. */
class RrfFusionSpec extends LakeSuite {

  private val d = "/root/testdata/sf0.001"

  test("fused list is well-formed: ranks bounded, scores additive, ordered") {
    val rows = SimilarityQueries.qRrfFusion(spark, d).collect()
    assert(rows.nonEmpty && rows.length <= 20)

    rows.foreach { r =>
      val sr = if (r.isNullAt(1)) None else Some(r.getLong(1))
      val dr = if (r.isNullAt(2)) None else Some(r.getLong(2))
      val rrf = r.getLong(3)
      assert(sr.isDefined || dr.isDefined,
        s"row in neither retriever's top-50: $r")
      sr.foreach(v => assert(v >= 1L && v <= 50L))
      dr.foreach(v => assert(v >= 1L && v <= 50L))
      // the fused score IS the declared formula — no hidden weighting
      val expected = sr.map(v => 1000000L / (60L + v)).getOrElse(0L) +
        dr.map(v => 1000000L / (60L + v)).getOrElse(0L)
      assert(rrf == expected, s"rrf mismatch: $r expected $expected")
    }

    val keys = rows.map(r => (-r.getLong(3), r.getLong(0))).toSeq
    assert(keys == keys.sorted, "output must be (rrf desc, doc_id)")
  }

  test("a doc ranked #1 by both sides would dominate; both sides contribute") {
    val rows = SimilarityQueries.qRrfFusion(spark, d).collect()
    // the fusion is only meaningful if each retriever actually places
    // docs in the final list — an empty side degenerates to a renamed
    // single ranking
    assert(rows.exists(!_.isNullAt(1)), "no sparse-side contribution")
    assert(rows.exists(!_.isNullAt(2)), "no dense-side contribution")
    // max possible fused score: 2 * 1000000/61; every emitted score
    // stays at or below it
    val cap = 2L * (1000000L / 61L)
    rows.foreach(r => assert(r.getLong(3) <= cap))
  }
}
