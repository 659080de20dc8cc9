package graft.queries

import graft.lake.LakeSuite

/** Structural properties of the Naive-Bayes quality classifier that
  * the DuckDB oracle (which pins the exact confusion counts) does not
  * state explicitly. */
class NbQualityClassifySpec extends LakeSuite {

  private val d = "/root/testdata/sf0.001"

  test("confusion rollup is well-formed and covers every scoreable doc") {
    val rows = TextQueries.qNbQualityClassify(spark, d).collect()
    assert(rows.nonEmpty && rows.length <= 4)

    // margins sit strictly on the side the prediction claims — the
    // decision rule IS margin > 0, so the rollup extrema must obey it
    rows.foreach { r =>
      val (pred, minM, maxM) = (r.getBoolean(1), r.getLong(3), r.getLong(4))
      assert(minM <= maxM)
      if (pred) assert(minM > 0L, s"predicted_en row with margin <= 0: $r")
      else assert(maxM <= 0L, s"!predicted_en row with margin > 0: $r")
    }

    // ordered by (actual, predicted), no duplicate cells
    val keys = rows.map(r => (r.getBoolean(0), r.getBoolean(1))).toSeq
    assert(keys == keys.sorted)
    assert(keys.distinct == keys)

    // every document has >= 1 token under split(" ", -1) — even the
    // empty string yields one token — so n_docs sums to the corpus
    val total = rows.map(_.getLong(2)).sum
    assert(total == Tables.documents(spark, d).count())
  }

  test("the classifier is not degenerate: both predicted classes occur") {
    // the round-12 lesson this spec pins: the first cut scored in
    // whole bitlen units and collapsed to all-positive (the label's
    // true log-odds are ~±2 bits, below bitlen resolution); the ppm
    // posterior device must keep both sides of the decision boundary
    // populated on every test corpus
    val preds = TextQueries.qNbQualityClassify(spark, d)
      .select("predicted_en").collect().map(_.getBoolean(0)).toSet
    assert(preds == Set(true, false),
      s"degenerate classifier: only $preds predicted")
  }
}
