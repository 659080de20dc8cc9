package graft.queries

import graft.lake.LakeSuite

/** Structural invariants for c-TF-IDF topic keywords and the
  * temperature-flattened mixture. */
class TopicsMixtureSpec extends LakeSuite {

  private val d = "/root/testdata/sf0.001"

  test("ctfidf: 5 per cell, score formula consistent, idf discriminates") {
    val rows = SimilarityQueries.qCtfidfTopics(spark, d).collect()
    assert(rows.nonEmpty)
    val byCell = rows.groupBy(_.getInt(0))
    byCell.foreach { case (_, rs) =>
      assert(rs.map(_.getLong(1)).sorted.sameElements(1L to rs.length),
        "ranks must be 1..n within a cell")
      assert(rs.length <= 5)
      // scores descend with rank (ties broken by word, score non-strict)
      val sc = rs.sortBy(_.getLong(1)).map(_.getLong(4))
      assert(sc.sameElements(sc.sorted.reverse))
    }
    rows.foreach { r =>
      assert(r.getLong(4) % r.getLong(3) == 0L,
        s"score must be tf × integer idf-bits: $r")
      assert(r.getLong(4) >= r.getLong(3), "idf-bits floor is 1 (bitlen ≥ 1)")
    }
    // a word present in EVERY cell has idf bitlen((C+C) div C)=bitlen(2)=2;
    // rarer words must be able to beat common ones — at least two cells
    // must disagree on their head keyword or the idf term did nothing
    val heads = byCell.values.map(_.minBy(_.getLong(1)).getString(2)).toSeq
    assert(heads.distinct.size > 1, "every cell picked the same head keyword")
  }

  test("temperature mixture: exact isqrt, flattening direction, budget") {
    val rows = TextQueries.qDataMixtureTemperature(spark, d).collect()
    assert(rows.length == 20)
    val total = rows.map(_.getLong(1)).sum
    rows.foreach { r =>
      val (n, w) = (r.getLong(1), r.getLong(2))
      val x = n * 100000000L / total
      // w is EXACTLY ⌊√x⌋ — the clamp worked
      assert(w * w <= x && (w + 1) * (w + 1) > x, s"isqrt drift: $r (x=$x)")
    }
    // flattening: for any two sources, the weight ratio must sit BETWEEN
    // 1 and the share ratio (sqrt compresses toward uniform)
    val sorted = rows.sortBy(_.getLong(1))
    val (lo, hi) = (sorted.head, sorted.last)
    if (lo.getLong(1) < hi.getLong(1)) {
      val shareRatio = hi.getLong(1).toDouble / lo.getLong(1)
      val weightRatio = hi.getLong(2).toDouble / lo.getLong(2)
      assert(weightRatio <= shareRatio + 1e-9 && weightRatio >= 1.0 - 1e-9,
        s"T=2 must compress ratios: share $shareRatio weight $weightRatio")
    }
    // permilles are floor-consistent and sum to ≤ 1000
    val wTot = rows.map(_.getLong(2)).sum
    rows.foreach(r => assert(r.getLong(3) == 1000L * r.getLong(2) / wTot))
    assert(rows.map(_.getLong(3)).sum <= 1000L)
  }
}
