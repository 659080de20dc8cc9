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

  test("whole loop matches an independent symbol-level reference (Sennrich greedy)") {
    import org.apache.spark.sql.functions._
    // brute-force reference: symbol arrays, explicit greedy L2R merge —
    // catches string-rewrite bugs the DuckDB oracle shares with the
    // Spark side (e.g. the single-space sentinel that under-merged
    // adjacent occurrences: 'a b a b' must become 'ab ab')
    var vocab: Map[Vector[String], Long] = Tables.documents(spark, d)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) >= 1)
      .groupBy(col("w")).agg(count(lit(1)).as("freq")).collect()
      .map { r =>
        // split by CODEPOINT (the engines' substring/len unit), not by
        // Java char — surrogate pairs must stay whole
        val syms = r.getString(0).codePoints().toArray.toVector
          .map(cp => new String(Character.toChars(cp)))
        syms -> r.getLong(1)
      }.toMap
    val expected = (1 to 5).map { _ =>
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, f) =>
        syms.sliding(2).filter(_.length == 2)
          .foreach(p => counts((p(0), p(1))) = counts.getOrElse((p(0), p(1)), 0L) + f)
      }
      val ((a, b), cnt) = counts.minBy { case ((x, y), c) => (-c, x, y) }
      vocab = vocab.map { case (syms, f) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            out += a + b; i += 2
          } else { out += syms(i); i += 1 }
        }
        out.result() -> f
      }.groupMapReduce(_._1)(_._2)(_ + _)
      (a, b, cnt)
    }
    val got = TextQueries.qBpeLearnMerges(spark, d).collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(4))).toSeq
    assert(got == expected, s"loop diverged from the reference:\n$got\n$expected")
  }
}
