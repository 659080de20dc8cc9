package graft.queries

import graft.lake.LakeSuite
import org.apache.spark.sql.functions._

/** The size-gated contamination paths must agree exactly: the
  * under-budget broadcast join and the over-budget shuffle join on the
  * shingle key produce the identical per-doc overlap counts — the gate
  * only picks the join strategy, never the answer. The parameterized
  * form must also accept an external benchmark table (the real-world
  * shape: a fixed eval set that is NOT a slice of the corpus). */
class ContaminationSpec extends LakeSuite {

  private val d = "/root/testdata/sf0.001"

  test("broadcast path == shuffle-join path; gate is budget-driven") {
    val fast = TextQueries.qContamination(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(fast.nonEmpty)
    // force the over-budget path: zero budget disables broadcasting
    spark.conf.set("graft.contamination.broadcastBudget", "0")
    try {
      val slow = TextQueries.qContamination(spark, d).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(slow === fast)
    } finally spark.conf.unset("graft.contamination.broadcastBudget")
  }

  test("external benchmark table: hits found, non-overlapping ids stay clean") {
    import spark.implicits._
    val corpus = graft.queries.Tables.documents(spark, d)
    // an external eval set: two real documents' text under foreign ids,
    // plus one row that matches nothing
    val benchTexts = corpus.filter(col("doc_id").isin(3L, 7L))
      .select(col("text")).as[String].collect()
    val bench = benchTexts.zipWithIndex
      .map { case (t, i) => (9000L + i, t) }
      .toSeq.:+((9999L, "z" * 40)).toDF("doc_id", "text")
    val out = TextQueries.contaminationAgainst(spark, corpus, bench)
    val hit = out.collect().map(_.getLong(0)).toSet
    // the source documents themselves overlap their own text
    assert(hit.contains(3L) && hit.contains(7L))
  }
}
