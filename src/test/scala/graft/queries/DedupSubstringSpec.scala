package graft.queries

import org.apache.spark.sql.functions._
import graft.lake.LakeSuite

/** The hashed window pipeline must agree with a from-scratch EXACT
  * STRING computation of duplicated 20-token spans — this checks the
  * whole chain (tokenization, stride-1 windows, md5 keying, min≠max
  * dup detection, per-doc rollup) against semantics with no hashing
  * in it at all. */
class DedupSubstringSpec extends LakeSuite {

  test("hashed span pipeline matches an exact-string reference") {
    val d = "/root/testdata/sf0.001"
    val W = 20
    val docs = spark.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id").cast("long"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))

    // windows by raw text, doc sets per window, then per-doc coverage
    val winsOf = docs.map { case (id, text) =>
      val ws = if (text == null) Array.empty[String] else text.split(" ", -1)
      id -> (0 to ws.length - W).map(i => ws.slice(i, i + W).mkString(" "))
    }.toMap
    val docsPerWin = winsOf.toSeq
      .flatMap { case (id, ws) => ws.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val expected = winsOf.collect { case (id, ws) if ws.nonEmpty =>
      val dup = ws.count(w => docsPerWin(w).size >= 2).toLong
      (id, ws.size.toLong, dup, dup * 10000L / ws.size)
    }.toSet

    val got = TextQueries.qDedupSubstring(spark, d)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    graft.queries.QueryCaches.clear()

    assert(got === expected)
    assert(got.nonEmpty)
    // the measure must actually fire on this corpus (it carries
    // constructed near-twins): at least one doc with a duplicated span
    assert(got.exists(_._3 > 0), "no duplicated spans found at sf0.001")
  }
}
