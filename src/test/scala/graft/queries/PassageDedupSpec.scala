package graft.queries

import graft.lake.LakeSuite

/** Structural properties of the passage-level dedup the DuckDB oracle
  * (which pins the exact 30-row list) does not state explicitly. */
class PassageDedupSpec extends LakeSuite {

  private val d = "/root/testdata/sf0.001"

  test("retention is a valid permyriad, consistent, ordered, and finds drops") {
    val rows = TextQueries.qPassageDedup(spark, d).collect()
    assert(rows.length == 30)
    rows.foreach { r =>
      val (n, dropped, ret) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(n >= 1L && dropped >= 0L && dropped <= n)
      assert(ret == (n - dropped) * 10000L / n, s"formula drift: $r")
    }
    val keys = rows.map(r => (r.getLong(3), r.getLong(0))).toSeq
    assert(keys == keys.sorted, "output must be (retained asc, doc_id)")
    // the corpus carries near-dups, so the worst-retained docs must
    // actually lose passages — a first-wins bug that kept everything
    // (or dropped everything) would flatline this
    assert(rows.head.getLong(3) < 10000L, "no passage was ever dropped")
    assert(rows.forall(_.getLong(3) > 0L) || rows.exists(_.getLong(2) <
      rows.head.getLong(1)), "every passage of every doc dropped")
  }

  test("exactly one copy of each distinct passage survives corpus-wide") {
    import org.apache.spark.sql.functions._
    val P = 32
    val pass = Tables.documents(spark, d)
      .select(col("doc_id"), split(col("text"), " ").as("ts"))
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, CAST(floor((size(ts) - 1) / $P) AS INT)), " +
          s"i -> array_join(slice(ts, 1 + i * $P, $P), ' '))")))
      .select(col("doc_id"), col("pos").cast("long").as("pid"),
        col("col").as("p"))
    val first = pass.groupBy(col("p"))
      .agg(min(col("doc_id") * 4096L + col("pid")).as("wcombo"))
    // the number of rows whose combo EQUALS their key's winner must be
    // exactly the distinct passage count: a combo collision (two
    // (doc, pid) pairs mapping to one integer — the 4096 bound
    // breaking) would let two copies of one passage both survive
    val kept = pass.join(first, Seq("p"))
      .filter(col("wcombo") === col("doc_id") * 4096L + col("pid"))
      .count()
    assert(kept == pass.select(col("p")).distinct().count())
    // and the bound itself holds on this corpus
    assert(pass.agg(max(col("pid"))).head.getLong(0) < 4096L)
  }
}
