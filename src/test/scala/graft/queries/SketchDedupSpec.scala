package graft.queries

import graft.lake.LakeSuite

/** Structural guarantees of the CMS heavy-hitter gate and the bloom
  * incremental dedup that the exact-value oracles do not state. */
class SketchDedupSpec extends LakeSuite {

  private val d = "/root/testdata/sf0.001"

  test("heavy hitters: gates actually exercised the sketch and passed") {
    val rows = TextQueries.qHeavyHitters(spark, d).collect()
    assert(rows.length == 20)
    // both gate booleans must be TRUE everywhere — no-underestimate is
    // structural CMS, within-eps is the probabilistic bound at δ=0.01
    rows.foreach { r =>
      assert(r.getBoolean(2), s"CMS underestimated: $r")
      assert(r.getBoolean(3), s"CMS overshot eps bound: $r")
    }
    // descending exact counts (ties by token) — the ranking is exact,
    // only the estimate is sketched
    val ns = rows.map(_.getLong(1)).toSeq
    assert(ns == ns.sorted.reverse)
  }

  test("bloom dedup: soundness — every true cross-partition dup is flagged") {
    import org.apache.spark.sql.functions._
    val rows = TextQueries.qBloomDedup(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, seen, pm) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(seen >= 0L && seen <= n)
      assert(pm == 10000L * seen / n, s"permyriad drift: $r")
      assert(r.getBoolean(4) == (pm >= 5000L))
    }
    // a bloom filter NEVER false-negatives: any incoming shingle that
    // literally occurs in the reference partition must test as seen, so
    // per doc n_seen >= exact overlap count. Verify against the exact
    // shingle intersection computed independently.
    val srcNum = substring(col("source"), 4, 8).cast("int")
    val docs = Tables.documents(spark, d)
    val sh = TextQueries.shingleRows(docs.filter(srcNum >= 10))
      .toDF("doc_id", "s")
    val ref = TextQueries.shingleRows(docs.filter(srcNum < 10))
      .toDF("rid", "s").select(col("s")).distinct()
    val exact = sh.join(ref, "s").groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_exact")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val seenByDoc = rows.map(r => r.getLong(0) -> r.getLong(2)).toMap
    exact.foreach { case (id, nExact) =>
      assert(seenByDoc.getOrElse(id, 0L) >= nExact,
        s"bloom false-negative on doc $id: seen=${seenByDoc.get(id)} exact=$nExact")
    }
    // and the corpus carries real cross-partition duplication, so the
    // flag must fire somewhere — otherwise the fixture tests nothing
    assert(rows.exists(_.getBoolean(4)), "no doc flagged maybe_dup")
  }
}
