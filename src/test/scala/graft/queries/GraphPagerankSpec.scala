package graft.queries

import graft.lake.LakeSuite
import org.apache.spark.sql.functions._

/** Structural PageRank properties the 30-row oracle slice cannot see:
  * mass conservation over the FULL rank vector and the bipartite
  * degree structure. */
class GraphPagerankSpec extends LakeSuite {

  private val d = "/root/testdata/sf0.001"

  test("top-30 slice: decodable nodes, floor respected, ordered") {
    val rows = GraphQueries.qGraphPagerank(spark, d).collect()
    assert(rows.length == 30)
    rows.foreach { r =>
      assert(Set("cust", "supp").contains(r.getString(0)))
      assert(r.getLong(1) >= 0L)
      // every node's rank carries at least the teleport floor
      assert(r.getLong(2) >= 150000L, s"below teleport floor: $r")
    }
    val ranks = rows.map(_.getLong(2)).toSeq
    assert(ranks == ranks.sorted.reverse, "must be rank-descending")
    // a popular supplier/customer must concentrate above the uniform
    // start, or the iteration moved no mass at all
    assert(ranks.head > 1000000L, "no node rose above the uniform start")
  }

  test("full vector: integer mass conservation within truncation slack") {
    // rebuild the full rank vector the query truncates to 30 rows: with
    // damping in integers, sum(r_{t+1}) = 0.15·N·10⁶ + 0.85·sum(r_t) −
    // (truncation loss), loss < 1 per div per edge/node. Checking the
    // final mass against the closed form catches wrong degree joins
    // (mass leaks) that the top-30 slice can hide.
    val li = Tables.lineitem(spark, d).select(col("l_orderkey"), col("l_suppkey"))
    val ord = Tables.orders(spark, d).select(col("o_orderkey"), col("o_custkey"))
    val pairs = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("a"), (col("l_suppkey") * 2 + 1).as("b"))
      .distinct()
    val edges = pairs.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(pairs.select(col("b").as("src"), col("a").as("dst")))
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val e = edges.join(deg, "src")
    var ranks = deg.select(col("src").as("node"), lit(1000000L).as("rank"))
    val n = deg.count()
    var expected = BigDecimal(n) * 1000000
    for (_ <- 1 to 3) {
      ranks = e.join(ranks, e("src") === ranks("node"))
        .select(col("dst"), expr("rank div deg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("sc"))
        .select(col("dst").as("node"),
          expr("150000 + (850 * sc) div 1000").as("rank"))
      expected = BigDecimal(n) * 150000 + expected * 85 / 100
    }
    val mass = ranks.agg(sum(col("rank"))).collect()(0).getLong(0)
    val nEdges = edges.count()
    // each iteration loses < 1 per edge (rank div deg) + < 1 per node
    // (the ·850 div 1000 step); compounded through damping over 3
    // iterations the worst case is (1 + 0.85 + 0.7225)·(E+N) < 3·(E+N)
    val slack = BigDecimal(nEdges + n) * 3
    assert((expected - BigDecimal(mass)).abs <= slack,
      s"mass drifted: got $mass expected ~$expected (slack $slack)")
    assert(ranks.count() == n, "rank vector lost nodes across iterations")
  }
}
