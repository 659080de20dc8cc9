package graft.queries

import graft.lake.LakeSuite

/** Physical-plan shape pins for the round-12 final-session operators —
  * the properties that make them survive 100×, which value-level
  * oracles cannot see. A plan regression (lost broadcast, surprise
  * sort-merge or cartesian join) fails here before it shows up as a
  * bench cliff. */
class NewOpPlanShapeSpec extends LakeSuite {

  private val d = "/root/testdata/sf0.001"

  /** Final AQE plan of the dataframe's OWN execution: `collect()`
    * forces df.queryExecution (a `write` would plan a separate
    * QueryExecution), and caches clear only AFTER the string is read —
    * clearing first would re-plan without the InMemoryRelation
    * segments the query's scale shape depends on. */
  private def planOf(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    QueryCaches.clear()
    s
  }

  test("pagerank iterations broadcast the rank vector — edges never shuffle-join") {
    // the full query's final plan is a checkpoint scan (the iterations
    // ran eagerly behind lineage cuts), so pin the shape of one STEP
    // against a materialized edge cache — the plan every iteration runs
    val (e, deg) = GraphQueries.edgeTable(spark, d)
    e.count() // populate the cache, as iteration 1 would
    val ranks0 = deg.select(org.apache.spark.sql.functions.col("node"),
      org.apache.spark.sql.functions.lit(1000000L).as("rank"))
    val plan = planOf(GraphQueries.pagerankStep(e,
      GraphQueries.withDeg(ranks0.localCheckpoint(), deg)))
    // the cached-relation node dumps its own build plan (including the
    // discarded "Initial Plan" with pre-AQE join placeholders) — the
    // step's OWN operators are everything above it
    val step = plan.split("InMemoryRelation").head
    assert(step.contains("BroadcastHashJoin"), "rank join must broadcast:\n" + plan)
    assert(!step.contains("SortMergeJoin"),
      "the step degenerated to a sort-merge join:\n" + plan)
    assert(plan.contains("InMemoryTableScan") || plan.contains("TableCacheQueryStage"),
      "the edge table must come from cache:\n" + plan)
    // round-16 scale fix: the cache is dst-clustered, so the step's own
    // operators contain NO shuffle at all — the dst rollup aggregates
    // in place off the cache scan (an Exchange here re-introduces the
    // per-iteration O(edges) shuffle that dominated the sf10 probe).
    // The broadcast exchange of the O(nodes) rank vector is the one
    // allowed data movement.
    val nonBroadcastExchanges = step.linesIterator.filter(l =>
      l.contains("Exchange") && !l.contains("BroadcastExchange")
        && !l.contains("BroadcastQueryStage")).toSeq
    assert(nonBroadcastExchanges.isEmpty,
      s"iteration step must be exchange-free above the cache, found " +
        s"$nonBroadcastExchanges in:\n" + plan)
  }

  test("bloom dedup incoming side joins nothing — membership is a local bit test") {
    val plan = planOf(TextQueries.qBloomDedup(spark, d))
    assert(!plan.contains("Join"),
      "bloom membership must not join the reference corpus:\n" + plan)
  }

  test("funnel step joins stay broadcast at dimension-sized step tables") {
    val plan = planOf(EventQueries.qEvFunnel(spark, d))
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("resample+ffill generates the spine row-parallel (no corpus re-join for the grid)") {
    val plan = planOf(EventQueries.qEvResampleFfill(spark, d))
    assert(plan.contains("Generate"), "sequence explode must be a Generate")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      "the spine must not cross-join a calendar table:\n" + plan)
  }

  test("kmeans assignment passes are join-free — centroids travel via driver literals") {
    val plan = planOf(SimilarityQueries.qKmeansTrain(spark, d))
    // the final assignment (the plan we capture) must be a map pass
    // over the cached corpus + one hash aggregate: any Join means the
    // centroid table leaked into the plan as a relation
    val step = plan.split("InMemoryRelation").head
    assert(!step.contains("Join"),
      "kmeans assignment must not join a centroid relation:\n" + plan)
    assert(step.contains("HashAggregate"), plan)
  }

  test("large orders: the basket sliver broadcasts twice — no fact table shuffles") {
    val plan = planOf(CoreQueries.qLargeOrders(spark, d))
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      "a fact table shuffled against the >300 sliver:\n" + plan)
  }

  test("pq encode: codebook joins by broadcast; one rollup picks all 8 argmins") {
    val plan = planOf(SimilarityQueries.qPqEncode(spark, d))
    assert(plan.contains("BroadcastHashJoin"),
      "codebook must broadcast:\n" + plan)
    assert(!plan.contains("SortMergeJoin"),
      "the 128-row codebook degenerated to a shuffle join:\n" + plan)
    // exactly one data shuffle: the vec_id rollup (the conditional-min
    // design exists to avoid a second (vec_id, m)-keyed shuffle). Count
    // hash-partition exchanges in the FINAL plan only — the AQE dump
    // repeats the pre-AQE tree under "Initial Plan", and the output
    // sort's range partition / the codebook broadcast are not rollup
    // shuffles.
    val finalPlan = plan.split("== Initial Plan ==").head
    val n = "Exchange hashpartitioning".r.findAllIn(finalPlan).size
    assert(n == 1, s"pq encode plans $n hash exchanges (want 1):\n" + plan)
  }

  test("ctfidf/mmr: the only nested-loop joins are 1-row broadcast scalars") {
    // scalar crossJoins (n_cells, query vector) are fine; a real
    // cartesian over data tables is not
    Seq(SimilarityQueries.qCtfidfTopics(spark, d),
        SimilarityQueries.qMmrDiversify(spark, d)).foreach { df =>
      val plan = planOf(df)
      assert(!plan.contains("CartesianProduct"),
        "data-sized cartesian product appeared:\n" + plan)
    }
  }

  test("row-lineage read attaches the id base without ANY join (round 14)") {
    // the lake_row_lineage scenario's final read: the O(planned files)
    // firstRowId base rides as a map-literal element_at per row — no
    // join at all (the first cut broadcast-joined on a regexp-
    // normalized path and cost CoW scenarios ~1.6-2×), so a join of
    // any kind here is a regression
    val plan = planOf(LakeQueries.lakeRowLineage(spark, d))
    assert(!plan.contains("Join"),
      "the lineage read must not join for the id base:\n" + plan)
  }

  test("ANN hard negatives: probed queries broadcast into the inverted file (round 15)") {
    // the candidate join is (queries × nprobe) rows against the cell-
    // partitioned inverted file: the tiny probed side must broadcast
    // (a shuffle or cartesian here scans the corpus per query at 100×),
    // and the inverted file must come from the ingest-time cache, not
    // a fresh corpus scan per invocation
    val plan = planOf(SimilarityQueries.qHardNegativesAnn(spark, d))
    assert(!plan.contains("CartesianProduct"),
      "ANN candidates degenerated to a cartesian product:\n" + plan)
    assert(plan.contains("BroadcastHashJoin"),
      "the probed-cells join must broadcast:\n" + plan)
    assert(plan.contains("InMemoryTableScan") ||
      plan.contains("TableCacheQueryStage"),
      "the inverted file must come from cache:\n" + plan)
  }
}
