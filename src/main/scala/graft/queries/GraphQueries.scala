package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative graph analytics over relations derived from the TPC-H-ish
  * star schema — the Pregel-shaped workload class (PageRank, label
  * propagation) expressed as Catalyst joins so AQE and partial
  * aggregation stay in play, complementing the one-shot connected
  * components in `dedup_clusters`.
  *
  * All arithmetic is INTEGER (ranks scaled ×10⁶, damping 0.85 as
  * `(850 · x) div 1000`, per-edge contribution `rank div deg`), so a
  * fixed iteration count produces bit-identical values in any engine —
  * the exact-oracle device the dedup/ANN families use, applied to
  * iterative computation. Floats would drift per-engine through
  * summation order; integers cannot.
  */
object GraphQueries {
  import Tables._

  /** 3-iteration PageRank over the undirected customer–supplier
    * bipartite graph (edge = "supplier supplied an order of this
    * customer", derived once from lineitem ⋈ orders, distinct).
    * Node encoding: customer c → 2c, supplier s → 2s+1, so the two key
    * spaces never collide and decode is `div/mod 2`.
    *
    * Scale shape: the edge list (+ per-source degree) is built ONCE,
    * persisted, and reused by every iteration — the invariant-dataset
    * pattern of Pregel/GraphX — so each iteration costs exactly one
    * src-keyed shuffle join (ranks are O(nodes), AQE-broadcastable when
    * the node set is small relative to edges) plus one dst-keyed
    * partial-aggregated rollup. Iteration count is fixed (3), so the
    * whole query is 3 shuffles deep regardless of data size; at 100 TB
    * the edge table would be bucketed by src so the per-iteration join
    * is shuffle-free on the edge side. No driver-side state: ranks
    * never leave the cluster. */
  /** Cached (edge, degree) table + the uniform start vector. The cache
    * is REPARTITIONED ON dst before persisting (round-16 scale fix):
    * every [[pagerankStep]] ends in a dst-keyed rollup, so a dst-
    * clustered cache satisfies the aggregation's distribution from the
    * cache scan itself — each iteration becomes broadcast-join + local
    * hash aggregate with ZERO exchanges, where the unpartitioned cache
    * paid a full O(edges) partial-agg shuffle per iteration (the
    * dominant sf10 stage: ~1.4 GB shuffled per step, 3×). One upfront
    * shuffle amortizes over all iterations — the DataFrame spelling of
    * GraphX's partitioned edge RDD. */
  private[queries] def edgeTable(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    // persisted and MATERIALIZED here: edges and deg below each read it
    // twice, and racing cache-miss scans inside one job re-derived the
    // join+distinct up to 3× at sf10 before the eager count
    val pairs = QueryCaches.track(
      lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
        .join(orders(s, d).select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select((col("o_custkey") * 2).as("a"), (col("l_suppkey") * 2 + 1).as("b"))
        .distinct()
        .persist())
    pairs.count()
    val edges = pairs.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(pairs.select(col("b").as("src"), col("a").as("dst")))
    // deg rides the O(nodes) BROADCAST side (joined onto the rank
    // vector per step), NOT the edge cache: joining it onto edges cost
    // a full O(edges) sort-merge join in the build (the second-largest
    // sf10 stage) for a column the step can pick up for free
    val deg = QueryCaches.track(edges.groupBy(col("src"))
      .agg(count(lit(1)).as("deg"))
      .select(col("src").as("node"), col("deg")).persist())
    val e = QueryCaches.track(edges.repartition(col("dst")).persist())
    (e, deg)
  }

  /** The step input: the rank vector with each node's static degree
    * attached — an O(nodes) broadcast join, never touching edges. */
  private[queries] def withDeg(ranks: DataFrame, deg: DataFrame): DataFrame =
    ranks.join(broadcast(deg), "node")

  /** One PageRank step. The rank vector is O(nodes) ≪ O(edges):
    * broadcast it so the cached edge table never shuffles — a map-side
    * join + one partial-aggregated dst rollup. (At node counts past
    * the broadcast budget the hint comes off and the same plan runs as
    * a bucketed src-keyed shuffle join.) */
  private[queries] def pagerankStep(e: DataFrame, ranks: DataFrame): DataFrame =
    e.join(broadcast(ranks), e("src") === ranks("node"))
      .select(col("dst"), expr("rank div deg").as("c"))
      .groupBy(col("dst")).agg(sum(col("c")).as("sc"))
      .select(col("dst").as("node"),
        expr("150000 + (850 * sc) div 1000").as("rank"))

  def qGraphPagerank(s: SparkSession, d: String): DataFrame = {
    val (e, deg) = edgeTable(s, d)
    var ranks = deg.select(col("node"), lit(1000000L).as("rank"))
    for (_ <- 1 to 3) {
      // materialize each step's O(nodes) vector and CUT its lineage:
      // without this, step N+1 is a self-join against a plan containing
      // `e`, whose deduplicated re-instancing misses the cache and
      // re-runs the whole edge build once per step (observed: 6
      // SortMergeJoins in the final plan; with the cut: zero) — the
      // standard iterative-algorithm checkpoint, same role as GraphX's
      // per-iteration checkpointing
      ranks = pagerankStep(e, withDeg(ranks, deg)).localCheckpoint()
    }
    ranks.select(
        when(col("node") % 2 === 0, lit("cust")).otherwise(lit("supp")).as("node_type"),
        expr("node div 2").as("key"), col("rank"))
      .orderBy(col("rank").desc, col("node_type"), col("key"))
      .limit(30)
  }

  /** TextRank keyword extraction (Mihalcea & Tarau 2004) — the
    * graph-based counterpart to the tf-idf keyword battery: PageRank
    * over the ADJACENT-WORD co-occurrence graph (undirected, distinct
    * edges, normalized `least/greatest` so a bigram and its mirror
    * are one edge), 3 fixed integer iterations via the SAME
    * [[pagerankStep]] the customer–supplier query runs — cached edge
    * table, broadcast O(vocabulary) rank vector, per-step lineage
    * cuts — so the whole iterative machinery (and its plan-shape spec
    * guarantees) is shared, not twinned. Output: top-25 words by rank.
    * Scale shape: vocabulary-bounded everywhere after the one bigram
    * pass — the rank vector and degree table are O(vocab), never
    * O(corpus). */
  /** The distinct undirected adjacent-word co-occurrence pairs
    * (a &lt; b), shared by TextRank and the triangle counter: one
    * bigram pass, `least/greatest`-normalized, cached. */
  private def wordPairs(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.spread(documents(s, d))
      .select(split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= 2)
    val bg = docs.select(explode(expr(
        "transform(sequence(0, size(ws)-2), i -> struct(ws[i] AS w1, ws[i+1] AS w2))")).as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
      .filter(col("w1") =!= col("w2"))
    QueryCaches.track(bg
      .select(least(col("w1"), col("w2")).as("a"),
        greatest(col("w1"), col("w2")).as("b"))
      .distinct().persist())
  }

  /** Triangle counting (round 13) over the word co-occurrence graph —
    * the clustering-structure metric (and the core of clustering-
    * coefficient / community detection) — via the COMPACT-FORWARD
    * orientation (Latapy 2008): orient every undirected edge from its
    * (degree, node)-smaller endpoint to the larger, making the graph
    * a DAG in which each triangle has exactly ONE vertex with two
    * out-edges; wedges join out-edges at that vertex and close
    * against the normalized pair set with ONE equi-join (no OR-join,
    * no nested loop). The orientation is THE scale device: wedge
    * fan-out is bounded by oriented out-degree ≤ O(√m) even when a
    * hub word touches everything — an unoriented wedge join would be
    * quadratic in the hub degree. Output: top-15 words by triangle
    * participation (each triangle credits its three corners). */
  def qGraphTriangles(s: SparkSession, d: String): DataFrame = {
    val pairs = wordPairs(s, d)
    val deg = pairs.select(col("a").as("n")).unionByName(
        pairs.select(col("b").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("dg"))
    val ori = QueryCaches.track(pairs
      .join(deg.select(col("n").as("a"), col("dg").as("da")), "a")
      .join(deg.select(col("n").as("b"), col("dg").as("db")), "b")
      .select(
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")), col("a"))
          .otherwise(col("b")).as("u"),
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")), col("b"))
          .otherwise(col("a")).as("v"))
      .persist())
    val wedges = ori.select(col("u"), col("v").as("x"))
      .join(ori.select(col("u"), col("v").as("y")), "u")
      .filter(col("x") < col("y"))
    val tris = wedges.join(pairs,
      col("x") === col("a") && col("y") === col("b"))
      .select(col("u"), col("x"), col("y"))
    tris.select(explode(array(col("u"), col("x"), col("y"))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("n_triangles"))
      .orderBy(col("n_triangles").desc, col("word"))
      .limit(15)
  }

  def qTextrankKeywords(s: SparkSession, d: String): DataFrame = {
    val pairs = wordPairs(s, d)
    val edges = pairs.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(pairs.select(col("b").as("src"), col("a").as("dst")))
    // dst-clustered edge cache + deg on the broadcast side, the same
    // exchange-free iteration shape as the customer–supplier query
    val deg = QueryCaches.track(edges.groupBy(col("src"))
      .agg(count(lit(1)).as("deg"))
      .select(col("src").as("node"), col("deg")).persist())
    val e = QueryCaches.track(edges.repartition(col("dst")).persist())
    var ranks = deg.select(col("node"), lit(1000000L).as("rank"))
    for (_ <- 1 to 3)
      ranks = pagerankStep(e, withDeg(ranks, deg)).localCheckpoint()
    ranks.select(col("node").as("word"), col("rank"))
      .orderBy(col("rank").desc, col("word"))
      .limit(25)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_pagerank" -> qGraphPagerank,
    "textrank_keywords" -> qTextrankKeywords,
    "graph_triangles" -> qGraphTriangles,
  )

  val oracles: Map[String, String] = Map(
    // the same 3 unrolled integer iterations — DuckDB reconstructs every
    // rank exactly (sum/div over BIGINT; HUGEINT sums cast back down)
    "graph_pagerank" ->
      """WITH pairs AS (
        |  SELECT DISTINCT o.o_custkey * 2 AS a, l.l_suppkey * 2 + 1 AS b
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |edges AS (SELECT a AS src, b AS dst FROM pairs
        |          UNION ALL SELECT b, a FROM pairs),
        |deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
        |e AS (SELECT edges.src, edges.dst, deg.deg
        |      FROM edges JOIN deg USING (src)),
        |r0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS rank FROM deg),
        |r1 AS (SELECT e.dst AS node,
        |         CAST(150000 + (850 * sum(r.rank // e.deg)) // 1000 AS BIGINT) AS rank
        |       FROM e JOIN r0 r ON r.node = e.src GROUP BY e.dst),
        |r2 AS (SELECT e.dst AS node,
        |         CAST(150000 + (850 * sum(r.rank // e.deg)) // 1000 AS BIGINT) AS rank
        |       FROM e JOIN r1 r ON r.node = e.src GROUP BY e.dst),
        |r3 AS (SELECT e.dst AS node,
        |         CAST(150000 + (850 * sum(r.rank // e.deg)) // 1000 AS BIGINT) AS rank
        |       FROM e JOIN r2 r ON r.node = e.src GROUP BY e.dst)
        |SELECT CASE WHEN node % 2 = 0 THEN 'cust' ELSE 'supp' END AS node_type,
        |  node // 2 AS key, rank
        |FROM r3 ORDER BY rank DESC, node_type, key LIMIT 30""".stripMargin,
    // compact-forward replayed relationally: same orientation rule,
    // same single closure equi-join
    "graph_triangles" ->
      """WITH bgr AS (
        |  SELECT ws[i] AS w1, ws[i+1] AS w2
        |  FROM (SELECT string_split(text, ' ') AS ws FROM documents
        |        WHERE len(string_split(text, ' ')) >= 2) t,
        |       LATERAL (SELECT unnest(generate_series(1, len(ws) - 1)) AS i) g
        |  WHERE ws[i] <> ws[i+1]),
        |pairs AS (SELECT DISTINCT least(w1, w2) AS a, greatest(w1, w2) AS b
        |          FROM bgr),
        |deg AS (SELECT n, count(*) AS dg FROM (
        |          SELECT a AS n FROM pairs UNION ALL SELECT b FROM pairs)
        |        GROUP BY n),
        |ori AS (SELECT
        |    CASE WHEN da.dg < db.dg OR (da.dg = db.dg AND a < b)
        |         THEN a ELSE b END AS u,
        |    CASE WHEN da.dg < db.dg OR (da.dg = db.dg AND a < b)
        |         THEN b ELSE a END AS v
        |  FROM pairs JOIN deg da ON da.n = a JOIN deg db ON db.n = b),
        |tris AS (
        |  SELECT e1.u AS u, e1.v AS x, e2.v AS y
        |  FROM ori e1 JOIN ori e2 ON e2.u = e1.u AND e1.v < e2.v
        |  JOIN pairs p ON p.a = e1.v AND p.b = e2.v)
        |SELECT word, count(*) AS n_triangles
        |FROM (SELECT u AS word FROM tris
        |      UNION ALL SELECT x FROM tris
        |      UNION ALL SELECT y FROM tris)
        |GROUP BY word ORDER BY n_triangles DESC, word LIMIT 15""".stripMargin,
    // identical 3-iteration integer unroll over the adjacent-word graph
    "textrank_keywords" ->
      """WITH bgr AS (
        |  SELECT ws[i] AS w1, ws[i+1] AS w2
        |  FROM (SELECT string_split(text, ' ') AS ws FROM documents
        |        WHERE len(string_split(text, ' ')) >= 2) t,
        |       LATERAL (SELECT unnest(generate_series(1, len(ws) - 1)) AS i) g
        |  WHERE ws[i] <> ws[i+1]),
        |pairs AS (SELECT DISTINCT least(w1, w2) AS a, greatest(w1, w2) AS b
        |          FROM bgr),
        |edges AS (SELECT a AS src, b AS dst FROM pairs
        |          UNION ALL SELECT b, a FROM pairs),
        |deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
        |e AS (SELECT edges.src, edges.dst, deg.deg
        |      FROM edges JOIN deg USING (src)),
        |r0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS rank FROM deg),
        |r1 AS (SELECT e.dst AS node,
        |         CAST(150000 + (850 * sum(r.rank // e.deg)) // 1000 AS BIGINT) AS rank
        |       FROM e JOIN r0 r ON r.node = e.src GROUP BY e.dst),
        |r2 AS (SELECT e.dst AS node,
        |         CAST(150000 + (850 * sum(r.rank // e.deg)) // 1000 AS BIGINT) AS rank
        |       FROM e JOIN r1 r ON r.node = e.src GROUP BY e.dst),
        |r3 AS (SELECT e.dst AS node,
        |         CAST(150000 + (850 * sum(r.rank // e.deg)) // 1000 AS BIGINT) AS rank
        |       FROM e JOIN r2 r ON r.node = e.src GROUP BY e.dst)
        |SELECT node AS word, rank
        |FROM r3 ORDER BY rank DESC, word LIMIT 25""".stripMargin,
  )
}
