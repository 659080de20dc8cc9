package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over `embeddings` (64-dim float vectors).
  *
  * Two paths, per the north-star contract:
  *  - [[qCosineTopkBrute]]: exact brute-force cosine top-k — the
  *    baseline/verifier. Query set is broadcast against the corpus, so
  *    at 100 TB this is one scan, no shuffle of the big side.
  *  - [[qAnnLsh]]: random-hyperplane LSH (16 planes → 16-bit signature
  *    buckets): candidates only where signatures collide on a band,
  *    then exact cosine re-rank — the sublinear scale path.
  *
  * Float-sum ordering differs across engines (FIXTURES.md), so these are
  * rows-only queries (no DuckDB oracle); [[qEmbeddingStats]] keeps to
  * exact-representable outputs and is oracled.
  */
object SimilarityQueries {
  import Tables._

  /** dot(a,b) with double accumulation in index order — HOF reference
    * formulation, kept for the native-vs-HOF equivalence test. */
  private[queries] def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  private[queries] def cosineHof(a: Column, b: Column): Column =
    dotHof(a, b) / (sqrt(dotHof(a, a)) * sqrt(dotHof(b, b)))

  /** Production path: native codegen expressions (one-pass loop inside
    * whole-stage codegen; HOFs are interpreted per element). */
  private def dot(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.dot_f(a, b)

  private def cosine(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.cosine_f(a, b)

  // test access to the HOF reference formulation
  def dotHofPublic(a: Column, b: Column): Column = dotHof(a, b)
  def cosineHofPublic(a: Column, b: Column): Column = cosineHof(a, b)

  private val nQueries = 5

  /** Exact cosine top-10 for the first 5 vec_ids against the corpus. */
  def qCosineTopkBrute(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val emb = embeddings(s, d)
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("vec_id"))
    emb.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(cosine(col("embedding"), col("q_vec")), 6).as("sim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 10)
      .select(col("q_id"), col("vec_id"), col("sim"), col("rn").cast("long").as("rn"))
      .orderBy(col("q_id"), col("rn"))
  }

  /** Deterministic random hyperplanes (seed 42), 64 × 64 — one 64-bit
    * signature per vector. */
  private lazy val planes: Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(64)(Seq.fill(64)(rnd.nextGaussian()))
  }

  private def signature(v: Column): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(dot(v, typedLit(p)) > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** LSH signature index per (session, corpus): the banded signature
    * table is an OFFLINE index artifact like the IVF inverted file —
    * 64 hyperplane dot products per vector belong to ingest, not to
    * every query invocation (measured ~2.5 s/invocation of pure
    * signature recompute at sf0.1). */
  private val lshIndexes = new SessionMemo[DataFrame]()

  /** Public setup hook for [[Corpus.prepare]]. */
  def prepareLshIndex(s: SparkSession, d: String): Unit = { ensureLshIndex(s, d); () }

  private def ensureLshIndex(s: SparkSession, d: String): DataFrame =
    lshIndexes.getOrBuild(s, d) {
      val idx = embeddings(s, d)
        .select(col("vec_id"), col("embedding"), signature(col("embedding")).as("sig"))
        .persist()
      idx.count() // materialize once at build
      idx
    }

  /** ANN via signature-bucket join + exact cosine re-rank (top-5). */
  def qAnnLsh(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val emb = ensureLshIndex(s, d)
    // 16 bands × 4 bits: for a top neighbor on RANDOM embeddings
    // (cosine ~0.35, the adversarial case — no cluster structure) a
    // 4-bit band collides with ~0.61^4 ≈ 14%; 16 bands lift that to
    // 1-(1-0.14)^16 ≈ 0.9 recall, which is what AnnRecallSpec pins
    // (the round-1 4-band config measured 0.32). Band count/width is
    // THE recall/cost knob: each band is one shuffle-key worth of
    // candidates, tuned at scale to the target similarity. */
    val banded = emb.select(col("vec_id"), col("embedding"),
      posexplode(array((0 until 16).map(b =>
        shiftright(col("sig"), b * 4).bitwiseAND(0xF)): _*))
        .as(Seq("band", "bucket")))
    val queries = banded.filter(col("vec_id") < nQueries)
      .select(col("band"), col("bucket"),
        col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("vec_id"))
    banded.join(broadcast(queries), Seq("band", "bucket"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(cosine(col("embedding"), col("q_vec")), 6).as("sim"))
      .distinct()
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("q_id"), col("vec_id"), col("sim"), col("rn").cast("long").as("rn"))
      .orderBy(col("q_id"), col("rn"))
  }

  /** IVF index per corpus dir, built at most once: (cell-assigned
    * corpus, centroid table). Training the coarse quantizer is OFFLINE
    * index construction at scale — a driver-coordinated multi-pass
    * KMeans must not run inside every query invocation (it did in
    * round 1: 2.8 s/invocation of pure retraining). The assignment
    * stays persisted across invocations by design: it is the inverted
    * file, not a per-query temp. */
  private val ivfIndexes = new SessionMemo[(DataFrame, DataFrame)]()

  /** Public setup hook for [[Corpus.prepare]]. */
  def prepareIvfIndex(s: SparkSession, d: String): Unit = { ensureIvfIndex(s, d); () }

  private def ensureIvfIndex(s: SparkSession, d: String): (DataFrame, DataFrame) =
    ivfIndexes.getOrBuild(s, d) {
      import org.apache.spark.ml.clustering.KMeans
      import org.apache.spark.ml.linalg.{Vector, Vectors}
      import s.implicits._
      val toVec = udf((a: Seq[Float]) => Vectors.dense(a.map(_.toDouble).toArray))
      val feat = embeddings(s, d)
        .withColumn("features", toVec(col("embedding"))).persist()
      val model = new KMeans().setK(16).setSeed(42L).setMaxIter(5)
        .setFeaturesCol("features").setPredictionCol("cell").fit(feat)
      val assigned = model.transform(feat)
        .select(col("vec_id"), col("embedding"), col("cell")).persist()
      assigned.count() // materialize, then drop the featurized temp
      feat.unpersist(blocking = false)
      // 16 centroids are model metadata (driver-side by construction)
      val cells = model.clusterCenters.zipWithIndex.toSeq
        .map { case (c: Vector, i: Int) => (i, c.toArray.toSeq) }
        .toDF("cell", "centroid")
      (assigned, cells)
    }

  /** IVF (inverted-file) ANN: seeded KMeans coarse quantizer (k=16),
    * nprobe=2 — each query searches only the 2 nearest centroid cells,
    * then exact cosine re-ranks (top-5). The other classic sublinear
    * path next to [[qAnnLsh]]; at scale the centroid set stays tiny and
    * broadcast while the corpus is scanned once to assign cells. */
  def qIvfAnn(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (assigned, cells) = ensureIvfIndex(s, d)
    val qs = assigned.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val wCell = Window.partitionBy(col("q_id"))
      .orderBy(col("cdist").desc, col("cell"))
    val probed = qs.crossJoin(broadcast(cells))
      .withColumn("cdist", cosine(col("q_vec"), col("centroid")))
      .withColumn("crn", row_number().over(wCell))
      // nprobe = 6 of 16 cells: on random embeddings the true top-5
      // spread across cells (no cluster structure to exploit), so few
      // probes miss them — nprobe=4 measured 0.52 recall@5 at sf0.01;
      // 6 clears the AnnRecallSpec 0.6 floor while still scanning
      // under 40% of the inverted file. On real (clustered) embeddings
      // the same recall needs far fewer probes.
      .filter(col("crn") <= 6)
      .select(col("q_id"), col("q_vec"), col("cell"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("vec_id"))
    probed.join(assigned, Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(cosine(col("embedding"), col("q_vec")), 6).as("sim"))
      .distinct()
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("q_id"), col("vec_id"), col("sim"), col("rn").cast("long").as("rn"))
      .orderBy(col("q_id"), col("rn"))
  }

  /** Embedding-cosine near-dup pairs (threshold 0.5): the dedup-family
    * member over vectors. TWO code paths behind an explicit size gate:
    *
    * EXACT (corpus fits one executor's broadcast budget — which the
    * DuckDB all-pairs oracle demands, and what sf0.01/sf0.1 run): one
    * corpus scan against a broadcast copy, codegen cosine, no shuffle.
    * Exact threshold-join on cosine has no lossless candidate filter on
    * uniform random vectors: an LSH-band draft (21×3-bit, ~99.6% recall
    * at t=0.5) turned out to pass ~94% of RANDOM pairs too (3-bit
    * collision ½³ per band × 21 bands), i.e. brute force plus an
    * array-carrying shuffle — strictly worse than brute force.
    *
    * BANDED (corpus above the broadcast budget, where `broadcast(b)`
    * itself dies before the n² does): the [[qAnnLsh]] signature bands
    * generate candidates through one shuffle per band, exact cosine
    * verifies each candidate — approximate recall by construction
    * (measured by [[qAnnRecall]]'s methodology, ~0.9 per-pair at this
    * band config), which is the trade every production near-dup at
    * 100 TB makes on unclustered vectors. */
  def qDedupEmbedding(s: SparkSession, d: String): DataFrame = {
    val t = 0.5
    if (corpusFitsBroadcast(s, d)) {
      val a = embeddings(s, d).select(col("vec_id").as("va"), col("embedding").as("ea"))
      val b = embeddings(s, d).select(col("vec_id").as("vb"), col("embedding").as("eb"))
      a.join(broadcast(b), col("va") < col("vb"))
        .select(col("va"), col("vb"), cosine(col("ea"), col("eb")).as("sim"))
        .filter(col("sim") >= t)
        .select(col("va"), col("vb"), round(col("sim"), 3).as("sim"))
        .orderBy(col("va"), col("vb"))
    } else {
      // the same ingest-time signature index qAnnLsh uses — the banded
      // branch only runs on the LARGEST corpora, exactly where per-query
      // signature recompute hurts most
      val emb = ensureLshIndex(s, d)
      val banded = emb.select(col("vec_id"), col("embedding"),
        posexplode(array((0 until 16).map(b =>
          shiftright(col("sig"), b * 4).bitwiseAND(0xF)): _*))
          .as(Seq("band", "bucket")))
      val l = banded.select(col("band"), col("bucket"),
        col("vec_id").as("va"), col("embedding").as("ea"))
      val r = banded.select(col("band"), col("bucket"),
        col("vec_id").as("vb"), col("embedding").as("eb"))
      l.join(r, Seq("band", "bucket"))
        .filter(col("va") < col("vb"))
        .select(col("va"), col("vb"), cosine(col("ea"), col("eb")).as("sim"))
        .filter(col("sim") >= t)
        .distinct()
        .select(col("va"), col("vb"), round(col("sim"), 3).as("sim"))
        .orderBy(col("va"), col("vb"))
    }
  }

  /** Size gate for [[qDedupEmbedding]]: does the embeddings corpus fit
    * an executor-broadcast budget? Decided from parquet bytes on disk
    * (free — no Spark job) times a 4x deserialization factor (float
    * arrays roughly quadruple from encoded parquet to JVM rows).
    *
    * Deliberately NOT `spark.sql.autoBroadcastJoinThreshold`: this gate
    * selects between the exact and the approximate ALGORITHM, i.e. it
    * changes query RESULTS, while that conf is a plan knob users set to
    * -1 just to disable automatic broadcast planning. The dedicated key
    * below (bytes) tunes the gate; the exact path's explicit
    * `broadcast()` hint works regardless of the auto threshold. */
  private def corpusFitsBroadcast(s: SparkSession, d: String): Boolean = {
    val path = new org.apache.hadoop.fs.Path(s"$d/embeddings.parquet")
    val fs = path.getFileSystem(s.sessionState.newHadoopConf())
    val onDisk = fs.getContentSummary(path).getLength
    val budget = s.conf.get("graft.embeddingDedup.broadcastBudget", (64L << 20).toString).toLong
    budget > 0 && onDisk * 4 <= budget
  }

  /** Recall@5 of each ANN path against the brute-force ground truth,
    * per query id. Deterministic integers (all sims are rounded with
    * vec_id tiebreaks), so AnnRecallSpec can assert a hard floor
    * (≥ 0.6 mean recall) instead of the quality living in a comment.
    * Engine-specific float ordering keeps it rows-only for DuckDB. */
  def qAnnRecall(s: SparkSession, d: String): DataFrame = {
    val truth = qCosineTopkBrute(s, d).filter(col("rn") <= 5)
      .select(col("q_id"), col("vec_id"))
    val qids = truth.select(col("q_id")).distinct()
    def hits(approx: DataFrame, method: String): DataFrame =
      qids.join(
        truth.join(approx.select(col("q_id"), col("vec_id")), Seq("q_id", "vec_id"), "left_semi")
          .groupBy(col("q_id")).agg(count(lit(1)).as("hits")),
        Seq("q_id"), "left_outer")
        .select(lit(method).as("method"), col("q_id"),
          coalesce(col("hits"), lit(0L)).as("hits_at_5"), lit(5L).as("k"))
    hits(qAnnLsh(s, d), "lsh").unionByName(hits(qIvfAnn(s, d), "ivf"))
      .orderBy(col("method"), col("q_id"))
  }

  /** Oracled embedding stats: exact-representable outputs only (counts,
    * single-element casts — no cross-engine float summation). */
  def qEmbeddingStats(s: SparkSession, d: String): DataFrame =
    embeddings(s, d)
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        countDistinct(col("vec_id")).as("n_ids"),
        min(element_at(col("embedding"), 1).cast("double")).as("min_e1"),
        max(element_at(col("embedding"), 1).cast("double")).as("max_e1"),
        min(size(col("embedding"))).cast("long").as("min_dim"),
        max(size(col("embedding"))).cast("long").as("max_dim"))
      .orderBy(col("label"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "cosine_topk_brute" -> qCosineTopkBrute,
    "ann_lsh" -> qAnnLsh,
    "ivf_ann" -> qIvfAnn,
    "ann_recall" -> qAnnRecall,
    "dedup_embedding" -> qDedupEmbedding,
    "embedding_stats" -> qEmbeddingStats,
  )

  val oracles: Map[String, String] = Map(
    // all-pairs ground truth: verifies the LSH candidate generation
    // actually reached every qualifying pair (nearest non-pair sits
    // ≥ 1e-3 from the threshold at every SF, so float noise can't flip
    // membership; sim at 3 dp is equally safe)
    "dedup_embedding" ->
      """SELECT a.vec_id AS va, b.vec_id AS vb,
        |  round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                               CAST(b.embedding AS DOUBLE[])), 3) AS sim
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                             CAST(b.embedding AS DOUBLE[])) >= 0.5
        |ORDER BY va, vb""".stripMargin,
    "embedding_stats" ->
      """SELECT label, count(*) AS n_vecs,
        |  count(DISTINCT vec_id) AS n_ids,
        |  min(CAST(embedding[1] AS DOUBLE)) AS min_e1,
        |  max(CAST(embedding[1] AS DOUBLE)) AS max_e1,
        |  CAST(min(len(embedding)) AS BIGINT) AS min_dim,
        |  CAST(max(len(embedding)) AS BIGINT) AS max_dim
        |FROM embeddings GROUP BY label ORDER BY label""".stripMargin,
  )
}
