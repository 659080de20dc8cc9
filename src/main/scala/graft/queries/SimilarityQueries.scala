package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over `embeddings` (64-dim unit-normalized float
  * vectors).
  *
  * Three retrieval paths, per the north-star contract:
  *  - [[qCosineTopkBrute]]: exact brute-force top-k — the baseline /
  *    ground truth. Query set is broadcast against the corpus, so at
  *    100 TB this is one scan, no shuffle of the big side.
  *  - [[qAnnLsh]]: hyperplane LSH (64 planes → 16 bands of 4 bits):
  *    candidates only where signatures collide on a band, then exact
  *    re-rank — the sublinear scale path.
  *  - [[qIvfAnn]]: inverted-file ANN — coarse quantizer cells, each
  *    query probes only its nearest cells. Default quantizer is
  *    hash-sampled medoids (engine-independent, fully oracled); a
  *    seeded-KMeans quantizer stays available via conf.
  *
  * Round 11: the top-k family is FULLY ORACLED. Float cosine ordering
  * is engine-private (summation order), so ranking moved to an exact
  * integer surrogate: components quantize as ⌊x·2¹⁵⌋ (exact in IEEE
  * doubles — see [[graft.functions.QuantizedDotF]]), and each
  * candidate scores
  *
  *   score = sign(dot) · ⌊dot² · 2²⁰ / n_c⌋      (n_c = Σq_c², corpus side)
  *
  * which is monotone in cosine per query (cos² = dot²/(n_q·n_c) and n_q
  * is constant inside a query's ranking partition), computed entirely in
  * BIGINT via the decomposition a₁·2²⁰ + (a₀·2²⁰) div n with
  * a₁ = dot² div n, a₀ = dot² mod n — every intermediate provably
  * < 2⁶³ by Cauchy–Schwarz. DuckDB reconstructs the identical integers,
  * so `cosine_topk_brute`, `ann_lsh` and `ann_recall` carry full
  * hash-match oracles. Quantization perturbs cosine by ≲ 2·10⁻⁴ —
  * far inside the LSH approximation the ANN paths already accept.
  * LSH hyperplanes are ±1 (Rademacher) with signs drawn from MD5
  * parity (`md5_number_lower('hp-i-j') % 2`, RFC 1321) so the oracle
  * regenerates the exact plane matrix; Rademacher projections carry the
  * same LSH guarantee as Gaussian ones (Achlioptas 2003).
  * `ivf_ann`/`ivf_recall` joined the oracled set in the round-11 third
  * wave: the default coarse quantizer is now K hash-sampled MEDOIDS
  * (seed rank = md5_lower('ivf-'||vec_id) mod 2³¹−1, the MinHash
  * oracle's seed family) with cell assignment by the same exact
  * integer score against the medoid's self-norm — the whole inverted
  * file reconstructs in DuckDB SQL. Lloyd-free sampling is also the
  * CHEAPER index build at 100 TB (no iterative passes over the corpus,
  * just a top-K hash scan plus one assignment map); FAISS-style KMeans
  * training remains available (`graft.ivf.quantizer=kmeans`, rows-only
  * by nature) and AnnRecallSpec pins the same recall floor on both.
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
  private def cosine(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.cosine_f(a, b)

  private def qdot(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.qdot_f(a, b)

  // test access to the HOF reference formulation
  def dotHofPublic(a: Column, b: Column): Column = dotHof(a, b)
  def cosineHofPublic(a: Column, b: Column): Column = cosineHof(a, b)

  private val nQueries = 5
  private val QScale = graft.functions.QuantizedDotF.Scale // 2^15
  private val ScoreShift = 1048576L // 2^20

  /** The exact-integer ranking score over named columns `dot`, `nv` —
    * ONE formula rendered for both engines so the constants can never
    * drift. All operands are non-negative at every div/mod, so Spark's
    * truncating `div` and DuckDB's flooring `//` agree. */
  private def scoreSqlSparkOn(dot: String, nv: String): String =
    s"CASE WHEN $nv = 0L THEN 0L ELSE (CASE WHEN $dot < 0L THEN -1L ELSE 1L END) * " +
      s"((($dot * $dot) div $nv) * ${ScoreShift}L + ((($dot * $dot) % $nv) * ${ScoreShift}L) div $nv) END"

  private def scoreSqlDuckOn(dot: String, nv: String): String =
    s"CASE WHEN $nv = 0 THEN 0 ELSE (CASE WHEN $dot < 0 THEN -1 ELSE 1 END) * " +
      s"((($dot * $dot) // $nv) * $ScoreShift + ((($dot * $dot) % $nv) * $ScoreShift) // $nv) END"

  private def scoreSqlSpark: String = scoreSqlSparkOn("dot", "nv")

  private def scoreSqlDuck: String = scoreSqlDuckOn("dot", "nv")

  private def scoreCol: Column = expr(scoreSqlSpark)

  /** Exact top-10 by (quantized) cosine for the first 5 vec_ids against
    * the corpus. One corpus scan vs a broadcast query set; the self-norm
    * rides in the same codegen stage as the cross dot. */
  def qCosineTopkBrute(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // the probe side is an unsplittable one-task scan doing the whole
    // O(corpus x queries) integer-dot work — spread it (guide §2.5);
    // qdot is per-pair exact, so partitioning cannot move a result
    val emb = Tables.spread(embeddings(s, d))
      .select(col("vec_id"), col("embedding"),
        qdot(col("embedding"), col("embedding")).as("nv"))
    val queries = embeddings(s, d).filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("vec_id"))
    emb.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        qdot(col("embedding"), col("q_vec")).as("dot"), col("nv"))
      .withColumn("score", scoreCol)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 10)
      .select(col("q_id"), col("vec_id"), col("score"), col("rn").cast("long").as("rn"))
      .orderBy(col("q_id"), col("rn"))
  }

  /** Hard-negative mining (round 14) — the contrastive-training feed:
    * for each query vector, the top-3 most similar vectors with a
    * DIFFERENT label ("close but wrong" — the negatives that actually
    * move an embedding model, vs easy random negatives). Same brute
    * exact-integer scorer as [[qCosineTopkBrute]] plus the label
    * anti-predicate, which rides INSIDE the scan filter so excluded
    * same-label vectors never reach the ranking window. 100-TB shape:
    * swap the brute scan for the IVF/PQ candidate path (the label
    * filter moves onto the re-rank) — the scorer, window, and output
    * contract are unchanged. */
  def qHardNegatives(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val emb = Tables.spread(embeddings(s, d))
      .select(col("vec_id"), col("embedding"), col("label"),
        qdot(col("embedding"), col("embedding")).as("nv"))
    val queries = embeddings(s, d).filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"),
        col("label").as("q_label"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("vec_id"))
    emb.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("q_id") && col("label") =!= col("q_label"))
      .select(col("q_id"), col("vec_id"), col("label"),
        qdot(col("embedding"), col("q_vec")).as("dot"), col("nv"))
      .withColumn("score", scoreCol)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("q_id"), col("vec_id"), col("label").cast("long").as("label"),
        col("score"), col("rn").cast("long").as("rn"))
      .orderBy(col("q_id"), col("rn"))
  }

  /** Hard-negative mining, ANN path (round 15) — the 100-TB shape the
    * brute query's scaladoc promises: the IVF candidate generator
    * ([[ivfProbe]] + the label-carrying inverted file) replaces the
    * corpus × queries cross product, and the label anti-predicate
    * moves onto the candidate re-rank — it CANNOT ride the probe,
    * because cells are label-blind. Scorer, window, and output
    * contract are identical to [[qHardNegatives]]; recall vs that
    * exact query is measured by [[qHardNegativesRecall]] and floored
    * in AnnRecallSpec (the ann_recall/pq_recall precedent).
    * Scale shape: each query scans ~nprobe/K of the inverted file;
    * the label filter prunes candidates in the same stage that scores
    * them (no corpus-sized label join — the label lives in the index). */
  def qHardNegativesAnn(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val index = ensureIvfIndex(s, d)
    val probed = ivfProbe(index,
      embeddings(s, d).filter(col("vec_id") < nQueries)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"),
          col("label").as("q_label")),
      extras = Seq("q_label"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("vec_id"))
    probed.join(index.assigned, Seq("cell"))
      .filter(col("vec_id") =!= col("q_id") && col("label") =!= col("q_label"))
      .select(col("q_id"), col("vec_id"), col("label"),
        qdot(col("embedding"), col("q_vec")).as("dot"), col("nv"))
      .withColumn("score", scoreCol)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("q_id"), col("vec_id"), col("label").cast("long").as("label"),
        col("score"), col("rn").cast("long").as("rn"))
      .orderBy(col("q_id"), col("rn"))
  }

  /** Recall@3 of the ANN hard-negative path against the brute one —
    * fully oracled (both sides reconstruct in DuckDB SQL), so the
    * quality of the IVF swap-in is a measured number, not a claim. */
  def qHardNegativesRecall(s: SparkSession, d: String): DataFrame = {
    val truth = qHardNegatives(s, d).select(col("q_id"), col("vec_id"))
    val approx = qHardNegativesAnn(s, d).select(col("q_id"), col("vec_id"))
    val qids = truth.select(col("q_id")).distinct()
    qids.join(
      truth.join(approx, Seq("q_id", "vec_id"), "left_semi")
        .groupBy(col("q_id")).agg(count(lit(1)).as("hits")),
      Seq("q_id"), "left_outer")
      .select(lit("hard_neg_ivf").as("method"), col("q_id"),
        coalesce(col("hits"), lit(0L)).as("hits_at_3"), lit(3L).as("k"))
      .orderBy(col("q_id"))
  }

  /** Embedding-drift monitor (round 14) — the data-quality check an
    * embedding pipeline runs when a model or corpus slice changes: per
    * label, the centroid L1 distance between the even- and odd-vec_id
    * halves, in EXACT quantized units. The mean difference per
    * dimension is (S1j/n1 − S2j/n2); scaling by n1·n2 keeps it integer:
    * drift_q = Σ_j |n2·S1j − n1·S2j| div (n1·n2) over floor(x·2¹⁵)
    * quantized components (|n·S| ≤ 2.3e9 at sf0.1 — long-safe, and abs
    * makes the truncating div flooring, so both engines agree). A drift
    * far above its label's peers flags a slice whose two halves came
    * from different distributions. Scale shape: one posexplode to
    * (label, half, dim) — 64 rows per vector — then two rollups and a
    * |labels|·64-row join; nothing is ever pairwise. */
  def qEmbeddingDrift(s: SparkSession, d: String): DataFrame = {
    val qe = embeddings(s, d).select(col("label").cast("long").as("label"),
      (col("vec_id") % 2).as("half"),
      expr(s"transform(embedding, x -> CAST(floor(x * $QScale) AS LONG))")
        .as("qv"))
    val ex = qe.select(col("label"), col("half"),
      posexplode(col("qv")).as(Seq("j", "q")))
    val sums = ex.groupBy(col("label"), col("half"), col("j"))
      .agg(sum(col("q")).as("sj"))
    val ns = qe.groupBy(col("label"), col("half"))
      .agg(count(lit(1)).as("n"))
    val wide = sums.join(ns, Seq("label", "half"))
      .groupBy(col("label"), col("j"))
      .agg(sum(when(col("half") === 0, col("sj"))).as("s0"),
        sum(when(col("half") === 1, col("sj"))).as("s1"),
        sum(when(col("half") === 0, col("n"))).as("n0"),
        sum(when(col("half") === 1, col("n"))).as("n1"))
    wide.groupBy(col("label"))
      .agg(max(col("n0")).as("n_even"), max(col("n1")).as("n_odd"),
        sum(expr("abs(n1 * s0 - n0 * s1) div (n0 * n1)")).as("drift_q"))
      .orderBy(col("label"))
  }

  /** 64 ±1 hyperplanes, sign(i,j) from MD5 parity of "hp-i-j" — the
    * engine-independent seed convention shared with the MinHash oracle.
    * sign(⌊±1·2¹⁵⌋·Σ±q_j) = sign(Σ±s_j·q_j), so [[qdot]] against the
    * ±1.0 literal array gives exactly the oracle's signed integer sum. */
  private lazy val planeSigns: IndexedSeq[Seq[Double]] =
    (0 until 64).map(i => (0 until 64).map(j =>
      if ((TextQueries.md5LowerOf(s"hp-$i-$j") & 1L) == 0L) 1.0 else -1.0))

  /** 16 band buckets (4 signature bits each), computed directly — no
    * monolithic 64-bit signature, so bit 63 never meets BIGINT sign. */
  private def bucketCols: Seq[Column] = (0 until 16).map { b =>
    (0 until 4).map { k =>
      when(qdot(col("embedding"), typedLit(planeSigns(b * 4 + k))) > 0,
        lit(1 << k)).otherwise(lit(0))
    }.reduce(_ + _).cast("long")
  }

  /** LSH signature index per (session, corpus): the banded signature
    * table is an OFFLINE index artifact like the IVF inverted file —
    * 64 hyperplane projections per vector belong to ingest, not to
    * every query invocation (measured ~2.5 s/invocation of pure
    * signature recompute at sf0.1). Carries the quantized self-norm so
    * re-rank scoring reads it for free. */
  private val lshIndexes = new SessionMemo[DataFrame]()

  /** Public setup hook for [[Corpus.prepare]]. */
  def prepareLshIndex(s: SparkSession, d: String): Unit = { ensureLshIndex(s, d); () }

  private[queries] val lshBuilds = new java.util.concurrent.atomic.AtomicInteger

  /** Session-memoized + cross-session persisted (the IVF reattach
    * contract — see [[ensureIvfIndex]]). */
  private def ensureLshIndex(s: SparkSession, d: String): DataFrame =
    lshIndexes.getOrBuild(s, d) {
      IndexStore.load(s, d, "lsh", Seq("embeddings"), "lsh-v1",
          Seq("index")) match {
        case Some((loaded, _)) =>
          val idx = loaded("index").persist(); idx.count(); idx
        case None =>
          lshBuilds.incrementAndGet()
          val idx = embeddings(s, d)
            .select(col("vec_id"), col("embedding"),
              qdot(col("embedding"), col("embedding")).as("nv"),
              array(bucketCols: _*).as("buckets"))
            .persist()
          idx.count() // materialize once at build
          IndexStore.save(s, d, "lsh", Seq("embeddings"), "lsh-v1",
            Map("index" -> idx))
          idx
      }
    }

  /** ANN via signature-bucket join + exact integer-score re-rank
    * (top-5). 16 bands × 4 bits: for a top neighbor on RANDOM
    * embeddings (cosine ~0.35, the adversarial case — no cluster
    * structure) a 4-bit band collides with ~0.61⁴ ≈ 14%; 16 bands lift
    * that to 1-(1-0.14)¹⁶ ≈ 0.9 recall, which is what AnnRecallSpec
    * pins. Band count/width is THE recall/cost knob: each band is one
    * shuffle-key worth of candidates, tuned at scale to the target
    * similarity. */
  def qAnnLsh(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val emb = ensureLshIndex(s, d)
    val banded = emb.select(col("vec_id"), col("embedding"), col("nv"),
      posexplode(col("buckets")).as(Seq("band", "bucket")))
    val queries = banded.filter(col("vec_id") < nQueries)
      .select(col("band"), col("bucket"),
        col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("vec_id"))
    banded.join(broadcast(queries), Seq("band", "bucket"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        qdot(col("embedding"), col("q_vec")).as("dot"), col("nv"))
      .withColumn("score", scoreCol)
      .select(col("q_id"), col("vec_id"), col("score"))
      .distinct()
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("q_id"), col("vec_id"), col("score"), col("rn").cast("long").as("rn"))
      .orderBy(col("q_id"), col("rn"))
  }

  /** IVF index per corpus dir, built at most once: (cell-assigned
    * corpus, centroid table). Training the coarse quantizer is OFFLINE
    * index construction at scale — a driver-coordinated multi-pass
    * KMeans must not run inside every query invocation (it did in
    * round 1: 2.8 s/invocation of pure retraining). The assignment
    * stays persisted across invocations by design: it is the inverted
    * file, not a per-query temp. */
  private val ivfIndexes = new SessionMemo[IvfIndex]()

  private val ivfK = 16
  private val ivfNprobe = 6
  private val ivfSeedMod = 2147483647L // 2³¹ − 1, the MinHash oracle's modulus

  /** The inverted file: `assigned` = (vec_id, embedding, nv, label,
    * cell). The label rides IN the index so filtered ANN (hard-negative
    * mining's anti-predicate) prunes candidates in the same scan that
    * produces them — no corpus-sized label join at query time. Probing
    * differs per quantizer, so the centroid form rides along. */
  private sealed trait IvfIndex { def assigned: DataFrame }
  private final case class MedoidIvf(assigned: DataFrame,
      centroids: Seq[(Seq[Double], Long)]) extends IvfIndex
  private final case class KmeansIvf(assigned: DataFrame,
      cells: DataFrame) extends IvfIndex

  /** Public setup hook for [[Corpus.prepare]]. */
  def prepareIvfIndex(s: SparkSession, d: String): Unit = { ensureIvfIndex(s, d); () }

  private def ivfQuantizer(s: SparkSession): String =
    s.conf.get("graft.ivf.quantizer", "medoid")

  /** Build counter — observable by the reattach spec: a cross-session
    * prepare that finds a fresh descriptor must NOT bump it. */
  private[queries] val ivfBuilds = new java.util.concurrent.atomic.AtomicInteger

  private def encodeCentroids(cs: Seq[(Seq[Double], Long)]): String =
    cs.map { case (e, nc) => e.mkString(",") + "#" + nc }.mkString(";")
  private def decodeCentroids(s: String): Seq[(Seq[Double], Long)] =
    s.split(';').toSeq.map { part =>
      val Array(e, nc) = part.split('#')
      (e.split(',').toSeq.map(_.toDouble), nc.toLong)
    }

  /** Session-memoized, and PERSISTED across sessions (round-17): a
    * fresh driver reattaches the inverted file from the [[IndexStore]]
    * descriptor (plain parquet read + the centroids from metadata —
    * zero assignment jobs) instead of rebuilding; a corpus change
    * (fingerprint) or algorithm change (kind tag) rebuilds. Doubles
    * round-trip the descriptor exactly (toString/parseDouble identity),
    * so the reattached probe uses bit-identical centroids. */
  private def ensureIvfIndex(s: SparkSession, d: String): IvfIndex = {
    val mode = ivfQuantizer(s)
    val kind = s"ivf-$mode-v1"
    val slots = if (mode == "kmeans") Seq("assigned", "cells") else Seq("assigned")
    ivfIndexes.getOrBuild(s, s"$d#$mode") {
      IndexStore.load(s, d, s"ivf_$mode", Seq("embeddings"), kind, slots) match {
        case Some((loaded, meta)) if mode != "kmeans" =>
          val a = loaded("assigned").persist(); a.count()
          MedoidIvf(a, decodeCentroids(meta("centroids")))
        case Some((loaded, _)) =>
          val a = loaded("assigned").persist(); a.count()
          val c = loaded("cells").persist(); c.count()
          KmeansIvf(a, c)
        case None =>
          val built =
            if (mode == "kmeans") buildKmeansIvf(s, d) else buildMedoidIvf(s, d)
          built match {
            case MedoidIvf(a, cents) => IndexStore.save(s, d, s"ivf_$mode",
              Seq("embeddings"), kind, Map("assigned" -> a),
              Map("centroids" -> encodeCentroids(cents)))
            case KmeansIvf(a, c) => IndexStore.save(s, d, s"ivf_$mode",
              Seq("embeddings"), kind, Map("assigned" -> a, "cells" -> c))
          }
          built
      }
    }
  }

  /** Per-centroid quantized-dot and score columns appended to `df`
    * (whose vector lives in `vecCol`): `ivfd<i>` / `ivfs<i>`. The
    * centroid is a LITERAL double array, so all K dots run in one
    * whole-stage-codegen pass over the corpus — no join, no shuffle. */
  private def withCentroidScores(df: DataFrame, vecCol: String,
      centroids: Seq[(Seq[Double], Long)]): DataFrame =
    centroids.zipWithIndex.foldLeft(df) { case (acc, ((emb, nc), i)) =>
      acc.withColumn(s"ivfd$i", qdot(col(vecCol), typedLit(emb)))
        .withColumn(s"ivfs$i", expr(scoreSqlSparkOn(s"ivfd$i", s"${nc}L")))
    }

  private def ivfScoreArraySql: String =
    (0 until ivfK).map(i => s"ivfs$i").mkString("array(", ", ", ")")

  /** Default quantizer: K hash-sampled MEDOIDS. Seed rank is the
    * engine-independent `md5_lower("ivf-"||vec_id) mod (2³¹−1)`
    * (unsigned remainder — the exact value of DuckDB's
    * `md5_number_lower(..) % p`), ties by vec_id; the K lowest-ranked
    * corpus vectors ARE the centroids (cell = seed rank). Assignment
    * maximizes the exact integer score against each medoid's quantized
    * self-norm, ties to the lowest cell — every step reconstructs in
    * DuckDB SQL, which is what lets `ivf_ann`/`ivf_recall` carry full
    * hash-match oracles.
    *
    * Scale shape: seed selection is one narrow scan + TakeOrdered(K)
    * (no sort shuffle), assignment is one map pass against K literal
    * centroids — CHEAPER than Lloyd iterations at 100 TB, and the
    * sampled-quantizer quality trade is the standard IVF practice
    * (production systems train on samples, not the corpus). */
  private def buildMedoidIvf(s: SparkSession, d: String): MedoidIvf = {
    ivfBuilds.incrementAndGet()
    val spark0 = s
    import spark0.implicits._
    val seedIds = embeddings(s, d).select(col("vec_id")).as[Long]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { id =>
          (id, java.lang.Long.remainderUnsigned(
            TextQueries.md5Pair(md, "ivf-" + id)._1, ivfSeedMod))
        }
      }
      .toDF("vec_id", "h")
      .orderBy(col("h"), col("vec_id")).limit(ivfK)
      .collect().map(_.getLong(0)).toSeq
    val seedEmb = embeddings(s, d)
      .filter(col("vec_id").isin(seedIds: _*))
      .select(col("vec_id"), col("embedding"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val centroids = seedIds.map { id =>
      val e = seedEmb(id).map(_.toDouble)
      val nc = e.map(x => { val q = math.floor(x * QScale).toLong; q * q }).sum
      (e, nc)
    }
    val arr = ivfScoreArraySql
    val assigned = withCentroidScores(
      embeddings(s, d).select(col("vec_id"), col("embedding"),
        qdot(col("embedding"), col("embedding")).as("nv"), col("label")),
      "embedding", centroids)
      // argmax, first occurrence on ties = lowest cell
      .withColumn("cell",
        expr(s"cast(array_position($arr, array_max($arr)) as int) - 1"))
      .select(col("vec_id"), col("embedding"), col("nv"), col("label"),
        col("cell"))
      .persist()
    assigned.count()
    MedoidIvf(assigned, centroids)
  }

  /** Alternative quantizer (`graft.ivf.quantizer=kmeans`): seeded
    * KMeans, the FAISS-style trained coarse quantizer. Cells are
    * float-iterative and engine-private, so this mode has no SQL
    * oracle; AnnRecallSpec pins its recall floor alongside the medoid
    * default. */
  private def buildKmeansIvf(s: SparkSession, d: String): KmeansIvf = {
    ivfBuilds.incrementAndGet()
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.linalg.{Vector, Vectors}
    import s.implicits._
    val toVec = udf((a: Seq[Float]) => Vectors.dense(a.map(_.toDouble).toArray))
    val feat = embeddings(s, d)
      .withColumn("features", toVec(col("embedding"))).persist()
    val model = new KMeans().setK(ivfK).setSeed(42L).setMaxIter(5)
      .setFeaturesCol("features").setPredictionCol("cell").fit(feat)
    val assigned = model.transform(feat)
      .select(col("vec_id"), col("embedding"),
        qdot(col("embedding"), col("embedding")).as("nv"), col("label"),
        col("cell"))
      .persist()
    assigned.count() // materialize, then drop the featurized temp
    feat.unpersist(blocking = false)
    // 16 centroids are model metadata (driver-side by construction)
    val cells = model.clusterCenters.zipWithIndex.toSeq
      .map { case (c: Vector, i: Int) => (i, c.toArray.toSeq) }
      .toDF("cell", "centroid")
    KmeansIvf(assigned, cells)
  }

  /** IVF (inverted-file) ANN: coarse quantizer (k=16), nprobe=6 — each
    * query searches only its 6 nearest centroid cells, then the exact
    * integer score re-ranks (top-5). The other classic sublinear path
    * next to [[qAnnLsh]]; at scale the centroid set stays tiny (a
    * literal / broadcast) while the corpus is scanned once at ingest to
    * assign cells.
    *
    * nprobe = 6 of 16 cells: on random embeddings the true top-5
    * spread across cells (no cluster structure to exploit), so few
    * probes miss them — nprobe=4 measured 0.52 recall@5 at sf0.01; 6
    * clears the AnnRecallSpec 0.6 floor while still scanning under 40%
    * of the inverted file. On real (clustered) embeddings the same
    * recall needs far fewer probes. */
  /** Query-side cell probing, shared by every IVF consumer: keep each
    * query's `ivfNprobe` best cells (score DESC, cell ASC). `extras`
    * are query-side columns carried through untouched (hard-negative
    * mining rides its q_label here). Medoid centroids are literals —
    * one codegen pass, no join; KMeans cells are a 16-row broadcast. */
  private def ivfProbe(index: IvfIndex, queries: DataFrame,
      extras: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val keep = (Seq("q_id", "q_vec") ++ extras).map(col)
    index match {
      case MedoidIvf(_, centroids) =>
        val wCell = Window.partitionBy(col("q_id"))
          .orderBy(col("col").desc, col("pos"))
        withCentroidScores(queries, "q_vec", centroids)
          .select(keep :+ posexplode(expr(ivfScoreArraySql)): _*)
          .withColumn("crn", row_number().over(wCell))
          .filter(col("crn") <= ivfNprobe)
          .select(keep :+ col("pos").as("cell"): _*)
      case KmeansIvf(_, cells) =>
        val wCell = Window.partitionBy(col("q_id"))
          .orderBy(col("cdist").desc, col("cell"))
        queries.crossJoin(broadcast(cells))
          .withColumn("cdist", cosine(col("q_vec"), col("centroid")))
          .withColumn("crn", row_number().over(wCell))
          .filter(col("crn") <= ivfNprobe)
          .select(keep :+ col("cell"): _*)
    }
  }

  def qIvfAnn(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val index = ensureIvfIndex(s, d)
    val probed = ivfProbe(index,
      embeddings(s, d).filter(col("vec_id") < nQueries)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec")),
      extras = Nil)
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("vec_id"))
    probed.join(index.assigned, Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        qdot(col("embedding"), col("q_vec")).as("dot"), col("nv"))
      .withColumn("score", scoreCol)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("q_id"), col("vec_id"), col("score"), col("rn").cast("long").as("rn"))
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
      // probe side spread: the n^2/2 cosine work all sits on the scan
      val a = Tables.spread(embeddings(s, d))
        .select(col("vec_id").as("va"), col("embedding").as("ea"))
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
        posexplode(col("buckets")).as(Seq("band", "bucket")))
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

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): SEMANTIC
    * deduplication = cluster the embedding space with a cheap coarse
    * quantizer, then drop near-duplicates WITHIN each cluster only —
    * the trick that makes embedding dedup tractable at web scale
    * (pairwise work is bounded per cell instead of quadratic in the
    * corpus). Reuses the ingest-time medoid IVF assignment (K
    * hash-sampled medoids, engine-independent — the same cells the
    * `ivf_ann` oracle reconstructs); within a cell, a vector is
    * PRUNED when a lower-id cell-mate sits at cosine ≥ 0.5
    * (deterministic keep-lowest-id representative). Output: one row
    * per vector with its cell, keep flag and pruning representative.
    *
    * Scale shape: one map pass assigns cells (K literal centroids,
    * codegen), ONE shuffle on cell, pairwise only within cells — at
    * 100 TB, K grows with the corpus so per-cell work stays bounded
    * (the paper's configuration), and the join never leaves the cell. */
  def qSemdedup(s: SparkSession, d: String): DataFrame = {
    val assigned = ensureIvfIndex(s, d).assigned
      .select(col("vec_id"), col("cell"), col("embedding"))
    val l = assigned.select(col("cell"), col("vec_id").as("va"),
      col("embedding").as("ea"))
    val r = assigned.select(col("cell"), col("vec_id").as("vb"),
      col("embedding").as("eb"))
    val pruned = l.join(r, Seq("cell"))
      .filter(col("va") < col("vb"))
      .filter(cosine(col("ea"), col("eb")) >= 0.5)
      .groupBy(col("vb").as("vec_id"))
      .agg(min(col("va")).as("pruned_by"))
    assigned.select(col("vec_id"), col("cell"))
      .join(pruned, Seq("vec_id"), "left_outer")
      .select(col("vec_id"), col("cell"),
        col("pruned_by").isNull.as("keep"), col("pruned_by"))
      .orderBy(col("vec_id"))
  }

  /** Cluster-cap sampling (the DataComp / Meta "cluster-balanced
    * subset" practice, e.g. Abbas et al. 2023 §4's per-cluster
    * retention): cap every embedding cluster's contribution to the
    * training mix at K vectors so head clusters (boilerplate, memes,
    * templated text) cannot dominate the sample. Reuses the ingest-time
    * IVF cells as the clustering; within a cell the kept K are chosen
    * by a deterministic multiplicative hash of the id (Knuth 2654435761
    * — engine-exact integer arithmetic), ties by id, so the sample is
    * reproducible and oracle-reconstructable.
    *
    * Scale shape: the cell assignment is the already-built inverted
    * file (one map pass against K literal centroids); ranking is one
    * window sort per cell — a single shuffle keyed by cell, no joins,
    * output linear in the corpus. */
  def qClusterCapSample(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val K = 8
    val assigned = ensureIvfIndex(s, d).assigned.select(col("vec_id"), col("cell"))
    val w = Window.partitionBy(col("cell"))
      .orderBy(pmod(col("vec_id") * lit(2654435761L), lit(1000000L)), col("vec_id"))
    assigned
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("cell_size",
        count(lit(1)).over(Window.partitionBy(col("cell"))))
      .select(col("vec_id"), col("cell"), col("cell_size"), col("rank"),
        (col("rank") <= K).as("kept"))
      .orderBy(col("vec_id"))
  }

  /** kNN label classification over the embedding corpus — the
    * standard auto-labeling / eval pass (classify a vector by the
    * majority label of its k nearest neighbors, ties to the smaller
    * label). Neighbors come from the exact-integer brute ranking
    * ([[qCosineTopkBrute]], self excluded), so the whole pipeline —
    * ranking, vote, argmax — is engine-exact. Scale: the query set is
    * the bounded probe sample; production-scale classification swaps
    * the brute ranking for the IVF/LSH candidates, which share this
    * vote/argmax tail. */
  def qKnnClassify(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val labels = embeddings(s, d).select(col("vec_id"), col("label"))
    val votes = qCosineTopkBrute(s, d).filter(col("rn") <= 5)
      .join(labels, Seq("vec_id"))
      .groupBy(col("q_id"), col("label"))
      .agg(count(lit(1)).as("votes"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("votes").desc, col("label"))
    votes.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("q_id"), col("label").as("predicted"), col("votes"))
      .join(labels.select(col("vec_id").as("q_id"), col("label").as("actual")),
        Seq("q_id"))
      .select(col("q_id"), col("predicted"), col("votes"), col("actual"),
        (col("predicted") === col("actual")).as("correct"))
      .orderBy(col("q_id"))
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

  /** Recall@5 of one ANN path against the brute-force ground truth, per
    * query id. With the integer-score ranking everything here is exact
    * arithmetic, so BOTH flavors carry full DuckDB oracles (the IVF one
    * since the medoid quantizer landed); AnnRecallSpec additionally
    * asserts the ≥ 0.6 quality floor on each. */
  private def hitsAt5(s: SparkSession, d: String, approx: DataFrame, method: String): DataFrame = {
    val truth = qCosineTopkBrute(s, d).filter(col("rn") <= 5)
      .select(col("q_id"), col("vec_id"))
    val qids = truth.select(col("q_id")).distinct()
    qids.join(
      truth.join(approx.select(col("q_id"), col("vec_id")), Seq("q_id", "vec_id"), "left_semi")
        .groupBy(col("q_id")).agg(count(lit(1)).as("hits")),
      Seq("q_id"), "left_outer")
      .select(lit(method).as("method"), col("q_id"),
        coalesce(col("hits"), lit(0L)).as("hits_at_5"), lit(5L).as("k"))
      .orderBy(col("q_id"))
  }

  /** LSH recall@5 vs brute force — fully oracled. */
  def qAnnRecall(s: SparkSession, d: String): DataFrame =
    hitsAt5(s, d, qAnnLsh(s, d), "lsh")

  /** IVF recall@5 vs brute force — fully oracled under the default
    * medoid quantizer; AnnRecallSpec pins the floor (both quantizers). */
  def qIvfRecall(s: SparkSession, d: String): DataFrame =
    hitsAt5(s, d, qIvfAnn(s, d), "ivf")

  /** Hybrid retrieval via Reciprocal Rank Fusion (Cormack, Clarke &
    * Büttcher 2009, the k=60 rule every hybrid-search stack ships):
    * fuse the sparse BM25 ranking ([[TextQueries.bm25Scored]], the
    * shared scorer) with the dense quantized-cosine ranking against
    * query vector 0 by summing 10⁶ div (60 + rank) over the two
    * top-50 lists — integer division, so the fused score is exact in
    * both engines. A doc absent from one list contributes 0 from that
    * side (the standard RRF convention). The two query anchors (the
    * fixed term set / vec 0) are fixture-level; the operator shape —
    * rank two retrievers, fuse by reciprocal rank — is the product
    * surface. The dense self-match (vec 0) is excluded as in
    * [[qCosineTopkBrute]].
    *
    * Scale shape: each side is its retriever's native cost (BM25's
    * term-filtered stream; one corpus scan vs a broadcast query) ended
    * by TakeOrdered(50) — the global sort-limit never materializes a
    * corpus-sized sort. The fusion itself joins two 50-row lists:
    * driver-trivial at any corpus size, and the single-partition
    * row_number windows only ever see those 50 rows. */
  def qRrfFusion(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val k = 50
    val qvec = embeddings(s, d).filter(col("vec_id") === 0L)
      .select(col("embedding").as("q_vec"))
    val dense = embeddings(s, d).filter(col("vec_id") =!= 0L)
      .crossJoin(broadcast(qvec))
      .select(col("vec_id"),
        qdot(col("embedding"), col("q_vec")).as("dot"),
        qdot(col("embedding"), col("embedding")).as("nv"))
      .withColumn("score", scoreCol)
      .orderBy(col("score").desc, col("vec_id"))
      .limit(k)
      .withColumn("dense_rank", row_number()
        .over(Window.orderBy(col("score").desc, col("vec_id"))).cast("long"))
      .select(col("vec_id").as("doc_id"), col("dense_rank"))
    val sparse = TextQueries.bm25Scored(s, d)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
      .withColumn("sparse_rank", row_number()
        .over(Window.orderBy(col("score").desc, col("doc_id"))).cast("long"))
      .select(col("doc_id"), col("sparse_rank"))
    sparse.join(dense, Seq("doc_id"), "full_outer")
      .withColumn("rrf_milli",
        coalesce(expr("1000000L div (60L + sparse_rank)"), lit(0L)) +
          coalesce(expr("1000000L div (60L + dense_rank)"), lit(0L)))
      .orderBy(col("rrf_milli").desc, col("doc_id"))
      .limit(20)
      .select(col("doc_id"), col("sparse_rank"), col("dense_rank"),
        col("rrf_milli"))
  }

  /** MMR diversified retrieval (Carbonell & Goldstein 1998): greedy
    * top-8 re-rank of the 24 most query-relevant vectors, each pick
    * maximizing `rel(d) − max_{s∈S} sim(d, s)` — relevance minus the
    * worst redundancy against what is already selected (λ = 1/2 up to
    * the shared scale factor).
    *
    * Both terms are EXACT integers from the quantized-cosine device:
    * rel(d) uses the standard score (divisor = d's self-norm, monotone
    * in cosine for the fixed query), and the redundancy term pscore(d,s)
    * uses divisor = n_s, making it monotone in cos(d,s) for FIXED d
    * across varying s — exactly the comparison `max over S` performs.
    * Cross-multiplying cos² rationals would overflow BIGINT (dot²·n ≈
    * 2⁹⁰); choosing the divisor per comparison direction keeps every
    * intermediate in range and both engines bit-identical.
    *
    * Scale shape: candidate generation is the distributed part (one
    * corpus scan + TakeOrdered(24), the brute/ANN path); the greedy
    * re-rank is inherently sequential over the BOUNDED candidate list —
    * 24 rows + 24×23 pairwise scores cross the driver, which is how
    * every production MMR/diversity re-ranker runs (rerank windows of
    * 10²–10³ candidates, never the corpus). At 100 TB only the
    * candidate generator changes (ANN instead of brute). */
  def qMmrDiversify(s: SparkSession, d: String): DataFrame = {
    val emb = embeddings(s, d).select(col("vec_id"), col("embedding"),
      qdot(col("embedding"), col("embedding")).as("nv"))
    val qv = emb.filter(col("vec_id") === 0).select(col("embedding").as("q_vec"))
    // persisted: consumed by the pairwise self-join (both sides) and the
    // candidate collect — without it the corpus scan + TakeOrdered runs 3×
    val cands = QueryCaches.track(
      emb.filter(col("vec_id") =!= 0).crossJoin(broadcast(qv))
        .select(col("vec_id"), col("embedding"), col("nv"),
          qdot(col("embedding"), col("q_vec")).as("dot"))
        .withColumn("rel", expr(scoreSqlSparkOn("dot", "nv")))
        .orderBy(col("rel").desc, col("vec_id"))
        .limit(24)
        .select(col("vec_id"), col("embedding"), col("nv"), col("rel"))
        .persist())
    val a = cands.select(col("vec_id").as("dv"), col("embedding").as("ev"))
    val b = cands.select(col("vec_id").as("sv_id"), col("embedding").as("sv"),
      col("nv").as("ns"))
    val pair = a.join(broadcast(b), col("dv") =!= col("sv_id"))
      .select(col("dv"), col("sv_id"),
        qdot(col("ev"), col("sv")).as("dot"), col("ns"))
      .withColumn("ps", expr(scoreSqlSparkOn("dot", "ns")))
      .select(col("dv"), col("sv_id"), col("ps"))
    // bounded driver re-rank: 24 candidates + their pairwise scores
    val cr = cands.select(col("vec_id"), col("rel")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (id, rel) => (-rel, id) }
    val pm = pair.collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val selected = scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Long)]()
    val remaining = scala.collection.mutable.LinkedHashSet(cr: _*)
    for (rank <- 1 to 8) {
      val pick = remaining.iterator.map { case (id, rel) =>
        val pen = if (selected.isEmpty) 0L
        else selected.iterator.map(t => pm((id, t._2))).max
        (rel - pen, id, rel, pen)
      }.minBy { case (mmr, id, _, _) => (-mmr, id) }
      selected += ((rank.toLong, pick._2, pick._3, pick._4))
      remaining.remove((pick._2, pick._3))
    }
    val spark0 = s
    import spark0.implicits._
    selected.toSeq.toDF("sel_rank", "vec_id", "rel", "redundancy")
      .withColumn("mmr", col("rel") - col("redundancy"))
      .orderBy(col("sel_rank"))
  }

  /** c-TF-IDF topic keywords (the BERTopic device, Grootendorst 2022):
    * label every embedding cluster with its 5 most characteristic
    * words. Clusters are the ingest-time md5-medoid IVF cells (the
    * semdedup/cluster_cap_sample device, vec_id ≡ doc_id on this
    * corpus); "characteristic" is class-based TF-IDF in EXACT integer
    * bits — score = tf_{w,c} · bitlen((C + cdf_w) div cdf_w), with
    * cdf_w = number of cells containing w (the cell-level idf that
    * kills corpus-wide words) and bitlen = length(bin(x)), the
    * lm_perplexity/dsir log device.
    *
    * Scale shape: tokens join the O(corpus) cell assignment on doc_id
    * (one shuffle), the (cell, word) rollup is map-side combined, the
    * cell-df table is vocabulary-bounded, C is one broadcast scalar,
    * and the final top-5 window sorts only the vocabulary-bounded
    * scored table. Nothing quadratic, no driver state. */
  def qCtfidfTopics(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val assigned = ensureIvfIndex(s, d).assigned
      .select(col("vec_id").as("doc_id"), col("cell"))
    val toks = documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
    val tf = toks.join(assigned, "doc_id")
      .groupBy(col("cell"), col("word")).agg(count(lit(1)).as("tf"))
    val dfw = tf.groupBy(col("word")).agg(count(lit(1)).as("cdf"))
    val cTot = assigned.agg(countDistinct(col("cell")).as("n_cells"))
    val w = Window.partitionBy(col("cell")).orderBy(col("score").desc, col("word"))
    tf.join(dfw, "word").crossJoin(broadcast(cTot))
      .withColumn("score",
        col("tf") * length(bin(expr("(n_cells + cdf) div cdf"))).cast("long"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 5)
      .select(col("cell").cast("int").as("cell"), col("rn"), col("word"),
        col("tf"), col("score"))
      .orderBy(col("cell"), col("rn"))
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

  /** Distributed Lloyd's k-means TRAINING (round 13), fully oracled —
    * the trained counterpart to the hash-sampled IVF medoids (and the
    * exact-integer sibling of the float `graft.ivf.quantizer=kmeans`
    * mode, which is engine-private by nature): K=8 hash-ranked seeds
    * (the IVF seed family, `md5_lower("km-"||vec_id) mod 2³¹−1`), two
    * Lloyd rounds + a final assignment, everything in exact BIGINT so
    * DuckDB replays the identical trajectory.
    *
    * Exactness devices: components quantize as ⌊x·2¹⁵⌋ (the shared
    * QuantizedDotF device); distance = n_q + n_c − 2·dot with `dot`
    * from the codegen'd [[qdot]] against the centroid-as-double
    * literal (integer/2¹⁵ is a power-of-2 division — exact, so qdot's
    * re-quantization reproduces the centroid integers bit-for-bit);
    * the centroid mean shifts into non-negative space before dividing
    * (`(Σq + 2¹⁵·n) div n − 2¹⁵`) because Spark's `div` truncates
    * toward zero while DuckDB's `//` floors — they agree only on
    * non-negative numerators; assignment ties go to the smallest cid
    * (ordered CASE chain here, `ORDER BY dist, cid` there). Per-vector
    * distances are ≤ 64·2³² so the per-cluster inertia is reported in
    * 2²⁰ units (`Σ(dist div 2²⁰)`), BIGINT-safe past 10¹³ members.
    *
    * Scale shape: the classic distributed Lloyd — per round ONE
    * codegen map pass against K literal centroids (no join: centroids
    * travel via the driver, K×64 longs) plus ONE (cid,dim)-keyed
    * rollup with map-side combine whose result is K×64 rows; nothing
    * iterative ever self-joins, so no lineage cuts are needed. */
  def qKmeansTrain(s: SparkSession, d: String): DataFrame = {
    val spark0 = s
    import spark0.implicits._
    val K = 8
    val Shift = QScale.toLong // 2^15
    val emb = QueryCaches.track(embeddings(s, d)
      .select(col("vec_id"), col("embedding"),
        qdot(col("embedding"), col("embedding")).as("nq"))
      .persist())
    val seedIds = embeddings(s, d).select(col("vec_id")).as[Long]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { id =>
          (id, java.lang.Long.remainderUnsigned(
            TextQueries.md5Pair(md, "km-" + id)._1, 2147483647L))
        }
      }
      .toDF("vec_id", "h")
      .orderBy(col("h"), col("vec_id")).limit(K)
      .collect().map(_.getLong(0)).toSeq
    val seedEmb = embeddings(s, d)
      .filter(col("vec_id").isin(seedIds: _*))
      .select(col("vec_id"), col("embedding"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    // centroids as (cid, integer components); cid labels survive empty
    // clusters (a vanished centroid keeps every other label stable)
    var centroids: Seq[(Int, Array[Long])] = seedIds.zipWithIndex.map {
      case (id, i) =>
        (i, seedEmb(id).map(x => math.floor(x.toDouble * Shift).toLong).toArray)
    }
    def assign(cs: Seq[(Int, Array[Long])]): DataFrame = {
      var df = emb
      cs.foreach { case (cid, c) =>
        val nc = c.map(x => x * x).sum
        df = df.withColumn(s"d$cid",
          lit(nc) - lit(2L) * qdot(col("embedding"),
            typedLit(c.map(_.toDouble / Shift).toSeq)) + col("nq"))
      }
      val mn = least(cs.map { case (cid, _) => col(s"d$cid") }: _*)
      val cidCol = cs.map(_._1).sorted.reverse.tail.reverse // all but last, asc
        .foldRight(lit(cs.map(_._1).max.toLong): Column) { (cid, acc) =>
          when(col(s"d$cid") === col("mn"), lit(cid.toLong)).otherwise(acc)
        }
      df.withColumn("mn", mn).withColumn("cid", cidCol)
    }
    for (_ <- 1 to 2) {
      val updated = assign(centroids)
        .select(col("cid"), posexplode(col("embedding")).as(Seq("dim", "x")))
        .select(col("cid"), col("dim"),
          expr(s"CAST(floor(CAST(x AS DOUBLE) * $Shift) AS BIGINT)").as("q"))
        .groupBy(col("cid"), col("dim"))
        .agg(sum(col("q")).as("sq"), count(lit(1)).as("n"))
        .select(col("cid"), col("dim"),
          expr(s"(sq + $Shift * n) div n - $Shift").as("v"))
        .collect()
      centroids = updated.groupBy(_.getLong(0).toInt).toSeq.sortBy(_._1)
        .map { case (cid, rows) =>
          val arr = new Array[Long](rows.map(_.getInt(1)).max + 1)
          rows.foreach(r => arr(r.getInt(1)) = r.getLong(2))
          (cid, arr)
        }
    }
    assign(centroids)
      .groupBy(col("cid"))
      .agg(count(lit(1)).as("n_members"),
        sum(expr("mn div 1048576")).as("inertia_m"))
      .orderBy(col("cid"))
  }

  /** Int8 scalar-quantization audit (round 13) — the report an ANN
    * index build reads before switching storage to SQ8 (FAISS's
    * ScalarQuantizer): per dimension, the total and worst absolute
    * reconstruction error of the 8-bit code against the exact q15
    * integer components. Code = `(q15 + 2¹⁵) div 256` (the shift puts
    * the numerator in non-negative space where Spark's truncating
    * `div` and DuckDB's flooring `//` agree — the k-means mean
    * device); reconstruction = `code·256 − 2¹⁵`; every error ≤ 255
    * exactly. Scale shape: one map pass + a 64-group rollup with
    * map-side combine — nothing keyed by row. */
  def qSq8Error(s: SparkSession, d: String): DataFrame =
    embeddings(s, d)
      .select(posexplode(col("embedding")).as(Seq("dim", "x")))
      .select(col("dim"),
        expr(s"CAST(floor(CAST(x AS DOUBLE) * $QScale) AS BIGINT)").as("q"))
      .withColumn("r", expr(s"((q + $QScale) div 256) * 256 - $QScale"))
      .withColumn("err", abs(col("q") - col("r")))
      .groupBy(col("dim"))
      .agg(count(lit(1)).as("n_vecs"), sum(col("err")).as("sum_err"),
        max(col("err")).as("max_err"))
      .orderBy(col("dim"))

  /** Product-quantization encode (round 13) — the FAISS IndexPQ storage
    * step that turns a 64-dim vector into 8 nibble codes (one per 8-dim
    * subspace, 16-entry codebook each): the memory layout that makes
    * billion-vector ANN fit RAM. Codebook entries are 16 hash-ranked
    * SAMPLE vectors' subvectors (`md5("pq-"||vec_id)` rank — the IVF
    * medoid sampling family; per-subspace Lloyd refinement is the
    * [[qKmeansTrain]] machinery and deliberately not re-run here).
    *
    * Exactness: subvector distance = n_q + n_c − 2·dot with every term
    * from the codegen'd [[qdot]] in ⌊x·2¹⁵⌋ integers; argmin ties go to
    * the smallest code. `pq_code` packs the 8 nibbles into one BIGINT
    * (Σ code_m·2⁴ᵐ < 2³²); `qerr` is the exact total reconstruction
    * error Σ_m min-dist.
    *
    * Scale shape: the codebook travels by driver/broadcast (16×64
    * longs); encode is one map-side broadcast join fanning each vector
    * to its 8 subspaces × 16 entries, then ONE vec_id rollup whose 8
    * conditional-min structs pick every subspace's argmin in a single
    * shuffle. O(corpus) rows out — the point of the operator. */
  private val pqM = 8; private val pqSub = 8; private val pqK = 16

  /** PQ codebook: per (subspace m, code k) the 8 q15 integer components
    * of hash-ranked sample vector k's m-th subvector. 16×8×8 longs —
    * driver-sized at any corpus. */
  private def pqCodebook(s: SparkSession, d: String): Seq[(Int, Int, Array[Long])] = {
    val spark0 = s
    import spark0.implicits._
    val Shift = QScale.toLong
    val seedIds = embeddings(s, d).select(col("vec_id")).as[Long]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map(id => (id, java.lang.Long.remainderUnsigned(
          TextQueries.md5Pair(md, "pq-" + id)._1, ivfSeedMod)))
      }
      .toDF("vec_id", "h")
      .orderBy(col("h"), col("vec_id")).limit(pqK)
      .collect().map(_.getLong(0)).toSeq // rank order = code order
    val seedEmb = embeddings(s, d)
      .filter(col("vec_id").isin(seedIds: _*))
      .select(col("vec_id"), col("embedding"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    for {
      (id, k) <- seedIds.zipWithIndex
      m <- 0 until pqM
    } yield (m, k, seedEmb(id).slice(m * pqSub, (m + 1) * pqSub)
      .map(x => math.floor(x.toDouble * Shift).toLong).toArray)
  }

  /** (vec_id, pq_code, qerr) for the whole corpus: one broadcast-join
    * map pass + one vec_id rollup (see [[qPqEncode]]'s scale notes). */
  private def pqEncoded(s: SparkSession, d: String): DataFrame = {
    val spark0 = s
    import spark0.implicits._
    val Shift = QScale.toLong
    val cb = pqCodebook(s, d).map { case (m, k, q) =>
      (m.toLong, k.toLong, q.map(_.toDouble / Shift).toSeq,
        q.map(x => x * x).sum)
    }.toDF("m", "k", "cq", "nc")
    val dists = embeddings(s, d)
      .select(col("vec_id"),
        explode(expr(s"sequence(0L, ${pqM - 1}L)")).as("m"), col("embedding"))
      .withColumn("sub",
        expr(s"slice(embedding, CAST(m * $pqSub + 1 AS INT), $pqSub)"))
      .join(broadcast(cb), "m")
      .select(col("vec_id"), col("m"), col("k"),
        (qdot(col("sub"), col("sub")) + col("nc") -
          lit(2L) * qdot(col("sub"), col("cq"))).as("dist"))
    val aggs = (0 until pqM).map(m =>
      min(when(col("m") === m, struct(col("dist"), col("k")))).as(s"b$m"))
    dists.groupBy(col("vec_id")).agg(aggs.head, aggs.tail: _*)
      .select(col("vec_id"),
        (0 until pqM).map(m => expr(s"shiftleft(b$m.k, ${4 * m})"))
          .reduce(_ + _).as("pq_code"),
        (0 until pqM).map(m => col(s"b$m.dist")).reduce(_ + _).as("qerr"))
  }

  def qPqEncode(s: SparkSession, d: String): DataFrame =
    pqEncoded(s, d).orderBy(col("vec_id"))

  /** PQ asymmetric-distance search + recall@5 (round 13) — the payoff
    * of [[qPqEncode]]: each query builds a 8×16 lookup table of exact
    * integer subspace distances to every codebook entry ON THE DRIVER
    * (640 longs for 5 queries), and scanning the code table is 8 nibble
    * extractions + 8 LUT adds per vector — never touching the original
    * embeddings (the FAISS ADC scan). The 4-bit code is a CANDIDATE
    * GENERATOR, not a ranker — exactly like the LSH band buckets — so
    * the ADC top-50 per query re-ranks by EXACT integer L2 (rank by
    * n_v − 2·dot, the self-norm constant drops) before taking the
    * top-5; recall then measures whether 32 bits of code keep the true
    * neighbors inside a 50-candidate working set (the FAISS
    * IndexPQ+refine shape). hits_at_5 is exact arithmetic end-to-end —
    * fully oracled, with PqRecallSpec pinning a quality floor the hash
    * compare can't express. */
  def qPqRecall(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark0 = s
    import spark0.implicits._
    val Shift = QScale.toLong
    val cb = pqCodebook(s, d)
    val qEmb = embeddings(s, d).filter(col("vec_id") < nQueries)
      .select(col("vec_id"), col("embedding"))
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => math.floor(x.toDouble * Shift).toLong))
    val lut = (for {
      (qid, qv) <- qEmb.toSeq
      (m, k, c) <- cb
    } yield {
      val lval = (0 until pqSub).map { j =>
        val diff = qv(m * pqSub + j) - c(j); diff * diff
      }.sum
      (qid, m.toLong, k.toLong, lval)
    }).toDF("q_id", "m", "nib", "lval")
    val codes = pqEncoded(s, d).select(col("vec_id"), col("pq_code"))
    val wA = Window.partitionBy(col("q_id"))
      .orderBy(col("adist"), col("vec_id"))
    val adcCand = codes
      .select(col("vec_id"), col("pq_code"),
        explode(expr(s"sequence(0L, ${pqM - 1}L)")).as("m"))
      .withColumn("nib",
        expr("shiftright(pq_code, CAST(4 * m AS INT)) & 15"))
      .join(broadcast(lut), Seq("m", "nib"))
      .filter(col("vec_id") =!= col("q_id"))
      .groupBy(col("q_id"), col("vec_id")).agg(sum(col("lval")).as("adist"))
      .withColumn("rn", row_number().over(wA)).filter(col("rn") <= 50)
      .select(col("q_id"), col("vec_id"))
    val queries = embeddings(s, d).filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val emb = embeddings(s, d)
      .select(col("vec_id"), col("embedding"),
        qdot(col("embedding"), col("embedding")).as("nv"))
    val wT = Window.partitionBy(col("q_id"))
      .orderBy(col("tdist"), col("vec_id"))
    def exactTop5(cands: DataFrame): DataFrame = cands
      .join(emb, "vec_id")
      .join(broadcast(queries), "q_id")
      .select(col("q_id"), col("vec_id"),
        (col("nv") - lit(2L) * qdot(col("embedding"), col("q_vec"))).as("tdist"))
      .withColumn("rn", row_number().over(wT)).filter(col("rn") <= 5)
      .select(col("q_id"), col("vec_id"))
    val adcTop = exactTop5(adcCand)
    val truth = exactTop5(embeddings(s, d).select(col("vec_id"))
      .crossJoin(broadcast(queries.select(col("q_id"))))
      .filter(col("vec_id") =!= col("q_id")))
    val qids = truth.select(col("q_id")).distinct()
    qids.join(
      truth.join(adcTop, Seq("q_id", "vec_id"), "left_semi")
        .groupBy(col("q_id")).agg(count(lit(1)).as("hits")),
      Seq("q_id"), "left_outer")
      .select(lit("pq_adc").as("method"), col("q_id"),
        coalesce(col("hits"), lit(0L)).as("hits_at_5"), lit(5L).as("k"))
      .orderBy(col("q_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pq_encode" -> qPqEncode,
    "pq_recall" -> qPqRecall,
    "sq8_error" -> qSq8Error,
    "cosine_topk_brute" -> qCosineTopkBrute,
    "hard_negatives" -> qHardNegatives,
    "hard_negatives_ann" -> qHardNegativesAnn,
    "hard_negatives_recall" -> qHardNegativesRecall,
    "embedding_drift" -> qEmbeddingDrift,
    "ann_lsh" -> qAnnLsh,
    "ivf_ann" -> qIvfAnn,
    "ann_recall" -> qAnnRecall,
    "ivf_recall" -> qIvfRecall,
    "dedup_embedding" -> qDedupEmbedding,
    "semdedup" -> qSemdedup,
    "cluster_cap_sample" -> qClusterCapSample,
    "knn_classify" -> qKnnClassify,
    "rrf_fusion" -> qRrfFusion,
    "mmr_diversify" -> qMmrDiversify,
    "ctfidf_topics" -> qCtfidfTopics,
    "embedding_stats" -> qEmbeddingStats,
    "kmeans_train" -> qKmeansTrain,
  )

  // ---- DuckDB oracle reconstruction (generated from the SAME constants
  // as the Spark side so neither can drift) -------------------------------

  /** Quantized vectors + self-norms. x·2¹⁵ and floor are exact in
    * doubles; q² sums stay < 2³¹ so list_sum in doubles is exact too. */
  private def oracleBaseCtes: String =
    s"""qe AS (
       |  SELECT vec_id,
       |    list_transform(CAST(embedding AS DOUBLE[]),
       |                   x -> CAST(floor(x * $QScale) AS BIGINT)) AS qv
       |  FROM embeddings
       |), nrm AS (
       |  SELECT vec_id, CAST(list_sum(list_transform(qv, x -> x * x)) AS BIGINT) AS nv
       |  FROM qe
       |)""".stripMargin

  /** Brute-force ranking CTEs ending in `branked(q_id, vec_id, score, rn)`.
    * list_dot_product over integer-valued doubles is exact: every
    * product ≤ 2²⁹ and the running sum ≤ 2³¹ ≪ 2⁵³. */
  private def bruteCtes: String =
    s"""bpairs AS (
       |  SELECT q.vec_id AS q_id, c.vec_id,
       |    CAST(list_dot_product(CAST(q.qv AS DOUBLE[]), CAST(c.qv AS DOUBLE[])) AS BIGINT) AS dot,
       |    n.nv
       |  FROM qe q JOIN qe c ON c.vec_id <> q.vec_id
       |  JOIN nrm n ON n.vec_id = c.vec_id
       |  WHERE q.vec_id < $nQueries
       |), bscored AS (
       |  SELECT q_id, vec_id, $scoreSqlDuck AS score FROM bpairs
       |), branked AS (
       |  SELECT q_id, vec_id, score,
       |    row_number() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id) AS rn
       |  FROM bscored
       |)""".stripMargin

  /** LSH ranking CTEs ending in `lranked(q_id, vec_id, score, rn)`:
    * regenerate the ±1 plane matrix from MD5 parity, project, band,
    * bucket-join, exact-score re-rank. */
  private def lshCtes: String =
    s"""planes AS (
       |  SELECT i, j,
       |    CASE WHEN md5_number_lower('hp-' || i || '-' || j) % 2 = 0 THEN 1 ELSE -1 END AS s
       |  FROM range(64) t1(i), range(64) t2(j)
       |), psum AS (
       |  SELECT q.vec_id, p.i, sum(p.s * q.qv[p.j + 1]) AS pd
       |  FROM qe q, planes p GROUP BY q.vec_id, p.i
       |), buck AS (
       |  SELECT vec_id, i // 4 AS band,
       |    CAST(sum(CASE WHEN pd > 0 THEN 1 << (i % 4) ELSE 0 END) AS BIGINT) AS bucket
       |  FROM psum GROUP BY vec_id, i // 4
       |), cand AS (
       |  SELECT DISTINCT q.vec_id AS q_id, c.vec_id
       |  FROM buck q JOIN buck c ON q.band = c.band AND q.bucket = c.bucket
       |  WHERE q.vec_id < $nQueries AND c.vec_id <> q.vec_id
       |), lpairs AS (
       |  SELECT cd.q_id, cd.vec_id,
       |    CAST(list_dot_product(CAST(a.qv AS DOUBLE[]), CAST(b.qv AS DOUBLE[])) AS BIGINT) AS dot,
       |    n.nv
       |  FROM cand cd
       |  JOIN qe a ON a.vec_id = cd.q_id
       |  JOIN qe b ON b.vec_id = cd.vec_id
       |  JOIN nrm n ON n.vec_id = cd.vec_id
       |), lscored AS (
       |  SELECT q_id, vec_id, $scoreSqlDuck AS score FROM lpairs
       |), lranked AS (
       |  SELECT q_id, vec_id, score,
       |    row_number() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id) AS rn
       |  FROM lscored
       |)""".stripMargin

  /** IVF ranking CTEs ending in `iranked(q_id, vec_id, score, rn)`:
    * re-derive the K medoid seeds from MD5 rank, re-assign every vector
    * by the identical integer score, probe, re-rank. Generated from the
    * SAME constants as the Spark side (K / nprobe / modulus / score
    * formula) so neither can drift. */
  /** The cell-ASSIGNMENT half of [[ivfCtes]] (medoid seeds → integer
    * scores → argmax cell), shared with the `semdedup` oracle which
    * needs cells but no query probing. */
  private def ivfAssignCtes: String =
    s"""icent AS (
       |  SELECT t.cell, q.qv, n.nv AS nc
       |  FROM (
       |    SELECT vec_id, row_number() OVER (
       |      ORDER BY CAST(md5_number_lower('ivf-' || vec_id) % $ivfSeedMod AS BIGINT),
       |               vec_id) - 1 AS cell
       |    FROM qe) t
       |  JOIN qe q USING (vec_id) JOIN nrm n USING (vec_id)
       |  WHERE t.cell < $ivfK
       |), iasc AS (
       |  SELECT vec_id, cell, ${scoreSqlDuckOn("dot", "nv")} AS score FROM (
       |    SELECT v.vec_id, c.cell,
       |      CAST(list_dot_product(CAST(v.qv AS DOUBLE[]), CAST(c.qv AS DOUBLE[])) AS BIGINT) AS dot,
       |      c.nc AS nv
       |    FROM qe v, icent c)
       |), icellof AS (
       |  SELECT vec_id, cell FROM (
       |    SELECT vec_id, cell,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, cell) AS rn
       |    FROM iasc) WHERE rn = 1
       |)""".stripMargin

  private def ivfCtes: String =
    s"""$ivfAssignCtes, iprobe AS (
       |  SELECT vec_id AS q_id, cell FROM (
       |    SELECT vec_id, cell,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, cell) AS rn
       |    FROM iasc WHERE vec_id < $nQueries) WHERE rn <= $ivfNprobe
       |), ipairs AS (
       |  SELECT p.q_id, a.vec_id,
       |    CAST(list_dot_product(CAST(qq.qv AS DOUBLE[]), CAST(cc.qv AS DOUBLE[])) AS BIGINT) AS dot,
       |    n.nv
       |  FROM iprobe p JOIN icellof a USING (cell)
       |  JOIN qe qq ON qq.vec_id = p.q_id
       |  JOIN qe cc ON cc.vec_id = a.vec_id
       |  JOIN nrm n ON n.vec_id = a.vec_id
       |  WHERE a.vec_id <> p.q_id
       |), iscored AS (
       |  SELECT q_id, vec_id, $scoreSqlDuck AS score FROM ipairs
       |), iranked AS (
       |  SELECT q_id, vec_id, score,
       |    row_number() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id) AS rn
       |  FROM iscored
       |)""".stripMargin

  /** Brute label-filtered ranking ending in `hranked` — the
    * hard_negatives ground truth (also the recall oracle's truth side). */
  private def hardNegBruteCtes: String =
    s"""lab AS (
       |  SELECT vec_id, label FROM embeddings
       |), hpairs AS (
       |  SELECT q.vec_id AS q_id, c.vec_id, lc.label,
       |    CAST(list_dot_product(CAST(q.qv AS DOUBLE[]), CAST(c.qv AS DOUBLE[])) AS BIGINT) AS dot,
       |    n.nv
       |  FROM qe q JOIN qe c ON c.vec_id <> q.vec_id
       |  JOIN nrm n ON n.vec_id = c.vec_id
       |  JOIN lab lq ON lq.vec_id = q.vec_id
       |  JOIN lab lc ON lc.vec_id = c.vec_id
       |  WHERE q.vec_id < $nQueries AND lc.label <> lq.label
       |), hscored AS (
       |  SELECT q_id, vec_id, label, $scoreSqlDuck AS score FROM hpairs
       |), hranked AS (
       |  SELECT q_id, vec_id, label, score,
       |    row_number() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id) AS rn
       |  FROM hscored
       |)""".stripMargin

  /** IVF-candidate label-filtered ranking ending in `haranked`; rides
    * on [[ivfCtes]]' iprobe/icellof. `alab` (not `lab`) so the recall
    * oracle can hold both ranked sets in one WITH list. */
  private def hardNegAnnCtes: String =
    s"""alab AS (
       |  SELECT vec_id, label FROM embeddings
       |), hapairs AS (
       |  SELECT p.q_id, a.vec_id, lc.label,
       |    CAST(list_dot_product(CAST(qq.qv AS DOUBLE[]), CAST(cc.qv AS DOUBLE[])) AS BIGINT) AS dot,
       |    n.nv
       |  FROM iprobe p JOIN icellof a USING (cell)
       |  JOIN qe qq ON qq.vec_id = p.q_id
       |  JOIN qe cc ON cc.vec_id = a.vec_id
       |  JOIN nrm n ON n.vec_id = a.vec_id
       |  JOIN alab lq ON lq.vec_id = p.q_id
       |  JOIN alab lc ON lc.vec_id = a.vec_id
       |  WHERE a.vec_id <> p.q_id AND lc.label <> lq.label
       |), hascored AS (
       |  SELECT q_id, vec_id, label, $scoreSqlDuck AS score FROM hapairs
       |), haranked AS (
       |  SELECT q_id, vec_id, label, score,
       |    row_number() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id) AS rn
       |  FROM hascored
       |)""".stripMargin

  /** MMR oracle: candidate + pairwise CTEs, then the 8 greedy picks
    * UNROLLED by a Scala loop (one template, no hand-copied steps) —
    * each pick re-scores the remainder against the accumulated
    * selection and takes the (mmr DESC, vec_id) head, exactly the
    * driver-side greedy. */
  private def mmrOracleSql: String = {
    val sb = new StringBuilder
    sb.append(
      s"""WITH $oracleBaseCtes, mrel AS (
         |  SELECT c.vec_id,
         |    CAST(list_dot_product(CAST(q.qv AS DOUBLE[]), CAST(c.qv AS DOUBLE[])) AS BIGINT) AS dot,
         |    n.nv
         |  FROM qe c JOIN qe q ON q.vec_id = 0 AND c.vec_id <> 0
         |  JOIN nrm n ON n.vec_id = c.vec_id
         |), mcand AS MATERIALIZED (
         |  SELECT vec_id, $scoreSqlDuck AS rel FROM mrel
         |  ORDER BY rel DESC, vec_id LIMIT 24
         |), mpsim AS MATERIALIZED (
         |  SELECT a.vec_id AS d, b.vec_id AS s2,
         |    ${scoreSqlDuckOn(
             "CAST(list_dot_product(CAST(qa.qv AS DOUBLE[]), CAST(qb.qv AS DOUBLE[])) AS BIGINT)",
             "nb.nv")} AS ps
         |  FROM mcand a JOIN mcand b ON a.vec_id <> b.vec_id
         |  JOIN qe qa ON qa.vec_id = a.vec_id
         |  JOIN qe qb ON qb.vec_id = b.vec_id
         |  JOIN nrm nb ON nb.vec_id = b.vec_id
         |), acc1 AS MATERIALIZED (
         |  SELECT CAST(1 AS BIGINT) AS sel_rank, vec_id, rel,
         |    CAST(0 AS BIGINT) AS pen
         |  FROM mcand ORDER BY rel DESC, vec_id LIMIT 1
         |)""".stripMargin)
    for (k <- 2 to 8) {
      val prev = s"acc${k - 1}"
      sb.append(
        s""", pick$k AS (
           |  SELECT CAST($k AS BIGINT) AS sel_rank, c.vec_id, c.rel,
           |    max(p.ps) AS pen
           |  FROM mcand c JOIN mpsim p ON p.d = c.vec_id
           |    AND p.s2 IN (SELECT vec_id FROM $prev)
           |  WHERE c.vec_id NOT IN (SELECT vec_id FROM $prev)
           |  GROUP BY c.vec_id, c.rel
           |  ORDER BY c.rel - max(p.ps) DESC, c.vec_id LIMIT 1
           |), acc$k AS MATERIALIZED (SELECT * FROM $prev UNION ALL SELECT * FROM pick$k)""".stripMargin)
    }
    sb.append(
      """
        |SELECT sel_rank, vec_id, rel, pen AS redundancy, rel - pen AS mmr
        |FROM acc8 ORDER BY sel_rank""".stripMargin)
    sb.toString
  }

  /** The k-means trajectory replayed in SQL: seeds by hash rank, two
    * Lloyd rounds as MATERIALIZED CTE pairs (distance argmin with
    * `ORDER BY dist, cid`, shifted-mean update), final assignment
    * rolled up. `sum((q-v)²)` is the same integer as the Spark side's
    * n_q + n_c − 2·dot decomposition. */
  private def kmeansOracleSql: String = {
    val sb = new StringBuilder
    sb.append(
      s"""WITH $oracleBaseCtes,
         |qd AS MATERIALIZED (
         |  SELECT vec_id, i AS dim, qv[i] AS q
         |  FROM qe, LATERAL (SELECT unnest(generate_series(1, len(qv))) AS i) g
         |), sr AS MATERIALIZED (
         |  SELECT vec_id,
         |    CAST(row_number() OVER (ORDER BY hk, vec_id) - 1 AS BIGINT) AS cid
         |  FROM (SELECT vec_id,
         |          md5_number_lower('km-' || CAST(vec_id AS VARCHAR))
         |            % 2147483647 AS hk
         |        FROM qe)
         |  QUALIFY row_number() OVER (ORDER BY hk, vec_id) <= 8
         |), c0 AS MATERIALIZED (
         |  SELECT sr.cid, qd.dim, qd.q AS v FROM sr JOIN qd USING (vec_id)
         |)""".stripMargin)
    for (r <- 1 to 3) {
      sb.append(
        s""", d$r AS MATERIALIZED (
           |  SELECT qd.vec_id, c.cid,
           |    CAST(sum((qd.q - c.v) * (qd.q - c.v)) AS BIGINT) AS dist
           |  FROM qd JOIN c${r - 1} c ON c.dim = qd.dim
           |  GROUP BY 1, 2
           |), a$r AS MATERIALIZED (
           |  SELECT vec_id, cid, dist FROM d$r
           |  QUALIFY row_number() OVER (PARTITION BY vec_id
           |    ORDER BY dist, cid) = 1
           |)""".stripMargin)
      if (r < 3) sb.append(
        s""", c$r AS MATERIALIZED (
           |  SELECT a.cid, qd.dim,
           |    CAST((sum(qd.q) + 32768 * count(*)) // count(*) - 32768 AS BIGINT)
           |      AS v
           |  FROM a$r a JOIN qd USING (vec_id) GROUP BY 1, 2
           |)""".stripMargin)
    }
    sb.append(
      """
        |SELECT cid, count(*) AS n_members,
        |  CAST(sum(dist // 1048576) AS BIGINT) AS inertia_m
        |FROM a3 GROUP BY cid ORDER BY cid""".stripMargin)
    sb.toString
  }

  /** Shared PQ CTEs ending in `pbest(vec_id, m, k, dist)` — codebook
    * seeds by md5 rank, per-(vec,m,k) distance Σ(q−v)² over the
    * subspace dims (the same integer as the Spark side's
    * n_q + n_c − 2·dot decomposition), per-subspace argmin. */
  private def pqCtes: String =
    s"""qd AS MATERIALIZED (
       |  SELECT vec_id, i - 1 AS dim, qv[i] AS q
       |  FROM qe, LATERAL (SELECT unnest(generate_series(1, len(qv))) AS i) g
       |), psr AS (
       |  SELECT vec_id,
       |    CAST(row_number() OVER (ORDER BY hk, vec_id) - 1 AS BIGINT) AS k
       |  FROM (SELECT vec_id,
       |          md5_number_lower('pq-' || CAST(vec_id AS VARCHAR))
       |            % $ivfSeedMod AS hk
       |        FROM qe)
       |  QUALIFY row_number() OVER (ORDER BY hk, vec_id) <= 16
       |), pcb AS MATERIALIZED (
       |  SELECT s.k, qd.dim // 8 AS m, qd.dim % 8 AS j, qd.q AS v
       |  FROM psr s JOIN qd USING (vec_id)
       |), pdist AS MATERIALIZED (
       |  SELECT qd.vec_id, c.m, c.k,
       |    CAST(sum((qd.q - c.v) * (qd.q - c.v)) AS BIGINT) AS dist
       |  FROM qd JOIN pcb c ON c.m = qd.dim // 8 AND c.j = qd.dim % 8
       |  GROUP BY 1, 2, 3
       |), pbest AS (
       |  SELECT vec_id, m, k, dist FROM pdist
       |  QUALIFY row_number() OVER (PARTITION BY vec_id, m
       |    ORDER BY dist, k) = 1
       |)""".stripMargin

  val oracles: Map[String, String] = Map(
    "pq_encode" ->
      s"""WITH $oracleBaseCtes, $pqCtes
         |SELECT vec_id,
         |  CAST(sum(k << CAST(4 * m AS INT)) AS BIGINT) AS pq_code,
         |  CAST(sum(dist) AS BIGINT) AS qerr
         |FROM pbest GROUP BY vec_id ORDER BY vec_id""".stripMargin,
    // ADC replay: the LUT is pbest's OWN distance table restricted to
    // the 5 query vectors' subvectors; Σ LUT[m][nibble] generates 50
    // candidates per query, exact integer L2 (nv − 2·dot) re-ranks —
    // both ADC and truth tie-break on vec_id
    "pq_recall" ->
      s"""WITH $oracleBaseCtes, $pqCtes,
         |pcode AS MATERIALIZED (
         |  SELECT vec_id, CAST(sum(k << CAST(4 * m AS INT)) AS BIGINT)
         |    AS pq_code
         |  FROM pbest GROUP BY vec_id
         |), plut AS MATERIALIZED (
         |  SELECT s.vec_id AS q_id, c.m, c.k AS nib,
         |    CAST(sum((s.q - c.v) * (s.q - c.v)) AS BIGINT) AS lval
         |  FROM (SELECT vec_id, dim, q FROM qd WHERE vec_id < $nQueries) s
         |  JOIN pcb c ON c.m = s.dim // 8 AND c.j = s.dim % 8
         |  GROUP BY 1, 2, 3
         |), padc AS (
         |  SELECT l.q_id, p.vec_id, sum(l.lval) AS adist
         |  FROM pcode p
         |  CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS m) g
         |  JOIN plut l ON l.m = g.m
         |    AND l.nib = (p.pq_code >> CAST(4 * g.m AS INT)) & 15
         |  WHERE p.vec_id <> l.q_id
         |  GROUP BY 1, 2
         |), pcand AS (
         |  SELECT q_id, vec_id FROM padc
         |  QUALIFY row_number() OVER (PARTITION BY q_id
         |    ORDER BY adist, vec_id) <= 50
         |), ptop AS (
         |  SELECT q_id, vec_id FROM (
         |    SELECT cd.q_id, cd.vec_id,
         |      CAST(n.nv - 2 * list_dot_product(CAST(v.qv AS DOUBLE[]),
         |        CAST(q.qv AS DOUBLE[])) AS BIGINT) AS tdist
         |    FROM pcand cd
         |    JOIN qe v ON v.vec_id = cd.vec_id
         |    JOIN nrm n ON n.vec_id = cd.vec_id
         |    JOIN qe q ON q.vec_id = cd.q_id)
         |  QUALIFY row_number() OVER (PARTITION BY q_id
         |    ORDER BY tdist, vec_id) <= 5
         |), ptruth AS (
         |  SELECT q_id, vec_id FROM (
         |    SELECT q.vec_id AS q_id, v.vec_id,
         |      CAST(n.nv - 2 * list_dot_product(CAST(v.qv AS DOUBLE[]),
         |        CAST(q.qv AS DOUBLE[])) AS BIGINT) AS tdist
         |    FROM qe v
         |    JOIN nrm n ON n.vec_id = v.vec_id
         |    JOIN qe q ON q.vec_id < $nQueries AND v.vec_id <> q.vec_id)
         |  QUALIFY row_number() OVER (PARTITION BY q_id
         |    ORDER BY tdist, vec_id) <= 5
         |)
         |SELECT 'pq_adc' AS method, t.q_id,
         |  CAST(coalesce(sum(CASE WHEN a.vec_id IS NOT NULL
         |    THEN 1 END), 0) AS BIGINT) AS hits_at_5,
         |  CAST(5 AS BIGINT) AS k
         |FROM ptruth t LEFT JOIN ptop a
         |  ON a.q_id = t.q_id AND a.vec_id = t.vec_id
         |GROUP BY t.q_id ORDER BY t.q_id""".stripMargin,
    "sq8_error" ->
      s"""WITH $oracleBaseCtes,
         |qd AS (
         |  SELECT CAST(i - 1 AS INT) AS dim, qv[i] AS q
         |  FROM qe, LATERAL (SELECT unnest(generate_series(1, len(qv))) AS i) g
         |)
         |SELECT dim, count(*) AS n_vecs,
         |  CAST(sum(abs(q - (((q + $QScale) // 256) * 256 - $QScale)))
         |    AS BIGINT) AS sum_err,
         |  CAST(max(abs(q - (((q + $QScale) // 256) * 256 - $QScale)))
         |    AS BIGINT) AS max_err
         |FROM qd GROUP BY dim ORDER BY dim""".stripMargin,
    "kmeans_train" -> kmeansOracleSql,
    "mmr_diversify" -> mmrOracleSql,
    // cells re-derive through the shared ivfAssignCtes; the bitlen idf
    // is the lm/dsir log device at cell granularity
    "ctfidf_topics" ->
      s"""WITH $oracleBaseCtes, $ivfAssignCtes,
         |ctoks AS (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
         |), ctf AS (
         |  SELECT a.cell, t.word, count(*) AS tf
         |  FROM ctoks t JOIN icellof a ON a.vec_id = t.doc_id
         |  GROUP BY 1, 2
         |), cdfw AS (
         |  SELECT word, count(*) AS cdf FROM ctf GROUP BY word
         |), ctot AS (
         |  SELECT count(DISTINCT cell) AS n_cells FROM icellof
         |), cscored AS (
         |  SELECT f.cell, f.word, f.tf,
         |    f.tf * length(bin((c.n_cells + w.cdf) // w.cdf)) AS score
         |  FROM ctf f JOIN cdfw w USING (word), ctot c
         |), cranked AS (
         |  SELECT cell, word, tf, score,
         |    row_number() OVER (PARTITION BY cell ORDER BY score DESC, word) AS rn
         |  FROM cscored)
         |SELECT CAST(cell AS INT) AS cell, CAST(rn AS BIGINT) AS rn, word, tf,
         |  CAST(score AS BIGINT) AS score
         |FROM cranked WHERE rn <= 5 ORDER BY cell, rn""".stripMargin,
    "ivf_ann" ->
      s"""WITH $oracleBaseCtes, $ivfCtes
         |SELECT q_id, vec_id, score, CAST(rn AS BIGINT) AS rn
         |FROM iranked WHERE rn <= 5 ORDER BY q_id, rn""".stripMargin,
    "ivf_recall" ->
      s"""WITH $oracleBaseCtes, $bruteCtes, $ivfCtes,
         |truth AS (SELECT q_id, vec_id FROM branked WHERE rn <= 5),
         |approx5 AS (SELECT q_id, vec_id FROM iranked WHERE rn <= 5),
         |hits AS (
         |  SELECT t.q_id, count(a.vec_id) AS h
         |  FROM truth t LEFT JOIN approx5 a
         |    ON a.q_id = t.q_id AND a.vec_id = t.vec_id
         |  GROUP BY t.q_id)
         |SELECT 'ivf' AS method, q_id, CAST(h AS BIGINT) AS hits_at_5,
         |  CAST(5 AS BIGINT) AS k
         |FROM hits ORDER BY q_id""".stripMargin,
    "cosine_topk_brute" ->
      s"""WITH $oracleBaseCtes, $bruteCtes
         |SELECT q_id, vec_id, score, CAST(rn AS BIGINT) AS rn
         |FROM branked WHERE rn <= 10 ORDER BY q_id, rn""".stripMargin,
    // per-(label, half, dim) sums re-derived from the shared quantized
    // CTE; abs before the flooring div keeps both engines exact
    "embedding_drift" ->
      s"""WITH $oracleBaseCtes, ex AS (
         |  SELECT e.label, e.vec_id % 2 AS half, t.j, q.qv[t.j + 1] AS q
         |  FROM embeddings e JOIN qe q ON q.vec_id = e.vec_id,
         |    (SELECT unnest(range(64)) AS j) t
         |), sums AS (
         |  SELECT label, half, j, CAST(sum(q) AS BIGINT) AS sj
         |  FROM ex GROUP BY label, half, j
         |), ns AS (
         |  SELECT label, vec_id % 2 AS half, count(*) AS n
         |  FROM embeddings GROUP BY label, vec_id % 2
         |), wide AS (
         |  SELECT s.label, s.j,
         |    sum(CASE WHEN s.half = 0 THEN s.sj END) AS s0,
         |    sum(CASE WHEN s.half = 1 THEN s.sj END) AS s1,
         |    sum(CASE WHEN s.half = 0 THEN n.n END) AS n0,
         |    sum(CASE WHEN s.half = 1 THEN n.n END) AS n1
         |  FROM sums s JOIN ns n ON n.label = s.label AND n.half = s.half
         |  GROUP BY s.label, s.j
         |)
         |SELECT CAST(label AS BIGINT) AS label,
         |  CAST(max(n0) AS BIGINT) AS n_even,
         |  CAST(max(n1) AS BIGINT) AS n_odd,
         |  CAST(sum(abs(n1 * s0 - n0 * s1) // (n0 * n1)) AS BIGINT)
         |    AS drift_q
         |FROM wide GROUP BY label ORDER BY label""".stripMargin,
    // brute scorer + the label anti-predicate inside the pair CTE
    "hard_negatives" ->
      s"""WITH $oracleBaseCtes, $hardNegBruteCtes
         |SELECT q_id, vec_id, CAST(label AS BIGINT) AS label, score,
         |  CAST(rn AS BIGINT) AS rn
         |FROM hranked WHERE rn <= 3 ORDER BY q_id, rn""".stripMargin,
    // the IVF swap-in: same probe/assignment CTEs as ivf_ann, the
    // label anti-predicate on the candidate re-rank
    "hard_negatives_ann" ->
      s"""WITH $oracleBaseCtes, $ivfCtes, $hardNegAnnCtes
         |SELECT q_id, vec_id, CAST(label AS BIGINT) AS label, score,
         |  CAST(rn AS BIGINT) AS rn
         |FROM haranked WHERE rn <= 3 ORDER BY q_id, rn""".stripMargin,
    "hard_negatives_recall" ->
      s"""WITH $oracleBaseCtes, $hardNegBruteCtes, $ivfCtes, $hardNegAnnCtes,
         |htruth AS (SELECT q_id, vec_id FROM hranked WHERE rn <= 3),
         |happrox AS (SELECT q_id, vec_id FROM haranked WHERE rn <= 3),
         |hhits AS (
         |  SELECT t.q_id, count(a.vec_id) AS h
         |  FROM htruth t LEFT JOIN happrox a
         |    ON a.q_id = t.q_id AND a.vec_id = t.vec_id
         |  GROUP BY t.q_id)
         |SELECT 'hard_neg_ivf' AS method, q_id, CAST(h AS BIGINT) AS hits_at_3,
         |  CAST(3 AS BIGINT) AS k
         |FROM hhits ORDER BY q_id""".stripMargin,
    // sparse side re-derives through TextQueries' shared BM25 CTEs,
    // dense side through the same quantized-score SQL as the brute
    // ranking — neither scorer has a second definition anywhere
    "rrf_fusion" ->
      s"""WITH $oracleBaseCtes, ${TextQueries.bm25OracleCtes},
         |dpairs AS (
         |  SELECT c.vec_id,
         |    CAST(list_dot_product(CAST(q.qv AS DOUBLE[]), CAST(c.qv AS DOUBLE[])) AS BIGINT) AS dot,
         |    n.nv
         |  FROM qe q JOIN qe c ON q.vec_id = 0 AND c.vec_id <> 0
         |  JOIN nrm n ON n.vec_id = c.vec_id
         |), dscored AS (
         |  SELECT vec_id, $scoreSqlDuck AS score FROM dpairs
         |), dranked AS (
         |  SELECT vec_id AS doc_id,
         |    row_number() OVER (ORDER BY score DESC, vec_id) AS dense_rank
         |  FROM dscored
         |), dtop AS (
         |  SELECT doc_id, CAST(dense_rank AS BIGINT) AS dense_rank
         |  FROM dranked WHERE dense_rank <= 50
         |), sranked AS (
         |  SELECT doc_id,
         |    row_number() OVER (ORDER BY score DESC, doc_id) AS sparse_rank
         |  FROM bmdoc
         |), stop AS (
         |  SELECT doc_id, CAST(sparse_rank AS BIGINT) AS sparse_rank
         |  FROM sranked WHERE sparse_rank <= 50
         |)
         |SELECT COALESCE(s.doc_id, d.doc_id) AS doc_id,
         |  s.sparse_rank, d.dense_rank,
         |  CAST(COALESCE(1000000 // (60 + s.sparse_rank), 0) +
         |    COALESCE(1000000 // (60 + d.dense_rank), 0) AS BIGINT) AS rrf_milli
         |FROM stop s FULL JOIN dtop d ON s.doc_id = d.doc_id
         |ORDER BY rrf_milli DESC, doc_id LIMIT 20""".stripMargin,
    "ann_lsh" ->
      s"""WITH $oracleBaseCtes, $lshCtes
         |SELECT q_id, vec_id, score, CAST(rn AS BIGINT) AS rn
         |FROM lranked WHERE rn <= 5 ORDER BY q_id, rn""".stripMargin,
    "ann_recall" ->
      s"""WITH $oracleBaseCtes, $bruteCtes, $lshCtes,
         |truth AS (SELECT q_id, vec_id FROM branked WHERE rn <= 5),
         |approx5 AS (SELECT q_id, vec_id FROM lranked WHERE rn <= 5),
         |hits AS (
         |  SELECT t.q_id, count(a.vec_id) AS h
         |  FROM truth t LEFT JOIN approx5 a
         |    ON a.q_id = t.q_id AND a.vec_id = t.vec_id
         |  GROUP BY t.q_id)
         |SELECT 'lsh' AS method, q_id, CAST(h AS BIGINT) AS hits_at_5,
         |  CAST(5 AS BIGINT) AS k
         |FROM hits ORDER BY q_id""".stripMargin,
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
    // cells re-derive through the SAME md5-medoid CTEs as ivf_ann; the
    // within-cell cosine threshold shares dedup_embedding's 1e-3 margin
    // guarantee, so membership can't flip on float noise
    "semdedup" ->
      s"""WITH $oracleBaseCtes, $ivfAssignCtes,
         |spairs AS (
         |  SELECT ca.vec_id AS va, cb.vec_id AS vb
         |  FROM icellof ca JOIN icellof cb
         |    ON ca.cell = cb.cell AND ca.vec_id < cb.vec_id
         |  JOIN embeddings a ON a.vec_id = ca.vec_id
         |  JOIN embeddings b ON b.vec_id = cb.vec_id
         |  WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
         |                               CAST(b.embedding AS DOUBLE[])) >= 0.5
         |), spruned AS (
         |  SELECT vb AS vec_id, min(va) AS pruned_by FROM spairs GROUP BY vb
         |)
         |SELECT c.vec_id, CAST(c.cell AS INT) AS cell,
         |  p.pruned_by IS NULL AS keep, p.pruned_by
         |FROM icellof c LEFT JOIN spruned p USING (vec_id)
         |ORDER BY c.vec_id""".stripMargin,
    "knn_classify" ->
      s"""WITH $oracleBaseCtes, $bruteCtes,
         |nb AS (SELECT q_id, vec_id FROM branked WHERE rn <= 5),
         |votes AS (
         |  SELECT nb.q_id, e.label, count(*) AS votes
         |  FROM nb JOIN embeddings e USING (vec_id)
         |  GROUP BY nb.q_id, e.label
         |), pred AS (
         |  SELECT q_id, label AS predicted, votes FROM (
         |    SELECT q_id, label, votes,
         |      row_number() OVER (PARTITION BY q_id
         |        ORDER BY votes DESC, label) AS rn
         |    FROM votes) WHERE rn = 1
         |)
         |SELECT p.q_id, p.predicted, CAST(p.votes AS BIGINT) AS votes,
         |  a.label AS actual, p.predicted = a.label AS correct
         |FROM pred p JOIN embeddings a ON a.vec_id = p.q_id
         |ORDER BY p.q_id""".stripMargin,
    "cluster_cap_sample" ->
      s"""WITH $oracleBaseCtes, $ivfAssignCtes,
         |ranked AS (
         |  SELECT vec_id, cell,
         |    count(*) OVER (PARTITION BY cell) AS cell_size,
         |    row_number() OVER (PARTITION BY cell
         |      ORDER BY (vec_id * 2654435761) % 1000000, vec_id) AS rank
         |  FROM icellof)
         |SELECT vec_id, CAST(cell AS INT) AS cell,
         |  CAST(cell_size AS BIGINT) AS cell_size, CAST(rank AS BIGINT) AS rank,
         |  rank <= 8 AS kept
         |FROM ranked ORDER BY vec_id""".stripMargin,
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
