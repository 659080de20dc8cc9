package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** LLM-data-pipeline text operators over `documents` (BASELINE.json
  * north_star; SURVEY.md §2.C): exact + near dedup, text analysis,
  * fingerprinting, multimodal-column plumbing.
  *
  * Scale notes (the 100 TB shapes):
  *  - exact dedup = hash groupBy, one shuffle on the dedup key;
  *  - n-gram Jaccard generates candidates by shingle join — exact but
  *    quadratic in bucket size, so it is the *verifier*; MinHash-LSH
  *    ([[qMinhashDedup]]) is the candidate *generator* at scale: k=16
  *    hashes, 4 bands × 4 rows, pairs only within equal band buckets;
  *  - SimHash gives hamming-ball near-dup for short docs with one
  *    shuffle on 16-bit bands.
  * Round-11: MinHash and SimHash are seated on MD5-derived hashes
  * (RFC 1321; DuckDB's md5_number_lower/upper compute the identical
  * values), so the whole dedup family — like everything else here —
  * is verified by exact DuckDB oracles.
  */
object TextQueries {
  import Tables._

  /** Exact dedup via group-by on the full text: keeper = min doc_id. */
  def qDedupExact(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .groupBy(col("text"))
      .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_copies"))
      .select(col("keeper"), col("n_copies"))
      .orderBy(col("keeper"))

  private def wordsCol: Column = split(col("text"), " ")

  /** Distinct 3-gram word shingles per doc, one row per (doc_id, s).
    * A typed flatMap: shingling is per-row-parallel, so one narrow
    * stage with NO shuffle — the round-1 posexplode + window-lead
    * formulation shuffled and sorted every token by doc_id, and an
    * earlier transform/array_distinct HOF draft was ~10× slower still
    * (interpreted, quadratic distinct). Per-doc dedup is a local Set.
    * split(" ", -1) keeps trailing empty tokens — Spark's split() and
    * DuckDB's string_split both keep them, and the oracle depends on
    * identical tokenization. */
  private[queries] def shingleRows(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // unsplittable one-task scan + CPU-heavy per-row shingling: spread
    // across the cores first (guide §2.5; no-op on a well-split input)
    Tables.spread(df.select(col("doc_id").cast("long"), col("text")))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        // null text ≡ no shingles (the SQL split() formulation this
        // replaced propagated null and dropped the row at explode)
        val ws = if (text == null) Array.empty[String] else text.split(" ", -1)
        if (ws.length < 3) Iterator.empty
        else {
          val seen = new scala.collection.mutable.HashSet[String]
          (0 to ws.length - 3).iterator
            .map(i => s"${ws(i)} ${ws(i + 1)} ${ws(i + 2)}")
            .filter(seen.add)
            .map(s => (id, s))
        }
      }
      .toDF("doc_id", "s")
  }

  /** Temperature-flattened source mixture (the multilingual-T5 /
    * UniMax sampling rule at T = 2): mixing weight ∝ √(natural share),
    * boosting low-resource sources without letting any source dominate.
    * Exact integers throughout via a CORRECTED integer sqrt: s₀ =
    * ⌊sqrt(x)⌋ through doubles (IEEE sqrt is correctly rounded in both
    * engines, so s₀ is within ±1 of truth), then one CASE clamps to the
    * true isqrt — (s₀+1)² ≤ x → s₀+1; s₀² > x → s₀−1 — making the
    * device exact REGARDLESS of float rounding. Shares scale ×10⁸ so
    * the sqrt carries 4 exact decimal digits.
    *
    * Scale shape: one map-side-combined source rollup; everything after
    * runs on the #sources-row table (empty-frame windows over ~20
    * rows). The weights then drive the same cross-multiplied keep test
    * as `data_mixture`. */
  def qDataMixtureTemperature(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val all = Window.partitionBy()
    documents(s, d).groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
      .withColumn("total", sum(col("n_docs")).over(all))
      .withColumn("x", expr("(n_docs * 100000000) div total"))
      .withColumn("s0", floor(sqrt(col("x").cast("double"))).cast("long"))
      .withColumn("w_sqrt", expr(
        "CASE WHEN (s0+1)*(s0+1) <= x THEN s0+1 WHEN s0*s0 > x THEN s0-1 ELSE s0 END"))
      .withColumn("w_total", sum(col("w_sqrt")).over(all))
      .select(col("source"), col("n_docs"),
        col("w_sqrt"), expr("(1000 * w_sqrt) div w_total").as("mix_permille"))
      .orderBy(col("source"))
  }

  /** Source-balance Gini coefficient over per-source token mass — the
    * one-number answer to "how skewed is my corpus mix" that mixture
    * reports (data_mixture, the temperature variant) are judged by.
    * Gini = Σᵢⱼ|xᵢ−xⱼ| / (2n²·mean) = Σᵢⱼ|xᵢ−xⱼ| / (2n·Σx), emitted as
    * an exact integer permyriad.
    *
    * Scale shape: ONE corpus pass (map-side-combined per-source token
    * rollup); the |xᵢ−xⱼ| double sum runs on the #sources×#sources
    * self-join of a 20-row broadcast table — the corpus is never
    * touched again. */
  def qSourceBalanceGini(s: SparkSession, d: String): DataFrame = {
    val counts = documents(s, d)
      .select(col("source"), size(wordsCol).cast("long").as("n"))
      .groupBy(col("source")).agg(sum(col("n")).as("toks"))
    val a = counts.select(col("toks").as("xa"))
    val b = counts.select(col("toks").as("xb"))
    val pairSum = a.crossJoin(broadcast(b))
      .agg(sum(abs(col("xa") - col("xb"))).as("diff_sum"))
    val tot = counts.agg(count(lit(1)).as("n_sources"), sum(col("toks")).as("total_tokens"))
    pairSum.crossJoin(broadcast(tot))
      .select(col("n_sources"), col("total_tokens"),
        expr("(10000 * diff_sum) div (2 * n_sources * total_tokens)")
          .as("gini_permyriad"))
  }

  /** Bloom-filter incremental dedup — the Dolma-"BFF" / CCNet-hash
    * shape: new crawl batches are screened against a CONSTANT-SIZE
    * bitmap of everything already ingested, without ever joining
    * against the historical corpus. Reference partition = sources
    * src0..src9, incoming = src10..src19; the filter holds every
    * reference 3-gram shingle under k=3 double-hashed MD5 positions
    * (pos_i = (a + i·b) mod m, a = md5_lower mod m, b = md5_upper
    * mod m — the MinHash oracle's seed family, so DuckDB reconstructs
    * every bit), and each incoming doc reports how much of it the
    * filter has already seen, flagging ≥ 50% overlap.
    *
    * False positives are PART OF THE OPERATOR's semantics (that is the
    * bloom trade) and are deterministic under the MD5 family, so the
    * oracle reproduces them exactly.
    *
    * Scale shape: the bitmap is m = 2²² bits = 512 KiB regardless of
    * corpus size — built by one map-side-combined `bit_or` aggregate
    * (m/64 = 65k words reach the driver, the sketch-merge pattern),
    * broadcast once; the incoming side is one narrow scan testing bits
    * locally plus a doc-keyed rollup. No shuffle touches the reference
    * corpus. At 100 TB the same plan holds with m sized to the shingle
    * cardinality (2³³ bits = 1 GiB still broadcasts). */
  def qBloomDedup(s: SparkSession, d: String): DataFrame = {
    val spark0 = s
    import spark0.implicits._
    val m = 1 << 22
    val srcNum = substring(col("source"), 4, 8).cast("int")
    val docs = documents(s, d)
    // reference partition → distinct bit positions → 64-bit words
    val refWords = shingleRows(docs.filter(srcNum < 10))
      .as[(Long, String)]
      .mapPartitions { it =>
        val memo = new Md5Memo()
        it.flatMap { case (_, sh) =>
          val (lo, hi) = memo(sh)
          val a = java.lang.Long.remainderUnsigned(lo, m)
          val b = java.lang.Long.remainderUnsigned(hi, m)
          (0 until 3).iterator.map(i => (a + i * b) % m)
        }
      }
      .toDF("pos")
      .groupBy(expr("pos div 64").as("w"))
      .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT)))").as("bits"))
      .collect() // bounded by m/64 words — the driver-side sketch merge
    val bitmap = new Array[Long](m / 64)
    refWords.foreach(r => bitmap(r.getLong(0).toInt) = r.getLong(1))
    val bc = s.sparkContext.broadcast(bitmap)
    shingleRows(docs.filter(srcNum >= 10))
      .as[(Long, String)]
      .mapPartitions { it =>
        val memo = new Md5Memo()
        val bm = bc.value
        it.map { case (id, sh) =>
          val (lo, hi) = memo(sh)
          val a = java.lang.Long.remainderUnsigned(lo, m)
          val b = java.lang.Long.remainderUnsigned(hi, m)
          var hit = 1
          var i = 0
          while (i < 3 && hit == 1) {
            val pos = (a + i * b) % m
            if ((bm((pos >> 6).toInt) & (1L << (pos & 63))) == 0L) hit = 0
            i += 1
          }
          (id, hit)
        }
      }
      .toDF("doc_id", "hit")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"), sum(col("hit")).as("n_seen"))
      .select(col("doc_id"), col("n_shingles"), col("n_seen"),
        expr("(10000 * n_seen) div n_shingles").as("seen_permyriad"),
        expr("(10000 * n_seen) div n_shingles >= 5000").as("maybe_dup"))
      .orderBy(col("doc_id"))
  }

  /** Exact n-gram Jaccard near-dup pairs (threshold 0.5) via the full
    * AllPairs/PPJoin filter stack, all provably LOSSLESS for J ≥ t so
    * the result is identical to the naive all-pairs shingle join (the
    * DuckDB oracle stays the naive formulation):
    *
    *  1. DICTIONARY-ENCODE shingles to dense int ids ordered by global
    *     document frequency (rarest first) — every later stage moves
    *     and intersects int arrays, not ~18-char strings (the string
    *     formulation hauled ~100 strings per candidate row through the
    *     verify join; under heap pressure that GC-thrashed a full-corpus
    *     bench run to 65 s for this one query).
    *  2. PREFIX FILTER: per doc keep the first |S| - ceil(t·|S|) + 1
    *     ids; J(A,B) ≥ t forces the two prefixes to share an id, and
    *     hot shingles land in suffixes — no quadratic blowup on common
    *     3-grams (the naive join was 88 s at sf0.1; one shared shingle
    *     across k docs → k² candidate rows).
    *  3. SIZE FILTER (AllPairs): J ≥ 1/2 forces max(|A|,|B|) ≤ 2·min —
    *     integer-exact (a float t·|B| bound could round the wrong way
    *     and silently drop true pairs).
    *  4. POSITIONAL FILTER (PPJoin): a match at prefix positions
    *     (pa, pb) bounds the overlap by 1 + min(za-pa-1, zb-pb-1),
    *     which must reach the minimal intersection n ≥ (za+zb)/3
    *     (n/(za+zb-n) ≥ 1/2 ⇔ 3n ≥ za+zb) — again integer-exact.
    *     Lossless because a true pair's FIRST shared prefix id always
    *     satisfies the bound.
    *
    * Exact Jaccard is then computed only on surviving candidates with
    * array_intersect over the full per-doc id arrays.
    *
    * The (da, db, jaccard) pair table is an INGEST ARTIFACT memoized
    * per (session, corpus) — like the LSH signature table and the IVF
    * inverted file, it is built once and consumed by every downstream
    * query ([[qNgramJaccard]] reports it, [[qDedupClusters]] iterates
    * on it). At 100 TB the pair graph is written alongside the corpus
    * at ingest; re-deriving the most expensive subplan in the engine
    * inside every query that touches near-dups ran the full pipeline
    * twice per bench. The heavy intermediates (dictionary, per-doc id
    * arrays) are freed once the tiny pair table materializes. */
  private val pairMemo = new SessionMemo[DataFrame]()

  /** Public setup hook for [[Corpus.prepare]]. */
  def prepareJaccardPairs(s: SparkSession, d: String): Unit = { jaccardPairs(s, d); () }

  private[queries] val jaccardBuilds = new java.util.concurrent.atomic.AtomicInteger

  /** Session-memoized + cross-session persisted (the IVF reattach
    * contract — see SimilarityQueries.ensureIvfIndex): a fresh driver
    * reattaches the pair artifact from its IndexStore descriptor
    * instead of re-running the shingle/prefix-filter/verify pipeline. */
  private def jaccardPairs(s: SparkSession, d: String): DataFrame =
    pairMemo.getOrBuild(s, d) {
      IndexStore.load(s, d, "jaccard_pairs", Seq("documents"),
          "jaccard-pairs-v1", Seq("pairs")) match {
        case Some((loaded, _)) =>
          val p = loaded("pairs")
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          p.count(); p
        case None =>
          jaccardBuilds.incrementAndGet()
          val (pairs, intermediates) = buildJaccardPairs(s, d)
          val p = pairs.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          p.count() // materialize before releasing the build-time caches
          intermediates.foreach(_.unpersist(blocking = false))
          IndexStore.save(s, d, "jaccard_pairs", Seq("documents"),
            "jaccard-pairs-v1", Map("pairs" -> p))
          p
      }
    }

  private def buildJaccardPairs(s: SparkSession, d: String): (DataFrame, Seq[DataFrame]) = {
    val t = 0.5
    val spark0 = s
    import spark0.implicits._
    val sh = shingleRows(documents(s, d))
    // Dense rarest-first ids for the vocabulary WITHOUT a global window
    // (row_number over an unpartitioned Window pulls every distinct
    // shingle through ONE task — fine at 27k, a single-core bottleneck
    // on a billion-term 100 TB vocabulary): range-partition + local sort
    // gives a globally sorted partition sequence, and zipWithIndex
    // assigns contiguous ids across partitions with one extra size-count
    // job — the standard distributed dense-rank.
    // persisted: zipWithIndex already ran one eager partition-size job
    // over the vocabulary pipeline; without the persist the dict's whole
    // lineage (shingle + groupBy + range sort) re-runs when docs
    // materializes
    val dict = (sh.groupBy(col("s")).agg(count(lit(1)).as("df"))
      .repartitionByRange(col("df"), col("s"))
      .sortWithinPartitions(col("df"), col("s"))
      .select(col("s"), col("df")).as[(String, Long)]
      .rdd.zipWithIndex()
      .map { case ((shingle, _), i) => (shingle, i + 1) }
      .toDF("s", "sid")
      .persist())
    // ONE per-doc aggregation yields everything downstream needs:
    // sort_array on the rarest-first ids = the global prefix order,
    // the set size, and the prefix slice
    val docs = (sh.join(dict, "s")
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("sid"))).as("ss"))
      .select(col("doc_id"), col("ss"),
        size(col("ss")).cast("long").as("sz"),
        expr(s"slice(ss, 1, size(ss) - CAST(ceil(size(ss) * $t) AS INT) + 1)").as("prefix"))
      .persist())
    val prefix = docs.select(col("doc_id"), col("sz"),
      posexplode(col("prefix")).as(Seq("pos", "sid")))
    val cand = prefix
      .select(col("doc_id").as("da"), col("sz").as("za"), col("pos").as("pa"), col("sid"))
      .join(prefix
        .select(col("doc_id").as("db"), col("sz").as("zb"), col("pos").as("pb"), col("sid")), "sid")
      .filter(col("da") < col("db"))
      // size filter: J ≥ 1/2 ⇒ greatest ≤ 2·least (t = 0.5 kept exact
      // in integers; a parameterized float bound needs an epsilon guard)
      .filter(greatest(col("za"), col("zb")) <= lit(2) * least(col("za"), col("zb")))
      // positional filter: 3·(1 + min(za-pa-1, zb-pb-1)) ≥ za+zb
      .filter(lit(3) * (lit(1) + least(col("za") - col("pa") - 1, col("zb") - col("pb") - 1))
        >= col("za") + col("zb"))
      .select(col("da"), col("db")).distinct()
    val pairs = cand
      .join(docs.select(col("doc_id").as("da"), col("ss").as("sa"), col("sz").as("za")), "da")
      .join(docs.select(col("doc_id").as("db"), col("ss").as("sb"), col("sz").as("zb")), "db")
      .withColumn("n", size(array_intersect(col("sa"), col("sb"))).cast("long"))
      .filter(col("n") / (col("za") + col("zb") - col("n")) >= t)
      .select(col("da"), col("db"),
        round(col("n") / (col("za") + col("zb") - col("n")), 4).as("jaccard"))
    (pairs, Seq(docs, dict))
  }

  /** Near-dup pairs as a query: reads the ingest pair artifact. */
  def qNgramJaccard(s: SparkSession, d: String): DataFrame =
    jaccardPairs(s, d).orderBy(col("da"), col("db"))

  /** Near-dup CLUSTERS from the Jaccard pair graph: connected
    * components via min-label propagation, keeper = smallest doc_id in
    * the component — the step a real dedup pipeline runs AFTER pair
    * generation (pairs alone don't say which copies to drop when dups
    * chain A~B~C). The loop is driver-coordinated Pregel shape: each
    * round one join + one aggregation, terminating when no label moves;
    * rounds needed = component diameter (dup chains are short), and
    * each round's shuffle is proportional to the EDGE set, not the
    * corpus — the scalable component algorithm on a 1000-executor
    * cluster. The driver only ever sees one convergence count per
    * round, never data. */
  def qDedupClusters(s: SparkSession, d: String): DataFrame =
    // reads the memoized ingest artifact — the pair pipeline no longer
    // re-runs inside every invocation of this query; the label
    // machinery (size-gated union-find / distributed min-label
    // propagation) lives in [[ConnectedComponents]], shared with the
    // modal dedups' clusters escape
    ConnectedComponents.labels(s, jaccardPairs(s, d).select(col("da"), col("db")))

  /** The dedup loop CLOSED: near-dup clusters (qDedupClusters' exact
    * min-representative labeling) applied back to the corpus as a
    * retention policy — each cluster keeps its minimum doc_id, every
    * other member drops, unclustered docs keep. Per-source rollup of
    * what survived (the actionable summary a curation pipeline reads
    * before materializing the kept corpus; the kept SET itself is the
    * same join minus the rollup). The labels artifact holds only docs
    * with at least one near-dup — typically a small fraction of the
    * corpus — and the join is keyed on doc_id; AQE broadcasts it when
    * it fits, falls back to a shuffle join when a duplicate-heavy
    * corpus grows it (no forced-broadcast cliff at 100 TB). */
  def qDedupRetention(s: SparkSession, d: String): DataFrame = {
    val labels = qDedupClusters(s, d).select(col("doc_id"), col("cluster_id"))
    documents(s, d).select(col("doc_id"), col("source"), col("n_chars"))
      .join(labels, Seq("doc_id"), "left")
      .withColumn("keep",
        col("cluster_id").isNull || col("cluster_id") === col("doc_id"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("kept_docs"),
        sum(when(!col("keep"), col("n_chars")).otherwise(0L)).as("dropped_chars"))
      .orderBy(col("source"))
  }

  /** Deterministic train/validation/test split: a multiplicative hash
    * on doc_id (Knuth constant), NOT engine hash functions — the split
    * must be reproducible across engines and runs (the oracle computes
    * the identical arithmetic), and must not shuffle: one narrow
    * projection + one small aggregation. */
  def qTrainTestSplit(s: SparkSession, d: String): DataFrame = {
    val bucket = pmod(col("doc_id") * lit(2654435761L), lit(1000L))
    documents(s, d)
      .select(col("doc_id"), col("n_chars"),
        when(bucket < 800, "train").when(bucket < 900, "valid")
          .otherwise("test").as("split"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        round(avg(col("n_chars")), 4).as("avg_chars"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"))
      .orderBy(col("split"))
  }

  /** Top-25 word bigrams with occurrence counts (not per-doc distinct):
    * the n-gram count table tokenizer/LM training starts from. One
    * narrow flatMap then one count shuffle. */
  def qBigramCounts(s: SparkSession, d: String): DataFrame = {
    val spark = s
    import spark.implicits._
    documents(s, d).select(col("text")).as[String]
      .flatMap { text =>
        val ws = if (text == null) Array.empty[String] else text.split(" ", -1)
        (0 until ws.length - 1).iterator.map(i => s"${ws(i)} ${ws(i + 1)}")
      }
      .toDF("bigram")
      .groupBy(col("bigram")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("bigram"))
      .limit(25)
  }

  /** Engine-independent 64-bit hash pair from MD5, bit-identical to
    * DuckDB 1.0's `md5_number_lower`/`md5_number_upper`: the last /
    * first 8 digest bytes read little-endian as an unsigned 64-bit
    * value (held in a Long's bit pattern). MD5 is a published standard
    * (RFC 1321), so the oracle reconstructs the identical value —
    * unlike xxhash64/murmur whose seed/variant are engine-private.
    * Used for dedup hashing only, never security. */
  private[queries] def md5Pair(md: java.security.MessageDigest, s: String): (Long, Long) = {
    md.reset()
    val dg = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var lo = 0L
    var hi = 0L
    var i = 15
    while (i >= 8) { lo = (lo << 8) | (dg(i) & 0xffL); i -= 1 }
    i = 7
    while (i >= 0) { hi = (hi << 8) | (dg(i) & 0xffL); i -= 1 }
    (lo, hi)
  }

  /** Driver-side convenience over [[md5Pair]] for small constant
    * universes (e.g. the LSH hyperplane sign matrix) — allocates a
    * digest per call, so keep it off per-row paths. */
  private[queries] def md5LowerOf(s: String): Long =
    md5Pair(java.security.MessageDigest.getInstance("MD5"), s)._1

  /** Per-partition memo over [[md5Pair]]: corpus tokens repeat heavily
    * (vocabulary ≪ occurrences — ~27k distinct words/shingles against
    * ~1.5M occurrences at sf0.1), so caching the pure hash cuts MD5
    * calls ~50× in the simhash word stage. The 64k-entry cap bounds
    * the WORST-case retained heap to a few MB per running task even
    * with long tokens (URLs/IDs as "words") — many concurrent tasks
    * per executor multiply whatever this pins — while still covering
    * a natural-language vocabulary; past it, hashing proceeds
    * uncached. */
  private final class Md5Memo(limit: Int = 1 << 16) {
    private val md = java.security.MessageDigest.getInstance("MD5")
    private val cache = new java.util.HashMap[String, (Long, Long)]()
    def apply(s: String): (Long, Long) = {
      val hit = cache.get(s)
      if (hit != null) hit
      else {
        val v = md5Pair(md, s)
        if (cache.size < limit) cache.put(s, v)
        v
      }
    }
  }

  /** MinHash + LSH banding (k=16 hashes, 4 bands of 4): near-dup
    * candidates with estimated similarity ≥ 0.5.
    *
    * Round-11: re-seated on an ENGINE-INDEPENDENT hash family so the
    * DuckDB oracle reconstructs the exact signatures (this was a
    * rows-only entry while it used xxhash64). Per shingle, two base
    * values a = md5_lower mod p and b = md5_upper mod p (p = 2^31-1),
    * then the classic double-hashing family h_i = (a + i·b) mod p —
    * every intermediate stays below 2^36, exact BIGINT range in both
    * engines. The signature is the per-doc min of each h_i (ONE
    * map-side-combined shuffle); candidates share a band of 4
    * consecutive signature slots (join on the concatenated band key,
    * no engine hash involved); est_sim = matching slots / 16, whose
    * values are exact multiples of 1/16 so the rounded doubles match
    * bit-for-bit across engines. */
  /** Signatures + banded candidates shared by [[qMinhashDedup]] and
    * [[qMinhashAccuracy]] — one copy of the k=16 double-hash family. */
  private def minhashSigCands(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val k = 16
    val p = 2147483647L
    val spark0 = s
    import spark0.implicits._
    // layered on the SAME shingle stage the jaccard family uses — the
    // oracles of both depend on identical tokenization, so there is
    // exactly one copy of it; the md5 stage maps over its rows in the
    // same narrow stage (no shuffle between them)
    val hashed = shingleRows(documents(s, d))
      .as[(Long, String)]
      .mapPartitions { it =>
        val memo = new Md5Memo()
        it.map { case (id, sh) =>
          val (lo, hi) = memo(sh)
          (id, java.lang.Long.remainderUnsigned(lo, p),
            java.lang.Long.remainderUnsigned(hi, p))
        }
      }
      .toDF("doc_id", "a", "b")
    val aggs = (0 until k).map(i =>
      min((col("a") + lit(i.toLong) * col("b")) % lit(p)).as(s"h$i"))
    val sigs = hashed.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
    val bands = sigs.select(col("doc_id"),
      posexplode(array((0 until 4).map(bnd =>
        concat_ws("_", (0 until 4).map(j => col(s"h${bnd * 4 + j}")): _*)): _*))
        .as(Seq("band", "bucket")))
    val cand = bands.select(col("band"), col("bucket"), col("doc_id").as("da"))
      .join(bands.select(col("band"), col("bucket"), col("doc_id").as("db")),
        Seq("band", "bucket"))
      .filter(col("da") < col("db"))
      .select(col("da"), col("db")).distinct()
    (sigs, cand)
  }

  def qMinhashDedup(s: SparkSession, d: String): DataFrame = {
    val k = 16
    val (sigs, cand) = minhashSigCands(s, d)
    val sa = sigs.toDF(("da" +: (0 until k).map(i => s"sa$i")): _*)
    val sb = sigs.toDF(("db" +: (0 until k).map(i => s"sb$i")): _*)
    val matches = (0 until k)
      .map(i => when(col(s"sa$i") === col(s"sb$i"), 1).otherwise(0))
      .reduce(_ + _)
    cand.join(sa, "da").join(sb, "db")
      .select(col("da"), col("db"), (matches / lit(k.toDouble)).as("raw"))
      .filter(col("raw") >= 0.5)
      .select(col("da"), col("db"), round(col("raw"), 4).as("est_sim"))
      .orderBy(col("da"), col("db"))
  }

  /** MinHash estimator-accuracy audit (round 13) — the QA report behind
    * trusting dedup_minhash's threshold: for EVERY banded candidate
    * pair, |estimated − exact| Jaccard in exact permille, rolled into
    * 50-permille error buckets (est = 1000·matching-slots div 16; exact
    * from the same shingle sets the jaccard family uses). Scale shape:
    * intersections are computed ONLY for banded candidates (the bounded
    * set the dedup already materializes) via one shingle-keyed join —
    * never all-pairs; output is ≤ 21 buckets. */
  def qMinhashAccuracy(s: SparkSession, d: String): DataFrame = {
    val k = 16
    val (sigs, cand0) = minhashSigCands(s, d)
    val cand = QueryCaches.track(cand0.persist())
    val sa = sigs.toDF(("da" +: (0 until k).map(i => s"sa$i")): _*)
    val sb = sigs.toDF(("db" +: (0 until k).map(i => s"sb$i")): _*)
    val matches = (0 until k)
      .map(i => when(col(s"sa$i") === col(s"sb$i"), 1L).otherwise(0L))
      .reduce(_ + _)
    val est = cand.join(sa, "da").join(sb, "db")
      .select(col("da"), col("db"), matches.as("m"))
      .withColumn("est_pm", expr("(1000 * m) div 16"))
    val sh = QueryCaches.track(shingleRows(documents(s, d)).persist())
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = cand
      .join(sh.select(col("doc_id").as("da"), col("s")), "da")
      .join(sh.select(col("doc_id").as("db"), col("s")), Seq("db", "s"))
      .groupBy(col("da"), col("db")).agg(count(lit(1)).as("ni"))
    est.join(inter, Seq("da", "db"), "left_outer")
      .join(sizes.select(col("doc_id").as("da"), col("n").as("na")), "da")
      .join(sizes.select(col("doc_id").as("db"), col("n").as("nb")), "db")
      .withColumn("jac_pm",
        expr("(1000 * coalesce(ni, 0)) div (na + nb - coalesce(ni, 0))"))
      .withColumn("err", abs(col("est_pm") - col("jac_pm")))
      .groupBy(expr("err div 50").as("err_bucket"))
      .agg(count(lit(1)).as("n_pairs"),
        min(col("err")).as("min_err"), max(col("err")).as("max_err"))
      .orderBy(col("err_bucket"))
  }

  /** SimHash (64-bit) near-dup: hamming distance ≤ 3 via 4×16-bit band
    * candidate generation + exact bit_count check.
    * (32 bits at hamming ≤ 4 produced ~600k pairs on the shared-vocab
    * corpus — the wider hash restores discrimination.)
    *
    * The per-doc simhash is ONE narrow map stage: hash each distinct
    * word, fold ±1 into 64 local counters, emit the sign bits — zero
    * shuffles and zero intermediate rows. The round-1 formulation
    * exploded 64 rows per (doc, word) — ~16M rows through two shuffles
    * at sf0.1 — to express exactly this local arithmetic.
    *
    * Round-11: word hash switched XXH64 → MD5-lower-64 ([[md5Pair]]),
    * the exact value of DuckDB's md5_number_lower, so the oracle
    * reconstructs every signature and this entry graduates from
    * rows-only to full hash-match. Bit quality is at least as good
    * (cryptographic vs non-crypto mixer; the earlier doubled-murmur32
    * experiment showed correlated halves destroy sign-vote bits, so
    * only proven-uniform hashes belong here). */
  /** The per-doc 64-bit simhash signatures (shared by the pair query
    * and its clusters twin): one narrow map stage, cached. */
  private def simhashSignatures(s: SparkSession, d: String): DataFrame = {
    val spark0 = s
    import spark0.implicits._
    val sim = Tables.spread(documents(s, d)
      .select(col("doc_id").cast("long"), col("text")))
      .as[(Long, String)]
      .mapPartitions { it =>
        val memo = new Md5Memo()
        // null text drops the doc — DuckDB's string_split(NULL) yields
        // no words, so the oracle never sees it; emitting simhash 0
        // here instead would band-join against every doc with a zero
        // 16-bit band and diverge from the oracle the moment a corpus
        // carries a null (the old rows-only check never noticed)
        it.flatMap { case (id, text) =>
          if (text == null) Iterator.empty
          else {
            val counts = new Array[Int](64)
            text.split(" ", -1).distinct.foreach { w =>
              val (h, _) = memo(w)
              var b = 0
              while (b < 64) {
                if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
                b += 1
              }
            }
            var sh = 0L
            var b = 0
            while (b < 64) { if (counts(b) > 0) sh |= (1L << b); b += 1 }
            Iterator.single((id, sh))
          }
        }
      }
      .toDF("doc_id", "simhash")
    // signatures persist (QueryCaches-tracked): the pair-budget
    // estimate and the band join both consume them, and the
    // hash pass over the raw text is the expensive half
    QueryCaches.track(sim.persist())
  }

  def qSimhashDedup(s: SparkSession, d: String): DataFrame = {
    val simCached = simhashSignatures(s, d)
    val banded = simCached.select(col("doc_id"), col("simhash"),
      posexplode(array((0 until 4).map(b =>
        shiftright(col("simhash"), b * 16).bitwiseAND(0xFFFFL)): _*))
        .as(Seq("band", "bucket")))
    // PAIR-BUDGET GATE (round 12): this query's contract — materialize
    // every near-dup pair — is the one dedup output that grows
    // QUADRATICALLY with cluster size (the sf1 probe measured 9× wall
    // at 10× data, all of it output). Candidate pairs Σ n·(n−1)/2 over
    // the band buckets cost one count-shuffle over the cached
    // signatures to estimate; past the budget the query REFUSES with a
    // pointer to `dedup_clusters`, whose banded connected-component
    // labels are the linear-output (100 TB) answer to the same
    // question. Budget ≤ 0 disables the gate (the estimate is skipped
    // entirely — no extra job).
    val budget = s.conf.get("graft.simhashDedup.pairBudget",
      (200L * 1000 * 1000).toString).toLong
    if (budget > 0) {
      val candPairs = banded.groupBy(col("band"), col("bucket"))
        .agg(count(lit(1)).as("n"))
        .agg(coalesce(sum((col("n") * (col("n") - 1)).cast("long")), lit(0L)))
        .head().getLong(0) / 2
      if (candPairs > budget) throw new IllegalStateException(
        s"dedup_simhash would examine ~$candPairs candidate pairs " +
          s"(budget $budget): the all-pairs output is quadratic in " +
          "cluster size at this dup rate. Use simhash_clusters (same " +
          "signatures, connected-component labels, linear output) " +
          "instead, or raise graft.simhashDedup.pairBudget")
    }
    val l = banded.select(col("band"), col("bucket"), col("doc_id").as("da"), col("simhash").as("ha"))
    val r = banded.select(col("band"), col("bucket"), col("doc_id").as("db"), col("simhash").as("hb"))
    // hamming gate BEFORE the pair distinct: the band join emits every
    // 16-bit bucket collision (junk included), and deduping survivors
    // only shuffles orders of magnitude fewer rows — the filter
    // commutes with distinct, so the result is identical
    l.join(r, Seq("band", "bucket")).filter(col("da") < col("db"))
      .select(col("da"), col("db"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long").as("hamming"))
      .filter(col("hamming") <= 3)
      .distinct()
      .orderBy(col("da"), col("db"))
  }

  /** [[qSimhashDedup]]'s linear-output twin (round 14) — the escape the
    * pair query's budget refusal names, previously pointing at the
    * shingle-jaccard clusters (a DIFFERENT similarity). Same signatures,
    * same 4×16 bands, hamming ≤ 3, but the output is min-representative
    * component labels via the modal family's shared machinery
    * (exact-hash collapse before banding + [[ConnectedComponents]]) —
    * O(clustered docs) rows at any dup rate, the 100-TB shape. */
  def qSimhashClusters(s: SparkSession, d: String): DataFrame =
    OperatorQueries.bandedHammingClusters(s,
      simhashSignatures(s, d), "simhash", radius = 3)

  /** Per-language corpus stats (docs, chars, whitespace tokens). */
  def qTextStats(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        round(avg(col("n_chars")), 4).as("avg_chars"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"),
        round(avg(size(wordsCol)), 4).as("avg_tokens"))
      .orderBy(col("lang"))

  /** Token counting: whitespace split + a BPE-ish regex tokenizer. */
  def qTokenCount(s: SparkSession, d: String): DataFrame =
    documents(s, d).select(
      col("doc_id"),
      size(split(col("text"), "\\s+")).cast("long").as("ws_tokens"),
      size(regexp_extract_all(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))
        .cast("long").as("re_tokens"))
      .orderBy(col("doc_id"))

  private val langMarkers = Seq("en" -> "table", "de" -> "scan", "fr" -> "join")

  private def occurrences(marker: String): Column =
    ((length(col("text")) - length(regexp_replace(col("text"), marker, "")))
      / marker.length).cast("long")

  /** Language-ID heuristic: marker-word occurrence argmax (deterministic
    * when-chain tie-break). The markers are corpus-specific by design —
    * the operator shape (score → argmax) is what scales. */
  def qLangId(s: SparkSession, d: String): DataFrame = {
    val Seq(en, de, fr) = langMarkers.map { case (_, m) => occurrences(m) }
    documents(s, d).select(
      col("doc_id"), col("lang"),
      en.as("s_en"), de.as("s_de"), fr.as("s_fr"),
      when(en >= de && en >= fr, "en")
        .when(de >= fr, "de").otherwise("fr").as("predicted"))
      .orderBy(col("doc_id"))
  }

  /** Classifier-eval rollup over [[qLangId]]: the (actual, predicted)
    * confusion matrix with exact per-class recall permille — the
    * report every auto-labeling pass ships next to its predictions
    * (the [[graft.queries.SimilarityQueries.qKnnClassify]] pattern at
    * the language-ID surface). One prediction map + one matrix-sized
    * rollup; the window runs over the ≤ |langs|² matrix. */
  def qLangConfusion(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("lang"))
    qLangId(s, d).select(col("lang"), col("predicted"))
      .groupBy(col("lang"), col("predicted")).agg(count(lit(1)).as("n"))
      .withColumn("lang_total", sum(col("n")).over(w))
      .select(col("lang"), col("predicted"), col("n"),
        expr("(1000 * n) div lang_total").as("recall_permille"))
      .orderBy(col("lang"), col("predicted"))
  }

  /** Quality scoring: length/punctuation/stopword/word-length signals
    * combined into one deterministic score. */
  def qQualityScore(s: SparkSession, d: String): DataFrame = {
    val len = length(col("text")).cast("double")
    val punct = length(regexp_replace(col("text"), "[^.!?,;]", "")).cast("double")
    val spaces = length(regexp_replace(col("text"), "[^ ]", "")).cast("double")
    val stop = occurrences("a").cast("double")
    documents(s, d).select(
      col("doc_id"),
      round(punct / len, 6).as("punct_ratio"),
      round(spaces / len, 6).as("space_ratio"),
      round(stop / (spaces + 1), 6).as("stopword_ratio"),
      round((len - spaces) / (spaces + 1), 6).as("avg_word_len"),
      round(least(lit(1.0), len / 500) * (lit(1.0) - punct / len), 6).as("quality"))
      .orderBy(col("doc_id"))
  }

  /** Shared between [[qGopherFilter]] and its generated oracle SQL so
    * the stopword set can never drift. Gopher's published list plus
    * "a" — the synthetic corpus carries exactly two English function
    * words ("a", "the"), and without one of them in the list the
    * stop-word rule would fail EVERY document and the filter would
    * degenerate into a constant (found empirically: 500/500 dropped). */
  private val gopherStopwords =
    Seq("a", "the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher-style rule filter (Rae et al. 2021 §A1.1, the public
    * heuristics), adapted to single-line docs: keep/drop WITH REASONS —
    * the provenance-carrying filter stage a curation pipeline audits,
    * where [[qQualityScore]] is the soft score. Every ratio rule is an
    * integer CROSS-MULTIPLICATION (10·symbols ≤ words, 5·alpha ≥
    * 4·words, 3n ≤ chars ≤ 10n) so no float division crosses engines;
    * word lengths come from `len(text) - spaces` instead of a per-word
    * sum (words join by single spaces — one codegen'd translate, no
    * HOF). Map-only: zero shuffles at any scale. */
  def qGopherFilter(s: SparkSession, d: String): DataFrame = {
    val t = coalesce(col("text"), lit(""))
    val ws = split(t, " ")
    val nWords = size(ws).cast("long")
    // Σ word length = chars minus the single-space separators
    val sumLen = (length(t) - (nWords - 1)).cast("long")
    val hashes = (length(t) - length(regexp_replace(t, "#", ""))).cast("long")
    val ellipses = ((length(t) - length(regexp_replace(t, "\\.\\.\\.", ""))) / 3).cast("long")
    val alphaWords = size(filter(ws, w => w.rlike("[a-zA-Z]"))).cast("long")
    val stopHits = gopherStopwords
      .map(w => when(array_contains(ws, w), 1).otherwise(0))
      .reduce(_ + _).cast("long")
    val rules: Seq[(String, Column)] = Seq(
      "word_count" -> (nWords >= 50 && nWords <= 100000),
      "mean_word_len" -> (sumLen >= nWords * 3 && sumLen <= nWords * 10),
      "symbol_ratio" -> ((hashes + ellipses) * 10 <= nWords),
      "alpha_words" -> (alphaWords * 5 >= nWords * 4),
      "stopwords" -> (stopHits >= 2))
    val keep = rules.map(_._2).reduce(_ && _)
    val reasons = concat_ws(",",
      rules.map { case (n, c) => when(!c, n).otherwise(lit(null)) }: _*)
    documents(s, d).select(col("doc_id"), nWords.as("n_words"),
      keep.as("keep"), reasons.as("reasons"))
      .orderBy(col("doc_id"))
  }

  /** C4's heuristic cleaning rules (Raffel et al. 2020 §2.2) at doc
    * granularity — the OTHER canonical named filter beside Gopher, with
    * the same per-rule drop-reason report shape as [[qGopherFilter]]:
    * ≥3 sentences, no curly brace (code/templating), no "lorem ipsum",
    * no "javascript" (boilerplate markers), and terminal punctuation.
    * All string predicates are exact in both engines. Map-only — zero
    * shuffles; at 100 TB this is a free pass over the scan. */
  def qC4Filter(s: SparkSession, d: String): DataFrame = {
    val t = coalesce(col("text"), lit(""))
    val lower = org.apache.spark.sql.functions.lower(t)
    val trimmed = trim(t)
    val rules: Seq[(String, Column)] = Seq(
      "min_sentences" -> (size(split(t, "\\.")) - 1 >= 3),
      "no_brace" -> !t.contains("{"),
      "no_lorem" -> !lower.contains("lorem ipsum"),
      "no_javascript" -> !lower.contains("javascript"),
      "terminal_punct" -> (trimmed.endsWith(".") || trimmed.endsWith("!") ||
        trimmed.endsWith("?") || trimmed.endsWith("\"")))
    val keep = rules.map(_._2).reduce(_ && _)
    val reasons = concat_ws(",",
      rules.map { case (n, c) => when(!c, n).otherwise(lit(null)) }: _*)
    documents(s, d).select(col("doc_id"), keep.as("keep"), reasons.as("reasons"))
      .orderBy(col("doc_id"))
  }

  /** Document fingerprinting: full SHA-256 + a 16-hex prefix bucket. */
  def qDocFingerprint(s: SparkSession, d: String): DataFrame =
    documents(s, d).select(
      col("doc_id"),
      sha2(col("text"), 256).as("fp"),
      substring(sha2(col("text"), 256), 1, 8).as("fp_bucket"))
      .orderBy(col("doc_id"))

  /** Inverted index build (round 13) — the retrieval artifact a
    * search/decontamination pipeline materializes next to BM25: per
    * token, document frequency plus a CAPPED posting list (the 20
    * smallest doc_ids). Scale shape: one distinct (token, doc) pass,
    * then a per-token window keeps rank ≤ 20 BEFORE any collect — the
    * aggregation state is 20 ids per token no matter how stopword-like
    * the token (an uncapped `collect_list` would hold a corpus-sized
    * posting for common tokens), and the window partitions by token —
    * fully parallel, never global. Report = top-25 tokens by
    * (df DESC, token). */
  def qInvertedIndex(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val postings = QueryCaches.track(documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .distinct()
      .persist())
    val df = postings.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val wt = Window.partitionBy(col("token")).orderBy(col("doc_id"))
    val capped = postings
      .withColumn("rk", row_number().over(wt))
      .filter(col("rk") <= 20)
      .groupBy(col("token"))
      .agg(concat_ws(",", sort_array(collect_list(col("doc_id"))))
        .as("postings"))
    df.join(capped, "token")
      .select(col("token"), col("df"), col("postings"))
      .orderBy(col("df").desc, col("token"))
      .limit(25)
  }

  /** N-gram diversity per source (round 14) — the corpus-health metric
    * next to [[qVocabGrowth]]: distinct word-trigram TYPES vs total
    * trigram TOKENS and the type-token ratio in exact permille, per
    * source. A collapsing TTR is the first sign of template/boilerplate
    * flooding a crawl slice — the signal a mixture decision reads
    * before weighting a source up. Scale shape: the trigram explode is
    * a Generate (three words of state per row), the rollup one
    * partial-agg'd groupBy on |sources| keys; the exact distinct
    * shuffles (source, trigram) once — at 100 TB swap it for
    * approx_count_distinct and the report shape is unchanged. */
  def qNgramDiversity(s: SparkSession, d: String): DataFrame = {
    val tri = documents(s, d)
      .select(col("source"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 3)
      .select(col("source"), explode(expr(
        "transform(sequence(0, size(w) - 3), " +
          "i -> concat_ws(' ', w[i], w[i+1], w[i+2]))")).as("tri"))
    val agg = tri.groupBy(col("source")).agg(
      count_distinct(col("tri")).as("trigram_types"),
      count(lit(1)).as("trigram_total"))
    val nd = documents(s, d).groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"))
    nd.join(agg, "source")
      .select(col("source"), col("n_docs"), col("trigram_types"),
        col("trigram_total"),
        expr("trigram_types * 1000L div trigram_total").as("ttr_permille"))
      .orderBy(col("source"))
  }

  /** Vocabulary growth / Heaps'-law report (round 13) — how fast new
    * word TYPES appear as the corpus grows, the curve a tokenizer-
    * vocabulary-size decision reads. The naive formulation (distinct
    * count per corpus prefix) rescans the corpus per checkpoint; this
    * is ONE pass: each type's FIRST-occurrence doc (min doc_id) drops
    * it into a decile of the doc_id range, and the per-decile type
    * count IS the growth curve. Token volume rolls up per decile in
    * the same pass shape. Integer type-density per mille closes it. */
  def qVocabGrowth(s: SparkSession, d: String): DataFrame = {
    val mx = documents(s, d).agg(max(col("doc_id")).as("mxd"))
    val toks = QueryCaches.track(documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .persist())
    val vol = toks.crossJoin(broadcast(mx))
      .groupBy(expr("doc_id * 10 div (mxd + 1)").as("decile"))
      .agg(count(lit(1)).as("n_tokens"))
    val types = toks.groupBy(col("tok")).agg(min(col("doc_id")).as("fd"))
      .crossJoin(broadcast(mx))
      .groupBy(expr("fd * 10 div (mxd + 1)").as("decile"))
      .agg(count(lit(1)).as("new_types"))
    vol.join(types, Seq("decile"), "left")
      .select(col("decile"), col("n_tokens"),
        coalesce(col("new_types"), lit(0L)).as("new_types"))
      .withColumn("type_permille", expr("1000 * new_types div n_tokens"))
      .orderBy(col("decile"))
  }

  /** Collocation extraction (round 13) — the phrase-detection statistic
    * a word2phrase-style pipeline (Mikolov et al. 2013) runs before
    * tokenizer training: adjacent bigrams scored by the Dice
    * coefficient `2·c(ab)/(c(a)+c(b))` in exact integer permyriad.
    * Dice is chosen over raw PMI/lift deliberately: PMI's
    * `c(ab)·N/(c(a)·c(b))` numerator multiplies two corpus-sized
    * counts and overflows BIGINT near ~2e14 tokens (the bm25 lesson),
    * while every Dice magnitude is bounded by `20000·c(ab)` — safe at
    * any corpus size, and Dice ranks collocations the same way in
    * practice (both reward pairs that rarely appear apart). Scale
    * shape: one bigram count shuffle + a vocabulary-bounded unigram
    * table joined twice (AQE broadcasts it), count-filtered (≥ 5)
    * before the joins. */
  def qCollocations(s: SparkSession, d: String): DataFrame = {
    val docs = QueryCaches.track(documents(s, d)
      .select(split(col("text"), " ").as("ws")).persist())
    val uni = docs.select(explode(col("ws")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val bg = docs.filter(size(col("ws")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(ws)-2), i -> struct(ws[i] AS a, ws[i+1] AS b))")).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= 5)
    bg.join(uni.select(col("w").as("a"), col("c").as("c_a")), "a")
      .join(uni.select(col("w").as("b"), col("c").as("c_b")), "b")
      .select(col("a"), col("b"), col("c_ab"), col("c_a"), col("c_b"),
        expr("(20000 * c_ab) div (c_a + c_b)").as("dice_permyriad"))
      .orderBy(col("dice_permyriad").desc, col("a"), col("b"))
      .limit(25)
  }

  /** Deterministic train/valid/test split (round 13) — the
    * reproducible-by-construction dataset split every training corpus
    * ships with: assignment = `md5(doc_id) mod 1000` (<900 train,
    * <950 valid, else test), so ANY engine reproduces the same
    * membership with no stored split column and no RNG seed plumbing
    * — re-running over a grown corpus never reshuffles previously
    * assigned docs. Report: per (source, split) doc and token volume
    * plus the realized per-source permille. Scale shape: map-only
    * hash + one (source, split)-keyed rollup (≤ 3·|sources| rows);
    * the per-source total joins a broadcast-sized rollup. */
  def qHashSplit(s: SparkSession, d: String): DataFrame = {
    val spark0 = s
    import spark0.implicits._
    val tagged = documents(s, d)
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_toks"))
      .as[(Long, String, Long)]
      .mapPartitions { it =>
        val memo = new Md5Memo()
        it.map { case (id, src, nt) =>
          val b = java.lang.Long.remainderUnsigned(memo(id.toString)._1, 1000L)
          val split = if (b < 900) "train" else if (b < 950) "valid" else "test"
          (src, split, nt)
        }
      }.toDF("source", "split", "n_toks")
    val per = tagged.groupBy(col("source"), col("split"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"))
    val tot = per.groupBy(col("source")).agg(sum(col("n_docs")).as("src_docs"))
    per.join(broadcast(tot), "source")
      .withColumn("share_permille", expr("1000 * n_docs div src_docs"))
      .select(col("source"), col("split"), col("n_docs"), col("n_tokens"),
        col("share_permille"))
      .orderBy(col("source"), col("split"))
  }

  /** Winnowing fingerprints (round 13) — Schleimer, Wilkerson & Aiken
    * 2003 (the MOSS algorithm): hash every token 4-gram, slide a
    * w=4 window over the hash sequence, keep each window's MINIMUM —
    * the guarantee is that any match of ≥ w+k-1 tokens between two
    * docs shares at least one selected fingerprint, at ~1/w the
    * storage of full k-gram hashing. This materializes the per-doc
    * fingerprint summary (gram count, distinct-fingerprint count, a
    * mod-sum checksum over the fingerprint SET); the cross-doc match
    * joins are the existing dedup family's job. Hashes are the
    * engine-independent MD5-lower mod 2^61−1 (values < 2^61, so
    * signed and unsigned comparison agree in both engines). Scale
    * shape: map-only — one pass, no shuffle before the final sort. */
  def qWinnowFingerprint(s: SparkSession, d: String): DataFrame =
    winnowSets(s, documents(s, d))
      .select(col("doc_id"), col("n_grams"), size(col("fps")).cast("long").as("n_fp"),
        aggregate(col("fps"), lit(0L), (acc, x) => acc + x % 1000003L)
          .as("fp_checksum"))
      .orderBy(col("doc_id"))

  /** Cross-split n-gram leakage (round 13) — the eval-integrity check
    * that closes the [[qHashSplit]]/[[qContaminationCheck]] loop: what
    * fraction of the valid/test splits' word 5-grams also occur in the
    * TRAIN split (the leakage that silently inflates held-out metrics).
    * Same split assignment as hash_split (`md5(doc_id) mod 1000`), same
    * gram-hash device as winnowing (`md5 mod 2⁶¹−1`). Scale shape: one
    * gram pass, a distinct on the train side, ONE hash-keyed left join
    * — never doc×doc; output is |splits|-sized. */
  def qSplitContamination(s: SparkSession, d: String): DataFrame = {
    val spark0 = s
    import spark0.implicits._
    val M = 2305843009213693951L // 2^61 - 1
    val grams = QueryCaches.track(documents(s, d)
      .select(col("doc_id").cast("long"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.flatMap { case (id, text) =>
          val b = java.lang.Long.remainderUnsigned(
            md5Pair(md, id.toString)._1, 1000L)
          val split = if (b < 900) "train" else if (b < 950) "valid" else "test"
          val ws = if (text == null) Array.empty[String] else text.split(" ", -1)
          (0 to ws.length - 5).iterator.map { i =>
            (split, java.lang.Long.remainderUnsigned(
              md5Pair(md, ws.slice(i, i + 5).mkString(" "))._1, M))
          }
        }
      }.toDF("split", "h").persist())
    val train = grams.filter(col("split") === "train")
      .select(col("h")).distinct().withColumn("hit", lit(1L))
    grams.filter(col("split") =!= "train")
      .join(train, Seq("h"), "left_outer")
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("hit"), lit(0L))).as("n_leaked"))
      .withColumn("leak_permille", expr("(1000 * n_leaked) div n_grams"))
      .orderBy(col("split"))
  }

  /** The winnowing core shared by [[qWinnowFingerprint]] and the
    * guarantee spec: per doc with ≥ 7 tokens, `(doc_id, n_grams,
    * fps)` where `fps` is the sorted distinct window-minima set. */
  private[queries] def winnowSets(s: SparkSession, docs: DataFrame): DataFrame = {
    val spark0 = s
    import spark0.implicits._
    val M = 2305843009213693951L // 2^61 - 1
    docs.select(col("doc_id").cast("long"), col("text")).as[(Long, String)]
      .flatMap { case (id, text) =>
        val ws = if (text == null) Array.empty[String] else text.split(" ", -1)
        if (ws.length < 7) Iterator.empty // need ≥ 4 grams of k=4 tokens
        else {
          val md = java.security.MessageDigest.getInstance("MD5")
          val n = ws.length - 3
          val h = new Array[Long](n)
          var i = 0
          while (i < n) {
            val g = s"${ws(i)} ${ws(i + 1)} ${ws(i + 2)} ${ws(i + 3)}"
            h(i) = java.lang.Long.remainderUnsigned(md5Pair(md, g)._1, M)
            i += 1
          }
          val mins = new scala.collection.mutable.HashSet[Long]
          var j = 0
          while (j <= n - 4) {
            var m = h(j)
            var t = 1
            while (t < 4) { if (h(j + t) < m) m = h(j + t); t += 1 }
            mins += m
            j += 1
          }
          Iterator.single((id, n.toLong, mins.toArray.sorted))
        }
      }.toDF("doc_id", "n_grams", "fps")
  }

  /** Fuzzy vocabulary join (round 13) — spell-variant / OCR-noise
    * detection, the string-similarity JOIN operator: word pairs within
    * edit distance 2, candidates generated by the classic blocking
    * key (first char × a 3-wide length band — each word emits keys
    * len..len+2, so any |Δlen| ≤ 2 pair collides on exactly the keys
    * both emit) and verified with `levenshtein` (identical DP
    * definition in both engines). The join runs over the DISTINCT
    * VOCABULARY, never the corpus: candidate volume is bounded by
    * (vocab per block)², the standard spell-correction shape. Pairs
    * whose first character differs are deliberately outside the
    * blocking (the documented recall trade every blocked fuzzy join
    * makes; widen the key set to widen recall). */
  def qFuzzyVocabJoin(s: SparkSession, d: String): DataFrame = {
    val vocab = QueryCaches.track(documents(s, d)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) >= 3)
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .persist())
    def keyed(wc: String, cc: String) = vocab
      .select(col("w").as(wc), col("c").as(cc),
        explode(expr("array(length(w), length(w) + 1, length(w) + 2)")).as("lb"),
        substring(col("w"), -1, 1).as("fc"))
    keyed("a", "c_a").join(keyed("b", "c_b"), Seq("lb", "fc"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"), col("c_a"), col("c_b"),
        levenshtein(col("a"), col("b")).cast("long").as("dist"))
      .filter(col("dist") <= 2)
      .distinct()
      .orderBy(col("dist"), col("a"), col("b"))
      .limit(25)
  }

  /** Corpus vocabulary statistics: top-25 tokens by frequency (the
    * unigram table a tokenizer-training pipeline starts from). */
  def qTokenFrequency(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(explode(wordsCol).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(25)

  /** Heavy hitters with a Count-Min Sketch gate — the third classic
    * streaming sketch beside HLL (`q_approx_distinct`) and KLL
    * (`q_approx_quantile`), under the same exact-plus-tolerance-gate
    * device: the exact top-20 token list is the hash-matched oracle
    * surface, and two booleans assert the CMS landed (no
    * underestimate — a structural CMS guarantee — and overestimate
    * ≤ ε·N, the probabilistic one).
    *
    * Scale shape: the sketch is Spark's mergeable
    * `util.sketch.CountMinSketch` — map-side partial sketches of
    * CONSTANT size (w=⌈2/ε⌉ counters × d=⌈ln 1/δ⌉ rows) merge on the
    * driver, which is the whole point at 100 TB: frequency estimates
    * for ANY token without a corpus-sized group-by. The exact top-20
    * here exists only to gate it; estimates are read through a
    * broadcast of the finished sketch over the 20 survivors. */
  def qHeavyHitters(s: SparkSession, d: String): DataFrame = {
    val toks = documents(s, d).select(explode(wordsCol).as("token"))
    val eps = 0.0001
    val sketch = toks.stat.countMinSketch(col("token"), eps, 0.99, 42)
    val bound = math.ceil(eps * sketch.totalCount()).toLong
    val bc = s.sparkContext.broadcast(sketch)
    val estimate = udf((t: String) => bc.value.estimateCount(t))
    toks.groupBy(col("token")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token")).limit(20)
      .withColumn("est", estimate(col("token")))
      .select(col("token"), col("n"),
        (col("est") >= col("n")).as("cms_no_underestimate"),
        (col("est") - col("n") <= lit(bound)).as("cms_within_eps"))
      .orderBy(col("n").desc, col("token"))
  }

  /** Document-length histogram over fixed 50-char buckets. */
  def qDocLengthHistogram(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .groupBy(floor(col("n_chars") / 50).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"))
      .orderBy(col("bucket"))

  /** Multimodal column plumbing: text treated as an opaque binary blob
    * with typed metadata — length, header bytes, content hash, and a
    * deterministic fake "decode" (real decode would be a codec UDF over
    * the same binary column; the container has no image/audio libs). */
  def qMultimodalMeta(s: SparkSession, d: String): DataFrame = {
    val blob = col("text").cast("binary")
    documents(s, d).select(
      col("doc_id"),
      length(blob).cast("long").as("blob_len"),
      hex(substring(blob, 1, 8)).as("header_hex"),
      sha2(col("text"), 256).as("content_sha"),
      (col("n_chars") % 64 * 16 + 32).cast("long").as("fake_width"),
      (col("n_chars") % 48 * 16 + 32).cast("long").as("fake_height"))
      .orderBy(col("doc_id"))
  }

  /** PII redaction: email / US-phone / IPv4 patterns replaced with
    * typed placeholders, plus a per-doc extraction count. The corpus
    * text is synthetic, so deterministic PII is APPENDED from doc_id
    * before redaction — the patterns then provably fire on every row
    * (a no-op redaction would verify nothing). Pure per-row narrow
    * work: no shuffle, codegen regexes — at 100 TB this is a
    * map-only pass. Patterns restricted to the RE2-compatible subset
    * so the oracle's regex engine agrees byte-for-byte. */
  def qPiiRedact(s: SparkSession, d: String): DataFrame = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val phone = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
    val ip = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
    val raw = concat(col("text"),
      lit(" contact user"), col("doc_id").cast("string"), lit("@example.com or 555-"),
      lpad((col("doc_id") % 1000).cast("string"), 3, "0"), lit("-"),
      lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
      lit(" at 10.0."), (col("doc_id") % 256).cast("string"), lit(".7"))
    documents(s, d).select(col("doc_id"), raw.as("raw"))
      .select(col("doc_id"),
        regexp_replace(regexp_replace(regexp_replace(col("raw"),
          email, "<EMAIL>"), phone, "<PHONE>"), ip, "<IP>").as("redacted"),
        size(regexp_extract_all(col("raw"), lit(email), lit(0))).cast("long").as("n_emails"))
      .orderBy(col("doc_id"))
  }

  /** Repetition statistics (the Gopher-style quality filters): per-doc
    * token totals, distinct counts, the top token's frequency share,
    * and the duplicate-token fraction. Two partial-aggregated shuffles
    * on (doc_id, token) then doc_id — both narrow-keyed, no window. */
  def qRepetitionStats(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"), explode(wordsCol).as("token"))
      .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("n"))
      .groupBy(col("doc_id"))
      .agg(sum("n").as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        round(max(col("n")).cast("double") / sum(col("n")), 6).as("top_token_frac"),
        round(lit(1.0) - count(lit(1)).cast("double") / sum(col("n")), 6)
          .as("dup_token_frac"))
      .orderBy(col("doc_id"))

  /** Stratified sampling: per-language rates (en 50%, de 20%, rest
    * 10%) over the SAME engine-independent multiplicative hash as
    * [[qTrainTestSplit]] — reproducible across engines/runs, and a
    * pure filter: no shuffle before the small per-stratum rollup.
    * The domain-mixing primitive of a training-data pipeline. */
  def qStratifiedSample(s: SparkSession, d: String): DataFrame = {
    val bucket = pmod(col("doc_id") * lit(2654435761L), lit(1000L))
    val rate = when(col("lang") === "en", 500L)
      .when(col("lang") === "de", 200L).otherwise(100L)
    documents(s, d).filter(bucket < rate)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_sampled"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"),
        round(avg(col("n_chars")), 4).as("avg_chars"))
      .orderBy(col("lang"))
  }

  /** Benchmark-contamination check (the GPT-3/PaLM n-gram practice):
    * character 20-gram shingles of a benchmark split (here doc_id %
    * 100 == 0) matched against every other document — a hit means eval
    * data leaked into the training corpus. The benchmark side is tiny
    * and BROADCASTS; the corpus side is a map-only explode feeding one
    * partial-aggregated shuffle on doc_id — no all-pairs join anywhere,
    * the shape that survives 100 TB. Both sides filter length ≥ 20
    * (Spark's sequence(1, 0) is DESCENDING, not empty — the guard keeps
    * the two engines' shingle sets identical). */
  def qContamination(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    contaminationAgainst(s, docs.filter(col("doc_id") % 100 =!= 0),
      docs.filter(col("doc_id") % 100 === 0))
  }

  /** The parameterized form: check `corpus` for shingle overlap with an
    * ARBITRARY benchmark table (the real-world shape — a fixed external
    * eval set, not a slice of the corpus itself). The benchmark side is
    * usually tiny and broadcasts, but the broadcast is BUDGET-GATED:
    * past the budget the join degrades to a shuffle join on the shingle
    * key, which is the only shape that survives a benchmark too big for
    * executor memory. Two gate tiers (round-11): Catalyst's free size
    * estimate first — but without CBO a Filter keeps its CHILD's
    * estimate, so a small slice of a big table looks full-size and
    * would silently over-refuse the broadcast — then, only when that
    * says "too big", ONE narrow aggregation measures the actual
    * shingle-source bytes (O(bench scan), trivial next to the join it
    * sizes). Gate key: `graft.contamination.broadcastBudget` (bytes,
    * 0 disables broadcasting); the 20x factor models shingle inflation
    * (one 20-byte shingle per character survives the distinct at
    * worst). */
  def contaminationAgainst(s: SparkSession, corpus: DataFrame,
      bench: DataFrame): DataFrame = {
    // the char-20-gram explode generates ~|text| strings per doc — the
    // query's whole cost — off an unsplittable one-task scan; spread it
    def shingles(df: DataFrame) = Tables.spread(
      df.filter(length(col("text")) >= 20))
      .select(col("doc_id"),
        explode(expr("transform(sequence(1, length(text) - 19), " +
          "i -> substring(text, i, 20))")).as("sh"))
    // benchmark side dedups (small relative to the corpus); the CORPUS
    // side must not — a pre-join distinct would shuffle every shingle
    // string in the corpus, while the join drops non-matching shingles
    // and the final countDistinct dedups the few survivors
    val benchSh = shingles(bench)
      .withColumnRenamed("doc_id", "bench_id").distinct()
    val budget = s.conf.get("graft.contamination.broadcastBudget",
      (64L << 20).toString).toLong
    val catalystEst = bench.queryExecution.optimizedPlan.stats.sizeInBytes * 20
    lazy val measuredEst = BigInt(bench.filter(length(col("text")) >= 20)
      .agg(coalesce(sum(length(col("text")).cast("long") * 20L), lit(0L)))
      .head.getLong(0))
    val joined =
      if (budget > 0 &&
        (catalystEst <= BigInt(budget) || measuredEst <= BigInt(budget)))
        shingles(corpus).join(broadcast(benchSh), "sh")
      else shingles(corpus).join(benchSh, "sh")
    joined.groupBy(col("doc_id"))
      .agg(countDistinct(col("sh")).as("overlap_shingles"),
        countDistinct(col("bench_id")).as("bench_docs_hit"))
      .orderBy(col("doc_id"))
  }

  /** Token-window CHUNKING (the training-window segmentation step): each
    * document splits into 64-token windows with a 48-token stride
    * (16-token overlap keeps context across boundaries). Pure map-side
    * HOFs — split / sequence / slice inside whole-stage codegen, zero
    * shuffles until the output sort; the per-doc work is independent, so
    * the shape is identical at 100 TB. */
  def qDocChunking(s: SparkSession, d: String): DataFrame = {
    val K = 64
    val S = 48
    documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("ts"))
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, CAST(floor((size(ts) - 1) / $S) AS INT)), " +
          s"i -> slice(ts, 1 + i * $S, $K))")))
      .select(col("doc_id"), col("pos").cast("long").as("chunk_id"),
        size(col("col")).cast("long").as("n_tokens"),
        array_join(col("col"), " ").as("chunk_text"))
      .orderBy(col("doc_id"), col("chunk_id"))
  }

  /** Sequence PACKING (the concat-and-split batching step between
    * chunking and training): documents shard deterministically
    * (`doc_id % S`), concatenate in doc_id order within each shard, and
    * cut into fixed B-token training sequences — a document's pack is
    * where its FIRST token lands (GPT-style document concatenation).
    * One window per shard computes the running token offset, so the
    * work is S-way parallel with a single shuffle on the shard key; at
    * 100 TB the shard count scales with the cluster and each shard's
    * sort stays machine-local. Output is the per-pack manifest
    * (doc counts, token totals, doc-id span) — the exact-integer
    * surface both engines reproduce. */
  def qDocPacking(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // Shard count is the parallelism ceiling of the per-shard window
    // sort, so it is a conf (round-11), not a constant: at 100 TB set
    // it to O(cluster cores). The oracle pins the default 8; shards
    // are independent (each doc's pack depends only on its own shard's
    // running offset), so S only changes grouping, never pack math
    // within a shard — DocPackingShardSpec asserts exactly that.
    // (graft.* prefix like every other engine knob — contamination
    // budget, plan budget — so operators find it where they expect.)
    val S = s.conf.get("graft.packing.shards", "8").toInt
    val B = 256
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
    documents(s, d)
      .select(col("doc_id"), (col("doc_id") % S).as("shard"),
        size(split(col("text"), "\\s+")).cast("long").as("n_tokens"))
      .withColumn("start_tok", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("pack_id", floor(col("start_tok") / B))
      .groupBy(col("shard"), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).cast("long").as("pack_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .orderBy(col("shard"), col("pack_id"))
  }

  /** Keyword extraction (tf-idf's integer-exact core): each document's
    * top-3 characteristic terms, ranked by term frequency DESC, then
    * document frequency ASC (rarer across the corpus = more
    * distinctive), then term — the float-free tf-idf ordering both
    * engines reproduce bit-for-bit. Shapes: one shuffle to (doc, term)
    * counts, a vocabulary-sized rollup for df (vocabularies are small
    * relative to corpora — AQE broadcasts it), a per-doc window for
    * top-k. No all-pairs anywhere; at 100 TB the vocab rollup is the
    * only global structure and it is bounded by vocabulary, not corpus,
    * size. */
  def qKeywordExtraction(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), "\\s+")).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tf").desc, col("df").asc, col("tok"))
    tf.join(dfreq, "tok")
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select(col("doc_id"), col("rn"), col("tok"), col("tf"), col("df"))
      .orderBy(col("doc_id"), col("rn"))
  }

  /** Exact substring (duplicated-span) dedup, the Lee et al. 2022
    * "Deduplicating Training Data Makes Language Models Better" measure
    * re-expressed for a shuffle engine: a 20-token window whose exact
    * text occurs in ≥ 2 DISTINCT documents is a duplicated span; each
    * document reports how much of it is covered by such spans. Exactly
    * the signal used to cut memorization-prone boilerplate.
    *
    * Shape: one narrow map builds the overlapping windows (stride 1)
    * and shrinks each to its MD5 hex — 32 bytes on the wire instead of
    * a ~120-char 20-gram, and engine-independent (Spark `md5` and
    * DuckDB `md5` both hash the UTF-8 bytes to the same lowercase hex),
    * so the oracle reconstructs the IDENTICAL keys rather than merely
    * equivalent ones. Then one count-distinct rollup keyed by window
    * hash finds the cross-doc spans, and one join + per-doc rollup
    * counts covered positions. Lee et al.'s suffix array is the
    * single-machine O(N) answer; hash-shingled windows are the
    * distributed-standard O(N·W) one — the shuffle carries only
    * (hash, doc_id), never window text. dup_permyriad is an exact
    * integer ((dups·10⁴) div windows) so no float division crosses
    * engines.
    *
    * Spark-side the 128-bit key travels as two longs (16 B vs 32-char
    * hex — md5 ↔ (lo,hi) is a bijection, so the grouping is identical
    * to the oracle's hex grouping), "occurs in ≥ 2 distinct docs" is
    * just min(doc_id) ≠ max(doc_id) (no count-distinct expand), and
    * per-doc totals come from exploding the per-hash occurrence lists
    * back out — ONE corpus scan, two keyed shuffles, no join. The
    * first formulation (HOF windows + count-distinct + self-join)
    * scanned and windowed the corpus twice and ran 5× slower. */
  def qDedupSubstring(s: SparkSession, d: String): DataFrame = {
    val W = 20
    val spark0 = s
    import spark0.implicits._
    val wins = documents(s, d)
      .select(col("doc_id").cast("long"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val sb = new java.lang.StringBuilder()
        it.flatMap { case (id, text) =>
          val ws = if (text == null) Array.empty[String] else text.split(" ", -1)
          if (ws.length < W) Iterator.empty
          else (0 to ws.length - W).iterator.map { i =>
            sb.setLength(0)
            var j = 0
            while (j < W) { if (j > 0) sb.append(' '); sb.append(ws(i + j)); j += 1 }
            val (lo, hi) = md5Pair(md, sb.toString)
            (id, lo, hi)
          }
        }
      }
      .toDF("doc_id", "lo", "hi")
    wins.groupBy(col("lo"), col("hi"))
      .agg(min(col("doc_id")).as("mn"), max(col("doc_id")).as("mx"),
        collect_list(col("doc_id")).as("docs"))
      .select(explode(col("docs")).as("doc_id"),
        when(col("mn") =!= col("mx"), 1).otherwise(0).as("dup"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_windows"), sum(col("dup")).cast("long").as("n_dup_windows"))
      .withColumn("dup_permyriad", expr("(n_dup_windows * 10000L) div n_windows"))
      .orderBy(col("doc_id"))
  }

  /** Domain-MIXTURE sampling (the pre-training data-mixture step —
    * Pile/LLaMA-style per-source weights): each source subsamples
    * toward its target token share of a global budget B = half the
    * corpus tokens. Weights are integer permyriad derived from the
    * source id (relative, not normalized); the per-source target is
    * the EXACT integer `((Σtokens div 2)·w_s) div Σw`, and selection
    * is the engine-independent multiplicative hash already proven in
    * train_test_split: keep iff `bucket·T_s < target_s·10^6` with
    * `bucket = (doc_id·2654435761) mod 10^6` — the keep probability
    * target/T never materializes as a float (cross-multiplied), and a
    * source at-or-under its target keeps everything (the inequality
    * holds for all buckets when T_s ≤ target_s), so the cap needs no
    * branch. Every intermediate < 2^52: exact in both engines.
    *
    * Plan shape: TWO narrow corpus scans (one map-side-combined rollup
    * to #sources rows; one filter+rollup with the totals broadcast
    * back) and a #sources-row join — no wide shuffle at any scale. A
    * LEFT join from the totals keeps sources whose sample emptied, so
    * the output is always one row per source. */
  def qDataMixture(s: SparkSession, d: String): DataFrame = {
    val weight = (expr("CAST(substring(source, 4) AS BIGINT)") % 4 + 1) * 1000L
    val docs = documents(s, d).select(col("doc_id"), col("source"),
      size(split(col("text"), "\\s+")).cast("long").as("toks"))
    // persisted: the rollup is #sources rows but referenced from three
    // branches (grand totals, the kept join's build side, the output's
    // preserved side) — unpersisted, each branch re-scans the corpus
    val totals = QueryCaches.track(docs.groupBy(col("source"))
      .agg(sum(col("toks")).as("t_s"), count(lit(1)).as("n_s"))
      .withColumn("w", weight).persist())
    // grand totals: a #sources-row aggregate, broadcast as scalars
    val grand = totals.agg(sum(col("t_s")).as("tot"), sum(col("w")).as("sumw"))
    val targeted = broadcast(totals.crossJoin(broadcast(grand))
      .withColumn("target", expr("((tot div 2) * w) div sumw")))
    val bucket = pmod(col("doc_id") * lit(2654435761L), lit(1000000L))
    val kept = docs.join(targeted, "source")
      .filter(bucket * col("t_s") < col("target") * lit(1000000L))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("kept_docs"), sum(col("toks")).as("kept_tokens"))
    targeted.select(col("source"), col("w").as("weight"), col("n_s").as("n_docs"),
        col("t_s").as("total_tokens"), col("target").as("target_tokens"))
      .join(kept, Seq("source"), "left")
      .select(col("source"), col("weight"), col("n_docs"), col("total_tokens"),
        col("target_tokens"),
        coalesce(col("kept_docs"), lit(0L)).as("kept_docs"),
        coalesce(col("kept_tokens"), lit(0L)).as("kept_tokens"))
      .orderBy(col("source"))
  }

  /** CCNet-style LM perplexity filter (Wenzek et al. 2020 CCNet;
    * Rae et al. 2021 Gopher): score every document by the
    * cross-entropy of a bigram language model trained on the corpus
    * itself, and surface the most "surprising" (highest
    * bits-per-bigram) documents — the CCNet recipe buckets a corpus by
    * LM perplexity and drops/downsamples the worst tail.
    *
    * Engine-independence (the lesson of the round-11 re-seats): the
    * per-bigram cost is the INTEGER bit-length proxy for the add-one
    * smoothed negative log2 probability —
    *   bits(w1 w2) = bitlen(c1(w1) + V) − bitlen(c2(w1,w2) + 1)
    * where c2 = bigram count, c1 = context count (bigrams starting
    * with w1), V = corpus vocabulary, and bitlen(x) = length(bin(x))
    * = ⌊log2 x⌋ + 1 — exact integer arithmetic both engines compute
    * bit-identically (`bin` exists in Spark AND DuckDB), instead of
    * floating-point `ln` whose last-ulp rounding is engine-private.
    * bits ≈ log2((c1+V)/(c2+1)) within ±1 bit per token; summed over a
    * document and normalized (×1000, integer division) it preserves
    * the perplexity ORDERING that the filter actually consumes.
    *
    * Scale shape: the model (c2 ⋈ c1 ⋈ V) is vocabulary²-bounded —
    * orders of magnitude smaller than the corpus — built with two
    * map-side-combined count shuffles; the corpus-sized bigram stream
    * then joins the model on (w1,w2) (AQE broadcasts it when small)
    * and aggregates per doc_id. Everything stays in codegen'd HOFs
    * (split / transform / explode) — no UDFs, no driver loops. */
  def qLmPerplexity(s: SparkSession, d: String): DataFrame =
    lmDocBits(s, d)
      .orderBy(col("mbits_per_bigram").desc, col("doc_id"))
      .limit(30)

  /** The bigram-LM per-doc scoring shared by [[qLmPerplexity]] (worst
    * tail) and [[qPerplexityBuckets]] (CCNet terciles): one row per
    * doc with ≥ 1 bigram — (doc_id, n_bigrams, total_bits,
    * mbits_per_bigram). */
  private def lmDocBits(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.spread(documents(s, d)).select(col("doc_id"),
      split(col("text"), " ").as("ws"))
    // guard size>=2 BEFORE sequence(0, size-2): Spark's sequence(0,-1)
    // is a *descending* [0,-1], not empty
    // The bigram stream stays UNCACHED deliberately: persisting it was
    // measured (round-18) and lost — the explode fuses into each
    // consumer's aggregation under codegen, while a cache forces full
    // materialization of the exploded rows plus block-lock
    // coordination between the model build and the scoring probe.
    val bg = docs.filter(size(col("ws")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(ws)-2), i -> struct(ws[i] AS w1, ws[i+1] AS w2))")).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val vocab = docs.select(explode(col("ws")).as("w"))
      .agg(count_distinct(col("w")).as("v"))
    val c2 = bg.groupBy("w1", "w2").agg(count(lit(1)).as("n2"))
    // c1 (bigrams per context word) derives from the VOCABULARY-sized
    // c2 — c1(w1) = Σ_{w2} c2(w1,w2) by definition — so the second
    // corpus-sized aggregation pass disappears outright (guide §2.4)
    val c1 = c2.groupBy("w1").agg(sum(col("n2")).as("n1"))
    val model = c2.join(c1, Seq("w1")).crossJoin(vocab)
      .select(col("w1"), col("w2"),
        (length(bin(col("n1") + col("v"))) -
          length(bin(col("n2") + lit(1L)))).cast("long").as("bits"))
    bg.join(model, Seq("w1", "w2"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum(col("bits")).as("total_bits"))
      .withColumn("mbits_per_bigram",
        expr("total_bits * 1000L div n_bigrams"))
  }

  /** CCNet's actual output (Wenzek et al. 2020 §4.4): bucket the
    * corpus into head/middle/tail perplexity TERCILES — training
    * pipelines keep head, downsample middle, drop tail. Buckets equal
    * ntile(3) over the doc-level score table ordered (mbits, doc_id) —
    * a total order, so the assignment is engine-exact — but are
    * COMPUTED by the two-pass range quantile ([[HistogramNtile]], the
    * `q_weighted_median` histogram-selection device): the doc rollup
    * is corpus-sized (one row per document), so a global `ntile`
    * window would funnel every document through one task at 100 TB.
    * Pass 1 selects the two exact tercile boundary tuples from a
    * 1024-bucket mass rollup; pass 2 is a map-only bucket stamp
    * against the broadcast boundaries. Oracle unchanged (plain ntile
    * in DuckDB). */
  def qPerplexityBuckets(s: SparkSession, d: String): DataFrame = {
    val base = QueryCaches.track(lmDocBits(s, d).persist())
    val cuts = HistogramNtile.cutsRow(base, "mbits_per_bigram", "doc_id", 3, "pc")
    base.crossJoin(broadcast(cuts))
      .withColumn("bucket",
        HistogramNtile.bandExpr("mbits_per_bigram", "doc_id", "pc", 3))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("mbits_per_bigram")).as("min_mbits"),
        max(col("mbits_per_bigram")).as("max_mbits"))
      .orderBy(col("bucket"))
  }

  /** DSIR-style data selection (Xie et al. 2023, arXiv:2302.03169
    * "Data Selection for Language Models via Importance Resampling"):
    * rank raw-corpus documents by how little their hashed-unigram
    * feature distribution diverges from a TARGET domain (here
    * lang='en', the stand-in for the paper's high-quality target), so
    * the least-divergent docs are what importance resampling would
    * pull into the training mix. Per-token divergence in INTEGER bits
    * (the [[qLmPerplexity]] device):
    *   bits(b) = bitlen(q(b)+1) − bitlen(p(b)+1) ≥ 0
    * over B=4096 MD5 hash buckets (target ⊆ corpus keeps it
    * nonnegative, so the ×1000 integer normalization never divides a
    * negative). Smallest mean divergence = most target-like.
    *
    * Scale shape: the bucket tables are B-bounded (4096 rows) however
    * large the corpus — two map-side-combined count shuffles build
    * them, the corpus token stream joins the broadcast-sized model,
    * and one doc_id aggregation finishes; the token stream is
    * persisted across its three consumers (p, q, scoring) so the text
    * is hashed once. */
  def qDsirSelect(s: SparkSession, d: String): DataFrame = {
    val B = 4096L
    val spark0 = s
    import spark0.implicits._
    val toks = Tables.spread(documents(s, d)
      .select(col("doc_id"), col("lang"), col("text")))
      .as[(Long, String, String)]
      .mapPartitions { it =>
        val memo = new Md5Memo()
        it.flatMap { case (id, lang, text) =>
          if (text == null) Iterator.empty
          else text.split(" ", -1).iterator.map { w =>
            (id, lang, java.lang.Long.remainderUnsigned(memo(w)._1, B))
          }
        }
      }.toDF("doc_id", "lang", "b")
    val cached = QueryCaches.track(toks.persist())
    val q = cached.groupBy("b").agg(count(lit(1)).as("nq"))
    val p = cached.filter(col("lang") === "en")
      .groupBy("b").agg(count(lit(1)).as("np"))
    val model = q.join(p, Seq("b"), "left_outer")
      .select(col("b"),
        (length(bin(col("nq") + lit(1L))) -
          length(bin(coalesce(col("np"), lit(0L)) + lit(1L)))).cast("long").as("bits"))
    cached.filter(col("lang") =!= "en")
      .join(model, Seq("b"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum(col("bits")).as("divergence_bits"))
      .withColumn("mbits_per_token",
        expr("divergence_bits * 1000L div n_tokens"))
      .orderBy(col("mbits_per_token").asc, col("doc_id"))
      .limit(30)
  }

  /** BM25 top-k retrieval (Robertson & Walker 1994; the Okapi/Lucene
    * ranking function) over the corpus for a fixed query term set —
    * the standard relevance scorer a data pipeline uses to pull
    * topical slices out of a 100 TB corpus (and the scoring half of a
    * sparse-retrieval index).
    *
    * Engine-independence: every factor is integer arithmetic.
    *  - idf in HALF-bits, via the bitlen-of-a-square device:
    *    bitlen((N+1)² div (df+1)²) = ⌊2·log2((N+1)/(df+1))⌋ + 1 — the
    *    +1 is Lucene's "+1 inside the log" floor, so terms in most
    *    documents still contribute through their saturated tf instead
    *    of vanishing (exactly how BM25+ behaves). Squares of document
    *    counts fit a long for any N < 3e9 per shard; past that the
    *    idf table is vocabulary-bounded and trivially recomputed in
    *    decimal.
    *  - tf saturation k1=1.2, b=0.75 as one exact rational: with
    *    integers only, tf(k1+1)/(tf + k1(1−b+b·dl/avgdl)) scaled ×1000
    *    is (44·am·tf·1000) div (20·am·tf + 6·am + 18000·dl) with
    *    am = avgdl_milli = 1000·SumDL div N (multiply numerator and
    *    denominator by 20·am; am rounds avgdl to milli precision so
    *    every magnitude is bounded by per-document lengths — the raw
    *    SumDL form overflows BIGINT past ~2e14 corpus tokens).
    *
    * Scale shape: the token stream is filtered to the query terms at
    * the scan (predicate on the exploded token — the stream that
    * reaches the shuffle is O(query matches), not O(corpus)); the df
    * and corpus-stats tables are 1-row/|Q|-row broadcasts; one
    * (doc_id, tok) count shuffle + one doc_id rollup; TakeOrdered k. */
  def qBm25TopK(s: SparkSession, d: String): DataFrame =
    bm25Scored(s, d)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(25)

  /** The BM25 document-score stage — per-doc (n_terms, score) for the
    * fixed query term set, BEFORE any ordering/limit. One definition
    * shared by [[qBm25TopK]] and the hybrid-retrieval fusion
    * ([[SimilarityQueries.qRrfFusion]]) so the two cannot drift. */
  private[queries] def bm25Scored(s: SparkSession, d: String): DataFrame = {
    val terms = Seq("dup", "vector", "batch")
    val docs = documents(s, d).select(col("doc_id"),
      split(col("text"), " ").as("ws"))
    // avgdl enters as avgdl_milli = 1000·SumDL div N (the docstring's
    // bounded form, now APPLIED, not just prescribed): every term in
    // the rational is then bounded by per-document magnitudes
    // (44·am·tf·1000 ≈ 4.4e7·avgdl·tf), never by total corpus tokens —
    // the raw-SumDL form overflows BIGINT past ~2e14 corpus tokens.
    val stats = docs.agg(count(lit(1)).as("n"),
      sum(size(col("ws"))).cast("long").as("sumdl"))
      .withColumn("am", expr("1000 * sumdl div n"))
    val tf = docs
      .select(col("doc_id"), size(col("ws")).cast("long").as("dl"),
        explode(col("ws")).as("tok"))
      .filter(col("tok").isin(terms: _*))
      .groupBy(col("doc_id"), col("dl"), col("tok"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    tf.join(dfreq, Seq("tok")).crossJoin(stats)
      .withColumn("contrib",
        expr("length(bin((n+1)*(n+1) div ((df+1)*(df+1)))) * " +
          "((44 * am * tf * 1000) div " +
          "(20 * am * tf + 6 * am + 18000 * dl))").cast("long"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms"), sum(col("contrib")).as("score"))
  }

  /** BPE pair counting (Sennrich et al. 2016, arXiv:1508.07909) — the
    * inner statistic of byte-pair-encoding tokenizer training: corpus
    * word frequencies, then adjacent-symbol pair counts weighted by
    * word frequency; training repeatedly merges the top pair. The
    * distributed-scale insight this query encodes: only the FIRST
    * aggregation (text → word counts) touches the corpus — one
    * map-side-combined shuffle — and every merge iteration after
    * operates on the vocabulary-bounded word table (re-pairing ~10⁵
    * distinct words per iteration is driver-trivial at any corpus
    * size), so training a 30k-merge tokenizer over 100 TB costs one
    * corpus pass. Emits the top pairs of the first iteration — the
    * exact ranking the first merges would consume. */
  def qBpePairCounts(s: SparkSession, d: String): DataFrame = {
    val words = documents(s, d)
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
    words.filter(length(col("w")) >= 2)
      .select(col("freq"), explode(expr(
        "transform(sequence(1, length(w)-1), " +
          "i -> struct(substring(w, i, 1) AS a, substring(w, i+1, 1) AS b))"))
        .as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("freq")).as("pair_count"))
      .orderBy(col("pair_count").desc, col("a"), col("b"))
      .limit(25)
  }

  /** BPE tokenizer TRAINING loop (Sennrich et al. 2016 algorithm 1) —
    * the first 5 merges learned end-to-end, not just the pair
    * statistic ([[qBpePairCounts]] is round 1's input): each round
    * counts frequency-weighted adjacent symbol pairs over the
    * vocabulary's spaced symbol forms, takes the (count DESC, pair)
    * argmax, and rewrites every word by merging that pair. The rewrite
    * implements EXACT greedy left-to-right symbol merging with plain
    * string `replace` via a DOUBLE-SPACE separator device: separators
    * expand to two spaces, so the pattern ' a  b ' consumes one space
    * of each boundary and adjacent occurrences still match
    * (' a  b  a  b ' → ' ab  ab ', i.e. 'abab' merges BOTH pairs —
    * a single-space sentinel misses every second occurrence in runs);
    * a final '  '→' ' collapse restores canonical form. All three
    * replaces are L2R non-overlapping in both engines, and
    * BpeLearnSpec pins the whole loop against an independent
    * symbol-level reference implementation.
    *
    * Scale shape: the ONLY corpus-sized pass builds the word-frequency
    * table; every round after runs on the VOCABULARY-bounded table
    * (one pair rollup + a 1-row argmax + a map-only rewrite, lineage
    * cut per round) — which is why 30k-merge training over 100 TB is
    * one corpus pass plus 30k cheap vocabulary rounds. */
  def qBpeLearnMerges(s: SparkSession, d: String): DataFrame = {
    val spark0 = s
    import spark0.implicits._
    bpeTrain(s, d).toDF("round", "a", "b", "merged", "pair_count")
      .orderBy(col("round"))
  }

  /** The Sennrich greedy double-space merge rewrite shared by the
    * training rounds and the encoder. */
  private def bpeMergeStep(sp: Column, a: String, b: String): Column = {
    // literals via lit() (never string-interpolated SQL — symbols are
    // arbitrary corpus characters)
    def rep(src: Column, find: Column, to: Column): Column =
      org.apache.spark.sql.functions.replace(src, find, to)
    trim(rep(rep(
      concat(lit(" "), rep(sp, lit(" "), lit("  ")), lit(" ")),
      lit(s" $a  $b "), lit(s" $a$b ")),
      lit("  "), lit(" ")))
  }

  /** The 5-round training loop (the docstring above [[qBpeLearnMerges]]
    * describes the device) returning the merge table — driver-side,
    * bounded at 5 rows, reused by the encoder. */
  private def bpeTrain(s: SparkSession,
      d: String): Seq[(Long, String, String, String, Long)] =
    bpeTrainFull(s, d, None)._1

  /** [[bpeTrain]] plus the trained VOCABULARY: the loop's final table —
    * every distinct word with all 5 merges applied — which is exactly
    * the encoding the per-word encoder would recompute. Returning it
    * lets [[qBpeEncode]] skip a second corpus-wide distinct plus its
    * own replace chain (round-18, guide §2.3 "don't compute things you
    * throw away" in reverse: don't recompute things the loop already
    * materialized). `wordsSrc` optionally supplies an already-derived
    * (w) stream so the corpus is tokenized once across train + encode. */
  private def bpeTrainFull(s: SparkSession, d: String,
      wordsSrc: Option[DataFrame])
      : (Seq[(Long, String, String, String, Long)], DataFrame) = {
    // materialize the vocabulary ONCE before round 1 (guide §2.3):
    // without the cut, round 1's argmax action computes the corpus
    // pass and round 1's own localCheckpoint then recomputes it — the
    // only two corpus-sized jobs in the whole loop, paid twice for one
    // tokenization. Vocabulary-bounded from here on (`w` rides along
    // untouched so the encoder can join the trained forms back).
    var words = wordsSrc.getOrElse(Tables.spread(documents(s, d))
        .select(explode(split(col("text"), " ")).as("w"))
        .filter(length(col("w")) >= 1))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .select(col("w"), expr("concat_ws(' ', transform(sequence(1, length(w)), " +
        "i -> substring(w, i, 1)))").as("sp"), col("freq"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer[(Long, String, String, String, Long)]()
    for (r <- 1 to 5) {
      val best = words.select(col("freq"), split(col("sp"), " ").as("syms"))
        .filter(size(col("syms")) >= 2)
        .select(col("freq"), explode(expr(
          "transform(sequence(1, size(syms) - 1), " +
            "i -> struct(element_at(syms, i) AS a, element_at(syms, i + 1) AS b))")).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1).collect()(0)
      val (a, b, cnt) = (best.getString(0), best.getString(1), best.getLong(2))
      merges += ((r.toLong, a, b, a + b, cnt))
      // lineage cut per round, as in the PageRank loop
      words = words.select(col("w"), bpeMergeStep(col("sp"), a, b).as("sp"),
        col("freq")).localCheckpoint()
    }
    (merges.toSeq, words)
  }

  /** BPE ENCODING (round 13) — the tokenizer APPLIED: the 5 trained
    * merges rewrite the corpus into tokens; every doc reports
    * (n_words, n_tokens, fertility_milli). The distributed-scale
    * insight mirrors training's: encoding runs over the DISTINCT-WORD
    * vocabulary (each word encoded ONCE through a map-only codegen'd
    * replace chain — never per occurrence), and per-doc counts come
    * from joining the word stream against the vocabulary-bounded
    * token-count table (AQE broadcasts it when small). One corpus pass
    * for the vocab, one for the rollup, at any corpus size. */
  def qBpeEncode(s: SparkSession, d: String): DataFrame = {
    // ONE persisted word stream feeds the training loop's vocabulary
    // AND the per-doc rollup probe — the corpus is tokenized once
    // (guide §2.3). The trained table IS the encoded vocabulary (every
    // word with all 5 merges applied), so the old second corpus-wide
    // distinct and the encoder's own replace chain are gone outright.
    val wordStream = QueryCaches.track(Tables.spread(documents(s, d))
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) >= 1)
      .persist())
    // materialize eagerly: the train loop and the probe otherwise race
    // the cold cache (the block-lock convoy signature)
    wordStream.count()
    val (_, trained) = bpeTrainFull(s, d, Some(wordStream.select(col("w"))))
    val wordTokens = trained.select(col("w"),
      size(split(col("sp"), " ")).cast("long").as("toks"))
    wordStream
      .join(wordTokens, "w")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"), sum(col("toks")).as("n_tokens"))
      .withColumn("fertility_milli", expr("1000 * n_tokens div n_words"))
      .orderBy(col("doc_id"))
  }

  /** Filter-pipeline funnel — the per-stage survival report every
    * production cleaning pipeline publishes (CCNet, Gopher §A,
    * RefinedWeb table 2 all report exactly this): docs in / docs out
    * for each sequential stage, where stage N only sees stage N−1's
    * survivors. Stages here: token-length window, language keep,
    * exact-text dedup (keep-lowest-id AMONG SURVIVORS — dedup after
    * filtering, the standard order, and the part naive per-stage
    * counting gets wrong), distinct-token-ratio floor (a repetition
    * screen). All-integer predicates.
    *
    * Scale shape: ONE corpus scan computes every per-doc flag
    * cumulatively (no per-stage re-scan); the dedup stage is the only
    * shuffle (text-keyed window over survivors); the funnel itself is
    * a 4-row aggregate. At 100 TB this is the same one-pass + one
    * dedup-shuffle a real pipeline pays. */
  def qPipelineFunnel(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // truly ONE scan: the dedup keeper flag comes from a conditional
    // window min over ALL rows (non-survivors contribute NULL, so the
    // min is the lowest SURVIVOR id) — no second read, no doc_id join
    val c = documents(s, d).select(col("doc_id"), col("text"), col("lang"),
        split(col("text"), " ").as("ws"))
      .withColumn("n_toks", size(col("ws")).cast("long"))
      .withColumn("p1", col("n_toks").between(20L, 80L))
      .withColumn("p2", col("p1") && (col("lang") === "en"))
      .withColumn("p3", col("p2") && col("doc_id") ===
        min(when(col("p2"), col("doc_id")))
          .over(Window.partitionBy(col("text"))))
      .withColumn("p4", col("p3") &&
        expr("size(array_distinct(ws)) * 100L div n_toks") >= 40L)
      .agg(count(lit(1)).as("n0"),
        sum(when(col("p1"), 1L).otherwise(0L)).as("n1"),
        sum(when(col("p2"), 1L).otherwise(0L)).as("n2"),
        sum(when(col("p3"), 1L).otherwise(0L)).as("n3"),
        sum(when(col("p4"), 1L).otherwise(0L)).as("n4"))
    // one explode over the single agg row, NOT a 4-branch union — the
    // union re-ran the corpus scan + aggregate once per funnel row
    c.select(explode(array(
        struct(lit(1L).as("stage"), lit("token_length").as("name"),
          col("n0").as("docs_in"), col("n1").as("docs_out")),
        struct(lit(2L).as("stage"), lit("lang_en").as("name"),
          col("n1").as("docs_in"), col("n2").as("docs_out")),
        struct(lit(3L).as("stage"), lit("exact_dedup").as("name"),
          col("n2").as("docs_in"), col("n3").as("docs_out")),
        struct(lit(4L).as("stage"), lit("distinct_ratio").as("name"),
          col("n3").as("docs_in"), col("n4").as("docs_out")))).as("r"))
      .select(col("r.stage").as("stage"), col("r.name").as("name"),
        col("r.docs_in").as("docs_in"), col("r.docs_out").as("docs_out"))
      .orderBy(col("stage"))
  }

  /** Naive-Bayes quality classifier — the "fastText classifier"
    * component of GPT-3/LLaMA-class pipelines (Brown et al. 2020 §A;
    * Touvron et al. 2023): a linear bag-of-words model trained to
    * separate a high-quality reference domain from the raw crawl, then
    * swept over the corpus as a keep/drop gate. Here the target domain
    * is lang='en' (the same stand-in [[qDsirSelect]] uses) and the
    * features are B=4096 MD5-hashed unigram buckets.
    *
    * Engine-independence: the model is the per-bucket POSTERIOR in
    * exact integer ppm — ppm(b) = 10⁶·(c_en(b)+1) div (c_en(b)+
    * c_rest(b)+2), add-one smoothed — and a doc is classified en when
    * its summed token posterior beats the corpus prior rate:
    * Σ ppm > n_tokens · prior_ppm (the averaged-posterior NB decision
    * rule). Integer division at ppm resolution keeps the full signal —
    * the log-bitlen device the LM queries use floors to whole bits,
    * which is COARSER than this label's real separation (~±2 bits of
    * true log-odds: a bitlen model degenerates to all-positive; this
    * was measured, not guessed). margin = Σppm − n_tokens·prior_ppm is
    * exact in both engines. The output is the confusion rollup
    * (actual × predicted with margin extrema) — the table a pipeline
    * inspects before trusting the classifier as a filter.
    *
    * Scale shape: like [[qDsirSelect]] the model is B-bounded (4096
    * rows) at any corpus size — two map-side-combined count shuffles
    * train it, the token stream (hashed ONCE, persisted across its
    * consumers) joins the broadcast model, one doc_id rollup scores,
    * and the confusion matrix is a 4-row aggregate. At 100 TB: one
    * corpus pass + bounded broadcasts, the same cost as the real
    * fastText sweep. Magnitudes: 10⁶·count stays in BIGINT below
    * ~9·10¹² tokens per training shard; past that, train the (B-row)
    * model per shard and average the ppm tables — the bm25 idf note's
    * device — before the corpus-wide scoring pass. */
  def qNbQualityClassify(s: SparkSession, d: String): DataFrame = {
    val B = 4096L
    val spark0 = s
    import spark0.implicits._
    val toks = Tables.spread(documents(s, d)
      .select(col("doc_id"), col("lang"), col("text")))
      .as[(Long, String, String)]
      .mapPartitions { it =>
        val memo = new Md5Memo()
        it.flatMap { case (id, lang, text) =>
          if (text == null) Iterator.empty
          else text.split(" ", -1).iterator.map { w =>
            (id, lang, java.lang.Long.remainderUnsigned(memo(w)._1, B))
          }
        }
      }.toDF("doc_id", "lang", "b")
    val cached = QueryCaches.track(toks.persist())
    val en = cached.filter(col("lang") === "en")
      .groupBy("b").agg(count(lit(1)).as("np"))
    val rest = cached.filter(col("lang") =!= "en")
      .groupBy("b").agg(count(lit(1)).as("nn"))
    val model = en.join(rest, Seq("b"), "full_outer")
      .select(col("b"), expr(
        "1000000L * (coalesce(np, 0L) + 1L) div " +
          "(coalesce(np, 0L) + coalesce(nn, 0L) + 2L)").as("ppm"))
    // the corpus-level prior rate (one tiny agg, broadcast scalar):
    // the decision threshold an average token must beat
    val prior = cached.agg(expr(
      "1000000L * sum(CASE WHEN lang = 'en' THEN 1L ELSE 0L END) " +
        "div count(1)").as("prior_ppm"))
    cached.join(model, Seq("b"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("ppm")).as("ppm_sum"))
      .crossJoin(prior)
      .select((col("lang") === "en").as("actual_en"),
        (col("ppm_sum") - col("n_tokens") * col("prior_ppm"))
          .cast("long").as("margin_ppm"))
      .withColumn("predicted_en", col("margin_ppm") > lit(0L))
      .groupBy(col("actual_en"), col("predicted_en"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("margin_ppm")).as("min_margin"),
        max(col("margin_ppm")).as("max_margin"))
      .orderBy(col("actual_en"), col("predicted_en"))
  }

  /** Cross-document n-gram novelty — the per-doc duplication profile
    * Lee et al. 2022 ("Deduplicating Training Data Makes Language
    * Models Better", §5) report alongside dedup: for every document,
    * the fraction of its distinct 3-token shingles whose FIRST corpus
    * occurrence (min doc_id) is an earlier document. Low novelty = the
    * doc is mostly restatement of earlier data — exactly the mass a
    * near-dup pass should be removing, and the number that says
    * whether it did. Emits the 30 least-novel docs in exact integer
    * permyriad.
    *
    * Shares [[shingleRows]] with the whole jaccard/minhash family —
    * ONE tokenization definition corpus-wide. Scale shape: one
    * shingle-keyed shuffle builds first-occurrence, and the join back
    * is on the SAME key (no second wide shuffle of the big side); per
    * doc one rollup. At 100 TB the shingle strings on the wire would
    * ride as 16-byte md5 keys like [[qDedupSubstring]] — same plan,
    * narrower payload. */
  def qNgramNovelty(s: SparkSession, d: String): DataFrame = {
    val sh = shingleRows(documents(s, d))
    val first = sh.groupBy(col("s")).agg(min(col("doc_id")).as("fd"))
    sh.join(first, Seq("s"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("fd") < col("doc_id"), 1L).otherwise(0L)).as("n_seen"))
      .withColumn("novelty_permyriad",
        expr("(n_shingles - n_seen) * 10000L div n_shingles"))
      .orderBy(col("novelty_permyriad").asc, col("doc_id"))
      .limit(30)
  }

  /** Tokenizer fertility per language — subword tokens per whitespace
    * word, the standard metric multilingual tokenizer evaluations
    * quote (a fertility far above ~1.3 means the vocabulary serves
    * that language badly: more sequence length per sentence, higher
    * training cost). Uses the corpus's two tokenizers from
    * [[qTokenCount]] (whitespace vs BPE-ish regex) so the fertility is
    * their exact ratio in integer permille; one map + one lang rollup,
    * no joins. */
  def qTokenizerFertility(s: SparkSession, d: String): DataFrame =
    documents(s, d).select(col("lang"),
        size(split(col("text"), "\\s+")).cast("long").as("ws"),
        size(regexp_extract_all(col("text"),
          lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))).cast("long").as("re"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("ws")).as("ws_tokens"),
        sum(col("re")).as("subword_tokens"))
      .withColumn("fertility_milli",
        expr("subword_tokens * 1000L div ws_tokens"))
      .orderBy(col("lang"))

  /** Passage-level dedup — the Dolma paragraph / CCNet line dedup
    * reduced to this corpus's flat word-stream texts: non-overlapping
    * 32-token passages, every non-FIRST occurrence corpus-wide is a
    * drop (first = smallest (doc_id, position); within-doc repeats
    * count too — exactly the boilerplate removal those pipelines run
    * before document-level dedup). Emits the 30 worst-retained docs
    * with exact permyriad retention. Differs from [[qNgramNovelty]]
    * (an overlapping-shingle PROFILE of restatement) in being the
    * removal operator itself at removal granularity.
    *
    * The first-occurrence winner is min(doc_id·4096 + position) — one
    * integer both engines order identically; 4096 bounds passages per
    * doc (≥ 131k tokens) on this corpus, and the general form swaps
    * the combo for a min over a (doc_id, position) struct. One
    * passage-keyed shuffle + same-key join back + doc rollup, the
    * [[qNgramNovelty]] scale shape at 32× coarser granularity. */
  def qPassageDedup(s: SparkSession, d: String): DataFrame = {
    val P = 32
    val pass = documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("ts"))
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, CAST(floor((size(ts) - 1) / $P) AS INT)), " +
          s"i -> array_join(slice(ts, 1 + i * $P, $P), ' '))")))
      .select(col("doc_id"), col("pos").cast("long").as("pid"),
        col("col").as("p"))
    val first = pass.groupBy(col("p"))
      .agg(min(col("doc_id") * 4096L + col("pid")).as("wcombo"))
    pass.join(first, Seq("p"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_passages"),
        sum(when(col("wcombo") < col("doc_id") * 4096L + col("pid"), 1L)
          .otherwise(0L)).as("n_dropped"))
      .withColumn("retained_permyriad",
        expr("(n_passages - n_dropped) * 10000L div n_passages"))
      .orderBy(col("retained_permyriad").asc, col("doc_id"))
      .limit(30)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ngram_novelty" -> qNgramNovelty,
    "tokenizer_fertility" -> qTokenizerFertility,
    "passage_dedup" -> qPassageDedup,
    "nb_quality_classify" -> qNbQualityClassify,
    "bm25_topk" -> qBm25TopK,
    "bpe_pair_counts" -> qBpePairCounts,
    "pipeline_funnel" -> qPipelineFunnel,
    "perplexity_buckets" -> qPerplexityBuckets,
    "dsir_select" -> qDsirSelect,
    "lm_perplexity" -> qLmPerplexity,
    "data_mixture" -> qDataMixture,
    "dedup_substring" -> qDedupSubstring,
    "gopher_filter" -> qGopherFilter,
    "doc_chunking" -> qDocChunking,
    "doc_packing" -> qDocPacking,
    "keyword_extraction" -> qKeywordExtraction,
    "contamination_check" -> qContamination,
    "pii_redact" -> qPiiRedact,
    "repetition_stats" -> qRepetitionStats,
    "stratified_sample" -> qStratifiedSample,
    "dedup_exact" -> qDedupExact,
    "dedup_ngram_jaccard" -> qNgramJaccard,
    "dedup_clusters" -> qDedupClusters,
    "dedup_retention" -> qDedupRetention,
    "train_test_split" -> qTrainTestSplit,
    "bigram_counts" -> qBigramCounts,
    "dedup_minhash" -> qMinhashDedup,
    "minhash_accuracy" -> qMinhashAccuracy,
    "dedup_simhash" -> qSimhashDedup,
    "simhash_clusters" -> qSimhashClusters,
    "text_stats" -> qTextStats,
    "token_count" -> qTokenCount,
    "lang_id" -> qLangId,
    "quality_score" -> qQualityScore,
    "doc_fingerprint" -> qDocFingerprint,
    "token_frequency" -> qTokenFrequency,
    "inverted_index" -> qInvertedIndex,
    "vocab_growth" -> qVocabGrowth,
    "ngram_diversity" -> qNgramDiversity,
    "collocations" -> qCollocations,
    "fuzzy_vocab_join" -> qFuzzyVocabJoin,
    "hash_split" -> qHashSplit,
    "split_contamination" -> qSplitContamination,
    "winnow_fingerprint" -> qWinnowFingerprint,
    "heavy_hitters" -> qHeavyHitters,
    "bloom_dedup" -> qBloomDedup,
    "data_mixture_temperature" -> qDataMixtureTemperature,
    "source_balance_gini" -> qSourceBalanceGini,
    "c4_filter" -> qC4Filter,
    "bpe_learn_merges" -> qBpeLearnMerges,
    "bpe_encode" -> qBpeEncode,
    "lang_confusion" -> qLangConfusion,
    "doc_length_histogram" -> qDocLengthHistogram,
    "multimodal_meta" -> qMultimodalMeta,
  )

  /** ONE SQL definition of the lang-id predictor, consumed by both the
    * `lang_id` oracle and the `lang_confusion` rollup oracle so the
    * predictor can never drift between them. */
  private val langIdOracleSql: String =
    """SELECT doc_id, lang,
      |  CAST((length(text) - length(replace(text, 'table', ''))) / 5 AS BIGINT) AS s_en,
      |  CAST((length(text) - length(replace(text, 'scan', ''))) / 4 AS BIGINT) AS s_de,
      |  CAST((length(text) - length(replace(text, 'join', ''))) / 4 AS BIGINT) AS s_fr,
      |  CASE WHEN (length(text) - length(replace(text, 'table', ''))) / 5 >= (length(text) - length(replace(text, 'scan', ''))) / 4
      |        AND (length(text) - length(replace(text, 'table', ''))) / 5 >= (length(text) - length(replace(text, 'join', ''))) / 4
      |       THEN 'en'
      |       WHEN (length(text) - length(replace(text, 'scan', ''))) / 4 >= (length(text) - length(replace(text, 'join', ''))) / 4
      |       THEN 'de' ELSE 'fr' END AS predicted
      |FROM documents ORDER BY doc_id""".stripMargin

  /** BPE-training oracle: 5 merge rounds UNROLLED by a Scala loop into
    * MATERIALIZED CTEs (plain chained CTEs inline exponentially in
    * DuckDB — the mmr_diversify lesson); each round re-derives the
    * argmax pair itself and applies it via the cross-joined 1-row CTE,
    * so no value is ever string-interpolated into the SQL. */
  /** The shared training CTE chain `w0..w5, b1..b5` (merge argmaxes in
    * b1..b5), composed by both the learn oracle and the encode oracle. */
  private def bpeTrainCtes: String = {
    val sb = new StringBuilder
    sb.append(
      """WITH w0 AS MATERIALIZED (
        |  SELECT array_to_string(
        |      list_transform(generate_series(1, len(w)), i -> w[i]), ' ') AS sp,
        |    freq
        |  FROM (SELECT tok AS w, count(*) AS freq FROM (
        |          SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        |        GROUP BY tok)
        |  WHERE len(w) >= 1
        |)""".stripMargin)
    for (r <- 1 to 5) {
      val prev = s"w${r - 1}"
      sb.append(
        s""", p$r AS MATERIALIZED (
           |  SELECT syms[i] AS a, syms[i+1] AS b, CAST(sum(freq) AS BIGINT) AS cnt
           |  FROM (SELECT string_split(sp, ' ') AS syms, freq FROM $prev) t,
           |       LATERAL (SELECT unnest(generate_series(1, len(syms) - 1)) AS i) g
           |  GROUP BY 1, 2
           |), b$r AS MATERIALIZED (
           |  SELECT a, b, cnt FROM p$r ORDER BY cnt DESC, a, b LIMIT 1
           |), w$r AS MATERIALIZED (
           |  SELECT trim(replace(replace(
           |      ' ' || replace(w.sp, ' ', '  ') || ' ',
           |      ' ' || b.a || '  ' || b.b || ' ', ' ' || b.a || b.b || ' '),
           |      '  ', ' ')) AS sp,
           |    w.freq
           |  FROM $prev w, b$r b
           |)""".stripMargin)
    }
    sb.toString
  }

  private def bpeLearnOracleSql: String =
    bpeTrainCtes + "\nSELECT * FROM (" + (1 to 5).map { r =>
      s"SELECT CAST($r AS BIGINT) AS round, a, b, a || b AS merged, cnt AS pair_count FROM b$r"
    }.mkString("\n UNION ALL ") + ") ORDER BY round"

  /** Encode oracle: the trained merges applied to the DISTINCT-WORD
    * vocabulary (e1..e5 mirror the Spark encoder's replace chain), then
    * the per-doc rollup over the word stream. */
  private def bpeEncodeOracleSql: String = {
    val sb = new StringBuilder
    sb.append(bpeTrainCtes)
    sb.append(
      """, vocab AS MATERIALIZED (
        |  SELECT w, array_to_string(
        |      list_transform(generate_series(1, len(w)), i -> w[i]), ' ') AS sp
        |  FROM (SELECT DISTINCT tok AS w FROM (
        |          SELECT unnest(string_split(text, ' ')) AS tok FROM documents))
        |  WHERE len(w) >= 1
        |)""".stripMargin)
    for (r <- 1 to 5) {
      val prev = if (r == 1) "vocab" else s"e${r - 1}"
      sb.append(
        s""", e$r AS MATERIALIZED (
           |  SELECT v.w, trim(replace(replace(
           |      ' ' || replace(v.sp, ' ', '  ') || ' ',
           |      ' ' || b.a || '  ' || b.b || ' ', ' ' || b.a || b.b || ' '),
           |      '  ', ' ')) AS sp
           |  FROM $prev v, b$r b
           |)""".stripMargin)
    }
    sb.append(
      """, wt AS (
        |  SELECT w, CAST(len(string_split(sp, ' ')) AS BIGINT) AS toks FROM e5
        |)
        |SELECT d.doc_id, count(*) AS n_words,
        |  CAST(sum(wt.toks) AS BIGINT) AS n_tokens,
        |  (1000 * CAST(sum(wt.toks) AS BIGINT)) // count(*) AS fertility_milli
        |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |      FROM documents) d
        |JOIN wt USING (w)
        |GROUP BY d.doc_id ORDER BY doc_id""".stripMargin)
    sb.toString
  }

  /** Shared DuckDB CTE chain reconstructing the ngram-jaccard near-dup
    * edges and the transitive min-label reachability both cluster
    * oracles consume (kept in ONE place so the two can never drift). */
  private val clusterLabelCtes: String =
    """WITH RECURSIVE w AS (
      |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
      |  WHERE len(string_split(text, ' ')) >= 3
      |), sh AS (
      |  SELECT DISTINCT doc_id, ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] AS s
      |  FROM w, (SELECT unnest(range(len(ws) - 2)) AS i) t
      |), sizes AS (
      |  SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id
      |), inter AS (
      |  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS n
      |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2
      |), pairs AS (
      |  SELECT da, db FROM inter
      |  JOIN sizes sa ON da = sa.doc_id
      |  JOIN sizes sb ON db = sb.doc_id
      |  WHERE n / (sa.sz + sb.sz - n) >= 0.5
      |), edges AS (
      |  SELECT da AS a, db AS b FROM pairs
      |  UNION ALL SELECT db, da FROM pairs
      |), reach AS (
      |  SELECT DISTINCT a AS node, a AS label FROM edges
      |  UNION
      |  SELECT e.a, r.label FROM edges e JOIN reach r ON r.node = e.b
      |)""".stripMargin

  /** Bigram-LM model + per-doc rollup CTEs shared by the
    * `lm_perplexity` and `perplexity_buckets` oracles — one SQL
    * definition of the model so the two cannot drift (the Spark twin
    * is the shared [[lmDocBits]]). Ends in
    * `agg(doc_id, n_bigrams, total_bits)`. */
  private def lmOracleCtes: String =
    """w AS (
      |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
      |), tok AS (
      |  SELECT unnest(ws) AS w FROM w
      |), vocab AS (
      |  SELECT count(DISTINCT w) AS v FROM tok
      |), bg AS (
      |  SELECT doc_id, ws[i+1] AS w1, ws[i+2] AS w2
      |  FROM w, (SELECT unnest(range(len(ws) - 1)) AS i) t
      |), c2 AS (
      |  SELECT w1, w2, count(*) AS n2 FROM bg GROUP BY 1, 2
      |), c1 AS (
      |  SELECT w1, count(*) AS n1 FROM bg GROUP BY 1
      |), model AS (
      |  SELECT w1, w2,
      |    CAST(length(bin(n1 + v)) - length(bin(n2 + 1)) AS BIGINT) AS bits
      |  FROM c2 JOIN c1 USING (w1) CROSS JOIN vocab
      |), agg AS (
      |  SELECT doc_id, count(*) AS n_bigrams,
      |    CAST(sum(bits) AS BIGINT) AS total_bits
      |  FROM bg JOIN model USING (w1, w2) GROUP BY 1
      |)""".stripMargin

  /** BM25 scoring CTE chain ending in `bmdoc(doc_id, n_terms, score)`
    * — one SQL definition of the scorer shared by the `bm25_topk`
    * oracle and the `rrf_fusion` oracle (the Spark twin is the shared
    * [[bm25Scored]]). */
  private[queries] def bm25OracleCtes: String =
    """docs AS (
      |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
      |), st AS (
      |  SELECT count(*) AS n, CAST(sum(len(ws)) AS BIGINT) AS sumdl,
      |    CAST(1000 * sum(len(ws)) AS BIGINT) // count(*) AS am FROM docs
      |), tf AS (
      |  SELECT doc_id, dl, tok, count(*) AS tf FROM (
      |    SELECT doc_id, CAST(len(ws) AS BIGINT) AS dl, unnest(ws) AS tok
      |    FROM docs)
      |  WHERE tok IN ('dup', 'vector', 'batch') GROUP BY doc_id, dl, tok
      |), dfreq AS (
      |  SELECT tok, count(*) AS df FROM tf GROUP BY tok
      |), sc AS (
      |  SELECT tf.doc_id,
      |    length(bin((st.n+1)*(st.n+1) // ((dfreq.df+1)*(dfreq.df+1)))) *
      |      ((44 * st.am * tf.tf * 1000) //
      |       (20 * st.am * tf.tf + 6 * st.am + 18000 * tf.dl))
      |      AS contrib
      |  FROM tf JOIN dfreq USING (tok) CROSS JOIN st
      |), bmdoc AS (
      |  SELECT doc_id, count(*) AS n_terms, CAST(sum(contrib) AS BIGINT) AS score
      |  FROM sc GROUP BY doc_id
      |)""".stripMargin

  /** Shared minhash oracle CTEs (ending in `cand(da, db)`, with `sh`
    * and `sig` live for downstream use) + the 16-slot match-count
    * expression — h0..h15 and the 4 band keys are GENERATED so the
    * constants can never drift from the Spark side (same k, p,
    * double-hash family). */
  private def minhashOracleParts: (String, String) = {
    val sigExprs = (0 until 16)
      .map(i => s"min((a + $i * b) % 2147483647) AS h$i").mkString(", ")
    val bandSelects = (0 until 4).map { bnd =>
      val key = (0 until 4).map(j => s"h${bnd * 4 + j}::VARCHAR").mkString(" || '_' || ")
      s"SELECT doc_id, $bnd AS band, $key AS bucket FROM sig"
    }.mkString(" UNION ALL ")
    val matchSum = (0 until 16)
      .map(i => s"CASE WHEN sa.h$i = sb.h$i THEN 1 ELSE 0 END").mkString(" + ")
    val ctes =
      s"""w AS (
         |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
         |  WHERE len(string_split(text, ' ')) >= 3
         |), sh AS (
         |  SELECT DISTINCT doc_id, ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] AS s
         |  FROM w, (SELECT unnest(range(len(ws) - 2)) AS i) t
         |), hashed AS (
         |  SELECT doc_id,
         |    CAST(md5_number_lower(s) % 2147483647 AS BIGINT) AS a,
         |    CAST(md5_number_upper(s) % 2147483647 AS BIGINT) AS b
         |  FROM sh
         |), sig AS (
         |  SELECT doc_id, $sigExprs FROM hashed GROUP BY doc_id
         |), bands AS (
         |  $bandSelects
         |), cand AS (
         |  SELECT DISTINCT l.doc_id AS da, r.doc_id AS db
         |  FROM bands l JOIN bands r
         |    ON l.band = r.band AND l.bucket = r.bucket AND l.doc_id < r.doc_id
         |)""".stripMargin
    (ctes, matchSum)
  }

  val oracles: Map[String, String] = Map(
    "passage_dedup" ->
      """WITH w AS (
        |  SELECT doc_id, string_split(text, ' ') AS ts FROM documents
        |), pass AS (
        |  SELECT doc_id, CAST(i AS BIGINT) AS pid,
        |    array_to_string(ts[1 + i*32 : 32 + i*32], ' ') AS p
        |  FROM w, (SELECT unnest(range((len(ts) - 1) // 32 + 1)) AS i) t
        |), fo AS (
        |  SELECT p, min(doc_id * 4096 + pid) AS wcombo FROM pass GROUP BY p
        |), agg AS (
        |  SELECT pass.doc_id, count(*) AS n_passages,
        |    CAST(sum(CASE WHEN fo.wcombo < pass.doc_id * 4096 + pass.pid
        |             THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
        |  FROM pass JOIN fo USING (p) GROUP BY pass.doc_id
        |)
        |SELECT doc_id, n_passages, n_dropped,
        |  (n_passages - n_dropped) * 10000 // n_passages AS retained_permyriad
        |FROM agg ORDER BY retained_permyriad ASC, doc_id LIMIT 30""".stripMargin,
    "tokenizer_fertility" ->
      """SELECT lang, count(*) AS n_docs,
        |  CAST(sum(len(regexp_split_to_array(text, '\s+'))) AS BIGINT) AS ws_tokens,
        |  CAST(sum(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]'))) AS BIGINT) AS subword_tokens,
        |  CAST(sum(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]'))) * 1000
        |    // sum(len(regexp_split_to_array(text, '\s+'))) AS BIGINT) AS fertility_milli
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "ngram_novelty" ->
      """WITH w AS (
        |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        |  WHERE len(string_split(text, ' ')) >= 3
        |), sh AS (
        |  SELECT DISTINCT doc_id, ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] AS s
        |  FROM w, (SELECT unnest(range(len(ws) - 2)) AS i) t
        |), fo AS (
        |  SELECT s, min(doc_id) AS fd FROM sh GROUP BY s
        |), agg AS (
        |  SELECT sh.doc_id, count(*) AS n_shingles,
        |    CAST(sum(CASE WHEN fo.fd < sh.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_seen
        |  FROM sh JOIN fo USING (s) GROUP BY sh.doc_id
        |)
        |SELECT doc_id, n_shingles, n_seen,
        |  (n_shingles - n_seen) * 10000 // n_shingles AS novelty_permyriad
        |FROM agg ORDER BY novelty_permyriad ASC, doc_id LIMIT 30""".stripMargin,
    "nb_quality_classify" ->
      """WITH w AS (
        |  SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents
        |), tb AS (
        |  SELECT doc_id, lang, md5_number_lower(tkn) % 4096 AS b
        |  FROM (SELECT doc_id, lang, unnest(ws) AS tkn FROM w)
        |), pos AS (
        |  SELECT b, count(*) AS np FROM tb WHERE lang = 'en' GROUP BY 1
        |), neg AS (
        |  SELECT b, count(*) AS nn FROM tb WHERE lang <> 'en' GROUP BY 1
        |), model AS (
        |  SELECT b, CAST(1000000 * (COALESCE(np, 0) + 1) //
        |    (COALESCE(np, 0) + COALESCE(nn, 0) + 2) AS BIGINT) AS ppm
        |  FROM pos FULL JOIN neg USING (b)
        |), tot AS (
        |  SELECT CAST(1000000 * sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
        |    // count(*) AS BIGINT) AS prior_ppm
        |  FROM tb
        |), scored AS (
        |  SELECT t.lang = 'en' AS actual_en,
        |    CAST(sum(m.ppm) - count(*) * tot.prior_ppm AS BIGINT) AS margin_ppm
        |  FROM tb t JOIN model m USING (b) CROSS JOIN tot
        |  GROUP BY t.doc_id, t.lang, tot.prior_ppm
        |)
        |SELECT actual_en, margin_ppm > 0 AS predicted_en,
        |  count(*) AS n_docs,
        |  min(margin_ppm) AS min_margin, max(margin_ppm) AS max_margin
        |FROM scored GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "bm25_topk" ->
      s"""WITH $bm25OracleCtes
         |SELECT doc_id, n_terms, score
         |FROM bmdoc ORDER BY score DESC, doc_id LIMIT 25""".stripMargin,
    "perplexity_buckets" ->
      s"""WITH $lmOracleCtes, scored AS (
        |  SELECT doc_id, total_bits * 1000 // n_bigrams AS mbits,
        |    ntile(3) OVER (ORDER BY total_bits * 1000 // n_bigrams, doc_id)
        |      AS bucket
        |  FROM agg
        |)
        |SELECT CAST(bucket AS BIGINT) AS bucket, count(*) AS n_docs,
        |  min(mbits) AS min_mbits, max(mbits) AS max_mbits
        |FROM scored GROUP BY bucket ORDER BY bucket""".stripMargin,
    "pipeline_funnel" ->
      """WITH f AS (
        |  SELECT doc_id, text, lang, string_split(text, ' ') AS ws,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
        |  FROM documents
        |), f1 AS (
        |  SELECT *, n_toks BETWEEN 20 AND 80 AS p1 FROM f
        |), f2 AS (
        |  SELECT *, p1 AND lang = 'en' AS p2 FROM f1
        |), k AS (
        |  SELECT doc_id, ws, n_toks,
        |    doc_id = min(doc_id) OVER (PARTITION BY text) AS p3
        |  FROM f2 WHERE p2
        |), k4 AS (
        |  SELECT doc_id, p3,
        |    p3 AND (len(list_distinct(ws)) * 100) // n_toks >= 40 AS p4
        |  FROM k
        |), c AS (
        |  SELECT
        |    (SELECT count(*) FROM f) AS n0,
        |    (SELECT count(*) FROM f1 WHERE p1) AS n1,
        |    (SELECT count(*) FROM f2 WHERE p2) AS n2,
        |    (SELECT count(*) FROM k4 WHERE p3) AS n3,
        |    (SELECT count(*) FROM k4 WHERE p4) AS n4
        |)
        |SELECT * FROM (
        |  SELECT CAST(1 AS BIGINT) AS stage, 'token_length' AS name,
        |    n0 AS docs_in, n1 AS docs_out FROM c
        |  UNION ALL SELECT 2, 'lang_en', n1, n2 FROM c
        |  UNION ALL SELECT 3, 'exact_dedup', n2, n3 FROM c
        |  UNION ALL SELECT 4, 'distinct_ratio', n3, n4 FROM c)
        |ORDER BY stage""".stripMargin,
    "bpe_pair_counts" ->
      """WITH words AS (
        |  SELECT tok AS w, count(*) AS freq FROM (
        |    SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        |  GROUP BY tok
        |), pairs AS (
        |  SELECT substring(w, i, 1) AS a, substring(w, i + 1, 1) AS b, freq
        |  FROM words, LATERAL (SELECT unnest(generate_series(1, len(w) - 1)) AS i) t
        |  WHERE len(w) >= 2
        |)
        |SELECT a, b, CAST(sum(freq) AS BIGINT) AS pair_count
        |FROM pairs GROUP BY a, b ORDER BY pair_count DESC, a, b LIMIT 25""".stripMargin,
    "gopher_filter" -> {
      val stopCases = gopherStopwords
        .map(w => s"(CASE WHEN list_contains(ws, '$w') THEN 1 ELSE 0 END)")
        .mkString(" + ")
      s"""WITH b AS (
         |  SELECT doc_id, string_split(coalesce(text, ''), ' ') AS ws,
         |    coalesce(text, '') AS t
         |  FROM documents
         |), m AS (
         |  SELECT doc_id,
         |    CAST(len(ws) AS BIGINT) AS n_words,
         |    CAST(len(t) - (len(ws) - 1) AS BIGINT) AS sum_len,
         |    CAST(len(t) - len(replace(t, '#', '')) AS BIGINT) AS hashes,
         |    CAST((len(t) - len(replace(t, '...', ''))) // 3 AS BIGINT) AS ellipses,
         |    CAST(len(list_filter(ws, w -> regexp_matches(w, '[a-zA-Z]'))) AS BIGINT) AS alpha_words,
         |    CAST($stopCases AS BIGINT) AS stop_hits
         |  FROM b
         |), r AS (
         |  SELECT doc_id, n_words,
         |    (n_words >= 50 AND n_words <= 100000) AS r1,
         |    (sum_len >= n_words * 3 AND sum_len <= n_words * 10) AS r2,
         |    ((hashes + ellipses) * 10 <= n_words) AS r3,
         |    (alpha_words * 5 >= n_words * 4) AS r4,
         |    (stop_hits >= 2) AS r5
         |  FROM m
         |)
         |SELECT doc_id, n_words,
         |  (r1 AND r2 AND r3 AND r4 AND r5) AS keep,
         |  concat_ws(',',
         |    CASE WHEN NOT r1 THEN 'word_count' END,
         |    CASE WHEN NOT r2 THEN 'mean_word_len' END,
         |    CASE WHEN NOT r3 THEN 'symbol_ratio' END,
         |    CASE WHEN NOT r4 THEN 'alpha_words' END,
         |    CASE WHEN NOT r5 THEN 'stopwords' END) AS reasons
         |FROM r ORDER BY doc_id""".stripMargin
    },
    "dedup_substring" ->
      """WITH w AS (
        |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        |  WHERE len(string_split(text, ' ')) >= 20
        |), wins AS (
        |  SELECT doc_id, md5(array_to_string(ws[i+1:i+20], ' ')) AS h
        |  FROM w, (SELECT unnest(range(len(ws) - 19)) AS i) t
        |), dup AS (
        |  SELECT h FROM wins GROUP BY h HAVING count(DISTINCT doc_id) >= 2
        |), marked AS (
        |  SELECT wins.doc_id, CASE WHEN dup.h IS NULL THEN 0 ELSE 1 END AS d
        |  FROM wins LEFT JOIN dup ON wins.h = dup.h
        |)
        |SELECT doc_id, count(*) AS n_windows,
        |  CAST(sum(d) AS BIGINT) AS n_dup_windows,
        |  (CAST(sum(d) AS BIGINT) * 10000) // count(*) AS dup_permyriad
        |FROM marked GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "keyword_extraction" ->
      """WITH tf AS (
        |  SELECT doc_id, tok, count(*) AS tf FROM (
        |    SELECT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS tok
        |    FROM documents)
        |  WHERE len(tok) > 0 GROUP BY doc_id, tok),
        |dfreq AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
        |r AS (
        |  SELECT tf.doc_id, tf.tok, tf.tf, dfreq.df,
        |    row_number() OVER (PARTITION BY tf.doc_id
        |      ORDER BY tf.tf DESC, dfreq.df ASC, tf.tok) AS rn
        |  FROM tf JOIN dfreq USING (tok))
        |SELECT doc_id, rn, tok, tf, df FROM r WHERE rn <= 3
        |ORDER BY doc_id, rn""".stripMargin,
    "doc_packing" ->
      """WITH tok AS (
        |  SELECT doc_id, doc_id % 8 AS shard,
        |    len(regexp_split_to_array(text, '\s+')) AS n_tokens
        |  FROM documents),
        |pk AS (
        |  SELECT shard, doc_id, n_tokens,
        |    CAST(floor((sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id)
        |      - n_tokens) / 256.0) AS BIGINT) AS pack_id
        |  FROM tok)
        |SELECT shard, pack_id, count(*) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS pack_tokens,
        |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM pk GROUP BY shard, pack_id ORDER BY shard, pack_id""".stripMargin,
    "doc_chunking" ->
      """WITH tok AS (
        |  SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        |ch AS (
        |  SELECT doc_id, ts,
        |    unnest(generate_series(0, CAST(floor((len(ts) - 1) / 48) AS BIGINT)))
        |      AS chunk_id
        |  FROM tok)
        |SELECT doc_id, chunk_id,
        |  len(list_slice(ts, 1 + chunk_id * 48, chunk_id * 48 + 64)) AS n_tokens,
        |  array_to_string(list_slice(ts, 1 + chunk_id * 48, chunk_id * 48 + 64), ' ')
        |    AS chunk_text
        |FROM ch ORDER BY doc_id, chunk_id""".stripMargin,
    "contamination_check" ->
      """WITH sh AS (
        |  SELECT DISTINCT doc_id, sh FROM (
        |    SELECT doc_id,
        |      substr(text, unnest(generate_series(1, length(text) - 19)), 20) AS sh
        |    FROM documents WHERE length(text) >= 20))
        |SELECT c.doc_id,
        |  count(DISTINCT c.sh) AS overlap_shingles,
        |  count(DISTINCT b.doc_id) AS bench_docs_hit
        |FROM (SELECT * FROM sh WHERE doc_id % 100 <> 0) c
        |JOIN (SELECT * FROM sh WHERE doc_id % 100 = 0) b ON c.sh = b.sh
        |GROUP BY c.doc_id ORDER BY c.doc_id""".stripMargin,
    "pii_redact" ->
      """WITH raw AS (
        |  SELECT doc_id,
        |    text || ' contact user' || CAST(doc_id AS VARCHAR)
        |      || '@example.com or 555-'
        |      || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-'
        |      || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
        |      || ' at 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7' AS raw
        |  FROM documents)
        |SELECT doc_id,
        |  regexp_replace(regexp_replace(regexp_replace(raw,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b\d{3}-\d{3}-\d{4}\b', '<PHONE>', 'g'),
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS redacted,
        |  len(regexp_extract_all(raw,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails
        |FROM raw ORDER BY doc_id""".stripMargin,
    "repetition_stats" ->
      """WITH cnt AS (
        |  SELECT doc_id, token, count(*) AS n
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |        FROM documents)
        |  GROUP BY doc_id, token)
        |SELECT doc_id,
        |  CAST(sum(n) AS BIGINT) AS n_tokens,
        |  count(*) AS n_distinct,
        |  round(max(n) * 1.0 / sum(n), 6) AS top_token_frac,
        |  round(1.0 - count(*) * 1.0 / sum(n), 6) AS dup_token_frac
        |FROM cnt GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "stratified_sample" ->
      """SELECT lang, count(*) AS n_sampled,
        |  min(doc_id) AS min_doc, max(doc_id) AS max_doc,
        |  round(avg(n_chars), 4) AS avg_chars
        |FROM documents
        |WHERE (doc_id * 2654435761) % 1000 <
        |  CASE WHEN lang = 'en' THEN 500 WHEN lang = 'de' THEN 200 ELSE 100 END
        |GROUP BY lang ORDER BY lang""".stripMargin,
    "dedup_exact" ->
      """SELECT min(doc_id) AS keeper, count(*) AS n_copies
        |FROM documents GROUP BY text ORDER BY keeper""".stripMargin,
    "dedup_ngram_jaccard" ->
      """WITH w AS (
        |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        |  WHERE len(string_split(text, ' ')) >= 3
        |), sh AS (
        |  SELECT DISTINCT doc_id, ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] AS s
        |  FROM w, (SELECT unnest(range(len(ws) - 2)) AS i) t
        |), sizes AS (
        |  SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id
        |), inter AS (
        |  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS n
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT da, db, round(n / (sa.sz + sb.sz - n), 4) AS jaccard
        |FROM inter
        |JOIN sizes sa ON da = sa.doc_id
        |JOIN sizes sb ON db = sb.doc_id
        |WHERE n / (sa.sz + sb.sz - n) >= 0.5
        |ORDER BY da, db""".stripMargin,
    "dedup_clusters" ->
      s"""$clusterLabelCtes
        |SELECT node AS doc_id, min(label) AS cluster_id
        |FROM reach GROUP BY node ORDER BY doc_id""".stripMargin,
    // same labeling CTEs, applied as the keep-min-representative policy
    "dedup_retention" ->
      s"""$clusterLabelCtes, labels AS (
        |  SELECT node AS doc_id, min(label) AS cluster_id
        |  FROM reach GROUP BY node
        |)
        |SELECT d.source, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN l.cluster_id IS NULL OR l.cluster_id = d.doc_id
        |                THEN 1 ELSE 0 END) AS BIGINT) AS kept_docs,
        |  CAST(sum(CASE WHEN l.cluster_id IS NOT NULL AND l.cluster_id <> d.doc_id
        |                THEN d.n_chars ELSE 0 END) AS BIGINT) AS dropped_chars
        |FROM documents d LEFT JOIN labels l ON d.doc_id = l.doc_id
        |GROUP BY d.source ORDER BY d.source""".stripMargin,
    "dedup_minhash" -> {
      val (ctes, matchSum) = minhashOracleParts
      s"""WITH $ctes
         |SELECT da, db, round(($matchSum) / 16.0, 4) AS est_sim
         |FROM cand JOIN sig sa ON sa.doc_id = da JOIN sig sb ON sb.doc_id = db
         |WHERE ($matchSum) / 16.0 >= 0.5
         |ORDER BY da, db""".stripMargin
    },
    // est permille vs exact shingle-set jaccard for EVERY banded
    // candidate; integer arithmetic end-to-end, ≤21 bucket rows
    "minhash_accuracy" -> {
      val (ctes, matchSum) = minhashOracleParts
      s"""WITH $ctes, sizes AS (
         |  SELECT doc_id, count(*) AS n FROM sh GROUP BY 1
         |), inter AS (
         |  SELECT c.da, c.db, count(*) AS ni
         |  FROM cand c
         |  JOIN sh x ON x.doc_id = c.da
         |  JOIN sh y ON y.doc_id = c.db AND y.s = x.s
         |  GROUP BY 1, 2
         |), scored AS (
         |  SELECT c.da, c.db,
         |    (1000 * ($matchSum)) // 16 AS est_pm,
         |    (1000 * coalesce(i.ni, 0))
         |      // (na.n + nb.n - coalesce(i.ni, 0)) AS jac_pm
         |  FROM cand c
         |  JOIN sig sa ON sa.doc_id = c.da
         |  JOIN sig sb ON sb.doc_id = c.db
         |  LEFT JOIN inter i ON i.da = c.da AND i.db = c.db
         |  JOIN sizes na ON na.doc_id = c.da
         |  JOIN sizes nb ON nb.doc_id = c.db
         |)
         |SELECT abs(est_pm - jac_pm) // 50 AS err_bucket,
         |  count(*) AS n_pairs,
         |  CAST(min(abs(est_pm - jac_pm)) AS BIGINT) AS min_err,
         |  CAST(max(abs(est_pm - jac_pm)) AS BIGINT) AS max_err
         |FROM scored GROUP BY 1 ORDER BY err_bucket""".stripMargin
    },
    "dedup_simhash" ->
      """WITH words AS (
        |  SELECT DISTINCT doc_id, w FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
        |), hv AS (
        |  SELECT doc_id, md5_number_lower(w) AS h FROM words
        |), votes AS (
        |  SELECT doc_id, b,
        |    CASE WHEN sum(CASE WHEN ((h >> b) & 1) = 1 THEN 1 ELSE -1 END) > 0
        |         THEN 1 ELSE 0 END AS bit
        |  FROM hv, (SELECT unnest(range(64)) AS b) t
        |  GROUP BY doc_id, b
        |), bands AS (
        |  SELECT doc_id, b // 16 AS band,
        |    CAST(sum(bit * (1::BIGINT << (b % 16))) AS BIGINT) AS bucket
        |  FROM votes GROUP BY doc_id, b // 16
        |), cand AS (
        |  SELECT DISTINCT l.doc_id AS da, r.doc_id AS db
        |  FROM bands l JOIN bands r
        |    ON l.band = r.band AND l.bucket = r.bucket AND l.doc_id < r.doc_id
        |)
        |SELECT c.da, c.db,
        |  CAST(sum(bit_count(xor(x.bucket, y.bucket))) AS BIGINT) AS hamming
        |FROM cand c
        |JOIN bands x ON x.doc_id = c.da
        |JOIN bands y ON y.doc_id = c.db AND y.band = x.band
        |GROUP BY c.da, c.db
        |HAVING sum(bit_count(xor(x.bucket, y.bucket))) <= 3
        |ORDER BY da, db""".stripMargin,
    // same signature/band/hamming CTEs as dedup_simhash, closed into
    // min-label components by the dedup_clusters recursion shape
    "simhash_clusters" ->
      """WITH RECURSIVE words AS (
        |  SELECT DISTINCT doc_id, w FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
        |), hv AS (
        |  SELECT doc_id, md5_number_lower(w) AS h FROM words
        |), votes AS (
        |  SELECT doc_id, b,
        |    CASE WHEN sum(CASE WHEN ((h >> b) & 1) = 1 THEN 1 ELSE -1 END) > 0
        |         THEN 1 ELSE 0 END AS bit
        |  FROM hv, (SELECT unnest(range(64)) AS b) t
        |  GROUP BY doc_id, b
        |), bands AS (
        |  SELECT doc_id, b // 16 AS band,
        |    CAST(sum(bit * (1::BIGINT << (b % 16))) AS BIGINT) AS bucket
        |  FROM votes GROUP BY doc_id, b // 16
        |), cand AS (
        |  SELECT DISTINCT l.doc_id AS da, r.doc_id AS db
        |  FROM bands l JOIN bands r
        |    ON l.band = r.band AND l.bucket = r.bucket AND l.doc_id < r.doc_id
        |), pairs AS (
        |  SELECT c.da, c.db
        |  FROM cand c
        |  JOIN bands x ON x.doc_id = c.da
        |  JOIN bands y ON y.doc_id = c.db AND y.band = x.band
        |  GROUP BY c.da, c.db
        |  HAVING sum(bit_count(xor(x.bucket, y.bucket))) <= 3
        |), edges AS (
        |  SELECT da AS a, db AS b FROM pairs
        |  UNION ALL SELECT db, da FROM pairs
        |), reach AS (
        |  SELECT DISTINCT a AS node, a AS label FROM edges
        |  UNION
        |  SELECT e.a, r.label FROM edges e JOIN reach r ON r.node = e.b
        |)
        |SELECT node AS doc_id, min(label) AS cluster_id
        |FROM reach GROUP BY node ORDER BY doc_id""".stripMargin,
    "train_test_split" ->
      """SELECT CASE WHEN (doc_id * 2654435761) % 1000 < 800 THEN 'train'
        |            WHEN (doc_id * 2654435761) % 1000 < 900 THEN 'valid'
        |            ELSE 'test' END AS split,
        |  count(*) AS n_docs,
        |  round(avg(n_chars), 4) AS avg_chars,
        |  min(doc_id) AS min_doc,
        |  max(doc_id) AS max_doc
        |FROM documents GROUP BY split ORDER BY split""".stripMargin,
    "dsir_select" ->
      """WITH w AS (
        |  SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents
        |), tok AS (
        |  SELECT doc_id, lang, unnest(ws) AS tkn FROM w
        |), tb AS (
        |  SELECT doc_id, lang, md5_number_lower(tkn) % 4096 AS b FROM tok
        |), q AS (
        |  SELECT b, count(*) AS nq FROM tb GROUP BY 1
        |), p AS (
        |  SELECT b, count(*) AS np FROM tb WHERE lang = 'en' GROUP BY 1
        |), model AS (
        |  SELECT b, CAST(length(bin(nq + 1)) -
        |    length(bin(COALESCE(np, 0) + 1)) AS BIGINT) AS bits
        |  FROM q LEFT JOIN p USING (b)
        |), agg AS (
        |  SELECT doc_id, count(*) AS n_tokens,
        |    CAST(sum(bits) AS BIGINT) AS divergence_bits
        |  FROM tb JOIN model USING (b) WHERE lang <> 'en' GROUP BY 1
        |)
        |SELECT doc_id, n_tokens, divergence_bits,
        |  divergence_bits * 1000 // n_tokens AS mbits_per_token
        |FROM agg ORDER BY mbits_per_token ASC, doc_id LIMIT 30""".stripMargin,
    "lm_perplexity" ->
      s"""WITH $lmOracleCtes
         |SELECT doc_id, n_bigrams, total_bits,
         |  total_bits * 1000 // n_bigrams AS mbits_per_bigram
         |FROM agg ORDER BY mbits_per_bigram DESC, doc_id LIMIT 30""".stripMargin,
    "bigram_counts" ->
      """WITH w AS (
        |  SELECT string_split(text, ' ') AS ws FROM documents
        |), bg AS (
        |  SELECT ws[i+1] || ' ' || ws[i+2] AS bigram
        |  FROM w, (SELECT unnest(range(len(ws) - 1)) AS i) t
        |)
        |SELECT bigram, count(*) AS n
        |FROM bg GROUP BY bigram ORDER BY n DESC, bigram LIMIT 25""".stripMargin,
    "text_stats" ->
      """SELECT lang, count(*) AS n_docs,
        |  round(avg(n_chars), 4) AS avg_chars,
        |  min(n_chars) AS min_chars,
        |  max(n_chars) AS max_chars,
        |  round(avg(len(string_split(text, ' '))), 4) AS avg_tokens
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "token_count" ->
      """SELECT doc_id,
        |  len(regexp_split_to_array(text, '\s+')) AS ws_tokens,
        |  len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS re_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "lang_id" -> langIdOracleSql,
    "lang_confusion" ->
      s"""WITH li AS ($langIdOracleSql),
         |m AS (SELECT lang, predicted, count(*) AS n FROM li GROUP BY 1, 2)
         |SELECT lang, predicted, n,
         |  CAST((1000 * n) // sum(n) OVER (PARTITION BY lang) AS BIGINT)
         |    AS recall_permille
         |FROM m ORDER BY lang, predicted""".stripMargin,
    "quality_score" ->
      """SELECT doc_id,
        |  round(length(regexp_replace(text, '[^.!?,;]', '', 'g')) * 1.0 / length(text), 6) AS punct_ratio,
        |  round(length(regexp_replace(text, '[^ ]', '', 'g')) * 1.0 / length(text), 6) AS space_ratio,
        |  round(((length(text) - length(replace(text, 'a', ''))) * 1.0)
        |        / (length(regexp_replace(text, '[^ ]', '', 'g')) + 1), 6) AS stopword_ratio,
        |  round((length(text) - length(regexp_replace(text, '[^ ]', '', 'g')) * 1.0)
        |        / (length(regexp_replace(text, '[^ ]', '', 'g')) + 1), 6) AS avg_word_len,
        |  round(least(1.0, length(text) / 500.0)
        |        * (1.0 - length(regexp_replace(text, '[^.!?,;]', '', 'g')) * 1.0 / length(text)), 6) AS quality
        |FROM documents ORDER BY doc_id""".stripMargin,
    "doc_fingerprint" ->
      """SELECT doc_id, sha256(text) AS fp, substring(sha256(text), 1, 8) AS fp_bucket
        |FROM documents ORDER BY doc_id""".stripMargin,
    "token_frequency" ->
      """SELECT token, count(*) AS n
        |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |GROUP BY token ORDER BY n DESC, token LIMIT 25""".stripMargin,
    // DuckDB lists are 1-based where Spark subscripts are 0-based —
    // both sides window words i..i+2
    "ngram_diversity" ->
      """WITH w AS (
        |  SELECT source, string_split(text, ' ') AS ws FROM documents
        |), tri AS (
        |  SELECT source, unnest(list_transform(range(len(ws) - 2),
        |    i -> ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3])) AS tri
        |  FROM w WHERE len(ws) >= 3
        |), agg AS (
        |  SELECT source, count(DISTINCT tri) AS trigram_types,
        |    count(*) AS trigram_total
        |  FROM tri GROUP BY source
        |), nd AS (
        |  SELECT source, count(*) AS n_docs FROM documents GROUP BY source
        |)
        |SELECT n.source, n.n_docs,
        |  CAST(a.trigram_types AS BIGINT) AS trigram_types,
        |  CAST(a.trigram_total AS BIGINT) AS trigram_total,
        |  CAST(a.trigram_types * 1000 // a.trigram_total AS BIGINT)
        |    AS ttr_permille
        |FROM nd n JOIN agg a USING (source) ORDER BY source""".stripMargin,
    "vocab_growth" ->
      """WITH mx AS (SELECT max(doc_id) AS mxd FROM documents),
        |toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
        |), vol AS (
        |  SELECT doc_id * 10 // (mxd + 1) AS decile, count(*) AS n_tokens
        |  FROM toks, mx GROUP BY 1
        |), ty AS (
        |  SELECT fd * 10 // (mxd + 1) AS decile, count(*) AS new_types
        |  FROM (SELECT tok, min(doc_id) AS fd FROM toks GROUP BY tok), mx
        |  GROUP BY 1
        |)
        |SELECT vol.decile, vol.n_tokens,
        |  CAST(coalesce(ty.new_types, 0) AS BIGINT) AS new_types,
        |  (1000 * CAST(coalesce(ty.new_types, 0) AS BIGINT)) // vol.n_tokens
        |    AS type_permille
        |FROM vol LEFT JOIN ty USING (decile)
        |ORDER BY decile""".stripMargin,
    "fuzzy_vocab_join" ->
      """WITH vocab AS (
        |  SELECT w, count(*) AS c FROM (
        |    SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |  WHERE len(w) >= 3 GROUP BY w
        |), keyed AS (
        |  SELECT w, c, len(w) + k AS lb, substr(w, -1, 1) AS fc
        |  FROM vocab, (SELECT unnest([0, 1, 2]) AS k) g
        |)
        |SELECT DISTINCT a.w AS a, b.w AS b, a.c AS c_a, b.c AS c_b,
        |  CAST(levenshtein(a.w, b.w) AS BIGINT) AS dist
        |FROM keyed a JOIN keyed b ON a.lb = b.lb AND a.fc = b.fc AND a.w < b.w
        |WHERE levenshtein(a.w, b.w) <= 2
        |ORDER BY dist, a, b LIMIT 25""".stripMargin,
    "collocations" ->
      """WITH ws AS (SELECT string_split(text, ' ') AS ws FROM documents),
        |uni AS (
        |  SELECT w, count(*) AS c
        |  FROM (SELECT unnest(ws) AS w FROM ws) GROUP BY w
        |), bg AS (
        |  SELECT ws[i] AS a, ws[i+1] AS b, count(*) AS c_ab
        |  FROM ws, LATERAL (SELECT unnest(generate_series(1, len(ws) - 1)) AS i) g
        |  WHERE len(ws) >= 2
        |  GROUP BY 1, 2 HAVING count(*) >= 5
        |)
        |SELECT bg.a, bg.b, bg.c_ab, ua.c AS c_a, ub.c AS c_b,
        |  (20000 * bg.c_ab) // (ua.c + ub.c) AS dice_permyriad
        |FROM bg JOIN uni ua ON ua.w = bg.a JOIN uni ub ON ub.w = bg.b
        |ORDER BY dice_permyriad DESC, a, b LIMIT 25""".stripMargin,
    "hash_split" ->
      """WITH tagged AS (
        |  SELECT source,
        |    CASE WHEN md5_number_lower(CAST(doc_id AS VARCHAR)) % 1000 < 900
        |           THEN 'train'
        |         WHEN md5_number_lower(CAST(doc_id AS VARCHAR)) % 1000 < 950
        |           THEN 'valid'
        |         ELSE 'test' END AS split,
        |    len(string_split(text, ' ')) AS n_toks
        |  FROM documents
        |), per AS (
        |  SELECT source, split, count(*) AS n_docs,
        |    CAST(sum(n_toks) AS BIGINT) AS n_tokens
        |  FROM tagged GROUP BY source, split
        |)
        |SELECT per.source, per.split, per.n_docs, per.n_tokens,
        |  CAST((1000 * per.n_docs) // t.src_docs AS BIGINT) AS share_permille
        |FROM per JOIN (SELECT source, sum(n_docs) AS src_docs FROM per GROUP BY source) t
        |  USING (source)
        |ORDER BY source, split""".stripMargin,
    "split_contamination" ->
      """WITH tagged AS (
        |  SELECT CASE WHEN md5_number_lower(CAST(doc_id AS VARCHAR)) % 1000 < 900
        |           THEN 'train'
        |         WHEN md5_number_lower(CAST(doc_id AS VARCHAR)) % 1000 < 950
        |           THEN 'valid'
        |         ELSE 'test' END AS split,
        |    string_split(text, ' ') AS ws
        |  FROM documents
        |), g AS (
        |  SELECT split, unnest(list_transform(generate_series(1, len(ws) - 4),
        |    i -> md5_number_lower(ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
        |           || ' ' || ws[i+3] || ' ' || ws[i+4])
        |         % 2305843009213693951)) AS h
        |  FROM tagged WHERE len(ws) >= 5
        |), tr AS (
        |  SELECT DISTINCT h FROM g WHERE split = 'train'
        |)
        |SELECT g.split, count(*) AS n_grams,
        |  CAST(sum(CASE WHEN tr.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_leaked,
        |  CAST((1000 * sum(CASE WHEN tr.h IS NOT NULL THEN 1 ELSE 0 END))
        |    // count(*) AS BIGINT) AS leak_permille
        |FROM g LEFT JOIN tr ON tr.h = g.h
        |WHERE g.split <> 'train'
        |GROUP BY g.split ORDER BY g.split""".stripMargin,
    "winnow_fingerprint" ->
      """WITH g AS (
        |  SELECT doc_id, list_transform(generate_series(1, len(ws) - 3),
        |      i -> md5_number_lower(ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
        |             || ' ' || ws[i+3]) % 2305843009213693951) AS h
        |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
        |  WHERE len(ws) >= 7
        |), wmin AS (
        |  SELECT doc_id, h,
        |    list_distinct(list_transform(generate_series(1, len(h) - 3),
        |      j -> least(h[j], h[j+1], h[j+2], h[j+3]))) AS mins
        |  FROM g
        |)
        |SELECT doc_id, CAST(len(h) AS BIGINT) AS n_grams,
        |  CAST(len(mins) AS BIGINT) AS n_fp,
        |  CAST(list_sum(list_transform(mins, x -> x % 1000003)) AS BIGINT)
        |    AS fp_checksum
        |FROM wmin ORDER BY doc_id""".stripMargin,
    "inverted_index" ->
      """WITH post AS (
        |  SELECT DISTINCT doc_id, token FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |    FROM documents)
        |), ranked AS (
        |  SELECT token, doc_id,
        |    row_number() OVER (PARTITION BY token ORDER BY doc_id) AS rk
        |  FROM post
        |)
        |SELECT p.token, p.df, r.postings
        |FROM (SELECT token, count(*) AS df FROM post GROUP BY token) p
        |JOIN (SELECT token,
        |        array_to_string(list_sort(list(doc_id)), ',') AS postings
        |      FROM ranked WHERE rk <= 20 GROUP BY token) r USING (token)
        |ORDER BY df DESC, token LIMIT 25""".stripMargin,
    // exact top-20 hashes; the CMS gate booleans assert TRUE (sketch
    // internals are engine-private — the q_approx_distinct device)
    "heavy_hitters" ->
      """SELECT token, n, true AS cms_no_underestimate, true AS cms_within_eps
        |FROM (
        |  SELECT token, count(*) AS n
        |  FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |  GROUP BY token ORDER BY n DESC, token LIMIT 20)
        |ORDER BY n DESC, token""".stripMargin,
    // every bloom bit reconstructs from the MD5 double-hash family;
    // membership = all 3 positions present in the reference bit set
    "bloom_dedup" ->
      """WITH w AS (
        |  SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents
        |  WHERE len(string_split(text, ' ')) >= 3
        |), sh AS (
        |  SELECT DISTINCT doc_id, source,
        |    ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] AS s
        |  FROM w, (SELECT unnest(range(len(ws) - 2)) AS i) t
        |), hp AS (
        |  SELECT doc_id, CAST(substr(source, 4) AS INT) AS src, s,
        |    CAST(md5_number_lower(s) % 4194304 AS BIGINT) AS a,
        |    CAST(md5_number_upper(s) % 4194304 AS BIGINT) AS b
        |  FROM sh
        |), refbits AS (
        |  SELECT DISTINCT (a + i * b) % 4194304 AS pos
        |  FROM hp, (SELECT unnest([0, 1, 2]) AS i) t WHERE src < 10
        |), incpos AS (
        |  SELECT doc_id, s, (a + i * b) % 4194304 AS pos
        |  FROM hp, (SELECT unnest([0, 1, 2]) AS i) t WHERE src >= 10
        |), shhit AS (
        |  SELECT i.doc_id, i.s,
        |    CASE WHEN count(r.pos) = 3 THEN 1 ELSE 0 END AS hit
        |  FROM incpos i LEFT JOIN refbits r ON r.pos = i.pos
        |  GROUP BY i.doc_id, i.s
        |), docagg AS (
        |  SELECT doc_id, count(*) AS n_shingles,
        |    CAST(sum(hit) AS BIGINT) AS n_seen
        |  FROM shhit GROUP BY doc_id)
        |SELECT doc_id, n_shingles, n_seen,
        |  (10000 * n_seen) // n_shingles AS seen_permyriad,
        |  (10000 * n_seen) // n_shingles >= 5000 AS maybe_dup
        |FROM docagg ORDER BY doc_id""".stripMargin,
    // corrected-isqrt: float sqrt lands within ±1, the CASE clamps to
    // the exact integer sqrt in both engines
    "data_mixture_temperature" ->
      """WITH counts AS (
        |  SELECT source, count(*) AS n_docs FROM documents GROUP BY source
        |), shares AS (
        |  SELECT source, n_docs,
        |    CAST((n_docs * 100000000) // sum(n_docs) OVER () AS BIGINT) AS x
        |  FROM counts
        |), seeds AS (
        |  SELECT source, n_docs, x,
        |    CAST(floor(sqrt(CAST(x AS DOUBLE))) AS BIGINT) AS s0
        |  FROM shares
        |), ws AS (
        |  SELECT source, n_docs,
        |    CASE WHEN (s0+1)*(s0+1) <= x THEN s0+1
        |         WHEN s0*s0 > x THEN s0-1 ELSE s0 END AS w_sqrt
        |  FROM seeds)
        |SELECT source, n_docs, w_sqrt,
        |  CAST((1000 * w_sqrt) // sum(w_sqrt) OVER () AS BIGINT) AS mix_permille
        |FROM ws ORDER BY source""".stripMargin,
    "source_balance_gini" ->
      """WITH counts AS (
        |  SELECT source, CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS toks
        |  FROM documents GROUP BY source
        |), p AS (
        |  SELECT CAST(sum(abs(a.toks - b.toks)) AS BIGINT) AS diff_sum
        |  FROM counts a, counts b
        |), t AS (
        |  SELECT count(*) AS n_sources, CAST(sum(toks) AS BIGINT) AS total_tokens
        |  FROM counts)
        |SELECT n_sources, total_tokens,
        |  CAST((10000 * diff_sum) // (2 * n_sources * total_tokens) AS BIGINT)
        |    AS gini_permyriad
        |FROM p, t""".stripMargin,
    "c4_filter" ->
      """WITH r AS (
        |  SELECT doc_id,
        |    len(string_split(coalesce(text, ''), '.')) - 1 >= 3 AS r1,
        |    NOT contains(coalesce(text, ''), '{') AS r2,
        |    NOT contains(lower(coalesce(text, '')), 'lorem ipsum') AS r3,
        |    NOT contains(lower(coalesce(text, '')), 'javascript') AS r4,
        |    (ends_with(trim(coalesce(text, '')), '.')
        |     OR ends_with(trim(coalesce(text, '')), '!')
        |     OR ends_with(trim(coalesce(text, '')), '?')
        |     OR ends_with(trim(coalesce(text, '')), '"')) AS r5
        |  FROM documents)
        |SELECT doc_id, r1 AND r2 AND r3 AND r4 AND r5 AS keep,
        |  concat_ws(',',
        |    CASE WHEN NOT r1 THEN 'min_sentences' END,
        |    CASE WHEN NOT r2 THEN 'no_brace' END,
        |    CASE WHEN NOT r3 THEN 'no_lorem' END,
        |    CASE WHEN NOT r4 THEN 'no_javascript' END,
        |    CASE WHEN NOT r5 THEN 'terminal_punct' END) AS reasons
        |FROM r ORDER BY doc_id""".stripMargin,
    "bpe_learn_merges" -> bpeLearnOracleSql,
    "bpe_encode" -> bpeEncodeOracleSql,
    "doc_length_histogram" ->
      """SELECT CAST(floor(n_chars / 50) AS BIGINT) AS bucket,
        |  count(*) AS n_docs, min(n_chars) AS min_chars, max(n_chars) AS max_chars
        |FROM documents GROUP BY bucket ORDER BY bucket""".stripMargin,
    "multimodal_meta" ->
      """SELECT doc_id,
        |  octet_length(CAST(text AS BLOB)) AS blob_len,
        |  hex(encode(substring(text, 1, 8))) AS header_hex,
        |  sha256(text) AS content_sha,
        |  n_chars % 64 * 16 + 32 AS fake_width,
        |  n_chars % 48 * 16 + 32 AS fake_height
        |FROM documents ORDER BY doc_id""".stripMargin,
    // identical integer arithmetic as the Spark side: HUGEINT
    // intermediates are exact, outputs cast back to BIGINT
    "data_mixture" ->
      """WITH docs AS (
        |  SELECT doc_id, source,
        |    CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS toks
        |  FROM documents
        |), tot AS (
        |  SELECT source, sum(toks) AS t_s, count(*) AS n_s,
        |    (CAST(substring(source, 4) AS BIGINT) % 4 + 1) * 1000 AS w
        |  FROM docs GROUP BY source
        |), g AS (
        |  SELECT sum(t_s) AS tot, sum(w) AS sumw FROM tot
        |), tgt AS (
        |  SELECT t.*, ((g.tot // 2) * t.w) // g.sumw AS target
        |  FROM tot t CROSS JOIN g
        |), kept AS (
        |  SELECT d.source, count(*) AS kept_docs,
        |    CAST(sum(d.toks) AS BIGINT) AS kept_tokens
        |  FROM docs d JOIN tgt t USING (source)
        |  WHERE ((d.doc_id * 2654435761) % 1000000) * t.t_s < t.target * 1000000
        |  GROUP BY d.source
        |)
        |SELECT t.source, t.w AS weight, t.n_s AS n_docs,
        |  CAST(t.t_s AS BIGINT) AS total_tokens,
        |  CAST(t.target AS BIGINT) AS target_tokens,
        |  coalesce(k.kept_docs, 0) AS kept_docs,
        |  coalesce(k.kept_tokens, 0) AS kept_tokens
        |FROM tgt t LEFT JOIN kept k ON t.source = k.source
        |ORDER BY t.source""".stripMargin,
  )
}
