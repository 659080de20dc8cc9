package graft.lake.sql

import scala.util.Random
import org.apache.spark.sql.functions._
import graft.lake.{LakeCatalog, LakePredicate, LakeSuite}

/** Randomized DIFFERENTIAL SQL fuzz over lake tables (round 15, verdict
  * ask #1). Round 14 proved the oracle corpus's alias discipline hides
  * ad-hoc-SQL analyzer bugs (`SELECT count(*) FROM t` crashed analysis
  * for months unseen) — so this spec generates seeded ad-hoc reads from
  * a small grammar — projection / filter / aggregate (aliased AND
  * unaliased) / HAVING / DISTINCT / self-join / dim-join / semi / anti
  * / set-op / window / scalar subquery / ORDER BY+LIMIT / CTE+ROLLUP /
  * CASE / LATERAL VIEW — and runs every one of them differentially:
  * once against a lake relation, once against a plain-parquet temp view
  * holding provably identical contents, asserting schema and multiset
  * equality.
  *
  * Six table states cover the engine's read surfaces:
  *   - clean          (direct DSv2 scan, no substitution)
  *   - mor            (live positional + equality tombstones — the
  *                     analyzer substitution rewrites mid-plan)
  *   - VERSION AS OF  (numeric snapshot pin on the MoR table's
  *                     pre-mutation state)
  *   - branch         (string ref pin on a diverged branch head)
  *   - metadata table (`t.files` — row-per-file relation)
  *   - catalog VIEW   (created through the lake ViewCatalog over the
  *                     MoR table — every shape composes on a
  *                     view-resolution + substitution stack)
  *
  * Determinism rules baked into the grammar: aggregates are exact only
  * (count / min / max / sum over LONG — double sums are addend-order
  * dependent and the two sides partition differently), windows order by
  * a unique key, LIMIT only under ORDER BY of that key. The seed is in
  * the failure message — freeze any mismatch as a named regression
  * before fixing it. */
class SqlFuzzSpec extends LakeSuite {

  private val Seed: Long =
    sys.env.get("GRAFT_FUZZ_SEED").map(_.toLong).getOrElse(20260815L)
  private val PerProfile: Int =
    sys.env.get("GRAFT_FUZZ_N").map(_.toInt).getOrElse(48)

  /** One table state: `table` is the lake-side SQL token (may carry a
    * VERSION AS OF pin), `view` the plain-parquet temp view with the
    * expected identical contents. `key` is unique per row (window /
    * LIMIT determinism), `num` a LongType column (exact sums), `str` a
    * grouping column. `sample` holds rendered SQL literals drawn from
    * the data itself. */
  private case class Profile(name: String, table: String, view: String,
      key: String, num: String, str: String, sample: Map[String, Seq[String]])

  private def sqlLit(v: Any): String = v match {
    case null => "NULL"
    case s: String => "'" + s.replace("'", "''") + "'"
    case t: java.sql.Timestamp => s"TIMESTAMP '$t'"
    case d: java.sql.Date => s"DATE '$d'"
    case other => other.toString
  }

  private def sampleCol(view: String, col: String): Seq[String] =
    spark.table(view).select(col).distinct().limit(40).collect()
      .map(r => sqlLit(r.get(0))).toSeq.sorted

  private def profile(name: String, table: String, view: String,
      key: String, num: String, str: String): Profile =
    Profile(name, table, view, key, num, str,
      Map(key -> sampleCol(view, key), num -> sampleCol(view, num),
        str -> sampleCol(view, str)))

  /** 1–2 clause predicate over the profile's typed columns, literals
    * sampled from the data (so filters are neither always-true nor
    * always-false). `q` prefixes column references for aliased scopes. */
  private def pred(p: Profile, rnd: Random, q: String = ""): String = {
    def one(): String = {
      val c = Seq(p.key, p.num, p.str)(rnd.nextInt(3))
      val ss = p.sample(c)
      val s = ss(rnd.nextInt(ss.size))
      rnd.nextInt(6) match {
        case 0 => s"$q$c <= $s"
        case 1 => s"$q$c >= $s"
        case 2 => s"$q$c = $s"
        case 3 => s"$q$c <> $s"
        case 4 => s"$q$c IN ($s, ${ss(rnd.nextInt(ss.size))})"
        case 5 => s"$q$c IS NOT NULL"
      }
    }
    rnd.nextInt(4) match {
      case 0 => one()
      case 1 => s"${one()} AND ${one()}"
      case 2 => s"(${one()} OR ${one()})"
      case 3 => s"NOT (${one()})"
    }
  }

  /** The grammar: each shape yields a SQL template with `%T` where the
    * relation goes (every `%T` occurrence is instantiated to the SAME
    * side, so self-joins stay self-joins). */
  private def shapes(p: Profile, rnd: Random): Seq[String] = Seq(
    // star projection + filter
    s"SELECT * FROM %T WHERE ${pred(p, rnd)}",
    // column projection + filter
    s"SELECT ${p.key}, ${p.str}, ${p.num} FROM %T WHERE ${pred(p, rnd)}",
    // aliased grouped aggregate
    s"SELECT ${p.str} AS g, count(*) AS c, min(${p.num}) AS mn, " +
      s"max(${p.key}) AS mx, sum(${p.num}) AS s FROM %T " +
      s"WHERE ${pred(p, rnd)} GROUP BY ${p.str}",
    // UNALIASED aggregates — the round-14 crash class
    s"SELECT count(*), max(${p.num}), min(${p.key}) FROM %T WHERE ${pred(p, rnd)}",
    s"SELECT count(DISTINCT ${p.str}) FROM %T",
    // ordinal GROUP BY + unaliased HAVING aggregate
    s"SELECT ${p.str} FROM %T GROUP BY 1 HAVING count(*) >= ${1 + rnd.nextInt(3)}",
    // DISTINCT
    s"SELECT DISTINCT ${p.str} FROM %T WHERE ${pred(p, rnd)}",
    // self equi-join (count only — duplicate names otherwise)
    s"SELECT count(*) FROM %T a JOIN %T b ON a.${p.key} = b.${p.key} " +
      s"WHERE ${pred(p, rnd, "a.")}",
    // left outer join against a derived dim (view on BOTH sides — the
    // dim is shared context, the lake side is what differs)
    s"SELECT count(d.dk), count(*) FROM %T t LEFT JOIN " +
      s"(SELECT DISTINCT ${p.num} AS dk FROM ${p.view} ORDER BY dk LIMIT 37) d " +
      s"ON t.${p.num} = d.dk WHERE ${pred(p, rnd, "t.")}",
    // semi (IN subquery over the same relation)
    s"SELECT count(*) FROM %T WHERE ${p.key} IN " +
      s"(SELECT ${p.key} FROM %T WHERE ${pred(p, rnd)})",
    // anti (correlated NOT EXISTS)
    s"SELECT count(*) FROM %T t WHERE NOT EXISTS " +
      s"(SELECT 1 FROM %T u WHERE u.${p.key} = t.${p.key} AND ${pred(p, rnd, "u.")})",
    // set-op between two filtered reads
    {
      val op = Seq("UNION", "UNION ALL", "INTERSECT", "EXCEPT")(rnd.nextInt(4))
      s"SELECT ${p.key} FROM %T WHERE ${pred(p, rnd)} $op " +
        s"SELECT ${p.key} FROM %T WHERE ${pred(p, rnd)}"
    },
    // window: ranking + exact running frame, unique-key ordered
    s"SELECT ${p.key}, row_number() OVER (PARTITION BY ${p.str} ORDER BY ${p.key}) AS rn, " +
      s"sum(${p.num}) OVER (ORDER BY ${p.key} ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS rs " +
      s"FROM %T WHERE ${pred(p, rnd)}",
    // scalar subquery in the filter (NULL-safe: empty subquery → 0 rows)
    s"SELECT count(*) FROM %T WHERE ${p.num} <= " +
      s"(SELECT max(${p.num}) FROM %T WHERE ${pred(p, rnd)})",
    // ORDER BY unique key + LIMIT (the only deterministic LIMIT)
    s"SELECT ${p.key}, ${p.str} FROM %T WHERE ${pred(p, rnd)} " +
      s"ORDER BY ${p.key} DESC LIMIT ${5 + rnd.nextInt(20)}",
    // CTE + ROLLUP with exact long sum
    s"WITH c AS (SELECT ${p.str} AS g, ${p.num} AS n FROM %T WHERE ${pred(p, rnd)}) " +
      "SELECT g, count(*) AS c, sum(n) AS s FROM c GROUP BY ROLLUP(g)",
    // CASE projection over the whole table
    s"SELECT ${p.key}, CASE WHEN ${pred(p, rnd)} THEN 'hi' ELSE 'lo' END AS tag FROM %T",
    // generator below an aggregate
    s"SELECT count(*) FROM %T LATERAL VIEW explode(array(1, 2, 3)) x AS v " +
      s"WHERE ${pred(p, rnd)}")

  private def assertSame(tpl: String, p: Profile, idx: Int): Unit = {
    val qT = tpl.replace("%T", p.table)
    val qV = tpl.replace("%T", p.view)
    val label = s"[seed=$Seed profile=${p.name} #$idx]\n  lake: $qT"
    val (a, b) = (spark.sql(qT), spark.sql(qV))
    // catalogString erases nullability (the parquet round trip of the
    // reference view makes everything nullable)
    assert(a.schema.fields.map(f => (f.name, f.dataType.catalogString)).toSeq
        == b.schema.fields.map(f => (f.name, f.dataType.catalogString)).toSeq,
      s"schema mismatch $label\n  lake=${a.schema.catalogString}" +
        s"\n  view=${b.schema.catalogString}")
    val ra = a.collect().map(_.toString).sorted.toSeq
    val rb = b.collect().map(_.toString).sorted.toSeq
    if (ra != rb) {
      val onlyLake = ra.diff(rb).take(3)
      val onlyView = rb.diff(ra).take(3)
      fail(s"result mismatch $label\n  lake rows=${ra.size} view rows=${rb.size}" +
        s"\n  only-lake: ${onlyLake.mkString(" | ")}" +
        s"\n  only-view: ${onlyView.mkString(" | ")}")
    }
  }

  test(s"$PerProfile seeded shapes x 6 table states agree with plain parquet (seed=$Seed)") {
    val wh = freshWarehouse()
    spark.conf.set("spark.sql.catalog.fuzz", classOf[LakeSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.fuzz.warehouse", wh)
    val out = java.nio.file.Files.createTempDirectory("graft_fuzz_views_").toString
    try {
      spark.sql("CREATE NAMESPACE fuzz.ns")
      // sort-ordered files give disjoint key ranges, so the fuzz also
      // drives the manifest-pruning paths (incl. the round-15
      // filter-above-join context) instead of always-all-files scans
      Seq("clean", "mor").foreach(n => spark.sql(
        s"CREATE TABLE fuzz.ns.$n (${ordersDF.schema.toDDL}) " +
          "TBLPROPERTIES ('write.sort-order'='o_orderkey')"))
      val cat = LakeCatalog.open(wh)
      val clean = cat.loadTable("ns", "clean")
      clean.appendData(ordersDF, numFiles = 4)
      val mor = cat.loadTable("ns", "mor")
      mor.appendData(ordersDF, numFiles = 4)
      val preMutation = mor.refresh().currentSnapshotId
      // positional tombstones...
      mor.refresh().deleteWhereMoR(spark, LakePredicate.Eq("o_orderstatus", "F"))
      val survivors = ordersDF.filter(col("o_orderstatus") =!= "F")
      // ...plus equality tombstones from an MoR upsert of 1-in-7 keys
      val updRows = survivors.filter(col("o_orderkey") % 7 === 0)
        .withColumn("o_orderpriority", lit("0-FUZZED"))
        .withColumn("o_totalprice", col("o_totalprice") + 1.0)
      mor.refresh().mergeIntoMoR(spark, updRows, Seq("o_orderkey"))
      val expectedMor = survivors.filter(col("o_orderkey") % 7 =!= 0)
        .unionByName(updRows)
      // a diverged branch on the clean table: extra rows, shifted keys
      val extra = ordersDF.filter(col("o_orderkey") % 5 === 0)
        .withColumn("o_orderkey", col("o_orderkey") + 10000000L)
      clean.createBranch("fuzzb")
      clean.refresh().appendDataToBranch("fuzzb", extra)

      // materialize every reference state to plain parquet temp views
      def mk(name: String, df: org.apache.spark.sql.DataFrame): String = {
        df.write.parquet(s"$out/$name")
        spark.read.parquet(s"$out/$name").createOrReplaceTempView(name)
        name
      }
      mk("fuzz_v_clean", ordersDF)
      mk("fuzz_v_mor", expectedMor)
      mk("fuzz_v_branch", ordersDF.unionByName(extra))
      mk("fuzz_v_files", spark.sql("SELECT * FROM fuzz.ns.mor.files"))
      // a CATALOG VIEW over the MoR table (round-16 verdict ask: views
      // created AND read through the fuzz): the view body carries its
      // own filter + projection, so every grammar shape composes on
      // top of a view-resolution + MoR-substitution stack
      spark.sql("CREATE VIEW fuzz.ns.vfuzz AS SELECT o_orderkey, " +
        "o_custkey, o_orderstatus, o_totalprice FROM fuzz.ns.mor " +
        "WHERE o_orderkey % 3 <> 1")
      mk("fuzz_v_catview", expectedMor
        .filter(col("o_orderkey") % 3 =!= 1)
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"))

      val profiles = Seq(
        profile("clean", "fuzz.ns.clean", "fuzz_v_clean",
          "o_orderkey", "o_custkey", "o_orderstatus"),
        profile("mor", "fuzz.ns.mor", "fuzz_v_mor",
          "o_orderkey", "o_custkey", "o_orderstatus"),
        profile("asof", s"fuzz.ns.mor VERSION AS OF $preMutation", "fuzz_v_clean",
          "o_orderkey", "o_custkey", "o_orderstatus"),
        profile("branch", "fuzz.ns.clean VERSION AS OF 'fuzzb'", "fuzz_v_branch",
          "o_orderkey", "o_custkey", "o_orderstatus"),
        profile("meta", "fuzz.ns.mor.files", "fuzz_v_files",
          "file_path", "record_count", "file_path"),
        profile("view", "fuzz.ns.vfuzz", "fuzz_v_catview",
          "o_orderkey", "o_custkey", "o_orderstatus"))

      profiles.foreach { p =>
        // one rng per profile, seeded off the global seed + name, so a
        // single profile reproduces alone under the same seed
        val rnd = new Random(Seed ^ p.name.hashCode.toLong)
        (0 until PerProfile).foreach { i =>
          val all = shapes(p, rnd) // fresh predicates every round
          assertSame(all(i % all.size), p, i)
        }
      }
    } finally {
      spark.conf.unset("spark.sql.catalog.fuzz")
      spark.conf.unset("spark.sql.catalog.fuzz.warehouse")
    }
  }
}
