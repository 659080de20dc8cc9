package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar-function batteries (SURVEY.md §2.C): string, date/time, math,
  * JSON, and array/higher-order functions — all row-level projections so
  * Catalyst keeps them in one whole-stage-codegen span over the scan.
  *
  * Cross-engine notes: DuckDB `length`/`year`/`ceil` return BIGINT/DOUBLE
  * where Spark returns INT/LONG — outputs are cast to 64-bit on both
  * sides; transcendentals (`ln`, `sqrt`) are rounded to 6 dp since libm
  * implementations differ in the last ulp.
  */
object FunctionQueries {
  import Tables._

  def qStringFuncs(s: SparkSession, d: String): DataFrame =
    part(s, d).select(
      col("p_partkey"),
      lower(col("p_name")).as("name_lower"),
      upper(col("p_brand")).as("brand_upper"),
      substring(col("p_type"), 1, 6).as("type_prefix"),
      length(col("p_name")).cast("long").as("name_len"),
      regexp_extract(col("p_brand"), "#(\\d+)", 1).as("brand_num"),
      concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
      split(col("p_name"), " ").getItem(0).as("first_word"),
      regexp_replace(col("p_type"), "a", "@").as("type_repl"),
      col("p_name").like("%a%").as("has_a"))
      .orderBy(col("p_partkey"))

  def qDateFuncs(s: SparkSession, d: String): DataFrame =
    orders(s, d).select(
      col("o_orderkey"),
      year(col("o_orderdate")).cast("long").as("yr"),
      month(col("o_orderdate")).cast("long").as("mo"),
      dayofmonth(col("o_orderdate")).cast("long").as("dom"),
      quarter(col("o_orderdate")).cast("long").as("qtr"),
      (weekday(col("o_orderdate")) + 1).cast("long").as("isodow"),
      date_trunc("month", col("o_orderdate")).as("month_start"),
      datediff(col("o_orderdate"), lit("1995-01-01").cast("date")).cast("long").as("days_since"),
      unix_timestamp(col("o_orderdate")).as("epoch_s"))
      .orderBy(col("o_orderkey"))

  def qMathFuncs(s: SparkSession, d: String): DataFrame =
    part(s, d).select(
      col("p_partkey"),
      round(col("p_retailprice"), 1).as("price_round"),
      abs(col("p_retailprice") - 1000.0).as("price_absdiff"),
      pow(col("p_size"), 2.0).as("size_sq"),
      round(log(col("p_retailprice")), 6).as("price_ln"),
      round(sqrt(col("p_retailprice")), 6).as("price_sqrt"),
      pmod(col("p_partkey"), lit(7)).cast("long").as("key_mod"),
      ceil(col("p_retailprice")).cast("long").as("price_ceil"),
      floor(col("p_retailprice")).cast("long").as("price_floor"),
      signum(col("p_retailprice") - 1000.0).cast("long").as("price_sign"))
      .orderBy(col("p_partkey"))

  /** JSON extraction both ways (path string + parsed struct) over the
    * events.props payload, then aggregated per type. */
  def qJsonFuncs(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .withColumn("k_path", get_json_object(col("props"), "$.k").cast("long"))
      .withColumn("k_struct",
        from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k BIGINT"))
          .getField("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("k_path")).as("sum_k"),
        sum(col("k_struct")).as("sum_k2"),
        min(col("k_path")).as("min_k"),
        max(col("k_path")).as("max_k"))
      .orderBy(col("event_type"))

  /** Map functions over the parsed JSON payload: keys/values/lookup/
    * membership — the MapType surface next to the JSON-path one in
    * [[qJsonFuncs]]. */
  def qMapFuncs(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select(col("event_id"),
        from_json(col("props"),
          org.apache.spark.sql.types.MapType(
            org.apache.spark.sql.types.StringType,
            org.apache.spark.sql.types.LongType)).as("m"))
      .select(col("event_id"),
        size(col("m")).cast("long").as("n_keys"),
        element_at(map_keys(col("m")), 1).as("first_key"),
        element_at(col("m"), "k").as("k_val"),
        element_at(map_values(col("m")), 1).as("v_first"),
        map_contains_key(col("m"), "k").as("has_k"))
      .orderBy(col("event_id"))

  /** Array / higher-order functions over the 64-dim float embeddings. */
  def qArrayFuncs(s: SparkSession, d: String): DataFrame =
    embeddings(s, d).select(
      col("vec_id"),
      size(col("embedding")).cast("long").as("dim"),
      element_at(col("embedding"), 1).cast("double").as("first_val"),
      round(aggregate(col("embedding"), lit(0.0), (acc, x) => acc + x), 4).as("sum_vals"),
      array_min(col("embedding")).cast("double").as("min_val"),
      array_max(col("embedding")).cast("double").as("max_val"),
      // Emitted as a comma-joined string of milli-scaled integers: the
      // driver's pandas hash can't sort array cells, and integer text
      // avoids cross-engine double-formatting drift ("0.001" vs "1e-03")
      concat_ws(",", transform(slice(col("embedding"), 1, 3),
        x => round(x.cast("double") * 1000, 0).cast("long").cast("string"))).as("head3"))
      .orderBy(col("vec_id"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_string_funcs" -> qStringFuncs,
    "q_date_funcs" -> qDateFuncs,
    "q_math_funcs" -> qMathFuncs,
    "q_json_funcs" -> qJsonFuncs,
    "q_map_funcs" -> qMapFuncs,
    "q_array_funcs" -> qArrayFuncs,
  )

  val oracles: Map[String, String] = Map(
    "q_string_funcs" ->
      """SELECT p_partkey,
        |  lower(p_name) AS name_lower,
        |  upper(p_brand) AS brand_upper,
        |  substring(p_type, 1, 6) AS type_prefix,
        |  length(p_name) AS name_len,
        |  regexp_extract(p_brand, '#(\d+)', 1) AS brand_num,
        |  concat_ws('|', p_brand, p_type) AS brand_type,
        |  string_split(p_name, ' ')[1] AS first_word,
        |  regexp_replace(p_type, 'a', '@', 'g') AS type_repl,
        |  p_name LIKE '%a%' AS has_a
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_date_funcs" ->
      """SELECT o_orderkey,
        |  year(o_orderdate) AS yr,
        |  month(o_orderdate) AS mo,
        |  dayofmonth(o_orderdate) AS dom,
        |  quarter(o_orderdate) AS qtr,
        |  isodow(o_orderdate) AS isodow,
        |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
        |  date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS days_since,
        |  CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_math_funcs" ->
      """SELECT p_partkey,
        |  round(p_retailprice, 1) AS price_round,
        |  abs(p_retailprice - 1000.0) AS price_absdiff,
        |  pow(p_size, 2.0) AS size_sq,
        |  round(ln(p_retailprice), 6) AS price_ln,
        |  round(sqrt(p_retailprice), 6) AS price_sqrt,
        |  ((p_partkey % 7) + 7) % 7 AS key_mod,
        |  CAST(ceil(p_retailprice) AS BIGINT) AS price_ceil,
        |  CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
        |  CAST(sign(p_retailprice - 1000.0) AS BIGINT) AS price_sign
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_json_funcs" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(k) AS BIGINT) AS sum_k,
        |  CAST(sum(k) AS BIGINT) AS sum_k2,
        |  min(k) AS min_k,
        |  max(k) AS max_k
        |FROM (SELECT event_type,
        |        CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |      FROM events)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_map_funcs" ->
      """SELECT event_id,
        |  CAST(len(json_keys(props)) AS BIGINT) AS n_keys,
        |  json_keys(props)[1] AS first_key,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS v_first,
        |  list_contains(json_keys(props), 'k') AS has_k
        |FROM events ORDER BY event_id""".stripMargin,
    "q_array_funcs" ->
      """SELECT vec_id,
        |  CAST(len(embedding) AS BIGINT) AS dim,
        |  CAST(embedding[1] AS DOUBLE) AS first_val,
        |  round(list_sum(CAST(embedding AS DOUBLE[])), 4) AS sum_vals,
        |  CAST(list_min(embedding) AS DOUBLE) AS min_val,
        |  CAST(list_max(embedding) AS DOUBLE) AS max_val,
        |  array_to_string(list_transform(embedding[1:3],
        |    x -> CAST(round(CAST(x AS DOUBLE) * 1000, 0) AS BIGINT)), ',') AS head3
        |FROM embeddings ORDER BY vec_id""".stripMargin,
  )
}
