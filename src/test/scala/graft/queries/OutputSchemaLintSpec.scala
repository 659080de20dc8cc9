package graft.queries

import graft.lake.LakeSuite
import org.apache.spark.sql.types.{ArrayType, MapType, StructType}

/** Corpus-wide lint: a top-level array/map/struct column in a query's
  * RESULT crashes the driver's row-sort comparator (pandas
  * `sort_values` on unhashable cells) — the class that turned
  * `inverted_index` and `lake_sql_update_element` red in round 13 even
  * though their values were correct. Every corpus query's OUTPUT schema
  * must be scalar-only; collections are projected through
  * `concat_ws`/`to_json`-style deterministic strings before the final
  * select (the `q_array_funcs` head3 precedent). Only the analyzed
  * schema is touched — no query is executed. */
class OutputSchemaLintSpec extends LakeSuite {

  private val d = "/root/testdata/sf0.001"

  test("no corpus query returns a top-level array/map/struct column") {
    Corpus.prepare(spark, d)
    val offenders = scala.collection.mutable.ListBuffer.empty[String]
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val bad = fn(spark, d).schema.fields.collect {
          case f if f.dataType.isInstanceOf[ArrayType] ||
            f.dataType.isInstanceOf[MapType] ||
            f.dataType.isInstanceOf[StructType] =>
            s"${f.name}: ${f.dataType.simpleString}"
        }
        if (bad.nonEmpty) offenders += s"$name (${bad.mkString(", ")})"
      } finally QueryCaches.clear()
    }
    assert(offenders.isEmpty,
      "collection-typed output columns (driver comparator cannot sort " +
        "these — project through concat_ws/to_json):\n  " +
        offenders.mkString("\n  "))
  }
}
