package graft.functions

import org.apache.spark.sql.functions._
import graft.lake.LakeSuite

/** Native codegen vector expressions must be BIT-identical to the
  * higher-order-function formulation they replaced (same double
  * accumulation order), null-safe, and SQL-registrable. */
class VectorExprSpec extends LakeSuite {

  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("cosine_f / dot_f bit-identical to the HOF formulation") {
    val pairs = emb.select(col("vec_id"), col("embedding"))
      .crossJoin(emb.select(col("embedding").as("e2"), col("vec_id").as("v2"))
        .filter(col("v2") < 10))
    val cmp = pairs.select(
      graft.queries.SimilarityQueries.cosineHofPublic(col("embedding"), col("e2")).as("hof"),
      VectorFunctions.cosine_f(col("embedding"), col("e2")).as("native"),
      graft.queries.SimilarityQueries.dotHofPublic(col("embedding"), col("e2")).as("dhof"),
      VectorFunctions.dot_f(col("embedding"), col("e2")).as("dnative"))
    assert(cmp.filter(col("hof") =!= col("native") ||
      col("dhof") =!= col("dnative")).count() === 0)
    assert(cmp.count() > 0)
  }

  test("a null ELEMENT yields null (matching HOF null propagation)") {
    val df = spark.sql(
      "SELECT array(CAST(1.0 AS DOUBLE), NULL) AS a, array(CAST(2.0 AS DOUBLE), CAST(3.0 AS DOUBLE)) AS b")
    val out = df.select(
      VectorFunctions.dot_f(col("a"), col("b")).as("d"),
      VectorFunctions.cosine_f(col("a"), col("b")).as("c"),
      graft.queries.SimilarityQueries.dotHofPublic(col("a"), col("b")).as("dhof"))
    val row = out.collect().head
    assert(row.isNullAt(0), "native dot must be null on null element")
    assert(row.isNullAt(1), "native cosine must be null on null element")
    assert(row.isNullAt(2), "HOF reference is null too")
  }

  test("non-nullable literal arrays compile through codegen (no `false = true`)") {
    // containsNull=false + non-null children => nullable=false branch
    val out = spark.range(3).select(
      VectorFunctions.dot_f(array(lit(1.0), lit(2.0)), array(lit(3.0), lit(4.0))).as("d"),
      VectorFunctions.cosine_f(array(lit(1.0), lit(0.0)), array(lit(1.0), lit(0.0))).as("c"))
    val r = out.collect().head
    assert(r.getDouble(0) === 11.0)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
  }

  test("null inputs yield null, not a crash") {
    val df = emb.limit(5).select(col("embedding"),
      when(lit(false), col("embedding")).as("nullvec"))
    val out = df.select(VectorFunctions.cosine_f(col("embedding"), col("nullvec")).as("c"))
    assert(out.filter(col("c").isNotNull).count() === 0)
  }

  test("SQL registration: cosine_f usable from spark.sql") {
    VectorFunctions.register(spark)
    emb.limit(10).createOrReplaceTempView("emb_v")
    val n = spark.sql(
      "SELECT cosine_f(embedding, embedding) AS c FROM emb_v")
      .filter(abs(col("c") - 1.0) < 1e-9).count()
    assert(n === 10)
  }
}
