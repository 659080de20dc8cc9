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

  test("qdot_f matches a driver-side reference and is exactly integer") {
    val rows = emb.limit(20).select(col("vec_id"), col("embedding"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1))
    val pairs = emb.limit(20).select(col("vec_id"), col("embedding"))
      .crossJoin(emb.limit(20).select(col("vec_id").as("v2"), col("embedding").as("e2")))
      .select(col("vec_id"), col("v2"),
        VectorFunctions.qdot_f(col("embedding"), col("e2")).as("qd"))
      .collect()
    val byId = rows.toMap
    def ref(a: Seq[Float], b: Seq[Float]): Long =
      a.zip(b).map { case (x, y) =>
        math.floor(x.toDouble * 32768).toLong * math.floor(y.toDouble * 32768).toLong
      }.sum
    pairs.foreach { r =>
      assert(r.getLong(2) === ref(byId(r.getLong(0)), byId(r.getLong(1))))
    }
    assert(pairs.nonEmpty)
  }

  test("qdot_f: null element yields null; quantized score orders like cosine") {
    val row = spark.sql(
      "SELECT array(CAST(1.0 AS DOUBLE), NULL) AS a, array(CAST(2.0 AS DOUBLE), CAST(3.0 AS DOUBLE)) AS b")
      .select(VectorFunctions.qdot_f(col("a"), col("b")).as("q")).collect().head
    assert(row.isNullAt(0), "qdot must be null on null element")
    // constructed unit vectors with cosines 1.0, 0.8, 0.0, -0.6 against
    // the query (1,0): the integer score must reproduce that exact order
    val df = spark.sql(
      """SELECT * FROM VALUES
        |  (1L, array(CAST(1.0 AS DOUBLE), CAST(0.0 AS DOUBLE))),
        |  (2L, array(CAST(0.8 AS DOUBLE), CAST(0.6 AS DOUBLE))),
        |  (3L, array(CAST(0.0 AS DOUBLE), CAST(1.0 AS DOUBLE))),
        |  (4L, array(CAST(-0.6 AS DOUBLE), CAST(0.8 AS DOUBLE))) AS t(id, v)""".stripMargin)
      .select(col("id"),
        VectorFunctions.qdot_f(col("v"), array(lit(1.0), lit(0.0))).as("dot"),
        VectorFunctions.qdot_f(col("v"), col("v")).as("nv"))
      .selectExpr("id",
        "CASE WHEN nv = 0L THEN 0L ELSE (CASE WHEN dot < 0L THEN -1L ELSE 1L END) * " +
          "(((dot * dot) div nv) * 1048576L + (((dot * dot) % nv) * 1048576L) div nv) END AS score")
      .orderBy(col("score").desc)
      .collect().map(_.getLong(0)).toSeq
    assert(df === Seq(1L, 2L, 3L, 4L))
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
