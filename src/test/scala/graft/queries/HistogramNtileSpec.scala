package graft.queries

import graft.lake.LakeSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [[HistogramNtile]] must equal Spark's own `ntile(k)` under the same
  * total order on EVERY input shape — the device replaces the built-in
  * in `q_ev_rfm` / `perplexity_buckets` purely for scale, so any
  * value-level divergence is a correctness bug. Exercises the edge
  * geometry the derivation worries about: n < k (duplicate cut ranks
  * sharing one boundary row), heavy metric ties (cut falls inside a
  * run, tie column decides), single-valued metric (one-bucket
  * degenerate), n divisible and non-divisible by k, negative metrics
  * (the descending-entry convention), and tiny bucket counts that
  * force many cuts into one bucket. */
class HistogramNtileSpec extends LakeSuite {

  private def check(values: Seq[Long], k: Int, buckets: Int = 1024): Unit = {
    import spark.implicits._
    val df = values.zipWithIndex.map { case (v, i) => (v, i.toLong) }
      .toDF("m", "id")
    val got = HistogramNtile.withBand(df, "m", "id", k, "band", buckets)
      .select("m", "id", "band")
    val want = df.withColumn("band",
      ntile(k).over(Window.orderBy(col("m"), col("id"))).cast("long"))
    val diff = got.except(want).union(want.except(got)).collect()
    assert(diff.isEmpty,
      s"device != ntile($k) on n=${values.size}, buckets=$buckets: " +
        diff.take(5).mkString(", "))
  }

  test("matches ntile on random data, n not divisible by k") {
    val rnd = new scala.util.Random(7)
    check(Seq.fill(997)(rnd.nextLong() % 5000), 5)
    check(Seq.fill(1000)(rnd.nextLong() % 5000), 5)
  }

  test("matches ntile with heavy ties (cut lands inside a tie run)") {
    val rnd = new scala.util.Random(11)
    check(Seq.fill(500)(rnd.nextInt(3).toLong), 5)
    check(Seq.fill(500)(rnd.nextInt(3).toLong), 3)
  }

  test("single-valued metric collapses to one bucket but stays exact") {
    check(Seq.fill(97)(42L), 5)
  }

  test("n < k duplicates cut ranks onto one boundary row") {
    check(Seq(10L, 20L, 30L), 5)
    check(Seq(10L), 5)
  }

  test("negative metrics (the descending-entry convention)") {
    val rnd = new scala.util.Random(13)
    check(Seq.fill(400)(-math.abs(rnd.nextLong() % 10000)), 5)
  }

  test("tiny bucket count forces multiple cuts into shared buckets") {
    val rnd = new scala.util.Random(17)
    check(Seq.fill(300)(rnd.nextLong() % 100000), 7, buckets = 2)
    check(Seq.fill(300)(rnd.nextLong() % 100000), 7, buckets = 1)
  }

  test("string tie column orders lexicographically like the window") {
    import spark.implicits._
    val rnd = new scala.util.Random(19)
    val df = Seq.tabulate(200)(i => (rnd.nextInt(10).toLong, f"doc_$i%03d"))
      .toDF("m", "id")
    val got = HistogramNtile.withBand(df, "m", "id", 4, "band")
      .select("m", "id", "band")
    val want = df.withColumn("band",
      ntile(4).over(Window.orderBy(col("m"), col("id"))).cast("long"))
    assert(got.except(want).union(want.except(got)).collect().isEmpty)
  }
}
