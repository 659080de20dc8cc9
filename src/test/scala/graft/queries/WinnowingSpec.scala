package graft.queries

import graft.lake.LakeSuite

/** Pins the winnowing GUARANTEE (Schleimer, Wilkerson & Aiken 2003)
  * the oracle cannot see: any two documents sharing a run of at least
  * w + k − 1 = 7 consecutive tokens share at least one selected
  * fingerprint — that is the property that makes the per-doc
  * fingerprint sets usable for cross-doc matching. */
class WinnowingSpec extends LakeSuite {

  private def sets(texts: Seq[String]): Map[Long, Seq[Long]] = {
    val df = spark.createDataFrame(
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) })
      .toDF("doc_id", "text")
    TextQueries.winnowSets(spark, df).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](2)).toMap
  }

  test("docs sharing a >=7-token run share a fingerprint; shorter docs emit none") {
    val shared = "alpha beta gamma delta epsilon zeta eta"
    val pairs = Seq(
      (s"one two three $shared four five", s"six seven $shared eight nine ten"),
      (s"$shared tail tokens here now", s"prefix words go here $shared"),
      (s"x1 x2 x3 x4 $shared", s"$shared y1 y2 y3 y4"))
    pairs.zipWithIndex.foreach { case ((a, b), i) =>
      val m = sets(Seq(a, b))
      assert(m(0L).toSet.intersect(m(1L).toSet).nonEmpty,
        s"pair $i: shared 7-token run produced disjoint fingerprints")
    }
    // no false sharing on disjoint vocabularies
    val disjoint = sets(Seq("a b c d e f g h i j", "k l m n o p q r s t"))
    assert(disjoint(0L).toSet.intersect(disjoint(1L).toSet).isEmpty)
    // < 7 tokens -> no grams, doc dropped (the documented floor)
    assert(!sets(Seq("one two three four five six")).contains(0L))
  }

  test("fingerprint count is bounded by the window count and positive") {
    val m = sets(Seq(((1 to 40).map(i => s"w$i")).mkString(" ")))
    val fps = m(0L)
    val nWindows = 40 - 3 - 3 // n_grams - w + 1
    assert(fps.nonEmpty && fps.size <= nWindows)
    assert(fps == fps.sorted && fps.distinct.size == fps.size)
  }
}
