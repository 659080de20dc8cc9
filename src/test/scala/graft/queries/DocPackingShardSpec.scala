package graft.queries

import graft.lake.LakeSuite
import org.apache.spark.sql.functions._

/** `graft.packing.shards` is the parallelism knob of doc_packing
  * (round-11): shards must be fully independent — each document's pack
  * assignment depends only on the running token offset within its own
  * shard — so raising S on a bigger cluster regroups the output without
  * changing any per-shard pack math. Verified against a from-scratch
  * Scala oracle at S=32 (not the pinned default 8). */
class DocPackingShardSpec extends LakeSuite {

  private val d = "/root/testdata/sf0.001"

  // Spark's size(split(text, "\\s+")) = Java split with limit -1
  // (keeps leading/trailing empty tokens)
  private def tokens(text: String): Long =
    text.split("\\s+", -1).length.toLong

  test("S=32 packing equals a per-shard local oracle; default stays 8") {
    import spark.implicits._
    val docs = Tables.documents(spark, d)
      .select(col("doc_id").cast("long"), col("text")).as[(Long, String)]
      .collect().sortBy(_._1)

    // local oracle: independent running offsets per shard at S = 32
    val S = 32
    val B = 256
    val expected = docs.groupBy { case (id, _) => id % S }.toSeq.flatMap {
      case (shard, ds) =>
        var off = 0L
        ds.sortBy(_._1).map { case (id, text) =>
          val n = tokens(text)
          val pack = off / B
          off += n
          (shard, pack, id, n)
        }
    }
      .groupBy { case (shard, pack, _, _) => (shard, pack) }
      .map { case ((shard, pack), rows) =>
        (shard, pack, rows.size.toLong, rows.map(_._4).sum,
          rows.map(_._3).min, rows.map(_._3).max)
      }
      .toSeq.sorted

    spark.conf.set("graft.packing.shards", "32")
    val got =
      try TextQueries.qDocPacking(spark, d).collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5))).toSeq.sorted
      finally spark.conf.unset("graft.packing.shards")
    assert(got === expected)
    assert(got.map(_._1).distinct.size > 8) // genuinely ran at S=32

    // default is still the oracle-pinned 8
    val dflt = TextQueries.qDocPacking(spark, d)
      .select(max(col("shard"))).head().getLong(0)
    assert(dflt == 7L)
  }
}
