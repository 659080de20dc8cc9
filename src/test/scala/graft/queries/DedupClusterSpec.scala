package graft.queries

import graft.lake.LakeSuite

/** The size-gated connected-components paths must agree exactly: the
  * under-budget driver union-find and the distributed min-label
  * propagation loop produce the identical (doc_id, cluster_id)
  * labeling — min node id per component, either way. */
class DedupClusterSpec extends LakeSuite {

  test("union-find path == distributed label-propagation path") {
    val d = "/root/testdata/sf0.001"
    val fast = TextQueries.qDedupClusters(spark, d).collect().map(r =>
      (r.getLong(0), r.getLong(1))).toSeq
    assert(fast.nonEmpty)
    // force the distributed loop by zeroing the broadcast budget —
    // via the CANONICAL key (the primary read path); the legacy
    // spark.graft.* spelling is covered right after
    spark.conf.set("graft.cc.broadcastEdges", "0")
    try {
      val slow = TextQueries.qDedupClusters(spark, d).collect().map(r =>
        (r.getLong(0), r.getLong(1))).toSeq
      assert(slow === fast)
    } finally spark.conf.unset("graft.cc.broadcastEdges")
    // the legacy spelling still reaches the gate
    spark.conf.set("spark.graft.cc.broadcastEdges", "0")
    try {
      val legacy = TextQueries.qDedupClusters(spark, d).collect().map(r =>
        (r.getLong(0), r.getLong(1))).toSeq
      assert(legacy === fast)
    } finally spark.conf.unset("spark.graft.cc.broadcastEdges")
    // labels are min-per-component: every cluster id labels itself
    val byCluster = fast.groupBy(_._2)
    byCluster.foreach { case (cid, members) =>
      assert(members.map(_._1).min === cid)
    }
  }
}
