package graft

import org.apache.spark.sql.SparkSession

/** Scale-adaptive session defaults shared by every harness entry point
  * (Bench/Verify/Explain and the dev tools), applied in ONE place so the
  * bench, the correctness gate and the dev loop measure the same engine.
  *
  * Every setting here must hold at any scale — a value that only makes
  * sense on local[32] does not belong. Each is overridable through the
  * environment (`SPARK_GRAFT_CONF_<suffix>`), keeping the driver's bench
  * comparable while a cluster deployment can re-tune without a rebuild.
  *
  * `canChangeCachedPlanOutputPartitioning=true` (round-18, guide §2.4):
  * Spark disables AQE re-planning inside `persist()` materialization by
  * default to keep a cached plan's output partitioning stable for
  * downstream reuse. This engine's caches are all either group-sized
  * rollups (MV maintenance, HistogramNtile bases, dedup candidate sets)
  * or explicitly re-clustered after caching, so partitioning stability
  * buys nothing — while the default forces every cached-plan shuffle to
  * the static `spark.sql.shuffle.partitions` width. On group-sized
  * frames that is dozens of empty tasks per action (ProfileTarget on
  * lake_incr_mv: 37 stages, 51 core-s of stage run vs 19.5 core-s of
  * CPU, several 32-task stages moving zero bytes). With AQE allowed in,
  * those shuffles coalesce to the data's real width at ANY scale — a
  * 100 TB delta keeps its thousands of partitions; a 6-group view stops
  * paying for 32. Hash partitioning semantics survive coalescing
  * (`CoalescedHashPartitioning` still satisfies the downstream
  * ClusteredDistribution), so exchange-reuse patterns like the pagerank
  * dst-clustered edge cache keep their zero-exchange iterations.
  */
object SessionTuning {
  def apply(b: SparkSession.Builder): SparkSession.Builder =
    b.config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
      sys.env.getOrElse("SPARK_GRAFT_CONF_AQE_CACHED", "true"))
}
