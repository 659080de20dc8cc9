package graft.lake

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental materialized AGGREGATE view — the batch-changelog
  * payoff (incremental view maintenance): a COUNT/SUM rollup of a base
  * table kept fresh at O(delta + |view|) refresh cost, never a base
  * rescan. The algebra is the classic delta-maintenance rule for
  * distributive aggregates: the changelog's `insert` rows contribute
  * +1/+value and `delete` rows −1/−value, so a copy-on-write rewrite's
  * carried survivors cancel exactly (their delete and insert deltas
  * annihilate), row-level deletes subtract, updates move mass between
  * groups via their delete+insert pair, and compactions (skipped by
  * the changelog as no logical change) cost nothing. Sum columns must
  * be INTEGER expressions over base rows (the floor-cents device for
  * money) — exact group arithmetic, no float drift across refreshes.
  *
  * One refresh = ONE atomic commit on the view table: the re-aggregated
  * contents replace the old files and the base-snapshot watermark
  * property moves in the same CAS transform — a reader never sees a
  * view claiming a watermark its rows don't reflect, and a crashed
  * refresh leaves the old view intact (the next refresh re-reads the
  * same delta).
  *
  * Scale shape: the delta aggregation shuffles O(changed rows) on the
  * view keys, the merge re-aggregates O(|view| + |delta groups|) rows
  * (the view is group-sized, not base-sized), and the view rewrite is
  * O(|view|). At 100 TB with a group-sized view this is the difference
  * between a nightly full rebuild and a minute-scale refresh. */
object IncrementalAggView {
  /** View table property carrying the base snapshot the contents
    * reflect. Advanced inside the refresh commit's CAS transform. */
  val WatermarkProp = "incr-view.base-snapshot-id"

  final case class RefreshReport(fromSnapshotId: Long, toSnapshotId: Long,
      deltaRows: Long, refreshed: Boolean)

  /** Bring `view` up to date with `base`. The view schema must be
    * `keys ++ cnt: long ++ sums.map(_._1): long`. `sums` are integer
    * Column expressions over BASE rows (e.g. floor-cents). */
  def refresh(spark: SparkSession, base: LakeTable, view: LakeTable,
      keys: Seq[String], sums: Seq[(String, Column)]): RefreshReport = {
    val b = base.refresh()
    val head = b.metadata.currentSnapshotId
    val v = view.refresh()
    val last = v.metadata.properties.get(WatermarkProp)
      .map(_.toLong).getOrElse(0L)
    if (head == last || head == -1L)
      return RefreshReport(last, head, 0L, refreshed = false)
    val delta = b.changelog(spark, last, Some(head))
    val sgn = when(col("_change_type") === "insert", 1L).otherwise(-1L)
    val aggExprs = sum(sgn).as("cnt") +:
      sums.map { case (n, c) => sum(sgn * c).as(n) }
    val deltaAgg = delta.groupBy(keys.map(col): _*)
      .agg(aggExprs.head, aggExprs.tail: _*)
    val deltaRows = deltaAgg.count()
    val mergeExprs = sum(col("cnt")).as("cnt") +:
      sums.map { case (n, _) => sum(col(n)).as(n) }
    val merged = v.newScan().toDF(spark).unionByName(deltaAgg)
      .groupBy(keys.map(col): _*)
      .agg(mergeExprs.head, mergeExprs.tail: _*)
      // a group whose every row died leaves a zero-count residue row —
      // it must VANISH, exactly as a full recompute would drop it
      .filter(col("cnt") =!= 0L)
    val added = v.writeDataFiles(merged)
    v.commitSnapshot("replace", added, v.metadata.currentFiles,
      dropDeletes = true,
      transformMeta = m => m.copy(properties =
        m.properties + (WatermarkProp -> head.toString)))
    RefreshReport(last, head, deltaRows, refreshed = true)
  }
}
