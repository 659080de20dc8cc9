package graft.lake.sql

import scala.util.Random
import graft.lake.{LakeCatalog, LakeSuite}

/** Randomized DIFFERENTIAL fuzz over SQL row-level WRITES — the
  * companion of [[SqlFuzzSpec]] for the bug class the DuckDB oracle
  * cannot see at all: UPDATE SET evaluation order, MoR tombstone
  * application, MERGE clause precedence, maintenance no-ops. Seeded
  * sequences of INSERT / DELETE WHERE / UPDATE SET WHERE / MERGE /
  * rewrite_data_files / rewrite_position_deletes run against a lake
  * table under each row-level write mode (copy-on-write, merge-on-read,
  * deletion vectors), while a driver-side model applies the SAME
  * semantics to a plain Map — after every op the table contents must
  * equal the model exactly. The seed is in the failure message; freeze
  * any mismatch as a named regression before fixing it.
  *
  * Model semantics mirrored deliberately:
  *  - UPDATE assignments read the PRE-UPDATE row (SQL semantics: all
  *    SET expressions evaluate against the old row).
  *  - MERGE: a target row matches at most one source row (source ids
  *    are unique by construction); matched-AND-condition clauses apply
  *    in declaration order; NOT MATCHED inserts the source row.
  *  - Maintenance procedures are logical no-ops.
  *
  * Round 16 widens the read-back surface: every step also reads the
  * table through a catalog VIEW, and (snapshot, model) pins captured
  * at random steps are re-read via `VERSION AS OF` after every later
  * op — write churn and maintenance must never disturb history.
  *
  * Round 17 puts the two newest subsystems under the same adversary:
  * a `CREATE MATERIALIZED VIEW` rollup (count/sum/max by cat) rides
  * every table, refreshed through the stored-spec CALL at random
  * steps and after the final compaction — view contents must equal
  * the model's direct rollup (the extremum-retraction rescan and the
  * MoR tombstone-delta changelog both fuzz through here); and the
  * `.changes` STREAMING source drains at random steps from one
  * checkpoint, each drain compared row-for-row against the batch
  * changelog over the same snapshot window. */
class SqlWriteFuzzSpec extends LakeSuite {

  private val Seed: Long =
    sys.env.get("GRAFT_WRITE_FUZZ_SEED").map(_.toLong).getOrElse(20260816L)
  private val OpsPerMode: Int =
    sys.env.get("GRAFT_WRITE_FUZZ_N").map(_.toInt).getOrElse(14)

  private val C = "wfuzz"

  // the model: id -> (num, cat); id is the primary key
  private type Model = scala.collection.mutable.LinkedHashMap[Long, (Long, String)]

  private val cats = Vector("a", "b", "c", "d")

  /** Typed predicate usable on both sides. */
  private case class Pred(sql: String, f: (Long, Long, String) => Boolean)

  private def genPred(rnd: Random, model: Model): Pred = {
    def one(): Pred = rnd.nextInt(5) match {
      case 0 =>
        val ids = model.keys.toVector
        val v = if (ids.isEmpty) 0L else ids(rnd.nextInt(ids.size))
        Pred(s"id <= $v", (id, _, _) => id <= v)
      case 1 =>
        val nums = model.values.map(_._1).toVector
        val v = if (nums.isEmpty) 0L else nums(rnd.nextInt(nums.size))
        Pred(s"num >= $v", (_, n, _) => n >= v)
      case 2 =>
        val c = cats(rnd.nextInt(cats.size))
        Pred(s"cat = '$c'", (_, _, s) => s == c)
      case 3 =>
        val c = cats(rnd.nextInt(cats.size))
        Pred(s"cat <> '$c'", (_, _, s) => s != c)
      case 4 =>
        val m = 2 + rnd.nextInt(4)
        val r = rnd.nextInt(m)
        Pred(s"id % $m = $r", (id, _, _) => id % m == r)
    }
    val a = one()
    if (rnd.nextBoolean()) a
    else {
      val b = one()
      if (rnd.nextBoolean()) Pred(s"(${a.sql}) AND (${b.sql})",
        (i, n, s) => a.f(i, n, s) && b.f(i, n, s))
      else Pred(s"(${a.sql}) OR (${b.sql})",
        (i, n, s) => a.f(i, n, s) || b.f(i, n, s))
    }
  }

  private def tableRows(ref: String): Seq[(Long, Long, String)] =
    spark.sql(s"SELECT id, num, cat FROM $ref").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sortBy(_._1).toSeq

  private def modelRows(m: Model): Seq[(Long, Long, String)] =
    m.map { case (id, (n, s)) => (id, n, s) }.toSeq.sortBy(_._1)

  private var nextId = 1000L
  private def freshIds(rnd: Random, k: Int): Seq[Long] = {
    val ids = (0 until k).map(i => nextId + i)
    nextId += k
    ids
  }

  /** One mutation op applied to BOTH sides; returns its description. */
  private def applyOp(rnd: Random, ref: String, tblName: String,
      wh: String, model: Model): String = rnd.nextInt(10) match {
    case 0 | 1 => // INSERT VALUES, 1-4 fresh rows
      val rows = freshIds(rnd, 1 + rnd.nextInt(4)).map { id =>
        (id, rnd.nextInt(1000).toLong, cats(rnd.nextInt(cats.size)))
      }
      spark.sql(s"INSERT INTO $ref VALUES " + rows.map { case (i, n, s) =>
        s"($i, $n, '$s')" }.mkString(", "))
      rows.foreach { case (i, n, s) => model(i) = (n, s) }
      s"INSERT ${rows.size} rows"
    case 2 | 3 => // DELETE WHERE
      val p = genPred(rnd, model)
      spark.sql(s"DELETE FROM $ref WHERE ${p.sql}")
      model.filterInPlace { case (id, (n, s)) => !p.f(id, n, s) }
      s"DELETE WHERE ${p.sql}"
    case 4 | 5 => // UPDATE SET (both columns, reading the pre-update row)
      val p = genPred(rnd, model)
      val k = 1 + rnd.nextInt(7)
      val c = cats(rnd.nextInt(cats.size))
      // num references itself; cat set to a literal — assignments must
      // see the PRE-update row
      spark.sql(s"UPDATE $ref SET num = num + $k, cat = '$c' WHERE ${p.sql}")
      model.mapValuesInPlace { case (id, (n, s)) =>
        if (p.f(id, n, s)) (n + k, c) else (n, s)
      }
      s"UPDATE +$k/'$c' WHERE ${p.sql}"
    case 6 | 7 => // MERGE: update-or-delete matched, insert unmatched
      val existing = model.keys.toVector
      val touched = rnd.shuffle(existing).take(math.min(3, existing.size))
      val fresh = freshIds(rnd, 1 + rnd.nextInt(2))
      val src = (touched ++ fresh).map { id =>
        (id, rnd.nextInt(1000).toLong, cats(rnd.nextInt(cats.size)))
      }
      val del = cats(rnd.nextInt(cats.size))
      spark.sql(
        s"""MERGE INTO $ref t USING (SELECT * FROM VALUES ${src.map {
             case (i, n, s) => s"($i, ${n}L, '$s')" }.mkString(", ")}
           |  AS v(id, num, cat)) s ON t.id = s.id
           |WHEN MATCHED AND s.cat = '$del' THEN DELETE
           |WHEN MATCHED THEN UPDATE SET num = t.num + s.num, cat = s.cat
           |WHEN NOT MATCHED THEN INSERT (id, num, cat)
           |  VALUES (s.id, s.num, s.cat)""".stripMargin)
      src.foreach { case (id, n, s) =>
        model.get(id) match {
          case Some((tn, _)) =>
            if (s == del) model.remove(id) else model(id) = (tn + n, s)
          case None => model(id) = (n, s)
        }
      }
      s"MERGE ${src.size} source rows (delete-cat '$del')"
    case 8 => // maintenance: compaction — no logical change
      spark.sql(s"CALL $C.system.rewrite_data_files('ns.$tblName', 2)")
      "CALL rewrite_data_files"
    case 9 => // maintenance: materialize tombstones — no logical change
      spark.sql(s"CALL $C.system.rewrite_position_deletes('ns.$tblName')")
      "CALL rewrite_position_deletes"
  }

  test(s"$OpsPerMode seeded write ops x 3 write modes match the model (seed=$Seed)") {
    val wh = freshWarehouse()
    spark.conf.set(s"spark.sql.catalog.$C", classOf[LakeSqlCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$C.warehouse", wh)
    try {
      spark.sql(s"CREATE NAMESPACE $C.ns")
      val modes = Seq(
        "cow" -> Map.empty[String, String],
        "mor" -> Map("write.delete.mode" -> "merge-on-read",
          "write.update.mode" -> "merge-on-read",
          "write.merge.mode" -> "merge-on-read"),
        "dv" -> Map("write.delete.vector.enabled" -> "true"))
      modes.foreach { case (mode, props) =>
        val rnd = new Random(Seed + mode.hashCode)
        val tbl = s"t_$mode"
        val ref = s"$C.ns.$tbl"
        spark.sql(s"CREATE TABLE $ref (id BIGINT, num BIGINT, cat STRING)")
        props.foreach { case (k, v) =>
          spark.sql(s"ALTER TABLE $ref SET TBLPROPERTIES ('$k'='$v')") }
        val model: Model = scala.collection.mutable.LinkedHashMap.empty
        // seed rows in two commits so maintenance has files to chew
        (0 until 2).foreach { c =>
          val rows = freshIds(rnd, 6).map { id =>
            (id, rnd.nextInt(1000).toLong, cats(rnd.nextInt(cats.size))) }
          spark.sql(s"INSERT INTO $ref VALUES " + rows.map {
            case (i, n, s) => s"($i, $n, '$s')" }.mkString(", "))
          rows.foreach { case (i, n, s) => model(i) = (n, s) }
        }
        // a catalog VIEW over the churned table (round-16 verdict ask):
        // re-resolved at every read below, so the whole write sequence
        // also exercises view-over-mutating-table reads
        spark.sql(s"CREATE VIEW $C.ns.v_$tbl AS " +
          s"SELECT id, num, cat FROM $ref WHERE num >= 0")
        val lakeTbl = LakeCatalog.open(wh).loadTable("ns", tbl)
        // round-17: a materialized view maintained alongside the model
        spark.sql(s"CREATE MATERIALIZED VIEW $C.ns.mv_$tbl AS " +
          s"SELECT cat, count(*) AS cnt, sum(num) AS total, " +
          s"max(num) AS max_num FROM $ref GROUP BY cat")
        def mvDirect(): Seq[(String, Long, Long, Long)] =
          model.values.groupBy(_._2).map { case (c, vs) =>
            (c, vs.size.toLong, vs.map(_._1).sum, vs.map(_._1).max)
          }.toSeq.sortBy(_._1)
        def mvRows(): Seq[(String, Long, Long, Long)] =
          spark.sql(s"SELECT cat, cnt, total, max_num FROM $C.ns.mv_$tbl")
            .collect().map(r => (r.getString(0), r.getLong(1),
              r.getLong(2), r.getLong(3))).sortBy(_._1).toSeq
        assert(mvRows() == mvDirect(),
          s"mode=$mode seed=$Seed: MV diverged at create")
        // round-18: an AVG + DIM-ENRICHED view under the same
        // adversary (verdict ask #7) — avg(num) decomposes onto the
        // slot/__nn pair, the dim join rides pinned snapshots, and
        // random dim commits below exercise the staleness refusal →
        // rebuild_agg_view path mid-sequence
        val dimRef = s"$C.ns.dim_$tbl"
        spark.sql(s"CREATE TABLE $dimRef (cat STRING, klass STRING)")
        val klassOf = scala.collection.mutable.Map(
          cats.map(c => c -> (if (c < "c") "lo" else "hi")): _*)
        spark.sql(s"INSERT INTO $dimRef VALUES " + klassOf.map {
          case (c, k) => s"('$c', '$k')" }.mkString(", "))
        spark.sql(s"CREATE MATERIALIZED VIEW $C.ns.mv2_$tbl AS " +
          s"SELECT klass, count(*) AS cnt, avg(num) AS avg_num, " +
          s"sum(num) AS total FROM $ref JOIN $dimRef ON $ref.cat = " +
          s"$dimRef.cat GROUP BY klass")
        def mv2Direct(): Seq[(String, Long, Double, Long)] =
          model.values.groupBy { case (_, c) => klassOf(c) }
            .map { case (k, vs) =>
              val nums = vs.map(_._1)
              // the engine's exact spelling: integer slot sum, double
              // division by the non-null count
              (k, vs.size.toLong,
                nums.sum.toDouble / vs.size.toDouble, nums.sum)
            }.toSeq.sortBy(_._1)
        def mv2Rows(): Seq[(String, Long, Double, Long)] =
          spark.sql(s"SELECT klass, cnt, avg_num, total FROM $C.ns.mv2_$tbl")
            .collect().map(r => (r.getString(0), r.getLong(1),
              r.getDouble(2), r.getLong(3))).sortBy(_._1).toSeq
        assert(mv2Rows() == mv2Direct(),
          s"mode=$mode seed=$Seed: enriched MV diverged at create")
        // round-17: the `.changes` stream drains from ONE checkpoint;
        // each drain must equal the batch changelog over its window
        val ckpt = java.nio.file.Files
          .createTempDirectory(s"graft_wfuzz_ck_$mode").toString
        var lastDrained = 0L
        def drainAndCompare(step: Int, desc: String): Unit = {
          val cur = lakeTbl.refresh().currentSnapshotId
          val buf = scala.collection.mutable.ArrayBuffer
            .empty[org.apache.spark.sql.Row]
          val q = spark.readStream.option("stream-from", "beginning")
            .table(s"$ref.changes").writeStream
            .option("checkpointLocation", ckpt)
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
              buf ++= df.collect(); ()
            }.start()
          q.awaitTermination()
          def key(r: org.apache.spark.sql.Row) =
            (r.getLong(r.fieldIndex("_commit_snapshot_id")),
              r.getString(r.fieldIndex("_change_type")),
              r.getLong(r.fieldIndex("id")),
              r.getLong(r.fieldIndex("num")),
              r.getString(r.fieldIndex("cat")))
          val batch = lakeTbl.refresh()
            .changelog(spark, lastDrained, Some(cur)).collect().toSeq
          assert(buf.toSeq.map(key).sorted == batch.map(key).sorted,
            s"mode=$mode seed=$Seed: .changes stream (${buf.size} rows) " +
              s"!= batch changelog (${batch.size}) over ($lastDrained, " +
              s"$cur] after step $step ($desc)")
          lastDrained = cur
        }
        val log = scala.collection.mutable.ArrayBuffer.empty[String]
        // TIME-TRAVEL pins captured mid-sequence (round-16 verdict
        // ask): (snapshot id, model copy) frozen after random steps;
        // every later step must still read the pinned state back
        // exactly — write churn, maintenance rewrites, and tombstone
        // materialization must never disturb history
        val pins = scala.collection.mutable.ArrayBuffer
          .empty[(Long, Seq[(Long, Long, String)])]
        (0 until OpsPerMode).foreach { step =>
          val desc = applyOp(rnd, ref, tbl, wh, model)
          log += desc
          val got = tableRows(ref)
          val want = modelRows(model)
          assert(got == want,
            s"""mode=$mode seed=$Seed diverged after step $step ($desc)
               |history: ${log.mkString("; ")}
               |got:  $got
               |want: $want""".stripMargin)
          assert(tableRows(s"$C.ns.v_$tbl") == want,
            s"mode=$mode seed=$Seed: view read diverged after step $step ($desc)")
          if (rnd.nextInt(4) == 0)
            pins += ((lakeTbl.refresh().currentSnapshotId, want))
          pins.foreach { case (snap, pinned) =>
            assert(tableRows(s"$ref VERSION AS OF $snap") == pinned,
              s"mode=$mode seed=$Seed: VERSION AS OF $snap drifted " +
                s"after step $step ($desc)")
          }
          // MV refresh on ~half the steps (multi-commit deltas fuzz
          // through the skipped ones); view ≡ the model's direct rollup
          if (rnd.nextInt(2) == 0) {
            spark.sql(s"CALL $C.system.refresh_agg_view('ns.mv_$tbl')")
            assert(mvRows() == mvDirect(),
              s"mode=$mode seed=$Seed: MV diverged after step $step ($desc)")
          }
          // a DIM commit on ~a sixth of the steps: the enriched view's
          // refresh must REFUSE (stale pin) and rebuild must converge
          if (rnd.nextInt(6) == 0) {
            val c = s"x$step"
            val k = if (rnd.nextBoolean()) "lo" else "hi"
            spark.sql(s"INSERT INTO $dimRef VALUES ('$c', '$k')")
            klassOf(c) = k
            def msgs(x: Throwable): String =
              if (x == null) "" else x.getMessage + "\n" + msgs(x.getCause)
            val e = intercept[Exception](spark.sql(
              s"CALL $C.system.refresh_agg_view('ns.mv2_$tbl')").collect())
            assert(msgs(e).contains("rebuild"),
              s"mode=$mode seed=$Seed: dim commit must refuse refresh " +
                s"toward rebuild, got ${msgs(e)}")
            spark.sql(s"CALL $C.system.rebuild_agg_view('ns.mv2_$tbl')")
              .collect()
            assert(mv2Rows() == mv2Direct(),
              s"mode=$mode seed=$Seed: enriched MV rebuild diverged " +
                s"after step $step ($desc)")
          } else if (rnd.nextInt(3) == 0) {
            spark.sql(s"CALL $C.system.refresh_agg_view('ns.mv2_$tbl')")
            assert(mv2Rows() == mv2Direct(),
              s"mode=$mode seed=$Seed: enriched MV diverged after " +
                s"step $step ($desc)")
          }
          // .changes stream drain on ~a third of the steps
          if (rnd.nextInt(3) == 0) drainAndCompare(step, desc)
        }
        // final no-op check: a full compaction must not move contents
        // — nor any pinned historical read
        spark.sql(s"CALL $C.system.rewrite_data_files('ns.$tbl', 1)")
        assert(tableRows(ref) == modelRows(model),
          s"mode=$mode: final compaction changed contents")
        pins.foreach { case (snap, pinned) =>
          assert(tableRows(s"$ref VERSION AS OF $snap") == pinned,
            s"mode=$mode: VERSION AS OF $snap drifted across compaction")
        }
        // compaction is a logical no-op for BOTH subsystems: the MV
        // refresh sees an empty delta (watermark-only commit), the
        // stream emits nothing for the replace snapshot
        spark.sql(s"CALL $C.system.refresh_agg_view('ns.mv_$tbl')")
        assert(mvRows() == mvDirect(),
          s"mode=$mode: MV diverged across the final compaction")
        spark.sql(s"CALL $C.system.refresh_agg_view('ns.mv2_$tbl')")
        assert(mv2Rows() == mv2Direct(),
          s"mode=$mode: enriched MV diverged across the final compaction")
        drainAndCompare(-1, "final compaction")
      }
    } finally {
      spark.conf.unset(s"spark.sql.catalog.$C")
      spark.conf.unset(s"spark.sql.catalog.$C.warehouse")
    }
  }
}
