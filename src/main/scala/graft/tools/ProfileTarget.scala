package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Stage-metrics profiler for one corpus target (round-15 verdict ask:
  * the sf10 probe's two regressed targets needed per-stage evidence,
  * not a logical-plan pin — the plan was already pinned and the 2–3×
  * was invisible in it). Runs `SparkEntry.queries(name)` against a
  * data dir with a [[SparkListener]] accumulating per-stage wall,
  * executor CPU, shuffle bytes, spill and GC, then prints the stages
  * sorted by executor run time. The split that matters:
  *
  *   - high `run−cpu` gap + spill bytes  → disk/spill bound,
  *   - high GC                           → memory churn,
  *   - wall ≫ sum(stage run)/cores       → driver/scheduler bound
  *     (many tiny stages — the iterative-loop suspect),
  *   - none of the above                 → genuinely CPU.
  *
  * Usage: runMain graft.tools.ProfileTarget <name> [dataDir] [reps]
  */
object ProfileTarget {
  private final case class StageRow(id: Int, name: String, tasks: Int,
      runMs: Long, cpuMs: Long, gcMs: Long, shufReadMb: Double,
      shufWriteMb: Double, spillMb: Double, inputMb: Double)

  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.SessionTuning(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.lake.sql.LakeSqlExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("graft.simhashDedup.pairBudget", "0")
    spark.range(1000000L).selectExpr("sum(id)").collect() // warmup

    val stages = scala.collection.mutable.ArrayBuffer.empty[StageRow]
    val listener = new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val i = e.stageInfo
        val m = i.taskMetrics
        stages.synchronized {
          stages += StageRow(i.stageId, i.name.takeWhile(_ != '\n'),
            i.numTasks, m.executorRunTime, m.executorCpuTime / 1000000L,
            m.jvmGCTime,
            m.shuffleReadMetrics.totalBytesRead / 1e6,
            m.shuffleWriteMetrics.bytesWritten / 1e6,
            (m.memoryBytesSpilled + m.diskBytesSpilled) / 1e6,
            m.inputMetrics.bytesRead / 1e6)
        }
      }
    }

    for (rep <- 1 to reps) {
      stages.clear()
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      val fn = graft.SparkEntry.queries(name)
      val df = fn(spark, dir)
      val t1 = System.nanoTime()
      val n = df.count()
      val t2 = System.nanoTime()
      graft.queries.QueryCaches.clear()
      // listener events are async (listenerBus is private[spark]) —
      // poll until the buffer stops growing before reading it
      var prev = -1
      var stable = 0
      while (stable < 2) {
        Thread.sleep(200)
        val cur = stages.synchronized(stages.size)
        if (cur == prev) stable += 1 else { stable = 0; prev = cur }
      }
      spark.sparkContext.removeSparkListener(listener)
      val rows = stages.synchronized(stages.toVector)
      val wall = (t2 - t0) / 1e9
      println(f"%n=== $name rep $rep: rows=$n wall=$wall%.2f s " +
        f"(build ${(t1 - t0) / 1e9}%.2f + query ${(t2 - t1) / 1e9}%.2f), " +
        f"${rows.size} stages ===")
      println(f"${"stage"}%6s ${"tasks"}%6s ${"run_s"}%8s ${"cpu_s"}%8s " +
        f"${"gc_s"}%7s ${"sh_rd_MB"}%9s ${"sh_wr_MB"}%9s ${"spill_MB"}%9s " +
        f"${"in_MB"}%8s  name")
      rows.sortBy(-_.runMs).take(25).foreach { r =>
        println(f"${r.id}%6d ${r.tasks}%6d ${r.runMs / 1e3}%8.2f " +
          f"${r.cpuMs / 1e3}%8.2f ${r.gcMs / 1e3}%7.2f ${r.shufReadMb}%9.1f " +
          f"${r.shufWriteMb}%9.1f ${r.spillMb}%9.1f ${r.inputMb}%8.1f  " +
          r.name.take(60))
      }
      val totRun = rows.map(_.runMs).sum / 1e3
      val totCpu = rows.map(_.cpuMs).sum / 1e3
      val totGc = rows.map(_.gcMs).sum / 1e3
      val totSpill = rows.map(_.spillMb).sum
      println(f"TOTAL stages=${rows.size} run=$totRun%.1f s cpu=$totCpu%.1f s " +
        f"gc=$totGc%.1f s spill=$totSpill%.0f MB " +
        f"wall_x_cores=${wall * cpus.toInt}%.0f core-s " +
        f"sched_gap=${wall - totRun / cpus.toInt}%.2f s")
    }
    spark.stop()
  }
}
