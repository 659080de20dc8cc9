package graft.lake

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Model-based check of the whole commit protocol: a seeded random
  * sequence of table operations runs against BOTH the real lake table
  * and a trivial in-memory model; after every commit the scanned table
  * must equal the model exactly. One divergence anywhere in the
  * manifest layering (survivor rewrites, replaceAll, validation,
  * expiry, orphan cleanup) shows up as a concrete failing seed+step —
  * coverage no hand-written example test enumerates. */
class LakeModelSpec extends LakeSuite {

  private val modelSchema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("v", DoubleType, nullable = false)))

  private def df(rows: Seq[(Long, Double)]) =
    spark.createDataFrame(
      rows.map { case (i, v) => Row(i, v) }.asJava0, modelSchema)
      .coalesce(1)

  test("pre-manifest-list (formatVersion 1) documents are refused loudly") {
    val noIo = new ManifestIO {
      def readList(name: String) = Nil
      def readManifest(name: String) = Nil
    }
    // a v1 document embeds files in the snapshot and has no manifestList
    // key — without the version check this NPE'd deep in parseSnapshot
    val v1 = """{"formatVersion":1,"name":"t","location":"/x","schema":
      {"type":"struct","fields":[]},"spec":[],"snapshots":[
      {"id":1,"parentId":null,"timestampMs":0,"operation":"append",
      "files":[],"fileCount":0,"totalRecords":0,"totalSizeBytes":0,
      "summary":{}}],"currentSnapshotId":1}""".replaceAll("\n\\s*", "")
    val e = intercept[IllegalStateException](MetadataJson.read(v1, noIo))
    assert(e.getMessage.contains("formatVersion 1"))
  }

  test("random op sequences keep table == model at every step") {
    for (seed <- Seq(7, 23)) {
      val rng = new scala.util.Random(seed)
      val cat = LakeCatalog.open(freshWarehouse())
      val t = cat.createTable("ns", s"model_$seed", modelSchema)
      var model = Map.empty[Long, Double]
      var nextId = 0L

      def freshRows(n: Int): Seq[(Long, Double)] = (0 until n).map { _ =>
        nextId += 1
        (nextId, rng.nextInt(1000).toDouble)
      }

      def check(step: Int, op: String): Unit = {
        val actual = t.refresh().newScan().toDF(spark)
          .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
        assert(actual === model, s"seed=$seed step=$step after $op")
      }

      for (step <- 0 until 12) {
        rng.nextInt(6) match {
          case 0 => // append
            val rows = freshRows(1 + rng.nextInt(40))
            t.refresh().appendData(df(rows))
            model ++= rows
          case 1 => // delete by id range
            val cut = if (model.isEmpty) 0L else nextId - rng.nextInt(20)
            t.refresh().deleteWhere(spark, LakePredicate.Ge("id", cut))
            model = model.filter { case (id, _) => id < cut }
          case 2 => // update a band
            val lo = math.max(1L, nextId - rng.nextInt(30))
            t.refresh().updateWhere(spark,
              LakePredicate.Ge("id", lo), Map("v" -> lit(-1.0)))
            model = model.map { case (id, v) => id -> (if (id >= lo) -1.0 else v) }
          case 3 => // merge: update low band + insert fresh
            val updates = model.keys.toSeq.sorted.take(5).map(id => (id, 777.0))
            val inserts = freshRows(1 + rng.nextInt(10))
            val src = updates ++ inserts
            if (src.nonEmpty) {
              t.refresh().mergeInto(spark, df(src), Seq("id"))
              model ++= src
            }
          case 4 => // compact (full or binpack)
            if (rng.nextBoolean()) t.refresh().compact(spark, targetFiles = 2)
            else t.refresh().compactSmallFiles(spark, smallBytes = 1L << 20)
          case 5 => // maintenance: expire + orphan sweep
            t.refresh().expireSnapshots(keepLast = 1)
            t.removeOrphanFiles()
        }
        check(step, s"op")
      }
      // end-state read through a FRESH catalog (durability of the layout)
      val re = LakeCatalog.open(t.location.stripSuffix(s"/ns/model_$seed"))
        .loadTable("ns", s"model_$seed")
      val reread = re.newScan().toDF(spark)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
      assert(reread === model, s"seed=$seed reopened-catalog state")
    }
  }

  /** Second model family: MERGE-ON-READ mutations (tombstone files or
    * DV bitmaps by coin flip), rollback forks, and a TIME-TRAVEL check —
    * every surviving historical snapshot must replay to the exact model
    * state recorded when it was current, under any later mutation mix. */
  test("random MoR/DV/rollback sequences keep table, history and time travel == model") {
    for (seed <- Seq(11, 42)) {
      val rng = new scala.util.Random(seed)
      val cat = LakeCatalog.open(freshWarehouse())
      val t = cat.createTable("ns", s"morm_$seed", modelSchema)
      if (rng.nextBoolean()) // half the seeds exercise the DV encoding
        t.refresh().setProperty("write.delete.vector.enabled", "true")
      var model = Map.empty[Long, Double]
      var nextId = 0L
      var history = Map.empty[Long, Map[Long, Double]] // snapshotId -> state

      def freshRows(n: Int): Seq[(Long, Double)] = (0 until n).map { _ =>
        nextId += 1
        (nextId, rng.nextInt(1000).toDouble)
      }
      def record(op: String, step: Int): Unit = {
        val id = t.refresh().currentSnapshotId
        history += id -> model
        val actual = t.newScan().toDF(spark)
          .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
        assert(actual === model, s"seed=$seed step=$step after $op")
        // time travel: a random SURVIVING recorded snapshot replays to
        // the state it was current at (expiry may have dropped some)
        val alive = t.metadata.snapshots.map(_.id).filter(history.contains)
        if (alive.nonEmpty) {
          val pick = alive(rng.nextInt(alive.size))
          val then_ = t.asOf(pick).toDF(spark)
            .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
          assert(then_ === history(pick),
            s"seed=$seed step=$step time travel to $pick after $op")
        }
      }

      val seedRows = freshRows(20)
      t.refresh().appendData(df(seedRows))
      model = seedRows.toMap
      record("seed append", -1)

      for (step <- 0 until 14) {
        rng.nextInt(6) match {
          case 0 => // append
            val rows = freshRows(1 + rng.nextInt(30))
            t.refresh().appendData(df(rows))
            model ++= rows
          case 1 => // MoR delete of a trailing id band
            val cut = if (nextId == 0) 0L else nextId - rng.nextInt(15)
            t.refresh().deleteWhereMoR(spark, LakePredicate.Ge("id", cut))
            model = model.filter { case (id, _) => id < cut }
          case 2 => // MoR update of a band
            val lo = math.max(1L, nextId - rng.nextInt(25))
            t.refresh().updateWhereMoR(spark,
              LakePredicate.Ge("id", lo), Map("v" -> lit(-7.0)))
            model = model.map { case (id, v) => id -> (if (id >= lo) -7.0 else v) }
          case 3 => // MoR merge upsert
            val updates = model.keys.toSeq.sorted.takeRight(4).map(id => (id, 555.0))
            val inserts = freshRows(1 + rng.nextInt(8))
            t.refresh().mergeIntoMoR(spark, df(updates ++ inserts), Seq("id"))
            model ++= updates ++ inserts
          case 4 => // rollback to a random surviving ancestor (fork)
            val m = t.refresh().metadata
            val ids = m.snapshots.map(_.id).filter(history.contains)
            if (ids.nonEmpty) {
              val target = ids(rng.nextInt(ids.size))
              t.rollbackTo(target)
              model = history(target)
            }
          case 5 => // maintenance: materialize tombstones or expire
            if (rng.nextBoolean()) t.refresh().rewritePositionDeletes(spark)
            else t.refresh().expireSnapshots(keepLast = 2)
        }
        record(s"op$step", step)
      }
      // durability: reopened catalog sees the same end state
      val re = LakeCatalog.open(t.location.stripSuffix(s"/ns/morm_$seed"))
        .loadTable("ns", s"morm_$seed")
      assert(re.newScan().toDF(spark)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap === model,
        s"seed=$seed reopened-catalog state")
    }
  }
}
