package graft.lake

import java.nio.file.Files
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming CHANGELOG source (the `<table>.changes` handle): the
  * incremental-CDC twin of [[LakeTable.changelog]]. The DocStream
  * convention: streaming consumption of N commits must equal the batch
  * changelog over the same range, a checkpoint replay must be a no-op,
  * and the shapes the stream cannot express (merge-on-read tombstone
  * deltas) must refuse loudly toward the batch API. */
class LakeChangelogStreamSpec extends LakeSuite {

  private var n = 0
  private def sqlTable(): (String, LakeTable) = {
    n += 1
    val wh = freshWarehouse()
    val cat = s"clstr$n"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[sql.LakeSqlCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE $cat.ns")
    spark.sql(s"CREATE TABLE $cat.ns.t (${ordersDF.schema.toDDL})")
    (s"$cat.ns.t", LakeCatalog.open(wh).loadTable("ns", "t"))
  }

  private def drain(name: String, checkpoint: String): Seq[Row] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[Row]
    val q = spark.readStream
      .option("stream-from", "beginning")
      .table(s"$name.changes").writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        buf ++= df.collect(); ()
      }
      .start()
    q.awaitTermination()
    buf.toSeq
  }

  private def key(r: Row) = (r.getLong(r.fieldIndex("_commit_snapshot_id")),
    r.getString(r.fieldIndex("_change_type")),
    r.getLong(r.fieldIndex("o_orderkey")))

  test("appends + CoW delete stream as the batch changelog; replay is a no-op") {
    val (name, t) = sqlTable()
    t.appendData(ordersDF.filter(col("o_orderkey") % 2 === 0))
    t.refresh().appendData(ordersDF.filter(col("o_orderkey") % 2 === 1))
    // copy-on-write delete: rewritten survivors stream as inserts,
    // removed files' rows as deletes (gross file-granular changes)
    t.refresh().deleteWhere(spark, LakePredicate.Ge("o_totalprice",
      Double.box(400000.0)))

    val ckpt = Files.createTempDirectory("graft_cl_ck_").toString
    val streamed = drain(name, ckpt)
    val batch = t.refresh().changelog(spark, 0L).collect().toSeq
    assert(streamed.nonEmpty)
    assert(streamed.map(key).sorted === batch.map(key).sorted,
      s"stream (${streamed.size} rows) != batch changelog (${batch.size})")
    // full-row equality, not just keys: sort both sides identically
    // (the stream adds a trailing _row_id the batch changelog lacks)
    val sa = streamed.sortBy(key).map(_.toSeq.dropRight(1))
    val sb = batch.sortBy(key).map(_.toSeq)
    assert(sa === sb)

    // replay against the same checkpoint: nothing new
    assert(drain(name, ckpt).isEmpty)

    // one more append: only its inserts arrive, stamped with its id
    val extra = ordersDF.filter(col("o_orderkey") % 100 === 0)
      .withColumn("o_orderkey", col("o_orderkey") + 900000000L)
      .filter(col("o_totalprice") < 400000.0)
    val snap = t.refresh().appendData(extra)
    val more = drain(name, ckpt)
    assert(more.size === extra.count())
    assert(more.forall(r =>
      r.getString(r.fieldIndex("_change_type")) == "insert" &&
        r.getLong(r.fieldIndex("_commit_snapshot_id")) == snap.snapshotId))
  }

  /** Round-16 verdict ask: MoR tombstone deltas STREAM — the spec
    * convention stays "stream == batch changelog over the same range",
    * now exercised across every tombstone kind. */
  private def assertStreamEqualsBatch(name: String, t: LakeTable,
      ckpt: String): Seq[Row] = {
    val streamed = drain(name, ckpt)
    val batch = t.refresh().changelog(spark, 0L).collect().toSeq
    assert(streamed.map(key).sorted === batch.map(key).sorted,
      s"stream (${streamed.size} rows) != batch changelog (${batch.size})")
    val sa = streamed.sortBy(key).map(_.toSeq.dropRight(1))
    val sb = batch.sortBy(key).map(_.toSeq)
    assert(sa === sb)
    streamed
  }

  test("a positional MoR delete streams its tombstoned rows as deletes") {
    val (name, t) = sqlTable()
    t.appendData(ordersDF.filter(col("o_orderkey") % 2 === 0), numFiles = 3)
    t.refresh().deleteWhereMoR(spark, LakePredicate.Ge("o_totalprice",
      Double.box(400000.0)))
    val ckpt = Files.createTempDirectory("graft_cl_ck_").toString
    val streamed = assertStreamEqualsBatch(name, t, ckpt)
    val dels = streamed.filter(_.getString(
      streamed.head.fieldIndex("_change_type")) == "delete")
    assert(dels.nonEmpty)
    assert(dels.forall(_.getDouble(
      dels.head.fieldIndex("o_totalprice")) >= 400000.0))
    // replay is a no-op; a second MoR delete streams ONLY its delta
    assert(drain(name, ckpt).isEmpty)
    t.refresh().deleteWhereMoR(spark, LakePredicate.Lt("o_totalprice",
      Double.box(5000.0)))
    val more = drain(name, ckpt)
    assert(more.nonEmpty && more.forall { r =>
      r.getString(r.fieldIndex("_change_type")) == "delete" &&
        r.getDouble(r.fieldIndex("o_totalprice")) < 5000.0
    })
  }

  test("a deletion-vector delta streams current-minus-parent per file") {
    val (name, t) = sqlTable()
    t.setProperty("write.delete.vector.enabled", "true")
    t.refresh().appendData(ordersDF.filter(col("o_orderkey") % 2 === 0),
      numFiles = 2)
    t.refresh().deleteWhereMoR(spark, LakePredicate.Ge("o_totalprice",
      Double.box(400000.0)))
    // second DV commit REPLACES the first file-level DVs: only the
    // newly-deleted positions may stream
    t.refresh().deleteWhereMoR(spark, LakePredicate.Ge("o_totalprice",
      Double.box(300000.0)))
    assert(t.refresh().metadata.currentSnapshot.exists(_.dvFiles.nonEmpty),
      "scenario must actually produce deletion vectors")
    val ckpt = Files.createTempDirectory("graft_cl_ck_").toString
    assertStreamEqualsBatch(name, t, ckpt)
  }

  test("an equality-tombstone upsert (mergeIntoMoR) streams inserts + key deletes") {
    val (name, t) = sqlTable()
    t.appendData(ordersDF.filter(col("o_orderkey") % 2 === 0))
    // MoR upsert: replace half the keys with bumped prices + new keys
    val source = ordersDF.filter(col("o_orderkey") % 4 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + 1.0)
      .unionByName(ordersDF.filter(col("o_orderkey") % 2 === 1).limit(50)
        .withColumn("o_orderkey", col("o_orderkey") + 700000000L))
    t.refresh().mergeIntoMoR(spark, source, Seq("o_orderkey"))
    val ckpt = Files.createTempDirectory("graft_cl_ck_").toString
    val streamed = assertStreamEqualsBatch(name, t, ckpt)
    // the upsert's own commit: pre-images of matched keys as deletes
    // (old prices), every source row as an insert
    val snap = t.refresh().metadata.currentSnapshotId
    val ofMerge = streamed.filter(_.getLong(
      streamed.head.fieldIndex("_commit_snapshot_id")) == snap)
    val dels = ofMerge.filter(_.getString(
      ofMerge.head.fieldIndex("_change_type")) == "delete")
    assert(dels.nonEmpty)
    assert(dels.forall(r => r.getLong(r.fieldIndex("o_orderkey")) % 4 == 0),
      "only matched keys may stream as deletes")
    // a second upsert over the MoR table streams only its delta
    assert(drain(name, ckpt).isEmpty)
    t.refresh().mergeIntoMoR(spark,
      ordersDF.filter(col("o_orderkey") % 4 === 0).limit(20)
        .withColumn("o_totalprice", col("o_totalprice") + 2.0),
      Seq("o_orderkey"))
    val more = drain(name, ckpt)
    val batch2 = t.refresh().changelog(spark, snap).collect().toSeq
    assert(more.map(key).sorted === batch2.map(key).sorted)
  }

  test("an over-budget tombstone delta refuses loudly toward the batch changelog") {
    val (name, t) = sqlTable()
    t.setProperty("read.delete.broadcast-bytes", "1")
    t.refresh().appendData(ordersDF.filter(col("o_orderkey") % 2 === 0))
    t.refresh().deleteWhereMoR(spark, LakePredicate.Ge("o_totalprice",
      Double.box(400000.0)))
    val ckpt = Files.createTempDirectory("graft_cl_ck_").toString
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drain(name, ckpt)
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(m => m.contains("batch changelog")
        && m.contains("broadcast-bytes")),
      s"refusal must point at the batch changelog: ${messages(e)}")
  }

  test("_row_id keys the CDC feed: stable across compaction, delete+insert pair on rewrite") {
    val (name, t) = sqlTable()
    t.appendData(ordersDF.filter(col("o_orderkey") % 2 === 0)
      .repartition(1).sortWithinPartitions(col("o_orderkey")))
    val ckpt = Files.createTempDirectory("graft_cl_ck_").toString
    val first = drain(name, ckpt)
    def rid(r: Row) = r.getLong(r.fieldIndex("_row_id"))
    def k(r: Row) = r.getLong(r.fieldIndex("o_orderkey"))
    val ids1 = first.map(r => k(r) -> rid(r)).toMap
    assert(ids1.values.toSeq.sorted == (0L until ids1.size.toLong),
      "first commit must stream dense ids 0..n-1")
    // compaction mid-stream: emits nothing, but MATERIALIZES ids into
    // the rewritten file — the next CoW commit's pre-images must still
    // carry the original ids
    t.refresh().compact(spark, targetFiles = 1)
    t.refresh().deleteWhere(spark, LakePredicate.Ge("o_totalprice",
      Double.box(400000.0)))
    val second = drain(name, ckpt)
    val dels = second.filter(_.getString(
      second.head.fieldIndex("_change_type")) == "delete")
    val ins = second.filter(_.getString(
      second.head.fieldIndex("_change_type")) == "insert")
    assert(dels.nonEmpty && ins.nonEmpty && ins.size < dels.size)
    // every pre-image carries its ORIGINAL id (read from the compacted
    // file's materialized cells), every surviving insert the SAME id —
    // a consumer keying on _row_id reconciles the rewrite exactly
    dels.foreach(r => assert(rid(r) == ids1(k(r)),
      s"delete pre-image of key ${k(r)} lost its id"))
    ins.foreach(r => assert(rid(r) == ids1(k(r)),
      s"surviving row ${k(r)} changed id across the rewrite"))
    val survivorKeys = ordersDF.filter(col("o_orderkey") % 2 === 0)
      .filter(col("o_totalprice") < 400000.0)
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    assert(ins.map(k).toSet == survivorKeys)
  }

  test("binary merge keys stream eq-tombstone deletes by value (round-16 advisory)") {
    // BinaryType cells are Array[Byte] in Catalyst internal form —
    // reference equality. Before the EqKeySet.comparable normalization
    // the stream silently matched ZERO pre-images for a binary merge
    // key while the batch changelog's === join matched by value.
    n += 1
    val wh = freshWarehouse()
    val cat = s"clstrb$n"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[sql.LakeSqlCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE $cat.ns")
    spark.sql(s"CREATE TABLE $cat.ns.tb (k BINARY, v DOUBLE)")
    val name = s"$cat.ns.tb"
    val t = LakeCatalog.open(wh).loadTable("ns", "tb")
    def asBin(df: org.apache.spark.sql.DataFrame) = df.select(
      expr("CAST(CAST(o_orderkey AS STRING) AS BINARY)").as("k"),
      col("o_totalprice").as("v"))
    t.appendData(asBin(ordersDF.filter(col("o_orderkey") % 2 === 0)))
    t.refresh().mergeIntoMoR(spark,
      asBin(ordersDF.filter(col("o_orderkey") % 4 === 0))
        .withColumn("v", col("v") + 1.0), Seq("k"))
    val ckpt = Files.createTempDirectory("graft_cl_ck_").toString
    val streamed = drain(name, ckpt)
    val batch = t.refresh().changelog(spark, 0L).collect().toSeq
    def bkey(r: Row) = (r.getLong(r.fieldIndex("_commit_snapshot_id")),
      r.getString(r.fieldIndex("_change_type")),
      new String(r.getAs[Array[Byte]](r.fieldIndex("k")),
        java.nio.charset.StandardCharsets.UTF_8),
      r.getDouble(r.fieldIndex("v")))
    assert(streamed.map(bkey).sorted === batch.map(bkey).sorted,
      s"stream (${streamed.size} rows) != batch changelog (${batch.size})")
    val expectedDels = ordersDF.filter(col("o_orderkey") % 4 === 0).count()
    assert(streamed.count(_.getString(
      streamed.head.fieldIndex("_change_type")) == "delete") == expectedDels,
      "every matched binary key's pre-image must stream as a delete")
  }

  test("compaction inside the range streams no changelog rows") {
    val (name, t) = sqlTable()
    t.appendData(ordersDF.filter(col("o_orderkey") % 2 === 0), numFiles = 4)
    t.refresh().compact(spark, targetFiles = 1)
    t.refresh().appendData(ordersDF.filter(col("o_orderkey") % 2 === 1))
    val ckpt = Files.createTempDirectory("graft_cl_ck_").toString
    val streamed = drain(name, ckpt)
    // every source row exactly once as an insert — the replace
    // snapshot contributed nothing
    assert(streamed.size === ordersDF.count())
    assert(streamed.forall(_.getString(
      streamed.head.fieldIndex("_change_type")) == "insert"))
  }
}
