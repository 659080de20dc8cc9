package graft.lake

import org.apache.spark.sql.functions._

/** Equality-delete files (Iceberg v2): a merge-on-read upsert commits
  * the source rows AND an equality tombstone of their keys in one
  * commit, never reading the table — O(source) writes at any table
  * size. Tombstones apply to data files with STRICTLY SMALLER sequence
  * numbers, are field-ID addressed (rename-proof), and materialize away
  * on compact(). Moves totalEqualityDeletes off zero. */
class EqDeleteSpec extends LakeSuite {

  private def scan(t: LakeTable) = t.refresh().newScan().toDF(spark)

  private def upsertSource = {
    val tenth = ordersDF.filter(col("o_orderkey") % 10 === 0)
      .withColumn("o_totalprice", col("o_totalprice") * 2)
    tenth.unionByName(tenth.withColumn("o_orderkey", col("o_orderkey") + 100000000L))
  }

  private def expectedAfterUpsert = {
    val tenth = ordersDF.filter(col("o_orderkey") % 10 === 0)
      .withColumn("o_totalprice", col("o_totalprice") * 2)
    ordersDF.filter(col("o_orderkey") % 10 =!= 0)
      .unionByName(tenth)
      .unionByName(tenth.withColumn("o_orderkey", col("o_orderkey") + 100000000L))
  }

  test("MoR upsert: one O(source) commit, no table read, equality meters real") {
    val metrics = new SimpleMetrics
    val cat = LakeCatalog.open(freshWarehouse(), metrics)
    val t = cat.createTable("ns", "equp", ordersDF.schema)
    val first = t.appendData(ordersDF, numFiles = 4)
    val before = t.refresh().metadata.currentFiles.map(_.path).toSet

    val report = t.mergeIntoMoR(spark, upsertSource, Seq("o_orderkey"))

    // merge-on-read: every pre-existing data file still live, untouched
    val after = t.refresh().metadata.currentFiles.map(_.path).toSet
    assert(before.subsetOf(after))
    assert(report.totalEqualityDeletes === upsertSource.count())
    assert(metrics.counterValue("lake.commitReport.totalEqualityDeletes", "ns.equp")
      === upsertSource.count())
    // the scan resolves the upsert: updated prices, inserted clones,
    // old versions of merged keys gone
    val exp = expectedAfterUpsert
    assert(scan(t).count() === exp.count())
    assert(scan(t).orderBy("o_orderkey").collect()
      === exp.orderBy("o_orderkey").collect())
    // time travel to the pre-merge snapshot is untouched
    assert(t.asOf(first.snapshotId).toDF(spark).count() === ordersDF.count())
  }

  test("sequence scoping: rows appended AFTER a tombstone survive it; stacking = latest wins") {
    val cat = LakeCatalog.open(freshWarehouse())
    val t = cat.createTable("ns", "eqseq", ordersDF.schema)
    t.appendData(ordersDF)
    val src1 = ordersDF.limit(20).withColumn("o_orderpriority", lit("1-FIRST"))
    t.refresh().mergeIntoMoR(spark, src1, Seq("o_orderkey"))
    // a LATER plain append of the same keys must NOT be tombstoned
    // (the delete applies only below its own seq)
    val reAppended = ordersDF.limit(20).withColumn("o_orderpriority", lit("2-LATER"))
    t.refresh().appendData(reAppended)
    val dupKeys = scan(t).groupBy("o_orderkey").count().filter(col("count") > 1)
    assert(dupKeys.count() === 20) // both the merged and re-appended versions live
    assert(scan(t).filter(col("o_orderpriority") === "2-LATER").count() === 20)
    // a second MoR upsert of the same keys beats BOTH earlier versions
    val src2 = ordersDF.limit(20).withColumn("o_orderpriority", lit("3-FINAL"))
    t.refresh().mergeIntoMoR(spark, src2, Seq("o_orderkey"))
    val k = scan(t).filter(col("o_orderkey").isin(
      ordersDF.limit(20).select("o_orderkey").collect().map(_.getLong(0)).toSeq: _*))
    assert(k.count() === 20)
    assert(k.filter(col("o_orderpriority") =!= "3-FINAL").count() === 0L)
  }

  test("tombstones are field-ID addressed: a key-column rename cannot detach them") {
    val cat = LakeCatalog.open(freshWarehouse())
    val t = cat.createTable("ns", "eqrn", ordersDF.schema)
    t.appendData(ordersDF)
    t.refresh().mergeIntoMoR(spark, upsertSource, Seq("o_orderkey"))
    t.refresh().renameColumn("o_orderkey", "okey")
    val out = scan(t)
    val exp = expectedAfterUpsert.withColumnRenamed("o_orderkey", "okey")
    assert(out.count() === exp.count())
    assert(out.orderBy("okey").collect() === exp.orderBy("okey").collect())
    // the keyed column cannot be DROPPED while tombstones reference it
    t.refresh().renameColumn("okey", "o_orderkey")
    val e = intercept[IllegalArgumentException](t.refresh().dropColumn("o_orderkey"))
    assert(e.getMessage.contains("equality-delete"))
  }

  test("compact materializes equality tombstones; exactly-once replay is a no-op") {
    val cat = LakeCatalog.open(freshWarehouse())
    val t = cat.createTable("ns", "eqcp", ordersDF.schema)
    t.appendData(ordersDF, numFiles = 4)
    assert(t.mergeIntoMoRExactlyOnce(spark, upsertSource, Seq("o_orderkey"),
      "sinkA", 0L).isDefined)
    // replaying the committed batch writes nothing
    assert(t.mergeIntoMoRExactlyOnce(spark, upsertSource
      .withColumn("o_totalprice", lit(-1.0)), Seq("o_orderkey"), "sinkA", 0L).isEmpty)
    val exp = expectedAfterUpsert
    assert(scan(t).count() === exp.count())

    val report = t.refresh().compact(spark, targetFiles = 2)
    assert(report.totalEqualityDeletes === 0L)
    assert(report.totalDeleteFiles === 0L)
    assert(scan(t).orderBy("o_orderkey").collect()
      === exp.orderBy("o_orderkey").collect())
    // SQL was refusing while tombstones were live; compacted it answers
    t.refresh().dropColumn("o_orderpriority") // guard released after compact
    assert(scan(t).count() === exp.count())
  }

  test("positional and equality tombstones compose") {
    val cat = LakeCatalog.open(freshWarehouse())
    val t = cat.createTable("ns", "eqmix", ordersDF.schema)
    t.appendData(ordersDF, numFiles = 4)
    t.refresh().mergeIntoMoR(spark, upsertSource, Seq("o_orderkey"))
    // a positional MoR delete computed OVER the eq-filtered view
    t.refresh().deleteWhereMoR(spark, LakePredicate.Eq("o_orderstatus", "F"))
    val exp = expectedAfterUpsert.filter(col("o_orderstatus") =!= "F")
    assert(scan(t).count() === exp.count())
    assert(scan(t).orderBy("o_orderkey").collect()
      === exp.orderBy("o_orderkey").collect())
    // and the CoW update over the mixed tombstones resurrects nothing
    t.refresh().updateWhere(spark, LakePredicate.Eq("o_orderstatus", "O"),
      Map("o_orderpriority" -> lit("9-MIX")))
    assert(scan(t).count() === exp.count())
  }
}
