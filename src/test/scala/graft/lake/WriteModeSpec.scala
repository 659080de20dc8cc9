package graft.lake

import org.apache.spark.sql.functions._

/** Per-table row-level write modes (Iceberg's `write.<op>.mode`): the
  * SAME SQL DELETE/UPDATE/MERGE routes through copy-on-write rewrites
  * (default) or merge-on-read tombstones, per table property. */
class WriteModeSpec extends LakeSuite {

  private def dataFiles(t: LakeTable) =
    t.refresh().metadata.currentFiles.map(_.path).toSet

  test("updateWhereMoR: one commit of tombstones + updated rows, no file rewritten") {
    val cat = LakeCatalog.open(freshWarehouse())
    val t = cat.createTable("ns", "upd", ordersDF.schema)
    t.appendData(ordersDF, numFiles = 4)
    val before = dataFiles(t)
    val report = t.refresh().updateWhereMoR(spark,
      LakePredicate.Eq("o_orderstatus", "F"),
      Map("o_orderpriority" -> lit("9-MOR-UPD")))
    // old files all survive; updated rows landed as NEW files
    assert(before.subsetOf(dataFiles(t)))
    assert(report.totalPositionalDeletes ===
      ordersDF.filter(col("o_orderstatus") === "F").count())
    val out = t.refresh().newScan().toDF(spark)
    assert(out.count() === ordersDF.count())
    assert(out.filter(col("o_orderstatus") === "F")
      .filter(col("o_orderpriority") =!= "9-MOR-UPD").count() === 0L)
    assert(out.filter(col("o_orderstatus") =!= "F")
      .filter(col("o_orderpriority") === "9-MOR-UPD").count() === 0L)
    // compact materializes; answers unchanged
    t.refresh().compact(spark, targetFiles = 2)
    assert(t.refresh().newScan().toDF(spark)
      .filter(col("o_orderpriority") === "9-MOR-UPD").count()
      === ordersDF.filter(col("o_orderstatus") === "F").count())
  }

  test("write-mode properties route SQL DELETE/UPDATE/MERGE through MoR") {
    val wh = freshWarehouse()
    spark.conf.set("spark.sql.catalog.wm", classOf[sql.LakeSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.wm.warehouse", wh)
    spark.sql("CREATE NAMESPACE wm.ns")
    spark.sql(s"CREATE TABLE wm.ns.t (${ordersDF.schema.toDDL}) " +
      "TBLPROPERTIES ('write.delete.mode'='merge-on-read')")
    val t = LakeCatalog.open(wh).loadTable("ns", "t")
    assert(t.writeMode("delete") === "merge-on-read")
    t.appendData(ordersDF, numFiles = 4)
    val before = dataFiles(t)

    // DELETE: tombstones, no rewrite
    spark.sql("DELETE FROM wm.ns.t WHERE o_totalprice >= 400000.0")
    assert(dataFiles(t) === before)
    val survivors = ordersDF.filter(col("o_totalprice") < 400000.0).count()
    assert(spark.sql("SELECT count(*) FROM wm.ns.t").head.getLong(0) === survivors)

    // UPDATE via ALTER-set mode: tombstones + new files, old files stay
    spark.sql("ALTER TABLE wm.ns.t SET TBLPROPERTIES ('write.update.mode'='merge-on-read')")
    val beforeUpd = dataFiles(t)
    spark.sql("UPDATE wm.ns.t SET o_orderpriority = '8-WM' WHERE o_orderstatus = 'O'")
    assert(beforeUpd.subsetOf(dataFiles(t)))
    assert(spark.sql(
      "SELECT count(*) FROM wm.ns.t WHERE o_orderstatus = 'O' AND o_orderpriority <> '8-WM'")
      .head.getLong(0) === 0L)
    assert(spark.sql("SELECT count(*) FROM wm.ns.t").head.getLong(0) === survivors)

    // MERGE: the O(source) equality-delete upsert
    spark.sql("ALTER TABLE wm.ns.t SET TBLPROPERTIES ('write.merge.mode'='merge-on-read')")
    ordersDF.filter(col("o_orderkey") % 10 === 0 && col("o_totalprice") < 400000.0)
      .withColumn("o_totalprice", col("o_totalprice") * 2)
      .createOrReplaceTempView("wm_src")
    val beforeMrg = dataFiles(t)
    spark.sql(
      """MERGE INTO wm.ns.t AS t USING wm_src AS s
        |ON t.o_orderkey = s.o_orderkey
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(beforeMrg.subsetOf(dataFiles(t))) // no rewrite: eq-tombstones
    assert(t.refresh().metadata.currentSnapshot.get
      .eqDeleteFiles.nonEmpty)
    assert(spark.sql("SELECT count(*) FROM wm.ns.t").head.getLong(0) === survivors)
    // merged keys carry the doubled price (strictly greater than before)
    assert(spark.sql(
      """SELECT count(*) FROM wm.ns.t
        |WHERE o_orderkey % 10 = 0 AND o_orderpriority = '8-WM'""".stripMargin)
      .head.getLong(0) === 0L) // replaced rows carry the SOURCE priority, not 8-WM

    // the modes are visible to SHOW TBLPROPERTIES
    val shown = spark.sql("SHOW TBLPROPERTIES wm.ns.t").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(shown.get("write.delete.mode") === Some("merge-on-read"))
    assert(shown.get("write.merge.mode") === Some("merge-on-read"))

    // UNSET returns to copy-on-write
    spark.sql("ALTER TABLE wm.ns.t UNSET TBLPROPERTIES ('write.delete.mode')")
    assert(LakeCatalog.open(wh).loadTable("ns", "t").writeMode("delete")
      === "copy-on-write")
    // bogus mode refuses loudly at use
    t.refresh().setProperty("write.delete.mode", "nonsense")
    intercept[IllegalArgumentException](t.refresh().writeMode("delete"))
  }
}
