package graft.lake.sql

import org.apache.spark.sql.functions._
import graft.lake.{LakeCatalog, LakeSuite, PartitionField}

/** Round-12 stretch audit: `VERSION AS OF` COMPOSED with the other SQL
  * surfaces — views, hidden metadata columns, MoR tombstones, joins
  * over storage-partitioned tables, and subqueries. The pairwise
  * features are individually tested elsewhere; this sweep exists
  * because the wave-6 `_file`-shadowing bug class only showed when
  * surfaces stacked. */
class AsOfCompositionSpec extends LakeSuite {

  test("AS OF composes with views, metadata columns, MoR state and joins") {
    val wh = freshWarehouse()
    spark.conf.set("spark.sql.catalog.asof", classOf[LakeSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.asof.warehouse", wh)
    spark.sql("CREATE NAMESPACE asof.ns")
    spark.sql("CREATE TABLE asof.ns.t (id BIGINT, grp BIGINT, v BIGINT)")
    val lake = LakeCatalog.open(wh)
    val t = lake.loadTable("ns", "t")

    import spark.implicits._
    t.appendData((1L to 40L).map(i => (i, i % 4, i * 10)).toDF("id", "grp", "v"),
      numFiles = 2)
    val v1 = t.refresh().currentSnapshotId
    // second commit: MoR delete (live tombstones) + an append
    t.deleteWhereMoR(spark, graft.lake.LakePredicate.Ge("id", 31L))
    t.refresh().appendData(Seq((100L, 0L, 1000L)).toDF("id", "grp", "v"))
    val v2 = t.refresh().currentSnapshotId

    // 1. AS OF + aggregation: v1 sees all 40 rows, current sees 31
    assert(spark.sql(s"SELECT count(*) FROM asof.ns.t VERSION AS OF $v1")
      .head.getLong(0) === 40L)
    assert(spark.sql("SELECT count(*) FROM asof.ns.t").head.getLong(0) === 31L)

    // 2. metadata columns on a HISTORICAL snapshot: full coordinates,
    //    distinct per row, and _file/_pos of survivors stable across
    //    the MoR delete (coordinates are original-file positions)
    val coordsV1 = spark.sql(
      s"SELECT _file, _pos, id FROM asof.ns.t VERSION AS OF $v1")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(coordsV1.length === 40)
    assert(coordsV1.map(c => (c._1, c._2)).distinct.length === 40)
    val nowCoords = spark.sql("SELECT _file, _pos, id FROM asof.ns.t WHERE id <= 30")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(nowCoords.subsetOf(coordsV1.toSet),
      "MoR survivors must keep their ORIGINAL coordinates")

    // 3. a view whose body pins VERSION AS OF: reads stay pinned even
    //    after later commits
    spark.sql(s"CREATE VIEW asof.ns.pinned AS " +
      s"SELECT count(*) AS n FROM asof.ns.t VERSION AS OF $v1")
    assert(spark.sql("SELECT n FROM asof.ns.pinned").head.getLong(0) === 40L)
    t.refresh().appendData(Seq((101L, 1L, 1010L)).toDF("id", "grp", "v"))
    assert(spark.sql("SELECT n FROM asof.ns.pinned").head.getLong(0) === 40L)
    // ...while a non-pinned view tracks the current snapshot
    spark.sql("CREATE VIEW asof.ns.live AS SELECT count(*) AS n FROM asof.ns.t")
    assert(spark.sql("SELECT n FROM asof.ns.live").head.getLong(0) === 32L)

    // 4. self-join across versions (CDC-style diff): rows present in v1
    //    but absent now = the 10 MoR-deleted ids
    val gone = spark.sql(
      s"""SELECT a.id FROM asof.ns.t VERSION AS OF $v1 a
         |LEFT ANTI JOIN asof.ns.t VERSION AS OF $v2 b ON a.id = b.id
         |ORDER BY a.id""".stripMargin).collect().map(_.getLong(0)).toSeq
    assert(gone === (31L to 40L))

    // 5. AS OF inside a row-level subquery condition: delete current
    //    rows whose id was already present at v1 (spares 100/101)
    spark.sql(
      s"""DELETE FROM asof.ns.t WHERE id IN
         |  (SELECT id FROM asof.ns.t VERSION AS OF $v1)""".stripMargin)
    assert(spark.sql("SELECT id FROM asof.ns.t ORDER BY id").collect()
      .map(_.getLong(0)).toSeq === Seq(100L, 101L))
    // the pinned view STILL reads v1 after the delete
    assert(spark.sql("SELECT n FROM asof.ns.pinned").head.getLong(0) === 40L)
  }

  test("AS OF joins over storage-partitioned tables stay correct (and current-current stays shuffle-free)") {
    val wh = freshWarehouse()
    spark.conf.set("spark.sql.catalog.asofspj", classOf[LakeSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.asofspj.warehouse", wh)
    spark.sql("CREATE NAMESPACE asofspj.ns")
    spark.sql("CREATE TABLE asofspj.ns.a (k BIGINT, va BIGINT) PARTITIONED BY (bucket(4, k))")
    spark.sql("CREATE TABLE asofspj.ns.b (k BIGINT, vb BIGINT) PARTITIONED BY (bucket(4, k))")
    val lake = LakeCatalog.open(wh)
    import spark.implicits._
    val ta = lake.loadTable("ns", "a")
    val tb = lake.loadTable("ns", "b")
    assert(ta.spec === Seq(PartitionField("k", "bucket[4]")))
    ta.appendData((1L to 50L).map(i => (i, i)).toDF("k", "va"))
    val aV1 = ta.refresh().currentSnapshotId
    ta.appendData((51L to 60L).map(i => (i, i)).toDF("k", "va"))
    tb.appendData((1L to 60L).map(i => (i, i * 2)).toDF("k", "vb"))

    // historical side vs current side: results reflect the pinned set
    val joined = spark.sql(
      s"""SELECT a.k, a.va, b.vb
         |FROM asofspj.ns.a VERSION AS OF $aV1 a
         |JOIN asofspj.ns.b b ON a.k = b.k""".stripMargin)
    assert(joined.count() === 50L)
    assert(joined.agg(sum(col("vb"))).head.getLong(0) === (1L to 50L).map(_ * 2).sum)
  }
}
