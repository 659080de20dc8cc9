package graft.lake.sql

import org.apache.spark.sql.functions._
import graft.lake.{LakeCatalog, LakeSuite}

/** Atomic CTAS / RTAS through the StagingTableCatalog: data files are
  * staged first (invisible — unreferenced), and visibility is ONE CAS.
  * The observable proof: a staged CTAS lands as a SINGLE metadata
  * version whose v1 already holds the data snapshot (the non-atomic
  * path would write v1 create + v2 append), and a staged RTAS is one
  * version bump that swaps schema, spec and data together with history
  * reset to the replace snapshot. */
class StagedCtasSpec extends LakeSuite {

  private var n = 0
  private def cat(): (String, String) = {
    n += 1
    val wh = freshWarehouse()
    val c = s"stg$n"
    spark.conf.set(s"spark.sql.catalog.$c", classOf[LakeSqlCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$c.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE $c.ns")
    (c, wh)
  }

  test("CTAS is one atomic metadata version carrying the data") {
    val (c, wh) = cat()
    spark.sql(s"CREATE TABLE $c.ns.t AS SELECT id, id * 2 AS v FROM range(100)")
    assert(spark.sql(s"SELECT count(*), sum(v) FROM $c.ns.t").head.toSeq
      === Seq(100L, 9900L))
    // ONE version: v1.json references the data snapshot directly
    val log = spark.sql(
      s"SELECT file, latest_snapshot_id FROM $c.ns.t.metadata_log_entries").collect()
    assert(log.length === 1 && log.head.getString(0) === "v1.json")
    assert(!log.head.isNullAt(1)) // v1 already points at a snapshot
    val t = LakeCatalog.open(wh).loadTable("ns", "t")
    assert(t.snapshots.map(_.operation) === Seq("append"))
    assert(t.metadata.currentFiles.nonEmpty)
  }

  test("CTAS with PARTITIONED BY stages under the spec") {
    val (c, cat2wh) = cat()
    spark.sql(s"CREATE TABLE $c.ns.p PARTITIONED BY (k) AS " +
      "SELECT CAST(id % 3 AS INT) AS k, id AS v FROM range(90)")
    assert(spark.sql(s"SELECT count(*) FROM $c.ns.p").head.getLong(0) === 90L)
    // the spec is recorded on the table (AQE may coalesce 90 rows into
    // one multi-valued file, which prunes conservatively — exactness
    // comes from the row filter either way)
    assert(LakeCatalog.open(cat2wh).loadTable("ns", "p")
      .spec.map(_.render) === Seq("k"))
    assert(spark.sql(s"SELECT count(*) FROM $c.ns.p WHERE k = 1").head.getLong(0)
      === 30L)
    // TBLPROPERTIES carry through the staged path like the plain DDL
    // path: sort order parses into the clustering config, write.* keys
    // persist (they silently vanished before the review fix)
    spark.sql(s"CREATE TABLE $c.ns.props TBLPROPERTIES(" +
      "'write.sort-order'='v', 'write.target-file-size-bytes'='1048576') " +
      "AS SELECT CAST(id % 3 AS INT) AS k, id AS v FROM range(30)")
    val tp = LakeCatalog.open(cat2wh).loadTable("ns", "props")
    assert(tp.metadata.sortOrder === Seq("v"))
    assert(tp.metadata.properties.get("write.target-file-size-bytes")
      === Some("1048576"))
    spark.sql(s"REPLACE TABLE $c.ns.props TBLPROPERTIES(" +
      "'write.delete.mode'='merge-on-read') AS SELECT 1 AS a")
    val tr = LakeCatalog.open(cat2wh).loadTable("ns", "props")
    assert(tr.metadata.properties.get("write.delete.mode") === Some("merge-on-read"))
    assert(tr.metadata.sortOrder === Nil) // the old config went with the old schema
  }

  test("RTAS atomically swaps schema, spec and data; history resets") {
    val (c, wh) = cat()
    spark.sql(s"CREATE TABLE $c.ns.r AS SELECT id AS a FROM range(50)")
    spark.sql(s"INSERT INTO $c.ns.r SELECT id + 100 FROM range(10)")
    val versionsBefore = spark.sql(
      s"SELECT count(*) FROM $c.ns.r.metadata_log_entries").head.getLong(0)
    spark.sql(s"REPLACE TABLE $c.ns.r AS " +
      "SELECT CAST(id AS STRING) AS s, id * 3 AS t FROM range(7)")
    // new definition serves; old columns are gone
    assert(spark.table(s"$c.ns.r").schema.fieldNames.toSeq === Seq("s", "t"))
    assert(spark.sql(s"SELECT count(*), sum(t) FROM $c.ns.r").head.toSeq
      === Seq(7L, 63L))
    // ONE version bump, ONE surviving snapshot (history reset)
    val versionsAfter = spark.sql(
      s"SELECT count(*) FROM $c.ns.r.metadata_log_entries").head.getLong(0)
    assert(versionsAfter === versionsBefore + 1)
    val t = LakeCatalog.open(wh).loadTable("ns", "r")
    assert(t.snapshots.map(_.operation) === Seq("replace"))
    // snapshot ids stay monotone across the replace (no id reuse)
    assert(t.currentSnapshotId === 3L) // create + insert + replace
    // the replaced-away files are unreferenced; orphan sweep reclaims
    val swept = t.removeOrphanFiles().size
    assert(spark.sql(s"SELECT count(*) FROM $c.ns.r").head.getLong(0) === 7L)
    assert(swept >= 0)
  }

  test("racing CREATE OR REPLACE AS SELECT: both land, final state is one racer's") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val (c, wh) = cat()
    // the exists-check-then-act hole: both racers may see "missing" and
    // try the create arm; the CAS loser must flip to replace, not fail
    val results = Await.result(Future.sequence((0 until 4).map { i =>
      Future(scala.util.Try(spark.sql(
        s"CREATE OR REPLACE TABLE $c.ns.race AS SELECT $i AS racer, id FROM range(20)")))
    }), 120.seconds)
    assert(results.forall(_.isSuccess),
      s"racers failed: ${results.collect { case scala.util.Failure(e) => e.getMessage }}")
    // final state is exactly one racer's full write
    val rows = spark.sql(s"SELECT DISTINCT racer FROM $c.ns.race").collect()
    assert(rows.length === 1)
    assert(spark.sql(s"SELECT count(*) FROM $c.ns.race").head.getLong(0) === 20L)
    // one surviving snapshot per the replace semantics (or the single
    // create if the winner created last); either way history is clean
    val t = LakeCatalog.open(wh).loadTable("ns", "race")
    assert(t.snapshots.size === 1)
  }

  test("REPLACE of a missing table refuses; CREATE OR REPLACE creates it") {
    val (c, _) = cat()
    val e = intercept[Exception](spark.sql(
      s"REPLACE TABLE $c.ns.nope AS SELECT 1 AS x"))
    assert(e.getMessage.toLowerCase.contains("table") ||
      Option(e.getCause).isDefined)
    spark.sql(s"CREATE OR REPLACE TABLE $c.ns.corr AS SELECT 1 AS x")
    assert(spark.sql(s"SELECT x FROM $c.ns.corr").head.getInt(0) === 1)
    spark.sql(s"CREATE OR REPLACE TABLE $c.ns.corr AS SELECT 9 AS y, 8 AS z")
    assert(spark.sql(s"SELECT y, z FROM $c.ns.corr").head.toSeq === Seq(9, 8))
  }
}
