package graft.lake.sql

import org.apache.spark.sql.functions._
import graft.lake.{LakeCatalog, LakePredicate, LakeSuite}

/** Ad-hoc SQL WRITE shapes — the read-shapes precedent applied to
  * writes (round-15 verdict ask). The oracle corpus drives every write
  * through a fixed scenario, so shapes a real user types first —
  * permuted INSERT column lists, INSERT INTO … SELECT, OVERWRITE of a
  * live-tombstone target, CTAS/RTAS over a MoR source, MERGE from a
  * schema-evolving source — are asserted differentially here against
  * frames computed with the DataFrame API over the same inputs. */
class SqlWriteShapesSpec extends LakeSuite {

  // ONE catalog for the whole suite: Spark caches catalog INSTANCES
  // by name, so re-pointing the same name at a fresh warehouse
  // mid-session would silently keep writing into the old one
  private val C = "wshapes"
  private lazy val wh: String = {
    val dir = freshWarehouse()
    spark.conf.set(s"spark.sql.catalog.$C", classOf[LakeSqlCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$C.warehouse", dir)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $C.ns")
    dir
  }

  /** (table ref, survivors) — a 3-column target seeded with `seed`
    * rows; `mor` additionally takes a live positional-tombstone delete
    * of ids >= 20 (NOT materialized — scans must MoR-filter). */
  private def target(name: String, wh: String, mor: Boolean): (String, Seq[(Long, Long, String)]) = {
    spark.sql(s"CREATE TABLE $C.ns.$name (id BIGINT, qty BIGINT, status STRING)")
    spark.sql(s"INSERT INTO $C.ns.$name VALUES " +
      "(1, 10, 'A'), (2, 20, 'B'), (21, 210, 'C'), (22, 220, 'D')")
    val seed = Seq((1L, 10L, "A"), (2L, 20L, "B"), (21L, 210L, "C"), (22L, 220L, "D"))
    if (!mor) (s"$C.ns.$name", seed)
    else {
      val t = LakeCatalog.open(wh).loadTable("ns", name)
      t.refresh().deleteWhereMoR(spark, LakePredicate.Ge("id", Long.box(20L)))
      val snap = t.refresh().metadata.currentSnapshot.get
      assert(snap.deleteFiles.nonEmpty || snap.dvFiles.nonEmpty,
        "fixture must carry LIVE tombstones")
      (s"$C.ns.$name", seed.filter(_._1 < 20L))
    }
  }

  private def rows(ref: String): Seq[(Long, Long, String)] =
    spark.sql(s"SELECT id, qty, status FROM $ref").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sortBy(_._1).toSeq

  test("INSERT INTO: positional, SELECT-fed, and permuted column lists, clean and MoR") {
    {
      Seq(false, true).foreach { mor =>
        val (ref, seed) = target(s"ins_$mor", wh, mor)
        // positional VALUES
        spark.sql(s"INSERT INTO $ref VALUES (30, 300, 'P')")
        // INSERT INTO ... SELECT (computed projection)
        spark.sql(s"INSERT INTO $ref SELECT id + 40, id * 10, 'S' " +
          "FROM range(2)") // ids 40, 41
        // PERMUTED explicit column list: lands by the list, not the
        // table order
        spark.sql(s"INSERT INTO $ref (status, id, qty) VALUES ('X', 50, 500)")
        // permuted list fed by SELECT
        spark.sql(s"INSERT INTO $ref (qty, status, id) " +
          "SELECT 600, 'Y', 60 FROM range(1)")
        val want = (seed ++ Seq((30L, 300L, "P"), (40L, 0L, "S"),
          (41L, 10L, "S"), (50L, 500L, "X"), (60L, 600L, "Y"))).sortBy(_._1)
        assert(rows(ref) == want, s"mor=$mor")
        // appends after a MoR delete must NOT be retro-tombstoned even
        // when they match the old predicate (sequence-number scoping)
        if (mor) {
          spark.sql(s"INSERT INTO $ref VALUES (99, 990, 'LATE')")
          assert(rows(ref).contains((99L, 990L, "LATE")),
            "append after MoR delete was retro-tombstoned")
        }
      }
    }
  }

  test("INSERT OVERWRITE replaces a live-tombstone target atomically") {
    {
      val (ref, _) = target("ovr", wh, mor = true)
      spark.sql(s"INSERT OVERWRITE $ref VALUES (7, 70, 'NEW'), (8, 80, 'NEW')")
      assert(rows(ref) == Seq((7L, 70L, "NEW"), (8L, 80L, "NEW")))
      // the replace must retire the old tombstones with the old files:
      // stale delete manifests over removed paths are dead weight every
      // future scan would re-open
      val snap = LakeCatalog.open(wh).loadTable("ns", "ovr")
        .refresh().metadata.currentSnapshot.get
      assert(snap.deleteFiles.isEmpty && snap.eqDeleteFiles.isEmpty &&
        snap.dvFiles.isEmpty, "OVERWRITE carried stale tombstones")
      // overwrite of rows matching the OLD tombstone predicate stays
      // visible (id >= 20 was MoR-deleted pre-overwrite)
      spark.sql(s"INSERT OVERWRITE $ref VALUES (25, 250, 'HI')")
      assert(rows(ref) == Seq((25L, 250L, "HI")))
    }
  }

  test("CTAS and RTAS over a MoR source never resurrect tombstoned rows") {
    {
      val (src, survivors) = target("ctas_src", wh, mor = true)
      spark.sql(s"CREATE TABLE $C.ns.copy AS SELECT * FROM $src")
      assert(rows(s"$C.ns.copy") == survivors, "CTAS resurrected tombstones")
      // RTAS from the same MoR source with a residual filter
      spark.sql(s"REPLACE TABLE $C.ns.copy AS " +
        s"SELECT * FROM $src WHERE qty <= 10")
      assert(rows(s"$C.ns.copy") == survivors.filter(_._2 <= 10L))
    }
  }

  test("MERGE from a schema-evolving source: by-name star expansion, narrow source refuses") {
    {
      Seq(false, true).foreach { mor =>
        val (ref, seed) = target(s"mrg_$mor", wh, mor)
        // source carries an EXTRA column the target lacks
        spark.sql("SELECT * FROM VALUES (1, 11L, 'U', 'extra1'), " +
          "(70, 700L, 'I', 'extra2'), (80, 800L, 'J', 'extra3') " +
          "AS s(id, qty, status, note)").createOrReplaceTempView("wide_src")
        // explicit column assignments ignore the extra column: legal
        spark.sql(
          s"""MERGE INTO $ref t USING wide_src s ON t.id = s.id
             |WHEN MATCHED THEN UPDATE SET qty = s.qty, status = s.status
             |WHEN NOT MATCHED AND s.id = 70 THEN INSERT (id, qty, status)
             |  VALUES (s.id, s.qty, s.status)""".stripMargin)
        val want = (seed.map {
          case (1L, _, _) => (1L, 11L, "U")
          case other => other
        } :+ (70L, 700L, "I")).sortBy(_._1)
        assert(rows(ref) == want, s"mor=$mor")
        // INSERT * from the wider source resolves BY NAME against the
        // target's columns (Spark's star expansion): the extra source
        // column does not land anywhere and does not evolve the target
        // schema — asserted, not assumed
        spark.sql(
          s"""MERGE INTO $ref t USING wide_src s ON t.id = s.id
             |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
        assert(rows(ref) == (want :+ (80L, 800L, "J")).sortBy(_._1),
          s"star expansion must land target columns by name (mor=$mor)")
        assert(spark.sql(s"SELECT * FROM $ref").columns.toSeq ==
          Seq("id", "qty", "status"), "INSERT * must not evolve the schema")
        // a NARROWER source (missing `status`) cannot satisfy INSERT *:
        // must refuse loudly at analysis, never silently NULL-fill
        spark.sql("SELECT * FROM VALUES (90, 900L) AS s(id, qty)")
          .createOrReplaceTempView("narrow_src")
        val e = intercept[Exception](spark.sql(
          s"""MERGE INTO $ref t USING narrow_src s ON t.id = s.id
             |WHEN NOT MATCHED THEN INSERT *""".stripMargin))
        val msg = e.getMessage +
          Option(e.getCause).map(_.getMessage).getOrElse("")
        assert(msg.toLowerCase.matches(
          "(?s).*(status|column|schema|cannot|resolve|mismatch).*"),
          s"refusal must name the shape problem, got: $msg")
      }
    }
  }
}
