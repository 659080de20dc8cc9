package graft.lake.sql

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.lake.{LakeCatalog, LakeSuite}

/** Model-based fuzz of the SQL surface (round 12): a seeded random
  * sequence of SQL statements — INSERT, DELETE (plain + IN-subquery),
  * UPDATE, full-grammar MERGE (conditions, DELETE clause, NOT MATCHED
  * BY SOURCE), ALTER TABLE ADD COLUMN, CALL set_current_snapshot —
  * runs against both the real catalog and a trivial in-memory model;
  * after every statement `SELECT *` must equal the model exactly.
  * This is the extension-rule analog of LakeModelSpec: analyzer-rule
  * edges (wrapper stripping, metadata-name shadowing, clause-ordering,
  * schema-projection nulls after ALTER and rollback) surface as a
  * concrete failing seed+step rather than waiting for a hand-written
  * case. */
class SqlModelSpec extends LakeSuite {

  test("random SQL statement sequences keep table == model at every step") {
    for (seed <- Seq(5, 31)) {
      val rng = new scala.util.Random(seed)
      val wh = freshWarehouse()
      val cat = s"sqlfuzz$seed"
      spark.conf.set(s"spark.sql.catalog.$cat", classOf[LakeSqlCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
      spark.sql(s"CREATE NAMESPACE $cat.ns")
      spark.sql(s"CREATE TABLE $cat.ns.t (id BIGINT, v BIGINT)")
      val lake = LakeCatalog.open(wh)

      // model rows as name→value maps so ALTER ADD COLUMN (and reading
      // pre-ALTER rows back as NULL) falls out of the comparison
      var cols: Vector[String] = Vector("id", "v")
      var model = Map.empty[Long, Map[String, Any]]
      var nextId = 0L
      var nextCol = 0
      var history = Map.empty[Long, Map[Long, Map[String, Any]]]

      def snapId: Long = lake.loadTable("ns", "t").currentSnapshotId
      def freshIds(n: Int): Seq[Long] = (0 until n).map { _ => nextId += 1; nextId }
      def lit(a: Any): String = a match {
        case null => "CAST(NULL AS STRING)"
        case s: String => s"'$s'"
        case other => other.toString
      }

      def check(step: Int, op: String): Unit = {
        val actual = spark.sql(s"SELECT * FROM $cat.ns.t").collect()
          .map { r =>
            val id = r.getLong(r.fieldIndex("id"))
            id -> cols.map(c => c -> r.get(r.fieldIndex(c))).toMap
          }.toMap
        val expected = model.map { case (id, row) =>
          id -> cols.map(c => c -> row.getOrElse(c, null)).toMap
        }
        assert(actual === expected, s"seed=$seed step=$step after $op")
        history += snapId -> model
      }

      // seed data
      val ids0 = freshIds(15)
      spark.sql(s"INSERT INTO $cat.ns.t VALUES " +
        ids0.map(i => s"($i, ${i * 10})").mkString(", "))
      model = ids0.map(i => i -> Map[String, Any]("id" -> i, "v" -> (i * 10))).toMap
      check(-1, "seed insert")

      for (step <- 0 until 14) {
        rng.nextInt(7) match {
          case 0 => // INSERT fresh rows with values for every current column
            val ids = freshIds(1 + rng.nextInt(8))
            val rows = ids.map { i =>
              val extra = cols.drop(2).map(c => c -> (s"s$i": Any))
              i -> (Map[String, Any]("id" -> i, "v" -> (i * 10)) ++ extra)
            }
            spark.sql(s"INSERT INTO $cat.ns.t VALUES " + rows.map { case (_, m) =>
              cols.map(c => lit(m(c))).mkString("(", ", ", ")")
            }.mkString(", "))
            model ++= rows
            check(step, "insert")
          case 1 => // plain DELETE by id band
            val cut = nextId - rng.nextInt(12)
            spark.sql(s"DELETE FROM $cat.ns.t WHERE id >= $cut")
            model = model.filter { case (id, _) => id < cut }
            check(step, s"delete >= $cut")
          case 2 => // DELETE ... WHERE id IN (subquery)
            val victims = rng.shuffle(model.keys.toSeq).take(rng.nextInt(5))
            if (victims.nonEmpty) {
              spark.createDataFrame(
                victims.map(Row(_)).asJava0,
                StructType(Seq(StructField("k", LongType))))
                .createOrReplaceTempView(s"fuzz_victims_$seed")
              spark.sql(s"DELETE FROM $cat.ns.t WHERE id IN " +
                s"(SELECT k FROM fuzz_victims_$seed)")
              model --= victims
              check(step, "delete-in-subquery")
            }
          case 3 => // UPDATE a band; sometimes touch an added column
            val lo = math.max(1L, nextId - rng.nextInt(20))
            val setExtra = cols.drop(2).headOption.filter(_ => rng.nextBoolean())
            val setSql = (s"v = v + 1" +: setExtra.map(c => s"$c = 'upd'").toSeq)
              .mkString(", ")
            spark.sql(s"UPDATE $cat.ns.t SET $setSql WHERE id >= $lo")
            model = model.map { case (id, row) =>
              if (id >= lo) {
                val r2 = row + ("v" -> (row("v").asInstanceOf[Long] + 1L))
                id -> setExtra.map(c => r2 + (c -> ("upd": Any))).getOrElse(r2)
              } else id -> row
            }
            check(step, s"update >= $lo")
          case 4 => // full-grammar MERGE: D/U matched clauses + insert + sometimes NMBS
            val existing = rng.shuffle(model.keys.toSeq).take(rng.nextInt(6))
            val (dels, upds) = existing.partition(_ => rng.nextBoolean())
            val ins = freshIds(rng.nextInt(4))
            val srcRows = dels.map(i => (i, 0L, "D")) ++
              upds.map(i => (i, i * 100L, "U")) ++ ins.map(i => (i, i * 100L, "I"))
            if (srcRows.nonEmpty) {
              spark.createDataFrame(
                srcRows.map { case (i, nv, op) => Row(i, nv, op) }.asJava0,
                StructType(Seq(StructField("id", LongType),
                  StructField("nv", LongType), StructField("op", StringType))))
                .createOrReplaceTempView(s"fuzz_src_$seed")
              val withNmbs = rng.nextBoolean()
              val nmbsLo = nextId - 5
              val nmbsClause = if (withNmbs)
                s" WHEN NOT MATCHED BY SOURCE AND id >= $nmbsLo THEN UPDATE SET v = -9"
              else ""
              spark.sql(
                s"""MERGE INTO $cat.ns.t AS t USING fuzz_src_$seed AS s
                   |ON t.id = s.id
                   |WHEN MATCHED AND s.op = 'D' THEN DELETE
                   |WHEN MATCHED THEN UPDATE SET v = s.nv
                   |WHEN NOT MATCHED AND s.op = 'I' THEN
                   |  INSERT (id, v) VALUES (s.id, s.nv)$nmbsClause""".stripMargin)
              val srcKeys = srcRows.map(_._1).toSet
              model = model.flatMap { case (id, row) =>
                if (dels.contains(id)) None
                else if (upds.contains(id)) Some(id -> (row + ("v" -> (id * 100L))))
                else if (withNmbs && !srcKeys.contains(id) && id >= nmbsLo)
                  Some(id -> (row + ("v" -> -9L)))
                else Some(id -> row)
              }
              model ++= ins.map(i =>
                i -> Map[String, Any]("id" -> i, "v" -> (i * 100L)))
              check(step, "merge-full")
            }
          case 5 => // ALTER TABLE ADD COLUMN (cap at 3 extra columns)
            if (cols.size < 5) {
              nextCol += 1
              val c = s"g$nextCol"
              spark.sql(s"ALTER TABLE $cat.ns.t ADD COLUMN $c STRING")
              cols = cols :+ c
              check(step, s"add column $c")
            }
          case 6 => // CALL set_current_snapshot to a surviving recorded snapshot
            val alive = lake.loadTable("ns", "t").metadata.snapshots
              .map(_.id).filter(history.contains)
            if (alive.nonEmpty) {
              val pick = alive(rng.nextInt(alive.size))
              spark.sql(s"CALL $cat.system.set_current_snapshot('ns.t', $pick)")
              model = history(pick)
              check(step, s"set_current_snapshot $pick")
            }
        }
      }
    }
  }
}
