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
    for (seed <- Seq(5, 31, 97)) {
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

      // Row-lineage invariant, checked WITHOUT predicting file layout:
      // while `SELECT _row_id` still succeeds the table has never taken
      // a rewrite-shaped commit, so every surviving row's id must equal
      // what the previous successful read saw, and ids stay unique.
      // Once a read refuses (CoW rewrite landed), refusal is sticky.
      var lineageBroken = false
      var lastRowIds = Map.empty[Long, Long]

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
        try {
          val rl = spark.sql(s"SELECT id, _row_id FROM $cat.ns.t").collect()
            .map(r => r.getLong(0) -> r.getLong(1)).toMap
          assert(!lineageBroken,
            s"seed=$seed step=$step after $op: lineage read succeeded " +
              "after an earlier refusal (broken flag must be sticky)")
          assert(rl.keySet == model.keySet,
            s"seed=$seed step=$step after $op: lineage row set drift")
          assert(rl.values.toSet.size == rl.size,
            s"seed=$seed step=$step after $op: duplicate row ids")
          lastRowIds.foreach { case (k, rid) =>
            rl.get(k).foreach(now => assert(now == rid,
              s"seed=$seed step=$step after $op: row $k id moved $rid->$now"))
          }
          lastRowIds = rl
        } catch {
          case e: IllegalArgumentException
              if e.getMessage.contains("rewrite-shaped") =>
            lineageBroken = true
        }
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

  /** Nested-struct twin of the flat fuzz: random sequences of nested
    * SET (leaf, deep leaf, swapped pair, whole-struct, NULL-struct),
    * conditional MERGE with nested assignments, and DELETE run against
    * a model that mirrors the UpdateFields semantics the round-12
    * canonicalization promises — NULL structs stay NULL, NULL
    * intermediate structs absorb deeper writes, values read the OLD
    * row. Crosses the two round-12 features (conditional merge ×
    * nested SET) by construction instead of one hand case each. */
  test("random nested-struct SET sequences keep table == model at every step") {
    for (seed <- Seq(7, 43, 101)) {
      val rng = new scala.util.Random(seed)
      val wh = freshWarehouse()
      val cat = s"structfuzz$seed"
      spark.conf.set(s"spark.sql.catalog.$cat", classOf[LakeSqlCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
      spark.sql(s"CREATE NAMESPACE $cat.ns")
      spark.sql(s"CREATE TABLE $cat.ns.t (id BIGINT, a BIGINT, " +
        "s STRUCT<x: BIGINT, d: STRUCT<u: BIGINT, w: STRING>>)")

      // model row = Row(id, a, Row(x, Row(u, w))); nulls at any level
      var model = Map.empty[Long, Row]
      var nextId = 0L
      def jl(v: Long): java.lang.Long = java.lang.Long.valueOf(v)
      def sOf(r: Row): Row = r.getAs[Row](2)
      def withS(r: Row, s: Row): Row = Row(r.get(0), r.get(1), s)
      // UpdateFields semantics: a NULL struct absorbs the write
      def setX(r: Row, v: java.lang.Long): Row = {
        val s = sOf(r)
        if (s == null) r else withS(r, Row(v, s.get(1)))
      }
      def setDU(r: Row, v: java.lang.Long): Row = {
        val s = sOf(r)
        if (s == null) r
        else {
          val d = s.getAs[Row](1)
          if (d == null) r else withS(r, Row(s.get(0), Row(v, d.get(1))))
        }
      }
      def setDW(r: Row, v: String): Row = {
        val s = sOf(r)
        if (s == null) r
        else {
          val d = s.getAs[Row](1)
          if (d == null) r else withS(r, Row(s.get(0), Row(d.get(0), v)))
        }
      }

      def check(step: Int, op: String): Unit = {
        val actual = spark.sql(s"SELECT * FROM $cat.ns.t").collect()
          .map(r => r.getLong(0) -> Row(r.get(0), r.get(1), r.get(2))).toMap
        assert(actual === model, s"seed=$seed step=$step after $op")
      }

      def structSql(i: Long): String =
        s"named_struct('x', CAST($i AS BIGINT), 'd', " +
          s"named_struct('u', CAST(${i * 2} AS BIGINT), 'w', 'r$i'))"
      def freshRows(n: Int): Seq[(Long, Row)] = (0 until n).map { _ =>
        nextId += 1
        val i = nextId
        val s = rng.nextInt(4) match {
          case 0 => null
          case 1 => Row(jl(i), null)
          case _ => Row(jl(i), Row(jl(i * 2), s"r$i"))
        }
        i -> Row(jl(i), jl(i * 10), s)
      }
      def structLit(s: Row): String =
        if (s == null) "CAST(NULL AS STRUCT<x: BIGINT, d: STRUCT<u: BIGINT, w: STRING>>)"
        else {
          val d = s.getAs[Row](1)
          val dLit = if (d == null)
            "CAST(NULL AS STRUCT<u: BIGINT, w: STRING>)"
          else s"named_struct('u', CAST(${d.get(0)} AS BIGINT), 'w', '${d.get(1)}')"
          s"named_struct('x', CAST(${s.get(0)} AS BIGINT), 'd', $dLit)"
        }

      val seedRows = freshRows(12)
      spark.sql(s"INSERT INTO $cat.ns.t VALUES " + seedRows.map { case (_, r) =>
        s"(${r.get(0)}, ${r.get(1)}, ${structLit(sOf(r))})"
      }.mkString(", "))
      model = seedRows.toMap
      check(-1, "seed insert")

      for (step <- 0 until 12) {
        rng.nextInt(6) match {
          case 0 => // leaf SET against the old row's sibling values
            val m = rng.nextInt(3)
            spark.sql(s"UPDATE $cat.ns.t SET s.x = a + $step WHERE id % 3 = $m")
            model = model.map { case (id, r) =>
              id -> (if (id % 3 == m) setX(r, jl(r.getLong(1) + step)) else r)
            }
            check(step, s"set s.x id%3=$m")
          case 1 => // swapped pair: both values must read the OLD row
            val m = rng.nextInt(2)
            spark.sql(s"UPDATE $cat.ns.t SET s.x = s.d.u, s.d.u = s.x " +
              s"WHERE id % 2 = $m")
            model = model.map { case (id, r) =>
              if (id % 2 != m) id -> r
              else {
                val s = sOf(r)
                val oldX = if (s == null) null else s.getAs[java.lang.Long](0)
                val d = if (s == null) null else s.getAs[Row](1)
                val oldU = if (d == null) null else d.getAs[java.lang.Long](0)
                id -> setDU(setX(r, oldU), oldX)
              }
            }
            check(step, s"swap s.x/s.d.u id%2=$m")
          case 2 => // deep leaf string SET
            val m = rng.nextInt(4)
            spark.sql(s"UPDATE $cat.ns.t SET s.d.w = 'p$step' WHERE id % 4 = $m")
            model = model.map { case (id, r) =>
              id -> (if (id % 4 == m) setDW(r, s"p$step") else r)
            }
            check(step, s"set s.d.w id%4=$m")
          case 3 => // whole-struct overwrite (sometimes to NULL)
            val m = rng.nextInt(3)
            val toNull = rng.nextBoolean()
            val lit = if (toNull)
              "CAST(NULL AS STRUCT<x: BIGINT, d: STRUCT<u: BIGINT, w: STRING>>)"
            else structSql(step + 100L)
            spark.sql(s"UPDATE $cat.ns.t SET s = $lit WHERE id % 3 = $m")
            val sNew = if (toNull) null
            else Row(jl(step + 100L), Row(jl((step + 100L) * 2), s"r${step + 100}"))
            model = model.map { case (id, r) =>
              id -> (if (id % 3 == m) withS(r, sNew) else r)
            }
            check(step, s"set whole s id%3=$m toNull=$toNull")
          case 4 => // conditional MERGE with nested assignments
            val existing = rng.shuffle(model.keys.toSeq).take(rng.nextInt(5))
            val ins = freshRows(rng.nextInt(3))
            val srcRows = existing.map(i => (i, i * 7L)) ++
              ins.map { case (i, _) => (i, i * 7L) }
            if (srcRows.nonEmpty) {
              spark.createDataFrame(
                srcRows.map { case (i, nv) => Row(jl(i), jl(nv)) }.asJava0,
                StructType(Seq(StructField("id", LongType),
                  StructField("nv", LongType))))
                .createOrReplaceTempView(s"structfuzz_src_$seed")
              spark.sql(
                s"""MERGE INTO $cat.ns.t AS t USING structfuzz_src_$seed AS src
                   |ON t.id = src.id
                   |WHEN MATCHED AND src.nv % 2 = 0 THEN UPDATE SET s.x = src.nv
                   |WHEN MATCHED THEN UPDATE SET s.d.w = 'm$step', a = t.a + 1
                   |WHEN NOT MATCHED THEN INSERT (id, a, s)
                   |  VALUES (src.id, src.nv, ${structSql(9000L + step)})""".stripMargin)
              val insIds = ins.map(_._1).toSet
              model = model.map { case (id, r) =>
                if (!existing.contains(id)) id -> r
                else if ((id * 7L) % 2 == 0) id -> setX(r, jl(id * 7L))
                else {
                  val r2 = setDW(r, s"m$step")
                  id -> Row(r2.get(0), jl(r2.getLong(1) + 1), sOf(r2))
                }
              }
              model ++= ins.map { case (i, _) =>
                i -> Row(jl(i), jl(i * 7L),
                  Row(jl(9000L + step),
                    Row(jl((9000L + step) * 2), s"r${9000 + step}")))
              }
              // guard: inserted ids must not collide with existing handling
              assert(insIds.forall(i => !existing.contains(i)))
              check(step, "conditional merge nested")
            }
          case 5 => // DELETE a residue class
            val m = rng.nextInt(5)
            spark.sql(s"DELETE FROM $cat.ns.t WHERE id % 5 = $m")
            model = model.filter { case (id, _) => id % 5 != m }
            check(step, s"delete id%5=$m")
        }
      }
    }
  }

  test("random element-path SET + conditional MERGE keep table == model at every step") {
    for (seed <- Seq(11, 59, 83)) {
      val rng = new scala.util.Random(seed)
      val wh = freshWarehouse()
      val cat = s"elemfuzz$seed"
      spark.conf.set(s"spark.sql.catalog.$cat", classOf[LakeSqlCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
      spark.sql(s"CREATE NAMESPACE $cat.ns")
      spark.sql(s"CREATE TABLE $cat.ns.t (id BIGINT, tags ARRAY<STRING>, " +
        "m MAP<STRING, BIGINT>)")

      // model row = (tags or null, ORDERED map entries or null) — entry
      // order is part of the contract (in-place update preserves it,
      // upsert appends at the end)
      var model = Map.empty[Long, (List[String], Vector[(String, Long)])]
      var nextId = 0L
      val keys = Vector("a", "b", "c", "d")

      def check(step: Int, op: String): Unit = {
        val actual = spark.sql(
          s"SELECT id, tags, map_entries(m) FROM $cat.ns.t").collect()
          .map { r =>
            r.getLong(0) -> ((
              if (r.isNullAt(1)) null else r.getSeq[String](1).toList,
              if (r.isNullAt(2)) null
              else r.getSeq[Row](2).map(e => (e.getString(0), e.getLong(1))).toVector))
          }.toMap
        assert(actual === model, s"seed=$seed step=$step after $op")
      }

      def upsert(es: Vector[(String, Long)], k: String, v: Long) =
        if (es == null) null
        else if (es.exists(_._1 == k)) es.map(e => if (e._1 == k) (k, v) else e)
        else es :+ ((k, v))

      def tagsLit(t: List[String]): String =
        if (t == null) "CAST(NULL AS ARRAY<STRING>)"
        else if (t.isEmpty) "array()" else t.map(s => s"'$s'").mkString("array(", ", ", ")")
      def mapLit(es: Vector[(String, Long)]): String =
        if (es == null) "CAST(NULL AS MAP<STRING, BIGINT>)"
        else if (es.isEmpty) "map()"
        else es.map { case (k, v) => s"'$k', CAST($v AS BIGINT)" }
          .mkString("map(", ", ", ")")

      def freshRows(n: Int): Seq[(Long, (List[String], Vector[(String, Long)]))] =
        (0 until n).map { _ =>
          nextId += 1
          val i = nextId
          val tg = rng.nextInt(5) match {
            case 0 => null
            case k => List.tabulate(k - 1)(j => s"t${i}_$j")
          }
          val mp = rng.nextInt(4) match {
            case 0 => null
            case k => Vector.tabulate(k - 1)(j => (keys(j), i * 100 + j))
          }
          i -> ((tg, mp))
        }

      val seedRows = freshRows(12)
      spark.sql(s"INSERT INTO $cat.ns.t VALUES " + seedRows.map {
        case (id, (tg, mp)) => s"($id, ${tagsLit(tg)}, ${mapLit(mp)})"
      }.mkString(", "))
      model = seedRows.toMap
      check(-1, "seed insert")

      for (step <- 0 until 12) {
        rng.nextInt(5) match {
          case 0 => // array element ← literal (index sometimes OOB)
            val i = rng.nextInt(4); val mm = rng.nextInt(3)
            spark.sql(s"UPDATE $cat.ns.t SET tags[$i] = 'e$step' WHERE id % 3 = $mm")
            model = model.map { case (id, (tg, mp)) =>
              id -> ((
                if (id % 3 == mm && tg != null && i < tg.length)
                  tg.updated(i, s"e$step") else tg, mp))
            }
            check(step, s"tags[$i] literal")
          case 1 => // map upsert ← literal
            val k = keys(rng.nextInt(keys.length)); val mm = rng.nextInt(3)
            val v = step * 10 + 1L
            spark.sql(s"UPDATE $cat.ns.t SET m['$k'] = $v WHERE id % 3 = $mm")
            model = model.map { case (id, (tg, mp)) =>
              id -> ((tg, if (id % 3 == mm) upsert(mp, k, v) else mp))
            }
            check(step, s"m[$k] literal")
          case 2 => // array element ← expression over the OLD element
            val i = rng.nextInt(3); val mm = rng.nextInt(3)
            spark.sql(s"UPDATE $cat.ns.t SET tags[$i] = upper(tags[$i]) WHERE id % 3 = $mm")
            model = model.map { case (id, (tg, mp)) =>
              id -> ((
                if (id % 3 == mm && tg != null && i < tg.length)
                  tg.updated(i, tg(i).toUpperCase) else tg, mp))
            }
            check(step, s"tags[$i] self")
          case 3 => // conditional MERGE: matched-AND element SET + insert
            val present = model.keys.toSeq.sorted.filter(_ => rng.nextBoolean())
            val fresh = freshRows(1 + rng.nextInt(2))
            val srcIds = present ++ fresh.map(_._1)
            spark.sql("SELECT * FROM VALUES " +
              srcIds.map(i => s"(CAST($i AS BIGINT))").mkString(", ") +
              " AS s(id)").createOrReplaceTempView("elem_fuzz_src")
            spark.sql(
              s"""MERGE INTO $cat.ns.t t USING elem_fuzz_src s ON t.id = s.id
                 |WHEN MATCHED AND t.id % 2 = 0 THEN UPDATE SET t.m['mg'] = $step
                 |WHEN NOT MATCHED THEN INSERT (id, tags, m)
                 |  VALUES (s.id, array('n$step'), map('a', CAST($step AS BIGINT)))
                 |""".stripMargin)
            model = model.map { case (id, (tg, mp)) =>
              id -> ((tg,
                if (present.contains(id) && id % 2 == 0)
                  upsert(mp, "mg", step.toLong) else mp))
            } ++ fresh.map { case (id, _) =>
              id -> ((List(s"n$step"), Vector(("a", step.toLong))))
            }
            check(step, "conditional merge")
          case 4 => // DELETE churn
            val mm = rng.nextInt(5)
            spark.sql(s"DELETE FROM $cat.ns.t WHERE id % 5 = $mm")
            model = model.filter { case (id, _) => id % 5 != mm }
            check(step, s"delete %5=$mm")
        }
      }
    }
  }
}
