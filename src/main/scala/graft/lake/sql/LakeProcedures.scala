package graft.lake.sql

import java.util.{Collections, Iterator => JIterator}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.lake.{LakeCatalog, LakeTable}

/** Maintenance/recovery operations as SQL stored procedures — the DSv2
  * `CALL` surface Iceberg ships its table maintenance through
  * (`CALL cat.system.rollback_to_snapshot('ns.t', 3)`). Each procedure
  * is a thin driver-side shim onto the corresponding transactional
  * Scala-API operation; the returned single summary row comes back as a
  * `LocalScan` (these are metadata commits — there is no distributed
  * result to plan).
  *
  *  - `rollback_to_snapshot(table, snapshot_id)`
  *  - `expire_snapshots(table, keep_last)`
  *  - `rewrite_data_files(table, target_files)`   (compaction — also
  *     materializes live MoR tombstones, and re-clusters under the
  *     table's write order)
  *  - `rewrite_position_deletes(table)`   (materialize live MoR
  *     tombstones into ONLY the affected data files, retire the
  *     delete manifests)
  *  - `remove_orphan_files(table, older_than_ms)`
  *  - `set_write_order(table, order)`   (order = 'c1,c2' linear or
  *     'zorder(c1,c2)')
  */
private[sql] object LakeProcedures {

  private abstract class LakeProcedure(
      lake: LakeCatalog,
      override val name: String,
      params: Seq[(String, DataType)],
      resultSchema: StructType) extends UnboundProcedure with BoundProcedure {

    protected def run(args: InternalRow): InternalRow

    /** Multi-row procedures (lineage listings) override this; the
      * default wraps the single summary row. */
    protected def runRows(args: InternalRow): Array[InternalRow] =
      Array(run(args))

    override def description: String = s"graft-lake $name"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    /** SQL default-value text per OPTIONAL param (e.g. `"''"`) — the
      * analyzer fills omitted trailing args from these, which is what
      * lets `CALL refresh_agg_view('ns.v')` elide the stored spec. */
    protected def defaults: Map[String, String] = Map.empty
    override def parameters: Array[ProcedureParameter] =
      params.map { case (n, t) =>
        val b = ProcedureParameter.in(n, t)
        defaults.get(n).foreach(b.defaultValue)
        b.build()
      }.toArray

    override def call(input: InternalRow): JIterator[Scan] = {
      val out = runRows(input)
      Collections.singletonList[Scan](new LocalScan {
        override def rows(): Array[InternalRow] = out
        override def readSchema(): StructType = resultSchema
      }).iterator()
    }

    /** `'ns.t'` (or `'ns.a.b.t'` — last segment is the table) → a fresh
      * handle on current metadata. */
    protected def table(args: InternalRow): LakeTable = {
      val parts = args.getUTF8String(0).toString.split('.')
      require(parts.length >= 2, s"table must be 'namespace.table', got " +
        s"'${args.getUTF8String(0)}'")
      lake.loadTable(parts.dropRight(1).mkString("."), parts.last)
    }
  }

  private def utf8(s: String) = UTF8String.fromString(s)

  /** `name[:min|:max]:expr` entries, semicolon-separated (expressions
    * carry commas) → (kind, name, exprSql). Shared by the MV refresh
    * and rebuild procedures. */
  private def parseAggSpecs(aggsStr: String): Seq[(String, String, String)] =
    aggsStr.split(';').map(_.trim).filter(_.nonEmpty).toSeq.map { kv =>
      val i = kv.indexOf(':')
      require(i > 0, s"agg spec must be name[:min|:max]:expr, got '$kv'")
      val name = kv.substring(0, i).trim
      val rest = kv.substring(i + 1)
      if (rest.startsWith("min:")) ("min", name, rest.substring(4))
      else if (rest.startsWith("max:")) ("max", name, rest.substring(4))
      else ("sum", name, rest)
    }

  /** `name:sql` derived-column entries (avg / fractional-sum
    * decomposition slots → outputs). */
  private def parseDerived(derivedStr: String)
      : Seq[(String, org.apache.spark.sql.Column)] =
    derivedStr.split(';').map(_.trim).filter(_.nonEmpty).toSeq.map { kv =>
      val i = kv.indexOf(':')
      require(i > 0, s"derived spec must be name:expr, got '$kv'")
      kv.substring(0, i).trim ->
        org.apache.spark.sql.functions.expr(kv.substring(i + 1))
    }

  /** Spark invokes BoundProcedure.call from INSIDE the analyzer (the
    * InvokeProcedures rule); the MV refresh/rebuild plan and run nested
    * AGGREGATION queries, which must not analyze under the outer
    * analyzer's thread-local state — run on a clean thread and join. */
  private def onCleanThread[T](session: SparkSession)(body: => T): T = {
    var out: Option[T] = None
    var err: Throwable = null
    val th = new Thread(() => {
      try {
        SparkSession.setActiveSession(session)
        out = Some(body)
      } catch { case t: Throwable => err = t }
    }, "graft-mv-procedure")
    th.start()
    th.join()
    if (err != null) throw err
    out.get
  }

  def all(lake: LakeCatalog): Map[String, UnboundProcedure] = Map(
    "rollback_to_snapshot" -> new LakeProcedure(lake, "rollback_to_snapshot",
      Seq("table" -> StringType, "snapshot_id" -> LongType),
      StructType(Seq(
        StructField("previous_snapshot_id", LongType, nullable = false),
        StructField("current_snapshot_id", LongType, nullable = false)))) {
      override protected def run(args: InternalRow): InternalRow = {
        val t = table(args)
        val prev = t.currentSnapshotId
        t.rollbackTo(args.getLong(1))
        new GenericInternalRow(Array[Any](prev, t.currentSnapshotId))
      }
    },

    // Iceberg's rollback_to_timestamp: current ← the latest snapshot
    // committed STRICTLY BEFORE the cutoff (epoch millis) — Iceberg's
    // RollbackToTimestamp uses `<`, so a snapshot committed exactly at
    // the cutoff is rolled PAST, not kept
    "rollback_to_timestamp" -> new LakeProcedure(lake, "rollback_to_timestamp",
      Seq("table" -> StringType, "older_than_ms" -> LongType),
      StructType(Seq(
        StructField("previous_snapshot_id", LongType, nullable = false),
        StructField("current_snapshot_id", LongType, nullable = false)))) {
      override protected def run(args: InternalRow): InternalRow = {
        val t = table(args)
        val cutoff = args.getLong(1)
        // candidates = ANCESTORS of the current snapshot only (table
        // history, like Iceberg's procedure): the raw log also holds
        // WAP-staged and branch-only commits, and "rolling back" onto
        // one would publish unaudited data or move main onto a branch
        val m = t.metadata
        val ancestors = Iterator.iterate(m.currentSnapshot)(
          _.flatMap(_.parentId).flatMap(m.snapshot))
          .takeWhile(_.isDefined).flatten.toSeq
        val target = ancestors.filter(_.timestampMs < cutoff)
          .sortBy(_.id).lastOption.getOrElse(throw new IllegalArgumentException(
            s"no ancestor snapshot of ${t.name} strictly before ${cutoff}ms"))
        val prev = t.currentSnapshotId
        t.rollbackTo(target.id)
        new GenericInternalRow(Array[Any](prev, t.currentSnapshotId))
      }
    },

    // Iceberg's set_current_snapshot: like rollback but direction-free
    // (also re-targets FORWARD onto an abandoned commit after a
    // rollback — the redo to rollback's undo)
    "set_current_snapshot" -> new LakeProcedure(lake, "set_current_snapshot",
      Seq("table" -> StringType, "snapshot_id" -> LongType),
      StructType(Seq(
        StructField("previous_snapshot_id", LongType, nullable = false),
        StructField("current_snapshot_id", LongType, nullable = false)))) {
      override protected def run(args: InternalRow): InternalRow = {
        val t = table(args)
        val prev = t.currentSnapshotId
        t.rollbackTo(args.getLong(1))
        new GenericInternalRow(Array[Any](prev, t.currentSnapshotId))
      }
    },

    "expire_snapshots" -> new LakeProcedure(lake, "expire_snapshots",
      Seq("table" -> StringType, "keep_last" -> IntegerType),
      StructType(Seq(
        StructField("expired_snapshots_count", LongType, nullable = false)))) {
      override protected def run(args: InternalRow): InternalRow =
        new GenericInternalRow(Array[Any](
          table(args).expireSnapshots(args.getInt(1)).size.toLong))
    },

    // Iceberg's canonical age-based form (expire_snapshots(older_than)):
    // epoch millis, so callers pass unix_millis(timestamp '...')
    "expire_snapshots_older_than" -> new LakeProcedure(lake,
      "expire_snapshots_older_than",
      Seq("table" -> StringType, "older_than_ms" -> LongType),
      StructType(Seq(
        StructField("expired_snapshots_count", LongType, nullable = false)))) {
      override protected def run(args: InternalRow): InternalRow =
        new GenericInternalRow(Array[Any](
          table(args).expireSnapshotsOlderThan(args.getLong(1)).size.toLong))
    },

    "rewrite_data_files" -> new LakeProcedure(lake, "rewrite_data_files",
      Seq("table" -> StringType, "target_files" -> IntegerType),
      StructType(Seq(
        StructField("rewritten_data_files_count", LongType, nullable = false),
        StructField("added_data_files_count", LongType, nullable = false)))) {
      override protected def run(args: InternalRow): InternalRow = {
        val report = table(args).compact(SparkSession.active, args.getInt(1))
        val snap = report // CommitReport carries the added count; removed
        // comes from the landed snapshot summary
        val t = table(args)
        val removed = t.metadata.currentSnapshot
          .flatMap(_.summary.get("removed-data-files")).map(_.toLong).getOrElse(0L)
        new GenericInternalRow(Array[Any](removed, snap.addedDataFiles))
      }
    },

    "rewrite_position_deletes" -> new LakeProcedure(lake, "rewrite_position_deletes",
      Seq("table" -> StringType),
      StructType(Seq(
        StructField("rewritten_data_files_count", LongType, nullable = false),
        StructField("added_data_files_count", LongType, nullable = false),
        StructField("removed_delete_files_count", LongType, nullable = false)))) {
      override protected def run(args: InternalRow): InternalRow = {
        val t = table(args)
        val before = t.metadata.currentSnapshot
          .map(s => s.deleteFiles.size + s.eqDeleteFiles.size + s.dvFiles.size)
          .getOrElse(0)
        t.rewritePositionDeletes(SparkSession.active) match {
          case None => new GenericInternalRow(Array[Any](0L, 0L, 0L))
          case Some(r) =>
            // the committed snapshot's own summary — race-free
            val removed = t.refresh().metadata.snapshot(r.snapshotId)
              .flatMap(_.summary.get("removed-data-files"))
              .map(_.toLong).getOrElse(0L)
            new GenericInternalRow(Array[Any](
              removed, r.addedDataFiles.toLong, before.toLong))
        }
      }
    },

    "add_files" -> new LakeProcedure(lake, "add_files",
      Seq("table" -> StringType, "source_dir" -> StringType),
      StructType(Seq(
        StructField("added_files_count", LongType, nullable = false),
        StructField("added_rows_count", LongType, nullable = false)))) {
      override protected def run(args: InternalRow): InternalRow = {
        val r = table(args).addFiles(SparkSession.active,
          args.getUTF8String(1).toString)
        new GenericInternalRow(Array[Any](
          r.addedDataFiles.toLong, r.addedRecords))
      }
    },

    "remove_orphan_files" -> new LakeProcedure(lake, "remove_orphan_files",
      Seq("table" -> StringType, "older_than_ms" -> LongType),
      StructType(Seq(
        StructField("orphan_file_count", LongType, nullable = false)))) {
      override protected def run(args: InternalRow): InternalRow =
        new GenericInternalRow(Array[Any](
          table(args).removeOrphanFiles(args.getLong(1)).size.toLong))
    },

    // Incremental materialized-view refresh through SQL (the CALL form
    // of graft.lake.IncrementalAggView — Iceberg-style procedure next
    // to the maintenance family). TWO spellings:
    //   CALL refresh_agg_view('ns.v')  — one arg; the spec was stored
    //     in the view's table properties by CREATE MATERIALIZED VIEW;
    //   CALL refresh_agg_view('ns.v', 'ns.base', keys, aggs[, where])
    //     — explicit spec for API-created views.
    // `keys` = 'c1,c2'; `aggs` = 'name:expr;name2:min:expr2;
    // name3:max:expr3' (semicolons, because expressions carry commas):
    // the bare form is a SUM (must be an integer expression over BASE
    // rows for exact delta arithmetic), and an explicit 'min:'/'max:'
    // kind routes through the affected-group-rescan extremum
    // maintenance. `where` filters base rows before aggregation.
    "refresh_agg_view" -> new LakeProcedure(lake, "refresh_agg_view",
      Seq("view" -> StringType, "base" -> StringType,
        "keys" -> StringType, "aggs" -> StringType, "where" -> StringType),
      StructType(Seq(
        StructField("from_snapshot_id", LongType, nullable = false),
        StructField("to_snapshot_id", LongType, nullable = false),
        StructField("delta_groups", LongType, nullable = false),
        StructField("rescanned_groups", LongType, nullable = false),
        StructField("refreshed", BooleanType, nullable = false)))) {
      override protected def defaults: Map[String, String] =
        Map("base" -> "''", "keys" -> "''", "aggs" -> "''", "where" -> "''")
      override protected def run(args: InternalRow): InternalRow = {
        def tbl(ref: String): LakeTable = {
          val parts = ref.split('.')
          require(parts.length == 2, s"table ref must be ns.table: '$ref'")
          lake.loadTable(parts(0), parts(1))
        }
        val viewRef = args.getUTF8String(0).toString
        val view = tbl(viewRef)
        val explicitBase = args.getUTF8String(1).toString
        val (baseRef, keysStr, aggsStr, whereStr, derivedStr, dimSpecs,
            distinctSpecs) =
          if (explicitBase.nonEmpty) {
            // explicit args on a CREATE MATERIALIZED VIEW table would
            // silently drop the stored dim join / derived columns and
            // skip the dim-staleness check — the maintained delta then
            // diverges from the definition AND the watermark advances,
            // so the range is never reprocessed. Refuse loudly.
            require(!view.metadata.properties.contains(MatViewProps.Base),
              s"refresh_agg_view: ${view.name} carries a stored spec " +
                "(created by CREATE MATERIALIZED VIEW) — use the 1-arg " +
                s"form CALL refresh_agg_view('${args.getUTF8String(0)}') " +
                "so the dim join / derived columns are not silently dropped")
            (explicitBase, args.getUTF8String(2).toString,
              args.getUTF8String(3).toString, args.getUTF8String(4).toString,
              "", Nil, Nil)
          } else {
            // the 1-arg form: read the spec CREATE MATERIALIZED VIEW
            // stored — no re-spelling, no drift between create and
            // refresh
            val p = view.metadata.properties
            def req(k: String): String = p.getOrElse(k,
              throw new IllegalArgumentException(
                s"view ${view.name} carries no stored spec ('$k'): it " +
                  "was not created by CREATE MATERIALIZED VIEW — pass " +
                  "base/keys/aggs explicitly"))
            (req(MatViewProps.Base), req(MatViewProps.Keys),
              req(MatViewProps.Aggs), p.getOrElse(MatViewProps.Where, ""),
              p.getOrElse(MatViewProps.Derived, ""),
              MatViewProps.parseDims(p), MatViewProps.parseDistincts(p))
          }
        val keys = keysStr.split(',').map(_.trim).filter(_.nonEmpty).toSeq
        // (kind, name, expr) — view-schema order is keys ++ cnt ++
        // sums ++ mins ++ maxs regardless of spec order
        val aggSpecs = parseAggSpecs(aggsStr)
        val session = SparkSession.active
        val base = tbl(baseRef)
        // both leading params are strings, so a call written against
        // the old (base, view, ...) argument order binds with no type
        // error and only fails at write time — or succeeds wrongly if
        // the schemas coincide. Validate the resolved VIEW before
        // refreshing (round-16 advisory): an incremental agg view
        // always carries the LongType `cnt` maintenance slot, and
        // refreshing a table into itself is always an argument swap.
        require(view.name != base.name,
          s"refresh_agg_view: view and base are the same table " +
            s"(${view.name}) — the signature is (view, base, keys, aggs)")
        require(view.schema.fields.exists(f =>
            f.name == "cnt" && f.dataType == LongType),
          s"refresh_agg_view: ${view.name} has no LongType `cnt` column, " +
            "so it is not an incremental agg view — were the view/base " +
            "arguments swapped? the signature is (view, base, keys, aggs)")
        val out = onCleanThread(session) {
          def of(kind: String) = aggSpecs.collect { case (`kind`, n, e) =>
            n -> org.apache.spark.sql.functions.expr(e) }
          val dims = dimSpecs.map { case (ref, ks) =>
            graft.lake.IncrementalAggView.DimJoin(tbl(ref), ks) }
          val where = Some(whereStr).filter(_.nonEmpty)
            .map(org.apache.spark.sql.functions.expr)
          // companion + view refresh pinned to ONE base snapshot read
          // up front: a base commit landing between the two refreshes
          // must not leave the distinct column reflecting a newer
          // state than the other aggregates
          val head = base.refresh().metadata.currentSnapshotId
          val distincts = distinctSpecs.map { case (n, e) =>
            val viewTbl = viewRef.split('.').last
            val viewNs = viewRef.split('.').dropRight(1).mkString(".")
            val comp = tbl(s"$viewNs." +
              MatViewProps.companionName(viewTbl, n))
            graft.lake.IncrementalAggView.refresh(
              session, base, comp, keys :+ s"${n}__v", Nil,
              where = where, dims = dims,
              extraCols = Seq(s"${n}__v" ->
                org.apache.spark.sql.functions.expr(e)),
              pinHead = Some(head))
            graft.lake.IncrementalAggView.DistinctCount(n, comp, s"${n}__v")
          }
          graft.lake.IncrementalAggView.refresh(
            session, base, view, keys, of("sum"),
            mins = of("min"), maxs = of("max"),
            where = where,
            dims = dims,
            derived = parseDerived(derivedStr),
            distincts = distincts,
            pinHead = Some(head))
        }
        new GenericInternalRow(Array[Any](
          out.fromSnapshotId, out.toSnapshotId, out.deltaGroups,
          out.rescannedGroups, out.refreshed))
      }
    },

    // Full recompute of a stored-spec materialized view: the documented
    // escape when a DIMENSION commit invalidates an enriched view's
    // history (refresh_agg_view then refuses toward rebuild) — re-reads
    // base ⋈ dim from scratch and RE-PINS the dim snapshot in the same
    // CAS commit. Requires a CREATE MATERIALIZED VIEW stored spec.
    "rebuild_agg_view" -> new LakeProcedure(lake, "rebuild_agg_view",
      Seq("view" -> StringType),
      StructType(Seq(
        StructField("to_snapshot_id", LongType, nullable = false),
        StructField("refreshed", BooleanType, nullable = false)))) {
      override protected def run(args: InternalRow): InternalRow = {
        def tbl(ref: String): LakeTable = {
          val parts = ref.split('.')
          require(parts.length == 2, s"table ref must be ns.table: '$ref'")
          lake.loadTable(parts(0), parts(1))
        }
        val viewRef = args.getUTF8String(0).toString
        val view = tbl(viewRef)
        val p = view.metadata.properties
        def req(k: String): String = p.getOrElse(k,
          throw new IllegalArgumentException(
            s"view ${view.name} carries no stored spec ('$k'): it was " +
              "not created by CREATE MATERIALIZED VIEW"))
        val keys = req(MatViewProps.Keys)
          .split(',').map(_.trim).filter(_.nonEmpty).toSeq
        val aggSpecs = parseAggSpecs(req(MatViewProps.Aggs))
        val session = SparkSession.active
        val base = tbl(req(MatViewProps.Base))
        val out = onCleanThread(session) {
          def of(kind: String) = aggSpecs.collect { case (`kind`, n, e) =>
            n -> org.apache.spark.sql.functions.expr(e) }
          val dims = MatViewProps.parseDims(p).map { case (ref, ks) =>
            graft.lake.IncrementalAggView.DimJoin(tbl(ref), ks) }
          val where = Some(p.getOrElse(MatViewProps.Where, ""))
            .filter(_.nonEmpty)
            .map(org.apache.spark.sql.functions.expr)
          val head = base.refresh().metadata.currentSnapshotId
          val distincts = MatViewProps.parseDistincts(p).map { case (n, e) =>
            val viewTbl = viewRef.split('.').last
            val viewNs = viewRef.split('.').dropRight(1).mkString(".")
            val comp = tbl(s"$viewNs." +
              MatViewProps.companionName(viewTbl, n))
            graft.lake.IncrementalAggView.rebuild(
              session, base, comp, keys :+ s"${n}__v", Nil,
              where = where, dims = dims,
              extraCols = Seq(s"${n}__v" ->
                org.apache.spark.sql.functions.expr(e)),
              pinHead = Some(head))
            graft.lake.IncrementalAggView.DistinctCount(n, comp, s"${n}__v")
          }
          graft.lake.IncrementalAggView.rebuild(
            session, base, view, keys, of("sum"),
            mins = of("min"), maxs = of("max"),
            where = where,
            dims = dims, derived = parseDerived(
              p.getOrElse(MatViewProps.Derived, "")),
            distincts = distincts,
            pinHead = Some(head))
        }
        new GenericInternalRow(Array[Any](out.toSnapshotId, out.refreshed))
      }
    },

    "create_tag" -> new LakeProcedure(lake, "create_tag",
      Seq("table" -> StringType, "name" -> StringType, "snapshot_id" -> LongType),
      StructType(Seq(
        StructField("name", StringType, nullable = false),
        StructField("snapshot_id", LongType, nullable = false)))) {
      override protected def run(args: InternalRow): InternalRow = {
        table(args).createTag(args.getUTF8String(1).toString, args.getLong(2))
        new GenericInternalRow(Array[Any](args.getUTF8String(1), args.getLong(2)))
      }
    },

    "create_branch" -> new LakeProcedure(lake, "create_branch",
      Seq("table" -> StringType, "name" -> StringType),
      StructType(Seq(
        StructField("name", StringType, nullable = false),
        StructField("snapshot_id", LongType, nullable = false)))) {
      override protected def run(args: InternalRow): InternalRow = {
        val t = table(args)
        t.createBranch(args.getUTF8String(1).toString)
        new GenericInternalRow(Array[Any](args.getUTF8String(1),
          t.refs(args.getUTF8String(1).toString).snapshotId))
      }
    },

    // partition-spec evolution through SQL (Iceberg's ALTER TABLE ADD/
    // DROP PARTITION FIELD needs a parser extension; the procedure form
    // covers the same metadata-only commit): spec = 'bucket(4, c1), c2,
    // day(ts), truncate(2, c3)' — or '' to unpartition future writes.
    // Existing files keep pruning under the spec that derived their
    // partition values (spec-id-per-entry design, PruningSpec).
    "evolve_spec" -> new LakeProcedure(lake, "evolve_spec",
      Seq("table" -> StringType, "spec" -> StringType),
      StructType(Seq(
        StructField("spec_id", IntegerType, nullable = false),
        StructField("spec", StringType, nullable = false)))) {
      override protected def run(args: InternalRow): InternalRow = {
        val t = table(args)
        t.evolveSpec(SpecDsl.splitTop(args.getUTF8String(1).toString)
          .map(SpecDsl.parseField))
        val m = t.refresh().metadata
        new GenericInternalRow(Array[Any](m.allSpecs.size - 1,
          utf8(m.spec.map(_.render).mkString(", "))))
      }
    },

    // filtered compaction (Iceberg's rewrite_data_files(where => …)):
    // re-cluster ONLY the files whose stats may match the WHERE — a hot
    // partition rewrites at O(matching bytes). The WHERE must have an
    // exact manifest-predicate form (refused otherwise — silently
    // rewriting the whole table on an unparseable filter is worse)
    "rewrite_data_files_where" -> new LakeProcedure(lake, "rewrite_data_files_where",
      Seq("table" -> StringType, "target_files" -> IntegerType,
        "where" -> StringType),
      StructType(Seq(
        StructField("rewritten_files_count", LongType, nullable = false),
        StructField("added_files_count", LongType, nullable = false)))) {
      override protected def run(args: InternalRow): InternalRow = {
        val t = table(args)
        val spark = SparkSession.active
        val pred = LakeProcedures.parseWhere(spark, t, args.getUTF8String(2).toString)
        t.compactWhere(spark, pred, targetFiles = args.getInt(1)) match {
          case None => new GenericInternalRow(Array[Any](0L, 0L))
          case Some(r) =>
            // read the COMMITTED snapshot's own summary, not the
            // current one — a racing commit would swap the counts
            val removed = t.refresh().metadata.snapshot(r.snapshotId)
              .flatMap(_.summary.get("removed-data-files"))
              .map(_.toLong).getOrElse(0L)
            new GenericInternalRow(Array[Any](removed, r.addedDataFiles.toLong))
        }
      }
    },

    // per-commit changelog between two snapshots as a TEMP VIEW
    // (Iceberg's create_changelog_view): rows with _change_type
    // insert|delete and _commit_snapshot_id; from_snapshot_id 0 = the
    // whole history; to_snapshot_id 0 = current
    "create_changelog_view" -> new LakeProcedure(lake, "create_changelog_view",
      Seq("table" -> StringType, "from_snapshot_id" -> LongType,
        "to_snapshot_id" -> LongType),
      StructType(Seq(
        StructField("changelog_view", StringType, nullable = false)))) {
      override protected def run(args: InternalRow): InternalRow = {
        val t = table(args)
        val to = args.getLong(2) match { case 0L => None; case id => Some(id) }
        val df = t.changelog(SparkSession.active, args.getLong(1), to)
        val view = s"${t.name.replace('.', '_')}_changes"
        // the changelog frame was built on a conf-pinned CLONE session
        // (ID-based parquet reads); the view must register on the
        // CALLER's session or it is invisible to the next query
        org.apache.spark.sql.graftbridge.PlanBridge
          .ofRows(SparkSession.active,
            org.apache.spark.sql.graftbridge.PlanBridge.analyzedPlan(df))
          .createOrReplaceTempView(view)
        new GenericInternalRow(Array[Any](utf8(view)))
      }
    },

    // publish a wap.id-staged snapshot (fast-forward-only: its parent
    // must be the current head — the WAP-pipeline shape)
    "cherrypick_snapshot" -> new LakeProcedure(lake, "cherrypick_snapshot",
      Seq("table" -> StringType, "snapshot_id" -> LongType),
      StructType(Seq(
        StructField("source_snapshot_id", LongType, nullable = false),
        StructField("current_snapshot_id", LongType, nullable = false)))) {
      override protected def run(args: InternalRow): InternalRow = {
        val t = table(args)
        t.cherrypick(args.getLong(1))
        new GenericInternalRow(Array[Any](args.getLong(1), t.currentSnapshotId))
      }
    },

    "rewrite_manifests" -> new LakeProcedure(lake, "rewrite_manifests",
      Seq("table" -> StringType, "target_entries" -> IntegerType),
      StructType(Seq(
        StructField("rewritten_manifests_count", LongType, nullable = false),
        StructField("added_manifests_count", LongType, nullable = false)))) {
      override protected def run(args: InternalRow): InternalRow = {
        val t = table(args)
        val before = t.metadata.currentSnapshot
          .map(_.manifests.count(_.content == graft.lake.ManifestRef.Data))
          .getOrElse(0)
        t.rewriteManifests(targetEntries = args.getInt(1), minManifests = 2) match {
          case Some(_) =>
            val after = t.metadata.currentSnapshot
              .map(_.manifests.count(_.content == graft.lake.ManifestRef.Data))
              .getOrElse(0)
            new GenericInternalRow(Array[Any](before.toLong, after.toLong))
          case None => new GenericInternalRow(Array[Any](0L, 0L))
        }
      }
    },

    "fast_forward" -> new LakeProcedure(lake, "fast_forward",
      Seq("table" -> StringType, "branch" -> StringType),
      StructType(Seq(
        StructField("previous_snapshot_id", LongType, nullable = false),
        StructField("current_snapshot_id", LongType, nullable = false)))) {
      override protected def run(args: InternalRow): InternalRow = {
        val t = table(args)
        val prev = t.currentSnapshotId
        t.fastForward(args.getUTF8String(1).toString)
        new GenericInternalRow(Array[Any](prev, t.currentSnapshotId))
      }
    },

    "drop_ref" -> new LakeProcedure(lake, "drop_ref",
      Seq("table" -> StringType, "name" -> StringType),
      StructType(Seq(StructField("dropped", StringType, nullable = false)))) {
      override protected def run(args: InternalRow): InternalRow = {
        table(args).dropRef(args.getUTF8String(1).toString)
        new GenericInternalRow(Array[Any](args.getUTF8String(1)))
      }
    },

    // ANALYZE (Iceberg's NDV-statistics story): one aggregation pass,
    // NDV/null/length stats into a per-snapshot stats file; the scan
    // builder serves them to CBO as DSv2 column statistics.
    // columns = 'c1,c2' or '' for all.
    "analyze_table" -> new LakeProcedure(lake, "analyze_table",
      Seq("table" -> StringType, "columns" -> StringType),
      StructType(Seq(
        StructField("analyzed_snapshot_id", LongType, nullable = false),
        StructField("analyzed_columns", IntegerType, nullable = false)))) {
      override protected def run(args: InternalRow): InternalRow = {
        val t = table(args)
        val cols = args.getUTF8String(1).toString.split(',')
          .map(_.trim).filter(_.nonEmpty).toSeq
        t.analyzeColumns(SparkSession.active, cols)
        // report what was ACTUALLY analyzed (the committed blob's
        // column set): the default-all path skips complex-typed and
        // non-word-named columns, so schema width would overstate it
        val n = t.colStatsJson
          .map(graft.lake.LakeTable.parseColStats(_).size)
          .getOrElse(0)
        new GenericInternalRow(Array[Any](t.currentSnapshotId, n))
      }
    },

    // Iceberg's migrate/snapshot story in one call: CREATE a lake table
    // whose schema is inferred from an existing parquet directory, then
    // register those files IN PLACE (one metadata commit + a
    // footer-stats pass — onboarding 100 TB never rewrites a byte).
    // Equivalent to CREATE TABLE + add_files; the files stay outside
    // the table location so expiry/orphan sweeps can never touch them.
    "snapshot_table" -> new LakeProcedure(lake, "snapshot_table",
      Seq("table" -> StringType, "source_dir" -> StringType),
      StructType(Seq(
        StructField("imported_files_count", LongType, nullable = false),
        StructField("imported_rows_count", LongType, nullable = false)))) {
      override protected def run(args: InternalRow): InternalRow = {
        val parts = args.getUTF8String(0).toString.split('.')
        require(parts.length >= 2, s"table must be 'namespace.table', got " +
          s"'${args.getUTF8String(0)}'")
        val src = args.getUTF8String(1).toString
        val spark = SparkSession.active
        val t = lake.createTable(parts.dropRight(1).mkString("."), parts.last,
          spark.read.parquet(src).schema)
        val r = t.addFiles(spark, src)
        new GenericInternalRow(Array[Any](
          r.addedDataFiles.toLong, r.addedRecords))
      }
    },

    // Iceberg's register_table: bind a catalog name to EXISTING table
    // metadata (no copy) — the import twin of snapshot_table, which
    // copies data files into a fresh table
    "register_table" -> new LakeProcedure(lake, "register_table",
      Seq("table" -> StringType, "location" -> StringType),
      StructType(Seq(
        StructField("current_snapshot_id", LongType, nullable = false),
        StructField("total_data_files", LongType, nullable = false)))) {
      override protected def run(args: InternalRow): InternalRow = {
        val parts = args.getUTF8String(0).toString.split('.')
        require(parts.length >= 2, s"table must be 'namespace.table', got " +
          s"'${args.getUTF8String(0)}'")
        val t = lake.registerTable(parts.dropRight(1).mkString("."),
          parts.last, args.getUTF8String(1).toString)
        new GenericInternalRow(Array[Any](t.metadata.currentSnapshotId,
          t.metadata.currentFiles.size.toLong))
      }
    },

    // Iceberg's ancestors_of: the parent chain from a snapshot (0 =
    // current) back to the table's root, newest first — the lineage
    // listing rollback/cherry-pick debugging starts from
    "ancestors_of" -> new LakeProcedure(lake, "ancestors_of",
      Seq("table" -> StringType, "snapshot_id" -> LongType),
      StructType(Seq(
        StructField("snapshot_id", LongType, nullable = false),
        StructField("timestamp_ms", LongType, nullable = false),
        StructField("operation", StringType, nullable = false)))) {
      override protected def run(args: InternalRow): InternalRow =
        throw new UnsupportedOperationException("multi-row")
      override protected def runRows(args: InternalRow): Array[InternalRow] = {
        val t = table(args)
        val m = t.metadata
        val from = args.getLong(1) match {
          case 0L => m.currentSnapshotId
          case id => id
        }
        require(m.snapshot(from).isDefined,
          s"no snapshot $from in ${t.name} (expired or never existed)")
        Iterator.iterate(m.snapshot(from))(
          _.flatMap(_.parentId).flatMap(m.snapshot))
          .takeWhile(_.isDefined).flatten
          .map(s => new GenericInternalRow(Array[Any](
            s.id, s.timestampMs, utf8(s.operation))): InternalRow)
          .toArray
      }
    },

    // Iceberg's compute_partition_stats: per-partition rollups into an
    // immutable stats doc; the `partitions` inspection table then
    // answers from it with no manifest load (and no row cap)
    "compute_partition_stats" -> new LakeProcedure(lake, "compute_partition_stats",
      Seq("table" -> StringType),
      StructType(Seq(
        StructField("analyzed_snapshot_id", LongType, nullable = false),
        StructField("partition_count", IntegerType, nullable = false)))) {
      override protected def run(args: InternalRow): InternalRow = {
        val t = table(args)
        val n = t.computePartitionStats()
        new GenericInternalRow(Array[Any](t.currentSnapshotId, n))
      }
    },

    "set_write_order" -> new LakeProcedure(lake, "set_write_order",
      Seq("table" -> StringType, "order" -> StringType),
      StructType(Seq(
        StructField("sort_order", StringType, nullable = false),
        StructField("kind", StringType, nullable = false)))) {
      override protected def run(args: InternalRow): InternalRow = {
        val t = table(args)
        val raw = args.getUTF8String(1).toString.trim
        val zorder = raw.toLowerCase.startsWith("zorder(") && raw.endsWith(")")
        val cols = (if (zorder) raw.substring(raw.indexOf('(') + 1, raw.length - 1)
          else raw).split(',').map(_.trim).filter(_.nonEmpty).toSeq
        if (zorder) t.setZOrder(cols: _*) else t.setWriteOrder(cols: _*)
        val m = t.refresh().metadata
        new GenericInternalRow(Array[Any](
          utf8(m.sortOrder.mkString(",")), utf8(m.sortOrderKind)))
      }
    })

  /** A WHERE string → STRICT manifest predicate: analyzed against the
    * table's own scan (names/types resolve like any query), split into
    * conjuncts, each translated exactly — an inexpressible leaf REFUSES
    * rather than widening (a lenient AlwaysTrue would quietly turn
    * "rewrite this partition" into "rewrite the table"). */
  private def parseWhere(spark: SparkSession, t: LakeTable,
      whereStr: String): graft.lake.LakePredicate = {
    import graft.lake.{LakePredicate => P}
    import org.apache.spark.sql.catalyst.expressions.{And => CAnd, Expression}
    import org.apache.spark.sql.catalyst.plans.logical.Filter
    import org.apache.spark.sql.graftbridge.PlanBridge
    val analyzed = PlanBridge.analyzedPlan(
      t.newScan().toDF(spark).filter(whereStr))
    val cond = analyzed.collectFirst { case f: Filter => f.condition }
      .getOrElse(throw new IllegalArgumentException(
        s"WHERE '$whereStr' produced no filter"))
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case CAnd(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    // fold analyzer-inserted casts around literals (CAST(749 AS
    // BIGINT)) or translation sees a non-literal and refuses wrongly
    conjuncts(LakeRowLevelCommands.foldConstants(cond)).map { e =>
      PlanBridge.translateFilter(e)
        .flatMap(LakeSqlTable.toLakePredicateStrict)
        .getOrElse(throw new IllegalArgumentException(
          s"WHERE clause term has no exact manifest-predicate form: $e"))
    }.reduceOption(P.And(_, _)).getOrElse(P.AlwaysTrue)
  }
}
