package graft.lake.sql

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAlias, UnresolvedAttribute, UnresolvedFunction, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{Alias, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter}
import org.apache.spark.sql.connector.catalog.{CatalogNotFoundException, Identifier, TableCatalog}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types._

import graft.lake.{IncrementalAggView, LakeTable}

/** `CREATE MATERIALIZED VIEW v AS SELECT keys…, count(*) AS cnt,
  * sum(e)…, min(e)…, max(e)… FROM base [WHERE …] GROUP BY keys` —
  * the SQL spelling of [[IncrementalAggView]] (round-16 verdict ask).
  *
  * The statement parses through the injected parser (the ADD PARTITION
  * FIELD precedent), the defining query through Spark's own grammar;
  * this command then walks the UNRESOLVED Aggregate to extract the
  * spec: group keys (bare base columns), the count column (must be
  * named `cnt` — the maintenance schema's fixed slot), and
  * sum/min/max expressions with their aliases. The spec is STORED in
  * the view's table properties (`incr-view.base/keys/aggs/where`), so
  * `CALL system.refresh_agg_view('ns.v')` — one argument, no
  * re-spelled spec — and DESCRIBE EXTENDED read it back; the view is
  * populated on create via [[IncrementalAggView.rebuild]].
  *
  * Sum expressions must be INTEGER-typed (the floor-cents device):
  * exact delta arithmetic is what makes the incremental refresh
  * bit-equal to a full recompute, so a fractional sum refuses here,
  * at create time, not as drift later. */
final case class LakeCreateMaterializedViewCommand(
    viewParts: Seq[String], querySql: String) extends LeafRunnableCommand {

  override def run(spark: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.catalyst.plans.logical.{Join, SubqueryAlias}
    import org.apache.spark.sql.catalyst.plans.{Inner, UsingJoin}
    import org.apache.spark.sql.catalyst.expressions.{And, EqualTo}
    val plan = spark.sessionState.sqlParser.parseQuery(querySql)
    val (groupExprs, aggExprs, whereSql, baseParts, dimParts, dimKeys) =
      plan match {
        case Aggregate(g, a, child, _) =>
          // incremental maintenance re-evaluates the predicate on
          // DELTA rows at refresh time: a subquery's value (or a
          // nondeterministic call) can differ between refreshes,
          // silently diverging the view from its definition — refuse
          // at create time
          val (src, where) = child match {
            case Filter(cond, inner) =>
              if (cond.exists(_.isInstanceOf[
                  org.apache.spark.sql.catalyst.expressions.SubqueryExpression]))
                malformed("the WHERE clause must be subquery-free — " +
                  "incremental maintenance re-evaluates it per refresh")
              if (cond.exists(!_.deterministic))
                malformed("the WHERE clause must be deterministic")
              (inner, Some(cond.sql))
            case other => (other, None)
          }
          def rel(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
              : Seq[String] = p match {
            case r: UnresolvedRelation => r.multipartIdentifier
            case SubqueryAlias(_, r: UnresolvedRelation) => r.multipartIdentifier
            case other => malformed(
              s"JOIN sides must be bare lake tables, got ${other.nodeName}")
          }
          src match {
            case r: UnresolvedRelation =>
              (g, a, where, r.multipartIdentifier, None, Nil)
            // broadcast-dim enrichment (round-16 verdict ask #3):
            // `FROM base JOIN dim ON base.k = dim.k` / `USING (k)` maps
            // onto IncrementalAggView.DimJoin — the LEFT side is the
            // churning base whose changelog drives maintenance, the
            // RIGHT the dimension pinned at a snapshot
            case j: Join =>
              val keys: Seq[String] = j.joinType match {
                case UsingJoin(Inner, cols) => cols
                case Inner =>
                  val cond = j.condition.getOrElse(malformed(
                    "dim join needs ON base.k = dim.k (or USING (k))"))
                  def split(e: Expression): Seq[Expression] = e match {
                    case And(l, r) => split(l) ++ split(r)
                    case other => Seq(other)
                  }
                  split(cond).map {
                    case EqualTo(x: UnresolvedAttribute, y: UnresolvedAttribute)
                        if x.nameParts.last == y.nameParts.last =>
                      x.nameParts.last
                    case other => malformed("dim-join conditions must be " +
                      s"same-named equi conjuncts (base.k = dim.k), got " +
                      s"'${other.sql}'")
                  }
                case other => malformed(
                  s"only INNER dim joins are incrementally maintainable " +
                    s"(the view holds base ⋈ dim rows), got $other")
              }
              (g, a, where, rel(j.left), Some(rel(j.right)), keys)
            case other => malformed(s"FROM must be a bare lake table " +
              s"(optionally WHERE-filtered / dim-joined), got ${other.nodeName}")
          }
        case other => malformed(
          s"the defining query must be a GROUP BY aggregate, got ${other.nodeName}")
      }
    val keys = groupExprs.map {
      case a: UnresolvedAttribute => a.nameParts.last
      case other => malformed(
        s"group keys must be bare columns, got '${other.sql}'")
    }

    var cnt = false
    val rawSums = scala.collection.mutable.Buffer.empty[(String, String)]
    val rawAvgs = scala.collection.mutable.Buffer.empty[(String, String)]
    val mins = scala.collection.mutable.Buffer.empty[(String, String)]
    val maxs = scala.collection.mutable.Buffer.empty[(String, String)]
    def addAgg(fn: UnresolvedFunction, alias: Option[String]): Unit = {
      require(!fn.isDistinct, malformedMsg(
        "DISTINCT aggregates are not incrementally maintainable"))
      def named: String = alias.getOrElse(malformed(
        s"alias required: ${fn.nameParts.last}(${fn.arguments.map(_.sql).mkString(",")}) AS <column>"))
      def argSql: String = fn.arguments match {
        case Seq(one) => one.sql
        case _ => malformed(s"${fn.nameParts.last} takes one expression")
      }
      fn.nameParts.last.toLowerCase match {
        case "count" =>
          require(alias.forall(_ == "cnt"), malformedMsg(
            "the count column is the maintenance schema's fixed `cnt` " +
              "slot — write count(*) AS cnt (or leave it unaliased)"))
          // the maintenance tracks ROW count (sum of changelog signs);
          // count(col) skips NULLs — accepting it would silently store
          // a different statistic than the definition asks for. The
          // parser rewrites count(*) to count(1), so a literal (or a
          // surviving star) is the row-count spelling; anything else
          // refuses. (round-16 advisory)
          fn.arguments match {
            // count(NULL) is 0 in SQL (null-skipping), NOT the row count
            // — a null literal must refuse exactly like count(col)
            case Seq(l: org.apache.spark.sql.catalyst.expressions.Literal)
                if l.value != null =>
            case Seq(_: org.apache.spark.sql.catalyst.analysis.UnresolvedStar) =>
            case args => malformed(
              s"count(${args.map(_.sql).mkString(",")}) is null-skipping; " +
                "the incremental maintenance tracks row count — write " +
                "count(*) AS cnt")
          }
          cnt = true
        case "sum" => rawSums += named -> argSql
        case "avg" | "mean" => rawAvgs += named -> argSql
        case "min" => mins += named -> argSql
        case "max" => maxs += named -> argSql
        case other => malformed(s"unsupported aggregate '$other' " +
          "(count/sum/avg/min/max are incrementally maintainable)")
      }
    }
    aggExprs.foreach {
      case a: UnresolvedAttribute =>
        require(keys.contains(a.nameParts.last), malformedMsg(
          s"non-aggregate column '${a.nameParts.last}' is not a group key"))
      case Alias(fn: UnresolvedFunction, name) => addAgg(fn, Some(name))
      case UnresolvedAlias(fn: UnresolvedFunction, _) => addAgg(fn, None)
      case other => malformed(s"unsupported select item '${other.sql}'")
    }
    require(cnt, malformedMsg("count(*) AS cnt is required — it drives " +
      "group liveness in the incremental maintenance"))

    // resolve base + view in the SAME lake catalog (the stored spec's
    // `ns.table` ref is catalog-relative, like every CALL argument)
    val (viewCatalog, viewIdent) = resolveCatalog(spark, viewParts)
    val (baseCatalog, baseIdent) = resolveCatalog(spark, baseParts)
    require(viewCatalog eq baseCatalog,
      s"view ${viewParts.mkString(".")} and base ${baseParts.mkString(".")} " +
        "must live in the same lake catalog")
    val base = loadLake(baseCatalog, baseIdent, baseParts)
    val dimResolved = dimParts.map { dp =>
      val (dimCatalog, dimIdent) = resolveCatalog(spark, dp)
      require(dimCatalog eq baseCatalog,
        s"dim ${dp.mkString(".")} and base ${baseParts.mkString(".")} " +
          "must live in the same lake catalog")
      // the stored ref must round-trip through the procedures' strict
      // `ns.table` parse — normalize through the RESOLVED identifier at
      // CREATE (round-17 advisory: a 1-part ref only failed at the
      // first CALL, not here where the user can fix the definition)
      require(dimIdent.namespace.length == 1, malformedMsg(
        s"dim ${dp.mkString(".")} must resolve to a 1-level namespace " +
          s"(ns.table), got ${(dimIdent.namespace :+ dimIdent.name).mkString(".")}"))
      val dt = loadLake(dimCatalog, dimIdent, dp)
      dimKeys.foreach { k =>
        require(base.schema.fieldNames.contains(k) &&
            dt.schema.fieldNames.contains(k), malformedMsg(
          s"dim-join key '$k' must exist on both the base and the dim"))
      }
      (dt, s"${dimIdent.namespace.mkString(".")}.${dimIdent.name}")
    }
    val dimTable = dimResolved.map(_._1)

    // type the view schema off an empty frame under the ENRICHED row
    // shape (base ++ dim's non-key columns — exactly what the
    // maintenance's inner using-join produces), so group keys and
    // aggregate inputs may live on either side
    val typingSchema = dimTable match {
      case None => base.schema
      case Some(dt) => StructType(base.schema.fields ++
        dt.schema.fields.filterNot(f => dimKeys.contains(f.name)))
    }
    val emptyBase = spark.createDataFrame(
      new java.util.ArrayList[Row](), typingSchema)
    def fieldOf(sql: String): StructField = {
      val analyzed = org.apache.spark.sql.graftbridge.PlanBridge
        .analyzedPlan(emptyBase.select(expr(sql)))
      // rand()-style calls resolve only here (UnresolvedFunction claims
      // determinism): refuse once the real expression is known
      require(analyzed.expressions.forall(_.deterministic), malformedMsg(
        s"'$sql' is nondeterministic — incremental maintenance " +
          "re-evaluates expressions per refresh"))
      analyzed.schema.head
    }
    def typeOf(sql: String): DataType = fieldOf(sql).dataType
    // the WHERE clause resolves against the base the same way
    whereSql.foreach { w =>
      val analyzed = org.apache.spark.sql.graftbridge.PlanBridge
        .analyzedPlan(emptyBase.filter(expr(w)))
      require(analyzed.expressions.forall(_.deterministic), malformedMsg(
        "the WHERE clause must be deterministic"))
    }
    // Lower sums and avgs onto exactly-maintainable LONG slots plus
    // derived output columns (round-16 verdict ask): the maintenance
    // arithmetic stays integer-exact, the user-facing value is
    // RE-DERIVED from the slots at every refresh write.
    //   sum(int)        -> maintained as-is
    //   sum(decimal p,s), p<=18 -> slot sum((e)*10^s as long) + a
    //                      non-null-count slot; output
    //                      CAST(slot / 10^s AS DECIMAL(38,s)), NULL
    //                      when the group has no non-null input (SQL
    //                      SUM semantics) — exact
    //   avg(int/decimal) -> the same slot pair; output slot / NON-NULL
    //                      count in double division (SQL AVG divides by
    //                      the non-null count, NOT the row count — the
    //                      same null-skipping divergence count(col) is
    //                      refused for), NULL on an all-null group
    //   sum/avg(double) -> refuse, teaching both exact rewrites
    // Both slots are plain integer sums, so the maintenance arithmetic
    // stays the existing exact delta algebra; NULL inputs contribute
    // nothing to either slot on every path (sum skips nulls in the
    // delta pass exactly as SQL SUM does).
    val integral = Set[DataType](ByteType, ShortType, IntegerType, LongType)
    // maintained slots carry their own type: BIGINT for integral inputs,
    // DECIMAL(38,0) for scale-shifted decimal inputs — a LONG slot summed
    // across a large group silently wraps past 2^63 in non-ANSI mode,
    // whereas the DECIMAL(38,0) slot has 19 extra digits of headroom
    // (and nulls, never wraps, past that — round-17 advisory)
    val sums = scala.collection.mutable.Buffer.empty[(String, String, DataType)]
    val derived = scala.collection.mutable.Buffer.empty[(String, String, DataType)]
    def pow10(s: Int): Long = { var v = 1L; (0 until s).foreach(_ => v *= 10); v }
    // the non-null-count slot: itself an exact integer sum, so it rides
    // the same maintenance; shared between a sum and an avg of the same
    // output name is impossible (names are unique), between different
    // aggregates of the same EXPRESSION it is simply duplicated
    def nnSlot(n: String, e: String): String = {
      val slot = s"${n}__nn"
      sums += ((slot,
        s"CASE WHEN ($e) IS NULL THEN CAST(0 AS BIGINT) ELSE CAST(1 AS BIGINT) END",
        LongType))
      slot
    }
    def teachExact(agg: String, n: String, e: String, t: DataType): Nothing =
      malformed(s"$agg column '$n' over ${t.sql} ('$e') is not exactly " +
        "maintainable (float arithmetic drifts across incremental " +
        "refreshes) — write the value in integer units, e.g. " +
        s"$agg(CAST(floor(($e) * 100) AS LONG)) AS ${n}_cents, or CAST " +
        s"the input to DECIMAL (e.g. $agg(CAST($e AS DECIMAL(18,2)))), " +
        "which decomposes onto an exact integer slot automatically")
    rawSums.foreach { case (n, e) =>
      fieldOf(e) match {
        // a NON-nullable integral sum maintains as-is: over a non-empty
        // group the slot equals SQL SUM exactly. A NULLABLE integral
        // input must decompose like the decimal path: the incremental
        // merge coalesces stored/delta slots through 0, so an all-null
        // group's SQL-NULL sum would flip to 0 on the first refresh and
        // permanently diverge (round-17 advisory) — the __nn slot + a
        // derived output keep the NULL semantics exact
        case StructField(_, t, false, _) if integral(t) =>
          sums += ((n, e, LongType))
        case StructField(_, t, true, _) if integral(t) =>
          val slot = s"${n}__slot"
          sums += ((slot, s"CAST(($e) AS BIGINT)", LongType))
          val nn = nnSlot(n, e)
          derived += ((n,
            s"CASE WHEN $nn = 0 THEN CAST(NULL AS BIGINT) ELSE $slot END",
            LongType))
        case StructField(_, d: DecimalType, _, _) if d.precision <= 18 =>
          val (s, slot) = (d.scale, s"${n}__slot")
          sums += ((slot, s"CAST(($e) * ${pow10(s)} AS DECIMAL(38,0))",
            DecimalType(38, 0)))
          val nn = nnSlot(n, e)
          val value =
            if (s == 0) s"CAST($slot AS DECIMAL(38,0))"
            else s"CAST(CAST($slot AS DECIMAL(38,0)) / ${pow10(s)} AS DECIMAL(38,$s))"
          derived += ((n,
            s"CASE WHEN $nn = 0 THEN CAST(NULL AS DECIMAL(38,$s)) ELSE $value END",
            DecimalType(38, s)))
        case StructField(_, d: DecimalType, _, _) => malformed(
          s"sum column '$n': DECIMAL(${d.precision},_) exceeds the exact " +
            "slot range (precision must be <= 18) — rescale the input")
        case StructField(_, t, _, _) => teachExact("sum", n, e, t)
      }
    }
    rawAvgs.foreach { case (n, e) =>
      val (slotExpr, slotType, scale) = fieldOf(e).dataType match {
        case t if integral(t) =>
          (s"CAST(($e) AS BIGINT)", LongType: DataType, 0)
        case d: DecimalType if d.precision <= 18 =>
          (s"CAST(($e) * ${pow10(d.scale)} AS DECIMAL(38,0))",
            DecimalType(38, 0): DataType, d.scale)
        case d: DecimalType => malformed(
          s"avg column '$n': DECIMAL(${d.precision},_) exceeds the exact " +
            "slot range (precision must be <= 18) — rescale the input")
        case t => teachExact("avg", n, e, t)
      }
      val slot = s"${n}__slot"
      sums += ((slot, slotExpr, slotType))
      val nn = nnSlot(n, e)
      val num = if (scale == 0) s"CAST($slot AS DOUBLE)"
        else s"(CAST($slot AS DOUBLE) / ${pow10(scale)}.0)"
      derived += ((n,
        s"CASE WHEN $nn = 0 THEN CAST(NULL AS DOUBLE) " +
          s"ELSE $num / CAST($nn AS DOUBLE) END", DoubleType))
    }
    val viewSchema = StructType(
      keys.map(k => StructField(k, typeOf(k))) ++
        (StructField("cnt", LongType) +:
          (sums.map { case (n, _, t) => StructField(n, t) } ++
            mins.map { case (n, e) => StructField(n, typeOf(e)) } ++
            maxs.map { case (n, e) => StructField(n, typeOf(e)) } ++
            derived.map { case (n, _, t) => StructField(n, t) })))

    def aggSpec: String =
      (sums.map { case (n, e, _) => s"$n:$e" } ++
        mins.map { case (n, e) => s"$n:min:$e" } ++
        maxs.map { case (n, e) => s"$n:max:$e" }).mkString(";")
    val props = new java.util.HashMap[String, String]()
    props.put(MatViewProps.Base,
      s"${baseIdent.namespace.mkString(".")}.${baseIdent.name}")
    props.put(MatViewProps.Keys, keys.mkString(","))
    props.put(MatViewProps.Aggs, aggSpec)
    if (derived.nonEmpty) props.put(MatViewProps.Derived,
      derived.map { case (n, e, _) => s"$n:$e" }.mkString(";"))
    dimResolved.foreach { case (_, ref) =>
      props.put(MatViewProps.Dim, ref)
      props.put(MatViewProps.DimKeys, dimKeys.mkString(","))
    }
    whereSql.foreach(props.put(MatViewProps.Where, _))
    viewCatalog.createTable(viewIdent, viewSchema,
      Array.empty[org.apache.spark.sql.connector.expressions.Transform], props)
    val view = loadLake(viewCatalog, viewIdent, viewParts)

    // populate now: a just-created MV that reads empty until the first
    // CALL would silently serve wrong results. If the populating
    // rebuild fails at runtime (write error, data-dependent analysis
    // failure), drop the just-created view — an orphaned empty table
    // carrying the stored spec would serve wrong results AND block a
    // re-issued CREATE (round-16 advisory)
    try IncrementalAggView.rebuild(spark, base, view, keys,
      sums.toSeq.map { case (n, e, _) => n -> expr(e) },
      mins.toSeq.map { case (n, e) => n -> expr(e) },
      maxs.toSeq.map { case (n, e) => n -> expr(e) },
      where = whereSql.map(expr),
      dim = dimTable.map(dt => IncrementalAggView.DimJoin(dt, dimKeys)),
      derived = derived.toSeq.map { case (n, e, _) => n -> expr(e) })
    catch { case t: Throwable =>
      try viewCatalog.dropTable(viewIdent)
      catch { case s: Throwable => t.addSuppressed(s) }
      throw t
    }
    Nil
  }

  private def malformedMsg(detail: String): String =
    s"CREATE MATERIALIZED VIEW ${viewParts.mkString(".")}: $detail"
  private def malformed(detail: String): Nothing =
    throw new IllegalArgumentException(malformedMsg(detail))

  private def resolveCatalog(spark: SparkSession,
      parts: Seq[String]): (TableCatalog, Identifier) = {
    val cm = spark.sessionState.catalogManager
    val (cat, ident) = parts match {
      case Seq(single) =>
        (cm.currentCatalog, Identifier.of(cm.currentNamespace, single))
      case _ =>
        try (cm.catalog(parts.head),
          Identifier.of(parts.tail.init.toArray, parts.last))
        catch { case _: CatalogNotFoundException =>
          (cm.currentCatalog, Identifier.of(parts.init.toArray, parts.last))
        }
    }
    cat match {
      case tc: TableCatalog => (tc, ident)
      case other => malformed(s"catalog ${other.name()} is not a TableCatalog")
    }
  }

  private def loadLake(tc: TableCatalog, ident: Identifier,
      parts: Seq[String]): LakeTable =
    tc.loadTable(ident) match {
      case lt: LakeSqlTable => lt.lakeTable
      case other => malformed(s"${parts.mkString(".")} is not a lake table " +
        s"(got ${other.getClass.getSimpleName})")
    }
}

/** The stored-spec property names `CREATE MATERIALIZED VIEW` writes and
  * the 1-arg `CALL system.refresh_agg_view('ns.v')` reads back. */
object MatViewProps {
  val Base = "incr-view.base"
  val Keys = "incr-view.keys"
  val Aggs = "incr-view.aggs"
  val Where = "incr-view.where"
  /** `name:sql;…` — output columns derived from the maintained slots
    * (avg / fractional-sum decomposition), recomputed at every refresh
    * write. */
  val Derived = "incr-view.derived"
  /** Catalog-relative `ns.table` of the broadcast dimension an enriched
    * view joins (round-17: the SQL spelling of DimJoin). */
  val Dim = "incr-view.dim"
  /** Comma-separated shared join-key columns of the dim join. */
  val DimKeys = "incr-view.dim-keys"
}
