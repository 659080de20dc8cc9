package graft.lake.sql

import java.util.Locale

import scala.util.control.NonFatal

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Cast, Divide, EqualTo, Expression, If, KnownNotNull, Literal, NamedExpression, SubqueryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.{Identifier, TableCatalog}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.graftbridge.PlanBridge
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

import graft.lake.IncrementalAggView

/** Transparent materialized-view rewrite (round-18 verdict ask #3):
  * an analyzer rule that re-plans a `GROUP BY` aggregate over a lake
  * base table onto a FRESH matching materialized view — the user's
  * query never names the view; `CREATE MATERIALIZED VIEW` alone makes
  * every matching rollup read group-sized instead of base-sized.
  *
  * Matching contract (all checked, any miss = no rewrite, never an
  * error):
  *  - the aggregate's child is the bare base relation (or one Filter
  *    over it) of a lake table carrying an `incr-view.dependents`
  *    back-pointer — the O(1) candidate lookup CREATE MV maintains;
  *  - FRESHNESS: the view's maintenance watermark equals the exact
  *    snapshot this query reads. NEVER serve stale — one base commit
  *    after the last refresh and the rule falls back to the base scan;
  *  - the query WHERE (if any) renders identically to the stored view
  *    predicate; group keys are bare columns of the stored key set;
  *  - every aggregate output maps onto a stored rewrite entry
  *    (`incr-view.rewrite`, written at CREATE): count(*) → `cnt`,
  *    sum/min/max/avg/count(DISTINCT …) → the maintained or derived
  *    column whose defining expression renders identically.
  *
  * Two shapes rewrite:
  *  - EXACT (query keys == view keys): a Project over the view scan —
  *    zero aggregation at read time;
  *  - ROLLUP (query keys ⊂ view keys, including the global rollup):
  *    a group-sized re-aggregation over the view — count(*) becomes
  *    sum(cnt), sums add, min/max nest, avg re-derives from the exact
  *    integer (slot, non-null-count) pair — O(|view|) instead of
  *    O(|base|). count(DISTINCT) cannot roll up (the per-key counts
  *    are not additive) and bails.
  *
  * Output attribute ids are preserved (each mapped column is aliased
  * under the original output's exprId), so enclosing operators resolve
  * untouched — the same rebinding contract as
  * [[LakeMoRScanSubstitution]]. Kill switch:
  * `spark.graft.mv.rewrite=false`.
  *
  * Scale shape: at 100 TB the difference is a full fact-table scan +
  * shuffle vs a read of a group-sized view — the entire point of
  * maintaining the view incrementally. The freshness gate makes the
  * rewrite safe to leave on: a stale view is never consulted, and the
  * maintenance cadence (streaming `autoRefresh` or scheduled CALLs)
  * determines how often queries hit the fast path. */
object LakeMvRewrite extends Rule[LogicalPlan] {

  val ConfKey = "spark.graft.mv.rewrite"

  private final case class Entry(kind: String, viewCol: String,
      extra: String, exprSql: String)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (conf.getConfString(ConfKey, "true") != "true") return plan
    plan.transformUp {
      case agg: Aggregate if agg.resolved =>
        // a matching failure anywhere (dangling dependent ref, dropped
        // view, unparseable stored spec) must degrade to the base plan,
        // never break the query
        try tryRewrite(agg).getOrElse(agg)
        catch { case NonFatal(_) => agg }
    }
  }

  /** The bare lake relation under the aggregate, with at most one
    * Filter on the way (the `SELECT … WHERE p GROUP BY k` shape). */
  private def baseUnder(p: LogicalPlan)
      : Option[(Option[Expression], DataSourceV2Relation, LakeSqlTable)] =
    p match {
      case Filter(cond, child) => baseUnder(child) match {
        case Some((None, r, t)) => Some((Some(cond), r, t))
        case _ => None
      }
      case SubqueryAlias(_, child) => baseUnder(child)
      case r: DataSourceV2Relation => r.table match {
        // historical reads (VERSION/TIMESTAMP AS OF) pin an old
        // snapshot the watermark gate cannot vouch for — skip
        case t: LakeSqlTable if !t.isHistorical => Some((None, r, t))
        case _ => None
      }
      case _ => None
    }

  private def tryRewrite(agg: Aggregate): Option[LogicalPlan] = {
    val (filterCond, rel, baseTbl) = baseUnder(agg.child) match {
      case Some(x) => x
      case None => return None
    }
    val baseProps = baseTbl.lakeTable.metadata.properties
    val depsStr = baseProps.getOrElse(MatViewProps.Dependents, return None)
    val catalog = rel.catalog match {
      case Some(tc: TableCatalog) => tc
      case _ => return None
    }
    val spark = SparkSession.active
    // a WAP-branch session reads the audit branch, not the main head
    // the watermark tracks — the freshness gate would compare the
    // wrong snapshots, so the rewrite stands down entirely
    if (spark.conf.getOption("spark.wap.branch").exists(_.nonEmpty))
      return None
    val baseSnap = baseTbl.lakeTable.metadata.currentSnapshotId
    val baseRef = rel.identifier match {
      case Some(id) => s"${id.namespace.mkString(".")}.${id.name}"
      case None => return None
    }
    if (agg.aggregateExpressions.exists(!_.deterministic)) return None
    depsStr.split(',').iterator.map(_.trim).filter(_.nonEmpty)
      .flatMap { dep =>
        try rewriteWith(spark, agg, filterCond, rel, catalog, baseRef,
          baseSnap, dep)
        catch { case NonFatal(_) => None }
      }
      .nextOption()
  }

  private def rewriteWith(spark: SparkSession, agg: Aggregate,
      filterCond: Option[Expression], rel: DataSourceV2Relation,
      catalog: TableCatalog, baseRef: String, baseSnap: Long,
      dep: String): Option[LogicalPlan] = {
    val parts = dep.split('.')
    if (parts.length < 2) return None
    val ident = Identifier.of(parts.dropRight(1), parts.last)
    val viewSql = (try catalog.loadTable(ident)
      catch { case NonFatal(_) => return None }) match {
      case v: LakeSqlTable => v
      case _ => return None
    }
    val vp = viewSql.lakeTable.metadata.properties
    if (!vp.get(MatViewProps.Base).contains(baseRef)) return None
    // NEVER serve stale: the view must reflect EXACTLY the snapshot
    // this query's relation reads
    if (!vp.get(IncrementalAggView.WatermarkProp)
        .contains(baseSnap.toString)) return None
    // a dim-enriched view's defining query contains joins — a bare
    // aggregate over the base alone can never match it
    if (vp.contains(MatViewProps.Dim)) return None
    val entries = vp.getOrElse(MatViewProps.Rewrite, return None)
      .split(';').toSeq.filter(_.nonEmpty).map { s =>
        val a = s.split(":", 4)
        if (a.length < 4) return None
        Entry(a(0), a(1), a(2), a(3))
      }
    val storedKeys = vp.getOrElse(MatViewProps.Keys, return None)
      .split(',').map(_.trim.toLowerCase(Locale.ROOT)).toSeq
    // the WHERE clause must render identically to the stored predicate
    // (both sides resolved against the base schema, attribute ids
    // normalized away)
    val whereOk = (filterCond, vp.get(MatViewProps.Where)) match {
      case (None, None) => true
      case (Some(c), Some(w)) =>
        !c.exists(_.isInstanceOf[SubqueryExpression]) &&
          norm(c) == normStored(spark, rel, w, asFilter = true)
      case _ => false
    }
    if (!whereOk) return None
    val gNames = agg.groupingExpressions.map {
      case a: AttributeReference => a.name.toLowerCase(Locale.ROOT)
      case _ => return None
    }
    val kSet = storedKeys.toSet
    if (!gNames.toSet.subsetOf(kSet) || gNames.distinct.size != gNames.size)
      return None
    val exact = gNames.toSet == kSet

    val viewRel = DataSourceV2Relation.create(viewSql, Some(catalog),
      Some(ident))
    val vAttr: Map[String, AttributeReference] = viewRel.output
      .map(a => a.name.toLowerCase(Locale.ROOT) -> a).toMap

    def entryFor(kinds: Set[String], c: Expression): Option[Entry] = {
      val n = norm(c)
      entries.find(en => kinds(en.kind) &&
        normStored(spark, rel, en.exprSql) == n)
    }
    def viewCol(en: Entry): Option[AttributeReference] =
      vAttr.get(en.viewCol.toLowerCase(Locale.ROOT))

    /** avg over the view: re-derive from the exact (slot, nn) pair —
      * used by the ROLLUP shape, where the per-group derived double
      * cannot be averaged again. */
    def rollupAvg(en: Entry): Option[Expression] = {
      val scale = en.extra.toInt
      for {
        slot <- vAttr.get(s"${en.viewCol.toLowerCase(Locale.ROOT)}__slot")
        nn <- vAttr.get(s"${en.viewCol.toLowerCase(Locale.ROOT)}__nn")
      } yield {
        val sumSlot = Sum(slot).toAggregateExpression()
        val sumNn = Sum(nn).toAggregateExpression()
        val num =
          if (scale == 0) Cast(sumSlot, DoubleType)
          else Divide(Cast(sumSlot, DoubleType),
            Literal(math.pow(10.0, scale.toDouble)))
        If(EqualTo(Cast(sumNn, LongType), Literal(0L)),
          Literal.create(null, DoubleType),
          Divide(num, Cast(sumNn, DoubleType)))
      }
    }

    def mapAgg(ae: AggregateExpression): Option[Expression] = {
      if (ae.filter.nonEmpty) return None
      ae.aggregateFunction match {
        case c: Count if ae.isDistinct && c.children.size == 1 =>
          if (!exact) None // per-key distinct counts are not additive
          else entryFor(Set("distinct"), c.children.head).flatMap(viewCol)
        case c: Count if !ae.isDistinct =>
          val rowCount = c.children match {
            case Seq(Literal(v, _)) => v != null
            case _ => false
          }
          if (!rowCount) None
          else if (exact) vAttr.get("cnt")
          else vAttr.get("cnt").map(a => Sum(a).toAggregateExpression())
        case s: Sum if !ae.isDistinct =>
          entryFor(Set("sum", "sumd"), s.child).flatMap { en =>
            if (exact) viewCol(en)
            else viewCol(en).map(a => Sum(a).toAggregateExpression())
          }
        case m: Min =>
          entryFor(Set("min"), m.child).flatMap { en =>
            if (exact) viewCol(en)
            else viewCol(en).map(a => Min(a).toAggregateExpression())
          }
        case m: Max =>
          entryFor(Set("max"), m.child).flatMap { en =>
            if (exact) viewCol(en)
            else viewCol(en).map(a => Max(a).toAggregateExpression())
          }
        case a: Average if !ae.isDistinct =>
          entryFor(Set("avg"), a.child).flatMap { en =>
            if (exact) viewCol(en) else rollupAvg(en)
          }
        case _ => None
      }
    }

    def mapTop(e: Expression): Option[Expression] = e match {
      case a: AttributeReference
          if gNames.contains(a.name.toLowerCase(Locale.ROOT)) =>
        vAttr.get(a.name.toLowerCase(Locale.ROOT))
      case ae: AggregateExpression => mapAgg(ae)
      case l: Literal => Some(l)
      case _ => None
    }

    val mapped: Seq[NamedExpression] = agg.aggregateExpressions.map { ne =>
      val out = ne.toAttribute
      val inner = ne match {
        case Alias(child, _) => child
        case other => other
      }
      val m0 = mapTop(inner) match {
        case Some(m) => m
        case None => return None
      }
      val m1 =
        if (m0.dataType == out.dataType) m0
        else (m0.dataType, out.dataType) match {
          // a decomposed decimal sum is maintained at precision 38;
          // the query's native sum type is p+10 — same scale, and a
          // value that overflows the narrower type nulls exactly as
          // the native overflow would
          case (a: DecimalType, b: DecimalType) if a.scale == b.scale =>
            Cast(m0, b)
          case _ => return None
        }
      val m2 = if (!out.nullable && m1.nullable) KnownNotNull(m1) else m1
      Alias(m2, out.name)(exprId = out.exprId, qualifier = out.qualifier,
        explicitMetadata = Some(out.metadata))
    }

    if (exact) Some(Project(mapped, viewRel))
    else {
      val groupAttrs: Seq[Expression] = gNames.map(vAttr(_))
      Some(Aggregate(groupAttrs, mapped, viewRel, None))
    }
  }

  /** Canonical rendering with attribute ids stripped: two expressions
    * over the same base schema that render identically are the same
    * function of the row. */
  private def norm(e: Expression): String =
    e.transform {
      case a: AttributeReference =>
        UnresolvedAttribute(Seq(a.name.toLowerCase(Locale.ROOT)))
    }.sql.toLowerCase(Locale.ROOT)

  // stored-expr normal forms memoized per (base schema, sql): the rule
  // runs per analyzer fixpoint iteration on every aggregate query, and
  // re-analyzing the candidate view's stored expressions each time
  // would tax exactly the hot path the rewrite accelerates
  private val normCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String, Boolean), String]()

  private def normStored(spark: SparkSession, rel: DataSourceV2Relation,
      sql: String, asFilter: Boolean = false): String =
    normCache.computeIfAbsent((rel.table.schema().toDDL, sql, asFilter), _ => {
      val empty = spark.createDataFrame(new java.util.ArrayList[Row](),
        rel.table.schema())
      val fexpr = org.apache.spark.sql.functions.expr(sql)
      if (asFilter)
        PlanBridge.analyzedPlan(empty.filter(fexpr)) match {
          case Filter(cond, _) => norm(cond)
          case other => norm(other.expressions.head)
        }
      else PlanBridge.analyzedPlan(empty.select(fexpr)) match {
        case Project(list, _) => list.head match {
          case Alias(c, _) => norm(c)
          case o => norm(o)
        }
        case other => norm(other.expressions.head)
      }
    })
}
