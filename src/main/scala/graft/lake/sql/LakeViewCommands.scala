package graft.lake.sql

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedIdentifier, UnresolvedNamespace, UnresolvedRelation, UnresolvedSubqueryColumnAliases}
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.{CreateView, DropView, LogicalPlan, Project, ShowViews, SubqueryAlias, UnresolvedWith}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.{CatalogNotFoundException, Identifier, ViewInfo}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.graftbridge.PlanBridge

/** SQL views on the lake catalog, end-to-end.
  *
  * Spark 4 ships the DSv2 [[org.apache.spark.sql.connector.catalog.ViewCatalog]]
  * interface but its SQL layer never calls it — view DDL routes to the
  * v1 session catalog only. The bridge is the same extension shape
  * Iceberg's Spark runtime uses: the injected session parser rewrites
  * CREATE/DROP/SHOW VIEW statements whose target names a lake catalog
  * onto driver commands against the ViewCatalog API, and
  * [[LakeViewResolution]] (an injected resolution rule) substitutes a
  * SELECT over a lake view with its stored SQL — parsed, re-qualified
  * into the DEFINER's catalog.namespace context, and projected through
  * the stored column names — before the analyzer would otherwise fail
  * the relation lookup.
  *
  * Scale shape: a view is pure metadata (one small JSON doc per
  * definition history); resolution adds one catalog read per reference
  * and the substituted plan optimizes exactly like the inlined query —
  * filters push through the view boundary into manifest pruning like
  * any subquery. */
object LakeViewDdl {

  /** Multipart name → (catalog, catalogName, ns, viewName) when the
    * name targets a LakeSqlCatalog — explicit 3-part prefix, or the
    * session's current catalog for shorter names. None = not ours;
    * the statement proceeds untouched. */
  private[sql] def lakeFor(parts: Seq[String])
      : Option[(LakeSqlCatalog, String, String, String)] = {
    val s = SparkSession.active
    val cm = s.sessionState.catalogManager
    def asLake(name: String): Option[LakeSqlCatalog] =
      try cm.catalog(name) match {
        case l: LakeSqlCatalog => Some(l)
        case _ => None
      } catch { case _: CatalogNotFoundException => None }
    parts match {
      case Seq(cat, ns, v) => asLake(cat).map(l => (l, cat, ns, v))
      case Seq(ns, v) => cm.currentCatalog match {
        case l: LakeSqlCatalog => Some((l, l.name, ns, v))
        case _ => None
      }
      case Seq(v) => cm.currentCatalog match {
        case l: LakeSqlCatalog if cm.currentNamespace.length == 1 =>
          Some((l, l.name, cm.currentNamespace.head, v))
        case _ => None
      }
      case _ => None
    }
  }

  private[sql] def catalogOf(spark: SparkSession, name: String): LakeSqlCatalog =
    spark.sessionState.catalogManager.catalog(name) match {
      case l: LakeSqlCatalog => l
      case other => throw new IllegalStateException(
        s"catalog $name is no longer a lake catalog (${other.getClass.getName})")
    }

  /** Post-parse rewrite: view DDL whose identifier targets a lake
    * catalog becomes a lake command; everything else passes through.
    * Runs on EVERY parsed statement, so the matches are shape-only
    * (three node types) — no string work. */
  def rewrite(plan: LogicalPlan): LogicalPlan = plan match {
    case cv @ CreateView(UnresolvedIdentifier(parts, _), userCols, comment, _,
        props, originalText, query, allowExisting, replace, _) =>
      lakeFor(parts) match {
        case Some((_, cat, ns, name)) =>
          LakeCreateViewCommand(cat, ns, name, userCols, comment, props,
            originalText.getOrElse(throw new IllegalArgumentException(
              s"CREATE VIEW $cat.$ns.$name: missing SQL text")),
            query, allowExisting, replace)
        case None => cv
      }
    case dv @ DropView(UnresolvedIdentifier(parts, _), ifExists) =>
      lakeFor(parts) match {
        case Some((_, cat, ns, name)) =>
          LakeDropViewCommand(cat, ns, name, ifExists)
        case None => dv
      }
    case sv @ ShowViews(UnresolvedNamespace(parts, _), pattern, output) =>
      // SHOW VIEWS IN cat.ns — parts = [cat, ns] (or [ns] / [] under a
      // current lake catalog)
      val target = parts match {
        case Seq(cat, ns) => lakeFor(Seq(cat, ns, "?")).map { case (l, c, _, _) => (l, c, ns) }
        case Seq(ns) => lakeFor(Seq(ns, "?")).map { case (l, c, n, _) => (l, c, n) }
        case Seq() =>
          val cm = SparkSession.active.sessionState.catalogManager
          cm.currentCatalog match {
            case l: LakeSqlCatalog if cm.currentNamespace.length == 1 =>
              Some((l, l.name, cm.currentNamespace.head))
            case _ => None
          }
        case _ => None
      }
      target match {
        case Some((_, cat, ns)) => LakeShowViewsCommand(cat, ns, pattern, output)
        case None => sv
      }
    // DESCRIBE / SHOW CREATE TABLE target UnresolvedTableOrView — not
    // UnresolvedRelation — so the read-substitution rule never sees
    // them; route to view commands when the name IS a lake view (one
    // metadata read at parse time; a table name passes through to
    // Spark's own path untouched)
    case d @ org.apache.spark.sql.catalyst.plans.logical.DescribeRelation(
        tv: org.apache.spark.sql.catalyst.analysis.UnresolvedTableOrView,
        partitionSpec, isExtended, output) if partitionSpec.isEmpty =>
      lakeFor(tv.multipartIdentifier) match {
        case Some((l, cat, ns, name))
            if l.viewExists(Identifier.of(Array(ns), name)) =>
          LakeDescribeViewCommand(cat, ns, name, isExtended, output)
        case _ => d
      }
    case sc @ org.apache.spark.sql.catalyst.plans.logical.ShowCreateTable(
        tv: org.apache.spark.sql.catalyst.analysis.UnresolvedTableOrView,
        _, output) =>
      lakeFor(tv.multipartIdentifier) match {
        case Some((l, cat, ns, name))
            if l.viewExists(Identifier.of(Array(ns), name)) =>
          LakeShowCreateViewCommand(cat, ns, name, output)
        case _ => sc
      }
    case sp @ org.apache.spark.sql.catalyst.plans.logical.SetViewProperties(
        child: org.apache.spark.sql.catalyst.analysis.UnresolvedView, props) =>
      lakeFor(child.multipartIdentifier) match {
        case Some((_, cat, ns, name)) =>
          LakeAlterViewPropsCommand(cat, ns, name, set = props, unset = Nil,
            ifExists = false)
        case None => sp
      }
    case up @ org.apache.spark.sql.catalyst.plans.logical.UnsetViewProperties(
        child: org.apache.spark.sql.catalyst.analysis.UnresolvedView, keys, ifExists) =>
      lakeFor(child.multipartIdentifier) match {
        case Some((_, cat, ns, name)) =>
          LakeAlterViewPropsCommand(cat, ns, name, set = Map.empty, unset = keys,
            ifExists = ifExists)
        case None => up
      }
    case other => other
  }

  /** Relations inside stored view SQL resolve in the DEFINER's context:
    * 1/2-part names get the stored catalog/namespace prepended (3-part
    * names already say where they live). CTE-defined names must NOT be
    * qualified — they are plan-local. */
  private[sql] def qualifyRelations(plan: LogicalPlan, cat: String,
      ns: Seq[String]): LogicalPlan = {
    val cteNames: Set[String] = plan.collectWithSubqueries {
      case w: UnresolvedWith => w.cteRelations.map(_._1.toLowerCase)
    }.flatten.toSet
    plan.transformUpWithSubqueries {
      case r: UnresolvedRelation if r.multipartIdentifier.length < 3 =>
        r.multipartIdentifier match {
          case Seq(one) if cteNames.contains(one.toLowerCase) => r
          case Seq(one) => r.copy(multipartIdentifier = (cat +: ns) :+ one)
          case two => r.copy(multipartIdentifier = cat +: two)
        }
    }
  }
}

/** CREATE [OR REPLACE] VIEW on a lake catalog: analyze the query NOW
  * (in the definer's session — that is the context the stored SQL must
  * mean), snapshot its schema + output names, and commit the
  * definition document through the ViewCatalog API (CAS append to the
  * version log on REPLACE). */
final case class LakeCreateViewCommand(
    catName: String, ns: String, name: String,
    userCols: Seq[(String, Option[String])],
    comment: Option[String],
    properties: Map[String, String],
    originalText: String,
    query: LogicalPlan,
    allowExisting: Boolean,
    replace: Boolean) extends LeafRunnableCommand {

  override def innerChildren: Seq[org.apache.spark.sql.catalyst.plans.QueryPlan[_]] =
    Seq(query)

  override def run(spark: SparkSession): Seq[Row] = {
    val cat = LakeViewDdl.catalogOf(spark, catName)
    val ident = Identifier.of(Array(ns), name)
    val cm = spark.sessionState.catalogManager
    if (replace) {
      // a direct self-reference would re-substitute forever at read
      // time (the analyzer's max-iterations error is unhelpfully far
      // from the cause) — refuse it here, where the name is known
      val self = query.collectWithSubqueries {
        case r: UnresolvedRelation =>
          val p = r.multipartIdentifier
          val full = p match {
            case Seq(one) => Seq(cm.currentCatalog.name) ++ cm.currentNamespace :+ one
            case Seq(a, b) => Seq(cm.currentCatalog.name, a, b)
            case other => other
          }
          full.map(_.toLowerCase) == Seq(catName, ns, name).map(_.toLowerCase)
      }
      if (self.contains(true)) throw new IllegalArgumentException(
        s"CREATE OR REPLACE VIEW $catName.$ns.$name: the new definition " +
          "references the view itself (cyclic view reference)")
    }
    val df = PlanBridge.ofRows(spark, query)
    val schema = df.schema
    require(userCols.isEmpty || userCols.size == schema.fields.length,
      s"CREATE VIEW $catName.$ns.$name: ${userCols.size} column aliases for " +
        s"${schema.fields.length} query columns")
    val props = properties ++ comment.map("comment" -> _)
    val info = new ViewInfo(ident, originalText, cm.currentCatalog.name,
      cm.currentNamespace, schema, schema.fieldNames,
      userCols.map(_._1).toArray, userCols.map(_._2.getOrElse("")).toArray,
      props.asJava)
    if (replace) cat.replaceView(info, true)
    else if (allowExisting && cat.viewExists(ident)) ()
    else cat.createView(info)
    Nil
  }
}

final case class LakeDropViewCommand(
    catName: String, ns: String, name: String, ifExists: Boolean)
  extends LeafRunnableCommand {

  override def run(spark: SparkSession): Seq[Row] = {
    val cat = LakeViewDdl.catalogOf(spark, catName)
    val dropped = cat.dropView(Identifier.of(Array(ns), name))
    if (!dropped && !ifExists)
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchViewException(
        Identifier.of(Array(ns), name))
    Nil
  }
}

/** ALTER VIEW … SET/UNSET TBLPROPERTIES through the ViewCatalog's
  * alterView (CAS-appended like every view mutation). UNSET without IF
  * EXISTS refuses a missing key, matching Spark's session-catalog
  * semantics. */
final case class LakeAlterViewPropsCommand(
    catName: String, ns: String, name: String,
    set: Map[String, String], unset: Seq[String], ifExists: Boolean)
  extends LeafRunnableCommand {

  override def run(spark: SparkSession): Seq[Row] = {
    val cat = LakeViewDdl.catalogOf(spark, catName)
    val ident = Identifier.of(Array(ns), name)
    if (unset.nonEmpty && !ifExists) {
      val have = cat.loadView(ident).properties
      val missing = unset.filterNot(have.containsKey)
      require(missing.isEmpty,
        s"ALTER VIEW $catName.$ns.$name UNSET TBLPROPERTIES: " +
          s"missing keys ${missing.mkString(", ")} (use IF EXISTS)")
    }
    val changes =
      set.map { case (k, v) =>
        org.apache.spark.sql.connector.catalog.ViewChange.setProperty(k, v) }.toSeq ++
        unset.map(org.apache.spark.sql.connector.catalog.ViewChange.removeProperty)
    cat.alterView(ident, changes: _*)
    Nil
  }
}

/** DESCRIBE [EXTENDED] on a lake view: the stored schema's columns
  * (with stored column comments when the definition carried a column
  * list), plus the view-specific detail block under EXTENDED. */
final case class LakeDescribeViewCommand(
    catName: String, ns: String, name: String, isExtended: Boolean,
    override val output: Seq[Attribute]) extends LeafRunnableCommand {

  override def run(spark: SparkSession): Seq[Row] = {
    val cat = LakeViewDdl.catalogOf(spark, catName)
    val v = cat.loadView(Identifier.of(Array(ns), name))
    val aliases = v.columnAliases
    val comments = v.columnComments
    val cols = v.schema.fields.zipWithIndex.map { case (f, i) =>
      val colName = if (aliases.nonEmpty) aliases(i) else f.name
      val comment = if (comments.nonEmpty && comments(i).nonEmpty) comments(i) else null
      Row(colName, f.dataType.simpleString, comment)
    }.toSeq
    if (!isExtended) cols
    else cols ++ Seq(
      Row("", "", ""),
      Row("# Detailed View Information", "", ""),
      Row("Name", v.name, ""),
      Row("View Text", v.query, ""),
      Row("View Catalog and Namespace",
        (v.currentCatalog +: v.currentNamespace.toSeq).mkString("."), ""),
      Row("View Query Output Columns", v.queryColumnNames.mkString("[", ", ", "]"), ""))
  }
}

/** SHOW CREATE TABLE on a lake view: a re-runnable CREATE VIEW
  * statement from the stored definition. */
final case class LakeShowCreateViewCommand(
    catName: String, ns: String, name: String,
    override val output: Seq[Attribute]) extends LeafRunnableCommand {

  override def run(spark: SparkSession): Seq[Row] = {
    val cat = LakeViewDdl.catalogOf(spark, catName)
    val v = cat.loadView(Identifier.of(Array(ns), name))
    val colList =
      if (v.columnAliases.isEmpty) ""
      else v.columnAliases.mkString(" (", ", ", ")")
    Seq(Row(s"CREATE VIEW $catName.$ns.$name$colList AS\n${v.query}"))
  }
}

/** SHOW VIEWS [IN cat.ns] [LIKE 'pattern'] — pattern uses Spark's SHOW
  * convention (`*` any sequence, `|` alternation). */
final case class LakeShowViewsCommand(
    catName: String, ns: String, pattern: Option[String],
    override val output: Seq[Attribute]) extends LeafRunnableCommand {

  override def run(spark: SparkSession): Seq[Row] = {
    val cat = LakeViewDdl.catalogOf(spark, catName)
    val names = cat.listViews(ns).map(_.name).toSeq
    val kept = pattern match {
      case Some(p) =>
        val rx = p.toLowerCase.split("\\|").map(_.replace("*", ".*"))
          .mkString("(", "|", ")")
        names.filter(_.toLowerCase.matches(rx))
      case None => names
    }
    kept.sorted.map(v => Row(ns, v, false))
  }
}

/** Resolution rule: a still-unresolved relation that names a view in a
  * lake catalog becomes its stored SQL — parsed, re-qualified to the
  * definer's context ([[LakeViewDdl.qualifyRelations]]), projected
  * through the captured output names (schema binding: a column the
  * underlying tables dropped fails analysis HERE, a column they gained
  * never leaks in), and aliased when the definition carried a column
  * list. Runs after Spark's own table resolution in the same fixed
  * point, so real tables and temp views always win first; nested views
  * resolve on subsequent iterations. */
object LakeViewResolution extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case u @ UnresolvedRelation(parts, _, false) =>
      LakeViewDdl.lakeFor(parts) match {
        case Some((cat, _, ns, name))
            if cat.viewExists(Identifier.of(Array(ns), name)) =>
          substitute(cat, ns, name)
        case _ => u
      }
  }

  private def substitute(cat: LakeSqlCatalog, ns: String,
      name: String): LogicalPlan = {
    val doc = cat.lakeCatalog.loadView(ns, name).getOrElse(
      return UnresolvedRelation(Seq(cat.name, ns, name))) // dropped concurrently
    val v = doc.current
    val parsed = SparkSession.active.sessionState.sqlParser.parsePlan(v.sql)
    // the analyzer's Substitution batch (which inlines WITH clauses)
    // already ran before this rule fires, so a CTE inside stored view
    // SQL must be substituted HERE or its references dangle — the same
    // manual CTESubstitution pass Spark applies to nested view text
    val qualified = org.apache.spark.sql.catalyst.analysis.CTESubstitution(
      LakeViewDdl.qualifyRelations(parsed, v.currentCatalog, v.currentNamespace))
    // duplicate output names cannot be re-projected by name; fall back
    // to the raw plan (aliases, when present, still rename positionally)
    val named =
      if (v.queryColumnNames.nonEmpty &&
          v.queryColumnNames.distinct.size == v.queryColumnNames.size)
        Project(v.queryColumnNames.map(n => UnresolvedAttribute.quoted(n)), qualified)
      else qualified
    val aliased =
      if (v.columnAliases.nonEmpty)
        UnresolvedSubqueryColumnAliases(v.columnAliases, named)
      else named
    SubqueryAlias(name, aliased)
  }
}
