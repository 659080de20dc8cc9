package graft.lake.sql

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.{ParseException, ParserInterface}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.connector.catalog.{CatalogNotFoundException, Identifier, TableCatalog}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{DataType, StructType}

import graft.lake.{LakeTable, PartitionField}

/** The partition-transform mini-language shared by `CALL
  * system.evolve_spec(...)` and `ALTER TABLE ... ADD/DROP PARTITION
  * FIELD`: `bucket(4, c1)`, `truncate(2, c2)`, `year(ts)` / `month` /
  * `day` / `hour`, or a bare column name for identity. */
private[sql] object SpecDsl {

  /** Split on top-level commas only (transform args keep theirs). */
  def splitTop(s: String): Seq[String] = {
    val out = scala.collection.mutable.Buffer.empty[String]
    var depth = 0
    val sb = new StringBuilder
    s.foreach {
      case '(' => depth += 1; sb += '('
      case ')' => depth -= 1; sb += ')'
      case ',' if depth == 0 => out += sb.toString; sb.clear()
      case ch => sb += ch
    }
    if (sb.nonEmpty) out += sb.toString
    out.map(_.trim).filter(_.nonEmpty).toSeq
  }

  private val call = """(\w+)\s*\(([^)]*)\)""".r

  /** Strip one layer of backtick quoting — the same treatment branch
    * names and WRITE ORDERED BY columns get; without it
    * `ADD PARTITION FIELD \`region\`` failed against a real column. */
  private def unquoteId(s: String): String =
    if (s.length >= 2 && s.startsWith("`") && s.endsWith("`"))
      s.substring(1, s.length - 1)
    else s

  def parseField(s: String): PartitionField = s.trim match {
    case call(fn, inner) =>
      def twoArg: (Int, String) = inner.split(',').map(_.trim) match {
        case Array(n, col) if n.nonEmpty && n.forall(_.isDigit) =>
          (n.toInt, unquoteId(col))
        case _ => throw new IllegalArgumentException(
          s"$fn takes (width, column), got '$inner'")
      }
      fn.toLowerCase match {
        case "bucket" =>
          val (n, col) = twoArg; PartitionField(col, s"bucket[$n]")
        case "truncate" =>
          val (n, col) = twoArg; PartitionField(col, s"truncate[$n]")
        case t @ ("year" | "month" | "day" | "hour") =>
          PartitionField(unquoteId(inner.trim), t)
        case other => throw new IllegalArgumentException(
          s"unknown partition transform '$other' " +
            "(identity, bucket, truncate, year, month, day, hour)")
      }
    case ident => PartitionField(unquoteId(ident), "identity")
  }
}

/** Session parser handling Iceberg's spec-evolution DDL, which Spark's
  * grammar lacks:
  *
  * {{{
  *   ALTER TABLE t ADD PARTITION FIELD bucket(4, c1)
  *   ALTER TABLE t DROP PARTITION FIELD bucket(4, c1)
  * }}}
  *
  * Everything else delegates verbatim. The statement routes to
  * [[LakeTable.evolveSpec]] — the same metadata-only commit as `CALL
  * system.evolve_spec`, appending to / removing from the CURRENT spec
  * (evolve_spec replaces it wholesale). Existing files keep pruning
  * under the spec that derived their partition values, so the DDL never
  * rewrites data. */
class LakeSqlParser(delegate: ParserInterface) extends ParserInterface {

  import LakeSqlParser._

  override def parsePlan(sqlText: String): LogicalPlan = {
    // custom-DDL patterns anchor on whitespace; a leading SQL comment
    // would silently punt valid lake DDL to the delegate (which lacks
    // the grammar and throws an opaque syntax error). Matching runs on
    // the comment-stripped text; delegation keeps the ORIGINAL.
    val matchable = LakeSqlParser.stripLeadingComments(sqlText)
    matchable match {
    case AddField(table, field) =>
      LakeAlterPartitionFieldCommand(
        delegate.parseMultipartIdentifier(table), add = true, field.trim)
    case DropField(table, field) =>
      LakeAlterPartitionFieldCommand(
        delegate.parseMultipartIdentifier(table), add = false, field.trim)
    case CreateRef(table, kind, ine, ref, asOf, retainDays) =>
      LakeRefDdlCommand(delegate.parseMultipartIdentifier(table),
        create = true, kind.toLowerCase, unquote(ref), ifClause = ine != null,
        asOfVersion = Option(asOf).map(_.toLong),
        retainDays = Option(retainDays).map(_.toLong))
    case DropRef(table, kind, ie, ref) =>
      LakeRefDdlCommand(delegate.parseMultipartIdentifier(table),
        create = false, kind.toLowerCase, unquote(ref), ifClause = ie != null,
        asOfVersion = None, retainDays = None)
    case WriteOrdered(table, kind, cols) =>
      val parsed = cols.split(',').map(c => unquote(c.trim))
        .filter(_.nonEmpty).toSeq
      // a degenerate list (`ORDERED BY ,`) must not silently behave as
      // WRITE UNORDERED and clear the existing sort order
      if (parsed.isEmpty) throw new IllegalArgumentException(
        s"WRITE ORDERED BY needs at least one column, got '$cols'")
      LakeWriteOrderCommand(delegate.parseMultipartIdentifier(table),
        zorder = kind.trim.toUpperCase.startsWith("Z"),
        cols = parsed)
    case WriteUnordered(table) =>
      LakeWriteOrderCommand(delegate.parseMultipartIdentifier(table),
        zorder = false, cols = Nil)
    case CreateMatView(table, query) =>
      LakeCreateMaterializedViewCommand(
        delegate.parseMultipartIdentifier(table), query)
    // view DDL rides Spark's own grammar; the post-parse rewrite
    // re-targets statements naming a lake catalog onto the ViewCatalog
    // commands (shape-only match — see LakeViewDdl.rewrite)
    case _ => LakeViewDdl.rewrite(delegate.parsePlan(sqlText))
    }
  }

  private def unquote(s: String): String =
    if (s.startsWith("`") && s.endsWith("`")) s.substring(1, s.length - 1) else s

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
}

object LakeSqlParser {
  /** Drop leading `--` line comments and `/* */` block comments (plus
    * surrounding whitespace) for PATTERN MATCHING only — the delegate
    * still parses the original text, comments and all. */
  private[sql] def stripLeadingComments(sql: String): String = {
    var s = sql
    var changed = true
    while (changed) {
      val t = s.replaceFirst("(?s)^\\s*(--[^\\n]*(\\n|$)|/\\*.*?\\*/)", "")
      changed = t != s
      s = t
    }
    s
  }

  // Table identifier: one flat character class — NEVER a nested
  // quantifier like ((?:`[^`]+`|[\w.]+)+). That shape backtracks
  // exponentially when a statement matches the prefix but not the
  // keyword tail (`ALTER TABLE long_name ADD COLUMNS ...`): every
  // failed match re-split the identifier 2^n ways and a ~35-char name
  // froze the session. This parser sees EVERY statement, so its
  // patterns must fail in linear time; the identifier's real parse
  // belongs to parseMultipartIdentifier anyway.
  private val Tbl = """([\w.`]+)"""
  private val AddField =
    s"""(?is)\\s*ALTER\\s+TABLE\\s+$Tbl\\s+ADD\\s+PARTITION\\s+FIELD\\s+(.+?)\\s*;?\\s*""".r
  private val DropField =
    s"""(?is)\\s*ALTER\\s+TABLE\\s+$Tbl\\s+DROP\\s+PARTITION\\s+FIELD\\s+(.+?)\\s*;?\\s*""".r
  // Iceberg's branch/tag DDL: CREATE BRANCH/TAG [IF NOT EXISTS] name
  // [AS OF VERSION n] [RETAIN n DAYS]; DROP BRANCH/TAG [IF EXISTS] name
  private val CreateRef =
    (s"""(?is)\\s*ALTER\\s+TABLE\\s+$Tbl\\s+CREATE\\s+(BRANCH|TAG)\\s+""" +
      """(IF\s+NOT\s+EXISTS\s+)?(`[^`]+`|\w+)""" +
      """(?:\s+AS\s+OF\s+VERSION\s+(\d+))?(?:\s+RETAIN\s+(\d+)\s+DAYS)?\s*;?\s*""").r
  private val DropRef =
    (s"""(?is)\\s*ALTER\\s+TABLE\\s+$Tbl\\s+DROP\\s+(BRANCH|TAG)\\s+""" +
      """(IF\s+EXISTS\s+)?(`[^`]+`|\w+)\s*;?\s*""").r
  // Iceberg's write-order DDL: WRITE ORDERED BY c1, c2 (range-cluster +
  // sort future writes), WRITE ZORDER BY (c1, c2) (multi-dimensional),
  // WRITE UNORDERED (clear)
  private val WriteOrdered =
    (s"""(?is)\\s*ALTER\\s+TABLE\\s+$Tbl\\s+WRITE\\s+""" +
      """(ZORDER(?:ED)?\s+|ORDERED\s+)BY\s+\(?([\w`,\s]+?)\)?\s*;?\s*""").r
  private val WriteUnordered =
    s"""(?is)\\s*ALTER\\s+TABLE\\s+$Tbl\\s+WRITE\\s+UNORDERED\\s*;?\\s*""".r
  // CREATE MATERIALIZED VIEW v AS <query> — the query text parses
  // through Spark's own grammar inside the command; only a trailing
  // semicolon is stripped here
  private val CreateMatView =
    (s"""(?is)\\s*CREATE\\s+MATERIALIZED\\s+VIEW\\s+$Tbl\\s+AS\\s+""" +
      """(.+?)\s*;?\s*""").r
}

/** `ALTER TABLE ... ADD/DROP PARTITION FIELD` as a driver command:
  * resolve the lake table through the session's catalog manager, then
  * commit the evolved spec (current spec ± the parsed field). */
final case class LakeAlterPartitionFieldCommand(
    tableParts: Seq[String], add: Boolean, fieldSql: String)
  extends LeafRunnableCommand {

  override def run(spark: SparkSession): Seq[Row] = {
    val t = LakeAlterPartitionFieldCommand.resolve(spark, tableParts)
    val f = SpecDsl.parseField(fieldSql)
    val cur = t.metadata.spec
    val next =
      if (add) {
        require(!cur.contains(f),
          s"partition field ${f.render} already exists in ${t.name}")
        cur :+ f
      } else {
        require(cur.contains(f),
          s"no partition field ${f.render} in ${t.name} " +
            s"(current: ${cur.map(_.render).mkString(", ")})")
        cur.filterNot(_ == f)
      }
    t.evolveSpec(next)
    Nil
  }
}

/** `ALTER TABLE ... WRITE ORDERED BY / ZORDER BY / UNORDERED` as a
  * driver command on the write-order API: metadata-only; future writes
  * (appends, compaction, CoW rewrites) cluster under the new order.
  * Run `CALL system.rewrite_data_files` after to re-cluster existing
  * data. */
final case class LakeWriteOrderCommand(
    tableParts: Seq[String], zorder: Boolean, cols: Seq[String])
  extends LeafRunnableCommand {

  override def run(spark: SparkSession): Seq[Row] = {
    // a "c1 DESC" token would otherwise reach setWriteOrder as a column
    // named "c1 DESC" and fail blaming a column that exists
    cols.foreach(c => require(!c.exists(_.isWhitespace),
      s"unsupported sort modifier in '$c': WRITE ORDERED BY takes bare " +
        "column names (ASC/DESC/NULLS FIRST|LAST are not supported)"))
    val t = LakeAlterPartitionFieldCommand.resolve(spark, tableParts)
    if (zorder) t.setZOrder(cols: _*)
    else t.setWriteOrder(cols: _*)
    Nil
  }
}

/** `ALTER TABLE ... CREATE/DROP BRANCH/TAG` as a driver command on the
  * ref API: metadata-only pointer commits. CREATE defaults to the
  * current snapshot (`AS OF VERSION` pins another); `RETAIN n DAYS`
  * sets the ref's max age for snapshot expiry. DROP refuses a kind
  * mismatch (dropping a tag with DROP BRANCH would silently remove the
  * wrong protection) unless IF EXISTS-style laxity was asked — kind
  * mismatch still refuses even then, only absence is forgiven. */
final case class LakeRefDdlCommand(
    tableParts: Seq[String], create: Boolean, kind: String, refName: String,
    ifClause: Boolean, asOfVersion: Option[Long], retainDays: Option[Long])
  extends LeafRunnableCommand {

  override def run(spark: SparkSession): Seq[Row] = {
    val t = LakeAlterPartitionFieldCommand.resolve(spark, tableParts)
    val maxAgeMs = retainDays.map(_ * 86400000L)
    if (create) {
      // IF NOT EXISTS forgives only a ref of the SAME kind — an
      // existing TAG under CREATE BRANCH IF NOT EXISTS must still
      // refuse, or the user walks away believing a branch exists
      if (ifClause && t.refs.get(refName).exists(_.kind == kind)) return Nil
      if (kind == "branch")
        t.createBranch(refName, asOfVersion.getOrElse(-1L), maxAgeMs)
      else
        t.createTag(refName,
          asOfVersion.getOrElse(t.currentSnapshotId), maxAgeMs)
    } else {
      t.refs.get(refName) match {
        case None =>
          if (!ifClause) throw new IllegalArgumentException(
            s"no $kind '$refName' on ${t.name}")
        case Some(r) =>
          require(r.kind == kind,
            s"ref '$refName' of ${t.name} is a ${r.kind}, not a $kind")
          t.dropRef(refName)
      }
    }
    Nil
  }
}

object LakeAlterPartitionFieldCommand {
  /** Multipart name → the live [[LakeTable]] behind it: explicit
    * catalog prefix when the first part names one, else the session's
    * current catalog + namespace. */
  private[sql] def resolve(spark: SparkSession, parts: Seq[String]): LakeTable = {
    val cm = spark.sessionState.catalogManager
    val (catalog, ident) = parts match {
      case Seq(single) =>
        (cm.currentCatalog, Identifier.of(cm.currentNamespace, single))
      case _ =>
        try (cm.catalog(parts.head),
          Identifier.of(parts.tail.init.toArray, parts.last))
        catch { case _: CatalogNotFoundException =>
          (cm.currentCatalog, Identifier.of(parts.init.toArray, parts.last))
        }
    }
    catalog match {
      case tc: TableCatalog => tc.loadTable(ident) match {
        case lt: LakeSqlTable => lt.lakeTable
        case other => throw new UnsupportedOperationException(
          s"${parts.mkString(".")} is not a lake table " +
            s"(got ${other.getClass.getSimpleName}); " +
            "ALTER TABLE ... PARTITION FIELD applies to lake tables only")
      }
      case other => throw new UnsupportedOperationException(
        s"catalog ${other.name()} is not a TableCatalog")
    }
  }
}
