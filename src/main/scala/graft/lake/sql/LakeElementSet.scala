package graft.lake.sql

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.parser.{ParseException, ParserInterface}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.types._

/** `lake_element_set(col, key, v[, upsert])` — rebuild an ARRAY or MAP
  * column with one element replaced, the engine's whole-column answer
  * to Iceberg-style `UPDATE … SET tags[2] = v` / `SET m['k'] = v`
  * (which Spark's grammar cannot even parse as an assignment key; see
  * [[ElementAssignmentParser]] for the syntax sugar that lowers onto
  * this function).
  *
  * Dispatch is on the COLUMN's resolved type, not the key literal's —
  * an integer key against `map<int, _>` is a map update, against
  * `array<_>` an element replace — via [[RuntimeReplaceable]]: the
  * replacement composes only stock codegen'd collection expressions
  * (`transform` / `map_entries` / `map_from_entries`), so the rebuild
  * runs wholly inside whole-stage codegen like any built-in.
  *
  * Semantics (mirrored by the struct-path `UpdateFields` rules):
  *  - NULL collection stays NULL; nothing is invented from nothing.
  *  - Array: 0-based index; OUT-OF-BOUNDS index is a row-preserving
  *    no-op (no element matches the transform's index guard — never a
  *    runtime error, unlike ANSI `arr[i]`).
  *  - Map with `upsert` (the default, what `m['k'] = v` means): a
  *    present key's entry is replaced IN PLACE, preserving entry
  *    order — deterministic output; an absent key appends its entry.
  *  - Map with `upsert = false` (deep paths, `m['k'].f = v`): update
  *    only — an absent key leaves the map untouched, because the value
  *    expression descends into the OLD entry value, which must exist.
  *    The value expression is evaluated ONLY under the key/index match
  *    guard, so deep rewrites may extract `m['k']` / `arr[i]` safely
  *    under ANSI.
  */
case class LakeElementSet(col: Expression, key: Expression,
    value: Expression, upsert: Boolean)
    extends Expression with RuntimeReplaceable {

  override def children: Seq[Expression] = Seq(col, key, value)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    col.dataType match {
      case ArrayType(_, _) =>
        if (Seq[DataType](ByteType, ShortType, IntegerType, LongType)
            .contains(key.dataType)) TypeCheckSuccess
        else TypeCheckFailure(
          s"array index must be integral, got ${key.dataType.sql}")
      case MapType(kt, _, _) =>
        if (key.dataType == kt || Cast.canUpCast(key.dataType, kt))
          TypeCheckSuccess
        else TypeCheckFailure(
          s"map key type ${key.dataType.sql} does not fit ${kt.sql}")
      case other => TypeCheckFailure(
        s"lake_element_set needs an ARRAY or MAP column, got ${other.sql}")
    }
  }

  private def fit(e: Expression, t: DataType): Expression =
    if (e.dataType == t) e else Cast(e, t)

  override lazy val replacement: Expression = col.dataType match {
    case ArrayType(et, cn) =>
      val x = NamedLambdaVariable("__lake_x", et, cn)
      val i = NamedLambdaVariable("__lake_i", IntegerType, nullable = false)
      ArrayTransform(col, LambdaFunction(
        If(EqualTo(i, fit(key, IntegerType)), fit(value, et), x), Seq(x, i)))
    case MapType(kt, vt, _) =>
      val k = fit(key, kt)
      val entryType = StructType(Seq(
        StructField("key", kt, nullable = false),
        StructField("value", vt)))
      val e = NamedLambdaVariable("__lake_e", entryType, nullable = false)
      def entry(v: Expression) = CreateNamedStruct(Seq(
        Literal("key"), k, Literal("value"), v))
      val replaced = MapFromEntries(ArrayTransform(MapEntries(col),
        LambdaFunction(
          If(EqualTo(GetStructField(e, 0, Some("key")), k),
            entry(fit(value, vt)), e),
          Seq(e))))
      if (upsert) {
        val appended = MapFromEntries(Concat(Seq(MapEntries(col),
          CreateArray(Seq(entry(fit(value, vt)))))))
        If(IsNull(col), col,
          If(ArrayContains(MapKeys(col), k), replaced, appended))
      } else If(IsNull(col), col, replaced)
    case other => throw new UnsupportedOperationException(
      s"lake_element_set over ${other.sql}")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(col = newChildren(0), key = newChildren(1), value = newChildren(2))
}

object LakeElementSet {
  import org.apache.spark.sql.SparkSessionExtensions

  /** Registers `lake_element_set` and `lake_field_set` as SQL
    * functions — directly usable, and the lowering target of
    * [[ElementAssignmentParser]]. */
  def registerFunctions(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("lake_element_set"),
      new ExpressionInfo(classOf[LakeElementSet].getName, "lake_element_set"),
      (args: Seq[Expression]) => args match {
        case Seq(c, k, v) => LakeElementSet(c, k, v, upsert = true)
        case Seq(c, k, v, Literal(b: Boolean, BooleanType)) =>
          LakeElementSet(c, k, v, upsert = b)
        case _ => throw new IllegalArgumentException(
          "lake_element_set(col, key, value[, upsert_literal])")
      }))
    ext.injectFunction((FunctionIdentifier("lake_field_set"),
      new ExpressionInfo(classOf[LakeElementSet].getName, "lake_field_set"),
      (args: Seq[Expression]) => args match {
        case Seq(s, Literal(n, StringType), v) if n != null =>
          UpdateFields(s, Seq(WithField(n.toString, v)))
        case _ => throw new IllegalArgumentException(
          "lake_field_set(struct, 'field_name_literal', value)")
      }))
  }
}

/** Parser sugar for element-path assignment targets: Spark's grammar
  * restricts UPDATE / MERGE SET keys to multipart identifiers, so
  * `SET tags[2] = v`, `SET m['k'] = v`, `SET recs[0].w = v` are
  * syntax errors the stock parser cannot represent. This delegating
  * parser leaves every successfully-parsing statement UNTOUCHED; only
  * when the delegate throws does it attempt ONE canonicalization —
  * each SET assignment whose key carries a bracket step is lowered
  * onto a whole-root assignment through [[LakeElementSet]] /
  * `lake_field_set`:
  *
  * {{{
  *   SET tags[2] = v      →  SET tags = lake_element_set(tags, 2, (v), true)
  *   SET recs[0].w = v    →  SET recs = lake_element_set(recs, 0,
  *                                lake_field_set((recs)[0], 'w', (v)), false)
  * }}}
  *
  * and re-parses; if the rewrite changes nothing or still fails, the
  * ORIGINAL error surfaces. The scanner is quote- / comment- /
  * depth-aware and CASE-nesting-aware (a `WHEN` inside a value's CASE
  * must not end a MERGE clause region); anything it cannot shape with
  * certainty is left alone. Because the lowering target is a
  * whole-root assignment, two element assignments under one root in a
  * single statement refuse downstream via the canonical
  * duplicate-assignment rule — exactly SQL's constraint. */
class ElementAssignmentParser(delegate: ParserInterface)
    extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    try delegate.parsePlan(sqlText)
    catch {
      case pe: ParseException =>
        ElementAssignmentRewrite.rewrite(sqlText) match {
          case Some(rw) =>
            try delegate.parsePlan(rw)
            catch { case _: ParseException => throw pe }
          case None => throw pe
        }
    }

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

/** The text-level lowering behind [[ElementAssignmentParser]]. Pure
  * function of the SQL text; returns Some(rewritten) only when at
  * least one element-path assignment key was lowered. */
object ElementAssignmentRewrite {

  private sealed trait Step
  private final case class Elem(lit: String) extends Step
  private final case class Fld(name: String) extends Step

  /** Character classes the scanner must not look inside. */
  private def skipOpaque(s: String, i0: Int): Int = {
    var i = i0
    s(i) match {
      case '\'' | '"' =>
        val q = s(i); i += 1
        while (i < s.length && s(i) != q) {
          if (s(i) == '\\' && i + 1 < s.length) i += 2 else i += 1
        }
        if (i < s.length) i + 1 else i
      case '`' =>
        i += 1
        while (i < s.length && s(i) != '`') i += 1
        if (i < s.length) i + 1 else i
      case '-' if i + 1 < s.length && s(i + 1) == '-' =>
        while (i < s.length && s(i) != '\n') i += 1
        i
      case '/' if i + 1 < s.length && s(i + 1) == '*' =>
        i += 2
        while (i + 1 < s.length && !(s(i) == '*' && s(i + 1) == '/')) i += 1
        math.min(i + 2, s.length)
      case _ => i0
    }
  }

  private def isIdentChar(c: Char) =
    c.isLetterOrDigit || c == '_'

  /** Uppercased keyword at position i (i must start an identifier and
    * not be preceded by an identifier char). */
  private def wordAt(s: String, i: Int): Option[(String, Int)] =
    if (i < s.length && (s(i).isLetter || s(i) == '_') &&
      (i == 0 || !isIdentChar(s(i - 1)))) {
      var j = i
      while (j < s.length && isIdentChar(s(j))) j += 1
      Some((s.substring(i, j).toUpperCase(java.util.Locale.ROOT), j))
    } else None

  /** Offsets of top-level (depth-0, non-opaque) SET-region boundaries:
    * each region is (startAfterSet, endExclusive). */
  private def setRegions(s: String): Seq[(Int, Int)] = {
    val out = scala.collection.mutable.ListBuffer.empty[(Int, Int)]
    var i = 0; var depth = 0; var caseDepth = 0
    var regionStart = -1
    def close(end: Int): Unit = if (regionStart >= 0) {
      out += ((regionStart, end)); regionStart = -1
    }
    while (i < s.length) {
      val skipped = skipOpaque(s, i)
      if (skipped != i) i = skipped
      else s(i) match {
        case '(' | '[' => depth += 1; i += 1
        case ')' | ']' => depth -= 1; i += 1
        case _ =>
          wordAt(s, i) match {
            case Some((w, j)) =>
              if (depth == 0) w match {
                case "CASE" => caseDepth += 1
                case "END" if caseDepth > 0 => caseDepth -= 1
                case "SET" if caseDepth == 0 => close(i); regionStart = j
                case "WHERE" | "WHEN" if caseDepth == 0 => close(i)
                case _ => ()
              }
              i = j
            case None => i += 1
          }
      }
    }
    close(s.length)
    out.toSeq
  }

  /** Top-level comma split of a region (paren/bracket + CASE aware). */
  private def splitAssignments(s: String, from: Int, to: Int): Seq[(Int, Int)] = {
    val out = scala.collection.mutable.ListBuffer.empty[(Int, Int)]
    var i = from; var depth = 0; var caseDepth = 0; var start = from
    while (i < to) {
      val skipped = skipOpaque(s, i)
      if (skipped != i) i = skipped
      else s(i) match {
        case '(' | '[' => depth += 1; i += 1
        case ')' | ']' => depth -= 1; i += 1
        case ',' if depth == 0 && caseDepth == 0 =>
          out += ((start, i)); start = i + 1; i += 1
        case _ =>
          wordAt(s, i) match {
            case Some(("CASE", j)) => caseDepth += 1; i = j
            case Some(("END", j)) if caseDepth > 0 => caseDepth -= 1; i = j
            case Some((_, j)) => i = j
            case None => i += 1
          }
      }
    }
    out += ((start, to))
    out.toSeq
  }

  /** First top-level `=` that is an assignment (not <=, >=, !=, <>, ==). */
  private def findAssignEq(s: String, from: Int, to: Int): Int = {
    var i = from; var depth = 0
    while (i < to) {
      val skipped = skipOpaque(s, i)
      if (skipped != i) i = skipped
      else s(i) match {
        case '(' | '[' => depth += 1; i += 1
        case ')' | ']' => depth -= 1; i += 1
        case '=' if depth == 0 =>
          val prev = if (i > from) s(i - 1) else ' '
          val next = if (i + 1 < to) s(i + 1) else ' '
          if (prev != '<' && prev != '>' && prev != '!' && prev != '=' &&
            next != '=') return i
          i += 1
        case _ => i += 1
      }
    }
    -1
  }

  /** Parse an assignment key `root.path[lit]['k'].f…` into the root
    * prefix text (everything before the first bracket — identifiers
    * and dots only) and the step list. None = not element-shaped or
    * not parseable with certainty. */
  private def parseKey(key: String): Option[(String, List[Step])] = {
    val t = key.trim
    val firstBracket = {
      var i = 0; var found = -1
      while (i < t.length && found < 0) {
        val skipped = skipOpaque(t, i)
        if (skipped != i) i = skipped
        else { if (t(i) == '[') found = i; i += 1 }
      }
      found
    }
    if (firstBracket <= 0) return None
    val root = t.substring(0, firstBracket).trim
    // root must be a dotted identifier path (plain or backquoted)
    val rootOk = root.nonEmpty && root.split('.').forall { part =>
      val p = part.trim
      p.nonEmpty && ((p.head == '`' && p.last == '`' && p.length > 2) ||
        p.forall(isIdentChar))
    }
    if (!rootOk) return None
    var i = firstBracket
    val steps = scala.collection.mutable.ListBuffer.empty[Step]
    while (i < t.length) {
      t(i) match {
        case '[' =>
          val close = {
            var j = i + 1; var depth = 1; var found = -1
            while (j < t.length && found < 0) {
              val skipped = skipOpaque(t, j)
              if (skipped != j) j = skipped
              else {
                if (t(j) == '[') depth += 1
                else if (t(j) == ']') { depth -= 1; if (depth == 0) found = j }
                j += 1
              }
            }
            found
          }
          if (close < 0) return None
          val lit = t.substring(i + 1, close).trim
          // certainty gate: a literal only (number or quoted string) —
          // arbitrary index expressions have no static lowering
          val litOk = lit.nonEmpty &&
            (lit.forall(c => c.isDigit || c == '-') ||
              (lit.head == '\'' && lit.last == '\'' && lit.length >= 2))
          if (!litOk) return None
          steps += Elem(lit)
          i = close + 1
        case '.' =>
          var j = i + 1
          if (j < t.length && t(j) == '`') {
            val end = t.indexOf('`', j + 1)
            if (end < 0) return None
            steps += Fld(t.substring(j, end + 1)); i = end + 1
          } else {
            while (j < t.length && isIdentChar(t(j))) j += 1
            if (j == i + 1) return None
            steps += Fld(t.substring(i + 1, j)); i = j
          }
        case c if c.isWhitespace => i += 1
        case _ => return None
      }
    }
    if (steps.isEmpty) None else Some((root, steps.toList))
  }

  private def lower(cur: String, steps: List[Step], value: String): String =
    steps match {
      case Elem(lit) :: Nil =>
        s"lake_element_set($cur, $lit, ($value), true)"
      case Elem(lit) :: rest =>
        s"lake_element_set($cur, $lit, " +
          s"${lower(s"($cur)[$lit]", rest, value)}, false)"
      case Fld(f) :: Nil =>
        s"lake_field_set($cur, '${f.stripPrefix("`").stripSuffix("`")}', ($value))"
      case Fld(f) :: rest =>
        s"lake_field_set($cur, '${f.stripPrefix("`").stripSuffix("`")}', " +
          s"${lower(s"($cur).$f", rest, value)})"
      case Nil => s"($value)"
    }

  def rewrite(sql: String): Option[String] = {
    if (!sql.contains('[')) return None
    val regions = setRegions(sql)
    if (regions.isEmpty) return None
    var changed = false
    val sb = new StringBuilder
    var cursor = 0
    regions.foreach { case (from, to) =>
      sb.append(sql.substring(cursor, from))
      var first = true
      splitAssignments(sql, from, to).foreach { case (aFrom, aTo) =>
        if (!first) sb.append(',')
        first = false
        val eq = findAssignEq(sql, aFrom, aTo)
        val piece = sql.substring(aFrom, aTo)
        if (eq < 0) sb.append(piece)
        else {
          val key = sql.substring(aFrom, eq)
          val value = sql.substring(eq + 1, aTo).trim
          parseKey(key) match {
            case Some((root, steps)) if value.nonEmpty =>
              changed = true
              sb.append(' ').append(root).append(" = ")
                .append(lower(root, steps, value)).append(' ')
            case _ => sb.append(piece)
          }
        }
      }
      cursor = to
    }
    sb.append(sql.substring(cursor))
    if (changed) Some(sb.toString) else None
  }
}
