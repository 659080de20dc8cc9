package graft.lake

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types._

/** Scan-filter expression surface, the analog of the reference's Iceberg
  * `Expressions` (reference: Expressions.alwaysTrue() as ScanReport
  * filter, MicrometerMetricsReporterTest.java:33). Lives ABOVE Catalyst:
  * `mayMatch` prunes whole files against manifest min/max/null stats
  * before a DataFrame exists, then `toColumn` hands the exact same
  * predicate to Spark for row-level filtering and parquet row-group
  * pushdown (SURVEY.md §4).
  *
  * Pruning is conservative: anything not provably false keeps the file.
  */
// Serializable: distributed planFiles ships predicates to executor
// tasks for manifest-entry filtering.
sealed trait LakePredicate extends Serializable {
  def toColumn: Column
  def render: String

  /** False only if NO row in the file can match. Stats are keyed by
    * field ID / spec position, so resolution goes through the table
    * metadata: the CURRENT schema's name→ID map finds the stats old
    * files were written under, which is what keeps pruning exact across
    * column renames without touching a manifest. */
  def mayMatch(f: DataFileEntry, meta: TableMetadata): Boolean

  /** False only if NO entry in the whole manifest can match — judged
    * from the manifest-list rollup ([[ManifestRef.of]]) WITHOUT opening
    * the manifest document, Iceberg's manifest-list skip step. Rollup
    * keys carry the same every-entry proof as file stats, so the same
    * bound tests apply; anything unprovable keeps the manifest. */
  def mayMatchManifest(ref: ManifestRef, meta: TableMetadata): Boolean = true
}

object LakePredicate {
  import Stats.{cmp, toStat}

  case object AlwaysTrue extends LakePredicate {
    def toColumn: Column = lit(true)
    def render = "true"
    def mayMatch(f: DataFileEntry, m: TableMetadata) = true
  }

  /** Matches no row — exact pruning of every file. Encoding this as
    * Not(AlwaysTrue) lost the exactness (Not never prunes), which made
    * `DELETE FROM t WHERE false` rewrite the entire table as a no-op
    * copy-on-write snapshot. */
  case object AlwaysFalse extends LakePredicate {
    def toColumn: Column = lit(false)
    def render = "false"
    def mayMatch(f: DataFileEntry, m: TableMetadata) = false
    override def mayMatchManifest(ref: ManifestRef, m: TableMetadata) = false
  }

  /** A comparison against a NULL literal is never TRUE in SQL, so such
    * predicates match NO rows: mayMatch = false (prune everything —
    * exact, not just conservative), and toStat is never reached with a
    * null (it would NPE). Surfaces via pushed `IN ('F', NULL)` filters
    * from the SQL path and via the Scala API.
    *
    * File- and manifest-level pruning share one bound test
    * ([[boundsMayMatch]]); only the (min, max) source differs. */
  sealed abstract class Comparison(name: String, value: Any)
      extends LakePredicate {
    /** Can ANY value in [mn, mx] satisfy this comparison? */
    protected def boundsMayMatch(mn: String, mx: String, t: DataType): Boolean

    private def resolve(minV: Map[String, String], maxV: Map[String, String],
        meta: TableMetadata): Option[(String, String, DataType)] =
      for {
        key <- meta.statKey(name)
        mn <- minV.get(key)
        mx <- maxV.get(key)
        field <- meta.schema.fields.find(_.name == name)
      } yield (mn, mx, field.dataType)

    def mayMatch(f: DataFileEntry, m: TableMetadata): Boolean =
      value != null && resolve(f.minValues, f.maxValues, m)
        .forall { case (mn, mx, t) => boundsMayMatch(mn, mx, t) }

    override def mayMatchManifest(ref: ManifestRef, m: TableMetadata): Boolean =
      value != null && resolve(ref.minValues, ref.maxValues, m)
        .forall { case (mn, mx, t) => boundsMayMatch(mn, mx, t) }
  }

  final case class Eq(name: String, value: Any) extends Comparison(name, value) {
    def toColumn: Column = col(name) === lit(value)
    def render = s"$name = $value"
    protected def boundsMayMatch(mn: String, mx: String, t: DataType): Boolean =
      cmp(t, toStat(t, value), mn) >= 0 && cmp(t, toStat(t, value), mx) <= 0
  }

  final case class Gt(name: String, value: Any) extends Comparison(name, value) {
    def toColumn: Column = col(name) > lit(value)
    def render = s"$name > $value"
    protected def boundsMayMatch(mn: String, mx: String, t: DataType): Boolean =
      cmp(t, mx, toStat(t, value)) > 0
  }

  final case class Ge(name: String, value: Any) extends Comparison(name, value) {
    def toColumn: Column = col(name) >= lit(value)
    def render = s"$name >= $value"
    protected def boundsMayMatch(mn: String, mx: String, t: DataType): Boolean =
      cmp(t, mx, toStat(t, value)) >= 0
  }

  final case class Lt(name: String, value: Any) extends Comparison(name, value) {
    def toColumn: Column = col(name) < lit(value)
    def render = s"$name < $value"
    protected def boundsMayMatch(mn: String, mx: String, t: DataType): Boolean =
      cmp(t, mn, toStat(t, value)) < 0
  }

  final case class Le(name: String, value: Any) extends Comparison(name, value) {
    def toColumn: Column = col(name) <= lit(value)
    def render = s"$name <= $value"
    protected def boundsMayMatch(mn: String, mx: String, t: DataType): Boolean =
      cmp(t, mn, toStat(t, value)) <= 0
  }

  final case class In(name: String, values: Seq[Any]) extends LakePredicate {
    def toColumn: Column = col(name).isin(values: _*)
    def render = s"$name IN (${values.mkString(",")})"
    def mayMatch(f: DataFileEntry, m: TableMetadata): Boolean =
      values.exists(v => Eq(name, v).mayMatch(f, m))
    override def mayMatchManifest(ref: ManifestRef, m: TableMetadata): Boolean =
      values.exists(v => Eq(name, v).mayMatchManifest(ref, m))
  }

  final case class IsNull(name: String) extends LakePredicate {
    def toColumn: Column = col(name).isNull
    def render = s"$name IS NULL"
    def mayMatch(f: DataFileEntry, m: TableMetadata): Boolean =
      m.statKey(name).flatMap(f.nullCounts.get).forall(_ > 0)
    override def mayMatchManifest(ref: ManifestRef, m: TableMetadata): Boolean =
      m.statKey(name).flatMap(ref.nullCounts.get).forall(_ > 0)
  }

  final case class NotNull(name: String) extends LakePredicate {
    def toColumn: Column = col(name).isNotNull
    def render = s"$name IS NOT NULL"
    def mayMatch(f: DataFileEntry, m: TableMetadata): Boolean =
      m.statKey(name).flatMap(f.nullCounts.get).forall(_ < f.recordCount)
    // all-null across the whole manifest ⇔ rollup nullCount == rollup
    // recordCount (both are sums over the same every-entry key set)
    override def mayMatchManifest(ref: ManifestRef, m: TableMetadata): Boolean =
      m.statKey(name).flatMap(ref.nullCounts.get).forall(_ < ref.recordCount)
  }

  final case class And(left: LakePredicate, right: LakePredicate) extends LakePredicate {
    def toColumn: Column = left.toColumn && right.toColumn
    def render = s"(${left.render} AND ${right.render})"
    def mayMatch(f: DataFileEntry, m: TableMetadata): Boolean =
      left.mayMatch(f, m) && right.mayMatch(f, m)
    override def mayMatchManifest(ref: ManifestRef, m: TableMetadata): Boolean =
      left.mayMatchManifest(ref, m) && right.mayMatchManifest(ref, m)
  }

  final case class Or(left: LakePredicate, right: LakePredicate) extends LakePredicate {
    def toColumn: Column = left.toColumn || right.toColumn
    def render = s"(${left.render} OR ${right.render})"
    def mayMatch(f: DataFileEntry, m: TableMetadata): Boolean =
      left.mayMatch(f, m) || right.mayMatch(f, m)
    override def mayMatchManifest(ref: ManifestRef, m: TableMetadata): Boolean =
      left.mayMatchManifest(ref, m) || right.mayMatchManifest(ref, m)
  }

  /** Negation cannot reuse the child's bound proof, so it never prunes —
    * conservative but always correct; row filter does the exact work. */
  final case class Not(child: LakePredicate) extends LakePredicate {
    def toColumn: Column = !child.toColumn
    def render = s"NOT (${child.render})"
    def mayMatch(f: DataFileEntry, m: TableMetadata): Boolean = true
  }

  /** Equality on a partition-transform value (e.g. month(ts) = 1996-03):
    * prunes on the manifest's derived partitionValues, with the exact
    * transform re-applied as the row filter. Files spanning partitions
    * carry no value and are conservatively kept. */
  final case class PartitionEq(field: PartitionField, value: String) extends LakePredicate {
    // string-compare both sides: the canonical partition-value encoding
    // is stringly (works for identity-on-numerics and calendar
    // transforms; timestamp identity should use Ge/Le instead)
    def toColumn: Column = field.toColumn.cast("string") === lit(value)
    def render = s"${field.render} = $value"
    def mayMatch(f: DataFileEntry, m: TableMetadata): Boolean = {
      // partition values are keyed by spec POSITION (rename-proof);
      // a field not in the current spec prunes nothing
      val i = m.specFor(f).indexOf(field)
      i < 0 || f.partitionValues.get(s"p$i").forall(_ == value)
    }
    // The rollup summary carries the DISTINCT partition values per key
    // (exact-set membership, not bounds), valid only when the manifest
    // is spec-homogeneous; a mixed-spec or over-cap manifest is kept.
    override def mayMatchManifest(ref: ManifestRef, m: TableMetadata): Boolean =
      ref.specId.forall { sid =>
        val i = m.allSpecs.lift(sid).getOrElse(m.spec).indexOf(field)
        i < 0 || ref.partitionValues.get(s"p$i").forall(_.contains(value))
      }
  }
}

/** Canonical stat-string encoding + comparison, shared by the stats
  * harvester and the pruner. Timestamps are micros-since-epoch longs,
  * dates are days-since-epoch ints, numerics decimal strings, strings
  * verbatim. */
object Stats {
  def toStat(t: DataType, v: Any): String = v match {
    // java.sql.Timestamp wall time == UTC instant under the pinned UTC
    // session TZ, so one encoding serves both LTZ and NTZ columns
    case ts: java.sql.Timestamp =>
      (ts.getTime * 1000L + (ts.getNanos / 1000) % 1000).toString
    case i: java.time.Instant =>
      (i.getEpochSecond * 1000000L + i.getNano / 1000).toString
    case ldt: java.time.LocalDateTime =>
      (ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + ldt.getNano / 1000).toString
    case d: java.sql.Date => d.toLocalDate.toEpochDay.toString
    case d: java.time.LocalDate => d.toEpochDay.toString
    case other => other.toString
  }

  /** Canonical stat string → CATALYST value (micros/days stay integral,
    * strings become UTF8String). Only the types whose manifest bounds
    * are EXACT are decodable — the aggregate-pushdown surface refuses
    * everything else (floats order NaN wrong, parquet may truncate
    * string bounds, decimals carry no stats at all). */
  def fromStatCatalyst(t: DataType, s: String): Option[Any] = t match {
    case ByteType => Some(s.toByte)
    case ShortType => Some(s.toShort)
    case IntegerType | DateType => Some(s.toInt)
    case LongType | TimestampType | _: TimestampNTZType => Some(s.toLong)
    case BooleanType => Some(s.toBoolean)
    case _ => None
  }

  /** Types whose manifest bounds are exact AND decodable — the only
    * ones MIN/MAX aggregate pushdown may answer from. */
  def boundsExact(t: DataType): Boolean = t match {
    case ByteType | ShortType | IntegerType | LongType | DateType
         | TimestampType | BooleanType => true
    case _: TimestampNTZType => true
    case _ => false
  }

  /** Three-way compare of two canonical stat strings under a type. */
  def cmp(t: DataType, a: String, b: String): Int = t match {
    case ByteType | ShortType | IntegerType | LongType | TimestampType | DateType
         | _: TimestampNTZType =>
      java.lang.Long.compare(a.toLong, b.toLong)
    case FloatType | DoubleType => java.lang.Double.compare(a.toDouble, b.toDouble)
    case _: DecimalType => new java.math.BigDecimal(a).compareTo(new java.math.BigDecimal(b))
    case BooleanType => java.lang.Boolean.compare(a.toBoolean, b.toBoolean)
    case _ => a.compareTo(b)
  }
}
