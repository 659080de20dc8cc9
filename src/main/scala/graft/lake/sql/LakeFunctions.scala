package graft.lake.sql

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

/** The catalog's V2 FUNCTION surface (Iceberg's SparkFunctions
  * analog): the partition transforms as loadable functions, which is
  * what lets Spark resolve a `bucket(n, col)` clustering expression in
  * a reported KeyGroupedPartitioning — bucket-partitioned tables then
  * storage-partition-join exactly like identity-partitioned ones, the
  * high-cardinality co-location real fact-to-fact joins need.
  *
  * The bound function computes pmod(murmur3(col, seed 42), n) — BIT
  * IDENTICAL to the write path's `F.pmod(F.hash(c), n)`
  * (Model.PartitionField.toColumn), because a function that disagreed
  * with the layout it describes would co-locate the wrong rows. */
object LakeFunctions {

  val names: Seq[String] =
    Seq("bucket", "years", "months", "days", "hours", "truncate")

  def unbound(name: String): Option[UnboundFunction] = name match {
    case "bucket" => Some(BucketUnbound)
    case "years" | "months" | "days" | "hours" => Some(TemporalUnbound(name))
    case "truncate" => Some(TruncateUnbound)
    // width-baked single-argument family (`truncate3(col)`): what the
    // SPJ clustering reports — Spark's subset-of-join-keys rule
    // (KeyGroupedPartitioning.satisfies0) demands each partition
    // expression have exactly ONE leaf, and only bucket's literal gets
    // hoisted out of children by the built-in special case; a
    // two-leaf `truncate(w, col)` clustering can never satisfy it
    case n if n.startsWith("truncate") =>
      n.stripPrefix("truncate").toIntOption.filter(_ > 0)
        .map(TruncateWidthUnbound(_))
    case _ => None
  }

  object BucketUnbound extends UnboundFunction {
    override def name(): String = "bucket"
    override def description(): String =
      "bucket(numBuckets, col): pmod(murmur3(col), numBuckets) — the write-path partition transform"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 2,
        s"bucket takes (numBuckets, col); got ${inputType.simpleString}")
      require(inputType.fields(0).dataType == IntegerType,
        s"bucket's first argument is the bucket count (int); got ${inputType.fields(0).dataType}")
      BucketBound(inputType.fields(1).dataType)
    }
  }

  /** Iceberg's temporal partition transforms as V2 functions: years /
    * months / hours since epoch as INT, days as DateType (epoch-day
    * int) — the conventions Iceberg's SparkFunctions publish, UTC like
    * the write path's stat-derived partition values
    * (StatsHarvester.applyTransform). */
  final case class TemporalUnbound(fn: String) extends UnboundFunction {
    override def name(): String = fn
    override def description(): String =
      s"$fn(col): $fn-since-epoch partition transform (date or timestamp input)"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 1,
        s"$fn takes one date/timestamp column; got ${inputType.simpleString}")
      val t = inputType.fields(0).dataType
      require(t == DateType || t == TimestampType || t == TimestampNTZType,
        s"$fn input must be date or timestamp; got ${t.catalogString}")
      TemporalBound(fn, t)
    }
  }

  final case class TemporalBound(fn: String, colType: DataType)
      extends ScalarFunction[Integer] {
    override def inputTypes(): Array[DataType] = Array(colType)
    override def resultType(): DataType =
      if (fn == "days") DateType else IntegerType
    override def name(): String = fn
    override def canonicalName(): String = s"graft.$fn(${colType.catalogString})"
    // NULL in, NULL out — without the check a null date would unbox to
    // epoch and silently report 1970 instead of null
    override def isResultNullable: Boolean = true
    override def produceResult(input: InternalRow): Integer = {
      if (input.isNullAt(0)) return null
      val utc = java.time.ZoneOffset.UTC
      val zdt = colType match {
        case DateType =>
          java.time.LocalDate.ofEpochDay(input.getInt(0).toLong).atStartOfDay(utc)
        case _ => java.time.Instant.EPOCH
          .plus(input.getLong(0), java.time.temporal.ChronoUnit.MICROS).atZone(utc)
      }
      fn match {
        case "years" => zdt.getYear - 1970
        case "months" => (zdt.getYear - 1970) * 12 + zdt.getMonthValue - 1
        case "days" => zdt.toLocalDate.toEpochDay.toInt
        case "hours" => (zdt.toLocalDate.toEpochDay * 24 + zdt.getHour).toInt
      }
    }
  }

  /** truncate(width, col): leading-width string prefix — matching the
    * write path's `truncate[w]` stat derivation (character-based). */
  object TruncateUnbound extends UnboundFunction {
    override def name(): String = "truncate"
    override def description(): String =
      "truncate(width, col): width-character string prefix partition transform"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 2,
        s"truncate takes (width, col); got ${inputType.simpleString}")
      require(inputType.fields(0).dataType == IntegerType,
        s"truncate's first argument is the width (int); got ${inputType.fields(0).dataType}")
      require(inputType.fields(1).dataType == StringType,
        s"truncate's column must be string; got ${inputType.fields(1).dataType}")
      TruncateBound
    }
  }

  object TruncateBound extends ScalarFunction[org.apache.spark.unsafe.types.UTF8String] {
    override def inputTypes(): Array[DataType] = Array(IntegerType, StringType)
    override def resultType(): DataType = StringType
    override def name(): String = "truncate"
    override def canonicalName(): String = "graft.truncate(string)"
    override def isResultNullable: Boolean = true
    override def produceResult(input: InternalRow)
        : org.apache.spark.unsafe.types.UTF8String = {
      if (input.isNullAt(1)) return null
      LakeFunctions.truncateUtf16(input.getInt(0), input.getUTF8String(1))
    }
  }

  final case class TruncateWidthUnbound(w: Int) extends UnboundFunction {
    override def name(): String = s"truncate$w"
    override def description(): String =
      s"truncate$w(col): leading-$w-character string prefix (single-leaf SPJ form)"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 1 &&
        inputType.fields(0).dataType == StringType,
        s"truncate$w takes one string column; got ${inputType.simpleString}")
      TruncateWidthBound(w)
    }
  }

  final case class TruncateWidthBound(w: Int)
      extends ScalarFunction[org.apache.spark.unsafe.types.UTF8String] {
    override def inputTypes(): Array[DataType] = Array(StringType)
    override def resultType(): DataType = StringType
    override def name(): String = s"truncate$w"
    override def canonicalName(): String = s"graft.truncate[$w](string)"
    override def isResultNullable: Boolean = true
    override def produceResult(input: InternalRow)
        : org.apache.spark.unsafe.types.UTF8String = {
      if (input.isNullAt(0)) return null
      LakeFunctions.truncateUtf16(w, input.getUTF8String(0))
    }
  }

  /** UTF-16-unit prefix, matching the WRITE path's stat derivation
    * (String.take(w) in StatsHarvester.applyTransform) — a code-point
    * substring would disagree on supplementary characters and make the
    * published transform compute different keys than the manifests'
    * rendered partition values. */
  private[sql] def truncateUtf16(w: Int,
      s: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.unsafe.types.UTF8String =
    org.apache.spark.unsafe.types.UTF8String.fromString(s.toString.take(w))

  final case class BucketBound(colType: DataType) extends ScalarFunction[Integer] {
    override def inputTypes(): Array[DataType] = Array(IntegerType, colType)
    override def resultType(): DataType = IntegerType
    override def name(): String = "bucket"
    // equality of canonicalName (plus bucket count) is what makes two
    // sides' TransformExpressions compatible for a shuffle-free join;
    // type-scoped so an int-keyed and a string-keyed bucket never
    // claim compatibility
    override def canonicalName(): String = s"graft.bucket(${colType.catalogString})"
    override def isResultNullable: Boolean = false
    override def produceResult(input: InternalRow): Integer = {
      val n = input.getInt(0)
      val v = input.get(1, colType)
      val h = org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
        .hash(v, colType, 42L).toInt
      ((h % n) + n) % n
    }
  }
}
