package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Z-order (Morton) curve support for multi-column clustering-on-write.
  *
  * A LINEAR write order (`sortOrder = Seq(a, b)`) makes file min/max
  * ranges disjoint on `a` but tells you nothing about `b` — a predicate
  * on `b` alone prunes no files. Sorting by the Z-VALUE interleaves the
  * bits of every dimension, so each data file covers a small
  * hyper-rectangle of the key space and per-file min/max stats become
  * tight in ALL dimensions at once: predicates on any ordered column
  * prune files, and copy-on-write rewrite spans shrink for predicates
  * on any of them. This is the multi-dimensional clustering Iceberg
  * exposes as `rewrite_data_files(strategy => 'sort', sort_order =>
  * 'zorder(a, b)')`; here it runs at WRITE time (append, compact, CoW
  * rewrite) so the table is always clustered.
  *
  * Each dimension is first mapped to a 64-bit word whose UNSIGNED order
  * equals the column's natural order (sign-flip for integrals, the
  * IEEE-754 total-order trick for floats, big-endian UTF-8 prefix for
  * strings); the words' bits are then interleaved most-significant
  * first into an `8 * k`-byte array, which Spark's BinaryType orders
  * unsigned-lexicographically — exactly the Morton order. NULL encodes
  * as the all-zero word (sorts with the smallest values; clustering
  * needs locality, not exact NULL semantics).
  */
object ZOrder {
  /** Signed long → unsigned-comparable word (flip the sign bit). */
  def encodeLong(v: Long): Long = v ^ java.lang.Long.MIN_VALUE

  /** IEEE-754 total order: negatives reverse (~bits), non-negatives get
    * the sign bit set — unsigned word order == numeric order (with -0.0
    * just below +0.0 and NaN above +Inf, both fine for clustering). */
  def encodeDouble(v: Double): Long = {
    val b = java.lang.Double.doubleToLongBits(v)
    b ^ ((b >> 63) | java.lang.Long.MIN_VALUE)
  }

  /** First 8 UTF-8 bytes, big-endian, zero-padded: unsigned word order
    * == unsigned byte order of the prefix (ties beyond 8 bytes collapse
    * — locality, not total order, is the contract). */
  def encodeUtf8(s: UTF8String): Long = {
    val bytes = s.getBytes
    var w = 0L
    var i = 0
    while (i < 8) {
      w = (w << 8) | (if (i < bytes.length) bytes(i) & 0xffL else 0L)
      i += 1
    }
    w
  }

  /** Bit-interleave k unsigned words, most-significant bit first:
    * output bit `b*k + c` = bit `b` of word `c`. The result compares
    * unsigned-lexicographically as the Morton code of the k dims. */
  def interleave(words: Array[Long]): Array[Byte] = {
    val k = words.length
    val out = new Array[Byte](8 * k)
    var bit = 0
    while (bit < 64) {
      var c = 0
      while (c < k) {
        if (((words(c) >>> (63 - bit)) & 1L) != 0L) {
          val outBit = bit * k + c
          out(outBit >> 3) = (out(outBit >> 3) | (1 << (7 - (outBit & 7)))).toByte
        }
        c += 1
      }
      bit += 1
    }
    out
  }

  def supported(t: DataType): Boolean = t match {
    case ByteType | ShortType | IntegerType | LongType | DateType |
        TimestampType | TimestampNTZType | FloatType | DoubleType |
        StringType | BooleanType => true
    case _ => false
  }

  /** Interpreted encoder (the codegen path emits the same dispatch). */
  private[functions] def encodeValue(v: Any, t: DataType): Long =
    if (v == null) 0L
    else t match {
      case ByteType => encodeLong(v.asInstanceOf[Byte].toLong)
      case ShortType => encodeLong(v.asInstanceOf[Short].toLong)
      case IntegerType | DateType => encodeLong(v.asInstanceOf[Int].toLong)
      case LongType | TimestampType | TimestampNTZType => encodeLong(v.asInstanceOf[Long])
      case FloatType => encodeDouble(v.asInstanceOf[Float].toDouble)
      case DoubleType => encodeDouble(v.asInstanceOf[Double])
      case StringType => encodeUtf8(v.asInstanceOf[UTF8String])
      case BooleanType => encodeLong(if (v.asInstanceOf[Boolean]) 1L else 0L)
      case other => throw new IllegalStateException(s"unsupported z-order type $other")
    }
}

/** `zorder_key(c1, …, ck)`: the 8k-byte Morton code of the row — the
  * expression the lake write path range-partitions and sorts on when a
  * table's write order is z-order. Never null; whole-stage codegen with
  * one static call per row. */
case class ZOrderKey(children: Seq[Expression]) extends Expression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def foldable: Boolean = children.forall(_.foldable)

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.size < 2)
      TypeCheckResult.TypeCheckFailure("zorder_key needs at least 2 columns")
    else children.find(c => !ZOrder.supported(c.dataType)) match {
      case Some(bad) => TypeCheckResult.TypeCheckFailure(
        s"zorder_key does not support type ${bad.dataType.simpleString}")
      case None => TypeCheckResult.TypeCheckSuccess
    }

  override def eval(input: InternalRow): Any = {
    val words = new Array[Long](children.length)
    var i = 0
    while (i < children.length) {
      words(i) = ZOrder.encodeValue(children(i).eval(input), children(i).dataType)
      i += 1
    }
    ZOrder.interleave(words)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evals = children.map(_.genCode(ctx))
    val words = ctx.freshName("zwords")
    def enc(t: DataType, v: String): String = t match {
      case ByteType | ShortType | IntegerType | DateType =>
        s"graft.functions.ZOrder.encodeLong((long) $v)"
      case LongType | TimestampType | TimestampNTZType =>
        s"graft.functions.ZOrder.encodeLong($v)"
      case FloatType => s"graft.functions.ZOrder.encodeDouble((double) $v)"
      case DoubleType => s"graft.functions.ZOrder.encodeDouble($v)"
      case StringType => s"graft.functions.ZOrder.encodeUtf8($v)"
      case BooleanType => s"graft.functions.ZOrder.encodeLong($v ? 1L : 0L)"
      case other => throw new IllegalStateException(s"unsupported z-order type $other")
    }
    val assigns = children.zip(evals).zipWithIndex.map { case ((c, e), i) =>
      s"$words[$i] = ${e.isNull} ? 0L : ${enc(c.dataType, e.value.toString)};"
    }.mkString("\n")
    val childCode = evals.map(_.code).reduceLeft(_ + _)
    ev.copy(
      code = childCode +
        code"""
          |long[] $words = new long[${children.length}];
          |$assigns
          |byte[] ${ev.value} = graft.functions.ZOrder.interleave($words);
        """.stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}

object ZOrderFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  def zorder_key(cols: Column*): Column =
    column(ZOrderKey(cols.map(expression)))

  /** SQL registration: SELECT zorder_key(a, b) ... */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "zorder_key", exprs => ZOrderKey(exprs), "built-in")
}
