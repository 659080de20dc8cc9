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

  /** Range-normalize an encoded word into `[lo, hi]` (all unsigned):
    * the word's POSITION in its dimension's observed range, scaled to
    * the top 32 bits. Without this, dimensions with small domains are
    * buried — a key in 1..150 varies only in its lowest 8 bits while a
    * float's exponent varies in its highest, so raw interleaving
    * degenerates to a linear sort on the wide dimension. Normalized,
    * every dimension's variation starts at the top bit, which is what
    * makes the curve actually interleave (the same reason Iceberg's
    * z-order rewrite computes per-job bounds). Monotone in `w`, so
    * per-dimension order is preserved; out-of-range words clamp. */
  def normalize(w: Long, lo: Long, hi: Long): Long = {
    if (java.lang.Long.compareUnsigned(w, lo) <= 0) return 0L
    if (java.lang.Long.compareUnsigned(w, hi) >= 0 ||
      java.lang.Long.compareUnsigned(hi, lo) <= 0) return 0xFFFFFFFF00000000L
    def ud(x: Long): Double =
      if (x >= 0) x.toDouble else x.toDouble + 1.8446744073709552E19
    val frac = ud(w - lo) / ud(hi - lo) // mod-2^64 diffs are the unsigned diffs
    (frac * 4294967295.0).toLong << 32
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

/** The SIGNED-comparable encoded word of one value (`encodeXxx ^
  * Long.MinValue`): `min`/`max` aggregates over it give a dimension's
  * unsigned encoded bounds (re-flip to unsigged) in one tiny agg —
  * how the write path learns the ranges [[ZOrderKey]] normalizes to. */
case class ZOrderEncode(child: Expression) extends Expression {
  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def foldable: Boolean = child.foldable

  override def checkInputDataTypes(): TypeCheckResult =
    if (ZOrder.supported(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"zorder encoding does not support ${child.dataType.simpleString}")

  override def eval(input: InternalRow): Any =
    ZOrder.encodeValue(child.eval(input), child.dataType) ^ java.lang.Long.MIN_VALUE

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val e = child.genCode(ctx)
    val enc = ZOrderKey.genEncode(child.dataType, e.value.toString)
    ev.copy(
      code = e.code +
        code"""
          |long ${ev.value} = (${e.isNull} ? 0L : $enc) ^ java.lang.Long.MIN_VALUE;
        """.stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(child = newChildren.head)
}

/** `zorder_key(c1, …, ck)`: the 8k-byte Morton code of the row — the
  * expression the lake write path range-partitions and sorts on when a
  * table's write order is z-order. Never null; whole-stage codegen with
  * one static call per row. `bounds` (one unsigned encoded (lo, hi) per
  * child, computed per write batch via [[ZOrderEncode]] aggregates)
  * range-normalizes each dimension so heterogeneous domains interleave
  * instead of the widest one dominating; without bounds, raw words
  * interleave (right when the domains already match). */
case class ZOrderKey(children: Seq[Expression],
    bounds: Seq[(Long, Long)] = Nil) extends Expression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def foldable: Boolean = children.forall(_.foldable)

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.size < 2)
      TypeCheckResult.TypeCheckFailure("zorder_key needs at least 2 columns")
    else if (bounds.nonEmpty && bounds.size != children.size)
      TypeCheckResult.TypeCheckFailure(
        s"zorder_key got ${bounds.size} bounds for ${children.size} columns")
    else children.find(c => !ZOrder.supported(c.dataType)) match {
      case Some(bad) => TypeCheckResult.TypeCheckFailure(
        s"zorder_key does not support type ${bad.dataType.simpleString}")
      case None => TypeCheckResult.TypeCheckSuccess
    }

  override def eval(input: InternalRow): Any = {
    val words = new Array[Long](children.length)
    var i = 0
    while (i < children.length) {
      var w = ZOrder.encodeValue(children(i).eval(input), children(i).dataType)
      if (bounds.nonEmpty) w = ZOrder.normalize(w, bounds(i)._1, bounds(i)._2)
      words(i) = w
      i += 1
    }
    ZOrder.interleave(words)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evals = children.map(_.genCode(ctx))
    val words = ctx.freshName("zwords")
    val assigns = children.zip(evals).zipWithIndex.map { case ((c, e), i) =>
      val enc = s"${e.isNull} ? 0L : ${ZOrderKey.genEncode(c.dataType, e.value.toString)}"
      val normed =
        if (bounds.isEmpty) enc
        else s"graft.functions.ZOrder.normalize($enc, ${bounds(i)._1}L, ${bounds(i)._2}L)"
      s"$words[$i] = $normed;"
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

object ZOrderKey {
  private[functions] def genEncode(t: DataType, v: String): String = t match {
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
