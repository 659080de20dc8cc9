package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for vector math over `array<float>` /
  * `array<double>` embeddings — tier (b) of the extension ladder
  * (SURVEY.md §7.3): the `aggregate`/`zip_with` higher-order
  * formulation is interpreted per-row (no codegen, boxed lambda calls
  * per element); these generate a tight primitive loop inside
  * whole-stage codegen instead.
  *
  * Accumulation is double, in index order — bit-identical to the HOF
  * formulation they replace (VectorExprSpec asserts this).
  */
abstract class VectorBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType

  // result is null when either ARRAY is null OR any ELEMENT is null —
  // nullable must reflect the latter or codegen drops the isNull write
  override def nullable: Boolean = {
    def elemNullable(e: Expression) = e.dataType match {
      case ArrayType(_, cn) => cn
      case _ => true
    }
    left.nullable || right.nullable || elemNullable(left) || elemNullable(right)
  }

  protected def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"${getClass.getSimpleName} needs two array<float|double> args, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  protected def get(a: ArrayData, t: DataType, i: Int): Double = t match {
    case FloatType => a.getFloat(i).toDouble
    case _ => a.getDouble(i)
  }

  protected def genGet(v: String, t: DataType, i: String): String = t match {
    case FloatType => s"(double) $v.getFloat($i)"
    case _ => s"$v.getDouble($i)"
  }
}

/** Σ aᵢ·bᵢ over the common prefix of two vectors. A null ELEMENT makes
  * the result null (matching the HOF formulation, which propagates null
  * through zip_with/aggregate). */
case class DotProductF(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (lt, rt) = (elemType(left), elemType(right))
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += get(x, lt, i) * get(y, rt, i); i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      // when nullable is false, elements provably cannot be null AND
      // ev.isNull renders as the literal `false` (assigning to it is
      // invalid Java) — emit the guard only when it can fire
      val nullGuard =
        if (nullable)
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullGuard
         |  $acc += ${genGet(a, elemType(left), i)} * ${genGet(b, elemType(right), i)};
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Cosine similarity in ONE pass (dot, |a|², |b|² in the same loop) —
  * the HOF equivalent needs three interpreted array traversals. */
case class CosineSimilarityF(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (lt, rt) = (elemType(left), elemType(right))
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = get(x, lt, i); val yv = get(y, rt, i)
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val nullGuard =
        if (nullable)
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullGuard
         |  double $xv = ${genGet(a, elemType(left), i)};
         |  double $yv = ${genGet(b, elemType(right), i)};
         |  $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Engine-independent QUANTIZED dot product: Σ ⌊aᵢ·2¹⁵⌋·⌊bᵢ·2¹⁵⌋ as
  * BIGINT, in one codegen pass. Multiplying a double by a power of two
  * is exact, and floor of a double is exact, so the per-component
  * quantized values — and therefore this integer sum — are BIT-IDENTICAL
  * in any engine that reads the same floats (DuckDB reconstructs it as
  * `floor(x * 32768)`), unlike float accumulation whose result depends
  * on summation order. This is what lets the ANN top-k family carry
  * full hash-match oracles.
  *
  * Range safety (documented, not just hoped): for unit-normalized
  * embeddings (Σx² = 1, the corpus contract) each ⌊x·2¹⁵⌋ ≤ 2¹⁵+1 in
  * magnitude and the quantized self-norm n = Σq² ≤ 2³⁰ + 2¹⁹ < 2³¹;
  * Cauchy–Schwarz then bounds any cross dot by √(nₐ·n_b) < 2³¹, so
  * dot² < 2⁶² stays inside BIGINT in both engines. */
case class QuantizedDotF(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def dataType: DataType = LongType

  private val scale = QuantizedDotF.Scale

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (lt, rt) = (elemType(left), elemType(right))
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val qx = math.floor(get(x, lt, i) * scale).toLong
      val qy = math.floor(get(y, rt, i) * scale).toLong
      s += qx * qy; i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val qx = ctx.freshName("qx")
      val qy = ctx.freshName("qy")
      val nullGuard =
        if (nullable)
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullGuard
         |  long $qx = (long) java.lang.Math.floor(${genGet(a, elemType(left), i)} * $scale.0);
         |  long $qy = (long) java.lang.Math.floor(${genGet(b, elemType(right), i)} * $scale.0);
         |  $acc += $qx * $qy;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object QuantizedDotF {
  /** 2¹⁵ — power of two so `x * Scale` is exact in IEEE doubles. */
  val Scale: Int = 32768
}

object VectorFunctions {
  // Spark 4 Column is backend-agnostic (no .expr); the classic bridge
  // converts Column <-> catalyst Expression (via the graftbridge shim,
  // since ExpressionUtils is private[sql])
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  def dot_f(a: Column, b: Column): Column =
    column(DotProductF(expression(a), expression(b)))
  def cosine_f(a: Column, b: Column): Column =
    column(CosineSimilarityF(expression(a), expression(b)))
  def qdot_f(a: Column, b: Column): Column =
    column(QuantizedDotF(expression(a), expression(b)))

  /** SQL registration: SELECT cosine_f(a, b) ... */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_f", exprs => DotProductF(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_f", exprs => CosineSimilarityF(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "qdot_f", exprs => QuantizedDotF(exprs(0), exprs(1)), "built-in")
  }
}
