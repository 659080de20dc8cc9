package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String

import graft.lake.DeleteVector

/** `dv_contains(file_path, row_index)` against a BROADCAST map of
  * per-file deletion vectors: the merge-on-read DV read path. Applied as
  * `.filter(!dv_contains(...))`, it subtracts tombstoned rows as a
  * MAP-SIDE FILTER inside the scan's whole-stage-codegen span — no join
  * build side, no shuffle, no row ever leaves its input partition; the
  * broadcast payload is the compressed bitmaps themselves (~1 bit/row
  * worst case), not row-granular (path, pos) pairs.
  *
  * Codegen memoizes the last (path → vector) lookup in per-partition
  * mutable state: parquet rows arrive file-clustered, so the map lookup
  * and UTF8→String conversion amortize to ~once per file per partition.
  * The interpreted path skips the memo (interpreted expression instances
  * may be shared across threads; correctness over micro-speed there). */
case class DvContains(path: Expression, pos: Expression,
    dvs: Broadcast[java.util.HashMap[String, DeleteVector]]) extends Expression {

  override def children: Seq[Expression] = Seq(path, pos)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val p = path.eval(input)
    if (p == null) false
    else {
      val dv = dvs.value.get(p.toString)
      dv != null && {
        val i = pos.eval(input)
        i != null && dv.contains(i.asInstanceOf[Long])
      }
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcName = classOf[Broadcast[_]].getName
    val dvName = classOf[DeleteVector].getName
    val bcRef = ctx.addReferenceObj("dvBc", dvs, bcName)
    val map = ctx.addMutableState("java.util.HashMap", "dvMap",
      v => s"$v = (java.util.HashMap) (($bcName) $bcRef).value();")
    val lastPath = ctx.addMutableState("UTF8String", "dvLastPath")
    val lastDv = ctx.addMutableState(dvName, "dvLastDv")
    val p = path.genCode(ctx)
    val i = pos.genCode(ctx)
    ev.copy(
      code = p.code + i.code +
        code"""
          |boolean ${ev.value} = false;
          |if (!${p.isNull} && !${i.isNull}) {
          |  if ($lastPath == null || !${p.value}.equals($lastPath)) {
          |    $lastPath = ${p.value}.clone();
          |    $lastDv = ($dvName) $map.get(${p.value}.toString());
          |  }
          |  ${ev.value} = $lastDv != null && $lastDv.contains(${i.value});
          |}
        """.stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(path = newChildren(0), pos = newChildren(1))
}

object DvContains {
  /** Column form over a broadcast DV map (helper for the read path). */
  def column(path: org.apache.spark.sql.Column, pos: org.apache.spark.sql.Column,
      dvs: Broadcast[java.util.HashMap[String, DeleteVector]]): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(DvContains(
      ColumnBridge.expression(path), ColumnBridge.expression(pos), dvs))
  }
}
