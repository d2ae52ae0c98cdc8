package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType}

/** Native Catalyst expression: Morton z-value of two 21-bit dimension
  * keys (bit i of x → z-bit 2i, bit i of y → z-bit 2i+1) — the
  * clustering key behind the lake writer's multi-dimensional data
  * skipping (`graft.sources.ZOrder`) and the `layout_zorder` report.
  *
  * Exists because the Column formulation is a 6-level shift-and-mask
  * cascade whose tree REFERENCES EACH STAGE TWICE (x | x << s): without
  * subexpression elimination that is 2⁶ duplicated subtrees per key,
  * and even with CSE it is ~40 expression nodes per call. This emits
  * the whole interleave as twelve straight-line long assignments; the
  * interpreted path shares the identical static helper, so eval and
  * codegen cannot drift.
  *
  * Inputs outside [0, 2²¹) are masked to their low 21 bits — the same
  * contract as the Column cascade (the writer normalizes upstream).
  */
case class ZValue(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, LongType)
  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any =
    ZValue.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = org.apache.spark.sql.graft.ZValue.interleave($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZValue =
    copy(left = newLeft, right = newRight)
}

object ZValue {
  /** Spread the low 21 bits of `v` so bit i lands at bit 2i — the
    * classic magic-mask cascade (public-domain Morton encoding). */
  def spread(v: Long): Long = {
    var x = v & 0x1FFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    (x | (x << 1)) & 0x5555555555555555L
  }

  def interleave(x: Long, y: Long): Long =
    spread(x) | (spread(y) << 1)

  /** Column-API entry point. */
  def apply(x: Column, y: Column): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(ZValue(
      org.apache.spark.sql.classic.ExpressionUtils.expression(x),
      org.apache.spark.sql.classic.ExpressionUtils.expression(y)))
}
