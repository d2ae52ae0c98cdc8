package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

/** Native Catalyst expression: exact integer dot product of two
  * `array<long>` count vectors, returning NULL when the vectors share no
  * slot that is nonzero in BOTH — the posting-list candidate contract
  * (a pair surfaces iff it collides on some nonzero slot) fused into the
  * product pass, so `where(dot is not null)` reproduces the inverted
  * index join's candidate set without a second array traversal. The sum
  * is exact (long counts bounded by chunk length), matching the SQL
  * `CAST(sum(q.c * a.c) AS BIGINT)` bit-for-bit.
  *
  * Exists for the same reason as [[CosineSim]]: the
  * `exists(zip_with(...)) + aggregate(zip_with(...))` HOF pair allocates
  * two boxed intermediate arrays per scored pair; this is one primitive
  * loop inside whole-stage codegen.
  */
case class LongDotShared(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0L
    var shared = false
    var i = 0
    while (i < n) {
      val xi = x.getLong(i)
      val yi = y.getLong(i)
      if (xi != 0L && yi != 0L) shared = true
      dot += xi * yi
      i += 1
    }
    if (shared) java.lang.Long.valueOf(dot) else null
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val shared = ctx.freshName("shared")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $dot = 0L; boolean $shared = false;
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $xi = $a.getLong($i);
         |    long $yi = $b.getLong($i);
         |    if ($xi != 0L && $yi != 0L) $shared = true;
         |    $dot += $xi * $yi;
         |  }
         |  if ($shared) {
         |    ${ev.value} = $dot;
         |  } else {
         |    ${ev.isNull} = true;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongDotShared =
    copy(left = newLeft, right = newRight)
}

object LongDotShared {
  /** Column-API entry point. */
  def apply(a: Column, b: Column): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(LongDotShared(
      org.apache.spark.sql.classic.ExpressionUtils.expression(a),
      org.apache.spark.sql.classic.ExpressionUtils.expression(b)))
}
