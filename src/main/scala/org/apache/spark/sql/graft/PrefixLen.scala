package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: length in CHARACTERS of the longest
  * common prefix of two strings — the LCP kernel behind the
  * suffix-array operators ([[graft.operators.SuffixArray]]), where it
  * runs once per lexicographically-adjacent suffix pair.
  *
  * Exists because Spark has no LCP builtin and the Column composition
  * (`size(filter(sequence(...), i -> substr(a,1,i) = substr(b,1,i)))`)
  * is O(n²) in prefix length AND drops out of whole-stage codegen
  * (higher-order array functions are interpreted). This is a single
  * byte walk; the interpreted path shares the identical static helper,
  * so eval and codegen cannot drift.
  *
  * Semantics match the SQL formulation `max(i) where substr(a,1,i) =
  * substr(b,1,i)`: bytes are walked while equal, the cut is clipped
  * back to a codepoint boundary valid in BOTH inputs (byte prefixes
  * below the first difference coincide, so their boundaries do too),
  * and the result counts CODEPOINTS in the clipped prefix — on ASCII
  * input the byte walk IS the character walk.
  */
case class PrefixLen(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)
  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any =
    PrefixLen.commonPrefixChars(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = org.apache.spark.sql.graft.PrefixLen" +
        s".commonPrefixChars($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PrefixLen =
    copy(left = newLeft, right = newRight)
}

object PrefixLen {
  /** Common-prefix codepoint count: byte walk while equal, clip to a
    * codepoint boundary, count non-continuation bytes in the prefix.
    */
  def commonPrefixChars(a: UTF8String, b: UTF8String): Long = {
    val n = math.min(a.numBytes, b.numBytes)
    var i = 0
    while (i < n && a.getByte(i) == b.getByte(i)) i += 1
    // a position j < i is a boundary iff byte j starts a codepoint;
    // below i the two byte streams are identical, so one check serves
    // both. Position i itself is a boundary only if NEITHER input
    // continues a codepoint across it (the differing byte may be a
    // continuation byte in one input and a start byte in the other —
    // that partially-matched codepoint is NOT a common character).
    def contAt(s: UTF8String, j: Int): Boolean =
      j < s.numBytes && (s.getByte(j) & 0xC0) == 0x80
    while (i > 0 && (contAt(a, i) || contAt(b, i))) i -= 1
    var chars = 0L
    var j = 0
    while (j < i) {
      if ((a.getByte(j) & 0xC0) != 0x80) chars += 1
      j += 1
    }
    chars
  }

  /** Column-API entry point. */
  def apply(x: Column, y: Column): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(PrefixLen(
      org.apache.spark.sql.classic.ExpressionUtils.expression(x),
      org.apache.spark.sql.classic.ExpressionUtils.expression(y)))
}
