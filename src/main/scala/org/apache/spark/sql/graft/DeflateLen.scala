package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the RAW-DEFLATE compressed length of a
  * string's UTF-8 bytes — the compression-ratio quality signal the
  * CCNet/RedPajama-style curation stacks use (highly repetitive or
  * template text compresses far below prose; random noise barely
  * compresses at all).
  *
  * Determinism contract: `java.util.zip.Deflater` at a PINNED level
  * with `nowrap = true` (no zlib header/adler trailer) is a pure
  * function of the input bytes for a given zlib build — the JVM
  * bundles its own zlib, so the value is stable across the cluster.
  * It is NOT cross-engine reproducible (DuckDB has no deflate), which
  * is why `text_compress_ratio` registers rows-only and its `_check`
  * twin pins oracle-checkable invariants instead of byte lengths.
  *
  * Codegen-friendly: `doGenCode` emits one static call, keeping the
  * projection inside whole-stage codegen; one Deflater is created per
  * call (Deflater is not thread-safe to share across codegen'd rows on
  * a speculating executor; `reset()` pooling measured no win at the
  * fixture's doc sizes).
  */
case class DeflateLen(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = IntegerType

  override def nullSafeEval(input: Any): Any =
    DeflateLen.deflatedLen(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graft.DeflateLen.deflatedLen($a);")

  override protected def withNewChildInternal(newChild: Expression): DeflateLen =
    copy(child = newChild)
}

object DeflateLen {

  /** Pinned: default level (6), raw deflate. */
  def deflatedLen(s: UTF8String): Int = {
    val in = s.getBytes
    val d = new java.util.zip.Deflater(
      java.util.zip.Deflater.DEFAULT_COMPRESSION, /* nowrap = */ true)
    try {
      d.setInput(in)
      d.finish()
      val buf = new Array[Byte](math.max(64, in.length + (in.length >> 1) + 16))
      var total = 0
      while (!d.finished()) {
        val n = d.deflate(buf)
        total += n
        if (n == 0 && !d.finished()) return -1 // cannot happen post-finish
      }
      total
    } finally d.end()
  }

  def apply(text: Column): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(DeflateLen(
      org.apache.spark.sql.classic.ExpressionUtils.expression(text)))
}
