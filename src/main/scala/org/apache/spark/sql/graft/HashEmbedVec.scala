package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: fold an `array<string>` of tokens into a
  * `dim`-slot signed feature-hash count vector in ONE primitive pass.
  * Two hash families, selected by `xx64`:
  *
  *  - md5 (default): slot `hv % dim`, sign `(hv div dim) % 2` for
  *    `hv = first 4 md5 digest bytes as an unsigned int` — bit-identical
  *    to the SQL `CAST(conv(substring(md5(t), 1, 8), 16, 10) AS
  *    BIGINT)`, so full oracle parity is preserved;
  *  - xx64: slot = low bits, sign = the next bit, of Spark's OWN
  *    `xxhash64` (the literal `XxHash64Function` the built-in calls, so
  *    the fold reproduces `xxhash64(term)` exactly) — the
  *    production-hash path with no cross-engine twin, conservation-
  *    checked instead (`text_hash_embed_fast_check`). Requires `dim` a
  *    power of two.
  *
  * Exists because the higher-order-function formulation — either a
  * per-slot `transform` (whose md5 array gets project-collapsed and
  * re-evaluated per slot) or a per-token `aggregate` that rebuilds a
  * dim-length accumulator array per element — allocates per row·token;
  * measured 6.7–37 s for the sf0.1 chunk corpus vs sub-second for this
  * one-pass primitive loop. The md5 call itself reuses one
  * `MessageDigest` per thread.
  */
case class HashEmbedVec(child: Expression, dim: Int, xx64: Boolean = false)
    extends UnaryExpression with ExpectsInputTypes {

  require(!xx64 || (dim & (dim - 1)) == 0,
    s"xx64 slot extraction needs a power-of-two dim, got $dim")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    HashEmbedVec.fold(input.asInstanceOf[ArrayData], dim, xx64)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graft.HashEmbedVec.fold($a, $dim, $xx64);")

  override protected def withNewChildInternal(newChild: Expression): HashEmbedVec =
    copy(child = newChild)
}

object HashEmbedVec {

  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** One pass over the token array: hash each token once, scatter its
    * ±1 into a primitive long accumulator. Null tokens are skipped (the
    * splitters upstream never produce them; skipping matches the SQL
    * formulation where a null hash contributes no posting row).
    */
  def fold(tokens: ArrayData, dim: Int, xx64: Boolean): ArrayData = {
    val acc = new Array[Long](dim)
    val md = if (xx64) null else digest.get()
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      val t = tokens.get(i, StringType).asInstanceOf[UTF8String]
      if (t != null) {
        if (xx64) {
          // the exact hash the built-in `xxhash64(col)` computes; slot =
          // low log2(dim) bits, sign = the next bit up — disjoint fields
          val hv = org.apache.spark.sql.catalyst.expressions.XxHash64Function
            .hash(t, StringType, 42L)
          val slot = (hv & (dim - 1)).toInt
          val signBit = (hv >> java.lang.Integer.numberOfTrailingZeros(dim)) & 1L
          acc(slot) += (if (signBit == 0L) 1L else -1L)
        } else {
          md.reset()
          val d = md.digest(t.getBytes)
          // first 4 digest bytes, big-endian unsigned — identical to the
          // numeric value of the first 8 hex chars of md5(t)
          val hv = ((d(0) & 255L) << 24) | ((d(1) & 255L) << 16) |
            ((d(2) & 255L) << 8) | (d(3) & 255L)
          val slot = (hv % dim).toInt
          acc(slot) += (if ((hv / dim) % 2 == 0) 1L else -1L)
        }
      }
      i += 1
    }
    new GenericArrayData(acc)
  }

  /** Column-API entry point. */
  def apply(tokens: Column, dim: Int): Column = apply(tokens, dim, xx64 = false)

  def apply(tokens: Column, dim: Int, xx64: Boolean): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(HashEmbedVec(
      org.apache.spark.sql.classic.ExpressionUtils.expression(tokens), dim,
      xx64))
}
