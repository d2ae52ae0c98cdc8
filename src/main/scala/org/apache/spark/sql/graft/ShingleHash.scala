package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd kernels for the text-LSH pipeline (word-3-shingle /
  * char-12-gram hashing and the 64-slot minhash banding) — the same
  * arithmetic `Dedup`'s typed `mapPartitions` loops ran, moved into
  * Catalyst expressions so the scan → shingle → signature chain stays
  * inside whole-stage codegen and the persisted shingle frame is read
  * as primitive `ArrayData` instead of being decoded into boxed
  * `Seq[Long]` rows per pass (the `HashEmbedVec`/`AnnAssign` pattern,
  * applied to the last Dataset-boundary kernel the dedup family had).
  *
  * Hash semantics are BIT-IDENTICAL to the loop forms (same rolling
  * polynomial accumulate, same splitmix finalizer, same per-slot
  * multiply-shift family and seeds) — pinned by a parity spec that runs
  * both paths over random strings. Internals only: candidate quality is
  * all that matters, the exact-Jaccard verify defines every output.
  */
object ShingleKernels {

  /** Rolling polynomial hash of a word into an accumulator (with a
    * separator step) — never allocates the joined shingle string.
    */
  private def polyHash(acc0: Long, w: String): Long = {
    var acc = acc0 * 31 + ' '
    var i = 0
    while (i < w.length) { acc = acc * 31 + w.charAt(i); i += 1 }
    acc
  }

  /** Splitmix-style finalizer: polynomial hashes are linearly related
    * for related inputs; this destroys that structure before the
    * Carter-Wegman family consumes the value.
    */
  private def finalizeHash(v: Long): Long = {
    var z = v + 0x9E3779B97F4A7C15L
    z ^= (z >>> 30); z *= 0xBF58476D1CE4E5B9L
    z ^= (z >>> 27); z *= 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  private def distinctSorted(a: Array[Long]): Array[Long] = {
    java.util.Arrays.sort(a)
    var n = 0
    var i = 0
    while (i < a.length) {
      if (i == 0 || a(i) != a(i - 1)) { a(n) = a(i); n += 1 }
      i += 1
    }
    java.util.Arrays.copyOf(a, n)
  }

  /** Distinct hashed word-3-shingles of an (already-trimmed) text as a
    * primitive array; null when the text has fewer than 3 words. The
    * String form is shared with `Dedup`'s accumulator-probed
    * mapPartitions path, so there is exactly ONE hash implementation.
    */
  def wordShingleLongs(t: String): Array[Long] = {
    val words = t.split(' ')
    if (words.length < 3) return null
    distinctSorted(Array.tabulate(words.length - 2) { i =>
      finalizeHash(polyHash(polyHash(polyHash(17L, words(i)),
        words(i + 1)), words(i + 2)))
    })
  }

  /** null when the text has fewer than 3 words — callers filter, the
    * exact analogue of the mapPartitions form's flatMap None.
    */
  def wordShingles(t: UTF8String): ArrayData = {
    val a = wordShingleLongs(t.toString)
    if (a == null) null else UnsafeArrayData.fromPrimitiveArray(a)
  }

  /** Distinct hashed character-12-grams; null under 12 chars. */
  def charShingleLongs(t: String): Array[Long] = {
    if (t.length < 12) return null
    distinctSorted(Array.tabulate(t.length - 11) { i =>
      var acc = 17L
      var j = i
      while (j < i + 12) { acc = acc * 31 + t.charAt(j); j += 1 }
      finalizeHash(acc)
    })
  }

  def charShingles(t8: UTF8String): ArrayData = {
    val a = charShingleLongs(t8.toString)
    if (a == null) null else UnsafeArrayData.fromPrimitiveArray(a)
  }

  // 64 slots = 16 bands × 4 rows; multiply-shift universal hashing with
  // an independent seeded (odd multiplier, offset) pair PER SLOT — the
  // seeds and the band fold mirror the retired mapPartitions form.
  // A cheaper "h1 + i·h2" family was tried first (in that form's
  // history) and is structurally wrong: for i ≥ 2 the i·h2 term
  // dominates, every slot's minimum collapses onto the argmin-h2
  // shingle, and the 64 "independent permutations" become one — a
  // J=0.96 pair was missed outright.
  private val NumHashes = 64
  private val Bands = 16
  private val RowsPerBand = NumHashes / Bands
  private val mulA = Array.tabulate(NumHashes)(i => finalizeHash(0x1000L + i) | 1L)
  private val addB = Array.tabulate(NumHashes)(i => finalizeHash(0x2000L + i))

  /** The 16 LSH band buckets of a shingle set (bucket b = the fold of
    * its 4 minhash slots).
    */
  def minhashBands(shingles: ArrayData): ArrayData = {
    val sh = shingles.toLongArray()
    val sig = Array.fill(NumHashes)(Long.MaxValue)
    var s = 0
    while (s < sh.length) {
      val v = sh(s)
      var i = 0
      while (i < NumHashes) {
        val g = (mulA(i) * v + addB(i)) >>> 14 // top 50 bits: well-mixed
        if (g < sig(i)) sig(i) = g
        i += 1
      }
      s += 1
    }
    val out = new Array[Long](Bands)
    var b = 0
    while (b < Bands) {
      var bucket = 1125899906842597L
      var r = 0
      while (r < RowsPerBand) {
        bucket = bucket * 31 + sig(b * RowsPerBand + r)
        r += 1
      }
      out(b) = bucket
      b += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

sealed abstract class ShingleExpr extends UnaryExpression with ExpectsInputTypes {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  // the kernels return null for too-short inputs even when the input
  // is non-null, so the expression is nullable regardless of the child
  override def nullable: Boolean = true
}

case class WordShingleHashes(child: Expression) extends ShingleExpr {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def nullSafeEval(input: Any): Any =
    ShingleKernels.wordShingles(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"""
      ${ev.value} = org.apache.spark.sql.graft.ShingleKernels.wordShingles($a);
      ${ev.isNull} = ${ev.value} == null;""")
  override protected def withNewChildInternal(newChild: Expression): WordShingleHashes =
    copy(child = newChild)
}

case class CharShingleHashes(child: Expression) extends ShingleExpr {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def nullSafeEval(input: Any): Any =
    ShingleKernels.charShingles(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"""
      ${ev.value} = org.apache.spark.sql.graft.ShingleKernels.charShingles($a);
      ${ev.isNull} = ${ev.value} == null;""")
  override protected def withNewChildInternal(newChild: Expression): CharShingleHashes =
    copy(child = newChild)
}

case class MinHashBands(child: Expression) extends ShingleExpr {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType, containsNull = false))
  override def nullable: Boolean = child.nullable
  override def nullSafeEval(input: Any): Any =
    ShingleKernels.minhashBands(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graft.ShingleKernels.minhashBands($a);")
  override protected def withNewChildInternal(newChild: Expression): MinHashBands =
    copy(child = newChild)
}

object ShingleHash {
  import org.apache.spark.sql.classic.ExpressionUtils.{column, expression}
  def wordShingleHashes(text: Column): Column = column(WordShingleHashes(expression(text)))
  def charShingleHashes(text: Column): Column = column(CharShingleHashes(expression(text)))
  def minhashBands(shingles: Column): Column = column(MinHashBands(expression(shingles)))
}
