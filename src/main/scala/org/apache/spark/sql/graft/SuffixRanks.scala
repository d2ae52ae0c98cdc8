package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document suffix-array kernels for [[graft.operators.SuffixArray]].
  *
  * The suffix-array operators bound every document to a ≤ `Cap`-char
  * normalized prefix, so the ENTIRE suffix order of a document is a
  * function of one short string already present on its row. The first
  * implementation still ran Manber–Myers prefix doubling as ⌈log₂ Cap⌉
  * rounds of paired window functions (12 Window+Sort operators over an
  * exchange — see `plans/r17/text_suffix_array_before.txt`); these
  * expressions compute the identical ranks in one whole-stage-codegen
  * projection with ZERO exchanges — the guide §1.2 step-1 move (fix the
  * distributed algorithm: per-row-bounded work needs no distribution).
  *
  * Ordering contract: suffixes compare as the window formulation and
  * the DuckDB oracle (`ORDER BY substr(s, pos)`) compare them — the
  * input alphabet is the normalized `[a-z0-9 ]` (pure ASCII, enforced
  * upstream by `regexp_replace`), where UTF8String binary order,
  * codepoint order and DuckDB varchar order all coincide, and a strict
  * prefix sorts before the longer suffix. The kernel walks raw UTF-8
  * bytes (unsigned compare), which equals all three on this alphabet.
  *
  * Both expressions share [[SuffixRanks.sortedPositions]]; the
  * interpreted eval and the codegen path call the same static helpers,
  * so they cannot drift (the [[PrefixLen]] discipline).
  */
case class SuffixRankArray(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(s: Any): Any =
    SuffixRanks.rankArray(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = org.apache.spark.sql.graft.SuffixRanks.rankArray($s);")

  override protected def withNewChildInternal(c: Expression): SuffixRankArray =
    copy(child = c)
}

/** `[max adjacent-suffix LCP, count of adjacent LCPs ≥ minLen]` over the
  * document's lexicographic suffix order — the whole `text_longest_repeat`
  * aggregate as one per-row expression (the adjacent-pair maximum IS the
  * global maximum repeat; non-adjacent pairs never beat an adjacent one).
  */
case class LongestRepeatStats(child: Expression, minLen: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(s: Any): Any =
    SuffixRanks.repeatStats(s.asInstanceOf[UTF8String], minLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = org.apache.spark.sql.graft.SuffixRanks" +
        s".repeatStats($s, $minLen);")

  override protected def withNewChildInternal(c: Expression): LongestRepeatStats =
    copy(child = c)
}

object SuffixRanks {

  /** 0-based start offsets of the string's byte suffixes, sorted by
    * unsigned byte-wise suffix comparison (strict prefix first). The
    * input is ≤ the operators' `Cap` (64) bytes, so the O(n² ) compare
    * cost is a bounded constant per row.
    */
  private[graft] def sortedPositions(b: Array[Byte]): Array[Int] = {
    val n = b.length
    val idx = Array.tabulate(n)(identity)
    // insertion sort: n ≤ 64, branch-predictable, no boxing
    var i = 1
    while (i < n) {
      val x = idx(i)
      var j = i - 1
      while (j >= 0 && suffixGt(b, idx(j), x)) { idx(j + 1) = idx(j); j -= 1 }
      idx(j + 1) = x
      i += 1
    }
    idx
  }

  /** suffix(p) > suffix(q) under unsigned byte order, prefix-first. */
  private def suffixGt(b: Array[Byte], p: Int, q: Int): Boolean = {
    val n = b.length
    var i = p
    var j = q
    while (i < n && j < n) {
      val d = (b(i) & 0xff) - (b(j) & 0xff)
      if (d != 0) return d > 0
      i += 1; j += 1
    }
    // equal up to the shorter end: the shorter suffix is a strict
    // prefix and sorts FIRST — p is greater iff q's suffix was the one
    // exhausted (j reached the end while p still has bytes)
    i < n
  }

  /** ranks(pos − 1) = 1-based lexicographic rank of the suffix starting
    * at 1-based character position `pos` — exactly the prefix-doubling
    * dense rank (all suffixes of one string are distinct, so dense rank
    * = position in sorted order).
    */
  def rankArray(s: UTF8String): ArrayData = {
    val b = s.getBytes
    val sorted = sortedPositions(b)
    val ranks = new Array[Long](b.length)
    var k = 0
    while (k < sorted.length) { ranks(sorted(k)) = k + 1L; k += 1 }
    new GenericArrayData(ranks)
  }

  /** `[max LCP, count(LCP ≥ minLen)]` over lexicographically adjacent
    * suffix pairs; `[0, 0]` when fewer than two suffixes exist (the
    * operators filter length ≥ 2 upstream, so that row never occurs).
    */
  def repeatStats(s: UTF8String, minLen: Int): ArrayData = {
    val b = s.getBytes
    val sorted = sortedPositions(b)
    var maxLcp = 0L
    var nLong = 0L
    var k = 1
    while (k < sorted.length) {
      var i = sorted(k - 1)
      var j = sorted(k)
      var lcp = 0L
      while (i < b.length && j < b.length && b(i) == b(j)) {
        lcp += 1L; i += 1; j += 1
      }
      if (lcp > maxLcp) maxLcp = lcp
      if (lcp >= minLen) nLong += 1L
      k += 1
    }
    new GenericArrayData(Array(maxLcp, nLong))
  }

  /** Column-API entry points. */
  def ranks(x: Column): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(SuffixRankArray(
      org.apache.spark.sql.classic.ExpressionUtils.expression(x)))

  def repeat(x: Column, minLen: Int): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(LongestRepeatStats(
      org.apache.spark.sql.classic.ExpressionUtils.expression(x), minLen))
}
