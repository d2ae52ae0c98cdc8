package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: every integer counter behind the Gopher
  * quality rule-set (`Curation.gopherMetrics`) in ONE primitive byte
  * pass, returned as `array<long>`:
  *
  *   [ n_words, word_chars, alpha_words, hash_count, ellipsis_count,
  *     n_lines, bullet_lines, ellipsis_lines, stop_hits ]
  *
  * Semantics replicate the declarative chain EXACTLY — Spark's
  * `split(str, regex)` runs with limit = -1, so EVERY empty piece is
  * kept (leading, interior, trailing): pieces = separator runs + 1,
  * lines = newline count + 1, and `""` splits to one empty piece.
  * Swapping this in changes the plan, not the result;
  * equality with the chain is pinned Spark-vs-Spark on planted edge
  * cases AND corpus-wide by the oracled `_check` twin against the
  * chain's DuckDB SQL.
  *
  * Exists because the chain builds three arrays per row (regex word
  * split, line split, per-element lambdas) — the boxed-intermediate
  * profile that cost `cosine_sim` 30× before its native pass. One
  * byte walk, no allocation beyond the 9-slot result.
  */
case class GopherStats(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    GopherStats.scan(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graft.GopherStats.scan($a);")

  override protected def withNewChildInternal(newChild: Expression): GopherStats =
    copy(child = newChild)
}

object GopherStats {

  /** The rule-set's stop list — single source of truth; the chain in
    * `Curation` references THIS so expression and chain cannot drift. */
  val Stops: Seq[String] = Seq("the", "a", "and", "of", "to", "in", "is")

  private val StopBytes: Array[Array[Byte]] =
    Stops.map(_.getBytes("UTF-8")).toArray

  // scalastyle:off cyclomatic.complexity method.length
  def scan(s: UTF8String): ArrayData = {
    val n = s.numBytes()
    var nWords = 1L // split(limit=-1): pieces = separator runs + 1
    var wordChars = 0L; var alphaWords = 0L
    var hashes = 0L; var ellipses = 0L
    var nLines = 1L // split("\n"): pieces = newline count + 1
    var bulletLines = 0L; var ellipsisLines = 0L
    val stopHit = new Array[Boolean](StopBytes.length)

    def isSep(b: Byte): Boolean = b == ' ' || b == '\n'

    // --- token state (empty pieces contribute nothing here)
    var tokStart = -1
    var tokAlpha = true
    var inSepRun = false
    def closeToken(endExcl: Int): Unit = if (tokStart >= 0) {
      val len = endExcl - tokStart
      // CHARACTERS, not bytes (the chain's length()): UTF-8
      // continuation bytes (10xxxxxx) don't start a character
      var cc = tokStart
      while (cc < endExcl) {
        if ((s.getByte(cc) & 0xC0) != 0x80) wordChars += 1
        cc += 1
      }
      if (tokAlpha && len > 0) alphaWords += 1
      var k = 0
      while (k < StopBytes.length) {
        val sb = StopBytes(k)
        if (!stopHit(k) && sb.length == len) {
          var j = 0
          var eq = true
          while (eq && j < len) {
            if (s.getByte(tokStart + j) != sb(j)) eq = false
            j += 1
          }
          if (eq) stopHit(k) = true
        }
        k += 1
      }
      tokStart = -1; tokAlpha = true
    }

    // --- line state (every segment is a line, empties included)
    var lineStart = 0
    def closeLine(endExcl: Int): Unit = {
      val len = endExcl - lineStart
      if (len > 0) {
        val b0 = s.getByte(lineStart)
        // '-'/'*' single-byte bullets; U+2022 is e2 80 a2
        if (b0 == '-' || b0 == '*' ||
            (len >= 3 && (b0 & 0xFF) == 0xE2 &&
              (s.getByte(lineStart + 1) & 0xFF) == 0x80 &&
              (s.getByte(lineStart + 2) & 0xFF) == 0xA2)) bulletLines += 1
        if (len >= 3 && s.getByte(endExcl - 1) == '.' &&
            s.getByte(endExcl - 2) == '.' &&
            s.getByte(endExcl - 3) == '.') ellipsisLines += 1
      }
      lineStart = endExcl + 1
    }

    var dotRun = 0L
    var i = 0
    while (i < n) {
      val b = s.getByte(i)
      if (b == '.') dotRun += 1
      else { ellipses += dotRun / 3; dotRun = 0 }
      if (b == '#') hashes += 1
      if (isSep(b)) {
        closeToken(i)
        if (!inSepRun) nWords += 1 // one new piece per separator RUN
        inSepRun = true
      } else {
        inSepRun = false
        if (tokStart < 0) { tokStart = i; tokAlpha = true }
        if (b < 'a' || b > 'z') tokAlpha = false
      }
      if (b == '\n') { nLines += 1; closeLine(i) }
      i += 1
    }
    ellipses += dotRun / 3
    closeToken(n)
    closeLine(n)

    new GenericArrayData(Array(nWords, wordChars, alphaWords, hashes,
      ellipses, nLines, bulletLines, ellipsisLines,
      stopHit.count(identity).toLong))
  }
  // scalastyle:on cyclomatic.complexity method.length

  def apply(text: Column): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(GopherStats(
      org.apache.spark.sql.classic.ExpressionUtils.expression(text)))
}
