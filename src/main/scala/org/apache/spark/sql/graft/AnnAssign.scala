package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/** Native ANN ingest kernel: one embedding in, `struct(cell, codes)`
  * out — the IVF cell (argmax cosine over the literal centroids,
  * score desc / id asc ties) and the M PQ codes (argmin L2 per
  * sub-space, code-asc ties) as ONE compiled per-row evaluation.
  *
  * Exists for the same reason as `CosineSim`: the higher-order-function
  * formulation (`transform` + `array_sort` over 16 centroid structs and
  * M×Ks codebook structs) allocates and sorts ~530 boxed structs per
  * row — measured 40 s for a 20k-vector single-task scan at sf1, vs
  * primitive loops doing the same ~5k flops in microseconds. The
  * served artifacts are bounded by contract (NList=16 rows, M·Ks=512
  * rows), so they ride the expression as plain JVM arrays.
  *
  * ARITHMETIC PARITY is the load-bearing property — the batch
  * registration is hash-exact against a DuckDB oracle and the
  * streaming twin is pinned row-for-row against the index build paths:
  *  - cosine replicates `CosineSim` exactly: one pass accumulating
  *    dot/‖a‖²/‖c‖² in doubles sequentially, `dot / sqrt(na*nc)`,
  *    NULL (not NaN) on zero norms or length mismatch. The centroid
  *    norm is precomputed — same element order, same fold, same bits.
  *  - sub-space L2 replicates `pqL2`: sequential fold of
  *    `(a_i − b_i)²` in doubles from 0.0; a short slice (embedding
  *    dimension below the sub-space end) yields NULL like zip_with's
  *    null padding.
  *  - candidate order replicates Spark's ascending struct sort on
  *    (neg-score, id): nulls FIRST, NaN greater than every value and
  *    equal to itself (`nanSafeCompareDoubles`), ties to the smaller
  *    id/code.
  */
case class AnnAssign(
    child: Expression,
    cents: Seq[(Long, Seq[Float])],
    book: Seq[(Int, Int, Seq[Float])],
    m: Int,
    dsub: Int)
  extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = StructType(Seq(
    StructField("cell", LongType, nullable = true),
    StructField("codes", ArrayType(IntegerType, containsNull = false),
      nullable = false)))

  @transient private lazy val centIds: Array[Long] = cents.map(_._1).toArray
  @transient private lazy val centEmb: Array[Array[Double]] =
    cents.map(_._2.map(_.toDouble).toArray).toArray
  // ‖c‖² by the SAME sequential fold the per-row loop would use
  @transient private lazy val centNorm: Array[Double] = centEmb.map { c =>
    var s = 0.0; var i = 0
    while (i < c.length) { s += c(i) * c(i); i += 1 }
    s
  }
  @transient private lazy val bookCodes: Array[Array[Int]] =
    (0 until m).map(mm =>
      book.filter(_._1 == mm).map(_._2).toArray).toArray
  @transient private lazy val bookSubs: Array[Array[Array[Double]]] =
    (0 until m).map(mm =>
      book.filter(_._1 == mm)
        .map(_._3.map(_.toDouble).toArray).toArray).toArray

  /** Spark's nan-safe double ordering: NaN equal to itself and greater
    * than everything; -0.0 equal to 0.0 (primitive compares).
    */
  private def dcmp(x: Double, y: Double): Int =
    if (x < y) -1 else if (x > y) 1
    else {
      val xn = java.lang.Double.isNaN(x)
      val yn = java.lang.Double.isNaN(y)
      if (xn && yn) 0 else if (xn) 1 else if (yn) -1 else 0
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val a = new Array[Double](n)
    var i = 0
    while (i < n) { a(i) = arr.getFloat(i).toDouble; i += 1 }
    // ‖a‖² once — the same value CosineSim's fused loop accumulates
    // (identical element sequence and fold order)
    var na = 0.0
    i = 0
    while (i < n) { na += a(i) * a(i); i += 1 }

    // cell: ascending (negcos, id) with nulls first — null cosine
    // (zero norm / length mismatch) sorts ahead, matching the HOF form
    var bestIdx = -1
    var bestNeg = 0.0
    var bestNull = false
    var c = 0
    while (c < centIds.length) {
      val ce = centEmb(c)
      var thisNull = ce.length != n
      var neg = 0.0
      if (!thisNull) {
        var dot = 0.0
        var j = 0
        while (j < n) { dot += a(j) * ce(j); j += 1 }
        val denom = na * centNorm(c)
        if (denom == 0.0) thisNull = true
        else neg = -(dot / math.sqrt(denom))
      }
      val better =
        if (bestIdx < 0) true
        else if (thisNull != bestNull) thisNull // nulls first
        else if (thisNull) centIds(c) < centIds(bestIdx)
        else {
          val d = dcmp(neg, bestNeg)
          d < 0 || (d == 0 && centIds(c) < centIds(bestIdx))
        }
      if (better) { bestIdx = c; bestNeg = neg; bestNull = thisNull }
      c += 1
    }

    // codes: per sub-space ascending (d2, code) with nulls first —
    // a short slice yields null d2, zip_with's null-padding semantics
    val codes = new Array[Int](m)
    var mm = 0
    while (mm < m) {
      val cands = bookCodes(mm)
      val subs = bookSubs(mm)
      val off = mm * dsub
      val short = off + dsub > n
      var bestCode = 0
      var bestD2 = 0.0
      var haveBest = false
      var bNull = false
      var k = 0
      while (k < cands.length) {
        var thisNull = short
        var d2 = 0.0
        if (!thisNull) {
          val b = subs(k)
          var j = 0
          while (j < dsub) {
            val diff = a(off + j) - b(j)
            d2 += diff * diff
            j += 1
          }
        }
        val better =
          if (!haveBest) true
          else if (thisNull != bNull) thisNull
          else if (thisNull) cands(k) < bestCode
          else {
            val d = dcmp(d2, bestD2)
            d < 0 || (d == 0 && cands(k) < bestCode)
          }
        if (better) { bestCode = cands(k); bestD2 = d2; haveBest = true
          bNull = thisNull }
        k += 1
      }
      codes(mm) = bestCode
      mm += 1
    }

    // the HOF form picks sorted[0].id — a real id even when its score
    // is null (degenerate inputs); null only on an empty centroid set
    val cellVal: Any = if (bestIdx < 0) null else centIds(bestIdx)
    new GenericInternalRow(Array[Any](cellVal, new GenericArrayData(codes)))
  }

  override protected def withNewChildInternal(newChild: Expression): AnnAssign =
    copy(child = newChild)
}

object AnnAssign {
  /** Column-API entry point. */
  def apply(emb: Column, cents: Seq[(Long, Seq[Float])],
      book: Seq[(Int, Int, Seq[Float])], m: Int, dsub: Int): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(AnnAssign(
      org.apache.spark.sql.classic.ExpressionUtils.expression(emb),
      cents, book, m, dsub))
}
