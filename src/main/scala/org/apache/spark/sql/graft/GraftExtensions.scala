package org.apache.spark.sql.graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session wiring for the engine's Catalyst extensions: the native
  * expressions' SQL surface (`spark.sql("SELECT cosine_sim(a, b) ...")`
  * alongside the Column API) and the `RangeJoinBanding` optimizer rule
  * (timestamp range joins become banded equi-joins instead of nested
  * loops).
  *
  * Two entry points, per the two session lifecycles:
  *  - `GraftExtensions` for session construction
  *    (`.withExtensions(new GraftExtensions)` or
  *    `spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions`);
  *  - `register(spark)` for an already-running session (tests, REPL).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(GraftExtensions.cosineSimDescriptor)
    e.injectFunction(GraftExtensions.hashEmbedVecDescriptor)
    e.injectFunction(GraftExtensions.kllSketchAggDescriptor)
    e.injectFunction(GraftExtensions.kllMergeAggDescriptor)
    e.injectFunction(GraftExtensions.kllQuantileDescriptor)
    e.injectFunction(GraftExtensions.textStatsDescriptor)
    e.injectFunction(GraftExtensions.htmlCleanDescriptor)
    e.injectFunction(GraftExtensions.zvalueDescriptor)
    e.injectFunction(GraftExtensions.gopherStatsDescriptor)
    e.injectOptimizerRule(_ => RangeJoinBanding)
  }
}

object GraftExtensions {

  private val cosineSimBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2, "cosine_sim takes exactly 2 arguments")
    CosineSim(exprs(0), exprs(1))
  }

  private[graft] val cosineSimDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      cosineSimBuilder)

  private val hashEmbedVecBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2, "hash_embed_vec takes (tokens, dim)")
    val dim = exprs(1) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"hash_embed_vec dim must be an int literal, got $other")
    }
    HashEmbedVec(exprs(0), dim)
  }

  private[graft] val hashEmbedVecDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("hash_embed_vec"),
      new ExpressionInfo(classOf[HashEmbedVec].getName, "hash_embed_vec"),
      hashEmbedVecBuilder)

  // -------------------------------------------------- KLL SQL surface
  // The sketch pipeline in SQL: `kll_sketch_agg(v [, k])` per group,
  // stored bytes rolled up with `kll_merge_agg(sk [, k])`, read with
  // `kll_quantile(sk, p)` — the store-then-rollup shape documented at
  // KllSketch.scala, reachable without the Column API.

  // Function resolution runs BEFORE constant folding, so a SQL argument
  // like `CAST(0.9 AS DOUBLE)` is not yet a Literal — accept anything
  // foldable and evaluate it here.
  private def intLit(e: Expression, what: String): Int =
    if (!e.foldable)
      throw new IllegalArgumentException(s"$what must be an int literal, got $e")
    else e.eval() match {
      case i: Int => i
      case l: Long => l.toInt
      case other =>
        throw new IllegalArgumentException(s"$what must be an int literal, got $other")
    }

  private def doubleLit(e: Expression, what: String): Double =
    if (!e.foldable)
      throw new IllegalArgumentException(s"$what must be a numeric literal, got $e")
    else e.eval() match {
      case d: Double => d
      case d: org.apache.spark.sql.types.Decimal => d.toDouble
      case f: Float => f.toDouble
      case i: Int => i.toDouble
      case l: Long => l.toDouble
      case other =>
        throw new IllegalArgumentException(s"$what must be numeric, got $other")
    }

  private val kllSketchAggBuilder: Seq[Expression] => Expression = {
    case Seq(child) => KllDoublesAgg(child, KllColumn.DefaultK)
    case Seq(child, k) => KllDoublesAgg(child, intLit(k, "kll_sketch_agg k"))
    case _ => throw new IllegalArgumentException("kll_sketch_agg(value[, k])")
  }

  private[graft] val kllSketchAggDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("kll_sketch_agg"),
      new ExpressionInfo(classOf[KllDoublesAgg].getName, "kll_sketch_agg"),
      kllSketchAggBuilder)

  private val kllMergeAggBuilder: Seq[Expression] => Expression = {
    case Seq(child) => KllMergeAgg(child, KllColumn.DefaultK)
    case Seq(child, k) => KllMergeAgg(child, intLit(k, "kll_merge_agg k"))
    case _ => throw new IllegalArgumentException("kll_merge_agg(sketch[, k])")
  }

  private[graft] val kllMergeAggDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("kll_merge_agg"),
      new ExpressionInfo(classOf[KllMergeAgg].getName, "kll_merge_agg"),
      kllMergeAggBuilder)

  private val kllQuantileBuilder: Seq[Expression] => Expression = {
    case Seq(sketch, p) => KllQuantile(sketch, doubleLit(p, "kll_quantile p"))
    case _ => throw new IllegalArgumentException("kll_quantile(sketch, p)")
  }

  private[graft] val kllQuantileDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("kll_quantile"),
      new ExpressionInfo(classOf[KllQuantile].getName, "kll_quantile"),
      kllQuantileBuilder)

  private val textStatsBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 1, "text_stats takes exactly 1 argument")
    TextStats(exprs(0))
  }

  private[graft] val textStatsDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("text_stats"),
      new ExpressionInfo(classOf[TextStats].getName, "text_stats"),
      textStatsBuilder)

  private val htmlCleanBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 1, "html_clean takes exactly 1 argument")
    HtmlClean(exprs(0))
  }

  private[graft] val htmlCleanDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("html_clean"),
      new ExpressionInfo(classOf[HtmlClean].getName, "html_clean"),
      htmlCleanBuilder)

  private val zvalueBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2, "zvalue takes exactly 2 arguments")
    ZValue(exprs(0), exprs(1))
  }

  private[graft] val zvalueDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("zvalue"),
      new ExpressionInfo(classOf[ZValue].getName, "zvalue"),
      zvalueBuilder)

  private val gopherStatsBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 1, "gopher_stats takes exactly 1 argument")
    GopherStats(exprs(0))
  }

  private[graft] val gopherStatsDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("gopher_stats"),
      new ExpressionInfo(classOf[GopherStats].getName, "gopher_stats"),
      gopherStatsBuilder)

  /** Register on a live session's function registry. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("cosine_sim", cosineSimBuilder, "built-in")
    reg.createOrReplaceTempFunction("hash_embed_vec", hashEmbedVecBuilder, "built-in")
    reg.createOrReplaceTempFunction("kll_sketch_agg", kllSketchAggBuilder, "built-in")
    reg.createOrReplaceTempFunction("kll_merge_agg", kllMergeAggBuilder, "built-in")
    reg.createOrReplaceTempFunction("kll_quantile", kllQuantileBuilder, "built-in")
    reg.createOrReplaceTempFunction("text_stats", textStatsBuilder, "built-in")
    reg.createOrReplaceTempFunction("html_clean", htmlCleanBuilder, "built-in")
    reg.createOrReplaceTempFunction("zvalue", zvalueBuilder, "built-in")
    reg.createOrReplaceTempFunction("gopher_stats", gopherStatsBuilder, "built-in")
  }
}
