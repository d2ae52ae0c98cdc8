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

  /** Register on a live session's function registry. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", cosineSimBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hash_embed_vec", hashEmbedVecBuilder, "built-in")
  }
}
