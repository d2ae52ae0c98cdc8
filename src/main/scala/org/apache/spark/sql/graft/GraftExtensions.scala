package org.apache.spark.sql.graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL-surface registration for the engine's native expressions, so
  * `spark.sql("SELECT cosine_sim(a, b) ...")` works alongside the Column
  * API.
  *
  * Two entry points, per the two session lifecycles:
  *  - `GraftExtensions` for session construction
  *    (`.withExtensions(new GraftExtensions)` or
  *    `spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions`);
  *  - `register(spark)` for an already-running session (tests, REPL).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    e.injectFunction(GraftExtensions.cosineSimDescriptor)
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

  /** Register on a live session's function registry. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", cosineSimBuilder, "built-in")
}
