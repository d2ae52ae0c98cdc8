package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ArrayType(FloatType)` embedding columns, built from
  * Spark's codegen'd higher-order functions (`zip_with` / `transform` /
  * `aggregate`) — no UDFs, so the expressions stay inside whole-stage
  * codegen and push through the columnar reader untouched.
  *
  * All arithmetic is double-precision with a sequential left-fold
  * accumulation — the same order DuckDB's `list_sum(list_transform(...))`
  * uses, which keeps similarity values bit-identical to the oracle.
  */
object VectorFunctions {

  /** Σ aᵢ·bᵢ in double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Σ aᵢ² in double precision. */
  def normSq(a: Column): Column =
    aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Cosine similarity in double precision — backed by the native
    * codegen'd `CosineSim` expression (the HOF composition
    * `dot/sqrt(normSq·normSq)` allocates boxed arrays per row and was
    * measured 30× slower on all-pairs workloads; identical values).
    */
  def cosine(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.CosineSim(a, b)
}
