package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Op, Tables}

/** Skew-mitigation patterns. AQE's skew-join split handles most runtime
  * skew (`spark.sql.adaptive.enabled`, on by default); explicit salting
  * is the static fallback when one join key dominates so heavily that a
  * single task would own it — the pattern is encoded here as an operator
  * whose oracle is simply the UNSALTED join: salting must be a pure
  * physical rewrite with zero semantic effect.
  */
object Skew {

  /** Salted inner equi-join: the probe side's key is extended with a
    * salt in [0, n); the build side is replicated n ways with an
    * exploded salt column. The shuffle key becomes (key, salt),
    * spreading one hot key over n tasks at the price of replicating the
    * build side n×.
    *
    * The salt MUST vary within a key — a salt derived from the key
    * alone would put every row of the hot key back in one task and
    * mitigate nothing. It also must be deterministic per row (not
    * rand()), or shuffle-stage retries recompute different salts and
    * can drop/duplicate rows. Hashing the whole probe row satisfies
    * both: a hot key's rows spread ~uniformly, and retries agree.
    */
  /** Deterministic per-row salt in [0, salts): hash of the whole row. */
  def saltColumn(df: DataFrame, salts: Int): org.apache.spark.sql.Column =
    pmod(xxhash64(df.columns.map(col): _*), lit(salts.toLong))

  def saltedJoin(left: DataFrame, right: DataFrame, leftKey: String,
      rightKey: String, salts: Int): DataFrame = {
    val salted = left.withColumn("_salt", saltColumn(left, salts))
    val replicated = right.withColumn("_salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    salted.join(replicated,
      salted(leftKey) === replicated(rightKey) &&
        salted("_salt") === replicated("_salt"))
      .drop("_salt")
  }

  /** The fan-out join (J8) computed through an 8-way salt — result must
    * be row-identical to the plain join, which is exactly what the
    * oracle asserts.
    */
  def jSalted(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    val o = Tables(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
    saltedJoin(li, o, "l_orderkey", "o_orderkey", 8)
      .select(col("o_orderkey"), col("o_totalprice"),
        col("l_linenumber"), col("l_quantity"))
  }

  val jSaltedSql: String =
    """SELECT o_orderkey, o_totalprice, l_linenumber, l_quantity
      |FROM orders JOIN lineitem ON l_orderkey = o_orderkey""".stripMargin

  val ops: Seq[Op] = Seq(
    Op("j_salted", jSalted _, Some(jSaltedSql)),
  )
}
