package graft.operators

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.BloomColumn

import graft.{Op, Tables}

/** Explicit runtime-filter patterns — shuffle-VOLUME reduction for joins
  * whose build side is too large to broadcast but whose key set is far
  * smaller than the probe side (the standard 100 TB shape: a fact table
  * probed against a filtered dimension that still has millions of keys).
  *
  * A broadcast join ships the whole build side to every executor; a
  * shuffle join ships the whole PROBE side through an exchange. The
  * bloom semi-join is the middle path: ship only a fixed-size bitmap of
  * the build keys, drop probe rows map-side BEFORE the exchange, and
  * let the exact join run on the survivors. False positives only cost
  * wasted shuffle rows — the trailing exact join removes them — so the
  * operator is EXACT and its oracle is the plain semi join.
  *
  * Spark's `InjectRuntimeFilter` plants this same shape automatically,
  * but only under its own heuristics (creation-side size thresholds,
  * shuffle presence, one filter per application). The operator form
  * exists so a pipeline can DEMAND the filter — and so its pruning is
  * pinned by spec rather than left to optimizer mood.
  */
object RuntimeFilter {

  /** Build a bloom bitmap over `dim`'s join key. The aggregation runs
    * distributed (per-partition bitmaps OR-merged); only the final
    * `numBits/8`-byte bitmap lands on the driver — the same driver-side
    * materialization a ScalarSubquery runtime filter pays, independent
    * of build-side row count.
    */
  def buildBloom(dim: DataFrame, key: String, expectedKeys: Long,
      fpp: Double): Array[Byte] = {
    val bf = dim.select(xxhash64(col(key)).as("h"))
      .stat.bloomFilter("h", expectedKeys, fpp)
    val out = new ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }

  /** Exact semi-join with a bloom prefilter on the probe side: probe
    * rows whose key cannot be in `dim` die map-side (codegen'd bitmap
    * test, no exchange crossed); survivors — true matches plus the fpp
    * share of false positives — flow into the exact semi join.
    */
  def bloomSemiJoin(probe: DataFrame, dim: DataFrame, probeKey: String,
      dimKey: String, expectedKeys: Long, fpp: Double = 0.01): DataFrame = {
    val bloom = buildBloom(dim, dimKey, expectedKeys, fpp)
    probe.where(bloomPredicate(bloom, col(probeKey)))
      .join(dim, probe(probeKey) === dim(dimKey), "left_semi")
  }

  /** The map-side membership test alone (exposed for spec pinning). */
  def bloomPredicate(bloom: Array[Byte], key: Column): Column =
    BloomColumn.mightContain(bloom, key)

  /** Lineitem rows belonging to red parts — a selective dimension
    * (~1/8 of `part`) probed by the largest fact table. At fixture
    * scale AQE would happily broadcast the dim; the bloom path is the
    * shape that survives when the dim has outgrown the broadcast
    * threshold but its bitmap (fpp 1% ≈ 1.2 bytes/key) has not.
    * `expectedKeys` is sized from the dimension's row count — in
    * production that number comes from table stats
    * (`Tables.registerAllWithStats`), not a scan.
    */
  def jBloomSemi(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables(spark, dir, "part")
      .where(col("p_name").startsWith("red"))
      .select(col("p_partkey"))
    val li = Tables(spark, dir, "lineitem")
    bloomSemiJoin(li, part, "l_partkey", "p_partkey",
      expectedKeys = 1 << 16, fpp = 0.01)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_quantity"))
  }

  val jBloomSemiSql: String =
    """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity
      |FROM lineitem
      |WHERE l_partkey IN (SELECT p_partkey FROM part
      |                    WHERE p_name LIKE 'red%')""".stripMargin

  val ops: Seq[Op] = Seq(
    Op("j_bloom_semi", jBloomSemi _, Some(jBloomSemiSql)),
  )
}
