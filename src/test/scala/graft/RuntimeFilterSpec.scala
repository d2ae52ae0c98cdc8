package graft

import org.apache.spark.sql.functions._
import graft.operators.{History, RuntimeFilter}

class RuntimeFilterSpec extends SparkSpec {

  test("bloom semi-join equals the plain semi join (false positives removed)") {
    val li = Tables(spark, sfDir, "lineitem")
    val part = Tables(spark, sfDir, "part")
      .where(col("p_name").startsWith("red")).select(col("p_partkey"))
    val plain = li.join(part, li("l_partkey") === part("p_partkey"),
      "left_semi").select("l_orderkey", "l_linenumber")
    val bloomed = RuntimeFilter.bloomSemiJoin(li, part, "l_partkey",
      "p_partkey", expectedKeys = 1 << 14).select("l_orderkey", "l_linenumber")
    assert(bloomed.exceptAll(plain).isEmpty && plain.exceptAll(bloomed).isEmpty)
  }

  test("bloom prefilter prunes the probe side map-side") {
    val li = Tables(spark, sfDir, "lineitem")
    val part = Tables(spark, sfDir, "part")
      .where(col("p_name").startsWith("red")).select(col("p_partkey"))
    val bloom = RuntimeFilter.buildBloom(part, "p_partkey", 1 << 14, 0.01)
    val total = li.count()
    val kept = li.where(
      RuntimeFilter.bloomPredicate(bloom, col("l_partkey"))).count()
    val trueMatches = li.join(part, li("l_partkey") === part("p_partkey"),
      "left_semi").count()
    // everything that should pass passes; what passes beyond that is
    // bounded by fpp (1%) with generous slack for hash luck
    assert(kept >= trueMatches, "bloom dropped a true match")
    assert(kept <= trueMatches + (total * 0.05).toLong + 10,
      s"bloom passed $kept of $total, true $trueMatches — no pruning?")
    assert(kept < total, "bloom pruned nothing")
  }

  test("bloom membership test sits in the plan as the codegen'd might_contain predicate") {
    val li = Tables(spark, sfDir, "lineitem")
    val part = Tables(spark, sfDir, "part")
      .where(col("p_name").startsWith("red")).select(col("p_partkey"))
    val bloom = RuntimeFilter.buildBloom(part, "p_partkey", 1 << 14, 0.01)
    val plan = li.where(RuntimeFilter.bloomPredicate(bloom, col("l_partkey")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan.take(2000))
  }

  test("scd2: runs collapse, intervals chain, exactly one open run per entity") {
    val scd = History.scd2(spark, sfDir).cache()
    // every entity has exactly one open (is_current) run
    val entities = scd.select("custkey").distinct().count()
    assert(scd.where(col("is_current")).count() == entities)
    // adjacent runs differ in status (no uncollapsed repeats)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("custkey")).orderBy(col("version"))
    val repeats = scd.withColumn("p", lag(col("status"), 1).over(w))
      .where(col("p") === col("status")).count()
    assert(repeats == 0, s"$repeats uncollapsed runs")
    // intervals chain: run v's valid_to equals run v+1's valid_from
    val chain = scd.as("a").join(scd.as("b"),
      col("a.custkey") === col("b.custkey") &&
        col("a.version") + 1 === col("b.version"))
      .where(col("a.valid_to") =!= col("b.valid_from")).count()
    assert(chain == 0, s"$chain broken interval chains")
    scd.unpersist()
  }

  test("scd2 as-of lookup returns at most one state per entity") {
    val asOf = History.asOfState(spark, sfDir)
    val dup = asOf.groupBy("custkey").count().where(col("count") > 1).count()
    assert(dup == 0)
    assert(asOf.count() > 0)
  }
}
