package graft

import org.apache.spark.sql.functions._

import graft.sources.Bucketing

/** Co-located joins via bucketing: same-bucketed tables join with NO
  * exchange (and, being sorted, no per-side sort) — the persistent
  * answer to fact-to-fact shuffle cost at scale.
  */
class BucketingSpec extends SparkSpec {

  test("same-bucketed fact tables join without a shuffle") {
    val orders = Tables(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
    val lineitem = Tables(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"))
    Bucketing.writeBucketed(orders, "orders_b", "o_orderkey", 4)
    Bucketing.writeBucketed(lineitem, "lineitem_b", "l_orderkey", 4)
    // Disable broadcast so the fixture-sized tables take the fact-to-fact
    // (sort-merge) path this layout exists for.
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("orders_b").join(spark.table("lineitem_b"),
        col("o_orderkey") === col("l_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange"), s"expected exchange-free plan:\n$plan")
      // Same rows as the unbucketed join — layout is invisible to results.
      val expected = orders.join(lineitem,
        col("o_orderkey") === col("l_orderkey")).count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
