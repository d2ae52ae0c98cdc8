package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.RangeJoinBanding

/** The range-join banding optimizer rule: a naive timestamp range join
  * (no equality conjunct) must stop planning as BroadcastNestedLoopJoin
  * and produce identical results; with an equality conjunct the band
  * joins in as an extra key. Results are pinned against the SAME query
  * executed without the rule.
  */
class RangeJoinRuleSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  private def hasBnlj(plan: SparkPlan): Boolean =
    collectWithSubqueries(plan) {
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    }.nonEmpty

  private def fixtures(): (DataFrame, DataFrame) = {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def ts(sec: Long) = new java.sql.Timestamp(t0 + sec * 1000L)
    // Views straddling a 14400 s band boundary; clicks at the window
    // edge (excluded), just inside (included), across bands (included).
    val views = Seq(
      (1L, 7L, ts(14000)), (2L, 7L, ts(100)), (3L, 8L, ts(14500)))
      .toDF("view_id", "v_user", "v_ts")
    val clicks = Seq(
      (10L, 7L, ts(14100)), (11L, 7L, ts(20000)), (12L, 7L, ts(14000 + 14400)),
      (13L, 7L, ts(13999)), (14L, 8L, ts(28899)), (15L, 9L, ts(14100)))
      .toDF("click_id", "c_user", "c_ts")
    (views, clicks)
  }

  private def withRule[A](body: => A): A = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ RangeJoinBanding
    try body
    finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ eq RangeJoinBanding)
  }

  test("pure range join: BNLJ eliminated, results identical") {
    val (views, clicks) = fixtures()
    def query() = views.join(clicks,
      col("c_ts") >= col("v_ts") &&
        col("c_ts") < col("v_ts") + expr("INTERVAL 14400 SECONDS"))
      .select(col("view_id"), col("click_id"))

    val naive = query()
    naive.collect() // force planning
    assert(hasBnlj(naive.queryExecution.executedPlan),
      "precondition: the naive range join should be a nested loop")
    val expected = naive.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    withRule {
      val banded = query()
      val got = banded.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected)
      assert(!hasBnlj(banded.queryExecution.executedPlan),
        "banding rule must turn the range join into an equi-join")
      // (1,12) is the exact-window-edge pair: strict upper bound holds
      assert(!got.contains((1L, 12L)) && got.contains((1L, 10L)) && got.contains((1L, 11L)))
    }
  }

  test("range join with equality key: band becomes an extra hash key") {
    val (views, clicks) = fixtures()
    def query() = views.join(clicks,
      col("v_user") === col("c_user") &&
        col("c_ts") >= col("v_ts") &&
        col("c_ts") < col("v_ts") + expr("INTERVAL 14400 SECONDS"))
      .select(col("view_id"), col("click_id"))

    val expected = query().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected == Set((1L, 10L), (1L, 11L), (2L, 10L), (2L, 13L), (3L, 14L)))
    withRule {
      val got = query().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected)
      val keys = query().queryExecution.executedPlan.toString()
      assert(keys.contains("__graft_band"),
        "band column should participate in the physical join")
    }
  }

  test("symmetric window |b - a| <= w: banded, results identical") {
    val (views, clicks) = fixtures()
    def query() = views.join(clicks,
      col("c_ts") >= col("v_ts") - expr("INTERVAL 300 SECONDS") &&
        col("c_ts") <= col("v_ts") + expr("INTERVAL 300 SECONDS"))
      .select(col("view_id"), col("click_id"))

    val naive = query()
    naive.collect()
    assert(hasBnlj(naive.queryExecution.executedPlan))
    val expected = naive.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // sanity: view 1 @14000 pairs with clicks @14100 (+100) and @13999 (-1)
    assert(expected.contains((1L, 10L)) && expected.contains((1L, 13L)))

    withRule {
      val banded = query()
      val got = banded.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected)
      assert(!hasBnlj(banded.queryExecution.executedPlan))
    }
  }

  test("TIMESTAMP_NTZ range join: banded via the UTC epoch hop, results identical") {
    // NTZ cannot Cast to LongType (canCast forbids NTZ→numeric); the rule
    // must derive epoch seconds through the UTC instant hop instead of
    // emitting an invalid cast that fails at planning.
    val (views0, clicks0) = fixtures()
    val views = views0.selectExpr(
      "view_id", "v_user", "CAST(v_ts AS TIMESTAMP_NTZ) AS v_ts")
    val clicks = clicks0.selectExpr(
      "click_id", "c_user", "CAST(c_ts AS TIMESTAMP_NTZ) AS c_ts")
    assert(views.schema("v_ts").dataType ==
      org.apache.spark.sql.types.TimestampNTZType)
    def query() = views.join(clicks,
      col("v_user") === col("c_user") &&
        col("c_ts") >= col("v_ts") &&
        col("c_ts") < col("v_ts") + expr("INTERVAL 14400 SECONDS"))
      .select(col("view_id"), col("click_id"))

    val expected = query().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected == Set((1L, 10L), (1L, 11L), (2L, 10L), (2L, 13L), (3L, 14L)))
    withRule {
      val banded = query()
      val got = banded.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected)
      assert(banded.queryExecution.executedPlan.toString().contains("__graft_band"),
        "NTZ range join should band, not fall back or fail")
    }
  }

  test("Events.intervalJoin dogfoods the rule: __graft_band in the physical plan") {
    // The operator is written as the plain declarative range join; the
    // banding must come from the optimizer rule, not hand-written bands.
    val noRule = graft.operators.Events.intervalJoin(spark, sfDir)
    assert(!noRule.queryExecution.optimizedPlan.toString.contains("__graft_band"))
    val expected = noRule.collect().map(_.getLong(0)).sorted.toSeq
    withRule {
      val banded = graft.operators.Events.intervalJoin(spark, sfDir)
      val got = banded.collect().map(_.getLong(0)).sorted.toSeq
      assert(got == expected)
      assert(banded.queryExecution.executedPlan.toString().contains("__graft_band"),
        "operator's physical plan must carry the rule-generated band key")
    }
  }

  test("Events.windowFunnel dogfoods the rule: __graft_band pins BOTH chain joins") {
    // Same contract as intervalJoin: the view→click and click→purchase
    // range conditions are written declaratively and must be banded by
    // the optimizer rule — a rule-scope regression would silently fall
    // back to per-user cross products, so the executed plan is pinned.
    val noRule = graft.operators.Events.windowFunnel(spark, sfDir)
    assert(!noRule.queryExecution.optimizedPlan.toString.contains("__graft_band"))
    val expected = noRule.collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    withRule {
      val banded = graft.operators.Events.windowFunnel(spark, sfDir)
      val got = banded.collect()
        .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
      assert(got == expected)
      val plan = banded.queryExecution.executedPlan.toString()
      val hits = "__graft_band".r.findAllMatchIn(plan).size
      assert(hits >= 2,
        s"both funnel chain joins must carry the rule's band key (saw $hits)")
    }
  }

  test("rule leaves non-range joins and non-inner shapes untouched") {
    val (views, clicks) = fixtures()
    withRule {
      // plain equi-join: unchanged semantics, no band column anywhere
      val eq = views.join(clicks, col("v_user") === col("c_user"))
      assert(!eq.queryExecution.optimizedPlan.toString.contains("__graft_band"))
      assert(eq.count() == 9) // user 7: 2 views x 4 clicks; user 8: 1 x 1
    }
  }
}
