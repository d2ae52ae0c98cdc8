package graft

import org.apache.spark.sql.functions._
import graft.operators.Relational

/** Semantic-trap tests from SURVEY.md §7.3: USING-column dedup, join
  * fan-out preservation, case-insensitive LIKE, trim.
  */
class RelationalSpec extends SparkSpec {

  test("USING join emits the key column once (J1 parity)") {
    val df = Relational.jUsing(spark, sfDir)
    assert(df.columns.count(_ == "orderkey") == 1)
    assert(df.columns.toSeq == Seq("orderkey", "l_linenumber", "l_quantity", "o_totalprice"))
  }

  test("fan-out join multiplies rows, no dedup (J8 parity)") {
    import spark.implicits._
    val orders = Seq((1L, 10.0), (2L, 20.0)).toDF("o_orderkey", "o_totalprice")
    val items = Seq((1L, 1), (1L, 2), (1L, 3), (2L, 1))
      .toDF("l_orderkey", "l_linenumber")
    val joined = orders.join(items, orders("o_orderkey") === items("l_orderkey"))
    assert(joined.count() == 4) // 3 + 1, duplicates preserved
  }

  test("ilike reproduces SQLite's ASCII-case-insensitive LIKE (F3 parity)") {
    import spark.implicits._
    val df = Seq("Fixed", "fixed", "FIXED", "mobile").toDF("code")
    assert(df.where($"code".ilike("f%")).count() == 3)
    assert(df.where($"code".like("f%")).count() == 1) // the trap the survey flags
  }

  test("trim strips both ends, spaces only (P2 parity)") {
    import spark.implicits._
    val out = Seq("  x y  ").toDF("s").select(trim($"s")).head().getString(0)
    assert(out == "x y")
  }

  test("flagship query is non-empty at sf0.001 and fully aliased") {
    val df = Relational.p2pLinks(spark, sfDir)
    assert(df.count() > 0)
    assert(df.columns.toSeq == Seq("licence_id", "client", "rx_location",
      "rx_code", "rx_region", "tx_location", "tx_code", "tx_region", "qty",
      "price", "line_no"))
  }

  test("q1 aggregation counts cover every lineitem row") {
    val row = Relational.q1Agg(spark, sfDir)
      .agg(sum("count_order")).head()
    assert(row.getLong(0) == Tables(spark, sfDir, "lineitem").count())
  }

  test("moving average: 4-row sliding frame, running total per user") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("mavg").toString
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    (1 to 6).map(i => (i.toLong, new java.sql.Timestamp(t0 + i * 1000L), 7L,
        "click", i.toDouble, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val rows = Relational.windowMovingAvg(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getDouble(3), r.getDouble(4))).toMap
    assert(rows(1L) == ((1.0, 1.0)))
    assert(rows(4L) == ((2.5, 10.0)))   // (1+2+3+4)/4
    assert(rows(6L) == ((4.5, 21.0)))   // (3+4+5+6)/4 — row 1,2 slid out
  }

  test("q3: top-N is revenue-sorted, filters hold, customer dim broadcasts") {
    val df = Relational.q3TopShipping(spark, sfDir)
    val rows = df.collect()
    assert(rows.nonEmpty && rows.length <= 10)
    val revs = rows.map(_.getDouble(3))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b }, "not sorted")
    // every surviving order predates the cut (lineitem side is filtered
    // pre-aggregation, so it can't be checked from the output — the
    // oracle covers it)
    assert(df.where(col("o_orderdate").cast("date") >=
      lit("1998-07-01").cast("date")).count() == 0)
    // plan: the segment-filtered customer side must arrive via broadcast
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(400))
  }

  test("q5: same-nation constraint joins, date filter reaches the orders scan") {
    val df = Relational.q5RegionVolume(spark, sfDir)
    val rows = df.collect()
    assert(rows.nonEmpty && rows.length <= 25, "at most |nations| rows")
    val revs = rows.map(_.getDouble(1))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b }, "not sorted")
    val plan = df.queryExecution.executedPlan.toString
    // the same-nation predicate must participate in a join condition,
    // not hang above it as a post-join Filter over the fan-out
    assert(!"Filter .*c_nationkey#\\d+L? = s_nationkey".r
      .findFirstIn(plan).isDefined, "same-nation applied as post-filter")
    // the order-date range is pushed into the parquet scan
    assert(plan.contains("PushedFilters") &&
      "o_orderdate.*(GreaterThanOrEqual|IsNotNull)".r.findFirstIn(plan).isDefined,
      plan.take(600))
  }

  test("q6: pure scan-aggregate — band predicates pushed, no join, no wide shuffle") {
    import graft.operators.Relational
    val df = Relational.q6Revenue(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), "Q6 grew a join:\n" + plan.take(800))
    // discount/quantity bands reach the parquet reader
    assert("PushedFilters: \\[[^\\]]*l_discount".r.findFirstIn(plan).isDefined,
      plan.take(1200))
    assert(df.head().getLong(1) > 0)
  }

  test("q4: late-line EXISTS dedups per order — semi join in the plan") {
    import graft.operators.Relational
    val df = Relational.q4Priority(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), plan.take(800))
    // every order counted at most once per priority bucket
    val total = df.collect().map(_.getLong(1)).sum
    val orders = Tables(spark, sfDir, "orders").count()
    assert(total <= orders)
  }
}
