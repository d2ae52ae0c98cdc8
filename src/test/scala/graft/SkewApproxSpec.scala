package graft

import graft.operators.{Analytics, Relational, Skew}

class SkewApproxSpec extends SparkSpec {

  test("the salt varies WITHIN a key — a hot key spreads across tasks") {
    import spark.implicits._
    // 1000 rows of one join key: a key-derived salt would put them all
    // in one (key, salt) group and mitigate nothing.
    val hot = Seq.tabulate(1000)(i => (1L, i)).toDF("k", "payload")
    val distinctSalts = hot.select(Skew.saltColumn(hot, 8).as("s"))
      .distinct().count()
    assert(distinctSalts == 8L, s"hot key landed on $distinctSalts salts")
  }

  test("salted join is a pure physical rewrite of the plain join") {
    val plain = Relational.jFanout(spark, sfDir)
      .select("o_orderkey", "l_linenumber").collect()
      .map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    val salted = Skew.jSalted(spark, sfDir)
      .select("o_orderkey", "l_linenumber").collect()
      .map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    assert(salted == plain)
  }

  test("approximate aggregates land within tolerance of exact") {
    val approx = Analytics.aggApprox(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val exact = Relational.aggStats(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(4)).toMap // n_orders
    exact.foreach { case (flag, nOrders) =>
      val (approxOrders, _) = approx(flag)
      val err = math.abs(approxOrders - nOrders).toDouble / nOrders
      assert(err < 0.05, s"$flag: approx $approxOrders vs exact $nOrders")
    }
  }
  test("grouping sets: pair + returnflag margin + total, NO linestatus margin") {
    val rows = Analytics.aggGroupingSets(spark, sfDir).collect()
    val flags = rows.map(r => (Option(r.getString(0)), Option(r.getString(1))))
    assert(flags.count { case (a, b) => a.isEmpty && b.isEmpty } == 1) // grand total
    assert(flags.count { case (a, b) => a.isDefined && b.isEmpty } >= 1) // rf margins
    assert(!flags.exists { case (a, b) => a.isEmpty && b.isDefined },
      "a linestatus margin appeared — that set was not requested")
    // grand total row covers every lineitem row
    val total = rows.find(r => r.isNullAt(0) && r.isNullAt(1)).get.getLong(2)
    assert(total == Tables(spark, sfDir, "lineitem").count())
  }

  test("drift: a shifted second-half distribution trips PSI, a stable one does not") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("drift").toString
    def t(day: Int) = java.sql.Timestamp.valueOf(f"2024-01-$day%02d 09:00:00")
    // consecutive pairs share a value, one event in each half: identical
    // bucket histograms on both sides of the cut
    val stable = (1 to 200).map(i =>
      (i.toLong, t(if (i % 2 == 0) 2 else 20), 1L, "stable", ((i / 2) % 10) * 50.0 + 1, "{}"))
    val shifted = (1 to 100).map(i => (1000L + i, t(2), 1L, "shifty", 10.0, "{}")) ++
      (1 to 100).map(i => (2000L + i, t(20), 1L, "shifty", 450.0, "{}"))
    (stable ++ shifted).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val m = Analytics.statsDrift(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getBoolean(2))).toMap
    assert(m("shifty")._2, s"shifted distribution not flagged: ${m("shifty")}")
    assert(!m("stable")._2, s"stable distribution flagged: ${m("stable")}")
    assert(m("shifty")._1 > m("stable")._1)
  }

  test("trend: hand-computed OLS slope on a perfectly linear series") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("trend").toString
    def t(day: Int) = java.sql.Timestamp.valueOf(f"2024-01-$day%02d 09:00:00")
    // "up": counts 1,2,3 on days 1..3 → slope 1, intercept 1, r2 1
    // "flat": 2,2 → slope 0, r2 1 (deny=0 branch)
    val up = (1 to 3).flatMap(d => (1 to d).map(i =>
      (d * 100L + i, t(d), 1L, "up", 1.0, "{}")))
    val flat = (1 to 2).flatMap(d => (1 to 2).map(i =>
      (1000L + d * 10 + i, t(d), 1L, "flat", 1.0, "{}")))
    (up ++ flat).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val m = Analytics.statsTrend(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(m("up") == ((3L, 1.0, 1.0, 1.0)))
    assert(m("flat") == ((2L, 0.0, 2.0, 1.0)))
  }

  test("chisq: zero statistic on an exactly independent table, positive otherwise") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("chisq").toString
    // Mon Jan 1 / Tue Jan 2 2024; counts a:(2,2) b:(3,3) → independent
    def t(day: Int) = java.sql.Timestamp.valueOf(f"2024-01-$day%02d 09:00:00")
    val indep =
      (1 to 2).map(i => (10L + i, t(1), 1L, "a", 1.0, "{}")) ++
      (1 to 2).map(i => (20L + i, t(2), 1L, "a", 1.0, "{}")) ++
      (1 to 3).map(i => (30L + i, t(1), 1L, "b", 1.0, "{}")) ++
      (1 to 3).map(i => (40L + i, t(2), 1L, "b", 1.0, "{}"))
    indep.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val r = Analytics.statsChisq(spark, dir).head()
    assert(r.getDouble(0) == 0.0 && r.getLong(1) == 1L && r.getLong(2) == 10L)
    assert(r.getDouble(3) == 0.0)

    val dir2 = java.nio.file.Files.createTempDirectory("chisq2").toString
    // perfectly dependent: a only Mon, b only Tue → chi2 = n, V = 1
    val dep =
      (1 to 5).map(i => (10L + i, t(1), 1L, "a", 1.0, "{}")) ++
      (1 to 5).map(i => (30L + i, t(2), 1L, "b", 1.0, "{}"))
    dep.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir2/events.parquet")
    val r2 = Analytics.statsChisq(spark, dir2).head()
    assert(r2.getDouble(0) == 10.0 && r2.getDouble(3) == 1.0)
  }

  test("corr: constructed perfect positive and negative correlation") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("corr").toString
    val d0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    // price = 10*qty (corr +1); discount = 1 - 0.1*qty (corr -1 with both)
    val rows = (1 to 5).map(q =>
      (q.toLong, 1L, 1L, q, q.toDouble, 10.0 * q, 1.0 - 0.1 * q, 0.0, "N", "O", d0))
    rows.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax",
      "l_returnflag", "l_linestatus", "l_shipdate")
      .write.parquet(s"$dir/lineitem.parquet")
    val m = Analytics.statsCorr(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(m(("l_quantity", "l_extendedprice")) == 1.0)
    assert(m(("l_quantity", "l_discount")) == -1.0)
    assert(m(("l_extendedprice", "l_discount")) == -1.0)
  }

  test("pareto: cumulative shares and ABC classes on constructed revenues") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("pareto").toString
    val d0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    // revenues (price, discount 0): 80, 15, 4, 1 → cum shares .8, .95, .99, 1
    Seq(
      (1L, 1L, 10L, 1, 1.0, 80.0, 0.0, 0.0, "N", "O", d0),
      (2L, 1L, 20L, 1, 1.0, 15.0, 0.0, 0.0, "N", "O", d0),
      (3L, 1L, 30L, 1, 1.0, 4.0, 0.0, 0.0, "N", "O", d0),
      (4L, 1L, 40L, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", d0)
    ).toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax",
      "l_returnflag", "l_linestatus", "l_shipdate")
      .write.parquet(s"$dir/lineitem.parquet")
    val r = Analytics.aggPareto(spark, dir).collect()
      .map(x => x.getLong(0) -> (x.getDouble(2), x.getString(3))).toMap
    assert(r(10L) == ((0.8, "A")))
    assert(r(20L) == ((0.95, "B")))
    assert(r(30L) == ((0.99, "C")))
    assert(r(40L) == ((1.0, "C")))
  }

  test("pareto plan: the running-sum window partitions on the bin, never global") {
    val df = Analytics.aggPareto(spark, sfDir)
    df.collect()
    // every windowspecdefinition must carry the pid partition key — a
    // global cumulative window would print with no partition column
    val plan = df.queryExecution.executedPlan.toString
    val specs = "windowspecdefinition\\(([^)]*)\\)".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(specs.nonEmpty, s"expected a window in:\n$plan")
    specs.foreach { s =>
      assert(s.contains("pid#"), s"window not bin-partitioned: ($s)")
    }
  }

  test("skew report: hand-computed frequency stats on a constructed hot key") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("skew").toString
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 09:00:00")
    // user 1: 8 rows (hot); users 2..5: 1 row each → 12 rows, 5 keys
    val rows = (1 to 8).map(i => (i.toLong, t0, 1L, "view", 1.0, "{}")) ++
      (2 to 5).map(u => (100L + u, t0, u.toLong, "view", 1.0, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    // orders table must exist for the third audit branch
    Seq((1L, 1L, "O", 1.0, t0, "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.parquet(s"$dir/orders.parquet")
    val r = Analytics.skewReport(spark, dir).collect()
      .map(x => x.getString(0) -> x).toMap
    val u = r("events.user_id")
    assert(u.getLong(1) == 12L && u.getLong(2) == 5L && u.getLong(3) == 8L)
    assert(u.getDouble(4) == 1.0)               // p50 of [8,1,1,1,1]
    assert(u.getDouble(6) == round6(8.0 / (12.0 / 5.0)))  // max/avg
    assert(u.getDouble(7) == round6(8.0 / 12.0))          // top1 share
    val ty = r("events.event_type")
    assert(ty.getLong(2) == 1L && ty.getDouble(7) == 1.0) // one type owns all rows
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("KLL sketch quantiles: every estimate's true rank within the published bound") {
    val flags = Analytics.quantileSketchCheck(spark, sfDir).collect()
    assert(flags.nonEmpty)
    assert(flags.forall(_.getBoolean(2)),
      flags.filterNot(_.getBoolean(2)).mkString(", "))
  }

  test("KLL merge path equals direct sketching within the rank bound") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.graft.KllColumn
    // 10k values split into 20 partial sketches, merged — the estimate
    // must agree with a direct single sketch within 2× the rank bound
    // (both paths see the same stream; KLL compaction is randomized so
    // exact equality is not the contract, the bound is)
    val vals = (1 to 10000).map(i => (i % 20, i.toDouble)).toDF("g", "v")
    val merged = vals.groupBy(col("g")).agg(KllColumn.sketchAgg(col("v")).as("sk"))
      .agg(KllColumn.mergeAgg(col("sk")).as("sk"))
      .select(KllColumn.quantile(col("sk"), 0.5).as("q")).head().getDouble(0)
    val direct = vals.agg(KllColumn.sketchAgg(col("v")).as("sk"))
      .select(KllColumn.quantile(col("sk"), 0.5).as("q")).head().getDouble(0)
    val tol = 2.0 * KllColumn.normalizedRankError() * 10000
    assert(math.abs(merged - 5000.0) <= tol, s"merged $merged")
    assert(math.abs(direct - 5000.0) <= tol, s"direct $direct")
  }

  test("KLL quantile of an empty sketch is null and declared nullable") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.graft.KllColumn
    // An all-null group yields an EMPTY (but non-null) sketch; the
    // quantile over it is null, so the expression must declare nullable
    // even though its child never is — a non-nullable declaration lets
    // consumers elide the null check and read garbage (AUDIT r6 #1).
    val df = Seq((1, Option.empty[Double]), (1, None), (2, Some(7.0)))
      .toDF("g", "v")
      .groupBy(col("g")).agg(KllColumn.sketchAgg(col("v")).as("sk"))
      .select(col("g"), KllColumn.quantile(col("sk"), 0.5).as("q"))
    assert(df.schema("q").nullable)
    val rows = df.collect().map(r => r.getInt(0) ->
      (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(rows(1).isEmpty, "empty sketch must yield null, not a value")
    assert(rows(2).contains(7.0))
  }

  test("KLL sketch bytes are fixed-size: 100x the data, same buffer scale") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.graft.KllColumn
    def bytesFor(n: Int): Int =
      (1 to n).map(_.toDouble).toDF("v")
        .agg(KllColumn.sketchAgg(col("v")).as("sk"))
        .select(length(col("sk"))).head().getInt(0)
    val small = bytesFor(1000)
    val big = bytesFor(100000)
    assert(big <= small * 2, s"sketch grew $small -> $big bytes at 100x")
  }

  test("CMS heavy hitters: exact at real width, one-sided error when crushed") {
    import spark.implicits._
    // planted stream: token "hot" x 100, "warm" x 40, 30 singletons
    val words = (Seq.fill(100)("hot") ++ Seq.fill(40)("warm") ++
      (1 to 30).map(i => s"rare$i")).toDF("w")
    val wide = Analytics.heavyHittersCmsCore(words, width = 1024,
      depth = 3, topK = 5).collect()
    val byTok = wide.map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
      r.getBoolean(3), r.getBoolean(4)))).toMap
    assert(byTok("hot") == ((100L, 100L, true, true)), s"got $byTok")
    assert(byTok("warm") == ((40L, 40L, true, true)), s"got $byTok")
    assert(wide.head.getString(0) == "hot", "top-1 must be the hot token")
    // crush the filter to 4 buckets: collisions must OVER-count only —
    // the CMS one-sided guarantee — and the top token still surfaces
    val tiny = Analytics.heavyHittersCmsCore(words, width = 4,
      depth = 2, topK = 32).collect()
    assert(tiny.forall(_.getBoolean(3)),
      s"CMS must never under-count: ${tiny.mkString(",")}")
    assert(tiny.exists(r => r.getLong(1) > r.getLong(2)),
      "a 4-bucket filter over 32 tokens must show inflated estimates")
    val hotRow = tiny.find(_.getString(0) == "hot").get
    assert(hotRow.getLong(1) >= 100L)
  }

  test("portable HLL: linear-counting and raw branches inside the 3-sigma bound") {
    import spark.implicits._
    // small vocab -> linear counting; 5000 distinct -> raw estimator
    val toks = ((1 to 40).map(i => ("small", s"tok$i")) ++
      (1 to 5000).map(i => ("big", s"item$i"))).toDF("source", "w")
    val got = Analytics.distinctHllCore(spark, toks).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2),
        r.getBoolean(4)))).toMap
    val (se, sn, sok) = got("small")
    val (be, bn, bok) = got("big")
    assert(sn == 40L && bn == 5000L)
    assert(sok, s"small-source estimate $se out of bound vs $sn")
    assert(bok, s"big-source estimate $be out of bound vs $bn")
    // repeated observations of the same values change nothing: the
    // register file is a max, so the sketch counts DISTINCT
    val dup = toks.union(toks).union(toks)
    val got2 = Analytics.distinctHllCore(spark, dup).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got2("small") == se && got2("big") == be,
      "duplicate-insensitive by construction")
  }
}
