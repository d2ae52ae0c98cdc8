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
}
