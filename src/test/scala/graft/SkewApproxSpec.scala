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
}
