package graft

import graft.operators.DataQuality

/** Deequ-style audit: planted violations of every constraint class are
  * counted exactly; a clean fixture passes everything.
  */
class DataQualitySpec extends SparkSpec {

  private def fixtureDir(withViolations: Boolean): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("dq").toString
    val custName: Seq[Option[String]] =
      if (withViolations) Seq(Some("alice"), None)
      else Seq(Some("alice"), Some("bob"))
    Seq((1L, custName.head, 1, 100.0, "SEG"),
      (2L, custName(1), 1, if (withViolations) 99999.0 else 500.0, "SEG"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal",
        "c_mktsegment")
      .write.parquet(s"$dir/customer.parquet")
    // order 30 dangles its custkey and repeats key 20 when planted
    val okey3 = if (withViolations) 20L else 30L
    val cust3 = if (withViolations) 77L else 2L
    Seq((10L, 1L, "O", 10.0, "1-URGENT"), (20L, 2L, "F", 20.0, "2-HIGH"),
      (okey3, cust3, if (withViolations) "X" else "P",
        if (withViolations) -5.0 else 30.0, "2-HIGH"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderpriority")
      .write.parquet(s"$dir/orders.parquet")
    Seq((10L, 1, 5.0, "A", 0.05),
      (if (withViolations) 999L else 20L, 1,
        if (withViolations) 99.0 else 7.0,
        if (withViolations) "Z" else "N",
        if (withViolations) 0.5 else 0.0))
      .toDF("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag",
        "l_discount")
      .write.parquet(s"$dir/lineitem.parquet")
    Seq((1L, java.sql.Timestamp.valueOf("2026-07-01 10:00:00"), 100L,
        "click"),
      (2L, java.sql.Timestamp.valueOf("2026-07-01 11:00:00"), 101L,
        if (withViolations) "" else "view"))
      .toDF("event_id", "ts", "user_id", "event_type")
      .write.parquet(s"$dir/events.parquet")
    dir
  }

  private def byName(dir: String): Map[String, (Long, Long, Boolean)] =
    DataQuality.audit(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap

  test("planted violations are counted exactly, one per constraint class") {
    val got = byName(fixtureDir(withViolations = true))
    assert(got.size == 11)
    assert(got("customer_name_complete") == ((1L, 2L, false)))
    assert(got("customer_acctbal_in_range") == ((1L, 2L, false)))
    assert(got("orders_totalprice_positive") == ((1L, 3L, false)))
    assert(got("orders_status_domain") == ((1L, 3L, false)))
    assert(got("orders_orderkey_unique") == ((1L, 3L, false)))
    assert(got("orders_custkey_fk") == ((1L, 3L, false)))
    assert(got("lineitem_quantity_in_range") == ((1L, 2L, false)))
    assert(got("lineitem_returnflag_domain") == ((1L, 2L, false)))
    assert(got("lineitem_discount_in_range") == ((1L, 2L, false)))
    assert(got("lineitem_orderkey_fk") == ((1L, 2L, false)))
    assert(got("events_type_complete") == ((1L, 2L, false)))
  }

  test("profile: exact per-column stats from one planted table") {
    val got = DataQuality.profile(spark, fixtureDir(withViolations = true))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          Option(r.get(4)).map(_.asInstanceOf[Double]),
          Option(r.get(5)).map(_.asInstanceOf[Double])))).toMap
    assert(got.size == 5)
    // planted orders: keys 10, 20, 20 (dup); custkeys 1, 2, 77;
    // status O, F, X; totalprice 10, 20, -5
    assert(got("o_orderkey") == ((3L, 0L, 2L, Some(10.0), Some(20.0))))
    assert(got("o_custkey") == ((3L, 0L, 3L, Some(1.0), Some(77.0))))
    assert(got("o_totalprice") == ((3L, 0L, 3L, Some(-5.0), Some(20.0))))
    val st = got("o_orderstatus")
    assert(st._3 == 3L && st._4.isEmpty && st._5.isEmpty)
  }

  test("a clean fixture passes every constraint") {
    val got = byName(fixtureDir(withViolations = false))
    assert(got.size == 11)
    got.foreach { case (name, (v, _, passed)) =>
      assert(v == 0L && passed, s"$name: $v violations")
    }
  }
}
