package graft

/** O5 → optimizer wiring: ANALYZE'd catalog tables + CBO change real
  * plans (VERDICT round-1 item 9). The flip test pins the exact
  * mechanism: with only file-size stats a filtered dimension looks too
  * big to broadcast; with column stats the filter's selectivity shrinks
  * the estimate and the planner broadcasts.
  */
class CboSpec extends SparkSpec {

  // c.* keeps the size-only estimate of the customer side at the FULL
  // file size (column pruning would otherwise scale it below any usable
  // threshold); the filter is what column stats know to be selective.
  private val joinSql =
    """SELECT o.o_orderkey, c.*
      |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |WHERE c.c_custkey < 5""".stripMargin

  /** Set confs for the block, restoring previous values after (the
    * session is shared across suites).
    */
  private def withConfs(pairs: (String, String)*)(body: => Unit): Unit = {
    val old = pairs.map { case (k, _) =>
      k -> scala.util.Try(spark.conf.get(k)).toOption
    }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  // No view-dropping workaround here: registerAllWithStats itself drops
  // any shadowing temp view (from other suites' registerAll) before it
  // creates and ANALYZEs the catalog table — that behavior is part of
  // what these tests pin.

  test("ANALYZE hands the optimizer exact row counts") {
    withConfs("spark.sql.cbo.enabled" -> "false") {
      Tables.registerAllWithStats(spark, sfDir)
      val actual = Tables(spark, sfDir, "customer").count()
      val rc = spark.table("customer")
        .queryExecution.optimizedPlan.stats.rowCount
      assert(rc.contains(BigInt(actual)))
    }
  }

  test("column stats flip a filtered join from sort-merge to broadcast") {
    withConfs(
      "spark.sql.cbo.enabled" -> "false",
      "spark.sql.cbo.joinReorder.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "4096",
      "spark.sql.adaptive.enabled" -> "false") {
      Tables.registerAllWithStats(spark, sfDir) // turns CBO on
      def plan(cbo: Boolean): String = {
        spark.conf.set("spark.sql.cbo.enabled", cbo.toString)
        spark.sql(joinSql).queryExecution.sparkPlan.toString
      }
      // customer.parquet (~7 KB) exceeds the 4 KB threshold, so without
      // selectivity estimation the join shuffles both sides...
      assert(plan(cbo = false).contains("SortMergeJoin"))
      // ...and with ANALYZE'd column stats the c_custkey < 5 filter is
      // estimated at a few rows — small enough to broadcast.
      assert(plan(cbo = true).contains("BroadcastHashJoin"))
    }
  }
}
