package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Op, Tables}

/** Declarative data-quality audit — the Deequ shape (Schelter et al.
  * 2018, "Automating large-scale data quality verification", VLDB):
  * constraints compile to aggregate METRICS so each table is scanned
  * ONCE for all its non-relational checks (conditional sums inside a
  * single agg — never one job per constraint), and referential
  * constraints are anti-join counts (broadcast under the fixture,
  * shuffled hash at 100 TB — either way the violation count is exact,
  * there is no sampling tier). Output is the audit table a pipeline
  * gate reads: one row per constraint with exact violation counts.
  */
object DataQuality {

  private def metricRows(df: DataFrame, table: String,
      checks: Seq[(String, org.apache.spark.sql.Column)]): DataFrame = {
    // one scan: every constraint is a conditional count over it
    val agg = df.agg(count(lit(1)).as("_n"),
      checks.map { case (name, pred) =>
        sum(when(pred, 1L).otherwise(0L)).as(s"_v_$name")
      }: _*)
    checks.map { case (name, _) =>
      agg.select(lit(s"${table}_$name").as("constraint_name"),
        col(s"_v_$name").as("n_violations"), col("_n").as("n_rows"))
    }.reduce(_.union(_))
  }

  def audit(spark: SparkSession, dir: String): DataFrame = {
    val customer = Tables(spark, dir, "customer")
    val orders = Tables(spark, dir, "orders")
    val lineitem = Tables(spark, dir, "lineitem")
    val events = Tables(spark, dir, "events")

    val scans = Seq(
      metricRows(customer, "customer", Seq(
        "name_complete" -> col("c_name").isNull,
        "acctbal_in_range" ->
          !col("c_acctbal").between(-1000.0, 10000.0))),
      metricRows(orders, "orders", Seq(
        "totalprice_positive" -> (col("o_totalprice") <= 0.0),
        "status_domain" -> !col("o_orderstatus").isin("O", "F", "P"))),
      metricRows(lineitem, "lineitem", Seq(
        "quantity_in_range" -> !col("l_quantity").between(1.0, 50.0),
        "returnflag_domain" -> !col("l_returnflag").isin("A", "N", "R"),
        "discount_in_range" -> !col("l_discount").between(0.0, 0.1))),
      metricRows(events, "events", Seq(
        "type_complete" ->
          (col("event_type").isNull || col("event_type") === ""))))

    // uniqueness: count − distinct over the key, one dedicated agg
    val uniq = orders.agg(count(lit(1)).as("_n"),
        countDistinct(col("o_orderkey")).as("_d"))
      .select(lit("orders_orderkey_unique").as("constraint_name"),
        (col("_n") - col("_d")).as("n_violations"), col("_n").as("n_rows"))

    // referential integrity: exact anti-join violation counts. NULL
    // child keys COUNT as violations (a null FK is dangling) — the
    // left_anti semantics, mirrored by the oracle's NOT EXISTS (a
    // NOT IN form was rejected: one NULL on either side silently
    // zeroes the count)
    def fk(child: DataFrame, childKey: String, parent: DataFrame,
        parentKey: String, name: String): DataFrame = {
      val viol = child.join(parent.select(col(parentKey)),
          child(childKey) === col(parentKey), "left_anti")
        .agg(count(lit(1)).as("_v"))
      val n = child.agg(count(lit(1)).as("_n"))
      viol.crossJoin(n) // two 1-row frames
        .select(lit(name).as("constraint_name"),
          col("_v").as("n_violations"), col("_n").as("n_rows"))
    }
    val fks = Seq(
      fk(orders, "o_custkey", customer, "c_custkey", "orders_custkey_fk"),
      fk(lineitem, "l_orderkey", orders, "o_orderkey",
        "lineitem_orderkey_fk"))

    (scans ++ Seq(uniq) ++ fks).reduce(_.union(_))
      .select(col("constraint_name"), col("n_violations").cast("long"),
        col("n_rows").cast("long"),
        (col("n_violations") === 0).as("passed"))
  }

  val auditSql: String =
    """SELECT 'customer_name_complete' AS constraint_name,
      |       CAST(sum(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |         AS n_violations,
      |       CAST(count(*) AS BIGINT) AS n_rows,
      |       sum(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END) = 0 AS passed
      |FROM customer
      |UNION ALL
      |SELECT 'customer_acctbal_in_range',
      |       CAST(sum(CASE WHEN c_acctbal NOT BETWEEN -1000.0 AND 10000.0
      |                     THEN 1 ELSE 0 END) AS BIGINT),
      |       CAST(count(*) AS BIGINT),
      |       sum(CASE WHEN c_acctbal NOT BETWEEN -1000.0 AND 10000.0
      |                THEN 1 ELSE 0 END) = 0
      |FROM customer
      |UNION ALL
      |SELECT 'orders_totalprice_positive',
      |       CAST(sum(CASE WHEN o_totalprice <= 0.0 THEN 1 ELSE 0 END)
      |            AS BIGINT),
      |       CAST(count(*) AS BIGINT),
      |       sum(CASE WHEN o_totalprice <= 0.0 THEN 1 ELSE 0 END) = 0
      |FROM orders
      |UNION ALL
      |SELECT 'orders_status_domain',
      |       CAST(sum(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P')
      |                     THEN 1 ELSE 0 END) AS BIGINT),
      |       CAST(count(*) AS BIGINT),
      |       sum(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P')
      |                THEN 1 ELSE 0 END) = 0
      |FROM orders
      |UNION ALL
      |SELECT 'lineitem_quantity_in_range',
      |       CAST(sum(CASE WHEN l_quantity NOT BETWEEN 1.0 AND 50.0
      |                     THEN 1 ELSE 0 END) AS BIGINT),
      |       CAST(count(*) AS BIGINT),
      |       sum(CASE WHEN l_quantity NOT BETWEEN 1.0 AND 50.0
      |                THEN 1 ELSE 0 END) = 0
      |FROM lineitem
      |UNION ALL
      |SELECT 'lineitem_returnflag_domain',
      |       CAST(sum(CASE WHEN l_returnflag NOT IN ('A', 'N', 'R')
      |                     THEN 1 ELSE 0 END) AS BIGINT),
      |       CAST(count(*) AS BIGINT),
      |       sum(CASE WHEN l_returnflag NOT IN ('A', 'N', 'R')
      |                THEN 1 ELSE 0 END) = 0
      |FROM lineitem
      |UNION ALL
      |SELECT 'lineitem_discount_in_range',
      |       CAST(sum(CASE WHEN l_discount NOT BETWEEN 0.0 AND 0.1
      |                     THEN 1 ELSE 0 END) AS BIGINT),
      |       CAST(count(*) AS BIGINT),
      |       sum(CASE WHEN l_discount NOT BETWEEN 0.0 AND 0.1
      |                THEN 1 ELSE 0 END) = 0
      |FROM lineitem
      |UNION ALL
      |SELECT 'events_type_complete',
      |       CAST(sum(CASE WHEN event_type IS NULL OR event_type = ''
      |                     THEN 1 ELSE 0 END) AS BIGINT),
      |       CAST(count(*) AS BIGINT),
      |       sum(CASE WHEN event_type IS NULL OR event_type = ''
      |                THEN 1 ELSE 0 END) = 0
      |FROM events
      |UNION ALL
      |SELECT 'orders_orderkey_unique',
      |       CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT),
      |       CAST(count(*) AS BIGINT),
      |       count(*) - count(DISTINCT o_orderkey) = 0
      |FROM orders
      |UNION ALL
      |SELECT 'orders_custkey_fk',
      |       CAST((SELECT count(*) FROM orders o
      |             WHERE NOT EXISTS (SELECT 1 FROM customer c
      |                               WHERE c.c_custkey = o.o_custkey))
      |            AS BIGINT),
      |       CAST(count(*) AS BIGINT),
      |       (SELECT count(*) FROM orders o
      |        WHERE NOT EXISTS (SELECT 1 FROM customer c
      |                          WHERE c.c_custkey = o.o_custkey)) = 0
      |FROM orders
      |UNION ALL
      |SELECT 'lineitem_orderkey_fk',
      |       CAST((SELECT count(*) FROM lineitem l
      |             WHERE NOT EXISTS (SELECT 1 FROM orders o
      |                               WHERE o.o_orderkey = l.l_orderkey))
      |            AS BIGINT),
      |       CAST(count(*) AS BIGINT),
      |       (SELECT count(*) FROM lineitem l
      |        WHERE NOT EXISTS (SELECT 1 FROM orders o
      |                          WHERE o.o_orderkey = l.l_orderkey)) = 0
      |FROM lineitem""".stripMargin

  /** `dq_profile`: the PROFILER side of the Deequ pair — per-column
    * statistics (null count, exact distinct count, numeric min/max)
    * for the orders table, all computed in ONE scan (a single agg
    * whose row is then unpivoted into per-column rows; the 1-row agg
    * frame is reused, never re-scanned). Non-numeric columns carry
    * NULL min/max — profiles stay typed, no stringified values whose
    * formatting could diverge between engines.
    */
  def profile(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables(spark, dir, "orders")
    val numeric = Set("o_orderkey", "o_custkey", "o_totalprice")
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderpriority")
    val agg = orders.agg(count(lit(1)).as("_n"),
      cols.flatMap { c =>
        Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"_nn_$c"),
          countDistinct(col(c)).as(s"_nd_$c")) ++
          (if (numeric(c))
            Seq(min(col(c)).cast("double").as(s"_mn_$c"),
              max(col(c)).cast("double").as(s"_mx_$c"))
          else Nil)
      }: _*)
    cols.map { c =>
      agg.select(lit(c).as("column_name"), col("_n").as("n_rows"),
        col(s"_nn_$c").as("n_nulls"), col(s"_nd_$c").as("n_distinct"),
        (if (numeric(c)) col(s"_mn_$c")
        else lit(null).cast("double")).as("min_value"),
        (if (numeric(c)) col(s"_mx_$c")
        else lit(null).cast("double")).as("max_value"))
    }.reduce(_.union(_))
  }

  val profileSql: String = {
    val defs = Seq(
      ("o_orderkey", true), ("o_custkey", true), ("o_orderstatus", false),
      ("o_totalprice", true), ("o_orderpriority", false))
    defs.map { case (c, num) =>
      val mn = if (num) s"CAST(min($c) AS DOUBLE)" else "CAST(NULL AS DOUBLE)"
      val mx = if (num) s"CAST(max($c) AS DOUBLE)" else "CAST(NULL AS DOUBLE)"
      s"""SELECT '$c' AS column_name, CAST(count(*) AS BIGINT) AS n_rows,
         |       CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |         AS n_nulls,
         |       CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
         |       $mn AS min_value, $mx AS max_value
         |FROM orders""".stripMargin
    }.mkString("\nUNION ALL\n")
  }

  val ops: Seq[Op] = Seq(
    Op("dq_audit", audit _, Some(auditSql)),
    Op("dq_profile", profile _, Some(profileSql)))
}
