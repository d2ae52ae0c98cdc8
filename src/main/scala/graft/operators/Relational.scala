package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Op, Tables}

/** Reference-parity relational operators, re-expressed on the fixture star
  * schema (SURVEY.md §2.3-2.5).
  *
  * The reference's centerpiece is one declarative query
  * (`select_point_to_point_links.sql:5-79`): an 8-relation inner equi-join
  * chain with two self-joined dimension roles (location AS rx/tx,
  * geographicreference AS rx/tx), a `trim`+alias projection, and five
  * conjunctive filters, two of which carry SQLite-specific semantics
  * (case-insensitive LIKE, `!= 0` null-rejecting inequality).
  */
object Relational {

  /** Flagship: the point-to-point-links query shape on fixtures.
    *
    * Role mapping (reference → fixture):
    *   receive/transmitconfiguration ⋈ USING(licenceid)  → lineitem joins
    *     orders (licence) via l_orderkey, and both the customer-side and
    *     supplier-side dimension chains hang off the same fact row.
    *   location AS rxlocation/txlocation (self-join ×2)   → nation AS
    *     cust_nation / supp_nation (sql:52-53).
    *   geographicreference AS rxgeoref/txgeoref (×2)      → region AS
    *     cust_region / supp_region (sql:54-55).
    *   licence ⋈ clientname (sql:56-57)                   → orders ⋈ customer.
    *   spectrum fan-out (sql:58)                           → lineitem is the
    *     row-multiplying side: one output row per line item per order.
    *   georeferencetypeid = 3 (×2, sql:64-65)             → r_regionkey = 3
    *     on both region roles.
    *   licencecode LIKE 'F%' (case-insensitive, sql:70)    → c_mktsegment
    *     ILIKE 'f%' (SQLite LIKE is ASCII-case-insensitive; Spark's `like`
    *     is not — `ilike` restores parity, SURVEY.md §2.5 F3).
    *   northing != 0 (×2, sql:77-78)                       → acctbal != 0 on
    *     both customer and supplier.
    *   trim(name) projections (sql:12-13,28,39)            → trim on the
    *     name-ish columns, every output column AS-aliased (sql:5-41 P1).
    *
    * Physical shape at scale: lineitem⋈orders is the only big-big join
    * (shuffle on orderkey); customer is mid-size (shuffle); nation/region/
    * supplier are broadcast dims, so the two self-joined roles cost no
    * extra shuffle. Filters on the dims are pushed below the joins by
    * Catalyst; r_regionkey/acctbal predicates reach the parquet scans.
    */
  def p2pLinks(spark: SparkSession, dir: String): DataFrame = {
    val lineitem = Tables(spark, dir, "lineitem")
    val orders   = Tables(spark, dir, "orders")
    val customer = Tables(spark, dir, "customer")
    val supplier = Tables(spark, dir, "supplier")
    val nation   = Tables(spark, dir, "nation")
    val region   = Tables(spark, dir, "region")

    // Self-joined roles: same base table, two aliases (SURVEY.md §2.3 P3).
    val custNation = nation.as("cn")
    val suppNation = nation.as("sn")
    val custRegion = region.as("cr")
    val suppRegion = region.as("sr")

    // customer/supplier scale with the fact tables, so they carry NO
    // broadcast hint (a hint would override Spark's size checks at 100×,
    // where these joins must go sort-merge); under the auto-broadcast
    // threshold the planner still broadcasts them unaided. nation/region
    // are bounded dimensions — hinting them is always right.
    lineitem.as("l")
      .join(orders.as("o"), col("l.l_orderkey") === col("o.o_orderkey"))
      .join(customer.as("c"), col("o.o_custkey") === col("c.c_custkey"))
      .join(supplier.as("s"), col("l.l_suppkey") === col("s.s_suppkey"))
      .join(broadcast(custNation), col("c.c_nationkey") === col("cn.n_nationkey"))
      .join(broadcast(suppNation), col("s.s_nationkey") === col("sn.n_nationkey"))
      .join(broadcast(custRegion), col("cn.n_regionkey") === col("cr.r_regionkey"))
      .join(broadcast(suppRegion), col("sn.n_regionkey") === col("sr.r_regionkey"))
      .where(col("cr.r_regionkey") === 3)                  // F1 (sql:64)
      .where(col("sr.r_regionkey") === 3)                  // F2 (sql:65)
      .where(col("c.c_mktsegment").ilike("f%"))            // F3 (sql:70)
      .where(col("s.s_acctbal") =!= 0)                     // F4 (sql:77)
      .where(col("c.c_acctbal") =!= 0)                     // F5 (sql:78)
      .select(                                             // P1-P3 (sql:5-41)
        col("o.o_orderkey").as("licence_id"),
        trim(col("c.c_name")).as("client"),
        trim(col("cn.n_name")).as("rx_location"),
        col("cn.n_nationkey").as("rx_code"),
        trim(col("cr.r_name")).as("rx_region"),
        trim(col("sn.n_name")).as("tx_location"),
        col("sn.n_nationkey").as("tx_code"),
        trim(col("sr.r_name")).as("tx_region"),
        col("l.l_quantity").as("qty"),
        col("l.l_extendedprice").as("price"),
        col("l.l_linenumber").as("line_no"))
  }

  val p2pLinksSql: String =
    """SELECT o.o_orderkey AS licence_id,
      |       trim(c.c_name) AS client,
      |       trim(cn.n_name) AS rx_location,
      |       cn.n_nationkey AS rx_code,
      |       trim(cr.r_name) AS rx_region,
      |       trim(sn.n_name) AS tx_location,
      |       sn.n_nationkey AS tx_code,
      |       trim(sr.r_name) AS tx_region,
      |       l.l_quantity AS qty,
      |       l.l_extendedprice AS price,
      |       l.l_linenumber AS line_no
      |FROM lineitem l
      |JOIN orders o ON l.l_orderkey = o.o_orderkey
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |JOIN nation cn ON c.c_nationkey = cn.n_nationkey
      |JOIN nation sn ON s.s_nationkey = sn.n_nationkey
      |JOIN region cr ON cn.n_regionkey = cr.r_regionkey
      |JOIN region sr ON sn.n_regionkey = sr.r_regionkey
      |WHERE cr.r_regionkey = 3
      |  AND sr.r_regionkey = 3
      |  AND c.c_mktsegment ILIKE 'f%'
      |  AND s.s_acctbal <> 0
      |  AND c.c_acctbal <> 0""".stripMargin

  /** TPC-H Q1-shaped aggregation (SURVEY.md §2.6 — absent in the reference,
    * required by the north-star extensions). Money sums go through
    * DECIMAL(18,2) so the result is exact and order-independent — double
    * summation order differs between Spark's partial aggregation and the
    * DuckDB oracle (SURVEY.md §7.3). The FINAL cast is to DOUBLE, not
    * decimal: both result readers then see identical float64 bits, whereas
    * decimal outputs render scale-dependently (`152112.00` vs `152112.0`)
    * and hash-diverge whenever a sum lands on a trailing-zero fraction.
    */
  def q1Agg(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    val dec = (c: Column) => c.cast("decimal(18,2)")
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
  }

  val q1AggSql: String =
    """SELECT l_returnflag, l_linestatus,
      |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      |       count(*) AS count_order
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus""".stripMargin

  /** J1 parity: `USING (licenceid)` natural-key join — the key column
    * appears ONCE in the output (sql:49-51). Spark's `Seq("key")` join form
    * has exactly SQLite's USING semantics (SURVEY.md §2.4 J1).
    */
  def jUsing(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
      .select(col("l_orderkey").as("orderkey"), col("l_linenumber"), col("l_quantity"))
    val o = Tables(spark, dir, "orders")
      .select(col("o_orderkey").as("orderkey"), col("o_totalprice"))
    li.join(o, Seq("orderkey"), "inner")
  }

  val jUsingSql: String =
    """SELECT orderkey, l_linenumber, l_quantity, o_totalprice
      |FROM (SELECT l_orderkey AS orderkey, l_linenumber, l_quantity FROM lineitem) l
      |JOIN (SELECT o_orderkey AS orderkey, o_totalprice FROM orders) o USING (orderkey)""".stripMargin

  /** J8 parity: intentional row fan-out — one output row per child row per
    * parent; no dedup may be applied (SURVEY.md §2.4 J8, §7.3).
    */
  def jFanout(spark: SparkSession, dir: String): DataFrame = {
    val o  = Tables(spark, dir, "orders")
    val li = Tables(spark, dir, "lineitem")
    o.join(li, o("o_orderkey") === li("l_orderkey"))
      .select(col("o_orderkey"), col("o_totalprice"), col("l_linenumber"),
        col("l_quantity"), col("l_returnflag"))
  }

  val jFanoutSql: String =
    """SELECT o_orderkey, o_totalprice, l_linenumber, l_quantity, l_returnflag
      |FROM orders JOIN lineitem ON l_orderkey = o_orderkey""".stripMargin

  /** Semi-join (EXISTS): customers having at least one urgent order.
    * Broadcast the build side at scale when the filtered key set is small.
    */
  def jSemi(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables(spark, dir, "customer")
    val o = Tables(spark, dir, "orders")
      .where(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey").as("c_custkey"))
    c.join(o, Seq("c_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
  }

  val jSemiSql: String =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey
      |                AND o.o_orderpriority = '1-URGENT')""".stripMargin

  /** Anti-join (NOT EXISTS): customers with no order above 280k. */
  def jAnti(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables(spark, dir, "customer")
    val o = Tables(spark, dir, "orders")
      .where(col("o_totalprice") > 280000)
      .select(col("o_custkey").as("c_custkey"))
    c.join(o, Seq("c_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
  }

  val jAntiSql: String =
    """SELECT c_custkey, c_name, c_acctbal FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey
      |                    AND o.o_totalprice > 280000)""".stripMargin

  /** Left-outer join with null-producing right side + coalesce default. */
  def jOuter(spark: SparkSession, dir: String): DataFrame = {
    val o  = Tables(spark, dir, "orders")
    val li = Tables(spark, dir, "lineitem").where(col("l_quantity") > 45)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    o.join(li, o("o_orderkey") === li("l_orderkey"), "left_outer")
      .select(col("o_orderkey"), col("o_orderstatus"), col("l_linenumber"),
        coalesce(col("l_quantity"), lit(-1.0)).as("qty_or_default"))
  }

  val jOuterSql: String =
    """SELECT o_orderkey, o_orderstatus, l_linenumber,
      |       coalesce(l_quantity, -1.0) AS qty_or_default
      |FROM orders LEFT OUTER JOIN
      |     (SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
      |      WHERE l_quantity > 45) li
      |ON o_orderkey = l_orderkey""".stripMargin

  /** ORDER BY + LIMIT top-N. The orderkey tiebreak makes the cut
    * deterministic across engines. At scale this is Spark's TakeOrderedAndProject
    * (per-partition top-N + merge on driver) — no global sort materialized.
    */
  def sortLimitTopn(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(100)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))

  val sortLimitTopnSql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100""".stripMargin

  /** DISTINCT + UNION/INTERSECT/EXCEPT set semantics (SQL bag→set rules:
    * Spark's union is UNION ALL, so distinct() reproduces SQL UNION;
    * intersect/except are the deduplicating SQL forms).
    */
  def setOps(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables(spark, dir, "customer")
    val o = Tables(spark, dir, "orders")
    val building = c.where(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val rich     = c.where(col("c_acctbal") > 5000).select(col("c_custkey"))
    val finished = o.where(col("o_orderstatus") === "F").select(col("o_custkey").as("c_custkey"))
    val big      = o.where(col("o_totalprice") > 100000).select(col("o_custkey").as("c_custkey"))
    building.union(rich).distinct()
      .except(finished.intersect(big))
  }

  val setOpsSql: String =
    """(SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      | UNION
      | SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
      |EXCEPT
      |(SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      | INTERSECT
      | SELECT o_custkey FROM orders WHERE o_totalprice > 100000)""".stripMargin

  /** Window functions: row_number / rank / dense_rank / running sum per
    * customer. Full ordering (totalprice desc, orderkey) keeps row_number
    * deterministic. One shuffle on o_custkey; all four windows share it.
    */
  def windowRank(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val o = Tables(spark, dir, "orders")
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    o.select(
      col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
      row_number().over(w).cast("long").as("rn"),
      rank().over(w).cast("long").as("rnk"),
      dense_rank().over(w).cast("long").as("drnk"),
      sum(col("o_totalprice").cast("decimal(18,2)"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("double").as("running_total"))
  }

  val windowRankSql: String =
    """SELECT o_custkey, o_orderkey, o_totalprice,
      |  row_number() OVER w AS rn,
      |  rank() OVER w AS rnk,
      |  dense_rank() OVER w AS drnk,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
      |    OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC)""".stripMargin

  /** Broad aggregate-function coverage: min/max/count/count-distinct and a
    * derived average. avg is computed as exact-decimal sum ÷ count in BOTH
    * engines (native avg() return types diverge between Spark and DuckDB).
    */
  def aggStats(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    li.groupBy(col("l_returnflag"))
      .agg(
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"),
        count(lit(1)).as("n_rows"),
        countDistinct(col("l_orderkey")).as("n_orders"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_price"))
      .withColumn("avg_price",
        round(col("sum_price") / col("n_rows"), 6))
  }

  val aggStatsSql: String =
    """SELECT l_returnflag,
      |       min(l_quantity) AS min_qty,
      |       max(l_quantity) AS max_qty,
      |       count(*) AS n_rows,
      |       count(DISTINCT l_orderkey) AS n_orders,
      |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
      |       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_price
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  /** TPC-H Q3-shaped three-way analytics join: unshipped-revenue top-N
    * for one market segment. The plan a warehouse wants at any scale:
    * the segment-filtered customer dim BROADCASTS into the orders scan
    * (both date filters push to parquet), the orders side is already
    * keyed on the join column when lineitem shuffles in, and the partial
    * aggregation + TakeOrderedAndProject keep the sort driver-bounded at
    * N rows per partition. Revenue uses the exact-decimal-core /
    * double-boundary discipline of q1_agg; the orderkey tiebreak makes
    * the top-10 deterministic.
    */
  def q3TopShipping(spark: SparkSession, dir: String): DataFrame = {
    val cut = lit("1998-07-01").cast("date")
    val cust = Tables(spark, dir, "customer")
      .where(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val ord = Tables(spark, dir, "orders")
      .where(col("o_orderdate").cast("date") < cut)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        col("o_orderpriority"))
    val li = Tables(spark, dir, "lineitem")
      .where(col("l_shipdate").cast("date") > cut)
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    val dec = (c: Column) => c.cast("decimal(18,2)")
    li.join(ord.join(broadcast(cust), col("o_custkey") === col("c_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(dec(col("l_extendedprice")) *
          (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey").asc)
      .limit(10)
  }

  val q3TopShippingSql: String =
    """SELECT l_orderkey, o_orderdate, o_orderpriority,
      |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |                (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
      |         AS revenue
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND CAST(o_orderdate AS DATE) < DATE '1998-07-01'
      |  AND CAST(l_shipdate AS DATE) > DATE '1998-07-01'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey ASC
      |LIMIT 10""".stripMargin

  /** TPC-H Q5 shape (local-supplier volume): revenue by nation where
    * the customer and the supplier share a nation, region-filtered,
    * over one order-date year — the classic multi-fact join-planning
    * exercise. The bounded nation⋈region tree broadcasts (hinted: a
    * true dimension at any scale); customer and supplier carry NO
    * broadcast hints — they scale with the corpus, the planner
    * broadcasts them unaided at fixture size, and at 100× they are
    * allowed to become shuffle joins (the round-2 hint discipline).
    * The date filter pushes to the orders parquet scan, and the
    * same-nation constraint rides INSIDE the supplier join as an
    * equi-condition, so it prunes during the join rather than after.
    */
  def q5RegionVolume(spark: SparkSession, dir: String): DataFrame = {
    val lo = lit("1996-01-01").cast("date")
    val hi = lit("1997-01-01").cast("date")
    val nat = Tables(spark, dir, "nation")
      .join(Tables(spark, dir, "region").where(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val cust = Tables(spark, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey"))
    val supp = Tables(spark, dir, "supplier")
      .select(col("s_suppkey"), col("s_nationkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
    val ord = Tables(spark, dir, "orders")
      .where(col("o_orderdate").cast("date") >= lo &&
        col("o_orderdate").cast("date") < hi)
      .select(col("o_orderkey"), col("o_custkey"))
    val li = Tables(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"),
        col("l_extendedprice"), col("l_discount"))
    val dec = (c: Column) => c.cast("decimal(18,2)")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(dec(col("l_extendedprice")) *
          (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc)
  }

  val q5RegionVolumeSql: String =
    """SELECT n_name,
      |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |                (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
      |         AS revenue
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
      |  AND CAST(o_orderdate AS DATE) < DATE '1997-01-01'
      |GROUP BY n_name
      |ORDER BY revenue DESC""".stripMargin

  /** TPC-H Q6 shape — the pure scan-aggregate: one table, three
    * band predicates, one DECIMAL-exact product sum. The whole query
    * should compile to scan → filter → partial agg → one-row exchange →
    * final agg, with every predicate in PushedFilters; it exists
    * (beyond its own usefulness as the "what would this discount have
    * earned" probe) as the canonical evidence that band predicates
    * reach the parquet reader — if this plan ever grows a join or a
    * wide shuffle, scan pushdown regressed.
    */
  def q6Revenue(spark: SparkSession, dir: String): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(18,2)")
    Tables(spark, dir, "lineitem")
      .where(col("l_shipdate").cast("date") >= lit("1996-01-01").cast("date") &&
        col("l_shipdate").cast("date") < lit("1997-01-01").cast("date") &&
        col("l_discount") >= 0.02 && col("l_discount") <= 0.04 &&
        col("l_quantity") < 25)
      .agg(sum(dec(col("l_extendedprice")) * dec(col("l_discount")))
        .cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  val q6RevenueSql: String =
    """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |                CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |       count(*) AS n_lines
      |FROM lineitem
      |WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
      |  AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
      |  AND l_discount BETWEEN 0.02 AND 0.04
      |  AND l_quantity < 25""".stripMargin

  /** TPC-H Q4 shape — order-priority service report: count orders per
    * priority that had at least one LATE line (shipped over 60 days
    * after the order date; the fixture has no commit/receipt dates, so
    * lateness is ship-vs-order lag). The EXISTS compiles to a LEFT SEMI
    * join keyed on the order — lineitem reduces map-side by the date
    * predicate BEFORE the exchange, and each order ships through the
    * semi join at most once however many late lines it has.
    */
  def q4Priority(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables(spark, dir, "orders")
    val late = Tables(spark, dir, "lineitem")
      .join(ord.select(col("o_orderkey").as("lk"), col("o_orderdate")),
        col("l_orderkey") === col("lk"))
      .where(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .select(col("l_orderkey"))
    ord.join(late, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
  }

  val q4PrioritySql: String =
    """SELECT o_orderpriority, count(*) AS n_orders
      |FROM orders o
      |WHERE EXISTS (
      |  SELECT 1 FROM lineitem l
      |  WHERE l.l_orderkey = o.o_orderkey
      |    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
      |GROUP BY o_orderpriority""".stripMargin

  /** Sliding-frame window aggregates — the ROWS BETWEEN surface beyond
    * rank/lag: a 4-event moving average and a running total per user.
    * Both cores are DECIMAL sums (exact, so the engines' different
    * sliding-frame strategies — incremental add/remove vs segment trees —
    * cannot produce different floats); the division to a double happens
    * once at the boundary. One shuffle on user_id, shared by both frames.
    */
  def windowMovingAvg(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val sliding = byUser.rowsBetween(-3, Window.currentRow)
    val running = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val dec = col("value").cast("decimal(18,4)")
    Tables(spark, dir, "events")
      .select(col("event_id"), col("user_id"), col("value"),
        round(sum(dec).over(sliding).cast("double") /
          count(lit(1)).over(sliding), 6).as("moving_avg"),
        sum(dec).over(running).cast("double").as("running_total"))
  }

  val windowMovingAvgSql: String =
    """SELECT event_id, user_id, value,
      |       round(CAST(sum(CAST(value AS DECIMAL(18,4))) OVER w4 AS DOUBLE) /
      |             count(*) OVER w4, 6) AS moving_avg,
      |       CAST(sum(CAST(value AS DECIMAL(18,4))) OVER wall AS DOUBLE)
      |         AS running_total
      |FROM events
      |WINDOW w4 AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
      |              ROWS BETWEEN 3 PRECEDING AND CURRENT ROW),
      |       wall AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
      |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin

  val ops: Seq[Op] = Seq(
    Op("p2p_links", p2pLinks _, Some(p2pLinksSql)),
    Op("window_moving_avg", windowMovingAvg _, Some(windowMovingAvgSql)),
    Op("q1_agg", q1Agg _, Some(q1AggSql)),
    Op("q3_top_shipping", q3TopShipping _, Some(q3TopShippingSql)),
    Op("q5_region_volume", q5RegionVolume _, Some(q5RegionVolumeSql)),
    Op("q6_band_revenue", q6Revenue _, Some(q6RevenueSql)),
    Op("q4_late_priority", q4Priority _, Some(q4PrioritySql)),
    Op("j_using", jUsing _, Some(jUsingSql)),
    Op("j_fanout", jFanout _, Some(jFanoutSql)),
    Op("j_semi", jSemi _, Some(jSemiSql)),
    Op("j_anti", jAnti _, Some(jAntiSql)),
    Op("j_outer", jOuter _, Some(jOuterSql)),
    Op("sort_limit_topn", sortLimitTopn _, Some(sortLimitTopnSql)),
    Op("set_ops", setOps _, Some(setOpsSql)),
    Op("window_rank", windowRank _, Some(windowRankSql)),
    Op("agg_stats", aggStats _, Some(aggStatsSql)),
  )
}
