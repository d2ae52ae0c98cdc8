package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

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

    lineitem.as("l")
      .join(orders.as("o"), col("l.l_orderkey") === col("o.o_orderkey"))
      .join(broadcast(customer.as("c")), col("o.o_custkey") === col("c.c_custkey"))
      .join(broadcast(supplier.as("s")), col("l.l_suppkey") === col("s.s_suppkey"))
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
    * DuckDB oracle (SURVEY.md §7.3).
    */
  def q1Agg(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    val dec = (c: Column) => c.cast("decimal(18,2)")
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec(col("l_quantity"))).as("sum_qty"),
        sum(dec(col("l_extendedprice"))).as("sum_base_price"),
        sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))
          .as("sum_disc_price"),
        count(lit(1)).as("count_order"))
  }

  val q1AggSql: String =
    """SELECT l_returnflag, l_linestatus,
      |       sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
      |       sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS sum_base_price,
      |       sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS sum_disc_price,
      |       count(*) AS count_order
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus""".stripMargin
}
