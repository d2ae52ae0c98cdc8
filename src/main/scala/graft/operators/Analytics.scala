package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Op, Tables}

/** Wider analytics surface a general engine owes its users beyond the
  * reference's single query: multi-level aggregation (ROLLUP/CUBE),
  * exact percentiles, pivot, as-of join, deterministic sampling, and
  * table statistics (the reference's `ANALYZE` step, SURVEY.md §2.8 O5,
  * reborn as a queryable operator).
  */
object Analytics {

  private def dec(c: Column) = c.cast("decimal(18,2)")

  /** ROLLUP: hierarchical subtotals in one pass — Spark expands grouping
    * sets and aggregates with partial aggregation per set. Sums aggregate
    * in exact DECIMAL and surface as DOUBLE: decimal outputs render
    * scale-dependently across result readers (`.00` vs `.0`) and break
    * hash comparison; identical float64 bits never do.
    */
  def aggRollup(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), sum(dec(col("l_quantity"))).cast("double").as("sum_qty"))

  val aggRollupSql: String =
    """SELECT l_returnflag, l_linestatus, count(*) AS n,
      |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin

  /** CUBE: all grouping-set combinations. */
  def aggCube(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), sum(dec(col("l_extendedprice"))).cast("double").as("sum_price"))

  val aggCubeSql: String =
    """SELECT l_returnflag, l_linestatus, count(*) AS n,
      |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)""".stripMargin

  /** Exact interpolated percentiles (Spark `percentile` ≡ DuckDB
    * `quantile_cont`). Exact percentile sorts per group — at 100 TB the
    * approximate sketch (`approx_percentile`, mergeable KLL-style) is the
    * scale path; exact is the verifiable baseline.
    */
  def aggPercentiles(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        round(expr("percentile(l_quantity, 0.25)"), 6).as("p25"),
        round(expr("percentile(l_quantity, 0.5)"), 6).as("p50"),
        round(expr("percentile(l_quantity, 0.75)"), 6).as("p75"),
        round(expr("percentile(l_extendedprice, 0.9)"), 6).as("price_p90"))

  val aggPercentilesSql: String =
    """SELECT l_returnflag,
      |       round(quantile_cont(l_quantity, 0.25), 6) AS p25,
      |       round(quantile_cont(l_quantity, 0.5), 6) AS p50,
      |       round(quantile_cont(l_quantity, 0.75), 6) AS p75,
      |       round(quantile_cont(l_extendedprice, 0.9), 6) AS price_p90
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  private val EventTypes = Seq("click", "view", "purchase", "signup", "error")

  /** Pivot: per-user event counts spread into one column per type (fixed
    * value list — dynamic pivots need a driver-side distinct pass, which
    * is an explicit design choice at scale).
    */
  def eventsPivot(spark: SparkSession, dir: String): DataFrame = {
    val pivoted = Tables(spark, dir, "events")
      .groupBy(col("user_id"))
      .pivot("event_type", EventTypes)
      .agg(count(lit(1)))
    pivoted.select(col("user_id") +:
      EventTypes.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
  }

  val eventsPivotSql: String = {
    val cols = EventTypes
      .map(t => s"count(*) FILTER (WHERE event_type = '$t') AS $t")
      .mkString(",\n       ")
    s"""SELECT user_id,
       |       $cols
       |FROM events GROUP BY user_id""".stripMargin
  }

  /** As-of join, window-composed: each purchase event picks up the
    * user's most recent STRICTLY-prior click (event-time ordered,
    * event_id tiebreak). One shuffle on user_id; no custom operator
    * needed — `last(_, ignoreNulls) over (unbounded, -1)` expresses the
    * as-of semantics exactly (SURVEY.md §7.2: compose built-ins first).
    */
  def eventsAsof(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables(spark, dir, "events")
      .withColumn("prior_click_id",
        last(when(col("event_type") === "click", col("event_id")), ignoreNulls = true).over(w))
      .withColumn("prior_click_ts",
        last(when(col("event_type") === "click", col("ts")), ignoreNulls = true).over(w))
      .where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts").as("purchase_ts"),
        col("prior_click_id"), col("prior_click_ts"))
  }

  val eventsAsofSql: String =
    """SELECT event_id, user_id, ts AS purchase_ts,
      |       last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
      |         OVER w AS prior_click_id,
      |       last_value(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
      |         OVER w AS prior_click_ts
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |QUALIFY event_type = 'purchase'""".stripMargin

  /** Deterministic hash sampling: ~10% of events by md5 prefix of the
    * key — reproducible across engines and runs, pushes to the scan as a
    * plain predicate (unlike `TABLESAMPLE`, which is nondeterministic
    * across engines).
    */
  def sampleHash(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .where(substring(md5(col("event_id").cast("string")), 1, 2) < "1a")
      .select(col("event_id"), col("user_id"), col("event_type"))

  val sampleHashSql: String =
    """SELECT event_id, user_id, event_type FROM events
      |WHERE substr(md5(CAST(event_id AS VARCHAR)), 1, 2) < '1a'""".stripMargin

  /** Table statistics as a queryable result — the reference's `ANALYZE
    * main;` step (`fetch.go:198-202`) produced `sqlite_stat1` for the
    * optimizer; here the same per-column profile (count/nulls/ndv/
    * min/max) feeds either `ANALYZE TABLE` or data-quality checks.
    */
  def statsSummary(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    val cols = Seq("l_orderkey", "l_quantity", "l_returnflag", "l_shipdate")
    // Union-of-aggregates is the COLUMNAR-correct shape, not a naive
    // one: each branch's parquet scan is pruned to a single column, so
    // the four branches together read the same bytes as one four-column
    // scan — while fusing the four count(DISTINCT)s into one aggregation
    // forces an Expand (rows × |distinct aggs|+1) and sort-based
    // aggregation, measured 27× slower on this profile.
    cols.map { c =>
      li.agg(
        lit(c).as("column_name"),
        count(lit(1)).as("n_rows"),
        (count(lit(1)) - count(col(c))).as("n_nulls"),
        countDistinct(col(c)).as("ndv"),
        min(col(c)).cast("string").as("min_val"),
        max(col(c)).cast("string").as("max_val"))
    }.reduce(_.unionAll(_))
  }

  val statsSummarySql: String =
    Seq("l_orderkey", "l_quantity", "l_returnflag", "l_shipdate").map { c =>
      s"""SELECT '$c' AS column_name, count(*) AS n_rows,
         |       count(*) - count($c) AS n_nulls,
         |       count(DISTINCT $c) AS ndv,
         |       CAST(min($c) AS VARCHAR) AS min_val,
         |       CAST(max($c) AS VARCHAR) AS max_val
         |FROM lineitem""".stripMargin
    }.mkString("\nUNION ALL\n")

  /** Sketch-based approximate aggregates — the 100 TB path for
    * distinct-count and percentile (HLL++ and a mergeable quantile
    * sketch; both combine map-side, unlike their exact forms). No oracle
    * (approximation is engine-specific); the suite bounds the error
    * against the exact operators.
    */
  def aggApprox(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_orderkey"), 0.02).as("approx_orders"),
        expr("approx_percentile(l_extendedprice, 0.5)").as("approx_median_price"))

  /** Values-if-present oracle for the sketches (the
    * `sim_topk_*_check` pattern): the approximate VALUES are
    * engine-specific, but their error CONTRACTS are checkable claims.
    * Emits per group the exact distinct count (oracle-comparable
    * directly) plus two bound verdicts — HLL++ within 3σ of its 2% rsd,
    * and the approx-median's exact RANK inside [0.4n, 0.6n] — which the
    * DuckDB twin states as constants. The rank check is deliberately
    * not `percentile(...)`: Spark's exact percentile buffers and sorts
    * every group's values (measured 5.5 s of a 40 s bench at sf0.1),
    * while counting values below the estimate is one streaming hash
    * aggregation over the scan — the same claim, scan-shaped.
    */
  def aggApproxCheck(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .join(broadcast(aggApprox(spark, dir)), Seq("l_returnflag"))
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_orderkey")).as("exact_orders"),
        first(col("approx_orders")).as("approx_orders"),
        count(lit(1)).as("n"),
        count(when(col("l_extendedprice") < col("approx_median_price"), 1))
          .as("n_below"))
      .select(col("l_returnflag"), col("exact_orders"),
        (abs(col("approx_orders") - col("exact_orders"))
          <= col("exact_orders") * 0.06).as("ndv_ok"),
        (col("n_below") >= col("n") * 0.4 &&
          col("n_below") <= col("n") * 0.6).as("median_ok"))

  val aggApproxCheckSql: String =
    """SELECT l_returnflag, count(DISTINCT l_orderkey) AS exact_orders,
      |       true AS ndv_ok, true AS median_ok
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  /** Scalar-function families in one projection — string manipulation,
    * date-part extraction, conditional/null handling — each expression
    * chosen to evaluate identically in Spark and DuckDB (both follow
    * ANSI semantics here; the one known divergence, day-of-week
    * numbering, is normalized through the ISO variant).
    */
  def scalarFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders")
      .where(col("o_orderkey") < 1000)
      .select(
        col("o_orderkey"),
        upper(col("o_orderpriority")).as("pri_upper"),
        lower(col("o_orderstatus")).as("status_lower"),
        substring(col("o_orderpriority"), 1, 1).as("pri_code"),
        regexp_replace(col("o_orderpriority"), "[0-9]-", "").as("pri_name"),
        lpad(col("o_orderkey").cast("string"), 10, "0").as("key_padded"),
        concat_ws("|", col("o_orderstatus"), col("o_orderpriority")).as("status_pri"),
        year(col("o_orderdate")).cast("long").as("y"),
        month(col("o_orderdate")).cast("long").as("m"),
        dayofmonth(col("o_orderdate")).cast("long").as("d"),
        expr("extract(DAYOFWEEK_ISO FROM o_orderdate)").cast("long").as("iso_dow"),
        date_add(col("o_orderdate").cast("date"), 30).as("due_date"),
        when(col("o_totalprice") > 200000, "large")
          .when(col("o_totalprice") > 100000, "medium")
          .otherwise("small").as("size_class"),
        nullif(col("o_orderstatus"), lit("O")).as("status_or_null"),
        coalesce(nullif(col("o_orderstatus"), lit("O")), lit("open")).as("status_label"))

  val scalarFuncsSql: String =
    """SELECT o_orderkey,
      |       upper(o_orderpriority) AS pri_upper,
      |       lower(o_orderstatus) AS status_lower,
      |       substr(o_orderpriority, 1, 1) AS pri_code,
      |       regexp_replace(o_orderpriority, '[0-9]-', '') AS pri_name,
      |       lpad(CAST(o_orderkey AS VARCHAR), 10, '0') AS key_padded,
      |       concat_ws('|', o_orderstatus, o_orderpriority) AS status_pri,
      |       CAST(year(o_orderdate) AS BIGINT) AS y,
      |       CAST(month(o_orderdate) AS BIGINT) AS m,
      |       CAST(day(o_orderdate) AS BIGINT) AS d,
      |       CAST(isodow(o_orderdate) AS BIGINT) AS iso_dow,
      |       CAST(o_orderdate AS DATE) + 30 AS due_date,
      |       CASE WHEN o_totalprice > 200000 THEN 'large'
      |            WHEN o_totalprice > 100000 THEN 'medium'
      |            ELSE 'small' END AS size_class,
      |       nullif(o_orderstatus, 'O') AS status_or_null,
      |       coalesce(nullif(o_orderstatus, 'O'), 'open') AS status_label
      |FROM orders WHERE o_orderkey < 1000""".stripMargin

  /** Correlated scalar subquery through the `spark.sql` surface:
    * cheapest part(s) per brand, written exactly as a user would write
    * it — Catalyst decorrelates the subquery into an aggregate + join
    * (visible in `.explain`), which is the plan a hand-rewritten version
    * would produce; no per-row re-execution survives to the physical
    * plan. Identical SQL runs on both engines.
    */
  def corrSubquery(spark: SparkSession, dir: String): DataFrame = {
    Tables(spark, dir, "part").createOrReplaceTempView("part")
    spark.sql(corrSubquerySql)
  }

  val corrSubquerySql: String =
    """SELECT p.p_partkey, p.p_brand, p.p_retailprice
      |FROM part p
      |WHERE p.p_retailprice = (SELECT min(p2.p_retailprice)
      |                         FROM part p2
      |                         WHERE p2.p_brand = p.p_brand)""".stripMargin

  /** Explicit GROUPING SETS (the general form under ROLLUP/CUBE): the
    * full pair, the returnflag margin, and the grand total — but NOT the
    * linestatus margin, which is what neither rollup nor cube can express.
    * Same Expand-based physical plan as cube, one expansion per set.
    */
  def aggGroupingSets(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    li.groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")),
          Seq(col("l_returnflag")), Seq()),
        col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))
  }

  val aggGroupingSetsSql: String =
    """SELECT l_returnflag, l_linestatus, count(*) AS n,
      |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())""".stripMargin

  /** Distribution drift between two halves of the event stream —
    * population stability index per event type over fixed value buckets,
    * the standing data-quality check in front of a training pipeline.
    * ONE scan: each (type, bucket) row carries both periods' counts as
    * conditional aggregates; per-type totals come from a window over that
    * ~|types|·|buckets| frame, so nothing event-sized shuffles twice.
    * Laplace-smoothed over OBSERVED buckets (a bucket empty in both
    * periods contributes nothing — presence is deterministic, so the
    * bucket set agrees across engines). PSI > 0.2 is the conventional
    * "investigate" threshold.
    */
  private val DriftBuckets = 10
  private val DriftCut = "2024-01-16"

  def statsDrift(spark: SparkSession, dir: String): DataFrame = {
    val bucket = least(floor(col("value") / 50.0), lit(DriftBuckets - 1))
      .cast("long")
    val inA = col("ts").cast("date") < lit(DriftCut).cast("date")
    val byType = Window.partitionBy(col("event_type"))
    val counts = Tables(spark, dir, "events")
      .groupBy(col("event_type"), bucket.as("bucket"))
      .agg(count(when(inA, 1)).as("ca"), count(when(!inA, 1)).as("cb"))
      .withColumn("na", sum(col("ca")).over(byType))
      .withColumn("nb", sum(col("cb")).over(byType))
      .withColumn("nobs", count(lit(1)).over(byType))
    // +1 per OBSERVED bucket in the numerator ⇒ the denominator adds the
    // per-type observed-bucket count, so each period's smoothed masses
    // sum to exactly 1 over the type's bucket frame (ADVICE r4: a fixed
    // +DriftBuckets denominator biased PSI for types covering fewer than
    // the full grid).
    val p = (col("ca") + 1).cast("double") / (col("na") + col("nobs"))
    val q = (col("cb") + 1).cast("double") / (col("nb") + col("nobs"))
    counts
      .select(col("event_type"), ((p - q) * log(p / q)).as("term"))
      .groupBy(col("event_type"))
      .agg(round(sum(col("term")), 6).as("psi"))
      .select(col("event_type"), col("psi"), (col("psi") > 0.2).as("drifted"))
  }

  val statsDriftSql: String =
    s"""WITH c AS (
       |  SELECT event_type,
       |         least(CAST(floor(value / 50.0) AS BIGINT), ${DriftBuckets - 1}) AS bucket,
       |         count(CASE WHEN CAST(ts AS DATE) < DATE '$DriftCut' THEN 1 END) AS ca,
       |         count(CASE WHEN CAST(ts AS DATE) >= DATE '$DriftCut' THEN 1 END) AS cb
       |  FROM events GROUP BY 1, 2
       |), t AS (
       |  SELECT event_type, ca, cb,
       |         sum(ca) OVER (PARTITION BY event_type) AS na,
       |         sum(cb) OVER (PARTITION BY event_type) AS nb,
       |         count(*) OVER (PARTITION BY event_type) AS nobs
       |  FROM c
       |), terms AS (
       |  SELECT event_type,
       |         (CAST(ca + 1 AS DOUBLE) / (na + nobs) -
       |          CAST(cb + 1 AS DOUBLE) / (nb + nobs)) *
       |         ln((CAST(ca + 1 AS DOUBLE) / (na + nobs)) /
       |            (CAST(cb + 1 AS DOUBLE) / (nb + nobs))) AS term
       |  FROM t
       |)
       |SELECT event_type, round(sum(term), 6) AS psi,
       |       round(sum(term), 6) > 0.2 AS drifted
       |FROM terms GROUP BY event_type""".stripMargin

  /** Unpivot/melt — wide metric columns to (metric, value) rows, the
    * inverse of `events_pivot` and the long-form reshape feature jobs
    * want. A pure per-row Expand (×|metrics|), no shuffle; the filter
    * pushes to the scan.
    */
  def unpivotMetrics(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .where(col("l_orderkey") < 100)
      .unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
        "metric", "val")

  val unpivotMetricsSql: String =
    """SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS val
      |FROM lineitem WHERE l_orderkey < 100
      |UNION ALL
      |SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
      |FROM lineitem WHERE l_orderkey < 100
      |UNION ALL
      |SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
      |FROM lineitem WHERE l_orderkey < 100""".stripMargin

  /** Join-key skew diagnostic — the pre-flight check before any large
    * shuffle join: per candidate key, the frequency distribution of the
    * key (max / p50 / p99 counts, the heaviest key's row share, and
    * max/avg ratio). This is how a pipeline DECIDES between a plain
    * shuffle join, a broadcast, and `Skew.saltedJoin` — at 100 TB you
    * measure skew on the reduced frame first, you don't discover it as
    * a straggler task. Shape: one map-side-combined reduction per key to
    * its (key, cnt) frame (the only corpus-sized passes), then a scalar
    * aggregation over each reduced frame; output is |keys audited| rows.
    * Percentiles are Spark's exact `percentile` — (n−1)p linear
    * interpolation over integer counts, the same fixed IEEE sequence
    * DuckDB's quantile_cont computes, so the oracle compare is exact.
    */
  def skewReport(spark: SparkSession, dir: String): DataFrame = {
    def audit(table: String, key: String): DataFrame =
      Tables(spark, dir, table)
        .groupBy(col(key)).agg(count(lit(1)).as("cnt"))
        .agg(
          lit(s"$table.$key").as("join_key"),
          sum(col("cnt")).as("n_rows"),
          count(lit(1)).as("n_keys"),
          max(col("cnt")).as("max_cnt"),
          round(percentile(col("cnt"), lit(0.5)), 6).as("p50_cnt"),
          round(percentile(col("cnt"), lit(0.99)), 6).as("p99_cnt"))
        .select(col("join_key"), col("n_rows"), col("n_keys"), col("max_cnt"),
          col("p50_cnt"), col("p99_cnt"),
          round(col("max_cnt") / (col("n_rows").cast("double") /
            col("n_keys")), 6).as("skew_ratio"),
          round(col("max_cnt") / col("n_rows").cast("double"), 6)
            .as("top1_share"))
    audit("events", "user_id")
      .unionAll(audit("events", "event_type"))
      .unionAll(audit("orders", "o_custkey"))
  }

  val skewReportSql: String =
    Seq(("events", "user_id"), ("events", "event_type"),
      ("orders", "o_custkey")).map { case (t, k) =>
      s"""SELECT '$t.$k' AS join_key, CAST(sum(cnt) AS BIGINT) AS n_rows,
         |       count(*) AS n_keys, max(cnt) AS max_cnt,
         |       round(quantile_cont(cnt, 0.5), 6) AS p50_cnt,
         |       round(quantile_cont(cnt, 0.99), 6) AS p99_cnt,
         |       round(max(cnt) / (CAST(sum(cnt) AS DOUBLE) / count(*)), 6)
         |         AS skew_ratio,
         |       round(max(cnt) / CAST(sum(cnt) AS DOUBLE), 6) AS top1_share
         |FROM (SELECT $k, count(*) AS cnt FROM $t GROUP BY 1)""".stripMargin
    }.mkString("\nUNION ALL\n")

  /** Pareto / ABC analysis: rank suppliers by revenue and classify by
    * cumulative revenue share (A ≤ 80%, B ≤ 95%, C the tail) — the
    * concentration question ("which 20% of suppliers carry 80% of
    * volume?") every warehouse answers. Scale shape mirrors
    * `Curation.curriculum`'s global-order decomposition — NO global
    * window: the corpus-sized pass is the map-side-combined reduction to
    * the \|suppliers\| frame; then deterministic revenue cut points
    * (approx_percentile, broadcast as literals) range-bin that frame,
    * the running sum runs in a window PARTITIONED by bin, and broadcast
    * per-bin revenue offsets (triangular join over ≤ numPartitions
    * metadata rows) reconstruct the exact global cumulative sum. All
    * accumulation is DECIMAL — bin-local + offset decomposition is
    * exact, so the oracle stays the plain global-window SQL. The share
    * is cast to double and rounded only at the boundary; the A/B/C cut
    * is applied to the ROUNDED share so both engines classify
    * identically on threshold-grazing values.
    */
  def aggPareto(spark: SparkSession, dir: String): DataFrame = {
    val parts = spark.sessionState.conf.numShufflePartitions
    val sup = Tables(spark, dir, "lineitem")
      .groupBy(col("l_suppkey"))
      .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast("decimal(18,4)")).cast("decimal(38,4)").as("rev"))
    val fracs = (1 until parts).map(i => i.toDouble / parts)
    val cutVals: Seq[Double] =
      if (fracs.isEmpty) Nil
      else {
        // null = empty input: one bin, empty result (EdgeCaseSpec)
        val cutRow = sup.agg(expr(
          s"approx_percentile(CAST(rev AS DOUBLE), array(${fracs.mkString(", ")}), 10000)")
          .as("cuts")).head()
        if (cutRow.isNullAt(0)) Nil else cutRow.getSeq[Double](0)
      }
    // bin 0 = highest revenue (descending order): count of cuts strictly
    // above the row's revenue; monotone along the sort order, ties merge.
    val cutArr =
      if (cutVals.isEmpty) array().cast("array<double>")
      else array(cutVals.map(lit): _*)
    val binned = sup.withColumn("pid",
      size(filter(cutArr, c => c > col("rev").cast("double"))).cast("int"))
    val byBin = Window.partitionBy(col("pid"))
      .orderBy(col("rev").desc, col("l_suppkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = binned.withColumn("lcum",
      sum(col("rev")).over(byBin).cast("decimal(38,4)"))
    val binRev = binned.groupBy(col("pid"))
      .agg(sum(col("rev")).cast("decimal(38,4)").as("brev"))
    val offsets = binRev.as("a")
      .join(binRev.as("b"), col("b.pid") < col("a.pid"), "left")
      .groupBy(col("a.pid").as("pid"))
      .agg(coalesce(sum(col("b.brev")), lit(0).cast("decimal(38,4)")).as("off"))
    val total = binned.agg(sum(col("rev")).cast("decimal(38,4)").as("tot"))
    local.join(broadcast(offsets), Seq("pid"))
      .crossJoin(broadcast(total))
      .withColumn("cum_share",
        round((col("off") + col("lcum")).cast("double") /
          col("tot").cast("double"), 6))
      .select(col("l_suppkey"), col("rev").cast("double").as("revenue"),
        col("cum_share"),
        when(col("cum_share") <= 0.8, "A")
          .when(col("cum_share") <= 0.95, "B")
          .otherwise("C").as("abc_class"))
  }

  val aggParetoSql: String =
    """WITH sup AS (
      |  SELECT l_suppkey,
      |         CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
      |                       AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS rev
      |  FROM lineitem GROUP BY 1
      |), c AS (
      |  SELECT l_suppkey, CAST(rev AS DOUBLE) AS revenue,
      |         round(CAST(sum(rev) OVER (ORDER BY rev DESC, l_suppkey)
      |                    AS DOUBLE) /
      |               CAST((SELECT sum(rev) FROM sup) AS DOUBLE), 6)
      |           AS cum_share
      |  FROM sup
      |)
      |SELECT l_suppkey, revenue, cum_share,
      |       CASE WHEN cum_share <= 0.8 THEN 'A'
      |            WHEN cum_share <= 0.95 THEN 'B'
      |            ELSE 'C' END AS abc_class
      |FROM c""".stripMargin

  /** Per-group trend detection: ordinary least squares of daily event
    * volume against the day index, per event type — "is this stream
    * growing, and how fast?" answered as (slope, intercept, r²) instead
    * of eyeballing a chart. Everything up to the final divisions is
    * EXACT integer arithmetic: x = offset from the type's own first day,
    * y = daily count, and the five moments (n, Σx, Σy, Σxy, Σx², Σy²)
    * accumulate as DECIMAL(38,0) — no float order-dependence, so the
    * closed-form OLS quotients are single IEEE ops on identical operands
    * in any engine (rounded once at the boundary). Shape at scale: one
    * map-side-combined corpus pass to (type, day) cells, then a
    * \|types\|-row moment reduction — the regression itself never sees
    * more than \|types\| rows. Degenerate groups (one day, or zero
    * x-variance) are excluded rather than dividing by zero.
    */
  def statsTrend(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables(spark, dir, "events")
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("y"))
    val withX = cells
      .withColumn("x",
        datediff(col("day"),
          min(col("day")).over(Window.partitionBy(col("event_type"))))
          .cast("long"))
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val m = withX.groupBy(col("event_type")).agg(
      count(lit(1)).as("n_days"),
      sum(d38(col("x"))).as("sx"),
      sum(d38(col("y"))).as("sy"),
      sum(d38(col("x") * col("y"))).as("sxy"),
      sum(d38(col("x") * col("x"))).as("sxx"),
      sum(d38(col("y") * col("y"))).as("syy"))
    m.withColumn("den", d38(col("n_days")) * col("sxx") - col("sx") * col("sx"))
      .withColumn("num", d38(col("n_days")) * col("sxy") - col("sx") * col("sy"))
      .withColumn("deny", d38(col("n_days")) * col("syy") - col("sy") * col("sy"))
      .where(col("n_days") >= 2 && col("den") =!= 0)
      .select(
        col("event_type"), col("n_days"),
        round(col("num").cast("double") / col("den").cast("double"), 6)
          .as("slope"),
        round((col("sy").cast("double") -
          col("num").cast("double") / col("den").cast("double") *
            col("sx").cast("double")) / col("n_days").cast("double"), 6)
          .as("intercept"),
        when(col("deny") === 0, lit(1.0))
          .otherwise(round(
            col("num").cast("double") * col("num").cast("double") /
              (col("den").cast("double") * col("deny").cast("double")), 6))
          .as("r2"))
  }

  val statsTrendSql: String =
    """WITH cells AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS y
      |  FROM events GROUP BY 1, 2
      |), wx AS (
      |  SELECT event_type, y,
      |         CAST(day - min(day) OVER (PARTITION BY event_type) AS BIGINT) AS x
      |  FROM cells
      |), m AS (
      |  SELECT event_type, count(*) AS n_days,
      |         sum(CAST(x AS DECIMAL(38,0))) AS sx,
      |         sum(CAST(y AS DECIMAL(38,0))) AS sy,
      |         sum(CAST(x * y AS DECIMAL(38,0))) AS sxy,
      |         sum(CAST(x * x AS DECIMAL(38,0))) AS sxx,
      |         sum(CAST(y * y AS DECIMAL(38,0))) AS syy
      |  FROM wx GROUP BY 1
      |), d AS (
      |  SELECT *,
      |         CAST(n_days AS DECIMAL(38,0)) * sxx - sx * sx AS den,
      |         CAST(n_days AS DECIMAL(38,0)) * sxy - sx * sy AS num,
      |         CAST(n_days AS DECIMAL(38,0)) * syy - sy * sy AS deny
      |  FROM m
      |)
      |SELECT event_type, n_days,
      |       round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6) AS slope,
      |       round((CAST(sy AS DOUBLE) -
      |              CAST(num AS DOUBLE) / CAST(den AS DOUBLE) *
      |                CAST(sx AS DOUBLE)) / CAST(n_days AS DOUBLE), 6)
      |         AS intercept,
      |       CASE WHEN deny = 0 THEN 1.0
      |            ELSE round(CAST(num AS DOUBLE) * CAST(num AS DOUBLE) /
      |                       (CAST(den AS DOUBLE) * CAST(deny AS DOUBLE)), 6)
      |       END AS r2
      |FROM d WHERE n_days >= 2 AND den <> 0""".stripMargin

  /** Chi-square independence test: is event type independent of
    * day-of-week? The categorical-drift hypothesis test behind "did the
    * traffic mix change by weekday" — returns the χ² statistic, degrees
    * of freedom, and Cramér's V effect size. Cross-engine float safety:
    * each cell's (obs − exp)²/exp contribution is a fixed IEEE sequence
    * on exact integer marginals, ROUNDED to 6 decimals, then summed as
    * DECIMAL(28,6) — summing a multiset of 6-decimal values in decimal
    * is order-independent, so the statistic is bit-identical in any
    * engine (the ≤ 0.5e-6·cells rounding bias is deterministic and far
    * below any significance threshold). Shape: one map-side-combined
    * pass to the \|types\|·7 cell frame; marginals via windows over that
    * tiny frame; single-row output.
    */
  def statsChisq(spark: SparkSession, dir: String): DataFrame = {
    val observed = Tables(spark, dir, "events")
      .groupBy(col("event_type"), dayofweek(col("ts")).as("dow"))
      .agg(count(lit(1)).as("n_obs"))
    // densify: χ² counts UNOBSERVED cells too ((0−e)²/e = e) — groupBy
    // drops them, so rebuild the full grid from the two marginal key
    // sets (tiny frames crossed, then zero-filled)
    val cells = observed.select(col("event_type")).distinct()
      .crossJoin(observed.select(col("dow")).distinct())
      .join(observed, Seq("event_type", "dow"), "left")
      .withColumn("n", coalesce(col("n_obs"), lit(0L)))
    val wr = Window.partitionBy(col("event_type"))
    val wc = Window.partitionBy(col("dow"))
    val wall = Window.partitionBy()
    val contrib = cells
      .withColumn("rt", sum(col("n")).over(wr))
      .withColumn("ct", sum(col("n")).over(wc))
      .withColumn("tot", sum(col("n")).over(wall))
      .withColumn("exp",
        col("rt").cast("double") * col("ct").cast("double") /
          col("tot").cast("double"))
      .withColumn("c",
        round((col("n").cast("double") - col("exp")) *
          (col("n").cast("double") - col("exp")) / col("exp"), 6)
          .cast("decimal(28,6)"))
    contrib.agg(
      sum(col("c")).cast("double").as("chi2"),
      ((countDistinct(col("event_type")) - 1) *
        (countDistinct(col("dow")) - 1)).as("df"),
      max(col("tot")).as("n_obs"),
      round(sqrt(sum(col("c")).cast("double") /
        (max(col("tot")).cast("double") *
          least(countDistinct(col("event_type")) - 1,
            countDistinct(col("dow")) - 1).cast("double"))), 6)
        .as("cramers_v"))
  }

  val statsChisqSql: String =
    """WITH observed AS (
      |  SELECT event_type, dayofweek(ts) + 1 AS dow, count(*) AS n_obs
      |  FROM events GROUP BY 1, 2
      |), cells AS (
      |  SELECT t.event_type, d.dow, COALESCE(o.n_obs, 0) AS n
      |  FROM (SELECT DISTINCT event_type FROM observed) t
      |  CROSS JOIN (SELECT DISTINCT dow FROM observed) d
      |  LEFT JOIN observed o
      |    ON o.event_type = t.event_type AND o.dow = d.dow
      |), x AS (
      |  SELECT *,
      |         CAST(sum(n) OVER (PARTITION BY event_type) AS BIGINT) AS rt,
      |         CAST(sum(n) OVER (PARTITION BY dow) AS BIGINT) AS ct,
      |         CAST(sum(n) OVER () AS BIGINT) AS tot
      |  FROM cells
      |), c AS (
      |  SELECT *,
      |         CAST(round((CAST(n AS DOUBLE) -
      |                     CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) /
      |                       CAST(tot AS DOUBLE)) *
      |                    (CAST(n AS DOUBLE) -
      |                     CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) /
      |                       CAST(tot AS DOUBLE)) /
      |                    (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) /
      |                       CAST(tot AS DOUBLE)), 6)
      |              AS DECIMAL(28,6)) AS contrib
      |  FROM x
      |)
      |SELECT CAST(sum(contrib) AS DOUBLE) AS chi2,
      |       (count(DISTINCT event_type) - 1) *
      |         (count(DISTINCT dow) - 1) AS df,
      |       max(tot) AS n_obs,
      |       round(sqrt(CAST(sum(contrib) AS DOUBLE) /
      |                  (CAST(max(tot) AS DOUBLE) *
      |                   CAST(least(count(DISTINCT event_type) - 1,
      |                              count(DISTINCT dow) - 1) AS DOUBLE))), 6)
      |         AS cramers_v
      |FROM c""".stripMargin

  /** Pearson correlation matrix over the fact table's numeric columns in
    * ONE scan — data profiling's "which measures move together". The
    * built-in `corr` accumulates floats in partition order (non-
    * deterministic across engines AND across runs); this computes every
    * moment (Σx, Σx², Σxy per pair) as EXACT DECIMAL sums on the 2-dp
    * value grid in a single aggregation (map-side combined, one row
    * out), then forms each correlation as a fixed IEEE sequence on
    * identical operands. The three pairs unpivot from that one row —
    * the scan reads exactly three columns once.
    */
  def statsCorr(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    val colsL = Seq("l_quantity", "l_extendedprice", "l_discount")
    val d = (c: String) => col(c).cast("decimal(18,4)")
    val moments = li.agg(
      count(lit(1)).as("n"),
      sum(d(colsL(0))).as("s0"), sum(d(colsL(1))).as("s1"), sum(d(colsL(2))).as("s2"),
      sum((d(colsL(0)) * d(colsL(0))).cast("decimal(38,8)")).as("q0"),
      sum((d(colsL(1)) * d(colsL(1))).cast("decimal(38,8)")).as("q1"),
      sum((d(colsL(2)) * d(colsL(2))).cast("decimal(38,8)")).as("q2"),
      sum((d(colsL(0)) * d(colsL(1))).cast("decimal(38,8)")).as("p01"),
      sum((d(colsL(0)) * d(colsL(2))).cast("decimal(38,8)")).as("p02"),
      sum((d(colsL(1)) * d(colsL(2))).cast("decimal(38,8)")).as("p12"))
    def corrCol(sa: String, sb: String, qa: String, qb: String, p: String) = {
      val n = col("n").cast("double")
      val num = n * col(p).cast("double") -
        col(sa).cast("double") * col(sb).cast("double")
      val da = n * col(qa).cast("double") -
        col(sa).cast("double") * col(sa).cast("double")
      val db = n * col(qb).cast("double") -
        col(sb).cast("double") * col(sb).cast("double")
      round(num / (sqrt(da) * sqrt(db)), 6)
    }
    moments.select(explode(array(
      struct(lit(colsL(0)).as("col_a"), lit(colsL(1)).as("col_b"),
        corrCol("s0", "s1", "q0", "q1", "p01").as("corr")),
      struct(lit(colsL(0)).as("col_a"), lit(colsL(2)).as("col_b"),
        corrCol("s0", "s2", "q0", "q2", "p02").as("corr")),
      struct(lit(colsL(1)).as("col_a"), lit(colsL(2)).as("col_b"),
        corrCol("s1", "s2", "q1", "q2", "p12").as("corr")))).as("e"))
      .select(col("e.col_a"), col("e.col_b"), col("e.corr"))
  }

  val statsCorrSql: String =
    """WITH m AS (
      |  SELECT count(*) AS n,
      |         sum(CAST(l_quantity AS DECIMAL(18,4))) AS s0,
      |         sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS s1,
      |         sum(CAST(l_discount AS DECIMAL(18,4))) AS s2,
      |         sum(CAST(CAST(l_quantity AS DECIMAL(19,4)) *
      |                  CAST(l_quantity AS DECIMAL(18,4)) AS DECIMAL(38,8))) AS q0,
      |         sum(CAST(CAST(l_extendedprice AS DECIMAL(19,4)) *
      |                  CAST(l_extendedprice AS DECIMAL(18,4)) AS DECIMAL(38,8))) AS q1,
      |         sum(CAST(CAST(l_discount AS DECIMAL(19,4)) *
      |                  CAST(l_discount AS DECIMAL(18,4)) AS DECIMAL(38,8))) AS q2,
      |         sum(CAST(CAST(l_quantity AS DECIMAL(19,4)) *
      |                  CAST(l_extendedprice AS DECIMAL(18,4)) AS DECIMAL(38,8))) AS p01,
      |         sum(CAST(CAST(l_quantity AS DECIMAL(19,4)) *
      |                  CAST(l_discount AS DECIMAL(18,4)) AS DECIMAL(38,8))) AS p02,
      |         sum(CAST(CAST(l_extendedprice AS DECIMAL(19,4)) *
      |                  CAST(l_discount AS DECIMAL(18,4)) AS DECIMAL(38,8))) AS p12
      |  FROM lineitem
      |)
      |SELECT col_a, col_b,
      |       round((CAST(n AS DOUBLE) * CAST(p AS DOUBLE) -
      |              CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE)) /
      |             (sqrt(CAST(n AS DOUBLE) * CAST(qa AS DOUBLE) -
      |                   CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE)) *
      |              sqrt(CAST(n AS DOUBLE) * CAST(qb AS DOUBLE) -
      |                   CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE))), 6) AS corr
      |FROM m, (VALUES
      |  ('l_quantity', 'l_extendedprice'), ('l_quantity', 'l_discount'),
      |  ('l_extendedprice', 'l_discount')) AS pairs(col_a, col_b),
      |LATERAL (SELECT
      |  CASE col_a WHEN 'l_quantity' THEN s0 WHEN 'l_extendedprice' THEN s1 ELSE s2 END AS sa,
      |  CASE col_b WHEN 'l_quantity' THEN s0 WHEN 'l_extendedprice' THEN s1 ELSE s2 END AS sb,
      |  CASE col_a WHEN 'l_quantity' THEN q0 WHEN 'l_extendedprice' THEN q1 ELSE q2 END AS qa,
      |  CASE col_b WHEN 'l_quantity' THEN q0 WHEN 'l_extendedprice' THEN q1 ELSE q2 END AS qb,
      |  CASE WHEN col_a = 'l_quantity' AND col_b = 'l_extendedprice' THEN p01
      |       WHEN col_a = 'l_quantity' AND col_b = 'l_discount' THEN p02
      |       ELSE p12 END AS p) AS sel""".stripMargin

  /** Data-quality assertion suite as one queryable result: each rule
    * (null key, non-positive amount, out-of-range date, orphan foreign
    * key, NaN metric, empty text) reports violations/checked — the
    * contract gate a pipeline runs BEFORE publishing a snapshot, shaped
    * so a scheduler can alert on any n_violations > 0 row. Each branch
    * is a single-scan conditional aggregation pruned to the columns it
    * audits; the referential-integrity rule is a LEFT ANTI join count
    * (orders side broadcastable when dimension-sized, shuffle otherwise
    * — Catalyst's choice, not hand-pinned). Union of one-row frames.
    */
  def dqChecks(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables(spark, dir, "orders")
    val li = Tables(spark, dir, "lineitem")
    val ev = Tables(spark, dir, "events")
    val docs = Tables(spark, dir, "documents")
    def rule(name: String, df: DataFrame, bad: Column): DataFrame =
      df.agg(lit(name).as("rule"),
        sum(when(bad, 1L).otherwise(0L)).as("n_violations"),
        count(lit(1)).as("n_checked"))
    val orphan = li.select(col("l_orderkey"))
      .join(orders.select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(lit("lineitem.l_orderkey_orphan").as("rule"),
        count(lit(1)).as("n_violations"),
        first(lit(-1L)).as("n_checked"))
      .select(col("rule"), col("n_violations"),
        coalesce(col("n_checked"), lit(-1L)).as("n_checked"))
    rule("orders.o_totalprice_nonpositive", orders, col("o_totalprice") <= 0)
      .unionAll(rule("orders.o_orderdate_out_of_range", orders,
        col("o_orderdate") < to_timestamp(lit("1990-01-01")) ||
          col("o_orderdate") >= to_timestamp(lit("2030-01-01"))))
      .unionAll(rule("events.value_nan_or_null", ev,
        col("value").isNull || isnan(col("value"))))
      .unionAll(rule("documents.text_empty_or_null", docs,
        col("text").isNull || length(trim(col("text"))) === 0))
      .unionAll(orphan)
  }

  val dqChecksSql: String =
    """SELECT 'orders.o_totalprice_nonpositive' AS rule,
      |       CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT)
      |         AS n_violations,
      |       count(*) AS n_checked FROM orders
      |UNION ALL
      |SELECT 'orders.o_orderdate_out_of_range',
      |       CAST(sum(CASE WHEN o_orderdate < TIMESTAMP '1990-01-01'
      |                       OR o_orderdate >= TIMESTAMP '2030-01-01'
      |                     THEN 1 ELSE 0 END) AS BIGINT),
      |       count(*) FROM orders
      |UNION ALL
      |SELECT 'events.value_nan_or_null',
      |       CAST(sum(CASE WHEN value IS NULL OR isnan(value)
      |                     THEN 1 ELSE 0 END) AS BIGINT),
      |       count(*) FROM events
      |UNION ALL
      |SELECT 'documents.text_empty_or_null',
      |       CAST(sum(CASE WHEN text IS NULL OR length(trim(text)) = 0
      |                     THEN 1 ELSE 0 END) AS BIGINT),
      |       count(*) FROM documents
      |UNION ALL
      |SELECT 'lineitem.l_orderkey_orphan',
      |       (SELECT count(*) FROM lineitem l
      |        WHERE NOT EXISTS (SELECT 1 FROM orders o
      |                          WHERE o.o_orderkey = l.l_orderkey)),
      |       -1""".stripMargin

  // ------------------------------------------- KLL quantile sketches
  import org.apache.spark.sql.graft.KllColumn

  /** Per-type value quantiles via KLL sketch STORE-THEN-ROLLUP: each
    * (type, day) cell reduces once to a fixed ~5 KB sketch (the only
    * corpus-sized pass, map-side combined), and the per-type quantiles
    * come from MERGING the daily partials — the shape that lets a 100 TB
    * warehouse keep per-partition sketch rows and answer any later
    * rollup (type, week, global) without re-scanning raw values, exactly
    * like `events_wau_sketch` does for distinct counts. An exact global
    * percentile would buffer every value of a group in one aggregation
    * buffer; `percentile_approx` (GK) cannot merge stored partials.
    * Sketch estimates are engine-specific → rows-only; the `_check`
    * twin is the oracled accuracy contract (KLL's published rank-error
    * bound, Karnin–Lang–Liberty 2016).
    */
  def quantileSketch(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables(spark, dir, "events")
      .where(col("value").isNotNull)
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(KllColumn.sketchAgg(col("value")).as("sk"))
    daily.groupBy(col("event_type"))
      .agg(KllColumn.mergeAgg(col("sk")).as("sk"))
      .select(col("event_type"),
        KllColumn.quantile(col("sk"), 0.5).as("p50"),
        KllColumn.quantile(col("sk"), 0.9).as("p90"),
        KllColumn.quantile(col("sk"), 0.99).as("p99"))
  }

  /** Oracled rank-error contract for `quantileSketch`: the estimate for
    * rank p must land at a value whose TRUE inclusive rank is within
    * 2× the sketch's published normalized rank-error bound (k=200 →
    * ε ≈ 1.65% at 99% confidence; 2ε makes the gate deterministic in
    * practice across KLL's randomized compaction). One extra corpus
    * scan computes the exact ranks as conditional aggregates against
    * the broadcast |types|-row estimate frame; the oracle recomputes
    * nothing sketch-side — it pins every flag true over the same
    * (type, p) grid.
    */
  def quantileSketchCheck(spark: SparkSession, dir: String): DataFrame = {
    val tol = 2.0 * KllColumn.normalizedRankError()
    val ests = quantileSketch(spark, dir)
    val ranks = Tables(spark, dir, "events")
      .where(col("value").isNotNull)
      .join(broadcast(ests), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).cast("double").as("n"),
        sum(when(col("value") <= col("p50"), 1L).otherwise(0L)).as("r50"),
        sum(when(col("value") <= col("p90"), 1L).otherwise(0L)).as("r90"),
        sum(when(col("value") <= col("p99"), 1L).otherwise(0L)).as("r99"))
    ranks.select(col("event_type"), expr(
      "stack(3, 0.5D, r50, 0.9D, r90, 0.99D, r99) AS (p, r)"), col("n"))
      .select(col("event_type"), col("p"),
        (abs(col("r") / col("n") - col("p")) <= tol).as("rank_ok"))
  }

  val quantileSketchCheckSql: String =
    """SELECT event_type, p, true AS rank_ok
      |FROM (SELECT DISTINCT event_type FROM events WHERE value IS NOT NULL)
      |CROSS JOIN (SELECT CAST(unnest([0.5, 0.9, 0.99]) AS DOUBLE) AS p)""".stripMargin

  /** Count-min-sketch heavy hitters over the corpus token stream
    * (Cormode–Muthukrishnan 2005) — the frequency sketch a streaming
    * vocabulary/abuse monitor runs when exact per-token counts don't
    * fit: depth × width counters (3 × 1024 here — KBs at ANY corpus
    * size), point query = min over the depth rows, one-sided error
    * (never under-counts; over-counts by ≤ εN w.h.p., ε ≈ 2/width).
    *
    * Unlike the HLL/KLL ops — rows-only because their native sketches
    * are engine-specific — this CMS is FULLY ORACLED: the row hashes
    * are md5-hex-prefix derived (the portable convention `crawl_seen_bloom`
    * and the fetch planner use), so DuckDB rebuilds the identical
    * counter table and the driver hash-compares estimates, exact
    * counts, and both error-contract booleans per row.
    *
    * Scale shape: the counter build is one groupBy over (row, bucket) —
    * 3 rows per token map-side-combined into ≤ 3×1024 cells; the
    * estimate probe joins candidate tokens against the BROADCAST
    * counter frame. The exact-count column is the fixture-scale audit
    * (one vocab groupBy); at 100 TB the sketch's point is that probes
    * never need it — the audit shows per-row what that trade costs.
    * Top-K under the (estimate DESC, token ASC) total order.
    */
  private val CmsDepth = 3
  private val CmsWidth = 1024
  private val CmsTopK = 20

  def heavyHittersCms(spark: SparkSession, dir: String): DataFrame = {
    val words = Tables(spark, dir, "documents")
      .select(explode(split(trim(col("text")), " ")).as("w"))
      .where(col("w") =!= "")
    heavyHittersCmsCore(words, CmsWidth, CmsDepth, CmsTopK)
  }

  /** Core over any single-column `w` token frame, parameterized so the
    * spec can shrink the width and watch collisions over-count (never
    * under-count).
    */
  private[graft] def heavyHittersCmsCore(words: DataFrame, width: Int,
      depth: Int, topK: Int): DataFrame = {
    def h(c: Column, j: Int): Column =
      conv(substring(md5(concat(c, lit(s"#$j"))), 1, 8), 16, 10)
        .cast("long") % width
    def positions(c: Column): Column =
      posexplode(array((0 until depth).map(j => h(c, j)): _*))
    val counters = words
      .select(positions(col("w")).as(Seq("j", "bucket")))
      .groupBy(col("j"), col("bucket")).agg(count(lit(1)).as("cnt"))
    val total = counters.where(col("j") === 0)
      .agg(sum(col("cnt")).as("n_total"))
    val exact = words.groupBy(col("w")).agg(count(lit(1)).as("exact"))
    exact
      .select(col("w"), col("exact"), positions(col("w")).as(Seq("j", "bucket")))
      .join(broadcast(counters), Seq("j", "bucket"))
      .groupBy(col("w"), col("exact"))
      .agg(min(col("cnt")).as("est"))
      .crossJoin(broadcast(total))
      .orderBy(col("est").desc, col("w").asc)
      .limit(topK)
      .select(col("w").as("token"), col("est").as("cms_estimate"),
        col("exact").as("exact_count"),
        (col("est") >= col("exact")).as("no_underestimate"),
        ((col("est") - col("exact")).cast("double")
          <= lit(2.0) * col("n_total") / width).as("within_eps"))
  }

  val heavyHittersCmsSql: String = {
    def pos(c: String): String =
      (0 until CmsDepth).map(j =>
        s"CAST(CAST(concat('0x', substr(md5(concat($c, '#$j')), 1, 8)) " +
          s"AS UBIGINT) % $CmsWidth AS BIGINT)").mkString("[", ", ", "]")
    s"""WITH w0 AS (
       |  SELECT unnest(string_split(trim(text), ' ')) AS w FROM documents
       |), words AS (
       |  SELECT w FROM w0 WHERE w <> ''
       |), inst AS (
       |  SELECT w, generate_subscripts(${pos("w")}, 1) - 1 AS j,
       |         unnest(${pos("w")}) AS bucket
       |  FROM words
       |), counters AS (
       |  SELECT j, bucket, CAST(count(*) AS BIGINT) AS cnt
       |  FROM inst GROUP BY 1, 2
       |), total AS (
       |  SELECT CAST(sum(cnt) AS BIGINT) AS n_total FROM counters WHERE j = 0
       |), exact AS (
       |  SELECT w, CAST(count(*) AS BIGINT) AS exact FROM words GROUP BY 1
       |), probes AS (
       |  SELECT DISTINCT w, j, bucket FROM inst
       |), est AS (
       |  SELECT p.w, min(c.cnt) AS est
       |  FROM probes p JOIN counters c ON c.j = p.j AND c.bucket = p.bucket
       |  GROUP BY p.w
       |)
       |SELECT e.w AS token, CAST(est AS BIGINT) AS cms_estimate,
       |       exact AS exact_count,
       |       est >= exact AS no_underestimate,
       |       CAST(est - exact AS DOUBLE)
       |         <= 2.0 * n_total / $CmsWidth AS within_eps
       |FROM est e JOIN exact USING (w) CROSS JOIN total
       |ORDER BY est DESC, token ASC
       |LIMIT $CmsTopK""".stripMargin
  }

  /** Portable-hash HyperLogLog distinct-token estimate per source
    * (Flajolet et al. 2007) — the FULLY-ORACLED twin of `agg_approx`'s
    * native `approx_count_distinct` (rows-only, engine-specific sketch):
    * registers derive from the md5-hex-prefix hash (the portable
    * convention), bucket = top 8 of 32 hash bits (m = 256 registers),
    * register rank = leading-zero count of the low 24 bits + 1 via the
    * EXACT `bin()`-string-length identity (floor(log2)+1 with no float
    * log anywhere). The indicator sum Σ 2^(−M_j) is a sum of exact
    * powers of two spanning < 52 mantissa bits, so every partial sum is
    * exact and ORDER-INDEPENDENT — the one place a float sum is safe by
    * construction. Small-range correction (linear counting m·ln(m/V)
    * when raw ≤ 2.5m and empty registers exist) goes through the house
    * ln discipline: final estimate rounded to 4 dp absorbs libm ulp
    * divergence. The exact-distinct column audits the estimate per row;
    * `within_bound` pins |err| ≤ 3σ = 3·1.04/√m ≈ 19.5%.
    *
    * Scale shape: the corpus reduces to (source, bucket) max-rank — map
    * side combine to ≤ |sources|·256 cells; densify against a literal
    * 256-row range; everything after is arithmetic on a KB frame. The
    * exact column is the fixture-scale audit (one distinct per source);
    * the sketch's point at 100 TB is mergeable constant state.
    */
  private val HllM = 256

  /** The linear-counting table m·ln(m/v0) for every attainable v0
    * (1..m), precomputed ONCE on the JVM and embedded as identical
    * literals in BOTH engines (r13 ADVICE: comparing JVM `math.log`
    * against DuckDB `ln` relied on 4-dp rounding to absorb libm ulp
    * divergence — a value within an ulp of a 0.00005 boundary could
    * flip the hash-exact oracle across platforms; a shared constant
    * table is engine-independent by construction, since
    * `Double.toString` round-trips and DuckDB's decimal parse is
    * correctly rounded). Index 1-based by v0 on both sides.
    */
  private val HllLinearEst: Seq[Double] =
    (1 to HllM).map(v => HllM.toDouble * math.log(HllM.toDouble / v))

  def distinctHllPortable(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables(spark, dir, "documents")
      .select(col("source"), explode(split(trim(col("text")), " ")).as("w"))
      .where(col("w") =!= "")
    distinctHllCore(spark, toks)
  }

  /** Core over any (source, w) frame — split out so the spec can drive
    * a high-cardinality stream through the raw-estimate branch (the
    * fixture vocabulary sits in the linear-counting regime).
    */
  private[graft] def distinctHllCore(spark: SparkSession,
      toks: DataFrame): DataFrame = {
    val v = conv(substring(md5(col("w")), 1, 8), 16, 10).cast("long")
    val bucket = shiftright(v, 24)
    val w24 = v.bitwiseAND(lit(0xFFFFFFL))
    val rank = when(w24 === 0, lit(25))
      .otherwise(lit(25) - length(bin(w24)))
    val regs = toks
      .select(col("source"), bucket.as("bucket"), rank.as("rank"))
      .groupBy(col("source"), col("bucket"))
      .agg(max(col("rank")).as("mj"))
    val dense = toks.select(col("source")).distinct()
      .crossJoin(spark.range(HllM).select(col("id").as("bucket")))
      .join(regs, Seq("source", "bucket"), "left")
      .select(col("source"), coalesce(col("mj"), lit(0L)).as("mj"))
    val perSource = dense.groupBy(col("source"))
      .agg(sum(pow(lit(2.0), -col("mj"))).as("ind"),
        count(when(col("mj") === 0, 1)).as("v0"))
    val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / HllM)
    val raw = alpha * HllM * HllM / col("ind")
    val est = round(
      when(raw <= 2.5 * HllM && col("v0") > 0,
        element_at(typedLit(HllLinearEst), col("v0").cast("int")))
        .otherwise(raw), 4)
    val exact = toks.groupBy(col("source"))
      .agg(countDistinct(col("w")).as("exact_distinct"))
    perSource.join(exact, Seq("source"))
      .select(col("source"), est.as("hll_estimate"), col("exact_distinct"),
        round(abs(est - col("exact_distinct")) / col("exact_distinct"), 6)
          .as("rel_err"))
      .withColumn("within_bound", col("rel_err") <= lit(3.0 * 1.04) /
        math.sqrt(HllM.toDouble))
  }

  val distinctHllPortableSql: String =
    s"""WITH toks AS (
       |  SELECT source, w FROM (
       |    SELECT source, unnest(string_split(trim(text), ' ')) AS w
       |    FROM documents) WHERE w <> ''
       |), hashed AS (
       |  SELECT source,
       |         CAST(CAST(concat('0x', substr(md5(w), 1, 8)) AS UBIGINT)
       |              AS BIGINT) AS v
       |  FROM toks
       |), regs AS (
       |  SELECT source, v // 16777216 AS bucket,
       |         max(CASE WHEN v % 16777216 = 0 THEN 25
       |                  ELSE 25 - length(bin(v % 16777216)) END) AS mj
       |  FROM hashed GROUP BY 1, 2
       |), dense AS (
       |  SELECT s.source, t.bucket, COALESCE(mj, 0) AS mj
       |  FROM (SELECT DISTINCT source FROM toks) s
       |  CROSS JOIN (SELECT unnest(range($HllM)) AS bucket) t
       |  LEFT JOIN regs ON regs.source = s.source AND regs.bucket = t.bucket
       |), per_source AS (
       |  SELECT source, sum(pow(2.0, -mj)) AS ind,
       |         CAST(count(CASE WHEN mj = 0 THEN 1 END) AS BIGINT) AS v0
       |  FROM dense GROUP BY 1
       |), est AS (
       |  SELECT source, v0, ind,
       |         (0.7213 / (1.0 + 1.079 / $HllM)) * $HllM * $HllM / ind
       |           AS raw
       |  FROM per_source
       |), e2 AS (
       |  SELECT source,
       |         round(CASE WHEN raw <= 2.5 * $HllM AND v0 > 0
       |                    THEN ([${HllLinearEst.mkString(", ")}])[v0]
       |                    ELSE raw END, 4) AS hll_estimate
       |  FROM est
       |), exact AS (
       |  SELECT source, CAST(count(DISTINCT w) AS BIGINT) AS exact_distinct
       |  FROM toks GROUP BY 1
       |)
       |SELECT e2.source, hll_estimate, exact_distinct,
       |       round(abs(hll_estimate - exact_distinct) / exact_distinct, 6)
       |         AS rel_err,
       |       round(abs(hll_estimate - exact_distinct) / exact_distinct, 6)
       |         <= 3.0 * 1.04 / sqrt(CAST($HllM AS DOUBLE)) AS within_bound
       |FROM e2 JOIN exact USING (source)""".stripMargin

  /** Exact two-sample Kolmogorov–Smirnov statistic between the `value`
    * distributions of two event types — the distribution-shift test that
    * complements `stats_drift`'s binned PSI with a bin-free exact D =
    * max |F₁(v) − F₂(v)| over the pooled empirical CDFs (supremum is
    * attained at a sample point, so scanning distinct values is exact).
    *
    * Scale shape — the ECDF needs a global running sum, and the naive
    * form is one unpartitioned `Window.orderBy(value)`: a single-task
    * sort of every distinct value. Instead, the same sharded prefix-sum
    * decomposition as `curate_curriculum`/`agg_pareto`: (1) reduce to
    * per-distinct-value counts (one shuffle, map-side combine); (2)
    * range-bin on deterministic approx-percentile cut points (collected
    * once, metadata-sized, shared as literals); (3) within-bin running
    * sums under a window PARTITIONED by bin; (4) per-bin totals →
    * prefix offsets via a triangular self-join on ≤ numPartitions rows,
    * broadcast back; (5) one max reduce. Every task sorts only its
    * value slab at any corpus size.
    */
  /** Shared two-sample rank machinery: per-distinct-value counts of the
    * two samples with their INCLUSIVE running sums in value order, plus
    * sample totals — the sharded-prefix-sum decomposition described on
    * `statsKs`. Output: (value, c1, c2, cum1, cum2, n1, n2).
    */
  private def pooledCums(spark: SparkSession, dir: String,
      typeA: String, typeB: String): DataFrame = {
    import spark.implicits._
    val parts = spark.sessionState.conf.numShufflePartitions
    val ev = Tables(spark, dir, "events")
      .where($"event_type".isin(typeA, typeB) && $"value".isNotNull)
      .select($"value",
        when($"event_type" === typeA, 1L).otherwise(0L).as("g1"),
        when($"event_type" === typeB, 1L).otherwise(0L).as("g2"))
    val d = ev.groupBy("value").agg(sum("g1").as("c1"), sum("g2").as("c2"))
    val fracs = (1 until parts).map(i => i.toDouble / parts)
    // null cuts = EMPTY input (approx_percentile of zero rows): fall
    // through to a single bin so the op returns empty, not an NPE —
    // the first-batch-of-a-new-pipeline contract (EdgeCaseSpec).
    val cutRow = d.agg(expr(
      s"approx_percentile(value, array(${fracs.mkString(", ")}), 10000)")
      .as("cuts")).head()
    val cutVals: Seq[Double] =
      if (cutRow.isNullAt(0)) Nil else cutRow.getSeq[Double](0)
    val cutArr =
      if (cutVals.isEmpty) array().cast("array<double>")
      else array(cutVals.map(lit): _*)
    // bin = cut points strictly below the value: monotone in value, so
    // within-bin order + lower-bin totals reconstruct the global ECDF.
    // Eager checkpoint: binned feeds THREE consumers (local cums,
    // per-bin totals, grand totals) and would re-run the event scan +
    // distinct reduce per branch; the frame is distinct-VALUE-sized
    // (the fixture's 2-dp grid; any production metric is similarly
    // quantized), so the cut is cheap and caps the corpus passes at
    // the one the distinct reduce already made.
    val binned = d.withColumn("pid",
      size(filter(cutArr, c => c < col("value"))).cast("int"))
      .localCheckpoint()
    val byVal = Window.partitionBy("pid").orderBy("value")
    val local = binned
      .withColumn("l1", sum("c1").over(byVal))
      .withColumn("l2", sum("c2").over(byVal))
    val totals = binned.groupBy("pid")
      .agg(sum("c1").as("t1"), sum("c2").as("t2"))
    val offsets = totals.as("a")
      .join(totals.as("b"), col("b.pid") < col("a.pid"), "left")
      .groupBy(col("a.pid").as("pid"))
      .agg(coalesce(sum(col("b.t1")), lit(0L)).as("o1"),
        coalesce(sum(col("b.t2")), lit(0L)).as("o2"))
    val nn = binned.agg(sum("c1").as("n1"), sum("c2").as("n2"))
    local.join(broadcast(offsets), Seq("pid"))
      .crossJoin(broadcast(nn))
      .select($"value", $"c1", $"c2",
        ($"o1" + $"l1").as("cum1"), ($"o2" + $"l2").as("cum2"),
        $"n1", $"n2")
  }

  def statsKs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    pooledCums(spark, dir, "click", "view")
      .select($"n1", $"n2",
        abs($"cum1".cast("double") / $"n1" -
          $"cum2".cast("double") / $"n2").as("dd"))
      .groupBy("n1", "n2")
      .agg(round(max($"dd"), 6).as("ks_d"))
  }

  /** Mann–Whitney U (Wilcoxon rank-sum) between the same two samples as
    * `statsKs` — the rank test that detects a location shift where KS
    * detects any shape difference. Tie-corrected normal approximation.
    *
    * Exactness across engines: the rank sum is computed in INTEGERS —
    * `2·avgRank = 2·cumBefore + c + 1` per distinct value, so
    * `2·R₁ = Σ c₁·(2·cumBefore + c + 1)` never touches a float, and the
    * accumulation order that makes float sums engine-dependent (the
    * q1_agg DECIMAL lesson) cannot bite. Sums ride DECIMAL(38,0)
    * because at 100 TB `c₁ · 2N` products overflow BIGINT (the PPS
    * overflow lesson, AUDIT_r6); z alone drops to float, by the same
    * literal formula on both sides. Scale shape: `pooledCums`'s sharded
    * prefix sums — no global window.
    */
  def statsMannWhitney(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val dec = "decimal(38,0)"
    pooledCums(spark, dir, "click", "view")
      .select($"n1", $"n2",
        ($"c1".cast(dec) *
          (lit(2) * ($"cum1" + $"cum2" - $"c1" - $"c2") +
            $"c1" + $"c2" + 1).cast(dec)).as("two_r1_term"),
        (($"c1" + $"c2").cast(dec) * ($"c1" + $"c2").cast(dec) *
          ($"c1" + $"c2").cast(dec) - ($"c1" + $"c2").cast(dec))
          .as("tie_term"))
      .groupBy("n1", "n2")
      .agg(sum("two_r1_term").as("two_r1"), sum("tie_term").as("ties"))
      // drop to double only HERE, with the identical expression shape
      // as the SQL twin (decimal division scales differ across engines)
      .select($"n1", $"n2",
        (($"two_r1".cast("double") -
          $"n1".cast("double") * ($"n1" + 1)) / 2.0).as("u1"),
        $"ties")
      .select($"n1", $"n2", $"u1",
        round(($"u1" - $"n1".cast("double") * $"n2" / 2.0) /
          sqrt($"n1".cast("double") * $"n2" / 12.0 *
            (($"n1" + $"n2" + 1).cast("double") -
              $"ties".cast("double") /
                (($"n1" + $"n2").cast("double") *
                  ($"n1" + $"n2" - 1)))), 6).as("z"))
  }

  val statsMannWhitneySql: String =
    """WITH s AS (
      |  SELECT value,
      |         CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS g1,
      |         CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS g2
      |  FROM events
      |  WHERE event_type IN ('click', 'view') AND value IS NOT NULL),
      |d AS (SELECT value, sum(g1) AS c1, sum(g2) AS c2 FROM s GROUP BY value),
      |c AS (SELECT c1, c2,
      |             sum(c1 + c2) OVER (ORDER BY value) AS cum,
      |             sum(c1) OVER () AS n1, sum(c2) OVER () AS n2 FROM d),
      |a AS (SELECT CAST(max(n1) AS BIGINT) AS n1,
      |             CAST(max(n2) AS BIGINT) AS n2,
      |             sum(CAST(c1 AS DECIMAL(38,0)) *
      |                 CAST(2 * (cum - c1 - c2) + c1 + c2 + 1
      |                      AS DECIMAL(38,0))) AS two_r1,
      |             sum(CAST(c1 + c2 AS DECIMAL(38,0)) *
      |                 CAST(c1 + c2 AS DECIMAL(38,0)) *
      |                 CAST(c1 + c2 AS DECIMAL(38,0)) -
      |                 CAST(c1 + c2 AS DECIMAL(38,0))) AS ties
      |      FROM c)
      |SELECT n1, n2,
      |       (CAST(two_r1 AS DOUBLE) - CAST(n1 AS DOUBLE) * (n1 + 1))
      |         / 2.0 AS u1,
      |       round(((CAST(two_r1 AS DOUBLE) - CAST(n1 AS DOUBLE) * (n1 + 1))
      |               / 2.0 - CAST(n1 AS DOUBLE) * n2 / 2.0) /
      |             sqrt(CAST(n1 AS DOUBLE) * n2 / 12.0 *
      |                  (CAST(n1 + n2 + 1 AS DOUBLE) -
      |                   CAST(ties AS DOUBLE) /
      |                     (CAST(n1 + n2 AS DOUBLE) * (n1 + n2 - 1)))),
      |             6) AS z
      |FROM a""".stripMargin

  /** Exact ROC AUC of `value` as a score separating purchases from
    * errors — the eval metric a quality-scorer gate reads. AUC is the
    * Mann–Whitney U normalized by n₁·n₂ (the probability a random
    * positive outscores a random negative, ties at half credit), so it
    * reuses the same INTEGER rank-sum formulation and sharded prefix
    * machinery: no float accumulates before the final ratio.
    */
  def statsAuc(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val dec = "decimal(38,0)"
    pooledCums(spark, dir, "purchase", "error")
      .select($"n1", $"n2",
        ($"c1".cast(dec) *
          (lit(2) * ($"cum1" + $"cum2" - $"c1" - $"c2") +
            $"c1" + $"c2" + 1).cast(dec)).as("two_r1_term"))
      .groupBy("n1", "n2")
      .agg(sum("two_r1_term").as("two_r1"))
      .select($"n1", $"n2",
        round((($"two_r1".cast("double") -
          $"n1".cast("double") * ($"n1" + 1)) / 2.0) /
          ($"n1".cast("double") * $"n2"), 6).as("auc"))
  }

  val statsAucSql: String =
    """WITH s AS (
      |  SELECT value,
      |         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS g1,
      |         CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS g2
      |  FROM events
      |  WHERE event_type IN ('purchase', 'error') AND value IS NOT NULL),
      |d AS (SELECT value, sum(g1) AS c1, sum(g2) AS c2 FROM s GROUP BY value),
      |c AS (SELECT c1, c2,
      |             sum(c1 + c2) OVER (ORDER BY value) AS cum,
      |             sum(c1) OVER () AS n1, sum(c2) OVER () AS n2 FROM d),
      |a AS (SELECT CAST(max(n1) AS BIGINT) AS n1,
      |             CAST(max(n2) AS BIGINT) AS n2,
      |             sum(CAST(c1 AS DECIMAL(38,0)) *
      |                 CAST(2 * (cum - c1 - c2) + c1 + c2 + 1
      |                      AS DECIMAL(38,0))) AS two_r1
      |      FROM c)
      |SELECT n1, n2,
      |       round(((CAST(two_r1 AS DOUBLE) - CAST(n1 AS DOUBLE) * (n1 + 1))
      |               / 2.0) / (CAST(n1 AS DOUBLE) * n2), 6) AS auc
      |FROM a""".stripMargin

  /** Welch's unequal-variance t-test between the same two samples as
    * `stats_ks`/`stats_mannwhitney` — the parametric member of the A/B
    * family (t statistic + Welch–Satterthwaite degrees of freedom).
    *
    * Exactness across engines: sums and sums-of-squares ride DECIMAL
    * (the q1_agg lesson — the 2-dp value grid is exact in decimal,
    * never in binary), so both engines reach the float boundary with
    * IDENTICAL (S, Q, n) triples; means/variances/t/df then drop to
    * double through the same literal expression DAG on both sides.
    * Scale shape: ONE scan reducing to a single row of conditional
    * aggregates — no shuffle beyond the scalar-agg exchange.
    */
  def statsWelch(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables(spark, dir, "events")
      .where($"event_type".isin("click", "view") && $"value".isNotNull)
      .select($"event_type", $"value".cast("decimal(18,2)").as("v"))
    ev.agg(
      sum(when($"event_type" === "click", 1L).otherwise(0L)).as("n1"),
      sum(when($"event_type" === "view", 1L).otherwise(0L)).as("n2"),
      sum(when($"event_type" === "click", $"v")).as("s1"),
      sum(when($"event_type" === "view", $"v")).as("s2"),
      sum(when($"event_type" === "click", $"v" * $"v")).as("q1"),
      sum(when($"event_type" === "view", $"v" * $"v")).as("q2"))
      .select($"n1", $"n2",
        ($"s1".cast("double") / $"n1").as("m1"),
        ($"s2".cast("double") / $"n2").as("m2"),
        (($"q1".cast("double") -
          $"s1".cast("double") * $"s1".cast("double") / $"n1") /
          ($"n1" - 1)).as("v1"),
        (($"q2".cast("double") -
          $"s2".cast("double") * $"s2".cast("double") / $"n2") /
          ($"n2" - 1)).as("v2"))
      .select($"n1", $"n2",
        round($"m1" - $"m2", 6).as("mean_diff"),
        round(($"m1" - $"m2") / sqrt($"v1" / $"n1" + $"v2" / $"n2"), 6)
          .as("t"),
        round(($"v1" / $"n1" + $"v2" / $"n2") *
          ($"v1" / $"n1" + $"v2" / $"n2") /
          (($"v1" / $"n1") * ($"v1" / $"n1") / ($"n1" - 1) +
            ($"v2" / $"n2") * ($"v2" / $"n2") / ($"n2" - 1)), 6).as("df"))
  }

  val statsWelchSql: String =
    """WITH s AS (
      |  SELECT event_type, CAST(value AS DECIMAL(18,2)) AS v
      |  FROM events
      |  WHERE event_type IN ('click', 'view') AND value IS NOT NULL),
      |a AS (
      |  SELECT CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
      |              AS BIGINT) AS n1,
      |         CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
      |              AS BIGINT) AS n2,
      |         sum(CASE WHEN event_type = 'click' THEN v END) AS s1,
      |         sum(CASE WHEN event_type = 'view' THEN v END) AS s2,
      |         sum(CASE WHEN event_type = 'click' THEN v * v END) AS q1,
      |         sum(CASE WHEN event_type = 'view' THEN v * v END) AS q2
      |  FROM s),
      |m AS (
      |  SELECT n1, n2,
      |         CAST(s1 AS DOUBLE) / n1 AS m1,
      |         CAST(s2 AS DOUBLE) / n2 AS m2,
      |         (CAST(q1 AS DOUBLE) -
      |          CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n1) / (n1 - 1)
      |           AS v1,
      |         (CAST(q2 AS DOUBLE) -
      |          CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) / n2) / (n2 - 1)
      |           AS v2
      |  FROM a)
      |SELECT n1, n2,
      |       round(m1 - m2, 6) AS mean_diff,
      |       round((m1 - m2) / sqrt(v1 / n1 + v2 / n2), 6) AS t,
      |       round((v1 / n1 + v2 / n2) * (v1 / n1 + v2 / n2) /
      |             ((v1 / n1) * (v1 / n1) / (n1 - 1) +
      |              (v2 / n2) * (v2 / n2) / (n2 - 1)), 6) AS df
      |FROM m""".stripMargin

  val statsKsSql: String =
    """WITH s AS (
      |  SELECT value,
      |         CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS g1,
      |         CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS g2
      |  FROM events
      |  WHERE event_type IN ('click', 'view') AND value IS NOT NULL),
      |d AS (SELECT value, sum(g1) AS c1, sum(g2) AS c2 FROM s GROUP BY value),
      |c AS (SELECT sum(c1) OVER (ORDER BY value) AS cum1,
      |             sum(c2) OVER (ORDER BY value) AS cum2,
      |             sum(c1) OVER () AS n1, sum(c2) OVER () AS n2 FROM d)
      |SELECT CAST(max(n1) AS BIGINT) AS n1, CAST(max(n2) AS BIGINT) AS n2,
      |       round(max(abs(CAST(cum1 AS DOUBLE) / n1 -
      |                     CAST(cum2 AS DOUBLE) / n2)), 6) AS ks_d
      |FROM c""".stripMargin

  // ------------------------------------------------ Benford first-digit

  /** Benford first-digit audit over order totals — the data-quality /
    * fraud screen: naturally-grown monetary values follow
    * P(d) = log10(1 + 1/d), and a synthetic or tampered feed shows up
    * as excess χ². Reported per digit (observed, expected share,
    * χ² contribution) with the total χ² alongside.
    *
    * Determinism: the first digit comes from the STRING of the exact
    * integer `floor(price·100)` (cents) — a bigint renders identically
    * on both engines, where float log10-of-value digit extraction
    * flaps on power-of-ten boundaries; counts are exact integers and
    * every probability is the same closed-form double on both sides.
    * The 9-row digit spine left-joins the counts so absent digits
    * report 0, and the χ² window runs over NINE rows — bounded by the
    * decimal system, not the data.
    */
  def benford(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val digits = spark.range(1, 10).select($"id".cast("int").as("digit"))
    val obs = Tables(spark, dir, "orders")
      .where($"o_totalprice" > 0)
      .select(substring(
        floor($"o_totalprice" * 100).cast("long").cast("string"), 1, 1)
        .cast("int").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n_obs"))
    val tot = obs.agg(sum("n_obs").as("n"))
    val p = log10(lit(1.0) + lit(1.0) / $"digit".cast("double"))
    val joined = digits.join(obs, Seq("digit"), "left")
      .crossJoin(broadcast(tot))
      .select($"digit", coalesce($"n_obs", lit(0L)).as("n_obs"), $"n",
        p.as("p_benford"))
      .withColumn("contrib",
        pow($"n_obs".cast("double") - $"n".cast("double") * $"p_benford", 2)
          / ($"n".cast("double") * $"p_benford"))
    joined
      .withColumn("chi2", sum($"contrib").over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
      .select($"digit", $"n_obs",
        round($"p_benford", 6).as("p_benford"),
        round($"n_obs".cast("double") / $"n".cast("double"), 6).as("p_obs"),
        round($"contrib", 4).as("contrib"),
        round($"chi2", 4).as("chi2"))
  }

  val benfordSql: String =
    """WITH obs AS (
      |  SELECT CAST(substr(CAST(CAST(floor(o_totalprice * 100) AS BIGINT)
      |           AS VARCHAR), 1, 1) AS INT) AS digit,
      |         CAST(count(*) AS BIGINT) AS n_obs
      |  FROM orders WHERE o_totalprice > 0 GROUP BY 1),
      |tot AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n FROM obs),
      |d AS (SELECT CAST(unnest(generate_series(1, 9)) AS INT) AS digit),
      |j AS (
      |  SELECT d.digit, CAST(COALESCE(obs.n_obs, 0) AS BIGINT) AS n_obs,
      |         n, log10(1.0 + 1.0 / CAST(d.digit AS DOUBLE)) AS p_benford
      |  FROM d LEFT JOIN obs USING (digit) CROSS JOIN tot),
      |c AS (
      |  SELECT digit, n_obs, n, p_benford,
      |         pow(CAST(n_obs AS DOUBLE) - CAST(n AS DOUBLE) * p_benford, 2)
      |           / (CAST(n AS DOUBLE) * p_benford) AS contrib
      |  FROM j)
      |SELECT digit, n_obs,
      |       round(p_benford, 6) AS p_benford,
      |       round(CAST(n_obs AS DOUBLE) / CAST(n AS DOUBLE), 6) AS p_obs,
      |       round(contrib, 4) AS contrib,
      |       round(sum(contrib) OVER (), 4) AS chi2
      |FROM c""".stripMargin

  // ------------------------------------------------- Gini concentration

  /** Gini coefficient of order-value concentration per priority class —
    * the inequality audit (how top-heavy is revenue?) that pairs with
    * `agg_pareto`'s cumulative-share view. Uses the grouped-histogram
    * form of the rank formula: items sharing value v occupy the rank
    * block (C_prev, C_prev + c], so Σ rank·x collapses to
    * v·(c·C_prev + c(c+1)/2) per DISTINCT value —
    * G = 2·S/(n·T) − (n+1)/n.
    *
    * Exactness: values enter as integer CENTS (`floor(price·100)`, the
    * `stats_benford` convention), every moment is a DECIMAL(38,0) sum
    * of integer products (rank sums reach n²·v ≈ 10³⁸ headroom), and G
    * is one fixed double expression over identical scalars. The rank
    * window runs over the per-priority DISTINCT-VALUE histogram — the
    * `events_rfm` order-statistic class, never row-sized.
    */
  def gini(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val hist = Tables(spark, dir, "orders")
      .where($"o_totalprice" > 0)
      .select($"o_orderpriority".as("grp"),
        floor($"o_totalprice" * 100).cast("long").as("v"))
      .groupBy("grp", "v").agg(count(lit(1)).as("c"))
    val w = Window.partitionBy("grp").orderBy($"v".asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    hist
      .withColumn("cprev", coalesce(sum($"c").over(w), lit(0L)))
      .groupBy("grp").agg(
        sum($"c").as("n"),
        sum($"v".cast("decimal(38,0)") * $"c").cast("decimal(38,0)")
          .as("t"),
        sum($"v".cast("decimal(38,0)") *
          ($"c" * $"cprev" + expr("(c * (c + 1)) div 2")))
          .cast("decimal(38,0)").as("s"))
      .select($"grp", $"n",
        round(lit(2.0) * $"s".cast("double") /
          ($"n".cast("double") * $"t".cast("double")) -
          ($"n" + 1).cast("double") / $"n".cast("double"), 6)
          .as("gini"))
      .orderBy("grp")
  }

  val giniSql: String =
    """WITH h AS (
      |  SELECT o_orderpriority AS grp,
      |         CAST(floor(o_totalprice * 100) AS BIGINT) AS v,
      |         CAST(count(*) AS BIGINT) AS c
      |  FROM orders WHERE o_totalprice > 0
      |  GROUP BY 1, 2),
      |cw AS (
      |  SELECT grp, v, c,
      |         CAST(COALESCE(sum(c) OVER (PARTITION BY grp ORDER BY v ASC
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |           AS BIGINT) AS cprev
      |  FROM h),
      |m AS (
      |  SELECT grp, CAST(sum(c) AS BIGINT) AS n,
      |         CAST(sum(CAST(v AS DECIMAL(38,0)) * c) AS DECIMAL(38,0))
      |           AS t,
      |         CAST(sum(CAST(v AS DECIMAL(38,0)) *
      |                  (c * cprev + (c * (c + 1)) // 2))
      |           AS DECIMAL(38,0)) AS s
      |  FROM cw GROUP BY grp)
      |SELECT grp, n,
      |       round(2.0 * CAST(s AS DOUBLE) /
      |             (CAST(n AS DOUBLE) * CAST(t AS DOUBLE)) -
      |             CAST(n + 1 AS DOUBLE) / CAST(n AS DOUBLE), 6) AS gini
      |FROM m ORDER BY grp""".stripMargin

  // -------------------------------------------------- Q–Q comparison

  private val QqGroupA = "1-URGENT"
  private val QqGroupB = "5-LOW"

  /** Decile Q–Q table between two priority classes' order values — the
    * distribution-compare that says WHERE two groups differ, not just
    * whether (`stats_ks` gives the verdict, this gives the shape:
    * tails vs body). Each decile is the inclusive-rank order statistic
    * (smallest value whose cumulative count reaches ⌈p·n⌉, the
    * `events_rfm` machinery) over the per-group distinct-value
    * histogram of integer CENTS, so every quantile is a value that
    * exists in the data and both engines pick it identically.
    * (⌈p·n⌉ is evaluated as the same IEEE expression on both sides —
    * for non-dyadic p that is the parity contract, exactness of the
    * ceiling is not claimed.)
    */
  def qq(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val hist = Tables(spark, dir, "orders")
      .where($"o_totalprice" > 0 &&
        $"o_orderpriority".isin(QqGroupA, QqGroupB))
      .select($"o_orderpriority".as("grp"),
        floor($"o_totalprice" * 100).cast("long").as("v"))
      .groupBy("grp", "v").agg(count(lit(1)).as("c"))
    val w = Window.partitionBy("grp").orderBy($"v".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist.withColumn("cum", sum($"c").over(w))
    val tot = hist.groupBy("grp").agg(sum($"c").as("n"))
    val ps = (1 to 9).map(_ / 10.0)
    val pf = ps.toDF("p")
    val th = cum.join(tot, "grp").crossJoin(broadcast(pf))
      .groupBy("p", "grp")
      .agg(min(when($"cum" >= ceil($"n" * $"p"), $"v")).as("q"))
    th.groupBy("p").pivot("grp", Seq(QqGroupA, QqGroupB))
      .agg(first($"q"))
      .select($"p", col(QqGroupA).as("v_a"), col(QqGroupB).as("v_b"),
        round(col(QqGroupA).cast("double") /
          col(QqGroupB).cast("double"), 6).as("ratio"))
      .orderBy("p")
  }

  val qqSql: String =
    s"""WITH h AS (
       |  SELECT o_orderpriority AS grp,
       |         CAST(floor(o_totalprice * 100) AS BIGINT) AS v,
       |         CAST(count(*) AS BIGINT) AS c
       |  FROM orders
       |  WHERE o_totalprice > 0
       |    AND o_orderpriority IN ('$QqGroupA', '$QqGroupB')
       |  GROUP BY 1, 2),
       |cw AS (
       |  SELECT grp, v, c,
       |         CAST(sum(c) OVER (PARTITION BY grp ORDER BY v ASC
       |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |           AS BIGINT) AS cum
       |  FROM h),
       |tot AS (SELECT grp, CAST(sum(c) AS BIGINT) AS n FROM h GROUP BY grp),
       |pp AS (SELECT CAST(unnest([0.1, 0.2, 0.3, 0.4, 0.5,
       |                           0.6, 0.7, 0.8, 0.9]) AS DOUBLE) AS p),
       |th AS (
       |  SELECT p, grp,
       |         min(CASE WHEN cum >= ceil(n * p) THEN v END) AS q
       |  FROM cw JOIN tot USING (grp) CROSS JOIN pp
       |  GROUP BY p, grp)
       |SELECT a.p, a.q AS v_a, b.q AS v_b,
       |       round(CAST(a.q AS DOUBLE) / CAST(b.q AS DOUBLE), 6) AS ratio
       |FROM th a JOIN th b ON a.p = b.p
       |WHERE a.grp = '$QqGroupA' AND b.grp = '$QqGroupB'
       |ORDER BY a.p""".stripMargin

  // ------------------------------------------------- experiment power

  /** Experiment power planning per event type: given each arm's observed
    * n and variance, (a) the minimum detectable effect (MDE) a two-sample
    * z-test at α=5% / power 80% could resolve TODAY, and (b) the per-arm
    * sample size needed to detect a 5% relative lift of the arm's own
    * mean. The standard pre-experiment sizing readout run before any A/B
    * family op (`events_ab_*`) is trusted.
    *
    * `2.801585` = z₀.₉₇₅ + z₀.₈₀ (1.959964 + 0.841621) — a fixed literal
    * on both engines, so no normal-CDF evaluation is needed anywhere.
    * Moments accumulate as DECIMAL sums of DECIMAL(18,2) casts (the
    * `stats_welch` discipline); mean/var/MDE are one fixed double
    * expression over identical exact scalars. One shuffle on event_type,
    * map-side partials; the result is |event types| rows.
    */
  def statsPower(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir, "events")
      .where($"value".isNotNull)
      .select($"event_type", $"value".cast("decimal(18,2)").as("v"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), sum($"v").as("sx"),
        sum($"v" * $"v").as("sxx"))
      .select($"event_type", $"n",
        ($"sx".cast("double") / $"n").as("mean"),
        (($"sxx".cast("double") -
          $"sx".cast("double") * $"sx".cast("double") / $"n") /
          ($"n" - 1)).as("variance"))
      .select($"event_type", $"n",
        round($"mean", 6).as("mean_value"),
        round(sqrt($"variance"), 6).as("sd_value"),
        round(lit(2.801585) * sqrt(lit(2.0) * $"variance" / $"n"), 6)
          .as("mde_abs"),
        ceil(lit(2.801585) * lit(2.801585) * lit(2.0) * $"variance" /
          (lit(0.05) * $"mean" * (lit(0.05) * $"mean")))
          .cast("long").as("n_per_arm_5pct"))
  }

  val statsPowerSql: String =
    """WITH a AS (
      |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |         sum(CAST(value AS DECIMAL(18,2))) AS sx,
      |         sum(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2)))
      |           AS sxx
      |  FROM events WHERE value IS NOT NULL GROUP BY event_type),
      |m AS (
      |  SELECT event_type, n,
      |         CAST(sx AS DOUBLE) / n AS mean,
      |         (CAST(sxx AS DOUBLE) -
      |          CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n) / (n - 1)
      |           AS variance
      |  FROM a)
      |SELECT event_type, n,
      |       round(mean, 6) AS mean_value,
      |       round(sqrt(variance), 6) AS sd_value,
      |       round(2.801585 * sqrt(2.0 * variance / n), 6) AS mde_abs,
      |       CAST(ceil(2.801585 * 2.801585 * 2.0 * variance /
      |                 (0.05 * mean * (0.05 * mean))) AS BIGINT)
      |         AS n_per_arm_5pct
      |FROM m""".stripMargin

  // ---------------------------------------------- categorical entropy

  /** Shannon-entropy report over the pipeline's categorical columns —
    * the balance diagnostic read before any stratified
    * sampling/mixture decision (a source column with near-zero
    * normalized entropy means one source dominates and per-source
    * weighting is load-bearing). For each column: row count, distinct
    * count, entropy in nats via H = ln(n) − (Σ c·ln c)/n, and entropy
    * normalized by its ln(k) maximum.
    *
    * Determinism: c·ln(c) is an identical double per category on both
    * engines; each term is cast to DECIMAL(30,10) and summed EXACTLY,
    * so the one float-sensitive step (summation order) is removed — the
    * decimal-moments recipe applied to transcendental terms. Each
    * column costs one map-side-combined reduce to |categories| rows;
    * the union output is 3 rows.
    */
  def statsEntropy(spark: SparkSession, dir: String): DataFrame = {
    def entropyOf(table: String, column: String): DataFrame =
      Tables(spark, dir, table)
        .groupBy(col(column).as("v")).agg(count(lit(1)).as("c"))
        .agg(count(lit(1)).as("k"),
          sum(col("c")).as("n"),
          sum((col("c").cast("double") * log(col("c").cast("double")))
            .cast("decimal(30,10)")).as("sclnc"))
        .select(lit(s"$table.$column").as("entity"),
          col("n"), col("k").as("n_distinct"),
          round(log(col("n").cast("double")) -
            col("sclnc").cast("double") / col("n"), 6).as("entropy"),
          when(col("k") > 1,
            round((log(col("n").cast("double")) -
              col("sclnc").cast("double") / col("n")) /
              log(col("k").cast("double")), 6))
            .otherwise(lit(0.0)).as("norm_entropy"))
    entropyOf("events", "event_type")
      .unionAll(entropyOf("documents", "lang"))
      .unionAll(entropyOf("documents", "source"))
  }

  val statsEntropySql: String = {
    def one(table: String, column: String): String =
      s"""SELECT '$table.$column' AS entity, n, n_distinct,
         |       round(ln(CAST(n AS DOUBLE)) -
         |             CAST(sclnc AS DOUBLE) / n, 6) AS entropy,
         |       CASE WHEN n_distinct > 1 THEN
         |         round((ln(CAST(n AS DOUBLE)) -
         |                CAST(sclnc AS DOUBLE) / n) /
         |               ln(CAST(n_distinct AS DOUBLE)), 6)
         |       ELSE 0.0 END AS norm_entropy
         |FROM (
         |  SELECT CAST(count(*) AS BIGINT) AS n_distinct,
         |         CAST(sum(c) AS BIGINT) AS n,
         |         CAST(sum(CAST(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))
         |                       AS DECIMAL(30,10))) AS DECIMAL(38,10))
         |           AS sclnc
         |  FROM (SELECT $column AS v, count(*) AS c
         |        FROM $table GROUP BY 1))""".stripMargin
    s"${one("events", "event_type")}\nUNION ALL\n" +
      s"${one("documents", "lang")}\nUNION ALL\n" +
      s"${one("documents", "source")}"
  }

  // ---------------------------------------------- mutual information

  /** Mutual information between categorical column pairs — the
    * association measure in information units that χ² significance
    * can't give: MI(X;Y) quantifies how many nats knowing one column
    * reveals about the other (feature-selection and leakage screening
    * both read this). For each pair: n, MI in nats, the two marginal
    * entropies, and MI normalized by min(Hx, Hy) (1 = one column
    * determines the other, 0 = independent).
    *
    * Identities that keep everything on the cell frame: with cell
    * counts c, marginals cx/cy and total n,
    * MI = (Σ c·ln(c·n/(cx·cy)))/n and Σ_x cx·ln cx = Σ_cells c·ln cx —
    * so ONE |X|·|Y|-cell aggregate feeds MI and both entropies. Each
    * transcendental term is a fixed double expression cast to
    * DECIMAL(30,10) and summed exactly (the `statsEntropy` recipe), so
    * summation order — the only float-sensitive step — is removed.
    * Scale: one map-side-combined reduce to the cell frame, windows
    * over cells only, 2-row output.
    */
  private[graft] def miOf(df: DataFrame, xc: Column, yc: Column,
      entity: String): DataFrame = {
      val cells = df.groupBy(xc.as("x"), yc.as("y"))
        .agg(count(lit(1)).as("c"))
      val t = cells
        .withColumn("cx", sum(col("c")).over(Window.partitionBy(col("x"))))
        .withColumn("cy", sum(col("c")).over(Window.partitionBy(col("y"))))
        .withColumn("n", sum(col("c")).over(Window.partitionBy()))
        .withColumn("term",
          (col("c").cast("double") *
            log(col("c").cast("double") * col("n").cast("double") /
              (col("cx").cast("double") * col("cy").cast("double"))))
            .cast("decimal(30,10)"))
        .withColumn("xln",
          (col("c").cast("double") * log(col("cx").cast("double")))
            .cast("decimal(30,10)"))
        .withColumn("yln",
          (col("c").cast("double") * log(col("cy").cast("double")))
            .cast("decimal(30,10)"))
      val a = t.agg(max(col("n")).as("n"), sum(col("term")).as("sterm"),
        sum(col("xln")).as("sxln"), sum(col("yln")).as("syln"))
      val nD = col("n").cast("double")
      val hx = log(nD) - col("sxln").cast("double") / nD
      val hy = log(nD) - col("syln").cast("double") / nD
      val mi = col("sterm").cast("double") / nD
      a.select(lit(entity).as("entity"), col("n"),
        round(mi, 6).as("mi_nats"),
        round(hx, 6).as("h_x"), round(hy, 6).as("h_y"),
        when(least(hx, hy) > 0, round(mi / least(hx, hy), 6))
          .otherwise(lit(0.0)).as("norm_mi"))
    }
  def mutualInfo(spark: SparkSession, dir: String): DataFrame =
    miOf(Tables(spark, dir, "documents"), col("lang"), col("source"),
      "documents.lang*source")
      .unionAll(miOf(Tables(spark, dir, "events"), col("event_type"),
        dayofweek(col("ts")), "events.type*dow"))

  val mutualInfoSql: String = {
    def one(table: String, x: String, y: String, entity: String): String =
      s"""SELECT '$entity' AS entity, n,
         |       round(CAST(sterm AS DOUBLE) / n, 6) AS mi_nats,
         |       round(ln(CAST(n AS DOUBLE)) -
         |             CAST(sxln AS DOUBLE) / n, 6) AS h_x,
         |       round(ln(CAST(n AS DOUBLE)) -
         |             CAST(syln AS DOUBLE) / n, 6) AS h_y,
         |       CASE WHEN least(ln(CAST(n AS DOUBLE)) -
         |                         CAST(sxln AS DOUBLE) / n,
         |                       ln(CAST(n AS DOUBLE)) -
         |                         CAST(syln AS DOUBLE) / n) > 0
         |         THEN round((CAST(sterm AS DOUBLE) / n) /
         |                    least(ln(CAST(n AS DOUBLE)) -
         |                            CAST(sxln AS DOUBLE) / n,
         |                          ln(CAST(n AS DOUBLE)) -
         |                            CAST(syln AS DOUBLE) / n), 6)
         |         ELSE 0.0 END AS norm_mi
         |FROM (
         |  SELECT CAST(max(n) AS BIGINT) AS n,
         |         sum(term) AS sterm, sum(xln) AS sxln, sum(yln) AS syln
         |  FROM (
         |    SELECT c, n,
         |           CAST(CAST(c AS DOUBLE) *
         |                ln(CAST(c AS DOUBLE) * CAST(n AS DOUBLE) /
         |                   (CAST(cx AS DOUBLE) * CAST(cy AS DOUBLE)))
         |                AS DECIMAL(30,10)) AS term,
         |           CAST(CAST(c AS DOUBLE) * ln(CAST(cx AS DOUBLE))
         |                AS DECIMAL(30,10)) AS xln,
         |           CAST(CAST(c AS DOUBLE) * ln(CAST(cy AS DOUBLE))
         |                AS DECIMAL(30,10)) AS yln
         |    FROM (
         |      SELECT c,
         |             CAST(sum(c) OVER (PARTITION BY x) AS BIGINT) AS cx,
         |             CAST(sum(c) OVER (PARTITION BY y) AS BIGINT) AS cy,
         |             CAST(sum(c) OVER () AS BIGINT) AS n
         |      FROM (SELECT $x AS x, $y AS y, count(*) AS c
         |            FROM $table GROUP BY 1, 2))))""".stripMargin
    one("documents", "lang", "source", "documents.lang*source") +
      "\nUNION ALL\n" +
      one("events", "event_type", "dayofweek(ts) + 1", "events.type*dow")
  }

  // ------------------------------------------- Jensen-Shannon drift

  /** Jensen-Shannon divergence between the event-type mix of the
    * corpus's EARLY and LATE halves (split at the exact microsecond
    * midpoint of the observed time range) — the bounded, symmetric
    * drift measure the PSI/KS family lacks: JSD ∈ [0, ln 2] always,
    * even for categories present on only one side (where KL is
    * infinite). JSD = ½·KL(P‖M) + ½·KL(Q‖M), M = (P+Q)/2.
    *
    * Determinism: the split point is integer microseconds
    * ((t0+t1) div 2 — exact); each category's two KL terms are fixed
    * double expressions on exact integer counts, cast DECIMAL(30,10),
    * summed exactly, halved once at the boundary; bits via the literal
    * ln 2 (no engine-evaluated ln(2)). One-sided categories contribute
    * only their present-side term (the 0·ln 0 = 0 convention).
    * Scale: one reduce to |types| rows; the 1-row bound frame
    * broadcasts — no second corpus pass, no sort.
    */
  def jsDivergence(spark: SparkSession, dir: String): DataFrame = {
    val Ln2 = 0.6931471805599453
    val e = Tables(spark, dir, "events")
      // ts is TIMESTAMP_NTZ; the session TZ is pinned UTC, so the cast
      // is instant-preserving and unix_micros == DuckDB's epoch_us
      .select(col("event_type"),
        expr("unix_micros(cast(ts as timestamp))").as("us"))
    val bounds = e.agg(min(col("us")).as("t0"), max(col("us")).as("t1"))
      .select(expr("(t0 + t1) div 2").as("mid"))
    val cells = e.crossJoin(broadcast(bounds))
      .groupBy(col("event_type"))
      .agg(sum(when(col("us") <= col("mid"), 1L).otherwise(0L)).as("a"),
        sum(when(col("us") > col("mid"), 1L).otherwise(0L)).as("b"))
    val t = cells
      .withColumn("na", sum(col("a")).over(Window.partitionBy()))
      .withColumn("nb", sum(col("b")).over(Window.partitionBy()))
    val p = col("a").cast("double") / col("na").cast("double")
    val q = col("b").cast("double") / col("nb").cast("double")
    val m = (p + q) / 2
    val terms = t
      .withColumn("tp",
        when(col("a") > 0, (p * log(p / m)).cast("decimal(30,10)"))
          .otherwise(lit(0).cast("decimal(30,10)")))
      .withColumn("tq",
        when(col("b") > 0, (q * log(q / m)).cast("decimal(30,10)"))
          .otherwise(lit(0).cast("decimal(30,10)")))
    terms.agg(max(col("na")).as("n_early"), max(col("nb")).as("n_late"),
      count(lit(1)).as("n_types"),
      round((sum(col("tp")) + sum(col("tq"))).cast("double") / 2, 6)
        .as("jsd_nats"))
      .withColumn("jsd_bits", round(col("jsd_nats") / Ln2, 6))
  }

  val jsDivergenceSql: String =
    """WITH e AS (
      |  SELECT event_type, epoch_us(ts) AS us FROM events
      |), mid AS (
      |  SELECT (min(us) + max(us)) // 2 AS mid FROM e
      |), cells AS (
      |  SELECT event_type,
      |         CAST(sum(CASE WHEN us <= mid THEN 1 ELSE 0 END) AS BIGINT)
      |           AS a,
      |         CAST(sum(CASE WHEN us > mid THEN 1 ELSE 0 END) AS BIGINT)
      |           AS b
      |  FROM e CROSS JOIN mid GROUP BY 1
      |), t AS (
      |  SELECT *,
      |         CAST(sum(a) OVER () AS BIGINT) AS na,
      |         CAST(sum(b) OVER () AS BIGINT) AS nb
      |  FROM cells
      |), terms AS (
      |  SELECT na, nb,
      |         CASE WHEN a > 0 THEN
      |           CAST((CAST(a AS DOUBLE) / CAST(na AS DOUBLE)) *
      |                ln((CAST(a AS DOUBLE) / CAST(na AS DOUBLE)) /
      |                   ((CAST(a AS DOUBLE) / CAST(na AS DOUBLE) +
      |                     CAST(b AS DOUBLE) / CAST(nb AS DOUBLE)) / 2))
      |                AS DECIMAL(30,10))
      |         ELSE CAST(0 AS DECIMAL(30,10)) END AS tp,
      |         CASE WHEN b > 0 THEN
      |           CAST((CAST(b AS DOUBLE) / CAST(nb AS DOUBLE)) *
      |                ln((CAST(b AS DOUBLE) / CAST(nb AS DOUBLE)) /
      |                   ((CAST(a AS DOUBLE) / CAST(na AS DOUBLE) +
      |                     CAST(b AS DOUBLE) / CAST(nb AS DOUBLE)) / 2))
      |                AS DECIMAL(30,10))
      |         ELSE CAST(0 AS DECIMAL(30,10)) END AS tq
      |  FROM t
      |)
      |SELECT max(na) AS n_early, max(nb) AS n_late,
      |       count(*) AS n_types,
      |       round(CAST(sum(tp) + sum(tq) AS DOUBLE) / 2, 6) AS jsd_nats,
      |       round(round(CAST(sum(tp) + sum(tq) AS DOUBLE) / 2, 6) /
      |             0.6931471805599453, 6) AS jsd_bits
      |FROM terms""".stripMargin

  // ------------------------------------------------- one-way ANOVA

  /** One-way ANOVA F test: does mean `value` differ across event
    * types? The k-group generalization of `stats_welch` (which only
    * compares two): between/within sum-of-squares decomposition, F
    * statistic, and η² effect size (share of variance explained by
    * the grouping).
    *
    * Determinism: per-group moments are EXACT decimal sums on the 2-dp
    * value grid (the `stats_summary` recipe); each group's SSW/SSB
    * contribution is one fixed double expression on those exact
    * moments, rounded to 6 dp and summed as DECIMAL(28,6) — the χ²
    * recipe, order-independent by construction. Scale: one map-side-
    * combined reduce to |types| rows, then scalar arithmetic.
    */
  def anova(spark: SparkSession, dir: String): DataFrame = {
    val g = Tables(spark, dir, "events").where(col("value").isNotNull)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("ng"),
        sum(col("value").cast("decimal(18,2)")).as("sx"),
        sum(col("value").cast("decimal(18,2)") *
          col("value").cast("decimal(18,2)")).as("sxx"))
    val t = g.select(col("ng"), col("sx"),
      round(col("sxx").cast("double") -
        col("sx").cast("double") * col("sx").cast("double") /
          col("ng").cast("double"), 6).cast("decimal(28,6)").as("sswg"),
      round(col("sx").cast("double") * col("sx").cast("double") /
        col("ng").cast("double"), 6).cast("decimal(28,6)").as("ssbg"))
    val a = t.agg(count(lit(1)).as("k"), sum(col("ng")).as("n"),
      sum(col("sx")).as("gsx"), sum(col("sswg")).as("ssw"),
      sum(col("ssbg")).as("ssbsum"))
    val ssb = round(col("ssbsum").cast("double") -
      col("gsx").cast("double") * col("gsx").cast("double") /
        col("n").cast("double"), 6)
    val ssw = col("ssw").cast("double")
    a.select(col("k"), col("n"), ssb.as("ss_between"),
      round(ssw, 6).as("ss_within"),
      round((ssb / (col("k") - 1).cast("double")) /
        (ssw / (col("n") - col("k")).cast("double")), 6).as("f_stat"),
      round(ssb / (ssb + ssw), 6).as("eta_sq"))
  }

  val anovaSql: String =
    """WITH g AS (
      |  SELECT event_type, CAST(count(*) AS BIGINT) AS ng,
      |         sum(CAST(value AS DECIMAL(18,2))) AS sx,
      |         sum(CAST(value AS DECIMAL(18,2)) *
      |             CAST(value AS DECIMAL(18,2))) AS sxx
      |  FROM events WHERE value IS NOT NULL GROUP BY 1
      |), t AS (
      |  SELECT ng, sx,
      |         CAST(round(CAST(sxx AS DOUBLE) -
      |                    CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) /
      |                      CAST(ng AS DOUBLE), 6) AS DECIMAL(28,6))
      |           AS sswg,
      |         CAST(round(CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) /
      |                      CAST(ng AS DOUBLE), 6) AS DECIMAL(28,6))
      |           AS ssbg
      |  FROM g
      |), a AS (
      |  SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(ng) AS BIGINT) AS n,
      |         sum(sx) AS gsx, sum(sswg) AS ssw, sum(ssbg) AS ssbsum
      |  FROM t
      |)
      |SELECT k, n,
      |       round(CAST(ssbsum AS DOUBLE) -
      |             CAST(gsx AS DOUBLE) * CAST(gsx AS DOUBLE) /
      |               CAST(n AS DOUBLE), 6) AS ss_between,
      |       round(CAST(ssw AS DOUBLE), 6) AS ss_within,
      |       round((round(CAST(ssbsum AS DOUBLE) -
      |                    CAST(gsx AS DOUBLE) * CAST(gsx AS DOUBLE) /
      |                      CAST(n AS DOUBLE), 6) /
      |              CAST(k - 1 AS DOUBLE)) /
      |             (CAST(ssw AS DOUBLE) / CAST(n - k AS DOUBLE)), 6)
      |         AS f_stat,
      |       round(round(CAST(ssbsum AS DOUBLE) -
      |                   CAST(gsx AS DOUBLE) * CAST(gsx AS DOUBLE) /
      |                     CAST(n AS DOUBLE), 6) /
      |             (round(CAST(ssbsum AS DOUBLE) -
      |                    CAST(gsx AS DOUBLE) * CAST(gsx AS DOUBLE) /
      |                      CAST(n AS DOUBLE), 6) +
      |              CAST(ssw AS DOUBLE)), 6) AS eta_sq
      |FROM a""".stripMargin

  // ------------------------------------------- daily autocorrelation

  /** Lag-1..7 autocorrelation of the daily event-count series — the
    * "is there a weekly cycle" diagnostic that complements
    * `stats_seasonal` (hour-of-day) and `stats_trend` (linear drift):
    * a lag-7 peak is the weekly rhythm, lag-1 persistence is burst
    * clumping. ACF over the day-ordered observed series, overall-mean
    * convention.
    *
    * Determinism: every sum feeding r_k is an exact BIGINT (Σy, Σy²,
    * Σy_t·y_{t-k} and the two one-sided sums), and the final r_k is
    * generated from ONE shared expression template (`acfExprSql`) fed
    * verbatim to BOTH engines — parity by construction, not by
    * mirroring. Scale: the corpus reduces to |days| rows before the
    * single ordered window; everything after is fixed-size.
    */
  private val AcfMaxLag = 7

  private def acfExprSql(k: Int): String =
    s"""round((CAST(p$k AS DOUBLE) -
       |        CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) *
       |          (CAST(a$k AS DOUBLE) + CAST(b$k AS DOUBLE)) +
       |        CAST(n$k AS DOUBLE) *
       |          (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) *
       |          (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))) /
       |       (CAST(sxx AS DOUBLE) -
       |        CAST(n AS DOUBLE) *
       |          (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) *
       |          (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))), 6)""".stripMargin

  def autocorr(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables(spark, dir, "events")
      .groupBy(to_date(col("ts")).as("d")).agg(count(lit(1)).as("y"))
    val w = Window.orderBy(col("d"))
    val lagged = daily.select(
      col("y") +: (1 to AcfMaxLag).map(k =>
        lag(col("y"), k).over(w).as(s"l$k")): _*)
    val aggs = Seq(count(lit(1)).as("n"), sum(col("y")).as("s1"),
      sum(col("y") * col("y")).as("sxx")) ++
      (1 to AcfMaxLag).flatMap(k => Seq(
        sum(when(col(s"l$k").isNotNull, col("y") * col(s"l$k"))
          .otherwise(0L)).as(s"p$k"),
        sum(when(col(s"l$k").isNotNull, col("y")).otherwise(0L))
          .as(s"a$k"),
        sum(when(col(s"l$k").isNotNull, col(s"l$k")).otherwise(0L))
          .as(s"b$k"),
        sum(when(col(s"l$k").isNotNull, 1L).otherwise(0L)).as(s"n$k")))
    val one = lagged.agg(aggs.head, aggs.tail: _*)
    (1 to AcfMaxLag).map(k =>
      one.selectExpr(s"$k AS lag", s"n$k AS n_pairs",
        s"${acfExprSql(k)} AS acf"))
      .reduce(_ unionAll _)
  }

  val autocorrSql: String = {
    val conds = (1 to AcfMaxLag).flatMap(k => Seq(
      s"CAST(sum(CASE WHEN l$k IS NOT NULL THEN y * l$k ELSE 0 END) AS BIGINT) AS p$k",
      s"CAST(sum(CASE WHEN l$k IS NOT NULL THEN y ELSE 0 END) AS BIGINT) AS a$k",
      s"CAST(sum(CASE WHEN l$k IS NOT NULL THEN l$k ELSE 0 END) AS BIGINT) AS b$k",
      s"CAST(sum(CASE WHEN l$k IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n$k"))
      .mkString(",\n         ")
    val lags = (1 to AcfMaxLag)
      .map(k => s"lag(y, $k) OVER (ORDER BY d) AS l$k").mkString(",\n         ")
    val rows = (1 to AcfMaxLag).map(k =>
      s"SELECT $k AS lag, n$k AS n_pairs, ${acfExprSql(k)} AS acf FROM one")
      .mkString("\nUNION ALL\n")
    s"""WITH daily AS (
       |  SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS y
       |  FROM events GROUP BY 1
       |), lagged AS (
       |  SELECT y,
       |         $lags
       |  FROM daily
       |), one AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n,
       |         CAST(sum(y) AS BIGINT) AS s1,
       |         CAST(sum(y * y) AS BIGINT) AS sxx,
       |         $conds
       |  FROM lagged
       |)
       |$rows""".stripMargin
  }

  // ------------------------------------------- capture-recapture

  /** Capture-recapture corpus-coverage estimate (Chapman's
    * bias-corrected Lincoln-Petersen): treat two independent crawl
    * passes as capture samples; the overlap rate estimates how much of
    * the underlying population BOTH passes missed —
    * N̂ = (n₁+1)(n₂+1)/(m+1) − 1. The "how big is the web we're
    * sampling" question every crawl-budget decision starts from,
    * answerable without ever seeing the uncrawled part.
    *
    * The fixture simulates the two passes as independent deterministic
    * md5 samples of the document space (salted keys, ~30% each — the
    * `sampleHash` convention), so the estimator's input marginals are
    * exact integers and N̂ is one fixed double expression. err_frac
    * audits the estimate against the fixture's KNOWN population — the
    * column a real crawl cannot have, which is exactly why the fixture
    * should pin it. Scale: one scan, one reduce, 1-row output.
    */
  def captureRecapture(spark: SparkSession, dir: String): DataFrame = {
    val inA = substring(md5(concat(col("doc_id").cast("string"),
      lit(":a"))), 1, 2) < "4d"
    val inB = substring(md5(concat(col("doc_id").cast("string"),
      lit(":b"))), 1, 2) < "4d"
    val a = Tables(spark, dir, "documents").agg(
      count(lit(1)).as("n_true"),
      sum(when(inA, 1L).otherwise(0L)).as("n_crawl_a"),
      sum(when(inB, 1L).otherwise(0L)).as("n_crawl_b"),
      sum(when(inA && inB, 1L).otherwise(0L)).as("n_overlap"))
    val nhat = round((col("n_crawl_a") + 1).cast("double") *
      (col("n_crawl_b") + 1).cast("double") /
      (col("n_overlap") + 1).cast("double") - 1.0, 6)
    a.select(col("n_true"), col("n_crawl_a"), col("n_crawl_b"),
      col("n_overlap"), nhat.as("n_hat"),
      round((nhat - col("n_true").cast("double")) /
        col("n_true").cast("double"), 6).as("err_frac"))
  }

  val captureRecaptureSql: String =
    """WITH t AS (
      |  SELECT count(*) AS n_true,
      |         CAST(sum(CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)
      |                                    || ':a'), 1, 2) < '4d'
      |                       THEN 1 ELSE 0 END) AS BIGINT) AS n_crawl_a,
      |         CAST(sum(CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)
      |                                    || ':b'), 1, 2) < '4d'
      |                       THEN 1 ELSE 0 END) AS BIGINT) AS n_crawl_b,
      |         CAST(sum(CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)
      |                                    || ':a'), 1, 2) < '4d'
      |                        AND substr(md5(CAST(doc_id AS VARCHAR)
      |                                    || ':b'), 1, 2) < '4d'
      |                       THEN 1 ELSE 0 END) AS BIGINT) AS n_overlap
      |  FROM documents
      |)
      |SELECT n_true, n_crawl_a, n_crawl_b, n_overlap,
      |       round(CAST(n_crawl_a + 1 AS DOUBLE) *
      |             CAST(n_crawl_b + 1 AS DOUBLE) /
      |             CAST(n_overlap + 1 AS DOUBLE) - 1.0, 6) AS n_hat,
      |       round((round(CAST(n_crawl_a + 1 AS DOUBLE) *
      |                    CAST(n_crawl_b + 1 AS DOUBLE) /
      |                    CAST(n_overlap + 1 AS DOUBLE) - 1.0, 6) -
      |              CAST(n_true AS DOUBLE)) / CAST(n_true AS DOUBLE), 6)
      |         AS err_frac
      |FROM t""".stripMargin

  // ------------------------------------------------- Ljung-Box test

  /** Ljung-Box portmanteau test over the lag-1..7 daily ACF — the
    * one-number answer to "is the event series white noise, or does it
    * carry structure worth modeling": Q = n(n+2)·Σ r²ₖ/(n−k), compared
    * against the χ²₀.₉₅(7) critical value (literal constant, no CDF
    * evaluation). Composes `autocorr` — n−k is exactly that frame's
    * n_pairs column, so the whole test is one aggregate over 7 rows.
    * Determinism: r_k are the autocorr op's 6-dp-rounded doubles; each
    * r²ₖ/n_pairs term is cast DECIMAL(30,10) and summed exactly.
    */
  private val Chi2Crit95Df7 = 14.067140

  def ljungBox(spark: SparkSession, dir: String): DataFrame = {
    val a = autocorr(spark, dir)
      .withColumn("n", col("n_pairs") + col("lag"))
    val agg = a.agg(max(col("n")).as("n_days"),
      count(lit(1)).as("h"),
      sum((col("acf") * col("acf") / col("n_pairs").cast("double"))
        .cast("decimal(30,10)")).as("sterm"))
    agg.select(col("n_days"), col("h"),
      round(col("n_days").cast("double") *
        (col("n_days") + 2).cast("double") *
        col("sterm").cast("double"), 6).as("q_stat"),
      lit(Chi2Crit95Df7).as("chi2_crit_95"),
      (round(col("n_days").cast("double") *
        (col("n_days") + 2).cast("double") *
        col("sterm").cast("double"), 6) > Chi2Crit95Df7)
        .as("white_noise_rejected"))
  }

  val ljungBoxSql: String =
    s"""WITH acf AS (
       |${autocorrSql}
       |), agg AS (
       |  SELECT CAST(max(n_pairs + lag) AS BIGINT) AS n_days,
       |         CAST(count(*) AS BIGINT) AS h,
       |         sum(CAST(acf * acf / CAST(n_pairs AS DOUBLE)
       |                  AS DECIMAL(30,10))) AS sterm
       |  FROM acf
       |)
       |SELECT n_days, h,
       |       round(CAST(n_days AS DOUBLE) * CAST(n_days + 2 AS DOUBLE) *
       |             CAST(sterm AS DOUBLE), 6) AS q_stat,
       |       CAST($Chi2Crit95Df7 AS DOUBLE) AS chi2_crit_95,
       |       round(CAST(n_days AS DOUBLE) * CAST(n_days + 2 AS DOUBLE) *
       |             CAST(sterm AS DOUBLE), 6) > $Chi2Crit95Df7
       |         AS white_noise_rejected
       |FROM agg""".stripMargin

  // ---------------------------------------------------------------------
  // Poisson bootstrap
  // ---------------------------------------------------------------------

  private final val BootB = 32

  /** floor(2¹⁶ · CDF_Poisson(1)(k)) for k = 0..6 — computed ONCE here
    * and rendered as integer literals into BOTH expression trees (the
    * HLL-literal move), so the mechanism is engine-independent by
    * construction; the tail past 6 collapses to count 7 (P ≈ 9·10⁻⁵ at
    * 16-bit granularity). Draws are 16-bit so one md5 yields EIGHT of
    * them — the whole 32-resample row cost is 4 hashes, not 32
    * (measured 11.7 → 5.1 s at sf1).
    */
  private val BootThresholds: IndexedSeq[Long] = {
    var p = math.exp(-1.0)
    var cdf = 0.0
    (0 to 6).map { k =>
      if (k > 0) p = p / k
      cdf += p
      math.floor(cdf * (1L << 16)).toLong
    }
  }

  /** Fixed-width lowercase hex compares ORDER-PRESERVINGLY as a plain
    * string, so the 16-bit draw never needs a hex→long conversion:
    * both engines CASE the raw 4-char md5 substring against these
    * zero-padded literal thresholds (32 `conv`/`CAST` calls per row
    * gone from the hot scan; same determinism argument — the compared
    * bytes are identical either way).
    */
  private val BootHexThresholds: IndexedSeq[String] =
    BootThresholds.map("%04x".format(_))

  private def bootCountCol(d: Column): Column = {
    var c = when(d < BootHexThresholds(0), 0L)
    for (k <- 1 to 6) c = c.when(d < BootHexThresholds(k), k.toLong)
    c.otherwise(7L)
  }

  private def bootCountSql(d: String): String = {
    val whens = (0 to 6).map(k =>
      s"WHEN $d < '${BootHexThresholds(k)}' THEN $k").mkString(" ")
    s"(CASE $whens ELSE 7 END)"
  }

  /** Poisson-bootstrap confidence interval for the per-type mean of
    * `events.value` — THE bootstrap that works on a cluster: instead
    * of materializing B resamples of n rows (impossible at 100 TB),
    * each row independently contributes a Poisson(1) count to every
    * resample (Chamandy et al.'s "Estimating Uncertainty for Massive
    * Data Streams" / the Google Poisson-bootstrap construction), so
    * the whole thing is ONE corpus scan producing 2·B map-side-combined
    * partial sums per group — no explosion, no shuffle growth with B.
    *
    * Determinism: values quantize to BIGINT micro-units at the leaf
    * (the sums that cross the shuffle are order-free integers; at
    * true 100 TB scale the integer sums would move to DECIMAL(38)
    * headroom), the per-(row, resample) Poisson draw is the house
    * md5 convention against literal CDF thresholds, and each resample
    * mean is one double division of two exact integers — bit-identical
    * cross-engine, so even the sorted order statistics match exactly.
    * An empty resample degrades to the GROUP mean explicitly (never a
    * NULL, whose sort placement is engine-dependent).
    * CI = [2nd, 31st] of the 32 sorted resample means (~94% coverage).
    */
  def bootstrapCi(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables(spark, dir, "events")
      .where(col("value").isNotNull)
      .select(Seq(col("event_type"),
        floor(col("value") * lit(1000000.0) + lit(0.5)).as("v_micro")) ++
        (0 until BootB / 8).map(g => md5(concat(lit(s"boot:$g:"),
          col("event_id").cast("string"))).as(s"h$g")): _*)
    val headAgg = count(lit(1)).as("n")
    val tailAggs: Seq[Column] = sum(col("v_micro")).as("sv") +:
      (0 until BootB).flatMap { b =>
        val d = substring(col(s"h${b / 8}"), 1 + 4 * (b % 8), 4)
        val c = bootCountCol(d)
        Seq(sum(c * col("v_micro")).as(s"s$b"), sum(c).as(s"c$b"))
      }
    val g = base.groupBy(col("event_type")).agg(headAgg, tailAggs: _*)
    // empty resample (P ≈ e^-n per resample, real for tiny groups):
    // pin it to the GROUP mean explicitly — a NULL mean's sort
    // placement differs across engines (Spark array_sort: NULLs last;
    // DuckDB list_sort: default null order), so the order statistics
    // below must never see one.
    val means = array_sort(array((0 until BootB).map(b =>
      coalesce(
        col(s"s$b").cast("double") / nullif(col(s"c$b"), lit(0L)).cast("double"),
        col("sv").cast("double") / col("n").cast("double"))): _*))
    g.select(col("event_type"), col("n"),
      (col("sv").cast("double") / col("n").cast("double")).as("mean_micro"),
      element_at(means, 2).as("boot_lo_micro"),
      element_at(means, BootB - 1).as("boot_hi_micro"))
      .withColumn("ci_contains_mean",
        col("boot_lo_micro") <= col("mean_micro") &&
          col("mean_micro") <= col("boot_hi_micro"))
  }

  val bootstrapCiSql: String = {
    val hashes = (0 until BootB / 8).map(g =>
      s"md5('boot:$g:' || CAST(event_id AS VARCHAR)) AS h$g").mkString(",\n         ")
    val draws = (0 until BootB).map { b =>
      val d = s"substr(h${b / 8}, ${1 + 4 * (b % 8)}, 4)"
      val c = bootCountSql(d)
      s"""         CAST(sum($c * v_micro) AS BIGINT) AS s$b,
         |         CAST(sum($c) AS BIGINT) AS c$b""".stripMargin
    }.mkString(",\n")
    val means = (0 until BootB).map(b =>
      s"coalesce(CAST(s$b AS DOUBLE) / CAST(nullif(c$b, 0) AS DOUBLE), " +
        "CAST(sv AS DOUBLE) / CAST(n AS DOUBLE))").mkString(", ")
    s"""WITH base AS (
       |  SELECT event_type,
       |         CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS v_micro,
       |         $hashes
       |  FROM events WHERE value IS NOT NULL
       |), g AS (
       |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       |         CAST(sum(v_micro) AS BIGINT) AS sv,
       |$draws
       |  FROM base GROUP BY event_type
       |), m AS (
       |  SELECT event_type, n,
       |         CAST(sv AS DOUBLE) / CAST(n AS DOUBLE) AS mean_micro,
       |         list_sort([$means])[2] AS boot_lo_micro,
       |         list_sort([$means])[${BootB - 1}] AS boot_hi_micro
       |  FROM g
       |)
       |SELECT event_type, n, mean_micro, boot_lo_micro, boot_hi_micro,
       |       (boot_lo_micro <= mean_micro AND mean_micro <= boot_hi_micro)
       |         AS ci_contains_mean
       |FROM m""".stripMargin
  }

  /** Theil–Sen robust trend per event type — the slope estimator that
    * shrugs off outlier days (least squares, `stats_trend`, moves with
    * every anomaly; the MEDIAN of pairwise slopes has a 29% breakdown
    * point). The corpus reduces to one integer point per (type, day)
    * — count per epoch-day — so the pairwise stage is days², bounded
    * by the calendar, never by event volume. Every slope is one double
    * division of two exact integers (bit-identical cross-engine), the
    * median is explicit order statistics (avg of the two middle ranks;
    * equal-value ties can't change the picked VALUE), and the
    * intercept is the median of per-point residuals against the
    * chosen slope.
    */
  def theilSen(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables(spark, dir, "events")
      .groupBy(col("event_type"),
        datediff(to_date(col("ts")), lit("1970-01-01")).cast("long").as("x"))
      .agg(count(lit(1)).as("y"))
      .localCheckpoint()
    val a = daily.select(col("event_type"), col("x").as("x1"), col("y").as("y1"))
    val b = daily.select(col("event_type"), col("x").as("x2"), col("y").as("y2"))
    val slopes = a.join(b, Seq("event_type"))
      .where(col("x2") > col("x1"))
      .select(col("event_type"),
        ((col("y2") - col("y1")).cast("double") /
          (col("x2") - col("x1")).cast("double")).as("slope"))
    def median(df: DataFrame, v: String, out: String): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("event_type")).orderBy(col(v).asc)
      df.withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(
          Window.partitionBy(col("event_type"))))
        .where(col("rn") === expr("(n + 1) div 2") ||
          col("rn") === expr("n div 2 + 1"))
        .groupBy(col("event_type"))
        .agg((sum(col(v)) / count(lit(1))).as(out), max(col("n")).as(s"_n_$out"))
    }
    val m = median(slopes, "slope", "slope_med")
    val resid = daily.join(m.select(col("event_type"), col("slope_med")),
      Seq("event_type"))
      .select(col("event_type"),
        (col("y").cast("double") - col("slope_med") *
          col("x").cast("double")).as("resid"))
    val i = median(resid, "resid", "intercept_med")
    daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"))
      .join(m.select(col("event_type"), col("slope_med"),
        col("_n_slope_med").as("n_pairs")), Seq("event_type"))
      .join(i.select(col("event_type"), col("intercept_med")), Seq("event_type"))
      .select(col("event_type"), col("n_days"), col("n_pairs"),
        round(col("slope_med"), 6).as("slope_med"),
        round(col("intercept_med"), 6).as("intercept_med"))
  }

  val theilSenSql: String =
    """WITH daily AS (
      |  SELECT event_type,
      |         CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
      |           AS BIGINT) AS x,
      |         CAST(count(*) AS BIGINT) AS y
      |  FROM events GROUP BY 1, 2
      |), slopes AS (
      |  SELECT a.event_type,
      |         CAST(b.y - a.y AS DOUBLE) / CAST(b.x - a.x AS DOUBLE) AS slope
      |  FROM daily a JOIN daily b USING (event_type)
      |  WHERE b.x > a.x
      |), sm AS (
      |  SELECT event_type, sum(slope) / count(*) AS slope_med,
      |         CAST(max(n) AS BIGINT) AS n_pairs
      |  FROM (SELECT event_type, slope,
      |               row_number() OVER (PARTITION BY event_type
      |                                  ORDER BY slope ASC) AS rn,
      |               count(*) OVER (PARTITION BY event_type) AS n
      |        FROM slopes)
      |  WHERE rn = (n + 1) // 2 OR rn = n // 2 + 1
      |  GROUP BY event_type
      |), resid AS (
      |  SELECT d.event_type,
      |         CAST(d.y AS DOUBLE) - sm.slope_med * CAST(d.x AS DOUBLE) AS resid
      |  FROM daily d JOIN sm USING (event_type)
      |), im AS (
      |  SELECT event_type, sum(resid) / count(*) AS intercept_med
      |  FROM (SELECT event_type, resid,
      |               row_number() OVER (PARTITION BY event_type
      |                                  ORDER BY resid ASC) AS rn,
      |               count(*) OVER (PARTITION BY event_type) AS n
      |        FROM resid)
      |  WHERE rn = (n + 1) // 2 OR rn = n // 2 + 1
      |  GROUP BY event_type
      |)
      |SELECT event_type,
      |       (SELECT CAST(count(*) AS BIGINT) FROM daily d
      |        WHERE d.event_type = sm.event_type) AS n_days,
      |       n_pairs, round(slope_med, 6) AS slope_med,
      |       round(intercept_med, 6) AS intercept_med
      |FROM sm JOIN im USING (event_type)""".stripMargin

  /** Kendall τ-b rank correlation between the daily click and view
    * series — the rank-based dependence measure that complements
    * `stats_theil_sen`'s robust slope (τ asks "do the two series move
    * together", invariant to any monotone transform; Pearson answers a
    * different, scale-bound question). The corpus reduces to one
    * integer point per day (click count, view count on the shared
    * distinct-day spine, zero-filled), so the pairwise stage is days²
    * — calendar-bounded like Theil–Sen's, never event-volume-bound.
    * Concordant/discordant/tie pair counts are exact integers; τ-b =
    * (C − D) / √((n0 − n1)(n0 − n2)) with the standard tie corrections
    * (n1 = x-tied pairs, n2 = y-tied pairs) is ONE double expression
    * of six exact integers at the boundary — bit-identical
    * cross-engine, rounded to 6 dp on both sides.
    */
  def kendall(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
      .where(col("event_type").isin("click", "view"))
    val daily = ev.groupBy(
        datediff(to_date(col("ts")), lit("1970-01-01")).cast("long").as("d"))
      .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("x"),
        sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("y"))
      .localCheckpoint()
    val a = daily.select(col("d").as("d1"), col("x").as("x1"), col("y").as("y1"))
    val b = daily.select(col("d").as("d2"), col("x").as("x2"), col("y").as("y2"))
    val pairs = a.join(b, col("d2") > col("d1"))
      .select(
        (signum(col("x2") - col("x1")) * signum(col("y2") - col("y1")))
          .cast("long").as("cd"),
        (col("x1") === col("x2")).cast("long").as("tx"),
        (col("y1") === col("y2")).cast("long").as("ty"))
    pairs.agg(
        count(lit(1)).as("n0"),
        sum(when(col("cd") === 1L, 1L).otherwise(0L)).as("concordant"),
        sum(when(col("cd") === -1L, 1L).otherwise(0L)).as("discordant"),
        sum(col("tx")).as("n1"), sum(col("ty")).as("n2"))
      .crossJoin(broadcast(daily.agg(count(lit(1)).as("n_days"))))
      .select(col("n_days"), col("n0"), col("concordant"), col("discordant"),
        // nullif zero-guard (the xi/bootstrap discipline): an all-tied x
        // or y series makes the denominator 0, where Spark's Divide
        // returns NULL but DuckDB's ieee default returns NaN/Inf —
        // nullif on BOTH engines pins the degenerate case to NULL.
        round((col("concordant") - col("discordant")).cast("double") /
          nullif(sqrt((col("n0") - col("n1")).cast("double") *
            (col("n0") - col("n2")).cast("double")), lit(0.0)), 6).as("tau_b"))
  }

  val kendallSql: String =
    """WITH daily AS (
      |  SELECT CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
      |           AS BIGINT) AS d,
      |         CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
      |           AS BIGINT) AS x,
      |         CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
      |           AS BIGINT) AS y
      |  FROM events WHERE event_type IN ('click', 'view') GROUP BY 1
      |), pairs AS (
      |  SELECT CAST(sign(b.x - a.x) * sign(b.y - a.y) AS BIGINT) AS cd,
      |         CAST(a.x = b.x AS BIGINT) AS tx,
      |         CAST(a.y = b.y AS BIGINT) AS ty
      |  FROM daily a JOIN daily b ON b.d > a.d
      |), agg AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n0,
      |         CAST(sum(CASE WHEN cd = 1 THEN 1 ELSE 0 END) AS BIGINT)
      |           AS concordant,
      |         CAST(sum(CASE WHEN cd = -1 THEN 1 ELSE 0 END) AS BIGINT)
      |           AS discordant,
      |         CAST(sum(tx) AS BIGINT) AS n1, CAST(sum(ty) AS BIGINT) AS n2
      |  FROM pairs
      |)
      |SELECT (SELECT CAST(count(*) AS BIGINT) FROM daily) AS n_days,
      |       n0, concordant, discordant,
      |       round(CAST(concordant - discordant AS DOUBLE) /
      |             nullif(sqrt(CAST(n0 - n1 AS DOUBLE)
      |                         * CAST(n0 - n2 AS DOUBLE)), 0),
      |             6) AS tau_b
      |FROM agg""".stripMargin

  /** Chatterjee's ξ rank coefficient (JASA 2021) between the daily
    * view series (x) and click series (y) — the modern dependence
    * measure that, unlike Kendall/Pearson, detects NON-MONOTONE
    * functional dependence (y = f(x) for oscillating f still scores
    * near 1) and is exactly 0 in expectation under independence. The
    * general tie-corrected form: order the day points by (x, day) —
    * the deterministic tie-break variant, identical on both engines —
    * with r_i = #{j : y_j ≤ y_i}, l_i = #{j : y_j ≥ y_i};
    * ξ = 1 − n·Σ|r_{i+1} − r_i| / (2·Σ l_i(n − l_i)). Numerator and
    * denominator are exact integers (rank counts via self-joins on the
    * days-bounded frame — the Theil–Sen calendar economics); the final
    * ratio is one double division, rounded to 6 dp. An all-tied y
    * degrades to a NULL ξ (denominator 0), never a division error.
    */
  def xiCorrelation(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables(spark, dir, "events")
      .where(col("event_type").isin("click", "view"))
      .groupBy(datediff(to_date(col("ts")), lit("1970-01-01"))
        .cast("long").as("d"))
      .agg(sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("x"),
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("y"))
      .localCheckpoint()
    val b = daily.select(col("d").as("bd"), col("y").as("by"))
    val ranked = daily
      .join(b, col("by") <= col("y"))
      .groupBy(col("d"), col("x"), col("y")).agg(count(lit(1)).as("r"))
      .join(daily.select(col("d"), col("y")).as("o")
          .join(b, col("by") >= col("y"))
          .groupBy(col("d")).agg(count(lit(1)).as("l")), Seq("d"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("x").asc, col("d").asc)
    val nT = daily.agg(count(lit(1)).as("nt"))
    val jumps = ranked
      .withColumn("r_next", lead(col("r"), 1).over(w))
      .crossJoin(broadcast(nT))
      .agg(count(lit(1)).as("n_days"),
        sum(abs(col("r_next") - col("r"))).as("rank_jumps"),
        sum(col("l") * (col("nt") - col("l"))).as("denom"))
    jumps.select(col("n_days"), col("rank_jumps"), col("denom"),
      round(lit(1.0) - col("n_days").cast("double") *
        col("rank_jumps").cast("double") /
        (lit(2.0) * nullif(col("denom"), lit(0L)).cast("double")), 6)
        .as("xi"))
  }

  val xiCorrelationSql: String =
    """WITH daily AS (
      |  SELECT CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
      |           AS BIGINT) AS d,
      |         CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
      |           AS BIGINT) AS x,
      |         CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
      |           AS BIGINT) AS y
      |  FROM events WHERE event_type IN ('click', 'view') GROUP BY 1
      |), ranked AS (
      |  SELECT a.d, a.x, a.y,
      |         (SELECT CAST(count(*) AS BIGINT) FROM daily b
      |          WHERE b.y <= a.y) AS r,
      |         (SELECT CAST(count(*) AS BIGINT) FROM daily b
      |          WHERE b.y >= a.y) AS l
      |  FROM daily a
      |), jumps AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_days,
      |         CAST(sum(abs(r_next - r)) AS BIGINT) AS rank_jumps,
      |         CAST(sum(l * ((SELECT count(*) FROM daily) - l)) AS BIGINT)
      |           AS denom
      |  FROM (SELECT r, l,
      |               lead(r, 1) OVER (ORDER BY x ASC, d ASC) AS r_next
      |        FROM ranked)
      |)
      |SELECT n_days, rank_jumps, denom,
      |       round(1.0 - CAST(n_days AS DOUBLE) * CAST(rank_jumps AS DOUBLE)
      |             / (2.0 * CAST(nullif(denom, 0) AS DOUBLE)), 6) AS xi
      |FROM jumps""".stripMargin

  val ops: Seq[Op] = Seq(
    Op("stats_xi_correlation", xiCorrelation _, Some(xiCorrelationSql)),
    Op("stats_kendall", kendall _, Some(kendallSql)),
    Op("stats_theil_sen", theilSen _, Some(theilSenSql)),
    Op("stats_bootstrap_ci", bootstrapCi _, Some(bootstrapCiSql)),
    Op("stats_ljung_box", ljungBox _, Some(ljungBoxSql)),
    Op("stats_capture_recapture", captureRecapture _,
      Some(captureRecaptureSql)),
    Op("stats_anova", anova _, Some(anovaSql)),
    Op("stats_autocorr", autocorr _, Some(autocorrSql)),
    Op("stats_mutual_info", mutualInfo _, Some(mutualInfoSql)),
    Op("stats_js_divergence", jsDivergence _, Some(jsDivergenceSql)),
    Op("stats_entropy", statsEntropy _, Some(statsEntropySql)),
    Op("stats_power", statsPower _, Some(statsPowerSql)),
    Op("stats_qq", qq _, Some(qqSql)),
    Op("stats_gini", gini _, Some(giniSql)),
    Op("stats_benford", benford _, Some(benfordSql)),
    Op("stats_ks", statsKs _, Some(statsKsSql)),
    Op("stats_mannwhitney", statsMannWhitney _, Some(statsMannWhitneySql)),
    Op("stats_auc", statsAuc _, Some(statsAucSql)),
    Op("stats_welch", statsWelch _, Some(statsWelchSql)),
    Op("q2_corr_subquery", corrSubquery _, Some(corrSubquerySql)),
    Op("agg_quantile_sketch", quantileSketch _, None),
    Op("agg_quantile_sketch_check", quantileSketchCheck _,
      Some(quantileSketchCheckSql)),
    Op("agg_heavy_hitters_cms", heavyHittersCms _, Some(heavyHittersCmsSql)),
    Op("agg_distinct_hll_portable", distinctHllPortable _,
      Some(distinctHllPortableSql)),
    Op("stats_skew_report", skewReport _, Some(skewReportSql)),
    Op("dq_checks", dqChecks _, Some(dqChecksSql)),
    Op("agg_pareto", aggPareto _, Some(aggParetoSql)),
    Op("stats_trend", statsTrend _, Some(statsTrendSql)),
    Op("stats_chisq", statsChisq _, Some(statsChisqSql)),
    Op("stats_corr", statsCorr _, Some(statsCorrSql)),
    Op("agg_grouping_sets", aggGroupingSets _, Some(aggGroupingSetsSql)),
    Op("stats_drift", statsDrift _, Some(statsDriftSql)),
    Op("reshape_unpivot", unpivotMetrics _, Some(unpivotMetricsSql)),
    Op("scalar_funcs", scalarFuncs _, Some(scalarFuncsSql)),
    Op("agg_approx", aggApprox _, None),
    Op("agg_approx_check", aggApproxCheck _, Some(aggApproxCheckSql)),
    Op("agg_rollup", aggRollup _, Some(aggRollupSql)),
    Op("agg_cube", aggCube _, Some(aggCubeSql)),
    Op("agg_percentiles", aggPercentiles _, Some(aggPercentilesSql)),
    Op("events_pivot", eventsPivot _, Some(eventsPivotSql)),
    Op("events_asof", eventsAsof _, Some(eventsAsofSql)),
    Op("sample_hash", sampleHash _, Some(sampleHashSql)),
    Op("stats_summary", statsSummary _, Some(statsSummarySql)),
  )
}
