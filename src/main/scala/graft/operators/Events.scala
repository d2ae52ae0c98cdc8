package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Op, Tables}

/** Event-stream analytics over the `events` fixture, batch-expressed
  * (SURVEY.md §2.7 — the reference is batch-only; these are the north-star
  * windowed extensions). The streaming twins live in
  * `graft.streaming.EventStream` (same logic on readStream + watermark);
  * batch is what the DuckDB oracle can check.
  */
object Events {

  /** Tumbling-window aggregate: events per (hour, type) with value sums.
    * Batch via date_trunc — identical bucketing to Structured Streaming's
    * `window($"ts", "1 hour")` (both floor to the epoch-aligned hour).
    * One shuffle on (hour, type); partial aggregation does the heavy
    * lifting map-side, so cardinality after shuffle is tiny even at 100 TB.
    */
  def hourly(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .groupBy(
        // date_trunc returns an instant-typed timestamp even for NTZ
        // input; cast back so the output stays naive like the oracle's.
        date_trunc("HOUR", col("ts"))
          .cast(org.apache.spark.sql.types.TimestampNTZType).as("hour_start"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        // exact decimal sum, DOUBLE at the boundary: decimal outputs
        // render scale-dependently across readers and break hash compare
        sum(col("value").cast("decimal(18,4)")).cast("double").as("total_value"))

  val hourlySql: String =
    """SELECT date_trunc('hour', ts) AS hour_start, event_type,
      |       count(*) AS n_events,
      |       count(DISTINCT user_id) AS n_users,
      |       CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
      |FROM events GROUP BY 1, 2""".stripMargin

  /** Incremental hourly rollup — the closed-partition ETL pattern, the
    * way a 100 TB event warehouse actually maintains this table: hours
    * BEFORE a boundary are aggregated once and persisted (the
    * content-addressed SnapshotStore, the `graph_components_incremental`
    * discipline); each run aggregates only the OPEN tail and unions.
    * EXACT including the distinct-user counts, because the split is an
    * HOUR boundary and the group key contains the hour — no group ever
    * straddles the history/batch line, so per-side aggregation IS the
    * global aggregation (this is precisely why warehouses close
    * partitions on the grouping grain; a mid-group split would break
    * countDistinct additivity). The entry shares `hourlySql` VERBATIM,
    * so the driver proves bit-equality with the full recompute.
    * Fixture boundary: the hour containing the time-range midpoint
    * (integer-microsecond arithmetic, both-engine exact).
    */
  def hourlyIncremental(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir, "events")
    val mid = e.agg(expr(
      """cast(date_trunc('HOUR', timestamp_micros(
        |  (unix_micros(cast(min(ts) as timestamp)) +
        |   unix_micros(cast(max(ts) as timestamp))) div 2))
        |as timestamp_ntz)""".stripMargin).as("mid_hour"))
    def agg(df: DataFrame): DataFrame = df
      .groupBy(date_trunc("HOUR", col("ts"))
        .cast(org.apache.spark.sql.types.TimestampNTZType).as("hour_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        sum(col("value").cast("decimal(18,4)")).cast("double")
          .as("total_value"))
    val tagged = e.crossJoin(broadcast(mid))
    val (store, ts) = graft.sources.SnapshotStore
      .contentAddressed(spark, s"$dir/events.parquet", "graft_hourlystore")
    if (!store.hasTableSnapshot("hourly_closed", ts))
      store.writeTableSnapshot(
        agg(tagged.where(col("ts") < col("mid_hour"))), "hourly_closed", ts)
    val closed = store.readTableSnapshot(spark, "hourly_closed", ts)
      .select(col("hour_start"), col("event_type"), col("n_events"),
        col("n_users"), col("total_value"))
    closed.unionByName(agg(tagged.where(col("ts") >= col("mid_hour"))))
  }

  /** Gap-based sessionization: a session breaks after >30 min of per-user
    * inactivity. lag + conditional cumulative sum — the standard batch
    * formulation; the streaming twin is flatMapGroupsWithState with a
    * session timeout. Ordering carries an event_id tiebreak so equal
    * timestamps don't make session numbering nondeterministic.
    * Scale: single shuffle on user_id; per-user data sorted within
    * partitions — no driver involvement, skew bounded by per-user volume.
    */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val gapSec = unix_timestamp(col("ts")) - unix_timestamp(lag(col("ts"), 1).over(byUser))
    val isNew = when(gapSec.isNull.or(gapSec > 1800), 1).otherwise(0)
    ev.withColumn("session_seq",
        sum(isNew).over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("session_value"))
  }

  val sessionizeSql: String =
    """WITH g AS (
      |  SELECT user_id, ts, event_id, value,
      |         CASE WHEN lag(ts) OVER w IS NULL
      |                OR date_diff('second', lag(ts) OVER w, ts) > 1800
      |              THEN 1 ELSE 0 END AS is_new
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
      |), s AS (
      |  SELECT user_id, ts, value,
      |         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
      |                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
      |  FROM g
      |)
      |SELECT user_id, session_seq,
      |       count(*) AS n_events,
      |       min(ts) AS session_start,
      |       max(ts) AS session_end,
      |       CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS session_value
      |FROM s GROUP BY user_id, session_seq""".stripMargin

  /** JSON-column extraction (the `props` column holds JSON objects):
    * get_json_object parity with DuckDB's json_extract. Pushed into the
    * scan's projected columns; no shuffle.
    */
  def jsonExtract(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("prop_k"))
      .where(col("event_id") < 1000)

  val jsonExtractSql: String =
    """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS prop_k
      |FROM events WHERE event_id < 1000""".stripMargin

  /** Interval join — view→click attribution within a 4-hour window, the
    * batch twin of `EventStream.viewClickJoin`. Written as the DECLARATIVE
    * range join (`user equality AND c_ts ∈ [v_ts, v_ts + 4h)`); the
    * `RangeJoinBanding` optimizer rule (injected by `GraftExtensions`)
    * rewrites it into the banded equi-join — build side replicated into
    * exactly two bands, band joined in as an extra hash key, the exact
    * predicate pruning band false positives — so the physical plan is
    * hash-partitioned and AQE-eligible with per-task work bounded by
    * per-(user, 4h) density. Without the rule the query is still correct
    * (equi-join on user with the range as a post-join filter), just not
    * banded; `RangeJoinRuleSpec` pins the `__graft_band` key in this
    * operator's physical plan.
    */
  private val WindowSec = 14400 // 4 hours; also the band width

  def intervalJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
    val views = ev.where(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id"), col("ts").as("v_ts"))
    val clicks = ev.where(col("event_type") === "click")
      .select(col("event_id").as("click_id"),
        col("user_id").as("c_user"), col("ts").as("c_ts"))
    views.join(clicks,
        col("user_id") === col("c_user") &&
          col("c_ts") >= col("v_ts") &&
          col("c_ts") < col("v_ts") + expr(s"INTERVAL $WindowSec SECONDS"))
      .select(col("view_id"), col("click_id"), col("user_id"),
        (unix_timestamp(col("c_ts")) - unix_timestamp(col("v_ts"))).as("gap_sec"))
  }

  val intervalJoinSql: String =
    s"""SELECT v.event_id AS view_id, c.event_id AS click_id, v.user_id,
       |       date_diff('second', v.ts, c.ts) AS gap_sec
       |FROM events v JOIN events c
       |  ON v.user_id = c.user_id
       | AND v.event_type = 'view' AND c.event_type = 'click'
       | AND c.ts >= v.ts AND c.ts < v.ts + INTERVAL $WindowSec SECONDS""".stripMargin

  /** Per-group outlier flagging (|z| > 3) — the anomaly-filter step of a
    * data pipeline. The moments come from EXACT decimal sums (sum and
    * sum-of-squares commute, so accumulation order can't perturb them —
    * the same decimal-at-the-core / double-at-the-boundary discipline as
    * every other oracled aggregate), and mean/std/z are then a fixed
    * sequence of single IEEE double ops, identical in any engine. Shape:
    * one map-side-combined aggregation to ~|event types| rows, broadcast
    * back over a second scan — no corpus-sized shuffle at any scale.
    */
  def outliers(spark: SparkSession, dir: String): DataFrame = {
    val dec = col("value").cast("decimal(18,4)")
    val stats = Tables(spark, dir, "events")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(dec).cast("double").as("s"),
        sum(dec * dec).cast("double").as("qq"))
      .select(col("event_type"), col("n"), col("qq"),
        (col("s") / col("n")).as("mean"))
      .select(col("event_type"), col("mean"),
        sqrt(col("qq") / col("n") - col("mean") * col("mean")).as("std"))
    Tables(spark, dir, "events")
      .join(broadcast(stats), Seq("event_type"))
      .where(abs(col("value") - col("mean")) > col("std") * 3)
      .select(col("event_id"), col("event_type"), col("value"),
        round((col("value") - col("mean")) / col("std"), 6).as("z"))
  }

  val outliersSql: String =
    """WITH st AS (
      |  SELECT event_type, count(*) AS n,
      |         CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS s,
      |         CAST(sum(CAST(value AS DECIMAL(18,4)) * CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS qq
      |  FROM events GROUP BY event_type
      |), m AS (
      |  SELECT event_type, mean, sqrt(qq / n - mean * mean) AS std
      |  FROM (SELECT event_type, n, qq, s / n AS mean FROM st)
      |)
      |SELECT e.event_id, e.event_type, e.value,
      |       round((e.value - m.mean) / m.std, 6) AS z
      |FROM events e JOIN m USING (event_type)
      |WHERE abs(e.value - m.mean) > m.std * 3""".stripMargin

  /** Ordered conversion funnel view → click → purchase: a user advances a
    * stage only with an event STRICTLY AFTER their previous stage's first
    * event (first view, then first click after that view, then first
    * purchase after that click). Each stage is one filtered scan reduced
    * to a per-user frame, joined to the previous stage's per-user frame
    * on user_id — type filters push to the scan, every shuffle carries
    * user-level rows, and the final stage counts are 3 rows. The closing
    * lag window runs over those 3 rows, not the data.
    */
  def funnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
    val view = ev.where(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("v_ts"))
    val click = ev.where(col("event_type") === "click")
      .join(view, Seq("user_id"))
      .where(col("ts") > col("v_ts"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("c_ts"))
    val buy = ev.where(col("event_type") === "purchase")
      .join(click, Seq("user_id"))
      .where(col("ts") > col("c_ts"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("p_ts"))
    def stage(no: Int, name: String, df: DataFrame) =
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(no).cast("long").as("stage_no"), lit(name).as("stage"),
          col("n_users"))
    val stages = stage(1, "view", view)
      .unionAll(stage(2, "click", click))
      .unionAll(stage(3, "purchase", buy))
    stages.withColumn("pct_prev",
      coalesce(
        round(col("n_users").cast("double") /
          lag(col("n_users"), 1).over(Window.orderBy(col("stage_no"))), 6),
        lit(1.0)))
  }

  val funnelSql: String =
    """WITH v AS (
      |  SELECT user_id, min(ts) AS v_ts FROM events
      |  WHERE event_type = 'view' GROUP BY user_id
      |), c AS (
      |  SELECT e.user_id, min(e.ts) AS c_ts
      |  FROM events e JOIN v ON e.user_id = v.user_id
      |  WHERE e.event_type = 'click' AND e.ts > v.v_ts GROUP BY e.user_id
      |), p AS (
      |  SELECT e.user_id, min(e.ts) AS p_ts
      |  FROM events e JOIN c ON e.user_id = c.user_id
      |  WHERE e.event_type = 'purchase' AND e.ts > c.c_ts GROUP BY e.user_id
      |), s AS (
      |  SELECT CAST(1 AS BIGINT) AS stage_no, 'view' AS stage, count(*) AS n_users FROM v
      |  UNION ALL
      |  SELECT CAST(2 AS BIGINT), 'click', count(*) FROM c
      |  UNION ALL
      |  SELECT CAST(3 AS BIGINT), 'purchase', count(*) FROM p
      |)
      |SELECT stage_no, stage, n_users,
      |       coalesce(round(CAST(n_users AS DOUBLE) /
      |                      lag(n_users) OVER (ORDER BY stage_no), 6), 1.0)
      |         AS pct_prev
      |FROM s""".stripMargin

  /** Event-type transition matrix (the Markov-chain view of user
    * behavior): consecutive event pairs per user via lead(), counted per
    * (from, to). One shuffle on user_id for the window, then a shuffle of
    * the ~|types|² reduced frame — per-user skew is the only bound, same
    * as sessionize.
    */
  def transitions(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    Tables(spark, dir, "events")
      .select(col("user_id"), col("event_type").as("from_type"),
        lead(col("event_type"), 1).over(byUser).as("to_type"))
      .where(col("to_type").isNotNull)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n_transitions"),
        countDistinct(col("user_id")).as("n_users"))
  }

  val transitionsSql: String =
    """WITH t AS (
      |  SELECT user_id, event_type AS from_type,
      |         lead(event_type) OVER (PARTITION BY user_id
      |                                ORDER BY ts ASC, event_id ASC) AS to_type
      |  FROM events
      |)
      |SELECT from_type, to_type, count(*) AS n_transitions,
      |       count(DISTINCT user_id) AS n_users
      |FROM t WHERE to_type IS NOT NULL
      |GROUP BY from_type, to_type""".stripMargin

  /** Cohort retention: users grouped by first-seen day, counted on each
    * later active day as (cohort_day, day_offset) — the classic retention
    * triangle. Both aggregations key on user_id (one shuffle, reused),
    * the distinct day set is per-user-bounded, and the final frame is
    * |days|² rows at most. No event-level data crosses the second
    * shuffle.
    */
  def retention(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
    val cohort = ev.groupBy(col("user_id"))
      .agg(min(col("ts").cast("date")).as("cohort_day"))
    val active = ev.select(col("user_id"), col("ts").cast("date").as("day"))
      .distinct()
    active.join(cohort, Seq("user_id"))
      .groupBy(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).cast("long").as("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
  }

  val retentionSql: String =
    """WITH c AS (
      |  SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
      |  FROM events GROUP BY user_id
      |), a AS (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
      |)
      |SELECT c.cohort_day,
      |       date_diff('day', c.cohort_day, a.day) AS day_offset,
      |       count(DISTINCT a.user_id) AS n_users
      |FROM a JOIN c ON a.user_id = c.user_id
      |GROUP BY 1, 2""".stripMargin

  // --------------------------------------------- robust outliers (MAD)
  /** Exact per-type continuous quantile over an (event_type, v, cnt)
    * value histogram — `Curation.qualityGate`'s interpolation
    * arithmetic, partitioned by type. The windows and the rollup run
    * over the REDUCED histogram frame, never the events. */
  private def histQuantile(hist: DataFrame, q: Double): DataFrame = {
    val byType = Window.partitionBy(col("event_type"))
    val cumW = byType.orderBy(col("v").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist
      .withColumn("cum", sum(col("cnt")).over(cumW))
      .withColumn("n", sum(col("cnt")).over(byType))
      .withColumn("p", lit(1.0) + (col("n") - 1).cast("double") * q)
      .groupBy(col("event_type"))
      .agg(max(col("p")).as("p"),
        min(when(col("cum") >= floor(col("p")), col("v"))).as("lo"),
        min(when(col("cum") >= ceil(col("p")), col("v"))).as("hi"))
      .select(col("event_type"),
        (col("lo") + (col("hi") - col("lo")) *
          (col("p") - floor(col("p")))).as("qv"))
  }

  /** Robust per-type outliers — modified z-score |0.6745·(x−median) /
    * MAD| > 3.5 (Iglewicz–Hoban), the estimator that does NOT let the
    * outliers inflate their own yardstick the way mean/std z-scores do.
    * Median and MAD are EXACT continuous quantiles, but never buffer a
    * group: the fixture's `value` is a 2-decimal measurement grid, so
    * the (type, value) histogram is a genuinely reduced frame (~18k
    * rows per 100k events, bounded by the grid at any corpus size) and
    * both quantiles come out of windows over it — the same
    * histogram-decomposition contract as the quality gate. The flag
    * scan streams against the broadcast per-type scalars. mad = 0
    * degenerates the score (x ≠ med ⇒ ±∞); those types are excluded
    * explicitly rather than letting engines disagree on inf/NaN
    * comparisons.
    */
  def outliersMad(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
    // NULL values must not reach the histogram: the oracle's
    // quantile_cont ignores NULLs, while a null bucket row here would
    // inflate n/nobs and shift both quantiles. (The flag scan needs no
    // guard — null value makes the score NULL, dropped by WHERE in
    // both engines.)
    val hist = ev.where(col("value").isNotNull)
      .groupBy(col("event_type"), col("value").as("v"))
      .agg(count(lit(1)).as("cnt"))
    val med = histQuantile(hist, 0.5).withColumnRenamed("qv", "med")
    val devHist = hist.join(broadcast(med), Seq("event_type"))
      .groupBy(col("event_type"), abs(col("v") - col("med")).as("v"))
      .agg(sum(col("cnt")).as("cnt"))
    val mad = histQuantile(devHist, 0.5).withColumnRenamed("qv", "mad")
    val c = lit(0.6745)
    ev.join(broadcast(med), Seq("event_type"))
      .join(broadcast(mad), Seq("event_type"))
      .where(col("mad") > 0 &&
        abs(c * (col("value") - col("med")) / col("mad")) > 3.5)
      .select(col("event_id"), col("event_type"), col("value"),
        round(c * (col("value") - col("med")) / col("mad"), 6).as("mz"))
  }

  val outliersMadSql: String =
    """WITH m AS (
      |  SELECT event_type, quantile_cont(value, 0.5) AS med
      |  FROM events GROUP BY 1
      |), d AS (
      |  SELECT e.event_type,
      |         quantile_cont(abs(e.value - m.med), 0.5) AS mad
      |  FROM events e JOIN m USING (event_type) GROUP BY 1
      |)
      |SELECT e.event_id, e.event_type, e.value,
      |       round(CAST(0.6745 AS DOUBLE) * (e.value - m.med) / d.mad, 6) AS mz
      |FROM events e JOIN m USING (event_type) JOIN d USING (event_type)
      |WHERE d.mad > 0
      |  AND abs(CAST(0.6745 AS DOUBLE) * (e.value - m.med) / d.mad) > 3.5""".stripMargin

  /** Seasonality-adjusted volume anomalies: each (type, day, hour) cell
    * is scored against the baseline of ITS OWN hour-of-day across all
    * days — the check that catches "3 AM volume at 3 PM levels" without
    * false-flagging ordinary daily rhythm (a plain hourly z-score flags
    * every peak hour). Counts are integers, so every moment (Σc, Σc²)
    * is EXACT long arithmetic reduced over day-level frames; mean/std/z
    * are then fixed single-IEEE-op sequences — deterministic in any
    * engine. Shape at scale: one map-side-combined aggregation to
    * (type, day, hour) cells (the only corpus-sized pass), a
    * |types|·24-row baseline rollup broadcast back over the cell frame.
    * Zero-variance baselines are excluded like `outliersMad`'s mad=0.
    */
  def seasonal(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables(spark, dir, "events")
      .groupBy(col("event_type"), col("ts").cast("date").as("day"),
        hour(col("ts")).cast("long").as("hod"))
      .agg(count(lit(1)).as("n_events"))
    val base = cells.groupBy(col("event_type"), col("hod"))
      .agg(count(lit(1)).as("n_days"),
        sum(col("n_events")).as("s"),
        sum(col("n_events") * col("n_events")).as("qq"))
      .select(col("event_type"), col("hod"), col("n_days"),
        (col("s").cast("double") / col("n_days")).as("mean"),
        sqrt(col("qq").cast("double") / col("n_days") -
          (col("s").cast("double") / col("n_days")) *
          (col("s").cast("double") / col("n_days"))).as("std"))
    cells.join(broadcast(base), Seq("event_type", "hod"))
      .where(col("std") > 0 &&
        abs((col("n_events") - col("mean")) / col("std")) > 2)
      .select(col("event_type"), col("day"), col("hod"), col("n_events"),
        round((col("n_events") - col("mean")) / col("std"), 6).as("z"))
  }

  val seasonalSql: String =
    """WITH cells AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day,
      |         CAST(extract(hour FROM ts) AS BIGINT) AS hod,
      |         count(*) AS n_events
      |  FROM events GROUP BY 1, 2, 3
      |), base AS (
      |  SELECT event_type, hod,
      |         CAST(sum(n_events) AS DOUBLE) / count(*) AS mean,
      |         sqrt(CAST(sum(n_events * n_events) AS DOUBLE) / count(*) -
      |              (CAST(sum(n_events) AS DOUBLE) / count(*)) *
      |              (CAST(sum(n_events) AS DOUBLE) / count(*))) AS std
      |  FROM cells GROUP BY 1, 2
      |)
      |SELECT c.event_type, c.day, c.hod, c.n_events,
      |       round((c.n_events - b.mean) / b.std, 6) AS z
      |FROM cells c JOIN base b USING (event_type, hod)
      |WHERE b.std > 0 AND abs((c.n_events - b.mean) / b.std) > 2""".stripMargin

  /** Rolling active users (DAU + trailing-7-day WAU) — the engagement
    * surface every event warehouse serves. A rolling COUNT DISTINCT
    * cannot ride a window frame (distinctness doesn't decompose), so
    * the exact formulation is contribution-explode: reduce events to
    * the distinct (day, user) frame ONCE, then each user-day
    * contributes to the 7 target days it is visible from and the rollup
    * de-duplicates per target day. Every exchange after the first
    * carries user-day keys (already reduced ~|events|/activity-rate);
    * the ×7 fan-out is of that reduced frame, the standard exact shape
    * — the approximate swap at extreme scale is HLL sketch merge
    * (`agg_approx`'s family), documented not shipped. The join to DAU
    * also restricts WAU to observed days (no phantom trailing days).
    */
  def activeUsers(spark: SparkSession, dir: String): DataFrame = {
    val du = Tables(spark, dir, "events")
      .select(col("ts").cast("date").as("day"), col("user_id")).distinct()
    val dau = du.groupBy(col("day")).agg(count(lit(1)).as("dau"))
    val wau = du
      .select(explode(expr("sequence(day, date_add(day, 6))")).as("day"),
        col("user_id"))
      .groupBy(col("day")).agg(countDistinct(col("user_id")).as("wau"))
    dau.join(wau, Seq("day"))
      .select(col("day"), col("dau"), col("wau"))
  }

  val activeUsersSql: String =
    """WITH du AS (
      |  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
      |), dau AS (
      |  SELECT day, count(*) AS dau FROM du GROUP BY 1
      |), wau AS (
      |  SELECT day + CAST(i AS INTEGER) AS day, count(DISTINCT user_id) AS wau
      |  FROM du, unnest(range(0, 7)) AS t(i) GROUP BY 1
      |)
      |SELECT day, dau, wau FROM dau JOIN wau USING (day)""".stripMargin

  /** DAU/MAU stickiness — the product-health ratio (what share of the
    * monthly base shows up daily): per active day, exact DAU, exact
    * trailing-28-day MAU, and their ratio. Same contribution-explode
    * framing as `activeUsers` (each (day, user) contributes to the 28
    * forward days; no rolling-distinct window, no day-contiguity
    * assumption) — the shuffle ships (day, user) keys once; the
    * sketch swap at 100 TB is `wauSketch`'s documented path with a
    * 28-day fan-out.
    */
  def stickiness(spark: SparkSession, dir: String): DataFrame = {
    val du = Tables(spark, dir, "events")
      .select(col("ts").cast("date").as("day"), col("user_id")).distinct()
    val dau = du.groupBy(col("day")).agg(count(lit(1)).as("dau"))
    val mau = du
      .select(explode(expr("sequence(day, date_add(day, 27))")).as("day"),
        col("user_id"))
      .groupBy(col("day")).agg(countDistinct(col("user_id")).as("mau"))
    dau.join(mau, Seq("day"))
      .select(col("day"), col("dau"), col("mau"),
        round(col("dau").cast("double") / col("mau").cast("double"), 6)
          .as("stickiness"))
  }

  val stickinessSql: String =
    """WITH du AS (
      |  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
      |), dau AS (
      |  SELECT day, count(*) AS dau FROM du GROUP BY 1
      |), mau AS (
      |  SELECT day + CAST(i AS INTEGER) AS day,
      |         count(DISTINCT user_id) AS mau
      |  FROM du, unnest(range(0, 28)) AS t(i) GROUP BY 1
      |)
      |SELECT day, dau, mau,
      |       round(CAST(dau AS DOUBLE) / CAST(mau AS DOUBLE), 6)
      |         AS stickiness
      |FROM dau JOIN mau USING (day)""".stripMargin

  /** Rolling WAU via HLL sketch merge — the scale swap `activeUsers`
    * documents: rolling COUNT DISTINCT doesn't decompose over frames,
    * and the exact contribution-explode ships (day, user) keys, linear
    * in corpus. Here each day reduces ONCE to a fixed-size DataSketches
    * HLL (the only corpus-sized pass), and the trailing-7-day union
    * merges 7 sketches per day — the explode fans out |days|×7 SKETCH
    * rows, bounded by the calendar, never by |events| or |users|. Same
    * contribution-explode framing as the exact twin (no day-contiguity
    * assumption, no global window). Engine-specific sketch bytes →
    * rows-only; the `_check` twin below is the oracled accuracy claim.
    */
  def wauSketch(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables(spark, dir, "events")
      .groupBy(col("ts").cast("date").as("day"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
    daily
      .select(explode(expr("sequence(day, date_add(day, 6))")).as("day"),
        col("sk"))
      .groupBy(col("day"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("wau_approx"))
      // report only days that themselves have activity, like the twin
      .join(daily.select(col("day")), Seq("day"))
  }

  /** Oracled accuracy contract for `wauSketch`: per day, the estimate
    * must sit within 5% of the exact rolling WAU (DataSketches HLL at
    * Spark's default lgConfigK=12 has rsd ≈ 1.6%; 5% ≈ 3σ). The oracle
    * recomputes the exact side and pins every flag true.
    */
  def wauSketchCheck(spark: SparkSession, dir: String): DataFrame =
    activeUsers(spark, dir)
      .join(wauSketch(spark, dir), Seq("day"))
      .select(col("day"), col("wau"),
        (abs(col("wau_approx") - col("wau")) <=
          greatest(col("wau") * 0.05, lit(3.0))).as("wau_ok"))

  val wauSketchCheckSql: String =
    """WITH du AS (
      |  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
      |), wau AS (
      |  SELECT day + CAST(i AS INTEGER) AS day, count(DISTINCT user_id) AS wau
      |  FROM du, unnest(range(0, 7)) AS t(i) GROUP BY 1
      |)
      |SELECT d.day, w.wau, true AS wau_ok
      |FROM (SELECT DISTINCT day FROM du) d JOIN wau w ON w.day = d.day""".stripMargin

  /** Date-spine gap fill: per-(type, day) daily counts with the missing
    * days of each type's own [first, last] span materialized as explicit
    * zero rows — the step every downstream rolling average / forecast
    * needs (a absent day silently read as "no data" instead of "zero
    * events" biases any trailing mean). Shape at scale: the only
    * corpus-sized pass is the map-side-combined reduction to
    * (type, day) cells; the spine is generated by exploding
    * `sequence(first, last)` on the |types|-row span frame — its size is
    * bounded by the calendar (|types| × span-days), never by |events| —
    * and the fill join runs spine-LEFT-cells on those two reduced
    * frames. `is_gap` keeps filled rows distinguishable for audits.
    */
  def gapfill(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables(spark, dir, "events")
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("n_events"))
    val spine = cells.groupBy(col("event_type"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("event_type"),
        explode(expr("sequence(d0, d1)")).as("day"))
    spine.join(cells, Seq("event_type", "day"), "left")
      .select(col("event_type"), col("day"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        col("n_events").isNull.as("is_gap"))
  }

  val gapfillSql: String =
    """WITH cells AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n_events
      |  FROM events GROUP BY 1, 2
      |), spine AS (
      |  SELECT event_type,
      |         CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
      |  FROM (SELECT event_type, min(day) AS d0, max(day) AS d1
      |        FROM cells GROUP BY 1)
      |)
      |SELECT s.event_type, s.day,
      |       COALESCE(c.n_events, 0) AS n_events,
      |       c.n_events IS NULL AS is_gap
      |FROM spine s LEFT JOIN cells c
      |  ON s.event_type = c.event_type AND s.day = c.day""".stripMargin

  /** Gap fill + last-observation-carried-forward: the daily mean value
    * per type, with missing days first materialized by the `gapfill`
    * spine and then filled with the MOST RECENT observed day's value —
    * the time-series repair step (LOCF) downstream forecasting expects,
    * as opposed to `gapfill`'s zero-fill (right for counts, wrong for
    * level metrics like a temperature or a balance). The fill is
    * `last(_, ignoreNulls)` over a window partitioned BY TYPE ordered by
    * day — parallelism = \|types\|, but the frame under each partition is
    * calendar-bounded (span days), never corpus-bounded, because it runs
    * after the daily reduction. Daily means are DECIMAL-exact sums over
    * the 2-dp value grid divided once; the carried value is bit-copied,
    * so cross-engine parity is exact.
    */
  def gapfillLocf(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables(spark, dir, "events")
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg((sum(col("value").cast("decimal(18,4)")).cast("double") /
        count(lit(1)).cast("double")).as("day_mean"))
    val spine = daily.groupBy(col("event_type"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("event_type"), explode(expr("sequence(d0, d1)")).as("day"))
    val byType = Window.partitionBy(col("event_type"))
      .orderBy(col("day").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(daily, Seq("event_type", "day"), "left")
      .withColumn("filled_mean",
        last(col("day_mean"), ignoreNulls = true).over(byType))
      .select(col("event_type"), col("day"),
        col("day_mean").isNull.as("is_filled"), col("filled_mean"))
  }

  val gapfillLocfSql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day,
      |         CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) /
      |           CAST(count(*) AS DOUBLE) AS day_mean
      |  FROM events GROUP BY 1, 2
      |), spine AS (
      |  SELECT event_type,
      |         CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
      |  FROM (SELECT event_type, min(day) AS d0, max(day) AS d1
      |        FROM daily GROUP BY 1)
      |)
      |SELECT s.event_type, s.day,
      |       d.day_mean IS NULL AS is_filled,
      |       last_value(d.day_mean IGNORE NULLS) OVER (
      |         PARTITION BY s.event_type ORDER BY s.day ASC
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_mean
      |FROM spine s LEFT JOIN daily d
      |  ON s.event_type = d.event_type AND s.day = d.day""".stripMargin

  /** Conversion latency distribution: for every user whose first
    * purchase follows their first view, the view→purchase delay —
    * reported as exact percentiles plus the converter count. The timing
    * companion to `funnel` (which counts stage reach, not speed).
    * Shape at scale: one filtered user-keyed reduction to first-view
    * rows, a second purchase-only pass joined user-keyed against that
    * reduced frame (the `ts > first_view` predicate rides INSIDE the
    * join), reduced again to per-user first conversion — every exchange
    * is user-keyed, and the percentile aggregation sees only the
    * \|converters\| latency frame. Latencies are integer seconds, so the
    * (n−1)p interpolation is the same fixed IEEE sequence both engines.
    */
  def funnelLatency(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
    val firstView = ev.where(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("fv"))
    val conv = ev.where(col("event_type") === "purchase")
      .join(firstView, Seq("user_id"))
      .where(col("ts") > col("fv"))
      .groupBy(col("user_id"), col("fv")).agg(min(col("ts")).as("fp"))
      .select(col("user_id"),
        (unix_timestamp(col("fp")) - unix_timestamp(col("fv")))
          .as("latency_sec"))
    conv.agg(
      count(lit(1)).as("n_converted"),
      round(expr("percentile(latency_sec, 0.25)"), 6).as("p25_sec"),
      round(expr("percentile(latency_sec, 0.5)"), 6).as("p50_sec"),
      round(expr("percentile(latency_sec, 0.9)"), 6).as("p90_sec"),
      max(col("latency_sec")).as("max_sec"))
  }

  val funnelLatencySql: String =
    """WITH fv AS (
      |  SELECT user_id, min(ts) AS fv FROM events
      |  WHERE event_type = 'view' GROUP BY 1
      |), conv AS (
      |  SELECT e.user_id,
      |         -- floor each side BEFORE subtracting: Spark's
      |         -- unix_timestamp truncates sub-second parts per value
      |         CAST(floor(epoch(min(e.ts))) - floor(epoch(min(fv.fv)))
      |              AS BIGINT) AS latency_sec
      |  FROM events e JOIN fv ON e.user_id = fv.user_id
      |  WHERE e.event_type = 'purchase' AND e.ts > fv.fv
      |  GROUP BY e.user_id
      |)
      |SELECT count(*) AS n_converted,
      |       round(quantile_cont(latency_sec, 0.25), 6) AS p25_sec,
      |       round(quantile_cont(latency_sec, 0.5), 6) AS p50_sec,
      |       round(quantile_cont(latency_sec, 0.9), 6) AS p90_sec,
      |       max(latency_sec) AS max_sec
      |FROM conv""".stripMargin

  /** Event-type co-occurrence with lift — market-basket association on
    * the (user, hour) basket: how much more often do two event types
    * appear in the same user-hour than independence predicts? Everything
    * reduces FIRST: distinct (user, hour, type) baskets (≤ 5 types per
    * basket, so the within-basket pair self-join fans out by \|types\|,
    * not by events), then pair counts and per-type basket counts are
    * \|types\|²-sized frames. Lift = P(a,b)/(P(a)·P(b)) over basket
    * space — exact integer counts, two IEEE ops, rounded once.
    */
  def cooccurrence(spark: SparkSession, dir: String): DataFrame = {
    val baskets = Tables(spark, dir, "events")
      .select(col("user_id"), date_trunc("HOUR", col("ts")).as("hr"),
        col("event_type")).distinct()
    val nBaskets = baskets.select(col("user_id"), col("hr")).distinct()
      .agg(count(lit(1)).as("n_baskets"))
    val typeCounts = baskets.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_type"))
    val pairs = baskets.as("a")
      .join(baskets.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.hr") === col("b.hr") &&
          col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("type_a"),
        col("b.event_type").as("type_b"))
      .agg(count(lit(1)).as("n_both"))
    pairs
      .join(broadcast(typeCounts.withColumnRenamed("event_type", "type_a")
        .withColumnRenamed("n_type", "na")), Seq("type_a"))
      .join(broadcast(typeCounts.withColumnRenamed("event_type", "type_b")
        .withColumnRenamed("n_type", "nb")), Seq("type_b"))
      .crossJoin(broadcast(nBaskets))
      .select(col("type_a"), col("type_b"), col("n_both"),
        round(col("n_both").cast("double") * col("n_baskets").cast("double") /
          (col("na").cast("double") * col("nb").cast("double")), 6)
          .as("lift"))
  }

  val cooccurrenceSql: String =
    """WITH baskets AS (
      |  SELECT DISTINCT user_id, date_trunc('hour', ts) AS hr, event_type
      |  FROM events
      |), nb AS (
      |  SELECT count(*) AS n_baskets
      |  FROM (SELECT DISTINCT user_id, hr FROM baskets)
      |), tc AS (
      |  SELECT event_type, count(*) AS n_type FROM baskets GROUP BY 1
      |), pairs AS (
      |  SELECT a.event_type AS type_a, b.event_type AS type_b,
      |         count(*) AS n_both
      |  FROM baskets a JOIN baskets b
      |    ON a.user_id = b.user_id AND a.hr = b.hr
      |   AND a.event_type < b.event_type
      |  GROUP BY 1, 2
      |)
      |SELECT type_a, type_b, n_both,
      |       round(CAST(n_both AS DOUBLE) * CAST(nb.n_baskets AS DOUBLE) /
      |             (CAST(ta.n_type AS DOUBLE) * CAST(tb.n_type AS DOUBLE)), 6)
      |         AS lift
      |FROM pairs
      |JOIN tc ta ON ta.event_type = pairs.type_a
      |JOIN tc tb ON tb.event_type = pairs.type_b
      |CROSS JOIN nb""".stripMargin

  /** Exact heavy hitters: the top-10 users by event volume with their
    * share of the stream — the batch ground truth the streaming
    * space-saving sketch (`EventStream.heavyHitters`) approximates, and
    * the pair is spec-linked: the sketch's superset/bound guarantees are
    * asserted against THIS exact ranking. One map-side-combined
    * user-keyed reduction, then `TakeOrdered` on (count desc, user) —
    * no global sort; the total is a broadcast scalar.
    */
  def heavyHitters(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables(spark, dir, "events")
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_events"))
    val total = counts.agg(sum(col("n_events")).as("n_total"))
    counts.crossJoin(broadcast(total))
      .orderBy(col("n_events").desc, col("user_id").asc)
      .limit(10)
      .select(col("user_id"), col("n_events"),
        round(col("n_events").cast("double") / col("n_total"), 6)
          .as("share"))
  }

  val heavyHittersSql: String =
    """SELECT user_id, n_events,
      |       round(CAST(n_events AS DOUBLE) /
      |             (SELECT count(*) FROM events), 6) AS share
      |FROM (SELECT user_id, count(*) AS n_events FROM events GROUP BY 1)
      |ORDER BY n_events DESC, user_id ASC LIMIT 10""".stripMargin

  // --------------------------------------- sequence training examples
  /** Context window length for next-event-prediction examples. */
  private val SeqContext = 4

  /** Training-example construction from the event log — the step that
    * turns raw behavioral logs into (context, label) pairs for a
    * next-event-prediction model: per user, in event-time order, every
    * event with at least `SeqContext` predecessors becomes one example
    * whose context is the preceding `SeqContext` event types and whose
    * label is the event itself.
    *
    * Scale shape: ONE shuffle on the user key; the sliding windows are
    * frame-bounded (`ROWS BETWEEN SeqContext PRECEDING AND 1
    * PRECEDING`) over each user's partition, so state per row is the
    * fixed-size context buffer — no global ordering, no per-user
    * explosion beyond one output row per input event. The (ts,
    * event_id) tiebreak makes same-timestamp sequences deterministic on
    * both engines. At 100 TB this is the canonical log→examples pass:
    * shuffle once on user, write examples partitioned by the training
    * split downstream.
    */
  def sequenceExamples(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    Tables(spark, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("seq", row_number().over(w).cast("long"))
      .withColumn("context", collect_list(col("event_type"))
        .over(w.rowsBetween(-SeqContext, -1)))
      .where(size(col("context")) === SeqContext)
      // list columns never survive the driver's arrow-schema compare
      // (Spark's parquet child is `element`, DuckDB's is `l`), so arrays
      // serialize to a joined string at the boundary — the repo-wide
      // convention (`vec_csv`, `q_csv`); a consumer re-splits on space.
      .select(col("user_id"), col("seq"),
        array_join(col("context"), " ").as("context_csv"),
        col("event_type").as("label"))
  }

  val sequenceExamplesSql: String =
    s"""SELECT user_id, seq, array_to_string(context, ' ') AS context_csv,
       |       label FROM (
       |  SELECT user_id,
       |         CAST(row_number() OVER w AS BIGINT) AS seq,
       |         list(event_type) OVER (PARTITION BY user_id
       |           ORDER BY ts ASC, event_id ASC
       |           ROWS BETWEEN $SeqContext PRECEDING AND 1 PRECEDING) AS context,
       |         event_type AS label
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
       |)
       |WHERE len(context) = $SeqContext""".stripMargin

  /** A/B assignment + sample-ratio-mismatch gate: every user hashes
    * deterministically into one of two arms (the `split3` md5
    * convention — first hex char < '8' is a true coin since one hex
    * digit is uniform over 16 values), and the chi-square
    * goodness-of-fit against the intended 50/50 flags broken
    * randomization (SRM — the first sanity gate every experiment
    * readout runs before any metric is trusted). χ² = Σ(o−e)²/e with
    * df = 1; flag at 3.841 (α = 0.05). Integer counts, closed-form
    * double, identical expression both engines.
    *
    * Scale shape: one distinct-user reduction (map-side combined),
    * then arithmetic on a 1-row frame.
    */
  def abSrm(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val arm = when(substring(md5(concat_ws(":", lit("ab"),
      $"user_id".cast("string"))), 1, 1) < "8", "control")
      .otherwise("treatment")
    Tables(spark, dir, "events")
      .select($"user_id").distinct()
      .select(arm.as("arm"))
      .groupBy()
      .agg(sum(when($"arm" === "control", 1L).otherwise(0L)).as("n_control"),
        sum(when($"arm" === "treatment", 1L).otherwise(0L))
          .as("n_treatment"))
      .select($"n_control", $"n_treatment",
        round(
          pow($"n_control".cast("double") -
            ($"n_control" + $"n_treatment").cast("double") / 2, 2) /
            (($"n_control" + $"n_treatment").cast("double") / 2) +
            pow($"n_treatment".cast("double") -
              ($"n_control" + $"n_treatment").cast("double") / 2, 2) /
              (($"n_control" + $"n_treatment").cast("double") / 2), 6)
          .as("chi2"))
      .withColumn("srm", $"chi2" > 3.841)
  }

  val abSrmSql: String =
    """WITH u AS (SELECT DISTINCT user_id FROM events),
      |arms AS (
      |  SELECT CASE WHEN substr(md5(concat_ws(':', 'ab',
      |                CAST(user_id AS VARCHAR))), 1, 1) < '8'
      |              THEN 'control' ELSE 'treatment' END AS arm
      |  FROM u),
      |c AS (SELECT
      |        CAST(sum(CASE WHEN arm = 'control' THEN 1 ELSE 0 END)
      |             AS BIGINT) AS n_control,
      |        CAST(sum(CASE WHEN arm = 'treatment' THEN 1 ELSE 0 END)
      |             AS BIGINT) AS n_treatment
      |      FROM arms)
      |SELECT n_control, n_treatment,
      |       round(pow(CAST(n_control AS DOUBLE) -
      |                 CAST(n_control + n_treatment AS DOUBLE) / 2, 2) /
      |             (CAST(n_control + n_treatment AS DOUBLE) / 2) +
      |             pow(CAST(n_treatment AS DOUBLE) -
      |                 CAST(n_control + n_treatment AS DOUBLE) / 2, 2) /
      |             (CAST(n_control + n_treatment AS DOUBLE) / 2), 6)
      |         AS chi2,
      |       round(pow(CAST(n_control AS DOUBLE) -
      |                 CAST(n_control + n_treatment AS DOUBLE) / 2, 2) /
      |             (CAST(n_control + n_treatment AS DOUBLE) / 2) +
      |             pow(CAST(n_treatment AS DOUBLE) -
      |                 CAST(n_control + n_treatment AS DOUBLE) / 2, 2) /
      |             (CAST(n_control + n_treatment AS DOUBLE) / 2), 6)
      |         > 3.841 AS srm
      |FROM c""".stripMargin

  /** RFM segmentation — recency / frequency / monetary scores per
    * user, the classic behavioral-cohort cut: each dimension scores
    * 1–3 by its QUARTILE cuts (1 + (x > q25) + (x > q75); recency
    * reversed — recent is good). Quartile thresholds are EXACT
    * inclusive-rank order statistics (smallest value whose cumulative
    * count reaches ⌈q·n⌉ — `quantile_disc` semantics, the
    * `curate_loss_band` pattern): every threshold is a value that
    * EXISTS in the column, so boundary compares are long-vs-long /
    * decimal-vs-decimal with no interpolation arithmetic anywhere —
    * the r7 failure mode (DuckDB `quantile_cont` vs Spark's
    * `a + f·(b−a)` evaluating one ulp apart on double data) cannot
    * occur by construction. `monetary` is DECIMAL(38,2) INTERNALLY on
    * BOTH engines (the `agg_pareto` house convention) so the sum and
    * the threshold compares are exact, but the EMITTED column is cast
    * to DOUBLE on both sides: the r8 driver hash canonicalizes
    * decimal128 output differently from every local mirror, and
    * casting the same exact decimal yields bit-identical doubles.
    *
    * Scale shape: one event scan reduces to the |users| frame; the
    * global max-ts and the six thresholds ride broadcast-back scalar
    * frames. Each dimension's order statistic runs over its DISTINCT-
    * value histogram; recency (days) and frequency (events/user) have
    * bounded value ranges, while the monetary histogram is |users|-
    * sized in the worst case — same |users| buffer class as the old
    * exact `percentile`, with the KLL sketch (`events_rfm_sketch*`)
    * as the documented serving swap at 100 TB.
    */
  /** The reduced per-user RFM frame both the exact op and the KLL
    * serving twin score from: one event scan, the global max-ts
    * broadcast back. Eager checkpoint — the frame feeds FOUR consumers
    * in the exact op (three per-dimension threshold reductions + the
    * scoring join) and two in the sketch twin; without the cut each
    * consumer re-runs the corpus scan (measured 0.25→0.75 s at sf0.1
    * when the r8 threshold rewrite added consumers). |users|-sized —
    * free to materialize at any corpus size.
    */
  private def rfmPerUser(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables(spark, dir, "events").where($"value".isNotNull)
    val now = ev.agg(max(to_date($"ts")).as("today"))
    ev.groupBy("user_id")
      .agg(max(to_date($"ts")).as("last_day"),
        count(lit(1)).as("frequency"),
        sum($"value".cast("decimal(18,2)")).cast("decimal(38,2)")
          .as("monetary"))
      .crossJoin(broadcast(now))
      .select($"user_id",
        datediff($"today", $"last_day").cast("long").as("recency_days"),
        $"frequency", $"monetary")
      .localCheckpoint()
  }

  def rfm(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val perUser = rfmPerUser(spark, dir)
    // Inclusive-rank q25/q75 for ALL THREE dimensions in one pass:
    // stack to (dim, val) — DECIMAL(38,2) holds longs exactly, so the
    // compares stay exact — one histogram shuffle, one window keyed by
    // dim (each partition holds one dimension's distinct values), one
    // 3-row threshold reduce pivoted wide. ⌈n·q⌉ is exact in double
    // (q dyadic, n < 2^52). Long-vs-decimal score compares widen the
    // long side losslessly.
    val unp = perUser.select(expr(
      "stack(3, 'r', CAST(recency_days AS DECIMAL(38,2)), " +
        "'f', CAST(frequency AS DECIMAL(38,2)), " +
        "'m', monetary) AS (dim, val)"))
    val hist = unp.groupBy("dim", "val").agg(count(lit(1)).as("cnt"))
    val cum = hist.withColumn("cum",
      sum($"cnt").over(Window.partitionBy("dim").orderBy($"val".asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val tot = hist.groupBy("dim").agg(sum($"cnt").as("n"))
    val th = cum.join(tot, "dim").groupBy("dim").agg(
      min(when($"cum" >= ceil($"n" * 0.25), $"val")).as("q1"),
      min(when($"cum" >= ceil($"n" * 0.75), $"val")).as("q3"))
    val wide = th.groupBy().pivot("dim", Seq("r", "f", "m"))
      .agg(first($"q1").as("q1"), first($"q3").as("q3"))
    // Boundary rule (r8 verdict): decimal stays INTERNAL — the score
    // compares below run on the exact DECIMAL(38,2) — but the emitted
    // `monetary` column is cast to DOUBLE. Both engines cast the SAME
    // exact decimal so the doubles are bit-identical, and no
    // DecimalType crosses the oracle boundary (the one output class
    // the driver's hash canonicalizes differently; Verify.scala lints
    // for it).
    perUser.crossJoin(broadcast(wide))
      .select($"user_id", $"recency_days", $"frequency",
        $"monetary".cast("double").as("monetary"),
        (lit(3) -
          ($"recency_days" > $"r_q1").cast("int") -
          ($"recency_days" > $"r_q3").cast("int"))
          .as("r_score"),
        (lit(1) +
          ($"frequency" > $"f_q1").cast("int") +
          ($"frequency" > $"f_q3").cast("int"))
          .as("f_score"),
        (lit(1) +
          ($"monetary" > $"m_q1").cast("int") +
          ($"monetary" > $"m_q3").cast("int"))
          .as("m_score"))
      .withColumn("segment",
        concat($"r_score", $"f_score", $"m_score"))
  }

  val rfmSql: String =
    """WITH ev AS (SELECT * FROM events WHERE value IS NOT NULL),
      |now_d AS (SELECT max(CAST(ts AS DATE)) AS today FROM ev),
      |pu AS (
      |  SELECT user_id,
      |         CAST(date_diff('day', max(CAST(ts AS DATE)),
      |              (SELECT today FROM now_d)) AS BIGINT) AS recency_days,
      |         CAST(count(*) AS BIGINT) AS frequency,
      |         sum(CAST(value AS DECIMAL(18,2))) AS monetary
      |  FROM ev GROUP BY user_id),
      |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM pu),
      |rh AS (SELECT recency_days AS v, count(*) AS cnt FROM pu GROUP BY 1),
      |rc AS (SELECT v, CAST(sum(cnt) OVER (ORDER BY v ASC
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |         AS cum FROM rh),
      |rt AS (SELECT min(CASE WHEN cum >= ceil(n * 0.25) THEN v END) AS q1,
      |              min(CASE WHEN cum >= ceil(n * 0.75) THEN v END) AS q3
      |       FROM rc CROSS JOIN nn),
      |fh AS (SELECT frequency AS v, count(*) AS cnt FROM pu GROUP BY 1),
      |fc AS (SELECT v, CAST(sum(cnt) OVER (ORDER BY v ASC
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |         AS cum FROM fh),
      |ft AS (SELECT min(CASE WHEN cum >= ceil(n * 0.25) THEN v END) AS q1,
      |              min(CASE WHEN cum >= ceil(n * 0.75) THEN v END) AS q3
      |       FROM fc CROSS JOIN nn),
      |mh AS (SELECT monetary AS v, count(*) AS cnt FROM pu GROUP BY 1),
      |mc AS (SELECT v, CAST(sum(cnt) OVER (ORDER BY v ASC
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |         AS cum FROM mh),
      |mt AS (SELECT min(CASE WHEN cum >= ceil(n * 0.25) THEN v END) AS q1,
      |              min(CASE WHEN cum >= ceil(n * 0.75) THEN v END) AS q3
      |       FROM mc CROSS JOIN nn)
      |SELECT user_id, recency_days, frequency,
      |       CAST(monetary AS DOUBLE) AS monetary,
      |       3 - CAST(recency_days > rt.q1 AS INTEGER)
      |         - CAST(recency_days > rt.q3 AS INTEGER)
      |         AS r_score,
      |       1 + CAST(frequency > ft.q1 AS INTEGER)
      |         + CAST(frequency > ft.q3 AS INTEGER)
      |         AS f_score,
      |       1 + CAST(monetary > mt.q1 AS INTEGER)
      |         + CAST(monetary > mt.q3 AS INTEGER)
      |         AS m_score,
      |       concat(
      |         3 - CAST(recency_days > rt.q1 AS INTEGER)
      |           - CAST(recency_days > rt.q3 AS INTEGER),
      |         1 + CAST(frequency > ft.q1 AS INTEGER)
      |           + CAST(frequency > ft.q3 AS INTEGER),
      |         1 + CAST(monetary > mt.q1 AS INTEGER)
      |           + CAST(monetary > mt.q3 AS INTEGER))
      |         AS segment
      |FROM pu CROSS JOIN rt CROSS JOIN ft CROSS JOIN mt""".stripMargin

  /** The SERVING form of `events_rfm` at 100 TB: identical scoring
    * shape, but the six quartile thresholds come from mergeable KLL
    * sketches (`org.apache.spark.sql.graft.KllColumn`) instead of the
    * exact distinct-value histograms — the aggregation buffer is a
    * fixed ~5 KB per dimension rather than |users|-sized, and stored
    * per-partition sketch partials roll up to the same thresholds
    * without re-scanning (the `agg_quantile_sketch` machinery, wired
    * here as the r7 verdict's documented swap). Sketch estimates are
    * engine-specific → rows-only; `events_rfm_sketch_check` is the
    * oracled accuracy contract.
    */
  def rfmSketch(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.graft.KllColumn
    val perUser = rfmPerUser(spark, dir)
    val sk = perUser.agg(
      KllColumn.sketchAgg($"recency_days".cast("double")).as("rsk"),
      KllColumn.sketchAgg($"frequency".cast("double")).as("fsk"),
      KllColumn.sketchAgg($"monetary".cast("double")).as("msk"))
    val th = sk.select(
      KllColumn.quantile($"rsk", 0.25).as("r1"),
      KllColumn.quantile($"rsk", 0.75).as("r3"),
      KllColumn.quantile($"fsk", 0.25).as("f1"),
      KllColumn.quantile($"fsk", 0.75).as("f3"),
      KllColumn.quantile($"msk", 0.25).as("m1"),
      KllColumn.quantile($"msk", 0.75).as("m3"))
    perUser.crossJoin(broadcast(th))
      .select($"user_id", $"recency_days", $"frequency",
        $"monetary".cast("double").as("monetary"),
        (lit(3) -
          ($"recency_days".cast("double") > $"r1").cast("int") -
          ($"recency_days".cast("double") > $"r3").cast("int"))
          .as("r_score"),
        (lit(1) +
          ($"frequency".cast("double") > $"f1").cast("int") +
          ($"frequency".cast("double") > $"f3").cast("int"))
          .as("f_score"),
        (lit(1) +
          ($"monetary".cast("double") > $"m1").cast("int") +
          ($"monetary".cast("double") > $"m3").cast("int"))
          .as("m_score"))
      .withColumn("segment",
        concat($"r_score", $"f_score", $"m_score"))
  }

  /** Oracled rank-error contract for `rfmSketch` (the
    * `agg_quantile_sketch_check` pattern): each KLL threshold's TRUE
    * inclusive rank over the per-user frame must sit within 2× the
    * sketch's published normalized rank-error bound of its target
    * quantile. One extra pass over the |users| frame computes the
    * exact ranks as conditional aggregates against the broadcast
    * 1-row threshold frame; the DuckDB twin pins every flag true over
    * the same (dimension, p) grid.
    */
  def rfmSketchCheck(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.graft.KllColumn
    val tol = 2.0 * KllColumn.normalizedRankError()
    val perUser = rfmPerUser(spark, dir)
    val sk = perUser.agg(
      KllColumn.sketchAgg($"recency_days".cast("double")).as("rsk"),
      KllColumn.sketchAgg($"frequency".cast("double")).as("fsk"),
      KllColumn.sketchAgg($"monetary".cast("double")).as("msk"))
    val th = sk.select(
      KllColumn.quantile($"rsk", 0.25).as("r1"),
      KllColumn.quantile($"rsk", 0.75).as("r3"),
      KllColumn.quantile($"fsk", 0.25).as("f1"),
      KllColumn.quantile($"fsk", 0.75).as("f3"),
      KllColumn.quantile($"msk", 0.25).as("m1"),
      KllColumn.quantile($"msk", 0.75).as("m3"))
    // Tie-robust contract: the returned value v occupies the whole rank
    // interval [rank_lt(v), rank_le(v)] in a tied distribution (recency
    // and frequency are small integers with heavy ties), so the target
    // quantile must fall within that interval WIDENED by the KLL bound
    // — the inclusive rank alone would flag a correct answer whenever
    // one tied value spans the quartile.
    def lt(c: org.apache.spark.sql.Column, t: org.apache.spark.sql.Column) =
      sum(when(c < t, 1L).otherwise(0L))
    def le(c: org.apache.spark.sql.Column, t: org.apache.spark.sql.Column) =
      sum(when(c <= t, 1L).otherwise(0L))
    val rd = $"recency_days".cast("double")
    val fq = $"frequency".cast("double")
    val mo = $"monetary".cast("double")
    val ranks = perUser.crossJoin(broadcast(th)).agg(
      count(lit(1)).cast("double").as("n"),
      lt(rd, $"r1").as("lt_r1"), le(rd, $"r1").as("le_r1"),
      lt(rd, $"r3").as("lt_r3"), le(rd, $"r3").as("le_r3"),
      lt(fq, $"f1").as("lt_f1"), le(fq, $"f1").as("le_f1"),
      lt(fq, $"f3").as("lt_f3"), le(fq, $"f3").as("le_f3"),
      lt(mo, $"m1").as("lt_m1"), le(mo, $"m1").as("le_m1"),
      lt(mo, $"m3").as("lt_m3"), le(mo, $"m3").as("le_m3"))
    ranks.select(expr(
      "stack(6, 'recency', 0.25D, lt_r1, le_r1, " +
        "'recency', 0.75D, lt_r3, le_r3, " +
        "'frequency', 0.25D, lt_f1, le_f1, " +
        "'frequency', 0.75D, lt_f3, le_f3, " +
        "'monetary', 0.25D, lt_m1, le_m1, " +
        "'monetary', 0.75D, lt_m3, le_m3) " +
        "AS (dim, p, lo, hi)"), col("n"))
      .select(col("dim"), col("p"),
        (col("lo") / col("n") - tol <= col("p") &&
          col("p") <= col("hi") / col("n") + tol).as("rank_ok"))
  }

  val rfmSketchCheckSql: String =
    """SELECT dim, p, true AS rank_ok
      |FROM (SELECT unnest(['recency', 'frequency', 'monetary']) AS dim)
      |CROSS JOIN (SELECT CAST(unnest([0.25, 0.75]) AS DOUBLE) AS p)""".stripMargin

  /** CUPED variance reduction for the A/B readout (Deng et al. 2013):
    * split the window at its midpoint into a PRE period (covariate X =
    * per-user pre value sum — by construction unaffected by treatment)
    * and a POST period (metric Y); regress out X with the pooled
    * θ = cov(X,Y)/var(X) and report each arm's raw and adjusted means.
    * The standard launch-review step wherever an experiment's metric
    * has high between-user variance; arms ride the same md5 assignment
    * as `events_ab_srm`.
    *
    * Determinism across engines: every moment (Sx, Sy, Sxy, Sxx) is an
    * EXACT DECIMAL sum — X·Y products are decimal(18,2)² → scale-4
    * decimals, so no float accumulation order exists anywhere; θ and
    * the means are then a fixed double expression over those identical
    * scalars, rounded at the boundary. The midpoint cutoff is integer
    * date arithmetic from the window bounds. var(X) = 0 degrades to
    * θ = 0 (raw means) instead of a NaN.
    *
    * Scale shape: one event scan reduces to the |users| frame with the
    * broadcast cutoff; moments are one more map-side-combined reduce;
    * the 2-row arm frame joins the broadcast pooled scalars.
    */
  def cuped(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables(spark, dir, "events").where($"value".isNotNull)
    val bounds = ev.agg(min(to_date($"ts")).as("d0"), max(to_date($"ts")).as("d1"))
      .select(date_add($"d0",
        expr("datediff(d1, d0) div 2").cast("int")).as("cutoff"))
    val arm = when(substring(md5(concat_ws(":", lit("ab"),
      $"user_id".cast("string"))), 1, 1) < "8", "control")
      .otherwise("treatment")
    val pu = ev.crossJoin(broadcast(bounds))
      .groupBy("user_id")
      .agg(
        // Keep the per-user sums at Spark's WIDENED sum precision
        // (28,2) on both engines — narrowing back to (18,2) made a
        // per-user total over 10^16 null silently in non-ANSI Spark
        // while the DuckDB twin errors on the same cast (r8 ADVICE).
        // At (28,2) the x·y products land on (38,4) identically in
        // both engines (probed: DuckDB caps 28×28 at (38,4) exactly
        // like Spark's precision-loss rule).
        sum(when(to_date($"ts") < $"cutoff", $"value").otherwise(0.0)
          .cast("decimal(18,2)")).cast("decimal(28,2)").as("x"),
        sum(when(to_date($"ts") >= $"cutoff", $"value").otherwise(0.0)
          .cast("decimal(18,2)")).cast("decimal(28,2)").as("y"))
      .withColumn("arm", arm)
    val pooled = pu.agg(
      count(lit(1)).as("n"),
      sum($"x").cast("decimal(38,2)").as("sx"),
      sum($"y").cast("decimal(38,2)").as("sy"),
      sum($"x" * $"y").cast("decimal(38,4)").as("sxy"),
      sum($"x" * $"x").cast("decimal(38,4)").as("sxx"))
    val byArm = pu.groupBy("arm").agg(
      count(lit(1)).as("n_users"),
      sum($"x").cast("decimal(38,2)").as("sxa"),
      sum($"y").cast("decimal(38,2)").as("sya"))
    byArm.crossJoin(broadcast(pooled))
      .select($"arm", $"n_users",
        ($"sxy".cast("double") / $"n" -
          ($"sx".cast("double") / $"n") * ($"sy".cast("double") / $"n"))
          .as("cov"),
        ($"sxx".cast("double") / $"n" -
          ($"sx".cast("double") / $"n") * ($"sx".cast("double") / $"n"))
          .as("varx"),
        ($"sx".cast("double") / $"n").as("mx"),
        ($"sya".cast("double") / $"n_users").as("my"),
        ($"sxa".cast("double") / $"n_users").as("mxa"))
      .withColumn("theta",
        when($"varx" <= 0.0, 0.0).otherwise($"cov" / $"varx"))
      .select($"arm", $"n_users",
        round($"my", 6).as("mean_y"),
        round($"my" - $"theta" * ($"mxa" - $"mx"), 6).as("mean_y_cuped"),
        round($"theta", 6).as("theta"))
  }

  val cupedSql: String =
    """WITH ev AS (SELECT * FROM events WHERE value IS NOT NULL),
      |b AS (SELECT min(CAST(ts AS DATE)) AS d0, max(CAST(ts AS DATE)) AS d1
      |      FROM ev),
      |c AS (SELECT d0 + CAST(date_diff('day', d0, d1) // 2 AS INTEGER)
      |        AS cutoff FROM b),
      |pu AS (
      |  SELECT user_id,
      |         CAST(sum(CAST(CASE WHEN CAST(ts AS DATE) <
      |                (SELECT cutoff FROM c)
      |              THEN value ELSE 0.0 END AS DECIMAL(18,2)))
      |           AS DECIMAL(28,2)) AS x,
      |         CAST(sum(CAST(CASE WHEN CAST(ts AS DATE) >=
      |                (SELECT cutoff FROM c)
      |              THEN value ELSE 0.0 END AS DECIMAL(18,2)))
      |           AS DECIMAL(28,2)) AS y,
      |         CASE WHEN substr(md5(concat_ws(':', 'ab',
      |                CAST(user_id AS VARCHAR))), 1, 1) < '8'
      |              THEN 'control' ELSE 'treatment' END AS arm
      |  FROM ev GROUP BY user_id),
      |pooled AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |         CAST(sum(x) AS DECIMAL(38,2)) AS sx,
      |         CAST(sum(y) AS DECIMAL(38,2)) AS sy,
      |         CAST(sum(x * y) AS DECIMAL(38,4)) AS sxy,
      |         CAST(sum(x * x) AS DECIMAL(38,4)) AS sxx
      |  FROM pu),
      |by_arm AS (
      |  SELECT arm, CAST(count(*) AS BIGINT) AS n_users,
      |         CAST(sum(x) AS DECIMAL(38,2)) AS sxa,
      |         CAST(sum(y) AS DECIMAL(38,2)) AS sya
      |  FROM pu GROUP BY arm),
      |m AS (
      |  SELECT arm, n_users,
      |         CAST(sxy AS DOUBLE) / n -
      |           (CAST(sx AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n) AS cov,
      |         CAST(sxx AS DOUBLE) / n -
      |           (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n) AS varx,
      |         CAST(sx AS DOUBLE) / n AS mx,
      |         CAST(sya AS DOUBLE) / n_users AS my,
      |         CAST(sxa AS DOUBLE) / n_users AS mxa
      |  FROM by_arm CROSS JOIN pooled)
      |SELECT arm, n_users,
      |       round(my, 6) AS mean_y,
      |       round(my - (CASE WHEN varx <= 0.0 THEN 0.0
      |                        ELSE cov / varx END) * (mxa - mx), 6)
      |         AS mean_y_cuped,
      |       round(CASE WHEN varx <= 0.0 THEN 0.0
      |                  ELSE cov / varx END, 6) AS theta
      |FROM m""".stripMargin

  /** "Converted" = at least this many purchase events (the fixture's
    * per-user purchase rate is high, so presence alone saturates at
    * p = 1; a count threshold keeps the proportion interior — and
    * events-per-user is scale-invariant across SFs, so the same
    * constant is meaningful at every fixture size).
    */
  private val AbConvMinPurchases = 14L

  /** Two-proportion z-test on the conversion rate between the md5 arms
    * — the binary-outcome counterpart of `events_cuped`/`stats_welch`:
    * "did treatment change the share of users who converted?", the
    * question most launch reviews actually ask.
    * z = (p₁−p₂)/√(p̂(1−p̂)(1/n₁+1/n₂)) with the pooled p̂, flagged at
    * |z| > 1.96 (α = 0.05 two-sided); a degenerate pooled rate (p̂ = 0
    * or 1, zero denominator) reports z = 0, not-significant, instead
    * of an ANSI divide error.
    *
    * Everything up to the final expression is INTEGER counts — one
    * |users| reduce then a 1-row double formula — so both engines
    * compute the identical z from identical (n, x) quadruples.
    */
  def abProportions(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val arm = when(substring(md5(concat_ws(":", lit("ab"),
      $"user_id".cast("string"))), 1, 1) < "8", "control")
      .otherwise("treatment")
    val pu = Tables(spark, dir, "events")
      .groupBy("user_id")
      .agg(sum(when($"event_type" === "purchase", 1L).otherwise(0L))
        .as("purchases"))
      .select(arm.as("arm"),
        ($"purchases" >= AbConvMinPurchases).cast("long").as("conv"))
    val agg = pu.groupBy()
      .agg(
        sum(when($"arm" === "control", 1L).otherwise(0L)).as("n_control"),
        sum(when($"arm" === "control", $"conv").otherwise(0L))
          .as("x_control"),
        sum(when($"arm" === "treatment", 1L).otherwise(0L))
          .as("n_treatment"),
        sum(when($"arm" === "treatment", $"conv").otherwise(0L))
          .as("x_treatment"))
    val p = ($"x_control" + $"x_treatment").cast("double") /
      ($"n_control" + $"n_treatment")
    val denom = sqrt(p * (lit(1.0) - p) *
      (lit(1.0) / $"n_control" + lit(1.0) / $"n_treatment"))
    agg.select($"n_control", $"x_control", $"n_treatment", $"x_treatment",
      round(when(denom === 0.0, 0.0).otherwise(
        ($"x_control".cast("double") / $"n_control" -
          $"x_treatment".cast("double") / $"n_treatment") / denom),
        6).as("z"))
      .withColumn("significant", abs($"z") > 1.96)
  }

  val abProportionsSql: String =
    s"""WITH pu AS (
       |  SELECT user_id,
       |         CAST(CAST(sum(CASE WHEN event_type = 'purchase' THEN 1
       |                       ELSE 0 END) >= $AbConvMinPurchases AS INTEGER)
       |           AS BIGINT) AS conv,
       |         CASE WHEN substr(md5(concat_ws(':', 'ab',
       |                CAST(user_id AS VARCHAR))), 1, 1) < '8'
       |              THEN 'control' ELSE 'treatment' END AS arm
       |  FROM events GROUP BY user_id),
       |agg AS (
       |  SELECT
       |    CAST(sum(CASE WHEN arm = 'control' THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_control,
       |    CAST(sum(CASE WHEN arm = 'control' THEN conv ELSE 0 END) AS BIGINT)
       |      AS x_control,
       |    CAST(sum(CASE WHEN arm = 'treatment' THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_treatment,
       |    CAST(sum(CASE WHEN arm = 'treatment' THEN conv ELSE 0 END)
       |      AS BIGINT) AS x_treatment
       |  FROM pu),
       |m AS (
       |  SELECT n_control, x_control, n_treatment, x_treatment,
       |         sqrt((CAST(x_control + x_treatment AS DOUBLE) /
       |               (n_control + n_treatment)) *
       |              (1.0 - CAST(x_control + x_treatment AS DOUBLE) /
       |                     (n_control + n_treatment)) *
       |              (1.0 / n_control + 1.0 / n_treatment)) AS denom
       |  FROM agg)
       |SELECT n_control, x_control, n_treatment, x_treatment,
       |       round(CASE WHEN denom = 0.0 THEN 0.0
       |                  ELSE (CAST(x_control AS DOUBLE) / n_control -
       |                        CAST(x_treatment AS DOUBLE) / n_treatment)
       |                       / denom END, 6) AS z,
       |       abs(round(CASE WHEN denom = 0.0 THEN 0.0
       |                  ELSE (CAST(x_control AS DOUBLE) / n_control -
       |                        CAST(x_treatment AS DOUBLE) / n_treatment)
       |                       / denom END, 6)) > 1.96 AS significant
       |FROM m""".stripMargin

  // --------------------------------------------- Kaplan–Meier survival

  /** Time-to-churn survival curve (Kaplan–Meier product-limit with
    * right-censoring): a user "churns" on their LAST event day; users
    * whose last day is the window's final day are CENSORED (still
    * alive at cutoff), not deaths — the estimator the retention grid
    * (`events_retention`) approximates from above. Reported per event
    * day t as (n at risk, churn events, Ŝ(t) = Π (1 − dᵢ/nᵢ)).
    *
    * Determinism across engines: dᵢ and nᵢ are exact integers; each
    * factor enters as ln((nᵢ−dᵢ)/nᵢ) computed from the same
    * integer-derived double, rounded to 9 dp and FIXED AS
    * DECIMAL(18,9), so the cumulative product is an exact decimal sum
    * in log space (the `curate_dsir` discipline through a window);
    * Ŝ = round(exp(cum), 6) — exp of identical doubles.
    *
    * Scale shape: one event scan reduces to the |users| last-day
    * frame, then to the |days| histogram; the cumulative window runs
    * over the DAY histogram — bounded by the calendar, never
    * corpus-sized (the `curate_quality_gate` boundedness class).
    */
  def survival(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables(spark, dir, "events")
    // |users|-sized; checkpointed because it feeds THREE consumers
    // (horizon reduce, day histogram, user total) — without the cut
    // each re-runs the corpus scan (the rfmPerUser lesson).
    val lastDay = ev.groupBy("user_id")
      .agg(max(to_date($"ts")).as("last_day"))
      .localCheckpoint()
    // max over per-user maxima == the corpus max day: one scan total
    val horizon = lastDay.agg(max($"last_day").as("max_day"))
    val byDay = lastDay.crossJoin(broadcast(horizon))
      .groupBy($"last_day".as("day"))
      .agg(count(lit(1)).as("n_last"),
        sum(when($"last_day" < $"max_day", 1L).otherwise(0L))
          .as("n_events"))
    val total = lastDay.agg(count(lit(1)).as("n_users"))
    val w = Window.orderBy($"day".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prevW = Window.orderBy($"day".asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    byDay.crossJoin(broadcast(total))
      .withColumn("n_risk",
        $"n_users" - coalesce(sum($"n_last").over(prevW), lit(0L)))
      .withColumn("lf",
        round(log(($"n_risk" - $"n_events").cast("double") /
          $"n_risk".cast("double")), 9).cast("decimal(18,9)"))
      .withColumn("cum", sum($"lf").over(w).cast("decimal(38,9)"))
      .select($"day", $"n_risk", $"n_events",
        round(exp($"cum".cast("double")), 6).as("survival"))
  }

  val survivalSql: String =
    """WITH ld AS (
      |  SELECT user_id, max(CAST(ts AS DATE)) AS last_day
      |  FROM events GROUP BY user_id),
      |hz AS (SELECT max(CAST(ts AS DATE)) AS max_day FROM events),
      |bd AS (
      |  SELECT last_day AS day, CAST(count(*) AS BIGINT) AS n_last,
      |         CAST(sum(CASE WHEN last_day < (SELECT max_day FROM hz)
      |                  THEN 1 ELSE 0 END) AS BIGINT) AS n_events
      |  FROM ld GROUP BY last_day),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_users FROM ld),
      |risk AS (
      |  SELECT day, n_last, n_events,
      |         n_users - CAST(COALESCE(sum(n_last) OVER (ORDER BY day ASC
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |           AS BIGINT) AS n_risk
      |  FROM bd CROSS JOIN tot),
      |lf AS (
      |  SELECT day, n_risk, n_events,
      |         CAST(round(ln(CAST(n_risk - n_events AS DOUBLE) /
      |                       CAST(n_risk AS DOUBLE)), 9)
      |           AS DECIMAL(18,9)) AS lf
      |  FROM risk)
      |SELECT day, n_risk, n_events,
      |       round(exp(CAST(CAST(sum(lf) OVER (ORDER BY day ASC
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |         AS DECIMAL(38,9)) AS DOUBLE)), 6) AS survival
      |FROM lf""".stripMargin

  // ---------------------------------- Markov chain steady behavior

  private val MarkovScale = 1000000L
  private val MarkovIters = 8

  /** Long-run behavioral mix — the 8-step power-iteration distribution
    * of the event-type Markov chain from a uniform start: where a
    * user's session settles if transitions keep following the observed
    * matrix (`events_transitions` is the matrix; this is its fixpoint
    * read). Fixed iteration count IS the contract — the result is a
    * deterministic function of the counts, convergence not assumed.
    *
    * Integer-exact across engines (the `graph_pagerank` recipe): mass
    * in BIGINT micro-units of `MarkovScale`; each step moves
    * `(v·cnt) div tot` per edge — floor division on positives, so sum
    * order and partitioning cannot bite. v ≤ Scale = 1e6 and
    * cnt ≤ 1e12 keep the product under BIGINT even at 100 TB. A state
    * with no outgoing transitions drops its mass (the pagerank "weak"
    * form, identical in both engines).
    *
    * Scale shape: one corpus scan reduces to the |types|² matrix
    * (map-side combined); all eight iterations run on that tiny frame.
    */
  def markovStationary(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val byUser = Window.partitionBy($"user_id")
      .orderBy($"ts".asc, $"event_id".asc)
    // |types|²-sized and feeds every iteration; coalesce(1) so the 8
    // unrolled tiny-frame joins don't pay 8× the session's shuffle
    // width in empty-task scheduling (measured 2.26 → sub-second at
    // sf0.1; the coalesce is AFTER the corpus-sized reduce, so the
    // scan keeps full parallelism at any corpus size)
    val trans = Tables(spark, dir, "events")
      .select($"user_id", $"event_type".as("a"),
        lead($"event_type", 1).over(byUser).as("b"))
      .where($"b".isNotNull)
      .groupBy("a", "b").agg(count(lit(1)).as("cnt"))
      .coalesce(1)
      .localCheckpoint()
    val tot = trans.groupBy("a").agg(sum("cnt").as("tot"))
    val tm = trans.join(tot, "a").localCheckpoint()
    val states = trans.select($"a".as("state"))
      .union(trans.select($"b".as("state"))).distinct()
      .localCheckpoint()
    val k = states.agg(count(lit(1)).as("k"))
    var v = states.crossJoin(broadcast(k))
      .select($"state", expr(s"${MarkovScale}L div k").as("v"))
    for (_ <- 1 to MarkovIters) {
      val contrib = tm.join(v, $"a" === $"state")
        .select($"b", expr("(v * cnt) div tot").as("c"))
        .groupBy($"b").agg(sum($"c").as("s"))
      v = states.join(contrib, $"state" === $"b", "left_outer")
        .select($"state", coalesce($"s", lit(0L)).as("v"))
        .localCheckpoint(eager = false)
    }
    v.select($"state", $"v".as("mass_micro"),
      round($"v".cast("double") / MarkovScale, 6).as("p"))
      .localCheckpoint()
  }

  val markovStationarySql: String = {
    val steps = (1 to MarkovIters).map { i =>
      s"""v$i AS (
         |  SELECT st.state, CAST(COALESCE(c.s, 0) AS BIGINT) AS v
         |  FROM st LEFT JOIN (
         |    SELECT tm.b, sum((v.v * tm.cnt) // tm.tot) AS s
         |    FROM tm JOIN v${i - 1} v ON tm.a = v.state
         |    GROUP BY tm.b) c
         |  ON st.state = c.b)""".stripMargin
    }.mkString(",\n")
    s"""WITH tr AS (
       |  SELECT a, b, CAST(count(*) AS BIGINT) AS cnt
       |  FROM (SELECT event_type AS a,
       |               lead(event_type) OVER (PARTITION BY user_id
       |                 ORDER BY ts ASC, event_id ASC) AS b
       |        FROM events)
       |  WHERE b IS NOT NULL GROUP BY a, b),
       |tt AS (SELECT a, CAST(sum(cnt) AS BIGINT) AS tot FROM tr GROUP BY a),
       |tm AS (SELECT tr.a, tr.b, tr.cnt, tt.tot FROM tr JOIN tt USING (a)),
       |st AS (SELECT a AS state FROM tr UNION SELECT b FROM tr),
       |kk AS (SELECT CAST(count(*) AS BIGINT) AS k FROM st),
       |v0 AS (SELECT state, CAST($MarkovScale // k AS BIGINT) AS v
       |       FROM st CROSS JOIN kk),
       |$steps
       |SELECT state, v AS mass_micro,
       |       round(CAST(v AS DOUBLE) / $MarkovScale, 6) AS p
       |FROM v$MarkovIters""".stripMargin
  }

  // ---------------------------------------- CUSUM changepoint scan

  /** CUSUM changepoint detection over daily event volume — the
    * monitoring read that localizes WHEN a level shift happened (the
    * drift family says whether): S_t = Σ_{i≤t}(x_i − μ) peaks at the
    * shift boundary. Reported per day with the |S| maximizer flagged.
    *
    * Determinism: daily counts and their cumulative sums are exact
    * integers; μ = T/D and each S_t = cum_t − t·μ are the same IEEE
    * expression on both engines, rounded at the boundary; the flag
    * compares the rounded values so it cannot flap on a final ulp.
    * All windows run over the DAY histogram — calendar-bounded, the
    * `events_survival` class.
    */
  def changepoint(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables(spark, dir, "events")
      .groupBy(to_date($"ts").as("day"))
      .agg(count(lit(1)).as("n_events"))
    val tot = daily.agg(sum($"n_events").as("t"),
      count(lit(1)).as("d"))
    val wc = Window.orderBy($"day".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy()
    daily.crossJoin(broadcast(tot))
      .withColumn("rk", row_number().over(Window.orderBy($"day".asc)))
      .withColumn("cum", sum($"n_events").over(wc))
      .withColumn("cusum",
        round($"cum".cast("double") -
          $"rk".cast("double") *
            ($"t".cast("double") / $"d".cast("double")), 4))
      .withColumn("is_change",
        abs($"cusum") === max(abs($"cusum")).over(wAll))
      .select($"day", $"n_events", $"cusum", $"is_change")
  }

  val changepointSql: String =
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS n_events
      |  FROM events GROUP BY 1),
      |tot AS (SELECT CAST(sum(n_events) AS BIGINT) AS t,
      |               CAST(count(*) AS BIGINT) AS d FROM daily),
      |c AS (
      |  SELECT day, n_events,
      |         round(CAST(sum(n_events) OVER (ORDER BY day ASC
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |             AS DOUBLE) -
      |           CAST(row_number() OVER (ORDER BY day ASC) AS DOUBLE) *
      |             (CAST(t AS DOUBLE) / CAST(d AS DOUBLE)), 4) AS cusum
      |  FROM daily CROSS JOIN tot)
      |SELECT day, n_events, cusum,
      |       abs(cusum) = max(abs(cusum)) OVER () AS is_change
      |FROM c""".stripMargin

  // --------------------------------------------- Holt trend forecast

  private val HoltAlpha = 0.3
  private val HoltBeta = 0.1
  private val HoltHorizon = 7

  /** Holt linear exponential smoothing over daily event volume — the
    * capacity-planning read: fitted level per observed day plus a
    * 7-day-ahead linear forecast. ℓ_t = αx_t + (1−α)(ℓ_{t−1}+b_{t−1}),
    * b_t = β(ℓ_t−ℓ_{t−1}) + (1−β)b_{t−1}, initialized ℓ₁ = x₁,
    * b₁ = x₂ − x₁; forecast(h) = ℓ_n + h·b_n.
    *
    * The recurrence is inherently sequential, so it runs where
    * sequential is CORRECT at any corpus size: the corpus reduces to
    * the calendar-bounded day histogram first (map-side combined),
    * and only that tiny frame flows through a single ordered
    * partition — the `curate_loss_band` boundedness class, with the
    * same documented invariant. Cross-engine parity: inputs are exact
    * integer counts and both engines evaluate the identical IEEE
    * recurrence in the identical order (DuckDB as a recursive CTE),
    * rounded at the boundary. Under 2 observed days → empty frame on
    * both sides.
    */
  def forecast(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables(spark, dir, "events")
      .groupBy(to_date($"ts").as("day"))
      .agg(count(lit(1)).as("n"))
      .coalesce(1)
      .sortWithinPartitions($"day".asc)
      .as[(java.sql.Date, Long)]
    val out = daily.mapPartitions { it =>
      val xs = it.toArray
      if (xs.length < 2) Iterator.empty
      else {
        var l = xs(0)._2.toDouble
        var b = xs(1)._2.toDouble - xs(0)._2.toDouble
        val rows = Vector.newBuilder[(java.sql.Date, String, Double)]
        rows += ((xs(0)._1, "level", math.rint(l * 10000) / 10000))
        var t = 1
        while (t < xs.length) {
          val prevL = l
          l = HoltAlpha * xs(t)._2 + (1 - HoltAlpha) * (l + b)
          b = HoltBeta * (l - prevL) + (1 - HoltBeta) * b
          rows += ((xs(t)._1, "level", math.rint(l * 10000) / 10000))
          t += 1
        }
        val lastMs = xs.last._1.getTime
        (1 to HoltHorizon).foreach { h =>
          rows += ((new java.sql.Date(lastMs + h * 86400000L), "forecast",
            math.rint((l + h * b) * 10000) / 10000))
        }
        rows.result().iterator
      }
    }
    out.toDF("day", "kind", "value")
  }

  val forecastSql: String =
    s"""WITH RECURSIVE daily AS (
       |  SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS n,
       |         CAST(row_number() OVER (ORDER BY CAST(ts AS DATE) ASC)
       |           AS BIGINT) AS rn
       |  FROM events GROUP BY 1),
       |k AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM daily),
       |rec(rn, day, l, b) AS (
       |  SELECT d1.rn, d1.day, CAST(d1.n AS DOUBLE),
       |         CAST(d2.n AS DOUBLE) - CAST(d1.n AS DOUBLE)
       |  FROM daily d1 JOIN daily d2 ON d1.rn = 1 AND d2.rn = 2
       |  UNION ALL
       |  SELECT d.rn, d.day,
       |         $HoltAlpha * CAST(d.n AS DOUBLE) +
       |           (1 - $HoltAlpha) * (r.l + r.b),
       |         $HoltBeta * (($HoltAlpha * CAST(d.n AS DOUBLE) +
       |             (1 - $HoltAlpha) * (r.l + r.b)) - r.l) +
       |           (1 - $HoltBeta) * r.b
       |  FROM rec r JOIN daily d ON d.rn = r.rn + 1),
       |last AS (
       |  SELECT day, l, b FROM rec
       |  WHERE rn = (SELECT nd FROM k))
       |SELECT day, 'level' AS kind, round(l, 4) AS value FROM rec
       |UNION ALL
       |SELECT last.day + CAST(h AS INTEGER), 'forecast',
       |       round(l + CAST(h AS DOUBLE) * b, 4)
       |FROM last CROSS JOIN
       |  (SELECT unnest(generate_series(1, $HoltHorizon)) AS h)""".stripMargin

  // ---------------------------------------------- conversion attribution

  /** Multi-touch conversion attribution: every purchase is matched to the
    * user's view/click/signup touches in the preceding 7 days, and each
    * channel is credited three ways — first-touch, last-touch, and linear
    * (conversion credit split evenly across its k touches, held in
    * integer micro-credits `10⁶ div k` so both engines sum identically).
    * Purchases with no qualifying touch land in an explicit `(none)` row,
    * so total mass stays auditable.
    *
    * Shape at scale: the touch↔conversion match is the same declarative
    * user-equality + time-band join as `events_interval_join` (eligible
    * for the banding rule; without it, per-user hash join + filter). The
    * per-conversion windows partition on conv_id — never unpartitioned —
    * and both orderings carry the event-id tiebreak. Output is
    * |channels|+1 rows.
    */
  private val AttrLookback = "INTERVAL 7 DAYS"

  def attribution(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
    val conv = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("conv_id"),
        col("ts").as("conv_ts"))
    val touch = ev.where(col("event_type").isin("view", "click", "signup"))
      .select(col("user_id"), col("event_id").as("touch_id"),
        col("ts").as("touch_ts"), col("event_type").as("channel"))
    val pairs = conv.join(touch, Seq("user_id"))
      .where(col("touch_ts") < col("conv_ts") &&
        col("touch_ts") >= col("conv_ts") - expr(AttrLookback))
    val w = Window.partitionBy(col("conv_id"))
    val attributed = pairs
      .withColumn("rn_first", row_number().over(
        w.orderBy(col("touch_ts").asc, col("touch_id").asc)))
      .withColumn("rn_last", row_number().over(
        w.orderBy(col("touch_ts").desc, col("touch_id").desc)))
      .withColumn("k", count(lit(1)).over(w))
    val perChannel = attributed.groupBy(col("channel")).agg(
      sum(when(col("rn_first") === 1, 1L).otherwise(0L)).as("first_touch"),
      sum(when(col("rn_last") === 1, 1L).otherwise(0L)).as("last_touch"),
      sum(expr("1000000L div k")).as("linear_micros"))
    val unattributed = conv
      .join(pairs.select(col("conv_id")).distinct(), Seq("conv_id"),
        "left_anti")
      .agg(count(lit(1)).as("n"))
      .select(lit("(none)").as("channel"), col("n").as("first_touch"),
        col("n").as("last_touch"), lit(0L).as("linear_micros"))
    perChannel.unionAll(unattributed)
  }

  val attributionSql: String =
    """WITH conv AS (
      |  SELECT user_id, event_id AS conv_id, ts AS conv_ts
      |  FROM events WHERE event_type = 'purchase'),
      |t AS (
      |  SELECT user_id, event_id AS touch_id, ts AS touch_ts,
      |         event_type AS channel
      |  FROM events WHERE event_type IN ('view', 'click', 'signup')),
      |p AS (
      |  SELECT conv_id, channel, touch_ts, touch_id
      |  FROM conv JOIN t USING (user_id)
      |  WHERE touch_ts < conv_ts AND touch_ts >= conv_ts - INTERVAL 7 DAY),
      |r AS (
      |  SELECT channel,
      |         row_number() OVER (PARTITION BY conv_id
      |           ORDER BY touch_ts ASC, touch_id ASC) AS rn_first,
      |         row_number() OVER (PARTITION BY conv_id
      |           ORDER BY touch_ts DESC, touch_id DESC) AS rn_last,
      |         count(*) OVER (PARTITION BY conv_id) AS k
      |  FROM p)
      |SELECT channel,
      |       CAST(sum(CASE WHEN rn_first = 1 THEN 1 ELSE 0 END) AS BIGINT)
      |         AS first_touch,
      |       CAST(sum(CASE WHEN rn_last = 1 THEN 1 ELSE 0 END) AS BIGINT)
      |         AS last_touch,
      |       CAST(sum(1000000 // k) AS BIGINT) AS linear_micros
      |FROM r GROUP BY channel
      |UNION ALL
      |SELECT '(none)', n, n, 0
      |FROM (SELECT CAST(count(*) AS BIGINT) AS n FROM conv
      |      WHERE conv_id NOT IN (SELECT conv_id FROM p))""".stripMargin

  // ---------------------------------------------------------------------
  // Wald SPRT — always-valid sequential testing
  // ---------------------------------------------------------------------

  // H0: conversion (value ≥ 40) rate = 0.4; H1: rate = 0.5; α = β = 0.05.
  // Every transcendental is computed ONCE here and rendered as a LONG
  // micro-unit literal into both expression trees (the HLL-literal
  // move), so the running statistic is pure integer arithmetic.
  private val SprtStepSuccess = math.round(1e6 * math.log(0.5 / 0.4))
  private val SprtStepFailure = math.round(1e6 * math.log(0.5 / 0.6))
  private val SprtBound = math.round(1e6 * math.log(0.95 / 0.05)) // ln 19

  /** Wald's sequential probability ratio test per event type — the
    * always-valid alternative to the fixed-horizon A/B family
    * (`events_ab_proportions`): the log-likelihood ratio accrues one
    * integer step per event IN ARRIVAL ORDER and the test stops the
    * moment it exits (−ln 19, +ln 19), giving the earliest decision
    * the evidence supports at the declared error rates. Emits the
    * final LLR, the first crossing index, and the decision (or
    * `continue` for a walk still inside the corridor — the fixture's
    * ~0.45 rates sit between the hypotheses, so both outcomes occur).
    *
    * Determinism: steps and bounds are literal micro-longs, the
    * running sum is an exact LONG prefix sum over the (type, event_id)
    * order, and the first-crossing argmin is the pure-integer
    * `rn·4 + code` encoding — hash-exact end to end, no runtime
    * transcendentals.
    *
    * Scale shape — the naive plan is `Window.partitionBy(event_type)
    * .orderBy(event_id)` over RAW events: with ~6 event types the
    * whole corpus sorts in 6 tasks, the straggler shape the rest of
    * the registry avoids. Instead the walk rides [[ShardedPrefix]]
    * (the `stats_ks` decomposition): each row gets its exact GLOBAL
    * rn/LLR from a within-shard window plus broadcast entry offsets,
    * so crossing detection is embarrassingly parallel and the first
    * crossing is one min() reduce — every task sorts only its
    * event_id slab at any corpus size. (The streaming engine folds
    * the same statistic per arrival — the production SPRT path.)
    */
  def sprt(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
      .where(col("value").isNotNull)
      .select(col("event_type"), col("event_id"),
        when(col("value") >= 40.0, lit(SprtStepSuccess))
          .otherwise(lit(SprtStepFailure)).as("step"))
    val steps = ShardedPrefix.cumsum(spark, ev, Seq("event_type"),
        "event_id", Seq("step"), rnCol = Some("rn"))
      .withColumnRenamed("step_cum", "llr")
      .withColumn("cross_code",
        when(col("llr") >= SprtBound, col("rn") * 4 + 1)
          .when(col("llr") <= -SprtBound, col("rn") * 4 + 2))
    steps.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("step") === SprtStepSuccess, 1L).otherwise(0L))
          .as("n_success"),
        sum(col("step")).as("llr_final_micro"),
        min(col("cross_code")).as("cc"))
      .select(col("event_type"), col("n_events"), col("n_success"),
        col("llr_final_micro"),
        expr("cc div 4").as("cross_n"),
        when(col("cc") % 4 === 1, "reject_h0")
          .when(col("cc") % 4 === 2, "accept_h0")
          .otherwise("continue").as("decision"))
  }

  val sprtSql: String =
    s"""WITH steps AS (
       |  SELECT event_type, event_id,
       |         CASE WHEN value >= 40.0 THEN $SprtStepSuccess
       |              ELSE $SprtStepFailure END AS step
       |  FROM events WHERE value IS NOT NULL
       |), walk AS (
       |  SELECT event_type, step,
       |         CAST(row_number() OVER (PARTITION BY event_type
       |                                 ORDER BY event_id) AS BIGINT) AS rn,
       |         CAST(sum(step) OVER (PARTITION BY event_type
       |                              ORDER BY event_id) AS BIGINT) AS llr
       |  FROM steps
       |), coded AS (
       |  SELECT event_type, step, llr,
       |         CASE WHEN llr >= $SprtBound THEN rn * 4 + 1
       |              WHEN llr <= -$SprtBound THEN rn * 4 + 2 END AS cross_code
       |  FROM walk
       |)
       |SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
       |       CAST(sum(CASE WHEN step = $SprtStepSuccess THEN 1 ELSE 0 END)
       |         AS BIGINT) AS n_success,
       |       CAST(sum(step) AS BIGINT) AS llr_final_micro,
       |       CAST(min(cross_code) AS BIGINT) // 4 AS cross_n,
       |       CASE WHEN min(cross_code) % 4 = 1 THEN 'reject_h0'
       |            WHEN min(cross_code) % 4 = 2 THEN 'accept_h0'
       |            ELSE 'continue' END AS decision
       |FROM coded GROUP BY event_type""".stripMargin

  // ---------------------------------------------------------------------
  // CUSUM control chart — sequential shift detection
  // ---------------------------------------------------------------------

  // Reference value k = (μ0 + μ1)/2 for μ0 = 50, target shift μ1 = 60;
  // decision interval h = 1000.0. Micro-unit literals (the SPRT
  // discipline) so the whole chart is exact integer arithmetic.
  private val CusumK = 55000000L
  private val CusumH = 1000000000L

  /** One-sided upper CUSUM control chart per event type — Page's
    * sequential shift detector, the complement of [[sprt]]'s
    * fixed-hypotheses test: S_i = max(0, S_{i−1} + (x_i − k)) accrues
    * only sustained upward drift past the reference k and alarms at
    * S ≥ h. Emits per type the final/max statistic and the FIRST alarm
    * index (the chart's decision), with the fixture's parameters
    * splitting types into alarmed and calm.
    *
    * Scale shape — the max(0, ·) recursion looks inherently
    * sequential, but the reflection identity S_i = P_i − min(0,
    * min_{j≤i} P_j) (P = plain prefix sums of x − k) turns it into a
    * running SUM plus a running MIN of that sum — both decomposable,
    * so the whole chart rides [[ShardedPrefix.cumsumWithMin]]: no task
    * ever sorts more than its event_id slab, parallelism scales with
    * shard count, not |event_types| (the `events_sprt` fix applied
    * from birth). Everything is micro-unit LONGs; alarm detection is
    * per-row once the global (cum, cummin) pair lands, and the first
    * alarm is one min() reduce.
    */
  def cusum(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
      .where(col("value").isNotNull)
      .select(col("event_type"), col("event_id"),
        (floor(col("value") * lit(1000000.0) + lit(0.5)).cast("long") -
          CusumK).as("y"))
    val walk = ShardedPrefix.cumsumWithMin(spark, ev, Seq("event_type"),
        "event_id", "y")
      .withColumn("s", col("cum") - least(col("cummin"), lit(0L)))
      .withColumn("alarm_rn", when(col("s") >= CusumH, col("rn")))
    walk.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        max_by(col("s"), col("rn")).as("s_final"),
        max(col("s")).as("s_max"),
        min(col("alarm_rn")).as("first_alarm_n"))
      .withColumn("alarmed", col("first_alarm_n").isNotNull)
  }

  val cusumSql: String =
    s"""WITH steps AS (
       |  SELECT event_type, event_id,
       |         CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) - $CusumK AS y
       |  FROM events WHERE value IS NOT NULL
       |), w1 AS (
       |  SELECT event_type, y,
       |         CAST(row_number() OVER (PARTITION BY event_type
       |                                 ORDER BY event_id) AS BIGINT) AS rn,
       |         CAST(sum(y) OVER (PARTITION BY event_type
       |                           ORDER BY event_id) AS BIGINT) AS p
       |  FROM steps
       |), w2 AS (
       |  SELECT event_type, rn, p,
       |         CAST(min(p) OVER (PARTITION BY event_type
       |                           ORDER BY rn) AS BIGINT) AS pmin
       |  FROM w1
       |), s AS (
       |  SELECT event_type, rn,
       |         p - least(pmin, CAST(0 AS BIGINT)) AS s
       |  FROM w2
       |)
       |SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
       |       CAST(arg_max(s, rn) AS BIGINT) AS s_final,
       |       CAST(max(s) AS BIGINT) AS s_max,
       |       CAST(min(CASE WHEN s >= $CusumH THEN rn END) AS BIGINT)
       |         AS first_alarm_n,
       |       min(CASE WHEN s >= $CusumH THEN rn END) IS NOT NULL AS alarmed
       |FROM s GROUP BY event_type""".stripMargin

  /** Windowed funnel (the ClickHouse `windowFunnel` semantics, distinct
    * from [[funnel]]'s first-event chaining): a user's LEVEL is the
    * deepest view → click → purchase chain that completes within
    * `WindowFunnelDays` of the chain's own STARTING view — any view
    * can start a chain (exists-quantified), so a user whose first
    * view's window expired still levels up off a later view. Exactness
    * of the greedy reduction: for a chain start v, the EARLIEST click
    * in (v, v+W] leaves the widest purchase window, and any purchase
    * after a later click is also after the earliest one — so
    * min-click-per-start preserves the exists-semantics exactly.
    * Levels report as a per-level user histogram (max level per user).
    *
    * Scale shape: stage filters push to the scan; the chain joins are
    * user-keyed with the W-day band bounding fan-out (the
    * `events_attribution` economics) and reduce per (user, start)
    * before the next stage; the histogram is a 3-row frame.
    */
  def windowFunnel(spark: SparkSession, dir: String): DataFrame = {
    val W = expr(s"INTERVAL $WindowFunnelDays DAYS")
    val ev = Tables(spark, dir, "events")
    val v = ev.where(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("v_ts"))
    val c2 = ev.where(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("c_ts"))
      .join(v, Seq("user_id"))
      .where(col("c_ts") > col("v_ts") && col("c_ts") <= col("v_ts") + W)
      .groupBy(col("user_id"), col("v_ts")).agg(min(col("c_ts")).as("c_ts"))
    val p3 = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"))
      .join(c2, Seq("user_id"))
      .where(col("p_ts") > col("c_ts") && col("p_ts") <= col("v_ts") + W)
    val u1 = v.select("user_id").distinct()
      .agg(count(lit(1)).as("n1"))
    val u2 = c2.select("user_id").distinct()
      .agg(count(lit(1)).as("n2"))
    val u3 = p3.select("user_id").distinct()
      .agg(count(lit(1)).as("n3"))
    val wide = broadcast(u1).crossJoin(broadcast(u2)).crossJoin(broadcast(u3))
    val levels = wide.select(lit(1L).as("level"),
        (col("n1") - col("n2")).as("n_users"), col("n1"))
      .unionAll(wide.select(lit(2L), col("n2") - col("n3"), col("n1")))
      .unionAll(wide.select(lit(3L), col("n3"), col("n1")))
    levels.select(col("level"), col("n_users"),
      round(col("n_users").cast("double") /
        nullif(col("n1"), lit(0L)).cast("double"), 6).as("share_of_viewers"))
  }

  private val WindowFunnelDays = 7

  val windowFunnelSql: String =
    s"""WITH v AS (
       |  SELECT user_id, ts AS v_ts FROM events WHERE event_type = 'view'
       |), c2 AS (
       |  SELECT c.user_id, v.v_ts, min(c.ts) AS c_ts
       |  FROM events c JOIN v ON v.user_id = c.user_id
       |  WHERE c.event_type = 'click' AND c.ts > v.v_ts
       |    AND c.ts <= v.v_ts + INTERVAL $WindowFunnelDays DAY
       |  GROUP BY 1, 2
       |), p3 AS (
       |  SELECT p.user_id
       |  FROM events p JOIN c2 ON c2.user_id = p.user_id
       |  WHERE p.event_type = 'purchase' AND p.ts > c2.c_ts
       |    AND p.ts <= c2.v_ts + INTERVAL $WindowFunnelDays DAY
       |), n AS (
       |  SELECT (SELECT CAST(count(DISTINCT user_id) AS BIGINT) FROM v) AS n1,
       |         (SELECT CAST(count(DISTINCT user_id) AS BIGINT) FROM c2) AS n2,
       |         (SELECT CAST(count(DISTINCT user_id) AS BIGINT) FROM p3) AS n3
       |), levels AS (
       |  SELECT CAST(1 AS BIGINT) AS level, n1 - n2 AS n_users, n1 FROM n
       |  UNION ALL SELECT 2, n2 - n3, n1 FROM n
       |  UNION ALL SELECT 3, n3, n1 FROM n
       |)
       |SELECT level, n_users,
       |       round(CAST(n_users AS DOUBLE) /
       |             CAST(nullif(n1, 0) AS DOUBLE), 6) AS share_of_viewers
       |FROM levels""".stripMargin

  val ops: Seq[Op] = Seq(
    Op("events_window_funnel", windowFunnel _, Some(windowFunnelSql)),
    Op("events_cusum", cusum _, Some(cusumSql)),
    Op("events_sprt", sprt _, Some(sprtSql)),
    Op("events_attribution", attribution _, Some(attributionSql)),
    Op("events_forecast", forecast _, Some(forecastSql)),
    Op("events_changepoint", changepoint _, Some(changepointSql)),
    Op("events_markov_stationary", markovStationary _,
      Some(markovStationarySql)),
    Op("events_survival", survival _, Some(survivalSql)),
    Op("events_ab_proportions", abProportions _, Some(abProportionsSql)),
    Op("events_cuped", cuped _, Some(cupedSql)),
    Op("events_rfm", rfm _, Some(rfmSql)),
    Op("events_rfm_sketch", rfmSketch _, None),
    Op("events_rfm_sketch_check", rfmSketchCheck _, Some(rfmSketchCheckSql)),
    Op("events_ab_srm", abSrm _, Some(abSrmSql)),
    Op("events_sequence_examples", sequenceExamples _,
      Some(sequenceExamplesSql)),
    Op("events_hourly", hourly _, Some(hourlySql)),
    // exactness contract: the closed-partition incremental path must
    // reproduce the full rollup bit-for-bit — shares hourlySql verbatim
    Op("events_hourly_incremental", hourlyIncremental _, Some(hourlySql)),
    Op("events_heavy_hitters", heavyHitters _, Some(heavyHittersSql)),
    Op("events_gapfill", gapfill _, Some(gapfillSql)),
    Op("events_gapfill_locf", gapfillLocf _, Some(gapfillLocfSql)),
    Op("events_funnel_latency", funnelLatency _, Some(funnelLatencySql)),
    Op("events_cooccurrence", cooccurrence _, Some(cooccurrenceSql)),
    Op("events_active_users", activeUsers _, Some(activeUsersSql)),
    Op("events_stickiness", stickiness _, Some(stickinessSql)),
    Op("events_wau_sketch", wauSketch _, None),
    Op("events_wau_sketch_check", wauSketchCheck _, Some(wauSketchCheckSql)),
    Op("events_seasonal", seasonal _, Some(seasonalSql)),
    Op("events_outliers_mad", outliersMad _, Some(outliersMadSql)),
    Op("events_funnel", funnel _, Some(funnelSql)),
    Op("events_transitions", transitions _, Some(transitionsSql)),
    Op("events_retention", retention _, Some(retentionSql)),
    Op("events_outliers", outliers _, Some(outliersSql)),
    Op("events_sessionize", sessionize _, Some(sessionizeSql)),
    Op("events_json_extract", jsonExtract _, Some(jsonExtractSql)),
    Op("events_interval_join", intervalJoin _, Some(intervalJoinSql)),
  )
}
