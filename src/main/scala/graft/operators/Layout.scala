package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Op, Tables}

/** Physical-layout analytics: quantifies what multi-dimensional
  * clustering buys at the file level — the data-layout decision that
  * dominates scan cost at 100 TB (Delta/Iceberg OPTIMIZE ZORDER,
  * Hudi clustering; Morton 1966 for the curve itself).
  *
  * A parquet lake prunes files by per-file min/max stats. Files written
  * in ingest order are tight on the ingest key and useless on every
  * other predicate column: each file spans ~the full value range of
  * `l_partkey` AND `l_suppkey`, so a point predicate on either key
  * scans every file. Z-ordering interleaves the bits of both keys so
  * each file covers a small RECTANGLE of the (partkey, suppkey) grid —
  * min/max pruning then works on both columns at once.
  *
  * `layout_zorder` measures exactly that: it buckets lineitem once by
  * Z-value and once by ingest order (l_orderkey ranges) into the same
  * number of "files", and reports each bucket's fractional span of both
  * key ranges — the expected fraction of buckets a min/max-pruned point
  * query must read. The spec pins the headline: mean Z-bucket span is a
  * small fraction of the mean natural-bucket span on BOTH keys.
  *
  * Exactness/parity: keys are grid-normalized with pure integer
  * arithmetic (`(k - min) * G div (range)`), the Morton interleave is a
  * sum of disjoint shifted bits generated from ONE Scala template into
  * both engines' SQL (`<<`/`>>`/`&` behave identically on BIGINT), and
  * span fractions are exact integer spans divided once at the DOUBLE
  * boundary. Scale shape: one 1-row bound frame broadcast over the
  * scan, one codegen'd projection computing z, two map-side-combined
  * aggregations to ≤`Buckets` rows each. No sort — bucketing is by
  * VALUE range, not row_number, so the plan has no global ordering
  * stage (the thing that makes real OPTIMIZE ZORDER jobs cheap: range
  * partition + local sort, never a total order).
  */
object Layout {

  /** Grid resolution per key (2^8 cells) — z occupies 16 bits. */
  private val GridBits = 8
  /** Simulated file count per layout; each z-bucket is a 32x32 grid
    * rectangle (16 - 6 = 10 z-bits per bucket → 2^5 cells per axis). */
  private val Buckets = 64

  /** Morton interleave as engine-neutral SQL: bit i of x lands at
    * 2i, bit i of y at 2i+1. Disjoint bits, so `+` is `|`. */
  private[graft] def zExprSql(x: String, y: String): String =
    (0 until GridBits).flatMap(i => Seq(
      s"((($x >> $i) & 1) << ${2 * i})",
      s"((($y >> $i) & 1) << ${2 * i + 1})")).mkString(" + ")

  private val Grid = 1 << GridBits              // 256
  private val ZRange = 1L << (2 * GridBits)     // 65536
  private val ZPerBucket = ZRange / Buckets     // 1024

  def zorderReport(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"))
    val b = li.agg(
      min(col("l_partkey")).as("pmin"), max(col("l_partkey")).as("pmax"),
      min(col("l_suppkey")).as("smin"), max(col("l_suppkey")).as("smax"),
      min(col("l_orderkey")).as("omin"), max(col("l_orderkey")).as("omax"))
    val t = li.crossJoin(broadcast(b))
      .withColumn("gx",
        expr(s"((l_partkey - pmin) * $Grid) div (pmax - pmin + 1)"))
      .withColumn("gy",
        expr(s"((l_suppkey - smin) * $Grid) div (smax - smin + 1)"))
      // the tested 21-bit interleave from the lake writer; on 8-bit
      // grid inputs its value equals zExprSql's 16-bit chain exactly
      // (high bits are zero), so oracle parity is by construction
      .withColumn("z", graft.sources.ZOrder.zvalue(col("gx"), col("gy")))
      .withColumn("zbucket", expr(s"z div $ZPerBucket"))
      .withColumn("nbucket",
        expr(s"((l_orderkey - omin) * $Buckets) div (omax - omin + 1)"))
    def stats(df: DataFrame, layout: String, bucket: String): DataFrame =
      df.groupBy(col(bucket).as("bucket"))
        .agg(count(lit(1)).as("n_rows"),
          min(col("l_partkey")).as("bp0"), max(col("l_partkey")).as("bp1"),
          min(col("l_suppkey")).as("bs0"), max(col("l_suppkey")).as("bs1"))
        .crossJoin(broadcast(b))
        .select(lit(layout).as("layout"), col("bucket"), col("n_rows"),
          round((col("bp1") - col("bp0") + 1).cast("double") /
            (col("pmax") - col("pmin") + 1).cast("double"), 6)
            .as("part_span_frac"),
          round((col("bs1") - col("bs0") + 1).cast("double") /
            (col("smax") - col("smin") + 1).cast("double"), 6)
            .as("supp_span_frac"))
    stats(t, "zorder", "zbucket")
      .unionByName(stats(t, "natural", "nbucket"))
  }

  val zorderReportSql: String = {
    val z = zExprSql("gx", "gy")
    def stats(layout: String, bucket: String): String =
      s"""SELECT '$layout' AS layout, $bucket AS bucket,
         |       count(*) AS n_rows,
         |       round(CAST(max(l_partkey) - min(l_partkey) + 1 AS DOUBLE) /
         |             CAST(max(pmax) - max(pmin) + 1 AS DOUBLE), 6)
         |         AS part_span_frac,
         |       round(CAST(max(l_suppkey) - min(l_suppkey) + 1 AS DOUBLE) /
         |             CAST(max(smax) - max(smin) + 1 AS DOUBLE), 6)
         |         AS supp_span_frac
         |FROM t GROUP BY 1, 2""".stripMargin
    s"""WITH b AS (
       |  SELECT min(l_partkey) AS pmin, max(l_partkey) AS pmax,
       |         min(l_suppkey) AS smin, max(l_suppkey) AS smax,
       |         min(l_orderkey) AS omin, max(l_orderkey) AS omax
       |  FROM lineitem
       |), g AS (
       |  SELECT l_orderkey, l_partkey, l_suppkey,
       |         pmin, pmax, smin, smax, omin, omax,
       |         ((l_partkey - pmin) * $Grid) // (pmax - pmin + 1) AS gx,
       |         ((l_suppkey - smin) * $Grid) // (smax - smin + 1) AS gy
       |  FROM lineitem CROSS JOIN b
       |), t AS (
       |  SELECT *,
       |         ($z) // $ZPerBucket AS zbucket,
       |         ((l_orderkey - omin) * $Buckets) // (omax - omin + 1)
       |           AS nbucket
       |  FROM g
       |)
       |${stats("zorder", "zbucket")}
       |UNION ALL
       |${stats("natural", "nbucket")}""".stripMargin
  }

  // ------------------------------------------ partition-key advisor

  /** Partition-key advisor: for every candidate partition column the
    * lake could be laid out by, the statistics that decide the choice —
    * partition count, row balance (max/avg skew ratio), and how many
    * partitions would be degenerate small files. The three failure
    * modes this catches are the classic ones at 100 TB: too MANY
    * partitions (metadata blowup + small files), too FEW (no pruning),
    * and skew (one hot partition serializes the stage). The verdict
    * column encodes the standard decision rule; thresholds are named
    * constants.
    *
    * Exact integer counts end-to-end (one map-side-combined reduce per
    * candidate, |values| rows each); only the skew ratio crosses the
    * DOUBLE boundary, rounded once. `n_tiny` uses a fixture-scaled
    * row floor — production swaps `TinyRows` for bytes-based sizing
    * against the target file size, same plan shape.
    */
  private val TinyRows = 50L
  private val MaxPartitions = 1000L
  private val MaxSkew = 4.0

  def partitionStats(spark: SparkSession, dir: String): DataFrame = {
    def statsOf(df: DataFrame, keyExpr: String, entity: String)
        : DataFrame = {
      val counts = df.groupBy(expr(keyExpr).as("k"))
        .agg(count(lit(1)).as("c"))
      counts.agg(count(lit(1)).as("n_partitions"),
        sum(col("c")).as("n_rows"),
        min(col("c")).as("min_rows"), max(col("c")).as("max_rows"))
        .select(lit(entity).as("entity"), col("n_partitions"),
          col("n_rows"), col("min_rows"), col("max_rows"),
          round(col("n_rows").cast("double") /
            col("n_partitions").cast("double"), 6).as("avg_rows"),
          round(col("max_rows").cast("double") *
            col("n_partitions").cast("double") /
            col("n_rows").cast("double"), 6).as("skew_ratio"))
        .crossJoin(broadcast(
          counts.where(col("c") < TinyRows)
            .agg(count(lit(1)).as("n_tiny"))))
        .withColumn("verdict",
          when(col("n_partitions") > MaxPartitions, lit("too_many"))
            .when(col("skew_ratio") > MaxSkew, lit("skewed"))
            .otherwise(lit("ok")))
    }
    statsOf(Tables(spark, dir, "documents"), "source", "documents.source")
      .unionByName(statsOf(Tables(spark, dir, "documents"), "lang",
        "documents.lang"))
      .unionByName(statsOf(Tables(spark, dir, "events"), "event_type",
        "events.event_type"))
      .unionByName(statsOf(Tables(spark, dir, "events"),
        "cast(ts as date)", "events.day"))
  }

  val partitionStatsSql: String = {
    def one(table: String, key: String, entity: String): String =
      s"""SELECT '$entity' AS entity,
         |       CAST(count(*) AS BIGINT) AS n_partitions,
         |       CAST(sum(c) AS BIGINT) AS n_rows,
         |       CAST(min(c) AS BIGINT) AS min_rows,
         |       CAST(max(c) AS BIGINT) AS max_rows,
         |       round(CAST(sum(c) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
         |         AS avg_rows,
         |       round(CAST(max(c) AS DOUBLE) * CAST(count(*) AS DOUBLE) /
         |             CAST(sum(c) AS DOUBLE), 6) AS skew_ratio,
         |       CAST(sum(CASE WHEN c < $TinyRows THEN 1 ELSE 0 END)
         |            AS BIGINT) AS n_tiny,
         |       CASE WHEN count(*) > $MaxPartitions THEN 'too_many'
         |            WHEN round(CAST(max(c) AS DOUBLE) *
         |                       CAST(count(*) AS DOUBLE) /
         |                       CAST(sum(c) AS DOUBLE), 6) > $MaxSkew
         |              THEN 'skewed'
         |            ELSE 'ok' END AS verdict
         |FROM (SELECT $key AS k, count(*) AS c FROM $table GROUP BY 1)"""
        .stripMargin
    Seq(one("documents", "source", "documents.source"),
      one("documents", "lang", "documents.lang"),
      one("events", "event_type", "events.event_type"),
      one("events", "CAST(ts AS DATE)", "events.day"))
      .mkString("\nUNION ALL\n")
  }

  // ------------------------------------------- compaction planner

  /** Small-file compaction plan — the OPTIMIZE/rewrite job's input: the
    * events lake's daily files greedily coalesced, in day order, into
    * merge groups of ~`CompactTargetRows` rows each (the `curate_pack`
    * running-sum convention: group = cumulative rows BEFORE the file,
    * integer-divided by the target — a file straddling a boundary joins
    * the earlier group, so groups can overshoot by at most one file,
    * never undershoot fragmented). Greedy-in-order is the production
    * choice on purpose: merge groups stay CONTIGUOUS day ranges, so
    * compacted files still prune on date predicates.
    *
    * Output: one row per merge group with file count, row total and the
    * day range it covers. The running sum is one ordered window over
    * the |days| frame (corpus already reduced); at 100 TB the window
    * shards by month exactly like `curate_pack` shards packing — same
    * plan, month-prefixed group ids.
    */
  private val CompactTargetRows = 2000L

  def compactionPlan(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables(spark, dir, "events")
      .groupBy(expr("cast(ts as date)").as("d"))
      .agg(count(lit(1)).as("n_rows"))
    val w = Window.orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, -1)
    daily
      .withColumn("before", coalesce(sum(col("n_rows")).over(w), lit(0L)))
      .withColumn("group_id", expr(s"before div $CompactTargetRows"))
      .groupBy(col("group_id"))
      .agg(count(lit(1)).as("n_files"), sum(col("n_rows")).as("total_rows"),
        min(col("d")).as("first_day"), max(col("d")).as("last_day"))
  }

  val compactionPlanSql: String =
    s"""WITH daily AS (
       |  SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS n_rows
       |  FROM events GROUP BY 1
       |), cum AS (
       |  SELECT d, n_rows,
       |         COALESCE(CAST(sum(n_rows) OVER (ORDER BY d
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
       |           AS BIGINT), 0) AS before
       |  FROM daily
       |)
       |SELECT before // $CompactTargetRows AS group_id,
       |       CAST(count(*) AS BIGINT) AS n_files,
       |       CAST(sum(n_rows) AS BIGINT) AS total_rows,
       |       min(d) AS first_day, max(d) AS last_day
       |FROM cum GROUP BY 1""".stripMargin

  val ops: Seq[Op] = Seq(
    Op("layout_zorder", zorderReport _, Some(zorderReportSql)),
    Op("layout_partition_stats", partitionStats _, Some(partitionStatsSql)),
    Op("layout_compaction_plan", compactionPlan _, Some(compactionPlanSql)))
}
