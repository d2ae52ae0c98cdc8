package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.ArrayType

/** House sharded prefix-sum: exact global inclusive running sums (and
  * optionally an exact global row number) over (groupCols, orderCol)
  * WITHOUT a per-group corpus-sized window.
  *
  * The naive plan for a running sum partitioned by a low-cardinality
  * key (event type, source, …) sorts the whole corpus in |groups|
  * tasks — the straggler shape that kills a 1000-executor job. The
  * decomposition (introduced by `stats_ks`'s `pooledCums`, shared here
  * for `events_sprt` / `text_vocab_growth` / `text_zipf`):
  *
  *  1. range-bin rows on deterministic approx-percentile cut points of
  *     `orderCol` (collected once, metadata-sized, rendered as
  *     literals) — equal order values always land in the SAME shard,
  *     and the cuts only decide WHERE shards split, never the sums;
  *  2. run the window inside (groupCols, shard) — every task sorts
  *     only its slab at any corpus size;
  *  3. per-(group, shard) totals → shard ENTRY offsets via a
  *     triangular self-join on the ≤ |groups|·numPartitions totals
  *     frame, broadcast back;
  *  4. global value = entry offset + local prefix.
  *
  * Contract: `sumCols` must be non-null (coalesce before calling);
  * `orderCol` must be numeric OR string. A string key range-bins on an
  * ORDER-PRESERVING numeric proxy — the first three codepoints packed
  * into 21-bit fields (UTF-8 byte order equals codepoint order, so the
  * proxy is monotone under Spark's binary string comparison; ≥ 4096
  * distinct bins for hex keys) — and the percentile cuts run on the
  * proxy. Coarseness is harmless by construction: cuts only decide
  * WHERE shards split, the within-shard window still orders by the
  * real string, and equal strings always share a proxy. Ties in
  * `orderCol` within a group make row_number order nondeterministic
  * exactly as the naive window would — pass `tiebreaks` to pin it.
  * The binned frame is eagerly localCheckpoint-ed by default: it feeds
  * both the window branch and the totals branch, so the checkpoint
  * caps input passes at one (plus the one-row cuts aggregate).
  * MEASURED tradeoff (SpProbe, events cumsum, local[32] NVMe):
  * materialize 1.63 s vs recompute 2.43 s at sf0.1, 1.84 vs 2.65 at
  * sf1 — the write is cheaper than re-running the scan+projection for
  * the second consumer at every measured scale, so eager stays the
  * default; `materialize = false` is the explicit knob for
  * deployments where executor disk, not input bandwidth, is the
  * constraint (e.g. a twice-scannable columnar source on saturated
  * local disks).
  */
object ShardedPrefix {
  def cumsum(spark: SparkSession, df: DataFrame, groupCols: Seq[String],
      orderCol: String, sumCols: Seq[String],
      rnCol: Option[String] = None,
      tiebreaks: Seq[Column] = Nil,
      materialize: Boolean = true): DataFrame = {
    val parts = spark.sessionState.conf.numShufflePartitions
    val fracs = (1 until parts).map(i => i.toDouble / parts)
    // string keys bin on the order-preserving codepoint-prefix proxy
    // (see the scaladoc contract); numeric keys bin on themselves
    val isString = df.schema(orderCol).dataType ==
      org.apache.spark.sql.types.StringType
    val ordExpr: Column =
      if (!isString) col(orderCol)
      else (0 until 3).map(i =>
        coalesce(ascii(substring(col(orderCol), i + 1, 1)).cast("long"),
          lit(0L)) * lit(1L << (21 * (2 - i)))).reduce(_ + _)
    val binDt =
      if (isString) org.apache.spark.sql.types.LongType
      else df.schema(orderCol).dataType
    // null cuts = EMPTY input (approx_percentile of zero rows): fall
    // through to a single shard so the op returns empty, not an NPE —
    // the first-batch-of-a-new-pipeline contract. Same degradation when
    // shuffle.partitions <= 1: fracs is empty and the rendered
    // approx_percentile(ord, array(), _) would fail analysis (ARRAY<NULL>
    // percentage arg), so skip the percentile pass and bin to one shard.
    val cutVals: Seq[Any] =
      if (fracs.isEmpty) Nil
      else {
        val cutRow = df.agg(percentile_approx(ordExpr,
          array(fracs.map(lit): _*), lit(10000)).as("cuts")).head()
        if (cutRow.isNullAt(0)) Nil else cutRow.getSeq[Any](0)
      }
    val cutArr =
      if (cutVals.isEmpty) array().cast(ArrayType(binDt))
      else array(cutVals.map(lit): _*)
    val binnedLazy = df.withColumn("_sp_pid",
      size(filter(cutArr, c => c < ordExpr)).cast("int"))
    val binned = if (materialize) binnedLazy.localCheckpoint() else binnedLazy
    val partCols = (groupCols :+ "_sp_pid").map(col)
    val w = Window.partitionBy(partCols: _*)
      .orderBy(col(orderCol).asc +: tiebreaks: _*)
    val local = {
      var b = binned
      for (c <- sumCols) b = b.withColumn(s"_sp_l_$c", sum(col(c)).over(w))
      for (_ <- rnCol)
        b = b.withColumn("_sp_lrn", row_number().over(w).cast("long"))
      b
    }
    val totals = binned.groupBy(partCols: _*)
      .agg(count(lit(1)).as("_sp_tc"),
        sumCols.map(c => sum(col(c)).as(s"_sp_t_$c")): _*)
    val joinCond = groupCols
      .map(g => col(s"a.$g") === col(s"b.$g"))
      .foldLeft(col("b._sp_pid") < col("a._sp_pid"))(_ && _)
    val offsets = totals.as("a").join(totals.as("b"), joinCond, "left")
      .groupBy(groupCols.map(g => col(s"a.$g").as(g)) :+
        col("a._sp_pid").as("_sp_pid"): _*)
      .agg(coalesce(sum(col("b._sp_tc")), lit(0L)).as("_sp_oc"),
        sumCols.map(c =>
          coalesce(sum(col(s"b._sp_t_$c")), lit(0L)).as(s"_sp_o_$c")): _*)
    val joined = local.join(broadcast(offsets), groupCols :+ "_sp_pid")
    val out = {
      var b = joined
      for (c <- sumCols)
        b = b.withColumn(s"${c}_cum", col(s"_sp_o_$c") + col(s"_sp_l_$c"))
      for (r <- rnCol) b = b.withColumn(r, col("_sp_oc") + col("_sp_lrn"))
      b
    }
    out.drop(Seq("_sp_pid", "_sp_oc", "_sp_lrn") ++
      sumCols.flatMap(c => Seq(s"_sp_l_$c", s"_sp_t_$c", s"_sp_o_$c")): _*)
  }

  /** Exact global running sum AND running min-of-that-sum over
    * (groupCols, orderCol) — the pair the CUSUM identity needs
    * (S_i = P_i − min(0, min_{j≤i} P_j) turns the max(0, ·) recursion
    * into two decomposable scans). Same sharding as [[cumsum]]; the
    * extra piece is the running-min offsets: within a shard the global
    * prefix is `entrySum + localCum`, so its within-shard running min
    * is `entrySum + runningMin(localCum)`, and a shard's ENTRY min is
    * `min over earlier shards t of (entrySum_t + minTotal_t)` —
    * computed on the ≤ |groups|·numPartitions totals frame in two tiny
    * triangular joins. Returns the input + `rn` (global row number) +
    * `cum` (global inclusive running sum of `stepCol`) + `cummin`
    * (global inclusive running min of `cum`). `stepCol` must be
    * non-null.
    */
  def cumsumWithMin(spark: SparkSession, df: DataFrame,
      groupCols: Seq[String], orderCol: String,
      stepCol: String): DataFrame = {
    val parts = spark.sessionState.conf.numShufflePartitions
    val fracs = (1 until parts).map(i => i.toDouble / parts)
    // same empty-input / single-partition degradation as [[cumsum]]
    val cutVals: Seq[Any] =
      if (fracs.isEmpty) Nil
      else {
        val cutRow = df.agg(expr(
          s"approx_percentile($orderCol, array(${fracs.mkString(", ")}), 10000)")
          .as("cuts")).head()
        if (cutRow.isNullAt(0)) Nil else cutRow.getSeq[Any](0)
      }
    val cutArr =
      if (cutVals.isEmpty)
        array().cast(ArrayType(df.schema(orderCol).dataType))
      else array(cutVals.map(lit): _*)
    val binned = df.withColumn("_sp_pid",
      size(filter(cutArr, c => c < col(orderCol))).cast("int"))
      .localCheckpoint()
    val partCols = (groupCols :+ "_sp_pid").map(col)
    val w = Window.partitionBy(partCols: _*).orderBy(col(orderCol).asc)
    val local = binned
      .withColumn("_sp_lrn", row_number().over(w).cast("long"))
      .withColumn("_sp_lcum", sum(col(stepCol)).over(w))
      .withColumn("_sp_lmin", min(col("_sp_lcum")).over(w))
    // totals carry the shard's row count, step sum, and min local cum
    // (= the last row's running min) — derived from `local` so the
    // window runs once; the frame is shard-count-sized
    val totals = local.groupBy(partCols: _*)
      .agg(count(lit(1)).as("_sp_tc"), sum(col(stepCol)).as("_sp_ts"),
        min(col("_sp_lcum")).as("_sp_tmin"))
      .localCheckpoint()
    def tri(a: DataFrame, b: DataFrame) = a.as("a").join(b.as("b"),
      groupCols.map(g => col(s"a.$g") === col(s"b.$g"))
        .foldLeft(col("b._sp_pid") < col("a._sp_pid"))(_ && _), "left")
    // pass 1: entry sum offsets (order-free sums over earlier shards)
    val entry = tri(totals, totals)
      .groupBy(groupCols.map(g => col(s"a.$g").as(g)) :+
        col("a._sp_pid").as("_sp_pid"): _*)
      .agg(coalesce(sum(col("b._sp_tc")), lit(0L)).as("_sp_oc"),
        coalesce(sum(col("b._sp_ts")), lit(0L)).as("_sp_os"),
        first(col("a._sp_tmin")).as("_sp_tmin"))
    // pass 2: entry MIN offsets need each earlier shard's own entry
    // sum, so they join the pass-1 frame against itself
    val offsets = tri(entry, entry)
      .groupBy(groupCols.map(g => col(s"a.$g").as(g)) :+
        col("a._sp_pid").as("_sp_pid"): _*)
      .agg(first(col("a._sp_oc")).as("_sp_oc"),
        first(col("a._sp_os")).as("_sp_os"),
        min(col("b._sp_os") + col("b._sp_tmin")).as("_sp_omin"))
    local.join(broadcast(offsets), groupCols :+ "_sp_pid")
      .withColumn("rn", col("_sp_oc") + col("_sp_lrn"))
      .withColumn("cum", col("_sp_os") + col("_sp_lcum"))
      // least() skips NULLs, so shard 0 (no earlier shards, NULL entry
      // min) degrades to the within-shard running min alone
      .withColumn("cummin",
        least(col("_sp_omin"), col("_sp_os") + col("_sp_lmin")))
      .drop("_sp_pid", "_sp_oc", "_sp_os", "_sp_omin", "_sp_lrn",
        "_sp_lcum", "_sp_lmin", "_sp_tmin")
  }
}
