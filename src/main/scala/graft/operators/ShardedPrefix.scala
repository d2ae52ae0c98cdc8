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
  * `orderCol` must be numeric (approx_percentile input). Ties in
  * `orderCol` within a group make row_number order nondeterministic
  * exactly as the naive window would — pass `tiebreaks` to pin it.
  * The binned frame is eagerly localCheckpoint-ed: it feeds both the
  * window branch and the totals branch, so the cut caps input passes
  * at one (plus the one-row cuts aggregate).
  */
object ShardedPrefix {
  def cumsum(spark: SparkSession, df: DataFrame, groupCols: Seq[String],
      orderCol: String, sumCols: Seq[String],
      rnCol: Option[String] = None,
      tiebreaks: Seq[Column] = Nil): DataFrame = {
    val parts = spark.sessionState.conf.numShufflePartitions
    val fracs = (1 until parts).map(i => i.toDouble / parts)
    // null cuts = EMPTY input (approx_percentile of zero rows): fall
    // through to a single shard so the op returns empty, not an NPE —
    // the first-batch-of-a-new-pipeline contract.
    val cutRow = df.agg(expr(
      s"approx_percentile($orderCol, array(${fracs.mkString(", ")}), 10000)")
      .as("cuts")).head()
    val cutVals: Seq[Any] =
      if (cutRow.isNullAt(0)) Nil else cutRow.getSeq[Any](0)
    val cutArr =
      if (cutVals.isEmpty)
        array().cast(ArrayType(df.schema(orderCol).dataType))
      else array(cutVals.map(lit): _*)
    val binned = df.withColumn("_sp_pid",
      size(filter(cutArr, c => c < col(orderCol))).cast("int"))
      .localCheckpoint()
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
}
