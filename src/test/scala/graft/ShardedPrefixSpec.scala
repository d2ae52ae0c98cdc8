package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.ShardedPrefix

/** Randomized equivalence lock for the sharded prefix-sum core: on
  * seeded random frames (skewed group sizes, negative steps, duplicate
  * order values across groups), the decomposed global running sums /
  * row numbers / running-min-of-sum must equal the naive per-group
  * window bit-for-bit. The helper underpins events_sprt, events_cusum,
  * text_vocab_growth and text_zipf — this spec is what lets those ops
  * trust it at any shard geometry.
  */
class ShardedPrefixSpec extends SparkSpec {

  private def randomFrame(seed: Int, nGroups: Int, maxRows: Int) = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    val rows = (0 until nGroups).flatMap { g =>
      // skew: group 0 gets the bulk, later groups thin out
      val n = 1 + rnd.nextInt(maxRows / (g + 1))
      // unique order key per group (ties make row_number ill-defined
      // in BOTH formulations; uniqueness isolates the decomposition)
      val orders = rnd.shuffle((0 until 10 * n).toList).take(n)
      orders.map(o => (s"g$g", o.toLong, (rnd.nextInt(2001) - 1000).toLong))
    }
    rows.toDF("grp", "ord", "step")
  }

  test("cumsum equals the naive window on seeded random skewed frames") {
    for (seed <- Seq(7, 42, 1337)) {
      val df = randomFrame(seed, 4, 400).localCheckpoint()
      val w = Window.partitionBy("grp").orderBy("ord")
      val naive = df
        .withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("step_cum", sum(col("step")).over(w))
        .select("grp", "ord", "rn", "step_cum")
        .collect().map(r => (r.getString(0), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3))).toMap
      val sharded = ShardedPrefix.cumsum(spark, df, Seq("grp"), "ord",
          Seq("step"), rnCol = Some("rn"))
        .select("grp", "ord", "rn", "step_cum")
        .collect().map(r => (r.getString(0), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3))).toMap
      assert(sharded == naive, s"seed $seed: cumsum diverged")
    }
  }

  test("shuffle.partitions = 1 degrades to a single shard, same answers") {
    // fracs is empty at parts <= 1 — the helper must skip the
    // approx_percentile pass (array() percentage arg fails analysis)
    // and bin everything to one shard, not crash.
    val prev = spark.sessionState.conf.numShufflePartitions
    spark.conf.set("spark.sql.shuffle.partitions", "1")
    try {
      val df = randomFrame(5, 3, 120).localCheckpoint()
      val w = Window.partitionBy("grp").orderBy("ord")
      val naive = df.withColumn("step_cum", sum(col("step")).over(w))
        .select("grp", "ord", "step_cum")
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
        .toMap
      val sharded = ShardedPrefix.cumsum(spark, df, Seq("grp"), "ord",
          Seq("step"))
        .select("grp", "ord", "step_cum")
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
        .toMap
      assert(sharded == naive, "single-shard cumsum diverged")
      val gotMin = ShardedPrefix.cumsumWithMin(spark, df, Seq("grp"), "ord",
          "step")
        .select("grp", "ord", "cum", "cummin").collect()
      val naiveMin = df.withColumn("cum", sum(col("step")).over(w))
        .withColumn("cummin", min(col("cum")).over(w))
        .select("grp", "ord", "cum", "cummin")
        .collect().map(r => (r.getString(0), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3))).toMap
      assert(gotMin.map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap == naiveMin,
        "single-shard cumsumWithMin diverged")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev.toString)
  }

  test("cumsumWithMin equals naive sum + running min of sum") {
    for (seed <- Seq(11, 99)) {
      val df = randomFrame(seed, 3, 300).localCheckpoint()
      val w = Window.partitionBy("grp").orderBy("ord")
      val naive = df
        .withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("cum", sum(col("step")).over(w))
        .withColumn("cummin", min(col("cum")).over(w))
        .select("grp", "ord", "rn", "cum", "cummin")
        .collect().map(r => (r.getString(0), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
      val sharded = ShardedPrefix.cumsumWithMin(spark, df, Seq("grp"),
          "ord", "step")
        .select("grp", "ord", "rn", "cum", "cummin")
        .collect().map(r => (r.getString(0), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
      assert(sharded == naive, s"seed $seed: cumsumWithMin diverged")
    }
  }

  test("empty group columns give exact GLOBAL running sums") {
    import spark.implicits._
    val df = (1 to 500).map(i => (i.toLong, (i % 7 - 3).toLong))
      .toDF("ord", "step")
    val naive = df.withColumn("c", sum(col("step")).over(
        Window.orderBy("ord")))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val sharded = ShardedPrefix.cumsum(spark, df, Nil, "ord", Seq("step"))
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("step_cum")).toMap
    assert(sharded == naive)
  }
}
