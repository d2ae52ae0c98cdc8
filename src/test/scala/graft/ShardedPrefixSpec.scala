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

  test("string order keys: sharded rank equals the naive window, Unicode included") {
    import spark.implicits._
    // md5-hex-like keys plus adversarial strings for the codepoint
    // proxy: shared 3-char prefixes (proxy ties → same shard), empty,
    // single char, multi-byte UTF-8 (byte order == codepoint order)
    val rnd = new scala.util.Random(20260816)
    val rows = (0 until 600).map { i =>
      val key = i % 10 match {
        case 0 => ""                      // empty string
        case 1 => "a"                     // shorter-than-proxy
        case 2 => "abc" + rnd.nextInt(100) // shared proxy prefix
        case 3 => "中文键" + rnd.nextInt(100) // multi-byte
        case _ =>
          val md = java.security.MessageDigest.getInstance("MD5")
          md.digest(s"k$i".getBytes).map("%02x".format(_)).mkString
      }
      (s"g${i % 3}", key, i.toLong)
    }
    val df = rows.toDF("grp", "skey", "id").localCheckpoint()
    val w = Window.partitionBy("grp").orderBy(col("skey").asc, col("id").asc)
    val naive = df.withColumn("rn", row_number().over(w).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(2)) -> r.getLong(3))
      .toMap
    val sharded = ShardedPrefix.cumsum(spark, df, Seq("grp"), "skey", Nil,
        rnCol = Some("rn"), tiebreaks = Seq(col("id").asc))
      .collect().map(r => (r.getString(0), r.getLong(2)) -> r.getLong(3))
      .toMap
    assert(sharded == naive, "string-key sharded rank diverged")
  }

  test("curate_balanced_sample_check runs sharded: no single-partition window") {
    val df = graft.operators.Curation.balancedSampleExact(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString()
    // the rank window must partition on (lang, shard), not lang alone
    // (the only SinglePartition exchange left is the 1-row min-count
    // scalar reduce — metadata-sized by construction)
    assert("windowspecdefinition\\(lang#\\d+, _sp_pid".r
        .findFirstIn(plan).isDefined,
      s"rank window must run inside the ShardedPrefix shards:\n${plan.take(1500)}")
    assert("windowspecdefinition\\(lang#\\d+, pick_key".r
        .findFirstIn(plan).isEmpty,
      "a per-class global window survived — the sharding was bypassed")
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
