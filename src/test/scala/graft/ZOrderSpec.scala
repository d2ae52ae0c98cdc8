package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._

import graft.sources.ZOrder

class ZOrderSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  test("zvalue interleaves bits exactly (round-trip against reference)") {
    import spark.implicits._
    def refZ(x: Long, y: Long): Long = {
      var z = 0L
      for (i <- 0 until 21) {
        z |= ((x >> i) & 1L) << (2 * i)
        z |= ((y >> i) & 1L) << (2 * i + 1)
      }
      z
    }
    val samples = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L),
      (1234L, 4321L), (2097151L, 2097151L), (1048576L, 1L))
    val got = samples.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.zvalue(col("x"), col("y")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    for ((x, y) <- samples) assert(got((x, y)) == refZ(x, y), s"($x, $y)")
  }

  test("z-ordered layout prunes row groups on a 2-d box filter") {
    import spark.implicits._
    val n = 200000
    // Deterministic pseudo-random 2-d points: both dims uniform 0..999,
    // uncorrelated with row order (hash-scrambled) so the unsorted
    // baseline has no accidental clustering.
    val pts = spark.range(n.toLong).select(
      (abs(xxhash64(col("id"))) % 1000).as("x"),
      (abs(xxhash64(col("id"), lit(7))) % 1000).as("y"),
      col("id"))
    val base = java.nio.file.Files.createTempDirectory("zorder").toString
    // Small row groups so footer stats operate at sub-file granularity.
    spark.conf.set("parquet.block.size", 64 * 1024)
    try {
      pts.repartition(8).write.mode("overwrite").parquet(s"$base/plain")
      ZOrder.writeZOrdered(pts, s"$base/zorder", "x", "y")
    } finally spark.conf.unset("parquet.block.size")

    def scannedRows(path: String): (Long, Long) = {
      val df = spark.read.parquet(path)
        .where(col("x").between(100, 149) && col("y").between(500, 549))
      val matches = df.count()
      val agg = df.agg(sum(col("id"))) // force a fresh non-count plan w/ scan metrics
      agg.collect()
      val scan = collectWithSubqueries(agg.queryExecution.executedPlan) {
        case s: FileSourceScanExec => s
      }.head
      (scan.metrics("numOutputRows").value, matches)
    }
    val (plainScanned, plainMatches) = scannedRows(s"$base/plain")
    val (zScanned, zMatches) = scannedRows(s"$base/zorder")
    assert(plainMatches == zMatches) // layout never changes results
    // ~0.25% of the space is selected; the z-layout must skip the bulk
    // of row groups while the scrambled layout reads nearly everything.
    assert(zScanned < plainScanned / 4,
      s"z-order scanned $zScanned rows vs plain $plainScanned — no pruning?")
  }

  test("snapshot store writes z-ordered snapshots that prune on a 2-d box") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    // The events fixture at sf0.01, clustered on (user_id, event time):
    // the store's zorderBy option must yield the same row-group pruning
    // as a direct ZOrder write, on top of snapshot partition pruning.
    val ev = Tables(spark, "/root/testdata/sf0.01", "events")
      .withColumn("ts_sec", unix_timestamp(col("ts")))
    val Array(uLo, uHi) = ev.agg(
      min(col("user_id")), max(col("user_id"))).collect()(0)
      .toSeq.map(_.asInstanceOf[Long]).toArray
    // Probe on the USER dimension only: the fixture arrives time-ordered,
    // so a time filter prunes even the plain layout (footer stats follow
    // the natural order) and proves nothing. A user band is the case the
    // plain layout CANNOT prune — and the z-layout must.
    val (uA, uB) = (uLo + (uHi - uLo) * 2 / 5, uLo + (uHi - uLo) / 2)

    val root = java.nio.file.Files.createTempDirectory("zstore").toString
    val store = new graft.sources.SnapshotStore(root)
    spark.conf.set("parquet.block.size", 64 * 1024)
    try {
      store.writeTableSnapshot(ev, "events_plain", "t1")
      // 64 range partitions: pruning granularity is the z-range per file,
      // and the 10k-row fixture needs narrow ranges for a 10% band to
      // skip most of them (at warehouse scale the same knob is row-group
      // count, which falls out of data volume for free).
      store.writeTableSnapshot(ev, "events_z", "t1",
        zorderBy = Some(("user_id", "ts_sec")), zPartitions = 64)
    } finally spark.conf.unset("parquet.block.size")

    def scanned(kind: String): (Long, Long) = {
      val df = store.readTableSnapshot(spark, kind, "t1")
        .where(col("user_id").between(uA, uB))
      val matches = df.count()
      val agg = df.agg(sum(col("event_id")))
      agg.collect()
      val scan = collectWithSubqueries(agg.queryExecution.executedPlan) {
        case s: FileSourceScanExec => s
      }.head
      (scan.metrics("numOutputRows").value, matches)
    }
    val (plainScanned, plainMatches) = scanned("events_plain")
    val (zScanned, zMatches) = scanned("events_z")
    assert(plainMatches == zMatches && zMatches > 0)
    assert(zScanned < plainScanned / 2,
      s"store z-order scanned $zScanned vs plain $plainScanned — no pruning?")
  }

  test("layout_zorder report: z-buckets are tight on BOTH keys, natural on neither") {
    val rows = graft.operators.Layout.zorderReport(spark, sfDir).collect()
    val byLayout = rows.groupBy(_.getString(0))
    assert(byLayout.keySet == Set("zorder", "natural"))
    // simulated file counts and row conservation
    for ((_, rs) <- byLayout) assert(rs.length <= 64)
    val zRows = byLayout("zorder").map(_.getLong(2)).sum
    val nRows = byLayout("natural").map(_.getLong(2)).sum
    assert(zRows == nRows && zRows > 0)
    def mean(rs: Array[org.apache.spark.sql.Row], i: Int): Double =
      rs.map(_.getDouble(i)).sum / rs.length
    val zp = mean(byLayout("zorder"), 3); val zs = mean(byLayout("zorder"), 4)
    val np = mean(byLayout("natural"), 3); val ns = mean(byLayout("natural"), 4)
    // each 64th of the z-curve covers a 1/8 x 1/8 key rectangle (plus
    // grid-boundary slack); ingest-ordered buckets span ~everything
    assert(zp < 0.3 && zs < 0.3, s"zorder spans p=$zp s=$zs")
    assert(np > 0.7 && ns > 0.7, s"natural spans p=$np s=$ns")
    // min/max pruning: a point query on either key reads a small
    // fraction of z-files; with natural layout it reads ~all of them
    assert(zp < np / 2 && zs < ns / 2)
  }

  test("layout_partition_stats: exact counts, skew and verdict recompute per candidate") {
    val got = graft.operators.Layout.partitionStats(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got.keySet == Set("documents.source", "documents.lang",
      "events.event_type", "events.day"))
    def expect(counts: Array[Long], entity: String): Unit = {
      val r = got(entity)
      val k = counts.length.toLong; val n = counts.sum
      assert(r.getLong(1) == k && r.getLong(2) == n, entity)
      assert(r.getLong(3) == counts.min && r.getLong(4) == counts.max)
      val skew = BigDecimal(counts.max.toDouble * k / n)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(6) == skew, entity)
      assert(r.getLong(7) == counts.count(_ < 50).toLong, entity)
      val verdict = if (k > 1000) "too_many"
        else if (skew > 4.0) "skewed" else "ok"
      assert(r.getString(8) == verdict, entity)
    }
    def counts(table: String, key: String): Array[Long] =
      graft.Tables(spark, sfDir, table).selectExpr(s"$key AS k")
        .groupBy("k").count().collect().map(_.getLong(1))
    expect(counts("documents", "source"), "documents.source")
    expect(counts("documents", "lang"), "documents.lang")
    expect(counts("events", "event_type"), "events.event_type")
    expect(counts("events", "CAST(ts AS DATE)"), "events.day")
  }

  test("compaction plan: exact scalar recompute, contiguous non-overlapping groups") {
    val got = graft.operators.Layout.compactionPlan(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDate(3).toString, r.getDate(4).toString))).toMap
    val daily = graft.Tables(spark, sfDir, "events")
      .selectExpr("CAST(ts AS DATE) AS d").groupBy("d").count()
      .orderBy("d").collect().map(r => (r.getDate(0).toString, r.getLong(1)))
    var before = 0L
    val expect = scala.collection.mutable.Map[Long, (Long, Long, String, String)]()
    for ((d, n) <- daily) {
      val g = before / 2000L
      val (f, t, d0, _) = expect.getOrElse(g, (0L, 0L, d, d))
      expect(g) = (f + 1, t + n, d0, d)
      before += n
    }
    assert(got == expect.toMap, s"got $got\nexp $expect")
    // greedy contiguity: consecutive group ids cover adjacent day ranges
    val ordered = got.toSeq.sortBy(_._1).map(_._2)
    ordered.sliding(2).foreach {
      case Seq((_, _, _, last), (_, _, first, _)) => assert(last < first)
      case _ =>
    }
  }
}
