package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, posexplode}
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.{CorpusStream, EventStream}
import graft.streaming.EventStream.Event

/** Structured-Streaming twins driven through MemoryStream — watermarked
  * hourly windows and stateful gap sessionization.
  */
class StreamingSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  test("hourly windowed aggregate over a stream") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStream.hourly(mem.toDF())
      .writeStream.format("memory").queryName("hourly_out")
      .outputMode(OutputMode.Update).start()
    try {
      mem.addData(
        Event(1, ts(10), 1, "click", 1.0),
        Event(2, ts(20), 2, "click", 2.0),
        Event(3, ts(70), 1, "view", 5.0))
      q.processAllAvailable()
      val rows = spark.table("hourly_out").collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2)))
        .toSet
      assert(rows.contains(("2024-01-01 00:00:00.0", "click", 2L)))
      assert(rows.contains(("2024-01-01 01:00:00.0", "view", 1L)))
    } finally q.stop()
  }

  test("stream-static enrichment joins a broadcast dim per micro-batch") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Event]
    val dim = Seq((1L, "gold"), (2L, "free")).toDF("user_id", "tier")
    val q = EventStream.enrich(mem.toDF(), dim, "user_id")
      .select($"event_id", $"tier")
      .writeStream.format("memory").queryName("enrich_out")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(
        Event(1, ts(10), 1, "click", 1.0),
        Event(2, ts(20), 2, "view", 2.0),
        Event(3, ts(30), 9, "view", 3.0)) // no dim row: left join keeps it
      q.processAllAvailable()
      val rows = spark.table("enrich_out").collect()
        .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
      assert(rows == Map(1L -> Some("gold"), 2L -> Some("free"), 3L -> None))
    } finally q.stop()
  }

  test("streaming funnel advances strictly-ordered stages across batches") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStream.funnel(mem.toDS())
      .writeStream.format("memory").queryName("funnel_out")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(
        Event(1, ts(10), 1, "view", 1.0),
        Event(2, ts(5), 2, "click", 1.0),  // click before any view: ignored
        Event(3, ts(20), 1, "click", 1.0))
      q.processAllAvailable()
      // next batch: purchase completes user 1's funnel; user 2's view
      // starts theirs (the earlier click stays consumed)
      mem.addData(
        Event(4, ts(30), 1, "purchase", 1.0),
        Event(5, ts(40), 2, "view", 1.0))
      q.processAllAvailable()
      val rows = spark.table("funnel_out").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(rows == Set(
        (1L, "view"), (1L, "click"), (1L, "purchase"),
        (2L, "view")), s"got $rows")
    } finally q.stop()
  }

  test("streaming transitions pair consecutive events across micro-batches") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStream.transitions(mem.toDS())
      .writeStream.format("memory").queryName("trans_out")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(
        Event(1, ts(10), 1, "view", 1.0),
        Event(2, ts(20), 1, "click", 1.0),
        Event(3, ts(5), 2, "signup", 1.0))
      q.processAllAvailable()
      // second micro-batch: user 1's pair spans the batch boundary
      mem.addData(Event(4, ts(30), 1, "purchase", 1.0))
      q.processAllAvailable()
      val rows = spark.table("trans_out").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
      assert(rows == Set(
        (1L, "view", "click"),
        (1L, "click", "purchase")), s"got $rows")
    } finally q.stop()
  }

  test("funnel default path: no eviction — a long-dormant user keeps progress") {
    // Pins the README contract for the idleEvictMs default (OFF): with no
    // valve, state survives ANY idle gap, so a user returning long after
    // everyone else moved on still advances from their remembered stage —
    // exact batch-twin parity, at the cost of O(|all-time users|) state.
    // Production deployments on unbounded populations must set the valve
    // (previous test pins that path's semantics).
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStream.funnel(mem.toDS())
      .writeStream.format("memory").queryName("funnel_default_out")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(
        Event(1, ts(10), 1, "view", 1.0),
        Event(2, ts(20), 1, "click", 1.0))
      q.processAllAvailable()
      // hours of other-user traffic that would advance any watermark far
      // past user 1's idle horizon
      mem.addData(Event(3, ts(300), 2, "view", 1.0))
      q.processAllAvailable()
      mem.addData(Event(4, ts(310), 2, "click", 1.0))
      q.processAllAvailable()
      // user 1 returns: stage-2 state must still be there — purchase
      // completes the funnel instead of restarting from stage 0
      mem.addData(Event(5, ts(320), 1, "purchase", 1.0))
      q.processAllAvailable()
      val rows = spark.table("funnel_default_out").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2))).toSet
      assert(rows.contains((1L, "purchase", ts(320))),
        s"default (no-evict) path lost dormant state: $rows")
    } finally q.stop()
  }

  test("funnel idle eviction: state expires, late returner restarts cleanly") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Event]
    // 30-minute idle horizon, 2h watermark delay (the defaults' shape).
    val q = EventStream.funnel(mem.toDS(), idleEvictMs = Some(30L * 60 * 1000))
      .writeStream.format("memory").queryName("funnel_evict_out")
      .outputMode(OutputMode.Append).start()
    try {
      // user 1 reaches stage 2 (view → click), timeout armed at 00:50
      mem.addData(
        Event(1, ts(10), 1, "view", 1.0),
        Event(2, ts(20), 1, "click", 1.0))
      q.processAllAvailable()
      // another user far in the future advances the watermark past 00:50
      mem.addData(Event(3, ts(300), 2, "view", 1.0))
      q.processAllAvailable()
      // next batch fires user 1's timeout (timeouts evaluate against the
      // watermark as of batch start, so the eviction lands here)
      mem.addData(Event(4, ts(310), 2, "click", 1.0))
      q.processAllAvailable()
      // user 1 returns: with state evicted, purchase cannot advance a
      // forgotten stage-2 funnel (stage 0 → 3 is invalid) but a fresh
      // view re-opens from stage 0 — the "late event re-opens cleanly"
      // contract
      mem.addData(
        Event(5, ts(320), 1, "purchase", 1.0),
        Event(6, ts(330), 1, "view", 1.0))
      q.processAllAvailable()
      val rows = spark.table("funnel_evict_out").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2))).toSet
      assert(!rows.contains((1L, "purchase", ts(320))),
        s"stage-2 state survived the idle horizon: $rows")
      assert(rows.contains((1L, "view", ts(330))), s"re-open missing: $rows")
      assert(rows.contains((2L, "view", ts(300))))
    } finally q.stop()
  }

  test("transitions idle eviction: aged-out last event opens no pair") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStream.transitions(mem.toDS(),
        idleEvictMs = Some(30L * 60 * 1000))
      .writeStream.format("memory").queryName("trans_evict_out")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(Event(1, ts(10), 1, "view", 1.0))
      q.processAllAvailable()
      mem.addData(Event(2, ts(300), 2, "signup", 1.0)) // advance watermark
      q.processAllAvailable()
      mem.addData(Event(3, ts(310), 2, "click", 1.0))  // fires 1's timeout
      q.processAllAvailable()
      // user 1 returns after the horizon: no (view → click) pair — the
      // aged-out event is forgotten — but pairing resumes from the new one
      mem.addData(Event(4, ts(320), 1, "click", 1.0))
      q.processAllAvailable()
      mem.addData(Event(5, ts(330), 1, "purchase", 1.0))
      q.processAllAvailable()
      val rows = spark.table("trans_evict_out").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
      assert(!rows.contains((1L, "view", "click")),
        s"evicted last-event state still paired: $rows")
      assert(rows.contains((1L, "click", "purchase")), s"got $rows")
      assert(rows.contains((2L, "signup", "click")))
    } finally q.stop()
  }

  test("streaming sequence examples carry context across micro-batches") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStream.sequenceExamples(mem.toDS(), k = 2)
      .writeStream.format("memory").queryName("seq_out")
      .outputMode(OutputMode.Append).start()
    try {
      // batch 1: user 1 gets view, click — not enough context yet, no
      // examples emitted
      mem.addData(
        Event(1, ts(10), 1, "view", 1.0),
        Event(2, ts(20), 1, "click", 1.0))
      q.processAllAvailable()
      assert(spark.table("seq_out").count() == 0)
      // batch 2: purchase has [view, click] behind it — the context
      // spans the batch boundary; signup then has [click, purchase]
      mem.addData(
        Event(3, ts(30), 1, "purchase", 1.0),
        Event(4, ts(40), 1, "signup", 1.0))
      q.processAllAvailable()
      val rows = spark.table("seq_out").collect()
        .map(r => (r.getLong(0), r.getSeq[String](1).toList, r.getString(2)))
        .toSet
      assert(rows == Set(
        (1L, List("view", "click"), "purchase"),
        (1L, List("click", "purchase"), "signup")), s"got $rows")
    } finally q.stop()
  }

  test("streaming dedup drops replayed event ids within the watermark") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStream.dedupEvents(mem.toDF())
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(
        Event(1, ts(0), 1, "click", 1.0),
        Event(1, ts(1), 1, "click", 1.0), // replay of id 1
        Event(2, ts(2), 1, "view", 2.0))
      q.processAllAvailable()
      mem.addData(Event(1, ts(3), 1, "click", 1.0)) // replay in later batch
      q.processAllAvailable()
      val ids = spark.table("dedup_out").collect().map(_.getLong(0)).sorted
      assert(ids.toSeq == Seq(1L, 2L))
    } finally q.stop()
  }

  test("foreachBatch snapshot sink: micro-batches land as versioned tables") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("ssnap").toString
    val store = new graft.sources.SnapshotStore(root)
    val mem = MemoryStream[Event]
    val q = EventStream.snapshotSink(mem.toDF(), store, "events")
      .option("checkpointLocation", s"$root/ckpt").start()
    try {
      mem.addData(Event(1, ts(0), 1, "click", 1.0))
      q.processAllAvailable()
      mem.addData(Event(2, ts(1), 1, "view", 2.0), Event(3, ts(2), 2, "click", 3.0))
      q.processAllAvailable()
      val latestTs = store.latestSnapshotTs("events")
      assert(latestTs == "batch-000001")
      assert(store.readTableSnapshot(spark, "events", latestTs).count() == 2)
      assert(store.readTableSnapshot(spark, "events", "batch-000000").count() == 1)
    } finally q.stop()
  }

  test("stream-stream interval join attributes clicks to views in-window") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val views = MemoryStream[Event]
    val clicks = MemoryStream[Event]
    val q = EventStream.viewClickJoin(views.toDF(), clicks.toDF())
      .writeStream.format("memory").queryName("attrib_out")
      .outputMode(OutputMode.Append).start()
    try {
      views.addData(
        Event(100, ts(0), 1, "view", 0.0),
        Event(101, ts(0), 2, "view", 0.0))
      clicks.addData(
        Event(200, ts(10), 1, "click", 5.0),  // in window for view 100
        Event(201, ts(45), 1, "click", 7.0),  // outside 30-min window
        Event(202, ts(20), 3, "click", 9.0))  // no matching user
      q.processAllAvailable()
      val pairs = spark.table("attrib_out").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs == Set((100L, 200L)))
    } finally q.stop()
  }

  test("registerAll exposes the catalog to spark.sql") {
    Tables.registerAll(spark, sfDir)
    assert(spark.sql("SELECT count(*) FROM lineitem").head().getLong(0) > 0)
    assert(spark.sql(
      "SELECT count(*) FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey")
      .head().getLong(0) > 0)
  }

  test("stateful sessionization closes sessions on 30-min gaps") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStream.sessionize(mem.toDS())
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode(OutputMode.Append).start()
    try {
      // user 1: two events 10 min apart, then a 40-min gap → session closes
      mem.addData(
        Event(1, ts(0), 1, "click", 1.0),
        Event(2, ts(10), 1, "click", 2.0),
        Event(3, ts(50), 1, "click", 3.0))
      q.processAllAvailable()
      // push the watermark far forward so the open session times out
      mem.addData(Event(9, ts(600), 2, "click", 0.0))
      q.processAllAvailable()
      mem.addData(Event(10, ts(1200), 2, "click", 0.0))
      q.processAllAvailable()

      val sessions = spark.table("sessions_out").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).toString,
          r.getLong(3), r.getDouble(4)))
      val u1 = sessions.filter(_._1 == 1L).sortBy(_._2)
      assert(u1.length == 2, s"expected 2 closed sessions, got ${u1.toSeq}")
      assert(u1(0) == (1L, "2024-01-01 00:00:00.0", 2L, 3.0)) // events at :00 + :10
      assert(u1(1)._3 == 1L) // the :50 event alone
    } finally q.stop()
  }

  test("streaming outliers flag extremes against running per-type moments") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStream.outliers(mem.toDS())
      .writeStream.format("memory").queryName("outliers_out")
      .outputMode(OutputMode.Append).start()
    try {
      // warm-up batch: 12 ordinary clicks build the moments (>= MinObs)
      mem.addData((1 to 12).map(i => Event(i.toLong, ts(i), 1, "click", 10.0 + (i % 3))): _*)
      q.processAllAvailable()
      assert(spark.table("outliers_out").count() == 0) // nothing extreme yet
      // second batch: one extreme value among ordinary ones
      mem.addData(
        Event(20, ts(20), 1, "click", 11.0),
        Event(21, ts(21), 1, "click", 500.0),
        Event(22, ts(22), 2, "view", 9.0)) // different type: still warming up
      q.processAllAvailable()
      val flagged = spark.table("outliers_out").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(flagged == Set((21L, "click")))
    } finally q.stop()
  }

  test("streaming sprt decides at the batch op's crossing step, then goes silent") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStream.sprt(mem.toDS())
      .writeStream.format("memory").queryName("sprt_out")
      .outputMode(OutputMode.Append).start()
    try {
      // the batch spec's planted streams across TWO micro-batches:
      // 'hot' (all successes) crosses +ln19 at step 14, 'cold' (all
      // failures) crosses -ln19 at step 17, 'mid' stays inside
      def batch(r: Range) =
        r.map(i => Event(i.toLong, ts(i), 1, "hot", 50.0)) ++
        r.map(i => Event(100L + i, ts(i), 1, "cold", 1.0)) ++
        r.filter(_ <= 5).map(i => Event(200L + i, ts(i), 1, "mid",
          if (i % 2 == 0) 50.0 else 1.0))
      mem.addData(batch(1 to 10): _*)
      q.processAllAvailable()
      assert(spark.table("sprt_out").count() == 0) // nothing decided yet
      mem.addData(batch(11 to 20): _*)
      q.processAllAvailable()
      val got = spark.table("sprt_out").collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getString(3))).toMap
      assert(got.size == 2, s"exactly one decision per decided type: $got")
      assert(got("hot") == ((14L, "reject_h0")))
      assert(got("cold") == ((17L, "accept_h0")))
    } finally q.stop()
  }

  test("streaming cusum alarms at the batch chart's crossing step, once per excursion") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStream.cusum(mem.toDS())
      .writeStream.format("memory").queryName("cusum_out")
      .outputMode(OutputMode.Append).start()
    try {
      // the batch spec's planted streams, fed in event_id order across
      // TWO micro-batches (state must carry): 'jump' crosses h=1e9 at
      // step 10 (y=+1e8/step), 'calm' never leaves 0
      mem.addData((1 to 8).map(i =>
        Event(i.toLong, ts(i), 1, "jump", 155.0)) ++
        (1 to 8).map(i => Event(50L + i, ts(i), 1, "calm", 54.0)): _*)
      q.processAllAvailable()
      assert(spark.table("cusum_out").count() == 0) // still inside
      mem.addData((9 to 20).map(i =>
        Event(i.toLong, ts(i), 1, "jump", 155.0)) ++
        (9 to 20).map(i => Event(50L + i, ts(i), 1, "calm", 54.0)): _*)
      q.processAllAvailable()
      val alarms = spark.table("cusum_out").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      // exactly ONE alarm (the upward crossing), at the same step the
      // batch chart reports as first_alarm_n, with the same statistic
      assert(alarms.toSeq == Seq(("jump", 10L, 1000000000L)))
    } finally q.stop()
  }

  test("text scrub + chunk pipeline runs incrementally on a stream") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    // The frame-level text operators are stateless projections /
    // generators, so the SAME code path as the batch oracle queries
    // composes onto readStream unchanged: scrub PII, then window the
    // scrubbed text into chunks.
    val scrubbed = graft.operators.TextAnalysis
      .redactColumns(mem.toDF().toDF("doc_id", "text"))
      .select(col("doc_id"), col("text_redacted").as("text"), col("n_emails"))
    val chunked = graft.operators.TextAnalysis.chunkColumns(scrubbed)
    val q = chunked.writeStream.format("memory").queryName("chunks_out")
      .outputMode(OutputMode.Append).start()
    try {
      val longDoc = (1 to 70).map(i => s"w$i").mkString(" ")
      mem.addData((1L, s"contact a@b.com then $longDoc"), (2L, "tiny doc"))
      q.processAllAvailable()
      mem.addData((3L, "second batch arrives later"))
      q.processAllAvailable()
      val rows = spark.table("chunks_out").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getString(3))).toMap
      // doc 1: 73 tokens after scrub -> chunks at 0 and 48; email scrubbed
      assert(rows((1L, 0L))._1 == 64)
      assert(rows((1L, 0L))._2.startsWith("contact <EMAIL> then w1 "))
      assert(rows((1L, 1L))._1 == 73 - 48)
      assert(rows((2L, 0L)) == ((2L, "tiny doc")))
      assert(rows((3L, 0L))._1 == 4) // incremental batch processed alone
      assert(rows.size == 4)
    } finally q.stop()
  }

  test("PSI of windows: matching window quiet, shifted window flagged") {
    import spark.implicits._
    val w1 = Timestamp.valueOf("2024-01-01 00:00:00")
    val w2 = Timestamp.valueOf("2024-01-01 01:00:00")
    // baseline: type "click" spread evenly over buckets 0..3
    val baseline = (0 to 3).map(b => ("click", b.toLong, 100L))
      .toDF("event_type", "bucket", "cnt")
    val wc = Seq(
      // window 1 matches the baseline shape
      (w1, "click", 0L, 25L), (w1, "click", 1L, 25L),
      (w1, "click", 2L, 25L), (w1, "click", 3L, 25L),
      // window 2 collapses onto one bucket
      (w2, "click", 0L, 100L))
      .toDF("window_start", "event_type", "bucket", "cnt")
    val psi = EventStream.psiOfWindows(wc, baseline).collect()
      .map(r => r.getTimestamp(0) -> ((r.getDouble(2), r.getBoolean(3)))).toMap
    assert(!psi(w1)._2, s"matching window drifted: ${psi(w1)}")
    assert(psi(w2)._2 && psi(w2)._1 > 1.0, s"shifted window quiet: ${psi(w2)}")

    // the KS companion over the same frames: window 1's ECDF tracks the
    // baseline exactly (D = 0); window 2 piles all mass on bucket 0, so
    // D = |1 − 0.25| = 0.75 at the first bucket
    val ks = EventStream.ksOfWindows(wc, baseline).collect()
      .map(r => r.getTimestamp(0) -> ((r.getDouble(2), r.getBoolean(3)))).toMap
    assert(ks(w1) == ((0.0, false)), s"matching window KS: ${ks(w1)}")
    assert(ks(w2) == ((0.75, true)), s"shifted window KS: ${ks(w2)}")
  }

  test("drift sink: closed windows emit once with final PSI") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val baseline = (0 to 3).map(b => ("click", b.toLong, 100L))
      .toDF("event_type", "bucket", "cnt")
    val alerts = scala.collection.mutable.ArrayBuffer[(String, Double, Boolean)]()
    val mem = MemoryStream[Event]
    val q = EventStream.driftSink(mem.toDF(), baseline) { d =>
      alerts ++= d.collect().map(r =>
        (r.getTimestamp(0).toString, r.getDouble(2), r.getBoolean(3)))
    }.start()
    try {
      // window [0h,1h): matches baseline; window [1h,2h): all one bucket
      val even = (0 until 20).map(i =>
        Event(i.toLong, ts(i * 3), 1L, "click", (i % 4) * 50.0 + 10.0))
      val shifted = (0 until 20).map(i =>
        Event(100L + i, ts(60 + i * 2), 1L, "click", 10.0))
      mem.addData(even ++ shifted: _*)
      q.processAllAvailable()
      // sentinel far ahead: watermark (2 h) passes both window ends
      mem.addData(Event(999L, ts(6 * 60), 1L, "click", 10.0))
      q.processAllAvailable()
      mem.addData(Event(1000L, ts(6 * 60 + 1), 1L, "click", 10.0))
      q.processAllAvailable()
      val byWindow = alerts.groupBy(_._1)
      assert(byWindow.contains("2024-01-01 00:00:00.0") &&
        byWindow.contains("2024-01-01 01:00:00.0"), s"got $alerts")
      assert(byWindow("2024-01-01 00:00:00.0").map(a => a._1).size == 1,
        "a closed window emits exactly once")
      assert(!byWindow("2024-01-01 00:00:00.0").head._3)
      assert(byWindow("2024-01-01 01:00:00.0").head._3,
        s"shifted window not flagged: $alerts")
    } finally q.stop()
  }

  test("streaming heavy hitters: space-saving bounds hold across batches, state capped at k") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Event]
    // one shard (all users ≡ 0 mod 4), k=3 → eviction is exercised:
    // true counts  u4: 30, u8: 20, u12: 4, u16..u36 (6 users): 1 each
    val heavy = (0 until 18).map(i => Event(i.toLong, ts(i), 4L, "view", 1.0)) ++
      (0 until 12).map(i => Event(100L + i, ts(i), 8L, "view", 1.0)) ++
      (0 until 2).map(i => Event(200L + i, ts(i), 12L, "view", 1.0))
    val later = (0 until 12).map(i => Event(300L + i, ts(30 + i), 4L, "view", 1.0)) ++
      (0 until 8).map(i => Event(400L + i, ts(30 + i), 8L, "view", 1.0)) ++
      (0 until 2).map(i => Event(500L + i, ts(30 + i), 12L, "view", 1.0)) ++
      (0 until 6).map(i => Event(600L + i, ts(40 + i), 16L + 4 * i, "view", 1.0))
    val q = EventStream.heavyHitters(mem.toDS(), k = 3, shards = 4)
      .writeStream.format("memory").queryName("hh_out")
      .outputMode(OutputMode.Update).start()
    try {
      mem.addData(heavy: _*)
      q.processAllAvailable()
      mem.addData(later: _*)
      q.processAllAvailable()
      // last emission per shard = the current sketch
      val out = spark.table("hh_out").collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      val lastBatch = out.drop(out.length / 2) // update mode: batch 2 rows are the tail
      assert(lastBatch.length <= 3, s"state exceeded k: $lastBatch")
      val sketch = lastBatch.map { case (_, u, c, e) => u -> ((c, e)) }.toMap
      val truth = Map(4L -> 30L, 8L -> 20L, 12L -> 4L)
      // guaranteed hitters (true count > N/k = 70/3) must be present
      assert(sketch.contains(4L) && sketch.contains(8L))
      sketch.foreach { case (u, (est, over)) =>
        val t = truth.getOrElse(u, 1L)
        assert(est >= t, s"u$u est $est < true $t")
        assert(est - over <= t, s"u$u lower bound ${est - over} > true $t")
      }
      // the dominant user's count is EXACT (never evicted): 18 + 12
      assert(sketch(4L) == ((30L, 0L)))
    } finally q.stop()
  }

  test("streaming pack: prefix-sum state spans micro-batches, matches the batch greedy rule") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    import graft.streaming.CorpusStream
    import graft.streaming.CorpusStream.Doc
    val mem = MemoryStream[Doc]
    val q = CorpusStream.packStream(mem.toDS(), budget = 100L)
      .writeStream.format("memory").queryName("pack_out")
      .outputMode(OutputMode.Append).start()
    try {
      // shard 0: tokens 60, 60, 60 — packs 0, 0 (starts at 60), 1
      // shard 1: tokens 250 (oversized: own pack), then 30
      mem.addData(Doc(1, 0, 60), Doc(2, 0, 60), Doc(10, 1, 250))
      q.processAllAvailable()
      mem.addData(Doc(3, 0, 60), Doc(11, 1, 30)) // state carries 120 / 250
      q.processAllAvailable()
      val got = spark.table("pack_out").collect()
        .map(r => r.getLong(1) -> ((r.getLong(2), r.getLong(3)))).toMap
      // batch greedy rule: pack = cum_before div budget
      assert(got(1L) == ((0L, 0L)))
      assert(got(2L) == ((0L, 60L)))
      assert(got(3L) == ((1L, 20L)), s"cross-batch prefix lost: ${got(3L)}")
      assert(got(10L) == ((0L, 0L)))
      assert(got(11L) == ((2L, 50L)), s"oversized doc prefix: ${got(11L)}")
    } finally q.stop()
  }

  test("boiler-flag stream: known boilerplate segments flag on arrival") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    import graft.operators.Dedup
    import graft.streaming.CorpusStream
    // segment B is confirmed boilerplate: aligned in TWO history docs
    val b = (1 to 8).map(i => s"b$i").mkString(" ")
    val history = Seq(
      (100L, b + " " + (1 to 8).map(i => s"h$i").mkString(" ")),
      (101L, (1 to 8).map(i => s"g$i").mkString(" ") + " " + b),
      (102L, (1 to 16).map(i => s"k$i").mkString(" ")))
      .toDF("doc_id", "text")
    val bloom = Dedup.boilerplateBloom(spark, history)
    val mem = MemoryStream[(Long, String)]
    val q = CorpusStream
      .boilerFlagStream(mem.toDF().toDF("doc_id", "text"), bloom)
      .writeStream.format("memory").queryName("boilerflag_out")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(
        (1L, b + " " + (1 to 5).map(i => s"a$i").mkString(" ")),
        (2L, (1 to 4).map(i => s"q$i").mkString(" ") + " " + b), // unaligned
        (3L, (1 to 12).map(i => s"z$i").mkString(" ")))
      q.processAllAvailable()
      val got = spark.table("boilerflag_out").collect()
        .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2),
          r.getBoolean(3)))).toMap
      // doc 1 leads with B on a segment boundary: flagged
      assert(got(1L) == ((2, 1, true)), s"got ${got(1L)}")
      // doc 2 carries B OFF-alignment: its tumbling segments differ —
      // line-dedup semantics, not substring semantics
      assert(got(2L) == ((2, 0, false)), s"got ${got(2L)}")
      // clean doc: two segments, nothing flags
      assert(got(3L) == ((2, 0, false)), s"got ${got(3L)}")
    } finally q.stop()
  }

  test("span-flag stream: history overlap flags on arrival, clean docs pass") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    import graft.operators.Dedup
    import graft.streaming.CorpusStream
    val shared = (1 to 10).map(i => s"s$i").mkString(" ")
    val history = Seq(
      (100L, (1 to 6).map(i => s"h$i").mkString(" ") + " " + shared),
      (102L, (1 to 20).map(i => s"k$i").mkString(" ")))
      .toDF("doc_id", "text")
    val bloom = Dedup.spanGramBloom(spark, history)
    val mem = MemoryStream[(Long, String)]
    val q = CorpusStream
      .spanFlagStream(mem.toDF().toDF("doc_id", "text"), bloom)
      .writeStream.format("memory").queryName("spanflag_out")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(
        (1L, shared + " " + (1 to 5).map(i => s"a$i").mkString(" ")),
        (3L, (1 to 15).map(i => s"z$i").mkString(" ")),
        (5L, "too short"))
      q.processAllAvailable()
      val got = spark.table("spanflag_out").collect()
        .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2),
          r.getBoolean(3)))).toMap
      // doc 1 lifts a 10-word history span: 3 of its 8 grams flag
      assert(got(1L) == ((8, 3, true)), s"got ${got(1L)}")
      // clean doc: full gram count, nothing flags (fpp 0.1% on 15 grams)
      assert(got(3L) == ((8, 0, false)), s"got ${got(3L)}")
      // short doc: no full gram exists — empty array, never flagged
      assert(got(5L) == ((0, 0, false)), s"got ${got(5L)}")
    } finally q.stop()
  }

  test("streaming near-dup candidates: band parity with batch, anchors hit, clean docs pass") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val base = (1 to 30).map(i => s"tok$i").mkString(" ")
    val nearDup = base.replace("tok7", "tok7x") // one token changed
    val fresh = (1 to 30).map(i => s"new$i").mkString(" ")
    // the persisted index: the batch kernels over the history docs
    val history = Seq((100L, base)).toDF("doc_id", "text")
    val index = history.select(col("doc_id"),
      org.apache.spark.sql.graft.ShingleHash.wordShingleHashes(col("text"))
        .as("sh"))
      .select(col("doc_id"), posexplode(
        org.apache.spark.sql.graft.ShingleHash.minhashBands(col("sh"))))
      .toDF("doc_id", "band", "bucket")
    val mem = MemoryStream[(Long, String)]
    val q = CorpusStream
      .nearDupCandidateStream(mem.toDF().toDF("doc_id", "text"), index)
      .writeStream.format("memory").queryName("neardup_out")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData((1L, nearDup), (2L, fresh), (3L, "too short"),
        (100L, base)) // the anchor itself re-arrives: self-hit excluded
      q.processAllAvailable()
      val got = spark.table("neardup_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      // the near-dup collides with the stored anchor on ≥ 1 band
      assert(got.exists(c => c._1 == 1L && c._2 == 100L),
        s"near-dup missed: ${got.toSeq}")
      // a fresh doc and a too-short doc emit nothing
      assert(!got.exists(_._1 == 2L) && !got.exists(_._1 == 3L))
      // the anchor's own re-arrival is not a candidate against itself
      assert(!got.exists(c => c._1 == 100L && c._2 == 100L))
      // band parity: every emitted (doc, band) pair exists in the
      // BATCH banding of the same text — same kernels, same hashes
      val batchBands = Seq((1L, nearDup)).toDF("doc_id", "text")
        .select(col("doc_id"), posexplode(
          org.apache.spark.sql.graft.ShingleHash.minhashBands(
            org.apache.spark.sql.graft.ShingleHash
              .wordShingleHashes(col("text")))))
        .toDF("doc_id", "band", "bucket").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      got.filter(_._1 == 1L).foreach { c =>
        assert(batchBands.exists(b => b._2 == c._3), s"band ${c._3} not in batch")
      }
    } finally q.stop()
  }

  test("streaming attribution: per-touch credits, flags, (none), no future credit") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStream.attribution(mem.toDS())
      .writeStream.format("memory").queryName("attr_out")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(
        Event(1, ts(10), 1, "view", 1.0),
        Event(2, ts(20), 1, "click", 1.0))
      q.processAllAvailable()
      mem.addData(
        Event(3, ts(30), 1, "purchase", 1.0), // two touches, split credit
        Event(4, ts(40), 2, "purchase", 1.0)) // no touches → (none)
      q.processAllAvailable()
      // a later touch must never retro-credit purchase 4
      mem.addData(Event(5, ts(50), 2, "view", 1.0))
      q.processAllAvailable()
      val rows = spark.table("attr_out").collect()
        .map(r => (r.getLong(0), r.getString(2), r.getBoolean(3),
          r.getBoolean(4), r.getLong(5))).toSet
      assert(rows == Set(
        (3L, "view", true, false, 500000L),
        (3L, "click", false, true, 500000L),
        (4L, "(none)", true, true, 0L)), s"got $rows")
    } finally q.stop()
  }

  test("streaming attribution parity: channel rollup equals the batch op on sf0.001") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{sum, when}
    implicit val sc = spark.sqlContext
    val evs = Tables(spark, sfDir, "events")
      .select(col("event_id"), col("ts").cast("timestamp").as("ts"),
        col("user_id"), col("event_type"), col("value"))
      .as[Event].collect().sortBy(e => (e.ts.getTime, e.event_id))
    val mem = MemoryStream[Event]
    val q = EventStream.attribution(mem.toDS())
      .writeStream.format("memory").queryName("attr_parity_out")
      .outputMode(OutputMode.Append).start()
    try {
      // two micro-batches split mid-stream: purchases in the second
      // batch must find their first-batch touches in state
      val (a, b) = evs.splitAt(evs.length / 2)
      mem.addData(a.toIndexedSeq: _*); q.processAllAvailable()
      mem.addData(b.toIndexedSeq: _*); q.processAllAvailable()
      val got = spark.table("attr_parity_out").groupBy(col("channel"))
        .agg(
          sum(when(col("is_first"), 1L).otherwise(0L)).as("first_touch"),
          sum(when(col("is_last"), 1L).otherwise(0L)).as("last_touch"),
          sum(col("linear_micros")).as("linear_micros"))
        .collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
        .toMap
      val want = graft.operators.Events.attribution(spark, sfDir).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
        .toMap
      assert(got == want, s"streaming $got vs batch $want")
    } finally q.stop()
  }

  test("gopher stream: arrival-time admission equals the batch rule-set row-for-row") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val docs = Seq(
      (1L, Seq.fill(60)("word").mkString(" ") + " the a"), // keep
      (2L, "the of tiny docs"),                            // too short
      (3L, Seq.fill(60)("word").mkString(" ")))            // no stops
    val mem = MemoryStream[(Long, String)]
    val q = graft.streaming.CorpusStream
      .gopherStream(mem.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("gopher_out")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(docs: _*)
      q.processAllAvailable()
      def canon(rows: Array[org.apache.spark.sql.Row]) =
        rows.map(r => r.toSeq.toList).sortBy(_.head.toString)
      val streamed = canon(spark.table("gopher_out").collect())
      val batch = canon(graft.operators.Curation
        .gopherMetrics(docs.toDF("doc_id", "text")).collect())
      assert(streamed.toList == batch.toList)
      val keep = spark.table("gopher_out").collect()
        .map(r => r.getLong(0) -> r.getBoolean(15)).toMap
      assert(keep == Map(1L -> true, 2L -> false, 3L -> false))
    } finally q.stop()
  }

  test("ANN ingest stream: arrival-time cell+code assignment equals the served index") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    // stream the corpus's own vectors: the served batch index already
    // assigned every one of them, so the stateless arrival-time path
    // must reproduce cell AND all M codes row-for-row
    val corpus = Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect()
    val mem = MemoryStream[(Long, Seq[Float])]
    val q = graft.streaming.CorpusStream
      .annIngestStream(spark, sfDir, mem.toDF().toDF("vec_id", "embedding"))
      .writeStream.format("memory").queryName("annin_out")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(corpus.toSeq: _*)
      q.processAllAvailable()
      val got = spark.table("annin_out").collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getSeq[Int](2).toList)))
        .toMap
      assert(got.size == corpus.length)
      val expCell = graft.operators.Similarity.servedIvfIndex(spark, sfDir)
        ._2.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      val expCodes = graft.operators.Similarity.servedPq(spark, sfDir)
        ._2.collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
        .groupBy(_._1).map { case (v, rs) =>
          v -> rs.sortBy(_._2).map(_._3).toList }
      corpus.foreach { case (v, _) =>
        assert(got(v)._1 == expCell(v), s"cell parity broke for vec $v")
        assert(got(v)._2 == expCodes(v), s"code parity broke for vec $v")
      }
    } finally q.stop()
  }

  test("frontier stream: arrival-time admission + scoring equals the batch scores") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    // URLs across the fixture's domain space: an admitted deep page, a
    // robots-blocked domain, a disallowed path, and a crawl-delay domain
    val urls = Seq(
      (101L, "https://www.example.com/docs/101"),
      (102L, "https://ads.tracker.io/px/102"),     // full block
      (103L, "https://www.example.com/src3/103"),  // Disallow: /src3
      (104L, "https://data.example.co.nz/a/104"))  // Crawl-delay: 10
    val mem = MemoryStream[(Long, String)]
    val q = graft.streaming.CorpusStream
      .frontierStream(spark, sfDir, mem.toDF().toDF("doc_id", "url"))
      .writeStream.format("memory").queryName("frontier_out")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(urls: _*)
      q.processAllAvailable()
      val got = spark.table("frontier_out").collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2),
          r.getLong(3)))).toMap
      // blocked/disallowed URLs never surface
      assert(got.keySet == Set(101L, 104L), s"got $got")
      // scores equal the batch formula against the same dimensions
      val ranks = graft.operators.HtmlExtract.domainRank(spark, sfDir)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got(101L)._1 == "example.com" && got(101L)._2 == 2L &&
        got(101L)._3 == ranks("example.com") / (1L * 3L))
      assert(got(104L)._1 == "example.co.nz" &&
        got(104L)._3 == ranks("example.co.nz") / (10L * 3L))
    } finally q.stop()
  }

  test("sitemap stream: arrival-time parse + scope + robots gate equals the batch rows") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    // stream the SAME per-domain bodies the batch fixture synthesizes:
    // the stateless core must reproduce every batch row exactly
    val bodies = Seq(
      ("example.com",
        "<urlset><url><loc>https://www.example.com/doc/1</loc>" +
          "<lastmod>2024-01-05</lastmod></url>" +
          "<url><loc>https://www.example.com/src1/page</loc>" +
          "<lastmod>2024-02-11</lastmod></url>" +
          "<url><loc>https://www.example.com/src12/ok</loc></url>" +
          "<url><loc>https://elsewhere.org/stolen</loc>" +
          "<lastmod>2024-03-01</lastmod></url></urlset>"),
      ("wikipedia.org",
        "<sitemapindex><sitemap><loc>https://en.wikipedia.org/sitemap-0.xml" +
          "</loc><lastmod>2024-04-01</lastmod></sitemap>" +
          "<sitemap><loc>https://en.wikipedia.org/sitemap-1.xml</loc>" +
          "</sitemap></sitemapindex>"))
    val mem = MemoryStream[(String, String)]
    val q = graft.streaming.CorpusStream
      .sitemapStream(spark, sfDir, mem.toDF().toDF("sm_domain", "xml"))
      .writeStream.format("memory").queryName("sitemap_out")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(bodies: _*)
      q.processAllAvailable()
      def key(r: org.apache.spark.sql.Row) =
        (r.getString(0), r.getString(1), r.getString(2),
          if (r.isNullAt(4)) null else r.getString(4), r.getBoolean(5),
          if (r.isNullAt(6)) null else r.getBoolean(6))
      val got = spark.table("sitemap_out").collect().map(key).toSet
      val batch = graft.operators.Domains.sitemapUrls(spark, sfDir)
        .where(col("domain").isin("example.com", "wikipedia.org"))
        .collect().map(key).toSet
      assert(got == batch, s"stream/batch divergence:\n$got\nvs\n$batch")
      assert(got.size == 6)
    } finally q.stop()
  }

  test("deflate gate stream: arrival-time ratio equals batch, repetition flags") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val docs = Seq(
      (1L, ("spam " * 200).trim),
      (2L, (0 until 200).map(i => s"w${i * 2654435761L % 9973}").mkString(" ")))
    val mem = MemoryStream[(Long, String)]
    val q = graft.streaming.CorpusStream
      .deflateGateStream(mem.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("deflate_out")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(docs: _*)
      q.processAllAvailable()
      def canon(rows: Array[org.apache.spark.sql.Row]) =
        rows.map(r => r.toSeq.toList).sortBy(_.head.toString)
      val streamed = canon(spark.table("deflate_out").collect())
      val batch = canon(graft.operators.TextAnalysis
        .compressCols(docs.toDF("doc_id", "text")).collect())
      assert(streamed.toList == batch.toList)
      val flags = spark.table("deflate_out").collect()
        .map(r => r.getLong(0) -> r.getBoolean(5)).toMap
      assert(flags == Map(1L -> true, 2L -> false))
    } finally q.stop()
  }

  test("bm25 ingest stream: appended postings equal the rebuild after each batch") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("bm25s").toString
    val store = new graft.sources.SnapshotStore(root)
    val base = Seq((0L, "apple banana"), (6L, "apple banana pie"))
    val b1 = Seq((9L, "apple apple crust"))
    val b2 = Seq((19L, "banana crust pad"), (29L, "pad pad"))
    store.writeTableSnapshot(
      graft.operators.Retrieval.postingsFromText(base.toDF("doc_id", "text")),
      "bm25_postings", "base")
    val mem = MemoryStream[(Long, String)]
    val q = graft.streaming.CorpusStream
      .bm25IngestStream(spark, store, "base", mem.toDF().toDF("doc_id", "text"))
      .option("checkpointLocation", s"$root/ckpt").start()
    try {
      mem.addData(b1: _*)
      q.processAllAvailable()
      mem.addData(b2: _*)
      q.processAllAvailable()
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(_.toSeq.toList).sortBy(_.toString).toList
      // after batch 0: base + b1; after batch 1: everything
      assert(canon(store.readTableSnapshot(spark, "bm25_postings", "base_b000000")
          .select("doc_id", "term", "tf", "dl")) ==
        canon(graft.operators.Retrieval.postingsFromText(
          (base ++ b1).toDF("doc_id", "text"))))
      assert(canon(store.readTableSnapshot(spark, "bm25_postings", "base_b000001")
          .select("doc_id", "term", "tf", "dl")) ==
        canon(graft.operators.Retrieval.postingsFromText(
          (base ++ b1 ++ b2).toDF("doc_id", "text"))))
      // markers exist, so a replay of either batch id is a no-op
      assert(store.isProcessed("bm25_ingest", "b000000"))
      assert(store.isProcessed("bm25_ingest", "b000001"))
    } finally q.stop()
  }
}
