package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming twins of the batch event analytics
  * (`graft.operators.Events`). The reference itself is batch-only
  * (SURVEY.md §2.7); these are the streaming-native formulations the
  * north-star pipeline needs: `readStream → transform → writeStream`
  * with event-time watermarks for bounded state.
  *
  * Both run on any streaming DataFrame with the events schema
  * (`ts timestamp, user_id long, event_type string, value double`) —
  * file source, Kafka, or MemoryStream in tests.
  */
object EventStream {

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)
  final case class Session(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long, total_value: Double)
  final case class SessionState(start: Long, last: Long, n: Long,
      total: Double)

  /** Tumbling 1-hour windowed aggregate with a 2-hour watermark: late
    * data beyond the watermark is dropped and window state is evicted —
    * the property that keeps state bounded on an unbounded stream. The
    * same (window, type) grouping as the batch `Events.hourly`.
    */
  def hourly(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value")).as("total_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** Streaming exact dedup: drop replayed events by id while only
    * keeping state within the watermark horizon —
    * `dropDuplicatesWithinWatermark` is the streaming twin of the batch
    * `Dedup.exact` groupBy (unbounded `dropDuplicates` state would grow
    * forever on an infinite stream).
    */
  def dedupEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-static enrichment: join the unbounded event stream to a
    * bounded dimension frame (user tier, source metadata, …). Structured
    * Streaming re-plans the static side per micro-batch, so a small dim
    * arrives as a broadcast hash join — no streaming state at all, the
    * cheapest join class a stream can do (and the dim may be re-read
    * from a snapshot store between batches to pick up slowly-changing
    * values). Column pruning applies to the static side as usual.
    */
  def enrich(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(org.apache.spark.sql.functions.broadcast(dim), Seq(key), "left")

  /** Stream → versioned store bridge: every micro-batch lands as an
    * immutable table snapshot (`kind/snapshot_ts=batch-<id>/`) with the
    * latest pointer advanced afterwards — `foreachBatch` is the seam
    * where Structured Streaming hands a plain DataFrame to batch sinks,
    * and the store's marker-last ordering keeps partially-written
    * batches invisible (SURVEY.md §2.8 O3 semantics on a stream).
    */
  def snapshotSink(df: DataFrame, store: graft.sources.SnapshotStore,
      kind: String): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      store.writeTableSnapshot(batch, kind, f"batch-$batchId%06d")
    }

  /** Watermarked stream-stream interval join: attribute each `view` to
    * the `click`s by the same user within the 30 minutes after it — the
    * impression→conversion shape every event pipeline needs. Both sides
    * carry watermarks and the join condition bounds `click.ts` to a
    * range of `view.ts`, which is exactly what lets Spark evict join
    * state: a buffered view can be dropped once the click watermark
    * passes `view.ts + 30 min`, so state stays bounded on unbounded
    * streams (an unconstrained stream-stream join would buffer forever).
    */
  def viewClickJoin(views: DataFrame, clicks: DataFrame): DataFrame = {
    val v = views.where(col("event_type") === "view")
      .withWatermark("ts", "1 hour")
      .select(col("event_id").as("view_id"), col("user_id"),
        col("ts").as("view_ts"))
    val c = clicks.where(col("event_type") === "click")
      .withWatermark("ts", "1 hour")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user_id"),
        col("ts").as("click_ts"), col("value"))
    v.join(c,
      col("user_id") === col("c_user_id") &&
      col("click_ts") >= col("view_ts") &&
      col("click_ts") <= col("view_ts") + expr("INTERVAL 30 MINUTES"))
      .select(col("view_id"), col("click_id"), col("user_id"),
        col("view_ts"), col("click_ts"), col("value"))
  }

  private val GapMs = 30L * 60 * 1000

  final case class Outlier(event_id: Long, event_type: String,
      value: Double, z: Double)
  final case class MomentState(n: Long, sum: Double, sumSq: Double)

  /** Streaming per-type outlier flagging — the streaming twin of the
    * batch `Events.outliers`: running moments (count, sum, sum of
    * squares) per event type via `flatMapGroupsWithState`, flagging an
    * event when it sits beyond three standard deviations of the
    * distribution seen SO FAR (the online formulation — a stream has no
    * second pass, so early events score against less history; the warm-up
    * is gated by a minimum observation count). State is three numbers per
    * event type — O(|types|) total, no watermark needed because it never
    * grows with the stream.
    */
  private val MinObs = 10

  def outliers(events: Dataset[Event]): Dataset[Outlier] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[MomentState, Outlier](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (tpe: String, it: Iterator[Event], state: GroupState[MomentState]) =>
          var s = state.getOption.getOrElse(MomentState(0L, 0.0, 0.0))
          val out = List.newBuilder[Outlier]
          // Constant-memory fold in the iterator's arrival order — the
          // group is NOT buffered (a hot event type in one micro-batch
          // would otherwise materialize fully on the heap). An online
          // detector's emissions are inherently order-dependent — each
          // event scores against the history seen so far — so a
          // within-batch sort would buy batch-local determinism only, at
          // O(batch) memory; cross-batch arrival order is already the
          // stream's own. Moments themselves are order-free (count/sum/
          // sumSq commute), so state converges identically either way.
          it.foreach { e =>
            if (s.n >= MinObs) {
              val mean = s.sum / s.n
              val std = math.sqrt(math.max(s.sumSq / s.n - mean * mean, 0.0))
              if (std > 0 && math.abs(e.value - mean) > 3 * std)
                out += Outlier(e.event_id, tpe, e.value, (e.value - mean) / std)
            }
            s = MomentState(s.n + 1, s.sum + e.value, s.sumSq + e.value * e.value)
          }
          state.update(s)
          out.result().iterator
      }
  }

  final case class SprtDecision(event_type: String, n_seen: Long,
      llr_micro: Long, decision: String)
  final case class SprtState(llr: Long, n: Long, decided: Boolean)

  // Literal twins of Events.sprt's step/bound micro-longs (H0 rate 0.4
  // vs H1 0.5 at value >= 40, alpha = beta = 0.05).
  private val SprtStepSuccess = math.round(1e6 * math.log(0.5 / 0.4))
  private val SprtStepFailure = math.round(1e6 * math.log(0.5 / 0.6))
  private val SprtBound = math.round(1e6 * math.log(0.95 / 0.05))

  /** Streaming Wald SPRT — the per-arrival fold the batch
    * `Events.sprt` scaladoc names as the production path, now real:
    * state per event type is (running integer LLR, events seen,
    * decided), one step per arrival, emitting THE decision row the
    * moment the walk exits the ±ln 19 corridor and nothing after —
    * the sequential test stops at its decision, which is exactly what
    * a fold can do and a batch sort cannot. O(|types|) state, no
    * watermark. For an event_id-ordered feed the decision index
    * equals the batch op's `cross_n` (pinned in StreamingSpec).
    */
  def sprt(events: Dataset[Event]): Dataset[SprtDecision] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[SprtState, SprtDecision](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (tpe: String, it: Iterator[Event], state: GroupState[SprtState]) =>
          var s = state.getOption.getOrElse(SprtState(0L, 0L, decided = false))
          val out = List.newBuilder[SprtDecision]
          it.foreach { e =>
            if (!s.decided) {
              val step =
                if (e.value >= 40.0) SprtStepSuccess else SprtStepFailure
              val llr = s.llr + step
              val n = s.n + 1
              if (llr >= SprtBound) {
                out += SprtDecision(tpe, n, llr, "reject_h0")
                s = SprtState(llr, n, decided = true)
              } else if (llr <= -SprtBound) {
                out += SprtDecision(tpe, n, llr, "accept_h0")
                s = SprtState(llr, n, decided = true)
              } else s = SprtState(llr, n, decided = false)
            }
          }
          state.update(s)
          out.result().iterator
      }
  }

  final case class CusumAlarm(event_type: String, n_seen: Long,
      s_micro: Long)
  final case class CusumState(s: Long, n: Long, above: Boolean)

  // Literal twins of Events.cusum's k/h (kept here so the streaming
  // fold and the batch chart share one parameterization by value).
  private val CusumK = 55000000L
  private val CusumH = 1000000000L

  /** Streaming CUSUM control chart — the per-arrival fold the batch
    * `Events.cusum` scaladoc names as the production path: state per
    * event type is THREE numbers (current statistic S in micro-units,
    * events seen, above-threshold flag), updated
    * S ← max(0, S + (x − k)) per arrival, emitting an alarm row at
    * each upward h-crossing (below → above transition; the recursion
    * here IS the chart — the batch op needs the reflection identity
    * only because it has no fold). O(|types|) state, no watermark.
    * Evidence order is the stream's own arrival order, exactly the
    * online chart's semantics (the `outliers` convention); for an
    * event_id-ordered feed the first alarm index equals the batch
    * chart's `first_alarm_n` — pinned in StreamingSpec.
    */
  def cusum(events: Dataset[Event]): Dataset[CusumAlarm] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[CusumState, CusumAlarm](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (tpe: String, it: Iterator[Event], state: GroupState[CusumState]) =>
          var s = state.getOption.getOrElse(CusumState(0L, 0L, above = false))
          val out = List.newBuilder[CusumAlarm]
          it.foreach { e =>
            val y = math.round(e.value * 1e6) - CusumK
            val next = math.max(0L, s.s + y)
            val n = s.n + 1
            val above = next >= CusumH
            if (above && !s.above) out += CusumAlarm(tpe, n, next)
            s = CusumState(next, n, above)
          }
          state.update(s)
          out.result().iterator
      }
  }

  /** Gap-based sessionization with custom state:
    * `flatMapGroupsWithState` keyed by user, event-time timeout. A
    * session closes when 30 minutes pass with no event (detected either
    * by a later event or by watermark-driven timeout). The streaming
    * equivalent of the batch lag-gap formulation in `Events.sessionize`.
    */
  def sessionize(events: Dataset[Event]): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "2 hours")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(userId, new Timestamp(s.start),
              new Timestamp(s.last), s.n, s.total))
          } else {
            // Session semantics NEED time order, so this one buffers and
            // sorts — bounded by ONE user's events within ONE micro-batch
            // (not the user's history, which lives folded in SessionState).
            // That bound is the operator's memory contract: a single user
            // hot enough to overflow a heap within one micro-batch should
            // be rate-limited upstream or trigger-bounded
            // (maxFilesPerTrigger / maxOffsetsPerTrigger), the standard
            // Structured Streaming knobs for exactly this.
            val events = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var closed = List.empty[Session]
            var cur = state.getOption
            events.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last <= GapMs =>
                  cur = Some(SessionState(s.start, t, s.n + 1, s.total + e.value))
                case Some(s) =>
                  closed ::= Session(userId, new Timestamp(s.start),
                    new Timestamp(s.last), s.n, s.total)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + GapMs)
            }
            closed.reverseIterator
          }
      }
  }

  final case class FunnelState(stage: Int, lastTsMs: Long)
  final case class StageAdvance(user_id: Long, stage: String, ts: Timestamp)

  private val FunnelOrder = Map("view" -> 1, "click" -> 2, "purchase" -> 3)

  /** Streaming twin of the batch `Events.funnel`: per user, advance
    * through view → click → purchase, each stage requiring an event
    * STRICTLY AFTER the previous stage's advance — emitted live as
    * `StageAdvance` rows (a downstream `groupBy(stage).count` is the
    * running funnel). State is two numbers per user — the stage reached
    * and its event time — the O(1)-PER-USER minimum for ordered-funnel
    * semantics. Total state is O(|users|), not O(events): it does not
    * grow with stream LENGTH, but it does grow with user CARDINALITY.
    * `idleEvictMs` is the production valve for that (r5 verdict #4): when
    * set, the stream is watermarked and a user whose last funnel advance
    * is older than the horizon has their state evicted via
    * `EventTimeTimeout` — the `sessionize` precedent. Eviction forgets
    * funnel progress (a late returner restarts from stage 0), so the
    * horizon is a product retention decision and the default stays
    * no-eviction. The timeout timestamp is clamped above the current
    * watermark because Spark rejects a timeout already in the past —
    * a stage-0 user (lastTsMs = MinValue) simply evicts at the next
    * batch, which loses nothing. Per-(user, micro-batch) slices sort
    * under the bounded-memory contract documented at `sessionize`.
    */
  def funnel(events: Dataset[Event],
      idleEvictMs: Option[Long] = None,
      watermarkDelay: String = "2 hours"): Dataset[StageAdvance] = {
    import events.sparkSession.implicits._
    val src = idleEvictMs.fold(events)(_ => events.withWatermark("ts", watermarkDelay))
    val timeoutConf = idleEvictMs.fold(GroupStateTimeout.NoTimeout)(_ =>
      GroupStateTimeout.EventTimeTimeout)
    src
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, StageAdvance](
        OutputMode.Append, timeoutConf) {
        (userId: Long, it: Iterator[Event], state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val batch = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var s = state.getOption.getOrElse(FunnelState(0, Long.MinValue))
            val out = List.newBuilder[StageAdvance]
            batch.foreach { e =>
              FunnelOrder.get(e.event_type).foreach { stage =>
                if (stage == s.stage + 1 &&
                    (s.stage == 0 || e.ts.getTime > s.lastTsMs)) {
                  s = FunnelState(stage, e.ts.getTime)
                  out += StageAdvance(userId, e.event_type, e.ts)
                }
              }
            }
            state.update(s)
            idleEvictMs.foreach { idle =>
              state.setTimeoutTimestamp(
                math.max(s.lastTsMs + idle, state.getCurrentWatermarkMs() + 1))
            }
            out.result().iterator
          }
      }
  }

  final case class SeqExample(user_id: Long, context: Seq[String],
      label: String, ts: Timestamp)

  /** Streaming twin of the batch `Events.sequenceExamples`: per user, in
    * event-time order, every event whose user already has `k` predecessors
    * emits a (context, label) training pair — INCLUDING across micro-batch
    * boundaries, which is the whole point of carrying state (the batch op
    * re-windows the full log; the stream remembers exactly the last `k`
    * event types per user and nothing else). State is a bounded k-list —
    * O(k) per user, O(k·|users|) total — with the same optional
    * `idleEvictMs` EventTimeTimeout valve as `funnel`/`transitions` for
    * unbounded user churn (evicting forgets at most k context tokens; a
    * returning user warms up again after k events, the honest semantics
    * of "their context aged out"). Per-(user, micro-batch) slices sort
    * under the `sessionize` bounded-memory contract.
    */
  def sequenceExamples(events: Dataset[Event], k: Int = 4,
      idleEvictMs: Option[Long] = None,
      watermarkDelay: String = "2 hours"): Dataset[SeqExample] = {
    import events.sparkSession.implicits._
    val src = idleEvictMs.fold(events)(_ => events.withWatermark("ts", watermarkDelay))
    val timeoutConf = idleEvictMs.fold(GroupStateTimeout.NoTimeout)(_ =>
      GroupStateTimeout.EventTimeTimeout)
    src
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[List[String], SeqExample](
        OutputMode.Append, timeoutConf) {
        (userId: Long, it: Iterator[Event], state: GroupState[List[String]]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val batch = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var ctx = state.getOption.getOrElse(Nil) // most recent LAST
            val out = List.newBuilder[SeqExample]
            batch.foreach { e =>
              if (ctx.size >= k)
                out += SeqExample(userId, ctx.takeRight(k), e.event_type, e.ts)
              ctx = (ctx :+ e.event_type).takeRight(k)
            }
            state.update(ctx)
            idleEvictMs.foreach { idle =>
              val last = batch.lastOption.map(_.ts.getTime)
                .getOrElse(Long.MinValue)
              state.setTimeoutTimestamp(
                math.max(last + idle, state.getCurrentWatermarkMs() + 1))
            }
            out.result().iterator
          }
      }
  }

  final case class Transition(user_id: Long, from_type: String, to_type: String)
  final case class LastEvent(tsMs: Long, eventId: Long, tpe: String)

  /** Streaming twin of the batch `Events.transitions`: emit a
    * (from, to) pair for every consecutive event of a user, INCLUDING
    * across micro-batch boundaries — the state is the user's single last
    * event (O(1) per user, the minimum any cross-batch pairing needs; a
    * downstream `groupBy(from, to).count` turns the pair stream into the
    * live transition matrix). As with `funnel`, total state is
    * O(|users|) — bounded per user but growing with user cardinality;
    * `idleEvictMs` is the eviction valve (r5 verdict #4), and here it is
    * safe at ANY horizon: evicting forgets one already-paired event, so
    * the only cost is that an idle user's next event opens no pair —
    * exactly the semantics of "their previous activity aged out". Same
    * `EventTimeTimeout` + watermark-clamp mechanics as `funnel`. Like
    * sessionize, pairing needs time order, so the per-(user, micro-batch)
    * slice is sorted under the same bounded-memory contract documented
    * there.
    */
  def transitions(events: Dataset[Event],
      idleEvictMs: Option[Long] = None,
      watermarkDelay: String = "2 hours"): Dataset[Transition] = {
    import events.sparkSession.implicits._
    val src = idleEvictMs.fold(events)(_ => events.withWatermark("ts", watermarkDelay))
    val timeoutConf = idleEvictMs.fold(GroupStateTimeout.NoTimeout)(_ =>
      GroupStateTimeout.EventTimeTimeout)
    src
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[LastEvent, Transition](
        OutputMode.Append, timeoutConf) {
        (userId: Long, it: Iterator[Event], state: GroupState[LastEvent]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val batch = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            val out = List.newBuilder[Transition]
            var last = state.getOption
            batch.foreach { e =>
              last.foreach(p => out += Transition(userId, p.tpe, e.event_type))
              last = Some(LastEvent(e.ts.getTime, e.event_id, e.event_type))
            }
            last.foreach { l =>
              state.update(l)
              idleEvictMs.foreach { idle =>
                state.setTimeoutTimestamp(
                  math.max(l.tsMs + idle, state.getCurrentWatermarkMs() + 1))
              }
            }
            out.result().iterator
          }
      }
  }

  // ------------------------------------------------------ heavy hitters
  final case class HeavyHitter(shard: Int, user_id: Long, est_count: Long,
      max_overcount: Long)

  /** Streaming heavy hitters: space-saving sketch per shard — the
    * bounded-memory answer to "which users dominate the stream RIGHT
    * NOW". Unlike `funnel`/`transitions` (whose per-user state grows
    * with user cardinality, eviction valve documented there), state here
    * is HARD-bounded at k counters per shard regardless of stream length
    * or user count: a new user beyond capacity inherits the minimum
    * counter's count (recorded as `max_overcount`) and evicts it — the
    * classic space-saving trade. Guarantees (Metwally et al.'s published
    * bounds, restated): est_count ≥ true count ≥ est_count −
    * max_overcount, and any user whose true count in a shard exceeds
    * (shard events)/k is guaranteed present. Sharding by `user_id % S`
    * keeps each group's work parallel; the union of shard sketches is a
    * superset of the global top hitters (merge downstream, or query
    * per-shard). Each micro-batch slice is pre-aggregated before it
    * touches the sketch, and users are applied in sorted order so the
    * sketch content is deterministic for a given batch sequence.
    * Update-mode emission: each batch re-emits the shard's current
    * counters (≤ k rows), newest estimate wins downstream.
    */
  def heavyHitters(events: Dataset[Event], k: Int = 10,
      shards: Int = 4): Dataset[HeavyHitter] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(e => (e.user_id % shards).toInt)
      .flatMapGroupsWithState[Map[Long, (Long, Long)], HeavyHitter](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (shard: Int, it: Iterator[Event],
            state: GroupState[Map[Long, (Long, Long)]]) =>
          var counters = state.getOption.getOrElse(Map.empty[Long, (Long, Long)])
          val slice = it.toSeq.groupBy(_.user_id).view
            .mapValues(_.size.toLong).toSeq.sortBy(_._1)
          slice.foreach { case (u, c) =>
            counters.get(u) match {
              case Some((cnt, err)) =>
                counters = counters.updated(u, (cnt + c, err))
              case None if counters.size < k =>
                counters = counters.updated(u, (c, 0L))
              case None =>
                // evict the deterministic minimum; the newcomer inherits
                // its count as the overcount bound
                val (mu, (mc, _)) =
                  counters.minBy { case (uu, (cc, _)) => (cc, uu) }
                counters = counters - mu + (u -> (mc + c, mc))
            }
          }
          state.update(counters)
          counters.toSeq
            .sortBy { case (u, (c, _)) => (-c, u) }
            .map { case (u, (c, e)) => HeavyHitter(shard, u, c, e) }
            .iterator
      }
  }

  // ------------------------------------------------------ drift monitor
  /** Same fixed value-bucket grid as the batch `Analytics.statsDrift`. */
  private val DriftBuckets = 10
  private val DriftBucketWidth = 50.0

  /** Streaming PSI drift monitor, stage 1: tumbling-window (type,
    * bucket) counts on the statsDrift bucket grid. Append mode after
    * the watermark, so a window emits exactly once — when it can no
    * longer change — which is what makes the downstream PSI of that
    * window FINAL. State is the open windows' ~|types|·|buckets|
    * partial counts: bounded regardless of stream length or user
    * cardinality.
    */
  def windowedBuckets(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"),
        least(floor(col("value") / DriftBucketWidth),
          lit((DriftBuckets - 1).toLong)).cast("long").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("bucket"), col("cnt"))

  /** Stage 2 — pure batch, run inside the `foreachBatch` seam: PSI of
    * each closed window against a baseline count frame `(event_type,
    * bucket, cnt)` (typically last week's counts read from a snapshot).
    * Smoothing follows the batch op (ADVICE r4 form): +1 per bucket
    * observed in the UNION frame, denominator adds the per-(window,
    * type) observed-bucket count, so both masses sum to exactly 1. A
    * type present in the baseline but absent from a window is still
    * scored — against the all-smoothing stream side — because a type
    * that vanished from the stream IS drift. Every frame here is
    * ≤ |windows|·|types|·|buckets| rows: metadata-sized by contract.
    */
  def psiOfWindows(wc: DataFrame, baseline: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.{Window => Frame}
    val wins = wc.select(col("window_start")).distinct()
    val base = baseline.select(col("event_type"), col("bucket"),
      col("cnt").as("bc")).crossJoin(wins)
    val joined = wc
      .join(base, Seq("window_start", "event_type", "bucket"), "full_outer")
      .select(col("window_start"), col("event_type"), col("bucket"),
        coalesce(col("cnt"), lit(0L)).as("c"),
        coalesce(col("bc"), lit(0L)).as("b"))
    val byWT = Frame.partitionBy(col("window_start"), col("event_type"))
    val counts = joined
      .withColumn("n", sum(col("c")).over(byWT))
      .withColumn("bn", sum(col("b")).over(byWT))
      .withColumn("nobs", count(lit(1)).over(byWT))
    val p = (col("c") + 1).cast("double") / (col("n") + col("nobs"))
    val q = (col("b") + 1).cast("double") / (col("bn") + col("nobs"))
    counts
      .select(col("window_start"), col("event_type"),
        ((p - q) * log(p / q)).as("term"))
      .groupBy(col("window_start"), col("event_type"))
      .agg(round(sum(col("term")), 6).as("psi"))
      .withColumn("drifted", col("psi") > 0.2)
  }

  /** The KS companion to `psiOfWindows` over the SAME closed-window
    * bucket counts: D = max |F_window − F_baseline| across the bucket
    * grid — the bin-free-in-spirit shape test (`stats_ks`'s discrete
    * form; the bucket grid is the quantization both distributions
    * already share), where PSI scores mass re-allocation. PSI is
    * smoothing-sensitive and unbounded; D ∈ [0,1] with no smoothing
    * needed — monitoring wants both views. Every frame stays
    * ≤ |windows|·|types|·|buckets| rows, cumulative sums run under
    * (window, type)-partitioned ordering — metadata-sized by contract,
    * never corpus-bound.
    */
  def ksOfWindows(wc: DataFrame, baseline: DataFrame,
      threshold: Double = 0.2): DataFrame = {
    import org.apache.spark.sql.expressions.{Window => Frame}
    val wins = wc.select(col("window_start")).distinct()
    val base = baseline.select(col("event_type"), col("bucket"),
      col("cnt").as("bc")).crossJoin(wins)
    val joined = wc
      .join(base, Seq("window_start", "event_type", "bucket"), "full_outer")
      .select(col("window_start"), col("event_type"), col("bucket"),
        coalesce(col("cnt"), lit(0L)).as("c"),
        coalesce(col("bc"), lit(0L)).as("b"))
    val byWT = Frame.partitionBy(col("window_start"), col("event_type"))
    val cums = joined
      .withColumn("cumc", sum(col("c")).over(byWT.orderBy(col("bucket"))))
      .withColumn("cumb", sum(col("b")).over(byWT.orderBy(col("bucket"))))
      .withColumn("n", sum(col("c")).over(byWT))
      .withColumn("bn", sum(col("b")).over(byWT))
      .where(col("n") > 0 && col("bn") > 0)
    cums
      .select(col("window_start"), col("event_type"),
        abs(col("cumc").cast("double") / col("n") -
          col("cumb").cast("double") / col("bn")).as("d"))
      .groupBy(col("window_start"), col("event_type"))
      .agg(round(max(col("d")), 6).as("ks_d"))
      .withColumn("drifted", col("ks_d") > threshold)
  }

  /** End-to-end wiring: the windowed-bucket stream hands each batch of
    * CLOSED windows to `onAlert` as finalized per-(window, type) PSI
    * rows — the monitoring hook a production pipeline points at its
    * alerting. The baseline stays a plain batch frame re-planned per
    * micro-batch (broadcast-sized by the bucket-grid contract). */
  def driftSink(events: DataFrame, baseline: DataFrame)(
      onAlert: DataFrame => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    windowedBuckets(events).writeStream.outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) onAlert(psiOfWindows(batch, baseline))
      }

  // ------------------------------------------------ conversion attribution

  final case class Touch(channel: String, tsMs: Long, id: Long)
  final case class AttribState(touches: List[Touch], maxTsMs: Long)
  final case class TouchCredit(conv_id: Long, user_id: Long, channel: String,
      is_first: Boolean, is_last: Boolean, linear_micros: Long)

  /** Streaming twin of the batch `Events.attribution`: per user, buffer
    * view/click/signup touches; every purchase emits one `TouchCredit`
    * row PER ELIGIBLE TOUCH — channel, first/last flags, and the linear
    * credit `10⁶ div k` — so a downstream
    * `groupBy(channel).agg(count_if(is_first), count_if(is_last),
    * sum(linear_micros))` reproduces the batch per-channel table live,
    * row for row. Purchases with no eligible touch emit a single
    * `(none)` row flagged both first and last with zero credit, keeping
    * conversion mass auditable exactly as the batch op does.
    *
    * State = the touches inside the lookback horizon plus the max event
    * time seen — pruned per batch at `maxTs − lookback − lateness`, so
    * per-user state is bounded by one lookback window of touches (NOT
    * stream length). The lateness margin keeps a purchase that arrives
    * up to `allowedLatenessMs` out of order from finding its touches
    * already pruned; events later than that are outside the declared
    * reordering contract (the watermark the caller sets should match).
    * Per-(user, micro-batch) slices sort under the bounded-memory
    * contract documented at `sessionize`.
    */
  private val TouchTypes = Set("view", "click", "signup")

  def attribution(events: Dataset[Event],
      lookbackMs: Long = 7L * 24 * 3600 * 1000,
      allowedLatenessMs: Long = 2L * 3600 * 1000): Dataset[TouchCredit] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[AttribState, TouchCredit](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[AttribState]) =>
          var s = state.getOption.getOrElse(AttribState(Nil, Long.MinValue))
          val out = List.newBuilder[TouchCredit]
          val batch = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          batch.foreach { e =>
            val t = e.ts.getTime
            if (TouchTypes(e.event_type)) {
              s = AttribState(Touch(e.event_type, t, e.event_id) :: s.touches,
                math.max(s.maxTsMs, t))
            } else {
              if (e.event_type == "purchase") {
                val eligible = s.touches
                  .filter(x => x.tsMs < t && x.tsMs >= t - lookbackMs)
                  .sortBy(x => (x.tsMs, x.id))
                if (eligible.isEmpty)
                  out += TouchCredit(e.event_id, userId, "(none)",
                    is_first = true, is_last = true, 0L)
                else {
                  val k = eligible.length
                  eligible.zipWithIndex.foreach { case (x, i) =>
                    out += TouchCredit(e.event_id, userId, x.channel,
                      is_first = i == 0, is_last = i == k - 1, 1000000L / k)
                  }
                }
              }
              s = s.copy(maxTsMs = math.max(s.maxTsMs, t))
            }
          }
          val horizon = s.maxTsMs - lookbackMs - allowedLatenessMs
          s = s.copy(touches = s.touches.filter(_.tsMs >= horizon))
          state.update(s)
          out.result().iterator
      }
  }
}
