package graft

import graft.operators.{Analytics, Dedup, Events, Multimodal, TextAnalysis}

class TextEventsSpec extends SparkSpec {

  test("token counts: whitespace vs BPE-ish segmentation") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("tok").toString
    Seq((1L, "hello world 42 x-y")).toDF("doc_id", "text")
      .write.parquet(s"$dir/documents.parquet")
    val r = TextAnalysis.tokens(spark, dir).head()
    assert(r.getLong(1) == 4L) // hello, world, 42, x-y
    assert(r.getLong(2) == 6L) // hello, world, 42, x, -, y
  }

  test("quality flags degenerate docs") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q").toString
    Seq(
      (1L, "the a of the a of the a"),          // all stopwords → drop
      (2L, "meaningful content with the real words here and more")
    ).toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val rows = TextAnalysis.quality(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getBoolean(6)).toMap
    assert(!rows(1L) && rows(2L))
  }

  test("redact scrubs emails and phone runs, counts from raw text") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("pii").toString
    Seq(
      (1L, "write bob.smith+x@example.co.nz or ring 021 555-1234 today"),
      (2L, "clean document with no contact details"),
      (3L, "a@b.com c.d@e.org and +64 9 123 4567"))
      .toDF("doc_id", "text")
      .write.parquet(s"$dir/documents.parquet")
    val rows = TextAnalysis.redact(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getString(1) ==
      "write <EMAIL> or ring <PHONE> today")
    assert(rows(1L).getLong(2) == 1 && rows(1L).getLong(3) == 1)
    assert(rows(2L).getString(1) == "clean document with no contact details")
    assert(rows(2L).getLong(2) == 0 && rows(2L).getLong(3) == 0)
    assert(rows(3L).getString(1) == "<EMAIL> <EMAIL> and <PHONE>")
    assert(rows(3L).getLong(2) == 2 && rows(3L).getLong(3) == 1)
  }

  test("redact_pii: strict IPv4, Luhn-gated cards, planted branches") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("pii2").toString
    // doc_id % 4 selects the planted suffix: 0 = IPs, 1 = valid card,
    // 2 = invalid card, 3 = email+phone
    Seq(
      (4L, "visit 10.0.0.1 and 256.1.1.1 card 5500 0000 0000 0004 now"),
      (5L, "run 12345678901234567890123456 x"),   // 26-digit run: no card
      (6L, "order 1234567890123 ok"),             // 13 digits, Luhn-invalid
      (7L, "embedded a1234567890123456b noise"))  // no word boundary
      .toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val rows = TextAnalysis.redactPii(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    def n(id: Long, c: String) =
      rows(id).getLong(rows(id).fieldIndex(c))
    // doc 4: own 10.0.0.1 + planted 192.168.1.77; 256.1.1.1 is NOT an IP
    assert(n(4L, "n_ipv4") == 2)
    // own Mastercard test PAN is Luhn-valid
    assert(n(4L, "n_card_candidates") == 1 && n(4L, "n_cards_luhn") == 1)
    val red4 = rows(4L).getString(1)
    assert(red4.contains("visit <IP>") && red4.contains("card <CARD> now"))
    assert(red4.contains("srv <IP>")) // planted valid IP
    // invalid-octet IPs degrade to phone-shaped, never to <IP>
    assert(!red4.contains("256.1.1.1") && red4.contains("and <PHONE>"))
    // doc 5: a 26-digit run has no boundary-terminated card sub-match;
    // only the planted Luhn-valid Visa counts
    assert(n(5L, "n_card_candidates") == 1 && n(5L, "n_cards_luhn") == 1)
    // doc 6: own 13-digit run + planted dashed card are candidates,
    // both Luhn-invalid
    assert(n(6L, "n_card_candidates") == 2 && n(6L, "n_cards_luhn") == 0)
    assert(rows(6L).getString(1).contains("order <CARD> ok"))
    // doc 7: digits embedded in a word never match the CARD pattern
    // (boundary-anchored); the legacy unanchored phone pattern still
    // grabs the run — text_redact's inherited behavior, kept as-is
    assert(n(7L, "n_card_candidates") == 0)
    assert(n(7L, "n_emails") == 1)
    assert(rows(7L).getString(1).contains("a<PHONE>b"))
    assert(rows(7L).getString(1).contains("mail <EMAIL> or <PHONE>"))
  }

  test("chunk: 64-token windows at stride 48, clamped tail") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("chunk").toString
    val words = (1 to 100).map(i => s"w$i")
    Seq((1L, words.mkString(" ")), (2L, "short doc"))
      .toDF("doc_id", "text")
      .write.parquet(s"$dir/documents.parquet")
    val rows = TextAnalysis.chunk(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getString(3))).toMap
    // doc 1: 100 tokens -> starts 0, 48, 96 -> lengths 64, 52, 4
    assert(rows((1L, 0L))._1 == 64)
    assert(rows((1L, 0L))._2.startsWith("w1 w2 ") && rows((1L, 0L))._2.endsWith(" w64"))
    assert(rows((1L, 1L))._1 == 52)
    assert(rows((1L, 1L))._2.startsWith("w49 ") && rows((1L, 1L))._2.endsWith(" w100"))
    assert(rows((1L, 2L)) == ((4L, "w97 w98 w99 w100")))
    // doc 2: one clamped chunk
    assert(rows((2L, 0L)) == ((2L, "short doc")))
    assert(rows.size == 4)
  }

  test("tfidf top terms: integer rank order tf desc, df asc, term asc") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("tfidf").toString
    Seq((1L, "a a b"), (2L, "a c"))
      .toDF("doc_id", "text")
      .write.parquet(s"$dir/documents.parquet")
    val rows = TextAnalysis.tfidfTop(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getString(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    // doc 1: a tf=2 first; b tf=1 second
    assert(rows((1L, 1L))._1 == "a" && rows((1L, 1L))._2 == 2)
    assert(rows((1L, 2L))._1 == "b")
    // doc 2: tf tie broken by df asc -> c (df=1) before a (df=2)
    assert(rows((2L, 1L))._1 == "c")
    assert(rows((2L, 2L))._1 == "a")
    // idf of a term present in every doc is ln(1) = 0
    assert(rows((2L, 2L))._4 == 0.0)
    assert(rows.size == 4)
  }

  test("interval join matches within window across band boundaries only") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("iv").toString
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def ev(id: Long, tp: String, sec: Long) =
      (id, new java.sql.Timestamp(t0 + sec * 1000L), 7L, tp, 1.0, "{}")
    // band width = window = 14400 s. View late in band 0; clicks:
    // in-window same band, in-window next band, exactly at window edge
    // (excluded, half-open), before the view (excluded), other user.
    val rows = Seq(
      ev(1L, "view", 14000),
      ev(2L, "click", 14100),          // +100 s, same band
      ev(3L, "click", 20000),          // +6000 s, next band
      ev(4L, "click", 14000 + 14400),  // exactly +window: excluded
      ev(5L, "click", 13000),          // before the view: excluded
      (6L, new java.sql.Timestamp(t0 + 14100 * 1000L), 8L, "click", 1.0, "{}")) // other user
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    rows.write.parquet(s"$dir/events.parquet")
    val got = Events.intervalJoin(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    assert(got == Set((1L, 2L, 100L), (1L, 3L, 6000L)))
  }

  test("incremental dedup drops history collisions and batch self-dups") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("incr").toString
    val prefix = (1 to 20).map(i => s"p$i").mkString(" ")
    val other = (1 to 20).map(i => s"q$i").mkString(" ")
    Seq(
      (2L, s"$prefix historical tail"),     // history owns this prefix
      (3L, s"$prefix new tail"),            // batch: collides with history
      (5L, s"$other first batch copy"),     // batch: first of a batch pair
      (7L, s"$other second batch copy"),    // batch: later copy, dropped
      (9L, "entirely fresh document body")) // batch: kept
      .toDF("doc_id", "text")
      .write.parquet(s"$dir/documents.parquet")
    val kept = Dedup.incremental(spark, dir).collect().map(_.getLong(0)).toSet
    assert(kept == Set(5L, 9L))
  }

  test("hash-embed: repeated token accumulates in one signed slot") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("hemb").toString
    Seq((1L, "x x x"), (2L, "x x x"), (3L, "completely different words here"))
      .toDF("doc_id", "text")
      .write.parquet(s"$dir/documents.parquet")
    val rows = TextAnalysis.hashEmbed(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2), r.getLong(3))).toMap
    // one distinct token, three occurrences: a single slot at ±3
    assert(rows(1L)._2 == 3.0 && rows(1L)._3 == 1)
    assert(rows(1L)._1.split(",").map(_.toInt).count(_ != 0) == 1)
    assert(rows(1L)._1.split(",").map(_.toInt).find(_ != 0).exists(v => v == 3 || v == -3))
    // featurization is deterministic: identical text -> identical vector
    assert(rows(1L)._1 == rows(2L)._1)
    // 64 slots always materialize, dense and fixed-width
    assert(rows(3L)._1.split(",").length == 64)
  }

  test("fast hash-embed: same sketch family stats as the md5 form, claims hold") {
    // The xxhash64 variant swaps the hash family, not the featurization:
    // both are uniform hashes into 64 signed slots, so corpus-level
    // sketch statistics (mean occupied slots, mean vector norm) must
    // agree closely even though individual slots differ.
    def stats(df: org.apache.spark.sql.DataFrame): (Long, Double, Double) = {
      import org.apache.spark.sql.functions._
      val r = df.agg(count(lit(1)), avg(col("nnz")), avg(col("l2norm"))).collect()(0)
      (r.getLong(0), r.getDouble(1), r.getDouble(2))
    }
    val (nM, nnzM, l2M) = stats(TextAnalysis.hashEmbed(spark, sfDir))
    val (nF, nnzF, l2F) = stats(TextAnalysis.hashEmbedFast(spark, sfDir))
    assert(nM == nF, "both variants must featurize every document")
    // Tolerance note: the fixture draws from a small shared vocabulary,
    // so each family's FIXED vocab→slot mapping is one lottery draw with
    // a std of a few slots (measured md5=20.0 vs xxhash64=16.9 mean
    // occupied) — 25% bounds family luck while still failing a skewed
    // or degenerate slot projection, as does the absolute floor.
    assert(nnzF > 8, s"fast variant's slots collapsed: mean nnz $nnzF")
    assert(math.abs(nnzM - nnzF) / nnzM < 0.25,
      s"mean nnz diverged: md5=$nnzM fast=$nnzF")
    assert(math.abs(l2M - l2F) / l2M < 0.25,
      s"mean l2norm diverged: md5=$l2M fast=$l2F")
    // and the conservation claims the oracle checks are all true
    val checks = TextAnalysis.hashEmbedFastCheck(spark, sfDir).collect()
    assert(checks.length.toLong == nF)
    checks.foreach { r =>
      assert(r.getBoolean(1) && r.getBoolean(2) && r.getBoolean(3),
        s"doc ${r.getLong(0)} failed a conservation claim")
    }
  }

  test("outliers: only the extreme value exceeds 3 sigma") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("outl").toString
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val rows = (1L to 10L).map(i => (i, t0, 7L, "click", 10.0, "{}")) :+
      ((11L, t0, 7L, "click", 1000.0, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    // n=11, mean=100, var=(10*100+1e6)/11 - 1e4 = 81000, std=284.6:
    // |1000-100|=900 > 3*std=853.9; |10-100|=90 is far below.
    val got = Events.outliers(spark, dir).collect()
    assert(got.map(_.getLong(0)).toSet == Set(11L))
    assert(math.abs(got.head.getDouble(3) - 900.0 / math.sqrt(81000.0)) < 1e-6)
  }

  test("sessionize: gap >30min splits, <=30min continues") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ev").toString
    def t(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 ${min / 60}%02d:${min % 60}%02d:00")
    Seq(
      (1L, t(0), 7L, "click", 1.0, "{}"),
      (2L, t(30), 7L, "click", 1.0, "{}"),   // exactly 30 min → same session
      (3L, t(61), 7L, "click", 1.0, "{}")    // 31 min gap → new session
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    // the fixture loader special-cases `events` nanos; plain timestamps work too
    val sessions = Events.sessionize(spark, dir)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(sessions == Set((1L, 2L), (2L, 1L))) // (session_seq, n_events)
  }

  test("funnel: stages require strictly-ordered view → click → purchase") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("fun").toString
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 12:00:00").getTime
    def ev(id: Long, user: Long, typ: String, offSec: Int) =
      (id, new java.sql.Timestamp(t0 + offSec * 1000L), user, typ, 1.0, "{}")
    Seq(
      ev(1L, 7L, "view", 0), ev(2L, 7L, "click", 10), ev(3L, 7L, "purchase", 20),
      ev(4L, 8L, "click", 0),                       // click with no view: nowhere
      ev(5L, 9L, "click", 0), ev(6L, 9L, "view", 10) // click BEFORE view: stage 1 only
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val rows = Events.funnel(spark, dir).collect()
      .map(r => r.getString(1) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(rows("view") == ((2L, 1.0)))     // users 7 and 9
    assert(rows("click") == ((1L, 0.5)))    // only user 7 clicked after viewing
    assert(rows("purchase") == ((1L, 1.0)))
  }

  test("transitions: consecutive pairs per user, cross-user pairs excluded") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("tr").toString
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 12:00:00").getTime
    def ev(id: Long, user: Long, typ: String, offSec: Int) =
      (id, new java.sql.Timestamp(t0 + offSec * 1000L), user, typ, 1.0, "{}")
    Seq(
      ev(1L, 7L, "view", 0), ev(2L, 7L, "click", 10), ev(3L, 7L, "click", 20),
      ev(4L, 8L, "purchase", 5) // single event: no transition
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val m = Events.transitions(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(m == Map(("view", "click") -> 1L, ("click", "click") -> 1L))
  }

  test("retention: cohort day from first event, offsets count distinct users") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ret").toString
    def t(day: Int) = java.sql.Timestamp.valueOf(f"2024-01-${day + 1}%02d 09:00:00")
    Seq(
      (1L, t(0), 7L, "view", 1.0, "{}"),
      (2L, t(2), 7L, "view", 1.0, "{}"),  // day-2 return
      (3L, t(0), 8L, "view", 1.0, "{}"),
      (4L, t(0), 8L, "click", 1.0, "{}")  // same day, same user: one active day
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val m = Events.retention(spark, dir).collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(m == Map(0L -> 2L, 2L -> 1L))
  }

  test("gapfill: missing interior days land as zero rows, spans stay per-type") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("gap").toString
    def t(day: Int) = java.sql.Timestamp.valueOf(f"2024-01-$day%02d 09:00:00")
    Seq(
      (1L, t(1), 7L, "view", 1.0, "{}"),
      (2L, t(1), 8L, "view", 1.0, "{}"),
      (3L, t(4), 7L, "view", 1.0, "{}"),  // days 2,3 are gaps for view
      (4L, t(2), 7L, "click", 1.0, "{}")  // click spans a single day: no gaps
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val rows = Events.gapfill(spark, dir).collect()
      .map(r => (r.getString(0), r.getDate(1).toString) ->
        (r.getLong(2), r.getBoolean(3))).toMap
    assert(rows == Map(
      ("view", "2024-01-01") -> ((2L, false)),
      ("view", "2024-01-02") -> ((0L, true)),
      ("view", "2024-01-03") -> ((0L, true)),
      ("view", "2024-01-04") -> ((1L, false)),
      ("click", "2024-01-02") -> ((1L, false))))
  }

  test("locf: gap days carry the last observed mean forward, not zero") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("locf").toString
    def t(day: Int) = java.sql.Timestamp.valueOf(f"2024-01-$day%02d 09:00:00")
    Seq(
      (1L, t(1), 7L, "m", 10.0, "{}"),
      (2L, t(1), 8L, "m", 20.0, "{}"),  // day 1 mean 15
      (3L, t(4), 7L, "m", 40.0, "{}")   // days 2,3 missing → carry 15
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val rows = Events.gapfillLocf(spark, dir).collect()
      .map(r => r.getDate(1).toString -> (r.getBoolean(2), r.getDouble(3))).toMap
    assert(rows("2024-01-01") == ((false, 15.0)))
    assert(rows("2024-01-02") == ((true, 15.0)))
    assert(rows("2024-01-03") == ((true, 15.0)))
    assert(rows("2024-01-04") == ((false, 40.0)))
  }

  test("funnel latency: first purchase after first view; pre-view purchase ignored") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("flat").toString
    def t(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 ${min / 60}%02d:${min % 60}%02d:00")
    Seq(
      (1L, t(10), 7L, "view", 1.0, "{}"),
      (2L, t(70), 7L, "purchase", 1.0, "{}"),   // 60 min after first view
      (3L, t(90), 7L, "purchase", 1.0, "{}"),   // later purchase ignored
      (4L, t(5), 8L, "purchase", 1.0, "{}"),    // BEFORE any view: no conversion
      (5L, t(20), 8L, "view", 1.0, "{}"),
      (6L, t(30), 9L, "view", 1.0, "{}")        // never purchases
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val r = Events.funnelLatency(spark, dir).head()
    assert(r.getLong(0) == 1L)                   // only user 7 converts
    assert(r.getDouble(2) == 3600.0 && r.getLong(4) == 3600L)
  }

  test("cooccurrence: lift from constructed baskets, same-type pairs excluded") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cooc").toString
    def t(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 ${min / 60}%02d:${min % 60}%02d:00")
    // baskets: (u7,h0): view+click; (u7,h1): view; (u8,h0): click
    // n_baskets=3, n(view)=2, n(click)=2, n(view,click)=1
    // lift = 1*3/(2*2) = 0.75
    Seq(
      (1L, t(10), 7L, "view", 1.0, "{}"),
      (2L, t(20), 7L, "click", 1.0, "{}"),
      (3L, t(15), 7L, "view", 1.0, "{}"),   // dup type in basket: distinct
      (4L, t(70), 7L, "view", 1.0, "{}"),
      (5L, t(30), 8L, "click", 1.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val rows = Events.cooccurrence(spark, dir).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert((r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)) ==
      (("click", "view", 1L, 0.75)))
  }

  test("wau sketch: exact at small cardinality, window framing matches the exact twin") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("wau").toString
    def d(day: Int, u: Long, id: Long) =
      (id, java.sql.Timestamp.valueOf(f"2024-01-$day%02d 10:00:00"), u, "view", 1.0, "{}")
    // day 1: users 1,2; day 5: user 3; day 9: user 1 (day 1 falls out of
    // day 9's trailing week); day 3 has no events → no output row
    Seq(d(1, 1L, 1), d(1, 2L, 2), d(5, 3L, 3), d(9, 1L, 4))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val approx = Events.wauSketch(spark, dir).collect()
      .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    // HLL is exact at these cardinalities
    assert(approx == Map("2024-01-01" -> 2L, "2024-01-05" -> 3L,
      "2024-01-09" -> 2L))
    val check = Events.wauSketchCheck(spark, dir).collect()
    assert(check.length == 3 && check.forall(_.getBoolean(2)))
  }

  test("dq checks: planted violations are counted per rule") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("dq").toString
    val d0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    Seq(
      (1L, 1L, "O", 10.0, d0, "1-URGENT"),
      (2L, 1L, "O", -5.0, d0, "1-URGENT"),  // nonpositive price
      (3L, 1L, "O", 10.0, java.sql.Timestamp.valueOf("2031-01-01 00:00:00"), "x")
    ).toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority").write.parquet(s"$dir/orders.parquet")
    Seq((1L, 1L, 1L, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", d0),
      (99L, 1L, 1L, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", d0))  // orphan key 99
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .write.parquet(s"$dir/lineitem.parquet")
    Seq((1L, d0, 7L, "view", Double.NaN, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    Seq((1L, "  ", "en", "s", 2L), (2L, "ok", "en", "s", 2L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val m = Analytics.dqChecks(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(m("orders.o_totalprice_nonpositive") == ((1L, 3L)))
    assert(m("orders.o_orderdate_out_of_range") == ((1L, 3L)))
    assert(m("events.value_nan_or_null") == ((1L, 1L)))
    assert(m("documents.text_empty_or_null") == ((1L, 2L)))
    assert(m("lineitem.l_orderkey_orphan")._1 == 1L)
  }

  test("repetition: duplicate-bigram fraction and top share") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("rep").toString
    Seq(
      (1L, "a b a b a b", "en", "s", 11L), // bigrams: ab,ba,ab,ba,ab → 5 total, 2 distinct
      (2L, "x y z w", "en", "s", 7L)       // all distinct
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val m = TextAnalysis.repetition(spark, dir).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getBoolean(5))).toMap
    assert(m(1L) == ((5L, 2L, 0.6, 0.6, true)))
    assert(m(2L) == ((3L, 3L, 0.0, round6(1.0 / 3), false)))
  }

  test("perplexity: unigram cross-entropy from corpus counts") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ppl").toString
    Seq(
      (1L, "a a", "en", "s", 3L),
      (2L, "a b", "en", "s", 3L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    // corpus: a×3, b×1, total 4 → p(a)=.75, p(b)=.25
    val m = TextAnalysis.perplexity(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(m(1L)._1 == 2L)
    assert(math.abs(m(1L)._2 - (-math.log(0.75))) < 1e-3)
    assert(math.abs(m(2L)._2 - (-(math.log(0.75) + math.log(0.25)) / 2)) < 1e-3)
  }

  test("lang confusion: diagonal for marker text, row shares sum to 1") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("conf").toString
    Seq(
      (1L, "the cat and the dog of a house", "en", "s", 30L), // en → en
      (2L, "el perro y la casa de verdad", "es", "s", 28L),   // es → es
      (3L, "the cat and the dog of a house", "es", "s", 30L), // mislabeled
      (4L, "zzz qqq www", "en", "s", 11L)                     // no markers → und
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = TextAnalysis.langConfusion(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got(("en", "en"))._1 == 1L && got(("en", "und"))._1 == 1L)
    assert(got(("es", "es"))._1 == 1L && got(("es", "en"))._1 == 1L,
      s"mislabeled doc missed: $got")
    // per-declared-language shares sum to 1
    got.keys.map(_._1).toSet.foreach { l: String =>
      val s = got.collect { case ((`l`, _), (_, share)) => share }.sum
      assert(math.abs(s - 1.0) < 1e-6, s"$l shares: $s")
    }
  }

  test("bigram LM: Laplace-smoothed conditionals, hand-computed") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("blm").toString
    Seq(
      (1L, "a b a b", "en", "s", 7L),
      (2L, "a b", "en", "s", 3L),
      (3L, "c", "en", "s", 1L)    // single token: no bigrams, excluded
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    // unigrams: a×3, b×3, c×1 → V=3; bigrams: (a,b)×3, (b,a)×1
    // P(b|a) = (3+1)/(3+3) = 2/3; P(a|b) = (1+1)/(3+3) = 1/3
    val m = TextAnalysis.bigramLm(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(!m.contains(3L))
    assert(m(1L)._1 == 3L && m(2L)._1 == 1L)
    val h1 = -(2 * math.log(2.0 / 3) + math.log(1.0 / 3)) / 3
    assert(math.abs(m(1L)._2 - h1) < 1e-3, s"doc1: ${m(1L)._2} vs $h1")
    assert(math.abs(m(2L)._2 - (-math.log(2.0 / 3))) < 1e-3)
    // boilerplate (frequent bigrams) scores strictly below novel order
    assert(m(2L)._2 < m(1L)._2)
  }

  test("rag retrieval: a copied chunk ranks first, own-doc chunks never appear") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("rag").toString
    val shared = (1 to 60).map(i => s"tok$i").mkString(" ")
    val noise = (100 to 160).map(i => s"other$i").mkString(" ")
    Seq(
      (1L, shared, "en", "s", 100L),           // query doc (doc_id < 5)
      (10L, shared, "en", "s", 100L),          // exact copy in the corpus
      (11L, noise, "en", "s", 100L))           // unrelated
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val rows = graft.operators.TextAnalysis.ragChunkTopk(spark, dir).collect()
    val q = 1L * 4096 // doc 1, chunk 0
    val mine = rows.filter(_.getLong(0) == q)
    assert(mine.nonEmpty)
    // rank 1 is doc 10's copied chunk at cosine 1
    val first = mine.find(_.getLong(1) == 1L).get
    assert(first.getLong(2) == 10L * 4096)
    assert(math.abs(first.getDouble(3) - 1.0) < 1e-6)
    // no neighbor from the query's own document
    assert(rows.forall(r => r.getLong(2) / 4096 != r.getLong(0) / 4096))
  }

  test("rag retrieval plan: query side broadcast, pair rows never shuffled") {
    val df = graft.operators.TextAnalysis.ragChunkTopk(spark, sfDir)
    assert(df.count() > 0)
    val plan = df.queryExecution.executedPlan.toString
    // the Q×N scoring join must be a broadcast of the dense query
    // vectors, not a shuffle of pair/posting rows
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"query side not broadcast:\n$plan")
    // the per-query top-k aggregate must have a partial (map-side)
    // phase, so what crosses the final exchange is bounded k-buffers,
    // not raw scored pairs
    assert(plan.contains("partial_topkagg"),
      s"TopKAgg has no partial phase:\n$plan")
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("multimodal meta: md5 + pseudo-dims fallback for non-image bytes") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("mm").toString
    Seq((0L, "abc", "en", "s", 3L)).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val r = Multimodal.meta(spark, dir).head()
    assert(r.getString(1) == "image")
    assert(r.getLong(2) == 3L)
    assert(r.getString(3) == "900150983cd24fb0d6963f7d28e17f72") // md5("abc")
    assert(r.getInt(4) == 19 && r.getInt(5) == 19 && r.getInt(6) == 3)
  }

  test("active users: WAU unions the trailing week, DAU counts the day") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("dau").toString
    def t(day: Int) = java.sql.Timestamp.valueOf(f"2024-01-$day%02d 12:00:00")
    Seq(
      (1L, t(1), 10L, "view", 1.0, "{}"),
      (2L, t(1), 11L, "view", 1.0, "{}"),
      (3L, t(1), 10L, "click", 1.0, "{}"),  // same user+day: counts once
      (4L, t(5), 10L, "view", 1.0, "{}"),   // returns within the week
      (5L, t(5), 12L, "view", 1.0, "{}"),
      (6L, t(20), 10L, "view", 1.0, "{}"))  // far later: fresh window
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val got = Events.activeUsers(spark, dir).collect()
      .map(r => r.getDate(0).toString -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got("2024-01-01") == ((2L, 2L)))
    // day 5: DAU {10,12}; WAU = union of day1 {10,11} and day5 {10,12}
    assert(got("2024-01-05") == ((2L, 3L)))
    assert(got("2024-01-20") == ((1L, 1L)))
    assert(got.keySet == Set("2024-01-01", "2024-01-05", "2024-01-20"),
      s"phantom trailing days present: ${got.keySet}")
  }

  test("seasonal anomalies: spike vs own hour-of-day baseline, peaks stay quiet") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("seas").toString
    def t(day: Int, hour: Int, m: Int) =
      java.sql.Timestamp.valueOf(f"2024-01-$day%02d $hour%02d:$m%02d:00")
    var id = 0L
    def burst(day: Int, hour: Int, n: Int) = (1 to n).map { i =>
      id += 1; (id, t(day, hour, i % 60), 1L, "click", 1.0, "{}")
    }
    // hour 3 baseline: 5/day over 9 days, then a 40-event spike day 10.
    // hour 15 is ALWAYS busy (40/day): peak load is normal, not anomalous.
    val rows = (1 to 9).flatMap(d => burst(d, 3, 5) ++ burst(d, 15, 40)) ++
      burst(10, 3, 40) ++ burst(10, 15, 40)
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val got = Events.seasonal(spark, dir).collect()
      .map(r => (r.getDate(1).toString, r.getLong(2)) -> r.getDouble(4)).toMap
    assert(got.contains(("2024-01-10", 3L)), s"spike not flagged: $got")
    assert(got(("2024-01-10", 3L)) > 2)
    assert(!got.keys.exists(_._2 == 15L), s"busy-but-normal hour flagged: $got")
  }

  test("MAD outliers: hand-computed modified z, zero-MAD type excluded") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("mad").toString
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val rows =
      // type "a": 20×10.0, 20×10.5, one 1000.0 → median 10.5 (21st of
      // 41), dev median 0.5, so mz(1000) = 0.6745·989.5/0.5 = 1334.8355
      (1 to 20).map(i => (i.toLong, t0, 1L, "a", 10.0, "{}")) ++
      (21 to 40).map(i => (i.toLong, t0, 1L, "a", 10.5, "{}")) ++
      Seq((41L, t0, 1L, "a", 1000.0, "{}")) ++
      // type "b": constant but one spike → MAD = 0, type excluded
      (50 to 60).map(i => (i.toLong, t0, 1L, "b", 7.0, "{}")) ++
      Seq((61L, t0, 1L, "b", 9999.0, "{}"))
    val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    // null values must not shift the quantiles (the oracle ignores them)
    val withNulls = df.union(Seq((90L, t0, 1L, "a", Double.NaN, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("value", org.apache.spark.sql.functions.lit(null)
        .cast("double")))
    withNulls.write.parquet(s"$dir/events.parquet")
    val got = Events.outliersMad(spark, dir).collect()
    assert(got.map(_.getLong(0)).toSet == Set(41L),
      s"expected only the type-a spike: ${got.mkString(", ")}")
    assert(math.abs(got.head.getDouble(3) - 1334.8355) < 1e-4)
  }

  test("attribution: credit mass conserves across first/last/linear views") {
    val rows = Events.attribution(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rows.keySet == Set("view", "click", "signup", "(none)"),
      rows.keySet.toString)
    // sf0.001 fixture: 202 purchases, 195 of them with ≥1 touch in the
    // 7-day lookback (duckdb-probed) — the (none) row carries the rest
    assert(rows("(none)") == (7L, 7L, 0L), rows("(none)").toString)
    val channels = (rows - "(none)").values
    // exactly one first and one last touch per attributed conversion
    assert(channels.map(_._1).sum == 195L)
    assert(channels.map(_._2).sum == 195L)
    // linear micro-credits: ≤ 10⁶ per conversion, short only by the
    // per-conversion floor-division remainder (< k ≤ all touches)
    val linear = channels.map(_._3).sum
    assert(linear <= 195L * 1000000L && linear > 194L * 1000000L,
      s"linear mass $linear")
  }

  test("stats_power: moments match a scalar recomputation; sizing formulas hold") {
    import org.apache.spark.sql.functions.col
    val byType = Analytics.statsPower(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    val raw = Tables(spark, sfDir, "events")
      .where(col("value").isNotNull)
      .select(col("event_type"), col("value")).collect()
      .groupBy(_.getString(0)).view
      .mapValues(_.map(r => BigDecimal(r.getDouble(1))
        .setScale(2, BigDecimal.RoundingMode.HALF_UP))).toMap
    byType.foreach { case (t, row) =>
      val vs = raw(t)
      val n = vs.length.toLong
      assert(row.getLong(1) == n, s"$t n")
      val sx = vs.sum; val sxx = vs.map(v => v * v).sum
      val mean = sx.toDouble / n
      val variance = (sxx.toDouble - sx.toDouble * sx.toDouble / n) / (n - 1)
      assert(math.abs(row.getDouble(2) - mean) < 1e-6, s"$t mean")
      assert(math.abs(row.getDouble(3) - math.sqrt(variance)) < 1e-6, s"$t sd")
      val mde = 2.801585 * math.sqrt(2.0 * variance / n)
      assert(math.abs(row.getDouble(4) - mde) < 1e-6, s"$t mde")
      val nReq = math.ceil(2.801585 * 2.801585 * 2.0 * variance /
        (0.05 * mean * (0.05 * mean))).toLong
      assert(row.getLong(5) == nReq, s"$t n_req")
      // more data → smaller detectable effect at the same variance
      assert(row.getDouble(4) > 0 && row.getLong(5) > 0)
    }
  }

  test("vocab growth: monotone curves ending at exact per-source totals") {
    import org.apache.spark.sql.functions.{col, trim, split, explode}
    val rows = TextAnalysis.vocabGrowth(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val docs = Tables(spark, sfDir, "documents")
      .select(col("source"), col("doc_id"),
        explode(split(trim(col("text")), " ")).as("w")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    rows.groupBy(_._1).foreach { case (src, rs) =>
      val sorted = rs.sortBy(_._2)
      // both running sums strictly ordered the way a prefix sum must be
      sorted.sliding(2).foreach {
        case Array((_, _, t1, v1), (_, _, t2, v2)) =>
          assert(t2 > t1, s"$src tokens not increasing")
          assert(v2 >= v1, s"$src vocab decreased")
        case _ =>
      }
      val mine = docs.filter(_._1 == src)
      assert(sorted.last._3 == mine.length.toLong, s"$src token total")
      assert(sorted.last._4 == mine.map(_._3).distinct.length.toLong,
        s"$src vocab total")
      // Heaps: vocabulary grows sublinearly — strictly fewer distinct
      // words than tokens once any word repeats
      assert(sorted.last._4 <= sorted.last._3)
    }
  }

  test("entropy report: event_type entropy matches a scalar recompute") {
    import org.apache.spark.sql.functions.col
    val rows = Analytics.statsEntropy(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(rows.keySet == Set("events.event_type", "documents.lang",
      "documents.source"), rows.keySet.toString)
    val counts = Tables(spark, sfDir, "events")
      .groupBy(col("event_type")).count().collect().map(_.getLong(1))
    val n = counts.sum
    // exact-sum recompute: per-category c·ln(c) terms rounded to the
    // same DECIMAL(30,10) grid, summed exactly, one final expression
    val sclnc = counts.map(c => BigDecimal(c.toDouble * math.log(c.toDouble))
      .setScale(10, BigDecimal.RoundingMode.HALF_UP)).sum
    val h = math.log(n.toDouble) - sclnc.toDouble / n
    val (gn, gk, gh, gnorm) = rows("events.event_type")
    assert(gn == n && gk == counts.length.toLong)
    assert(math.abs(gh - h) < 1e-6, s"H $gh vs $h")
    assert(math.abs(gnorm - h / math.log(counts.length.toDouble)) < 1e-6)
    // five near-uniform event types: normalized entropy close to 1;
    // all entropies within [0, ln k]
    assert(gnorm > 0.9 && gnorm <= 1.0)
    rows.values.foreach { case (_, k, ent, nm) =>
      assert(ent >= 0.0 && ent <= math.log(k.toDouble) + 1e-9)
      assert(nm >= 0.0 && nm <= 1.0 + 1e-9)
    }
  }

  test("mutual information: determined pair saturates, independent pair is zero") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // X == Y: MI = H(X) exactly, norm_mi = 1
    val dep = (Seq.fill(3)(("x", "x")) ++ Seq.fill(5)(("y", "y")))
      .toDF("u", "v")
    val d = Analytics.miOf(dep, col("u"), col("v"), "dep").head()
    val h = math.log(8) - (3 * math.log(3) + 5 * math.log(5)) / 8
    assert(math.abs(d.getDouble(2) - h) < 2e-6, s"mi ${d.getDouble(2)} vs $h")
    assert(math.abs(d.getDouble(5) - 1.0) < 2e-6, s"norm ${d.getDouble(5)}")
    // uniform independent 2x2: every cell term ln(1*4/(2*2)) = ln 1 = 0
    val ind = Seq(("x", "p"), ("x", "q"), ("y", "p"), ("y", "q"))
      .toDF("u", "v")
    val i = Analytics.miOf(ind, col("u"), col("v"), "ind").head()
    assert(i.getDouble(2) == 0.0 && i.getDouble(5) == 0.0, i.toString)
  }

  test("mutual information: fixture marginals cross-check stats_entropy, bounds hold") {
    val mi = Analytics.mutualInfo(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    val ent = Analytics.statsEntropy(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    // the pair's marginal entropy must reproduce the entropy op's value
    // (same formula, cell-sharded term grouping -> tiny decimal dust)
    assert(math.abs(mi("events.type*dow").getDouble(3) -
      ent("events.event_type")) < 2e-6)
    assert(math.abs(mi("documents.lang*source").getDouble(3) -
      ent("documents.lang")) < 2e-6)
    assert(math.abs(mi("documents.lang*source").getDouble(4) -
      ent("documents.source")) < 2e-6)
    mi.values.foreach { r =>
      val (m, hx, hy, nm) =
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(m >= -1e-6 && m <= math.min(hx, hy) + 1e-6, r.toString)
      assert(nm >= 0.0 && nm <= 1.0 + 1e-9, r.toString)
    }
  }

  test("js divergence: bit-exact scalar recompute from raw events") {
    val got = Analytics.jsDivergence(spark, sfDir).head()
    val rows = graft.Tables(spark, sfDir, "events")
      .selectExpr("event_type", "unix_micros(cast(ts as timestamp)) AS us")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val mid = Math.floorDiv(rows.map(_._2).min + rows.map(_._2).max, 2L)
    val byType = rows.groupBy(_._1).view.mapValues { xs =>
      (xs.count(_._2 <= mid).toLong, xs.count(_._2 > mid).toLong)
    }.toMap
    val na = byType.values.map(_._1).sum
    val nb = byType.values.map(_._2).sum
    def dec10(x: Double): BigDecimal =
      BigDecimal(x).setScale(10, BigDecimal.RoundingMode.HALF_UP)
    val terms = byType.values.map { case (a, b) =>
      val p = a.toDouble / na; val q = b.toDouble / nb; val m = (p + q) / 2
      val tp = if (a > 0) dec10(p * math.log(p / m)) else BigDecimal(0)
      val tq = if (b > 0) dec10(q * math.log(q / m)) else BigDecimal(0)
      tp + tq
    }
    val jsd = round6(terms.sum.toDouble / 2)
    assert(got.getLong(0) == na && got.getLong(1) == nb)
    assert(got.getLong(2) == byType.size.toLong)
    assert(got.getDouble(3) == jsd, s"jsd ${got.getDouble(3)} vs $jsd")
    assert(got.getDouble(4) == round6(jsd / 0.6931471805599453))
    assert(jsd >= 0.0 && jsd <= 0.6931471805599453 + 1e-9)
  }

  test("anova: sums of squares match a decimal-exact scalar recompute") {
    val got = Analytics.anova(spark, sfDir).head()
    val raw = graft.Tables(spark, sfDir, "events")
      .where(org.apache.spark.sql.functions.col("value").isNotNull)
      .selectExpr("event_type", "CAST(value AS DECIMAL(18,2)) AS v")
      .collect().map(r => (r.getString(0), r.getDecimal(1)))
    val groups = raw.groupBy(_._1).view.mapValues(_.map(x =>
      BigDecimal(x._2))).toMap
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def dec6(x: Double): BigDecimal =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val k = groups.size.toLong
    val n = raw.length.toLong
    val gsx = groups.values.map(_.sum).sum
    val ssw = groups.values.map { vs =>
      val sx = vs.sum; val sxx = vs.map(v => v * v).sum
      dec6(sxx.toDouble - sx.toDouble * sx.toDouble / vs.length.toDouble)
    }.sum
    val ssbsum = groups.values.map { vs =>
      val sx = vs.sum
      dec6(sx.toDouble * sx.toDouble / vs.length.toDouble)
    }.sum
    val ssb = r6(ssbsum.toDouble - gsx.toDouble * gsx.toDouble / n.toDouble)
    assert(got.getLong(0) == k && got.getLong(1) == n)
    assert(got.getDouble(2) == ssb, s"ssb ${got.getDouble(2)} vs $ssb")
    assert(got.getDouble(3) == r6(ssw.toDouble))
    assert(got.getDouble(4) ==
      r6((ssb / (k - 1)) / (ssw.toDouble / (n - k))))
    assert(got.getDouble(5) == r6(ssb / (ssb + ssw.toDouble)))
    assert(got.getDouble(4) >= 0.0)
  }

  test("autocorr: exact-integer scalar recompute, full lag coverage") {
    val rows = Analytics.autocorr(spark, sfDir).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(rows.keySet == (1 to 7).toSet)
    val daily = graft.Tables(spark, sfDir, "events")
      .selectExpr("CAST(ts AS DATE) AS d").groupBy("d").count()
      .orderBy("d").collect().map(_.getLong(1))
    val n = daily.length
    val m = daily.sum.toDouble / n
    val den = daily.map(y => y.toDouble * y).sum - n * m * m
    for (k <- 1 to 7) {
      val pairs = daily.drop(k).zip(daily.dropRight(k))
      val (np, (pk, ak, bk)) = (pairs.length.toLong,
        (pairs.map { case (a, b) => a * b }.sum,
          pairs.map(_._1).sum, pairs.map(_._2).sum))
      val r = (pk.toDouble - m * (ak.toDouble + bk.toDouble) +
        np.toDouble * m * m) / den
      assert(rows(k)._1 == np && np == (n - k).toLong, s"lag $k pairs")
      assert(math.abs(rows(k)._2 - r) < 2e-6,
        s"lag $k: ${rows(k)._2} vs $r")
      assert(rows(k)._2 >= -1.000001 && rows(k)._2 <= 1.000001)
    }
  }

  test("hourly incremental: equals the full rollup bit-for-bit, twice") {
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
      (r.get(0).toString, r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSet
    val full = canon(Events.hourly(spark, sfDir))
    // second call exercises the snapshot-reuse path (write-once gate)
    assert(canon(Events.hourlyIncremental(spark, sfDir)) == full)
    assert(canon(Events.hourlyIncremental(spark, sfDir)) == full)
  }

  test("ngram novelty: first doc fully novel, verbatim copy fully stale") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("nov").toString
    Seq(
      (1L, "alpha beta gamma delta"),      // grams: abc, bcd -> both novel
      (2L, "alpha beta gamma delta"),      // verbatim copy -> 0 novel
      (3L, "alpha beta gamma zeta"),       // abg stale, bgz novel -> 1/2
      (4L, "xy")                           // too short -> no grams
    ).toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val r = TextAnalysis.ngramNovelty(spark, dir).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2),
        x.getDouble(3))).toMap
    assert(r(1L) == ((2L, 2L, 1.0)), r(1L).toString)
    assert(r(2L) == ((2L, 0L, 0.0)), r(2L).toString)
    assert(r(3L) == ((2L, 1L, 0.5)), r(3L).toString)
    assert(r(4L) == ((0L, 0L, 0.0)), r(4L).toString)
  }

  test("capture-recapture: counts match an independent md5 recompute, Chapman formula exact") {
    val got = Analytics.captureRecapture(spark, sfDir).head()
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val ids = graft.Tables(spark, sfDir, "documents")
      .select("doc_id").collect().map(_.getLong(0))
    val a = ids.filter(i => md5hex(s"$i:a").substring(0, 2) < "4d")
    val b = ids.filter(i => md5hex(s"$i:b").substring(0, 2) < "4d")
    val m = a.toSet.intersect(b.toSet).size
    assert(got.getLong(0) == ids.length.toLong)
    assert(got.getLong(1) == a.length.toLong, s"A ${got.getLong(1)} vs ${a.length}")
    assert(got.getLong(2) == b.length.toLong)
    assert(got.getLong(3) == m.toLong)
    val nhat = round6((a.length + 1).toDouble * (b.length + 1) / (m + 1) - 1.0)
    assert(got.getDouble(4) == nhat)
    assert(got.getDouble(5) == round6((nhat - ids.length) / ids.length))
    // the estimator should land near the known population on ~30% samples
    assert(math.abs(got.getDouble(5)) < 0.5, s"err ${got.getDouble(5)}")
  }

  test("ljung-box: Q recomputes from the acf frame; verdict matches the literal") {
    val got = Analytics.ljungBox(spark, sfDir).head()
    val acf = Analytics.autocorr(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    val n = acf.map { case (lag, np, _) => np + lag }.max
    val sterm = acf.map { case (_, np, r) =>
      BigDecimal(r * r / np.toDouble)
        .setScale(10, BigDecimal.RoundingMode.HALF_UP)
    }.sum
    val q = round6(n.toDouble * (n + 2).toDouble * sterm.toDouble)
    assert(got.getLong(0) == n && got.getLong(1) == 7L)
    assert(got.getDouble(2) == q, s"Q ${got.getDouble(2)} vs $q")
    assert(got.getDouble(3) == 14.067140)
    assert(got.getBoolean(4) == (q > 14.067140))
  }

  test("stickiness: DAU/MAU from a hand recompute; bounds and WAU consistency") {
    val got = Events.stickiness(spark, sfDir).collect()
      .map(r => r.getDate(0).toString -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    val du = graft.Tables(spark, sfDir, "events")
      .selectExpr("CAST(ts AS DATE) AS d", "user_id").distinct().collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
    val days = du.map(_._1).distinct
    assert(got.size == days.size)
    for (d <- days) {
      val dau = du.count(_._1 == d).toLong
      val mau = du.filter { case (dd, _) =>
        !dd.isAfter(d) && !dd.isBefore(d.minusDays(27))
      }.map(_._2).distinct.size.toLong
      val (gd, gm, gs) = got(d.toString)
      assert(gd == dau && gm == mau, s"$d: ($gd,$gm) vs ($dau,$mau)")
      assert(gs == round6(dau.toDouble / mau))
      assert(gs > 0.0 && gs <= 1.0)
    }
    // MAU dominates WAU dominates DAU on every day
    val wau = Events.activeUsers(spark, sfDir).collect()
      .map(r => r.getDate(0).toString -> r.getLong(2)).toMap
    got.foreach { case (d, (dau, mau, _)) =>
      assert(dau <= wau(d) && wau(d) <= mau, s"$d ordering") }
  }

  test("lsh curve: closed-form recompute, monotone S-shape, design point on the flank") {
    val got = graft.operators.Dedup.lshCurve(spark, sfDir).collect()
      .map(r => r.getDouble(0) -> r.getDouble(3)).toMap
    assert(got.size == 20)
    for (i <- 1 to 20) {
      val s = i / 20.0
      val p = 1.0 - math.pow(1.0 - math.pow(s, 4), 16)
      val key = BigDecimal(s).setScale(2,
        BigDecimal.RoundingMode.HALF_UP).toDouble
      // squaring chains vs pow: equal well inside 6-dp rounding
      assert(math.abs(got(key) - round6(p)) <= 1e-6, s"s=$s")
    }
    val ordered = got.toSeq.sortBy(_._1).map(_._2)
    ordered.sliding(2).foreach { case Seq(a, b) => assert(b >= a); case _ => }
    assert(got(0.4) < 0.35 && got(0.8) > 0.9, // steep flank brackets 0.8
      s"curve off: ${got(0.4)} ${got(0.8)}")
  }

  test("compress ratio: deflate signal separates repetition from noise") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("defl").toString
    val rep = ("spam " * 200).trim                    // highly repetitive
    val mix = (0 until 200).map(i => s"w${i * 2654435761L % 9973}").mkString(" ")
    Seq((1L, rep, "en", "s", rep.length.toLong),
        (2L, mix, "en", "s", mix.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val rows = graft.operators.TextAnalysis.compressRatio(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getBoolean(6))).toMap
    // independent Deflater: same level/nowrap, computed outside Catalyst
    def ind(s: String): Long = {
      val d = new java.util.zip.Deflater(
        java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
      d.setInput(s.getBytes("UTF-8")); d.finish()
      val buf = new Array[Byte](s.getBytes("UTF-8").length * 2 + 64)
      var t = 0L
      while (!d.finished()) t += d.deflate(buf)
      d.end(); t
    }
    assert(rows(1L)._2 == ind(rep) && rows(2L)._2 == ind(mix))
    assert(rows(1L)._4 && !rows(2L)._4) // repetition flags, mixed does not
    assert(rows(1L)._3 < rows(2L)._3)   // and ranks strictly lower
    val chk = graft.operators.TextAnalysis.compressRatioCheck(spark, dir)
      .head()
    assert(chk.getLong(0) == 2L && chk.getBoolean(1) && chk.getBoolean(2))
  }

  test("kneser-ney: hand-computed probabilities and integer rank order") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("kn").toString
    Seq((1L, "a b a b a c")).toDF("doc_id", "text")
      .write.parquet(s"$dir/documents.parquet")
    val rows = graft.operators.TextAnalysis.bigramKn(spark, dir).collect()
      .map(r => r.getLong(0) ->
        (r.getString(1), r.getString(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6), r.getLong(7)))
      .toMap
    assert(rows.size == 3)
    // P(b|a) = (max(2-.75,0) + .75*2*(1/3)) / 3 = 0.58333...
    assert(rows(1L) == ("a", "b", 2L, 3L, 2L, 1L, 583333L))
    // P(a|b) = (1.25 + .75*1*(1/3)) / 2 = 0.75
    assert(rows(2L) == ("b", "a", 2L, 2L, 1L, 1L, 750000L))
    // P(c|a) = (0.25 + .75*2*(1/3)) / 3 = 0.25
    assert(rows(3L) == ("a", "c", 1L, 3L, 2L, 1L, 250000L))
  }

  test("rake: deg/freq word scores and phrase ranking, hand-computed") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("rake").toString
    // tokens: alpha beta [of] alpha -> phrases "alpha beta", "alpha"
    // alpha: freq 2, deg 2+1=3 -> 1500000; beta: freq 1, deg 2 -> 2000000
    Seq((1L, "alpha beta of alpha")).toDF("doc_id", "text")
      .write.parquet(s"$dir/documents.parquet")
    val rows = graft.operators.TextAnalysis.rakeKeyphrases(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(rows.size == 2)
    assert(rows(1L) == ("alpha beta", 2L, 1L, 3500000L))
    assert(rows(2L) == ("alpha", 1L, 1L, 1500000L))
  }

  test("sprt: planted streams cross the right boundary at the right step") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("sprt").toString
    val ts = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    // 'hot': all successes -> LLR climbs ln(1.25) per event, crosses
    // +ln(19) at ceil(2.944/0.223) = 14 events; 'cold': all failures ->
    // crosses -ln(19) at ceil(2.944/0.182) = 17; 'mid': too few to cross
    val rows =
      (1 to 20).map(i => (i.toLong, ts, 1L, "hot", 50.0, "{}")) ++
      (1 to 20).map(i => (100L + i, ts, 1L, "cold", 1.0, "{}")) ++
      (1 to 5).map(i => (200L + i, ts, 1L, "mid", if (i % 2 == 0) 50.0 else 1.0, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val got = graft.operators.Events.sprt(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2),
          if (r.isNullAt(4)) -1L else r.getLong(4), r.getString(5))).toMap
    assert(got("hot") == ((20L, 20L, 14L, "reject_h0")))
    assert(got("cold") == ((20L, 0L, 17L, "accept_h0")))
    assert(got("mid")._4 == "continue" && got("mid")._3 == -1L)
  }

  test("window funnel: chains restart from ANY view; window truncates the level") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("wfun").toString
    def t(day: Int) = java.sql.Timestamp.valueOf(f"2026-01-${day}%02d 12:00:00")
    var id = 0L
    def e(u: Long, tp: String, day: Int) = { id += 1; (id, t(day), u, tp, 1.0, "{}") }
    val rows = Seq(
      e(1, "view", 1),                                    // level 1
      e(2, "view", 1), e(2, "click", 2),                  // level 2
      e(3, "view", 1), e(3, "click", 2), e(3, "purchase", 3), // level 3
      e(4, "view", 1), e(4, "click", 2), e(4, "purchase", 9), // p outside 7d -> 2
      e(5, "click", 1), e(5, "view", 2),                  // click BEFORE view -> 1
      // u6: first view's window misses the click; the later view catches it
      e(6, "view", 1), e(6, "view", 7), e(6, "click", 9)) // level 2 via 2nd view
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val got = graft.operators.Events.windowFunnel(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got(1L)._1 == 2L, s"level-1 users (u1, u5): $got")
    assert(got(2L)._1 == 3L, s"level-2 users (u2, u4, u6): $got")
    assert(got(3L) == ((1L, 0.166667)), s"level-3 user (u3): $got")
  }

  test("cusum: sustained drift alarms at the crossing step, spike alarms once, calm never") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cusum").toString
    val ts = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    // 'jump': 155.0 each -> y=+1e8/step, S=1e8*i, crosses h=1e9 at i=10
    // 'calm': 54.0 each -> y=-1e6/step, S pinned at 0, never alarms
    // 'spike': 50.0 except one 5000.0 at the 5th event -> S jumps to
    //   4.945e9 (alarm at rn=5) then decays 5e6/step
    val rows =
      (1 to 20).map(i => (i.toLong, ts, 1L, "jump", 155.0, "{}")) ++
      (1 to 20).map(i => (50L + i, ts, 1L, "calm", 54.0, "{}")) ++
      (1 to 20).map(i => (100L + i, ts, 1L, "spike",
        if (i == 5) 5000.0 else 50.0, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val got = graft.operators.Events.cusum(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4), r.getBoolean(5))).toMap
    assert(got("jump") == ((20L, 2000000000L, 2000000000L, 10L, true)))
    assert(got("calm") == ((20L, 0L, 0L, -1L, false)))
    assert(got("spike") == ((20L, 4870000000L, 4945000000L, 5L, true)))
  }
}
