package graft

import graft.operators.{Events, Multimodal, TextAnalysis}

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

  test("multimodal meta stub: md5 + fake dimensions, binary-safe") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("mm").toString
    Seq((0L, "abc", "en", "s", 3L)).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val r = Multimodal.meta(spark, dir).head()
    assert(r.getString(1) == "image")
    assert(r.getLong(2) == 3L)
    assert(r.getString(3) == "900150983cd24fb0d6963f7d28e17f72") // md5("abc")
    assert(r.getInt(4) == 19 && r.getInt(5) == 19)
  }
}
