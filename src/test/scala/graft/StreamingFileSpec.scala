package graft

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger

import graft.streaming.EventStream

/** File-source → transform → file-sink streaming, end to end: the
  * `readStream`/`writeStream` surface with a checkpoint and
  * `Trigger.AvailableNow` (the batch-of-a-stream execution the
  * reference's pull-based pipeline maps to, SURVEY.md §2.7).
  */
class StreamingFileSpec extends SparkSpec {

  test("readStream parquet → hourly agg → writeStream parquet, exactly once") {
    import spark.implicits._
    val root = Files.createTempDirectory("stream").toString
    def t(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 ${min / 60}%02d:${min % 60}%02d:00")
    val batch1 = Seq(
      (1L, t(5), 1L, "click", 1.0),
      (2L, t(15), 2L, "click", 2.0),
      (3L, t(65), 1L, "view", 3.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    batch1.write.parquet(s"$root/in")

    def runOnce(): Unit = {
      val stream = spark.readStream.schema(batch1.schema).parquet(s"$root/in")
      EventStream.hourly(stream)
        .writeStream
        .format("parquet")
        .option("path", s"$root/out")
        .option("checkpointLocation", s"$root/ckpt")
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
        .awaitTermination()
    }
    def outRows() = spark.read.parquet(s"$root/out")
      .collect().map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2))).toSet

    // Batch 1: nothing finalizes — append mode holds windows open until
    // the watermark (max event time - 2h) passes their end.
    runOnce()
    assert(outRows().isEmpty)

    // Push event time forward across two more batches: the watermark
    // computed from batch N's data takes effect in batch N+1, which is
    // when the 00:00 and 01:00 windows close and emit exactly once.
    Seq((4L, t(250), 3L, "view", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("append").parquet(s"$root/in")
    runOnce()
    Seq((5L, t(600), 3L, "view", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("append").parquet(s"$root/in")
    runOnce()
    val out = outRows()
    assert(out.contains(("2024-01-01 00:00:00.0", "click", 2L)))
    assert(out.contains(("2024-01-01 01:00:00.0", "view", 1L)))

    // Re-running against the same checkpoint reprocesses nothing.
    runOnce()
    assert(outRows() == out, "checkpointed restart duplicated rows")
  }

  test("funnel state survives kill/restart: stage advances span restarts exactly once") {
    import spark.implicits._
    val root = Files.createTempDirectory("funnelstream").toString
    def t(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")
    val schema = Seq.empty[(Long, java.sql.Timestamp, Long, String, Double)]
      .toDF("event_id", "ts", "user_id", "event_type", "value").schema

    // Each runOnce is a fresh StreamingQuery instance recovering the
    // per-user FunnelState (2 numbers) from the checkpoint — the
    // kill+restart cycle a production stream survives.
    def runOnce(): Unit = {
      val stream = spark.readStream.schema(schema).parquet(s"$root/in")
      EventStream.funnel(stream.as[EventStream.Event])
        .writeStream
        .format("parquet")
        .option("path", s"$root/out")
        .option("checkpointLocation", s"$root/ckpt")
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
        .awaitTermination()
    }
    def outRows() = spark.read.parquet(s"$root/out")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet

    // run 1: user 7 reaches stage 1 (view); a click BEFORE the view
    // must not advance anything after recovery either
    Seq((1L, t(1), 7L, "click", 0.0), (2L, t(2), 7L, "view", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$root/in")
    runOnce()
    assert(outRows() == Set((7L, "view")))

    // "kill" happened here: the next run is a new query instance. Its
    // click STRICTLY AFTER the recovered stage-1 timestamp advances to
    // stage 2 — provable only if FunnelState(stage=1, ts=00:02)
    // round-tripped through the checkpoint.
    Seq((3L, t(3), 7L, "click", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("append").parquet(s"$root/in")
    runOnce()
    assert(outRows() == Set((7L, "view"), (7L, "click")))

    // second restart: purchase completes the funnel; an out-of-order
    // duplicate click at an EARLIER ts must not re-emit
    Seq((4L, t(1), 7L, "click", 0.0), (5L, t(9), 7L, "purchase", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("append").parquet(s"$root/in")
    runOnce()
    val done = outRows()
    assert(done == Set((7L, "view"), (7L, "click"), (7L, "purchase")))

    // restart with no new data: recovery alone must emit nothing
    runOnce()
    assert(outRows() == done, "restart duplicated funnel advances")
  }

  test("WARC stream → HTML extraction: batch/stream parity, exactly once") {
    import graft.sources.WarcIngest
    import graft.operators.HtmlExtract
    val root = Files.createTempDirectory("warcextract").toString
    Files.createDirectories(java.nio.file.Paths.get(s"$root/in"))
    def runOnce(): Unit =
      HtmlExtract.fromWarcRecords(
          WarcIngest.streamDataFrame(spark, s"$root/in"))
        .writeStream.format("parquet")
        .option("path", s"$root/out")
        .option("checkpointLocation", s"$root/ckpt")
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start().awaitTermination()
    def out() = spark.read.parquet(s"$root/out")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("text_md5")).toMap

    // segment 1: two template pages as real WARC bytes
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$root/in/seg1.warc"),
      HtmlExtract.warcRecord(1L, "alpha beta") ++
        HtmlExtract.warcRecord(2L, "gamma"))
    runOnce()
    // expectation computed by the BATCH chain on the same texts
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val expect = Seq((1L, "alpha beta"), (2L, "gamma"), (3L, "delta"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), md5(HtmlExtract.cleanHtmlCol(
        HtmlExtract.wrapCol(col("doc_id"), col("text")))).as("m"))
      .as[(Long, String)].collect().toMap
    assert(out() == Map(1L -> expect(1L), 2L -> expect(2L)))
    // a late segment lands: only IT is processed, results accumulate
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$root/in/seg2.warc"),
      HtmlExtract.warcRecord(3L, "delta"))
    runOnce()
    assert(out() == Map(1L -> expect(1L), 2L -> expect(2L), 3L -> expect(3L)))
    // recovery with nothing new re-emits nothing
    runOnce()
    assert(out().size == 3)
  }

  test("PDF landing-dir stream: extraction on arrival, batch parity, exactly once") {
    import graft.operators.Pdf
    val root = Files.createTempDirectory("pdfstream").toString
    Files.createDirectories(java.nio.file.Paths.get(s"$root/in"))
    def drop(id: Long, text: String): Unit =
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$root/in/doc-$id.pdf"),
        Pdf.render(text, flate = id % 2 == 0, indirectLength = id % 3 == 0,
          lzw = id % 7 == 1, encrypt = id % 11 == 2,
          cmapFont = id % 13 == 3))
    def runOnce(): Unit =
      Pdf.pdfStream(spark, s"$root/in")
        .writeStream.format("parquet")
        .option("path", s"$root/out")
        .option("checkpointLocation", s"$root/ckpt")
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start().awaitTermination()
    def out() = spark.read.parquet(s"$root/out")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("status"), r.getAs[String]("text_md5")))).toMap
    // ids chosen to hit distinct writer seams (flate, lzw, rc4, cmap)
    drop(2L, "first words arrive")
    drop(8L, "second document lands with more words to split")
    runOnce()
    def expectMd5(text: String): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(Pdf.layoutLines(text).mkString("\n")
        .getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    assert(out() == Map(
      2L -> (("ok", expectMd5("first words arrive"))),
      8L -> (("ok", expectMd5("second document lands with more words to split")))))
    // late arrivals through the OTHER writer seams process exactly once
    drop(13L, "an encrypted late arrival")     // 13%11=2 → rc4
    drop(16L, "a composite font late arrival") // 16%13=3 → cmap
    drop(15L, "an lzw late arrival")           // 15%7=1 → lzw
    runOnce()
    val all = out()
    assert(all.size == 5 && all.values.forall(_._1 == "ok"))
    assert(all(13L)._2 == expectMd5("an encrypted late arrival"))
    assert(all(16L)._2 == expectMd5("a composite font late arrival"))
    assert(all(15L)._2 == expectMd5("an lzw late arrival"))
    // recovery with nothing new re-emits nothing
    runOnce()
    assert(out().size == 5)
  }

  test("WARC landing-dir stream: each segment ingests exactly once") {
    import graft.sources.WarcIngest
    val root = Files.createTempDirectory("warcstream").toString
    Files.createDirectories(java.nio.file.Paths.get(s"$root/in"))
    def seg(uri: String): Array[Byte] = {
      val payload = "HTTP/1.1 200 OK\r\n\r\nhello".getBytes("US-ASCII")
      (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: $uri\r\n" +
        s"Content-Length: ${payload.length}\r\n\r\n").getBytes("US-ASCII") ++
        payload ++ "\r\n\r\n".getBytes("US-ASCII")
    }
    def runOnce(): Unit =
      WarcIngest.streamDataFrame(spark, s"$root/in")
        .writeStream.format("parquet")
        .option("path", s"$root/out")
        .option("checkpointLocation", s"$root/ckpt")
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start().awaitTermination()
    def uris() = spark.read.parquet(s"$root/out")
      .collect().map(_.getAs[String]("target_uri")).sorted.toSeq

    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$root/in/seg1.warc"), seg("https://a.nz/"))
    runOnce()
    assert(uris() == Seq("https://a.nz/"))
    // a new segment lands; only IT is parsed on the next trigger
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$root/in/seg2.warc"), seg("https://b.nz/"))
    runOnce()
    assert(uris() == Seq("https://a.nz/", "https://b.nz/"))
    // recovery with nothing new ingests nothing (the O2 idempotence
    // gate, provided by the file source's processed-files log)
    runOnce()
    assert(uris() == Seq("https://a.nz/", "https://b.nz/"))
  }

  test("ANN maintenance stream: calm batch extends, drifted batch rotates, restart replays nothing") {
    import spark.implicits._
    // the maintainStep spec's two vector families: v = base
    // distribution, g = an alien basis that quantizes badly against a
    // v-trained codebook but near-exactly against a rebuilt one
    def v(id: Long): Seq[Float] =
      Array.tabulate(64)(d => math.sin(d * 1.3 + id * 2.7).toFloat * 3f).toSeq
    def g(id: Long): Seq[Float] =
      Array.tabulate(64)(d => (math.cos(d * 0.9 + (id % 4) * 1.5) * 3 +
        (id % 7) * 0.01).toFloat).toSeq
    val root = Files.createTempDirectory("annmstream").toString
    val base = (0L until 300L).map(i => (i, v(i)))
    base.toDF("vec_id", "embedding")
      .write.parquet(s"$root/base/embeddings.parquet")
    val (store, _) = graft.sources.SnapshotStore.contentAddressed(
      spark, s"$root/base/embeddings.parquet", "spec_annmstream")
    graft.operators.Similarity.buildIncBase(spark, store,
      base.toDF("vec_id", "embedding"), "t0")
    val schema = base.toDF("vec_id", "embedding").schema

    // each runOnce is a FRESH StreamingQuery instance recovering batch
    // ids from the checkpoint — the kill+restart cycle of production
    def runOnce(): Unit =
      graft.streaming.CorpusStream.annMaintainStream(spark, store, "t0",
          spark.readStream.schema(schema).parquet(s"$root/in"))
        .option("checkpointLocation", s"$root/ckpt")
        .trigger(Trigger.AvailableNow())
        .start().awaitTermination()
    def cells(ts: String): Long =
      store.readTableSnapshot(spark, "ivf_cells", ts).count()
    def state() =
      graft.streaming.CorpusStream.annServingState(store, "t0")

    // calm batch: the loop extends the served snapshot, no rotation
    (1100L until 1110L).map(i => (i, v(i))).toDF("vec_id", "embedding")
      .write.mode("append").parquet(s"$root/in")
    runOnce()
    val (s1, b1) = state()
    assert(s1 == "t0_b000000" && b1 == "t0", s"calm extend: $s1 $b1")
    assert(cells(s1) == 310)

    // drifted batch, processed by a fresh query instance: the gate
    // fires and the loop rotates serving AND drift baseline to the
    // rebuilt snapshot
    (2000L until 2100L).map(i => (i, g(i))).toDF("vec_id", "embedding")
      .write.mode("append").parquet(s"$root/in")
    runOnce()
    val (s2, b2) = state()
    assert(s2 == "t0_b000001_rb" && b2 == s2, s"drift rotate: $s2 $b2")
    assert(cells(s2) == 410, "rebuilt snapshot must carry the full corpus")

    // restart with nothing new: the marker gate + the file source's
    // offset log replay NOTHING — pointers and snapshots untouched
    runOnce()
    assert(state() == ((s2, b2)), "empty restart must not move pointers")

    // the SAME alien family now rides in calm: the rebuilt codebook
    // covers its basis, so maintenance extends instead of rebuilding
    (3000L until 3100L).map(i => (i, g(i))).toDF("vec_id", "embedding")
      .write.mode("append").parquet(s"$root/in")
    runOnce()
    val (s3, b3) = state()
    assert(s3 == "t0_b000002" && b3 == b2,
      s"absorbed family must ride calm: $s3 $b3")
    assert(cells(s3) == 510)
  }

  test("bm25 ingest stream: kill/restart cycles re-derive identical postings; serve equals rebuild") {
    import spark.implicits._
    val root = Files.createTempDirectory("bm25fstream").toString
    val store = new graft.sources.SnapshotStore(root)
    val base = Seq((0L, "apple banana"), (6L, "apple banana pie"))
    val b1 = Seq((9L, "apple apple crust"))
    val b2 = Seq((19L, "banana crust pad"), (29L, "pad pad"))
    store.writeTableSnapshot(
      graft.operators.Retrieval.postingsFromText(base.toDF("doc_id", "text")),
      "bm25_postings", "base")
    val schema = base.toDF("doc_id", "text").schema

    // each runOnce is a FRESH StreamingQuery instance recovering batch
    // ids from the checkpoint — the kill+restart cycle of production
    def runOnce(): Unit =
      graft.streaming.CorpusStream.bm25IngestStream(spark, store, "base",
          spark.readStream.schema(schema).parquet(s"$root/in"))
        .option("checkpointLocation", s"$root/ckpt")
        .trigger(Trigger.AvailableNow())
        .start().awaitTermination()
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq.toList).sortBy(_.toString).toList
    def snapshot(ts: String) =
      store.readTableSnapshot(spark, "bm25_postings", ts)
        .select("doc_id", "term", "tf", "dl")

    b1.toDF("doc_id", "text").write.mode("append").parquet(s"$root/in")
    runOnce()
    assert(canon(snapshot("base_b000000")) ==
      canon(graft.operators.Retrieval.postingsFromText(
        (base ++ b1).toDF("doc_id", "text"))))

    // restart (fresh query instance) with a second drop: batch 0 must
    // NOT replay (marker + offset log), batch 1 appends exactly once
    b2.toDF("doc_id", "text").write.mode("append").parquet(s"$root/in")
    runOnce()
    val full = base ++ b1 ++ b2
    assert(canon(snapshot("base_b000001")) ==
      canon(graft.operators.Retrieval.postingsFromText(
        full.toDF("doc_id", "text"))))

    // restart with nothing new: no new marker, no new snapshot
    runOnce()
    assert(store.isProcessed("bm25_ingest", "b000000"))
    assert(store.isProcessed("bm25_ingest", "b000001"))
    assert(!store.isProcessed("bm25_ingest", "b000002"),
      "empty restart must process no batch")

    // serve ≡ rebuild: ranking FROM the streamed snapshot equals the
    // batch bm25TopK rebuild over the same corpus
    val dir = Files.createTempDirectory("bm25fdocs").toString
    full.toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    assert(canon(graft.operators.Retrieval.bm25Rank(spark, dir,
        snapshot("base_b000001"))) ==
      canon(graft.operators.Retrieval.bm25TopK(spark, dir)))
  }
}
