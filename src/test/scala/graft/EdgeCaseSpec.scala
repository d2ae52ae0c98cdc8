package graft

import org.apache.spark.sql.types._

import graft.operators.{Dedup, Similarity, TextAnalysis}

/** Degenerate-input behavior: operators must return empty results — not
  * crash — on empty or all-too-short corpora (the first batch of a new
  * pipeline is often exactly that).
  */
class EdgeCaseSpec extends SparkSpec {

  private def emptyDocsDir(): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("empty").toString
    Seq.empty[(Long, String, String, String, Long)]
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("dedup family is empty-safe") {
    val dir = emptyDocsDir()
    assert(Dedup.exact(spark, dir).count() == 0)
    assert(Dedup.minhashLsh(spark, dir).count() == 0)
    assert(Dedup.ngramJaccard(spark, dir).count() == 0)
    assert(Dedup.simhash(spark, dir).count() == 0)
    assert(Dedup.clusters(spark, dir).count() == 0)
  }

  test("short documents fall below shingle thresholds, not into errors") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("short").toString
    Seq((1L, "ab"), (2L, "one two")).toDF("doc_id", "text")
      .write.parquet(s"$dir/documents.parquet")
    assert(Dedup.minhashLsh(spark, dir).count() == 0) // < 3 words each
    assert(Dedup.ngramJaccard(spark, dir).count() == 0) // < 12 chars each
    assert(TextAnalysis.tokens(spark, dir).count() == 2) // scans still work
  }

  test("empty embeddings produce empty similarity results") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("emptyvec").toString
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)),
        StructField("label", IntegerType))))
      .write.parquet(s"$dir/embeddings.parquet")
    assert(Similarity.topkBruteForce(spark, dir).count() == 0)
    assert(Similarity.embeddingNearDup(spark, dir).count() == 0)
    assert(Similarity.contaminationEmbedding(spark, dir).count() == 0)
  }

  test("round-6 operators tolerate degenerate inputs without throwing") {
    import spark.implicits._
    // all-short batch: nothing shingles, everything admits (the documented
    // can't-match-anything contract), no empty-frame crash in the
    // components call on zero batch pairs
    val dir = java.nio.file.Files.createTempDirectory("r6edge").toString
    Seq((1L, "ab"), (3L, "cd ef")).toDF("doc_id", "text")
      .write.parquet(s"$dir/documents.parquet")
    val admitted = graft.operators.Dedup.minhashIncremental(spark, dir)
      .collect().map(_.getLong(0)).toSet
    assert(admitted == Set(1L, 3L), s"short docs must admit: $admitted")
    // a user with fewer events than the context window yields no examples
    val edir = java.nio.file.Files.createTempDirectory("r6seq").toString
    Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 7L, "view", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$edir/events.parquet")
    assert(graft.operators.Events.sequenceExamples(spark, edir).count() == 0)
  }

  test("round-7 continuation operators are empty- and null-safe") {
    import spark.implicits._
    import graft.operators.{Analytics, Curation, Events, Graph, History,
      Similarity}
    // empty documents: span family, diff, fertility, solver, curriculum
    val dir = emptyDocsDir()
    assert(Dedup.crossSpans(spark, dir).count() == 0)
    assert(Dedup.spanTrim(spark, dir).count() == 0)
    assert(History.corpusDiff(spark, dir).count() == 0)
    assert(TextAnalysis.fertility(spark, dir).count() == 0)
    assert(Curation.mixtureSolver(spark, dir).count() == 0)
    assert(Curation.curriculum(spark, dir).count() == 0)
    // empty events: the rank-test family's percentile cuts come back
    // null — one bin, empty result, no NPE
    val edir = java.nio.file.Files.createTempDirectory("r7ev").toString
    Seq.empty[(Long, java.sql.Timestamp, Long, String, Double)]
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$edir/events.parquet")
    assert(Analytics.statsKs(spark, edir).count() == 0)
    assert(Analytics.statsMannWhitney(spark, edir).count() == 0)
    assert(Analytics.statsAuc(spark, edir).count() == 0)
    // empty join graph: BFS has no source, jaccard has no pairs,
    // pareto's revenue cuts are null
    val gdir = java.nio.file.Files.createTempDirectory("r7g").toString
    Seq.empty[(Long, Long, Long, Long, Double, Double, Double,
        java.sql.Timestamp)]
      .toDF("l_orderkey", "l_suppkey", "l_partkey", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_shipdate")
      .write.parquet(s"$gdir/lineitem.parquet")
    Seq.empty[(Long, Long, String)]
      .toDF("o_orderkey", "o_custkey", "o_orderstatus")
      .write.parquet(s"$gdir/orders.parquet")
    assert(Graph.bfsShip(spark, gdir).count() == 0)
    assert(Graph.jaccardNeighbors(spark, gdir).count() == 0)
    assert(Analytics.aggPareto(spark, gdir).count() == 0)
    // empty embeddings: semantic dedup and the kNN graph yield no rows
    val vdir = java.nio.file.Files.createTempDirectory("r7v").toString
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)))))
      .write.parquet(s"$vdir/embeddings.parquet")
    assert(Similarity.semanticDedup(spark, vdir).count() == 0)
    assert(Similarity.knnLsh(spark, vdir).count() == 0)
    // empty events again: RFM yields no rows (null thresholds never
    // compare); the SRM gate emits its single aggregate row without
    // throwing (null chi2 — no users to assign is not a mismatch)
    assert(Events.rfm(spark, edir).count() == 0)
    assert(Events.abSrm(spark, edir).count() == 1)
  }

  test("round-8 operators are empty-input safe") {
    import graft.operators.{Curation, Events}
    val dir = emptyDocsDir()
    assert(Dedup.lineBoilerplate(spark, dir).count() == 0)
    assert(Curation.dsir(spark, dir).count() == 0)
    assert(Curation.dsirHashed(spark, dir).count() == 0)
    import spark.implicits._
    val edir = java.nio.file.Files.createTempDirectory("r8ev").toString
    Seq.empty[(Long, java.sql.Timestamp, Long, String, Double)]
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$edir/events.parquet")
    // no users: CUPED emits no arm rows; the sketch twin no user rows
    assert(Events.cuped(spark, edir).count() == 0)
    assert(Events.rfmSketch(spark, edir).count() == 0)
    // the check op still emits its fixed 6-row grid (vacuous ranks on
    // an empty frame must not divide-by-zero into an error)
    assert(Events.rfmSketchCheck(spark, edir).count() == 6)
  }

  test("round-3 text/dedup operators tolerate null text without throwing") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("nulls").toString
    Seq((1L, "a real document body here"), (2L, null))
      .toDF("doc_id", "text")
      .write.parquet(s"$dir/documents.parquet")
    // chunk: split(null) is null, the explode generator emits nothing —
    // the null-text row silently drops (same shape as the old simhash fix)
    assert(TextAnalysis.chunk(spark, dir).collect().map(_.getLong(0)).toSet == Set(1L))
    // tfidf: explode(null) drops the row; only doc 1 ranks
    assert(TextAnalysis.tfidfTop(spark, dir).collect().map(_.getLong(0)).toSet == Set(1L))
    // redact: regexp funcs propagate null, row survives with null fields
    val red = TextAnalysis.redact(spark, dir).collect()
      .map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(red == Map(1L -> false, 2L -> true))
    // incremental: null fingerprint never matches history — passes through
    assert(Dedup.incremental(spark, dir).count() >= 0) // no throw is the contract
  }

  test("round-4 text/dedup/curation operators tolerate null text and empties") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("nulls4").toString
    Seq((1L, "a real document body here", "en", "src0", 25L),
        (2L, null, "en", "src1", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    // repetition: split(null) is null, size(null) is null — fails the
    // >= 2 filter, the null-text row silently drops
    assert(TextAnalysis.repetition(spark, dir).collect()
      .map(_.getLong(0)).toSet == Set(1L))
    // perplexity: explode(null) emits nothing — row drops
    assert(TextAnalysis.perplexity(spark, dir).collect()
      .map(_.getLong(0)).toSet == Set(1L))
    // keep-best: md5(null) is null — null-text rows form their own
    // null-key group and survive (they are not text duplicates)
    assert(Dedup.keepBest(spark, dir).count() == 2)
    // TWO null-text docs must BOTH survive (ADVICE r4: a shared NULL
    // fingerprint group would collapse non-duplicates to one survivor)
    val dir2 = java.nio.file.Files.createTempDirectory("nulls4b").toString
    Seq((1L, "a real document body here", "en", "src0", 25L),
        (2L, null, "en", "src1", 0L),
        (3L, null, "en", "src0", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir2/documents.parquet")
    assert(Dedup.keepBest(spark, dir2).collect()
      .map(_.getLong(0)).toSet == Set(1L, 2L, 3L))
    // mixture/split: token count null → cum null → dropped vs budget;
    // the split is text-independent so both docs are assigned
    assert(graft.operators.Curation.mixture(spark, dir).count() >= 1)
    assert(graft.operators.Curation.split3(spark, dir).count() == 2)
    // empty corpus: all of the above return empty, not errors
    val empty = emptyDocsDir()
    assert(TextAnalysis.repetition(spark, empty).count() == 0)
    assert(TextAnalysis.perplexity(spark, empty).count() == 0)
    assert(Dedup.keepBest(spark, empty).count() == 0)
    assert(graft.operators.Curation.split3(spark, empty).count() == 0)
  }

  test("round-5 continuation operators tolerate null text and empties") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("nulls5").toString
    Seq((1L, (1 to 10).map(i => s"w$i").mkString(" "), "en", "src0", 50L),
        (2L, null, "en", "src1", 0L),
        (3L, "short", "de", "src0", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    // repeated ngrams: split(null) null → size null fails >= 8; short too
    assert(Dedup.repeatedNgrams(spark, dir).collect()
      .map(_.getLong(0)).toSet == Set(1L))
    // bigram LM: null text emits no bigrams and no unigrams — excluded
    assert(TextAnalysis.bigramLm(spark, dir).collect()
      .map(_.getLong(0)).toSet == Set(1L))
    // dedup report: the null-text doc counts as its own distinct key
    val rep = graft.operators.Dedup.report(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(rep == Map("src0" -> 2L, "src1" -> 1L))
    // temperature sampling survives a null-text doc (text-independent)
    // and a single-language corpus keeps rate = min(1, budget·1) < 1
    val rates = graft.operators.Curation.temperatureSample(spark, dir)
      .collect().map(r => r.getString(1) -> r.getDouble(2)).toMap
    assert(rates.keySet.subsetOf(Set("en", "de")))
    // empty corpus: all return empty, not errors
    val empty = emptyDocsDir()
    assert(Dedup.repeatedNgrams(spark, empty).count() == 0)
    assert(TextAnalysis.bigramLm(spark, empty).count() == 0)
    assert(graft.operators.Dedup.report(spark, empty).count() == 0)
    assert(graft.operators.Curation.temperatureSample(spark, empty).count() == 0)
  }

  test("emb_quantize drops zero vectors and tolerates empty input") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("qempty").toString
    Seq.empty[(Long, Array[Float], Int)]
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    assert(Similarity.quantize(spark, dir).count() == 0)
    // an ACTUAL zero vector must drop, not throw: ANSI divide-by-zero
    // fired inside the collapsed projection before the nullif guard
    // (the scale > 0 filter alone does not pin evaluation order)
    val dir2 = java.nio.file.Files.createTempDirectory("qzero").toString
    Seq((1L, Array(1.0f, -2.0f), 0), (2L, Array(0.0f, 0.0f), 0))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir2/embeddings.parquet")
    assert(Similarity.quantize(spark, dir2).collect()
      .map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("null text rows drop from simhash like the declarative form did") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("nulltext").toString
    Seq((1L, "alpha beta gamma"), (2L, null: String), (3L, "delta"))
      .toDF("doc_id", "text")
      .write.parquet(s"$dir/documents.parquet")
    // The primitive pass must DROP doc 2 (explode-of-null semantics),
    // not NPE on it — and the consistency check agrees on what's left.
    val ids = Dedup.simhash(spark, dir).collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 3L))
    val chk = Dedup.simhashCheck(spark, dir).head()
    assert(chk.getLong(0) == 2L && chk.getLong(1) == 2L)
  }

  test("writeTable rolls the table back and restores autocommit on failure") {
    import spark.implicits._
    import graft.sources.{CastMatrix, SqliteDdl}
    val rec = new JdbcRecorder
    // Fail mid-stream from the data side: a row whose evaluation throws
    // while the insert iterator is draining.
    val df = Seq((1L, "x")).toDF("id", "name")
      .selectExpr("id", "CASE WHEN id = 1 THEN raise_error('mid-stream failure') ELSE name END AS name")
    val e = intercept[Exception] {
      SqliteDdl.writeTable(rec.connection, "t",
        Seq("id" -> CastMatrix.ALong, "name" -> CastMatrix.AText), Nil, df)
    }
    // The failure propagated, the table's transaction rolled back, and
    // the caller's autocommit came back.
    assert(rec.txEvents.toSeq ==
      Seq("setAutoCommit(false)", "rollback", "setAutoCommit(true)"))
  }

  test("CosineSim: null inputs yield null, not errors") {
    import spark.implicits._
    org.apache.spark.sql.graft.GraftExtensions.register(spark)
    val rows = spark.sql(
      """SELECT cosine_sim(CAST(NULL AS ARRAY<FLOAT>), array(CAST(1.0 AS FLOAT))) AS a,
        |       cosine_sim(array(CAST(1.0 AS FLOAT)), CAST(NULL AS ARRAY<FLOAT>)) AS b
        |""".stripMargin).head()
    assert(rows.isNullAt(0) && rows.isNullAt(1))
  }

  test("multimodal header decode: real PNG/BMP dims, corrupt headers quarantine") {
    import spark.implicits._
    import graft.operators.Multimodal
    def be(v: Int) = Array((v >> 24).toByte, (v >> 16).toByte,
      (v >> 8).toByte, v.toByte)
    def le(v: Int) = Array(v.toByte, (v >> 8).toByte,
      (v >> 16).toByte, (v >> 24).toByte)
    val pngMagic = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte)
    // minimal RGBA PNG header: magic + IHDR(len 13) 640×480, depth 8, color 6
    val png = pngMagic ++ be(13) ++ "IHDR".getBytes ++ be(640) ++ be(480) ++
      Array(8.toByte, 6.toByte, 0.toByte, 0.toByte, 0.toByte)
    // minimal BMP header: "BM" + 12 filler bytes, then BITMAPINFOHEADER
    // (size 40) with 320×200 at 24 bpp; height negative = top-down
    val bmp = "BM".getBytes ++ Array.fill(12)(0.toByte) ++ le(40) ++
      le(320) ++ le(-200) ++ Array(1.toByte, 0.toByte) ++
      Array(24.toByte, 0.toByte)
    // PNG magic but truncated before the dims — must quarantine, not throw
    val corrupt = pngMagic ++ be(13) ++ "IHDR".getBytes ++ be(640).take(2)
    // PNG magic but a non-IHDR first chunk — also corrupt
    val wrongChunk = pngMagic ++ be(13) ++ "IDAT".getBytes ++ be(640) ++
      be(480) ++ Array(8.toByte, 6.toByte, 0.toByte, 0.toByte, 0.toByte)
    // GIF89a logical screen 1024×768; truncated GIF must quarantine
    val gif = "GIF89a".getBytes ++ Array(0.toByte, 4.toByte) ++
      Array(0.toByte, 3.toByte) ++ Array.fill(3)(0.toByte)
    val gifShort = "GIF89a".getBytes ++ Array(0.toByte)
    // JPEG: SOI, APP0 (16 bytes), DHT (to prove non-frame SOF-range
    // markers are skipped), SOF0 300×200 ×3 components
    def seg(m: Int, body: Array[Byte]) =
      Array(0xFF.toByte, m.toByte) ++
        Array((((body.length + 2) >> 8) & 255).toByte,
          ((body.length + 2) & 255).toByte) ++ body
    val jpeg = Array(0xFF.toByte, 0xD8.toByte) ++
      seg(0xE0, "JFIF".getBytes ++ Array.fill(10)(0.toByte)) ++
      seg(0xC4, Array.fill(5)(0.toByte)) ++
      seg(0xC0, Array(8.toByte, 0.toByte, 200.toByte, 1.toByte, 44.toByte,
        3.toByte))
    // SOS before any SOF: structurally a JPEG, but no frame header
    val jpegNoSof = Array(0xFF.toByte, 0xD8.toByte) ++
      seg(0xDA, Array.fill(4)(0.toByte))
    val assets = spark.createDataset(Seq(
      Multimodal.Asset(1L, "image", png, "s"),
      Multimodal.Asset(2L, "image", bmp, "s"),
      Multimodal.Asset(3L, "image", corrupt, "s"),
      Multimodal.Asset(4L, "image", wrongChunk, "s"),
      Multimodal.Asset(5L, "image", "plain text".getBytes, "s"),
      Multimodal.Asset(6L, "image", gif, "s"),
      Multimodal.Asset(7L, "image", gifShort, "s"),
      Multimodal.Asset(8L, "image", jpeg, "s"),
      Multimodal.Asset(9L, "image", jpegNoSof, "s")))
    val m = Multimodal.extractMeta(assets).collect()
      .map(r => r.asset_id -> ((r.width, r.height, r.channels))).toMap
    assert(m(1L) == ((640, 480, 4)), s"PNG decode: ${m(1L)}")
    assert(m(2L) == ((320, 200, 3)), s"BMP decode: ${m(2L)}")
    assert(m(3L) == ((-1, -1, 0)), s"truncated PNG must quarantine: ${m(3L)}")
    assert(m(4L) == ((-1, -1, 0)), s"IHDR-less PNG must quarantine: ${m(4L)}")
    assert(m(5L) == ((26, 26, 3)), s"text fallback pseudo-dims: ${m(5L)}")
    assert(m(6L) == ((1024, 768, 3)), s"GIF decode: ${m(6L)}")
    assert(m(7L) == ((-1, -1, 0)), s"truncated GIF must quarantine: ${m(7L)}")
    assert(m(8L) == ((300, 200, 3)), s"JPEG SOF0 decode: ${m(8L)}")
    assert(m(9L) == ((-1, -1, 0)), s"SOF-less JPEG must quarantine: ${m(9L)}")
  }

  test("WAV header decode: real fmt/data chunk walk, corrupt RIFF quarantines") {
    import spark.implicits._
    import graft.operators.Multimodal
    def le32(v: Int) = Array(v.toByte, (v >> 8).toByte,
      (v >> 16).toByte, (v >> 24).toByte)
    def le16(v: Int) = Array(v.toByte, (v >> 8).toByte)
    // canonical 44-byte PCM header: 44100 Hz stereo 16-bit, 1000 frames
    // (data size 4000, block align 4), with a JUNK chunk before fmt to
    // exercise the chunk walk (odd size 3 → padded to 4)
    def chunk(tag: String, body: Array[Byte]) =
      tag.getBytes ++ le32(body.length) ++ body ++
        (if (body.length % 2 == 1) Array(0.toByte) else Array.empty[Byte])
    val fmt = chunk("fmt ", le16(1) ++ le16(2) ++ le32(44100) ++
      le32(44100 * 4) ++ le16(4) ++ le16(16))
    val wavBody = chunk("JUNK", Array[Byte](1, 2, 3)) ++ fmt ++
      chunk("data", Array.fill(4000)(0.toByte))
    val wav = "RIFF".getBytes ++ le32(4 + wavBody.length) ++
      "WAVE".getBytes ++ wavBody
    // RIFF/WAVE magic but the fmt chunk is truncated — quarantine
    val truncated = "RIFF".getBytes ++ le32(100) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(16) ++ le16(1)
    // RIFF but not WAVE (an AVI) — quarantine, not the text fallback
    val avi = "RIFF".getBytes ++ le32(8) ++ "AVI ".getBytes ++ le32(0)
    val assets = spark.createDataset(Seq(
      Multimodal.Asset(1L, "audio", wav, "s"),
      Multimodal.Asset(2L, "audio", truncated, "s"),
      Multimodal.Asset(3L, "audio", avi, "s"),
      Multimodal.Asset(4L, "audio", "plain text!".getBytes, "s")))
    val m = Multimodal.extractAudioMeta(assets).collect()
      .map(r => r.asset_id ->
        ((r.sample_rate, r.channels, r.bits, r.n_frames, r.duration_ms))).toMap
    assert(m(1L) == ((44100, 2, 16, 1000L, 22L)), s"WAV decode: ${m(1L)}")
    assert(m(2L) == ((-1, -1, -1, -1L, -1L)), s"truncated fmt: ${m(2L)}")
    assert(m(3L) == ((-1, -1, -1, -1L, -1L)), s"non-WAVE RIFF: ${m(3L)}")
    assert(m(4L) == ((16000, 2, 16, 11L, 0L)), s"text fallback: ${m(4L)}")
  }

  test("FLAC STREAMINFO decode: rate/channels/bits/samples, wrong first block quarantines") {
    import spark.implicits._
    import graft.operators.Multimodal
    // 44100 Hz stereo 16-bit, 88200 total samples (2000 ms):
    // STREAMINFO bit-packing per the published spec
    val body = new Array[Byte](34)
    body(10) = 0x0A; body(11) = 0xC4.toByte   // sample rate 44100, high 16 of 20 bits
    body(12) = 0x42                            // rate low nibble | (ch-1)=1 | bps high bit
    body(13) = 0xF0.toByte                     // bps low nibble (16-1=15) | samples high nibble
    body(14) = 0x00; body(15) = 0x01; body(16) = 0x58; body(17) = 0x88.toByte // 88200
    val flac = "fLaC".getBytes ++
      Array(0x00.toByte, 0.toByte, 0.toByte, 34.toByte) ++ body
    // first metadata block is VORBIS_COMMENT (type 4), not STREAMINFO
    val wrongBlock = "fLaC".getBytes ++
      Array(0x04.toByte, 0.toByte, 0.toByte, 34.toByte) ++ body
    val assets = spark.createDataset(Seq(
      Multimodal.Asset(1L, "audio", flac, "s"),
      Multimodal.Asset(2L, "audio", wrongBlock, "s"),
      Multimodal.Asset(3L, "audio", "fLaC".getBytes, "s"))) // truncated
    val m = Multimodal.extractAudioMeta(assets).collect()
      .map(r => r.asset_id ->
        ((r.sample_rate, r.channels, r.bits, r.n_frames, r.duration_ms))).toMap
    assert(m(1L) == ((44100, 2, 16, 88200L, 2000L)), s"FLAC decode: ${m(1L)}")
    assert(m(2L) == ((-1, -1, -1, -1L, -1L)), s"non-STREAMINFO first: ${m(2L)}")
    assert(m(3L) == ((-1, -1, -1, -1L, -1L)), s"truncated FLAC: ${m(3L)}")
  }

  test("MPEG Layer III decode: frame walk counts sample frames, bad ID3 stream quarantines") {
    import spark.implicits._
    import graft.operators.Multimodal
    // MPEG1 Layer III 44100 Hz 128 kbps stereo, no padding: frame length
    // 144*128000/44100 = 417 bytes
    val hdr = Array(0xFF, 0xFB, 0x90, 0x00).map(_.toByte)
    def frame = hdr ++ Array.fill(413)(0x55.toByte)
    val bare = frame ++ frame ++ frame ++ "TAGtrailing-id3v1".getBytes
    // the same stream behind an ID3v2 tag (10-byte header + 100-byte body)
    val id3 = "ID3".getBytes ++ Array(3, 0, 0).map(_.toByte) ++
      Array(0, 0, 0, 100).map(_.toByte) ++ Array.fill(100)(0x00.toByte)
    val tagged = id3 ++ bare
    // positive ID3 claim but no valid MPEG frame follows → corrupt
    val id3Garbage = id3 ++ "not audio at all".getBytes
    val assets = spark.createDataset(Seq(
      Multimodal.Asset(1L, "audio", bare, "s"),
      Multimodal.Asset(2L, "audio", tagged, "s"),
      Multimodal.Asset(3L, "audio", id3Garbage, "s")))
    val m = Multimodal.extractAudioMeta(assets).collect()
      .map(r => r.asset_id ->
        ((r.sample_rate, r.channels, r.bits, r.n_frames, r.duration_ms))).toMap
    // 3 mpeg frames × 1152 samples = 3456 sample frames; 78 ms at 44.1 kHz;
    // bits = 0 (bit depth is not a property of a codec stream)
    assert(m(1L) == ((44100, 2, 0, 3456L, 78L)), s"MP3 decode: ${m(1L)}")
    assert(m(2L) == ((44100, 2, 0, 3456L, 78L)), s"ID3-tagged: ${m(2L)}")
    assert(m(3L) == ((-1, -1, -1, -1L, -1L)), s"ID3 with garbage: ${m(3L)}")
  }

  test("MP4 box walk: mvhd duration + largest tkhd dims, truncated moov quarantines") {
    import spark.implicits._
    import graft.operators.Multimodal
    def be32(v: Int) = Array((v >> 24).toByte, (v >> 16).toByte,
      (v >> 8).toByte, v.toByte)
    def box(tag: String, body: Array[Byte]): Array[Byte] =
      be32(8 + body.length) ++ tag.getBytes ++ body
    val ftyp = box("ftyp", "isom".getBytes ++ be32(0))
    // mvhd v0: timescale 600, duration 1200 → 2000 ms (100-byte body)
    val mvhd = box("mvhd", new Array[Byte](12) ++ be32(600) ++ be32(1200) ++
      new Array[Byte](80))
    // tkhd v0: width 1280, height 720 as 16.16 fixed at body 76/80
    val tkhd = box("tkhd", new Array[Byte](76) ++ be32(1280 << 16) ++
      be32(720 << 16))
    val trak = box("trak", tkhd)
    val mp4 = ftyp ++ box("moov", mvhd ++ trak)
    // ftyp claimed but the moov box size overruns the payload
    val truncated = ftyp ++ be32(4096) ++ "moov".getBytes
    val assets = spark.createDataset(Seq(
      Multimodal.Asset(1L, "video", mp4, "s"),
      Multimodal.Asset(2L, "video", truncated, "s"),
      Multimodal.Asset(3L, "video", "just some text".getBytes, "s")))
    val m = Multimodal.extractVideoMeta(assets).collect()
      .map(r => r.asset_id ->
        ((r.width, r.height, r.duration_ms, r.n_tracks))).toMap
    assert(m(1L) == ((1280, 720, 2000L, 1)), s"MP4 decode: ${m(1L)}")
    assert(m(2L) == ((-1, -1, -1L, 0)), s"truncated moov: ${m(2L)}")
    // text fallback: pseudo dims/duration from byte length (14 bytes)
    assert(m(3L) == ((30, 30, 14L, 1)), s"text fallback: ${m(3L)}")
  }

  test("round-9 operators are empty-input safe") {
    import spark.implicits._
    import graft.operators.{Analytics, Curation, Events, TextAnalysis}
    val dir = emptyDocsDir()
    assert(TextAnalysis.zipf(spark, dir).count() == 0)
    assert(TextAnalysis.bpePairs(spark, dir).count() == 0)
    assert(TextAnalysis.readability(spark, dir).count() == 0)
    assert(Curation.epochPlan(spark, dir).count() == 0)
    val edir = java.nio.file.Files.createTempDirectory("r9ev").toString
    Seq.empty[(Long, java.sql.Timestamp, Long, String, Double)]
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$edir/events.parquet")
    assert(Events.survival(spark, edir).count() == 0)
    assert(Events.markovStationary(spark, edir).count() == 0)
    assert(Events.changepoint(spark, edir).count() == 0)
    assert(Events.forecast(spark, edir).count() == 0)
    // a single-day history cannot seed the Holt trend either
    val e1 = java.nio.file.Files.createTempDirectory("r9e1").toString
    Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
      7L, "view", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$e1/events.parquet")
    assert(Events.forecast(spark, e1).count() == 0)
    val odir = java.nio.file.Files.createTempDirectory("r9o").toString
    Seq.empty[(Long, Long, String, Double, java.sql.Timestamp, String)]
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.parquet(s"$odir/orders.parquet")
    // benford keeps its 9-digit spine (all-zero counts, NaN-free
    // contribs are not claimed on an empty frame — rows exist, n=0)
    assert(Analytics.gini(spark, odir).count() == 0)
    assert(Analytics.qq(spark, odir).count() == 0)
  }

  test("r15 sequential/fusion operators are empty-safe") {
    import spark.implicits._
    val edir = java.nio.file.Files.createTempDirectory("r15e").toString
    Seq.empty[(Long, java.sql.Timestamp, Long, String, Double, String)]
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$edir/events.parquet")
    // the sharded walks fall through the Nil-cuts single-shard path
    assert(graft.operators.Events.cusum(spark, edir).count() == 0)
    assert(graft.operators.Events.sprt(spark, edir).count() == 0)
    // a global-agg summary may emit its one all-null/zero row; the
    // contract is no crash and no spurious correlation claim
    val kr = graft.operators.Analytics.kendall(spark, edir).collect()
    assert(kr.length <= 1 && kr.forall(r => r.getLong(1) == 0L))
    val ddir = java.nio.file.Files.createTempDirectory("r15d").toString
    Seq.empty[(Long, String)].toDF("doc_id", "text")
      .write.parquet(s"$ddir/documents.parquet")
    assert(graft.operators.Curation.seqlenPlan(spark, ddir).count() == 0)
  }
}
