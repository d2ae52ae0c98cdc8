package graft

import java.nio.file.Files

import org.apache.spark.sql.types._

import graft.sources._
import graft.sources.CastMatrix._

/** Cast matrix (SURVEY.md §1.2), snapshot store (O2/O3/K4), zip ingest
  * (S3) and CSV/JSON egress (K2/K3) unit tests.
  */
class SourcesSpec extends SparkSpec {

  // ---------------------------------------------------------- cast matrix

  test("cast matrix maps every Access type (totality)") {
    CastMatrix.all.foreach { t =>
      assert(sparkType(t) != null)
      assert(sqliteDdlType(t).nonEmpty)
    }
  }

  test("cast matrix fails fast on unknown types, like the reference") {
    val e = intercept[IllegalArgumentException](CastMatrix.fromName("COMPLEX"))
    assert(e.getMessage.contains("Unhandled MS Access datatype"))
  }

  test("boolean→0/1 and money→string value rules, nulls preserved") {
    import spark.implicits._
    val df = Seq(
      (Some(true), Some(BigDecimal("12.3400"))),
      (Some(false), None),
      (None, Some(BigDecimal("0.0000")))
    ).toDF("flag", "amount")
      .select($"flag", $"amount".cast(DecimalType(19, 4)).as("amount"))
    val out = CastMatrix.toSqliteParity(df,
      Seq("flag" -> ABoolean, "amount" -> AMoney)).collect()
    assert(out(0).getInt(0) == 1 && out(0).getString(1) == "12.3400")
    assert(out(1).getInt(0) == 0 && out(1).isNullAt(1))
    assert(out(2).isNullAt(0) && out(2).getString(1) == "0.0000")
  }

  test("sqlite DDL classes match the converter's matrix") {
    assert(sqliteDdlType(ABoolean) == "INTEGER")
    assert(sqliteDdlType(AMoney) == "TEXT")      // money stored as text!
    assert(sqliteDdlType(AShortDateTime) == "DATETIME")
    assert(sqliteDdlType(AOle) == "BLOB")
    assert(sqliteDdlType(ANumeric) == "DOUBLE")  // deliberately lossy
  }

  // -------------------------------------------------------- snapshot store

  test("snapshot store: idempotence gate + marker-last ordering") {
    val root = Files.createTempDirectory("snap").toString
    val store = new SnapshotStore(root)
    val ts = "20221201T000000Z" // compact RFC3339: local FS rejects ':' in names
    var runs = 0

    def pipeline(): Unit = {
      runs += 1
      store.writeArtifact("prism.csv", ts, "a,b\n1,2\n".getBytes, alsoLatest = false)
      store.writeArtifact("prism.json", ts, "[]".getBytes) // marker kind LAST
    }

    assert(store.runOnce("prism.json", ts)(pipeline()))   // first run executes
    assert(!store.runOnce("prism.json", ts)(pipeline()))  // second is skipped
    assert(runs == 1)
    assert(store.readArtifactString("prism.json", "latest") == "[]")
    assert(store.readArtifactString("prism.json", ts) == "[]")
    assert(store.readArtifactString("prism.csv", ts) == "a,b\n1,2\n")
  }

  test("table snapshots: partitioned history, latest pointer, pruned read") {
    import spark.implicits._
    val root = Files.createTempDirectory("tsnap").toString
    val store = new SnapshotStore(root)
    store.writeTableSnapshot(Seq((1, "a")).toDF("id", "v"), "links", "20220101T000000Z")
    store.writeTableSnapshot(Seq((2, "b"), (3, "c")).toDF("id", "v"), "links", "20220201T000000Z")

    assert(store.latestSnapshotTs("links") == "20220201T000000Z")
    val latest = store.readTableSnapshot(spark, "links", store.latestSnapshotTs("links"))
    assert(latest.select("id").collect().map(_.getInt(0)).sorted.toSeq == Seq(2, 3))
    val old = store.readTableSnapshot(spark, "links", "20220101T000000Z")
    assert(old.count() == 1) // history immutable, addressable
    // snapshot selection happens at planning time: only one partition's
    // files are ever touched
    assert(latest.inputFiles.forall(_.contains("snapshot_ts=20220201T000000Z")))
  }

  // ------------------------------------------------------------ zip ingest

  test("upsert snapshot: batch wins per key by version, history immutable") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("ups").toString
    val store = new SnapshotStore(root)
    store.upsertTableSnapshot(spark,
      Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("id", "v", "version"),
      "docs", "t1", "id", "version")
    // key 2 updated (higher version), key 1 stale update ignored, key 3 new
    store.upsertTableSnapshot(spark,
      Seq((2L, "B", 2L), (1L, "stale", 0L), (3L, "c", 1L)).toDF("id", "v", "version"),
      "docs", "t2", "id", "version")
    val latest = store.readTableSnapshot(spark, "docs", store.latestSnapshotTs("docs"))
    val m = latest.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m == Map(1L -> "a", 2L -> "B", 3L -> "c"), s"got $m")
    // the t1 snapshot is untouched history
    val old = store.readTableSnapshot(spark, "docs", "t1").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(old == Map(1L -> "a", 2L -> "b"))
  }

  test("compaction: latest snapshot rewritten to one file, data identical") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("cmp").toString
    val store = new SnapshotStore(root)
    store.writeTableSnapshot(
      (1 to 100).map(i => (i.toLong, s"v$i")).toDF("id", "v").repartition(8),
      "ev", "t1")
    store.compactSnapshot(spark, "ev", "t2")
    val dir = new java.io.File(s"$root/ev/snapshot_ts=t2")
    assert(dir.listFiles().count(_.getName.endsWith(".parquet")) == 1)
    assert(store.latestSnapshotTs("ev") == "t2")
    val d = store.readTableSnapshot(spark, "ev", "t2")
    assert(d.count() == 100 && d.agg(org.apache.spark.sql.functions.sum("id"))
      .head().getLong(0) == 5050L)
  }

  test("zip ingest finds a member and errors with reference shape") {
    val bos = new java.io.ByteArrayOutputStream()
    val zout = new java.util.zip.ZipOutputStream(bos)
    zout.putNextEntry(new java.util.zip.ZipEntry("other.txt"))
    zout.write("x".getBytes)
    zout.putNextEntry(new java.util.zip.ZipEntry("prism.mdb"))
    zout.write("MDBBYTES".getBytes)
    zout.close()
    val zip = bos.toByteArray

    assert(new String(ZipIngest.extractMember(zip, "prism.mdb")) == "MDBBYTES")
    assert(ZipIngest.listMembers(zip) == Seq("other.txt", "prism.mdb"))
    val e = intercept[java.util.NoSuchElementException](
      ZipIngest.extractMember(zip, "missing.mdb", "prism.zip"))
    assert(e.getMessage == "no missing.mdb found in prism.zip")
  }

  // ---------------------------------------------------------- csv/json K2/K3

  test("K2/K3 egress: single header CSV + all-string JSON array") {
    import spark.implicits._
    val df = Seq((1L, "n,eeds quoting", 1.5), (2L, "plain", 2.0))
      .toDF("id", "name", "score")
    val dir = Files.createTempDirectory("egress").toString

    CsvJsonEgress.writeCsvSingle(df, s"$dir/out.csv")
    val csv = new String(Files.readAllBytes(java.nio.file.Paths.get(s"$dir/out.csv")))
    assert(csv.startsWith("id,name,score\n"))
    assert(csv.contains("\"n,eeds quoting\""))

    CsvJsonEgress.writeJsonArray(df, s"$dir/out.json")
    val json = new String(Files.readAllBytes(java.nio.file.Paths.get(s"$dir/out.json")))
    assert(json.startsWith("[") && json.endsWith("]"))
    // every value a string — the K3 degradation
    assert(json.contains(""""id":"1""""))
    assert(json.contains(""""score":"1.5""""))
  }

  test("storage classes recorded: NEARLINE history, STANDARD latest pointer") {
    import graft.sources.SnapshotStore
    import spark.implicits._
    val root = Files.createTempDirectory("classes").toString
    val store = new SnapshotStore(root)
    store.writeArtifact("prism.json", "20260813T000000Z", "{}".getBytes)
    // the reference's split (fetch.go:49-53): cold immutable history,
    // hot re-read pointer
    assert(store.storageClassOf("prism.json", "20260813T000000Z") == "NEARLINE")
    assert(store.storageClassOf("prism.json", "latest") == "STANDARD")
    store.writeTableSnapshot(Seq((1L, "a")).toDF("id", "v"), "dim", "t1")
    assert(store.storageClassOf("dim", "snapshot_ts=t1") == "NEARLINE")
    assert(store.storageClassOf("dim_latest", "POINTER") == "STANDARD")
    // the sidecar dir is invisible to Spark's listing: the snapshot
    // still reads back clean through the normal pruned path
    assert(store.readTableSnapshot(spark, "dim", "t1").count() == 1)
  }

  test("writeJsonArray guard: oversized frame fails loudly, no partial file") {
    import spark.implicits._
    val df = (1 to 10).map(i => (i, s"r$i")).toDF("id", "name")
    val dir = Files.createTempDirectory("egressguard").toString
    val dest = s"$dir/big.json"
    val ex = intercept[IllegalStateException] {
      CsvJsonEgress.writeJsonArray(df, dest, maxRows = 3)
    }
    assert(ex.getMessage.contains("writeJsonl"))
    // the truncated artifact must not survive to be mistaken for output
    assert(!Files.exists(java.nio.file.Paths.get(dest)))
    // at exactly the bound the write still succeeds
    assert(CsvJsonEgress.writeJsonArray(df, dest, maxRows = 10) == 10)
    assert(Files.exists(java.nio.file.Paths.get(dest)))
  }

  test("partitioned lake: pruned day read, dynamic overwrite touches only its day") {
    import org.apache.spark.sql.functions._
    val root = Files.createTempDirectory("lake").toString + "/events"
    PartitionedLake.writeEventsByDay(spark, sfDir, root)
    val days = spark.read.parquet(root).select(col("day")).distinct().count()
    assert(days > 1, "fixture spans one day — partition test needs several")
    // pruned read: partition filter present, exactly one partition scanned
    val d = spark.read.parquet(root)
      .agg(min(col("day")).cast("string")).head().getString(0)
    val one = PartitionedLake.readDay(spark, root, d)
    val scan = one.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("isnotnull(day"),
      scan.take(1500))
    assert(one.select(col("day")).distinct().count() == 1)
    val beforeRows = one.count()
    // dynamic overwrite of ONE day: other partitions survive untouched
    val total = spark.read.parquet(root).count()
    val replacement = spark.read.parquet(root)
      .where(col("day") === lit(d).cast("date")).limit(5)
    PartitionedLake.writePartitioned(replacement, root, Seq("day"))
    val after = spark.read.parquet(root)
    assert(after.where(col("day") === lit(d).cast("date")).count() == 5,
      "overwritten day should hold exactly the replacement rows")
    assert(after.count() == total - beforeRows + 5,
      "static-overwrite semantics leaked: other days were truncated")
  }

  test("JSONL: typed roundtrip, multi-line text stays one record, bad line quarantined") {
    import spark.implicits._
    val dir = Files.createTempDirectory("jsonl").toString
    val docs = Seq(
      (1L, "plain text", 10L),
      (2L, "line one\nline two\ttab", 20L), // newline must be escaped, not split
      (3L, null.asInstanceOf[String], 30L)
    ).toDF("doc_id", "text", "n_chars")
    CsvJsonEgress.writeJsonl(docs, s"$dir/corpus")

    val back = CsvJsonEgress.readJsonl(spark, s"$dir/corpus", docs.schema)
    val rows = back.collect().map(r =>
      r.getLong(0) -> (Option(r.getString(1)), r.getLong(2))).toMap
    assert(rows(2L) == ((Some("line one\nline two\ttab"), 20L)))
    assert(rows(3L)._1.isEmpty)
    // types survive (no all-string degradation on this path)
    assert(back.schema("n_chars").dataType.typeName == "long")

    // a malformed line is quarantined with the raw text, never dropped.
    // (Filtering on _corrupt_record must reference a data column too —
    // Spark refuses corrupt-column-only scans; readJsonl's doc says so.)
    Files.write(java.nio.file.Paths.get(s"$dir/corpus/zz-bad.json"),
      "{\"doc_id\": 9, \"text\": unterminated\n".getBytes)
    val all = CsvJsonEgress.readJsonl(spark, s"$dir/corpus", docs.schema)
      .collect()
    assert(all.length == 4)
    val bad = all.filter(r => r.getAs[String]("_corrupt_record") != null)
    assert(bad.length == 1 && bad.head.getAs[String]("_corrupt_record")
      .contains("unterminated"))
    assert(all.count(r => r.getAs[String]("_corrupt_record") == null) == 3)
  }

  // ------------------------------------------------------- WARC ingest

  private def warcRecord(typ: String, uri: String,
      payload: Array[Byte], extra: String = ""): Array[Byte] = {
    val head = s"WARC/1.0\r\n" +
      s"WARC-Type: $typ\r\n" +
      (if (uri.nonEmpty) s"WARC-Target-URI: $uri\r\n" else "") +
      "WARC-Date: 2024-05-01T00:00:00Z\r\n" +
      extra +
      s"Content-Length: ${payload.length}\r\n\r\n"
    head.getBytes("US-ASCII") ++ payload ++ "\r\n\r\n".getBytes("US-ASCII")
  }

  test("WARC: records parse, HTTP splits, corrupt record resyncs") {
    import graft.sources.WarcIngest
    val html = "<html>kia ora</html>"
    val http = ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" +
      "Server: x\r\n\r\n" + html).getBytes("US-ASCII")
    val info = warcRecord("warcinfo", "", "software: graft\r\n".getBytes("US-ASCII"))
    val resp = warcRecord("response", "https://example.nz/", http)
    // corrupt: claims more payload than the stream holds
    val corrupt = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "Content-Length: 99999\r\n\r\nshort").getBytes("US-ASCII")
    val resp2 = warcRecord("response", "https://example.nz/2",
      ("HTTP/1.1 404 Not Found\r\n\r\nnope").getBytes("US-ASCII"))
    val stream = info ++ resp ++ corrupt ++ resp2
    val (recs, quar) = WarcIngest.records(stream)
    assert(recs.map(_.warcType) == Seq("warcinfo", "response", "response"))
    val r = recs(1)
    assert(r.targetUri == "https://example.nz/" && r.httpStatus == 200 &&
      r.httpContentType == "text/html" &&
      new String(r.body, "US-ASCII") == html)
    assert(recs(2).httpStatus == 404)
    // the corrupt record quarantined at ITS offset; later records intact
    assert(quar.size == 1 &&
      quar.head._1 == (info.length + resp.length).toLong &&
      quar.head._2.contains("overruns"), s"quar=$quar")
    // gzip round-trip: the same stream compressed parses identically
    val gz = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(stream); g.close(); bos.toByteArray
    }
    val (recs2, quar2) = WarcIngest.records(gz)
    assert(recs2.map(_.targetUri) == recs.map(_.targetUri) &&
      quar2.size == 1)
  }

  test("WARC: binaryFile frame distributes records + quarantines per file") {
    import graft.sources.WarcIngest
    val dir = java.nio.file.Files.createTempDirectory("warc").toString
    val seg1 = warcRecord("response", "https://a.nz/",
      "HTTP/1.1 200 OK\r\n\r\nbody-a".getBytes("US-ASCII"))
    val seg2 = warcRecord("response", "https://b.nz/",
      "HTTP/1.1 200 OK\r\n\r\nbody-b".getBytes("US-ASCII")) ++
      "WARC/1.0\r\nbroken".getBytes("US-ASCII")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/seg1.warc"), seg1)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/seg2.warc"), seg2)
    val df = WarcIngest.toDataFrame(spark, s"$dir/*.warc")
    val rows = df.collect()
    val good = rows.filter(_.getAs[String]("warc_type") == "response")
    val quar = rows.filter(_.getAs[String]("warc_type") == "_quarantine")
    assert(good.map(_.getAs[String]("target_uri")).sorted.toSeq ==
      Seq("https://a.nz/", "https://b.nz/"))
    assert(good.forall(_.getAs[Int]("http_status") == 200))
    assert(quar.length == 1 &&
      quar.head.getAs[String]("path").endsWith("seg2.warc") &&
      quar.head.getAs[String]("target_uri").contains("unterminated"))
  }

  test("orc round-trip: exact rows and schema through Spark's ORC writer") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("orcrt").toString
    Seq((1L, "alpha", "en", "s0", 5L), (2L, "beta\ttab", "mi", "s1", 8L),
        (3L, null.asInstanceOf[String], "de", "s2", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val r = graft.operators.Reshape.orcRoundtripCheck(spark, dir).head()
    assert(r.getLong(0) == 3L && r.getBoolean(1) && r.getBoolean(2))
  }
}
