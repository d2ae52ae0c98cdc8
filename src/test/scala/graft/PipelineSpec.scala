package graft

import java.nio.file.Files

import com.sun.net.httpserver.HttpServer
import java.net.InetSocketAddress

import graft.sources.{HttpFetch, SqliteDdl}
import graft.sources.CastMatrix._

/** End-to-end pipeline (SURVEY.md §3), HTTP fetch + snapshot keying
  * (S1/S2), and K1 DDL emission.
  */
class PipelineSpec extends SparkSpec {

  private def zipWith(member: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    z.putNextEntry(new java.util.zip.ZipEntry(member))
    z.write("payload".getBytes)
    z.close()
    bos.toByteArray
  }

  test("pipeline: end-to-end run, then idempotent skip on same snapshot") {
    val root = Files.createTempDirectory("pipe").toString
    val lm = "Wed, 21 Oct 2015 07:28:00 GMT"

    val r1 = Pipeline.run(spark, sfDir, root, zipWith("prism.mdb"), "prism.mdb", lm)
    assert(r1.ran && r1.rows > 0)
    assert(r1.ts == "20151021T072800Z")

    // artifacts exist with the reference layout
    val store = new graft.sources.SnapshotStore(root)
    val json = store.readArtifactString("prism.json", r1.ts)
    assert(json.startsWith("[{") && json.endsWith("}]"))
    assert(store.readArtifactString("prism.json", "latest") == json)
    assert(store.readArtifactString("prism.csv", r1.ts).startsWith("licence_id,client,"))

    // same Last-Modified → whole run skipped (O2)
    val r2 = Pipeline.run(spark, sfDir, root, zipWith("prism.mdb"), "prism.mdb", lm)
    assert(!r2.ran)
  }

  test("pipeline: missing zip member fails with reference error, no marker") {
    val root = Files.createTempDirectory("pipe2").toString
    val lm = "Wed, 21 Oct 2015 07:28:00 GMT"
    val e = intercept[java.util.NoSuchElementException](
      Pipeline.run(spark, sfDir, root, zipWith("other.bin"), "prism.mdb", lm))
    assert(e.getMessage == "no prism.mdb found in prism.zip")
    // failed run leaves no completion marker → retry would re-run
    val r = Pipeline.run(spark, sfDir, root, zipWith("prism.mdb"), "prism.mdb", lm)
    assert(r.ran)
  }

  test("S1/S2: HTTP GET captures Last-Modified; RFC1123→RFC3339 key") {
    val server = HttpServer.create(new InetSocketAddress(0), 0)
    server.createContext("/prism.zip", exchange => {
      val body = "ZIPBYTES".getBytes
      exchange.getResponseHeaders.set("Last-Modified", "Thu, 01 Dec 2022 10:30:00 GMT")
      exchange.sendResponseHeaders(200, body.length)
      exchange.getResponseBody.write(body)
      exchange.close()
    })
    server.start()
    try {
      val port = server.getAddress.getPort
      val f = HttpFetch.get(s"http://127.0.0.1:$port/prism.zip")
      assert(new String(f.body) == "ZIPBYTES")
      assert(f.lastModified.contains("Thu, 01 Dec 2022 10:30:00 GMT"))
      assert(HttpFetch.snapshotTs(f.lastModified.get) == "20221201T103000Z")
      val e = intercept[java.io.IOException](
        HttpFetch.get(s"http://127.0.0.1:$port/missing"))
      assert(e.getMessage.contains("404"))
    } finally server.stop(0)
  }

  test("K1: DDL emission matches the converter's statement shapes") {
    val cols = Seq("id" -> ALong, "name" -> AText, "active" -> ABoolean,
      "fee" -> AMoney, "seen" -> AShortDateTime)
    assert(SqliteDdl.createTable("licence", cols) ==
      "CREATE TABLE licence (id INTEGER, name TEXT, active INTEGER, fee TEXT, seen DATETIME);")
    assert(SqliteDdl.createIndex("licence",
      SqliteDdl.IndexDef("pk", Seq("id"), unique = true)) ==
      "CREATE UNIQUE INDEX licence_pk ON licence (id);")
    assert(SqliteDdl.insertSql("licence", cols.map(_._1)) ==
      "INSERT INTO licence (id, name, active, fee, seen) VALUES (?, ?, ?, ?, ?);")

    import spark.implicits._
    SqliteDdl.assertUnique(Seq(1, 2, 3).toDF("id"), Seq("id"))
    val e = intercept[IllegalArgumentException](
      SqliteDdl.assertUnique(Seq(1, 1).toDF("id"), Seq("id")))
    assert(e.getMessage.contains("UNIQUE violated"))
  }
}
