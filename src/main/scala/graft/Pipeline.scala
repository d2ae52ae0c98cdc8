package graft

import org.apache.spark.sql.SparkSession

import graft.operators.Relational
import graft.sources._

/** The reference's entire `/fetch` pipeline as one driver function
  * (SURVEY.md §3 entry point 1): fetch zip → snapshot key → idempotence
  * gate → archive → extract member → run the flagship query → CSV → JSON
  * array → versioned store, marker last.
  *
  * Where the reference crossed four process boundaries (java, sqlite3 ×2,
  * python3 — `fetch.go:191,198,222,236`), stages 9-13 here are one lazily
  * built Catalyst plan executed once; the store writes around it are the
  * only driver-side IO. The mdb→sqlite conversion stage is modeled at the
  * table layer (SURVEY.md §7.3: no Access reader exists offline) — the
  * fixture parquet tables stand in for the converted database, and the
  * §1.2 cast matrix + K1 DDL emission cover the conversion semantics.
  */
object Pipeline {

  final case class Result(ts: String, ran: Boolean, rows: Long)

  /** Run one snapshot end-to-end against a fixture dir, with artifacts
    * under `storeRoot`. `zipBytes`+`memberName` model the fetched
    * archive; `lastModified` (RFC 1123) keys the snapshot.
    */
  def run(spark: SparkSession, sfDir: String, storeRoot: String,
      zipBytes: Array[Byte], memberName: String,
      lastModified: String): Result = {
    val ts = HttpFetch.snapshotTs(lastModified)
    val store = new SnapshotStore(storeRoot)

    // O2: the idempotence gate — the timestamped JSON is the completion
    // marker, so its existence proves a full prior run (fetch.go:55-66).
    var rows = 0L
    val ran = store.runOnce("prism.json", ts) {
      // Archive the raw snapshot first (fetch.go:78).
      store.writeArtifact("prism.zip", ts, zipBytes, alsoLatest = false)

      // S3: member scan — hard error parity if absent (fetch.go:278-285).
      ZipIngest.extractMember(zipBytes, memberName, "prism.zip")

      // Stages 9-13 as ONE plan: read → 8-way join + filters + trim →
      // all-string reshape. No process boundaries, no intermediate files.
      // Cached across the two egress writes so the 8-way join executes
      // once, not once per artifact (and not a third time for the row
      // count, which falls out of the JSON writer's iteration).
      val result = Relational.p2pLinks(spark, sfDir).persist()
      try {
        // K2: header CSV, single artifact (small by construction).
        val csvDest = java.nio.file.Files.createTempDirectory("egress")
          .resolve("links.csv").toString
        CsvJsonEgress.writeCsvSingle(result, csvDest)
        store.writeArtifact("prism.csv", ts,
          java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(csvDest)),
          alsoLatest = false)

        // K3 + K4: all-string JSON array → latest, then the timestamped
        // marker LAST (fetch.go:149-157 ordering).
        val jsonDest = java.nio.file.Files.createTempDirectory("egress")
          .resolve("links.json").toString
        rows = CsvJsonEgress.writeJsonArray(result, jsonDest)
        store.writeArtifact("prism.json", ts,
          java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(jsonDest)))
      } finally result.unpersist()
    }

    Result(ts, ran, rows)
  }
}
