package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import java.nio.charset.StandardCharsets

/** Versioned snapshot store: timestamped immutable artifacts plus a
  * `latest` pointer, with an idempotence gate and a completion marker
  * written last (SURVEY.md §2.8 O2/O3 and §2.2 K4; layout from
  * `fetch.go:48-53`, gate from `fetch.go:55-67,163-178`, marker ordering
  * from `fetch.go:152-157`).
  *
  * Layout: `<root>/<kind>/<ts>` for history, `<root>/<kind>/latest` for
  * the pointer. The timestamped artifact of the FINAL kind doubles as the
  * completion marker, so `isProcessed` proves the whole pipeline ran
  * end-to-end for that snapshot.
  *
  * Uses the Hadoop FileSystem API, so the same code addresses `file://`,
  * `hdfs://`, `gs://`, or `s3a://` roots unchanged — per-object storage
  * classes (NEARLINE history / STANDARD latest, `fetch.go:49-53`) are a
  * deployment concern of the object store, not of this layer.
  */
class SnapshotStore(root: String, hadoopConf: Configuration = new Configuration()) {

  private def path(kind: String, name: String) = new Path(s"$root/$kind/$name")
  private def fs(p: Path): FileSystem = p.getFileSystem(hadoopConf)

  /** The idempotence gate: tri-state exists / not-exists / unknown-error,
    * like the reference's `objectExists` (`fetch.go:163-178` — an
    * unexpected stat error aborts rather than reprocessing).
    */
  def isProcessed(markerKind: String, ts: String): Boolean = {
    val p = path(markerKind, ts)
    fs(p).exists(p) // FileSystem.exists only swallows FileNotFound; other IO errors propagate
  }

  /** Write one artifact's bytes to `<kind>/<ts>` and `<kind>/latest`
    * (latest first — the timestamped copy is what marks completion).
    */
  def writeArtifact(kind: String, ts: String, bytes: Array[Byte],
      alsoLatest: Boolean = true): Unit = {
    if (alsoLatest) writeBytes(path(kind, "latest"), bytes)
    writeBytes(path(kind, ts), bytes)
  }

  /** Run `pipeline` once per snapshot: skip (returning false) when the
    * completion marker for `ts` already exists; otherwise run and expect
    * the pipeline to finish by writing the marker kind last.
    */
  def runOnce(markerKind: String, ts: String)(pipeline: => Unit): Boolean =
    if (isProcessed(markerKind, ts)) false
    else { pipeline; true }

  /** DataFrame-level snapshot versioning (SURVEY.md §1.1): immutable
    * parquet under `<root>/<kind>/snapshot_ts=<ts>/` — the partition
    * column makes snapshot selection a pruned scan (only the requested
    * snapshot's files are read; `.explain` shows it as a
    * PartitionFilter) — plus a `<kind>_latest` pointer file naming the
    * current ts, so "latest" resolution is one tiny read, not a listing.
    */
  def writeTableSnapshot(df: org.apache.spark.sql.DataFrame, kind: String,
      ts: String): Unit = {
    df.write.mode("overwrite")
      .parquet(s"$root/$kind/snapshot_ts=$ts")
    writeBytes(path(s"${kind}_latest", "POINTER"),
      ts.getBytes(StandardCharsets.UTF_8))
  }

  def latestSnapshotTs(kind: String): String =
    readArtifactString(s"${kind}_latest", "POINTER")

  /** Read one snapshot via partition pruning over the full history. */
  def readTableSnapshot(spark: org.apache.spark.sql.SparkSession,
      kind: String, ts: String): org.apache.spark.sql.DataFrame =
    spark.read
      .option("basePath", s"$root/$kind")
      .parquet(s"$root/$kind/snapshot_ts=$ts")

  def readArtifact(kind: String, name: String): Array[Byte] = {
    val p = path(kind, name)
    val in = fs(p).open(p)
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      out.toByteArray
    } finally in.close()
  }

  def readArtifactString(kind: String, name: String): String =
    new String(readArtifact(kind, name), StandardCharsets.UTF_8)

  private def writeBytes(p: Path, bytes: Array[Byte]): Unit = {
    val out = fs(p).create(p, true)
    try out.write(bytes) finally out.close()
  }
}
