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
  * `hdfs://`, `gs://`, or `s3a://` roots unchanged. The reference's
  * per-object storage classes (NEARLINE history / STANDARD latest,
  * `fetch.go:49-53`) have no FileSystem-API verb, so the store RECORDS
  * each object's intended class in a hidden `_storage_class/` sidecar
  * (underscore prefix = invisible to Spark/Hadoop input listing): a
  * `gs://` deployment maps the recorded class to the
  * `x-goog-storage-class` header or a lifecycle rule, and the policy —
  * cold immutable history, hot mutable pointer — is pinned by spec
  * instead of living only in deployment docs.
  */
class SnapshotStore(root: String, hadoopConf: Configuration = new Configuration()) {

  private def path(kind: String, name: String) = new Path(s"$root/$kind/$name")
  private def fs(p: Path): FileSystem = p.getFileSystem(hadoopConf)

  /** Reference storage-class policy (`fetch.go:49-53`): the `latest`
    * pointer (and the `POINTER` file of table snapshots) is re-read
    * every run → STANDARD; timestamped history is written once and
    * read ~never → NEARLINE.
    */
  def storageClassFor(name: String): String =
    if (name == "latest" || name == "POINTER") "STANDARD" else "NEARLINE"

  private def recordClass(kind: String, name: String): Unit =
    writeBytes(path(kind, s"_storage_class/$name"),
      storageClassFor(name).getBytes(StandardCharsets.UTF_8))

  /** The class recorded for an object at write time (deployment shims
    * read this to apply the real object-store attribute). */
  def storageClassOf(kind: String, name: String): String =
    readArtifactString(kind, s"_storage_class/$name")

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
    if (alsoLatest) { writeBytes(path(kind, "latest"), bytes); recordClass(kind, "latest") }
    writeBytes(path(kind, ts), bytes)
    recordClass(kind, ts)
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
    *
    * `zorderBy` opts the snapshot into the Morton write layout
    * (`ZOrder.writeZOrdered`): rows clustered along the z-curve of two
    * numeric columns, so readers filtering on either dimension prune row
    * groups off parquet footer stats. The write pays one range shuffle;
    * reads of the snapshot prune forever after.
    */
  def writeTableSnapshot(df: org.apache.spark.sql.DataFrame, kind: String,
      ts: String, zorderBy: Option[(String, String)] = None,
      zPartitions: Int = 8): Unit = {
    val dest = s"$root/$kind/snapshot_ts=$ts"
    zorderBy match {
      case Some((c1, c2)) => ZOrder.writeZOrdered(df, dest, c1, c2, zPartitions)
      case None => df.write.mode("overwrite").parquet(dest)
    }
    writeBytes(path(s"${kind}_latest", "POINTER"),
      ts.getBytes(StandardCharsets.UTF_8))
    recordClass(s"${kind}_latest", "POINTER")
    recordClass(kind, s"snapshot_ts=$ts")
  }

  /** Upsert merge — the slowly-growing-table write path (SCD-1 / CDC
    * apply): the new batch is merged into the latest snapshot keeping,
    * per key, the row with the highest `version` (batch wins ties), and
    * the result lands as a NEW immutable snapshot — history stays
    * readable, readers of `latest` flip atomically with the pointer.
    * One shuffle on the key for the rank; at any scale the cost is the
    * merged table's size, the same as a lakehouse MERGE rewrite without
    * file-level pruning (which needs a table format's transaction log,
    * out of scope here; the snapshot layout is the transaction).
    */
  def upsertTableSnapshot(spark: org.apache.spark.sql.SparkSession,
      batch: org.apache.spark.sql.DataFrame, kind: String, ts: String,
      key: String, version: String): Unit = {
    import org.apache.spark.sql.functions.{col, lit, row_number}
    import org.apache.spark.sql.expressions.Window
    val merged =
      if (hasAnySnapshot(kind)) {
        // The merge reads the latest snapshot LAZILY; writing the result
        // to the same snapshot_ts would overwrite the directory still
        // being read mid-job (ADVICE r4). Snapshots are immutable —
        // a merge must land as a NEW ts.
        require(ts != latestSnapshotTs(kind),
          s"upsert for '$kind' must use a new snapshot ts, not the " +
            s"latest one ($ts) it reads from")
        val prev = readTableSnapshot(spark, kind, latestSnapshotTs(kind))
          .drop("snapshot_ts").withColumn("__graft_src", lit(0))
        val cur = batch.withColumn("__graft_src", lit(1))
        val w = Window.partitionBy(col(key))
          .orderBy(col(version).desc, col("__graft_src").desc)
        prev.unionByName(cur)
          .withColumn("__graft_rk", row_number().over(w))
          .where(col("__graft_rk") === 1)
          .drop("__graft_rk", "__graft_src")
      } else batch
    writeTableSnapshot(merged, kind, ts)
  }

  private def hasAnySnapshot(kind: String): Boolean = {
    val p = path(s"${kind}_latest", "POINTER")
    fs(p).exists(p)
  }

  /** Small-file compaction: rewrite the LATEST snapshot of `kind` into
    * `numFiles` files as a new snapshot (coalesce, no shuffle — the
    * file-count fix for a store that accumulated many tiny
    * streaming/upsert writes; readers pay open-file overhead per file,
    * and parquet row groups amortize better in fewer, larger files).
    */
  def compactSnapshot(spark: org.apache.spark.sql.SparkSession,
      kind: String, ts: String, numFiles: Int = 1): Unit = {
    // Same lazy-read hazard as upsertTableSnapshot: compacting INTO the
    // snapshot being read would corrupt or lose the latest snapshot.
    require(ts != latestSnapshotTs(kind),
      s"compaction for '$kind' must land as a new snapshot ts, not " +
        s"overwrite the latest one ($ts) it reads from")
    val cur = readTableSnapshot(spark, kind, latestSnapshotTs(kind))
      .drop("snapshot_ts")
    writeTableSnapshot(cur.coalesce(numFiles), kind, ts)
  }

  /** Has `writeTableSnapshot(kind, ts)` completed? Keyed off the parquet
    * `_SUCCESS` marker, so a write that died mid-flight does not count. */
  def hasTableSnapshot(kind: String, ts: String): Boolean =
    isProcessed(kind, s"snapshot_ts=$ts/_SUCCESS")

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

object SnapshotStore {

  /** A tmp-rooted store CONTENT-ADDRESSED by a source file's identity:
    * returns (store, ts) where ts encodes the source's (length, mtime),
    * so a regenerated source invalidates every derived snapshot and a
    * repeat call serves the cached one. This is the single-process
    * analogue of the ingest-time derived-table build (int8 ANN corpus,
    * dedup fingerprint history): the derivation runs once per source
    * version, queries pay only the derived scan. Pair with
    * `hasTableSnapshot` for the write-once gate.
    */
  def contentAddressed(spark: org.apache.spark.sql.SparkSession,
      srcPath: String, namespace: String): (SnapshotStore, String) =
    contentAddressed(spark, Seq(srcPath), namespace)

  /** Multi-source variant: when a derived snapshot depends on SEVERAL
    * inputs (e.g. `componentsIncremental`'s label store derives from the
    * lineitem×orders join), the key must fold every input's identity —
    * keying on one path alone would serve a stale snapshot when only the
    * other input regenerates.
    */
  def contentAddressed(spark: org.apache.spark.sql.SparkSession,
      srcPaths: Seq[String], namespace: String): (SnapshotStore, String) = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val key = srcPaths.map { srcPath =>
      val p = new Path(srcPath)
      val fs = p.getFileSystem(hconf)
      val st = fs.getFileStatus(p)
      // For a DIRECTORY source (a parquet dataset), (len, mtime)
      // degenerates to mtime-only — len is the fs block entry, not
      // content — and a regenerated fixture within mtime granularity
      // would serve a stale cached artifact across JVM runs (the store
      // lives in java.io.tmpdir). Fold every child's (name, len, mtime)
      // into the key instead.
      if (st.isDirectory) {
        val h = fs.listStatus(p).sortBy(_.getPath.getName)
          .foldLeft(1125899906842597L) { (acc, c) =>
            ((acc * 31 + c.getPath.getName.hashCode) * 31 + c.getLen) * 31 +
              c.getModificationTime
          }
        s"d_${java.lang.Long.toHexString(h)}"
      } else s"${st.getLen}_${st.getModificationTime}"
    }.mkString("_")
    val root = s"${System.getProperty("java.io.tmpdir")}/$namespace/" +
      Integer.toHexString(srcPaths.mkString(",").hashCode)
    (new SnapshotStore(root, hconf), key)
  }
}
