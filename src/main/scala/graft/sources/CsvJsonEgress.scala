package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's egress pair (SURVEY.md §2.2 K2/K3):
  *
  *  K2 — CSV with a header row (`.headers on` / `.mode csv`,
  *       `select_point_to_point_links.sql:1-2`), materialized as ONE
  *       file.
  *  K3 — a single JSON *array* of objects in which every field is a
  *       string, field order following the CSV header
  *       (`csv2json2.py:1-3`: "Note all output fields are strings").
  *
  * Internally everything stays typed and partitioned; the all-string
  * degradation and single-file shape are applied only at this final-mile
  * boundary, and only because the reference's artifacts are small by
  * construction (SURVEY.md §7.3). `writeCsvSingle` writes distributed
  * then renames the one part file; `writeJsonArray` streams partition
  * iterators through a driver-side writer without collecting the whole
  * result into memory at once.
  */
object CsvJsonEgress {

  /** All-string projection, preserving column order — the typed → string
    * boundary cast (layer 3 of SURVEY.md §1.2).
    */
  def allStrings(df: DataFrame): DataFrame =
    df.select(df.columns.map(c => col(c).cast("string").as(c)).toSeq: _*)

  /** S6: read a header CSV the way the reference's `csv.DictReader`
    * does — header row names the fields, every value a string
    * (`csv2json2.py:3`). NO schema inference: the reference keeps
    * strings, so the schema is all-StringType by construction.
    */
  def readCsvAllStrings(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("inferSchema", "false") // strings stay strings (S6 parity)
      .csv(path)

  /** K2: header CSV as a single file at `dest`. */
  def writeCsvSingle(df: DataFrame, dest: String,
      hadoopConf: Configuration = new Configuration()): Unit = {
    val tmp = dest + ".tmpdir"
    df.coalesce(1).write.mode("overwrite").option("header", "true").csv(tmp)
    promoteSingle(tmp, dest, ".csv", hadoopConf)
  }

  /** K3: one JSON array file at `dest`, every value stringified. The
    * object-field order matches the DataFrame's column order, like the
    * csv.DictReader → json.dump chain preserves header order. Null
    * values become empty strings BEFORE `to_json` (which would otherwise
    * drop the key entirely) — csv.DictReader reads a blank CSV cell as
    * `''`, so every object carries the full field list. Returns the row
    * count, so callers that need it don't re-execute the plan.
    */
  /** K3 is a FINAL-MILE operator for small boundary artifacts (the
    * reference's is ~385 rows); a misuse on a corpus-scale frame would
    * crawl through the driver iterator for hours. The guard fails loudly
    * once `maxRows` is exceeded — checked during iteration, so no extra
    * count() job and at most maxRows+1 rows are pulled — and deletes the
    * truncated artifact so a partial file can never be mistaken for the
    * real one (the completion-marker discipline of SURVEY §2.4 O3).
    * Corpus-scale egress belongs on `writeJsonl`.
    */
  val MaxJsonArrayRows = 1000000L

  def writeJsonArray(df: DataFrame, dest: String,
      hadoopConf: Configuration = new Configuration(),
      maxRows: Long = MaxJsonArrayRows): Long = {
    val rows = allStrings(df)
      .select(to_json(struct(
        df.columns.map(c => coalesce(col(c), lit("")).as(c)).toSeq: _*)).as("j"))
    val p = new Path(dest)
    val fs = p.getFileSystem(hadoopConf)
    val out = fs.create(p, true)
    var count = 0L
    var ok = false
    try {
      out.write('[')
      // toLocalIterator pulls one partition at a time — bounded driver memory.
      val it = rows.toLocalIterator()
      while (it.hasNext) {
        if (count >= maxRows)
          throw new IllegalStateException(
            s"writeJsonArray($dest) exceeded $maxRows rows — this single-file " +
              s"driver-streamed sink is for small boundary artifacts; use " +
              s"writeJsonl for distributed corpus-scale egress")
        if (count > 0) out.write(',')
        out.write(it.next().getString(0).getBytes("UTF-8"))
        count += 1
      }
      out.write(']')
      ok = true
    } finally {
      // close() can itself throw (flush of the final buffer); it must not
      // skip the delete, or the partial artifact the guard promises can
      // never survive would survive (ADVICE r6).
      try out.close()
      catch { case e: Throwable => if (ok) throw e }
      if (!ok) fs.delete(p, false)
    }
    count
  }

  /** JSONL (one JSON object per line) — the de-facto training-corpus
    * interchange format. Unlike the K2/K3 single-file boundary
    * artifacts, JSONL is a DISTRIBUTED format here: one shard per task
    * (Spark's json sink is already JSON Lines), optionally compressed,
    * so a 100 TB corpus writes with full parallelism. Values keep their
    * types (a JSONL consumer parses JSON scalars, unlike the CSV chain's
    * all-string degradation). Multi-line text survives because JSON
    * string escaping (`\n`) keeps every record on one physical line.
    */
  def writeJsonl(df: DataFrame, dest: String,
      compression: Option[String] = None): Unit = {
    val w = df.write.mode("overwrite")
    compression.foreach(c => w.option("compression", c))
    w.json(dest)
  }

  /** Read JSONL with an EXPLICIT schema — inference is a full extra pass
    * over the corpus at scale, so it is disabled by contract. Malformed
    * lines are quarantined, not dropped: PERMISSIVE mode keeps them as
    * all-null rows carrying the raw line in `_corrupt_record`, so a
    * `dq_checks`-style gate can count them before the corpus is used
    * (silently losing lines is the failure mode this guards against).
    * Caveat (Spark contract): a query may not reference ONLY
    * `_corrupt_record` — include a data column in the projection (or
    * cache first) when counting quarantined lines.
    */
  def readJsonl(spark: org.apache.spark.sql.SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read
      .schema(schema.add("_corrupt_record", "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)

  /** Move the single `part-*` file out of a one-partition write dir. */
  private def promoteSingle(tmpDir: String, dest: String, ext: String,
      hadoopConf: Configuration): Unit = {
    val dir = new Path(tmpDir)
    val fs = dir.getFileSystem(hadoopConf)
    val part = fs.listStatus(dir).map(_.getPath)
      .find(p => p.getName.startsWith("part-") && p.getName.endsWith(ext))
      .getOrElse(throw new IllegalStateException(s"no part file in $tmpDir"))
    val destPath = new Path(dest)
    if (fs.exists(destPath)) fs.delete(destPath, false)
    fs.rename(part, destPath)
    fs.delete(dir, true)
  }
}
