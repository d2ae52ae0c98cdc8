package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // driver contract: (sfDir, outDir). Optional third arg (builder-side
    // iteration only): comma-separated op names to restrict the dump to.
    val (sfDir, outDir) = (args(0), args(1))
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      // the library's Catalyst surface (cosine_sim SQL + RangeJoinBanding)
      .withExtensions(new org.apache.spark.sql.graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // µs parquet timestamps (not INT96): pyarrow then reads the dumps
      // as timestamp[us], matching DuckDB's arrow output exactly.
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Boundary lint (r8 verdict #2): an ORACLED query must not emit a
    // DecimalType column — the driver's hash canonicalizes decimal128
    // differently from any local mirror (r8's only two hash failures
    // were exactly the only two decimal-emitting oracled ops, with
    // bit-identical values and arrow types locally). Decimal is the
    // right INTERNAL exactness discipline; cast to DOUBLE at the final
    // select. The lint fails the individual query (no dump written →
    // a red row), never the whole run.
    import org.apache.spark.sql.types._
    def hasDecimal(dt: DataType): Boolean = dt match {
      case _: DecimalType => true
      case s: StructType  => s.fields.exists(f => hasDecimal(f.dataType))
      case a: ArrayType   => hasDecimal(a.elementType)
      case m: MapType     => hasDecimal(m.keyType) || hasDecimal(m.valueType)
      case _              => false
    }
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val dec = df.schema.fields
          .filter(f => hasDecimal(f.dataType)).map(_.name)
        if (SparkEntry.oracleSql.contains(name) && dec.nonEmpty)
          System.err.println(s"[verify] $name LINT-FAIL: DecimalType at " +
            s"oracle boundary (${dec.mkString(",")}) — cast to DOUBLE on " +
            "both engines; the driver hash treats decimal specially")
        else df.coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = (SparkEntry.oracleSql ++
        SparkEntry.dynamicOracleSql(spark, sfDir, only))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Manifest of every attempted query: a query that ERRORS above leaves
    // no dump directory, and a dump-directory walk alone cannot tell
    // "failed" from "never existed" — the local gate reads this to fail
    // loudly on missing dumps instead of skipping them.
    val manifest = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
      .map(q).mkString("[", ",", "]")
    Files.writeString(Paths.get(s"$outDir/_queries.json"), manifest)
    spark.stop()
  }
}
