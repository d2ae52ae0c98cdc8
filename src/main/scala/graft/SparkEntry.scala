package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.p2pLinks(spark, "/root/testdata/sf0.001")

  /** Registry: every operator module contributes its Op entries. */
  def allOps: Seq[Op] =
    Relational.ops ++ Events.ops ++ TextAnalysis.ops ++ Dedup.ops ++
      Similarity.ops ++ Multimodal.ops ++ Reshape.ops ++ Analytics.ops ++
      Skew.ops ++ DocsPipeline.ops ++ Curation.ops ++ Graph.ops ++
      RuntimeFilter.ops ++ History.ops ++ Spatial.ops ++ HtmlExtract.ops ++
      Domains.ops ++ Bpe.ops ++ Layout.ops ++ Retrieval.ops ++ Pdf.ops ++
      SuffixArray.ops ++ FuzzyMatch.ops ++ DataQuality.ops

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allOps.map(op => op.name -> op.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allOps.collect { case Op(n, _, Some(sql)) => n -> sql }.toMap

  /** Oracles whose SQL embeds DATA-DEPENDENT literals (served-index
    * geometry collected from content-addressed snapshots — bounded by
    * contract), so they can only be rendered against a concrete sfDir
    * with a live session. Verify merges these into `oracle_sql.json`
    * alongside the static map; each entry is computed independently so
    * one failure degrades that op to rows-only, never crashes the dump.
    */
  def dynamicOracleSql(spark: SparkSession, sfDir: String,
      only: Option[Set[String]] = None): Map[String, String] =
    Seq[(String, () => String)](
      "sim_ann_ingest" -> (() => Similarity.annIngestOracle(spark, sfDir)),
      "sim_embedding_drift" ->
        (() => Similarity.embeddingDriftOracle(spark, sfDir)),
      "sim_topk_ivf" -> (() => Similarity.ivfTopkOracle(spark, sfDir)),
      "sim_topk_ivf_inc" ->
        (() => Similarity.ivfTopkIncOracle(spark, sfDir)),
      "sim_topk_pq" -> (() => Similarity.pqTopkOracle(spark, sfDir)),
      "sim_topk_pq_inc" -> (() => Similarity.pqTopkIncOracle(spark, sfDir)),
      "sim_topk_ivfpq" -> (() => Similarity.ivfPqTopkOracle(spark, sfDir)),
      "sim_topk_ivfpq_inc" ->
        (() => Similarity.ivfPqTopkIncOracle(spark, sfDir)),
      "text_rrf_fusion" -> (() => Retrieval.rrfFusionOracle(spark, sfDir)),
      "sim_recall_curve" ->
        (() => Similarity.recallCurveOracle(spark, sfDir)),
      "sim_hard_negatives_ann" ->
        (() => Similarity.hardNegativesServedOracle(spark, sfDir)),
      "sim_nprobe_tune" -> (() => Similarity.nprobeTuneOracle(spark, sfDir))
    ).filter { case (name, _) => only.forall(_.contains(name)) }
      .flatMap { case (name, render) =>
        try Some(name -> render())
        catch { case e: Throwable =>
          System.err.println(s"[oracle] $name dynamic render failed: ${e.getMessage}")
          None
        }
      }.toMap
}
