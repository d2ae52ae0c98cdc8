package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Op, Tables}

/** Operator composition: the standard first-mile document pipeline —
  * quality filter → exact dedup → enrichment (language, token counts) —
  * fused into ONE Catalyst plan. The point is architectural: because
  * every stage is declarative, the chain costs one scan plus one
  * shuffle (the dedup groupBy); filters and projections from later
  * stages push down through earlier ones, which is exactly what makes a
  * multi-stage pipeline viable at 100 TB.
  */
object DocsPipeline {

  def pipeline(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val quality = TextAnalysis.quality(spark, dir).where(col("keep"))
      .select(col("doc_id"), col("n_words"))
    val langs = TextAnalysis.langId(spark, dir)
      .select(col("doc_id"), col("lang_pred"))
    docs
      .join(quality, "doc_id")
      .join(langs, "doc_id")
      .groupBy(col("text"))                                    // exact dedup
      .agg(
        min(col("doc_id")).as("canonical_id"),
        count(lit(1)).as("n_copies"),
        min(col("n_words")).as("n_words"),
        min(col("lang_pred")).as("lang_pred"))
      .select(col("canonical_id"), col("n_copies"),
        col("n_words"), col("lang_pred"))
  }

  val pipelineSql: String =
    s"""WITH q AS (
       |${TextAnalysis.qualitySql}
       |), l AS (
       |${TextAnalysis.langIdSql}
       |)
       |SELECT min(d.doc_id) AS canonical_id, count(*) AS n_copies,
       |       min(q.n_words) AS n_words, min(l.lang_pred) AS lang_pred
       |FROM documents d
       |JOIN q ON q.doc_id = d.doc_id AND q.keep
       |JOIN l ON l.doc_id = d.doc_id
       |GROUP BY d.text""".stripMargin

  val ops: Seq[Op] = Seq(
    Op("docs_pipeline", pipeline _, Some(pipelineSql)),
  )
}
