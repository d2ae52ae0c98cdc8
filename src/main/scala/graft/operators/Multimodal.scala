package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Op, Tables}

/** Multimodal-column handling (north-star extension): image/audio/video
  * payloads as opaque `binary` columns with typed metadata, processed by
  * an imperative per-partition decode pass.
  *
  * The decode itself is a STUB — no image/audio codecs exist in this
  * build — but the Spark-side plumbing is real and is what's under test:
  * a typed `Dataset[Asset]`, `mapPartitions` batch iteration (one
  * decoder/codec context per partition, amortized across its rows — the
  * pattern a real libjpeg/ffmpeg integration needs), explicit output
  * schema via Encoders, and binary-safe byte handling.
  *
  * The container has no media fixtures, so payload bytes are the
  * documents' UTF-8 text — which makes the stub's outputs (byte length,
  * md5, deterministic fake dimensions) independently recomputable by the
  * DuckDB oracle: the imperative mapPartitions path is value-checked
  * against a declarative SQL twin.
  */
object Multimodal {

  final case class Asset(asset_id: Long, kind: String, payload: Array[Byte],
      source: String)
  final case class AssetMeta(asset_id: Long, kind: String, n_bytes: Long,
      content_md5: String, width: Int, height: Int)

  /** Binary asset table derived from the documents fixture: payload =
    * UTF-8 bytes, modality assigned round-robin.
    */
  def assets(spark: SparkSession, dir: String): Dataset[Asset] = {
    import spark.implicits._
    Tables(spark, dir, "documents")
      .select(
        col("doc_id").as("asset_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        col("text").cast("binary").as("payload"),
        col("source"))
      .as[Asset]
  }

  /** The per-partition "decode" pass. A real implementation opens one
    * codec context per partition and decodes each payload; the stub
    * derives deterministic fake dimensions from the byte length. The
    * `???`-equivalent seam is `decodeStub` — swap it for a JNI/libjpeg
    * call without touching the surrounding plumbing.
    */
  def extractMeta(assets: Dataset[Asset]): Dataset[AssetMeta] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      // One digest instance per partition, reused across rows — the
      // "expensive per-task init" slot a real decoder would occupy.
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { a =>
        val (w, h) = decodeStub(a.payload)
        md.reset()
        val hex = md.digest(a.payload).map("%02x".format(_)).mkString
        AssetMeta(a.asset_id, a.kind, a.payload.length.toLong, hex, w, h)
      }
    }
  }

  /** STUB decoder: fake dimensions from the payload length. Replace with
    * a real codec; deterministic so the oracle can recompute it.
    */
  private def decodeStub(payload: Array[Byte]): (Int, Int) =
    (16 + (payload.length % 640), 16 + (payload.length % 480))

  def meta(spark: SparkSession, dir: String): DataFrame =
    extractMeta(assets(spark, dir)).toDF()

  val metaSql: String =
    """SELECT doc_id AS asset_id,
      |       ['image', 'audio', 'video'][(doc_id % 3) + 1] AS kind,
      |       octet_length(encode(text)) AS n_bytes,
      |       md5(text) AS content_md5,
      |       CAST(16 + octet_length(encode(text)) % 640 AS INT) AS width,
      |       CAST(16 + octet_length(encode(text)) % 480 AS INT) AS height
      |FROM documents""".stripMargin

  val ops: Seq[Op] = Seq(
    Op("multimodal_meta", meta _, Some(metaSql)),
  )
}
