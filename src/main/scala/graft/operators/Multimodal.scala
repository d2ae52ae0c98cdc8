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

  final case class Frame(asset_id: Long, frame_idx: Int, frame_offset: Long,
      frame_md5: String)

  /** Frame sampling for video assets: emit k evenly-spaced "frames" per
    * payload (k derived from payload size). The sampler is the real
    * plumbing — a flatMap inside mapPartitions, one output row per frame,
    * offsets computed from asset metadata; the frame "decode" hashes the
    * byte slice where a codec would decode it. Same shape a real
    * ffmpeg-backed sampler needs: per-partition codec init, per-asset
    * seek table, per-frame emission.
    */
  def sampleFrames(assets: Dataset[Asset]): Dataset[Frame] = {
    import assets.sparkSession.implicits._
    assets.filter(_.kind == "video").mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.flatMap { a =>
        val n = a.payload.length
        val k = math.min(4, 1 + n % 4)
        (0 until k).map { i =>
          val off = i.toLong * n / k
          md.reset()
          // "decode" = hash the 16-byte window at the frame offset
          val end = math.min(n, off.toInt + 16)
          md.update(a.payload, off.toInt, end - off.toInt)
          Frame(a.asset_id, i, off,
            md.digest().map("%02x".format(_)).mkString)
        }
      }
    }
  }

  def frames(spark: SparkSession, dir: String): DataFrame =
    sampleFrames(assets(spark, dir)).toDF()

  // DuckDB can't slice BLOBs; the fixture payload is ASCII text, so a
  // VARCHAR substr yields the identical bytes for the frame-window md5.
  val framesSql: String =
    """WITH v AS (
      |  SELECT doc_id AS asset_id, text,
      |         octet_length(encode(text)) AS n,
      |         least(4, 1 + octet_length(encode(text)) % 4) AS k
      |  FROM documents WHERE doc_id % 3 = 2
      |)
      |SELECT asset_id, CAST(i AS INT) AS frame_idx,
      |       CAST(i * n // k AS BIGINT) AS frame_offset,
      |       md5(substr(text, CAST(i * n // k + 1 AS INT),
      |                  CAST(least(CAST(16 AS BIGINT), n - i * n // k) AS INT))) AS frame_md5
      |FROM v, unnest(range(0, k)) AS t(i)""".stripMargin

  /** Resize stub for image assets: the plumbing of a bounded-box resize
    * (aspect-preserving target dims from the stubbed source dims) without
    * a codec. Pure metadata math — runs as a codegen'd projection; only
    * the pixel work is stubbed out.
    */
  def resizePlan(spark: SparkSession, dir: String, maxDim: Int = 256): DataFrame =
    meta(spark, dir)
      .where(col("kind") === "image")
      .withColumn("scale",
        least(lit(1.0), lit(maxDim) / greatest(col("width"), col("height"))))
      .select(col("asset_id"), col("width"), col("height"),
        floor(col("width") * col("scale")).cast("int").as("out_width"),
        floor(col("height") * col("scale")).cast("int").as("out_height"))

  val ops: Seq[Op] = Seq(
    Op("multimodal_meta", meta _, Some(metaSql)),
    Op("multimodal_frames", frames _, Some(framesSql)),
  )
}
