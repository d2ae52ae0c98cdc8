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
      content_md5: String, width: Int, height: Int, channels: Int)

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

  /** The per-partition decode pass. Header decode is REAL for the two
    * public container formats a pure-JVM parse covers — PNG (IHDR) and
    * BMP (BITMAPINFOHEADER) — and falls back to deterministic
    * length-derived pseudo-dimensions for payloads that are neither
    * (the text fixture), which keeps the oracle recomputable. Full
    * pixel decode (JPEG entropy coding, video codecs) remains the
    * declared seam a JNI/libjpeg/ffmpeg integration would fill; the
    * surrounding plumbing — typed Dataset, per-partition init,
    * binary-safe bytes — is what a swap-in needs and is tested.
    */
  def extractMeta(assets: Dataset[Asset]): Dataset[AssetMeta] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      // One digest instance per partition, reused across rows — the
      // "expensive per-task init" slot a real decoder would occupy.
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { a =>
        val (w, h, ch) = decodeHeader(a.payload)
        md.reset()
        val hex = md.digest(a.payload).map("%02x".format(_)).mkString
        AssetMeta(a.asset_id, a.kind, a.payload.length.toLong, hex, w, h, ch)
      }
    }
  }

  private val PngMagic =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Header decode: (width, height, channels).
    *  - PNG: big-endian IHDR width/height; channels from the color type
    *    (grayscale 1, RGB 3, palette 1, gray+alpha 2, RGBA 4).
    *  - BMP: little-endian BITMAPINFOHEADER width/|height| (negative
    *    height = top-down rows), channels = bits-per-pixel / 8.
    *  - GIF (87a/89a): little-endian u16 logical-screen dims, RGB out.
    *  - A payload that MATCHES a magic but has a truncated or invalid
    *    header decodes to (-1, -1, 0) — the quarantine marker a real
    *    pipeline routes on, never an exception mid-scan.
    *  - Anything else: deterministic pseudo-dims from the byte length
    *    (the fixture path — text payloads — recomputable by the oracle),
    *    channels 3.
    */
  private[operators] def decodeHeader(p: Array[Byte]): (Int, Int, Int) = {
    def beInt(o: Int) = ((p(o) & 255) << 24) | ((p(o + 1) & 255) << 16) |
      ((p(o + 2) & 255) << 8) | (p(o + 3) & 255)
    def leInt(o: Int) = (p(o) & 255) | ((p(o + 1) & 255) << 8) |
      ((p(o + 2) & 255) << 16) | ((p(o + 3) & 255) << 24)
    def leShort(o: Int) = (p(o) & 255) | ((p(o + 1) & 255) << 8)
    val corrupt = (-1, -1, 0)
    if (p.length >= 8 && p.take(8).sameElements(PngMagic)) {
      // IHDR must be the first chunk: 4-byte length (13), "IHDR" tag,
      // 4+4 dims, bit depth, color type
      if (p.length < 26 || beInt(8) != 13 ||
        !(p(12) == 'I' && p(13) == 'H' && p(14) == 'D' && p(15) == 'R'))
        corrupt
      else {
        val w = beInt(16); val h = beInt(20)
        val ch = p(25) match {
          case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
          case _ => -1
        }
        if (w <= 0 || h <= 0 || ch < 0) corrupt else (w, h, ch)
      }
    } else if (p.length >= 6 && p(0) == 'G' && p(1) == 'I' && p(2) == 'F' &&
      p(3) == '8' && (p(4) == '7' || p(4) == '9') && p(5) == 'a') {
      // GIF87a/89a logical screen descriptor: LE u16 width/height at 6/8;
      // frames decode to RGB regardless of palette depth
      if (p.length < 10) corrupt
      else {
        val w = leShort(6); val h = leShort(8)
        if (w <= 0 || h <= 0) corrupt else (w, h, 3)
      }
    } else if (p.length >= 2 && p(0) == 'B' && p(1) == 'M') {
      if (p.length < 30 || leInt(14) < 40) corrupt
      else {
        val w = leInt(18); val h = math.abs(leInt(22))
        val bpp = leShort(28)
        if (w <= 0 || h == 0 || bpp < 8 || bpp % 8 != 0) corrupt
        else (w, h, bpp / 8)
      }
    } else
      (16 + (p.length % 640), 16 + (p.length % 480), 3)
  }

  def meta(spark: SparkSession, dir: String): DataFrame =
    extractMeta(assets(spark, dir)).toDF()

  val metaSql: String =
    """SELECT doc_id AS asset_id,
      |       ['image', 'audio', 'video'][(doc_id % 3) + 1] AS kind,
      |       octet_length(encode(text)) AS n_bytes,
      |       md5(text) AS content_md5,
      |       CAST(16 + octet_length(encode(text)) % 640 AS INT) AS width,
      |       CAST(16 + octet_length(encode(text)) % 480 AS INT) AS height,
      |       CAST(3 AS INT) AS channels
      |FROM documents""".stripMargin

  final case class AudioMeta(asset_id: Long, n_bytes: Long, sample_rate: Int,
      channels: Int, bits: Int, n_frames: Long, duration_ms: Long)

  /** Audio metadata pass — the WAV/RIFF twin of `extractMeta`'s image
    * headers: a real pure-JVM chunk walk for the one audio container a
    * header parse fully covers (RIFF/WAVE: `fmt ` chunk for sample
    * rate / channels / bit depth / block align, `data` chunk size for
    * the frame count and duration). Compressed codecs (MP3/AAC/OGG)
    * remain the declared decoder seam. A payload that claims RIFF but
    * has a truncated or inconsistent header quarantines to -1 fields —
    * routed, never thrown — and non-RIFF payloads (the text fixture) get
    * deterministic pseudo-audio the oracle recomputes.
    */
  def extractAudioMeta(assets: Dataset[Asset]): Dataset[AudioMeta] = {
    import assets.sparkSession.implicits._
    assets.filter(_.kind == "audio").mapPartitions { it =>
      it.map { a =>
        val (sr, ch, bits, frames) = decodeWav(a.payload)
        val dur = if (sr > 0) frames * 1000L / sr else -1L
        AudioMeta(a.asset_id, a.payload.length.toLong, sr, ch, bits, frames, dur)
      }
    }
  }

  /** (sample_rate, channels, bits_per_sample, n_frames). RIFF chunks are
    * word-aligned (odd sizes pad one byte); the walk stops once both
    * `fmt ` and `data` have been seen. Declared sizes are trusted for
    * `data` (a streamed file may truncate the payload; the header is
    * still the authority on intended length, same as image dims).
    */
  private[operators] def decodeWav(p: Array[Byte]): (Int, Int, Int, Long) = {
    def leInt(o: Int) = (p(o) & 255) | ((p(o + 1) & 255) << 8) |
      ((p(o + 2) & 255) << 16) | ((p(o + 3) & 255) << 24)
    def leShort(o: Int) = (p(o) & 255) | ((p(o + 1) & 255) << 8)
    def tag(o: Int, s: String) = p.length >= o + 4 &&
      p(o) == s(0) && p(o + 1) == s(1) && p(o + 2) == s(2) && p(o + 3) == s(3)
    val corrupt = (-1, -1, -1, -1L)
    if (tag(0, "RIFF")) {
      if (!tag(8, "WAVE")) corrupt
      else {
        var off = 12
        var sr = 0; var ch = 0; var bits = 0; var blockAlign = 0
        var dataSize = -1L
        var bad = false
        while (!bad && off + 8 <= p.length && (sr == 0 || dataSize < 0)) {
          val size = leInt(off + 4).toLong & 0xFFFFFFFFL
          if (tag(off, "fmt ")) {
            if (size < 16 || off + 24 > p.length) bad = true
            else {
              ch = leShort(off + 10)
              sr = leInt(off + 12)
              blockAlign = leShort(off + 20)
              bits = leShort(off + 22)
            }
          } else if (tag(off, "data")) dataSize = size
          val step = 8L + size + (size & 1)
          if (off + step > Int.MaxValue) bad = true else off += step.toInt
        }
        if (bad || sr <= 0 || ch <= 0 || bits <= 0 || blockAlign <= 0 ||
          dataSize < 0) corrupt
        else (sr, ch, bits, dataSize / blockAlign)
      }
    } else {
      // deterministic pseudo-audio from the byte length — the fixture
      // path, recomputable declaratively by the oracle
      val n = p.length
      (16000, 1 + n % 2, 16, n.toLong)
    }
  }

  def audioMeta(spark: SparkSession, dir: String): DataFrame =
    extractAudioMeta(assets(spark, dir)).toDF()

  val audioMetaSql: String =
    """SELECT doc_id AS asset_id,
      |       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |       CAST(16000 AS INT) AS sample_rate,
      |       CAST(1 + octet_length(encode(text)) % 2 AS INT) AS channels,
      |       CAST(16 AS INT) AS bits,
      |       CAST(octet_length(encode(text)) AS BIGINT) AS n_frames,
      |       CAST(octet_length(encode(text)) * 1000 // 16000 AS BIGINT) AS duration_ms
      |FROM documents WHERE doc_id % 3 = 1""".stripMargin

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
    Op("multimodal_audio_meta", audioMeta _, Some(audioMetaSql)),
  )
}
