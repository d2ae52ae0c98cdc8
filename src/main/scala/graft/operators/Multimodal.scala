package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Op, Tables}

/** Multimodal-column handling (north-star extension): image/audio/video
  * payloads as opaque `binary` columns with typed metadata, processed by
  * an imperative per-partition decode pass.
  *
  * CONTAINER-LEVEL decode is real, pure-JVM, for every format a
  * header/frame walk covers without entropy decoding: PNG/BMP/GIF image
  * headers, WAV/RIFF chunk walks, FLAC STREAMINFO, MPEG Layer III frame
  * walks, and ISO-BMFF (MP4/MOV) box walks. What stays stubbed is the
  * CODEC layer (JPEG entropy coding, AAC/Vorbis, video codecs) — the
  * declared JNI/libjpeg/ffmpeg seam. The Spark-side plumbing those
  * codecs would plug into is real and under test: a typed
  * `Dataset[Asset]`, `mapPartitions` batch iteration (one decoder/codec
  * context per partition, amortized across its rows), explicit output
  * schema via Encoders, and binary-safe byte handling.
  *
  * The container has no media fixtures, so fixture payload bytes are the
  * documents' UTF-8 text — which takes each operator's deterministic
  * fallback path, independently recomputable by the DuckDB oracle; the
  * real container parses are pinned by EdgeCaseSpec on synthetic
  * spec-valid bytes (same self-referential-fixture caveat as
  * `MdbCatalog`, documented there).
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
    } else if (p.length >= 3 && (p(0) & 0xFF) == 0xFF &&
      (p(1) & 0xFF) == 0xD8) {
      // JPEG (SOI marker): walk FF-prefixed segments to the first SOFn
      // frame header (height/width/components at +5/+7/+9 of its body).
      // DHT/JPG-ext/DAC (C4/C8/CC) are SOF-range but not frames. SOS or
      // EOI before any SOF — or a misaligned/overrunning segment —
      // quarantines. Every branch advances ≥ 1 byte: no stall possible.
      // (A UTF-8 text payload can never begin 0xFF, so the fixture's
      // pseudo-dims fallback path is untouched — the oracle contract.)
      def beShort(o: Int) = ((p(o) & 255) << 8) | (p(o + 1) & 255)
      var o = 2
      var res = corrupt
      var done = false
      while (!done && o + 1 < p.length) {
        if ((p(o) & 0xFF) != 0xFF) done = true // marker misalignment
        else {
          val m = p(o + 1) & 0xFF
          if (m == 0xFF) o += 1                // fill byte before marker
          else if (m == 0x01 || (m >= 0xD0 && m <= 0xD8)) o += 2
          else if (m == 0xD9 || m == 0xDA) done = true // EOI/SOS, no SOF
          else if (o + 3 >= p.length) done = true
          else {
            val len = beShort(o + 2)
            if (len < 2 || o + 2 + len > p.length) done = true
            else if (m >= 0xC0 && m <= 0xCF &&
              m != 0xC4 && m != 0xC8 && m != 0xCC) {
              if (len >= 8) {
                val h = beShort(o + 5); val w = beShort(o + 7)
                val ch = p(o + 9) & 0xFF
                if (w > 0 && h > 0 && ch > 0) res = (w, h, ch)
              }
              done = true
            } else o += 2 + len
          }
        }
      }
      res
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

  /** Audio metadata pass — the audio twin of `extractMeta`'s image
    * headers: real pure-JVM parses for the three audio formats a
    * header/frame walk fully covers without entropy decode —
    * RIFF/WAVE (`fmt ` chunk: sample rate / channels / bit depth /
    * block align; `data` size → frame count), FLAC (STREAMINFO block:
    * rate / channels / bits / total samples), and MPEG Layer III
    * (first frame header after any ID3v2 tag, then a frame-length walk
    * that counts frames — `bits` is 0 there, bit depth not being a
    * property of a codec stream). PCM-in-the-container (AAC, OGG
    * internals) remains the declared decoder seam. A payload that
    * positively matches a container but has a truncated or
    * inconsistent header quarantines to -1 fields — routed, never
    * thrown — and unidentifiable payloads (the text fixture) get
    * deterministic pseudo-audio the oracle recomputes.
    */
  def extractAudioMeta(assets: Dataset[Asset]): Dataset[AudioMeta] = {
    import assets.sparkSession.implicits._
    assets.filter(_.kind == "audio").mapPartitions { it =>
      it.map { a =>
        val (sr, ch, bits, frames) = decodeAudio(a.payload)
        val dur = if (sr > 0) frames * 1000L / sr else -1L
        AudioMeta(a.asset_id, a.payload.length.toLong, sr, ch, bits, frames, dur)
      }
    }
  }

  /** Container dispatch: RIFF and FLAC detect on unambiguous magics;
    * MPEG audio detects on an ID3v2 preamble or a frame sync whose
    * header fields all validate (0xFF cannot occur in the fixture's
    * UTF-8 text, and the full-validity requirement keeps arbitrary
    * binary from sliding into the corrupt marker of a format it never
    * claimed — detection confidence gates which fallback applies).
    */
  private[operators] def decodeAudio(p: Array[Byte]): (Int, Int, Int, Long) =
    if (p.length >= 4 && p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F')
      decodeWav(p)
    else if (p.length >= 4 && p(0) == 'f' && p(1) == 'L' && p(2) == 'a' && p(3) == 'C')
      decodeFlac(p)
    else decodeMp3(p).getOrElse {
      // deterministic pseudo-audio from the byte length — the fixture
      // path, recomputable declaratively by the oracle
      val n = p.length
      (16000, 1 + n % 2, 16, n.toLong)
    }

  /** FLAC STREAMINFO (the mandatory first metadata block): 34-byte body
    * holding, from bit offset 80: 20-bit sample rate, 3-bit channels-1,
    * 5-bit bits-per-sample-1, 36-bit total samples. Returns the corrupt
    * marker when the first block is not STREAMINFO or the numbers are
    * out of spec range.
    */
  private[operators] def decodeFlac(p: Array[Byte]): (Int, Int, Int, Long) = {
    val corrupt = (-1, -1, -1, -1L)
    if (p.length < 4 + 4 + 34) return corrupt
    def u8(o: Int) = p(o) & 0xFF
    if ((u8(4) & 0x7F) != 0) return corrupt // first block must be STREAMINFO
    val blockLen = (u8(5) << 16) | (u8(6) << 8) | u8(7)
    if (blockLen < 34) return corrupt
    val b = 8 // STREAMINFO body offset
    val sr = (u8(b + 10) << 12) | (u8(b + 11) << 4) | (u8(b + 12) >>> 4)
    val ch = ((u8(b + 12) >>> 1) & 0x7) + 1
    val bits = (((u8(b + 12) & 1) << 4) | (u8(b + 13) >>> 4)) + 1
    val samples = ((u8(b + 13) & 0xF).toLong << 32) |
      ((u8(b + 14).toLong << 24) | (u8(b + 15) << 16) |
        (u8(b + 16) << 8) | u8(b + 17))
    if (sr <= 0 || sr > 655350) corrupt
    else (sr, ch, bits, samples)
  }

  // MPEG audio tables (Layer III): sample rates by version, bitrates in
  // kbps (index 0 = "free format", unsupported here; 15 = invalid).
  private val Mp3RatesV1 = Array(44100, 48000, 32000)
  private val Mp3RatesV2 = Array(22050, 24000, 16000)
  private val Mp3RatesV25 = Array(11025, 12000, 8000)
  private val Mp3BitrateV1 =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val Mp3BitrateV2 =
    Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)

  /** MPEG Layer III stream scan. `None` = not identifiable as MPEG
    * audio at all (caller falls back); `Some(corrupt)` = carried an
    * ID3v2 preamble (a positive claim) but no valid frame follows.
    * Frames are COUNTED by stepping computed frame lengths —
    * 144·bitrate/rate (+padding) for MPEG1, half for MPEG2/2.5 — and
    * n_frames is returned in PCM sample frames (mpeg frames × 1152 or
    * 576) so duration_ms composes identically to the WAV path. The
    * walk stops at the first non-sync byte (trailing ID3v1 tags etc.).
    */
  private[operators] def decodeMp3(p: Array[Byte]): Option[(Int, Int, Int, Long)] = {
    def u8(o: Int) = p(o) & 0xFF
    // tightened claim (parseId3Tags parity): the version byte must be
    // a KNOWN ID3v2 major (2/3/4), so text that merely starts with the
    // string "ID3 " never claims (version byte 0x20) — a spurious
    // claim here would quarantine as corrupt MPEG while the oracle
    // emits the unconditional pseudo row
    val hasId3 = p.length >= 10 && p(0) == 'I' && p(1) == 'D' && p(2) == '3' &&
      (u8(3) == 2 || u8(3) == 3 || u8(3) == 4) && u8(4) != 0xFF &&
      u8(6) < 0x80 && u8(7) < 0x80 && u8(8) < 0x80 && u8(9) < 0x80
    val start =
      if (hasId3)
        10 + ((u8(6) << 21) | (u8(7) << 14) | (u8(8) << 7) | u8(9))
      else 0
    // one frame header parse: (sampleRate, channels, samplesPerFrame, frameLen)
    def frame(o: Int): Option[(Int, Int, Int, Int)] = {
      if (o + 4 > p.length || u8(o) != 0xFF || (u8(o + 1) & 0xE0) != 0xE0)
        return None
      val ver = (u8(o + 1) >>> 3) & 0x3   // 0=2.5, 2=MPEG2, 3=MPEG1
      val layer = (u8(o + 1) >>> 1) & 0x3 // 1 = Layer III
      val brIdx = (u8(o + 2) >>> 4) & 0xF
      val srIdx = (u8(o + 2) >>> 2) & 0x3
      val pad = (u8(o + 2) >>> 1) & 0x1
      if (ver == 1 || layer != 1 || brIdx == 0 || brIdx == 15 || srIdx == 3)
        return None
      val sr = (if (ver == 3) Mp3RatesV1 else if (ver == 2) Mp3RatesV2
        else Mp3RatesV25)(srIdx)
      val kbps = (if (ver == 3) Mp3BitrateV1 else Mp3BitrateV2)(brIdx)
      val spf = if (ver == 3) 1152 else 576
      val len = (spf / 8) * kbps * 1000 / sr + pad
      val ch = if (((u8(o + 3) >>> 6) & 0x3) == 3) 1 else 2
      Some((sr, ch, spf, len))
    }
    frame(start) match {
      case None => if (hasId3) Some((-1, -1, -1, -1L)) else None
      case Some((sr, ch, spf, _)) =>
        var off = start
        var mpegFrames = 0L
        var ok = true
        while (ok) frame(off) match {
          case Some((_, _, _, len)) if len > 4 =>
            mpegFrames += 1; off += len
          case _ => ok = false
        }
        Some((sr, ch, 0, mpegFrames * spf))
    }
  }

  /** One frame's parsed Layer III side info, summed over its granules. */
  private final case class SideInfoFrame(mainDataBegin: Int,
      granuleChannels: Int, part23Bits: Long, shortBlocks: Int,
      mainDataBytes: Int)

  /** Layer III side-info parse for ONE frame at offset `o` with header
    * fields already decoded. Pure ISO 11172-3 / 13818-3 bit layout —
    * NO Annex-B tables involved (that's what makes this half of the
    * Layer III structure honestly implementable here; see
    * `mp3SideInfo`'s scaladoc for the seam statement). Returns None on
    * any structural violation: truncation, a reserved block_type-0
    * window switch, or big_values past the spec's 288 ceiling.
    */
  private def parseSideInfoFrame(p: Array[Byte], o: Int, mpeg1: Boolean,
      mono: Boolean, crc: Boolean, frameLen: Int): Option[SideInfoFrame] = {
    val nch = if (mono) 1 else 2
    val sideLen =
      if (mpeg1) { if (mono) 17 else 32 }
      else { if (mono) 9 else 17 }
    val sideOff = o + 4 + (if (crc) 2 else 0)
    if (sideOff + sideLen > p.length || o + frameLen > p.length) return None
    val mainBytes = frameLen - 4 - (if (crc) 2 else 0) - sideLen
    if (mainBytes < 0) return None
    // Every side-info field is FIXED width and both window branches
    // consume the same 22 bits, so the walk reads exactly sideLen
    // bytes (verified above against p.length) — the shared BitReader's
    // throw-on-exhaustion can't fire.
    val r = new BitReader(p, sideOff)
    def take(n: Int): Int = r.bits(n).toInt
    val mdb = take(if (mpeg1) 9 else 8)
    take(if (mpeg1) { if (mono) 5 else 3 } else { if (mono) 1 else 2 })
    if (mpeg1) { var c = 0; while (c < nch) { take(4); c += 1 } } // scfsi
    val granules = if (mpeg1) 2 else 1
    var part23 = 0L
    var short = 0
    var g = 0
    while (g < granules) {
      var c = 0
      while (c < nch) {
        val p23 = take(12)
        val bigv = take(9)
        take(8) // global_gain
        take(if (mpeg1) 4 else 9) // scalefac_compress
        val wsf = take(1)
        if (wsf == 1) {
          val bt = take(2)
          take(1) // mixed_block_flag
          take(5); take(5) // table_select ×2
          take(3); take(3); take(3) // subblock_gain ×3
          if (bt == 0) return None // reserved under switching
          if (bt == 2) short += 1
        } else {
          take(5); take(5); take(5) // table_select ×3
          take(4) // region0_count
          take(3) // region1_count
        }
        if (mpeg1) take(1) // preflag (implicit under LSF)
        take(1) // scalefac_scale
        take(1) // count1table_select
        if (bigv > 288) return None
        part23 += p23
        c += 1
      }
      g += 1
    }
    Some(SideInfoFrame(mdb, granules * nch, part23, short, mainBytes))
  }

  /** Full-stream Layer III side-info census: walks every frame (the
    * `decodeMp3` stepping), parses each frame's side info, and checks
    * the BIT-RESERVOIR DISCIPLINE — frame i's `main_data_begin` must
    * not reach back past the main-data bytes its predecessors actually
    * carried (the structural invariant a splice/truncation corruption
    * breaks first). Returns (frames, granule_channels, Σpart2_3_length,
    * max main_data_begin, short-block count, reservoir_ok); None if the
    * payload is not MPEG audio at all; all -1s if it claims MPEG (ID3
    * or valid sync) but violates the layout.
    */
  /** EXIF (TIFF IFD) metadata parse for JPEG payloads — pure byte
    * structure, both endiannesses: find the APP1 "Exif\0\0" segment in
    * the JPEG marker walk, validate the TIFF header (II/MM + 42), walk
    * IFD0's 12-byte entries for Orientation (0x0112), Make (0x010F,
    * inline or offset-stored ASCII) and the Exif sub-IFD pointer
    * (0x8769), then the sub-IFD for PixelXDimension/PixelYDimension
    * (0xA002/3, SHORT or LONG). This is the metadata an image-curation
    * pass actually routes on (orientation-aware perceptual hashing,
    * camera-source stratification) and it needs NO entropy decode.
    * Returns None when the payload is not JPEG or carries no Exif APP1;
    * a positively-claimed Exif block with structural violations
    * (truncated IFD, entry offsets past the segment) quarantines to
    * (-1, null, -1, -1). Every offset is bounds-checked against the
    * SEGMENT, not the payload — Exif offsets are TIFF-relative and
    * untrusted.
    */
  private[graft] def parseExif(
      p: Array[Byte]): Option[(Int, String, Int, Int)] = {
    def u8(o: Int) = p(o) & 0xFF
    if (p.length < 4 || u8(0) != 0xFF || u8(1) != 0xD8) return None
    // JPEG marker walk to APP1/Exif (same stepping as decodeHeader)
    var o = 2
    var seg = -1
    var segLen = 0
    var done = false
    while (!done && o + 3 < p.length) {
      if (u8(o) != 0xFF) done = true
      else {
        val m = u8(o + 1)
        if (m == 0xFF) o += 1
        else if (m == 0x01 || (m >= 0xD0 && m <= 0xD8)) o += 2
        else if (m == 0xD9 || m == 0xDA) done = true
        else {
          val len = (u8(o + 2) << 8) | u8(o + 3)
          if (len < 2 || o + 2 + len > p.length) done = true
          else if (m == 0xE1 && len >= 10 &&
            p(o + 4) == 'E' && p(o + 5) == 'x' && p(o + 6) == 'i' &&
            p(o + 7) == 'f' && p(o + 8) == 0 && p(o + 9) == 0) {
            seg = o + 10 // TIFF header offset
            segLen = len - 8 // TIFF-addressable bytes
            done = true
          } else o += 2 + len
        }
      }
    }
    if (seg < 0) return None
    val corrupt = Some((-1, null: String, -1, -1))
    // TIFF header: byte order, magic 42, IFD0 offset (TIFF-relative)
    if (segLen < 8) return corrupt
    val le =
      if (p(seg) == 'I' && p(seg + 1) == 'I') true
      else if (p(seg) == 'M' && p(seg + 1) == 'M') false
      else return corrupt
    def u16(off: Int): Int = {
      if (off < 0 || off + 2 > segLen) return -1
      if (le) u8(seg + off) | (u8(seg + off + 1) << 8)
      else (u8(seg + off) << 8) | u8(seg + off + 1)
    }
    def u32(off: Int): Long = {
      if (off < 0 || off + 4 > segLen) return -1L
      if (le) u8(seg + off).toLong | (u8(seg + off + 1).toLong << 8) |
        (u8(seg + off + 2).toLong << 16) | (u8(seg + off + 3).toLong << 24)
      else (u8(seg + off).toLong << 24) | (u8(seg + off + 1).toLong << 16) |
        (u8(seg + off + 2).toLong << 8) | u8(seg + off + 3).toLong
    }
    if (u16(2) != 42) return corrupt
    // one IFD walk: returns the wanted tag values found in it
    final case class Entry(tag: Int, typ: Int, count: Long, valOff: Int)
    def ifdEntries(ifdOff: Long): Option[IndexedSeq[Entry]] = {
      if (ifdOff < 0 || ifdOff + 2 > segLen) return None
      val n = u16(ifdOff.toInt)
      if (n < 0 || ifdOff + 2 + 12L * n > segLen) return None
      Some((0 until n).map { i =>
        val e = ifdOff.toInt + 2 + 12 * i
        Entry(u16(e), u16(e + 2), u32(e + 4), e + 8)
      })
    }
    ifdEntries(u32(4)) match {
      case None => corrupt
      case Some(ifd0) =>
        var orient = 0
        var make: String = null
        var exifPtr = -1L
        ifd0.foreach { e =>
          val vOff = e.valOff // TIFF-relative offset of the value field
          e.tag match {
            case 0x0112 if e.typ == 3 => orient = u16(vOff)
            case 0x010F if e.typ == 2 && e.count > 0 =>
              // ASCII: ≤4 bytes inline, else offset-stored
              val off = if (e.count <= 4) vOff else u32(vOff)
              if (off >= 0 && off + e.count <= segLen) {
                val raw = new Array[Byte](e.count.toInt)
                System.arraycopy(p, seg + off.toInt, raw, 0, e.count.toInt)
                val z = raw.indexOf(0.toByte)
                make = new String(raw, 0, if (z < 0) raw.length else z, "US-ASCII")
              }
            case 0x8769 if e.typ == 4 => exifPtr = u32(vOff)
            case _ => ()
          }
        }
        var px = -1
        var py = -1
        if (exifPtr >= 0) ifdEntries(exifPtr) match {
          case None => return corrupt
          case Some(sub) => sub.foreach { e =>
            val vOff = e.valOff
            e.tag match {
              case 0xA002 =>
                px = (if (e.typ == 3) u16(vOff).toLong else u32(vOff)).toInt
              case 0xA003 =>
                py = (if (e.typ == 3) u16(vOff).toLong else u32(vOff)).toInt
              case _ => ()
            }
          }
        }
        if (orient < 0 || orient > 8) corrupt
        else Some((orient, make, px, py))
    }
  }

  final case class ExifMeta(asset_id: Long, has_exif: Boolean,
      orientation: Int, make: String, pixel_x: Int, pixel_y: Int)

  /** Per-image EXIF census over the asset table: real APP1/TIFF walks
    * for JPEG payloads, the deterministic pseudo path for everything
    * else (the fixture's text payloads — oracle-recomputable). The
    * quarantine convention matches the other decoders: a positive Exif
    * claim with a broken layout yields -1 markers, never an exception
    * mid-scan.
    */
  def extractExif(assets: Dataset[Asset]): Dataset[ExifMeta] = {
    import assets.sparkSession.implicits._
    assets.filter(_.kind == "image").mapPartitions { it =>
      it.map { a =>
        parseExif(a.payload) match {
          case Some((o, mk, x, y)) =>
            ExifMeta(a.asset_id, has_exif = true, o, mk, x, y)
          case None =>
            ExifMeta(a.asset_id, has_exif = false,
              (a.payload.length % 8 + 1).toInt, null,
              -1, -1)
        }
      }
    }
  }

  def exifMeta(spark: SparkSession, dir: String): DataFrame =
    extractExif(assets(spark, dir)).toDF()

  val exifMetaSql: String =
    """SELECT doc_id AS asset_id, false AS has_exif,
      |       CAST(octet_length(encode(text)) % 8 + 1 AS INT) AS orientation,
      |       CAST(NULL AS VARCHAR) AS make,
      |       CAST(-1 AS INT) AS pixel_x, CAST(-1 AS INT) AS pixel_y
      |FROM documents WHERE doc_id % 3 = 0""".stripMargin

  private[graft] def parseMp3SideInfo(
      p: Array[Byte]): Option[(Long, Long, Long, Int, Long, Boolean)] = {
    def u8(o: Int) = p(o) & 0xFF
    val corrupt = Some((-1L, -1L, -1L, -1, -1L, false))
    // tightened claim (parseId3Tags parity): the version byte must be
    // a KNOWN ID3v2 major (2/3/4), so text that merely starts with the
    // string "ID3 " never claims (version byte 0x20) — a spurious
    // claim here would quarantine as corrupt MPEG while the oracle
    // emits the unconditional pseudo row
    val hasId3 = p.length >= 10 && p(0) == 'I' && p(1) == 'D' && p(2) == '3' &&
      (u8(3) == 2 || u8(3) == 3 || u8(3) == 4) && u8(4) != 0xFF &&
      u8(6) < 0x80 && u8(7) < 0x80 && u8(8) < 0x80 && u8(9) < 0x80
    val start =
      if (hasId3)
        10 + ((u8(6) << 21) | (u8(7) << 14) | (u8(8) << 7) | u8(9))
      else 0
    def header(o: Int): Option[(Boolean, Boolean, Boolean, Int)] = {
      if (o + 4 > p.length || u8(o) != 0xFF || (u8(o + 1) & 0xE0) != 0xE0)
        return None
      val ver = (u8(o + 1) >>> 3) & 0x3
      val layer = (u8(o + 1) >>> 1) & 0x3
      val crc = (u8(o + 1) & 1) == 0
      val brIdx = (u8(o + 2) >>> 4) & 0xF
      val srIdx = (u8(o + 2) >>> 2) & 0x3
      val pad = (u8(o + 2) >>> 1) & 0x1
      if (ver == 1 || layer != 1 || brIdx == 0 || brIdx == 15 || srIdx == 3)
        return None
      val mpeg1 = ver == 3
      val sr = (if (ver == 3) Mp3RatesV1 else if (ver == 2) Mp3RatesV2
        else Mp3RatesV25)(srIdx)
      val kbps = (if (ver == 3) Mp3BitrateV1 else Mp3BitrateV2)(brIdx)
      val spf = if (mpeg1) 1152 else 576
      val len = (spf / 8) * kbps * 1000 / sr + pad
      val mono = ((u8(o + 3) >>> 6) & 0x3) == 3
      Some((mpeg1, mono, crc, len))
    }
    header(start) match {
      case None => if (hasId3) corrupt else None
      case Some(_) =>
        var off = start
        var frames = 0L
        var gch = 0L
        var bits = 0L
        var maxMdb = 0
        var short = 0L
        var reservoir = 0L // main-data bytes carried by PRIOR frames
        var reservoirOk = true
        var ok = true
        var bad = false
        while (ok && !bad) header(off) match {
          case Some((mpeg1, mono, crc, len)) if len > 4 =>
            parseSideInfoFrame(p, off, mpeg1, mono, crc, len) match {
              case Some(si) =>
                frames += 1
                gch += si.granuleChannels
                bits += si.part23Bits
                if (si.mainDataBegin > maxMdb) maxMdb = si.mainDataBegin
                short += si.shortBlocks
                if (si.mainDataBegin > reservoir) reservoirOk = false
                // the spec caps the reachable reservoir at 511 bytes
                reservoir = math.min(511L, reservoir + si.mainDataBytes)
                off += len
              case None => bad = true
            }
          case _ => ok = false
        }
        if (bad || frames == 0) corrupt
        else Some((frames, gch, bits, maxMdb, short, reservoirOk))
    }
  }

  /** ID3v2.3/2.4 tag parse — the audio-side metadata walk (the EXIF
    * twin): header version + syncsafe size, then the frame walk (4-char
    * IDs; v2.3 plain big-endian frame sizes, v2.4 syncsafe), pulling
    * the text frames a music/speech curation pass routes on — TIT2
    * (title) and TPE1 (artist) — in all three text encodings (latin-1,
    * UTF-16 with BOM, UTF-8). Padding (a zero where a frame ID would
    * start) ends the walk. Returns None when the payload carries no
    * ID3v2 preamble; a positive claim with an unsupported layout
    * (v2.2's 3-char frames, the unsynchronisation flag, a frame
    * running past the tag) quarantines to (-1, version, nulls).
    */
  private[graft] def parseId3Tags(
      p: Array[Byte]): Option[(Int, Long, String, String)] = {
    def u8(o: Int) = p(o) & 0xFF
    // the claim requires a KNOWN major version (2/3/4) and a sane
    // revision byte, not just the 'ID3' magic — plain text that happens
    // to start with the string "ID3 " must fall through to None (its
    // version byte would be 0x20), or the oracle's unconditional
    // pseudo row diverges from a spurious corrupt-tag claim
    if (!(p.length >= 10 && p(0) == 'I' && p(1) == 'D' && p(2) == '3' &&
      (u8(3) == 2 || u8(3) == 3 || u8(3) == 4) && u8(4) != 0xFF &&
      u8(6) < 0x80 && u8(7) < 0x80 && u8(8) < 0x80 &&
      u8(9) < 0x80)) return None
    val ver = u8(3)
    val corrupt = Some((ver, -1L, null: String, null: String))
    val size = (u8(6) << 21) | (u8(7) << 14) | (u8(8) << 7) | u8(9)
    val end = math.min(10 + size, p.length)
    if (ver != 3 && ver != 4) return corrupt
    if ((u8(5) & 0x80) != 0) return corrupt // unsynchronised tag
    var o = 10
    if ((u8(5) & 0x40) != 0) { // extended header: skip by declared size
      if (o + 4 > end) return corrupt
      val ehSize =
        if (ver == 4) (u8(o) << 21) | (u8(o + 1) << 14) | (u8(o + 2) << 7) | u8(o + 3)
        else ((u8(o) << 24) | (u8(o + 1) << 16) | (u8(o + 2) << 8) | u8(o + 3)) + 4
      if (ehSize < 4 || o + ehSize > end) return corrupt
      o += ehSize
    }
    var frames = 0L
    var title: String = null
    var artist: String = null
    def decodeText(from: Int, len: Int): String = {
      if (len <= 0) return ""
      val enc = u8(from)
      val body = java.util.Arrays.copyOfRange(p, from + 1, from + len)
      val s = enc match {
        case 0 => new String(body, "ISO-8859-1")
        case 1 => new String(body, "UTF-16") // BOM-directed
        case 2 => new String(body, "UTF-16BE")
        case 3 => new String(body, "UTF-8")
        case _ => null
      }
      if (s == null) null
      else { val z = s.indexOf('\u0000'); if (z < 0) s else s.substring(0, z) }
    }
    while (o + 10 <= end && p(o) != 0) {
      val idOk = (o until o + 4).forall { i =>
        val c = p(i).toChar; (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')
      }
      if (!idOk) return corrupt
      val fid = new String(p, o, 4, "US-ASCII")
      val fsize =
        if (ver == 4) {
          if ((u8(o + 4) | u8(o + 5) | u8(o + 6) | u8(o + 7)) >= 0x80)
            return corrupt // v2.4 frame sizes are syncsafe
          (u8(o + 4) << 21) | (u8(o + 5) << 14) | (u8(o + 6) << 7) | u8(o + 7)
        } else
          (u8(o + 4) << 24) | (u8(o + 5) << 16) | (u8(o + 6) << 8) | u8(o + 7)
      if (fsize < 0 || o + 10 + fsize > end) return corrupt
      frames += 1
      fid match {
        case "TIT2" => title = decodeText(o + 10, fsize)
        case "TPE1" => artist = decodeText(o + 10, fsize)
        case _ => ()
      }
      o += 10 + fsize
    }
    Some((ver, frames, title, artist))
  }

  final case class Id3Tags(asset_id: Long, has_id3: Boolean, version: Int,
      n_frames: Long, title: String, artist: String)

  def extractId3(assets: Dataset[Asset]): Dataset[Id3Tags] = {
    import assets.sparkSession.implicits._
    assets.filter(_.kind == "audio").mapPartitions { it =>
      it.map { a =>
        parseId3Tags(a.payload) match {
          case Some((v, f, t, ar)) =>
            Id3Tags(a.asset_id, has_id3 = true, v, f, t, ar)
          case None =>
            Id3Tags(a.asset_id, has_id3 = false, -1, -1L, null, null)
        }
      }
    }
  }

  def id3Tags(spark: SparkSession, dir: String): DataFrame =
    extractId3(assets(spark, dir)).toDF()

  val id3TagsSql: String =
    """SELECT doc_id AS asset_id, false AS has_id3,
      |       CAST(-1 AS INT) AS version, CAST(-1 AS BIGINT) AS n_frames,
      |       CAST(NULL AS VARCHAR) AS title, CAST(NULL AS VARCHAR) AS artist
      |FROM documents WHERE doc_id % 3 = 1""".stripMargin

  final case class Mp3SideInfo(asset_id: Long, decoded: Boolean,
      n_frames: Long, n_granule_channels: Long, sum_part23_bits: Long,
      max_main_data_begin: Int, n_short_blocks: Long, reservoir_ok: Boolean)

  /** MPEG Layer III side-info census per audio asset — the half of the
    * Layer III structure that is PURE bit layout (ISO 11172-3 §2.4.1.7
    * + the 13818-3 LSF variant): main_data_begin, per-granule
    * part2_3_length / big_values / window switching / block types, and
    * the bit-reservoir consistency law across frames. This narrows the
    * audio seam to exactly the entropy/DSP layer: full PCM synthesis
    * needs the Annex-B TABULATED data (34 Huffman code tables and the
    * 512-tap synthesis window), which is not present in this
    * environment and cannot be re-derived from first principles —
    * shipping invented tables would fake fidelity, so the sample stage
    * stays a declared stub while everything structurally checkable is
    * checked for real (and golden-pinned in EdgeCaseSpec on
    * hand-packed spec-valid frames).
    *
    * Fixture payloads (UTF-8 text) are not MPEG audio and take the
    * deterministic md5 pseudo path the oracle recomputes — the
    * `multimodal_samples` convention.
    */
  def extractMp3SideInfo(assets: Dataset[Asset]): Dataset[Mp3SideInfo] = {
    import assets.sparkSession.implicits._
    assets.filter(_.kind == "audio").mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { a =>
        parseMp3SideInfo(a.payload) match {
          case Some((f, g, b, mdb, s, resOk)) =>
            Mp3SideInfo(a.asset_id, decoded = f > 0, f, g, b, mdb, s, resOk)
          case None =>
            md.reset()
            val hex = md.digest(a.payload).map("%02x".format(_)).mkString
            val n = a.payload.length.toLong
            Mp3SideInfo(a.asset_id, decoded = false,
              n / 418L, 2L * (n / 418L),
              java.lang.Long.parseLong(hex.take(4), 16) % 4096L,
              (java.lang.Long.parseLong(hex.slice(4, 8), 16) % 512L).toInt,
              n % 3L, reservoir_ok = true)
        }
      }
    }
  }

  def mp3SideInfo(spark: SparkSession, dir: String): DataFrame =
    extractMp3SideInfo(assets(spark, dir)).toDF()

  val mp3SideInfoSql: String =
    """SELECT doc_id AS asset_id, false AS decoded,
      |       CAST(octet_length(encode(text)) // 418 AS BIGINT) AS n_frames,
      |       CAST(2 * (octet_length(encode(text)) // 418) AS BIGINT)
      |         AS n_granule_channels,
      |       CAST(CAST(concat('0x', substr(md5(text), 1, 4)) AS UBIGINT)
      |              % 4096 AS BIGINT) AS sum_part23_bits,
      |       CAST(CAST(concat('0x', substr(md5(text), 5, 4)) AS UBIGINT)
      |              % 512 AS INT) AS max_main_data_begin,
      |       CAST(octet_length(encode(text)) % 3 AS BIGINT) AS n_short_blocks,
      |       true AS reservoir_ok
      |FROM documents WHERE doc_id % 3 = 1""".stripMargin

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

  final case class SampleStats(asset_id: Long, decoded: Boolean,
      n_samples: Long, peak: Int, rms: Double, zero_crossings: Long)

  /** REAL PCM sample decode for RIFF/WAVE payloads — the sample half
    * of the audio seam, pure byte math (16-bit LE PCM is just signed
    * shorts): per payload the frame count, peak magnitude, RMS (sum of
    * squares as exact Long — 32767² per sample keeps ~10⁹ samples
    * under BIGINT — one sqrt at the boundary), and channel-0 zero
    * crossings (the cheap pitch/noisiness proxy). Only format-1
    * 16-bit PCM decodes; other encodings and non-RIFF payloads fall
    * to md5 pseudo-stats the oracle recomputes (the `decodePixels`
    * convention). Remaining codec seam: MP3 sample decode (lossy DSP;
    * the table-free structural half is parsed for real by
    * `parseMp3SideInfo`) — FLAC decodes for real below.
    */
  private[graft] def decodeWavSamples(
      p: Array[Byte]): Option[(Long, Int, Double, Long)] = {
    def leInt(o: Int) = (p(o) & 255) | ((p(o + 1) & 255) << 8) |
      ((p(o + 2) & 255) << 16) | ((p(o + 3) & 255) << 24)
    def leShort(o: Int) = (p(o) & 255) | ((p(o + 1) & 255) << 8)
    def tag(o: Int, s: String) = p.length >= o + 4 &&
      p(o) == s(0) && p(o + 1) == s(1) && p(o + 2) == s(2) && p(o + 3) == s(3)
    if (!(tag(0, "RIFF") && tag(8, "WAVE"))) return None
    var off = 12
    var fmtCode = 0; var ch = 0; var bits = 0; var blockAlign = 0
    var spb = 0 // samples-per-block (fmt extension; block codecs only)
    var dataOff = -1; var dataLen = 0L
    while (off + 8 <= p.length && (fmtCode == 0 || dataOff < 0)) {
      val size = leInt(off + 4).toLong & 0xFFFFFFFFL
      if (tag(off, "fmt ") && size >= 16 && off + 24 <= p.length) {
        fmtCode = leShort(off + 8)
        ch = leShort(off + 10)
        blockAlign = leShort(off + 20)
        bits = leShort(off + 22)
        if (size >= 20 && off + 28 <= p.length) spb = leShort(off + 26)
      } else if (tag(off, "data")) { dataOff = off + 8; dataLen = size }
      val step = 8L + size + (size & 1)
      if (off + step > Int.MaxValue) return None else off += step.toInt
    }
    if (ch <= 0 || dataOff < 0) return None
    // shared stats accumulation: peak/sumSq over all channels, zero
    // crossings over channel 0 in sample order
    var peak = 0
    var sumSq = 0L
    var zc = 0L
    var prevSign = 0
    var n = 0L
    def add(s: Int, isCh0: Boolean): Unit = {
      val m = math.abs(s)
      if (m > peak) peak = m
      sumSq += s.toLong * s
      n += 1
      if (isCh0) {
        val sign = Integer.signum(s)
        if (sign != 0 && prevSign != 0 && sign != prevSign) zc += 1
        if (sign != 0) prevSign = sign
      }
    }
    def stats(): Option[(Long, Int, Double, Long)] =
      if (n <= 0) None
      else Some((n, peak,
        math.rint(math.sqrt(sumSq.toDouble / n) * 10000) / 10000, zc))
    val end = math.min(p.length.toLong, dataOff + dataLen).toInt
    fmtCode match {
      case 1 if bits == 16 && blockAlign == 2 * ch => // linear PCM
        val nFrames = (end - dataOff).toLong / blockAlign
        if (nFrames <= 0) return None
        var f = 0L
        while (f < nFrames) {
          val base = dataOff + (f * blockAlign).toInt
          var c = 0
          while (c < ch) {
            add(leShort(base + 2 * c).toShort.toInt, c == 0)
            c += 1
          }
          f += 1
        }
        stats()
      case 6 | 7 if bits == 8 && blockAlign == ch => // G.711 a-law / µ-law
        val nFrames = (end - dataOff).toLong / ch
        if (nFrames <= 0) return None
        var f = 0L
        while (f < nFrames) {
          val base = dataOff + (f * ch).toInt
          var c = 0
          while (c < ch) {
            val b = p(base + c) & 0xFF
            add(if (fmtCode == 6) alawDecode(b) else ulawDecode(b), c == 0)
            c += 1
          }
          f += 1
        }
        stats()
      case 17 if bits == 4 => // IMA ADPCM (block codec: refuse partials)
        if (blockAlign < 4 * ch + 4 || (blockAlign - 4 * ch) % (4 * ch) != 0)
          return None
        // the published layout fixes samples-per-block to the block
        // geometry: header sample + 2 nibbles per data byte per channel
        if (spb != (blockAlign - 4 * ch) * 2 / ch + 1) return None
        if (dataLen <= 0 || dataLen % blockAlign != 0 ||
          dataOff + dataLen > p.length) return None // truncated: refuse
        val nBlocks = (dataLen / blockAlign).toInt
        val pred = new Array[Int](ch)
        val idx = new Array[Int](ch)
        var b = 0
        while (b < nBlocks) {
          val bo = dataOff + b * blockAlign
          var c = 0
          while (c < ch) {
            pred(c) = leShort(bo + 4 * c).toShort.toInt
            idx(c) = p(bo + 4 * c + 2) & 0xFF
            if (idx(c) > 88 || p(bo + 4 * c + 3) != 0) return None
            add(pred(c), c == 0) // the header predictor IS sample 0
            c += 1
          }
          var pos = bo + 4 * ch
          while (pos < bo + blockAlign) {
            var c2 = 0
            while (c2 < ch) {
              var k = 0
              while (k < 4) {
                val byte = p(pos + 4 * c2 + k) & 0xFF
                add(imaStep(pred, idx, c2, byte & 0xF), c2 == 0)
                add(imaStep(pred, idx, c2, byte >> 4), c2 == 0)
                k += 1
              }
              c2 += 1
            }
            pos += 4 * ch
          }
          b += 1
        }
        stats()
      case _ => None
    }
  }

  /** G.711 a-law byte → 16-bit sample (ITU-T G.711 decode, public
    * reference implementation; MSB set = positive).
    */
  private[graft] def alawDecode(b: Int): Int = {
    val a = b ^ 0x55
    val seg = (a & 0x70) >> 4
    var t = ((a & 0x0F) << 4) + 8
    if (seg >= 1) t += 0x100
    if (seg > 1) t <<= seg - 1
    if ((b & 0x80) != 0) t else -t
  }

  /** G.711 µ-law byte → 16-bit sample (ITU-T G.711 decode, public
    * reference implementation; stored inverted, bias 0x84).
    */
  private[graft] def ulawDecode(b: Int): Int = {
    val u = ~b & 0xFF
    val t = (((u & 0x0F) << 3) + 0x84) << ((u & 0x70) >> 4)
    if ((u & 0x80) != 0) 0x84 - t else t - 0x84
  }

  /** The published IMA/DVI ADPCM step-size and index-adjust tables. */
  private val ImaStepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)
  private val ImaIndexTable: Array[Int] = Array(-1, -1, -1, -1, 2, 4, 6, 8)

  /** One IMA ADPCM nibble through channel `c`'s (predictor, step-index)
    * state; returns the decoded sample.
    */
  private def imaStep(pred: Array[Int], idx: Array[Int], c: Int,
      nib: Int): Int = {
    val step = ImaStepTable(idx(c))
    var diff = step >> 3
    if ((nib & 1) != 0) diff += step >> 2
    if ((nib & 2) != 0) diff += step >> 1
    if ((nib & 4) != 0) diff += step
    if ((nib & 8) != 0) diff = -diff
    pred(c) = math.max(-32768, math.min(32767, pred(c) + diff))
    idx(c) = math.max(0, math.min(88, idx(c) + ImaIndexTable(nib & 7)))
    pred(c)
  }

  /** MSB-first bit reader over a byte array — the FLAC bitstream unit.
    * Throws on exhaustion; `decodeFlacSamples` catches and refuses.
    */
  private final class BitReader(p: Array[Byte], var bytePos: Int) {
    private var bitPos = 0
    def bit(): Int = {
      if (bytePos >= p.length) throw new IndexOutOfBoundsException
      val b = (p(bytePos) >> (7 - bitPos)) & 1
      bitPos += 1
      if (bitPos == 8) { bitPos = 0; bytePos += 1 }
      b
    }
    def bits(n: Int): Long = {
      var v = 0L; var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def sbits(n: Int): Long = { // two's-complement signed
      val v = bits(n)
      if (n > 0 && (v & (1L << (n - 1))) != 0) v - (1L << n) else v
    }
    def unary(): Int = {
      var q = 0
      while (bit() == 0) q += 1
      q
    }
    def align(): Unit = if (bitPos != 0) { bitPos = 0; bytePos += 1 }
    def atEnd: Boolean = bytePos >= p.length
  }

  /** REAL FLAC sample decode — the lossless half of the compressed-audio
    * seam, a pure-JVM bitstream parse of the published format (RFC
    * 9639): STREAMINFO, frame headers (UTF-8 frame numbers, explicit and
    * coded block sizes, CRC bytes), ALL four subframe types — CONSTANT,
    * VERBATIM, FIXED orders 0–4, and LPC orders 1–32 (quantized
    * coefficients, signed shift) — with Rice-coded residuals (both 4-
    * and 5-bit parameter widths, escape partitions, wasted bits), plus
    * the three stereo-decorrelation channel modes (left/side,
    * side/right, mid/side with parity re-expansion, the side channel's
    * extra bit included). Reserved subframe types, reserved channel
    * assignments, and malformed streams refuse (None → the pseudo
    * path) — nothing is faked. Stats mirror the PCM path so WAV and
    * FLAC land in one schema.
    */
  private[graft] def decodeFlacSamples(
      p: Array[Byte]): Option[(Long, Int, Double, Long)] = {
    if (!(p.length >= 42 && p(0) == 'f' && p(1) == 'L' && p(2) == 'a' &&
      p(3) == 'C')) return None
    try {
      // metadata walk to the first frame + STREAMINFO fields
      var off = 4
      var last = false
      var bitsPerSample = 0
      var nCh = 0
      while (!last) {
        val hdr = p(off) & 0xFF
        last = (hdr & 0x80) != 0
        val typ = hdr & 0x7F
        val len = ((p(off + 1) & 0xFF) << 16) | ((p(off + 2) & 0xFF) << 8) |
          (p(off + 3) & 0xFF)
        if (typ == 0) { // STREAMINFO: 20b rate, 3b ch-1, 5b bits-1 at bit 80
          val r = new BitReader(p, off + 4 + 10)
          r.bits(20)
          nCh = r.bits(3).toInt + 1
          bitsPerSample = r.bits(5).toInt + 1
        }
        off += 4 + len
      }
      if (bitsPerSample == 0 || nCh == 0) return None
      var peak = 0
      var sumSq = 0L
      var zc = 0L
      var prevSign = 0
      var total = 0L
      val r = new BitReader(p, off)
      while (!r.atEnd) {
        // frame header: 14-bit sync, reserved, blocking strategy
        if (r.bits(14) != 0x3FFE) return None
        r.bits(2)
        val bsCode = r.bits(4).toInt
        val srCode = r.bits(4).toInt
        val chAsgn = r.bits(4).toInt
        val ssCode = r.bits(3).toInt
        r.bit()
        // UTF-8 coded frame/sample number: lead byte sets the length
        val lead = r.bits(8).toInt
        var follow = 0
        var mask = 0x80
        while ((lead & mask) != 0) { follow += 1; mask >>= 1 }
        if (follow > 0) follow -= 1 // 0b10... continuation count
        (0 until follow).foreach(_ => r.bits(8))
        val blockSize = bsCode match {
          case 1               => 192
          case c if c >= 2 && c <= 5 => 576 << (c - 2)
          case 6               => r.bits(8).toInt + 1
          case 7               => r.bits(16).toInt + 1
          case c if c >= 8     => 256 << (c - 8)
          case _               => return None
        }
        srCode match {
          case 12 => r.bits(8)
          case 13 | 14 => r.bits(16)
          case 15 => return None // invalid per RFC 9639 §9.1.2 — refuse
          case _ => ()
        }
        val bps = ssCode match {
          case 0 => bitsPerSample
          case 1 => 8
          case 2 => 12
          case 4 => 16
          case 5 => 20
          case 6 => 24
          case _ => return None
        }
        if (chAsgn > 10) return None // 11-15: reserved
        val frameCh = if (chAsgn >= 8) 2 else chAsgn + 1
        if (frameCh != nCh) return None
        r.bits(8) // header CRC-8 (spec-valid fixtures carry the real one)
        // refusal inside the subframe decoder rides the same exception
        // the bit reader throws on exhaustion — every path lands on None
        def refuse(): Nothing = throw new IndexOutOfBoundsException
        def riceResiduals(samples: Array[Long], order: Int): Unit = {
          val method = r.bits(2).toInt
          if (method > 1) refuse()
          val pBits = if (method == 0) 4 else 5
          val escape = (1 << pBits) - 1
          val po = r.bits(4).toInt
          val parts = 1 << po
          if (blockSize % parts != 0) refuse()
          var pi = 0
          var si = order
          while (pi < parts) {
            val param = r.bits(pBits).toInt
            val nRes = (blockSize >> po) - (if (pi == 0) order else 0)
            // RFC 9639 §9.2.7: an escaped partition stores the raw
            // bit-width ONCE (5 bits) right after the escape code, then
            // all residuals follow at that width — not width-per-residual.
            val rawBits = if (param == escape) r.bits(5).toInt else -1
            var k = 0
            while (k < nRes) {
              val v =
                if (param == escape) {
                  if (rawBits == 0) 0L else r.sbits(rawBits)
                } else {
                  val q = r.unary().toLong
                  val u = (q << param) | r.bits(param)
                  (u >> 1) ^ -(u & 1) // zigzag
                }
              samples(si) = v
              si += 1; k += 1
            }
            pi += 1
          }
        }
        def decodeSubframe(chBps: Int): Array[Long] = {
          if (r.bit() != 0) refuse() // subframe zero pad
          val typ = r.bits(6).toInt
          var wasted = 0
          if (r.bit() == 1) { wasted = r.unary() + 1 }
          val eff = chBps - wasted
          val samples = new Array[Long](blockSize)
          typ match {
            case 0 => // CONSTANT
              val v = r.sbits(eff)
              java.util.Arrays.fill(samples, v)
            case 1 => // VERBATIM
              var i = 0
              while (i < blockSize) { samples(i) = r.sbits(eff); i += 1 }
            case t if t >= 8 && t <= 12 => // FIXED order 0-4
              val order = t - 8
              var i = 0
              while (i < order) { samples(i) = r.sbits(eff); i += 1 }
              riceResiduals(samples, order)
              // fixed polynomial reconstruction
              i = order
              while (i < blockSize) {
                samples(i) += (order match {
                  case 0 => 0L
                  case 1 => samples(i - 1)
                  case 2 => 2 * samples(i - 1) - samples(i - 2)
                  case 3 => 3 * samples(i - 1) - 3 * samples(i - 2) +
                    samples(i - 3)
                  case 4 => 4 * samples(i - 1) - 6 * samples(i - 2) +
                    4 * samples(i - 3) - samples(i - 4)
                })
                i += 1
              }
            case t if t >= 32 => // LPC order 1-32
              val order = (t & 31) + 1
              var i = 0
              while (i < order) { samples(i) = r.sbits(eff); i += 1 }
              val precision = r.bits(4).toInt + 1
              if (precision == 16) refuse() // 0b1111 is invalid per spec
              val shift = r.sbits(5).toInt
              if (shift < 0) refuse()
              val coefs = new Array[Long](order)
              i = 0
              while (i < order) { coefs(i) = r.sbits(precision); i += 1 }
              riceResiduals(samples, order)
              i = order
              while (i < blockSize) {
                var acc = 0L
                var j = 0
                while (j < order) { acc += coefs(j) * samples(i - 1 - j); j += 1 }
                samples(i) += (acc >> shift)
                i += 1
              }
            case _ => refuse() // 2-7, 16-31: reserved
          }
          if (wasted > 0) {
            var i = 0
            while (i < blockSize) { samples(i) <<= wasted; i += 1 }
          }
          samples
        }
        val chans = new Array[Array[Long]](frameCh)
        var c = 0
        while (c < frameCh) {
          // the SIDE channel of a decorrelated pair carries one extra bit
          val isSide = (chAsgn == 8 && c == 1) || (chAsgn == 9 && c == 0) ||
            (chAsgn == 10 && c == 1)
          chans(c) = decodeSubframe(bps + (if (isSide) 1 else 0))
          c += 1
        }
        // stereo decorrelation back to left/right (RFC 9639 §4.2.2)
        chAsgn match {
          case 8 => // left/side: right = left − side
            var i = 0
            while (i < blockSize) {
              chans(1)(i) = chans(0)(i) - chans(1)(i); i += 1
            }
          case 9 => // side/right: left = right + side
            var i = 0
            while (i < blockSize) {
              chans(0)(i) = chans(1)(i) + chans(0)(i); i += 1
            }
          case 10 => // mid/side: re-expand the halved mid with side parity
            var i = 0
            while (i < blockSize) {
              val m2 = (chans(0)(i) << 1) | (chans(1)(i) & 1L)
              chans(0)(i) = (m2 + chans(1)(i)) >> 1
              chans(1)(i) = (m2 - chans(1)(i)) >> 1
              i += 1
            }
          case _ => ()
        }
        c = 0
        while (c < frameCh) {
          val samples = chans(c)
          var i = 0
          while (i < blockSize) {
            val s = samples(i)
            val m = math.abs(s)
            if (m > peak.toLong) peak = m.toInt
            sumSq += s * s
            i += 1
          }
          c += 1
        }
        var i = 0
        while (i < blockSize) {
          val sign = java.lang.Long.signum(chans(0)(i))
          if (sign != 0 && prevSign != 0 && sign != prevSign) zc += 1
          if (sign != 0) prevSign = sign
          i += 1
        }
        total += blockSize.toLong * frameCh
        r.align()
        r.bits(16) // frame footer CRC-16
      }
      if (total <= 0) None
      else {
        val rms = math.rint(math.sqrt(sumSq.toDouble / total) * 10000) / 10000
        Some((total, peak, rms, zc))
      }
    } catch { case _: IndexOutOfBoundsException => None }
  }

  /** Sample pass over the audio assets: real decode where the WAV
    * container validates — linear PCM, G.711 a-law/µ-law, and IMA
    * ADPCM encodings — real bitstream decode where FLAC does, md5
    * pseudo-stats otherwise; strictly oracled on the text fixture,
    * golden-tested on synthesized PCM/G.711/ADPCM and spec-valid FLAC
    * (the ADPCM goldens bit-match an independently implemented
    * encoder). Remaining seam: MP3 sample synthesis (requires the ISO
    * Annex-B tabulated Huffman code tables and 512-tap synthesis
    * window, which are not derivable from first principles and not
    * present in this environment — the structural half IS parsed, see
    * `multimodal_mp3_sideinfo`) and inter-frame video codecs
    * (JNI-by-construction).
    */
  def extractSamples(assets: Dataset[Asset]): Dataset[SampleStats] = {
    import assets.sparkSession.implicits._
    assets.filter(_.kind == "audio").mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { a =>
        decodeWavSamples(a.payload).orElse(decodeFlacSamples(a.payload)) match {
          case Some((n, peak, rms, zc)) =>
            SampleStats(a.asset_id, decoded = true, n, peak, rms, zc)
          case None =>
            md.reset()
            val hex = md.digest(a.payload).map("%02x".format(_)).mkString
            SampleStats(a.asset_id, decoded = false, a.payload.length.toLong,
              java.lang.Long.parseLong(hex.take(4), 16).toInt % 32768,
              (java.lang.Long.parseLong(hex.slice(4, 8), 16) % 327680L) / 10.0,
              a.payload.length.toLong / 2)
        }
      }
    }
  }

  def samples(spark: SparkSession, dir: String): DataFrame =
    extractSamples(assets(spark, dir)).toDF()

  val samplesSql: String =
    """SELECT doc_id AS asset_id, false AS decoded,
      |       CAST(octet_length(encode(text)) AS BIGINT) AS n_samples,
      |       CAST(CAST(concat('0x', substr(md5(text), 1, 4)) AS UBIGINT)
      |              % 32768 AS INT) AS peak,
      |       (CAST(concat('0x', substr(md5(text), 5, 4)) AS UBIGINT)
      |          % 327680) / 10.0 AS rms,
      |       CAST(octet_length(encode(text)) // 2 AS BIGINT)
      |         AS zero_crossings
      |FROM documents WHERE doc_id % 3 = 1""".stripMargin

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
        decodeMp4Samples(a.payload) match {
          case Some(samples) if samples.nonEmpty =>
            // REAL seek-table sampling (r9): up to 4 evenly spaced
            // SAMPLES from the stbl walk — frame_offset is the
            // sample's true absolute byte position and the md5 covers
            // its leading bytes (clamped: a partial download's moov
            // may point past the truncated mdat). Codec decode of the
            // sample payload remains the seam.
            val k = math.min(4, samples.size)
            (0 until k).map { i =>
              val (off, sz) = samples(i * samples.size / k)
              val start = math.min(math.max(off, 0L), n.toLong).toInt
              val end = math.min(n.toLong,
                math.min(off + math.min(sz, 16), Int.MaxValue.toLong)).toInt
              md.reset()
              if (end > start) md.update(a.payload, start, end - start)
              Frame(a.asset_id, i, off,
                md.digest().map("%02x".format(_)).mkString)
            }
          case _ =>
            val k = math.min(4, 1 + n % 4)
            (0 until k).map { i =>
              val off = i.toLong * n / k
              md.reset()
              // pseudo path (the text fixture, oracled): hash the
              // 16-byte window at the evenly spaced offset
              val end = math.min(n, off.toInt + 16)
              md.update(a.payload, off.toInt, end - off.toInt)
              Frame(a.asset_id, i, off,
                md.digest().map("%02x".format(_)).mkString)
            }
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

  final case class VideoMeta(asset_id: Long, n_bytes: Long, width: Int,
      height: Int, duration_ms: Long, n_tracks: Int)

  /** Video metadata pass — the ISO-BMFF (MP4/MOV) twin of the image and
    * audio header parses: a pure-JVM box walk (size/type headers, 64-bit
    * and to-end sizes handled) into `moov`, reading `mvhd` for
    * timescale/duration (version 0 and 1 layouts) and each `trak`'s
    * `tkhd` for 16.16-fixed width/height, taking the largest track as
    * the presentation size. No sample data is touched — this is exactly
    * the metadata a frame sampler needs to build its seek table before
    * any codec runs; the codec itself stays the declared JNI seam.
    * Truncated/inconsistent boxes inside a positive `ftyp` match →
    * corrupt marker; unidentifiable payloads (the text fixture) →
    * deterministic pseudo-video the oracle recomputes.
    */
  def extractVideoMeta(assets: Dataset[Asset]): Dataset[VideoMeta] = {
    import assets.sparkSession.implicits._
    assets.filter(_.kind == "video").mapPartitions { it =>
      it.map { a =>
        val (w, h, dur, tracks) = decodeMp4(a.payload).getOrElse {
          val n = a.payload.length
          (16 + n % 640, 16 + n % 480, n.toLong, 1)
        }
        VideoMeta(a.asset_id, a.payload.length.toLong, w, h, dur, tracks)
      }
    }
  }

  private def bmffBeInt(p: Array[Byte], o: Int) =
    ((p(o) & 255) << 24) | ((p(o + 1) & 255) << 16) |
      ((p(o + 2) & 255) << 8) | (p(o + 3) & 255)
  private def bmffBeLong(p: Array[Byte], o: Int) =
    (bmffBeInt(p, o).toLong << 32) | (bmffBeInt(p, o + 4) & 0xFFFFFFFFL)
  private def bmffTag(p: Array[Byte], o: Int, s: String) =
    p.length >= o + 4 &&
      p(o) == s(0) && p(o + 1) == s(1) && p(o + 2) == s(2) && p(o + 3) == s(3)

  /** Walk boxes in [from, to); returns (payloadStart, payloadEnd) of
    * the first box with the wanted type, handling size==0 (to end) and
    * size==1 (64-bit largesize). Shared by the metadata walk and the
    * sample-table walk.
    */
  private def bmffFindBox(p: Array[Byte], from: Int, to: Int,
      want: String): Option[(Int, Int)] = {
    var off = from
    while (off + 8 <= to) {
      val size32 = bmffBeInt(p, off).toLong & 0xFFFFFFFFL
      val (bodyStart, boxEnd) =
        if (size32 == 0) (off + 8L, to.toLong)
        else if (size32 == 1) {
          if (off + 16 > to) return None
          (off + 16L, off + bmffBeLong(p, off + 8))
        } else (off + 8L, off + size32)
      if (boxEnd > to || bodyStart > boxEnd) return None
      if (bmffTag(p, off + 4, want)) return Some((bodyStart.toInt, boxEnd.toInt))
      off = boxEnd.toInt
    }
    None
  }

  /** ISO-BMFF walk. `None` = no `ftyp` leading box (not a BMFF file —
    * caller falls back); `Some(corrupt)` = claimed `ftyp` but the moov
    * walk failed. (width, height, duration_ms, n_tracks).
    */
  private[operators] def decodeMp4(p: Array[Byte]): Option[(Int, Int, Long, Int)] = {
    def beInt(o: Int) = bmffBeInt(p, o)
    def beLong(o: Int) = bmffBeLong(p, o)
    def tag(o: Int, s: String) = bmffTag(p, o, s)
    if (p.length < 12 || !tag(4, "ftyp")) return None
    val corrupt = Some((-1, -1, -1L, 0))
    def findBox(from: Int, to: Int, want: String): Option[(Int, Int)] =
      bmffFindBox(p, from, to, want)
    findBox(0, p.length, "moov") match {
      case None => corrupt
      case Some((moovS, moovE)) =>
        val dur = findBox(moovS, moovE, "mvhd") match {
          case Some((s, e)) if e - s >= 4 =>
            val ver = p(s) & 0xFF
            if (ver == 0 && e - s >= 20) {
              val scale = beInt(s + 12).toLong & 0xFFFFFFFFL
              val d = beInt(s + 16).toLong & 0xFFFFFFFFL
              if (scale > 0) d * 1000 / scale else -1L
            } else if (ver == 1 && e - s >= 32) {
              val scale = beInt(s + 20).toLong & 0xFFFFFFFFL
              val d = beLong(s + 24)
              if (scale > 0) d * 1000 / scale else -1L
            } else -1L
          case _ => -1L
        }
        // every trak's tkhd: width/height are 16.16 fixed at body offset
        // 76/80 (v0) or 88/92 (v1); presentation size = the largest track
        var w = 0; var h = 0; var tracks = 0
        var off = moovS
        var ok = true
        while (ok) findBox(off, moovE, "trak") match {
          case Some((ts, te)) =>
            tracks += 1
            findBox(ts, te, "tkhd").foreach { case (s, e) =>
              val base = if ((p(s) & 0xFF) == 1) s + 88 else s + 76
              if (base + 8 <= e) {
                val tw = beInt(base) >>> 16
                val th = beInt(base + 4) >>> 16
                if (tw.toLong * th > w.toLong * h) { w = tw; h = th }
              }
            }
            off = te
          case None => ok = false
        }
        if (dur < 0 && tracks == 0) corrupt
        else Some((w, h, dur, tracks))
    }
  }

  /** Sample-size cap: a table claiming more samples than this refuses
    * (decompression-bomb discipline — the seek table alone would be
    * gigabytes).
    */
  private val MaxBmffSamples = 100000

  /** REAL ISO-BMFF sample-table walk (the seek table a frame extractor
    * needs): first trak carrying a full `stbl` → per-sample absolute
    * (offset, size) from `stsz` (fixed or per-sample sizes) ×
    * `stco`/`co64` (chunk offsets) × `stsc` (samples-per-chunk runs) —
    * the published MP4 layout, no codec involved. Any count/length
    * inconsistency refuses (None); offsets are NOT validated against
    * payload length here — a partial download legitimately has a moov
    * whose mdat tail is missing, and the caller clamps reads.
    */
  private[graft] def decodeMp4Samples(
      p: Array[Byte]): Option[Vector[(Long, Int)]] = {
    if (p.length < 12 || !bmffTag(p, 4, "ftyp")) return None
    val moov = bmffFindBox(p, 0, p.length, "moov").getOrElse(return None)
    var off = moov._1
    while (off < moov._2) {
      val trak = bmffFindBox(p, off, moov._2, "trak").getOrElse(return None)
      val stbl = for {
        mdia <- bmffFindBox(p, trak._1, trak._2, "mdia")
        minf <- bmffFindBox(p, mdia._1, mdia._2, "minf")
        st <- bmffFindBox(p, minf._1, minf._2, "stbl")
      } yield st
      stbl.foreach { case (s, e) =>
        val out = for {
          (szS, szE) <- bmffFindBox(p, s, e, "stsz")
          (scS, scE) <- bmffFindBox(p, s, e, "stsc")
          co <- bmffFindBox(p, s, e, "stco")
            .map((_, 4)).orElse(bmffFindBox(p, s, e, "co64").map((_, 8)))
        } yield {
          val ((coS, coE), coW) = co
          if (szE - szS < 12 || scE - scS < 8 || coE - coS < 8) return None
          val fixedSize = bmffBeInt(p, szS + 4)
          val nSamples = bmffBeInt(p, szS + 8)
          if (nSamples <= 0 || nSamples > MaxBmffSamples) return None
          if (fixedSize == 0 && szE - szS < 12 + 4L * nSamples) return None
          def sampleSize(i: Int): Int =
            if (fixedSize != 0) fixedSize else bmffBeInt(p, szS + 12 + 4 * i)
          val nChunks = bmffBeInt(p, coS + 4)
          if (nChunks <= 0 || coE - coS < 8 + coW.toLong * nChunks)
            return None
          def chunkOffset(c: Int): Long =
            if (coW == 4) bmffBeInt(p, coS + 8 + 4 * c).toLong & 0xFFFFFFFFL
            else bmffBeLong(p, coS + 8 + 8 * c)
          val nRuns = bmffBeInt(p, scS + 4)
          if (nRuns <= 0 || scE - scS < 8 + 12L * nRuns) return None
          def run(i: Int): (Int, Int) =
            (bmffBeInt(p, scS + 8 + 12 * i), bmffBeInt(p, scS + 12 + 12 * i))
          val samples = Vector.newBuilder[(Long, Int)]
          var si = 0
          var c = 1
          var ri = 0
          while (c <= nChunks && si < nSamples) {
            while (ri + 1 < nRuns && run(ri + 1)._1 <= c) ri += 1
            val spc = run(ri)._2
            if (spc <= 0) return None
            var o = chunkOffset(c - 1)
            var j = 0
            while (j < spc && si < nSamples) {
              val sz = sampleSize(si)
              if (sz < 0) return None
              samples += ((o, sz))
              o += sz
              si += 1
              j += 1
            }
            c += 1
          }
          if (si < nSamples) return None // chunk table ran out early
          samples.result()
        }
        out.foreach(v => return Some(v))
      }
      off = trak._2
    }
    None
  }

  def videoMeta(spark: SparkSession, dir: String): DataFrame =
    extractVideoMeta(assets(spark, dir)).toDF()

  val videoMetaSql: String =
    """SELECT doc_id AS asset_id,
      |       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |       CAST(16 + octet_length(encode(text)) % 640 AS INT) AS width,
      |       CAST(16 + octet_length(encode(text)) % 480 AS INT) AS height,
      |       CAST(octet_length(encode(text)) AS BIGINT) AS duration_ms,
      |       CAST(1 AS INT) AS n_tracks
      |FROM documents WHERE doc_id % 3 = 2""".stripMargin

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

  // ------------------------------------------------ real pixel decode

  final case class PixelStats(asset_id: Long, decoded: Boolean,
      width: Int, height: Int, mean_luma: Double, ahash: String)

  /** Decompression-bomb guard: a decoded frame larger than this many
    * pixels is refused (quarantine-to-pseudo), the cap a real ingest
    * applies before allocating pixel buffers.
    */
  private val MaxPixels = 64000000L

  private def imageMagic(p: Array[Byte]): Boolean =
    (p.length >= 8 && p.take(8).sameElements(PngMagic)) ||
      (p.length >= 6 && p(0) == 'G' && p(1) == 'I' && p(2) == 'F' &&
        p(3) == '8') ||
      (p.length >= 2 && p(0) == 'B' && p(1) == 'M') ||
      (p.length >= 3 && (p(0) & 0xFF) == 0xFF && (p(1) & 0xFF) == 0xD8)

  private def luma(rgb: Int): Long = {
    val r = (rgb >> 16) & 0xFF; val g = (rgb >> 8) & 0xFF; val b = rgb & 0xFF
    (299L * r + 587L * g + 114L * b) / 1000L
  }

  /** REAL pixel decode — the JDK's own ImageIO readers (PNG, GIF, BMP,
    * JPEG ship with every JVM; no external dependency), closing the
    * pixel half of the media seam the header walk above stops at:
    * (width, height, mean integer luma over every pixel, and a 64-bit
    * AVERAGE HASH). The aHash is the classic perceptual fingerprint —
    * an 8×8 nearest-neighbor luma grid thresholded at its own mean,
    * row-major MSB-first — computed with INTEGER sampling arithmetic
    * (`((2i+1)·h) div 16`) so it is deterministic across JVMs for
    * lossless formats: the same pixels encoded as PNG and as BMP hash
    * identically, and a uniform brightness shift preserves the hash —
    * the properties image near-dup dedup stands on (GoldenImageSpec).
    * Only a payload whose magic matches attempts ImageIO; a failed or
    * bomb-sized decode falls to the deterministic md5 pseudo-stats the
    * oracle recomputes (the `decodeHeader` fixture convention). Codec
    * seam remaining: non-PCM audio and inter-frame video codecs (MJPEG
    * frames decode for real via `extractVideoPixels`).
    */
  private[graft] def decodePixels(
      p: Array[Byte]): Option[(Int, Int, Double, String)] =
    if (!imageMagic(p)) None
    else try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(p))
      if (img == null) None
      else {
        val (w, h) = (img.getWidth, img.getHeight)
        if (w <= 0 || h <= 0 || w.toLong * h > MaxPixels) None
        else {
          var sum = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { sum += luma(img.getRGB(x, y)); x += 1 }
            y += 1
          }
          val mean = math.rint(sum.toDouble / (w.toLong * h) * 10000) / 10000
          val ls = new Array[Long](64)
          var i = 0
          while (i < 8) {
            var j = 0
            while (j < 8) {
              val sy = ((2 * i + 1) * h) / 16
              val sx = ((2 * j + 1) * w) / 16
              ls(i * 8 + j) = luma(img.getRGB(sx, sy))
              j += 1
            }
            i += 1
          }
          val m = ls.sum / 64
          var bits = 0L
          ls.foreach(l => bits = (bits << 1) | (if (l > m) 1L else 0L))
          Some((w, h, mean, f"$bits%016x"))
        }
      }
    } catch { case _: Throwable => None }

  /** Pixel pass over the image assets: real ImageIO decode where the
    * magic matches, md5 pseudo-stats otherwise (recomputable → the op
    * stays strictly oracled on the text fixture while the real branch
    * is golden-tested on ImageIO-written bytes).
    */
  def extractPixels(assets: Dataset[Asset]): Dataset[PixelStats] = {
    import assets.sparkSession.implicits._
    assets.filter(_.kind == "image").mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { a =>
        decodePixels(a.payload) match {
          case Some((w, h, ml, ah)) =>
            PixelStats(a.asset_id, decoded = true, w, h, ml, ah)
          case None =>
            md.reset()
            val hex = md.digest(a.payload).map("%02x".format(_)).mkString
            PixelStats(a.asset_id, decoded = false,
              16 + (a.payload.length % 640), 16 + (a.payload.length % 480),
              (java.lang.Long.parseLong(hex.take(4), 16) % 2560L) / 10.0,
              hex.take(16))
        }
      }
    }
  }

  def pixels(spark: SparkSession, dir: String): DataFrame =
    extractPixels(assets(spark, dir)).toDF()

  final case class AnimStats(asset_id: Long, decoded: Boolean,
      n_frames: Int, duration_cs: Long, loop_count: Int)

  /** GIF animation walk — frame census without LZW decode: count image
    * descriptors (0x2C), sum Graphic Control Extension delays
    * (centiseconds), and read the NETSCAPE loop count (0 = forever,
    * -1 = not animated/absent). The block grammar is fully published
    * (GIF89a spec): extensions are label + length-prefixed sub-blocks,
    * image descriptors carry an optional local color table and LZW
    * sub-blocks — the walk validates every length against the payload
    * and refuses (None) on truncation or an unknown block type, the
    * corrupt-container convention of `decodeHeader`.
    */
  private[graft] def decodeGifAnim(
      p: Array[Byte]): Option[(Int, Long, Int)] = {
    if (!(p.length >= 13 && p(0) == 'G' && p(1) == 'I' && p(2) == 'F' &&
      p(3) == '8' && (p(4) == '7' || p(4) == '9') && p(5) == 'a'))
      return None
    var off = 13 // header(6) + logical screen descriptor(7)
    val packed = p(10) & 0xFF
    if ((packed & 0x80) != 0) off += 3 * (1 << ((packed & 7) + 1))
    var frames = 0
    var delay = 0L
    var loop = -1
    var done = false
    while (!done) {
      if (off >= p.length) return None // truncated: no trailer
      (p(off) & 0xFF) match {
        case 0x3B => done = true
        case 0x21 =>
          if (off + 2 > p.length) return None
          val label = p(off + 1) & 0xFF
          var o = off + 2
          var first = true
          var netscape = false
          while ({ if (o >= p.length) return None; (p(o) & 0xFF) != 0 }) {
            val len = p(o) & 0xFF
            if (o + 1 + len > p.length) return None
            if (label == 0xF9 && first && len >= 3)
              delay += ((p(o + 2) & 0xFF) | ((p(o + 3) & 0xFF) << 8)).toLong
            if (label == 0xFF && first && len >= 8)
              netscape = new String(p, o + 1, 8, "US-ASCII") == "NETSCAPE"
            if (label == 0xFF && !first && netscape && len >= 3 &&
              (p(o + 1) & 0xFF) == 1)
              loop = (p(o + 2) & 0xFF) | ((p(o + 3) & 0xFF) << 8)
            first = false
            o += 1 + len
          }
          off = o + 1
        case 0x2C =>
          if (off + 10 > p.length) return None
          val ip = p(off + 9) & 0xFF
          var o = off + 10
          if ((ip & 0x80) != 0) o += 3 * (1 << ((ip & 7) + 1))
          o += 1 // LZW minimum code size
          while ({ if (o >= p.length) return None; (p(o) & 0xFF) != 0 }) {
            val len = p(o) & 0xFF
            if (o + 1 + len > p.length) return None
            o += 1 + len
          }
          frames += 1
          off = o + 1
        case _ => return None // unknown block type: corrupt
      }
    }
    if (frames == 0) None else Some((frames, delay, loop))
  }

  /** Animation pass over the image assets: real GIF block walk where
    * the magic matches, md5 pseudo-stats otherwise — strictly oracled
    * on the text fixture, golden-tested on bytes the JDK's own
    * animated-GIF encoder produced.
    */
  def extractAnim(assets: Dataset[Asset]): Dataset[AnimStats] = {
    import assets.sparkSession.implicits._
    assets.filter(_.kind == "image").mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { a =>
        decodeGifAnim(a.payload) match {
          case Some((n, d, l)) =>
            AnimStats(a.asset_id, decoded = true, n, d, l)
          case None =>
            md.reset()
            val hex = md.digest(a.payload).map("%02x".format(_)).mkString
            AnimStats(a.asset_id, decoded = false,
              1 + (java.lang.Long.parseLong(hex.take(4), 16) % 4L).toInt,
              java.lang.Long.parseLong(hex.slice(4, 8), 16) % 1000L, -1)
        }
      }
    }
  }

  def anim(spark: SparkSession, dir: String): DataFrame =
    extractAnim(assets(spark, dir)).toDF()

  private val ThumbSide = 16

  final case class Thumb(asset_id: Long, decoded: Boolean, thumb_w: Int,
      thumb_h: Int, thumb_png: Array[Byte], thumb_md5: String)

  /** Deterministic box-filter resize to `side`×`side`: each output
    * pixel averages the exact source rectangle
    * [j·w div s, (j+1)·w div s) × [i·h div s, (i+1)·h div s) with
    * integer sums — no Graphics2D interpolation, whose rounding is
    * implementation-defined — so the same pixels resize to the same
    * bytes on every JVM. Returns the resized image and the md5 of its
    * raw row-major RGB byte stream (encoder-independent, unlike a
    * PNG-byte hash).
    */
  private[graft] def boxResize(img: java.awt.image.BufferedImage,
      side: Int): (java.awt.image.BufferedImage, String) = {
    val (w, h) = (img.getWidth, img.getHeight)
    val out = new java.awt.image.BufferedImage(side, side,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val raw = new Array[Byte](side * side * 3)
    var i = 0
    while (i < side) {
      val y0 = i * h / side
      val y1 = math.max(y0 + 1, (i + 1) * h / side)
      var j = 0
      while (j < side) {
        val x0 = j * w / side
        val x1 = math.max(x0 + 1, (j + 1) * w / side)
        var (sr, sg, sb) = (0L, 0L, 0L)
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val rgb = img.getRGB(x, y)
            sr += (rgb >> 16) & 0xFF; sg += (rgb >> 8) & 0xFF
            sb += rgb & 0xFF
            x += 1
          }
          y += 1
        }
        val n = (y1 - y0).toLong * (x1 - x0)
        val (r, g, b) = ((sr / n).toInt, (sg / n).toInt, (sb / n).toInt)
        out.setRGB(j, i, (r << 16) | (g << 8) | b)
        val base = (i * side + j) * 3
        raw(base) = r.toByte; raw(base + 1) = g.toByte; raw(base + 2) = b.toByte
        j += 1
      }
      i += 1
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    (out, md.digest(raw).map("%02x".format(_)).mkString)
  }

  /** Thumbnail pass — the brief's image RESIZE step made real: decode
    * (ImageIO, magic-gated as in `decodePixels`), box-filter to
    * `ThumbSide`², re-encode as PNG bytes for downstream consumers,
    * and fingerprint the raw resized pixels. Undecodable payloads get
    * empty bytes + the md5 pseudo fingerprint the oracle recomputes.
    */
  def thumbnails(assets: Dataset[Asset]): Dataset[Thumb] = {
    import assets.sparkSession.implicits._
    assets.filter(_.kind == "image").mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { a =>
        val dec =
          if (!imageMagic(a.payload)) None
          else try {
            Option(javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(a.payload)))
              .filter(i => i.getWidth > 0 && i.getHeight > 0 &&
                i.getWidth.toLong * i.getHeight <= MaxPixels)
          } catch { case _: Throwable => None }
        dec match {
          case Some(img) =>
            val (thumb, rawMd5) = boxResize(img, ThumbSide)
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(thumb, "png", bos)
            Thumb(a.asset_id, decoded = true, ThumbSide, ThumbSide,
              bos.toByteArray, rawMd5)
          case None =>
            md.reset()
            val hex = md.digest(a.payload).map("%02x".format(_)).mkString
            Thumb(a.asset_id, decoded = false, ThumbSide, ThumbSide,
              Array.empty[Byte], hex)
        }
      }
    }
  }

  final case class VideoPixels(asset_id: Long, frame_idx: Int,
      decoded: Boolean, width: Int, height: Int, mean_luma: Double,
      ahash: String)

  /** MJPEG-in-AVI frame chunk walk — the RIFF grammar WAV uses (fourcc +
    * u32le size, even padding) with nested LISTs: find every frame data
    * chunk (`##dc`/`##db`) under the `movi` LIST and return its
    * (offset, size). Validates every length against the payload and
    * refuses (None) on truncation — the corrupt-container convention.
    */
  private[graft] def decodeAviFrames(
      p: Array[Byte]): Option[IndexedSeq[(Int, Int)]] = {
    def leInt(o: Int) = (p(o) & 255) | ((p(o + 1) & 255) << 8) |
      ((p(o + 2) & 255) << 16) | ((p(o + 3) & 255) << 24)
    def tag(o: Int, s: String) = p.length >= o + 4 &&
      s.indices.forall(i => p(o + i) == s.charAt(i))
    if (!(p.length >= 12 && tag(0, "RIFF") && tag(8, "AVI "))) return None
    val riffEnd = math.min(p.length.toLong, 8L + (leInt(4) & 0xFFFFFFFFL)).toInt
    def isFrame(o: Int): Boolean =
      p(o) >= '0' && p(o) <= '9' && p(o + 1) >= '0' && p(o + 1) <= '9' &&
        p(o + 2) == 'd' && (p(o + 3) == 'c' || p(o + 3) == 'b')
    val frames = IndexedSeq.newBuilder[(Int, Int)]
    var ok = true
    def walk(from: Int, to: Int, inMovi: Boolean): Unit = {
      var off = from
      while (ok && off + 8 <= to) {
        val sz = leInt(off + 4)
        if (sz < 0 || off + 8 + sz > to) ok = false
        else {
          if (tag(off, "LIST")) {
            if (sz < 4) ok = false
            else walk(off + 12, off + 8 + sz, inMovi || tag(off + 8, "movi"))
          } else if (inMovi && isFrame(off)) frames += ((off + 8, sz))
          off += 8 + sz + (sz & 1)
        }
      }
    }
    walk(12, riffEnd, inMovi = false)
    if (ok) Some(frames.result()) else None
  }

  /** REAL video frame pixels — closes the video half of the codec seam
    * for the one video codec every JVM already decodes: Motion-JPEG
    * (each frame an independent JPEG — the capture-rig/webcam format).
    * The AVI walk builds the frame table, up to 4 evenly spaced frames
    * go through the SAME ImageIO → luma/aHash kernel
    * `multimodal_pixels` uses (`decodePixels`), so image and video
    * fingerprints live in one hash space — a video frame near-dups
    * against a still image directly. A frame whose codec ImageIO can't
    * read (a real AVI carrying H.264 etc. — the remaining inter-frame
    * JNI seam) degrades to that frame's md5 pseudo-stats; a payload
    * that isn't RIFF-AVI (the text fixture) takes the deterministic
    * whole-payload pseudo path the oracle recomputes.
    */
  def extractVideoPixels(assets: Dataset[Asset]): Dataset[VideoPixels] = {
    import assets.sparkSession.implicits._
    assets.filter(_.kind == "video").mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      def pseudo(a: Asset, i: Int, bytes: Array[Byte], from: Int,
          len: Int): VideoPixels = {
        val n = a.payload.length
        md.reset(); md.update(bytes, from, len)
        val hex = md.digest().map("%02x".format(_)).mkString
        VideoPixels(a.asset_id, i, decoded = false,
          16 + (n % 640), 16 + (n % 480),
          (java.lang.Long.parseLong(hex.take(4), 16) % 2560L) / 10.0,
          hex.take(16))
      }
      it.flatMap { a =>
        val n = a.payload.length
        decodeAviFrames(a.payload) match {
          case Some(frames) if frames.nonEmpty =>
            val k = math.min(4, frames.size)
            (0 until k).map { i =>
              val (off, sz) = frames(i * frames.size / k)
              val bytes = java.util.Arrays.copyOfRange(a.payload, off, off + sz)
              decodePixels(bytes) match {
                case Some((w, h, ml, ah)) =>
                  VideoPixels(a.asset_id, i, decoded = true, w, h, ml, ah)
                case None => pseudo(a, i, bytes, 0, bytes.length)
              }
            }
          case _ =>
            val k = math.min(4, 1 + n % 4)
            (0 until k).map { i =>
              val off = i * n / k
              pseudo(a, i, a.payload, off, math.min(n, off + 16) - off)
            }
        }
      }
    }
  }

  def videoPixels(spark: SparkSession, dir: String): DataFrame =
    extractVideoPixels(assets(spark, dir)).toDF()

  // pseudo path only on the text fixture (no RIFF magic): the per-frame
  // 16-byte-window md5 of `framesSql` + the pseudo-pixel arithmetic of
  // `pixelsSql`
  val videoPixelsSql: String =
    """WITH v AS (
      |  SELECT doc_id AS asset_id, text,
      |         octet_length(encode(text)) AS n,
      |         least(4, 1 + octet_length(encode(text)) % 4) AS k
      |  FROM documents WHERE doc_id % 3 = 2
      |), f AS (
      |  SELECT asset_id, CAST(i AS INT) AS frame_idx, n,
      |         md5(substr(text, CAST(i * n // k + 1 AS INT),
      |                    CAST(least(CAST(16 AS BIGINT), n - i * n // k)
      |                         AS INT))) AS hex
      |  FROM v, unnest(range(0, k)) AS t(i)
      |)
      |SELECT asset_id, frame_idx, false AS decoded,
      |       CAST(16 + n % 640 AS INT) AS width,
      |       CAST(16 + n % 480 AS INT) AS height,
      |       (CAST(concat('0x', substr(hex, 1, 4)) AS UBIGINT) % 2560)
      |         / 10.0 AS mean_luma,
      |       substr(hex, 1, 16) AS ahash
      |FROM f""".stripMargin

  /** Registry projection: the binary thumbnail stays a library-surface
    * column (spec-tested); the driver-compared frame carries the
    * deterministic fingerprint.
    */
  def thumbs(spark: SparkSession, dir: String): DataFrame =
    thumbnails(assets(spark, dir)).toDF()
      .select(col("asset_id"), col("decoded"), col("thumb_w"),
        col("thumb_h"), col("thumb_md5"))

  val thumbsSql: String =
    s"""SELECT doc_id AS asset_id, false AS decoded,
       |       CAST($ThumbSide AS INT) AS thumb_w,
       |       CAST($ThumbSide AS INT) AS thumb_h,
       |       md5(text) AS thumb_md5
       |FROM documents WHERE doc_id % 3 = 0""".stripMargin

  val animSql: String =
    """SELECT doc_id AS asset_id, false AS decoded,
      |       CAST(1 + CAST(concat('0x', substr(md5(text), 1, 4)) AS UBIGINT)
      |              % 4 AS INT) AS n_frames,
      |       CAST(CAST(concat('0x', substr(md5(text), 5, 4)) AS UBIGINT)
      |              % 1000 AS BIGINT) AS duration_cs,
      |       CAST(-1 AS INT) AS loop_count
      |FROM documents WHERE doc_id % 3 = 0""".stripMargin

  val pixelsSql: String =
    """SELECT doc_id AS asset_id, false AS decoded,
      |       CAST(16 + octet_length(encode(text)) % 640 AS INT) AS width,
      |       CAST(16 + octet_length(encode(text)) % 480 AS INT) AS height,
      |       (CAST(concat('0x', substr(md5(text), 1, 4)) AS UBIGINT)
      |          % 2560) / 10.0 AS mean_luma,
      |       substr(md5(text), 1, 16) AS ahash
      |FROM documents WHERE doc_id % 3 = 0""".stripMargin

  val ops: Seq[Op] = Seq(
    Op("multimodal_pixels", pixels _, Some(pixelsSql)),
    Op("multimodal_samples", samples _, Some(samplesSql)),
    Op("multimodal_animation", anim _, Some(animSql)),
    Op("multimodal_thumbnail", thumbs _, Some(thumbsSql)),
    Op("multimodal_meta", meta _, Some(metaSql)),
    Op("multimodal_frames", frames _, Some(framesSql)),
    Op("multimodal_audio_meta", audioMeta _, Some(audioMetaSql)),
    Op("multimodal_mp3_sideinfo", mp3SideInfo _, Some(mp3SideInfoSql)),
    Op("multimodal_exif", exifMeta _, Some(exifMetaSql)),
    Op("multimodal_id3_tags", id3Tags _, Some(id3TagsSql)),
    Op("multimodal_video_meta", videoMeta _, Some(videoMetaSql)),
    Op("multimodal_video_pixels", videoPixels _, Some(videoPixelsSql)),
  )
}
