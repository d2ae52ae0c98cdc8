package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import graft.operators.Multimodal

/** Golden tests for the REAL pixel decode (`Multimodal.decodePixels` /
  * `extractPixels`): bytes written by the JDK's own ImageIO encoders —
  * not this repo's constants — decode back with exact dimensions,
  * exact mean luma for lossless formats, and the aHash invariants
  * image near-dup dedup relies on (format-independence for lossless
  * encodings, uniform-brightness invariance, structural sensitivity).
  */
class GoldenImageSpec extends SparkSpec {

  private def encode(img: BufferedImage, fmt: String): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    assert(ImageIO.write(img, fmt, bos), s"no $fmt writer")
    bos.toByteArray
  }

  /** Horizontal gradient with a bright square — structured content so
    * the aHash has both 0 and 1 bits.
    */
  private def gradient(shift: Int = 0): BufferedImage = {
    val img = new BufferedImage(32, 24, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 24; x <- 0 until 32) {
      val base = math.min(200, 40 + x * 5) + shift
      val v = if (x >= 20 && y >= 14) math.min(255, base + 50) else base
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    img
  }

  test("lossless round-trip: the same pixels as PNG and BMP decode to " +
      "identical stats and identical aHash") {
    val img = gradient()
    val png = Multimodal.decodePixels(encode(img, "png"))
    val bmp = Multimodal.decodePixels(encode(img, "bmp"))
    assert(png.isDefined && bmp.isDefined)
    assert(png == bmp, s"png=$png bmp=$bmp")
    val (w, h, mean, hash) = png.get
    assert(w == 32 && h == 24)
    assert(mean > 40 && mean < 220, s"mean $mean")
    assert(hash.matches("[0-9a-f]{16}"))
    // structured content: neither all-zeros nor all-ones
    val bits = java.lang.Long.parseUnsignedLong(hash, 16)
    assert(bits != 0L && bits != -1L)
  }

  test("aHash is invariant under a uniform brightness shift") {
    val a = Multimodal.decodePixels(encode(gradient(), "png")).get
    val b = Multimodal.decodePixels(encode(gradient(30), "png")).get
    assert(a._4 == b._4, s"hash moved: ${a._4} vs ${b._4}")
    assert(b._3 > a._3, "mean luma must rise with brightness")
  }

  test("aHash separates structurally different images") {
    val left = gradient()
    val right = new BufferedImage(32, 24, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 24; x <- 0 until 32) // mirrored gradient
      right.setRGB(x, y, left.getRGB(31 - x, y))
    val ha = java.lang.Long.parseUnsignedLong(
      Multimodal.decodePixels(encode(left, "png")).get._4, 16)
    val hb = java.lang.Long.parseUnsignedLong(
      Multimodal.decodePixels(encode(right, "png")).get._4, 16)
    assert(java.lang.Long.bitCount(ha ^ hb) >= 16,
      f"mirror too close: ${java.lang.Long.bitCount(ha ^ hb)} bits")
  }

  test("JPEG decodes with exact dimensions and a close mean; corrupt " +
      "magic-matched bytes fall back, non-images never attempt") {
    val img = gradient()
    val jpg = Multimodal.decodePixels(encode(img, "jpg"))
    assert(jpg.isDefined, "JDK jpeg reader missing")
    val (w, h, mean, _) = jpg.get
    assert(w == 32 && h == 24)
    val ref = Multimodal.decodePixels(encode(img, "png")).get._3
    assert(math.abs(mean - ref) < 5.0, s"jpeg mean $mean vs $ref")
    // PNG magic + garbage: attempted, fails, falls back to None
    val corrupt = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a,
      0x1a, 0x0a) ++ Array.fill[Byte](64)(0x5a)
    assert(Multimodal.decodePixels(corrupt).isEmpty)
    assert(Multimodal.decodePixels("plain text".getBytes("UTF-8")).isEmpty)
  }

  // ---------------------------------------------------- GIF animation

  /** Animated GIF through the JDK's own sequence writer — independent
    * encoder bytes, not this repo's constants: per-frame
    * GraphicControlExtension delay + a NETSCAPE2.0 loop block.
    */
  private def animatedGif(nFrames: Int, delayCs: Int,
      loop: Int): Array[Byte] = {
    import javax.imageio.metadata.IIOMetadataNode
    import javax.imageio.{IIOImage, ImageTypeSpecifier}
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    (0 until nFrames).foreach { f =>
      val img = new BufferedImage(8, 8, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 8; x <- 0 until 8)
        img.setRGB(x, y, if ((x + f) % 2 == 0) 0xFFFFFF else 0)
      val meta = writer.getDefaultImageMetadata(
        new ImageTypeSpecifier(img), writer.getDefaultWriteParam)
      val fmt = "javax_imageio_gif_image_1.0"
      val root = meta.getAsTree(fmt).asInstanceOf[IIOMetadataNode]
      val gce = new IIOMetadataNode("GraphicControlExtension")
      gce.setAttribute("disposalMethod", "none")
      gce.setAttribute("userInputFlag", "FALSE")
      gce.setAttribute("transparentColorFlag", "FALSE")
      gce.setAttribute("delayTime", delayCs.toString)
      gce.setAttribute("transparentColorIndex", "0")
      root.appendChild(gce)
      if (f == 0) {
        val apps = new IIOMetadataNode("ApplicationExtensions")
        val app = new IIOMetadataNode("ApplicationExtension")
        app.setAttribute("applicationID", "NETSCAPE")
        app.setAttribute("authenticationCode", "2.0")
        app.setUserObject(Array[Byte](1, (loop & 0xFF).toByte,
          ((loop >> 8) & 0xFF).toByte))
        apps.appendChild(app)
        root.appendChild(apps)
      }
      meta.setFromTree(fmt, root)
      writer.writeToSequence(new IIOImage(img, null, meta), null)
    }
    writer.endWriteSequence()
    ios.close()
    bos.toByteArray
  }

  test("gif animation: the JDK-encoded sequence walks back to its " +
      "frame count, total delay and loop count") {
    val bytes = animatedGif(nFrames = 3, delayCs = 25, loop = 0)
    val Some((n, d, l)) = Multimodal.decodeGifAnim(bytes)
    assert(n == 3, s"frames $n")
    assert(d == 75L, s"delay $d")
    assert(l == 0, s"loop $l (0 = forever)")
    // a single-frame still (the pixel-decode gradient) is 1 frame,
    // no NETSCAPE block
    val still = encode(gradient(), "gif")
    val Some((n1, _, l1)) = Multimodal.decodeGifAnim(still)
    assert(n1 == 1 && l1 == -1, s"still: $n1 $l1")
    // truncation refuses instead of miscounting
    assert(Multimodal.decodeGifAnim(bytes.take(bytes.length - 2)).isEmpty)
    assert(Multimodal.decodeGifAnim("GIF8".getBytes).isEmpty)
  }

  // ------------------------------------------------- PCM sample decode

  /** Hand-built RIFF/WAVE: 16-bit PCM mono sine, amplitude `amp`,
    * `freq` Hz at 8 kHz for `n` samples.
    */
  private def sineWav(amp: Int, freq: Double, n: Int): Array[Byte] = {
    val dataLen = n * 2
    val out = new java.io.ByteArrayOutputStream()
    def le32(v: Int) = (0 until 4).foreach(i => out.write((v >> (8 * i)) & 255))
    def le16(v: Int) = (0 until 2).foreach(i => out.write((v >> (8 * i)) & 255))
    out.write("RIFF".getBytes); le32(36 + dataLen)
    out.write("WAVE".getBytes)
    out.write("fmt ".getBytes); le32(16)
    le16(1); le16(1); le32(8000); le32(16000); le16(2); le16(16)
    out.write("data".getBytes); le32(dataLen)
    (0 until n).foreach { i =>
      le16(math.rint(amp * math.sin(2 * math.Pi * freq * i / 8000)).toInt
        & 0xFFFF)
    }
    out.toByteArray
  }

  test("wav samples: a synthesized sine decodes to its textbook peak, " +
      "RMS and zero-crossing count") {
    // 0.1 s of 440 Hz at amplitude 10000
    val Some((n, peak, rms, zc)) =
      Multimodal.decodeWavSamples(sineWav(10000, 440.0, 800))
    assert(n == 800L)
    assert(peak >= 9990 && peak <= 10000, s"peak $peak")
    // sine RMS = amp/sqrt(2) ≈ 7071
    assert(math.abs(rms - 7071.0) < 25, s"rms $rms")
    // 440 Hz crosses zero 2·440·0.1 = 88 times (±1 at the edges)
    assert(math.abs(zc - 88L) <= 1, s"zc $zc")
    // non-PCM / non-WAV payloads never decode
    assert(Multimodal.decodeWavSamples("words".getBytes).isEmpty)
    val f32 = sineWav(10000, 440.0, 800)
    f32(20) = 3 // fmt code 3 = IEEE float: unsupported encoding
    assert(Multimodal.decodeWavSamples(f32).isEmpty)
  }

  /** RIFF/WAVE wrapper around arbitrary fmt + data payloads — shared by
    * the G.711 and IMA-ADPCM goldens.
    */
  private def buildWav(fmtCode: Int, ch: Int, bits: Int, blockAlign: Int,
      spb: Int, data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def le32(v: Int) = (0 until 4).foreach(i => out.write((v >> (8 * i)) & 255))
    def le16(v: Int) = (0 until 2).foreach(i => out.write((v >> (8 * i)) & 255))
    val fmtLen = if (spb > 0) 20 else 16
    out.write("RIFF".getBytes); le32(20 + fmtLen + data.length)
    out.write("WAVE".getBytes)
    out.write("fmt ".getBytes); le32(fmtLen)
    le16(fmtCode); le16(ch); le32(8000); le32(8000 * blockAlign / ch)
    le16(blockAlign); le16(bits)
    if (spb > 0) { le16(2); le16(spb) }
    out.write("data".getBytes); le32(data.length)
    out.write(data)
    out.toByteArray
  }

  test("G.711 a-law/µ-law: published reference values, sine through the container") {
    // Published decode pins (ITU-T G.711 / the classic public tables):
    assert(Multimodal.alawDecode(0xD5) == 8 && Multimodal.alawDecode(0x55) == -8)
    assert(Multimodal.alawDecode(0xAA) == 32256 &&
      Multimodal.alawDecode(0x2A) == -32256)
    assert(Multimodal.ulawDecode(0xFF) == 0 && Multimodal.ulawDecode(0x7F) == 0)
    assert(Multimodal.ulawDecode(0x80) == 32124 &&
      Multimodal.ulawDecode(0x00) == -32124)
    // the full codebooks are symmetric and bounded
    val aVals = (0 until 256).map(Multimodal.alawDecode)
    val uVals = (0 until 256).map(Multimodal.ulawDecode)
    assert(aVals.max == 32256 && aVals.min == -32256)
    assert(uVals.max == 32124 && uVals.min == -32124)
    assert(aVals.toSet.size == 256, "a-law codes must be distinct")

    // sine through the WAV container: nearest-code quantization of a
    // 10000-amp sine; decoded stats must match the quantized reference
    // exactly, and sit within codec tolerance of the ideal sine
    def nearest(vals: IndexedSeq[Int], s: Int): Int =
      vals.indices.minBy(i => (math.abs(vals(i) - s), vals(i)))
    for ((code, vals) <- Seq(6 -> aVals, 7 -> uVals)) {
      val sine = Array.tabulate(800)(i =>
        math.rint(10000 * math.sin(2 * math.Pi * 440 * i / 8000)).toInt)
      val bytes = sine.map(s => nearest(vals, s).toByte)
      val decoded = bytes.map(b => vals(b & 0xFF))
      val wav = buildWav(code, 1, 8, 1, 0, bytes)
      val Some((n, peak, rms, zc)) = Multimodal.decodeWavSamples(wav)
      assert(n == 800L, s"fmt $code")
      assert(peak == decoded.map(math.abs).max, s"fmt $code peak $peak")
      assert(math.abs(rms - 7071.0) < 160, s"fmt $code rms $rms")
      var ezc = 0; var prev = 0
      decoded.foreach { s =>
        val sg = Integer.signum(s)
        if (sg != 0 && prev != 0 && sg != prev) ezc += 1
        if (sg != 0) prev = sg
      }
      assert(zc == ezc, s"fmt $code zc $zc != $ezc")
    }
  }

  /** Test-side IMA-ADPCM ENCODER (the published IMA/DVI algorithm,
    * implemented independently of the decoder): returns the encoded
    * blocks AND the encoder's own reconstructed samples — which the
    * decoder must reproduce bit-exactly.
    */
  private def imaEncode(chans: Seq[Array[Int]], blockAlign: Int)
      : (Array[Byte], Seq[Array[Int]]) = {
    val step = Array(7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25,
      28, 31, 34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118,
      130, 143, 157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408,
      449, 494, 544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282,
      1411, 1552, 1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660,
      4026, 4428, 4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442,
      11487, 12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623,
      27086, 29794, 32767)
    val idxAdj = Array(-1, -1, -1, -1, 2, 4, 6, 8)
    val ch = chans.length
    val spb = (blockAlign - 4 * ch) * 2 / ch + 1
    val nBlocks = chans.head.length / spb
    val out = new java.io.ByteArrayOutputStream()
    val recon = chans.map(_ => Array.newBuilder[Int])
    val idx = new Array[Int](ch)
    for (b <- 0 until nBlocks) {
      val pred = new Array[Int](ch)
      for (c <- 0 until ch) {
        pred(c) = chans(c)(b * spb)
        out.write(pred(c) & 255); out.write((pred(c) >> 8) & 255)
        out.write(idx(c)); out.write(0)
        recon(c) += pred(c)
      }
      def nib(c: Int, s: Int): Int = {
        val st = step(idx(c))
        var diff = s - pred(c)
        var v = 0
        if (diff < 0) { v = 8; diff = -diff }
        if (diff >= st) { v |= 4; diff -= st }
        if (diff >= (st >> 1)) { v |= 2; diff -= st >> 1 }
        if (diff >= (st >> 2)) v |= 1
        // decoder-mirror state update
        var d = st >> 3
        if ((v & 1) != 0) d += st >> 2
        if ((v & 2) != 0) d += st >> 1
        if ((v & 4) != 0) d += st
        if ((v & 8) != 0) d = -d
        pred(c) = math.max(-32768, math.min(32767, pred(c) + d))
        idx(c) = math.max(0, math.min(88, idx(c) + idxAdj(v & 7)))
        recon(c) += pred(c)
        v
      }
      var s = 1
      while (s < spb) {
        for (c <- 0 until ch) {
          var k = 0
          while (k < 4) {
            val lo = nib(c, chans(c)(b * spb + s + 2 * k))
            val hi = nib(c, chans(c)(b * spb + s + 2 * k + 1))
            out.write(lo | (hi << 4))
            k += 1
          }
        }
        s += 8
      }
    }
    (out.toByteArray, recon.map(_.result()))
  }

  test("IMA ADPCM: decoder bit-matches an independent encoder, mono + stereo") {
    def expectedOf(chans: Seq[Array[Int]]): (Long, Int, Double, Long) = {
      val n = chans.map(_.length.toLong).sum
      val peak = chans.flatMap(_.map(math.abs)).max
      val sumSq = chans.flatMap(_.map(s => s.toLong * s)).sum
      val rms = math.rint(math.sqrt(sumSq.toDouble / n) * 10000) / 10000
      var zcv = 0L; var prev = 0
      chans.head.foreach { s =>
        val sg = Integer.signum(s)
        if (sg != 0 && prev != 0 && sg != prev) zcv += 1
        if (sg != 0) prev = sg
      }
      (n, peak, rms, zcv)
    }
    // mono: 2 blocks of 505 samples (blockAlign 256)
    val mono = Array.tabulate(1010)(i =>
      math.rint(9000 * math.sin(2 * math.Pi * 300 * i / 8000)).toInt)
    val (md, mrec) = imaEncode(Seq(mono), 256)
    val mwav = buildWav(17, 1, 4, 256, 505, md)
    val got = Multimodal.decodeWavSamples(mwav)
    assert(got.contains(expectedOf(mrec)), s"mono: $got")

    // stereo: interleaved 4-byte channel words (blockAlign 16, spb 9)
    val l = Array.tabulate(18)(i => i * 500 - 4000)
    val r = Array.tabulate(18)(i => 1000 - i * 300)
    val (sd, srec) = imaEncode(Seq(l, r), 16)
    val swav = buildWav(17, 2, 4, 16, 9, sd)
    val got2 = Multimodal.decodeWavSamples(swav)
    assert(got2.contains(expectedOf(srec)), s"stereo: $got2")

    // refusals: truncated final block, reserved step index, spb mismatch
    assert(Multimodal.decodeWavSamples(
      mwav.take(mwav.length - 5)).isEmpty, "truncated block must refuse")
    val badIdx = mwav.clone()
    badIdx(50) = 90 // block 0 stepIndex (data at 48; 2-byte pred first)
    assert(Multimodal.decodeWavSamples(badIdx).isEmpty,
      "stepIndex > 88 must refuse")
    val badSpb = buildWav(17, 1, 4, 256, 504, md)
    assert(Multimodal.decodeWavSamples(badSpb).isEmpty,
      "samples-per-block mismatch must refuse")
  }

  // ------------------------------------------------ FLAC sample decode

  private final class BitWriter {
    private val bos = new java.io.ByteArrayOutputStream()
    private var cur = 0; private var nb = 0
    def bit(b: Int): Unit = {
      cur = (cur << 1) | (b & 1); nb += 1
      if (nb == 8) { bos.write(cur); cur = 0; nb = 0 }
    }
    def bits(v: Long, n: Int): Unit =
      (n - 1 to 0 by -1).foreach(i => bit(((v >> i) & 1).toInt))
    def align(): Unit = while (nb != 0) bit(0)
    def result: Array[Byte] = { align(); bos.toByteArray }
  }

  private def crc8(bytes: Array[Byte]): Int = {
    var crc = 0
    bytes.foreach { b =>
      crc ^= (b & 0xFF)
      (0 until 8).foreach { _ =>
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xFF
              else (crc << 1) & 0xFF
      }
    }
    crc
  }

  private def riceResiduals(w: BitWriter, res: Seq[Long], param: Int): Unit = {
    w.bits(0, 2)           // coding method 0: 4-bit Rice
    w.bits(0, 4)           // partition order 0
    w.bits(param.toLong, 4)
    res.foreach { v =>
      val u = (v << 1) ^ (v >> 63) // zigzag
      val q = (u >>> param).toInt
      (0 until q).foreach(_ => w.bit(0)); w.bit(1)
      w.bits(u & ((1L << param) - 1), param)
    }
  }

  /** Spec-valid FLAC: STREAMINFO + one fixed-blocksize frame whose
    * subframes are written by `sub` (one call per channel) — the real
    * header grammar including the frame CRC-8.
    */
  private def buildFlac(nCh: Int, bs: Int, n: Int,
      sub: (BitWriter, Int) => Unit): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write("fLaC".getBytes("US-ASCII"))
    val si = new BitWriter
    si.bits(bs.toLong, 16); si.bits(bs.toLong, 16) // min/max blocksize
    si.bits(0, 24); si.bits(0, 24)                 // min/max framesize
    si.bits(8000, 20)                              // sample rate
    si.bits((nCh - 1).toLong, 3)                   // channels-1
    si.bits(15, 5)                                 // bits-1 (16-bit)
    si.bits(n.toLong, 36)                          // total samples
    (0 until 16).foreach(_ => si.bits(0, 8))       // md5
    val siBytes = si.result
    out.write(0x80); out.write(0); out.write(0); out.write(siBytes.length)
    out.write(siBytes)
    // frame header (bytes buffered for the CRC-8)
    val h = new BitWriter
    h.bits(0x3FFE, 14); h.bits(0, 2)               // sync, reserved, fixed
    h.bits(7, 4)                                   // bs code: 16-bit bs-1
    h.bits(0, 4)                                   // rate from STREAMINFO
    h.bits((nCh - 1).toLong, 4)                    // independent channels
    h.bits(4, 3); h.bit(0)                         // 16-bit samples
    h.bits(0, 8)                                   // frame number 0 (UTF-8)
    h.bits((bs - 1).toLong, 16)
    val hb = h.result
    out.write(hb)
    out.write(crc8(hb))
    val w = new BitWriter
    (0 until nCh).foreach(c => sub(w, c))
    out.write(w.result)
    out.write(0); out.write(0)                     // frame CRC-16
    out.toByteArray
  }

  private def expectedStats(chans: Seq[Array[Long]])
      : (Long, Int, Double, Long) = {
    val total = chans.map(_.length.toLong).sum
    val peak = chans.flatMap(_.map(math.abs)).max.toInt
    val sumSq = chans.flatMap(_.map(s => s * s)).sum
    val rms = math.rint(math.sqrt(sumSq.toDouble / total) * 10000) / 10000
    var zc = 0L; var prev = 0
    chans.head.foreach { s =>
      val sign = java.lang.Long.signum(s)
      if (sign != 0 && prev != 0 && sign != prev) zc += 1
      if (sign != 0) prev = sign
    }
    (total, peak, rms, zc)
  }

  test("flac constant + verbatim subframes decode to exact sample stats") {
    // stereo: channel 0 constant 5000, channel 1 verbatim sine
    val n = 192
    val sine = Array.tabulate(n)(i =>
      math.rint(8000 * math.sin(2 * math.Pi * 440 * i / 8000)).toLong)
    val flac = buildFlac(2, n, n, { (w, c) =>
      if (c == 0) { w.bit(0); w.bits(0, 6); w.bit(0); w.bits(5000, 16) }
      else {
        w.bit(0); w.bits(1, 6); w.bit(0)
        sine.foreach(s => w.bits(s & 0xFFFF, 16))
      }
    })
    val got = Multimodal.decodeFlacSamples(flac)
    val exp = expectedStats(Seq(Array.fill(n)(5000L), sine))
    assert(got.contains(exp), s"got=$got exp=$exp")
  }

  test("flac fixed-predictor subframes reconstruct through Rice residuals") {
    // order-2 on a linear ramp: every residual is 0 after the warmup —
    // and a order-1 channel with nonzero residuals exercises real Rice
    val n = 64
    val ramp = Array.tabulate(n)(i => 3L * i - 90L)
    val walk = Array.tabulate(n)(i => (i % 7).toLong - 3L)
    val flac = buildFlac(2, n, n, { (w, c) =>
      if (c == 0) {
        w.bit(0); w.bits(10, 6); w.bit(0) // FIXED order 2
        w.bits(ramp(0) & 0xFFFF, 16); w.bits(ramp(1) & 0xFFFF, 16)
        riceResiduals(w, (2 until n).map(i =>
          ramp(i) - 2 * ramp(i - 1) + ramp(i - 2)), param = 0)
      } else {
        w.bit(0); w.bits(9, 6); w.bit(0) // FIXED order 1
        w.bits(walk(0) & 0xFFFF, 16)
        riceResiduals(w, (1 until n).map(i => walk(i) - walk(i - 1)),
          param = 2)
      }
    })
    val got = Multimodal.decodeFlacSamples(flac)
    val exp = expectedStats(Seq(ramp, walk))
    assert(got.contains(exp), s"got=$got exp=$exp")
  }

  test("flac escaped Rice partitions decode at the per-partition width") {
    // RFC 9639 §9.2.7: escape code (param 15 for 4-bit method) is
    // followed by ONE 5-bit raw width, then every residual of the
    // partition verbatim at that width. Partition order 1 mixes an
    // escaped partition with a normal Rice partition in one subframe —
    // a per-residual width read (the pre-fix bug) desyncs immediately.
    val n = 64
    val walk = Array.tabulate(n)(i => (i % 5).toLong - 2L)
    val res = (1 until n).map(i => walk(i) - walk(i - 1)) // in [-4, 4]
    val flac = buildFlac(1, n, n, { (w, _) =>
      w.bit(0); w.bits(9, 6); w.bit(0) // FIXED order 1
      w.bits(walk(0) & 0xFFFF, 16)
      w.bits(0, 2)  // coding method 0: 4-bit Rice params
      w.bits(1, 4)  // partition order 1: two partitions of 32
      // partition 0 (31 residuals after warmup): ESCAPED, 6-bit raw
      w.bits(15, 4); w.bits(6, 5)
      res.take(31).foreach(v => w.bits(v & 0x3F, 6))
      // partition 1 (32 residuals): normal Rice, param 2
      w.bits(2, 4)
      res.drop(31).foreach { v =>
        val u = (v << 1) ^ (v >> 63)
        val q = (u >>> 2).toInt
        (0 until q).foreach(_ => w.bit(0)); w.bit(1)
        w.bits(u & 3, 2)
      }
    })
    val got = Multimodal.decodeFlacSamples(flac)
    val exp = expectedStats(Seq(walk))
    assert(got.contains(exp), s"got=$got exp=$exp")
  }

  test("flac escaped partition with raw width 0 yields all-zero residuals") {
    val n = 32
    val const = Array.fill(n)(7L) // order-1 fixed => residuals all 0
    val flac = buildFlac(1, n, n, { (w, _) =>
      w.bit(0); w.bits(9, 6); w.bit(0)
      w.bits(const(0) & 0xFFFF, 16)
      w.bits(0, 2); w.bits(0, 4)     // method 0, partition order 0
      w.bits(15, 4); w.bits(0, 5)    // escape, raw width 0: no bits follow
    })
    val got = Multimodal.decodeFlacSamples(flac)
    val exp = expectedStats(Seq(const))
    assert(got.contains(exp), s"got=$got exp=$exp")
  }

  test("flac frame with invalid sample-rate code 15 is refused") {
    val n = 32
    val ok = buildFlac(1, n, n, { (w, _) =>
      w.bit(0); w.bits(0, 6); w.bit(0); w.bits(123, 16)
    })
    assert(Multimodal.decodeFlacSamples(ok).isDefined)
    // frame header starts right after fLaC + 4-byte block header + 34-byte
    // STREAMINFO = offset 42; srCode is the low nibble of header byte 2.
    val bad = ok.clone()
    bad(44) = ((bad(44) & 0xF0) | 0x0F).toByte
    assert(Multimodal.decodeFlacSamples(bad).isEmpty)
  }

  test("flac LPC subframes reconstruct through quantized coefficients") {
    // order-2 LPC, precision 12, shift 4: residuals computed forward by
    // the test's own reference predictor, decoder must invert exactly
    val n = 64
    val s = Array.tabulate(n)(i =>
      math.rint(6000 * math.sin(2 * math.Pi * 3 * i / n)).toLong)
    val order = 2; val shift = 4
    val coefs = Array(31L, -15L) // ~2cos(θ), -1 in 4-bit-shifted units
    def pred(i: Int): Long = {
      var acc = 0L
      (0 until order).foreach(j => acc += coefs(j) * s(i - 1 - j))
      acc >> shift
    }
    val flac = buildFlac(1, n, n, { (w, _) =>
      w.bit(0); w.bits((32 | (order - 1)).toLong, 6); w.bit(0)
      (0 until order).foreach(i => w.bits(s(i) & 0xFFFF, 16))
      w.bits((12 - 1).toLong, 4)   // precision-1
      w.bits(shift.toLong, 5)
      coefs.foreach(c => w.bits(c & 0xFFF, 12))
      riceResiduals(w, (order until n).map(i => s(i) - pred(i)), param = 6)
    })
    val got = Multimodal.decodeFlacSamples(flac)
    val exp = expectedStats(Seq(s))
    assert(got.contains(exp), s"got=$got exp=$exp")
  }

  test("flac stereo decorrelation: left/side, side/right, mid/side") {
    val n = 64
    val left = Array.tabulate(n)(i => (137L * i) % 901L - 450L)
    val right = Array.tabulate(n)(i => (89L * i) % 677L - 338L)
    val side = Array.tabulate(n)(i => left(i) - right(i))
    val mid = Array.tabulate(n)(i => (left(i) + right(i)) >> 1)
    val exp = expectedStats(Seq(left, right))
    def verbatim(w: BitWriter, xs: Array[Long], bits: Int): Unit = {
      w.bit(0); w.bits(1, 6); w.bit(0)
      xs.foreach(x => w.bits(x & ((1L << bits) - 1), bits))
    }
    // buildFlac writes chAsgn = nCh-1; decorrelated frames need 8/9/10,
    // so patch the 4-bit assignment: header bits 24-27 = high nibble of
    // frame-header byte 3 (sync+reserved fill bytes 0-1, bs|sr byte 2).
    // The decoder ignores the CRC-8, so no recompute is needed.
    def withAsgn(flac: Array[Byte], asgn: Int): Array[Byte] = {
      val out = flac.clone()
      val hOff = 4 + 4 + 34 // magic + block header + STREAMINFO
      out(hOff + 3) = ((asgn << 4) | (out(hOff + 3) & 0x0F)).toByte
      out
    }
    val ls = withAsgn(buildFlac(2, n, n, { (w, c) =>
      if (c == 0) verbatim(w, left, 16) else verbatim(w, side, 17)
    }), 8)
    assert(Multimodal.decodeFlacSamples(ls).contains(exp), "left/side")
    val sr = withAsgn(buildFlac(2, n, n, { (w, c) =>
      if (c == 0) verbatim(w, side, 17) else verbatim(w, right, 16)
    }), 9)
    assert(Multimodal.decodeFlacSamples(sr).contains(exp), "side/right")
    val ms = withAsgn(buildFlac(2, n, n, { (w, c) =>
      if (c == 0) verbatim(w, mid, 16) else verbatim(w, side, 17)
    }), 10)
    assert(Multimodal.decodeFlacSamples(ms).contains(exp), "mid/side")
  }

  test("flac refusal: truncation, reserved subframe type, junk") {
    val n = 192
    val ok = buildFlac(1, n, n, (w, _) => {
      w.bit(0); w.bits(0, 6); w.bit(0); w.bits(1234, 16)
    })
    assert(Multimodal.decodeFlacSamples(ok).isDefined)
    assert(Multimodal.decodeFlacSamples(ok.take(ok.length - 6)).isEmpty)
    // reserved subframe type (2): refused, not guessed
    val reserved = buildFlac(1, n, n, (w, _) => {
      w.bit(0); w.bits(2, 6); w.bit(0); w.bits(1234, 16)
    })
    assert(Multimodal.decodeFlacSamples(reserved).isEmpty)
    assert(Multimodal.decodeFlacSamples("words".getBytes).isEmpty)
  }

  test("extractSamples: FLAC assets decode for real alongside WAV") {
    import spark.implicits._
    val n = 192
    val flac = buildFlac(1, n, n, (w, _) => {
      w.bit(0); w.bits(0, 6); w.bit(0); w.bits(7000, 16)
    })
    val got = Multimodal.extractSamples(Seq(
      Multimodal.Asset(1L, "audio", flac, "s"),
      Multimodal.Asset(4L, "audio", "just words".getBytes("UTF-8"), "s"))
      .toDS()).collect().map(s => s.asset_id -> s).toMap
    assert(got(1L).decoded && got(1L).n_samples == n.toLong &&
      got(1L).peak == 7000)
    assert(!got(4L).decoded)
  }

  // --------------------------------------------------------- resize

  test("box resize: solid color is exact, gradient means survive, the " +
      "thumbnail round-trips through PNG at the target size") {
    // solid color: every box average IS the color — bytes exact
    val solid = new BufferedImage(50, 30, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 30; x <- 0 until 50) solid.setRGB(x, y, 0x3C7F14)
    val (thumbS, md5S) = Multimodal.boxResize(solid, 16)
    for (y <- 0 until 16; x <- 0 until 16)
      assert((thumbS.getRGB(x, y) & 0xFFFFFF) == 0x3C7F14)
    val raw = Array.fill[Byte](16 * 16 * 3)(0)
    for (i <- 0 until 256) {
      raw(i * 3) = 0x3C; raw(i * 3 + 1) = 0x7F; raw(i * 3 + 2) = 0x14
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    assert(md5S == md.digest(raw).map("%02x".format(_)).mkString)
    // gradient: left half darker than right half after resize too
    val (thumbG, _) = Multimodal.boxResize(gradient(), 16)
    def lum(rgb: Int) = ((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) +
      (rgb & 0xFF)
    val leftMean = (0 until 16).map(y => lum(thumbG.getRGB(2, y))).sum
    val rightMean = (0 until 16).map(y => lum(thumbG.getRGB(13, y))).sum
    assert(leftMean < rightMean, s"$leftMean !< $rightMean")
    // full pipeline: decode → resize → PNG re-encode → re-decode
    import spark.implicits._
    val assets = Seq(
      Multimodal.Asset(3L, "image", encode(gradient(), "png"), "s"),
      Multimodal.Asset(6L, "image", "words".getBytes, "s")).toDS()
    val got = Multimodal.thumbnails(assets).collect()
      .map(t => t.asset_id -> t).toMap
    assert(got(3L).decoded && got(3L).thumb_png.nonEmpty)
    val rt = ImageIO.read(
      new java.io.ByteArrayInputStream(got(3L).thumb_png))
    assert(rt.getWidth == 16 && rt.getHeight == 16)
    // the PNG round-trip preserves the exact resized pixels
    val (direct, directMd5) = Multimodal.boxResize(gradient(), 16)
    for (y <- 0 until 16; x <- 0 until 16)
      assert(rt.getRGB(x, y) == direct.getRGB(x, y))
    assert(got(3L).thumb_md5 == directMd5)
    assert(!got(6L).decoded && got(6L).thumb_png.isEmpty)
  }

  // ------------------------------------------- ISO-BMFF sample tables

  private def bmffBox(tag: String, payload: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val size = 8 + payload.length
    (3 to 0 by -1).foreach(i => out.write((size >> (8 * i)) & 255))
    out.write(tag.getBytes("US-ASCII"))
    out.write(payload)
    out.toByteArray
  }
  private def be32(vs: Int*): Array[Byte] =
    vs.flatMap(v => (3 to 0 by -1).map(i => ((v >> (8 * i)) & 255).toByte))
      .toArray

  /** Minimal BMFF: ftyp + mdat(3 samples: 5,7,4 bytes across 2 chunks)
    * + moov/trak/mdia/minf/stbl{stsz,stsc,stco}. Chunk 1 @24 holds
    * samples 0,1; chunk 2 @36 holds sample 2.
    */
  private def miniMp4: Array[Byte] = {
    val ftyp = bmffBox("ftyp", "isom".getBytes ++ be32(0x200))
    val mdat = bmffBox("mdat",
      "AAAAA".getBytes ++ "BBBBBBB".getBytes ++ "CCCC".getBytes)
    val stsz = bmffBox("stsz", be32(0, 0, 3, 5, 7, 4))
    val stsc = bmffBox("stsc", be32(0, 2, 1, 2, 1, 2, 1, 1))
    val stco = bmffBox("stco", be32(0, 2, 24, 36))
    val stbl = bmffBox("stbl", stsz ++ stsc ++ stco)
    val minf = bmffBox("minf", stbl)
    val mdia = bmffBox("mdia", minf)
    val trak = bmffBox("trak", mdia)
    val moov = bmffBox("moov", trak)
    ftyp ++ mdat ++ moov
  }

  test("bmff sample table: stsz × stsc × stco walk recovers every " +
      "sample's true offset and size") {
    val p = miniMp4
    assert(new String(p.slice(24, 29)) == "AAAAA", "layout self-check")
    assert(new String(p.slice(36, 40)) == "CCCC", "layout self-check")
    val got = Multimodal.decodeMp4Samples(p)
    assert(got.contains(Vector((24L, 5), (29L, 7), (36L, 4))), s"got $got")
    // inconsistent table (count 5, three sizes) refuses
    val bad = miniMp4
    val i = bad.indexOfSlice("stsz".getBytes) + 4
    bad(i + 11) = 5
    assert(Multimodal.decodeMp4Samples(bad).isEmpty)
    assert(Multimodal.decodeMp4Samples("words".getBytes).isEmpty)
  }

  test("frame sampling rides the real seek table for BMFF payloads") {
    import spark.implicits._
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(s: String) = {
      md.reset(); md.digest(s.getBytes).map("%02x".format(_)).mkString
    }
    val assets = Seq(Multimodal.Asset(2L, "video", miniMp4, "s")).toDS()
    val frames = Multimodal.sampleFrames(assets).collect()
      .sortBy(_.frame_idx)
    assert(frames.map(f => (f.frame_idx, f.frame_offset)).toSeq ==
      Seq((0, 24L), (1, 29L), (2, 36L)), s"got ${frames.toSeq}")
    assert(frames.map(_.frame_md5).toSeq ==
      Seq(h("AAAAA"), h("BBBBBBB"), h("CCCC")))
  }

  test("extractPixels: real images decode through the Spark path, text " +
      "payloads get the oracled pseudo-stats") {
    import spark.implicits._
    val pngBytes = encode(gradient(), "png")
    val assets = Seq(
      Multimodal.Asset(3L, "image", pngBytes, "s"),
      Multimodal.Asset(6L, "image", "just words".getBytes("UTF-8"), "s"),
      Multimodal.Asset(1L, "audio", pngBytes, "s")) // wrong kind: excluded
      .toDS()
    val got = Multimodal.extractPixels(assets).collect()
      .map(p => p.asset_id -> p).toMap
    assert(got.keySet == Set(3L, 6L))
    assert(got(3L).decoded && got(3L).width == 32 && got(3L).height == 24)
    val expected = Multimodal.decodePixels(pngBytes).get
    assert(got(3L).ahash == expected._4 && got(3L).mean_luma == expected._3)
    assert(!got(6L).decoded)
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest("just words".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(got(6L).ahash == hex.take(16))
    assert(got(6L).mean_luma ==
      (java.lang.Long.parseLong(hex.take(4), 16) % 2560L) / 10.0)
  }

  // ------------------------------------------------- MJPEG-in-AVI video

  /** Minimal spec-valid AVI: RIFF('AVI ') [ LIST('hdrl')[avih zeros],
    * LIST('movi')[##dc frames] ] — the chunk grammar is all the walk
    * reads; stream headers are opaque to it.
    */
  private def buildAvi(frames: Seq[Array[Byte]]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    def le32(v: Int): Array[Byte] =
      Array((v & 255).toByte, ((v >> 8) & 255).toByte,
        ((v >> 16) & 255).toByte, ((v >> 24) & 255).toByte)
    def chunk(fourcc: String, data: Array[Byte]): Array[Byte] =
      fourcc.getBytes("US-ASCII") ++ le32(data.length) ++ data ++
        (if (data.length % 2 == 1) Array(0.toByte) else Array.empty[Byte])
    def list(kind: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", kind.getBytes("US-ASCII") ++ body)
    val hdrl = list("hdrl", chunk("avih", new Array[Byte](56)))
    val movi = list("movi",
      frames.map(f => chunk("00dc", f)).reduce(_ ++ _))
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    bos.write("RIFF".getBytes("US-ASCII"))
    bos.write(le32(body.length))
    bos.write(body)
    bos.toByteArray
  }

  private def grayJpeg(level: Int): Array[Byte] = {
    val img = new BufferedImage(32, 24, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 24; x <- 0 until 32)
      img.setRGB(x, y, (level << 16) | (level << 8) | level)
    encode(img, "jpg")
  }

  test("MJPEG AVI: real per-frame pixel decode through the image kernel") {
    import spark.implicits._
    val levels = Seq(40, 128, 220)
    val avi = buildAvi(levels.map(grayJpeg))
    // container walk alone: three frames found at the right offsets
    val frames = Multimodal.decodeAviFrames(avi)
    assert(frames.exists(_.size == 3), s"frames=$frames")
    val assets = Seq(
      Multimodal.Asset(2L, "video", avi, "s"),
      Multimodal.Asset(5L, "video", "plain text".getBytes("UTF-8"), "s"),
      Multimodal.Asset(3L, "image", avi, "s")) // wrong kind: excluded
      .toDS()
    val got = Multimodal.extractVideoPixels(assets).collect()
      .groupBy(_.asset_id)
    assert(got.keySet == Set(2L, 5L))
    val real = got(2L).sortBy(_.frame_idx)
    assert(real.length == 3 && real.forall(_.decoded))
    assert(real.forall(f => f.width == 32 && f.height == 24))
    // JPEG is lossy but a uniform frame decodes within a few levels
    levels.zip(real).foreach { case (l, f) =>
      assert(math.abs(f.mean_luma - l) <= 3.0, s"level $l got ${f.mean_luma}")
    }
    // the non-AVI payload takes the deterministic pseudo path
    assert(got(5L).forall(!_.decoded))
  }

  test("AVI walk refuses truncation; non-MJPEG frames degrade per-frame") {
    val avi = buildAvi(Seq(grayJpeg(100)))
    // chop mid-frame: the declared size now overruns the payload
    assert(Multimodal.decodeAviFrames(avi.take(avi.length - 8)).isEmpty)
    // a frame whose bytes no ImageIO reader claims (a fake codec):
    // container decodes, the frame itself falls to pseudo-stats
    import spark.implicits._
    val fake = buildAvi(Seq(Array.fill[Byte](64)(0x42)))
    val rows = Multimodal.extractVideoPixels(
      Seq(Multimodal.Asset(8L, "video", fake, "s")).toDS()).collect()
    assert(rows.length == 1 && !rows.head.decoded)
  }
}
