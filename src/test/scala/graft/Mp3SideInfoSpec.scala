package graft

import graft.operators.Multimodal

/** Golden tests for the Layer III side-info census: frames are packed
  * by an INDEPENDENT bit writer in this spec (MSB-first, field by
  * field from ISO 11172-3 §2.4.1.7), so a parser bug and a packer bug
  * would have to agree bit-for-bit to pass.
  */
class Mp3SideInfoSpec extends SparkSpec {

  /** MSB-first bit packer — the spec-side inverse of the parser. */
  private final class BitWriter {
    private val buf = scala.collection.mutable.ArrayBuffer[Byte]()
    private var cur = 0
    private var nbits = 0
    def put(v: Int, n: Int): Unit = {
      var k = n - 1
      while (k >= 0) {
        cur = (cur << 1) | ((v >>> k) & 1)
        nbits += 1
        if (nbits == 8) { buf += cur.toByte; cur = 0; nbits = 0 }
        k -= 1
      }
    }
    def bytes: Array[Byte] = {
      require(nbits == 0, s"unaligned: $nbits bits pending")
      buf.toArray
    }
  }

  // MPEG1 Layer III, 128 kbps, 44.1 kHz, mono, no CRC:
  // frameLen = 144*128000/44100 = 417, side info 17 B, main data 396 B
  private val FrameLen = 417
  private val MainBytes = FrameLen - 4 - 17

  private case class Granule(p23: Int, bigv: Int, gg: Int, sfc: Int,
      shortBlock: Boolean, blockType: Int = 2)

  private def packFrame(mdb: Int, grs: Seq[Granule]): Array[Byte] = {
    val w = new BitWriter
    w.put(mdb, 9)
    w.put(0, 5) // private_bits (mono)
    w.put(0, 4) // scfsi ch0
    grs.foreach { g =>
      w.put(g.p23, 12)
      w.put(g.bigv, 9)
      w.put(g.gg, 8)
      w.put(g.sfc, 4)
      if (g.shortBlock) {
        w.put(1, 1)           // window_switching_flag
        w.put(g.blockType, 2) // block_type
        w.put(0, 1)           // mixed_block_flag
        w.put(7, 5); w.put(7, 5)           // table_select ×2
        w.put(1, 3); w.put(2, 3); w.put(3, 3) // subblock_gain ×3
      } else {
        w.put(0, 1)
        w.put(5, 5); w.put(5, 5); w.put(5, 5) // table_select ×3
        w.put(6, 4) // region0_count
        w.put(3, 3) // region1_count
      }
      w.put(0, 1) // preflag
      w.put(1, 1) // scalefac_scale
      w.put(0, 1) // count1table_select
    }
    val side = w.bytes
    assert(side.length == 17)
    val frame = new Array[Byte](FrameLen)
    frame(0) = 0xFF.toByte
    frame(1) = 0xFB.toByte // MPEG1, Layer III, no CRC
    frame(2) = 0x90.toByte // 128 kbps, 44.1 kHz, no padding
    frame(3) = 0xC0.toByte // mono
    System.arraycopy(side, 0, frame, 4, 17)
    frame
  }

  test("two-frame stream: counts, part2_3 sum, short blocks, reservoir ok") {
    val f1 = packFrame(0, Seq(
      Granule(250, 100, 210, 5, shortBlock = false),
      Granule(300, 50, 180, 3, shortBlock = true)))
    val f2 = packFrame(100, Seq( // 100 <= 396 carried by frame 1
      Granule(111, 288, 10, 0, shortBlock = false),
      Granule(222, 0, 255, 15, shortBlock = false)))
    val got = Multimodal.parseMp3SideInfo(f1 ++ f2)
    assert(got.contains((2L, 4L, 883L, 100, 1L, true)))
  }

  test("reservoir violation: frame 2 reaches past frame 1's main data") {
    val f1 = packFrame(0, Seq(
      Granule(10, 1, 1, 1, shortBlock = false),
      Granule(10, 1, 1, 1, shortBlock = false)))
    val f2 = packFrame(511, Seq( // 511 > 396 available
      Granule(10, 1, 1, 1, shortBlock = false),
      Granule(10, 1, 1, 1, shortBlock = false)))
    val got = Multimodal.parseMp3SideInfo(f1 ++ f2)
    assert(got.isDefined && !got.get._6)
    assert(got.get._1 == 2L) // still structurally decodable
  }

  test("first frame with nonzero main_data_begin is a reservoir violation") {
    val f1 = packFrame(1, Seq(
      Granule(10, 1, 1, 1, shortBlock = false),
      Granule(10, 1, 1, 1, shortBlock = false)))
    val got = Multimodal.parseMp3SideInfo(f1)
    assert(got.isDefined && !got.get._6)
  }

  test("reserved block_type 0 under window switching quarantines") {
    val f = packFrame(0, Seq(
      Granule(10, 1, 1, 1, shortBlock = true, blockType = 0),
      Granule(10, 1, 1, 1, shortBlock = false)))
    assert(Multimodal.parseMp3SideInfo(f)
      .contains((-1L, -1L, -1L, -1, -1L, false)))
  }

  test("truncated side info quarantines; non-MPEG bytes fall through") {
    val f = packFrame(0, Seq(
      Granule(10, 1, 1, 1, shortBlock = false),
      Granule(10, 1, 1, 1, shortBlock = false)))
    assert(Multimodal.parseMp3SideInfo(f.take(12))
      .contains((-1L, -1L, -1L, -1, -1L, false)))
    assert(Multimodal.parseMp3SideInfo("plain text".getBytes("UTF-8")).isEmpty)
  }

  test("ID3v2 preamble is skipped before the first frame") {
    val f = packFrame(0, Seq(
      Granule(42, 1, 1, 1, shortBlock = false),
      Granule(58, 1, 1, 1, shortBlock = false)))
    val id3 = Array[Byte]('I', 'D', '3', 4, 0, 0, 0, 0, 0, 3, 1, 2, 3)
    val got = Multimodal.parseMp3SideInfo(id3 ++ f)
    assert(got.contains((1L, 2L, 100L, 0, 0L, true)))
  }
}
