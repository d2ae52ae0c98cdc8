package graft

import java.io.ByteArrayOutputStream

import graft.operators.Multimodal

/** Golden tests for the ID3v2 tag walk: tags are packed byte-by-byte
  * from the published layout (not via the parser's helpers), v2.3 and
  * v2.4, all three text encodings.
  */
class Id3Spec extends SparkSpec {

  private def syncsafe(v: Int): Array[Byte] =
    Array(((v >> 21) & 0x7F).toByte, ((v >> 14) & 0x7F).toByte,
      ((v >> 7) & 0x7F).toByte, (v & 0x7F).toByte)

  private def frame23(id: String, body: Array[Byte]): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    o.write(id.getBytes("US-ASCII"))
    val n = body.length
    o.write(n >> 24); o.write((n >> 16) & 0xFF)
    o.write((n >> 8) & 0xFF); o.write(n & 0xFF)
    o.write(0); o.write(0)
    o.write(body)
    o.toByteArray
  }

  private def frame24(id: String, body: Array[Byte]): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    o.write(id.getBytes("US-ASCII"))
    o.write(syncsafe(body.length))
    o.write(0); o.write(0)
    o.write(body)
    o.toByteArray
  }

  private def tag(ver: Int, frames: Array[Byte], pad: Int = 8): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    o.write("ID3".getBytes("US-ASCII"))
    o.write(ver); o.write(0); o.write(0) // version, revision, flags
    o.write(syncsafe(frames.length + pad))
    o.write(frames)
    o.write(new Array[Byte](pad)) // padding
    o.toByteArray
  }

  test("v2.3: latin-1 title, UTF-16 BOM artist, frame count, padding stop") {
    val t = frame23("TIT2", Array(0.toByte) ++ "Waiata".getBytes("ISO-8859-1"))
    val a = frame23("TPE1",
      Array(1.toByte) ++ "Ngā Manu".getBytes("UTF-16")) // BOM included
    val x = frame23("TALB", Array(0.toByte) ++ "Album".getBytes("ISO-8859-1"))
    val got = Multimodal.parseId3Tags(tag(3, t ++ a ++ x))
    assert(got.contains((3, 3L, "Waiata", "Ngā Manu")))
  }

  test("v2.4: syncsafe frame sizes, UTF-8 text, NUL terminator stripped") {
    val t = frame24("TIT2",
      Array(3.toByte) ++ "kupu\u0000extra".getBytes("UTF-8"))
    val got = Multimodal.parseId3Tags(tag(4, t))
    assert(got.contains((4, 1L, "kupu", null)))
  }

  test("v2.4 rejects non-syncsafe frame size; frame past tag quarantines") {
    val bad = frame23("TIT2", Array(0.toByte) ++ "x".getBytes) // plain size
    // as a v2.4 tag, a frame whose size bytes are plain BE with high
    // bits is refused only when a size byte >= 0x80 — craft one
    val hi = bad.clone(); hi(4) = 0x81.toByte
    assert(Multimodal.parseId3Tags(tag(4, hi)).contains((4, -1L, null, null)))
    // v2.3 frame claiming to run past the tag end
    val over = frame23("TIT2", Array(0.toByte) ++ "x".getBytes)
    over(7) = 120.toByte // size 120 > remaining
    assert(Multimodal.parseId3Tags(tag(3, over, pad = 0))
      .contains((3, -1L, null, null)))
  }

  test("v2.2 and unsynchronised tags quarantine; plain text falls through") {
    val t = frame23("TIT2", Array(0.toByte) ++ "x".getBytes)
    assert(Multimodal.parseId3Tags(tag(2, t)).contains((2, -1L, null, null)))
    val unsync = tag(3, t)
    unsync(5) = 0x80.toByte
    assert(Multimodal.parseId3Tags(unsync).contains((3, -1L, null, null)))
    assert(Multimodal.parseId3Tags("no tag here".getBytes("UTF-8")).isEmpty)
  }
}
