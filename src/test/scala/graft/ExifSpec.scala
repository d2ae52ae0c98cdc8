package graft

import java.io.ByteArrayOutputStream

import graft.operators.Multimodal

/** Golden tests for the EXIF/TIFF IFD walk: APP1 segments are packed
  * byte-by-byte in this spec from the TIFF layout rules (not by the
  * parser's own helpers), in BOTH endiannesses, with inline and
  * offset-stored values.
  */
class ExifSpec extends SparkSpec {

  private def jpegWithApp1(tiff: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(0xFF); out.write(0xD8) // SOI
    val body = "Exif".getBytes("US-ASCII") ++ Array[Byte](0, 0) ++ tiff
    out.write(0xFF); out.write(0xE1) // APP1
    val len = body.length + 2
    out.write(len >> 8); out.write(len & 0xFF)
    out.write(body)
    out.write(0xFF); out.write(0xD9) // EOI
    out.toByteArray
  }

  /** Little-endian TIFF with IFD0 {Orientation=6, Make="Kodak DCS460"
    * (offset-stored), ExifIFD→{PixelX=4096 LONG, PixelY=3072 SHORT}}.
    */
  private def tiffLE: Array[Byte] = {
    val b = scala.collection.mutable.ArrayBuffer[Byte]()
    def w16(v: Int): Unit = { b += (v & 0xFF).toByte; b += ((v >> 8) & 0xFF).toByte }
    def w32(v: Long): Unit = { w16((v & 0xFFFF).toInt); w16(((v >> 16) & 0xFFFF).toInt) }
    b += 'I'; b += 'I'; w16(42); w32(8) // header, IFD0 at 8
    // IFD0: 3 entries, then next-IFD ptr. Entries start at 10.
    w16(3)
    // Orientation: tag 0x0112, SHORT, count 1, value 6 inline
    w16(0x0112); w16(3); w32(1); w16(6); w16(0)
    // Make: tag 0x010F, ASCII, count 13, offset 50
    w16(0x010F); w16(2); w32(13); w32(50)
    // ExifIFD: tag 0x8769, LONG, count 1, offset 64
    w16(0x8769); w16(4); w32(1); w32(64)
    w32(0) // next IFD
    // pad to 50
    while (b.length < 50) b += 0
    b ++= "Kodak DCS460".getBytes("US-ASCII"); b += 0 // 13 bytes w/ NUL
    while (b.length < 64) b += 0
    // sub-IFD: 2 entries
    w16(2)
    w16(0xA002); w16(4); w32(1); w32(4096) // PixelX LONG
    w16(0xA003); w16(3); w32(1); w16(3072); w16(0) // PixelY SHORT
    w32(0)
    b.toArray
  }

  /** Big-endian TIFF with Orientation=8 and a ≤4-byte inline Make. */
  private def tiffBE: Array[Byte] = {
    val b = scala.collection.mutable.ArrayBuffer[Byte]()
    def w16(v: Int): Unit = { b += ((v >> 8) & 0xFF).toByte; b += (v & 0xFF).toByte }
    def w32(v: Long): Unit = { w16(((v >> 16) & 0xFFFF).toInt); w16((v & 0xFFFF).toInt) }
    b += 'M'; b += 'M'; w16(42); w32(8)
    w16(2)
    w16(0x0112); w16(3); w32(1); w16(8); w16(0)
    // Make "RED" (4 bytes with NUL) inline
    w16(0x010F); w16(2); w32(4)
    b ++= "RED".getBytes("US-ASCII"); b += 0
    w32(0)
    b.toArray
  }

  test("little-endian: orientation, offset-stored make, sub-IFD dims") {
    val got = Multimodal.parseExif(jpegWithApp1(tiffLE))
    assert(got.contains((6, "Kodak DCS460", 4096, 3072)))
  }

  test("big-endian: inline make, no sub-IFD leaves dims at -1") {
    val got = Multimodal.parseExif(jpegWithApp1(tiffBE))
    assert(got.contains((8, "RED", -1, -1)))
  }

  test("truncated IFD quarantines; JPEG without APP1 and non-JPEG fall through") {
    val le = tiffLE
    // cut the TIFF body mid-IFD: entry count says 3 but bytes end early
    val cut = jpegWithApp1(le.take(20))
    assert(Multimodal.parseExif(cut).contains((-1, null, -1, -1)))
    val plain = Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xD9.toByte)
    assert(Multimodal.parseExif(plain).isEmpty)
    assert(Multimodal.parseExif("text".getBytes("UTF-8")).isEmpty)
  }

  test("make offset past the segment is ignored, not read out of bounds") {
    val b = tiffLE
    // corrupt the Make offset (bytes 30..33 little-endian of entry 2's
    // value field: IFD0 entry 2 starts at 10+12=22; value field at 30)
    b(30) = 0xFF.toByte; b(31) = 0x7F.toByte
    val got = Multimodal.parseExif(jpegWithApp1(b))
    assert(got.contains((6, null, 4096, 3072)))
  }
}
