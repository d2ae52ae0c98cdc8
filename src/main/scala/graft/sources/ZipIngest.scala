package graft.sources

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream

/** ZIP decode + member scan (SURVEY.md §2.1 S3): open an in-memory
  * archive, linear-scan entries for a named member, hard error when
  * absent — the reference's `findPrismMdb` (`fetch.go:82-101,278-285`,
  * error string "no prism.mdb found in prism.zip").
  *
  * A single archive is inherently driver-side work; the distributable
  * step is what comes after (the extracted member feeds a Spark source).
  */
object ZipIngest {

  /** Return the named member's bytes, or throw with the reference's
    * error shape.
    */
  def extractMember(zipBytes: Array[Byte], memberName: String,
      archiveName: String = "archive.zip"): Array[Byte] = {
    val zin = new ZipInputStream(new ByteArrayInputStream(zipBytes))
    try {
      var entry = zin.getNextEntry
      while (entry != null) {
        if (entry.getName == memberName) {
          val out = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](8192)
          var n = zin.read(buf)
          while (n >= 0) { out.write(buf, 0, n); n = zin.read(buf) }
          return out.toByteArray
        }
        entry = zin.getNextEntry
      }
      throw new java.util.NoSuchElementException(
        s"no $memberName found in $archiveName")
    } finally zin.close()
  }

  /** List member names (the linear scan itself). */
  def listMembers(zipBytes: Array[Byte]): Seq[String] = {
    val zin = new ZipInputStream(new ByteArrayInputStream(zipBytes))
    try {
      Iterator.continually(zin.getNextEntry).takeWhile(_ != null)
        .map(_.getName).toList
    } finally zin.close()
  }
}
