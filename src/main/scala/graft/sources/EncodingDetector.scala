package graft.sources

import java.nio.charset.{CharsetDecoder, CodingErrorAction, StandardCharsets}
import java.nio.ByteBuffer

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Charset detection for CSV uploads (SURVEY.md §2.A1).
  *
  * The reference sniffs the first 2 MiB with charset_normalizer and
  * widens a plain-`ascii` verdict to `latin-1`
  * (datasette_upload_csvs/__init__.py:76,129-137). graft re-expresses
  * that as a driver-side sniff of the leading bytes — O(2 MiB) once,
  * independent of file size — after which the actual decode happens
  * distributed inside Spark's CSV reader via its `encoding` option.
  *
  * Detection ladder: BOM → strict UTF-8 validation → latin-1
  * fallback; all-ASCII also lands on latin-1 (superset, fewer decode
  * errors — the reference cites its issue #25 for the same choice).
  */
object EncodingDetector {

  /** Matches num_bytes_to_detect_with in the reference (__init__.py:76). */
  val DefaultSniffBytes: Int = 2048 * 1024

  val Utf8 = "UTF-8"
  val Latin1 = "ISO-8859-1"
  val Utf16LE = "UTF-16LE"
  val Utf16BE = "UTF-16BE"

  /** Detect the charset of a file readable through the Hadoop
    * FileSystem API (local, HDFS, S3A, …) — only the sniff window is
    * fetched, never the whole object.
    */
  def detect(spark: SparkSession, path: String,
      numBytes: Int = DefaultSniffBytes): String = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try {
      val buf = new Array[Byte](numBytes)
      var off = 0
      var n = 0
      while (off < numBytes && { n = in.read(buf, off, numBytes - off); n > 0 })
        off += n
      // A full window means the file continues past it — only then may
      // a trailing partial UTF-8 sequence be forgiven.
      detectBytes(java.util.Arrays.copyOf(buf, off), truncated = off == numBytes)
    } finally in.close()
  }

  def detectBytes(bytes: Array[Byte], truncated: Boolean = false): String = {
    if (bytes.length >= 3 && bytes(0) == 0xEF.toByte &&
      bytes(1) == 0xBB.toByte && bytes(2) == 0xBF.toByte) return Utf8
    if (bytes.length >= 2 && bytes(0) == 0xFF.toByte && bytes(1) == 0xFE.toByte)
      return Utf16LE
    if (bytes.length >= 2 && bytes(0) == 0xFE.toByte && bytes(1) == 0xFF.toByte)
      return Utf16BE
    if (isValidUtf8(bytes, truncated)) {
      // ascii → latin-1 widening, mirroring the reference.
      if (bytes.forall(b => (b & 0xFF) < 0x80)) Latin1 else Utf8
    } else Latin1
  }

  /** Strict UTF-8 validation; when the buffer was truncated by the
    * sniff window, tolerate a multi-byte sequence cut off at the end
    * (up to 3 trailing bytes).
    */
  private[sources] def isValidUtf8(bytes: Array[Byte],
      truncated: Boolean): Boolean = {
    val end = if (truncated) trimIncompleteTail(bytes) else bytes.length
    val dec: CharsetDecoder = StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(CodingErrorAction.REPORT)
      .onUnmappableCharacter(CodingErrorAction.REPORT)
    try { dec.decode(ByteBuffer.wrap(bytes, 0, end)); true }
    catch { case _: java.nio.charset.CharacterCodingException => false }
  }

  /** Index just before any UTF-8 sequence that starts within the last
    * 3 bytes but doesn't finish inside the buffer.
    */
  private def trimIncompleteTail(bytes: Array[Byte]): Int = {
    val len = bytes.length
    var i = math.max(0, len - 4)
    var cut = len
    while (i < len) {
      val b = bytes(i) & 0xFF
      val need =
        if (b >= 0xF0) 4 else if (b >= 0xE0) 3 else if (b >= 0xC0) 2 else 0
      if (need > 0 && i + need > len) { cut = math.min(cut, i); i = len }
      else i += math.max(1, need)
    }
    cut
  }
}
