package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.SparkSession

import scala.jdk.CollectionConverters._
import scala.util.control.NonFatal

/** Driver-side parquet FOOTER statistics — actual (pre-compression)
  * column bytes with NO Spark job and no data-page reads.
  *
  * Why it exists: route decisions gated on Catalyst's
  * `stats.sizeInBytes` see COMPRESSED file bytes, and a duplication-
  * heavy corpus compresses 10-50× — the r10/r11 ADVICE blind spot
  * that let a "2 GB" corpus carry tens of GB of text into a
  * small-regime plan. Parquet footers record each column chunk's
  * `total_uncompressed_size`; summing them over the table's files
  * costs milliseconds of driver I/O per thousand files and closes
  * the compression-ratio gap without adding a scan job to the common
  * path (the whole point of the small-regime tails is fewer jobs).
  *
  * Caveat (documented, acceptable): `total_uncompressed_size` is
  * post-ENCODING — dictionary-encoded exact repeats still look
  * small. Exact duplicates are removed by the cheap exact-dedup
  * stage before any candidate join, and NEAR-identical documents
  * (the actual blowup source) are distinct strings that dictionary
  * encoding cannot collapse, so the number this returns tracks the
  * bytes the candidate stages will really process.
  */
object ParquetStats {

  /** Σ total_uncompressed_size of `column` over every parquet file
    * under `dir` (recursive). None when the listing or any footer is
    * unreadable, or past `maxFiles` (callers must treat None as
    * "unknown — take the safe-at-scale route").
    */
  def uncompressedColumnBytes(spark: SparkSession, dir: String,
      column: String, maxFiles: Int = 65536): Option[Long] = {
    try {
      val conf = spark.sessionState.newHadoopConf()
      val root = new Path(dir)
      val fs = root.getFileSystem(conf)
      if (!fs.exists(root)) return None
      val it = fs.listFiles(root, true)
      var total = 0L
      var files = 0
      while (it.hasNext) {
        val st = it.next()
        val name = st.getPath.getName
        if (st.isFile && st.getLen > 0 &&
            !name.startsWith("_") && !name.startsWith(".")) {
          files += 1
          if (files > maxFiles) return None
          val reader =
            ParquetFileReader.open(HadoopInputFile.fromStatus(st, conf))
          try {
            reader.getFooter.getBlocks.asScala.foreach { b =>
              b.getColumns.asScala.foreach { c =>
                if (c.getPath.toDotString == column)
                  total += c.getTotalUncompressedSize
              }
            }
          } finally reader.close()
        }
      }
      Some(total)
    } catch { case NonFatal(_) => None }
  }

  /** Exact global (min, max) of an INT64 `column` from parquet FOOTER
    * statistics — no Spark job, no data pages. Parquet writers record
    * per-chunk min/max for integer columns exactly, so folding them
    * over every chunk reproduces what a full `agg(min, max)` scan
    * would compute — the pre-pass [[graft.operators.Ranks.idRangeShard]]
    * otherwise pays with an entire corpus-scale column read. Returns
    * None (callers fall back to the scan) when any chunk lacks usable
    * statistics, the column isn't physically INT64, no file carries a
    * non-null value, or the listing is unreadable — None is always
    * safe, a Some is always exact.
    */
  def longColumnRange(spark: SparkSession, dir: String,
      column: String, maxFiles: Int = 65536): Option[(Long, Long)] = {
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
    try {
      val conf = spark.sessionState.newHadoopConf()
      val root = new Path(dir)
      val fs = root.getFileSystem(conf)
      if (!fs.exists(root)) return None
      val it = fs.listFiles(root, true)
      var lo = Long.MaxValue
      var hi = Long.MinValue
      var seen = false
      var files = 0
      while (it.hasNext) {
        val st = it.next()
        val name = st.getPath.getName
        if (st.isFile && st.getLen > 0 &&
            !name.startsWith("_") && !name.startsWith(".")) {
          files += 1
          if (files > maxFiles) return None
          val reader =
            ParquetFileReader.open(HadoopInputFile.fromStatus(st, conf))
          try {
            reader.getFooter.getBlocks.asScala.foreach { b =>
              b.getColumns.asScala.foreach { c =>
                if (c.getPath.toDotString == column) {
                  if (c.getPrimitiveType.getPrimitiveTypeName !=
                      PrimitiveTypeName.INT64) return None
                  val s = c.getStatistics
                  if (s == null || s.isEmpty) return None
                  if (s.hasNonNullValue) {
                    val mn = s.genericGetMin.asInstanceOf[java.lang.Long]
                    val mx = s.genericGetMax.asInstanceOf[java.lang.Long]
                    if (mn < lo) lo = mn
                    if (mx > hi) hi = mx
                    seen = true
                  } // all-null chunk: contributes nothing, like the agg
                }
              }
            }
          } finally reader.close()
        }
      }
      if (seen) Some((lo, hi)) else None
    } catch { case NonFatal(_) => None }
  }
}
