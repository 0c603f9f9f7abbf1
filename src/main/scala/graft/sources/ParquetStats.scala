package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.metadata.ColumnChunkMetaData
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.SparkSession

import scala.jdk.CollectionConverters._
import scala.language.existentials // parquet's Statistics[_ <: Comparable[_]]
import scala.util.control.NonFatal

/** Driver-side parquet FOOTER statistics — actual (pre-compression)
  * column bytes and exact INT64 min/max with NO Spark job and no
  * data-page reads.
  *
  * Why it exists: route decisions gated on Catalyst's
  * `stats.sizeInBytes` see COMPRESSED file bytes, and a duplication-
  * heavy corpus compresses 10-50× — the r10/r11 ADVICE blind spot
  * that let a "2 GB" corpus carry tens of GB of text into a
  * small-regime plan. Parquet footers record each column chunk's
  * `total_uncompressed_size` and exact min/max statistics; folding
  * them over the table's files costs milliseconds of driver I/O per
  * thousand files and closes the gap without adding a scan job to
  * the common path (the whole point of the small-regime tails and
  * the r12 shard-bounds path is fewer jobs).
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

  /** Top-level name:len:mtime listing signature of `dir` — the same
    * staleness contract as the served-model memos (C30/C31 sidecars):
    * any rewrite of a flat table layout changes it. None when the
    * path is missing or unreadable (callers must treat None as "no
    * memo, take the uncached route"). Top-level only: every table
    * layout these memos guard (single file, or a flat directory of
    * part files) keeps its data files as direct children.
    *
    * Deliberate staleness caveat (ADVICE r12): a file rewritten
    * in-place to the IDENTICAL byte length within one mtime tick
    * yields the same signature, so consumers ([[graft.Tables]]'s
    * schema memo, [[longColumnRange]]'s bounds memo, the served-model
    * sidecars) would serve the pre-rewrite metadata. This is the
    * listing-only contract's price and it is kept on purpose: a
    * content-derived component would put a footer read on EVERY
    * table read's driver path — the exact per-read cost the memos
    * exist to remove — to close a window that real table commits
    * (new part files, different sizes, atomic renames) never hit.
    * Writers that rewrite in place same-length within a tick (test
    * scratch dirs at worst) must touch the file or write a fresh
    * name to invalidate.
    */
  def listingSig(spark: SparkSession, dir: String): Option[String] = {
    try {
      val p = new Path(dir)
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      Some(fs.listStatus(p)
        .filterNot { s =>
          val n = s.getPath.getName
          n.startsWith("_") || n.startsWith(".")
        }
        .map(s => s"${s.getPath.getName}:${s.getLen}:${s.getModificationTime}")
        .sorted.mkString("|"))
    } catch { case NonFatal(_) => None }
  }

  /** Shared footer walker: fold `f` over every column chunk of every
    * parquet file under `dir` (recursive listing, `_`/`.` entries
    * skipped). `f` returns None to abort — the whole fold becomes
    * None (callers fall back to their scan-job path). None also on
    * unreadable listings/footers or past `maxFiles`.
    */
  private def foldFooters[A](spark: SparkSession, dir: String,
      maxFiles: Int)(zero: A)(
      f: (A, ColumnChunkMetaData) => Option[A]): Option[A] = {
    try {
      val conf = spark.sessionState.newHadoopConf()
      val root = new Path(dir)
      val fs = root.getFileSystem(conf)
      if (!fs.exists(root)) return None
      val it = fs.listFiles(root, true)
      var acc = zero
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
                f(acc, c) match {
                  case Some(next) => acc = next
                  case None       => return None
                }
              }
            }
          } finally reader.close()
        }
      }
      Some(acc)
    } catch { case NonFatal(_) => None }
  }

  // rowCount memo: (dir # listingSig) -> exact row total.
  // BOXED java.lang.Long like the sibling memos (r16 fix): with a
  // primitive Scala Long value type, a map MISS returned null which
  // unboxed to 0L, and the `hit != null` guard re-boxed it to a
  // non-null java.lang.Long(0) — so EVERY lookup "hit" with 0 rows
  // and rowCount always answered Some(0). Locally harmless (every
  // caller's gate correctly read "small"), but the q5 big-join gate
  // could never fire at scale.
  private val countMemo =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  /** Exact row count of the parquet table under `dir` from footer
    * record counts alone — no Spark job, no data pages; memoized per
    * [[listingSig]]. The r14 scale-adaptive join gate reads this
    * (rows are the right regime signal for JOIN strategy — byte
    * stats see compression, and the q5 gate wants "how many rows
    * will the sorts move"). None when the listing or a footer is
    * unreadable, or past `maxFiles` — callers take the safe default.
    */
  def rowCount(spark: SparkSession, dir: String,
      maxFiles: Int = 65536): Option[Long] = {
    val sig = listingSig(spark, dir).getOrElse(return None)
    val key = s"$dir#$sig"
    val hit = countMemo.get(key)
    if (hit != null) return Some(hit)
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
          try total += reader.getRecordCount
          finally reader.close()
        }
      }
      countMemo.put(key, total)
      Some(total)
    } catch { case NonFatal(_) => None }
  }

  // (dir # column # listingSig) -> Σ uncompressed bytes
  private val colBytesMemo = new java.util.concurrent.ConcurrentHashMap[
    String, java.lang.Long]()

  /** Σ total_uncompressed_size of `column` over every parquet file
    * under `dir` (recursive). None when the listing or any footer is
    * unreadable, or past `maxFiles` (callers must treat None as
    * "unknown — take the safe-at-scale route"). Memoized per
    * (dir, column, [[listingSig]]) like [[longColumnRange]] — the
    * clean-corpus gate re-reads it every invocation (r15), and a
    * footer walk per query is pure constant; a rewrite changes the
    * signature and re-reads.
    */
  def uncompressedColumnBytes(spark: SparkSession, dir: String,
      column: String, maxFiles: Int = 65536): Option[Long] = {
    val sig = listingSig(spark, dir).getOrElse(return None)
    val key = s"$dir#$column#$sig"
    val hit = colBytesMemo.get(key)
    if (hit != null) return Some(hit.longValue)
    val r = foldFooters(spark, dir, maxFiles)(0L) { (total, c) =>
      Some(if (c.getPath.toDotString == column)
        total + c.getTotalUncompressedSize
      else total)
    }
    r.foreach(v => colBytesMemo.put(key, java.lang.Long.valueOf(v)))
    r
  }

  // (lo, hi, seenNonNull) accumulator for longColumnRange
  private val rangeMemo = new java.util.concurrent.ConcurrentHashMap[
    String, (Long, Long)]()

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
    *
    * Results are memoized per (dir, column, [[listingSig]]) — repeat
    * pack/budget invocations over unchanged data skip the footer
    * walk entirely; a rewrite changes the signature and re-reads.
    */
  def longColumnRange(spark: SparkSession, dir: String,
      column: String, maxFiles: Int = 65536): Option[(Long, Long)] = {
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
    val sig = listingSig(spark, dir).getOrElse(return None)
    val key = s"$dir#$column#$sig"
    val hit = rangeMemo.get(key)
    if (hit != null) return Some(hit)
    val r = foldFooters(spark, dir, maxFiles)(
      (Long.MaxValue, Long.MinValue, false)) { case ((lo, hi, seen), c) =>
      if (c.getPath.toDotString != column) Some((lo, hi, seen))
      else if (c.getPrimitiveType.getPrimitiveTypeName !=
        PrimitiveTypeName.INT64) None
      else {
        val s = c.getStatistics
        if (s == null || s.isEmpty) None
        else if (!s.hasNonNullValue) Some((lo, hi, seen)) // all-null
        else {
          val mn = s.genericGetMin.asInstanceOf[java.lang.Long].longValue
          val mx = s.genericGetMax.asInstanceOf[java.lang.Long].longValue
          Some((math.min(lo, mn), math.max(hi, mx), true))
        }
      }
    }
    r match {
      case Some((lo, hi, true)) =>
        if (rangeMemo.size > 4096) rangeMemo.clear() // scratch churn cap
        rangeMemo.put(key, (lo, hi))
        Some((lo, hi))
      case _ => None
    }
  }
}
