package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Multimodal column plumbing (SURVEY.md §2.F).
  *
  * Media payloads are opaque `binary` columns with typed metadata.
  * The container has no image/audio codecs, so `fakeDecode` is a
  * clearly-marked deterministic stand-in (md5-of-bytes arithmetic)
  * for a real decoder — everything around it is the real article:
  * binary schema, per-partition batched decode via mapPartitions
  * (decoder state initialized once per partition, exactly where a
  * JNI codec handle would live), and explode-based frame sampling.
  * Swapping in a real codec changes only the body of `decodeOne`.
  */
object Multimodal {

  /** The documents table with text re-materialized as a binary
    * payload column (stand-in for image/audio bytes).
    */
  def withPayload(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents").select(
      col("doc_id"),
      to_binary(col("text"), lit("utf-8")).as("payload"))

  /** F1: opaque binary + typed metadata (size, portable checksum). */
  def meta(spark: SparkSession, dir: String): DataFrame =
    withPayload(spark, dir).select(
      col("doc_id"),
      length(col("payload")).as("n_bytes"),
      md5(col("payload")).as("checksum"))

  case class MediaFeatures(doc_id: Long, n_bytes: Int, width: Int,
      height: Int, channels: Int, n_frames: Int, brightness: Double)

  /** STUB DECODER — deterministic fake. A real build would replace
    * this body with e.g. a JNI image decode; the signature (bytes in,
    * features out) and everything upstream/downstream stay fixed.
    */
  private def decodeOne(md: MessageDigest, id: Long,
      bytes: Array[Byte]): MediaFeatures = {
    md.reset()
    val h = md.digest(bytes)
    def u(i: Int): Int = h(i) & 0xFF
    MediaFeatures(
      doc_id = id,
      n_bytes = bytes.length,
      width = 16 + u(0) % 320,
      height = 16 + u(1) % 320,
      channels = 1 + u(2) % 4,
      n_frames = 1 + u(3) % 8,
      brightness = u(4).toDouble / 255.0)
  }

  /** F2: batched decode through mapPartitions — one decoder instance
    * per partition, rows streamed through it.
    */
  def decode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    withPayload(spark, dir)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val md = MessageDigest.getInstance("MD5") // per-partition codec handle
        it.map { case (id, bytes) => decodeOne(md, id, bytes) }
      }
      .toDF()
  }

  /** F3: frame sampling — one row per (synthetic) frame with its byte
    * offset; explode keeps it distributed and shuffle-free.
    */
  def frames(spark: SparkSession, dir: String): DataFrame =
    decode(spark, dir)
      .select(col("doc_id"), col("n_bytes"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1)).as("frame_idx"))
      .select(
        col("doc_id"),
        col("frame_idx").cast("bigint").as("frame_idx"),
        (col("frame_idx").cast("bigint") *
          expr("n_bytes div n_frames").cast("bigint")).as("byte_offset"))

  /** F4: resize planning — aspect-preserving fit into a target box.
    * The geometry is real (what a thumbnail stage computes before
    * invoking a codec); only the pixel work is the stub's.
    */
  def resize(spark: SparkSession, dir: String, box: Int = 64): DataFrame =
    decode(spark, dir).select(
      col("doc_id"), col("width"), col("height"),
      least(lit(box.toDouble) / col("width").cast("double"),
        lit(box.toDouble) / col("height").cast("double")).as("scale"))
      .select(
        col("doc_id"), col("width"), col("height"),
        greatest(lit(1L),
          floor(col("width").cast("double") * col("scale")).cast("bigint"))
          .as("resized_w"),
        greatest(lit(1L),
          floor(col("height").cast("double") * col("scale")).cast("bigint"))
          .as("resized_h"))

  /** F5/H11: modality-partitioned media table — decode, route by
    * modality (multi-frame payloads are "video"), write
    * hive-partitioned, and read back with a partition filter that
    * prunes the image directories entirely (asserted in PlanSpec).
    * The write-side layout step of a real multimodal corpus store.
    */
  def partitionedMedia(spark: SparkSession, sfDir: String): DataFrame = {
    val db = CsvQueries.freshDb(spark, "mm_part", sfDir)
    val feats = decode(spark, sfDir)
      .withColumn("modality",
        when(col("n_frames") > 1, "video").otherwise("image"))
    db.writePartitioned(feats, "media", Seq("modality"))
    db.read("media")
      .filter(col("modality") === "video")
      .groupBy(col("channels"))
      .agg(count(lit(1)).as("n"),
        sum(col("n_bytes")).cast("bigint").as("total_bytes"))
  }

  /** F6: blob integrity screen — the gate a multimodal ingest runs
    * BEFORE spending decode CPU: sniff each payload's magic bytes,
    * dispatch the modality, and flag blobs whose declared type
    * disagrees with what the bytes actually say (truncated/corrupt
    * headers, mislabeled files). Fixture plants all four cases
    * deterministically by doc_id: PNG, JPEG, RIFF, and a TRUNCATED
    * PNG magic under a 'png' declaration (the corrupt row the screen
    * must catch → valid = false).
    *
    * Scale shape: a pure map — and the sniff hexes ONLY the sliced
    * 8-byte prefix (`hex(substring(payload, 1, 8))`), never the
    * payload: hexing a multi-MB video to read its first bytes would
    * double the row in memory. No shuffle, no UDF, codegen end to
    * end.
    */
  def integrity(spark: SparkSession, dir: String): DataFrame = {
    val m = pmod(col("doc_id"), lit(4))
    val body = col("payload") // the F1 stand-in bytes, one definition
    val tagged = when(m === 0,
        concat(unhex(lit("89504E470D0A1A0A")), body))
      .when(m === 1, concat(unhex(lit("FFD8FF")), body))
      .when(m === 2, concat(unhex(lit("52494646")), body))
      .otherwise(concat(unhex(lit("8950")), body)) // truncated PNG magic
    val declared = when(m === 1, lit("jpeg"))
      .when(m === 2, lit("riff")).otherwise(lit("png"))
    val head = hex(substring(col("payload"), 1, 8))
    withPayload(spark, dir)
      .select(col("doc_id"), tagged.as("payload"),
        declared.as("declared"))
      .select(col("doc_id"), col("declared"),
        when(head === "89504E470D0A1A0A", "png")
          .when(substring(head, 1, 6) === "FFD8FF", "jpeg")
          .when(substring(head, 1, 8) === "52494646", "riff")
          .otherwise("unknown").as("detected"),
        length(col("payload")).cast("long").as("n_bytes"))
      .withColumn("valid", col("declared") === col("detected"))
  }

  val oracles: Map[String, String] = Map(
    "mm_integrity" ->
      """WITH p AS (SELECT doc_id,
        |  CASE CAST(doc_id % 4 AS INTEGER)
        |    WHEN 0 THEN '\x89PNG\x0D\x0A\x1A\x0A'::BLOB || encode(text)
        |    WHEN 1 THEN '\xFF\xD8\xFF'::BLOB || encode(text)
        |    WHEN 2 THEN 'RIFF'::BLOB || encode(text)
        |    ELSE '\x89P'::BLOB || encode(text) END AS payload,
        |  CASE CAST(doc_id % 4 AS INTEGER) WHEN 1 THEN 'jpeg'
        |    WHEN 2 THEN 'riff' ELSE 'png' END AS declared
        |  FROM documents),
        |d AS (SELECT doc_id, declared,
        |  CASE WHEN substring(hex(payload), 1, 16) = '89504E470D0A1A0A'
        |         THEN 'png'
        |       WHEN substring(hex(payload), 1, 6) = 'FFD8FF' THEN 'jpeg'
        |       WHEN substring(hex(payload), 1, 8) = '52494646' THEN 'riff'
        |       ELSE 'unknown' END AS detected,
        |  octet_length(payload) AS n_bytes
        |  FROM p)
        |SELECT doc_id, declared, detected, n_bytes,
        |  declared = detected AS valid FROM d""".stripMargin,
    "mm_partitioned" ->
      """WITH m AS (SELECT doc_id,
        |    1 + ('0x'||substr(md5(text), 5, 2))::INT % 4 AS channels,
        |    1 + ('0x'||substr(md5(text), 7, 2))::INT % 8 AS nf,
        |    octet_length(encode(text)) AS nb
        |  FROM documents)
        |SELECT channels, COUNT(*) AS n, CAST(SUM(nb) AS BIGINT) AS total_bytes
        |FROM m WHERE nf > 1 GROUP BY channels""".stripMargin,
    "mm_resize" ->
      """WITH m AS (SELECT doc_id,
        |    16 + ('0x'||substr(md5(text), 1, 2))::INT % 320 AS width,
        |    16 + ('0x'||substr(md5(text), 3, 2))::INT % 320 AS height
        |  FROM documents),
        |s AS (SELECT doc_id, width, height,
        |    LEAST(64.0 / CAST(width AS DOUBLE),
        |          64.0 / CAST(height AS DOUBLE)) AS scale
        |  FROM m)
        |SELECT doc_id, width, height,
        |  GREATEST(1, CAST(FLOOR(CAST(width AS DOUBLE) * scale) AS BIGINT))
        |    AS resized_w,
        |  GREATEST(1, CAST(FLOOR(CAST(height AS DOUBLE) * scale) AS BIGINT))
        |    AS resized_h
        |FROM s""".stripMargin,
    "mm_meta" ->
      """SELECT doc_id, octet_length(encode(text)) AS n_bytes,
        |  md5(text) AS checksum
        |FROM documents""".stripMargin,
    "mm_decode" ->
      """WITH m AS (SELECT doc_id, md5(text) h,
        |    octet_length(encode(text)) nb FROM documents)
        |SELECT doc_id, nb AS n_bytes,
        |  16 + ('0x'||substr(h, 1, 2))::INT % 320 AS width,
        |  16 + ('0x'||substr(h, 3, 2))::INT % 320 AS height,
        |  1 + ('0x'||substr(h, 5, 2))::INT % 4 AS channels,
        |  1 + ('0x'||substr(h, 7, 2))::INT % 8 AS n_frames,
        |  ('0x'||substr(h, 9, 2))::INT / 255.0 AS brightness
        |FROM m""".stripMargin,
    "mm_frames" ->
      """WITH m AS (SELECT doc_id,
        |    octet_length(encode(text)) nb,
        |    1 + ('0x'||substr(md5(text), 7, 2))::INT % 8 nf
        |  FROM documents)
        |SELECT doc_id, CAST(unnest(range(0, nf)) AS BIGINT) AS frame_idx,
        |  CAST(unnest(range(0, nf)) * (nb // nf) AS BIGINT) AS byte_offset
        |FROM m""".stripMargin
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_meta" -> ((s, d) => meta(s, d)),
    "mm_integrity" -> ((s, d) => integrity(s, d)),
    "mm_partitioned" -> (partitionedMedia _),
    "mm_resize" -> ((s, d) => resize(s, d)),
    "mm_decode" -> ((s, d) => decode(s, d)),
    "mm_frames" -> ((s, d) => frames(s, d))
  )
}
