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

  /** F7 (r14): perceptual-hash near-duplicate detection — the image
    * dedup every multimodal training pipeline runs (screenshots,
    * re-encodes, and thumbnails share pixels but never bytes, so C2's
    * checksum dedup misses them). The real recipe is dHash (Krawetz):
    * downsample to a 9×8 grayscale grid, emit one bit per horizontal
    * gradient (p(r,c) < p(r,c+1)), and call images near-duplicate
    * when the 64-bit hashes sit within a small Hamming distance.
    *
    * Stub boundary, deliberately DIFFERENT from [[decodeOne]]'s
    * md5 arithmetic: pHash's entire point is LOCALITY (similar
    * pixels ⇒ nearby hashes), which an avalanche hash destroys, so
    * the pixel stand-in samples the payload's own code points on the
    * 9×8 grid (position (r·9+c) mod n). A one-character edit
    * perturbs at most a couple of grid cells — exactly the
    * robustness a real decoded-pixel dHash has, spec-pinned. A real
    * build swaps the sampling expression for decoded grayscale; the
    * hash layout, banding, and verify are unchanged.
    *
    * Scale shape: the hash is one codegen map pass (128 substring
    * reads, no shuffle); candidate pairs come from 16-bit BAND
    * buckets (Hamming ≤ 3 over four bands ⇒ at least one band equal,
    * the pigeonhole that makes the search exact — no all-pairs scan
    * anywhere); each bucket carries (id, hash) structs so the verify
    * is a bit_count on the exploded pair, no join back. Hot buckets
    * cap at `maxBucket` (the C3/C4 `maxOcc` discipline — a capped
    * bucket is a near-constant corpus artifact, logged by size here
    * as bucket overflow means the 16-bit band is degenerate).
    * The hash lives in two 32-bit halves (lo = grid rows 0–3) —
    * BIGINT-safe in both engines (no sign games at bit 63).
    */
  def phashNearDup(spark: SparkSession, dir: String,
      maxHamming: Int = 3, maxBucket: Int = 1000): DataFrame = {
    val d = Tables(spark, dir, "documents")
      .filter(col("text").isNotNull && length(col("text")) >= 1)
    // native one-pass grid hash (H2 discipline): the compositional
    // ascii(substring) form paid an O(position) UTF-8 seek per pixel
    // — 128 seeks/row WAS the F7 scan stage (10× isolated 1.63 s;
    // the expression decodes ≤72 code points once)
    val h2 = graft.functions.GraftFunctions.dhash64(col("text"))
    val hashed = d.select(col("doc_id"), h2.as("hh"))
      .select(col("doc_id"),
        col("hh").getItem(0).as("h_lo"), col("hh").getItem(1).as("h_hi"))
    val bands = array(
      struct(lit(0).as("band"), (col("h_lo") % 65536).as("v")),
      struct(lit(1).as("band"), shiftright(col("h_lo"), 16).as("v")),
      struct(lit(2).as("band"), (col("h_hi") % 65536).as("v")),
      struct(lit(3).as("band"), shiftright(col("h_hi"), 16).as("v")))
    val members = col("ids")
    val pairsOf = flatten(transform(members, (x, i) =>
      transform(slice(members, i + 2, size(members)),
        y => struct(x.as("a"), y.as("b")))))
    hashed
      .select(col("doc_id"), col("h_lo"), col("h_hi"),
        explode(bands).as("bv"))
      .groupBy(col("bv.band"), col("bv.v"))
      .agg(sort_array(collect_set(
        struct(col("doc_id"), col("h_lo"), col("h_hi")))).as("ids"))
      .filter(size(members) >= 2 && size(members) <= maxBucket)
      .select(explode(pairsOf).as("p"))
      .select(col("p.a.doc_id").as("doc_id_a"),
        col("p.b.doc_id").as("doc_id_b"),
        (bit_count(col("p.a.h_lo").bitwiseXOR(col("p.b.h_lo"))) +
          bit_count(col("p.a.h_hi").bitwiseXOR(col("p.b.h_hi"))))
          .cast("int").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  val oracles: Map[String, String] = Map(
    // F7: identical grid sampling, bit packing (OR-fold over two
    // 32-bit halves), 16-bit banding, and bit_count verify — pairs
    // and Hamming distances integer-exact cross-engine.
    "mm_phash_neardup" ->
      """WITH h AS (SELECT doc_id,
        |  list_reduce([CASE WHEN
        |      ascii(substr(text, 1 + (((i//8)*9 + (i%8)) % len(text)), 1))
        |    < ascii(substr(text, 1 + (((i//8)*9 + (i%8) + 1) % len(text)), 1))
        |    THEN 1::BIGINT << CAST(((i//8) % 4) * 8 + (i%8) AS INT)
        |    ELSE 0::BIGINT END for i in range(0, 32)],
        |    (x, y) -> x | y) AS h_lo,
        |  list_reduce([CASE WHEN
        |      ascii(substr(text, 1 + (((i//8)*9 + (i%8)) % len(text)), 1))
        |    < ascii(substr(text, 1 + (((i//8)*9 + (i%8) + 1) % len(text)), 1))
        |    THEN 1::BIGINT << CAST(((i//8) % 4) * 8 + (i%8) AS INT)
        |    ELSE 0::BIGINT END for i in range(32, 64)],
        |    (x, y) -> x | y) AS h_hi
        |  FROM documents WHERE text IS NOT NULL AND len(text) >= 1),
        |b0 AS (SELECT doc_id, h_lo, h_hi,
        |    unnest([h_lo % 65536, h_lo // 65536,
        |            h_hi % 65536, h_hi // 65536]) AS v,
        |    unnest([0, 1, 2, 3]) AS band
        |  FROM h),
        |b AS (SELECT * FROM b0
        |  QUALIFY COUNT(*) OVER (PARTITION BY band, v) <= 1000),
        |p AS (SELECT DISTINCT
        |    LEAST(x.doc_id, y.doc_id) AS doc_id_a,
        |    GREATEST(x.doc_id, y.doc_id) AS doc_id_b,
        |    CAST(bit_count(xor(x.h_lo, y.h_lo))
        |       + bit_count(xor(x.h_hi, y.h_hi)) AS INTEGER) AS hamming
        |  FROM b x JOIN b y
        |    ON x.band = y.band AND x.v = y.v AND x.doc_id < y.doc_id)
        |SELECT doc_id_a, doc_id_b, hamming FROM p
        |WHERE hamming <= 3""".stripMargin,
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
    "mm_phash_neardup" -> ((s, d) => phashNearDup(s, d)),
    "mm_integrity" -> ((s, d) => integrity(s, d)),
    "mm_partitioned" -> (partitionedMedia _),
    "mm_resize" -> ((s, d) => resize(s, d)),
    "mm_decode" -> ((s, d) => decode(s, d)),
    "mm_frames" -> ((s, d) => frames(s, d))
  )
}
