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
    * Scale shape: the hash is one native codegen map pass
    * ([[graft.functions.expressions.DHash64]], no shuffle);
    * candidate pairs come from 16-bit BAND buckets (Hamming ≤ 3 over
    * four bands ⇒ at least one band equal, the pigeonhole that makes
    * the search exact — no all-pairs scan anywhere), generated by
    * the C20a count-gated self-join in [[phashPairsOf]]: over-cap
    * buckets (`maxBucket`, the C3/C4 `maxOcc` discipline — bucket
    * overflow means the 16-bit band is degenerate, near-blank
    * thumbnails) are dropped BEFORE any pair materializes, and the
    * verify is a bit_count on the joined row. [[phashCapAudit]]
    * surfaces what the cap dropped — a capped band is a corpus
    * artifact worth knowing about, never a silent absence.
    * The hash lives in two 32-bit halves (lo = grid rows 0–3) —
    * BIGINT-safe in both engines (no sign games at bit 63).
    */
  def phashNearDup(spark: SparkSession, dir: String,
      maxHamming: Int = 3, maxBucket: Int = 1000): DataFrame =
    phashPairsOf(phashHashesOf(Tables(spark, dir, "documents")),
      maxHamming, maxBucket)

  /** The (doc_id, h_lo, h_hi) dHash projection of a (doc_id, text)
    * frame — one native codegen map pass, shared by the inline
    * query, the cap audit, the index build, and the ingest screen.
    * (The compositional ascii(substring) form this replaced paid an
    * O(position) UTF-8 seek per pixel — 128 seeks/row WAS the F7
    * scan stage, 10× isolated 1.63 s; the expression decodes ≤72
    * code points once.)
    */
  private def phashHashesOf(d: DataFrame,
      carry: Seq[String] = Nil): DataFrame = {
    val h2 = graft.functions.GraftFunctions.dhash64(col("text"))
    val keep = carry.map(col)
    d.filter(col("text").isNotNull && length(col("text")) >= 1)
      .select(keep ++ Seq(col("doc_id"), h2.as("hh")): _*)
      .select(keep ++ Seq(col("doc_id"),
        col("hh").getItem(0).as("h_lo"),
        col("hh").getItem(1).as("h_hi")): _*)
  }

  /** F7 pair generation over a (doc_id, h_lo, h_hi) frame — the C20a
    * count-gated self-join shape (r14 VERDICT #1). The r14 form
    * collect_set the full member structs per (band, v) and applied
    * `maxBucket` AFTER the aggregation — so a degenerate band (blank
    * thumbnails all hashing one 16-bit value) materialized its whole
    * corpus-scale bucket in one ObjectHashAggregate buffer before
    * being discarded, the exact trap Dedup.scala's C20a comment
    * documents. Here the cap is an analytic COUNT over the SAME
    * (band, v)-partitioned lineage — over-cap buckets are dropped
    * BEFORE any pair row exists, all-codegen — and pairs come from a
    * partitioned self-equi-join on (band, v) (shuffle_hash: the
    * distinct side GROWS with the corpus and must never become a
    * driver broadcast). Both join inputs and the occ analytic share
    * one exchange subtree, so ReuseExchange ships the banded rows
    * once. ≤ maxBucket² pairs per bucket, ever.
    */
  private[graft] def phashPairsOf(hashed: DataFrame, maxHamming: Int,
      maxBucket: Int): DataFrame = {
    val bv = bandedOf(hashed)
      .withColumn("occ", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("band"), col("v"))))
      .filter(col("occ") >= 2 && col("occ") <= maxBucket)
      .select(col("band"), col("v"), col("doc_id"), col("h_lo"), col("h_hi"))
    bv.select(col("band"), col("v"), col("doc_id").as("doc_id_a"),
        col("h_lo").as("alo"), col("h_hi").as("ahi"))
      .join(bv.select(col("band"), col("v"), col("doc_id").as("doc_id_b"),
          col("h_lo").as("blo"), col("h_hi").as("bhi"))
        .hint("shuffle_hash"), Seq("band", "v"))
      .filter(col("doc_id_a") < col("doc_id_b"))
      .select(col("doc_id_a"), col("doc_id_b"),
        (bit_count(col("alo").bitwiseXOR(col("blo"))) +
          bit_count(col("ahi").bitwiseXOR(col("bhi"))))
          .cast("int").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** The four 16-bit bands of a (doc_id, h_lo, h_hi) frame, exploded
    * to (band, v, doc_id, h_lo, h_hi) — Hamming ≤ 3 over four bands
    * ⇒ at least one band equal (pigeonhole), so banded equality is
    * an EXACT candidate generator, shared by the inline query, the
    * index build, and the ingest screen.
    */
  private def bandedOf(hashed: DataFrame,
      carry: Seq[String] = Nil): DataFrame = {
    val bands = array(
      struct(lit(0).as("band"), (col("h_lo") % 65536).as("v")),
      struct(lit(1).as("band"), shiftright(col("h_lo"), 16).as("v")),
      struct(lit(2).as("band"), (col("h_hi") % 65536).as("v")),
      struct(lit(3).as("band"), shiftright(col("h_hi"), 16).as("v")))
    val keep = carry.map(col)
    hashed
      .select(keep ++ Seq(col("doc_id"), col("h_lo"), col("h_hi"),
        explode(bands).as("bv")): _*)
      .select(keep ++ Seq(col("bv.band").as("band"), col("bv.v").as("v"),
        col("doc_id"), col("h_lo"), col("h_hi")): _*)
  }

  /** F7c (r15): pHash near-dup CLUSTERS — the decision an image
    * dedup actually ships: connected components over the F7 pair
    * graph (a screenshot, its re-encode, and its thumbnail form ONE
    * cluster even when the thumbnail only pairs with the re-encode),
    * every payload labeled with its cluster's canonical minimum
    * doc_id + cluster size; "keep one per cluster" is then
    * `doc_id = cluster_id`. Pure composition: F7's count-gated pairs
    * feed C9's label machinery ([[Dedup.clustersOver]] — driver
    * union-find under the edge bound, distributed min-label
    * propagation past it), so every scale property of both parents
    * carries over unchanged.
    */
  def phashClusters(spark: SparkSession, dir: String,
      maxHamming: Int = 3, maxBucket: Int = 1000, maxIters: Int = 50,
      maxDriverEdges: Long = 4L * 1000 * 1000,
      reliableCheckpointDir: Option[String] = None): DataFrame =
    Dedup.clustersOver(
      Tables(spark, dir, "documents")
        .filter(col("text").isNotNull && length(col("text")) >= 1)
        .select(col("doc_id")),
      phashNearDup(spark, dir, maxHamming, maxBucket)
        .select(col("doc_id_a"), col("doc_id_b")),
      maxIters, maxDriverEdges, reliableCheckpointDir)

  /** F7 cap audit (no-silent-caps, r14 VERDICT #3): the (band, v)
    * buckets [[phashNearDup]]'s `maxBucket` cap DROPS, with their
    * sizes — so a production run can distinguish "no near-dups"
    * from "a degenerate band (blank thumbnails) ate the candidates".
    * Pure aggregation over the same banded lineage, output rows =
    * over-cap buckets only (normally zero).
    */
  def phashCapAudit(spark: SparkSession, dir: String,
      maxBucket: Int = 1000): DataFrame =
    bandedOf(phashHashesOf(Tables(spark, dir, "documents")))
      .groupBy(col("band"), col("v"))
      .agg(count(lit(1)).as("occ"))
      .filter(col("occ") > maxBucket)
      .select(lit("mm_phash_neardup").as("site"),
        concat_ws(":", col("band"), col("v")).as("bucket"),
        col("occ"), lit(maxBucket).as("cap"))

  /** F7 lifecycle (the D9/C32b discipline): persist the corpus's
    * banded pHash index once, screen every incoming media batch
    * against it with no corpus re-scan. `{name}_bands` holds the
    * (band, v, doc_id, h_lo, h_hi) rows with over-cap bands dropped
    * AT BUILD — a capped index bounds every future probe join no
    * matter how degenerate a band is — and the dropped bands are
    * persisted to `{name}_capped` (the no-silent-caps audit rows,
    * C32b's capped-fingerprint logging made queryable); `{name}_meta`
    * pins maxBucket so probes screen under the build's cap.
    */
  def buildPhashIndex(db: graft.catalog.GraftDatabase, docs: DataFrame,
      name: String, maxBucket: Int = 1000): Unit = {
    // persisted: the kept-bands write and the capped-audit write are
    // two actions over the same corpus-scale hash + window lineage
    // (r15 review: unpersisted, the whole pass executed twice)
    val banded = bandedOf(phashHashesOf(docs))
      .withColumn("occ", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("band"), col("v"))))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val ow = org.apache.spark.sql.SaveMode.Overwrite
      db.write(banded.filter(col("occ") <= maxBucket)
        .select(col("band"), col("v"), col("doc_id"),
          col("h_lo"), col("h_hi")), s"${name}_bands", ow)
      db.write(banded.filter(col("occ") > maxBucket)
        .groupBy(col("band"), col("v")).agg(max(col("occ")).as("occ"))
        .select(col("band"), col("v"), col("occ")), s"${name}_capped", ow)
      import db.spark.implicits._
      db.write(Seq(maxBucket).toDF("max_bucket"), s"${name}_meta", ow)
    } finally banded.unpersist(blocking = false)
  }

  /** Screen a new (doc_id, text) media batch against a stored pHash
    * index: the batch hashes map-side (stateless one-pass DHash64),
    * candidates come from the banded equi-join against the capped
    * index — shuffle_hash on the index side: the index GROWS with
    * the corpus and must never become a driver broadcast — and the
    * Hamming verify is a bit_count on the joined row. Emits distinct
    * (new_doc_id, index_doc_id, hamming ≤ maxHamming): the
    * ingest-time near-dup screen a multimodal crawl runs before
    * admitting a batch (C32b's winnow screen for pixels instead of
    * tokens). Exactness carries over: Hamming ≤ 3 ⇒ a shared band,
    * unless that band was capped at build — which the `{name}_capped`
    * audit table records.
    */
  def phashNewPairs(db: graft.catalog.GraftDatabase, name: String,
      newDocs: DataFrame, maxHamming: Int = 3): DataFrame =
    phashScreenRows(db, name, newDocs, maxHamming).distinct()

  /** Pre-distinct screen rows (a pair surfaces once per shared band)
    * with `carry` columns threaded through — shared by the batch
    * screen (then `.distinct()`) and the streaming twin (then a
    * watermarked `dropDuplicates`, the append-mode-legal dedup).
    */
  private[graft] def phashScreenRows(db: graft.catalog.GraftDatabase,
      name: String, newDocs: DataFrame, maxHamming: Int,
      carry: Seq[String] = Nil): DataFrame = {
    val keep = carry.map(col)
    bandedOf(phashHashesOf(newDocs, carry), carry)
      .select(keep ++ Seq(col("band"), col("v"),
        col("doc_id").as("new_doc_id"),
        col("h_lo").as("alo"), col("h_hi").as("ahi")): _*)
      .join(db.read(s"${name}_bands").hint("shuffle_hash"),
        Seq("band", "v"))
      .select(keep ++ Seq(col("new_doc_id"),
        col("doc_id").as("index_doc_id"),
        (bit_count(col("alo").bitwiseXOR(col("h_lo"))) +
          bit_count(col("ahi").bitwiseXOR(col("h_hi"))))
          .cast("int").as("hamming")): _*)
      .filter(col("hamming") <= maxHamming)
  }

  // F7: identical grid sampling, bit packing (OR-fold over two
  // 32-bit halves), 16-bit banding, and bit_count verify — pairs
  // and Hamming distances integer-exact cross-engine. Shared by the
  // pair row and (as a subquery) the F7c cluster row.
  private val phashPairsOracle =
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
        |WHERE hamming <= 3""".stripMargin

  val oracles: Map[String, String] = Map(
    "mm_phash_neardup" -> phashPairsOracle,
    // F7c: connected components over the pHash pair graph (the C9
    // recursive-CTE mirror) — universe = the hashed set (non-null,
    // non-empty payload stand-ins), singletons label themselves
    "mm_phash_clusters" ->
      s"""WITH RECURSIVE
         |p AS (SELECT doc_id_a, doc_id_b FROM (
         |$phashPairsOracle
         |) pp),
         |e AS (SELECT doc_id_a AS src, doc_id_b AS dst FROM p
         |      UNION ALL SELECT doc_id_b, doc_id_a FROM p),
         |reach(id, r) AS (
         |  SELECT src, src FROM e
         |  UNION
         |  SELECT e.src, reach.r FROM reach JOIN e ON reach.id = e.dst),
         |lab AS (SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id),
         |allc AS (SELECT d.doc_id, COALESCE(lab.cluster_id, d.doc_id) AS cluster_id
         |         FROM (SELECT doc_id FROM documents
         |               WHERE text IS NOT NULL AND len(text) >= 1) d
         |         LEFT JOIN lab ON d.doc_id = lab.id)
         |SELECT doc_id, cluster_id,
         |  COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size
         |FROM allc""".stripMargin,
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
    "mm_phash_clusters" -> ((s, d) => phashClusters(s, d)),
    "mm_integrity" -> ((s, d) => integrity(s, d)),
    "mm_partitioned" -> (partitionedMedia _),
    "mm_resize" -> ((s, d) => resize(s, d)),
    "mm_decode" -> ((s, d) => decode(s, d)),
    "mm_frames" -> ((s, d) => frames(s, d))
  )
}
