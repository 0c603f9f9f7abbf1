package graft.functions.expressions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** One-pass document hashing/sketching expressions (SURVEY.md
  * §2.C4/C5/E4/H2). Each consumes a token array and emits the sketch
  * directly — no shingle explode, no per-token shuffle rows; the only
  * thing that ever crosses the wire is the O(k) sketch.
  *
  * Hash strategy: SimHash uses md5-derived 60-bit token hashes so the
  * DuckDB oracle can recompute bit-identical fingerprints in SQL;
  * MinHash uses Spark's native XXH64 (cheap, codegen-adjacent) since
  * its verification path is exact-Jaccard equivalence, not signature
  * parity (SURVEY §2.C4).
  */
object HashingSupport {
  private val md5Local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** First 60 bits (15 hex chars) of md5 — matches the oracle's
    * ('0x' || substr(md5(w),1,15))::BIGINT.
    */
  def md5Hash60(bytes: Array[Byte]): Long = md5Hash60From(bytes, bytes.length)

  /** [[md5Hash60]] over bytes[0, len) — the reusable-buffer form. */
  def md5Hash60From(bytes: Array[Byte], len: Int): Long = {
    val d = md5Local.get()
    d.reset()
    d.update(bytes, 0, len)
    val h = d.digest()
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (h(i) & 0xFFL); i += 1 }
    v >>> 4
  }

  def xxh64(s: UTF8String, seed: Long): Long = {
    val b = s.getBytes
    XXH64.hashUnsafeBytes(b, Platform.BYTE_ARRAY_OFFSET, b.length, seed)
  }
}

/** 60-bit SimHash over a token array (multiplicity-weighted votes).
  *
  * Codegen: the generated code calls [[hash]] on a referenced copy of
  * this expression — the md5 loop can't be inlined usefully, but this
  * keeps the projection inside whole-stage codegen (no
  * CodegenFallback barrier, no boxed eval path).
  */
case class SimHash60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash60"

  def hash(toks: ArrayData): Long = {
    val votes = new Array[Int](60)
    var t = 0
    val n = toks.numElements()
    while (t < n) {
      val s = toks.getUTF8String(t)
      if (s != null) {
        val h = HashingSupport.md5Hash60(s.getBytes)
        var i = 0
        while (i < 60) {
          if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
          i += 1
        }
      }
      t += 1
    }
    var sim = 0L
    var i = 0
    while (i < 60) { if (votes(i) > 0) sim |= (1L << i); i += 1 }
    sim
  }

  override def nullSafeEval(v: Any): Any = hash(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val ref = ctx.addReferenceObj("simhash", this, classOf[SimHash60].getName)
      s"${ev.value} = $ref.hash($arr);"
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** MinHash signature over w-shingles of a token array: k independent
  * affine permutations h_i(x) = (a_i·x + b_i) mod (2^61−1) over an
  * XXH64 base hash, all computed in one pass. Output: array<long>[k].
  */
case class MinHashSignature(child: Expression, k: Int, shingleSize: Int,
    seed: Long)
    extends UnaryExpression {

  require(k > 0 && shingleSize > 0)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  private val Prime = (1L << 61) - 1

  // Deterministic permutation constants (java.util.Random is spec-fixed).
  @transient private lazy val (as, bs) = {
    val r = new java.util.Random(seed)
    val a = Array.fill(k)(r.nextLong() | 1L)
    val b = Array.fill(k)(r.nextLong())
    (a, b)
  }

  def compute(toks: ArrayData): ArrayData = {
    val n = toks.numElements()
    val sig = Array.fill(k)(Long.MaxValue)
    if (n >= shingleSize) {
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i <= n - shingleSize) {
        sb.setLength(0)
        var j = 0
        while (j < shingleSize) {
          if (j > 0) sb.append(' ')
          val s = toks.getUTF8String(i + j)
          if (s != null) sb.append(s.toString)
          j += 1
        }
        val base = HashingSupport.xxh64(
          UTF8String.fromString(sb.toString), seed)
        var p = 0
        while (p < k) {
          val h = ((as(p) * base + bs(p)) & Long.MaxValue) % Prime
          if (h < sig(p)) sig(p) = h
          p += 1
        }
        i += 1
      }
    }
    new GenericArrayData(sig)
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  // Same shape as SimHash60: call-out to a referenced object, no
  // whole-stage-codegen barrier around the signature scan.
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val ref =
        ctx.addReferenceObj("minhash", this, classOf[MinHashSignature].getName)
      s"${ev.value} = $ref.compute($arr);"
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Bloom membership probe against a PER-ROW serialized filter column
  * — the bucketed complement of [[BloomMightContain]] for filters too
  * large to embed in one plan (its documented ~tens-of-MB ceiling).
  * The probed value and the filter contents are 64-bit hashes
  * ([[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate]]'s
  * putLong form); `bucket` keys a per-task deserialization cache, so
  * a filter is decoded once per (task, bucket) instead of once per
  * row — co-partitioning the probe side by bucket bounds the cache at
  * one filter per task, which is the point: each executor holds only
  * its buckets' slices of an index whose TOTAL size exceeds what any
  * single task closure could ship.
  */
case class BloomProbeBucketed(valueHash: Expression, bucket: Expression,
    filterBin: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def first: Expression = valueHash
  override def second: Expression = bucket
  override def third: Expression = filterBin

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_probe_bucketed"

  // Bounded LRU, not an unbounded map: if the probe side is NOT
  // co-partitioned by bucket (e.g. the index joined as a broadcast,
  // so every task sees every bucket), an unbounded cache would
  // accumulate the ENTIRE deserialized index per task — the exact
  // single-plan ceiling this expression exists to break. The bound
  // caps worst-case per-task memory at MaxCached filters; the
  // co-partitioned fast path (one bucket per task) never evicts.
  private val MaxCached = 4

  @transient private lazy val cache =
    new java.util.LinkedHashMap[Long,
        org.apache.spark.util.sketch.BloomFilter](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[Long,
            org.apache.spark.util.sketch.BloomFilter]): Boolean =
        size() > MaxCached
    }

  def probe(v: Long, b: Long, bin: Array[Byte]): Boolean = {
    var f = cache.get(b)
    if (f == null) {
      f = org.apache.spark.util.sketch.BloomFilter.readFrom(
        new java.io.ByteArrayInputStream(bin))
      cache.put(b, f)
    }
    f.mightContainLong(v)
  }

  override def nullSafeEval(v: Any, b: Any, bin: Any): Any =
    probe(v.asInstanceOf[Long], b.asInstanceOf[Long],
      bin.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, b, bin) => {
      val ref = ctx.addReferenceObj("bloomProbeBucketed", this,
        classOf[BloomProbeBucketed].getName)
      s"${ev.value} = $ref.probe($v, $b, $bin);"
    })

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): Expression = copy(valueHash = f, bucket = s, filterBin = t)
}

/** MinHash signature over an ALREADY-HASHED shingle array
  * (`array<long>`, the [[graft.operators.Dedup]] `sh` form): the k
  * affine permutations run directly over the 64-bit shingle hashes,
  * so a pipeline that has materialized hashed shingles (for AllPairs
  * prefixes / exact verify) never tokenizes or re-hashes the corpus a
  * second time to band it. Same LSH family and banding math as
  * [[MinHashSignature]] — only the base hash differs (the column's
  * xxhash64 values instead of a private xxh64 over shingle strings),
  * which changes signature VALUES but not collision probabilities;
  * C4's contract is exact-pair-set equivalence, not signature parity.
  */
case class MinHashFromHashes(child: Expression, k: Int, seed: Long)
    extends UnaryExpression {

  require(k > 0)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_from_hashes"

  private val Prime = (1L << 61) - 1

  @transient private lazy val (as, bs) = {
    val r = new java.util.Random(seed)
    val a = Array.fill(k)(r.nextLong() | 1L)
    val b = Array.fill(k)(r.nextLong())
    (a, b)
  }

  def compute(hashes: ArrayData): ArrayData = {
    val n = hashes.numElements()
    val sig = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val base = hashes.getLong(i)
      var p = 0
      while (p < k) {
        val h = ((as(p) * base + bs(p)) & Long.MaxValue) % Prime
        if (h < sig(p)) sig(p) = h
        p += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val ref = ctx.addReferenceObj("minhashFromHashes", this,
        classOf[MinHashFromHashes].getName)
      s"${ev.value} = $ref.compute($arr);"
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Size of the intersection of two SORTED `array<long>` columns — a
  * single merge pass, no intermediate array allocation. The Jaccard
  * verify step's replacement for `size(array_intersect(a, b))` (which
  * builds a hash set AND an output array per pair); union size derives
  * as |a| + |b| − |a∩b| for set-valued arrays. Inputs MUST be sorted
  * ascending ([[graft.operators.Dedup]] `sh` arrays are, by
  * construction via sort_array).
  */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_sorted_intersect_size"

  def count(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var n = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else { n += 1; i += 1; j += 1 }
    }
    n
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    count(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val ref = ctx.addReferenceObj("sortedIntersect", this,
        classOf[SortedIntersectSize].getName)
      s"${ev.value} = $ref.count($a, $b);"
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

/** AllPairs prefix of a hashed-shingle array (`array<long>`) under
  * the global order (approx document frequency, h): the first
  * |s| − ⌈τ·|s|⌉ + 1 elements — the RAREST shingles, rarity read
  * from a Count-Min Sketch over the corpus's shingle stream. One
  * pass, emitted map-side — replaces the explode → df-join → per-doc
  * rank window of the textbook formulation with zero shuffles on the
  * corpus-shingle frame (the sketch itself builds in one shuffle-free
  * map pass; CMS is mergeable).
  *
  * Correctness does NOT depend on the sketch: the prefix lemma ("two
  * sets with Jaccard ≥ τ share a prefix element") holds under ANY
  * fixed total order on shingles, and (estimate(h), h) is a
  * deterministic total order whatever the sketch's collision
  * pattern. Estimation error only moves candidates between the
  * generate and verify stages; the verified output is exact either
  * way. The graded df order is what keeps candidate counts near the
  * exact-AllPairs minimum — a binary hot/cold approximation (one
  * Bloom filter over df ≥ 2) measured 220k+ candidate pairs at sf0.1
  * where this produces a few thousand, because near-dup cluster
  * members are mostly-shared-shingle documents whose prefixes then
  * ordered by raw hash instead of rarity.
  */
case class PrefixByRarity(child: Expression,
    cmsBcast: org.apache.spark.broadcast.Broadcast[Array[Byte]],
    threshold: Double) extends UnaryExpression {

  require(threshold > 0.0 && threshold <= 1.0)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_prefix_by_rarity"

  // The sketch rides a BROADCAST, not an expression literal: the
  // ~1.1 MiB serialized CMS (eps=1e-4 × depth 5 of longs) embedded as
  // an Array[Byte] field was re-serialized into EVERY task binary of
  // every stage containing this expression — the r15 bench tail's
  // repeated "Broadcasting large task binary with size ~1.1 MiB"
  // DAGScheduler warnings (guide §5: oversized literal state belongs
  // in a broadcast variable; the task closure carries the handle).
  // Executors fetch the bytes once and the lazy val deserializes once
  // per expression instance per JVM; the driver-side interpreted path
  // reads .value locally, so eval semantics are unchanged.
  @transient private lazy val cms =
    org.apache.spark.util.sketch.CountMinSketch.readFrom(cmsBcast.value)

  def compute(sh: ArrayData): ArrayData = {
    val n = sh.numElements()
    val p = n - math.ceil(n * threshold).toInt + 1
    if (n == 0 || p <= 0) return new GenericArrayData(Array.emptyLongArray)
    val hs = new Array[Long](n)
    val idx = new Array[Integer](n)
    var i = 0
    while (i < n) { hs(i) = sh.getLong(i); idx(i) = i; i += 1 }
    val est = new Array[Long](n)
    i = 0
    while (i < n) { est(i) = cms.estimateCount(hs(i)); i += 1 }
    java.util.Arrays.sort(idx, new java.util.Comparator[Integer] {
      override def compare(a: Integer, b: Integer): Int = {
        val c = java.lang.Long.compare(est(a), est(b))
        if (c != 0) c else java.lang.Long.compare(hs(a), hs(b))
      }
    })
    val out = new Array[Long](math.min(p, n))
    i = 0
    while (i < out.length) { out(i) = hs(idx(i)); i += 1 }
    new GenericArrayData(out)
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val ref = ctx.addReferenceObj("prefixByRarity", this,
        classOf[PrefixByRarity].getName)
      s"${ev.value} = $ref.compute($arr);"
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Karp–Rabin rolling hash of a string's UTF-8 bytes (wrapping 64-bit
  * polynomial, base 1000003) — the cheap engine-native document
  * fingerprint (SURVEY §2.E4 production path).
  */
/** C33 featurizer: per-document DSIR bucket counts in ONE byte pass —
  * every unigram and bigram of the (pre-lowered) text md5-bucketed
  * into m slots, counts accumulated in a touched-slot-reset
  * thread-local table, emitted as array<struct<b,c>>. Bucket identity
  * is EXACTLY the plan-side portable rule
  * (conv(substring(md5(g),1,8),16,10) % m — the first 4 digest bytes
  * as an unsigned 32-bit value): the oracle and the exploded
  * built-ins formulation land every gram in the same slot
  * (spec-pinned equal). Replaces two tokenize+explode branches and a
  * per-occurrence md5 column with one scan whose output is bounded
  * by distinct touched buckets ≤ min(2·tokens, m).
  */
/** Single-block MD5 (RFC 1321) for messages ≤ 55 bytes, returning
  * only the first 4 digest bytes assembled big-endian — exactly
  * `conv(substring(md5hex, 1, 8), 16, 10)` as a signed Int to be
  * widened unsigned by the caller. Why it exists: the md5-bucket
  * rule is the PORTABLE hash contract (C11/C14/C33 — both engines
  * must land every gram in the same bucket), so the hash family is
  * fixed, but `MessageDigest` pays an engine reset, an internal
  * buffer copy and a fresh 16-byte digest allocation per call — at
  * the 10× DSIR row that is ~150 M short-gram hashes per pass. A
  * ≤55-byte message is exactly one MD5 compression over a reusable
  * block, allocation-free. Spec-pinned equal to MessageDigest on
  * random inputs; callers fall back to MessageDigest above 55 bytes.
  */
private[graft] object Md5Short {

  val MaxLen = 55

  private val S = Array(
    7, 12, 17, 22, 7, 12, 17, 22, 7, 12, 17, 22, 7, 12, 17, 22,
    5, 9, 14, 20, 5, 9, 14, 20, 5, 9, 14, 20, 5, 9, 14, 20,
    4, 11, 16, 23, 4, 11, 16, 23, 4, 11, 16, 23, 4, 11, 16, 23,
    6, 10, 15, 21, 6, 10, 15, 21, 6, 10, 15, 21, 6, 10, 15, 21)

  // T[i] = floor(abs(sin(i+1)) * 2^32) — the RFC 1321 constants
  private val K = Array(
    0xd76aa478, 0xe8c7b756, 0x242070db, 0xc1bdceee,
    0xf57c0faf, 0x4787c62a, 0xa8304613, 0xfd469501,
    0x698098d8, 0x8b44f7af, 0xffff5bb1, 0x895cd7be,
    0x6b901122, 0xfd987193, 0xa679438e, 0x49b40821,
    0xf61e2562, 0xc040b340, 0x265e5a51, 0xe9b6c7aa,
    0xd62f105d, 0x02441453, 0xd8a1e681, 0xe7d3fbc8,
    0x21e1cde6, 0xc33707d6, 0xf4d50d87, 0x455a14ed,
    0xa9e3e905, 0xfcefa3f8, 0x676f02d9, 0x8d2a4c8a,
    0xfffa3942, 0x8771f681, 0x6d9d6122, 0xfde5380c,
    0xa4beea44, 0x4bdecfa9, 0xf6bb4b60, 0xbebfbc70,
    0x289b7ec6, 0xeaa127fa, 0xd4ef3085, 0x04881d05,
    0xd9d4d039, 0xe6db99e5, 0x1fa27cf8, 0xc4ac5665,
    0xf4292244, 0x432aff97, 0xab9423a7, 0xfc93a039,
    0x655b59c3, 0x8f0ccc92, 0xffeff47d, 0x85845dd1,
    0x6fa87e4f, 0xfe2ce6e0, 0xa3014314, 0x4e0811a1,
    0xf7537e82, 0xbd3af235, 0x2ad7d2bb, 0xeb86d391)

  private val tlBlock = new ThreadLocal[Array[Int]] {
    override def initialValue(): Array[Int] = new Array[Int](16)
  }

  /** First 4 MD5 digest bytes of bytes[off, off+len) assembled
    * big-endian; len MUST be ≤ [[MaxLen]].
    */
  def firstWordBE(bytes: Array[Byte], off: Int, len: Int): Int = {
    val block = tlBlock.get()
    java.util.Arrays.fill(block, 0)
    var i = 0
    while (i < len) {
      block(i >> 2) |= (bytes(off + i) & 0xff) << ((i & 3) * 8)
      i += 1
    }
    compress(block, len)
  }

  /** [[firstWordBE]] of the message bytes[off1,off1+len1) ++ sep ++
    * bytes[off2,off2+len2) — the two-token-gram form, hashing
    * straight from the token spans with no concatenated-gram
    * allocation. len1+1+len2 MUST be ≤ [[MaxLen]].
    */
  def firstWordBE2(bytes: Array[Byte], off1: Int, len1: Int, sep: Byte,
      off2: Int, len2: Int): Int = {
    val block = tlBlock.get()
    java.util.Arrays.fill(block, 0)
    var p = 0
    var i = 0
    while (i < len1) {
      block(p >> 2) |= (bytes(off1 + i) & 0xff) << ((p & 3) * 8)
      p += 1; i += 1
    }
    block(p >> 2) |= (sep & 0xff) << ((p & 3) * 8)
    p += 1
    i = 0
    while (i < len2) {
      block(p >> 2) |= (bytes(off2 + i) & 0xff) << ((p & 3) * 8)
      p += 1; i += 1
    }
    compress(block, p)
  }

  private def compress(block: Array[Int], len: Int): Int =
    (compress64(block, len) >>> 32).toInt

  /** First EIGHT digest bytes assembled big-endian (the 60-bit
    * winnow-hash form reads this >>> 4 — exactly
    * `conv(substring(md5hex, 1, 15), 16, 10)`).
    */
  private def compress64(block: Array[Int], len: Int): Long = {
    block(len >> 2) |= 0x80 << ((len & 3) * 8)
    block(14) = len << 3 // bit length, low word (len ≤ 55)
    var a = 0x67452301
    var b = 0xefcdab89
    var c = 0x98badcfe
    var d = 0x10325476
    var i = 0
    while (i < 64) {
      var f = 0
      var g = 0
      if (i < 16) { f = (b & c) | (~b & d); g = i }
      else if (i < 32) { f = (d & b) | (~d & c); g = (5 * i + 1) & 15 }
      else if (i < 48) { f = b ^ c ^ d; g = (3 * i + 5) & 15 }
      else { f = c ^ (b | ~d); g = (7 * i) & 15 }
      val tmp = d
      d = c
      c = b
      b = b + Integer.rotateLeft(a + f + K(i) + block(g), S(i))
      a = tmp
      i += 1
    }
    // digest bytes are the little-endian bytes of state words A then
    // B; assembling them big-endian is a byte reversal of each
    (Integer.reverseBytes(0x67452301 + a).toLong << 32) |
      (Integer.reverseBytes(0xefcdab89 + b) & 0xffffffffL)
  }

  /** First 60 md5 bits of the k-span gram
    * bytes[starts(from)..ends(from)) ++ ' ' ++ … ++
    * bytes[starts(from+k-1)..ends(from+k-1)) — the C32 portable
    * winnow hash, straight from the token spans. Total gram length
    * MUST be ≤ [[MaxLen]].
    */
  def first60Spans(bytes: Array[Byte], starts: Array[Int],
      ends: Array[Int], from: Int, k: Int): Long = {
    val block = tlBlock.get()
    java.util.Arrays.fill(block, 0)
    var p = 0
    var j = 0
    while (j < k) {
      if (j > 0) {
        block(p >> 2) |= 0x20 << ((p & 3) * 8)
        p += 1
      }
      var i = starts(from + j)
      val e = ends(from + j)
      while (i < e) {
        block(p >> 2) |= (bytes(i) & 0xff) << ((p & 3) * 8)
        p += 1; i += 1
      }
      j += 1
    }
    compress64(block, p) >>> 4
  }
}

/** ONE definition of the C33 md5-bucket rule (the portable hash
  * contract both engines share): bucket = first-4-md5-bytes unsigned
  * mod m, for a single token span or a two-span bigram. Short grams
  * take [[Md5Short]]'s allocation-free single block; longer ones fall
  * back to the caller's MessageDigest.
  */
private[expressions] object Md5Bucket {

  def uni(b: Array[Byte], off: Int, len: Int, m: Int,
      md: MessageDigest): Int = {
    val v =
      if (len <= Md5Short.MaxLen)
        Md5Short.firstWordBE(b, off, len) & 0xffffffffL
      else {
        md.reset()
        md.update(b, off, len)
        val d = md.digest()
        ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      }
    (v % m).toInt
  }

  def bi(b: Array[Byte], off1: Int, len1: Int, off2: Int, len2: Int,
      m: Int, md: MessageDigest): Int = {
    if (len1 + 1 + len2 <= Md5Short.MaxLen)
      ((Md5Short.firstWordBE2(b, off1, len1, 0x20, off2, len2)
        & 0xffffffffL) % m).toInt
    else {
      val gb = new Array[Byte](len1 + 1 + len2)
      System.arraycopy(b, off1, gb, 0, len1)
      gb(len1) = 0x20
      System.arraycopy(b, off2, gb, len1 + 1, len2)
      uni(gb, 0, gb.length, m, md)
    }
  }
}

/** C33 model build as ONE typed-imperative aggregation: per-partition
  * long[2m] count vectors — [0,m) target-side, [m,2m) background-side
  * occurrences of every uni/bigram's md5 bucket — merged by vector
  * add, evaluated as the flat 2m-long array the driver folds into the
  * m-row millibit table. The E21 GramCountsAgg treatment applied to
  * DSIR: the explode(dsirBucketCounts) → groupBy shape pushed ~145 M
  * per-doc bucket rows through Generate + partial HashAggregate at
  * the 10× row, for a model that is 2m longs by construction — no
  * cap needed, m is the fixed hyperparameter.
  */
case class DsirModelAgg(left: Expression, right: Expression, m: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends org.apache.spark.sql.catalyst.expressions.aggregate
      .TypedImperativeAggregate[Array[Long]]
    with org.apache.spark.sql.catalyst.trees.BinaryLike[Expression] {

  require(m >= 2, s"need at least 2 buckets, got $m")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_dsir_model_agg"

  @transient private lazy val tlDigest =
    new ThreadLocal[MessageDigest] {
      override def initialValue(): MessageDigest =
        MessageDigest.getInstance("MD5")
    }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](2 * m)

  override def update(buf: Array[Long],
      input: org.apache.spark.sql.catalyst.InternalRow): Array[Long] = {
    val v = left.eval(input)
    if (v == null) return buf
    val tgtV = right.eval(input)
    // null target flag = background (sources are non-null in every
    // corpus; isin(null) would group as background in the join path)
    val base = if (tgtV != null && tgtV.asInstanceOf[Boolean]) 0 else m
    val b = v.asInstanceOf[UTF8String].getBytes
    val sp = TokenScan.scan(b)
    val starts = sp.starts; val ends = sp.ends; val nTok = sp.n
    val md = tlDigest.get()
    var t = 0
    while (t < nTok) {
      buf(base + Md5Bucket.uni(b, starts(t), ends(t) - starts(t), m, md)) += 1L
      t += 1
    }
    t = 0
    while (t < nTok - 1) {
      buf(base + Md5Bucket.bi(b, starts(t), ends(t) - starts(t),
        starts(t + 1), ends(t + 1) - starts(t + 1), m, md)) += 1L
      t += 1
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val out = new Array[Byte](buf.length * 8)
    var i = 0
    while (i < buf.length) {
      var v = buf(i); var j = 0
      while (j < 8) { out(i * 8 + j) = (v & 0xff).toByte; v >>>= 8; j += 1 }
      i += 1
    }
    out
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val buf = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < buf.length) {
      var v = 0L; var j = 7
      while (j >= 0) { v = (v << 8) | (bytes(i * 8 + j) & 0xffL); j -= 1 }
      buf(i) = v
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(n: Int): DsirModelAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): DsirModelAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): DsirModelAgg = copy(left = l, right = r)
}

/** C33 scoring as one byte pass: every uni/bigram's md5 bucket looks
  * up its plan-embedded millibit leg (the m-row model, 8·m bytes in
  * the task binary — m is a fixed hyperparameter) and the doc's
  * integer weight accumulates in place. Σ_slots l_mb ≡ the join
  * path's Σ_buckets c·l_mb — the same longs in a different order.
  * NULL for zero-token docs (the join path emits no row for them).
  */
case class DsirDocScore(child: Expression, lmb: Array[Long])
    extends UnaryExpression {

  private val m = lmb.length

  override def dataType: DataType = StructType(Seq(
    StructField("n_feats", LongType, nullable = false),
    StructField("weight_mb", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dsir_doc_score"

  @transient private lazy val tlDigest =
    new ThreadLocal[MessageDigest] {
      override def initialValue(): MessageDigest =
        MessageDigest.getInstance("MD5")
    }

  def score(s: UTF8String): Any = {
    val b = s.getBytes
    val sp = TokenScan.scan(b)
    val starts = sp.starts; val ends = sp.ends; val nTok = sp.n
    if (nTok == 0) return null
    val md = tlDigest.get()
    var w = 0L
    var t = 0
    while (t < nTok) {
      w += lmb(Md5Bucket.uni(b, starts(t), ends(t) - starts(t), m, md))
      t += 1
    }
    t = 0
    while (t < nTok - 1) {
      w += lmb(Md5Bucket.bi(b, starts(t), ends(t) - starts(t),
        starts(t + 1), ends(t + 1) - starts(t + 1), m, md))
      t += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any]((2L * nTok - 1L), w))
  }

  override def nullSafeEval(v: Any): Any = score(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val ref = ctx.addReferenceObj("dsirScore", this,
        classOf[DsirDocScore].getName)
      s"""${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $ref.score($s);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

case class DsirBucketCounts(child: Expression, m: Int)
    extends UnaryExpression {

  require(m >= 2, s"need at least 2 buckets, got $m")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("b", LongType, nullable = false),
      StructField("c", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_dsir_bucket_counts"

  @transient private lazy val tlDigest =
    new ThreadLocal[MessageDigest] {
      override def initialValue(): MessageDigest =
        MessageDigest.getInstance("MD5")
    }
  @transient private lazy val tlCounts =
    new ThreadLocal[Array[Long]] {
      override def initialValue(): Array[Long] = new Array[Long](m)
    }

  def buckets(s: UTF8String): ArrayData = {
    val b = s.getBytes
    val sp = TokenScan.scan(b)
    val starts = sp.starts; val ends = sp.ends; val nTok = sp.n
    val md = tlDigest.get()
    val counts = tlCounts.get()
    var touched = new Array[Int](16)
    var nTouched = 0
    def add(bucket: Int): Unit = {
      if (counts(bucket) == 0L) {
        if (nTouched == touched.length)
          touched = java.util.Arrays.copyOf(touched, nTouched * 2)
        touched(nTouched) = bucket
        nTouched += 1
      }
      counts(bucket) += 1L
    }
    // bucket = first-4-md5-bytes unsigned mod m — ONE definition
    // ([[Md5Bucket]]): conv(substring(md5hex, 1, 8), 16, 10), short
    // grams on the allocation-free single-block path, bigrams hashed
    // straight from the two token spans
    var t = 0
    while (t < nTok) {
      add(Md5Bucket.uni(b, starts(t), ends(t) - starts(t), m, md))
      t += 1
    }
    t = 0
    while (t < nTok - 1) {
      add(Md5Bucket.bi(b, starts(t), ends(t) - starts(t),
        starts(t + 1), ends(t + 1) - starts(t + 1), m, md))
      t += 1
    }
    val out = new Array[AnyRef](nTouched)
    var o = 0
    while (o < nTouched) {
      val bk = touched(o)
      out(o) = new org.apache.spark.sql.catalyst.expressions
        .GenericInternalRow(Array[Any](bk.toLong, counts(bk)))
      counts(bk) = 0L // reset only what this row touched
      o += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(v: Any): Any =
    buckets(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val ref = ctx.addReferenceObj("dsirBuckets", this,
        classOf[DsirBucketCounts].getName)
      s"${ev.value} = $ref.buckets($s);"
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

case class RollingHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_rolling_hash64"

  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[UTF8String].getBytes
    var h = 1469598103934665603L // FNV offset basis as a fixed IV
    var i = 0
    while (i < bytes.length) {
      h = h * 1000003L + (bytes(i) & 0xFFL)
      i += 1
    }
    h
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val b = ctx.freshName("b")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |byte[] $b = $s.getBytes();
         |long $h = 1469598103934665603L;
         |for (int $i = 0; $i < $b.length; $i++) {
         |  $h = $h * 1000003L + ($b[$i] & 0xFFL);
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** F7 dHash (r14): the 9×8-grid gradient perceptual hash in ONE
  * forward pass — output array<long>[2] = (h_lo, h_hi), the two
  * BIGINT-safe 32-bit halves (grid rows 0–3 / 4–7) the pHash
  * near-dup banding consumes.
  *
  * Semantics contract (hash-pinned by the `mm_phash_neardup` oracle
  * at three SFs): pixel(k) = code point of the k mod numChars-th
  * CHARACTER — exactly `ascii(substr(text, 1 + k % len, 1))` in
  * both engines — and bit (r,c) = pixel(r·9+c) < pixel(r·9+c+1),
  * packed at (r mod 4)·8 + c. Only sample indexes 0‥71 exist, so
  * the pass decodes at most the first 72 code points (or the whole
  * string when shorter, for the wrap): the compositional
  * `ascii(substring)` form this replaces paid an O(position) UTF-8
  * seek PER PIXEL — 128 seeks/row was the whole cost of the F7 scan
  * stage (10× isolated: 1.63 s compositional).
  */
case class DHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_dhash64"

  def hash(s: UTF8String): ArrayData = {
    // decode code points of the first min(numChars, 72) characters
    // in one forward byte walk (UTF-8; matches substr's character
    // = code point counting)
    val bytes = s.getBytes
    if (bytes.length == 0) // callers filter empties; never div-by-zero
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array[Any](0L, 0L))
    val px = new Array[Int](72)
    var m = 0
    var i = 0
    // continuation reads clamp to the buffer (r14 ADVICE): Spark
    // never validates UTF-8 (binary cast to string), so a truncated
    // multi-byte tail must hash as end-of-string, not throw
    def cont(j: Int): Int = if (j < bytes.length) bytes(j) & 0x3F else 0
    while (i < bytes.length && m < 72) {
      val b0 = bytes(i) & 0xFF
      if (b0 < 0x80) { px(m) = b0; i += 1 }
      else if (b0 < 0xE0) {
        px(m) = ((b0 & 0x1F) << 6) | cont(i + 1); i += 2
      } else if (b0 < 0xF0) {
        px(m) = ((b0 & 0x0F) << 12) | (cont(i + 1) << 6) |
          cont(i + 2); i += 3
      } else {
        px(m) = ((b0 & 0x07) << 18) | (cont(i + 1) << 12) |
          (cont(i + 2) << 6) | cont(i + 3); i += 4
      }
      m += 1
    }
    val n = if (i >= bytes.length) m else s.numChars()
    // n = total chars; m = decoded prefix (= min(n, 72))
    def at(k: Int): Int = px(k % n)
    var lo = 0L
    var hi = 0L
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        if (at(r * 9 + c) < at(r * 9 + c + 1)) {
          val bit = (r % 4) * 8 + c
          if (r < 4) lo |= (1L << bit) else hi |= (1L << bit)
        }
        c += 1
      }
      r += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array[Any](lo, hi))
  }

  override def nullSafeEval(v: Any): Any = hash(v.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val ref = ctx.addReferenceObj("dhash", this, classOf[DHash64].getName)
      s"${ev.value} = $ref.hash($s);"
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** C20 window hasher: the 64-bit hash of EVERY w-token window of a
  * text column in ONE byte pass — tokenize (TokenScan, the \s+
  * boundary rule every oracle pin shares), xxhash64 each token from
  * its byte slice, then a rolling polynomial combine over w
  * consecutive token hashes (odd base B, wrapping 2⁶⁴ arithmetic;
  * slide = subtract the outgoing term·B^(w−1), multiply, add the
  * incoming hash — O(1) per window where any fold is O(w)). Output
  * is a primitive long array (UnsafeArrayData — zero boxing).
  *
  * Replaces the compositional transform + w slices + (w−1)
  * zip_with(xxhash64) formulation, whose every zip_with materialized
  * a boxed-Long GenericArrayData per document — ~w intermediate
  * arrays per doc dominated the C20 scan stage. Hash VALUES never
  * cross engines (the oracles join on window STRINGS), so equality
  * structure is the only contract: equal token windows ⇒ equal
  * hashes by construction, distinct windows collide w.p. ~2⁻⁶⁴
  * (uniform token hashes through an injective-per-position linear
  * map) — the same collision budget the old xxhash64 fold carried.
  */
case class TokenWindowHashes(child: Expression, w: Int)
    extends UnaryExpression {

  require(w >= 1, s"window width must be >= 1, got $w")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_token_window_hashes"

  private val B = 0x9E3779B97F4A7C15L // odd (golden-ratio) multiplier
  private val bw1 = { // B^(w-1) mod 2^64, for the rolling subtract
    var p = 1L; var i = 1
    while (i < w) { p *= B; i += 1 }
    p
  }

  def hashes(s: UTF8String): ArrayData = {
    val b = s.getBytes
    val sp = TokenScan.scan(b)
    val n = sp.n
    if (n < w)
      return org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(Array.emptyLongArray)
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      th(i) = XXH64.hashUnsafeBytes(b,
        Platform.BYTE_ARRAY_OFFSET + sp.starts(i),
        sp.ends(i) - sp.starts(i), 42L)
      i += 1
    }
    val out = new Array[Long](n - w + 1)
    var h = 0L
    i = 0
    while (i < w) { h = h * B + th(i); i += 1 }
    out(0) = h
    i = w
    while (i < n) {
      h = (h - th(i - w) * bw1) * B + th(i)
      out(i - w + 1) = h
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  override def nullSafeEval(v: Any): Any =
    hashes(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val ref = ctx.addReferenceObj("winHashes", this,
        classOf[TokenWindowHashes].getName)
      s"${ev.value} = $ref.hashes($s);"
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Sorted distinct view of an `array<long>` column — primitive copy,
  * sort, in-place dedupe; zero boxing in or out (UnsafeArrayData).
  * Composed over [[TokenWindowHashes]] it turns the C3/C4/C35
  * shingle-set build (regex tokenize → w slices → zip_with concat →
  * per-shingle string alloc → xxhash64 → sort_array) into one byte
  * pass plus one primitive sort — the dedup family's single hottest
  * column. The replacement preserves the only contract the hashes
  * carry (equal shingles ⇒ equal hashes; distinct collide w.p.
  * ~2⁻⁶⁴, [[TokenWindowHashes]]'s argument): hash VALUES never cross
  * engines — every oracle joins on shingle STRINGS.
  */
case class SortedDistinctLongs(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_sorted_distinct_longs"

  def dedup(in: ArrayData): ArrayData = {
    val n = in.numElements()
    if (n == 0)
      return org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(Array.emptyLongArray)
    val a = in.toLongArray()
    java.util.Arrays.sort(a)
    var m = 1; var i = 1
    while (i < n) { if (a(i) != a(m - 1)) { a(m) = a(i); m += 1 }; i += 1 }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(if (m == n) a else java.util.Arrays.copyOf(a, m))
  }

  override def nullSafeEval(v: Any): Any =
    dedup(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val ref = ctx.addReferenceObj("sortedDistinct", this,
        classOf[SortedDistinctLongs].getName)
      s"${ev.value} = $ref.dedup($s);"
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Bloom-filter membership probe over a string column (SURVEY.md
  * §2.C13). The filter is built once on the already-seen corpus
  * (`DataFrame.stat.bloomFilter`) and baked into the expression in
  * serialized form, so the probe is a map-side primitive call inside
  * whole-stage codegen — no join, no shuffle, no UDF boxing.
  *
  * Scale note: plan-embedded filters ship with the task closure and
  * are fine to the tens of MB (1e8 items @1% fpp ≈ 120 MB is the
  * practical ceiling); beyond that, build per-bucket filters and join
  * on the bucket key instead of embedding one global filter.
  *
  * False positives are the contract: callers MUST verify positives
  * with an exact join ([[graft.operators.Curation.incrementalNew]]),
  * which makes the composed operator exact — the filter only decides
  * how few rows reach the verify join.
  */
case class BloomMightContain(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_might_contain"

  @transient private lazy val bloom =
    org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(bloomBytes))

  override def nullSafeEval(v: Any): Any =
    bloom.mightContainBinary(v.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val bf = ctx.addReferenceObj("bloom", bloom,
        classOf[org.apache.spark.util.sketch.BloomFilter].getName)
      s"${ev.value} = $bf.mightContainBinary($s.getBytes());"
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
