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
  def md5Hash60(bytes: Array[Byte]): Long = {
    val d = md5Local.get()
    d.reset()
    val h = d.digest(bytes)
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
case class PrefixByRarity(child: Expression, cmsBytes: Array[Byte],
    threshold: Double) extends UnaryExpression {

  require(threshold > 0.0 && threshold <= 1.0)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_prefix_by_rarity"

  @transient private lazy val cms =
    org.apache.spark.util.sketch.CountMinSketch.readFrom(cmsBytes)

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
    def bucketOf(bytes: Array[Byte], off: Int, len: Int): Int = {
      md.reset()
      md.update(bytes, off, len)
      val d = md.digest()
      // first 4 digest bytes as the UNSIGNED 32-bit value — exactly
      // conv(substring(md5hex, 1, 8), 16, 10)
      val v = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      (v % m).toInt
    }
    var t = 0
    while (t < nTok) {
      add(bucketOf(b, starts(t), ends(t) - starts(t)))
      t += 1
    }
    t = 0
    while (t < nTok - 1) {
      val l1 = ends(t) - starts(t)
      val l2 = ends(t + 1) - starts(t + 1)
      val gb = new Array[Byte](l1 + 1 + l2)
      System.arraycopy(b, starts(t), gb, 0, l1)
      gb(l1) = 0x20
      System.arraycopy(b, starts(t + 1), gb, l1 + 1, l2)
      add(bucketOf(gb, 0, gb.length))
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
