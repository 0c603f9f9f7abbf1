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

/** Karp–Rabin rolling hash of a string's UTF-8 bytes (wrapping 64-bit
  * polynomial, base 1000003) — the cheap engine-native document
  * fingerprint (SURVEY §2.E4 production path).
  */
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
