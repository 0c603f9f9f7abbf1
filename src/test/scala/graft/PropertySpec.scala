package graft

import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.EncodingDetector

/** Property-based invariants for the driver-side primitives (the
  * distributed twins are pinned by the oracle queries; these cover
  * the input space no fixture enumerates).
  */
class PropertySpec extends AnyFunSuite with SparkTestBase {

  /** scalacheck without the scalatestplus shim (not on the cp). */
  private def check(p: Prop): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  test("encoding detector is total and classifies all valid UTF-8 as utf-8 or latin-1(ascii)") {
    check(Prop.forAll(Gen.listOf(Gen.asciiPrintableChar)) { chars =>
      val s = chars.mkString
      val verdict = EncodingDetector.detectBytes(s.getBytes("UTF-8"))
      verdict == EncodingDetector.Latin1 || verdict == EncodingDetector.Utf8
    })
    check(Prop.forAll(Gen.nonEmptyListOf(
      Gen.oneOf[String]("é", "ü", "ß", "中", "😀"))) { parts =>
      EncodingDetector.detectBytes(parts.mkString.getBytes("UTF-8")) ==
        EncodingDetector.Utf8
    })
  }

  test("encoding detector never throws on arbitrary bytes") {
    check(Prop.forAll(Gen.containerOf[Array, Byte](
      Gen.chooseNum(Byte.MinValue, Byte.MaxValue))) { bytes =>
      val v = EncodingDetector.detectBytes(bytes)
      Set(EncodingDetector.Utf8, EncodingDetector.Latin1,
        EncodingDetector.Cp1252,
        EncodingDetector.Utf16LE, EncodingDetector.Utf16BE,
        EncodingDetector.Utf32LE, EncodingDetector.Utf32BE,
        EncodingDetector.ShiftJis, EncodingDetector.EucFamily,
        EncodingDetector.EucKr, EncodingDetector.EucJp,
        EncodingDetector.Gbk, EncodingDetector.Cp1251,
        EncodingDetector.Koi8R, EncodingDetector.Cp1253,
        EncodingDetector.Cp1256, EncodingDetector.Cp1255,
        EncodingDetector.Tis620).contains(v)
    })
  }

  test("latin-1 decode of any byte sequence round-trips (the widening rationale)") {
    // The reference widens ascii→latin-1 because latin-1 maps every
    // byte; this is the property that makes the fallback lossless.
    check(Prop.forAll(Gen.containerOf[Array, Byte](
      Gen.chooseNum(Byte.MinValue, Byte.MaxValue))) { bytes =>
      val decoded = new String(bytes, "ISO-8859-1")
      java.util.Arrays.equals(decoded.getBytes("ISO-8859-1"), bytes)
    })
  }

  test("integer-verdict strings always parse as long (cast safety)") {
    val intLike = for {
      sign <- Gen.oneOf("", "+", "-")
      digits <- Gen.chooseNum(0L, Long.MaxValue / 2)
      padL <- Gen.oneOf("", " ", "  ")
      padR <- Gen.oneOf("", " ")
    } yield s"$padL$sign$digits$padR"
    check(Prop.forAll(intLike) { s =>
      // the inference regex accepts it ⇒ the applied cast must not null
      val matches = s.trim.matches("^[+-]?[0-9]+$")
      !matches || scala.util.Try(s.trim.toLong).isSuccess
    })
  }

  test("rolling hash is a function of content only") {
    import graft.functions.expressions.RollingHash64
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.unsafe.types.UTF8String
    def h(s: String): Long =
      RollingHash64(Literal(UTF8String.fromString(s),
        org.apache.spark.sql.types.StringType))
        .eval(null).asInstanceOf[Long]
    check(Prop.forAll(Gen.alphaNumStr, Gen.alphaNumStr) { (a, b) =>
      (a == b) == (h(a) == h(b)) || a != b // equal content ⇒ equal hash;
      // distinct content may collide (64-bit), so only the forward
      // implication is law
    })
    check(Prop.forAll(Gen.alphaNumStr) { a => h(a) == h(a) })
  }

  test("simhash of permuted token multiset is identical (order-free votes)") {
    import graft.functions.expressions.SimHash60
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types.{ArrayType, StringType}
    import org.apache.spark.unsafe.types.UTF8String
    def sim(toks: Seq[String]): Long =
      SimHash60(Literal(
        new GenericArrayData(toks.map(UTF8String.fromString).toArray),
        ArrayType(StringType))).eval(null).asInstanceOf[Long]
    check(Prop.forAll(Gen.nonEmptyListOf(Gen.alphaStr), Gen.long) {
      (toks, seed) =>
        val shuffled = new scala.util.Random(seed).shuffle(toks)
        sim(toks) == sim(shuffled)
    })
  }

  test("z-order curve is monotone per coordinate and injective on its bit budget") {
    import graft.functions.expressions.ZOrderLong
    import org.apache.spark.sql.catalyst.expressions.Literal
    def z(a: Long, b: Long): Long =
      ZOrderLong(Seq(Literal(a), Literal(b))).eval(null).asInstanceOf[Long]
    // mask into the 31-bit domain INSIDE the property: scalacheck's
    // shrinker wanders outside chooseNum's range (e.g. to -1)
    val mask = (1L << 31) - 1
    val anyL = Gen.long
    // monotone: the property that lets per-file curve ranges derive
    // from min/max corner stats (GraftDatabase.fileRanges)
    check(Prop.forAll(anyL, anyL, anyL, anyL) { (a0, d1, b0, d2) =>
      val a = a0 & mask; val b = b0 & mask
      val a2 = math.min(a + (d1 & 7), mask)
      val b2 = math.min(b + (d2 & 7), mask)
      z(a, b) <= z(a2, b2)
    })
    check(Prop.forAll(anyL, anyL, anyL, anyL) { (x1, x2, y1, y2) =>
      val (a1, a2, b1, b2) = (x1 & mask, x2 & mask, y1 & mask, y2 & mask)
      (z(a1, b1) == z(a2, b2)) == (a1 == a2 && b1 == b2)
    })
    check(Prop.forAll(anyL, anyL) { (a, b) => z(a & mask, b & mask) >= 0 })
  }

  test("bloom filter has no false negatives over arbitrary string sets") {
    import graft.functions.expressions.BloomMightContain
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.util.sketch.BloomFilter
    check(Prop.forAll(Gen.nonEmptyListOf(Gen.alphaNumStr)) { members =>
      val bf = BloomFilter.create(math.max(members.size.toLong, 1L), 0.01)
      members.foreach(bf.putString)
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos)
      val probe = BloomMightContain(Literal("x"), bos.toByteArray)
      members.forall(m =>
        probe.copy(child = Literal(m)).eval(null).asInstanceOf[Boolean])
    })
  }

  test("lm score byte tokenizer agrees with string-split reference on " +
      "arbitrary unicode docs and models") {
    // the expression tokenizes raw UTF-8 bytes; the invariant under
    // test is that the byte scan never splits a multi-byte codepoint
    // and draws exactly java-\\s token boundaries — the arithmetic
    // itself is pinned by the DuckDB oracle and the join-equality spec
    val vocabGen = Gen.oneOf("a", "b", "cat", "dog", "中文", "héllo",
      "naïve", "😀x", "x1", "!?")
    val sepGen = Gen.oneOf(" ", "  ", "\t", "\n", " \r ")
    val docGen = for {
      toks <- Gen.listOfN(8, vocabGen)
      seps <- Gen.listOfN(8, sepGen)
    } yield toks.zip(seps).map { case (t, sp) => t + sp }.mkString
    val modelGen = Gen.nonEmptyListOf(for {
      w1 <- vocabGen; w2 <- vocabGen; c <- Gen.chooseNum(1L, 50L)
    } yield (w1, w2, c))
    val sc = spark.sparkContext
    check(Prop.forAllNoShrink(docGen, modelGen) { (text, model) =>
      val m = new java.util.HashMap[
        org.apache.spark.unsafe.types.UTF8String, java.lang.Long]()
      val u8 = org.apache.spark.unsafe.types.UTF8String.fromString _
      val plain = scala.collection.mutable.Map[String, Long]()
      model.foreach { case (w1, w2, c) =>
        m.merge(u8(w1 + " " + w2), java.lang.Long.valueOf(c),
          (a, b) => java.lang.Long.valueOf(a.longValue() + b.longValue()))
        m.merge(u8(w1), java.lang.Long.valueOf(c),
          (a, b) => java.lang.Long.valueOf(a.longValue() + b.longValue()))
        plain(w1 + " " + w2) = plain.getOrElse(w1 + " " + w2, 0L) + c
        plain(w1) = plain.getOrElse(w1, 0L) + c
      }
      val v = model.flatMap(t => Seq(t._1, t._2)).distinct.size.toLong
      val expr = graft.functions.expressions.LmScore(
        org.apache.spark.sql.catalyst.expressions.Literal("x"),
        sc.broadcast(m), v)
      val got = expr.score(u8(text))
      val toks = text.split("[ \t\n\u000B\f\r]+").filter(_.nonEmpty)
      if (toks.length < 2) got == null
      else {
        val row = got.asInstanceOf[
          org.apache.spark.sql.catalyst.InternalRow]
        var sum = 0L; var oov = 0L
        toks.sliding(2).foreach { case Array(a, b) =>
          val c2 = plain.getOrElse(a + " " + b, 0L)
          val c1 = plain.getOrElse(a, 0L)
          if (c2 == 0L) oov += 1
          val pr = (c2 + 0.5) / (c1.toDouble + 0.5 * v)
          val mb = -(java.lang.StrictMath.log(pr) /
            java.lang.StrictMath.log(2)) * 1000.0
          sum += java.math.BigDecimal.valueOf(mb)
            .setScale(0, java.math.RoundingMode.HALF_UP)
            .doubleValue().toLong
          ()
        }
        row.getLong(0) == toks.length - 1 && row.getLong(1) == oov &&
          row.getLong(2) == sum
      }
    })
  }
}
