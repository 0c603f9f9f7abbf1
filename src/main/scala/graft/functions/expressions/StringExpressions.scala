package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass whitespace normalization (SURVEY.md §2.E4): collapse
  * every run of ASCII whitespace to one space and strip leading /
  * trailing runs — byte-for-byte what
  * `trim(regexp_replace(c, "\\s+", " "))` produces, without the
  * regex engine, the UTF8String→java.lang.String round-trip, or the
  * two intermediate allocations that chain costs per row.
  *
  * The whitespace set is Java's `\s` = {0x09..0x0D, 0x20} — all
  * single-byte in UTF-8, and a multi-byte codepoint's continuation
  * bytes have the high bit set, so a pure byte scan can never split
  * or misread one. (Unicode spaces like U+00A0 are NOT collapsed —
  * same as the regex form this replaces and the DuckDB oracle's
  * `\s`.)
  */
case class CollapseWs(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_collapse_ws"

  def collapse(s: UTF8String): UTF8String = {
    val b = s.getBytes
    val n = b.length
    var i = 0
    // fast path: already normalized (single interior 0x20s only, no
    // edge whitespace) — return the input untouched, zero allocation
    var dirty = false
    var prevWs = true // leading ws counts as dirty
    while (i < n && !dirty) {
      val c = b(i)
      val ws = c == 0x20 || (c >= 0x09 && c <= 0x0D)
      if (ws && (prevWs || c != 0x20)) dirty = true
      else { prevWs = ws; i += 1 }
    }
    if (!dirty && !prevWs) return s
    val out = new Array[Byte](n)
    var o = 0
    var pendingSpace = false
    i = 0
    while (i < n) {
      val c = b(i)
      if (c == 0x20 || (c >= 0x09 && c <= 0x0D)) {
        if (o > 0) pendingSpace = true
      } else {
        if (pendingSpace) { out(o) = 0x20; o += 1; pendingSpace = false }
        out(o) = c
        o += 1
      }
      i += 1
    }
    UTF8String.fromBytes(out, 0, o)
  }

  override def nullSafeEval(v: Any): Any = collapse(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val ref = ctx.addReferenceObj("collapseWs", this,
        classOf[CollapseWs].getName)
      s"${ev.value} = $ref.collapse($s);"
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** All positional word n-grams for n ∈ [minN, maxN] in one byte scan
  * (SURVEY.md §2.E9/E5): tokenize on ASCII whitespace — byte-exact
  * with `regexp_extract_all(c, "\\S+")`, since Java's `\S` is the
  * complement of {0x09..0x0D, 0x20} and UTF-8 continuation bytes
  * never collide with it — then emit each n-gram as the
  * space-joined token run, unigrams first, multiplicities kept.
  *
  * Replaces the regex engine (UTF8String→String→Matcher→per-match
  * allocation) AND the `zip_with`/`concat_ws` bigram chain —
  * higher-order functions are CodegenFallback, so every element pair
  * paid an interpreted lambda dispatch; this is one tight loop over
  * the raw bytes, copying each n-gram's span directly (tokens of one
  * n-gram are adjacent in the source, but possibly separated by
  * multi-char whitespace runs, so spans are re-joined with single
  * spaces rather than sliced verbatim).
  */
case class WsNgrams(child: Expression, minN: Int, maxN: Int)
    extends UnaryExpression {

  require(minN >= 1 && maxN >= minN)

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_ws_ngrams"

  def grams(s: UTF8String): ArrayData = {
    val b = s.getBytes
    val n = b.length
    // token spans
    var starts = new Array[Int](16)
    var ends = new Array[Int](16)
    var nTok = 0
    var i = 0
    while (i < n) {
      val c = b(i)
      if (!(c == 0x20 || (c >= 0x09 && c <= 0x0D))) {
        val st = i
        while (i < n && {
          val d = b(i); !(d == 0x20 || (d >= 0x09 && d <= 0x0D))
        }) i += 1
        if (nTok == starts.length) {
          starts = java.util.Arrays.copyOf(starts, nTok * 2)
          ends = java.util.Arrays.copyOf(ends, nTok * 2)
        }
        starts(nTok) = st
        ends(nTok) = i
        nTok += 1
      } else i += 1
    }
    var total = 0
    var g = minN
    while (g <= maxN) { total += math.max(0, nTok - g + 1); g += 1 }
    val out = new Array[AnyRef](total)
    var o = 0
    g = minN
    while (g <= maxN) {
      var t = 0
      val last = nTok - g
      while (t <= last) {
        if (g == 1) {
          out(o) = UTF8String.fromBytes(b, starts(t), ends(t) - starts(t))
        } else {
          var len = g - 1
          var j = 0
          while (j < g) { len += ends(t + j) - starts(t + j); j += 1 }
          val gb = new Array[Byte](len)
          var p = 0
          j = 0
          while (j < g) {
            if (j > 0) { gb(p) = 0x20; p += 1 }
            val tl = ends(t + j) - starts(t + j)
            System.arraycopy(b, starts(t + j), gb, p, tl)
            p += tl
            j += 1
          }
          out(o) = UTF8String.fromBytes(gb)
        }
        o += 1
        t += 1
      }
      g += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(v: Any): Any = grams(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val ref = ctx.addReferenceObj("wsNgrams", this,
        classOf[WsNgrams].getName)
      s"${ev.value} = $ref.grams($s);"
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Distinct whitespace tokens of ONE document with their
  * multiplicities, as `array<struct<term string, tf bigint>>` in
  * first-occurrence order (SURVEY.md §2.E5).
  *
  * Term frequency is a within-document statistic — the corpus-wide
  * `explode → GROUP BY (doc, term)` formulation shuffles every token
  * of the corpus to compute something each row already contains.
  * Emitting (term, tf) per row instead makes the downstream document
  * frequency a tiny vocabulary-sized aggregation (distinct terms per
  * doc ARE the df events) and keeps each document's pairs contiguous
  * in its scan partition, so a following per-doc top-k reduces fully
  * map-side. Tokenization is the [[WsNgrams]] byte scan
  * (`\S+`-exact); counts use UTF8String equality = byte equality,
  * same as SQL string grouping.
  */
case class TermCounts(child: Expression, minN: Int = 1, maxN: Int = 1)
    extends UnaryExpression {

  require(minN >= 1 && maxN >= minN)

  override def dataType: DataType = org.apache.spark.sql.types.ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("term", StringType,
        nullable = false),
      org.apache.spark.sql.types.StructField("tf",
        org.apache.spark.sql.types.LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_term_counts"

  def counts(s: UTF8String): ArrayData = {
    val b = s.getBytes
    val sp = TokenScan.scan(b)
    val starts = sp.starts; val ends = sp.ends; val nTok = sp.n
    val m = new java.util.LinkedHashMap[UTF8String, Array[Long]]()
    var gramN = minN
    while (gramN <= maxN) {
      var t = 0
      val last = nTok - gramN
      while (t <= last) {
        val g =
          if (gramN == 1)
            UTF8String.fromBytes(b, starts(t), ends(t) - starts(t))
          else {
            var len = gramN - 1
            var j = 0
            while (j < gramN) { len += ends(t + j) - starts(t + j); j += 1 }
            val gb = new Array[Byte](len)
            var p = 0
            j = 0
            while (j < gramN) {
              if (j > 0) { gb(p) = 0x20; p += 1 }
              val tl = ends(t + j) - starts(t + j)
              System.arraycopy(b, starts(t + j), gb, p, tl)
              p += tl
              j += 1
            }
            UTF8String.fromBytes(gb)
          }
        val cnt = m.get(g)
        if (cnt == null) m.put(g, Array(1L)) else cnt(0) += 1L
        t += 1
      }
      gramN += 1
    }
    val out = new Array[AnyRef](m.size())
    val it = m.entrySet().iterator()
    var o = 0
    while (it.hasNext) {
      val e = it.next()
      out(o) = new org.apache.spark.sql.catalyst.expressions
        .GenericInternalRow(Array[Any](e.getKey, e.getValue()(0)))
      o += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(v: Any): Any = counts(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val ref = ctx.addReferenceObj("termCounts", this,
        classOf[TermCounts].getName)
      s"${ev.value} = $ref.counts($s);"
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** E10 fast path: score one document's bigram-LM fluency in a single
  * byte pass against BROADCAST corpus count maps — the stats-gated
  * twin of the join formulation in
  * [[graft.operators.TextQueries.fluency]] (same gating idea as
  * H13's ANALYZE-driven broadcast): when the aggregated vocabulary
  * fits the driver bound, shipping it to every executor replaces the
  * corpus-scale explode→join→re-aggregate tail with this one
  * map-side projection. Numerator Σ_slots c2(w_i w_{i+1}) and
  * denominator Σ_slots c1(w_i) accumulate as exact longs over the
  * document's bigram slots — identical, term for term, to the join
  * path's Σ_distinct tf·c — and the single long→double division at
  * the end is the same arithmetic, so the two paths hash-match
  * bit-for-bit. Returns null for documents with <2 tokens: the join
  * path's inner join emits no pair row for them, and the caller's
  * filter drops the nulls to keep the output sets identical.
  *
  * The maps ride a Spark [[org.apache.spark.broadcast.Broadcast]]
  * (one copy per executor, torrent-distributed), NOT the expression's
  * task binary — serializing `this` captures only the broadcast
  * stub.
  */
case class FluencyScore(child: Expression,
    counts: org.apache.spark.broadcast.Broadcast[
      java.util.HashMap[UTF8String, java.lang.Long]])
    extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("fluency",
      org.apache.spark.sql.types.DoubleType, nullable = false),
    org.apache.spark.sql.types.StructField("n_bigrams",
      org.apache.spark.sql.types.LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_fluency_score"

  def score(s: UTF8String): Any = {
    val b = s.getBytes
    val n = b.length
    var starts = new Array[Int](16)
    var ends = new Array[Int](16)
    var nTok = 0
    var i = 0
    while (i < n) {
      val c = b(i)
      if (!(c == 0x20 || (c >= 0x09 && c <= 0x0D))) {
        val st = i
        while (i < n && {
          val d = b(i); !(d == 0x20 || (d >= 0x09 && d <= 0x0D))
        }) i += 1
        if (nTok == starts.length) {
          starts = java.util.Arrays.copyOf(starts, nTok * 2)
          ends = java.util.Arrays.copyOf(ends, nTok * 2)
        }
        starts(nTok) = st
        ends(nTok) = i
        nTok += 1
      } else i += 1
    }
    if (nTok < 2) return null
    // one map serves both gram kinds: a unigram key never contains
    // 0x20, a bigram key always does (the E9 classification trick)
    val m = counts.value
    var num = 0L
    var den = 0L
    var t = 0
    while (t < nTok - 1) {
      val l1 = ends(t) - starts(t)
      // unigram lookup keys are zero-copy slices of the input bytes
      val c1 = m.get(UTF8String.fromBytes(b, starts(t), l1))
      if (c1 != null) den += c1.longValue()
      val l2 = ends(t + 1) - starts(t + 1)
      val gb = new Array[Byte](l1 + 1 + l2)
      System.arraycopy(b, starts(t), gb, 0, l1)
      gb(l1) = 0x20
      System.arraycopy(b, starts(t + 1), gb, l1 + 1, l2)
      val c2 = m.get(UTF8String.fromBytes(gb))
      if (c2 != null) num += c2.longValue()
      t += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](num.toDouble / den.toDouble, (nTok - 1).toLong))
  }

  override def nullSafeEval(v: Any): Any = score(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val ref = ctx.addReferenceObj("fluencyScore", this,
        classOf[FluencyScore].getName)
      s"""${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $ref.score($s);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** E5 fast path: one document's top-k TF-IDF terms in a single byte
  * pass against a BROADCAST document-frequency map — the same
  * stats-gated twin [[FluencyScore]] is for E10. Per distinct term:
  * tfidf = tf · (N / df), the double arithmetic in exactly the join
  * path's order (`tf.cast(double) * (N.cast(double) / df.cast
  * (double))`), so values hash-match bit-for-bit. Selection order is
  * the H5 TopKPerGroup contract: tfidf desc, then term asc by binary
  * (UTF8String byte) comparison; rank is the 1-based position.
  * Returns the (term, rank, tfidf) structs in rank order — the
  * caller explodes them; a doc with no tokens yields the empty
  * array, matching the join path's absent rows.
  */
case class TfidfTop3(child: Expression,
    df: org.apache.spark.broadcast.Broadcast[
      java.util.HashMap[UTF8String, java.lang.Long]],
    nDocs: Long, k: Int = 3)
    extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("term", StringType,
        nullable = false),
      org.apache.spark.sql.types.StructField("rank",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("tfidf",
        org.apache.spark.sql.types.DoubleType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_tfidf_top3"

  def top(s: UTF8String): ArrayData = {
    val b = s.getBytes
    val n = b.length
    val m = new java.util.LinkedHashMap[UTF8String, Array[Long]]()
    var i = 0
    while (i < n) {
      val c = b(i)
      if (!(c == 0x20 || (c >= 0x09 && c <= 0x0D))) {
        val st = i
        while (i < n && {
          val d = b(i); !(d == 0x20 || (d >= 0x09 && d <= 0x0D))
        }) i += 1
        val t = UTF8String.fromBytes(b, st, i - st)
        val cnt = m.get(t)
        if (cnt == null) m.put(t, Array(1L)) else cnt(0) += 1L
      } else i += 1
    }
    val nD = nDocs.toDouble
    val dfm = df.value
    // bounded top-k selection: k is tiny (3), linear insertion wins
    val terms = new Array[UTF8String](k)
    val scores = new Array[Double](k)
    var filled = 0
    val it = m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val dfv = dfm.get(e.getKey)
      val score =
        if (dfv == null) 0.0 // unreachable: df built from this corpus
        else e.getValue()(0).toDouble * (nD / dfv.longValue().toDouble)
      // position: after every entry that beats (score desc, term asc)
      var p = filled
      while (p > 0 && (scores(p - 1) < score ||
          (scores(p - 1) == score &&
            terms(p - 1).compareTo(e.getKey) > 0))) p -= 1
      if (p < k) {
        var q = math.min(filled, k - 1)
        while (q > p) {
          terms(q) = terms(q - 1); scores(q) = scores(q - 1); q -= 1
        }
        terms(p) = e.getKey
        scores(p) = score
        if (filled < k) filled += 1
      }
    }
    val out = new Array[AnyRef](filled)
    var o = 0
    while (o < filled) {
      out(o) = new org.apache.spark.sql.catalyst.expressions
        .GenericInternalRow(Array[Any](terms(o), o + 1, scores(o)))
      o += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(v: Any): Any = top(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val ref = ctx.addReferenceObj("tfidfTop3", this,
        classOf[TfidfTop3].getName)
      s"${ev.value} = $ref.top($s);"
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `\S+` token count in one byte pass — the value of
  * `size(regexp_extract_all(c, "\\S+", 0))` (the split every oracle
  * mirrors; equivalence to the regex form is pinned transitively by
  * the GateStats fusion spec, whose n_ws is the same count) without
  * the regex engine or the materialized match array. wsTokenCount is
  * on nearly every curation hot path (gates, packing, budgets, the
  * E21 train filter), which made the regex form a per-operator tax.
  */
case class TokenCount(child: Expression) extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "graft_token_count"

  def cnt(s: UTF8String): Int = {
    val b = s.getBytes
    val len = b.length
    var n = 0
    var inTok = false
    var i = 0
    while (i < len) {
      val c = b(i)
      val isWs = c == 0x20 || (c >= 0x09 && c <= 0x0D)
      if (!isWs && !inTok) { n += 1; inTok = true }
      else if (isWs) inTok = false
      i += 1
    }
    n
  }

  override def nullSafeEval(v: Any): Any = cnt(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val ref = ctx.addReferenceObj("tokenCount", this,
        classOf[TokenCount].getName)
      s"${ev.value} = $ref.cnt($s);"
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** All quality/language gate inputs in ONE byte pass (SURVEY.md
  * §2.C8/E2/E3): `struct(n_chars, n_ws, n_punct, c_en, c_de, c_es,
  * c_fr)` = (character count, `\S+` token count, `[.,!?;:]` count,
  * and the four `\b(stopwords)\b` profile counts). The regex
  * formulation runs SEVEN `regexp_extract_all` passes per document —
  * each a UTF8String→String conversion plus a java.util.regex
  * traversal; this is one scan of the raw bytes.
  *
  * Fidelity notes, all pinned by spec against the regex forms:
  * characters = non-continuation UTF-8 bytes; whitespace is Java's
  * ASCII `\s`; `\b`/`\w` are ASCII in both Java and RE2, so a
  * stopword match ≡ a maximal `[A-Za-z0-9_]` run equal to the word —
  * every profile word is ≤4 ASCII bytes, so runs pack into an Int
  * and membership is a switch over packed constants (case-sensitive,
  * like the regex).
  */
case class GateStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.StructType(
    Seq("n_chars", "n_ws", "n_punct", "c_en", "c_de", "c_es", "c_fr")
      .map(n => org.apache.spark.sql.types.StructField(n,
        org.apache.spark.sql.types.LongType, nullable = false)))
  override def prettyName: String = "graft_gate_stats"

  // Profiles packed as big-endian bytes of the ≤4-char word, looked
  // up in ONE primitive open-address table (key → profile bitmask,
  // bit p = profile p contains the word; "que" is es|fr). The first
  // cut used four java.util.HashMap[Integer,_].containsKey probes
  // per word run — four Integer boxes per token across the whole
  // corpus made the gate scan ~4× the plain tokenize pass at the 10×
  // board. No packed word is 0, so key 0 marks an empty slot.
  @transient private lazy val (tblKeys, tblMask) = {
    val profiles = Seq(
      Seq("the", "and", "of", "to", "is", "in", "it", "a"),
      Seq("der", "die", "und", "das", "ist", "ein", "zu"),
      Seq("el", "los", "las", "una", "es", "y", "que"),
      Seq("le", "les", "et", "est", "une", "dans", "que"))
    val keys = new Array[Int](64)
    val mask = new Array[Int](64)
    for ((ws, p) <- profiles.zipWithIndex; w <- ws) {
      var v = 0
      w.getBytes("US-ASCII").foreach(b => v = (v << 8) | (b & 0xFF))
      var h = (v * 0x9E3779B1) >>> 26
      while (keys(h) != 0 && keys(h) != v) h = (h + 1) & 63
      keys(h) = v
      mask(h) |= 1 << p
    }
    (keys, mask)
  }

  def stats(s: UTF8String): Any = {
    val b = s.getBytes
    val n = b.length
    var chars = 0L
    var ws = 0L
    var punct = 0L
    val c = new Array[Long](4)
    var inTok = false // inside a \S+ run
    var runV = 0      // packed bytes of current \w run (≤4 chars)
    var runLen = 0    // -1 = run too long / non-candidate
    val keys = tblKeys
    val masks = tblMask
    def endRun(): Unit = {
      if (runLen >= 1 && runLen <= 4) {
        var h = (runV * 0x9E3779B1) >>> 26
        while (keys(h) != 0 && keys(h) != runV) h = (h + 1) & 63
        if (keys(h) == runV) {
          val m = masks(h)
          if ((m & 1) != 0) c(0) += 1L
          if ((m & 2) != 0) c(1) += 1L
          if ((m & 4) != 0) c(2) += 1L
          if ((m & 8) != 0) c(3) += 1L
        }
      }
      runV = 0
      runLen = 0
    }
    var i = 0
    while (i < n) {
      val v = b(i) & 0xFF
      if ((v & 0xC0) != 0x80) chars += 1L
      val isWs = v == 0x20 || (v >= 0x09 && v <= 0x0D)
      if (!isWs && !inTok) { ws += 1L; inTok = true }
      else if (isWs) inTok = false
      if (v == '.' || v == ',' || v == '!' || v == '?' || v == ';' ||
        v == ':') punct += 1L
      // ≥0x80 continues a word run: Java's \b is Unicode-aware (é is
      // a word char for boundary purposes even though \w is ASCII),
      // so 'caféthe' must NOT count a 'the'. This matches Java for
      // non-ASCII letters; non-ASCII PUNCTUATION adjacent to a
      // stopword diverges (Java would boundary there) — and RE2's
      // ASCII \b diverges from Java on BOTH, so outside ASCII there
      // is no cross-engine-consistent answer anyway. The oracle
      // corpus is ASCII, where all three definitions coincide.
      val isWord = (v >= 'a' && v <= 'z') || (v >= 'A' && v <= 'Z') ||
        (v >= '0' && v <= '9') || v == '_' || v >= 0x80
      if (isWord) {
        if (runLen >= 0) {
          if (runLen < 4) { runV = (runV << 8) | v; runLen += 1 }
          else runLen = -1 // too long: not a profile word
        }
      } else {
        if (runLen != 0) { if (runLen > 0) endRun() else { runLen = 0; runV = 0 } }
      }
      i += 1
    }
    if (runLen > 0) endRun()
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](chars, ws, punct, c(0), c(1), c(2), c(3)))
  }

  override def nullSafeEval(v: Any): Any = stats(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val ref = ctx.addReferenceObj("gateStats", this,
        classOf[GateStats].getName)
      s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $ref.stats($s);"
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Per-document repetition statistics in one pass (SURVEY.md §2.E9):
  * `struct(n_uni, m_uni, n_bi, d_bi, m_bi)` = (token count, top-token
  * multiplicity, bigram-slot count, distinct bigrams, top-bigram
  * multiplicity); null when the document has fewer than two tokens
  * (no bigram slot — the oracle's inner join drops those rows).
  *
  * Repetition metrics are functions of ONE document alone; a SQL
  * engine has to phrase them as corpus-wide explode → GROUP BY
  * (doc, gram) → GROUP BY doc, shuffling every gram of the corpus
  * twice. Here the mode/distinct counts come from a per-row local
  * hash table instead, so the operator is a pure map — zero
  * exchanges at any scale, and per-row memory bounded by the single
  * largest document (the same working set the SQL form's final
  * per-doc group holds). Tokenization is the [[WsNgrams]] byte scan
  * (`\S+`-exact).
  */
case class RepetitionStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.StructType(
    Seq("n_uni", "m_uni", "n_bi", "d_bi", "m_bi").map(n =>
      org.apache.spark.sql.types.StructField(n,
        org.apache.spark.sql.types.LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_repetition_stats"

  def stats(s: UTF8String): Any = {
    val b = s.getBytes
    val n = b.length
    var starts = new Array[Int](16)
    var ends = new Array[Int](16)
    var nTok = 0
    var i = 0
    while (i < n) {
      val c = b(i)
      if (!(c == 0x20 || (c >= 0x09 && c <= 0x0D))) {
        val st = i
        while (i < n && {
          val d = b(i); !(d == 0x20 || (d >= 0x09 && d <= 0x0D))
        }) i += 1
        if (nTok == starts.length) {
          starts = java.util.Arrays.copyOf(starts, nTok * 2)
          ends = java.util.Arrays.copyOf(ends, nTok * 2)
        }
        starts(nTok) = st
        ends(nTok) = i
        nTok += 1
      } else i += 1
    }
    if (nTok < 2) return null
    val uni = new java.util.HashMap[UTF8String, Array[Int]]()
    var mUni = 0
    i = 0
    while (i < nTok) {
      val t = UTF8String.fromBytes(b, starts(i), ends(i) - starts(i))
      var c = uni.get(t)
      if (c == null) { c = Array(0); uni.put(t, c) }
      c(0) += 1
      if (c(0) > mUni) mUni = c(0)
      i += 1
    }
    val bi = new java.util.HashMap[UTF8String, Array[Int]]()
    var mBi = 0
    i = 0
    while (i < nTok - 1) {
      val len = ends(i) - starts(i) + ends(i + 1) - starts(i + 1) + 1
      val gb = new Array[Byte](len)
      val l0 = ends(i) - starts(i)
      System.arraycopy(b, starts(i), gb, 0, l0)
      gb(l0) = 0x20
      System.arraycopy(b, starts(i + 1), gb, l0 + 1,
        ends(i + 1) - starts(i + 1))
      val t = UTF8String.fromBytes(gb)
      var c = bi.get(t)
      if (c == null) { c = Array(0); bi.put(t, c) }
      c(0) += 1
      if (c(0) > mBi) mBi = c(0)
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nTok.toLong, mUni.toLong, (nTok - 1).toLong,
        bi.size().toLong, mBi.toLong))
  }

  override def nullSafeEval(v: Any): Any = stats(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val ref = ctx.addReferenceObj("repStats", this,
        classOf[RepetitionStats].getName)
      s"""
         |${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $ref.stats($s);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** E19 fast path: one document's exact millibit-quantized bigram-LM
  * score in a single byte pass against BROADCAST model counts — the
  * stats-gated twin [[FluencyScore]] is for E10, applied to
  * perplexity scoring. One map serves contexts and bigrams (the E9
  * trick: a context key never contains 0x20, a bigram key always
  * does). Per bigram slot, the arithmetic replicates the join path's
  * expression tree OPERATION FOR OPERATION so outputs hash-match
  * bit-for-bit: p = (c2+0.5)/((double)c1 + 0.5·V); Spark's log2 is
  * `StrictMath.log(x)/StrictMath.log(2)` (verified against the
  * catalyst jar's Log2 codegen template) and Spark's round(double)
  * is BigDecimal-valueOf HALF_UP — both reproduced literally. The
  * quantized millibits then accumulate as exact longs, so the
  * per-document fold is order-free, like the join path's sum.
  * Returns null for <2-token documents (the join path emits no pair
  * row for them).
  */

/** Shared ASCII-whitespace byte tokenizer for the single-pass text
  * expressions (LmScore / TrigramLmScore / TermCounts, and
  * DsirBucketCounts in HashExpressions): token spans over the UTF-8
  * bytes, splitting on 0x20 and 0x09–0x0D — exactly `\\S+` under
  * Java's default (ASCII) `\\s`, which is what every oracle uses.
  * ONE definition: the spec-pinned cross-engine equalities of all
  * four expressions ride this predicate, so a whitespace tweak lands
  * here once or nowhere (review r7 — there were three drifting
  * copies).
  */
private[expressions] object TokenScan {
  final class Spans(val starts: Array[Int], val ends: Array[Int],
    val n: Int)

  def scan(b: Array[Byte]): Spans = {
    val len = b.length
    var starts = new Array[Int](16)
    var ends = new Array[Int](16)
    var nTok = 0
    var i = 0
    while (i < len) {
      val c = b(i)
      if (!(c == 0x20 || (c >= 0x09 && c <= 0x0D))) {
        val st = i
        while (i < len && {
          val d = b(i); !(d == 0x20 || (d >= 0x09 && d <= 0x0D))
        }) i += 1
        if (nTok == starts.length) {
          starts = java.util.Arrays.copyOf(starts, nTok * 2)
          ends = java.util.Arrays.copyOf(ends, nTok * 2)
        }
        starts(nTok) = st
        ends(nTok) = i
        nTok += 1
      } else i += 1
    }
    new Spans(starts, ends, nTok)
  }
}

/** E21 fast path: exact millibit interpolated-trigram score of a
  * text column in one byte pass against broadcast model counts —
  * the [[LmScore]] treatment one n-gram order up. The map carries
  * all three count tables at once (trigram "w1 w2 w3", bigram
  * "w1 w2", unigram "w" keys never collide: tokens contain no
  * whitespace), `n`/`v` are the train split's token total and
  * distinct count. Arithmetic replicates the join path operation for
  * operation (exact long→double divisions, the FIXED interpolation
  * parenthesization, StrictMath log2, BigDecimal HALF_UP round) —
  * spec-pinned bit-identical. Null for <3-token docs.
  */
case class TrigramLmScore(child: Expression,
    counts: org.apache.spark.broadcast.Broadcast[
      java.util.HashMap[UTF8String, java.lang.Long]],
    n: Long, v: Long)
    extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("n_trigrams",
      org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField("oov",
      org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField("sum_mb",
      org.apache.spark.sql.types.LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_trigram_lm_score"

  require(v > 0 && n > 0,
    "empty trigram LM model: the train split has no >=3-token documents")

  private val ln2 = java.lang.StrictMath.log(2)

  private def cnt(m: java.util.HashMap[UTF8String, java.lang.Long],
      k: UTF8String): Long = {
    val x = m.get(k); if (x != null) x.longValue() else 0L
  }

  def score(s: UTF8String): Any = {
    val b = s.getBytes
    val sp = TokenScan.scan(b)
    val starts = sp.starts; val ends = sp.ends; val nTok = sp.n
    if (nTok < 3) return null
    val m = counts.value
    val denomN = n.toDouble + 0.5 * v.toDouble
    var sumMb = 0L
    var oov = 0L
    def gram(a: Int, c: Int): UTF8String = {
      var size = 0
      var j = a
      while (j <= c) { size += ends(j) - starts(j) + 1; j += 1 }
      val gb = new Array[Byte](size - 1)
      var off = 0
      j = a
      while (j <= c) {
        val l = ends(j) - starts(j)
        System.arraycopy(b, starts(j), gb, off, l)
        off += l
        if (j < c) { gb(off) = 0x20; off += 1 }
        j += 1
      }
      UTF8String.fromBytes(gb)
    }
    // position t+1's leading bigram/unigram are position t's trailing
    // ones — carry them instead of rebuilding+re-hashing (review r7)
    var t = 0
    var c2a = if (nTok >= 2) cnt(m, gram(0, 1)) else 0L
    var c1m = if (nTok >= 2) cnt(m, gram(1, 1)) else 0L
    while (t < nTok - 2) {
      val c3 = cnt(m, gram(t, t + 2))
      val c2b = cnt(m, gram(t + 1, t + 2))
      val c1u = cnt(m, gram(t + 2, t + 2))
      if (c3 == 0L) oov += 1L
      val ml3 = if (c2a > 0L) c3.toDouble / c2a.toDouble else 0.0
      val ml2 = if (c1m > 0L) c2b.toDouble / c1m.toDouble else 0.0
      val ml1 = (c1u.toDouble + 0.5) / denomN
      val p = (0.5 * ml3 + 0.3 * ml2) + 0.2 * ml1
      val mb = -(java.lang.StrictMath.log(p) / ln2) * 1000.0
      sumMb += java.math.BigDecimal.valueOf(mb)
        .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue().toLong
      c2a = c2b
      c1m = c1u
      t += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any]((nTok - 2).toLong, oov, sumMb))
  }

  override def nullSafeEval(value: Any): Any =
    score(value.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val ref = ctx.addReferenceObj("trigramLmScore", this,
        classOf[TrigramLmScore].getName)
      s"""${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $ref.score($s);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

case class LmScore(child: Expression,
    counts: org.apache.spark.broadcast.Broadcast[
      java.util.HashMap[UTF8String, java.lang.Long]],
    v: Long)
    extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("n_bigrams",
      org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField("oov",
      org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField("sum_mb",
      org.apache.spark.sql.types.LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_lm_score"

  // an empty model makes every probability infinite — a loud,
  // immediate error beats a NumberFormatException deep in rounding
  // (the repo's ambiguous-verdict rule)
  require(v > 0, "empty LM model: the train split has no ≥2-token documents")

  private val ln2 = java.lang.StrictMath.log(2)

  def score(s: UTF8String): Any = {
    val b = s.getBytes
    val sp = TokenScan.scan(b)
    val starts = sp.starts; val ends = sp.ends; val nTok = sp.n
    if (nTok < 2) return null
    val m = counts.value
    val halfV = 0.5 * v
    var sumMb = 0L
    var oov = 0L
    var t = 0
    while (t < nTok - 1) {
      val l1 = ends(t) - starts(t)
      val c1v = m.get(UTF8String.fromBytes(b, starts(t), l1))
      val c1 = if (c1v != null) c1v.longValue() else 0L
      val l2 = ends(t + 1) - starts(t + 1)
      val gb = new Array[Byte](l1 + 1 + l2)
      System.arraycopy(b, starts(t), gb, 0, l1)
      gb(l1) = 0x20
      System.arraycopy(b, starts(t + 1), gb, l1 + 1, l2)
      val c2v = m.get(UTF8String.fromBytes(gb))
      val c2 = if (c2v != null) c2v.longValue() else 0L
      if (c2 == 0L) oov += 1L
      val p = (c2 + 0.5) / (c1.toDouble + halfV)
      val mb = -(java.lang.StrictMath.log(p) / ln2) * 1000.0
      sumMb += java.math.BigDecimal.valueOf(mb)
        .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue().toLong
      t += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any]((nTok - 1).toLong, oov, sumMb))
  }

  override def nullSafeEval(value: Any): Any =
    score(value.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val ref = ctx.addReferenceObj("lmScore", this,
        classOf[LmScore].getName)
      s"""${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $ref.score($s);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
