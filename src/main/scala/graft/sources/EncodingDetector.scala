package graft.sources

import java.nio.charset.{CharsetDecoder, CodingErrorAction, StandardCharsets}
import java.nio.ByteBuffer

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Charset detection for CSV uploads (SURVEY.md §2.A1).
  *
  * The reference sniffs the first 2 MiB with charset_normalizer and
  * widens a plain-`ascii` verdict to `latin-1`
  * (datasette_upload_csvs/__init__.py:76,129-137). graft re-expresses
  * that as a driver-side sniff of the leading bytes — O(2 MiB) once,
  * independent of file size — after which the actual decode happens
  * distributed inside Spark's CSV reader via its `encoding` option.
  *
  * Detection ladder: BOM → UTF-16-without-BOM NUL-skew heuristic →
  * strict UTF-8 validation → cp1252-vs-latin-1 statistical tiebreak;
  * all-ASCII lands on latin-1 (superset, fewer decode errors — the
  * reference cites its issue #25 for the same choice).
  *
  * Detection ladder addition: Shift-JIS by structural validity plus
  * a kana signal (≥2 two-byte sequences with lead 0x82/0x83 —
  * hiragana/katakana rows; those leads are C1 controls in latin-1 and
  * near-unused punctuation in cp1252, so western text can't produce
  * them as pair leads). Pure-kanji text without any kana is left to
  * the latin-1 fallback — the conservative trade that keeps French/
  * German accent+letter byte pairs (valid SJIS pairs structurally!)
  * from misdetecting.
  *
  * EUC-family (EUC-KR / EUC-JP / GBK) byte streams share one
  * structure — every non-ASCII byte sits in a high+high pair
  * (0xA1–0xFE twice) — so the member is picked STATISTICALLY, the
  * same template as the Shift-JIS kana signal: each member carries a
  * small profile of its language's most frequent characters (top
  * hiragana + kanji for Japanese, top hangul syllables for Korean,
  * top hanzi for Chinese), encoded into that member's byte pairs by
  * the JVM's own charset tables at class-load. Real text concentrates
  * mass on its top characters (の alone is >3% of Japanese; 的 >3% of
  * Chinese; top-60 hangul syllables ≈ half of Korean), while
  * cross-profile hits are near-random (≤60 codes out of ~8000
  * assigned pairs) — so the winner needs BOTH a floor and a margin
  * over the runner-up, and anything ambiguous keeps the explicit
  * [[EucFamily]] verdict and the loud upload failure (wrong-member
  * decode = fluent-looking garbage, worse than an error).
  *
  * EBCDIC is caught structurally: ASCII space 0x20 never appears
  * (EBCDIC space is 0x40) and letters/digits live ≥ 0x81 — counts no
  * ASCII-compatible charset produces. The member (cp037 / cp500 /
  * cp1047 — identical in every letter/digit/space position) is then
  * picked by record-terminator convention (NL 0x15 vs LF 0x25) plus
  * punctuation-byte scoring against the JVM's own charset tables
  * ([[pickEbcdicMember]]).
  *
  * Single-byte scripts (Cyrillic cp1251/KOI8-R, Greek cp1253,
  * Arabic cp1256, Hebrew cp1255, Thai TIS-620) detect via per-script
  * letter profiles with pairwise exclusive-byte margins
  * ([[detectSingleByteScript]]); EBCDIC national variants cp273
  * (German) / cp277 (Danish) join the member contest on a ≥3
  * distinct national-letter gate and win on the letters scoring
  * tier.
  *
  * Remaining undetectable without a full charset_normalizer port
  * (documented gap): cp125x variants beyond the implemented set,
  * EBCDIC codepages outside 037/500/1047/273/277, kana-free
  * pure-kanji Shift-JIS, and lowercase-only Danish cp277 (slot-
  * identical to German cp273 — no byte-level signal exists; an
  * Æ/Å/ø-distinct byte resolves it). Those decode as latin-1 or
  * head-member mojibake, like any non-statistical sniffer would.
  */
object EncodingDetector {

  /** Matches num_bytes_to_detect_with in the reference (__init__.py:76). */
  val DefaultSniffBytes: Int = 2048 * 1024

  val Utf8 = "UTF-8"
  val Latin1 = "ISO-8859-1"
  val Cp1252 = "windows-1252"
  val Utf16LE = "UTF-16LE"
  val Utf16BE = "UTF-16BE"
  val Utf32LE = "UTF-32LE"
  val Utf32BE = "UTF-32BE"
  val ShiftJis = "Shift_JIS"
  val EucFamily = "EUC-FAMILY"
  val EucKr = "EUC-KR"
  val EucJp = "EUC-JP"
  val Gbk = "GBK"
  val Cp1251 = "windows-1251"
  val Koi8R = "KOI8-R"
  /** Greek — also covers ISO-8859-7 streams (identical letter
    * positions; they differ only in currency/punct rows).
    */
  val Cp1253 = "windows-1253"
  /** Arabic. */
  val Cp1256 = "windows-1256"
  /** Hebrew. */
  val Cp1255 = "windows-1255"
  /** Thai. */
  val Tis620 = "TIS-620"
  /** cp037 with NL (0x15) record terminators — the JVM charset's own
    * newline convention (`"\n".getBytes("IBM037")` = 0x15), so the
    * decode splits records with an encoded lineSep.
    */
  val Cp037 = "IBM037"
  /** cp500 (International) — same letter/digit/space zones as cp037,
    * different punctuation positions ('[' at 0x4A, ']' at 0x5A, '!'
    * at 0x4F). Structurally identical to cp037; the member is picked
    * by punctuation-byte scoring ([[pickEbcdicMember]]).
    */
  val Cp500 = "IBM500"
  /** cp1047 (Latin-1/Open Systems) — the codepage whose REAL-WORLD
    * convention terminates records with LF 0x25. Java's IBM1047
    * charset maps 0x25 ↔ U+0085 (NEL) and keeps '\n' at 0x15, so a
    * 0x25-terminated stream decodes distributed with an explicit
    * NEL lineSep (CsvUploader.readRaw) — the case that used to be
    * the loud [[Cp037Lf]] error is now a working decode whenever the
    * stream's punctuation is 1047-consistent.
    */
  val Cp1047 = "IBM1047"
  /** cp1047 punctuation with NL (0x15) record terminators — what
    * Java's own IBM1047 charset WRITES (`"\n".getBytes("IBM1047")` =
    * 0x15). Decodes like [[Cp037]]/[[Cp500]] (charset-encoded "\n"
    * lineSep) but through the IBM1047 tables; without this member in
    * the 0x15 candidate set, a Java-written 1047 file with brackets
    * would silently decode as cp037 mojibake.
    */
  val Cp1047Nl = "IBM1047:NL"
  /** cp037-punctuated stream with LF (0x25) record terminators.
    * Java's IBM037 DECODES 0x25 to '\n' but never ENCODES any
    * character to 0x25, so no lineSep can match it — detected for a
    * loud transcode error instead of a one-giant-line parse. Only
    * reported when the stream carries cp037-specific punctuation
    * (otherwise the cp1047 decode is byte-identical and is used).
    */
  val Cp037Lf = "IBM037:LF"
  /** cp273 (Germany/Austria) — cp037's punctuation slots repurposed
    * for umlauts/ß; admitted to the member contest only on ≥3
    * distinct national-letter bytes ([[pickEbcdicMember]] — cp500's
    * bracket pair decodes as Ä/Ü, so a 2-distinct gate would flip
    * bracketed cp500 files).
    */
  val Cp273 = "IBM273"
  /** cp277 (Denmark/Norway) — æ/ø/å in the punctuation slots. */
  val Cp277 = "IBM277"

  /** Detect the charset of a file readable through the Hadoop
    * FileSystem API (local, HDFS, S3A, …) — only the sniff window is
    * fetched, never the whole object.
    */
  def detect(spark: SparkSession, path: String,
      numBytes: Int = DefaultSniffBytes): String = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try {
      val buf = new Array[Byte](numBytes)
      var off = 0
      var n = 0
      while (off < numBytes && { n = in.read(buf, off, numBytes - off); n > 0 })
        off += n
      // A full window means the file continues past it — only then may
      // a trailing partial UTF-8 sequence be forgiven.
      detectBytes(java.util.Arrays.copyOf(buf, off), truncated = off == numBytes)
    } finally in.close()
  }

  def detectBytes(bytes: Array[Byte], truncated: Boolean = false): String = {
    if (bytes.length >= 3 && bytes(0) == 0xEF.toByte &&
      bytes(1) == 0xBB.toByte && bytes(2) == 0xBF.toByte) return Utf8
    // UTF-32 BOMs first: FF FE 00 00 is a PREFIX-collision with the
    // UTF-16LE BOM and must win when the trailing NULs are present.
    if (bytes.length >= 4 && bytes(0) == 0xFF.toByte &&
      bytes(1) == 0xFE.toByte && bytes(2) == 0 && bytes(3) == 0)
      return Utf32LE
    if (bytes.length >= 4 && bytes(0) == 0 && bytes(1) == 0 &&
      bytes(2) == 0xFE.toByte && bytes(3) == 0xFF.toByte)
      return Utf32BE
    if (bytes.length >= 2 && bytes(0) == 0xFF.toByte && bytes(1) == 0xFE.toByte)
      return Utf16LE
    if (bytes.length >= 2 && bytes(0) == 0xFE.toByte && bytes(1) == 0xFF.toByte)
      return Utf16BE
    // UTF-16 without BOM: ASCII-range text encodes as alternating
    // data/NUL bytes (NUL on the high byte). Real single-byte CSVs
    // contain no NULs at all, so a strong positional NUL skew is a
    // safe signal. Must run BEFORE UTF-8 validation — NUL bytes are
    // valid UTF-8, so UTF-16LE ASCII text would pass as UTF-8.
    val utf16 = detectUtf16NoBom(bytes)
    if (utf16.isDefined) return utf16.get
    lazy val script = detectSingleByteScript(bytes)
    if (isValidUtf8(bytes, truncated)) {
      // ascii → latin-1 widening, mirroring the reference.
      if (bytes.forall(b => (b & 0xFF) < 0x80)) Latin1 else Utf8
    } else if (isEbcdic(bytes)) {
      // Must run BEFORE the Cyrillic check: EBCDIC digits (0xF0–0xF9)
      // collide with cp1251 lowercase р–щ, so a digit-heavy EBCDIC
      // file would otherwise pass the Cyrillic profile. Mainframe
      // exports terminate records with either NL (0x15 — the cp037/
      // cp500 convention and what the JVM charsets themselves write)
      // or LF (0x25 — cp1047's); the terminator picks the candidate
      // set, then punctuation-byte scoring picks the member (cp037 /
      // cp500 / cp1047 share every letter/digit/space position and
      // differ ONLY at a handful of punctuation bytes).
      var lf25 = 0
      var nl15 = 0
      bytes.foreach { b =>
        if (b == 0x25.toByte) lf25 += 1
        else if (b == 0x15.toByte) nl15 += 1
      }
      if (lf25 > nl15) {
        // 0x25-terminated: decodable ONLY through IBM1047 (the one
        // JVM charset with an encodable char at 0x25 — NEL). If the
        // stream's punctuation scores strictly cp037, that decode
        // would garble it → keep the loud Cp037Lf error.
        if (pickEbcdicMember(bytes, Seq(Cp1047, Cp037)) == Cp037) Cp037Lf
        else Cp1047
      } else {
        // 0x15-terminated: cp037/cp500 territory. cp1047 joins the
        // candidate set only when BOTH its bracket bytes appear
        // (0xAD '[' AND 0xBD ']') — under cp037/cp500 those decode
        // as the REAL accented letters Ý and ¨, so a lone 0xAD in an
        // Icelandic name must not flip a genuine cp037 file into
        // bracket mojibake; paired brackets in CSV text are the 1047
        // signal, a Ý-AND-¨ text is not.
        var ad = false
        var bd = false
        bytes.foreach { b =>
          if (b == 0xAD.toByte) ad = true
          else if (b == 0xBD.toByte) bd = true
        }
        // national members join the contest only when the stream
        // carries their letter signal: ≥2 DISTINCT bytes that decode
        // to non-ASCII letters under the member but differ from
        // cp037 — German umlaut text qualifies, a lone Ý or ¢ never
        // does (the same pair-evidence rule as the 1047 brackets)
        // ≥3 distinct national-letter bytes: cp500's bracket PAIR
        // (0x4A/0x5A) decodes as Ä/Ü under cp273, so a 2-distinct
        // gate would admit cp273 into every bracketed cp500 contest
        // and the letters tier would flip it; three distinct letters
        // is umlaut-text territory no punctuation pair reaches
        val nationals = Seq(Cp273, Cp277).filter { cs =>
          val differ = differBytesFor(Seq(Cp037, cs))
          bytes.iterator.map(_ & 0xFF)
            .filter(v => differ.contains(v) && nationalLetterAt(cs, v))
            .toSet.size >= 3
        }
        val candidates =
          (if (ad && bd) Seq(Cp037, Cp500, Cp1047)
          else Seq(Cp037, Cp500)) ++ nationals
        pickEbcdicMember(bytes, candidates) match {
          // 0x15-terminated 1047 (Java's own IBM1047 newline): decode
          // via the 1047 tables with the ordinary "\n" lineSep
          case Cp1047 => Cp1047Nl
          case m => m
        }
      }
    } else if (script.isDefined) {
      // Must run BEFORE the SJIS/EUC ladder: Cyrillic/Greek/Arabic/
      // Hebrew/Thai letters are single high bytes, so even-length
      // letter runs structurally mimic EUC high+high pairs.
      script.get
    } else if (isShiftJis(bytes, truncated)) {
      ShiftJis
    } else if (isEucFamily(bytes, truncated)) {
      detectEucMember(bytes)
    } else {
      // Not UTF-8 → single-byte western. 0x80–0x9F are C1 control
      // characters in latin-1 (never in real text) but printable in
      // cp1252 (€ ™ smart quotes en/em dashes). If such bytes appear
      // and all of them are ones cp1252 defines, cp1252 is the
      // decode that yields text; bytes ≥ 0xA0 read identically in
      // both, so otherwise latin-1 stays the default.
      val c1 = bytes.iterator.map(_ & 0xFF).filter(b => b >= 0x80 && b <= 0x9F)
        .toArray
      val undefinedInCp1252 = Set(0x81, 0x8D, 0x8F, 0x90, 0x9D)
      if (c1.nonEmpty && c1.forall(!undefinedInCp1252.contains(_))) Cp1252
      else Latin1
    }
  }

  /** UTF-16 detection when no BOM is present: ≥70% of one byte
    * parity NUL and <10% of the other. NUL-on-odd = little-endian
    * (ASCII char first), NUL-on-even = big-endian.
    */
  private def detectUtf16NoBom(bytes: Array[Byte]): Option[String] = {
    if (bytes.length < 8) return None
    var evenNul = 0
    var oddNul = 0
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) == 0) { if ((i & 1) == 0) evenNul += 1 else oddNul += 1 }
      i += 1
    }
    val half = bytes.length / 2
    if (oddNul * 10 >= half * 7 && evenNul * 10 < half) Some(Utf16LE)
    else if (evenNul * 10 >= half * 7 && oddNul * 10 < half) Some(Utf16BE)
    else None
  }

  /** Shift-JIS: every byte must fit the SJIS stream structure
    * (ASCII / half-width kana 0xA1–0xDF / lead 0x81–0x9F|0xE0–0xFC +
    * trail 0x40–0x7E|0x80–0xFC) AND at least two pairs must be kana
    * rows (lead 0x82/0x83) — the discriminator western single-byte
    * text cannot fake (see class doc). A truncated sniff window may
    * cut a final pair in half.
    */
  private[sources] def isShiftJis(bytes: Array[Byte],
      truncated: Boolean = false): Boolean = {
    var i = 0
    var kanaPairs = 0
    val n = bytes.length
    while (i < n) {
      val b = bytes(i) & 0xFF
      if (b < 0x80) i += 1
      else if (b >= 0xA1 && b <= 0xDF) i += 1 // half-width kana
      else if ((b >= 0x81 && b <= 0x9F) || (b >= 0xE0 && b <= 0xFC)) {
        if (i + 1 >= n) return truncated && kanaPairs >= 2
        val t = bytes(i + 1) & 0xFF
        if ((t >= 0x40 && t <= 0x7E) || (t >= 0x80 && t <= 0xFC)) {
          if (b == 0x82 || b == 0x83) kanaPairs += 1
          i += 2
        } else return false
      } else return false
    }
    kanaPairs >= 2
  }

  /** EUC-family structure: every byte is ASCII or part of a
    * high+high pair (both 0xA1–0xFE), with ≥3 such pairs. Western
    * text can't fake it — its high bytes are isolated accents
    * followed by ASCII (invalid trail) except for runs of adjacent
    * accented letters, which the ≥3-pairs floor plus the
    * every-high-byte-paired rule make vanishingly unlikely. Runs
    * after [[isShiftJis]]: an EUC stream reads as SJIS half-width
    * kana singles but has no kana-ROW pairs, so the two don't collide.
    */
  private[sources] def isEucFamily(bytes: Array[Byte],
      truncated: Boolean = false): Boolean = {
    var i = 0
    var pairs = 0
    val n = bytes.length
    while (i < n) {
      val b = bytes(i) & 0xFF
      if (b < 0x80) i += 1
      else if (b >= 0xA1 && b <= 0xFE) {
        if (i + 1 >= n) return truncated && pairs >= 3
        val t = bytes(i + 1) & 0xFF
        if (t >= 0xA1 && t <= 0xFE) { pairs += 1; i += 2 }
        else return false
      } else return false
    }
    pairs >= 3
  }

  /** Cyrillic single-byte codepages (cp1251 / KOI8-R) are
    * structurally indistinguishable from latin-1 — every byte
    * sequence "decodes". The statistical separation: Russian text is
    * DOMINATED by high bytes (nearly every letter ≥ 0xC0, vs isolated
    * accents in western text), and each codepage puts the most
    * frequent lowercase letters in a different range (cp1251:
    * 0xE0–0xFF; KOI8-R: 0xC0–0xDF). Gate on ≥25% high bytes, then
    * require ≥35% of them to be top-15 Russian lowercase letters in
    * the winning codepage with a 1.5× margin over the other — real
    * Russian clears both by a wide margin (top-15 ≈ 2/3 of letters),
    * western/CJK streams clear neither.
    */
  private lazy val cp1251Profile = byteProfile("оеаинтсрвлкмдпу", Cp1251)
  private lazy val koi8Profile = byteProfile("оеаинтсрвлкмдпу", Koi8R)

  /** Per-script letter profiles for the remaining single-byte
    * codepages charset_normalizer identifies (reference
    * `__init__.py:137`): Greek, Arabic, Hebrew, Thai. Each is the
    * language's most frequent letters encoded through the JVM's own
    * charset tables at class load — the cp1251/KOI8-R machinery
    * generalized. ISO-8859-7 Greek decodes identically to
    * windows-1253 at every letter position (they differ only in the
    * currency/punct rows), so one verdict covers both; same for
    * TIS-620 within windows-874.
    */
  private lazy val scriptProfiles: Seq[(String, Set[Int])] = Seq(
    Cp1251 -> cp1251Profile,
    Koi8R -> koi8Profile,
    Cp1253 -> byteProfile("αετοινσρηυπκωάέήίόύώ", Cp1253),
    Cp1256 -> byteProfile("اليمنوهترب", Cp1256),
    Cp1255 -> byteProfile("יהולארתמשב", Cp1255),
    Tis620 -> byteProfile("านรอกเงิมยลวด", Tis620))

  private def byteProfile(chars: String, charset: String): Set[Int] =
    chars.map(ch => String.valueOf(ch).getBytes(charset))
      .filter(_.length == 1).map(b => b(0) & 0xFF).toSet

  /** EBCDIC (cp037): three structural counts no ASCII-compatible
    * charset can mimic. ASCII space 0x20 NEVER appears (EBCDIC space
    * is 0x40), letters/digits all live in the 0x81+ zones, and
    * separators are 0x6B (comma) / 0x25 (LF). Text files accept on
    * the space signal (0x40 at space frequency), numeric CSVs on the
    * comma+digit signal; both additionally require ≥70% of bytes in
    * EBCDIC text zones, which an ASCII file that merely lacks spaces
    * (an email-address list, say) can't reach — its letters are all
    * < 0x80.
    */
  private[sources] def isEbcdic(bytes: Array[Byte]): Boolean = {
    val n = bytes.length
    if (n < 16) return false
    var sp20 = 0
    var sp40 = 0
    var comma = 0
    var digit = 0
    var text = 0
    var i = 0
    while (i < n) {
      val v = bytes(i) & 0xFF
      if (v == 0x20) sp20 += 1
      else if (v == 0x40) sp40 += 1
      else if (v == 0x6B) comma += 1
      else {
        if (v >= 0xF0 && v <= 0xF9) digit += 1
        if ((v >= 0x81 && v <= 0x89) || (v >= 0x91 && v <= 0x99) ||
          (v >= 0xA2 && v <= 0xA9) || (v >= 0xC1 && v <= 0xC9) ||
          (v >= 0xD1 && v <= 0xD9) || (v >= 0xE2 && v <= 0xE9) ||
          (v >= 0xF0 && v <= 0xF9)) text += 1
      }
      i += 1
    }
    val zoneOk = (text + sp40 + comma) * 10 >= n * 7
    val spaceSignal = sp40 * 20 >= n // ≥5% EBCDIC spaces
    val numericSignal = comma * 50 >= n && digit * 10 >= n * 3
    sp20 == 0 && zoneOk && (spaceSignal || numericSignal)
  }

  /** Bytes whose decode differs across a SPECIFIC candidate set,
    * computed from the JVM's own charset tables (record terminators
    * excluded — they're the candidate-set signal, not a member
    * signal). Scoped per candidate set so admitting a national
    * member (cp273/cp277) widens the contested bytes only for the
    * streams that show its letters — a plain 037/500/1047 contest
    * scores exactly the bytes it always did.
    */
  private val differMemo =
    scala.collection.concurrent.TrieMap[Seq[String], Set[Int]]()
  private def differBytesFor(candidates: Seq[String]): Set[Int] =
    differMemo.getOrElseUpdate(candidates,
      (0 to 0xFF).filter { v =>
        candidates.map(cs => new String(Array(v.toByte), cs))
          .distinct.size > 1
      }.toSet -- Set(0x15, 0x25))

  /** True when `cs` decodes byte `v` to a non-ASCII letter — the
    * national-variant signal: cp273/cp277 repurpose cp037's
    * punctuation slots for umlauts/æøå, so REAL German/Danish text
    * concentrates letter mass exactly on the differ bytes.
    */
  private def nationalLetterAt(cs: String, v: Int): Boolean = {
    val c = new String(Array(v.toByte), cs).charAt(0)
    c > 0x7F && Character.isLetter(c)
  }

  /** Pick the EBCDIC member whose decode of the stream's
    * punctuation-differ bytes yields printable ASCII ('[' ']' '^' '!'
    * '|') rather than Latin-1 oddities ('¢' '¬' 'Ý' '¨') — real CSV
    * punctuation is ASCII; a cent-sign-dense ledger is not. Ties
    * (including NO differ bytes present — the common all-alnum
    * export, where every candidate decodes identically) keep the
    * candidate order's head.
    *
    * Scoring is over DISTINCT differ bytes, and a non-head candidate
    * needs at least TWO distinct printable-decoding differ bytes to
    * displace the head — a genuine cp037 file whose only differ byte
    * is '¢' (0x4A, a currency column, however many occurrences) must
    * not flip to cp500 on that single letter of evidence. This
    * mirrors the 0xAD/0xBD bracket-PAIR gate that admits cp1047 to
    * the candidate set at all.
    */
  private[sources] def pickEbcdicMember(bytes: Array[Byte],
      candidates: Seq[String]): String = {
    val differ = differBytesFor(candidates)
    val counts = new Array[Int](256)
    bytes.foreach(b => counts(b & 0xFF) += 1)
    val present = differ.filter(counts(_) > 0)
    if (present.isEmpty) return candidates.head
    // Two scoring tiers. Letters tier: occurrences of differ bytes
    // the member decodes to non-ASCII LETTERS — the national-variant
    // signal (German text is umlaut-dense; a '{'-and-'}'-dense CSV is
    // not text). Printable tier: distinct differ bytes decoding to
    // printable ASCII — the 037/500/1047 punctuation signal. Both
    // tiers gate on ≥2 distinct evidence bytes (the '¢'-column /
    // Ý-name rule: one letter of evidence never flips a file).
    case class S(lettersOcc: Long, lettersDistinct: Int, printable: Int)
    def scoreOf(cs: String): S = {
      var lo = 0L
      var ld = 0
      var pr = 0
      present.foreach { v =>
        val c = new String(Array(v.toByte), cs).charAt(0)
        if (c > 0x7F && Character.isLetter(c)) { lo += counts(v); ld += 1 }
        else if (c >= '!' && c <= '~') pr += 1
      }
      S(lo, ld, pr)
    }
    // letter evidence below the 2-distinct gate scores ZERO — a lone
    // Ý-name (or ¢-column) must neither win nor BLOCK the printable
    // tier for the member it happens to sit in
    def eff(s: S): Long = if (s.lettersDistinct >= 2) s.lettersOcc else 0L
    val scored = candidates.map(cs => cs -> scoreOf(cs))
    scored.tail.foldLeft(scored.head) { case (best @ (_, bs), cand @ (_, cs2)) =>
      val challengerWins = eff(cs2) > eff(bs) ||
        (eff(cs2) == eff(bs) &&
          cs2.printable > bs.printable && cs2.printable >= 2)
      if (challengerWins) cand else best
    }._1
  }

  /** Single-byte script detection over the letter profiles
    * ([[scriptProfiles]]): real text concentrates ≥35% of its
    * non-ASCII mass on the language's top letters, while
    * cross-script byte coincidences stay well under the winner —
    * so the verdict needs BOTH the floor (7/20 of high bytes) and a
    * 1.5× margin over the runner-up; anything ambiguous falls
    * through to the western ladder. Same thresholds the
    * cp1251/KOI8-R pair shipped with; profile order is the
    * tie-break (fixed, like the langId ladder).
    */
  private[sources] def detectSingleByteScript(
      bytes: Array[Byte]): Option[String] = {
    val n = bytes.length
    if (n == 0) return None
    var high = 0
    val byteCounts = new Array[Int](256)
    val hits = new Array[Int](scriptProfiles.length)
    var i = 0
    while (i < n) {
      val v = bytes(i) & 0xFF
      if (v >= 0x80) {
        high += 1
        byteCounts(v) += 1
        var p = 0
        while (p < scriptProfiles.length) {
          if (scriptProfiles(p)._2.contains(v)) hits(p) += 1
          p += 1
        }
      }
      i += 1
    }
    if (high * 4 < n) return None // <25% non-ASCII: western ladder
    var bi = 0
    var p = 1
    while (p < hits.length) { if (hits(p) > hits(bi)) bi = p; p += 1 }
    if (hits(bi) * 20 < high * 7) return None // floor: 35% of high bytes
    // Pairwise confirmation on EXCLUSIVE bytes: single-byte letter
    // ranges overlap heavily across scripts (Greek/Hebrew/Cyrillic
    // all live in 0xE0–0xFF), so a global margin over total hits
    // rejects real text for cross-profile coincidences. The winner
    // must instead beat each challenger on the bytes where their
    // profiles actually DIFFER — ≥2 distinct exclusive bytes and a
    // 1.5× occurrence margin. For the disjoint cp1251/KOI8-R pair
    // this is exactly the original margin rule.
    val (wcs, wset) = scriptProfiles(bi)
    val ok = scriptProfiles.indices.filter(_ != bi).forall { pi =>
      val oset = scriptProfiles(pi)._2
      var wOcc = 0L
      var wDistinct = 0
      var oOcc = 0L
      (wset -- oset).foreach { v =>
        val c = byteCounts(v)
        if (c > 0) { wOcc += c; wDistinct += 1 }
      }
      (oset -- wset).foreach(v => oOcc += byteCounts(v))
      wDistinct >= 2 && wOcc * 2 >= oOcc * 3
    }
    if (ok) Some(wcs) else None
  }

  /** Encode each character of `chars` in `charset` and keep the
    * two-byte codes as (lead<<8)|trail ints — a frequency profile
    * derived from the JVM's own charset tables, no hand-maintained
    * magic numbers. Characters the charset can't encode in two bytes
    * are dropped.
    */
  private def pairProfile(chars: String, charset: String): Set[Int] =
    chars.map { ch =>
      val b = String.valueOf(ch).getBytes(charset)
      if (b.length == 2) ((b(0) & 0xFF) << 8) | (b(1) & 0xFF) else -1
    }.filter(_ > 0).toSet

  /** The most frequent characters of each member's language — the
    * statistical mass real text cannot avoid. Japanese: top hiragana
    * (rows 0xA4/0xA5 in EUC-JP) + everyday kanji; Korean: the most
    * frequent hangul syllables; Chinese: the most frequent simplified
    * hanzi (all GB2312-level, so the profile works for plain EUC-CN
    * files decoded as GBK too).
    */
  private lazy val eucJpProfile = pairProfile(
    "のにはをたがでてとしもるなれかこいうんさくっだりすまそあやけ" +
      "日本人年大国中出時行見月分後前生自事社者地方新場入不合部取" +
      "ーデタイスラアンカシキメトテレロプリグマネバラ語名同高学間",
    EucJp)
  private lazy val eucKrProfile = pairProfile(
    "이다는에하의를로을가고지서한은기사어아시도있나그대수자전적정" +
      "부인일제국생성만학과면주년소리스비요니해상중장내신경치공안되" +
      "원동남북명데위개간금음식건물여말터무버런니론된후색름합력함",
    EucKr)
  private lazy val gbkProfile = pairProfile(
    "的一是不了在人有我他这个们中来上大为和国地到以说时要就出会可" +
      "也你对生能而子那得于着下自之年过发后作里用道行所然家种事成方" +
      "名字文数民电机关程度等部题表先美明集金活车西东南北广强知真",
    Gbk)

  /** Pick the EUC member by profile hit rate over the stream's
    * high+high pairs. The winner needs ≥10% of pairs in its profile
    * AND 2× the runner-up — both satisfied by orders of magnitude on
    * real text in any of the three languages, neither by noise.
    * Anything else keeps the ambiguous [[EucFamily]] verdict (loud
    * upload failure, never a wrong-member decode).
    */
  private[sources] def detectEucMember(bytes: Array[Byte]): String = {
    var i = 0
    val n = bytes.length
    var pairs = 0
    var jp = 0
    var kr = 0
    var gb = 0
    while (i < n - 1) {
      val b = bytes(i) & 0xFF
      if (b < 0x80) i += 1
      else {
        val code = (b << 8) | (bytes(i + 1) & 0xFF)
        pairs += 1
        if (eucJpProfile.contains(code)) jp += 1
        if (eucKrProfile.contains(code)) kr += 1
        if (gbkProfile.contains(code)) gb += 1
        i += 2
      }
    }
    if (pairs == 0) return EucFamily
    val scored = Seq(EucJp -> jp, EucKr -> kr, Gbk -> gb)
      .sortBy(-_._2)
    val best = scored.head
    val second = scored(1)._2
    if (best._2 * 10 >= pairs && best._2 >= 2 * math.max(second, 1))
      best._1
    else EucFamily
  }

  /** Strict UTF-8 validation; when the buffer was truncated by the
    * sniff window, tolerate a multi-byte sequence cut off at the end
    * (up to 3 trailing bytes).
    */
  private[sources] def isValidUtf8(bytes: Array[Byte],
      truncated: Boolean): Boolean = {
    val end = if (truncated) trimIncompleteTail(bytes) else bytes.length
    val dec: CharsetDecoder = StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(CodingErrorAction.REPORT)
      .onUnmappableCharacter(CodingErrorAction.REPORT)
    try { dec.decode(ByteBuffer.wrap(bytes, 0, end)); true }
    catch { case _: java.nio.charset.CharacterCodingException => false }
  }

  /** Index just before any UTF-8 sequence that starts within the last
    * 3 bytes but doesn't finish inside the buffer.
    */
  private def trimIncompleteTail(bytes: Array[Byte]): Int = {
    val len = bytes.length
    var i = math.max(0, len - 4)
    var cut = len
    while (i < len) {
      val b = bytes(i) & 0xFF
      val need =
        if (b >= 0xF0) 4 else if (b >= 0xE0) 3 else if (b >= 0xC0) 2 else 0
      if (need > 0 && i + need > len) { cut = math.min(cut, i); i = len }
      else i += math.max(1, need)
    }
    cut
  }
}
