package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** C32 winnowing fingerprint selection in ONE byte pass (Schleimer,
  * Wilkerson & Aiken 2003): tokenize ([[TokenScan]]), hash every
  * k-token gram (portable = first 60 md5 bits, the cross-engine
  * contract — winnowing SELECTION depends on hash VALUES; production
  * = xxhash64 seed 42), slide a w-window over the hash sequence with
  * a monotonic deque (O(grams), not O(grams·w)), select each
  * window's minimum under (h, −pos) — min hash, RIGHTMOST tie — and
  * emit the distinct selections as array<struct<h, np>> (np = −pos,
  * the struct the compositional form packed).
  *
  * Replaces the regex tokenize → k slices → zip_with concat →
  * per-gram STRING → md5/xxhash64 Column chain → w more slices →
  * zip_with(least) → array_distinct pipeline, which materialized
  * every gram as a string and every window as a struct array —
  * the worst like-for-like absolute row on the r10 sf0.1 board
  * (2.5 s). Same selections by construction: same token rule, same
  * hash values (Md5Short.first60Spans ≡ the conv(substr(md5hex))
  * form, spec-pinned), same (h, np) order, same <w-gram empty-output
  * contract. Output ORDER is (h, np)-sorted instead of
  * first-occurrence — every consumer and the driver compare are
  * set/sort-based.
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int,
    portable: Boolean)
    extends UnaryExpression {

  require(k >= 1 && w >= 1, s"need k,w >= 1, got k=$k w=$w")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("h", LongType, nullable = false),
    StructField("np", IntegerType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_winnow_fingerprints"

  @transient private lazy val tlBuf =
    new ThreadLocal[Array[Byte]] {
      override def initialValue(): Array[Byte] = new Array[Byte](256)
    }

  def fps(s: UTF8String): ArrayData = {
    val b = s.getBytes
    val sp = TokenScan.scan(b)
    val starts = sp.starts; val ends = sp.ends; val nTok = sp.n
    val nG = nTok - k + 1
    if (nG < w)
      return new GenericArrayData(Array.empty[AnyRef])
    val hs = new Array[Long](nG)
    var i = 0
    while (i < nG) {
      var len = k - 1
      var j = 0
      while (j < k) { len += ends(i + j) - starts(i + j); j += 1 }
      hs(i) =
        if (portable && len <= Md5Short.MaxLen)
          Md5Short.first60Spans(b, starts, ends, i, k)
        else {
          var buf = tlBuf.get()
          if (buf.length < len) {
            buf = new Array[Byte](math.max(len, buf.length * 2))
            tlBuf.set(buf)
          }
          var p = 0
          j = 0
          while (j < k) {
            if (j > 0) { buf(p) = 0x20; p += 1 }
            val l = ends(i + j) - starts(i + j)
            System.arraycopy(b, starts(i + j), buf, p, l)
            p += l
            j += 1
          }
          if (portable) HashingSupport.md5Hash60From(buf, len)
          else XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, len, 42L)
        }
      i += 1
    }
    // sliding rightmost-min via monotonic deque over key(i)=(h, -i):
    // pop the back while it loses to the incoming index (equal h →
    // larger i wins, so >= on h pops)
    val deque = new Array[Int](nG)
    var head = 0
    var tail = 0 // [head, tail)
    val selH = new Array[Long](nG - w + 1)
    val selNp = new Array[Int](nG - w + 1)
    var nSel = 0
    i = 0
    while (i < nG) {
      while (tail > head && hs(deque(tail - 1)) >= hs(i)) tail -= 1
      deque(tail) = i; tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) {
        val m = deque(head)
        // consecutive windows usually re-select the same gram
        if (nSel == 0 || selNp(nSel - 1) != -m) {
          selH(nSel) = hs(m); selNp(nSel) = -m; nSel += 1
        }
      }
      i += 1
    }
    // global distinct (a hash can be re-selected non-adjacently):
    // sort by (h, np) and unique — order is set-equivalent to the
    // compositional array_distinct form
    val idx = Array.range(0, nSel)
    val sorted = idx.sortBy(x => (selH(x), selNp(x)))
    val out = new scala.collection.mutable.ArrayBuffer[AnyRef](nSel)
    var last = -1
    for (x <- sorted) {
      if (last < 0 || selH(x) != selH(last) || selNp(x) != selNp(last))
        out += new GenericInternalRow(Array[Any](selH(x), selNp(x)))
      last = x
    }
    new GenericArrayData(out.toArray)
  }

  override def nullSafeEval(v: Any): Any = fps(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val ref = ctx.addReferenceObj("winnow", this,
        classOf[WinnowFingerprints].getName)
      s"${ev.value} = $ref.fps($s);"
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
