package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mutable per-partition buffer for [[GramCountsAgg]]: an open
  * java.util.HashMap with mutable long[] cells (no re-put per
  * occurrence) plus a poison flag once the distinct-gram count
  * exceeds the broadcast cap.
  */
private[expressions] final class GramCountsBuffer(
    var m: java.util.HashMap[UTF8String, Array[Long]],
    var overflow: Boolean)

/** E19/E21 model build as ONE typed-imperative aggregation
  * (SURVEY.md §2.E21): global n-gram counts of a text column,
  * minN..maxN grams keyed "w1 w2 …" (orders share the table — tokens
  * contain no whitespace), accumulated directly into per-partition
  * hash maps from the raw bytes ([[TokenScan]], the shared `\S+`
  * rule).
  *
  * Why not `explode(termCounts) → groupBy → sum` (the r8 shape): the
  * per-gram row stream through Generate + partial HashAggregate
  * materializes an UnsafeRow and re-probes the aggregate hash map
  * for EVERY gram slot — ~3·tokens rows at maxN=3, the whole cost of
  * the E21 model build at the 10× board (0.7–1.2 s against a 28 k
  * vocabulary). This aggregate does the same Σ_occurrences
  * arithmetic in a plain byte loop: hash-probe one map per gram
  * slot, zero per-gram rows, zero exchange beyond the 32
  * partition-buffer blobs of the final merge.
  *
  * The `cap` is the broadcast gate fused INTO the build: a partition
  * whose map outgrows cap distinct grams poisons its buffer (update
  * stops touching the map), poison survives merge, and eval returns
  * NULL — the caller reads null as "model does not fit the driver
  * bound" and falls back to the distributed join path. A passed gate
  * wastes nothing: the evaluated array IS the model. At 100 TB the
  * gate fails in one cheap pass and the pipeline degrades to the
  * vocabulary-sized distributed tables, never to a driver bomb (the
  * output array is bounded by cap either way).
  *
  * Exactness: Σ_occurrences per gram — identical to the old shape's
  * Σ_docs tf (TermCounts' per-doc distinct grams with
  * multiplicities), spec-pinned equal.
  */
case class GramCountsAgg(child: Expression, minN: Int, maxN: Int,
    cap: Int, minTokens: Int = 0,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[GramCountsBuffer]
    with UnaryLike[Expression] {

  require(minN >= 1 && maxN >= minN, s"bad gram orders [$minN,$maxN]")
  require(cap > 0, s"gram cap must be positive, got $cap")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("tf", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_gram_counts_agg"

  override def createAggregationBuffer(): GramCountsBuffer =
    new GramCountsBuffer(new java.util.HashMap(1 << 12), false)

  override def update(buf: GramCountsBuffer,
      input: InternalRow): GramCountsBuffer = {
    if (buf.overflow) return buf
    val v = child.eval(input)
    if (v == null) return buf
    val b = v.asInstanceOf[UTF8String].getBytes
    val sp = TokenScan.scan(b)
    val starts = sp.starts; val ends = sp.ends; val nTok = sp.n
    // fused doc gate: E21 counts grams only for >=3-token docs; the
    // span count is already here, so the caller's wsTokenCount
    // pre-filter (a second full tokenize of the train split) folds
    // into this pass for free
    if (nTok < minTokens) return buf
    val m = buf.m
    var gramN = minN
    while (gramN <= maxN && !buf.overflow) {
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
        val cell = m.get(g)
        if (cell == null) {
          if (m.size() >= cap) { buf.overflow = true; t = last }
          else m.put(g.clone(), Array(1L))
        } else cell(0) += 1L
        t += 1
      }
      gramN += 1
    }
    buf
  }

  override def merge(buf: GramCountsBuffer,
      other: GramCountsBuffer): GramCountsBuffer = {
    if (other.overflow) buf.overflow = true
    if (buf.overflow) return buf
    val it = other.m.entrySet().iterator()
    while (it.hasNext && !buf.overflow) {
      val e = it.next()
      val cell = buf.m.get(e.getKey)
      if (cell == null) {
        if (buf.m.size() >= cap) buf.overflow = true
        else buf.m.put(e.getKey, e.getValue)
      } else cell(0) += e.getValue()(0)
    }
    buf
  }

  override def eval(buf: GramCountsBuffer): Any = {
    if (buf.overflow) return null
    val out = new Array[AnyRef](buf.m.size())
    val it = buf.m.entrySet().iterator()
    var o = 0
    while (it.hasNext) {
      val e = it.next()
      out(o) = new GenericInternalRow(
        Array[Any](e.getKey, e.getValue()(0)))
      o += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: GramCountsBuffer): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeBoolean(buf.overflow)
    if (!buf.overflow) {
      out.writeInt(buf.m.size())
      val it = buf.m.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val kb = e.getKey.getBytes
        out.writeInt(kb.length)
        out.write(kb)
        out.writeLong(e.getValue()(0))
      }
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): GramCountsBuffer = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val overflow = in.readBoolean()
    if (overflow) new GramCountsBuffer(new java.util.HashMap(16), true)
    else {
      val n = in.readInt()
      val m = new java.util.HashMap[UTF8String, Array[Long]](
        math.max(16, n * 2))
      var i = 0
      while (i < n) {
        val len = in.readInt()
        val kb = new Array[Byte](len)
        in.readFully(kb)
        m.put(UTF8String.fromBytes(kb), Array(in.readLong()))
        i += 1
      }
      new GramCountsBuffer(m, false)
    }
  }

  override def withNewMutableAggBufferOffset(
      newOffset: Int): GramCountsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(
      newOffset: Int): GramCountsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(
      newChild: Expression): GramCountsAgg = copy(child = newChild)
}
