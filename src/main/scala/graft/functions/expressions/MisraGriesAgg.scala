package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Buffer for [[MisraGriesAgg]] — mutable map with long[] cells. */
private[expressions] final class MgBuffer(
    val m: java.util.HashMap[UTF8String, Array[Long]])

/** Native weighted Misra–Gries summary (SURVEY.md §2.H17) — the
  * TypedImperativeAggregate carrying the same algorithm and
  * guarantees documented on [[graft.functions.HeavyHitters]]: a
  * bounded map per partition (amortized 2k prune via the
  * (k+1)-th-largest subtraction, the Agarwal et al. 2012 COMBINE
  * rule), associative merges, items with true weight > n/(k+1)
  * guaranteed present, counts under-estimating by ≤ n/(k+1) with
  * n = Σ weights.
  *
  * Why a native aggregate next to the Aggregator API: the udaf path
  * deserializes every input row into a case class through an
  * ExpressionEncoder — at the E15b sketch pass that is one KeyCount
  * allocation + string decode per (doc, term) row, the dominant cost
  * of the 10× row (1.1 s for a 2048-entry summary). Here update
  * reads the UTF8String key straight off the row and touches one
  * hash map — the input stream never materializes as objects.
  * Output: array<struct<key,count>> ordered (count desc, key asc),
  * identical shape to the Aggregator form.
  */
case class MisraGriesAgg(left: Expression, right: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MgBuffer]
    with BinaryLike[Expression] {

  require(k > 0, s"heavy-hitters summary needs k > 0, got $k")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("key", StringType, nullable = false),
    StructField("count", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_misra_gries"

  override def createAggregationBuffer(): MgBuffer =
    new MgBuffer(new java.util.HashMap(math.min(1 << 12, k * 4)))

  private def prune(m: java.util.HashMap[UTF8String, Array[Long]]): Unit = {
    if (m.size() <= k) return
    val counts = new Array[Long](m.size())
    var i = 0
    val vit = m.values().iterator()
    while (vit.hasNext) { counts(i) = vit.next()(0); i += 1 }
    java.util.Arrays.sort(counts)
    val cut = counts(counts.length - 1 - k) // (k+1)-th largest
    val eit = m.entrySet().iterator()
    while (eit.hasNext) {
      val e = eit.next()
      val c = e.getValue()(0) - cut
      if (c > 0L) e.getValue()(0) = c else eit.remove()
    }
  }

  private def add(m: java.util.HashMap[UTF8String, Array[Long]],
      key: UTF8String, w: Long): Unit = {
    val cell = m.get(key)
    if (cell != null) cell(0) += w
    else {
      m.put(key.clone(), Array(w))
      if (m.size() >= 2 * k) prune(m)
    }
  }

  override def update(buf: MgBuffer, input: InternalRow): MgBuffer = {
    val kv = left.eval(input)
    if (kv == null) return buf
    val wv = right.eval(input)
    if (wv == null) return buf
    val w = wv.asInstanceOf[Long]
    // zero weight = zero occurrences (a no-op, never a summary
    // slot); negative weight would corrupt every bound — fail loud
    require(w >= 0L,
      s"negative heavy-hitter weight for '$kv': $w")
    if (w > 0L) add(buf.m, kv.asInstanceOf[UTF8String], w)
    buf
  }

  override def merge(buf: MgBuffer, other: MgBuffer): MgBuffer = {
    val it = other.m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      add(buf.m, e.getKey, e.getValue()(0))
    }
    buf
  }

  override def eval(buf: MgBuffer): Any = {
    prune(buf.m)
    val entries = new Array[(UTF8String, Long)](buf.m.size())
    val it = buf.m.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      entries(i) = (e.getKey, e.getValue()(0))
      i += 1
    }
    // (count desc, key asc) under java.lang.String order — the same
    // tie-break the Aggregator form's finish used
    val sorted = entries.sortBy { case (key, c) => (-c, key.toString) }
    val out = new Array[AnyRef](sorted.length)
    i = 0
    while (i < sorted.length) {
      out(i) = new GenericInternalRow(
        Array[Any](sorted(i)._1, sorted(i)._2))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: MgBuffer): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.m.size())
    val it = buf.m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val kb = e.getKey.getBytes
      out.writeInt(kb.length)
      out.write(kb)
      out.writeLong(e.getValue()(0))
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MgBuffer = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
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
    new MgBuffer(m)
  }

  override def withNewMutableAggBufferOffset(
      newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(
      newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): MisraGriesAgg =
    copy(left = newLeft, right = newRight)
}
