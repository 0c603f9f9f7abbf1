package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._

/** Z-order (Morton) interleave of 2–8 non-negative long columns
  * (SURVEY.md §2.H12): bit i of column j lands at position i·k + j,
  * using the low ⌊63/k⌋ bits of each column.
  *
  * Why: at 100 TB, scan cost is decided by how many files a
  * predicate's min/max pruning can skip. Sorting by one column makes
  * that column's ranges tight per file and every other column's
  * ranges full-width; sorting by the interleaved value makes EVERY
  * participating column's per-file range ~range/∜files wide, so range
  * predicates on any of them prune. The curve value is only a sort
  * key — queries never read it back, so its FP-free integer
  * arithmetic is also trivially portable to the oracle.
  *
  * Caller contract: inputs must be non-negative (keys, offsets,
  * bucketed timestamps). Values wider than ⌊63/k⌋ bits keep only
  * their low bits — acceptable for a sort key, wrong for an
  * identifier; [[graft.catalog.GraftDatabase.writeZOrdered]] range
  * partitions on the curve value, so collisions only cost locality,
  * never correctness.
  */
case class ZOrderLong(children: Seq[Expression]) extends Expression
    with ImplicitCastInputTypes {

  private val k = children.size
  require(k >= 2 && k <= 8, s"z-order needs 2..8 columns, got $k")
  private val bits = 63 / k

  // Analysis casts int/short/byte children up to long (or rejects
  // non-numerics) — without this, interpreted eval would CCE on an
  // Integer while codegen silently worked (the SQL-facing
  // graft_zorder sees arbitrary column types).
  override def inputTypes: Seq[DataType] =
    Seq.fill(children.size)(LongType)

  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "graft_zorder"

  override def eval(input: InternalRow): Any = {
    var z = 0L
    var j = 0
    while (j < k) {
      val v = children(j).eval(input)
      if (v == null) return null
      val x = v.asInstanceOf[Long]
      var i = 0
      while (i < bits) {
        z |= ((x >>> i) & 1L) << (i * k + j)
        i += 1
      }
      j += 1
    }
    z
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val evals = children.map(_.genCode(ctx))
    val zTmp = ctx.freshName("z")
    val interleave = evals.zipWithIndex.map { case (e, j) =>
      val i = ctx.freshName("i")
      s"""for (int $i = 0; $i < $bits; $i++) {
         |  $zTmp |= ((${e.value} >>> $i) & 1L) << ($i * $k + $j);
         |}""".stripMargin
    }.mkString("\n")
    val nullCond = evals.map(_.isNull.toString).mkString(" || ")
    val childCode = evals.map(_.code.toString).mkString("\n")
    ev.copy(code =
      code"""
        $childCode
        boolean ${ev.isNull} = false;
        long ${ev.value} = 0L;
        if ($nullCond) {
          ${ev.isNull} = true;
        } else {
          long $zTmp = 0L;
          $interleave
          ${ev.value} = $zTmp;
        }
      """)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

/** Z-curve per-column normalization: clamp into [lo, hi], rebase to
  * the unsigned offset `clamped - lo`, shift onto the per-column bit
  * budget (r15). Native because the Column-arithmetic form it
  * replaces cannot express the semantics under ANSI mode: a
  * full-range column (xxhash64 keys, lo≈Long.Min, hi≈Long.Max) needs
  * the subtraction to WRAP (two's complement IS the correct unsigned
  * offset) and the down-shift to be LOGICAL — Spark's ANSI `-` throws
  * ARITHMETIC_OVERFLOW instead of wrapping, and `shiftright`
  * sign-extends. Java arithmetic in a native expression does exactly
  * the right thing, and keeps the driver twin (`zVal`) semantics
  * identical by construction.
  */
case class ZNormalize(child: Expression, lo: Long, hi: Long, shift: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_znormalize"

  def norm(v: Long): Long = {
    val clamped = math.min(math.max(v, lo), hi) - lo // wraps: unsigned offset
    if (shift > 0) clamped >>> shift
    else if (shift < 0) clamped << -shift
    else clamped
  }

  override def nullSafeEval(v: Any): Any = norm(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val ref = ctx.addReferenceObj("znorm", this,
        classOf[ZNormalize].getName)
      s"${ev.value} = $ref.norm($v);"
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Index of the curve segment containing a value: the largest i with
  * bounds(i) ≤ v (0 when v is below every bound). `bounds` are the
  * sorted per-file z-minima of a clustered table — binary search per
  * row, O(log F), where the equivalent chained-when expression is
  * O(F) per row AND grows the generated code linearly with the file
  * count (a thousand-file table would blow the 64KB generated-method
  * limit and fall back to interpreted eval on the hot assignment
  * scan).
  */
case class SegmentIndex(child: Expression, bounds: Array[Long])
    extends UnaryExpression {

  require(bounds.nonEmpty)

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_segment_index"

  def find(v: Long): Int = {
    val bs = java.util.Arrays.binarySearch(bounds, v)
    if (bs >= 0) bs else math.max(0, -bs - 2)
  }

  override def nullSafeEval(v: Any): Any = find(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val ref = ctx.addReferenceObj("segIdx", this,
        classOf[SegmentIndex].getName)
      s"${ev.value} = $ref.find($v);"
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
