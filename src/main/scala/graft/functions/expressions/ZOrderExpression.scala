package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
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
case class ZOrderLong(children: Seq[Expression]) extends Expression {

  private val k = children.size
  require(k >= 2 && k <= 8, s"z-order needs 2..8 columns, got $k")
  private val bits = 63 / k

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
