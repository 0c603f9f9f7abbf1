package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native vector math over `array<float>` embeddings (SURVEY.md
  * §2.D3/H2).
  *
  * Why a Catalyst Expression and not a UDF: the cosine loop runs once
  * per candidate pair — at 100 TB that is the single hottest scalar
  * in the dedup/ANN paths. `doGenCode` emits a primitive double loop
  * straight into whole-stage codegen: no boxing, no Row wrapping, no
  * codegen barrier.
  *
  * Determinism contract (relied on by the DuckDB oracle): products
  * and accumulations are double-precision in index order, result =
  * dot / (sqrt(na) * sqrt(nb)) — the exact same IEEE op sequence the
  * oracle SQL spells out with list_reduce.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = (double) $a.getFloat($i);
         |  double $y = (double) $b.getFloat($i);
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Random-hyperplane bit signature for embedding LSH (SURVEY.md
  * §2.C7): bit j set ⇔ v · plane_j ≥ 0. ≤ 32 planes → int. Planes are
  * baked into the expression (broadcast with the plan, O(planes·dim)).
  */
case class HyperplaneSignature(child: Expression,
    planes: Array[Array[Double]])
    extends UnaryExpression {

  require(planes.nonEmpty && planes.length <= 32)

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_hyperplane_sig"

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    var sig = 0
    var j = 0
    while (j < planes.length) {
      val p = planes(j)
      var dot = 0.0
      var i = 0
      val m = math.min(n, p.length)
      while (i < m) { dot += a.getFloat(i).toDouble * p(i); i += 1 }
      if (dot >= 0.0) sig |= (1 << j)
      j += 1
    }
    sig
  }

  // Primitive double loop over a referenced double[][] — fully inside
  // whole-stage codegen, no boxing.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val pl = ctx.addReferenceObj("planes", planes, "double[][]")
      val n = ctx.freshName("n")
      val sig = ctx.freshName("sig")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val m = ctx.freshName("m")
      val p = ctx.freshName("p")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = $a.numElements();
         |int $sig = 0;
         |for (int $j = 0; $j < $pl.length; $j++) {
         |  double[] $p = $pl[$j];
         |  double $dot = 0.0;
         |  int $m = java.lang.Math.min($n, $p.length);
         |  for (int $i = 0; $i < $m; $i++) {
         |    $dot += ((double) $a.getFloat($i)) * $p[$i];
         |  }
         |  if ($dot >= 0.0) $sig |= (1 << $j);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
