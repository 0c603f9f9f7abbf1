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

/** Nearest centroid (squared-L2 argmin) of a float vector against a
  * literal centroid matrix (SURVEY.md §2.D2/D5). Replaces the
  * `transform`/`aggregate` higher-order-function formulation, which
  * Catalyst evaluates through interpreted lambdas with per-element
  * boxing — this loop is primitive and lives inside whole-stage
  * codegen, so the corpus-wide cell-assignment pass (the part of IVF
  * that actually scales with data) is a tight scan. Ties break to the
  * lowest cell index (same as array_position of the min).
  */
case class NearestCell(child: Expression, cents: Array[Array[Double]])
    extends UnaryExpression {

  require(cents.nonEmpty)

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_nearest_cell"

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    var best = 0; var bestD = Double.MaxValue
    var c = 0
    while (c < cents.length) {
      val ct = cents(c)
      var d = 0.0
      var i = 0
      val n = math.min(a.numElements(), ct.length)
      while (i < n) {
        val diff = a.getFloat(i).toDouble - ct(i)
        d += diff * diff
        i += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cm = ctx.addReferenceObj("cents", cents, "double[][]")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val c = ctx.freshName("c")
      val ct = ctx.freshName("ct")
      val d = ctx.freshName("d")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val diff = ctx.freshName("diff")
      s"""
         |int $best = 0; double $bestD = Double.MAX_VALUE;
         |for (int $c = 0; $c < $cm.length; $c++) {
         |  double[] $ct = $cm[$c];
         |  double $d = 0.0;
         |  int $n = java.lang.Math.min($a.numElements(), $ct.length);
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $diff = ((double) $a.getFloat($i)) - $ct[$i];
         |    $d += $diff * $diff;
         |  }
         |  if ($d < $bestD) { $bestD = $d; $best = $c; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Product-quantization encoder (SURVEY.md §2.D4): per subspace s,
  * the squared-L2 argmin of the subvector against codebook
  * `cents(s)`, emitted as array<int>[m]. One primitive pass per row —
  * the corpus-scale encode stays in whole-stage codegen instead of
  * m×k interpreted lambda evaluations per vector.
  */
case class PqEncodeCodes(child: Expression,
    cents: Array[Array[Array[Double]]])
    extends UnaryExpression {

  require(cents.nonEmpty && cents(0).nonEmpty && cents(0)(0).nonEmpty)
  private val m = cents.length
  private val subDim = cents(0)(0).length

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_pq_encode"

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    // Ragged vectors clamp to the available prefix (missing dims read
    // as 0) — an unguarded getFloat past numElements on UnsafeArrayData
    // reads adjacent row memory and yields silently-wrong codes.
    val n = a.numElements()
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      val base = s * subDim
      val cb = cents(s)
      val lim = math.max(0, math.min(subDim, n - base))
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < cb.length) {
        val ct = cb(c)
        var d = 0.0
        var i = 0
        while (i < lim) {
          val diff = a.getFloat(base + i).toDouble - ct(i)
          d += diff * diff
          i += 1
        }
        while (i < subDim) { d += ct(i) * ct(i); i += 1 }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(s) = best
      s += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cm = ctx.addReferenceObj("cents", cents, "double[][][]")
      val codes = ctx.freshName("codes")
      val s = ctx.freshName("s")
      val base = ctx.freshName("base")
      val cb = ctx.freshName("cb")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val c = ctx.freshName("c")
      val ct = ctx.freshName("ct")
      val d = ctx.freshName("d")
      val i = ctx.freshName("i")
      val diff = ctx.freshName("diff")
      val n = ctx.freshName("n")
      val lim = ctx.freshName("lim")
      s"""
         |int $n = $a.numElements();
         |int[] $codes = new int[$m];
         |for (int $s = 0; $s < $m; $s++) {
         |  int $base = $s * $subDim;
         |  int $lim = java.lang.Math.max(0,
         |    java.lang.Math.min($subDim, $n - $base));
         |  double[][] $cb = $cm[$s];
         |  int $best = 0; double $bestD = Double.MAX_VALUE;
         |  for (int $c = 0; $c < $cb.length; $c++) {
         |    double[] $ct = $cb[$c];
         |    double $d = 0.0;
         |    int $i = 0;
         |    for (; $i < $lim; $i++) {
         |      double $diff = ((double) $a.getFloat($base + $i)) - $ct[$i];
         |      $d += $diff * $diff;
         |    }
         |    for (; $i < $subDim; $i++) { $d += $ct[$i] * $ct[$i]; }
         |    if ($d < $bestD) { $bestD = $d; $best = $c; }
         |  }
         |  $codes[$s] = $best;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions
         |  .UnsafeArrayData.fromPrimitiveArray($codes);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Residual of a float vector against its assigned cell's centroid
  * (SURVEY.md §2.D5): `vec - cents(cell)` as array<float>. Sits in
  * the IVF-PQ encode scan, so it's a native primitive loop rather
  * than an interpreted zip_with lambda over every corpus element.
  */
case class CellResidual(left: Expression, right: Expression,
    cents: Array[Array[Double]])
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "graft_cell_residual"

  override def nullSafeEval(v: Any, cell: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val ct = cents(cell.asInstanceOf[Int])
    val n = math.min(a.numElements(), ct.length)
    val out = new Array[Float](n)
    var i = 0
    while (i < n) {
      out(i) = (a.getFloat(i).toDouble - ct(i)).toFloat
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, cell) => {
      val cm = ctx.addReferenceObj("cents", cents, "double[][]")
      val ct = ctx.freshName("ct")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      s"""
         |double[] $ct = $cm[$cell];
         |int $n = java.lang.Math.min($a.numElements(), $ct.length);
         |float[] $out = new float[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $out[$i] = (float) (((double) $a.getFloat($i)) - $ct[$i]);
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions
         |  .UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Per-query ADC lookup table IN-PLAN (SURVEY.md §2.D4/G13):
  * lut(s)(c) = query subvector s · codebook centroid c, as
  * array<array<double>>[m][k] — the driver-side [[graft.operators
  * .Pq.lutFor]] replicated expression-for-expression (index-ordered
  * double multiply-adds, floats widened per element), so a LUT built
  * here is bit-identical to the collected form (spec-pinned). With
  * this, a query BATCH never leaves the plan: no per-batch collect,
  * no driver LUT loop — the G13 streaming serve becomes a pure
  * stream-static join whose only driver artifact is the codebook
  * loaded once at stream setup. Ragged query vectors clamp to the
  * available prefix (missing dims contribute 0), mirroring
  * [[PqEncodeCodes]]' guard.
  */
case class PqLut(child: Expression, cents: Array[Array[Array[Double]]])
    extends UnaryExpression {

  require(cents.nonEmpty && cents(0).nonEmpty && cents(0)(0).nonEmpty)
  private val m = cents.length
  private val subDim = cents(0)(0).length

  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false),
      containsNull = false)
  override def prettyName: String = "graft_pq_lut"

  def lut(v: Any): ArrayData = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    val out = new Array[AnyRef](m)
    var s = 0
    while (s < m) {
      val base = s * subDim
      val lim = math.max(0, math.min(subDim, n - base))
      val cb = cents(s)
      val row = new Array[Double](cb.length)
      var c = 0
      while (c < cb.length) {
        val ct = cb(c)
        var dot = 0.0
        var d = 0
        while (d < lim) {
          dot += a.getFloat(base + d).toDouble * ct(d); d += 1
        }
        row(c) = dot
        c += 1
      }
      out(s) = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(row)
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def nullSafeEval(v: Any): Any = lut(v)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj("pqLut", this, classOf[PqLut].getName)
      s"${ev.value} = $ref.lut($a);"
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** ADC (asymmetric distance computation) score (SURVEY.md §2.D4/D5):
  * Σ_s lut[s][codes[s]] — the per-row lookup-table sum that scores a
  * PQ-compressed vector against a query. `codes` is array<int>[m],
  * `lut` array<array<double>> riding on the broadcast query row.
  * Index-ordered double adds, matching the plain-Scala spec oracle.
  */
case class AdcScore(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_adc_score"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val codes = l.asInstanceOf[ArrayData]
    val lut = r.asInstanceOf[ArrayData]
    val m = math.min(codes.numElements(), lut.numElements())
    var sum = 0.0
    var s = 0
    while (s < m) {
      sum += lut.getArray(s).getDouble(codes.getInt(s))
      s += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (codes, lut) => {
      val m = ctx.freshName("m")
      val sum = ctx.freshName("sum")
      val s = ctx.freshName("s")
      s"""
         |int $m = java.lang.Math.min($codes.numElements(), $lut.numElements());
         |double $sum = 0.0;
         |for (int $s = 0; $s < $m; $s++) {
         |  $sum += $lut.getArray($s).getDouble($codes.getInt($s));
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** PCA projection of a float vector under a literal basis (SURVEY.md
  * §2.D12; r15 OPT): out(j) = dot(v, components(j)) − bias(j), as
  * array<double>[r]. Replaces the per-component
  * `aggregate(zip_with(v, lit(comp), _*_))` formulation, which built
  * an r·d-literal expression tree (measured ~0.5 s of analysis +
  * codegen per query at r=32, d=64 — pure driver latency) and
  * evaluated through interpreted lambdas with per-element boxing.
  * One primitive loop nest inside whole-stage codegen instead.
  * Vectors shorter than d clamp to their prefix (missing dims read
  * as 0), like the other vector expressions — a DELIBERATE semantic
  * difference from the replaced zip_with form, which null-propagated
  * ragged vectors to NULL; every caller's corpus is fixed-width and
  * the `_check` oracles pin the served values (r15 ADVICE, noted).
  * Input is type-checked to array<float> so an array<double> child
  * is an analysis error, not silent garbage through getFloat.
  */
case class PcaProjection(child: Expression,
    components: Array[Array[Double]], bias: Array[Double])
    extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<float> input, got ${other.sql}")
    }

  require(components.nonEmpty && components.length == bias.length)
  private val r = components.length
  private val d = components(0).length

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_pca_project"

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), d)
    val out = new Array[Double](r)
    var j = 0
    while (j < r) {
      val comp = components(j)
      var acc = 0.0
      var i = 0
      while (i < n) { acc += a.getFloat(i).toDouble * comp(i); i += 1 }
      out(j) = acc - bias(j)
      j += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cm = ctx.addReferenceObj("components", components, "double[][]")
      val bs = ctx.addReferenceObj("bias", bias, "double[]")
      val out = ctx.freshName("out")
      val j = ctx.freshName("j")
      val comp = ctx.freshName("comp")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $d);
         |double[] $out = new double[$r];
         |for (int $j = 0; $j < $r; $j++) {
         |  double[] $comp = $cm[$j];
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += ((double) $a.getFloat($i)) * $comp[$i];
         |  }
         |  $out[$j] = $acc - $bs[$j];
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions
         |  .UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
