package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftColumnBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Ascending, Descending, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator top-k-per-group as a first-class plan node
  * (SURVEY.md §2.H — extension ladder step (c): LogicalPlan +
  * Strategy + SparkPlan, the shape used when composition can't
  * express the physical algorithm).
  *
  * Physical shape: TWO exec phases, mirroring partial/final hash
  * aggregation. The partial phase runs before any exchange and
  * reduces every partition to ≤ k rows per group with a bounded
  * binary heap; the final phase declares
  * `ClusteredDistribution(group)` so the planner inserts a hash
  * exchange that only ever carries those survivors — at most
  * partitions × groups × k rows, never the corpus. Rank-filter via a
  * window, by contrast, sorts and shuffles everything.
  *
  * Versus the H3 `Aggregator` (functions.TopK): same asymptotics, but
  * this form keeps whole rows (no score/id projection), emits them in
  * rank order, and needs no array explode on the way out.
  */
/** `rankAttr`: when set, the final phase ALSO emits the within-group
  * rank (1-based, in `order`) as a trailing int column — callers that
  * need the rank in their output (E5's per-doc top-3) then skip the
  * rank window over the survivors entirely, and with it the window's
  * sort+exchange stage. The attribute is fixed at construction so
  * optimizer copies preserve its exprId (a lazily regenerated
  * attribute would orphan parent references).
  */
case class TopKPerGroupPlan(k: Int, groupExprs: Seq[Expression],
    order: Seq[SortOrder], child: LogicalPlan,
    rankAttr: Option[Attribute] = None) extends UnaryNode {
  require(k > 0)
  override def output: Seq[Attribute] = child.output ++ rankAttr
  // rank is GENERATED here, not consumed — without this the
  // reflective `references` treats the constructor attribute as an
  // input and CheckAnalysis rejects the plan (missing attribute).
  override def producedAttributes
      : org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr.toSeq)
  override protected def withNewChildInternal(c: LogicalPlan): LogicalPlan =
    copy(child = c)
}

object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupPlan(k, group, order, child, rankAttr) =>
      val partial = TopKPerGroupExec(k, group, order, planLater(child),
        partial = true)
      TopKPerGroupExec(k, group, order, partial, partial = false,
        rankAttr) :: Nil
    case _ => Nil
  }
}

case class TopKPerGroupExec(k: Int, groupExprs: Seq[Expression],
    order: Seq[SortOrder], child: SparkPlan, partial: Boolean,
    rankAttr: Option[Attribute] = None)
    extends UnaryExecNode {

  require(rankAttr.isEmpty || !partial,
    "rank emission is a final-phase concern")

  override def output: Seq[Attribute] = child.output ++ rankAttr
  override def producedAttributes
      : org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr.toSeq)
  override def nodeName: String =
    if (partial) "TopKPerGroupPartial" else "TopKPerGroupFinal"

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(groupExprs) :: Nil

  // Row-local operator: partitioning/ordering of the child survive
  // (the final phase only drops rows within each partition). Without
  // this the default UnknownPartitioning forces a redundant exchange
  // under any downstream operator keyed on the same group columns
  // (e.g. a rank window over the ≤k survivors).
  override def outputPartitioning
      : org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val groupE = groupExprs
    val orderE = order
    val inAttrs = child.output
    val rankA = rankAttr
    val limit = k
    val isPartial = partial
    child.execute().mapPartitions { it =>
      val keyProj = UnsafeProjection.create(groupE, inAttrs)
      val rankOrd = GenerateOrdering.generate(orderE, inAttrs)
      // Identity projection: the child isn't guaranteed to emit
      // UnsafeRows (RDD-backed scans emit GenericInternalRow), so
      // normalize instead of casting. No-op copy cost for columnar/
      // codegen children, which already produce UnsafeRow.
      val toUnsafe = UnsafeProjection.create(inAttrs, inAttrs)
      // k-slot survivor buffer (k is small — 1..100s): linear scan
      // for the current worst beats a PriorityQueue's allocation and
      // pointer chasing at these sizes, and half the partial phase's
      // former cost WAS the per-group heap allocation.
      final class Buf {
        val rows = new Array[UnsafeRow](limit)
        var n = 0
        def offer(row: UnsafeRow): Unit = {
          if (n < limit) { rows(n) = row.copy(); n += 1 }
          else {
            var worst = 0
            var i = 1
            while (i < limit) {
              if (rankOrd.compare(rows(i), rows(worst)) > 0) worst = i
              i += 1
            }
            if (rankOrd.compare(row, rows(worst)) < 0) rows(worst) = row.copy()
          }
        }
        def sorted: Array[UnsafeRow] = {
          val a = java.util.Arrays.copyOf(rows, n)
          java.util.Arrays.sort(a, rankOrd)
          a
        }
      }
      val groups = new java.util.LinkedHashMap[UnsafeRow, Buf]()
      // Adaptive partial phase: when group cardinality ≈ row
      // cardinality within this partition (e.g. groups are docs and
      // the rows arrive partitioned by (doc, term)), the partial
      // reduction buys nothing — every row survives — while paying a
      // map entry + row copy per row. Detect that at runtime and
      // degrade to passthrough, exactly like a partial hash
      // aggregation that stops combining when reduction is poor. The
      // final phase (complete groups under ClusteredDistribution)
      // never degrades, so results are exact either way.
      var seen = 0L
      var degraded = false
      while (!degraded && it.hasNext) {
        val row = toUnsafe(it.next())
        val key = keyProj(row)
        var buf = groups.get(key)
        if (buf == null) { buf = new Buf; groups.put(key.copy(), buf) }
        buf.offer(row)
        seen += 1
        if (isPartial && (seen & 0x1FFF) == 0 &&
          groups.size().toLong * 10 > seen * 9) degraded = true
      }
      import scala.jdk.CollectionConverters._
      val emit: Iterator[UnsafeRow] => Iterator[InternalRow] = rankA match {
        case None => it => it
        case Some(a) =>
          // append the 1-based ordinal; the projection materializes
          // the joined row into an UnsafeRow (buffer reuse per the
          // standard operator iterator contract)
          val proj = UnsafeProjection.create(
            inAttrs :+ a, inAttrs :+ a)
          val joined = new org.apache.spark.sql.catalyst.expressions.JoinedRow
          val rankRow = new org.apache.spark.sql.catalyst.expressions
            .GenericInternalRow(1)
          it => it.zipWithIndex.map { case (r, i) =>
            rankRow.update(0, i + 1)
            proj(joined(r, rankRow))
          }
      }
      val reduced = groups.values().iterator().asScala
        .flatMap(b => emit(b.sorted.iterator))
      // passthrough tail: rows after the degrade point go straight to
      // the exchange (buffer-reuse contract: the consumer serializes
      // before the next call, so no copy)
      if (degraded) reduced ++ it.map(toUnsafe(_): InternalRow)
      else reduced
    }
  }

  override protected def withNewChildInternal(c: SparkPlan): SparkPlan =
    copy(child = c)
}

/** User API + strategy registration. */
object TopKPerGroup {

  /** Ensure the planner knows the node (idempotent; also registered
    * by GraftExtensions for sessions built with them).
    */
  def register(spark: SparkSession): Unit = {
    val strategies = spark.experimental.extraStrategies
    if (!strategies.contains(TopKPerGroupStrategy))
      spark.experimental.extraStrategies =
        strategies :+ TopKPerGroupStrategy
  }

  /** Top `k` rows per group of `groupCols`, ordered by `orderBy`
    * (column name → descending?). Output = input schema (+ an int
    * `rankCol` when requested), rows emitted in rank order within
    * each group.
    */
  def apply(df: DataFrame, k: Int, groupCols: Seq[String],
      orderBy: Seq[(String, Boolean)],
      rankCol: Option[String] = None): DataFrame = {
    val spark = df.sparkSession
    register(spark)
    val lp = GraftColumnBridge.analyzed(df)
    def attr(name: String) = lp.output.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(s"no column $name"))
    val group = groupCols.map(attr)
    val order = orderBy.map { case (n, desc) =>
      SortOrder(attr(n), if (desc) Descending else Ascending)
    }
    val rankAttr = rankCol.map(n => AttributeReference(n,
      org.apache.spark.sql.types.IntegerType, nullable = false)())
    GraftColumnBridge.ofRows(spark,
      TopKPerGroupPlan(k, group, order, lp, rankAttr))
  }
}
