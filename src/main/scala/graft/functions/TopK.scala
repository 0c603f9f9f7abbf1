package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Partial top-k aggregate (SURVEY.md §2.H3).
  *
  * Replaces rank-then-filter for top-k-per-group: each partition
  * reduces its rows into a bounded k-item buffer (map-side partial
  * aggregation), so only n_groups × k scored ids ever cross the
  * shuffle — against a window that sorts and shuffles the entire
  * corpus. That asymmetry is the whole game at 100 TB: top-10 of a
  * billion candidates shuffles 10 rows per group, not 10⁹.
  *
  * Ordering is total (score desc, id asc) so results are
  * deterministic under any partitioning.
  */
object TopK {

  case class ScoredId(score: Double, id: Long)

  private val ord: Ordering[ScoredId] =
    Ordering.by((s: ScoredId) => (-s.score, s.id))

  class TopKAggregator(k: Int)
      extends Aggregator[ScoredId, List[ScoredId], Seq[ScoredId]] {

    override def zero: List[ScoredId] = Nil

    /** Keep the buffer sorted best-first and capped at k. */
    private def insert(buf: List[ScoredId], x: ScoredId): List[ScoredId] = {
      if (buf.lengthCompare(k) >= 0 && ord.gteq(x, buf.last)) buf
      else {
        val (better, worse) = buf.span(b => ord.lt(b, x))
        (better ::: (x :: worse)).take(k)
      }
    }

    override def reduce(b: List[ScoredId], a: ScoredId): List[ScoredId] =
      insert(b, a)
    override def merge(b1: List[ScoredId], b2: List[ScoredId]): List[ScoredId] =
      b2.foldLeft(b1)(insert)
    override def finish(b: List[ScoredId]): Seq[ScoredId] = b

    override def bufferEncoder: Encoder[List[ScoredId]] =
      ExpressionEncoder[List[ScoredId]]()
    override def outputEncoder: Encoder[Seq[ScoredId]] =
      ExpressionEncoder[Seq[ScoredId]]()
  }

  /** Column form: `topk(k)(scoreCol, idCol)` → array<struct<score,id>>
    * ordered best-first.
    */
  def topk(k: Int)(score: Column, id: Column): Column =
    udaf(new TopKAggregator(k), ExpressionEncoder[ScoredId]())
      .apply(score, id)

  /** String-keyed twin of [[topk]] — same bounded-buffer partial
    * aggregation for keys that aren't numeric ids (event types,
    * terms). Total order (score desc, key asc).
    */
  case class ScoredKey(score: Double, key: String)

  private val ordKey: Ordering[ScoredKey] =
    Ordering.by((s: ScoredKey) => (-s.score, s.key))

  class TopKByAggregator(k: Int)
      extends Aggregator[ScoredKey, List[ScoredKey], Seq[ScoredKey]] {

    override def zero: List[ScoredKey] = Nil

    private def insert(buf: List[ScoredKey], x: ScoredKey): List[ScoredKey] = {
      if (buf.lengthCompare(k) >= 0 && ordKey.gteq(x, buf.last)) buf
      else {
        val (better, worse) = buf.span(b => ordKey.lt(b, x))
        (better ::: (x :: worse)).take(k)
      }
    }

    override def reduce(b: List[ScoredKey], a: ScoredKey): List[ScoredKey] =
      insert(b, a)
    override def merge(b1: List[ScoredKey],
        b2: List[ScoredKey]): List[ScoredKey] =
      b2.foldLeft(b1)(insert)
    override def finish(b: List[ScoredKey]): Seq[ScoredKey] = b

    override def bufferEncoder: Encoder[List[ScoredKey]] =
      ExpressionEncoder[List[ScoredKey]]()
    override def outputEncoder: Encoder[Seq[ScoredKey]] =
      ExpressionEncoder[Seq[ScoredKey]]()
  }

  def topkBy(k: Int)(score: Column, key: Column): Column =
    udaf(new TopKByAggregator(k), ExpressionEncoder[ScoredKey]())
      .apply(score, key)
}
