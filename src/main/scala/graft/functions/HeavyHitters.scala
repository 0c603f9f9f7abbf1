package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra–Gries heavy hitters (SURVEY.md §2.H17) — the bounded-state
  * frequent-items summary (Misra & Gries 1982; merge rule from
  * Agarwal et al. 2012's mergeable-summaries result): a k-entry
  * map per partition, merged associatively, shuffling only
  * partitions × k rows however large the stream.
  *
  * Guarantees (spec-pinned): every item with true frequency
  * > n/(k+1) survives into the summary, and each reported count
  * under-estimates its true frequency by at most n/(k+1). The
  * standard production composition is two-pass: MG proposes the
  * bounded candidate set, an exact semi-joined count pass ranks it —
  * candidates are a SUPERSET of the guaranteed heavy hitters, so the
  * composition is exact above the threshold. (The exact top-k
  * queries E6/E15 pay a vocabulary-sized shuffle for exactness; MG
  * is the shape for when even the vocabulary doesn't fit — 10⁸+
  * distinct keys — and only the heavy tail matters.)
  */
object HeavyHitters {

  case class KeyCount(key: String, count: Long)

  class MisraGries(k: Int)
      extends Aggregator[String, Map[String, Long], Seq[KeyCount]] {

    require(k > 0, s"heavy-hitters summary needs k > 0, got $k")

    override def zero: Map[String, Long] = Map.empty

    override def reduce(b: Map[String, Long], x: String): Map[String, Long] =
      b.get(x) match {
        case Some(c) => b.updated(x, c + 1L)
        case None if b.size < k => b.updated(x, 1L)
        case None =>
          // decrement-all: drop zeros, charge every survivor one
          b.flatMap { case (key, c) =>
            if (c > 1L) Some(key -> (c - 1L)) else None
          }
      }

    override def merge(b1: Map[String, Long],
        b2: Map[String, Long]): Map[String, Long] = {
      val combined = b2.foldLeft(b1) { case (acc, (key, c)) =>
        acc.updated(key, acc.getOrElse(key, 0L) + c)
      }
      if (combined.size <= k) combined
      else {
        // subtract the (k+1)-th largest count from everything — the
        // mergeable-summaries rule preserving the n/(k+1) error bound
        val cut = combined.valuesIterator.toArray.sortBy(-_).apply(k)
        combined.flatMap { case (key, c) =>
          if (c > cut) Some(key -> (c - cut)) else None
        }
      }
    }

    override def finish(b: Map[String, Long]): Seq[KeyCount] =
      b.toSeq.sortBy { case (key, c) => (-c, key) }
        .map { case (key, c) => KeyCount(key, c) }

    override def bufferEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
    override def outputEncoder: Encoder[Seq[KeyCount]] =
      ExpressionEncoder[Seq[KeyCount]]()
  }

  /** Column form: `heavyHitters(k)(keyCol)` →
    * array<struct<key,count>> ordered (count desc, key asc).
    */
  def heavyHitters(k: Int)(key: Column): Column =
    udaf(new MisraGries(k), ExpressionEncoder[String]()).apply(key)

  /** Weighted Misra–Gries: each input row carries a (key, weight)
    * pair and counts as `weight` occurrences. Reducing a row is
    * EXACTLY merging a singleton summary {key → weight}, so the
    * mergeable-summaries analysis applies unchanged and every
    * guarantee holds with n = Σ weights: items with true total
    * weight > n/(k+1) survive, counts under-estimate by ≤ n/(k+1).
    *
    * Why it exists (SURVEY §2.E15b): fed from the codegen'd
    * TermCounts byte pass — per-document DISTINCT terms with
    * multiplicities — the summary sees one row per (doc, term)
    * instead of one per token occurrence. On a repetitive corpus
    * that is the difference between aggregator calls ∝ corpus tokens
    * and ∝ per-doc vocabulary, with a bit-identical composition
    * result (Σ_distinct tf ≡ Σ_occurrences).
    */
  class WeightedMisraGries(k: Int)
      extends Aggregator[KeyCount, Map[String, Long], Seq[KeyCount]] {

    require(k > 0, s"heavy-hitters summary needs k > 0, got $k")
    private val mg = new MisraGries(k)

    override def zero: Map[String, Long] = Map.empty

    override def reduce(b: Map[String, Long],
        x: KeyCount): Map[String, Long] = {
      // zero weight = zero occurrences (a no-op, never a summary
      // slot); negative weight would corrupt every bound — fail loud
      require(x.count >= 0L,
        s"negative heavy-hitter weight for '${x.key}': ${x.count}")
      if (x.count == 0L) b else mg.merge(b, Map(x.key -> x.count))
    }

    override def merge(b1: Map[String, Long],
        b2: Map[String, Long]): Map[String, Long] = mg.merge(b1, b2)

    override def finish(b: Map[String, Long]): Seq[KeyCount] =
      mg.finish(b)

    override def bufferEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
    override def outputEncoder: Encoder[Seq[KeyCount]] =
      ExpressionEncoder[Seq[KeyCount]]()
  }

  /** Column form: `heavyHittersWeighted(k)(keyCol, weightCol)` →
    * array<struct<key,count>> ordered (count desc, key asc).
    */
  def heavyHittersWeighted(k: Int)(key: Column, weight: Column): Column =
    udaf(new WeightedMisraGries(k), ExpressionEncoder[KeyCount]())
      .apply(key, weight)
}
