package graft.functions

import org.apache.spark.sql.Column

/** Misra–Gries heavy hitters (SURVEY.md §2.H17) — the bounded-state
  * frequent-items summary (Misra & Gries 1982; merge rule from
  * Agarwal et al. 2012's mergeable-summaries result): a k-entry
  * map per partition, merged associatively, shuffling only
  * partitions × k rows however large the stream.
  *
  * Guarantees (spec-pinned): every item with true frequency
  * > n/(k+1) survives into the summary, and each reported count
  * under-estimates its true frequency by at most n/(k+1), with
  * n = Σ weights (the unweighted form is weight 1 per row; reducing
  * a weighted row is exactly merging a singleton summary, so the
  * mergeable analysis applies unchanged). The standard production
  * composition is two-pass: MG proposes the bounded candidate set,
  * an exact semi-joined count pass ranks it — candidates are a
  * SUPERSET of the guaranteed heavy hitters, so the composition is
  * exact above the threshold. (The exact top-k queries E6/E15 pay a
  * vocabulary-sized shuffle for exactness; MG is the shape for when
  * even the vocabulary doesn't fit — 10⁸+ distinct keys — and only
  * the heavy tail matters.)
  *
  * Implementation (r10): ONE native TypedImperativeAggregate,
  * [[graft.functions.expressions.MisraGriesAgg]] — a mutable map
  * with long[] cells and AMORTIZED pruning (entries accumulate to
  * 2k, then one (k+1)-th-largest subtraction prunes under k; a
  * prune subtracts its cut from ≥ k+1 surviving entries, so
  * Σcuts·(k+1) ≤ n and both guarantees keep the n/(k+1) bound).
  * The first two cuts of this operator are kept as negative
  * results: an immutable-Map Aggregator pruned on EVERY over-k
  * insertion — an O(k log k) sort plus a full map copy per incoming
  * row once the key space outgrew k — and even with a mutable
  * buffer the udaf path deserializes each input row into a case
  * class through an ExpressionEncoder, one allocation + string
  * decode per (doc, term) row (1.4 s and 1.1 s respectively for the
  * E15b sketch pass at the 10× board, vs the exact vocabulary
  * shuffle at 0.4 s that the sketch exists to avoid). The native
  * update reads the UTF8String key straight off the row.
  */
object HeavyHitters {

  case class KeyCount(key: String, count: Long)

  /** Column form: `heavyHitters(k)(keyCol)` →
    * array<struct<key,count>> ordered (count desc, key asc).
    */
  def heavyHitters(k: Int)(key: Column): Column =
    GraftFunctions.misraGries(key, org.apache.spark.sql.functions.lit(1L), k)

  /** Column form: `heavyHittersWeighted(k)(keyCol, weightCol)` →
    * array<struct<key,count>> ordered (count desc, key asc).
    */
  def heavyHittersWeighted(k: Int)(key: Column, weight: Column): Column =
    GraftFunctions.misraGries(key, weight, k)
}
