package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers (SURVEY.md §4). AQE's skew-join handling
  * covers sort-merge joins at runtime; explicit salting remains the
  * tool when one side has a few pathological hot keys and the other
  * side is replicable.
  */
object Skew {

  /** Join types for which salting preserves semantics: each
    * replicated-side row appears `salts` times, so any type that can
    * emit an UNMATCHED replicated row (right/full outer) would emit
    * it once per salt copy.
    */
  private val safeJoinTypes =
    Set("inner", "left", "leftouter", "leftsemi", "leftanti",
      "semi", "anti", "cross") // semi/anti: Spark's short aliases

  /** Salted equi-join: the skewed (big) side gets a random salt in
    * [0, salts); the replicated (small-per-key) side is exploded once
    * per salt value. The join key becomes (key, salt), splitting each
    * hot key's rows across `salts` reducers. Row-multiplication cost
    * lands on the replicated side only — use when that side is
    * bounded per key (dimension-like).
    *
    * Only skewed-side-preserving join types are accepted: with
    * right/full outer joins an unmatched replicated row would surface
    * `salts` times instead of once.
    */
  def saltedJoin(skewed: DataFrame, replicated: DataFrame, key: String,
      salts: Int, joinType: String = "inner"): DataFrame = {
    require(safeJoinTypes.contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin: joinType '$joinType' is not skewed-side-preserving; " +
        "unmatched replicated rows would be duplicated per salt. " +
        "Use one of: inner, left_outer, left_semi, left_anti, cross")
    val s = skewed.withColumn("__salt",
      (rand(seed = 42) * salts).cast("int"))
    val r = replicated.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    s.join(r, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
