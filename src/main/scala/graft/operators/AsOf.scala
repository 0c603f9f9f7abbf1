package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.Tables

/** As-of join (SURVEY.md §2.B12): for every left row, the latest
  * right row with right.time ≤ left.time, per key.
  *
  * Spark lacks the operator; per the extension ladder this composes
  * existing ops (preference (a)): tag + union both sides, one window
  * pass per key ordered by (time, tag) carrying the last non-null
  * right payload forward, keep left rows. Cost = ONE shuffle on the
  * key + a per-partition sort — the same profile as a sort-merge
  * join, with no range-condition row explosion, and it scales with
  * key cardinality (user_id here) like any window.
  */
object AsOf {

  /** Left as-of join. `rightCols` are emitted with `prefix`, NULL
    * when no right row precedes the left row.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      prefix: String = "asof_"): DataFrame = {
    val lStruct = struct(left.columns.map(col).toSeq: _*)
    val rStruct = struct(right.columns.map(col).toSeq: _*)
    val lType = StructType(left.schema.fields)
    val rType = StructType(right.schema.fields)

    val lt = left.select(col(key).as("__k"), col(leftTime).as("__t"),
      lit(1).as("__tag"), lStruct.as("__l"),
      lit(null).cast(rType).as("__r"))
    val rt = right.select(col(key).as("__k"), col(rightTime).as("__t"),
      lit(0).as("__tag"), lit(null).cast(lType).as("__l"),
      rStruct.as("__r"))

    // Right rows sort before left rows at equal time → "≤" semantics.
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = lt.unionByName(rt)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)

    val leftCols = left.columns.map(c => col(s"__l.$c").as(c))
    val rightCols = right.columns.map(c => col(s"__m.$c").as(s"$prefix$c"))
    matched.select(leftCols ++ rightCols: _*)
  }

  /** B12 query: each 'purchase' event joined to the user's latest
    * preceding 'click' (all time math in epoch ms; right side
    * deduplicated per (user, ms) so tie behavior is well-defined in
    * both engines).
    */
  def eventsAsof(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.eventsWithMs(spark, dir)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ms"))
    val w = Window.partitionBy(col("user_id"), col("ms"))
      .orderBy(col("event_id").desc)
    val clicks = e.filter(col("event_type") === "click")
      .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .select(col("user_id"), col("ms").as("click_ms"),
        col("value").as("click_value"))
    asofJoin(purchases, clicks, key = "user_id",
      leftTime = "ms", rightTime = "click_ms", prefix = "c_")
      .select(col("event_id"), col("user_id"), col("ms"),
        col("c_click_ms").as("click_ms"),
        col("c_click_value").as("click_value"))
  }

  val oracles: Map[String, String] = Map(
    "q_events_asof" ->
      """WITH e AS (SELECT event_id, user_id, epoch_ms(ts) AS ms,
        |    event_type, value FROM events),
        |p AS (SELECT event_id, user_id, ms FROM e
        |  WHERE event_type = 'purchase'),
        |c0 AS (SELECT user_id, ms AS click_ms, value AS click_value,
        |    ROW_NUMBER() OVER (PARTITION BY user_id, ms
        |      ORDER BY event_id DESC) AS rn
        |  FROM e WHERE event_type = 'click'),
        |c AS (SELECT user_id, click_ms, click_value FROM c0 WHERE rn = 1)
        |SELECT p.event_id, p.user_id, p.ms, c.click_ms, c.click_value
        |FROM p ASOF LEFT JOIN c
        |  ON p.user_id = c.user_id AND p.ms >= c.click_ms""".stripMargin
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_events_asof" -> ((s, d) => eventsAsof(s, d))
  )
}
