package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Streaming exact dedup (SURVEY.md §2.G4): the streaming face of
  * §C1/C2 — drop any document whose normalized fingerprint was
  * already seen, with state bounded by the watermark horizon
  * (arbitrarily-late duplicates are a batch backfill's job, not
  * unbounded streaming state).
  */
object StreamingDedup {

  /** `events`-shaped text stream: (ts timestamp, text string, …) →
    * first occurrence per fingerprint within the watermark.
    */
  def dedupStream(docs: DataFrame, watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("fingerprint", TextFunctions.fingerprint(col("text")))
      .withWatermark("ts", watermark)
      // plain dropDuplicates would keep fingerprint state forever;
      // the WithinWatermark form is what actually bounds it
      .dropDuplicatesWithinWatermark("fingerprint")
}
