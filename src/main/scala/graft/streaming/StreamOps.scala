package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Structured-Streaming transforms (EXT: the reference has no streams —
  * SURVEY §2.2 "Streaming" — so these are the streaming analogues of its
  * bounded operators over the `events` table shape).
  *
  * Every function here takes a DataFrame and works UNCHANGED on a batch
  * frame or a `readStream` frame — that symmetry is the test strategy:
  * specs drive them through a MemoryStream and assert equality with the
  * batch result.
  */
object StreamOps {

  /** Tumbling/sliding event-time windowed aggregation with a watermark
    * (late data beyond `watermark` is dropped in streaming mode).
    */
  def windowedCounts(events: DataFrame, tsCol: String, windowDur: String,
      slideDur: Option[String] = None, watermark: String = "1 hour"): DataFrame = {
    val withWm =
      if (events.isStreaming) events.withWatermark(tsCol, watermark) else events
    val win = slideDur match {
      case Some(s) => window(col(tsCol), windowDur, s)
      case None => window(col(tsCol), windowDur)
    }
    withWm
      .groupBy(win.as("win"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        // exact decimal accumulate -> order-independent double
        sum(col("value").cast("decimal(30,2)")).cast("double").as("value_sum"))
      .select(col("win.start").as("win_start"), col("win.end").as("win_end"),
        col("event_type"), col("cnt"), col("value_sum"))
  }

  /** Streaming value_counts analogue: running per-key totals (complete
    * output mode in streaming).
    */
  def runningValueCounts(events: DataFrame, keyCol: String): DataFrame =
    events.groupBy(col(keyCol).as("value")).agg(count(lit(1)).as("cnt"))

  /** Streaming dedup analogue of drop_duplicates_by_index keep='first':
    * state-backed exact dedup on a key within the watermark horizon.
    */
  def dedupStream(events: DataFrame, tsCol: String, keys: Seq[String],
      watermark: String = "1 hour"): DataFrame = {
    val withWm =
      if (events.isStreaming) events.withWatermark(tsCol, watermark) else events
    withWm.dropDuplicates(keys)
  }
}
