package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming operators (SURVEY.md §2.5).
  *
  * Both take an unbounded DataFrame (readStream source) and return a
  * transformed streaming DataFrame the caller wires to a sink — the
  * standard composable shape. Event time drives everything: the
  * watermark bounds state (without it, windowed state grows forever at
  * 100 TB/day ingest) and late data beyond it is dropped deterministically.
  */
object StreamingOps {

  /** Tumbling event-time window aggregation — the streaming twin of the
    * batch q12_time_window_agg: count + decimal-exact value sum per
    * (window, event_type). State per open window only; append-mode
    * emits a window once the watermark passes its end.
    */
  def windowAgg(
      events: DataFrame,
      windowLength: String = "1 hour",
      watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLength), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(12,2)")).cast("double").as("total_value"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"), col("n_events"), col("total_value"))

  /** Stateful streaming dedup on event_id: keeps the FIRST arrival of
    * each id, holding ids in state only within the watermark horizon
    * (dropDuplicatesWithinWatermark — bounded state, unlike plain
    * dropDuplicates whose id set grows without bound). Streaming twin of
    * the exact-dedup batch ops (d01/q05 family).
    */
  def dedupWithinWatermark(events: DataFrame, watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")
}
