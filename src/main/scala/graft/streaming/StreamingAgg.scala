package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming windowed aggregation with watermark — the
  * streaming twin of Relational.q11EventsWindow (same `window()`
  * semantics, so batch and stream agree on bucket boundaries).
  *
  * Watermark bounds state: late events beyond `watermark` are dropped
  * and closed windows are evicted from the state store — this is what
  * keeps unbounded streams at bounded memory on a real cluster.
  */
object StreamingAgg {

  /** Tumbling-window count + sum per (window, event_type). Works on a
    * streaming OR batch DataFrame with (ts: timestamp, event_type,
    * value) columns.
    */
  def windowAgg(events: DataFrame, windowDuration: String, watermarkDelay: String): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowDuration).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))
}
