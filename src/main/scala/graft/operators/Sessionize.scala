package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Gap-based sessionization: a new session starts when the gap to the
  * previous event of the same user exceeds `gapSeconds`.
  *
  * lag → flag → cumulative-sum-of-flags → session aggregate. Only one
  * shuffle (partitionBy user_id); per-user event streams then sort
  * within partitions. At 100 TB this is the canonical sessionize plan
  * — the alternative (self-join on time ranges) is quadratic.
  *
  * Timestamps truncate to whole seconds up front so the output is
  * engine-precision-independent (parquet ns vs µs).
  */
object Sessionize {

  /** Event-level session assignment — every input event tagged with
    * its per-user `session_id` (1-based cumulative count of
    * gap-exceeding starts, the [[sessions]] numbering) plus the
    * truncated `ts_s`. The composition point for session-grain
    * operators ([[Funnel.sessionDaily]]): sessions are assigned over
    * ALL of a user's events, THEN downstream operators filter to the
    * rows they care about — filtering first would merge sessions
    * split by an unrelated event type's gap.
    *
    * Contract: requires `user_id`, `event_id`, `ts`; every other
    * input column passes through untouched (`ts_s` is added, `ts`
    * dropped) — callers on slim frames (no `event_type`) stay valid.
    */
  def withSessionIds(events: DataFrame, gapSeconds: Long): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts_s"), col("event_id"))
    events
      .withColumn("ts_s",
        unix_timestamp(date_trunc("second", col("ts")).cast(TimestampType)))
      .drop("ts")
      .withColumn("prev_s", lag(col("ts_s"), 1).over(byUser))
      .withColumn("is_new",
        when(col("prev_s").isNull || col("ts_s") - col("prev_s") > gapSeconds, lit(1L))
          .otherwise(lit(0L)))
      .withColumn("session_id", sum(col("is_new")).over(byUser))
      .drop("prev_s", "is_new")
  }

  def sessions(events: DataFrame, gapSeconds: Long): DataFrame =
    withSessionIds(events, gapSeconds)
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts_s")).as("start_s"),
        max(col("ts_s")).as("end_s"))
      .withColumn("dur_s", col("end_s") - col("start_s"))
      .orderBy(col("user_id"), col("session_id"))
}
