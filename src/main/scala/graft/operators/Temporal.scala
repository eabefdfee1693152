package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Temporal joins over event streams: as-of join and banded range
  * join — the two time-correlation primitives a relational engine
  * needs beyond plain equi-joins.
  *
  * Both are built so NO inequality theta-join ever reaches the
  * physical plan: Spark executes those as per-key nested loops (or
  * worse, BroadcastNestedLoopJoin), which is quadratic in events per
  * user. The as-of join is a window pass; the range join is an
  * equi-join on a time band.
  */
object Temporal {

  private def tsS(c: org.apache.spark.sql.Column) =
    unix_timestamp(date_trunc("second", c).cast(TimestampType))

  /** As-of join: each `leftType` event picks the timestamp of the most
    * recent `rightType` event of the SAME user at-or-before its own
    * timestamp (NULL if none) — "what was the last error state when
    * this click happened".
    *
    * Spark-first shape: not a join at all. One shuffle on user_id,
    * then `max(ts) over (RANGE unbounded-preceding..current)` of the
    * right-side timestamps evaluated over the merged per-user stream.
    * The RANGE frame (not ROWS) makes "at or before" mean `ts_r <=
    * ts_l` exactly, including same-second right events regardless of
    * their sort position within the tie — bit-parity with the
    * oracle's correlated `max(...) WHERE ts_r <= ts_l` subquery.
    *
    * At 100 TB: cost = one data-sized exchange on user_id + a
    * per-partition sort; the naive ASOF formulation (theta-join on
    * `r.ts <= l.ts` + argmax) shuffles the same data but then does
    * per-user quadratic work.
    */
  def asofJoin(events: DataFrame, leftType: String = "click",
               rightType: String = "error"): DataFrame = {
    val e = events.select(col("event_id"), col("user_id"), col("event_type"),
      tsS(col("ts")).as("ts_s"))
    val upToNow = Window.partitionBy(col("user_id")).orderBy(col("ts_s"))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    e.withColumn("asof_ts_s",
        max(when(col("event_type") === rightType, col("ts_s"))).over(upToNow))
      .filter(col("event_type") === leftType)
      .select(col("event_id"), col("user_id"), col("ts_s"), col("asof_ts_s"))
      .orderBy(col("event_id"))
  }

  /** Banded range join: for each `leftType` event, the count of
    * `rightType` events of the same user in the following
    * `(ts, ts + windowSec]` interval — "clicks within 10 minutes
    * after each error".
    *
    * Scale-safe shape: both sides key on (user_id, time-band) with
    * band = floor(ts / windowSec); the left row is replicated to its
    * own band and the next (any right event within the window lands
    * in one of those two bands, and in exactly ONE — so the equi-join
    * meets every qualifying pair exactly once, no distinct needed).
    * The residual `0 < dt <= windowSec` predicate runs post-join on
    * candidates only. Join volume is O(events × density of one band),
    * never the per-user cross product an inequality join executes.
    * Zero-match left events are restored by a final slim left join
    * keyed on event_id.
    */
  /** Gap-fill + LOCF resample: per event_type, a dense daily spine
    * from the type's first to last observed day, with each day's event
    * count — `n_events` 0-filled on gap days, `n_locf` carrying the
    * last OBSERVED day's count forward (the two standard resample
    * semantics: "nothing happened" vs "state unchanged"), and an
    * `is_gap` marker. The missing-days primitive every downstream
    * trailing-window computation (Anomaly.eventVolume's convention is
    * observed-days; this materializes the calendar-days alternative)
    * and every charting layer needs.
    *
    * Scale shape: ONE partial-agg shuffle off the scan reduces the
    * data to the bounded (types × days) count frame; the spine
    * (`sequence` off each type's min/max — generated, never scanned)
    * and the left join and LOCF window all run over that tiny frame,
    * so the operator's cost is the count aggregation at any event
    * volume.
    */
  def gapFill(events: DataFrame): DataFrame =
    gapFillFromCounts(events
      .groupBy(unix_timestamp(date_trunc("day", col("ts"))).as("d"), col("event_type"))
      .agg(count(lit(1)).as("n")))

  /** [[gapFill]] answered from a STORED volume table
    * ([[Anomaly.writeVolumeTable]]'s [[CountTable]] lifecycle) — the
    * SAME stored counts that re-score anomalies also densify for the
    * charting layer, zero raw-history rescans.
    */
  def gapFillFromTable(spark: SparkSession, name: String): DataFrame =
    gapFillFromCounts(CountTable.read(spark, name)
      .select(col("d"), col("event_type"), col("n_events").as("n")))

  private def gapFillFromCounts(counts: DataFrame): DataFrame = {
    val spine = counts.groupBy(col("event_type"))
      .agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
      .select(col("event_type"),
        explode(sequence(col("d0"), col("d1"), lit(86400L))).as("d"))
    val locf = Window.partitionBy(col("event_type")).orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(counts, Seq("event_type", "d"), "left")
      .select(col("d"), col("event_type"),
        coalesce(col("n"), lit(0L)).as("n_events"),
        last(col("n"), ignoreNulls = true).over(locf).as("n_locf"),
        col("n").isNull.as("is_gap"))
      .orderBy(col("d"), col("event_type"))
  }

  def rangeJoinCount(events: DataFrame, leftType: String = "error",
                     rightType: String = "click", windowSec: Long = 600L): DataFrame = {
    val e = events.select(col("event_id"), col("user_id"), col("event_type"),
      tsS(col("ts")).as("ts_s"))
    val left = e.filter(col("event_type") === leftType)
      .select(col("event_id"), col("user_id"), col("ts_s"))
    val band = floor(col("ts_s") / lit(windowSec.toDouble)).cast("long")
    val lBanded = left.withColumn("band", explode(array(band, band + 1)))
    val right = e.filter(col("event_type") === rightType)
      .select(col("user_id"), col("ts_s").as("r_ts_s"))
      .withColumn("band", floor(col("r_ts_s") / lit(windowSec.toDouble)).cast("long"))
    val counts = lBanded.join(right, Seq("user_id", "band"))
      .filter(col("r_ts_s") > col("ts_s") && col("r_ts_s") <= col("ts_s") + lit(windowSec))
      .groupBy(col("event_id")).agg(count(lit(1)).as("n_follow"))
    left.join(counts, Seq("event_id"), "left")
      .select(col("event_id"), col("user_id"), col("ts_s"),
        coalesce(col("n_follow"), lit(0L)).as("n_follow"))
      .orderBy(col("event_id"))
  }
}
