package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-volume anomaly detection: per (event_type, day), the z-score
  * of the day's event count against the trailing `window` OBSERVED
  * days (rows-based, so a gap day doesn't silently shrink the
  * baseline — it shifts it, the same convention both engines share).
  * Days without a full trailing window emit nothing.
  *
  * Engine-portable exactness: the window carries only INTEGER sums
  * (Σn, Σn² over longs — no floating-point accumulation order to
  * diverge), the mean/variance/z algebra runs the identical IEEE
  * expression on both sides, and the emitted score is
  * `floor(1000·z)` — so the oracle hash-matches even though the
  * score is real-valued. Variance 0 (a perfectly flat baseline)
  * yields z undefined → the row emits with z_milli NULL rather than
  * an engine-specific ±inf.
  *
  * Scale shape: the per-(type, day) count frame is tiny at ANY event
  * volume (types × days rows) — one partial-agg shuffle off the scan
  * does all the data-sized work; the trailing window runs over the
  * bounded count frame, partitioned by event_type.
  */
object Anomaly {

  /** Per-(day, event_type) count + trailing-window z-score in
    * milli-units (`floor(1000·z)`). Output: `d`, `event_type`,
    * `n_events`, `z_milli`, ordered by (d, event_type).
    */
  def eventVolume(spark: SparkSession, dir: String, window: Int = 7): DataFrame =
    eventVolume(graft.Tables.events(spark, dir), window)

  /** The same computation over any frame with `ts` + `event_type` —
    * the batch side of the [[graft.streaming.StreamingAnomaly]]
    * parity contract.
    */
  /** Seasonality-aware sibling of [[eventVolume]]: the trailing-N
    * baseline scores every weekly-periodic workload wrong on its
    * periodic days (a normal Saturday measured against a
    * weekday-dominated window), so this emits BOTH scores per
    * (day, type) row — `z_milli` against the trailing `window`
    * observed days and `z_sow_milli` against the trailing
    * `seasonalWindow` observed SAME-day-of-week days (the count
    * frame re-windowed by (type, dow) — day-of-week is just
    * `(epoch_day mod 7)`; no calendar join). Rows emit for every
    * observed (day, type); a score whose baseline window isn't full
    * (or has zero variance) is NULL. Same integer-sum + identical
    * IEEE algebra as [[eventVolume]], so both scores hash-match the
    * DuckDB twin.
    *
    * Scale shape: identical to [[eventVolume]] — all windows run
    * over the bounded (types × days) count frame; the second window
    * re-partitions that tiny frame by (type, dow), nothing
    * data-sized.
    */
  def eventVolumeSeasonal(spark: SparkSession, dir: String, window: Int = 7,
                          seasonalWindow: Int = 4): DataFrame =
    eventVolumeSeasonal(graft.Tables.events(spark, dir), window, seasonalWindow)

  def eventVolumeSeasonal(events: DataFrame, window: Int,
                          seasonalWindow: Int): DataFrame =
    seasonalScores(volumeCounts(events), window, seasonalWindow)

  /** [[eventVolumeSeasonal]] answered from the STORED counts alone —
    * the same [[writeVolumeTable]] table serves both baselines and
    * [[Temporal.gapFillFromTable]]'s spine.
    */
  def seasonalFromTable(spark: SparkSession, name: String, window: Int = 7,
                        seasonalWindow: Int = 4): DataFrame =
    seasonalScores(CountTable.read(spark, name), window, seasonalWindow)

  private def seasonalScores(counts0: DataFrame, window: Int,
                             seasonalWindow: Int): DataFrame = {
    val counts = counts0.withColumn("dow", expr("(d div 86400) % 7"))
    val t = Window.partitionBy(col("event_type")).orderBy(col("d"))
      .rowsBetween(-window, -1)
    val sow = Window.partitionBy(col("event_type"), col("dow")).orderBy(col("d"))
      .rowsBetween(-seasonalWindow, -1)
    def z(s: Column, ss: Column, np: Column, w: Int): Column = {
      val wd = lit(w.toDouble)
      val m = s / wd
      val s2 = ss / wd - m * m
      when(np === w && s2 > 0d,
        floor(lit(1000.0) * (col("n_events") - m) / sqrt(s2)).cast("long"))
    }
    counts
      .withColumn("s7", sum(col("n_events")).over(t))
      .withColumn("ss7", sum(col("n_events") * col("n_events")).over(t))
      .withColumn("np7", count(col("n_events")).over(t))
      .withColumn("s4", sum(col("n_events")).over(sow))
      .withColumn("ss4", sum(col("n_events") * col("n_events")).over(sow))
      .withColumn("np4", count(col("n_events")).over(sow))
      .select(col("d"), col("event_type"), col("n_events"),
        z(col("s7"), col("ss7"), col("np7"), window).as("z_milli"),
        z(col("s4"), col("ss4"), col("np4"), seasonalWindow).as("z_sow_milli"))
      .orderBy(col("d"), col("event_type"))
  }

  def eventVolume(events: DataFrame, window: Int): DataFrame =
    zScores(volumeCounts(events), window)

  /** The (d, event_type, n_events) count frame every anomaly form
    * scores over — the only data-sized aggregation. Counts are
    * DISTRIBUTIVE over any row split, so this is also the stored
    * lifecycle's batch unit: arbitrary batch boundaries sum exactly.
    */
  def volumeCounts(events: DataFrame): DataFrame =
    events
      .groupBy(unix_timestamp(date_trunc("day", col("ts"))).as("d"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))

  // ---- stored volume lifecycle ----------------------------------------

  /** Persist the count frame in the exact additive [[CountTable]]
    * lifecycle (types × days rows — bounded at any event volume), so
    * the anomaly dashboard re-scores any window from the stored table
    * with zero raw-history rescans. Append batches may split the
    * stream ANYWHERE (counts sum exactly); `batchId` gives replayed
    * foreachBatch deliveries the exactly-once guard.
    */
  def writeVolumeTable(spark: SparkSession, name: String, events: DataFrame,
                       buckets: Int = 16): Unit =
    CountTable.write(spark, name, volumeCounts(events),
      Seq("event_type", "d"), "n_events", buckets)

  def appendToVolumeTable(spark: SparkSession, name: String, batch: DataFrame,
                          batchId: Long = -1L): Unit =
    CountTable.append(spark, name, volumeCounts(batch), batchId)

  /** [[eventVolume]] answered from the STORED counts alone. */
  def volumeFromTable(spark: SparkSession, name: String, window: Int = 7): DataFrame =
    zScores(CountTable.read(spark, name), window)

  private def zScores(counts: DataFrame, window: Int): DataFrame = {
    val trail = Window.partitionBy(col("event_type")).orderBy(col("d"))
      .rowsBetween(-window, -1)
    val w = lit(window.toDouble)
    val s = sum(col("n_events")).over(trail)
    val ss = sum(col("n_events") * col("n_events")).over(trail)
    val nPrev = count(col("n_events")).over(trail)
    val m = col("s") / w
    val s2 = col("ss") / w - m * m
    counts
      .withColumn("s", s).withColumn("ss", ss).withColumn("np", nPrev)
      .filter(col("np") === window)
      .withColumn("s2", s2)
      .withColumn("z_milli",
        when(col("s2") > 0d,
          floor(lit(1000.0) * (col("n_events") - m) / sqrt(col("s2"))).cast("long"))
          .otherwise(lit(null).cast("long")))
      .select(col("d"), col("event_type"), col("n_events"), col("z_milli"))
      .orderBy(col("d"), col("event_type"))
  }
}
