package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multi-touch attribution: distribute each conversion's credit over
  * the touch events that preceded it inside a lookback window, under
  * the five standard models at once — `last` (all credit to the
  * latest touch), `first` (all to the earliest), `linear` (split
  * evenly), `decay` (time-decay: weight halves per whole DAY of
  * touch→conversion lag — the discrete one-day-half-life form, which
  * keeps the weights integer powers of two), and `position`
  * (U-shaped: 40 % to the first touch, 40 % to the last, the middle
  * 20 % split over the interior touches; a lone touch takes 100 %, a
  * pair 50/50). Credit is integer millionths of a conversion so the
  * sums are exact and engine-portable (no floating-point
  * accumulation; `linear` gives each of n touches 1000000 div n,
  * `decay` gives touch i 1000000·wᵢ div Σw with wᵢ = 2^(maxLagDays −
  * lag_days) — the floor is the deterministic remainder convention
  * throughout, and the power-of-two weights make the decay exact
  * integer arithmetic rather than a cross-engine pow() double).
  *
  * Scale shape: the conversion↔touch pairing is the banded range
  * join ([[Temporal.rangeJoinCount]]'s geometry, inverted for a
  * LOOKBACK): band = t div lookback µs; a conversion replicates to
  * {band, band−1}, a touch keys on its own band, so every in-window
  * (touch ≤ conv, touch > conv − lookback) pair meets on exactly one
  * (user, band) key — join volume is O(in-window pairs), never the
  * per-user cross product, and the join is an equi-join Spark can
  * hash/sort-merge. Touch ranking within a conversion then needs ONE
  * window shuffle keyed (user_id, conv_t) — count, both row_numbers
  * AND the decay-weight sum share the partition key — and all five
  * models' credit rows are emitted in that same pass (one conditional
  * array explode, no per-model recompute or union), leaving one
  * bounded partial-agg rollup to (day, model). Unlike the funnel
  * fold this never collects a user's full history: state per window
  * partition is one conversion's in-window touches.
  */
object Attribution {

  private val DayUs = 86400000000L

  /** Per-(touch-day, model) credit over the events table: every
    * `convType` event's credit attributed to its `touchType` events
    * in the trailing `lookbackSec` window. Conversions with no touch
    * in window carry no credit (the "direct" bucket is their
    * complement — countable as conversions minus `n_touches` of
    * either single-touch model). Output: `d` (epoch-day seconds of
    * the TOUCH — attribution reports credit when the touch happened,
    * not when the conversion did), `model`, `credit_millionths`,
    * `n_touches`, ordered by (d, model).
    *
    * `halfLifeDays` parameterizes the decay model: weight halves per
    * H whole days of lag, wᵢ = 2^((maxLagDays − lag_days) div H) —
    * still a shift, still exact integer arithmetic for any integer-day
    * half-life (7 is the industry default; 1 is this operator's
    * historical default, kept for oracle stability).
    */
  def creditDaily(spark: SparkSession, dir: String,
                  touchType: String = "click", convType: String = "purchase",
                  lookbackSec: Long = 604800L, halfLifeDays: Int = 1): DataFrame = {
    val w = lookbackSec * 1000000L
    // lag_days ∈ [0, maxLagDays] inside the open-below window, so the
    // decay weight 2^((maxLagDays − lag_days) div H) stays a small
    // exact long; past exponent 43 the 1000000·wt credit numerator
    // would overflow (and ≥ 64 would wrap shiftleft silently)
    val maxLagDays = (w - 1) / DayUs
    require(halfLifeDays >= 1, s"halfLifeDays must be >= 1, got $halfLifeDays")
    require(maxLagDays / halfLifeDays <= 43L,
      s"decay exponent ${maxLagDays / halfLifeDays} overflows the exact " +
        s"integer credit arithmetic (lookback $lookbackSec s at half-life " +
        s"$halfLifeDays d); max lookback is ${43L * halfLifeDays + 1} days")
    val ev = graft.Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts").cast("timestamp")).as("t"))
    val band = expr(s"t div ${w}L") // exact integer band, no double rounding
    val conv = ev.filter(col("event_type") === convType)
      .select(col("user_id"), col("t").as("conv_t"),
        explode(array(band, band - 1)).as("band"))
    val touch = ev.filter(col("event_type") === touchType)
      .select(col("user_id"), col("t").as("touch_t"), band.as("band"))
    val pairs = conv.join(touch, Seq("user_id", "band"))
      .filter(col("touch_t") <= col("conv_t") && col("touch_t") > col("conv_t") - w)
      .select(col("user_id"), col("conv_t"), col("touch_t"),
        expr(s"shiftleft(1L, cast((${maxLagDays}L - (conv_t - touch_t) div ${DayUs}L)" +
          s" div ${halfLifeDays}L as int))").as("wt"))
    val byConv = Window.partitionBy(col("user_id"), col("conv_t"))
    // ONE ascending ordering defines both endpoints (first = rn 1,
    // last = rn n). Two independent row_numbers (asc + desc) would,
    // on touch_t ties, hand BOTH endpoint roles to one row and leave
    // another on the interior branch — at n = 2 that divides by zero
    // under ANSI, at n > 2 it silently drops a 400000 share. The
    // positional split conserves credit and is deterministic at the
    // (d, model) grain because tied rows share the same touch day;
    // it is the streaming twin's pos(i) rule verbatim.
    val ranked = pairs
      .withColumn("n", count(lit(1)).over(byConv))
      .withColumn("sum_wt", sum(col("wt")).over(byConv))
      .withColumn("rn", row_number().over(byConv.orderBy(col("touch_t").asc)))
    val d = expr(s"(touch_t div ${DayUs}L) * 86400L")
    val full = 1000000L
    val posCredit = when(col("n") === 1, lit(full))
      .when(col("rn") === 1 || col("rn") === col("n"),
        when(col("n") === 2, lit(500000L)).otherwise(lit(400000L)))
      .otherwise(expr("200000L div (n - 2)"))
    val credits = array(
      struct(d.as("d"), lit("linear").as("model"),
        expr(s"${full}L div n").as("credit")),
      struct(d.as("d"), lit("decay").as("model"),
        expr(s"(${full}L * wt) div sum_wt").as("credit")),
      struct(d.as("d"), lit("position").as("model"), posCredit.as("credit")),
      when(col("rn") === 1,
        struct(d.as("d"), lit("first").as("model"), lit(full).as("credit"))),
      when(col("rn") === col("n"),
        struct(d.as("d"), lit("last").as("model"), lit(full).as("credit"))))
    ranked
      .select(explode(filter(credits, c => c.isNotNull)).as("cr"))
      .groupBy(col("cr.d").as("d"), col("cr.model").as("model"))
      .agg(sum(col("cr.credit")).as("credit_millionths"),
        count(lit(1)).as("n_touches"))
      .orderBy(col("d"), col("model"))
  }

  // ---- stored credit ledger ---------------------------------------------

  /** Persist the (d, model) credit ledger in the exact additive
    * [[CountTable]] lifecycle (days × 5 rows — bounded at any event
    * volume). Credit is ADDITIVE over disjoint conversion sets (each
    * conversion's rows are computed from its complete in-window touch
    * set and just sum into the day totals), so the append unit is "a
    * batch of settled conversions' credit rows" — exactly what
    * [[graft.streaming.StreamingAttribution]] emits per micro-batch:
    * route its watermark-final credits through `foreachBatch` →
    * roll up to (d, model) → [[appendToCreditTable]] with the batch
    * id, and the dashboard reads any day range from the store with
    * zero event-history rescans, exactly-once under foreachBatch
    * replays (spec-pinned: replayed stream ledger ≡ batch
    * creditDaily).
    */
  def writeCreditTable(spark: SparkSession, name: String, credits: DataFrame,
                       buckets: Int = 16): Unit =
    CountTable.write(spark, name, credits, Seq("d", "model"),
      Seq("credit_millionths", "n_touches"), buckets)

  /** Fold one batch of (d, model, credit_millionths, n_touches) rows
    * in — [[CountTable.append]]'s exactly-once batch-stamp contract.
    */
  def appendToCreditTable(spark: SparkSession, name: String, batchCredits: DataFrame,
                          batchId: Long = -1L): Unit =
    CountTable.append(spark, name, batchCredits, batchId)

  /** The ledger from the STORED counts alone. */
  def creditFromTable(spark: SparkSession, name: String): DataFrame =
    CountTable.read(spark, name).orderBy(col("d"), col("model"))

  /** The (d, model) rollup of a [[graft.streaming.StreamingAttribution]]
    * micro-batch — the `foreachBatch` body before
    * [[appendToCreditTable]].
    */
  def rollupCredits(batch: DataFrame): DataFrame =
    batch.groupBy(col("d"), col("model"))
      .agg(sum(col("credit")).as("credit_millionths"),
        count(lit(1)).as("n_touches"))
}
