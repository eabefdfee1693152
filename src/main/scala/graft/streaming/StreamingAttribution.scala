package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming multi-touch attribution — the streaming twin of
  * [[graft.operators.Attribution.creditDaily]]: each conversion's
  * credit over the touch events in its trailing lookback window,
  * under the five batch models (last/first/linear/decay/position),
  * emitted EXACTLY ONCE when the watermark passes the conversion's
  * timestamp (at that point no in-horizon touch at-or-before the
  * conversion can still arrive, so the credit set is final — the
  * same watermark-final contract as [[StreamingFunnel]]).
  *
  * Mechanics (`flatMapGroupsWithState` keyed on user,
  * EventTimeTimeout):
  *  - touches buffer in state; conversions buffer as pending until
  *    the watermark passes them, then claim their in-window touches
  *    ((conv − lookback, conv] — the batch operator's exact bounds)
  *    and emit the batch side's exact integer-millionth credit rows
  *    (identical floors and power-of-two decay weights; in-order
  *    stream ≡ batch, spec-pinned). Conversions sharing one
  *    (user, timestamp) fall into ONE batch window partition, so
  *    ripe pending timestamps settle by DISTINCT value with their
  *    multiplicity replicated over the touch rows — m duplicate
  *    conversions over k touches credit like one conversion over
  *    m·k window rows, exactly the batch/oracle semantics (the
  *    naive per-copy emission would double first/last credit);
  *  - a touch is pruned once `touch + lookback ≤ watermark`: any
  *    conversion that could still claim it would itself be below the
  *    watermark, i.e. already finalized or dropped as late. State per
  *    user is therefore bounded by one lookback+delay horizon of
  *    touches plus the sub-watermark conversions — unbounded streams
  *    run at watermark-bounded memory, never a full user history;
  *  - timers chase the next deadline (earliest pending conversion or
  *    touch expiry), so quiet users still finalize and shed state.
  *
  * Scale shape: ONE shuffle on user_id; credit assembly is
  * within-partition state. The (day, model) rollup downstream is a
  * bounded aggregation over emitted credit rows, mirroring the batch
  * plan's final partial-agg stage.
  */
object StreamingAttribution {

  private val DayUs = 86400000000L

  case class CreditOut(user_id: Long, conv_t: Long, d: Long, model: String, credit: Long)
  // not private: Catalyst's generated encoder projections need access
  case class AttrEv(user_id: Long, tUs: Long, isConv: Boolean,
                    ts: java.sql.Timestamp)
  case class AttrState(touches: Seq[Long], pending: Seq[Long])

  def credits(events: DataFrame, tsCol: String, watermarkDelay: String,
              touchType: String = "click", convType: String = "purchase",
              lookbackSec: Long = 604800L, halfLifeDays: Int = 1): Dataset[CreditOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    val w = lookbackSec * 1000000L
    // same exact-integer bound as the batch twin: past exponent 43 the
    // 1000000·wt numerator overflows (≥ 64 wraps the shift silently)
    require(halfLifeDays >= 1, s"halfLifeDays must be >= 1, got $halfLifeDays")
    require((w - 1) / DayUs / halfLifeDays <= 43L,
      s"decay exponent ${(w - 1) / DayUs / halfLifeDays} overflows the exact " +
        s"integer credit arithmetic (lookback $lookbackSec s at half-life $halfLifeDays d)")
    val evs = events
      .filter(col("event_type").isin(touchType, convType))
      .withColumn("ts", col(tsCol).cast("timestamp"))
      .withWatermark("ts", watermarkDelay)
      .select(col("user_id").cast("long").as("user_id"),
        unix_micros(col("ts")).as("tUs"),
        (col("event_type") === convType).as("isConv"),
        col("ts"))
      .as[AttrEv]

    val maxLagDays = (w - 1) / DayUs

    def settle(user: Long, st: AttrState, wmUs: Long,
               state: GroupState[AttrState]): Iterator[CreditOut] = {
      val (ripe, pending) = st.pending.partition(_ < wmUs)
      val out = ripe.groupBy(identity).toSeq.sortBy(_._1).flatMap { case (c, copies) =>
        val m = copies.length
        val win = st.touches.filter(t => t <= c && t > c - w).sorted
        if (win.isEmpty) Seq.empty
        else {
          // the batch window partition's row multiset: every touch row
          // joins every duplicate conversion row
          val rows = win.flatMap(t => Seq.fill(m)(t))
          val n = rows.length
          def day(t: Long) = (t / DayUs) * 86400L
          val lin = 1000000L / n
          val wts = rows.map(t => 1L << ((maxLagDays - (c - t) / DayUs) / halfLifeDays).toInt)
          val sumWt = wts.sum
          def pos(i: Int): Long =
            if (n == 1) 1000000L
            else if (i == 0 || i == n - 1) { if (n == 2) 500000L else 400000L }
            else 200000L / (n - 2)
          rows.map(t => CreditOut(user, c, day(t), "linear", lin)) ++
            rows.zip(wts).map { case (t, wt) =>
              CreditOut(user, c, day(t), "decay", 1000000L * wt / sumWt) } ++
            rows.zipWithIndex.map { case (t, i) =>
              CreditOut(user, c, day(t), "position", pos(i)) } ++
            Seq(CreditOut(user, c, day(rows.head), "first", 1000000L),
              CreditOut(user, c, day(rows.last), "last", 1000000L))
        }
      }
      val touches = st.touches.filter(_ + w > wmUs)
      if (touches.isEmpty && pending.isEmpty) state.remove()
      else {
        state.update(AttrState(touches, pending))
        // wake at the next deadline: earliest pending conversion, or
        // the earliest touch's expiry (kept strictly past the current
        // watermark or the store rejects the timestamp)
        val nextUs = (pending.map(_ + 1) ++ touches.map(_ + w)).min
        state.setTimeoutTimestamp(math.max(nextUs / 1000L, state.getCurrentWatermarkMs() + 1L))
      }
      out.iterator
    }

    def update(user: Long, rows: Iterator[AttrEv],
               state: GroupState[AttrState]): Iterator[CreditOut] = {
      val wmUs = state.getCurrentWatermarkMs() * 1000L
      val st0 = state.getOption.getOrElse(AttrState(Seq.empty, Seq.empty))
      val st =
        if (state.hasTimedOut) st0
        else {
          val (convs, touches) = rows.toSeq.partition(_.isConv)
          AttrState(st0.touches ++ touches.map(_.tUs), st0.pending ++ convs.map(_.tUs))
        }
      settle(user, st, wmUs, state)
    }

    evs.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(update)
  }
}
