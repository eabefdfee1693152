package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming event-volume anomaly detection — the streaming twin of
  * [[graft.operators.Anomaly.eventVolume]]: per (event_type, day), the
  * day's event count and its z-score against the trailing `window`
  * OBSERVED finalized days, emitted EXACTLY ONCE when the watermark
  * passes the day's end (the day's count is then final — no in-horizon
  * event can change it; the [[StreamingSessionize]] contract).
  *
  * Mechanics (`flatMapGroupsWithState` keyed on event_type,
  * EventTimeTimeout):
  *  - each micro-batch adds its per-day counts to the type's OPEN
  *    days; a day whose end the watermark has passed can no longer
  *    receive rows (they would be late → dropped), so open days
  *    finalize in ascending day order on either path — data arrival
  *    or timeout — whichever observes the watermark first;
  *  - finalization computes z from the trailing ring of the last
  *    `window` finalized (d, count) pairs — the identical integer-sum
  *    algebra as the batch twin (emits only with a FULL trailing
  *    window; variance 0 → null z, not ±inf) — then the day joins the
  *    ring and the oldest entry falls out;
  *  - state per event_type is bounded by construction: ≤ horizon open
  *    days plus a `window`-entry ring. The ring persists across quiet
  *    periods (it IS the baseline, sized like a dimension: one row
  *    per event-type in the alphabet), so unbounded streams run at
  *    alphabet-bounded, not history-bounded, memory.
  *
  * Scale shape: one shuffle on event_type of PRE-AGGREGATED per-batch
  * day counts (groupByKey over (type, day) count rows would also work,
  * but keying the state on the type keeps the trailing ring local);
  * all data-sized work is the per-batch count, exactly the batch
  * twin's invariant.
  */
object StreamingAnomaly {

  case class AnomalyOut(d: Long, event_type: String, n_events: Long,
                        z_milli: Option[Long])
  // not private: Catalyst's generated encoder projections need access
  case class Ev(event_type: String, d: Long, ts: java.sql.Timestamp)
  case class AnomState(openDays: Seq[Long], openCounts: Seq[Long],
                       trailDays: Seq[Long], trailCounts: Seq[Long])

  def zscores(events: DataFrame, tsCol: String, watermarkDelay: String,
              window: Int = 7): Dataset[AnomalyOut] = {
    require(window >= 1, "anomaly window must be >= 1")
    val spark = events.sparkSession
    import spark.implicits._
    val evs = events
      .withColumn("ts", col(tsCol).cast("timestamp"))
      .withWatermark("ts", watermarkDelay)
      .select(col("event_type"),
        unix_timestamp(date_trunc("day", col("ts"))).as("d"),
        col("ts"))
      .as[Ev]

    def zOf(n: Long, trail: Seq[Long]): Option[Long] = {
      val w = window.toDouble
      val s = trail.sum.toDouble
      val ss = trail.map(c => c * c).sum.toDouble
      val m = s / w
      val s2 = ss / w - m * m
      if (s2 > 0d) Some(math.floor(1000.0 * (n - m) / math.sqrt(s2)).toLong) else None
    }

    def update(key: String, rows: Iterator[Ev],
               state: GroupState[AnomState]): Iterator[AnomalyOut] = {
      val st = state.getOption.getOrElse(AnomState(Nil, Nil, Nil, Nil))
      val open = scala.collection.mutable.LinkedHashMap.empty[Long, Long]
      st.openDays.zip(st.openCounts).foreach { case (d, c) => open(d) = c }
      rows.foreach(e => open(e.d) = open.getOrElse(e.d, 0L) + 1L)
      var trailD = st.trailDays
      var trailC = st.trailCounts
      val wm = state.getCurrentWatermarkMs()
      // finalize every day the watermark has sealed, oldest first
      val (closed, stillOpen) = open.toSeq.sortBy(_._1).partition {
        case (d, _) => (d + 86400L) * 1000L <= wm
      }
      val out = closed.flatMap { case (d, n) =>
        val o = if (trailD.length == window) Some(AnomalyOut(d, key, n, zOf(n, trailC)))
                else None
        trailD = (trailD :+ d).takeRight(window)
        trailC = (trailC :+ n).takeRight(window)
        o
      }
      state.update(AnomState(stillOpen.map(_._1), stillOpen.map(_._2), trailD, trailC))
      // fire when the watermark seals the earliest open day (kept
      // strictly ahead of the current watermark or the store rejects
      // it); a type with only its ring left just waits for new data
      stillOpen.headOption.foreach { case (d, _) =>
        state.setTimeoutTimestamp(math.max((d + 86400L) * 1000L, wm + 1L))
      }
      out.iterator
    }

    evs.groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(update)
  }
}
