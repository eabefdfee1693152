package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.Funnel

/** Streaming windowed funnel — the streaming twin of
  * [[graft.operators.Funnel.windowDepth]]: per (user, day), the
  * deepest ordered prefix of `steps` completed with every step inside
  * `windowSec` of the chain's first step, emitted EXACTLY ONCE when
  * the watermark passes the day's end (no in-horizon event can deepen
  * the user-day anymore — the same final-emission contract as
  * [[StreamingSessionize]]).
  *
  * Mechanics (`flatMapGroupsWithState` keyed on (user, day),
  * EventTimeTimeout):
  *  - each micro-batch's events fold in event-time order (ties by
  *    step position, matching the batch twin) into the per-level
  *    latest-viable-anchor array — the identical greedy fold, so an
  *    in-order stream reproduces the batch depths bit-for-bit
  *    (spec-pinned);
  *  - cross-batch out-of-order events inside the watermark horizon
  *    fold in arrival order — the same merge approximation the
  *    sessionizer documents; beyond-horizon stragglers are dropped by
  *    the watermark like every watermarked operator here;
  *  - state per open user-day is one fixed array of `steps.length`
  *    anchor timestamps, removed when the timeout fires — unbounded
  *    streams run at watermark-bounded memory.
  *
  * Scale shape: one shuffle on (user, day) — the exact invariant of
  * the batch twin's first stage; depth assembly is within-partition
  * state. Downstream per-day counts are one bounded aggregation over
  * the emitted rows.
  */
object StreamingFunnel {

  case class FunnelOut(user_id: Long, d: Long, depth: Int)
  // not private: Catalyst's generated encoder projections need access
  case class Ev(user_id: Long, d: Long, tUs: Long, si: Int, ts: java.sql.Timestamp)
  case class FunnelState(anchors: Seq[Long])

  def depths(events: DataFrame, tsCol: String, watermarkDelay: String,
             steps: Seq[String] = Seq("view", "click", "purchase"),
             windowSec: Long = 86400L): Dataset[FunnelOut] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val spark = events.sparkSession
    import spark.implicits._
    val n = steps.length
    val winUs = windowSec * 1000000L
    val evs = events
      .filter(col("event_type").isin(steps: _*))
      .withColumn("ts", col(tsCol).cast("timestamp"))
      .withWatermark("ts", watermarkDelay)
      .select(col("user_id").cast("long").as("user_id"),
        unix_timestamp(date_trunc("day", col("ts"))).as("d"),
        unix_micros(col("ts")).as("tUs"),
        Funnel.stepIndex(steps).as("si"),
        col("ts"))
      .as[Ev]

    def update(key: (Long, Long), rows: Iterator[Ev],
               state: GroupState[FunnelState]): Iterator[FunnelOut] = {
      if (state.hasTimedOut) {
        // the watermark passed the day end: final depth, exactly once
        val out = state.getOption.map(s => FunnelOut(key._1, key._2, s.anchors.count(_ >= 0L)))
        state.remove()
        out.iterator
      } else {
        val anchors = state.getOption.map(_.anchors.toArray).getOrElse(Array.fill(n)(-1L))
        rows.toSeq.sortBy(e => (e.tUs, e.si)).foreach { e =>
          if (e.si == 0) anchors(0) = math.max(anchors(0), e.tUs)
          else if (anchors(e.si - 1) >= 0L && e.tUs - anchors(e.si - 1) <= winUs)
            anchors(e.si) = math.max(anchors(e.si), anchors(e.si - 1))
        }
        state.update(FunnelState(anchors.toSeq))
        // fire when the watermark passes the day's end (kept strictly
        // ahead of the current watermark or the store rejects it)
        state.setTimeoutTimestamp(
          math.max((key._2 + 86400L) * 1000L, state.getCurrentWatermarkMs() + 1L))
        Iterator.empty
      }
    }

    evs.groupByKey(e => (e.user_id, e.d))
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(update)
  }
}
