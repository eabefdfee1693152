package graft

import java.sql.Timestamp

import graft.operators.Temporal

class TemporalSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  // user 1: error@100, click@100 (same second!), click@150, error@200,
  //   click@250; user 2: click@50 (no error ever)
  private lazy val events = Seq(
    (1L, ts(100), 1L, "error", 0.0, "{}"),
    (2L, ts(100), 1L, "click", 0.0, "{}"),
    (3L, ts(150), 1L, "click", 0.0, "{}"),
    (4L, ts(200), 1L, "error", 0.0, "{}"),
    (5L, ts(250), 1L, "click", 0.0, "{}"),
    (6L, ts(50), 2L, "click", 0.0, "{}")
  ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("asof join picks the most recent at-or-before right event, null when none") {
    val out = Temporal.asofJoin(events).collect()
      .map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[Any]("asof_ts_s")).map(_.asInstanceOf[Long])).toMap
    // same-second error counts as "at or before" (RANGE frame, not ROWS)
    assert(out(2L) == Some(100L), "click@100 sees the same-second error@100")
    assert(out(3L) == Some(100L))
    assert(out(5L) == Some(200L), "click@250 sees the NEWER error@200, not @100")
    assert(out(6L) == None, "user 2 has no prior error")
  }

  test("range join counts right events in (t, t+W], banded join meets cross-band pairs") {
    // W=600: error@100 → clicks at 150, 250 count; click@100 (dt=0) does
    // not; error@200 → clicks at 250 and ALSO 650+ if within 600
    val more = events.unionByName(
      Seq((7L, ts(790), 1L, "click", 0.0, "{}")).toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val out = Temporal.rangeJoinCount(more, windowSec = 600L).collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[Long]("n_follow")).toMap
    // error@100: clicks 150, 250 in (100,700]; click@790 lands in band 1
    // while error@100 is band 0 — the band+1 replication must catch NOTHING
    // here (790 > 700), proving the residual filter runs
    assert(out(1L) == 2L)
    // error@200: clicks 250, 790 in (200,800] — 790 is in the NEXT band
    // (floor(790/600)=1 vs floor(200/600)=0): cross-band pair caught
    assert(out(4L) == 2L)
  }

  test("range join emits zero-count rows for left events with no matches") {
    val lonely = Seq((1L, ts(100), 9L, "error", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Temporal.rangeJoinCount(lonely).collect()
    assert(out.length == 1 && out(0).getAs[Long]("n_follow") == 0L)
  }

  test("asof/range join plans contain no nested-loop join") {
    for (df <- Seq(Temporal.asofJoin(events), Temporal.rangeJoinCount(events))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"),
        s"temporal ops must stay equi-join/window shaped:\n$plan")
    }
  }

  test("gapFill densifies per-type days, 0-fills, carries LOCF, flags gaps") {
    val day = 86400L
    // type A observed on days 0, 1, 3 (day 2 is a GAP); type B only on
    // day 2 — its spine is the single day, no cross-type bleed
    val ev = Seq(
      (1L, ts(10), 1L, "A", 0.0, "{}"),
      (2L, ts(20), 2L, "A", 0.0, "{}"),
      (3L, ts(day + 10), 1L, "A", 0.0, "{}"),
      (4L, ts(3 * day + 10), 1L, "A", 0.0, "{}"),
      (5L, ts(2 * day + 10), 1L, "B", 0.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Temporal.gapFill(ev).collect()
      .map(r => (r.getAs[Long]("d"), r.getAs[String]("event_type")) ->
        ((r.getAs[Long]("n_events"), r.getAs[Long]("n_locf"), r.getAs[Boolean]("is_gap"))))
      .toMap
    assert(out.size == 5, s"A spans 4 days + B spans 1: $out")
    assert(out((0L, "A")) == ((2L, 2L, false)))
    assert(out((day, "A")) == ((1L, 1L, false)))
    // the gap day: count 0-fills, LOCF holds day 1's count, flag set
    assert(out((2 * day, "A")) == ((0L, 1L, true)))
    assert(out((3 * day, "A")) == ((1L, 1L, false)))
    assert(out((2 * day, "B")) == ((1L, 1L, false)))
  }
}
