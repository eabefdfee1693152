package graft

import org.apache.spark.sql.functions._
import graft.operators.PathAnalysis

class PathAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("paths are time-ordered, truncated, and ranked with a total tie-break") {
    val day = 86400L * 20000
    // u1/u2 share view>click; u3 alone on click>view; u4 produces 7
    // events — path truncates to the first 5; u5 next day
    val rows = Seq(
      (1L, "view", day + 10), (1L, "click", day + 20),
      (2L, "view", day + 30), (2L, "click", day + 40),
      (3L, "click", day + 10), (3L, "view", day + 20)) ++
      (0 until 7).map(i => (4L, if (i % 2 == 0) "view" else "error", day + 100 + i)) ++
      Seq((5L, "signup", day + 86400L + 10))
    val tmp = java.nio.file.Files.createTempDirectory("paths").toString
    rows.map { case (u, t, s) => (u, t, new java.sql.Timestamp(s * 1000L)) }
      .toDF("user_id", "event_type", "ts")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = PathAnalysis.topkDaily(spark, tmp, k = 2, maxSteps = 5).collect()
      .map(r => (r.getAs[Long]("d"), r.getAs[String]("path"), r.getAs[Long]("n_users")))
    assert(got.toSeq == Seq(
      (day, "view>click", 2L),
      // count-1 tie between u3 and u4 breaks on the path string
      (day, "click>view", 1L),
      (day + 86400L, "signup", 1L)))
  }

  test("plan: WindowGroupLimit caps the rank shuffle below the window") {
    val plan = PathAnalysis.topkDaily(spark, sfDir).queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"per-day top-k must push a partial group limit below the rank exchange:\n$plan")
    assert(!plan.contains("Cartesian") && !plan.contains("BroadcastNestedLoop"))
  }

  test("session paths split on the gap and report on the session's start day") {
    val day = 86400L * 20000
    // u1: session A (view,click 100 s apart) then, past the 1800 s
    // gap, session B (purchase) — the DAY grain would read one
    // view>click>purchase journey; the session grain must not.
    // u2: one session STRADDLING midnight (30 s gap) — the whole
    // view>click path reports on the start day.
    val rows = Seq(
      (1L, 1L, "view", day + 10), (1L, 2L, "click", day + 110),
      (1L, 3L, "purchase", day + 5000),
      (2L, 4L, "view", day + 86390), (2L, 5L, "click", day + 86420))
    val tmp = java.nio.file.Files.createTempDirectory("spaths").toString
    rows.map { case (u, e, t, s) => (u, e, t, new java.sql.Timestamp(s * 1000L)) }
      .toDF("user_id", "event_id", "event_type", "ts")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = PathAnalysis.topkSession(spark, tmp).collect()
      .map(r => (r.getAs[Long]("d"), r.getAs[String]("path"), r.getAs[Long]("n_sessions")))
    assert(got.toSeq == Seq(
      (day, "purchase", 1L),
      (day, "view>click", 2L)).sortBy(x => (x._1, -x._3, x._2)),
      s"got ${got.toSeq}")
    val edges = PathAnalysis.transitionsSession(spark, tmp).collect()
      .map(r => (r.getAs[Long]("d"), r.getAs[String]("src_step"),
        r.getAs[String]("dst_step"), r.getAs[Long]("n_trans")))
    // adjacency is within-session only: NO click→purchase edge across
    // u1's gap; u2's midnight-straddling edge lands on the start day
    assert(edges.toSeq == Seq((day, "view", "click", 2L)), s"got ${edges.toSeq}")
  }

  test("session-grain plans: WindowGroupLimit cap; lead and session-start share one shuffle") {
    val topk = PathAnalysis.topkSession(spark, sfDir).queryExecution.executedPlan.toString
    assert(topk.contains("WindowGroupLimit"),
      s"per-day top-k must push a partial group limit below the rank exchange:\n$topk")
    val trans = PathAnalysis.transitionsSession(spark, sfDir)
      .queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    // hashpartitioning(user_id) from the sessionize window satisfies
    // the (user, session) clustering, so the lead window and the
    // session-start min re-sort WITHOUT re-exchanging: the whole
    // pipeline rides ONE event-set shuffle
    val sessionExchanges = trans.linesIterator
      .count(l => l.contains("Exchange hashpartitioning") && l.contains("session_id"))
    assert(sessionExchanges == 0,
      s"the session windows must reuse the sessionize user exchange, " +
        s"got $sessionExchanges extra:\n$trans")
    val userExchanges = trans.linesIterator
      .count(l => l.contains("Exchange hashpartitioning") && l.contains("user_id"))
    assert(userExchanges == 1,
      s"exactly one event-set shuffle (the sessionize user exchange), " +
        s"got $userExchanges:\n$trans")
  }

  test("every day emits at most k rows and counts cover distinct users") {
    val k = 5
    val df = PathAnalysis.topkDaily(spark, sfDir, k = k)
    val perDay = df.groupBy("d").agg(count(lit(1)).as("c"), sum("n_users").as("u"))
      .collect()
    assert(perDay.nonEmpty)
    assert(perDay.forall(_.getAs[Long]("c") <= k))
    val userDays = Tables.events(spark, sfDir)
      .select(unix_timestamp(date_trunc("day", col("ts"))).as("d"), col("user_id"))
      .distinct().groupBy("d").agg(count(lit(1)).as("ud"))
      .collect().map(r => r.getAs[Long]("d") -> r.getAs[Long]("ud")).toMap
    perDay.foreach { r =>
      assert(r.getAs[Long]("u") <= userDays(r.getAs[Long]("d")),
        "top-k path users cannot exceed the day's active users")
    }
  }
}
