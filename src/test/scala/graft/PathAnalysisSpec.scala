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
