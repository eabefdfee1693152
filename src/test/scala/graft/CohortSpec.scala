package graft

import org.apache.spark.sql.functions._
import graft.operators.Cohort

class CohortSpec extends SparkSpec {
  import spark.implicits._

  private def write(rows: Seq[(Long, Long)]): String = {
    val tmp = java.nio.file.Files.createTempDirectory("cohort").toString
    rows.map { case (u, s) => (u, "view", new java.sql.Timestamp(s * 1000L)) }
      .toDF("user_id", "event_type", "ts")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    tmp
  }

  test("cohorts by first-seen day; ages count distinct actives; repeat events collapse") {
    val day0 = 86400L * 20000
    def at(d: Int, s: Int = 0) = day0 + d * 86400L + 100L + s
    // u1 first day 0, active days 0, 1, 3 (twice on day 1 — collapses);
    // u2 first day 0, active day 0 only; u3 first day 1, active 1, 2
    val dir = write(Seq(
      (1L, at(0)), (1L, at(1)), (1L, at(1, 5)), (1L, at(3)),
      (2L, at(0)),
      (3L, at(1)), (3L, at(2))))
    val got = Cohort.matrixDaily(spark, dir).collect()
      .map(r => (r.getAs[Long]("cohort_d"), r.getAs[Long]("age_days")) ->
        r.getAs[Long]("n_active")).toMap
    assert(got == Map(
      (day0, 0L) -> 2L, (day0, 1L) -> 1L, (day0, 3L) -> 1L,
      (day0 + 86400L, 0L) -> 1L, (day0 + 86400L, 1L) -> 1L))
  }

  test("real data: two data-sized shuffles — distinct reduction, then the user window") {
    val df = Cohort.matrixDaily(spark, sfDir)
    val rows = df.collect()
    assert(rows.nonEmpty && rows.forall(_.getAs[Long]("n_active") > 0))
    // age-0 diagonal must exist for every cohort (a user is active on
    // their own first day by definition)
    val byCohort = rows.groupBy(_.getAs[Long]("cohort_d"))
    assert(byCohort.values.forall(_.exists(_.getAs[Long]("age_days") == 0L)))
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    val exchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    // distinct + user window + the tiny partial-count exchange
    assert(exchanges <= 3, s"expected ≤3 hash exchanges, got $exchanges:\n$plan")
    assert(!plan.contains("Join"), s"cohort assignment is a window, not a join:\n$plan")
  }
}
