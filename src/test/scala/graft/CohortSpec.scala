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

  test("stored matrix ≡ direct; day-ordered appends and replays fold in exactly") {
    val day0 = 86400L * 21000
    def at(d: Int, s: Int = 0) = day0 + d * 86400L + 100L + s
    def ev(rows: Seq[(Long, Long)]) =
      rows.map { case (u, s) => (u, "view", new java.sql.Timestamp(s * 1000L)) }
        .toDF("user_id", "event_type", "ts")
    // seed: u1 days 0,1; u2 day 0 — then a day-2 batch with returning
    // u1, returning-later u2, and BRAND-NEW u4
    val seed = Seq((1L, at(0)), (1L, at(1)), (2L, at(0)))
    val batch = Seq((1L, at(2)), (2L, at(2)), (4L, at(2)), (4L, at(2, 9)))
    graft.operators.Cohort.writeMatrixTable(spark, "cm_spec", ev(seed), buckets = 2)
    def stored = graft.operators.Cohort.matrixFromThetaTable(spark, "cm_spec").collect()
      .map(r => (r.getAs[Long]("cohort_d"), r.getAs[Long]("age_days")) ->
        r.getAs[Long]("n_active")).toMap
    def direct(rows: Seq[(Long, Long)]) = {
      val dir = write(rows)
      graft.operators.Cohort.matrixDaily(spark, dir).collect()
        .map(r => (r.getAs[Long]("cohort_d"), r.getAs[Long]("age_days")) ->
          r.getAs[Long]("n_active")).toMap
    }
    assert(stored == direct(seed), "initial write must equal the direct triangle")
    graft.operators.Cohort.appendToMatrixTable(spark, "cm_spec", ev(batch))
    val afterAppend = direct(seed ++ batch)
    assert(stored == afterAppend,
      "a day-ordered append (returning users + a new user) must equal the direct " +
        "triangle over the union — new users enter at age 0 via the first-seen merge")
    // replaying the SAME batch is a no-op end to end: the first-seen
    // min-merge and the theta union are both idempotent
    graft.operators.Cohort.appendToMatrixTable(spark, "cm_spec", ev(batch))
    assert(stored == afterAppend, "replaying a batch must change nothing")
  }

  test("stored matrix hash-equals the direct key on real data (exact mode)") {
    graft.operators.Cohort.writeMatrixTable(spark, "cm_real",
      Tables.events(spark, sfDir))
    val stored = graft.operators.Cohort.matrixFromThetaTable(spark, "cm_real")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val direct = graft.operators.Cohort.matrixDaily(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(stored == direct,
      "below nominalEntries actives/cell the stored triangle is value-exact")
  }

  test("out-of-order first appearance: drift fires, rebuild reconciles to the direct triangle") {
    val day0 = 86400L * 22000
    def at(d: Int, s: Int = 0) = day0 + d * 86400L + 100L + s
    def ev(rows: Seq[(Long, Long)]) =
      rows.map { case (u, s) => (u, "view", new java.sql.Timestamp(s * 1000L)) }
        .toDF("user_id", "event_type", "ts")
    def direct(rows: Seq[(Long, Long)]) =
      graft.operators.Cohort.matrixDaily(spark, write(rows)).collect()
        .map(r => (r.getAs[Long]("cohort_d"), r.getAs[Long]("age_days")) ->
          r.getAs[Long]("n_active")).toMap
    def stored = graft.operators.Cohort.matrixFromThetaTable(spark, "cm_drift").collect()
      .map(r => (r.getAs[Long]("cohort_d"), r.getAs[Long]("age_days")) ->
        r.getAs[Long]("n_active")).toMap
    // seed sees u1 FIRST at day 2; the late batch reveals u1's real
    // day-0 first appearance (plus in-order u2 activity)
    val seed = Seq((1L, at(2)), (2L, at(2)))
    val late = Seq((1L, at(0)), (2L, at(3)))
    graft.operators.Cohort.writeMatrixTable(spark, "cm_drift", ev(seed), buckets = 2)
    assert(!graft.operators.Cohort.cohortNeedsRebuild(spark, "cm_drift"),
      "a fresh build starts clean")
    val lowered = graft.operators.Cohort.appendToMatrixTable(spark, "cm_drift", ev(late))
    assert(lowered == 1L, s"u1's cohort was lowered, u2's was not — got $lowered")
    val report = graft.operators.Cohort.driftReport(spark, "cm_drift").collect()(0)
    assert(report.getAs[Long]("n_users") == 2L && report.getAs[Long]("n_lowered") == 1L)
    assert(graft.operators.Cohort.cohortNeedsRebuild(spark, "cm_drift"),
      "one lowered user must fire the default rule")
    // the hazard is real: u1's day-2 activity sits in a stale cell
    // under the old cohort (sketches don't subtract)
    val want = direct(seed ++ late)
    assert(stored != want, "pre-rebuild triangle must show the documented divergence")
    graft.operators.Cohort.rebuildMatrixTable(spark, "cm_drift", ev(seed ++ late))
    assert(stored == want, "rebuild must reconcile to the direct triangle exactly")
    assert(!graft.operators.Cohort.cohortNeedsRebuild(spark, "cm_drift"),
      "rebuild resets the drift counter")
  }

  test("streaming cohort ingest: day-ordered micro-batches track matrixDaily, replay no-ops") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx = spark.sqlContext
    val day0 = 86400L * 23000
    def at(d: Int, s: Int = 0) = day0 + d * 86400L + 100L + s
    val b1 = Seq((1L, at(0)), (2L, at(0)), (1L, at(1)))
    val b2 = Seq((1L, at(2)), (3L, at(2)), (3L, at(2, 9)))
    def stored = graft.operators.Cohort.matrixFromThetaTable(spark, "cm_stream").collect()
      .map(r => (r.getAs[Long]("cohort_d"), r.getAs[Long]("age_days")) ->
        r.getAs[Long]("n_active")).toMap
    def direct(rows: Seq[(Long, Long)]) =
      graft.operators.Cohort.matrixDaily(spark, write(rows)).collect()
        .map(r => (r.getAs[Long]("cohort_d"), r.getAs[Long]("age_days")) ->
          r.getAs[Long]("n_active")).toMap
    // a pure-streaming matrix starts from an empty frame
    graft.operators.Cohort.writeMatrixTable(spark, "cm_stream",
      Seq.empty[(Long, String, java.sql.Timestamp)].toDF("user_id", "event_type", "ts"),
      buckets = 2)
    val ms = MemoryStream[(Long, String, java.sql.Timestamp)]
    val q = graft.streaming.StreamingPipeline.cohortIngestStream(
      ms.toDF().toDF("user_id", "event_type", "ts"), "cm_stream").start()
    try {
      ms.addData(b1.map { case (u, s) => (u, "view", new java.sql.Timestamp(s * 1000L)) }: _*)
      q.processAllAvailable()
      assert(stored == direct(b1), "mid-stream triangle must track the live store")
      ms.addData(b2.map { case (u, s) => (u, "view", new java.sql.Timestamp(s * 1000L)) }: _*)
      q.processAllAvailable()
      assert(stored == direct(b1 ++ b2), "day-ordered ingest reproduces the batch twin")
      // redelivery: min-merge and theta insertion are both idempotent
      ms.addData(b2.map { case (u, s) => (u, "view", new java.sql.Timestamp(s * 1000L)) }: _*)
      q.processAllAvailable()
      assert(stored == direct(b1 ++ b2), "a replayed micro-batch must change nothing")
      assert(!graft.operators.Cohort.cohortNeedsRebuild(spark, "cm_stream"),
        "day-ordered ingest accumulates no drift")
    } finally q.stop()
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
