package graft

import org.apache.spark.sql.functions._
import graft.operators.Anomaly

class AnomalySpec extends SparkSpec {
  import spark.implicits._

  private def write(rows: Seq[(Long, String, Long)]): String = {
    val tmp = java.nio.file.Files.createTempDirectory("anom").toString
    rows.map { case (u, t, s) => (u, t, new java.sql.Timestamp(s * 1000L)) }
      .toDF("user_id", "event_type", "ts")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    tmp
  }

  test("a planted spike scores high against an alternating baseline; flat baselines yield NULL") {
    val day0 = 86400L * 20000
    // 'click': 7 alternating baseline days (1,2,1,2,1,2,1) then a
    // 10-count spike day; 'view': 7 flat days then one more (s2 = 0)
    def at(d: Int, i: Int) = day0 + d * 86400L + 100L + i
    val clicks = (0 until 7).flatMap(d =>
      (0 until (if (d % 2 == 0) 1 else 2)).map(i => (1L + i, "click", at(d, i)))) ++
      (0 until 10).map(i => (1L + i, "click", at(7, i)))
    val views = (0 until 8).map(d => (1L, "view", at(d, 0)))
    val got = Anomaly.eventVolume(spark, write(clicks ++ views)).collect()
      .map(r => (r.getAs[Long]("d"), r.getAs[String]("event_type")) ->
        ((r.getAs[Long]("n_events"), Option(r.getAs[Any]("z_milli"))))).toMap
    // only day 7 has a full 7-day trailing window for each type
    assert(got.keySet == Set((day0 + 7 * 86400L, "click"), (day0 + 7 * 86400L, "view")))
    // click baseline: Σn = 10, Σn² = 16 → var 12/49 > 0
    val m = 10.0 / 7
    val s2 = 16.0 / 7 - m * m
    val want = math.floor(1000.0 * (10 - m) / math.sqrt(s2)).toLong
    assert(got((day0 + 7 * 86400L, "click")) == ((10L, Some(want))))
    assert(got((day0 + 7 * 86400L, "view")) == ((1L, None)),
      "zero-variance baseline must yield NULL, not ±inf")
  }

  test("a below-baseline day scores negative") {
    val day0 = 86400L * 21000
    def at(d: Int, i: Int) = day0 + d * 86400L + 100L + i
    val ev = (0 until 7).flatMap(d =>
      (0 until (if (d % 2 == 0) 5 else 7)).map(i => (1L + i, "click", at(d, i)))) ++
      Seq((1L, "click", at(7, 0)))
    val z = Anomaly.eventVolume(spark, write(ev)).collect()
    assert(z.length == 1 && z.head.getAs[Long]("z_milli") < 0)
  }

  test("same-weekday baseline absolves a planted weekly cycle the trailing-7 flags") {
    // six weeks of 'load': weekdays ~100 (±2 cycle keeps variance
    // nonzero), every 7th day spikes ~1000 (±2 across weeks). Day0 is
    // a multiple of 7 days, so dow class = dayIdx % 7.
    val day0 = 86400L * 21000 // 21000 % 7 == 0
    def cnt(d: Int): Long =
      if (d % 7 == 6) 1000L + (d / 7) % 3 else 100L + d % 3
    val ev = (0 until 42).flatMap(d =>
      (0 until cnt(d).toInt).map(i => (1L + i, "load", day0 + d * 86400L + 100L + i)))
    val got = Anomaly.eventVolumeSeasonal(spark, write(ev)).collect()
      .map(r => r.getAs[Long]("d") -> ((r.getAs[Long]("n_events"),
        Option(r.getAs[Any]("z_milli")).map(_.asInstanceOf[Long]),
        Option(r.getAs[Any]("z_sow_milli")).map(_.asInstanceOf[Long])))).toMap
    // closed form: the identical IEEE algebra over the planted counts
    def zOf(v: Long, trail: Seq[Long], w: Int): Option[Long] =
      if (trail.length < w) None
      else {
        val m = trail.sum.toDouble / w
        val s2 = trail.map(c => c * c).sum.toDouble / w - m * m
        if (s2 > 0d) Some(math.floor(1000.0 * (v - m) / math.sqrt(s2)).toLong) else None
      }
    val want = (0 until 42).map { d =>
      val trail7 = ((d - 7) max 0 until d).map(x => cnt(x))
      val sow = (d % 7 until d by 7).map(x => cnt(x)).takeRight(4)
      (day0 + d * 86400L) -> ((cnt(d), zOf(cnt(d), trail7, 7),
        if (sow.length == 4) zOf(cnt(d), sow, 4) else None))
    }.toMap
    assert(got == want, s"full two-baseline output must match the closed form")
    // the periodic day: trailing-7 alarms (the spike vs a
    // weekday-dominated window saturates near √6 ≈ 2.45σ), the
    // same-weekday baseline reads it as ~1σ noise
    val (_, z7, z4) = got(day0 + 41 * 86400L)
    assert(z7.exists(_ > 2300), s"trailing-7 must flag the weekly spike, got $z7")
    assert(z4.exists(z => math.abs(z) < 1500),
      s"same-weekday baseline must absolve the weekly spike, got $z4")
  }

  test("streaming anomaly counts across micro-batches and emits watermark-final z exactly once") {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingAnomaly
    implicit val ctx = spark.sqlContext
    val day0 = 86400L * 20000
    def at(d: Int, i: Int) = day0 + d * 86400L + 100L + i
    // the planted-spike fixture: alternating click baseline + a
    // 10-count day-7 spike; flat view baseline (variance 0 → null z)
    val clicks = (0 until 7).flatMap(d =>
      (0 until (if (d % 2 == 0) 1 else 2)).map(i => (1L + i, "click", at(d, i)))) ++
      (0 until 10).map(i => (1L + i, "click", at(7, i)))
    val views = (0 until 8).map(d => (1L, "view", at(d, 0)))
    // views first: the cross-batch split must only move day-7 spike
    // clicks (at the watermark frontier) into batch 2 — anything older
    // would be legitimately dropped as late
    val all = views ++ clicks
    val ms = MemoryStream[(Long, String, Timestamp)]
    val q = StreamingAnomaly.zscores(
      ms.toDF().toDF("user_id", "event_type", "ts"), "ts", "10 minutes")
      .writeStream.format("memory").queryName("sanom").outputMode("append").start()
    def emitted = spark.sql("SELECT d, event_type, n_events, z_milli FROM sanom").collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), Option(r.getAs[Any]("z_milli")))))
    try {
      // split day 7's spike ACROSS batches: counts must accumulate
      val (b1, b2) = all.splitAt(all.length - 5)
      ms.addData(b1.map { case (u, t, s) => (u, t, new Timestamp(s * 1000L)) }: _*)
      q.processAllAvailable()
      ms.addData(b2.map { case (u, t, s) => (u, t, new Timestamp(s * 1000L)) }: _*)
      q.processAllAvailable()
      assert(emitted.isEmpty, "no emission before the watermark seals a full-window day")
      // sentinel (own type) pushes the watermark past day 7's end
      ms.addData((99L, "zz", new Timestamp((day0 + 9 * 86400L) * 1000L)))
      q.processAllAvailable()
      val batch = Anomaly.eventVolume(
        all.map { case (u, t, s) => (u, t, new Timestamp(s * 1000L)) }
          .toDF("user_id", "event_type", "ts"), 7).collect()
        .map(r => (r.getAs[Long]("d"), r.getAs[String]("event_type")) ->
          ((r.getAs[Long]("n_events"), Option(r.getAs[Any]("z_milli")))))
      assert(batch.nonEmpty && batch.exists(_._2._2.isDefined))
      assert(emitted.toMap == batch.toMap,
        s"stream must reproduce the batch twin: ${emitted.toSeq} vs ${batch.toSeq}")
      // exactly once: a later watermark advance must not re-emit
      ms.addData((99L, "zz", new Timestamp((day0 + 20 * 86400L) * 1000L)))
      q.processAllAvailable()
      assert(emitted.length == batch.length, "watermark-final rows emit exactly once")
    } finally q.stop()
  }

  test("stored volume table ≡ direct; arbitrary splits sum exactly; replays no-op") {
    def ev(rows: Seq[(Long, String, Long)]) =
      rows.map { case (u, t, s) => (u, t, new java.sql.Timestamp(s * 1000L)) }
        .toDF("user_id", "event_type", "ts")
    val day0 = 86400L * 22000
    def at(d: Int, i: Int) = day0 + d * 86400L + 100L + i
    // 10 days of alternating click volume — enough for two scored days
    val all = (0 until 10).flatMap(d =>
      (0 until (if (d % 2 == 0) 1 else 3)).map(i => (1L + i, "click", at(d, i))))
    // split MID-DAY: counts are distributive, the stored sum is exact
    val (b1, b2) = all.splitAt(all.length / 2)
    Anomaly.writeVolumeTable(spark, "av_spec", ev(b1), buckets = 2)
    Anomaly.appendToVolumeTable(spark, "av_spec", ev(b2), batchId = 1L)
    def stored = Anomaly.volumeFromTable(spark, "av_spec").collect().map(_.toSeq).toSeq
    val direct = Anomaly.eventVolume(ev(all), 7).collect().map(_.toSeq).toSeq
    assert(direct.nonEmpty && stored == direct,
      "stored-counts z-scores must equal the direct operator on any batch split")
    // a replayed batch id must not double-count
    Anomaly.appendToVolumeTable(spark, "av_spec", ev(b2), batchId = 1L)
    assert(stored == direct, "replaying a stamped batch must change nothing")
    // the SAME stored table serves the seasonal baselines and the
    // gap-fill spine — the whole volume dashboard, zero rescans
    val seasonalStored = Anomaly.seasonalFromTable(spark, "av_spec")
      .collect().map(_.toSeq).toSeq
    val seasonalDirect = Anomaly.eventVolumeSeasonal(ev(all), 7, 4)
      .collect().map(_.toSeq).toSeq
    assert(seasonalDirect.nonEmpty && seasonalStored == seasonalDirect)
    val gapStored = graft.operators.Temporal.gapFillFromTable(spark, "av_spec")
      .collect().map(_.toSeq).toSeq
    val gapDirect = graft.operators.Temporal.gapFill(ev(all))
      .collect().map(_.toSeq).toSeq
    assert(gapDirect.nonEmpty && gapStored == gapDirect)
  }

  test("stored transitions table ≡ direct on whole-user-day batches; replays no-op") {
    import graft.operators.PathAnalysis
    def ev(rows: Seq[(Long, Long, String, Long)]) =
      rows.map { case (u, e, t, s) => (u, e, t, new java.sql.Timestamp(s * 1000L)) }
        .toDF("user_id", "event_id", "event_type", "ts")
    val day0 = 86400L * 22000
    // two users × two days, known edges per user-day
    def userDay(u: Long, d: Int, base: Long) = Seq(
      (u, base, "view", day0 + d * 86400L + 10),
      (u, base + 1, "click", day0 + d * 86400L + 20),
      (u, base + 2, "purchase", day0 + d * 86400L + 30))
    val all = userDay(1L, 0, 10) ++ userDay(2L, 0, 20) ++
      userDay(1L, 1, 30) ++ userDay(2L, 1, 40)
    // append batches carry WHOLE (day, user) groups — the contract
    PathAnalysis.writeTransitionsTable(spark, "tr_spec",
      ev(userDay(1L, 0, 10) ++ userDay(2L, 0, 20)), buckets = 2)
    PathAnalysis.appendToTransitionsTable(spark, "tr_spec",
      ev(userDay(1L, 1, 30) ++ userDay(2L, 1, 40)), batchId = 1L)
    def stored = PathAnalysis.transitionsFromTable(spark, "tr_spec")
      .collect().map(_.toSeq).toSeq
    val direct = PathAnalysis.transitionsDaily(ev(all)).collect().map(_.toSeq).toSeq
    assert(direct.nonEmpty && stored == direct,
      "whole-user-day appends must reproduce the direct matrix")
    PathAnalysis.appendToTransitionsTable(spark, "tr_spec",
      ev(userDay(2L, 1, 40)), batchId = 1L)
    assert(stored == direct, "replaying a stamped batch must change nothing")
  }

  test("stored day-grain funnel and path histogram ≡ direct; the step-1 filter applies at read") {
    import graft.operators.{Funnel, PathAnalysis}
    def ev(rows: Seq[(Long, String, Long)]) =
      rows.map { case (u, t, s) => (u, t, new java.sql.Timestamp(s * 1000L)) }
        .toDF("user_id", "event_type", "ts")
    val day0 = 86400L * 22000
    def userDay(u: Long, d: Int, types: Seq[String]) =
      types.zipWithIndex.map { case (t, i) => (u, t, day0 + d * 86400L + 10L + i * 10L) }
    // batch 1: day 0 has only a clicker (NO step-1 entrant yet);
    // batch 2 brings day 0 its viewer plus day 1 — the read-time
    // filter must reveal day 0 only after batch 2
    val b1 = userDay(1L, 0, Seq("click", "purchase"))
    val b2 = userDay(2L, 0, Seq("view", "click")) ++ userDay(1L, 1, Seq("view", "purchase"))
    Funnel.writeDailyTable(spark, "fd_spec", ev(b1), buckets = 2)
    assert(Funnel.dailyFromTable(spark, "fd_spec").collect().isEmpty,
      "a day with no step-1 entrant emits nothing — the orderedDaily convention")
    Funnel.appendToDailyTable(spark, "fd_spec", ev(b2), batchId = 1L)
    def storedF = Funnel.dailyFromTable(spark, "fd_spec").collect().map(_.toSeq).toSeq
    val directF = {
      val tmp = java.nio.file.Files.createTempDirectory("fd").toString
      ev(b1 ++ b2).write.mode("overwrite").parquet(s"$tmp/events.parquet")
      Funnel.orderedDaily(spark, tmp).collect().map(_.toSeq).toSeq
    }
    assert(directF.nonEmpty && storedF == directF)
    Funnel.appendToDailyTable(spark, "fd_spec", ev(b2), batchId = 1L)
    assert(storedF == directF, "replaying a stamped batch must change nothing")

    PathAnalysis.writePathsTable(spark, "pd_spec", ev(b1), buckets = 2)
    PathAnalysis.appendToPathsTable(spark, "pd_spec", ev(b2), batchId = 1L)
    val storedP = PathAnalysis.topkFromTable(spark, "pd_spec").collect().map(_.toSeq).toSeq
    val directP = PathAnalysis.topkDaily(ev(b1 ++ b2), 5, 5).collect().map(_.toSeq).toSeq
    assert(directP.nonEmpty && storedP == directP)
  }

  test("real data: one data-sized exchange; window runs on the bounded count frame") {
    val df = Anomaly.eventVolume(spark, sfDir)
    val rows = df.collect()
    assert(rows.nonEmpty && rows.forall(_.getAs[Long]("n_events") > 0))
    // final plan only — AQE's toString repeats the initial plan below
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    // the scan's only shuffle is the partial-agg count; everything
    // after operates on the (types × days) frame
    val exchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges <= 2, s"count shuffle + window shuffle at most, got $exchanges:\n$plan")
  }
}
