package graft

import org.apache.spark.sql.functions._
import graft.operators.Funnel

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def depths(rows: Seq[(Long, String, Long)], steps: Seq[String],
                     windowSec: Long): Map[Long, Int] = {
    val df = rows.map { case (u, t, ts) => (u, t, new java.sql.Timestamp(ts * 1000L)) }
      .toDF("user_id", "event_type", "ts")
    Funnel.windowDepth(df, steps, windowSec).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Int]("depth")).toMap
  }

  test("ordered daily funnel matches the chained-min-timestamp relational form") {
    val got = Funnel.orderedDaily(spark, sfDir).collect()
      .map(r => r.getAs[Long]("d") -> ((r.getAs[Long]("n_step1"),
        r.getAs[Long]("n_step2"), r.getAs[Long]("n_step3")))).toMap
    // the oracle's shape, computed in Spark: one min-ts join per step
    val e = Tables.events(spark, sfDir)
      .filter(col("event_type").isin("view", "click", "purchase"))
      .withColumn("d", unix_timestamp(date_trunc("day", col("ts"))))
    val v = e.filter(col("event_type") === "view")
      .groupBy("d", "user_id").agg(min("ts").as("vt"))
    val c = e.join(v, Seq("d", "user_id"))
      .filter(col("event_type") === "click" && col("ts") >= col("vt"))
      .groupBy("d", "user_id").agg(min("ts").as("ct"))
    val p = e.join(c, Seq("d", "user_id"))
      .filter(col("event_type") === "purchase" && col("ts") >= col("ct"))
      .groupBy("d", "user_id").agg(min("ts").as("pt"))
    val exact = v.join(c, Seq("d", "user_id"), "left").join(p, Seq("d", "user_id"), "left")
      .groupBy("d").agg(count(lit(1)).as("n1"), count(col("ct")).as("n2"),
        count(col("pt")).as("n3"))
      .collect().map(r => r.getAs[Long]("d") -> ((r.getAs[Long]("n1"),
        r.getAs[Long]("n2"), r.getAs[Long]("n3")))).toMap
    assert(got == exact, "greedy fold must equal the join-per-step form")
    assert(got.values.forall { case (a, b, c2) => a >= b && b >= c2 })
    assert(got.values.map(_._1).sum > 0, "fixture must exercise the funnel")
  }

  test("ordered funnel is sequence-sensitive where the set-membership funnel is not") {
    // u1: full chain in order; u2: purchase BEFORE the click — depth
    // stops at click; u3: click before any view — depth is view only
    val day = 86400L * 20000
    val ev = Seq(
      (1L, "view", day + 10), (1L, "click", day + 20), (1L, "purchase", day + 30),
      (2L, "view", day + 10), (2L, "purchase", day + 20), (2L, "click", day + 30),
      (3L, "click", day + 10), (3L, "view", day + 20))
      .map { case (u, t, ts) => (u, t, new java.sql.Timestamp(ts * 1000L)) }
      .toDF("user_id", "event_type", "ts")
    val d = Funnel.windowDepth(ev, Seq("view", "click", "purchase"), windowSec = 86400L)
      .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[Int]("depth")).toMap
    assert(d == Map(1L -> 3, 2L -> 2, 3L -> 1))
  }

  test("windowed funnel re-anchors to a later step-1 event when the window runs out") {
    val steps = Seq("view", "click", "purchase")
    // view@0 can't reach click@60 inside 20 s, but view@50 can
    assert(depths(Seq((1L, "view", 0L), (1L, "view", 50L), (1L, "click", 60L)),
      steps, 20L) == Map(1L -> 2))
    // without the later view the chain dies at depth 1
    assert(depths(Seq((2L, "view", 0L), (2L, "click", 60L)), steps, 20L) == Map(2L -> 1))
    // window measures from the chain's FIRST step: click@15 fits, but
    // purchase@25 is 25 s after the anchor — depth 2, not 3
    assert(depths(Seq((3L, "view", 0L), (3L, "click", 15L), (3L, "purchase", 25L)),
      steps, 20L) == Map(3L -> 2))
    // boundary is inclusive: purchase exactly window seconds after
    assert(depths(Seq((4L, "view", 0L), (4L, "click", 10L), (4L, "purchase", 20L)),
      steps, 20L) == Map(4L -> 3))
    // re-anchor must NOT resurrect a dead prefix: the second view has
    // no click after it, so depth via the old anchor stays the answer
    assert(depths(Seq((5L, "view", 0L), (5L, "click", 10L), (5L, "view", 100L),
      (5L, "purchase", 105L)), steps, 20L) == Map(5L -> 2))
  }

  test("conversion lag sums first-to-last step gaps over exactly the chained-min converters") {
    val got = Funnel.lagDaily(spark, sfDir).collect()
      .map(r => r.getAs[Long]("d") -> ((r.getAs[Long]("n_conv"), r.getAs[Long]("sum_lag_us"))))
      .toMap
    val e = Tables.events(spark, sfDir)
      .filter(col("event_type").isin("view", "click", "purchase"))
      .withColumn("d", unix_timestamp(date_trunc("day", col("ts"))))
      .withColumn("tu", unix_micros(col("ts").cast("timestamp")))
    val v = e.filter(col("event_type") === "view")
      .groupBy("d", "user_id").agg(min("tu").as("vt"))
    val c = e.join(v, Seq("d", "user_id"))
      .filter(col("event_type") === "click" && col("tu") >= col("vt"))
      .groupBy("d", "user_id").agg(min("tu").as("ct"), first("vt").as("vt"))
    val p = e.join(c, Seq("d", "user_id"))
      .filter(col("event_type") === "purchase" && col("tu") >= col("ct"))
      .groupBy("d", "user_id").agg(min("tu").as("pt"), first("vt").as("vt2"))
    val exact = v.join(p, Seq("d", "user_id"), "left")
      .groupBy("d").agg(count(col("pt")).as("n"),
        coalesce(sum(col("pt") - col("vt2")), lit(0L)).as("lag"))
      .collect().map(r => r.getAs[Long]("d") -> ((r.getAs[Long]("n"), r.getAs[Long]("lag"))))
      .toMap
    assert(got == exact, "matched-timestamp endpoints must equal the chained step minima")
    assert(got.values.map(_._1).sum > 0, "fixture must contain full conversions")
    assert(got.values.forall { case (n, lag) => (n == 0) == (lag == 0L) && lag >= 0L })
  }

  test("ordered funnel shuffles the event set once, with no join") {
    val plan = Funnel.orderedDaily(spark, sfDir).queryExecution.executedPlan.toString
    assert(!plan.contains("Join"),
      s"the greedy fold replaces the oracle's join-per-step form — no join expected:\n$plan")
    // two exchanges total: events → (d, user) fold, then the bounded
    // per-(d, user) depth frame → per-day counts; adding funnel steps
    // must not add shuffles
    val shuffles = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(shuffles <= 2, s"expected at most 2 hash exchanges, got $shuffles:\n$plan")
  }

  test("streaming funnel chains across micro-batches and emits final depths exactly once at the watermark") {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingFunnel
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(Long, String, Timestamp)]
    val q = StreamingFunnel.depths(ms.toDF().toDF("user_id", "event_type", "ts"),
      "ts", "10 minutes", windowSec = 60L)
      .writeStream.format("memory").queryName("sfunnel").outputMode("append").start()
    def emitted = spark.sql("SELECT user_id, d, depth FROM sfunnel").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    try {
      ms.addData(
        (1L, "view", Timestamp.valueOf("2024-01-01 00:00:10")),
        (2L, "view", Timestamp.valueOf("2024-01-01 00:00:10")),
        (2L, "click", Timestamp.valueOf("2024-01-01 00:00:20")),
        (3L, "view", Timestamp.valueOf("2024-01-01 00:00:00")))
      q.processAllAvailable()
      ms.addData(
        // u1 deepens ACROSS batches; u2 completes; u3's click is
        // outside the 60 s window of its only anchor
        (1L, "click", Timestamp.valueOf("2024-01-01 00:00:30")),
        (2L, "purchase", Timestamp.valueOf("2024-01-01 00:00:40")),
        (3L, "click", Timestamp.valueOf("2024-01-01 00:02:00")))
      q.processAllAvailable()
      assert(emitted.isEmpty, "no emission before the watermark passes the day end")
      // next-day sentinel pushes the watermark past day 0's end
      ms.addData((99L, "view", Timestamp.valueOf("2024-01-02 01:00:00")))
      q.processAllAvailable()
      val day0 = java.time.LocalDate.of(2024, 1, 1)
        .atStartOfDay(java.time.ZoneOffset.UTC).toEpochSecond
      assert(emitted == Map(1L -> ((day0, 2)), 2L -> ((day0, 3)), 3L -> ((day0, 1))),
        s"final per-user-day depths, got $emitted")
      // parity with the batch twin over the same day-0 events
      val batch = Seq(
        (1L, "view", "2024-01-01 00:00:10"), (1L, "click", "2024-01-01 00:00:30"),
        (2L, "view", "2024-01-01 00:00:10"), (2L, "click", "2024-01-01 00:00:20"),
        (2L, "purchase", "2024-01-01 00:00:40"),
        (3L, "view", "2024-01-01 00:00:00"), (3L, "click", "2024-01-01 00:02:00"))
        .map { case (u, t, s) => (u, t, Timestamp.valueOf(s)) }
        .toDF("user_id", "event_type", "ts")
      val twin = Funnel.windowDepth(batch, Seq("view", "click", "purchase"), windowSec = 60L)
        .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[Int]("depth")).toMap
      assert(emitted.view.filterKeys(_ != 99L).map { case (u, (_, dep)) => u -> dep }.toMap
        == twin, "in-order stream must reproduce the batch fold")
    } finally q.stop()
  }

  test("graft_window_funnel SQL aggregate reproduces the DataFrame fold") {
    val steps = Seq("view", "click", "purchase")
    val ev = Tables.events(spark, sfDir)
      .filter(col("event_type").isin(steps: _*))
      .select(unix_timestamp(date_trunc("day", col("ts"))).as("d"),
        col("user_id"), unix_micros(col("ts").cast("timestamp")).as("t"),
        Funnel.stepIndex(steps).as("si"))
    ev.createOrReplaceTempView("funnel_ev")
    val winUs = 600L * 1000000L
    val sql = spark.sql(
      s"""SELECT d, user_id, graft_window_funnel(t, si, ${winUs}L, 3) AS depth
         |FROM funnel_ev GROUP BY d, user_id""".stripMargin)
    val viaSql = sql.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    val viaDf = Funnel.windowDepth(
      Tables.events(spark, sfDir).withColumn("d", unix_timestamp(date_trunc("day", col("ts")))),
      steps, windowSec = 600L, groupCols = Seq("d")).collect()
      .map(r => (r.getAs[Long]("d"), r.getAs[Long]("user_id")) -> r.getAs[Int]("depth")).toMap
    assert(viaSql.nonEmpty && viaSql == viaDf,
      "session SQL must get the exact batch windowFunnel semantics")
    assert(viaSql.values.exists(_ > 1), "fixture must exercise multi-step chains")
    // same plan family as the sketch aggregates: partial+final
    // ObjectHashAggregate, the buffer riding the exchange
    val plan = sql.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), s"expected ObjectHashAggregate:\n$plan")
  }

  test("lag quantiles return the exact rank-element below the GK exactness threshold") {
    val got = Funnel.lagQuantilesDaily(spark, sfDir).collect()
      .map(r => r.getAs[Long]("d") -> ((r.getAs[Long]("n_conv"), r.getAs[Double]("p50"),
        r.getAs[Double]("p90"), r.getAs[Double]("p99")))).toMap
    val lags = Funnel.matchedLags(spark, sfDir).collect()
      .groupBy(_.getAs[Long]("d"))
      .view.mapValues(_.map(_.getAs[Long]("lag_us")).sorted).toMap
    assert(got.nonEmpty && got.keySet == lags.keySet,
      "every day with a conversion must emit quantiles")
    for ((d, (n, p50, p90, p99)) <- got) {
      val s = lags(d)
      assert(n == s.length, s"day $d conversion count")
      assert(s.length < (1.0 / (2 * graft.operators.Sketches.DefaultQuantileError)).toInt,
        "fixture must sit in the rank-exact regime for this test's claim")
      def pick(q: Double) = s(math.ceil(q * s.length).toInt - 1).toDouble
      assert((p50, p90, p99) == ((pick(0.5), pick(0.9), pick(0.99))),
        s"day $d must return the elements at ranks ceil(q*n)")
    }
  }

  test("stored per-day lag summaries reproduce the direct key and merge within the rank bound") {
    import graft.operators.Sketches
    Seq("lagq_sketches", "lagq_meta").foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    val qs = Seq(0.5, 0.9, 0.99)
    Sketches.writeQuantileTable(spark, "lagq", Funnel.matchedLags(spark, sfDir),
      Seq("d"), "lag_us")
    def cols(r: org.apache.spark.sql.Row) =
      r.getAs[Long]("d") -> ((r.getAs[Double]("p50"), r.getAs[Double]("p90"),
        r.getAs[Double]("p99")))
    val fromStore = Sketches.quantilesFromTable(spark, "lagq", qs).collect().map(cols).toMap
    val direct = Funnel.lagQuantilesDaily(spark, sfDir).collect().map(cols).toMap
    assert(fromStore == direct,
      "per-day reads from the stored summaries must equal the direct key")
    // any-range rollup: the merged summary keeps the ε rank bound
    // (checked against the exact sorted lags, not assumed)
    val all = Funnel.matchedLags(spark, sfDir).collect()
      .map(_.getAs[Long]("lag_us")).sorted
    val rolled = Sketches.rollupQuantileTable(spark, "lagq", Seq.empty, qs).collect()(0)
    for ((q, cname) <- qs.zip(Seq("p50", "p90", "p99"))) {
      val v = rolled.getAs[Double](cname)
      val target = q * all.length
      val budget = Sketches.DefaultQuantileError * all.length + 1.0
      val rLo = all.count(_ < v)
      val rHi = all.count(_ <= v)
      assert(target >= rLo - budget && target <= rHi + budget,
        s"merged $cname=$v violates the rank bound (target $target, [$rLo,$rHi])")
    }
    Seq("lagq_sketches", "lagq_meta").foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("session-grain lag: in-session chains only, seconds, sessions on their start day") {
    import graft.operators.Funnel
    val day = 86400L * 20000
    // u1 session A converts (v@10 → p@210, lag 200; the trailing view
    // is past the chain); past the gap, session B (c,p,v,c) reaches
    // depth 2 only — the DAY grain would have counted u1 once anyway,
    // but a second converting session same-day counts TWICE here;
    // u2 straddles midnight (v@86390 → p@86425, lag 35, start day d);
    // u4's purchase-before-view session never completes the chain
    val rows = Seq(
      (1L, 1L, "view", day + 10), (1L, 2L, "click", day + 110),
      (1L, 3L, "purchase", day + 210), (1L, 4L, "view", day + 310),
      (1L, 5L, "click", day + 4000), (1L, 6L, "purchase", day + 4100),
      (1L, 7L, "view", day + 4200), (1L, 8L, "click", day + 4300),
      (2L, 9L, "view", day + 86390), (2L, 10L, "click", day + 86420),
      (2L, 11L, "purchase", day + 86425),
      (4L, 12L, "purchase", day + 50), (4L, 13L, "view", day + 60),
      (4L, 14L, "click", day + 70))
    val tmp = java.nio.file.Files.createTempDirectory("slag").toString
    rows.map { case (u, e, t, s) => (u, e, t, new java.sql.Timestamp(s * 1000L)) }
      .toDF("user_id", "event_id", "event_type", "ts")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = Funnel.lagSessionDaily(spark, tmp).collect()
      .map(r => (r.getAs[Long]("d"), r.getAs[Long]("n_conv"), r.getAs[Long]("sum_lag_s")))
    assert(got.toSeq == Seq((day, 2L, 235L)), s"got ${got.toSeq}")
  }

  test("a day with step events but no step-1 entrant emits no row (oracle row-set parity)") {
    // d2 has clicks and purchases but not one view: the chained-min
    // relational form (the oracle's FROM clause) has no row for d2,
    // so neither may the fold — on corpora with view-free days the
    // divergence would be a hash mismatch, not a wrong count
    val d1 = 86400L * 21000
    val d2 = d1 + 86400L
    val ev = Seq(
      (1L, "view", d1 + 10), (1L, "click", d1 + 20), (1L, "purchase", d1 + 30),
      (2L, "click", d2 + 10), (2L, "purchase", d2 + 20))
      .map { case (u, t, ts) => (u, t, new java.sql.Timestamp(ts * 1000L)) }
      .toDF("user_id", "event_type", "ts")
    val tmp = java.nio.file.Files.createTempDirectory("funnel_noview").toString
    ev.write.mode("overwrite").parquet(s"$tmp/events.parquet")
    assert(Funnel.orderedDaily(spark, tmp).collect().map(_.getAs[Long]("d")).toSeq
      == Seq(d1), "orderedDaily must skip the view-free day")
    assert(Funnel.lagDaily(spark, tmp).collect().map(_.getAs[Long]("d")).toSeq
      == Seq(d1), "lagDaily must skip the view-free day")
    assert(Funnel.windowDaily(spark, tmp, windowSec = 86400L).collect()
      .map(_.getAs[Long]("d")).toSeq == Seq(d1),
      "windowDaily shares the row-set convention")
  }

  test("day-wide window degenerates to the ordered daily funnel") {
    val win = Funnel.windowDaily(spark, sfDir, windowSec = 86400L).collect()
      .map(r => (r.getAs[Long]("d"), r.getAs[Long]("n_step1"),
        r.getAs[Long]("n_step2"), r.getAs[Long]("n_step3"))).toSet
    val ord = Funnel.orderedDaily(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("d"), r.getAs[Long]("n_step1"),
        r.getAs[Long]("n_step2"), r.getAs[Long]("n_step3"))).toSet
    assert(win == ord, "a window spanning the whole day cannot constrain a within-day chain")
  }
}
