package graft

import org.apache.spark.sql.functions._
import graft.operators.Attribution

class AttributionSpec extends SparkSpec {
  import spark.implicits._

  test("credit models are exact on a hand-computed fixture") {
    // day boundaries at multiples of 86400 s; lookback 1 day (86400 s).
    // u1 purchase@d2+100s: clicks at d1+80000s (in window, day d1) and
    //   d2+50s (in window, day d2) → linear 500000 each, first→d1,
    //   last→d2.
    // u2 purchase@d2: single click exactly AT the purchase ts (included)
    //   → all three models 1000000 on d2.
    // u3 purchase@d2: click exactly lookback before (excluded — open
    //   lower bound) → no credit anywhere.
    // u4 click with no purchase → no credit.
    val d1 = 86400L * 20000
    val d2 = d1 + 86400L
    val rows = Seq(
      (1L, "purchase", d2 + 100), (1L, "click", d1 + 80000), (1L, "click", d2 + 50),
      (2L, "purchase", d2), (2L, "click", d2),
      (3L, "purchase", d2 + 10), (3L, "click", d1 + 10),
      (4L, "click", d2 + 5))
      .map { case (u, t, s) => (u, t, new java.sql.Timestamp(s * 1000L)) }
      .toDF("user_id", "event_type", "ts")
    val tmp = java.nio.file.Files.createTempDirectory("attr").toString
    rows.write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = Attribution.creditDaily(spark, tmp, lookbackSec = 86400L)
      .collect()
      .map(r => (r.getAs[Long]("d"), r.getAs[String]("model")) ->
        ((r.getAs[Long]("credit_millionths"), r.getAs[Long]("n_touches")))).toMap
    // 1-day lookback → maxLagDays 0 → every decay weight is 1, so
    // decay and position (n ≤ 2 here) both mirror linear's splits
    assert(got == Map(
      (d1, "first") -> ((1000000L, 1L)),
      (d1, "linear") -> ((500000L, 1L)),
      (d1, "decay") -> ((500000L, 1L)),
      (d1, "position") -> ((500000L, 1L)),
      (d2, "first") -> ((1000000L, 1L)),
      (d2, "last") -> ((2000000L, 2L)),
      (d2, "linear") -> ((1500000L, 2L)),
      (d2, "decay") -> ((1500000L, 2L)),
      (d2, "position") -> ((1500000L, 2L))))
  }

  test("decay halves per whole day of lag; position splits 40/20/40") {
    // 7-day lookback → weights 2^(6 − lag_days). Three touches for
    // one conversion at lags 0 d (w=64), 1 d (w=32), 6 d (w=1):
    // credits floor(1e6·w/97). Position n=3: ends 400000, middle
    // 200000. Every touch lands on a distinct day, so the daily
    // rollup exposes each touch's credit individually.
    val d0 = 86400L * 20000
    val conv = d0 + 7 * 86400L + 1000L
    val t1 = conv - 50L            // lag_days 0 → last touch
    val t2 = conv - 90000L         // lag_days 1 → middle
    val t3 = conv - (6 * 86400L + 100L) // lag_days 6 → first touch
    val rows = Seq((9L, "purchase", conv), (9L, "click", t1),
      (9L, "click", t2), (9L, "click", t3))
      .map { case (u, t, s) => (u, t, new java.sql.Timestamp(s * 1000L)) }
      .toDF("user_id", "event_type", "ts")
    val tmp = java.nio.file.Files.createTempDirectory("attr_decay").toString
    rows.write.mode("overwrite").parquet(s"$tmp/events.parquet")
    def day(t: Long) = t / 86400L * 86400L
    val got = Attribution.creditDaily(spark, tmp).collect()
      .map(r => (r.getAs[Long]("d"), r.getAs[String]("model")) ->
        r.getAs[Long]("credit_millionths")).toMap
    val sumW = 64L + 32L + 1L
    assert(got == Map(
      (day(t3), "first") -> 1000000L,
      (day(t1), "last") -> 1000000L,
      (day(t1), "linear") -> 333333L, (day(t2), "linear") -> 333333L,
      (day(t3), "linear") -> 333333L,
      (day(t1), "decay") -> 64000000L / sumW,
      (day(t2), "decay") -> 32000000L / sumW,
      (day(t3), "decay") -> 1000000L / sumW,
      (day(t1), "position") -> 400000L,
      (day(t2), "position") -> 200000L,
      (day(t3), "position") -> 400000L), s"got $got")
  }

  test("banded pair set equals the naive window-predicate join on real data") {
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts").cast("timestamp")).as("t"))
    val w = 604800L * 1000000L
    val p = ev.filter(col("event_type") === "purchase").select(col("user_id"), col("t").as("pt"))
    val c = ev.filter(col("event_type") === "click").select(col("user_id"), col("t").as("ct"))
    val naive = p.join(c, "user_id")
      .filter(col("ct") <= col("pt") && col("ct") > col("pt") - w)
      .count()
    // the operator's pair volume = linear-model touch rows
    val linear = Attribution.creditDaily(spark, sfDir)
      .filter(col("model") === "linear")
      .agg(sum("n_touches")).as[Long].head()
    assert(naive > 0, "fixture must produce in-window pairs")
    assert(linear == naive, "banded equi-join must meet every in-window pair exactly once")
  }

  test("per-model invariants: first/last credit = conversions, linear floors") {
    val conv = Tables.events(spark, sfDir).filter(col("event_type") === "purchase").count()
    val byModel = Attribution.creditDaily(spark, sfDir)
      .groupBy("model")
      .agg(sum("credit_millionths").as("cr"), sum("n_touches").as("nt"))
      .collect().map(r => r.getAs[String]("model") ->
        ((r.getAs[Long]("cr"), r.getAs[Long]("nt")))).toMap
    val (firstCr, firstN) = byModel("first")
    val (lastCr, lastN) = byModel("last")
    val (linCr, linN) = byModel("linear")
    val (decCr, decN) = byModel("decay")
    val (posCr, posN) = byModel("position")
    assert(firstN == lastN, "first and last see the same attributed conversions")
    assert(firstCr == firstN * 1000000L && lastCr == lastN * 1000000L)
    assert(firstN <= conv, "attributed conversions cannot exceed conversions")
    // every splitting model floors: per-conversion credit ∈ (1e6 - n, 1e6]
    assert(decN == linN && posN == linN,
      "the splitting models credit the same touch rows")
    for ((cr, n) <- Seq((linCr, linN), (decCr, decN), (posCr, posN)))
      assert(cr <= firstN * 1000000L && cr > firstN * 1000000L - n,
        s"split credit $cr outside the floor envelope for $n touches")
  }

  test("streaming twin: watermark-final credits match the batch models exactly once") {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingAttribution
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(Long, String, Timestamp)]
    val q = StreamingAttribution.credits(ms.toDF().toDF("user_id", "event_type", "ts"),
      "ts", "10 minutes", lookbackSec = 60L)
      .writeStream.format("memory").queryName("sattr").outputMode("append").start()
    def emitted = spark.sql("SELECT user_id, model, credit FROM sattr").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .groupBy(x => (x._1, x._2)).view.mapValues(_.map(_._3).sum).toMap
    try {
      ms.addData(
        (1L, "click", Timestamp.valueOf("2024-01-01 00:00:10")),
        (2L, "click", Timestamp.valueOf("2024-01-01 00:00:00")))
      q.processAllAvailable()
      ms.addData(
        // u1 converts with BOTH touches in window (the first arrived a
        // batch earlier); u2's only touch is outside the 60 s lookback
        (1L, "click", Timestamp.valueOf("2024-01-01 00:00:30")),
        (1L, "purchase", Timestamp.valueOf("2024-01-01 00:00:40")),
        (2L, "purchase", Timestamp.valueOf("2024-01-01 00:01:30")))
      q.processAllAvailable()
      assert(emitted.isEmpty, "no emission before the watermark passes the conversion")
      ms.addData((99L, "click", Timestamp.valueOf("2024-01-01 01:00:00")))
      q.processAllAvailable()
      // 60 s lookback → maxLagDays 0 → decay weights all 1; n=2 →
      // position is 50/50 — both models split like linear here
      val want = Map((1L, "linear") -> 1000000L, (1L, "first") -> 1000000L,
        (1L, "last") -> 1000000L, (1L, "decay") -> 1000000L,
        (1L, "position") -> 1000000L)
      assert(emitted == want, s"u1 credited once, u2 unattributed; got $emitted")
      // exactly once: pushing the watermark further re-emits nothing,
      // and a beyond-horizon straggler touch cannot reopen the credit
      ms.addData((1L, "click", Timestamp.valueOf("2024-01-01 00:00:20")),
        (99L, "click", Timestamp.valueOf("2024-01-01 02:00:00")))
      q.processAllAvailable()
      assert(emitted == want, "settled conversions never re-emit")
    } finally q.stop()
  }

  test("streaming twin merges same-instant duplicate conversions like the batch window") {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingAttribution
    implicit val ctx = spark.sqlContext
    // two purchases at the SAME microsecond share one batch window
    // partition: 2 touches × 2 conversion copies → n = 4 rows, ONE
    // first/last row, linear/decay/position over the 4-row multiset —
    // per-copy emission would have doubled first/last credit
    val fixture = Seq(
      (7L, "click", Timestamp.valueOf("2024-01-01 00:00:05")),
      (7L, "click", Timestamp.valueOf("2024-01-01 00:00:15")),
      (7L, "purchase", Timestamp.valueOf("2024-01-01 00:00:20")),
      (7L, "purchase", Timestamp.valueOf("2024-01-01 00:00:20")))
    val ms = MemoryStream[(Long, String, Timestamp)]
    val q = StreamingAttribution.credits(ms.toDF().toDF("user_id", "event_type", "ts"),
      "ts", "10 minutes", lookbackSec = 60L)
      .writeStream.format("memory").queryName("sattr_dup").outputMode("append").start()
    try {
      ms.addData(fixture: _*)
      q.processAllAvailable()
      ms.addData((99L, "click", Timestamp.valueOf("2024-01-01 01:00:00")))
      q.processAllAvailable()
      val streamed = spark.sql("SELECT d, model, credit FROM sattr_dup")
        .filter(col("d") > 0).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .groupBy(x => (x._1, x._2))
        .view.mapValues(cs => (cs.map(_._3).sum, cs.length.toLong)).toMap
      val tmp = java.nio.file.Files.createTempDirectory("attr_dup").toString
      fixture.toDF("user_id", "event_type", "ts")
        .write.mode("overwrite").parquet(s"$tmp/events.parquet")
      val batch = Attribution.creditDaily(spark, tmp, lookbackSec = 60L).collect()
        .map(r => (r.getAs[Long]("d"), r.getAs[String]("model")) ->
          ((r.getAs[Long]("credit_millionths"), r.getAs[Long]("n_touches")))).toMap
      assert(streamed == batch,
        s"duplicate-conversion settlement must match the batch window: $streamed vs $batch")
      assert(batch.values.map(_._1).sum == 5000000L,
        "exactly one conversion's credit per model despite the duplicate")
    } finally q.stop()
  }

  test("position model survives touch_t ties: duplicated conversion over one touch") {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingAttribution
    implicit val ctx = spark.sqlContext
    // two same-instant purchases × ONE click → one (user, conv_t)
    // window partition holding n = 2 rows TIED on touch_t. Independent
    // asc/desc row_numbers would hand both endpoint roles to the same
    // row and push the other onto 200000 div (n−2) = div-by-zero under
    // ANSI; the positional rule (rn 1 / rn n over one ordering) gives
    // 500000 each and conserves the single conversion's credit.
    val fixture = Seq(
      (8L, "click", Timestamp.valueOf("2024-01-01 00:00:05")),
      (8L, "purchase", Timestamp.valueOf("2024-01-01 00:00:20")),
      (8L, "purchase", Timestamp.valueOf("2024-01-01 00:00:20")))
    val tmp = java.nio.file.Files.createTempDirectory("attr_tie").toString
    fixture.toDF("user_id", "event_type", "ts")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val batch = Attribution.creditDaily(spark, tmp, lookbackSec = 60L).collect()
      .map(r => (r.getAs[Long]("d"), r.getAs[String]("model")) ->
        ((r.getAs[Long]("credit_millionths"), r.getAs[Long]("n_touches")))).toMap
    val d = Timestamp.valueOf("2024-01-01 00:00:00").getTime / 1000L / 86400L * 86400L
    assert(batch == Map(
      (d, "first") -> ((1000000L, 1L)), (d, "last") -> ((1000000L, 1L)),
      (d, "linear") -> ((1000000L, 2L)), (d, "decay") -> ((1000000L, 2L)),
      (d, "position") -> ((1000000L, 2L))), s"got $batch")
    // streaming twin settles the same multiset identically
    val ms = MemoryStream[(Long, String, Timestamp)]
    val q = StreamingAttribution.credits(ms.toDF().toDF("user_id", "event_type", "ts"),
      "ts", "10 minutes", lookbackSec = 60L)
      .writeStream.format("memory").queryName("sattr_tie").outputMode("append").start()
    try {
      ms.addData(fixture: _*)
      q.processAllAvailable()
      ms.addData((99L, "click", Timestamp.valueOf("2024-01-01 01:00:00")))
      q.processAllAvailable()
      val streamed = spark.sql("SELECT d, model, credit FROM sattr_tie")
        .filter(col("d") > 0).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .groupBy(x => (x._1, x._2))
        .view.mapValues(cs => (cs.map(_._3).sum, cs.length.toLong)).toMap
      assert(streamed == batch, s"stream $streamed must equal batch $batch")
    } finally q.stop()
  }

  test("decay half-life parameterizes as an exact shift: H = 7 batch/stream parity") {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingAttribution
    implicit val ctx = spark.sqlContext
    // 30-day lookback → maxLagDays 29; H = 7 → exponent (29 − lag) div 7:
    // lags 0, 8, 29 d → exponents 4, 3, 0 → weights 16, 8, 1 (Σ 25).
    val base = 86400L * 20000
    val conv = base + 30 * 86400L
    val t1 = conv - 50L                    // lag 0 d  → w 16, last
    val t2 = conv - (8 * 86400L + 100L)    // lag 8 d  → w 8, middle
    val t3 = conv - (29 * 86400L + 100L)   // lag 29 d → w 1, first
    val fixture = Seq((5L, "purchase", conv), (5L, "click", t1),
      (5L, "click", t2), (5L, "click", t3))
      .map { case (u, ty, s) => (u, ty, new Timestamp(s * 1000L)) }
    val tmp = java.nio.file.Files.createTempDirectory("attr_hl").toString
    fixture.toDF("user_id", "event_type", "ts")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    def day(t: Long) = t / 86400L * 86400L
    val got = Attribution.creditDaily(spark, tmp,
      lookbackSec = 30L * 86400L, halfLifeDays = 7).collect()
      .filter(_.getAs[String]("model") == "decay")
      .map(r => r.getAs[Long]("d") -> r.getAs[Long]("credit_millionths")).toMap
    assert(got == Map(
      day(t1) -> 16000000L / 25L, day(t2) -> 8000000L / 25L,
      day(t3) -> 1000000L / 25L), s"got $got")
    val ms = MemoryStream[(Long, String, Timestamp)]
    val q = StreamingAttribution.credits(ms.toDF().toDF("user_id", "event_type", "ts"),
      "ts", "10 minutes", lookbackSec = 30L * 86400L, halfLifeDays = 7)
      .writeStream.format("memory").queryName("sattr_hl").outputMode("append").start()
    try {
      ms.addData(fixture: _*)
      q.processAllAvailable()
      ms.addData((99L, "click", new Timestamp((conv + 40 * 86400L) * 1000L)))
      q.processAllAvailable()
      val streamed = spark.sql("SELECT d, credit FROM sattr_hl WHERE model = 'decay'")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(streamed == got, s"stream $streamed must equal batch $got")
    } finally q.stop()
    // the exact-arithmetic guard rejects overflowing exponents
    intercept[IllegalArgumentException] {
      Attribution.creditDaily(spark, tmp, lookbackSec = 45L * 86400L, halfLifeDays = 1)
    }
  }

  test("streaming credits → stored ledger: the foreachBatch pipeline equals batch creditDaily") {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingAttribution
    implicit val ctx = spark.sqlContext
    val fixture = Seq(
      (1L, "click", Timestamp.valueOf("2024-01-01 00:00:10")),
      (1L, "click", Timestamp.valueOf("2024-01-01 00:00:30")),
      (1L, "purchase", Timestamp.valueOf("2024-01-01 00:00:40")),
      (2L, "click", Timestamp.valueOf("2024-01-01 00:00:05")),
      (2L, "purchase", Timestamp.valueOf("2024-01-01 00:00:20")))
    // seed an empty ledger, then route the watermark-final streaming
    // credits through the documented foreachBatch body
    val empty = spark.emptyDataFrame
      .select(lit(0L).as("d"), lit("x").as("model"),
        lit(0L).as("credit_millionths"), lit(0L).as("n_touches")).limit(0)
    Attribution.writeCreditTable(spark, "cl_spec", empty, buckets = 2)
    val ms = MemoryStream[(Long, String, Timestamp)]
    val q = StreamingAttribution.credits(ms.toDF().toDF("user_id", "event_type", "ts"),
      "ts", "10 minutes", lookbackSec = 60L)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[StreamingAttribution.CreditOut],
                       id: Long) =>
        Attribution.appendToCreditTable(spark, "cl_spec",
          Attribution.rollupCredits(batch.toDF()), batchId = id)
      }
      .start()
    try {
      ms.addData(fixture: _*)
      q.processAllAvailable()
      ms.addData((99L, "click", Timestamp.valueOf("2024-01-01 02:00:00")))
      q.processAllAvailable()
      ms.addData((99L, "click", Timestamp.valueOf("2024-01-01 03:00:00")))
      q.processAllAvailable()
    } finally q.stop()
    val stored = Attribution.creditFromTable(spark, "cl_spec")
      .collect().map(_.toSeq).toSeq
    val tmp = java.nio.file.Files.createTempDirectory("attr_ledger").toString
    fixture.toDF("user_id", "event_type", "ts")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val batchLedger = Attribution.creditDaily(spark, tmp, lookbackSec = 60L)
      .collect().map(_.toSeq).toSeq
    assert(batchLedger.nonEmpty && stored == batchLedger,
      s"the streamed ledger must equal batch creditDaily: $stored vs $batchLedger")
    // an ad-hoc replay of an already-stamped batch id must no-op
    Attribution.appendToCreditTable(spark, "cl_spec",
      Attribution.rollupCredits(
        Seq((1L, 0L, 19723L * 86400L, "linear", 500000L))
          .toDF("user_id", "conv_t", "d", "model", "credit")), batchId = 0L)
    assert(Attribution.creditFromTable(spark, "cl_spec")
      .collect().map(_.toSeq).toSeq == batchLedger,
      "a replayed batch id must not double-count the ledger")
  }

  test("plan shape: equi-join pairing (no cartesian), one window shuffle") {
    val plan = Attribution.creditDaily(spark, sfDir).queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian"), "pairing must be the banded equi-join")
    assert(!plan.contains("BroadcastNestedLoop"), "pairing must be the banded equi-join")
    val windowExchanges = plan.linesIterator
      .count(l => l.contains("Exchange hashpartitioning") && l.contains("conv_t"))
    assert(windowExchanges == 1,
      s"count + both row_numbers must share ONE (user, conv) window shuffle, got $windowExchanges")
  }
}
