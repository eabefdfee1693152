package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.{Funnel, PathAnalysis, SessionLedger}
import graft.streaming.StreamingSessionPaths

class SessionLedgerSpec extends SparkSpec {
  import spark.implicits._

  private val day = 86400L * 20000
  private val fixture = Seq(
    (1L, 1L, "view", day + 10), (1L, 2L, "click", day + 110),
    (1L, 3L, "purchase", day + 210), (1L, 4L, "view", day + 310),
    (1L, 5L, "click", day + 4000), (1L, 6L, "purchase", day + 4100),
    (1L, 7L, "view", day + 4200), (1L, 8L, "click", day + 4300),
    (2L, 9L, "view", day + 86390), (2L, 10L, "click", day + 86420),
    (3L, 11L, "purchase", day + 500))

  private def batchDf = fixture
    .map { case (u, e, t, s) => (u, e, t, new Timestamp(s * 1000L)) }
    .toDF("user_id", "event_id", "event_type", "ts")

  test("batch sessionRows carries the exact conventions of all three session operators") {
    val rows = SessionLedger.sessionRows(batchDf)
    assert(SessionLedger.rollupDepths(rows, 3)
      .filter(col("n_step1") > 0).orderBy(col("d"))
      .collect().map(_.toSeq).toSeq ==
      Funnel.sessionDaily(batchDf, 1800L, Seq("view", "click", "purchase"))
        .collect().map(_.toSeq).toSeq)
    val byDay = org.apache.spark.sql.expressions.Window
      .partitionBy(col("d")).orderBy(col("n_sessions").desc, col("path"))
    assert(SessionLedger.rollupPaths(rows)
      .withColumn("rk", row_number().over(byDay)).filter(col("rk") <= 5)
      .select(col("d"), col("path"), col("n_sessions"))
      .orderBy(col("d"), col("n_sessions").desc, col("path"))
      .collect().map(_.toSeq).toSeq ==
      PathAnalysis.topkSession(batchDf, 1800L, 5, 5).collect().map(_.toSeq).toSeq)
    assert(SessionLedger.rollupEdges(rows)
      .orderBy(col("d"), col("src_step"), col("dst_step"))
      .collect().map(_.toSeq).toSeq ==
      PathAnalysis.transitionsSession(batchDf, 1800L).collect().map(_.toSeq).toSeq)
  }

  test("streaming sessions feed the ledger via foreachBatch: readers ≡ direct, replay no-ops") {
    implicit val ctx = spark.sqlContext
    // a pure-streaming ledger starts from an empty session frame
    SessionLedger.writeTables(spark, "sl_spec",
      SessionLedger.sessionRows(batchDf.limit(0)), nSteps = 3, buckets = 2)
    val ms = MemoryStream[(Long, Long, String, Timestamp)]
    val q = StreamingSessionPaths.sessions(
      ms.toDF().toDF("user_id", "event_id", "event_type", "ts"),
      "ts", "10 minutes", gapSeconds = 1800L)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[StreamingSessionPaths.SessionPathOut],
                       id: Long) =>
        SessionLedger.appendBatch(spark, "sl_spec", batch.toDF(), batchId = id)
      }
      .start()
    try {
      // u3's early lone event rides batch 1 (watermark split rule)
      ms.addData((fixture.take(6) :+ fixture.last)
        .map { case (u, e, t, s) => (u, e, t, new Timestamp(s * 1000L)) }: _*)
      q.processAllAvailable()
      ms.addData(fixture.slice(6, fixture.length - 1)
        .map { case (u, e, t, s) => (u, e, t, new Timestamp(s * 1000L)) }: _*)
      q.processAllAvailable()
      ms.addData((99L, 900L, "view", new Timestamp((day + 10 * 86400L) * 1000L)))
      q.processAllAvailable()
      ms.addData((99L, 901L, "view", new Timestamp((day + 10 * 86400L + 1) * 1000L)))
      q.processAllAvailable()
    } finally q.stop()
    // the sentinel user's own session stays OPEN (nothing advances the
    // watermark past it), so compare on the fixture's days only
    val cutoff = day + 2 * 86400L
    val gotFunnel = SessionLedger.funnelDaily(spark, "sl_spec")
      .filter(col("d") < cutoff).collect().map(_.toSeq).toSeq
    val wantFunnel = Funnel.sessionDaily(batchDf, 1800L, Seq("view", "click", "purchase"))
      .collect().map(_.toSeq).toSeq
    assert(gotFunnel == wantFunnel, s"funnel $gotFunnel vs $wantFunnel")
    val gotPaths = SessionLedger.topkPaths(spark, "sl_spec")
      .filter(col("d") < cutoff).collect().map(_.toSeq).toSeq
    val wantPaths = PathAnalysis.topkSession(batchDf, 1800L, 5, 5)
      .collect().map(_.toSeq).toSeq
    assert(gotPaths == wantPaths, s"paths $gotPaths vs $wantPaths")
    val gotEdges = SessionLedger.transitions(spark, "sl_spec")
      .filter(col("d") < cutoff).collect().map(_.toSeq).toSeq
    val wantEdges = PathAnalysis.transitionsSession(batchDf, 1800L)
      .collect().map(_.toSeq).toSeq
    assert(gotEdges == wantEdges, s"edges $gotEdges vs $wantEdges")
    // an ad-hoc replay of an already-stamped batch no-ops all three tables
    SessionLedger.appendBatch(spark, "sl_spec",
      SessionLedger.sessionRows(batchDf), batchId = 0L)
    assert(SessionLedger.funnelDaily(spark, "sl_spec")
      .filter(col("d") < cutoff).collect().map(_.toSeq).toSeq == gotFunnel)
    assert(SessionLedger.transitions(spark, "sl_spec")
      .filter(col("d") < cutoff).collect().map(_.toSeq).toSeq == gotEdges)
  }

  test("a funnel-only ledger takes appends and replays without the other tables") {
    val empty = SessionLedger.sessionRows(batchDf.limit(0))
    SessionLedger.writeFunnelTable(spark, "sl_solo", empty, nSteps = 3, buckets = 2)
    assert(!spark.catalog.tableExists("sl_solo_paths_meta"))
    SessionLedger.appendBatch(spark, "sl_solo",
      SessionLedger.sessionRows(batchDf), batchId = 0L)
    val want = Funnel.sessionDaily(batchDf, 1800L, Seq("view", "click", "purchase"))
      .collect().map(_.toSeq).toSeq
    assert(SessionLedger.funnelDaily(spark, "sl_solo")
      .collect().map(_.toSeq).toSeq == want)
    // replay of the stamped batch no-ops
    SessionLedger.appendBatch(spark, "sl_solo",
      SessionLedger.sessionRows(batchDf), batchId = 0L)
    assert(SessionLedger.funnelDaily(spark, "sl_solo")
      .collect().map(_.toSeq).toSeq == want)
    val ex = intercept[IllegalArgumentException] {
      SessionLedger.appendBatch(spark, "sl_nothing", empty)
    }
    assert(ex.getMessage.contains("no ledger tables"))
  }
}
