package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.{Funnel, PathAnalysis}
import graft.streaming.StreamingSessionPaths

class StreamingSessionPathsSpec extends SparkSpec {
  import spark.implicits._

  private val day = 86400L * 20000

  // u1: session A (view,click,purchase + trailing view) then past the
  // gap session B (click,purchase,view,click — greedy depth 2);
  // u2: one session straddling midnight (view,click) — reports on the
  // start day; u3: a single lone purchase (depth 0, no edges)
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

  private def runStream(batches: Seq[Seq[(Long, Long, String, Long)]],
                        queryName: String): Unit = {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(Long, Long, String, Timestamp)]
    val q = StreamingSessionPaths.sessions(
      ms.toDF().toDF("user_id", "event_id", "event_type", "ts"),
      "ts", "10 minutes", gapSeconds = 1800L)
      .writeStream.format("memory").queryName(queryName).outputMode("append").start()
    try {
      batches.foreach { b =>
        ms.addData(b.map { case (u, e, t, s) => (u, e, t, new Timestamp(s * 1000L)) }: _*)
        q.processAllAvailable()
      }
      // flush every open session: watermark far past everything
      ms.addData((99L, 900L, "view", new Timestamp((day + 10 * 86400L) * 1000L)))
      q.processAllAvailable()
      ms.addData((99L, 901L, "view", new Timestamp((day + 10 * 86400L + 1) * 1000L)))
      q.processAllAvailable()
    } finally q.stop()
  }

  test("replayed stream matches ALL THREE batch session operators") {
    // split mid-session: u1's session B crosses batches. u3's early
    // event rides batch 1 — batch 1's watermark (max − 10 min) would
    // drop it as late from batch 2 (the fixture-split rule every
    // streaming spec here follows)
    runStream(Seq(fixture.take(6) :+ fixture.last,
      fixture.slice(6, fixture.length - 1)), "ssp")
    val out = spark.sql("SELECT * FROM ssp WHERE user_id < 99")

    // 1. depth rollup ≡ Funnel.sessionDaily
    val gotFunnel = out
      .groupBy(col("d"))
      .agg(sum(when(col("depth") >= 1, 1L).otherwise(0L)).as("n_step1"),
        sum(when(col("depth") >= 2, 1L).otherwise(0L)).as("n_step2"),
        sum(when(col("depth") >= 3, 1L).otherwise(0L)).as("n_step3"))
      .filter(col("n_step1") > 0)
      .orderBy(col("d")).collect().map(_.toSeq).toSeq
    val wantFunnel = Funnel.sessionDaily(batchDf, 1800L, Seq("view", "click", "purchase"))
      .collect().map(_.toSeq).toSeq
    assert(gotFunnel == wantFunnel, s"funnel: $gotFunnel vs $wantFunnel")

    // 2. (d, path) histogram ≡ topkSession at unbounded k
    val gotPaths = out.groupBy(col("d"), col("path"))
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("d"), col("n_sessions").desc, col("path"))
      .collect().map(_.toSeq).toSeq
    val wantPaths = PathAnalysis.topkSession(batchDf, 1800L, Int.MaxValue, 5)
      .collect().map(_.toSeq).toSeq
    assert(gotPaths == wantPaths, s"paths: $gotPaths vs $wantPaths")

    // 3. exploded edges ≡ transitionsSession (u3's lone event emits none)
    val gotEdges = out.select(col("d"), explode(col("edges")).as("e"))
      .groupBy(col("d"), col("e.src_step").as("src_step"), col("e.dst_step").as("dst_step"))
      .agg(count(lit(1)).as("n_trans"))
      .orderBy(col("d"), col("src_step"), col("dst_step"))
      .collect().map(_.toSeq).toSeq
    val wantEdges = PathAnalysis.transitionsSession(batchDf, 1800L)
      .collect().map(_.toSeq).toSeq
    assert(gotEdges == wantEdges, s"edges: $gotEdges vs $wantEdges")

    // u3's depth-0 purchase-only session is present with no edges
    val u3 = out.filter(col("user_id") === 3L).collect()
    assert(u3.length == 1 && u3.head.getAs[Int]("depth") == 0 &&
      u3.head.getAs[scala.collection.Seq[Any]]("edges").isEmpty)
  }

  test("intra-batch gap closes immediately; open sessions wait for the watermark") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(Long, Long, String, Timestamp)]
    val q = StreamingSessionPaths.sessions(
      ms.toDF().toDF("user_id", "event_id", "event_type", "ts"),
      "ts", "10 minutes", gapSeconds = 600L)
      .writeStream.format("memory").queryName("ssp_gap").outputMode("append").start()
    try {
      // one batch holding a complete session AND the opener of the next
      ms.addData(
        (7L, 1L, "view", new Timestamp((day + 10) * 1000L)),
        (7L, 2L, "click", new Timestamp((day + 70) * 1000L)),
        (7L, 3L, "view", new Timestamp((day + 5000) * 1000L)))
      q.processAllAvailable()
      val early = spark.sql("SELECT path FROM ssp_gap").collect().map(_.getString(0))
      assert(early.toSeq == Seq("view>click"),
        s"the gap-closed session emits in its own batch, the open one must not: ${early.toSeq}")
      ms.addData((99L, 9L, "view", new Timestamp((day + 86400L) * 1000L)))
      q.processAllAvailable()
      ms.addData((99L, 10L, "view", new Timestamp((day + 86401L) * 1000L)))
      q.processAllAvailable()
      val paths = spark.sql("SELECT user_id, path FROM ssp_gap WHERE user_id = 7")
        .collect().map(_.getString(1)).sorted
      assert(paths.toSeq == Seq("view", "view>click"),
        s"watermark passage closes the parked session exactly once: ${paths.toSeq}")
    } finally q.stop()
  }
}
