package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** First-seen cohort analysis: users are grouped by the day of their
  * FIRST activity, and the matrix reports how many of each cohort are
  * active at each age (days since their cohort day) — the classic
  * triangle the growth dashboards draw. Complements
  * [[Sketches.retentionDaily]], which intersects per-day audiences at
  * fixed lags regardless of when a user first appeared.
  *
  * Scale shape: the per-(day, user) DISTINCT reduction is the only
  * pass over the raw events; the user-window min that assigns cohorts
  * shuffles the already-distinct activity frame (≤ days rows per
  * user), and because (d, user) rows are unique, (cohort, age, user)
  * rows are too — so the final count needs NO second distinct: it
  * partial-aggregates map-side and exchanges only (cohort, age)
  * partial counts. Two data-sized shuffles total, both of reduced
  * frames.
  */
object Cohort {

  /** Per (cohort_d, age_days): distinct active users. Output ordered
    * by (cohort_d, age_days); age 0 row = the cohort's size.
    */
  def matrixDaily(spark: SparkSession, dir: String): DataFrame = {
    val act = dayActivity(graft.Tables.events(spark, dir))
    val cohort = min(col("d")).over(Window.partitionBy(col("user_id")))
    act.withColumn("cohort_d", cohort)
      .groupBy(col("cohort_d"), expr("(d - cohort_d) div 86400").as("age_days"))
      .agg(count(lit(1)).as("n_active"))
      .orderBy(col("cohort_d"), col("age_days"))
  }

  /** The distinct per-(day, user) activity frame every cohort form
    * counts over — repeat events within a day collapse here.
    */
  private def dayActivity(events: DataFrame): DataFrame =
    events
      .select(unix_timestamp(date_trunc("day", col("ts"))).as("d"), col("user_id"))
      .distinct()

  // ---- stored cohort-matrix lifecycle ----------------------------------

  /** The [[matrixDaily]] triangle persisted in the theta-table
    * lifecycle: one audience sketch per (cohort_d, age_days) cell in
    * `<name>_sketches` (bucketed, generation-flipped — the
    * [[Sketches.writeThetaTable]] layout), plus a `<name>_firstseen`
    * companion (user_id → cohort_d, bucketed on user_id) so appends
    * can cohort-assign new activity without rescanning history. The
    * growth dashboard then answers at any grain from the BOUNDED
    * sketch table — cohorts × ages rows regardless of event volume —
    * with zero raw-history rescans, like the rest of the stored tier
    * ([[Sketches.retentionFromThetaTable]]'s posture).
    *
    * Append semantics: a user's cohort day is min-merged across
    * batches, so day-ordered (per-user non-decreasing) ingest
    * reproduces the batch twin exactly, and replaying a batch is a
    * no-op end to end (min is idempotent, theta union is
    * insertion-idempotent). An out-of-order EARLIER first appearance
    * lowers the user's cohort for rows absorbed AFTER it arrives, but
    * sketch cells already holding the user's activity under the old
    * cohort cannot give it back (sketches don't subtract) — the
    * reconciliation is [[rebuildMatrixTable]], and every such user is
    * counted into `<name>_drift` so [[cohortNeedsRebuild]] can fire
    * it (the [[Similarity.ivfNeedsRecluster]] posture).
    */
  def writeMatrixTable(spark: SparkSession, name: String, events: DataFrame,
                       nominalEntries: Int = Sketches.DefaultNominalEntries,
                       buckets: Int = 16): Unit = {
    val act = dayActivity(events)
    val first = act.groupBy(col("user_id")).agg(min(col("d")).as("cohort_d"))
    graft.sources.Sinks.replaceBucketed(spark, first, s"${name}_firstseen",
      Seq("user_id"), buckets)
    Sketches.writeThetaTable(spark, name, cohortFrame(spark, name, act),
      Seq("cohort_d", "age_days"), "user_id", nominalEntries, buckets)
    writeDrift(spark, name, 0L)
  }

  /** (cohort_d, age_days, user_id) rows for an activity frame, cohort
    * days resolved against the stored first-seen table.
    */
  private def cohortFrame(spark: SparkSession, name: String, act: DataFrame): DataFrame =
    act.join(spark.table(s"${name}_firstseen"), Seq("user_id"))
      .select(col("cohort_d"), expr("(d - cohort_d) div 86400").as("age_days"),
        col("user_id"))

  /** Fold one new batch of raw events in: min-merge the batch's
    * first appearances into `<name>_firstseen` (new users join the
    * matrix here), then union the batch's cohort-assigned activity
    * into the sketch cells. Two bounded rewrites; the batch is the
    * only data-sized input. Returns the number of users whose cohort
    * day this batch LOWERED — each is a cell the triangle can no
    * longer reconcile incrementally (their prior activity was
    * absorbed under the old cohort and sketches don't subtract); the
    * count accumulates in `<name>_drift`, read by [[driftReport]] /
    * [[cohortNeedsRebuild]]. Day-ordered ingest keeps it at 0 and
    * skips the drift write entirely.
    *
    * Crash posture: the drift increment commits BEFORE the firstseen
    * min-merge. A failure between the two replays to an OVERSTATED
    * counter (the not-yet-lowered stored_d recounts the same users —
    * at worst an unneeded defensive rebuild); the reverse order would
    * LOSE the signal permanently — on replay the stored cohort_d is
    * already lowered, nLowered recomputes as 0, and the stale sketch
    * cells persist silently past [[cohortNeedsRebuild]].
    */
  def appendToMatrixTable(spark: SparkSession, name: String, batch: DataFrame): Long = {
    spark.catalog.refreshTable(s"${name}_firstseen")
    val (_, _, _, buckets) = Sketches.thetaMeta(spark, name)
    val act = dayActivity(batch)
    val batchFirst = act.groupBy(col("user_id")).agg(min(col("d")).as("cohort_d")).persist()
    val nLowered = try {
      val n = batchFirst
        .join(spark.table(s"${name}_firstseen").withColumnRenamed("cohort_d", "stored_d"),
          Seq("user_id"))
        .filter(col("cohort_d") < col("stored_d")).count()
      // drift FIRST (see crash posture above): overstating on replay
      // is conservative, understating silently strands stale cells
      if (n > 0) writeDrift(spark, name, readDrift(spark, name) + n)
      graft.sources.Sinks.rewriteBucketed(spark, s"${name}_firstseen", Seq("user_id"), buckets,
        stored => stored.unionByName(batchFirst)
          .groupBy(col("user_id")).agg(min(col("cohort_d")).as("cohort_d")))
      n
    } finally batchFirst.unpersist()
    spark.catalog.refreshTable(s"${name}_firstseen")
    Sketches.appendToThetaTable(spark, name, cohortFrame(spark, name, act))
    nLowered
  }

  /** The triangle from the STORED sketches alone — [[matrixDaily]]'s
    * exact shape (and, below nominalEntries actives per cell, its
    * exact values: the theta estimate is the retained-hash count).
    */
  def matrixFromThetaTable(spark: SparkSession, name: String): DataFrame =
    Sketches.estimateThetaTable(spark, name)
      .select(col("cohort_d"), col("age_days"), col("n_distinct").as("n_active"))
      .orderBy(col("cohort_d"), col("age_days"))

  // ---- drift / rebuild lifecycle ----------------------------------------

  private def writeDrift(spark: SparkSession, name: String, n: Long): Unit = {
    import spark.implicits._
    Seq(n).toDF("n_lowered").write.mode("overwrite").saveAsTable(s"${name}_drift")
  }

  private def readDrift(spark: SparkSession, name: String): Long =
    if (!spark.catalog.tableExists(s"${name}_drift")) 0L
    else {
      spark.catalog.refreshTable(s"${name}_drift")
      spark.table(s"${name}_drift").collect()(0).getLong(0)
    }

  /** One row: matrix size vs accumulated out-of-order divergence —
    * `n_users` in the first-seen companion, `n_lowered` users whose
    * cohort day an append lowered after their activity was absorbed,
    * and the ratio. The cohort twin of [[Similarity.ivfDriftReport]]:
    * two bounded reads (the user-count scan and the 1-row drift
    * table), zero raw history touched.
    */
  def driftReport(spark: SparkSession, name: String): DataFrame = {
    import spark.implicits._
    spark.catalog.refreshTable(s"${name}_firstseen")
    val nUsers = spark.table(s"${name}_firstseen").count()
    val nLow = readDrift(spark, name)
    Seq((nUsers, nLow, if (nUsers == 0) 0.0 else nLow.toDouble / nUsers))
      .toDF("n_users", "n_lowered", "lowered_frac")
  }

  /** The documented rebuild trigger: fires once ANY user's cohort was
    * lowered post-absorption (default tolerance 0 — a single lowered
    * user leaves stale cells, since sketches don't subtract). Raise
    * `maxLowered` for dashboards that accept bounded staleness
    * between scheduled rebuilds.
    */
  def cohortNeedsRebuild(spark: SparkSession, name: String, maxLowered: Long = 0L): Boolean =
    readDrift(spark, name) > maxLowered

  /** The reconciliation: full rebuild from the caller's raw-history
    * frame under the stored geometry (nominalEntries/buckets from the
    * theta meta), resetting the drift counter. Deliberately a FULL
    * rebuild, not an incremental repair, for the
    * [[Similarity.reclusterIvfIndex]] reason: the rule fires on real
    * out-of-order history, and a partial fix-up cannot subtract the
    * misplaced users from their old cells.
    */
  def rebuildMatrixTable(spark: SparkSession, name: String, events: DataFrame): Unit = {
    val (nominalEntries, _, _, buckets) = Sketches.thetaMeta(spark, name)
    writeMatrixTable(spark, name, events, nominalEntries, buckets)
  }

  /** ONE maintenance step of the stored cohort matrix — append the
    * batch, evaluate the drift rule, rebuild from `history` when it
    * fires: the [[Similarity.maintainIvfIndex]] loop for the cohort
    * tier, previously left to the caller to hand-roll from the
    * Scaladocs. `history` is by-name: the full raw-history frame is
    * only constructed (and scanned) when a rebuild actually runs, so
    * the quiet-path cost stays the append plus the 1-row drift read.
    * Returns true iff a rebuild ran. Wired as a CLI mode in
    * [[graft.PipelineJob]] (`maintain-cohort`).
    */
  def maintainMatrixTable(spark: SparkSession, name: String, batch: DataFrame,
                          history: => DataFrame, maxLowered: Long = 0L): Boolean = {
    appendToMatrixTable(spark, name, batch)
    val fires = cohortNeedsRebuild(spark, name, maxLowered)
    if (fires) rebuildMatrixTable(spark, name, history)
    fires
  }
}
