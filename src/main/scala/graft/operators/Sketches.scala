package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ColumnBridge

import graft.functions.expressions.{FreqSketchAgg, FreqSketchMergeAgg, FreqSketchTopK,
  QuantileSketchAgg, QuantileSketchMergeAgg, QuantileSketchQuery,
  ThetaSketchAgg, ThetaUnionAgg, ThetaIntersect, ThetaAnotB, ThetaSummary}
import graft.sources.Sinks

/** Mergeable cardinality sketches — COUNT(DISTINCT) over an
  * ever-growing corpus without ever rescanning history.
  *
  * Exact distinct-count at 100 TB has an irreducible cost: every
  * value must reach the group's reducer once per query, so "distinct
  * users per day, and by the way also per week and per month and
  * all-time" re-shuffles the raw corpus once per granularity. The
  * DataSketches HLL sketch (Spark's `hll_sketch_agg` family —
  * codegen-free but ObjectHashAggregate with map-side partial merge)
  * replaces that with one pass EVER per ingested batch:
  *
  *   - the per-group aggregation state is one sketch of at most
  *     ~2^lgK bytes, so the shuffle carries sketches, not values;
  *   - sketches MERGE losslessly (`hll_union_agg`): stored per-(key,
  *     day) sketches answer any day-range / coarser-granularity
  *     distinct query by unioning a bounded sketch table — the raw
  *     events are never touched again;
  *   - re-inserting values already absorbed is a no-op, so
  *     re-appending a replayed batch leaves every stored estimate
  *     unchanged (idempotent ingest for free — spec-pinned).
  *
  * Error model (documented by DataSketches): relative std error ≈
  * 1.04/√2^lgK (1.6 % at the default lgK = 12), and BELOW the coupon
  * thresholds the sketch stores (hashes of) the values themselves,
  * so small-group estimates are exact — which is why
  * [[SparkEntry]]'s `sketch_distinct` key can hash-match an exact
  * DuckDB COUNT(DISTINCT) oracle at gate scale (both sf dirs sit in
  * the coupon regime; measured, and the regime boundary is asserted
  * in the spec). At any scale the self-measured `sketch_distinct_gate`
  * key bounds the estimate against the exact count at 3σ — the same
  * honesty-gate pattern as the ANN recall keys.
  */
object Sketches {

  /** lgK = 12 → 4 KB dense sketches, 1.6 % rel std err — the
    * DataSketches default trade-off; raise for tighter error.
    */
  val DefaultLgK = 12

  /** Per-group approximate distinct count — one shuffle whose rows
    * are (group, partial sketch). Output: groupCols ++ (n_distinct
    * long).
    */
  def distinctByGroup(df: DataFrame, groupCols: Seq[String], valueCol: String,
                      lgK: Int = DefaultLgK): DataFrame =
    sketchByGroup(df, groupCols, valueCol, lgK)
      .select(groupCols.map(col) :+
        hll_sketch_estimate(col("sketch")).as("n_distinct"): _*)

  /** Per-group serialized sketch — the mergeable form the stored
    * lifecycle persists. Output: groupCols ++ (sketch binary).
    */
  def sketchByGroup(df: DataFrame, groupCols: Seq[String], valueCol: String,
                    lgK: Int = DefaultLgK): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("sketch"))

  /** Union sketches down to a coarser grouping (e.g. per-day → per
    * event_type all-time) — distinct counts over supersets WITHOUT
    * touching raw data. Distinct is not summable across days (the
    * same user appears on many days); sketch union handles the
    * overlap exactly as the raw re-scan would have.
    */
  def rollup(sketches: DataFrame, toCols: Seq[String]): DataFrame =
    sketches.groupBy(toCols.map(col): _*)
      .agg(hll_union_agg(col("sketch")).as("sketch"))
      .select(toCols.map(col) :+
        hll_sketch_estimate(col("sketch")).as("n_distinct"): _*)

  // ---- stored lifecycle ------------------------------------------------

  /** Table layout: `<name>_sketches` (groupCols ++ sketch), BUCKETED
    * on the first group column so append's merge never shuffles the
    * stored side, plus `<name>_meta` (lgK + the group/value columns —
    * append must sketch new batches at the STORED geometry; sketches
    * at different lgK only union destructively).
    */
  def writeSketchTable(spark: SparkSession, name: String, df: DataFrame,
                       groupCols: Seq[String], valueCol: String,
                       lgK: Int = DefaultLgK, buckets: Int = 16): Unit = {
    Sinks.writeBucketed(sketchByGroup(df, groupCols, valueCol, lgK),
      s"${name}_sketches", groupCols.head, buckets)
    import spark.implicits._
    // group columns travel as array<string> — a joined-string encoding
    // silently corrupts geometry for column names containing the
    // separator
    Seq((lgK, groupCols, valueCol, buckets))
      .toDF("lg_k", "group_cols", "value_col", "buckets")
      .write.mode("overwrite").saveAsTable(s"${name}_meta")
  }

  /** Stale-generation refresh before any stored read — see
    * [[StoredTable.refresh]] (the shared lifecycle core).
    */
  private def refresh(spark: SparkSession, name: String): Unit =
    StoredTable.refresh(spark, s"${name}_sketches", s"${name}_meta")

  private def metaGroupCols(r: org.apache.spark.sql.Row): Seq[String] =
    StoredTable.metaGroupCols(r)

  private def meta(spark: SparkSession, name: String): (Int, Seq[String], String, Int) = {
    val r = StoredTable.metaRow(spark, name, "sketch")
    (r.getAs[Int]("lg_k"), metaGroupCols(r),
      r.getAs[String]("value_col"), r.getAs[Int]("buckets"))
  }

  /** Fold one new batch of RAW rows into the stored sketches: the
    * batch aggregates down to (group, sketch) first (the only pass
    * over the batch — raw history is never rescanned), then merges
    * into the stored table via a generation-flip rewrite
    * ([[Sinks.rewriteBucketed]] — readers stay live). The union leg
    * discards the stored side's bucket alignment, so the rewrite's
    * explicit repartition re-routes — acceptable because BOTH merge
    * legs are already sketch rows (bounded by #groups), never raw
    * events. Replaying an already-absorbed batch leaves every
    * estimate unchanged (HLL insertion is idempotent; spec-pinned).
    */
  def appendToSketchTable(spark: SparkSession, name: String, batch: DataFrame): Unit = {
    refresh(spark, name)
    val (lgK, groupCols, valueCol, buckets) = meta(spark, name)
    val batchSketches = sketchByGroup(batch, groupCols, valueCol, lgK)
    Sinks.rewriteBucketed(spark, s"${name}_sketches", Seq(groupCols.head), buckets,
      stored => stored.unionByName(batchSketches)
        .groupBy(groupCols.map(col): _*)
        .agg(hll_union_agg(col("sketch")).as("sketch")))
  }

  /** Per-group estimates from the STORED sketches alone — zero raw
    * data touched.
    */
  def estimateSketchTable(spark: SparkSession, name: String): DataFrame = {
    refresh(spark, name)
    val (_, groupCols, _, _) = meta(spark, name)
    spark.table(s"${name}_sketches")
      .select(groupCols.map(col) :+
        hll_sketch_estimate(col("sketch")).as("n_distinct"): _*)
  }

  /** Coarser-granularity estimates from the stored sketches (union
    * across the dropped group columns).
    */
  def rollupSketchTable(spark: SparkSession, name: String, toCols: Seq[String]): DataFrame = {
    refresh(spark, name)
    rollup(spark.table(s"${name}_sketches"), toCols)
  }

  // ---- frequent items (heavy hitters) ---------------------------------

  /** maxMapSize 4096 → ~32 KB sketches, error ≤ 3.5/4096 of the
    * stream weight once saturated; exact below ~3k distinct items.
    */
  val DefaultMaxMapSize = 4096

  /** The aggregate Column forms of the custom Catalyst sketch
    * aggregates (graft.functions.expressions.FreqSketchExprs) — the
    * ObjectHashAggregate partial-merge plan shape, same as Spark's
    * own hll_sketch_agg.
    */
  def freqSketch(item: Column, maxMapSize: Int = DefaultMaxMapSize): Column =
    ColumnBridge.column(
      FreqSketchAgg(ColumnBridge.expression(item), maxMapSize).toAggregateExpression())

  def freqSketchMerge(sketch: Column, maxMapSize: Int = DefaultMaxMapSize): Column =
    ColumnBridge.column(
      FreqSketchMergeAgg(ColumnBridge.expression(sketch), maxMapSize).toAggregateExpression())

  def freqTopK(sketch: Column, k: Int): Column =
    ColumnBridge.column(FreqSketchTopK(ColumnBridge.expression(sketch), k))

  /** Per-group heavy hitters: one bounded sketch per group (shuffle
    * rows are sketches), then the top-k extraction runs once per
    * GROUP row. Output: groupCols ++ (item, estimate, lower, upper),
    * (estimate desc, item asc) within each group. The [lower, upper]
    * envelope always contains the true count; estimate == exact
    * whenever the group stayed below the purge threshold
    * (~0.75·maxMapSize distinct items).
    */
  def heavyHitters(df: DataFrame, groupCols: Seq[String], itemCol: String, k: Int,
                   maxMapSize: Int = DefaultMaxMapSize): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(freqSketch(col(itemCol), maxMapSize).as("sketch"))
      .select(groupCols.map(col) :+ explode(freqTopK(col("sketch"), k)).as("hh"): _*)
      .select(groupCols.map(col) :+ col("hh.item").as("item") :+
        col("hh.estimate").as("estimate") :+ col("hh.lower").as("lower") :+
        col("hh.upper").as("upper"): _*)

  /** Stored heavy-hitter lifecycle — the HLL sketch-table pattern
    * with the frequency sketch: bucketed per-group sketch table +
    * meta carrying maxMapSize (append must build batch sketches at
    * the STORED geometry), one-pass-per-batch append via the same
    * generation-flip rewrite. NOTE the semantic difference from HLL:
    * frequency merging SUMS counts, so a replayed batch WOULD
    * double-count (frequencies are additive, distinct is not) —
    * which is why append takes a monotone `batchId` and stamps it
    * into the same atomic generation flip as the counts
    * (exactly-once under at-least-once delivery; see
    * [[appendToFreqTable]]).
    */
  /** Every stored row carries `last_batch` — the highest ingest batch
    * id folded in so far (-1 = none). The stamp rides the SAME
    * generation flip as the merged sketches (one `ALTER TABLE SET
    * LOCATION`), so "this batch's counts are in" and "this batch id
    * is recorded" commit ATOMICALLY — the exactly-once guard a
    * replayed `foreachBatch` needs (frequency counts are additive;
    * unlike the HLL table, a replay here would double-count).
    */
  def writeFreqTable(spark: SparkSession, name: String, df: DataFrame,
                     groupCols: Seq[String], itemCol: String,
                     maxMapSize: Int = DefaultMaxMapSize, buckets: Int = 16): Unit = {
    StoredTable.writeStamped(
      df.groupBy(groupCols.map(col): _*)
        .agg(freqSketch(col(itemCol), maxMapSize).as("sketch")),
      s"${name}_sketches", groupCols.head, buckets)
    import spark.implicits._
    Seq((maxMapSize, groupCols, itemCol, buckets))
      .toDF("max_map_size", "group_cols", "item_col", "buckets")
      .write.mode("overwrite").saveAsTable(s"${name}_meta")
  }

  private def freqMeta(spark: SparkSession, name: String): (Int, Seq[String], String, Int) = {
    val r = StoredTable.metaRow(spark, name, "freq")
    (r.getAs[Int]("max_map_size"), metaGroupCols(r),
      r.getAs[String]("item_col"), r.getAs[Int]("buckets"))
  }

  /** Fold one batch in. With `batchId >= 0` the append is
    * EXACTLY-ONCE under at-least-once delivery: a batch at or below
    * the stored `last_batch` stamp is a replay of counts already
    * committed by a previous generation flip and no-ops (batch ids
    * must be monotonically increasing — the foreachBatch contract).
    * `batchId = -1` skips the guard (ad-hoc batch appends own their
    * own delivery semantics).
    */
  def appendToFreqTable(spark: SparkSession, name: String, batch: DataFrame,
                        batchId: Long = -1L): Unit = {
    refresh(spark, name)
    val (maxMapSize, groupCols, itemCol, buckets) = freqMeta(spark, name)
    val batchSketches = batch.groupBy(groupCols.map(col): _*)
      .agg(freqSketch(col(itemCol), maxMapSize).as("sketch"))
    StoredTable.appendStamped(spark, s"${name}_sketches", Seq(groupCols.head), buckets, batchId) {
      stored => stored.unionByName(batchSketches)
        .groupBy(groupCols.map(col): _*)
        .agg(freqSketchMerge(col("sketch"), maxMapSize).as("sketch"))
    }
    ()
  }

  /** Top-k per stored group — zero raw data touched. */
  def topKFromFreqTable(spark: SparkSession, name: String, k: Int): DataFrame = {
    refresh(spark, name)
    val (_, groupCols, _, _) = freqMeta(spark, name)
    spark.table(s"${name}_sketches")
      .select(groupCols.map(col) :+ explode(freqTopK(col("sketch"), k)).as("hh"): _*)
      .select(groupCols.map(col) :+ col("hh.item").as("item") :+
        col("hh.estimate").as("estimate") :+ col("hh.lower").as("lower") :+
        col("hh.upper").as("upper"): _*)
  }

  /** Heavy hitters at a coarser grouping from the stored sketches
    * (rollup = sketch merge; the error envelopes sum, as reported).
    */
  def rollupFreqTable(spark: SparkSession, name: String, toCols: Seq[String],
                      k: Int): DataFrame = {
    refresh(spark, name)
    val (maxMapSize, _, _, _) = freqMeta(spark, name)
    spark.table(s"${name}_sketches")
      .groupBy(toCols.map(col): _*)
      .agg(freqSketchMerge(col("sketch"), maxMapSize).as("sketch"))
      .select(toCols.map(col) :+ explode(freqTopK(col("sketch"), k)).as("hh"): _*)
      .select(toCols.map(col) :+ col("hh.item").as("item") :+
        col("hh.estimate").as("estimate") :+ col("hh.lower").as("lower") :+
        col("hh.upper").as("upper"): _*)
  }

  // ---- gate keys -------------------------------------------------------

  /** Distinct users per (event_type, day) over the events table.
    * `d` is the epoch-second of the UTC day boundary (the q12 ts
    * parity pattern). Gate-scale cardinalities sit in the sketch's
    * exact coupon regime, so this hash-matches the exact
    * COUNT(DISTINCT) oracle; at regimes beyond it the estimate
    * drifts within the documented bound and [[distinctGate]] is the
    * check that travels.
    */
  def distinctUsersDaily(spark: SparkSession, dir: String,
                         lgK: Int = DefaultLgK): DataFrame = {
    val ev = graft.Tables.events(spark, dir)
      .withColumn("d", unix_timestamp(date_trunc("day", col("ts"))))
    distinctByGroup(ev, Seq("event_type", "d"), "user_id", lgK)
      .select(col("event_type"), col("d"), col("n_distinct").as("n_users"))
      .orderBy(col("event_type"), col("d"))
  }

  /** The SCALE-ADAPTIVE gate form of [[distinctUsersDaily]] (r19):
    * per (event_type, day), the EXACT distinct count plus `in3s` —
    * 1 iff the HLL estimate sits within its pinned 3σ relative
    * envelope of that exact count (3·1.04/√2^lgK, the DataSketches
    * bound [[distinctGate]] also pins, floored at an absolute 1 so
    * exact-regime groups can't fail on integer rounding). The r13–r18
    * gate key emitted the raw estimate, which hash-matches an exact
    * COUNT(DISTINCT) oracle ONLY inside the coupon regime — the key
    * stopped being oracle-checkable the moment a group grew past it
    * (the documented sf0.1 divergence: 526 vs 527 on one group).
    * This form is regime-free: the exact counts hash-check
    * cross-engine at ANY scale, and the DuckDB twin asserts the
    * envelope by emitting the constant 1 — a sketch estimate outside
    * its own error bound now breaks the gate instead of being
    * un-checkable. PER-GROUP calibration, strictly stronger than the
    * corpus-max [[distinctGate]].
    *
    * Scale shape: one groupBy carrying (sketch, partial exact-distinct
    * state) — the exact leg is the same shuffle any COUNT(DISTINCT)
    * pays and exists FOR the gate comparison; production consumers
    * wanting estimates alone take [[distinctUsersDaily]].
    */
  def distinctUsersDailyChecked(spark: SparkSession, dir: String,
                                lgK: Int = DefaultLgK): DataFrame = {
    val ev = graft.Tables.events(spark, dir)
      .withColumn("d", unix_timestamp(date_trunc("day", col("ts"))))
    val bound = 3.0 * 1.04 / math.sqrt(math.pow(2.0, lgK))
    ev.groupBy(col("event_type"), col("d"))
      .agg(hll_sketch_agg(col("user_id"), lit(lgK)).as("sketch"),
        countDistinct(col("user_id")).as("n_users"))
      .select(col("event_type"), col("d"), col("n_users"),
        (abs(hll_sketch_estimate(col("sketch")) - col("n_users")) <=
          greatest(lit(bound) * col("n_users"), lit(1.0)))
          .cast("long").as("in3s"))
      .orderBy(col("event_type"), col("d"))
  }

  // ---- theta sketches (distinct set algebra) ---------------------------

  /** 4096 nominal entries → ≤64 KB compact sketches, ~1.6 % RSE on
    * unions once estimating; EXACT below 4096 distinct values.
    */
  val DefaultNominalEntries = 4096

  def thetaSketch(value: Column, nominalEntries: Int = DefaultNominalEntries): Column =
    ColumnBridge.column(
      ThetaSketchAgg(ColumnBridge.expression(value), nominalEntries).toAggregateExpression())

  def thetaUnion(sketch: Column, nominalEntries: Int = DefaultNominalEntries): Column =
    ColumnBridge.column(
      ThetaUnionAgg(ColumnBridge.expression(sketch), nominalEntries).toAggregateExpression())

  def thetaIntersect(a: Column, b: Column): Column =
    ColumnBridge.column(ThetaIntersect(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def thetaAnotB(a: Column, b: Column): Column =
    ColumnBridge.column(ThetaAnotB(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** struct<estimate, lower, upper> (3 std-dev envelope). */
  def thetaSummary(sketch: Column): Column =
    ColumnBridge.column(ThetaSummary(ColumnBridge.expression(sketch)))

  /** Per-day click/purchase audience overlap — the funnel/retention
    * query HLL cannot answer (intersections of distinct sets):
    * distinct clickers, distinct purchasers, users who did BOTH, and
    * clickers who never purchased, all from two theta sketches per
    * day built in ONE pass (conditional updates — no self-join of
    * distinct sets). Gate-scale audiences sit below nominalEntries,
    * so every sketch is in exact mode and the key hash-matches the
    * exact flag-sum oracle; [[setOverlapGate]] carries the
    * estimation-regime check via the sketches' own envelopes.
    */
  def setOverlapDaily(spark: SparkSession, dir: String,
                      nominalEntries: Int = DefaultNominalEntries): DataFrame = {
    val sk = overlapSketches(spark, dir, nominalEntries)
    sk.select(col("d"),
      thetaSummary(col("sc")).getField("estimate").as("n_click"),
      thetaSummary(col("sp")).getField("estimate").as("n_purchase"),
      thetaSummary(thetaIntersect(col("sc"), col("sp"))).getField("estimate").as("n_both"),
      thetaSummary(thetaAnotB(col("sc"), col("sp"))).getField("estimate").as("n_click_only"))
      .orderBy(col("d"))
  }

  private def overlapSketches(spark: SparkSession, dir: String,
                              nominalEntries: Int): DataFrame = {
    graft.Tables.events(spark, dir)
      .filter(col("event_type").isin("click", "purchase"))
      .withColumn("d", unix_timestamp(date_trunc("day", col("ts"))))
      .groupBy(col("d"))
      .agg(
        thetaSketch(when(col("event_type") === "click", col("user_id")), nominalEntries)
          .as("sc"),
        thetaSketch(when(col("event_type") === "purchase", col("user_id")), nominalEntries)
          .as("sp"))
  }

  /** Per-group serialized theta sketch — the mergeable stored form
    * (the theta twin of [[sketchByGroup]]).
    */
  def thetaSketchByGroup(df: DataFrame, groupCols: Seq[String], valueCol: String,
                         nominalEntries: Int = DefaultNominalEntries): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(thetaSketch(col(valueCol), nominalEntries).as("sketch"))

  // ---- stored theta lifecycle -----------------------------------------

  /** Stored theta-sketch table — the funnel/retention question
    * ("clickers ∩ purchasers over any date range") answered from a
    * BOUNDED stored table, never a raw-history rescan. Same bucketed
    * `<name>_sketches` + `<name>_meta` layout as the HLL tier, and the
    * same FREE-REPLAY append pattern: theta union is
    * insertion-idempotent (re-absorbing a value is a no-op), so unlike
    * the additive frequency/quantile tiers no batch-id stamp is needed
    * — at-least-once delivery yields exactly-once estimates by
    * construction (spec-pinned).
    *
    * The COHORT dimension (e.g. event_type) is just one of the group
    * columns: one sketch row per (cohort, key...), and
    * [[overlapFromThetaTable]] unions each cohort's rows down to the
    * requested key grain before intersecting — any day range or
    * coarser granularity works because union absorbs the dropped
    * columns exactly as a raw re-scan would have.
    */
  def writeThetaTable(spark: SparkSession, name: String, df: DataFrame,
                      groupCols: Seq[String], valueCol: String,
                      nominalEntries: Int = DefaultNominalEntries,
                      buckets: Int = 16): Unit = {
    // replace-aware: a full REBUILD of a flipped table (cohort
    // reconciliation) must stage a new generation, not overwrite
    Sinks.replaceBucketed(spark,
      thetaSketchByGroup(df, groupCols, valueCol, nominalEntries),
      s"${name}_sketches", Seq(groupCols.head), buckets)
    import spark.implicits._
    Seq((nominalEntries, groupCols, valueCol, buckets))
      .toDF("nominal_entries", "group_cols", "value_col", "buckets")
      .write.mode("overwrite").saveAsTable(s"${name}_meta")
  }

  private[operators] def thetaMeta(spark: SparkSession, name: String): (Int, Seq[String], String, Int) = {
    val r = StoredTable.metaRow(spark, name, "theta")
    (r.getAs[Int]("nominal_entries"), metaGroupCols(r),
      r.getAs[String]("value_col"), r.getAs[Int]("buckets"))
  }

  /** Fold one new batch of RAW rows in — the [[appendToSketchTable]]
    * pattern with the theta union as the merge (one aggregation pass
    * over the batch, generation-flip rewrite of the bounded sketch
    * rows, readers stay live). Replay-safe without bookkeeping: theta
    * insertion is idempotent.
    */
  def appendToThetaTable(spark: SparkSession, name: String, batch: DataFrame): Unit = {
    refresh(spark, name)
    val (nominalEntries, groupCols, valueCol, buckets) = thetaMeta(spark, name)
    val batchSketches = thetaSketchByGroup(batch, groupCols, valueCol, nominalEntries)
    Sinks.rewriteBucketed(spark, s"${name}_sketches", Seq(groupCols.head), buckets,
      stored => stored.unionByName(batchSketches)
        .groupBy(groupCols.map(col): _*)
        .agg(thetaUnion(col("sketch"), nominalEntries).as("sketch")))
  }

  /** Per-group distinct estimates from the STORED sketches alone. */
  def estimateThetaTable(spark: SparkSession, name: String): DataFrame = {
    refresh(spark, name)
    val (_, groupCols, _, _) = thetaMeta(spark, name)
    spark.table(s"${name}_sketches")
      .select(groupCols.map(col) :+
        thetaSummary(col("sketch")).getField("estimate").as("n_distinct"): _*)
  }

  /** Coarser-granularity estimates from the stored sketches. */
  def rollupThetaTable(spark: SparkSession, name: String, toCols: Seq[String]): DataFrame = {
    refresh(spark, name)
    val (nominalEntries, _, _, _) = thetaMeta(spark, name)
    spark.table(s"${name}_sketches")
      .groupBy(toCols.map(col): _*)
      .agg(thetaUnion(col("sketch"), nominalEntries).as("sketch"))
      .select(toCols.map(col) :+
        thetaSummary(col("sketch")).getField("estimate").as("n_distinct"): _*)
  }

  /** The stored funnel: audience sizes of cohorts `a` and `b`, their
    * intersection, and a-not-b, per `keyCols` grain, from the stored
    * sketch table alone — zero raw data touched. `keyCols` may be any
    * subset of the non-cohort group columns (empty = all-time): each
    * cohort's sketches union down to the grain first, so a day-range
    * `where` filter plus `keyCols = Seq()` answers "over these weeks"
    * from a handful of KB-sized rows. Output columns: keyCols ++
    * (n_a, n_b, n_both, n_a_only).
    */
  def overlapFromThetaTable(spark: SparkSession, name: String, cohortCol: String,
                            a: String, b: String, keyCols: Seq[String],
                            where: Column = lit(true)): DataFrame = {
    refresh(spark, name)
    val (nominalEntries, groupCols, _, _) = thetaMeta(spark, name)
    require(groupCols.contains(cohortCol),
      s"cohort column $cohortCol is not part of the stored grouping $groupCols")
    require(keyCols.forall(k => groupCols.contains(k) && k != cohortCol),
      s"key columns $keyCols must be stored non-cohort group columns ($groupCols)")
    spark.table(s"${name}_sketches")
      .filter(where && col(cohortCol).isin(a, b))
      .groupBy(keyCols.map(col): _*)
      .agg(
        thetaUnion(when(col(cohortCol) === a, col("sketch")), nominalEntries).as("sa"),
        thetaUnion(when(col(cohortCol) === b, col("sketch")), nominalEntries).as("sb"))
      .select(keyCols.map(col) :+
        thetaSummary(col("sa")).getField("estimate").as("n_a") :+
        thetaSummary(col("sb")).getField("estimate").as("n_b") :+
        thetaSummary(thetaIntersect(col("sa"), col("sb"))).getField("estimate").as("n_both") :+
        thetaSummary(thetaAnotB(col("sa"), col("sb"))).getField("estimate").as("n_a_only"): _*)
  }

  /** N-step funnel from the stored theta table: per `keyCols` grain,
    * the audience that completed step 1, steps 1∧2, … — the
    * generalization of [[overlapFromThetaTable]] to ordered
    * conversion chains ("of the viewers, how many clicked, and of
    * those, purchased"), answered from the bounded stored table via
    * one union per step and cumulative intersections. Output:
    * keyCols ++ one `n_<s1>[_<s2>…]` column per prefix.
    */
  def funnelFromThetaTable(spark: SparkSession, name: String, cohortCol: String,
                           steps: Seq[String], keyCols: Seq[String],
                           where: Column = lit(true)): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    refresh(spark, name)
    val (nominalEntries, groupCols, _, _) = thetaMeta(spark, name)
    require(groupCols.contains(cohortCol),
      s"cohort column $cohortCol is not part of the stored grouping $groupCols")
    require(keyCols.forall(k => groupCols.contains(k) && k != cohortCol),
      s"key columns $keyCols must be stored non-cohort group columns ($groupCols)")
    val unions = steps.zipWithIndex.map { case (s, i) =>
      thetaUnion(when(col(cohortCol) === s, col("sketch")), nominalEntries).as(s"s$i")
    }
    val grouped = spark.table(s"${name}_sketches")
      .filter(where && col(cohortCol).isin(steps: _*))
      .groupBy(keyCols.map(col): _*)
      .agg(unions.head, unions.tail: _*)
    grouped.select(keyCols.map(col) ++ funnelMeasures(steps): _*)
  }

  /** Cumulative-intersection measure columns over step sketches
    * `s0..sN-1`: `n_<s1>`, `n_<s1>_<s2>`, … (each estimate from the
    * intersection of all previous steps' sketches).
    */
  private def funnelMeasures(steps: Seq[String]): Seq[Column] = {
    val cums = steps.indices.tail.scanLeft(col("s0"): Column) { (acc, i) =>
      thetaIntersect(acc, col(s"s$i"))
    }
    cums.zipWithIndex.map { case (c, i) =>
      thetaSummary(c).getField("estimate").as("n_" + steps.take(i + 1).mkString("_"))
    }
  }

  /** Per-day N-step funnel over the events table in ONE pass — one
    * conditional theta sketch per (day, step), then cumulative
    * intersections. The exact form is a distinct-set self-join per
    * prefix asked; here every prefix is sketch algebra over the same
    * single scan. Gate-scale daily audiences sit in exact mode, so
    * the key hash-matches the exact flag-product oracle (the
    * [[setOverlapDaily]] argument); estimation-regime honesty travels
    * via [[setOverlapGate]]'s envelope machinery over the same
    * expressions.
    */
  def funnelDaily(spark: SparkSession, dir: String,
                  steps: Seq[String] = Seq("view", "click", "purchase"),
                  nominalEntries: Int = DefaultNominalEntries): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val ev = graft.Tables.events(spark, dir)
      .filter(col("event_type").isin(steps: _*))
      .withColumn("d", unix_timestamp(date_trunc("day", col("ts"))))
    val sketches = steps.zipWithIndex.map { case (s, i) =>
      thetaSketch(when(col("event_type") === s, col("user_id")), nominalEntries).as(s"s$i")
    }
    ev.groupBy(col("d")).agg(sketches.head, sketches.tail: _*)
      .select(col("d") +: funnelMeasures(steps): _*)
      .orderBy(col("d"))
  }

  /** N-day retention over the events table: per day, the distinct
    * active audience and how much of it was STILL active `lag` days
    * later, for each requested lag — one scan builds one theta sketch
    * per day, then day-d ∩ day-(d+lag) is sketch algebra over the
    * bounded per-day frame (a self-join of 365 KB-sized rows per
    * year, broadcastable at any event volume; the exact form
    * self-joins the full distinct-(day, user) set per lag). Exact
    * mode below nominalEntries actives/day → hash-matches the exact
    * distinct-join oracle; estimation honesty travels via
    * [[setOverlapGate]]'s envelope machinery over the same
    * expressions.
    */
  def retentionDaily(spark: SparkSession, dir: String,
                     lags: Seq[Int] = Seq(1, 7),
                     nominalEntries: Int = DefaultNominalEntries): DataFrame = {
    val days = graft.Tables.events(spark, dir)
      .withColumn("d", unix_timestamp(date_trunc("day", col("ts"))))
      .groupBy(col("d"))
      .agg(thetaSketch(col("user_id"), nominalEntries).as("sketch"))
    retentionJoin(days, lags)
  }

  /** Day-d ∩ day-(d+lag) audiences over a per-day sketch frame
    * (`d`, `sketch`): left-join each lag's shifted day back onto the
    * base day and intersect — days with no lagged counterpart retain
    * zero by definition.
    */
  private def retentionJoin(days: DataFrame, lags: Seq[Int]): DataFrame = {
    val base = days.select(col("d"), col("sketch").as("_cur"))
    val joined = lags.zipWithIndex.foldLeft(base) { case (acc, (lag, i)) =>
      acc.join(
        days.select((col("d") - lit(lag * 86400L)).as("d"), col("sketch").as(s"_lag$i")),
        Seq("d"), "left")
    }
    val measures = thetaSummary(col("_cur")).getField("estimate").as("n_active") +:
      lags.zipWithIndex.map { case (lag, i) =>
        when(col(s"_lag$i").isNull, lit(0L))
          .otherwise(thetaSummary(thetaIntersect(col("_cur"), col(s"_lag$i")))
            .getField("estimate")).as(s"n_ret_${lag}d")
      }
    joined.select(col("d") +: measures: _*).orderBy(col("d"))
  }

  /** Retention from a STORED theta table whose grouping includes a
    * day column (epoch seconds): rows first union down to the
    * per-day grain (absorbing cohort and any other stored columns,
    * optionally `where`-filtered), then the same bounded lag
    * self-join as [[retentionDaily]] — any-day-range retention with
    * zero raw-history rescans.
    */
  def retentionFromThetaTable(spark: SparkSession, name: String, dayCol: String,
                              lags: Seq[Int] = Seq(1, 7),
                              where: Column = lit(true)): DataFrame = {
    refresh(spark, name)
    val (nominalEntries, groupCols, _, _) = thetaMeta(spark, name)
    require(groupCols.contains(dayCol),
      s"day column $dayCol is not part of the stored grouping $groupCols")
    val days = spark.table(s"${name}_sketches")
      .filter(where)
      .groupBy(col(dayCol).as("d"))
      .agg(thetaUnion(col("sketch"), nominalEntries).as("sketch"))
    retentionJoin(days, lags)
  }

  /** Theta honesty gate: 1 iff for every day all four measures'
    * TRUE values sit inside the result sketches' own 3-std-dev
    * [lower, upper] envelopes (exact-mode sketches report zero-width
    * envelopes, so at gate scale this also proves exactness).
    */
  def setOverlapGate(spark: SparkSession, dir: String,
                     nominalEntries: Int = DefaultNominalEntries): DataFrame = {
    val sk = overlapSketches(spark, dir, nominalEntries)
      .select(col("d"), thetaSummary(col("sc")).as("c"), thetaSummary(col("sp")).as("p"),
        thetaSummary(thetaIntersect(col("sc"), col("sp"))).as("b"),
        thetaSummary(thetaAnotB(col("sc"), col("sp"))).as("o"))
    val exact = graft.Tables.events(spark, dir)
      .filter(col("event_type").isin("click", "purchase"))
      .withColumn("d", unix_timestamp(date_trunc("day", col("ts"))))
      .groupBy(col("d"), col("user_id"))
      .agg(max(when(col("event_type") === "click", 1L).otherwise(0L)).as("c"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("p"))
      .groupBy(col("d"))
      .agg(sum(col("c")).as("en_c"), sum(col("p")).as("en_p"),
        sum(col("c") * col("p")).as("en_b"),
        sum(col("c") * (lit(1L) - col("p"))).as("en_o"))
    def inside(s: Column, v: Column): Column =
      s.getField("lower") <= v && v <= s.getField("upper")
    sk.join(exact, Seq("d")).agg(
      min(when(inside(col("c"), col("en_c")) && inside(col("p"), col("en_p")) &&
        inside(col("b"), col("en_b")) && inside(col("o"), col("en_o")), 1)
        .otherwise(0)).as("pass"))
  }

  // ---- quantile sketches (GK summaries) --------------------------------

  /** ε = 1e-4 rank error — q16's house accuracy (1/ε = 10⁴); any
    * group under 1/(2ε) rows is RANK-EXACT (the error budget is
    * under one rank), the quantile tier's coupon-regime analogue.
    */
  val DefaultQuantileError = 0.0001

  def quantileSketch(value: Column, relativeError: Double = DefaultQuantileError): Column =
    ColumnBridge.column(
      QuantileSketchAgg(ColumnBridge.expression(value), relativeError).toAggregateExpression())

  def quantileSketchMerge(sketch: Column,
                          relativeError: Double = DefaultQuantileError): Column =
    ColumnBridge.column(
      QuantileSketchMergeAgg(ColumnBridge.expression(sketch), relativeError)
        .toAggregateExpression())

  def quantileQuery(sketch: Column, quantiles: Seq[Double]): Column =
    ColumnBridge.column(QuantileSketchQuery(ColumnBridge.expression(sketch), quantiles))

  /** Per-group quantiles through one stored-form sketch pass —
    * groupCols ++ one `p<percent>` column per requested quantile.
    * Same GK structure as `approx_percentile`, but the summary is a
    * first-class value: [[writeQuantileTable]] persists it per (key,
    * day) and any day-range / coarser percentile answers from the
    * bounded sketch table.
    */
  /** `p<percent>` with the FULL quantile value (0.995 → p99_5, 0.5 →
    * p50): integer-rounded labels collide for quantiles within the
    * same percent (0.99 vs 0.994 would both be p99) and the duplicate
    * column names fail ambiguously downstream. Decimal-exact via the
    * string constructor (BigDecimal(0.99d) carries binary noise).
    */
  private[graft] def quantileColName(q: Double): String =
    "p" + (BigDecimal(q.toString) * 100).underlying.stripTrailingZeros
      .toPlainString.replace(".", "_")

  private def quantileCols(quantiles: Seq[Double]): Seq[Column] = {
    val names = quantiles.map(quantileColName)
    require(names.distinct.length == names.length,
      s"quantiles map to duplicate column names: ${names.mkString(", ")}")
    quantiles.zipWithIndex.map { case (q, i) =>
      element_at(col("qs"), i + 1).as(quantileColName(q))
    }
  }

  def quantilesByGroup(df: DataFrame, groupCols: Seq[String], valueCol: String,
                       quantiles: Seq[Double],
                       relativeError: Double = DefaultQuantileError): DataFrame = {
    val qcols = quantileCols(quantiles)
    df.groupBy(groupCols.map(col): _*)
      .agg(quantileSketch(col(valueCol).cast("double"), relativeError).as("sketch"))
      .select(groupCols.map(col) :+ quantileQuery(col("sketch"), quantiles).as("qs"): _*)
      .select(groupCols.map(col) ++ qcols: _*)
  }

  /** Stored quantile lifecycle — the frequency-table pattern
    * (quantile summaries are weight-additive like counts, so a
    * replayed batch would distort the distribution: append takes the
    * same monotone batch id, stamped into the same atomic generation
    * flip).
    */
  def writeQuantileTable(spark: SparkSession, name: String, df: DataFrame,
                         groupCols: Seq[String], valueCol: String,
                         relativeError: Double = DefaultQuantileError,
                         buckets: Int = 16): Unit = {
    StoredTable.writeStamped(
      df.groupBy(groupCols.map(col): _*)
        .agg(quantileSketch(col(valueCol).cast("double"), relativeError).as("sketch")),
      s"${name}_sketches", groupCols.head, buckets)
    import spark.implicits._
    Seq((relativeError, groupCols, valueCol, buckets))
      .toDF("relative_error", "group_cols", "value_col", "buckets")
      .write.mode("overwrite").saveAsTable(s"${name}_meta")
  }

  private def quantileMeta(spark: SparkSession, name: String)
  : (Double, Seq[String], String, Int) = {
    val r = StoredTable.metaRow(spark, name, "quantile")
    (r.getAs[Double]("relative_error"), metaGroupCols(r),
      r.getAs[String]("value_col"), r.getAs[Int]("buckets"))
  }

  def appendToQuantileTable(spark: SparkSession, name: String, batch: DataFrame,
                            batchId: Long = -1L): Unit = {
    refresh(spark, name)
    val (relErr, groupCols, valueCol, buckets) = quantileMeta(spark, name)
    val batchSketches = batch.groupBy(groupCols.map(col): _*)
      .agg(quantileSketch(col(valueCol).cast("double"), relErr).as("sketch"))
    StoredTable.appendStamped(spark, s"${name}_sketches", Seq(groupCols.head), buckets, batchId) {
      stored => stored.unionByName(batchSketches)
        .groupBy(groupCols.map(col): _*)
        .agg(quantileSketchMerge(col("sketch"), relErr).as("sketch"))
    }
    ()
  }

  /** Per-group quantiles from the STORED summaries — zero raw data. */
  def quantilesFromTable(spark: SparkSession, name: String,
                         quantiles: Seq[Double]): DataFrame = {
    refresh(spark, name)
    val (_, groupCols, _, _) = quantileMeta(spark, name)
    val qcols = quantileCols(quantiles)
    spark.table(s"${name}_sketches")
      .select(groupCols.map(col) :+ quantileQuery(col("sketch"), quantiles).as("qs"): _*)
      .select(groupCols.map(col) ++ qcols: _*)
  }

  /** Quantiles at a coarser grouping from the stored summaries
    * (rollup = summary merge; the GK ε bound survives merging).
    */
  def rollupQuantileTable(spark: SparkSession, name: String, toCols: Seq[String],
                          quantiles: Seq[Double]): DataFrame = {
    refresh(spark, name)
    val (relErr, _, _, _) = quantileMeta(spark, name)
    val qcols = quantileCols(quantiles)
    spark.table(s"${name}_sketches")
      .groupBy(toCols.map(col): _*)
      .agg(quantileSketchMerge(col("sketch"), relErr).as("sketch"))
      .select(toCols.map(col) :+ quantileQuery(col("sketch"), quantiles).as("qs"): _*)
      .select(toCols.map(col) ++ qcols: _*)
  }

  /** Per-event-type value percentiles over the events table via the
    * stored-form sketch (rows-only — the returned values are actual
    * stream elements under a RANK-error bound, the q16 approx
    * precedent; [[quantilesGate]] is the measured check).
    */
  def quantilesByType(spark: SparkSession, dir: String): DataFrame =
    quantilesByGroup(
      graft.Tables.events(spark, dir).select(col("event_type"), col("value")),
      Seq("event_type"), "value", Seq(0.5, 0.9, 0.99))
      .orderBy(col("event_type"))

  /** Quantile honesty gate: 1 iff for EVERY group and every queried
    * quantile the returned value's true rank interval covers a rank
    * within ε·n + 1 of the target — rank-error measured against the
    * exact sorted data, not assumed.
    */
  def quantilesGate(spark: SparkSession, dir: String,
                    relativeError: Double = DefaultQuantileError): DataFrame = {
    val ev = graft.Tables.events(spark, dir).select(col("event_type"), col("value"))
    val qs = Seq(0.5, 0.9, 0.99)
    val approx = quantilesByGroup(ev, Seq("event_type"), "value", qs, relativeError)
    val long1 = approx.select(col("event_type"), lit(0.5).as("q"), col("p50").as("v"))
      .unionByName(approx.select(col("event_type"), lit(0.9).as("q"), col("p90").as("v")))
      .unionByName(approx.select(col("event_type"), lit(0.99).as("q"), col("p99").as("v")))
    val n = ev.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    // true rank interval of the returned value: [#{x < v}, #{x <= v}]
    val ranks = long1.join(ev, Seq("event_type"))
      .groupBy(col("event_type"), col("q"), col("v"))
      .agg(sum(when(col("value") < col("v"), 1L).otherwise(0L)).as("r_lo"),
        sum(when(col("value") <= col("v"), 1L).otherwise(0L)).as("r_hi"))
      .join(n, Seq("event_type"))
    ranks.select(
      (col("q") * col("n")).as("target"),
      col("r_lo").cast("double").as("r_lo"), col("r_hi").cast("double").as("r_hi"),
      (lit(relativeError) * col("n") + lit(1.0)).as("budget"))
      .agg(min(when(col("target") >= col("r_lo") - col("budget") &&
        col("target") <= col("r_hi") + col("budget"), 1).otherwise(0)).as("pass"))
  }

  /** Heavy-hitter tokens per source over the documents table — the
    * skew-discovery shape (finding the hot keys a salting strategy
    * needs is itself a heavy-hitters query over the join column).
    * Gate-scale vocabularies sit far below the purge threshold, so
    * every estimate is exact and the key hash-matches the exact
    * frequency oracle (the coupon-regime argument, frequency
    * edition; saturated-regime behavior is spec-pinned with planted
    * Zipf data).
    */
  def heavyHitterTokens(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val toks = graft.Tables.documents(spark, dir)
      .select(col("source"), explode(split(col("text"), " ")).as("token"))
    heavyHitters(toks, Seq("source"), "token", k)
      .select(col("source"), col("item").as("token"),
        col("estimate").as("n_occurrences"))
      .orderBy(col("source"), col("n_occurrences").desc, col("token"))
  }

  /** Heavy-hitters honesty gate: 1 iff every reported item's TRUE
    * count sits inside its reported [lower, upper] envelope — the
    * sketch's deterministic guarantee, verified against the exact
    * counts rather than assumed. Travels to the saturated regime
    * where oracle-exactness doesn't.
    */
  def heavyHittersGate(spark: SparkSession, dir: String): DataFrame = {
    val toks = graft.Tables.documents(spark, dir)
      .select(col("source"), explode(split(col("text"), " ")).as("token"))
    val reported = heavyHitters(toks, Seq("source"), "token", 0)
      .withColumnRenamed("item", "token")
    val exact = toks.groupBy(col("source"), col("token"))
      .agg(count(lit(1)).as("n"))
    reported.join(exact, Seq("source", "token"))
      .agg((min((col("lower") <= col("n") && col("n") <= col("upper"))
        .cast("int")) === 1 && count(lit(1)) > 0).cast("int").as("pass"))
  }

  /** Self-measured honesty gate: 1 row, pass = 1 iff EVERY group's
    * sketch estimate is within 3σ (σ = 1.04/√2^lgK) of the exact
    * distinct count AND the all-time rollup of the per-day sketches
    * equals the direct all-time sketch (mergeability). Runs at any
    * scale; the oracle-exactness of [[distinctUsersDaily]] does not.
    */
  def distinctGate(spark: SparkSession, dir: String,
                   lgK: Int = DefaultLgK): DataFrame = {
    val ev = graft.Tables.events(spark, dir)
      .withColumn("d", unix_timestamp(date_trunc("day", col("ts"))))
    val sketches = sketchByGroup(ev, Seq("event_type", "d"), "user_id", lgK)
    val approx = sketches.select(col("event_type"), col("d"),
      hll_sketch_estimate(col("sketch")).as("approx"))
    val exact = ev.groupBy(col("event_type"), col("d"))
      .agg(countDistinct(col("user_id")).as("exact"))
    val bound = 3.0 * 1.04 / math.sqrt(math.pow(2.0, lgK))
    val relErrs = approx.join(exact, Seq("event_type", "d"))
      .select(lit("rel_err").as("metric"),
        (abs(col("approx") - col("exact")) /
          greatest(col("exact"), lit(1L))).as("v"))
    val rolled = rollup(sketches, Seq("event_type"))
      .withColumnRenamed("n_distinct", "rolled")
    val direct = distinctByGroup(ev, Seq("event_type"), "user_id", lgK)
      .withColumnRenamed("n_distinct", "direct")
    val gaps = rolled.join(direct, Seq("event_type"))
      .select(lit("merge_gap").as("metric"),
        abs(col("rolled") - col("direct")).cast("double").as("v"))
    // both checks fold through ONE global aggregate over the tagged
    // union — no cross join of scalar frames (the plan-guard shape)
    relErrs.unionByName(gaps).agg(
      (max(when(col("metric") === "rel_err", col("v"))) <= bound &&
        max(when(col("metric") === "merge_gap", col("v"))) === 0.0)
        .cast("int").as("pass"))
  }
}
