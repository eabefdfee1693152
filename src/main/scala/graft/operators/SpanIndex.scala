package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Stored span-gram index — the [[ExactIndex]] posture for the span
  * family: a crawl pipeline dedups INCREMENTALLY, so incoming batches
  * must flag spans repeated against the ACCUMULATED corpus without
  * rescanning it ([[TextAnalysis.spanDedup]] is the one-shot
  * within-corpus form). The index is the DISTINCT gram set —
  * `<name>_grams` (gram_md5), bucketed — plus a one-row
  * `<name>_spanmeta` carrying the gram size and bucket count (flag
  * and append must gram at the STORED n; mixed-n grams never match).
  *
  * GROWING-table append posture, not the bounded-frame rewrite: the
  * gram set grows with the corpus (unbounded, unlike the days×models
  * count tables), so a per-batch generation-flip rewrite would cost
  * O(index) per append. Instead [[appendToIndex]] anti-joins the
  * batch's distinct grams against the stored set (bucketed — the
  * stored side reads shuffle-free) and FILE-APPENDS only the truly
  * new ones: cost ∝ batch, replays no-op STRUCTURALLY (an absorbed
  * gram anti-joins away — no batch-id bookkeeping, the
  * [[ExactIndex.append]] idempotence), and file accumulation is
  * [[maintainIndex]]'s threshold compaction
  * ([[Dedup.maintainNgramLshIndex]]'s loop). Flag correctness is
  * duplicate-tolerant anyway (regions derive from min/max per
  * coalesced run, so a duplicated hit position changes nothing).
  *
  * The ingest loop per batch: [[flagAgainstIndex]] /
  * [[applyAgainstIndex]] (read-only — spans covered by grams ALREADY
  * IN the index, so a doc never matches its own grams), then the
  * append folds the batch in. Cross-corpus semantics: a gram is
  * "known" once ANY indexed document contains it; the within-batch
  * repetition question stays [[TextAnalysis.spanDedup]]'s.
  *
  * RETRACTION (r17): the gram set alone cannot know when a gram's
  * last contributor leaves, so the index carries a doc→grams
  * companion — `<name>_spandocs` (doc_id, grams), one row per
  * indexed doc, bucketed on doc_id like [[Dedup]]'s LSH grams
  * table — and [[deleteFromIndex]] removes exactly the grams whose
  * remaining contributors are all retracted ([[Dedup
  * .deleteFromNgramLshIndex]]'s takedown/opt-out lifecycle step).
  * The companion also upgrades append idempotence from gram grain to
  * DOC grain: already-indexed doc_ids anti-join away first, so a
  * redelivered batch re-grams nothing.
  */
object SpanIndex {

  /** The distinct gram set of a corpus — one partial-agg distinct
    * over the positioned gram fan-out (canonical-keyed when the index
    * was written that way).
    */
  private def gramSet(docs: DataFrame, n: Int, canonical: Boolean,
                      routed: Boolean = false, minLossFs: Long = 0L): DataFrame =
    TextAnalysis.gramFrame(TextAnalysis.maybeKeyed(docs, canonical, routed, minLossFs), n)
      .select(col("gram_md5")).distinct()

  /** Per-doc distinct gram arrays — the `<name>_spandocs` companion
    * row shape. Every appended doc gets a row even when all its grams
    * were already indexed: retraction of a gram's FIRST contributor
    * must not remove what a later contributor still holds.
    */
  private def docGrams(docs: DataFrame, n: Int, canonical: Boolean,
                       routed: Boolean = false, minLossFs: Long = 0L): DataFrame =
    TextAnalysis.gramFrame(TextAnalysis.maybeKeyed(docs, canonical, routed, minLossFs), n)
      .groupBy(col("doc_id")).agg(collect_set(col("gram_md5")).as("grams"))

  /** Create/replace the index from a seed corpus (possibly empty — a
    * pure-streaming index starts from `docs.limit(0)`). Replacement
    * of a compaction-flipped table stages a new generation
    * ([[graft.sources.Sinks.replaceBucketed]]). `canonical` is an
    * INDEX property, not a per-call choice: it rides the meta so
    * append/flag/apply always gram in the same key domain — a
    * raw-keyed probe of a canonical index (or vice versa) would
    * silently never match.
    */
  def writeIndex(spark: SparkSession, name: String, docs: DataFrame,
                 n: Int = 8, buckets: Int = 16, canonical: Boolean = false,
                 routed: Boolean = false, minLossFs: Long = 0L): Unit = {
    require(n >= 2, s"need gram size ≥ 2, got $n")
    require(minLossFs == 0L || routed,
      s"minLossFs applies only to routed keying (got minLossFs = $minLossFs)")
    graft.sources.Sinks.replaceBucketed(spark, gramSet(docs, n, canonical, routed, minLossFs),
      s"${name}_grams", Seq("gram_md5"), buckets)
    graft.sources.Sinks.replaceBucketed(spark, docGrams(docs, n, canonical, routed, minLossFs),
      s"${name}_spandocs", Seq("doc_id"), buckets)
    import spark.implicits._
    Seq((n, buckets, canonical, routed, minLossFs))
      .toDF("gram_n", "buckets", "canon", "routed", "min_loss_fs")
      .write.mode("overwrite").saveAsTable(s"${name}_spanmeta")
  }

  private def meta(spark: SparkSession, name: String): (Int, Int, Boolean, Boolean, Long) = {
    val df = spark.table(s"${name}_spanmeta")
    val rows = df.collect()
    require(rows.length == 1, s"span index $name: corrupt meta (${rows.length} rows)")
    // legacy metas decode to what they stored: pre-canonical as
    // raw-keyed, pre-routed to their canon flag, pre-floor (r20) to
    // floor 0
    val canon = df.columns.contains("canon") && rows(0).getAs[Boolean]("canon")
    val routed = df.columns.contains("routed") && rows(0).getAs[Boolean]("routed")
    val floor =
      if (df.columns.contains("min_loss_fs")) rows(0).getAs[Long]("min_loss_fs") else 0L
    (rows(0).getAs[Int]("gram_n"), rows(0).getAs[Int]("buckets"), canon, routed, floor)
  }

  private def refresh(spark: SparkSession, name: String): Unit = {
    StoredTable.refresh(spark, s"${name}_grams", s"${name}_spanmeta")
    if (spark.catalog.tableExists(s"${name}_spandocs"))
      spark.catalog.refreshTable(s"${name}_spandocs")
  }

  /** Fold one batch of documents in — docs not yet indexed gram once
    * (one doc_id anti-join against the bucketed companion, shuffle-
    * free on the stored side), their truly-new grams file-append to
    * the gram set and their doc→grams rows to the companion; cost
    * ∝ batch, never ∝ index, and redelivered batches no-op at DOC
    * grain without bookkeeping.
    *
    * Write order is load-bearing: `_grams` FIRST. A failure between
    * the two appends replays with the doc still "fresh" (no companion
    * row yet) — its re-appended grams anti-join away and the
    * companion row lands. The reverse order would mark the doc
    * indexed while its grams never reached the gram set, silently
    * un-flaggable forever.
    *
    * LEGACY indexes (written before the companion existed) upgrade in
    * place on first append: a missing `_spandocs` is created empty,
    * so already-indexed legacy docs keep their gram-grain idempotence
    * (their re-appended grams anti-join away; they simply have no
    * companion row, so they can't be retracted) while every doc
    * appended from here on gets the full doc-grain treatment — the
    * same tolerate-the-past posture as the meta `canon` decode and
    * [[refresh]].
    */
  def appendToIndex(spark: SparkSession, name: String, batch: DataFrame): Unit = {
    refresh(spark, name)
    val (n, buckets, canon, routed, floor) = meta(spark, name)
    if (!spark.catalog.tableExists(s"${name}_spandocs"))
      graft.sources.Sinks.replaceBucketed(spark,
        docGrams(batch.limit(0), n, canon, routed, floor),
        s"${name}_spandocs", Seq("doc_id"), buckets)
    val fresh = batch
      .join(spark.table(s"${name}_spandocs").select(col("doc_id")), Seq("doc_id"), "left_anti")
    // localCheckpoint (eager): the frame reads the companion table
    // the second write inserts into — detach before writing (the
    // ExactIndex cached-plan-re-materializes-empty lesson)
    val dg = docGrams(fresh, n, canon, routed, floor).localCheckpoint()
    dg.select(explode(col("grams")).as("gram_md5")).distinct()
      .join(spark.table(s"${name}_grams"), Seq("gram_md5"), "left_anti")
      .write.mode(SaveMode.Append)
      .bucketBy(buckets, "gram_md5").sortBy("gram_md5").format("parquet")
      .saveAsTable(s"${name}_grams")
    dg.write.mode(SaveMode.Append)
      .bucketBy(buckets, "doc_id").sortBy("doc_id").format("parquet")
      .saveAsTable(s"${name}_spandocs")
  }

  /** RETRACT documents from the index — takedowns, opt-outs, licence
    * retractions must stop flagging future batches, and the gram set
    * alone cannot know when a gram's LAST contributor left. Removes
    * exactly the grams every remaining contributor of which is
    * retracted: the retracted docs' gram union minus the grams any
    * surviving companion row still holds. Both tables then rewrite
    * in place (zero-shuffle per-bucket passes, so a delete pass IS a
    * compaction pass; retries idempotent — deleting absent doc_ids
    * no-ops).
    *
    * Contract ([[Dedup.deleteFromNgramLshIndex]]'s): `docIds` is a
    * bounded retraction list, broadcast to every task, and the
    * retracted docs' gram union is broadcast-sized too (∝ retraction
    * list, not index). A retraction too large to broadcast is a
    * rebuild ([[writeIndex]] over the surviving corpus), not a
    * delete. Cost: one companion scan + two bucket rewrites
    * (∝ index size, zero shuffle) regardless of |docIds| — batch
    * retractions and run one pass.
    */
  def deleteFromIndex(spark: SparkSession, name: String, docIds: DataFrame): Unit = {
    import graft.sources.Sinks
    refresh(spark, name)
    // no companion, no last-contributor accounting: a legacy index
    // can only retract by rebuilding over the surviving corpus
    require(spark.catalog.tableExists(s"${name}_spandocs"),
      s"span index $name has no doc→grams companion (pre-retraction index): " +
        "rebuild via writeIndex to enable retraction")
    val (_, buckets, _, _, _) = meta(spark, name)
    val ids = broadcast(docIds.select(col("doc_id")).distinct())
    val spandocs = spark.table(s"${name}_spandocs")
    val retractedGrams = broadcast(
      spandocs.join(ids, Seq("doc_id"), "left_semi")
        .select(explode(col("grams")).as("gram_md5")).distinct())
    // grams a SURVIVING doc still contributes stay in the index
    val stillHeld = spandocs.join(ids, Seq("doc_id"), "left_anti")
      .select(explode(col("grams")).as("gram_md5"))
      .join(retractedGrams, Seq("gram_md5"), "left_semi").distinct()
    // checkpoint INSIDE the hint: the truncation materializes the set
    // once (both rewrites reuse it), and the broadcast marker must
    // survive it so the per-bucket rewrite's anti-join stays local
    val removable = broadcast(
      retractedGrams.join(stillHeld, Seq("gram_md5"), "left_anti").localCheckpoint())
    Sinks.rewriteBucketed(spark, s"${name}_grams", Seq("gram_md5"), buckets,
      df => df.join(removable, Seq("gram_md5"), "left_anti"))
    Sinks.rewriteBucketed(spark, s"${name}_spandocs", Seq("doc_id"), buckets,
      df => df.join(ids, Seq("doc_id"), "left_anti"))
  }

  /** ONE ingest-maintenance step: append the batch, then compact the
    * gram table back to one file per bucket when appends have
    * fragmented any bucket past `maxFilesPerBucket` (the
    * [[Dedup.maintainNgramLshIndex]] loop). Returns true iff the
    * compaction ran.
    */
  def maintainIndex(spark: SparkSession, name: String, batch: DataFrame,
                    maxFilesPerBucket: Int = 16): Boolean = {
    appendToIndex(spark, name, batch)
    val (_, buckets, _, _, _) = meta(spark, name)
    val files = spark.table(s"${name}_grams").inputFiles.length
    val fires = files > buckets.toLong * maxFilesPerBucket
    if (fires) {
      graft.sources.Sinks.compactBucketed(spark, s"${name}_grams", Seq("gram_md5"), buckets)
      graft.sources.Sinks.compactBucketed(spark, s"${name}_spandocs", Seq("doc_id"), buckets)
    }
    fires
  }

  /** Per-doc accounting of the batch's spans already present in the
    * stored corpus — [[TextAnalysis.spanDedup]]'s output shape
    * (n_tokens / n_spans / dup_tokens / kept_tokens), `dup_tokens`
    * counting tokens covered by runs of INDEX-known grams at least
    * `minSpanTokens` long. On a canonical index the whole frame —
    * token counts included — lives in the canonical stream (regions
    * are canonical-coordinate intervals; mixing them with raw token
    * counts would mis-account).
    */
  def flagAgainstIndex(spark: SparkSession, name: String, batch: DataFrame,
                       minSpanTokens: Int = 16): DataFrame = {
    val (b, regions) = batchRegions(spark, name, batch, minSpanTokens)
    TextAnalysis.spanAccounting(b, regions)
  }

  /** The rewrite against the stored corpus — [[flagAgainstIndex]]'s
    * accounting turned into clean text ([[TextAnalysis.spanDedupApply]]'s
    * output shape: n_tokens / n_kept / clean_md5), dropping every
    * token covered by an index-known span. The incremental curation
    * step: flag, rewrite, THEN fold the batch in. On a canonical
    * index the rewrite ships the canonical stream (the C4/RefinedWeb
    * posture: the normalized text is what the pipeline dedups and
    * ships).
    */
  def applyAgainstIndex(spark: SparkSession, name: String, batch: DataFrame,
                        minSpanTokens: Int = 16): DataFrame = {
    val (b, regions) = batchRegions(spark, name, batch, minSpanTokens)
    TextAnalysis.spanRewrite(b, regions)
  }

  /** Coverage regions of a batch against the stored gram set — ONE
    * equi-join (stored side bucketed on the join key) plus the shared
    * gap-trick coalescing. Returns the batch in the index's key
    * domain alongside, so accounting/rewrite tails stay coordinate-
    * consistent with the regions.
    */
  private def batchRegions(spark: SparkSession, name: String, batch: DataFrame,
                           minSpanTokens: Int): (DataFrame, DataFrame) = {
    refresh(spark, name)
    val (n, _, canon, routed, floor) = meta(spark, name)
    require(minSpanTokens >= n, s"minSpanTokens ≥ n required, got $minSpanTokens < $n")
    val b = TextAnalysis.maybeKeyed(batch, canon, routed, floor)
    val hits = TextAnalysis.gramFrame(b, n)
      .join(spark.table(s"${name}_grams"), Seq("gram_md5"))
    (b, TextAnalysis.coalesceRegions(hits, n, minSpanTokens))
  }
}
