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
  */
object SpanIndex {

  /** The distinct gram set of a corpus — one partial-agg distinct
    * over the positioned gram fan-out (canonical-keyed when the index
    * was written that way).
    */
  private def gramSet(docs: DataFrame, n: Int, canonical: Boolean): DataFrame =
    TextAnalysis.gramFrame(TextAnalysis.maybeCanon(docs, canonical), n)
      .select(col("gram_md5")).distinct()

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
                 n: Int = 8, buckets: Int = 16, canonical: Boolean = false): Unit = {
    require(n >= 2, s"need gram size ≥ 2, got $n")
    graft.sources.Sinks.replaceBucketed(spark, gramSet(docs, n, canonical),
      s"${name}_grams", Seq("gram_md5"), buckets)
    import spark.implicits._
    Seq((n, buckets, canonical)).toDF("gram_n", "buckets", "canon")
      .write.mode("overwrite").saveAsTable(s"${name}_spanmeta")
  }

  private def meta(spark: SparkSession, name: String): (Int, Int, Boolean) = {
    val df = spark.table(s"${name}_spanmeta")
    val rows = df.collect()
    require(rows.length == 1, s"span index $name: corrupt meta (${rows.length} rows)")
    // legacy metas (pre-canonical) decode as raw-keyed
    val canon = df.columns.contains("canon") && rows(0).getAs[Boolean]("canon")
    (rows(0).getAs[Int]("gram_n"), rows(0).getAs[Int]("buckets"), canon)
  }

  private def refresh(spark: SparkSession, name: String): Unit =
    StoredTable.refresh(spark, s"${name}_grams", s"${name}_spanmeta")

  /** Fold one batch of documents in — only grams NOT yet indexed
    * append (one anti-join against the bucketed stored side + a
    * file-level bucketed append; cost ∝ batch, never ∝ index), so
    * redelivered batches no-op without bookkeeping.
    */
  def appendToIndex(spark: SparkSession, name: String, batch: DataFrame): Unit = {
    refresh(spark, name)
    val (n, buckets, canon) = meta(spark, name)
    gramSet(batch, n, canon)
      .join(spark.table(s"${name}_grams"), Seq("gram_md5"), "left_anti")
      .write.mode(SaveMode.Append)
      .bucketBy(buckets, "gram_md5").sortBy("gram_md5").format("parquet")
      .saveAsTable(s"${name}_grams")
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
    val (_, buckets, _) = meta(spark, name)
    val files = spark.table(s"${name}_grams").inputFiles.length
    val fires = files > buckets.toLong * maxFilesPerBucket
    if (fires)
      graft.sources.Sinks.compactBucketed(spark, s"${name}_grams", Seq("gram_md5"), buckets)
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
    val (n, _, canon) = meta(spark, name)
    require(minSpanTokens >= n, s"minSpanTokens ≥ n required, got $minSpanTokens < $n")
    val b = TextAnalysis.maybeCanon(batch, canon)
    val hits = TextAnalysis.gramFrame(b, n)
      .join(spark.table(s"${name}_grams"), Seq("gram_md5"))
    (b, TextAnalysis.coalesceRegions(hits, n, minSpanTokens))
  }
}
