package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stored span-gram index — the [[ExactIndex]] posture for the span
  * family: a crawl pipeline dedups INCREMENTALLY, so incoming batches
  * must flag spans repeated against the ACCUMULATED corpus without
  * rescanning it ([[TextAnalysis.spanDedup]] is the one-shot
  * within-corpus form). The index is the per-gram document-frequency
  * table — (gram_md5, n_docs) — which is an exact additive count
  * frame, so it lives in the [[CountTable]] lifecycle verbatim
  * (bucketed on gram_md5, generation-flipped, batch-id-stamped
  * exactly-once) plus a one-row `<name>_spanmeta` carrying the gram
  * size (flag and append must gram at the STORED n; mixed-n grams
  * never match).
  *
  * The ingest loop per batch: [[flagAgainstIndex]] (read-only — spans
  * of batch docs covered by grams ALREADY IN the index), then
  * [[appendToIndex]] folds the batch's grams in. Append batches must
  * carry each document exactly once (whole-doc batches — the
  * [[CountTable]] whole-grain contract applied to docs): per-gram
  * distinct-doc counts are additive across doc-disjoint batches.
  *
  * Scale shape: the index is gram-cardinality-bounded (distinct grams,
  * not gram instances); flag's only new wide work is ONE equi-join of
  * the batch's positioned grams against the bucketed stored side
  * (read shuffle-free from the bucket layout) plus the doc-window
  * coalescing — both batch-sized. Cross-corpus semantics: a gram is
  * "known" once ANY indexed document contains it (stored n_docs ≥ 1);
  * the within-batch repetition question stays [[TextAnalysis.spanDedup]]'s.
  */
object SpanIndex {

  /** The (gram_md5, n_docs) document-frequency frame of a corpus —
    * one partial-agg groupBy over the positioned gram fan-out.
    */
  private def gramCounts(docs: DataFrame, n: Int): DataFrame =
    TextAnalysis.gramFrame(docs, n)
      .groupBy(col("gram_md5"))
      .agg(countDistinct(col("doc_id")).as("n_docs"))

  /** Create/overwrite the index from a seed corpus (possibly empty —
    * a pure-streaming index starts from `docs.limit(0)`).
    */
  def writeIndex(spark: SparkSession, name: String, docs: DataFrame,
                 n: Int = 8, buckets: Int = 16): Unit = {
    require(n >= 2, s"need gram size ≥ 2, got $n")
    CountTable.write(spark, name, gramCounts(docs, n),
      Seq("gram_md5"), Seq("n_docs"), buckets)
    import spark.implicits._
    Seq(n).toDF("gram_n").write.mode("overwrite").saveAsTable(s"${name}_spanmeta")
  }

  private def gramN(spark: SparkSession, name: String): Int = {
    spark.catalog.refreshTable(s"${name}_spanmeta")
    val rows = spark.table(s"${name}_spanmeta").collect()
    require(rows.length == 1, s"span index $name: corrupt meta (${rows.length} rows)")
    rows(0).getAs[Int]("gram_n")
  }

  /** Fold one doc-disjoint batch of documents in — per-gram doc
    * frequencies SUM ([[CountTable.append]]'s atomic stamp makes
    * foreachBatch replays no-op).
    */
  def appendToIndex(spark: SparkSession, name: String, batch: DataFrame,
                    batchId: Long = -1L): Unit =
    CountTable.append(spark, name, gramCounts(batch, gramN(spark, name)), batchId)

  /** Per-doc accounting of the batch's spans already present in the
    * stored corpus — [[TextAnalysis.spanDedup]]'s output shape
    * (n_tokens / n_spans / dup_tokens / kept_tokens), `dup_tokens`
    * counting tokens covered by runs of INDEX-known grams at least
    * `minSpanTokens` long. Read-only: flag before append, so a doc
    * never matches its own grams.
    */
  def flagAgainstIndex(spark: SparkSession, name: String, batch: DataFrame,
                       minSpanTokens: Int = 16): DataFrame =
    TextAnalysis.spanAccounting(batch, indexRegions(spark, name, batch, minSpanTokens))

  /** The rewrite against the stored corpus — [[flagAgainstIndex]]'s
    * accounting turned into clean text ([[TextAnalysis.spanDedupApply]]'s
    * output shape: n_tokens / n_kept / clean_md5), dropping every
    * token covered by an index-known span. The incremental curation
    * step: flag, rewrite, THEN fold the batch in.
    */
  def applyAgainstIndex(spark: SparkSession, name: String, batch: DataFrame,
                        minSpanTokens: Int = 16): DataFrame =
    TextAnalysis.spanRewrite(batch, indexRegions(spark, name, batch, minSpanTokens))

  /** Coverage regions of a batch against the stored gram set — ONE
    * equi-join (stored side bucketed on the join key) plus the shared
    * gap-trick coalescing.
    */
  private def indexRegions(spark: SparkSession, name: String, batch: DataFrame,
                           minSpanTokens: Int): DataFrame = {
    val n = gramN(spark, name)
    require(minSpanTokens >= n, s"minSpanTokens ≥ n required, got $minSpanTokens < $n")
    val known = CountTable.read(spark, name).select(col("gram_md5"))
    val hits = TextAnalysis.gramFrame(batch, n).join(known, Seq("gram_md5"))
    TextAnalysis.coalesceRegions(hits, n, minSpanTokens)
  }
}
