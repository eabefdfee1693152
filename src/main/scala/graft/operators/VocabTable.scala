package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stored corpus vocabulary — [[TextAnalysis.vocabulary]]'s
  * (token, doc_freq, total_count) frame in the [[CountTable]]
  * additive posture, so the expensive artifact every tokenizer /
  * IDF / stopword pipeline derives from accrues INCREMENTALLY
  * instead of rescanning the corpus per run (the gap the
  * LSH/IVF/sketch/cohort tiers already closed for their artifacts).
  *
  * Additivity contract: batches partition the corpus at WHOLE-DOC
  * grain — a document appears in exactly one batch, so per-batch
  * `count(DISTINCT doc_id)` contributions to doc_freq sum exactly
  * (same whole-grain batch contract as the window-within-grain count
  * tables). Replay safety is [[CountTable.append]]'s stamp: pass the
  * foreachBatch id and a redelivered batch no-ops.
  *
  * The drift rule: [[oovReport]] measures an incoming batch's
  * out-of-vocabulary token-occurrence rate against the STORED frame
  * (one anti-join probing the token-bucketed table — zero raw
  * corpus touched), and [[vocabNeedsRetrain]] thresholds it — the
  * signal that a BPE tokenizer trained on the stored vocabulary
  * ([[Bpe.train]] consumes exactly this word×count shape) has
  * drifted off the corpus and should retrain. Mirrors
  * [[Similarity.ivfDriftReport]] / [[Cohort.driftReport]]: cheap
  * report per batch, expensive rebuild only when the rule fires.
  */
object VocabTable {

  /** Create/overwrite `<name>_counts` + meta from a seed corpus.
    * `ws = true` (r19) builds the vocabulary with the
    * whitespace-ROBUST tokenizer ([[TextAnalysis.vocabTokens]]) — and
    * the mode is RECORDED in `<name>_vocabmeta`, so every later
    * append / OOV probe / stored-IDF score / encode tokenizes the
    * SAME way automatically: a stored vocabulary can never silently
    * mix tokenizations across ingests (the span/LSH/exact indexes'
    * meta-flag discipline, vocabulary edition).
    */
  def writeVocabTable(spark: SparkSession, name: String, docs: DataFrame,
                      buckets: Int = 16, ws: Boolean = false): Unit = {
    // meta BEFORE counts (r20 ADVICE): a failure between the two
    // steps must not leave a ws counts table with no meta — that
    // state decodes as legacy naive, so the first append would mix
    // tokenizations, the exact failure the recorded mode exists to
    // prevent. A meta with no counts is harmless (the counts write
    // below re-runs, or the table reads as absent).
    writeTokenizerMeta(spark, name, ws)
    CountTable.write(spark, name, TextAnalysis.vocabulary(docs, ws),
      Seq("token"), Seq("doc_freq", "total_count"), buckets)
  }

  private def writeTokenizerMeta(spark: SparkSession, name: String, ws: Boolean): Unit = {
    import spark.implicits._
    Seq(ws).toDF("ws_tokens")
      .write.mode("overwrite").saveAsTable(s"${name}_vocabmeta")
  }

  /** The table's RECORDED tokenizer mode. LEGACY tables (written
    * before the mode meta existed) carry no `<name>_vocabmeta` and
    * decode as the naive single-space tokenizer they were built with.
    * A meta table that EXISTS but is empty (a partially failed
    * overwrite) raises a descriptive error instead of an index crash
    * or a silent naive fallback — guessing a mode here could mix
    * tokenizations in the very store the meta protects; repair by
    * re-running [[writeVocabTable]] with the intended mode.
    */
  def tokenizerMode(spark: SparkSession, name: String): Boolean =
    if (!spark.catalog.tableExists(s"${name}_vocabmeta")) false
    else {
      spark.catalog.refreshTable(s"${name}_vocabmeta")
      spark.table(s"${name}_vocabmeta").collect().headOption match {
        case Some(row) => row.getAs[Boolean]("ws_tokens")
        case None => throw new IllegalStateException(
          s"${name}_vocabmeta exists but is empty (a partially failed write) — " +
            s"re-run writeVocabTable('$name', ws = <intended mode>) before " +
            "reading or appending; falling back to a guessed mode could " +
            "silently mix tokenizations in the stored vocabulary")
      }
    }

  /** Sum one whole-doc batch in ([[CountTable.append]]'s stamped
    * merge — `batchId >= 0` makes replays no-op). The batch tokenizes
    * with the STORED mode ([[tokenizerMode]] — no flag to get wrong);
    * a legacy table upgrades in place by materializing its implicit
    * naive mode on first append.
    */
  def appendToVocabTable(spark: SparkSession, name: String, batch: DataFrame,
                         batchId: Long = -1L): Unit = {
    val ws = tokenizerMode(spark, name)
    if (!spark.catalog.tableExists(s"${name}_vocabmeta"))
      writeTokenizerMeta(spark, name, ws)
    CountTable.append(spark, name, TextAnalysis.vocabulary(batch, ws), batchId)
  }

  /** The vocabulary from the STORED counts alone — byte-identical to
    * [[TextAnalysis.vocabulary]] over the union of everything written
    * and appended (counts are exact, not sketched), zero raw data
    * touched.
    */
  def vocabularyFromTable(spark: SparkSession, name: String): DataFrame =
    CountTable.read(spark, name).orderBy(col("token"))

  /** One row: the batch's token-occurrence OOV rate vs the stored
    * vocabulary — `n_tokens` occurrences in the batch, `n_oov` of
    * them under tokens the store has never seen, and the fixed-point
    * rate `oov_fs = floor(1e4 · n_oov / n_tokens)` (0 for an empty
    * batch). One explode + one (partial-agg) token groupBy on the
    * batch side, anti-joined against the token-bucketed stored side —
    * cost ∝ batch vocabulary, never corpus.
    */
  def oovReport(spark: SparkSession, name: String, batch: DataFrame): DataFrame = {
    val batchCounts = batch
      .select(explode(
        TextAnalysis.vocabTokens(col("text"), tokenizerMode(spark, name))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
    val oov = batchCounts
      .join(CountTable.read(spark, name).select(col("token")), Seq("token"), "left_anti")
    batchCounts.agg(coalesce(sum(col("n")), lit(0L)).as("n_tokens"))
      .crossJoin(oov.agg(coalesce(sum(col("n")), lit(0L)).as("n_oov")))
      .select(col("n_tokens"), col("n_oov"),
        when(col("n_tokens") > 0,
          floor(lit(10000.0) * col("n_oov") / col("n_tokens")))
          .otherwise(lit(0L)).as("oov_fs"))
  }

  /** The documented retrain trigger: fires when a batch's OOV
    * occurrence rate exceeds `maxOovFs` (fixed-point, default 5% —
    * the point where a frozen tokenizer's unk/byte-fallback rate
    * starts distorting training mixtures). The caller's retrain is
    * [[Bpe.train]] over [[vocabularyFromTable]]'s word counts —
    * stored frame in, no corpus rescan.
    */
  def vocabNeedsRetrain(spark: SparkSession, name: String, batch: DataFrame,
                        maxOovFs: Long = 500L): Boolean =
    oovReport(spark, name, batch).collect()(0).getAs[Long]("oov_fs") > maxOovFs

  /** [[TextAnalysis.tfidfTopK]] with the document-frequency side
    * answered from the STORED vocabulary — score a batch against a
    * FROZEN IDF with zero corpus rescan (the production shape: the
    * corpus-wide df is the expensive artifact, per-batch term
    * frequencies are cheap). Identical output to the one-shot over
    * the corpus the store summarizes, and a BETTER plan: the one-shot
    * derives df from its own tf frame (a diamond it must persist),
    * while here df is one join against the token-BUCKETED counts
    * table — stored side shuffle-free, no cache. Tokens the store has
    * never seen score with df = 1, the rarest-possible ceiling (an
    * unseen token is by definition maximally informative);
    * [[oovReport]] is the companion signal that too much of a batch
    * is scoring at that ceiling and the store needs the batch folded
    * in.
    */
  def tfidfFromTable(spark: SparkSession, name: String, docs: DataFrame,
                     k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = docs.select(col("doc_id"), explode(
        TextAnalysis.vocabTokens(col("text"), tokenizerMode(spark, name))).as("token"))
      .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
    val dfreq = CountTable.read(spark, name).select(col("token"), col("doc_freq").as("df"))
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("score").desc, col("token"))
    tf.join(dfreq, Seq("token"), "left")
      .withColumn("score", expr("tf * 1000000 div coalesce(df, 1L)"))
      .withColumn("rnk", row_number().over(byDoc).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("doc_id"), col("rnk"), col("token"), col("score"))
      .orderBy(col("doc_id"), col("rnk"))
  }

  /** [[TextAnalysis.encodeTokens]] with the id table ranked from the
    * STORED vocabulary — the tokenizer's (token → id) map frozen over
    * the accrued corpus instead of recomputed per run, the id twin of
    * [[tfidfFromTable]]'s frozen IDF: new batches encode under STABLE
    * ids across ingests (ids only shift when the store's frequency
    * ranking does), with OOV → −1 as in the one-shot and
    * [[oovReport]] as the saturation signal.
    */
  def encodeFromTable(spark: SparkSession, name: String, docs: DataFrame,
                      vocabSize: Int = 1000): DataFrame =
    TextAnalysis.encodeWithVocab(docs, CountTable.read(spark, name), vocabSize,
      tokenizerMode(spark, name))

  /** The retrained-tokenizer artifact: `<name>_merges` in
    * [[Bpe.train]]'s output shape (rank, left, right, merged,
    * weight) — a bounded frame (merge count × tiny rows), plain
    * overwrite like the meta tables.
    */
  def writeMergesTable(spark: SparkSession, name: String, merges: DataFrame): Unit =
    merges.write.mode("overwrite").saveAsTable(s"${name}_merges")

  /** The stored merges in learned order — what [[Bpe.encode]]
    * consumes.
    */
  def mergesFromTable(spark: SparkSession, name: String): DataFrame = {
    spark.catalog.refreshTable(s"${name}_merges")
    spark.table(s"${name}_merges").orderBy(col("rank"))
  }

  /** The production merge budget when the caller doesn't name one:
    * each BPE merge mints exactly one new subword symbol, so the
    * budget scales with the stored vocabulary's word-type count —
    * types/4 covers the frequent-word core as whole-word merges while
    * the long tail stays compositional (the same
    * proportional-to-observed-types sizing SentencePiece/GPT-2-class
    * tokenizers use), floored at 256 (below that a retrain isn't a
    * usable tokenizer) and capped at 32768 (the GPT-2-scale ceiling —
    * past it the merge table grows without coverage gains and
    * [[Bpe.trainFromCounts]]'s driver pass outgrows its byte budget).
    * Exposed for callers sizing their own retrain.
    */
  def derivedNumMerges(nWordTypes: Long): Int =
    math.max(256L, math.min(32768L, nWordTypes / 4)).toInt

  /** ONE vocab-maintenance step — the append→drift→retrain loop a
    * corpus pipeline runs per batch ([[Dedup.maintainNgramLshIndex]]'s
    * shape with retraining as the heavy pass): measure the batch's
    * OOV rate against the stored vocabulary, fold the batch in
    * (stamped), and when the rule fired retrain the BPE merges from
    * the UPDATED stored counts into `<name>_merges` — zero corpus
    * rescan at any step. Returns true iff the retrain ran.
    *
    * Ordering is deliberate: drift measures BEFORE the append (a
    * batch is OOV relative to what the store knew when it arrived)
    * and the retrain runs AFTER, so the new merges cover the very
    * tokens that fired the rule.
    *
    * `batchId` is REQUIRED non-negative: replay safety is
    * [[CountTable.append]]'s stamp, and an unstamped append would
    * re-SUM a redelivered batch — silently double-counting
    * doc_freq/total_count and corrupting every stored-IDF score and
    * encode id derived from the table (the r17 ADVICE finding; the
    * stamp is what makes "a redelivered batch no-ops" true). With the
    * stamp, a replayed batch's OOV recomputes ≈ 0 and the append
    * no-ops — no bookkeeping beyond the id.
    *
    * `numMerges < 0` (the default) derives the retrain's merge budget
    * from the stored vocabulary via [[derivedNumMerges]] — the
    * production default; pass an explicit count to pin it (specs, or
    * a deployment with a fixed tokenizer size contract).
    */
  def maintainVocabTable(spark: SparkSession, name: String, batch: DataFrame,
                         batchId: Long, maxOovFs: Long = 500L,
                         numMerges: Int = -1): Boolean = {
    require(batchId >= 0L,
      s"maintainVocabTable needs a non-negative batchId (got $batchId): " +
        "the stamp is what makes a redelivered batch no-op instead of " +
        "double-counting the stored vocabulary")
    val fired = vocabNeedsRetrain(spark, name, batch, maxOovFs)
    appendToVocabTable(spark, name, batch, batchId)
    if (fired) {
      val vocab = vocabularyFromTable(spark, name)
      val merges = if (numMerges >= 0) numMerges else derivedNumMerges(vocab.count())
      writeMergesTable(spark, name, Bpe.trainFromCounts(
        vocab.select(col("token").as("word"), col("total_count").as("weight")),
        merges))
    }
    fired
  }
}
