package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokens

/** Distributed byte-pair-encoding (BPE) merge training — the
  * tokenizer-learning step of a training-data pipeline (Sennrich et
  * al. 2016), run the way production BPE trainers actually run: over
  * the WORD-FREQUENCY table, not the corpus. One corpus-sized explode
  * + partial-agg count reduces 100 TB of text to a vocabulary-sized
  * (word, weight) frame, and every merge round after that touches only
  * that frame — pair counting is a slim partial-agged groupBy, the
  * arg-max is a 1-row driver decision (the same bounded collect shape
  * as a Lloyd round's k×dim centroids), and the merge applies as a
  * codegen'd higher-order fold over each word's symbol array. Rounds
  * localCheckpoint the symbol frame so the plan never deepens with the
  * merge count (the CC lineage-truncation lesson).
  *
  * Greedy-left application semantics: a merged symbol cannot re-merge
  * with the unit it just consumed in the SAME round ("aaa" under
  * (a,a) → [aa, a], not [aa, aa]) — the fold's accumulator-last check
  * gives exactly left-to-right greedy pairing. Ties on pair weight
  * break lexicographically, so the learned table is deterministic
  * across runs, partitionings, and engines.
  */
object Bpe {

  /** End-of-word marker — distinguishes "est</w>" (suffix) from
    * "est" (infix), the standard word-level BPE alphabet extension.
    */
  val EndOfWord = "</w>"

  /** Vocabulary-size ceiling for broadcasting the encoded vocab in
    * [[encode]] — ~1M words × (word + pieces) ≈ low-hundreds of MB,
    * comfortably under executor broadcast budgets; larger vocabs take
    * the shuffle join.
    */
  val MaxBroadcastVocab: Long = 1L << 20

  private def initialSymbols(word: Column): Column =
    concat(split(word, ""), array(lit(EndOfWord)))

  /** Greedy-left application of ONE merge (x, y) → xy to a symbol
    * array, as a pure fold: append each symbol, except that a symbol
    * equal to `y` fuses with an accumulator tail equal to `x`.
    */
  private def applyMerge(syms: Column, x: String, y: String): Column =
    aggregate(syms, typedLit(Seq.empty[String]), (acc, s) =>
      when(size(acc) > 0 && element_at(acc, -1) === lit(x) && s === lit(y),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(x + y))))
        .otherwise(concat(acc, array(s))))

  /** Adjacent-pair weights over the symbolized word table: one explode
    * of (len − 1) pairs per DISTINCT word, weighted by word count —
    * the only shuffle a merge round pays, partial-agged to the pair
    * vocabulary.
    */
  private def pairWeights(words: DataFrame): DataFrame =
    words
      .select(col("weight"), explode(transform(
        sequence(lit(0), size(col("syms")) - 2),
        i => struct(element_at(col("syms"), i + 1).as("l"),
          element_at(col("syms"), i + 2).as("r")))).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("weight")).as("weight"))

  /** Learn `numMerges` BPE merges from the corpus. Returns the merge
    * table (rank, left, right, merged, weight) in learned order —
    * `rank` 1 is the first (highest-frequency) merge. Training stops
    * early when the best remaining pair's weight falls below
    * `minWeight` (degenerate tail merges carry no signal).
    */
  def train(docs: DataFrame, numMerges: Int = 10, minWeight: Long = 2L): DataFrame = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    val spark = docs.sparkSession
    import spark.implicits._
    // the corpus-sized step: word frequencies (one explode + count).
    // No Par.spread here: the groupBy's exchange already restores
    // parallelism, and the pre-exchange work is a slim partial agg
    // (A/B-measured: a spread repartition costs more than it saves)
    var words = docs
      .select(explode(tokens(col("text"))).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("weight"))
      .select(col("weight"), initialSymbols(col("word")).as("syms"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
    var rank = 1
    var done = false
    while (rank <= numMerges && !done) {
      // 1-row bounded collect: the global arg-max pair of this round
      val top = pairWeights(words)
        .orderBy(desc("weight"), col("l"), col("r"))
        .limit(1).collect()
      if (top.isEmpty || top(0).getAs[Long]("weight") < minWeight) done = true
      else {
        val (l, r, w) = (top(0).getAs[String]("l"), top(0).getAs[String]("r"),
          top(0).getAs[Long]("weight"))
        merges += ((rank, l, r, w))
        // localCheckpoint: constant-depth plan across rounds
        val next = words.select(col("weight"), applyMerge(col("syms"), l, r).as("syms"))
          .localCheckpoint()
        words.unpersist()
        words = next
        rank += 1
      }
    }
    words.unpersist()
    merges.toSeq.toDF("rank", "left", "right", "weight")
      .select(col("rank").cast("long").as("rank"), col("left"), col("right"),
        concat(col("left"), col("right")).as("merged"), col("weight"))
      .orderBy(col("rank"))
  }

  /** Encode a corpus with a learned merge table: every word splits to
    * its alphabet and replays the merges in rank order (the merge
    * table compiles into a static chain of `numMerges` folds),
    * emitting one (doc_id, pos, piece) row per subword token.
    * `merges` must be a BOUNDED learned table (it collects —
    * tokenizer merge tables are ≤ ~100k rows by construction).
    *
    * The fold chain runs once per DISTINCT word — the same
    * word-frequency-table insight [[train]] exploits: token instances
    * follow Zipf, so the corpus has orders of magnitude fewer
    * distinct words than instances, and paying the `numMerges`-deep
    * array fold per instance (the original formulation) made this
    * the single most expensive gate key (11.3 s/run at sf0.1 —
    * ~40 pieces-of-work per instance for an ~8700× instance/vocab
    * ratio). Encoding the vocabulary then joining instances back on
    * `word` cuts the fold volume by that ratio. The JOIN SIDE
    * matters: the vocab must be the BUILD side so the instance scan
    * stays parallel and map-side — left to the optimizer, the
    * file-scan side's tiny size estimate won the broadcast and AQE
    * coalesced the vocab stream side to ONE task carrying the whole
    * join + piece fan-out (measured 14.7 s single-threaded). The
    * vocab is usually broadcast-sized but not invariant-bounded
    * (web-scale corpora inflate distinct words with typos/URLs), so
    * the hint is sized by an explicit vocab count — a cheap
    * column-pruned distinct, the same bounded-driver-decision shape
    * as the merge-table collect; an over-budget vocab falls back to
    * the plain shuffle join (instance-side skew on stopwords is
    * AQE's skew-join case, and the fold volume stays vocab-sized).
    */
  def encode(docs: DataFrame, merges: DataFrame): DataFrame = {
    val ms = merges.select(col("rank"), col("left"), col("right"))
      .collect().sortBy(_.getAs[Long]("rank"))
      .map(r => (r.getAs[String]("left"), r.getAs[String]("right")))
    val sym = ms.foldLeft(initialSymbols(col("word"))) {
      case (acc, (l, r)) => applyMerge(acc, l, r)
    }
    // Par.spread on the fact leg: with a single-file corpus the scan
    // is ONE split, and since the vocab joins in as a broadcast there
    // is no exchange anywhere downstream to restore parallelism — the
    // whole join + piece fan-out would run in one task (measured
    // 14.7 s single-threaded at sf0.1 vs 0.7 s spread)
    val toks = Par.spread(docs)
      .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("word_pos", "word")))
    val vocab = toks.select(col("word")).distinct()
    val vocabEnc0 = vocab.select(col("word"), sym.as("syms"))
    val vocabEnc =
      if (vocab.count() <= MaxBroadcastVocab) broadcast(vocabEnc0) else vocabEnc0
    // posexplode_OUTER: plain posexplode makes Catalyst infer a
    // `size(syms) > 0` filter that pushes through the join and below
    // the vocab distinct — re-evaluating the whole merge fold per
    // token INSTANCE on that leg, the exact cost the vocab pass
    // exists to avoid (measured 4.6 s of the 5.8 s run). syms is
    // never empty (initialSymbols always appends EndOfWord) nor null
    // (inner join), so outer-explode output is identical.
    toks.join(vocabEnc, "word")
      .select(col("doc_id"), col("word_pos"), posexplode_outer(col("syms")).as(Seq("piece_pos", "piece")))
      .select(col("doc_id"),
        (col("word_pos").cast("long")).as("word_pos"),
        col("piece_pos").cast("long").as("piece_pos"), col("piece"))
  }
}
