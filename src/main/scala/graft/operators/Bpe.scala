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
    // the corpus-sized step: word frequencies (one explode + count)
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
    * its alphabet and replays the merges in rank order — pure map-side
    * (the merge table compiles into a static chain of `numMerges`
    * folds; no join, no shuffle), emitting one (doc_id, pos, piece)
    * row per subword token. `merges` must be a BOUNDED learned table
    * (it collects — tokenizer merge tables are ≤ ~100k rows by
    * construction).
    */
  def encode(docs: DataFrame, merges: DataFrame): DataFrame = {
    val ms = merges.select(col("rank"), col("left"), col("right"))
      .collect().sortBy(_.getAs[Long]("rank"))
      .map(r => (r.getAs[String]("left"), r.getAs[String]("right")))
    val sym = ms.foldLeft(initialSymbols(col("word"))) {
      case (acc, (l, r)) => applyMerge(acc, l, r)
    }
    docs
      .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("word_pos", "word")))
      .select(col("doc_id"), col("word_pos"), posexplode(sym).as(Seq("piece_pos", "piece")))
      .select(col("doc_id"),
        (col("word_pos").cast("long")).as("word_pos"),
        col("piece_pos").cast("long").as("piece_pos"), col("piece"))
  }
}
