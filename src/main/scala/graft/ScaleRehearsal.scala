package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Pipeline}

/** Scale rehearsal for the dedup/CC paths beyond the driver's sf0.1
  * corpus (TESTDATA.md caps at sf0.1, read-only): synthesizes a
  * document corpus 10–50× the bench scale ENTIRELY AS COLUMN
  * EXPRESSIONS over spark.range (no driver-side loops, no RNG state —
  * content is a pure function of doc_id, so runs are reproducible),
  * with the structures that stress the operators:
  *
  *  - a planted MEGA-CLUSTER (`megaN` identical docs → one LSH bucket
  *    per band, far past maxBucket → the triangle salting path);
  *  - near-dup CLUSTERS of 10 (each member mutates one token of its
  *    cluster base → unigram J ≈ 0.9, bigram J ≈ 0.93 — above both
  *    default verify thresholds);
  *  - a unique long tail.
  *
  * Runs minhash-LSH, ngram-LSH + greedy apply, both CC variants, and
  * the full curation pipeline, printing one JSON line of wall times
  * and result volumes (plus the expected planted truth, so the output
  * is self-checking). Results land in PERF.md.
  *
  *   tools/run.sh graft.ScaleRehearsal [nDocs] [outBase]
  */
object ScaleRehearsal {

  /** Deterministic synthetic corpus: docs 0..megaN-1 identical; in
    * each subsequent block of 1000, docs with rank < 10 form a
    * near-dup cluster of the block's base doc; the rest are unique.
    */
  def synthesize(spark: SparkSession, nDocs: Long, megaN: Int = 3000,
                 nTokens: Int = 60, vocab: Int = 20000): DataFrame = {
    val id = col("id")
    val rank = id % 1000
    val isMega = id < megaN
    val isCluster = !isMega && rank < 10
    // content seed: mega docs share one seed; cluster members share
    // their block base's seed; unique docs seed from their own id
    val seed = when(isMega, lit(-1L))
      .when(isCluster, id - rank)
      .otherwise(id)
    val toks = transform(sequence(lit(0), lit(nTokens - 1)), i =>
      concat(lit("w"), pmod(xxhash64(concat_ws("#", seed, i)), lit(vocab))))
    // cluster members (rank 1..9) mutate ONE token at position rank —
    // J_unigram ≈ 59/61, J_bigram ≈ 57/61, both above the 0.84/0.9
    // verify thresholds
    val mutated = zip_with(toks, sequence(lit(0), lit(nTokens - 1)), (t, i) =>
      when(isCluster && rank > 0 && i === rank, concat(lit("u"), id)).otherwise(t))
    spark.range(nDocs).select(
      id.as("doc_id"),
      array_join(mutated, " ").as("text"),
      lit("en").as("lang"),
      concat(lit("src"), pmod(id, lit(2))).as("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
  }

  def main(args: Array[String]): Unit = {
    val nDocs = args.lift(0).map(_.toLong).getOrElse(500000L)
    val outBase = args.lift(1).getOrElse("tmp/scale_rehearsal")
    val megaN = 3000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val corpusPath = s"$outBase/docs_$nDocs"
    synthesize(spark, nDocs, megaN).write.mode("overwrite").parquet(corpusPath)
    val docs = spark.read.parquet(corpusPath)

    def timed(phase: String)(body: => Long): (String, Double, Long) = {
      spark.sharedState.cacheManager.clearCache()
      val t0 = System.nanoTime()
      val volume = body
      val sec = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[rehearsal] $phase%-22s ${sec}%8.2f s  volume=$volume")
      (phase, sec, volume)
    }

    val results = Seq(
      timed("minhash_lsh")(Dedup.minhashLsh(docs).count()),
      timed("ngram_lsh_pairs")(Dedup.ngramLshPairs(docs).count()),
      timed("apply_lsh")(Dedup.applyPairs(docs, Dedup.ngramLshPairs(docs)).count()),
      timed("cc_converged")(Dedup.convergedCcLabels(docs, Dedup.ngramLshPairs(docs))
        .filter(col("doc_id") =!= col("rep_id")).count()),
      timed("cc_star")(Dedup.starCcLabels(docs, Dedup.ngramLshPairs(docs))
        .filter(col("doc_id") =!= col("rep_id")).count()),
      timed("pipeline_curate")(Pipeline.curate(docs).count())
    )

    // planted truth the volumes must be consistent with: the mega
    // block spans ids [0, megaN) — ⌈megaN/1000⌉ whole 1000-blocks
    // whose rank<10 docs are mega members, NOT near-dup clusters
    val megaPairs = megaN.toLong * (megaN - 1) / 2
    val nClusters = nDocs / 1000 - (megaN + 999) / 1000
    val clusterDropped = nClusters * 9 // 9 non-base members per cluster
    val expectDropped = clusterDropped + (megaN - 1)
    def fmt(v: Double) = String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    val phases = results.map { case (p, s, v) => s""""$p":{"sec":${fmt(s)},"volume":$v}""" }
      .mkString("{", ",", "}")
    println(s"""{"metric":"scale_rehearsal","n_docs":$nDocs,"mega_n":$megaN,""" +
      s""""expected_mega_pairs":$megaPairs,"expected_cc_merged":$expectDropped,""" +
      s""""phases":$phases,"cpus":"$cpus"}""")
    spark.stop()
  }
}
