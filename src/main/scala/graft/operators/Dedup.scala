package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.HashFunctions._
import graft.functions.TextFunctions._
import graft.functions.VectorFunctions._

/** Document deduplication for LLM-training-data pipelines: exact,
  * MinHash+LSH, SimHash, blocked n-gram Jaccard, blocked embedding
  * cosine.
  *
  * The 100-TB invariant for every near-dup variant here: candidate
  * pairs are generated ONLY through an equi-join on a bucket key
  * (LSH band hash, SimHash chunk, or a metadata block key) — never a
  * cross join. Pair volume is O(sum of bucket²), tunable via
  * bands/chunk-width/block granularity; the verify step (exact
  * Jaccard / hamming / cosine) runs only on candidates.
  */
object Dedup {

  /** Fixed-point Jaccard column: native one-pass expression when the
    * session has GraftExtensions, Column-pair fallback otherwise.
    * Both compute floor(10000.0 * (|A∩B| / |A∪B|)) bit-identically.
    */
  private def jaccardFs(spark: org.apache.spark.sql.SparkSession, a: Column, b: Column): Column =
    if (spark.catalog.functionExists("graft_jaccard_fs"))
      call_function("graft_jaccard_fs", a, b)
    else
      floor(lit(10000.0) * (size(array_intersect(a, b)).cast("double") / size(array_union(a, b))))

  /** Exact dedup via content hash: one hash-partitioned groupBy, the
    * cheapest possible shuffle (key = 32-byte digest, payload = count
    * + min id). `keep_id` = lowest doc_id is the canonical survivor.
    */
  def exact(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs.groupBy(md5(col(textCol)).as("h"))
      .agg(count(lit(1)).as("n_dups"), min(col(idCol)).as("keep_id"))
      .orderBy(col("h"))

  /** MinHash + LSH banding. Signature: `perms` min-hashes over word
    * shingles (unigrams by default — the corpus-appropriate shingle
    * for high-overlap vocab; pass n>1 for stricter shingling).
    * Candidates = pairs sharing ≥1 of `bands` band-hash buckets.
    * Output: candidate pairs with their exact unigram-set Jaccard for
    * downstream thresholding.
    */
  /** Band geometry default (4 bands × 8 rows) sets the LSH collision
    * curve at ≈ (1/b)^(1/r) ≈ 0.84 Jaccard: J=0.9 pairs collide with
    * ~89% probability while the dense J≈0.6 background (which a
    * 4-row band would pass wholesale on a self-similar corpus)
    * collides at <2% — candidate volume stays near the true-dup count
    * rather than the pair count.
    */
  def minhashLsh(docs0: DataFrame, perms: Int = 32, bands: Int = 4,
                 shingleN: Int = 1, minJaccardFs: Long = 5000L): DataFrame = {
    val docs = Par.spread(docs0)
    val rowsPerBand = perms / bands
    val toks = array_distinct(tokens(col("text")))
    // persist: this frame feeds BOTH legs of the band self-join and
    // BOTH sides of the verify join — without it the signature pass
    // runs 2× and the token pass 2× more (4 scan legs in the plan)
    val shingled = docs.select(
      col("doc_id"), toks.as("toks"),
      minhashSignature(if (shingleN == 1) toks else wordNgrams(tokens(col("text")), shingleN), perms)
        .as("sig"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // band rows are SLIM (doc_id, band, bucket) — token arrays never
    // ride through the 8-way explode or the bucket shuffle
    val banded = shingled
      .select(col("doc_id"), explode(bandKeys(col("sig"), bands, rowsPerBand)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.bucket").as("bucket"))
    val candidates = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct() // dedup across bands BEFORE the expensive verify
    // exact-Jaccard verify: one set-intersection per UNIQUE candidate
    val ta = shingled.select(col("doc_id").as("id_a"), col("toks").as("toks_a"))
    val tb = shingled.select(col("doc_id").as("id_b"), col("toks").as("toks_b"))
    // persist before the global sort: range-partitioned ORDER BY runs
    // a sampling pass over its input — without the persist the whole
    // pair-verify map stage executes twice
    candidates.join(ta, "id_a").join(tb, "id_b")
      .select(col("id_a"), col("id_b"),
        jaccardFs(docs0.sparkSession, col("toks_a"), col("toks_b")).as("jac_fs"))
      .filter(col("jac_fs") >= minJaccardFs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** SimHash fingerprints: 64-bit sketch per doc + the chunk keys used
    * for hamming-bucketed candidate joins (pigeonhole: hamming < 4 ⇒
    * some 16-bit chunk matches exactly).
    *
    * Uses the native codegen'd Catalyst expression when the session
    * has GraftExtensions (bit-identical, ~100× smaller expression
    * tree); falls back to the pure-Column formulation otherwise.
    */
  def simhashFingerprints(docs0: DataFrame): DataFrame = {
    val docs = Par.spread(docs0)
    val sh =
      if (docs.sparkSession.catalog.functionExists("graft_simhash64"))
        call_function("graft_simhash64", tokens(col("text")))
      else simhash64(tokens(col("text")))
    docs.select(col("doc_id"), sh.as("simhash"))
  }

  /** SimHash near-dup candidate pairs within hamming ≤ maxHamming,
    * generated via the 4-chunk pigeonhole join.
    */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 12): DataFrame = {
    // persist: both legs of the chunk self-join need the fingerprints
    val fp = simhashFingerprints(docs)
      .select(col("doc_id"), col("simhash"), explode(fingerprintChunks(col("simhash"), 4)).as("ck"))
      .select(col("doc_id"), col("simhash"), col("ck.chunk").as("chunk"), col("ck.bits").as("bits"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = fp.as("a")
    val b = fp.as("b")
    a.join(b, col("a.chunk") === col("b.chunk") && col("a.bits") === col("b.bits") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        hamming64(col("a.simhash"), col("b.simhash")).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Blocked word-set Jaccard pairs: candidates share a metadata block
    * (lang × length-bucket) — the classic cheap blocking key; exact
    * Jaccard computed only within blocks. jac_fs = floor(1e4·J).
    */
  def ngramJaccard(docs: DataFrame, thresholdFs: Long = 9000L): DataFrame = {
    val d = Par.spread(docs).select(col("doc_id"), col("lang"),
      floor(col("n_chars") / lit(100.0)).as("lb"),
      array_distinct(tokens(col("text"))).as("toks"))
    val a = d.as("a")
    val b = d.as("b")
    a.join(b, col("a.lang") === col("b.lang") && col("a.lb") === col("b.lb") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        jaccardFs(docs.sparkSession, col("a.toks"), col("b.toks")).as("jac_fs"))
      .filter(col("jac_fs") >= thresholdFs)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Apply near-dup pairs to a corpus: greedy keep-lowest-id policy —
    * every doc that appears as the HIGHER id of any pair is dropped.
    * (Connected-component canonicalization would chain A-B-C through
    * an iterative join; greedy is the standard single-pass policy for
    * training-data dedup and needs exactly one anti-join.)
    *
    * At scale: `pairs` carries only ids (slim), the anti-join shuffles
    * on doc_id — no text moves except the survivors' single pass.
    */
  def applyPairs(docs: DataFrame, pairs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val drop = pairs.select(col("id_b").as(idCol)).distinct()
    docs.join(drop, Seq(idCol), "left_anti")
  }

  /** Blocked embedding-cosine near-dup pairs: block key = label
    * metadata (any partition/source key works); norms precomputed once
    * per side so the pair expression is a single dot product.
    * cos_fs = floor(1e4·cos).
    */
  def embedCosine(embeddings: DataFrame, thresholdFs: Long = 3000L): DataFrame = {
    val e = Par.spread(embeddings).select(col("vec_id"), col("label"),
      toDoubleArray(col("embedding")).as("v"))
      .withColumn("nrm", l2norm(col("v")))
    val a = e.as("a")
    val b = e.as("b")
    val cos = cosineWithNorms(col("a.v"), col("b.v"), col("a.nrm"), col("b.nrm"))
    a.join(b, col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        floor(lit(10000.0) * cos).as("cos_fs"))
      .filter(col("cos_fs") >= thresholdFs)
      .orderBy(col("id_a"), col("id_b"))
  }
}
