package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.functions.HashFunctions

class DedupSpec extends SparkSpec {
  import spark.implicits._

  /** Crafted corpus: 1=2 exact dups, 3 near-dup of them, 4 unrelated. */
  private def docs = Seq(
    (1L, "alpha beta gamma delta epsilon", "en", 30L),
    (2L, "alpha beta gamma delta epsilon", "en", 30L),
    (3L, "alpha beta gamma delta zeta", "en", 27L),
    (4L, "one two three four five six seven", "en", 33L)
  ).toDF("doc_id", "text", "lang", "n_chars")

  test("exact dedup groups identical texts and keeps the lowest id") {
    val out = Dedup.exact(docs).collect()
    assert(out.length == 3)
    val dup = out.find(_.getAs[Long]("n_dups") == 2).get
    assert(dup.getAs[Long]("keep_id") == 1L)
  }

  test("minhash-LSH finds the exact and near dup pairs, not the unrelated doc") {
    // 8 bands × 4 rows: high collision probability for the J=0.667 toy pair
    val pairs = Dedup.minhashLsh(docs, bands = 8, minJaccardFs = 5000L).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pairs.contains((1L, 2L)), "exact dup must collide in every band")
    assert(pairs.contains((1L, 3L)) && pairs.contains((2L, 3L)),
      "4-of-6-shingle near dup (J=0.667) should collide in some band")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L), "unrelated doc must not pair")
  }

  test("minhash jac_fs matches the exact jaccard of the token sets") {
    val out = Dedup.minhashLsh(docs, bands = 8, minJaccardFs = 0L).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) -> r.getAs[Long]("jac_fs")).toMap
    assert(out((1L, 2L)) == 10000L)
    assert(out((1L, 3L)) == math.floor(10000.0 * 4.0 / 6.0).toLong)
  }

  test("simhash: identical docs hash identically; near dups are hamming-close") {
    val fp = Dedup.simhashFingerprints(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash")).toMap
    assert(fp(1L) == fp(2L))
    assert(java.lang.Long.bitCount(fp(1L) ^ fp(3L)) < 20, "near dup should be hamming-close")
    val pairs = Dedup.simhashPairs(docs, maxHamming = 12).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"), r.getAs[Long]("hamming")))
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 0L))
  }

  test("blocked ngram-jaccard finds dups within blocks only") {
    val out = Dedup.ngramJaccard(docs, thresholdFs = 6000L).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(out((1L, 2L)), "exact dups share a block and have J=1")
    assert(!out.exists(p => p._2 == 4L), "doc 4 is in a different length block")
  }

  test("embed cosine pairs: identical vectors give cos_fs ~ 10000") {
    val emb = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f), 0),
      (2L, Array(1.0f, 0.0f, 0.0f), 0),
      (3L, Array(0.0f, 1.0f, 0.0f), 0),
      (4L, Array(1.0f, 0.0f, 0.0f), 1) // same vec, different label → no pair
    ).toDF("vec_id", "embedding", "label")
    val out = Dedup.embedCosine(emb, thresholdFs = 3000L).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) -> r.getAs[Long]("cos_fs")).toMap
    assert(out.keySet == Set((1L, 2L)), s"only same-label identical pair expected, got ${out.keySet}")
    assert(out((1L, 2L)) >= 9999L)
  }

  test("applyPairs drops exactly the higher-id members of dup pairs") {
    val pairs = Dedup.ngramJaccard(docs, thresholdFs = 9000L)
    val survivors = Dedup.applyPairs(docs, pairs).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(survivors.contains(1L) && !survivors.contains(2L), "doc 2 is the higher-id exact dup")
    assert(survivors.contains(4L), "non-dup doc must survive")
  }

  test("rolling fingerprint is order-sensitive where set hashes are not") {
    val d2 = Seq((1L, "a b c"), (2L, "c b a")).toDF("doc_id", "text")
    val fps = d2.select(HashFunctions.rollingFingerprint(split(col("text"), " ")).as("fp"))
      .collect().map(_.getLong(0))
    assert(fps(0) != fps(1), "permuted token order must change the rolling hash")
  }
}
