package graft

import org.apache.spark.sql.functions._
import graft.operators.Pq

class PqSpec extends SparkSpec {
  import spark.implicits._

  /** Planted corpus: 32 one-hot direction clusters in 32-d, SIX
    * members each with small deterministic jitter. With k = 5 every
    * query's exact top-5 is exactly its five cluster-mates (inter-
    * cluster cosine ≈ 0 ≪ intra ≈ 1), so recall has an unambiguous
    * truth — no near-ties for the exact baseline to flicker on.
    */
  private val DIM = 32
  private def planted(jitter: Double, members: Int = 6) = {
    val rows = for (c <- 0 until 32; i <- 0 until members) yield {
      val v = Array.tabulate(DIM) { d =>
        val m = (c * 100 + i).toLong * 2654435761L + d * 40503L
        (if (d == c) 1.0 else 0.0) + ((m % 1000) / 1000.0 - 0.5) * jitter
      }
      // INTERLEAVED ids (member i of cluster c = i·32 + c): the first
      // N ids span N distinct clusters, so the bounded query set and
      // the deterministic k-means init both cover many directions
      ((i * 32 + c).toLong, v.toSeq)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("encode: m in-range codes, deterministic, cluster-mates agree in their distinguishing subspace") {
    val d = planted(0.04)
    val cb = Pq.train(d, dim = DIM, m = 4, ks = 16, iters = 8)
    assert(cb.books.length == 4 && cb.books.forall(_.length == 16))
    assert(cb.books.forall(_.forall(_.length == DIM / 4)), "each centroid spans dim/m dims")
    val codes = Pq.encode(d, cb).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Int](1)).toMap
    assert(codes.size == 192)
    assert(codes.values.forall(cs => cs.length == 4 && cs.forall(c => c >= 0 && c < 16)))
    val again = Pq.encode(d, cb).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Int](1)).toMap
    assert(again == codes)
    // codebook quality: every vector's reconstruction error is tiny
    // against the ~2.0 squared distance separating different one-hot
    // directions on the unit sphere — the property that makes ADC
    // ranking trustworthy (mates may spread over several near-equal
    // centroids seeded by the deterministic init; that's harmless)
    val vecs = d.collect().map(r => r.getAs[Long]("vec_id") ->
      r.getSeq[Double](1).toArray).toMap
    def norm(v: Array[Double]) = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    val dsub = DIM / 4
    val errs = codes.map { case (id, cs) =>
      val v = norm(vecs(id))
      (0 until 4).map { s =>
        val cent = cb.books(s)(cs(s))
        (0 until dsub).map(dd => math.pow(v(s * dsub + dd) - cent(dd), 2)).sum
      }.sum
    }
    info(f"quantization error: mean ${errs.sum / errs.size}%.3f max ${errs.max}%.3f")
    // farthest-point seeding pins this ~jitter-scale (first-k-by-id
    // init merged directions here: mean 0.375 — the local minimum the
    // seeding exists to avoid; 2.0 is the inter-direction distance)
    assert(errs.sum / errs.size < 0.05 && errs.max < 0.2,
      s"quantization error (mean ${errs.sum / errs.size}, max ${errs.max}) must be " +
        "jitter-scale under farthest-point seeding")
  }

  test("ADC score equals the reconstructed subspace distance sum (lookup = recompute)") {
    val d = planted(0.04)
    val cb = Pq.train(d, dim = DIM, m = 4, ks = 16)
    val top = Pq.adcTopK(d, cb, nQueries = 5, k = 3).collect()
    assert(top.length == 15)
    val codes = Pq.encode(d, cb).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Int](1)).toMap
    val vecs = d.collect().map(r => r.getAs[Long]("vec_id") ->
      r.getSeq[Double](1).toArray).toMap
    def norm(v: Array[Double]) = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    val dsub = DIM / 4
    top.foreach { r =>
      val (qid, cid, fs) = (r.getAs[Long]("q_id"), r.getAs[Long]("c_id"), r.getAs[Long]("adc_fs"))
      val q = norm(vecs(qid))
      val want = (0 until 4).map { s =>
        val cent = cb.books(s)(codes(cid)(s))
        (0 until dsub).map(dd => math.pow(q(s * dsub + dd) - cent(dd), 2)).sum
      }.sum
      assert(math.abs(math.floor(1e6 * want) - fs) <= 1,
        s"ADC lookup must equal recomputed distance for ($qid,$cid): $fs vs ${math.floor(1e6 * want)}")
    }
  }

  test("two-stage re-rank: with a truth-covering shortlist the output EQUALS the exact baseline") {
    val d = planted(0.02)
    val cb = Pq.train(d, dim = DIM, m = 4, ks = 16)
    val reranked = Pq.adcTopKReranked(d, cb, nQueries = 8, k = 5, shortlist = 60)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("rnk"), r.getAs[Long]("c_id")))
    val brute = graft.operators.Similarity.bruteTopK(d, nQueries = 8, k = 5)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("rnk"), r.getAs[Long]("c_id")))
    assert(reranked.toSeq == brute.toSeq,
      "exact re-ranking of a shortlist that covers the truth must reproduce the brute ranking")
  }

  test("sample-trained codebooks match full-trained recall (bounded FAISS-style training)") {
    // 32 clusters × 64 members = 2048 vectors > the max(1024, 100·16)
    // = 1600 sample budget, so the default trainer REALLY fits on a
    // strict subset while trainOnFull sees every vector
    val d = planted(0.03, members = 64)
    val prepared = graft.operators.Pq.normalized(d)
      .select(col("vec_id").as("id"), col("v"))
    val sampled = graft.operators.Pq.trainOn(prepared, DIM, 4, 16, 3)
    val full = graft.operators.Pq.trainOnFull(prepared, DIM, 4, 16, 3)
    def recallOf(cb: Pq.Codebooks): Double = {
      val truth = graft.operators.Similarity.bruteTopK(d, nQueries = 8, k = 5)
        .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("c_id"))).toSet
      val appr = Pq.adcTopKReranked(d, cb, nQueries = 8, k = 5, shortlist = 100)
        .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("c_id"))).toSet
      appr.intersect(truth).size.toDouble / truth.size
    }
    val (rs, rf) = (recallOf(sampled), recallOf(full))
    info(f"recall: sampled $rs%.3f vs full $rf%.3f")
    assert(rs >= 0.9, s"sample-trained recall $rs must clear the production gate")
    assert(rs >= rf - 0.05,
      s"bounded-sample training ($rs) must match full-corpus training ($rf)")
    // determinism: the sampled trainer is a pure function of the corpus
    val again = graft.operators.Pq.trainOn(prepared, DIM, 4, 16, 3)
    assert(again.books.map(_.map(_.toSeq)) == sampled.books.map(_.map(_.toSeq)),
      "sample-trained codebooks must be deterministic")
  }

  test("recall gate: ADC recovers the exact cosine neighbors on the planted corpus") {
    val out = Pq.pqRecall(planted(0.02), dim = DIM, m = 4, ks = 16, nQueries = 10, k = 5,
      minRecallFs = 9000L).collect()
    assert(out.length == 1, "the planted clusters are PQ-recoverable: gate must pass")
    val fs = out(0).getAs[Long]("recall_fs")
    info(s"pq recall_fs = $fs")
    assert(fs >= 9000L && fs <= 10000L)
  }
}
