package graft

import graft.operators.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("brute top-k ranks an identical vector first") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.0f, 1.0f)), (3L, Array(1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.bruteTopK(emb, nQueries = 1, k = 3).collect()
    assert(out.length == 3)
    assert(out.head.getAs[Long]("c_id") == 3L, "identical vector must rank 1st")
    val fs = out.map(_.getAs[Long]("cos_fs"))
    assert(fs.zip(fs.tail).forall { case (a, b) => a >= b })
  }

  test("lsh top-k results are a subset of brute-force candidates with same scores") {
    val emb = Tables.embeddings(spark, sfDir)
    val brute = Similarity.bruteTopK(emb, nQueries = 10, k = 500).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("c_id")) -> r.getAs[Long]("cos_fs")).toMap
    val lsh = Similarity.lshTopK(emb, dim = 64, planes = 6, nQueries = 10, k = 5).collect()
    assert(lsh.nonEmpty, "every query should find same-bucket candidates")
    lsh.foreach { r =>
      val key = (r.getAs[Long]("q_id"), r.getAs[Long]("c_id"))
      assert(brute.contains(key), s"lsh pair $key not in brute-force universe")
      assert(brute(key) == r.getAs[Long]("cos_fs"), s"score mismatch for $key")
    }
  }

  test("ivf top-k: results come from probed lists with brute-force-identical scores") {
    val emb = Tables.embeddings(spark, sfDir)
    val brute = Similarity.bruteTopK(emb, nQueries = 10, k = 500).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("c_id")) -> r.getAs[Long]("cos_fs")).toMap
    val ivf = Similarity.ivfTopK(emb, nlist = 8, nprobe = 3, nQueries = 10, k = 5).collect()
    assert(ivf.nonEmpty, "every query should find candidates in its probed lists")
    ivf.foreach { r =>
      val key = (r.getAs[Long]("q_id"), r.getAs[Long]("c_id"))
      assert(brute.contains(key) && brute(key) == r.getAs[Long]("cos_fs"),
        s"ivf pair $key score mismatch vs brute force")
    }
    // full probe (nprobe = nlist) must equal exact brute-force top-k
    val full = Similarity.ivfTopK(emb, nlist = 8, nprobe = 8, nQueries = 5, k = 3).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("rnk"), r.getAs[Long]("c_id")))
    val exact = Similarity.bruteTopK(emb, nQueries = 5, k = 3).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("rnk"), r.getAs[Long]("c_id")))
    assert(full.toSeq == exact.toSeq, "probing every list must reduce to exact search")
  }

  test("ann recall gate: both approximate methods clear the 0.8 bar vs brute force") {
    val emb = Tables.embeddings(spark, sfDir)
    val rows = Similarity.annRecall(emb).collect()
    assert(rows.length == 2, s"gate emits one row per method only when ALL pass, got ${rows.length}")
    rows.foreach { r =>
      assert(r.getAs[Long]("recall_fs") >= 8000L,
        s"${r.getAs[String]("method")} recall ${r.getAs[Long]("recall_fs")} below the gate")
    }
  }

  test("ann recall gate emits ZERO rows when any method misses the bar") {
    val emb = Tables.embeddings(spark, sfDir)
    assert(Similarity.annRecall(emb, minRecallFs = 10001L).collect().isEmpty,
      "an unreachable bar must produce no rows — rows>0 IS the pass signal")
  }

  test("lsh bucket recall at coarse planes is nontrivial") {
    val emb = Tables.embeddings(spark, sfDir)
    val brute = Similarity.bruteTopK(emb, nQueries = 5, k = 3).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("c_id"))).toSet
    val lsh = Similarity.lshTopK(emb, dim = 64, planes = 3, nQueries = 5, k = 50).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("c_id"))).toSet
    val recall = brute.count(lsh.contains).toDouble / brute.size
    assert(recall >= 0.2, f"3-plane LSH recall $recall%.2f unexpectedly low")
  }
}
