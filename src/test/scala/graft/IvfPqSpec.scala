package graft

import org.apache.spark.sql.functions._
import graft.operators.{IvfPq, Similarity}

class IvfPqSpec extends SparkSpec {
  import spark.implicits._

  /** The PqSpec planted corpus: 32 one-hot direction clusters in
    * 32-d, six members each, interleaved ids — exact top-5 truth is
    * the five cluster-mates.
    */
  private val DIM = 32
  private def planted(jitter: Double) = {
    val rows = for (c <- 0 until 32; i <- 0 until 6) yield {
      val v = Array.tabulate(DIM) { d =>
        val m = (c * 100 + i).toLong * 2654435761L + d * 40503L
        (if (d == c) 1.0 else 0.0) + ((m % 1000) / 1000.0 - 0.5) * jitter
      }
      ((i * 32 + c).toLong, v.toSeq)
    }
    rows.toDF("vec_id", "embedding")
  }

  private def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
    .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("rnk"), r.getAs[Long]("c_id"),
      r.getAs[Long]("cos_fs"))).toSeq

  test("full probe + truth-covering shortlist reduces to exact brute-force search") {
    val d = planted(0.04)
    val full = rows(IvfPq.ivfPqTopK(d, dim = DIM, nlist = 8, nprobe = 8, m = 4,
      ks = 16, nQueries = 10, k = 5, shortlist = 191))
    val exact = rows(Similarity.bruteTopK(d, nQueries = 10, k = 5))
    assert(full == exact,
      "probing every list with an all-covering shortlist must equal exact search")
  }

  test("pruned probe keeps recall: a query's own list carries its cluster-mates") {
    val d = planted(0.04)
    // nprobe = 2 of 8 lists — a 4× scan cut; the query's nearest list
    // IS its cluster's list, so the planted truth stays reachable
    val gate = IvfPq.recallGate(d, dim = DIM, nlist = 8, nprobe = 2, m = 4,
      ks = 16, nQueries = 10, k = 5, shortlist = 60, minRecallFs = 9000L)
    assert(gate.count() == 1, "recall@5 under a 2/8 probe must clear 0.9 on the planted corpus")
  }

  test("stored index lifecycle: planted drift fires the rule, recluster resets it, compact and delete preserve results") {
    val base = planted(0.04)
    IvfPq.writeIndex(base, "ivfpq_life", dim = DIM, nlist = 8, m = 4, ks = 16, buckets = 8)
    assert(spark.table("ivfpq_life_stats").count() == 8,
      "build must persist the per-list stats baseline")
    assert(!IvfPq.needsRecluster(spark, "ivfpq_life"),
      "a fresh index must not report drift against its own baseline")

    // a concentrated shifted batch: 200 new vectors all near the
    // all-ones direction (far from every one-hot coarse centroid) —
    // they pile into few lists AND sit far from their centroids, so
    // both drift observables move
    val shifted = (0 until 200).map { i =>
      val v = Array.tabulate(DIM) { d =>
        1.0 + (((i * 131 + d * 17) % 100) / 100.0 - 0.5) * 0.02
      }
      ((1000 + i).toLong, v.toSeq)
    }.toDF("vec_id", "embedding")
    val reclustered = IvfPq.maintainIndex(shifted, "ivfpq_life")
    assert(reclustered, "the planted concentrated shift must fire the drift rule")
    assert(!IvfPq.needsRecluster(spark, "ivfpq_life"),
      "after the rebuild the stored corpus IS the baseline again")
    assert(spark.table("ivfpq_life_codes").count() == 192 + 200)

    // appended-then-reclustered vectors are findable with exact scores
    val q = base.filter(col("vec_id") < 3)
    def hitRows() = IvfPq.queryIndex(q, "ivfpq_life", nprobe = 8, k = 400, shortlist = 400)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("c_id"),
        r.getAs[Long]("cos_fs"))).toSeq
    val before = hitRows()
    assert(before.exists(_._2 >= 1000L), "shifted vectors must be searchable post-recluster")

    // compaction: append fragments collapse to ~one file per cluster
    // dir, resolved from the catalog's CURRENT location (post-flip the
    // live generation is a __gN sibling); results must not change
    IvfPq.appendToIndex((0 until 3).map { i =>
      ((2000 + i).toLong, Seq.tabulate(DIM)(d => if (d == i) 1.0 else 0.01))
    }.toDF("vec_id", "embedding"), "ivfpq_life")
    def codeFiles(): Int = {
      val loc = spark.sessionState.catalog.getTableMetadata(
        spark.sessionState.sqlParser.parseTableIdentifier("ivfpq_life_codes")).location
      Option(new java.io.File(loc).listFiles()).getOrElse(Array.empty)
        .filter(_.getName.startsWith("cluster="))
        .map(d => Option(d.listFiles()).getOrElse(Array.empty)
          .count(_.getName.startsWith("part-"))).sum
    }
    val filesBefore = codeFiles()
    val preCompact = hitRows()
    IvfPq.compactIndex(spark, "ivfpq_life")
    assert(codeFiles() < filesBefore,
      s"compaction must shrink the codes file count (was $filesBefore)")
    assert(hitRows() == preCompact, "compaction must not change any result row")

    // retraction: a deleted vector stops surfacing; re-delete no-ops
    import spark.implicits._
    val victim = before.head._2
    val codesBefore = spark.table("ivfpq_life_codes").count()
    IvfPq.deleteFromIndex(spark, "ivfpq_life", Seq(victim).toDF("vec_id"))
    assert(spark.table("ivfpq_life_codes").count() == codesBefore - 1)
    assert(spark.table("ivfpq_life_vecs").count() == codesBefore - 1,
      "both stores must retract together")
    assert(!hitRows().exists(_._2 == victim), "a retracted vector must stop surfacing")
    IvfPq.deleteFromIndex(spark, "ivfpq_life", Seq(victim).toDF("vec_id"))
    assert(spark.table("ivfpq_life_codes").count() == codesBefore - 1,
      "re-deleting an absent id must be a no-op")
  }

  test("stored index: parity with in-memory path, DPP-pruned codes scan, idempotent append") {
    val emb = Tables.embeddings(spark, sfDir)
    val maxId = emb.agg(max(col("vec_id"))).head().getLong(0)
    val build = emb.filter(col("vec_id") < maxId - 1)
    val heldOut = emb.filter(col("vec_id") >= maxId - 1)
    IvfPq.writeIndex(build, "ivfpq_spec", nlist = 8, m = 8, ks = 16, buckets = 8)

    // training is deterministic, so a fresh in-memory model over the
    // same corpus must rank identically to the stored index
    val queries = build.filter(col("vec_id") < 10)
    val stored = rows(IvfPq.queryIndex(queries, "ivfpq_spec", nprobe = 3, k = 5,
      shortlist = 50))
    val memory = rows(IvfPq.ivfPqTopK(build, nlist = 8, nprobe = 3, m = 8, ks = 16,
      nQueries = 10, k = 5, shortlist = 50))
    assert(stored == memory,
      s"stored IVF-PQ must return the in-memory path's exact rankings (${stored.size} vs ${memory.size})")

    // the compression claim: the scan side holds m small ints per
    // vector, not dim floats
    val codesSchema = spark.table("ivfpq_spec_codes").schema
    assert(codesSchema.fieldNames.toSet == Set("c_id", "codes", "cluster"),
      "codes table must carry only id + codes + partition key")

    // the I/O claim: the codes scan is dynamic-partition-pruned to
    // the probed clusters by the broadcast probe join
    val plan = IvfPq.queryIndex(queries, "ivfpq_spec", nprobe = 3, k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"codes scan must carry a dynamic partition pruning filter:\n${plan.take(2000)}")

    // idempotent append + findability: held-out vectors fold in once,
    // re-append is a no-op, and a full probe re-ranks them at their
    // exact brute-force score
    val codeRows = spark.table("ivfpq_spec_codes").count()
    IvfPq.appendToIndex(heldOut, "ivfpq_spec")
    val afterAppend = spark.table("ivfpq_spec_codes").count()
    assert(afterAppend == codeRows + 2, "append must add exactly the 2 held-out rows")
    IvfPq.appendToIndex(heldOut, "ivfpq_spec")
    assert(spark.table("ivfpq_spec_codes").count() == afterAppend,
      "re-appending an already-indexed batch must be a no-op")
    assert(spark.table("ivfpq_spec_vecs").count() == afterAppend,
      "vecs store must track the codes rows one-for-one")
    val fullProbe = rows(IvfPq.queryIndex(queries, "ivfpq_spec", nprobe = 8, k = 500,
      shortlist = 500))
    val bruteAll = Similarity.bruteTopK(emb, nQueries = 10, k = 500).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("c_id")) -> r.getAs[Long]("cos_fs")).toMap
    assert(fullProbe.forall { case (q, _, c, fs) => bruteAll.get((q, c)).contains(fs) },
      "re-ranked scores must be exact — PQ loss must never leak into the output")
    assert(fullProbe.exists { case (_, _, c, _) => c >= maxId - 1 },
      "appended vectors must be findable by the stored search")
  }
}
