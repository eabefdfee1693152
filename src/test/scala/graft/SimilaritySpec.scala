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

  test("multi-probe LSH: model reduces at probes=1, recall rises with probes, fewer tables suffice") {
    import Similarity.{srpCollisionProb, srpMultiProbeCollisionProb}
    // probes = 1 IS single-probe
    for (c <- Seq(0.0, 0.3, 0.5, 0.9))
      assert(math.abs(srpMultiProbeCollisionProb(c, 6, 15, 1) - srpCollisionProb(c, 6, 15)) < 1e-12)
    // monotone in probes at fixed geometry
    val curve = (1 to 7).map(srpMultiProbeCollisionProb(0.5, 6, 8, _))
    assert(curve.zip(curve.tail).forall { case (a, b) => b >= a })
    // the index-size trade this exists for: full multi-probe at 8
    // tables beats single-probe at 15 tables (≈ half the banded index)
    assert(srpMultiProbeCollisionProb(0.5, 6, 8, 7) > srpCollisionProb(0.5, 6, 15),
      "multi-probe with half the tables must out-recall single-probe at cos 0.5")
    intercept[IllegalArgumentException](srpMultiProbeCollisionProb(0.5, 6, 8, 9))
  }

  test("multi-probe LSH on data: candidates are a superset, so per-query hits never drop") {
    val emb = Tables.embeddings(spark, sfDir)
    val brute = Similarity.bruteTopK(emb, nQueries = 5, k = 5).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("c_id"))).toSet
    def hits(probes: Int): Int =
      Similarity.lshTopK(emb, dim = 64, planes = 6, tables = 4, nQueries = 5, k = 5,
          probes = probes).collect()
        .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("c_id")))
        .count(brute.contains)
    val single = hits(1)
    val multi = hits(7)
    assert(multi >= single,
      s"probing 1-bit-flip buckets can only ADD candidates: $multi vs $single")
    // scores of multi-probe results still come from the exact verify
    val mp = Similarity.lshTopK(emb, planes = 6, tables = 4, nQueries = 5, k = 5, probes = 7)
      .collect()
    val bruteAll = Similarity.bruteTopK(emb, nQueries = 5, k = 500).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("c_id")) -> r.getAs[Long]("cos_fs")).toMap
    mp.foreach { r =>
      val key = (r.getAs[Long]("q_id"), r.getAs[Long]("c_id"))
      bruteAll.get(key).foreach(fs => assert(fs == r.getAs[Long]("cos_fs")))
    }
  }

  test("geometry sizing: planes track log2(n), multi-probe minimizes the table count") {
    import Similarity.{srpMultiProbeCollisionProb, suggestSrpGeometry}
    // the rehearsal's operating point: 100k vectors, cos 0.94 dups
    val (p, t, pr) = suggestSrpGeometry(100000L, 0.94, targetRecall = 0.9)
    assert(p == 17, s"planes must be ceil(log2 1e5) = 17, got $p")
    assert(srpMultiProbeCollisionProb(0.94, p, t, pr) >= 0.9)
    // the suggestion must dominate the single-probe alternative on
    // index size (the rehearsal measured 9×4-probe vs 16×1)
    val minSingleTables = (1 to 64)
      .find(tb => srpMultiProbeCollisionProb(0.94, p, tb, 1) >= 0.9).get
    assert(t <= minSingleTables,
      s"suggested $t tables must not exceed the single-probe minimum $minSingleTables")
    // bigger corpus → more planes; recall target still met
    val (p2, t2, pr2) = suggestSrpGeometry(100000000L, 0.94)
    assert(p2 == 27 && srpMultiProbeCollisionProb(0.94, p2, t2, pr2) >= 0.9)
    // an unreachable target throws instead of silently under-recalling
    intercept[IllegalArgumentException](suggestSrpGeometry(100000L, 0.05, 0.999))
  }

  test("query-geometry sizing: planes track log2(n/budget); recall model met; tables minimal") {
    import Similarity.{srpMultiProbeCollisionProb, suggestSrpGeometry, suggestSrpQueryGeometry}
    // at cos 0.35 (near-orthogonal corpus) the candidate budget must
    // scale with n — a fixed 64 at n = 10⁶ is rightly infeasible
    // within 64 tables (shallow s-curve), so that point passes a
    // larger verify budget instead
    for ((n, cpq) <- Seq((500L, 64), (5000L, 64), (1000000L, 4096))) {
      val (p, t, pr) = suggestSrpQueryGeometry(n, 0.35, targetRecall = 0.9,
        candidatesPerQuery = cpq)
      val expectP = math.max(2, math.ceil(math.log(n.toDouble / cpq) / math.log(2.0)).toInt)
      assert(p == expectP, s"n=$n: planes $p != log2(n/$cpq) rule $expectP")
      assert(pr >= 1 && pr <= p + 1, s"n=$n: probes $pr out of [1, planes+1]")
      assert(srpMultiProbeCollisionProb(0.35, p, t, pr) >= 0.9,
        s"n=$n: derived geometry must clear the modeled recall")
      // fewest-tables-first: no probe count rescues tables−1
      assert(t == 1 || (1 to p + 1).forall(q =>
        srpMultiProbeCollisionProb(0.35, p, t - 1, q) < 0.9),
        s"n=$n: $t tables must be minimal")
    }
    // fixed small budget at 10⁶ near-orthogonal: rightly refuses
    intercept[IllegalArgumentException](
      suggestSrpQueryGeometry(1000000L, 0.35, targetRecall = 0.9))
    // the self-dedup rule at the same near-orthogonal threshold would
    // blow past any sane table budget at sf0.1 scale — the query rule
    // exists precisely because the workloads differ
    intercept[IllegalArgumentException](suggestSrpGeometry(5000L, 0.35, 0.9))
  }

  test("multi-probe flips are query-directed: smallest-|margin| planes first, base always probed") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.functions.col
    import graft.functions.VectorFunctions.toDoubleArray
    val dim = 8
    val planes = 4
    val probes = 3
    // deterministic, non-degenerate vectors (distinct margins per plane)
    val vecs = Seq(
      (0L, Array(0.31f, -0.72f, 1.21f, 0.13f, -0.44f, 0.91f, -1.13f, 0.27f)),
      (1L, Array(-0.55f, 0.18f, 0.07f, -0.93f, 0.62f, -0.29f, 0.84f, -0.11f)),
      (2L, Array(1.05f, 0.95f, -0.15f, 0.41f, -0.77f, 0.33f, 0.58f, -0.66f)))
    val df = vecs.toDF("vec_id", "embedding")
    val v = toDoubleArray(col("embedding"))
    val rows = df.select(col("vec_id"),
      Similarity.srpProbeStructs(v, dim, planes, tables = 1, probes = probes, "band").as("pb"),
      Similarity.srpBucketSeeded(v, dim, planes, "t0#").as("base")).collect()
    rows.foreach { r =>
      val id = r.getAs[Long]("vec_id")
      val probed = r.getAs[scala.collection.Seq[Row]]("pb").map(_.getAs[Long]("bucket"))
      val base = r.getAs[Long]("base")
      assert(probed.head == base, "first probe must be the exact bucket")
      assert(probed.toSet.size == probes, "probes must hit distinct buckets")
      // every extra probe is one bit off the base bucket
      val flipped = probed.tail.map { b =>
        val x = b ^ base
        assert(java.lang.Long.bitCount(x) == 1, s"probe must flip exactly one plane, got $x")
        java.lang.Long.numberOfTrailingZeros(x)
      }
      // ...and the flipped planes are exactly the smallest-|dot| ones,
      // ascending (ties broken by plane index — array_sort struct order)
      val emb = vecs.find(_._1 == id).get._2.map(_.toDouble)
      val margins = (0 until planes).map { p =>
        val pv = Similarity.planeVector("t0#", p, dim)
        math.abs(pv.zip(emb).map { case (a, b) => a * b }.sum) -> p
      }
      val expected = margins.sorted.take(probes - 1).map(_._2)
      assert(flipped == expected,
        s"vec $id: flipped planes $flipped != smallest-margin planes $expected")
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

  test("stored IVF index: bit-identical to in-memory, DPP-pruned reads, idempotent append, compaction") {
    import org.apache.spark.sql.functions.col
    val emb = Tables.embeddings(spark, sfDir)
    // hold two vectors out of the build so append has genuinely new ids
    val maxId = emb.agg(org.apache.spark.sql.functions.max(col("vec_id"))).head().getLong(0)
    val build = emb.filter(col("vec_id") < maxId - 1)
    val heldOut = emb.filter(col("vec_id") >= maxId - 1)
    Similarity.writeIvfIndex(build, "ivfidx_spec", nlist = 8, buckets = 8)
    val queries = build.filter(col("vec_id") < 10)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("rnk"), r.getAs[Long]("c_id"),
        r.getAs[Long]("cos_fs"))).toSeq
    val stored = rows(Similarity.ivfAgainstIndex(queries, "ivfidx_spec", nprobe = 3, k = 5))
    val memory = rows(Similarity.ivfTopK(build, nlist = 8, nprobe = 3, nQueries = 10, k = 5))
    assert(stored == memory,
      s"stored index must return the in-memory path's exact rankings (${stored.size} vs ${memory.size})")
    // the I/O claim: the lists scan is dynamic-partition-pruned by the
    // broadcast probe join — unprobed cluster directories never read
    val plan = Similarity.ivfAgainstIndex(queries, "ivfidx_spec", nprobe = 3, k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"lists scan must carry a dynamic partition pruning filter:\n${plan.take(2000)}")

    // idempotent append: the held-out vectors fold in once; their
    // repeat append is a no-op; a full-probe query then finds an
    // appended vector exactly where brute force puts it
    val listRows = spark.table("ivfidx_spec_lists").count()
    Similarity.appendToIvfIndex(heldOut, "ivfidx_spec")
    val afterAppend = spark.table("ivfidx_spec_lists").count()
    assert(afterAppend == listRows + 2, s"append must add exactly the 2 held-out rows")
    Similarity.appendToIvfIndex(heldOut, "ivfidx_spec")
    assert(spark.table("ivfidx_spec_lists").count() == afterAppend,
      "re-appending an already-indexed batch must be a no-op")
    val fullProbe = rows(Similarity.ivfAgainstIndex(queries, "ivfidx_spec", nprobe = 8, k = 500))
    val bruteAll = Similarity.bruteTopK(emb, nQueries = 10, k = 500).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("c_id")) -> r.getAs[Long]("cos_fs")).toMap
    assert(fullProbe.forall { case (q, _, c, fs) => bruteAll.get((q, c)).contains(fs) },
      "full-probe stored search must score every pair exactly as brute force")
    assert(fullProbe.exists { case (_, _, c, _) => c >= maxId - 1 },
      "appended vectors must be findable by the stored search")

    // compaction: appends added a file per touched cluster dir; the
    // rewrite restores ~one file per cluster and preserves results
    // resolve the CURRENT location from the catalog — after the r10
    // versioned-location flip the compacted lists live at a __gN
    // sibling, so a fixed warehouse path would list 0 files and make
    // the shrink assertion below pass vacuously
    def listFiles(): Seq[java.io.File] = {
      val loc = spark.sessionState.catalog.getTableMetadata(
        spark.sessionState.sqlParser.parseTableIdentifier("ivfidx_spec_lists")).location
      Option(new java.io.File(loc).listFiles()).getOrElse(Array.empty)
        .toSeq.filter(_.getName.startsWith("cluster="))
        .flatMap(d => Option(d.listFiles()).getOrElse(Array.empty).toSeq)
        .filter(_.getName.startsWith("part-"))
    }
    val filesBefore = listFiles().size
    val rowsBeforeCompact = spark.table("ivfidx_spec_lists").count()
    Similarity.compactIvfIndex(spark, "ivfidx_spec")
    // count preservation FIRST: the partitioned-table rename leaves
    // partition catalog entries pointing at the dropped tmp path, so
    // without MSCK recovery the table silently reads ZERO rows — and
    // an empty==empty result comparison would pass vacuously (the r9
    // defect this line exists to catch)
    assert(spark.table("ivfidx_spec_lists").count() == rowsBeforeCompact,
      "compaction must preserve every list row")
    assert(listFiles().size < filesBefore,
      s"compaction must shrink the lists file count ($filesBefore -> ${listFiles().size})")
    assert(listFiles().nonEmpty, "the current-location listing must see the compacted files")
    // every partition catalog entry must point INSIDE the current
    // generation — MSCK alone is add-only and would leave pre-flip
    // entries on the previous generation (Sinks.syncPartitionLocations)
    locally {
      val ident = spark.sessionState.sqlParser.parseTableIdentifier("ivfidx_spec_lists")
      val cur = spark.sessionState.catalog.getTableMetadata(ident).location.toString.stripSuffix("/")
      val stray = spark.sessionState.catalog.listPartitions(ident)
        .filter(p => p.storage.locationUri.exists(u => !u.toString.startsWith(cur)))
      assert(stray.isEmpty,
        s"partition entries must live in the current generation, stray: ${stray.take(3).map(_.storage.locationUri)}")
    }
    val afterCompact = rows(Similarity.ivfAgainstIndex(queries, "ivfidx_spec", nprobe = 3, k = 5))
    // the original build's rankings still hold (appended ids don't
    // enter these queries' top-5 at cos-ranked 3-probe on this corpus
    // unless they genuinely rank — compare against a fresh stored run)
    assert(afterCompact == rows(
      Similarity.ivfAgainstIndex(queries, "ivfidx_spec", nprobe = 3, k = 5)),
      "compaction must not change results")

    // RETRACTION: a deleted vector must stop surfacing as a neighbor
    // — and only it; the codebook stays frozen so surviving rankings
    // are unchanged except where the deleted id held a slot
    import spark.implicits._
    val victim = stored.head._3 // a c_id that provably ranks for some query
    Similarity.deleteFromIvfIndex(spark, "ivfidx_spec", Seq(victim).toDF("vec_id"))
    val afterDelete = rows(Similarity.ivfAgainstIndex(queries, "ivfidx_spec", nprobe = 8, k = 500))
    assert(!afterDelete.exists(_._3 == victim), "retracted vector must never surface")
    assert(afterDelete.map(t => (t._1, t._3, t._4)).toSet ==
      fullProbe.filter(_._3 != victim).map(t => (t._1, t._3, t._4)).toSet,
      "delete must remove exactly the retracted vector's rows (scores untouched)")
    assert(spark.table("ivfidx_spec_ids").filter(col("c_id") === victim).count() == 0,
      "retracted id must be gone from the ids table")
    // idempotent: re-deleting is a no-op; appending the victim back
    // re-indexes it (the ids anti-join no longer blocks it)
    val listsAfterDelete = spark.table("ivfidx_spec_lists").count()
    Similarity.deleteFromIvfIndex(spark, "ivfidx_spec", Seq(victim).toDF("vec_id"))
    assert(spark.table("ivfidx_spec_lists").count() == listsAfterDelete,
      "re-deleting a retracted id must change nothing")
    Similarity.appendToIvfIndex(emb.filter(col("vec_id") === victim), "ivfidx_spec")
    assert(spark.table("ivfidx_spec_lists").count() == listsAfterDelete + 1,
      "a retracted id must be re-appendable after delete")
  }

  test("large-codebook IVF: broadcast build/probe/append path is result-identical to literal") {
    import org.apache.spark.sql.functions.col
    val emb = Tables.embeddings(spark, sfDir)
    // literalMax = 0 forces the broadcast-codebook path at a codebook
    // size where the literal path also runs - the two stored indexes
    // must then answer identically
    Similarity.writeIvfIndex(emb, "ivflit_spec", nlist = 8, buckets = 8)
    Similarity.writeIvfIndex(emb, "ivfbc_spec", nlist = 8, buckets = 8, literalMax = 0)
    val queries = emb.filter(col("vec_id") < 10)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("rnk"), r.getAs[Long]("c_id"),
        r.getAs[Long]("cos_fs"))).toSeq
    val lit = rows(Similarity.ivfAgainstIndex(queries, "ivflit_spec", nprobe = 3, k = 5))
    val bc = rows(Similarity.ivfAgainstIndex(queries, "ivfbc_spec", nprobe = 3, k = 5,
      literalMax = 0))
    assert(lit == bc, s"broadcast-path index must answer exactly like the literal one")
    // cross-path: broadcast PROBE against the literal-built index
    val cross = rows(Similarity.ivfAgainstIndex(queries, "ivflit_spec", nprobe = 3, k = 5,
      literalMax = 0))
    assert(cross == lit, "broadcast probing must pick the same clusters as the literal sort")
    // sizing rule shape: nlist tracks 4*sqrt(n) within clamps, nprobe nlist/8 floored at 8
    assert(Similarity.suggestIvfGeometry(100L) == ((40, 8)))
    assert(Similarity.suggestIvfGeometry(1000000L) == ((4000, 500)))
    assert(Similarity.suggestIvfGeometry(1L) == ((16, 8)))
  }

  test("IVF codebook drift: skewed appends degrade recall, recluster restores it and resets the baseline") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    def v(parts: Double*): Array[Float] = parts.map(_.toFloat).toArray
    def jit(i: Int): Double = (i % 5) * 0.05 - 0.1
    // build corpus: two tight blobs on the ±x axis → codebook ≈ {P̄, Q̄}
    val blobP = (100 to 119).map(i => (i.toLong, v(10.0 + jit(i), jit(i + 1), 0, 0)))
    val blobQ = (120 to 139).map(i => (i.toLong, v(-10.0 + jit(i), jit(i + 2), 0, 0)))
    // nlist = 3: the post-drift corpus has three natural blobs, so
    // the recluster optimum is {P},{Q},{B} — at nlist = 2 even the
    // GLOBAL optimum mirror-splits B (two symmetric mixed clusters
    // cost less than {B},{P∪Q}), which is a codebook-capacity
    // problem, not a drift problem
    Similarity.writeIvfIndex((blobP ++ blobQ).toDF("vec_id", "embedding"),
      "ivfdrift_spec", dim = 4, nlist = 3, buckets = 4)
    val r0 = Similarity.ivfDriftReport(spark, "ivfdrift_spec").head()
    assert(math.abs(r0.getAs[Double]("dist_growth") - 1.0) < 1e-9 &&
      math.abs(r0.getAs[Double]("skew_growth") - 1.0) < 1e-9,
      "fresh index must report unit growth against its own baseline")
    assert(!Similarity.ivfNeedsRecluster(spark, "ivfdrift_spec"))

    // drift: a NEW mass far from both centroids, straddling their
    // boundary — members with x > 0 quantize into P's-side list,
    // x < 0 into Q's, so the frozen codebook SPLITS a true neighbor
    // cluster across lists (the silent-recall-decay failure mode).
    // The x-offsets fan the members angularly with 0.1-steps and an
    // asymmetric ±-side offset (0.5 vs 0.55): every cosine to the
    // queries below is distinct by ≥ ~5 fs units at the top-5
    // boundary (no floor knife-edges), and the TRUE top-5 provably
    // interleaves both sides (ids 0,2,1,4,3 shaped)
    val blobB = (0 to 39).map { i =>
      val x = if (i % 2 == 0) 0.5 + 0.1 * (i / 2) else -(0.55 + 0.1 * (i / 2))
      (i.toLong, v(x, 10.0, 0, 0))
    }
    Similarity.appendToIvfIndex(blobB.toDF("vec_id", "embedding"), "ivfdrift_spec")
    val r1 = Similarity.ivfDriftReport(spark, "ivfdrift_spec").head()
    assert(r1.getAs[Double]("dist_growth") > 10.0,
      s"far-mass appends must explode mean assign-distance, got ${r1.getAs[Double]("dist_growth")}")
    assert(Similarity.ivfNeedsRecluster(spark, "ivfdrift_spec"),
      "the documented threshold rule must fire after the skewed append")

    // recall@5 at nprobe=1 for B-targeted queries sitting just off
    // the fan's axis: their true top-5 spans BOTH sides of the split
    // (so the drifted index provably misses), vs exact truth ranked
    // EXACTLY as ivfAgainstIndex ranks (floor-1e4 cos, id tie-break)
    val queries = (0 to 3).map { i =>
      (1000L + i, v(0.01 * (i + 1), 10.0, 0, 0))
    }
    val corpus = (blobP ++ blobQ ++ blobB).map { case (id, a) => (id, a.map(_.toDouble)) }
    def cosFs(a: Array[Double], b: Array[Double]): Long = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      math.floor(10000.0 * dot / (na * nb)).toLong
    }
    def trueTop5(q: Array[Float]): Set[Long] = {
      val qd = q.map(_.toDouble)
      corpus.map { case (id, cv) => (id, cosFs(qd, cv)) }
        .sortBy { case (id, c) => (-c, id) }.take(5).map(_._1).toSet
    }
    def recallAtProbe1(): Double = {
      val got = Similarity.ivfAgainstIndex(queries.toDF("vec_id", "embedding"),
          "ivfdrift_spec", nprobe = 1, k = 5)
        .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("c_id")))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      queries.map { case (qid, qv) =>
        val t = trueTop5(qv)
        got.getOrElse(qid, Set.empty[Long]).count(t.contains).toDouble / t.size
      }.sum / queries.size
    }
    val before = recallAtProbe1()
    Similarity.reclusterIvfIndex(spark, "ivfdrift_spec", iters = 8)
    val after = recallAtProbe1()
    assert(spark.table("ivfdrift_spec_lists").count() == 80,
      "recluster must preserve every stored vector")
    assert(before <= 0.8, s"drifted index should measurably miss at nprobe=1, recall $before")
    assert(after > before && after >= 0.99,
      s"recluster must restore nprobe=1 recall (before $before, after $after)")
    assert(!Similarity.ivfNeedsRecluster(spark, "ivfdrift_spec"),
      "recluster must reset the drift baseline")
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
