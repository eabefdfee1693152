package graft

import graft.operators.Sampling

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = (0L until 2000L)
    .map(i => (i, s"src${i % 4}")).toDF("doc_id", "source")

  test("split is a deterministic total partition near the target fractions") {
    val a = Sampling.split(docs).collect().map(r => (r.getLong(0), r.getString(1)))
    val b = Sampling.split(docs.repartition(7)).collect().map(r => (r.getLong(0), r.getString(1)))
    assert(a.sorted.sameElements(b.sorted), "split must not depend on partitioning")
    val byLabel = a.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byLabel.values.sum == 2000)
    // 2-hex-char granularity: expect 75/12.5/12.5 ±5%
    assert(math.abs(byLabel("train") - 1500) < 100, s"train ${byLabel("train")}")
    assert(math.abs(byLabel("val") - 250) < 100)
    assert(math.abs(byLabel("test") - 250) < 100)
  }

  test("changing the salt redraws the split") {
    val a = Sampling.split(docs, salt = "a#").collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val b = Sampling.split(docs, salt = "b#").collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(a != b, "different salts must give different assignments")
  }

  test("stratified sample respects per-stratum fractions") {
    val out = Sampling.stratifiedSample(docs, fractions = Map("src0" -> 1.0, "src1" -> 0.0),
        defaultFrac = 0.5).collect()
      .map(r => r.getString(1)).groupBy(identity).view.mapValues(_.length).toMap
    assert(out("src0") == 500, "fraction 1.0 keeps every row")
    assert(!out.contains("src1"), "fraction 0.0 keeps none")
    assert(math.abs(out("src2") - 250) < 60, s"default 0.5 ≈ half, got ${out.get("src2")}")
  }

  test("hexThreshold edges: 0 keeps nothing, ≥1 keeps everything, width formats") {
    assert(Sampling.hexThreshold(0.0, 2) == "00")
    assert(Sampling.hexThreshold(1.0, 2) == "g", "≥1 sentinel sorts above every hex digit")
    assert(Sampling.hexThreshold(0.5, 4) == "8000")
    assert(Sampling.hexThreshold(0.25, 4) == "4000")
    assert(Sampling.hexThreshold(0.75, 2) == "c0")
  }

  test("capPerStratum: exact cap, light strata untouched, two-level ≡ one-level window") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    // src0..src3 carry 500 docs each; src_light only 7 — under any cap
    val light = (9000L until 9007L).map(i => (i, "src_light")).toDF("doc_id", "source")
    val d = docs.unionByName(light)
    val out = Sampling.capPerStratum(d, maxDocs = 20).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val bySrc = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(Seq("src0", "src1", "src2", "src3").forall(bySrc(_) == 20),
      s"heavy strata keep exactly the cap, got $bySrc")
    assert(bySrc("src_light") == 7, "light stratum keeps everything")
    assert(out.forall { case (_, _, r) => r >= 1 && r <= 20 })
    // the prefix-closure claim: the two-level refinement returns
    // EXACTLY the one-level stratum-wide window's lowest-20 set
    val oneLevel = d
      .withColumn("h", md5(concat(lit("graft#"), col("doc_id").cast("string"))))
      .withColumn("rnk", row_number()
        .over(Window.partitionBy(col("source")).orderBy(col("h"), col("doc_id"))).cast("long"))
      .filter(col("rnk") <= 20)
      .select(col("doc_id"), col("source"), col("rnk")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(out.toSet == oneLevel, "two-level ranking must be result-identical")
    // determinism + salt redraw
    val again = Sampling.capPerStratum(d, maxDocs = 20).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(again.toSet == out.toSet)
    val redrawn = Sampling.capPerStratum(d, maxDocs = 20, salt = "other#").collect()
      .map(_.getLong(0)).toSet
    assert(redrawn != out.map(_._1).toSet, "salt must redraw the kept set")
  }

  test("mixtureSample hits the recipe exactly: binding stratum, derived caps, unsatisfiable recipe → empty") {
    // src0..src3 have 500 docs each; src_scarce only 40. Recipe
    // 5/3/2 over (src0, src1, src_scarce), W = 10: the scarce stratum
    // binds — B = min(500·10//5, 500·10//3, 40·10//2) = 200, caps
    // (100, 60, 40): exact 50/30/20 proportions at the largest size
    val scarce = (9100L until 9140L).map(i => (i, "src_scarce")).toDF("doc_id", "source")
    val d = docs.unionByName(scarce)
    val weights = Map("src0" -> 5L, "src1" -> 3L, "src_scarce" -> 2L)
    val out = Sampling.mixtureSample(d, weights).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val bySrc = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(bySrc == Map("src0" -> 100, "src1" -> 60, "src_scarce" -> 40),
      s"caps must realize the 50/30/20 recipe at the binding budget, got $bySrc")
    assert(out.forall { case (_, s, r) => r >= 1 && r <= bySrc(s) })
    // unweighted strata (src2, src3) are dropped entirely
    assert(!out.exists(o => o._2 == "src2" || o._2 == "src3"))
    // selection = the per-stratum lowest-md5 prefix (same selector as
    // capPerStratum): kept set is exactly ranks 1..cap_s
    val expected = Sampling.capPerStratum(
      d.filter(org.apache.spark.sql.functions.col("source") === "src0"),
      maxDocs = 100).collect().map(_.getLong(0)).toSet
    assert(out.filter(_._2 == "src0").map(_._1).toSet == expected,
      "mixture selection within a stratum must equal the capped lowest-md5 prefix")
    // determinism
    assert(Sampling.mixtureSample(d, weights).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet == out.toSet)
    // a recipe naming an absent source is unsatisfiable: budget 0,
    // empty output — NOT a silent renormalization around the gap
    assert(Sampling.mixtureSample(d, weights + ("src_missing" -> 1L)).count() == 0)
  }

  test("mixtureByTokens: integer token budgets, one-doc overshoot bound, absent stratum zeroes") {
    // A: two 4-token docs (T=8); B: two 2-token docs (T=4); 1:1 →
    // budget = min(8·2/1, 4·2/1) = 8, caps A=4 B=4: A admits exactly
    // ONE 4-token doc (the second's cum_before = 4 is not < 4), B both
    val d = Seq(
      (1L, "a1 a2 a3 a4", "A"), (2L, "b1 b2 b3 b4", "A"),
      (3L, "c1 c2", "B"), (4L, "d1 d2", "B")).toDF("doc_id", "text", "source")
    val out = Sampling.mixtureByTokens(d, Map("A" -> 1L, "B" -> 1L)).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"), r.getAs[Long]("n_tok")))
    val byStr = out.groupBy(_._2)
    assert(byStr("A").length == 1 && byStr("A").map(_._3).sum == 4L,
      s"token cap 4 admits exactly one 4-token A doc, got ${byStr.get("A")}")
    assert(byStr("B").length == 2 && byStr("B").map(_._3).sum == 4L)
    // overshoot bound: C holds two 3-token docs (T=6); A:1 C:1 →
    // budget = min(16, 12) = 12, caps 6/6 — C's second doc STARTS at
    // cum 3 < 6 so both survive: 6 tokens ≤ cap, while A overshoots
    // nothing (4 + 4 = 8 > 6? second A doc starts at 4 < 6 → 8 tokens,
    // overshoot 2 = less than one doc's 4)
    val dc = d.union(Seq((5L, "e1 e2 e3", "C"), (6L, "f1 f2 f3", "C")).toDF("doc_id", "text", "source"))
    val ac = Sampling.mixtureByTokens(dc, Map("A" -> 1L, "C" -> 1L)).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_tok")))
    val sums = ac.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(sums("C") == 6L, s"C fills its cap exactly, got $sums")
    assert(sums("A") == 8L && 8L - 6L < 4L,
      s"A overshoots its 6-token cap by less than one doc, got $sums")
    // absent weighted stratum → budget 0 → empty (no silent renormalize)
    assert(Sampling.mixtureByTokens(d, Map("A" -> 1L, "Z" -> 1L)).count() == 0L)
  }

  test("mixtureByTokens: two-level bucket-offset cumsum equals the single-window semantics") {
    // independent reference: same salt hash + caps computed in Scala
    // with ONE global per-stratum cumulative sum
    val docs = (1 to 90).map { i =>
      (i.toLong, (1 to (i % 7 + 1)).map(j => s"t$j").mkString(" "), s"s${i % 3}")
    }
    val weights = Map("s0" -> 3L, "s1" -> 2L, "s2" -> 1L)
    val got = Sampling.mixtureByTokens(docs.toDF("doc_id", "text", "source"), weights)
      .collect().map(r => r.getAs[Long]("doc_id")).toSet
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val rows = docs.map { case (id, text, src) =>
      (id, src, text.split(" ").length.toLong, md5hex(s"graft#$id")) }
    val totals = rows.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val bigW = weights.values.sum
    val budget = weights.map { case (s, w) => totals.getOrElse(s, 0L) * bigW / w }.min
    val expect = weights.keys.flatMap { s =>
      val cap = budget * weights(s) / bigW
      var cum = 0L
      rows.filter(_._2 == s).sortBy(r => (r._4, r._1)).takeWhile { r =>
        val ok = cum < cap; cum += r._3; ok
      }.map(_._1)
    }.toSet
    assert(got == expect, s"two-level ≡ reference; only-in-got=${got -- expect} only-in-ref=${expect -- got}")
  }

  test("weightedSample: exact k, partitioning-stable, weight-monotone, distribution tracks weights") {
    import org.apache.spark.sql.functions._
    val weighted = docs.withColumn("w", when(col("source") === "src0", 9).otherwise(1))
    val out = Sampling.weightedSample(weighted, k = 200, weight = col("w"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.length == 200)
    assert(out.map(_._3).sorted.toSeq == (1L to 200L), "ranks must be a 1..k permutation")
    val again = Sampling.weightedSample(weighted.repartition(13), k = 200, weight = col("w"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == again.toSeq, "the sample must not depend on partitioning")
    // weight-9 docs (500 of 2000) must dominate the sample: E ≈ 9/12
    // of 200 without-replacement-adjusted; require a loose > 1/2
    val heavy = out.count(_._2 == 9L)
    assert(heavy > 100, s"weight-9 docs should dominate the 200-sample, got $heavy")
    // monotonicity: raising ONE doc's weight leaves every other key
    // unchanged and only GROWS its own (a max over a superset of
    // draws) — so the sample is either unchanged, or the boosted doc
    // displaces exactly the old boundary rank
    val outIds = out.map(_._1).toSet
    val missing = (0L until 2000L).find(!outIds.contains(_)).get
    val boundary = out.find(_._3 == 200L).get._1
    val boosted = docs.withColumn("w",
      when(col("source") === "src0", 9).otherwise(1) +
        when(col("doc_id") === missing, 55).otherwise(0))
    val withBoost = Sampling.weightedSample(boosted, k = 200, weight = col("w"))
      .collect().map(_.getLong(0)).toSet
    assert(withBoost == outIds || withBoost == outIds - boundary + missing,
      "boosting one doc's weight must displace at most the boundary rank")
    // all weights equal ⟹ reduces to the unweighted lowest/highest-hash
    // draw: doubling every weight must then leave the sample unchanged
    // in LAW but not digest-for-digest — instead pin the exact-w case:
    val w1 = Sampling.weightedSample(docs, k = 50, weight = lit(1)).collect().map(_.getLong(0)).toSet
    val w1b = Sampling.weightedSample(docs.repartition(5), k = 50, weight = lit(1))
      .collect().map(_.getLong(0)).toSet
    assert(w1 == w1b && w1.size == 50)
    // out-of-range weights raise instead of silently reshaping
    intercept[Exception] {
      Sampling.weightedSample(docs, k = 5, weight = lit(0)).collect()
    }
  }

  test("epochMix: exact whole+fractional copies, copy ordinals, recipe-only sources") {
    import org.apache.spark.sql.functions._
    val out = Sampling.epochMix(docs, Map("src0" -> 2.5, "src1" -> 1.0, "src2" -> 0.25))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // src3 is not in the recipe: dropped
    assert(out.forall(_._2 != "src3"))
    // every src1 doc appears exactly once (frac 0 ⟹ threshold "0000"
    // admits nobody)
    val bySrc = out.groupBy(_._2)
    assert(bySrc("src1").length == 500)
    assert(bySrc("src1").forall(_._3 == 1L))
    // src0: every doc 2 or 3 times; the 3-copy share is the exact
    // hex-threshold count (deterministic, ±0 — recompute it here)
    val perDoc0 = bySrc("src0").groupBy(_._1).view.mapValues(_.length).toMap
    assert(perDoc0.size == 500 && perDoc0.values.forall(n => n == 2 || n == 3))
    val expected3 = docs.filter(col("source") === "src0")
      .filter(substring(md5(concat(lit("graft#"), col("doc_id").cast("string"))), 1, 4)
        < Sampling.hexThreshold(0.5, 4)).count()
    assert(perDoc0.values.count(_ == 3) == expected3,
      "the fractional-copy set must be exactly the hex-threshold selection")
    // copy ordinals are 1..reps per doc
    assert(bySrc("src0").groupBy(_._1).values.forall(g =>
      g.map(_._3).sorted.toSeq == (1L to g.length)))
    // src2 at 0.25 epochs downsamples: only threshold-selected docs, once
    assert(bySrc.get("src2").forall(g => g.forall(_._3 == 1L) && g.length < 250))
    // partitioning stability
    val again = Sampling.epochMix(docs.repartition(11),
      Map("src0" -> 2.5, "src1" -> 1.0, "src2" -> 0.25))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq == again.toSeq)
  }

  test("sampling plans are pure map-side (no shuffle before the output sort)") {
    val plan = Sampling.stratifiedSample(docs).queryExecution.executedPlan.toString
    // one Exchange allowed: the final rangepartitioning for ORDER BY
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges <= 1, s"expected only the output-sort exchange:\n$plan")
  }
}
