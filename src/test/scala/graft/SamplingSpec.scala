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

  test("sampling plans are pure map-side (no shuffle before the output sort)") {
    val plan = Sampling.stratifiedSample(docs).queryExecution.executedPlan.toString
    // one Exchange allowed: the final rangepartitioning for ORDER BY
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges <= 1, s"expected only the output-sort exchange:\n$plan")
  }
}
