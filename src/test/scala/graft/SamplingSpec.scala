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

  test("sampling plans are pure map-side (no shuffle before the output sort)") {
    val plan = Sampling.stratifiedSample(docs).queryExecution.executedPlan.toString
    // one Exchange allowed: the final rangepartitioning for ORDER BY
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges <= 1, s"expected only the output-sort exchange:\n$plan")
  }
}
