package graft

import org.apache.spark.sql.functions._
import graft.operators.Sketches

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  // 3 groups × known distinct sets, with heavy row duplication so the
  // distinct is doing real work
  private def planted = Seq.tabulate(9000) { i =>
    val g = i % 3
    // i/3 strides 0,1,2,… within each group, so group g holds exactly
    // 100·(g+1) distinct uids (i % k over i ≡ g mod 3 would only hit
    // k/gcd(3,k) residues)
    (s"g$g", ((i / 3) % (100 * (g + 1))).toLong + g * 1000000L)
  }.toDF("grp", "uid")

  test("coupon-regime estimates are exact; shuffle carries sketches (partial ObjectHashAggregate)") {
    val out = Sketches.distinctByGroup(planted, Seq("grp"), "uid").collect()
      .map(r => r.getAs[String]("grp") -> r.getAs[Long]("n_distinct")).toMap
    assert(out == Map("g0" -> 100L, "g1" -> 200L, "g2" -> 300L),
      s"small-cardinality sketches sit in the exact coupon regime, got $out")
    val plan = Sketches.distinctByGroup(planted, Seq("grp"), "uid")
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.count(_.contains("ObjectHashAggregate")) >= 2,
      s"sketch agg must run partial (map-side) + final so the shuffle carries sketches:\n$plan")
  }

  test("estimate error stays within 3 sigma at 200k distinct values (past the coupon regime)") {
    val big = spark.range(0, 600000).select(
      (col("id") % 2).cast("string").as("grp"), (col("id") % 200000).as("uid"))
    val out = Sketches.distinctByGroup(big, Seq("grp"), "uid").collect()
      .map(r => r.getAs[String]("grp") -> r.getAs[Long]("n_distinct")).toMap
    val bound = 3.0 * 1.04 / math.sqrt(4096.0) // lgK 12
    Seq("0", "1").foreach { g =>
      val exact = 100000.0
      val rel = math.abs(out(g) - exact) / exact
      assert(rel <= bound, s"group $g: estimate ${out(g)} vs exact 100000 (rel $rel > $bound)")
      assert(rel > 0.0 || out(g) == 100000L, "sanity")
    }
    assert(out.values.exists(_ != 100000L),
      "at 100k distinct the sketch should actually be approximating (else the regime test is vacuous)")
  }

  test("rollup across days equals the direct coarse sketch (mergeability)") {
    val daily = planted.withColumn("day", col("uid") % 4)
    val sketches = Sketches.sketchByGroup(daily, Seq("grp", "day"), "uid")
    val rolled = Sketches.rollup(sketches, Seq("grp")).collect()
      .map(r => r.getAs[String]("grp") -> r.getAs[Long]("n_distinct")).toMap
    val direct = Sketches.distinctByGroup(daily, Seq("grp"), "uid").collect()
      .map(r => r.getAs[String]("grp") -> r.getAs[Long]("n_distinct")).toMap
    assert(rolled == direct,
      s"union of per-day sketches must match the direct sketch: $rolled vs $direct")
  }

  test("stored lifecycle: write day 1, append day 2, estimates match a full-corpus sketch; replay is a no-op") {
    val all = planted.withColumn("day", col("uid") % 2)
    val day0 = all.filter(col("day") === 0).drop("day")
    val day1 = all.filter(col("day") === 1).drop("day")
    spark.sql("DROP TABLE IF EXISTS sk_life_sketches")
    spark.sql("DROP TABLE IF EXISTS sk_life_meta")
    Sketches.writeSketchTable(spark, "sk_life", day0, Seq("grp"), "uid")
    Sketches.appendToSketchTable(spark, "sk_life", day1)
    def stored = Sketches.estimateSketchTable(spark, "sk_life").collect()
      .map(r => r.getAs[String]("grp") -> r.getAs[Long]("n_distinct")).toMap
    val full = Sketches.distinctByGroup(planted, Seq("grp"), "uid").collect()
      .map(r => r.getAs[String]("grp") -> r.getAs[Long]("n_distinct")).toMap
    assert(stored == full, s"stored-lifecycle estimates must match the one-shot sketch: $stored vs $full")
    // replayed batch: absorbed values are no-ops inside the sketch
    Sketches.appendToSketchTable(spark, "sk_life", day1)
    assert(stored == full, s"re-appending an absorbed batch must not move any estimate")
    // estimating from the store touches ZERO raw data by construction
    // (reads only the bounded sketch table); prove the rollup twin too
    val rolledStore = Sketches.rollupSketchTable(spark, "sk_life", Seq("grp")).collect()
      .map(r => r.getAs[String]("grp") -> r.getAs[Long]("n_distinct")).toMap
    assert(rolledStore == full)
  }

  test("gate keys: daily distinct matches exact counts at spec scale; honesty gate passes") {
    val daily = Sketches.distinctUsersDaily(spark, sfDir).collect()
    assert(daily.nonEmpty)
    val ev = Tables.events(spark, sfDir)
      .withColumn("d", unix_timestamp(date_trunc("day", col("ts"))))
    val exact = ev.groupBy(col("event_type"), col("d"))
      .agg(countDistinct(col("user_id")).as("n_users")).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("d")) -> r.getAs[Long]("n_users"))
      .toMap
    daily.foreach { r =>
      val k = (r.getAs[String]("event_type"), r.getAs[Long]("d"))
      assert(r.getAs[Long]("n_users") == exact(k),
        s"gate-scale cardinalities must sit in the exact coupon regime ($k)")
    }
    val gate = Sketches.distinctGate(spark, sfDir).collect()
    assert(gate.length == 1 && gate(0).getAs[Int]("pass") == 1)
  }
}
