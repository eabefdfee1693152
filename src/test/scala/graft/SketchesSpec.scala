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

  test("freq sketch: below the purge threshold estimates are exact with zero-width bounds") {
    val typed = planted.select(col("grp"), col("uid").cast("string").as("item"))
    val hh = Sketches.heavyHitters(typed, Seq("grp"), "item", k = 5, maxMapSize = 1024)
    val rows = hh.collect()
    // every uid in a group repeats the same number of times
    // (9000/3 rows over 100·(g+1) distinct), so estimates are the
    // exact per-item counts and the envelope is zero-width
    val expected = Map("g0" -> 30L, "g1" -> 15L, "g2" -> 10L)
    assert(rows.length == 15)
    rows.foreach { r =>
      val g = r.getAs[String]("grp")
      assert(r.getAs[Long]("estimate") == expected(g), s"exact-regime estimate in $g")
      assert(r.getAs[Long]("lower") == r.getAs[Long]("estimate") &&
        r.getAs[Long]("upper") == r.getAs[Long]("estimate"),
        "no purge → zero-width bounds")
    }
    val plan = Sketches.heavyHitters(typed, Seq("grp"), "item", 5).queryExecution.executedPlan.toString
    assert(plan.linesIterator.count(_.contains("ObjectHashAggregate")) >= 2,
      s"freq sketch agg must run partial (map-side) + final:\n$plan")
  }

  test("freq sketch saturated regime: planted heavies surface, every envelope contains the true count") {
    // 10 planted heavies at 5000 occurrences each over a 50k-item
    // uniform tail — distinct items (50010) >> maxMapSize (512), so
    // purges happen and the sketch is genuinely approximating
    val heavies = spark.range(0, 50000).select(
      concat(lit("h"), (col("id") % 10)).as("item"))
    val tail = spark.range(0, 150000).select(
      concat(lit("t"), (col("id") % 50000)).as("item"))
    val stream = heavies.unionByName(tail).withColumn("grp", lit("g"))
    val hh = Sketches.heavyHitters(stream, Seq("grp"), "item", k = 0, maxMapSize = 512)
    val rows = hh.collect()
    val reported = rows.map(_.getAs[String]("item")).toSet
    (0 until 10).foreach(i => assert(reported.contains(s"h$i"),
      s"planted heavy h$i (5000 occurrences) must be reported (NO_FALSE_NEGATIVES)"))
    val exact = stream.groupBy(col("item")).agg(count(lit(1)).as("n")).collect()
      .map(r => r.getAs[String]("item") -> r.getAs[Long]("n")).toMap
    rows.foreach { r =>
      val (item, lo, hi) = (r.getAs[String]("item"), r.getAs[Long]("lower"), r.getAs[Long]("upper"))
      assert(lo <= exact(item) && exact(item) <= hi,
        s"$item: true ${exact(item)} outside [$lo, $hi]")
      assert(hi > lo, "saturated regime must carry a real error envelope")
    }
  }

  test("freq sketch stored lifecycle: append accumulates counts; rollup merges with valid envelopes") {
    val typed = planted.select(col("grp"), col("uid").cast("string").as("item"))
      .withColumn("day", (col("item").substr(-1, 1).cast("long") % 2))
    val day0 = typed.filter(col("day") === 0).drop("day")
    val day1 = typed.filter(col("day") === 1).drop("day")
    Seq("fq_life_sketches", "fq_life_meta").foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    Sketches.writeFreqTable(spark, "fq_life", day0, Seq("grp"), "item", maxMapSize = 1024)
    Sketches.appendToFreqTable(spark, "fq_life", day1)
    val stored = Sketches.topKFromFreqTable(spark, "fq_life", k = 5).collect()
      .map(r => (r.getAs[String]("grp"), r.getAs[String]("item")) -> r.getAs[Long]("estimate")).toMap
    val direct = Sketches.heavyHitters(typed.drop("day"), Seq("grp"), "item", k = 5,
      maxMapSize = 1024).collect()
      .map(r => (r.getAs[String]("grp"), r.getAs[String]("item")) -> r.getAs[Long]("estimate")).toMap
    assert(stored == direct,
      s"stored append must accumulate to the one-shot sketch: $stored vs $direct")
    // rollup across grp: exact regime, so merged estimates are the
    // summed exact counts of each item across its groups (uids are
    // group-disjoint by construction → same per-item counts)
    val rolled = Sketches.rollupFreqTable(spark, "fq_life", Seq.empty, k = 3)
    assert(rolled.collect().forall(r =>
      r.getAs[Long]("lower") <= r.getAs[Long]("estimate") &&
        r.getAs[Long]("estimate") <= r.getAs[Long]("upper")))
    Seq("fq_life_sketches", "fq_life_meta").foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("freq append batch-id guard: replays and out-of-order batches no-op; the stamp rides the flip") {
    val typed = planted.select(col("grp"), col("uid").cast("string").as("item"))
    Seq("fq_eo_sketches", "fq_eo_meta").foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    Sketches.writeFreqTable(spark, "fq_eo", typed, Seq("grp"), "item", maxMapSize = 1024)
    def top = Sketches.topKFromFreqTable(spark, "fq_eo", k = 3).collect()
      .map(r => (r.getAs[String]("grp"), r.getAs[String]("item")) -> r.getAs[Long]("estimate")).toMap
    val base = top
    // batch 7 applies once; the SAME id redelivered must no-op (the
    // counts would otherwise double — frequencies are additive)
    Sketches.appendToFreqTable(spark, "fq_eo", typed, batchId = 7L)
    val after7 = top
    assert(after7 == base.map { case (k, v) => k -> 2 * v },
      "first application of batch 7 must double every count")
    Sketches.appendToFreqTable(spark, "fq_eo", typed, batchId = 7L)
    assert(top == after7, "replayed batch 7 must no-op against the stamp")
    Sketches.appendToFreqTable(spark, "fq_eo", typed, batchId = 3L)
    assert(top == after7, "an out-of-order lower id is a replay and must no-op")
    // a NEW id applies, and an unguarded append (-1) keeps the stamp
    Sketches.appendToFreqTable(spark, "fq_eo", typed, batchId = 8L)
    assert(top == base.map { case (k, v) => k -> 3 * v })
    Sketches.appendToFreqTable(spark, "fq_eo", typed)
    assert(top == base.map { case (k, v) => k -> 4 * v },
      "an unguarded append must still apply")
    Sketches.appendToFreqTable(spark, "fq_eo", typed, batchId = 8L)
    assert(top == base.map { case (k, v) => k -> 4 * v },
      "the stamp must survive an unguarded append")
    Seq("fq_eo_sketches", "fq_eo_meta").foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("quantile sketch: rank-exact regime matches exact order statistics; merged path honors the bound") {
    // 3 groups × 2000 values each — ε·n = 0.2 < 1, so every query is
    // rank-exact: the returned value IS an exact order statistic
    val vals = spark.range(0, 6000).select(
      concat(lit("g"), col("id") % 3).as("grp"),
      // per-group values are a shuffled permutation of 0..1999 (id/3
      // strides the group; multiply by a unit mod 2000 to de-order)
      (((col("id") / 3) * 7) % 2000).cast("double").as("v"))
    val out = Sketches.quantilesByGroup(vals, Seq("grp"), "v", Seq(0.5, 0.9, 0.99)).collect()
    assert(out.length == 3)
    out.foreach { r =>
      // exact order statistics of 0..1999 at GK's rank convention —
      // within one rank of q·n, and rank-exactness pins the value to
      // an integer in that window
      assert(math.abs(r.getAs[Double]("p50") - 1000.0) <= 1.0, s"p50 ${r.getAs[Double]("p50")}")
      assert(math.abs(r.getAs[Double]("p90") - 1800.0) <= 1.0, s"p90 ${r.getAs[Double]("p90")}")
      assert(math.abs(r.getAs[Double]("p99") - 1980.0) <= 1.0, s"p99 ${r.getAs[Double]("p99")}")
    }
    val plan = Sketches.quantilesByGroup(vals, Seq("grp"), "v", Seq(0.5))
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.count(_.contains("ObjectHashAggregate")) >= 2,
      s"quantile sketch agg must run partial (map-side) + final:\n$plan")
  }

  test("quantile stored lifecycle: append + rollup answer from summaries; batch-id guard holds") {
    val vals = spark.range(0, 6000).select(
      concat(lit("g"), col("id") % 3).as("grp"),
      (((col("id") / 3) * 7) % 2000).cast("double").as("v"),
      (col("id") % 2).as("day"))
    Seq("qt_life_sketches", "qt_life_meta").foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    Sketches.writeQuantileTable(spark, "qt_life",
      vals.filter(col("day") === 0).drop("day"), Seq("grp"), "v")
    Sketches.appendToQuantileTable(spark, "qt_life",
      vals.filter(col("day") === 1).drop("day"), batchId = 1L)
    def stored = Sketches.quantilesFromTable(spark, "qt_life", Seq(0.5, 0.9)).collect()
      .map(r => r.getAs[String]("grp") ->
        (r.getAs[Double]("p50"), r.getAs[Double]("p90"))).toMap
    val afterAppend = stored
    afterAppend.values.foreach { case (p50, p90) =>
      assert(math.abs(p50 - 1000.0) <= 2.0 && math.abs(p90 - 1800.0) <= 2.0,
        s"stored summaries must answer near the exact order statistics ($p50, $p90)")
    }
    // replayed batch: summaries are weight-additive — the stamp must
    // reject it (a replay would pull every quantile toward day 1)
    Sketches.appendToQuantileTable(spark, "qt_life",
      vals.filter(col("day") === 1).drop("day"), batchId = 1L)
    assert(stored == afterAppend, "replayed batch must no-op against the stamp")
    // rollup across groups: same value distribution per group →
    // merged quantiles stay near the same order statistics
    val rolled = Sketches.rollupQuantileTable(spark, "qt_life", Seq.empty, Seq(0.5)).collect()
    assert(rolled.length == 1 && math.abs(rolled(0).getAs[Double]("p50") - 1000.0) <= 2.0)
    Seq("qt_life_sketches", "qt_life_meta").foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("quantile gate keys: per-type percentiles emit; measured rank error passes the gate") {
    val out = Sketches.quantilesByType(spark, sfDir).collect()
    assert(out.nonEmpty && out.forall(r => r.getAs[Double]("p50") <= r.getAs[Double]("p90")
      && r.getAs[Double]("p90") <= r.getAs[Double]("p99")))
    val gate = Sketches.quantilesGate(spark, sfDir).collect()
    assert(gate.length == 1 && gate(0).getAs[Int]("pass") == 1)
  }

  test("theta set algebra: exact mode matches planted intersections/differences; plan partial-merges") {
    // planted audiences: A = 0..599, B = 300..899 → |A|=600, |B|=600,
    // |A∩B|=300, |A\B|=300 — all below nominalEntries → exact mode
    val rows = spark.range(0, 600).select(lit("a").as("side"), col("id").as("uid"))
      .unionByName(spark.range(300, 900).select(lit("b").as("side"), col("id").as("uid")))
      .withColumn("grp", lit("g"))
    val sk = rows.groupBy(col("grp")).agg(
      Sketches.thetaSketch(when(col("side") === "a", col("uid"))).as("sa"),
      Sketches.thetaSketch(when(col("side") === "b", col("uid"))).as("sb"))
    val out = sk.select(
      Sketches.thetaSummary(col("sa")).as("a"),
      Sketches.thetaSummary(col("sb")).as("b"),
      Sketches.thetaSummary(Sketches.thetaIntersect(col("sa"), col("sb"))).as("i"),
      Sketches.thetaSummary(Sketches.thetaAnotB(col("sa"), col("sb"))).as("d"))
      .collect()(0)
    def est(f: String) = out.getAs[org.apache.spark.sql.Row](f).getAs[Long]("estimate")
    def width(f: String) = {
      val r = out.getAs[org.apache.spark.sql.Row](f)
      r.getAs[Long]("upper") - r.getAs[Long]("lower")
    }
    assert(est("a") == 600L && est("b") == 600L && est("i") == 300L && est("d") == 300L,
      s"exact-mode set algebra must be exact: ${est("a")}/${est("b")}/${est("i")}/${est("d")}")
    Seq("a", "b", "i", "d").foreach(f => assert(width(f) == 0L,
      s"exact mode must report a zero-width envelope for $f"))
    val plan = sk.queryExecution.executedPlan.toString
    assert(plan.linesIterator.count(_.contains("ObjectHashAggregate")) >= 2,
      s"theta agg must run partial (map-side) + final:\n$plan")
  }

  test("theta estimation regime: true overlap inside the result sketches' own envelopes") {
    // 200k vs 200k with 100k overlap through 1024-entry sketches —
    // deep estimation mode, including the harder intersection path
    val a = spark.range(0, 200000).select(lit("a").as("side"), col("id").as("uid"))
    val b = spark.range(100000, 300000).select(lit("b").as("side"), col("id").as("uid"))
    val sk = a.unionByName(b).withColumn("grp", lit("g")).groupBy(col("grp")).agg(
      Sketches.thetaSketch(when(col("side") === "a", col("uid")), 1024).as("sa"),
      Sketches.thetaSketch(when(col("side") === "b", col("uid")), 1024).as("sb"))
    val out = sk.select(
      Sketches.thetaSummary(col("sa")).as("a"),
      Sketches.thetaSummary(Sketches.thetaIntersect(col("sa"), col("sb"))).as("i"),
      Sketches.thetaSummary(Sketches.thetaAnotB(col("sa"), col("sb"))).as("d"))
      .collect()(0)
    def check(f: String, truth: Long): Unit = {
      val r = out.getAs[org.apache.spark.sql.Row](f)
      assert(r.getAs[Long]("lower") <= truth && truth <= r.getAs[Long]("upper"),
        s"$f: true $truth outside [${r.getAs[Long]("lower")}, ${r.getAs[Long]("upper")}]")
      assert(r.getAs[Long]("upper") > r.getAs[Long]("lower"),
        s"$f must carry a real envelope in estimation mode")
      assert(r.getAs[Long]("estimate") != truth || f == "a",
        s"$f: estimation mode should rarely be exactly right (regime sanity)")
    }
    check("a", 200000L); check("i", 100000L); check("d", 100000L)
  }

  test("theta gate keys: daily overlap matches exact flag sums; envelope gate passes") {
    val daily = Sketches.setOverlapDaily(spark, sfDir).collect()
    assert(daily.nonEmpty)
    val ev = Tables.events(spark, sfDir)
      .filter(col("event_type").isin("click", "purchase"))
      .withColumn("d", unix_timestamp(date_trunc("day", col("ts"))))
    val exact = ev.groupBy(col("d"), col("user_id"))
      .agg(max(when(col("event_type") === "click", 1L).otherwise(0L)).as("c"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("p"))
      .groupBy(col("d"))
      .agg(sum(col("c")).as("n_click"), sum(col("p")).as("n_purchase"),
        sum(col("c") * col("p")).as("n_both"),
        sum(col("c") * (lit(1L) - col("p"))).as("n_click_only")).collect()
      .map(r => r.getAs[Long]("d") -> (r.getAs[Long]("n_click"), r.getAs[Long]("n_purchase"),
        r.getAs[Long]("n_both"), r.getAs[Long]("n_click_only"))).toMap
    daily.foreach { r =>
      val t = exact(r.getAs[Long]("d"))
      assert((r.getAs[Long]("n_click"), r.getAs[Long]("n_purchase"),
        r.getAs[Long]("n_both"), r.getAs[Long]("n_click_only")) == t,
        s"gate-scale theta must be exact on day ${r.getAs[Long]("d")}")
    }
    val gate = Sketches.setOverlapGate(spark, sfDir).collect()
    assert(gate.length == 1 && gate(0).getAs[Int]("pass") == 1)
  }

  test("heavy-hitter gate keys: sketch top-10 matches exact frequencies; bounds gate passes") {
    val hh = Sketches.heavyHitterTokens(spark, sfDir).collect()
    assert(hh.nonEmpty)
    val toks = Tables.documents(spark, sfDir)
      .select(col("source"), explode(split(col("text"), " ")).as("token"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("source"))
      .orderBy(col("n_occurrences").desc, col("token"))
    val exact = toks.groupBy(col("source"), col("token"))
      .agg(count(lit(1)).as("n_occurrences"))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 10)
      .select(col("source"), col("token"), col("n_occurrences")).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[String]("token")) -> r.getAs[Long]("n_occurrences"))
      .toMap
    assert(hh.length == exact.size)
    hh.foreach { r =>
      val k = (r.getAs[String]("source"), r.getAs[String]("token"))
      assert(exact.get(k).contains(r.getAs[Long]("n_occurrences")),
        s"gate-scale heavy hitters must be exact: $k")
    }
    val gate = Sketches.heavyHittersGate(spark, sfDir).collect()
    assert(gate.length == 1 && gate(0).getAs[Int]("pass") == 1)
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

  test("theta stored lifecycle: funnel answers from the stored table at any grain; replay is a no-op") {
    Seq("thf_sketches", "thf_meta").foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    // planted cohorts, exact mode (≪ nominalEntries distinct):
    //   day 0: clickers 0–299, purchasers 200–399
    //   day 1: clickers 0–99,  purchasers 50–149
    def rows(day: Long, click: Range, purchase: Range) =
      click.map(u => ("click", day, u.toLong)) ++
        purchase.map(u => ("purchase", day, u.toLong))
    val day0 = rows(0L, 0 until 300, 200 until 400).toDF("cohort", "d", "uid")
    val day1 = rows(1L, 0 until 100, 50 until 150).toDF("cohort", "d", "uid")
    Sketches.writeThetaTable(spark, "thf", day0, Seq("cohort", "d"), "uid")
    Sketches.appendToThetaTable(spark, "thf", day1)
    def funnelByDay = Sketches
      .overlapFromThetaTable(spark, "thf", "cohort", "click", "purchase", Seq("d"))
      .collect().map(r => r.getAs[Long]("d") ->
        ((r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
          r.getAs[Long]("n_both"), r.getAs[Long]("n_a_only")))).toMap
    val byDay = funnelByDay
    assert(byDay == Map(0L -> ((300L, 200L, 100L, 200L)), 1L -> ((100L, 100L, 50L, 50L))),
      s"per-day funnel from stored sketches must be exact in the exact regime, got $byDay")
    // all-time grain (keyCols empty): cohort sketches union across days
    // first — clickers 0–299, purchasers 50–149 ∪ 200–399
    val all = Sketches
      .overlapFromThetaTable(spark, "thf", "cohort", "click", "purchase", Seq.empty)
      .collect()(0)
    assert((all.getAs[Long]("n_a"), all.getAs[Long]("n_b"),
      all.getAs[Long]("n_both"), all.getAs[Long]("n_a_only")) == ((300L, 300L, 200L, 100L)),
      "the all-time funnel must union per-day sketches before intersecting")
    // day-range via the where filter (the retention question shape)
    val d1 = Sketches.overlapFromThetaTable(spark, "thf", "cohort", "click", "purchase",
      Seq.empty, col("d") === 1L).collect()(0)
    assert(d1.getAs[Long]("n_a") == 100L && d1.getAs[Long]("n_both") == 50L)
    // replay: theta insertion is idempotent — no estimate moves, no stamp needed
    Sketches.appendToThetaTable(spark, "thf", day1)
    assert(funnelByDay == byDay, "replaying an absorbed batch must not move any estimate")
    // plain read paths over the same store
    val rolled = Sketches.rollupThetaTable(spark, "thf", Seq("cohort")).collect()
      .map(r => r.getAs[String]("cohort") -> r.getAs[Long]("n_distinct")).toMap
    assert(rolled == Map("click" -> 300L, "purchase" -> 300L), s"cohort rollup: $rolled")
    assert(Sketches.estimateThetaTable(spark, "thf").count() == 4L)
    val bad = intercept[IllegalArgumentException] {
      Sketches.overlapFromThetaTable(spark, "thf", "cohort", "click", "purchase", Seq("cohort"))
    }
    assert(bad.getMessage.contains("non-cohort"))
    Seq("thf_sketches", "thf_meta").foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("theta stored funnel matches the direct per-day overlap at gate scale") {
    Seq("thg_sketches", "thg_meta").foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    val ev = Tables.events(spark, sfDir)
      .filter(col("event_type").isin("click", "purchase"))
      .withColumn("d", unix_timestamp(date_trunc("day", col("ts"))))
      .select(col("event_type"), col("d"), col("user_id"))
    Sketches.writeThetaTable(spark, "thg", ev, Seq("event_type", "d"), "user_id")
    val stored = Sketches
      .overlapFromThetaTable(spark, "thg", "event_type", "click", "purchase", Seq("d"))
      .collect().map(r => r.getAs[Long]("d") ->
        ((r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
          r.getAs[Long]("n_both"), r.getAs[Long]("n_a_only")))).toMap
    val direct = Sketches.setOverlapDaily(spark, sfDir).collect()
      .map(r => r.getAs[Long]("d") ->
        ((r.getAs[Long]("n_click"), r.getAs[Long]("n_purchase"),
          r.getAs[Long]("n_both"), r.getAs[Long]("n_click_only")))).toMap
    assert(stored == direct,
      "the stored funnel must reproduce the direct one-pass overlap at gate scale")
    Seq("thg_sketches", "thg_meta").foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("N-step funnel: cumulative intersections match exact flag products at gate scale; stored twin at any grain") {
    // direct one-pass form vs the exact per-(day, user) flag products
    val funnel = Sketches.funnelDaily(spark, sfDir).collect()
      .map(r => r.getAs[Long]("d") -> ((r.getAs[Long]("n_view"),
        r.getAs[Long]("n_view_click"), r.getAs[Long]("n_view_click_purchase")))).toMap
    val exact = Tables.events(spark, sfDir)
      .filter(col("event_type").isin("view", "click", "purchase"))
      .withColumn("d", unix_timestamp(date_trunc("day", col("ts"))))
      .groupBy(col("d"), col("user_id"))
      .agg(max(when(col("event_type") === "view", 1L).otherwise(0L)).as("s0"),
        max(when(col("event_type") === "click", 1L).otherwise(0L)).as("s1"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("s2"))
      .groupBy(col("d"))
      .agg(sum(col("s0")).as("v"), sum(col("s0") * col("s1")).as("vc"),
        sum(col("s0") * col("s1") * col("s2")).as("vcp"))
      .collect().map(r => r.getAs[Long]("d") ->
        ((r.getAs[Long]("v"), r.getAs[Long]("vc"), r.getAs[Long]("vcp")))).toMap
    assert(funnel == exact,
      "gate-scale audiences are exact-mode sketches: every prefix must match the flag products")
    assert(funnel.values.forall { case (v, vc, vcp) => v >= vc && vc >= vcp },
      "funnel prefixes must be monotonically non-increasing")
    // stored twin on a planted 3-cohort fixture, at two grains
    Seq("thn_sketches", "thn_meta").foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    //   day 0: viewers 0–399, clickers 100–299, purchasers 250–349
    //   day 1: viewers 0–99,  clickers 0–49,   purchasers 25–74
    val rows = ((0 until 400).map(u => ("view", 0L, u.toLong)) ++
      (100 until 300).map(u => ("click", 0L, u.toLong)) ++
      (250 until 350).map(u => ("purchase", 0L, u.toLong)) ++
      (0 until 100).map(u => ("view", 1L, u.toLong)) ++
      (0 until 50).map(u => ("click", 1L, u.toLong)) ++
      (25 until 75).map(u => ("purchase", 1L, u.toLong))).toDF("cohort", "d", "uid")
    Sketches.writeThetaTable(spark, "thn", rows, Seq("cohort", "d"), "uid")
    val byDay = Sketches.funnelFromThetaTable(spark, "thn", "cohort",
      Seq("view", "click", "purchase"), Seq("d")).collect()
      .map(r => r.getAs[Long]("d") -> ((r.getAs[Long]("n_view"),
        r.getAs[Long]("n_view_click"), r.getAs[Long]("n_view_click_purchase")))).toMap
    // day 0: V∩C = 100–299 (200), V∩C∩P = 250–299 (50)
    // day 1: V∩C = 0–49 (50), V∩C∩P = 25–49 (25)
    assert(byDay == Map(0L -> ((400L, 200L, 50L)), 1L -> ((100L, 50L, 25L))),
      s"per-day stored funnel must be exact in the exact regime, got $byDay")
    // all-time grain: V = 0–399 (400), C = 0–49 ∪ 100–299 (250),
    // P = 25–74 ∪ 250–349 (150); V∩C = 250, V∩C∩P = 50 + 25 = 75
    val all = Sketches.funnelFromThetaTable(spark, "thn", "cohort",
      Seq("view", "click", "purchase"), Seq.empty).collect()(0)
    assert((all.getAs[Long]("n_view"), all.getAs[Long]("n_view_click"),
      all.getAs[Long]("n_view_click_purchase")) == ((400L, 250L, 75L)),
      "the all-time funnel must union per-day step sketches before intersecting")
    Seq("thn_sketches", "thn_meta").foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("N-day retention: sketch algebra matches the exact distinct self-join; stored twin unions cohorts first") {
    val got = Sketches.retentionDaily(spark, sfDir).collect()
      .map(r => r.getAs[Long]("d") -> ((r.getAs[Long]("n_active"),
        r.getAs[Long]("n_ret_1d"), r.getAs[Long]("n_ret_7d")))).toMap
    val a = Tables.events(spark, sfDir)
      .select(unix_timestamp(date_trunc("day", col("ts"))).as("d"), col("user_id"))
      .distinct()
    val a1 = a.select((col("d") - 86400L).as("d"), col("user_id").as("u1"))
    val a7 = a.select((col("d") - 604800L).as("d"), col("user_id").as("u7"))
    val exact = a
      .join(a1, a("d") === a1("d") && col("user_id") === col("u1"), "left")
      .join(a7, a("d") === a7("d") && col("user_id") === col("u7"), "left")
      .groupBy(a("d")).agg(count(lit(1)).as("n"), count(col("u1")).as("n1"),
        count(col("u7")).as("n7"))
      .collect().map(r => r.getAs[Long]("d") -> ((r.getAs[Long]("n"),
        r.getAs[Long]("n1"), r.getAs[Long]("n7")))).toMap
    assert(got == exact,
      "gate-scale daily audiences are exact-mode sketches: retention must match the distinct join")
    assert(got.values.forall { case (n, n1, n7) => n >= n1 && n >= n7 })
    // stored twin: planted 2-cohort fixture — retention must see the
    // UNION of cohorts per day, and a where-filter restricts the days
    Seq("thr_sketches", "thr_meta").foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    //   day 0: A = 0–99, B = 50–149  (active 0–149)
    //   day 1: A = 0–49             (active 0–49   → ret_1d of day 0 = 50)
    //   day 2: B = 100–199          (active 100–199 → ret_1d of day 1 = 0)
    val rows = ((0 until 100).map(u => ("A", 0L, u.toLong)) ++
      (50 until 150).map(u => ("B", 0L, u.toLong)) ++
      (0 until 50).map(u => ("A", 86400L, u.toLong)) ++
      (100 until 200).map(u => ("B", 172800L, u.toLong))).toDF("cohort", "d", "uid")
    Sketches.writeThetaTable(spark, "thr", rows, Seq("cohort", "d"), "uid")
    val stored = Sketches.retentionFromThetaTable(spark, "thr", "d", Seq(1)).collect()
      .map(r => r.getAs[Long]("d") -> ((r.getAs[Long]("n_active"), r.getAs[Long]("n_ret_1d"))))
      .toMap
    assert(stored == Map(0L -> ((150L, 50L)), 86400L -> ((50L, 0L)), 172800L -> ((100L, 0L))),
      s"stored retention must union cohort rows per day before intersecting, got $stored")
    val filtered = Sketches.retentionFromThetaTable(spark, "thr", "d", Seq(1),
      where = col("d") >= 86400L).collect()
      .map(r => r.getAs[Long]("d") -> r.getAs[Long]("n_ret_1d")).toMap
    assert(filtered == Map(86400L -> 0L, 172800L -> 0L),
      "a where-filter must restrict which stored days participate")
    Seq("thr_sketches", "thr_meta").foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("pure-SQL sketch tier: heavy hitters, quantiles, theta funnel and the merge forms, partial-merge plan intact") {
    // heavy hitters from session SQL alone (exact regime at 4 items)
    (Seq.fill(30)("x") ++ Seq.fill(20)("y") ++ Seq.fill(10)("z") ++ Seq("w"))
      .map(("s1", _)).toDF("src", "item").createOrReplaceTempView("sql_items")
    val hh = spark.sql(
      """SELECT src, ex.item AS item, ex.estimate AS estimate FROM (
        |  SELECT src, explode(graft_freq_topk(graft_freq_sketch_agg(item, 64), 2)) AS ex
        |  FROM sql_items GROUP BY src)""".stripMargin)
    assert(hh.collect().map(r => (r.getString(1), r.getLong(2))).toSeq
      == Seq(("x", 30L), ("y", 20L)))
    val plan = hh.queryExecution.executedPlan.toString
    assert(plan.linesIterator.count(_.contains("ObjectHashAggregate")) >= 2,
      s"SQL-registered sketch agg must keep the partial+final plan:\n$plan")
    // per-day frequency sketches merged to all-time through the SQL merge form
    val merged = spark.sql(
      """SELECT ex.item AS item, ex.estimate AS estimate FROM (
        |  SELECT explode(graft_freq_topk(graft_freq_merge_agg(sk, 64), 1)) AS ex FROM (
        |    SELECT src, graft_freq_sketch_agg(item, 64) AS sk
        |    FROM sql_items GROUP BY src))""".stripMargin).collect()
    assert(merged.map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("x", 30L)))
    // GK quantiles (rank-exact regime) + the merge form
    spark.range(0, 1000)
      .select((col("id") % 2).cast("string").as("grp"), col("id").cast("double").as("v"))
      .createOrReplaceTempView("sql_vals")
    val p50 = spark.sql(
      """SELECT element_at(graft_quantile_query(graft_quantile_merge_agg(sk), array(0.5)), 1) AS p50
        |FROM (SELECT grp, graft_quantile_sketch_agg(v) AS sk FROM sql_vals GROUP BY grp)"""
        .stripMargin).collect()(0).getDouble(0)
    assert(math.abs(p50 - 500.0) <= 2.0, s"SQL quantile path returned $p50")
    // the funnel, SQL end to end: per-day cohort sketches → all-time
    // union → intersection/difference via the scalar set algebra
    ((0 until 300).map(u => ("click", 0L, u.toLong)) ++
      (200 until 400).map(u => ("purchase", 0L, u.toLong)) ++
      (0 until 100).map(u => ("click", 1L, u.toLong)))
      .toDF("cohort", "d", "uid").createOrReplaceTempView("sql_ev")
    val funnel = spark.sql(
      """SELECT graft_theta_summary(sa).estimate AS n_click,
        |       graft_theta_summary(graft_theta_intersect(sa, sb)).estimate AS n_both,
        |       graft_theta_summary(graft_theta_a_not_b(sa, sb)).estimate AS n_click_only
        |FROM (SELECT graft_theta_union_agg(sc) AS sa, graft_theta_union_agg(sp) AS sb FROM (
        |  SELECT d, graft_theta_sketch_agg(CASE WHEN cohort = 'click' THEN uid END) AS sc,
        |         graft_theta_sketch_agg(CASE WHEN cohort = 'purchase' THEN uid END) AS sp
        |  FROM sql_ev GROUP BY d))""".stripMargin).collect()(0)
    assert((funnel.getLong(0), funnel.getLong(1), funnel.getLong(2)) == ((300L, 100L, 200L)),
      s"SQL funnel must be exact in the exact regime, got $funnel")
    // geometry arguments are plan constants: a non-literal must be rejected
    val bad = intercept[Exception] {
      spark.sql("SELECT graft_freq_topk(graft_freq_sketch_agg(item, length(item)), 1) FROM sql_items GROUP BY src").collect()
    }
    assert(bad.getMessage.contains("literal"), s"got: ${bad.getMessage}")
  }

  test("quantile column names carry the full quantile value; sub-percent quantiles stay distinct") {
    assert(Sketches.quantileColName(0.5) == "p50")
    assert(Sketches.quantileColName(0.99) == "p99")
    assert(Sketches.quantileColName(0.995) == "p99_5")
    assert(Sketches.quantileColName(0.001) == "p0_1")
    assert(Sketches.quantileColName(1.0) == "p100")
    val vals = Seq.tabulate(1000)(i => ("a", i.toDouble)).toDF("grp", "v")
    val cols = Sketches.quantilesByGroup(vals, Seq("grp"), "v", Seq(0.99, 0.995, 1.0)).columns
    assert(cols.toSeq == Seq("grp", "p99", "p99_5", "p100"),
      s"0.99/0.995/1.0 must not collapse onto one rounded label: ${cols.mkString(",")}")
    val dup = intercept[IllegalArgumentException] {
      Sketches.quantilesByGroup(vals, Seq("grp"), "v", Seq(0.5, 0.50))
    }
    assert(dup.getMessage.contains("duplicate"))
  }

  test("freq sketch rejects a non-string item column at analysis time") {
    val nums = Seq.tabulate(10)(i => ("g", i.toLong)).toDF("grp", "v")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      nums.groupBy(col("grp")).agg(Sketches.freqSketch(col("v")).as("sk")).collect()
    }
    assert(e.getMessage.contains("string item column"),
      s"expected the freq_sketch_agg type-check message, got: ${e.getMessage}")
  }

  test("stored meta survives group column names containing the old separator") {
    val df = Seq.tabulate(300)(i => (s"g${i % 3}", (i % 40).toLong))
      .toDF("grp,odd", "uid")
    Sketches.writeSketchTable(spark, "commagrp", df, Seq("grp,odd"), "uid")
    val est = Sketches.estimateSketchTable(spark, "commagrp").collect()
      .map(r => r.getAs[String]("grp,odd") -> r.getAs[Long]("n_distinct")).toMap
    assert(est == Map("g0" -> 40L, "g1" -> 40L, "g2" -> 40L),
      s"array-typed meta must round-trip a comma-bearing group column, got $est")
  }

  test("a legacy meta table with string group_cols reads via the split fallback") {
    // pre-r14 binaries wrote group_cols as a comma-joined STRING; the
    // readers must accept both encodings rather than force a stored
    // table rebuild (raw ClassCastException) on the old layout
    Seq("sk_leg_sketches", "sk_leg_meta").foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    val df = Seq(("g1", "a"), ("g1", "b"), ("g2", "a")).toDF("grp", "uid")
    Sketches.writeSketchTable(spark, "sk_leg", df, Seq("grp"), "uid")
    Seq((Sketches.DefaultLgK, "grp", "uid", 16))
      .toDF("lg_k", "group_cols", "value_col", "buckets")
      .write.mode("overwrite").saveAsTable("sk_leg_meta")
    def est = Sketches.estimateSketchTable(spark, "sk_leg").collect()
      .map(r => r.getAs[String]("grp") -> r.getAs[Long]("n_distinct")).toMap
    assert(est == Map("g1" -> 2L, "g2" -> 1L),
      "estimate must read through the legacy string meta")
    // append resolves geometry through the same fallback
    Sketches.appendToSketchTable(spark, "sk_leg", Seq(("g2", "b")).toDF("grp", "uid"))
    assert(est == Map("g1" -> 2L, "g2" -> 2L),
      "append must fold through the legacy string meta")
    Seq("sk_leg_sketches", "sk_leg_meta").foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }
}
