package graft

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
