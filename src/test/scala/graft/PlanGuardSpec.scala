package graft

/** Whole-suite plan regression guard: no operator may introduce an
  * UNBOUNDED cartesian / nested-loop join. One allowlisted query
  * carries one by design, with a bounded build side:
  *
  *  - `sim_topk_cosine`: the brute ANN baseline broadcasts its
  *    BOUNDED query set (nQueries rows) against the corpus with a
  *    non-equi predicate — cost O(queries × corpus), the declared
  *    exact baseline the approximate paths are gated against.
  *
  * (`sim_recall` used to be allowlisted for two broadcast cross joins
  * of 1-row aggregate frames; since it evaluates its gate eagerly for
  * cache hygiene, the returned frame is a LocalRelation and those
  * bounded joins run inside the operator, out of this guard's sight.)
  *
  * Everything else — every join in the relational suite, every LSH
  * candidate generator, the temporal joins — must stay hash/merge
  * shaped. A future operator that accidentally plans a cross join
  * (e.g. a join key typo turning an equi-join into a filter) fails
  * here with its plan printed.
  */
class PlanGuardSpec extends SparkSpec {

  /** `sim_pq_topk` shares `sim_topk_cosine`'s declared shape: the ADC
    * scorer broadcasts its BOUNDED query set (nQueries rows, each
    * carrying its m·ks lookup table) against the code frame with the
    * same non-equi self-exclusion predicate.
    */
  private val boundedByDesign = Set("sim_topk_cosine", "sim_pq_topk")

  test("no unbounded cartesian or nested-loop join anywhere in the query suite") {
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
      val hasCross = plan.contains("CartesianProduct") || plan.contains("BroadcastNestedLoop")
      if (boundedByDesign(name))
        assert(hasCross, s"$name is allowlisted for a bounded cross join but has none — " +
          "its plan changed; re-audit and update the allowlist")
      else
        assert(!hasCross, s"$name plans an unbounded cross join:\n$plan")
    }
  }
}
