package graft

import org.apache.spark.sql.functions._

import graft.functions.HashFunctions
import graft.functions.TextFunctions.tokens

/** Native Catalyst expressions vs their pure-Column twins. */
class ExpressionsSpec extends SparkSpec {

  test("native simhash64 is bit-identical to the Column formulation on real docs") {
    val docs = Tables.documents(spark, sfDir)
    val both = docs.select(
      col("doc_id"),
      call_function("graft_simhash64", tokens(col("text"))).as("native"),
      HashFunctions.simhash64(tokens(col("text"))).as("columnar"))
    val diff = both.filter(col("native") =!= col("columnar")).count()
    assert(diff == 0, s"$diff docs disagree between native and Column simhash")
  }

  test("graft_simhash64 is callable from plain SQL via session extensions") {
    val r = spark.sql("SELECT graft_simhash64(array('a','b','c')) AS h").collect()(0).getLong(0)
    val expected = spark.sql("SELECT graft_simhash64(array('a','b','c')) AS h").collect()(0).getLong(0)
    assert(r == expected)
    // empty array: all votes tie at 0 → no bits set
    assert(spark.sql("SELECT graft_simhash64(array())").collect()(0).getLong(0) == 0L)
  }

  test("native jaccard_fs matches the Column formulation on all block pairs") {
    val d = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), array_distinct(split(col("text"), " ")).as("toks"))
    val pairs = d.as("a").join(d.as("b"),
      col("a.lang") === col("b.lang") && col("a.doc_id") < col("b.doc_id"))
    val colJac = floor(lit(10000.0) * (size(array_intersect(col("a.toks"), col("b.toks")))
      .cast("double") / size(array_union(col("a.toks"), col("b.toks")))))
    val diff = pairs.select(
        call_function("graft_jaccard_fs", col("a.toks"), col("b.toks")).as("native"),
        colJac.as("columnar"))
      .filter(col("native") =!= col("columnar")).count()
    assert(diff == 0, s"$diff pairs disagree between native and Column jaccard")
  }

  test("graft_jaccard_fs edge cases: identical, disjoint, empty") {
    val r = spark.sql(
      """SELECT graft_jaccard_fs(array('a','b'), array('a','b')) AS same,
        |       graft_jaccard_fs(array('a'), array('b')) AS disjoint,
        |       graft_jaccard_fs(array(), array()) AS empty""".stripMargin).collect()(0)
    // empty/empty → 0, matching the Column twin's floor(NaN).toLong
    assert(r.getLong(0) == 10000L && r.getLong(1) == 0L && r.getLong(2) == 0L)
  }

  test("native simhash stays inside whole-stage codegen") {
    val docs = Tables.documents(spark, sfDir)
    val plan = docs.select(call_function("graft_simhash64", tokens(col("text"))))
      .queryExecution.executedPlan.toString
    // the "*(n)" prefix marks operators fused into WholeStageCodegen
    assert(plan.contains("*(1) Project [graft_simhash64"), s"expected codegen'd project in:\n$plan")
  }
}
