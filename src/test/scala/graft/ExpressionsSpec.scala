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

  test("native simhash stays inside whole-stage codegen") {
    val docs = Tables.documents(spark, sfDir)
    val plan = docs.select(call_function("graft_simhash64", tokens(col("text"))))
      .queryExecution.executedPlan.toString
    // the "*(n)" prefix marks operators fused into WholeStageCodegen
    assert(plan.contains("*(1) Project [graft_simhash64"), s"expected codegen'd project in:\n$plan")
  }
}
