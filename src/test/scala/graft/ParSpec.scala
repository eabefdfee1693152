package graft

import java.nio.file.Files

import graft.operators.Par

/** Par.spread property: repartition ONLY the single-file/small-scan
  * case — a no-op (reference-equal result, no added exchange) on
  * multi-file inputs, pre-shuffled frames, and in-memory data.
  */
class ParSpec extends SparkSpec {
  import spark.implicits._

  test("spread unlocks a single small parquet file to session parallelism") {
    val dir = Files.createTempDirectory("graft_par").toString + "/one"
    (1L to 100L).toDF("id").coalesce(1).write.parquet(dir)
    val df = spark.read.parquet(dir)
    val out = Par.spread(df)
    assert(out ne df, "single-file scan must be repartitioned")
    assert(out.rdd.getNumPartitions == spark.sparkContext.defaultParallelism)
  }

  test("spread is a no-op on a multi-file input (the real-cluster shape)") {
    val dir = Files.createTempDirectory("graft_par").toString + "/many"
    (1L to 1000L).toDF("id").repartition(8).write.parquet(dir)
    val df = spark.read.parquet(dir)
    // 8 files ≥ defaultParallelism (4): already parallel, untouched
    assert(Par.spread(df) eq df, "multi-file scan must pass through unchanged")
  }

  test("spread is a no-op on a pre-shuffled frame (no redundant exchange)") {
    val dir = Files.createTempDirectory("graft_par").toString + "/one2"
    (1L to 100L).toDF("id").coalesce(1).write.parquet(dir)
    val df = spark.read.parquet(dir).repartition(2)
    assert(Par.spread(df) eq df, "caller-repartitioned frame must pass through unchanged")
  }

  test("spread still unlocks a coalesced frame (coalesce NARROWS, it is not a pre-shuffle)") {
    val dir = Files.createTempDirectory("graft_par").toString + "/one3"
    (1L to 100L).toDF("id").coalesce(1).write.parquet(dir)
    // coalesce builds the same Repartition node with shuffle=false —
    // it must NOT be mistaken for caller-managed parallelism
    val df = spark.read.parquet(dir).coalesce(1)
    val out = Par.spread(df)
    assert(out ne df, "a coalesced single-split frame is the exact case spread exists to fix")
    assert(out.rdd.getNumPartitions == spark.sparkContext.defaultParallelism)
  }

  test("spread is a no-op on in-memory frames (no file scan underneath)") {
    val df = (1L to 10L).toDF("id")
    assert(Par.spread(df) eq df)
  }

  test("a repartitioned join leg does not mask the OTHER leg's single-file scan") {
    val base = Files.createTempDirectory("graft_par").toString
    (1L to 100L).toDF("id").coalesce(1).write.parquet(s"$base/narrow")
    (1L to 100L).toDF("id").coalesce(1).write.parquet(s"$base/wide")
    val narrow = spark.read.parquet(s"$base/narrow")
    val wide = spark.read.parquet(s"$base/wide").repartition(8)
    // one leg caller-managed, one leg a 1-split scan: coverage is per
    // ancestor chain, so the uncovered leg must still trigger spread
    val joined = narrow.join(wide, "id")
    assert(Par.spread(joined) ne joined,
      "the unparallel leg is exactly the case spread exists to fix")
    // and when EVERY scan sits under a shuffling repartition, no-op
    val bothCovered = narrow.repartition(4).join(wide, "id")
    assert(Par.spread(bothCovered) eq bothCovered,
      "fully covered plans must pass through unchanged")
  }
}
