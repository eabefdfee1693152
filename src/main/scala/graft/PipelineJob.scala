package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Pipeline
import graft.sources.Sinks

/** CLI: run the full training-data curation pipeline over a document
  * parquet dir and land the curated corpus partitioned by
  * (split, lang) — the layout every downstream trainer reads with
  * partition pruning.
  *
  * Usage:
  *   tools/run.sh graft.PipelineJob <docsParquet> <outDir> [minQualityFs]
  */
object PipelineJob {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PipelineJob <docsParquet> <outDir> [minQualityFs]")
    val (in, out) = (args(0), args(1))
    val minQ = if (args.length > 2) args(2).toLong else 5000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(in)
    val curated = Pipeline.curate(docs, minQualityFs = minQ)
    Sinks.writePartitioned(curated, out, Seq("split", "lang"))

    val summary = spark.read.parquet(out)
      .groupBy(col("split")).agg(count(lit(1)).as("n_docs"),
        round(avg(col("score_fs")), 1).as("avg_score_fs"))
      .orderBy(col("split"))
    println(s"curated corpus: $out (partitioned by split/lang)")
    summary.show(10, truncate = false)
    spark.stop()
  }
}
