package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.KMeans
import graft.sources.FeatureSource
import graft.streaming.StreamingKMeans

/** CLI entry point mirroring the reference engine's tooling surface
  * (ScaleUnlimited/flink-streaming-kmeans: load feature points from
  * CSV, cluster them, emit per-point assignments + periodic centroid
  * snapshots).
  *
  * Usage:
  *   tools/run.sh graft.KMeansJob batch  <csvPathOrDir> <k> <iters>
  *   tools/run.sh graft.KMeansJob stream <csvDir> <k> [decay] [snapDir] [assignDir]
  *
  * batch: Lloyd's over the full file, prints per-cluster metrics and
  *   final centroids.
  * stream: watches `csvDir` as a file stream (the Spark analogue of
  *   the reference's point stream); each arriving file is a
  *   micro-batch; prints a centroid snapshot per batch. Seeds from
  *   whatever CSV is already present.
  */
object KMeansJob {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: KMeansJob batch|stream <path> <k> [iters|decay]")
    val Array(mode, path, kStr) = args.take(3)
    val k = kStr.toInt
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    mode match {
      case "batch" =>
        val iters = if (args.length > 3) args(3).toInt else 3
        val pts = FeatureSource.csv2d(spark, path).toDF()
        val (assigned, cents) = KMeans.lloyd(pts, "id", "vec", k, iters, dim = 2)
        println("== per-cluster metrics ==")
        KMeans.metrics(assigned).show(k, truncate = false)
        println("== centroids ==")
        cents.foreach { case (cid, c) => println(s"  cluster $cid: ${c.mkString("(", ", ", ")")}") }

      case "stream" =>
        val decay = if (args.length > 3) args(3).toDouble else 1.0
        // outputs land NEXT TO the watched dir (writing parquet into
        // the csv dir would feed the file stream its own output)
        val snapDir = if (args.length > 4) args(4) else s"${path.stripSuffix("/")}_snapshots"
        val assignDir = if (args.length > 5) args(5) else s"${path.stripSuffix("/")}_assignments"
        // this job runs WITHOUT a streaming checkpoint, so batch ids
        // restart at 0 every run — a previous longer run's surviving
        // batch_id=N dirs would otherwise mix stale assignments (made
        // against a different model state) into this run's readback
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(assignDir))
        val seed = FeatureSource.csv2d(spark, path).toDF()
        val model = StreamingKMeans.seeded(seed, "id", "vec", k, dim = 2, decay)
        val stream = spark.readStream.schema(FeatureSource.csvSchema).csv(path)
          .select(col("id"), array(col("x"), col("y")).as("vec"))
        // BOTH reference outputs per batch: per-point assignments
        // (each point labeled with the centroid it was matched
        // against, before that centroid moves) and the centroid
        // snapshot — partitioned parquet sinks, durable + queryable
        val q = model.run(stream, "vec",
          onSnapshot = (batchId, cents) =>
            graft.sources.Sinks.writeSnapshot(spark, snapDir, batchId, cents,
              model.weights.toMap),
          onAssignments = (batchId, assigned) =>
            graft.sources.Sinks.writeAssignments(batchId,
              assigned.select(col("id"), col("cluster")), assignDir))
        q.awaitTermination(sys.env.getOrElse("SPARK_GRAFT_STREAM_MS", "15000").toLong)
        q.stop()
        println(s"centroid snapshots: $snapDir")
        graft.sources.Sinks.readSnapshots(spark, snapDir)
          .orderBy(col("batch_id"), col("cid")).show(100, truncate = false)
        println(s"per-point assignments: $assignDir")
        graft.sources.Sinks.readAssignments(spark, assignDir)
          .orderBy(col("batch_id"), col("id")).show(20, truncate = false)

      case other => sys.error(s"unknown mode: $other (use batch|stream)")
    }
    spark.stop()
  }
}
