package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.functions.VectorFunctions._
import graft.operators.KMeans

/** Incremental streaming k-means — the core semantic of the reference
  * engine (ScaleUnlimited/flink-streaming-kmeans: each arriving point
  * pulls its nearest centroid toward it, `c' = c + (p - c)/n`, with
  * older points decaying).
  *
  * Spark-first re-expression: Structured Streaming micro-batches +
  * `foreachBatch`. Per batch:
  *   1. assign every point to its nearest centroid — a narrow,
  *      codegen'd pass (centroids are a broadcast literal);
  *   2. one partial-agg shuffle of k rows (per-cluster count + mean);
  *   3. driver-side decayed merge, the batch generalization of the
  *      reference's per-point rule:
  *        n' = α·n + m
  *        c' = (α·n·c + m·mean_batch) / n'
  *      (α = decayFactor; α=1 → exact running mean, the reference's
  *      `c + (p-c)/n` applied m times; α<1 forgets old data.)
  *
  * State is k×dim doubles on the driver — no executor state store
  * needed, restart-safe if the caller checkpoints `centroids`.
  * Identical update math at any scale: the only data-sized work is
  * the assign scan.
  */
class StreamingKMeans(val k: Int, val dim: Int, val decayFactor: Double,
                      init: Seq[(Long, Array[Double])]) extends Serializable {

  @volatile private var state: Vector[(Long, Array[Double], Double)] =
    init.map { case (cid, c) => (cid, c.clone(), 0.0) }.toVector

  def centroids: Seq[(Long, Array[Double])] = state.map { case (cid, c, _) => (cid, c.clone()) }
  def weights: Seq[(Long, Double)] = state.map { case (cid, _, n) => (cid, n) }

  /** Checkpoint the full model state — (cid, centroid, weight), k×dim
    * doubles — as one tiny parquet file. With [[StreamingKMeans.restore]]
    * this is the restart-safety surface Flink gives the reference via
    * operator checkpointing: kill the job, restore, resume the stream,
    * and the model continues bit-identically (weights included, so the
    * decayed running mean picks up where it stopped — spec-verified by
    * a kill-and-resume in StreamingSpec).
    */
  def save(spark: org.apache.spark.sql.SparkSession, path: String): Unit = {
    import spark.implicits._
    state.map { case (cid, c, n) => (cid, c.toSeq, n) }
      .toDF("cid", "centroid", "weight")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Append a `cluster` column: nearest CURRENT centroid per point —
    * the reference engine's per-point assignment output (each arriving
    * point is assigned, THEN its centroid moves). Narrow and codegen'd;
    * centroids enter the plan as broadcast literals, so the frame is
    * pinned to the model state at call time regardless of when actions
    * run on it.
    */
  def assign(batch: DataFrame, vecCol: String): DataFrame = {
    val (cl, _) = KMeans.assignExpr(toDoubleArray(col(vecCol)).as("v"), centroids)
    batch.withColumn("cluster", cl)
  }

  /** Merge one micro-batch (a static DataFrame with an array<double>
    * column `vecCol`) into the model.
    */
  def update(batch: DataFrame, vecCol: String): Unit =
    mergeAssigned(assign(batch, vecCol), vecCol)

  private def mergeAssigned(assigned: DataFrame, vecCol: String): Unit = {
    val avgs = (1 to dim).map(i => avg(element_at(toDoubleArray(col(vecCol)), i)).as(s"m$i"))
    val stats = assigned
      .groupBy(col("cluster"))
      .agg(count(lit(1)).cast("double").as("m"), avgs: _*)
      .collect()
      .map { r =>
        r.getLong(0) -> ((r.getDouble(1), (1 to dim).map(i => r.getDouble(i + 1)).toArray))
      }.toMap
    state = state.map { case (cid, c, n) =>
      stats.get(cid) match {
        case Some((m, mean)) =>
          val decayed = decayFactor * n
          val total = decayed + m
          val merged = c.indices.map(i => (decayed * c(i) + m * mean(i)) / total).toArray
          (cid, merged, total)
        case None => (cid, c, decayFactor * n)
      }
    }
  }

  /** Attach to a streaming Dataset: every micro-batch folds into the
    * model via foreachBatch. `onSnapshot` fires after each batch with
    * the updated centroids — the reference engine's periodic
    * cluster-snapshot surface (for monitoring/visualization).
    * `onAssignments` fires BEFORE the merge with the batch plus a
    * `cluster` column — the reference engine's other output half,
    * per-point cluster assignments (assign, then update: each point is
    * labeled with the centroid it was matched against, not the moved
    * one). Land it durably via [[graft.sources.Sinks.writeAssignments]].
    */
  def run(stream: DataFrame, vecCol: String,
          onSnapshot: (Long, Seq[(Long, Array[Double])]) => Unit = (_, _) => (),
          onAssignments: (Long, DataFrame) => Unit = null): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val assigned = assign(batch.toDF(), vecCol)
        if (onAssignments != null) {
          // the assignments sink and the merge are two ACTIONS on the
          // same frame — persist so the batch's source is scanned and
          // assigned once, not once per action
          assigned.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          try {
            onAssignments(batchId, assigned)
            mergeAssigned(assigned, vecCol)
          } finally assigned.unpersist(false)
        } else mergeAssigned(assigned, vecCol)
        onSnapshot(batchId, centroids)
      }
      .start()
}

object StreamingKMeans {

  /** Restore a checkpointed model from [[StreamingKMeans#save]]:
    * centroids AND weights come back, so subsequent updates continue
    * the same decayed running mean as the uninterrupted run.
    */
  def restore(spark: org.apache.spark.sql.SparkSession, path: String,
              decayFactor: Double = 1.0): StreamingKMeans = {
    val rows = spark.read.parquet(path).collect().sortBy(_.getAs[Long]("cid"))
    val st = rows.map { r =>
      (r.getAs[Long]("cid"), r.getAs[scala.collection.Seq[Double]]("centroid").toArray,
        r.getAs[Double]("weight"))
    }.toVector
    val m = new StreamingKMeans(st.size, st.head._2.length, decayFactor,
      st.map { case (cid, c, _) => (cid, c) })
    m.state = st
    m
  }

  /** Seed from the k lowest-id points of a static frame (same
    * deterministic init as batch Lloyd's).
    */
  def seeded(points: DataFrame, idCol: String, vecCol: String, k: Int, dim: Int,
             decayFactor: Double = 1.0): StreamingKMeans = {
    val init = KMeans.initCentroids(
      points.select(col(idCol).cast("long").as("id"), toDoubleArray(col(vecCol)).as("v")),
      "id", "v", k)
    new StreamingKMeans(k, dim, decayFactor, init)
  }
}
