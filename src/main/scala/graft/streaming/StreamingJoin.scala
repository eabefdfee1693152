package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream-stream INTERVAL join — the attribution shape
  * ("pair each view with the clicks of the same user within the next
  * N minutes") that batch expresses as [[graft.operators.Temporal]]'s
  * banded range join.
  *
  * Why the contract looks the way it does: a stream-stream join must
  * BUFFER both sides (a left row's matches may not have arrived yet).
  * Structured Streaming keeps that buffer bounded only when it can
  * prove when a buffered row becomes unmatchable — which needs BOTH
  * a watermark on each input AND a two-sided event-time bound in the
  * join predicate. With them, a right row is evicted once the left
  * watermark passes `r_ts` (no future left row could reach back to
  * it) and vice versa; without them Spark would have to keep every
  * row forever (and rejects the outer-join query outright). The spec
  * pins the eviction observably via the state-store row counts.
  *
  * `left_outer` additionally emits unmatched left rows (null right
  * columns) — but only once the watermark proves no match can still
  * arrive, so outer results trail the watermark by design.
  */
object StreamingJoin {

  /** Join `left` (carrying `key` and an `l_ts` timestamp) with
    * `right` (carrying `key` and `r_ts`): one output row per pair
    * with equal keys and `r_ts` ∈ [l_ts, l_ts + within]. Works on
    * streaming inputs (bounded state, see object doc) and UNCHANGED
    * on batch frames (`withWatermark` is a no-op there) — the
    * batch-twin parity the spec pins.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   within: String, watermarkDelay: String,
                   joinType: String = "inner"): DataFrame = {
    require(Seq("inner", "left_outer").contains(joinType),
      s"joinType must be inner or left_outer, got $joinType")
    val l = left.withWatermark("l_ts", watermarkDelay)
    // rename the right key AFTER the watermark so both sides keep
    // their event-time column; the join emits the left key only
    val r = right.withWatermark("r_ts", watermarkDelay)
      .withColumnRenamed(key, "__rk")
    l.join(r,
        col(key) === col("__rk") &&
          col("r_ts") >= col("l_ts") &&
          col("r_ts") <= col("l_ts") + expr(s"interval $within"),
        joinType)
      .drop("__rk")
  }
}
