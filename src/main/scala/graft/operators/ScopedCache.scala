package graft.operators

import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Structural cache ownership for operators that must persist
  * intermediate frames ACROSS their returned lazy result.
  *
  * The pattern: an LSH dedup operator persists its shingle/signature
  * frame because the returned frame's plan reads it from several legs
  * (banding self-join + both verify-join sides), and often persists
  * the slim verified result too because the final range-partitioned
  * ORDER BY samples its input (one extra pass). The operator cannot
  * unpersist before returning — the caller's action is what reads the
  * caches — so before r7 release was a CALLER CONVENTION
  * ("clearCache between pipelines, as Bench does").
  *
  * [[releaseAfterAction]] makes the convention structural: a
  * [[QueryExecutionListener]] watches for the first completed action
  * whose analyzed plan contains the operator's result plan (the
  * listener manager delivers every Dataset action — collect/count/
  * write — including actions the caller runs on frames DERIVED from
  * the result, since the result plan rides along as a subtree), then
  * unpersists the operator-owned frames and unregisters itself. By
  * then the action has already consumed the caches — including the
  * internal ORDER BY sampling pass, which is a job inside the same
  * action, not a separate action.
  *
  * Contract notes:
  *  - Release fires after the FIRST terminal action. A caller that
  *    acts on the same returned frame repeatedly recomputes from
  *    scratch on later actions (correct, just uncached) — callers
  *    wanting reuse should persist the result themselves.
  *  - A partial-scan action (`show(5)`, `limit`) also releases; same
  *    recompute-on-next-action consequence.
  *  - The listener bus is asynchronous: release lands shortly after
  *    the action returns, not synchronously inside it (the
  *    cache-hygiene spec polls for exactly this reason).
  *  - Failed actions release too — a crashed pipeline must not leak
  *    corpus-scale caches into the session.
  */
private[graft] object ScopedCache {

  /** Return `result` with `owned` frames scheduled for unpersist after
    * the first completed (or failed) action that reads `result`.
    */
  def releaseAfterAction(result: DataFrame, owned: Seq[DataFrame]): DataFrame = {
    if (owned.isEmpty) return result
    val session = result.sparkSession
    val target = result.queryExecution.analyzed
    val done = new AtomicBoolean(false)
    val listener = new QueryExecutionListener {
      private def maybeRelease(qe: QueryExecution): Unit = {
        val hit =
          try qe.analyzed.exists(_.sameResult(target))
          catch { case _: Throwable => false }
        if (hit && done.compareAndSet(false, true)) {
          owned.foreach(df => try df.unpersist(false) catch { case _: Throwable => () })
          session.listenerManager.unregister(this)
        }
      }
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        maybeRelease(qe)
      override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit =
        maybeRelease(qe)
    }
    session.listenerManager.register(listener)
    result
  }
}
