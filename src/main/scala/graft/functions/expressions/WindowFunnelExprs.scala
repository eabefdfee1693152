package graft.functions.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.types._

/** Buffer: the group's (t, step-index) observations. The greedy
  * anchor fold is order-SENSITIVE, so partial aggregation cannot fold
  * eagerly — the buffer collects and the FINAL eval sorts + folds
  * (merge is concatenation, trivially associative/commutative). This
  * is the same per-group boundedness contract as the DataFrame twin's
  * collect_list: state is one grain's events, not a histogram.
  */
private[graft] final class FunnelBuf(
    var ts: scala.collection.mutable.ArrayBuffer[Long],
    var sis: scala.collection.mutable.ArrayBuffer[Int])

/** ClickHouse-style windowFunnel as a native Catalyst aggregate:
  * `graft_window_funnel(t, si, window, n_steps)` returns the deepest
  * ordered prefix of steps 0..n_steps-1 completed with every step
  * inside `window` of the chain's first step (same time unit as `t`;
  * pass window ≥ the grain width for the unwindowed ordered funnel).
  * The fold is IDENTICAL to [[graft.operators.Funnel.windowDepth]]'s
  * latest-viable-anchor array (parity spec-pinned), so session-SQL
  * users get the exact batch semantics through GROUP BY.
  */
case class WindowFunnelAgg(left: Expression, right: Expression,
                           windowSpan: Long, nSteps: Int,
                           mutableAggBufferOffset: Int = 0,
                           inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[FunnelBuf] with BinaryLike[Expression] {

  require(nSteps >= 1, "graft_window_funnel: n_steps must be >= 1")
  require(windowSpan >= 0, "graft_window_funnel: window must be >= 0")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (lt, rt) => TypeCheckResult.TypeCheckFailure(
        s"graft_window_funnel requires (bigint t, int step_index), got ($lt, $rt)")
    }

  override def createAggregationBuffer(): FunnelBuf =
    new FunnelBuf(scala.collection.mutable.ArrayBuffer.empty,
      scala.collection.mutable.ArrayBuffer.empty)

  override def update(buffer: FunnelBuf, input: InternalRow): FunnelBuf = {
    val t = left.eval(input)
    val si = right.eval(input)
    if (t != null && si != null) {
      val s = si.asInstanceOf[Int]
      // out-of-chain rows (si < 0 or beyond the chain) can never
      // advance an anchor — drop them here, not in the fold
      if (s >= 0 && s < nSteps) {
        buffer.ts += t.asInstanceOf[Long]
        buffer.sis += s
      }
    }
    buffer
  }

  override def merge(buffer: FunnelBuf, other: FunnelBuf): FunnelBuf = {
    buffer.ts ++= other.ts
    buffer.sis ++= other.sis
    buffer
  }

  override def eval(buffer: FunnelBuf): Any = {
    val order = buffer.ts.indices.sortBy(i => (buffer.ts(i), buffer.sis(i)))
    val anchors = Array.fill(nSteps)(-1L)
    order.foreach { i =>
      val t = buffer.ts(i)
      val si = buffer.sis(i)
      if (si == 0) anchors(0) = math.max(anchors(0), t)
      else if (anchors(si - 1) >= 0L && t - anchors(si - 1) <= windowSpan)
        anchors(si) = math.max(anchors(si), anchors(si - 1))
    }
    anchors.count(_ >= 0L)
  }

  override def serialize(buffer: FunnelBuf): Array[Byte] = {
    val n = buffer.ts.length
    val bb = ByteBuffer.allocate(4 + n * 12)
    bb.putInt(n)
    var i = 0
    while (i < n) { bb.putLong(buffer.ts(i)); bb.putInt(buffer.sis(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): FunnelBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.ts += bb.getLong(); buf.sis += bb.getInt(); i += 1 }
    buf
  }

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_window_funnel"
  override def withNewMutableAggBufferOffset(newOffset: Int): WindowFunnelAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): WindowFunnelAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WindowFunnelAgg =
    copy(left = newLeft, right = newRight)
}
