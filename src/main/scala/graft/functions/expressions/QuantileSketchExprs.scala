package graft.functions.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, QuantileSummaries}
import org.apache.spark.sql.types._

/** Mergeable quantile sketches over Spark's own Greenwald-Khanna
  * summary (`catalyst.util.QuantileSummaries` — the deterministic,
  * RNG-free structure behind `approx_percentile`), surfaced as a
  * serialized-sketch aggregate pair like the HLL and frequent-items
  * tiers: the aggregate RETURNS the sketch, so per-(key, day)
  * summaries can be STORED and any day-range / coarser-granularity
  * percentile query answers from the bounded sketch table — raw
  * history is never rescanned. Spark's built-in `approx_percentile`
  * computes one query and throws the summary away; persisting the
  * summary is what turns an aggregate into a lifecycle.
  *
  * Error model (GK): a query at relative error ε returns a value
  * whose RANK is within ε·n of the target rank. Merging summaries
  * preserves the ε bound (the deltas add exactly as the theory
  * says). Everything is deterministic — same inputs in the same
  * partition layout produce byte-identical sketches.
  */
private[graft] object QuantileSketchSerde {
  /** (relativeError, count, compressed sampled triples). */
  def toBytes(s: QuantileSummaries): Array[Byte] = {
    val c = s.compress()
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeDouble(c.relativeError)
    out.writeLong(c.count)
    out.writeInt(c.sampled.length)
    c.sampled.foreach { st =>
      out.writeDouble(st.value); out.writeLong(st.g); out.writeLong(st.delta)
    }
    out.flush()
    bos.toByteArray
  }

  def fromBytes(bytes: Array[Byte]): QuantileSummaries = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val relErr = in.readDouble()
    val count = in.readLong()
    val n = in.readInt()
    val sampled = Array.fill(n)(QuantileSummaries.Stats(
      in.readDouble(), in.readLong(), in.readLong()))
    new QuantileSummaries(QuantileSummaries.defaultCompressThreshold, relErr,
      sampled, count, true)
  }
}

/** Aggregate raw doubles into one serialized GK summary per group. */
case class QuantileSketchAgg(child: Expression, relativeError: Double,
                             mutableAggBufferOffset: Int = 0,
                             inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QuantileSummaries] with UnaryLike[Expression] {

  override def createAggregationBuffer(): QuantileSummaries =
    new QuantileSummaries(QuantileSummaries.defaultCompressThreshold, relativeError)

  override def update(buffer: QuantileSummaries, input: InternalRow): QuantileSummaries = {
    val v = child.eval(input)
    if (v != null) buffer.insert(v.asInstanceOf[Double]) else buffer
  }

  override def merge(buffer: QuantileSummaries,
                     other: QuantileSummaries): QuantileSummaries =
    buffer.compress().merge(other.compress())

  override def eval(buffer: QuantileSummaries): Any =
    QuantileSketchSerde.toBytes(buffer)

  override def serialize(buffer: QuantileSummaries): Array[Byte] =
    QuantileSketchSerde.toBytes(buffer)

  override def deserialize(bytes: Array[Byte]): QuantileSummaries =
    QuantileSketchSerde.fromBytes(bytes)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "quantile_sketch_agg"
  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): QuantileSketchAgg =
    copy(child = newChild)
}

/** Union serialized GK summaries (the stored-lifecycle merge). */
case class QuantileSketchMergeAgg(child: Expression, relativeError: Double,
                                  mutableAggBufferOffset: Int = 0,
                                  inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QuantileSummaries] with UnaryLike[Expression] {

  override def createAggregationBuffer(): QuantileSummaries =
    new QuantileSummaries(QuantileSummaries.defaultCompressThreshold, relativeError)

  override def update(buffer: QuantileSummaries, input: InternalRow): QuantileSummaries = {
    val v = child.eval(input)
    if (v != null)
      buffer.compress().merge(QuantileSketchSerde.fromBytes(v.asInstanceOf[Array[Byte]]))
    else buffer
  }

  override def merge(buffer: QuantileSummaries,
                     other: QuantileSummaries): QuantileSummaries =
    buffer.compress().merge(other.compress())

  override def eval(buffer: QuantileSummaries): Any =
    QuantileSketchSerde.toBytes(buffer)

  override def serialize(buffer: QuantileSummaries): Array[Byte] =
    QuantileSketchSerde.toBytes(buffer)

  override def deserialize(bytes: Array[Byte]): QuantileSummaries =
    QuantileSketchSerde.fromBytes(bytes)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "quantile_sketch_merge_agg"
  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketchMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketchMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): QuantileSketchMergeAgg =
    copy(child = newChild)
}

/** Query a serialized summary at fixed quantiles → array<double>
  * (one eval per GROUP row; empty sketches yield an empty array).
  */
case class QuantileSketchQuery(child: Expression, quantiles: Seq[Double])
  extends UnaryExpression with CodegenFallback {

  require(quantiles.nonEmpty && quantiles.forall(q => q >= 0.0 && q <= 1.0),
    s"quantiles must be in [0, 1], got $quantiles")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val s = QuantileSketchSerde.fromBytes(input.asInstanceOf[Array[Byte]])
    if (s.count == 0L) new GenericArrayData(Array.empty[Any])
    else new GenericArrayData(
      quantiles.map(q => s.query(q).get.asInstanceOf[Any]).toArray)
  }

  override def prettyName: String = "quantile_sketch_query"
  override protected def withNewChildInternal(newChild: Expression): QuantileSketchQuery =
    copy(child = newChild)
}
