package graft.functions.expressions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Sketches, Union}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression,
  GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Theta sketches — distinct counting WITH set algebra (Apache
  * DataSketches theta family). HLL answers "how many distinct per
  * group"; theta additionally answers INTERSECTIONS and DIFFERENCES
  * of distinct sets ("users who did A and B", "users in A but not
  * B") without materializing the sets — the retention / funnel /
  * cross-corpus-overlap query at 100 TB, where the exact form is a
  * self-join of distinct sets per combination asked.
  *
  * Same architecture as the HLL/frequency/quantile tiers: a
  * TypedImperativeAggregate whose buffer is a theta Union (absorbs
  * raw values map-side AND serialized sketches on merge — one
  * ObjectHashAggregate partial-merge shuffle of ≤2·nominalEntries·8
  * byte sketches), set-operation scalar expressions over the
  * serialized form, and a summary expression exposing the sketch's
  * own deterministic [lower, upper] bounds so honesty gates measure
  * rather than assume. Below nominalEntries distinct values the
  * sketch holds every hash — exact mode — which is the regime the
  * oracle gate key runs in; the spec drives estimation mode.
  */
private[graft] object ThetaSerde {
  def toBytes(u: Union): Array[Byte] = u.getResult().toByteArray
  def wrap(bytes: Array[Byte]): CompactSketch =
    Sketches.wrapCompactSketch(Memory.wrap(bytes))
  def emptyUnion(nominalEntries: Int): Union =
    SetOperation.builder().setNominalEntries(nominalEntries).buildUnion()
}

/** Aggregate raw values (long/int/string) into one serialized compact
  * theta sketch per group.
  */
case class ThetaSketchAgg(child: Expression, nominalEntries: Int,
                          mutableAggBufferOffset: Int = 0,
                          inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] with UnaryLike[Expression] {

  override def createAggregationBuffer(): Union = ThetaSerde.emptyUnion(nominalEntries)

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) child.dataType match {
      case LongType => buffer.update(v.asInstanceOf[Long])
      case IntegerType => buffer.update(v.asInstanceOf[Int].toLong)
      case StringType => buffer.update(v.asInstanceOf[UTF8String].toString)
      case dt => throw new IllegalArgumentException(
        s"theta_sketch_agg supports long/int/string, got $dt")
    }
    buffer
  }

  override def merge(buffer: Union, other: Union): Union = {
    buffer.union(other.getResult())
    buffer
  }

  override def eval(buffer: Union): Any = ThetaSerde.toBytes(buffer)
  override def serialize(buffer: Union): Array[Byte] = ThetaSerde.toBytes(buffer)
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = ThetaSerde.emptyUnion(nominalEntries)
    u.union(ThetaSerde.wrap(bytes))
    u
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "theta_sketch_agg"
  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ThetaSketchAgg =
    copy(child = newChild)
}

/** Union serialized theta sketches (rollups over stored sketches). */
case class ThetaUnionAgg(child: Expression, nominalEntries: Int,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] with UnaryLike[Expression] {

  override def createAggregationBuffer(): Union = ThetaSerde.emptyUnion(nominalEntries)

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buffer.union(ThetaSerde.wrap(v.asInstanceOf[Array[Byte]]))
    buffer
  }

  override def merge(buffer: Union, other: Union): Union = {
    buffer.union(other.getResult())
    buffer
  }

  override def eval(buffer: Union): Any = ThetaSerde.toBytes(buffer)
  override def serialize(buffer: Union): Array[Byte] = ThetaSerde.toBytes(buffer)
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = ThetaSerde.emptyUnion(nominalEntries)
    u.union(ThetaSerde.wrap(bytes))
    u
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "theta_union_agg"
  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ThetaUnionAgg =
    copy(child = newChild)
}

/** A ∩ B over serialized sketches → serialized result sketch. */
case class ThetaIntersect(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val i = SetOperation.builder().buildIntersection()
    i.intersect(ThetaSerde.wrap(a.asInstanceOf[Array[Byte]]))
    i.intersect(ThetaSerde.wrap(b.asInstanceOf[Array[Byte]]))
    i.getResult().toByteArray
  }
  override def prettyName: String = "theta_intersect"
  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): ThetaIntersect =
    copy(left = newLeft, right = newRight)
}

/** A \ B over serialized sketches → serialized result sketch. */
case class ThetaAnotB(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val op = SetOperation.builder().buildANotB()
    op.aNotB(ThetaSerde.wrap(a.asInstanceOf[Array[Byte]]),
      ThetaSerde.wrap(b.asInstanceOf[Array[Byte]])).toByteArray
  }
  override def prettyName: String = "theta_a_not_b"
  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): ThetaAnotB =
    copy(left = newLeft, right = newRight)
}

/** struct<estimate, lower, upper> at 3 standard deviations — the
  * sketch's own deterministic error envelope (valid for union,
  * intersection, and difference results; exact-mode sketches report
  * a zero-width envelope).
  */
case class ThetaSummary(child: Expression)
  extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StructType(Seq(
    StructField("estimate", LongType, nullable = false),
    StructField("lower", LongType, nullable = false),
    StructField("upper", LongType, nullable = false)))
  override protected def nullSafeEval(input: Any): Any = {
    val s = ThetaSerde.wrap(input.asInstanceOf[Array[Byte]])
    new GenericInternalRow(Array[Any](
      math.round(s.getEstimate), math.floor(s.getLowerBound(3)).toLong,
      math.ceil(s.getUpperBound(3)).toLong))
  }
  override def prettyName: String = "theta_summary"
  override protected def withNewChildInternal(newChild: Expression): ThetaSummary =
    copy(child = newChild)
}
