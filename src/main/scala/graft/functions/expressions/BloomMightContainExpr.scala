package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: membership probe of a string against a
  * serialized `org.apache.spark.util.sketch.BloomFilter` carried as a
  * foldable binary literal (right child).
  *
  * This is the batch-side accelerator of the stored exact-dedup index
  * ([[graft.operators.ExactIndex]]): the sketch ships to executors
  * inside the serialized expression (one deserialize per task via the
  * transient lazy), and the probe runs inside whole-stage codegen as
  * a plain reference-object call — no UDF, no broadcast-variable
  * plumbing in the operator. NO FALSE NEGATIVES by construction: a
  * `false` here is definitively "not in the indexed corpus", which is
  * what lets the expensive exact join see only the `true` rows.
  *
  * Parity note: the filter must have been built over the SAME string
  * items (Spark's BloomFilterImpl hashes a string's UTF-8 bytes;
  * `probe` feeds the UTF8String's bytes — identical).
  */
case class BloomMightContain(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (_: StringType, _: BinaryType) if right.foldable =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_might_contain requires (string, foldable binary sketch), got ($l, $r)")
  }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_might_contain"

  @transient private lazy val filter =
    org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(right.eval().asInstanceOf[Array[Byte]]))

  def probe(s: UTF8String): Boolean = filter.mightContainBinary(s.getBytes)

  override protected def nullSafeEval(l: Any, r: Any): Any = probe(l.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloomExpr", this,
      classOf[BloomMightContain].getName)
    nullSafeCodeGen(ctx, ev, (l, _) => s"${ev.value} = $ref.probe($l);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression)
  : BloomMightContain = copy(left = newLeft, right = newRight)
}
