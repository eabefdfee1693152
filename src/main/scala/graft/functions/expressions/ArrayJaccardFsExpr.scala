package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, NullType, StringType}

/** Native Catalyst expression: fixed-point Jaccard similarity
  * `floor(10000.0 * (|A∩B| / |A∪B|))` of two string arrays (assumed
  * distinct element sets, as produced by array_distinct).
  *
  * Replaces the `size(array_intersect)/size(array_union)` Column pair
  * on dedup hot paths: one hash-set pass instead of two intermediate
  * array constructions per row — the verify step of MinHash-LSH runs
  * this once per candidate pair (millions of times per corpus).
  *
  * Parity: the arithmetic is EXACTLY the oracle's
  * `floor(10000.0 * (CAST(i AS DOUBLE) / u))` — same IEEE ops in the
  * same order, so results are bit-identical to the SQL twin.
  */
case class ArrayJaccardFs(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(_: StringType, _) | ArrayType(NullType, _),
          ArrayType(_: StringType, _) | ArrayType(NullType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) =>
      TypeCheckResult.TypeCheckFailure(s"graft_jaccard_fs requires (array<string>, array<string>), got ($l, $r)")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_jaccard_fs"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ArrayJaccardFs.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.expressions.ArrayJaccardFs.compute($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): ArrayJaccardFs =
    copy(left = newLeft, right = newRight)
}

object ArrayJaccardFs {
  def compute(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    val set = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String](na * 2)
    var i = 0
    var nna = 0 // non-null count: nulls are not set elements, so they
    var nnb = 0 // must not inflate the union (parity with the twins)
    while (i < na) { if (!a.isNullAt(i)) { set.add(a.getUTF8String(i)); nna += 1 }; i += 1 }
    var inter = 0
    i = 0
    while (i < nb) {
      if (!b.isNullAt(i)) {
        nnb += 1
        if (set.contains(b.getUTF8String(i))) inter += 1
      }
      i += 1
    }
    val union = nna + nnb - inter
    // both empty → 0/0: the Column twin computes floor(NaN).toLong = 0
    if (union == 0) return 0L
    // EXACT oracle arithmetic: floor(10000.0 * ((double) inter / union))
    math.floor(10000.0 * (inter.toDouble / union)).toLong
  }
}
