package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, NullType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native DISTINCT word n-grams: the gram-stream projection of the
  * ngram-LSH dedup family (`array_distinct(wordNgrams(toks, n))`) in
  * ONE pass over the token array.
  *
  * The Column formulation walks the tokens through four interpreted
  * layers per row — a `sequence` index array, a `slice` + `concat_ws`
  * per gram, then `array_distinct` re-hashing the whole gram array —
  * and sits on the scan of every ngram-LSH consumer (the xxhash
  * banded generator behind 7 bench keys plus the curation pipeline).
  * This kernel materializes each gram once (UTF8String.concatWs,
  * null window members skipped exactly like concat_ws) into an
  * insertion-ordered set, matching array_distinct's first-occurrence
  * order and binary equality.
  *
  * Parity with the twin (spec-pinned in ExpressionsSpec): fewer than
  * n tokens → EMPTY array (wordNgrams' otherwise-branch); duplicate
  * grams keep their first position; NULL array → SQL NULL where the
  * twin yields an empty array (when(size(NULL) ≥ n) takes the
  * otherwise branch) — every consumer filters `size(grams) > 0`
  * immediately, which drops the row on BOTH paths, so the consumer
  * frames are identical (the spec pins that too).
  */
case class DistinctNgrams(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(_: StringType, _) | ArrayType(NullType, _), IntegerType) if right.foldable =>
      right.eval() match {
        case null => TypeCheckResult.TypeCheckSuccess
        case n: Int if n >= 1 => TypeCheckResult.TypeCheckSuccess
        case n => TypeCheckResult.TypeCheckFailure(s"graft_distinct_ngrams requires n >= 1, got $n")
      }
    case (l, r) =>
      TypeCheckResult.TypeCheckFailure(
        s"graft_distinct_ngrams requires (array<string>, foldable int), got ($l, $r)")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_distinct_ngrams"

  override protected def nullSafeEval(toks: Any, n: Any): Any =
    DistinctNgrams.compute(toks.asInstanceOf[ArrayData], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, n) => s"graft.functions.expressions.DistinctNgrams.compute($a, $n)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DistinctNgrams =
    copy(left = newLeft, right = newRight)
}

object DistinctNgrams {
  private val SEP = UTF8String.fromString(" ")

  def compute(toks: ArrayData, n: Int): ArrayData = {
    val total = toks.numElements() - n + 1
    if (total <= 0) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String](total * 2)
    val window = new Array[UTF8String](n)
    var i = 0
    while (i < total) {
      var j = 0
      while (j < n) {
        window(j) = if (toks.isNullAt(i + j)) null else toks.getUTF8String(i + j)
        j += 1
      }
      seen.add(UTF8String.concatWs(SEP, window: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
  }
}
