package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, NullType, StringType}

/** Native Catalyst expression: 64-bit SimHash of a token array.
  *
  * The pure-`Column` formulation (HashFunctions.simhash64) expands to
  * a ~4000-node expression tree (64 bit-tests × per-token fold) that
  * evaluates interpreted lambda closures per element. This expression
  * computes the same value in one tight loop, participates in
  * whole-stage codegen via `defineCodeGen` (a single static call —
  * no fallback, no UDF serialization), and needs no more than a
  * 64-int scratch array per row.
  *
  * Bit parity with the Column version: per-token hash is Spark's own
  * xxhash64 (XXH64.hashUTF8String, seed 42); bit b votes +1/-1 by
  * `(h >> b) & 1`; bit set iff votes > 0 — identical tie behavior.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case ArrayType(NullType, _) => TypeCheckResult.TypeCheckSuccess // array() literal
    case other =>
      TypeCheckResult.TypeCheckFailure(s"graft_simhash64 requires array<string>, got $other")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"

  override protected def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.expressions.SimHash64.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  /** Static entry point shared by interpreted eval and generated code. */
  def compute(tokens: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = XXH64.hashUTF8String(tokens.getUTF8String(i), 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var r = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) r |= (1L << b)
      b += 1
    }
    r
  }
}
