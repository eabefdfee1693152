package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, NullType, StringType, StructField, StructType}
import org.apache.spark.sql.catalyst.util.ArrayData

/** Native md5-simhash fingerprint as its four 16-bit chunks — the
  * per-DOC form of [[graft.operators.Dedup.simhashMd5Fingerprints]]'
  * bit-vote aggregation, computed in one pass over the token array:
  *
  *   bit_j(tok) = bit j (MSB-first) of the first 8 md5 bytes
  *   s_j        = Σ over tokens of (2·bit_j − 1)
  *   chunk c    = Σ_{i<16} [s_{16c+i} > 0] · 2^i
  *
  * The Column twin explodes one row per (doc, token), evaluates 64
  * interpreted nibble/shift/mask expressions per row, and shuffles
  * 64 bit-sums per doc through a groupBy. The token array is already
  * per-doc in the scan projection, so the whole fingerprint is
  * computable map-side: this kernel digests each token once and
  * accumulates the 64 vote counters in a primitive array — the
  * operator's explode + Exchange + 64-column aggregate collapse into
  * ONE scan-speed projection (the fingerprint VALUES are identical,
  * so the banded candidate set and the oracle rows cannot move).
  *
  * Parity (spec-pinned in ExpressionsSpec + the operator-level
  * fingerprint frame): null token elements vote on no bit (the twin's
  * null digest rows contribute NULL to every SUM, which SQL skips);
  * ties (s_j = 0) clear the bit on both paths; NULL array → SQL NULL
  * (the twin's explode emits no row for a null doc — the operator
  * filters those out on both paths).
  */
case class SimhashMd5Chunks(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) | ArrayType(NullType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_simhash_md5_chunks requires array<string>, got $t")
  }
  override def dataType: DataType = SimhashMd5Chunks.schema
  override def prettyName: String = "graft_simhash_md5_chunks"

  override protected def nullSafeEval(toks: Any): Any =
    SimhashMd5Chunks.compute(toks.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.expressions.SimhashMd5Chunks.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimhashMd5Chunks =
    copy(child = newChild)
}

object SimhashMd5Chunks {
  val schema: StructType = StructType(
    (0 until 4).map(c => StructField(s"c$c", LongType, nullable = false)))

  private val mdLocal: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  def compute(toks: ArrayData): InternalRow = {
    val n = toks.numElements()
    val md = mdLocal.get()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        val d = md.digest(toks.getUTF8String(i).getBytes)
        // bit j = (byte[j/8] >> (7 - j%8)) & 1 — MSB-first over the
        // first 8 bytes, identical to the twin's hex-nibble indexing
        var j = 0
        while (j < 64) {
          val bit = (d(j >> 3) >> (7 - (j & 7))) & 1
          votes(j) += (bit << 1) - 1
          j += 1
        }
      }
      i += 1
    }
    val out = new Array[Any](4)
    var c = 0
    while (c < 4) {
      var chunk = 0L
      var k = 0
      while (k < 16) {
        if (votes(c * 16 + k) > 0) chunk |= 1L << k
        k += 1
      }
      out(c) = chunk
      c += 1
    }
    new GenericInternalRow(out)
  }
}
