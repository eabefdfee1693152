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
  import org.apache.spark.unsafe.types.UTF8String

  /** Zero-structure merge pass when both arrays are non-decreasing
    * (the dedup producers pre-sort per DOC with sort_array, amortized
    * over the doc's hundreds of candidate pairs): no per-pair hash
    * set, ~2 binary compares per element. r21: the hash-set pass
    * allocated ~1 KiB per pair — at the planted mega-cluster's
    * 3.3M candidates per sf0.1 run that is multi-GiB of young-gen
    * garbage on the dedup tier's single hottest stage.
    *
    * Sortedness is verified inline as the pointers advance (an
    * inversion falls back to [[computeHash]]), so unsorted callers
    * stay correct, just unoptimized. Duplicate/null semantics are
    * pinned to the hash path (parity spec): nulls are skipped (not
    * set members, not counted), left-side duplicates inflate the
    * left count but not membership, right-side duplicates probe (and
    * can match) repeatedly.
    */
  def compute(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var nna = 0 // non-null counts: nulls are not set elements, so
    var nnb = 0 // they must not inflate the union (twin parity)
    var inter = 0
    var pa: UTF8String = null // previous non-null per side, for the
    var pb: UTF8String = null // inline sortedness check
    var va: UTF8String = null // pending (fetched, uncompared) values
    var vb: UTF8String = null
    while (true) {
      if (va == null) {
        while (i < na && a.isNullAt(i)) i += 1
        if (i < na) {
          va = a.getUTF8String(i)
          i += 1
          nna += 1
          if (pa != null && pa.compareTo(va) > 0) return computeHash(a, b)
          pa = va
        }
      }
      if (vb == null) {
        while (j < nb && b.isNullAt(j)) j += 1
        if (j < nb) {
          vb = b.getUTF8String(j)
          j += 1
          nnb += 1
          if (pb != null && pb.compareTo(vb) > 0) return computeHash(a, b)
          pb = vb
        }
      }
      if (va == null || vb == null) {
        // one side exhausted: the rest of the other side only needs
        // its non-null count — but the sortedness check MUST continue
        // through the tail: a merge result is only valid if BOTH
        // arrays were verified fully sorted (an inversion in the
        // unvisited tail means earlier <-decisions were unsound, so
        // it falls back like any other violation)
        while (i < na) {
          if (!a.isNullAt(i)) {
            val v = a.getUTF8String(i)
            if (pa != null && pa.compareTo(v) > 0) return computeHash(a, b)
            pa = v
            nna += 1
          }
          i += 1
        }
        while (j < nb) {
          if (!b.isNullAt(j)) {
            val v = b.getUTF8String(j)
            if (pb != null && pb.compareTo(v) > 0) return computeHash(a, b)
            pb = v
            nnb += 1
          }
          j += 1
        }
        val union = nna + nnb - inter
        // both empty → 0/0: the Column twin computes floor(NaN).toLong = 0
        if (union == 0) return 0L
        // EXACT oracle arithmetic: floor(10000.0 * ((double) inter / union))
        return math.floor(10000.0 * (inter.toDouble / union)).toLong
      }
      val c = va.compareTo(vb)
      if (c == 0) { inter += 1; vb = null } // keep va: the next b may duplicate
      else if (c < 0) va = null
      else vb = null
    }
    0L // unreachable
  }

  /** The hash-set pass — the pre-r21 implementation, kept verbatim as
    * the unsorted-input fallback and the parity reference.
    */
  private[graft] def computeHash(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    val set = new java.util.HashSet[UTF8String](na * 2)
    var i = 0
    var nna = 0
    var nnb = 0
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
    if (union == 0) return 0L
    math.floor(10000.0 * (inter.toDouble / union)).toLong
  }
}
