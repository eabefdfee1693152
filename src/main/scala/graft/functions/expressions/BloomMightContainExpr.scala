package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: membership probe of a string against a
  * serialized `org.apache.spark.util.sketch.BloomFilter` carried as a
  * foldable binary literal (right child).
  *
  * This is the SQL-facing form of the stored exact-dedup index's
  * batch-side accelerator ([[graft.operators.ExactIndex]]) — the
  * literal shape is what a registered SQL function can carry, and is
  * fine for the session-SQL use case where sketches are modest. The
  * OPERATOR path uses [[BloomMightContainBroadcast]] instead: at the
  * index's design point (~1.2 GB sketch per 10⁹ digests) a plan
  * literal would ride every task's serialized plan and re-inflate per
  * task, where the broadcast twin torrent-ships the bytes once per
  * executor and inflates once per JVM. NO FALSE NEGATIVES by
  * construction: a `false` here is definitively "not in the indexed
  * corpus", which is what lets the expensive exact join see only the
  * `true` rows.
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

/** Broadcast-backed twin of [[BloomMightContain]] — the OPERATOR-path
  * probe ([[graft.operators.ExactIndex]] builds it directly; it has
  * no SQL form because a broadcast handle can't ride a function
  * registry call). The serialized expression carries only the
  * broadcast HANDLE: executors torrent-fetch the sketch bytes once
  * per executor (Spark's broadcast machinery), and
  * [[BloomSketchCache]] inflates the filter once per JVM per
  * broadcast — not once per task, which is what the literal form
  * costs at the index's ~GB design point.
  */
case class BloomMightContainBroadcast(child: Expression,
    sketch: org.apache.spark.broadcast.Broadcast[Array[Byte]])
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_might_contain_bcast requires a string item, got $t")
  }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_might_contain_bcast"

  @transient private lazy val filter = BloomSketchCache.filterFor(sketch)

  def probe(s: UTF8String): Boolean = filter.mightContainBinary(s.getBytes)

  override protected def nullSafeEval(c: Any): Any = probe(c.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloomBcastExpr", this,
      classOf[BloomMightContainBroadcast].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.probe($c);")
  }

  override protected def withNewChildInternal(newChild: Expression)
  : BloomMightContainBroadcast = copy(child = newChild)
}

/** Executor-JVM-wide cache of INFLATED bloom filters, keyed by
  * broadcast id — the piece that makes the broadcast probe one
  * deserialization per executor instead of per task. Eviction is
  * BYTE-budgeted, not entry-counted: sketches are GB-scale at the
  * design point, so "4 entries" could silently pin many GB — the
  * budget bounds the pinned heap wherever the filters land, evicting
  * least-recently-probed first (an evicted inflation re-reads from
  * the still-local broadcast block if probed again). The most recent
  * filter always stays — a single over-budget sketch must still
  * probe.
  */
object BloomSketchCache {
  /** Inflated-filter heap budget (bytes). Default 4 GiB ≈ three
    * design-point sketches; overridable for tests and small
    * executors.
    */
  @volatile private[graft] var maxBytes: Long =
    sys.props.get("graft.bloom.cache.bytes").map(_.toLong).getOrElse(4L << 30)
  /** Total inflations in this JVM — observable so a spec can pin the
    * once-per-executor contract.
    */
  private[graft] val deserializations = new java.util.concurrent.atomic.AtomicLong(0L)
  private val cache =
    new java.util.LinkedHashMap[java.lang.Long, org.apache.spark.util.sketch.BloomFilter](
      8, 0.75f, true)
  private var cachedBytes = 0L

  private def sizeOf(f: org.apache.spark.util.sketch.BloomFilter): Long = f.bitSize() / 8

  def filterFor(b: org.apache.spark.broadcast.Broadcast[Array[Byte]])
  : org.apache.spark.util.sketch.BloomFilter = cache.synchronized {
    val hit = cache.get(b.id)
    if (hit != null) hit
    else {
      deserializations.incrementAndGet()
      val f = org.apache.spark.util.sketch.BloomFilter.readFrom(
        new java.io.ByteArrayInputStream(b.value))
      cache.put(b.id, f)
      cachedBytes += sizeOf(f)
      val it = cache.entrySet().iterator()
      while (cachedBytes > maxBytes && cache.size() > 1) {
        val eldest = it.next()
        if (eldest.getKey != b.id) { // never evict the entry being served
          cachedBytes -= sizeOf(eldest.getValue)
          it.remove()
        }
      }
      f
    }
  }

  private[graft] def entryCount: Int = cache.synchronized(cache.size())
}
