package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.expressions.BloomMightContain

/** Stored EXACT-dedup index — the cheap companion of the stored
  * n-gram LSH index for incremental crawls: "have we seen this exact
  * content before?" answered per batch without joining the batch
  * against the full stored corpus.
  *
  * Layout: `<name>_digests` — the content digests, BUCKETED on the
  * digest so the confirm join never shuffles the stored side (the
  * same write-time-layout contract as the LSH index's bands table);
  * `<name>_bloom` — a Bloom filter over those digests (1 binary row +
  * geometry meta). Per query batch:
  *
  *   1. probe the bloom MAP-SIDE ([[BloomMightContain]], codegen'd):
  *      bloom-negative rows are DEFINITIVELY new (no false
  *      negatives) and never reach a join;
  *   2. only bloom-positive rows (true dups + the fpp sliver) join
  *      the digests table for exact confirmation — so the join input
  *      is ∝ |batch ∩ corpus|, not |batch|.
  *
  * At 100 TB the digests table is the source of truth and scales
  * freely; the bloom is the accelerator and its size is bound by the
  * build-time `expectedItems` (~1.2 GB per 10⁹ digests at fpp 0.03)
  * — shipped as a BROADCAST per query batch (fetched once per
  * executor, inflated once per JVM), never as a plan literal.
  * Corpora beyond what one sketch should carry: raise fpp (the
  * confirm join absorbs false positives exactly) or skip the bloom
  * and take the plain bucketed semi-join — correctness never depends
  * on the sketch. Append folds new digests in idempotently and
  * MERGES a same-geometry batch sketch into the stored bloom
  * (bit-OR; `expectedItems` fixed at build time — the meta tracks
  * the indexed count so callers can see saturation and rebuild).
  */
object ExactIndex {

  /** In-memory form: classify `batch` docs against a `reference`
    * corpus frame — (doc_id, h, is_known), exact semantics, with the
    * bloom pruning the confirm join to bloom-positives. This is the
    * one-shot shape ([[write]]/[[flagAgainstIndex]] is the stored
    * lifecycle twin).
    */
  /** The digest key: md5 of the raw text, or of its canonical form
    * ([[graft.functions.TextFunctions.canonicalKey]] — canonicalText
    * with the empty-collapse guard: a fully non-ASCII doc's canonical
    * form is "" and digesting it would flag every such doc as a dup
    * of the first one indexed, so empty canonical keys fall back to
    * the raw digest) when the caller/index opted in — the
    * normalize-then-hash posture shared with [[Dedup.exact]].
    */
  private def digest(textCol: String, canonical: Boolean, routed: Boolean = false,
                     minLossFs: Long = 0L) =
    md5(if (routed) graft.functions.TextFunctions.routedKey(col(textCol), minLossFs)
        else if (canonical) graft.functions.TextFunctions.canonicalKey(col(textCol))
        else col(textCol))

  def flagKnown(batch: DataFrame, reference: DataFrame,
                expectedItems: Long = 0L, fpp: Double = 0.03,
                textCol: String = "text", idCol: String = "doc_id",
                canonical: Boolean = false, routed: Boolean = false,
                minLossFs: Long = 0L): DataFrame = {
    require(minLossFs == 0L || routed,
      s"minLossFs applies only to routed keying (got minLossFs = $minLossFs)")
    val refDigests =
      reference.select(digest(textCol, canonical, routed, minLossFs).as("h")).distinct()
    val n = if (expectedItems > 0) expectedItems
      else math.max(1000L, refDigests.count())
    // one-shot form: an unmanaged per-call broadcast is fine (the
    // ContextCleaner reclaims it with the plan); the STORED-index
    // path reuses one cached broadcast per index instead — see
    // [[BloomBroadcastCache]]
    val bloom = batch.sparkSession.sparkContext.broadcast(buildBloom(refDigests, n, fpp))
    classify(batch.sparkSession,
      batch.select(col(idCol).as("doc_id"),
        digest(textCol, canonical, routed, minLossFs).as("h")),
      refDigests, bloom)
  }

  /** One aggregation pass over the digest frame → the serialized
    * sketch (driver-held, size set by (expectedItems, fpp) at
    * creation — NOT by the data).
    */
  private def buildBloom(digests: DataFrame, expectedItems: Long, fpp: Double): Array[Byte] = {
    val bf = digests.stat.bloomFilter("h", expectedItems, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** The codegen'd sketch probe: the bytes BROADCAST (torrent-fetched
    * once per executor, filter inflated once per JVM via
    * [[graft.functions.expressions.BloomSketchCache]] — at the
    * ~1.2 GB/10⁹-digest design point a plan-literal sketch would ride
    * and re-inflate in every task), probed by the broadcast-handle
    * expression built directly — no registry or extensions
    * dependence. Correctness never depends on the sketch (any probe
    * answer only routes rows between the map-side `false` tag and the
    * exact confirm join).
    */
  private def bloomProbe(c: Column,
                         bc: org.apache.spark.broadcast.Broadcast[Array[Byte]]): Column = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    ColumnBridge.column(graft.functions.expressions.BloomMightContainBroadcast(
      ColumnBridge.expression(c), bc))
  }

  /** The split-confirm-union: bloom-negatives tag `false` map-side;
    * bloom-positives left-join the digests for the exact verdict.
    */
  private def classify(spark: SparkSession, batch: DataFrame, digests: DataFrame,
                       bloom: org.apache.spark.broadcast.Broadcast[Array[Byte]]): DataFrame = {
    val probed = batch.withColumn("maybe", bloomProbe(col("h"), bloom))
    val definiteNew = probed.filter(!col("maybe"))
      .select(col("doc_id"), col("h"), lit(false).as("is_known"))
    val confirmed = probed.filter(col("maybe"))
      .join(digests.select(col("h"), lit(true).as("hit")), Seq("h"), "left")
      .select(col("doc_id"), col("h"), coalesce(col("hit"), lit(false)).as("is_known"))
    definiteNew.unionByName(confirmed)
  }

  /** Build the stored index: bucketed digests + bloom + meta. */
  def write(docs: DataFrame, name: String, buckets: Int = 64,
            expectedItems: Long = 0L, fpp: Double = 0.03,
            textCol: String = "text", canonical: Boolean = false,
            routed: Boolean = false, minLossFs: Long = 0L): Unit = {
    require(minLossFs == 0L || routed,
      s"minLossFs applies only to routed keying (got minLossFs = $minLossFs)")
    val spark = docs.sparkSession
    import graft.sources.Sinks
    val digests = docs.select(digest(textCol, canonical, routed, minLossFs).as("h")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nItems = digests.count()
    val n = if (expectedItems > 0) expectedItems else math.max(1000L, nItems * 4)
    Sinks.writeBucketed(digests, s"${name}_digests", "h", buckets)
    writeBloomAndMeta(spark, name, buildBloom(digests, n, fpp), n, fpp, nItems, buckets,
      canonical, routed, minLossFs)
    digests.unpersist()
  }

  private def writeBloomAndMeta(spark: SparkSession, name: String, bloom: Array[Byte],
                                expectedItems: Long, fpp: Double, nItems: Long,
                                buckets: Int, canonical: Boolean,
                                routed: Boolean, minLossFs: Long): Unit = {
    import spark.implicits._
    Seq((bloom, expectedItems, fpp, nItems, buckets, canonical, routed, minLossFs))
      .toDF("bloom", "expected_items", "fpp", "n_items", "buckets", "canon", "routed",
        "min_loss_fs")
      .coalesce(1).write.mode(SaveMode.Overwrite).format("parquet")
      .saveAsTable(s"${name}_bloom")
  }

  // the canon/routed/floor flags are INDEX properties (the
  // span/LSH-index rule: probes and appends must digest in the stored
  // key domain or nothing matches); legacy metas decode to what they
  // stored — pre-canonical raw, pre-routed their canon flag,
  // pre-floor (r20) floor 0
  private def readBloomMeta(spark: SparkSession, name: String)
  : (Array[Byte], Long, Double, Long, Int, Boolean, Boolean, Long) = {
    val df = spark.table(s"${name}_bloom")
    val rows = df.collect()
    require(rows.length == 1, s"${name}_bloom must hold exactly one row, got ${rows.length}")
    val r = rows(0)
    (r.getAs[Array[Byte]]("bloom"), r.getAs[Long]("expected_items"),
      r.getAs[Double]("fpp"), r.getAs[Long]("n_items"), r.getAs[Int]("buckets"),
      df.columns.contains("canon") && r.getAs[Boolean]("canon"),
      df.columns.contains("routed") && r.getAs[Boolean]("routed"),
      if (df.columns.contains("min_loss_fs")) r.getAs[Long]("min_loss_fs") else 0L)
  }

  /** Classify a batch against the STORED index: same exact semantics
    * as [[flagKnown]]; the confirm join reads the digest bucketing
    * (stored side never reshuffles).
    */
  def flagAgainstIndex(batch: DataFrame, name: String,
                       textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val spark = batch.sparkSession
    // the index may have grown (append) or been rebuilt (write) since
    // THIS session — or this streaming micro-batch's session CLONE —
    // last listed it: a stale bloom listing crashes on the overwritten
    // file, and a stale digests listing silently misses appended
    // digests. Refresh both relations (metadata-only) so the flag
    // always reads the LIVE index; surfaced by the streaming
    // flagKnownStream spec, where foreachBatch clones the session.
    spark.catalog.refreshTable(s"${name}_bloom")
    spark.catalog.refreshTable(s"${name}_digests")
    val (_, _, _, _, _, canon, routed, floor) = readBloomMeta(spark, name)
    classify(spark,
      batch.select(col(idCol).as("doc_id"), digest(textCol, canon, routed, floor).as("h")),
      spark.table(s"${name}_digests"), BloomBroadcastCache.bloomFor(spark, name))
  }

  /** Fold a batch's digests into the stored index, idempotently:
    * already-indexed digests anti-join away (bucketed, stored side
    * shuffle-free), the remainder appends to the digests table, and a
    * same-geometry sketch of the NEW digests bit-ORs into the stored
    * bloom. Meta's n_items advances so saturation stays observable
    * (rebuild via [[write]] when n_items outgrows expected_items).
    */
  def append(docs: DataFrame, name: String, textCol: String = "text"): Unit = {
    val spark = docs.sparkSession
    val (bloomBytes, expectedItems, fpp, nItems, buckets, canon, routed, floor) =
      readBloomMeta(spark, name)
    val fresh = docs.select(digest(textCol, canon, routed, floor).as("h")).distinct()
      .join(spark.table(s"${name}_digests"), Seq("h"), "left_anti")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nNew = fresh.count()
    if (nNew > 0) {
      // sketch the fresh digests BEFORE the table write: inserting
      // into the digests table re-materializes any cached plan that
      // reads it, and `fresh` anti-joins that table — post-insert it
      // would recompute EMPTY and the batch sketch would be null
      val batchBloomBytes = buildBloom(fresh, expectedItems, fpp)
      fresh.write.mode(SaveMode.Append)
        .bucketBy(buckets, "h").sortBy("h").format("parquet")
        .saveAsTable(s"${name}_digests")
      val stored = org.apache.spark.util.sketch.BloomFilter.readFrom(
        new java.io.ByteArrayInputStream(bloomBytes))
      val batchBloom = org.apache.spark.util.sketch.BloomFilter.readFrom(
        new java.io.ByteArrayInputStream(batchBloomBytes))
      stored.mergeInPlace(batchBloom)
      val bos = new java.io.ByteArrayOutputStream()
      stored.writeTo(bos)
      writeBloomAndMeta(spark, name, bos.toByteArray, expectedItems, fpp,
        nItems + nNew, buckets, canon, routed, floor)
    }
    fresh.unpersist()
  }
}

/** ONE live broadcast of the stored bloom bytes per index per driver
  * JVM, keyed by the `<name>_bloom` table's current FILE SET (its
  * generation identity — every append/rebuild overwrites the table,
  * changing the files). A streaming `flagKnownStream` or
  * `Pipeline.ingest` loop re-flags every micro-batch: without the
  * cache each call broadcast a fresh copy of the (design-point
  * ~1.2 GB) sketch and left reclamation to driver GC + the
  * ContextCleaner, accumulating GB-scale broadcast blocks over a
  * long-running stream. Here the bytes re-broadcast ONLY when the
  * stored sketch actually changed, and the superseded broadcast is
  * DESTROYED eagerly (executors drop their blocks at once).
  *
  * Retention on supersession mirrors the generation-flip tables: the
  * IMMEDIATELY superseded broadcast stays alive (a query planned
  * against the pre-append sketch and still running finishes on it —
  * destroying eagerly would fail that query mid-flight with a
  * destroyed-broadcast SparkException, not give it stale reads), and
  * destruction happens one generation LATE: flipping to generation
  * g+2 destroys g's broadcast. Memory therefore holds at most TWO
  * sketch broadcasts per index — still bounded for a long-running
  * stream — and a reader outliving two whole index generations is
  * outside the retention contract, exactly as for the flip tables.
  * The probe stays correctness-neutral either way (a bloom answer
  * only routes rows toward or away from the exact confirm join).
  */
private[graft] object BloomBroadcastCache {
  /** Broadcasts created in this JVM — observable so a spec can pin
    * the reuse-across-batches contract.
    */
  private[graft] val broadcastsCreated = new java.util.concurrent.atomic.AtomicLong(0L)
  private val cache = scala.collection.mutable.Map[
    String, (String, org.apache.spark.broadcast.Broadcast[Array[Byte]])]()
  private val retired = scala.collection.mutable.Map[
    String, org.apache.spark.broadcast.Broadcast[Array[Byte]]]()

  def bloomFor(spark: SparkSession, name: String)
  : org.apache.spark.broadcast.Broadcast[Array[Byte]] = synchronized {
    val table = s"${name}_bloom"
    val fp = spark.table(table).inputFiles.sorted.mkString("\n")
    cache.get(name) match {
      case Some((f, bc)) if f == fp => bc
      case stale =>
        // generation g+2 arrives: g (retired at the g+1 flip) dies,
        // g+1 moves to retired, g+2 becomes current
        retired.remove(name).foreach(_.destroy())
        stale.foreach { case (_, bc) => retired.put(name, bc) }
        val bytes = spark.table(table).select(col("bloom"))
          .collect()(0).getAs[Array[Byte]](0)
        val bc = spark.sparkContext.broadcast(bytes)
        broadcastsCreated.incrementAndGet()
        cache.put(name, (fp, bc))
        bc
    }
  }
}
