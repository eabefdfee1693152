package graft

import org.apache.spark.sql.functions._
import graft.operators.ExactIndex

class ExactIndexSpec extends SparkSpec {
  import spark.implicits._

  // reference corpus: 400 docs; batch: 100 re-crawled dups (same text,
  // new ids) + 400 genuinely new docs
  private def reference = (0L until 400L).map(i => (i, s"ref doc number $i body")).toDF("doc_id", "text")
  private def batch =
    ((1000L until 1100L).map(i => (i, s"ref doc number ${i - 1000L} body")) ++
      (2000L until 2400L).map(i => (i, s"new doc $i payload"))).toDF("doc_id", "text")

  test("bloom probe: zero false negatives over every indexed item; codegen path active") {
    val digests = reference.select(md5(col("text")).as("h"))
    val bf = digests.stat.bloomFilter("h", 1000L, 0.03)
    val bos = new java.io.ByteArrayOutputStream(); bf.writeTo(bos)
    val probed = digests
      .withColumn("hit", call_function("graft_bloom_might_contain", col("h"), lit(bos.toByteArray)))
    assert(probed.filter(!col("hit")).count() == 0,
      "a Bloom filter must never reject an item it was built over")
    // and the probe row count is sane (the plan actually ran the expr)
    assert(probed.count() == 400)
  }

  test("broadcast probe: one sketch inflation per executor JVM, not per task") {
    import graft.functions.expressions.BloomSketchCache
    // a many-partition probe: every task probes, but the broadcast
    // sketch must inflate exactly once in this (local-mode single)
    // executor JVM — the contract that makes a GB-scale sketch viable
    val before = BloomSketchCache.deserializations.get()
    val manyPart = reference.repartition(16)
    val out = ExactIndex.flagKnown(manyPart, reference)
    assert(out.rdd.getNumPartitions > 1, "probe must actually span multiple tasks")
    assert(out.filter(!col("is_known")).count() == 0,
      "every reference doc must flag known against itself")
    val inflations = BloomSketchCache.deserializations.get() - before
    assert(inflations == 1L,
      s"the sketch must inflate once per executor, measured $inflations across " +
        s"${out.rdd.getNumPartitions} partitions")
  }

  test("flagKnown: exact classification, with the bloom pruning the confirm join to near the dup count") {
    val out = ExactIndex.flagKnown(batch, reference).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("is_known")).toMap
    val truth = batch.as("b").join(reference.as("r"), md5(col("b.text")) === md5(col("r.text")), "left_semi")
      .select(col("b.doc_id")).collect().map(_.getLong(0)).toSet
    assert(out.size == 500)
    assert(out.count(_._2) == 100 && truth.size == 100)
    out.foreach { case (id, known) => assert(known == truth.contains(id),
      s"doc $id flagged $known but truth says ${truth.contains(id)}") }
    // pruning evidence: rebuild the same-geometry sketch and count the
    // batch's bloom-positive rows — the ONLY rows the exact join sees.
    // 100 true dups + fpp (3%) of the 400 new ≈ 112; assert well under
    // the unpruned 500
    val digests = reference.select(md5(col("text")).as("h")).distinct()
    val bf = digests.stat.bloomFilter("h", math.max(1000L, digests.count()), 0.03)
    val bos = new java.io.ByteArrayOutputStream(); bf.writeTo(bos)
    val positives = batch.select(md5(col("text")).as("h"))
      .filter(call_function("graft_bloom_might_contain", col("h"), lit(bos.toByteArray)))
      .count()
    info(s"bloom positives: $positives of 500 batch rows (100 true dups)")
    assert(positives >= 100, "all true dups must be bloom-positive")
    assert(positives <= 160, s"join input must shrink toward the dup count, got $positives")
  }

  test("stored index lifecycle: write → flag → append → re-flag, idempotent, one batch-side exchange") {
    ExactIndex.write(reference, "exidx_spec", buckets = 8)
    val flags = ExactIndex.flagAgainstIndex(batch, "exidx_spec")
    val plan = flags.queryExecution.executedPlan.toString
    assert(plan.linesIterator.count(_.contains("Exchange hashpartitioning")) <= 1,
      s"only the batch side may shuffle into the confirm join:\n$plan")
    val known = flags.collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("is_known")).toMap
    assert(known.count(_._2) == 100)
    // append the batch: every batch doc becomes known
    ExactIndex.append(batch, "exidx_spec")
    val after = ExactIndex.flagAgainstIndex(batch, "exidx_spec")
    assert(after.filter(!col("is_known")).count() == 0,
      "every appended doc must flag known on re-query")
    // idempotent: double append adds no digest rows
    val rows = spark.table("exidx_spec_digests").count()
    ExactIndex.append(batch, "exidx_spec")
    assert(spark.table("exidx_spec_digests").count() == rows,
      "double-append must not duplicate digests")
    // meta advanced by the distinct NEW digests (500 batch digests,
    // 100 already indexed)
    val meta = spark.table("exidx_spec_bloom").collect()(0)
    assert(meta.getAs[Long]("n_items") == 400L + 400L,
      s"meta must track indexed digest count, got ${meta.getAs[Long]("n_items")}")
    spark.sql("DROP TABLE IF EXISTS exidx_spec_digests")
    spark.sql("DROP TABLE IF EXISTS exidx_spec_bloom")
  }

  test("stored-index bloom broadcasts once per generation: reused across batches, re-broadcast on append") {
    import graft.operators.BloomBroadcastCache
    ExactIndex.write(reference, "exbc_spec", buckets = 4)
    val before = BloomBroadcastCache.broadcastsCreated.get()
    // two micro-batch-style flags against an unchanged index: ONE
    // broadcast serves both (the foreachBatch loop's steady state)
    assert(ExactIndex.flagAgainstIndex(batch, "exbc_spec").filter(col("is_known")).count() == 100)
    assert(ExactIndex.flagAgainstIndex(batch, "exbc_spec").filter(col("is_known")).count() == 100)
    assert(BloomBroadcastCache.broadcastsCreated.get() - before == 1L,
      "an unchanged index must reuse its cached bloom broadcast across batches")
    // append changes the stored sketch's file set: exactly one fresh
    // broadcast, and the flags track the LIVE index
    val gen1 = BloomBroadcastCache.bloomFor(spark, "exbc_spec")
    ExactIndex.append(batch, "exbc_spec")
    assert(ExactIndex.flagAgainstIndex(batch, "exbc_spec").filter(!col("is_known")).count() == 0)
    assert(ExactIndex.flagAgainstIndex(batch, "exbc_spec").filter(!col("is_known")).count() == 0)
    assert(BloomBroadcastCache.broadcastsCreated.get() - before == 2L,
      "an appended index must re-broadcast exactly once, then reuse again")
    // deferred destruction: a query planned against the pre-append
    // sketch and still running must finish on it — the superseded
    // broadcast stays alive for ONE generation...
    assert(gen1.value.nonEmpty,
      "the immediately superseded bloom broadcast must remain servable")
    // ...and dies at the NEXT flip (bounded two-generation retention)
    val gen2 = BloomBroadcastCache.bloomFor(spark, "exbc_spec")
    ExactIndex.append(reference.withColumn("text", concat(col("text"), lit(" g3"))),
      "exbc_spec")
    assert(ExactIndex.flagAgainstIndex(batch, "exbc_spec").filter(!col("is_known")).count() == 0)
    intercept[org.apache.spark.SparkException] { gen1.value }
    assert(gen2.value.nonEmpty,
      "only the generation superseded TWO flips ago is destroyed")
    spark.sql("DROP TABLE IF EXISTS exbc_spec_digests")
    spark.sql("DROP TABLE IF EXISTS exbc_spec_bloom")
  }

  test("inflated-filter cache evicts by byte budget, never the filter being served") {
    import graft.functions.expressions.BloomSketchCache
    val prevBudget = BloomSketchCache.maxBytes
    try {
      // two small filters: with a budget below one filter, inserting
      // the second must evict the first yet still serve the second
      def sketchBytes(seed: String): Array[Byte] = {
        val bf = reference.select(md5(concat(lit(seed), col("text"))).as("h"))
          .stat.bloomFilter("h", 1000L, 0.03)
        val bos = new java.io.ByteArrayOutputStream(); bf.writeTo(bos); bos.toByteArray
      }
      val b1 = spark.sparkContext.broadcast(sketchBytes("a"))
      val b2 = spark.sparkContext.broadcast(sketchBytes("b"))
      BloomSketchCache.maxBytes = 1L // below any real filter
      val f1 = BloomSketchCache.filterFor(b1)
      assert(BloomSketchCache.entryCount == 1, "the only (over-budget) filter must stay cached")
      val infls = BloomSketchCache.deserializations.get()
      assert(BloomSketchCache.filterFor(b1) eq f1, "serving again must hit the cache")
      assert(BloomSketchCache.deserializations.get() == infls)
      val f2 = BloomSketchCache.filterFor(b2)
      assert(f2 ne f1)
      assert(BloomSketchCache.entryCount == 1,
        "over budget, the least-recently-probed filter must evict")
      // b1 evicted: probing it re-inflates from the broadcast block
      BloomSketchCache.filterFor(b1)
      assert(BloomSketchCache.deserializations.get() == infls + 2)
      b1.destroy(); b2.destroy()
    } finally BloomSketchCache.maxBytes = prevBudget
  }
test("canonical index: the digest key domain rides the bloom meta") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val seed = Seq((1L, "hello world"), (2L, "another doc entirely")).toDF("doc_id", "text")
    val probe = Seq((11L, "HELLO, World!"), (12L, "never seen text")).toDF("doc_id", "text")
    ExactIndex.write(seed, "exc_raw", buckets = 4)
    val raw = ExactIndex.flagAgainstIndex(probe, "exc_raw")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("is_known")).toMap
    assert(raw == Map(11L -> false, 12L -> false), s"raw digests miss the case variant, got $raw")
    ExactIndex.write(seed, "exc_can", buckets = 4, canonical = true)
    val can = ExactIndex.flagAgainstIndex(probe, "exc_can")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("is_known")).toMap
    assert(can == Map(11L -> true, 12L -> false),
      s"a canonical index digests the probe in ITS key domain, got $can")
    // append honors the stored domain: fold a new doc in, then a
    // punct-varied recrawl of it must flag known
    ExactIndex.append(Seq((21L, "fresh content here")).toDF("doc_id", "text"), "exc_can")
    val again = ExactIndex.flagAgainstIndex(
      Seq((31L, "Fresh... CONTENT (here)")).toDF("doc_id", "text"), "exc_can")
      .collect()(0).getAs[Boolean]("is_known")
    assert(again, "appended digests stay canonical-keyed under the meta flag")
    // one-shot twin takes the same opt-in
    val oneShot = ExactIndex.flagKnown(probe, seed, canonical = true)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("is_known")).toMap
    assert(oneShot == Map(11L -> true, 12L -> false))
  }

  test("canonical-empty guard: a non-ASCII doc is not 'known' to a canonical index holding a different one") {
    import spark.implicits._
    // both docs canonicalize to "" — without the canonicalKey
    // raw-fallback the index would flag EVERY fully non-ASCII doc as
    // a dup of the first one indexed (silent mass data loss)
    val seed = Seq((1L, "你好，世界。")).toDF("doc_id", "text")
    ExactIndex.write(seed, "exc_nonascii", buckets = 4, canonical = true)
    val probe = Seq((11L, "мир труд май"), (12L, "你好，世界。")).toDF("doc_id", "text")
    val flags = ExactIndex.flagAgainstIndex(probe, "exc_nonascii")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("is_known")).toMap
    assert(flags == Map(11L -> false, 12L -> true),
      s"non-ASCII docs dedup only on byte-identity, got $flags")
    val oneShot = ExactIndex.flagKnown(probe, seed, canonical = true)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("is_known")).toMap
    assert(oneShot == Map(11L -> false, 12L -> true))
  }

  test("routed index: mixed-script docs flag only on byte-identity, ASCII keeps canonical") {
    import spark.implicits._
    // the routed hazard a CANONICAL index has: seed doc 1 is mixed
    // (Latin half + Han half); a probe differing ONLY in its Han half
    // shares the canonical digest and would falsely flag known
    val seed = Seq((1L, "shared latin half 你好"), (2L, "plain ascii doc")).toDF("doc_id", "text")
    ExactIndex.write(seed, "exc_routed", buckets = 4, routed = true)
    val probe = Seq(
      (11L, "shared latin half 再見"),   // differs in Han content -> NOT known
      (12L, "shared latin half 你好"),   // byte-identical -> known
      (13L, "PLAIN ascii (doc)"),        // ASCII case/punct variant -> known
      (14L, "never seen")).toDF("doc_id", "text")
    val flags = ExactIndex.flagAgainstIndex(probe, "exc_routed")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("is_known")).toMap
    assert(flags == Map(11L -> false, 12L -> true, 13L -> true, 14L -> false),
      s"routed index: raw keys for non-Latin docs, canonical for ASCII, got $flags")
    // the meta flag survives append: fold a mixed doc in, then its
    // Han-varied sibling must NOT flag while its byte-twin does
    ExactIndex.append(Seq((21L, "fresh text 你好")).toDF("doc_id", "text"), "exc_routed")
    val again = ExactIndex.flagAgainstIndex(
      Seq((31L, "fresh text 再見"), (32L, "fresh text 你好")).toDF("doc_id", "text"), "exc_routed")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("is_known")).toMap
    assert(again == Map(31L -> false, 32L -> true),
      s"appended digests stay routed-keyed under the meta flag, got $again")
    // one-shot twin takes the same opt-in
    val oneShot = ExactIndex.flagKnown(probe, seed, routed = true)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("is_known")).toMap
    assert(oneShot == Map(11L -> false, 12L -> true, 13L -> true, 14L -> false))
  }

  test("routed index with a loss floor: the STORED floor keys probes and appends (r20)") {
    import spark.implicits._
    // one stray Cyrillic glyph in a ~420-char doc (~20fs of loss):
    // under a floor-100 routed index it digests CANONICALLY, so case
    // variants and sub-floor glyph variants flag known — the
    // dedup_exact_routed_floor trade at stored-index grain. The floor
    // is an INDEX property riding the meta, like canon/routed.
    val long = (1 to 60).map(i => s"word$i").mkString(" ")
    val seed = Seq((1L, s"$long д"), (2L, "plain ascii doc")).toDF("doc_id", "text")
    ExactIndex.write(seed, "exc_floor", buckets = 4, routed = true, minLossFs = 100L)
    val probe = Seq(
      (11L, s"${long.toUpperCase} д"), // case variant, sub-floor glyph -> known
      (12L, s"$long ж"),               // glyph DIFFERENCE under the floor -> known (the trade)
      (13L, "never seen")).toDF("doc_id", "text")
    def flagsOf(name: String) = ExactIndex.flagAgainstIndex(probe, name)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("is_known")).toMap
    assert(flagsOf("exc_floor") == Map(11L -> true, 12L -> true, 13L -> false),
      s"sub-floor glyph docs digest canonically under the stored floor, got ${flagsOf("exc_floor")}")
    // the same probes against a 0-floor routed index: the glyph doc
    // keyed RAW at write time, so neither variant flags
    ExactIndex.write(seed, "exc_floor0", buckets = 4, routed = true)
    assert(flagsOf("exc_floor0") == Map(11L -> false, 12L -> false, 13L -> false),
      s"the 0-floor index keys the glyph doc raw, got ${flagsOf("exc_floor0")}")
    // append digests with the STORED floor (no flag to get wrong)
    ExactIndex.append(Seq((21L, s"fresh $long д")).toDF("doc_id", "text"), "exc_floor")
    val again = ExactIndex.flagAgainstIndex(
      Seq((31L, s"FRESH ${long.toUpperCase} ж")).toDF("doc_id", "text"), "exc_floor")
      .collect().map(r => r.getAs[Boolean]("is_known"))
    assert(again.toSeq == Seq(true), "appended digests keep the stored floor")
    // misuse refused eagerly, like the whole family
    intercept[IllegalArgumentException] {
      ExactIndex.write(seed, "exc_bad", minLossFs = 5L)
    }
    intercept[IllegalArgumentException] {
      ExactIndex.flagKnown(probe, seed, canonical = true, minLossFs = 5L)
    }
  }
}
