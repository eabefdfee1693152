package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.{SpanIndex, TextAnalysis}

class SpanIndexSpec extends SparkSpec {
  import spark.implicits._

  // n=3 / minSpan=4 for countable fixtures (the gate key runs the 8/16
  // defaults against the DuckDB oracle)
  private val blockX = "x1 x2 x3 x4 x5 x6" // 6 tokens → grams at 4 offsets
  private val blockE = "e1 e2 e3 e4 e5"

  private def acct(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[Long]("n_spans"), r.getAs[Long]("dup_tokens"),
        r.getAs[Long]("kept_tokens"))).toMap

  test("flag is cross-corpus: index hits flag at any offset, within-batch repeats do not") {
    val seed = Seq(
      (1L, s"a1 a2 $blockX a3 a4"),
      (2L, "b1 b2 b3 b4 b5 b6 b7")).toDF("doc_id", "text")
    SpanIndex.writeIndex(spark, "si_spec", seed, n = 3, buckets = 2)
    val batch = Seq(
      (11L, s"c1 $blockX c2 c3 c4"), // block X at a DIFFERENT offset than doc 1's
      (12L, "d1 d2 d3 d4 d5 d6"), // unique
      (13L, s"f1 f2 $blockE"), // E repeats only WITHIN this batch (doc 14)
      (14L, s"$blockE g1 g2")).toDF("doc_id", "text")
    val flagged = acct(SpanIndex.flagAgainstIndex(spark, "si_spec", batch, minSpanTokens = 4))
    assert(flagged(11L) == ((1L, 6L, 4L)),
      s"doc 11: index block flags at any offset, got ${flagged(11L)}")
    assert(flagged(12L) == ((0L, 0L, 6L)), s"doc 12 unique, got ${flagged(12L)}")
    assert(flagged(13L) == ((0L, 0L, 7L)),
      s"doc 13: within-batch repeats are NOT index hits, got ${flagged(13L)}")
    assert(flagged(14L) == ((0L, 0L, 7L)), s"doc 14: ${flagged(14L)}")
    // the ingest loop: fold the batch in — a LATER batch now flags E
    SpanIndex.appendToIndex(spark, "si_spec", batch)
    val later = Seq((21L, s"h1 $blockE h2 h3")).toDF("doc_id", "text")
    val flagged2 = acct(SpanIndex.flagAgainstIndex(spark, "si_spec", later, minSpanTokens = 4))
    assert(flagged2(21L) == ((1L, 5L, 3L)),
      s"doc 21: the index learned batch grams, got ${flagged2(21L)}")
    // a replayed append no-ops structurally: absorbed grams anti-join
    // away, so the gram set neither grows nor duplicates
    spark.catalog.refreshTable("si_spec_grams")
    val before = spark.table("si_spec_grams").count()
    SpanIndex.appendToIndex(spark, "si_spec", batch)
    spark.catalog.refreshTable("si_spec_grams")
    assert(spark.table("si_spec_grams").count() == before,
      "a replayed batch must not grow the gram set")
    assert(spark.table("si_spec_grams").select("gram_md5").distinct().count() == before,
      "the gram set must stay duplicate-free")
    // the rewrite twin drops exactly the flagged coverage
    def md5Hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val applied = SpanIndex.applyAgainstIndex(spark, "si_spec", later, minSpanTokens = 4)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_kept"), r.getAs[String]("clean_md5"))).toMap
    assert(applied(21L) == ((3L, md5Hex("h1 h2 h3"))),
      s"doc 21: the learned block drops from the rewrite, got ${applied(21L)}")
  }

  test("flag matches the one-shot operator when the index holds the other half") {
    val docs = Tables.documents(spark, sfDir)
    SpanIndex.writeIndex(spark, "si_half", docs.filter(col("doc_id") % 2 === 0), n = 8,
      buckets = 2)
    val got = SpanIndex.flagAgainstIndex(spark, "si_half",
      docs.filter(col("doc_id") % 2 === 1)).collect().map(_.toSeq).toSeq
    // reference semantics recomputed inline: odd docs' grams that any
    // even doc contains, through the same public region machinery
    val evenGrams = TextAnalysis.gramFrame(docs.filter(col("doc_id") % 2 === 0), 8)
      .select(col("gram_md5")).distinct()
    val odd = docs.filter(col("doc_id") % 2 === 1)
    val hits = TextAnalysis.gramFrame(odd, 8).join(evenGrams, Seq("gram_md5"))
    val want = TextAnalysis.spanAccounting(odd,
      TextAnalysis.coalesceRegions(hits, 8, 16)).collect().map(_.toSeq).toSeq
    assert(got.nonEmpty && got == want)
  }

  test("maintain: appends fragment buckets, compaction fires past the threshold and preserves flags") {
    SpanIndex.writeIndex(spark, "si_maint",
      Seq((1L, s"m1 m2 $blockX m3")).toDF("doc_id", "text"), n = 3, buckets = 2)
    // each append lands new files; with maxFilesPerBucket=1 the third
    // batch must trip compaction back to one file per bucket
    val fired = (2 to 4).map { k =>
      SpanIndex.maintainIndex(spark, "si_maint",
        Seq((k.toLong, s"w${k}a w${k}b w${k}c w${k}d")).toDF("doc_id", "text"),
        maxFilesPerBucket = 1)
    }
    assert(fired.contains(true), s"fragmentation must eventually fire compaction, got $fired")
    spark.catalog.refreshTable("si_maint_grams")
    assert(spark.table("si_maint_grams").inputFiles.length <= 2,
      "compaction must restore one file per bucket")
    // the compacted index still flags the seeded block
    val flagged = acct(SpanIndex.flagAgainstIndex(spark, "si_maint",
      Seq((99L, s"$blockX z1 z2")).toDF("doc_id", "text"), minSpanTokens = 4))
    assert(flagged(99L)._1 == 1L && flagged(99L)._2 == 6L,
      s"flag must survive compaction, got ${flagged(99L)}")
  }

  test("streaming span ingest: flags ride the live index, fold-in is exactly-once") {
    implicit val ctx = spark.sqlContext
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    SpanIndex.writeIndex(spark, "si_stream", empty, n = 3, buckets = 2)
    val results = scala.collection.mutable.Map.empty[Long, Map[Long, (Long, Long, Long)]]
    val ms = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamingPipeline.spanIngestStream(
      ms.toDF().toDF("doc_id", "text"), "si_stream", minSpanTokens = 4) { (flagged, id) =>
      results(id) = acct(flagged)
    }.start()
    try {
      ms.addData((1L, s"a1 a2 $blockX a3"))
      q.processAllAvailable()
      assert(results(0L)(1L) == ((0L, 0L, 9L)), "an empty index flags nothing")
      ms.addData((2L, s"$blockX b1 b2"))
      q.processAllAvailable()
      assert(results(1L)(2L) == ((1L, 6L, 2L)),
        s"batch 2 must flag against batch 1's folded grams, got ${results(1L)(2L)}")
    } finally q.stop()
  }
test("canonical index: variant boilerplate flags cross-corpus; legacy meta decodes raw") {
    val block = "this program is free software you can redistribute it"
    val blockVar = "This Program IS (free) Software; you CAN redistribute\u2014it"
    val seed = Seq((2L, s"s1 s2 $block s3")).toDF("doc_id", "text")
    val batch = Seq((11L, s"b1 $blockVar b2"), (13L, "n1 n2 n3 n4 n5 n6 n7 n8")).toDF("doc_id", "text")
    // raw index: the variant's grams never match
    SpanIndex.writeIndex(spark, "si_raw", seed, n = 3, buckets = 2)
    val raw = SpanIndex.flagAgainstIndex(spark, "si_raw", batch, minSpanTokens = 4)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("dup_tokens")).toMap
    assert(raw.values.forall(_ == 0L), s"raw keying must miss the variant, got $raw")
    // canonical index: the key domain rides the meta — flag canonicalizes
    // the batch automatically and the variant's block is caught
    SpanIndex.writeIndex(spark, "si_canon", seed, n = 3, buckets = 2, canonical = true)
    val canon = SpanIndex.flagAgainstIndex(spark, "si_canon", batch, minSpanTokens = 4)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("dup_tokens"))).toMap
    assert(canon(11L) == ((11L, 9L)),
      s"canonical index must catch the varied block (canonical coordinates), got ${canon(11L)}")
    assert(canon(13L) == ((8L, 0L)), s"unrelated doc untouched, got ${canon(13L)}")
    // the append path stays in the index's key domain: folding the
    // batch in and re-flagging a SECOND variant of the same block hits
    SpanIndex.appendToIndex(spark, "si_canon", batch)
    val batch2 = Seq((21L, "c1 THIS program is FREE software? you can REDISTRIBUTE it c2"))
      .toDF("doc_id", "text")
    val again = SpanIndex.flagAgainstIndex(spark, "si_canon", batch2, minSpanTokens = 4)
      .collect()(0).getAs[Long]("dup_tokens")
    assert(again == 9L, s"appended grams stay canonical-keyed, got $again")
    // a pre-canonical (2-column) meta decodes as raw-keyed instead of failing
    Seq((3, 2)).toDF("gram_n", "buckets").write.mode("overwrite").saveAsTable("si_raw_spanmeta")
    val legacy = SpanIndex.flagAgainstIndex(spark, "si_raw", batch, minSpanTokens = 4)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("dup_tokens")).toMap
    assert(legacy.values.forall(_ == 0L), s"legacy meta keys raw, got $legacy")
  }
test("routed index: Han-differing blocks never hallucinate a span; ASCII keeps canonical") {
    // the canonical-index hazard routing closes: seed and probe share
    // k1 k2 _ k3 k4 with DIFFERENT Han middles — canonical keying
    // strips both middles and stitches a contiguous k1..k4 "span"
    // that never existed in either raw text
    val seed = Seq(
      (2L, "s1 k1 k2 \u4f60\u597d k3 k4 s2"),
      (4L, "t1 this program is free software t2")).toDF("doc_id", "text")
    val batch = Seq(
      (11L, "b1 k1 k2 \u518d\u898b k3 k4 b2"),
      (13L, "c1 THIS Program IS free (software) c2")).toDF("doc_id", "text")
    SpanIndex.writeIndex(spark, "sir_canon", seed, n = 3, buckets = 2, canonical = true)
    val canon = SpanIndex.flagAgainstIndex(spark, "sir_canon", batch, minSpanTokens = 4)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("dup_tokens")).toMap
    assert(canon(11L) == 4L,
      s"canonical keying hallucinates the k1..k4 span across differing Han middles, got $canon")
    SpanIndex.writeIndex(spark, "sir_routed", seed, n = 3, buckets = 2, routed = true)
    val routed = SpanIndex.flagAgainstIndex(spark, "sir_routed", batch, minSpanTokens = 4)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("dup_tokens")).toMap
    assert(routed(11L) == 0L,
      s"routed keying grams the mixed docs raw — no hallucinated span, got $routed")
    assert(routed(13L) == 5L,
      s"pure-Latin probes still flag canonically under a routed index, got $routed")
    // append stays in the routed domain: fold the probe batch in,
    // then a THIRD Han variant must still not flag while a new ASCII
    // case variant of the Latin block does
    SpanIndex.appendToIndex(spark, "sir_routed", batch)
    val again = SpanIndex.flagAgainstIndex(spark, "sir_routed",
      Seq((21L, "d1 k1 k2 \u597d\u7684 k3 k4 d2"),
        (23L, "e1 this PROGRAM is FREE software e2")).toDF("doc_id", "text"),
      minSpanTokens = 4)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("dup_tokens")).toMap
    assert(again == Map(21L -> 0L, 23L -> 5L),
      s"appended grams stay routed-keyed under the meta flag, got $again")
  }

  test("routed span index with a loss floor: sub-floor glyphs keep canonical spans (r20)") {
    // the probe is a case/punct variant of the seed block carrying one
    // stray Cyrillic glyph (~260fs of loss in this short doc): a
    // 0-floor routed index grams it raw (no span), a floor-500 routed
    // index grams it canonically and the block flags — the r20 floor
    // as an INDEX property riding the spanmeta
    val seed = Seq((2L, "t1 this program is free software t2")).toDF("doc_id", "text")
    val batch = Seq((11L, "c1 THIS Program IS free (software) ж c2")).toDF("doc_id", "text")
    SpanIndex.writeIndex(spark, "sir_floor0", seed, n = 3, buckets = 2, routed = true)
    val floor0 = SpanIndex.flagAgainstIndex(spark, "sir_floor0", batch, minSpanTokens = 4)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("dup_tokens")).toMap
    assert(floor0 == Map(11L -> 0L),
      s"the 0-floor index grams the glyph probe raw — no span, got $floor0")
    SpanIndex.writeIndex(spark, "sir_floor", seed, n = 3, buckets = 2, routed = true,
      minLossFs = 500L)
    val floored = SpanIndex.flagAgainstIndex(spark, "sir_floor", batch, minSpanTokens = 4)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("dup_tokens")).toMap
    assert(floored == Map(11L -> 5L),
      s"the sub-floor probe grams canonically and the block flags, got $floored")
    // misuse refused eagerly, like the whole family
    intercept[IllegalArgumentException] {
      SpanIndex.writeIndex(spark, "sir_bad", seed, canonical = true, minLossFs = 5L)
    }
  }
test("retraction: grams leave only with their LAST contributor; delete is idempotent") {
    val blockA = "a1 a2 a3 a4 a5"
    val blockB = "b1 b2 b3 b4 b5"
    val seed = Seq(
      (2L, s"s1 s2 $blockA s3"),
      (4L, s"t1 $blockA t2"),
      (6L, s"u1 $blockB u2")).toDF("doc_id", "text")
    SpanIndex.writeIndex(spark, "si_del", seed, n = 3, buckets = 2)
    val batch = Seq((11L, s"x1 $blockA x2"), (13L, s"y1 $blockB y2")).toDF("doc_id", "text")
    def dup(): Map[Long, Long] =
      SpanIndex.flagAgainstIndex(spark, "si_del", batch, minSpanTokens = 4)
        .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("dup_tokens")).toMap
    assert(dup() == Map(11L -> 5L, 13L -> 5L), "both blocks flag before any retraction")
    def del(ids: Long*): Unit =
      SpanIndex.deleteFromIndex(spark, "si_del", ids.toDF("doc_id"))
    // retract block B's only contributor: B stops flagging, A unaffected
    del(6L)
    assert(dup() == Map(11L -> 5L, 13L -> 0L), s"block B retracted with doc 6, got ${dup()}")
    // block A still has a second contributor — retracting the first
    // must NOT remove the shared grams
    del(2L)
    assert(dup() == Map(11L -> 5L, 13L -> 0L), s"doc 4 still holds block A, got ${dup()}")
    // retracting an ABSENT id is a no-op (retries idempotent)
    del(2L, 99L)
    assert(dup() == Map(11L -> 5L, 13L -> 0L), "replayed/absent retraction no-ops")
    // the last contributor leaves: block A goes with it
    del(4L)
    assert(dup() == Map(11L -> 0L, 13L -> 0L), s"last contributor gone, got ${dup()}")
    assert(spark.table("si_del_spandocs").count() == 0L &&
      spark.table("si_del_grams").count() == 0L,
      "a fully-retracted index holds no grams and no companion rows")
  }

  test("append is doc-grain idempotent through the companion; retraction covers appended docs") {
    val blockC = "c1 c2 c3 c4 c5"
    SpanIndex.writeIndex(spark, "si_dg",
      Seq((2L, s"s1 $blockC s2")).toDF("doc_id", "text"), n = 3, buckets = 2)
    val b = Seq((21L, s"z1 $blockC z2"), (23L, "q1 q2 q3 q4 q5 q6")).toDF("doc_id", "text")
    SpanIndex.appendToIndex(spark, "si_dg", b)
    val rows = spark.table("si_dg_spandocs").count()
    val grams = spark.table("si_dg_grams").count()
    SpanIndex.appendToIndex(spark, "si_dg", b) // replay
    assert(spark.table("si_dg_spandocs").count() == rows,
      "a redelivered batch adds no companion rows (doc-grain idempotence)")
    assert(spark.table("si_dg_grams").count() == grams,
      "a redelivered batch adds no grams")
    // an APPENDED doc retracts exactly like a seeded one: doc 23's
    // unique grams leave, blockC survives via docs 2 and 21
    SpanIndex.deleteFromIndex(spark, "si_dg", Seq(23L).toDF("doc_id"))
    val probe = Seq((31L, "w1 q1 q2 q3 q4 q5 q6 w2"), (33L, s"v1 $blockC v2"))
      .toDF("doc_id", "text")
    val flags = SpanIndex.flagAgainstIndex(spark, "si_dg", probe, minSpanTokens = 4)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("dup_tokens")).toMap
    assert(flags == Map(31L -> 0L, 33L -> 5L),
      s"appended-doc retraction removes its grams, shared block survives, got $flags")
  }

  test("legacy index (no companion): first append upgrades in place, retraction refuses with the rebuild rule") {
    val seed = Seq((1L, s"a1 a2 $blockX")).toDF("doc_id", "text")
    SpanIndex.writeIndex(spark, "si_legacy", seed, n = 3, buckets = 2)
    // simulate a pre-r17 index: the companion never existed
    spark.sql("DROP TABLE si_legacy_spandocs")
    // retraction has no last-contributor accounting to work from —
    // the refusal must name the writeIndex rebuild path (ADVICE r17)
    val e = intercept[IllegalArgumentException] {
      SpanIndex.deleteFromIndex(spark, "si_legacy", Seq(1L).toDF("doc_id"))
    }
    assert(e.getMessage.contains("writeIndex"), s"got: ${e.getMessage}")
    // first append must NOT throw TABLE_OR_VIEW_NOT_FOUND: the
    // companion bootstraps empty and the new doc gets a row
    val batch = Seq((11L, s"z1 $blockE z2 z3")).toDF("doc_id", "text")
    SpanIndex.appendToIndex(spark, "si_legacy", batch)
    assert(spark.table("si_legacy_spandocs").collect()
      .map(_.getAs[Long]("doc_id")).toSet == Set(11L),
      "appended docs get companion rows; legacy docs have none")
    // legacy content still flags (its grams never left the gram set)
    val probe = Seq((21L, s"p1 $blockX p2")).toDF("doc_id", "text")
    assert(acct(SpanIndex.flagAgainstIndex(spark, "si_legacy", probe, minSpanTokens = 4))
      .apply(21L)._2 == 6L, "legacy grams still flag after the upgrade")
    // a redelivered legacy doc stays idempotent at GRAM grain: its
    // grams anti-join away, and it now (harmlessly) gains a companion
    // row, making it retractable from here on
    val gramsBefore = spark.table("si_legacy_grams").count()
    SpanIndex.appendToIndex(spark, "si_legacy", seed)
    assert(spark.table("si_legacy_grams").count() == gramsBefore,
      "re-appended legacy grams anti-join away")
    // retraction works once the companion exists
    SpanIndex.deleteFromIndex(spark, "si_legacy", Seq(11L).toDF("doc_id"))
    val probeE = Seq((22L, s"q1 $blockE q2")).toDF("doc_id", "text")
    assert(acct(SpanIndex.flagAgainstIndex(spark, "si_legacy", probeE, minSpanTokens = 4))
      .apply(22L)._2 == 0L, "retracted doc 11's grams stop flagging")
  }

  test("writeIndex is rerunnable in one warehouse: the companion's parquet containsNull round-trip") {
    // first write creates _spandocs with collect_set's containsNull =
    // false; the live table reads back nullable — a nullability-exact
    // schema check would refuse the second write (bench-exposed r17)
    val seed = Seq((2L, "r1 r2 r3 r4 r5 r6 r7 r8 r9 r10")).toDF("doc_id", "text")
    SpanIndex.writeIndex(spark, "si_rerun", seed, n = 3, buckets = 2)
    SpanIndex.appendToIndex(spark, "si_rerun",
      Seq((4L, "q1 q2 q3 q4 q5")).toDF("doc_id", "text"))
    SpanIndex.writeIndex(spark, "si_rerun", seed, n = 3, buckets = 2) // must not throw
    assert(spark.table("si_rerun_spandocs").count() == 1L,
      "the rebuild replaces the companion with the fresh corpus")
  }
}
