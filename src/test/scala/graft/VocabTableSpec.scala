package graft

import org.apache.spark.sql.functions._

import graft.operators.{Bpe, TextAnalysis, VocabTable}

class VocabTableSpec extends SparkSpec {
  import spark.implicits._

  test("stored vocabulary equals the direct frame over write + append; stamped replay no-ops") {
    val docs = Tables.documents(spark, sfDir)
    VocabTable.writeVocabTable(spark, "vt_eq", docs.filter(col("doc_id") % 2 === 0),
      buckets = 4)
    VocabTable.appendToVocabTable(spark, "vt_eq", docs.filter(col("doc_id") % 2 === 1),
      batchId = 1L)
    val stored = VocabTable.vocabularyFromTable(spark, "vt_eq").collect().map(_.toSeq).toSeq
    val direct = TextAnalysis.vocabulary(docs).collect().map(_.toSeq).toSeq
    assert(stored.nonEmpty && stored == direct,
      "stored counts must be EXACT — byte-identical to the one-shot vocabulary")
    // a redelivered batch at-or-below the stamp must not double-count
    VocabTable.appendToVocabTable(spark, "vt_eq", docs.filter(col("doc_id") % 2 === 1),
      batchId = 1L)
    assert(VocabTable.vocabularyFromTable(spark, "vt_eq").collect().map(_.toSeq).toSeq
      == direct, "replayed append must no-op under the batch stamp")
  }

  test("ws tokenizer mode: recorded in meta, stored equals direct, appends can't mix") {
    // messy corpus: tabs + doubled spaces violate the single-space
    // contract; every doc's text appears twice
    val docs = Tables.documents(spark, sfDir).limit(100)
      .withColumn("text", concat(col("text"), lit("\t"), col("text"), lit("  ")))
    VocabTable.writeVocabTable(spark, "vt_ws", docs.filter(col("doc_id") % 2 === 0),
      buckets = 4, ws = true)
    assert(VocabTable.tokenizerMode(spark, "vt_ws"), "the mode must be RECORDED")
    // the append carries NO flag — it tokenizes with the stored mode,
    // so a caller cannot silently mix tokenizations across ingests
    VocabTable.appendToVocabTable(spark, "vt_ws", docs.filter(col("doc_id") % 2 === 1),
      batchId = 1L)
    val stored = VocabTable.vocabularyFromTable(spark, "vt_ws").collect().map(_.toSeq).toSeq
    val direct = TextAnalysis.vocabulary(docs, ws = true).collect().map(_.toSeq).toSeq
    assert(stored.nonEmpty && stored == direct,
      "stored ≡ direct under the ws flag (write even + append odd = full corpus)")
    // no fused/empty tokens survive the robust tokenizer
    assert(!stored.exists(r => r.head.asInstanceOf[String].contains("\t") ||
      r.head.asInstanceOf[String].isEmpty), "robust tokens carry no whitespace artifacts")
    // the derived surfaces follow the stored mode with no flag passed:
    // stored-IDF scores equal the one-shot ws tfidf, stored-id encode
    // equals the one-shot ws encode
    val tfidf = VocabTable.tfidfFromTable(spark, "vt_ws", docs).collect().map(_.toSeq).toSeq
    val tfidfDirect = TextAnalysis.tfidfTopK(docs, ws = true).collect().map(_.toSeq).toSeq
    assert(tfidf.nonEmpty && tfidf == tfidfDirect, "stored-IDF scoring follows the mode")
    val enc = VocabTable.encodeFromTable(spark, "vt_ws", docs).collect().map(_.toSeq).toSeq
    val encDirect = TextAnalysis.encodeTokens(docs, ws = true).collect().map(_.toSeq).toSeq
    assert(enc.nonEmpty && enc == encDirect, "stored-id encoding follows the mode")
    // LEGACY decode: a table written through the generic CountTable
    // path (no vocabmeta) reads as the naive tokenizer it was built
    // with, and the first append materializes that mode in place
    graft.operators.CountTable.write(spark, "vt_legacy",
      TextAnalysis.vocabulary(docs.filter(col("doc_id") % 2 === 0)),
      Seq("token"), Seq("doc_freq", "total_count"), 4)
    assert(!VocabTable.tokenizerMode(spark, "vt_legacy"), "legacy tables decode naive")
    VocabTable.appendToVocabTable(spark, "vt_legacy", docs.filter(col("doc_id") % 2 === 1),
      batchId = 1L)
    assert(spark.catalog.tableExists("vt_legacy_vocabmeta") &&
      !VocabTable.tokenizerMode(spark, "vt_legacy"),
      "first append upgrades the legacy table in place, preserving naive mode")
    assert(VocabTable.vocabularyFromTable(spark, "vt_legacy").collect().map(_.toSeq).toSeq
      == TextAnalysis.vocabulary(docs).collect().map(_.toSeq).toSeq,
      "legacy stored ≡ direct naive vocabulary")
  }

  test("meta write-order + empty-meta read: partial failures can't flip the recorded mode") {
    val docs = Tables.documents(spark, sfDir).limit(20)
    // a counts write that fails mid-flight (induced via raise_error)
    // must leave the ws meta ALREADY recorded — meta-before-counts
    // (r20 ADVICE): the reverse order would leave a ws counts table
    // decoding as legacy naive, and the first append would silently
    // mix tokenizations
    val poisoned = docs.withColumn("text",
      expr("CASE WHEN doc_id >= 0 THEN raise_error('induced write failure') ELSE text END"))
    intercept[Exception] {
      VocabTable.writeVocabTable(spark, "vt_partial", poisoned, buckets = 2, ws = true)
    }
    assert(VocabTable.tokenizerMode(spark, "vt_partial"),
      "the intended ws mode survives a failed counts write (meta is written first)")
    // the state self-repairs: re-running the write lands both pieces
    VocabTable.writeVocabTable(spark, "vt_partial", docs, buckets = 2, ws = true)
    assert(VocabTable.vocabularyFromTable(spark, "vt_partial").collect().map(_.toSeq).toSeq
      == TextAnalysis.vocabulary(docs, ws = true).collect().map(_.toSeq).toSeq)
    // a meta table that exists but is EMPTY raises a descriptive
    // error with the repair path, not an index crash or a silently
    // guessed mode (r20 ADVICE)
    spark.table("vt_partial_vocabmeta").filter(lit(false))
      .write.mode("overwrite").saveAsTable("vt_emptymeta_vocabmeta")
    val err = intercept[IllegalStateException] {
      VocabTable.tokenizerMode(spark, "vt_emptymeta")
    }
    assert(err.getMessage.contains("writeVocabTable"),
      s"the error must name the repair path, got: ${err.getMessage}")
  }

  test("oov report counts occurrences under unseen tokens; retrain rule thresholds it") {
    VocabTable.writeVocabTable(spark, "vt_oov",
      Seq((1L, "alpha beta gamma"), (2L, "alpha delta")).toDF("doc_id", "text"), buckets = 2)
    // 6 occurrences, 3 under tokens the store has never seen
    val batch = Seq((10L, "alpha nova nova"), (11L, "beta beta zeta")).toDF("doc_id", "text")
    val r = VocabTable.oovReport(spark, "vt_oov", batch).collect()(0)
    assert(r.getAs[Long]("n_tokens") == 6L && r.getAs[Long]("n_oov") == 3L &&
      r.getAs[Long]("oov_fs") == 5000L, s"got $r")
    assert(VocabTable.vocabNeedsRetrain(spark, "vt_oov", batch, maxOovFs = 4999L))
    assert(!VocabTable.vocabNeedsRetrain(spark, "vt_oov", batch, maxOovFs = 5000L))
    // an all-known batch reports zero; an empty batch divides safely
    val known = Seq((12L, "alpha beta")).toDF("doc_id", "text")
    assert(VocabTable.oovReport(spark, "vt_oov", known).collect()(0)
      .getAs[Long]("oov_fs") == 0L)
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val er = VocabTable.oovReport(spark, "vt_oov", empty).collect()(0)
    assert(er.getAs[Long]("n_tokens") == 0L && er.getAs[Long]("oov_fs") == 0L)
  }

  test("BPE retrains from the stored counts with identical merges to the corpus path") {
    val docs = Tables.documents(spark, sfDir)
    VocabTable.writeVocabTable(spark, "vt_bpe", docs, buckets = 4)
    val fromStore = Bpe.trainFromCounts(
      VocabTable.vocabularyFromTable(spark, "vt_bpe")
        .select(col("token").as("word"), col("total_count").as("weight")),
      numMerges = 12).collect().map(_.toSeq).toSeq
    val fromCorpus = Bpe.train(docs, numMerges = 12).collect().map(_.toSeq).toSeq
    assert(fromStore.nonEmpty && fromStore == fromCorpus,
      "word weights are the only corpus signal BPE uses — merges must match")
  }

  test("maintainVocabTable: OOV drift fires the retrain into the merges table; quiet batches skip it") {
    VocabTable.writeVocabTable(spark, "vt_mn",
      Seq((1L, "alpha beta alpha"), (2L, "beta gamma")).toDF("doc_id", "text"), buckets = 2)
    // quiet batch: every token known -> appended, no retrain, no merges table
    val quiet = Seq((10L, "alpha gamma")).toDF("doc_id", "text")
    assert(!VocabTable.maintainVocabTable(spark, "vt_mn", quiet, batchId = 1L))
    assert(!spark.catalog.tableExists("vt_mn_merges"),
      "a quiet batch must not pay the retrain")
    // drifted batch: majority-OOV occurrences -> retrain from the
    // UPDATED stored counts (the new tokens are in the merges' corpus)
    val drift = Seq((11L, "nova nova nova supernova alpha")).toDF("doc_id", "text")
    assert(VocabTable.maintainVocabTable(spark, "vt_mn", drift, batchId = 2L, numMerges = 5))
    val merges = VocabTable.mergesFromTable(spark, "vt_mn").collect().map(_.toSeq).toSeq
    val direct = Bpe.trainFromCounts(
      VocabTable.vocabularyFromTable(spark, "vt_mn")
        .select(col("token").as("word"), col("total_count").as("weight")),
      numMerges = 5).collect().map(_.toSeq).toSeq
    assert(merges.nonEmpty && merges == direct,
      "the stored merges must be the retrain over the post-append counts")
    // replay of the drifted batch: its tokens are stored now, so OOV
    // recomputes ~0 and the stamp no-ops the append — no double count,
    // no spurious second retrain
    val before = VocabTable.vocabularyFromTable(spark, "vt_mn").collect().map(_.toSeq).toSeq
    assert(!VocabTable.maintainVocabTable(spark, "vt_mn", drift, batchId = 2L))
    assert(VocabTable.vocabularyFromTable(spark, "vt_mn").collect().map(_.toSeq).toSeq == before)
  }

  test("maintainVocabTable requires the replay stamp; derivedNumMerges follows the types/4 rule") {
    val e = intercept[IllegalArgumentException] {
      VocabTable.maintainVocabTable(spark, "vt_nostamp",
        Seq((1L, "x")).toDF("doc_id", "text"), batchId = -1L)
    }
    assert(e.getMessage.contains("batchId"),
      s"the unstamped path must be refused by name, got: ${e.getMessage}")
    // floor, proportional middle, ceiling
    assert(VocabTable.derivedNumMerges(0L) == 256)
    assert(VocabTable.derivedNumMerges(4096L) == 1024)
    assert(VocabTable.derivedNumMerges(10000000L) == 32768)
  }

  test("maintain-vocab CLI path: stamped via the 4th arg, replay no-ops, unstamped refused") {
    VocabTable.writeVocabTable(spark, "vtm_cli",
      Seq((1L, "alpha beta")).toDF("doc_id", "text"), buckets = 2)
    val dir = java.nio.file.Files.createTempDirectory("vtmcli").toString + "/b1"
    Seq((10L, "nova nova nova")).toDF("doc_id", "text").write.parquet(dir)
    // 100%-OOV batch: fires the retrain at the DERIVED merge budget
    assert(PipelineJob.runMaintain(spark, "maintain-vocab", dir, "vtm_cli", Some("1")))
    assert(VocabTable.mergesFromTable(spark, "vtm_cli").count() > 0L,
      "the derived-budget retrain must land merges")
    val before = VocabTable.vocabularyFromTable(spark, "vtm_cli").collect().map(_.toSeq).toSeq
    assert(!PipelineJob.runMaintain(spark, "maintain-vocab", dir, "vtm_cli", Some("1")),
      "a re-run of the CLI job with the same id must not re-fire")
    assert(VocabTable.vocabularyFromTable(spark, "vtm_cli").collect().map(_.toSeq).toSeq == before,
      "a re-run of the CLI job must not double-count the stored vocabulary")
    // the unstamped CLI invocation dies at dispatch (ADVICE r17)
    val e = intercept[IllegalArgumentException] {
      PipelineJob.runMaintain(spark, "maintain-vocab", dir, "vtm_cli", None)
    }
    assert(e.getMessage.contains("batchId"))
  }

  test("streaming vocab ingest: counts accumulate per micro-batch, a redelivered batch no-ops") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx = spark.sqlContext
    Seq("vt_st_counts", "vt_st_meta").foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    VocabTable.writeVocabTable(spark, "vt_st",
      Seq((1L, "alpha beta")).toDF("doc_id", "text"), buckets = 2)
    val ms = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamingPipeline
      .vocabIngestStream(ms.toDF().toDF("doc_id", "text"), "vt_st").start()
    def vocab = VocabTable.vocabularyFromTable(spark, "vt_st").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    try {
      ms.addData((2L, "alpha alpha gamma"))
      q.processAllAvailable()
      val after0 = vocab
      assert(after0 == Map("alpha" -> ((2L, 3L)), "beta" -> ((1L, 1L)),
        "gamma" -> ((1L, 1L))), s"micro-batch 0 must sum into the store, got $after0")
      // redelivery at the SAME micro-batch id: additive counts would
      // double without the stamp
      VocabTable.appendToVocabTable(spark, "vt_st",
        Seq((2L, "alpha alpha gamma")).toDF("doc_id", "text"), batchId = 0L)
      assert(vocab == after0, "a redelivered micro-batch must no-op against the stamp")
      ms.addData((3L, "beta delta"))
      q.processAllAvailable()
      assert(vocab == Map("alpha" -> ((2L, 3L)), "beta" -> ((2L, 2L)),
        "gamma" -> ((1L, 1L)), "delta" -> ((1L, 1L))),
        "the NEXT micro-batch must still apply after a replay")
    } finally q.stop()
  }

  test("writeVocabTable is rerunnable after appends flipped the table (bench-exposed r17)") {
    val a = Seq((1L, "alpha beta")).toDF("doc_id", "text")
    val b = Seq((2L, "beta gamma")).toDF("doc_id", "text")
    VocabTable.writeVocabTable(spark, "vt_rr", a, buckets = 2)
    VocabTable.appendToVocabTable(spark, "vt_rr", b) // generation flip
    // the rebuild: a plain Overwrite at the base location would die
    // with LOCATION_ALREADY_EXISTS; writeStamped now stages a new
    // generation instead
    VocabTable.writeVocabTable(spark, "vt_rr", a, buckets = 2)
    val got = VocabTable.vocabularyFromTable(spark, "vt_rr").collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got == Map("alpha" -> 1L, "beta" -> 1L),
      s"the rebuild must reflect ONLY the fresh corpus, got $got")
  }
test("frozen-IDF tfidf from the stored table equals the one-shot; OOV scores at the df=1 ceiling") {
    val docs = Tables.documents(spark, sfDir)
    VocabTable.writeVocabTable(spark, "vt_idf", docs.filter(col("doc_id") % 2 === 0),
      buckets = 4)
    VocabTable.appendToVocabTable(spark, "vt_idf", docs.filter(col("doc_id") % 2 === 1))
    val stored = VocabTable.tfidfFromTable(spark, "vt_idf", docs).collect().map(_.toSeq).toSeq
    val direct = TextAnalysis.tfidfTopK(docs).collect().map(_.toSeq).toSeq
    assert(stored.nonEmpty && stored == direct,
      "df from the stored counts must reproduce the one-shot scores exactly")
    // a batch with an unseen token: it scores at tf * 1e6 / 1 — the
    // rarest-possible ceiling — and outranks every stored-vocab token
    val batch = Seq((99L, "unseenword unseenword alpha")).toDF("doc_id", "text")
    VocabTable.writeVocabTable(spark, "vt_idf2",
      Seq((1L, "alpha beta"), (2L, "alpha gamma")).toDF("doc_id", "text"), buckets = 2)
    val top = VocabTable.tfidfFromTable(spark, "vt_idf2", batch, k = 2).collect()
      .map(r => (r.getLong(1), r.getString(2), r.getLong(3)))
    assert(top.toSeq == Seq((1L, "unseenword", 2000000L), (2L, "alpha", 500000L)),
      s"OOV df=1 ceiling and stored df=2 for alpha, got ${top.mkString(";")}")
  }
test("stored-vocab token ids equal the one-shot encode; ids stay STABLE across an append") {
    val docs = Tables.documents(spark, sfDir)
    VocabTable.writeVocabTable(spark, "vt_enc", docs.filter(col("doc_id") % 2 === 0),
      buckets = 4)
    VocabTable.appendToVocabTable(spark, "vt_enc", docs.filter(col("doc_id") % 2 === 1))
    val stored = VocabTable.encodeFromTable(spark, "vt_enc", docs).collect().map(_.toSeq).toSeq
    val direct = TextAnalysis.encodeTokens(docs).collect().map(_.toSeq).toSeq
    assert(stored.nonEmpty && stored == direct,
      "ids ranked from the stored counts must equal the one-shot encode")
    // id stability: an append that does NOT reorder the frequency
    // ranking leaves every existing id unchanged (the point of a
    // frozen id table), and an OOV token encodes -1
    VocabTable.writeVocabTable(spark, "vt_enc2",
      Seq((1L, "alpha alpha alpha beta beta gamma")).toDF("doc_id", "text"), buckets = 2)
    val probe = Seq((9L, "beta gamma alpha novel")).toDF("doc_id", "text")
    def ids() = VocabTable.encodeFromTable(spark, "vt_enc2", probe).collect()
      .map(r => r.getLong(2)).toSeq
    val before = ids()
    assert(before == Seq(2L, 3L, 1L, -1L), s"got $before")
    VocabTable.appendToVocabTable(spark, "vt_enc2",
      Seq((2L, "alpha beta")).toDF("doc_id", "text")) // ranking preserved
    assert(ids() == before, "a ranking-preserving append must not move any id")
  }
}
