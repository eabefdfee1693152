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
}
