package graft

import java.nio.file.Files

import graft.operators.Multimodal
import graft.sources.FeatureSource

class SourcesSpec extends SparkSpec {

  test("csv2d reads typed 2-D feature points with explicit schema") {
    val dir = Files.createTempDirectory("graft_csv")
    Files.writeString(dir.resolve("pts.csv"), "0,1.0,2.0\n1,3.5,4.5\n")
    val pts = FeatureSource.csv2d(spark, dir.toString).collect().sortBy(_.id)
    assert(pts.length == 2)
    assert(pts(0).vec.toSeq == Seq(1.0, 2.0))
    assert(pts(1).vec.toSeq == Seq(3.5, 4.5))
  }

  test("parquetVectors upcasts float embeddings to double exactly") {
    val pts = FeatureSource.parquetVectors(spark, s"$sfDir/embeddings.parquet",
      "vec_id", "embedding")
    val p = pts.filter(_.id == 0L).collect()(0)
    assert(p.vec.length == 64)
  }

  test("multimodal decode stub: n_bytes matches payload, checksum is the rolling byte hash") {
    import spark.implicits._
    val docs = Seq((1L, "abc")).toDF("doc_id", "text")
    val out = Multimodal.decodeFeatures(Multimodal.asMultimodal(docs)).collect()(0)
    assert(out.getAs[Long]("n_bytes") == 3L)
    assert(out.getAs[String]("mime") == "application/octet-stream")
    val expected = "abc".getBytes("UTF-8").foldLeft(0L)((a, b) => (a * 31 + (b & 0xff)) % 1000000007L)
    assert(out.getAs[Long]("feat_checksum") == expected)
  }

  test("multimodal metadata allows pruned filtering without touching payloads") {
    val docs = Tables.documents(spark, sfDir)
    val mm = Multimodal.asMultimodal(docs)
    val n = mm.filter(org.apache.spark.sql.functions.col("meta.n_bytes") > 100).count()
    assert(n > 0 && n < 500)
  }
}
