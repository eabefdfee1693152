package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Typed feature-point ingestion — the reference CLI's "load points
  * from file" surface (ScaleUnlimited/flink-streaming-kmeans reads
  * CSV feature points), Spark-first: explicit schemas (no inference
  * job over 100 TB), parquet or CSV, `Dataset[FeaturePoint]` out.
  */
object FeatureSource {

  /** A feature point: id + n-dim double vector. */
  case class FeaturePoint(id: Long, vec: Array[Double])

  val csvSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("x", DoubleType, nullable = false),
    StructField("y", DoubleType, nullable = false)))

  /** 2-D points from CSV (id,x,y — the reference's input shape).
    * Explicit schema: no inference pass, malformed rows fail fast.
    */
  def csv2d(spark: SparkSession, path: String): Dataset[FeaturePoint] = {
    import spark.implicits._
    spark.read.schema(csvSchema).option("mode", "FAILFAST").csv(path)
      .select(col("id"), array(col("x"), col("y")).as("vec"))
      .as[FeaturePoint]
  }

  /** n-dim points from a parquet embedding table (id + array column).
    * Float arrays upcast to double (exact).
    */
  def parquetVectors(spark: SparkSession, path: String,
                     idCol: String, vecCol: String): Dataset[FeaturePoint] = {
    import spark.implicits._
    spark.read.parquet(path)
      .select(col(idCol).cast("long").as("id"),
        transform(col(vecCol), _.cast("double")).as("vec"))
      .as[FeaturePoint]
  }
}
