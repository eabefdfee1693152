package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Feature normalization (min-max + z-score) — the feature-prep step
  * in front of k-means (the reference CLI normalizes input features
  * before clustering).
  *
  * Two-pass at any scale: pass 1 is a 1-row global aggregate
  * (min/max/mean/stddev — constant-size partials), pass 2 a narrow
  * projection with the stats as broadcast literals. Stats round to
  * 6 dp before reuse so downstream math is bit-identical across
  * engines.
  */
object FeatureScale {

  def scaled(df: DataFrame, idCol: String, valueCol: String): DataFrame = {
    val row = df.agg(
      min(col(valueCol)).cast("double").as("mn"),
      max(col(valueCol)).cast("double").as("mx"),
      round(avg(col(valueCol)), 6).as("mu"),
      round(stddev_samp(col(valueCol)), 6).as("sigma")).collect()(0)
    val (mn, mx, mu, sigma) =
      (row.getDouble(0), row.getDouble(1), row.getDouble(2), row.getDouble(3))
    df.select(col(idCol),
        round(col(valueCol), 2).as("value"),
        floor(lit(1000000.0) * ((col(valueCol) - mn) / (mx - mn))).as("minmax_fs"),
        floor(lit(10000.0) * ((col(valueCol) - mu) / sigma)).as("z_fs"))
      .orderBy(col(idCol))
  }
}
