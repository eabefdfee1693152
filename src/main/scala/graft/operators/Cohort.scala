package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** First-seen cohort analysis: users are grouped by the day of their
  * FIRST activity, and the matrix reports how many of each cohort are
  * active at each age (days since their cohort day) — the classic
  * triangle the growth dashboards draw. Complements
  * [[Sketches.retentionDaily]], which intersects per-day audiences at
  * fixed lags regardless of when a user first appeared.
  *
  * Scale shape: the per-(day, user) DISTINCT reduction is the only
  * pass over the raw events; the user-window min that assigns cohorts
  * shuffles the already-distinct activity frame (≤ days rows per
  * user), and because (d, user) rows are unique, (cohort, age, user)
  * rows are too — so the final count needs NO second distinct: it
  * partial-aggregates map-side and exchanges only (cohort, age)
  * partial counts. Two data-sized shuffles total, both of reduced
  * frames.
  */
object Cohort {

  /** Per (cohort_d, age_days): distinct active users. Output ordered
    * by (cohort_d, age_days); age 0 row = the cohort's size.
    */
  def matrixDaily(spark: SparkSession, dir: String): DataFrame = {
    val act = graft.Tables.events(spark, dir)
      .select(unix_timestamp(date_trunc("day", col("ts"))).as("d"), col("user_id"))
      .distinct()
    val cohort = min(col("d")).over(Window.partitionBy(col("user_id")))
    act.withColumn("cohort_d", cohort)
      .groupBy(col("cohort_d"), expr("(d - cohort_d) div 86400").as("age_days"))
      .agg(count(lit(1)).as("n_active"))
      .orderBy(col("cohort_d"), col("age_days"))
  }
}
