package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math as Catalyst `Column` expressions over `array<double>`.
  *
  * Everything here compiles to higher-order-function expressions
  * (`zip_with` / `aggregate` / `transform`) that stay inside
  * WholeStageCodegen — no UDFs, no serialization boundary — so a
  * 100 TB scan of embeddings evaluates these at full codegen speed.
  *
  * Semantics mirror the distance math of the reference engine
  * (ScaleUnlimited/flink-streaming-kmeans: Euclidean nearest-centroid
  * assignment); cosine/dot are the embedding-pipeline extensions.
  *
  * Summation is a sequential fold in element order, which keeps the
  * result deterministic for a given row (important for oracle parity).
  */
object VectorFunctions {

  /** Cast `array<float>` (how parquet stores embeddings) to
    * `array<double>` so all arithmetic happens in f64 — float→double
    * is exact, so this is loss-free and engine-portable.
    */
  def toDoubleArray(v: Column): Column = transform(v, _.cast("double"))

  /** Pick the native codegen'd kernel when the active session has
    * GraftExtensions; the HOF twin otherwise. Same sequential fold,
    * bit-identical results (oracle-gated) — but the native kernel is
    * one tight loop where the HOF is an interpreted lambda per
    * element, and these sit in every embedding operator's hot path.
    */
  private def nativeOr(name: String, a: Column, b: Column)(fallback: => Column): Column =
    org.apache.spark.sql.SparkSession.getActiveSession
      .filter(_.catalog.functionExists(name))
      .map(_ => call_function(name, a, b))
      .getOrElse(fallback)

  /** Sequential-fold dot product: sum_i a(i)*b(i). */
  def dot(a: Column, b: Column): Column = nativeOr("graft_dot", a, b) {
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
  }

  /** Squared Euclidean distance: sum_i (a(i)-b(i))^2. */
  def l2sq(a: Column, b: Column): Column = nativeOr("graft_l2sq", a, b) {
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x)
  }

  /** L2 norm. */
  def l2norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity = dot / (|a| |b|). Callers joining many pairs
    * should precompute norms once per side (see operators.Similarity)
    * instead of re-deriving them per pair.
    */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))

  /** Cosine given precomputed norms (the join-friendly form). */
  def cosineWithNorms(a: Column, b: Column, normA: Column, normB: Column): Column =
    dot(a, b) / (normA * normB)
}
