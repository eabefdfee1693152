package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two paths:
  *  - `bruteTopK`: exact cosine top-k for a BOUNDED query set. The
  *    query side is broadcast (it is k rows, not the corpus), the
  *    corpus scan stays narrow, and per-query top-k is a
  *    window-ranked partial — this is the oracle baseline, linear in
  *    corpus size, only sane when |queries| is small.
  *  - `lshTopK`: random-hyperplane LSH — corpus and queries hash to
  *    sign-pattern buckets; candidates = bucket collisions (equi-join
  *    on bucket key, never a cross join); exact cosine re-ranks only
  *    candidates. This is the 100-TB path: cost ∝ bucket collision
  *    volume, not |corpus|×|queries|.
  *
  * Hyperplanes are derived deterministically from xxhash64 so both
  * engines (and reruns) see identical buckets without any RNG state.
  */
object Similarity {

  /** Fixed-point cosine (floor 1e6) — the ranking key. Ranking on the
    * fixed-point value with an id tie-break keeps ordering identical
    * across engines regardless of last-ulp float differences.
    */
  private def cosFs(cos: Column): Column = floor(lit(1000000.0) * cos)

  def bruteTopK(embeddings: DataFrame, nQueries: Int = 10, k: Int = 5): DataFrame = {
    val e = Par.spread(embeddings).select(col("vec_id"), toDoubleArray(col("embedding")).as("v"))
      .withColumn("nrm", l2norm(col("v")))
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
    val cand = e.select(col("vec_id").as("c_id"), col("v").as("cv"), col("nrm").as("cn"))
    val byQ = Window.partitionBy(col("q_id")).orderBy(col("cos_fs").desc, col("c_id"))
    cand.join(broadcast(q), col("c_id") =!= col("q_id"))
      .select(col("q_id"), col("c_id"),
        cosFs(cosineWithNorms(col("qv"), col("cv"), col("qn"), col("cn"))).as("cos_fs"))
      .withColumn("rnk", row_number().over(byQ).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("rnk"), col("c_id"), col("cos_fs"))
      .orderBy(col("q_id"), col("rnk"))
  }

  /** Deterministic pseudo-random hyperplane component h(p, i) ∈ {-1,+1}
    * from xxhash64 — sign-only hyperplanes are the standard SRP-LSH
    * construction and need no stored model.
    */
  private def planeComponent(plane: Int, i: Int): Column =
    when(pmod(xxhash64(lit(s"plane$plane#dim$i")), lit(2L)) === 0L, lit(1.0)).otherwise(lit(-1.0))

  /** Sign-pattern bucket id over `planes` hyperplanes (bit b = sign of
    * dot(v, plane_b)).
    */
  def srpBucket(v: Column, dim: Int, planes: Int): Column =
    (0 until planes).map { p =>
      val dot = (1 to dim).map(i => element_at(v, i) * planeComponent(p, i)).reduce(_ + _)
      when(dot >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** IVF (inverted-file) approximate top-k: the corpus is coarsely
    * quantized by OUR k-means (operators.KMeans — the reference
    * engine's clustering doubles as the ANN index); each query probes
    * its `nprobe` nearest centroids and ranks only the vectors
    * assigned to those lists.
    *
    * Scale shape: the index build is Lloyd's (narrow assign + k-row
    * agg per iteration); the search is an equi-join on the cluster id
    * — bucketed candidate generation, never a cross join. Recall is
    * tuned by nprobe; cost ∝ probed-list volume, not corpus size.
    */
  def ivfTopK(embeddings: DataFrame, dim: Int = 64, nlist: Int = 16, nprobe: Int = 4,
              nQueries: Int = 10, k: Int = 5): DataFrame = {
    import graft.operators.KMeans
    val pts = embeddings.select(col("vec_id").cast("long").as("vec_id"),
      toDoubleArray(col("embedding")).as("v"))
    val (assigned, cents) = KMeans.lloyd(pts, "vec_id", "v", nlist, iters = 2, dim = dim)
    val lists = assigned.select(col("id").as("c_id"), col("v").as("cv"), col("cluster"))
      .withColumn("cn", l2norm(col("cv")))
    // nprobe nearest centroid ids per query: sort (distance, cid)
    // structs lexicographically, slice, project the ids
    val distStructs = array(cents.map { case (cid, c) =>
      struct(l2sq(col("qv"), typedlit(c)).as("d"), lit(cid).as("cid"))
    }: _*)
    val probed = transform(slice(array_sort(distStructs), 1, nprobe), s => s.getField("cid"))
    val q = pts.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
      .withColumn("qn", l2norm(col("qv")))
      .withColumn("probe_cluster", explode(probed))
    val byQ = Window.partitionBy(col("q_id")).orderBy(col("cos_fs").desc, col("c_id"))
    lists.join(broadcast(q),
        col("cluster") === col("probe_cluster") && col("c_id") =!= col("q_id"))
      .select(col("q_id"), col("c_id"),
        cosFs(cosineWithNorms(col("qv"), col("cv"), col("qn"), col("cn"))).as("cos_fs"))
      .withColumn("rnk", row_number().over(byQ).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("rnk"), col("c_id"), col("cos_fs"))
      .orderBy(col("q_id"), col("rnk"))
  }

  /** LSH-bucketed approximate top-k: per query, rank candidates that
    * collide in the sign-pattern bucket. Smaller `planes` → bigger
    * buckets → higher recall, more compute.
    */
  def lshTopK(embeddings: DataFrame, dim: Int = 64, planes: Int = 6,
              nQueries: Int = 10, k: Int = 5): DataFrame = {
    val e = Par.spread(embeddings).select(col("vec_id"), toDoubleArray(col("embedding")).as("v"))
      .withColumn("nrm", l2norm(col("v")))
      .withColumn("bucket", srpBucket(col("v"), dim, planes))
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"),
        col("bucket").as("q_bucket"))
    val byQ = Window.partitionBy(col("q_id")).orderBy(col("cos_fs").desc, col("c_id"))
    e.select(col("vec_id").as("c_id"), col("v").as("cv"), col("nrm").as("cn"), col("bucket"))
      .join(broadcast(q), col("bucket") === col("q_bucket") && col("c_id") =!= col("q_id"))
      .select(col("q_id"), col("c_id"),
        cosFs(cosineWithNorms(col("qv"), col("cv"), col("qn"), col("cn"))).as("cos_fs"))
      .withColumn("rnk", row_number().over(byQ).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("rnk"), col("c_id"), col("cos_fs"))
      .orderBy(col("q_id"), col("rnk"))
  }
}
