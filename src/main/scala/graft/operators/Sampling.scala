package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic hash-based sampling and dataset splits — the
  * train/val/test and per-source mixture-weighting primitives of a
  * training-data pipeline.
  *
  * The selector is `md5(salt || id)` compared as a lowercase-hex
  * STRING prefix: engine-portable (Spark and DuckDB produce identical
  * digests for identical strings, and lexicographic order on
  * fixed-width lowercase hex IS numeric order), seedable via the
  * salt, and free of RNG state — so at 100 TB the split is
  * reproducible run-to-run, independent of partitioning, shard
  * order, executor count, and engine. It is also pure map-side: a
  * narrow codegen'd projection/filter with ZERO shuffle (Spark's own
  * `sample()` is RNG-per-partition and not stable under repartition;
  * this is the pattern production pipelines use instead).
  */
object Sampling {

  /** First `width` lowercase-hex chars of md5(salt || id) — a uniform
    * draw from [0, 16^width) encoded as a fixed-width string.
    */
  private def hexKey(id: Column, salt: String, width: Int): Column =
    substring(md5(concat(lit(salt), id.cast("string"))), 1, width)

  /** Hex threshold string t such that (hexKey < t) keeps ~fraction of
    * rows. Fraction ≥ 1 returns "g" — every hex digit sorts below
    * 'g', so the predicate is constant-true.
    */
  private[graft] def hexThreshold(fraction: Double, width: Int): String = {
    require(fraction >= 0.0, s"fraction must be >= 0, got $fraction")
    val buckets = 1L << (4 * width)
    val cut = math.round(fraction * buckets)
    if (cut >= buckets) "g" else ("%0" + width + "x").format(cut)
  }

  /** The split label as a bare Column — compose into any projection
    * (zero extra plan nodes, stays map-side).
    */
  def splitColumn(id: Column, salt: String = "graft#",
                  trainFrac: Double = 0.75, valFrac: Double = 0.125): Column = {
    val h = hexKey(id, salt, 2)
    when(h < hexThreshold(trainFrac, 2), lit("train"))
      .when(h < hexThreshold(trainFrac + valFrac, 2), lit("val"))
      .otherwise(lit("test"))
  }

  /** Deterministic train/val/test split assignment per row:
    * train = 75%, val = 12.5%, test = 12.5% by default (thresholds at
    * 2-hex-char = 1/256 granularity). Stable across engines, runs,
    * and repartitioning; change `salt` to redraw.
    */
  def split(df: DataFrame, idCol: String = "doc_id", salt: String = "graft#",
            trainFrac: Double = 0.75, valFrac: Double = 0.125): DataFrame =
    df.select(col(idCol), splitColumn(col(idCol), salt, trainFrac, valFrac).as("split"))
      .orderBy(col(idCol))

  /** Stratified deterministic sample: per-stratum keep fractions (a
    * mixture weighting over sources/domains — upsample quality
    * domains, downsample boilerplate ones). Rows in a stratum not in
    * `fractions` use `defaultFrac`. 4-hex-char thresholds = 1/65536
    * granularity. Output is the surviving (id, stratum) rows.
    *
    * Plan shape: the stratum→threshold mapping is a small CASE
    * expression (broadcast-free, codegen'd), so this stays a narrow
    * scan-speed filter no matter how many strata exist.
    */
  def stratifiedSample(df: DataFrame, stratumCol: String = "source",
                       idCol: String = "doc_id",
                       fractions: Map[String, Double] = Map.empty,
                       defaultFrac: Double = 0.25,
                       salt: String = "graft#"): DataFrame = {
    val thr = fractions.foldLeft(lit(hexThreshold(defaultFrac, 4))) {
      case (acc, (stratum, f)) =>
        when(col(stratumCol) === stratum, lit(hexThreshold(f, 4))).otherwise(acc)
    }
    df.filter(hexKey(col(idCol), salt, 4) < thr)
      .select(col(idCol), col(stratumCol))
      .orderBy(col(idCol))
  }

  /** Deterministic per-stratum document cap — the "domain cap" web
    * curation applies so no single source dominates the mixture: keep
    * the `maxDocs` docs per stratum with the LOWEST md5(salt || id),
    * the same selector family as [[split]]/[[stratifiedSample]], so
    * the kept set is engine/run/partitioning-stable and redrawable by
    * salt. Unlike a fraction, the cap is EXACT: heavy strata keep
    * exactly `maxDocs`, light strata keep everything.
    *
    * Scale shape: a naive row_number over (stratum) serializes each
    * stratum into ONE window task — the heaviest domain becomes the
    * job's straggler. Keep-lowest-N is PREFIX-CLOSED under any
    * refinement of the ranking partitioning (a stratum's lowest N are
    * a subset of the union of its subgroups' lowest N), so level 1
    * ranks within (stratum, first-2-hex-chars subgroup) — 256
    * hash-uniform bounded partitions per stratum — and level 2 ranks
    * only the ≤ 256·maxDocs survivors. The same two-level device as
    * [[TextAnalysis.packByWindow]]'s pack groups; both windows
    * shuffle slim (id, stratum, hash) rows only.
    */
  def capPerStratum(df: DataFrame, maxDocs: Int, stratumCol: String = "source",
                    idCol: String = "doc_id", salt: String = "graft#"): DataFrame = {
    require(maxDocs >= 1, s"maxDocs must be >= 1, got $maxDocs")
    cappedByLowestHash(df, lit(maxDocs.toLong), stratumCol, idCol, salt)
  }

  /** Mixture-weighted downsampling to TARGET proportions: given
    * integer weights w_s per source (w_s / Σw is the share source s
    * must hold in the output), keep the LARGEST corpus that exactly
    * satisfies them — the static mixture-reweighting step (the
    * DoReMi/Pile-style "data recipe") that turns a crawl whose natural
    * composition is wrong into a training mix that matches the recipe.
    *
    * The rule, exact in integer arithmetic in both engines:
    *
    *   budget B  = min over weighted s of  (n_s · W) div w_s
    *   cap_s     = (B · w_s) div W
    *
    * B is the largest total size every stratum can supply its share
    * of; heavy-supply strata downsample, the scarcest stratum binds.
    * A weighted stratum ABSENT from the corpus yields B = 0 and an
    * empty result — a recipe naming a source the corpus lacks is
    * unsatisfiable, and silently renormalizing around it would ship
    * the wrong mixture (spec-pinned). Unweighted strata are dropped.
    *
    * Selection within a stratum is keep-lowest-md5 — the same
    * engine/partitioning-stable selector as [[capPerStratum]], same
    * two-level window, so the kept set is reproducible and redrawable
    * by salt. Plan shape: one partial-agged count per stratum, the
    * caps frame stays broadcast-size (strata are a bounded dimension),
    * and the ranking shuffles slim (id, stratum, hash) rows only.
    */
  def mixtureSample(df: DataFrame, weights: Map[String, Long],
                    stratumCol: String = "source", idCol: String = "doc_id",
                    salt: String = "graft#"): DataFrame = {
    require(weights.nonEmpty, "mixtureSample needs at least one weighted stratum")
    require(weights.values.forall(_ > 0), s"weights must be positive, got $weights")
    val bigW = weights.values.sum
    // bounded driver decision (the Lloyd-centroids pattern): strata
    // are a dims-table-sized dimension, so the per-stratum counts
    // collect to a handful of rows and the caps compile into a CASE
    // literal — the ranking pass below then has ZERO extra joins
    val counts = df.filter(col(stratumCol).isin(weights.keys.toSeq: _*))
      .groupBy(col(stratumCol)).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // absent weighted stratum → n = 0 → budget 0 → empty result (an
    // unsatisfiable recipe must not silently renormalize)
    val budget = weights.map { case (s, w) => counts.getOrElse(s, 0L) * bigW / w }.min
    val caps = weights.map { case (s, w) => s -> budget * w / bigW }
    val capExpr = caps.foldLeft(lit(-1L)) { case (acc, (s, c)) =>
      when(col(stratumCol) === s, lit(c)).otherwise(acc)
    }
    cappedByLowestHash(df.filter(col(stratumCol).isin(weights.keys.toSeq: _*)),
      capExpr, stratumCol, idCol, salt)
  }

  /** [[mixtureSample]] with the recipe in TOKEN share — the unit
    * production data recipes are actually written in (a "30% code /
    * 70% web" mixture means token share, not document share: doc
    * counts misweight whenever strata have different length
    * distributions, which they always do). Per-stratum TOKEN budgets
    * follow the same integer rule — B = min_s(T_s · W / w_s),
    * cap_s = B · w_s / W over per-stratum token totals T_s — and docs
    * survive in salted-hash order while their FIRST token falls
    * inside the stratum's cap (cumulative-before < cap, the
    * [[TextAnalysis.pack]] convention): realized share deviates from
    * w_s/W by at most ONE straddling document per stratum, and an
    * absent weighted stratum zeroes the budget rather than silently
    * renormalizing ([[mixtureSample]]'s contract).
    *
    * Scale shape: the totals are a bounded driver decision (strata
    * are dims-sized); the cumulative token sum runs TWO-LEVEL like
    * [[mixtureSample]]'s rank — within-(stratum, 2-hex-bucket)
    * running sums plus per-bucket offsets (a 256-row running sum per
    * stratum, broadcast back) — so no stratum serializes through one
    * window task. Exactness of the composition: ordering by the full
    * hash sorts first by its 2-hex prefix, so bucket-order-then-
    * within-bucket-order IS the global hash order (the same
    * prefix-closure argument behind mixtureSample's two-level rank;
    * two-level ≡ single-window spec-pinned). The DuckDB twin states
    * the SEMANTICS as one window — oracles match results, not plans.
    */
  def mixtureByTokens(df: DataFrame, weights: Map[String, Long],
                      stratumCol: String = "source", idCol: String = "doc_id",
                      textCol: String = "text", salt: String = "graft#"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(weights.nonEmpty, "mixtureByTokens needs at least one weighted stratum")
    require(weights.values.forall(_ > 0), s"weights must be positive, got $weights")
    val bigW = weights.values.sum
    val nTok = size(graft.functions.TextFunctions.tokens(col(textCol))).cast("long")
    val base = df.filter(col(stratumCol).isin(weights.keys.toSeq: _*))
      .select(col(idCol), col(stratumCol), nTok.as("n_tok"))
      .withColumn("h", md5(concat(lit(salt), col(idCol).cast("string"))))
    val totals = base.groupBy(col(stratumCol)).agg(sum(col("n_tok")).as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val budget = weights.map { case (s, w) => totals.getOrElse(s, 0L) * bigW / w }.min
    val caps = weights.map { case (s, w) => s -> budget * w / bigW }
    val capExpr = caps.foldLeft(lit(-1L)) { case (acc, (s, c)) =>
      when(col(stratumCol) === s, lit(c)).otherwise(acc)
    }
    // level 1: within-(stratum, bucket) cumulative-before
    val bucket = substring(col("h"), 1, 2)
    val w1 = Window.partitionBy(col(stratumCol), col("bkt"))
      .orderBy(col("h"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    // level 2: per-bucket token totals -> running offsets (≤256 rows
    // per stratum — the window here runs over a bounded frame)
    val wOff = Window.partitionBy(col(stratumCol)).orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val withBkt = base.withColumn("bkt", bucket)
    val offsets = withBkt.groupBy(col(stratumCol), col("bkt"))
      .agg(sum(col("n_tok")).as("bt"))
      .withColumn("off", coalesce(sum(col("bt")).over(wOff), lit(0L)))
      .select(col(stratumCol), col("bkt"), col("off"))
    withBkt
      .withColumn("cum_in", coalesce(sum(col("n_tok")).over(w1), lit(0L)))
      .join(broadcast(offsets), Seq(stratumCol, "bkt"))
      .withColumn("cum_before", col("off") + col("cum_in"))
      .filter(col("cum_before") < capExpr)
      .select(col(idCol), col(stratumCol), col("n_tok"))
      .orderBy(col(idCol))
  }

  /** Weighted sampling WITHOUT replacement — pick `k` documents with
    * inclusion probability proportional to an integer per-row weight
    * (quality-weighted downsampling: a weight-5 doc is 5× as likely
    * to survive as a weight-1 doc at every step), via the
    * Efraimidis–Spirakis A-ES scheme made INTEGER-EXACT: for an
    * integer weight w, the A-ES key u^(1/w) is distribution-equal to
    * the MAXIMUM of w independent uniform draws, so each row's key is
    * `array_max` of w salted md5 strings — pure fixed-width-hex
    * string comparison, engine/run/partitioning-stable like every
    * selector in this object, no floating-point ln/pow to disagree
    * across engines. Top-k by (key desc, id) is the sample.
    *
    * Scale shape: the key is a narrow codegen'd projection (w ≤
    * `maxWeight` digests per row, map-side); the only coordination is
    * one global top-k — `TakeOrderedAndProject`, per-partition heaps
    * merged on the driver, the [[Relational.q10TopK]] shape. Weights
    * outside [1, maxWeight] raise rather than silently reshaping the
    * distribution.
    */
  def weightedSample(df: DataFrame, k: Int, weight: Column,
                     idCol: String = "doc_id", salt: String = "graft#",
                     maxWeight: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, s"k must be >= 1, got $k")
    require(maxWeight >= 1, s"maxWeight must be >= 1, got $maxWeight")
    val w = when(weight.cast("long").between(1L, maxWeight.toLong), weight.cast("int"))
      .otherwise(raise_error(concat(lit(s"weightedSample weight outside [1, $maxWeight]: "),
        weight.cast("string"))))
    val key = array_max(transform(sequence(lit(1), w), r =>
      md5(concat(lit(salt), col(idCol).cast("string"), lit("#"), r.cast("string")))))
    val top = df.select(col(idCol), w.cast("long").as("w"), key.as("k_"))
      .orderBy(col("k_").desc, col(idCol)).limit(k)
    // the global rank window runs AFTER the top-k cut — ≤ k rows, a
    // bounded single task by construction
    top.withColumn("rnk", row_number()
        .over(Window.orderBy(col("k_").desc, col(idCol))).cast("long"))
      .select(col(idCol), col("w"), col("rnk"))
      .orderBy(col(idCol))
  }

  /** Fractional-epoch source mixing WITH replacement — the "books ×
    * 2.5 epochs, web × 1, boilerplate × 0.25" data recipe: every doc
    * of a source with epochs e appears floor(e) times, and a
    * deterministic frac(e) share of the source's docs (the house
    * md5-threshold selector, so the share is exact to 1/65536 and
    * redrawable by salt) appears once more. e < 1 degenerates to
    * plain downsampling; sources absent from the recipe are dropped
    * (an explicit recipe, like [[mixtureSample]]'s). Output carries a
    * `copy` ordinal so downstream shuffles/packing treat repeats as
    * distinct rows.
    *
    * Scale shape: pure map-side fan-out (a CASE over the bounded
    * source dimension + one `explode(sequence)`), zero shuffle, zero
    * joins — the repeat factor never materializes on the driver.
    */
  def epochMix(df: DataFrame, epochs: Map[String, Double],
               stratumCol: String = "source", idCol: String = "doc_id",
               salt: String = "graft#"): DataFrame = {
    require(epochs.nonEmpty, "epochMix needs at least one source in the recipe")
    require(epochs.values.forall(e => e > 0 && e <= 64),
      s"epochs must be in (0, 64], got $epochs")
    val reps = epochs.foldLeft(lit(0L)) { case (acc, (s, e)) =>
      val whole = math.floor(e).toLong
      val thr = hexThreshold(e - whole, 4)
      when(col(stratumCol) === s,
        lit(whole) + when(hexKey(col(idCol), salt, 4) < lit(thr), 1L).otherwise(0L))
        .otherwise(acc)
    }
    df.filter(col(stratumCol).isin(epochs.keys.toSeq: _*))
      .select(col(idCol), col(stratumCol), reps.as("reps"))
      .filter(col("reps") > 0)
      .select(col(idCol), col(stratumCol),
        explode(sequence(lit(1L), col("reps"))).as("copy"))
      .orderBy(col(idCol), col("copy"))
  }

  /** The shared keep-lowest-md5 exact cap: rank within each stratum by
    * the salted hash and keep ranks ≤ `cap` (a per-row Column — a
    * literal for [[capPerStratum]], the joined mixture cap for
    * [[mixtureSample]]). Two-level window (see [[capPerStratum]]'s
    * scale note); `cap` must be functionally determined by the stratum
    * so both levels see one value per partition.
    */
  private def cappedByLowestHash(df: DataFrame, cap: Column, stratumCol: String,
                                 idCol: String, salt: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pre = df.select(col(idCol), col(stratumCol), cap.as("cap_"))
      .withColumn("h", md5(concat(lit(salt), col(idCol).cast("string"))))
    val w1 = Window.partitionBy(col(stratumCol), substring(col("h"), 1, 2))
      .orderBy(col("h"), col(idCol))
    val survivors = pre.withColumn("r1", row_number().over(w1))
      .filter(col("r1") <= col("cap_")).drop("r1")
    val w2 = Window.partitionBy(col(stratumCol)).orderBy(col("h"), col(idCol))
    survivors.withColumn("rnk", row_number().over(w2).cast("long"))
      .filter(col("rnk") <= col("cap_"))
      .select(col(idCol), col(stratumCol), col("rnk"))
      .orderBy(col(idCol))
  }
}
