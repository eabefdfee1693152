package graft

/** Session-SQL recipes for the temporal-analytics tier — the
  * documented pure-SQL forms of the operators that otherwise live
  * behind the Scala DataFrame API (attribution, retention, anomaly,
  * paths, cohorts). Each string runs under `spark.sql(...)` against a
  * view `events(user_id BIGINT, event_id BIGINT, event_type STRING,
  * ts TIMESTAMP)` — register one with
  * `Tables.events(spark, dir).createOrReplaceTempView("events")` —
  * and returns EXACTLY the corresponding operator's rows
  * (spec-pinned in SqlRecipesSpec), because each recipe is the same
  * logical plan Catalyst sees from the Column API: the banded
  * attribution join, the bounded count-frame windows, the
  * WindowGroupLimit-capped rank. [[retention]] additionally needs the
  * [[GraftExtensions]] sketch aggregates registered
  * (`spark.sql.extensions=graft.GraftExtensions`), which is how the
  * whole sketch tier is reachable from SQL.
  *
  * Parameters are inlined at their operator defaults (7-day lookback,
  * 1-day decay half-life, lags 1/7, window 7, k 5, maxSteps 5) — the
  * strings are templates to edit, not a parser; the Scala API remains
  * the programmatic form.
  */
object SqlRecipes {

  /** [[graft.operators.Attribution.creditDaily]]: five-model
    * multi-touch credit via the SAME banded lookback equi-join
    * (conversions replicate to {band, band−1}; never a per-user cross
    * product) and the single ascending row_number endpoint rule.
    * 604800000000 = the 7-day lookback in µs; 6 = maxLagDays.
    */
  val attributionCredit: String =
    """WITH ev AS (SELECT user_id, event_type, unix_micros(CAST(ts AS TIMESTAMP)) AS t
      |            FROM events),
      |conv AS (SELECT user_id, t AS conv_t,
      |           explode(array(t div 604800000000, t div 604800000000 - 1)) AS band
      |         FROM ev WHERE event_type = 'purchase'),
      |touch AS (SELECT user_id, t AS touch_t, t div 604800000000 AS band
      |          FROM ev WHERE event_type = 'click'),
      |j AS (SELECT conv.user_id, conv_t, touch_t,
      |        shiftleft(1L, CAST(6 - (conv_t - touch_t) div 86400000000 AS INT)) AS wt
      |      FROM conv JOIN touch
      |        ON conv.user_id = touch.user_id AND conv.band = touch.band
      |      WHERE touch_t <= conv_t AND touch_t > conv_t - 604800000000),
      |w AS (SELECT (touch_t div 86400000000) * 86400 AS d,
      |        count(*) OVER win AS n, wt, sum(wt) OVER win AS sum_wt,
      |        row_number() OVER (PARTITION BY user_id, conv_t ORDER BY touch_t) AS rn
      |      FROM j WINDOW win AS (PARTITION BY user_id, conv_t)),
      |cr AS (SELECT d, 'linear' AS model, 1000000L div n AS credit FROM w
      |       UNION ALL SELECT d, 'decay', (1000000L * wt) div sum_wt FROM w
      |       UNION ALL SELECT d, 'position',
      |         CASE WHEN n = 1 THEN 1000000L
      |              WHEN rn = 1 OR rn = n THEN CASE WHEN n = 2 THEN 500000L ELSE 400000L END
      |              ELSE 200000L div (n - 2) END FROM w
      |       UNION ALL SELECT d, 'first', 1000000L FROM w WHERE rn = 1
      |       UNION ALL SELECT d, 'last', 1000000L FROM w WHERE rn = n)
      |SELECT d, model, sum(credit) AS credit_millionths, count(*) AS n_touches
      |FROM cr GROUP BY d, model ORDER BY d, model""".stripMargin

  /** [[graft.operators.Sketches.retentionDaily]] at lags 1/7: one
    * theta sketch per day via the registered SQL aggregate, then the
    * same bounded lag self-join — day d+lag's sketch left-joins back
    * onto day d and intersects.
    */
  val retention: String =
    """WITH days AS (SELECT unix_timestamp(date_trunc('DAY', ts)) AS d,
      |                graft_theta_sketch_agg(user_id) AS sketch
      |              FROM events GROUP BY 1)
      |SELECT b.d,
      |  graft_theta_summary(b.sketch).estimate AS n_active,
      |  CASE WHEN l1.sketch IS NULL THEN 0L
      |       ELSE graft_theta_summary(graft_theta_intersect(b.sketch, l1.sketch)).estimate
      |  END AS n_ret_1d,
      |  CASE WHEN l7.sketch IS NULL THEN 0L
      |       ELSE graft_theta_summary(graft_theta_intersect(b.sketch, l7.sketch)).estimate
      |  END AS n_ret_7d
      |FROM days b
      |LEFT JOIN days l1 ON l1.d = b.d + 86400
      |LEFT JOIN days l7 ON l7.d = b.d + 7 * 86400
      |ORDER BY b.d""".stripMargin

  /** [[graft.operators.Anomaly.eventVolume]] at window 7: integer
    * trailing sums over the bounded (type, day) count frame, then the
    * identical IEEE mean/variance/z algebra and floor(1000·z); flat
    * baselines (variance 0) emit NULL.
    */
  val eventsAnomaly: String =
    """WITH c AS (SELECT unix_timestamp(date_trunc('DAY', ts)) AS d, event_type,
      |             count(*) AS n_events
      |           FROM events GROUP BY 1, 2),
      |w AS (SELECT d, event_type, n_events,
      |        sum(n_events) OVER win AS s,
      |        sum(n_events * n_events) OVER win AS ss,
      |        count(n_events) OVER win AS np
      |      FROM c WINDOW win AS (PARTITION BY event_type ORDER BY d
      |                            ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
      |SELECT d, event_type, n_events,
      |  CASE WHEN ss / 7.0D - (s / 7.0D) * (s / 7.0D) > 0D
      |       THEN CAST(floor(1000.0D * (n_events - s / 7.0D)
      |                       / sqrt(ss / 7.0D - (s / 7.0D) * (s / 7.0D))) AS BIGINT)
      |  END AS z_milli
      |FROM w WHERE np = 7
      |ORDER BY d, event_type""".stripMargin

  /** [[graft.operators.PathAnalysis.topkDaily]] at k 5 / maxSteps 5:
    * the per-user-day time-sorted type sequence, truncated, counted,
    * ranked — the rank's WHERE rk <= 5 gets the same WindowGroupLimit
    * plan as the Column form.
    */
  val pathTopk: String =
    """WITH p AS (SELECT unix_timestamp(date_trunc('DAY', ts)) AS d, user_id,
      |             array_join(slice(transform(array_sort(collect_list(
      |               struct(unix_micros(CAST(ts AS TIMESTAMP)) AS t, event_type))),
      |               e -> e.event_type), 1, 5), '>') AS path
      |           FROM events GROUP BY 1, 2),
      |c AS (SELECT d, path, count(*) AS n_users FROM p GROUP BY 1, 2),
      |r AS (SELECT d, path, n_users,
      |        row_number() OVER (PARTITION BY d ORDER BY n_users DESC, path) AS rk
      |      FROM c)
      |SELECT d, path, n_users FROM r WHERE rk <= 5
      |ORDER BY d, n_users DESC, path""".stripMargin

  /** [[graft.operators.PathAnalysis.transitionsDaily]]: lead-paired
    * adjacent steps in (t, event_type) per-(day, user) order, reduced
    * to the days × alphabet² frame.
    */
  val pathTransitions: String =
    """WITH e AS (SELECT unix_timestamp(date_trunc('DAY', ts)) AS d, user_id,
      |             unix_micros(CAST(ts AS TIMESTAMP)) AS t, event_type
      |           FROM events),
      |l AS (SELECT d, event_type AS src_step,
      |        lead(event_type) OVER (PARTITION BY d, user_id ORDER BY t, event_type) AS dst_step
      |      FROM e)
      |SELECT d, src_step, dst_step, count(*) AS n_trans
      |FROM l WHERE dst_step IS NOT NULL
      |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  /** [[graft.operators.Cohort.matrixDaily]]: first-seen cohort day by
    * user-window min over the distinct activity frame, counted per
    * (cohort, age).
    */
  val cohortMatrix: String =
    """WITH a AS (SELECT DISTINCT unix_timestamp(date_trunc('DAY', ts)) AS d, user_id
      |           FROM events),
      |f AS (SELECT d, min(d) OVER (PARTITION BY user_id) AS cohort_d FROM a)
      |SELECT cohort_d, (d - cohort_d) div 86400 AS age_days, count(*) AS n_active
      |FROM f GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** The gap-session assignment CTE chain (q12's sessionize in SQL,
    * 1800 s gap) the session-grain recipes share: `z` carries every
    * event with its per-user `session_id`.
    */
  private val sessionCte: String =
    """WITH e AS (SELECT user_id, event_id, event_type,
      |             unix_timestamp(date_trunc('SECOND', ts)) AS ts_s FROM events),
      |x AS (SELECT user_id, event_id, event_type, ts_s,
      |        lag(ts_s) OVER (PARTITION BY user_id ORDER BY ts_s, event_id) AS prev_s FROM e),
      |y AS (SELECT user_id, event_id, event_type, ts_s,
      |        CASE WHEN prev_s IS NULL OR ts_s - prev_s > 1800 THEN 1L ELSE 0L END AS is_new FROM x),
      |z AS (SELECT user_id, event_id, event_type, ts_s,
      |        sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_s, event_id) AS session_id
      |      FROM y)""".stripMargin

  /** [[graft.operators.PathAnalysis.topkSession]] at k 5 / maxSteps
    * 5 / gap 1800 s: each session's path in (ts_s, event_id) order,
    * counted per (start day, path), ranked.
    */
  val pathSession: String = sessionCte + ",\n" +
    """s AS (SELECT user_id, session_id, (min(ts_s) div 86400) * 86400 AS d,
      |        array_join(slice(transform(array_sort(collect_list(
      |          struct(ts_s, event_id, event_type))), e -> e.event_type), 1, 5), '>') AS path
      |      FROM z GROUP BY 1, 2),
      |c AS (SELECT d, path, count(*) AS n_sessions FROM s GROUP BY 1, 2),
      |r AS (SELECT d, path, n_sessions,
      |        row_number() OVER (PARTITION BY d ORDER BY n_sessions DESC, path) AS rk
      |      FROM c)
      |SELECT d, path, n_sessions FROM r WHERE rk <= 5
      |ORDER BY d, n_sessions DESC, path""".stripMargin

  /** [[graft.operators.PathAnalysis.transitionsSession]]: lead in
    * (ts_s, event_id) session order, edges on the session-start day.
    */
  val pathTransitionsSession: String = sessionCte + ",\n" +
    """t AS (SELECT min(ts_s) OVER (PARTITION BY user_id, session_id) AS start_s,
      |        event_type AS src_step,
      |        lead(event_type) OVER (PARTITION BY user_id, session_id
      |                               ORDER BY ts_s, event_id) AS dst_step
      |      FROM z)
      |SELECT (start_s div 86400) * 86400 AS d, src_step, dst_step,
      |       count(*) AS n_trans
      |FROM t WHERE dst_step IS NOT NULL
      |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  /** [[graft.operators.Funnel.sessionDaily]] via the registered
    * `graft_window_funnel` aggregate (needs [[GraftExtensions]]): an
    * effectively-unbounded window degenerates the windowed fold to
    * sessionDaily's unwindowed greedy match, so per-session depths —
    * and the per-day session counts at each depth — are identical.
    */
  val funnelSession: String = sessionCte + ",\n" +
    """st AS (SELECT user_id, session_id, (min(ts_s) div 86400) * 86400 AS d
      |       FROM z GROUP BY 1, 2),
      |dep AS (SELECT user_id, session_id,
      |          graft_window_funnel(ts_s,
      |            CASE event_type WHEN 'view' THEN 0 WHEN 'click' THEN 1
      |                 WHEN 'purchase' THEN 2 ELSE -1 END,
      |            1000000000000000L, 3) AS depth
      |        FROM z WHERE event_type IN ('view', 'click', 'purchase')
      |        GROUP BY 1, 2),
      |agg AS (SELECT st.d,
      |          sum(CASE WHEN depth >= 1 THEN 1L ELSE 0L END) AS n_step1,
      |          sum(CASE WHEN depth >= 2 THEN 1L ELSE 0L END) AS n_step2,
      |          sum(CASE WHEN depth >= 3 THEN 1L ELSE 0L END) AS n_step3
      |        FROM st JOIN dep USING (user_id, session_id)
      |        GROUP BY st.d)
      |SELECT d, n_step1, n_step2, n_step3 FROM agg
      |WHERE n_step1 > 0 ORDER BY d""".stripMargin

  /** [[graft.operators.TextAnalysis.spanDedup]] at the engine
    * defaults (8-gram, ≥2 docs, 16-token min span) — runs against a
    * `documents(doc_id BIGINT, text STRING)` view instead of
    * `events`: the gram fan-out, the ≥2-distinct-docs shared set, the
    * gap-trick region coalescing, and the per-doc accounting are all
    * plain session SQL (the same plan Catalyst sees from the Column
    * API — explode is the map-side fan-out, the window and the
    * (doc, region) aggregate ride one doc_id exchange).
    */
  val spanDedup: String =
    """WITH t AS (SELECT doc_id, split(text, ' ') AS toks FROM documents),
      |g0 AS (SELECT doc_id, toks, explode(sequence(0, size(toks) - 8)) AS pos
      |       FROM t WHERE size(toks) >= 8),
      |g AS (SELECT doc_id, CAST(pos AS BIGINT) AS pos,
      |        md5(concat_ws(' ', slice(toks, pos + 1, 8))) AS gram_md5
      |      FROM g0),
      |sh AS (SELECT gram_md5 FROM g GROUP BY gram_md5
      |       HAVING count(DISTINCT doc_id) >= 2),
      |p AS (SELECT doc_id, pos FROM g JOIN sh USING (gram_md5)),
      |r AS (SELECT doc_id, pos,
      |        CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= 8
      |             THEN 0L ELSE 1L END AS brk
      |      FROM p),
      |i AS (SELECT doc_id, pos,
      |        sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS region
      |      FROM r),
      |s AS (SELECT doc_id, max(pos) - min(pos) + 8 AS span_tokens
      |      FROM i GROUP BY doc_id, region),
      |q AS (SELECT doc_id, count(*) AS n_spans, sum(span_tokens) AS dup_tokens
      |      FROM s WHERE span_tokens >= 16 GROUP BY doc_id)
      |SELECT t.doc_id, CAST(size(t.toks) AS BIGINT) AS n_tokens,
      | coalesce(q.n_spans, 0L) AS n_spans,
      | coalesce(q.dup_tokens, 0L) AS dup_tokens,
      | CAST(size(t.toks) AS BIGINT) - coalesce(q.dup_tokens, 0L) AS kept_tokens
      |FROM t LEFT JOIN q USING (doc_id) ORDER BY doc_id""".stripMargin

  /** [[graft.operators.SpanIndex.flagAgainstIndex]] at the engine
    * defaults (16-token min span, raw-keyed 8-gram index): the
    * incoming batch — a `documents(doc_id BIGINT, text STRING)`
    * view — fans out to positioned grams and joins the STORED
    * `<name>_grams` set (bucketed on gram_md5, so the join reads the
    * stored side shuffle-free), then the same gap-trick region CTE
    * and per-doc accounting as [[spanDedup]]. No ≥2-docs HAVING
    * here: "known" means in ANY indexed document — the crawl-dedup
    * dashboard's cross-corpus read, zero index rescans beyond the
    * one bucketed probe.
    */
  def spanFlagFromIndex(name: String): String =
    s"""WITH t AS (SELECT doc_id, split(text, ' ') AS toks FROM documents),
       |g0 AS (SELECT doc_id, toks, explode(sequence(0, size(toks) - 8)) AS pos
       |       FROM t WHERE size(toks) >= 8),
       |g AS (SELECT doc_id, CAST(pos AS BIGINT) AS pos,
       |        md5(concat_ws(' ', slice(toks, pos + 1, 8))) AS gram_md5
       |      FROM g0),
       |p AS (SELECT doc_id, pos FROM g JOIN ${name}_grams USING (gram_md5)),
       |r AS (SELECT doc_id, pos,
       |        CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= 8
       |             THEN 0L ELSE 1L END AS brk
       |      FROM p),
       |i AS (SELECT doc_id, pos,
       |        sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS region
       |      FROM r),
       |s AS (SELECT doc_id, max(pos) - min(pos) + 8 AS span_tokens
       |      FROM i GROUP BY doc_id, region),
       |q AS (SELECT doc_id, count(*) AS n_spans, sum(span_tokens) AS dup_tokens
       |      FROM s WHERE span_tokens >= 16 GROUP BY doc_id)
       |SELECT t.doc_id, CAST(size(t.toks) AS BIGINT) AS n_tokens,
       | coalesce(q.n_spans, 0L) AS n_spans,
       | coalesce(q.dup_tokens, 0L) AS dup_tokens,
       | CAST(size(t.toks) AS BIGINT) - coalesce(q.dup_tokens, 0L) AS kept_tokens
       |FROM t LEFT JOIN q USING (doc_id) ORDER BY doc_id""".stripMargin

  // ---- stored-reader recipes ---------------------------------------------
  // The stored tier's tables are plain catalog tables (`<name>_counts`
  // for the exact additive CountTable lifecycle, `<name>_sketches` for
  // the theta tier), so every `*FromTable` DataFrame reader has a
  // direct SELECT form too — rendered per ledger name below and
  // spec-pinned row-for-row against the readers in SqlRecipesSpec.
  // `last_batch` is lifecycle bookkeeping, never selected.

  /** [[graft.operators.Funnel.dailyFromTable]]: the stored day-grain
    * funnel IS the counts table; the step-1 entrant filter applies at
    * read time (a later batch can still bring a day its first
    * entrant, so stored rows are unfiltered).
    */
  def funnelFromTable(name: String): String =
    s"""SELECT d, n_step1, n_step2, n_step3 FROM ${name}_counts
       |WHERE n_step1 > 0 ORDER BY d""".stripMargin

  /** [[graft.operators.PathAnalysis.topkFromTable]] at k 5: the rank
    * runs over the bounded stored (day, path) histogram.
    */
  def pathTopkFromTable(name: String): String =
    s"""WITH r AS (SELECT d, path, n_users,
       |        row_number() OVER (PARTITION BY d ORDER BY n_users DESC, path) AS rk
       |      FROM ${name}_counts)
       |SELECT d, path, n_users FROM r WHERE rk <= 5
       |ORDER BY d, n_users DESC, path""".stripMargin

  /** [[graft.operators.PathAnalysis.transitionsFromTable]]: the
    * sankey's edge weights, a plain ordered SELECT.
    */
  def transitionsFromTable(name: String): String =
    s"""SELECT d, src_step, dst_step, n_trans FROM ${name}_counts
       |ORDER BY d, src_step, dst_step""".stripMargin

  /** [[graft.operators.Attribution.creditFromTable]]: the five-model
    * credit ledger, a plain ordered SELECT.
    */
  def creditFromTable(name: String): String =
    s"""SELECT d, model, credit_millionths, n_touches FROM ${name}_counts
       |ORDER BY d, model""".stripMargin

  /** [[graft.operators.Anomaly.volumeFromTable]] at window 7: the
    * [[eventsAnomaly]] z algebra with the stored volume table
    * replacing the raw-event count CTE — any day range, zero
    * raw-history rescans.
    */
  def anomalyFromTable(name: String): String =
    s"""WITH w AS (SELECT d, event_type, n_events,
       |        sum(n_events) OVER win AS s,
       |        sum(n_events * n_events) OVER win AS ss,
       |        count(n_events) OVER win AS np
       |      FROM ${name}_counts WINDOW win AS (PARTITION BY event_type ORDER BY d
       |                            ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
       |SELECT d, event_type, n_events,
       |  CASE WHEN ss / 7.0D - (s / 7.0D) * (s / 7.0D) > 0D
       |       THEN CAST(floor(1000.0D * (n_events - s / 7.0D)
       |                       / sqrt(ss / 7.0D - (s / 7.0D) * (s / 7.0D))) AS BIGINT)
       |  END AS z_milli
       |FROM w WHERE np = 7
       |ORDER BY d, event_type""".stripMargin

  /** [[graft.operators.Cohort.matrixFromThetaTable]]: the stored
    * triangle through the registered `graft_theta_summary` scalar
    * (needs [[GraftExtensions]]).
    */
  def cohortMatrixFromTable(name: String): String =
    s"""SELECT cohort_d, age_days,
       |  graft_theta_summary(sketch).estimate AS n_active
       |FROM ${name}_sketches ORDER BY cohort_d, age_days""".stripMargin

  /** [[graft.operators.Sketches.retentionFromThetaTable]] at lags
    * 1/7: per-day sketches unioned down to the day grain via the
    * registered `graft_theta_union_agg` aggregate, then the same
    * bounded lag self-join as [[retention]].
    */
  def retentionFromTable(name: String): String =
    s"""WITH days AS (SELECT d, graft_theta_union_agg(sketch) AS sketch
       |              FROM ${name}_sketches GROUP BY d)
       |SELECT b.d,
       |  graft_theta_summary(b.sketch).estimate AS n_active,
       |  CASE WHEN l1.sketch IS NULL THEN 0L
       |       ELSE graft_theta_summary(graft_theta_intersect(b.sketch, l1.sketch)).estimate
       |  END AS n_ret_1d,
       |  CASE WHEN l7.sketch IS NULL THEN 0L
       |       ELSE graft_theta_summary(graft_theta_intersect(b.sketch, l7.sketch)).estimate
       |  END AS n_ret_7d
       |FROM days b
       |LEFT JOIN days l1 ON l1.d = b.d + 86400
       |LEFT JOIN days l7 ON l7.d = b.d + 7 * 86400
       |ORDER BY b.d""".stripMargin

  /** [[graft.operators.VocabTable.vocabularyFromTable]]: the stored
    * vocabulary IS the counts table, ordered; `last_batch` stays
    * lifecycle bookkeeping.
    */
  def vocabularyFromTable(name: String): String =
    s"""SELECT token, doc_freq, total_count FROM ${name}_counts
       |ORDER BY token""".stripMargin

  /** The tokenizer expression a vocab recipe must embed — the SQL
    * form of [[graft.operators.TextAnalysis.vocabTokens]]'s switch:
    * naive single-space `split`, or the whitespace-ROBUST class with
    * empties filtered ([[graft.functions.TextFunctions.tokensWs]] —
    * the escaped class reaches Spark's parser as exactly
    * TextFunctions.WsClass, spec-pinned by row-for-row parity with
    * the readers on a ws-mode table).
    */
  private def vocabTokensSql(ws: Boolean): String =
    if (ws) "filter(split(text, '[ \\\\t\\\\n\\\\r\\\\f]+'), x -> x != '')"
    else "split(text, ' ')"

  /** [[graft.operators.VocabTable.tfidfFromTable]] at the engine
    * default (top-3 terms): the batch — a `documents(doc_id BIGINT,
    * text STRING)` view — computes its own term frequencies, the
    * document-frequency side is ONE left join against the stored
    * token-bucketed counts table (unseen tokens score at the df = 1
    * ceiling), same integer `div` scoring and (score desc, token)
    * tie-break as the reader.
    *
    * PREFER the session overload: it reads the table's RECORDED
    * tokenizer mode (`<name>_vocabmeta`) at render time, so the SQL
    * tokenizes exactly like the reader it mirrors — the r19 "no flag
    * to get wrong" contract, extended to the SQL surface (r20; the
    * name-only form is the legacy-naive render and silently diverges
    * on a ws-mode table).
    */
  def tfidfFromTable(spark: org.apache.spark.sql.SparkSession, name: String): String =
    tfidfFromTable(name, graft.operators.VocabTable.tokenizerMode(spark, name))

  def tfidfFromTable(name: String): String = tfidfFromTable(name, ws = false)

  def tfidfFromTable(name: String, ws: Boolean): String =
    s"""WITH tf AS (SELECT doc_id, token, count(*) AS tf
       |            FROM (SELECT doc_id, explode(${vocabTokensSql(ws)}) AS token
       |                  FROM documents)
       |            GROUP BY doc_id, token),
       |s AS (SELECT tf.doc_id, tf.token,
       |        tf.tf * 1000000 div coalesce(c.doc_freq, 1L) AS score
       |      FROM tf LEFT JOIN ${name}_counts c USING (token)),
       |r AS (SELECT doc_id, token, score,
       |        CAST(row_number() OVER (PARTITION BY doc_id
       |               ORDER BY score DESC, token) AS BIGINT) AS rnk
       |      FROM s)
       |SELECT doc_id, rnk, token, score FROM r WHERE rnk <= 3
       |ORDER BY doc_id, rnk""".stripMargin

  /** [[graft.operators.VocabTable.encodeFromTable]] at the engine
    * default (vocabSize = 1000): ids 1..1000 ranked
    * (total_count desc, token) from the stored counts — the LIMIT
    * keeps the global sort a take-ordered and the id window bounded,
    * mirroring the reader's collect-then-broadcast — then the batch
    * explode-encodes against the id map, OOV → −1. Mode rules as
    * [[tfidfFromTable]]: prefer the session overload (render-time
    * stored-mode read); the name-only form is the legacy-naive
    * render.
    */
  def encodeFromTable(spark: org.apache.spark.sql.SparkSession, name: String): String =
    encodeFromTable(name, graft.operators.VocabTable.tokenizerMode(spark, name))

  def encodeFromTable(name: String): String = encodeFromTable(name, ws = false)

  def encodeFromTable(name: String, ws: Boolean): String =
    s"""WITH top AS (SELECT token, total_count FROM ${name}_counts
       |             ORDER BY total_count DESC, token LIMIT 1000),
       |ids AS (SELECT token,
       |          CAST(row_number() OVER (ORDER BY total_count DESC, token)
       |            AS BIGINT) AS token_id
       |        FROM top),
       |p AS (SELECT doc_id, posexplode(${vocabTokensSql(ws)}) AS (pos0, token)
       |      FROM documents)
       |SELECT p.doc_id, CAST(p.pos0 + 1 AS BIGINT) AS pos,
       |  coalesce(i.token_id, -1L) AS token_id
       |FROM p LEFT JOIN ids i USING (token)
       |ORDER BY doc_id, pos""".stripMargin

  /** Every stored-reader recipe keyed by the reader it mirrors.
    * NOTE: the vocab entries here are the name-only LEGACY-NAIVE
    * renders; against a ws-mode store use the session overloads
    * ([[tfidfFromTable(spark:org\.apache\.spark\.sql\.SparkSession,name:String)*]])
    * which read the recorded tokenizer mode at render time.
    */
  val storedReaders: Map[String, String => String] = Map(
    "span_flagAgainstIndex" -> spanFlagFromIndex,
    "vocab_vocabularyFromTable" -> vocabularyFromTable,
    "vocab_tfidfFromTable" -> ((n: String) => tfidfFromTable(n)),
    "vocab_encodeFromTable" -> ((n: String) => encodeFromTable(n)),
    "funnel_dailyFromTable" -> funnelFromTable,
    "path_topkFromTable" -> pathTopkFromTable,
    "path_transitionsFromTable" -> transitionsFromTable,
    "attribution_creditFromTable" -> creditFromTable,
    "anomaly_volumeFromTable" -> anomalyFromTable,
    "cohort_matrixFromThetaTable" -> cohortMatrixFromTable,
    "sketches_retentionFromThetaTable" -> retentionFromTable)

  /** Every recipe keyed by the gate key it mirrors. */
  val all: Map[String, String] = Map(
    "attribution_credit" -> attributionCredit,
    "sketch_retention" -> retention,
    "events_anomaly" -> eventsAnomaly,
    "path_topk" -> pathTopk,
    "path_transitions" -> pathTransitions,
    "cohort_matrix" -> cohortMatrix,
    "path_session" -> pathSession,
    "path_transitions_session" -> pathTransitionsSession,
    "funnel_session" -> funnelSession)
}
