package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming deduplication — the streaming twin of Dedup.exact, in
  * two state-management flavors:
  *
  *  1. [[exactDedup]]: Spark's built-in `dropDuplicates` on a content
  *     hash with a watermark. State = one row per distinct hash inside
  *     the watermark horizon; the state store evicts expired keys, so
  *     an unbounded stream runs at bounded memory. This is the
  *     declarative path — prefer it when "first occurrence wins" is
  *     the whole requirement.
  *
  *  2. [[firstSeen]]: explicit `flatMapGroupsWithState` keyed on the
  *     content hash, emitting each doc tagged `is_first` (the
  *     built-in can only DROP dups; pipelines often need to KEEP them
  *     with provenance — e.g. to count dup mass per shard). State per
  *     key = (first doc_id, seen count), with an event-time timeout
  *     so state is evicted at the watermark exactly like the
  *     built-in. This is the template for any custom streaming state
  *     the engine needs.
  *
  * At scale both shuffle once on the hash key — same invariant as the
  * batch operator (32-byte key, slim payload).
  */
object StreamingDedup {

  /** (doc_id, h, is_first, first_doc_id, n_seen_so_far) */
  case class SeenOut(doc_id: Long, h: String, is_first: Boolean,
                     first_doc_id: Long, n_seen_so_far: Long)
  case class SeenState(firstDocId: Long, nSeen: Long)
  // not private: Catalyst's generated encoder projections need access
  case class HashedDoc(doc_id: Long, h: String, ts: java.sql.Timestamp)

  /** Declarative streaming exact-dedup: first doc per content KEY
    * inside the watermark horizon survives.
    *
    * `keying` (r20) is the batch [[graft.operators.Dedup.exact]]'s
    * multilingual tier, applied to the state-store key: "raw" hashes
    * the text byte-identically (the r6–r19 behavior and the default),
    * "canonical" hashes [[graft.functions.TextFunctions.canonicalKey]]
    * (case/punct variants of a doc collapse; the empty-canonical raw
    * fallback rides along), "routed" hashes [[graft.functions
    * .TextFunctions.routedKey]] with the optional `minLossFs` floor
    * (non-Latin-script docs key raw so canonical keying can't strip
    * what distinguishes them). The key expression is a pure column
    * projection riding the micro-batch scan — state size and shuffle
    * shape are unchanged (one 32-char hash per distinct key in the
    * horizon).
    *
    * "auto" is deliberately REFUSED here: the batch auto rule
    * aggregates the corpus script mix and picks once, but a stream's
    * composition is unbounded and unknown at plan time — an in-stream
    * auto would freeze whatever mix construction saw (the
    * [[StreamingPipeline.flagKnownStream]] plan-freeze hazard) and
    * silently mis-key everything after the mix drifts. Resolve BEFORE
    * the stream starts: run [[graft.operators.Pipeline.chooseKeying]]
    * on seed/accumulated data and pass the resolved mode.
    */
  def exactDedup(docs: DataFrame, tsCol: String, watermarkDelay: String,
                 keying: String = "raw", minLossFs: Long = 0L): DataFrame =
    docs
      .withColumn("h", md5(keyColumn(keying, minLossFs)))
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicates("h")

  /** The dedup-key projection for a keying mode — shared by
    * [[exactDedup]] and [[StreamingPipeline.curateStream]]'s
    * signature docs; same mode names as [[graft.operators.Pipeline
    * .curateFull]], minus "auto" (see [[exactDedup]] for why).
    */
  private[streaming] def keyColumn(keying: String,
                                   minLossFs: Long): org.apache.spark.sql.Column = {
    require(minLossFs == 0L || keying == "routed",
      s"minLossFs applies only to routed keying (got minLossFs = $minLossFs " +
        s"with keying = '$keying')")
    keying match {
      case "raw"       => col("text")
      case "canonical" => graft.functions.TextFunctions.canonicalKey(col("text"))
      case "routed"    => graft.functions.TextFunctions.routedKey(col("text"), minLossFs)
      case "auto" => throw new IllegalArgumentException(
        "keying = 'auto' cannot resolve inside a stream: the auto rule aggregates " +
          "the corpus script mix once, but a stream's composition is unbounded and " +
          "unknown at plan time — an in-stream read would freeze whatever mix the " +
          "plan saw and silently mis-key later arrivals. Resolve the mode BEFORE " +
          "starting: Pipeline.chooseKeying(seedDocs) and pass the result")
      case other => throw new IllegalArgumentException(
        s"keying must be one of raw/canonical/routed, got '$other'")
    }
  }

  /** Stateful first-seen tagging via flatMapGroupsWithState: every doc
    * is emitted (append mode), tagged with whether its content hash
    * was seen before in the stream and by which doc. State times out
    * at the watermark (event-time timeout) so the store stays bounded.
    */
  def firstSeen(docs: DataFrame, tsCol: String, watermarkDelay: String): Dataset[SeenOut] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val hashed = docs
      .select(col("doc_id").cast("long").as("doc_id"), md5(col("text")).as("h"),
        col(tsCol).cast("timestamp").as("ts"))
      .withWatermark("ts", watermarkDelay)
      .as[HashedDoc]

    def update(h: String, rows: Iterator[HashedDoc],
               state: GroupState[SeenState]): Iterator[SeenOut] = {
      if (state.hasTimedOut) { state.remove(); Iterator.empty }
      else {
        // deterministic within-batch order: lowest doc_id is "first"
        val batch = rows.toSeq.sortBy(_.doc_id)
        var st = state.getOption.getOrElse(SeenState(-1L, 0L))
        val out = batch.map { d =>
          val isFirst = st.nSeen == 0L
          st = SeenState(if (isFirst) d.doc_id else st.firstDocId, st.nSeen + 1L)
          SeenOut(d.doc_id, h, isFirst, st.firstDocId, st.nSeen)
        }
        state.update(st)
        // evict when the watermark passes this key's LAST event time —
        // the watermark lags real time by watermarkDelay, so state
        // lives delay-past-last-occurrence, same as dropDuplicates.
        // (A timeout at watermark+1 would evict on ANY watermark
        // advance, forgetting keys after one batch.)
        val maxTs = batch.map(_.ts.getTime).max
        state.setTimeoutTimestamp(math.max(maxTs, state.getCurrentWatermarkMs() + 1L))
        out.iterator
      }
    }

    hashed.groupByKey(_.h)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(update)
  }
}
