package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: opaque `binary` payloads + typed
  * metadata, with a per-partition batch "decode" stage.
  *
  * The decode step is a STUB (this container has no image/audio
  * codecs): it derives a deterministic fake feature vector from the
  * payload bytes. Everything around it is the real 100-TB design:
  *  - payloads travel as parquet `binary` columns (columnar, chunked,
  *    never materialized as strings);
  *  - metadata is a typed struct column so planners can prune/filter
  *    on it WITHOUT touching payload bytes (parquet column pruning);
  *  - decode runs via `mapPartitions` so a real codec would amortize
  *    model/codec init once per partition — the same batch shape a
  *    Pandas-UDF / mapInPandas decode uses on a real cluster.
  */
object Multimodal {

  /** Wrap documents into a multimodal layout: binary payload + typed
    * metadata struct (mime, n_bytes, fake width/height).
    */
  def asMultimodal(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      struct(
        lit("application/octet-stream").as("mime"),
        length(col("text").cast("binary")).cast("long").as("n_bytes"),
        (pmod(xxhash64(col("text")), lit(1280L)) + 64L).as("width"),
        (pmod(xxhash64(col("text"), lit(1L)), lit(720L)) + 64L).as("height")).as("meta"))

  /** One decoded payload's feature summary. */
  case class Decoded(doc_id: Long, n_bytes: Long, mime: String,
                     feat_dim: Long, feat_checksum: Long)

  /** Batch "decode": per partition, read payload bytes and emit a
    * feature summary. A real implementation would replace
    * `fakeDecode` with a codec/model call; the partition-batched
    * iterator shape, schema handling, and downstream columns stay
    * identical. Typed `Dataset.mapPartitions` (not `.rdd`): the
    * result stays a Dataset with encoder-backed schema, so downstream
    * Catalyst planning resumes immediately after the codec stage.
    */
  def decodeFeatures(mm: DataFrame): DataFrame = {
    val spark = mm.sparkSession
    import spark.implicits._
    mm.select(col("doc_id"), col("payload"), col("meta.mime"), col("meta.n_bytes"))
      .as[(Long, Array[Byte], String, Long)]
      .mapPartitions { it =>
        it.map { case (id, bytes, mime, nBytes) =>
          val (dim, checksum) = fakeDecode(bytes)
          Decoded(id, nBytes, mime, dim, checksum)
        }
      }
      .toDF()
      .orderBy(col("doc_id"))
  }

  /** Deterministic decode stub: feature dim from payload size, checksum
    * = rolling byte hash mod 1e9+7. Replace with real codec on a
    * cluster with codecs installed.
    */
  private def fakeDecode(bytes: Array[Byte]): (Long, Long) = {
    val p = 1000000007L
    var acc = 0L
    var i = 0
    while (i < bytes.length) { acc = (acc * 31 + (bytes(i) & 0xff)) % p; i += 1 }
    (64L, acc)
  }

  /** One emitted frame of a sampled "video" payload. */
  case class Frame(doc_id: Long, frame_idx: Long, ts_ms: Long, frame_checksum: Long)

  /** Frame sampling: the fan-out decode shape — ONE payload row in,
    * `nFrames` frame rows out, via typed `Dataset.mapPartitions`
    * (codec/model init amortizes once per partition; the iterator
    * never materializes a partition in memory). The stub "samples"
    * deterministic byte ranges; a real codec would decode keyframes.
    * Same plan shape as an image-resize or audio-chunk stage: the
    * row-multiplying step happens BEFORE any shuffle, so downstream
    * per-frame operators (embed, dedup, filter) see ordinary rows.
    */
  def frameSample(mm: DataFrame, nFrames: Int = 4): DataFrame = {
    val spark = mm.sparkSession
    import spark.implicits._
    mm.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          (0 until nFrames).iterator.map { f =>
            val from = (f.toLong * bytes.length / nFrames).toInt
            val until = ((f + 1).toLong * bytes.length / nFrames).toInt
            var acc = 0L
            var i = from
            while (i < until) { acc = (acc * 31 + (bytes(i) & 0xff)) % 1000000007L; i += 1 }
            Frame(id, f.toLong, f * 40L, acc) // 25 fps → 40 ms/frame
          }
        }
      }
      .toDF()
      .orderBy(col("doc_id"), col("frame_idx"))
  }
}
