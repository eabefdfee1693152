package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: opaque `binary` payloads + typed
  * metadata, with a per-partition batch "decode" stage.
  *
  * Two decode paths:
  *  - [[decodeImages]] is a REAL codec: pure-JVM `javax.imageio` PNG
  *    decode inside the partition-batched iterator — genuine image
  *    bytes in, pixel-derived features (dimensions, mean luminance,
  *    pixel checksum) out. [[imagePayloads]] synthesizes valid PNGs
  *    deterministically so the path is exercisable without external
  *    media (and the driver gate runs it end-to-end).
  *  - [[decodeFeatures]] is the generic byte-level baseline for
  *    payloads whose codec is NOT on the JVM (audio/video in this
  *    container): a deterministic byte-hash summary standing where a
  *    codec/model call would go, shape-identical to the real path.
  *
  * Either way the surrounding design is the 100-TB one:
  *  - payloads travel as parquet `binary` columns (columnar, chunked,
  *    never materialized as strings);
  *  - metadata is a typed struct column so planners can prune/filter
  *    on it WITHOUT touching payload bytes (parquet column pruning);
  *  - decode runs via `mapPartitions` so codec init amortizes once
  *    per partition — the same batch shape a Pandas-UDF /
  *    mapInPandas decode uses on a real cluster.
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

  /** Batch "decode" for payloads with no JVM codec: per partition,
    * read payload bytes and emit a byte-level feature summary
    * (`fakeDecode` stands where the codec/model call goes —
    * [[decodeImages]] is the REAL-codec twin of this stage, and the
    * partition-batched iterator shape, schema handling, and
    * downstream columns are identical between the two). Typed
    * `Dataset.mapPartitions` (not `.rdd`): the result stays a Dataset
    * with encoder-backed schema, so downstream Catalyst planning
    * resumes immediately after the codec stage.
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

  /** Deterministic tiny-PNG synthesis: dimensions and every pixel are
    * a pure function of `id`, encoded through the real ImageIO PNG
    * writer — the payload column carries genuine, decodable PNG bytes
    * (magic `89 50 4E 47 …`), not a placeholder.
    */
  private[graft] def synthesizePng(id: Long): Array[Byte] = {
    val w = (16 + math.floorMod(id, 13L)).toInt
    val h = (16 + math.floorMod(id, 7L)).toInt
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        // cheap deterministic pixel mix — full 24-bit coverage
        val m = id * 1000003L + y.toLong * 65599L + x.toLong * 31L
        img.setRGB(x, y, ((m ^ (m >>> 17)) & 0xffffff).toInt)
        x += 1
      }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  /** Image-corpus layout from a doc id column: one synthesized PNG
    * payload per doc + typed metadata carrying the TRUE dimensions
    * (which [[decodeImages]] re-derives from the pixels — the spec
    * pins that the two agree). PNG synthesis runs in the same typed
    * mapPartitions shape as decode: per-partition codec use, iterator
    * in/out, no partition materialized.
    */
  def imagePayloads(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => (id, synthesizePng(id))))
      .toDF("doc_id", "payload")
      .select(
        col("doc_id"),
        col("payload"),
        struct(
          lit("image/png").as("mime"),
          length(col("payload")).cast("long").as("n_bytes"),
          (lit(16L) + pmod(col("doc_id"), lit(13L))).as("width"),
          (lit(16L) + pmod(col("doc_id"), lit(7L))).as("height")).as("meta"))
  }

  /** One decoded image's pixel-level features. */
  case class DecodedImage(doc_id: Long, width: Long, height: Long, n_pixels: Long,
                          mean_luma_fs: Long, px_checksum: Long)

  /** REAL image decode: `javax.imageio` PNG/JPEG decode per payload
    * inside the partition-batched iterator — the stage
    * [[decodeFeatures]] stands in for when no JVM codec exists.
    * Emits pixel-truth features: decoded width/height (vs the
    * metadata CLAIM — equality is spec-pinned), pixel count, mean
    * Rec.601 luminance as fixed-point (floor(1e4 · L̄/255), integer
    * arithmetic throughout), and a rolling pixel checksum.
    *
    * Scale shape: identical to every other decode here — narrow
    * typed mapPartitions, codec init amortized per partition, rows
    * out are slim numerics so downstream filters/aggregations never
    * touch payload bytes again.
    */
  def decodeImages(mm: DataFrame): DataFrame = {
    val spark = mm.sparkSession
    import spark.implicits._
    mm.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          require(img != null, s"doc $id: payload is not a decodable image")
          val w = img.getWidth
          val h = img.getHeight
          var sumLumaMilli = 0L // Σ (299R + 587G + 114B), 0..255000 per px
          var crc = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              val r = (rgb >> 16) & 0xff
              val g = (rgb >> 8) & 0xff
              val b = rgb & 0xff
              sumLumaMilli += 299L * r + 587L * g + 114L * b
              crc = (crc * 31 + (rgb & 0xffffff)) % 1000000007L
              x += 1
            }
            y += 1
          }
          val n = w.toLong * h
          DecodedImage(id, w.toLong, h.toLong, n,
            math.floorDiv(10000L * sumLumaMilli, 255000L * n), crc)
        }
      }
      .toDF()
      .orderBy(col("doc_id"))
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
