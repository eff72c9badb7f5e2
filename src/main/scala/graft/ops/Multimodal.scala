package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing (SURVEY.md §2.11 extensions).
  *
  * Media assets ride through the pipeline as opaque `binary` payloads
  * next to typed metadata; decode / feature-extraction runs as a typed
  * `mapPartitions` so one task amortizes codec init across its whole
  * partition — the same batch shape as an `mapInPandas`/Arrow UDF, but
  * staying JVM-native.
  *
  * The codec is REAL: assets are genuine PNG files (encoded with
  * `javax.imageio`, the JDK's built-in codec), and the decode stage
  * parses those bytes back through `ImageIO.read` — a full
  * encode→compress→parse→decompress round trip per asset. Fixture
  * assets are generated deterministically from `doc_id` (dimensions
  * 16–47 × 16–39, gray(x,y) = (x + 7y + doc_id) mod 251), so the
  * oracle can state the expected decoded dimensions and pixel-sum in
  * closed-form integer SQL while Spark derives them from the actual
  * decoded raster — any codec-path corruption breaks the hash match.
  */
object Multimodal {

  /** An asset row entering decode: opaque bytes + routing metadata.
    * `n_frames` is sidecar/container metadata (a video's frame count
    * travels in the container header, not the pixel payload). */
  final case class MediaAsset(doc_id: Long, lang: String, n_frames: Long,
                              payload: Array[Byte])

  /** Decoded media metadata: dimensions + pixel checksum come from the
    * DECODED raster, not the generator. */
  final case class DecodedMedia(doc_id: Long, lang: String,
                                width: Long, height: Long, px_sum: Long,
                                n_frames: Long)

  /** Deterministic PNG fixture: dimensions and a gray gradient derive
    * from doc_id alone, then real `ImageIO` PNG encoding. Grayscale
    * 8-bit PNG is lossless, so the decoded raster must reproduce the
    * generator's samples exactly. */
  private[ops] def renderPng(docId: Long): Array[Byte] = {
    val w = (16L + docId % 32L).toInt
    val h = (16L + (docId * 7L) % 24L).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        raster.setSample(x, y, 0, ((x + 7L * y + docId) % 251L).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream(1024)
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Real decode: parse the PNG payload, read dimensions + exact pixel
    * sum off the decoded raster (raster samples, NOT getRGB — getRGB
    * routes through color-space conversion). */
  private def decodePng(a: MediaAsset): DecodedMedia = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(a.payload))
    val raster = img.getRaster
    val (w, h) = (img.getWidth, img.getHeight)
    var sum = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { sum += raster.getSample(x, y, 0); x += 1 }
      y += 1
    }
    DecodedMedia(a.doc_id, a.lang, w.toLong, h.toLong, sum, a.n_frames)
  }

  /** Binary-payload decode pipeline: documents → (metadata, real PNG
    * payload) → per-partition decode → SQL-visible decoded schema. */
  def qMultimodalDecode(s: SparkSession, sf: String): DataFrame = {
    import s.implicits._
    decoded(s, sf).toDF().orderBy("doc_id")
  }

  private def decoded(s: SparkSession, sf: String): Dataset[DecodedMedia] = {
    import s.implicits._
    val assets: Dataset[MediaAsset] = Tables.documents(s, sf)
      .select(col("doc_id"), col("lang"),
              (lit(1L) + col("doc_id") % 24L).as("n_frames"))
      .as[(Long, String, Long)]
      .map { case (id, lang, nf) => MediaAsset(id, lang, nf, renderPng(id)) }
    assets.mapPartitions { it =>
      // Per-partition codec init: disable ImageIO's disk-backed stream
      // cache once per task (the real-world analogue is constructing
      // the codec/decoder context here, once, not per row).
      javax.imageio.ImageIO.setUseCache(false)
      it.map(decodePng)
    }
  }

  /** One sampled frame of a decoded "video" asset. */
  final case class SampledFrame(doc_id: Long, frame_idx: Long, width: Long)

  /** Frame sampling: every 4th frame of each decoded asset, as a typed
    * flatMap — the row-explosion stage of a video-training pipeline
    * (each output row would carry the frame tensor; here its metadata,
    * with `width` read from the real decode). Fan-out happens AFTER the
    * per-partition decode so the codec runs once per asset, not per
    * frame. */
  def qMultimodalFrames(s: SparkSession, sf: String): DataFrame = {
    import s.implicits._
    decoded(s, sf)
      .flatMap { d =>
        (0L until d.n_frames by 4L).map(i => SampledFrame(d.doc_id, i, d.width))
      }
      .toDF()
      .orderBy("doc_id", "frame_idx")
  }

  /** Resized media metadata: 2× average-pooled dimensions + checksum. */
  final case class ResizedMedia(doc_id: Long, rw: Long, rh: Long, pooled_sum: Long)

  /** REAL image resize — 2× average-pooling on the DECODED raster (the
    * thumbnail/downsample stage of an image-training pipeline, on
    * actual pixels): decode the PNG payload, pool each 2×2 block to
    * `block_sum div 4` (integer — exact on both engines), truncate odd
    * edges, report pooled dims + pooled pixel sum. Same per-partition
    * codec batching as the decode op; the oracle recomputes the pooled
    * checksum from the generator over an explicit pixel grid, so the
    * decode→resize arithmetic is verified end-to-end on real bytes. */
  def qMultimodalResize(s: SparkSession, sf: String): DataFrame = {
    import s.implicits._
    val assets: Dataset[MediaAsset] = Tables.documents(s, sf)
      .select(col("doc_id"), col("lang"),
              (lit(1L) + col("doc_id") % 24L).as("n_frames"))
      .as[(Long, String, Long)]
      .map { case (id, lang, nf) => MediaAsset(id, lang, nf, renderPng(id)) }
    assets.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { a =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(a.payload))
        val raster = img.getRaster
        val (rw, rh) = (img.getWidth / 2, img.getHeight / 2)
        var sum = 0L
        var j = 0
        while (j < rh) {
          var i = 0
          while (i < rw) {
            val block = raster.getSample(2 * i, 2 * j, 0) +
              raster.getSample(2 * i + 1, 2 * j, 0) +
              raster.getSample(2 * i, 2 * j + 1, 0) +
              raster.getSample(2 * i + 1, 2 * j + 1, 0)
            sum += block / 4
            i += 1
          }
          j += 1
        }
        ResizedMedia(a.doc_id, rw.toLong, rh.toLong, sum)
      }
    }.toDF().orderBy("doc_id")
  }

  /** Decoded audio metadata — everything below comes from PARSING the
    * WAV bytes, not from the generator. */
  final case class DecodedAudio(doc_id: Long, sample_rate: Long,
                                n_samples: Long, sum_amp: Long,
                                min_amp: Long, max_amp: Long,
                                zero_cross: Long)

  /** Deterministic PCM16 WAV fixture: a real RIFF container (44-byte
    * canonical header: RIFF/WAVE, `fmt ` chunk with PCM tag, `data`
    * chunk) around little-endian 16-bit mono samples
    * s(i) = ((i·(doc_id+3)) mod 2001) − 1000 at 8 kHz — integer-exact
    * on both engines, length 256 + doc_id mod 64 samples. */
  private[ops] def renderWav(docId: Long): Array[Byte] = {
    val n = (256L + docId % 64L).toInt
    val sr = 8000
    val bb = java.nio.ByteBuffer.allocate(44 + 2 * n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(36 + 2 * n)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")); bb.putInt(16)
    bb.putShort(1)              // audio format: PCM
    bb.putShort(1)              // channels: mono
    bb.putInt(sr)               // sample rate
    bb.putInt(sr * 2)           // byte rate
    bb.putShort(2)              // block align
    bb.putShort(16)             // bits per sample
    bb.put("data".getBytes("US-ASCII")); bb.putInt(2 * n)
    var i = 0L
    while (i < n) {
      bb.putShort((((i * (docId + 3L)) % 2001L) - 1000L).toShort)
      i += 1
    }
    bb.array()
  }

  /** Real WAV parse: validate the RIFF/WAVE magic, WALK the chunk list
    * (not a fixed 44-byte offset — real WAV files carry LIST/fact
    * chunks before data) to find `fmt ` and `data`, check PCM/mono/
    * 16-bit, then read every little-endian sample computing count,
    * amplitude sum/min/max and sign-boundary zero crossings. */
  private def decodeWav(docId: Long, bytes: Array[Byte]): DecodedAudio = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(): String = {
      val b = new Array[Byte](4); bb.get(b); new String(b, "US-ASCII")
    }
    require(fourcc() == "RIFF", s"asset $docId: not a RIFF container")
    bb.getInt // riff size
    require(fourcc() == "WAVE", s"asset $docId: not a WAVE form")
    var sr = -1L
    var result: DecodedAudio = null
    while (result == null && bb.remaining() >= 8) {
      val id = fourcc()
      val size = bb.getInt
      id match {
        case "fmt " =>
          val start = bb.position()
          require(bb.getShort == 1, s"asset $docId: not PCM")
          require(bb.getShort == 1, s"asset $docId: not mono")
          sr = bb.getInt.toLong
          bb.getInt; bb.getShort // byte rate, block align
          require(bb.getShort == 16, s"asset $docId: not 16-bit")
          bb.position(start + size)
        case "data" =>
          require(sr > 0, s"asset $docId: data before fmt")
          val n = size / 2
          var (sum, mn, mx, zc) = (0L, Long.MaxValue, Long.MinValue, 0L)
          var prev = 0L
          var i = 0
          while (i < n) {
            val v = bb.getShort.toLong
            sum += v
            if (v < mn) mn = v
            if (v > mx) mx = v
            if (i > 0 && ((prev < 0 && v >= 0) || (prev >= 0 && v < 0))) zc += 1
            prev = v
            i += 1
          }
          result = DecodedAudio(docId, sr, n.toLong, sum, mn, mx, zc)
        case _ => bb.position(bb.position() + size + (size & 1))
      }
    }
    require(result != null, s"asset $docId: no data chunk")
    result
  }

  /** Audio-payload decode pipeline — the audio face of the multimodal
    * family (PNG images already round-trip above): every document gets
    * a REAL WAV asset (RIFF-encoded PCM16), and the decode stage walks
    * the chunk structure and reads actual samples, so any byte-layout
    * or endianness bug breaks the hash against the closed-form oracle.
    * Payloads are created and parsed INSIDE one narrow stage — only
    * ~50-byte metadata rows ever shuffle, the 100 TB-safe shape for
    * media (the PNG decode note applies verbatim). */
  def qMultimodalAudio(s: SparkSession, sf: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, sf)
      .select(col("doc_id")).as[Long]
      .mapPartitions(it => it.map(id => decodeWav(id, renderWav(id))))
      .toDF().orderBy("doc_id")
  }

  /** Content-hash dedup over the BINARY payload — media dedup by
    * exact bytes (the first gate of any image/video curation pipeline:
    * identical files recur across crawls far more often than
    * near-dups). Hashes the raw payload column, keeps the min doc_id
    * per digest with duplicate and byte accounting. Shuffles (digest,
    * id, n_bytes) only — payloads never move, which is the entire
    * point at 100 TB of media. Oracle parity: payload = UTF-8 of text,
    * and DuckDB's md5(VARCHAR) hashes the same bytes. */
  def qMultimodalDedup(s: SparkSession, sf: String): DataFrame =
    Tables.documents(s, sf)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .select(col("doc_id"), md5(col("payload")).as("digest"),
              length(col("payload")).as("n_bytes"))
      .groupBy(col("digest"))
      .agg(min(col("doc_id")).as("keep_id"),
           count(lit(1)).as("n_copies"),
           first(col("n_bytes")).as("n_bytes"),
           sum(col("n_bytes")).as("total_bytes"))
      .orderBy("keep_id")
}
