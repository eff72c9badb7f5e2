package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import Util._

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

  /** Per-doc voice-activity summary: full 64-sample frames, a frame is
    * "speech" when its Σ|amplitude| exceeds 64·500 (mean |amp| > 500 —
    * half the fixture's 1000 peak). */
  final case class VadAudio(doc_id: Long, n_frames: Long, n_speech: Long,
                            speech_pm: Long, max_frame_abs: Long)

  /** Energy-threshold voice-activity detection over the REAL PCM16
    * payload — the segment-level audio feature a speech-training
    * pipeline extracts right after decode (silence trimming, speech
    * ratio quotas, VAD-gated transcription all start here): walk the
    * RIFF chunks, frame the decoded samples (64-sample frames, full
    * frames only), per-frame integer Σ|amp| against a mean-|amp|>500
    * threshold, per-doc speech ratio in 1e-3 fixed point. ALL-INTEGER
    * end to end; the oracle recomputes every frame energy in
    * closed-form SQL from the generator, so the decode→frame→energy
    * arithmetic is verified on real bytes. Same per-partition decode
    * batching as the other media ops; payloads never shuffle. */
  def qMultimodalVad(s: SparkSession, sf: String): DataFrame = {
    import s.implicits._
    def vad(docId: Long, bytes: Array[Byte]): VadAudio = {
      val bb = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def fourcc(): String = {
        val b = new Array[Byte](4); bb.get(b); new String(b, "US-ASCII")
      }
      require(fourcc() == "RIFF" && { bb.getInt; fourcc() == "WAVE" },
        s"asset $docId: not RIFF/WAVE")
      var result: VadAudio = null
      while (result == null && bb.remaining() >= 8) {
        val id = fourcc()
        val size = bb.getInt
        id match {
          case "data" =>
            val n = size / 2
            val full = n / 64
            var (frames, speech, maxAbs) = (0L, 0L, 0L)
            var f = 0
            while (f < full) {
              var sumAbs = 0L
              var i = 0
              while (i < 64) { sumAbs += math.abs(bb.getShort.toLong); i += 1 }
              frames += 1
              if (sumAbs > 64L * 500L) speech += 1
              if (sumAbs > maxAbs) maxAbs = sumAbs
              f += 1
            }
            result = VadAudio(docId, frames, speech,
              if (frames > 0) 1000L * speech / frames else 0L, maxAbs)
          case _ => bb.position(bb.position() + size + (size & 1))
        }
      }
      require(result != null, s"asset $docId: no data chunk")
      result
    }
    Tables.documents(s, sf)
      .select(col("doc_id")).as[Long]
      .mapPartitions(it => it.map(id => vad(id, renderWav(id))))
      .toDF().orderBy("doc_id")
  }

  /** Decoded video metadata — every field below is read by PARSING the
    * AVI container (headers) and its DIB frame payloads (pixel sums),
    * never from the generator. */
  final case class DecodedVideo(doc_id: Long, width: Long, height: Long,
                                n_frames: Long, n_sampled: Long, px_sum: Long)

  /** Deterministic AVI fixture: a REAL RIFF('AVI ') container —
    * LIST('hdrl') holding a 56-byte 'avih' main header and a nested
    * LIST('strl') with 'strh' (fccType 'vids', handler 'DIB ') and
    * 'strf' (a 40-byte BITMAPINFOHEADER + the 256-entry 8-bit
    * palette), then LIST('movi') with one uncompressed '00db' chunk
    * per frame. DIB quirks are reproduced faithfully: rows are
    * 4-byte-aligned (stride = (w+3)&~3) and stored BOTTOM-UP.
    * Pixels: px(x,y,f) = (x + 3y + 5f + doc_id) mod 251 with
    * w = 8 + id mod 8, h = 8 + 3id mod 8, frames = 4 + id mod 12. */
  private[ops] def renderAvi(docId: Long): Array[Byte] = {
    val w = (8L + docId % 8L).toInt
    val h = (8L + (docId * 3L) % 8L).toInt
    val nf = (4L + docId % 12L).toInt
    val stride = (w + 3) & ~3
    val frameBytes = stride * h
    val moviSize = 4 + nf * (8 + frameBytes)
    val strfSize = 40 + 256 * 4
    val strlSize = 4 + (8 + 56) + (8 + strfSize)
    val hdrlSize = 4 + (8 + 56) + (8 + strlSize)
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize)
    val bb = java.nio.ByteBuffer.allocate(8 + riffSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(s: String): Unit = bb.put(s.getBytes("US-ASCII"))
    fourcc("RIFF"); bb.putInt(riffSize); fourcc("AVI ")
    fourcc("LIST"); bb.putInt(hdrlSize); fourcc("hdrl")
    fourcc("avih"); bb.putInt(56)
    bb.putInt(40000)            // dwMicroSecPerFrame (25 fps)
    bb.putInt(frameBytes * 25)  // dwMaxBytesPerSec
    bb.putInt(0)                // dwPaddingGranularity
    bb.putInt(0x10)             // dwFlags: AVIF_HASINDEX off, WASCAPTUREFILE-ish
    bb.putInt(nf)               // dwTotalFrames
    bb.putInt(0)                // dwInitialFrames
    bb.putInt(1)                // dwStreams
    bb.putInt(frameBytes)       // dwSuggestedBufferSize
    bb.putInt(w); bb.putInt(h)  // dwWidth, dwHeight
    bb.putInt(0); bb.putInt(0); bb.putInt(0); bb.putInt(0)
    fourcc("LIST"); bb.putInt(strlSize); fourcc("strl")
    fourcc("strh"); bb.putInt(56)
    fourcc("vids"); fourcc("DIB ")
    bb.putInt(0)                // dwFlags
    bb.putInt(0)                // wPriority + wLanguage
    bb.putInt(0)                // dwInitialFrames
    bb.putInt(1); bb.putInt(25) // dwScale / dwRate = 25 fps
    bb.putInt(0)                // dwStart
    bb.putInt(nf)               // dwLength (frames)
    bb.putInt(frameBytes)       // dwSuggestedBufferSize
    bb.putInt(-1)               // dwQuality
    bb.putInt(0)                // dwSampleSize
    bb.putShort(0); bb.putShort(0) // rcFrame left/top
    bb.putShort(w.toShort); bb.putShort(h.toShort)
    fourcc("strf"); bb.putInt(strfSize)
    bb.putInt(40)               // biSize
    bb.putInt(w); bb.putInt(h)  // biWidth, biHeight (positive = bottom-up)
    bb.putShort(1)              // biPlanes
    bb.putShort(8)              // biBitCount
    bb.putInt(0)                // biCompression = BI_RGB
    bb.putInt(frameBytes)       // biSizeImage
    bb.putInt(0); bb.putInt(0)  // pels-per-meter
    bb.putInt(256); bb.putInt(0) // biClrUsed, biClrImportant
    var c = 0
    while (c < 256) { bb.putInt(c | (c << 8) | (c << 16)); c += 1 }
    fourcc("LIST"); bb.putInt(moviSize); fourcc("movi")
    var f = 0
    while (f < nf) {
      fourcc("00db"); bb.putInt(frameBytes)
      var row = h - 1              // bottom-up: last raster row first
      while (row >= 0) {
        var x = 0
        while (x < stride) {
          val v = if (x < w) ((x + 3L * row + 5L * f + docId) % 251L).toInt else 0
          bb.put(v.toByte)
          x += 1
        }
        row -= 1
      }
      f += 1
    }
    bb.array()
  }

  /** Real AVI parse: validate RIFF/'AVI ', walk the top-level chunk
    * list, descend into LIST('hdrl') for 'avih' (frame count, dims)
    * and the nested LIST('strl')'s 'strf' (8-bit uncompressed DIB +
    * stride), then LIST('movi'), reading every '00db' frame payload
    * bottom-up with its 4-byte row padding and summing the sampled
    * (every 2nd) frames' visible pixels. */
  private def decodeAvi(docId: Long, bytes: Array[Byte]): DecodedVideo = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(): String = {
      val b = new Array[Byte](4); bb.get(b); new String(b, "US-ASCII")
    }
    require(fourcc() == "RIFF", s"asset $docId: not RIFF")
    bb.getInt
    require(fourcc() == "AVI ", s"asset $docId: not AVI")
    var (w, h, nf, stride) = (-1, -1, -1L, -1)
    var (sampled, pxSum) = (0L, 0L)
    while (bb.remaining() >= 8) {
      val id = fourcc()
      val size = bb.getInt
      val end = bb.position() + size + (size & 1)
      if (id == "LIST") {
        val listType = fourcc()
        listType match {
          case "hdrl" | "strl" => () // descend: keep walking inside
          case "movi" =>
            require(w > 0 && stride > 0 && nf >= 0,
              s"asset $docId: movi before headers")
            var f = 0L
            while (bb.position() < end) {
              val cid = fourcc()
              val csz = bb.getInt
              if (cid == "00db") {
                if (f % 2 == 0) {
                  sampled += 1
                  var row = h - 1
                  while (row >= 0) {
                    var x = 0
                    while (x < stride) {
                      val v = bb.get() & 0xff
                      if (x < w) pxSum += v
                      x += 1
                    }
                    row -= 1
                  }
                } else bb.position(bb.position() + csz + (csz & 1))
                f += 1
              } else bb.position(bb.position() + csz + (csz & 1))
            }
          case _ => bb.position(end)
        }
      } else id match {
        case "avih" =>
          bb.getInt; bb.getInt; bb.getInt; bb.getInt
          nf = bb.getInt.toLong
          bb.getInt; bb.getInt; bb.getInt
          w = bb.getInt; h = bb.getInt
          bb.position(end)
        case "strf" =>
          require(bb.getInt == 40, s"asset $docId: bad BITMAPINFOHEADER")
          val bw = bb.getInt; val bh = bb.getInt
          require(bw == w && bh == h, s"asset $docId: strf/avih dim mismatch")
          bb.getShort
          require(bb.getShort == 8, s"asset $docId: not 8-bit")
          require(bb.getInt == 0, s"asset $docId: compressed DIB")
          stride = (bw + 3) & ~3
          bb.position(end)
        case _ => bb.position(end)
      }
    }
    require(nf >= 0 && sampled == (nf + 1) / 2, s"asset $docId: frame count drift")
    DecodedVideo(docId, w.toLong, h.toLong, nf, sampled, pxSum)
  }

  /** Video-payload decode + frame-sample pipeline — the video face of
    * the multimodal family (PNG and WAV already round-trip above):
    * every document gets a REAL AVI container (nested RIFF LISTs,
    * BITMAPINFOHEADER, palette, bottom-up 4-byte-padded DIB frames),
    * and the decode stage walks that structure and reads actual frame
    * bytes, sampling every 2nd frame — so any chunk-offset, stride or
    * row-order bug breaks the hash against the closed-form oracle.
    * Encode and parse run INSIDE one narrow stage; only ~50-byte
    * metadata rows shuffle (the 100 TB media shape). */
  def qMultimodalVideo(s: SparkSession, sf: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, sf)
      .select(col("doc_id")).as[Long]
      .mapPartitions(it => it.map(id => decodeAvi(id, renderAvi(id))))
      .toDF().orderBy("doc_id")
  }

  /** Per-image average-hash output: the 64-bit perceptual hash split
    * into two unsigned 32-bit halves (bit 63 would overflow a signed
    * BIGINT), plus the set-bit count. */
  final case class PHashOut(doc_id: Long, w: Long, h: Long,
                            hash_lo: Long, hash_hi: Long, n_bits: Long)

  /** Perceptual average-hash (aHash) over the REAL PNG payloads — the
    * media NEAR-dup gate ([[qMultimodalDedup]] catches byte-identical
    * files; aHash survives re-encode/resize because it thresholds 8×8
    * block LUMINANCE against the image mean): decode via the real
    * ImageIO codec, partition the raster into the 8×8 block grid
    * (block of pixel x = x·8 div w — integer, any dimensions), bit k
    * set iff blocksum_k·(w·h) > totalsum·area_k (the mean comparison
    * cross-multiplied to exact integers — zero floats), hash packed
    * little-endian as two 32-bit halves. Oracle parity: the PNG is
    * lossless over the closed-form gradient, so DuckDB rebuilds every
    * pixel with generate_series and packs the same bits. Scale: the
    * payload never shuffles — decode and hash are map-side; only
    * (doc_id, 5 longs) leave the scan stage, which is the entire
    * point at 100 TB of media. */
  def qMultimodalPhash(s: SparkSession, sf: String): DataFrame = {
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
        val (w, h) = (img.getWidth, img.getHeight)
        val bs = new Array[Long](64)
        val ba = new Array[Long](64)
        var y = 0
        while (y < h) {
          val bj = y * 8 / h
          var x = 0
          while (x < w) {
            val k = bj * 8 + x * 8 / w
            bs(k) += raster.getSample(x, y, 0)
            ba(k) += 1
            x += 1
          }
          y += 1
        }
        val sTot = bs.sum
        val aTot = w.toLong * h
        var lo = 0L; var hi = 0L; var nb = 0L
        var k = 0
        while (k < 64) {
          if (bs(k) * aTot > sTot * ba(k)) {
            nb += 1
            if (k < 32) lo |= 1L << k else hi |= 1L << (k - 32)
          }
          k += 1
        }
        PHashOut(a.doc_id, w.toLong, h.toLong, lo, hi, nb)
      }
    }.toDF().orderBy("doc_id")
  }

  /** Near-duplicate image pairs by perceptual-hash Hamming distance —
    * the media sibling of the text near-dup join ([[qMultimodalPhash]]
    * gives each image a 64-bit aHash; images within Hamming 3 are
    * "the same picture" across re-encodes): candidate pairs from
    * 4×16-bit BAND equi-joins (pigeonhole: distance ≤ 3 across 4
    * bands forces ≥1 identical band — the at-scale LSH shape, an
    * equi-join on (band, value) instead of all-pairs), then the EXACT
    * Hamming check bit_count(lo⊕lo′)+bit_count(hi⊕hi′) ≤ 3 on the
    * deduplicated candidates. ALL-INTEGER end to end. The oracle
    * states the same result as the all-pairs theta join — band
    * recall is exact by pigeonhole, fixture-scale equivalence like
    * the edit-distance band. Scale: only (id, 2×32-bit halves) ride
    * the band shuffle; payloads never move. */
  def qMultimodalNeardup(s: SparkSession, sf: String): DataFrame = {
    val hashes = qMultimodalPhash(s, sf)
      .select(col("doc_id"), col("hash_lo"), col("hash_hi"))
      .serCheckpoint(Tables.rowCount(s, sf, "documents")) // ≤1 hash/doc
    // ROUND 7 restructure (sf10 ladder finding): low-entropy media
    // collapses to few distinct signatures (sf1: 50k docs → 2,246
    // hashes, top group 1,586 members), so banding the DOC list makes
    // the candidate join quadratic in group size. The production media
    // pipeline collapses identical signatures FIRST: candidates are
    // generated over DISTINCT hashes (pigeonhole band join, same
    // recall proof), and doc pairs only materialize in the final
    // expansion — which is sized by the ANSWER (the pair list is
    // genuinely quadratic in identical-image group size; no layout
    // avoids emitting it), never by an intermediate.
    val dh = hashes.select(col("hash_lo"), col("hash_hi")).distinct()
      .serCheckpoint(Tables.rowCount(s, sf, "documents"))
    val banded = dh.select(col("hash_lo"), col("hash_hi"),
        explode(array(
          struct(lit(0).as("b"), (col("hash_lo") % 65536L).as("v")),
          struct(lit(1).as("b"), expr("(hash_lo div 65536) % 65536").as("v")),
          struct(lit(2).as("b"), (col("hash_hi") % 65536L).as("v")),
          struct(lit(3).as("b"), expr("(hash_hi div 65536) % 65536").as("v"))))
          .as("band"))
      .select(col("hash_lo"), col("hash_hi"),
              col("band.b").as("b"), col("band.v").as("v"))
    // candidate SIGNATURE pairs (canonical (lo,hi) lexicographic order)
    val hpairs = banded.select(col("b"), col("v"),
        col("hash_lo").as("alo"), col("hash_hi").as("ahi"))
      .join(banded.select(col("b"), col("v"),
        col("hash_lo").as("blo"), col("hash_hi").as("bhi")), Seq("b", "v"))
      .where(col("alo") < col("blo") ||
             (col("alo") === col("blo") && col("ahi") < col("bhi")))
      .select("alo", "ahi", "blo", "bhi").distinct()
      .withColumn("hamming", expr(
        "bit_count(alo ^ blo) + bit_count(ahi ^ bhi)").cast("long"))
      .where(col("hamming") <= 3)
    // expansion 1: identical-signature doc pairs (hamming 0)
    val within = hashes
      .select(col("hash_lo"), col("hash_hi"), col("doc_id").as("a_id"))
      .join(hashes.select(col("hash_lo"), col("hash_hi"),
                          col("doc_id").as("b_id")), Seq("hash_lo", "hash_hi"))
      .where(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), lit(0L).as("hamming"))
    // expansion 2: cross-signature doc pairs — each unordered signature
    // pair appears exactly once above, so least/greatest emits each
    // doc pair exactly once
    val cross = hpairs
      .join(hashes.select(col("hash_lo").as("alo"), col("hash_hi").as("ahi"),
                          col("doc_id").as("x")), Seq("alo", "ahi"))
      .join(hashes.select(col("hash_lo").as("blo"), col("hash_hi").as("bhi"),
                          col("doc_id").as("y")), Seq("blo", "bhi"))
      .select(least(col("x"), col("y")).as("a_id"),
              greatest(col("x"), col("y")).as("b_id"), col("hamming"))
    within.unionByName(cross).orderBy("a_id", "b_id")
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

  /** Structural container-integrity audit — the FAST pre-decode gate a
    * 100 TB media pipeline runs before spending codec CPU: pure
    * byte-level checks (PNG magic, IHDR tag at offset 13, IEND+CRC
    * trailer in the final 8 bytes) over the payload column, NO decode.
    * The fixture has no corrupt assets, so the op DECLARES a
    * deterministic corruption (the q_text_urls injection discipline):
    * docs in md5 bucket '0' are truncated to half length — the
    * magic+IHDR prefix survives and the trailer is destroyed, exactly
    * a killed upload. The checks are codegen'd binary
    * substr/hex expressions (map-side, no UDF; payloads never
    * shuffle), and only (lang, 4 longs) rows reach the aggregate. The
    * oracle predicts every count in closed form from the same md5
    * rule, so a broken byte-offset on the Spark side hash-fails. */
  def qMultimodalIntegrity(s: SparkSession, sf: String): DataFrame = {
    import s.implicits._
    val assets = Tables.documents(s, sf)
      .select(col("doc_id"), col("lang"))
      .as[(Long, String)]
      .map { case (id, lang) => (id, lang, renderPng(id)) }
      .toDF("doc_id", "lang", "payload")
    val p = when(Util.md5Bucket(col("doc_id")) === "0",
        expr("substr(payload, 1, CAST(length(payload) div 2 AS INT))"))
      .otherwise(col("payload"))
    assets.withColumn("p", p)
      .withColumn("magic_ok",
        expr("hex(substr(p, 1, 8))") === "89504E470D0A1A0A")
      .withColumn("ihdr_ok", expr("hex(substr(p, 13, 4))") === "49484452")
      .withColumn("trailer_ok",
        expr("hex(substr(p, -8, 8))") === "49454E44AE426082")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_assets"),
           sum(when(col("magic_ok"), 1L).otherwise(0L)).as("n_magic_ok"),
           sum(when(col("ihdr_ok"), 1L).otherwise(0L)).as("n_ihdr_ok"),
           sum(when(col("trailer_ok"), 1L).otherwise(0L)).as("n_trailer_ok"))
      .withColumn("corrupt_pm",
        expr("1000 * (n_assets - n_trailer_ok) div n_assets"))
      .orderBy("lang")
  }
}
