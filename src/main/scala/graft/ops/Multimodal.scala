package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing (SURVEY.md §2.11 extensions).
  *
  * Media assets ride through the pipeline as opaque `binary` payloads
  * next to typed metadata; decode / feature-extraction runs as a typed
  * `mapPartitions` so one task amortizes (real-world) codec/model init
  * across its whole partition — the same batch shape as an
  * `mapInPandas`/Arrow UDF, but staying JVM-native.
  *
  * The decode kernel itself is a STUB (this container has no image /
  * audio codecs): it derives deterministic fake dimensions from the
  * payload bytes. Everything around it — binary column, case-class
  * schema, per-partition batching, the SQL-visible output schema — is
  * the real plumbing a production decode would use.
  */
object Multimodal {

  /** An asset row entering decode: opaque bytes + routing metadata. */
  final case class MediaAsset(doc_id: Long, lang: String, payload: Array[Byte])

  /** Decoded media metadata (what a real codec would emit). */
  final case class DecodedMedia(doc_id: Long, lang: String,
                                width: Long, height: Long, n_frames: Long)

  /** STUB decode — replace with a real codec call. Deterministic pure
    * function of the payload so the fixture pipeline is
    * oracle-checkable; a real implementation would decode image headers
    * (or sample video frames) here, one codec instance per partition.
    * The stub's "dimensions" derive from codepoint count and first
    * codepoint — the same unicode semantics as the oracle's
    * n_chars/ascii(), not UTF-8 byte semantics, so parity holds even on
    * non-ASCII payloads. */
  private def decodeStub(a: MediaAsset): DecodedMedia = {
    val text = new String(a.payload, java.nio.charset.StandardCharsets.UTF_8)
    val len = text.codePointCount(0, text.length).toLong
    val first = if (text.nonEmpty) text.codePointAt(0).toLong else 0L
    DecodedMedia(a.doc_id, a.lang,
      width = 64L + len % 512L,
      height = 64L + (len * 31L + first) % 256L,
      n_frames = 1L + len % 24L)
  }

  /** Binary-payload decode pipeline: documents → (metadata, binary
    * payload) → per-partition decode → SQL-visible decoded schema. */
  def qMultimodalDecode(s: SparkSession, sf: String): DataFrame = {
    import s.implicits._
    decoded(s, sf).toDF().orderBy("doc_id")
  }

  private def decoded(s: SparkSession, sf: String): Dataset[DecodedMedia] = {
    import s.implicits._
    val assets: Dataset[MediaAsset] = Tables.documents(s, sf)
      .select(col("doc_id"), col("lang"),
              encode(col("text"), "UTF-8").as("payload"))
      .as[MediaAsset]
    assets.mapPartitions { it =>
      // One "codec init" per partition would go here.
      it.map(decodeStub)
    }
  }

  /** One sampled frame of a decoded "video" asset. */
  final case class SampledFrame(doc_id: Long, frame_idx: Long, width: Long)

  /** Frame sampling: every 4th frame of each decoded asset, as a typed
    * flatMap — the row-explosion stage of a video-training pipeline
    * (each output row would carry the frame tensor; here just its
    * metadata, the decode being stubbed). Fan-out happens AFTER the
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
