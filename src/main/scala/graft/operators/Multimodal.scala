package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads as opaque `binary` columns
  * with a typed metadata struct, plus decode / feature-extract /
  * frame-sample operators.
  *
  * The Spark-side plumbing — schema, partition-preserving batch iteration,
  * operator signatures — is real and tested. The codec itself is a
  * clearly-marked DETERMINISTIC STUB (this environment has no image/audio
  * libraries): `decodeFramesStub` fabricates frame records from byte
  * arithmetic where a real build would call a JNI/FFI decoder per
  * partition. Swapping in a real codec changes only the body of
  * `stubDecode` below.
  *
  * Scale notes: payloads stay opaque binary end-to-end (no driver
  * collect); `decodeFrames` is `mapPartitions` so one codec instance is
  * amortized across a whole partition (the standard pattern for native
  * decoders); metadata-only queries never deserialize the payload column
  * thanks to parquet column pruning.
  */
object Multimodal {

  /** One media row: payload + typed metadata (what a real ingest would
    * carry for image/audio/video blobs). */
  final case class MediaRow(
      media_id: Long, media_type: String, content: Array[Byte],
      width: Int, height: Int, n_frames: Int)

  /** One decoded frame: per-frame features a real decoder would emit. */
  final case class FrameRow(
      media_id: Long, frame_idx: Int, byte_offset: Long, sample_value: Int)

  /** Wrap a text corpus as media rows — the deterministic stand-in for a
    * binary ingest (content = UTF-8 payload, metadata derived from size). */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      lit("image/fake").as("media_type"),
      encode(col("text"), "UTF-8").as("content"),
      (col("n_chars") % 640 + 64).cast("int").as("width"),
      ((col("n_chars") * 7) % 480 + 48).cast("int").as("height"),
      (col("n_chars") % 16 + 1).cast("int").as("n_frames"))

  /** STUB decode: fabricate a frame record per (media, frame) from byte
    * arithmetic. A real implementation decodes `m.content` here. */
  private def stubDecode(m: MediaRow): Iterator[FrameRow] =
    if (m.content.isEmpty) Iterator.empty // empty payload decodes to 0 frames
    else {
      val len = m.content.length
      (0 until m.n_frames).iterator.map { f =>
        val off = (f.toLong * len) / m.n_frames
        FrameRow(m.media_id, f, off, m.content(math.min(off.toInt, len - 1)) & 0xff)
      }
    }

  /** Decode frames with one "codec" per partition (mapPartitions keeps
    * the partitioning and lets a real codec init once per task). */
  def decodeFrames(media: Dataset[MediaRow])(implicit spark: SparkSession): Dataset[FrameRow] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      // real build: val codec = Codec.open(); rows.flatMap(codec.decode)
      rows.flatMap(stubDecode)
    }
  }

  /** Byte value at a fixed 1-based offset of a binary column (hex→int
    * round trip; conv is case-insensitive so either engine's hex casing
    * works). */
  def byteAt(bin: Column, pos: Int): Column =
    conv(hex(substring(bin, pos, 1)), 16, 10).cast("long")

  /** STUB resize: deterministic nearest-neighbour downsample of the fake
    * frame grid — metadata transforms exactly as a real resize would
    * (target dims, scale factors, byte budget), payload handling stays
    * opaque. A real build maps pixels here. */
  def resizeStub(media: Dataset[MediaRow], targetW: Int, targetH: Int)(
      implicit spark: SparkSession): Dataset[MediaRow] = {
    import spark.implicits._
    media.map { m =>
      val sx = math.max(1, m.width / targetW)
      val sy = math.max(1, m.height / targetH)
      // nearest-neighbour: keep every (sx·sy)-th byte of the payload
      val kept = m.content.grouped(sx * sy).map(_.head).toArray
      m.copy(content = kept, width = math.min(m.width, targetW),
        height = math.min(m.height, targetH))
    }
  }

  /** Column-level feature extraction on the payload (oracle-checkable
    * fake: size, head-of-file signature, sampled-byte checksum — the
    * shape of a real perceptual hash pipeline). */
  def fakeFeatures(content: Column, sampleOffsets: Seq[Int]): Seq[Column] = Seq(
    octet_length(content).cast("long").as("n_bytes"),
    base64(substring(content, 1, 16)).as("head_b64"),
    sampleOffsets.map(p => byteAt(content, p)).reduce(_ + _).as("sample_checksum"))
}
