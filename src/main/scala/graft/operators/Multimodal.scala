package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads as opaque `binary` columns
  * with a typed metadata struct, plus decode / feature-extract /
  * frame-sample operators.
  *
  * The decode path is REAL for `image/ppm` payloads: `PpmCodec` is a
  * pure-JVM binary P6 (PPM) parser/encoder — header tokenizer with
  * comment handling, raw RGB24 pixel access — and `resize` does true
  * nearest-neighbour pixel resampling, re-encoding a valid PPM. Formats
  * this sandbox has no decoder for (`image/fake` placeholders) fall back
  * to the clearly-marked deterministic stub, preserving the operator
  * shape a JNI/FFI decoder would plug into.
  *
  * Scale notes: payloads stay opaque binary end-to-end (no driver
  * collect); `decodeFrames` is `mapPartitions` so one codec instance is
  * amortized across a whole partition (the standard pattern for native
  * decoders); metadata-only queries never deserialize the payload column
  * thanks to parquet column pruning.
  */
object Multimodal {

  /** Pure-JVM codec for binary PPM (P6): `P6 <w> <h> <maxval>` header
    * (whitespace/`#`-comment tolerant, maxval ≤ 255) followed by raw RGB
    * triplets. The one raster format decodable byte-exactly with no
    * native libraries. */
  object PpmCodec {

    /** Decoded raster: dims + row-major RGB24 bytes (3·w·h). */
    final case class Image(width: Int, height: Int, rgb: Array[Byte])

    /** None if the payload is not a well-formed P6 PPM. */
    def decode(bytes: Array[Byte]): Option[Image] = decodeAt(bytes, 0).map(_._1)

    /** Parse one P6 PPM starting at `start`, returning the raster AND
      * the index just past it — the primitive a concatenated-PPM stream
      * (the repo's video container) iterates frame by frame. */
    def decodeAt(bytes: Array[Byte], start: Int): Option[(Image, Int)] = {
      var i = start
      def skipWs(): Unit = {
        var in = true
        while (in && i < bytes.length) {
          val c = bytes(i)
          if (c == '#') { while (i < bytes.length && bytes(i) != '\n') i += 1 }
          else if (c == ' ' || c == '\t' || c == '\r' || c == '\n') i += 1
          else in = false
        }
      }
      def int(): Option[Int] = {
        skipWs()
        val start = i
        while (i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9') i += 1
        // >9 digits overflows Int — malformed header, not a crash
        if (i == start || i - start > 9) None
        else Some(new String(bytes, start, i - start, "US-ASCII").toInt)
      }
      def isWs(b: Byte): Boolean =
        b == ' ' || b == '\t' || b == '\r' || b == '\n'
      if (bytes.length < start + 2 || bytes(start) != 'P' ||
        bytes(start + 1) != '6') return None
      i = start + 2
      for {
        w <- int(); h <- int(); maxval <- int()
        if w > 0 && h > 0 && maxval > 0 && maxval <= 255
        // exactly ONE whitespace byte separates header from raster; a
        // non-whitespace byte here means the raster would misalign by one
        if i < bytes.length && isWs(bytes(i)) &&
          { i += 1; bytes.length - i >= 3L * w * h }
      } yield (Image(w, h,
        java.util.Arrays.copyOfRange(bytes, i, i + 3 * w * h)),
        i + 3 * w * h)
    }

    def encode(img: Image): Array[Byte] = {
      require(img.rgb.length == 3 * img.width * img.height, "rgb length mismatch")
      val header = s"P6\n${img.width} ${img.height}\n255\n".getBytes("US-ASCII")
      val out = new Array[Byte](header.length + img.rgb.length)
      System.arraycopy(header, 0, out, 0, header.length)
      System.arraycopy(img.rgb, 0, out, header.length, img.rgb.length)
      out
    }

    /** True nearest-neighbour resample (the classic src-index mapping
      * sx = x·srcW/dstW), producing a valid RGB24 raster. */
    def resizeNearest(img: Image, dstW: Int, dstH: Int): Image = {
      require(dstW > 0 && dstH > 0, "target dims must be positive")
      val out = new Array[Byte](3 * dstW * dstH)
      var y = 0
      while (y < dstH) {
        val sy = (y.toLong * img.height / dstH).toInt
        var x = 0
        while (x < dstW) {
          val sx = (x.toLong * img.width / dstW).toInt
          val s = 3 * (sy * img.width + sx)
          val d = 3 * (y * dstW + x)
          out(d) = img.rgb(s); out(d + 1) = img.rgb(s + 1); out(d + 2) = img.rgb(s + 2)
          x += 1
        }
        y += 1
      }
      Image(dstW, dstH, out)
    }
  }

  /** Pure-JVM codec for 16-bit PCM WAV (RIFF little-endian): `RIFF`
    * size `WAVE`, a `fmt ` chunk (PCM format 1 only), then the `data`
    * chunk. Unknown chunks are skipped by their declared size, so files
    * with LIST/INFO metadata still decode. The second real decoder next
    * to PPM — audio stays opaque binary end-to-end, and the same
    * mapPartitions dispatch a JNI/FFI decoder would plug into. */
  object WavCodec {

    /** Decoded clip: interleaved 16-bit samples + layout metadata.
      * `dataOffset` is the byte position of the first sample in the
      * original payload (frame byte_offsets derive from it). */
    final case class Audio(channels: Int, sampleRate: Int,
        samples: Array[Short], dataOffset: Int)

    private def le16(b: Array[Byte], i: Int): Int =
      (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
    private def le32(b: Array[Byte], i: Int): Int =
      (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
        ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)
    private def tag(b: Array[Byte], i: Int, t: String): Boolean =
      i + 4 <= b.length && b(i) == t(0).toByte && b(i + 1) == t(1).toByte &&
        b(i + 2) == t(2).toByte && b(i + 3) == t(3).toByte

    /** None if the payload is not a well-formed PCM-16 WAV. */
    def decode(bytes: Array[Byte]): Option[Audio] = {
      if (bytes.length < 44 || !tag(bytes, 0, "RIFF") || !tag(bytes, 8, "WAVE"))
        return None
      var i = 12
      var channels = 0; var rate = 0; var bits = 0; var fmtOk = false
      while (i + 8 <= bytes.length) {
        val size = le32(bytes, i + 4)
        if (size < 0 || i + 8 + size > bytes.length) return None
        if (tag(bytes, i, "fmt ")) {
          if (size < 16) return None
          fmtOk = le16(bytes, i + 8) == 1 // PCM only
          channels = le16(bytes, i + 10)
          rate = le32(bytes, i + 12)
          bits = le16(bytes, i + 22)
        } else if (tag(bytes, i, "data")) {
          if (!fmtOk || channels <= 0 || rate <= 0 || bits != 16) return None
          val n = size / 2
          val out = new Array[Short](n)
          var k = 0
          while (k < n) { out(k) = le16(bytes, i + 8 + 2 * k).toShort; k += 1 }
          return Some(Audio(channels, rate, out, i + 8))
        }
        i += 8 + size + (size & 1) // chunks are word-aligned
      }
      None
    }

    def encode(a: Audio): Array[Byte] = {
      require(a.channels > 0 && a.sampleRate > 0, "invalid layout")
      val dataLen = 2 * a.samples.length
      val out = new Array[Byte](44 + dataLen)
      def w16(i: Int, v: Int): Unit = {
        out(i) = (v & 0xff).toByte; out(i + 1) = ((v >> 8) & 0xff).toByte
      }
      def w32(i: Int, v: Int): Unit = { w16(i, v & 0xffff); w16(i + 2, v >>> 16) }
      def wtag(i: Int, t: String): Unit =
        (0 until 4).foreach(j => out(i + j) = t(j).toByte)
      wtag(0, "RIFF"); w32(4, 36 + dataLen); wtag(8, "WAVE")
      wtag(12, "fmt "); w32(16, 16); w16(20, 1); w16(22, a.channels)
      w32(24, a.sampleRate); w32(28, a.sampleRate * a.channels * 2)
      w16(32, a.channels * 2); w16(34, 16)
      wtag(36, "data"); w32(40, dataLen)
      var k = 0
      while (k < a.samples.length) { w16(44 + 2 * k, a.samples(k) & 0xffff); k += 1 }
      out
    }
  }

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
    * arithmetic — the fallback for payload formats this sandbox cannot
    * really decode (`image/fake`). */
  private def stubDecode(m: MediaRow): Iterator[FrameRow] =
    if (m.content.isEmpty) Iterator.empty // empty payload decodes to 0 frames
    else {
      val len = m.content.length
      (0 until m.n_frames).iterator.map { f =>
        val off = (f.toLong * len) / m.n_frames
        FrameRow(m.media_id, f, off, m.content(math.min(off.toInt, len - 1)) & 0xff)
      }
    }

  /** REAL decode for PPM payloads: parse the raster, then emit one frame
    * per requested sample — frame f samples the scanline at f·h/n_frames,
    * byte_offset is the pixel's offset into the raster, sample_value the
    * red channel of that scanline's first pixel. */
  private def ppmDecode(m: MediaRow): Iterator[FrameRow] =
    PpmCodec.decode(m.content) match {
      case None => Iterator.empty // malformed payload → 0 frames, not a crash
      case Some(img) =>
        (0 until m.n_frames.max(1).min(img.height)).iterator.map { f =>
          val row = (f.toLong * img.height) / m.n_frames.max(1)
          val off = 3L * row * img.width
          FrameRow(m.media_id, f, off, img.rgb(off.toInt) & 0xff)
        }
    }

  /** REAL decode for PCM WAV payloads: frame f covers the f-th of
    * n_frames equal sample windows; sample_value is the window's peak
    * absolute amplitude (the waveform-thumbnail primitive), byte_offset
    * the window's first sample byte in the original payload. */
  private def wavDecode(m: MediaRow): Iterator[FrameRow] =
    WavCodec.decode(m.content) match {
      case None => Iterator.empty // malformed payload → 0 frames, not a crash
      case Some(a) if a.samples.isEmpty => Iterator.empty
      case Some(a) =>
        val nf = m.n_frames.max(1).min(a.samples.length)
        (0 until nf).iterator.map { f =>
          val start = (f.toLong * a.samples.length / nf).toInt
          val end = (((f + 1).toLong * a.samples.length) / nf).toInt.max(start + 1)
          var peak = 0
          var k = start
          while (k < end) {
            val v = math.abs(a.samples(k).toInt); if (v > peak) peak = v; k += 1
          }
          FrameRow(m.media_id, f, a.dataOffset + 2L * start, peak)
        }
    }

  /** Decode frames with one codec dispatch per partition (mapPartitions
    * keeps the partitioning and lets a real codec init once per task). */
  def decodeFrames(media: Dataset[MediaRow])(implicit spark: SparkSession): Dataset[FrameRow] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { m =>
        m.media_type match {
          case "image/ppm" => ppmDecode(m)
          case "audio/wav" => wavDecode(m)
          case _           => stubDecode(m)
        }
      }
    }
  }

  /** One fixed-length analysis window of decoded PCM: sample count and
    * exact integer energy Σv² (int16² ≤ 2³⁰, so a window of ≤ 2³³ samples
    * stays inside int64 — audio DSP with no float in sight). */
  final case class EnergyRow(
      media_id: Long, win_idx: Int, n_samples: Int, energy: Long)

  /** Real WAV DSP: decode PCM and emit per-window energies (the VAD /
    * loudness-segmentation front end). Same one-codec-dispatch-per-
    * partition shape as decodeFrames; non-WAV or malformed payloads emit
    * no windows rather than crash. */
  def decodeEnergyWindows(media: Dataset[MediaRow], windowSamples: Int)(
      implicit spark: SparkSession): Dataset[EnergyRow] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { m =>
        WavCodec.decode(m.content) match {
          case None => Iterator.empty
          case Some(a) =>
            a.samples.grouped(windowSamples).zipWithIndex.map {
              case (w, i) =>
                var e = 0L
                w.foreach(v => e += v.toLong * v)
                EnergyRow(m.media_id, i, w.length, e)
            }
        }
      }
    }
  }

  /** Real resize for PPM payloads: decode → nearest-neighbour resample →
    * re-encode a valid PPM, with metadata updated to the actual new dims.
    * Non-PPM rows fall back to the stub path. */
  def resize(media: Dataset[MediaRow], targetW: Int, targetH: Int)(
      implicit spark: SparkSession): Dataset[MediaRow] = {
    import spark.implicits._
    media.map { m =>
      if (m.media_type == "image/ppm") {
        PpmCodec.decode(m.content) match {
          case Some(img) =>
            val r = PpmCodec.resizeNearest(img, targetW, targetH)
            m.copy(content = PpmCodec.encode(r), width = r.width, height = r.height)
          case None => m // undecodable: pass through untouched
        }
      } else stubResizeRow(m, targetW, targetH)
    }
  }

  /** One perceptual hash per image: (media_id, 64-bit dHash). */
  final case class DHashRow(media_id: Long, dhash: Long)

  /** Difference hash (dHash) over decoded PPM payloads — THE cheap
    * perceptual near-dup signature (pHash's DCT refines it; the pipeline
    * shape is identical): the raster must already be the canonical
    * (w+1)×h thumb (callers resize first — q229 goes 18×16 → 9×8 through
    * the real resampler), then bit (y·w+x) = [gray(x+1,y) > gray(x,y)],
    * horizontal gradient signs packed little-endian into an int64. Gray
    * is the red channel (callers encode grayscale rasters, r=g=b).
    * Same one-codec-dispatch-per-partition shape as decodeFrames;
    * undecodable or wrong-geometry payloads emit nothing. */
  def dHash(media: Dataset[MediaRow], w: Int, h: Int)(
      implicit spark: SparkSession): Dataset[DHashRow] = {
    import spark.implicits._
    require(w * h <= 64, s"dHash needs w*h <= 64 bits, got ${w}x$h")
    media.mapPartitions { rows =>
      rows.flatMap { m =>
        PpmCodec.decode(m.content) match {
          case Some(img) if img.width == w + 1 && img.height == h =>
            Iterator.single(DHashRow(m.media_id, dhashBits(img, w, h)))
          case _ => Iterator.empty
        }
      }
    }
  }

  /** Horizontal-gradient-sign bits of one canonical (w+1)×h raster. */
  private def dhashBits(img: PpmCodec.Image, w: Int, h: Int): Long = {
    var bits = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val g0 = img.rgb(3 * (y * (w + 1) + x)) & 0xff
        val g1 = img.rgb(3 * (y * (w + 1) + x + 1)) & 0xff
        if (g1 > g0) bits |= 1L << (y * w + x)
        x += 1
      }
      y += 1
    }
    bits
  }

  /** One sampled, hashed video frame. */
  final case class FrameHashRow(media_id: Long, frame_idx: Int, dhash: Long)

  /** Frame-sample + perceptual-hash a concatenated-PPM video container:
    * frames are parsed sequentially with `PpmCodec.decodeAt` (one codec
    * dispatch per partition — the FFI-decoder shape), every `stride`-th
    * frame whose raster is already the canonical (w+1)×h thumb gets the
    * same horizontal-gradient dHash the image path uses. This is the
    * shot-boundary / video-near-dup primitive: downstream compares
    * consecutive sampled hashes (Hamming) or bands them for near-dup
    * candidates exactly like q229's image path. Frames decode lazily
    * off one payload, so memory is one frame, not one video; a
    * malformed tail stops the parse cleanly (frames before it still
    * emit). */
  def videoFrameHashes(media: Dataset[MediaRow], w: Int, h: Int,
      stride: Int = 1)(
      implicit spark: SparkSession): Dataset[FrameHashRow] = {
    import spark.implicits._
    require(w * h <= 64, s"dHash needs w*h <= 64 bits, got ${w}x$h")
    require(stride >= 1, "stride must be >= 1")
    media.mapPartitions { rows =>
      rows.flatMap { m =>
        Iterator.unfold((0, 0)) { case (pos, f) =>
          PpmCodec.decodeAt(m.content, pos).map { case (img, next) =>
            val out =
              if (f % stride == 0 && img.width == w + 1 && img.height == h)
                Iterator.single(FrameHashRow(m.media_id, f,
                  dhashBits(img, w, h)))
              else Iterator.empty
            (out, (next, f + 1))
          }
        }.flatten
      }
    }
  }

  /** Byte value at a fixed 1-based offset of a binary column (hex→int
    * round trip; conv is case-insensitive so either engine's hex casing
    * works). */
  def byteAt(bin: Column, pos: Int): Column =
    conv(hex(substring(bin, pos, 1)), 16, 10).cast("long")

  /** STUB resize for non-raster payloads: deterministic downsample of the
    * fake byte grid — metadata transforms exactly as a real resize would
    * (target dims, scale factors, byte budget), payload handling stays
    * opaque. */
  private def stubResizeRow(m: MediaRow, targetW: Int, targetH: Int): MediaRow = {
    val sx = math.max(1, m.width / targetW)
    val sy = math.max(1, m.height / targetH)
    // nearest-neighbour analog: keep every (sx·sy)-th byte of the payload
    val kept =
      if (m.content.isEmpty) m.content
      else m.content.grouped(sx * sy).map(_.head).toArray
    m.copy(content = kept, width = math.min(m.width, targetW),
      height = math.min(m.height, targetH))
  }

  /** Backwards-compatible stub-only entry point (see `resize` for the
    * format-dispatching version). */
  def resizeStub(media: Dataset[MediaRow], targetW: Int, targetH: Int)(
      implicit spark: SparkSession): Dataset[MediaRow] = {
    import spark.implicits._
    media.map(stubResizeRow(_, targetW, targetH))
  }

  /** Column-level feature extraction on the payload (oracle-checkable
    * fake: size, head-of-file signature, sampled-byte checksum — the
    * shape of a real perceptual hash pipeline). */
  def fakeFeatures(content: Column, sampleOffsets: Seq[Int]): Seq[Column] = Seq(
    octet_length(content).cast("long").as("n_bytes"),
    base64(substring(content, 1, 16)).as("head_b64"),
    sampleOffsets.map(p => byteAt(content, p)).reduce(_ + _).as("sample_checksum"))
}
