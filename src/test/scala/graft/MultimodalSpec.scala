package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.PpmCodec

/** Real-codec coverage: the pure-JVM P6/PPM parser, nearest-neighbour
  * resize, and the format-dispatching Dataset operators. */
class MultimodalSpec extends SparkSpec {

  // 2x2 RGB: red, green / blue, white
  private val px = Array[Byte](
    255.toByte, 0, 0,   0, 255.toByte, 0,
    0, 0, 255.toByte,   255.toByte, 255.toByte, 255.toByte)
  private val img22 = PpmCodec.Image(2, 2, px)

  test("PpmCodec encode→decode round-trips byte-exactly") {
    val bytes = PpmCodec.encode(img22)
    assert(new String(bytes.take(2), "US-ASCII") === "P6")
    val back = PpmCodec.decode(bytes).get
    assert(back.width === 2 && back.height === 2)
    assert(back.rgb.toSeq === px.toSeq)
  }

  test("PpmCodec decode tolerates comments and extra whitespace in the header") {
    val header = "P6\n# a comment line\n 2\t2 \n# another\n255\n".getBytes("US-ASCII")
    val bytes = header ++ px
    val got = PpmCodec.decode(bytes).get
    assert(got.width === 2 && got.height === 2 && got.rgb.toSeq === px.toSeq)
  }

  test("PpmCodec rejects malformed payloads instead of crashing") {
    assert(PpmCodec.decode(Array[Byte]()) === None)
    assert(PpmCodec.decode("P5\n2 2\n255\n".getBytes ++ px) === None) // P5 ≠ P6
    assert(PpmCodec.decode("P6\n2 2\n255\n".getBytes ++ px.take(5)) === None) // truncated raster
    assert(PpmCodec.decode("P6\n2 2\n65535\n".getBytes ++ px) === None) // 16-bit maxval unsupported
    assert(PpmCodec.decode("P6\n99999999999 1\n255\n".getBytes ++ px) === None) // dims overflow Int
    assert(PpmCodec.decode("P6 2 2 255".getBytes ++ Array(0xFF.toByte) ++ px) === None) // no ws terminator
  }

  test("resizeNearest 4x4 → 2x2 picks the exact nearest-neighbour source pixels") {
    // 4x4 grid where pixel (x,y) has rgb (x, y, x+y): nearest for dst (x,y)
    // is src (2x, 2y)
    val rgb = Array.tabulate(4 * 4 * 3) { i =>
      val p = i / 3; val x = p % 4; val y = p / 4
      (i % 3 match { case 0 => x; case 1 => y; case 2 => x + y }).toByte
    }
    val out = PpmCodec.resizeNearest(PpmCodec.Image(4, 4, rgb), 2, 2)
    val expected = for (y <- Seq(0, 2); x <- Seq(0, 2); c <- Seq(x, y, x + y)) yield c.toByte
    assert(out.rgb.toSeq === expected)
  }

  test("decodeFrames really decodes image/ppm payloads (scanline red-channel samples)") {
    implicit val s = spark
    import s.implicits._
    // 1x3 image, rows colored red=10, red=20, red=30
    val rgb = Array[Byte](10, 0, 0, 20, 0, 0, 30, 0, 0)
    val payload = PpmCodec.encode(PpmCodec.Image(1, 3, rgb))
    val media = Seq(Multimodal.MediaRow(7L, "image/ppm", payload, 1, 3, 3)).toDS()
    val frames = Multimodal.decodeFrames(media).collect().sortBy(_.frame_idx)
    assert(frames.map(_.sample_value).toSeq === Seq(10, 20, 30))
    assert(frames.map(_.byte_offset).toSeq === Seq(0L, 3L, 6L))
    // malformed ppm → zero frames, not an exception
    val bad = Seq(Multimodal.MediaRow(8L, "image/ppm", Array[Byte](1, 2, 3), 1, 1, 1)).toDS()
    assert(Multimodal.decodeFrames(bad).count() === 0)
  }

  test("PpmCodec roundtrip property: 200 random images survive encode→decode byte-exactly") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = for {
      w <- Gen.choose(1, 20); h <- Gen.choose(1, 20)
      bytes <- Gen.listOfN(3 * w * h, Gen.choose(0, 255))
    } yield PpmCodec.Image(w, h, bytes.map(_.toByte).toArray)
    val imgs = Gen.listOfN(200, gen).apply(Gen.Parameters.default, Seed(42L)).get
    imgs.foreach { img =>
      val back = PpmCodec.decode(PpmCodec.encode(img)).get
      assert(back.width === img.width && back.height === img.height)
      assert(back.rgb.toSeq === img.rgb.toSeq)
      // resize never exceeds source work and stays decodable
      val r = PpmCodec.resizeNearest(img, (img.width + 1) / 2, (img.height + 1) / 2)
      assert(PpmCodec.decode(PpmCodec.encode(r)).get.rgb.toSeq === r.rgb.toSeq)
    }
  }

  test("resize re-encodes a valid smaller PPM with updated metadata") {
    implicit val s = spark
    import s.implicits._
    val rgb = Array.tabulate(4 * 4 * 3)(i => (i % 127).toByte)
    val payload = PpmCodec.encode(PpmCodec.Image(4, 4, rgb))
    val media = Seq(Multimodal.MediaRow(9L, "image/ppm", payload, 4, 4, 1)).toDS()
    val out = Multimodal.resize(media, 2, 2).head()
    assert(out.width === 2 && out.height === 2)
    val back = PpmCodec.decode(out.content).get // still a decodable PPM
    assert(back.width === 2 && back.height === 2)
    assert(back.rgb.toSeq ===
      PpmCodec.resizeNearest(PpmCodec.Image(4, 4, rgb), 2, 2).rgb.toSeq)
  }

  test("WavCodec encode→decode round-trips samples, layout and data offset") {
    import Multimodal.WavCodec
    val samples = Array.tabulate(480)(i => ((i * 131) % 65536 - 32768).toShort)
    val a = WavCodec.Audio(channels = 2, sampleRate = 8000, samples, dataOffset = 0)
    val got = WavCodec.decode(WavCodec.encode(a)).get
    assert(got.channels === 2 && got.sampleRate === 8000 && got.dataOffset === 44)
    assert(got.samples.toSeq === samples.toSeq)
  }

  test("WavCodec skips unknown RIFF chunks and rejects malformed payloads") {
    import Multimodal.WavCodec
    val base = WavCodec.encode(WavCodec.Audio(1, 16000, Array[Short](1, -2, 3), 0))
    // splice a LIST chunk between fmt and data: still decodes
    val list = "LIST".getBytes("US-ASCII") ++ Array[Byte](4, 0, 0, 0) ++ "INFO".getBytes("US-ASCII")
    val spliced = base.slice(0, 36) ++ list ++ base.slice(36, base.length)
    // RIFF size field is unchecked; header tags and chunk walk must still work
    assert(WavCodec.decode(spliced).get.samples.toSeq === Seq[Short](1, -2, 3))
    assert(WavCodec.decode(Array[Byte]()).isEmpty)
    assert(WavCodec.decode("RIFFxxxxWAVE".getBytes("US-ASCII")).isEmpty)
    assert(WavCodec.decode(base.take(40)).isEmpty)     // truncated data chunk
    val f32 = base.clone; f32(20) = 3                  // IEEE-float format tag
    assert(WavCodec.decode(f32).isEmpty)
  }

  test("decodeFrames really decodes audio/wav payloads (windowed peak amplitudes)") {
    implicit val s = spark
    import s.implicits._
    import Multimodal.WavCodec
    // 8 samples, 2 frames → windows [0,4) peak 400, [4,8) peak 800
    val samples = Array[Short](100, -400, 50, 0, -800, 2, 3, 4)
    val payload = WavCodec.encode(WavCodec.Audio(1, 8000, samples, 0))
    val media = Seq(Multimodal.MediaRow(7L, "audio/wav", payload, 0, 0, 2)).toDS()
    val frames = Multimodal.decodeFrames(media).collect().sortBy(_.frame_idx)
    assert(frames.map(_.sample_value).toSeq === Seq(400, 800))
    assert(frames.map(_.byte_offset).toSeq === Seq(44L, 44L + 8L))
    // malformed audio payload → 0 frames, not a crash
    val bad = Seq(Multimodal.MediaRow(8L, "audio/wav",
      Array[Byte](1, 2, 3), 0, 0, 2)).toDS()
    assert(Multimodal.decodeFrames(bad).isEmpty)
  }
}
