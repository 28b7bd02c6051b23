package graft

import org.apache.spark.sql.functions._
import graft.functions.TextKernels
import graft.operators.{Similarity, TextDedup}

/** Unit fixtures for the text/vector pipeline operators (DuckDB-parity
  * values precomputed with duckdb 1.x md5_number_lower). */
class TextPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("shingles: k-gram count and content") {
    val df = Seq("a b c d").toDF("text")
      .select(TextKernels.shingles(TextKernels.tokens(col("text")), 3).as("s"))
    assert(df.head.getSeq[String](0) === Seq("a b c", "b c d"))
  }

  test("minhash seed-hash matches DuckDB md5_number_lower('0|shingle')") {
    val df = Seq("spark scan fast").toDF("sh")
      .select(functions.Kernels.md5Lower64(concat(lit("0"), lit("|"), col("sh"))).as("h"))
    assert(df.head.getDecimal(0).toBigInteger.toString === "1141047023951936527")
  }

  test("simhash halves match DuckDB bit split of md5_number_lower('hello')") {
    val df = Seq("hello").toDF("t").select(
      functions.Kernels.md5Lower64Hi32(col("t")).as("hi"),
      functions.Kernels.md5Lower64Lo32(col("t")).as("lo"))
    val r = df.head
    assert(r.getLong(0) === 2462390032L && r.getLong(1) === 2443014585L)
  }

  test("simhashes: single-token doc yields the token's own bit pattern") {
    // With one token the majority vote per bit IS that token's bit:
    // md5_number_lower('hello') splits to (2462390032, 2443014585).
    val docs = Seq((1L, Seq("hello"))).toDF("doc_id", "ws")
    val r = TextDedup.simhashes(docs, "doc_id", "ws").head
    assert(r.getLong(1) === 2462390032L && r.getLong(2) === 2443014585L)
  }

  test("lshCandidatePairs finds identical docs, skips disjoint ones") {
    val docs = Seq(
      (1L, "x y z w v u t s r q p o"),
      (2L, "x y z w v u t s r q p o"),
      (3L, "aa bb cc dd ee ff gg hh ii jj kk ll")).toDF("doc_id", "text")
    val sig = TextDedup.minhashSignatures(
      TextDedup.shingleRows(
        docs.select(col("doc_id"), TextKernels.tokens(col("text")).as("ws")),
        "doc_id", "ws", 3),
      "doc_id", "_sh", 16)
    val pairs = TextDedup.lshCandidatePairs(sig, "doc_id", "sig", 4, 4).collect()
    assert(pairs.length === 1)
    assert(pairs.head.getLong(0) === 1L && pairs.head.getLong(1) === 2L)
    assert(pairs.head.getDouble(2) === 1.0)
  }

  test("jaccard: exact set overlap") {
    val df = Seq((Seq("a", "b", "c"), Seq("b", "c", "d"))).toDF("x", "y")
      .select(TextDedup.jaccard(col("x"), col("y")).as("j"))
    assert(df.head.getDouble(0) === 0.5)
  }

  test("cosine: identical vectors → 1.0; orthogonal → 0.0") {
    val df = Seq((Seq(1.0f, 0.0f), Seq(1.0f, 0.0f), Seq(0.0f, 2.0f))).toDF("a", "b", "c")
    val r = df.select(
      Similarity.cosine(col("a"), col("b")).as("same"),
      Similarity.cosine(col("a"), col("c")).as("orth")).head
    assert(r.getDouble(0) === 1.0 && r.getDouble(1) === 0.0)
  }

  test("bruteForceTopK ranks by cosine desc with id tiebreak") {
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f)),
      (2L, Seq(1.0f, 0.1f)),
      (3L, Seq(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(
      vecs.where(col("vec_id") === 1), vecs, "vec_id", "embedding", 2).collect()
    assert(top.map(r => (r.getLong(1), r.getInt(3))).toSeq === Seq((2L, 1), (3L, 2)))
  }

  test("srpBucket is deterministic and within [0, 2^planes)") {
    val vecs = Seq((1L, (0 until 64).map(i => (i - 32) / 64.0f)))
      .toDF("vec_id", "embedding")
    val b1 = vecs.select(Similarity.srpBucket(col("embedding"), 8, 64)).head.getLong(0)
    val b2 = vecs.select(Similarity.srpBucket(col("embedding"), 8, 64)).head.getLong(0)
    assert(b1 === b2 && b1 >= 0 && b1 < 256)
  }

  test("multimodal: decodeFrames stub emits n_frames rows with in-range bytes") {
    import graft.operators.Multimodal
    implicit val s = spark
    val media = Seq(
      Multimodal.MediaRow(1L, "image/fake", "hello world".getBytes("UTF-8"), 64, 48, 4),
      Multimodal.MediaRow(2L, "image/fake", "xy".getBytes("UTF-8"), 64, 48, 1)
    ).toDS()
    val frames = Multimodal.decodeFrames(media).collect().sortBy(f => (f.media_id, f.frame_idx))
    assert(frames.count(_.media_id == 1L) === 4)
    assert(frames.count(_.media_id == 2L) === 1)
    assert(frames.forall(f => f.sample_value >= 0 && f.sample_value <= 255))
    assert(frames.head.byte_offset === 0L)
  }

  test("multimodal: byteAt matches ascii of the UTF-8 payload") {
    import graft.operators.Multimodal
    val df = Seq("Abc").toDF("t")
      .select(Multimodal.byteAt(encode(col("t"), "UTF-8"), 2).as("b"))
    assert(df.head.getLong(0) === 'b'.toLong)
  }

  test("redactPii is idempotent and leaves no redactable matches behind") {
    val docs = Seq(
      "mail a.user+tag@sub.example.org now",
      "call +971-5012-3456-789 or visit https://x.example/a?b=c end",
      "clean text with no pii at all",
      "edge overlap: u1@a.co https://u2@b.co +12345678 done").toDF("t")
    val once  = docs.select(TextKernels.redactPii(col("t")).as("r"))
    val twice = once.select(col("r"), TextKernels.redactPii(col("r")).as("r2"))
    assert(twice.where(col("r") =!= col("r2")).isEmpty, "redaction must be idempotent")
    val leftovers = once.where(
      regexp_count(col("r"), lit(TextKernels.EmailRe)) > 0 ||
      regexp_count(col("r"), lit(TextKernels.UrlRe)) > 0 ||
      regexp_count(col("r"), lit(TextKernels.PhoneRe)) > 0)
    assert(leftovers.isEmpty, "no pattern may survive redaction")
  }

  test("connectedComponents: chains, triangles and disjoint pairs get min-label clusters") {
    val pairs = Seq(
      (1L, 2L), (2L, 3L),          // chain 1-2-3
      (10L, 11L), (11L, 12L), (10L, 12L), // triangle
      (20L, 21L)                   // disjoint pair
    ).toDF("id_a", "id_b")
    val got = TextDedup.connectedComponents(pairs, "id_a", "id_b")
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === Seq((1L,1L),(2L,1L),(3L,1L),(10L,10L),(11L,10L),(12L,10L),(20L,20L),(21L,20L)))
  }

  test("connectedComponents: 128-node chain converges in O(log diameter) star rounds") {
    // Path 0-1-2-…-127: diameter 127. Plain min-label propagation needs
    // ~127 rounds; large-star/small-star must land well under
    // ceil(log2(127)) + c. Labels must still all collapse to 0.
    val n = 128
    val pairs = (0 until n - 1).map(i => (i.toLong, i + 1L)).toDF("id_a", "id_b")
    val (labels, rounds) =
      TextDedup.connectedComponentsWithRounds(pairs, "id_a", "id_b")
    assert(rounds <= 12, s"expected O(log diameter) rounds, got $rounds")
    val got = labels.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got.size === n && got.values.forall(_ === 0L))
  }

  test("connectedComponents leaves no cacheManager pins behind") {
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 5L)).toDF("id_a", "id_b")
    val labels = TextDedup.connectedComponents(pairs, "id_a", "id_b")
    assert(spark.sharedState.cacheManager.isEmpty,
      "connectedComponents must be pin-neutral")
    // self-pair nodes still get a singleton label
    val got = labels.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got(5L) === 5L && got(3L) === 1L)
  }

  test("rollingHash matches the Rabin-Karp reference fold") {
    // h('abc') with B=131, M=2^31-1, computed independently = 1677554
    val df = Seq("abc").toDF("t").select(TextKernels.rollingHash(col("t")).as("h"))
    assert(df.head.getLong(0) === 1677554L)
  }

  test("multimodal resizeStub shrinks dims and payload deterministically") {
    import graft.operators.Multimodal
    implicit val s = spark
    val media = Seq(Multimodal.MediaRow(1L, "image/fake",
      Array.tabulate(64)(_.toByte), 640, 480, 2)).toDS()
    val r = Multimodal.resizeStub(media, 320, 240).head()
    assert(r.width === 320 && r.height === 240)
    assert(r.content.length === 64 / 4)        // sx=2, sy=2 -> every 4th byte
    assert(r.content(1) === 4.toByte)          // head of the 2nd group
  }
}
