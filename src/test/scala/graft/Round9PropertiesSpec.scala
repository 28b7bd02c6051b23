package graft

import org.apache.spark.sql.functions._
import graft.operators.{Graphs, Multimodal, TextDedup}
import graft.operators.Multimodal.{MediaRow, PpmCodec}

/** Unit fixtures behind the round-9 operators: the concatenated-PPM
  * video walk (decodeAt offsets, malformed tails, stride sampling), the
  * synchronous Louvain local-move sweep on a hand-checked graph, and
  * the center-skip fuzzy-decontamination hash's tolerance contract.
  */
class Round9PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def gray(w: Int, h: Int, f: (Int, Int) => Int): PpmCodec.Image = {
    val rgb = new Array[Byte](3 * w * h)
    for (y <- 0 until h; x <- 0 until w) {
      val v = (f(x, y) % 256).toByte
      val o = 3 * (y * w + x)
      rgb(o) = v; rgb(o + 1) = v; rgb(o + 2) = v
    }
    PpmCodec.Image(w, h, rgb)
  }

  test("decodeAt walks a concatenated-PPM stream frame by frame") {
    val f0 = gray(3, 2, (x, y) => 10 * x + y)
    val f1 = gray(3, 2, (x, y) => 200 - 10 * x)
    val stream = PpmCodec.encode(f0) ++ PpmCodec.encode(f1)
    val Some((img0, p1)) = PpmCodec.decodeAt(stream, 0)
    assert(img0.rgb.toSeq == f0.rgb.toSeq)
    assert(p1 == PpmCodec.encode(f0).length)
    val Some((img1, p2)) = PpmCodec.decodeAt(stream, p1)
    assert(img1.rgb.toSeq == f1.rgb.toSeq)
    assert(p2 == stream.length)
    assert(PpmCodec.decodeAt(stream, p2).isEmpty) // clean end of stream
    // decode (offset 0) still returns just the first frame
    assert(PpmCodec.decode(stream).get.rgb.toSeq == f0.rgb.toSeq)
  }

  test("videoFrameHashes: lazy walk, stride sampling, malformed tail") {
    implicit val s = spark
    val frames = (0 until 6).map(f => gray(9, 7, (x, y) => 20 * x + f))
    val good = frames.map(PpmCodec.encode).reduce(_ ++ _)
    // truncate the last frame's raster: frames 0-4 still emit
    val torn = good.dropRight(5)
    val media = Seq(
      MediaRow(1L, "video/ppm", good, 9, 7, 6),
      MediaRow(2L, "video/ppm", torn, 9, 7, 6)).toDS()
    val all = Multimodal.videoFrameHashes(media, 8, 7)(s)
      .collect().groupBy(_.media_id)
    assert(all(1L).map(_.frame_idx).sorted.toSeq == (0 until 6))
    assert(all(2L).map(_.frame_idx).sorted.toSeq == (0 until 5))
    // same raster → same hash as the single-image dHash path
    val one = Seq(MediaRow(9L, "image/ppm", PpmCodec.encode(frames.head),
      9, 7, 1)).toDS()
    val viaImage = Multimodal.dHash(one, 8, 7)(s).collect().head.dhash
    assert(all(1L).find(_.frame_idx == 0).get.dhash == viaImage)
    // stride keeps every stride-th frame, indices preserved
    val strided = Multimodal.videoFrameHashes(media, 8, 7, stride = 2)(s)
      .collect().filter(_.media_id == 1L).map(_.frame_idx).sorted.toSeq
    assert(strided == Seq(0, 2, 4))
  }

  test("louvainRefineRound moves the bridging node, leaves triangles") {
    // Two triangles {1,2,3} and {4,5,6}; node 7 hangs off the first
    // triangle but starts in its own community. Hand-computed gains:
    // 7→{1,2,3} scores 2m·3 − 3·(9−3+3) = 27 > 0 (moves); any triangle
    // member leaving scores negative (stays); {4,5,6} see no external
    // community at all.
    val und = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L),
      (5L, 6L), (7L, 1L), (7L, 2L), (7L, 3L)).toDF("a", "b")
    val edges = und.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(und.select(col("b").as("src"), col("a").as("dst")))
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L),
      (6L, 4L), (7L, 7L)).toDF("node", "lbl")
    val out = Graphs.louvainRefineRound(edges, labels)
      .orderBy("node").as[(Long, Long, Boolean)].collect().toSeq
    assert(out == Seq((1L, 1L, false), (2L, 1L, false), (3L, 1L, false),
      (4L, 4L, false), (5L, 4L, false), (6L, 4L, false), (7L, 1L, true)))
  }

  test("center-skip 13-gram hash tolerates exactly the center token") {
    def h62(text: String): Seq[Long] = {
      val d = Seq((1L, text)).toDF("doc_id", "text")
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
      TextDedup.ngramHash62SkipCenter(d, "doc_id", "ws", 13)
        .select("h62").as[Long].collect().toSeq
    }
    val base = (1 to 13).map(i => s"w$i").mkString(" ")
    val centerEdit = (1 to 13).map(i => if (i == 7) "XX" else s"w$i")
      .mkString(" ")
    val edgeEdit = (1 to 13).map(i => if (i == 2) "XX" else s"w$i")
      .mkString(" ")
    assert(h62(base).size == 1)
    assert(h62(base) == h62(centerEdit)) // center substitution invisible
    assert(h62(base) != h62(edgeEdit)) // any other position changes it
  }

  private def sym(pairs: (Long, Long)*): org.apache.spark.sql.DataFrame =
    (pairs ++ pairs.map(p => (p._2, p._1))).toDF("src", "dst")

  test("personalizedPageRank ranks by proximity within a degree+parity class") {
    // path 1-2-3-4-5, seed {1}. Truncated-power-iteration PPR mass is
    // degree-weighted AND hop-parity-weighted on bipartite structure,
    // so the robust proximity ordering compares nodes of the SAME
    // degree and SAME distance parity: endpoint 1 (dist 0) beats
    // endpoint 5 (dist 4), interior 2 (dist 1) beats interior 4
    // (dist 3) — at both odd and even round budgets.
    val edges = sym((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val seeds = Seq(Tuple1(1L)).toDF("node")
    Seq(3, 4).foreach { rounds =>
      val r = Graphs.personalizedPageRank(edges, seeds, rounds)
        .orderBy("node").as[(Long, Long)].collect().toMap
        .withDefaultValue(0L)
      assert(r(1L) > r(5L), s"endpoints at rounds=$rounds: $r")
      assert(r(2L) > r(4L), s"interior at rounds=$rounds: $r")
    }
  }

  test("personalizedPageRank with all-node seeds is symmetric on a cycle") {
    // 4-cycle is vertex-transitive: seeding every node must give every
    // node the identical rank (the uniform-PageRank degenerate case)
    val edges = sym((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    val seeds = Seq(1L, 2L, 3L, 4L).map(Tuple1(_)).toDF("node")
    val r = Graphs.personalizedPageRank(edges, seeds, rounds = 3)
      .as[(Long, Long)].collect().toMap
    assert(r.size == 4 && r.values.toSet.size == 1)
  }

  test("personalizedPageRank: walk mass never reaches a disconnected component") {
    // component {1,2} seeded, component {3,4} not: the unreached
    // component carries implicit rank 0 (no rows)
    val edges = sym((1L, 2L), (3L, 4L))
    val seeds = Seq(Tuple1(1L)).toDF("node")
    val r = Graphs.personalizedPageRank(edges, seeds, rounds = 4)
      .as[(Long, Long)].collect().toMap
    assert(r.keySet == Set(1L, 2L))
    // at an even budget the seed holds more mass than its neighbor
    // (odd budgets park the bulk of the walk on the odd-parity side
    // of a bipartite component — expected power-iteration behavior)
    assert(r(1L) > r(2L))
  }
}
