package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Invariants behind the round-8 q297-q301 batch, checked as pure-Scala
  * properties (no Spark session — these pin the MATH the queries rely
  * on, so a weight/threshold/recurrence edit that silently breaks the
  * contract fails here before the oracle gate ever runs).
  */
class Round8PropertiesSpec extends org.scalatest.funsuite.AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).map(i => g.pureApply(Gen.Parameters.default, Seed(2828L + i)))

  // ---- q299: Shapley subset-weight formula vs permutation definition --

  /** v(S) for the coalition game q299 plays: conversions whose full
    * touch mask is a subset of S. */
  private def v(conv: Map[Int, Long], s: Int): Long =
    conv.collect { case (m, n) if (m & s) == m => n }.sum

  /** 24·φ_i via the query's subset-weight formula (|S|!·(3−|S|)! over
    * subsets avoiding i). */
  private def phi24Formula(conv: Map[Int, Long], bit: Int): Long = {
    val w24 = Array(6L, 2L, 2L, 6L)
    (0 until 16).filter(s => (s & bit) == 0).map { s =>
      w24(Integer.bitCount(s)) * (v(conv, s | bit) - v(conv, s))
    }.sum
  }

  /** 24·φ_i via the DEFINITION: marginal contribution averaged over all
    * 4! = 24 channel orderings. */
  private def phi24Permutations(conv: Map[Int, Long], bit: Int): Long = {
    val bits = Seq(1, 2, 4, 8)
    bits.permutations.map { perm =>
      val before = perm.takeWhile(_ != bit).foldLeft(0)(_ | _)
      v(conv, before | bit) - v(conv, before)
    }.sum
  }

  test("q299 Shapley: subset-weight formula == permutation definition, all channels") {
    val genConv = Gen.listOfN(16, Gen.chooseNum(0L, 50L))
      .map(ns => ns.zipWithIndex.map { case (n, m) => m -> n }.toMap)
    samples(genConv, 200).foreach { conv =>
      for (bit <- Seq(1, 2, 4, 8))
        assert(phi24Formula(conv, bit) === phi24Permutations(conv, bit),
          s"weight formula diverged from permutation definition: $conv bit=$bit")
    }
  }

  test("q299 Shapley: efficiency axiom sum(phi) = v(full) - v(empty)") {
    val genConv = Gen.listOfN(16, Gen.chooseNum(0L, 50L))
      .map(ns => ns.zipWithIndex.map { case (n, m) => m -> n }.toMap)
    samples(genConv, 200).foreach { conv =>
      val total = Seq(1, 2, 4, 8).map(phi24Formula(conv, _)).sum
      assert(total === 24L * (v(conv, 15) - v(conv, 0)),
        s"efficiency axiom violated for $conv")
    }
  }

  test("q299 Shapley: null player earns zero, symmetric players earn equally") {
    // Masks never containing bit 8 (view): view is a null player.
    val conv = Map(0 -> 3L, 1 -> 5L, 2 -> 2L, 3 -> 7L, 5 -> 1L, 7 -> 4L)
    assert(phi24Formula(conv, 8) === 0L)
    // Game symmetric in click(1)/error(2): masks treat 1 and 2 alike.
    val sym = Map(0 -> 2L, 1 -> 3L, 2 -> 3L, 3 -> 6L, 12 -> 5L)
    assert(phi24Formula(sym, 1) === phi24Formula(sym, 2))
  }

  // ---- q300: discrete-Laplace thresholds form the exact CDF ----------

  test("q300 DP thresholds: diffs reproduce P(k) ~ 3^-|k| over D = 26244") {
    val thr = Seq(-8 -> 3L, -7 -> 9L, -6 -> 27L, -5 -> 81L, -4 -> 243L,
      -3 -> 729L, -2 -> 2187L, -1 -> 6561L, 0 -> 19683L, 1 -> 24057L,
      2 -> 25515L, 3 -> 26001L, 4 -> 26163L, 5 -> 26217L, 6 -> 26235L,
      7 -> 26241L, 8 -> 26243L)
    // Strictly ascending, below D.
    thr.map(_._2).sliding(2).foreach { case Seq(a, b) => assert(a < b) }
    assert(thr.last._2 < 26244L)
    // Interior bin masses: P(k)·D = (D/2)·3^−|k| exactly.
    def pD(k: Int): Long = (13122.0 / math.pow(3.0, math.abs(k))).round
    val masses = thr.map(_._2).zip(0L +: thr.map(_._2)).map { case (b, a) => b - a }
    // masses(i) = mass of bin thr(i)._1, except the first (k=-8) and the
    // implicit last (k=+8 = D - F(7)) absorb the clipped tails.
    thr.map(_._1).zip(masses).foreach {
      case (-8, m) => assert(m === 3L) // 2 + tail 1
      case (k, m)  => assert(m === pD(k), s"bin $k mass $m != ${pD(k)}")
    }
    assert(26244L - thr(thr.length - 2)._2 === 3L) // +8 bin: 2 + tail 1
    // Symmetry of interior bins.
    for (k <- 1 to 7)
      assert(thr(8 + k)._2 - thr(7 + k)._2 === thr(8 - k)._2 - (if (k == 8) 0L else thr(7 - k)._2))
  }

  // ---- q301: integer inlier predicate == rational residual test ------

  test("q301 RANSAC: cross-multiplied inlier test matches the rational residual") {
    val gen = for {
      x1 <- Gen.chooseNum(1L, 50L); y1 <- Gen.chooseNum(90000L, 10500000L)
      dx <- Gen.chooseNum(1L, 49L); dy <- Gen.chooseNum(-10000000L, 10000000L)
      x <- Gen.chooseNum(1L, 50L); y <- Gen.chooseNum(90000L, 10500000L)
    } yield (x1, y1, dx, dy, x, y)
    val tol = 1000000L
    samples(gen, 500).foreach { case (x1, y1, dx, dy, x, y) =>
      val intPred = math.abs(dy * (x - x1) - dx * (y - y1)) <= tol * dx
      val resid = math.abs((y - y1).toDouble - dy.toDouble / dx * (x - x1))
      val ratPred = resid <= tol.toDouble + 1e-6 * resid.max(1.0)
      // Exact integer predicate implies the rational one (with fp slack);
      // strict disagreement is only possible inside the fp slack band.
      if (intPred) assert(ratPred,
        s"integer inlier not within rational band: $x1 $y1 $dx $dy $x $y")
      if (resid > tol + 1.0) assert(!intPred,
        s"clear outlier passed the integer test: $x1 $y1 $dx $dy $x $y")
    }
  }

  test("q301 RANSAC: anchor normalization preserves the line and makes dx > 0") {
    val gen = for {
      xa <- Gen.chooseNum(1L, 50L); ya <- Gen.chooseNum(90000L, 10500000L)
      xs <- Gen.chooseNum(1L, 50L); ys <- Gen.chooseNum(90000L, 10500000L)
      if xs != xa
    } yield (xa, ya, xs, ys)
    samples(gen, 300).foreach { case (xa, ya, xs, ys) =>
      val (x1, y1, dx, dy) =
        if (xs < xa) (xs, ys, xa - xs, ya - ys) else (xa, ya, xs - xa, ys - ya)
      assert(dx > 0)
      // Both original points lie exactly on the normalized line.
      assert(dy * (xa - x1) - dx * (ya - y1) === 0L)
      assert(dy * (xs - x1) - dx * (ys - y1) === 0L)
    }
  }

  // ---- q297: Holt-Winters fold invariants ----------------------------

  /** The exact q297 fold (α=.4, β=.2, γ=.3), position-mod-7 seasonal. */
  private def hwFold(xs: Seq[Double]): (Double, Double, Array[Double]) = {
    var l = 0.0; var b = 0.0; val sv = new Array[Double](7); var n = 0L
    xs.foreach { x =>
      if (n == 0L) { l = x; b = 0.0 }
      else {
        val idx = (n % 7).toInt
        val l1 = 0.4 * (x - sv(idx)) + 0.6 * (l + b)
        b = 0.2 * (l1 - l) + 0.8 * b
        sv(idx) = 0.3 * (x - l1) + 0.7 * sv(idx)
        l = l1
      }
      n += 1
    }
    (l, b, sv)
  }

  test("q297 Holt-Winters: constant series is an exact fixed point") {
    for (c <- Seq(1.0, 12345.0, 9.9e8); len <- Seq(1, 7, 50)) {
      val (l, b, sv) = hwFold(Seq.fill(len)(c))
      assert(l === c && b === 0.0 && sv.forall(_ === 0.0),
        s"constant series drifted: c=$c len=$len l=$l b=$b")
    }
  }

  test("q297 Holt-Winters: seasonal slot only updates at its own positions") {
    val gen = Gen.listOfN(40, Gen.chooseNum(1000, 2000000).map(_.toDouble))
    samples(gen, 100).foreach { xs =>
      // Fold prefixes; slot j may only change at steps i with i%7 == j, i>0.
      var prev = hwFold(xs.take(1))._3.clone()
      for (i <- 1 until xs.length) {
        val cur = hwFold(xs.take(i + 1))._3
        for (j <- 0 until 7 if j != i % 7)
          assert(cur(j) === prev(j),
            s"slot $j changed at position $i (i%7=${i % 7})")
        prev = cur.clone()
      }
    }
  }

  // ---- q298: DiD contrast sanity -------------------------------------

  private def meanMicro(sum: Long, n: Long): Long = sum * 1000000L / n

  private def did(cells: Map[(Int, Int), (Long, Long)]): Long = {
    def m(t: Int, p: Int): Long = {
      val (s, n) = cells((t, p)); meanMicro(s, n)
    }
    (m(1, 1) - m(1, 0)) - (m(0, 1) - m(0, 0))
  }

  test("q298 DiD: identical groups => zero estimate; group swap flips sign") {
    val gen = for {
      s0 <- Gen.chooseNum(1000000L, 900000000L); n0 <- Gen.chooseNum(10L, 9000L)
      s1 <- Gen.chooseNum(1000000L, 900000000L); n1 <- Gen.chooseNum(10L, 9000L)
      s2 <- Gen.chooseNum(1000000L, 900000000L); n2 <- Gen.chooseNum(10L, 9000L)
      s3 <- Gen.chooseNum(1000000L, 900000000L); n3 <- Gen.chooseNum(10L, 9000L)
    } yield ((s0, n0), (s1, n1), (s2, n2), (s3, n3))
    samples(gen, 300).foreach { case (c00, c01, c10, c11) =>
      val same = Map((0, 0) -> c00, (0, 1) -> c01, (1, 0) -> c00, (1, 1) -> c01)
      assert(did(same) === 0L, s"identical groups gave nonzero DiD: $c00 $c01")
      val base = Map((0, 0) -> c00, (0, 1) -> c01, (1, 0) -> c10, (1, 1) -> c11)
      val swapped = Map((0, 0) -> c10, (0, 1) -> c11, (1, 0) -> c00, (1, 1) -> c01)
      assert(did(base) === -did(swapped), s"group swap did not negate: $base")
    }
  }
}
