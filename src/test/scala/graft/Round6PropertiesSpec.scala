package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Pure-JVM property pins for the round-6 math (no Spark session):
  *
  *  - q242's minimax closed form max_{j≤i} min_{k≥i} avg(j..k) must equal
  *    the classic pool-adjacent-violators merge on random bin histograms —
  *    the two constructions are provably the same isotonic fit; the pin
  *    protects the floor-commutes-with-minimax argument the query relies
  *    on (fitted values compared on the floor'd ppm lattice).
  *  - q250's lcm(1..10)=2520 reciprocal lattice must reproduce the exact
  *    rational Σ1/r on any rank multiset (BigDecimal cross-check).
  *  - q246's typed-Aggregator buffer merge must be associative and
  *    commutative with reduce-consistency — the partial-agg contract that
  *    makes the typed path partition-split-invariant.
  */
class Round6PropertiesSpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).map(i => g.pureApply(Gen.Parameters.default, Seed(6262L + i)))

  // --- q242: PAVA vs minimax on the ppm lattice ---

  /** Classic PAVA: merge adjacent pools while a later pool's mean is below
    * an earlier one's; returns per-bin (num, den) pool means as rationals. */
  private def pavaPools(y: Seq[Long], c: Seq[Long]): Seq[(Long, Long)] = {
    case class Pool(num: Long, den: Long, width: Int)
    val stack = scala.collection.mutable.ArrayBuffer.empty[Pool]
    for (i <- y.indices) {
      var cur = Pool(y(i), c(i), 1)
      // merge while previous mean > current mean (cross-multiplied)
      while (stack.nonEmpty &&
        stack.last.num * cur.den > cur.num * stack.last.den) {
        val p = stack.remove(stack.size - 1)
        cur = Pool(p.num + cur.num, p.den + cur.den, p.width + cur.width)
      }
      stack += cur
    }
    stack.toSeq.flatMap(p => Seq.fill(p.width)((p.num, p.den)))
  }

  private def minimaxPpm(y: Seq[Long], c: Seq[Long]): Seq[Long] = {
    val n = y.length
    val sy = y.scanLeft(0L)(_ + _)
    val sc = c.scanLeft(0L)(_ + _)
    (0 until n).map { i =>
      (0 to i).map { j =>
        (i until n).map { k =>
          1000000L * (sy(k + 1) - sy(j)) / (sc(k + 1) - sc(j))
        }.min
      }.max
    }
  }

  private val hist = Gen.choose(3, 12).flatMap { n =>
    Gen.zip(
      Gen.listOfN(n, Gen.choose(0L, 40L)),
      Gen.listOfN(n, Gen.choose(1L, 50L)))
  }

  test("q242 minimax closed form equals classic PAVA on the ppm lattice") {
    samples(hist, 60).foreach { case (posRaw, cntRaw) =>
      val c = cntRaw
      val y = posRaw.zip(c).map { case (p, ci) => math.min(p, ci) } // pos ≤ count
      val viaPava = pavaPools(y, c).map { case (num, den) => 1000000L * num / den }
      val viaMinimax = minimaxPpm(y, c)
      assert(viaMinimax == viaPava,
        s"y=$y c=$c minimax=$viaMinimax pava=$viaPava")
    }
  }

  test("q242 fitted curve is monotone non-decreasing") {
    samples(hist, 60).foreach { case (posRaw, cntRaw) =>
      val c = cntRaw
      val y = posRaw.zip(c).map { case (p, ci) => math.min(p, ci) }
      val fit = minimaxPpm(y, c)
      assert(fit.zip(fit.tail).forall { case (a, b) => a <= b })
    }
  }

  // --- q250: 2520 lattice == exact rational reciprocal sum ---

  test("q250 reciprocal-rank lattice is exact for ranks 1..10") {
    val ranks = Gen.listOfN(30, Gen.choose(1L, 10L))
    samples(ranks, 40).foreach { rs =>
      val latticeNum = rs.map(2520L / _).sum // each divides exactly
      // independent reference: exact gcd-normalized fraction accumulation
      def norm(n: BigInt, d: BigInt): (BigInt, BigInt) = {
        val g = n.gcd(d); (n / g, d / g)
      }
      val (en, ed) = rs.foldLeft((BigInt(0), BigInt(1))) {
        case ((n, d), r) => norm(n * r + d, d * r)
      }
      assert(norm(BigInt(latticeNum), BigInt(2520)) == ((en, ed)))
      rs.foreach(r => assert(2520L % r == 0L))
    }
  }

  // --- q246: moment-buffer merge laws ---

  test("q246 moment buffer merge is associative, commutative, reduce-consistent") {
    import graft.queries.StatsQueries.{DollarMoments => M, MomentBuf}
    val xs = Gen.listOfN(24, Gen.choose(0L, 600000L))
    samples(xs, 40).foreach { vals =>
      val (a, b) = vals.splitAt(vals.size / 2)
      val (b1, b2) = b.splitAt(b.size / 2)
      def fold(v: Seq[Long]): MomentBuf = v.foldLeft(M.zero)(M.reduce)
      val fa = fold(a); val f1 = fold(b1); val f2 = fold(b2)
      assert(M.merge(fa, M.merge(f1, f2)) == M.merge(M.merge(fa, f1), f2))
      assert(M.merge(fa, f1) == M.merge(f1, fa))
      assert(M.merge(fa, M.merge(f1, f2)) == fold(vals))
    }
  }
}
