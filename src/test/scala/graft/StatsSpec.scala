package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Invariants behind the q167-q171 stats batch, checked as pure-Scala
  * properties (no Spark session needed — these pin the MATH the queries
  * rely on, so a threshold/formula edit that breaks completeness fails
  * here before it silently shrinks a result set).
  */
class StatsSpec extends org.scalatest.funsuite.AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).map(i => g.pureApply(Gen.Parameters.default, Seed(1717L + i)))

  // ceil(3m/5) via the pure-integer form both engines use in q167.
  private def ceil35(m: Int): Int = (3 * m + 4) / 5
  private def prefixLen(m: Int): Int = m - ceil35(m) + 1

  test("q167 prefix completeness: J >= 3/5 pairs always share a prefix token") {
    // Token universe ordered by a fixed global ranking (ints ascending =
    // rarest-first stand-in). For set pairs with Jaccard >= 0.6, the
    // intersection must hit BOTH prefixes of length m - ceil(3m/5) + 1,
    // and the length filter 5*min >= 3*max must keep the pair. Generate
    // correlated pairs (random base set + random edits) so the J >= 0.6
    // branch is hit often, not only on identical sets.
    val genPair = for {
      base <- Gen.chooseNum(5, 40).flatMap(n => Gen.pick(n, 0 until 120))
      drops <- Gen.chooseNum(0, 6)
      adds <- Gen.chooseNum(0, 6).flatMap(k => Gen.pick(k, 0 until 120))
    } yield (base.toSet, base.drop(drops).toSet ++ adds)
    var qualifying = 0
    samples(genPair, 400).foreach { case (a, b) =>
      if (a.nonEmpty && b.nonEmpty) {
        val inter = a.intersect(b).size
        val jac = inter.toDouble / (a.size + b.size - inter)
        if (jac >= 0.6 && a != b) {
          qualifying += 1
          val pa = a.toSeq.sorted.take(prefixLen(a.size)).toSet
          val pb = b.toSeq.sorted.take(prefixLen(b.size)).toSet
          assert(pa.intersect(pb).nonEmpty,
            s"prefix filter lost a qualifying pair: a=$a b=$b jac=$jac")
          assert(5 * math.min(a.size, b.size) >= 3 * math.max(a.size, b.size),
            s"length filter lost a qualifying pair: |a|=${a.size} |b|=${b.size} jac=$jac")
        }
      }
    }
    assert(qualifying > 50, s"generator exercised only $qualifying qualifying pairs")
  }

  test("q168 closed-form slope/intercept sit at the least-squares optimum") {
    val genPts = Gen.listOfN(50,
      Gen.zip(Gen.chooseNum(0, 2500), Gen.chooseNum(100L, 60000000L)))
    samples(genPts, 30).foreach { pts =>
      if (pts.map(_._1).distinct.size > 1) {
        val n = pts.size.toDouble
        val sx = pts.map(_._1.toDouble).sum
        val sy = pts.map(_._2.toDouble).sum
        val sxy = pts.map(p => p._1.toDouble * p._2.toDouble).sum
        val sxx = pts.map(p => p._1.toDouble * p._1.toDouble).sum
        val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        val intercept = (sy - slope * sx) / n
        // residual gradient at the closed-form optimum is ~0 (scaled)
        val gSlope = pts.map { case (x, y) => (slope * x + intercept - y) * x }.sum
        val gInt = pts.map { case (x, y) => slope * x + intercept - y }.sum
        val scale = math.max(1.0, pts.map(p => math.abs(p._2.toDouble)).max)
        assert(math.abs(gSlope) / (scale * n * 2500) < 1e-6)
        assert(math.abs(gInt) / (scale * n) < 1e-9)
      }
    }
  }

  test("q171 count-min one-sidedness: min over rows never undercounts") {
    // Simulate the sketch on random streams with the same d=4 shape but
    // w=16 to force heavy collisions: est(k) >= true(k) must still hold.
    val genStream = Gen.listOfN(300, Gen.chooseNum(0, 50))
    samples(genStream, 40).foreach { xs =>
      val d = 4; val w = 16
      def h(row: Int, k: Int): Int = {
        val x = (k * 2654435761L + row * 40503L) & 0xffffffffL
        ((x ^ (x >>> 16)) % w).toInt
      }
      val cms = Array.fill(d, w)(0L)
      xs.foreach(k => (0 until d).foreach(r => cms(r)(h(r, k)) += 1))
      xs.groupBy(identity).foreach { case (k, occ) =>
        val est = (0 until d).map(r => cms(r)(h(r, k))).min
        assert(est >= occ.size, s"CMS undercounted key $k: est=$est true=${occ.size}")
      }
    }
  }

  test("q169 equi-depth ntile contract: leading bins absorb the remainder") {
    samples(Gen.zip(Gen.chooseNum(8, 2000), Gen.chooseNum(2, 16)), 60)
      .foreach { case (n, bins) =>
        if (n >= bins) {
          // both engines' NTILE: first (n mod bins) tiles get ceil(n/bins),
          // the rest floor(n/bins)
          val base = n / bins; val extra = n % bins
          val depths = (1 to bins).map(b => if (b <= extra) base + 1 else base)
          assert(depths.sum == n)
          assert(depths.max - depths.min <= 1)
        }
      }
  }
}
