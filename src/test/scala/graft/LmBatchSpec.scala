package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Invariants behind the q202-q212 LM-scoring / linkage / sampling batch.
  * Pure-math pins (no Spark): formula edits fail here before they
  * silently shift an oracle-gated result.
  */
class LmBatchSpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).map(i => g.pureApply(Gen.Parameters.default, Seed(77L + i)))

  test("q202 add-one bigram sums: every doc's familiarity lies in (0, 1]") {
    // sum_num = Σ(c+1) ≥ n_bigrams, sum_den = Σ(cw+V) ≥ Σ(c+1) because
    // each bigram's count c ≤ its context count cw and 1 ≤ V whenever a
    // vocabulary exists — so 0 < familiarity ≤ 1 structurally.
    val gen = for {
      v <- Gen.chooseNum(1, 50) // vocab size
      n <- Gen.chooseNum(1, 40) // bigrams in the scored doc
      cs <- Gen.listOfN(n, Gen.chooseNum(0, 20)) // bigram counts
      ex <- Gen.listOfN(n, Gen.chooseNum(0, 20)) // extra context mass
    } yield (v, cs, ex)
    samples(gen, 300).foreach { case (v, cs, ex) =>
      val num = cs.map(_ + 1L).sum
      val den = cs.zip(ex).map { case (c, e) => c.toLong + e + v }.sum
      assert(num > 0 && den >= num, s"num=$num den=$den v=$v")
      val fam = num.toDouble / den
      assert(fam > 0.0 && fam <= 1.0)
    }
  }

  test("q204 integer-quantized covariance matches double covariance") {
    // (n·Σxy − Σx·Σy)/n² on round(x·10⁶) values must track the direct
    // double population covariance to quantization error (~1e-6 scale).
    val gen = for {
      n <- Gen.chooseNum(2, 60)
      xs <- Gen.listOfN(n, Gen.chooseNum(-500000, 500000))
      ys <- Gen.listOfN(n, Gen.chooseNum(-500000, 500000))
    } yield (xs.map(_.toLong), ys.map(_.toLong))
    samples(gen, 200).foreach { case (xs, ys) =>
      val n = xs.size.toLong
      val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
      val sx = xs.sum; val sy = ys.sum
      val covInt = (BigInt(n) * sxy - BigInt(sx) * sy).toDouble / (n.toDouble * n) / 1e12
      val mx = xs.map(_.toDouble / 1e6).sum / n
      val my = ys.map(_.toDouble / 1e6).sum / n
      val covDbl = xs.zip(ys)
        .map { case (a, b) => (a / 1e6 - mx) * (b / 1e6 - my) }.sum / n
      assert(math.abs(covInt - covDbl) < 1e-6, s"$covInt vs $covDbl")
    }
  }

  test("q205 cross-multiplied ACF equals brute-force Pearson r") {
    val gen = for {
      n <- Gen.chooseNum(10, 80)
      xs <- Gen.listOfN(n, Gen.chooseNum(0, 30))
      l <- Gen.chooseNum(1, 7)
    } yield (xs.map(_.toLong), l)
    samples(gen, 200).foreach { case (xs, l) =>
      val pairs = xs.dropRight(l).zip(xs.drop(l))
      if (pairs.size >= 2) {
        val n = pairs.size.toLong
        val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
        val sxy = pairs.map(p => p._1 * p._2).sum
        val sxx = pairs.map(p => p._1 * p._1).sum
        val syy = pairs.map(p => p._2 * p._2).sum
        val denA = n * sxx - sx * sx; val denB = n * syy - sy * sy
        if (denA > 0 && denB > 0) {
          val acf = (n * sxy - sx * sy).toDouble /
            math.sqrt(denA.toDouble * denB.toDouble)
          // brute force on centered doubles
          val mx = sx.toDouble / n; val my = sy.toDouble / n
          val num = pairs.map(p => (p._1 - mx) * (p._2 - my)).sum
          val da = pairs.map(p => (p._1 - mx) * (p._1 - mx)).sum
          val db = pairs.map(p => (p._2 - my) * (p._2 - my)).sum
          val brute = num / math.sqrt(da * db)
          assert(math.abs(acf - brute) < 1e-9, s"$acf vs $brute")
          assert(acf >= -1.0000000001 && acf <= 1.0000000001)
        }
      }
    }
  }

  test("q207 lift is symmetric and confidence-consistent") {
    // lift(a→b) == lift(b→a) and conf(a→b)·N/sup_b == lift — the two
    // directed emissions of one undirected pair must agree.
    val gen = for {
      n <- Gen.chooseNum(10, 1000)
      sa <- Gen.chooseNum(1, 500)
      sb <- Gen.chooseNum(1, 500)
      sab <- Gen.chooseNum(1, 200)
    } yield (n.toLong, sa.toLong max sab.toLong, sb.toLong max sab.toLong, sab.toLong)
    samples(gen, 300).foreach { case (nRaw, sa, sb, sab) =>
      val n = nRaw max (sa max sb)
      val liftAB = (sab * n).toDouble / (sa * sb)
      val liftBA = (sab * n).toDouble / (sb * sa)
      assert(liftAB == liftBA)
      val confAB = sab.toDouble / sa
      assert(math.abs(confAB * n / sb - liftAB) < 1e-12)
    }
  }

  test("q208 Fellegi-Sunter class thresholds partition the weight line") {
    // With comparator weights {24,-8} and {16,-6} the reachable totals
    // are 40, 18, 8, -14 — link ≥ 30 is exactly both-agree; non-link
    // < 0 is exactly both-disagree.
    val totals = for (a <- Seq(24L, -8L); b <- Seq(16L, -6L)) yield a + b
    assert(totals.toSet == Set(40L, 18L, 8L, -14L))
    assert(totals.count(_ >= 30) == 1)
    assert(totals.count(w => w >= 0 && w < 30) == 2)
    assert(totals.count(_ < 0) == 1)
  }

  test("q209 priority sampling: doubling a weight never worsens its rank") {
    // priority = u div w is antitone in w for fixed u: a heavier row's
    // priority is ≤ its lighter self, so inclusion is weight-monotone.
    val gen = for {
      u <- Gen.chooseNum(0L, (1L << 53) - 1)
      w <- Gen.chooseNum(1L, 1100000L)
    } yield (u, w)
    samples(gen, 500).foreach { case (u, w) =>
      assert(u / (2 * w) <= u / w)
    }
  }

  test("q212 islands merge: segment count equals adjacent-run count") {
    // win_idx − row_number island ids must merge EXACTLY adjacent active
    // windows: segments == number of maximal runs in the sorted index set.
    val gen = Gen.listOf(Gen.chooseNum(0, 30)).map(_.distinct.sorted)
    samples(gen, 300).foreach { idx =>
      val sids = idx.zipWithIndex.map { case (w, rn) => w - (rn + 1) }
      val nSeg = sids.distinct.size
      val runs = idx.foldLeft((0, Int.MinValue)) { case ((acc, prev), w) =>
        (if (w == prev + 1) acc else acc + 1, w)
      }._1
      assert(nSeg == runs, s"idx=$idx")
    }
  }
}
