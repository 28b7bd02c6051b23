package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Invariants behind the round-9 continuation gates (q358-q363), as
  * pure-Scala properties — pinning the MATH so a lattice or block-size
  * edit fails here before the oracle gate runs.
  */
class Round9cPropertiesSpec extends org.scalatest.funsuite.AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).map(i => g.pureApply(Gen.Parameters.default, Seed(4747L + i)))

  // ---- q359: SCC by transitive-closure squaring ------------------------

  private def square(c: Set[(Int, Int)]): Set[(Int, Int)] =
    c ++ (for ((a, m1) <- c; (m2, b) <- c if m1 == m2) yield (a, b))

  /** Reference reachability via simple fixpoint (no round bound). */
  private def closureRef(e: Set[(Int, Int)]): Set[(Int, Int)] = {
    var c = e; var prev = Set.empty[(Int, Int)]
    while (c != prev) { prev = c; c = square(c) }
    c
  }

  test("q359 five squarings reach the full closure on <=25 nodes; " +
    "mutual-reachability min-partner matches reference SCCs") {
    val gen = for {
      n <- Gen.chooseNum(2, 25)
      m <- Gen.chooseNum(1, 60)
      es <- Gen.listOfN(m, for {
        a <- Gen.chooseNum(0, n - 1); b <- Gen.chooseNum(0, n - 1)
        if a != b
      } yield (a, b))
    } yield es.toSet
    samples(gen, 120).foreach { e =>
      val c5 = Iterator.iterate(e)(square).drop(5).next()
      val ref = closureRef(e)
      assert(c5 === ref, "5 squarings cover length 32 > any 25-node path")
      assert(square(c5) === c5, "converged flag: a 6th compose is a no-op")
      // scc(v) = min(v, min{u : v→u ∧ u→v}) groups exactly the SCCs.
      val nodes = e.flatMap(p => Seq(p._1, p._2))
      val scc = nodes.map { v =>
        val mut = nodes.filter(u => ref((v, u)) && ref((u, v)))
        v -> (mut + v).min
      }.toMap
      nodes.foreach { v =>
        nodes.foreach { u =>
          val same = ref.contains((v, u)) && ref.contains((u, v))
          if (u != v)
            assert((scc(v) == scc(u)) === same,
              s"scc grouping mismatch at ($v,$u)")
        }
      }
    }
  }

  // ---- q363: quantile-normalization rank-block merge -------------------

  /** Reference: pooled sorted multiset indexed directly at rank t. */
  private def pooledAt(sorted: Vector[Long], t: Long): Long =
    sorted((t - 1).toInt)

  test("q363 rank-block merge hands every target its covering pooled " +
    "value (B=8 exercises block-boundary clamps)") {
    val B = 8L
    val gen = for {
      nv <- Gen.chooseNum(1, 40)
      vs <- Gen.listOfN(nv, Gen.chooseNum(0L, 12L)) // heavy ties
    } yield vs
    samples(gen, 200).foreach { vs =>
      val sorted = vs.sorted.toVector
      val n = sorted.size.toLong
      // pooled distinct intervals (v, pclt, pcnt)
      val pool = sorted.groupBy(identity).toSeq.sortBy(_._1).map {
        case (v, xs) => (v, sorted.indexOf(v).toLong, xs.size.toLong)
      }
      // targets: every rank 1..n (superset of any query's t values)
      val targets = (1L to n).toSeq
      // block merge exactly as the query plans it
      val pb = pool.flatMap { case (v, pclt, pcnt) =>
        (pclt / B to (pclt + pcnt - 1) / B).map { b =>
          (b, math.max(pclt + 1, b * B + 1), 0L, pclt, Some(v), None: Option[Long])
        }
      }
      val tb = targets.map(t => ((t - 1) / B, t, 1L, t, None, Some(t)))
      val got = (pb ++ tb).groupBy(_._1).flatMap { case (_, rows) =>
        val sortedRows = rows.sortBy(r => (r._2, r._3, r._4))
        var carry: Option[Long] = None
        sortedRows.flatMap { r =>
          if (r._5.isDefined) { carry = r._5; None }
          else Some(r._6.get -> carry.get)
        }
      }
      targets.foreach { t =>
        assert(got(t) === pooledAt(sorted, t),
          s"rank $t of $sorted mapped to ${got(t)}")
      }
    }
  }

  // ---- q361: Friedman doubled-midrank lattice ---------------------------

  test("q361 doubled midranks sum to 30n per block set; identical " +
    "orderings hit the k=5 maximum chi2 = 4n") {
    val k = 5
    val gen = Gen.chooseNum(2, 40)
    samples(gen, 50).foreach { n =>
      // identical ordering in every block: value of treatment j is j
      val r2 = (1 to k).map { j =>
        // distinct values: cntlt = j-1, cnteq = 1 -> doubled rank 2j
        (2L * j) * n
      }
      assert(r2.sum === 30L * n)
      val s2 = r2.map(x => x * x).sum
      val chi2 = s2.toDouble / (10.0 * n) - 18.0 * n
      assert(math.abs(chi2 - 4.0 * n) < 1e-9,
        s"max chi2 for k=5 is n(k-1)=4n, got $chi2 at n=$n")
    }
    // tie lattice: a fully tied block contributes k * (k+1) doubled mass
    // (every cell: cntlt=0, cnteq=k -> 2*0+k+1 = k+1)
    assert((1 to k).map(_ => k + 1L).sum === 30L) // = k(k+1) at k=5
  }

  // ---- q360: engine-neutral floored grid cells --------------------------

  test("q360 |.|-split cell formula equals floorDiv for signed " +
    "projections") {
    val W = 500000L
    val gen = Gen.chooseNum(-8000000L, 8000000L)
    samples(gen, 500).foreach { p =>
      val cell = if (p < 0) -((-p + W - 1) / W) else p / W
      assert(cell === Math.floorDiv(p, W), s"p=$p")
    }
  }

  // ---- q364: Jonckheere-Terpstra doubled-U lattice -----------------------

  test("q364 distinct-value 2U lattice equals the O(n^2) pairwise count") {
    val k = 3
    val gen = Gen.listOfN(30, for {
      g <- Gen.chooseNum(1, k); v <- Gen.chooseNum(0L, 8L) // heavy ties
    } yield (g, v))
    samples(gen, 150).foreach { xs =>
      // reference: 2U = sum over ordered group pairs of 2*#{x<y} + #{x=y}
      val ref = (for {
        (gi, vi) <- xs; (gj, vj) <- xs
        if gi < gj
      } yield if (vi < vj) 2L else if (vi == vj) 1L else 0L).sum
      // lattice: per distinct v, c_j and cumulative cum_j (values <= v)
      val dv = xs.groupBy(_._2).toSeq.sortBy(_._1).map { case (v, g) =>
        (v, (1 to k).map(j => g.count(_._1 == j).toLong))
      }
      var cum = Vector.fill(k)(0L)
      val n = (1 to k).map(j => xs.count(_._1 == j).toLong)
      var u2 = 0L
      dv.foreach { case (_, cs) =>
        cum = cum.zip(cs).map { case (a, b) => a + b }
        for (j <- 0 until k; l <- (j + 1) until k)
          u2 += cs(j) * (2L * (n(l) - cum(l)) + cs(l))
      }
      assert(u2 === ref, s"on $xs")
    }
  }

  // ---- q366: runs-test exact z^2 identity --------------------------------

  test("q366 integer z^2 equals the float formula on random sign strings") {
    val gen = Gen.listOfN(40, Gen.oneOf(1L, -1L)).suchThat { s =>
      s.contains(1L) && s.contains(-1L)
    }
    samples(gen, 100).foreach { s =>
      val n = s.size.toLong
      val n1 = s.count(_ == 1L).toLong; val n2 = n - n1
      val r = 1L + s.sliding(2).count(p => p.head != p.last)
      val m = 2L * n1 * n2
      if (m > n) {
        val num = r * n - n - m
        val z2int = num * num * (n - 1) * 1000000L / (m * (m - n))
        val e = 1.0 + m.toDouble / n
        val varr = m.toDouble * (m - n) / (n.toDouble * n * (n - 1))
        val z2f = math.pow(r - e, 2) / varr
        assert(math.abs(z2int / 1e6 - z2f) < 1e-3,
          s"z2 int ${z2int / 1e6} vs float $z2f on $s")
      }
    }
  }

  // ---- q370: Cramér V^2 and Goodman-Kruskal λ edge laws ------------------

  test("q370 perfect dependence saturates V2 and λ; independence zeroes " +
    "them") {
    // perfectly dependent 3x3 (diagonal)
    val n = 300L
    val diag = Seq.tabulate(3, 3)((i, j) => if (i == j) 100L else 0L)
    def chi2n(t: Seq[Seq[Long]]): Double = {
      val rs = t.map(_.sum); val cs = t.transpose.map(_.sum)
      val tot = rs.sum.toDouble
      (for (i <- 0 until 3; j <- 0 until 3) yield {
        val e = rs(i) * cs(j) / tot
        math.pow(t(i)(j) - e, 2) / e
      }).sum
    }
    assert(math.abs(chi2n(diag) / (n * 2) - 1.0) < 1e-12) // V^2 = 1
    // λ(col|row) = 1: knowing the row pins the column mode exactly
    val sumRowModes = diag.map(_.max).sum
    val maxCsum = diag.transpose.map(_.sum).max
    assert((sumRowModes - maxCsum).toDouble / (n - maxCsum) === 1.0)
    // independent product table → χ² = 0 and λ = 0
    val prod = Seq.tabulate(3, 3)((i, j) => (i + 1L) * (j + 1L) * 10L)
    assert(chi2n(prod) < 1e-9)
    val srm = prod.map(_.max).sum
    val mc = prod.transpose.map(_.sum).max
    assert(srm === mc) // λ numerator is zero
  }

  // ---- q372: Cohen's κ edge laws -----------------------------------------

  test("q372 κ lattice: identical filters → 1e6 ppm; independent " +
    "margins → 0") {
    def kappaPpm(a: Long, b: Long, c: Long, d: Long): Long = {
      val n = a + b + c + d
      val peNum = (a + b) * (a + c) + (c + d) * (b + d)
      val knum = n * (a + d) - peNum
      val kden = n * n - peNum
      if (kden == 0) 0
      else if (knum < 0) -((-knum) * 1000000L / kden)
      else knum * 1000000L / kden
    }
    assert(kappaPpm(30, 0, 0, 70) === 1000000L)
    // exact product margins: a=pq*n, b=p(1-q)n, ... → κ = 0
    assert(kappaPpm(12, 28, 18, 42) === 0L) // p=0.4 rows, q=0.3 cols, n=100
    val gen = for {
      a <- Gen.chooseNum(0L, 50L); b <- Gen.chooseNum(0L, 50L)
      c <- Gen.chooseNum(0L, 50L); d <- Gen.chooseNum(0L, 50L)
      if a + b + c + d > 0
    } yield (a, b, c, d)
    samples(gen, 200).foreach { case (a, b, c, d) =>
      val k = kappaPpm(a, b, c, d)
      assert(k >= -1000000L && k <= 1000000L, s"κ out of range on $a,$b,$c,$d")
    }
  }

  // ---- q373: Cochran's Q edge laws ---------------------------------------

  test("q373 Q is zero when every treatment has equal successes and " +
    "positive otherwise") {
    val k = 5
    def qNum(cols: Seq[Long]): Long = {
      val t = cols.sum
      (k - 1L) * (k * cols.map(x => x * x).sum - t * t)
    }
    // equal columns → k·ΣC² = T² exactly
    assert(qNum(Seq.fill(k)(7L)) === 0L)
    val gen = Gen.listOfN(k, Gen.chooseNum(0L, 20L))
    samples(gen, 200).foreach { cols =>
      assert(qNum(cols) >= 0L, s"Cauchy-Schwarz violated on $cols")
    }
  }
}
