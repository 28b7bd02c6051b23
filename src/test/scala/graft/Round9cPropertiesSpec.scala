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
}
