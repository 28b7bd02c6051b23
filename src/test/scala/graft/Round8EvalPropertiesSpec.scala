package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Invariants behind the round-8 evaluation/analytics batch
  * (q302-q313), as pure-Scala properties — pinning the MATH so a
  * lattice or weight edit fails here before the oracle gate runs.
  */
class Round8EvalPropertiesSpec extends org.scalatest.funsuite.AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).map(i => g.pureApply(Gen.Parameters.default, Seed(3131L + i)))

  // ---- q313: tie-corrected rank-sum AUC --------------------------------

  /** 2U over score groups (pos, neg), exactly the query's lattice. */
  private def u2(groups: Seq[(Double, Long, Long)]): Long = {
    val sorted = groups.sortBy(_._1)
    var cumNeg = 0L; var acc = 0L
    sorted.foreach { case (_, p, n) =>
      acc += p * (2 * cumNeg + n); cumNeg += n
    }
    acc
  }

  test("q313 AUC: label flip complements, perfect separation saturates") {
    val gen = Gen.listOfN(12,
      for {
        s <- Gen.chooseNum(1, 1000)
        p <- Gen.chooseNum(0L, 50L); n <- Gen.chooseNum(0L, 50L)
      } yield (s.toDouble, p, n))
    samples(gen, 200).foreach { raw =>
      val g = raw.groupBy(_._1).map { case (s, xs) =>
        (s, xs.map(_._2).sum, xs.map(_._3).sum)
      }.toSeq
      val pTot = g.map(_._2).sum; val nTot = g.map(_._3).sum
      if (pTot > 0 && nTot > 0) {
        // Flipping pos/neg roles complements: U2 + U2' = 2·P·N.
        val flipped = g.map { case (s, p, n) => (s, n, p) }
        assert(u2(g) + u2(flipped) === 2 * pTot * nTot,
          s"flip complement failed on $g")
        // All positives strictly above all negatives → AUC = 1.
        val perfect = Seq((1.0, 0L, nTot), (2.0, pTot, 0L))
        assert(u2(perfect) === 2 * pTot * nTot)
        // All mass on one score (pure ties) → AUC = 1/2.
        val tied = Seq((1.0, pTot, nTot))
        assert(u2(tied) === pTot * nTot)
      }
    }
  }

  // ---- q309: modularity bounds on the exact ppm lattice ----------------

  test("q309 modularity: ppm lattice stays within [-0.5, 1] on real partitions") {
    // REAL random graphs + random partitions (arbitrary (deg, intra)
    // tuples are not realizable community stats and can escape the
    // bound): undirected edges over 8 nodes, each node assigned one of
    // 3 communities; per-community degree/intra derive from the
    // directed edge list exactly as the query does.
    val gen = for {
      edges <- Gen.nonEmptyListOf(
        Gen.zip(Gen.chooseNum(0, 7), Gen.chooseNum(0, 7))
          .suchThat { case (a, b) => a != b })
      labels <- Gen.listOfN(8, Gen.chooseNum(0, 2))
    } yield (edges.distinct, labels)
    samples(gen, 200).foreach { case (und, labels) =>
      val directed = und.flatMap { case (a, b) => Seq((a, b), (b, a)) }
        .distinct
      val m2 = directed.size.toLong
      val byComm = directed.groupBy { case (a, _) => labels(a) }
      val q = byComm.values.map { es =>
        val deg = es.size.toLong
        val intra = es.count { case (a, b) => labels(a) == labels(b) }
          .toLong
        (intra * 1000000L) / m2 - (deg * deg * 1000000L) / (m2 * m2)
      }.sum
      // Floor-division truncation costs at most |C| ppm below the
      // analytic bound Q ∈ [-1/2, 1].
      assert(q >= -500003L && q <= 1000000L,
        s"Q out of bounds: $q edges=$und labels=$labels")
      // One community holding everything: e_c = m2, d_c = m2 → Q = 0.
      val qOne = (m2 * 1000000L) / m2 - (m2 * m2 * 1000000L) / (m2 * m2)
      assert(qOne === 0L)
    }
  }

  // ---- q307: CEM ATT zero-effect and pruning identities ----------------

  test("q307 CEM: identical treated/control outcomes give ATT = 0") {
    val gen = Gen.listOfN(8, for {
      mt <- Gen.chooseNum(1L, 50L); mc <- Gen.chooseNum(1L, 50L)
      mean <- Gen.chooseNum(1000L, 1000000L)
    } yield (mt, mc, mean))
    samples(gen, 200).foreach { strata =>
      // Same per-unit outcome in both arms of every stratum.
      val num = strata.map { case (mt, mc, mean) =>
        val st = mt * mean; val sc = mc * mean
        mt * ((st * 1000000L) / mt - (sc * 1000000L) / mc)
      }.sum
      assert(num === 0L, s"nonzero ATT numerator on null effect: $strata")
    }
  }

  // ---- q312: complement-trick identity ---------------------------------

  test("q312 CV: fold complements partition the corpus exactly") {
    val gen = Gen.listOfN(40, Gen.chooseNum(0, 4))
    samples(gen, 200).foreach { folds =>
      val perFold = folds.groupBy(identity).map { case (f, xs) =>
        f -> xs.size.toLong
      }
      val global = folds.size.toLong
      // Each fold's training size = global - fold size; across the 5
      // folds, training masses sum to 4x the corpus.
      val trainSum = (0 to 4).map(f =>
        global - perFold.getOrElse(f, 0L)).sum
      assert(trainSum === 4L * global)
    }
  }

  // ---- q310: stump lattice sanity --------------------------------------

  test("q310 stump: a pure split scores gini 0 and majority accuracy 1e6") {
    val gen = for {
      nl <- Gen.chooseNum(1L, 100000L); nr <- Gen.chooseNum(1L, 100000L)
    } yield (nl, nr)
    samples(gen, 200).foreach { case (nl, nr) =>
      // Left node all class A, right node all class B.
      val sl2 = nl * nl; val sr2 = nr * nr
      val gini = ((nl * nl - sl2) * nr + (nr * nr - sr2) * nl) * 1000000L /
        ((nl + nr) * nl * nr)
      assert(gini === 0L)
      val acc = ((nl + nr) * 1000000L) / (nl + nr)
      assert(acc === 1000000L)
    }
  }

  // ---- q300/q308: affine remix keeps the u32 lattice in range ----------

  test("q308 replicate hashes stay in [0, 2^32) and cover both assignment outcomes") {
    val gen = for {
      u <- Gen.chooseNum(0L, 4294967295L)
      r <- Gen.chooseNum(0L, 127L)
    } yield (u, r)
    var assigned = 0; var skipped = 0
    samples(gen, 500).foreach { case (u, r) =>
      val h = math.floorMod(u * (r * 2 + 1) + r * 2654435761L, 4294967296L)
      assert(h >= 0L && h < 4294967296L)
      // Bernoulli threshold at 20%: h·M < M_T·2^32 with M=5, M_T=1.
      if (h * 5 < 4294967296L) assigned += 1 else skipped += 1
    }
    assert(assigned > 30 && skipped > 300,
      s"assignment split degenerate: $assigned vs $skipped")
  }
}
