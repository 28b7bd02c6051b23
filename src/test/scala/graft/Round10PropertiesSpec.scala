package graft

import org.apache.spark.sql.functions._
import graft.operators.GlobalRank

/** Round-10 hardening properties (round-9 verdict item 4 + advice).
  *
  * 1. `GlobalRank.valueAtRank` — the rank→value inversion now underpins
  *    three gates (q363/q374/q375) but its spec covered blockSize=8
  *    only. Here: randomized duplicate-heavy pools × random targets vs
  *    a brute-force sorted-multiset oracle, sweeping
  *    blockSize ∈ {1, 2, 7, 4096} and forcing rank ∈ {1, N} boundaries
  *    into every case. Seeded RNG — deterministic, no flake.
  * 2. The advice-flagged cnt=0 hazard: a zero-count pool row used to
  *    explode a DESCENDING `sequence(...)` into phantom zero-width
  *    intervals that could shadow the correct carry at a block
  *    boundary; valueAtRank now filters them. The property pins that.
  * 3. q333's Qini identity: with the cumulative-count fix (advice
  *    round 9, HIGH), Qini at the FULL population band must equal the
  *    random-targeting baseline's final value — both reduce to
  *    tx_t·10⁶ − (tx_c·tn_t·10⁶) div tn_c when the cumulative counts
  *    cover everything. The old per-band-count bug broke exactly this.
  */
class Round10PropertiesSpec extends SparkSpec {
  import spark.implicits._

  /** Brute-force oracle: the value at 1-based rank t of the sorted
    * multiset. */
  private def oracle(sorted: Vector[Long], t: Int): Long = sorted(t - 1)

  test("valueAtRank == sorted-multiset oracle over random heavy-dup pools, " +
    "blockSize in {1,2,7,4096}, ranks include 1 and N") {
    val rng = new scala.util.Random(101010L)
    for (trial <- 1 to 10) {
      // duplicate-heavy: n values from a domain much smaller than n,
      // occasionally negative, occasionally a single-value pool
      val n = 1 + rng.nextInt(400)
      val domain = if (trial % 4 == 0) 1 else 1 + rng.nextInt(17)
      val vs = Vector.fill(n)(rng.nextInt(domain).toLong - domain / 2)
      val sorted = vs.sorted
      val pool = vs.groupBy(identity).toSeq.map { case (v, xs) =>
        (v, sorted.indexWhere(_ == v).toLong, xs.size.toLong)
      }.toDF("v", "lt", "c")
      // random targets + forced boundaries 1 and N
      val ranks = (Seq(1, n) ++ Seq.fill(12)(1 + rng.nextInt(n))).distinct
      val targets = ranks.map(t => (t.toLong, s"t$t")).toDF("rk", "tag")
      for (b <- Seq(1L, 2L, 7L, 4096L)) {
        val got = GlobalRank.valueAtRank(
            pool, "v", "lt", "c", targets, "rk", "out", blockSize = b)
          .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
        assert(got.size == ranks.size, s"trial=$trial b=$b row count")
        ranks.foreach { t =>
          assert(got(t.toLong) == oracle(sorted, t),
            s"trial=$trial n=$n b=$b rank=$t")
        }
      }
    }
  }

  test("valueAtRank ignores cnt=0 pool rows (no phantom zero-width " +
    "intervals at block boundaries)") {
    // pool: value 10 covers ranks 1..8, value 20 covers 9..16; a cnt=0
    // row for value 15 sits EXACTLY at the rank-8/9 block boundary
    // (lt=8) where, pre-fix, its descending sequence() emitted phantom
    // intervals that could shadow value 20's carry in block 1.
    val pool = Seq(
      (10L, 0L, 8L), (15L, 8L, 0L), (20L, 8L, 8L)
    ).toDF("v", "lt", "c")
    val targets = (1 to 16).map(t => (t.toLong, s"t$t")).toDF("rk", "tag")
    for (b <- Seq(1L, 2L, 8L, 4096L)) {
      val got = GlobalRank.valueAtRank(
          pool, "v", "lt", "c", targets, "rk", "out", blockSize = b)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      (1 to 8).foreach(t => assert(got(t.toLong) == 10L, s"b=$b rank=$t"))
      (9 to 16).foreach(t => assert(got(t.toLong) == 20L, s"b=$b rank=$t"))
    }
  }

  test("q333 Qini(full population) equals the random baseline's final value") {
    val df = graft.queries.ExperimentQueries.defs
      .find(_.name == "q333_uplift_qini").get
      .fn(spark, "/root/testdata/sf0.001")
      .select("band", "qini_ppm", "qini_random_ppm")
      .collect()
    assert(df.nonEmpty)
    // the walk is band-DESC; the FULL-population row is the smallest
    // band (its cumulative counts cover every band)
    val full = df.minBy(_.getLong(0))
    assert(full.getLong(1) == full.getLong(2),
      s"full-population Qini ${full.getLong(1)} != random baseline " +
        s"${full.getLong(2)} — the cumulative-count fix regressed")
  }
}
