package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Invariants behind the q189-q201 robust-stats/activity batch. The math
  * pins run without Spark (formula edits fail here before they silently
  * shift an oracle-gated result); the session_window pin drives the real
  * MergingSessions operator on a boundary fixture because the <=-vs-<
  * merge contract is exactly what the q199 gate relies on.
  */
class RobustStatsSpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).map(i => g.pureApply(Gen.Parameters.default, Seed(4242L + i)))

  test("q191 doubled tie-averaged ranks reproduce brute-force Mann-Whitney") {
    // r2(v) = 2*cntlt(v) + cnt(v) + 1 summed over one arm must equal twice
    // the classic tie-averaged rank sum; and U2_t + U2_c == 2*nc*nt.
    val gen = for {
      nc <- Gen.chooseNum(1, 30)
      nt <- Gen.chooseNum(1, 30)
      cs <- Gen.listOfN(nc, Gen.chooseNum(0, 15))
      ts <- Gen.listOfN(nt, Gen.chooseNum(0, 15))
    } yield (cs, ts)
    samples(gen, 300).foreach { case (cs, ts) =>
      val all = (cs.map((_, 'c')) ++ ts.map((_, 't'))).sortBy(_._1)
      // brute-force tie-averaged doubled ranks: rank block [i..j] of equal
      // values gets doubled-rank (i+1)+(j+1) each (1-based min+max)
      val doubled = all.zipWithIndex.map { case ((v, a), _) =>
        val lo = all.indexWhere(_._1 == v) + 1
        val hi = all.lastIndexWhere(_._1 == v) + 1
        (a, lo + hi)
      }
      val r2tBrute = doubled.collect { case ('t', r2) => r2.toLong }.sum
      // formula path: per distinct v, cntlt then r2 = 2*cntlt + cnt + 1
      val r2tFormula = ts.groupBy(identity).map { case (v, g) =>
        val cntlt = all.count(_._1 < v).toLong
        val cnt = all.count(_._1 == v).toLong
        g.size.toLong * (2 * cntlt + cnt + 1)
      }.sum
      assert(r2tBrute == r2tFormula)
      val (nc, nt) = (cs.size.toLong, ts.size.toLong)
      val u2t = r2tFormula - nt * (nt + 1)
      val r2cFormula = cs.groupBy(identity).map { case (v, g) =>
        val cntlt = all.count(_._1 < v).toLong
        val cnt = all.count(_._1 == v).toLong
        g.size.toLong * (2 * cntlt + cnt + 1)
      }.sum
      val u2c = r2cFormula - nc * (nc + 1)
      assert(u2t + u2c == 2 * nc * nt)
    }
  }

  test("q189 Gini rank-sum is invariant to ordering within tie blocks") {
    // sum(i*x_i) over a tie block is the block's x times sum(i) — any
    // permutation of equal values yields the same statistic. Check by
    // shuffling tie order with different tiebreaks.
    val gen = Gen.listOfN(25, Gen.chooseNum(0L, 5L))
    samples(gen, 200).foreach { xs =>
      def giniNum(sorted: Seq[Long]): BigInt = {
        val n = BigInt(sorted.size)
        val s0 = sorted.map(BigInt(_)).sum
        val s1 = sorted.zipWithIndex.map { case (x, i) => BigInt(i + 1) * x }.sum
        2 * s1 - (n + 1) * s0
      }
      val a = xs.sorted
      val b = xs.zipWithIndex.sortBy { case (x, i) => (x, -i) }.map(_._1)
      assert(giniNum(a) == giniNum(b))
      assert(giniNum(a) >= 0)
    }
  }

  test("q194 integer MAD rule agrees with the exact rational rule") {
    // 20000*dev2 > 44478*mad4 must equal dev2/2 > 3*1.4826*(mad4/4)
    // computed in exact rationals (4.4478 = 44478/10000).
    val gen = for {
      dev2 <- Gen.chooseNum(0L, 4000000000L)
      mad4 <- Gen.chooseNum(0L, 4000000000L)
    } yield (dev2, mad4)
    samples(gen, 500).foreach { case (dev2, mad4) =>
      val intRule = BigInt(20000) * dev2 > BigInt(44478) * mad4
      val rationalRule = BigInt(dev2) * 2 * 10000 > BigInt(44478) * mad4
      assert(intRule == rationalRule)
    }
  }

  test("q199 session_window merges at exactly the gap and splits past it") {
    import spark.implicits._
    // events at 0s, 1800s (exactly the 30-min gap: merges), then 3601s
    // (1801s after the second: new session)
    val df = Seq(
      (1L, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(1704067200L))),
      (1L, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(1704067200L + 1800))),
      (1L, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(1704067200L + 3601))))
      .toDF("user_id", "ts")
    val sess = df.groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("session_window.start")).as("st"),
        unix_micros(col("session_window.end")).as("en"), col("n"))
      .orderBy(col("st"))
      .collect()
    assert(sess.length == 2)
    assert(sess(0).getLong(2) == 2) // first two events merged
    assert(sess(0).getLong(1) == (1704067200L + 1800 + 1800) * 1000000L) // end = last + gap
    assert(sess(1).getLong(2) == 1)
    // the islands oracle uses strict > on the gap: same contract
    val gaps = Seq(1800L -> true, 1801L -> false)
    gaps.foreach { case (gap, merged) =>
      val d2 = Seq(
        (1L, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(1704067200L))),
        (1L, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(1704067200L + gap))))
        .toDF("user_id", "ts")
      val n = d2.groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1))).count()
      assert((n == 1) == merged, s"gap=$gap")
    }
  }

  test("q201 growth accounting: actives(m) == new + retained + resurrected") {
    import spark.implicits._
    val am = Seq(
      // customer 1: months 1,2,4 (new@1, retained@2, churn@3, resurrected@4, churn@5)
      (1L, 1L), (1L, 2L), (1L, 4L),
      // customer 2: month 2 only (new@2, churn@3)
      (2L, 2L))
      .toDF("ck", "ym")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("ck")).orderBy(col("ym"))
    val lagged = am
      .withColumn("prev_ym", lag(col("ym"), 1).over(w))
      .withColumn("next_ym", lead(col("ym"), 1).over(w))
    val cls = lagged.select(col("ym"),
      when(col("prev_ym").isNull, lit("new"))
        .when(col("prev_ym") === col("ym") - 1, lit("retained"))
        .otherwise(lit("resurrected")).as("cls"))
      .groupBy(col("ym")).pivot("cls", Seq("new", "retained", "resurrected"))
      .count().na.fill(0L).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(cls(1L) == ((1L, 0L, 0L)))
    assert(cls(2L) == ((1L, 1L, 0L)))
    assert(cls(4L) == ((0L, 0L, 1L)))
    val churn = lagged.where(col("next_ym").isNull || col("next_ym") > col("ym") + 1)
      .groupBy((col("ym") + 1).as("ym")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(churn == Map(3L -> 2L, 5L -> 1L))
    // identity: per month, actives == new + retained + resurrected
    val actives = am.groupBy("ym").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    actives.foreach { case (m, a) =>
      val (nw, rt, rs) = cls(m); assert(a == nw + rt + rs)
    }
  }
}
