package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property pins for the distributed two-level tricks: each must equal
  * its brute-force definition on random inputs. The oracle gate proves
  * them on ONE corpus; these prove the algebra (band boundaries, clip
  * edges, tie cases) on many. */
class SweepPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).map(i => g.pureApply(Gen.Parameters.default, Seed(4242L + i)))

  private val points = Gen.listOfN(40,
    Gen.zip(Gen.choose(0L, 500L), Gen.choose(0L, 50L)))

  test("banded Pareto frontier equals the all-pairs definition") {
    samples(points, 8).foreach { ps =>
      val rows = ps.zipWithIndex.map { case ((price, size), i) =>
        (i.toLong, price, size)
      }
      if (rows.nonEmpty) {
        // brute force: p on frontier iff no q strictly cheaper AND smaller
        val expected = rows.filter { case (_, p, sz) =>
          !rows.exists { case (_, p2, s2) => p2 < p && s2 < sz }
        }.map(_._1).toSet

        val df = rows.toDF("id", "price_cents", "psize")
        val banded = df.withColumn("band", expr("price_cents div 100"))
        val bandMin = banded.groupBy(col("band")).agg(min(col("psize")).as("band_min"))
        val wBands = Window.orderBy(col("band")).rowsBetween(Window.unboundedPreceding, -1)
        val prefix = bandMin.withColumn("prev_min", min(col("band_min")).over(wBands))
          .select(col("band"), col("prev_min"))
        val wLocal = Window.partitionBy(col("band")).orderBy(col("price_cents"))
          .rangeBetween(Window.unboundedPreceding, -1)
        val got = banded.join(prefix, Seq("band"))
          .withColumn("local_min", min(col("psize")).over(wLocal))
          .withColumn("min_cheaper",
            least(coalesce(col("local_min"), lit(Long.MaxValue)),
              coalesce(col("prev_min"), lit(Long.MaxValue))))
          .where(col("min_cheaper") >= col("psize"))
          .select("id").as[Long].collect().toSet
        assert(got == expected)
      }
    }
  }

  // duration capped at one day: the clip+spill contract covers sessions
  // shorter than the partition span (q103's are 30 minutes)
  private val intervals = Gen.listOfN(30,
    Gen.zip(Gen.choose(0L, 200000L), Gen.choose(1L, 86400L))) // start-sec, dur-sec

  test("clipped per-day line sweep equals the brute-force concurrency scan") {
    samples(intervals, 8).foreach { iv =>
      if (iv.nonEmpty) {
        val rows = iv.map { case (st, dur) => (st, st + dur) } // [st, en) seconds
        // brute force per day (86400s): max over event points of overlap
        // count among day-clipped intervals, end-exclusive
        val daySpan = 86400L
        val expected = rows.flatMap { case (st, en) =>
          (st / daySpan) to ((en - 1) / daySpan)
        }.distinct.sorted.map { day =>
          val d0 = day * daySpan; val d1 = d0 + daySpan
          val clipped = rows.map { case (st, en) =>
            (math.max(st, d0), math.min(en, d1))
          }.filter { case (a, b) => b > a }
          val pts = clipped.flatMap { case (a, b) => Seq(a, b) }.distinct
          val mx = pts.map(t => clipped.count { case (a, b) => a <= t && t < b }).max
          day -> mx.toLong
        }.toMap

        val df = rows.toDF("st", "en")
        val clipped = df
          .withColumn("d1", expr("st div 86400"))
          .withColumn("midnight", (col("d1") + 1) * 86400L)
          .select(array(
              struct(col("d1").as("day"), col("st").as("t0"),
                least(col("en"), col("midnight")).as("t1")),
              struct((col("d1") + 1).as("day"), col("midnight").as("t0"),
                col("en").as("t1"))).as("ivs"))
          .select(explode(col("ivs")).as("iv"))
          .select(col("iv.day"), col("iv.t0"), col("iv.t1"))
          .where(col("t1") > col("t0"))
        val points = clipped.select(
            array(struct(col("day"), col("t0").as("t"), lit(1L).as("delta")),
              struct(col("day"), col("t1").as("t"), lit(-1L).as("delta"))).as("ps"))
          .select(explode(col("ps")).as("p"))
          .select(col("p.day"), col("p.t"), col("p.delta"))
        val w = Window.partitionBy(col("day")).orderBy(col("t"), col("delta"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val got = points.withColumn("run", sum(col("delta")).over(w))
          .groupBy(col("day")).agg(max(col("run")).as("mx"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got == expected, s"got=$got expected=$expected")
      }
    }
  }

  test("weighted median satisfies its defining inequality") {
    val gen = Gen.listOfN(25, Gen.zip(Gen.choose(0L, 100L), Gen.choose(0L, 5L)))
    samples(gen, 8).foreach { xs =>
      if (xs.nonEmpty && xs.map(_._2).sum > 0) {
        val rows = xs.zipWithIndex.map { case ((v, wt), i) => (i.toLong, v, wt) }
        val tot = rows.map(_._3).sum
        val df = rows.toDF("id", "v", "w")
        val wCum = Window.orderBy(col("v"), col("id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cum = df.withColumn("cumw", sum(col("w")).over(wCum))
          .where(col("cumw") * 2 >= lit(tot))
        val got = cum.orderBy(col("v"), col("id")).select("v").as[Long].head()
        // defining property: weight at-or-below got ≥ tot/2 AND weight
        // at-or-above got ≥ tot/2 (under the (v, id) total order pick)
        val below = rows.filter(_._2 <= got).map(_._3).sum
        val above = rows.filter(_._2 >= got).map(_._3).sum
        assert(below * 2 >= tot, s"median=$got below=$below tot=$tot")
        assert(above * 2 >= tot, s"median=$got above=$above tot=$tot")
      }
    }
  }
}
