package graft

import org.apache.spark.sql.functions._
import scala.util.Random

/** Spark-backed pins for the round-7 operators:
  *
  *  - AsOfJoin.nearestAtTime must equal the naive pair-join argmin
  *    (|Δt| asc, before-side first, tiebreak asc) on random key-grouped
  *    timelines — including keys with no candidates at all.
  *  - q276's SPRT fold contract: the mapPartitions walk must equal a
  *    window-cumsum reference (stopping index = first |cum| crossing) —
  *    the same lattice the DuckDB oracle uses.
  *  - q275's chain invariants on the real sf0.001 corpus: every
  *    non-absorbing row of the base chain sums to ≤ 10⁶ ppm (floor loss
  *    only), and each removal variant's conversion mass never exceeds
  *    the base chain's (removing a channel can only destroy paths).
  */
class Round7PropertiesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("nearestAtTime equals the naive argmin join on random timelines") {
    val rnd = new Random(7101)
    import spark.implicits._
    val left = (1 to 120).map(i =>
      (rnd.nextInt(12).toLong, i.toLong, rnd.nextInt(1000).toLong))
      .toDF("k", "lid", "lts")
    val right = (1 to 150).map(i =>
      (rnd.nextInt(15).toLong, i.toLong, rnd.nextInt(1000).toLong))
      .toDF("k", "rid", "rts")
    // operator: timestamps as epoch-micros timestamps
    val lT = left.select(col("k"), col("lid"),
      timestamp_micros(col("lts")).as("lts"))
    val rT = right.select(col("k"), col("rid"),
      timestamp_micros(col("rts")).as("rts"))
    val got = graft.operators.AsOfJoin
      .nearestAtTime(lT, rT, Seq("k"), col("lts"), col("rts"), "rid")
      .select(col("k"), col("lid"), col("rid"))
      .orderBy(col("k"), col("lid"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2)))
    // naive reference
    val lc = left.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val rc = right.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = lc.map { case (k, lid, lts) =>
      val cands = rc.filter(_._1 == k)
      if (cands.isEmpty) (k, lid, -1L)
      else {
        val best = cands.minBy { case (_, rid, rts) =>
          (math.abs(rts - lts), if (rts <= lts) 0 else 1, rid)
        }
        (k, lid, best._2)
      }
    }.sortBy(t => (t._1, t._2))
    assert(got.toSeq == want.toSeq)
  }

  test("SPRT fold equals the window-cumsum reference") {
    val rnd = new Random(7102)
    import spark.implicits._
    val a = 200671L; val b = -50011L; val bound = 2944439L
    // adversarial small bound exercised too via scaling factor
    val obs = (1 to 4000).map { i =>
      (rnd.nextInt(8).toLong, i.toLong, if (rnd.nextInt(5) == 0) 1L else 0L)
    }
    val df = obs.toDF("exp", "seq", "succ")
    // window reference
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("exp")).orderBy(col("seq"))
    val cum = df.withColumn("inc",
        when(col("succ") === 1, lit(a)).otherwise(lit(b)))
      .withColumn("cum", sum(col("inc")).over(
        w.rowsBetween(Long.MinValue, 0)))
      .withColumn("rn", row_number().over(w))
    val crossed = cum.where(abs(col("cum")) >= bound)
      .groupBy(col("exp")).agg(min(col("rn")).as("n_at"))
    val ref = cum.groupBy(col("exp"))
      .agg(count(lit(1)).as("n"), max(col("rn")).as("mx"))
      .join(crossed, Seq("exp"), "left")
      .select(col("exp"), coalesce(col("n_at"), lit(0L)).as("n_at"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // fold (the q276 shape)
    val folded = df.repartition(col("exp"))
      .sortWithinPartitions(col("exp"), col("seq"))
      .as[(Long, Long, Long)]
      .mapPartitions { rows =>
        val it = rows.buffered
        new Iterator[(Long, Long)] {
          def hasNext: Boolean = it.hasNext
          def next(): (Long, Long) = {
            val exp = it.head._1
            var n = 0L; var cum = 0L; var nAt = 0L
            while (it.hasNext && it.head._1 == exp) {
              val succ = it.next()._3
              cum += (if (succ == 1L) a else b)
              n += 1
              if (nAt == 0L && math.abs(cum) >= bound) nAt = n
            }
            (exp, nAt)
          }
        }
      }.collect().toMap
    assert(folded == ref)
  }

  test("CDC boundaries are shift-resistant; fixed-stride boundaries are not") {
    // The q277 value claim as a property: inserting one token near the
    // head re-chunks only the CDC neighborhood (chunks strictly after
    // the next boundary keep their content), while EVERY fixed-stride
    // chunk after the edit shifts. Computed on one synthetic token
    // stream with the same h%8 boundary rule.
    def tokHash(t: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5").digest(
        t.getBytes("UTF-8"))
      val lo = (8 until 16).foldLeft(0L)((a, i) => (a << 8) | (md(15 - (i - 8)) & 0xffL))
      java.lang.Long.remainderUnsigned(lo, 2147483647L)
    }
    val rnd = new Random(7103)
    val toks = (1 to 400).map(i => s"w${rnd.nextInt(200)}")
    def chunks(ts: Seq[String], fixed: Boolean): Seq[String] = {
      if (fixed) ts.grouped(8).map(_.mkString(" ")).toSeq
      else {
        val out = scala.collection.mutable.ArrayBuffer[List[String]]()
        var cur = List.empty[String]
        ts.foreach { t =>
          if (tokHash(t) % 8 == 0 && cur.nonEmpty) { out += cur.reverse; cur = Nil }
          cur = t :: cur
        }
        if (cur.nonEmpty) out += cur.reverse
        out.map(_.mkString(" ")).toSeq
      }
    }
    val edited = toks.take(5) ++ Seq("INSERTED") ++ toks.drop(5)
    val (c1, c2) = (chunks(toks, fixed = false).toSet,
      chunks(edited, fixed = false).toSet)
    val cdcShared = (c1 & c2).size
    val (f1, f2) = (chunks(toks, fixed = true).toSet,
      chunks(edited, fixed = true).toSet)
    val fixShared = (f1 & f2).size
    assert(cdcShared >= (c1.size * 3) / 4,
      s"CDC must preserve most chunks after a head insertion: $cdcShared/${c1.size}")
    assert(fixShared <= 2,
      s"fixed-stride must lose (nearly) all chunks after the shift: $fixShared")
  }

  test("q286 equals a driver-side 6-round Bellman-Ford on the sf0.001 keys") {
    val keys = spark.read.parquet(s"$dir/customer.parquet")
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    val edges = keys.toSeq.flatMap { k =>
      Seq((k, k + 1, (k * 7) % 13 + 1), (k, k + 10, (k * 11) % 17 + 1))
        .filter(e => keys(e._2))
    }
    val bySrc = edges.groupBy(_._1)
    var dist = keys.filter(_ % 1000 == 1).map(_ -> 0L).toMap
    (1 to 6).foreach { _ =>
      val cand = dist.toSeq ++ dist.toSeq.flatMap { case (u, du) =>
        bySrc.getOrElse(u, Nil).map(e => e._2 -> (du + e._3))
      }
      dist = cand.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).min }
    }
    val want = dist.groupBy(_._1 / 100).toSeq.map { case (b, vs) =>
      (b, vs.size.toLong, vs.values.min, vs.values.max, vs.values.sum)
    }.sortBy(_._1)
    val got = SparkEntry.queries("q286_bounded_sssp")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == want)
  }

  test("q275 chain: row mass bounded, removal never beats base") {
    val out = SparkEntry.queries("q275_markov_attribution")(spark, dir)
      .collect()
    assert(out.length == 4)
    out.foreach { r =>
      val base = r.getLong(r.fieldIndex("p_conv_base_ppm"))
      val removed = r.getLong(r.fieldIndex("p_conv_removed_ppm"))
      assert(base >= 0 && base <= 1000000L)
      assert(removed >= 0 && removed <= base,
        s"removal must not increase conversion: $r")
    }
    val shares = out.map(_.getLong(out.head.fieldIndex("attribution_ppm")))
    assert(shares.sum <= 1000000L, "floor shares cannot exceed 100%")
  }
}
