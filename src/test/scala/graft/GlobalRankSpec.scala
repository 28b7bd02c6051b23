package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.GlobalRank

/** GlobalRank = the distributed replacement for single-partition global
  * windows (round 7): the bucketed two-level rank must be byte-identical
  * to `row_number()` over the same total order, and the arithmetic ntile
  * reconstruction byte-identical to Spark's `ntile(k)`, for every n/k
  * remainder shape and for negative / tied / struct-bucketed keys.
  */
class GlobalRankSpec extends SparkSpec {
  import spark.implicits._

  // deterministic pseudo-random values incl. negatives and heavy ties
  private def sample(n: Int) =
    (1 to n).map { i =>
      val v = ((i * 2654435761L) % 997) - 498 // [-498, 498], ties for n > 997
      (i.toLong, v, s"g${i % 7}")
    }.toDF("id", "v", "g")

  test("withGlobalRank matches row_number over (v, id) with a div bucket") {
    for (n <- Seq(1, 7, 997, 2500)) {
      val df = sample(n)
      val expected = df.withColumn("rn",
        row_number().over(Window.orderBy(col("v"), col("id"))).cast("long"))
      val got = GlobalRank.withGlobalRank(
        df, "rn", expr("v div 64"), col("v"), col("id"))
      assert(got.select("id", "rn").except(expected.select("id", "rn")).isEmpty,
        s"rank mismatch at n=$n")
    }
  }

  test("withGlobalRank matches row_number with a struct per-value bucket and desc order") {
    val df = sample(1000)
    val expected = df.withColumn("rn",
      row_number().over(Window.orderBy(col("v").desc, col("id"))).cast("long"))
    val got = GlobalRank.withGlobalRank(
      df, "rn", struct(-col("v"), expr("id div 100")),
      col("v").desc, col("id"))
    assert(got.select("id", "rn").except(expected.select("id", "rn")).isEmpty)
  }

  test("ntileFromRank matches ntile(k) for every remainder shape") {
    for (n <- Seq(3, 5, 8, 40, 41, 47, 1000); k <- Seq(2, 5, 8)) {
      val df = sample(n)
      val expected = df.withColumn("t",
        ntile(k).over(Window.orderBy(col("v"), col("id"))).cast("long"))
      val tot = df.groupBy().agg(count(lit(1)).as("n"))
      val got = GlobalRank.withGlobalRank(
          df, "rn", expr("v div 64"), col("v"), col("id"))
        .crossJoin(broadcast(tot))
        .withColumn("t", GlobalRank.ntileFromRank(col("rn"), col("n"), k))
      assert(got.select("id", "t").except(expected.select("id", "t")).isEmpty,
        s"ntile mismatch at n=$n k=$k")
    }
  }

  test("the only unpartitioned window in the plan is the bucket-offset prefix") {
    val df = sample(5000)
    val got = GlobalRank.withGlobalRank(
      df, "rn", expr("v div 64"), col("v"), col("id"))
    val unpart = got.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window
        if w.partitionSpec.isEmpty => w
    }
    assert(unpart.size == 1, "exactly the bucket-offset window")
    assert(unpart.head.orderSpec.map(_.child.sql).mkString.contains("__gr_bkt"),
      "the unpartitioned window must order the BUCKET table, not the data")
  }

  test("valueAtRank hands every rank the sorted multiset's value at that " +
    "rank (blockSize=8 exercises boundary clamps)") {
    // heavy-tie multiset, values 0..12
    val vs = (1 to 300).map(i => (i * 2654435761L % 13).abs)
    val sorted = vs.sorted.toVector
    val pool = vs.groupBy(identity).toSeq.map { case (v, xs) =>
      (v, sorted.indexOf(v).toLong, xs.size.toLong)
    }.toDF("v", "lt", "c")
    val targets = (1 to 300).map(t => (t.toLong, s"t$t")).toDF("rk", "tag")
    val got = GlobalRank.valueAtRank(
        pool, "v", "lt", "c", targets, "rk", "out", blockSize = 8L)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    (1 to 300).foreach { t =>
      assert(got(t.toLong) === sorted(t - 1), s"rank $t")
    }
    // target columns survive untouched
    val cols = GlobalRank.valueAtRank(
      pool, "v", "lt", "c", targets, "rk", "out", 8L).columns.toSeq
    assert(cols === Seq("rk", "tag", "out"))
  }
}
