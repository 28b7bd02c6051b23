package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

/** Interplay of the manual skew weapons (Skew.saltedJoin /
  * saltedAggregate, q43/q148) with AQE's own runtime skew handling —
  * pinned both ways so neither config silently changes results or plan
  * class.
  *
  * Division of labor this spec documents:
  *  - AQE's skew-join split (spark.sql.adaptive.skewJoin.enabled, on by
  *    default) only rewrites SHUFFLE JOINS (sort-merge / shuffled-hash)
  *    whose runtime partition sizes are skewed. It never touches a skewed
  *    AGGREGATE: a hot grouping key still lands every row on one reducer,
  *    because splitting it would break per-key aggregation invariants.
  *    saltedAggregate is therefore still the only fix for
  *    broadcast-ineligible skewed aggregates — its stage-1 exchange is on
  *    (key, salt), bounding any reducer's fan-in at rows/saltBuckets.
  *  - saltedJoin pre-balances the shuffle, so AQE finds nothing to split;
  *    the two compose (same results with AQE skew handling on or off),
  *    and the manual form remains for when statistics lie or the skew is
  *    known up front (AQE can only split AFTER materializing the skewed
  *    map output).
  */
class AqeSkewSpec extends SparkSpec {
  import spark.implicits._

  // 10k rows of key 1 (hot), 100 spread over keys 2..11
  private def hot = spark.range(10000).select(lit(1L).as("k"), col("id").as("v"))
    .unionAll(spark.range(100).select((col("id") % 10 + 2).as("k"), col("id").as("v")))
  private def dim = (1L to 11L).map(k => (k, s"name_$k")).toDF("k", "name")

  private def withConf[T](pairs: (String, String)*)(f: => T): T = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f
    finally prev.foreach { case (k, o) =>
      o.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }

  test("saltedJoin == plain join, with AQE skew handling on AND off") {
    val expected = hot.join(dim, Seq("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
      .orderBy(col("k")).collect().toSeq
    for (aqeSkew <- Seq("true", "false")) {
      withConf(
        "spark.sql.adaptive.skewJoin.enabled" -> aqeSkew,
        // force the shuffle path so the salt actually routes the exchange
        "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
        val got = Skew.saltedJoin(hot, dim, "k", col("v"), 8)
          .groupBy(col("k")).agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
          .orderBy(col("k")).collect().toSeq
        assert(got == expected, s"skewJoin=$aqeSkew diverged")
      }
    }
  }

  test("saltedJoin shuffles on (key, salt): hot key spread over salt buckets") {
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val p = Skew.saltedJoin(hot, dim, "k", col("v"), 8)
        .queryExecution.executedPlan.toString
      assert(p.contains("__salt"), s"salt column must reach the exchange:\n$p")
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
        "salted join must stay an equi-join")
    }
  }

  test("saltedAggregate == plain aggregate; AQE cannot split a skewed agg") {
    val expected = hot.groupBy(col("k"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
      .orderBy(col("k")).collect().toSeq
    val salted = Skew.saltedAggregate(hot, col("k"), col("v"), 8,
      partials = Seq("n1" -> count(lit(1)), "s1" -> sum(col("v"))),
      finals = Seq(sum(col("n1")).as("n"), sum(col("s1")).as("sv")))
      .withColumnRenamed("__key", "k")
    assert(salted.orderBy(col("k")).collect().toSeq == expected)
    // the plan must show the two-stage shape: a stage-1 aggregate keyed on
    // (key, salt) — the exchange AQE has no counterpart for on aggregates
    val p = salted.queryExecution.executedPlan.toString
    assert(p.contains("__salt"), s"stage-1 must group on (key, salt):\n$p")
  }
}
