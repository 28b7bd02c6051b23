package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedAggregate equals the unsalted aggregate for algebraic aggs") {
    val df = Seq.tabulate(200)(i => ("k" + (i % 2), i.toLong, i * 1.5))
      .toDF("k", "id", "v")
    val salted = Skew.saltedAggregate(df, col("k"), col("id"), 8,
        partials = Seq("p_cnt" -> count(lit(1)), "p_sum" -> sum(col("v")),
          "p_min" -> min(col("id"))),
        finals = Seq(sum(col("p_cnt")).cast("long").as("n"),
          sum(col("p_sum")).as("total"), min(col("p_min")).as("first")))
      .orderBy("__key").collect()
    val plain = df.groupBy("k")
      .agg(count(lit(1)).as("n"), sum(col("v")).as("total"), min(col("id")).as("first"))
      .orderBy("k").collect()
    assert(salted.map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq ===
      plain.map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq)
  }

  test("saltedJoin returns exactly the unsalted join rows") {
    val big = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("b", 4L), ("c", 5L))
      .toDF("k", "id")
    val dim = Seq(("a", "A"), ("b", "B")).toDF("k", "label") // c has no match
    val salted = Skew.saltedJoin(big, dim, "k", col("id"), 4)
      .select("k", "id", "label").orderBy("id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSeq
    val plain = big.join(dim, Seq("k"))
      .select("k", "id", "label").orderBy("id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSeq
    assert(salted === plain)
    assert(salted.map(_._1).toSet === Set("a", "b")) // unmatched key drops
  }

  test("saltedJoin plan pin: shuffle hashes (key, salt) and the hot key fans out") {
    // A future refactor that silently de-salts the join would keep the
    // result identical (SkewSpec above) while collapsing the hot key back
    // onto one reducer — so pin the exchange topology itself. Broadcast
    // and AQE are disabled: at bench/100 TB scale the small side is past
    // the broadcast threshold and this pins the static shuffle plan.
    val saved = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.enabled", "spark.sql.shuffle.partitions")
      .map(k => k -> spark.conf.getOption(k))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    try {
      // key must be data-dependent: a literal key constant-folds out of
      // the join condition entirely and the plan degenerates to salt-only
      val big = spark.range(0, 4096).select(
        when(col("id") % 64 === 0, concat(lit("cold"), col("id")))
          .otherwise(lit("hot")).as("k"), col("id"))
      val dim = Seq(("hot", "H"), ("cold0", "C")).toDF("k", "label")
      val joined = Skew.saltedJoin(big, dim, "k", col("id"), 16)
      val plan = joined.queryExecution.executedPlan.toString
      assert("hashpartitioning\\(k#\\d+, __salt#\\d+".r.findFirstIn(plan).isDefined,
        s"big side must shuffle on (k, __salt):\n$plan")
      // empirics: the single hot key must land on many distinct reducers
      // (16 salts hashed over 32 partitions; >= 8 is loose enough to be
      // hash-collision-proof and tight enough to catch de-salting, which
      // would give exactly 1)
      val fanOut = joined.withColumn("pid", spark_partition_id())
        .groupBy(col("k")).agg(countDistinct(col("pid")).as("np"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(fanOut("hot") >= 8L,
        s"hot key must fan across >=8 shuffle partitions, got ${fanOut("hot")}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("rangeJoin equals the naive inequality join, incl. bucket-boundary spans") {
    val points = Seq((1L, 5L), (2L, 31L), (3L, 64L), (4L, 100L)).toDF("pid", "x")
    val intervals = Seq((10L, 0L, 6L), (11L, 30L, 65L), (12L, 90L, 95L))
      .toDF("iid", "lo", "hi")
    val got = Skew.rangeJoin(points, "x", intervals, "lo", "hi", 32L)
      .select("pid", "iid").orderBy("pid", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    // naive: 1∈[0,6]; 2∈[30,65]; 3∈[30,65]; 4∉ anything ([90,95] misses 100)
    assert(got === Seq((1L, 10L), (2L, 11L), (3L, 11L)))
  }
}
