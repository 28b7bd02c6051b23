package graft

import org.apache.spark.sql.functions._
import graft.operators.Profile

/** Semantics pins for the batch-7 analytics operators: the profiler's
  * one-pass stats and the q103 day-boundary interval spill. */
class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  test("Profile.profile emits one row per column with exact stats") {
    val df = Seq(
      (1L, Some("a"), 10.5),
      (2L, None, 10.5),
      (3L, Some("b"), 99.0)).toDF("id", "s", "v")
    val got = Profile.profile(df, Seq(
        "id" -> col("id"), "s" -> col("s"), "v" -> col("v")))
      .orderBy("col_name")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3), r.getString(4)))
    assert(got.toSeq == Seq(
      ("id", 0L, 3L, "1", "3"),
      ("s", 1L, 2L, "a", "b"),
      ("v", 0L, 2L, "10.5", "99.0")))
  }

  test("Profile.profile approx mode still counts nulls exactly") {
    val df = Seq((Some(1), 1), (None, 2), (None, 3)).toDF("a", "b")
    val got = Profile.profile(df, Seq("a" -> col("a")), exact = false).collect()(0)
    assert(got.getLong(1) == 2L)   // n_null exact
    assert(got.getLong(2) >= 1L)   // approx distinct, non-zero
  }

  test("midnight-crossing interval spills into the next day (q103 clip logic)") {
    // One 30-min session starting 23:50 must count in both days:
    // [23:50, 24:00) on day 1 and [00:00, 00:20) on day 2.
    val e = Seq("2024-01-01 23:50:00", "2024-01-02 00:10:00")
      .map(java.sql.Timestamp.valueOf).toDF("ts")
    val clipped = e
      .select(col("ts").as("st"), (col("ts") + expr("INTERVAL 30 MINUTES")).as("en"))
      .withColumn("d1", to_date(col("st")))
      .withColumn("midnight", date_add(col("d1"), 1).cast("timestamp"))
      .select(array(
          struct(col("d1").as("day"), col("st").as("t0"),
            least(col("en"), col("midnight")).as("t1")),
          struct(date_add(col("d1"), 1).as("day"), col("midnight").as("t0"),
            col("en").as("t1"))).as("ivs"))
      .select(explode(col("ivs")).as("iv"))
      .select(col("iv.day"), col("iv.t0"), col("iv.t1"))
      .where(col("t1") > col("t0"))
      .orderBy("day", "t0")
      .collect()
    assert(clipped.length == 3) // day1 clip, day2 spill, day2 native
    assert(clipped(0).getDate(0).toString == "2024-01-01")
    assert(clipped(1).getDate(0).toString == "2024-01-02"
      && clipped(1).getTimestamp(1).toString == "2024-01-02 00:00:00.0"
      && clipped(1).getTimestamp(2).toString == "2024-01-02 00:20:00.0")
    // the spilled fragment and the native 00:10 session overlap → both days reachable
  }
}
