package graft

import org.apache.spark.sql.functions._
import graft.sources.Materialize

/** Proves the SCALE.md claim that pre-bucketed tables make the big-big
  * joins zero-shuffle: two tables bucketed the same way on the join key
  * must plan as a sort-merge join with NO Exchange on either side, and a
  * groupBy on the bucket key must aggregate without an exchange. */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  private def withNoBroadcast[A](f: => A): A = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try f finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("same-bucketed tables join and aggregate with zero Exchange") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bucket").toString
    val orders = (1L to 500L).map(k => (k, s"o$k")).toDF("order_id", "o_val")
    val items  = (1L to 1500L).map(i => (i % 500 + 1, s"i$i")).toDF("order_id", "i_val")
    Materialize.bucketedTable(orders, s"$dir/orders", "g_orders_bucketed", "order_id", 4)
    Materialize.bucketedTable(items, s"$dir/items", "g_items_bucketed", "order_id", 4)
    try withNoBroadcast {
      val joined = spark.table("g_items_bucketed")
        .join(spark.table("g_orders_bucketed"), Seq("order_id"))
      val joinPlan = joined.queryExecution.executedPlan.toString
      assert(joinPlan.contains("SortMergeJoin"), s"expected SMJ:\n$joinPlan")
      assert(!joinPlan.contains("Exchange"),
        s"bucketed co-located join must not shuffle:\n$joinPlan")
      assert(joined.count() === 1500L)

      val agg = spark.table("g_items_bucketed")
        .groupBy(col("order_id")).agg(count(lit(1)).as("n"))
      val aggPlan = agg.queryExecution.executedPlan.toString
      assert(!aggPlan.contains("Exchange"),
        s"groupBy on the bucket key must not shuffle:\n$aggPlan")
      assert(agg.count() === 500L)
    } finally {
      spark.sql("DROP TABLE IF EXISTS g_orders_bucketed")
      spark.sql("DROP TABLE IF EXISTS g_items_bucketed")
    }
  }
}
