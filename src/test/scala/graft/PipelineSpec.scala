package graft

import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.sql.functions._
import graft.plans.Pipeline

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private def isMaterialized(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.logical.getClass.getSimpleName == "LogicalRDD"

  test("shared dep builds once and is materialized; single-consumer stays lazy") {
    val builds = new AtomicInteger(0)
    val p = new Pipeline
    p.register("base") { _ =>
      builds.incrementAndGet()
      Seq((1, 10), (2, 20)).toDF("k", "v")
    }
    p.register("a", Seq("base"))(d => d("base").groupBy("k").agg(sum("v").as("s")))
    p.register("b", Seq("base"))(d => d("base").agg(count(lit(1)).as("n")))
    p.register("solo", Seq("a"))(d => d("a").where(col("s") > 0))

    val all = p.buildAll()
    assert(builds.get() === 1)                // memoized
    assert(isMaterialized(all("base")))       // 2 consumers → localCheckpoint
    assert(!isMaterialized(all("solo")))      // leaf stays lazy
    assert(all("b").head.getLong(0) === 2L)
    // localCheckpoint, not persist: pipelines leave no cacheManager pins
    assert(spark.sharedState.cacheManager.isEmpty)
  }

  test("ModelCatalog: the full reference DAG builds by model name, one scan per shared node") {
    spark.catalog.clearCache()
    val p = graft.plans.ModelCatalog(spark, "/root/testdata/sf0.001")
    val built = p.buildAll()
    assert(built.keySet === graft.plans.ModelCatalog.modelNames.toSet)
    // every model materializes at least one row at sf0.001
    graft.plans.ModelCatalog.modelNames.foreach { n =>
      assert(built(n).limit(1).count() === 1L, s"model $n produced no rows")
    }
    // stg_orders feeds five consumers (fct_order_items, fct_orders,
    // fct_orders_revenue, first_channel_ltv, dim_orders) → checkpointed,
    // so the orders scan runs once per pipeline run, not once per consumer
    assert(isMaterialized(built("stg_orders")))
    // leaves stay lazy (inlined into consumers by Catalyst)
    assert(!isMaterialized(built("cohort_revenue_ltv")))
    // and the whole catalog build leaves the cacheManager empty
    assert(spark.sharedState.cacheManager.isEmpty)
  }

  test("cycle detection and unknown nodes fail fast") {
    val p = new Pipeline
    p.register("x", Seq("y"))(d => d("y"))
    p.register("y", Seq("x"))(d => d("x"))
    assertThrows[IllegalArgumentException](p.build("x"))
    assertThrows[RuntimeException](p.build("nope"))
  }
}
