package graft

import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.sql.functions._
import graft.plans.Pipeline

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("shared dep builds once and is persisted; single-consumer stays lazy") {
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
    assert(builds.get() === 1)                                   // memoized
    assert(all("base").storageLevel.useMemory)                   // 2 consumers → persisted
    assert(!all("solo").storageLevel.useMemory)                  // leaf not persisted
    assert(all("b").head.getLong(0) === 2L)
    p.unpersistAll()
  }

  test("ModelCatalog: the full reference DAG builds by model name, one scan per shared node") {
    val p = graft.plans.ModelCatalog(spark, "/root/testdata/sf0.001")
    val built = p.buildAll()
    assert(built.keySet === graft.plans.ModelCatalog.modelNames.toSet)
    // every model materializes at least one row at sf0.001
    graft.plans.ModelCatalog.modelNames.foreach { n =>
      assert(built(n).limit(1).count() === 1L, s"model $n produced no rows")
    }
    // stg_orders feeds five consumers (fct_order_items, fct_orders,
    // fct_orders_revenue, first_channel_ltv, dim_orders) → persisted, so
    // the orders scan runs once per pipeline run, not once per consumer
    assert(built("stg_orders").storageLevel.useMemory ||
      built("stg_orders").storageLevel.useDisk)
    // leaves stay lazy (inlined into consumers by Catalyst)
    assert(!built("cohort_revenue_ltv").storageLevel.useMemory)
    p.unpersistAll()
  }

  test("cycle detection and unknown nodes fail fast") {
    val p = new Pipeline
    p.register("x", Seq("y"))(d => d("y"))
    p.register("y", Seq("x"))(d => d("x"))
    assertThrows[IllegalArgumentException](p.build("x"))
    assertThrows[RuntimeException](p.build("nope"))
  }
}
