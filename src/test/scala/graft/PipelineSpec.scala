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

  test("cycle detection and unknown nodes fail fast") {
    val p = new Pipeline
    p.register("x", Seq("y"))(d => d("y"))
    p.register("y", Seq("x"))(d => d("x"))
    assertThrows[IllegalArgumentException](p.build("x"))
    assertThrows[RuntimeException](p.build("nope"))
  }
}
