package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.plans.ResultCache

/** Plan-fingerprint result cache: semantically-equal plans built at
  * different call sites share ONE materialization; different plans (or
  * different output schemas) do not; pin-neutrality holds.
  */
class ResultCacheSpec extends SparkSpec {
  import spark.implicits._

  private def dir = Files.createTempDirectory("graft_rescache").toString

  private def rollup(minQty: Int) =
    Seq((1L, 5), (1L, 9), (2L, 3), (2L, 12), (3L, 7))
      .toDF("k", "q")
      .where(col("q") >= minQty)
      .groupBy(col("k")).agg(sum(col("q")).as("total"))

  test("semantically equal plans from separate call sites share one entry") {
    ResultCache.invalidate()
    val d = dir
    val before = ResultCache.size
    val a = ResultCache.through(rollup(5), d)
    val b = ResultCache.through(rollup(5), d) // rebuilt frame, new expr ids
    assert(ResultCache.size == before + 1)
    assert(a.orderBy("k").collect().toSeq == b.orderBy("k").collect().toSeq)
    // one parquet result dir on disk — the second call re-read, not rewrote
    val results = new java.io.File(d).listFiles
      .filter(f => f.isDirectory && f.getName.startsWith("result_"))
    assert(results.length == 1)
  }

  test("different predicates and different schemas are distinct entries") {
    ResultCache.invalidate()
    val d = dir
    ResultCache.through(rollup(5), d)
    ResultCache.through(rollup(6), d) // different literal → different plan
    assert(ResultCache.size == 2)
    ResultCache.through(
      rollup(5).withColumnRenamed("total", "sum_q"), d) // schema differs
    assert(ResultCache.size == 3)
  }

  test("hits return the materialized snapshot and stay pin-neutral") {
    ResultCache.invalidate()
    val d = dir
    val out = ResultCache.through(rollup(5), d)
    assert(out.as[(Long, Long)].collect().toMap == Map(1L -> 14L, 2L -> 12L,
      3L -> 7L))
    assert(spark.sharedState.cacheManager.isEmpty, "cacheManager must stay empty")
    ResultCache.invalidate()
    assert(ResultCache.size == 0)
  }
}
