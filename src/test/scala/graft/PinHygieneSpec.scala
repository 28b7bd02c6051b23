package graft

/** Registry-level invariant: EVERY query leaves the session cacheManager
  * empty after full evaluation. Accumulated persist pins are how one
  * query's timing and memory pressure leak into another's (the round-3
  * q51 bench regression: a persisted connected-components result nobody
  * unpersisted) — operators that need materialization use
  * localCheckpoint, which truncates lineage without registering a cache
  * entry. A violation here is a silent scale/memory bug the oracle gate
  * can never catch.
  */
class PinHygieneSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("every registered query evaluates to an empty cacheManager") {
    spark.catalog.clearCache()
    val violations = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      if (spark.sharedState.cacheManager.isEmpty) None
      else { spark.catalog.clearCache(); Some(name) }
    }
    assert(violations.isEmpty,
      s"queries left cacheManager pins: ${violations.mkString(", ")}")
  }
}
