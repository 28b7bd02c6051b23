package graft

import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
import graft.plans.CheckpointPolicy

/** Suite-wide single-partition-window lint (round-7 verdict item 3).
  *
  * An unpartitioned `Window.orderBy(...)` moves its whole input through
  * ONE task — invisible at sf0.1 (everything fits one partition) and
  * fatal at 100 TB. The oracle gate can never catch it, so this spec
  * sweeps EVERY batch query's optimized logical plan and asserts each
  * `Window` node with an empty partitionSpec belongs to a documented
  * allowlist of BOUNDED inputs: bucket/bin/band/vocabulary tables whose
  * row count is set by a value domain or bucket width, not by the data
  * volume. Restoring a data-proportional global window (e.g. q169's old
  * `ntile(8).over(Window.orderBy(cents, okey))` over all orders, killed
  * in round 7 for GlobalRank's two-level bucketed scheme) turns this
  * spec red.
  *
  * Blind-spot closure (round-9 advice): `cutLineage()` TRUNCATES
  * lineage, so a window upstream of a cut never reaches the final
  * optimizedPlan. The sweep therefore also collects every PRE-CUT
  * optimized plan via [[CheckpointPolicy.startRecordingCutPlans]] (a
  * thread-local registry fed by `materialize()`), and the per-query
  * count below is final-plan nodes PLUS pre-cut-plan nodes. Cut-using
  * iterative loops record one plan per round; their counts are stable
  * because round budgets are fixed.
  *
  * Streaming queries are excluded: their `fn` executes full checkpointed
  * stream lifetimes at call time and their windows live inside
  * micro-batches planned by the streaming runner.
  */
class WindowLintSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** query -> max allowed unpartitioned Window NODES across the final
    * optimized plan AND all pre-cut plans (shared subtrees count once
    * per occurrence), with the bounded input that justifies each.
    * Everything else must have zero.
    */
  private val allow: Map[String, Int] = Map(
    "q46_approx_sketches" -> 2, // bounded bucket-offset prefix sum + 3-row returnflag-group offset (pre-cut targets plan; round-13 hit-bucket lattice)
    "q95_training_shuffle" -> 1, // 256-row shard-bucket count prefix-sum
    "q109_pareto_frontier" -> 1, // price-band table (value-domain bins)
    "q119_length_histogram" -> 1, // fixed length-histogram bin table
    "q121_key_skew_audit" -> 1, // <=5-row log2-occupancy bucket table
    "q141_split_drift_tv" -> 1, // length-histogram bin table
    "q166_waterfill_mix" -> 6, // language-level table (bounded vocab)
    "q169_analyze_stats" -> 2, // GlobalRank bucket offsets + 5-row MCV rank
    "q170_sorted_neighborhood" -> 2, // one GlobalRank offset table, subtree appears twice in the self-join
    "q176_rfm_segments" -> 3, // three GlobalRank offset tables (R/F/M)
    "q178_selectivity_estimate" -> 1, // GlobalRank bucket offsets
    "q186_ooo_watermark_audit" -> 1, // 4-row displacement-bucket table
    "q188_cusum_changepoint" -> 3, // daily series (calendar-bounded, ~2.4k rows)
    "q191_mann_whitney" -> 1, // value-range bucket offsets (two-level scheme)
    "q197_retention_hazard" -> 1, // age-level life table (calendar-bounded)
    "q224_source_novelty" -> 1, // source-level table (bounded domain)
    "q236_ks_two_sample" -> 1, // value-range bucket offsets (two-level scheme)
    "q242_isotonic_calibration" -> 2, // pre-cut: value-domain bucket offsets + the <=20-row ventile-bin prefix
    "q362_stratified_sample" -> 1, // pre-cut: largest-remainder rank over the 5-row stratum frame
    "q363_quantile_normalization" -> 1, // pre-cut: pooled bucket-offset window (value-domain bucket table)
    "q374_consistent_hash_ring" -> 6, // pre-cut: ring-point lag over the <=576-row (shards x vnodes) point table, subtree referenced twice per ring x 3 rings
    "q375_weighted_quantiles" -> 1, // pre-cut: pooled bucket-offset window (value-domain bucket table)
    "q265_exact_quantile_select" -> 1, // GlobalRank bucket offsets
    "q257_bh_fdr" -> 2, // spatial grid-cell table (fixed grid)
    "q272_zone_map_pruning" -> 1, // GlobalRank calendar-day bucket offsets
    "q273_rrf_fusion" -> 2, // rank over the two <=50-row truncated top lists
    "q283_ndcg_at10" -> 3, // rank over three <=10-row truncated top lists
    "q284_encoding_audit" -> 1, // GlobalRank calendar-day bucket offsets
    "q289_quantile_effects" -> 2, // one GlobalRank bucket-offset table per arm
    "q290_batch_scoring" -> 3, // GlobalRank bucket-offset subtree (appears twice, q170-style) + 10-row decile gains frame
    "q292_conformal_coverage" -> 2, // GlobalRank residual-bucket offset subtree, referenced twice (q170-style)
    "q293_conformal_by_segment" -> 1, // GlobalRank residual-bucket offsets (single reference)
    "q326_control_chart_rules" -> 4, // daily series (calendar-bounded, ~2.4k rows): 3 run-rule frames + the R4 count/sum pair split by the planner
    "q351_neyman_allocation" -> 1, // 5-row stratum table (largest-remainder rank)
    "q354_ams_f2" -> 1, // 4-row estimator-group frame (median-of-means rank)
    "q356_kruskal_wallis" -> 1, // value-range bucket offsets (two-level scheme, q191's)
    "q364_jonckheere_terpstra" -> 1, // value-range bucket offsets (5 group sums, one node)
    "q365_mann_kendall_theil_sen" -> 1, // Theil-Sen median rank over the calendar-bounded pair frame
    "q366_runs_test" -> 2, // two lag windows on the ~96-row monthly frame (diff signs, sign flips)
    "q378_by_fdr" -> 2 // rank over the 20-cell test frame; subtree referenced twice (cuts + output, q170-style)
  )

  /** Count unpartitioned Window nodes in the final optimized plan plus
    * every pre-cut plan recorded while `fn` ran on this thread.
    */
  private def unpartitionedWindows(
      d: graft.queries.QueryDef): Seq[LWindow] = {
    CheckpointPolicy.startRecordingCutPlans()
    try {
      val finalPlan = d.fn(spark, dir).queryExecution.optimizedPlan
      (CheckpointPolicy.recordedCutPlans :+ finalPlan).flatMap(_.collect {
        case w: LWindow if w.partitionSpec.isEmpty => w
      })
    } finally CheckpointPolicy.stopRecordingCutPlans()
  }

  test("no query plans a data-proportional single-partition window") {
    val streaming = graft.queries.StreamQueries.defs.map(_.name).toSet
    val offenders = scala.collection.mutable.ListBuffer[String]()
    SparkEntry.allDefs.filterNot(d => streaming(d.name)).foreach { d =>
      val unpart = unpartitionedWindows(d)
      val cap = allow.getOrElse(d.name, 0)
      if (unpart.size > cap)
        offenders += s"${d.name}: ${unpart.size} unpartitioned Window nodes (allowed $cap); " +
          s"order keys: ${unpart.map(_.orderSpec.map(_.child.sql).mkString(",")).mkString(" | ")}"
    }
    assert(offenders.isEmpty,
      "unpartitioned windows over data-proportional inputs (single-partition " +
        "sort at scale):\n" + offenders.mkString("\n"))
  }

  test("the allowlist itself stays tight (entries drop out when fixed)") {
    val streaming = graft.queries.StreamQueries.defs.map(_.name).toSet
    val byName = SparkEntry.allDefs.map(d => d.name -> d).toMap
    allow.foreach { case (name, cap) =>
      assert(byName.contains(name), s"allowlist names unknown query $name")
      assert(!streaming(name), s"allowlist lists streaming query $name")
      val n = unpartitionedWindows(byName(name)).size
      assert(n == cap,
        s"$name: allowlist says $cap unpartitioned windows, plan has $n — " +
          "tighten or document the drift")
    }
  }
}
