package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.functions.Kernels._
import graft.sources.Tables

/** Round-4 batch 6 — reconciliation + mergeable-sketch rollups:
  *
  *  - q99: FULL OUTER reconciliation — the audit join every finance/
  *    data-migration pipeline runs: order headers vs line-item rollups,
  *    classifying every key as matched / header_only / lines_only /
  *    amount_mismatch. FULL OUTER was the one join type the §2.3
  *    inventory had no gated query for.
  *  - q100: two-level HyperLogLog rollup — per-nation customer sketches
  *    UNION-merged to region estimates. This is the 100 TB sketch
  *    pattern that matters: sketches pre-aggregate in the lake (one
  *    pass over the data), and any rollup level merges SKETCHES, never
  *    re-scans rows. Estimates gate via error-bound booleans against
  *    the oracle's exact distincts (the q46 stance).
  */
object ReconQueries {

  val defs: Seq[QueryDef] = Seq(

    // FULL OUTER reconciliation: the raw line feed vs the deduped mart
    // — the audit every ingestion pipeline runs after a dedup step.
    // Left side: per-order net revenue over ALL raw lines (the corpus
    // carries ~2% duplicate (orderkey,linenumber) rows — the q11
    // corpus). Right side: the same rollup over keep-one deduped lines
    // (value-total tiebreak, so the pick is deterministic even among
    // exact copies). Each side also "misses" a 3% hash slice of keys
    // (simulating partial loads), so all four classes have rows:
    // matched / dup_inflated / raw_only / dedup_only. Both sides
    // aggregate to one row per key BEFORE the full-outer join (1:1,
    // skew-free); amounts compare as exact decimals — doubles would
    // manufacture phantom mismatches.
    QueryDef(
      "q99_order_reconciliation",
      (s, dir) => {
        val net = (dec6(col("l_extendedprice")) *
          (lit(BigDecimal(1)).cast(DecimalType(18, 6)) - dec6(col("l_discount"))))
          .cast(DecimalType(18, 6))
        val li = Tables.lineitem(s, dir)
          .select(col("l_orderkey").as("k"), col("l_linenumber"),
            col("l_shipdate"), col("l_quantity"), col("l_extendedprice"),
            col("l_discount"), net.as("net"))
          .withColumn("bucket",
            md5BitsModK(md5Bits(concat(lit("recon:"), col("k"))), 100L))
        val raw = li.where(col("bucket") < 97)
          .groupBy(col("k")).agg(money(sum(col("net"))).as("raw_total"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("k"), col("l_linenumber"))
          .orderBy(col("l_shipdate").desc, col("l_extendedprice").desc,
            col("l_quantity").desc, col("l_discount").desc)
        val dedup = li.where(col("bucket") >= 3)
          .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
          .groupBy(col("k")).agg(money(sum(col("net"))).as("dedup_total"))
        val recon = raw.join(dedup, Seq("k"), "full_outer")
          .select(col("k"),
            when(col("dedup_total").isNull, "raw_only")
              .when(col("raw_total").isNull, "dedup_only")
              .when(abs(col("raw_total") - col("dedup_total"))
                <= lit(BigDecimal("0.01")).cast(DecimalType(18, 6)), "matched")
              .otherwise("dup_inflated").as("status"))
        recon.groupBy(col("status"))
          .agg(count(lit(1)).as("n_orders"), sum(col("k")).as("key_sum"))
          .orderBy(col("status"))
      },
      Some("""
        WITH li AS (
          SELECT l_orderkey AS k, l_linenumber, l_shipdate, l_quantity,
                 l_extendedprice, l_discount,
                 CAST(CAST(l_extendedprice AS DECIMAL(18,6)) *
                      (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))
                      AS DECIMAL(18,6)) AS net,
                 CAST(md5_number_lower('recon:' || l_orderkey) % 100 AS BIGINT) AS bucket
          FROM lineitem),
        raw AS (
          SELECT k, CAST(SUM(net) AS DECIMAL(38,6)) AS raw_total
          FROM li WHERE bucket < 97 GROUP BY 1),
        dd AS (
          SELECT k, net,
                 row_number() OVER (PARTITION BY k, l_linenumber
                   ORDER BY l_shipdate DESC, l_extendedprice DESC,
                            l_quantity DESC, l_discount DESC) AS rn
          FROM li WHERE bucket >= 3),
        dedup AS (
          SELECT k, CAST(SUM(net) AS DECIMAL(38,6)) AS dedup_total
          FROM dd WHERE rn = 1 GROUP BY 1),
        recon AS (
          SELECT coalesce(r.k, d.k) AS k,
                 CASE WHEN d.k IS NULL THEN 'raw_only'
                      WHEN r.k IS NULL THEN 'dedup_only'
                      WHEN abs(r.raw_total - d.dedup_total) <= CAST(0.01 AS DECIMAL(18,6))
                        THEN 'matched'
                      ELSE 'dup_inflated' END AS status
          FROM raw r FULL OUTER JOIN dedup d ON r.k = d.k)
        SELECT status, COUNT(*) AS n_orders,
               CAST(SUM(k) AS BIGINT) AS key_sum
        FROM recon
        GROUP BY status
        ORDER BY status""")),

    // Two-level HLL rollup: nation-level customer sketches (one scan),
    // then region-level estimates by merging the 25 nation SKETCHES —
    // no second scan of customers. The oracle cannot reproduce Apache
    // DataSketches estimates, so the gate is the q46 shape: exact
    // per-level distinct counts (oracle-computable) plus literal-true
    // error-bound booleans — HLL with lgK=12 has σ≈1.04/√4096≈1.6%,
    // gated at 5%; the nation→region merge must also be CONSISTENT
    // (merged estimate within 5% of the region's direct exact count).
    QueryDef(
      "q100_hll_rollup",
      (s, dir) => {
        val c = Tables.customer(s, dir)
          .join(broadcast(Tables.nation(s, dir)),
            col("c_nationkey") === col("n_nationkey"))
          .select(col("n_name").as("nation"), col("n_regionkey").as("regionkey"),
            col("c_custkey"))
        val nationSketch = c.groupBy(col("nation"), col("regionkey"))
          .agg(hll_sketch_agg(col("c_custkey"), lit(12)).as("sk"),
            count(lit(1)).as("n_exact"))
        val region = nationSketch.groupBy(col("regionkey"))
          .agg(hll_union_agg(col("sk")).as("rsk"),
            sum(col("n_exact")).cast("long").as("n_exact"),
            count(lit(1)).as("n_nations"))
          .select(col("regionkey"), col("n_nations"), col("n_exact"),
            hll_sketch_estimate(col("rsk")).as("est"))
        region.select(col("regionkey"), col("n_nations"), col("n_exact"),
            (abs(col("est") - col("n_exact")).cast("double") /
              col("n_exact") <= lit(0.05d)).as("merge_est_ok"))
          .orderBy(col("regionkey"))
      },
      Some("""
        WITH c AS (
          SELECT n.n_name AS nation, n.n_regionkey AS regionkey, c.c_custkey
          FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey)
        SELECT regionkey,
               COUNT(DISTINCT nation) AS n_nations,
               COUNT(*) AS n_exact,
               true AS merge_est_ok
        FROM c
        GROUP BY regionkey
        ORDER BY regionkey""")),

    // Sketch-based join-cardinality estimation — the planner-adjacent
    // sketch pattern: estimate |A ∩ B| of two key sets via HLL
    // inclusion-exclusion (|A| + |B| − |A ∪ B|) WITHOUT running the
    // join. Each side is one sketch scan; the union merges sketches.
    // Inclusion-exclusion compounds the HLL error (σ≈1.6% at lgK=12, ×3
    // sketches, amplified by |A∪B|/|A∩B|), so the gate bounds at 15% —
    // asserted against the oracle's exact counts as literal-true
    // booleans (the q46/q100 stance). A 100 TB planner uses exactly
    // this to pick broadcast vs shuffle before reading either side.
    QueryDef(
      "q140_join_cardinality_sketch",
      (s, dir) => {
        val a = Tables.orders(s, dir).select(col("o_custkey").as("k"))
        val b = Tables.events(s, dir).select(col("user_id").as("k"))
        val sa = a.agg(hll_sketch_agg(col("k"), lit(12)).as("sk"),
          countDistinct(col("k")).as("n_a"))
        val sb = b.agg(hll_sketch_agg(col("k"), lit(12)).as("sk"),
          countDistinct(col("k")).as("n_b"))
        val merged = sa.select(col("sk"), col("n_a"))
          .crossJoin(sb.select(col("sk").as("skb"), col("n_b")))
          .select(col("n_a"), col("n_b"),
            hll_sketch_estimate(col("sk")).as("est_a"),
            hll_sketch_estimate(col("skb")).as("est_b"),
            hll_sketch_estimate(
              hll_union(col("sk"), col("skb"))).as("est_union"))
        // exact intersection for the gate: both sides' distinct keys
        val exact = a.distinct().join(b.distinct(), Seq("k"))
          .agg(count(lit(1)).as("n_intersect"))
        merged.crossJoin(exact)
          .select(col("n_a"), col("n_b"), col("n_intersect"),
            (abs(col("est_a") + col("est_b") - col("est_union") -
              col("n_intersect")).cast("double") / col("n_intersect") <= lit(0.15d))
              .as("est_within_15pct"))
          .orderBy(col("n_a"))
      },
      Some("""
        WITH a AS (SELECT DISTINCT o_custkey AS k FROM orders),
        b AS (SELECT DISTINCT user_id AS k FROM events)
        SELECT (SELECT COUNT(*) FROM a) AS n_a,
               (SELECT COUNT(*) FROM b) AS n_b,
               (SELECT COUNT(*) FROM a JOIN b USING (k)) AS n_intersect,
               true AS est_within_15pct
        ORDER BY n_a""")))
}
