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
        // ONE pinned hash(k) exchange ahead of the per-row md5 + decimal
        // projection: the raw aggregate, the dedup window (clustered on
        // (k, linenumber) — subset rule), the per-k rollups, and the
        // full-outer join ALL reuse it, and the digest/decimal math runs
        // post-exchange at full width instead of twice on the ~3-split
        // scan (measured: two serial 3-task stages, 2.0 + 1.4 s CPU,
        // carrying the whole projection).
        val li = graft.operators.Skew.fanOutByKey(
            Tables.lineitem(s, dir)
              .select(col("l_orderkey"), col("l_linenumber"),
                col("l_shipdate"), col("l_quantity"),
                col("l_extendedprice"), col("l_discount")),
            col("l_orderkey"))
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
        ORDER BY n_a""")),

    // Anti-entropy replica comparison (Merkle/digest-tree, the
    // Cassandra/Dynamo repair primitive): detect WHERE two copies of a
    // table diverge without shipping either copy. Per 4096-key range
    // bucket, a commutative digest = Σ md5-u64(row) (order-independent,
    // so no sort anywhere) + a row count; replicas exchange only the
    // bucket-digest table, and the exact full-outer row diff runs ONLY
    // inside the buckets whose digests disagree. The "remote" replica is
    // derived deterministically in-query: keys ≡0 mod 9973 dropped
    // (missing rows) and values ≡1 mod 7919 shifted (corruption) — both
    // engines build bit-identical replicas and digests (md5_number_lower
    // parity), so the drill-down counts and key checksums gate exactly.
    //
    // Scale: two scans (one per replica) into a partial-aggregated
    // bucket digest ~n/4096 rows; the digest compare is bucket-sized;
    // the drill re-reads only differing buckets (here via a broadcast
    // semi-join on the bad-bucket list — on a real deployment, partition
    // pruning on the bucket column). Nothing row-sized ever crosses
    // replicas.
    QueryDef(
      "q264_merkle_antientropy",
      (s, dir) => {
        import graft.functions.Kernels.{md5Bits, md5BitsU64}
        val a = Tables.orders(s, dir).select(
          col("o_orderkey").as("k"),
          (col("o_totalprice").cast(DecimalType(18, 6)) * 100)
            .cast("long").as("cents"))
        val b = a.where(pmod(col("k"), lit(9973L)) =!= 0)
          .withColumn("cents",
            when(pmod(col("k"), lit(7919L)) === 1, col("cents") + 5)
              .otherwise(col("cents")))
        def dig(df: org.apache.spark.sql.DataFrame) = df.select(
          col("k"), expr("k div 4096").as("bucket"),
          md5BitsU64(md5Bits(concat(lit("ae:"), col("k").cast("string"),
            lit(":"), col("cents").cast("string")))).as("d"))
        val da = dig(a)
        val db = dig(b)
        def lvl(df: org.apache.spark.sql.DataFrame, h: String, n: String) =
          df.groupBy(col("bucket"))
            .agg(sum(col("d")).as(h), count(lit(1)).as(n))
        val cmp = lvl(da, "ha", "na").join(lvl(db, "hb", "nb"),
            Seq("bucket"), "full_outer")
          .withColumn("differ",
            !(col("ha") <=> col("hb")) || !(col("na") <=> col("nb")))
        val bad = cmp.where(col("differ")).select(col("bucket"))
        val buckets = cmp.agg(
          sum(when(col("differ"), 1L).otherwise(0L)).as("v1"),
          count(lit(1)).as("v2"))
          .select(lit("bucket_digest_diff").as("check_kind"),
            col("v1"), col("v2"))
        val drill = da.join(broadcast(bad), "bucket")
          .select(col("k"), col("d").as("d_a"))
          .join(db.join(broadcast(bad), "bucket")
            .select(col("k"), col("d").as("d_b")), Seq("k"), "full_outer")
        val missing = drill.where(col("d_b").isNull)
          .agg(count(lit(1)).as("v1"), sum(col("k")).as("v2"))
          .select(lit("keys_missing_in_b").as("check_kind"), col("v1"), col("v2"))
        val valdiff = drill
          .where(col("d_a").isNotNull && col("d_b").isNotNull &&
            col("d_a") =!= col("d_b"))
          .agg(count(lit(1)).as("v1"), sum(col("k")).as("v2"))
          .select(lit("keys_value_diff").as("check_kind"), col("v1"), col("v2"))
        buckets.unionByName(missing).unionByName(valdiff)
          .orderBy(col("check_kind"))
      },
      Some("""
        WITH a AS (
          SELECT o_orderkey AS k,
                 CAST(CAST(o_totalprice AS DECIMAL(18,6)) * 100 AS BIGINT) AS cents
          FROM orders),
        b AS (
          SELECT k, CASE WHEN k % 7919 = 1 THEN cents + 5 ELSE cents END AS cents
          FROM a WHERE k % 9973 <> 0),
        da AS (
          SELECT k, k // 4096 AS bucket,
                 md5_number_lower('ae:' || CAST(k AS VARCHAR) || ':' ||
                                  CAST(cents AS VARCHAR)) AS d
          FROM a),
        db AS (
          SELECT k, k // 4096 AS bucket,
                 md5_number_lower('ae:' || CAST(k AS VARCHAR) || ':' ||
                                  CAST(cents AS VARCHAR)) AS d
          FROM b),
        la AS (SELECT bucket, SUM(CAST(d AS HUGEINT)) AS ha, COUNT(*) AS na
               FROM da GROUP BY 1),
        lb AS (SELECT bucket, SUM(CAST(d AS HUGEINT)) AS hb, COUNT(*) AS nb
               FROM db GROUP BY 1),
        cmp AS (
          SELECT COALESCE(la.bucket, lb.bucket) AS bucket,
                 (la.ha IS DISTINCT FROM lb.hb
                  OR la.na IS DISTINCT FROM lb.nb) AS differ
          FROM la FULL OUTER JOIN lb ON la.bucket = lb.bucket),
        bad AS (SELECT bucket FROM cmp WHERE differ),
        drill AS (
          SELECT COALESCE(x.k, y.k) AS k, x.d AS d_a, y.d AS d_b
          FROM (SELECT da.* FROM da JOIN bad USING (bucket)) x
          FULL OUTER JOIN (SELECT db.* FROM db JOIN bad USING (bucket)) y
            ON x.k = y.k)
        SELECT 'bucket_digest_diff' AS check_kind,
               CAST((SELECT SUM(CASE WHEN differ THEN 1 ELSE 0 END) FROM cmp)
                 AS BIGINT) AS v1,
               CAST((SELECT COUNT(*) FROM cmp) AS BIGINT) AS v2
        UNION ALL
        SELECT 'keys_missing_in_b',
               CAST(COUNT(*) AS BIGINT), CAST(SUM(k) AS BIGINT)
        FROM drill WHERE d_b IS NULL
        UNION ALL
        SELECT 'keys_value_diff',
               CAST(COUNT(*) AS BIGINT), CAST(SUM(k) AS BIGINT)
        FROM drill WHERE d_a IS NOT NULL AND d_b IS NOT NULL AND d_a <> d_b
        ORDER BY check_kind""")))
}
