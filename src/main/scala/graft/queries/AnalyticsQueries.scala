package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.functions.Kernels._
import graft.operators.Profile
import graft.sources.Tables
import graft.plans.CheckpointPolicy.DataFrameCutOps

/** Round-4 batch 7 — warehouse-analytics operators the reference's mart
  * users run daily, each exact-arithmetic and oracle-gated:
  *
  *  - q101: cohort retention matrix (first-order cohort × month offset)
  *  - q102: market-basket co-purchase pair mining (brand pairs per order)
  *  - q103: interval-sweep max concurrency with day-boundary spill —
  *    the distributed line-sweep pattern (partition by day, clip + spill
  *    intervals across the boundary) so no global sort is ever needed
  *  - q104: time-decayed customer scoring with exact power-of-two weights
  *  - q105: exact-arithmetic outlier detection (cross-multiplied ratio
  *    to customer mean — no doubles, no stddev nondeterminism)
  *  - q106: blocked fuzzy-duplicate detection via Levenshtein on
  *    length-banded prefixes (Σ block² bounded, never all-pairs)
  *  - q107: one-pass table profiler (operators/Profile.scala)
  */
object AnalyticsQueries {

  val defs: Seq[QueryDef] = Seq(

    // Cohort retention: cohort = customer's first order month; a customer
    // is "retained at offset k" if they ordered k calendar months after
    // their cohort month. Two shuffles: window-min per customer (one
    // exchange on o_custkey), then the cohort/offset rollup. At 100 TB the
    // first-order month is a tiny maintained dimension (one row/customer)
    // and the rollup is a straight partial-agg; nothing here is quadratic.
    QueryDef(
      "q101_cohort_retention",
      (s, dir) => {
        val o = Tables.orders(s, dir)
          .select(col("o_custkey"), to_date(date_trunc("MONTH", col("o_orderdate"))).as("om"))
        val w = Window.partitionBy(col("o_custkey"))
        val withCohort = o.withColumn("cohort_month", min(col("om")).over(w))
          .withColumn("month_offset",
            monthsBetweenCalendar(col("om"), col("cohort_month")).cast("long"))
        withCohort.where(col("month_offset") <= 6)
          .groupBy(col("cohort_month"), col("month_offset"))
          .agg(countDistinct(col("o_custkey")).as("retained"))
          .orderBy(col("cohort_month"), col("month_offset"))
      },
      Some("""
        WITH o AS (
          SELECT o_custkey, CAST(date_trunc('month', o_orderdate) AS DATE) AS om
          FROM orders),
        c AS (
          SELECT o_custkey, om,
                 MIN(om) OVER (PARTITION BY o_custkey) AS cohort_month
          FROM o)
        SELECT cohort_month,
               CAST((year(om) - year(cohort_month)) * 12
                    + (month(om) - month(cohort_month)) AS BIGINT) AS month_offset,
               COUNT(DISTINCT o_custkey) AS retained
        FROM c
        WHERE (year(om) - year(cohort_month)) * 12
              + (month(om) - month(cohort_month)) <= 6
        GROUP BY 1, 2
        ORDER BY 1, 2""")),

    // Market-basket pair mining: distinct brands per order, then the
    // within-order self-join (a < b) → pair support counts. The explode is
    // bounded by order width (≤13 lines here, ≤25 brands anywhere), so the
    // pair fan-out is O(orders × width²), never O(brands²); the self-join
    // is co-partitioned on o_orderkey (one exchange, reused both sides).
    // Top-50 by support with full deterministic tiebreak.
    QueryDef(
      "q102_copurchase_pairs",
      (s, dir) => {
        val brands = Tables.lineitem(s, dir)
          .join(broadcast(Tables.part(s, dir)), col("l_partkey") === col("p_partkey"))
          .select(col("l_orderkey").as("ok"), col("p_brand")).distinct()
        val a = brands.select(col("ok"), col("p_brand").as("brand_a"))
        val b = brands.select(col("ok"), col("p_brand").as("brand_b"))
        a.join(b, Seq("ok")).where(col("brand_a") < col("brand_b"))
          .groupBy(col("brand_a"), col("brand_b"))
          .agg(count(lit(1)).as("n_orders"))
          .orderBy(col("n_orders").desc, col("brand_a"), col("brand_b"))
          .limit(50)
      },
      Some("""
        WITH brands AS (
          SELECT DISTINCT l_orderkey AS ok, p_brand
          FROM lineitem JOIN part ON l_partkey = p_partkey)
        SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
               COUNT(*) AS n_orders
        FROM brands a JOIN brands b
          ON a.ok = b.ok AND a.p_brand < b.p_brand
        GROUP BY 1, 2
        ORDER BY n_orders DESC, brand_a, brand_b
        LIMIT 50""")),

    // Interval line-sweep, distributed: each event opens a 30-minute
    // session; max concurrent sessions per day. Sessions crossing midnight
    // are CLIPPED at the boundary and the remainder SPILLED into the next
    // day — so the sweep partitions cleanly by day (one exchange, per-day
    // local sort) instead of one global ordered scan, which is the whole
    // trick at 100 TB. Tie order (ends before starts at the same instant =
    // end-exclusive intervals) is pinned by ORDER BY t, delta; rows with
    // identical (t, delta) are same-sign, so the per-day running max is
    // permutation-invariant → deterministic.
    QueryDef(
      "q103_event_concurrency",
      (s, dir) => {
        val e = Tables.events(s, dir)
          .select(col("ts").as("st"), (col("ts") + expr("INTERVAL 30 MINUTES")).as("en"))
          .withColumn("d1", to_date(col("st")))
          .withColumn("midnight", date_add(col("d1"), 1).cast("timestamp"))
        val clipped = e.select(
          array(
            struct(col("d1").as("day"), col("st").as("t0"),
              least(col("en"), col("midnight")).as("t1")),
            struct(date_add(col("d1"), 1).as("day"), col("midnight").as("t0"),
              col("en").as("t1"))).as("ivs"))
          .select(explode(col("ivs")).as("iv"))
          .select(col("iv.day"), col("iv.t0"), col("iv.t1"))
          .where(col("t1") > col("t0"))
        val points = clipped.select(
            array(
              struct(col("day"), col("t0").as("t"), lit(1L).as("delta")),
              struct(col("day"), col("t1").as("t"), lit(-1L).as("delta"))).as("ps"))
          .select(explode(col("ps")).as("p"))
          .select(col("p.day"), col("p.t"), col("p.delta"))
        val w = Window.partitionBy(col("day")).orderBy(col("t"), col("delta"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        points.withColumn("run", sum(col("delta")).over(w))
          .groupBy(col("day"))
          .agg(max(col("run")).as("max_concurrent"),
            sum(when(col("delta") === 1L, 1L).otherwise(0L)).as("n_sessions"))
          .orderBy(col("day"))
      },
      Some("""
        WITH e AS (
          SELECT ts AS st, ts + INTERVAL 30 MINUTE AS en,
                 CAST(ts AS DATE) AS d1,
                 CAST(CAST(ts AS DATE) + 1 AS TIMESTAMP) AS midnight
          FROM events),
        clipped AS (
          SELECT d1 AS day, st AS t0, LEAST(en, midnight) AS t1 FROM e
          UNION ALL
          SELECT d1 + 1 AS day, midnight AS t0, en AS t1 FROM e
          WHERE en > midnight),
        pts AS (
          SELECT day, t0 AS t, CAST(1 AS BIGINT) AS delta FROM clipped WHERE t1 > t0
          UNION ALL
          SELECT day, t1 AS t, CAST(-1 AS BIGINT) AS delta FROM clipped WHERE t1 > t0),
        sweep AS (
          SELECT day, delta,
                 SUM(delta) OVER (PARTITION BY day ORDER BY t, delta
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
          FROM pts)
        SELECT day, CAST(MAX(run) AS BIGINT) AS max_concurrent,
               CAST(SUM(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
        FROM sweep
        GROUP BY day
        ORDER BY day""")),

    // Time-decayed customer score: weight halves per month of age, capped
    // at 12 months, as EXACT power-of-two integers (weight = 2^(12-age), so
    // 4096 ≡ 1.0) — the decay stays in exact decimal arithmetic instead of
    // float pow(). One partial-agg shuffle on o_custkey; anchor is a pinned
    // literal so the score is reproducible run-over-run.
    QueryDef(
      "q104_decayed_score",
      (s, dir) => {
        val anchor = lit("2001-08-01").cast("date")
        val scored = Tables.orders(s, dir)
          .withColumn("m_ago",
            monthsBetweenCalendar(anchor, to_date(col("o_orderdate"))))
          .withColumn("wt",
            expr("CAST(shiftleft(1L, CAST(12 - least(m_ago, 12) AS INT)) AS BIGINT)"))
          .groupBy(col("o_custkey"))
          .agg(money(sum(dec6(col("o_totalprice")) * col("wt"))).as("score_scaled"),
            count(lit(1)).as("n_orders"))
        scored.select(col("o_custkey"), moneyOut(col("score_scaled")).as("score_scaled"),
            col("n_orders"))
          .orderBy(col("score_scaled").desc, col("o_custkey"))
          .limit(100)
      },
      Some("""
        WITH w AS (
          SELECT o_custkey,
                 CAST(1 AS BIGINT) << CAST(12 - LEAST(
                   (2001 - year(o_orderdate)) * 12 + (8 - month(o_orderdate)),
                   12) AS INT) AS wt,
                 CAST(o_totalprice AS DECIMAL(18,6)) AS price
          FROM orders)
        SELECT o_custkey,
               CAST(CAST(SUM(price * wt) AS DECIMAL(38,6)) AS DOUBLE) AS score_scaled,
               COUNT(*) AS n_orders
        FROM w
        GROUP BY o_custkey
        ORDER BY score_scaled DESC, o_custkey
        LIMIT 100""")),

    // Outlier orders, exact arithmetic: an order is an outlier when its
    // amount exceeds 3× its customer's mean order value. The comparison is
    // cross-multiplied (amount × n > 3 × total) so it stays in exact
    // decimals — no division, no doubles, no stddev formula drift between
    // engines. One window exchange on o_custkey + a broadcast dim join.
    QueryDef(
      "q105_outlier_orders",
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
        val flagged = Tables.orders(s, dir)
          .withColumn("amt", dec6(col("o_totalprice")))
          .withColumn("cnt", count(lit(1)).over(w))
          .withColumn("tot", money(sum(col("amt")).over(w)))
          .withColumn("is_outlier",
            col("amt") * col("cnt").cast(DecimalType(12, 0)) >
              lit(BigDecimal(3)).cast(DecimalType(12, 0)) * col("tot"))
        flagged
          .join(broadcast(Tables.customer(s, dir)),
            col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n_orders"),
            sum(when(col("is_outlier"), 1L).otherwise(0L)).as("n_outliers"),
            sum(when(col("is_outlier"), col("o_orderkey"))).as("outlier_keysum"))
          .orderBy(col("c_mktsegment"))
      },
      Some("""
        WITH f AS (
          SELECT o_orderkey, o_custkey,
                 CAST(o_totalprice AS DECIMAL(18,6)) AS amt,
                 COUNT(*) OVER (PARTITION BY o_custkey) AS cnt,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
                      OVER (PARTITION BY o_custkey) AS DECIMAL(38,6)) AS tot
          FROM orders)
        SELECT c.c_mktsegment,
               COUNT(*) AS n_orders,
               CAST(SUM(CASE WHEN f.amt * cnt > 3 * f.tot THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
               CAST(SUM(CASE WHEN f.amt * cnt > 3 * f.tot THEN f.o_orderkey END) AS BIGINT) AS outlier_keysum
        FROM f JOIN customer c ON f.o_custkey = c.c_custkey
        GROUP BY 1
        ORDER BY 1""")),

    // Blocked fuzzy-duplicate candidates: Levenshtein ≤ 1 name pairs
    // inside 16-char-prefix blocks. The block key bounds the self-join to
    // Σ block² (≤100 names/block on this corpus) — the same banded-
    // blocking stance as the LSH dedup family, with an edit-distance
    // verifier instead of Jaccard. Reported per block: candidate-pair
    // count vs verified-match count (the blocking-efficiency audit).
    QueryDef(
      "q106_fuzzy_name_pairs",
      (s, dir) => {
        // fanOutRead: the one-split customer scan serialized the whole
        // Σblock² levenshtein verify on ONE task (measured 2.5 s CPU);
        // both join sides derive from the fanned frame and reuse the
        // exchange, so the probe side runs at full width
        val named = graft.operators.Skew.fanOutRead(Tables.customer(s, dir)
          .select(col("c_name"), substring(col("c_name"), 1, 16).as("blk")))
        val a = named.select(col("blk"), col("c_name").as("name_a"))
        val b = named.select(col("blk"), col("c_name").as("name_b"))
        val pairs = a.join(b, Seq("blk")).where(col("name_a") < col("name_b"))
          .withColumn("is_match", levenshtein(col("name_a"), col("name_b")) <= 1)
        pairs.groupBy(col("blk"))
          .agg(count(lit(1)).as("n_candidates"),
            sum(when(col("is_match"), 1L).otherwise(0L)).as("n_matches"))
          .orderBy(col("blk"))
      },
      Some("""
        WITH named AS (
          SELECT c_name, substr(c_name, 1, 16) AS blk FROM customer)
        SELECT a.blk,
               COUNT(*) AS n_candidates,
               CAST(SUM(CASE WHEN levenshtein(a.c_name, b.c_name) <= 1
                   THEN 1 ELSE 0 END) AS BIGINT) AS n_matches
        FROM named a JOIN named b
          ON a.blk = b.blk AND a.c_name < b.c_name
        GROUP BY 1
        ORDER BY 1""")),

    // Pareto frontier (skyline) of parts on (price, size): a part is on
    // the frontier iff no part is BOTH strictly cheaper and strictly
    // smaller — equivalently, its size beats min(size) over all strictly
    // cheaper parts. Computed WITHOUT a global-sort window: $100 price
    // bands give a per-band RANGE running min (parallel), and a prefix
    // min over the tiny band table (bounded rows) covers everything in
    // earlier bands — the two-level sweep that scales where a single
    // ORDER BY price window cannot. Prices go through decimal(18,2)
    // cents so band/compare arithmetic is exact integers.
    QueryDef(
      "q109_pareto_frontier",
      (s, dir) => {
        val parts = Tables.part(s, dir).select(col("p_partkey"),
          (col("p_retailprice").cast(DecimalType(18, 2)) * 100)
            .cast("long").as("price_cents"),
          col("p_size").cast("long").as("psize"))
        val banded = parts.withColumn("band", expr("price_cents div 10000"))
        val bandMin = banded.groupBy(col("band")).agg(min(col("psize")).as("band_min"))
        val wBands = Window.orderBy(col("band"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val prefix = bandMin.withColumn("prev_min", min(col("band_min")).over(wBands))
          .select(col("band"), col("prev_min"))
        val wLocal = Window.partitionBy(col("band")).orderBy(col("price_cents"))
          .rangeBetween(Window.unboundedPreceding, -1)
        banded.join(prefix, Seq("band"))
          .withColumn("local_min", min(col("psize")).over(wLocal))
          .withColumn("min_cheaper",
            least(coalesce(col("local_min"), lit(Long.MaxValue)),
              coalesce(col("prev_min"), lit(Long.MaxValue))))
          .where(col("min_cheaper") >= col("psize"))
          .select(col("p_partkey"), col("price_cents"), col("psize"))
          .orderBy(col("price_cents"), col("p_partkey"))
      },
      Some("""
        WITH parts AS (
          SELECT p_partkey,
                 CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS price_cents,
                 CAST(p_size AS BIGINT) AS psize
          FROM part)
        SELECT p_partkey, price_cents, psize
        FROM parts p
        WHERE NOT EXISTS (
          SELECT 1 FROM parts q
          WHERE q.price_cents < p.price_cents AND q.psize < p.psize)
        ORDER BY price_cents, p_partkey""")),

    // One-pass table profiler over orders (operators/Profile.scala):
    // null / exact-distinct / min / max per column in a single aggregate.
    // Columns pass in canonical form (decimal money, date) so the string
    // boundary is engine-portable.
    QueryDef(
      "q107_column_profile",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        Profile.profile(o, Seq(
            "o_orderkey" -> col("o_orderkey"),
            "o_custkey" -> col("o_custkey"),
            "o_orderstatus" -> col("o_orderstatus"),
            "o_totalprice" -> dec6(col("o_totalprice")),
            "o_orderdate" -> to_date(col("o_orderdate")),
            "o_orderpriority" -> col("o_orderpriority")))
          .orderBy(col("col_name"))
      },
      Some("""
        SELECT col_name, n_null, n_distinct, min_str, max_str FROM (
          SELECT 'o_orderkey' AS col_name,
                 COUNT(*) - COUNT(o_orderkey) AS n_null,
                 COUNT(DISTINCT o_orderkey) AS n_distinct,
                 CAST(MIN(o_orderkey) AS VARCHAR) AS min_str,
                 CAST(MAX(o_orderkey) AS VARCHAR) AS max_str
          FROM orders
          UNION ALL
          SELECT 'o_custkey', COUNT(*) - COUNT(o_custkey),
                 COUNT(DISTINCT o_custkey),
                 CAST(MIN(o_custkey) AS VARCHAR), CAST(MAX(o_custkey) AS VARCHAR)
          FROM orders
          UNION ALL
          SELECT 'o_orderstatus', COUNT(*) - COUNT(o_orderstatus),
                 COUNT(DISTINCT o_orderstatus),
                 MIN(o_orderstatus), MAX(o_orderstatus)
          FROM orders
          UNION ALL
          SELECT 'o_totalprice', COUNT(*) - COUNT(o_totalprice),
                 COUNT(DISTINCT CAST(o_totalprice AS DECIMAL(18,6))),
                 CAST(MIN(CAST(o_totalprice AS DECIMAL(18,6))) AS VARCHAR),
                 CAST(MAX(CAST(o_totalprice AS DECIMAL(18,6))) AS VARCHAR)
          FROM orders
          UNION ALL
          SELECT 'o_orderdate', COUNT(*) - COUNT(o_orderdate),
                 COUNT(DISTINCT CAST(o_orderdate AS DATE)),
                 CAST(MIN(CAST(o_orderdate AS DATE)) AS VARCHAR),
                 CAST(MAX(CAST(o_orderdate AS DATE)) AS VARCHAR)
          FROM orders
          UNION ALL
          SELECT 'o_orderpriority', COUNT(*) - COUNT(o_orderpriority),
                 COUNT(DISTINCT o_orderpriority),
                 MIN(o_orderpriority), MAX(o_orderpriority)
          FROM orders)
        ORDER BY col_name""")),

    // Weighted median: the smallest account balance whose cumulative
    // order-count weight reaches half the segment total — all weight
    // arithmetic exact integers (2·cumw ≥ totw cross-multiplication, no
    // halves), the median itself an actual element picked by total order
    // (balance, custkey). The cumulative weight uses the q236/q242
    // two-level bucketed scheme PER SEGMENT — per-(segment, cents/4096)
    // bucket totals prefix-summed on the bounded bucket table, row-level
    // windows partitioned by (segment, bucket) — so parallelism is
    // segments × buckets, not capped at the 5 segments. The median row
    // itself falls out of a plain min(struct) aggregate over the
    // past-half rows (no pick window at all).
    QueryDef(
      "q133_weighted_median",
      (s, dir) => {
        val weights = Tables.orders(s, dir)
          .groupBy(col("o_custkey")).agg(count(lit(1)).as("w"))
        val c = Tables.customer(s, dir)
          .join(weights, col("c_custkey") === col("o_custkey"), "left")
          .select(col("c_mktsegment").as("segment"), col("c_custkey"),
            col("c_acctbal"), coalesce(col("w"), lit(0L)).as("w"))
        val b = c.withColumn("cents",
            (col("c_acctbal").cast(org.apache.spark.sql.types.DecimalType(18, 6)) * 100)
              .cast("long"))
          .withColumn("bkt", expr("cents div 4096"))
          // consumed 3x (bucket totals, segment totals, cumulative join):
          // materialize the orders-weights join once
          .cutLineage()
        val wOff = Window.partitionBy(col("segment")).orderBy(col("bkt"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val boff = b.groupBy(col("segment"), col("bkt"))
          .agg(sum(col("w")).as("bw"))
          .withColumn("offw", coalesce(sum(col("bw")).over(wOff), lit(0L)))
          .select(col("segment"), col("bkt"), col("offw"))
        val totw = b.groupBy(col("segment")).agg(sum(col("w")).as("totw"))
        val wIn = Window.partitionBy(col("segment"), col("bkt"))
          .orderBy(col("c_acctbal"), col("c_custkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val past = b.join(broadcast(boff), Seq("segment", "bkt"))
          .withColumn("cumw", col("offw") + sum(col("w")).over(wIn))
          .join(broadcast(totw), "segment")
          .where(col("cumw") * 2 >= col("totw"))
        past.groupBy(col("segment"))
          .agg(min(struct(col("c_acctbal"), col("c_custkey"))).as("m"),
            min(col("totw")).as("totw"))
          .select(col("segment"), col("m.c_acctbal").as("weighted_median"),
            col("m.c_custkey").as("median_custkey"), col("totw"))
          .orderBy(col("segment"))
      },
      Some("""
        WITH weights AS (
          SELECT o_custkey, COUNT(*) AS w FROM orders GROUP BY 1),
        c AS (
          SELECT cu.c_mktsegment AS segment, cu.c_custkey, cu.c_acctbal,
                 COALESCE(w.w, 0) AS w
          FROM customer cu LEFT JOIN weights w ON cu.c_custkey = w.o_custkey),
        cum AS (
          SELECT segment, c_custkey, c_acctbal,
                 SUM(w) OVER (PARTITION BY segment
                   ORDER BY c_acctbal, c_custkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw,
                 SUM(w) OVER (PARTITION BY segment) AS totw
          FROM c),
        pick AS (
          SELECT segment, c_acctbal, c_custkey, totw,
                 row_number() OVER (PARTITION BY segment
                   ORDER BY c_acctbal, c_custkey) AS rn
          FROM cum WHERE cumw * 2 >= totw)
        SELECT segment, c_acctbal AS weighted_median,
               c_custkey AS median_custkey, CAST(totw AS BIGINT) AS totw
        FROM pick WHERE rn = 1
        ORDER BY segment""")),

    // Quantile (rank) normalization — the ML-preprocessing step mapping a
    // feature to [0,1] by rank: reported in exact permille integers,
    // (rank−1)·1000 div (n−1), so the gate has no division drift. rank()
    // gives ties identical normalized values (the statistical convention)
    // and the window partitions by segment — no global sort.
    QueryDef(
      "q138_quantile_normalize",
      (s, dir) => {
        val w = Window.partitionBy(col("segment")).orderBy(col("c_acctbal"))
        val wAll = Window.partitionBy(col("segment"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        Tables.customer(s, dir)
          .select(col("c_mktsegment").as("segment"), col("c_custkey"),
            col("c_acctbal"))
          .withColumn("rnk", rank().over(w).cast("long"))
          .withColumn("n", count(lit(1)).over(wAll))
          .selectExpr("segment", "c_custkey", "c_acctbal",
            "((rnk - 1) * 1000) div (n - 1) AS norm_permille")
          .groupBy(col("segment"))
          .agg(count(lit(1)).as("n_customers"),
            sum(col("norm_permille")).as("permille_sum"),
            sum(col("norm_permille") * col("c_custkey")).as("weighted_checksum"))
          .orderBy(col("segment"))
      },
      Some("""
        WITH ranked AS (
          SELECT c_mktsegment AS segment, c_custkey, c_acctbal,
                 CAST(rank() OVER (PARTITION BY c_mktsegment
                   ORDER BY c_acctbal) AS BIGINT) AS rnk,
                 COUNT(*) OVER (PARTITION BY c_mktsegment) AS n
          FROM customer),
        norm AS (
          SELECT segment, c_custkey,
                 ((rnk - 1) * 1000) // (n - 1) AS norm_permille
          FROM ranked)
        SELECT segment, COUNT(*) AS n_customers,
               CAST(SUM(norm_permille) AS BIGINT) AS permille_sum,
               CAST(SUM(norm_permille * c_custkey) AS BIGINT) AS weighted_checksum
        FROM norm
        GROUP BY segment
        ORDER BY segment""")),

    // Row-level table diff — the data-diff audit between two snapshots:
    // full-row md5 over canonical string forms classifies every key as
    // identical / changed / only-left / only-right in ONE full-outer
    // join on the key (both sides pre-hashed map-side, so the shuffle
    // carries 32-byte digests, never the row payload — the 100 TB diff
    // shape). Corpus: the q137 snapshot drift vs the original.
    QueryDef(
      "q139_table_diff",
      (s, dir) => {
        def rowHash(status: org.apache.spark.sql.Column,
            price: org.apache.spark.sql.Column) =
          md5(concat_ws("|", status, price.cast("string")))
        val left = Tables.orders(s, dir).select(
          col("o_orderkey").as("k"),
          rowHash(col("o_orderstatus"), dec6(col("o_totalprice"))).as("lh"))
        val right = Tables.orders(s, dir)
          .where(col("o_orderkey") % 7 =!= 0)
          .select(col("o_orderkey").as("k"),
            rowHash(
              when(col("o_orderkey") % 5 === 0, lit("R")).otherwise(col("o_orderstatus")),
              when(col("o_orderkey") % 5 === 0,
                (dec6(col("o_totalprice")) + lit(5)).cast(DecimalType(18, 6)))
                .otherwise(dec6(col("o_totalprice")))).as("rh"))
        left.join(right, Seq("k"), "full_outer")
          .select(col("k"),
            when(col("rh").isNull, "only_left")
              .when(col("lh").isNull, "only_right")
              .when(col("lh") === col("rh"), "identical")
              .otherwise("changed").as("diff"))
          .groupBy(col("diff"))
          .agg(count(lit(1)).as("n_keys"), sum(col("k")).as("key_checksum"))
          .orderBy(col("diff"))
      },
      Some("""
        WITH l AS (
          SELECT o_orderkey AS k,
                 md5(o_orderstatus || '|' ||
                     CAST(CAST(o_totalprice AS DECIMAL(18,6)) AS VARCHAR)) AS lh
          FROM orders),
        r AS (
          SELECT o_orderkey AS k,
                 md5(CASE WHEN o_orderkey % 5 = 0 THEN 'R' ELSE o_orderstatus END
                     || '|' ||
                     CAST(CASE WHEN o_orderkey % 5 = 0
                               THEN CAST(CAST(o_totalprice AS DECIMAL(18,6)) + 5
                                         AS DECIMAL(18,6))
                               ELSE CAST(o_totalprice AS DECIMAL(18,6)) END
                          AS VARCHAR)) AS rh
          FROM orders WHERE o_orderkey % 7 <> 0),
        d AS (
          SELECT COALESCE(l.k, r.k) AS k,
                 CASE WHEN r.k IS NULL THEN 'only_left'
                      WHEN l.k IS NULL THEN 'only_right'
                      WHEN l.lh = r.rh THEN 'identical'
                      ELSE 'changed' END AS diff
          FROM l FULL OUTER JOIN r ON l.k = r.k)
        SELECT diff, COUNT(*) AS n_keys,
               CAST(SUM(k) AS BIGINT) AS key_checksum
        FROM d
        GROUP BY diff
        ORDER BY diff""")),

    // Key-skew audit — the pre-shuffle planning probe: per-key row counts
    // of the lineitem join key, folded into a log2-bucket occupancy
    // histogram (pure shifts/CASE, no doubles) plus an exact
    // cross-multiplied hot-key flag per bucket (bucket_max × n_keys >
    // 4 × total ⇒ the key family would dominate a reducer). This is the
    // statistic that decides salting/AQE-skew-split BEFORE the shuffle
    // runs; two partial aggs, both on the key then the bucket.
    QueryDef(
      "q121_key_skew_audit",
      (s, dir) => {
        val counts = Tables.lineitem(s, dir)
          .groupBy(col("l_orderkey")).agg(count(lit(1)).as("cnt"))
        val bucketed = counts.selectExpr("l_orderkey", "cnt",
          // log2 occupancy bucket via comparison ladder (cnt ≤ 16 here,
          // but the ladder is total for any count)
          """CASE WHEN cnt >= 16 THEN 4 WHEN cnt >= 8 THEN 3
                  WHEN cnt >= 4 THEN 2 WHEN cnt >= 2 THEN 1
                  ELSE 0 END AS log2_bucket""")
        val w = org.apache.spark.sql.expressions.Window
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        bucketed.groupBy(col("log2_bucket"))
          .agg(count(lit(1)).as("n_keys"), sum(col("cnt")).as("n_rows"),
            max(col("cnt")).as("bucket_max"))
          .withColumn("total_rows", sum(col("n_rows")).over(w)) // bucket table: ≤5 rows
          .withColumn("dominates",
            col("bucket_max") * col("n_keys") > col("total_rows") * 4)
          .orderBy(col("log2_bucket"))
      },
      Some("""
        WITH counts AS (
          SELECT l_orderkey, COUNT(*) AS cnt FROM lineitem GROUP BY 1),
        bucketed AS (
          SELECT l_orderkey, cnt,
                 CASE WHEN cnt >= 16 THEN 4 WHEN cnt >= 8 THEN 3
                      WHEN cnt >= 4 THEN 2 WHEN cnt >= 2 THEN 1
                      ELSE 0 END AS log2_bucket
          FROM counts),
        hist AS (
          SELECT log2_bucket, COUNT(*) AS n_keys,
                 CAST(SUM(cnt) AS BIGINT) AS n_rows,
                 CAST(MAX(cnt) AS BIGINT) AS bucket_max
          FROM bucketed GROUP BY 1),
        t AS (SELECT CAST(SUM(n_rows) AS BIGINT) AS total_rows FROM hist)
        SELECT h.log2_bucket, h.n_keys, h.n_rows, h.bucket_max, t.total_rows,
               h.bucket_max * h.n_keys > t.total_rows * 4 AS dominates
        FROM hist h, t
        ORDER BY h.log2_bucket""")),

    // Association rules over order baskets (the market-basket classic,
    // on top of q102's pair supports): brand pairs with support ≥ 1% of
    // baskets, emitted as DIRECTED rules with confidence
    // sup(a∪b)/sup(a) and lift sup(a∪b)·N/(sup(a)·sup(b)). All
    // thresholds and metrics stay in exact integer cross-multiplied
    // form (`sup_ab·100 ≥ N`, one double division per metric at emit).
    // Scale: candidate pairs come from the per-basket self-join — cost
    // Σ_basket |items|² with |items| small and bounded, never catalog²;
    // item supports are one partial-agg pass; N is a broadcast scalar.
    // The directed expansion is a 2-row explode of the undirected pair —
    // no second join.
    QueryDef(
      "q207_assoc_rules",
      (s, dir) => {
        val brands = Tables.lineitem(s, dir)
          .join(broadcast(Tables.part(s, dir)), col("l_partkey") === col("p_partkey"))
          .select(col("l_orderkey").as("ok"), col("p_brand")).distinct()
          .cutLineage()  // brands feeds FOUR consumers (N, supports, both pair sides)
        val nBaskets = brands.agg(count_distinct(col("ok")).as("n_baskets"))
        val supports = brands.groupBy(col("p_brand")).agg(count(lit(1)).as("sup"))
        val a = brands.select(col("ok"), col("p_brand").as("brand_a"))
        val b = brands.select(col("ok"), col("p_brand").as("brand_b"))
        val pairSup = a.join(b, Seq("ok")).where(col("brand_a") < col("brand_b"))
          .groupBy(col("brand_a"), col("brand_b"))
          .agg(count(lit(1)).as("sup_ab"))
        val directed = pairSup.select(explode(array(
            struct(col("brand_a").as("antecedent"), col("brand_b").as("consequent"),
              col("sup_ab")),
            struct(col("brand_b").as("antecedent"), col("brand_a").as("consequent"),
              col("sup_ab")))).as("r"))
          .select(col("r.antecedent").as("antecedent"),
            col("r.consequent").as("consequent"), col("r.sup_ab").as("sup_ab"))
        directed
          .join(broadcast(supports.select(col("p_brand").as("antecedent"),
            col("sup").as("sup_a"))), Seq("antecedent"))
          .join(broadcast(supports.select(col("p_brand").as("consequent"),
            col("sup").as("sup_b"))), Seq("consequent"))
          .crossJoin(broadcast(nBaskets))
          .where(col("sup_ab") * 100 >= col("n_baskets"))
          .select(col("antecedent"), col("consequent"),
            col("sup_ab"), col("sup_a"), col("sup_b"), col("n_baskets"),
            (col("sup_ab").cast("double") / col("sup_a")).as("confidence"),
            ((col("sup_ab") * col("n_baskets")).cast("double") /
              (col("sup_a") * col("sup_b"))).as("lift"))
          .orderBy(col("antecedent"), col("consequent"))
      },
      Some("""
        WITH brands AS (
          SELECT DISTINCT l_orderkey AS ok, p_brand
          FROM lineitem JOIN part ON l_partkey = p_partkey),
        n AS (SELECT CAST(COUNT(DISTINCT ok) AS BIGINT) AS n_baskets FROM brands),
        sup AS (SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS sup FROM brands GROUP BY 1),
        pair_sup AS (
          SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
                 CAST(COUNT(*) AS BIGINT) AS sup_ab
          FROM brands a JOIN brands b ON a.ok = b.ok AND a.p_brand < b.p_brand
          GROUP BY 1, 2),
        directed AS (
          SELECT brand_a AS antecedent, brand_b AS consequent, sup_ab FROM pair_sup
          UNION ALL
          SELECT brand_b AS antecedent, brand_a AS consequent, sup_ab FROM pair_sup)
        SELECT d.antecedent, d.consequent, d.sup_ab,
               sa.sup AS sup_a, sb.sup AS sup_b, n.n_baskets,
               d.sup_ab::DOUBLE / sa.sup AS confidence,
               (d.sup_ab * n.n_baskets)::DOUBLE / (sa.sup * sb.sup) AS lift
        FROM directed d
        JOIN sup sa ON sa.p_brand = d.antecedent
        JOIN sup sb ON sb.p_brand = d.consequent
        CROSS JOIN n
        WHERE d.sup_ab * 100 >= n.n_baskets
        ORDER BY d.antecedent, d.consequent""")),

    // Price-volume-mix decomposition — the FP&A bridge explaining a
    // period-over-period revenue delta (1996 → 1997 shipped revenue per
    // brand): for parts sold in BOTH periods, Δrev splits into
    // volume (Δq·p₀), price (q₀·Δp) and cross (Δq·Δp) effects with
    // p = r/q the per-part average unit price; parts sold only in one
    // period contribute their whole revenue as new/discontinued. The
    // rational unit prices never become floats: each per-part effect is
    // a micro-cent integral divide with the part's OWN denominator
    // (q₀ or q₀·q₁), truncation-toward-zero — Spark `div` and DuckDB
    // `//` agree on signed operands — so vol+price+cross reconciles to
    // Δrev up to the per-part truncation the spec fixes. Scale: one
    // (part, year) partial agg, a self-join on the part key, then a
    // brand rollup — all equi-shuffles on p_partkey/brand.
    QueryDef(
      "q247_mix_shift",
      (s, dir) => {
        val l = Tables.lineitem(s, dir)
          .where(year(col("l_shipdate")).isin(1996, 1997))
          .select(col("l_partkey").as("pk"),
            year(col("l_shipdate")).as("yr"),
            col("l_quantity").cast("long").as("q"),
            (col("l_extendedprice").cast(DecimalType(18, 2)) * 100)
              .cast("long").as("r"))
        val py = l.groupBy(col("pk"), col("yr"))
          .agg(sum(col("q")).as("q"), sum(col("r")).as("r"))
        val p0 = py.where(col("yr") === 1996)
          .select(col("pk"), col("q").as("q0"), col("r").as("r0"))
        val p1 = py.where(col("yr") === 1997)
          .select(col("pk"), col("q").as("q1"), col("r").as("r1"))
        val brand = Tables.part(s, dir)
          .select(col("p_partkey"), col("p_brand").as("brand"))
        val joined = p0.join(p1, Seq("pk"), "full_outer")
          .join(broadcast(brand), col("pk") === col("p_partkey"))
        val effects = joined.select(col("brand"),
          coalesce(col("r0"), lit(0L)).as("r0"),
          coalesce(col("r1"), lit(0L)).as("r1"),
          // vol numerator rides DECIMAL(38,0) like the price/cross terms:
          // plain BIGINT has ~100x headroom at sf1 but WRAPS silently on
          // overflow (non-ANSI) where DuckDB HUGEINT keeps going — the
          // engines must fail/succeed together at any scale
          when(col("q0").isNotNull && col("q1").isNotNull,
            expr("(1000000 * (CAST(q1 - q0 AS DECIMAL(38,0)) * r0)) div CAST(q0 AS DECIMAL(38,0))"))
            .otherwise(0L).cast("long").as("vol_uc"),
          when(col("q0").isNotNull && col("q1").isNotNull,
            expr("(1000000 * (CAST(r1 AS DECIMAL(38,0)) * q0 - CAST(r0 AS DECIMAL(38,0)) * q1)) div (CAST(q0 AS DECIMAL(38,0)) * q1)"))
            .otherwise(0L).cast("long").as("price_uc"),
          when(col("q0").isNotNull && col("q1").isNotNull,
            expr("CAST((1000000 * (CAST(q1 - q0 AS DECIMAL(38,0)) * (CAST(r1 AS DECIMAL(38,0)) * q0 - CAST(r0 AS DECIMAL(38,0)) * q1))) div (CAST(q0 AS DECIMAL(38,0)) * q0 * q1) AS BIGINT)"))
            .otherwise(0L).as("cross_uc"),
          when(col("q0").isNull, col("r1")).otherwise(0L).as("new_cents"),
          when(col("q1").isNull, col("r0")).otherwise(0L).as("gone_cents"))
        effects.groupBy(col("brand"))
          .agg(sum(col("r0")).as("rev0_cents"), sum(col("r1")).as("rev1_cents"),
            sum(col("vol_uc")).as("vol_effect_ucents"),
            sum(col("price_uc")).as("price_effect_ucents"),
            sum(col("cross_uc")).as("cross_effect_ucents"),
            sum(col("new_cents")).as("new_parts_cents"),
            sum(col("gone_cents")).as("discontinued_cents"))
          .orderBy(col("brand"))
      },
      Some("""
        WITH l AS (
          SELECT l_partkey AS pk, year(l_shipdate) AS yr,
                 CAST(l_quantity AS BIGINT) AS q,
                 CAST(CAST(l_extendedprice AS DECIMAL(18,2))*100 AS BIGINT) AS r
          FROM lineitem WHERE year(l_shipdate) IN (1996, 1997)),
        py AS (
          SELECT pk, yr, CAST(SUM(q) AS BIGINT) AS q, CAST(SUM(r) AS BIGINT) AS r
          FROM l GROUP BY 1, 2),
        p0 AS (SELECT pk, q AS q0, r AS r0 FROM py WHERE yr = 1996),
        p1 AS (SELECT pk, q AS q1, r AS r1 FROM py WHERE yr = 1997),
        joined AS (
          SELECT COALESCE(p0.pk, p1.pk) AS pk, q0, r0, q1, r1
          FROM p0 FULL OUTER JOIN p1 ON p0.pk = p1.pk),
        effects AS (
          SELECT b.p_brand AS brand,
                 COALESCE(r0, 0) AS r0, COALESCE(r1, 0) AS r1,
                 CASE WHEN q0 IS NOT NULL AND q1 IS NOT NULL
                      THEN CAST((1000000 * (CAST(q1 - q0 AS HUGEINT) * r0))
                           // q0 AS BIGINT) ELSE 0 END AS vol_uc,
                 CASE WHEN q0 IS NOT NULL AND q1 IS NOT NULL
                      THEN CAST((1000000 * (CAST(r1 AS HUGEINT) * q0 - CAST(r0 AS HUGEINT) * q1))
                           // (CAST(q0 AS HUGEINT) * q1) AS BIGINT) ELSE 0 END AS price_uc,
                 CASE WHEN q0 IS NOT NULL AND q1 IS NOT NULL
                      THEN CAST((1000000 * (CAST(q1 - q0 AS HUGEINT) * (CAST(r1 AS HUGEINT) * q0 - CAST(r0 AS HUGEINT) * q1)))
                           // (CAST(q0 AS HUGEINT) * q0 * q1) AS BIGINT) ELSE 0 END AS cross_uc,
                 CASE WHEN q0 IS NULL THEN r1 ELSE 0 END AS new_cents,
                 CASE WHEN q1 IS NULL THEN r0 ELSE 0 END AS gone_cents
          FROM joined j JOIN part b ON j.pk = b.p_partkey)
        SELECT brand,
               CAST(SUM(r0) AS BIGINT) AS rev0_cents,
               CAST(SUM(r1) AS BIGINT) AS rev1_cents,
               CAST(SUM(vol_uc) AS BIGINT) AS vol_effect_ucents,
               CAST(SUM(price_uc) AS BIGINT) AS price_effect_ucents,
               CAST(SUM(cross_uc) AS BIGINT) AS cross_effect_ucents,
               CAST(SUM(new_cents) AS BIGINT) AS new_parts_cents,
               CAST(SUM(gone_cents) AS BIGINT) AS discontinued_cents
        FROM effects
        GROUP BY brand
        ORDER BY brand""")))
}
