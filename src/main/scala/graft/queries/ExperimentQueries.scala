package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.functions.Kernels.{md5Bits, md5BitsModK}
import graft.sources.Tables
import graft.plans.CheckpointPolicy.DataFrameCutOps

/** Round-5 late batch — experimentation + governance analytics: the
  * privacy audit (k-anonymity), the attribution and experiment-analysis
  * closed forms (U-shaped multi-touch, two-proportion z, CUPED), and the
  * classic FIFO application of payments to invoices. Everything follows
  * the repo's exact-integer stance: credits are 10×-scaled cents, test
  * statistics come from exact BIGINT/DECIMAL(38,0) moments with ONE
  * identical IEEE closed form at the end (the q168 REGR pattern), and
  * FIFO allocation is interval intersection of exact cumulative cents —
  * no iterative matching loop, no floats in the match itself.
  */
object ExperimentQueries {

  val defs: Seq[QueryDef] = Seq(

    // k-anonymity audit over customer quasi-identifiers (nation,
    // market segment, account balance rounded to $1k). For each policy
    // threshold k ∈ {2,5,10}: how many equivalence classes fall below k
    // and how many rows they re-identify. The QI space is bounded
    // (25 nations × 5 segments × ~11 balance buckets), so the class-size
    // frame the thresholds scan is tiny regardless of row count — ONE
    // full-data aggregate, then arithmetic on ≤1375 rows.
    QueryDef(
      "q179_k_anonymity",
      (s, dir) => {
        val c = Tables.customer(s, dir)
        val n = Tables.nation(s, dir).select(col("n_nationkey"), col("n_name"))
        val classes = c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .select(col("n_name"), col("c_mktsegment"),
            floor(col("c_acctbal") / 1000.0).cast("long").as("bal_bucket"))
          .groupBy(col("n_name"), col("c_mktsegment"), col("bal_bucket"))
          .agg(count(lit(1)).as("cls"))
        val ks = s.range(1).select(explode(array(lit(2L), lit(5L), lit(10L))).as("k"))
        classes.crossJoin(broadcast(ks))
          .groupBy(col("k"))
          .agg(
            count(lit(1)).as("n_classes"),
            sum(when(col("cls") < col("k"), 1L).otherwise(0L)).as("classes_below_k"),
            sum(when(col("cls") < col("k"), col("cls")).otherwise(0L)).as("rows_at_risk"),
            min(col("cls")).as("min_class"),
            max(col("cls")).as("max_class"))
          .orderBy(col("k"))
      },
      Some("""
        WITH cls AS (
          SELECT n.n_name, c.c_mktsegment,
                 CAST(FLOOR(c.c_acctbal / 1000.0) AS BIGINT) AS bal_bucket,
                 CAST(COUNT(*) AS BIGINT) AS cls
          FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
          GROUP BY 1, 2, 3)
        SELECT k,
               CAST(COUNT(*) AS BIGINT) AS n_classes,
               CAST(SUM(CASE WHEN cls < k THEN 1 ELSE 0 END) AS BIGINT) AS classes_below_k,
               CAST(SUM(CASE WHEN cls < k THEN cls ELSE 0 END) AS BIGINT) AS rows_at_risk,
               CAST(MIN(cls) AS BIGINT) AS min_class,
               CAST(MAX(cls) AS BIGINT) AS max_class
        FROM cls CROSS JOIN (SELECT CAST(UNNEST([2,5,10]) AS BIGINT) AS k)
        GROUP BY k ORDER BY k""")),

    // U-shaped (position-based) multi-touch attribution with EXACT
    // integer credits. Journey = each user's click/view/signup touches
    // before their first purchase; the purchase's cents are credited
    // 40% first touch / 40% last touch / 20% the "dominant middle"
    // (the touch nearest the positional midpoint, earlier on ties) —
    // the standard U-shape with the middle pool assigned to one
    // deterministic touch so every credit is an exact multiple of
    // cents/10 (n=1 → 100%, n=2 → 50/50). Credits are emitted
    // 10×-scaled (credit_x10 = 4×/2×/5×/10× cents) so nothing is ever
    // divided. One window sort per user; the credit rollup is by
    // event_type (5 groups).
    QueryDef(
      "q180_position_attribution",
      (s, dir) => {
        val e = Tables.events(s, dir)
        val firstPurchase = e.where(col("event_type") === "purchase")
          .groupBy(col("user_id"))
          .agg(min_by(struct(col("ts"), col("event_id"), col("value")),
            struct(col("ts"), col("event_id"))).as("fp"))
          .select(col("user_id"), col("fp.ts").as("p_ts"), col("fp.event_id").as("p_id"),
            (col("fp.value").cast(DecimalType(18, 2)) * 100).cast("long").as("cents"))
        val touches = e.where(col("event_type").isin("click", "view", "signup"))
          .join(firstPurchase, "user_id")
          .where(col("ts") < col("p_ts") ||
            (col("ts") === col("p_ts") && col("event_id") < col("p_id")))
        val w = Window.partitionBy(col("user_id"))
        val byTime = w.orderBy(col("ts"), col("event_id"))
        val ranked = touches
          .withColumn("rn", row_number().over(byTime).cast("long"))
          .withColumn("n", count(lit(1)).over(w))
        // dominant middle: minimize |2*rn - (n+1)|, tiebreak earlier rn —
        // pure integer arithmetic, identical in both engines.
        val midRank = Window.partitionBy(col("user_id"))
          .orderBy(abs(lit(2L) * col("rn") - (col("n") + 1L)), col("rn"))
        val credited = ranked
          .withColumn("mid_rn",
            when(col("n") >= 3, row_number().over(midRank)).otherwise(lit(0)))
          .withColumn("credit_x10",
            when(col("n") === 1, col("cents") * 10L)
              .when(col("n") === 2, col("cents") * 5L)
              .otherwise(
                when(col("rn") === 1 || col("rn") === col("n"), col("cents") * 4L)
                  .when(col("mid_rn") === 1, col("cents") * 2L)
                  .otherwise(lit(0L))))
        credited.groupBy(col("event_type"))
          .agg(
            sum(col("credit_x10")).as("credit_x10_cents"),
            sum(when(col("credit_x10") > 0, 1L).otherwise(0L)).as("n_credited_touches"),
            count(lit(1)).as("n_touches"))
          .orderBy(col("event_type"))
      },
      Some("""
        WITH fp AS (
          SELECT user_id,
                 MIN(ROW(ts, event_id)) AS k
          FROM events WHERE event_type = 'purchase' GROUP BY 1),
        fpv AS (
          SELECT e.user_id, e.ts AS p_ts, e.event_id AS p_id,
                 CAST(CAST(e.value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
          FROM events e JOIN fp ON e.user_id = fp.user_id
            AND ROW(e.ts, e.event_id) = fp.k
          WHERE e.event_type = 'purchase'),
        touches AS (
          SELECT e.event_type, e.user_id, e.ts, e.event_id, f.cents
          FROM events e JOIN fpv f ON e.user_id = f.user_id
          WHERE e.event_type IN ('click','view','signup')
            AND (e.ts < f.p_ts OR (e.ts = f.p_ts AND e.event_id < f.p_id))),
        ranked AS (
          SELECT *,
                 CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS rn,
                 CAST(COUNT(*) OVER (PARTITION BY user_id) AS BIGINT) AS n
          FROM touches),
        mids AS (
          SELECT *,
                 CASE WHEN n >= 3 THEN ROW_NUMBER() OVER (PARTITION BY user_id
                   ORDER BY ABS(2*rn - (n+1)), rn) ELSE 0 END AS mid_rn
          FROM ranked),
        credited AS (
          SELECT event_type,
                 CASE WHEN n = 1 THEN cents * 10
                      WHEN n = 2 THEN cents * 5
                      WHEN rn = 1 OR rn = n THEN cents * 4
                      WHEN mid_rn = 1 THEN cents * 2
                      ELSE 0 END AS credit_x10
          FROM mids)
        SELECT event_type,
               CAST(SUM(credit_x10) AS BIGINT) AS credit_x10_cents,
               CAST(SUM(CASE WHEN credit_x10 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_credited_touches,
               CAST(COUNT(*) AS BIGINT) AS n_touches
        FROM credited GROUP BY 1 ORDER BY 1""")),

    // Two-proportion z-test on a deterministic 50/50 hash split (the
    // q58 md5 assignment — both engines compute the SAME arms from the
    // SAME bytes). Conversion = customer placed ≥1 fulfilled ('F')
    // order. Counts are exact BIGINTs shipped as 4 longs total; the z
    // statistic is ONE closed IEEE form evaluated in the identical
    // association order on both sides — the q168 stance: the engines
    // never accumulate doubles, they only divide exact integers once.
    QueryDef(
      "q181_ab_proportion_z",
      (s, dir) => {
        val c = Tables.customer(s, dir)
        val o = Tables.orders(s, dir)
        val conv = o.where(col("o_orderstatus") === "F")
          .select(col("o_custkey")).distinct()
          .withColumn("converted", lit(1L))
        val armed = c.select(col("c_custkey"))
          .withColumn("arm",
            when(md5BitsModK(md5Bits(concat(lit("ab:"), col("c_custkey"))), 2L) === 0L,
              lit("control")).otherwise(lit("treatment")))
          .join(conv, col("c_custkey") === col("o_custkey"), "left")
          .select(col("arm"), coalesce(col("converted"), lit(0L)).as("converted"))
        val agg = armed.groupBy().agg(
          sum(when(col("arm") === "control", 1L).otherwise(0L)).as("na"),
          sum(when(col("arm") === "control", col("converted")).otherwise(0L)).as("xa"),
          sum(when(col("arm") === "treatment", 1L).otherwise(0L)).as("nb"),
          sum(when(col("arm") === "treatment", col("converted")).otherwise(0L)).as("xb"))
        agg
          .withColumn("pa", col("xa").cast("double") / col("na").cast("double"))
          .withColumn("pb", col("xb").cast("double") / col("nb").cast("double"))
          .withColumn("pp",
            (col("xa") + col("xb")).cast("double") / (col("na") + col("nb")).cast("double"))
          .withColumn("z",
            (col("pa") - col("pb")) /
              sqrt(col("pp") * (lit(1.0) - col("pp")) *
                (lit(1.0) / col("na").cast("double") + lit(1.0) / col("nb").cast("double"))))
          .select(col("na"), col("xa"), col("nb"), col("xb"),
            col("pa"), col("pb"), (col("pa") - col("pb")).as("lift"), col("z"))
      },
      Some("""
        WITH conv AS (
          SELECT DISTINCT o_custkey, 1 AS converted
          FROM orders WHERE o_orderstatus = 'F'),
        armed AS (
          SELECT CASE WHEN CAST(md5_number_lower('ab:' || c.c_custkey) % 2 AS BIGINT) = 0
                      THEN 'control' ELSE 'treatment' END AS arm,
                 COALESCE(v.converted, 0) AS converted
          FROM customer c LEFT JOIN conv v ON c.c_custkey = v.o_custkey),
        agg AS (
          SELECT CAST(SUM(CASE WHEN arm = 'control' THEN 1 ELSE 0 END) AS BIGINT) AS na,
                 CAST(SUM(CASE WHEN arm = 'control' THEN converted ELSE 0 END) AS BIGINT) AS xa,
                 CAST(SUM(CASE WHEN arm = 'treatment' THEN 1 ELSE 0 END) AS BIGINT) AS nb,
                 CAST(SUM(CASE WHEN arm = 'treatment' THEN converted ELSE 0 END) AS BIGINT) AS xb
          FROM armed),
        p AS (
          SELECT na, xa, nb, xb,
                 CAST(xa AS DOUBLE) / CAST(na AS DOUBLE) AS pa,
                 CAST(xb AS DOUBLE) / CAST(nb AS DOUBLE) AS pb,
                 CAST(xa + xb AS DOUBLE) / CAST(na + nb AS DOUBLE) AS pp
          FROM agg)
        SELECT na, xa, nb, xb, pa, pb, (pa - pb) AS lift,
               (pa - pb) / SQRT(pp * (1.0 - pp) *
                 (1.0 / CAST(na AS DOUBLE) + 1.0 / CAST(nb AS DOUBLE))) AS z
        FROM p""")),

    // CUPED variance reduction (Deng et al., WSDM'13): θ estimated from
    // EXACT pooled moments of (pre, post) per-customer revenue cents
    // (pre = 1995-1997, post = 1998+), then the per-arm adjusted mean
    // post' = mean_post − θ·(mean_pre − mean_pre_pooled). Σpre² and
    // Σpre·post ride DECIMAL(38,0) (DuckDB HUGEINT) — the q168 wide-path
    // pattern; every division is a final one-shot double. The moment
    // frame is 6 numbers; the per-arm frame is 2 rows — a cluster ships
    // constant state regardless of customer count.
    QueryDef(
      "q182_cuped_adjustment",
      (s, dir) => {
        val c = Tables.customer(s, dir)
        val o = Tables.orders(s, dir)
        val cents = (col("o_totalprice").cast(DecimalType(18, 2)) * 100).cast("long")
        val perCust = c.select(col("c_custkey"))
          .withColumn("arm",
            when(md5BitsModK(md5Bits(concat(lit("ab:"), col("c_custkey"))), 2L) === 0L,
              lit("control")).otherwise(lit("treatment")))
          .join(
            o.select(col("o_custkey"),
                when(year(col("o_orderdate")) <= 1997, cents).otherwise(lit(0L)).as("pre"),
                when(year(col("o_orderdate")) >= 1998, cents).otherwise(lit(0L)).as("post"))
              .groupBy(col("o_custkey"))
              .agg(sum(col("pre")).as("pre"), sum(col("post")).as("post")),
            col("c_custkey") === col("o_custkey"), "left")
          .select(col("arm"),
            coalesce(col("pre"), lit(0L)).as("pre"),
            coalesce(col("post"), lit(0L)).as("post"))
        val moments = perCust.groupBy().agg(
          count(lit(1)).as("n"),
          sum(col("pre")).as("sx"),
          sum(col("post")).as("sy"),
          sum((col("pre") * col("pre")).cast(DecimalType(38, 0))).as("sxx_d"),
          sum((col("pre") * col("post")).cast(DecimalType(38, 0))).as("sxy_d"))
          .select(
            col("n").cast("double").as("nd"),
            col("sx").cast("double").as("sxd"),
            col("sy").cast("double").as("syd"),
            col("sxx_d").cast("double").as("sxxd"),
            col("sxy_d").cast("double").as("sxyd"))
          .withColumn("theta",
            (col("nd") * col("sxyd") - col("sxd") * col("syd")) /
              (col("nd") * col("sxxd") - col("sxd") * col("sxd")))
          .withColumn("mean_pre_pooled", col("sxd") / col("nd"))
          .select(col("theta"), col("mean_pre_pooled"))
        val arms = perCust.groupBy(col("arm")).agg(
          count(lit(1)).as("n"),
          sum(col("pre")).as("sum_pre"),
          sum(col("post")).as("sum_post"))
        arms.crossJoin(broadcast(moments))
          .withColumn("mean_post", col("sum_post").cast("double") / col("n").cast("double"))
          .withColumn("mean_pre", col("sum_pre").cast("double") / col("n").cast("double"))
          .withColumn("adj_mean_post",
            col("mean_post") - col("theta") * (col("mean_pre") - col("mean_pre_pooled")))
          .select(col("arm"), col("n"), col("sum_pre"), col("sum_post"),
            col("mean_post"), col("adj_mean_post"), col("theta"))
          .orderBy(col("arm"))
      },
      Some("""
        WITH pc AS (
          SELECT c.c_custkey,
                 CASE WHEN CAST(md5_number_lower('ab:' || c.c_custkey) % 2 AS BIGINT) = 0
                      THEN 'control' ELSE 'treatment' END AS arm,
                 COALESCE(a.pre, 0) AS pre, COALESCE(a.post, 0) AS post
          FROM customer c LEFT JOIN (
            SELECT o_custkey,
                   CAST(SUM(CASE WHEN YEAR(CAST(o_orderdate AS DATE)) <= 1997
                     THEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                     ELSE 0 END) AS BIGINT) AS pre,
                   CAST(SUM(CASE WHEN YEAR(CAST(o_orderdate AS DATE)) >= 1998
                     THEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                     ELSE 0 END) AS BIGINT) AS post
            FROM orders GROUP BY 1) a ON c.c_custkey = a.o_custkey),
        m AS (
          SELECT CAST(CAST(COUNT(*) AS BIGINT) AS DOUBLE) AS nd,
                 CAST(CAST(SUM(pre) AS BIGINT) AS DOUBLE) AS sxd,
                 CAST(CAST(SUM(post) AS BIGINT) AS DOUBLE) AS syd,
                 CAST(SUM(CAST(pre AS HUGEINT) * pre) AS DOUBLE) AS sxxd,
                 CAST(SUM(CAST(pre AS HUGEINT) * post) AS DOUBLE) AS sxyd
          FROM pc),
        t AS (
          SELECT (nd*sxyd - sxd*syd) / (nd*sxxd - sxd*sxd) AS theta,
                 sxd / nd AS mean_pre_pooled
          FROM m),
        arms AS (
          SELECT arm, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(pre) AS BIGINT) AS sum_pre,
                 CAST(SUM(post) AS BIGINT) AS sum_post
          FROM pc GROUP BY 1)
        SELECT a.arm, a.n, a.sum_pre, a.sum_post,
               CAST(a.sum_post AS DOUBLE) / CAST(a.n AS DOUBLE) AS mean_post,
               CAST(a.sum_post AS DOUBLE) / CAST(a.n AS DOUBLE)
                 - t.theta * (CAST(a.sum_pre AS DOUBLE) / CAST(a.n AS DOUBLE)
                              - t.mean_pre_pooled) AS adj_mean_post,
               t.theta
        FROM arms a CROSS JOIN t ORDER BY a.arm""")),

    // FIFO application of payments to invoices — the classic matching
    // operator (inventory costing / AR application) WITHOUT an
    // iterative loop: both sides become exact cumulative-cents
    // intervals per customer ([cum−amt, cum) via one window each), and
    // a FIFO allocation is exactly the overlap of two intervals:
    // alloc = min(hi_i, hi_p) − max(lo_i, lo_p) where positive. The
    // join is EQUI on customer with the overlap as a residual predicate
    // — per-customer fan only (bounded by invoices×payments of one
    // customer, both small), co-partitioned on the same key as the two
    // windows so the sort feeds the join without a new exchange.
    QueryDef(
      "q183_fifo_payment_match",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val e = Tables.events(s, dir)
        val c = Tables.customer(s, dir).select(col("c_custkey"), col("c_nationkey"))
        val n = Tables.nation(s, dir).select(col("n_nationkey"), col("n_name"))
        val wInv = Window.partitionBy(col("cust")).orderBy(col("o_orderdate"), col("o_orderkey"))
        val inv = o.select(col("o_custkey").as("cust"), col("o_orderdate"), col("o_orderkey"),
            (col("o_totalprice").cast(DecimalType(18, 2)) * 100).cast("long").as("amt"))
          .withColumn("hi", sum(col("amt")).over(wInv))
          .withColumn("lo", col("hi") - col("amt"))
        val wPay = Window.partitionBy(col("cust")).orderBy(col("ts"), col("event_id"))
        val pay = e.where(col("event_type") === "purchase")
          .select(col("user_id").as("cust"), col("ts"), col("event_id"),
            (col("value").cast(DecimalType(18, 2)) * 100).cast("long").as("pamt"))
          .withColumn("phi", sum(col("pamt")).over(wPay))
          .withColumn("plo", col("phi") - col("pamt"))
        val alloc = inv.join(pay, "cust")
          .where(col("lo") < col("phi") && col("plo") < col("hi"))
          .select(col("cust"),
            (least(col("hi"), col("phi")) - greatest(col("lo"), col("plo"))).as("alloc"))
        val perCust = alloc.groupBy(col("cust"))
          .agg(sum(col("alloc")).as("alloc_cents"), count(lit(1)).as("n_alloc"))
        val invTot = inv.groupBy(col("cust")).agg(sum(col("amt")).as("invoice_cents"))
        val payTot = pay.groupBy(col("cust")).agg(sum(col("pamt")).as("payment_cents"))
        payTot.join(invTot, Seq("cust"), "inner")
          .join(perCust, Seq("cust"), "left")
          .join(broadcast(c), col("cust") === col("c_custkey"))
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(
            count(lit(1)).as("n_customers"),
            sum(coalesce(col("n_alloc"), lit(0L))).as("n_allocations"),
            sum(coalesce(col("alloc_cents"), lit(0L))).as("alloc_cents"),
            sum(col("invoice_cents")).as("invoice_cents"),
            sum(col("payment_cents")).as("payment_cents"),
            sum(col("invoice_cents") - coalesce(col("alloc_cents"), lit(0L))).as("outstanding_cents"),
            sum(col("payment_cents") - coalesce(col("alloc_cents"), lit(0L))).as("credit_cents"))
          .orderBy(col("n_name"))
      },
      Some("""
        WITH inv AS (
          SELECT o_custkey AS cust,
                 CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS amt,
                 CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
                   OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS hi
          FROM orders),
        inv2 AS (SELECT cust, amt, hi, hi - amt AS lo FROM inv),
        pay AS (
          SELECT user_id AS cust,
                 CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS pamt,
                 CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS phi
          FROM events WHERE event_type = 'purchase'),
        pay2 AS (SELECT cust, pamt, phi, phi - pamt AS plo FROM pay),
        alloc AS (
          SELECT i.cust,
                 LEAST(i.hi, p.phi) - GREATEST(i.lo, p.plo) AS alloc
          FROM inv2 i JOIN pay2 p ON i.cust = p.cust
          WHERE i.lo < p.phi AND p.plo < i.hi),
        pc AS (
          SELECT cust, CAST(SUM(alloc) AS BIGINT) AS alloc_cents,
                 CAST(COUNT(*) AS BIGINT) AS n_alloc
          FROM alloc GROUP BY 1),
        it AS (SELECT cust, CAST(SUM(amt) AS BIGINT) AS invoice_cents FROM inv2 GROUP BY 1),
        pt AS (SELECT cust, CAST(SUM(pamt) AS BIGINT) AS payment_cents FROM pay2 GROUP BY 1)
        SELECT n.n_name,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               CAST(SUM(COALESCE(pc.n_alloc, 0)) AS BIGINT) AS n_allocations,
               CAST(SUM(COALESCE(pc.alloc_cents, 0)) AS BIGINT) AS alloc_cents,
               CAST(SUM(it.invoice_cents) AS BIGINT) AS invoice_cents,
               CAST(SUM(pt.payment_cents) AS BIGINT) AS payment_cents,
               CAST(SUM(it.invoice_cents - COALESCE(pc.alloc_cents, 0)) AS BIGINT) AS outstanding_cents,
               CAST(SUM(pt.payment_cents - COALESCE(pc.alloc_cents, 0)) AS BIGINT) AS credit_cents
        FROM pt JOIN it ON pt.cust = it.cust
        LEFT JOIN pc ON pt.cust = pc.cust
        JOIN customer c ON pt.cust = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY 1 ORDER BY 1""")),

    // l-diversity audit — k-anonymity's (q179) companion: a class of
    // size 50 still leaks if all 50 share the sensitive value. Same
    // quasi-identifier classes as q179 (nation × balance kilodollar
    // band), sensitive attribute = market segment; l = distinct
    // sensitive values per class. Output is the l histogram plus the
    // rows exposed below l=3 — the release/suppress decision frame.
    // Two partial-agg shuffles; the histogram frame is bounded by the
    // class count, not the row count.
    QueryDef(
      "q210_l_diversity",
      (s, dir) => {
        val c = Tables.customer(s, dir)
        // two-level rollup (per-(class, seg) counts → class frame) —
        // never count + countDistinct in one agg (the Expand trap, q59)
        val classes = c.select(col("c_nationkey").as("nk"),
            floor(col("c_acctbal") / 1000.0).cast("long").as("band"),
            col("c_mktsegment").as("seg"))
          .groupBy(col("nk"), col("band"), col("seg"))
          .agg(count(lit(1)).as("seg_rows"))
          .groupBy(col("nk"), col("band"))
          .agg(sum(col("seg_rows")).as("n_rows"), count(lit(1)).as("l"))
        classes.groupBy(col("l"))
          .agg(count(lit(1)).as("n_classes"),
            sum(col("n_rows")).as("n_rows"),
            min(col("n_rows")).as("min_class"),
            max(col("n_rows")).as("max_class"),
            sum(when(col("l") < 3L, col("n_rows")).otherwise(0L)).as("rows_exposed"))
          .orderBy(col("l"))
      },
      Some("""
        WITH cls AS (
          SELECT c_nationkey AS nk,
                 CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS band,
                 CAST(COUNT(*) AS BIGINT) AS n_rows,
                 CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT) AS l
          FROM customer
          GROUP BY 1, 2)
        SELECT l,
               CAST(COUNT(*) AS BIGINT) AS n_classes,
               CAST(SUM(n_rows) AS BIGINT) AS n_rows,
               CAST(MIN(n_rows) AS BIGINT) AS min_class,
               CAST(MAX(n_rows) AS BIGINT) AS max_class,
               CAST(SUM(CASE WHEN l < 3 THEN n_rows ELSE 0 END) AS BIGINT)
                 AS rows_exposed
        FROM cls
        GROUP BY 1
        ORDER BY 1""")),

    // Poisson bootstrap — distribution-free confidence intervals at
    // data-parallel scale, fully DETERMINISTIC: the classic bootstrap
    // resamples n rows WITH replacement (impossible to parallelize
    // exactly); the Poisson approximation gives every row an independent
    // Poisson(1) multiplicity per resample, which here comes from a
    // hashed permille against the Poisson(1) CDF table (368/736/920/
    // 981/996, tail capped at 5) — no RNG, so both engines build the
    // IDENTICAL 32 resamples. Per (segment, resample): one weighted
    // partial agg; per segment: element quantiles of the 32 resample
    // means (p05/p50/p95 — the CI). 100 TB: the 32× fan-out is
    // map-side (explode + flat projection), everything after is
    // partial-aggregable; the quantile frame is 32 rows per segment.
    QueryDef(
      "q235_poisson_bootstrap",
      (s, dir) => {
        import graft.functions.Kernels.exactAvg
        // fanOutRead: the 32× resample explode costs 32 md5s PER INPUT
        // ROW downstream, and the 3-column orders projection packs into
        // ONE split (measured: a single 2.7 s CPU-bound task carried the
        // whole fan-out); both consumers reuse the one exchange
        val cents = graft.operators.Skew.fanOutRead(Tables.orders(s, dir)
          .select(col("o_orderpriority").as("segment"), col("o_orderkey").as("k"),
            (col("o_totalprice").cast(DecimalType(18, 2)) * 100)
              .cast("long").as("cents")))
        val point = cents.groupBy(col("segment"))
          .agg(count(lit(1)).as("n_orders"),
            exactAvg(sum(col("cents")), count(lit(1))).as("mean_cents"))
        val h = md5BitsModK(md5Bits(
          concat(lit("boot:"), col("b"), lit(":"), col("k"))), 1000L)
        val w = when(h < 368, 0L).when(h < 736, 1L).when(h < 920, 2L)
          .when(h < 981, 3L).when(h < 996, 4L).otherwise(5L)
        val resampled = cents
          .select(col("segment"), col("k"), col("cents"),
            explode(sequence(lit(0), lit(31))).as("b"))
          .select(col("segment"), col("b"), col("cents"), w.as("w"))
          .groupBy(col("segment"), col("b"))
          .agg(exactAvg(sum(col("w") * col("cents")), sum(col("w")))
            .as("mean_b"))
        val ci = resampled.groupBy(col("segment"))
          .agg(
            expr("percentile_disc(0.05) WITHIN GROUP (ORDER BY mean_b)")
              .as("ci_lo"),
            expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY mean_b)")
              .as("ci_med"),
            expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY mean_b)")
              .as("ci_hi"))
        point.join(ci, Seq("segment")).orderBy(col("segment"))
      },
      Some("""
        WITH cents AS (
          SELECT o_orderpriority AS segment, o_orderkey AS k,
                 CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS cents
          FROM orders),
        point AS (
          SELECT segment, COUNT(*) AS n_orders,
                 CAST(SUM(cents) AS DOUBLE) / COUNT(*) AS mean_cents
          FROM cents GROUP BY 1),
        fan AS (
          SELECT segment, k, cents, unnest(range(0, 32)) AS b FROM cents),
        weighted AS (
          SELECT segment, b, cents,
                 CASE
                   WHEN md5_number_lower('boot:' || b || ':' || k) % 1000
                        < 368 THEN 0
                   WHEN md5_number_lower('boot:' || b || ':' || k) % 1000
                        < 736 THEN 1
                   WHEN md5_number_lower('boot:' || b || ':' || k) % 1000
                        < 920 THEN 2
                   WHEN md5_number_lower('boot:' || b || ':' || k) % 1000
                        < 981 THEN 3
                   WHEN md5_number_lower('boot:' || b || ':' || k) % 1000
                        < 996 THEN 4
                   ELSE 5 END AS w
          FROM fan),
        means AS (
          SELECT segment, b,
                 CAST(SUM(w * cents) AS DOUBLE) / SUM(w) AS mean_b
          FROM weighted GROUP BY 1, 2),
        ci AS (
          SELECT segment,
                 quantile_disc(mean_b, 0.05) AS ci_lo,
                 quantile_disc(mean_b, 0.5) AS ci_med,
                 quantile_disc(mean_b, 0.95) AS ci_hi
          FROM means GROUP BY 1)
        SELECT p.segment,
               CAST(p.n_orders AS BIGINT) AS n_orders, p.mean_cents,
               c.ci_lo, c.ci_med, c.ci_hi
        FROM point p JOIN ci c USING (segment)
        ORDER BY p.segment""")),

    // Isotonic (monotone) calibration by PAVA — fit the best monotone
    // non-decreasing curve to per-bin positive rates (score→probability
    // calibration, the step after any model score ships: q178 estimates
    // selectivity, this repairs a score's probabilities). The fit is
    // computed by the MINIMAX characterization of isotonic regression,
    // ŷ_i = max_{j≤i} min_{k≥i} avg(y_j..y_k) — equivalent to the
    // pool-adjacent-violators result but expressible as bounded joins
    // instead of a sequential merge stack, so BOTH engines evaluate the
    // identical closed form. Exactness: range averages enter as
    // floor'd ppm integral divides, and floor is monotone, so
    // floor(min)=min(floor) and floor(max)=max(floor) — the minimax of
    // floors IS the floor of the minimax; no rational comparison ever
    // happens in floats. Binning is value-level ventiles from the q191
    // two-level cumulative scheme (ties atomic, no global row window);
    // everything after lives on a ≤20-row bin frame where the
    // range/minimax joins are O(bins³) map-side work independent of
    // corpus size.
    QueryDef(
      "q242_isotonic_calibration",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val base = o.select(
          (col("o_totalprice").cast(DecimalType(18, 2)) * 100).cast("long").as("v"),
          when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L).as("pos"))
        val dv = base.groupBy(col("v"))
          .agg(count(lit(1)).as("cnt"), sum(col("pos")).as("npos"))
        val bucketed = dv.withColumn("bucket", expr("v div 65536"))
        val wOff = Window.orderBy(col("bucket"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val boff = bucketed.groupBy(col("bucket"))
          .agg(sum(col("cnt")).as("bcnt"))
          .withColumn("off", coalesce(sum(col("bcnt")).over(wOff), lit(0L)))
          .select(col("bucket"), col("off"))
        val wB = Window.partitionBy(col("bucket")).orderBy(col("v"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val tot = dv.groupBy().agg(sum(col("cnt")).as("n"))
        val binned = bucketed.join(broadcast(boff), "bucket")
          .withColumn("cume", col("off") + sum(col("cnt")).over(wB) - col("cnt"))
          .crossJoin(broadcast(tot))
          .withColumn("bin", expr("(cume * 20) div n"))
        val bins = binned.groupBy(col("bin"))
          .agg(sum(col("cnt")).as("c"), sum(col("npos")).as("y"))
        val wBin = Window.orderBy(col("bin"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val pre = bins
          .withColumn("sc", sum(col("c")).over(wBin))
          .withColumn("sy", sum(col("y")).over(wBin))
          .cutLineage()
        val ranges = pre.select(col("bin").as("j"),
            (col("sc") - col("c")).as("scj"), (col("sy") - col("y")).as("syj"))
          .crossJoin(pre.select(col("bin").as("k"),
            col("sc").as("sck"), col("sy").as("syk")))
          .where(col("k") >= col("j"))
          .select(col("j"), col("k"),
            expr("(1000000 * (syk - syj)) div (sck - scj)").as("avg_ppm"))
        val i = pre.select(col("bin").as("i"))
        val mij = i.join(ranges,
            col("j") <= col("i") && col("k") >= col("i"))
          .groupBy(col("i"), col("j")).agg(min(col("avg_ppm")).as("m"))
        val fitted = mij.groupBy(col("i")).agg(max(col("m")).as("fitted_ppm"))
        pre.join(fitted, col("bin") === col("i"))
          .select(col("bin"), col("c").as("n"), col("y").as("n_pos"),
            expr("(1000000 * y) div c").as("raw_ppm"), col("fitted_ppm"))
          .orderBy(col("bin"))
      },
      Some("""
        WITH base AS (
          SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT) AS v,
                 CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                      THEN 1 ELSE 0 END AS pos
          FROM orders),
        dv AS (
          SELECT v, CAST(COUNT(*) AS BIGINT) AS cnt,
                 CAST(SUM(pos) AS BIGINT) AS npos
          FROM base GROUP BY v),
        tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM dv),
        binned AS (
          SELECT v, cnt, npos,
                 ((CAST(SUM(cnt) OVER (ORDER BY v
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                   - cnt) * 20) // (SELECT n FROM tot) AS bin
          FROM dv),
        bins AS (
          SELECT bin, CAST(SUM(cnt) AS BIGINT) AS c,
                 CAST(SUM(npos) AS BIGINT) AS y
          FROM binned GROUP BY bin),
        pre AS (
          SELECT bin, c, y,
                 CAST(SUM(c) OVER w AS BIGINT) AS sc,
                 CAST(SUM(y) OVER w AS BIGINT) AS sy
          FROM bins
          WINDOW w AS (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        ranges AS (
          SELECT j.bin AS j, k.bin AS k,
                 (1000000 * (k.sy - (j.sy - j.y))) // (k.sc - (j.sc - j.c)) AS avg_ppm
          FROM pre j CROSS JOIN pre k
          WHERE k.bin >= j.bin),
        mij AS (
          SELECT i.bin AS i, r.j, MIN(r.avg_ppm) AS m
          FROM pre i JOIN ranges r ON r.j <= i.bin AND r.k >= i.bin
          GROUP BY 1, 2),
        fitted AS (
          SELECT i, CAST(MAX(m) AS BIGINT) AS fitted_ppm FROM mij GROUP BY i)
        SELECT p.bin, p.c AS n, p.y AS n_pos,
               (1000000 * p.y) // p.c AS raw_ppm, f.fitted_ppm
        FROM pre p JOIN fitted f ON f.i = p.bin
        ORDER BY p.bin""")),

    // Leakage-free K-fold target encoding — the feature-engineering op
    // behind every gradient-boosted tabular model: replace a
    // high-cardinality category with the target mean computed OUT OF
    // FOLD, so a row never sees its own fold's labels (in-fold means
    // leak the target and inflate validation scores — the bug this
    // op class exists to prevent). Folds are deterministic md5 buckets
    // (the q58/q96 split contract); the OOF mean for (category c,
    // fold f) is the subtraction identity
    // (sum_c − sum_{c,f}) / (cnt_c − cnt_{c,f}) — one (category, fold)
    // partial agg plus a category rollup joined back, never a 5×
    // re-scan. Emitted on the exact ppm lattice. Scale: both aggs are
    // map-side combinable on the category key; the encoding table is
    // |categories|×K rows, broadcast back to facts in a real pipeline.
    QueryDef(
      "q252_target_encoding",
      (s, dir) => {
        val o = Tables.orders(s, dir).select(
          (col("o_custkey") % 100).as("cat"),
          md5BitsModK(md5Bits(concat(lit("fold:"), col("o_orderkey"))), 5L)
            .as("fold"),
          when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L).as("y"))
        val cf = o.groupBy(col("cat"), col("fold"))
          .agg(count(lit(1)).as("n_cf"), sum(col("y")).as("sum_cf"))
        val c = cf.groupBy(col("cat"))
          .agg(sum(col("n_cf")).as("n_c"), sum(col("sum_cf")).as("sum_c"))
        cf.join(c, Seq("cat"))
          .select(col("cat"), col("fold"), col("n_cf"),
            expr("(1000000 * (sum_c - sum_cf)) div (n_c - n_cf)")
              .as("oof_mean_ppm"),
            expr("(1000000 * sum_c) div n_c").as("infold_leaky_ppm"))
          .orderBy(col("cat"), col("fold"))
      },
      Some("""
        WITH o AS (
          SELECT o_custkey % 100 AS cat,
                 CAST(md5_number_lower('fold:' || o_orderkey) % 5 AS BIGINT) AS fold,
                 CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                      THEN 1 ELSE 0 END AS y
          FROM orders),
        cf AS (
          SELECT cat, fold, CAST(COUNT(*) AS BIGINT) AS n_cf,
                 CAST(SUM(y) AS BIGINT) AS sum_cf
          FROM o GROUP BY 1, 2),
        c AS (
          SELECT cat, CAST(SUM(n_cf) AS BIGINT) AS n_c,
                 CAST(SUM(sum_cf) AS BIGINT) AS sum_c
          FROM cf GROUP BY 1)
        SELECT cf.cat, cf.fold, cf.n_cf,
               (1000000 * (c.sum_c - cf.sum_cf)) // (c.n_c - cf.n_cf)
                 AS oof_mean_ppm,
               (1000000 * c.sum_c) // c.n_c AS infold_leaky_ppm
        FROM cf JOIN c ON cf.cat = c.cat
        ORDER BY cf.cat, cf.fold""")),

    // Benjamini-Hochberg FDR correction — what turns ONE A/B test
    // (q181) into a testing PROGRAM: 20 parallel two-proportion tests
    // (customer-key cells, md5 arms, urgent-priority outcome), ranked
    // by z² descending, accepted while z²_(r) clears the BH critical
    // ladder χ²₁(1 − α·r/m · ½-tail) — the ladder is 20 spec'd DOUBLE
    // literals (computed offline from the normal quantile; embedding
    // them keeps both engines transcendental-free), and the cutoff is
    // max{r : z²_(r) ≥ crit_r} applied to ALL ranks ≤ cutoff (the BH
    // step-up rule — a cell may be significant under BH even though
    // its own rank fails, when a later rank passes). z² itself is the
    // one-shot all-double pooled form from int64-exact counts in
    // identical op order. Scale: one partial agg to 20 cells; the
    // ladder join and cutoff window live on the 20-row frame.
    QueryDef(
      "q257_bh_fdr",
      (s, dir) => {
        val crit = Seq(
          9.140593461244016, 7.879438576622458, 7.1491386083838355,
          6.634896601021211, 6.23853263690954, 5.91646788464017,
          5.645522561950897, 5.411894431054339, 5.206700155589299,
          5.0238861873148934, 4.85914255610666, 4.709292246885099,
          4.571926354981466, 4.445175139346929, 4.327558440040948,
          4.217884587921396, 4.115180092638893, 4.018639511074708,
          3.927588924489973, 3.8414588206941236)
        val ladder = crit.zipWithIndex
          .map { case (v, i) => s"WHEN ${i + 1} THEN ${v}d" }
          .mkString("CASE rnk ", " ", " END")
        val o = Tables.orders(s, dir).select(
          (col("o_custkey") % 20).as("cell"),
          md5BitsModK(md5Bits(concat(lit("bh:"), col("o_orderkey"))), 2L)
            .as("arm"),
          when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L).as("y"))
        val cells = o.groupBy(col("cell")).agg(
          sum(when(col("arm") === 0L, 1L).otherwise(0L)).as("na"),
          sum(when(col("arm") === 1L, 1L).otherwise(0L)).as("nb"),
          sum(when(col("arm") === 0L, col("y")).otherwise(0L)).as("ya"),
          sum(when(col("arm") === 1L, col("y")).otherwise(0L)).as("yb"))
        val z2 = cells.select(col("cell"), col("na"), col("nb"),
          expr("""
            (CAST(na + nb AS DOUBLE)
              * (CAST(na AS DOUBLE)*CAST(yb AS DOUBLE) - CAST(nb AS DOUBLE)*CAST(ya AS DOUBLE))
              * (CAST(na AS DOUBLE)*CAST(yb AS DOUBLE) - CAST(nb AS DOUBLE)*CAST(ya AS DOUBLE)))
            / (CAST(na AS DOUBLE)*CAST(nb AS DOUBLE)
               *CAST(ya + yb AS DOUBLE)*CAST(na + nb - ya - yb AS DOUBLE))
          """).as("z2"))
        val ranked = z2.withColumn("rnk",
            row_number().over(Window.orderBy(col("z2").desc, col("cell")))
              .cast("long"))
          .withColumn("crit", expr(ladder))
          .withColumn("pass", col("z2") >= col("crit"))
        val cutoff = ranked.groupBy()
          .agg(max(when(col("pass"), col("rnk")).otherwise(0L)).as("cut"))
        ranked.crossJoin(broadcast(cutoff))
          .select(col("cell"), col("rnk"), col("z2"), col("crit"),
            (col("z2") >= lit(3.8414588206941236)).as("significant_raw"),
            (col("rnk") <= col("cut")).as("significant_bh"))
          .orderBy(col("rnk"))
      },
      Some("""
        WITH o AS (
          SELECT o_custkey % 20 AS cell,
                 CAST(md5_number_lower('bh:' || o_orderkey) % 2 AS BIGINT) AS arm,
                 CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                      THEN 1 ELSE 0 END AS y
          FROM orders),
        cells AS (
          SELECT cell,
                 CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
                 CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb,
                 CAST(SUM(CASE WHEN arm = 0 THEN y ELSE 0 END) AS BIGINT) AS ya,
                 CAST(SUM(CASE WHEN arm = 1 THEN y ELSE 0 END) AS BIGINT) AS yb
          FROM o GROUP BY cell),
        z AS (
          SELECT cell, na, nb,
                 (CAST(na + nb AS DOUBLE)
                   * (CAST(na AS DOUBLE)*CAST(yb AS DOUBLE) - CAST(nb AS DOUBLE)*CAST(ya AS DOUBLE))
                   * (CAST(na AS DOUBLE)*CAST(yb AS DOUBLE) - CAST(nb AS DOUBLE)*CAST(ya AS DOUBLE)))
                 / (CAST(na AS DOUBLE)*CAST(nb AS DOUBLE)
                    *CAST(ya + yb AS DOUBLE)*CAST(na + nb - ya - yb AS DOUBLE)) AS z2
          FROM cells),
        ranked AS (
          SELECT cell, z2,
                 row_number() OVER (ORDER BY z2 DESC, cell) AS rnk
          FROM z),
        laddered AS (
          SELECT cell, z2, rnk,
                 CASE rnk
                   WHEN 1 THEN CAST('9.140593461244016' AS DOUBLE)
                   WHEN 2 THEN CAST('7.879438576622458' AS DOUBLE)
                   WHEN 3 THEN CAST('7.1491386083838355' AS DOUBLE)
                   WHEN 4 THEN CAST('6.634896601021211' AS DOUBLE)
                   WHEN 5 THEN CAST('6.23853263690954' AS DOUBLE)
                   WHEN 6 THEN CAST('5.91646788464017' AS DOUBLE)
                   WHEN 7 THEN CAST('5.645522561950897' AS DOUBLE)
                   WHEN 8 THEN CAST('5.411894431054339' AS DOUBLE)
                   WHEN 9 THEN CAST('5.206700155589299' AS DOUBLE)
                   WHEN 10 THEN CAST('5.0238861873148934' AS DOUBLE)
                   WHEN 11 THEN CAST('4.85914255610666' AS DOUBLE)
                   WHEN 12 THEN CAST('4.709292246885099' AS DOUBLE)
                   WHEN 13 THEN CAST('4.571926354981466' AS DOUBLE)
                   WHEN 14 THEN CAST('4.445175139346929' AS DOUBLE)
                   WHEN 15 THEN CAST('4.327558440040948' AS DOUBLE)
                   WHEN 16 THEN CAST('4.217884587921396' AS DOUBLE)
                   WHEN 17 THEN CAST('4.115180092638893' AS DOUBLE)
                   WHEN 18 THEN CAST('4.018639511074708' AS DOUBLE)
                   WHEN 19 THEN CAST('3.927588924489973' AS DOUBLE)
                   WHEN 20 THEN CAST('3.8414588206941236' AS DOUBLE)
                 END AS crit
          FROM ranked),
        cut AS (
          SELECT MAX(CASE WHEN z2 >= crit THEN rnk ELSE 0 END) AS c FROM laddered)
        SELECT l.cell, CAST(l.rnk AS BIGINT) AS rnk, l.z2, l.crit,
               l.z2 >= CAST('3.8414588206941236' AS DOUBLE) AS significant_raw,
               l.rnk <= cut.c AS significant_bh
        FROM laddered l CROSS JOIN cut
        ORDER BY l.rnk""")),

    // Wald SPRT (sequential probability ratio test) — the sequential
    // companion to the fixed-horizon q181 z-test: 64 cohorts
    // (user_id % 64) each walk their event stream in time order
    // accumulating the Bernoulli log-likelihood ratio for H1: p=0.22 vs
    // H0: p=0.18 (success = purchase), stopping at the first crossing of
    // ±ln(19) (α=β=0.05). The LLR increments are PINNED integer
    // micro-nats (success +200671 ≈ 10⁶·ln(22/18), failure −50011 ≈
    // 10⁶·ln(78/82); bounds ±2944439 ≈ 10⁶·ln 19) so the walk is pure
    // integer addition — no transcendental evaluated at query time,
    // bit-identical on both engines. The stopping time needs the cum at
    // EVERY step, but per-cohort it is a strict sequential fold — the
    // q214/q238 secondary-sort contract: repartition on cohort, sort
    // within, one O(1)-memory pass emitting (decision, stopping index,
    // final LLR); a hot cohort streams, never buffers. The oracle walks
    // the same lattice with a window cumsum + first-crossing pick.
    QueryDef(
      "q276_sprt_sequential",
      (s, dir) => {
        import s.implicits._
        val e = Tables.events(s, dir)
          .select((col("user_id") % 64).as("exp"),
            unix_micros(col("ts")).as("us"), col("event_id"),
            when(col("event_type") === "purchase", 1L).otherwise(0L).as("succ"))
        val folded = e.repartition(col("exp"))
          .sortWithinPartitions(col("exp"), col("us"), col("event_id"))
          .as[(Long, Long, Long, Long)]
          .mapPartitions { rows =>
            graft.operators.SortedFold.foldGroups(rows, (r: (Long, Long, Long, Long)) => r._1) {
              (exp, g) =>
                var n = 0L; var nSucc = 0L; var cum = 0L
                var dcode = 0; var nAt = 0L; var llrAt = 0L
                g.foreach { r =>
                  val succ = r._4
                  cum += (if (succ == 1L) 200671L else -50011L)
                  n += 1; nSucc += succ
                  if (dcode == 0 && (cum >= 2944439L || cum <= -2944439L)) {
                    dcode = if (cum >= 2944439L) 1 else -1
                    nAt = n; llrAt = cum
                  }
                }
                (exp, n, nSucc, dcode, nAt, llrAt, cum)
            }
          }
          .toDF("exp", "n_total", "n_success", "dcode", "n_at_decision",
            "llr_at_decision", "llr_final")
        folded.select(col("exp"), col("n_total"), col("n_success"),
            when(col("dcode") === 1, lit("accept_h1"))
              .when(col("dcode") === -1, lit("accept_h0"))
              .otherwise(lit("continue")).as("decision"),
            col("n_at_decision"), col("llr_at_decision"), col("llr_final"))
          .orderBy(col("exp"))
      },
      Some("""
        WITH e AS (
          SELECT user_id % 64 AS exp, epoch_us(ts) AS us, event_id,
                 CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS succ
          FROM events),
        w AS (
          SELECT exp, succ,
                 SUM(CASE WHEN succ = 1 THEN 200671 ELSE -50011 END)
                   OVER (PARTITION BY exp ORDER BY us, event_id
                         ROWS UNBOUNDED PRECEDING) AS cum,
                 row_number() OVER (PARTITION BY exp
                   ORDER BY us, event_id) AS rn
          FROM e),
        tot AS (
          SELECT exp, COUNT(*) AS n_total,
                 CAST(SUM(succ) AS BIGINT) AS n_success,
                 CAST(max_by(cum, rn) AS BIGINT) AS llr_final
          FROM w GROUP BY 1),
        crossing AS (
          SELECT exp, rn, cum,
                 row_number() OVER (PARTITION BY exp ORDER BY rn) AS cr
          FROM w WHERE cum >= 2944439 OR cum <= -2944439),
        first_cross AS (
          SELECT exp, rn AS n_at_decision, cum AS llr_at_decision
          FROM crossing WHERE cr = 1)
        SELECT t.exp, t.n_total, t.n_success,
               CASE WHEN f.exp IS NULL THEN 'continue'
                    WHEN f.llr_at_decision >= 2944439 THEN 'accept_h1'
                    ELSE 'accept_h0' END AS decision,
               CAST(COALESCE(f.n_at_decision, 0) AS BIGINT) AS n_at_decision,
               CAST(COALESCE(f.llr_at_decision, 0) AS BIGINT) AS llr_at_decision,
               t.llr_final
        FROM tot t LEFT JOIN first_cross f ON t.exp = f.exp
        ORDER BY t.exp""")),

    // Empirical-Bayes shrunken rates — the segment-level smoothing every
    // dashboard needs before it ranks small segments by conversion: the
    // raw purchase rate of each (user_id % 20) cohort is pulled toward
    // the global rate with prior strength 200 pseudo-events,
    //   shrunk_ppm = (x·10⁶ + 200·global_ppm) div (n + 200)
    // — one integer formula, algebraically identical to the Beta(αg,
    // α(1−g)) posterior mean on the ppm lattice, so both engines agree
    // exactly and no segment with 30 events ever outranks the fleet on
    // noise. Output per cohort: n, x, raw, shrunk, and the correction.
    // Scale: one partial agg to 20 cells + a broadcast global row.
    QueryDef(
      "q288_shrunken_rates",
      (s, dir) => {
        val e = Tables.events(s, dir)
          .select((col("user_id") % 20).as("cohort"),
            when(col("event_type") === "purchase", 1L).otherwise(0L).as("x"))
        val per = e.groupBy(col("cohort"))
          .agg(count(lit(1)).as("n"), sum(col("x")).as("x"))
        val g = per.agg(sum(col("n")).as("ntot"), sum(col("x")).as("xtot"))
          .select(expr("(xtot * 1000000) div ntot").as("global_ppm"))
        per.crossJoin(broadcast(g))
          .select(col("cohort"), col("n"), col("x"),
            expr("(x * 1000000) div n").as("raw_ppm"),
            expr("(x * 1000000 + 200 * global_ppm) div (n + 200)")
              .as("shrunk_ppm"),
            expr("abs((x * 1000000) div n - " +
              "(x * 1000000 + 200 * global_ppm) div (n + 200))")
              .as("correction_ppm"))
          .orderBy(col("cohort"))
      },
      Some("""
        WITH e AS (
          SELECT user_id % 20 AS cohort,
                 CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS x
          FROM events),
        per AS (
          SELECT cohort, COUNT(*) AS n, CAST(SUM(x) AS BIGINT) AS x
          FROM e GROUP BY 1),
        g AS (
          SELECT (CAST(SUM(x) AS BIGINT) * 1000000) // CAST(SUM(n) AS BIGINT)
                   AS global_ppm
          FROM per)
        SELECT p.cohort, p.n, p.x,
               (p.x * 1000000) // p.n AS raw_ppm,
               (p.x * 1000000 + 200 * g.global_ppm) // (p.n + 200)
                 AS shrunk_ppm,
               abs((p.x * 1000000) // p.n -
                   (p.x * 1000000 + 200 * g.global_ppm) // (p.n + 200))
                 AS correction_ppm
        FROM per p CROSS JOIN g
        ORDER BY p.cohort""")),

    // Quantile treatment effects — the distributional companion to
    // q181's mean-effect z-test: an A/B split (user_id % 2) compared at
    // EXACT P50/P90/P99 of the event-value distribution, because a
    // treatment that moves the tail and not the median is invisible to
    // a mean test. Per arm the quantile is SELECTED, not sorted-for:
    // GlobalRank's two-level bucketed rank (micro-value div 2²⁰ bucket,
    // prefix-summed offsets) + a broadcast 3-row target-rank join
    // (rank = ceil(p·n), percentile_disc semantics with (value,
    // event_id) total order — the q265 scheme, here per arm). Output:
    // one row per quantile with both arms and the effect delta.
    QueryDef(
      "q289_quantile_effects",
      (s, dir) => {
        import org.apache.spark.sql.DataFrame
        import graft.operators.GlobalRank
        val ev = Tables.events(s, dir)
          .select((col("user_id") % 2).as("arm"), col("event_id"),
            (col("value").cast(org.apache.spark.sql.types.DecimalType(18, 6))
              * 1000000).cast("long").as("micro"))
        def armQuantiles(a: Int): DataFrame = {
          val e = ev.where(col("arm") === a)
          val ranked = GlobalRank.withGlobalRank(
            e, "rn", expr("micro div 1048576"), col("micro"), col("event_id"))
          val n = e.agg(count(lit(1)).as("n"))
          val targets = n.select(explode(array(
              struct(lit("1_p50").as("q"),
                expr("CAST(ceil(n * 0.5) AS BIGINT)").as("r")),
              struct(lit("2_p90").as("q"),
                expr("CAST(ceil(n * 0.9) AS BIGINT)").as("r")),
              struct(lit("3_p99").as("q"),
                expr("CAST(ceil(n * 0.99) AS BIGINT)").as("r"))))
              .as("t"))
            .select(col("t.q").as("q"), col("t.r").as("r"))
          ranked.join(broadcast(targets), col("rn") === col("r"))
            .select(col("q"), col("micro").as(s"arm${a}_micro"))
        }
        armQuantiles(0).join(armQuantiles(1), Seq("q"))
          .select(col("q"), col("arm0_micro"), col("arm1_micro"),
            (col("arm1_micro") - col("arm0_micro")).as("effect_micro"))
          .orderBy(col("q"))
      },
      Some("""
        WITH ev AS (
          SELECT user_id % 2 AS arm, event_id,
                 CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS micro
          FROM events),
        ranked AS (
          SELECT arm, micro,
                 row_number() OVER (PARTITION BY arm
                   ORDER BY micro, event_id) AS rn,
                 COUNT(*) OVER (PARTITION BY arm) AS n
          FROM ev),
        targets AS (
          SELECT arm, q, CAST(CASE q WHEN '1_p50' THEN ceil(n * 0.5)
                                     WHEN '2_p90' THEN ceil(n * 0.9)
                                     ELSE ceil(n * 0.99) END AS BIGINT) AS r
          FROM (SELECT DISTINCT arm, n FROM ranked),
               (SELECT unnest(['1_p50','2_p90','3_p99']) AS q)),
        hit AS (
          SELECT t.arm, t.q, r.micro
          FROM targets t JOIN ranked r ON r.arm = t.arm AND r.rn = t.r)
        SELECT a0.q, a0.micro AS arm0_micro, a1.micro AS arm1_micro,
               a1.micro - a0.micro AS effect_micro
        FROM (SELECT q, micro FROM hit WHERE arm = 0) a0
        JOIN (SELECT q, micro FROM hit WHERE arm = 1) a1 USING (q)
        ORDER BY a0.q""")),

    // Batch model scoring + gains table — the inference-side pipeline
    // every ML platform runs nightly: RFM features from pre-1998
    // history, a PINNED integer weight vector (no training at query
    // time, weights are spec), customers ranked into score deciles,
    // label = top-quintile 1998 holdout spend (any-order conversion is
    // ~99% here and would flatline the curve). On THIS corpus the gains
    // come out flat (~1.0 lift per decile) — the synthetic orders are
    // iid across periods, and a backtest whose gains curve hugs the
    // diagonal is exactly how you find that out before shipping a
    // model; the gate pins the machinery, the flatness is the finding.
    // (GlobalRank bucketed rank + the arithmetic ntile both engines
    // share), then BACKTESTED against the 1998 holdout: per decile,
    // conversion, cumulative capture of all future buyers (the gains
    // curve) and lift vs base rate — all integer ppm. A linear scorer
    // is rank-equivalent to logistic for this table, so no sigmoid
    // (transcendental) ever evaluates. Scale: two partial aggs on
    // customer, one GlobalRank, then a 10-row decile frame.
    QueryDef(
      "q290_batch_scoring",
      (s, dir) => {
        import graft.operators.GlobalRank
        val o = Tables.orders(s, dir)
          .select(col("o_custkey").as("ck"), col("o_orderdate").cast("date").as("d"),
            (col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(18, 2))
              * 100).cast("long").as("cents"))
        val cut = lit("1998-01-01").cast("date")
        val feats = o.where(col("d") < cut)
          .groupBy(col("ck"))
          .agg(count(lit(1)).as("n_orders"), sum(col("cents")).as("total_cents"),
            max(datediff(col("d"), lit("1990-01-01").cast("date")))
              .cast("long").as("last_day"))
        // label = 1998 BIG SPENDER (holdout spend >= 1.8e8 cents, ~top
        // quintile) — plain any-order conversion is ~99% in this corpus
        // and would make the gains curve a flat line
        val labels = o.where(col("d") >= cut)
          .groupBy(col("ck")).agg(sum(col("cents")).as("c98"))
          .where(col("c98") >= 180000000L)
          .select(col("ck")).withColumn("converted", lit(1L))
        val scored = feats.join(labels, Seq("ck"), "left")
          .select(col("ck"), col("n_orders"), col("total_cents"), col("last_day"),
            coalesce(col("converted"), lit(0L)).as("converted"))
          .withColumn("score",
            expr("n_orders * 50000 + (last_day - 2500) * 2000 + total_cents div 50"))
        val ranked = GlobalRank.withGlobalRank(
          scored, "rn", expr("score div 1048576"), col("score"), col("ck"))
        val n = scored.agg(count(lit(1)).as("n_cust"))
        val binned = ranked.crossJoin(broadcast(n))
          // decile 10 = best scores: rank ascending -> flip the tile
          .withColumn("decile",
            (lit(11L) - GlobalRank.ntileFromRank(col("rn"), col("n_cust"), 10))
              .cast("long"))
        val per = binned.groupBy(col("decile"))
          .agg(count(lit(1)).as("n_cust"), sum(col("converted")).as("n_conv"))
        val tot = per.agg(sum(col("n_cust")).as("nt"), sum(col("n_conv")).as("ct"))
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("decile").desc)
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
        per.crossJoin(broadcast(tot))
          .withColumn("cum_conv", sum(col("n_conv")).over(w))
          .select(col("decile"), col("n_cust"), col("n_conv"),
            expr("(n_conv * 1000000) div n_cust").as("conv_ppm"),
            expr("(cum_conv * 1000000) div ct").as("cum_capture_ppm"),
            expr("((n_conv * 1000000) div n_cust) * 1000000 div ((ct * 1000000) div nt)")
              .as("lift_ppm"))
          .orderBy(col("decile").desc)
      },
      Some("""
        WITH o AS (
          SELECT o_custkey AS ck, CAST(o_orderdate AS DATE) AS d,
                 CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT) AS cents
          FROM orders),
        feats AS (
          SELECT ck, COUNT(*) AS n_orders,
                 CAST(SUM(cents) AS BIGINT) AS total_cents,
                 CAST(MAX(d - DATE '1990-01-01') AS BIGINT) AS last_day
          FROM o WHERE d < DATE '1998-01-01' GROUP BY 1),
        labels AS (
          SELECT ck, 1 AS converted
          FROM o WHERE d >= DATE '1998-01-01'
          GROUP BY ck
          HAVING SUM(cents) >= 180000000),
        scored AS (
          SELECT f.ck, f.n_orders, f.total_cents, f.last_day,
                 CAST(COALESCE(l.converted, 0) AS BIGINT) AS converted,
                 f.n_orders * 50000 + (f.last_day - 2500) * 2000
                   + f.total_cents // 50 AS score
          FROM feats f LEFT JOIN labels l USING (ck)),
        ranked AS (
          SELECT *, row_number() OVER (ORDER BY score, ck) AS rn,
                 COUNT(*) OVER () AS n_cust
          FROM scored),
        binned AS (
          SELECT converted,
                 11 - (CASE WHEN rn <= (n_cust % 10) * (n_cust // 10 + 1)
                       THEN (rn - 1) // (n_cust // 10 + 1) + 1
                       ELSE (n_cust % 10) +
                            (rn - 1 - (n_cust % 10) * (n_cust // 10 + 1))
                              // (n_cust // 10) + 1 END) AS decile
          FROM ranked),
        per AS (
          SELECT decile, COUNT(*) AS n_cust,
                 CAST(SUM(converted) AS BIGINT) AS n_conv
          FROM binned GROUP BY 1),
        tot AS (SELECT CAST(SUM(n_cust) AS BIGINT) AS nt,
                       CAST(SUM(n_conv) AS BIGINT) AS ct FROM per),
        gains AS (
          SELECT p.decile, p.n_cust, p.n_conv, t.nt, t.ct,
                 CAST(SUM(p.n_conv) OVER (ORDER BY p.decile DESC
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_conv
          FROM per p CROSS JOIN tot t)
        SELECT CAST(decile AS BIGINT) AS decile, n_cust, n_conv,
               (n_conv * 1000000) // n_cust AS conv_ppm,
               (cum_conv * 1000000) // ct AS cum_capture_ppm,
               ((n_conv * 1000000) // n_cust) * 1000000
                 // ((ct * 1000000) // nt) AS lift_ppm
        FROM gains
        ORDER BY decile DESC""")),

    // Off-policy bandit evaluation by REPLAY (Li et al. 2011): the
    // logged randomized arm is user_id % 4, the reward is a purchase,
    // the context is the 6-hour day-slot. A target policy is LEARNED on
    // the first half of time (per-context argmax of the q288 shrunken
    // arm rates — shrinkage is what stops a 30-event arm winning on
    // noise) and evaluated on the second half using only events whose
    // logged arm equals the policy's choice — the unbiased replay
    // estimator, no simulator needed. Output per context: chosen arm,
    // training rate, matched evaluation count, replay estimate, and the
    // logged-average baseline, all integer ppm. Scale: two partial aggs
    // to ≤16 cells, a broadcast policy, one filtered agg over the
    // evaluation half.
    QueryDef(
      "q291_bandit_replay",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val ev = Tables.events(s, dir)
          .select((col("user_id") % 4).as("arm"),
            expr("(hour(ts) div 6)").cast("long").as("ctx"),
            when(col("event_type") === "purchase", 1L).otherwise(0L).as("r"),
            col("ts"), col("event_id"))
        val cut = lit("2024-01-15 00:00:00").cast("timestamp")
        val train = ev.where(col("ts") < cut)
        val eval0 = ev.where(col("ts") >= cut)
        val cells = train.groupBy(col("ctx"), col("arm"))
          .agg(count(lit(1)).as("n"), sum(col("r")).as("x"))
        val g = train.agg(expr("(sum(r) * 1000000) div count(1)").as("gppm"))
        val rated = cells.crossJoin(broadcast(g))
          .withColumn("shrunk_ppm",
            expr("(x * 1000000 + 200 * gppm) div (n + 200)"))
        val w = Window.partitionBy(col("ctx"))
          .orderBy(col("shrunk_ppm").desc, col("arm"))
        val policy = rated.withColumn("rk", row_number().over(w))
          .where(col("rk") === 1)
          .select(col("ctx"), col("arm").as("chosen_arm"),
            col("shrunk_ppm").as("train_ppm"))
        val matched = eval0.join(broadcast(policy), Seq("ctx"))
          .where(col("arm") === col("chosen_arm"))
          .groupBy(col("ctx"), col("chosen_arm"), col("train_ppm"))
          .agg(count(lit(1)).as("n_matched"),
            expr("(sum(r) * 1000000) div count(1)").as("replay_ppm"))
        val logged = eval0.groupBy(col("ctx"))
          .agg(expr("(sum(r) * 1000000) div count(1)").as("logged_ppm"))
        matched.join(logged, Seq("ctx"))
          .select(col("ctx"), col("chosen_arm"), col("train_ppm"),
            col("n_matched"), col("replay_ppm"), col("logged_ppm"))
          .orderBy(col("ctx"))
      },
      Some("""
        WITH ev AS (
          SELECT user_id % 4 AS arm,
                 CAST(hour(ts) // 6 AS BIGINT) AS ctx,
                 CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS r,
                 ts
          FROM events),
        train AS (SELECT * FROM ev WHERE ts < TIMESTAMP '2024-01-15 00:00:00'),
        ev2 AS (SELECT * FROM ev WHERE ts >= TIMESTAMP '2024-01-15 00:00:00'),
        cells AS (
          SELECT ctx, arm, COUNT(*) AS n, CAST(SUM(r) AS BIGINT) AS x
          FROM train GROUP BY 1, 2),
        g AS (
          SELECT (CAST(SUM(r) AS BIGINT) * 1000000) // COUNT(*) AS gppm
          FROM train),
        rated AS (
          SELECT c.ctx, c.arm,
                 (c.x * 1000000 + 200 * g.gppm) // (c.n + 200) AS shrunk_ppm
          FROM cells c CROSS JOIN g),
        policy AS (
          SELECT ctx, arm AS chosen_arm, shrunk_ppm AS train_ppm
          FROM (SELECT *, row_number() OVER (PARTITION BY ctx
                  ORDER BY shrunk_ppm DESC, arm) AS rk FROM rated)
          WHERE rk = 1),
        matched AS (
          SELECT e.ctx, p.chosen_arm, p.train_ppm,
                 COUNT(*) AS n_matched,
                 (CAST(SUM(e.r) AS BIGINT) * 1000000) // COUNT(*) AS replay_ppm
          FROM ev2 e JOIN policy p ON e.ctx = p.ctx AND e.arm = p.chosen_arm
          GROUP BY 1, 2, 3),
        logged AS (
          SELECT ctx,
                 (CAST(SUM(r) AS BIGINT) * 1000000) // COUNT(*) AS logged_ppm
          FROM ev2 GROUP BY 1)
        SELECT m.ctx, CAST(m.chosen_arm AS BIGINT) AS chosen_arm,
               m.train_ppm, m.n_matched, m.replay_ppm, l.logged_ppm
        FROM matched m JOIN logged l USING (ctx)
        ORDER BY m.ctx""")),

    // Split conformal prediction — the distribution-free way to put an
    // interval around ANY point model: fit a through-origin spend
    // predictor on a hash-split calibration half (shared stage, see
    // conformalCalib below), take the calibration residuals' exact
    // [P5, P95] via GlobalRank, and measure EMPIRICAL COVERAGE of
    // pred + [r₅, r₉₅] on the held-out half — conformal theory says
    // ~90%, the gate pins the exact count. x = pre-1998 spend, y = 1998
    // spend, whole dollars to keep every moment integral. Scale: two
    // customer aggs, one broadcast 2-row quantile-target join, one
    // filtered count.
    QueryDef(
      "q292_conformal_coverage",
      (s, dir) => {
        val cal = conformalCalib(s, dir)
        val cov = cal.test.crossJoin(broadcast(cal.beta)).crossJoin(broadcast(cal.qs))
          .select(col("y"),
            (expr("(x * beta_ppm) div 1000000") + col("r_lo")).as("lo"),
            (expr("(x * beta_ppm) div 1000000") + col("r_hi")).as("hi"))
          .agg(count(lit(1)).as("n_test"),
            sum(when(col("y") >= col("lo") && col("y") <= col("hi"), 1L)
              .otherwise(0L)).as("n_covered"))
        cal.nCalib.crossJoin(broadcast(cal.beta)).crossJoin(broadcast(cal.qs)).crossJoin(cov)
          .select(col("n_calib"), col("beta_ppm"), col("r_lo"), col("r_hi"),
            col("n_test"), col("n_covered"),
            expr("(n_covered * 1000000) div n_test").as("coverage_ppm"))
          .orderBy(col("n_calib"))
      },
      Some(s"""
        WITH $ConformalCalibSql,
        cov AS (
          SELECT COUNT(*) AS n_test,
                 CAST(SUM(CASE WHEN te.y >= (te.x * b.beta_ppm) // 1000000 + q.r_lo
                                AND te.y <= (te.x * b.beta_ppm) // 1000000 + q.r_hi
                               THEN 1 ELSE 0 END) AS BIGINT) AS n_covered
          FROM test te CROSS JOIN beta b CROSS JOIN qs q)
        SELECT n.n_calib, b.beta_ppm, q.r_lo, q.r_hi,
               c.n_test, c.n_covered,
               (c.n_covered * 1000000) // c.n_test AS coverage_ppm
        FROM nc n CROSS JOIN beta b CROSS JOIN qs q CROSS JOIN cov c
        ORDER BY n.n_calib""")),

    // CONDITIONAL conformal coverage by market segment — the known gap
    // q292 cannot see: split conformal guarantees ~90% coverage
    // MARGINALLY, but nothing per subgroup; the equity audit every
    // deployed interval model owes its users is this per-segment table
    // (same β and residual band as q292 — literally the same
    // conformalCalib stage, so the marginal and per-segment gates cannot
    // drift apart — coverage measured per c_mktsegment on the holdout).
    // Segments whose spend distribution deviates from the pooled
    // calibration show it here first. Scale: q292's pipeline + one
    // broadcast dim join + a 5-row rollup.
    QueryDef(
      "q293_conformal_by_segment",
      (s, dir) => {
        val cal = conformalCalib(s, dir)
        val seg = Tables.customer(s, dir)
          .select(col("c_custkey").as("ck"), col("c_mktsegment").as("segment"))
        cal.test.join(broadcast(seg), Seq("ck"))
          .crossJoin(broadcast(cal.beta)).crossJoin(broadcast(cal.qs))
          .select(col("segment"), col("y"),
            (expr("(x * beta_ppm) div 1000000") + col("r_lo")).as("lo"),
            (expr("(x * beta_ppm) div 1000000") + col("r_hi")).as("hi"))
          .groupBy(col("segment"))
          .agg(count(lit(1)).as("n_test"),
            sum(when(col("y") >= col("lo") && col("y") <= col("hi"), 1L)
              .otherwise(0L)).as("n_covered"))
          .select(col("segment"), col("n_test"), col("n_covered"),
            expr("(n_covered * 1000000) div n_test").as("coverage_ppm"))
          .orderBy(col("segment"))
      },
      Some(s"""
        WITH $ConformalCalibSql
        SELECT cu.c_mktsegment AS segment,
               COUNT(*) AS n_test,
               CAST(SUM(CASE WHEN te.y >= (te.x * b.beta_ppm) // 1000000 + q.r_lo
                              AND te.y <= (te.x * b.beta_ppm) // 1000000 + q.r_hi
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_covered,
               (CAST(SUM(CASE WHEN te.y >= (te.x * b.beta_ppm) // 1000000 + q.r_lo
                               AND te.y <= (te.x * b.beta_ppm) // 1000000 + q.r_hi
                              THEN 1 ELSE 0 END) AS BIGINT) * 1000000)
                 // COUNT(*) AS coverage_ppm
        FROM test te
        JOIN customer cu ON cu.c_custkey = te.ck
        CROSS JOIN beta b CROSS JOIN qs q
        GROUP BY 1
        ORDER BY segment""")),

    // Two-period / two-group difference-in-differences. Treated group =
    // BUILDING-segment customers, post period = orders from 1996-01-01.
    // The estimate is the classic four-cell contrast of mean order value
    //   DiD = (ȳ_T,post − ȳ_T,pre) − (ȳ_C,post − ȳ_C,pre)
    // plus a placebo run entirely inside the pre period (pseudo-post at
    // 1994-01-01) — the standard parallel-trends smoke test: a DiD whose
    // placebo is the same order of magnitude as the estimate is noise.
    // Exactness: cell means are micro-cent floor divisions of
    // DECIMAL(38,0) sums (HUGEINT parity with DuckDB), so the estimate is
    // integer arithmetic end-to-end — no IEEE drift in the gate. Scale:
    // one shuffle join orders⋈customer on custkey (dim broadcast here;
    // at cluster scale AQE picks the join side), ONE full-data aggregate
    // to 4 cells, then arithmetic on broadcast 1-row frames.
    QueryDef(
      "q298_diff_in_diff",
      (s, dir) => {
        val seg = Tables.customer(s, dir)
          .select(col("c_custkey").as("ck"),
            when(col("c_mktsegment") === "BUILDING", 1L).otherwise(0L)
              .as("treated"))
        val o = Tables.orders(s, dir)
          .select(col("o_custkey").as("ck"),
            col("o_orderdate").cast("date").as("day"),
            (col("o_totalprice").cast(DecimalType(18, 2)) * 100)
              .cast("long").as("cents"))
          .join(broadcast(seg), Seq("ck"))
        def cells(df: DataFrame, postFrom: String): DataFrame =
          df.withColumn("post",
              when(col("day") >= lit(postFrom).cast("date"), 1L).otherwise(0L))
            .groupBy(col("treated"), col("post"))
            .agg(count(lit(1)).as("n_orders"),
              sum(col("cents").cast(DecimalType(38, 0))).as("sum_c"))
            .select(col("treated"), col("post"), col("n_orders"),
              col("sum_c").cast("long").as("sum_cents"),
              expr("CAST((sum_c * 1000000) div n_orders AS BIGINT)")
                .as("mean_micro"))
        def contrast(cellDf: DataFrame, outName: String): DataFrame =
          cellDf.agg(
            max(when(col("treated") === 1 && col("post") === 1,
              col("mean_micro"))).as("m11"),
            max(when(col("treated") === 1 && col("post") === 0,
              col("mean_micro"))).as("m10"),
            max(when(col("treated") === 0 && col("post") === 1,
              col("mean_micro"))).as("m01"),
            max(when(col("treated") === 0 && col("post") === 0,
              col("mean_micro"))).as("m00"))
            .select(((col("m11") - col("m10")) - (col("m01") - col("m00")))
              .as(outName))
        val main = cells(o, "1996-01-01")
        val placebo = contrast(
          cells(o.where(col("day") < lit("1996-01-01").cast("date")),
            "1994-01-01"),
          "placebo_micro")
        main.crossJoin(broadcast(contrast(main, "did_micro")))
          .crossJoin(broadcast(placebo))
          .orderBy(col("treated"), col("post"))
      },
      Some("""
        WITH base AS (
          SELECT CAST(CASE WHEN cu.c_mktsegment = 'BUILDING'
                           THEN 1 ELSE 0 END AS BIGINT) AS treated,
                 CAST(o.o_orderdate AS DATE) AS day,
                 CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS cents
          FROM orders o JOIN customer cu ON cu.c_custkey = o.o_custkey),
        cells AS (
          SELECT treated,
                 CAST(CASE WHEN day >= DATE '1996-01-01'
                           THEN 1 ELSE 0 END AS BIGINT) AS post,
                 CAST(COUNT(*) AS BIGINT) AS n_orders,
                 SUM(cents) AS sum_c
          FROM base GROUP BY 1, 2),
        did AS (
          SELECT (MAX(CASE WHEN treated = 1 AND post = 1
                           THEN (sum_c * 1000000) // n_orders END)
                  - MAX(CASE WHEN treated = 1 AND post = 0
                             THEN (sum_c * 1000000) // n_orders END))
                 - (MAX(CASE WHEN treated = 0 AND post = 1
                             THEN (sum_c * 1000000) // n_orders END)
                    - MAX(CASE WHEN treated = 0 AND post = 0
                               THEN (sum_c * 1000000) // n_orders END))
                   AS did_micro
          FROM cells),
        pcells AS (
          SELECT treated,
                 CAST(CASE WHEN day >= DATE '1994-01-01'
                           THEN 1 ELSE 0 END AS BIGINT) AS post,
                 CAST(COUNT(*) AS BIGINT) AS n_orders,
                 SUM(cents) AS sum_c
          FROM base WHERE day < DATE '1996-01-01' GROUP BY 1, 2),
        placebo AS (
          SELECT (MAX(CASE WHEN treated = 1 AND post = 1
                           THEN (sum_c * 1000000) // n_orders END)
                  - MAX(CASE WHEN treated = 1 AND post = 0
                             THEN (sum_c * 1000000) // n_orders END))
                 - (MAX(CASE WHEN treated = 0 AND post = 1
                             THEN (sum_c * 1000000) // n_orders END)
                    - MAX(CASE WHEN treated = 0 AND post = 0
                               THEN (sum_c * 1000000) // n_orders END))
                   AS placebo_micro
          FROM pcells)
        SELECT c.treated, c.post, c.n_orders,
               CAST(c.sum_c AS BIGINT) AS sum_cents,
               CAST((c.sum_c * 1000000) // c.n_orders AS BIGINT) AS mean_micro,
               CAST(d.did_micro AS BIGINT) AS did_micro,
               CAST(p.placebo_micro AS BIGINT) AS placebo_micro
        FROM cells c CROSS JOIN did d CROSS JOIN placebo p
        ORDER BY c.treated, c.post""")),

    // Differentially-private per-nation order counts under the discrete
    // Laplace (two-sided geometric) mechanism with α = 1/3 (ε = ln 3),
    // completing the privacy surface next to k-anonymity (q179) and
    // l-diversity (q210). The mechanism is EXACT inverse-CDF sampling in
    // integer arithmetic: u = low-32 md5 bits of the keyed nation name
    // (u/2³² uniform), and P(K=k) = ½·3^−|k| has CDF values that are
    // rationals with denominator D = 4·3⁸ = 26244, so "u/2³² < F(k)"
    // becomes the overflow-free BIGINT comparison u·D < (F(k)·D)·2³².
    // Noise is clipped to ±8 (tail mass 2·3⁻⁸/4 < 1e-4, folded into the
    // end bins); counts are clamped at 0 post-noise. Both engines run the
    // identical integer comparisons — no floats, no RNG state, fully
    // reproducible. Scale: per-customer order pre-agg (map-side combine)
    // → one shuffle join to the customer dim → 25-row nation rollup.
    QueryDef(
      "q300_dp_geometric_counts",
      (s, dir) => {
        val perCust = Tables.orders(s, dir)
          .groupBy(col("o_custkey").as("ck"))
          .agg(count(lit(1)).as("n_ord"))
        val cust = Tables.customer(s, dir)
          .select(col("c_custkey").as("ck"), col("c_nationkey").as("nk"))
        val nat = Tables.nation(s, dir)
          .select(col("n_nationkey").as("nk"), col("n_name"))
        val trueCnt = perCust.join(cust, Seq("ck"))
          .groupBy(col("nk")).agg(sum(col("n_ord")).as("true_cnt"))
          .join(broadcast(nat), Seq("nk"))
        // F(k)·D for k = −8..8 over D = 26244; ascending CDF thresholds.
        val thr: Seq[(Long, Long)] = Seq(
          -8L -> 3L, -7L -> 9L, -6L -> 27L, -5L -> 81L, -4L -> 243L,
          -3L -> 729L, -2L -> 2187L, -1L -> 6561L, 0L -> 19683L,
          1L -> 24057L, 2L -> 25515L, 3L -> 26001L, 4L -> 26163L,
          5L -> 26217L, 6L -> 26235L, 7L -> 26241L, 8L -> 26243L)
        val noise = thr.reverse.foldLeft(lit(8L): Column) {
          case (tail, (k, fd)) =>
            when(col("ud") < fd * 4294967296L, lit(k)).otherwise(tail)
        }
        trueCnt
          .withColumn("ud",
            graft.functions.Kernels.md5Lower64Lo32(
              concat(lit("dp:"), col("n_name"))) * 26244L)
          .withColumn("noise_k", noise)
          .select(col("n_name"), col("true_cnt"), col("noise_k"),
            greatest(lit(0L), col("true_cnt") + col("noise_k"))
              .as("noisy_cnt"))
          .orderBy(col("n_name"))
      },
      Some("""
        WITH per_cust AS (
          SELECT o_custkey AS ck, CAST(COUNT(*) AS BIGINT) AS n_ord
          FROM orders GROUP BY 1),
        tc AS (
          SELECT n.n_name,
                 CAST(SUM(p.n_ord) AS BIGINT) AS true_cnt
          FROM per_cust p
          JOIN customer c ON c.c_custkey = p.ck
          JOIN nation n ON n.n_nationkey = c.c_nationkey
          GROUP BY 1),
        noised AS (
          SELECT n_name, true_cnt,
                 CAST(md5_number_lower('dp:' || n_name) % 4294967296
                      AS BIGINT) * 26244 AS ud
          FROM tc)
        SELECT n_name, true_cnt,
               CAST(CASE
                 WHEN ud <     3 * 4294967296 THEN -8
                 WHEN ud <     9 * 4294967296 THEN -7
                 WHEN ud <    27 * 4294967296 THEN -6
                 WHEN ud <    81 * 4294967296 THEN -5
                 WHEN ud <   243 * 4294967296 THEN -4
                 WHEN ud <   729 * 4294967296 THEN -3
                 WHEN ud <  2187 * 4294967296 THEN -2
                 WHEN ud <  6561 * 4294967296 THEN -1
                 WHEN ud < 19683 * 4294967296 THEN  0
                 WHEN ud < 24057 * 4294967296 THEN  1
                 WHEN ud < 25515 * 4294967296 THEN  2
                 WHEN ud < 26001 * 4294967296 THEN  3
                 WHEN ud < 26163 * 4294967296 THEN  4
                 WHEN ud < 26217 * 4294967296 THEN  5
                 WHEN ud < 26235 * 4294967296 THEN  6
                 WHEN ud < 26241 * 4294967296 THEN  7
                 ELSE 8 END AS BIGINT) AS noise_k,
               GREATEST(CAST(0 AS BIGINT),
                 true_cnt + CAST(CASE
                 WHEN ud <     3 * 4294967296 THEN -8
                 WHEN ud <     9 * 4294967296 THEN -7
                 WHEN ud <    27 * 4294967296 THEN -6
                 WHEN ud <    81 * 4294967296 THEN -5
                 WHEN ud <   243 * 4294967296 THEN -4
                 WHEN ud <   729 * 4294967296 THEN -3
                 WHEN ud <  2187 * 4294967296 THEN -2
                 WHEN ud <  6561 * 4294967296 THEN -1
                 WHEN ud < 19683 * 4294967296 THEN  0
                 WHEN ud < 24057 * 4294967296 THEN  1
                 WHEN ud < 25515 * 4294967296 THEN  2
                 WHEN ud < 26001 * 4294967296 THEN  3
                 WHEN ud < 26163 * 4294967296 THEN  4
                 WHEN ud < 26217 * 4294967296 THEN  5
                 WHEN ud < 26235 * 4294967296 THEN  6
                 WHEN ud < 26241 * 4294967296 THEN  7
                 ELSE 8 END AS BIGINT)) AS noisy_cnt
        FROM noised
        ORDER BY n_name""")),

    // Coarsened Exact Matching (Iacus-King-Porro) ATT — the
    // OBSERVATIONAL causal estimator next to the experimental family
    // (DiD q298, CUPED q182, randomization q308): coarsen covariates
    // into strata (nation × $1k balance bucket × order-count quintile
    // bucket), keep only strata containing BOTH treated (BUILDING) and
    // control units, and weight each stratum's mean contrast by its
    // treated mass:  ATT = Σ_s (m_ts / M_T) · (ȳ_ts − ȳ_cs).
    // Exactness: stratum means are micro-cent floor divisions of
    // DECIMAL(38,0) sums (positive operands), the weighted sum rides
    // decimal, and the single SIGNED division is |·|-split (Spark
    // truncates, DuckDB floors — they agree only on positives). The
    // pruned-unit counts are first-class outputs: CEM's honesty is
    // exactly that it REPORTS who was unmatchable. Scale: one
    // per-customer rollup, one broadcast dim join, then arithmetic on
    // the ≤(25·11·5)-row stratum frame — bounded by the coarsening
    // grid, not the corpus.
    QueryDef(
      "q307_cem_att",
      (s, dir) => {
        val D = DecimalType(38, 0)
        val spend = Tables.orders(s, dir)
          .groupBy(col("o_custkey").as("ck"))
          .agg(count(lit(1)).as("n_ord"),
            sum((col("o_totalprice").cast(DecimalType(18, 2)) * 100)
              .cast("long")).as("cents"))
        val cov = Tables.customer(s, dir)
          .select(col("c_custkey").as("ck"),
            (col("c_mktsegment") === "BUILDING").as("treated"),
            col("c_nationkey").as("nk"),
            floor(col("c_acctbal") / 1000.0).cast("long").as("bal_b"))
        val units = spend.join(cov, Seq("ck"))
          .select(col("treated"), col("nk"), col("bal_b"),
            expr("n_ord div 5").as("cnt_b"), col("cents"))
        val strata = units.groupBy(col("nk"), col("bal_b"), col("cnt_b"))
          .agg(
            sum(when(col("treated"), 1L).otherwise(0L)).as("mt"),
            sum(when(!col("treated"), 1L).otherwise(0L)).as("mc"),
            sum(when(col("treated"), col("cents")).otherwise(0L)
              .cast(D)).as("st"),
            sum(when(!col("treated"), col("cents")).otherwise(0L)
              .cast(D)).as("sc"))
        val matched = strata.where(col("mt") > 0 && col("mc") > 0)
          .select(col("mt"), col("mc"),
            expr("""cast(mt as decimal(38,0))
                    * ((st * 1000000) div mt - (sc * 1000000) div mc)""")
              .as("contrib"))
        val agg = matched.agg(
          sum(col("mt")).as("n_treated_matched"),
          sum(col("mc")).as("n_control_matched"),
          count(lit(1)).as("n_strata_matched"),
          sum(col("contrib")).as("num"))
        val pruned = strata.where(col("mt") === 0 || col("mc") === 0)
          .agg(coalesce(sum(col("mt")), lit(0L)).as("n_treated_pruned"),
            coalesce(sum(col("mc")), lit(0L)).as("n_control_pruned"))
        agg.crossJoin(broadcast(pruned))
          .select(col("n_treated_matched"), col("n_control_matched"),
            col("n_strata_matched"), col("n_treated_pruned"),
            col("n_control_pruned"),
            (when(col("num") < 0, -1L).otherwise(1L) *
              expr("abs(num) div n_treated_matched"))
              .cast("long").as("att_micro"))
          .orderBy(col("n_strata_matched"))
      },
      Some("""
        WITH spend AS (
          SELECT o_custkey AS ck, CAST(COUNT(*) AS BIGINT) AS n_ord,
                 CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                      AS BIGINT)) AS BIGINT) AS cents
          FROM orders GROUP BY 1),
        units AS (
          SELECT (c.c_mktsegment = 'BUILDING') AS treated,
                 c.c_nationkey AS nk,
                 CAST(FLOOR(c.c_acctbal / 1000.0) AS BIGINT) AS bal_b,
                 sp.n_ord // 5 AS cnt_b,
                 sp.cents
          FROM spend sp JOIN customer c ON c.c_custkey = sp.ck),
        strata AS (
          SELECT nk, bal_b, cnt_b,
                 CAST(SUM(CASE WHEN treated THEN 1 ELSE 0 END) AS BIGINT)
                   AS mt,
                 CAST(SUM(CASE WHEN NOT treated THEN 1 ELSE 0 END)
                   AS BIGINT) AS mc,
                 SUM(CASE WHEN treated THEN cents ELSE 0 END) AS st,
                 SUM(CASE WHEN NOT treated THEN cents ELSE 0 END) AS sc
          FROM units GROUP BY 1, 2, 3),
        matched AS (
          SELECT mt, mc,
                 CAST(mt AS HUGEINT)
                   * ((CAST(st AS HUGEINT) * 1000000) // mt
                      - (CAST(sc AS HUGEINT) * 1000000) // mc) AS contrib
          FROM strata WHERE mt > 0 AND mc > 0),
        agg AS (
          SELECT CAST(SUM(mt) AS BIGINT) AS n_treated_matched,
                 CAST(SUM(mc) AS BIGINT) AS n_control_matched,
                 CAST(COUNT(*) AS BIGINT) AS n_strata_matched,
                 SUM(contrib) AS num
          FROM matched),
        pruned AS (
          SELECT COALESCE(CAST(SUM(mt) AS BIGINT), 0) AS n_treated_pruned,
                 COALESCE(CAST(SUM(mc) AS BIGINT), 0) AS n_control_pruned
          FROM strata WHERE mt = 0 OR mc = 0)
        SELECT a.n_treated_matched, a.n_control_matched,
               a.n_strata_matched, p.n_treated_pruned, p.n_control_pruned,
               CAST((CASE WHEN a.num < 0 THEN -1 ELSE 1 END)
                    * (abs(a.num) // a.n_treated_matched) AS BIGINT)
                 AS att_micro
        FROM agg a CROSS JOIN pruned p
        ORDER BY a.n_strata_matched""")),

    // Randomization inference — the DESIGN-BASED significance gate for
    // the group contrast q298/q307 estimate: re-randomize the treatment
    // label under the Bernoulli design and ask how extreme the observed
    // contrast is among the replicates. Everything is deterministic and
    // integer-exact: replicate r reassigns customer u via the affine
    // hash h_r(u) = (u32·(2r+1) + r·2654435761) mod 2³² of ONE md5
    // low-32 digest per customer (no per-replicate digests — 128
    // replicates cost 128 multiply-adds per row, not 128 md5s), treated
    // iff h_r·M < M_T·2³² (cross-multiplied exact Bernoulli M_T/M).
    // The statistic is the division-free contrast
    // T = M_c·S_t − M_t·S_c ( = M_t·M_c·(ȳ_t−ȳ_c) ), carried in
    // DECIMAL(38,0); the p-value is the add-one Monte-Carlo estimate
    // (1 + #{|T_r| ≥ |T_obs|}) / (R+1) on the exact ppm lattice.
    // Scale: ONE per-customer rollup, then a broadcast crossJoin with
    // the 128-row replicate frame — 128·N_customers codegen'd integer
    // rows partial-aggregating to 128 groups, no shuffle of the wide
    // side.
    QueryDef(
      "q308_randomization_test",
      (s, dir) => {
        import graft.functions.Kernels.md5Lower64Lo32
        val D = DecimalType(38, 0)
        val spend = Tables.orders(s, dir)
          .groupBy(col("o_custkey").as("ck"))
          .agg(sum((col("o_totalprice").cast(DecimalType(18, 2)) * 100)
            .cast("long")).as("cents"))
        val units = spend
          .join(Tables.customer(s, dir)
            .select(col("c_custkey").as("ck"),
              (col("c_mktsegment") === "BUILDING").as("treated")),
            Seq("ck"))
          .select(col("treated"), col("cents"),
            md5Lower64Lo32(concat(lit("perm:"), col("ck"))).as("u32"))
          .cutLineage()
        val obs = units.agg(
          sum(when(col("treated"), 1L).otherwise(0L)).as("m_t"),
          sum(when(!col("treated"), 1L).otherwise(0L)).as("m_c"),
          sum(when(col("treated"), col("cents")).otherwise(0L).cast(D))
            .as("s_t"),
          sum(when(!col("treated"), col("cents")).otherwise(0L).cast(D))
            .as("s_c"))
          .select(col("m_t"), col("m_c"),
            expr("cast(m_c as decimal(38,0)) * s_t - "
              + "cast(m_t as decimal(38,0)) * s_c").as("t_obs"),
            (col("m_t") + col("m_c")).as("m_all"))
        val reps = s.range(0, 128).select(col("id").as("r"))
        val perRep = units.crossJoin(broadcast(reps))
          .crossJoin(broadcast(obs.select(col("m_t").as("mt0"),
            col("m_all").as("m0"))))
          .select(col("r"), col("cents"),
            // h_r < 2³² and m0/mt0 are unit counts: past ~2³¹ units the
            // Long products h_r·m0 and mt0·2³² would wrap silently
            // (non-ANSI) or throw (ANSI), so the cross-multiplication
            // rides DECIMAL(38,0) like t_obs/t_rep already do — exact
            // to 10³⁸, i.e. to ~10²⁸ units.
            (pmod(col("u32") * (col("r") * 2 + 1)
              + col("r") * 2654435761L, lit(4294967296L)).cast(D)
              * col("m0").cast(D)
              < col("mt0").cast(D) * lit(4294967296L).cast(D))
              .as("t_assign"))
          .groupBy(col("r"))
          .agg(
            sum(when(col("t_assign"), 1L).otherwise(0L)).as("rm_t"),
            sum(when(!col("t_assign"), 1L).otherwise(0L)).as("rm_c"),
            sum(when(col("t_assign"), col("cents")).otherwise(0L)
              .cast(D)).as("rs_t"),
            sum(when(!col("t_assign"), col("cents")).otherwise(0L)
              .cast(D)).as("rs_c"))
          .select(col("r"),
            expr("cast(rm_c as decimal(38,0)) * rs_t - "
              + "cast(rm_t as decimal(38,0)) * rs_c").as("t_rep"))
        perRep.crossJoin(broadcast(obs))
          .agg(
            max(col("m_t")).as("m_treated"),
            max(col("m_c")).as("m_control"),
            max(col("t_obs").cast("long")).as("t_obs"),
            count(lit(1)).as("n_reps"),
            sum(when(abs(col("t_rep")) >= abs(col("t_obs")), 1L)
              .otherwise(0L)).as("n_as_extreme"))
          .select(col("m_treated"), col("m_control"), col("t_obs"),
            col("n_reps"), col("n_as_extreme"),
            expr("((1 + n_as_extreme) * 1000000) div (n_reps + 1)")
              .as("p_value_ppm"))
          .orderBy(col("n_reps"))
      },
      Some("""
        WITH spend AS (
          SELECT o_custkey AS ck,
                 CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                      AS BIGINT)) AS BIGINT) AS cents
          FROM orders GROUP BY 1),
        units AS (
          SELECT (c.c_mktsegment = 'BUILDING') AS treated, sp.cents,
                 CAST(md5_number_lower('perm:' || sp.ck) % 4294967296
                      AS BIGINT) AS u32
          FROM spend sp JOIN customer c ON c.c_custkey = sp.ck),
        obs AS (
          SELECT CAST(SUM(CASE WHEN treated THEN 1 ELSE 0 END) AS BIGINT)
                   AS m_t,
                 CAST(SUM(CASE WHEN NOT treated THEN 1 ELSE 0 END)
                   AS BIGINT) AS m_c,
                 CAST(SUM(CASE WHEN treated THEN 1 ELSE 0 END)
                   + SUM(CASE WHEN NOT treated THEN 1 ELSE 0 END)
                   AS BIGINT) AS m_all,
                 SUM(CASE WHEN treated THEN CAST(cents AS HUGEINT)
                          ELSE 0 END) AS s_t,
                 SUM(CASE WHEN NOT treated THEN CAST(cents AS HUGEINT)
                          ELSE 0 END) AS s_c
          FROM units),
        tobs AS (
          SELECT m_t, m_c, m_all,
                 CAST(m_c AS HUGEINT) * s_t - CAST(m_t AS HUGEINT) * s_c
                   AS t_obs
          FROM obs),
        reps AS (SELECT CAST(r.range AS BIGINT) AS r FROM range(0, 128) r),
        per_rep AS (
          SELECT rp.r,
                 SUM(CASE WHEN ((u.u32 * (rp.r * 2 + 1)
                                 + rp.r * 2654435761) % 4294967296)
                                * t.m_all < t.m_t * 4294967296
                          THEN 1 ELSE 0 END) AS rm_t,
                 SUM(CASE WHEN NOT (((u.u32 * (rp.r * 2 + 1)
                                      + rp.r * 2654435761) % 4294967296)
                                     * t.m_all < t.m_t * 4294967296)
                          THEN 1 ELSE 0 END) AS rm_c,
                 SUM(CASE WHEN ((u.u32 * (rp.r * 2 + 1)
                                 + rp.r * 2654435761) % 4294967296)
                                * t.m_all < t.m_t * 4294967296
                          THEN CAST(u.cents AS HUGEINT) ELSE 0 END)
                   AS rs_t,
                 SUM(CASE WHEN NOT (((u.u32 * (rp.r * 2 + 1)
                                      + rp.r * 2654435761) % 4294967296)
                                     * t.m_all < t.m_t * 4294967296)
                          THEN CAST(u.cents AS HUGEINT) ELSE 0 END)
                   AS rs_c
          FROM units u CROSS JOIN reps rp CROSS JOIN tobs t
          GROUP BY 1),
        treps AS (
          SELECT r, CAST(rm_c AS HUGEINT) * rs_t
                    - CAST(rm_t AS HUGEINT) * rs_c AS t_rep
          FROM per_rep)
        SELECT t.m_t AS m_treated, t.m_c AS m_control,
               CAST(t.t_obs AS BIGINT) AS t_obs,
               CAST(COUNT(*) AS BIGINT) AS n_reps,
               CAST(SUM(CASE WHEN abs(tr.t_rep) >= abs(t.t_obs)
                             THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_as_extreme,
               CAST(((1 + SUM(CASE WHEN abs(tr.t_rep) >= abs(t.t_obs)
                                   THEN 1 ELSE 0 END)) * 1000000)
                    // (COUNT(*) + 1) AS BIGINT) AS p_value_ppm
        FROM treps tr CROSS JOIN tobs t
        GROUP BY t.m_t, t.m_c, t.t_obs
        ORDER BY n_reps""")),

    // t-closeness audit — the third leg of the privacy trio (class
    // sizes q179, sensitive-value diversity q210): does any
    // quasi-identifier class's DISTRIBUTION of the ordered sensitive
    // attribute (balance band) leak, i.e. sit further than t from the
    // global distribution? Distance is the 1-D Earth Mover's Distance
    // for ordered categories — EMD(P,Q) = Σ_i |cum_i(P−Q)| / (m−1) —
    // computed on the exact cross-multiplied lattice: per band,
    // diff_i = c_i·N − C_i·n_g (common denominator n_g·N), cumulated
    // by a KEYED window over the ≤12-band spine, and emitted as
    // emd_ppm = 10⁶·Σ|cum| div ((m−1)·n_g·N) in DECIMAL(38,0) — counts
    // past 2³¹ cannot wrap. Scale: two partial-aggregated scans
    // (global bands, class×band cells); the spine is |classes|·m rows
    // (~1.5k), so the window and the EMD arithmetic are constant-size.
    QueryDef(
      "q316_t_closeness",
      (s, dir) => {
        val c = Tables.customer(s, dir)
          .select(col("c_nationkey").cast("long").as("nk"),
            col("c_mktsegment").as("seg"),
            floor(col("c_acctbal") / 1000.0).cast("long").as("band"))
        val global = c.groupBy(col("band")).agg(count(lit(1)).as("gc"))
        val gtot = global.agg(sum(col("gc")).as("n_total"),
          count(lit(1)).as("m"))
        val classes = c.groupBy(col("nk"), col("seg"))
          .agg(count(lit(1)).as("n_g"))
        val cells = c.groupBy(col("nk"), col("seg"), col("band"))
          .agg(count(lit(1)).as("cc"))
        val spine = classes
          .crossJoin(broadcast(global))
          .crossJoin(broadcast(gtot))
          .join(cells, Seq("nk", "seg", "band"), "left")
          .select(col("nk"), col("seg"), col("n_g"), col("band"),
            col("gc"), col("n_total"), col("m"),
            coalesce(col("cc"), lit(0L)).as("cc"))
        val w = Window.partitionBy(col("nk"), col("seg"))
          .orderBy(col("band"))
        val cums = spine.withColumn("cum",
          sum(expr("""cast(cc as decimal(38,0)) * n_total
                      - cast(gc as decimal(38,0)) * n_g""")).over(w))
        cums.groupBy(col("nk"), col("seg"))
          .agg(min(col("n_g")).as("n_rows"), min(col("m")).as("m"),
            min(col("n_total")).as("n_total"),
            sum(abs(col("cum"))).as("ssum"))
          .select(col("nk"), col("seg"), col("n_rows"),
            expr("""cast((ssum * 1000000)
                    div ((m - 1) * cast(n_rows as decimal(38,0)) * n_total)
                    as bigint)""").as("emd_ppm"))
          .select(col("nk"), col("seg"), col("n_rows"), col("emd_ppm"),
            (col("emd_ppm") > 200000L).as("breaches_t20"))
          .orderBy(col("nk"), col("seg"))
      },
      Some("""
        WITH c AS (
          SELECT CAST(c_nationkey AS BIGINT) AS nk, c_mktsegment AS seg,
                 CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS band
          FROM customer),
        g AS (SELECT band, CAST(COUNT(*) AS BIGINT) AS gc
              FROM c GROUP BY 1),
        gt AS (SELECT CAST(SUM(gc) AS BIGINT) AS n_total,
                      CAST(COUNT(*) AS BIGINT) AS m FROM g),
        cls AS (SELECT nk, seg, CAST(COUNT(*) AS BIGINT) AS n_g
                FROM c GROUP BY 1, 2),
        cell AS (SELECT nk, seg, band, CAST(COUNT(*) AS BIGINT) AS cc
                 FROM c GROUP BY 1, 2, 3),
        spine AS (
          SELECT cl.nk, cl.seg, cl.n_g, g.band, g.gc, gt.n_total, gt.m,
                 COALESCE(ce.cc, 0) AS cc
          FROM cls cl CROSS JOIN g CROSS JOIN gt
          LEFT JOIN cell ce
            ON ce.nk = cl.nk AND ce.seg = cl.seg AND ce.band = g.band),
        cums AS (
          SELECT nk, seg, n_g, n_total, m,
                 SUM(CAST(cc AS HUGEINT) * n_total
                     - CAST(gc AS HUGEINT) * n_g)
                   OVER (PARTITION BY nk, seg ORDER BY band) AS cum
          FROM spine),
        emd AS (
          SELECT nk, seg, CAST(MIN(n_g) AS BIGINT) AS n_rows,
                 CAST((SUM(abs(cum)) * 1000000)
                      // ((MIN(m) - 1) * CAST(MIN(n_g) AS HUGEINT)
                         * MIN(n_total)) AS BIGINT) AS emd_ppm
          FROM cums GROUP BY 1, 2)
        SELECT nk, seg, n_rows, emd_ppm, emd_ppm > 200000 AS breaches_t20
        FROM emd ORDER BY nk, seg""")),

    // Wald / instrumental-variable estimator — the causal family's
    // answer to NON-COMPLIANCE (DiD q298 handles time confounding,
    // CUPED q182 variance, CEM q307 observed confounders; IV handles
    // the unobserved kind, given an instrument): LATE = ITT effect on
    // the outcome ÷ ITT effect on treatment uptake (first stage).
    // Everything is the exact cross-multiplied lattice: with z-arm
    // counts n1/n0, outcome sums Sy1/Sy0 (cents, DECIMAL(38,0)) and
    // uptake counts Sx1/Sx0, itt_num = Sy1·n0 − Sy0·n1 over n1·n0,
    // fs_num = Sx1·n0 − Sx0·n1 over n1·n0, and LATE = itt_num/fs_num —
    // the n1·n0 denominators cancel, so late_micro is ONE |·|-split
    // floored division of two exact integers (Spark div truncates,
    // DuckDB // floors; they agree on positives, so divide magnitudes
    // and reapply the sign). Scale: one customer-grain rollup then
    // 1-row arithmetic; the spend frame is the q308 per-customer
    // aggregate shape.
    QueryDef(
      "q317_wald_iv",
      (s, dir) => {
        val D = DecimalType(38, 0)
        val spend = Tables.orders(s, dir)
          .groupBy(col("o_custkey").as("ck"))
          .agg(sum((col("o_totalprice").cast(DecimalType(18, 2)) * 100)
            .cast("long")).as("cents"))
        val units = Tables.customer(s, dir)
          .select(col("c_custkey").as("ck"),
            col("c_mktsegment").isin("BUILDING", "AUTOMOBILE").as("z"),
            (col("c_mktsegment") === "BUILDING").as("x"))
          .join(spend, Seq("ck"), "left")
          .select(col("z"), col("x"),
            coalesce(col("cents"), lit(0L)).as("y"))
        val arms = units.agg(
          sum(when(col("z"), 1L).otherwise(0L)).as("n1"),
          sum(when(!col("z"), 1L).otherwise(0L)).as("n0"),
          sum(when(col("z"), col("y")).otherwise(0L).cast(D)).as("sy1"),
          sum(when(!col("z"), col("y")).otherwise(0L).cast(D)).as("sy0"),
          sum(when(col("z") && col("x"), 1L).otherwise(0L)).as("sx1"),
          sum(when(!col("z") && col("x"), 1L).otherwise(0L)).as("sx0"))
        arms.select(col("n1").as("n_z1"), col("n0").as("n_z0"),
            expr("sy1 * n0 - sy0 * n1").as("itt_num"),
            expr("cast(sx1 as decimal(38,0)) * n0 - "
              + "cast(sx0 as decimal(38,0)) * n1").as("fs_num"),
            expr("cast(n1 as decimal(38,0)) * n0").as("nn"))
          .select(col("n_z1"), col("n_z0"),
            expr("""cast(case when fs_num < 0 then -((abs(fs_num) * 1000000)
                    div nn) else (fs_num * 1000000) div nn end
                    as bigint)""").as("first_stage_ppm"),
            expr("""cast(case when itt_num < 0 then -((abs(itt_num)
                    * 1000000) div nn) else (itt_num * 1000000) div nn end
                    as bigint)""").as("itt_micro"),
            expr("""cast(case when itt_num * fs_num < 0
                    then -((abs(itt_num) * 1000000) div abs(fs_num))
                    else (abs(itt_num) * 1000000) div abs(fs_num) end
                    as bigint)""").as("late_micro"))
          .orderBy(col("n_z1"))
      },
      Some("""
        WITH spend AS (
          SELECT o_custkey AS ck,
                 CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                   AS BIGINT)) AS BIGINT) AS cents
          FROM orders GROUP BY 1),
        units AS (
          SELECT c.c_mktsegment IN ('BUILDING', 'AUTOMOBILE') AS z,
                 c.c_mktsegment = 'BUILDING' AS x,
                 COALESCE(s.cents, 0) AS y
          FROM customer c LEFT JOIN spend s ON s.ck = c.c_custkey),
        arms AS (
          SELECT CAST(SUM(CASE WHEN z THEN 1 ELSE 0 END) AS BIGINT) AS n1,
                 CAST(SUM(CASE WHEN NOT z THEN 1 ELSE 0 END) AS BIGINT)
                   AS n0,
                 CAST(SUM(CASE WHEN z THEN y ELSE 0 END) AS HUGEINT)
                   AS sy1,
                 CAST(SUM(CASE WHEN NOT z THEN y ELSE 0 END) AS HUGEINT)
                   AS sy0,
                 CAST(SUM(CASE WHEN z AND x THEN 1 ELSE 0 END) AS HUGEINT)
                   AS sx1,
                 CAST(SUM(CASE WHEN NOT z AND x THEN 1 ELSE 0 END)
                   AS HUGEINT) AS sx0
          FROM units),
        nums AS (
          SELECT n1 AS n_z1, n0 AS n_z0,
                 sy1 * n0 - sy0 * n1 AS itt_num,
                 sx1 * n0 - sx0 * n1 AS fs_num,
                 CAST(n1 AS HUGEINT) * n0 AS nn
          FROM arms)
        SELECT n_z1, n_z0,
               CAST(CASE WHEN fs_num < 0
                    THEN -((abs(fs_num) * 1000000) // nn)
                    ELSE (fs_num * 1000000) // nn END AS BIGINT)
                 AS first_stage_ppm,
               CAST(CASE WHEN itt_num < 0
                    THEN -((abs(itt_num) * 1000000) // nn)
                    ELSE (itt_num * 1000000) // nn END AS BIGINT)
                 AS itt_micro,
               CAST(CASE WHEN itt_num * fs_num < 0
                    THEN -((abs(itt_num) * 1000000) // abs(fs_num))
                    ELSE (abs(itt_num) * 1000000) // abs(fs_num) END
                 AS BIGINT) AS late_micro
        FROM nums ORDER BY n_z1""")),

    // Mantel-Haenszel pooled odds ratio — STRATIFIED 2×2 association
    // (the chi-square q185 tests one table; MH pools many while
    // adjusting for the stratifying confounder — the textbook
    // Simpson's-paradox guard). Strata = order priority; exposure =
    // BUILDING-segment customer; outcome = order contains a returned
    // line. MH = Σ_i(a_i·d_i/n_i) / Σ_i(b_i·c_i/n_i), carried exactly:
    // per stratum, floor(a·d·10⁶/n) and floor(b·c·10⁶/n) in
    // DECIMAL(38,0) (all operands non-negative → div IS floor on both
    // engines), summed, one final ppm ratio. The crude (unstratified)
    // OR rides along so the gate exhibits the adjustment itself.
    // Scale: outcome is a lineitem partial-aggregate joined to orders
    // on the join key both sides shuffle anyway; everything after the
    // 5-stratum rollup is constant-size.
    QueryDef(
      "q318_mantel_haenszel",
      (s, dir) => {
        val returned = Tables.lineitem(s, dir)
          .groupBy(col("l_orderkey"))
          .agg(max(when(col("l_returnflag") === "R", 1L).otherwise(0L))
            .as("ret"))
        val seg = Tables.customer(s, dir)
          .select(col("c_custkey"),
            (col("c_mktsegment") === "BUILDING").as("exposed"))
        val tables = Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_custkey"),
            col("o_orderpriority").as("priority"))
          .join(returned, col("o_orderkey") === col("l_orderkey"))
          .join(broadcast(seg), col("o_custkey") === col("c_custkey"))
          .groupBy(col("priority"))
          .agg(
            sum(when(col("exposed") && col("ret") === 1L, 1L)
              .otherwise(0L)).as("a"),
            sum(when(col("exposed") && col("ret") === 0L, 1L)
              .otherwise(0L)).as("b"),
            sum(when(!col("exposed") && col("ret") === 1L, 1L)
              .otherwise(0L)).as("c"),
            sum(when(!col("exposed") && col("ret") === 0L, 1L)
              .otherwise(0L)).as("d"))
        val pooled = tables.agg(
          sum(expr("""(cast(a as decimal(38,0)) * d * 1000000)
                      div (a + b + c + d)""")).as("r6"),
          sum(expr("""(cast(b as decimal(38,0)) * c * 1000000)
                      div (a + b + c + d)""")).as("s6"),
          sum(col("a")).as("ta"), sum(col("b")).as("tb"),
          sum(col("c")).as("tc"), sum(col("d")).as("td"))
          .select(
            expr("cast((r6 * 1000000) div s6 as bigint)").as("mh_or_ppm"),
            expr("""cast((cast(ta as decimal(38,0)) * td * 1000000)
                    div (cast(tb as decimal(38,0)) * tc) as bigint)""")
              .as("crude_or_ppm"))
        tables.crossJoin(broadcast(pooled))
          .select(col("priority"), col("a"), col("b"), col("c"), col("d"),
            col("mh_or_ppm"), col("crude_or_ppm"))
          .orderBy(col("priority"))
      },
      Some("""
        WITH ret AS (
          SELECT l_orderkey,
                 CAST(MAX(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                   AS BIGINT) AS ret
          FROM lineitem GROUP BY 1),
        t AS (
          SELECT o.o_orderpriority AS priority,
                 CAST(SUM(CASE WHEN c.c_mktsegment = 'BUILDING'
                       AND r.ret = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a,
                 CAST(SUM(CASE WHEN c.c_mktsegment = 'BUILDING'
                       AND r.ret = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b,
                 CAST(SUM(CASE WHEN c.c_mktsegment <> 'BUILDING'
                       AND r.ret = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c,
                 CAST(SUM(CASE WHEN c.c_mktsegment <> 'BUILDING'
                       AND r.ret = 0 THEN 1 ELSE 0 END) AS BIGINT) AS d
          FROM orders o
          JOIN ret r ON r.l_orderkey = o.o_orderkey
          JOIN customer c ON c.c_custkey = o.o_custkey
          GROUP BY 1),
        pooled AS (
          SELECT CAST((SUM((CAST(a AS HUGEINT) * d * 1000000)
                           // (a + b + c + d)) * 1000000)
                      // SUM((CAST(b AS HUGEINT) * c * 1000000)
                           // (a + b + c + d)) AS BIGINT) AS mh_or_ppm,
                 CAST((CAST(SUM(a) AS HUGEINT) * SUM(d) * 1000000)
                      // (CAST(SUM(b) AS HUGEINT) * SUM(c)) AS BIGINT)
                   AS crude_or_ppm
          FROM t)
        SELECT t.priority, t.a, t.b, t.c, t.d,
               p.mh_or_ppm, p.crude_or_ppm
        FROM t CROSS JOIN pooled p
        ORDER BY t.priority""")),

    // Delta-method inference for a RATIO metric (revenue per order) —
    // the experiment family's missing variance leg: q181 handles
    // proportions and q182 user-level means, but the metrics products
    // actually ship (revenue/order, clicks/session) are ratios of sums
    // whose numerator and denominator are correlated WITHIN a
    // randomization unit, so naive row-level variance is wrong. Deng et
    // al.'s delta method: Var(ΣY/ΣX) ≈ (s_y² − 2R·s_xy + R²·s_x²) /
    // (n·x̄²), from per-customer (x = orders, y = cents) moments. The
    // moments are EXACT (counts in BIGINT, products in DECIMAL(38,0));
    // ratios, variances, and the z statistic are ONE fixed-order IEEE
    // closed form each (q168 stance — identical op order, sqrt is
    // correctly rounded → bit-identical cross-engine). Scale: one
    // customer-grain rollup, then 1-row arithmetic.
    QueryDef(
      "q329_delta_method_ratio",
      (s, dir) => {
        val per = Tables.orders(s, dir)
          .groupBy(col("o_custkey").as("ck"))
          .agg(count(lit(1)).as("x"),
            sum((col("o_totalprice").cast(DecimalType(18, 2)) * 100)
              .cast("long")).as("y"))
        val units = Tables.customer(s, dir)
          .select(col("c_custkey").as("ck"),
            (col("c_mktsegment") === "BUILDING").as("z"))
          .join(per, Seq("ck"), "left")
          .select(col("z"), coalesce(col("x"), lit(0L)).as("x"),
            coalesce(col("y"), lit(0L)).as("y"))
        val mom = units.agg(
          sum(when(col("z"), 1L).otherwise(0L)).as("n_t"),
          sum(when(!col("z"), 1L).otherwise(0L)).as("n_c"),
          sum(when(col("z"), col("x")).otherwise(0L)).as("sx_t"),
          sum(when(!col("z"), col("x")).otherwise(0L)).as("sx_c"),
          sum(when(col("z"), col("y")).otherwise(0L)).as("sy_t"),
          sum(when(!col("z"), col("y")).otherwise(0L)).as("sy_c"),
          sum(when(col("z"), expr("cast(x as decimal(38,0)) * x"))
            .otherwise(lit(0))).as("sxx_t"),
          sum(when(!col("z"), expr("cast(x as decimal(38,0)) * x"))
            .otherwise(lit(0))).as("sxx_c"),
          sum(when(col("z"), expr("cast(y as decimal(38,0)) * y"))
            .otherwise(lit(0))).as("syy_t"),
          sum(when(!col("z"), expr("cast(y as decimal(38,0)) * y"))
            .otherwise(lit(0))).as("syy_c"),
          sum(when(col("z"), expr("cast(x as decimal(38,0)) * y"))
            .otherwise(lit(0))).as("sxy_t"),
          sum(when(!col("z"), expr("cast(x as decimal(38,0)) * y"))
            .otherwise(lit(0))).as("sxy_c"))
        def arm(sfx: String): Seq[org.apache.spark.sql.Column] = Seq(
          expr(s"cast(sy_$sfx as double) / cast(sx_$sfx as double)")
            .as(s"ratio_$sfx"),
          expr(s"""((cast(syy_$sfx as double)
                     - cast(sy_$sfx as double) * cast(sy_$sfx as double)
                       / cast(n_$sfx as double))
                    - cast(2 as double)
                      * (cast(sy_$sfx as double) / cast(sx_$sfx as double))
                      * (cast(sxy_$sfx as double)
                         - cast(sx_$sfx as double) * cast(sy_$sfx as double)
                           / cast(n_$sfx as double))
                    + (cast(sy_$sfx as double) / cast(sx_$sfx as double))
                      * (cast(sy_$sfx as double) / cast(sx_$sfx as double))
                      * (cast(sxx_$sfx as double)
                         - cast(sx_$sfx as double) * cast(sx_$sfx as double)
                           / cast(n_$sfx as double)))
                   / (cast(n_$sfx as double) - cast(1 as double))
                   / (cast(n_$sfx as double)
                      * (cast(sx_$sfx as double) / cast(n_$sfx as double))
                      * (cast(sx_$sfx as double) / cast(n_$sfx as double)))""")
            .as(s"var_$sfx"))
        mom.select(Seq(col("n_t"), col("n_c"), col("sx_t").as("orders_t"),
            col("sx_c").as("orders_c")) ++ arm("t") ++ arm("c"): _*)
          .withColumn("z_stat",
            (col("ratio_t") - col("ratio_c"))
              / sqrt(col("var_t") + col("var_c")))
          .orderBy(col("n_t"))
      },
      Some("""
        WITH per AS (
          SELECT o_custkey AS ck, CAST(COUNT(*) AS BIGINT) AS x,
                 CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                   AS BIGINT)) AS BIGINT) AS y
          FROM orders GROUP BY 1),
        units AS (
          SELECT c.c_mktsegment = 'BUILDING' AS z,
                 COALESCE(p.x, 0) AS x, COALESCE(p.y, 0) AS y
          FROM customer c LEFT JOIN per p ON p.ck = c.c_custkey),
        mom AS (
          SELECT CAST(SUM(CASE WHEN z THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
                 CAST(SUM(CASE WHEN NOT z THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_c,
                 CAST(SUM(CASE WHEN z THEN x ELSE 0 END) AS BIGINT) AS sx_t,
                 CAST(SUM(CASE WHEN NOT z THEN x ELSE 0 END) AS BIGINT)
                   AS sx_c,
                 CAST(SUM(CASE WHEN z THEN y ELSE 0 END) AS BIGINT) AS sy_t,
                 CAST(SUM(CASE WHEN NOT z THEN y ELSE 0 END) AS BIGINT)
                   AS sy_c,
                 SUM(CASE WHEN z THEN CAST(x AS HUGEINT) * x ELSE 0 END)
                   AS sxx_t,
                 SUM(CASE WHEN NOT z THEN CAST(x AS HUGEINT) * x ELSE 0 END)
                   AS sxx_c,
                 SUM(CASE WHEN z THEN CAST(y AS HUGEINT) * y ELSE 0 END)
                   AS syy_t,
                 SUM(CASE WHEN NOT z THEN CAST(y AS HUGEINT) * y ELSE 0 END)
                   AS syy_c,
                 SUM(CASE WHEN z THEN CAST(x AS HUGEINT) * y ELSE 0 END)
                   AS sxy_t,
                 SUM(CASE WHEN NOT z THEN CAST(x AS HUGEINT) * y ELSE 0 END)
                   AS sxy_c
          FROM units),
        res AS (
          SELECT n_t, n_c, sx_t AS orders_t, sx_c AS orders_c,
                 CAST(sy_t AS DOUBLE) / CAST(sx_t AS DOUBLE) AS ratio_t,
                 ((CAST(syy_t AS DOUBLE)
                    - CAST(sy_t AS DOUBLE) * CAST(sy_t AS DOUBLE)
                      / CAST(n_t AS DOUBLE))
                   - CAST(2 AS DOUBLE)
                     * (CAST(sy_t AS DOUBLE) / CAST(sx_t AS DOUBLE))
                     * (CAST(sxy_t AS DOUBLE)
                        - CAST(sx_t AS DOUBLE) * CAST(sy_t AS DOUBLE)
                          / CAST(n_t AS DOUBLE))
                   + (CAST(sy_t AS DOUBLE) / CAST(sx_t AS DOUBLE))
                     * (CAST(sy_t AS DOUBLE) / CAST(sx_t AS DOUBLE))
                     * (CAST(sxx_t AS DOUBLE)
                        - CAST(sx_t AS DOUBLE) * CAST(sx_t AS DOUBLE)
                          / CAST(n_t AS DOUBLE)))
                  / (CAST(n_t AS DOUBLE) - CAST(1 AS DOUBLE))
                  / (CAST(n_t AS DOUBLE)
                     * (CAST(sx_t AS DOUBLE) / CAST(n_t AS DOUBLE))
                     * (CAST(sx_t AS DOUBLE) / CAST(n_t AS DOUBLE)))
                   AS var_t,
                 CAST(sy_c AS DOUBLE) / CAST(sx_c AS DOUBLE) AS ratio_c,
                 ((CAST(syy_c AS DOUBLE)
                    - CAST(sy_c AS DOUBLE) * CAST(sy_c AS DOUBLE)
                      / CAST(n_c AS DOUBLE))
                   - CAST(2 AS DOUBLE)
                     * (CAST(sy_c AS DOUBLE) / CAST(sx_c AS DOUBLE))
                     * (CAST(sxy_c AS DOUBLE)
                        - CAST(sx_c AS DOUBLE) * CAST(sy_c AS DOUBLE)
                          / CAST(n_c AS DOUBLE))
                   + (CAST(sy_c AS DOUBLE) / CAST(sx_c AS DOUBLE))
                     * (CAST(sy_c AS DOUBLE) / CAST(sx_c AS DOUBLE))
                     * (CAST(sxx_c AS DOUBLE)
                        - CAST(sx_c AS DOUBLE) * CAST(sx_c AS DOUBLE)
                          / CAST(n_c AS DOUBLE)))
                  / (CAST(n_c AS DOUBLE) - CAST(1 AS DOUBLE))
                  / (CAST(n_c AS DOUBLE)
                     * (CAST(sx_c AS DOUBLE) / CAST(n_c AS DOUBLE))
                     * (CAST(sx_c AS DOUBLE) / CAST(n_c AS DOUBLE)))
                   AS var_c
          FROM mom)
        SELECT n_t, n_c, orders_t, orders_c, ratio_t, var_t, ratio_c,
               var_c,
               (ratio_t - ratio_c) / sqrt(var_t + var_c) AS z_stat
        FROM res ORDER BY n_t"""))
    ,

    // Uplift-by-band + Qini curve — the TARGETING companion of the
    // q181 A/B gate: instead of one average effect, rank units by a
    // model score and ask "how much incremental conversion do the
    // top-scored bands capture?" (Radcliffe's Qini). Score = account-
    // balance band (cents shifted positive then fixed-width 1100-unit
    // bands — a VALUE-DOMAIN bucketing, ≤11 bands at any sf, positive
    // everywhere so div/floor agree); treatment = the q181 hash coin;
    // outcome = ≥1 URGENT-priority order. Per band: exact counts and
    // the uplift on the ppm lattice. The Qini curve walks bands in
    // score-DESC order via a triangular self-join over the ≤11-row
    // band frame (bounded — never a data-proportional window):
    // qini_ppm(k) = conv_t_cum·10⁶ − (conv_c_cum·n_t_cum·10⁶) div
    // n_c_cum, and the random-targeting baseline prorates the final
    // curve value by cumulative population share. Treatment is a pure
    // hash coin, so an honest gate reads ≈0 uplift everywhere — the
    // null-experiment stance of q314. Scale: one customer rollup + one
    // broadcast dim join; everything after is ≤11 rows.
    QueryDef(
      "q333_uplift_qini",
      (s, dir) => {
        val urgent = Tables.orders(s, dir)
          .where(col("o_orderpriority") === "1-URGENT")
          .select(col("o_custkey")).distinct()
          .withColumn("y", lit(1L))
        val units = Tables.customer(s, dir)
          .select(col("c_custkey"),
            expr("(cast(c_acctbal * 100 as bigint) + 100000) div 110000")
              .as("band"),
            when(md5BitsModK(md5Bits(concat(lit("up:"), col("c_custkey"))),
              2L) === 0L, 1L).otherwise(0L).as("t"))
          .join(urgent, col("c_custkey") === col("o_custkey"), "left")
          .select(col("band"), col("t"),
            coalesce(col("y"), lit(0L)).as("y"))
        val bands = units.groupBy(col("band")).agg(
            sum(col("t")).as("n_t"),
            sum(lit(1L) - col("t")).as("n_c"),
            sum(col("t") * col("y")).as("conv_t"),
            sum((lit(1L) - col("t")) * col("y")).as("conv_c"))
          .cutLineage()
        val cum = bands.as("k").join(bands.as("j"),
            col("j.band") >= col("k.band"))
          .groupBy(col("k.band").as("band"), col("k.n_t").as("n_t"),
            col("k.n_c").as("n_c"), col("k.conv_t").as("conv_t"),
            col("k.conv_c").as("conv_c"))
          .agg(sum(col("j.n_t")).as("ct_n"), sum(col("j.n_c")).as("cc_n"),
            sum(col("j.conv_t")).as("ct_x"), sum(col("j.conv_c")).as("cc_x"))
        val tot = bands.agg(
          sum(col("n_t")).as("tn_t"), sum(col("n_c")).as("tn_c"),
          sum(col("conv_t")).as("tx_t"), sum(col("conv_c")).as("tx_c"))
        cum.crossJoin(broadcast(tot))
          // every div has a guarded-positive numerator on the
          // DECIMAL(38,0) lane except the random baseline, whose
          // numerator can go negative under the null — |·|-split so
          // Spark's truncating div and DuckDB's flooring // agree
          // (the q327 discipline)
          .withColumn("qrand_num",
            expr("""(cast(tx_t as decimal(38,0)) * 1000000
                     - (cast(tx_c as decimal(38,0)) * tn_t * 1000000)
                       div tn_c) * (ct_n + cc_n)"""))
          .select(col("band"), col("n_t"), col("n_c"), col("conv_t"),
            col("conv_c"),
            when(col("n_t") > 0 && col("n_c") > 0,
              expr("""cast((cast(conv_t as decimal(38,0)) * 1000000)
                        div n_t
                      - (cast(conv_c as decimal(38,0)) * 1000000)
                        div n_c as bigint)""")).otherwise(lit(0L))
              .as("uplift_ppm"),
            when(col("cc_n") > 0,
              expr("""cast(cast(ct_x as decimal(38,0)) * 1000000
                      - (cast(cc_x as decimal(38,0)) * ct_n * 1000000)
                        div cc_n as bigint)""")).otherwise(lit(0L))
              .as("qini_ppm"),
            expr("""cast(case when qrand_num < 0
                         then -((-qrand_num) div (tn_t + tn_c))
                         else qrand_num div (tn_t + tn_c) end
                    as bigint)""").as("qini_random_ppm"))
          .orderBy(col("band").desc)
      },
      Some("""
        WITH urgent AS (
          SELECT DISTINCT o_custkey, 1::BIGINT AS y
          FROM orders WHERE o_orderpriority = '1-URGENT'),
        units AS (
          SELECT (CAST(c.c_acctbal * 100 AS BIGINT) + 100000) // 110000
                   AS band,
                 CASE WHEN CAST(md5_number_lower('up:' || c.c_custkey) % 2
                        AS BIGINT) = 0 THEN 1 ELSE 0 END AS t,
                 COALESCE(u.y, 0) AS y
          FROM customer c LEFT JOIN urgent u ON c.c_custkey = u.o_custkey),
        bands AS (
          SELECT band,
                 CAST(SUM(t) AS BIGINT) AS n_t,
                 CAST(SUM(1 - t) AS BIGINT) AS n_c,
                 CAST(SUM(t * y) AS BIGINT) AS conv_t,
                 CAST(SUM((1 - t) * y) AS BIGINT) AS conv_c
          FROM units GROUP BY 1),
        cum AS (
          SELECT k.band, k.n_t, k.n_c, k.conv_t, k.conv_c,
                 CAST(SUM(j.n_t) AS BIGINT) AS ct_n,
                 CAST(SUM(j.n_c) AS BIGINT) AS cc_n,
                 CAST(SUM(j.conv_t) AS BIGINT) AS ct_x,
                 CAST(SUM(j.conv_c) AS BIGINT) AS cc_x
          FROM bands k JOIN bands j ON j.band >= k.band
          GROUP BY 1, 2, 3, 4, 5),
        tot AS (
          SELECT CAST(SUM(n_t) AS BIGINT) AS tn_t,
                 CAST(SUM(n_c) AS BIGINT) AS tn_c,
                 CAST(SUM(conv_t) AS BIGINT) AS tx_t,
                 CAST(SUM(conv_c) AS BIGINT) AS tx_c
          FROM bands),
        wide AS (
          SELECT band, n_t, n_c, conv_t, conv_c, ct_n, cc_n, ct_x, cc_x,
                 tn_t, tn_c, tx_t, tx_c,
                 (CAST(tx_t AS HUGEINT) * 1000000
                  - (CAST(tx_c AS HUGEINT) * tn_t * 1000000) // tn_c)
                   * (ct_n + cc_n) AS qrand_num
          FROM cum CROSS JOIN tot)
        SELECT band, n_t, n_c, conv_t, conv_c,
               CASE WHEN n_t > 0 AND n_c > 0
                    THEN CAST((CAST(conv_t AS HUGEINT) * 1000000) // n_t
                         - (CAST(conv_c AS HUGEINT) * 1000000) // n_c
                         AS BIGINT)
                    ELSE 0 END AS uplift_ppm,
               CASE WHEN cc_n > 0
                    THEN CAST(CAST(ct_x AS HUGEINT) * 1000000
                         - (CAST(cc_x AS HUGEINT) * ct_n * 1000000) // cc_n
                         AS BIGINT)
                    ELSE 0 END AS qini_ppm,
               CAST(CASE WHEN qrand_num < 0
                         THEN -((-qrand_num) // (tn_t + tn_c))
                         ELSE qrand_num // (tn_t + tn_c) END AS BIGINT)
                 AS qini_random_ppm
        FROM wide
        ORDER BY band DESC""")),

    // Randomized response (Warner) — the LOCAL-differential-privacy
    // collection primitive: each unit reports its true market segment
    // with p = 3/4, else a hash-uniform segment from the k = 5 domain
    // (so P(report s | true t) = p·[s=t] + (1−p)/k and ε = ln(1+pk/(1−p))
    // = ln 16 ≈ 2.77 — stated, not computed: no transcendentals). Both
    // the keep-coin and the replacement pick are content-keyed md5
    // lanes, so the NOISY table itself is bit-identical on both engines
    // — the gate checks the MECHANISM and the debiasing, not an RNG.
    // Debias: est(s) = (obs(s) − n(1−p)/k)/p = (20·obs − n)/15, carried
    // as the exact integer numerator est_x15 (no division — it can go
    // negative on small samples, where div/floor would diverge). The
    // accuracy audit |est − true| ≤ n/10 is the cross-multiplied
    // boolean |est_x15 − 15·true| ≤ 15·n/10 (±n/10 ≈ 5σ of the RR noise
    // at sf0.01 — a COMPUTED bound on both engines). Scale: one
    // map-side-combinable rollup over the unit table; the segment
    // domain is fixed at 5 rows.
    QueryDef(
      "q334_randomized_response",
      (s, dir) => {
        val segs = Seq("AUTOMOBILE", "BUILDING", "FURNITURE",
          "HOUSEHOLD", "MACHINERY")
        val segArr = array(segs.map(lit): _*)
        val reported = Tables.customer(s, dir)
          .select(col("c_custkey"), col("c_mktsegment").as("true_seg"))
          .withColumn("keep",
            md5BitsModK(md5Bits(concat(lit("rrcoin:"), col("c_custkey"))),
              4L) < 3L)
          .withColumn("pick", element_at(segArr,
            (md5BitsModK(md5Bits(concat(lit("rrpick:"), col("c_custkey"))),
              5L) + 1L).cast("int")))
          .select(col("true_seg"),
            when(col("keep"), col("true_seg")).otherwise(col("pick"))
              .as("rep_seg"))
          .cutLineage()
        val n = reported.agg(count(lit(1)).as("n"))
        val obs = reported.groupBy(col("rep_seg").as("segment"))
          .agg(count(lit(1)).as("n_obs"))
        val tru = reported.groupBy(col("true_seg").as("segment"))
          .agg(count(lit(1)).as("n_true"))
        obs.join(tru, Seq("segment"), "full_outer")
          .select(col("segment"),
            coalesce(col("n_obs"), lit(0L)).as("n_obs"),
            coalesce(col("n_true"), lit(0L)).as("n_true"))
          .crossJoin(broadcast(n))
          .select(col("segment"), col("n_obs"), col("n_true"),
            (col("n_obs") * 20L - col("n")).as("est_x15"),
            (abs(col("n_obs") * 20L - col("n") - col("n_true") * 15L)
              * 10L <= col("n") * 15L).as("within_bound"))
          .orderBy(col("segment"))
      },
      Some("""
        WITH rep AS (
          SELECT c_mktsegment AS true_seg,
                 CASE WHEN CAST(md5_number_lower('rrcoin:' || c_custkey) % 4
                        AS BIGINT) < 3
                      THEN c_mktsegment
                      ELSE (['AUTOMOBILE','BUILDING','FURNITURE',
                             'HOUSEHOLD','MACHINERY'])[
                        CAST(md5_number_lower('rrpick:' || c_custkey) % 5
                          AS BIGINT) + 1]
                 END AS rep_seg
          FROM customer),
        n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM rep),
        obs AS (SELECT rep_seg AS segment, CAST(COUNT(*) AS BIGINT) AS n_obs
                FROM rep GROUP BY 1),
        tru AS (SELECT true_seg AS segment, CAST(COUNT(*) AS BIGINT) AS n_true
                FROM rep GROUP BY 1)
        SELECT COALESCE(o.segment, t.segment) AS segment,
               COALESCE(o.n_obs, 0) AS n_obs,
               COALESCE(t.n_true, 0) AS n_true,
               COALESCE(o.n_obs, 0) * 20 - n.n AS est_x15,
               abs(COALESCE(o.n_obs, 0) * 20 - n.n
                   - COALESCE(t.n_true, 0) * 15) * 10 <= n.n * 15
                 AS within_bound
        FROM obs o FULL JOIN tru t ON o.segment = t.segment
        CROSS JOIN n
        ORDER BY segment""")),

    // O'Brien-Fleming group-sequential monitoring — the INTERIM-look
    // discipline for a fixed-horizon A/B test (the complement of q276's
    // open-ended SPRT): three equally-spaced looks at the cumulative
    // two-proportion z², each compared against the OBF spending
    // boundary z_k = C·√(K/k), which is nearly uncrossable early and
    // relaxes to ≈ the fixed-sample bound at the end. Boundary
    // constants are the published two-sided α=0.05, K=3 values
    // z = {3.471, 2.454, 2.004} (Jennison & Turnbull tables), carried
    // EXACTLY as z²·10⁶ = 3471², 2454², 2004² — integers, no normal
    // quantile evaluated at query time. Looks are calendar thirds of
    // the order-date span (integer datediff cuts); each order lands in
    // its FIRST look bucket and cumulative counts come from a 3-row
    // triangular walk — one corpus rollup total. The crossing verdict
    // is the q336-style cross-multiplied integer predicate
    // 10⁶·n·(xa·nb−xb·na)² > B_k·na·nb·X·(n−X) on DECIMAL(38,0) (the
    // signed factor only enters squared; exact lane holds to n ≈ 10⁷
    // units — past that, rescale to the ppm lattice first). Arms are
    // the q181 hash coin, so the honest verdict is "never crossed".
    QueryDef(
      "q342_obrien_fleming",
      (s, dir) => {
        val o = Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_orderdate").cast("date").as("d"),
            (col("o_orderstatus") === "F").as("conv"),
            (md5BitsModK(md5Bits(concat(lit("gs:"), col("o_orderkey"))),
              2L) === 0L).as("ctl"))
        val bounds = o.agg(min(col("d")).as("dmin"), max(col("d")).as("dmax"))
        val perLook = o.crossJoin(broadcast(bounds))
          .withColumn("dd", datediff(col("d"), col("dmin")).cast("long"))
          .withColumn("span", datediff(col("dmax"), col("dmin")).cast("long"))
          .withColumn("lk",
            when(col("dd") <= expr("span div 3"), 1L)
              .when(col("dd") <= expr("(span * 2) div 3"), 2L)
              .otherwise(3L))
          .groupBy(col("lk")).agg(
            sum(when(col("ctl"), 1L).otherwise(0L)).as("pna"),
            sum(when(col("ctl") && col("conv"), 1L).otherwise(0L)).as("pxa"),
            sum(when(!col("ctl"), 1L).otherwise(0L)).as("pnb"),
            sum(when(!col("ctl") && col("conv"), 1L).otherwise(0L))
              .as("pxb"))
          .cutLineage()
        val cum = perLook.as("x").join(perLook.as("y"),
            col("y.lk") <= col("x.lk"))
          .groupBy(col("x.lk").as("look"))
          .agg(sum(col("y.pna")).as("na"), sum(col("y.pxa")).as("xa"),
            sum(col("y.pnb")).as("nb"), sum(col("y.pxb")).as("xb"))
          .withColumn("bk",
            when(col("look") === 1, 12047841L)
              .when(col("look") === 2, 6022116L).otherwise(4016016L))
          .withColumn("crossed",
            expr("""(cast(na + nb as decimal(38,0))
                     * (cast(xa as decimal(38,0)) * nb
                        - cast(xb as decimal(38,0)) * na)
                     * (cast(xa as decimal(38,0)) * nb
                        - cast(xb as decimal(38,0)) * na) * 1000000)
                   > (cast(bk as decimal(38,0)) * na * nb
                      * (xa + xb) * (na + nb - xa - xb))"""))
          .cutLineage()
        val anyc = cum.agg(
          max(when(col("crossed"), 1L).otherwise(0L)).as("any1"))
        cum.crossJoin(broadcast(anyc))
          .select(col("look"), col("na"), col("xa"), col("nb"), col("xb"),
            col("bk").as("boundary_z2_x1e6"), col("crossed"),
            (col("any1") === 1L).as("any_crossed"))
          .orderBy(col("look"))
      },
      Some("""
        WITH o AS (
          SELECT CAST(o_orderdate AS DATE) AS d,
                 (o_orderstatus = 'F') AS conv,
                 (CAST(md5_number_lower('gs:' || o_orderkey) % 2 AS BIGINT)
                   = 0) AS ctl
          FROM orders),
        bounds AS (SELECT MIN(d) AS dmin, MAX(d) AS dmax FROM o),
        perlook AS (
          SELECT CASE
                   WHEN date_diff('day', b.dmin, o.d)
                     <= date_diff('day', b.dmin, b.dmax) // 3 THEN 1
                   WHEN date_diff('day', b.dmin, o.d)
                     <= (date_diff('day', b.dmin, b.dmax) * 2) // 3 THEN 2
                   ELSE 3 END AS lk,
                 CAST(SUM(CASE WHEN ctl THEN 1 ELSE 0 END) AS BIGINT)
                   AS pna,
                 CAST(SUM(CASE WHEN ctl AND conv THEN 1 ELSE 0 END)
                   AS BIGINT) AS pxa,
                 CAST(SUM(CASE WHEN NOT ctl THEN 1 ELSE 0 END) AS BIGINT)
                   AS pnb,
                 CAST(SUM(CASE WHEN NOT ctl AND conv THEN 1 ELSE 0 END)
                   AS BIGINT) AS pxb
          FROM o CROSS JOIN bounds b
          GROUP BY 1),
        cum AS (
          SELECT x.lk AS look,
                 CAST(SUM(y.pna) AS BIGINT) AS na,
                 CAST(SUM(y.pxa) AS BIGINT) AS xa,
                 CAST(SUM(y.pnb) AS BIGINT) AS nb,
                 CAST(SUM(y.pxb) AS BIGINT) AS xb
          FROM perlook x JOIN perlook y ON y.lk <= x.lk
          GROUP BY 1),
        v AS (
          SELECT look, na, xa, nb, xb,
                 CASE look WHEN 1 THEN 12047841::BIGINT
                           WHEN 2 THEN 6022116::BIGINT
                           ELSE 4016016::BIGINT END AS bk
          FROM cum),
        w AS (
          SELECT look, na, xa, nb, xb, bk,
                 (CAST(na + nb AS HUGEINT)
                  * (CAST(xa AS HUGEINT) * nb - CAST(xb AS HUGEINT) * na)
                  * (CAST(xa AS HUGEINT) * nb - CAST(xb AS HUGEINT) * na)
                  * 1000000)
                 > (CAST(bk AS HUGEINT) * na * nb
                    * (xa + xb) * (na + nb - xa - xb)) AS crossed
          FROM v)
        SELECT CAST(look AS BIGINT) AS look, na, xa, nb, xb,
               bk AS boundary_z2_x1e6, crossed,
               (SELECT MAX(CASE WHEN crossed THEN 1 ELSE 0 END) FROM w) = 1
                 AS any_crossed
        FROM w
        ORDER BY look""")),

    // Neyman allocation — the OPTIMAL stratified-sampling design
    // (allocate n_h ∝ N_h·S_h: big AND volatile strata get the sample),
    // the step before any stratified A/B test or survey estimate; equal
    // or proportional allocation wastes variance on homogeneous strata.
    // Strata are the five order priorities, the variable is order value
    // in cents. Everything stays exact: the sample variance is the
    // integer lattice (N·Σx²−(Σx)²) div (N·(N−1)) on DECIMAL(38,0);
    // N_h·S_h = isqrt(N_h²·s²_h) with the isqrt computed as
    // floor(sqrt(double)) then corrected ±1 by EXACT decimal square
    // comparison (the double is only a seed — the decision predicate is
    // integer); the 1000-unit budget splits by floor shares with
    // largest-remainder apportionment (rank over the 5-row stratum
    // table — bounded, allowlisted). Scale: one partial-agg pass for
    // the moments; everything after lives on a 5-row frame.
    QueryDef(
      "q351_neyman_allocation",
      (s, dir) => {
        val o = Tables.orders(s, dir)
          .select(col("o_orderpriority").as("stratum"),
            expr("cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)")
              .as("v"))
        val m = o.groupBy(col("stratum"))
          .agg(count(lit(1)).as("n_rows"),
            sum(col("v").cast("decimal(38,0)")).as("sx"),
            sum((col("v").cast("decimal(38,0)") * col("v")).cast("decimal(38,0)"))
              .as("sxx"))
          .withColumn("s2",
            expr("""cast((cast(n_rows as decimal(38,0)) * sxx - sx * sx)
                    div (cast(n_rows as decimal(38,0)) * (n_rows - 1))
                    as bigint)"""))
          .withColumn("arg", expr(
            "cast(n_rows as decimal(38,0)) * n_rows * s2"))
          .withColumn("s0", floor(sqrt(col("arg").cast("double"))).cast("long"))
          .withColumn("w_h", expr(
            """case when cast(s0 + 1 as decimal(38,0)) * (s0 + 1) <= arg
                    then s0 + 1
                    when cast(s0 as decimal(38,0)) * s0 <= arg then s0
                    else s0 - 1 end"""))
          .cutLineage()
        val tot = m.agg(sum(col("w_h")).as("tw"), sum(col("n_rows")).as("tn"))
        val base = m.crossJoin(broadcast(tot))
          .withColumn("alloc_base", expr("(1000 * w_h) div tw"))
          .withColumn("rem", expr("(1000 * w_h) % tw"))
          .withColumn("w_share_ppm", expr("(w_h * 1000000) div tw"))
        val short = base.agg((lit(1000L) - sum(col("alloc_base"))).as("k"))
        base.crossJoin(broadcast(short))
          .withColumn("rk", row_number().over(
            Window.orderBy(col("rem").desc, col("stratum"))).cast("long"))
          .withColumn("alloc_neyman",
            col("alloc_base") + when(col("rk") <= col("k"), 1L).otherwise(0L))
          .select(col("stratum"), col("n_rows"), col("s2").as("s2_cents2"),
            col("w_h"), col("w_share_ppm"), col("alloc_base"),
            col("alloc_neyman"))
          .orderBy(col("stratum"))
      },
      Some("""
        WITH o AS (
          SELECT o_orderpriority AS stratum,
                 CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS v
          FROM orders),
        m0 AS (
          SELECT stratum, CAST(COUNT(*) AS BIGINT) AS n_rows,
                 CAST(SUM(CAST(v AS HUGEINT)) AS HUGEINT) AS sx,
                 CAST(SUM(CAST(v AS HUGEINT) * v) AS HUGEINT) AS sxx
          FROM o GROUP BY 1),
        m1 AS (
          SELECT stratum, n_rows,
                 CAST((CAST(n_rows AS HUGEINT) * sxx - sx * sx)
                      // (CAST(n_rows AS HUGEINT) * (n_rows - 1))
                      AS BIGINT) AS s2
          FROM m0),
        m2 AS (
          SELECT stratum, n_rows, s2,
                 CAST(n_rows AS HUGEINT) * n_rows * s2 AS arg,
                 CAST(floor(sqrt(CAST(CAST(n_rows AS HUGEINT) * n_rows * s2
                   AS DOUBLE))) AS BIGINT) AS s0
          FROM m1),
        m AS MATERIALIZED (
          SELECT stratum, n_rows, s2,
                 CASE WHEN CAST(s0 + 1 AS HUGEINT) * (s0 + 1) <= arg
                      THEN s0 + 1
                      WHEN CAST(s0 AS HUGEINT) * s0 <= arg THEN s0
                      ELSE s0 - 1 END AS w_h
          FROM m2),
        tot AS (SELECT CAST(SUM(w_h) AS BIGINT) AS tw FROM m),
        base AS (
          SELECT m.stratum, m.n_rows, m.s2, m.w_h,
                 (1000 * m.w_h) // t.tw AS alloc_base,
                 (1000 * m.w_h) % t.tw AS rem,
                 (m.w_h * 1000000) // t.tw AS w_share_ppm
          FROM m CROSS JOIN tot t),
        short AS (SELECT 1000 - CAST(SUM(alloc_base) AS BIGINT) AS k
                  FROM base)
        SELECT stratum, n_rows, s2 AS s2_cents2, w_h, w_share_ppm,
               alloc_base,
               alloc_base + CASE WHEN CAST(row_number() OVER
                   (ORDER BY rem DESC, stratum) AS BIGINT)
                   <= (SELECT k FROM short)
                 THEN 1 ELSE 0 END AS alloc_neyman
        FROM base
        ORDER BY stratum""")),

    // Off-policy evaluation by inverse-propensity replay (IPS + SNIPS)
    // — "what WOULD this targeting rule have earned?" answered from
    // logged randomized data without a new experiment: keep exactly the
    // rows where the logged action agrees with the target policy's
    // action, weight each by 1/propensity (the logged policy is the
    // q181 hash coin, so w = 2 exactly — the weights are rational and
    // the whole estimator stays on the integer lattice), and read off
    // V̂_IPS = Σ 2·m·r / n vs V̂_SNIPS = Σ m·r / Σ m (the
    // self-normalized variant that trades a little bias for variance —
    // with propensity exactly ½ their disagreement measures match-rate
    // imbalance). Rewards are a deterministic synthetic uplift (60% vs
    // 40% by cents residue) so the policy-value gap is real. Scale: one
    // projection + one partial agg per segment — IPS is embarrassingly
    // map-side; the replay filter is a predicate, not a join.
    QueryDef(
      "q353_ips_offpolicy",
      (s, dir) => {
        val o = Tables.orders(s, dir)
          .select(col("o_orderpriority").as("seg"),
            expr("cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)")
              .as("cents"),
            (md5BitsModK(md5Bits(concat(lit("pol:"), col("o_orderkey"))),
              2L) === 0L).as("a1"))
          .withColumn("r", when(col("a1"),
              when(expr("cents % 10") < 6, 1L).otherwise(0L))
            .otherwise(when(expr("cents % 10") < 4, 1L).otherwise(0L)))
          .withColumn("tgt",
            substring(col("seg"), 1, 1).isin("1", "2"))
          .withColumn("m",
            when(col("a1") === col("tgt"), 1L).otherwise(0L))
        o.groupBy(col("seg")).agg(
            count(lit(1)).as("n"),
            sum(col("m")).as("n_matched"),
            sum(col("m") * col("r")).as("sum_r_matched"),
            sum(col("r")).as("sum_r_logged"))
          .select(col("seg"), col("n"), col("n_matched"),
            expr("(2 * sum_r_matched * 1000000) div n").as("ips_ppm"),
            when(col("n_matched") > 0,
              expr("(sum_r_matched * 1000000) div n_matched"))
              .otherwise(0L).as("snips_ppm"),
            expr("(sum_r_logged * 1000000) div n").as("logged_value_ppm"))
          .orderBy(col("seg"))
      },
      Some("""
        WITH o AS (
          SELECT o_orderpriority AS seg,
                 CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS cents,
                 (CAST(md5_number_lower('pol:' || o_orderkey) % 2 AS BIGINT)
                   = 0) AS a1
          FROM orders),
        t AS (
          SELECT seg,
                 CASE WHEN a1 THEN
                   CASE WHEN cents % 10 < 6 THEN 1 ELSE 0 END
                 ELSE CASE WHEN cents % 10 < 4 THEN 1 ELSE 0 END END AS r,
                 CASE WHEN a1 = (substring(seg, 1, 1) IN ('1', '2'))
                      THEN 1 ELSE 0 END AS m
          FROM o)
        SELECT seg, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(m) AS BIGINT) AS n_matched,
               (2 * CAST(SUM(m * r) AS BIGINT) * 1000000) // COUNT(*)
                 AS ips_ppm,
               CAST(CASE WHEN SUM(m) > 0
                    THEN (CAST(SUM(m * r) AS BIGINT) * 1000000)
                         // CAST(SUM(m) AS BIGINT)
                    ELSE 0 END AS BIGINT) AS snips_ppm,
               (CAST(SUM(r) AS BIGINT) * 1000000) // COUNT(*)
                 AS logged_value_ppm
        FROM t
        GROUP BY seg
        ORDER BY seg""")),

    // Stratified sampling under the q351 Neyman allocation, with the
    // Horvitz-Thompson estimator audited against ground truth — the
    // EXECUTION half of the survey-sampling pair (q351 decides how many
    // per stratum; this gate actually draws them and proves the
    // estimator). Deterministic Bernoulli draw per stratum:
    // keep ⇔ md5("ssamp:"+orderkey) mod 10⁶ < rate_ppm, rate_ppm =
    // (n_h·10⁶) div N_h from the 1000-unit Neyman allocation — a FIXED
    // budget, so the sample stays ~1000 rows at any corpus size (the
    // whole point of a sampling budget at 100 TB). Gates: (1) per
    // stratum, the achieved count sits within 3σ of N_h·rate (exact
    // binomial variance on the DECIMAL(38,0) lattice); (2) the HT
    // total Σ_h S_h·10⁶ div rate_h reproduces the exact corpus total
    // within ±10% (measured ratios 991780/1062019/1028455 ppm across
    // the three shipped sf). Scale: moments + sampling are the only
    // corpus passes (both partial-aggregable / broadcast-filtered);
    // everything else lives on the 5-row stratum lattice.
    QueryDef(
      "q362_stratified_sample",
      (s, dir) => {
        val o = Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_orderpriority").as("stratum"),
            expr("cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)")
              .as("v"))
        val m = o.groupBy(col("stratum"))
          .agg(count(lit(1)).as("n_rows"),
            sum(col("v").cast("decimal(38,0)")).as("sx"),
            sum((col("v").cast("decimal(38,0)") * col("v"))
              .cast("decimal(38,0)")).as("sxx"))
          .withColumn("s2",
            expr("""cast((cast(n_rows as decimal(38,0)) * sxx - sx * sx)
                    div (cast(n_rows as decimal(38,0)) * (n_rows - 1))
                    as bigint)"""))
          .withColumn("arg", expr(
            "cast(n_rows as decimal(38,0)) * n_rows * s2"))
          .withColumn("s0", floor(sqrt(col("arg").cast("double"))).cast("long"))
          .withColumn("w_h", expr(
            """case when cast(s0 + 1 as decimal(38,0)) * (s0 + 1) <= arg
                    then s0 + 1
                    when cast(s0 as decimal(38,0)) * s0 <= arg then s0
                    else s0 - 1 end"""))
          .cutLineage()
        val tot = m.agg(sum(col("w_h")).as("tw"))
        val base = m.crossJoin(broadcast(tot))
          .withColumn("alloc_base", expr("(1000 * w_h) div tw"))
          .withColumn("rem", expr("(1000 * w_h) % tw"))
        val short = base.agg((lit(1000L) - sum(col("alloc_base"))).as("k"))
        val rates = base.crossJoin(broadcast(short))
          .withColumn("rk", row_number().over(
            Window.orderBy(col("rem").desc, col("stratum"))).cast("long"))
          .withColumn("n_h",
            col("alloc_base") + when(col("rk") <= col("k"), 1L).otherwise(0L))
          .withColumn("rate_ppm", expr("(n_h * 1000000) div n_rows"))
          .select(col("stratum"), col("n_rows"), col("rate_ppm"))
          .cutLineage()
        val samp = o.join(broadcast(rates), Seq("stratum"))
          .where(md5BitsModK(md5Bits(concat(lit("ssamp:"), col("o_orderkey"))),
            1000000L) < col("rate_ppm"))
        val per = rates.join(
            samp.groupBy(col("stratum")).agg(
              count(lit(1)).as("n_samp"),
              sum(col("v").cast("decimal(38,0)")).as("sv")),
            Seq("stratum"), "left")
          .withColumn("n_sampled", coalesce(col("n_samp"), lit(0L)))
          .withColumn("ht_total_cents", expr(
            """cast((coalesce(sv, cast(0 as decimal(38,0))) * 1000000)
               div rate_ppm as bigint)"""))
          .withColumn("dev_ok", expr(
            """(cast(n_sampled as decimal(38,0)) * 1000000
                - cast(n_rows as decimal(38,0)) * rate_ppm)
               * (cast(n_sampled as decimal(38,0)) * 1000000
                  - cast(n_rows as decimal(38,0)) * rate_ppm)
               <= cast(9 as decimal(38,0)) * n_rows * rate_ppm
                  * (1000000 - rate_ppm)"""))
          .cutLineage()
        val ex = o.agg(sum(col("v").cast("decimal(38,0)")).cast("long")
          .as("exact_total"))
        val ht = per.agg(sum(col("ht_total_cents").cast("decimal(38,0)"))
          .cast("long").as("ht_total"))
        per.crossJoin(broadcast(ex)).crossJoin(broadcast(ht))
          .withColumn("ratio_ppm", expr(
            """cast((cast(ht_total as decimal(38,0)) * 1000000)
               div exact_total as bigint)"""))
          .select(col("stratum"), col("n_rows"), col("rate_ppm"),
            col("n_sampled"), col("dev_ok"), col("ht_total_cents"),
            col("exact_total"), col("ratio_ppm"),
            col("ratio_ppm").between(900000L, 1100000L).as("within_bound"))
          .orderBy(col("stratum"))
      },
      Some("""
        WITH o AS (
          SELECT o_orderkey, o_orderpriority AS stratum,
                 CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS v
          FROM orders),
        m0 AS (
          SELECT stratum, CAST(COUNT(*) AS BIGINT) AS n_rows,
                 CAST(SUM(CAST(v AS HUGEINT)) AS HUGEINT) AS sx,
                 CAST(SUM(CAST(v AS HUGEINT) * v) AS HUGEINT) AS sxx
          FROM o GROUP BY 1),
        m1 AS (
          SELECT stratum, n_rows,
                 CAST((CAST(n_rows AS HUGEINT) * sxx - sx * sx)
                      // (CAST(n_rows AS HUGEINT) * (n_rows - 1))
                      AS BIGINT) AS s2
          FROM m0),
        m2 AS (
          SELECT stratum, n_rows,
                 CAST(n_rows AS HUGEINT) * n_rows * s2 AS arg,
                 CAST(floor(sqrt(CAST(CAST(n_rows AS HUGEINT) * n_rows * s2
                   AS DOUBLE))) AS BIGINT) AS s0
          FROM m1),
        m AS MATERIALIZED (
          SELECT stratum, n_rows,
                 CASE WHEN CAST(s0 + 1 AS HUGEINT) * (s0 + 1) <= arg
                      THEN s0 + 1
                      WHEN CAST(s0 AS HUGEINT) * s0 <= arg THEN s0
                      ELSE s0 - 1 END AS w_h
          FROM m2),
        tot AS (SELECT CAST(SUM(w_h) AS BIGINT) AS tw FROM m),
        base AS (
          SELECT m.stratum, m.n_rows,
                 (1000 * m.w_h) // t.tw AS alloc_base,
                 (1000 * m.w_h) % t.tw AS rem
          FROM m CROSS JOIN tot t),
        short AS (
          SELECT 1000 - CAST(SUM(alloc_base) AS BIGINT) AS k FROM base),
        rates AS MATERIALIZED (
          SELECT stratum, n_rows,
                 ((alloc_base + CASE WHEN rk <= k THEN 1 ELSE 0 END)
                  * 1000000) // n_rows AS rate_ppm
          FROM (SELECT b.*, CAST(row_number() OVER
                  (ORDER BY rem DESC, stratum) AS BIGINT) AS rk
                FROM base b) b2 CROSS JOIN short),
        samp AS MATERIALIZED (
          SELECT o.stratum, o.v
          FROM o JOIN rates r USING (stratum)
          WHERE CAST(md5_number_lower('ssamp:' || o.o_orderkey) % 1000000
                AS BIGINT) < r.rate_ppm),
        per AS MATERIALIZED (
          SELECT r.stratum, r.n_rows, r.rate_ppm,
                 CAST(COUNT(s.v) AS BIGINT) AS n_sampled,
                 CAST(COALESCE(SUM(CAST(s.v AS HUGEINT)), 0) * 1000000
                      // r.rate_ppm AS BIGINT) AS ht_total_cents
          FROM rates r LEFT JOIN samp s ON s.stratum = r.stratum
          GROUP BY 1, 2, 3),
        ex AS (SELECT CAST(SUM(CAST(v AS HUGEINT)) AS BIGINT)
                 AS exact_total FROM o),
        ht AS (SELECT CAST(SUM(CAST(ht_total_cents AS HUGEINT)) AS BIGINT)
                 AS ht_total FROM per)
        SELECT p.stratum, p.n_rows, p.rate_ppm, p.n_sampled,
               (CAST(p.n_sampled AS HUGEINT) * 1000000
                - CAST(p.n_rows AS HUGEINT) * p.rate_ppm)
               * (CAST(p.n_sampled AS HUGEINT) * 1000000
                  - CAST(p.n_rows AS HUGEINT) * p.rate_ppm)
               <= 9 * CAST(p.n_rows AS HUGEINT) * p.rate_ppm
                  * (1000000 - p.rate_ppm) AS dev_ok,
               p.ht_total_cents, ex.exact_total,
               CAST(CAST(ht.ht_total AS HUGEINT) * 1000000
                    // ex.exact_total AS BIGINT) AS ratio_ppm,
               CAST(CAST(ht.ht_total AS HUGEINT) * 1000000
                    // ex.exact_total AS BIGINT)
                 BETWEEN 900000 AND 1100000 AS within_bound
        FROM per p CROSS JOIN ex CROSS JOIN ht
        ORDER BY p.stratum""")),

    // Power analysis / minimum-detectable-effect calculator — the
    // question every experiment DESIGN starts with ("how small a lift
    // can this segment even see?") and the one the q179-family verdicts
    // implicitly assume was asked. Per stratum: the exact cents²
    // variance lattice (q351's), then the two-sided α=.05 / power=.80
    // two-sample MDE — mde² = (z_{.975}+z_{.80})²·4σ²/n with
    // (1.959964+0.841621)² pinned as the rational 7848880 ppm, so
    // mde_cents = isqrt((31395520·s²) div (n·10⁶)) via the q351
    // double-seeded integer sqrt (decimal-compare corrected — no float
    // sqrt result crosses the gate). Also emitted: the per-arm sample
    // size needed to detect a 1% lift of the stratum mean — the
    // capacity-planning number. Scale: one moment rollup ends the
    // corpus's involvement; the calculator is a 5-row lattice.
    QueryDef(
      "q368_power_mde",
      (s, dir) => {
        val o = Tables.orders(s, dir)
          .select(col("o_orderpriority").as("stratum"),
            expr("cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)")
              .as("v"))
        val m = o.groupBy(col("stratum"))
          .agg(count(lit(1)).as("n_rows"),
            sum(col("v").cast("decimal(38,0)")).as("sx"),
            sum((col("v").cast("decimal(38,0)") * col("v"))
              .cast("decimal(38,0)")).as("sxx"))
          .withColumn("s2",
            expr("""cast((cast(n_rows as decimal(38,0)) * sxx - sx * sx)
                    div (cast(n_rows as decimal(38,0)) * (n_rows - 1))
                    as bigint)"""))
          .withColumn("mean_cents", expr("cast(sx div n_rows as bigint)"))
        val mde = m
          .withColumn("arg", expr(
            "(cast(31395520 as decimal(38,0)) * s2) div (n_rows * 1000000)"))
          .withColumn("s0", floor(sqrt(col("arg").cast("double"))).cast("long"))
          .withColumn("mde_cents", expr(
            """case when cast(s0 + 1 as decimal(38,0)) * (s0 + 1) <= arg
                    then s0 + 1
                    when cast(s0 as decimal(38,0)) * s0 <= arg then s0
                    else s0 - 1 end"""))
          .withColumn("mde_rel_ppm", expr(
            "(mde_cents * 1000000) div mean_cents"))
          .withColumn("n_per_arm_for_1pct", expr(
            """cast((cast(7848880 as decimal(38,0)) * 2 * s2)
               div (cast(mean_cents as decimal(38,0)) * mean_cents * 100)
               as bigint) + 1"""))
          .select(col("stratum"), col("n_rows"), col("s2").as("s2_cents2"),
            col("mean_cents"), col("mde_cents"), col("mde_rel_ppm"),
            col("n_per_arm_for_1pct"))
          .orderBy(col("stratum"))
        mde
      },
      Some("""
        WITH o AS (
          SELECT o_orderpriority AS stratum,
                 CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS v
          FROM orders),
        m0 AS (
          SELECT stratum, CAST(COUNT(*) AS BIGINT) AS n_rows,
                 CAST(SUM(CAST(v AS HUGEINT)) AS HUGEINT) AS sx,
                 CAST(SUM(CAST(v AS HUGEINT) * v) AS HUGEINT) AS sxx
          FROM o GROUP BY 1),
        m1 AS (
          SELECT stratum, n_rows,
                 CAST((CAST(n_rows AS HUGEINT) * sxx - sx * sx)
                      // (CAST(n_rows AS HUGEINT) * (n_rows - 1))
                      AS BIGINT) AS s2,
                 CAST(sx // n_rows AS BIGINT) AS mean_cents
          FROM m0),
        m2 AS (
          SELECT stratum, n_rows, s2, mean_cents,
                 (CAST(31395520 AS HUGEINT) * s2) // (n_rows * 1000000)
                   AS arg,
                 CAST(floor(sqrt(CAST((CAST(31395520 AS HUGEINT) * s2)
                   // (n_rows * 1000000) AS DOUBLE))) AS BIGINT) AS s0
          FROM m1),
        m3 AS (
          SELECT stratum, n_rows, s2, mean_cents,
                 CASE WHEN CAST(s0 + 1 AS HUGEINT) * (s0 + 1) <= arg
                      THEN s0 + 1
                      WHEN CAST(s0 AS HUGEINT) * s0 <= arg THEN s0
                      ELSE s0 - 1 END AS mde_cents
          FROM m2)
        SELECT stratum, n_rows, s2 AS s2_cents2, mean_cents, mde_cents,
               (mde_cents * 1000000) // mean_cents AS mde_rel_ppm,
               CAST((CAST(7848880 AS HUGEINT) * 2 * s2)
                    // (CAST(mean_cents AS HUGEINT) * mean_cents * 100)
                    AS BIGINT) + 1 AS n_per_arm_for_1pct
        FROM m3
        ORDER BY stratum""")),

    // Sample-ratio-mismatch (SRM) guard — the first alarm every
    // experimentation platform fires BEFORE reading any metric: if the
    // 50/50 hash split didn't deliver 50/50, the assignment pipeline is
    // broken and all downstream inference is garbage (Kohavi's classic
    // failure taxonomy). Two assignment rules run side by side: the
    // honest md5 coin (expect pass) and a deliberately skewed 45/55
    // rule (expect SRM DETECTED — the gate proves the alarm fires, not
    // just that it stays quiet). χ² for a 2-cell equal-split is
    // (n₁−n₀)²/n, exact in ppm on int64. Scale: one map-side-combinable
    // rollup per rule over the assignment scan; two output rows.
    QueryDef(
      "q369_srm_check",
      (s, dir) => {
        val o = Tables.orders(s, dir).select(col("o_orderkey"))
          .withColumn("h", md5BitsModK(md5Bits(concat(lit("srm:"),
            col("o_orderkey"))), 100L))
        val rules = o.select(lit("fair_50_50").as("rule"),
            when(col("h") < 50L, 1L).otherwise(0L).as("a"))
          .unionByName(o.select(lit("skewed_45_55").as("rule"),
            when(col("h") < 45L, 1L).otherwise(0L).as("a")))
        rules.groupBy(col("rule"))
          .agg(sum(col("a")).as("n1"),
            sum(lit(1L) - col("a")).as("n0"))
          .withColumn("chi2_ppm", expr(
            "((n1 - n0) * (n1 - n0) * 1000000) div (n1 + n0)"))
          .select(col("rule"), col("n1"), col("n0"), col("chi2_ppm"),
            (col("chi2_ppm") > 3841459L).as("srm_detected"))
          .orderBy(col("rule"))
      },
      Some("""
        WITH o AS (
          SELECT CAST(md5_number_lower('srm:' || o_orderkey) % 100
                 AS BIGINT) AS h
          FROM orders),
        rules AS (
          SELECT 'fair_50_50' AS rule,
                 CASE WHEN h < 50 THEN 1 ELSE 0 END AS a FROM o
          UNION ALL
          SELECT 'skewed_45_55' AS rule,
                 CASE WHEN h < 45 THEN 1 ELSE 0 END AS a FROM o),
        agg AS (
          SELECT rule, CAST(SUM(a) AS BIGINT) AS n1,
                 CAST(SUM(1 - a) AS BIGINT) AS n0
          FROM rules GROUP BY 1)
        SELECT rule, n1, n0,
               ((n1 - n0) * (n1 - n0) * 1000000) // (n1 + n0) AS chi2_ppm,
               ((n1 - n0) * (n1 - n0) * 1000000) // (n1 + n0) > 3841459
                 AS srm_detected
        FROM agg
        ORDER BY rule""")),

    // Benjamini-Yekutieli FDR — q257's BH step-up under ARBITRARY
    // dependence: when the 20 cell tests share users/seasonality (they
    // do — cells are customer slices of one corpus), BH's independence
    // assumption is void and BY divides every threshold by the harmonic
    // sum c(m)=Σ1/i (c(20)=3.5977…), the price of dependence-proofness.
    // Same 2-proportion χ² lattice as q257; the BY ladder is the exact
    // χ²₁ inverse at p = α·i/(m·c(m)), pinned as shared literals on both
    // engines (the q257 discipline — no quantile function evaluates at
    // query time). Gate emits BOTH verdicts per cell plus the
    // containment audit (BY ⊆ BH — step-up monotonicity) so a ladder
    // regression on either side turns the gate red. Scale: one cell
    // rollup; the ladder is a 20-row CASE.
    QueryDef(
      "q378_by_fdr",
      (s, dir) => {
        val critBh = Seq(
          9.140593461244016, 7.879438576622458, 7.1491386083838355,
          6.634896601021211, 6.23853263690954, 5.91646788464017,
          5.645522561950897, 5.411894431054339, 5.206700155589299,
          5.0238861873148934, 4.85914255610666, 4.709292246885099,
          4.571926354981466, 4.445175139346929, 4.327558440040948,
          4.217884587921396, 4.115180092638893, 4.018639511074708,
          3.927588924489973, 3.8414588206941236)
        val critBy = Seq(
          11.502889763256723, 10.219332387177902, 9.473473991920127,
          8.946824784334273, 8.5399227884125, 8.208576599544221,
          7.929261277116032, 7.687958995201674, 7.475641842088394,
          7.2861541236353125, 7.115110755620628, 6.9592777088098305,
          6.816201674742337, 6.683977584401699, 6.56109666117191,
          6.446343697159773, 6.33872558169262, 6.237420327082558,
          6.141739920697333, 6.051102735047298)
        def ladder(cs: Seq[Double]) = cs.zipWithIndex
          .map { case (v, i) => s"WHEN ${i + 1} THEN ${v}d" }
          .mkString("CASE rnk ", " ", " END")
        val o = Tables.orders(s, dir).select(
          (col("o_custkey") % 20).as("cell"),
          md5BitsModK(md5Bits(concat(lit("bh:"), col("o_orderkey"))), 2L)
            .as("arm"),
          when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L).as("y"))
        val cells = o.groupBy(col("cell")).agg(
          sum(when(col("arm") === 0L, 1L).otherwise(0L)).as("na"),
          sum(when(col("arm") === 1L, 1L).otherwise(0L)).as("nb"),
          sum(when(col("arm") === 0L, col("y")).otherwise(0L)).as("ya"),
          sum(when(col("arm") === 1L, col("y")).otherwise(0L)).as("yb"))
        val z2 = cells.select(col("cell"),
          expr("""
            (CAST(na + nb AS DOUBLE)
              * (CAST(na AS DOUBLE)*CAST(yb AS DOUBLE) - CAST(nb AS DOUBLE)*CAST(ya AS DOUBLE))
              * (CAST(na AS DOUBLE)*CAST(yb AS DOUBLE) - CAST(nb AS DOUBLE)*CAST(ya AS DOUBLE)))
            / (CAST(na AS DOUBLE)*CAST(nb AS DOUBLE)
               *CAST(ya + yb AS DOUBLE)*CAST(na + nb - ya - yb AS DOUBLE))
          """).as("z2"))
        val ranked = z2.withColumn("rnk",
            row_number().over(Window.orderBy(col("z2").desc, col("cell")))
              .cast("long"))
          .withColumn("crit_bh", expr(ladder(critBh)))
          .withColumn("crit_by", expr(ladder(critBy)))
        val cuts = ranked.groupBy().agg(
          max(when(col("z2") >= col("crit_bh"), col("rnk")).otherwise(0L))
            .as("cut_bh"),
          max(when(col("z2") >= col("crit_by"), col("rnk")).otherwise(0L))
            .as("cut_by"))
        ranked.crossJoin(broadcast(cuts))
          .select(col("cell"), col("rnk"), col("z2"), col("crit_by"),
            (col("rnk") <= col("cut_bh")).as("significant_bh"),
            (col("rnk") <= col("cut_by")).as("significant_by"),
            (col("cut_by") <= col("cut_bh")).as("by_within_bh"))
          .orderBy(col("rnk"))
      },
      Some("""
        WITH o AS (
          SELECT o_custkey % 20 AS cell,
                 CAST(md5_number_lower('bh:' || o_orderkey) % 2 AS BIGINT) AS arm,
                 CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                      THEN 1 ELSE 0 END AS y
          FROM orders),
        cells AS (
          SELECT cell,
                 CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
                 CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb,
                 CAST(SUM(CASE WHEN arm = 0 THEN y ELSE 0 END) AS BIGINT) AS ya,
                 CAST(SUM(CASE WHEN arm = 1 THEN y ELSE 0 END) AS BIGINT) AS yb
          FROM o GROUP BY cell),
        z AS (
          SELECT cell,
                 (CAST(na + nb AS DOUBLE)
                   * (CAST(na AS DOUBLE)*CAST(yb AS DOUBLE) - CAST(nb AS DOUBLE)*CAST(ya AS DOUBLE))
                   * (CAST(na AS DOUBLE)*CAST(yb AS DOUBLE) - CAST(nb AS DOUBLE)*CAST(ya AS DOUBLE)))
                 / (CAST(na AS DOUBLE)*CAST(nb AS DOUBLE)
                    *CAST(ya + yb AS DOUBLE)*CAST(na + nb - ya - yb AS DOUBLE)) AS z2
          FROM cells),
        ranked AS (
          SELECT cell, z2,
                 row_number() OVER (ORDER BY z2 DESC, cell) AS rnk
          FROM z),
        laddered AS (
          SELECT cell, z2, rnk,
                 CASE rnk
                   WHEN 1 THEN CAST('9.140593461244016' AS DOUBLE)
                   WHEN 2 THEN CAST('7.879438576622458' AS DOUBLE)
                   WHEN 3 THEN CAST('7.1491386083838355' AS DOUBLE)
                   WHEN 4 THEN CAST('6.634896601021211' AS DOUBLE)
                   WHEN 5 THEN CAST('6.23853263690954' AS DOUBLE)
                   WHEN 6 THEN CAST('5.91646788464017' AS DOUBLE)
                   WHEN 7 THEN CAST('5.645522561950897' AS DOUBLE)
                   WHEN 8 THEN CAST('5.411894431054339' AS DOUBLE)
                   WHEN 9 THEN CAST('5.206700155589299' AS DOUBLE)
                   WHEN 10 THEN CAST('5.0238861873148934' AS DOUBLE)
                   WHEN 11 THEN CAST('4.85914255610666' AS DOUBLE)
                   WHEN 12 THEN CAST('4.709292246885099' AS DOUBLE)
                   WHEN 13 THEN CAST('4.571926354981466' AS DOUBLE)
                   WHEN 14 THEN CAST('4.445175139346929' AS DOUBLE)
                   WHEN 15 THEN CAST('4.327558440040948' AS DOUBLE)
                   WHEN 16 THEN CAST('4.217884587921396' AS DOUBLE)
                   WHEN 17 THEN CAST('4.115180092638893' AS DOUBLE)
                   WHEN 18 THEN CAST('4.018639511074708' AS DOUBLE)
                   WHEN 19 THEN CAST('3.927588924489973' AS DOUBLE)
                   WHEN 20 THEN CAST('3.8414588206941236' AS DOUBLE)
                 END AS crit_bh,
                 CASE rnk
                   WHEN 1 THEN CAST('11.502889763256723' AS DOUBLE)
                   WHEN 2 THEN CAST('10.219332387177902' AS DOUBLE)
                   WHEN 3 THEN CAST('9.473473991920127' AS DOUBLE)
                   WHEN 4 THEN CAST('8.946824784334273' AS DOUBLE)
                   WHEN 5 THEN CAST('8.5399227884125' AS DOUBLE)
                   WHEN 6 THEN CAST('8.208576599544221' AS DOUBLE)
                   WHEN 7 THEN CAST('7.929261277116032' AS DOUBLE)
                   WHEN 8 THEN CAST('7.687958995201674' AS DOUBLE)
                   WHEN 9 THEN CAST('7.475641842088394' AS DOUBLE)
                   WHEN 10 THEN CAST('7.2861541236353125' AS DOUBLE)
                   WHEN 11 THEN CAST('7.115110755620628' AS DOUBLE)
                   WHEN 12 THEN CAST('6.9592777088098305' AS DOUBLE)
                   WHEN 13 THEN CAST('6.816201674742337' AS DOUBLE)
                   WHEN 14 THEN CAST('6.683977584401699' AS DOUBLE)
                   WHEN 15 THEN CAST('6.56109666117191' AS DOUBLE)
                   WHEN 16 THEN CAST('6.446343697159773' AS DOUBLE)
                   WHEN 17 THEN CAST('6.33872558169262' AS DOUBLE)
                   WHEN 18 THEN CAST('6.237420327082558' AS DOUBLE)
                   WHEN 19 THEN CAST('6.141739920697333' AS DOUBLE)
                   WHEN 20 THEN CAST('6.051102735047298' AS DOUBLE)
                 END AS crit_by
          FROM ranked),
        cuts AS (
          SELECT MAX(CASE WHEN z2 >= crit_bh THEN rnk ELSE 0 END) AS cb,
                 MAX(CASE WHEN z2 >= crit_by THEN rnk ELSE 0 END) AS cy
          FROM laddered)
        SELECT l.cell, CAST(l.rnk AS BIGINT) AS rnk, l.z2, l.crit_by,
               l.rnk <= cuts.cb AS significant_bh,
               l.rnk <= cuts.cy AS significant_by,
               cuts.cy <= cuts.cb AS by_within_bh
        FROM laddered l CROSS JOIN cuts
        ORDER BY l.rnk"""))
  )

  /** Frames produced by the shared split-conformal calibration stage:
    * `test` = held-out half (ck, x, y), `beta`/`qs`/`nCalib` = 1-row
    * broadcast-sized frames.
    */
  private final case class ConformalStage(
      test: DataFrame, beta: DataFrame, qs: DataFrame, nCalib: DataFrame)

  /** Shared split-conformal calibration for q292/q293 — single-sourced so
    * the marginal and per-segment gates cannot drift: through-origin
    * β = Σxy/Σx² over a 50/50 md5-hash split of per-customer
    * (x = pre-1998 spend, y = 1998 spend, whole dollars), residual band
    * [P5, P95] via exact GlobalRank. The cross-moments ride DECIMAL(38,0)
    * (the q182 wide path): DuckDB's SUM(BIGINT) promotes to HUGEINT, so a
    * plain BIGINT sum on the Spark side would diverge past ~sf1 when
    * Σx² crosses 2⁶³. Per-row products still fit BIGINT (per-customer
    * spend is bounded, x² ≲ 10¹⁴) — only the corpus-proportional SUM
    * needs the wide lane. The 2²⁰ pinned shift lands both moments back
    * in BIGINT range (exact for raw sums to ~9.7e24 ≈ 10⁶× the 100 TB
    * point) and the ×10⁶ ppm blow-up happens in DECIMAL so the numerator
    * cannot wrap before the final integral divide; everything is positive
    * so truncating `div` = floor on both engines.
    */
  private def conformalCalib(s: SparkSession, dir: String): ConformalStage = {
    import graft.operators.GlobalRank
    import graft.functions.Kernels
    val o = Tables.orders(s, dir)
      .select(col("o_custkey").as("ck"),
        col("o_orderdate").cast("date").as("d"),
        (col("o_totalprice").cast(DecimalType(18, 2)) * 100).cast("long").as("cents"))
    val cut = lit("1998-01-01").cast("date")
    val x0 = o.where(col("d") < cut).groupBy(col("ck"))
      .agg(expr("CAST(sum(cents) div 100 AS BIGINT)").as("x"))
    val y0 = o.where(col("d") >= cut).groupBy(col("ck"))
      .agg(expr("CAST(sum(cents) div 100 AS BIGINT)").as("y"))
    val pts = x0.join(y0, Seq("ck"), "left")
      .select(col("ck"), col("x"), coalesce(col("y"), lit(0L)).as("y"))
      .withColumn("bucket",
        Kernels.md5BitsModK(Kernels.md5Bits(concat(lit("conf:"), col("ck"))), 100L))
      .cutLineage()
    val calib = pts.where(col("bucket") < 50)
    val test = pts.where(col("bucket") >= 50)
    val beta = calib.agg(
        sum((col("x") * col("x")).cast(DecimalType(38, 0))).as("sxx_d"),
        sum((col("x") * col("y")).cast(DecimalType(38, 0))).as("sxy_d"))
      .select(expr(
        "(CAST(sxy_d div 1048576 AS DECIMAL(38,0)) * 1000000) div (sxx_d div 1048576)")
        .as("beta_ppm"))
    val resid = calib.crossJoin(broadcast(beta))
      .select(col("ck"),
        (col("y") - expr("(x * beta_ppm) div 1000000")).as("r"))
    val ranked = GlobalRank.withGlobalRank(
      resid, "rn", expr("r div 1024"), col("r"), col("ck"))
    val nC = calib.agg(count(lit(1)).as("n_calib"))
    val targets = nC.select(explode(array(
        struct(lit("lo").as("b"), expr("CAST(ceil(n_calib * 0.05) AS BIGINT)").as("tr")),
        struct(lit("hi").as("b"), expr("CAST(ceil(n_calib * 0.95) AS BIGINT)").as("tr"))))
        .as("t"))
      .select(col("t.b").as("b"), col("t.tr").as("tr"))
    val qs = ranked.join(broadcast(targets), col("rn") === col("tr"))
      .groupBy()
      .agg(min(when(col("b") === "lo", col("r"))).as("r_lo"),
        min(when(col("b") === "hi", col("r"))).as("r_hi"))
    ConformalStage(test, beta, qs, nC)
  }

  /** The oracle-side twin of [[conformalCalib]] — one CTE block shared by
    * q292 and q293 so the SQL lattice is as single-sourced as the Spark
    * one. DuckDB's SUM(BIGINT) is HUGEINT, so the beta CTE is exact as
    * written; the Spark side matches it via the DECIMAL(38,0) lane above.
    */
  private def ConformalCalibSql: String = """o AS (
          SELECT o_custkey AS ck, CAST(o_orderdate AS DATE) AS d,
                 CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT) AS cents
          FROM orders),
        x0 AS (SELECT ck, CAST(SUM(cents) // 100 AS BIGINT) AS x
               FROM o WHERE d < DATE '1998-01-01' GROUP BY 1),
        y0 AS (SELECT ck, CAST(SUM(cents) // 100 AS BIGINT) AS y
               FROM o WHERE d >= DATE '1998-01-01' GROUP BY 1),
        pts AS (
          SELECT x0.ck, x0.x, COALESCE(y0.y, 0) AS y,
                 CAST(md5_number_lower('conf:' || x0.ck) % 100 AS BIGINT)
                   AS bucket
          FROM x0 LEFT JOIN y0 ON x0.ck = y0.ck),
        calib AS (SELECT * FROM pts WHERE bucket < 50),
        test AS (SELECT * FROM pts WHERE bucket >= 50),
        beta AS (
          SELECT CAST(((SUM(x * y) // 1048576) * 1000000)
                      // (SUM(x * x) // 1048576) AS BIGINT) AS beta_ppm
          FROM calib),
        resid AS (
          SELECT c.ck, c.y - (c.x * b.beta_ppm) // 1000000 AS r
          FROM calib c CROSS JOIN beta b),
        ranked AS (
          SELECT ck, r, row_number() OVER (ORDER BY r, ck) AS rn
          FROM resid),
        nc AS (SELECT COUNT(*) AS n_calib FROM calib),
        qs AS (
          SELECT CAST(MIN(CASE WHEN t.b = 'lo' THEN rk.r END) AS BIGINT) AS r_lo,
                 CAST(MIN(CASE WHEN t.b = 'hi' THEN rk.r END) AS BIGINT) AS r_hi
          FROM ranked rk
          JOIN (SELECT 'lo' AS b, CAST(ceil(n_calib * 0.05) AS BIGINT) AS tr
                FROM nc
                UNION ALL
                SELECT 'hi', CAST(ceil(n_calib * 0.95) AS BIGINT) FROM nc) t
            ON rk.rn = t.tr)"""
}
