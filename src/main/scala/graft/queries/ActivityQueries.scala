package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.plans.CheckpointPolicy.DataFrameCutOps

/** Batch session-window and activity-bitmask operators: Spark's native
  * `session_window` (SessionWindowing/MergingSessionsExec — the gap-merge
  * operator, not a hand-rolled islands rewrite) gated against the
  * textbook gaps-and-islands SQL, and weekday presence as a 7-bit mask
  * via bit_or/bit_count — the compact activity encoding rollup pipelines
  * use instead of count-distinct-by-day.
  */
object ActivityQueries {

  val defs: Seq[QueryDef] = Seq(

    // 30-minute-gap sessionization with Spark's session_window operator.
    // Contract pinned by the gate: a session ENDs at last-event ts + gap,
    // and events exactly 30:00 apart merge (strict > starts a new one).
    // Timestamps leave as integer epoch micros on both sides. 100 TB:
    // session_window aggregates partition by user — one exchange, the
    // merge runs inside the aggregate exec; the oracle's two-window
    // islands form would need the same single exchange.
    QueryDef(
      "q199_session_window",
      (s, dir) => {
        val e = Tables.events(s, dir)
        e.groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
          .agg(count(lit(1)).as("n_events"))
          .select(col("user_id"),
            unix_micros(col("session_window.start")).as("session_start_us"),
            unix_micros(col("session_window.end")).as("session_end_us"),
            col("n_events"))
          .orderBy(col("user_id"), col("session_start_us"))
      },
      Some("""
        WITH e AS (
          SELECT user_id, epoch_us(ts) AS tus FROM events),
        flagged AS (
          SELECT user_id, tus,
                 CASE WHEN tus - LAG(tus) OVER (PARTITION BY user_id ORDER BY tus) > 1800000000
                      OR LAG(tus) OVER (PARTITION BY user_id ORDER BY tus) IS NULL
                      THEN 1 ELSE 0 END AS new_sess
          FROM e),
        sess AS (
          SELECT user_id, tus,
                 SUM(new_sess) OVER (PARTITION BY user_id ORDER BY tus
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
          FROM flagged)
        SELECT user_id, CAST(MIN(tus) AS BIGINT) AS session_start_us,
               CAST(MAX(tus) + 1800000000 AS BIGINT) AS session_end_us,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM sess GROUP BY user_id, sid
        ORDER BY user_id, session_start_us""")),

    // Weekday-presence bitmask: per user, OR together 1 << weekday over
    // all their events (Spark dayofweek is 1-7 Sunday-first, DuckDB
    // dayofweek is 0-6 Sunday-first — the Spark side shifts by day-1),
    // then the active-days distribution via bit_count. Everything is
    // map-side combinable integer bit algebra — the 7-bit mask replaces a
    // count-distinct-by-day at 1/7th the state.
    QueryDef(
      "q200_weekday_bitmask",
      (s, dir) => {
        val e = Tables.events(s, dir)
        val m = e.groupBy(col("user_id"))
          .agg(expr("CAST(bit_or(shiftleft(1, dayofweek(ts) - 1)) AS BIGINT)").as("mask"))
        m.groupBy(expr("CAST(bit_count(mask) AS BIGINT)").as("n_active_days"))
          .agg(count(lit(1)).as("n_users"), sum(col("mask")).as("mask_checksum"))
          .orderBy(col("n_active_days"))
      },
      Some("""
        WITH m AS (
          SELECT user_id, CAST(bit_or(1 << CAST(dayofweek(ts) AS INTEGER)) AS BIGINT) AS mask
          FROM events GROUP BY 1)
        SELECT CAST(bit_count(mask) AS BIGINT) AS n_active_days,
               CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(SUM(mask) AS BIGINT) AS mask_checksum
        FROM m GROUP BY 1 ORDER BY 1""")),

    // Growth accounting: the monthly customer-flow decomposition
    // (new / retained / resurrected, plus churned attributed to the month
    // AFTER last activity) every subscription and marketplace dashboard
    // opens with. One distinct to (customer, month), one customer-
    // partitioned lag/lead window, then counts on the month frame bounded
    // by the calendar span. The identity actives(m) = new + retained +
    // resurrected holds row-for-row by construction.
    QueryDef(
      "q201_growth_accounting",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val am = o.select(col("o_custkey").as("ck"),
            (year(col("o_orderdate")) * 12 + month(col("o_orderdate"))).cast("long").as("ym"))
          .distinct()
        val w = Window.partitionBy(col("ck")).orderBy(col("ym"))
        val lagged = am
          .withColumn("prev_ym", lag(col("ym"), 1).over(w))
          .withColumn("next_ym", lead(col("ym"), 1).over(w))
        val classified = lagged.select(col("ym"),
          when(col("prev_ym").isNull, lit("new"))
            .when(col("prev_ym") === col("ym") - 1, lit("retained"))
            .otherwise(lit("resurrected")).as("cls"))
        val churn = lagged
          .where(col("next_ym").isNull || col("next_ym") > col("ym") + 1)
          .select((col("ym") + 1).as("ym"), lit("churned").as("cls"))
        classified.unionByName(churn)
          .groupBy(col("ym"))
          .agg(
            sum(when(col("cls") === "new", 1L).otherwise(0L)).as("n_new"),
            sum(when(col("cls") === "retained", 1L).otherwise(0L)).as("n_retained"),
            sum(when(col("cls") === "resurrected", 1L).otherwise(0L)).as("n_resurrected"),
            sum(when(col("cls") === "churned", 1L).otherwise(0L)).as("n_churned"))
          .orderBy(col("ym"))
      },
      Some("""
        WITH am AS (
          SELECT DISTINCT o_custkey AS ck,
                 CAST(YEAR(CAST(o_orderdate AS DATE))*12 + MONTH(CAST(o_orderdate AS DATE)) AS BIGINT) AS ym
          FROM orders),
        lagged AS (
          SELECT ck, ym,
                 LAG(ym) OVER (PARTITION BY ck ORDER BY ym) AS prev_ym,
                 LEAD(ym) OVER (PARTITION BY ck ORDER BY ym) AS next_ym
          FROM am),
        classified AS (
          SELECT ym,
                 CASE WHEN prev_ym IS NULL THEN 'new'
                      WHEN prev_ym = ym - 1 THEN 'retained'
                      ELSE 'resurrected' END AS cls
          FROM lagged),
        churn AS (
          SELECT ym + 1 AS ym, 'churned' AS cls
          FROM lagged WHERE next_ym IS NULL OR next_ym > ym + 1),
        u AS (SELECT ym, cls FROM classified UNION ALL SELECT ym, cls FROM churn)
        SELECT ym,
               CAST(SUM(CASE WHEN cls='new' THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
               CAST(SUM(CASE WHEN cls='retained' THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
               CAST(SUM(CASE WHEN cls='resurrected' THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected,
               CAST(SUM(CASE WHEN cls='churned' THEN 1 ELSE 0 END) AS BIGINT) AS n_churned
        FROM u GROUP BY ym ORDER BY ym""")),

    // Kaplan-Meier survival curve — the CENSORING-aware estimator the
    // discrete hazard (q197) can't replace: customers whose last order
    // falls within 3 months of the corpus horizon are right-censored
    // (still alive as far as the data knows), and KM discounts the
    // at-risk set without counting them as deaths. Tenure = 30-day
    // buckets of first→last order span (pure datediff integers — month
    // arithmetic differs across engines); per segment and tenure t:
    // n_t (at risk) is a SUFFIX sum over the tenure histogram, d_t the
    // uncensored exits, and S(t) = Π_{u≤t} (1 − d_u/n_u). The survival
    // product is the one place a float is allowed, under the q238
    // sequential-fold contract: factors (n−d)/n are exact-operand
    // double divisions multiplied in strictly ascending-tenure order —
    // Spark folds them in a per-segment sorted mapPartitions walk
    // (segments are a 5-key frame; the heavy work is the per-customer
    // rollup before it), the oracle walks the identical recurrence with
    // a recursive CTE (q214 precedent). Frames after the rollup are
    // bounded by CALENDAR SPAN (~85 tenures), never row count.
    QueryDef(
      "q248_kaplan_meier",
      (s, dir) => {
        import s.implicits._
        val o = Tables.orders(s, dir)
          .select(col("o_custkey"), col("o_orderdate").cast("date").as("d"))
        val c = Tables.customer(s, dir)
          .select(col("c_custkey"), col("c_mktsegment").as("segment"))
        val horizon = o.groupBy().agg(max(col("d")).as("hmax"))
        val cust = o.groupBy(col("o_custkey"))
          .agg(min(col("d")).as("first_d"), max(col("d")).as("last_d"))
          .crossJoin(broadcast(horizon))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .select(col("segment"),
            expr("CAST(datediff(last_d, first_d) AS BIGINT) div 30").as("tenure"),
            (datediff(col("hmax"), col("last_d")) >= 90).as("event"))
        val hist = cust.groupBy(col("segment"), col("tenure"))
          .agg(count(lit(1)).as("m"),
            sum(when(col("event"), 1L).otherwise(0L)).as("d"))
        val wSuf = Window.partitionBy(col("segment")).orderBy(col("tenure"))
          .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        val risk = hist.withColumn("n_risk", sum(col("m")).over(wSuf))
        risk.select(col("segment"), col("tenure"), col("n_risk"), col("d"))
          .repartition(col("segment"))
          .sortWithinPartitions(col("segment"), col("tenure"))
          .as[(String, Long, Long, Long)]
          .mapPartitions { rows =>
            graft.operators.SortedFold.scanGroups(
              rows, (r: (String, Long, Long, Long)) => r._1, 1.0) {
              case (surv, (seg, t, n, d)) =>
                val s2 = surv * ((n - d).toDouble / n.toDouble)
                (s2, (seg, t, n, d, s2))
            }
          }
          .toDF("segment", "tenure", "n_risk", "n_events", "survival")
          .orderBy(col("segment"), col("tenure"))
      },
      Some("""
        WITH RECURSIVE horizon AS (
          SELECT MAX(CAST(o_orderdate AS DATE)) AS hmax FROM orders),
        cust AS (
          SELECT o_custkey,
                 MIN(CAST(o_orderdate AS DATE)) AS first_d,
                 MAX(CAST(o_orderdate AS DATE)) AS last_d
          FROM orders GROUP BY 1),
        tagged AS (
          SELECT c.c_mktsegment AS segment,
                 CAST(date_diff('day', u.first_d, u.last_d) AS BIGINT) // 30 AS tenure,
                 (date_diff('day', u.last_d, h.hmax) >= 90) AS ev
          FROM cust u
          JOIN customer c ON u.o_custkey = c.c_custkey
          CROSS JOIN horizon h),
        hist AS (
          SELECT segment, tenure, CAST(COUNT(*) AS BIGINT) AS m,
                 CAST(SUM(CASE WHEN ev THEN 1 ELSE 0 END) AS BIGINT) AS d
          FROM tagged GROUP BY 1, 2),
        risk AS (
          SELECT segment, tenure, m, d,
                 CAST(SUM(m) OVER (PARTITION BY segment ORDER BY tenure
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT)
                   AS n_risk,
                 row_number() OVER (PARTITION BY segment ORDER BY tenure) AS rn
          FROM hist),
        walk AS (
          SELECT segment, tenure, n_risk, d, rn,
                 (n_risk - d)::DOUBLE / n_risk::DOUBLE AS surv
          FROM risk WHERE rn = 1
          UNION ALL
          SELECT r.segment, r.tenure, r.n_risk, r.d, r.rn,
                 w.surv * ((r.n_risk - r.d)::DOUBLE / r.n_risk::DOUBLE)
          FROM walk w JOIN risk r
            ON r.segment = w.segment AND r.rn = w.rn + 1)
        SELECT segment, tenure, n_risk, d AS n_events, surv AS survival
        FROM walk
        ORDER BY segment, tenure""")),

    // Two-group log-rank test — the SIGNIFICANCE companion of the
    // Kaplan-Meier curves (q248): does the BUILDING segment churn on a
    // different schedule than everyone else? Same censoring contract as
    // q248 (30-day tenure buckets, right-censored within 90 days of the
    // horizon). At each tenure t with d_t events: the group-1 expected
    // count under H₀ is d_t·n1_t/n_t and the hypergeometric variance
    // d_t·(n1_t/n_t)(n2_t/n_t)(n_t−d_t)/(n_t−1) — both carried on an
    // exact ppm floor-division lattice riding DECIMAL(38,0) (both
    // engines floor POSITIVE operands, so truncate-vs-floor never
    // diverges), summed over a CALENDAR-bounded tenure lattice (≤~85
    // rows; the suffix at-risk sums are a tiny triangular self-join,
    // not a data-proportional window). The χ²(1) α=0.05 verdict is the
    // cross-multiplied integer predicate (O−E)²·10000 > 38415·V·10⁶ —
    // a COMPUTED boolean on both engines. Scale: one per-customer
    // rollup (partial-aggregable) + one dim join; everything after is
    // constant-size.
    QueryDef(
      "q306_logrank",
      (s, dir) => {
        val D = org.apache.spark.sql.types.DecimalType(38, 0)
        val o = Tables.orders(s, dir)
          .select(col("o_custkey"), col("o_orderdate").cast("date").as("d"))
        val c = Tables.customer(s, dir)
          .select(col("c_custkey"),
            (col("c_mktsegment") === "BUILDING").as("g1"))
        val horizon = o.groupBy().agg(max(col("d")).as("hmax"))
        val cust = o.groupBy(col("o_custkey"))
          .agg(min(col("d")).as("first_d"), max(col("d")).as("last_d"))
          .crossJoin(broadcast(horizon))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .select(col("g1"),
            expr("CAST(datediff(last_d, first_d) AS BIGINT) div 30")
              .as("tenure"),
            (datediff(col("hmax"), col("last_d")) >= 90).as("event"))
          // consumed by BOTH the tenure histogram and the group totals —
          // branching consumption, sanctioned lineage cut (one
          // per-customer rollup instead of two).
          .cutLineage()
        val hist = cust.groupBy(col("tenure")).agg(
          sum(when(col("g1"), 1L).otherwise(0L)).as("m1"),
          sum(when(!col("g1"), 1L).otherwise(0L)).as("m2"),
          sum(when(col("g1") && col("event"), 1L).otherwise(0L)).as("d1"),
          sum(when(!col("g1") && col("event"), 1L).otherwise(0L)).as("d2"))
        val hb = hist.select(col("tenure").as("tb"), col("m1").as("m1b"),
          col("m2").as("m2b"))
        val risk = hist.join(hb, col("tb") >= col("tenure"))
          .groupBy(col("tenure"), col("d1"), col("d2"))
          .agg(sum(col("m1b")).as("n1t"), sum(col("m2b")).as("n2t"))
        val terms = risk
          .withColumn("dt", col("d1") + col("d2"))
          .withColumn("nt", col("n1t") + col("n2t"))
          .where(col("dt") > 0)
          .select(col("d1"),
            expr("""(cast(dt as decimal(38,0)) * n1t * 1000000) div nt""")
              .as("e1_ppm_t"),
            when(col("nt") > 1,
              expr("""(cast(((cast(dt as decimal(38,0)) * n1t * 1000000)
                             div nt) as decimal(38,0))
                      * n2t * (nt - dt)) div (cast(nt as decimal(38,0))
                                              * (nt - 1))"""))
              .otherwise(lit(0L)).as("v_ppm_t"))
        val sums = terms.agg(
          sum(col("d1") * 1000000L).as("o1_ppm"),
          sum(col("e1_ppm_t")).as("e1_ppm"),
          sum(col("v_ppm_t")).as("v_ppm"))
        val totals = cust.agg(
          sum(when(col("g1"), 1L).otherwise(0L)).as("n1"),
          sum(when(!col("g1"), 1L).otherwise(0L)).as("n2"),
          sum(when(col("g1") && col("event"), 1L).otherwise(0L))
            .as("events1"),
          sum(when(!col("g1") && col("event"), 1L).otherwise(0L))
            .as("events2"))
        totals.crossJoin(broadcast(sums))
          .select(col("n1"), col("n2"), col("events1"), col("events2"),
            col("o1_ppm"), col("e1_ppm"), col("v_ppm"),
            (expr("""cast(o1_ppm - e1_ppm as decimal(38,0))
                     * (o1_ppm - e1_ppm) * 10000""") >
              expr("cast(v_ppm as decimal(38,0)) * 38415 * 1000000"))
              .as("logrank_significant"))
          .orderBy(col("n1"))
      },
      Some("""
        WITH horizon AS (
          SELECT MAX(CAST(o_orderdate AS DATE)) AS hmax FROM orders),
        cust AS (
          SELECT o_custkey,
                 MIN(CAST(o_orderdate AS DATE)) AS first_d,
                 MAX(CAST(o_orderdate AS DATE)) AS last_d
          FROM orders GROUP BY 1),
        tagged AS (
          SELECT (c.c_mktsegment = 'BUILDING') AS g1,
                 CAST(date_diff('day', u.first_d, u.last_d) AS BIGINT)
                   // 30 AS tenure,
                 (date_diff('day', u.last_d, h.hmax) >= 90) AS ev
          FROM cust u
          JOIN customer c ON u.o_custkey = c.c_custkey
          CROSS JOIN horizon h),
        hist AS (
          SELECT tenure,
                 CAST(SUM(CASE WHEN g1 THEN 1 ELSE 0 END) AS BIGINT) AS m1,
                 CAST(SUM(CASE WHEN NOT g1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS m2,
                 CAST(SUM(CASE WHEN g1 AND ev THEN 1 ELSE 0 END) AS BIGINT)
                   AS d1,
                 CAST(SUM(CASE WHEN NOT g1 AND ev THEN 1 ELSE 0 END)
                   AS BIGINT) AS d2
          FROM tagged GROUP BY 1),
        risk AS (
          SELECT h.tenure, h.d1, h.d2,
                 CAST(SUM(b.m1) AS BIGINT) AS n1t,
                 CAST(SUM(b.m2) AS BIGINT) AS n2t
          FROM hist h JOIN hist b ON b.tenure >= h.tenure
          GROUP BY 1, 2, 3),
        terms AS (
          SELECT d1,
                 (CAST(d1 + d2 AS HUGEINT) * n1t * 1000000)
                   // (n1t + n2t) AS e1_ppm_t,
                 CASE WHEN n1t + n2t > 1 THEN
                   (((CAST(d1 + d2 AS HUGEINT) * n1t * 1000000)
                     // (n1t + n2t))
                    * n2t * ((n1t + n2t) - (d1 + d2)))
                   // (CAST(n1t + n2t AS HUGEINT) * ((n1t + n2t) - 1))
                 ELSE 0 END AS v_ppm_t
          FROM risk WHERE d1 + d2 > 0),
        sums AS (
          SELECT CAST(SUM(d1 * 1000000) AS BIGINT) AS o1_ppm,
                 CAST(SUM(e1_ppm_t) AS BIGINT) AS e1_ppm,
                 CAST(SUM(v_ppm_t) AS BIGINT) AS v_ppm
          FROM terms),
        totals AS (
          SELECT CAST(SUM(CASE WHEN g1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
                 CAST(SUM(CASE WHEN NOT g1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n2,
                 CAST(SUM(CASE WHEN g1 AND ev THEN 1 ELSE 0 END) AS BIGINT)
                   AS events1,
                 CAST(SUM(CASE WHEN NOT g1 AND ev THEN 1 ELSE 0 END)
                   AS BIGINT) AS events2
          FROM tagged)
        SELECT t.n1, t.n2, t.events1, t.events2,
               s.o1_ppm, s.e1_ppm, s.v_ppm,
               CAST(s.o1_ppm - s.e1_ppm AS HUGEINT)
                 * (s.o1_ppm - s.e1_ppm) * 10000 >
                 CAST(s.v_ppm AS HUGEINT) * 38415 * 1000000
                 AS logrank_significant
        FROM totals t CROSS JOIN sums s
        ORDER BY t.n1""")),

    // Nelson-Aalen cumulative hazard — the ADDITIVE companion of the
    // q248 Kaplan-Meier product: H(t) = Σ_{u≤t} d_u/n_u estimates
    // cumulative churn pressure and, unlike the KM product, lives
    // entirely on the exact integer lattice — each per-tenure term is
    // floored to ppm (d_u·10⁶ div n_u, positive operands, so both
    // engines floor identically) and the prefix sum is plain integer
    // addition: NO sequential float fold, no recursive-CTE walk — the
    // reason production survival pipelines prefer H(t) (and the KM
    // relation S ≈ e^(−H)) at scale. Same censoring contract as
    // q248/q306 (30-day tenure buckets, right-censored within 90 days
    // of the horizon); at-risk counts are the same suffix sums. Both
    // prefix/suffix windows are keyed by segment and bounded by
    // CALENDAR SPAN (~85 tenures), never row count. Scale: one
    // partial-aggregable per-customer rollup + broadcast dim join;
    // everything after is the bounded tenure lattice.
    QueryDef(
      "q335_nelson_aalen",
      (s, dir) => {
        val o = Tables.orders(s, dir)
          .select(col("o_custkey"), col("o_orderdate").cast("date").as("d"))
        val c = Tables.customer(s, dir)
          .select(col("c_custkey"), col("c_mktsegment").as("segment"))
        val horizon = o.groupBy().agg(max(col("d")).as("hmax"))
        val cust = o.groupBy(col("o_custkey"))
          .agg(min(col("d")).as("first_d"), max(col("d")).as("last_d"))
          .crossJoin(broadcast(horizon))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .select(col("segment"),
            expr("CAST(datediff(last_d, first_d) AS BIGINT) div 30")
              .as("tenure"),
            (datediff(col("hmax"), col("last_d")) >= 90).as("event"))
        val hist = cust.groupBy(col("segment"), col("tenure"))
          .agg(count(lit(1)).as("m"),
            sum(when(col("event"), 1L).otherwise(0L)).as("d"))
        val wSuf = Window.partitionBy(col("segment")).orderBy(col("tenure"))
          .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        val wPre = Window.partitionBy(col("segment")).orderBy(col("tenure"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        hist.withColumn("n_risk", sum(col("m")).over(wSuf))
          .withColumn("h_ppm_t", expr("(d * 1000000) div n_risk"))
          .withColumn("cum_hazard_ppm", sum(col("h_ppm_t")).over(wPre))
          .select(col("segment"), col("tenure"), col("n_risk"),
            col("d").as("n_events"), col("h_ppm_t"),
            col("cum_hazard_ppm"))
          .orderBy(col("segment"), col("tenure"))
      },
      Some("""
        WITH horizon AS (
          SELECT MAX(CAST(o_orderdate AS DATE)) AS hmax FROM orders),
        cust AS (
          SELECT o_custkey,
                 MIN(CAST(o_orderdate AS DATE)) AS first_d,
                 MAX(CAST(o_orderdate AS DATE)) AS last_d
          FROM orders GROUP BY 1),
        tagged AS (
          SELECT c.c_mktsegment AS segment,
                 CAST(date_diff('day', u.first_d, u.last_d) AS BIGINT)
                   // 30 AS tenure,
                 (date_diff('day', u.last_d, h.hmax) >= 90) AS ev
          FROM cust u
          JOIN customer c ON u.o_custkey = c.c_custkey
          CROSS JOIN horizon h),
        hist AS (
          SELECT segment, tenure, CAST(COUNT(*) AS BIGINT) AS m,
                 CAST(SUM(CASE WHEN ev THEN 1 ELSE 0 END) AS BIGINT) AS d
          FROM tagged GROUP BY 1, 2),
        risk AS (
          SELECT segment, tenure, m, d,
                 CAST(SUM(m) OVER (PARTITION BY segment ORDER BY tenure
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                   AS BIGINT) AS n_risk
          FROM hist),
        terms AS (
          SELECT segment, tenure, n_risk, d,
                 (d * 1000000) // n_risk AS h_ppm_t
          FROM risk)
        SELECT segment, tenure, n_risk, d AS n_events, h_ppm_t,
               CAST(SUM(h_ppm_t) OVER (PARTITION BY segment ORDER BY tenure
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS cum_hazard_ppm
        FROM terms
        ORDER BY segment, tenure""")),

    // Index of dispersion (variance-to-mean ratio) of per-user daily
    // event counts, by event type — the count-data audit every
    // Poisson-assuming model (rate alerts, traffic CIs, the q186
    // watermark sizing) silently depends on: D ≈ 1 means Poisson
    // arrivals, D ≫ 1 means bursty/overdispersed (negative-binomial
    // territory — Poisson CIs are then anti-conservative). Exact
    // rational: over ACTIVE (user, day) cells (the observable support —
    // stated, since zero-cell inclusion needs a user×day frame),
    // D = s²/x̄ = (n·Σx² − S²)·10⁶ div ((n−1)·n·x̄)… assembled as
    // ((n·Σx² − S²) · 10⁶) div ((n−1)·S) in DECIMAL(38,0), emitted in
    // ppm with the conventional D > 1.5 burstiness flag. Scale: one
    // partial-aggregable (user, day, type) rollup, then a ≤5-row
    // moment lattice.
    QueryDef(
      "q377_dispersion_index",
      (s, dir) => {
        val cells = Tables.events(s, dir)
          .groupBy(col("event_type"),
            col("user_id"), to_date(col("ts")).as("d"))
          .agg(count(lit(1)).as("x"))
        cells.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_cells"),
            sum(col("x")).as("sx"),
            sum((col("x").cast(org.apache.spark.sql.types.DecimalType(38, 0))
              * col("x")).cast(org.apache.spark.sql.types.DecimalType(38, 0)))
              .as("sxx"))
          .withColumn("d_ppm", expr(
            """case when n_cells <= 1 or sx = 0 then 0
               else cast(((cast(n_cells as decimal(38,0)) * sxx
                           - cast(sx as decimal(38,0)) * sx) * 1000000)
                         div (cast(n_cells - 1 as decimal(38,0)) * sx)
                         as bigint) end"""))
          .select(col("event_type"), col("n_cells"), col("sx").as("n_events"),
            col("d_ppm"), (col("d_ppm") > 1500000L).as("overdispersed"))
          .orderBy(col("event_type"))
      },
      Some("""
        WITH cells AS (
          SELECT event_type, user_id, CAST(ts AS DATE) AS d,
                 CAST(COUNT(*) AS BIGINT) AS x
          FROM events GROUP BY 1, 2, 3),
        m AS (
          SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_cells,
                 CAST(SUM(x) AS BIGINT) AS sx,
                 SUM(CAST(x AS HUGEINT) * x) AS sxx
          FROM cells GROUP BY 1)
        SELECT event_type, n_cells, sx AS n_events,
               CASE WHEN n_cells <= 1 OR sx = 0 THEN 0
                    ELSE CAST(((CAST(n_cells AS HUGEINT) * sxx
                                - CAST(sx AS HUGEINT) * sx) * 1000000)
                              // (CAST(n_cells - 1 AS HUGEINT) * sx)
                              AS BIGINT) END AS d_ppm,
               CASE WHEN n_cells <= 1 OR sx = 0 THEN 0
                    ELSE CAST(((CAST(n_cells AS HUGEINT) * sxx
                                - CAST(sx AS HUGEINT) * sx) * 1000000)
                              // (CAST(n_cells - 1 AS HUGEINT) * sx)
                              AS BIGINT) END > 1500000 AS overdispersed
        FROM m
        ORDER BY event_type"""))
  )
}
