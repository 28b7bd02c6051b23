package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Kernels._
import graft.sources.Tables
import graft.plans.CheckpointPolicy.DataFrameCutOps

/** Round-4 batch 9 — customer-journey analytics:
  *
  *  - q113: gaps-and-islands — consecutive-month order streaks per
  *    customer (the classic tenure/engagement primitive). Island id =
  *    month_index − dense_rank, the standard O(n) window trick; no
  *    self-joins, no recursion.
  *  - q115: last-touch marketing attribution — each purchase event is
  *    attributed to the user's most recent at-or-before touch event
  *    (view/click/signup) within a 7-day window, else 'direct'. The
  *    ignore-nulls running carry shares one user_id exchange with the
  *    purchase filter — the as-of-join shape (q09) specialized to a
  *    single ordered pass.
  */
object JourneyQueries {

  val defs: Seq[QueryDef] = Seq(

    // Gaps-and-islands: distinct (customer, order month) → month index
    // (calendar months since 1995-01) → island = idx − dense_rank, which
    // is constant exactly while months are consecutive. One exchange on
    // o_custkey (distinct + both windows share it), then a two-level
    // rollup: per-island lengths, then the streak-length histogram with
    // a customer checksum so island boundaries can't silently shift.
    QueryDef(
      "q113_order_streaks",
      (s, dir) => {
        val m = Tables.orders(s, dir)
          .select(col("o_custkey").as("c"),
            (monthsBetweenCalendar(to_date(col("o_orderdate")), lit("1995-01-01").cast("date")))
              .cast("long").as("midx"))
          .distinct()
        val w = Window.partitionBy(col("c")).orderBy(col("midx"))
        val islands = m.withColumn("island", col("midx") - dense_rank().over(w))
          .groupBy(col("c"), col("island"))
          .agg(count(lit(1)).as("streak_len"))
        islands.groupBy(col("streak_len"))
          .agg(count(lit(1)).as("n_streaks"),
            countDistinct(col("c")).as("n_customers"),
            sum(col("c")).as("cust_checksum"))
          .orderBy(col("streak_len"))
      },
      Some("""
        WITH m AS (
          SELECT DISTINCT o_custkey AS c,
                 CAST((year(o_orderdate) - 1995) * 12 + (month(o_orderdate) - 1)
                      AS BIGINT) AS midx
          FROM orders),
        islands AS (
          SELECT c, midx - dense_rank() OVER (PARTITION BY c ORDER BY midx) AS island
          FROM m),
        streaks AS (
          SELECT c, island, COUNT(*) AS streak_len
          FROM islands GROUP BY 1, 2)
        SELECT streak_len, COUNT(*) AS n_streaks,
               COUNT(DISTINCT c) AS n_customers,
               CAST(SUM(c) AS BIGINT) AS cust_checksum
        FROM streaks
        GROUP BY streak_len
        ORDER BY streak_len""")),

    // Last-touch attribution: carry the most recent touch (view/click/
    // signup) forward through each user's ordered event stream
    // (ignore-nulls running last), then attribute every purchase to it —
    // 'direct' when there is no touch or it is staler than 7 days.
    // Deterministic total order (ts, event_id) handles equal timestamps;
    // at-or-same-instant touches count (at-or-before semantics, like
    // q09). One user_id exchange; the rollup is a 4-row aggregate.
    QueryDef(
      "q115_last_touch_attribution",
      (s, dir) => {
        val e = Tables.events(s, dir)
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val isTouch = col("event_type").isin("view", "click", "signup")
        val carried = e
          .withColumn("touch_ts", last(when(isTouch, col("ts")), ignoreNulls = true).over(w))
          .withColumn("touch_type", last(when(isTouch, col("event_type")), ignoreNulls = true).over(w))
        carried.where(col("event_type") === "purchase")
          .select(
            when(col("touch_ts").isNull ||
                col("touch_ts") < col("ts") - expr("INTERVAL 7 DAYS"), "direct")
              .otherwise(col("touch_type")).as("attributed_channel"),
            col("value"))
          .groupBy(col("attributed_channel"))
          .agg(count(lit(1)).as("n_purchases"),
            moneyOut(sum(dec6(col("value")))).as("attributed_value"))
          .orderBy(col("attributed_channel"))
      },
      Some("""
        WITH carried AS (
          SELECT event_type, ts, value,
                 last_value(CASE WHEN event_type IN ('view','click','signup')
                                 THEN ts END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS touch_ts,
                 last_value(CASE WHEN event_type IN ('view','click','signup')
                                 THEN event_type END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS touch_type
          FROM events)
        SELECT CASE WHEN touch_ts IS NULL OR touch_ts < ts - INTERVAL 7 DAY
                    THEN 'direct' ELSE touch_type END AS attributed_channel,
               COUNT(*) AS n_purchases,
               CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,6))
                    AS DOUBLE) AS attributed_value
        FROM carried
        WHERE event_type = 'purchase'
        GROUP BY 1
        ORDER BY 1""")),

    // Top entry paths: each user's first three events (total order
    // (ts, event_id) — no RNG ties), folded to an 'a>b>c' path string,
    // counted across users. The sequence-mining primitive behind
    // onboarding-funnel dashboards. One user_id window (rows ≤ 3 kept) +
    // conditional-aggregate pivot — no collect_list (unordered) and no
    // per-user driver logic; output cardinality is bounded by the
    // event-type alphabet (≤ 5³ + 5² + 5 paths), so the final global
    // sort is on a provably tiny frame. Users with fewer than 3 events
    // still contribute their shorter path (concat_ws skips NULLs on both
    // engines — semantics pinned by the oracle).
    QueryDef(
      "q206_entry_paths",
      (s, dir) => {
        val e = Tables.events(s, dir)
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val first3 = e.select(col("user_id"), col("event_type"),
            row_number().over(w).as("rn"))
          .where(col("rn") <= 3)
        first3.groupBy(col("user_id"))
          .agg(
            max(when(col("rn") === 1, col("event_type"))).as("e1"),
            max(when(col("rn") === 2, col("event_type"))).as("e2"),
            max(when(col("rn") === 3, col("event_type"))).as("e3"))
          .select(concat_ws(">", col("e1"), col("e2"), col("e3")).as("path"))
          .groupBy(col("path"))
          .agg(count(lit(1)).as("n_users"))
          .orderBy(col("n_users").desc, col("path"))
      },
      Some("""
        WITH ranked AS (
          SELECT user_id, event_type,
                 row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
          FROM events),
        per_user AS (
          SELECT user_id,
                 MAX(CASE WHEN rn = 1 THEN event_type END) AS e1,
                 MAX(CASE WHEN rn = 2 THEN event_type END) AS e2,
                 MAX(CASE WHEN rn = 3 THEN event_type END) AS e3
          FROM ranked WHERE rn <= 3
          GROUP BY user_id)
        SELECT concat_ws('>', e1, e2, e3) AS path,
               CAST(COUNT(*) AS BIGINT) AS n_users
        FROM per_user
        GROUP BY 1
        ORDER BY n_users DESC, path""")),

    // Sequence-pattern matching over sessions — the MATCH_RECOGNIZE /
    // funnel-regex operator class: render each 30-min-gap session as an
    // ordered event-initial string ("vvcp" = view view click purchase)
    // and count sessions/users matching each of a small broadcast
    // pattern table (regexes kept inside the RE2∩Java common dialect:
    // classes, anchors, +, *). Path building is deterministic without
    // any ordered-agg dependence: collect struct(rn, initial), sort the
    // array (numeric on rn), join — the same total-order contract as the
    // oracle's string_agg(ORDER BY rn). 100 TB: one exchange on user_id
    // (sessionize + path both cluster on it), session strings are
    // gap-bounded, and the pattern table is a literal cross join —
    // rlike runs map-side per (session, pattern).
    QueryDef(
      "q219_session_path_regex",
      (s, dir) => {
        import s.implicits._
        val ev = Tables.events(s, dir)
        val byUser = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val gapUs = unix_micros(col("ts")) -
          unix_micros(lag(col("ts"), 1).over(byUser))
        val sessioned = ev.select(col("user_id"), col("event_id"),
            substring(col("event_type"), 1, 1).as("initial"),
            sum(when(gapUs.isNull || gapUs > 30L * 60 * 1000000, 1L)
              .otherwise(0L))
              .over(byUser.rowsBetween(Window.unboundedPreceding,
                Window.currentRow)).as("session_no"),
            row_number().over(byUser).as("rn"))
        val paths = sessioned
          .groupBy(col("user_id"), col("session_no"))
          .agg(array_join(transform(
              array_sort(collect_list(struct(col("rn"), col("initial")))),
              x => x.getField("initial")), "").as("path"))
        val patterns = Seq(
          ("browse_only", "^[vc]+$"),
          ("converted", "^.*p.*$"),
          ("error_then_purchase", "^.*e.*p.*$"),
          ("signup_first", "^s.*$"))
        val pat = patterns.toDF("pattern_name", "pattern")
        paths.crossJoin(broadcast(pat))
          .groupBy(col("pattern_name"))
          .agg(sum(when(expr("regexp_like(path, pattern)"), 1L).otherwise(0L))
              .as("n_sessions"),
            count_distinct(when(expr("regexp_like(path, pattern)"),
              col("user_id"))).as("n_users"))
          .orderBy(col("pattern_name"))
      },
      Some("""
        WITH g AS (
          SELECT user_id, event_id, ts,
                 substr(event_type, 1, 1) AS initial,
                 epoch_us(ts) - epoch_us(lag(ts) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us,
                 row_number() OVER
                   (PARTITION BY user_id ORDER BY ts, event_id) AS rn
          FROM events),
        sess AS (
          SELECT user_id, rn, initial,
                 SUM(CASE WHEN gap_us IS NULL OR gap_us > 30*60*1000000
                          THEN 1 ELSE 0 END) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS session_no
          FROM g),
        paths AS (
          SELECT user_id, session_no,
                 string_agg(initial, '' ORDER BY rn) AS path
          FROM sess GROUP BY 1, 2),
        pat AS (
          SELECT * FROM (VALUES
            ('browse_only', '^[vc]+$'),
            ('converted', '^.*p.*$'),
            ('error_then_purchase', '^.*e.*p.*$'),
            ('signup_first', '^s.*$')) AS t(pattern_name, pattern))
        SELECT pattern_name,
               CAST(SUM(CASE WHEN regexp_matches(path, pattern)
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
               CAST(COUNT(DISTINCT CASE WHEN regexp_matches(path, pattern)
                                        THEN user_id END) AS BIGINT) AS n_users
        FROM paths CROSS JOIN pat
        GROUP BY 1
        ORDER BY pattern_name""")),

    // Sequential-pattern support (the 2-item PrefixSpan core): for every
    // ordered event-type pair (a → b), count sessions where some a
    // occurs STRICTLY BEFORE some b — "eventually follows", the support
    // metric sequence miners grow patterns from. Distinct from q102
    // (unordered co-occurrence) and q111 (adjacent transitions only):
    // order matters and gaps are allowed. The exists-before predicate
    // compresses to min_pos(a) < max_pos(b) over per-session type spans
    // (pos = row_number on the total (ts, event_id) order — integer,
    // no composite-key overflow). Scale: spans are one partial agg on
    // (user, session, type); the pair fan-out is a per-session self-join
    // bounded by |types|² = 25; support ratios are integer ppm.
    QueryDef(
      "q226_seq_pattern_support",
      (s, dir) => {
        val byUser = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val gapUs = unix_micros(col("ts")) -
          unix_micros(lag(col("ts"), 1).over(byUser))
        val sessioned = Tables.events(s, dir)
          .select(col("user_id"), col("event_type"),
            row_number().over(byUser).as("pos"),
            sum(when(gapUs.isNull || gapUs > 30L * 60 * 1000000, 1L)
              .otherwise(0L))
              .over(byUser.rowsBetween(Window.unboundedPreceding,
                Window.currentRow)).as("session_no"))
        val spans = sessioned
          .groupBy(col("user_id"), col("session_no"), col("event_type"))
          .agg(min(col("pos")).as("min_pos"), max(col("pos")).as("max_pos"))
          .cutLineage()
        val total = spans.select(col("user_id"), col("session_no")).distinct()
          .agg(count(lit(1)).as("n_total"))
        val a = spans.select(col("user_id"), col("session_no"),
          col("event_type").as("type_a"), col("min_pos"))
        val b = spans.select(col("user_id"), col("session_no"),
          col("event_type").as("type_b"), col("max_pos"))
        a.join(b, Seq("user_id", "session_no"))
          .where(col("type_a") =!= col("type_b"))
          .groupBy(col("type_a"), col("type_b"))
          .agg(count(lit(1)).as("n_sessions_both"),
            sum(when(col("min_pos") < col("max_pos"), 1L).otherwise(0L))
              .as("n_sessions_ab"))
          .crossJoin(broadcast(total))
          .select(col("type_a"), col("type_b"), col("n_sessions_both"),
            col("n_sessions_ab"),
            expr("n_sessions_ab * 1000000 div n_total").as("support_ppm"))
          .orderBy(col("type_a"), col("type_b"))
      },
      Some("""
        WITH g AS (
          SELECT user_id, event_type, ts, event_id,
                 epoch_us(ts) - epoch_us(lag(ts) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us,
                 row_number() OVER
                   (PARTITION BY user_id ORDER BY ts, event_id) AS pos
          FROM events),
        sess AS (
          SELECT user_id, event_type, pos,
                 SUM(CASE WHEN gap_us IS NULL OR gap_us > 30*60*1000000
                          THEN 1 ELSE 0 END) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS session_no
          FROM g),
        spans AS (
          SELECT user_id, session_no, event_type,
                 MIN(pos) AS min_pos, MAX(pos) AS max_pos
          FROM sess GROUP BY 1, 2, 3),
        total AS (
          SELECT COUNT(*) AS n FROM
            (SELECT DISTINCT user_id, session_no FROM spans)),
        pairs AS (
          SELECT a.event_type AS type_a, b.event_type AS type_b,
                 COUNT(*) AS n_sessions_both,
                 SUM(CASE WHEN a.min_pos < b.max_pos THEN 1 ELSE 0 END)
                   AS n_sessions_ab
          FROM spans a JOIN spans b
            ON a.user_id = b.user_id AND a.session_no = b.session_no
           AND a.event_type <> b.event_type
          GROUP BY 1, 2)
        SELECT type_a, type_b,
               CAST(n_sessions_both AS BIGINT) AS n_sessions_both,
               CAST(n_sessions_ab AS BIGINT) AS n_sessions_ab,
               CAST(n_sessions_ab * 1000000 // t.n AS BIGINT) AS support_ppm
        FROM pairs, total t
        ORDER BY type_a, type_b""")),

    // Negation CEP — "A then B with NO C between": the complex-event
    // pattern the funnel family can't express (q98 windows steps, q219
    // regex-matches whole sessions, but neither excludes an intervening
    // event). Per user: a view converts iff the NEXT purchase after it
    // exists and no error fires strictly between the two. No self-join:
    // each event gets next-purchase / next-error sequence positions from
    // two conditional MINs over ONE future-frame window (ROWS 1
    // FOLLOWING..UNBOUNDED), positions being the per-user row_number so
    // tie handling is the (ts, event_id) total order; the negation is
    // then a pure three-way position comparison per view row. One
    // user_id exchange carries row-numbering and both windows; the
    // cohort rollup partial-aggregates.
    QueryDef(
      "q245_negation_cep",
      (s, dir) => {
        val wSeq = Window.partitionBy(col("user_id"))
          .orderBy(col("tus"), col("event_id"))
        val wFut = wSeq.rowsBetween(1, Window.unboundedFollowing)
        val ev = Tables.events(s, dir)
          .select(col("user_id"), unix_micros(col("ts")).as("tus"),
            col("event_id"), col("event_type"))
          .withColumn("rn", row_number().over(wSeq).cast("long"))
          .withColumn("np",
            min(when(col("event_type") === "purchase", col("rn"))).over(wFut))
          .withColumn("ne",
            min(when(col("event_type") === "error", col("rn"))).over(wFut))
        val views = ev.where(col("event_type") === "view")
          .select((col("user_id") % 10).as("cohort"),
            col("event_id"),
            (col("np").isNotNull &&
              (col("ne").isNull || col("ne") > col("np"))).as("converted"))
        views.groupBy(col("cohort"))
          .agg(count(lit(1)).as("n_views"),
            sum(when(col("converted"), 1L).otherwise(0L)).as("n_converted"),
            sum(when(col("converted"), col("event_id"))).as("converted_checksum"))
          .withColumn("conversion_ppm",
            expr("(1000000 * n_converted) div n_views"))
          .orderBy(col("cohort"))
      },
      Some("""
        WITH seq AS (
          SELECT user_id, event_id, event_type,
                 row_number() OVER w AS rn
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
        nav AS (
          SELECT user_id, event_id, event_type, rn,
                 MIN(CASE WHEN event_type = 'purchase' THEN rn END) OVER wf AS np,
                 MIN(CASE WHEN event_type = 'error' THEN rn END) OVER wf AS ne
          FROM seq
          WINDOW wf AS (PARTITION BY user_id ORDER BY rn
                        ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)),
        views AS (
          SELECT user_id % 10 AS cohort, event_id,
                 (np IS NOT NULL AND (ne IS NULL OR ne > np)) AS converted
          FROM nav WHERE event_type = 'view')
        SELECT cohort,
               CAST(COUNT(*) AS BIGINT) AS n_views,
               CAST(SUM(CASE WHEN converted THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_converted,
               CAST(SUM(CASE WHEN converted THEN event_id END) AS BIGINT)
                 AS converted_checksum,
               (1000000 * CAST(SUM(CASE WHEN converted THEN 1 ELSE 0 END) AS BIGINT))
                 // CAST(COUNT(*) AS BIGINT) AS conversion_ppm
        FROM views
        GROUP BY cohort
        ORDER BY cohort""")),

    // Exact MRR@10 — the retrieval-eval metric (mean reciprocal rank of
    // the first purchase within each user's first 10 events) WITHOUT a
    // float sum: reciprocals 1/r for r ≤ 10 all divide lcm(1..10)=2520,
    // so Σ1/r accumulates as the exact BIGINT Σ(2520/r) and
    // MRR_ppm = 10⁶·Σ(2520/r) div (2520·n) — the q172 BM25 stance
    // (odds-idf) applied to the eval side of retrieval. Rank comes from
    // ONE user-partitioned row_number; users with no purchase in their
    // first 10 events contribute 0 to the numerator and stay in n.
    QueryDef(
      "q250_mrr_at10",
      (s, dir) => {
        val wSeq = Window.partitionBy(col("user_id"))
          .orderBy(col("tus"), col("event_id"))
        val ev = Tables.events(s, dir)
          .select(col("user_id"), unix_micros(col("ts")).as("tus"),
            col("event_id"), col("event_type"))
          .withColumn("rn", row_number().over(wSeq).cast("long"))
          .where(col("rn") <= 10)
        val firstHit = ev
          .groupBy(col("user_id"))
          .agg(min(when(col("event_type") === "purchase", col("rn"))).as("r"))
        firstHit
          .select((col("user_id") % 10).as("cohort"),
            when(col("r").isNotNull, expr("2520 div r")).otherwise(0L).as("w"),
            when(col("r").isNotNull, 1L).otherwise(0L).as("hit"))
          .groupBy(col("cohort"))
          .agg(count(lit(1)).as("n_users"),
            sum(col("hit")).as("n_hits"),
            sum(col("w")).as("recip_sum_2520"))
          .withColumn("mrr_ppm",
            expr("(1000000 * recip_sum_2520) div (2520 * n_users)"))
          .orderBy(col("cohort"))
      },
      Some("""
        WITH seq AS (
          SELECT user_id, event_id, event_type,
                 row_number() OVER (PARTITION BY user_id
                   ORDER BY epoch_us(ts), event_id) AS rn
          FROM events),
        hits AS (
          SELECT user_id,
                 MIN(CASE WHEN event_type = 'purchase' THEN rn END) AS r
          FROM seq WHERE rn <= 10
          GROUP BY user_id),
        weighted AS (
          SELECT user_id % 10 AS cohort,
                 CASE WHEN r IS NOT NULL THEN 2520 // r ELSE 0 END AS w,
                 CASE WHEN r IS NOT NULL THEN 1 ELSE 0 END AS hit
          FROM hits)
        SELECT cohort,
               CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(SUM(hit) AS BIGINT) AS n_hits,
               CAST(SUM(w) AS BIGINT) AS recip_sum_2520,
               (1000000 * CAST(SUM(w) AS BIGINT)) // (2520 * CAST(COUNT(*) AS BIGINT))
                 AS mrr_ppm
        FROM weighted
        GROUP BY cohort
        ORDER BY cohort""")),

    // Markov removal-effect attribution (the data-driven alternative to
    // last-touch q115 / position q180): build the first-order chain over
    // pre-conversion journeys (start → {view,click,signup,error} →
    // conv|null), then for each channel c ask "what fraction of
    // conversions survive if c is deleted?" — edges INTO c re-point to
    // null, edges out of c drop. Absorption probabilities are T¹⁶[start,
    // conv] computed by exponentiation-by-squaring in ppm INTEGERS
    // (p = cnt·10⁶ div row-total; each squaring entry = Σ pₐ·p_b div 10⁶
    // — floor per term, so both engines walk bit-identical lattices;
    // conv/null carry 10⁶ self-loops). Removal effect = p_conv(base) −
    // p_conv(−c); attribution normalizes effects to ppm shares. Scale:
    // journeys shuffle once on user_id; the chain is a ≤49-cell×5-variant
    // table (localCheckpointed), and 4 tiny self-joins replace a 16-step
    // vector walk; the DuckDB twin squares the same four matrices.
    // Output: one row per channel.
    QueryDef(
      "q275_markov_attribution",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val ev = Tables.events(s, dir)
          .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        val fp = ev.where(col("event_type") === "purchase")
          .withColumn("rn", row_number().over(w))
          .where(col("rn") === 1)
          .select(col("user_id"), col("ts").as("pts"), col("event_id").as("pid"))
        val j = ev.where(col("event_type") =!= "purchase")
          .join(fp, Seq("user_id"), "left")
          .where(col("pts").isNull ||
            struct(col("ts"), col("event_id")) < struct(col("pts"), col("pid")))
          .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
            col("pts").isNotNull.as("converted"))
        val seq0 = j
          .withColumn("prev", lag(col("event_type"), 1).over(w))
          .withColumn("nxt", lead(col("event_type"), 1).over(w))
        val t1 = seq0.where(col("prev").isNull)
          .select(lit("start").as("f"), col("event_type").as("t"))
        val t2 = seq0.where(col("prev").isNotNull)
          .select(col("prev").as("f"), col("event_type").as("t"))
        val t3 = seq0.where(col("nxt").isNull)
          .select(col("event_type").as("f"),
            when(col("converted"), lit("conv")).otherwise(lit("null")).as("t"))
        val t4 = fp.join(j.select(col("user_id")).distinct(), Seq("user_id"), "left_anti")
          .select(lit("start").as("f"), lit("conv").as("t"))
        val cells = t1.unionByName(t2).unionByName(t3).unionByName(t4)
          .groupBy(col("f"), col("t")).agg(count(lit(1)).as("cnt"))
          .withColumn("p",
            expr("(cnt * 1000000) div sum(cnt) over (partition by f)"))
          .select(col("f"), col("t"), col("p"))
        import s.implicits._
        val channels = Seq("view", "click", "signup", "error")
        val variantDf = ("base" +: channels).toDF("variant")
        val vc = cells.crossJoin(broadcast(variantDf))
          .where(col("f") =!= col("variant"))
          .withColumn("t2",
            when(col("t") === col("variant"), lit("null")).otherwise(col("t")))
          .groupBy(col("variant"), col("f"), col("t2"))
          .agg(sum(col("p")).as("p"))
          .select(col("variant"), col("f"), col("t2").as("t"), col("p"))
        val absorb = variantDf
          .crossJoin(broadcast(Seq("conv", "null").toDF("fs")))
          .select(col("variant"), col("fs").as("f"), col("fs").as("t"),
            lit(1000000L).as("p"))
        // T^16 by exponentiation-by-squaring: 4 self-joins of the <=49-cell
        // chain table (per-entry ppm floor at each squaring, the lattice the
        // oracle mirrors) instead of 16 chained vector steps — same
        // absorption read, quarter the stages.
        var m = vc.unionByName(absorb).cutLineage()
        for (_ <- 1 to 4) {
          val a = m.select(col("variant"), col("f"), col("t").as("mid"),
            col("p").as("pa"))
          val b = m.select(col("variant").as("bvariant"), col("f").as("mid"),
            col("t"), col("p").as("pb"))
          m = a.join(b, col("variant") === col("bvariant") && a("mid") === b("mid"))
            .groupBy(col("variant"), col("f"), col("t"))
            .agg(sum(expr("(pa * pb) div 1000000")).as("p"))
            .cutLineage()
        }
        val pconv = variantDf.join(
            m.where(col("f") === "start" && col("t") === "conv")
              .select(col("variant"), col("p").as("pm")),
            Seq("variant"), "left")
          .select(col("variant"), coalesce(col("pm"), lit(0L)).as("p_conv"))
        val base = pconv.where(col("variant") === "base")
          .select(col("p_conv").as("p_base"))
        val re = pconv.where(col("variant") =!= "base")
          .crossJoin(broadcast(base))
          .select(col("variant").as("channel"), col("p_base"), col("p_conv"),
            (col("p_base") - col("p_conv")).as("re"))
        val tot = re.agg(sum(col("re")).as("re_tot"))
        re.crossJoin(broadcast(tot))
          .select(col("channel"),
            col("p_base").as("p_conv_base_ppm"),
            col("p_conv").as("p_conv_removed_ppm"),
            col("re").as("removal_effect_ppm"),
            when(col("re_tot") <= 0, lit(0L))
              .otherwise(expr("(re * 1000000) div re_tot")).as("attribution_ppm"))
          .orderBy(col("channel"))
      },
      Some("""
        WITH ev AS (
          SELECT user_id, ts, event_id, event_type FROM events),
        fp AS (
          SELECT user_id, ts AS pts, event_id AS pid FROM (
            SELECT user_id, ts, event_id,
                   row_number() OVER (PARTITION BY user_id
                     ORDER BY ts, event_id) AS rn
            FROM ev WHERE event_type = 'purchase') WHERE rn = 1),
        j AS (
          SELECT e.user_id, e.ts, e.event_id, e.event_type,
                 fp.pts IS NOT NULL AS converted
          FROM ev e LEFT JOIN fp ON e.user_id = fp.user_id
          WHERE e.event_type <> 'purchase'
            AND (fp.pts IS NULL OR (e.ts, e.event_id) < (fp.pts, fp.pid))),
        seq AS (
          SELECT user_id, event_type, converted,
                 lag(event_type) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) AS prev,
                 lead(event_type) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) AS nxt
          FROM j),
        t1 AS (SELECT 'start' AS f, event_type AS t FROM seq WHERE prev IS NULL),
        t2 AS (SELECT prev AS f, event_type AS t FROM seq WHERE prev IS NOT NULL),
        t3 AS (SELECT event_type AS f,
                      CASE WHEN converted THEN 'conv' ELSE 'null' END AS t
               FROM seq WHERE nxt IS NULL),
        t4 AS (SELECT 'start' AS f, 'conv' AS t FROM fp p
               WHERE NOT EXISTS (SELECT 1 FROM j WHERE j.user_id = p.user_id)),
        cells AS (
          SELECT f, t, COUNT(*) AS cnt FROM (
            SELECT * FROM t1 UNION ALL SELECT * FROM t2
            UNION ALL SELECT * FROM t3 UNION ALL SELECT * FROM t4)
          GROUP BY 1, 2),
        b AS (
          SELECT f, t,
                 (cnt * 1000000) // SUM(cnt) OVER (PARTITION BY f) AS p
          FROM cells),
        variants AS (
          SELECT unnest(['base','view','click','signup','error']) AS variant),
        vc AS (
          SELECT v.variant, b.f,
                 CASE WHEN b.t = v.variant THEN 'null' ELSE b.t END AS t,
                 CAST(SUM(b.p) AS BIGINT) AS p
          FROM b CROSS JOIN variants v
          WHERE b.f <> v.variant GROUP BY 1, 2, 3),
        chain AS (
          SELECT * FROM vc
          UNION ALL
          SELECT variant, u.s, u.s, 1000000::BIGINT
          FROM variants, (SELECT unnest(['conv','null']) AS s) u),
        m2 AS (
          SELECT a.variant, a.f, b.t,
                 CAST(SUM((a.p * b.p) // 1000000) AS BIGINT) AS p
          FROM chain a JOIN chain b
            ON a.variant = b.variant AND a.t = b.f
          GROUP BY 1, 2, 3),
        m4 AS (
          SELECT a.variant, a.f, b.t,
                 CAST(SUM((a.p * b.p) // 1000000) AS BIGINT) AS p
          FROM m2 a JOIN m2 b ON a.variant = b.variant AND a.t = b.f
          GROUP BY 1, 2, 3),
        m8 AS (
          SELECT a.variant, a.f, b.t,
                 CAST(SUM((a.p * b.p) // 1000000) AS BIGINT) AS p
          FROM m4 a JOIN m4 b ON a.variant = b.variant AND a.t = b.f
          GROUP BY 1, 2, 3),
        m16 AS (
          SELECT a.variant, a.f, b.t,
                 CAST(SUM((a.p * b.p) // 1000000) AS BIGINT) AS p
          FROM m8 a JOIN m8 b ON a.variant = b.variant AND a.t = b.f
          GROUP BY 1, 2, 3),
        pconv AS (
          SELECT v.variant, CAST(COALESCE(w.p, 0) AS BIGINT) AS p_conv
          FROM variants v LEFT JOIN
            (SELECT variant, p FROM m16 WHERE f = 'start' AND t = 'conv') w
            ON v.variant = w.variant),
        base AS (SELECT p_conv AS p_base FROM pconv WHERE variant = 'base'),
        re AS (
          SELECT p.variant AS channel, b.p_base, p.p_conv,
                 b.p_base - p.p_conv AS re
          FROM pconv p CROSS JOIN base b WHERE p.variant <> 'base'),
        tot AS (SELECT CAST(SUM(re) AS BIGINT) AS re_tot FROM re)
        SELECT r.channel,
               CAST(r.p_base AS BIGINT) AS p_conv_base_ppm,
               CAST(r.p_conv AS BIGINT) AS p_conv_removed_ppm,
               CAST(r.re AS BIGINT) AS removal_effect_ppm,
               CAST(CASE WHEN t.re_tot <= 0 THEN 0
                         ELSE (r.re * 1000000) // t.re_tot END AS BIGINT)
                 AS attribution_ppm
        FROM re r CROSS JOIN tot t
        ORDER BY r.channel""")),

    // Time-decay attribution — completes the attribution family
    // (last-touch q115, position q180, Markov removal q275): every
    // same-user touch in the 28 days before a purchase earns credit
    // halved per week of age, as EXACT micro-weights (age div 7 → 10⁶,
    // 5·10⁵, 2.5·10⁵, 1.25·10⁵ — powers of two so the lattice is
    // integral, the q250 stance). The touch×purchase pair join is
    // per-user and window-bounded (events per user per 28 days — the
    // q129 candidate shape; at corpus scale the q44 bucketed range join
    // is the same plan with an explicit day bucket). Output: per
    // channel, credited touches, micro-credit mass, and the ppm share
    // of total credit — the numbers a budget reallocation reads.
    QueryDef(
      "q287_time_decay_attribution",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .select(col("user_id"), col("event_id"), col("event_type"),
            unix_micros(col("ts")).as("us"))
        val purchases = ev.where(col("event_type") === "purchase")
          .select(col("user_id"), col("us").as("pus"))
        val touches = ev.where(col("event_type") =!= "purchase")
        val credits = touches.join(purchases, Seq("user_id"))
          .where(col("us") < col("pus") &&
            col("us") >= col("pus") - lit(28L * 86400000000L))
          .withColumn("age_weeks",
            expr("((pus - us) div 86400000000) div 7"))
          .withColumn("w_micro",
            when(col("age_weeks") === 0, 1000000L)
              .when(col("age_weeks") === 1, 500000L)
              .when(col("age_weeks") === 2, 250000L)
              .otherwise(125000L))
        val perChannel = credits.groupBy(col("event_type").as("channel"))
          .agg(count(lit(1)).as("n_credits"),
            sum(col("w_micro")).as("credit_micro"))
        val tot = perChannel.agg(sum(col("credit_micro")).as("tot_micro"))
        perChannel.crossJoin(broadcast(tot))
          .select(col("channel"), col("n_credits"), col("credit_micro"),
            // DECIMAL(38,0) lane: credit_micro is an already-micro-scaled
            // corpus-proportional SUM — ×10⁶ breaks int64 near 10¹³
            // micro-credits (the q279 sf10-twin lesson)
            expr("""cast((cast(credit_micro as decimal(38,0)) * 1000000)
                    div tot_micro as bigint)""").as("share_ppm"))
          .orderBy(col("channel"))
      },
      Some("""
        WITH ev AS (
          SELECT user_id, event_id, event_type, epoch_us(ts) AS us
          FROM events),
        p AS (SELECT user_id, us AS pus FROM ev WHERE event_type = 'purchase'),
        t AS (SELECT * FROM ev WHERE event_type <> 'purchase'),
        credits AS (
          SELECT t.event_type AS channel,
                 CASE ((p.pus - t.us) // 86400000000) // 7
                   WHEN 0 THEN 1000000
                   WHEN 1 THEN 500000
                   WHEN 2 THEN 250000
                   ELSE 125000 END AS w_micro
          FROM t JOIN p ON t.user_id = p.user_id
          WHERE t.us < p.pus AND t.us >= p.pus - 28 * 86400000000),
        per_channel AS (
          SELECT channel, COUNT(*) AS n_credits,
                 CAST(SUM(w_micro) AS BIGINT) AS credit_micro
          FROM credits GROUP BY 1),
        tot AS (SELECT CAST(SUM(credit_micro) AS BIGINT) AS tot_micro
                FROM per_channel)
        SELECT c.channel, c.n_credits, c.credit_micro,
               CAST((CAST(c.credit_micro AS HUGEINT) * 1000000) // t.tot_micro
                 AS BIGINT) AS share_ppm
        FROM per_channel c CROSS JOIN tot t
        ORDER BY c.channel""")),

    // Shapley-value attribution — the cooperative-game capstone of the
    // attribution family (last-touch q115, position q180, time-decay
    // q287, Markov removal-effect q275). Coalition value v(S) = number
    // of converting users whose full pre-purchase touch set ⊆ S, i.e.
    // conversions that still happen when only the channels in S exist.
    // With the 4 touch channels (click/error/signup/view) the game is
    // exact: journeys collapse to a 16-row channel-set mask table, v is
    // a subset-sum over those 16 rows, and the Shapley weights
    // |S|!·(k−1−|S|)!/k! for k=4 make 24·φ_i an INTEGER — the gate
    // carries phi_x24 as exact BIGINT, no factorial floats anywhere.
    // Σφ_i = v(full) − v(∅) (efficiency axiom) and v(∅) counts
    // converters with zero touches, who correctly earn no credit.
    // Scale: ONE pass over events for first purchases, one for touches
    // (shuffle on user_id), a 16-row mask rollup — the coalition
    // enumeration (4×16 weighted marginals) is constant-size arithmetic
    // on broadcast frames regardless of data volume.
    QueryDef(
      "q299_shapley_attribution",
      (s, dir) => {
        import s.implicits._
        val e = Tables.events(s, dir)
        val firstPurch = e.where(col("event_type") === "purchase")
          .groupBy(col("user_id")).agg(min(col("ts")).as("pts"))
        val bits = e
          .where(col("event_type").isin("click", "error", "signup", "view"))
          .select(col("user_id"), col("ts"),
            when(col("event_type") === "click", 1L)
              .when(col("event_type") === "error", 2L)
              .when(col("event_type") === "signup", 4L)
              .otherwise(8L).as("bit"))
          .join(firstPurch, Seq("user_id"))
          .where(col("ts") <= col("pts"))
          .select(col("user_id"), col("bit"))
          .distinct()
          .groupBy(col("user_id")).agg(sum(col("bit")).as("mask"))
        val conv = firstPurch.join(bits, Seq("user_id"), "left")
          .select(coalesce(col("mask"), lit(0L)).as("mask"))
          .groupBy(col("mask")).agg(count(lit(1)).as("n"))
        val subsets = (0L until 16L).toDF("s")
        val v = subsets
          .join(broadcast(conv),
            conv("mask").bitwiseAND(col("s")) === conv("mask"), "left")
          .groupBy(col("s"))
          .agg(coalesce(sum(col("n")), lit(0L)).as("v"))
        val channels = Seq(("click", 1L), ("error", 2L), ("signup", 4L),
          ("view", 8L)).toDF("channel", "bit")
        val vS = v.select(col("s").as("s0"), col("v").as("v0"))
        val vSi = v.select(col("s").as("s1"), col("v").as("v1"))
        val phi = broadcast(channels)
          .join(broadcast(subsets),
            col("s").bitwiseAND(col("bit")) === 0)
          .join(broadcast(vS), col("s0") === col("s"))
          .join(broadcast(vSi), col("s1") === col("s") + col("bit"))
          .select(col("channel"),
            (when(expr("bit_count(s)") === 0, 6L)
              .when(expr("bit_count(s)") === 1, 2L)
              .when(expr("bit_count(s)") === 2, 2L)
              .otherwise(6L) * (col("v1") - col("v0"))).as("term"))
          .groupBy(col("channel")).agg(sum(col("term")).as("phi_x24"))
        val tot = phi.agg(sum(col("phi_x24")).as("t"))
        phi.crossJoin(broadcast(tot))
          .select(col("channel"), col("phi_x24"),
            expr("CAST((phi_x24 * 1000000) div t AS BIGINT)")
              .as("share_ppm"))
          .orderBy(col("channel"))
      },
      Some("""
        WITH fp AS (
          SELECT user_id, MIN(ts) AS pts FROM events
          WHERE event_type = 'purchase' GROUP BY 1),
        tb AS (
          SELECT DISTINCT e.user_id,
                 CAST(CASE e.event_type WHEN 'click' THEN 1
                      WHEN 'error' THEN 2 WHEN 'signup' THEN 4
                      ELSE 8 END AS BIGINT) AS bit
          FROM events e
          JOIN fp ON fp.user_id = e.user_id AND e.ts <= fp.pts
          WHERE e.event_type IN ('click', 'error', 'signup', 'view')),
        masks AS (
          SELECT fp.user_id,
                 COALESCE(CAST(SUM(tb.bit) AS BIGINT), 0) AS mask
          FROM fp LEFT JOIN tb ON tb.user_id = fp.user_id
          GROUP BY 1),
        conv AS (
          SELECT mask, CAST(COUNT(*) AS BIGINT) AS n FROM masks
          GROUP BY 1),
        subsets AS (SELECT CAST(r.range AS BIGINT) AS s FROM range(0, 16) r),
        v AS (
          SELECT su.s, COALESCE(CAST(SUM(c.n) AS BIGINT), 0) AS v
          FROM subsets su
          LEFT JOIN conv c ON (c.mask & su.s) = c.mask
          GROUP BY 1),
        ch AS (
          SELECT * FROM (VALUES
            ('click', CAST(1 AS BIGINT)), ('error', CAST(2 AS BIGINT)),
            ('signup', CAST(4 AS BIGINT)), ('view', CAST(8 AS BIGINT)))
            AS t(channel, bit)),
        marg AS (
          SELECT ch.channel,
                 CAST(CASE bit_count(su.s) WHEN 0 THEN 6 WHEN 1 THEN 2
                      WHEN 2 THEN 2 ELSE 6 END AS BIGINT)
                   * (vi.v - vs.v) AS term
          FROM ch
          JOIN subsets su ON (su.s & ch.bit) = 0
          JOIN v vs ON vs.s = su.s
          JOIN v vi ON vi.s = su.s + ch.bit),
        phi AS (
          SELECT channel, CAST(SUM(term) AS BIGINT) AS phi_x24
          FROM marg GROUP BY 1),
        tot AS (SELECT CAST(SUM(phi_x24) AS BIGINT) AS t FROM phi)
        SELECT p.channel, p.phi_x24,
               CAST((p.phi_x24 * 1000000) // t.t AS BIGINT) AS share_ppm
        FROM phi p CROSS JOIN tot t
        ORDER BY p.channel""")))
}
