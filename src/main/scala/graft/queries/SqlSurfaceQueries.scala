package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Round-5 SQL-surface completeness — the statement forms a user
  * migrating from a warehouse SQL dialect expects beyond operators the
  * DataFrame modules already gate:
  *
  *  - q155: WITH RECURSIVE (Spark 4's UnionLoopExec) — iterative
  *    hierarchy traversal in ONE declarative statement, gated against
  *    DuckDB's recursive CTE on an identical synthetic org tree.
  *  - q156: correlated LATERAL subquery with ORDER BY + LIMIT (top-n
  *    per group as a join, decorrelated by Catalyst into a window —
  *    the SQL twin of the q132 top-k pattern).
  *  - q157: sliding 7-day distinct users. COUNT(DISTINCT) over a RANGE
  *    window doesn't exist in either engine; the scalable form is the
  *    bounded 7x fan-out (each (day,user) contributes to days d..d+6)
  *    + equi-shuffle distinct — linear at 100 TB where a self-join on
  *    day BETWEEN d-6 AND d would plan as a nested loop.
  */
object SqlSurfaceQueries {

  val defs: Seq[QueryDef] = Seq(

    // Recursive CTE: synthetic org tree over customer (parent =
    // custkey div 10 — total, unique-parent, always-present for the
    // contiguous TPC-H key space; roots are custkey < 10). Per-depth
    // rollup so a wrong frontier at ANY level breaks the checksum.
    // Depth is log10(n) — the recursion is O(depth) joins, each a
    // plain equi-shuffle; Spark's UnionLoop re-plans each step on the
    // frontier only (same stance as the large-star/small-star CC loop).
    QueryDef(
      "q155_recursive_hierarchy",
      (s, dir) => {
        Tables.customer(s, dir).select(col("c_custkey"))
          .createOrReplaceTempView("g_q155_cust")
        s.sql("""
          WITH RECURSIVE walk AS (
            SELECT c_custkey AS node, CAST(0 AS BIGINT) AS depth
            FROM g_q155_cust WHERE c_custkey < 10
            UNION ALL
            SELECT c.c_custkey AS node, w.depth + CAST(1 AS BIGINT) AS depth
            FROM g_q155_cust c JOIN walk w ON c.c_custkey DIV 10 = w.node
            WHERE c.c_custkey >= 10)
          SELECT depth, CAST(COUNT(*) AS BIGINT) AS n_nodes,
                 CAST(SUM(node) AS BIGINT) AS node_sum
          FROM walk GROUP BY depth ORDER BY depth""")
      },
      Some("""
        WITH RECURSIVE walk AS (
          SELECT c_custkey AS node, CAST(0 AS BIGINT) AS depth
          FROM customer WHERE c_custkey < 10
          UNION ALL
          SELECT c.c_custkey AS node, w.depth + CAST(1 AS BIGINT) AS depth
          FROM customer c JOIN walk w ON c.c_custkey // 10 = w.node
          WHERE c.c_custkey >= 10)
        SELECT depth, CAST(COUNT(*) AS BIGINT) AS n_nodes,
               CAST(SUM(node) AS BIGINT) AS node_sum
        FROM walk GROUP BY depth ORDER BY depth""")),

    // Correlated LATERAL with ORDER BY + LIMIT: top-2 customers by
    // balance per nation. Catalyst decorrelates the limit into a
    // per-group window, so the plan is one shuffle on nationkey — the
    // lateral form never executes per-row. Balance goes through exact
    // decimal cents so the gate has no double ordering ambiguity
    // (ties broken by name on both sides).
    QueryDef(
      "q156_lateral_topn",
      (s, dir) => {
        Tables.customer(s, dir).createOrReplaceTempView("g_q156_cust")
        Tables.nation(s, dir).createOrReplaceTempView("g_q156_nation")
        s.sql("""
          SELECT n.n_name, t.c_name,
                 CAST(CAST(t.c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS acctbal_cents
          FROM g_q156_nation n
          JOIN LATERAL (
            SELECT c_name, c_acctbal FROM g_q156_cust
            WHERE c_nationkey = n.n_nationkey
            ORDER BY c_acctbal DESC, c_name LIMIT 2) t
          ORDER BY n.n_name, acctbal_cents DESC, t.c_name""")
      },
      Some("""
        SELECT n.n_name, t.c_name,
               CAST(CAST(t.c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
                 AS acctbal_cents
        FROM nation n
        JOIN LATERAL (
          SELECT c_name, c_acctbal FROM customer
          WHERE c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_name LIMIT 2) t ON true
        ORDER BY n.n_name, acctbal_cents DESC, t.c_name""")),

    // Sliding 7-day distinct actives per observed day: dedup to
    // (day, user), fan each pair out to the 7 trailing windows it
    // serves, keep only observed days, count distinct per day. All
    // shuffles are equi-hash on day; the fan-out is a constant 7x of
    // the DEDUPED pairs (not raw events) — the standard rolling-MAU
    // shape at any scale.
    QueryDef(
      "q157_sliding_distinct",
      (s, dir) => {
        val du = Tables.events(s, dir)
          .select(to_date(col("ts")).as("d"), col("user_id")).distinct()
        val spine = du.select(col("d").as("day")).distinct()
        val fan = du.select(
          explode(sequence(col("d"), date_add(col("d"), 6))).as("day"),
          col("user_id"))
        fan.join(spine, Seq("day"))
          .groupBy(col("day"))
          .agg(countDistinct(col("user_id")).as("n_active_7d"))
          .orderBy(col("day"))
      },
      Some("""
        WITH du AS (
          SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events),
        sp AS (SELECT DISTINCT d AS day FROM du),
        fan AS (
          SELECT d + CAST(t.x AS INTEGER) AS day, user_id
          FROM du, range(0, 7) t(x))
        SELECT day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_active_7d
        FROM fan JOIN sp USING (day)
        GROUP BY day ORDER BY day""")),

    // Correlated-subquery surface: EXISTS, NOT EXISTS, a correlated
    // scalar COUNT and a correlated filtered scalar SUM in one
    // statement, run as SQL TEXT — gating Catalyst's decorrelation
    // (RewriteCorrelatedScalarSubquery + RewritePredicateSubquery turn
    // all four into joins; nothing executes per-row). The oracle runs
    // the same ANSI text, so the gate pins SEMANTICS (NULL scalar
    // subqueries, empty-group sums) across two independent
    // decorrelation engines. Scale: each subquery decorrelates to an
    // aggregate/semi/anti hash join on o_custkey — the plan a hand
    // optimizer would write; no nested-loop anywhere.
    QueryDef(
      "q211_correlated_subqueries",
      (s, dir) => {
        Tables.customer(s, dir).createOrReplaceTempView("cust_cs")
        Tables.orders(s, dir).createOrReplaceTempView("ord_cs")
        s.sql("""
          SELECT c.c_custkey,
                 (SELECT COUNT(*) FROM ord_cs o
                   WHERE o.o_custkey = c.c_custkey) AS n_orders,
                 (SELECT CAST(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,6)))
                          AS DECIMAL(38,6)) AS DOUBLE)
                    FROM ord_cs o
                   WHERE o.o_custkey = c.c_custkey
                     AND o.o_orderstatus = 'F') AS f_total
          FROM cust_cs c
          WHERE EXISTS (SELECT 1 FROM ord_cs o
                         WHERE o.o_custkey = c.c_custkey
                           AND o.o_totalprice > 150000)
            AND NOT EXISTS (SELECT 1 FROM ord_cs o
                             WHERE o.o_custkey = c.c_custkey
                               AND o.o_orderstatus = 'P')
          ORDER BY c.c_custkey""")
      },
      Some("""
        SELECT c.c_custkey,
               (SELECT COUNT(*) FROM orders o
                 WHERE o.o_custkey = c.c_custkey) AS n_orders,
               (SELECT CAST(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,6)))
                        AS DECIMAL(38,6)) AS DOUBLE)
                  FROM orders o
                 WHERE o.o_custkey = c.c_custkey
                   AND o.o_orderstatus = 'F') AS f_total
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                       WHERE o.o_custkey = c.c_custkey
                         AND o.o_totalprice > 150000)
          AND NOT EXISTS (SELECT 1 FROM orders o
                           WHERE o.o_custkey = c.c_custkey
                             AND o.o_orderstatus = 'P')
        ORDER BY c.c_custkey""")),

    // DISTINCT aggregate over a running window — COUNT(DISTINCT x) OVER
    // (... ROWS UNBOUNDED PRECEDING) is unsupported in both engines, so
    // this gates the standard rewrite: flag each row that is the FIRST
    // occurrence of its (key, value) pair (row_number over the pair,
    // ordered by the running window's own order), then a plain running
    // SUM of flags — an exact running distinct count with two windows
    // sharing ONE user_id exchange (both cluster on the partition key;
    // the subset rule dedups the second shuffle). Emitted per user: the
    // breadth trajectory summary — final distinct event-type count and
    // the epoch-µs at which breadth 3 was first reached (-1 = never).
    // At 100 TB this replaces a quadratic recompute-per-prefix with one
    // linear pass; the flag trick is exact, unlike sketch-based
    // running distincts.
    QueryDef(
      "q220_running_distinct",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val ev = Tables.events(s, dir)
          .select(col("user_id"), col("event_type"), col("event_id"),
            unix_micros(col("ts")).as("tus"))
        val byTime = Window.partitionBy(col("user_id"))
          .orderBy(col("tus"), col("event_id"))
        val byPair = Window.partitionBy(col("user_id"), col("event_type"))
          .orderBy(col("tus"), col("event_id"))
        val flagged = ev.withColumn("first_seen",
          when(row_number().over(byPair) === 1, 1L).otherwise(0L))
        val run = flagged.withColumn("run_distinct",
          sum(col("first_seen")).over(
            byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        run.groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_events"),
            max(col("run_distinct")).as("n_distinct_types"),
            coalesce(min(when(col("run_distinct") === 3, col("tus"))), lit(-1L))
              .as("breadth3_at_us"))
          .orderBy(col("user_id"))
      },
      Some("""
        WITH ev AS (
          SELECT user_id, event_type, event_id, epoch_us(ts) AS tus
          FROM events),
        flagged AS (
          SELECT user_id, tus, event_id,
                 CASE WHEN row_number() OVER (
                        PARTITION BY user_id, event_type
                        ORDER BY tus, event_id) = 1
                      THEN 1 ELSE 0 END AS first_seen
          FROM ev),
        run AS (
          SELECT user_id, tus,
                 SUM(first_seen) OVER (PARTITION BY user_id
                   ORDER BY tus, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS run_distinct
          FROM flagged)
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(MAX(run_distinct) AS BIGINT) AS n_distinct_types,
               CAST(COALESCE(MIN(CASE WHEN run_distinct = 3 THEN tus END), -1)
                    AS BIGINT) AS breadth3_at_us
        FROM run
        GROUP BY user_id
        ORDER BY user_id""")),

    // LISTAGG — the SQL:2016 ordered-set string aggregate, native in
    // Spark 4 (ListAgg with WITHIN GROUP) and gated here against
    // DuckDB's string_agg(... ORDER BY ...): per order priority, the
    // top-3 order keys by price as a CSV. Determinism demands a TOTAL
    // within-group order (price ties broken by key — the q95/q176
    // contract); the top-3 cut is a rank window sharing the same sort.
    // The aggregate's scale story is the cut, not the concat: LISTAGG
    // over an unbounded group is an anti-pattern (unbounded row), so
    // the operator composes rank-prune → bounded ordered concat.
    QueryDef(
      "q231_listagg",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val cents = Tables.orders(s, dir)
          .select(col("o_orderpriority").as("priority"),
            col("o_orderkey").as("k"),
            (col("o_totalprice")
              .cast(org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
              .cast("long").as("cents"))
        val w = Window.partitionBy(col("priority"))
          .orderBy(col("cents").desc, col("k"))
        cents.withColumn("rn", row_number().over(w)).where(col("rn") <= 3)
          .groupBy(col("priority"))
          .agg(
            expr("listagg(cast(k as string), ',') " +
              "WITHIN GROUP (ORDER BY cents DESC, k)").as("top3_keys"),
            sum(col("cents")).as("top3_cents"))
          .orderBy(col("priority"))
      },
      Some("""
        WITH cents AS (
          SELECT o_orderpriority AS priority, o_orderkey AS k,
                 CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS cents
          FROM orders),
        ranked AS (
          SELECT priority, k, cents,
                 row_number() OVER (PARTITION BY priority
                   ORDER BY cents DESC, k) AS rn
          FROM cents)
        SELECT priority,
               string_agg(CAST(k AS VARCHAR), ',' ORDER BY cents DESC, k)
                 AS top3_keys,
               CAST(SUM(cents) AS BIGINT) AS top3_cents
        FROM ranked WHERE rn <= 3
        GROUP BY priority
        ORDER BY priority""")),

    // Window-function surface completeness — the navigation functions a
    // SQL migration exercises beyond the rank/frame families already
    // gated (q70/q71/q115/q132): lag WITH DEFAULT (no COALESCE wrapper),
    // lead with a string default, nth_value over the FULL partition
    // frame, and IGNORE NULLS first_value (first fulfilled order's
    // value — the LOCF primitive in its window form). All four ride ONE
    // customer exchange and the same (date, key) total order; frames
    // are spelled ROWS UNBOUNDED..UNBOUNDED explicitly on both engines
    // because the default ORDER BY frame (RANGE ..CURRENT ROW) would
    // make nth_value/first_value prefix-dependent. Output folds the
    // per-row navigation values into per-status checksums.
    QueryDef(
      "q244_window_surface",
      (s, dir) => {
        val o = Tables.orders(s, dir).select(col("o_custkey"),
          col("o_orderkey"), col("o_orderdate"), col("o_orderstatus"),
          (col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(18, 2))
            * 100).cast("long").as("cents"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        val wFull = w.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.unboundedFollowing)
        val derived = o
          .withColumn("prev_cents", lag(col("cents"), 1, 0L).over(w))
          .withColumn("next_status", lead(col("o_orderstatus"), 1, "NONE").over(w))
          .withColumn("second_cents",
            coalesce(nth_value(col("cents"), 2).over(wFull), lit(0L)))
          .withColumn("first_f_cents",
            coalesce(first_value(
              when(col("o_orderstatus") === "F", col("cents")), lit(true)).over(wFull),
              lit(0L)))
        derived.groupBy(col("o_orderstatus").as("status"))
          .agg(count(lit(1)).as("n_rows"),
            sum(col("prev_cents")).as("sum_prev_cents"),
            sum(when(col("next_status") === "NONE", 1L).otherwise(0L))
              .as("n_last_in_seq"),
            sum(col("second_cents")).as("sum_second_cents"),
            sum(col("first_f_cents")).as("sum_first_f_cents"))
          .orderBy(col("status"))
      },
      Some("""
        WITH o AS (
          SELECT o_custkey, o_orderkey, o_orderdate, o_orderstatus,
                 CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT) AS cents
          FROM orders),
        derived AS (
          SELECT o_orderstatus,
                 lag(cents, 1, 0) OVER w AS prev_cents,
                 lead(o_orderstatus, 1, 'NONE') OVER w AS next_status,
                 COALESCE(nth_value(cents, 2) OVER wf, 0) AS second_cents,
                 COALESCE(first_value(CASE WHEN o_orderstatus = 'F' THEN cents END
                                      IGNORE NULLS) OVER wf, 0) AS first_f_cents
          FROM o
          WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
                 wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
        SELECT o_orderstatus AS status,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(prev_cents) AS BIGINT) AS sum_prev_cents,
               CAST(SUM(CASE WHEN next_status = 'NONE' THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_last_in_seq,
               CAST(SUM(second_cents) AS BIGINT) AS sum_second_cents,
               CAST(SUM(first_f_cents) AS BIGINT) AS sum_first_f_cents
        FROM derived
        GROUP BY 1
        ORDER BY status""")),

    // GROUP BY ALL / ORDER BY ALL — the modern-dialect sugar (Spark 3.4+
    // / DuckDB both support it) a migrating analyst's saved queries are
    // full of: every non-aggregate select item becomes a grouping key,
    // and ORDER BY ALL totalizes the output order. Run as SQL TEXT on
    // both engines so the gate pins that the RESOLUTION RULES agree
    // (which items are grouping keys, and the all-columns sort order) —
    // not just the aggregate values.
    QueryDef(
      "q258_group_by_all",
      (s, dir) => {
        Tables.orders(s, dir).createOrReplaceTempView("g_q258_orders")
        s.sql("""
          SELECT o_orderstatus,
                 o_orderpriority,
                 CAST(year(o_orderdate) AS BIGINT) AS yr,
                 CAST(COUNT(*) AS BIGINT) AS n_orders,
                 CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
                   AS BIGINT) AS rev_cents
          FROM g_q258_orders
          GROUP BY ALL
          ORDER BY ALL""")
      },
      Some("""
        SELECT o_orderstatus,
               o_orderpriority,
               CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) AS yr,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
                 AS BIGINT) AS rev_cents
        FROM orders
        GROUP BY ALL
        ORDER BY ALL""")),

    // WITH RECURSIVE — the declarative-recursion surface Spark gained in
    // 4.x (Catalyst UnionLoop): exact ascending-path counting over the
    // co-purchase DAG, per hop depth. Edges = distinct same-order part
    // pairs (sampled part families), DIRECTED by key order so the graph
    // is acyclic and UNION ALL recursion terminates by construction (the
    // lvl < 3 cap bounds it independently); path multiplicity is the
    // POINT — UNION ALL recursion counts distinct paths, not reachable
    // nodes, which no closed-form rewrite (q255's prefix trick) can
    // express over an irregular graph. Both engines run the literally
    // identical recursion and must agree on every path count.
    //
    // Scale: recursion depth is a constant (3); each step is one
    // equi-join frontier × edges — the same shape as the q108/q233
    // hand-rolled iterative loops, but planned by the engine. Edge
    // sampling (part families ≡ 0 mod 100) keeps fanout^depth bounded;
    // the frontier never leaves the executors.
    QueryDef(
      "q267_recursive_cte",
      (s, dir) => {
        Tables.lineitem(s, dir).createOrReplaceTempView("g_q267_li")
        s.sql("""
          WITH RECURSIVE
          sel AS (
            SELECT l_orderkey AS ok, l_partkey AS pk
            FROM g_q267_li WHERE l_partkey % 100 = 0),
          edges AS (
            SELECT DISTINCT a.pk AS src, b.pk AS dst
            FROM sel a JOIN sel b ON a.ok = b.ok AND a.pk < b.pk),
          paths(node, lvl) AS (
            SELECT DISTINCT pk, 0 FROM sel WHERE pk % 2000 = 0
            UNION ALL
            SELECT e.dst, p.lvl + 1
            FROM paths p JOIN edges e ON e.src = p.node
            WHERE p.lvl < 3)
          SELECT CAST(lvl AS BIGINT) AS lvl,
                 CAST(COUNT(*) AS BIGINT) AS n_paths,
                 CAST(SUM(node) AS BIGINT) AS node_checksum
          FROM paths
          WHERE lvl >= 1
          GROUP BY lvl
          ORDER BY lvl""")
      },
      Some("""
        WITH RECURSIVE
        sel AS (
          SELECT l_orderkey AS ok, l_partkey AS pk
          FROM lineitem WHERE l_partkey % 100 = 0),
        edges AS (
          SELECT DISTINCT a.pk AS src, b.pk AS dst
          FROM sel a JOIN sel b ON a.ok = b.ok AND a.pk < b.pk),
        paths(node, lvl) AS (
          SELECT DISTINCT pk, 0 FROM sel WHERE pk % 2000 = 0
          UNION ALL
          SELECT e.dst, p.lvl + 1
          FROM paths p JOIN edges e ON e.src = p.node
          WHERE p.lvl < 3)
        SELECT CAST(lvl AS BIGINT) AS lvl,
               CAST(COUNT(*) AS BIGINT) AS n_paths,
               CAST(SUM(node) AS BIGINT) AS node_checksum
        FROM paths
        WHERE lvl >= 1
        GROUP BY lvl
        ORDER BY lvl""")),

    // MAP-type function surface (the q249 array-HOF companion): monthly
    // revenue per customer materialized as map<month, cents> via
    // map_from_entries over a SORTED entry array (collect_list order is
    // partition-dependent — the sort is what makes the map deterministic),
    // then the map algebra: map_zip_with (key-union YoY delta),
    // map_filter (growth months), map_values + aggregate (delta sum).
    // The oracle never builds a map — it proves the same numbers from
    // plain FULL-key-union group-bys, pinning the map ops' semantics
    // (union keys, null for absent, filter on value) rather than their
    // representation. Customers restricted to activity in BOTH years so
    // no empty-map typing edge cases leak into the gate. Scale: two
    // partial aggs + one equi-join on customer; maps are ≤12 entries.
    QueryDef(
      "q280_map_surface",
      (s, dir) => {
        val o = Tables.orders(s, dir)
          .select(col("o_custkey").as("ck"), year(col("o_orderdate")).as("yr"),
            date_format(col("o_orderdate"), "yyyy-MM").as("mon"),
            (col("o_totalprice")
              .cast(org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
              .cast("long").as("cents"))
        def mapped(y: Int, name: String) = o.where(col("yr") === y)
          .groupBy(col("ck"), col("mon")).agg(sum(col("cents")).as("cents"))
          .groupBy(col("ck"))
          .agg(map_from_entries(
            array_sort(collect_list(struct(col("mon"), col("cents")))))
            .as(name))
        val joined = mapped(1996, "m96").join(mapped(1997, "m97"), Seq("ck"))
          .withColumn("delta",
            expr("map_zip_with(m96, m97, (k, a, b) -> " +
              "coalesce(b, CAST(0 AS BIGINT)) - coalesce(a, CAST(0 AS BIGINT)))"))
          .withColumn("grown", expr("map_filter(delta, (k, v) -> v > 0)"))
        joined.select(col("ck"),
            size(col("m96")).cast("long").as("n_months_96"),
            size(col("m97")).cast("long").as("n_months_97"),
            size(col("delta")).cast("long").as("n_union_months"),
            size(col("grown")).cast("long").as("n_grown_months"),
            expr("aggregate(map_values(grown), CAST(0 AS BIGINT), " +
              "(acc, v) -> acc + v)").as("growth_cents"))
          .orderBy(col("ck"))
      },
      Some("""
        WITH o AS (
          SELECT o_custkey AS ck, year(o_orderdate) AS yr,
                 strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS mon,
                 CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT) AS cents
          FROM orders WHERE year(o_orderdate) IN (1996, 1997)),
        pm AS (SELECT ck, yr, mon, CAST(SUM(cents) AS BIGINT) AS cents
               FROM o GROUP BY 1, 2, 3),
        m96 AS (SELECT ck, mon, cents FROM pm WHERE yr = 1996),
        m97 AS (SELECT ck, mon, cents FROM pm WHERE yr = 1997),
        both_yrs AS (
          SELECT a.ck FROM (SELECT DISTINCT ck FROM m96) a
          JOIN (SELECT DISTINCT ck FROM m97) b ON a.ck = b.ck),
        u AS (
          SELECT COALESCE(a.ck, b.ck) AS ck, COALESCE(a.mon, b.mon) AS mon,
                 a.cents AS c96, b.cents AS c97
          FROM m96 a FULL OUTER JOIN m97 b
            ON a.ck = b.ck AND a.mon = b.mon
          WHERE COALESCE(a.ck, b.ck) IN (SELECT ck FROM both_yrs))
        SELECT ck,
               CAST(COUNT(c96) AS BIGINT) AS n_months_96,
               CAST(COUNT(c97) AS BIGINT) AS n_months_97,
               COUNT(*) AS n_union_months,
               CAST(SUM(CASE WHEN COALESCE(c97, 0) - COALESCE(c96, 0) > 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_grown_months,
               CAST(SUM(CASE WHEN COALESCE(c97, 0) - COALESCE(c96, 0) > 0
                             THEN COALESCE(c97, 0) - COALESCE(c96, 0)
                             ELSE 0 END) AS BIGINT) AS growth_cents
        FROM u
        GROUP BY ck
        ORDER BY ck""")))
}
