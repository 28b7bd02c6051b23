package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.functions.Kernels._
import graft.sources.Tables

/** OLAP-completeness surface: the generator/pivot/grouping-set/unpivot
  * operators every analytics-engine user expects even though the
  * reference's dbt models never spell them (dim_date.sql ships as an
  * empty placeholder — q66 is the model behind it).
  */
object OlapQueries {

  val defs: Seq[QueryDef] = Seq(

    // Source-less date-spine generator — the dim_date the reference
    // stubs out: sequence() → explode, calendar parts, ISO weeks.
    // Cross-engine traps handled: Spark dayofweek is 1=Sunday..7 while
    // DuckDB's is 0=Sunday..6 (offset by one); both weekofyear are ISO.
    QueryDef(
      "q66_date_dim",
      (s, dir) => {
        val spine = s.range(1).select(explode(sequence(
          lit("1995-01-01").cast("date"), lit("1996-12-31").cast("date"),
          expr("interval 1 day"))).as("d"))
        spine.select(col("d"),
            year(col("d")).cast("long").as("y"),
            month(col("d")).cast("long").as("m"),
            dayofmonth(col("d")).cast("long").as("day_of_month"),
            (dayofweek(col("d")) - 1).cast("long").as("dow"),
            weekofyear(col("d")).cast("long").as("iso_week"),
            quarter(col("d")).cast("long").as("q"),
            dayofweek(col("d")).isin(1, 7).as("is_weekend"))
          .orderBy(col("d"))
      },
      Some("""
        SELECT CAST(d AS DATE) AS d,
               CAST(year(d) AS BIGINT) AS y,
               CAST(month(d) AS BIGINT) AS m,
               CAST(day(d) AS BIGINT) AS day_of_month,
               CAST(dayofweek(d) AS BIGINT) AS dow,
               CAST(weekofyear(d) AS BIGINT) AS iso_week,
               CAST(quarter(d) AS BIGINT) AS q,
               dayofweek(d) IN (0, 6) AS is_weekend
        FROM generate_series(DATE '1995-01-01', DATE '1996-12-31', INTERVAL 1 DAY) t(d)
        ORDER BY d""")),

    // PIVOT: status categories become revenue columns. Values are
    // declared explicitly (no extra distinct-scan pass — the 100 TB
    // stance) and each cell is an exact decimal sum.
    QueryDef(
      "q67_pivot",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        o.select(year(col("o_orderdate")).cast("long").as("y"),
            col("o_orderstatus"), dec6(col("o_totalprice")).as("p"))
          .groupBy(col("y")).pivot("o_orderstatus", Seq("F", "O", "P"))
          .agg(moneyOut(sum(col("p"))))
          .orderBy(col("y"))
      },
      Some("""
        SELECT CAST(year(o_orderdate) AS BIGINT) AS y,
               CAST(CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(18,6)) END) AS DECIMAL(38,6)) AS DOUBLE) AS F,
               CAST(CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(18,6)) END) AS DECIMAL(38,6)) AS DOUBLE) AS O,
               CAST(CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(18,6)) END) AS DECIMAL(38,6)) AS DOUBLE) AS P
        FROM orders
        GROUP BY 1
        ORDER BY y""")),

    // ROLLUP grouping sets with grouping_id — subtotal and grand-total
    // rows in one pass (no union of aggregates).
    QueryDef(
      "q68_rollup",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        o.select(year(col("o_orderdate")).cast("long").as("y"),
            col("o_orderstatus").as("status"), dec6(col("o_totalprice")).as("p"))
          .rollup(col("y"), col("status"))
          .agg(count(lit(1)).as("n_orders"),
            moneyOut(sum(col("p"))).as("revenue"),
            grouping_id().cast("long").as("gid"))
          .orderBy(col("gid"), col("y").asc_nulls_first,
            col("status").asc_nulls_first)
      },
      Some("""
        SELECT CAST(year(o_orderdate) AS BIGINT) AS y,
               o_orderstatus AS status,
               COUNT(*) AS n_orders,
               CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS revenue,
               CAST(GROUPING(year(o_orderdate), o_orderstatus) AS BIGINT) AS gid
        FROM orders
        GROUP BY ROLLUP(year(o_orderdate), o_orderstatus)
        ORDER BY gid, y ASC NULLS FIRST, status ASC NULLS FIRST""")),

    // UNPIVOT (melt): wide metric columns → (metric, value) rows.
    QueryDef(
      "q69_unpivot",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        val wide = li.groupBy(col("l_orderkey")).agg(
          moneyOut(sum(dec6(col("l_quantity")))).as("qty"),
          moneyOut(sum(dec6(col("l_extendedprice")))).as("gross"),
          moneyOut(sum((dec6(col("l_extendedprice")) * dec6(col("l_discount")))
            .cast(DecimalType(18, 6)))).as("discount"))
        wide.unpivot(Array(col("l_orderkey")),
            Array(col("qty"), col("gross"), col("discount")),
            "metric", "value")
          .orderBy(col("l_orderkey"), col("metric"))
      },
      Some("""
        WITH wide AS (
          SELECT l_orderkey,
                 CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS qty,
                 CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS gross,
                 CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(l_discount AS DECIMAL(18,6)) AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS discount
          FROM lineitem GROUP BY 1)
        SELECT l_orderkey, metric, value
        FROM (UNPIVOT wide ON qty, gross, discount INTO NAME metric VALUE value)
        ORDER BY l_orderkey, metric""")),

    // RANGE-framed moving window: per-customer trailing-90-day order
    // revenue. The frame is VALUE-based (days-since-epoch), not row-based
    // — prior coverage only exercised row frames. One shuffle on
    // customer_id; the frame scan is a single ordered pass per key.
    QueryDef(
      "q70_range_frame",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val w = Window
          .partitionBy(col("o_custkey"))
          .orderBy(col("day_no"))
          .rangeBetween(-90, 0)
        o.select(col("o_custkey"), col("o_orderkey"),
            datediff(to_date(col("o_orderdate")), lit("1990-01-01").cast("date"))
              .cast("long").as("day_no"),
            dec6(col("o_totalprice")).as("p"))
          .select(col("o_custkey"), col("o_orderkey"), col("day_no"),
            moneyOut(sum(col("p")).over(w)).as("trailing_90d_revenue"),
            count(lit(1)).over(w).as("trailing_90d_orders"))
          .orderBy(col("o_custkey"), col("day_no"), col("o_orderkey"))
      },
      Some("""
        WITH t AS (
          SELECT o_custkey, o_orderkey,
                 CAST(date_diff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS day_no,
                 CAST(o_totalprice AS DECIMAL(18,6)) AS p
          FROM orders)
        SELECT o_custkey, o_orderkey, day_no,
               CAST(CAST(SUM(p) OVER w AS DECIMAL(38,6)) AS DOUBLE) AS trailing_90d_revenue,
               COUNT(*) OVER w AS trailing_90d_orders
        FROM t
        WINDOW w AS (PARTITION BY o_custkey ORDER BY day_no
                     RANGE BETWEEN 90 PRECEDING AND CURRENT ROW)
        ORDER BY o_custkey, day_no, o_orderkey""")),

    // Analytic rank family in one pass: ntile buckets, percent_rank,
    // cume_dist, dense_rank — all over one shared (key, order) sort so
    // the window exchange and sort run once.
    QueryDef(
      "q71_rank_family",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val w = Window
          .partitionBy(col("status"))
          .orderBy(col("p"), col("o_orderkey"))
        o.select(col("o_orderkey"), col("o_orderstatus").as("status"),
            dec6(col("o_totalprice")).as("p"))
          .select(col("o_orderkey"), col("status"), moneyOut(col("p")).as("price"),
            ntile(4).over(w).cast("long").as("quartile"),
            percent_rank().over(w).as("pct_rank"),
            cume_dist().over(w).as("cume"),
            dense_rank().over(w).cast("long").as("drank"))
          .orderBy(col("status"), col("price"), col("o_orderkey"))
      },
      Some("""
        WITH t AS (
          SELECT o_orderkey, o_orderstatus AS status,
                 CAST(o_totalprice AS DECIMAL(18,6)) AS p
          FROM orders)
        SELECT o_orderkey, status,
               CAST(CAST(p AS DECIMAL(38,6)) AS DOUBLE) AS price,
               CAST(ntile(4) OVER w AS BIGINT) AS quartile,
               percent_rank() OVER w AS pct_rank,
               cume_dist() OVER w AS cume,
               CAST(dense_rank() OVER w AS BIGINT) AS drank
        FROM t
        WINDOW w AS (PARTITION BY status ORDER BY p, o_orderkey)
        ORDER BY status, price, o_orderkey""")),

    // LEFT SEMI join — the positive EXISTS twin of q10's anti-join:
    // customers WITH at least one purchase event, no event columns leaked
    // and no row duplication however many events match.
    QueryDef(
      "q73_semi_join",
      (s, dir) => {
        val c  = Tables.customer(s, dir)
        val ev = Tables.events(s, dir).where(col("event_type") === "purchase")
          .select((col("user_id") % 1500 + 1).as("c_custkey"))
        c.join(ev, Seq("c_custkey"), "left_semi")
          .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
          .orderBy(col("c_custkey"))
      },
      Some("""
        SELECT c_custkey, c_name, c_mktsegment
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM events e
                      WHERE e.event_type = 'purchase'
                        AND e.user_id % 1500 + 1 = c.c_custkey)
        ORDER BY c_custkey""")),

    // INTERSECT / EXCEPT set operators (distinct semantics on both
    // engines): segments that both high-balance and recent-buyer
    // customers occupy, and segments exclusive to high-balance.
    QueryDef(
      "q74_set_ops",
      (s, dir) => {
        val c = Tables.customer(s, dir)
        val o = Tables.orders(s, dir)
        val highBal = c.where(col("c_acctbal") > 7500)
          .select(col("c_mktsegment").as("segment"))
        val recent = c.join(
            o.where(col("o_orderdate") >= lit("1998-01-01").cast("timestamp"))
              .select(col("o_custkey").as("c_custkey")).distinct(),
            Seq("c_custkey"))
          .select(col("c_mktsegment").as("segment"))
        highBal.intersect(recent).select(col("segment"), lit("both").as("side"))
          .unionByName(
            highBal.except(recent).select(col("segment"), lit("high_bal_only").as("side")))
          .orderBy(col("side"), col("segment"))
      },
      Some("""
        WITH high_bal AS (
          SELECT c_mktsegment AS segment FROM customer WHERE c_acctbal > 7500),
        recent AS (
          SELECT c.c_mktsegment AS segment
          FROM customer c JOIN (SELECT DISTINCT o_custkey FROM orders
                                WHERE o_orderdate >= TIMESTAMP '1998-01-01') r
            ON r.o_custkey = c.c_custkey)
        SELECT segment, 'both' AS side FROM (SELECT segment FROM high_bal INTERSECT SELECT segment FROM recent)
        UNION ALL
        SELECT segment, 'high_bal_only' AS side FROM (SELECT segment FROM high_bal EXCEPT SELECT segment FROM recent)
        ORDER BY side, segment""")),

    // Time-series gap-fill + LOCF — the monthly-panel completion every
    // revenue/retention analysis needs: each customer's month spine
    // (first..last active month) is generated per customer, missing
    // months fill with exact-decimal zero, and last-observation-
    // carried-forward yields months_since_last_order. Shapes: the spine
    // is sequence()+explode off a per-customer min/max agg (linear in
    // active span, never a global cross join); the LOCF is one
    // per-customer ordered window. Money stays decimal through the agg
    // (double only at the output boundary — the q05 stance).
    QueryDef(
      "q97_monthly_gapfill",
      (s, dir) => {
        val o = Tables.orders(s, dir).select(
          col("o_custkey").as("customer_id"),
          trunc(to_date(col("o_orderdate")), "month").as("month_start"),
          dec6(col("o_totalprice")).as("rev"))
        // No spine join (the q122 rewrite, LOCF edition): every actual
        // month emits its own gap run via lead()+explode — a gap month k
        // months after its base actual has revenue 0 and
        // months_since_last_order = k by construction (every actual
        // month's revenue is > 0, so the base IS the last active month).
        // One hash exchange on customer_id (the aggregate and the lead
        // window both reuse it); the oracle keeps the textbook
        // spine + left-join + ignore-nulls-carry form — same values.
        val byMonth = o.repartition(col("customer_id"))
          .groupBy(col("customer_id"), col("month_start"))
          .agg(money(sum(col("rev"))).as("month_revenue"))
        val w = Window.partitionBy(col("customer_id")).orderBy(col("month_start"))
        byMonth
          .withColumn("g", monthsBetweenCalendar(
            lead(col("month_start"), 1).over(w), col("month_start")))
          .withColumn("k", explode(sequence(lit(0), coalesce(col("g") - 1, lit(0)))))
          .select(col("customer_id"),
            add_months(col("month_start"), col("k")).as("month_start"),
            when(col("k") === 0, moneyOut(col("month_revenue")))
              .otherwise(lit(0.0d)).as("month_revenue"),
            col("k").cast("long").as("months_since_last_order"))
          .orderBy(col("customer_id"), col("month_start"))
      },
      Some("""
        WITH o AS (
          SELECT o_custkey AS customer_id,
                 CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS DATE) AS month_start,
                 CAST(o_totalprice AS DECIMAL(18,6)) AS rev
          FROM orders),
        by_month AS (
          SELECT customer_id, month_start,
                 CAST(SUM(rev) AS DECIMAL(38,6)) AS month_revenue
          FROM o GROUP BY 1, 2),
        span AS (
          SELECT customer_id, MIN(month_start) AS first_m, MAX(month_start) AS last_m
          FROM by_month GROUP BY 1),
        spine AS (
          SELECT customer_id,
                 CAST(unnest(generate_series(first_m::TIMESTAMP, last_m::TIMESTAMP,
                                             INTERVAL 1 MONTH)) AS DATE) AS month_start
          FROM span),
        filled AS (
          SELECT s.customer_id, s.month_start,
                 COALESCE(b.month_revenue, CAST(0 AS DECIMAL(38,6))) AS month_revenue,
                 CASE WHEN COALESCE(b.month_revenue, CAST(0 AS DECIMAL(38,6))) > 0
                      THEN s.month_start END AS active_month
          FROM spine s LEFT JOIN by_month b USING (customer_id, month_start)),
        locf AS (
          SELECT customer_id, month_start, month_revenue,
                 last_value(active_month IGNORE NULLS)
                   OVER (PARTITION BY customer_id ORDER BY month_start
                         ROWS UNBOUNDED PRECEDING) AS last_active
          FROM filled)
        SELECT customer_id, month_start,
               CAST(month_revenue AS DOUBLE) AS month_revenue,
               CAST((year(month_start) - year(last_active)) * 12
                    + (month(month_start) - month(last_active)) AS BIGINT)
                 AS months_since_last_order
        FROM locf
        ORDER BY customer_id, month_start""")),

    // WINDOWED ordered conversion funnel over the event stream —
    // signup → view → click → purchase, each step's earliest occurrence
    // strictly after the previous step's chosen event AND within a
    // 3-day conversion window (unordered or unwindowed funnels
    // overcount; 3 days yields 150→105→79→55 on this corpus). Four
    // chained conditional min-aggregates, all keyed on user_id, so
    // every shuffle lands on the same partitioning (exchange reuse —
    // one real exchange family, not four). Gate pins per-step user
    // counts AND user-id checksums.
    QueryDef(
      "q98_event_funnel",
      (s, dir) => {
        val e = Tables.events(s, dir)
          .select(col("user_id"), col("event_type"), col("ts"))
        def step(prev: org.apache.spark.sql.DataFrame, et: String, out: String) = {
          val pcol = prev.columns.last
          e.where(col("event_type") === et)
            .join(prev, Seq("user_id"))
            .where(col("ts") > col(pcol) &&
              col("ts") <= col(pcol) + expr("interval 3 days"))
            .groupBy(col("user_id")).agg(min(col("ts")).as(out))
        }
        val s1 = e.where(col("event_type") === "signup")
          .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
        val s2 = step(s1, "view", "t2")
        val s3 = step(s2, "click", "t3")
        val s4 = step(s3, "purchase", "t4")
        def summarize(df: org.apache.spark.sql.DataFrame, name: String) =
          df.agg(count(lit(1)).as("n_users"), sum(col("user_id")).as("user_id_sum"))
            .select(lit(name).as("step"), col("n_users"), col("user_id_sum"))
        summarize(s1, "1_signup")
          .unionAll(summarize(s2, "2_view"))
          .unionAll(summarize(s3, "3_click"))
          .unionAll(summarize(s4, "4_purchase"))
          .orderBy(col("step"))
      },
      Some("""
        WITH e AS (SELECT user_id, event_type, ts FROM events),
        s1 AS (
          SELECT user_id, MIN(ts) AS t1 FROM e
          WHERE event_type = 'signup' GROUP BY 1),
        s2 AS (
          SELECT e.user_id, MIN(e.ts) AS t2
          FROM e JOIN s1 USING (user_id)
          WHERE e.event_type = 'view' AND e.ts > s1.t1
            AND e.ts <= s1.t1 + INTERVAL 3 DAY GROUP BY 1),
        s3 AS (
          SELECT e.user_id, MIN(e.ts) AS t3
          FROM e JOIN s2 USING (user_id)
          WHERE e.event_type = 'click' AND e.ts > s2.t2
            AND e.ts <= s2.t2 + INTERVAL 3 DAY GROUP BY 1),
        s4 AS (
          SELECT e.user_id, MIN(e.ts) AS t4
          FROM e JOIN s3 USING (user_id)
          WHERE e.event_type = 'purchase' AND e.ts > s3.t3
            AND e.ts <= s3.t3 + INTERVAL 3 DAY GROUP BY 1)
        SELECT '1_signup' AS step, COUNT(*) AS n_users,
               CAST(SUM(user_id) AS BIGINT) AS user_id_sum FROM s1
        UNION ALL
        SELECT '2_view', COUNT(*), CAST(SUM(user_id) AS BIGINT) FROM s2
        UNION ALL
        SELECT '3_click', COUNT(*), CAST(SUM(user_id) AS BIGINT) FROM s3
        UNION ALL
        SELECT '4_purchase', COUNT(*), CAST(SUM(user_id) AS BIGINT) FROM s4
        ORDER BY step""")),

    // Arbitrary GROUPING SETS (not a rollup/cube lattice): the exact
    // combination list ((seg,pri), (seg,year), (year), ()) — derivable
    // from neither q68's ROLLUP nor q123's CUBE. One Expand (4 replicas)
    // + one partial agg, the documented grouping-set price. Set
    // membership is tagged with engine-neutral COALESCE labels instead
    // of grouping_id() (whose bit order differs across engines); the
    // dimensions are never null in the data so the labels are total.
    QueryDef(
      "q161_grouping_sets",
      (s, dir) => {
        Tables.orders(s, dir).createOrReplaceTempView("g_q161_orders")
        Tables.customer(s, dir).createOrReplaceTempView("g_q161_cust")
        s.sql("""
          SELECT COALESCE(c_mktsegment, 'ALL') AS seg,
                 COALESCE(o_orderpriority, 'ALL') AS pri,
                 COALESCE(CAST(year(o_orderdate) AS STRING), 'ALL') AS yr,
                 CAST(COUNT(*) AS BIGINT) AS n_orders,
                 CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
                   AS BIGINT) AS revenue_cents
          FROM g_q161_orders o JOIN g_q161_cust c ON o.o_custkey = c.c_custkey
          GROUP BY GROUPING SETS (
            (c_mktsegment, o_orderpriority),
            (c_mktsegment, year(o_orderdate)),
            (year(o_orderdate)),
            ())
          ORDER BY seg, pri, yr""")
      },
      Some("""
        SELECT COALESCE(c_mktsegment, 'ALL') AS seg,
               COALESCE(o_orderpriority, 'ALL') AS pri,
               COALESCE(CAST(year(o_orderdate) AS VARCHAR), 'ALL') AS yr,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
                 AS BIGINT) AS revenue_cents
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY GROUPING SETS (
          (c_mktsegment, o_orderpriority),
          (c_mktsegment, year(o_orderdate)),
          (year(o_orderdate)),
          ())
        ORDER BY seg, pri, yr""")),

    // Array / higher-order-function surface — collect each order's line
    // amounts into a SORTED array (array_sort over collect_list: the
    // only deterministic form; bare collect_list order is shuffle-
    // dependent), then drive the HOF quartet over it: transform (VAT
    // uplift per element), filter (elements above the order mean),
    // aggregate (sequential sum fold from 0), zip_with (pairing each
    // element with its VAT twin). Arrays stay BOUNDED (order width ≤ 7
    // lines) and everything leaves as scalars, so the known HOF
    // CodegenFallback cost applies to ≤7-element frames — the
    // documented reason HOFs are banned from corpus-scale hot paths
    // (q30/q46 precedent) while still part of the API surface a
    // migration exercises. Oracle mirrors with DuckDB's list_* twins.
    QueryDef(
      "q249_array_hof_surface",
      (s, dir) => {
        val l = Tables.lineitem(s, dir)
          .select(col("l_orderkey").as("ok"),
            (col("l_extendedprice").cast(DecimalType(18, 2)) * 100)
              .cast("long").as("cents"))
        val arr = l.groupBy(col("ok"))
          .agg(array_sort(collect_list(col("cents"))).as("xs"))
        val derived = arr.select(col("ok"),
          size(col("xs")).cast("long").as("n_lines"),
          expr("aggregate(xs, 0L, (acc, x) -> acc + x)").as("total_cents"),
          expr("aggregate(transform(xs, x -> (x * 120) div 100), 0L, (acc, x) -> acc + x)")
            .as("vat_cents"),
          expr("size(filter(xs, x -> x * CAST(size(xs) AS BIGINT) > aggregate(xs, 0L, (acc, y) -> acc + y)))")
            .cast("long").as("n_above_mean"),
          expr("aggregate(zip_with(xs, transform(xs, x -> (x * 120) div 100), (a, b) -> b - a), 0L, (acc, x) -> acc + x)")
            .as("vat_delta_cents"))
        derived.groupBy(col("n_lines"))
          .agg(count(lit(1)).as("n_orders"),
            sum(col("total_cents")).as("sum_cents"),
            sum(col("vat_cents")).as("sum_vat_cents"),
            sum(col("n_above_mean")).as("sum_above_mean"),
            sum(col("vat_delta_cents")).as("sum_vat_delta"))
          .orderBy(col("n_lines"))
      },
      Some("""
        WITH l AS (
          SELECT l_orderkey AS ok,
                 CAST(CAST(l_extendedprice AS DECIMAL(18,2))*100 AS BIGINT) AS cents
          FROM lineitem),
        arr AS (
          SELECT ok, list_sort(list(cents)) AS xs FROM l GROUP BY ok),
        derived AS (
          SELECT ok,
                 CAST(len(xs) AS BIGINT) AS n_lines,
                 CAST(list_reduce(list_prepend(0, xs), (acc, x) -> acc + x) AS BIGINT)
                   AS total_cents,
                 CAST(list_reduce(list_prepend(0, list_transform(xs, x -> (x * 120) // 100)),
                                  (acc, x) -> acc + x) AS BIGINT) AS vat_cents,
                 CAST(len(list_filter(xs, x -> x * len(xs) >
                        list_reduce(list_prepend(0, xs), (acc, y) -> acc + y)))
                   AS BIGINT) AS n_above_mean,
                 -- zip_with(a, b, (x,y) -> y - x) summed == Σb - Σa exactly in
                 -- integers; the oracle pins the VALUE of the Spark-side zip
                 CAST(list_reduce(list_prepend(0, list_transform(xs, x -> (x * 120) // 100)),
                                  (acc, x) -> acc + x)
                      - list_reduce(list_prepend(0, xs), (acc, x) -> acc + x)
                   AS BIGINT) AS vat_delta_cents
          FROM arr)
        SELECT n_lines,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(total_cents) AS BIGINT) AS sum_cents,
               CAST(SUM(vat_cents) AS BIGINT) AS sum_vat_cents,
               CAST(SUM(n_above_mean) AS BIGINT) AS sum_above_mean,
               CAST(SUM(vat_delta_cents) AS BIGINT) AS sum_vat_delta
        FROM derived
        GROUP BY n_lines
        ORDER BY n_lines""")))
}
