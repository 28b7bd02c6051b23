package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Kernels._
import graft.sources.Tables

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
        ORDER BY n_users DESC, path""")))
}
