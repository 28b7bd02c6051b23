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
        ORDER BY side, segment""")))
}
