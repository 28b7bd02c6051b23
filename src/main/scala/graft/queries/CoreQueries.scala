package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.functions.Kernels._
import graft.operators.{AsOfJoin, Dedup}
import graft.sources.Tables

/** Core relational surface: scans, typed projection, filter, group-agg,
  * window dedup, joins (incl. as-of and anti), surrogate keys.
  * Each query maps a SURVEY.md §2 operator row onto the driver's star
  * schema (mapping table at the bottom of /root/repo/FIXTURES.md).
  */
object CoreQueries {

  private val one = lit(1).cast(DecimalType(18, 6))

  val defs: Seq[QueryDef] = Seq(

    // §2.5 A1/A3-style pricing summary: filter + hash agg + exact decimal
    // money math (domain pinning per reference fct_order_items.sql:56-127).
    QueryDef(
      "q01_pricing_summary",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        val discPrice =
          (dec6(col("l_extendedprice")) * (one - dec6(col("l_discount")))).cast(DecimalType(18, 6))
        val charge = (discPrice * (one + dec6(col("l_tax")))).cast(DecimalType(18, 6))
        li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            moneyOut(sum(dec6(col("l_quantity")))).as("sum_qty"),
            moneyOut(sum(dec6(col("l_extendedprice")))).as("sum_base_price"),
            moneyOut(sum(discPrice)).as("sum_disc_price"),
            moneyOut(sum(charge)).as("sum_charge"),
            exactAvg(sum(dec6(col("l_quantity"))), count(lit(1))).as("avg_qty"),
            count(lit(1)).as("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      Some("""
        SELECT l_returnflag, l_linestatus,
          CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS sum_qty,
          CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS sum_base_price,
          CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,6)) * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6))) AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS sum_disc_price,
          CAST(CAST(SUM(CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,6)) * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6))) AS DECIMAL(18,6)) * (CAST(1 AS DECIMAL(18,6)) + CAST(l_tax AS DECIMAL(18,6))) AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS sum_charge,
          CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_qty,
          COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus""")),

    // §2.5 A1: order-level rollup of lines (reference fct_orders.sql:29-43):
    // count, count distinct, conditional-free sums, min timestamp.
    QueryDef(
      "q02_order_rollup",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        val discAmt =
          (dec6(col("l_extendedprice")) * dec6(col("l_discount"))).cast(DecimalType(18, 6))
        // DISTINCT aggregate split from the sums (Expand-plan lesson, see
        // q46/q47): two hash aggs + a same-key join beats one Expand agg
        val sums = li.groupBy(col("l_orderkey"))
          .agg(
            count(lit(1)).as("line_count"),
            moneyOut(sum(dec6(col("l_quantity")))).as("total_qty"),
            moneyOut(sum(dec6(col("l_extendedprice")))).as("gross_amount"),
            moneyOut(sum(discAmt)).as("discount_amount"),
            min(col("l_shipdate")).as("first_ship_ts"))
        val dp = li.groupBy(col("l_orderkey"))
          .agg(countDistinct(col("l_partkey")).as("distinct_parts"))
        sums.join(dp, Seq("l_orderkey"))
          .select(col("l_orderkey"), col("line_count"), col("distinct_parts"),
            col("total_qty"), col("gross_amount"), col("discount_amount"),
            col("first_ship_ts"))
          .orderBy(col("l_orderkey"))
      },
      Some("""
        SELECT l_orderkey,
          COUNT(*) AS line_count,
          COUNT(DISTINCT l_partkey) AS distinct_parts,
          CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS total_qty,
          CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS gross_amount,
          CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(l_discount AS DECIMAL(18,6)) AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS discount_amount,
          MIN(l_shipdate) AS first_ship_ts
        FROM lineitem
        GROUP BY l_orderkey
        ORDER BY l_orderkey""")),

    // §2.4 W1: dedup keep-latest — the reference's dominant window pattern
    // (stg_orders.sql:90-97 and 8 more sites).
    QueryDef(
      "q03_dedup_latest",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        Dedup
          .keepLatest(ev, Seq(col("user_id")), col("ts"), col("event_id"))
          .select(col("user_id"), col("event_id"), col("event_type"), col("value"), col("ts"))
          .orderBy(col("user_id"))
      },
      Some("""
        SELECT user_id, event_id, event_type, value, ts FROM (
          SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
          FROM events) t
        WHERE rn = 1
        ORDER BY user_id""")),

    // §2.5 A2: customer KPIs (reference fct_customers.sql:19-36) —
    // broadcast dim join + count distinct + date math vs fixed anchor.
    QueryDef(
      "q04_customer_kpis",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val c = Tables.customer(s, dir)
        o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .groupBy(col("c_custkey"), col("c_name"), col("c_mktsegment"))
          .agg(
            countDistinct(col("o_orderkey")).as("n_orders"),
            moneyOut(sum(dec6(col("o_totalprice")))).as("total_spend"),
            exactAvg(sum(dec6(col("o_totalprice"))), count(lit(1))).as("avg_order_value"),
            to_date(min(col("o_orderdate"))).as("first_order_date"),
            to_date(max(col("o_orderdate"))).as("last_order_date"),
            datediff(lit("2002-01-01").cast("date"), to_date(max(col("o_orderdate"))))
              .cast("long").as("days_since_last"))
          .orderBy(col("c_custkey"))
      },
      Some("""
        SELECT c_custkey, c_name, c_mktsegment,
          COUNT(DISTINCT o_orderkey) AS n_orders,
          CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS total_spend,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_order_value,
          CAST(MIN(o_orderdate) AS DATE) AS first_order_date,
          CAST(MAX(o_orderdate) AS DATE) AS last_order_date,
          date_diff('day', CAST(MAX(o_orderdate) AS DATE), DATE '2002-01-01') AS days_since_last
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_custkey, c_name, c_mktsegment
        ORDER BY c_custkey""")),

    // §2.3 J6 / §2.4 W4: as-of "best candidate at anchor time" — for each
    // purchase event, its user's nearest other event, preferring at-or-
    // before (reference fct_orders.sql:115-141 address-at-order-time).
    QueryDef(
      "q09_asof_best_event",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"))
        val candidates = ev.filter(col("event_type") =!= "purchase")
          .select(
            col("event_id").as("cand_event_id"), col("user_id"),
            col("event_type").as("cand_type"), col("ts").as("cand_ts"))
        AsOfJoin
          .bestAtTime(
            purchases, candidates, Seq("user_id"),
            leftTs = col("ts"), rightTs = col("cand_ts"),
            tiebreakCol = "cand_event_id")
          .select(col("event_id"), col("user_id"), col("cand_event_id"), col("cand_type"))
          .orderBy(col("event_id"))
      },
      Some("""
        SELECT event_id, user_id, cand_event_id, cand_type FROM (
          SELECT p.event_id, p.user_id, c.event_id AS cand_event_id,
                 c.event_type AS cand_type,
                 row_number() OVER (PARTITION BY p.event_id ORDER BY
                   CASE WHEN c.ts <= p.ts THEN 0 ELSE 1 END,
                   abs(epoch_us(c.ts) - epoch_us(p.ts)), c.event_id) AS rn
          FROM (SELECT * FROM events WHERE event_type = 'purchase') p
          LEFT JOIN (SELECT * FROM events WHERE event_type <> 'purchase') c
            USING (user_id)) t
        WHERE rn = 1
        ORDER BY event_id""")),

    // §2.3 J13: FK/orphan anti-join (reference
    // tests/stg_packages_fk_shipment_id_to_shipments.sql:1-6).
    QueryDef(
      "q10_customers_without_events",
      (s, dir) => {
        val c  = Tables.customer(s, dir)
        val ev = Tables.events(s, dir)
        c.join(ev, c("c_custkey") === ev("user_id"), "left_anti")
          .select(col("c_custkey"), col("c_name"))
          .orderBy(col("c_custkey"))
      },
      Some("""
        SELECT c_custkey, c_name FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM events e WHERE e.user_id = c.c_custkey)
        ORDER BY c_custkey""")),

    // §2.5 A10 / §2.3 J14: duplicate-key detection via group-having
    // (reference tests/stg_product_brands__unique_brand_id.sql:1-7).
    QueryDef(
      "q11_dup_detect",
      (s, dir) => {
        Dedup
          .duplicateKeys(Tables.events(s, dir), Seq(col("user_id"), col("event_type")))
          .orderBy(col("user_id"), col("event_type"))
      },
      Some("""
        SELECT user_id, event_type, COUNT(*) AS dup_count
        FROM events
        GROUP BY user_id, event_type
        HAVING COUNT(*) > 1
        ORDER BY user_id, event_type""")),

    // §2.9: dbt_utils.generate_surrogate_key — md5 byte-identical across
    // engines (reference fct_orders.sql:163, fct_order_items.sql:131-134),
    // incl. the null-sentinel branch.
    QueryDef(
      "q12_surrogate_keys",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val maybeNull = when(col("o_orderstatus") === "P", lit(null).cast("string"))
          .otherwise(col("o_orderstatus"))
        o.select(
            col("o_orderkey"),
            surrogateKey(col("o_orderkey"), col("o_custkey"), to_date(col("o_orderdate")))
              .as("order_sk"),
            surrogateKey(col("o_orderkey"), maybeNull).as("status_sk"))
          .orderBy(col("o_orderkey"))
      },
      Some("""
        SELECT o_orderkey,
          md5(concat_ws('-',
            coalesce(CAST(o_orderkey AS VARCHAR), '_dbt_utils_surrogate_key_null_'),
            coalesce(CAST(o_custkey  AS VARCHAR), '_dbt_utils_surrogate_key_null_'),
            coalesce(CAST(CAST(o_orderdate AS DATE) AS VARCHAR), '_dbt_utils_surrogate_key_null_')
          )) AS order_sk,
          md5(concat_ws('-',
            coalesce(CAST(o_orderkey AS VARCHAR), '_dbt_utils_surrogate_key_null_'),
            coalesce(CASE WHEN o_orderstatus = 'P' THEN NULL ELSE o_orderstatus END, '_dbt_utils_surrogate_key_null_')
          )) AS status_sk
        FROM orders
        ORDER BY o_orderkey""")))
}
