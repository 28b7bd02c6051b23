package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.Kernels._
import graft.sources.Tables

/** Scalar-kernel surface: conditional decodes, null normalization, safe
  * casts, JSON extraction, regex kernels, date/time kernels, freshness,
  * distinct. SURVEY.md §2.2 / §2.7 / §2.1-S7.
  */
object ScalarQueries {

  val defs: Seq[QueryDef] = Seq(

    // §2.2 P4/P8: status canonicalization when-chains (reference
    // stg_orders.sql:134-140, stg_invoice_payments.sql:41-48) + safe casts
    // (P2, stg_customers.sql:36-37).
    QueryDef(
      "q13_status_decode",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val statusLabel = when(col("o_orderstatus") === "O", "open")
          .when(col("o_orderstatus") === "F", "fulfilled")
          .when(col("o_orderstatus") === "P", "processing")
          .otherwise("unknown")
        val prioCode = expr("try_cast(element_at(split(o_orderpriority, '-'), 1) AS BIGINT)")
        o.select(statusLabel.as("status_label"), prioCode.as("priority_code"))
          .groupBy(col("status_label"), col("priority_code"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("status_label"), col("priority_code"))
      },
      Some("""
        SELECT CASE o_orderstatus WHEN 'O' THEN 'open' WHEN 'F' THEN 'fulfilled'
                 WHEN 'P' THEN 'processing' ELSE 'unknown' END AS status_label,
               TRY_CAST(string_split(o_orderpriority, '-')[1] AS BIGINT) AS priority_code,
               COUNT(*) AS n
        FROM orders
        GROUP BY 1, 2
        ORDER BY 1, 2""")),

    // §2.2 P3: nullif(trim())/coalesce normalization (reference
    // stg_addresses.sql:13-32) + §2.7 regexp digit strip.
    QueryDef(
      "q14_null_normalize",
      (s, dir) => {
        val p = Tables.part(s, dir)
        val messy = when(col("p_size") % 7 === 0, lit("  ")).otherwise(col("p_type"))
        val norm  = nullifTrim(messy)
        p.select(
            col("p_partkey"),
            norm.as("norm_type"),
            coalesce(norm, lit("unknown")).as("type_or_unknown"),
            regexp_replace(col("p_brand"), "[^0-9]", "").as("brand_digits"))
          .orderBy(col("p_partkey"))
      },
      Some("""
        SELECT p_partkey,
               NULLIF(TRIM(CASE WHEN p_size % 7 = 0 THEN '  ' ELSE p_type END), '') AS norm_type,
               COALESCE(NULLIF(TRIM(CASE WHEN p_size % 7 = 0 THEN '  ' ELSE p_type END), ''), 'unknown') AS type_or_unknown,
               regexp_replace(p_brand, '[^0-9]', '', 'g') AS brand_digits
        FROM part
        ORDER BY p_partkey""")),

    // §2.1 S2 / §2.7 JSON: semi-structured path extraction + cast
    // (reference stg_invoice_payments.sql:17,22-33).
    QueryDef(
      "q15_json_extract",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        ev.select(col("event_type"),
            get_json_object(col("props"), "$.k").cast("long").as("k"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
            min(col("k")).as("min_k"), max(col("k")).as("max_k"))
          .orderBy(col("event_type"))
      },
      Some("""
        SELECT event_type, COUNT(*) AS n,
               CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
               MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
               MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        FROM events
        GROUP BY event_type
        ORDER BY event_type""")),

    // §2.7 string kernels: order-id normalizer chain (reference
    // stg_transactions.sql:52-61), digit extraction, whitespace collapse
    // (stg_orders.sql:26-32).
    QueryDef(
      "q16_regex_normalize",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val messy = concat(lit("SO-"), col("o_orderkey"), lit(" #"), col("o_orderstatus"))
        o.select(
            col("o_orderkey"),
            normalizeOrderId(messy).as("normalized_id"),
            regexp_extract(messy, "([0-9]+)", 1).as("digits"),
            regexp_replace(concat(col("o_orderpriority"), lit("   x")), "\\s+", " ")
              .as("collapsed"))
          .orderBy(col("o_orderkey"))
      },
      Some("""
        SELECT o_orderkey,
               regexp_replace(regexp_replace(upper('SO-' || o_orderkey || ' #' || o_orderstatus), '[^A-Z0-9]', '', 'g'), '^(SO|ORD)', '') AS normalized_id,
               regexp_extract('SO-' || o_orderkey || ' #' || o_orderstatus, '([0-9]+)', 1) AS digits,
               regexp_replace(o_orderpriority || '   x', '\s+', ' ', 'g') AS collapsed
        FROM orders
        ORDER BY o_orderkey""")),

    // §2.7 date/time kernels: to_date, trunc, extract, datediff, date_add,
    // add_months, last_day, iso weekday (reference stg_orders.sql:114-115,
    // fct_customer_monthly_revenue.sql:14, fct_customers.sql:30).
    QueryDef(
      "q17_date_kernels",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val d = to_date(col("o_orderdate"))
        o.select(d.as("d")).distinct()
          .select(
            col("d"),
            year(col("d")).cast("long").as("yr"),
            month(col("d")).cast("long").as("mo"),
            dayofmonth(col("d")).cast("long").as("dom"),
            (weekday(col("d")) + 1).cast("long").as("isodow"),
            trunc(col("d"), "month").as("month_start"),
            trunc(col("d"), "year").as("year_start"),
            date_format(col("d"), "yyyy-MM-dd").as("iso"),
            datediff(lit("2002-01-01").cast("date"), col("d")).cast("long").as("days_to_anchor"),
            date_add(col("d"), 7).as("plus7"),
            add_months(col("d"), 1).as("plus1m"),
            last_day(col("d")).as("eom"))
          .orderBy(col("d"))
      },
      Some("""
        SELECT d, year(d) AS yr, month(d) AS mo, day(d) AS dom,
               isodow(d) AS isodow,
               CAST(date_trunc('month', d) AS DATE) AS month_start,
               CAST(date_trunc('year', d) AS DATE) AS year_start,
               strftime(d, '%Y-%m-%d') AS iso,
               date_diff('day', d, DATE '2002-01-01') AS days_to_anchor,
               d + 7 AS plus7,
               CAST(d + INTERVAL 1 MONTH AS DATE) AS plus1m,
               last_day(d) AS eom
        FROM (SELECT DISTINCT CAST(o_orderdate AS DATE) AS d FROM orders) t
        ORDER BY d""")),

    // §2.1 S7: source freshness probe vs fixed anchor (reference
    // models/staging/schema.yml:13-15 — warn 24h / error 72h).
    QueryDef(
      "q21_freshness",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        ev.agg(max(col("ts")).as("max_loaded_at"))
          .select(
            col("max_loaded_at"),
            // floor (not truncate-toward-zero) division so negative
            // staleness agrees with DuckDB's `//`; the µs difference is
            // far below 2^53 so the double division is exact enough.
            expr("CAST(floor((unix_micros(TIMESTAMP '2024-02-01 00:00:00') - unix_micros(max_loaded_at)) / 3600000000.0) AS BIGINT)")
              .as("hours_stale"))
          .select(
            col("max_loaded_at"), col("hours_stale"),
            when(col("hours_stale") < 24, "fresh")
              .when(col("hours_stale") < 72, "warn")
              .otherwise("error").as("freshness_status"))
      },
      Some("""
        SELECT max_loaded_at, hours_stale,
               CASE WHEN hours_stale < 24 THEN 'fresh'
                    WHEN hours_stale < 72 THEN 'warn'
                    ELSE 'error' END AS freshness_status
        FROM (
          SELECT MAX(ts) AS max_loaded_at,
                 CAST(floor((epoch_us(TIMESTAMP '2024-02-01 00:00:00') - epoch_us(MAX(ts))) / 3600000000.0) AS BIGINT) AS hours_stale
          FROM events) t""")),

    // §2.6 set ops: select distinct (reference stg_delivery_slots.sql:20-22).
    QueryDef(
      "q22_distinct_combos",
      (s, dir) => {
        Tables.orders(s, dir)
          .select(col("o_orderpriority"), col("o_orderstatus"))
          .distinct()
          .orderBy(col("o_orderpriority"), col("o_orderstatus"))
      },
      Some("""
        SELECT DISTINCT o_orderpriority, o_orderstatus
        FROM orders
        ORDER BY o_orderpriority, o_orderstatus""")),

    // Business-day lead time (order date -> ship date, weekends
    // excluded) in PURE integer arithmetic: W(d) = weekdays in
    // [Monday-anchor, d) = 5*(n div 7) + least(n mod 7, 5); lead =
    // W(ship+1) - W(order+1) counts weekdays in (order, ship]. No
    // calendar UDF, no per-day explode — two datediffs and modular
    // arithmetic per row, identical on both engines because every step
    // is integer. The SLA-bucket rollup pins the distribution and a key
    // checksum; the join is the usual broadcast of orders' key/date
    // projection.
    QueryDef(
      "q165_business_days_lead",
      (s, dir) => {
        val anchor = lit("1990-01-01").cast("date") // a Monday
        def wd(d: org.apache.spark.sql.Column) = {
          val n = datediff(d, anchor)
          (n / 7).cast("long") * 5 + least(pmod(n, lit(7)).cast("long"), lit(5L))
        }
        val li = Tables.lineitem(s, dir)
          .select(col("l_orderkey"), to_date(col("l_shipdate")).as("ship"))
        val o = Tables.orders(s, dir)
          .select(col("o_orderkey"), to_date(col("o_orderdate")).as("ordered"))
        li.join(broadcast(o), col("l_orderkey") === col("o_orderkey"))
          .withColumn("lead_bd",
            wd(date_add(col("ship"), 1)) - wd(date_add(col("ordered"), 1)))
          .withColumn("bucket",
            when(col("lead_bd") <= 5, "0_within_week")
              .when(col("lead_bd") <= 21, "1_within_month")
              .when(col("lead_bd") <= 63, "2_within_quarter")
              .otherwise("3_longer"))
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("n_lines"),
            sum(col("lead_bd")).as("lead_bd_sum"),
            sum(col("l_orderkey")).as("key_checksum"))
          .orderBy(col("bucket"))
      },
      Some("""
        WITH j AS (
          SELECT l.l_orderkey,
                 (5 * ((CAST(l.l_shipdate AS DATE) + 1 - DATE '1990-01-01') // 7)
                   + LEAST((CAST(l.l_shipdate AS DATE) + 1 - DATE '1990-01-01') % 7, 5))
                 - (5 * ((CAST(o.o_orderdate AS DATE) + 1 - DATE '1990-01-01') // 7)
                   + LEAST((CAST(o.o_orderdate AS DATE) + 1 - DATE '1990-01-01') % 7, 5))
                   AS lead_bd
          FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        b AS (
          SELECT l_orderkey, lead_bd,
                 CASE WHEN lead_bd <= 5 THEN '0_within_week'
                      WHEN lead_bd <= 21 THEN '1_within_month'
                      WHEN lead_bd <= 63 THEN '2_within_quarter'
                      ELSE '3_longer' END AS bucket
          FROM j)
        SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_lines,
               CAST(SUM(lead_bd) AS BIGINT) AS lead_bd_sum,
               CAST(SUM(l_orderkey) AS BIGINT) AS key_checksum
        FROM b
        GROUP BY 1
        ORDER BY 1""")))
}
