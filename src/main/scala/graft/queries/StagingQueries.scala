package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.{Staging, Tables}

/** Typed staging-conform projection (P1 full) + the string kernels the
  * round-1 verdict flagged as uncovered: case-insensitive regex replace
  * (reference dim_customer.sql:58-69), trailing-separator cleanup,
  * ilike, and phone '+' stripping (dim_customer.sql:48-52).
  */
object StagingQueries {

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q40_staging_conform",
      (s, dir) => {
        val c = Tables.customer(s, dir)
        val k = col("c_custkey")
        val messy = c
          .withColumn("name_raw", concat(col("c_name"),
            when(k % 4 === 0, lit(" FURCHILD: vip"))
              .when(k % 4 === 1, lit(" furchild: x - "))
              .otherwise(lit(""))))
          .withColumn("phone_raw", concat(lit("+971-"), col("c_custkey"), lit("-555")))
          .withColumn("segment_raw",
            when(k % 9 === 0, lit("  ")).otherwise(col("c_mktsegment")))
        val conformed = Staging.conform(messy, Seq(
          Staging.field("c_custkey", "customer_id", LongType),
          Staging.field("name_raw", "customer_name_raw", StringType),
          Staging.field("phone_raw", "phone_messy", StringType),
          Staging.field("c_acctbal", "account_balance", DoubleType),
          Staging.field("segment_raw", "segment", StringType, blankToNull = true),
          Staging.field("c_nationkey", "nation_id", LongType)))
        conformed.select(
            col("customer_id"),
            // case-insensitive brand-suffix strip + trailing-separator trim
            trim(regexp_replace(
              regexp_replace(col("customer_name_raw"), "(?i)furchild:.*$", ""),
              "\\s*[-–:]+\\s*$", "")).as("full_name"),
            regexp_replace(col("phone_messy"), "\\+", "").as("phone"),
            col("account_balance"), col("segment"), col("nation_id"),
            col("customer_name_raw").ilike("%furchild%").as("is_vip"))
          .orderBy(col("customer_id"))
      },
      Some("""
        WITH messy AS (
          SELECT c_custkey,
                 c_name || CASE WHEN c_custkey % 4 = 0 THEN ' FURCHILD: vip'
                                WHEN c_custkey % 4 = 1 THEN ' furchild: x - '
                                ELSE '' END AS name_raw,
                 '+971-' || c_custkey || '-555' AS phone_raw,
                 CASE WHEN c_custkey % 9 = 0 THEN '  ' ELSE c_mktsegment END AS segment_raw,
                 c_acctbal, c_nationkey
          FROM customer)
        SELECT c_custkey AS customer_id,
               trim(regexp_replace(
                 regexp_replace(name_raw, 'furchild:.*$', '', 'i'),
                 '\s*[-–:]+\s*$', '')) AS full_name,
               regexp_replace(phone_raw, '\+', '', 'g') AS phone,
               c_acctbal AS account_balance,
               NULLIF(TRIM(segment_raw), '') AS segment,
               CAST(c_nationkey AS BIGINT) AS nation_id,
               (name_raw ILIKE '%furchild%') AS is_vip
        FROM messy
        ORDER BY customer_id""")),

    // §4.3#5 TimestampNTZ end-to-end: the reference carries a LOCAL
    // wall-clock timestamp alongside UTC (reference stg_orders.sql:16-21
    // `convert_timezone('Asia/Dubai', created_at)` + `::timestamp_ntz`).
    // o_orderdate is parquet TIMESTAMP (isAdjustedToUTC=false) → Spark
    // reads TimestampNTZType natively; convert_timezone on NTZ yields the
    // Dubai wall time as NTZ, round-trips through parquet as NTZ, and
    // DuckDB's TIMESTAMP (NTZ-natural) is the oracle twin.
    QueryDef(
      "q55_timestamp_ntz_local",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        // o_orderdate is midnight-only in the testdata — synthesize
        // intra-day times from the key so the UTC+4 conversion actually
        // crosses midnight (hours 20-23 roll to the next local day);
        // without this the gate would pass even with broken day-rollover
        val utc = expr("o_orderdate + make_interval(0, 0, 0, 0, " +
          "cast(o_orderkey % 24 as int), cast((o_orderkey * 7) % 60 as int), 0)")
        val local = convert_timezone(lit("UTC"), lit("Asia/Dubai"), utc)
        o.select(
            col("o_orderkey").as("order_id"),
            utc.as("created_at_utc"),
            local.as("created_at_local"),
            to_date(local).as("order_date_local"),
            hour(local).cast("long").as("local_hour"),
            (to_date(local) =!= to_date(utc)).as("crosses_midnight"))
          .orderBy(col("order_id"))
      },
      Some("""
        WITH t AS (
          SELECT o_orderkey AS order_id,
                 o_orderdate + (o_orderkey % 24) * INTERVAL 1 HOUR
                             + ((o_orderkey * 7) % 60) * INTERVAL 1 MINUTE AS created_at_utc
          FROM orders),
        c AS (
          SELECT order_id, created_at_utc,
                 timezone('Asia/Dubai', timezone('UTC', created_at_utc)) AS created_at_local
          FROM t)
        SELECT order_id, created_at_utc, created_at_local,
               CAST(created_at_local AS DATE) AS order_date_local,
               CAST(extract(hour FROM created_at_local) AS BIGINT) AS local_hour,
               (CAST(created_at_local AS DATE) <> CAST(created_at_utc AS DATE)) AS crosses_midnight
        FROM t JOIN c USING (order_id, created_at_utc)
        ORDER BY order_id""")))
}
