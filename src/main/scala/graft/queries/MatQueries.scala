package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.functions.Kernels._
import graft.operators.{IncrementalMerge, Scd2}
import graft.sources.{SchemaEvolution, Tables}

/** Window sequences, the exact-decimal fact-math pipeline, incremental
  * merge materialization, global sort / top-k. SURVEY.md §2.4 / §2.5 /
  * §2.1-S5 / §2.6.
  */
object MatQueries {

  private val one = lit(1).cast(DecimalType(18, 6))

  val defs: Seq[QueryDef] = Seq(

    // §2.4 W2: per-customer order sequence + is_first_order flag
    // (reference dim_orders.sql:32-40,56-57).
    QueryDef(
      "q18_order_sequence",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(to_date(col("o_orderdate")).asc, col("o_orderkey").asc)
        o.select(
            col("o_orderkey"), col("o_custkey").as("customer_id"),
            row_number().over(w).cast("long").as("order_rank_for_customer"))
          .withColumn("is_first_order", col("order_rank_for_customer") === 1)
          .orderBy(col("o_orderkey"))
      },
      Some("""
        SELECT o_orderkey, o_custkey AS customer_id,
               row_number() OVER (PARTITION BY o_custkey
                 ORDER BY CAST(o_orderdate AS DATE), o_orderkey) AS order_rank_for_customer,
               row_number() OVER (PARTITION BY o_custkey
                 ORDER BY CAST(o_orderdate AS DATE), o_orderkey) = 1 AS is_first_order
        FROM orders
        ORDER BY o_orderkey""")),

    // §2.5 + §4.1: the exact-decimal discount/VAT line-math pipeline with
    // per-step scale pinning (reference fct_order_items.sql:91-127: clamp
    // pct, discount, conditionally add VAT on top, round) — TPC-H fractions
    // stand in for furchild percentages.
    QueryDef(
      "q19_money_math",
      (s, dir) => {
        // NOTE: deliberately NOT fanned out (Skew.fanOutRead): q19's ORDER
        // BY (l_orderkey, l_linenumber) is not a total order over the
        // synthetic dup rows, and the oracle's within-tie order matches
        // Spark's only under the original scan partitioning.
        val li = Tables.lineitem(s, dir)
        val gross    = dec6(col("l_extendedprice"))
        val discFrac = clamp(dec6(col("l_discount")), lit(0).cast(DecimalType(18, 6)), one)
        val hasVat   = col("l_tax") > 0
        val afterDisc = (gross * (one - discFrac)).cast(DecimalType(18, 6))
        val taxAmt = when(hasVat, (afterDisc * dec6(col("l_tax"))).cast(DecimalType(18, 6)))
          .otherwise(lit(0).cast(DecimalType(18, 6)))
        val lineTotal = (afterDisc + taxAmt).cast(DecimalType(18, 6))
        li.select(
            col("l_orderkey"), col("l_linenumber"),
            moneyOut(gross).as("gross_amount"),
            moneyOut(discFrac).as("discount_fraction"),
            hasVat.as("has_vat"),
            moneyOut(afterDisc).as("amount_after_discount"),
            moneyOut(taxAmt).as("tax_amount"),
            moneyOut(lineTotal).as("line_total"),
            moneyOut(round(lineTotal, 2)).as("line_total_rounded"))
          .orderBy(col("l_orderkey"), col("l_linenumber"))
      },
      Some("""
        WITH base AS (
          SELECT l_orderkey, l_linenumber,
                 CAST(l_extendedprice AS DECIMAL(18,6)) AS gross,
                 least(greatest(CAST(l_discount AS DECIMAL(18,6)), CAST(0 AS DECIMAL(18,6))), CAST(1 AS DECIMAL(18,6))) AS disc_frac,
                 l_tax > 0 AS has_vat,
                 CAST(l_tax AS DECIMAL(18,6)) AS tax_frac
          FROM lineitem),
        step1 AS (
          SELECT *, CAST(gross * (CAST(1 AS DECIMAL(18,6)) - disc_frac) AS DECIMAL(18,6)) AS after_disc FROM base),
        step2 AS (
          SELECT *, CASE WHEN has_vat THEN CAST(after_disc * tax_frac AS DECIMAL(18,6)) ELSE CAST(0 AS DECIMAL(18,6)) END AS tax_amt FROM step1)
        SELECT l_orderkey, l_linenumber,
               CAST(gross AS DOUBLE) AS gross_amount,
               CAST(disc_frac AS DOUBLE) AS discount_fraction,
               has_vat,
               CAST(after_disc AS DOUBLE) AS amount_after_discount,
               CAST(tax_amt AS DOUBLE) AS tax_amount,
               CAST(CAST(after_disc + tax_amt AS DECIMAL(18,6)) AS DOUBLE) AS line_total,
               CAST(round(CAST(after_disc + tax_amt AS DECIMAL(18,6)), 2) AS DOUBLE) AS line_total_rounded
        FROM step2
        ORDER BY l_orderkey, l_linenumber""")),

    // §2.1 S5: incremental merge (anti-join + union) with 7-day lookback —
    // dbt incremental materialization semantics (reference
    // fct_orders.sql:1-5,23-25; SURVEY §4.3#1).
    QueryDef(
      "q20_incremental_merge",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val anchor = lit("1998-06-01").cast("timestamp")
        val existing = o.filter(col("o_orderdate") < anchor)
          .select(col("o_orderkey"), lit("old").as("batch"), moneyOut(dec6(col("o_totalprice"))).as("total"))
        val fresh = o.filter(col("o_orderdate") >= anchor - expr("INTERVAL 7 DAYS"))
          .select(col("o_orderkey"), lit("new").as("batch"), moneyOut(dec6(col("o_totalprice"))).as("total"))
        IncrementalMerge.merge(existing, fresh, Seq("o_orderkey"))
          .orderBy(col("o_orderkey"))
      },
      Some("""
        WITH existing AS (
          SELECT o_orderkey, 'old' AS batch, CAST(CAST(CAST(o_totalprice AS DECIMAL(18,6)) AS DECIMAL(38,6)) AS DOUBLE) AS total
          FROM orders WHERE o_orderdate < TIMESTAMP '1998-06-01'),
        fresh AS (
          SELECT o_orderkey, 'new' AS batch, CAST(CAST(CAST(o_totalprice AS DECIMAL(18,6)) AS DECIMAL(38,6)) AS DOUBLE) AS total
          FROM orders WHERE o_orderdate >= TIMESTAMP '1998-06-01' - INTERVAL 7 DAY)
        SELECT * FROM (
          SELECT e.* FROM existing e WHERE NOT EXISTS (SELECT 1 FROM fresh f WHERE f.o_orderkey = e.o_orderkey)
          UNION ALL
          SELECT * FROM fresh)
        ORDER BY o_orderkey""")),

    // §2.1 schema evolution THROUGH the incremental merge — the
    // `on_schema_change='append_new_columns'` contract (reference
    // dbt_project.yml:34, stg_invoice_payments.sql:4) composed with the
    // q20 merge: the fresh batch ADDS a column (old rows null-fill) and
    // DROPS one (fresh rows null-fill the survivor) in the same merge.
    QueryDef(
      "q54_schema_evolution_merge",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val anchor = lit("1998-06-01").cast("timestamp")
        val existing = o.filter(col("o_orderdate") < anchor)
          .select(col("o_orderkey"), lit("old").as("batch"),
            moneyOut(dec6(col("o_totalprice"))).as("total"))
        // fresh drops `batch` and adds `priority`
        val fresh = o.filter(col("o_orderdate") >= anchor - expr("INTERVAL 7 DAYS"))
          .select(col("o_orderkey"),
            moneyOut(dec6(col("o_totalprice"))).as("total"),
            col("o_orderpriority").as("priority"))
        val (alignedExisting, alignedFresh) =
          SchemaEvolution.appendNewColumns(existing, fresh)
        IncrementalMerge.merge(alignedExisting, alignedFresh, Seq("o_orderkey"))
          .orderBy(col("o_orderkey"))
      },
      Some("""
        WITH existing AS (
          SELECT o_orderkey, 'old' AS batch, CAST(CAST(CAST(o_totalprice AS DECIMAL(18,6)) AS DECIMAL(38,6)) AS DOUBLE) AS total
          FROM orders WHERE o_orderdate < TIMESTAMP '1998-06-01'),
        fresh AS (
          SELECT o_orderkey, CAST(CAST(CAST(o_totalprice AS DECIMAL(18,6)) AS DECIMAL(38,6)) AS DOUBLE) AS total,
                 o_orderpriority AS priority
          FROM orders WHERE o_orderdate >= TIMESTAMP '1998-06-01' - INTERVAL 7 DAY)
        SELECT * FROM (
          SELECT e.o_orderkey, e.batch, e.total, CAST(NULL AS VARCHAR) AS priority
          FROM existing e WHERE NOT EXISTS (SELECT 1 FROM fresh f WHERE f.o_orderkey = e.o_orderkey)
          UNION ALL
          SELECT o_orderkey, CAST(NULL AS VARCHAR) AS batch, total, priority FROM fresh)
        ORDER BY o_orderkey""")),

    // §2.1 the OTHER schema-evolution policy through the merge:
    // `sync_all_columns` (reference dim_customer.sql:6) — the incoming
    // schema wins entirely: the batch's dropped column disappears from
    // surviving existing rows, its new column arrives, and its type
    // changes take effect (total re-typed long→double here).
    QueryDef(
      "q61_schema_sync_merge",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val anchor = lit("1998-06-01").cast("timestamp")
        val existing = o.filter(col("o_orderdate") < anchor)
          .select(col("o_orderkey"), lit("old").as("batch"),
            round(col("o_totalprice")).cast("long").as("total"))
        // fresh: drops `batch`, re-types `total` to exact-decimal double,
        // adds `priority`
        val fresh = o.filter(col("o_orderdate") >= anchor - expr("INTERVAL 7 DAYS"))
          .select(col("o_orderkey"),
            moneyOut(dec6(col("o_totalprice"))).as("total"),
            col("o_orderpriority").as("priority"))
        val (alignedExisting, alignedFresh) =
          SchemaEvolution.syncAllColumns(existing, fresh)
        IncrementalMerge.merge(alignedExisting, alignedFresh, Seq("o_orderkey"))
          .orderBy(col("o_orderkey"))
      },
      Some("""
        WITH existing AS (
          SELECT o_orderkey,
                 CAST(CAST(round(o_totalprice) AS BIGINT) AS DOUBLE) AS total,
                 CAST(NULL AS VARCHAR) AS priority
          FROM orders WHERE o_orderdate < TIMESTAMP '1998-06-01'),
        fresh AS (
          SELECT o_orderkey,
                 CAST(CAST(CAST(o_totalprice AS DECIMAL(18,6)) AS DECIMAL(38,6)) AS DOUBLE) AS total,
                 o_orderpriority AS priority
          FROM orders WHERE o_orderdate >= TIMESTAMP '1998-06-01' - INTERVAL 7 DAY)
        SELECT * FROM (
          SELECT e.* FROM existing e WHERE NOT EXISTS (SELECT 1 FROM fresh f WHERE f.o_orderkey = e.o_orderkey)
          UNION ALL
          SELECT * FROM fresh)
        ORDER BY o_orderkey""")),

    // dbt `snapshot` materialization (SCD2) — the reference ships the
    // snapshots/ directory; this gates the full version-history semantics:
    // changed payloads close the old version and open a new one, unchanged
    // payloads do NOT version (check strategy), stale batches are ignored,
    // and brand-new keys open their first version.
    QueryDef(
      "q65_scd2_snapshot",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val t1 = lit("2024-01-01 00:00:00").cast("timestamp")
        val t2 = lit("2024-02-01 00:00:00").cast("timestamp")
        val existing = o.select(col("o_orderkey").as("k"),
          col("o_orderstatus").as("status"),
          col("o_orderpriority").as("prio"),
          t1.as("valid_from"), lit(null).cast("timestamp").as("valid_to"))
        // batch: keys %3==0 arrive again — half with a real change, half
        // byte-identical (must NOT version); keys %7==0 arrive shifted as
        // brand-new keys
        val revisits = o.where(col("o_orderkey") % 3 === 0)
          .select(col("o_orderkey").as("k"),
            when(col("o_orderkey") % 6 === 0, lit("X"))
              .otherwise(col("o_orderstatus")).as("status"),
            col("o_orderpriority").as("prio"), t2.as("updated_at"))
        // +1e9 shift keeps synthesized keys clear of real orderkeys at ANY
        // scale factor (max orderkey ≈ 1.5M × sf; +1e6 collided at sf ≥ 0.67)
        val newKeys = o.where(col("o_orderkey") % 7 === 0)
          .select((col("o_orderkey") + 1000000000L).as("k"),
            lit("N").as("status"), col("o_orderpriority").as("prio"),
            t2.as("updated_at"))
        val fresh = revisits.unionByName(newKeys)
        Scd2.merge(existing, fresh, "k", Seq("status", "prio"), "updated_at")
          .orderBy(col("k"), col("valid_from"))
      },
      Some("""
        WITH existing AS (
          SELECT o_orderkey AS k, o_orderstatus AS status, o_orderpriority AS prio,
                 TIMESTAMP '2024-01-01 00:00:00' AS valid_from,
                 CAST(NULL AS TIMESTAMP) AS valid_to
          FROM orders),
        fresh AS (
          SELECT o_orderkey AS k,
                 CASE WHEN o_orderkey % 6 = 0 THEN 'X' ELSE o_orderstatus END AS status,
                 o_orderpriority AS prio,
                 TIMESTAMP '2024-02-01 00:00:00' AS updated_at
          FROM orders WHERE o_orderkey % 3 = 0
          UNION ALL
          SELECT o_orderkey + 1000000000, 'N', o_orderpriority,
                 TIMESTAMP '2024-02-01 00:00:00'
          FROM orders WHERE o_orderkey % 7 = 0),
        changed AS (
          SELECT e.k, f.updated_at AS close_at
          FROM existing e JOIN fresh f USING (k)
          WHERE (e.status IS DISTINCT FROM f.status OR e.prio IS DISTINCT FROM f.prio)
            AND f.updated_at > e.valid_from),
        closed AS (
          SELECT e.k, e.status, e.prio, e.valid_from, c.close_at AS valid_to
          FROM existing e JOIN changed c USING (k)),
        still_current AS (
          SELECT e.* FROM existing e
          WHERE NOT EXISTS (SELECT 1 FROM changed c WHERE c.k = e.k)),
        inserts AS (
          SELECT f.k, f.status, f.prio, f.updated_at AS valid_from,
                 CAST(NULL AS TIMESTAMP) AS valid_to
          FROM fresh f
          WHERE EXISTS (SELECT 1 FROM changed c WHERE c.k = f.k)
             OR NOT EXISTS (SELECT 1 FROM existing e WHERE e.k = f.k))
        SELECT * FROM (
          SELECT * FROM still_current
          UNION ALL SELECT * FROM closed
          UNION ALL SELECT * FROM inserts)
        ORDER BY k, valid_from""")),

    // §2.6: the one global sort (reference first_channel_ltv.sql:26) +
    // top-k extension — total order with deterministic tiebreak.
    QueryDef(
      "q23_top_revenue_customers",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        o.groupBy(col("o_custkey"))
          .agg(moneyOut(sum(dec6(col("o_totalprice")))).as("revenue"),
            count(lit(1)).as("n_orders"))
          .orderBy(col("revenue").desc, col("o_custkey"))
          .limit(100)
      },
      Some("""
        SELECT o_custkey,
               CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS revenue,
               COUNT(*) AS n_orders
        FROM orders
        GROUP BY o_custkey
        ORDER BY revenue DESC, o_custkey
        LIMIT 100""")))
}
