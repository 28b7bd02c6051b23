package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.functions.Kernels._
import graft.operators.AsOfJoin
import graft.sources.Tables

/** q47: the reference's flagship fact model end-to-end (reference
  * models/marts/commerce/facts/fct_orders.sql:1-214) — line-level exact
  * decimal math → order rollup (counts, distinct products, coalesced
  * sums, net-before-tax) → VAT/customer joins → best-shipping-address
  * at order time (the as-of operator) → derived percentages → surrogate
  * keys and date parts. One query composing every operator family the
  * model touches; a user of the reference's fct_orders gets the same
  * shape here.
  *
  * Derived percentages are emitted as raw doubles (one deterministic
  * division) rather than round(x,2): double rounding is
  * representation-dependent across engines while the division itself is
  * bit-stable; money sums keep the reference's round-to-2 (exact
  * decimal rounding, identical on both engines).
  */
object FactQueries {

  private val zero6 = lit(0).cast(DecimalType(18, 6))

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q47_fct_orders",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        val o  = Tables.orders(s, dir)
        val c  = Tables.customer(s, dir)

        // ---- line math (fct_order_items analog, :8-26) ----
        val gross     = dec6(col("l_extendedprice"))
        val discAmt   = (gross * dec6(col("l_discount"))).cast(DecimalType(18, 6))
        val afterDisc = (gross - discAmt).cast(DecimalType(18, 6))
        val taxAmt    = (afterDisc * dec6(col("l_tax"))).cast(DecimalType(18, 6))
        val net       = (afterDisc + taxAmt).cast(DecimalType(18, 6))
        val lines = li.select(col("l_orderkey").as("order_id"),
          col("l_partkey"), gross.as("line_gross"), discAmt.as("line_discount"),
          taxAmt.as("line_tax"), net.as("line_net"))

        // ---- order rollup (:29-43) ----
        // distinct-count split from the sums: mixing DISTINCT and plain
        // aggregates in one agg() doubles the input through an Expand
        // node (same lesson as q46); two hash aggs + a same-key join is
        // cheaper and the join needs no extra shuffle (same key).
        val sums = lines.groupBy(col("order_id")).agg(
          count(lit(1)).as("item_count"),
          money(sum(coalesce(col("line_gross"), zero6))).as("order_gross"),
          money(sum(coalesce(col("line_discount"), zero6))).as("order_discount"),
          money(sum(coalesce(col("line_tax"), zero6))).as("order_tax"),
          money(sum(coalesce(col("line_net"), zero6))).as("order_net"))
        val dp = lines.groupBy(col("order_id"))
          .agg(countDistinct(col("l_partkey")).as("distinct_products"))
        val agg = sums.join(dp, Seq("order_id"))
          .withColumn("order_net_bt", (col("order_net") - col("order_tax")).cast(Money))

        // ---- orders (VAT source) + canonical customer (:46-74) ----
        val ordSrc = o.select(col("o_orderkey").as("order_id"),
          col("o_orderdate").as("created_at_utc"),
          dec6((col("o_orderkey") % 3) * 5).as("vat_pct_src"),
          col("o_custkey").as("customer_id"))
        val joined = agg.join(ordSrc, Seq("order_id"), "left")

        // ---- synthetic two-version address book + as-of pick (:82-141) ----
        val addr = c.select(col("c_custkey").as("customer_id"),
            col("c_mktsegment").as("segment"),
            explode(array(lit(0), lit(1))).as("v"))
          .select(col("customer_id"),
            concat(col("segment"), lit("#v"), col("v")).as("ship_area"),
            (col("customer_id") * 2 + col("v")).as("addr_id"),
            to_timestamp(date_add(lit("1993-01-01").cast("date"),
              (pmod(col("customer_id"), lit(200)) + col("v") * 1200).cast("int"))).as("addr_ts"))
        val orderBase = joined.select(col("order_id"), col("customer_id"),
          col("created_at_utc"))
        val withAddr = AsOfJoin.bestAtTime(
          orderBase, addr, Seq("customer_id"),
          leftTs = col("created_at_utc"), rightTs = col("addr_ts"),
          tiebreakCol = "addr_id")
          .select(col("order_id"), col("ship_area"), col("addr_id").as("ship_addr_id"))

        // ---- derived percentages (:144-160) + final (:162-213) ----
        joined.join(withAddr, Seq("order_id"), "left")
          .select(
            surrogateKey(col("order_id")).as("order_sk"),
            col("order_id"), col("customer_id"),
            to_date(col("created_at_utc")).as("order_date"),
            col("item_count"), col("distinct_products"),
            moneyOut(round(col("order_gross"), 2)).as("order_gross"),
            moneyOut(round(col("order_discount"), 2)).as("order_discount_amt"),
            moneyOut(round(col("order_net_bt"), 2)).as("order_net_before_tax"),
            moneyOut(round(col("order_tax"), 2)).as("order_tax_amt"),
            moneyOut(round(col("order_net"), 2)).as("order_net_amt"),
            when(col("order_gross") === 0, 0.0d)
              .otherwise(col("order_discount").cast("double") / col("order_gross").cast("double") * 100)
              .as("order_discount_pct_effective"),
            when(col("order_net_bt") === 0, 0.0d)
              .otherwise(col("order_tax").cast("double") / col("order_net_bt").cast("double") * 100)
              .as("order_vat_pct_effective"),
            moneyOut(col("vat_pct_src")).as("vat_pct_src"),
            col("ship_area"), col("ship_addr_id"))
          .orderBy(col("order_id"))
      },
      Some("""
        WITH lines AS (
          SELECT l_orderkey AS order_id, l_partkey,
                 CAST(l_extendedprice AS DECIMAL(18,6)) AS line_gross,
                 CAST(CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(l_discount AS DECIMAL(18,6)) AS DECIMAL(18,6)) AS line_discount,
                 CAST(l_tax AS DECIMAL(18,6)) AS tax_frac
          FROM lineitem),
        lines2 AS (
          SELECT *, CAST(line_gross - line_discount AS DECIMAL(18,6)) AS after_disc FROM lines),
        lines3 AS (
          SELECT order_id, l_partkey, line_gross, line_discount,
                 CAST(after_disc * tax_frac AS DECIMAL(18,6)) AS line_tax,
                 CAST(after_disc + CAST(after_disc * tax_frac AS DECIMAL(18,6)) AS DECIMAL(18,6)) AS line_net
          FROM lines2),
        agg AS (
          SELECT order_id, COUNT(*) AS item_count,
                 COUNT(DISTINCT l_partkey) AS distinct_products,
                 CAST(SUM(COALESCE(line_gross, CAST(0 AS DECIMAL(18,6)))) AS DECIMAL(38,6)) AS order_gross,
                 CAST(SUM(COALESCE(line_discount, CAST(0 AS DECIMAL(18,6)))) AS DECIMAL(38,6)) AS order_discount,
                 CAST(SUM(COALESCE(line_tax, CAST(0 AS DECIMAL(18,6)))) AS DECIMAL(38,6)) AS order_tax,
                 CAST(SUM(COALESCE(line_net, CAST(0 AS DECIMAL(18,6)))) AS DECIMAL(38,6)) AS order_net
          FROM lines3 GROUP BY 1),
        agg2 AS (SELECT *, CAST(order_net - order_tax AS DECIMAL(38,6)) AS order_net_bt FROM agg),
        joined AS (
          SELECT a.*, o.o_orderdate AS created_at_utc,
                 CAST((o.o_orderkey % 3) * 5 AS DECIMAL(18,6)) AS vat_pct_src,
                 o.o_custkey AS customer_id
          FROM agg2 a LEFT JOIN orders o ON o.o_orderkey = a.order_id),
        addr AS (
          SELECT c_custkey AS customer_id,
                 c_mktsegment || '#v' || v AS ship_area,
                 c_custkey * 2 + v AS addr_id,
                 CAST(DATE '1993-01-01' + ((c_custkey % 200) + v * 1200) * INTERVAL 1 DAY AS TIMESTAMP) AS addr_ts
          FROM customer, (SELECT unnest([0, 1]) AS v)),
        picked AS (
          SELECT order_id, ship_area, addr_id AS ship_addr_id FROM (
            SELECT ob.order_id, au.ship_area, au.addr_id,
                   row_number() OVER (PARTITION BY ob.order_id ORDER BY
                     CASE WHEN au.addr_ts <= ob.created_at_utc THEN 0 ELSE 1 END,
                     abs(epoch_us(au.addr_ts) - epoch_us(ob.created_at_utc)), au.addr_id) AS rn
            FROM joined ob LEFT JOIN addr au ON au.customer_id = ob.customer_id) t
          WHERE rn = 1)
        SELECT md5(COALESCE(CAST(j.order_id AS VARCHAR), '_dbt_utils_surrogate_key_null_')) AS order_sk,
               j.order_id, j.customer_id,
               CAST(j.created_at_utc AS DATE) AS order_date,
               j.item_count, j.distinct_products,
               CAST(round(j.order_gross, 2) AS DOUBLE) AS order_gross,
               CAST(round(j.order_discount, 2) AS DOUBLE) AS order_discount_amt,
               CAST(round(j.order_net_bt, 2) AS DOUBLE) AS order_net_before_tax,
               CAST(round(j.order_tax, 2) AS DOUBLE) AS order_tax_amt,
               CAST(round(j.order_net, 2) AS DOUBLE) AS order_net_amt,
               CASE WHEN j.order_gross = 0 THEN 0.0
                    ELSE j.order_discount::DOUBLE / j.order_gross::DOUBLE * 100 END AS order_discount_pct_effective,
               CASE WHEN j.order_net_bt = 0 THEN 0.0
                    ELSE j.order_tax::DOUBLE / j.order_net_bt::DOUBLE * 100 END AS order_vat_pct_effective,
               CAST(CAST(j.vat_pct_src AS DECIMAL(38,6)) AS DOUBLE) AS vat_pct_src,
               p.ship_area, p.ship_addr_id
        FROM joined j LEFT JOIN picked p ON p.order_id = j.order_id
        ORDER BY j.order_id""")))
}
