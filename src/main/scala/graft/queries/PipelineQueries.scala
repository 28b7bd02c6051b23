package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.Kernels._
import graft.plans.Pipeline
import graft.sources.Tables

/** DAG-runner demonstration (q39): one staging node feeding two
  * aggregates that join into a summary — the reference's
  * stg_orders-with-four-consumers shape. The shared staging node is
  * memoized+persisted by the Pipeline, so its scan/normalize plan runs
  * once, not once per consumer.
  */
object PipelineQueries {

  /** Shared DuckDB lineage of the line-money fact chain (stg_orders +
    * stg_order_items → fct_order_items money math → per-order rollup),
    * reused by the q64/q76/q77 oracles so the three gates can't drift. */
  private val MoneyLineageCtes = """items AS (
          SELECT l_orderkey AS order_id,
                 CAST(l_quantity AS DECIMAL(18,6)) AS quantity,
                 CAST(l_extendedprice AS DECIMAL(18,6)) AS unit_price,
                 (l_partkey % 2 = 1) AS has_vat,
                 COALESCE(CAST(l_discount * 100 AS DECIMAL(18,6)), CAST(0 AS DECIMAL(18,6))) AS discount_pct,
                 upper(COALESCE(CASE l_linenumber % 3 WHEN 0 THEN 'PERCENTAGE'
                                                     WHEN 1 THEN 'amount' END,
                                'PERCENTAGE')) AS dat
          FROM lineitem),
        stg_o AS (
          SELECT o_orderkey AS order_id, o_custkey AS customer_id,
                 o_orderdate AS created_at_utc,
                 CAST(o_orderdate AS DATE) AS order_date,
                 CASE o_orderstatus WHEN 'O' THEN 'open' WHEN 'F' THEN 'fulfilled'
                                    WHEN 'P' THEN 'pending' ELSE 'unknown' END AS status_canonical,
                 CAST((o_orderkey % 3) * 5 AS DECIMAL(18,6)) AS vat_pct,
                 CASE o_orderkey % 5 WHEN 0 THEN 'web' WHEN 1 THEN 'app'
                                     WHEN 2 THEN 'phone' WHEN 3 THEN 'store'
                                     ELSE 'partner' END AS channel
          FROM orders),
        lines AS (
          SELECT i.order_id,
                 CAST(CAST(i.quantity AS DECIMAL(28,6)) * i.unit_price AS DECIMAL(18,6)) AS line_gross,
                 CAST(CASE WHEN i.dat = 'PERCENTAGE'
                           THEN LEAST(GREATEST(i.discount_pct, 0), 100)
                           ELSE CAST(0 AS DECIMAL(18,6)) END AS DECIMAL(18,6)) AS disc_eff,
                 i.has_vat, o.vat_pct
          FROM items i LEFT JOIN stg_o o USING (order_id)),
        math AS (
          SELECT order_id,
                 line_gross,
                 CAST(line_gross - CAST(line_gross AS DECIMAL(28,6)) * CAST(disc_eff / 100 AS DECIMAL(18,6)) AS DECIMAL(18,6)) AS line_net_bt,
                 has_vat, vat_pct
          FROM lines),
        math2 AS (
          SELECT order_id, line_gross, line_net_bt,
                 CASE WHEN has_vat
                      THEN CAST(CAST(line_net_bt AS DECIMAL(28,6)) * CAST(vat_pct / 100 AS DECIMAL(18,6)) AS DECIMAL(18,6))
                      ELSE CAST(0 AS DECIMAL(18,6)) END AS line_tax
          FROM math),
        rollup AS (
          SELECT order_id, COUNT(*) AS item_count,
                 CAST(SUM(line_gross) AS DECIMAL(38,6)) AS order_gross,
                 CAST(SUM(line_net_bt) AS DECIMAL(38,6)) AS order_net_before_tax,
                 CAST(SUM(line_tax) AS DECIMAL(38,6)) AS order_tax,
                 CAST(SUM(CAST(line_net_bt + line_tax AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS order_net
          FROM math2 GROUP BY 1)"""

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q39_pipeline_dag",
      (s, dir) => {
        val p = new Pipeline
        p.register("stg_orders") { _ =>
          Tables.orders(s, dir).select(
            col("o_custkey").as("customer_id"),
            to_date(col("o_orderdate")).as("order_date"),
            dec6(col("o_totalprice")).as("revenue"))
        }
        p.register("cust_stats", deps = Seq("stg_orders")) { d =>
          d("stg_orders").groupBy(col("customer_id")).agg(
            count(lit(1)).as("n_orders"),
            money(sum(col("revenue"))).as("revenue_to_date"))
        }
        p.register("monthly", deps = Seq("stg_orders")) { d =>
          d("stg_orders")
            .groupBy(col("customer_id"), trunc(col("order_date"), "month").as("month_start"))
            .agg(money(sum(col("revenue"))).as("month_revenue"))
        }
        p.register("summary", deps = Seq("cust_stats", "monthly")) { d =>
          val activity = d("monthly").groupBy(col("customer_id")).agg(
            count(lit(1)).as("n_active_months"),
            money(max(col("month_revenue"))).as("best_month_revenue"))
          d("cust_stats").join(activity, Seq("customer_id"))
            .select(col("customer_id"), col("n_orders"), col("n_active_months"),
              moneyOut(col("revenue_to_date")).as("revenue_to_date"),
              moneyOut(col("best_month_revenue")).as("best_month_revenue"))
        }
        p.build("summary").orderBy(col("customer_id"))
      },
      Some("""
        WITH stg AS (
          SELECT o_custkey AS customer_id,
                 CAST(o_orderdate AS DATE) AS order_date,
                 CAST(o_totalprice AS DECIMAL(18,6)) AS revenue
          FROM orders),
        cust_stats AS (
          SELECT customer_id, COUNT(*) AS n_orders,
                 CAST(SUM(revenue) AS DECIMAL(38,6)) AS revenue_to_date
          FROM stg GROUP BY 1),
        monthly AS (
          SELECT customer_id, date_trunc('month', order_date) AS month_start,
                 CAST(SUM(revenue) AS DECIMAL(38,6)) AS month_revenue
          FROM stg GROUP BY 1, 2),
        activity AS (
          SELECT customer_id, COUNT(*) AS n_active_months,
                 CAST(MAX(month_revenue) AS DECIMAL(38,6)) AS best_month_revenue
          FROM monthly GROUP BY 1)
        SELECT c.customer_id, c.n_orders, a.n_active_months,
               CAST(c.revenue_to_date AS DOUBLE) AS revenue_to_date,
               CAST(a.best_month_revenue AS DOUBLE) AS best_month_revenue
        FROM cust_stats c JOIN activity a USING (customer_id)
        ORDER BY c.customer_id""")),

    // The NAMED model catalog run end-to-end by reference model name:
    // stg_orders/stg_order_items → fct_orders_revenue →
    // fct_customer_monthly_revenue → customer_revenue_ltv →
    // cohort_revenue_ltv (reference facts/cohort_revenue_ltv.sql lineage,
    // 5 models deep). The oracle recomputes the whole chain — proving the
    // catalog's composition is correct, not merely runnable.
    QueryDef(
      "q56_model_catalog_ltv",
      (s, dir) => {
        val p = graft.plans.ModelCatalog(s, dir)
        p.build("cohort_revenue_ltv")
          .select(col("cohort_month"),
            col("n_customers"),
            moneyOut(col("cohort_ltv_3m")).as("cohort_ltv_3m"),
            moneyOut(col("cohort_ltv_12m")).as("cohort_ltv_12m"))
          .orderBy(col("cohort_month"))
      },
      Some("""
        WITH stg_orders AS (
          SELECT o_orderkey AS order_id, o_custkey AS customer_id,
                 CAST(o_orderdate AS DATE) AS order_date
          FROM orders),
        items AS (
          SELECT l_orderkey AS order_id,
                 CAST(CAST(l_quantity AS DECIMAL(28,6)) * CAST(l_extendedprice AS DECIMAL(18,6)) AS DECIMAL(18,6)) AS line_rev
          FROM lineitem),
        rev AS (SELECT order_id, CAST(SUM(line_rev) AS DECIMAL(38,6)) AS revenue
                FROM items GROUP BY 1),
        orders_rev AS (
          SELECT s.order_id, s.customer_id, s.order_date,
                 COALESCE(r.revenue, CAST(0 AS DECIMAL(38,6))) AS revenue
          FROM stg_orders s LEFT JOIN rev r USING (order_id)),
        monthly AS (
          SELECT customer_id, date_trunc('month', order_date) AS month_start,
                 CAST(SUM(revenue) AS DECIMAL(38,6)) AS month_revenue
          FROM orders_rev GROUP BY 1, 2),
        firsts AS (
          SELECT customer_id, MIN(order_date) AS first_order_date
          FROM orders_rev GROUP BY 1),
        ltv AS (
          SELECT m.customer_id, f.first_order_date,
                 CAST(SUM(CASE WHEN (year(m.month_start) - year(f.first_order_date)) * 12
                                  + (month(m.month_start) - month(f.first_order_date)) < 3
                               THEN m.month_revenue END) AS DECIMAL(38,6)) AS ltv_3m,
                 CAST(SUM(CASE WHEN (year(m.month_start) - year(f.first_order_date)) * 12
                                  + (month(m.month_start) - month(f.first_order_date)) < 12
                               THEN m.month_revenue END) AS DECIMAL(38,6)) AS ltv_12m
          FROM monthly m JOIN firsts f USING (customer_id)
          GROUP BY 1, 2)
        SELECT date_trunc('month', first_order_date) AS cohort_month,
               COUNT(*) AS n_customers,
               CAST(CAST(SUM(ltv_3m) AS DECIMAL(38,6)) AS DOUBLE) AS cohort_ltv_3m,
               CAST(CAST(SUM(ltv_12m) AS DECIMAL(38,6)) AS DOUBLE) AS cohort_ltv_12m
        FROM ltv
        GROUP BY 1
        ORDER BY cohort_month""")),

    // The catalog's FLAGSHIP model gated end-to-end: fct_orders built by
    // name pulls five upstream models (fct_order_items line math with
    // PERCENTAGE-gated discounts, stg_orders status/channel decodes,
    // stg_transactions payment methods, stg_users mapping, stg_addresses
    // as-of pick). The oracle recomputes the whole five-model lineage.
    QueryDef(
      "q64_catalog_fct_orders",
      (s, dir) => {
        val p = graft.plans.ModelCatalog(s, dir)
        p.build("fct_orders")
          .select(col("order_sk"), col("order_id"), col("customer_id"),
            col("user_id"), col("order_date"), col("status_canonical"),
            col("channel"), col("payment_method"), col("item_count"),
            moneyOut(col("order_gross")).as("order_gross"),
            moneyOut(col("order_net_before_tax")).as("order_net_before_tax"),
            moneyOut(col("order_tax")).as("order_tax"),
            moneyOut(col("order_net")).as("order_net"),
            col("ship_area"), col("ship_addr_id"))
          .orderBy(col("order_id"))
      },
      Some(s"""
        WITH $MoneyLineageCtes,
        txn AS (
          SELECT o_orderkey AS order_id,
                 CASE o_orderkey % 4 WHEN 0 THEN 'card' WHEN 1 THEN 'cash'
                                     WHEN 2 THEN 'wallet' ELSE 'cod' END AS payment_method
          FROM orders),
        users AS (
          SELECT c_custkey + 500000 AS user_id, c_custkey AS customer_id FROM customer),
        addr AS (
          SELECT c_custkey AS customer_id,
                 c_mktsegment || '#v' || v AS ship_area,
                 c_custkey * 2 + v AS addr_id,
                 CAST(DATE '1993-01-01' + ((c_custkey % 200) + v * 1200) * INTERVAL 1 DAY AS TIMESTAMP) AS valid_from
          FROM customer, (SELECT unnest([0, 1]) AS v)),
        picked AS (
          SELECT order_id, ship_area, addr_id AS ship_addr_id FROM (
            SELECT o.order_id, a.ship_area, a.addr_id,
                   row_number() OVER (PARTITION BY o.order_id ORDER BY
                     CASE WHEN a.valid_from <= o.created_at_utc THEN 0 ELSE 1 END,
                     abs(epoch_us(a.valid_from) - epoch_us(o.created_at_utc)), a.addr_id) AS rn
            FROM stg_o o LEFT JOIN addr a ON a.customer_id = o.customer_id) t
          WHERE rn = 1)
        SELECT md5(COALESCE(CAST(o.order_id AS VARCHAR), '_dbt_utils_surrogate_key_null_')) AS order_sk,
               o.order_id, o.customer_id, u.user_id, o.order_date,
               o.status_canonical, o.channel, t.payment_method,
               r.item_count,
               CAST(r.order_gross AS DOUBLE) AS order_gross,
               CAST(r.order_net_before_tax AS DOUBLE) AS order_net_before_tax,
               CAST(r.order_tax AS DOUBLE) AS order_tax,
               CAST(r.order_net AS DOUBLE) AS order_net,
               p.ship_area, p.ship_addr_id
        FROM stg_o o
        LEFT JOIN rollup r USING (order_id)
        LEFT JOIN txn t USING (order_id)
        LEFT JOIN users u USING (customer_id)
        LEFT JOIN picked p USING (order_id)
        ORDER BY o.order_id""")),

    // The reference's declared-but-empty agg_orders_daily implemented as a
    // catalog node off fct_orders: daily counts, distinct buyers, money
    // totals. The distinct-buyer count is computed in a SEPARATE
    // pre-deduped aggregate joined back on order_date — mixing it into
    // the sums aggregate would plan through Expand (doubling the
    // aggregate input; the round-2 q46 cliff).
    QueryDef(
      "q76_agg_orders_daily",
      (s, dir) => {
        val p = graft.plans.ModelCatalog(s, dir)
        p.build("agg_orders_daily")
          .select(col("order_date"), col("n_orders"), col("n_customers"),
            moneyOut(col("day_gross")).as("day_gross"),
            moneyOut(col("day_tax")).as("day_tax"),
            moneyOut(col("day_net")).as("day_net"))
          .orderBy(col("order_date"))
      },
      Some(s"""
        WITH $MoneyLineageCtes
        SELECT o.order_date,
               COUNT(*) AS n_orders,
               COUNT(DISTINCT o.customer_id) AS n_customers,
               CAST(CAST(SUM(r.order_gross) AS DECIMAL(38,6)) AS DOUBLE) AS day_gross,
               CAST(CAST(SUM(r.order_tax) AS DECIMAL(38,6)) AS DOUBLE) AS day_tax,
               CAST(CAST(SUM(r.order_net) AS DECIMAL(38,6)) AS DOUBLE) AS day_net
        FROM stg_o o LEFT JOIN rollup r USING (order_id)
        GROUP BY o.order_date
        ORDER BY o.order_date""")),

    // agg_items_daily (reference 0-byte placeholder): daily line-item
    // volume + money off fct_order_items, distinct-order count split the
    // same way.
    QueryDef(
      "q77_agg_items_daily",
      (s, dir) => {
        val p = graft.plans.ModelCatalog(s, dir)
        p.build("agg_items_daily")
          .select(col("order_date"), col("n_line_items"), col("n_orders"),
            moneyOut(col("day_line_gross")).as("day_line_gross"),
            moneyOut(col("day_line_net")).as("day_line_net"))
          .orderBy(col("order_date"))
      },
      Some(s"""
        WITH $MoneyLineageCtes
        SELECT o.order_date,
               COUNT(*) AS n_line_items,
               COUNT(DISTINCT m.order_id) AS n_orders,
               CAST(CAST(SUM(m.line_gross) AS DECIMAL(38,6)) AS DOUBLE) AS day_line_gross,
               CAST(CAST(SUM(CAST(m.line_net_bt + m.line_tax AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS day_line_net
        FROM math2 m LEFT JOIN stg_o o USING (order_id)
        GROUP BY o.order_date
        ORDER BY o.order_date""")),

    // dim_product (reference 0-byte placeholder): the product dim joining
    // the three product staging models (details + brand/category
    // surrogate lookups) — both lookup joins broadcast at any scale
    // (distinct brands/categories are tiny by construction).
    QueryDef(
      "q78_dim_product",
      (s, dir) => {
        val p = graft.plans.ModelCatalog(s, dir)
        p.build("dim_product")
          .select(col("product_sk"), col("product_id"), col("product_name"),
            col("brand"), col("brand_id"), col("category"), col("category_id"),
            col("size").cast("long").as("size"), col("retail_price"))
          .orderBy(col("product_id"))
      },
      Some("""
        WITH details AS (
          SELECT p_partkey AS product_id, p_name AS product_name,
                 p_brand AS brand, p_type AS category, p_size AS size,
                 p_retailprice AS retail_price
          FROM part),
        brands AS (
          SELECT md5(COALESCE(CAST(brand AS VARCHAR), '_dbt_utils_surrogate_key_null_')) AS brand_id, brand
          FROM (SELECT DISTINCT p_brand AS brand FROM part)),
        cats AS (
          SELECT md5(COALESCE(CAST(category AS VARCHAR), '_dbt_utils_surrogate_key_null_')) AS category_id, category
          FROM (SELECT DISTINCT p_type AS category FROM part))
        SELECT md5(COALESCE(CAST(d.product_id AS VARCHAR), '_dbt_utils_surrogate_key_null_')) AS product_sk,
               d.product_id, d.product_name, d.brand, b.brand_id,
               d.category, c.category_id,
               CAST(d.size AS BIGINT) AS size, d.retail_price
        FROM details d
        LEFT JOIN brands b USING (brand)
        LEFT JOIN cats c USING (category)
        ORDER BY d.product_id""")))
}
