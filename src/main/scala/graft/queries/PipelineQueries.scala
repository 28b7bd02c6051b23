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
        ORDER BY cohort_month""")))
}
