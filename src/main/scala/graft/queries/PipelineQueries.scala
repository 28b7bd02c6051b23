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
        ORDER BY c.customer_id""")))
}
