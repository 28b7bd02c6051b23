package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Kernels._
import graft.sources.Tables

/** The LTV/cohort analytics chain — reference models
  * fct_orders_revenue.sql → fct_customer_monthly_revenue.sql →
  * customer_revenue_ltv.sql → cohort_revenue_ltv.sql / first_channel_ltv.sql
  * re-expressed over the star schema (orders ↔ transactions).
  *
  * Scale notes: the whole chain groups/joins on customer_id, so one
  * hash-partitioning on customer_id is reused across stages (Catalyst reuses
  * the exchange); month rollup is a map-side-combinable sum; percentiles are
  * per-cohort exact (bounded group sizes), not global.
  */
object LtvQueries {

  /** fct_customer_monthly_revenue (reference file, lines 1-38): per-customer
    * month rollup + calendar months_since_acq (Snowflake datediff(month)
    * boundary semantics — SURVEY §4.3#4). */
  private def monthly(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir).select(
      col("o_custkey").as("customer_id"),
      to_date(col("o_orderdate")).as("order_date"),
      dec6(col("o_totalprice")).as("order_revenue"))
    val firsts = o.groupBy(col("customer_id"))
      .agg(min(col("order_date")).as("first_order_date"))
    val byMonth = o.groupBy(col("customer_id"), trunc(col("order_date"), "month").as("month_start"))
      .agg(money(sum(col("order_revenue"))).as("month_revenue"))
    byMonth.join(firsts, Seq("customer_id"))
      .withColumn(
        "months_since_acq",
        monthsBetweenCalendar(col("month_start"), trunc(col("first_order_date"), "month")).cast("long"))
      .filter(col("months_since_acq") >= 0)
      .select(col("customer_id"), col("first_order_date"), col("month_start"),
        col("months_since_acq"), col("month_revenue"))
  }

  private val monthlySql = """
    WITH o AS (
      SELECT o_custkey AS customer_id, CAST(o_orderdate AS DATE) AS order_date,
             CAST(o_totalprice AS DECIMAL(18,6)) AS order_revenue
      FROM orders),
    firsts AS (
      SELECT customer_id, MIN(order_date) AS first_order_date FROM o GROUP BY customer_id),
    by_month AS (
      SELECT customer_id, CAST(date_trunc('month', order_date) AS DATE) AS month_start,
             CAST(SUM(order_revenue) AS DECIMAL(38,6)) AS month_revenue
      FROM o GROUP BY 1, 2)
    SELECT b.customer_id, f.first_order_date, b.month_start,
           (year(b.month_start) - year(date_trunc('month', f.first_order_date))) * 12
             + (month(b.month_start) - month(date_trunc('month', f.first_order_date))) AS months_since_acq,
           b.month_revenue
    FROM by_month b JOIN firsts f USING (customer_id)
    WHERE (year(b.month_start) - year(date_trunc('month', f.first_order_date))) * 12
             + (month(b.month_start) - month(date_trunc('month', f.first_order_date))) >= 0"""

  /** customer_revenue_ltv (reference file, lines 1-40): horizon-bucketed
    * conditional sums + rollup joins, nulls coalesced to 0. */
  private def ltv(s: SparkSession, dir: String): DataFrame = {
    val m = monthly(s, dir)
    val zero = lit(0).cast(Money)
    def horizon(k: Int, as: String) =
      coalesce(money(sum(when(col("months_since_acq").between(0, k), col("month_revenue")))), zero).as(as)
    val roll = m.groupBy(col("customer_id"), col("first_order_date"))
      .agg(horizon(5, "ltv_revenue_6m"), horizon(11, "ltv_revenue_12m"), horizon(23, "ltv_revenue_24m"))
    val o = Tables.orders(s, dir).select(
      col("o_custkey").as("customer_id"), dec6(col("o_totalprice")).as("order_revenue"))
    // single pass: count + sum in ONE aggregate (round-1 verdict flagged
    // the two separate groupBys as a wasted scan + shuffle)
    val stats = o.groupBy(col("customer_id")).agg(
      count(lit(1)).as("orders_count"),
      money(sum(col("order_revenue"))).as("revenue_to_date"))
    roll.join(stats, Seq("customer_id"), "left")
      .select(
        col("customer_id"), col("first_order_date"),
        coalesce(col("orders_count"), lit(0L)).as("orders_count"),
        coalesce(col("revenue_to_date"), zero).as("revenue_to_date"),
        col("ltv_revenue_6m"), col("ltv_revenue_12m"), col("ltv_revenue_24m"))
  }

  private val ltvSql = s"""
    WITH m AS ($monthlySql),
    roll AS (
      SELECT customer_id, first_order_date,
        COALESCE(CAST(SUM(CASE WHEN months_since_acq BETWEEN 0 AND 5  THEN month_revenue END) AS DECIMAL(38,6)), CAST(0 AS DECIMAL(38,6))) AS ltv_revenue_6m,
        COALESCE(CAST(SUM(CASE WHEN months_since_acq BETWEEN 0 AND 11 THEN month_revenue END) AS DECIMAL(38,6)), CAST(0 AS DECIMAL(38,6))) AS ltv_revenue_12m,
        COALESCE(CAST(SUM(CASE WHEN months_since_acq BETWEEN 0 AND 23 THEN month_revenue END) AS DECIMAL(38,6)), CAST(0 AS DECIMAL(38,6))) AS ltv_revenue_24m
      FROM m GROUP BY 1, 2),
    o AS (SELECT o_custkey AS customer_id, CAST(o_totalprice AS DECIMAL(18,6)) AS order_revenue FROM orders),
    cnt AS (SELECT customer_id, COUNT(*) AS orders_count FROM o GROUP BY 1),
    rtd AS (SELECT customer_id, CAST(SUM(order_revenue) AS DECIMAL(38,6)) AS revenue_to_date FROM o GROUP BY 1)
    SELECT r.customer_id, r.first_order_date,
           COALESCE(c.orders_count, 0) AS orders_count,
           COALESCE(t.revenue_to_date, CAST(0 AS DECIMAL(38,6))) AS revenue_to_date,
           r.ltv_revenue_6m, r.ltv_revenue_12m, r.ltv_revenue_24m
    FROM roll r
    LEFT JOIN cnt c ON c.customer_id = r.customer_id
    LEFT JOIN rtd t ON t.customer_id = r.customer_id"""

  val defs: Seq[QueryDef] = Seq(

    // Terminal money columns leave as double (one exact-decimal→IEEE
    // conversion, identical on both engines — the driver's hash contract);
    // the internal monthly/ltv chains stay decimal(38,6) for exactness.
    QueryDef(
      "q05_monthly_revenue",
      (s, dir) => monthly(s, dir)
        .withColumn("month_revenue", moneyOut(col("month_revenue")))
        .orderBy(col("customer_id"), col("month_start")),
      Some(s"""
        SELECT customer_id, first_order_date, month_start, months_since_acq,
               CAST(month_revenue AS DOUBLE) AS month_revenue
        FROM ($monthlySql)
        ORDER BY customer_id, month_start""")),

    QueryDef(
      "q06_customer_ltv",
      (s, dir) => ltv(s, dir)
        .withColumn("revenue_to_date", moneyOut(col("revenue_to_date")))
        .withColumn("ltv_revenue_6m", moneyOut(col("ltv_revenue_6m")))
        .withColumn("ltv_revenue_12m", moneyOut(col("ltv_revenue_12m")))
        .withColumn("ltv_revenue_24m", moneyOut(col("ltv_revenue_24m")))
        .orderBy(col("customer_id")),
      Some(s"""
        SELECT customer_id, first_order_date, orders_count,
               CAST(revenue_to_date AS DOUBLE) AS revenue_to_date,
               CAST(ltv_revenue_6m  AS DOUBLE) AS ltv_revenue_6m,
               CAST(ltv_revenue_12m AS DOUBLE) AS ltv_revenue_12m,
               CAST(ltv_revenue_24m AS DOUBLE) AS ltv_revenue_24m
        FROM ($ltvSql)
        ORDER BY 1""")),

    // cohort_revenue_ltv (reference lines 1-19): per-cohort avg + exact
    // interpolated percentiles (percentile_cont semantics).
    QueryDef(
      "q07_cohort_ltv",
      (s, dir) => {
        val c = ltv(s, dir).select(
          col("customer_id"),
          trunc(col("first_order_date"), "month").as("cohort_month"),
          col("ltv_revenue_6m"), col("ltv_revenue_12m"), col("ltv_revenue_24m"),
          col("ltv_revenue_12m").cast("double").as("ltv12d"))
        c.groupBy(col("cohort_month"))
          .agg(
            countDistinct(col("customer_id")).as("customers"),
            exactAvg(sum(col("ltv_revenue_6m")), count(lit(1))).as("avg_ltv_6m"),
            exactAvg(sum(col("ltv_revenue_12m")), count(lit(1))).as("avg_ltv_12m"),
            exactAvg(sum(col("ltv_revenue_24m")), count(lit(1))).as("avg_ltv_24m"),
            round(expr("percentile(ltv12d, 0.50)"), 6).as("p50_ltv_12m"),
            round(expr("percentile(ltv12d, 0.75)"), 6).as("p75_ltv_12m"))
          .orderBy(col("cohort_month"))
      },
      Some(s"""
        WITH l AS ($ltvSql),
        c AS (
          SELECT customer_id, CAST(date_trunc('month', first_order_date) AS DATE) AS cohort_month,
                 ltv_revenue_6m, ltv_revenue_12m, ltv_revenue_24m,
                 CAST(ltv_revenue_12m AS DOUBLE) AS ltv12d
          FROM l)
        SELECT cohort_month,
          COUNT(DISTINCT customer_id) AS customers,
          CAST(SUM(ltv_revenue_6m)  AS DOUBLE) / COUNT(*) AS avg_ltv_6m,
          CAST(SUM(ltv_revenue_12m) AS DOUBLE) / COUNT(*) AS avg_ltv_12m,
          CAST(SUM(ltv_revenue_24m) AS DOUBLE) / COUNT(*) AS avg_ltv_24m,
          round(percentile_cont(0.50) WITHIN GROUP (ORDER BY ltv12d), 6) AS p50_ltv_12m,
          round(percentile_cont(0.75) WITHIN GROUP (ORDER BY ltv12d), 6) AS p75_ltv_12m
        FROM c
        GROUP BY cohort_month
        ORDER BY cohort_month""")),

    // first_channel_ltv (reference lines 1-27): W3 first-order pick +
    // channel-level LTV stats, round-0, ordered by avg desc.
    QueryDef(
      "q08_first_channel_ltv",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(to_date(col("o_orderdate")).asc, col("o_orderkey").asc)
        val firstOrder = o
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("o_custkey").as("customer_id"), col("o_orderpriority").as("channel"))
        val l = ltv(s, dir)
          .withColumn("ltv12d", col("ltv_revenue_12m").cast("double"))
          .withColumn("ltv24d", col("ltv_revenue_24m").cast("double"))
        firstOrder.join(l, Seq("customer_id"))
          .groupBy(col("channel"))
          .agg(
            countDistinct(col("customer_id")).as("customers"),
            round(exactAvg(sum(col("ltv_revenue_12m")), count(lit(1))), 0).as("ltv12_avg"),
            round(expr("percentile(ltv12d, 0.50)"), 0).as("ltv12_p50"),
            round(exactAvg(sum(col("ltv_revenue_24m")), count(lit(1))), 0).as("ltv24_avg"))
          .orderBy(col("ltv12_avg").desc, col("channel"))
      },
      Some(s"""
        WITH l AS ($ltvSql),
        fo AS (
          SELECT customer_id, channel FROM (
            SELECT o_custkey AS customer_id, o_orderpriority AS channel,
                   row_number() OVER (PARTITION BY o_custkey
                     ORDER BY CAST(o_orderdate AS DATE), o_orderkey) AS rn
            FROM orders) t
          WHERE rn = 1)
        SELECT fo.channel,
          COUNT(DISTINCT l.customer_id) AS customers,
          round(CAST(SUM(l.ltv_revenue_12m) AS DOUBLE) / COUNT(*), 0) AS ltv12_avg,
          round(percentile_cont(0.50) WITHIN GROUP (ORDER BY CAST(l.ltv_revenue_12m AS DOUBLE)), 0) AS ltv12_p50,
          round(CAST(SUM(l.ltv_revenue_24m) AS DOUBLE) / COUNT(*), 0) AS ltv24_avg
        FROM fo JOIN l ON fo.customer_id = l.customer_id
        GROUP BY fo.channel
        ORDER BY ltv12_avg DESC, channel"""))
  )
}
