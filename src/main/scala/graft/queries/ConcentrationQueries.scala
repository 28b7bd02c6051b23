package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.sources.Tables

/** Round-5 market-structure batch: Herfindahl-Hirschman supplier
  * concentration, Gini-impurity class-mix audits, and the discrete-time
  * retention hazard curve. All three are ratios of exact integer sums
  * emitted as positive-integral-divide ppm BIGINTs — no float touches any
  * row, so the driver hash is engine-independent by construction.
  */
object ConcentrationQueries {

  private def cents(c: org.apache.spark.sql.Column) =
    (c.cast(DecimalType(18, 2)) * 100).cast("long")

  val defs: Seq[QueryDef] = Seq(

    // Herfindahl-Hirschman index of supplier revenue concentration per
    // nation: HHI = sum(share_i^2) = sum(r_i^2)/(sum r)^2, emitted as ppm
    // by one positive integral divide of DECIMAL(38,0) products (r^2
    // overflows int64 past ~sf0.5). One partial-aggregable rollup to
    // (nation, supplier), then a nation-frame aggregate 1/|lineitem| the
    // size of the fact.
    QueryDef(
      "q195_hhi_concentration",
      (s, dir) => {
        val l = Tables.lineitem(s, dir)
        val sup = Tables.supplier(s, dir)
          .select(col("s_suppkey"), col("s_nationkey").cast("long").as("nation"))
        val rev = l.join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("nation"), col("l_suppkey").as("sk"))
          .agg(sum(cents(col("l_extendedprice"))).as("r"))
        rev.groupBy(col("nation"))
          .agg(count(lit(1)).as("n_suppliers"),
            sum(col("r")).cast(DecimalType(38, 0)).as("tot"),
            sum(col("r").cast(DecimalType(38, 0)) * col("r")).as("sq"))
          .select(col("nation"), col("n_suppliers"),
            col("tot").cast("long").as("total_rev_cents"),
            expr("CAST((CAST(1000000 AS DECIMAL(38,0)) * sq) div (tot*tot) AS BIGINT)")
              .as("hhi_ppm"))
          .orderBy(col("nation"))
      },
      Some("""
        WITH sup AS (
          SELECT s.s_nationkey AS nation, l.l_suppkey AS sk,
                 CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2))*100 AS BIGINT)) AS BIGINT) AS r
          FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
          GROUP BY 1,2),
        agg AS (
          SELECT nation, CAST(COUNT(*) AS BIGINT) AS n_suppliers,
                 CAST(SUM(r) AS HUGEINT) AS tot,
                 CAST(SUM(CAST(r AS HUGEINT)*r) AS HUGEINT) AS sq
          FROM sup GROUP BY 1)
        SELECT CAST(nation AS BIGINT) AS nation, n_suppliers,
               CAST(tot AS BIGINT) AS total_rev_cents,
               CAST((1000000*sq) // (tot*tot) AS BIGINT) AS hhi_ppm
        FROM agg ORDER BY nation""")),

    // Gini impurity of the order-status mix per priority: 1 - sum(p_c^2)
    // = (n^2 - sum(c^2))/n^2 as exact ppm — the split-quality measure a
    // decision-tree trainer and a label-balance audit both need, with no
    // log and no float. Two partial-aggregable passes; the class frame is
    // |priorities| x |statuses|.
    QueryDef(
      "q196_class_impurity",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val c = o.groupBy(col("o_orderpriority").as("priority"),
            col("o_orderstatus").as("status"))
          .agg(count(lit(1)).as("c"))
        c.groupBy(col("priority"))
          .agg(sum(col("c")).as("n"), count(lit(1)).as("n_classes"),
            sum(col("c").cast(DecimalType(38, 0)) * col("c")).as("sq"))
          .select(col("priority"), col("n"), col("n_classes"),
            expr("CAST((CAST(1000000 AS DECIMAL(38,0)) * (CAST(n AS DECIMAL(38,0))*n - sq)) div (CAST(n AS DECIMAL(38,0))*n) AS BIGINT)")
              .as("impurity_ppm"))
          .orderBy(col("priority"))
      },
      Some("""
        WITH c AS (
          SELECT o_orderpriority AS priority, o_orderstatus AS status,
                 CAST(COUNT(*) AS BIGINT) AS c
          FROM orders GROUP BY 1,2),
        agg AS (
          SELECT priority, CAST(SUM(c) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS n_classes,
                 CAST(SUM(CAST(c AS HUGEINT)*c) AS HUGEINT) AS sq
          FROM c GROUP BY 1)
        SELECT priority, n, n_classes,
               CAST((1000000*(CAST(n AS HUGEINT)*n - sq)) // (CAST(n AS HUGEINT)*n) AS BIGINT) AS impurity_ppm
        FROM agg ORDER BY priority""")),

    // Discrete-time retention hazard: lifetime = months between first and
    // last order per customer; hazard(k) = churned-at-k / at-risk-at-k,
    // where at-risk is the suffix sum over the age frame (a descending
    // cumulative window on a frame bounded by the CALENDAR SPAN in months,
    // ~85 rows, where a single-partition window is free — the per-customer
    // min/max is the only full-data pass and it partial-aggs). hazard_ppm
    // is a positive integral divide. Truncated at age 24 for a stable
    // reporting surface; the at-risk denominators still count the full
    // tail.
    QueryDef(
      "q197_retention_hazard",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val ym = (year(col("o_orderdate")) * 12 + month(col("o_orderdate"))).cast("long")
        val life = o.groupBy(col("o_custkey"))
          .agg(min(ym).as("first_ym"), max(ym).as("last_ym"))
          .select((col("last_ym") - col("first_ym")).as("age"))
        val ages = life.groupBy(col("age")).agg(count(lit(1)).as("n_churn"))
        val wDesc = Window.orderBy(col("age").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ages.withColumn("n_at_risk", sum(col("n_churn")).over(wDesc))
          .where(col("age") <= 24)
          .select(col("age"), col("n_churn"), col("n_at_risk"),
            expr("CAST((1000000 * n_churn) div n_at_risk AS BIGINT)").as("hazard_ppm"))
          .orderBy(col("age"))
      },
      Some("""
        WITH fo AS (
          SELECT o_custkey AS ck,
                 CAST(MIN(YEAR(CAST(o_orderdate AS DATE))*12 + MONTH(CAST(o_orderdate AS DATE))) AS BIGINT) AS first_ym,
                 CAST(MAX(YEAR(CAST(o_orderdate AS DATE))*12 + MONTH(CAST(o_orderdate AS DATE))) AS BIGINT) AS last_ym
          FROM orders GROUP BY 1),
        ages AS (
          SELECT last_ym - first_ym AS age, CAST(COUNT(*) AS BIGINT) AS n_churn
          FROM fo GROUP BY 1),
        haz AS (
          SELECT age, n_churn,
                 CAST(SUM(n_churn) OVER (ORDER BY age DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_at_risk
          FROM ages)
        SELECT CAST(age AS BIGINT) AS age, n_churn, n_at_risk,
               CAST((1000000*n_churn) // n_at_risk AS BIGINT) AS hazard_ppm
        FROM haz WHERE age <= 24 ORDER BY age"""))
  )
}
