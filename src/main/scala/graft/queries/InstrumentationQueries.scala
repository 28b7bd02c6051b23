package graft.queries

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.sources.Tables

/** Pipeline instrumentation through Spark's `observe()` / CollectMetrics:
  * data-quality counters computed ON the production pass itself (zero
  * extra scans — the metrics ride the same physical plan as the filter),
  * the way a production ingest job reports its input/kept/dropped counts
  * without a second read of the source.
  */
object InstrumentationQueries {

  val defs: Seq[QueryDef] = Seq(

    // Observed ingest funnel: one scan of orders flows through an input
    // observation, the quality filter (>= $1000), and an output
    // observation; a noop write triggers the pass and the observed
    // metrics become the result row. The oracle recomputes the same
    // counters with plain SQL — gating that CollectMetricsExec sees
    // every row exactly once on both sides of the filter. 100 TB: the
    // metrics are partial-aggregated per task and merged on the driver
    // by the exec itself (that is the operator's contract); nothing here
    // collects data rows. Sums ride DECIMAL(38,0) inside the
    // observation, read back as exact BigDecimal.
    QueryDef(
      "q198_observe_metrics",
      (s, dir) => {
        val cents = (col("o_totalprice").cast(DecimalType(18, 2)) * 100).cast("long")
        val obsIn = Observation("ingest_in")
        val obsOut = Observation("ingest_out")
        val flow = Tables.orders(s, dir)
          .select(cents.as("v"))
          .observe(obsIn,
            count(lit(1)).as("n_input"),
            sum(col("v").cast(DecimalType(38, 0))).as("sum_input_cents"),
            max(col("v")).as("max_input_cents"))
          .where(col("v") >= 100000L)
          .observe(obsOut,
            count(lit(1)).as("n_kept"),
            sum(col("v").cast(DecimalType(38, 0))).as("sum_kept_cents"))
        flow.write.format("noop").mode("overwrite").save()
        val in = obsIn.get
        val out = obsOut.get
        import s.implicits._
        Seq((
          in("n_input").asInstanceOf[Long],
          in("sum_input_cents").asInstanceOf[java.math.BigDecimal].longValueExact(),
          in("max_input_cents").asInstanceOf[Long],
          out("n_kept").asInstanceOf[Long],
          out("sum_kept_cents").asInstanceOf[java.math.BigDecimal].longValueExact(),
          in("n_input").asInstanceOf[Long] - out("n_kept").asInstanceOf[Long]
        )).toDF("n_input", "sum_input_cents", "max_input_cents",
          "n_kept", "sum_kept_cents", "n_dropped")
      },
      Some("""
        WITH v AS (
          SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT) AS v FROM orders)
        SELECT CAST(COUNT(*) AS BIGINT) AS n_input,
               CAST(SUM(v) AS BIGINT) AS sum_input_cents,
               CAST(MAX(v) AS BIGINT) AS max_input_cents,
               CAST(SUM(CASE WHEN v >= 100000 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
               CAST(SUM(CASE WHEN v >= 100000 THEN v END) AS BIGINT) AS sum_kept_cents,
               CAST(SUM(CASE WHEN v < 100000 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
        FROM v"""))
  )
}
