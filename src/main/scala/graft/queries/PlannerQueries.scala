package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.functions.Kernels.{md5Bits, md5BitsModK}
import graft.sources.Tables

/** Round-5 operations batch — the planning/monitoring analytics an engine
  * runs on its own pipelines: small-files compaction planning (the
  * concat-and-split bin layout Iceberg/Spark file compaction uses),
  * distribution-drift monitoring (two-sample chi-square with exact
  * integer numerators), an out-of-orderness audit that sizes streaming
  * watermarks, and the forecasting/monitoring closed forms (seasonal-
  * naive backtest with MASE, CUSUM changepoint) — all in the repo's
  * exact-integer stance: sums and counts are BIGINT/DECIMAL(38,0),
  * every double is a final one-shot division written in the identical
  * association order on both engines.
  */
object PlannerQueries {

  private val TARGET = 65536L // compaction target bytes per output file

  val defs: Seq[QueryDef] = Seq(

    // Small-files compaction planner: concatenate each language's docs
    // in doc_id order and split at 64 KiB boundaries — file f gets every
    // doc whose starting offset lies in [f·T, (f+1)·T). bin assignment
    // is pure integer division over ONE per-lang cumulative-sum window;
    // the per-bin frame the quality stats aggregate is bounded by
    // total_bytes/T regardless of doc count. A real compactor
    // range-partitions output by (lang, file_no) and streams — nothing
    // here needs the doc payloads co-resident.
    QueryDef(
      "q184_compaction_planner",
      (s, dir) => {
        val d = Tables.documents(s, dir)
        val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val binned = d.select(col("lang"), col("doc_id"), col("n_chars").cast("long").as("bytes"))
          .withColumn("cum", sum(col("bytes")).over(w))
          .withColumn("file_no", ((col("cum") - col("bytes")) / TARGET).cast("long"))
        val perFile = binned.groupBy(col("lang"), col("file_no"))
          .agg(sum(col("bytes")).as("fbytes"), count(lit(1)).as("fdocs"))
        perFile.groupBy(col("lang"))
          .agg(
            count(lit(1)).as("n_files"),
            sum(col("fdocs")).as("n_docs"),
            sum(col("fbytes")).as("total_bytes"),
            sum(when(col("fbytes") * 2 < TARGET, 1L).otherwise(0L)).as("n_underfull"),
            max(col("fdocs")).as("max_docs_per_file"))
          .withColumn("avg_fill",
            col("total_bytes").cast("double") / (col("n_files") * TARGET).cast("double"))
          .select(col("lang"), col("n_files"), col("n_docs"), col("total_bytes"),
            col("n_underfull"), col("max_docs_per_file"), col("avg_fill"))
          .orderBy(col("lang"))
      },
      Some(s"""
        WITH binned AS (
          SELECT lang, doc_id, CAST(n_chars AS BIGINT) AS bytes,
                 CAST(SUM(CAST(n_chars AS BIGINT)) OVER (PARTITION BY lang ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
          FROM documents),
        pf AS (
          SELECT lang, (cum - bytes) // $TARGET AS file_no,
                 CAST(SUM(bytes) AS BIGINT) AS fbytes,
                 CAST(COUNT(*) AS BIGINT) AS fdocs
          FROM binned GROUP BY 1, 2)
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_files,
               CAST(SUM(fdocs) AS BIGINT) AS n_docs,
               CAST(SUM(fbytes) AS BIGINT) AS total_bytes,
               CAST(SUM(CASE WHEN fbytes * 2 < $TARGET THEN 1 ELSE 0 END) AS BIGINT) AS n_underfull,
               CAST(MAX(fdocs) AS BIGINT) AS max_docs_per_file,
               CAST(CAST(SUM(fbytes) AS BIGINT) AS DOUBLE)
                 / CAST(CAST(COUNT(*) AS BIGINT) * $TARGET AS DOUBLE) AS avg_fill
        FROM pf GROUP BY lang ORDER BY lang""")),

    // Two-sample chi-square drift monitor between the deterministic A/B
    // arms over 8 equi-width order-value bins: χ² = Σᵢ N·(oᵢ·Nt − tᵢ·Nc)²
    // / (Nc·Nt·Rᵢ). The squared numerator rides DECIMAL(38,0) (DuckDB
    // HUGEINT — it exceeds int64 beyond ~sf0.3); each bin's term is ONE
    // double division, and the 8 terms are summed in fixed textual order
    // through a conditional-aggregate pivot (the q172 stance: never let
    // the engine pick a float accumulation order). The bin frame is 8
    // rows; only the binning pass touches full data.
    QueryDef(
      "q185_chi2_drift",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val cents = (col("o_totalprice").cast(DecimalType(18, 2)) * 100).cast("long")
        val base = o.select(cents.as("v"),
          when(md5BitsModK(md5Bits(concat(lit("ab:"), col("o_custkey"))), 2L) === 0L, lit("c"))
            .otherwise(lit("t")).as("arm"))
        val mm = base.groupBy().agg(min(col("v")).as("lo"), max(col("v")).as("hi"))
        val binned = base.crossJoin(broadcast(mm))
          .select(col("arm"),
            ((col("v") - col("lo")) * 8 / (col("hi") - col("lo") + 1)).cast("long").as("bin"))
        val counts = binned.groupBy(col("bin")).agg(
          sum(when(col("arm") === "c", 1L).otherwise(0L)).as("o_i"),
          sum(when(col("arm") === "t", 1L).otherwise(0L)).as("t_i"))
        val tot = counts.groupBy().agg(sum(col("o_i")).as("nc"), sum(col("t_i")).as("nt"))
        val terms = counts.crossJoin(broadcast(tot))
          .withColumn("num",
            ((col("nc") + col("nt")).cast(DecimalType(38, 0)) *
              ((col("o_i") * col("nt") - col("t_i") * col("nc")) *
                (col("o_i") * col("nt") - col("t_i") * col("nc"))).cast(DecimalType(38, 0)))
              .cast("double"))
          .withColumn("den",
            (col("nc") * col("nt") * (col("o_i") + col("t_i"))).cast("double"))
          .withColumn("term", col("num") / col("den"))
        val aggCols = Seq(max(col("nt")).as("n_treat")) ++ (0 to 7).map(i =>
          coalesce(max(when(col("bin") === i, col("term"))), lit(0.0)).as(s"x$i"))
        val pivoted = terms.groupBy().agg(max(col("nc")).as("n_control"), aggCols: _*)
        pivoted
          .withColumn("chi2",
            col("x0") + col("x1") + col("x2") + col("x3") +
              col("x4") + col("x5") + col("x6") + col("x7"))
          .select(col("n_control"), col("n_treat"), col("chi2"),
            (col("chi2") > 14.067140449340169).as("drift_detected"))
      },
      Some("""
        WITH base AS (
          SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
                 CASE WHEN CAST(md5_number_lower('ab:' || o_custkey) % 2 AS BIGINT) = 0
                      THEN 'c' ELSE 't' END AS arm
          FROM orders),
        mm AS (SELECT MIN(v) AS lo, MAX(v) AS hi FROM base),
        binned AS (
          SELECT arm, (v - lo) * 8 // (hi - lo + 1) AS bin
          FROM base CROSS JOIN mm),
        counts AS (
          SELECT bin,
                 CAST(SUM(CASE WHEN arm = 'c' THEN 1 ELSE 0 END) AS BIGINT) AS o_i,
                 CAST(SUM(CASE WHEN arm = 't' THEN 1 ELSE 0 END) AS BIGINT) AS t_i
          FROM binned GROUP BY 1),
        tot AS (SELECT CAST(SUM(o_i) AS BIGINT) AS nc, CAST(SUM(t_i) AS BIGINT) AS nt FROM counts),
        terms AS (
          SELECT bin,
                 CAST(CAST(nc + nt AS HUGEINT) *
                      (CAST(o_i * nt - t_i * nc AS HUGEINT) * (o_i * nt - t_i * nc)) AS DOUBLE)
                 / CAST(nc * nt * (o_i + t_i) AS DOUBLE) AS term,
                 nc, nt
          FROM counts CROSS JOIN tot),
        p AS (
          SELECT MAX(nc) AS n_control, MAX(nt) AS n_treat,
                 COALESCE(MAX(CASE WHEN bin = 0 THEN term END), 0.0) AS x0,
                 COALESCE(MAX(CASE WHEN bin = 1 THEN term END), 0.0) AS x1,
                 COALESCE(MAX(CASE WHEN bin = 2 THEN term END), 0.0) AS x2,
                 COALESCE(MAX(CASE WHEN bin = 3 THEN term END), 0.0) AS x3,
                 COALESCE(MAX(CASE WHEN bin = 4 THEN term END), 0.0) AS x4,
                 COALESCE(MAX(CASE WHEN bin = 5 THEN term END), 0.0) AS x5,
                 COALESCE(MAX(CASE WHEN bin = 6 THEN term END), 0.0) AS x6,
                 COALESCE(MAX(CASE WHEN bin = 7 THEN term END), 0.0) AS x7
          FROM terms)
        SELECT n_control, n_treat,
               x0 + x1 + x2 + x3 + x4 + x5 + x6 + x7 AS chi2,
               (x0 + x1 + x2 + x3 + x4 + x5 + x6 + x7) > 14.067140449340169 AS drift_detected
        FROM p""")),

    // Out-of-orderness audit — the measurement that SIZES a streaming
    // watermark: per user, row displacement = rank by arrival (event_id)
    // minus rank by event time; its distribution tells you how deep
    // reordering runs before state can be finalized. Two row_number
    // windows over the SAME user partitioning (one exchange), then a
    // bounded 4-bucket histogram. The pct division happens on the
    // 4-row bucket frame.
    QueryDef(
      "q186_ooo_watermark_audit",
      (s, dir) => {
        val e = Tables.events(s, dir)
        val byArrival = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
        val byTime = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val disp = e.select(col("user_id"), col("event_id"), col("ts"))
          .withColumn("d",
            abs(row_number().over(byArrival).cast("long") -
              row_number().over(byTime).cast("long")))
        val buckets = disp
          .withColumn("bucket_lo",
            when(col("d") === 0, 0L).when(col("d") <= 2, 1L)
              .when(col("d") <= 7, 3L).otherwise(8L))
          .groupBy(col("bucket_lo"))
          .agg(count(lit(1)).as("n"), max(col("d")).as("max_displacement"))
        buckets
          .withColumn("pct",
            col("n").cast("double") / sum(col("n")).over(Window.partitionBy()).cast("double"))
          .select(col("bucket_lo"), col("n"), col("max_displacement"), col("pct"))
          .orderBy(col("bucket_lo"))
      },
      Some("""
        WITH disp AS (
          SELECT user_id,
                 ABS(CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id) AS BIGINT)
                   - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT)) AS d
          FROM events),
        buckets AS (
          SELECT CASE WHEN d = 0 THEN 0 WHEN d <= 2 THEN 1
                      WHEN d <= 7 THEN 3 ELSE 8 END AS bucket_lo,
                 CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(MAX(d) AS BIGINT) AS max_displacement
          FROM disp GROUP BY 1)
        SELECT CAST(bucket_lo AS BIGINT) AS bucket_lo, n, max_displacement,
               CAST(n AS DOUBLE) / CAST(CAST(SUM(n) OVER () AS BIGINT) AS DOUBLE) AS pct
        FROM buckets ORDER BY bucket_lo""")),

    // Seasonal-naive backtest with MASE (Hyndman & Koehler 2006): the
    // forecast-quality gate every demand pipeline needs. Forecast for
    // month m = actual m−12; the scale denominator is the one-step
    // naive error. Errors are EXACT |Δcents| BIGINT sums over the
    // (segment, month) pre-aggregate (≤ 5×84 rows); MAE is one double
    // division and MASE one division of two exact integer products —
    // no float accumulates anywhere. lag() is guarded by the month key
    // so calendar gaps can never silently compare non-adjacent months.
    QueryDef(
      "q187_seasonal_backtest",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val c = Tables.customer(s, dir).select(col("c_custkey"), col("c_mktsegment").as("segment"))
        val monthly = o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .select(col("segment"),
            (year(col("o_orderdate")) * 12 + month(col("o_orderdate"))).cast("long").as("ym"),
            (col("o_totalprice").cast(DecimalType(18, 2)) * 100).cast("long").as("cents"))
          .groupBy(col("segment"), col("ym"))
          .agg(sum(col("cents")).as("rev"))
        val w = Window.partitionBy(col("segment")).orderBy(col("ym"))
        val lagged = monthly
          .withColumn("rev12", when(lag(col("ym"), 12).over(w) === col("ym") - 12,
            lag(col("rev"), 12).over(w)))
          .withColumn("rev1", when(lag(col("ym"), 1).over(w) === col("ym") - 1,
            lag(col("rev"), 1).over(w)))
        lagged.groupBy(col("segment"))
          .agg(
            count(col("rev12")).as("n12"),
            sum(abs(col("rev") - col("rev12"))).as("s12"),
            count(col("rev1")).as("n1"),
            sum(abs(col("rev") - col("rev1"))).as("s1"))
          .select(col("segment"), col("n12").as("n_backtest_months"),
            (col("s12").cast("double") / col("n12").cast("double")).as("mae_cents"),
            ((col("s12") * col("n1")).cast("double") /
              (col("s1") * col("n12")).cast("double")).as("mase"))
          .orderBy(col("segment"))
      },
      Some("""
        WITH monthly AS (
          SELECT c.c_mktsegment AS segment,
                 CAST(YEAR(CAST(o.o_orderdate AS DATE)) * 12
                      + MONTH(CAST(o.o_orderdate AS DATE)) AS BIGINT) AS ym,
                 CAST(SUM(CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS rev
          FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
          GROUP BY 1, 2),
        lagged AS (
          SELECT segment, ym, rev,
                 CASE WHEN LAG(ym, 12) OVER w = ym - 12
                      THEN LAG(rev, 12) OVER w END AS rev12,
                 CASE WHEN LAG(ym, 1) OVER w = ym - 1
                      THEN LAG(rev, 1) OVER w END AS rev1
          FROM monthly
          WINDOW w AS (PARTITION BY segment ORDER BY ym))
        SELECT segment,
               CAST(COUNT(rev12) AS BIGINT) AS n_backtest_months,
               CAST(CAST(SUM(ABS(rev - rev12)) AS BIGINT) AS DOUBLE)
                 / CAST(COUNT(rev12) AS DOUBLE) AS mae_cents,
               CAST(CAST(SUM(ABS(rev - rev12)) AS BIGINT) * COUNT(rev1) AS DOUBLE)
                 / CAST(CAST(SUM(ABS(rev - rev1)) AS BIGINT) * COUNT(rev12) AS DOUBLE) AS mase
        FROM lagged GROUP BY segment ORDER BY segment""")),

    // CUSUM changepoint over the daily revenue series — level-shift
    // detection in PURE integers: with prefix sums P_k over n days and
    // total T, the centered cumulative deviation is S_k = n·P_k − k·T
    // (the n-scaled classic, so no mean division ever happens); the
    // changepoint is argmax |S_k|, earliest day on ties. Everything
    // after the one per-day aggregate operates on the bounded day frame
    // (~2.4k rows for 7 years), where the global window is free.
    QueryDef(
      "q188_cusum_changepoint",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val daily = o.select(to_date(col("o_orderdate")).as("day"),
            (col("o_totalprice").cast(DecimalType(18, 2)) * 100).cast("long").as("cents"))
          .groupBy(col("day")).agg(sum(col("cents")).as("rev"))
        val wCum = Window.orderBy(col("day")).rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wAll = Window.partitionBy()
        val scored = daily
          .withColumn("k", row_number().over(Window.orderBy(col("day"))).cast("long"))
          .withColumn("p", sum(col("rev")).over(wCum))
          .withColumn("n", count(lit(1)).over(wAll))
          .withColumn("t", sum(col("rev")).over(wAll))
          .withColumn("s", col("n") * col("p") - col("k") * col("t"))
        scored
          .withColumn("rn", row_number().over(Window.orderBy(abs(col("s")).desc, col("day"))))
          .where(col("rn") === 1)
          .select(col("n").as("n_days"), col("day").as("cp_day"), col("s").as("s_at_cp"),
            (col("p").cast("double") / col("k").cast("double")).as("mean_pre_cents"),
            ((col("t") - col("p")).cast("double") /
              (col("n") - col("k")).cast("double")).as("mean_post_cents"))
      },
      Some("""
        WITH daily AS (
          SELECT CAST(o_orderdate AS DATE) AS day,
                 CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS rev
          FROM orders GROUP BY 1),
        scored AS (
          SELECT day, rev,
                 CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS k,
                 CAST(SUM(rev) OVER (ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS p,
                 CAST(COUNT(*) OVER () AS BIGINT) AS n,
                 CAST(SUM(rev) OVER () AS BIGINT) AS t
          FROM daily),
        s2 AS (
          SELECT *, n * p - k * t AS s,
                 ROW_NUMBER() OVER (ORDER BY ABS(n * p - k * t) DESC, day) AS rn
          FROM scored)
        SELECT n AS n_days, day AS cp_day, s AS s_at_cp,
               CAST(p AS DOUBLE) / CAST(k AS DOUBLE) AS mean_pre_cents,
               CAST(t - p AS DOUBLE) / CAST(n - k AS DOUBLE) AS mean_post_cents
        FROM s2 WHERE rn = 1"""))
  )
}
