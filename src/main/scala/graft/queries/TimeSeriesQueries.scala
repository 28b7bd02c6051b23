package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.functions.Kernels._
import graft.operators.AsOfJoin
import graft.sources.Tables
import graft.plans.CheckpointPolicy.DataFrameCutOps

/** Round-4 batch 12 — time-series operators:
  *
  *  - q129: as-of join with a TOLERANCE bound (pandas merge_asof
  *    semantics) — `AsOfJoin.bestAtTimeWithin`, still the linear
  *    union+window plan, zero join fan-out.
  *  - q130: OHLC bar resampling (open/high/low/close per 6-hour bucket)
  *    via min_by/max_by over a composite (ts, event_id) key — one
  *    aggregate pass, total-ordered picks, no window at all.
  *  - q135: time-weighted average (TWAP): LOCF value integrated over
  *    microsecond-exact interval lengths, one decimal area sum per user.
  */
object TimeSeriesQueries {

  val defs: Seq[QueryDef] = Seq(

    // Tolerance-bounded as-of: each purchase matches its nearest view
    // within ±2 hours (prefer at-or-before), per user. The oracle builds
    // the same preference order explicitly (side, then signed distance,
    // then event-id tiebreak) over tolerance-filtered candidate pairs —
    // per-user candidate lists are bounded, so the oracle's pair join is
    // small; the operator never builds pairs at all.
    QueryDef(
      "q129_asof_tolerance",
      (s, dir) => {
        val e = Tables.events(s, dir)
        val purchases = e.where(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id"), col("ts"), col("value"))
        val views = e.where(col("event_type") === "view")
          .select(col("user_id"), col("ts").as("vts"), col("event_id").as("vid"))
        val joined = AsOfJoin.bestAtTimeWithin(purchases, views,
          Seq("user_id"), col("ts"), col("vts"), "vid",
          expr("INTERVAL 2 HOURS"))
        joined.groupBy(coalesce(col("matched_side"), lit("none")).as("matched_side"))
          .agg(count(lit(1)).as("n_purchases"),
            countDistinct(col("user_id")).as("n_users"),
            moneyOut(sum(dec6(col("value")))).as("value_sum"),
            sum(col("vid")).as("view_id_checksum"))
          .orderBy(col("matched_side"))
      },
      Some("""
        WITH p AS (
          SELECT user_id, event_id, ts, value FROM events
          WHERE event_type = 'purchase'),
        v AS (
          SELECT user_id, ts AS vts, event_id AS vid FROM events
          WHERE event_type = 'view'),
        cand AS (
          SELECT p.event_id AS pid, p.user_id, p.value, v.vts, v.vid,
                 CASE WHEN v.vts <= p.ts THEN 0 ELSE 1 END AS side,
                 row_number() OVER (PARTITION BY p.event_id
                   ORDER BY CASE WHEN v.vts <= p.ts THEN 0 ELSE 1 END,
                            CASE WHEN v.vts <= p.ts
                                 THEN -CAST(epoch_us(v.vts) AS BIGINT)
                                 ELSE CAST(epoch_us(v.vts) AS BIGINT) END,
                            v.vid) AS rn
          FROM p JOIN v ON p.user_id = v.user_id
           AND v.vts BETWEEN p.ts - INTERVAL 2 HOUR AND p.ts + INTERVAL 2 HOUR),
        best AS (SELECT * FROM cand WHERE rn = 1),
        labeled AS (
          SELECT p.user_id, p.value, b.vid,
                 CASE WHEN b.side = 0 THEN 'before'
                      WHEN b.side = 1 THEN 'after'
                      ELSE 'none' END AS matched_side
          FROM p LEFT JOIN best b ON b.pid = p.event_id)
        SELECT matched_side, COUNT(*) AS n_purchases,
               COUNT(DISTINCT user_id) AS n_users,
               CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,6))
                    AS DOUBLE) AS value_sum,
               CAST(SUM(vid) AS BIGINT) AS view_id_checksum
        FROM labeled
        GROUP BY 1
        ORDER BY 1""")),

    // OHLC resampling: 6-hour bars per event type. Open/close are
    // min_by/max_by over a composite (µs·10⁷ + event_id) DECIMAL key —
    // a total order, so the picks are deterministic even with equal
    // timestamps — and high/low/volume ride the same single aggregate:
    // ONE shuffle, no window, no self-join. Values pass through
    // untouched (no float arithmetic), so the gate is exact.
    QueryDef(
      "q130_ohlc_bars",
      (s, dir) => {
        val key = unix_micros(col("ts")).cast(DecimalType(38, 0)) *
          lit(10000000L) + col("event_id")
        val e = Tables.events(s, dir)
          .select(col("event_type"), col("value"), key.as("ord_key"),
            timestamp_seconds(expr("(unix_timestamp(ts) div 21600) * 21600"))
              .as("bar_start"))
        e.groupBy(col("event_type"), col("bar_start"))
          .agg(
            min_by(col("value"), col("ord_key")).as("open"),
            max(col("value")).as("high"),
            min(col("value")).as("low"),
            max_by(col("value"), col("ord_key")).as("close"),
            count(lit(1)).as("n_events"))
          .orderBy(col("event_type"), col("bar_start"))
      },
      Some("""
        SELECT event_type,
               make_timestamp((((CAST(epoch_us(ts) AS BIGINT) // 1000000) // 21600) * 21600)
                              * 1000000) AS bar_start,
               arg_min(value, CAST(epoch_us(ts) AS DECIMAL(38,0)) * 10000000
                              + event_id) AS open,
               MAX(value) AS high,
               MIN(value) AS low,
               arg_max(value, CAST(epoch_us(ts) AS DECIMAL(38,0)) * 10000000
                              + event_id) AS close,
               COUNT(*) AS n_events
        FROM events
        GROUP BY 1, 2
        ORDER BY 1, 2""")),

    // TWAP: last-observation value held until the next event, integrated
    // over second-exact durations — Σ(value·Δt)/ΣΔt per user, reported
    // as an EXACT INTEGER in milli-value-units: area rides as BIGINT
    // micro-value-seconds (decimal value × 10⁶, exact cast), and the
    // final ratio is a floor division — zero doubles anywhere, because a
    // ~10²¹-unit decimal→double conversion rounds differently across
    // engines (measured: last-ulp mismatches). Single-event users have
    // no interval and drop on both sides. One user_id exchange shared by
    // the lead() and the rollup.
    QueryDef(
      "q135_twap",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val e = Tables.events(s, dir)
          .select(col("user_id"), col("ts"), col("event_id"), col("value"))
          .withColumn("nts", lead(col("ts"), 1).over(w))
          .where(col("nts").isNotNull)
          .selectExpr("user_id", "value",
            "(unix_micros(nts) - unix_micros(ts)) div 1000000 AS dt_s")
          .where(col("dt_s") > 0)
          // micro-value-seconds: decimal → integer-valued decimal → long (exact)
          .withColumn("area_uvs",
            (dec6(col("value")) * col("dt_s") * lit(1000000L)).cast("long"))
        e.groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_intervals"),
            sum(col("dt_s")).as("total_s"),
            sum(col("area_uvs")).as("area_uvs"))
          .selectExpr("user_id", "n_intervals", "total_s",
            "(area_uvs * 1000) div (total_s * 1000000) AS twap_milli")
          .orderBy(col("user_id"))
      },
      Some("""
        WITH seq AS (
          SELECT user_id, ts, event_id, value,
                 lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nts
          FROM events),
        iv AS (
          SELECT user_id,
                 (CAST(epoch_us(nts) AS BIGINT) - CAST(epoch_us(ts) AS BIGINT))
                   // 1000000 AS dt_s,
                 CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS value_u
          FROM seq WHERE nts IS NOT NULL),
        agg AS (
          SELECT user_id, COUNT(*) AS n_intervals,
                 CAST(SUM(dt_s) AS BIGINT) AS total_s,
                 CAST(SUM(value_u * dt_s) AS BIGINT) AS area_uvs
          FROM iv WHERE dt_s > 0
          GROUP BY user_id)
        SELECT user_id, n_intervals, total_s,
               (area_uvs * 1000) // (total_s * 1000000) AS twap_milli
        FROM agg
        ORDER BY user_id""")),

    // Sample autocorrelation of the daily-order-count series at lags 1-7
    // — the seasonality probe behind every forecasting/anomaly pipeline
    // (weekly cycle shows as a lag-7 peak). The series is zero-filled
    // over the full calendar spine (missing day = 0 orders, NOT a
    // dropped row — ACF over a gappy series is wrong), then each lag is
    // a Pearson correlation over the overlapping pairs kept in exact
    // int64 cross-multiplied form: r = (N·Σxy − Σx·Σy) /
    // √((N·Σx²−(Σx)²)(N·Σy²−(Σy)²)), ONE double division + sqrt at the
    // end. Scale: the heavy part (daily counts) is one partial-agg
    // shuffle over orders; the spine/lag stage operates on days×7 rows —
    // thousands, regardless of the fact-table size. The 7 lag copies
    // come from one explode + a single co-partitioned self-join on day.
    QueryDef(
      "q205_daily_acf",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val daily = o.groupBy(col("o_orderdate").cast("date").as("day"))
          .agg(count(lit(1)).as("c"))
        val span = daily.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
        val spine = span.select(explode(sequence(col("d0"), col("d1"))).as("day"))
        val series = spine.join(daily, Seq("day"), "left")
          .select(col("day"), coalesce(col("c"), lit(0L)).as("x"))
        val lagged = series
          .select(col("day"), col("x"), explode(sequence(lit(1), lit(7))).as("lag"))
          .select(col("lag"), col("x"), date_add(col("day"), col("lag")).as("tday"))
        val pairs = lagged.join(
          series.select(col("day").as("tday"), col("x").as("y")), Seq("tday"))
        pairs.groupBy(col("lag").cast("long").as("lag"))
          .agg(count(lit(1)).as("n_pairs"),
            sum(col("x")).as("sx"), sum(col("y")).as("sy"),
            sum(col("x") * col("y")).as("sxy"),
            sum(col("x") * col("x")).as("sxx"),
            sum(col("y") * col("y")).as("syy"))
          .select(col("lag"), col("n_pairs"),
            ((col("n_pairs") * col("sxy") - col("sx") * col("sy")).cast("double") /
              sqrt((col("n_pairs") * col("sxx") - col("sx") * col("sx")).cast("double") *
                (col("n_pairs") * col("syy") - col("sy") * col("sy")).cast("double")))
              .as("acf"))
          .orderBy(col("lag"))
      },
      Some("""
        WITH daily AS (
          SELECT CAST(o_orderdate AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS c
          FROM orders GROUP BY 1),
        span AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM daily),
        spine AS (
          SELECT CAST(d AS DATE) AS day
          FROM (SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS d FROM span)),
        series AS (
          SELECT s.day, COALESCE(d.c, 0) AS x
          FROM spine s LEFT JOIN daily d USING (day)),
        lagged AS (
          SELECT l.lag, s.x, s.day + CAST(l.lag AS INTEGER) AS tday
          FROM series s, (SELECT unnest(range(1, 8)) AS lag) l),
        pairs AS (
          SELECT lg.lag, lg.x, t.x AS y
          FROM lagged lg JOIN series t ON t.day = lg.tday),
        agg AS (
          SELECT CAST(lag AS BIGINT) AS lag,
                 CAST(COUNT(*) AS BIGINT) AS n_pairs,
                 CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
                 CAST(SUM(x*y) AS BIGINT) AS sxy,
                 CAST(SUM(x*x) AS BIGINT) AS sxx,
                 CAST(SUM(y*y) AS BIGINT) AS syy
          FROM pairs GROUP BY 1)
        SELECT lag, n_pairs,
               (n_pairs * sxy - sx * sy)::DOUBLE
                 / sqrt((n_pairs * sxx - sx * sx)::DOUBLE
                        * (n_pairs * syy - sy * sy)::DOUBLE) AS acf
        FROM agg
        ORDER BY lag""")),

    // Clamped running balance — inventory semantics (stock can't go
    // negative): bal_i = max(0, bal_{i-1} + delta_i). The clamp makes
    // the recurrence NON-LINEAR, so no window/prefix-sum rewrite exists
    // (unlike q113/q135 cumsums) — this is the operator that genuinely
    // needs per-key ordered state. Implementation is the SECONDARY-SORT
    // pattern: repartition on user_id, sortWithinPartitions, then ONE
    // O(1)-memory streaming fold per partition (an iterator that never
    // buffers a group — at 100 TB a hot key with 10⁸ events still
    // streams; groupByKey/flatMapGroups would buffer it). The oracle
    // walks the same recurrence with a recursive CTE. Flows are exact
    // integer cents; view = +stock, purchase = −stock.
    QueryDef(
      "q214_clamped_balance",
      (s, dir) => {
        import s.implicits._
        val flows = Tables.events(s, dir)
          .where(col("event_type").isin("view", "purchase"))
          .select(col("user_id"),
            unix_micros(col("ts")).as("tus"), col("event_id"),
            when(col("event_type") === "purchase",
              -(col("value").cast("decimal(18,2)") * 100).cast("long"))
              .otherwise((col("value").cast("decimal(18,2)") * 100).cast("long"))
              .as("delta"))
        flows.repartition(col("user_id"))
          .sortWithinPartitions(col("user_id"), col("tus"), col("event_id"))
          .as[(Long, Long, Long, Long)]
          .mapPartitions { rows =>
            graft.operators.SortedFold.foldGroups(rows, (r: (Long, Long, Long, Long)) => r._1) {
              (user, g) =>
                var n = 0L; var bal = 0L; var maxb = 0L; var clamps = 0L
                g.foreach { r =>
                  val d = r._4
                  n += 1
                  val nb = bal + d
                  if (nb < 0L) { clamps += 1; bal = 0L } else bal = nb
                  if (bal > maxb) maxb = bal
                }
                (user, n, bal, maxb, clamps)
            }
          }
          .toDF("user_id", "n_flows", "final_balance", "max_balance", "n_clamps")
          .orderBy(col("user_id"))
      },
      Some("""
        WITH RECURSIVE flows AS (
          SELECT user_id,
                 CASE WHEN event_type = 'purchase'
                      THEN -CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                      ELSE CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) END
                   AS delta,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY epoch_us(ts), event_id) AS rn
          FROM events WHERE event_type IN ('view', 'purchase')),
        walk AS (
          SELECT user_id, rn,
                 GREATEST(delta, 0) AS bal,
                 CASE WHEN delta < 0 THEN 1 ELSE 0 END AS clamps,
                 GREATEST(delta, 0) AS maxbal
          FROM flows WHERE rn = 1
          UNION ALL
          SELECT f.user_id, f.rn,
                 GREATEST(w.bal + f.delta, 0),
                 w.clamps + CASE WHEN w.bal + f.delta < 0 THEN 1 ELSE 0 END,
                 GREATEST(w.maxbal, GREATEST(w.bal + f.delta, 0))
          FROM walk w
          JOIN flows f ON f.user_id = w.user_id AND f.rn = w.rn + 1)
        SELECT user_id,
               CAST(MAX(rn) AS BIGINT) AS n_flows,
               CAST(max_by(bal, rn) AS BIGINT) AS final_balance,
               CAST(MAX(maxbal) AS BIGINT) AS max_balance,
               CAST(max_by(clamps, rn) AS BIGINT) AS n_clamps
        FROM walk
        GROUP BY user_id
        ORDER BY user_id""")),

    // Maximum drawdown of each user's cumulative net flow (the running
    // peak-to-trough risk statistic) — the LINEAR companion to q214's
    // clamped fold: cumsum and running max ARE prefix-expressible, so
    // this stays pure windows sharing ONE user_id exchange (both frames
    // cluster on the partition key) — no state, no recursion. Exact
    // integer cents throughout.
    QueryDef(
      "q216_max_drawdown",
      (s, dir) => {
        val flows = Tables.events(s, dir)
          .where(col("event_type").isin("view", "purchase"))
          .select(col("user_id"),
            unix_micros(col("ts")).as("tus"), col("event_id"),
            when(col("event_type") === "purchase",
              -(col("value").cast("decimal(18,2)") * 100).cast("long"))
              .otherwise((col("value").cast("decimal(18,2)") * 100).cast("long"))
              .as("delta"))
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("tus"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val walked = flows
          .withColumn("cum", sum(col("delta")).over(w))
          .withColumn("peak", max(col("cum")).over(w))
        walked.groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_flows"),
            max(col("peak")).as("peak"),
            sum(col("delta")).as("final_net"),
            max(col("peak") - col("cum")).as("max_drawdown"))
          .orderBy(col("user_id"))
      },
      Some("""
        WITH flows AS (
          SELECT user_id, epoch_us(ts) AS tus, event_id,
                 CASE WHEN event_type = 'purchase'
                      THEN -CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                      ELSE CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) END
                   AS delta
          FROM events WHERE event_type IN ('view', 'purchase')),
        cums AS (
          SELECT user_id, tus, event_id, delta,
                 SUM(delta) OVER (PARTITION BY user_id ORDER BY tus, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM flows),
        walked AS (
          SELECT user_id, delta, cum,
                 MAX(cum) OVER (PARTITION BY user_id ORDER BY tus, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
          FROM cums)
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_flows,
               CAST(MAX(peak) AS BIGINT) AS peak,
               CAST(SUM(delta) AS BIGINT) AS final_net,
               CAST(MAX(peak - cum) AS BIGINT) AS max_drawdown
        FROM walked
        GROUP BY user_id
        ORDER BY user_id""")),

    // Overlapping-interval merge (islands over REAL intervals): each
    // lineitem occupies [l_shipdate, l_shipdate + transit], with transit a
    // deterministic 1-14-day function of the line identity (the driver's
    // lineitem has no receipt date); per supplier, merge
    // overlapping/touching intervals into islands and account coverage.
    // The generalization of integer gaps-and-islands (q113) to interval
    // endpoints — and the per-key complement of q174's global sweep: an
    // island starts where the interval's start exceeds the running max
    // of all PRIOR ends (cummax window, 1-preceding frame), island id =
    // running sum of start flags over the same sort. One supplier-key
    // exchange carries the sort, both windows and the rollups; island
    // spans are exact date arithmetic. Ties (identical ship dates) are
    // totalized by receipt date + order line so the flag sequence — and
    // with it every downstream number — is parallelism-independent.
    QueryDef(
      "q232_interval_merge",
      (s, dir) => {
        val iv = Tables.lineitem(s, dir)
          .select(col("l_suppkey").as("sk"), col("l_shipdate").as("lo"),
            date_add(col("l_shipdate"),
              ((col("l_orderkey") + col("l_linenumber")) % 14 + 1).cast("int"))
              .as("hi"),
            col("l_orderkey").as("ok"), col("l_linenumber").as("ln"))
        val sort = Window.partitionBy(col("sk"))
          .orderBy(col("lo"), col("hi"), col("ok"), col("ln"))
        val prevMax = max(col("hi"))
          .over(sort.rowsBetween(Window.unboundedPreceding, -1))
        val flagged = iv.withColumn("new_island",
          when(prevMax.isNull || col("lo") > prevMax, 1L).otherwise(0L))
        val islanded = flagged.withColumn("island",
          sum(col("new_island")).over(
            sort.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        val islands = islanded.groupBy(col("sk"), col("island"))
          .agg(count(lit(1)).as("n_iv"), min(col("lo")).as("i_lo"),
            max(col("hi")).as("i_hi"))
        islands.groupBy(col("sk"))
          .agg(sum(col("n_iv")).as("n_intervals"),
            count(lit(1)).as("n_islands"),
            sum(datediff(col("i_hi"), col("i_lo")) + 1).cast("long")
              .as("covered_days"),
            max(datediff(col("i_hi"), col("i_lo")) + 1).cast("long")
              .as("max_island_days"))
          .orderBy(col("sk"))
      },
      Some("""
        WITH iv AS (
          SELECT l_suppkey AS sk, CAST(l_shipdate AS DATE) AS lo,
                 CAST(l_shipdate AS DATE)
                   + CAST((l_orderkey + l_linenumber) % 14 + 1
                          AS INTEGER) AS hi,
                 l_orderkey AS ok, l_linenumber AS ln
          FROM lineitem),
        flagged AS (
          SELECT sk, lo, hi, ok, ln,
                 CASE WHEN MAX(hi) OVER (PARTITION BY sk
                        ORDER BY lo, hi, ok, ln
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                      IS NULL
                   OR lo > MAX(hi) OVER (PARTITION BY sk
                        ORDER BY lo, hi, ok, ln
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 THEN 1 ELSE 0 END AS new_island
          FROM iv),
        islanded AS (
          SELECT sk, lo, hi,
                 SUM(new_island) OVER (PARTITION BY sk
                   ORDER BY lo, hi, ok, ln
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS island
          FROM flagged),
        islands AS (
          SELECT sk, island, COUNT(*) AS n_iv,
                 MIN(lo) AS i_lo, MAX(hi) AS i_hi
          FROM islanded GROUP BY 1, 2)
        SELECT sk,
               CAST(SUM(n_iv) AS BIGINT) AS n_intervals,
               CAST(COUNT(*) AS BIGINT) AS n_islands,
               CAST(SUM(date_diff('day', i_lo, i_hi) + 1) AS BIGINT)
                 AS covered_days,
               CAST(MAX(date_diff('day', i_lo, i_hi) + 1) AS BIGINT)
                 AS max_island_days
        FROM islands
        GROUP BY sk
        ORDER BY sk""")),

    // Greedy interval scheduling — maximum count of non-overlapping
    // shipment windows per supplier (earliest-end-first, THE exchange
    // argument classic): sort by end date, keep an interval iff its
    // start exceeds the last kept end. Like q214's clamped balance the
    // recurrence is non-prefix-expressible (each decision depends on
    // the last KEPT end, not the previous row), so it runs as the
    // secondary-sort pattern: repartition on supplier,
    // sortWithinPartitions by (end, start, line), ONE O(1)-memory
    // streaming fold per partition. The oracle walks the identical
    // greedy with a recursive CTE. Dates ride as exact epoch-day
    // integers; ties totalized by (start, orderkey, linenumber).
    QueryDef(
      "q234_interval_scheduling",
      (s, dir) => {
        import s.implicits._
        val epoch = lit("1970-01-01").cast("date")
        val iv = Tables.lineitem(s, dir)
          .select(col("l_suppkey").as("sk"),
            datediff(col("l_shipdate"), epoch).cast("long").as("lo"),
            (datediff(col("l_shipdate"), epoch).cast("long")
              + (col("l_orderkey") + col("l_linenumber")) % 14 + 1).as("hi"),
            (col("l_orderkey") * 10 + col("l_linenumber")).as("line"))
        iv.repartition(col("sk"))
          .sortWithinPartitions(col("sk"), col("hi"), col("lo"), col("line"))
          .as[(Long, Long, Long, Long)]
          .mapPartitions { rows =>
            graft.operators.SortedFold.foldGroups(rows, (r: (Long, Long, Long, Long)) => r._1) {
              (sk, g) =>
                var n = 0L; var sel = 0L; var lastEnd = -1L; var cks = 0L
                g.foreach { r =>
                  n += 1
                  if (r._2 > lastEnd) { sel += 1; lastEnd = r._3; cks += r._3 }
                }
                (sk, n, sel, lastEnd, cks)
            }
          }
          .toDF("sk", "n_intervals", "n_selected", "last_end_day",
            "end_checksum")
          .orderBy(col("sk"))
      },
      Some("""
        WITH RECURSIVE iv AS (
          SELECT l_suppkey AS sk,
                 CAST(date_diff('day', DATE '1970-01-01', l_shipdate)
                      AS BIGINT) AS lo,
                 CAST(date_diff('day', DATE '1970-01-01', l_shipdate)
                      + (l_orderkey + l_linenumber) % 14 + 1
                      AS BIGINT) AS hi,
                 l_orderkey * 10 + l_linenumber AS line
          FROM lineitem),
        seq AS (
          SELECT sk, lo, hi,
                 row_number() OVER (PARTITION BY sk
                   ORDER BY hi, lo, line) AS rn
          FROM iv),
        walk AS (
          SELECT sk, rn,
                 1::BIGINT AS n,
                 CASE WHEN lo > -1 THEN 1 ELSE 0 END::BIGINT AS sel,
                 CASE WHEN lo > -1 THEN hi ELSE -1 END AS last_end,
                 CASE WHEN lo > -1 THEN hi ELSE 0 END AS cks
          FROM seq WHERE rn = 1
          UNION ALL
          SELECT f.sk, f.rn, w.n + 1,
                 w.sel + CASE WHEN f.lo > w.last_end THEN 1 ELSE 0 END,
                 CASE WHEN f.lo > w.last_end THEN f.hi ELSE w.last_end END,
                 w.cks + CASE WHEN f.lo > w.last_end THEN f.hi ELSE 0 END
          FROM walk w JOIN seq f ON f.sk = w.sk AND f.rn = w.rn + 1)
        SELECT sk,
               CAST(MAX(rn) AS BIGINT) AS n_intervals,
               CAST(max_by(sel, rn) AS BIGINT) AS n_selected,
               CAST(max_by(last_end, rn) AS BIGINT) AS last_end_day,
               CAST(max_by(cks, rn) AS BIGINT) AS end_checksum
        FROM walk
        GROUP BY sk
        ORDER BY sk""")),

    // Arbitrary-alpha exponential smoothing (EWMA, alpha=0.3) of each
    // customer's daily spend — the general-alpha companion to q104's
    // power-of-two decay (whose weights were chosen to stay integral).
    // An arbitrary alpha forces a DOUBLE recurrence, which is exactly
    // the sequential-fold contract: level_i = 0.3·x_i + 0.7·level_{i-1}
    // seeded with the first element, evaluated strictly in day order.
    // Spark runs it as the q214 secondary-sort pattern (repartition on
    // customer, sortWithinPartitions, one O(1)-memory streaming fold per
    // partition — a hot key never buffers); DuckDB folds the identical
    // recurrence with list_reduce over the day-ordered list, whose
    // first-element seed matches the Spark fold. Identical IEEE ops in
    // identical order are bit-stable cross-engine (the q214/q234
    // precedent). Scale: one exchange on customer carries the sort and
    // the fold; the daily pre-agg partial-aggregates before it.
    QueryDef(
      "q238_ewma_smoothing",
      (s, dir) => {
        import s.implicits._
        val daily = Tables.orders(s, dir)
          .groupBy(col("o_custkey").as("ck"),
            col("o_orderdate").cast("date").as("day"))
          .agg(sum((col("o_totalprice").cast(DecimalType(18, 2)) * 100)
            .cast("long")).as("cents"))
          .select(col("ck"),
            datediff(col("day"), lit("1990-01-01").cast("date")).cast("long")
              .as("d"),
            col("cents"))
        daily.repartition(col("ck"))
          .sortWithinPartitions(col("ck"), col("d"))
          .as[(Long, Long, Long)]
          .mapPartitions { rows =>
            graft.operators.SortedFold.foldGroups(rows, (r: (Long, Long, Long)) => r._1) {
              (ck, g) =>
                var n = 0L; var tot = 0L; var level = 0.0
                g.foreach { r =>
                  val cents = r._3
                  val x = cents.toDouble
                  level = if (n == 0L) x else 0.3 * x + 0.7 * level
                  n += 1; tot += cents
                }
                (ck, n, tot, level)
            }
          }
          .toDF("ck", "n_days", "total_cents", "ewma_cents")
          .orderBy(col("ck"))
      },
      Some("""
        WITH daily AS (
          SELECT o_custkey AS ck, CAST(o_orderdate AS DATE) AS day,
                 CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT))
                      AS BIGINT) AS cents
          FROM orders GROUP BY 1, 2),
        serie AS (
          SELECT ck, CAST(COUNT(*) AS BIGINT) AS n_days,
                 CAST(SUM(cents) AS BIGINT) AS total_cents,
                 list(CAST(cents AS DOUBLE) ORDER BY day) AS xs
          FROM daily GROUP BY ck)
        SELECT ck, n_days, total_cents,
               list_reduce(xs, (acc, x) -> CAST(0.3 AS DOUBLE)*x
                                           + CAST(0.7 AS DOUBLE)*acc)
                 AS ewma_cents
        FROM serie
        ORDER BY ck""")),

    // Holt linear-trend (double exponential) smoothing of each customer's
    // daily spend — the 2-state extension of q238's single-state EWMA:
    //   l_i = α·x_i + (1−α)·(l_{i−1} + b_{i−1})
    //   b_i = β·(l_i − l_{i−1}) + (1−β)·b_{i−1}        (α=0.4, β=0.3)
    // seeded (l,b) = (x_1, 0). A coupled 2-dim recurrence is still a
    // strict sequential fold, so Spark reuses the q214/q238 secondary-sort
    // contract (repartition on customer, sortWithinPartitions, one
    // O(1)-memory streaming fold per partition); DuckDB folds the same
    // recurrence with a LIST[l, b] accumulator over the day-ordered list.
    // Both engines evaluate the identical IEEE expressions on identical
    // operands in identical order (DuckDB's lambda inlines l_i twice —
    // same double ops, same value), so the gate is bit-exact. Output adds
    // the 3-step-ahead forecast l + 3b, the thing Holt exists to produce.
    // Scale: one exchange on customer; the daily pre-agg partial-combines
    // map-side; a hot customer streams, never buffers.
    QueryDef(
      "q271_holt_linear",
      (s, dir) => {
        import s.implicits._
        val daily = Tables.orders(s, dir)
          .groupBy(col("o_custkey").as("ck"),
            col("o_orderdate").cast("date").as("day"))
          .agg(sum((col("o_totalprice").cast(DecimalType(18, 2)) * 100)
            .cast("long")).as("cents"))
          .select(col("ck"),
            datediff(col("day"), lit("1990-01-01").cast("date")).cast("long")
              .as("d"),
            col("cents"))
        daily.repartition(col("ck"))
          .sortWithinPartitions(col("ck"), col("d"))
          .as[(Long, Long, Long)]
          .mapPartitions { rows =>
            graft.operators.SortedFold.foldGroups(rows, (r: (Long, Long, Long)) => r._1) {
              (ck, g) =>
                var n = 0L; var tot = 0L; var l = 0.0; var b = 0.0
                g.foreach { r =>
                  val cents = r._3
                  val x = cents.toDouble
                  if (n == 0L) { l = x; b = 0.0 }
                  else {
                    val l1 = 0.4 * x + 0.6 * (l + b)
                    b = 0.3 * (l1 - l) + 0.7 * b
                    l = l1
                  }
                  n += 1; tot += cents
                }
                (ck, n, tot, l, b, l + 3.0 * b)
            }
          }
          .toDF("ck", "n_days", "total_cents", "holt_level", "holt_trend",
            "forecast_h3")
          .orderBy(col("ck"))
      },
      Some("""
        WITH daily AS (
          SELECT o_custkey AS ck, CAST(o_orderdate AS DATE) AS day,
                 CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT))
                      AS BIGINT) AS cents
          FROM orders GROUP BY 1, 2),
        serie AS (
          SELECT ck, CAST(COUNT(*) AS BIGINT) AS n_days,
                 CAST(SUM(cents) AS BIGINT) AS total_cents,
                 list(CAST(cents AS DOUBLE) ORDER BY day) AS xs
          FROM daily GROUP BY ck),
        holt AS (
          SELECT ck, n_days, total_cents,
                 list_reduce(list_transform(xs, x -> [x, CAST(0 AS DOUBLE)]),
                   (acc, e) -> [CAST(0.4 AS DOUBLE)*e[1]
                                  + CAST(0.6 AS DOUBLE)*(acc[1]+acc[2]),
                                CAST(0.3 AS DOUBLE)*((CAST(0.4 AS DOUBLE)*e[1]
                                  + CAST(0.6 AS DOUBLE)*(acc[1]+acc[2])) - acc[1])
                                  + CAST(0.7 AS DOUBLE)*acc[2]]) AS hb
          FROM serie)
        SELECT ck, n_days, total_cents,
               hb[1] AS holt_level, hb[2] AS holt_trend,
               hb[1] + CAST(3 AS DOUBLE)*hb[2] AS forecast_h3
        FROM holt
        ORDER BY ck""")),

    // merge_asof(direction='nearest'): each purchase matched to its
    // closest click in |time| per user — before OR after, whichever is
    // nearer; equal distance prefers the at-or-before side, then the
    // smaller event id. Completes the as-of direction surface (backward
    // q09/q47, tolerance-both q129, bitemporal q230). Same linear
    // union + per-key window plan (AsOfJoin.nearestAtTime): both
    // directional bests carried with their timestamps, winner picked
    // arithmetically — the O(purchases × clicks) pair join the oracle
    // uses never materializes in the engine.
    QueryDef(
      "q274_asof_nearest",
      (s, dir) => {
        import graft.operators.AsOfJoin
        val e = Tables.events(s, dir)
        val purchases = e.where(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id"), col("ts"))
        val clicks = e.where(col("event_type") === "click")
          .select(col("user_id"), col("ts").as("cts"), col("event_id").as("cid"))
        AsOfJoin.nearestAtTime(purchases, clicks, Seq("user_id"),
            col("ts"), col("cts"), "cid")
          .select(col("event_id"), col("user_id"), col("cid"),
            coalesce(col("matched_side"), lit("none")).as("matched_side"))
          .orderBy(col("event_id"))
      },
      Some("""
        WITH p AS (
          SELECT user_id, event_id, ts FROM events
          WHERE event_type = 'purchase'),
        c AS (
          SELECT user_id, ts AS cts, event_id AS cid FROM events
          WHERE event_type = 'click'),
        best AS (
          SELECT p.event_id, p.user_id, c.cid,
                 CASE WHEN c.cts IS NULL THEN 'none'
                      WHEN c.cts <= p.ts THEN 'before'
                      ELSE 'after' END AS matched_side,
                 row_number() OVER (PARTITION BY p.event_id ORDER BY
                   abs(epoch_us(c.cts) - epoch_us(p.ts)),
                   CASE WHEN c.cts <= p.ts THEN 0 ELSE 1 END,
                   c.cid) AS rn
          FROM p LEFT JOIN c USING (user_id))
        SELECT event_id, user_id, cid, matched_side
        FROM best WHERE rn = 1
        ORDER BY event_id""")),

    // Holt-Winters additive (triple exponential) smoothing — the
    // seasonal completion of the exponential family (q238 single-state
    // EWMA, q271 two-state Holt): per-region daily revenue with a
    // 7-slot seasonal lattice indexed by series POSITION mod 7
    // (position, not weekday, so day gaps can't desynchronize the two
    // engines):
    //   l_i = α(x_i − s_{i%7}) + (1−α)(l+b)
    //   b_i = β(l_i − l) + (1−β)b            (α=.4, β=.2, γ=.3)
    //   s_{i%7} ← γ(x_i − l_i) + (1−γ)s_{i%7}
    // seeded (l,b,s·) = (x₀, 0, 0⃗). Spark runs the 9-state fold with
    // the q271 secondary-sort contract (repartition on region, one
    // O(1)-memory streaming pass); DuckDB folds the identical recurrence
    // with a 10-element LIST accumulator (list_reduce over
    // position-seeded states, seasonal slot spliced via list_slice —
    // no indexed-lambda dependency). Both engines evaluate the same
    // IEEE expressions on the same operands in the same order, so the
    // gate is bit-exact, including the 3-step-ahead seasonal forecast
    // l + 3b + s_{(n+2)%7}. Scale: the fold input is bounded by
    // CALENDAR (≤ ~2.4k days/region), not data volume — the daily
    // pre-agg partial-combines map-side; 5 regions × series = trivially
    // parallel.
    QueryDef(
      "q297_holt_winters",
      (s, dir) => {
        import s.implicits._
        val cust = Tables.customer(s, dir)
          .select(col("c_custkey").as("ck"), col("c_nationkey").as("nk"))
        val natReg = Tables.nation(s, dir)
          .join(Tables.region(s, dir),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey").as("nk"), col("r_name"))
        val daily = Tables.orders(s, dir)
          .select(col("o_custkey").as("ck"),
            col("o_orderdate").cast("date").as("day"),
            (col("o_totalprice").cast(DecimalType(18, 2)) * 100)
              .cast("long").as("cents"))
          .join(broadcast(cust), Seq("ck"))
          .join(broadcast(natReg), Seq("nk"))
          .groupBy(col("r_name"),
            datediff(col("day"), lit("1992-01-01").cast("date")).cast("long")
              .as("d"))
          .agg(sum(col("cents")).as("cents"))
        daily.repartition(col("r_name"))
          .sortWithinPartitions(col("r_name"), col("d"))
          .select(col("r_name"), col("d"), col("cents"))
          .as[(String, Long, Long)]
          .mapPartitions { rows =>
            graft.operators.SortedFold.foldGroups(rows, (r: (String, Long, Long)) => r._1) {
              (r, g) =>
                var n = 0L; var tot = 0L; var l = 0.0; var b = 0.0
                val sv = new Array[Double](7)
                g.foreach { row =>
                  val cents = row._3
                  val x = cents.toDouble
                  if (n == 0L) { l = x; b = 0.0 }
                  else {
                    val idx = (n % 7).toInt
                    val l1 = 0.4 * (x - sv(idx)) + 0.6 * (l + b)
                    b = 0.2 * (l1 - l) + 0.8 * b
                    sv(idx) = 0.3 * (x - l1) + 0.7 * sv(idx)
                    l = l1
                  }
                  n += 1; tot += cents
                }
                val f3 = l + 3.0 * b + sv(((n + 2) % 7).toInt)
                (r, n, tot, l, b, sv(0), sv(1), sv(2), sv(3), sv(4),
                  sv(5), sv(6), f3)
            }
          }
          .toDF("r_name", "n_days", "total_cents", "hw_level", "hw_trend",
            "s0", "s1", "s2", "s3", "s4", "s5", "s6", "forecast_h3")
          .orderBy(col("r_name"))
      },
      Some("""
        WITH daily AS (
          SELECT r.r_name,
                 CAST(datediff('day', DATE '1992-01-01',
                      CAST(o.o_orderdate AS DATE)) AS BIGINT) AS d,
                 CAST(SUM(CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
                      AS BIGINT)) AS BIGINT) AS cents
          FROM orders o
          JOIN customer c ON c.c_custkey = o.o_custkey
          JOIN nation n ON n.n_nationkey = c.c_nationkey
          JOIN region r ON r.r_regionkey = n.n_regionkey
          GROUP BY 1, 2),
        serie AS (
          SELECT r_name, CAST(COUNT(*) AS BIGINT) AS n_days,
                 CAST(SUM(cents) AS BIGINT) AS total_cents,
                 list(CAST(cents AS DOUBLE) ORDER BY d) AS xs
          FROM daily GROUP BY 1),
        hw AS (
          SELECT r_name, n_days, total_cents,
                 list_reduce(
                   list_transform(xs, x -> [CAST(1 AS DOUBLE), x,
                     CAST(0 AS DOUBLE), CAST(0 AS DOUBLE),
                     CAST(0 AS DOUBLE), CAST(0 AS DOUBLE),
                     CAST(0 AS DOUBLE), CAST(0 AS DOUBLE),
                     CAST(0 AS DOUBLE), CAST(0 AS DOUBLE)]),
                   (acc, e) -> list_concat(list_concat(list_concat(
                     [acc[1] + CAST(1 AS DOUBLE),
                      CAST(0.4 AS DOUBLE)
                        * (e[2] - acc[4 + CAST(acc[1] AS BIGINT) % 7])
                        + CAST(0.6 AS DOUBLE) * (acc[2] + acc[3]),
                      CAST(0.2 AS DOUBLE)
                        * ((CAST(0.4 AS DOUBLE)
                             * (e[2] - acc[4 + CAST(acc[1] AS BIGINT) % 7])
                             + CAST(0.6 AS DOUBLE) * (acc[2] + acc[3]))
                           - acc[2])
                        + CAST(0.8 AS DOUBLE) * acc[3]],
                     list_slice(acc, 4, 3 + CAST(acc[1] AS BIGINT) % 7)),
                     [CAST(0.3 AS DOUBLE)
                        * (e[2] - (CAST(0.4 AS DOUBLE)
                             * (e[2] - acc[4 + CAST(acc[1] AS BIGINT) % 7])
                             + CAST(0.6 AS DOUBLE) * (acc[2] + acc[3])))
                        + CAST(0.7 AS DOUBLE)
                          * acc[4 + CAST(acc[1] AS BIGINT) % 7]]),
                     list_slice(acc, 5 + CAST(acc[1] AS BIGINT) % 7, 10)))
                   AS hb
          FROM serie)
        SELECT r_name, n_days, total_cents,
               hb[2] AS hw_level, hb[3] AS hw_trend,
               hb[4] AS s0, hb[5] AS s1, hb[6] AS s2, hb[7] AS s3,
               hb[8] AS s4, hb[9] AS s5, hb[10] AS s6,
               hb[2] + CAST(3 AS DOUBLE) * hb[3]
                 + hb[4 + (CAST(hb[1] AS BIGINT) + 2) % 7] AS forecast_h3
        FROM hw
        ORDER BY r_name""")),

    // Western Electric control-chart rules — the SPC anomaly battery
    // the monitoring family lacked (CUSUM q188 finds a level SHIFT,
    // EWMA q238 smooths; WE rules flag the four classic out-of-control
    // patterns point-by-point): R1 beyond 3σ, R2 two-of-three beyond
    // 2σ same side, R3 four-of-five beyond 1σ same side, R4 eight
    // consecutive same side. Every σ-comparison is EXACT: with n days,
    // sum S and sum-of-squares Q, (xᵢ−μ)² ≷ k²σ² cross-multiplies to
    // (n·xᵢ−S)² ≷ k²·(n·Q−S²) in DECIMAL(38,0) — no sqrt, no float.
    // The run rules are rolling counts over the CALENDAR-BOUNDED daily
    // series (≤ ~2.4k rows — the q188 allowlist precedent), with R4
    // demanding a full 8-row window. Scale: one partial-aggregated
    // daily rollup; the chart itself is bounded by the calendar.
    QueryDef(
      "q326_control_chart_rules",
      (s, dir) => {
        val D = DecimalType(38, 0)
        val daily = Tables.orders(s, dir)
          .groupBy(col("o_orderdate").as("day"))
          .agg(sum((col("o_totalprice").cast(DecimalType(18, 2)) * 100)
            .cast("long")).as("cents"))
        val stats = daily.agg(count(lit(1)).as("n"),
          sum(col("cents").cast(D)).as("s1"),
          sum(expr("cast(cents as decimal(38,0)) * cents")).as("s2"))
        val flagged = daily.crossJoin(broadcast(stats))
          .withColumn("dev", expr("cast(n as decimal(38,0)) * cents - s1"))
          .withColumn("vn2", expr("cast(n as decimal(38,0)) * s2 - s1 * s1"))
          .withColumn("side",
            when(col("dev") > 0, 1L).when(col("dev") < 0, -1L)
              .otherwise(0L))
          .withColumn("b1",
            when(expr("dev * dev > vn2"), 1L).otherwise(0L))
          .withColumn("b2",
            when(expr("dev * dev > 4 * vn2"), 1L).otherwise(0L))
          .withColumn("b3", expr("dev * dev > 9 * vn2"))
        val w3 = Window.orderBy(col("day")).rowsBetween(-2, 0)
        val w5 = Window.orderBy(col("day")).rowsBetween(-4, 0)
        val w8 = Window.orderBy(col("day")).rowsBetween(-7, 0)
        val rules = flagged
          .withColumn("p2", sum(when(col("side") > 0, col("b2"))
            .otherwise(0L)).over(w3))
          .withColumn("m2", sum(when(col("side") < 0, col("b2"))
            .otherwise(0L)).over(w3))
          .withColumn("p1", sum(when(col("side") > 0, col("b1"))
            .otherwise(0L)).over(w5))
          .withColumn("m1", sum(when(col("side") < 0, col("b1"))
            .otherwise(0L)).over(w5))
          .withColumn("s8", sum(col("side")).over(w8))
          .withColumn("c8", count(lit(1)).over(w8))
          .select(col("day"), col("cents"), col("side"),
            col("b3").as("r1"),
            (col("p2") >= 2 || col("m2") >= 2).as("r2"),
            (col("p1") >= 4 || col("m1") >= 4).as("r3"),
            (col("c8") === 8 && abs(col("s8")) === 8).as("r4"))
        rules.where(col("r1") || col("r2") || col("r3") || col("r4"))
          .orderBy(col("day"))
      },
      Some("""
        WITH daily AS (
          SELECT o_orderdate AS day,
                 CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                   AS BIGINT)) AS BIGINT) AS cents
          FROM orders GROUP BY 1),
        st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                      CAST(SUM(cents) AS HUGEINT) AS s1,
                      SUM(CAST(cents AS HUGEINT) * cents) AS s2
               FROM daily),
        f AS (
          SELECT d.day, d.cents,
                 CAST(s.n AS HUGEINT) * d.cents - s.s1 AS dev,
                 CAST(s.n AS HUGEINT) * s.s2 - s.s1 * s.s1 AS vn2
          FROM daily d CROSS JOIN st s),
        g AS (
          SELECT day, cents,
                 CASE WHEN dev > 0 THEN 1
                      WHEN dev < 0 THEN -1 ELSE 0 END AS side,
                 CASE WHEN dev * dev > vn2 THEN 1 ELSE 0 END AS b1,
                 CASE WHEN dev * dev > 4 * vn2 THEN 1 ELSE 0 END AS b2,
                 dev * dev > 9 * vn2 AS b3
          FROM f),
        r AS (
          SELECT day, cents, CAST(side AS BIGINT) AS side, b3 AS r1,
                 SUM(CASE WHEN side > 0 THEN b2 ELSE 0 END) OVER (
                   ORDER BY day ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                   AS p2,
                 SUM(CASE WHEN side < 0 THEN b2 ELSE 0 END) OVER (
                   ORDER BY day ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                   AS m2,
                 SUM(CASE WHEN side > 0 THEN b1 ELSE 0 END) OVER (
                   ORDER BY day ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
                   AS p1,
                 SUM(CASE WHEN side < 0 THEN b1 ELSE 0 END) OVER (
                   ORDER BY day ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
                   AS m1,
                 SUM(side) OVER (
                   ORDER BY day ROWS BETWEEN 7 PRECEDING AND CURRENT ROW)
                   AS s8,
                 COUNT(*) OVER (
                   ORDER BY day ROWS BETWEEN 7 PRECEDING AND CURRENT ROW)
                   AS c8
          FROM g)
        SELECT day, cents, side, r1,
               (p2 >= 2 OR m2 >= 2) AS r2,
               (p1 >= 4 OR m1 >= 4) AS r3,
               (c8 = 8 AND abs(s8) = 8) AS r4
        FROM r
        WHERE r1 OR (p2 >= 2 OR m2 >= 2) OR (p1 >= 4 OR m1 >= 4)
           OR (c8 = 8 AND abs(s8) = 8)
        ORDER BY day""")),

    // Pinball (quantile) loss backtest — the evaluation metric for
    // QUANTILE forecasts (M5-Uncertainty, SLA sizing, safety-stock):
    // for each of the last 6 months per region, forecast the τ ∈
    // {0.1, 0.5, 0.9} revenue quantile as the τ-quantile of all PRIOR
    // months (the expanding-window empirical baseline every fancier
    // model must beat), then score pinball(τ): τ·(y−f) if y ≥ f else
    // (1−τ)·(f−y) — asymmetric exactly so that the optimal forecast IS
    // the τ-quantile. Everything on the cents lattice: quantile = the
    // value at rank ceil(τ·n) (percentile_disc lower-interpolation) via
    // a rank window KEYED on (region, test month) — partition size =
    // prior-month count, CALENDAR-bounded (~84), never row count; the
    // per-mille loss is exact integer cross-multiplication. Output: 5
    // regions × 3 τ, summed over the 6 test months. Scale: one
    // partial-aggregated monthly rollup (+ broadcast dims), then all
    // frames are region×month bounded.
    QueryDef(
      "q338_pinball_loss",
      (s, dir) => {
        val cust = Tables.customer(s, dir)
          .select(col("c_custkey").as("ck"), col("c_nationkey").as("nk"))
        val natReg = Tables.nation(s, dir)
          .join(Tables.region(s, dir),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey").as("nk"), col("r_name"))
        val monthly = Tables.orders(s, dir)
          .select(col("o_custkey").as("ck"),
            col("o_orderdate").cast("date").as("day"),
            (col("o_totalprice").cast(DecimalType(18, 2)) * 100)
              .cast("long").as("cents"))
          .join(broadcast(cust), Seq("ck"))
          .join(broadcast(natReg), Seq("nk"))
          .groupBy(col("r_name"),
            ((year(col("day")) - 1992) * 12 + month(col("day")) - 1)
              .cast("long").as("ym"))
          .agg(sum(col("cents")).as("cents"))
          .cutLineage()
        val mx = monthly.groupBy(col("r_name"))
          .agg(max(col("ym")).as("mx"))
        val pri = monthly.as("t")
          .join(broadcast(mx), Seq("r_name"))
          .where(col("t.ym") > col("mx") - 6)
          .join(monthly.as("p"),
            col("t.r_name") === col("p.r_name") &&
              col("p.ym") < col("t.ym"))
          .select(col("t.r_name").as("rg"), col("t.ym").as("tym"),
            col("t.cents").as("actual"),
            col("p.cents").as("pv"), col("p.ym").as("pym"))
        val w = Window.partitionBy(col("rg"), col("tym"))
          .orderBy(col("pv"), col("pym"))
        val ranked = pri
          .withColumn("rn", row_number().over(w).cast("long"))
          .withColumn("n",
            count(lit(1)).over(Window.partitionBy(col("rg"), col("tym"))))
        val fc = ranked
          .select(col("rg"), col("tym"), col("actual"), col("pv"),
            col("rn"), col("n"),
            explode(array(lit(100L), lit(500L), lit(900L))).as("tau"))
          .where(col("rn") === expr("(tau * n + 999) div 1000"))
        fc.select(col("rg"), col("tau"),
            col("actual"), col("pv").as("forecast"),
            when(col("actual") >= col("pv"),
              col("tau") * (col("actual") - col("pv")))
              .otherwise((lit(1000L) - col("tau"))
                * (col("pv") - col("actual"))).as("loss_x1000"))
          .groupBy(col("rg"), col("tau"))
          .agg(count(lit(1)).as("n_months"),
            sum(col("loss_x1000")).as("pinball_x1000"),
            sum(col("forecast")).as("sum_forecast_cents"),
            sum(col("actual")).as("sum_actual_cents"))
          .orderBy(col("rg"), col("tau"))
      },
      Some("""
        WITH monthly AS (
          SELECT r.r_name,
                 CAST((year(CAST(o.o_orderdate AS DATE)) - 1992) * 12
                      + month(CAST(o.o_orderdate AS DATE)) - 1 AS BIGINT)
                   AS ym,
                 CAST(SUM(CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
                   AS BIGINT)) AS BIGINT) AS cents
          FROM orders o
          JOIN customer c ON o.o_custkey = c.c_custkey
          JOIN nation n ON c.c_nationkey = n.n_nationkey
          JOIN region r ON n.n_regionkey = r.r_regionkey
          GROUP BY 1, 2),
        mx AS (SELECT r_name, MAX(ym) AS mx FROM monthly GROUP BY 1),
        pri AS (
          SELECT t.r_name AS rg, t.ym AS tym, t.cents AS actual,
                 p.cents AS pv, p.ym AS pym
          FROM monthly t
          JOIN mx ON mx.r_name = t.r_name
          JOIN monthly p ON p.r_name = t.r_name AND p.ym < t.ym
          WHERE t.ym > mx.mx - 6),
        ranked AS (
          SELECT rg, tym, actual, pv,
                 CAST(row_number() OVER (PARTITION BY rg, tym
                   ORDER BY pv, pym) AS BIGINT) AS rn,
                 CAST(COUNT(*) OVER (PARTITION BY rg, tym) AS BIGINT) AS n
          FROM pri),
        fc AS (
          SELECT rg, tym, actual, pv, tau
          FROM ranked
          CROSS JOIN (SELECT unnest([100, 500, 900]::BIGINT[]) AS tau) q
          WHERE rn = (tau * n + 999) // 1000)
        SELECT rg, tau,
               CAST(COUNT(*) AS BIGINT) AS n_months,
               CAST(SUM(CASE WHEN actual >= pv
                        THEN tau * (actual - pv)
                        ELSE (1000 - tau) * (pv - actual) END) AS BIGINT)
                 AS pinball_x1000,
               CAST(SUM(pv) AS BIGINT) AS sum_forecast_cents,
               CAST(SUM(actual) AS BIGINT) AS sum_actual_cents
        FROM fc
        GROUP BY 1, 2
        ORDER BY rg, tau""")),

    // Mann-Kendall trend test + Theil-Sen slope — the standard PAIR for
    // nonparametric time-series trend (the q188 CUSUM asks "did the
    // level SHIFT", this asks "is there a monotone TREND", robust to
    // outlier months that wreck an OLS slope). Series = monthly revenue
    // (calendar-bounded, ~96 rows at any data size — the pair frame is
    // ≤n(n-1)/2 ≈ 4.6k rows, a BOUNDED all-pairs, never corpus²).
    // S = Σ_{i<j} sign(r_j−r_i) exact; Var(S) carries the tie
    // correction [n(n-1)(2n+5) − Σt(t-1)(2t+5)] div 18 (floored —
    // error < 1 on an integer-scale variance, engine-identical);
    // verdict = continuity-corrected z² in ppm vs χ²₀.₉₅(1). The
    // Theil-Sen estimate is the LOWER MEDIAN of the pairwise slopes on
    // the micro-lattice — dy·10⁶ over TRUE month distance dx (gap
    // months cost nothing), floored via the |·|-split so both engines
    // agree on negative slopes, rank picked with a (slope, i, j) total
    // tiebreak. Scale: one monthly rollup ends the corpus's
    // involvement; every later frame is calendar-bounded.
    QueryDef(
      "q365_mann_kendall_theil_sen",
      (s, dir) => {
        val monthly = Tables.orders(s, dir)
          .groupBy((year(col("o_orderdate")) * 100 + month(col("o_orderdate")))
            .cast("long").as("mkey"),
            (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
              .cast("long").as("midx"))
          .agg(sum(expr(
            "cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)"))
            .as("r"))
          .cutLineage()
        val pairs = monthly.select(col("mkey").as("ki"), col("midx").as("xi"),
            col("r").as("ri"))
          .join(monthly.select(col("mkey").as("kj"), col("midx").as("xj"),
            col("r").as("rj")), col("ki") < col("kj"))
          .withColumn("dy", col("rj") - col("ri"))
          .withColumn("dx", col("xj") - col("xi"))
          .withColumn("slope_micro", expr(
            """case when dy < 0 then -((-dy * 1000000 + dx - 1) div dx)
               else (dy * 1000000) div dx end"""))
          .cutLineage()
        val sAgg = pairs.agg(
          count(lit(1)).as("n_pairs"),
          sum(signum(col("dy")).cast("long")).as("s"))
        val ties = monthly.groupBy(col("r")).agg(count(lit(1)).as("t"))
          .agg(sum(expr("t * (t - 1) * (2 * t + 5)")).as("t1"),
            count(lit(1)).as("n_distinct_r"))
        val nn = monthly.agg(count(lit(1)).as("n_months"))
        val med = pairs
          .withColumn("rn", row_number().over(
            Window.orderBy(col("slope_micro"), col("ki"), col("kj")))
            .cast("long"))
          .crossJoin(broadcast(sAgg.select(col("n_pairs").as("np"))))
          .where(col("rn") === expr("(np + 1) div 2"))
          .select(col("slope_micro").as("ts_slope_micro_per_month"))
        sAgg.crossJoin(broadcast(nn)).crossJoin(broadcast(ties))
          .crossJoin(broadcast(med))
          .withColumn("var18", expr(
            """(n_months * (n_months - 1) * (2 * n_months + 5) - t1)
               div 18"""))
          .withColumn("z2_ppm", expr(
            """case when var18 <= 0 or abs(s) <= 1 then 0
               else ((abs(s) - 1) * (abs(s) - 1) * 1000000) div var18
               end"""))
          .select(col("n_months"), col("n_pairs"), col("s"), col("var18"),
            col("z2_ppm"), (col("z2_ppm") > 3841459L).as("mk_significant"),
            col("ts_slope_micro_per_month"))
      },
      Some("""
        WITH monthly AS MATERIALIZED (
          SELECT CAST(year(o_orderdate)*100 + month(o_orderdate) AS BIGINT)
                   AS mkey,
                 CAST(year(o_orderdate)*12 + month(o_orderdate) AS BIGINT)
                   AS midx,
                 CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2))*100
                   AS BIGINT)) AS BIGINT) AS r
          FROM orders GROUP BY 1, 2),
        pairs AS MATERIALIZED (
          SELECT a.mkey AS ki, b.mkey AS kj,
                 b.r - a.r AS dy, b.midx - a.midx AS dx,
                 CASE WHEN b.r - a.r < 0
                      THEN -((-(b.r - a.r) * 1000000 + (b.midx - a.midx) - 1)
                             // (b.midx - a.midx))
                      ELSE ((b.r - a.r) * 1000000) // (b.midx - a.midx)
                 END AS slope_micro
          FROM monthly a JOIN monthly b ON a.mkey < b.mkey),
        sagg AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
                 CAST(SUM(CASE WHEN dy > 0 THEN 1 WHEN dy < 0 THEN -1
                          ELSE 0 END) AS BIGINT) AS s
          FROM pairs),
        ties AS (
          SELECT CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS t1
          FROM (SELECT CAST(COUNT(*) AS BIGINT) AS t
                FROM monthly GROUP BY r)),
        nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_months FROM monthly),
        med AS (
          SELECT slope_micro AS ts_slope_micro_per_month FROM (
            SELECT slope_micro,
                   CAST(row_number() OVER (ORDER BY slope_micro, ki, kj)
                     AS BIGINT) AS rn,
                   CAST(COUNT(*) OVER () AS BIGINT) AS np
            FROM pairs)
          WHERE rn = (np + 1) // 2),
        fin AS (
          SELECT nn.n_months, sagg.n_pairs, sagg.s,
                 (nn.n_months * (nn.n_months - 1) * (2 * nn.n_months + 5)
                  - ties.t1) // 18 AS var18,
                 med.ts_slope_micro_per_month
          FROM sagg CROSS JOIN nn CROSS JOIN ties CROSS JOIN med)
        SELECT n_months, n_pairs, s, var18,
               CASE WHEN var18 <= 0 OR abs(s) <= 1 THEN 0
                    ELSE ((abs(s) - 1) * (abs(s) - 1) * 1000000) // var18
               END AS z2_ppm,
               CASE WHEN var18 <= 0 OR abs(s) <= 1 THEN 0
                    ELSE ((abs(s) - 1) * (abs(s) - 1) * 1000000) // var18
               END > 3841459 AS mk_significant,
               ts_slope_micro_per_month
        FROM fin""")),

    // Wald-Wolfowitz runs test on month-over-month revenue change signs
    // — the RANDOMNESS audit that complements q365's trend test: MK
    // asks "does the series drift", runs asks "are the ups and downs
    // independent" (too FEW runs = positive autocorrelation / regime
    // persistence, too many = oscillation — either breaks the i.i.d.
    // assumption every control-chart and CI gate implicitly makes).
    // Exact integer end-to-end: signs from lagged diffs (zeros
    // dropped), runs counted as 1 + sign flips, and the z² avoids
    // the textbook's float moments entirely — with m = 2·n₊·n₋,
    // z² = (R·n − n − m)²·(n−1) / (m·(m−n)) exactly, emitted in ppm.
    // Verdict vs χ²₀.₉₅(1). Scale: the corpus ends at the monthly
    // rollup; both windows run on the ~96-row calendar-bounded frame.
    QueryDef(
      "q366_runs_test",
      (s, dir) => {
        val monthly = Tables.orders(s, dir)
          .groupBy((year(col("o_orderdate")) * 100 + month(col("o_orderdate")))
            .cast("long").as("mkey"))
          .agg(sum(expr(
            "cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)"))
            .as("r"))
          .cutLineage()
        val wOrd = Window.orderBy(col("mkey"))
        val signs = monthly
          .withColumn("d", col("r") - lag(col("r"), 1).over(wOrd))
          .where(col("d").isNotNull && col("d") =!= 0L)
          .select(col("mkey"), signum(col("d")).cast("long").as("sg"))
        val wOrd2 = Window.orderBy(col("mkey"))
        val flips = signs
          .withColumn("prev", lag(col("sg"), 1).over(wOrd2))
          .agg(count(lit(1)).as("n_changes"),
            sum(when(col("sg") === 1L, 1L).otherwise(0L)).as("n_plus"),
            sum(when(col("sg") === -1L, 1L).otherwise(0L)).as("n_minus"),
            (sum(when(col("prev").isNotNull && col("prev") =!= col("sg"), 1L)
              .otherwise(0L)) + 1L).as("n_runs"))
        flips
          .withColumn("m", lit(2L) * col("n_plus") * col("n_minus"))
          .withColumn("num", col("n_runs") * col("n_changes")
            - col("n_changes") - col("m"))
          .withColumn("z2_ppm", expr(
            """case when m * (m - n_changes) <= 0 then 0
               else (num * num * (n_changes - 1) * 1000000)
                    div (m * (m - n_changes)) end"""))
          .select(col("n_changes"), col("n_plus"), col("n_minus"),
            col("n_runs"), col("z2_ppm"),
            (col("z2_ppm") <= 3841459L).as("random_ok"))
      },
      Some("""
        WITH monthly AS (
          SELECT CAST(year(o_orderdate)*100 + month(o_orderdate) AS BIGINT)
                   AS mkey,
                 CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2))*100
                   AS BIGINT)) AS BIGINT) AS r
          FROM orders GROUP BY 1),
        signs AS (
          SELECT mkey, CASE WHEN d > 0 THEN 1 ELSE -1 END AS sg
          FROM (SELECT mkey, r - lag(r) OVER (ORDER BY mkey) AS d
                FROM monthly)
          WHERE d IS NOT NULL AND d <> 0),
        flips AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_changes,
                 CAST(SUM(CASE WHEN sg = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_plus,
                 CAST(SUM(CASE WHEN sg = -1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_minus,
                 CAST(SUM(CASE WHEN prev IS NOT NULL AND prev <> sg
                          THEN 1 ELSE 0 END) + 1 AS BIGINT) AS n_runs
          FROM (SELECT sg, lag(sg) OVER (ORDER BY mkey) AS prev
                FROM signs)),
        fin AS (
          SELECT *, 2 * n_plus * n_minus AS m,
                 n_runs * n_changes - n_changes - 2 * n_plus * n_minus
                   AS num
          FROM flips)
        SELECT n_changes, n_plus, n_minus, n_runs,
               CASE WHEN m * (m - n_changes) <= 0 THEN 0
                    ELSE (num * num * (n_changes - 1) * 1000000)
                         // (m * (m - n_changes)) END AS z2_ppm,
               CASE WHEN m * (m - n_changes) <= 0 THEN 0
                    ELSE (num * num * (n_changes - 1) * 1000000)
                         // (m * (m - n_changes)) END <= 3841459
                 AS random_ok
        FROM fin"""))
  )
}
