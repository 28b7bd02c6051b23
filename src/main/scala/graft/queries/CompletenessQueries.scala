package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.functions.Kernels._
import graft.sources.Tables

/** Round-4 batch 11 — SQL-surface completeness: the remaining standard
  * constructs a reference user would reach for that had no dedicated
  * gate yet. CUBE (q123) completes the grouping-set family next to
  * ROLLUP/PIVOT/UNPIVOT (q67-q69); EXCEPT ALL / INTERSECT ALL (q124)
  * complete the set-op family next to the DISTINCT forms (q74);
  * percentile_disc (q128) completes the quantile family next to
  * percentile_cont (q07) — disc returns an actual corpus element, so
  * the gate is exact with no interpolation arithmetic at all.
  */
object CompletenessQueries {

  val defs: Seq[QueryDef] = Seq(

    // Linear-interpolation gap-fill — the interpolating sibling of q97's
    // LOCF. Missing months get prev + (next−prev)·(k/g) where k = months
    // since the previous active month and g = the gap span: both carries
    // (ignore-nulls last backward, ignore-nulls first forward) share ONE
    // customer-partitioned sort; the arithmetic is the identical IEEE
    // sequence on both engines (decimal→double once, then mul/add/div).
    QueryDef(
      "q122_linear_gapfill",
      (s, dir) => {
        val o = Tables.orders(s, dir).select(
          col("o_custkey").as("customer_id"),
          trunc(to_date(col("o_orderdate")), "month").as("month_start"),
          dec6(col("o_totalprice")).as("rev"))
        // NO spine join at all — the 100 TB shape. A month-spine +
        // left-join + two ignore-nulls carries is how SQL says it, but
        // relationally every gap month sits BETWEEN two consecutive
        // actual months, so each actual row can emit its own gap run
        // directly: lead() gives (next_m, next_v), explode(sequence(0,
        // g-1)) manufactures offsets, and the interpolation uses the
        // offset k against the gap span g. One hash exchange on
        // customer_id feeds the (customer, month) aggregate, and the
        // lead window reuses that partitioning (ClusteredDistribution
        // subset rule) — the spine join this replaces either broadcasts
        // a customers×months frame (dead at scale) or re-shuffles both
        // sides on the exact join keys (Spark co-partitioning wants ALL
        // cluster keys). Measured 5.0 s → 1.5 s warm at sf0.1. The
        // oracle keeps the textbook spine+carry form — same values.
        val byMonth = o.repartition(col("customer_id"))
          .groupBy(col("customer_id"), col("month_start"))
          .agg(money(sum(col("rev"))).cast("double").as("mrev"))
        val w = Window.partitionBy(col("customer_id")).orderBy(col("month_start"))
        val withNext = byMonth
          .withColumn("next_m", lead(col("month_start"), 1).over(w))
          .withColumn("next_v", lead(col("mrev"), 1).over(w))
          .withColumn("g", monthsBetweenCalendar(col("next_m"), col("month_start")))
        withNext
          .withColumn("k", explode(sequence(lit(0), coalesce(col("g") - 1, lit(0)))))
          .select(col("customer_id"),
            add_months(col("month_start"), col("k")).as("month_start"),
            (col("k") === 0).as("is_actual"),
            when(col("k") === 0, col("mrev"))
              .otherwise(col("mrev") + (col("next_v") - col("mrev")) *
                (col("k").cast("double") / col("g").cast("double")))
              .as("filled_revenue"))
          .orderBy(col("customer_id"), col("month_start"))
      },
      Some("""
        WITH o AS (
          SELECT o_custkey AS customer_id,
                 CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS DATE) AS month_start,
                 CAST(o_totalprice AS DECIMAL(18,6)) AS rev
          FROM orders),
        by_month AS (
          SELECT customer_id, month_start,
                 CAST(CAST(SUM(rev) AS DECIMAL(38,6)) AS DOUBLE) AS mrev
          FROM o GROUP BY 1, 2),
        span AS (
          SELECT customer_id, MIN(month_start) AS first_m, MAX(month_start) AS last_m
          FROM by_month GROUP BY 1),
        spine AS (
          SELECT customer_id,
                 CAST(unnest(generate_series(first_m::TIMESTAMP, last_m::TIMESTAMP,
                                             INTERVAL 1 MONTH)) AS DATE) AS month_start
          FROM span),
        filled AS (
          SELECT s.customer_id, s.month_start, b.mrev
          FROM spine s LEFT JOIN by_month b USING (customer_id, month_start)),
        carried AS (
          SELECT customer_id, month_start, mrev,
                 last_value(CASE WHEN mrev IS NOT NULL THEN month_start END IGNORE NULLS)
                   OVER (PARTITION BY customer_id ORDER BY month_start
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_m,
                 last_value(mrev IGNORE NULLS)
                   OVER (PARTITION BY customer_id ORDER BY month_start
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_v,
                 first_value(CASE WHEN mrev IS NOT NULL THEN month_start END IGNORE NULLS)
                   OVER (PARTITION BY customer_id ORDER BY month_start
                         ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_m,
                 first_value(mrev IGNORE NULLS)
                   OVER (PARTITION BY customer_id ORDER BY month_start
                         ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v
          FROM filled)
        SELECT customer_id, month_start,
               mrev IS NOT NULL AS is_actual,
               CASE WHEN mrev IS NOT NULL THEN mrev
                    ELSE prev_v + (next_v - prev_v) *
                         (CAST((year(month_start) - year(prev_m)) * 12
                               + (month(month_start) - month(prev_m)) AS DOUBLE)
                          / CAST((year(next_m) - year(prev_m)) * 12
                                 + (month(next_m) - month(prev_m)) AS DOUBLE))
               END AS filled_revenue
        FROM carried
        ORDER BY customer_id, month_start""")),

    // CUBE grouping sets with grouping_id — all four aggregation levels
    // of (returnflag, linestatus) in one pass. Spark plans one Expand
    // (4 duplicates) + one partial agg; the oracle's GROUPING() bit
    // order matches Spark's grouping_id.
    QueryDef(
      "q123_cube",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        li.cube(col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("n_lines"),
            moneyOut(sum(dec6(col("l_extendedprice")))).as("gross"),
            grouping_id().cast("long").as("gid"))
          .orderBy(col("gid"), col("l_returnflag"), col("l_linestatus"))
      },
      Some("""
        SELECT l_returnflag, l_linestatus,
               COUNT(*) AS n_lines,
               CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DECIMAL(38,6))
                    AS DOUBLE) AS gross,
               CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
        ORDER BY gid, l_returnflag, l_linestatus""")),

    // Bag-semantics set ops: EXCEPT ALL keeps surplus multiplicity,
    // INTERSECT ALL keeps the min multiplicity — the DISTINCT forms
    // (q74) silently collapse both. Spark plans these as counted
    // Generate replays, not joins per duplicate.
    QueryDef(
      "q124_bag_set_ops",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        val a = li.where(col("l_suppkey") % 2 === 0).select(col("l_returnflag"))
        val b = li.where(col("l_suppkey") % 3 === 0).select(col("l_returnflag"))
        val ex = a.exceptAll(b).groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n")).withColumn("op", lit("except_all"))
        val in = a.intersectAll(b).groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n")).withColumn("op", lit("intersect_all"))
        ex.unionByName(in)
          .select(col("op"), col("l_returnflag"), col("n"))
          .orderBy(col("op"), col("l_returnflag"))
      },
      Some("""
        WITH a AS (SELECT l_returnflag FROM lineitem WHERE l_suppkey % 2 = 0),
        b AS (SELECT l_returnflag FROM lineitem WHERE l_suppkey % 3 = 0),
        ex AS (SELECT 'except_all' AS op, l_returnflag, COUNT(*) AS n
               FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b) GROUP BY 2),
        inn AS (SELECT 'intersect_all' AS op, l_returnflag, COUNT(*) AS n
                FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b) GROUP BY 2)
        SELECT op, l_returnflag, n FROM ex
        UNION ALL
        SELECT op, l_returnflag, n FROM inn
        ORDER BY op, l_returnflag""")),

    // regexp_extract_all → explode: the multi-match regex surface (q16
    // gates single-match normalize). Digit runs extracted from the raw
    // props JSON, summed per event type — extraction stays a codegen'd
    // projection; the explode is bounded by matches per row.
    QueryDef(
      "q125_regexp_extract_all",
      (s, dir) => {
        val e = Tables.events(s, dir)
        e.select(col("event_type"),
            explode(expr("regexp_extract_all(props, '[0-9]+', 0)")).as("num"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_matches"),
            sum(col("num").cast("long")).as("num_sum"))
          .orderBy(col("event_type"))
      },
      Some("""
        SELECT event_type,
               COUNT(*) AS n_matches,
               CAST(SUM(CAST(num AS BIGINT)) AS BIGINT) AS num_sum
        FROM (SELECT event_type, unnest(regexp_extract_all(props, '[0-9]+')) AS num
              FROM events)
        GROUP BY event_type
        ORDER BY event_type""")),

    // Month-over-month growth in exact permille: revenue floored to
    // whole units (exact decimal floor → BIGINT), growth = floor((cur −
    // prev)·1000 / prev) with magnitudes far under 2⁵³ so the double
    // floor-div is IEEE-exact on both engines — no decimal-division
    // semantics to disagree about. lag() shares the segment sort.
    QueryDef(
      "q126_mom_growth",
      (s, dir) => {
        val o = Tables.orders(s, dir)
          .join(broadcast(Tables.customer(s, dir)),
            col("o_custkey") === col("c_custkey"))
        val monthly = o.groupBy(col("c_mktsegment").as("segment"),
            trunc(to_date(col("o_orderdate")), "month").as("month_start"))
          .agg(floor(sum(dec6(col("o_totalprice")))).cast("long").as("rev_units"))
        val w = Window.partitionBy(col("segment")).orderBy(col("month_start"))
        monthly.withColumn("prev_units", lag(col("rev_units"), 1).over(w))
          .withColumn("growth_permille",
            when(col("prev_units").isNotNull && col("prev_units") =!= 0L,
              floor(((col("rev_units") - col("prev_units")) * 1000L).cast("double")
                / col("prev_units")).cast("long")))
          .orderBy(col("segment"), col("month_start"))
      },
      Some("""
        WITH monthly AS (
          SELECT c.c_mktsegment AS segment,
                 CAST(date_trunc('month', CAST(o.o_orderdate AS DATE)) AS DATE) AS month_start,
                 CAST(floor(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,6)))
                                 AS DECIMAL(38,6))) AS BIGINT) AS rev_units
          FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
          GROUP BY 1, 2),
        lagged AS (
          SELECT segment, month_start, rev_units,
                 lag(rev_units) OVER (PARTITION BY segment ORDER BY month_start)
                   AS prev_units
          FROM monthly)
        SELECT segment, month_start, rev_units, prev_units,
               CASE WHEN prev_units IS NOT NULL AND prev_units <> 0
                    THEN CAST(floor(CAST((rev_units - prev_units) * 1000 AS DOUBLE)
                                    / prev_units) AS BIGINT) END AS growth_permille
        FROM lagged
        ORDER BY segment, month_start""")),

    // Schema-drift union: three ingest "generations" of the same feed
    // with added/renamed/missing columns, harmonized by NAME with typed
    // null padding (unionByName allowMissingColumns) — the loose-schema
    // sibling of the q54/q61 evolution-through-merge gates. Exercises the
    // union path, not the merge path.
    QueryDef(
      "q131_schema_drift_union",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val gen1 = o.where(col("o_orderkey") % 3 === 0)
          .select(col("o_orderkey").as("k"), col("o_orderstatus").as("status"))
        val gen2 = o.where(col("o_orderkey") % 3 === 1)
          .select(col("o_orderkey").as("k"), col("o_orderstatus").as("status"),
            dec6(col("o_totalprice")).as("price"))
        val gen3 = o.where(col("o_orderkey") % 3 === 2)
          .select(col("o_orderkey").as("k"),
            dec6(col("o_totalprice")).as("price"),
            col("o_orderpriority").as("priority"))
        gen1.unionByName(gen2, allowMissingColumns = true)
          .unionByName(gen3, allowMissingColumns = true)
          .groupBy(col("status"))
          .agg(count(lit(1)).as("n_rows"),
            count(col("price")).as("n_priced"),
            count(col("priority")).as("n_prioritized"),
            sum(col("k")).as("key_checksum"))
          .orderBy(col("status").asc_nulls_first)
      },
      Some("""
        WITH u AS (
          SELECT o_orderkey AS k, o_orderstatus AS status,
                 CAST(NULL AS DECIMAL(18,6)) AS price, CAST(NULL AS VARCHAR) AS priority
          FROM orders WHERE o_orderkey % 3 = 0
          UNION ALL
          SELECT o_orderkey, o_orderstatus, CAST(o_totalprice AS DECIMAL(18,6)), NULL
          FROM orders WHERE o_orderkey % 3 = 1
          UNION ALL
          SELECT o_orderkey, NULL, CAST(o_totalprice AS DECIMAL(18,6)), o_orderpriority
          FROM orders WHERE o_orderkey % 3 = 2)
        SELECT status, COUNT(*) AS n_rows,
               COUNT(price) AS n_priced,
               COUNT(priority) AS n_prioritized,
               CAST(SUM(k) AS BIGINT) AS key_checksum
        FROM u
        GROUP BY status
        ORDER BY status NULLS FIRST""")),

    // Grouped top-k WITH TIES (rank, not row_number): every part tied at
    // the k-th retail price within its brand survives — the semantics
    // DENSE/row_number top-k queries (q23) silently change. Window
    // partitions by brand; ties verified by an exact element gate.
    QueryDef(
      "q132_topk_with_ties",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("p_brand")).orderBy(col("p_retailprice").desc)
        Tables.part(s, dir)
          .withColumn("rnk", rank().over(w))
          .where(col("rnk") <= 2)
          .groupBy(col("p_brand"))
          .agg(count(lit(1)).as("n_top"),
            max(col("rnk")).cast("long").as("max_rank"),
            sum(col("p_partkey")).as("part_checksum"))
          .orderBy(col("p_brand"))
      },
      Some("""
        WITH ranked AS (
          SELECT p_brand, p_partkey,
                 rank() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS rnk
          FROM part)
        SELECT p_brand, COUNT(*) AS n_top,
               CAST(MAX(rnk) AS BIGINT) AS max_rank,
               CAST(SUM(p_partkey) AS BIGINT) AS part_checksum
        FROM ranked WHERE rnk <= 2
        GROUP BY p_brand
        ORDER BY p_brand""")),

    // Null-safe join semantics: <=> (IS NOT DISTINCT FROM) matches
    // null-to-null where = drops every null-keyed row — the difference
    // silently corrupts joins on nullable business keys. Keys nulled on
    // a hash slice on both sides; the gate counts both semantics plus
    // the null-pair block (n_nulls_a × n_nulls_b), so the cartesian
    // behavior of the null bucket is explicit, not accidental.
    QueryDef(
      "q149_null_safe_join",
      (s, dir) => {
        val a = Tables.orders(s, dir).select(
          when(col("o_orderkey") % 97 =!= 0, col("o_custkey")).as("k"),
          col("o_orderkey").as("oa"))
        val b = Tables.customer(s, dir).select(
          when(col("c_custkey") % 89 =!= 0, col("c_custkey")).as("k"),
          col("c_custkey").as("cb"))
        val eqCount = a.join(b, a("k") === b("k"))
          .agg(count(lit(1)).as("n"), sum(col("oa") + col("cb")).as("cks"))
          .select(lit("equals").as("semantics"), col("n"), col("cks"))
        val nsCount = a.join(b, a("k") <=> b("k"))
          .agg(count(lit(1)).as("n"), sum(col("oa") + col("cb")).as("cks"))
          .select(lit("null_safe").as("semantics"), col("n"), col("cks"))
        eqCount.unionByName(nsCount).orderBy(col("semantics"))
      },
      Some("""
        WITH a AS (
          SELECT CASE WHEN o_orderkey % 97 <> 0 THEN o_custkey END AS k,
                 o_orderkey AS oa
          FROM orders),
        b AS (
          SELECT CASE WHEN c_custkey % 89 <> 0 THEN c_custkey END AS k,
                 c_custkey AS cb
          FROM customer),
        eq AS (
          SELECT 'equals' AS semantics, COUNT(*) AS n,
                 CAST(SUM(a.oa + b.cb) AS BIGINT) AS cks
          FROM a JOIN b ON a.k = b.k),
        ns AS (
          SELECT 'null_safe' AS semantics, COUNT(*) AS n,
                 CAST(SUM(a.oa + b.cb) AS BIGINT) AS cks
          FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k)
        SELECT * FROM eq UNION ALL SELECT * FROM ns
        ORDER BY semantics""")),

    // percentile_disc — the quantile that RETURNS AN ELEMENT: no
    // interpolation arithmetic, so the gate is exact double equality on
    // actual corpus values (percentile_cont q07 needs the bit-stable
    // interpolation argument; disc needs none).
    QueryDef(
      "q128_percentile_disc",
      (s, dir) => {
        Tables.customer(s, dir)
          .groupBy(col("c_mktsegment"))
          .agg(expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY c_acctbal)").as("p50"),
            expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY c_acctbal)").as("p90"),
            count(lit(1)).as("n_customers"))
          .orderBy(col("c_mktsegment"))
      },
      Some("""
        SELECT c_mktsegment,
               quantile_disc(c_acctbal, 0.5) AS p50,
               quantile_disc(c_acctbal, 0.9) AS p90,
               COUNT(*) AS n_customers
        FROM customer
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment""")))
}
