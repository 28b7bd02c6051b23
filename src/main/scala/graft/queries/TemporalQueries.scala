package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.operators.Scd2
import graft.sources.Tables

/** Round-4 batch 8 — temporal lookups over versioned history:
  *
  *  - q110: point-in-time (AS OF) resolution against the SCD2 snapshot
  *    q65 builds — the query side of the snapshot contract. dbt builds
  *    snapshots so marts can ask "what did this dimension look like on
  *    date X"; this gates that exact read path: probe timestamps resolve
  *    each key's version via the half-open [valid_from, valid_to)
  *    interval, one row per (probe, key), then roll up.
  */
object TemporalQueries {

  val defs: Seq[QueryDef] = Seq(

    // Point-in-time lookup against the merged SCD2 history (same corpus
    // construction as q65: Jan 1 base, Feb 1 batch with changes/dups/new
    // keys). Probes at Jan 15 (pre-batch: every key must resolve to its
    // v1) and Feb 15 (post-batch: changed keys → v2, unchanged → v1, new
    // keys appear). The AS OF predicate is the half-open interval match —
    // on a real deployment the history is key-partitioned and the probe
    // side broadcasts, so resolution is a map-side pruned lookup, not a
    // scan of all versions. Gate rolls up per (probe_ts, status) with a
    // key checksum so a wrong version pick cannot hide in the counts.
    QueryDef(
      "q110_scd2_pointintime",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val t1 = lit("2024-01-01 00:00:00").cast("timestamp")
        val t2 = lit("2024-02-01 00:00:00").cast("timestamp")
        val existing = o.select(col("o_orderkey").as("k"),
          col("o_orderstatus").as("status"),
          col("o_orderpriority").as("prio"),
          t1.as("valid_from"), lit(null).cast("timestamp").as("valid_to"))
        val revisits = o.where(col("o_orderkey") % 3 === 0)
          .select(col("o_orderkey").as("k"),
            when(col("o_orderkey") % 6 === 0, lit("X"))
              .otherwise(col("o_orderstatus")).as("status"),
            col("o_orderpriority").as("prio"), t2.as("updated_at"))
        val newKeys = o.where(col("o_orderkey") % 7 === 0)
          .select((col("o_orderkey") + 1000000000L).as("k"),
            lit("N").as("status"), col("o_orderpriority").as("prio"),
            t2.as("updated_at"))
        val history = Scd2.merge(existing, revisits.unionByName(newKeys),
          "k", Seq("status", "prio"), "updated_at")
        val probes = s.createDataFrame(
          java.util.Arrays.asList(
            org.apache.spark.sql.Row(java.sql.Timestamp.valueOf("2024-01-15 00:00:00")),
            org.apache.spark.sql.Row(java.sql.Timestamp.valueOf("2024-02-15 00:00:00"))),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("probe_ts",
              org.apache.spark.sql.types.TimestampType))))
        val asOf = history.join(broadcast(probes),
          col("valid_from") <= col("probe_ts") &&
            (col("valid_to").isNull || col("probe_ts") < col("valid_to")))
        asOf.groupBy(col("probe_ts"), col("status"))
          .agg(count(lit(1)).as("n_keys"), sum(col("k")).as("key_sum"))
          .orderBy(col("probe_ts"), col("status"))
      },
      Some("""
        WITH existing AS (
          SELECT o_orderkey AS k, o_orderstatus AS status, o_orderpriority AS prio,
                 TIMESTAMP '2024-01-01 00:00:00' AS valid_from,
                 CAST(NULL AS TIMESTAMP) AS valid_to
          FROM orders),
        fresh AS (
          SELECT o_orderkey AS k,
                 CASE WHEN o_orderkey % 6 = 0 THEN 'X' ELSE o_orderstatus END AS status,
                 o_orderpriority AS prio,
                 TIMESTAMP '2024-02-01 00:00:00' AS updated_at
          FROM orders WHERE o_orderkey % 3 = 0
          UNION ALL
          SELECT o_orderkey + 1000000000, 'N', o_orderpriority,
                 TIMESTAMP '2024-02-01 00:00:00'
          FROM orders WHERE o_orderkey % 7 = 0),
        changed AS (
          SELECT e.k, f.updated_at AS close_at
          FROM existing e JOIN fresh f USING (k)
          WHERE (e.status IS DISTINCT FROM f.status OR e.prio IS DISTINCT FROM f.prio)
            AND f.updated_at > e.valid_from),
        history AS (
          SELECT e.* FROM existing e
          WHERE NOT EXISTS (SELECT 1 FROM changed c WHERE c.k = e.k)
          UNION ALL
          SELECT e.k, e.status, e.prio, e.valid_from, c.close_at
          FROM existing e JOIN changed c USING (k)
          UNION ALL
          SELECT f.k, f.status, f.prio, f.updated_at, CAST(NULL AS TIMESTAMP)
          FROM fresh f
          WHERE EXISTS (SELECT 1 FROM changed c WHERE c.k = f.k)
             OR NOT EXISTS (SELECT 1 FROM existing e WHERE e.k = f.k)),
        probes AS (
          SELECT TIMESTAMP '2024-01-15 00:00:00' AS probe_ts
          UNION ALL
          SELECT TIMESTAMP '2024-02-15 00:00:00')
        SELECT p.probe_ts, h.status,
               COUNT(*) AS n_keys, CAST(SUM(h.k) AS BIGINT) AS key_sum
        FROM history h JOIN probes p
          ON h.valid_from <= p.probe_ts
         AND (h.valid_to IS NULL OR p.probe_ts < h.valid_to)
        GROUP BY 1, 2
        ORDER BY 1, 2""")),

    // SCD TYPE-3 derivation (current + previous attribute value as
    // columns — the "keep one prior version" pattern next to the full
    // type-2 history q65 builds): per customer, current order priority
    // is the latest order's; previous is the most recent order whose
    // priority DIFFERS from current (null when the customer never
    // changed). Both picks are max_by over the (date, orderkey) total
    // order — two aggregate passes sharing the customer key, no
    // self-join fan-out. Oracle mirrors via row_number windows (DuckDB
    // arg_max rejects struct ordering keys).
    QueryDef(
      "q159_scd3_prev_value",
      (s, dir) => {
        val o = Tables.orders(s, dir).select(col("o_custkey"),
          col("o_orderdate"), col("o_orderkey"), col("o_orderpriority"))
        val ord = struct(col("o_orderdate"), col("o_orderkey"))
        val cur = o.groupBy(col("o_custkey"))
          .agg(max_by(col("o_orderpriority"), ord).as("cur_priority"))
        val prev = o.join(cur, Seq("o_custkey"))
          .where(col("o_orderpriority") =!= col("cur_priority"))
          .groupBy(col("o_custkey"))
          .agg(max_by(col("o_orderpriority"), ord).as("prev_priority"))
        cur.join(prev, Seq("o_custkey"), "left")
          .groupBy(col("cur_priority"),
            coalesce(col("prev_priority"), lit("NONE")).as("prev_priority"))
          .agg(count(lit(1)).as("n_customers"),
            sum(col("o_custkey")).as("cust_sum"))
          .orderBy(col("cur_priority"), col("prev_priority"))
      },
      Some("""
        WITH cur AS (
          SELECT o_custkey, o_orderpriority AS cur_priority FROM (
            SELECT o_custkey, o_orderpriority,
                   row_number() OVER (PARTITION BY o_custkey
                     ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
            FROM orders) WHERE rn = 1),
        prev AS (
          SELECT o_custkey, o_orderpriority AS prev_priority FROM (
            SELECT o.o_custkey, o.o_orderpriority,
                   row_number() OVER (PARTITION BY o.o_custkey
                     ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
            FROM orders o JOIN cur c ON o.o_custkey = c.o_custkey
              AND o.o_orderpriority <> c.cur_priority) WHERE rn = 1)
        SELECT c.cur_priority,
               COALESCE(p.prev_priority, 'NONE') AS prev_priority,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               CAST(SUM(c.o_custkey) AS BIGINT) AS cust_sum
        FROM cur c LEFT JOIN prev p USING (o_custkey)
        GROUP BY 1, 2
        ORDER BY 1, 2""")),

    // Allen's interval algebra — classify every ordered pair of
    // per-(user, event-type) activity spans [min ts, max ts] into the
    // 13 Allen relations (precedes/meets/overlaps/starts/during/
    // finishes/equals + the 6 inverses), counting pairs per (type_a,
    // type_b, relation). This is the temporal-reasoning completeness op
    // the interval queries (q103 concurrency, q174 k-coverage, q44
    // range join) don't cover: an exact relation TAXONOMY, not a
    // measure. The CASE ladder tests equality cases before the strict
    // ones (meets before precedes, equals/starts/finishes before
    // during/overlaps) — the decision order IS the spec, mirrored
    // verbatim in the oracle. Scale: spans are one partial agg on
    // (user, type); the pair fan-out is a per-user self-join bounded by
    // |event types|² = 25, map-side after one user_id exchange.
    QueryDef(
      "q221_allen_relations",
      (s, dir) => {
        val spans = Tables.events(s, dir)
          .groupBy(col("user_id"), col("event_type"))
          .agg(min(unix_micros(col("ts"))).as("lo"),
            max(unix_micros(col("ts"))).as("hi"))
        val a = spans.select(col("user_id"), col("event_type").as("type_a"),
          col("lo").as("a_lo"), col("hi").as("a_hi"))
        val b = spans.select(col("user_id"), col("event_type").as("type_b"),
          col("lo").as("b_lo"), col("hi").as("b_hi"))
        val rel =
          when(col("a_hi") < col("b_lo"), "precedes")
            .when(col("a_hi") === col("b_lo"), "meets")
            .when(col("b_hi") < col("a_lo"), "preceded_by")
            .when(col("b_hi") === col("a_lo"), "met_by")
            .when(col("a_lo") === col("b_lo") && col("a_hi") === col("b_hi"),
              "equals")
            .when(col("a_lo") === col("b_lo") && col("a_hi") < col("b_hi"),
              "starts")
            .when(col("a_lo") === col("b_lo"), "started_by")
            .when(col("a_hi") === col("b_hi") && col("a_lo") > col("b_lo"),
              "finishes")
            .when(col("a_hi") === col("b_hi"), "finished_by")
            .when(col("a_lo") > col("b_lo") && col("a_hi") < col("b_hi"),
              "during")
            .when(col("a_lo") < col("b_lo") && col("a_hi") > col("b_hi"),
              "contains")
            .when(col("a_lo") < col("b_lo"), "overlaps")
            .otherwise("overlapped_by")
        a.join(b, Seq("user_id"))
          .where(col("type_a") < col("type_b"))
          .select(col("type_a"), col("type_b"), rel.as("relation"))
          .groupBy(col("type_a"), col("type_b"), col("relation"))
          .agg(count(lit(1)).as("n_pairs"))
          .orderBy(col("type_a"), col("type_b"), col("relation"))
      },
      Some("""
        WITH spans AS (
          SELECT user_id, event_type,
                 MIN(epoch_us(ts)) AS lo, MAX(epoch_us(ts)) AS hi
          FROM events GROUP BY 1, 2),
        pairs AS (
          SELECT a.user_id, a.event_type AS type_a, b.event_type AS type_b,
                 a.lo AS a_lo, a.hi AS a_hi, b.lo AS b_lo, b.hi AS b_hi
          FROM spans a JOIN spans b
            ON a.user_id = b.user_id AND a.event_type < b.event_type),
        classified AS (
          SELECT type_a, type_b,
                 CASE
                   WHEN a_hi < b_lo THEN 'precedes'
                   WHEN a_hi = b_lo THEN 'meets'
                   WHEN b_hi < a_lo THEN 'preceded_by'
                   WHEN b_hi = a_lo THEN 'met_by'
                   WHEN a_lo = b_lo AND a_hi = b_hi THEN 'equals'
                   WHEN a_lo = b_lo AND a_hi < b_hi THEN 'starts'
                   WHEN a_lo = b_lo THEN 'started_by'
                   WHEN a_hi = b_hi AND a_lo > b_lo THEN 'finishes'
                   WHEN a_hi = b_hi THEN 'finished_by'
                   WHEN a_lo > b_lo AND a_hi < b_hi THEN 'during'
                   WHEN a_lo < b_lo AND a_hi > b_hi THEN 'contains'
                   WHEN a_lo < b_lo THEN 'overlaps'
                   ELSE 'overlapped_by'
                 END AS relation
          FROM pairs)
        SELECT type_a, type_b, relation,
               CAST(COUNT(*) AS BIGINT) AS n_pairs
        FROM classified
        GROUP BY 1, 2, 3
        ORDER BY type_a, type_b, relation""")),

    // Bitemporal point-in-time queries — the two-axis extension of SCD2
    // (q65 tracks valid time; q110 reads it as-of): every fact carries
    // BOTH a valid-time (when the price was effective) and a
    // transaction-time (when the system learned it), and the query "as
    // KNOWN at audit date T, effective at V" must pick, per order, the
    // latest-tx version ≤ T among versions valid ≤ V — retroactive
    // corrections change history without erasing what was believed
    // before. Versions are synthesized deterministically (every 7th
    // order gets a -10% correction transacted 45 days after booking;
    // exact integer cents, cents - cents div 10). A 4-point (T, V)
    // audit grid broadcast-fans the fact scan; version pick is one
    // row_number window clustered on (grid point, order) — at 100 TB
    // the grid stays tiny and the window rides the order-key exchange.
    QueryDef(
      "q230_bitemporal_asof",
      (s, dir) => {
        import s.implicits._
        val base = Tables.orders(s, dir)
          .select(col("o_orderkey").as("k"), col("o_orderdate").as("vf"),
            (col("o_totalprice").cast(DecimalType(18, 2)) * 100).cast("long")
              .as("cents"))
        val v0 = base.select(col("k"), col("vf"), col("vf").as("txf"),
          col("cents"), lit(0L).as("ver"))
        val v1 = base.where(col("k") % 7 === 0)
          .select(col("k"), col("vf"), date_add(col("vf"), 45).as("txf"),
            (col("cents") - expr("cents div 10")).as("cents"),
            lit(1L).as("ver"))
        val versions = v0.unionByName(v1)
        val grid = Seq(
          ("1995-06-01", "1995-03-01"), ("1995-06-01", "1995-06-01"),
          ("1996-06-01", "1995-03-01"), ("1996-06-01", "1996-06-01"))
          .toDF("t_audit", "v_eff")
          .select(col("t_audit").cast("date").as("t_audit"),
            col("v_eff").cast("date").as("v_eff"))
        val visible = versions.crossJoin(broadcast(grid))
          .where(col("txf") <= col("t_audit") && col("vf") <= col("v_eff"))
        val w = Window.partitionBy(col("t_audit"), col("v_eff"), col("k"))
          .orderBy(col("txf").desc, col("ver").desc)
        visible.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
          .groupBy(col("t_audit"), col("v_eff"))
          .agg(count(lit(1)).as("n_orders"),
            sum(col("cents")).as("believed_cents"),
            sum(when(col("ver") === 1, 1L).otherwise(0L))
              .as("n_corrected_visible"))
          .orderBy(col("t_audit"), col("v_eff"))
      },
      Some("""
        WITH base AS (
          SELECT o_orderkey AS k, CAST(o_orderdate AS DATE) AS vf,
                 CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS cents
          FROM orders),
        versions AS (
          SELECT k, vf, vf AS txf, cents, 0 AS ver FROM base
          UNION ALL
          SELECT k, vf, vf + 45 AS txf, cents - cents // 10, 1
          FROM base WHERE k % 7 = 0),
        grid AS (
          SELECT CAST(t_audit AS DATE) AS t_audit, CAST(v_eff AS DATE) AS v_eff
          FROM (VALUES
            ('1995-06-01', '1995-03-01'), ('1995-06-01', '1995-06-01'),
            ('1996-06-01', '1995-03-01'), ('1996-06-01', '1996-06-01'))
            AS t(t_audit, v_eff)),
        visible AS (
          SELECT g.t_audit, g.v_eff, v.k, v.cents, v.ver,
                 row_number() OVER (PARTITION BY g.t_audit, g.v_eff, v.k
                   ORDER BY v.txf DESC, v.ver DESC) AS rn
          FROM versions v CROSS JOIN grid g
          WHERE v.txf <= g.t_audit AND v.vf <= g.v_eff)
        SELECT t_audit, v_eff,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(cents) AS BIGINT) AS believed_cents,
               CAST(SUM(CASE WHEN ver = 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_corrected_visible
        FROM visible WHERE rn = 1
        GROUP BY 1, 2
        ORDER BY t_audit, v_eff""")))
}
