package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.functions.Kernels._
import graft.sources.Tables

/** Round-4 batch 15 — master-data + pre-aggregate patterns:
  *
  *  - q144: survivorship (golden record): per duplicate-cluster, each
  *    FIELD independently takes its latest non-null value — the MDM
  *    merge rule q94's whole-record argmax can't express.
  *  - q145: rollup-lattice reuse — month aggregates built FROM day
  *    aggregates, quarters FROM months, and the reuse proven correct
  *    against direct computation (the pre-aggregation contract every
  *    100 TB warehouse depends on).
  *  - q146: grid-bucketed spatial radius join in exact micro-degree
  *    integer arithmetic — geohash-style neighbor-cell candidates,
  *    never all-pairs.
  */
object MasterDataQueries {

  val defs: Seq[QueryDef] = Seq(

    // Survivorship: the q11 dup corpus (duplicate (orderkey, linenumber)
    // rows) merged into golden records — each field takes its own
    // latest-by-shipdate NON-NULL value (nulls synthesized: quantity
    // hidden on %3==0 rows, discount on %4==0). max_by over a
    // (non-null flag, shipdate, price) total order per field = one
    // aggregate pass, no window, each field independent. The gate sums
    // the surviving fields, so a wrong per-field pick cannot hide.
    QueryDef(
      "q144_survivorship",
      (s, dir) => {
        val li = Tables.lineitem(s, dir).select(
          col("l_orderkey").as("k"), col("l_linenumber").as("ln"),
          col("l_shipdate"), dec6(col("l_extendedprice")).as("price"),
          when(col("l_partkey") % 3 =!= 0, col("l_quantity")).as("qty"),
          when(col("l_suppkey") % 4 =!= 0, dec6(col("l_discount"))).as("disc"))
        // per-field ordering key: non-null first, then recency, then a
        // price tiebreak (dup rows can share shipdate)
        def pick(c: String) = max_by(col(c),
          struct(col(c).isNotNull.cast("int"), col("l_shipdate"), col("price"), col(c)))
        val golden = li.groupBy(col("k"), col("ln"))
          .agg(count(lit(1)).as("n_versions"),
            pick("qty").as("qty"), pick("disc").as("disc"),
            max_by(col("price"), struct(col("l_shipdate"), col("price"))).as("price"))
        golden.agg(
            count(lit(1)).as("n_golden"),
            sum(when(col("n_versions") > 1, 1L).otherwise(0L)).as("n_merged"),
            sum(col("qty")).cast("double").as("qty_sum"),
            moneyOut(sum(col("disc"))).as("disc_sum"),
            sum(when(col("qty").isNull, 1L).otherwise(0L)).as("n_qty_null"),
            sum(when(col("disc").isNull, 1L).otherwise(0L)).as("n_disc_null"))
          .orderBy(col("n_golden"))
      },
      Some("""
        WITH li AS (
          SELECT l_orderkey AS k, l_linenumber AS ln, l_shipdate,
                 CAST(l_extendedprice AS DECIMAL(18,6)) AS price,
                 CASE WHEN l_partkey % 3 <> 0 THEN l_quantity END AS qty,
                 CASE WHEN l_suppkey % 4 <> 0
                      THEN CAST(l_discount AS DECIMAL(18,6)) END AS disc
          FROM lineitem),
        counts AS (
          SELECT k, ln, COUNT(*) AS n_versions FROM li GROUP BY k, ln),
        qpick AS (
          SELECT k, ln, qty FROM (
            SELECT k, ln, qty, row_number() OVER (PARTITION BY k, ln
              ORDER BY (qty IS NOT NULL) DESC, l_shipdate DESC, price DESC,
                       qty DESC NULLS LAST) AS rn
            FROM li) WHERE rn = 1),
        dpick AS (
          SELECT k, ln, disc FROM (
            SELECT k, ln, disc, row_number() OVER (PARTITION BY k, ln
              ORDER BY (disc IS NOT NULL) DESC, l_shipdate DESC, price DESC,
                       disc DESC NULLS LAST) AS rn
            FROM li) WHERE rn = 1),
        golden AS (
          SELECT c.k, c.ln, c.n_versions, q.qty, d.disc
          FROM counts c JOIN qpick q USING (k, ln) JOIN dpick d USING (k, ln))
        SELECT COUNT(*) AS n_golden,
               CAST(SUM(CASE WHEN n_versions > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_merged,
               CAST(SUM(qty) AS DOUBLE) AS qty_sum,
               CAST(CAST(SUM(disc) AS DECIMAL(38,6)) AS DOUBLE) AS disc_sum,
               CAST(SUM(CASE WHEN qty IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_qty_null,
               CAST(SUM(CASE WHEN disc IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_disc_null
        FROM golden
        ORDER BY n_golden""")),

    // Rollup lattice: day → month → quarter, each level built FROM the
    // level below (counts/sums re-aggregate; NO re-scan of the fact),
    // with the reuse PROVEN: quarter-from-months must equal
    // quarter-from-facts exactly (both engines compute both paths). At
    // 100 TB this is the difference between scanning the day table
    // (365 rows/key) and the fact table (millions/key) for every
    // monthly report. Exact decimals re-aggregate losslessly — that is
    // the mergeability contract the gate pins.
    QueryDef(
      "q145_rollup_lattice",
      (s, dir) => {
        val o = Tables.orders(s, dir).select(
          to_date(col("o_orderdate")).as("d"), dec6(col("o_totalprice")).as("rev"))
        val day = o.groupBy(col("d"))
          .agg(count(lit(1)).as("n"), money(sum(col("rev"))).as("rev"))
        val month = day.groupBy(trunc(col("d"), "month").as("m"))
          .agg(sum(col("n")).as("n"), money(sum(col("rev"))).as("rev"))
        val quarterFromMonth = month.groupBy(trunc(col("m"), "quarter").as("q"))
          .agg(sum(col("n")).as("n"), money(sum(col("rev"))).as("rev"))
        val quarterDirect = o.groupBy(trunc(col("d"), "quarter").as("q"))
          .agg(count(lit(1)).as("n_direct"), money(sum(col("rev"))).as("rev_direct"))
        quarterFromMonth.join(quarterDirect, Seq("q"))
          .select(col("q"), col("n"), moneyOut(col("rev")).as("revenue"),
            (col("n") === col("n_direct") &&
              col("rev") === col("rev_direct")).as("lattice_consistent"))
          .orderBy(col("q"))
      },
      Some("""
        WITH o AS (
          SELECT CAST(o_orderdate AS DATE) AS d,
                 CAST(o_totalprice AS DECIMAL(18,6)) AS rev
          FROM orders),
        day AS (
          SELECT d, COUNT(*) AS n, CAST(SUM(rev) AS DECIMAL(38,6)) AS rev
          FROM o GROUP BY d),
        month AS (
          SELECT CAST(date_trunc('month', d) AS DATE) AS m,
                 CAST(SUM(n) AS BIGINT) AS n,
                 CAST(SUM(rev) AS DECIMAL(38,6)) AS rev
          FROM day GROUP BY 1),
        qm AS (
          SELECT CAST(date_trunc('quarter', m) AS DATE) AS q,
                 CAST(SUM(n) AS BIGINT) AS n,
                 CAST(SUM(rev) AS DECIMAL(38,6)) AS rev
          FROM month GROUP BY 1),
        qd AS (
          SELECT CAST(date_trunc('quarter', d) AS DATE) AS q,
                 COUNT(*) AS n_direct,
                 CAST(SUM(rev) AS DECIMAL(38,6)) AS rev_direct
          FROM o GROUP BY 1)
        SELECT qm.q, qm.n, CAST(qm.rev AS DOUBLE) AS revenue,
               qm.n = qd.n_direct AND qm.rev = qd.rev_direct AS lattice_consistent
        FROM qm JOIN qd ON qm.q = qd.q
        ORDER BY qm.q""")),

    // Grid-bucketed spatial radius join, all-integer: synthetic customer
    // points in micro-degree space (pure functions of custkey — both
    // engines derive identical coordinates), suppliers likewise; grid
    // cell = floor-div by the radius, so every point within L∞ radius r
    // of a query point lies in the 3×3 neighbor cells — the geohash
    // blocking stance (candidates from 9 cell joins, exact L2² integer
    // filter, NEVER all-pairs). Σ cell² bounds the join like LSH buckets.
    QueryDef(
      "q146_grid_spatial_join",
      (s, dir) => {
        val r = 200000L // micro-degree radius; cell size = r
        val cust = Tables.customer(s, dir).select(col("c_custkey").as("cid"),
          (md5BitsModK(md5Bits(concat(lit("cx:"), col("c_custkey"))), 10000000L))
            .as("x"),
          (md5BitsModK(md5Bits(concat(lit("cy:"), col("c_custkey"))), 10000000L))
            .as("y"))
        val supp = Tables.supplier(s, dir).select(col("s_suppkey").as("sid"),
          (md5BitsModK(md5Bits(concat(lit("sx:"), col("s_suppkey"))), 10000000L))
            .as("sx"),
          (md5BitsModK(md5Bits(concat(lit("sy:"), col("s_suppkey"))), 10000000L))
            .as("sy"))
        val custCells = cust.select(col("cid"), col("x"), col("y"),
          expr(s"x div $r").as("cx"), expr(s"y div $r").as("cy"))
        // suppliers replicate into their 3x3 neighborhood (supplier side
        // is the smaller: 9x replication of the small side, not the big)
        val offsets = Seq(-1L, 0L, 1L)
        val suppCells = supp.select(col("sid"), col("sx"), col("sy"),
            explode(array(offsets.flatMap(dx => offsets.map(dy =>
              struct((expr(s"sx div $r") + dx).as("cx"),
                (expr(s"sy div $r") + dy).as("cy")))): _*)).as("cell"))
          .select(col("sid"), col("sx"), col("sy"),
            col("cell.cx").as("cx"), col("cell.cy").as("cy"))
        val pairs = custCells.join(suppCells, Seq("cx", "cy"))
          .where((col("x") - col("sx")) * (col("x") - col("sx")) +
            (col("y") - col("sy")) * (col("y") - col("sy")) <= lit(r * r))
        pairs.agg(count(lit(1)).as("n_pairs"),
            countDistinct(col("cid")).as("n_customers_matched"),
            countDistinct(col("sid")).as("n_suppliers_matched"),
            sum(col("cid") * col("sid")).as("pair_checksum"))
          .orderBy(col("n_pairs"))
      },
      Some(s"""
        WITH cust AS (
          SELECT c_custkey AS cid,
                 CAST(md5_number_lower('cx:' || c_custkey) % 10000000 AS BIGINT) AS x,
                 CAST(md5_number_lower('cy:' || c_custkey) % 10000000 AS BIGINT) AS y
          FROM customer),
        supp AS (
          SELECT s_suppkey AS sid,
                 CAST(md5_number_lower('sx:' || s_suppkey) % 10000000 AS BIGINT) AS sx,
                 CAST(md5_number_lower('sy:' || s_suppkey) % 10000000 AS BIGINT) AS sy
          FROM supplier),
        pairs AS (
          SELECT c.cid, s.sid
          FROM cust c JOIN supp s
            ON (c.x // 200000) BETWEEN (s.sx // 200000) - 1 AND (s.sx // 200000) + 1
           AND (c.y // 200000) BETWEEN (s.sy // 200000) - 1 AND (s.sy // 200000) + 1
           AND (c.x - s.sx) * (c.x - s.sx) + (c.y - s.sy) * (c.y - s.sy)
               <= ${200000L * 200000L})
        SELECT COUNT(*) AS n_pairs,
               COUNT(DISTINCT cid) AS n_customers_matched,
               COUNT(DISTINCT sid) AS n_suppliers_matched,
               CAST(SUM(cid * sid) AS BIGINT) AS pair_checksum
        FROM pairs
        ORDER BY n_pairs""")),

    // Conformed activity feed (the "activity schema" pattern): two
    // heterogeneous sources — order headers and purchase events — conform
    // to ONE (entity, id, occurred_at, amount) schema and union into a
    // single customer timeline; the rollup reads per (entity, month)
    // with exact decimal amounts. Conforming is pure projection per leg
    // (zero shuffles until the rollup); at 100 TB each source keeps its
    // own partitioning and the union is metadata-only.
    QueryDef(
      "q150_activity_feed",
      (s, dir) => {
        val orders = Tables.orders(s, dir).select(
          lit("order").as("entity"), col("o_orderkey").as("id"),
          col("o_custkey").as("customer_id"),
          col("o_orderdate").as("occurred_at"),
          dec6(col("o_totalprice")).as("amount"))
        val purchases = Tables.events(s, dir)
          .where(col("event_type") === "purchase")
          .select(lit("event").as("entity"), col("event_id").as("id"),
            col("user_id").as("customer_id"), col("ts").as("occurred_at"),
            dec6(col("value")).as("amount"))
        orders.unionByName(purchases)
          .groupBy(col("entity"),
            trunc(to_date(col("occurred_at")), "month").as("month_start"))
          .agg(count(lit(1)).as("n_activities"),
            countDistinct(col("customer_id")).as("n_customers"),
            moneyOut(sum(col("amount"))).as("amount_sum"))
          .orderBy(col("entity"), col("month_start"))
      },
      Some("""
        WITH feed AS (
          SELECT 'order' AS entity, o_custkey AS customer_id,
                 CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS DATE)
                   AS month_start,
                 CAST(o_totalprice AS DECIMAL(18,6)) AS amount
          FROM orders
          UNION ALL
          SELECT 'event', user_id,
                 CAST(date_trunc('month', CAST(ts AS DATE)) AS DATE),
                 CAST(value AS DECIMAL(18,6))
          FROM events WHERE event_type = 'purchase')
        SELECT entity, month_start, COUNT(*) AS n_activities,
               COUNT(DISTINCT customer_id) AS n_customers,
               CAST(CAST(SUM(amount) AS DECIMAL(38,6)) AS DOUBLE) AS amount_sum
        FROM feed
        GROUP BY 1, 2
        ORDER BY 1, 2""")),

    // Fellegi-Sunter record-linkage scoring — the probabilistic step the
    // q106/q170/q193 blocking stack feeds: every blocked candidate pair
    // gets an agreement vector and a total match weight (fixed integer
    // log-odds-style weights, stated in config — the m/u estimation step
    // is offline), then link / possible / non-link classification at the
    // standard two thresholds. Blocking key (nation, segment, acctbal
    // kilodollar band) bounds candidates to Σ|block|² with the band width
    // as the knob — never customers²; comparators are pure integer
    // algebra (name-suffix distance, balance-cents distance). Output is
    // the per-class audit frame with an exact pair checksum so both
    // engines must classify EXACTLY the same pairs.
    QueryDef(
      "q208_linkage_scoring",
      (s, dir) => {
        val c = Tables.customer(s, dir).select(
          col("c_custkey").as("ck"),
          col("c_nationkey").as("nk"), col("c_mktsegment").as("seg"),
          floor(col("c_acctbal") / 1000.0).cast("long").as("band"),
          substring(col("c_name"), 10, 9).cast("long").as("sfx"),
          (col("c_acctbal").cast(DecimalType(18, 2)) * 100).cast("long").as("cents"))
        val a = c.toDF("ck_a", "nk", "seg", "band", "sfx_a", "cents_a")
        val b = c.toDF("ck_b", "nk", "seg", "band", "sfx_b", "cents_b")
        val pairs = a.join(b, Seq("nk", "seg", "band"))
          .where(col("ck_a") < col("ck_b"))
        val scored = pairs.select(col("ck_a"), col("ck_b"),
          (when(abs(col("sfx_a") - col("sfx_b")) <= 5L, 24L).otherwise(-8L) +
            when(abs(col("cents_a") - col("cents_b")) <= 20000L, 16L).otherwise(-6L))
            .as("weight"))
        scored
          .select(col("ck_a"), col("ck_b"), col("weight"),
            when(col("weight") >= 30L, "link")
              .when(col("weight") >= 0L, "possible")
              .otherwise("non_link").as("cls"))
          .groupBy(col("cls"))
          .agg(count(lit(1)).as("n_pairs"),
            sum(col("weight")).as("weight_sum"),
            sum(col("ck_a") * 31L + col("ck_b")).as("pair_checksum"))
          .orderBy(col("cls"))
      },
      Some("""
        WITH r AS (
          SELECT c_custkey AS ck, c_nationkey AS nk, c_mktsegment AS seg,
                 CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS band,
                 CAST(substring(c_name, 10, 9) AS BIGINT) AS sfx,
                 CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
          FROM customer),
        pairs AS (
          SELECT a.ck AS ck_a, b.ck AS ck_b,
                 (CASE WHEN abs(a.sfx - b.sfx) <= 5 THEN 24 ELSE -8 END
                  + CASE WHEN abs(a.cents - b.cents) <= 20000 THEN 16 ELSE -6 END)
                   AS weight
          FROM r a JOIN r b
            ON a.nk = b.nk AND a.seg = b.seg AND a.band = b.band
           AND a.ck < b.ck)
        SELECT CASE WHEN weight >= 30 THEN 'link'
                    WHEN weight >= 0 THEN 'possible'
                    ELSE 'non_link' END AS cls,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(SUM(weight) AS BIGINT) AS weight_sum,
               CAST(SUM(ck_a * 31 + ck_b) AS BIGINT) AS pair_checksum
        FROM pairs
        GROUP BY 1
        ORDER BY 1""")),

    // Fellegi-Sunter probabilistic linkage with FREQUENCY-BASED
    // u-probabilities — the principled upgrade of q208's hand-set
    // weights: for each equality field, u = P(agree | random pair) has
    // the exact closed form Σ_v f_v(f_v−1) / N(N−1) over the field's
    // value frequencies, estimated from the data itself in one partial
    // aggregate per field and floored to exact ppm (m stays a rule
    // constant — estimating m needs labeled matches or EM). A pair's
    // match odds are then the EXACT RATIONAL product
    // Π (agree ? m : 1e6−m) / Π (agree ? u : 1e6−u) carried as two
    // DECIMAL(38,0) integer products (3 ppm factors ≤ 1e18 — no log, no
    // float, no engine drift), classified by cross-multiplied odds
    // thresholds: match > 64:1, non-match < 1:8.
    //
    // Scale: u estimation is three frequency aggregates (field-value
    // sized); candidates come from (nation, 512-cent band) equality
    // blocking — never all-pairs; the three u scalars ride one broadcast
    // row onto the pair stream.
    QueryDef(
      "q263_fellegi_sunter",
      (s, dir) => {
        val c = Tables.customer(s, dir).select(
          col("c_custkey").as("ck"),
          col("c_nationkey").cast("long").as("nation"),
          col("c_mktsegment").as("seg"),
          (col("c_acctbal").cast(DecimalType(18, 2)) * 100).cast("long").as("cents"),
          (expr("CAST(substring(c_name, 10, 9) AS BIGINT)") % 97).as("sfx"))
          .withColumn("balb", expr("(cents + 100000) div 2000"))
          .withColumn("blk", expr("(cents + 100000) div 512"))
        def uPpm(field: String, alias: String) =
          c.groupBy(col(field)).agg(count(lit(1)).as("f"))
            // DECIMAL(38,0): Σf(f−1)·1e6 passes BIGINT at ~1e9 rows
            .agg(sum(expr("CAST(f AS DECIMAL(38,0)) * (f - 1)")).as("num"),
              sum(col("f")).as("n"))
            .select(expr(
              "CAST((CAST(1000000 AS DECIMAL(38,0)) * num) div (CAST(n AS DECIMAL(38,0)) * (n - 1)) AS BIGINT)")
              .as(alias))
        val u = uPpm("seg", "u_seg")
          .crossJoin(uPpm("balb", "u_bal"))
          .crossJoin(uPpm("sfx", "u_sfx"))
        val a = c.select(col("nation"), col("blk"), col("ck").as("ck_a"),
          col("seg").as("seg_a"), col("balb").as("balb_a"), col("sfx").as("sfx_a"))
        val b = c.select(col("nation"), col("blk"), col("ck").as("ck_b"),
          col("seg").as("seg_b"), col("balb").as("balb_b"), col("sfx").as("sfx_b"))
        val pairs = a.join(b, Seq("nation", "blk"))
          .where(col("ck_a") < col("ck_b"))
          .crossJoin(broadcast(u))
          .withColumn("num", expr(
            """CAST(CASE WHEN seg_a = seg_b THEN 950000 ELSE 50000 END AS DECIMAL(38,0))
               * CASE WHEN balb_a = balb_b THEN 900000 ELSE 100000 END
               * CASE WHEN sfx_a = sfx_b THEN 980000 ELSE 20000 END"""))
          .withColumn("den", expr(
            """CAST(CASE WHEN seg_a = seg_b THEN u_seg ELSE 1000000 - u_seg END AS DECIMAL(38,0))
               * CASE WHEN balb_a = balb_b THEN u_bal ELSE 1000000 - u_bal END
               * CASE WHEN sfx_a = sfx_b THEN u_sfx ELSE 1000000 - u_sfx END"""))
          .withColumn("cls",
            when(col("num") > col("den") * 64, "match")
              .when(col("num") * 8 < col("den"), "non_match")
              .otherwise("possible"))
        pairs.groupBy(col("nation"))
          .agg(count(lit(1)).as("n_pairs"),
            sum(when(col("cls") === "match", 1L).otherwise(0L)).as("n_match"),
            sum(when(col("cls") === "possible", 1L).otherwise(0L)).as("n_possible"),
            sum(when(col("cls") === "match", col("ck_a") * 100000L + col("ck_b"))
              .otherwise(0L)).as("match_checksum"))
          .orderBy(col("nation"))
      },
      Some("""
        WITH c AS (
          SELECT c_custkey AS ck, CAST(c_nationkey AS BIGINT) AS nation,
                 c_mktsegment AS seg,
                 CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
                 CAST(substring(c_name, 10, 9) AS BIGINT) % 97 AS sfx
          FROM customer),
        c2 AS (
          SELECT *, (cents + 100000) // 2000 AS balb,
                 (cents + 100000) // 512 AS blk
          FROM c),
        u_seg_t AS (
          SELECT CAST((1000000 * SUM(CAST(f AS HUGEINT) * (f - 1)))
                 // (CAST(SUM(f) AS HUGEINT) * (SUM(f) - 1)) AS BIGINT) AS u_seg
          FROM (SELECT COUNT(*) AS f FROM c2 GROUP BY seg)),
        u_bal_t AS (
          SELECT CAST((1000000 * SUM(CAST(f AS HUGEINT) * (f - 1)))
                 // (CAST(SUM(f) AS HUGEINT) * (SUM(f) - 1)) AS BIGINT) AS u_bal
          FROM (SELECT COUNT(*) AS f FROM c2 GROUP BY balb)),
        u_sfx_t AS (
          SELECT CAST((1000000 * SUM(CAST(f AS HUGEINT) * (f - 1)))
                 // (CAST(SUM(f) AS HUGEINT) * (SUM(f) - 1)) AS BIGINT) AS u_sfx
          FROM (SELECT COUNT(*) AS f FROM c2 GROUP BY sfx)),
        pairs AS (
          SELECT a.nation, a.ck AS ck_a, b.ck AS ck_b,
                 CAST(CASE WHEN a.seg = b.seg THEN 950000 ELSE 50000 END AS HUGEINT)
                   * CASE WHEN a.balb = b.balb THEN 900000 ELSE 100000 END
                   * CASE WHEN a.sfx = b.sfx THEN 980000 ELSE 20000 END AS num,
                 CAST(CASE WHEN a.seg = b.seg THEN u.u_seg
                           ELSE 1000000 - u.u_seg END AS HUGEINT)
                   * CASE WHEN a.balb = b.balb THEN u.u_bal
                          ELSE 1000000 - u.u_bal END
                   * CASE WHEN a.sfx = b.sfx THEN u.u_sfx
                          ELSE 1000000 - u.u_sfx END AS den
          FROM c2 a
          JOIN c2 b ON a.nation = b.nation AND a.blk = b.blk AND a.ck < b.ck
          CROSS JOIN (SELECT * FROM u_seg_t, u_bal_t, u_sfx_t) u),
        cls AS (
          SELECT nation, ck_a, ck_b,
                 CASE WHEN num > den * 64 THEN 'match'
                      WHEN num * 8 < den THEN 'non_match'
                      ELSE 'possible' END AS cls
          FROM pairs)
        SELECT nation,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(SUM(CASE WHEN cls = 'match' THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_match,
               CAST(SUM(CASE WHEN cls = 'possible' THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_possible,
               CAST(SUM(CASE WHEN cls = 'match' THEN ck_a * 100000 + ck_b
                        ELSE 0 END) AS BIGINT) AS match_checksum
        FROM cls
        GROUP BY nation
        ORDER BY nation""")),

    // Positional deletion-neighborhood join (the fixed-length
    // specialization of FastSS, Bocek et al. 2007) — the EXACT-complete
    // one-typo detector, a different technique from the MinHash/SimHash/
    // n-gram sketch family. For EQUAL-LENGTH strings, edit distance 1 is
    // exactly one substitution (Hamming 1), and two 9-digit keys differ
    // at exactly position p iff their position-p deletion variants are
    // equal — so joining variants keyed on (POSITION, variant) yields
    // every one-typo pair EXACTLY ONCE with ZERO false candidates: no
    // distinct, no cross-position duplication, no quadratic verify (the
    // plain FastSS variant-only join re-finds a pair through every
    // equal-digit run and drowns in Σbucket² duplicates — measured 10×
    // slower at sf1). The levenshtein predicate stays as a belt-and-
    // braces verify (standard DP, integer parity on both engines); the
    // differing position falls out of the join key.
    //
    // Scale: variants are 9n rows equi-joined on (i, 8-digit prefix) —
    // near-unit buckets, output proportional to the true pair count;
    // aggregation is one partial agg to 9 rows.
    QueryDef(
      "q266_deletion_neighborhood",
      (s, dir) => {
        val c = Tables.customer(s, dir).select(
          col("c_custkey").as("ck"),
          expr("substr(c_name, 10, 9)").as("n9"))
        val vars = c
          .withColumn("i", explode(expr("sequence(1, 9)")))
          .select(col("ck"), col("n9"), col("i"),
            expr("concat(substr(n9, 1, i - 1), substr(n9, i + 1))").as("v"))
        val pairs = vars.select(col("i"), col("v"), col("ck").as("ck_a"),
            col("n9").as("na"))
          .join(vars.select(col("i"), col("v"), col("ck").as("ck_b"),
            col("n9").as("nb")), Seq("i", "v"))
          .where(col("ck_a") < col("ck_b"))
        pairs.where(levenshtein(col("na"), col("nb")) <= 1)
          .select(col("i").cast("long").as("pos"), col("ck_a"), col("ck_b"))
          .groupBy(col("pos"))
          .agg(count(lit(1)).as("n_pairs"),
            sum(col("ck_a") * 100000L + col("ck_b")).as("pair_checksum"))
          .orderBy(col("pos"))
      },
      Some("""
        WITH c AS (
          SELECT c_custkey AS ck, substr(c_name, 10, 9) AS n9 FROM customer),
        vars AS (
          SELECT ck, n9, i,
                 concat(substr(n9, 1, i - 1), substr(n9, i + 1)) AS v
          FROM c CROSS JOIN (SELECT unnest(range(1, 10)) AS i) p),
        pairs AS (
          SELECT a.i AS pos, a.ck AS ck_a, b.ck AS ck_b, a.n9 AS na, b.n9 AS nb
          FROM vars a JOIN vars b
            ON a.i = b.i AND a.v = b.v AND a.ck < b.ck)
        SELECT CAST(pos AS BIGINT) AS pos,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(SUM(ck_a * 100000 + ck_b) AS BIGINT) AS pair_checksum
        FROM pairs
        WHERE levenshtein(na, nb) <= 1
        GROUP BY pos
        ORDER BY pos""")))
}
