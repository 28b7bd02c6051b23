package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextKernels.tokens
import graft.operators.TextDedup
import graft.sources.Tables

/** Round-5 batch — engine-infrastructure analytics: the exact
  * set-similarity join (the completeness-guaranteed counterpart of the
  * q27/q29 LSH path), the SQL-standard regression-aggregate family
  * (REGR_SLOPE/REGR_INTERCEPT/CORR/R²) computed from exact integer
  * moments, and optimizer statistics collection (ANALYZE: equi-depth
  * histogram + most-common values + NDV) — the stats a cost-based
  * optimizer needs before it can plan any of the other 160 queries well.
  */
object StatsQueries {

  val defs: Seq[QueryDef] = Seq(

    // Exact set-similarity self-join via AllPairs prefix filtering
    // (Bayardo et al., WWW'07) — the deterministic-complete counterpart
    // of q27/q29's MinHash-LSH: NO false negatives, so it's the gate the
    // probabilistic path is audited against. Token universe = 3-token
    // shingle sets. Order every doc's shingles rarest-first (global
    // frequency, shingle tiebreak); a pair with Jaccard >= 3/5 MUST
    // share a shingle inside both docs' prefixes of length
    // m - ceil(3m/5) + 1 (if the intersection avoided a prefix it would
    // fit inside a suffix smaller than tau*m <= |intersection|), and must
    // satisfy the length filter 5*min(ma,mb) >= 3*max(ma,mb). Exact
    // Jaccard is then computed ONLY for surviving candidates.
    //
    // Scale: the self-join is on PREFIX shingles only — frequent shingles
    // (the quadratic-blowup risk) sort to the ends of the rankings and
    // out of the prefixes, so candidate cost is Sum(rare-shingle
    // bucket^2), not docs^2; the verify join fans each candidate pair by
    // one doc's shingle set — proportional to candidates, not corpus.
    // All integer arithmetic (ceil(3m/5) = (3m+4) div 5); the only
    // double is the final one-division Jaccard, identical IEEE on both
    // engines.
    QueryDef(
      "q167_prefix_filter_join",
      (s, dir) => {
        val d = Tables.documents(s, dir)
        val sh = TextDedup.shingleRows(
          d.select(col("doc_id"), tokens(col("text")).as("ws")),
          "doc_id", "ws", 3).distinct()
        val freq = sh.groupBy(col("_sh")).agg(count(lit(1)).as("c"))
        val perDoc = Window.partitionBy(col("doc_id"))
        val byRarity = perDoc.orderBy(col("c"), col("_sh"))
        val ranked = sh.join(freq, "_sh")
          .withColumn("rnk", row_number().over(byRarity).cast("long"))
          .withColumn("m", count(lit(1)).over(perDoc))
        val pfx = ranked
          .where(col("rnk") <= col("m") - expr("(3*m + 4) div 5") + lit(1L))
          .select(col("doc_id"), col("_sh"), col("m"))
        val cand = pfx.select(col("doc_id").as("id_a"), col("_sh"), col("m").as("ma"))
          .join(pfx.select(col("doc_id").as("id_b"), col("_sh"), col("m").as("mb")), "_sh")
          .where(col("id_a") < col("id_b") &&
            col("ma") * 5 >= col("mb") * 3 && col("mb") * 5 >= col("ma") * 3)
          .select(col("id_a"), col("id_b"), col("ma"), col("mb"))
          .distinct()
        val inter = cand
          .join(sh.select(col("doc_id").as("id_a"), col("_sh")), Seq("id_a"))
          .join(sh.select(col("doc_id").as("id_b"), col("_sh")), Seq("id_b", "_sh"))
          .groupBy(col("id_a"), col("id_b"), col("ma"), col("mb"))
          .agg(count(lit(1)).as("inter"))
        inter
          .withColumn("jaccard",
            col("inter").cast("double") /
              (col("ma") + col("mb") - col("inter")).cast("double"))
          .where(col("jaccard") >= lit(0.6d))
          .select(col("id_a"), col("id_b"), col("ma").as("size_a"),
            col("mb").as("size_b"), col("inter"), col("jaccard"))
          .orderBy(col("id_a"), col("id_b"))
      },
      Some("""
        WITH toks AS (SELECT doc_id, string_split(text, ' ') ws FROM documents),
        sh AS (
          SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(ws)-1),
                   i -> ws[i]||' '||ws[i+1]||' '||ws[i+2]))) AS tk
          FROM toks),
        freq AS (SELECT tk, COUNT(*) c FROM sh GROUP BY 1),
        ranked AS (
          SELECT s.doc_id, s.tk,
                 row_number() OVER (PARTITION BY s.doc_id ORDER BY f.c, s.tk) rnk,
                 COUNT(*) OVER (PARTITION BY s.doc_id) m
          FROM sh s JOIN freq f USING (tk)),
        pfx AS (SELECT doc_id, tk, m FROM ranked WHERE rnk <= m - (3*m + 4)//5 + 1),
        cand AS (
          SELECT DISTINCT a.doc_id id_a, b.doc_id id_b, a.m ma, b.m mb
          FROM pfx a JOIN pfx b ON a.tk = b.tk AND a.doc_id < b.doc_id
          WHERE a.m * 5 >= b.m * 3 AND b.m * 5 >= a.m * 3),
        inter AS (
          SELECT c.id_a, c.id_b, c.ma, c.mb, COUNT(*) i
          FROM cand c
          JOIN sh x ON x.doc_id = c.id_a
          JOIN sh y ON y.doc_id = c.id_b AND y.tk = x.tk
          GROUP BY 1, 2, 3, 4)
        SELECT id_a, id_b, CAST(ma AS BIGINT) AS size_a, CAST(mb AS BIGINT) AS size_b,
               CAST(i AS BIGINT) AS inter,
               CAST(i AS DOUBLE) / CAST(ma + mb - i AS DOUBLE) AS jaccard
        FROM inter
        WHERE CAST(i AS DOUBLE) / CAST(ma + mb - i AS DOUBLE) >= 0.6
        ORDER BY id_a, id_b""")),

    // SQL-standard regression-aggregate family — REGR_SLOPE, REGR_
    // INTERCEPT, CORR, R² of order value against order date, per market
    // segment. NOT the engines' built-in regr_*/corr (their internal
    // accumulation orders differ, so raw doubles would never hash-match):
    // both sides reduce to the five EXACT integer moments
    // (n, Σx, Σy, Σxy, Σx², Σy²) first — x = days since 1992-01-01
    // (≤ ~2500), y = order cents — and only then run the identical
    // closed-form IEEE sequence. Σxy ≈ 10¹⁶ at sf1 fits BIGINT; Σy²
    // reaches ~10²⁰, so exactly that one moment goes through the wide
    // path (Spark DECIMAL(38,0) sum / DuckDB HUGEINT) before the one
    // exact-int→double conversion. sqrt is correctly-rounded IEEE on
    // both engines, so corr/r2 are bit-stable.
    //
    // Scale: a 5-group aggregate of per-row integer products — one
    // partial-agg shuffle of five moment columns; the dim join is a
    // broadcast. The closed form is why the moments (not the rows) are
    // what a 1000-executor cluster ships: 6 longs per group per
    // partition.
    QueryDef(
      "q168_regr_ols",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val c = Tables.customer(s, dir)
          .select(col("c_custkey"), col("c_mktsegment").as("segment"))
        val xy = o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .select(col("segment"),
            datediff(to_date(col("o_orderdate")), lit("1992-01-01").cast("date"))
              .cast("long").as("x"),
            (col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(18, 6)) * 100)
              .cast("long").as("y"))
        val m = xy.groupBy(col("segment")).agg(
          count(lit(1)).as("n"),
          sum(col("x")).as("sx"),
          sum(col("y")).as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"),
          sum((col("y") * col("y"))
            .cast(org.apache.spark.sql.types.DecimalType(38, 0))).as("syy_d"))
        m.select(col("segment"), col("n"),
            col("n").cast("double").as("nd"),
            col("sx").cast("double").as("sxd"),
            col("sy").cast("double").as("syd"),
            col("sxy").cast("double").as("sxyd"),
            col("sxx").cast("double").as("sxxd"),
            col("syy_d").cast("double").as("syyd"))
          .select(col("segment"), col("n"),
            ((col("nd") * col("sxyd") - col("sxd") * col("syd")) /
              (col("nd") * col("sxxd") - col("sxd") * col("sxd"))).as("slope"),
            col("nd"), col("sxd"), col("syd"), col("sxyd"), col("sxxd"), col("syyd"))
          .select(col("segment"), col("n"), col("slope"),
            ((col("syd") - col("slope") * col("sxd")) / col("nd")).as("intercept"),
            ((col("nd") * col("sxyd") - col("sxd") * col("syd")) /
              sqrt((col("nd") * col("sxxd") - col("sxd") * col("sxd")) *
                (col("nd") * col("syyd") - col("syd") * col("syd")))).as("corr_xy"))
          .withColumn("r2", col("corr_xy") * col("corr_xy"))
          .orderBy(col("segment"))
      },
      Some("""
        WITH xy AS (
          SELECT c.c_mktsegment AS segment,
                 CAST(date_diff('day', DATE '1992-01-01', CAST(o.o_orderdate AS DATE)) AS BIGINT) AS x,
                 CAST(CAST(o.o_totalprice AS DECIMAL(18,6)) * 100 AS BIGINT) AS y
          FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
        m AS (
          SELECT segment,
                 CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(CAST(COUNT(*) AS BIGINT) AS DOUBLE) AS nd,
                 CAST(CAST(SUM(x) AS BIGINT) AS DOUBLE) AS sxd,
                 CAST(CAST(SUM(y) AS BIGINT) AS DOUBLE) AS syd,
                 CAST(CAST(SUM(x*y) AS BIGINT) AS DOUBLE) AS sxyd,
                 CAST(CAST(SUM(x*x) AS BIGINT) AS DOUBLE) AS sxxd,
                 CAST(SUM(CAST(y AS HUGEINT) * y) AS DOUBLE) AS syyd
          FROM xy GROUP BY 1),
        s AS (
          SELECT segment, n,
                 (nd*sxyd - sxd*syd) / (nd*sxxd - sxd*sxd) AS slope,
                 nd, sxd, syd, sxyd, sxxd, syyd
          FROM m),
        f AS (
          SELECT segment, n, slope,
                 (syd - slope*sxd) / nd AS intercept,
                 (nd*sxyd - sxd*syd) /
                   sqrt((nd*sxxd - sxd*sxd) * (nd*syyd - syd*syd)) AS corr_xy
          FROM s)
        SELECT segment, n, slope, intercept, corr_xy, corr_xy*corr_xy AS r2
        FROM f
        ORDER BY segment""")),

    // Optimizer statistics collection (ANALYZE TABLE): the three stats a
    // cost-based optimizer reads before planning — an 8-bin EQUI-DEPTH
    // histogram of order value (selectivity of range predicates), the
    // top-5 MOST-COMMON VALUES of order priority with their counts
    // (selectivity of equality on skewed columns), and table-level
    // row count / NDVs (join cardinality). Equi-depth bins come from
    // ntile(8) over a TOTAL order (cents, orderkey) — both engines place
    // the n mod 8 extra rows in the leading bins, so boundaries are
    // deterministic. One long-format frame: (stat_kind, k, v1, v2, v3).
    //
    // Scale: histogram via one window sort (at 100 TB you'd swap in
    // approx_percentile boundaries — same output contract); MCV + NDV
    // ride one partial aggregate each. The long format is what makes the
    // stats joinable by a planner rule at lookup time.
    QueryDef(
      "q169_analyze_stats",
      (s, dir) => {
        val o = Tables.orders(s, dir)
          .select(col("o_orderkey"),
            (col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(18, 6)) * 100)
              .cast("long").as("cents"),
            col("o_orderpriority").as("prio"),
            col("o_custkey"))
        val binned = o.withColumn("bin",
          ntile(8).over(Window.orderBy(col("cents"), col("o_orderkey"))).cast("long"))
        val hist = binned.groupBy(col("bin"))
          .agg(min(col("cents")).as("v1"), max(col("cents")).as("v2"),
            count(lit(1)).as("v3"))
          .select(lit("hist:o_totalprice_cents").as("stat_kind"),
            col("bin").cast("string").as("k"), col("v1"), col("v2"), col("v3"))
        val n = o.count() // tiny driver-side scalar: total row count for MCV shares
        val mcv = o.groupBy(col("prio")).agg(count(lit(1)).as("cnt"))
          .withColumn("rnk",
            row_number().over(Window.orderBy(col("cnt").desc, col("prio"))).cast("long"))
          .where(col("rnk") <= 5)
          .select(lit("mcv:o_orderpriority").as("stat_kind"), col("prio").as("k"),
            col("cnt").as("v1"), col("rnk").as("v2"), lit(n).as("v3"))
        val tbl = o.agg(count(lit(1)).as("v1"),
            countDistinct(col("o_custkey")).as("v2"),
            countDistinct(col("prio")).as("v3"))
          .select(lit("table:orders").as("stat_kind"), lit("ndv").as("k"),
            col("v1"), col("v2"), col("v3"))
        hist.unionByName(mcv).unionByName(tbl)
          .orderBy(col("stat_kind"), col("k"))
      },
      Some("""
        WITH o AS (
          SELECT o_orderkey,
                 CAST(CAST(o_totalprice AS DECIMAL(18,6)) * 100 AS BIGINT) AS cents,
                 o_orderpriority AS prio, o_custkey
          FROM orders),
        binned AS (
          SELECT *, CAST(ntile(8) OVER (ORDER BY cents, o_orderkey) AS BIGINT) AS bin
          FROM o),
        hist AS (
          SELECT 'hist:o_totalprice_cents' AS stat_kind, CAST(bin AS VARCHAR) AS k,
                 CAST(MIN(cents) AS BIGINT) AS v1, CAST(MAX(cents) AS BIGINT) AS v2,
                 CAST(COUNT(*) AS BIGINT) AS v3
          FROM binned GROUP BY 2),
        mcv AS (
          SELECT 'mcv:o_orderpriority' AS stat_kind, prio AS k,
                 CAST(cnt AS BIGINT) AS v1, CAST(rnk AS BIGINT) AS v2,
                 (SELECT CAST(COUNT(*) AS BIGINT) FROM o) AS v3
          FROM (SELECT prio, COUNT(*) cnt,
                       row_number() OVER (ORDER BY COUNT(*) DESC, prio) rnk
                FROM o GROUP BY 1)
          WHERE rnk <= 5),
        tbl AS (
          SELECT 'table:orders' AS stat_kind, 'ndv' AS k,
                 CAST(COUNT(*) AS BIGINT) AS v1,
                 CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS v2,
                 CAST(COUNT(DISTINCT prio) AS BIGINT) AS v3
          FROM o)
        SELECT * FROM hist UNION ALL SELECT * FROM mcv UNION ALL SELECT * FROM tbl
        ORDER BY stat_kind, k""")))
}
