package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextKernels.tokens
import graft.operators.TextDedup
import graft.sources.Tables
import graft.plans.CheckpointPolicy.DataFrameCutOps

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
    //
    // DF-CAP (the saturated-vocabulary guard): shingles with document
    // frequency > 64 leave the universe BEFORE any ranking or pair
    // generation — the standard stop-token guard every production
    // AllPairs implementation ships (a shingle in >64 docs identifies
    // nothing; it only manufactures candidates). The audited similarity
    // is exact Jaccard OVER THE SURVIVING (df <= 64) VOCABULARY, on both
    // engines identically, so the completeness guarantee on that mass is
    // unchanged. This bounds worst-case candidate volume at
    // types x 64^2 regardless of corpus size, and past vocabulary
    // saturation it prunes the ENTIRE head: the synthetic generator's
    // fixed 31-word vocabulary saturates (~29.8k shingle types) below
    // sf0.1, after which every df grows linearly and the UNCAPPED exact
    // join is output-bound quadratic (measured alpha 1.71, 331 s at sf1
    // — SCALE.md). Measured surviving candidate mass Sum(df^2) on the
    // gen_scale twins: 2.5e6 (sf0.1, nothing capped) -> 2.6e7 (sf0.33,
    // nothing capped — the true pair mass below the cap) -> 5.1e5 (sf1,
    // head gone). The cap must be ABSOLUTE: any corpus-relative
    // threshold stays proportional to df at saturation and prunes
    // nothing (a 256 cap measured exactly that — zero types dropped at
    // sf1).
    QueryDef(
      "q167_prefix_filter_join",
      (s, dir) => {
        val d = Tables.documents(s, dir)
        // The distinct shingle frame feeds FOUR consumers (frequency,
        // rarity ranking, both sides of the verify join) — materialize
        // it once via pin-neutral localCheckpoint (the q48/Pipeline
        // stance: lineage truncated, no cacheManager entry to leak; a
        // cluster deployment swaps in a reliable checkpoint dir). Every
        // JOIN below runs on the 8-byte md5 digest of the shingle, never
        // the ~20-byte string (the repo's digest-first join stance —
        // halves the bytes through the verify join's candidate×shingle
        // fan); only the rarity ORDER keeps the string, because the
        // oracle tiebreaks on it.
        import graft.functions.Kernels.md5Bits
        val sh = TextDedup.shingleRows(
          d.select(col("doc_id"), tokens(col("text")).as("ws")),
          "doc_id", "ws", 3).distinct()
          .withColumn("_h", md5Bits(col("_sh")))
          .cutLineage()
        val maxDf = 64L
        val freq = sh.groupBy(col("_sh")).agg(count(lit(1)).as("c"))
        // kept feeds THREE consumers (rarity ranking + both verify-join
        // sides) — same materialize-once stance as sh above.
        val kept = sh.join(freq.where(col("c") <= lit(maxDf)), "_sh")
          .cutLineage()
        val perDoc = Window.partitionBy(col("doc_id"))
        val byRarity = perDoc.orderBy(col("c"), col("_sh"))
        val ranked = kept
          .withColumn("rnk", row_number().over(byRarity).cast("long"))
          .withColumn("m", count(lit(1)).over(perDoc))
        // pfx likewise feeds both sides of the candidate self-join —
        // without the checkpoint the whole rank-window subtree (freq
        // aggregate + per-doc sort + two windows) runs twice.
        val pfx = ranked
          .where(col("rnk") <= col("m") - expr("(3*m + 4) div 5") + lit(1L))
          .select(col("doc_id"), col("_h"), col("m"))
          .cutLineage()
        val cand = pfx.select(col("doc_id").as("id_a"), col("_h"), col("m").as("ma"))
          .join(pfx.select(col("doc_id").as("id_b"), col("_h"), col("m").as("mb")), "_h")
          .where(col("id_a") < col("id_b") &&
            col("ma") * 5 >= col("mb") * 3 && col("mb") * 5 >= col("ma") * 3)
          .select(col("id_a"), col("id_b"), col("ma"), col("mb"))
          .distinct()
        val inter = cand
          .join(kept.select(col("doc_id").as("id_a"), col("_h")), Seq("id_a"))
          .join(kept.select(col("doc_id").as("id_b"), col("_h")), Seq("id_b", "_h"))
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
        kept AS (
          SELECT s.doc_id, s.tk, f.c
          FROM sh s JOIN freq f USING (tk) WHERE f.c <= 64),
        ranked AS (
          SELECT doc_id, tk,
                 row_number() OVER (PARTITION BY doc_id ORDER BY c, tk) rnk,
                 COUNT(*) OVER (PARTITION BY doc_id) m
          FROM kept),
        pfx AS (SELECT doc_id, tk, m FROM ranked WHERE rnk <= m - (3*m + 4)//5 + 1),
        cand AS (
          SELECT DISTINCT a.doc_id id_a, b.doc_id id_b, a.m ma, b.m mb
          FROM pfx a JOIN pfx b ON a.tk = b.tk AND a.doc_id < b.doc_id
          WHERE a.m * 5 >= b.m * 3 AND b.m * 5 >= a.m * 3),
        inter AS (
          SELECT c.id_a, c.id_b, c.ma, c.mb, COUNT(*) i
          FROM cand c
          JOIN kept x ON x.doc_id = c.id_a
          JOIN kept y ON y.doc_id = c.id_b AND y.tk = x.tk
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
    // Scale: the ntile is NOT a global window sort — the exact rank comes
    // from GlobalRank's two-level bucketed scheme (per-bucket offsets on
    // a ~900-row `cents div 65536` table, within-bucket windows) and the
    // tile index is reconstructed arithmetically from (rank, n). The MCV
    // denominator n rides a broadcast one-row aggregate (no eager
    // driver-side count); MCV + NDV ride one partial aggregate each; the
    // MCV rank window orders the 5-value priority domain. The long
    // format is what makes the stats joinable by a planner rule.
    QueryDef(
      "q169_analyze_stats",
      (s, dir) => {
        import graft.operators.GlobalRank
        val o = Tables.orders(s, dir)
          .select(col("o_orderkey"),
            (col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(18, 6)) * 100)
              .cast("long").as("cents"),
            col("o_orderpriority").as("prio"),
            col("o_custkey"))
        val tot = o.groupBy().agg(count(lit(1)).as("n_rows"))
        val ranked = GlobalRank.withGlobalRank(
          o, "rn", expr("cents div 65536"), col("cents"), col("o_orderkey"))
        val binned = ranked.crossJoin(broadcast(tot))
          .withColumn("bin",
            GlobalRank.ntileFromRank(col("rn"), col("n_rows"), 8).cast("long"))
        val hist = binned.groupBy(col("bin"))
          .agg(min(col("cents")).as("v1"), max(col("cents")).as("v2"),
            count(lit(1)).as("v3"))
          .select(lit("hist:o_totalprice_cents").as("stat_kind"),
            col("bin").cast("string").as("k"), col("v1"), col("v2"), col("v3"))
        val mcv = o.groupBy(col("prio")).agg(count(lit(1)).as("cnt"))
          .withColumn("rnk",
            row_number().over(Window.orderBy(col("cnt").desc, col("prio"))).cast("long"))
          .where(col("rnk") <= 5)
          .crossJoin(broadcast(tot))
          .select(lit("mcv:o_orderpriority").as("stat_kind"), col("prio").as("k"),
            col("cnt").as("v1"), col("rnk").as("v2"), col("n_rows").as("v3"))
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
        ORDER BY stat_kind, k""")),

    // Sorted-neighborhood entity-resolution blocking (Hernandez-Stolfo):
    // the sliding-window complement of q106's equality blocking — sort
    // all records by a composite key (nation, balance cents, custkey:
    // a TOTAL order), then compare each record only to its w=3 sorted
    // successors. Near-duplicates with small key perturbations land
    // adjacent in the sort even when their equality-block keys differ.
    // Match rule: same nation and balances within 500 cents.
    //
    // Scale: window adjacency is re-expressed as an EQUI-join on
    // rank + offset (offsets exploded 1..3) — no O(n²) pass, no range
    // join; cost is exactly 3n candidate rows. The sort rank itself is
    // the distributed sorted-neighborhood construction: GlobalRank's
    // bucketed two-level scheme on `struct(nation, cents div 2048)`
    // (a monotone coarsening of the (nation, cents, ck) total order),
    // so no row ever transits a single-partition global window, and the
    // rank+offset join plays the role of the w-row boundary overlap.
    QueryDef(
      "q170_sorted_neighborhood",
      (s, dir) => {
        import graft.operators.GlobalRank
        val c = Tables.customer(s, dir).select(
          col("c_custkey").as("ck"),
          col("c_nationkey").cast("long").as("nation"),
          (col("c_acctbal").cast(org.apache.spark.sql.types.DecimalType(18, 6)) * 100)
            .cast("long").as("cents"))
        val r = GlobalRank.withGlobalRank(
          c, "rn", struct(col("nation"), expr("cents div 2048")),
          col("nation"), col("cents"), col("ck"))
        val probes = r.withColumn("off", explode(array(lit(1L), lit(2L), lit(3L))))
          .select(col("ck").as("ck_a"), col("nation").as("nation_a"),
            col("cents").as("cents_a"), (col("rn") + col("off")).as("rn_b"))
        val pairs = probes.join(
          r.select(col("ck").as("ck_b"), col("nation").as("nation_b"),
            col("cents").as("cents_b"), col("rn").as("rn_b")), "rn_b")
        val matched = pairs.withColumn("is_match",
          col("nation_a") === col("nation_b") &&
            abs(col("cents_a") - col("cents_b")) <= lit(500L))
        matched.groupBy(col("nation_a").as("nation"))
          .agg(count(lit(1)).as("n_candidates"),
            sum(when(col("is_match"), 1L).otherwise(0L)).as("n_matches"),
            sum(when(col("is_match"), col("ck_a") * 100000L + col("ck_b"))
              .otherwise(0L)).as("match_checksum"))
          .orderBy(col("nation"))
      },
      Some("""
        WITH c AS (
          SELECT c_custkey AS ck, CAST(c_nationkey AS BIGINT) AS nation,
                 CAST(CAST(c_acctbal AS DECIMAL(18,6)) * 100 AS BIGINT) AS cents
          FROM customer),
        r AS (
          SELECT *, CAST(row_number() OVER (ORDER BY nation, cents, ck) AS BIGINT) AS rn
          FROM c),
        probes AS (
          SELECT a.ck ck_a, a.nation nation_a, a.cents cents_a, a.rn + o.off AS rn_b
          FROM r a CROSS JOIN (SELECT unnest([1,2,3]) AS off) o),
        pairs AS (
          SELECT p.*, b.ck ck_b, b.nation nation_b, b.cents cents_b
          FROM probes p JOIN r b ON b.rn = p.rn_b),
        m AS (
          SELECT *, (nation_a = nation_b AND abs(cents_a - cents_b) <= 500) AS is_match
          FROM pairs)
        SELECT nation_a AS nation, CAST(COUNT(*) AS BIGINT) AS n_candidates,
               CAST(SUM(CASE WHEN is_match THEN 1 ELSE 0 END) AS BIGINT) AS n_matches,
               CAST(SUM(CASE WHEN is_match THEN ck_a * 100000 + ck_b ELSE 0 END) AS BIGINT)
                 AS match_checksum
        FROM m
        GROUP BY 1
        ORDER BY nation""")),

    // Count-min sketch heavy hitters — the mergeable frequency sketch
    // next to q100's HLL (distinct) and q46's KLL-style quantiles: d=4
    // hash rows × w=1024 counters, est(k) = min_i cms[i][h_i(k)]. The
    // deterministic CMS guarantee — estimate NEVER undercounts — is the
    // gate (`one_sided_ok` must be literal true for every exact-top-10
    // key); the overshoot column shows the collision error the min over
    // 4 rows leaves behind. Hashes are the DuckDB-parity md5 u64 family,
    // so both engines build bit-identical sketches.
    //
    // Scale: the sketch build is one partial-aggregated shuffle of
    // (row, bucket) pairs — 4 rows per input row map-side-combined into
    // ≤ 4×1024 counters per partition, merged by '+': the fixed-size
    // mergeable state is the whole point at 100 TB (2M-key exact counts
    // become 4096 counters); the probe side touches only the 10
    // candidate keys × 4 buckets.
    QueryDef(
      "q171_cms_heavy_hitters",
      (s, dir) => {
        import graft.functions.Kernels.{md5Bits, md5BitsModK}
        // 4 md5s per input row: fan the pruned scan out so the sketch
        // build uses every core (no-op on a well-split table).
        val li = graft.operators.Skew.fanOutRead(
          Tables.lineitem(s, dir).select(col("l_partkey")))
        def bucket(row: org.apache.spark.sql.Column, key: org.apache.spark.sql.Column) =
          md5BitsModK(md5Bits(concat(lit("cms"), row, lit(":"), key)), 1024L)
        val sketch = li
          .withColumn("row_i", explode(array(lit(0L), lit(1L), lit(2L), lit(3L))))
          .select(col("row_i"), bucket(col("row_i"), col("l_partkey")).as("bkt"))
          .groupBy(col("row_i"), col("bkt")).agg(count(lit(1)).as("cnt"))
        val truth = li.groupBy(col("l_partkey")).agg(count(lit(1)).as("true_cnt"))
        // Top-k as orderBy+limit, NOT a global rank window: Spark plans
        // this as TakeOrderedAndProject (per-partition heaps, driver
        // merge of k rows) — the same pattern as the q112 vocab cut.
        val top = truth.orderBy(col("true_cnt").desc, col("l_partkey")).limit(10)
        val est = top
          .withColumn("row_i", explode(array(lit(0L), lit(1L), lit(2L), lit(3L))))
          .select(col("l_partkey"), col("true_cnt"), col("row_i"),
            bucket(col("row_i"), col("l_partkey")).as("bkt"))
          .join(sketch, Seq("row_i", "bkt"))
          .groupBy(col("l_partkey"), col("true_cnt"))
          .agg(min(col("cnt")).as("est_cnt"))
        est.select(col("l_partkey"), col("true_cnt"), col("est_cnt"),
            (col("est_cnt") >= col("true_cnt")).as("one_sided_ok"),
            (col("est_cnt") - col("true_cnt")).as("overshoot"))
          .orderBy(col("true_cnt").desc, col("l_partkey"))
      },
      Some("""
        WITH li AS (SELECT l_partkey FROM lineitem),
        rows4 AS (SELECT unnest(range(0, 4)) AS row_i),
        sketch AS (
          SELECT row_i,
                 CAST(md5_number_lower('cms' || row_i || ':' || l_partkey) % 1024 AS BIGINT) AS bkt,
                 COUNT(*) AS cnt
          FROM li CROSS JOIN rows4
          GROUP BY 1, 2),
        truth AS (SELECT l_partkey, COUNT(*) AS true_cnt FROM li GROUP BY 1),
        top AS (
          SELECT l_partkey, true_cnt
          FROM (SELECT *, row_number() OVER (ORDER BY true_cnt DESC, l_partkey) rnk
                FROM truth)
          WHERE rnk <= 10),
        est AS (
          SELECT t.l_partkey, t.true_cnt, MIN(s.cnt) AS est_cnt
          FROM top t CROSS JOIN rows4 r
          JOIN sketch s ON s.row_i = r.row_i
               AND s.bkt = CAST(md5_number_lower('cms' || r.row_i || ':' || t.l_partkey) % 1024 AS BIGINT)
          GROUP BY 1, 2)
        SELECT l_partkey, CAST(true_cnt AS BIGINT) AS true_cnt,
               CAST(est_cnt AS BIGINT) AS est_cnt,
               est_cnt >= true_cnt AS one_sided_ok,
               CAST(est_cnt - true_cnt AS BIGINT) AS overshoot
        FROM est
        ORDER BY true_cnt DESC, l_partkey""")),

    // BM25 top-k retrieval — the lexical ranking function every corpus
    // search/retrieval pipeline starts from: tf saturation (k1=1.2) and
    // document-length normalization (b=0.75) per query term, idf in the
    // transcendental-free stance (q141): Robertson's idf is
    // ln((N-df+0.5)/(df+0.5)) — engine-dependent ln — so the gate scores
    // with its rational ODDS argument (2(N-df)+1)/(2df+1), exact-integer
    // cross-multiplied then divided ONCE; ranking behavior (rare terms
    // dominate) is preserved. The per-doc sum over the 5 fixed query
    // terms is PIVOTED into columns and added in one fixed textual order
    // — never a SUM aggregate over doubles, whose accumulation order no
    // engine guarantees.
    //
    // Scale: tf/df/dl are three partial-aggregated passes over the token
    // stream (the q27-family explode shape); the query side is 5 fixed
    // terms, so scoring is a broadcast of two tiny frames (term df, the
    // 1-row corpus stats) against the doc-term counts — at 100 TB the
    // only big exchange is the token-stream aggregation itself.
    QueryDef(
      "q172_bm25_topk",
      (s, dir) => {
        import graft.operators.Bm25
        val terms = Seq("dup", "vector", "merge", "stream", "hash")
        val f = Bm25.termScores(Tables.documents(s, dir), "doc_id", "text", terms)
        Bm25.pivotedScore(f.scores, Seq("doc_id", "dl"), terms, "score")
          .orderBy(col("score").desc, col("doc_id"))
          .limit(20)
      },
      Some(s"""
        WITH ${graft.operators.Bm25.scoredSql("'dup','vector','merge','stream','hash'")},
        pivoted AS (
          SELECT doc_id, dl,
                 COALESCE(MAX(CASE WHEN tk = 'dup' THEN score_t END), 0.0::DOUBLE) AS s_dup,
                 COALESCE(MAX(CASE WHEN tk = 'vector' THEN score_t END), 0.0::DOUBLE) AS s_vector,
                 COALESCE(MAX(CASE WHEN tk = 'merge' THEN score_t END), 0.0::DOUBLE) AS s_merge,
                 COALESCE(MAX(CASE WHEN tk = 'stream' THEN score_t END), 0.0::DOUBLE) AS s_stream,
                 COALESCE(MAX(CASE WHEN tk = 'hash' THEN score_t END), 0.0::DOUBLE) AS s_hash
          FROM scored GROUP BY 1, 2)
        SELECT doc_id, CAST(dl AS BIGINT) AS dl,
               s_dup + s_vector + s_merge + s_stream + s_hash AS score
        FROM pivoted
        ORDER BY score DESC, doc_id
        LIMIT 20""")),

    // Consistent-hash ring assignment — the partitioner-design op behind
    // every shard-rebalance decision: 9 shards × 32 virtual nodes on a
    // u64 md5 ring, each doc owned by its clockwise-successor vnode.
    // The gate computes the assignment under the 8-shard ring AND the
    // 9-shard ring (same vnodes + shard 8's) in one pass and checks THE
    // consistent-hashing theorem as data: when a shard is added, docs
    // only ever move TO the new shard (`only_new_shard_gains` must be
    // literal true for shards 0-7) — a mod-N partitioner would reshuffle
    // nearly everything.
    //
    // Scale: the ring is 288 rows — broadcast; successor lookup is a
    // conditional-min aggregate per doc over the broadcast ring (no
    // shuffle of the doc side at all until the per-shard count). Ring
    // order is compared in md5BitsOrderable space (unsigned-order-
    // preserving signed image) — the DuckDB twin compares raw
    // md5_number_lower values, which are natively unsigned.
    QueryDef(
      "q173_consistent_hash",
      (s, dir) => {
        import graft.functions.Kernels.{md5Bits, md5BitsOrderable}
        val ring = s.range(0, 9).select(col("id").as("shard"))
          .withColumn("v", explode(sequence(lit(0L), lit(31L))))
          .withColumn("rh", md5BitsOrderable(md5Bits(
            concat(lit("ring:"), col("shard"), lit(":"), col("v")))))
          .select(col("shard"), col("rh"))
        val docs = Tables.documents(s, dir).select(col("doc_id"),
          md5BitsOrderable(md5Bits(concat(lit("doc:"), col("doc_id")))).as("p"))
        val targets = docs.crossJoin(broadcast(ring))
          .groupBy(col("doc_id"), col("p"))
          .agg(
            min(when(col("shard") < 8 && col("rh") >= col("p"), col("rh"))).as("m8s"),
            min(when(col("shard") < 8, col("rh"))).as("m8m"),
            min(when(col("rh") >= col("p"), col("rh"))).as("m9s"),
            min(col("rh")).as("m9m"))
          .select(col("doc_id"),
            coalesce(col("m8s"), col("m8m")).as("t8"),
            coalesce(col("m9s"), col("m9m")).as("t9"))
        val r8 = ring.where(col("shard") < 8)
          .select(col("rh").as("t8"), col("shard").as("shard8"))
        val r9 = ring.select(col("rh").as("t9"), col("shard").as("shard9"))
        val assigned = targets
          .join(broadcast(r8), "t8").join(broadcast(r9), "t9")
          .groupBy(col("doc_id"))
          .agg(min(col("shard8")).as("shard8"), min(col("shard9")).as("shard9"))
        val perShard = assigned.groupBy(col("shard9").as("shard"))
          .agg(count(lit(1)).as("n_docs_9"),
            sum(when(col("shard8") =!= col("shard9"), 1L).otherwise(0L)).as("n_moved_in"),
            sum(col("doc_id")).as("id_checksum_9"))
        val n8 = assigned.groupBy(col("shard8").as("shard"))
          .agg(count(lit(1)).as("n_docs_8"))
        s.range(0, 9).select(col("id").as("shard"))
          .join(n8, Seq("shard"), "left")
          .join(perShard, Seq("shard"), "left")
          .select(col("shard"),
            coalesce(col("n_docs_8"), lit(0L)).as("n_docs_8"),
            coalesce(col("n_docs_9"), lit(0L)).as("n_docs_9"),
            coalesce(col("n_moved_in"), lit(0L)).as("n_moved_in"),
            (col("shard") === 8 || coalesce(col("n_moved_in"), lit(0L)) === 0L)
              .as("only_new_shard_gains"),
            coalesce(col("id_checksum_9"), lit(0L)).as("id_checksum_9"))
          .orderBy(col("shard"))
      },
      Some("""
        WITH ring AS (
          SELECT s.range AS shard, v.range AS v,
                 md5_number_lower('ring:' || s.range || ':' || v.range) AS rh
          FROM range(0, 9) s, range(0, 32) v),
        docs AS (
          SELECT doc_id, md5_number_lower('doc:' || doc_id) AS p FROM documents),
        targets AS (
          SELECT d.doc_id,
                 COALESCE(MIN(r.rh) FILTER (r.shard < 8 AND r.rh >= d.p),
                          MIN(r.rh) FILTER (r.shard < 8)) AS t8,
                 COALESCE(MIN(r.rh) FILTER (r.rh >= d.p), MIN(r.rh)) AS t9
          FROM docs d CROSS JOIN ring r
          GROUP BY 1),
        assigned AS (
          SELECT t.doc_id, MIN(r8.shard) AS shard8, MIN(r9.shard) AS shard9
          FROM targets t
          JOIN ring r8 ON r8.rh = t.t8 AND r8.shard < 8
          JOIN ring r9 ON r9.rh = t.t9
          GROUP BY 1),
        per_shard AS (
          SELECT shard9 AS shard, COUNT(*) AS n9,
                 SUM(CASE WHEN shard8 <> shard9 THEN 1 ELSE 0 END) AS moved_in,
                 SUM(doc_id) AS checksum9
          FROM assigned GROUP BY 1),
        n8 AS (SELECT shard8 AS shard, COUNT(*) AS n8 FROM assigned GROUP BY 1)
        SELECT s.range AS shard,
               CAST(COALESCE(n8.n8, 0) AS BIGINT) AS n_docs_8,
               CAST(COALESCE(p.n9, 0) AS BIGINT) AS n_docs_9,
               CAST(COALESCE(p.moved_in, 0) AS BIGINT) AS n_moved_in,
               (s.range = 8 OR COALESCE(p.moved_in, 0) = 0) AS only_new_shard_gains,
               CAST(COALESCE(p.checksum9, 0) AS BIGINT) AS id_checksum_9
        FROM range(0, 9) s
        LEFT JOIN n8 ON n8.shard = s.range
        LEFT JOIN per_shard p ON p.shard = s.range
        ORDER BY shard""")),

    // Interval k-coverage per day — the union-length sibling of q103's
    // max-concurrency sweep: how many MICROSECONDS of each day are
    // covered by >= 1 and >= 2 active 30-minute event windows
    // (utilization and contention, the two capacity-planning numbers).
    // Same midnight-clipped +1/-1 boundary stream as q103; deltas are
    // pre-summed per distinct instant, the running count is a cumulative
    // sum in event-time order, and each inter-boundary segment
    // contributes its microsecond width to every k <= running count.
    // Pure integers end-to-end (unix_micros / epoch_us — the floor-safe
    // timestamp basis, never CAST(epoch AS BIGINT) which rounds on one
    // engine and truncates on the other).
    //
    // Scale: the sweep is per-day partitioned — boundaries shuffle once
    // on day, the cumulative sum and lead share that one sort; no
    // self-join, no explode beyond the 2-row boundary pair per event.
    QueryDef(
      "q174_interval_coverage",
      (s, dir) => {
        val e = Tables.events(s, dir)
          .select(col("ts").as("st"), (col("ts") + expr("INTERVAL 30 MINUTES")).as("en"))
          .withColumn("d1", to_date(col("st")))
          .withColumn("midnight", date_add(col("d1"), 1).cast("timestamp"))
        val clipped = e.select(
          array(
            struct(col("d1").as("day"), col("st").as("t0"),
              least(col("en"), col("midnight")).as("t1")),
            struct(date_add(col("d1"), 1).as("day"), col("midnight").as("t0"),
              col("en").as("t1"))).as("ivs"))
          .select(explode(col("ivs")).as("iv"))
          .select(col("iv.day"), col("iv.t0"), col("iv.t1"))
          .where(col("t1") > col("t0"))
        val bounds = clipped.select(
            array(
              struct(col("day"), unix_micros(col("t0")).as("t"), lit(1L).as("delta")),
              struct(col("day"), unix_micros(col("t1")).as("t"), lit(-1L).as("delta"))).as("bs"))
          .select(explode(col("bs")).as("b"))
          .select(col("b.day"), col("b.t"), col("b.delta"))
          .groupBy(col("day"), col("t")).agg(sum(col("delta")).as("d"))
        val byT = Window.partitionBy(col("day")).orderBy(col("t"))
        val seg = bounds
          .withColumn("c", sum(col("d")).over(
            byT.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("w", coalesce(lead(col("t"), 1).over(byT) - col("t"), lit(0L)))
        seg.groupBy(col("day"))
          .agg(sum(when(col("c") >= 1L, col("w")).otherwise(0L)).as("covered_us"),
            sum(when(col("c") >= 2L, col("w")).otherwise(0L)).as("contended_us"))
          .orderBy(col("day"))
      },
      Some("""
        WITH iv AS (
          SELECT ts AS st, ts + INTERVAL 30 MINUTE AS en,
                 CAST(ts AS DATE) AS d1,
                 CAST(CAST(ts AS DATE) + 1 AS TIMESTAMP) AS midnight
          FROM events),
        clipped AS (
          SELECT d1 AS day, st AS t0, LEAST(en, midnight) AS t1 FROM iv
          UNION ALL
          SELECT d1 + 1 AS day, midnight AS t0, en AS t1 FROM iv
          WHERE en > midnight),
        bounds AS (
          SELECT day, t, SUM(delta) AS d FROM (
            SELECT day, epoch_us(t0) AS t, 1 AS delta FROM clipped WHERE t1 > t0
            UNION ALL
            SELECT day, epoch_us(t1) AS t, -1 AS delta FROM clipped WHERE t1 > t0)
          GROUP BY 1, 2),
        seg AS (
          SELECT day, t, d,
                 SUM(d) OVER (PARTITION BY day ORDER BY t
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c,
                 COALESCE(lead(t, 1) OVER (PARTITION BY day ORDER BY t) - t, 0) AS w
          FROM bounds)
        SELECT day,
               CAST(SUM(CASE WHEN c >= 1 THEN w ELSE 0 END) AS BIGINT) AS covered_us,
               CAST(SUM(CASE WHEN c >= 2 THEN w ELSE 0 END) AS BIGINT) AS contended_us
        FROM seg
        GROUP BY 1
        ORDER BY day""")),

    // Rolling 12-month regression slope (the time-varying beta of q168):
    // per market segment, the OLS slope of monthly revenue cents against
    // month index over a trailing 12-row window. The window carries the
    // four exact integer MOMENTS (Σx, Σy, Σxy, Σx² — month index ≤ ~84
    // keeps every product in BIGINT), and the slope is ONE double
    // division of the closed form at the end — a windowed aggregate of
    // 4 longs, never a windowed aggregate of doubles.
    //
    // Scale: one shuffle on segment for the monthly pre-aggregate (5×84
    // rows), then the rolling window runs on the broadcast-sized frame.
    // The same shape at 100 TB: the expensive pass is the monthly
    // rollup, which is partial-aggregated; the rolling math never
    // touches row-level data.
    QueryDef(
      "q175_rolling_beta",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val c = Tables.customer(s, dir)
          .select(col("c_custkey"), col("c_mktsegment").as("segment"))
        val monthly = o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .select(col("segment"),
            (year(to_date(col("o_orderdate"))) * 12 + month(to_date(col("o_orderdate")))
              - lit(1992 * 12 + 1)).cast("long").as("x"),
            (col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(18, 6)) * 100)
              .cast("long").as("cents"))
          .groupBy(col("segment"), col("x")).agg(sum(col("cents")).as("y"))
        val w12 = Window.partitionBy(col("segment")).orderBy(col("x"))
          .rowsBetween(-11, Window.currentRow)
        val rolled = monthly
          .withColumn("n", count(lit(1)).over(w12))
          .withColumn("sx", sum(col("x")).over(w12))
          .withColumn("sy", sum(col("y")).over(w12))
          .withColumn("sxy", sum(col("x") * col("y")).over(w12))
          .withColumn("sxx", sum(col("x") * col("x")).over(w12))
          .where(col("n") === 12L)
        rolled.select(col("segment"), col("x").as("month_idx"), col("y").as("month_cents"),
            ((col("n").cast("double") * col("sxy").cast("double") -
              col("sx").cast("double") * col("sy").cast("double")) /
              (col("n").cast("double") * col("sxx").cast("double") -
                col("sx").cast("double") * col("sx").cast("double"))).as("beta_12m"))
          .orderBy(col("segment"), col("month_idx"))
      },
      Some("""
        WITH monthly AS (
          SELECT c.c_mktsegment AS segment,
                 CAST(year(o.o_orderdate) * 12 + month(o.o_orderdate)
                      - (1992*12 + 1) AS BIGINT) AS x,
                 CAST(SUM(CAST(CAST(o.o_totalprice AS DECIMAL(18,6)) * 100 AS BIGINT))
                      AS BIGINT) AS y
          FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
          GROUP BY 1, 2),
        rolled AS (
          SELECT segment, x, y,
                 COUNT(*) OVER w AS n,
                 SUM(x) OVER w AS sx,
                 SUM(y) OVER w AS sy,
                 SUM(x*y) OVER w AS sxy,
                 SUM(x*x) OVER w AS sxx
          FROM monthly
          WINDOW w AS (PARTITION BY segment ORDER BY x
                       ROWS BETWEEN 11 PRECEDING AND CURRENT ROW))
        SELECT segment, x AS month_idx, y AS month_cents,
               (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
               (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS beta_12m
        FROM rolled
        WHERE n = 12
        ORDER BY segment, month_idx""")),

    // RFM quintile segmentation — the standard customer-mart scoring
    // model: recency (days before the corpus horizon), frequency (order
    // count), monetary (exact cents), each scored 1-5 by ntile over a
    // TOTAL order (metric, custkey — the q169 ntile contract makes the
    // quintile boundaries engine-identical), then a fixed rule table
    // labels segments. Scores are oriented so 5 = best: recency ntile
    // runs DESC (most-recent customers land in the highest tile).
    //
    // Scale: one aggregate per customer, then three EXACT quintile
    // assignments over the customer-level frame — each via GlobalRank's
    // bucketed two-level scheme (no single-partition window anywhere):
    // recency and frequency bucket per-value with a `ck div 2^20`
    // tiebreak refinement (both are the full leading sort key, so the
    // refinement divides the tiebreak column itself — contract-safe);
    // monetary buckets by `monetary_c div 2^20` (wide-range key). The
    // tile index is reconstructed arithmetically from (rank, n) with n
    // on a broadcast one-row aggregate. At 100 TB the fact scan
    // dominates and it's a single partial-aggregated pass plus three
    // customer-level shuffles.
    QueryDef(
      "q176_rfm_segments",
      (s, dir) => {
        import graft.operators.GlobalRank
        val horizon = lit("1998-08-02").cast("date")
        val o = Tables.orders(s, dir)
        val rfm = o.groupBy(col("o_custkey").as("ck"))
          .agg(min(datediff(horizon, to_date(col("o_orderdate")))).cast("long").as("recency_d"),
            count(lit(1)).as("frequency"),
            sum((col("o_totalprice")
              .cast(org.apache.spark.sql.types.DecimalType(18, 6)) * 100)
              .cast("long")).as("monetary_c"))
        // rfm is referenced 7x (three GlobalRanks x2 + the score join);
        // measured: recomputing the 2-column scan+agg beats an eager
        // localCheckpoint at every gate scale (2.0 vs 2.4 s at sf0.1,
        // 2.5 vs 4.2 s at sf1) — the materialization job + lineage break
        // cost more than the repeated columnar scan. Revisit only if the
        // upstream ever becomes a join.
        val tot = rfm.groupBy().agg(count(lit(1)).as("n_cust"))
        def quintile(rankDf: org.apache.spark.sql.DataFrame, scoreName: String) =
          rankDf.crossJoin(broadcast(tot))
            .withColumn(scoreName,
              GlobalRank.ntileFromRank(col("__rn"), col("n_cust"), 5).cast("long"))
            .select(col("ck"), col(scoreName))
        val rScore = quintile(GlobalRank.withGlobalRank(
          rfm, "__rn", struct(-col("recency_d"), expr("ck div 1048576")),
          col("recency_d").desc, col("ck")), "r_score")
        val fScore = quintile(GlobalRank.withGlobalRank(
          rfm, "__rn", struct(col("frequency"), expr("ck div 1048576")),
          col("frequency"), col("ck")), "f_score")
        val mScore = quintile(GlobalRank.withGlobalRank(
          rfm, "__rn", expr("monetary_c div 1048576"),
          col("monetary_c"), col("ck")), "m_score")
        val scored = rfm
          .join(rScore, "ck").join(fScore, "ck").join(mScore, "ck")
        scored
          .withColumn("segment",
            when(col("r_score") >= 4 && col("f_score") >= 4 && col("m_score") >= 4, "champion")
              .when(col("r_score") >= 4 && col("f_score") <= 2, "new")
              .when(col("r_score") <= 2 && col("f_score") >= 4, "at_risk")
              .otherwise("regular"))
          .groupBy(col("segment"))
          .agg(count(lit(1)).as("n_customers"),
            sum(col("monetary_c")).as("segment_cents"),
            sum(col("ck")).as("ck_checksum"),
            min(col("r_score") * 100 + col("f_score") * 10 + col("m_score")).as("min_rfm"),
            max(col("r_score") * 100 + col("f_score") * 10 + col("m_score")).as("max_rfm"))
          .orderBy(col("segment"))
      },
      Some("""
        WITH rfm AS (
          SELECT o_custkey AS ck,
                 CAST(MIN(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-08-02'))
                      AS BIGINT) AS recency_d,
                 CAST(COUNT(*) AS BIGINT) AS frequency,
                 CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,6)) * 100 AS BIGINT))
                      AS BIGINT) AS monetary_c
          FROM orders GROUP BY 1),
        scored AS (
          SELECT *,
                 CAST(ntile(5) OVER (ORDER BY recency_d DESC, ck) AS BIGINT) AS r_score,
                 CAST(ntile(5) OVER (ORDER BY frequency, ck) AS BIGINT) AS f_score,
                 CAST(ntile(5) OVER (ORDER BY monetary_c, ck) AS BIGINT) AS m_score
          FROM rfm),
        labeled AS (
          SELECT *,
                 CASE WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4 THEN 'champion'
                      WHEN r_score >= 4 AND f_score <= 2 THEN 'new'
                      WHEN r_score <= 2 AND f_score >= 4 THEN 'at_risk'
                      ELSE 'regular' END AS segment
          FROM scored)
        SELECT segment, CAST(COUNT(*) AS BIGINT) AS n_customers,
               CAST(SUM(monetary_c) AS BIGINT) AS segment_cents,
               CAST(SUM(ck) AS BIGINT) AS ck_checksum,
               CAST(MIN(r_score*100 + f_score*10 + m_score) AS BIGINT) AS min_rfm,
               CAST(MAX(r_score*100 + f_score*10 + m_score) AS BIGINT) AS max_rfm
        FROM labeled
        GROUP BY 1
        ORDER BY segment""")),

    // Bigram collocation mining by exact LIFT — which word pairs
    // co-occur more than independence predicts. PMI is log(lift) —
    // transcendental and engine-dependent — so the gate ranks by the
    // RATIONAL lift itself: B·c(ab) / (c(a)·c(b)) in exact integers,
    // one double division at the end (log is monotone: the top-k by
    // lift IS the top-k by PMI). Support floor c(ab) >= 5 kills the
    // noise pairs that make raw lift explode.
    //
    // Scale: bigrams come from the same one-sort-per-doc lead() shape
    // as the shingle builder; unigram and bigram counts are two
    // partial-aggregated shuffles; the lift join brings two BROADCAST
    // unigram maps against the bigram counts (vocabulary-sized, tiny
    // next to the pair stream).
    QueryDef(
      "q177_collocation_lift",
      (s, dir) => {
        val d = Tables.documents(s, dir)
        val t = d.select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "w")))
        val byPos = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
        val bi = t.withColumn("w2", lead(col("w"), 1).over(byPos))
          .where(col("w2").isNotNull)
        val biCnt = bi.groupBy(col("w").as("w1"), col("w2")).agg(count(lit(1)).as("c_ab"))
        val uniCnt = t.groupBy(col("w")).agg(count(lit(1)).as("c_w"))
        val totB = biCnt.agg(sum(col("c_ab")).as("b_total"))
        val lifted = biCnt.where(col("c_ab") >= 5L)
          .join(broadcast(uniCnt.select(col("w").as("w1"), col("c_w").as("c_a"))), "w1")
          .join(broadcast(uniCnt.select(col("w").as("w2"), col("c_w").as("c_b"))), "w2")
          .crossJoin(broadcast(totB))
          .withColumn("lift",
            (col("b_total") * col("c_ab")).cast("double") /
              (col("c_a") * col("c_b")).cast("double"))
        lifted.select(col("w1"), col("w2"), col("c_ab"), col("c_a"), col("c_b"),
            col("lift"))
          .orderBy(col("lift").desc, col("w1"), col("w2"))
          .limit(20)
      },
      Some("""
        WITH t AS (
          SELECT doc_id, unnest(range(0, len(ws))) AS pos, unnest(ws) AS w
          FROM (SELECT doc_id, string_split(text, ' ') ws FROM documents)),
        bi AS (
          SELECT doc_id, w,
                 lead(w, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
          FROM t),
        bi_cnt AS (
          SELECT w AS w1, w2, COUNT(*) AS c_ab FROM bi WHERE w2 IS NOT NULL GROUP BY 1, 2),
        uni_cnt AS (SELECT w, COUNT(*) AS c_w FROM t GROUP BY 1),
        tot AS (SELECT SUM(c_ab) AS b_total FROM bi_cnt),
        lifted AS (
          SELECT b.w1, b.w2, b.c_ab, a.c_w AS c_a, c.c_w AS c_b,
                 CAST(t.b_total * b.c_ab AS DOUBLE) / CAST(a.c_w * c.c_w AS DOUBLE) AS lift
          FROM bi_cnt b
          JOIN uni_cnt a ON a.w = b.w1
          JOIN uni_cnt c ON c.w = b.w2
          CROSS JOIN tot t
          WHERE b.c_ab >= 5)
        SELECT w1, w2, CAST(c_ab AS BIGINT) AS c_ab, CAST(c_a AS BIGINT) AS c_a,
               CAST(c_b AS BIGINT) AS c_b, lift
        FROM lifted
        ORDER BY lift DESC, w1, w2
        LIMIT 20""")),

    // Histogram-driven selectivity estimation — q169's ANALYZE stats put
    // to their actual use: estimate the row count of three range
    // predicates from the 8-bin equi-depth histogram (uniform-within-bin
    // interpolation, exact integer floor arithmetic) and gate the
    // estimate against the TRUE count. The equi-depth error bound is
    // checkable as data: a range predicate's estimate can only miss
    // inside the two boundary bins, so |est − actual| ≤ 2·ceil(n/8) + 2
    // must hold (`within_bound` literal true) — the CBO contract that
    // makes histogram-planned scans trustworthy.
    //
    // Scale: the histogram build is the q169 shape — GlobalRank's
    // bucketed two-level exact rank + arithmetic ntile reconstruction,
    // no single-partition window sort at any scale; estimation itself
    // touches 8 histogram rows × 3 predicates — the entire point of
    // collecting stats is that the PLANNING cost is independent of the
    // data; the exact counts ride one conditional-sum pass.
    QueryDef(
      "q178_selectivity_estimate",
      (s, dir) => {
        import graft.operators.GlobalRank
        val o = Tables.orders(s, dir)
          .select(col("o_orderkey"),
            (col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(18, 6)) * 100)
              .cast("long").as("cents"))
        val nTot = o.groupBy().agg(count(lit(1)).as("__n"))
        val binned = GlobalRank.withGlobalRank(
            o, "rn", expr("cents div 65536"), col("cents"), col("o_orderkey"))
          .crossJoin(broadcast(nTot))
          .withColumn("bin",
            GlobalRank.ntileFromRank(col("rn"), col("__n"), 8).cast("long"))
        val hist = binned.groupBy(col("bin"))
          .agg(min(col("cents")).as("lo"), max(col("cents")).as("hi"),
            count(lit(1)).as("cnt"))
        val preds = s.range(1).select(explode(array(
          struct(lit("p1_low").as("pred"), lit(0L).as("a"), lit(10000000L).as("b")),
          struct(lit("p2_mid").as("pred"), lit(10000001L).as("a"), lit(30000000L).as("b")),
          struct(lit("p3_high").as("pred"), lit(30000001L).as("a"),
            lit(100000000L).as("b")))).as("p"))
          .select(col("p.pred"), col("p.a"), col("p.b"))
        val est = broadcast(preds).crossJoin(hist)
          .withColumn("ov",
            greatest(lit(0L), least(col("hi"), col("b")) - greatest(col("lo"), col("a")) + 1))
          .withColumn("est_bin",
            expr("cnt * ov DIV (hi - lo + 1)"))
          .groupBy(col("pred")).agg(sum(col("est_bin")).as("est_rows"))
        val actual = o.agg(
          sum(when(col("cents").between(0L, 10000000L), 1L).otherwise(0L)).as("p1_low"),
          sum(when(col("cents").between(10000001L, 30000000L), 1L).otherwise(0L)).as("p2_mid"),
          sum(when(col("cents").between(30000001L, 100000000L), 1L).otherwise(0L)).as("p3_high"),
          count(lit(1)).as("n_total"))
          .select(explode(array(
            struct(lit("p1_low").as("pred"), col("p1_low").as("actual_rows"), col("n_total")),
            struct(lit("p2_mid").as("pred"), col("p2_mid").as("actual_rows"), col("n_total")),
            struct(lit("p3_high").as("pred"), col("p3_high").as("actual_rows"),
              col("n_total")))).as("r"))
          .select(col("r.pred"), col("r.actual_rows"), col("r.n_total"))
        est.join(actual, "pred")
          .select(col("pred"), col("est_rows"), col("actual_rows"),
            (col("est_rows") - col("actual_rows")).as("err"),
            (abs(col("est_rows") - col("actual_rows")) <=
              lit(2L) * expr("(n_total + 7) DIV 8") + lit(2L)).as("within_bound"))
          .orderBy(col("pred"))
      },
      Some("""
        WITH o AS (
          SELECT o_orderkey,
                 CAST(CAST(o_totalprice AS DECIMAL(18,6)) * 100 AS BIGINT) AS cents
          FROM orders),
        binned AS (
          SELECT *, CAST(ntile(8) OVER (ORDER BY cents, o_orderkey) AS BIGINT) AS bin
          FROM o),
        hist AS (
          SELECT bin, MIN(cents) AS lo, MAX(cents) AS hi, COUNT(*) AS cnt
          FROM binned GROUP BY 1),
        preds AS (
          SELECT * FROM (VALUES
            ('p1_low',  CAST(0 AS BIGINT),        CAST(10000000 AS BIGINT)),
            ('p2_mid',  CAST(10000001 AS BIGINT), CAST(30000000 AS BIGINT)),
            ('p3_high', CAST(30000001 AS BIGINT), CAST(100000000 AS BIGINT)))
            AS t(pred, a, b)),
        est AS (
          SELECT p.pred, SUM(h.cnt * GREATEST(0, LEAST(h.hi, p.b) - GREATEST(h.lo, p.a) + 1)
                             // (h.hi - h.lo + 1)) AS est_rows
          FROM preds p CROSS JOIN hist h
          GROUP BY 1),
        act AS (
          SELECT
            SUM(CASE WHEN cents BETWEEN 0 AND 10000000 THEN 1 ELSE 0 END) AS p1_low,
            SUM(CASE WHEN cents BETWEEN 10000001 AND 30000000 THEN 1 ELSE 0 END) AS p2_mid,
            SUM(CASE WHEN cents BETWEEN 30000001 AND 100000000 THEN 1 ELSE 0 END) AS p3_high,
            COUNT(*) AS n_total
          FROM o),
        actual AS (
          SELECT 'p1_low' AS pred, p1_low AS actual_rows, n_total FROM act
          UNION ALL SELECT 'p2_mid', p2_mid, n_total FROM act
          UNION ALL SELECT 'p3_high', p3_high, n_total FROM act)
        SELECT e.pred, CAST(e.est_rows AS BIGINT) AS est_rows,
               CAST(a.actual_rows AS BIGINT) AS actual_rows,
               CAST(e.est_rows - a.actual_rows AS BIGINT) AS err,
               abs(e.est_rows - a.actual_rows) <= 2 * ((a.n_total + 7) // 8) + 2
                 AS within_bound
        FROM est e JOIN actual a USING (pred)
        ORDER BY pred""")),

    // Typed Dataset Aggregator — the Spark-native custom-aggregation API
    // surface (expressions.Aggregator compiled to a TypedColumn over
    // groupByKey) that every migration with bespoke aggregates reaches
    // for; everything else in the suite gates the untyped Column path.
    // The aggregator accumulates exact integer moments (n, Σx, Σx²) of
    // floor-dollar order values per priority — buffer merges are
    // associative/commutative integer adds, so any partition split
    // yields identical state (the partial-agg contract made visible in
    // user code). Mean/variance leave the engine as ppm integral
    // divides on DECIMAL(38,0) (n·Σx² ≈ 5·10²¹ overflows int64 — the
    // widening is the point where a naive long buffer would silently
    // wrap). Oracle computes the identical moments in plain SQL.
    QueryDef(
      "q246_typed_aggregator",
      (s, dir) => {
        import s.implicits._
        val ds = Tables.orders(s, dir)
          .select(col("o_orderpriority").as("prio"),
            floor(col("o_totalprice")).cast("long").as("d"))
          .as[(String, Long)]
        val agged = ds.groupByKey(_._1).mapValues(_._2)
          .agg(DollarMoments.toColumn)
          .toDF("prio", "m")
        agged.select(col("prio"), col("m.n").as("n"),
            col("m.s").as("sum_dollars"), col("m.s2").as("sum_sq_dollars"))
          .withColumn("mean_ppm",
            expr("(1000000 * sum_dollars) div n"))
          .withColumn("var_ppm",
            expr("CAST(((CAST(n AS DECIMAL(38,0)) * sum_sq_dollars" +
              " - CAST(sum_dollars AS DECIMAL(38,0)) * sum_dollars)" +
              " * 1000000) div (CAST(n AS DECIMAL(38,0)) * n) AS BIGINT)"))
          .orderBy(col("prio"))
      },
      Some("""
        WITH m AS (
          SELECT o_orderpriority AS prio,
                 CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT) AS sum_dollars,
                 CAST(SUM(CAST(floor(o_totalprice) AS BIGINT)
                          * CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT)
                   AS sum_sq_dollars
          FROM orders GROUP BY 1)
        SELECT prio, n, sum_dollars, sum_sq_dollars,
               (1000000 * sum_dollars) // n AS mean_ppm,
               CAST(((CAST(n AS HUGEINT) * sum_sq_dollars
                      - CAST(sum_dollars AS HUGEINT) * sum_dollars)
                     * 1000000) // (CAST(n AS HUGEINT) * n) AS BIGINT) AS var_ppm
        FROM m
        ORDER BY prio""")),

    // Exact arbitrary-quantile SELECTION over the biggest table — the
    // distributed complement of the percentile family (q07/q128 exact
    // percentile aggregates, q46 gated sketches): P50/P90/P99/P99.9 of
    // line revenue as the ACTUAL element at rank ceil(p·n), found by
    // GlobalRank's two-level bucketed scheme + one broadcast join of the
    // 4-row target-rank table. No value-frequency map on any single
    // node, no global sort — this is how you take an exact P99.9 at
    // 100 TB. The selected VALUE is deterministic even where the rank
    // order is not (ties in cents occupy contiguous ranks, so the value
    // at a fixed rank is unique); target ranks ride DECIMAL(38,0) so
    // n·p_ppm never wraps.
    QueryDef(
      "q265_exact_quantile_select",
      (s, dir) => {
        import graft.operators.GlobalRank
        val li = Tables.lineitem(s, dir).select(
          (col("l_extendedprice").cast(org.apache.spark.sql.types.DecimalType(18, 6)) * 100)
            .cast("long").as("cents"))
        val tot = li.groupBy().agg(count(lit(1)).as("n"))
        val targets = tot.select(
            explode(array(lit(500000L), lit(900000L), lit(990000L),
              lit(999000L))).as("p_ppm"), col("n"))
          .withColumn("sel_rank", expr(
            "CAST((CAST(n AS DECIMAL(38,0)) * p_ppm + 999999) div 1000000 AS BIGINT)"))
        val ranked = GlobalRank.withGlobalRank(
          li, "rn", expr("cents div 65536"), col("cents"))
        ranked.join(broadcast(targets), col("rn") === col("sel_rank"))
          .select(col("p_ppm"), col("n"), col("sel_rank"),
            col("cents").as("value"))
          .orderBy(col("p_ppm"))
      },
      Some("""
        WITH li AS (
          SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,6)) * 100 AS BIGINT)
                   AS cents
          FROM lineitem),
        nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM li),
        ranked AS (
          SELECT cents, row_number() OVER (ORDER BY cents) AS rn FROM li),
        tgt AS (
          SELECT CAST(p.p_ppm AS BIGINT) AS p_ppm, nt.n,
                 CAST((CAST(nt.n AS HUGEINT) * p.p_ppm + 999999) // 1000000
                   AS BIGINT) AS sel_rank
          FROM (SELECT unnest([500000, 900000, 990000, 999000]) AS p_ppm) p
          CROSS JOIN nt)
        SELECT t.p_ppm, t.n, t.sel_rank, r.cents AS value
        FROM tgt t JOIN ranked r ON r.rn = t.sel_rank
        ORDER BY p_ppm""")),

    // Spearman rank correlation with EXACT tie handling — the monotone-
    // association member of the correlation family (Pearson lives in
    // q168's REGR lattice; Kendall in q304). Both variables have bounded
    // domains (quantity 1..50, discount 0..10 cents), so the corpus
    // collapses to a joint contingency table in ONE scan and every rank
    // is computed from value-marginals, never per-row windows: the
    // tie-average rank of value v is a prefix sum over ≤50 marginal
    // rows, carried as 2·rank (an integer — no .5 floats). Pearson on
    // those integer ranks rides the q292 DECIMAL(38,0) div-2^20 lattice;
    // because ρ's denominator needs a square root, the gate emits
    // SIGNED ρ² in ppm (sign(num)·num²/(dx·dy)) — sqrt-free, exact, and
    // the sign makes it order-equivalent to ρ. All floor divisions
    // operate on POSITIVE operands (rank sums), so Spark's
    // truncate-toward-zero and DuckDB's floor agree everywhere; the
    // one signed quantity is |·|-split before its division. The
    // rank-sum identity Σ2r = n(n+1) is emitted as a COMPUTED boolean —
    // a self-audit, not a literal. Scale: one partial-aggregated scan;
    // everything after is ≤550-row arithmetic per group.
    QueryDef(
      "q303_spearman",
      (s, dir) => {
        val joint = qdJointCounts(s, dir)
        def ranks2(marg: org.apache.spark.sql.DataFrame, vcol: String,
            out: String): org.apache.spark.sql.DataFrame = {
          val a = marg.select(col("flag"), col(vcol).as("va"),
            col("cv").as("ca"))
          val b = marg.select(col("flag"), col(vcol).as("vb"),
            col("cv").as("cb"))
          a.join(b, Seq("flag"))
            .where(col("vb") <= col("va"))
            .groupBy(col("flag"), col("va"))
            .agg((sum(when(col("vb") < col("va"), col("cb") * 2L)
              .otherwise(col("cb"))) + 1L).as(out))
            .withColumnRenamed("va", vcol)
        }
        val xm = joint.groupBy(col("flag"), col("x"))
          .agg(sum(col("cnt")).as("cv"))
        val ym = joint.groupBy(col("flag"), col("y"))
          .agg(sum(col("cnt")).as("cv"))
        val cells = joint
          .join(ranks2(xm, "x", "r2x"), Seq("flag", "x"))
          .join(ranks2(ym, "y", "r2y"), Seq("flag", "y"))
        val D = org.apache.spark.sql.types.DecimalType(38, 0)
        val m = cells.groupBy(col("flag")).agg(
          sum(col("cnt")).as("n"),
          sum(col("cnt").cast(D) * col("r2x")).as("sx"),
          sum(col("cnt").cast(D) * col("r2y")).as("sy"),
          sum(col("cnt").cast(D) * col("r2x") * col("r2x")).as("sxx"),
          sum(col("cnt").cast(D) * col("r2y") * col("r2y")).as("syy"),
          sum(col("cnt").cast(D) * col("r2x") * col("r2y")).as("sxy"))
        // Every floor division below operates on POSITIVE sums, and all
        // cross-products ride DECIMAL(38,0) (the q292 lesson: a BIGINT
        // lane silently wraps at larger scale while DuckDB promotes to
        // HUGEINT). Shifts are applied to each factor BEFORE its
        // product so no intermediate leaves decimal range.
        m.select(col("flag"), col("n"),
            expr("sx div 2").as("sum_rx"),
            expr("sy div 2").as("sum_ry"),
            expr("""cast(n as decimal(38,0)) * (sxy div 1048576)
                    - cast(sx div 1024 as decimal(38,0)) * (sy div 1024)""")
              .as("num_s"),
            expr("""cast(n as decimal(38,0)) * (sxx div 1048576)
                    - cast(sx div 1024 as decimal(38,0)) * (sx div 1024)""")
              .as("dx_s"),
            expr("""cast(n as decimal(38,0)) * (syy div 1048576)
                    - cast(sy div 1024 as decimal(38,0)) * (sy div 1024)""")
              .as("dy_s"))
          .select(col("flag"), col("n"), col("sum_rx"), col("sum_ry"),
            (col("sum_rx") * 2 === col("n") * (col("n") + 1) &&
              col("sum_ry") * 2 === col("n") * (col("n") + 1))
              .as("rank_identity_ok"),
            (when(col("num_s") < 0, -1L).otherwise(1L) *
              expr("""(cast(abs(num_s) div 1048576 as decimal(38,0))
                       * (abs(num_s) div 1048576) * 1000000)
                      div (cast(dx_s div 1048576 as decimal(38,0))
                           * (dy_s div 1048576))"""))
              .cast("long").as("spearman2_signed_ppm"))
          .orderBy(col("flag"))
      },
      Some(s"""
        WITH $QdJointSql,
        xm AS (SELECT flag, x, SUM(cnt) AS cv FROM joint GROUP BY 1, 2),
        ym AS (SELECT flag, y, SUM(cnt) AS cv FROM joint GROUP BY 1, 2),
        rx AS (
          SELECT a.flag, a.x,
                 SUM(CASE WHEN b.x < a.x THEN 2 * b.cv ELSE b.cv END) + 1
                   AS r2x
          FROM xm a JOIN xm b ON a.flag = b.flag AND b.x <= a.x
          GROUP BY 1, 2),
        ry AS (
          SELECT a.flag, a.y,
                 SUM(CASE WHEN b.y < a.y THEN 2 * b.cv ELSE b.cv END) + 1
                   AS r2y
          FROM ym a JOIN ym b ON a.flag = b.flag AND b.y <= a.y
          GROUP BY 1, 2),
        cells AS (
          SELECT j.flag, j.cnt, rx.r2x, ry.r2y
          FROM joint j
          JOIN rx ON rx.flag = j.flag AND rx.x = j.x
          JOIN ry ON ry.flag = j.flag AND ry.y = j.y),
        m AS (
          SELECT flag, CAST(SUM(cnt) AS BIGINT) AS n,
                 SUM(CAST(cnt AS HUGEINT) * r2x) AS sx,
                 SUM(CAST(cnt AS HUGEINT) * r2y) AS sy,
                 SUM(CAST(cnt AS HUGEINT) * r2x * r2x) AS sxx,
                 SUM(CAST(cnt AS HUGEINT) * r2y * r2y) AS syy,
                 SUM(CAST(cnt AS HUGEINT) * r2x * r2y) AS sxy
          FROM cells GROUP BY 1),
        lat AS (
          SELECT flag, n,
                 CAST(sx // 2 AS BIGINT) AS sum_rx,
                 CAST(sy // 2 AS BIGINT) AS sum_ry,
                 CAST(n AS HUGEINT) * (sxy // 1048576)
                   - (sx // 1024) * (sy // 1024) AS num_s,
                 CAST(n AS HUGEINT) * (sxx // 1048576)
                   - (sx // 1024) * (sx // 1024) AS dx_s,
                 CAST(n AS HUGEINT) * (syy // 1048576)
                   - (sy // 1024) * (sy // 1024) AS dy_s
          FROM m)
        SELECT flag, n, sum_rx, sum_ry,
               (sum_rx * 2 = n * (n + 1) AND sum_ry * 2 = n * (n + 1))
                 AS rank_identity_ok,
               CAST((CASE WHEN num_s < 0 THEN -1 ELSE 1 END)
                    * (((abs(num_s) // 1048576) * (abs(num_s) // 1048576)
                        * 1000000)
                       // ((dx_s // 1048576) * (dy_s // 1048576)))
                    AS BIGINT) AS spearman2_signed_ppm
        FROM lat
        ORDER BY flag""")),

    // Kendall tau with tie counts — the PAIR-concordance member of the
    // correlation family: on the same bounded joint contingency table as
    // q303, concordant/discordant mass is a ≤550×550 cell self-join
    // (cnt_a·cnt_b over cells strictly ordered in both coordinates) —
    // never a row-pair join. τ_a = (C−D)/(n(n−1)/2) in exact ppm;
    // τ_b's denominator needs square roots, so the gate emits SIGNED
    // τ_b² in ppm from (C−D)², (n0−n1), (n0−n2) — all exact DECIMAL(38,0)
    // integers (tie corrections n1/n2 from the marginals). The signed
    // quantity is |·|-split before its floor division (Spark div
    // truncates, DuckDB // floors — they agree only on positives).
    // Scale: one scan to the joint table; the pair arithmetic is
    // constant-bounded by the value domains, not the corpus.
    QueryDef(
      "q304_kendall_tau",
      (s, dir) => {
        val joint = qdJointCounts(s, dir).cutLineage()
        val D = org.apache.spark.sql.types.DecimalType(38, 0)
        val a = joint.select(col("flag"), col("x").as("xa"),
          col("y").as("ya"), col("cnt").as("ca"))
        val b = joint.select(col("flag"), col("x").as("xb"),
          col("y").as("yb"), col("cnt").as("cb"))
        val cd = a.join(b, Seq("flag"))
          .where(col("xb") > col("xa") && col("yb") =!= col("ya"))
          .groupBy(col("flag"))
          .agg(
            sum(when(col("yb") > col("ya"),
              col("ca").cast(D) * col("cb")).otherwise(lit(0).cast(D)))
              .as("c_mass"),
            sum(when(col("yb") < col("ya"),
              col("ca").cast(D) * col("cb")).otherwise(lit(0).cast(D)))
              .as("d_mass"))
        val xt = joint.groupBy(col("flag"), col("x"))
          .agg(sum(col("cnt")).as("cv"))
          .groupBy(col("flag"))
          .agg(sum(expr("cast(cv as decimal(38,0)) * (cv - 1) div 2"))
            .as("n1"))
        val yt = joint.groupBy(col("flag"), col("y"))
          .agg(sum(col("cnt")).as("cv"))
          .groupBy(col("flag"))
          .agg(sum(expr("cast(cv as decimal(38,0)) * (cv - 1) div 2"))
            .as("n2"))
        val nn = joint.groupBy(col("flag")).agg(sum(col("cnt")).as("n"))
        nn.join(cd, Seq("flag")).join(xt, Seq("flag")).join(yt, Seq("flag"))
          .select(col("flag"), col("n"),
            col("c_mass").cast("long").as("n_concordant"),
            col("d_mass").cast("long").as("n_discordant"),
            col("n1").cast("long").as("tie_x"),
            col("n2").cast("long").as("tie_y"),
            (when(col("c_mass") < col("d_mass"), -1L).otherwise(1L) *
              expr("""(abs(c_mass - d_mass) * 1000000)
                      div (cast(n as decimal(38,0)) * (n - 1) div 2)"""))
              .cast("long").as("tau_a_ppm"),
            (when(col("c_mass") < col("d_mass"), -1L).otherwise(1L) *
              expr("""(abs(c_mass - d_mass) * abs(c_mass - d_mass)
                       * 1000000)
                      div (cast(cast(n as decimal(38,0)) * (n - 1) div 2
                                - n1 as decimal(38,0))
                           * (cast(n as decimal(38,0)) * (n - 1) div 2
                              - n2))"""))
              .cast("long").as("tau_b2_signed_ppm"))
          .orderBy(col("flag"))
      },
      Some(s"""
        WITH $QdJointSql,
        cd AS (
          SELECT a.flag,
                 SUM(CASE WHEN b.y > a.y
                          THEN CAST(a.cnt AS HUGEINT) * b.cnt
                          ELSE 0 END) AS c_mass,
                 SUM(CASE WHEN b.y < a.y
                          THEN CAST(a.cnt AS HUGEINT) * b.cnt
                          ELSE 0 END) AS d_mass
          FROM joint a JOIN joint b
            ON a.flag = b.flag AND b.x > a.x AND b.y <> a.y
          GROUP BY 1),
        xt AS (
          SELECT flag, SUM(CAST(cv AS HUGEINT) * (cv - 1) // 2) AS n1
          FROM (SELECT flag, x, SUM(cnt) AS cv FROM joint GROUP BY 1, 2)
          GROUP BY 1),
        yt AS (
          SELECT flag, SUM(CAST(cv AS HUGEINT) * (cv - 1) // 2) AS n2
          FROM (SELECT flag, y, SUM(cnt) AS cv FROM joint GROUP BY 1, 2)
          GROUP BY 1),
        nn AS (SELECT flag, CAST(SUM(cnt) AS BIGINT) AS n FROM joint
               GROUP BY 1)
        SELECT nn.flag, nn.n,
               CAST(cd.c_mass AS BIGINT) AS n_concordant,
               CAST(cd.d_mass AS BIGINT) AS n_discordant,
               CAST(xt.n1 AS BIGINT) AS tie_x,
               CAST(yt.n2 AS BIGINT) AS tie_y,
               CAST((CASE WHEN cd.c_mass < cd.d_mass THEN -1 ELSE 1 END)
                    * ((abs(cd.c_mass - cd.d_mass) * 1000000)
                       // (CAST(nn.n AS HUGEINT) * (nn.n - 1) // 2))
                    AS BIGINT) AS tau_a_ppm,
               CAST((CASE WHEN cd.c_mass < cd.d_mass THEN -1 ELSE 1 END)
                    * ((abs(cd.c_mass - cd.d_mass)
                        * abs(cd.c_mass - cd.d_mass) * 1000000)
                       // ((CAST(nn.n AS HUGEINT) * (nn.n - 1) // 2
                            - xt.n1)
                          * (CAST(nn.n AS HUGEINT) * (nn.n - 1) // 2
                             - yt.n2)))
                    AS BIGINT) AS tau_b2_signed_ppm
        FROM nn JOIN cd ON cd.flag = nn.flag
        JOIN xt ON xt.flag = nn.flag
        JOIN yt ON yt.flag = nn.flag
        ORDER BY nn.flag""")),

    // Decision-stump training — the GBDT building block, trained
    // in-engine with EXACT arithmetic: over every candidate split
    // (feature ∈ {quantity, discount-cents}, threshold ∈ its bounded
    // domain) pick the one minimizing weighted Gini impurity of the
    // 3-class returnflag label. The third consumer of qdJointCounts:
    // left/right class masses per threshold are triangular prefix sums
    // over the ≤61 feature-value marginals, and the candidate score is
    // the exact ppm lattice
    //   gini_ppm = 10⁶·[(nL²−ΣcL²)·nR + (nR²−ΣcR²)·nL] div (n·nL·nR)
    // — one positive-operand floor division per candidate, products
    // riding DECIMAL(38,0). Argmin tiebreak (gini, feature, threshold)
    // is a total order; training accuracy = majority-vote mass of the
    // two leaves on the same lattice. Scale: ONE scan to the joint
    // table; candidate evaluation is bounded by the value domains.
    QueryDef(
      "q310_gini_stump",
      (s, dir) => {
        val joint = qdJointCounts(s, dir).cutLineage()
        val D = org.apache.spark.sql.types.DecimalType(38, 0)
        def marg(feat: String): org.apache.spark.sql.DataFrame =
          joint.groupBy(col(feat).as("v"), col("flag"))
            .agg(sum(col("cnt")).as("c"))
            .withColumn("feature", lit(feat))
        val mAll = marg("x").unionByName(marg("y"))
        val thrs = mAll.select(col("feature"), col("v").as("t")).distinct()
        val cumRaw = thrs.join(mAll, Seq("feature"))
          .where(col("v") <= col("t"))
          .groupBy(col("feature"), col("t"), col("flag"))
          .agg(sum(col("c")).as("cl"))
        val tot = joint.groupBy(col("flag"))
          .agg(sum(col("cnt")).as("ctot"))
        // Explicit threshold × class grid: a class with zero mass at or
        // below a threshold still contributes its full total to the
        // right child (a left join from the grid, not from the sparse
        // prefix rows — the sparse form silently undercounts n_r).
        val cand = thrs.crossJoin(broadcast(tot))
          .join(cumRaw, Seq("feature", "t", "flag"), "left")
          .withColumn("cl", coalesce(col("cl"), lit(0L)))
          .groupBy(col("feature"), col("t"))
          .agg(
            sum(col("cl")).as("n_l"),
            sum(col("ctot") - col("cl")).as("n_r"),
            sum(col("cl").cast(D) * col("cl")).as("sl2"),
            sum((col("ctot") - col("cl")).cast(D)
              * (col("ctot") - col("cl"))).as("sr2"),
            max(col("cl")).as("max_l"),
            max(col("ctot") - col("cl")).as("max_r"))
          .where(col("n_l") > 0 && col("n_r") > 0)
          .select(col("feature"), col("t"), col("n_l"), col("n_r"),
            col("max_l"), col("max_r"),
            expr("""((cast(n_l as decimal(38,0)) * n_l - sl2) * n_r
                     + (cast(n_r as decimal(38,0)) * n_r - sr2) * n_l)
                    * 1000000
                    div (cast(n_l + n_r as decimal(38,0)) * n_l * n_r)""")
              .as("gini_ppm"))
        val best = cand
          .select(min(struct(col("gini_ppm"), col("feature"), col("t")))
            .as("b"))
        cand.crossJoin(broadcast(best))
          .where(col("gini_ppm") === col("b.gini_ppm") &&
            col("feature") === col("b.feature") && col("t") === col("b.t"))
          .select(col("feature"), col("t").as("threshold"),
            col("n_l"), col("n_r"), col("gini_ppm"),
            expr("""((max_l + max_r) * 1000000) div (n_l + n_r)""")
              .as("train_acc_ppm"))
          .orderBy(col("feature"))
      },
      Some(s"""
        WITH $QdJointSql,
        mx AS (SELECT 'x' AS feature, x AS v, flag, SUM(cnt) AS c
               FROM joint GROUP BY 2, 3),
        my AS (SELECT 'y' AS feature, y AS v, flag, SUM(cnt) AS c
               FROM joint GROUP BY 2, 3),
        m AS (SELECT * FROM mx UNION ALL SELECT * FROM my),
        thr AS (SELECT DISTINCT feature, v AS t FROM m),
        cum AS (
          SELECT t.feature, t.t, mm.flag, SUM(mm.c) AS cl
          FROM thr t
          JOIN m mm ON mm.feature = t.feature AND mm.v <= t.t
          GROUP BY 1, 2, 3),
        tot AS (SELECT flag, CAST(SUM(cnt) AS BIGINT) AS ctot FROM joint
                GROUP BY 1),
        grid AS (
          SELECT th.feature, th.t, tt.flag, tt.ctot,
                 COALESCE(c.cl, 0) AS cl
          FROM thr th CROSS JOIN tot tt
          LEFT JOIN cum c ON c.feature = th.feature AND c.t = th.t
                         AND c.flag = tt.flag),
        cand AS (
          SELECT g.feature, g.t,
                 CAST(SUM(g.cl) AS BIGINT) AS n_l,
                 CAST(SUM(g.ctot - g.cl) AS BIGINT) AS n_r,
                 SUM(CAST(g.cl AS HUGEINT) * g.cl) AS sl2,
                 SUM(CAST(g.ctot - g.cl AS HUGEINT) * (g.ctot - g.cl))
                   AS sr2,
                 CAST(MAX(g.cl) AS BIGINT) AS max_l,
                 CAST(MAX(g.ctot - g.cl) AS BIGINT) AS max_r
          FROM grid g
          GROUP BY 1, 2
          HAVING SUM(g.cl) > 0 AND SUM(g.ctot - g.cl) > 0),
        scored AS (
          SELECT feature, t, n_l, n_r, max_l, max_r,
                 ((CAST(n_l AS HUGEINT) * n_l - sl2) * n_r
                  + (CAST(n_r AS HUGEINT) * n_r - sr2) * n_l) * 1000000
                 // (CAST(n_l + n_r AS HUGEINT) * n_l * n_r) AS gini_ppm
          FROM cand),
        best AS (
          SELECT * FROM scored
          ORDER BY gini_ppm, feature, t LIMIT 1)
        SELECT feature, t AS threshold, n_l, n_r,
               CAST(gini_ppm AS BIGINT) AS gini_ppm,
               ((max_l + max_r) * 1000000) // (n_l + n_r)
                 AS train_acc_ppm
        FROM best
        ORDER BY feature""")),

    // Naive Bayes — an actual TRAINED-and-EVALUATED classifier in the
    // engine: predict returnflag from (quantity-bucket, discount-cents)
    // with Laplace-smoothed categorical likelihoods, an 80/20
    // md5-hash train/test split (the q58 split contract — deterministic
    // on both engines), and a full confusion matrix + accuracy as the
    // gate. Scoring compares P(c)·P(qb|c)·P(y|c) across the 3 classes;
    // the comparison happens on a ≤66-cell (qb × y) grid, so the ONE
    // float construct is a fixed-order product of three exact-integer
    // ratios per (cell, class) — identical IEEE on both engines —
    // argmaxed with a deterministic class tiebreak. Scale: two scans
    // (train counts, test cell counts), everything else is ≤198-row
    // arithmetic; test rows join their cell's prediction by broadcast.
    QueryDef(
      "q311_naive_bayes",
      (s, dir) => {
        val st = nbStage(s, dir)
        val testCells = st.testCells
        val pred = st.scored
          .withColumn("inv",
            when(col("flag") === "A", 3L).when(col("flag") === "N", 2L)
              .otherwise(1L))
          .groupBy(col("qb"), col("y"))
          .agg(max(struct(col("score"), col("inv"), col("flag"))).as("m"))
          .select(col("qb"), col("y"), col("m.flag").as("predicted"))
        val confusion = testCells.join(broadcast(pred), Seq("qb", "y"))
          .groupBy(col("actual"), col("predicted"))
          .agg(sum(col("n")).as("n"))
        val acc = confusion.agg(
          expr("""(sum(CASE WHEN actual = predicted THEN n ELSE 0 END)
                   * 1000000) div sum(n)""").as("acc_ppm"))
        confusion.crossJoin(broadcast(acc))
          .select(col("actual"), col("predicted"), col("n"),
            col("acc_ppm"))
          .orderBy(col("actual"), col("predicted"))
      },
      Some(s"""
        WITH $NbStageSql,
        pred AS (
          SELECT qb, y, flag AS predicted FROM (
            SELECT qb, y, flag, row_number() OVER (
              PARTITION BY qb, y ORDER BY score DESC, flag) AS rn
            FROM scored) WHERE rn = 1),
        confusion AS (
          SELECT t.actual, p.predicted, CAST(SUM(t.n) AS BIGINT) AS n
          FROM test_cells t JOIN pred p ON p.qb = t.qb AND p.y = t.y
          GROUP BY 1, 2),
        acc AS (
          SELECT (SUM(CASE WHEN actual = predicted THEN n ELSE 0 END)
                  * 1000000) // SUM(n) AS acc_ppm
          FROM confusion)
        SELECT c.actual, c.predicted, c.n,
               CAST(a.acc_ppm AS BIGINT) AS acc_ppm
        FROM confusion c CROSS JOIN acc a
        ORDER BY c.actual, c.predicted""")),

    // 5-fold cross-validation of the q311 classifier — the
    // model-SELECTION primitive, built on the complement trick: fold
    // f's training counts are GLOBAL counts minus fold-f counts
    // (nc_tr = N_c − n_{c,f}, likewise per feature value), so the five
    // training sets cost ONE pass of per-fold counting — never five
    // re-scans. Folds come from the same md5 lattice as q311's split;
    // scoring/argmax/tiebreak reuse q311's fixed-order IEEE contract on
    // the ≤(5·66)-cell grid. The gate emits per-fold accuracy plus the
    // cross-fold mean (floor-ppm), i.e. the number a model-selection
    // loop would actually compare. Scale: two scans (fold counts, test
    // cells); everything else is ≤990-row grid arithmetic.
    QueryDef(
      "q312_cross_validation",
      (s, dir) => {
        import graft.functions.Kernels.md5Lower64Lo32
        // same under-split-scan fan-out as nbStage (one md5 per row)
        val base = graft.operators.Skew.fanOutRead(Tables.lineitem(s, dir)
            .select(col("l_returnflag"), col("l_quantity"), col("l_discount"),
              col("l_orderkey"), col("l_linenumber"), col("l_partkey")))
          .select(col("l_returnflag").as("flag"),
            expr("CAST(l_quantity AS BIGINT) div 10").as("qb"),
            (col("l_discount")
              .cast(org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
              .cast("long").as("y"),
            pmod(md5Lower64Lo32(concat(lit("nb:"),
              col("l_orderkey").cast("string"), lit("-"),
              col("l_linenumber").cast("string"), lit("-"),
              col("l_partkey").cast("string"))), lit(5L)).as("f"))
        // ONE full-data aggregation: the (fold × class × qb × y) joint
        // (≤990 cells) is a sufficient statistic for EVERYTHING below —
        // per-fold counts, global counts, marginals, and the test cells
        // all derive from this tiny frame (7 consumers → lineage cut).
        val jf = base
          .groupBy(col("f"), col("flag"), col("qb"), col("y"))
          .agg(count(lit(1)).as("n"))
          .cutLineage()
        val folds = s.range(0, 5).select(col("id").as("f"))
        def complement(keys: Seq[String], out: String)
            : org.apache.spark.sql.DataFrame = {
          val perFold = jf.groupBy((col("f") +: keys.map(col)): _*)
            .agg(sum(col("n")).as("nf"))
          val global = jf.groupBy(keys.map(col): _*)
            .agg(sum(col("n")).as("ng"))
          global.crossJoin(broadcast(folds))
            .join(perFold, "f" +: keys, "left")
            .select((col("f") +: keys.map(col)) :+
              (col("ng") - coalesce(col("nf"), lit(0L))).as(out): _*)
        }
        val priors = complement(Seq("flag"), "nc")
        val c1 = complement(Seq("flag", "qb"), "cq")
        val c2 = complement(Seq("flag", "y"), "cy")
        val testCells = jf.select(col("f"), col("qb"), col("y"),
          col("flag").as("actual"), col("n"))
        val cells = testCells.select(col("f"), col("qb"), col("y"))
          .distinct()
        val scored = cells
          .join(broadcast(priors), Seq("f"))
          .join(broadcast(c1), Seq("f", "flag", "qb"), "left")
          .join(broadcast(c2), Seq("f", "flag", "y"), "left")
          .select(col("f"), col("qb"), col("y"), col("flag"),
            (col("nc").cast("double")
              * ((coalesce(col("cq"), lit(0L)) + 1).cast("double")
                / (col("nc") + 6).cast("double"))
              * ((coalesce(col("cy"), lit(0L)) + 1).cast("double")
                / (col("nc") + 11).cast("double"))).as("score"))
        val pred = scored
          .withColumn("inv",
            when(col("flag") === "A", 3L).when(col("flag") === "N", 2L)
              .otherwise(1L))
          .groupBy(col("f"), col("qb"), col("y"))
          .agg(max(struct(col("score"), col("inv"), col("flag"))).as("m"))
          .select(col("f"), col("qb"), col("y"),
            col("m.flag").as("predicted"))
        val perFoldAcc = testCells
          .join(broadcast(pred), Seq("f", "qb", "y"))
          .groupBy(col("f"))
          .agg(sum(col("n")).as("n_test"),
            sum(when(col("actual") === col("predicted"), col("n"))
              .otherwise(0L)).as("n_correct"))
          .select(col("f"), col("n_test"), col("n_correct"),
            expr("(n_correct * 1000000) div n_test").as("acc_ppm"))
        val mean = perFoldAcc.agg(
          expr("CAST(sum(acc_ppm) div count(1) AS BIGINT)")
            .as("mean_acc_ppm"))
        perFoldAcc.crossJoin(broadcast(mean))
          .orderBy(col("f"))
      },
      Some("""
        WITH base AS (
          SELECT l_returnflag AS flag,
                 CAST(l_quantity AS BIGINT) // 10 AS qb,
                 CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS y,
                 (CAST(md5_number_lower('nb:' || CAST(l_orderkey AS VARCHAR)
                    || '-' || CAST(l_linenumber AS VARCHAR) || '-'
                    || CAST(l_partkey AS VARCHAR)) % 4294967296 AS BIGINT))
                  % 5 AS f
          FROM lineitem),
        folds AS (SELECT CAST(r.range AS BIGINT) AS f FROM range(0, 5) r),
        jf AS (
          SELECT f, flag, qb, y, CAST(COUNT(*) AS BIGINT) AS n
          FROM base GROUP BY 1, 2, 3, 4),
        pg AS (SELECT flag, CAST(SUM(n) AS BIGINT) AS ng FROM jf
               GROUP BY 1),
        pf AS (SELECT f, flag, CAST(SUM(n) AS BIGINT) AS nf FROM jf
               GROUP BY 1, 2),
        priors AS (
          SELECT fo.f, g.flag, g.ng - COALESCE(p.nf, 0) AS nc
          FROM pg g CROSS JOIN folds fo
          LEFT JOIN pf p ON p.f = fo.f AND p.flag = g.flag),
        qg AS (SELECT flag, qb, CAST(SUM(n) AS BIGINT) AS ng FROM jf
               GROUP BY 1, 2),
        qf AS (SELECT f, flag, qb, CAST(SUM(n) AS BIGINT) AS nf
               FROM jf GROUP BY 1, 2, 3),
        c1 AS (
          SELECT fo.f, g.flag, g.qb, g.ng - COALESCE(p.nf, 0) AS cq
          FROM qg g CROSS JOIN folds fo
          LEFT JOIN qf p ON p.f = fo.f AND p.flag = g.flag
                        AND p.qb = g.qb),
        yg AS (SELECT flag, y, CAST(SUM(n) AS BIGINT) AS ng FROM jf
               GROUP BY 1, 2),
        yf AS (SELECT f, flag, y, CAST(SUM(n) AS BIGINT) AS nf
               FROM jf GROUP BY 1, 2, 3),
        c2 AS (
          SELECT fo.f, g.flag, g.y, g.ng - COALESCE(p.nf, 0) AS cy
          FROM yg g CROSS JOIN folds fo
          LEFT JOIN yf p ON p.f = fo.f AND p.flag = g.flag
                        AND p.y = g.y),
        test_cells AS (
          SELECT f, qb, y, flag AS actual, n FROM jf),
        cells AS (SELECT DISTINCT f, qb, y FROM test_cells),
        scored AS (
          SELECT ce.f, ce.qb, ce.y, pr.flag,
                 CAST(pr.nc AS DOUBLE)
                   * (CAST(COALESCE(c1.cq, 0) + 1 AS DOUBLE)
                      / CAST(pr.nc + 6 AS DOUBLE))
                   * (CAST(COALESCE(c2.cy, 0) + 1 AS DOUBLE)
                      / CAST(pr.nc + 11 AS DOUBLE)) AS score
          FROM cells ce
          JOIN priors pr ON pr.f = ce.f
          LEFT JOIN c1 ON c1.f = ce.f AND c1.flag = pr.flag
                      AND c1.qb = ce.qb
          LEFT JOIN c2 ON c2.f = ce.f AND c2.flag = pr.flag
                      AND c2.y = ce.y),
        pred AS (
          SELECT f, qb, y, flag AS predicted FROM (
            SELECT f, qb, y, flag, row_number() OVER (
              PARTITION BY f, qb, y ORDER BY score DESC, flag) AS rn
            FROM scored) WHERE rn = 1),
        pfa AS (
          SELECT t.f,
                 CAST(SUM(t.n) AS BIGINT) AS n_test,
                 CAST(SUM(CASE WHEN t.actual = p.predicted THEN t.n
                               ELSE 0 END) AS BIGINT) AS n_correct
          FROM test_cells t
          JOIN pred p ON p.f = t.f AND p.qb = t.qb AND p.y = t.y
          GROUP BY 1),
        withacc AS (
          SELECT f, n_test, n_correct,
                 (n_correct * 1000000) // n_test AS acc_ppm
          FROM pfa),
        mean AS (
          SELECT CAST(SUM(acc_ppm) // COUNT(*) AS BIGINT)
                   AS mean_acc_ppm
          FROM withacc)
        SELECT w.f, w.n_test, w.n_correct,
               CAST(w.acc_ppm AS BIGINT) AS acc_ppm, m.mean_acc_ppm
        FROM withacc w CROSS JOIN mean m
        ORDER BY w.f""")),

    // ROC AUC of the q311 ranker — accuracy (q311) answers "how often is
    // the argmax right"; AUC answers "does the class-R score ORDER
    // positives above negatives", the metric a threshold-free consumer
    // actually needs. Computed exactly as the tie-corrected rank-sum
    // U/(P·N): test mass collapses to the shared ≤66-cell grid
    // (single-sourced nbStage — classifier and metric cannot drift),
    // cells group by EXACT score value (identical IEEE bits on both
    // engines, so score-equality is deterministic), and
    // 2U = Σ_s pos_s·(2·cumneg_<s + neg_s) gives ties half credit with
    // NO .5 floats — the lattice carries 2U and divides once into ppm.
    // Gini coefficient = 2·AUC−1 derives from the floored ppm (exact,
    // engine-identical). Scale: everything after the one test scan is
    // ≤66-row triangular arithmetic.
    QueryDef(
      "q313_roc_auc",
      (s, dir) => {
        val D = org.apache.spark.sql.types.DecimalType(38, 0)
        val st = nbStage(s, dir)
        val rscore = st.scored.where(col("flag") === "R")
          .select(col("qb"), col("y"), col("score"))
        val pn = st.testCells.groupBy(col("qb"), col("y"))
          .agg(sum(when(col("actual") === "R", col("n")).otherwise(0L))
            .as("pos"),
            sum(when(col("actual") =!= "R", col("n")).otherwise(0L))
              .as("neg"))
        val sgrp = pn.join(rscore, Seq("qb", "y"))
          .groupBy(col("score"))
          .agg(sum(col("pos")).as("pos"), sum(col("neg")).as("neg"))
        val a = sgrp.select(col("score").as("s1"), col("pos").as("p1"),
          col("neg").as("n1"))
        val b = sgrp.select(col("score").as("s2"), col("neg").as("n2"))
        val u2 = a.join(b, col("s2") < col("s1"), "left")
          .groupBy(col("s1"), col("p1"), col("n1"))
          .agg(coalesce(sum(col("n2")), lit(0L)).as("cumneg"))
          .agg(sum(col("p1").cast(D) * (col("cumneg") * 2 + col("n1")))
            .as("u2"))
        val tot = sgrp.agg(sum(col("pos")).as("n_pos"),
          sum(col("neg")).as("n_neg"))
        tot.crossJoin(broadcast(u2))
          .select(col("n_pos"), col("n_neg"),
            col("u2").cast("long").as("u2"),
            expr("""CAST((u2 * 1000000)
                    div (cast(n_pos as decimal(38,0)) * n_neg * 2)
                    AS BIGINT)""").as("auc_ppm"))
          .select(col("*"),
            (col("auc_ppm") * 2 - 1000000L).as("gini_x_ppm"))
          .orderBy(col("n_pos"))
      },
      Some(s"""
        WITH $NbStageSql,
        rs AS (SELECT qb, y, score FROM scored WHERE flag = 'R'),
        pn AS (
          SELECT qb, y,
                 CAST(SUM(CASE WHEN actual = 'R' THEN n ELSE 0 END)
                   AS BIGINT) AS pos,
                 CAST(SUM(CASE WHEN actual <> 'R' THEN n ELSE 0 END)
                   AS BIGINT) AS neg
          FROM test_cells GROUP BY 1, 2),
        sg AS (
          SELECT r.score, CAST(SUM(p.pos) AS BIGINT) AS pos,
                 CAST(SUM(p.neg) AS BIGINT) AS neg
          FROM pn p JOIN rs r ON r.qb = p.qb AND r.y = p.y
          GROUP BY 1),
        u AS (
          SELECT a.score, CAST(MIN(a.pos) AS BIGINT) AS p1,
                 CAST(MIN(a.neg) AS BIGINT) AS n1,
                 COALESCE(CAST(SUM(b.neg) AS BIGINT), 0) AS cumneg
          FROM sg a LEFT JOIN sg b ON b.score < a.score
          GROUP BY 1),
        uu AS (
          SELECT SUM(CAST(p1 AS HUGEINT) * (cumneg * 2 + n1)) AS u2
          FROM u),
        tot AS (SELECT CAST(SUM(pos) AS BIGINT) AS n_pos,
                       CAST(SUM(neg) AS BIGINT) AS n_neg
                FROM sg)
        SELECT t.n_pos, t.n_neg, CAST(u.u2 AS BIGINT) AS u2,
               CAST((u.u2 * 1000000)
                    // (CAST(t.n_pos AS HUGEINT) * t.n_neg * 2)
                    AS BIGINT) AS auc_ppm,
               CAST((u.u2 * 1000000)
                    // (CAST(t.n_pos AS HUGEINT) * t.n_neg * 2)
                    AS BIGINT) * 2 - 1000000 AS gini_x_ppm
        FROM uu u CROSS JOIN tot t
        ORDER BY t.n_pos""")),

    // Brier score + reliability bands of the q311 probabilities — the
    // CALIBRATION leg of the evaluation trio (accuracy q311, ranking
    // q313): are the model's probabilities themselves trustworthy?
    // Scores normalize to ppm probabilities per cell (one double ratio,
    // floored — deterministic both engines), and from there everything
    // is exact integers: multiclass Brier = Σ n·(p_ppm − 10⁶·[c=y])²
    // summed in DECIMAL(38,0) and emitted as mean micro-Brier
    // (÷10⁶ of the ppm² lattice), plus a 5-band reliability diagram
    // for the predicted-class probability: per confidence band,
    // predicted-probability mass vs observed hit rate — the two
    // columns a calibration plot draws. Third consumer of the
    // single-sourced nbStage. Scale: ≤66-cell arithmetic after the
    // stage's one test scan.
    QueryDef(
      "q314_brier_calibration",
      (s, dir) => {
        val D = org.apache.spark.sql.types.DecimalType(38, 0)
        val st = nbStage(s, dir)
        val denom = st.scored.groupBy(col("qb"), col("y"))
          .agg(sum(col("score")).as("z"))
        val probs = st.scored.join(broadcast(denom), Seq("qb", "y"))
          .select(col("qb"), col("y"), col("flag"),
            // FLOOR before the BIGINT cast on BOTH engines — a bare
            // double→BIGINT cast truncates on Spark but rounds on
            // DuckDB (the q116/q130 lesson).
            expr("CAST(FLOOR(score * 1000000.0 / z) AS BIGINT)")
              .as("p_ppm"))
        val joined = st.testCells
          .join(broadcast(probs), Seq("qb", "y"))
        val brier = joined
          .select(col("n"),
            (when(col("actual") === col("flag"), 1000000L).otherwise(0L)
              - col("p_ppm")).as("d"))
          .agg(sum(col("n")).as("n3"),
            sum(col("n").cast(D) * col("d") * col("d")).as("ss"))
          .select(expr("n3 div 3").as("n_test"),
            expr("CAST((ss div n3) div 1000000 AS BIGINT)")
              .as("brier_micro"))
        val top = probs
          .withColumn("inv",
            when(col("flag") === "A", 3L).when(col("flag") === "N", 2L)
              .otherwise(1L))
          .groupBy(col("qb"), col("y"))
          .agg(max(struct(col("p_ppm"), col("inv"), col("flag"))).as("m"))
          .select(col("qb"), col("y"), col("m.p_ppm").as("conf_ppm"),
            col("m.flag").as("predicted"))
        val bands = st.testCells.join(broadcast(top), Seq("qb", "y"))
          .groupBy(expr("conf_ppm div 20000").as("band"))
          .agg(sum(col("n")).as("n_band"),
            expr("""CAST(sum(cast(n as decimal(38,0)) * conf_ppm)
                    div sum(n) AS BIGINT)""").as("mean_conf_ppm"),
            expr("""CAST((sum(CASE WHEN actual = predicted THEN n
                               ELSE 0 END) * 1000000) div sum(n)
                    AS BIGINT)""").as("hit_rate_ppm"))
        bands.crossJoin(broadcast(brier))
          .select(col("band"), col("n_band"), col("mean_conf_ppm"),
            col("hit_rate_ppm"), col("n_test"), col("brier_micro"))
          .orderBy(col("band"))
      },
      Some(s"""
        WITH $NbStageSql,
        denom AS (
          SELECT qb, y, SUM(score) AS z FROM scored GROUP BY 1, 2),
        probs AS (
          SELECT s.qb, s.y, s.flag,
                 CAST(FLOOR(s.score * 1000000.0 / d.z) AS BIGINT) AS p_ppm
          FROM scored s JOIN denom d ON d.qb = s.qb AND d.y = s.y),
        joined AS (
          SELECT t.n,
                 (CASE WHEN t.actual = p.flag THEN 1000000 ELSE 0 END)
                   - p.p_ppm AS d
          FROM test_cells t JOIN probs p ON p.qb = t.qb AND p.y = t.y),
        brier AS (
          SELECT CAST((SUM(n) // 3) AS BIGINT) AS n_test,
                 CAST((SUM(CAST(n AS HUGEINT) * d * d) // SUM(n))
                      // 1000000 AS BIGINT) AS brier_micro
          FROM joined),
        top AS (
          SELECT qb, y, p_ppm AS conf_ppm, flag AS predicted FROM (
            SELECT qb, y, p_ppm, flag, row_number() OVER (
              PARTITION BY qb, y ORDER BY p_ppm DESC,
                CASE flag WHEN 'A' THEN 0 WHEN 'N' THEN 1 ELSE 2 END)
              AS rn
            FROM probs) WHERE rn = 1),
        bands AS (
          SELECT tp.conf_ppm // 20000 AS band,
                 CAST(SUM(t.n) AS BIGINT) AS n_band,
                 CAST(SUM(CAST(t.n AS HUGEINT) * tp.conf_ppm) // SUM(t.n)
                   AS BIGINT) AS mean_conf_ppm,
                 CAST((SUM(CASE WHEN t.actual = tp.predicted THEN t.n
                                ELSE 0 END) * 1000000) // SUM(t.n)
                   AS BIGINT) AS hit_rate_ppm
          FROM test_cells t JOIN top tp ON tp.qb = t.qb AND tp.y = t.y
          GROUP BY 1)
        SELECT b.band, b.n_band, b.mean_conf_ppm, b.hit_rate_ppm,
               br.n_test, br.brier_micro
        FROM bands b CROSS JOIN brier br
        ORDER BY b.band""")),

    // Average precision (step-wise PR-AUC) of the q311 scores — the
    // PRECISION-RECALL leg of the evaluation suite (accuracy q311,
    // ROC/ranking q313, calibration q314). ROC AUC is prevalence-blind;
    // under class imbalance the PR curve is what retrieval and
    // quality-filter pipelines actually tune. AP here is the step
    // integral Σ_g Δrecall_g · precision_g over distinct-score groups
    // ranked descending (the tie-safe form: a tied block contributes
    // its whole mass at end-of-block precision), on the exact integer
    // lattice: term_g = (pos_g · cumpos_g · 10⁶) div (cumpos_g +
    // cumneg_g) in DECIMAL(38,0), ap_ppm = (Σ term) div n_pos — no
    // float sums, deterministic both engines. Also emits the
    // random-classifier baseline (prevalence — AP's floor, unlike ROC's
    // fixed 0.5) and precision at the 50%-recall crossing. Scale: ≤66
    // score groups after the one test scan — constant-size triangular
    // arithmetic, same shape as q313.
    QueryDef(
      "q315_average_precision",
      (s, dir) => {
        val st = nbStage(s, dir)
        val rscore = st.scored.where(col("flag") === "R")
          .select(col("qb"), col("y"), col("score"))
        val pn = st.testCells.groupBy(col("qb"), col("y"))
          .agg(sum(when(col("actual") === "R", col("n")).otherwise(0L))
            .as("pos"),
            sum(when(col("actual") =!= "R", col("n")).otherwise(0L))
              .as("neg"))
        val sgrp = pn.join(rscore, Seq("qb", "y"))
          .groupBy(col("score"))
          .agg(sum(col("pos")).as("pos"), sum(col("neg")).as("neg"))
        val a = sgrp.select(col("score").as("s1"), col("pos").as("p1"),
          col("neg").as("n1"))
        val b = sgrp.select(col("score").as("s2"), col("pos").as("p2"),
          col("neg").as("n2"))
        val cum = a.join(b, col("s2") > col("s1"), "left")
          .groupBy(col("s1"), col("p1"), col("n1"))
          .agg(coalesce(sum(col("p2")), lit(0L)).as("hp"),
            coalesce(sum(col("n2")), lit(0L)).as("hn"))
          .select(col("s1"), col("p1"),
            (col("hp") + col("p1")).as("cumpos"),
            (col("hp") + col("p1") + col("hn") + col("n1")).as("d"))
        val tot = sgrp.agg(sum(col("pos")).as("n_pos"),
          sum(col("neg")).as("n_neg"))
        val terms = cum.crossJoin(broadcast(tot))
          .select(col("n_pos"), col("n_neg"), col("s1"), col("cumpos"),
            col("d"),
            expr("(cast(p1 as decimal(38,0)) * cumpos * 1000000) div d")
              .as("term"))
        val apRow = terms.groupBy(col("n_pos"), col("n_neg"))
          .agg(sum(col("term")).as("tsum"))
          .select(col("n_pos"), col("n_neg"),
            expr("cast(tsum div cast(n_pos as decimal(38,0)) as bigint)")
              .as("ap_ppm"),
            expr("""cast((cast(n_pos as decimal(38,0)) * 1000000)
                    div (n_pos + n_neg) as bigint)""")
              .as("prevalence_ppm"))
        val r50 = terms.where(col("cumpos") * 2 >= col("n_pos"))
          .orderBy(col("s1").desc).limit(1)
          .select(expr(
            "cast((cast(cumpos as decimal(38,0)) * 1000000) div d as bigint)")
            .as("prec_at_r50_ppm"))
        apRow.crossJoin(broadcast(r50)).orderBy(col("n_pos"))
      },
      Some(s"""
        WITH $NbStageSql,
        rs AS (SELECT qb, y, score FROM scored WHERE flag = 'R'),
        pn AS (
          SELECT qb, y,
                 CAST(SUM(CASE WHEN actual = 'R' THEN n ELSE 0 END)
                   AS BIGINT) AS pos,
                 CAST(SUM(CASE WHEN actual <> 'R' THEN n ELSE 0 END)
                   AS BIGINT) AS neg
          FROM test_cells GROUP BY 1, 2),
        sg AS (
          SELECT r.score, CAST(SUM(p.pos) AS BIGINT) AS pos,
                 CAST(SUM(p.neg) AS BIGINT) AS neg
          FROM pn p JOIN rs r ON r.qb = p.qb AND r.y = p.y
          GROUP BY 1),
        cum AS (
          SELECT a.score AS s1, CAST(MIN(a.pos) AS BIGINT) AS p1,
                 COALESCE(CAST(SUM(b.pos) AS BIGINT), 0) + MIN(a.pos)
                   AS cumpos,
                 COALESCE(CAST(SUM(b.pos) AS BIGINT), 0) + MIN(a.pos)
                   + COALESCE(CAST(SUM(b.neg) AS BIGINT), 0) + MIN(a.neg)
                   AS d
          FROM sg a LEFT JOIN sg b ON b.score > a.score
          GROUP BY 1),
        tot AS (SELECT CAST(SUM(pos) AS BIGINT) AS n_pos,
                       CAST(SUM(neg) AS BIGINT) AS n_neg
                FROM sg),
        terms AS (
          SELECT t.n_pos, t.n_neg, c.s1, c.cumpos, c.d,
                 (CAST(c.p1 AS HUGEINT) * c.cumpos * 1000000) // c.d
                   AS term
          FROM cum c CROSS JOIN tot t),
        aprow AS (
          SELECT n_pos, n_neg,
                 CAST(SUM(term) // n_pos AS BIGINT) AS ap_ppm,
                 CAST((CAST(n_pos AS HUGEINT) * 1000000)
                      // (n_pos + n_neg) AS BIGINT) AS prevalence_ppm
          FROM terms GROUP BY 1, 2),
        r50 AS (
          SELECT CAST((CAST(cumpos AS HUGEINT) * 1000000) // d AS BIGINT)
                   AS prec_at_r50_ppm
          FROM terms WHERE cumpos * 2 >= n_pos
          ORDER BY s1 DESC LIMIT 1)
        SELECT a.n_pos, a.n_neg, a.ap_ppm, a.prevalence_ppm,
               r.prec_at_r50_ppm
        FROM aprow a CROSS JOIN r50 r
        ORDER BY a.n_pos""")),

    // Bivariate Mahalanobis outlier cells — the MULTIVARIATE member of
    // the outlier family (q105/q194/q223 are univariate): a (quantity,
    // discount) pair can be unremarkable per-coordinate yet far from
    // the joint distribution once the covariance tilts the metric.
    // Exact integer moments (n, Sx, Sy, Sxx, Syy, Sxy) come off the
    // shared qdJointCounts lattice, then ONE fixed-order IEEE closed
    // form (the q168 REGR stance: identical op order on both engines →
    // bit-identical doubles): covariance entries, determinant, and
    // md² = (vyy·dx² − 2·vxy·dx·dy + vxx·dy²)/det per cell, flagging
    // md² > 4.5 (χ²₂ ≈ 90th pct — the synthetic joint is near-uniform,
    // so its bounded tail tops out near md² ≈ 6; a 99th-pct cut would
    // gate an empty set). All double literals are cast on both
    // sides (DuckDB bare 2.0 is DECIMAL). Scale: the corpus collapses
    // to ≤550 cells in one partial-aggregated scan; moments and the
    // md² sweep are constant-size arithmetic.
    QueryDef(
      "q324_mahalanobis_outliers",
      (s, dir) => {
        val cells = qdJointCounts(s, dir).cutLineage()
        val mom = cells.groupBy(col("flag")).agg(
          sum(col("cnt")).as("n"),
          sum(col("x") * col("cnt")).as("sx"),
          sum(col("y") * col("cnt")).as("sy"),
          sum(col("x") * col("x") * col("cnt")).as("sxx"),
          sum(col("y") * col("y") * col("cnt")).as("syy"),
          sum(col("x") * col("y") * col("cnt")).as("sxy"))
        cells.join(broadcast(mom), Seq("flag"))
          .withColumn("mx",
            col("sx").cast("double") / col("n").cast("double"))
          .withColumn("my",
            col("sy").cast("double") / col("n").cast("double"))
          .withColumn("vxx",
            col("sxx").cast("double") / col("n").cast("double")
              - col("mx") * col("mx"))
          .withColumn("vyy",
            col("syy").cast("double") / col("n").cast("double")
              - col("my") * col("my"))
          .withColumn("vxy",
            col("sxy").cast("double") / col("n").cast("double")
              - col("mx") * col("my"))
          .withColumn("det",
            col("vxx") * col("vyy") - col("vxy") * col("vxy"))
          .withColumn("dx", col("x").cast("double") - col("mx"))
          .withColumn("dy", col("y").cast("double") - col("my"))
          .withColumn("md2",
            (col("vyy") * col("dx") * col("dx")
              - lit(2.0d) * col("vxy") * col("dx") * col("dy")
              + col("vxx") * col("dy") * col("dy")) / col("det"))
          .where(col("md2") > lit(4.5d))
          .select(col("flag"), col("x"), col("y"), col("cnt"), col("md2"))
          .orderBy(col("flag"), col("x"), col("y"))
      },
      Some(s"""
        WITH $QdJointSql,
        mom AS (
          SELECT flag, CAST(SUM(cnt) AS BIGINT) AS n,
                 CAST(SUM(x * cnt) AS BIGINT) AS sx,
                 CAST(SUM(y * cnt) AS BIGINT) AS sy,
                 CAST(SUM(x * x * cnt) AS BIGINT) AS sxx,
                 CAST(SUM(y * y * cnt) AS BIGINT) AS syy,
                 CAST(SUM(x * y * cnt) AS BIGINT) AS sxy
          FROM joint GROUP BY 1),
        md AS (
          SELECT j.flag, j.x, j.y, j.cnt,
                 CAST(m.sx AS DOUBLE) / CAST(m.n AS DOUBLE) AS mx,
                 CAST(m.sy AS DOUBLE) / CAST(m.n AS DOUBLE) AS my,
                 CAST(m.sxx AS DOUBLE) / CAST(m.n AS DOUBLE)
                   - (CAST(m.sx AS DOUBLE) / CAST(m.n AS DOUBLE))
                     * (CAST(m.sx AS DOUBLE) / CAST(m.n AS DOUBLE)) AS vxx,
                 CAST(m.syy AS DOUBLE) / CAST(m.n AS DOUBLE)
                   - (CAST(m.sy AS DOUBLE) / CAST(m.n AS DOUBLE))
                     * (CAST(m.sy AS DOUBLE) / CAST(m.n AS DOUBLE)) AS vyy,
                 CAST(m.sxy AS DOUBLE) / CAST(m.n AS DOUBLE)
                   - (CAST(m.sx AS DOUBLE) / CAST(m.n AS DOUBLE))
                     * (CAST(m.sy AS DOUBLE) / CAST(m.n AS DOUBLE)) AS vxy
          FROM joint j JOIN mom m ON m.flag = j.flag),
        scored AS (
          SELECT flag, x, y, cnt,
                 (vyy * (CAST(x AS DOUBLE) - mx) * (CAST(x AS DOUBLE) - mx)
                  - CAST(2 AS DOUBLE) * vxy * (CAST(x AS DOUBLE) - mx)
                    * (CAST(y AS DOUBLE) - my)
                  + vxx * (CAST(y AS DOUBLE) - my) * (CAST(y AS DOUBLE) - my))
                 / (vxx * vyy - vxy * vxy) AS md2
          FROM md)
        SELECT flag, x, y, cnt, md2
        FROM scored WHERE md2 > CAST(4.5 AS DOUBLE)
        ORDER BY flag, x, y""")),

    // Cliff's delta + Vargha-Delaney A — the EFFECT-SIZE companion to
    // the Mann-Whitney test (q191 says whether two groups differ;
    // these say by HOW MUCH, on the same rank scale): δ = P(Xa>Xb) −
    // P(Xa<Xb), A = P(Xa>Xb) + ½P(Xa=Xb). Both are exact rationals
    // over the bounded quantity marginal, so the dominance counts are
    // cell-product sums in DECIMAL(38,0) (≤50×50 cell pairs per flag
    // pair) and the ppm divisions are |·|-split for Spark-div/DuckDB-//
    // agreement on negative δ. Scale: one partial-aggregated marginal
    // off the shared qdJointCounts lattice; everything after is
    // constant-size.
    QueryDef(
      "q325_cliffs_delta",
      (s, dir) => {
        val marg = qdJointCounts(s, dir)
          .groupBy(col("flag"), col("x")).agg(sum(col("cnt")).as("c"))
          .cutLineage()
        val tot = marg.groupBy(col("flag")).agg(sum(col("c")).as("n"))
        val pairs = marg.as("a").join(marg.as("b"),
            col("a.flag") < col("b.flag"))
          .groupBy(col("a.flag").as("flag_a"), col("b.flag").as("flag_b"))
          .agg(
            sum(when(col("a.x") > col("b.x"),
              expr("cast(a.c as decimal(38,0)) * b.c")).otherwise(lit(0)))
              .as("gt"),
            sum(when(col("a.x") < col("b.x"),
              expr("cast(a.c as decimal(38,0)) * b.c")).otherwise(lit(0)))
              .as("lt"),
            sum(when(col("a.x") === col("b.x"),
              expr("cast(a.c as decimal(38,0)) * b.c")).otherwise(lit(0)))
              .as("ties"))
        pairs
          .join(broadcast(tot.select(col("flag").as("flag_a"),
            col("n").as("n_a"))), Seq("flag_a"))
          .join(broadcast(tot.select(col("flag").as("flag_b"),
            col("n").as("n_b"))), Seq("flag_b"))
          .select(col("flag_a"), col("flag_b"), col("n_a"), col("n_b"),
            expr("""cast(case when gt - lt < 0
                    then -(((lt - gt) * 1000000)
                           div (cast(n_a as decimal(38,0)) * n_b))
                    else ((gt - lt) * 1000000)
                         div (cast(n_a as decimal(38,0)) * n_b) end
                    as bigint)""").as("delta_ppm"),
            expr("""cast(((gt * 2 + ties) * 1000000)
                    div (cast(n_a as decimal(38,0)) * n_b * 2)
                    as bigint)""").as("vda_ppm"))
          .orderBy(col("flag_a"), col("flag_b"))
      },
      Some(s"""
        WITH $QdJointSql,
        marg AS (
          SELECT flag, x, CAST(SUM(cnt) AS BIGINT) AS c
          FROM joint GROUP BY 1, 2),
        tot AS (SELECT flag, CAST(SUM(c) AS BIGINT) AS n
                FROM marg GROUP BY 1),
        pr AS (
          SELECT a.flag AS flag_a, b.flag AS flag_b,
                 SUM(CASE WHEN a.x > b.x
                     THEN CAST(a.c AS HUGEINT) * b.c ELSE 0 END) AS gt,
                 SUM(CASE WHEN a.x < b.x
                     THEN CAST(a.c AS HUGEINT) * b.c ELSE 0 END) AS lt,
                 SUM(CASE WHEN a.x = b.x
                     THEN CAST(a.c AS HUGEINT) * b.c ELSE 0 END) AS ties
          FROM marg a JOIN marg b ON a.flag < b.flag
          GROUP BY 1, 2)
        SELECT p.flag_a, p.flag_b, ta.n AS n_a, tb.n AS n_b,
               CAST(CASE WHEN p.gt - p.lt < 0
                    THEN -(((p.lt - p.gt) * 1000000)
                           // (CAST(ta.n AS HUGEINT) * tb.n))
                    ELSE ((p.gt - p.lt) * 1000000)
                         // (CAST(ta.n AS HUGEINT) * tb.n) END AS BIGINT)
                 AS delta_ppm,
               CAST(((p.gt * 2 + p.ties) * 1000000)
                    // (CAST(ta.n AS HUGEINT) * tb.n * 2) AS BIGINT)
                 AS vda_ppm
        FROM pr p
        JOIN tot ta ON ta.flag = p.flag_a
        JOIN tot tb ON tb.flag = p.flag_b
        ORDER BY p.flag_a, p.flag_b""")),

    // Cochran-Armitage trend test — "does the outcome rate RISE with an
    // ordered dose?" — the 2×k companion of the Mantel-Haenszel (q318)
    // and χ² (q185) gates; THE test for monotone dose-response over
    // ordinal exposure bands. Dose = the order-priority digit (1..5, a
    // fixed value domain); outcome = the order has ≥1 returned line.
    // From the 5-cell lattice (n_i, d_i): A = Σi·d_i, B = Σi·n_i,
    // C = Σi²·n_i, D = Σd_i, and z² = n(nA−DB)² / (D(n−D)(nC−B²)).
    // The α=0.05 verdict is the cross-multiplied integer predicate
    // 10⁴·n·(nA−DB)² > 38415·D(n−D)(nC−B²) on DECIMAL(38,0) — no
    // division, no doubles; positive-definite denominators, and the
    // signed factor (nA−DB) only ever enters SQUARED, so div/floor
    // divergence can't arise. The exact squared lane holds to n ≈ 3·10⁷
    // units; past that, rescale the moments to the ppm lattice first
    // (the q306 shape). Scale: outcome flags partial-aggregate on the
    // orderkey, the dose rollup is 5 cells, the verdict is 1-row math.
    QueryDef(
      "q336_cochran_armitage",
      (s, dir) => {
        val returned = Tables.lineitem(s, dir)
          .where(col("l_returnflag") === "R")
          .select(col("l_orderkey")).distinct()
          .withColumn("ret", lit(1L))
        val doses = Tables.orders(s, dir)
          .select(col("o_orderkey"),
            expr("CAST(substring(o_orderpriority, 1, 1) AS BIGINT)")
              .as("dose"))
          .join(returned, col("o_orderkey") === col("l_orderkey"), "left")
          .select(col("dose"), coalesce(col("ret"), lit(0L)).as("y"))
        val cells = doses.groupBy(col("dose"))
          .agg(count(lit(1)).as("n_i"), sum(col("y")).as("d_i"))
          .cutLineage()
        val mom = cells.agg(
          sum(col("n_i")).as("n"), sum(col("d_i")).as("d"),
          sum(col("dose") * col("d_i")).as("a"),
          sum(col("dose") * col("n_i")).as("b"),
          sum(col("dose") * col("dose") * col("n_i")).as("c"))
        val verdict = mom.select(col("n"), col("d"), col("a"), col("b"),
          col("c"),
          (expr("cast(n as decimal(38,0)) * a - cast(d as decimal(38,0)) * b")
            > 0).as("trend_up"),
          (expr("""(cast(n as decimal(38,0))
                   * (cast(n as decimal(38,0)) * a
                      - cast(d as decimal(38,0)) * b)
                   * (cast(n as decimal(38,0)) * a
                      - cast(d as decimal(38,0)) * b)) * 10000""")
            > expr("""cast(d as decimal(38,0)) * (n - d)
                      * (cast(n as decimal(38,0)) * c
                         - cast(b as decimal(38,0)) * b) * 38415"""))
            .as("trend_significant"))
        cells.crossJoin(broadcast(verdict))
          .select(col("dose"), col("n_i"), col("d_i"), col("n"), col("d"),
            col("a"), col("b"), col("c"), col("trend_up"),
            col("trend_significant"))
          .orderBy(col("dose"))
      },
      Some("""
        WITH ret AS (
          SELECT DISTINCT l_orderkey, 1::BIGINT AS ret
          FROM lineitem WHERE l_returnflag = 'R'),
        doses AS (
          SELECT CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS dose,
                 COALESCE(r.ret, 0) AS y
          FROM orders o LEFT JOIN ret r ON o.o_orderkey = r.l_orderkey),
        cells AS (
          SELECT dose, CAST(COUNT(*) AS BIGINT) AS n_i,
                 CAST(SUM(y) AS BIGINT) AS d_i
          FROM doses GROUP BY 1),
        mom AS (
          SELECT CAST(SUM(n_i) AS BIGINT) AS n,
                 CAST(SUM(d_i) AS BIGINT) AS d,
                 CAST(SUM(dose * d_i) AS BIGINT) AS a,
                 CAST(SUM(dose * n_i) AS BIGINT) AS b,
                 CAST(SUM(dose * dose * n_i) AS BIGINT) AS c
          FROM cells),
        verdict AS (
          SELECT n, d, a, b, c,
                 CAST(n AS HUGEINT) * a - CAST(d AS HUGEINT) * b > 0
                   AS trend_up,
                 (CAST(n AS HUGEINT)
                  * (CAST(n AS HUGEINT) * a - CAST(d AS HUGEINT) * b)
                  * (CAST(n AS HUGEINT) * a - CAST(d AS HUGEINT) * b))
                  * 10000
                 > CAST(d AS HUGEINT) * (n - d)
                   * (CAST(n AS HUGEINT) * c - CAST(b AS HUGEINT) * b)
                   * 38415 AS trend_significant
          FROM mom)
        SELECT c.dose, c.n_i, c.d_i, v.n, v.d, v.a, v.b, v.c,
               v.trend_up, v.trend_significant
        FROM cells c CROSS JOIN verdict v
        ORDER BY c.dose""")),

    // AMS F₂ sketch (Alon-Matias-Szegedy second frequency moment) — the
    // self-join-size / repeat-rate estimator that completes the sketch
    // shelf (HLL counts distincts = F₀, CMS points, KMV samples; F₂ is
    // Σf² — what a join planner needs for |R ⋈ R| and a skew monitor
    // for "how repeated is this key?"). Sixteen ±1 sign estimators from
    // the md5 lattice (sign_i(v) = parity of md5("ams:i:v")), each
    // X_i = (Σ_rows sign_i)² an unbiased F₂ estimate; the committed
    // estimate is the MEDIAN-OF-MEANS over 4 groups of 4 (rank pick on
    // a 4-row frame — the textbook variance-then-tail reduction). The
    // stream fans out ×16 into flat codegen'd projections (no HOF
    // md5 — the q46 lesson) and collapses via map-side partials to 16
    // rows; the exact F₂ audit is one key rollup. Signed sums fit
    // int64 to ~3·10⁹ rows/shard; beyond that the per-shard sketches
    // merge by vector addition (linear — the whole point of AMS).
    QueryDef(
      "q354_ams_f2",
      (s, dir) => {
        import graft.functions.Kernels.{md5Bits, md5BitsModK}
        // 16 md5s per input row on a ~3-split scan serializes the sketch
        // build on 3 of 32 cores — fan the pruned scan out first
        // (Skew.fanOutRead, no-op on a well-split production table).
        val v = graft.operators.Skew.fanOutRead(
          Tables.lineitem(s, dir).select(col("l_partkey").as("v")))
        val est = v.select(col("v"),
            explode(expr("sequence(0, 15)")).as("i"))
          .select(col("i").cast("long").as("i"),
            (md5BitsModK(md5Bits(concat(lit("ams:"), col("i").cast("string"),
              lit(":"), col("v").cast("string"))), 2L) * 2L - 1L).as("sg"))
          .groupBy(col("i")).agg(sum(col("sg")).as("ssum"))
          .select(col("i"), expr("i div 4").as("g"),
            (col("ssum") * col("ssum")).as("x"))
          .groupBy(col("g")).agg(expr("sum(x) div 4").as("gmean"))
        val mid = est
          .withColumn("rn", row_number().over(
            Window.orderBy(col("gmean"), col("g"))).cast("long"))
          .where(col("rn") === 2L) // lower median of the 4 group means
          .select(col("gmean").as("ams_est"))
        val exact = v.groupBy(col("v")).agg(count(lit(1)).as("f"))
          .agg(sum(col("f") * col("f")).as("f2_exact"),
            sum(col("f")).as("n_rows"))
        exact.crossJoin(broadcast(mid))
          .withColumn("ratio_ppm", expr(
            """cast((cast(ams_est as decimal(38,0)) * 1000000)
               div f2_exact as bigint)"""))
          .select(col("n_rows"), col("f2_exact"), col("ams_est"),
            col("ratio_ppm"),
            col("ratio_ppm").between(250000L, 4000000L).as("within_bound"))
      },
      Some("""
        WITH v AS (SELECT l_partkey AS v FROM lineitem),
        e AS (
          SELECT i.i,
                 CAST(md5_number_lower('ams:' || i.i || ':' || v.v) % 2
                   AS BIGINT) * 2 - 1 AS sg
          FROM v, (SELECT unnest(range(0, 16)) AS i) i),
        sums AS (
          SELECT i, CAST(SUM(sg) AS BIGINT) AS ssum
          FROM e GROUP BY 1),
        grp AS (
          SELECT i // 4 AS g,
                 CAST(SUM(ssum * ssum) // 4 AS BIGINT) AS gmean
          FROM sums GROUP BY 1),
        mid AS (
          SELECT gmean AS ams_est FROM (
            SELECT gmean,
                   CAST(row_number() OVER (ORDER BY gmean, g) AS BIGINT)
                     AS rn
            FROM grp)
          WHERE rn = 2),
        exact AS (
          SELECT CAST(SUM(f * f) AS BIGINT) AS f2_exact,
                 CAST(SUM(f) AS BIGINT) AS n_rows
          FROM (SELECT v, CAST(COUNT(*) AS BIGINT) AS f
                FROM v GROUP BY 1))
        SELECT e.n_rows, e.f2_exact, m.ams_est,
               CAST((CAST(m.ams_est AS HUGEINT) * 1000000) // e.f2_exact
                 AS BIGINT) AS ratio_ppm,
               CAST((CAST(m.ams_est AS HUGEINT) * 1000000) // e.f2_exact
                 AS BIGINT) BETWEEN 250000 AND 4000000 AS within_bound
        FROM exact e CROSS JOIN mid m""")),

    // Friedman test — the REPEATED-MEASURES companion of q356's
    // Kruskal-Wallis: blocks (order months) remove the between-month
    // revenue trend before asking whether the five order priorities
    // differ, exactly the design a metrics team needs when every
    // treatment is observed in every period (k correlated samples —
    // KW's independence assumption is violated, Friedman's within-block
    // ranking is not). Blocks = calendar months with ALL five
    // priorities present (complete blocks only — the test's
    // requirement); within each 5-row block the priority's revenue sum
    // takes the DOUBLED midrank 2·cntlt+cnteq+1 (the q191/q356 integer
    // tie lattice, here over a 5-row keyed window — bounded frames
    // only). χ²_F = ΣR_j²/(10·n) − 18·n for k=5 (from the doubled-rank
    // sums: 12/(n·k(k+1))·Σ(R2_j/2)² − 3n(k+1)), one spelled-out double
    // expression from int64-exact operands; verdict vs
    // χ²₀.₉₅(df=4) = 9.487729036781154, has_ties gated alongside (the
    // cents lattice makes block-internal ties measure-zero). Scale:
    // the corpus collapses at the (month, priority) rollup — blocks
    // are calendar-bounded, so everything after the first partial agg
    // is flat in data volume.
    QueryDef(
      "q361_friedman",
      (s, dir) => {
        val gs = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
          "5-LOW")
        val cell = Tables.orders(s, dir)
          .groupBy(
            (year(col("o_orderdate")) * 100 + month(col("o_orderdate")))
              .cast("long").as("mkey"),
            col("o_orderpriority").as("g"))
          .agg(sum((col("o_totalprice")
              .cast(org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
            .cast("long")).as("v"))
        val comp = cell.groupBy(col("mkey"))
          .agg(count(lit(1)).as("kc"))
          .where(col("kc") === 5).select(col("mkey"))
        val wlt = Window.partitionBy(col("mkey")).orderBy(col("v"))
          .rangeBetween(Window.unboundedPreceding, -1)
        val weq = Window.partitionBy(col("mkey")).orderBy(col("v"))
          .rangeBetween(0, 0)
        val ranked = cell.join(broadcast(comp), Seq("mkey"))
          .withColumn("cntlt", count(lit(1)).over(wlt).cast("long"))
          .withColumn("cnteq", count(lit(1)).over(weq).cast("long"))
          .withColumn("r2", col("cntlt") * 2 + col("cnteq") + 1)
        val aggCols =
          countDistinct(col("mkey")).as("n_blocks") +:
            gs.zipWithIndex.map { case (p, i) =>
              sum(when(col("g") === p, col("r2")).otherwise(0L))
                .as(s"r2_${i + 1}")
            } :+
            sum(when(col("cnteq") > 1, 1L).otherwise(0L)).as("n_tied_cells")
        ranked.groupBy().agg(aggCols.head, aggCols.tail: _*)
          .withColumn("s2", expr(
            "r2_1*r2_1 + r2_2*r2_2 + r2_3*r2_3 + r2_4*r2_4 + r2_5*r2_5"))
          .withColumn("chi2", expr(
            """cast(s2 as double) / (10.0 * cast(n_blocks as double))
               - 18.0 * cast(n_blocks as double)"""))
          .select(col("n_blocks"), col("r2_1"), col("r2_2"), col("r2_3"),
            col("r2_4"), col("r2_5"), col("n_tied_cells"), col("s2"),
            col("chi2"),
            (col("chi2") > 9.487729036781154).as("significant"))
      },
      Some("""
        WITH cell AS (
          SELECT CAST(year(o_orderdate)*100 + month(o_orderdate) AS BIGINT)
                   AS mkey,
                 o_orderpriority AS g,
                 CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2))*100
                   AS BIGINT)) AS BIGINT) AS v
          FROM orders GROUP BY 1, 2),
        comp AS (SELECT mkey FROM cell GROUP BY 1 HAVING COUNT(*) = 5),
        ranked AS (
          SELECT c.g,  c.mkey,
                 CAST(COUNT(*) OVER (PARTITION BY c.mkey ORDER BY c.v
                   RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS BIGINT) AS cntlt,
                 CAST(COUNT(*) OVER (PARTITION BY c.mkey ORDER BY c.v
                   RANGE BETWEEN CURRENT ROW AND CURRENT ROW)
                   AS BIGINT) AS cnteq
          FROM cell c JOIN comp USING (mkey)),
        agg AS (
          SELECT CAST(COUNT(DISTINCT mkey) AS BIGINT) AS n_blocks,
                 CAST(SUM(CASE WHEN g='1-URGENT'
                   THEN 2*cntlt+cnteq+1 ELSE 0 END) AS BIGINT) AS r2_1,
                 CAST(SUM(CASE WHEN g='2-HIGH'
                   THEN 2*cntlt+cnteq+1 ELSE 0 END) AS BIGINT) AS r2_2,
                 CAST(SUM(CASE WHEN g='3-MEDIUM'
                   THEN 2*cntlt+cnteq+1 ELSE 0 END) AS BIGINT) AS r2_3,
                 CAST(SUM(CASE WHEN g='4-NOT SPECIFIED'
                   THEN 2*cntlt+cnteq+1 ELSE 0 END) AS BIGINT) AS r2_4,
                 CAST(SUM(CASE WHEN g='5-LOW'
                   THEN 2*cntlt+cnteq+1 ELSE 0 END) AS BIGINT) AS r2_5,
                 CAST(SUM(CASE WHEN cnteq > 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_tied_cells
          FROM ranked),
        st AS (
          SELECT *,
                 CAST(r2_1*r2_1 + r2_2*r2_2 + r2_3*r2_3 + r2_4*r2_4
                      + r2_5*r2_5 AS BIGINT) AS s2
          FROM agg)
        SELECT n_blocks, r2_1, r2_2, r2_3, r2_4, r2_5, n_tied_cells, s2,
               CAST(s2 AS DOUBLE) / (10.0 * CAST(n_blocks AS DOUBLE))
                 - 18.0 * CAST(n_blocks AS DOUBLE) AS chi2,
               (CAST(s2 AS DOUBLE) / (10.0 * CAST(n_blocks AS DOUBLE))
                 - 18.0 * CAST(n_blocks AS DOUBLE)) > 9.487729036781154
                 AS significant
        FROM st""")),

    // Page's trend test — the ORDERED alternative on q361's blocked
    // design (the within-block cousin of q364: Friedman asks "do the
    // priorities differ", Page asks "do their ranks INCREASE in the
    // stated order", the right test when the treatments carry a natural
    // ordering). L = Σ_j j·R_j on the identical doubled-midrank
    // lattice: L2 = Σ_j j·R2_j, exact null moments E[L2] = n·k(k+1)²/2
    // (= 90n at k=5) and Var[L2] = 4·Var[L] = n·k²(k+1)(k²−1)/36
    // (= 100n at k=5, no-ties form — block-internal ties are
    // measure-zero on the cents lattice and q361 gates has_ties
    // alongside), so z² = (L2−90n)²/(100n) is a pure integer ratio
    // emitted in ppm, verdict vs χ²₀.₉₅(1). Scale: identical to q361 —
    // the corpus collapses at the (month, priority) rollup.
    QueryDef(
      "q367_page_trend",
      (s, dir) => {
        val gs = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
          "5-LOW")
        val cell = Tables.orders(s, dir)
          .groupBy(
            (year(col("o_orderdate")) * 100 + month(col("o_orderdate")))
              .cast("long").as("mkey"),
            col("o_orderpriority").as("g"))
          .agg(sum((col("o_totalprice")
              .cast(org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
            .cast("long")).as("v"))
        val comp = cell.groupBy(col("mkey"))
          .agg(count(lit(1)).as("kc"))
          .where(col("kc") === 5).select(col("mkey"))
        val wlt = Window.partitionBy(col("mkey")).orderBy(col("v"))
          .rangeBetween(Window.unboundedPreceding, -1)
        val weq = Window.partitionBy(col("mkey")).orderBy(col("v"))
          .rangeBetween(0, 0)
        val ranked = cell.join(broadcast(comp), Seq("mkey"))
          .withColumn("r2",
            count(lit(1)).over(wlt).cast("long") * 2
              + count(lit(1)).over(weq).cast("long") + 1)
          .withColumn("j",
            gs.zipWithIndex.foldLeft(lit(0L)) { case (acc, (p, i)) =>
              when(col("g") === p, lit(i + 1L)).otherwise(acc)
            })
        ranked.agg(countDistinct(col("mkey")).as("n_blocks"),
            sum(col("j") * col("r2")).as("l2"))
          .withColumn("e2", lit(90L) * col("n_blocks"))
          .withColumn("var2", lit(100L) * col("n_blocks"))
          .withColumn("z2_ppm", expr(
            "((l2 - e2) * (l2 - e2) * 1000000) div var2"))
          .select(col("n_blocks"), col("l2"), col("e2"), col("var2"),
            col("z2_ppm"),
            (col("z2_ppm") > 3841459L).as("trend_significant"))
      },
      Some("""
        WITH cell AS (
          SELECT CAST(year(o_orderdate)*100 + month(o_orderdate) AS BIGINT)
                   AS mkey,
                 o_orderpriority AS g,
                 CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2))*100
                   AS BIGINT)) AS BIGINT) AS v
          FROM orders GROUP BY 1, 2),
        comp AS (SELECT mkey FROM cell GROUP BY 1 HAVING COUNT(*) = 5),
        ranked AS (
          SELECT c.g, c.mkey,
                 CAST(COUNT(*) OVER (PARTITION BY c.mkey ORDER BY c.v
                   RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS BIGINT) * 2
                 + CAST(COUNT(*) OVER (PARTITION BY c.mkey ORDER BY c.v
                   RANGE BETWEEN CURRENT ROW AND CURRENT ROW)
                   AS BIGINT) + 1 AS r2,
                 CASE c.g WHEN '1-URGENT' THEN 1 WHEN '2-HIGH' THEN 2
                      WHEN '3-MEDIUM' THEN 3 WHEN '4-NOT SPECIFIED' THEN 4
                      ELSE 5 END AS j
          FROM cell c JOIN comp USING (mkey)),
        agg AS (
          SELECT CAST(COUNT(DISTINCT mkey) AS BIGINT) AS n_blocks,
                 CAST(SUM(j * r2) AS BIGINT) AS l2
          FROM ranked)
        SELECT n_blocks, l2, 90 * n_blocks AS e2, 100 * n_blocks AS var2,
               ((l2 - 90 * n_blocks) * (l2 - 90 * n_blocks) * 1000000)
                 // (100 * n_blocks) AS z2_ppm,
               ((l2 - 90 * n_blocks) * (l2 - 90 * n_blocks) * 1000000)
                 // (100 * n_blocks) > 3841459 AS trend_significant
        FROM agg""")),

    // Categorical-association suite on the priority × status contingency
    // table — the nominal-by-nominal measures the numeric correlation
    // family (q303/q304 Spearman/Kendall) cannot express, and the audit
    // a feature-selection pass runs before one-hot-encoding a column
    // pair: χ² independence (per-cell exact rational, floored in ppm —
    // error ≤ one ppm per cell, engine-identical), Cramér's V² =
    // χ²/(n·min(r−1,c−1)) (the [0,1] effect size; V itself needs a
    // √ and adds nothing the gate can't read off V²), and
    // Goodman-Kruskal λ in BOTH directions (proportional reduction in
    // MODAL prediction error — exact integer, no transcendentals
    // anywhere). Scale: the corpus collapses at the ≤15-cell
    // contingency rollup; everything after is constant-size.
    QueryDef(
      "q370_categorical_association",
      (s, dir) => {
        val ct = Tables.orders(s, dir)
          .groupBy(col("o_orderpriority").as("p"),
            col("o_orderstatus").as("st"))
          .agg(count(lit(1)).as("o"))
          .cutLineage()
        val rs = ct.groupBy(col("p")).agg(sum(col("o")).as("rsum"))
        val cs = ct.groupBy(col("st")).agg(sum(col("o")).as("csum"))
        val n = ct.agg(sum(col("o")).as("n"))
        val chi = ct.join(broadcast(rs), Seq("p"))
          .join(broadcast(cs), Seq("st"))
          .crossJoin(broadcast(n))
          .withColumn("cell_ppm", expr(
            """cast(((cast(o as decimal(38,0)) * n - cast(rsum as decimal(38,0)) * csum)
                     * (cast(o as decimal(38,0)) * n - cast(rsum as decimal(38,0)) * csum)
                     * 1000000)
                    div (cast(rsum as decimal(38,0)) * csum * n) as bigint)"""))
          .agg(sum(col("cell_ppm")).as("chi2_ppm"))
        val lamRow = ct.groupBy(col("p")).agg(max(col("o")).as("rmax"))
          .agg(sum(col("rmax")).as("sum_row_modes"))
        val lamCol = ct.groupBy(col("st")).agg(max(col("o")).as("cmax"))
          .agg(sum(col("cmax")).as("sum_col_modes"))
        val maxCol = cs.agg(max(col("csum")).as("max_csum"))
        val maxRow = rs.agg(max(col("rsum")).as("max_rsum"))
        chi.crossJoin(broadcast(n))
          .crossJoin(broadcast(lamRow)).crossJoin(broadcast(lamCol))
          .crossJoin(broadcast(maxCol)).crossJoin(broadcast(maxRow))
          .withColumn("v2_ppm", expr("chi2_ppm div (n * 2)"))
          .withColumn("lambda_status_given_priority_ppm", expr(
            """case when n = max_csum then 0
               else ((sum_row_modes - max_csum) * 1000000)
                    div (n - max_csum) end"""))
          .withColumn("lambda_priority_given_status_ppm", expr(
            """case when n = max_rsum then 0
               else ((sum_col_modes - max_rsum) * 1000000)
                    div (n - max_rsum) end"""))
          .select(col("n"), col("chi2_ppm"), col("v2_ppm"),
            (col("chi2_ppm") > lit(15507313L)).as("dependent"),
            col("sum_row_modes"), col("sum_col_modes"),
            col("lambda_status_given_priority_ppm"),
            col("lambda_priority_given_status_ppm"))
      },
      Some("""
        WITH ct AS MATERIALIZED (
          SELECT o_orderpriority AS p, o_orderstatus AS st,
                 CAST(COUNT(*) AS BIGINT) AS o
          FROM orders GROUP BY 1, 2),
        rs AS (SELECT p, CAST(SUM(o) AS BIGINT) AS rsum FROM ct GROUP BY 1),
        cs AS (SELECT st, CAST(SUM(o) AS BIGINT) AS csum FROM ct GROUP BY 1),
        nn AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM ct),
        chi AS (
          SELECT CAST(SUM(
            ((CAST(c.o AS HUGEINT) * nn.n - CAST(r.rsum AS HUGEINT) * cc.csum)
             * (CAST(c.o AS HUGEINT) * nn.n - CAST(r.rsum AS HUGEINT) * cc.csum)
             * 1000000)
            // (CAST(r.rsum AS HUGEINT) * cc.csum * nn.n)) AS BIGINT)
            AS chi2_ppm
          FROM ct c JOIN rs r ON r.p = c.p JOIN cs cc ON cc.st = c.st
          CROSS JOIN nn),
        lr AS (SELECT CAST(SUM(rmax) AS BIGINT) AS sum_row_modes
               FROM (SELECT p, MAX(o) AS rmax FROM ct GROUP BY 1)),
        lc AS (SELECT CAST(SUM(cmax) AS BIGINT) AS sum_col_modes
               FROM (SELECT st, MAX(o) AS cmax FROM ct GROUP BY 1)),
        mc AS (SELECT CAST(MAX(csum) AS BIGINT) AS max_csum FROM cs),
        mr AS (SELECT CAST(MAX(rsum) AS BIGINT) AS max_rsum FROM rs)
        SELECT nn.n, chi.chi2_ppm, chi.chi2_ppm // (nn.n * 2) AS v2_ppm,
               chi.chi2_ppm > 15507313 AS dependent,
               lr.sum_row_modes, lc.sum_col_modes,
               CASE WHEN nn.n = mc.max_csum THEN 0
                    ELSE ((lr.sum_row_modes - mc.max_csum) * 1000000)
                         // (nn.n - mc.max_csum) END
                 AS lambda_status_given_priority_ppm,
               CASE WHEN nn.n = mr.max_rsum THEN 0
                    ELSE ((lc.sum_col_modes - mr.max_rsum) * 1000000)
                         // (nn.n - mr.max_rsum) END
                 AS lambda_priority_given_status_ppm
        FROM chi CROSS JOIN nn CROSS JOIN lr CROSS JOIN lc
        CROSS JOIN mc CROSS JOIN mr""")),

    // One-pass Pearson correlation MATRIX over four lineitem measures
    // (quantity, extended-price cents, discount cents, tax cents) — the
    // multi-column generalization of q163's pairwise REGR family: ALL
    // 14 moments (4 sums + 10 cross-products) accumulate in ONE
    // partial-aggregable scan, which is the entire point at 100 TB — a
    // naive per-pair corr() call scans the table 6 times; this plan
    // scans once, and the 6 correlations fall out of a 1-row lattice.
    // Exactness: moments ride DECIMAL(38,0); the scaled covariance
    // operands (n·P_ij − S_i·S_j) are 2²⁰-shifted with the q327
    // truncate-toward-zero |·|-split so they re-enter int64's double-
    // exact window before the ONE float op per pair, r = num/√(dᵢ·dⱼ)
    // (bit-identical both engines; decimals > 2⁵³ would round
    // divergently — the q135 lesson). Scale: one scan, map-side
    // partials, constant-size everything after.
    QueryDef(
      "q371_correlation_matrix",
      (s, dir) => {
        val li = Tables.lineitem(s, dir).select(
          col("l_quantity").cast("long").as("x1"),
          expr("cast(cast(l_extendedprice as decimal(18,2)) * 100 as bigint)")
            .as("x2"),
          expr("cast(cast(l_discount as decimal(18,2)) * 100 as bigint)")
            .as("x3"),
          expr("cast(cast(l_tax as decimal(18,2)) * 100 as bigint)")
            .as("x4"))
        val pairsIdx = for { i <- 1 to 4; j <- i to 4 } yield (i, j)
        val aggs = count(lit(1)).as("n") +:
          (1 to 4).map(i => sum(col(s"x$i").cast(org.apache.spark.sql.types.DecimalType(38, 0)))
            .as(s"s$i")) ++:
          pairsIdx.map { case (i, j) =>
            sum((col(s"x$i").cast(org.apache.spark.sql.types.DecimalType(38, 0)) * col(s"x$j"))
              .cast(org.apache.spark.sql.types.DecimalType(38, 0))).as(s"p$i$j")
          }
        val m = li.agg(aggs.head, aggs.tail: _*)
        val shifted = (for { i <- 1 to 4; j <- i to 4 } yield (i, j))
          .foldLeft(m) { case (df, (i, j)) =>
            df.withColumn(s"m$i$j", expr(
              s"""case when cast(n as decimal(38,0)) * p$i$j - s$i * s$j < 0
                  then -cast((-(cast(n as decimal(38,0)) * p$i$j - s$i * s$j))
                             div 1048576 as bigint)
                  else cast((cast(n as decimal(38,0)) * p$i$j - s$i * s$j)
                            div 1048576 as bigint) end"""))
          }
        val names = Map(1 -> "quantity", 2 -> "extprice", 3 -> "discount",
          4 -> "tax")
        val rows = (for { i <- 1 to 4; j <- (i + 1) to 4 } yield (i, j))
          .map { case (i, j) =>
            struct(lit(names(i)).as("a"), lit(names(j)).as("b"),
              col(s"m$i$j").as("num_s"), col(s"m$i$i").as("den_a_s"),
              col(s"m$j$j").as("den_b_s"))
          }
        shifted.select(col("n"), explode(array(rows: _*)).as("pr"))
          .select(col("pr.a").as("a"), col("pr.b").as("b"), col("n"),
            col("pr.num_s").as("num_s"), col("pr.den_a_s").as("den_a_s"),
            col("pr.den_b_s").as("den_b_s"))
          .withColumn("r", expr(
            """case when den_a_s <= 0 or den_b_s <= 0 then 0.0d
               else cast(num_s as double)
                    / sqrt(cast(den_a_s as double) * cast(den_b_s as double))
               end"""))
          .orderBy(col("a"), col("b"))
      },
      Some("""
        WITH li AS (
          SELECT CAST(l_quantity AS BIGINT) AS x1,
                 CAST(CAST(l_extendedprice AS DECIMAL(18,2))*100 AS BIGINT)
                   AS x2,
                 CAST(CAST(l_discount AS DECIMAL(18,2))*100 AS BIGINT) AS x3,
                 CAST(CAST(l_tax AS DECIMAL(18,2))*100 AS BIGINT) AS x4
          FROM lineitem),
        m AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 SUM(CAST(x1 AS HUGEINT)) AS s1, SUM(CAST(x2 AS HUGEINT)) AS s2,
                 SUM(CAST(x3 AS HUGEINT)) AS s3, SUM(CAST(x4 AS HUGEINT)) AS s4,
                 SUM(CAST(x1 AS HUGEINT)*x1) AS p11, SUM(CAST(x1 AS HUGEINT)*x2) AS p12,
                 SUM(CAST(x1 AS HUGEINT)*x3) AS p13, SUM(CAST(x1 AS HUGEINT)*x4) AS p14,
                 SUM(CAST(x2 AS HUGEINT)*x2) AS p22, SUM(CAST(x2 AS HUGEINT)*x3) AS p23,
                 SUM(CAST(x2 AS HUGEINT)*x4) AS p24, SUM(CAST(x3 AS HUGEINT)*x3) AS p33,
                 SUM(CAST(x3 AS HUGEINT)*x4) AS p34, SUM(CAST(x4 AS HUGEINT)*x4) AS p44
          FROM li),
        sh AS (
          SELECT n,
            CAST(CASE WHEN n*p12 - s1*s2 < 0 THEN -((-(n*p12 - s1*s2)) // 1048576)
                 ELSE (n*p12 - s1*s2) // 1048576 END AS BIGINT) AS m12,
            CAST(CASE WHEN n*p13 - s1*s3 < 0 THEN -((-(n*p13 - s1*s3)) // 1048576)
                 ELSE (n*p13 - s1*s3) // 1048576 END AS BIGINT) AS m13,
            CAST(CASE WHEN n*p14 - s1*s4 < 0 THEN -((-(n*p14 - s1*s4)) // 1048576)
                 ELSE (n*p14 - s1*s4) // 1048576 END AS BIGINT) AS m14,
            CAST(CASE WHEN n*p23 - s2*s3 < 0 THEN -((-(n*p23 - s2*s3)) // 1048576)
                 ELSE (n*p23 - s2*s3) // 1048576 END AS BIGINT) AS m23,
            CAST(CASE WHEN n*p24 - s2*s4 < 0 THEN -((-(n*p24 - s2*s4)) // 1048576)
                 ELSE (n*p24 - s2*s4) // 1048576 END AS BIGINT) AS m24,
            CAST(CASE WHEN n*p34 - s3*s4 < 0 THEN -((-(n*p34 - s3*s4)) // 1048576)
                 ELSE (n*p34 - s3*s4) // 1048576 END AS BIGINT) AS m34,
            CAST((n*p11 - s1*s1) // 1048576 AS BIGINT) AS m11,
            CAST((n*p22 - s2*s2) // 1048576 AS BIGINT) AS m22,
            CAST((n*p33 - s3*s3) // 1048576 AS BIGINT) AS m33,
            CAST((n*p44 - s4*s4) // 1048576 AS BIGINT) AS m44
          FROM m),
        rows_ AS (
          SELECT 'quantity' AS a, 'extprice' AS b, n, m12 AS num_s,
                 m11 AS den_a_s, m22 AS den_b_s FROM sh
          UNION ALL SELECT 'quantity', 'discount', n, m13, m11, m33 FROM sh
          UNION ALL SELECT 'quantity', 'tax', n, m14, m11, m44 FROM sh
          UNION ALL SELECT 'extprice', 'discount', n, m23, m22, m33 FROM sh
          UNION ALL SELECT 'extprice', 'tax', n, m24, m22, m44 FROM sh
          UNION ALL SELECT 'discount', 'tax', n, m34, m33, m44 FROM sh)
        SELECT a, b, n, num_s, den_a_s, den_b_s,
               CASE WHEN den_a_s <= 0 OR den_b_s <= 0 THEN 0.0
                    ELSE CAST(num_s AS DOUBLE)
                         / sqrt(CAST(den_a_s AS DOUBLE)
                                * CAST(den_b_s AS DOUBLE)) END AS r
        FROM rows_
        ORDER BY a, b""")),

    // Cochran's Q — the BINARY-outcome member of the blocked-design
    // family (q361 Friedman ranks a continuous outcome, q367 Page
    // orders it; Q asks whether k binary treatments differ when every
    // block sees all k — the k-treatment generalization of McNemar).
    // Blocks = complete months, treatments = the five priorities,
    // binary outcome = "the cell's F-status rate exceeds the global
    // F rate" (cross-multiplied — no division enters the flag). The
    // statistic is pure integer: Q = (k−1)(k·ΣC_j² − T²)/(k·T − ΣR_i²)
    // from column successes C_j, row successes R_i, total T — emitted
    // in ppm, verdict vs χ²₀.₉₅(4) = 9.487729. Scale: the corpus
    // collapses at the (month, priority, status) rollup; blocks are
    // calendar-bounded so every later frame is constant-size.
    QueryDef(
      "q373_cochran_q",
      (s, dir) => {
        val cell = Tables.orders(s, dir)
          .groupBy(
            (year(col("o_orderdate")) * 100 + month(col("o_orderdate")))
              .cast("long").as("mkey"),
            col("o_orderpriority").as("g"))
          .agg(count(lit(1)).as("nc"),
            sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L))
              .as("fc"))
          .cutLineage()
        val glob = cell.agg(sum(col("nc")).as("ntot"), sum(col("fc")).as("nf"))
        val comp = cell.groupBy(col("mkey")).agg(count(lit(1)).as("kc"))
          .where(col("kc") === 5).select(col("mkey"))
        val x = cell.join(broadcast(comp), Seq("mkey"))
          .crossJoin(broadcast(glob))
          .withColumn("x", when(col("fc") * col("ntot") > col("nf") * col("nc"),
            1L).otherwise(0L))
          .select(col("mkey"), col("g"), col("x"))
          .cutLineage()
        val cj = x.groupBy(col("g")).agg(sum(col("x")).as("cjv"))
          .agg(sum(col("cjv") * col("cjv")).as("sum_cj2"),
            sum(col("cjv")).as("t"))
        val ri = x.groupBy(col("mkey")).agg(sum(col("x")).as("riv"))
          .agg(sum(col("riv") * col("riv")).as("sum_ri2"),
            count(lit(1)).as("n_blocks"))
        cj.crossJoin(broadcast(ri))
          .withColumn("qnum", expr("4 * (5 * sum_cj2 - t * t)"))
          .withColumn("qden", expr("5 * t - sum_ri2"))
          .withColumn("q_ppm", expr(
            """case when qden <= 0 then 0
               else (qnum * 1000000) div qden end"""))
          .select(col("n_blocks"), col("t"), col("sum_cj2"), col("sum_ri2"),
            col("q_ppm"), (col("q_ppm") > 9487729L).as("significant"))
      },
      Some("""
        WITH cell AS MATERIALIZED (
          SELECT CAST(year(o_orderdate)*100 + month(o_orderdate) AS BIGINT)
                   AS mkey,
                 o_orderpriority AS g,
                 CAST(COUNT(*) AS BIGINT) AS nc,
                 CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                   AS BIGINT) AS fc
          FROM orders GROUP BY 1, 2),
        gtot AS (SELECT CAST(SUM(nc) AS BIGINT) AS ntot,
                        CAST(SUM(fc) AS BIGINT) AS nf FROM cell),
        comp AS (SELECT mkey FROM cell GROUP BY 1 HAVING COUNT(*) = 5),
        x AS MATERIALIZED (
          SELECT c.mkey, c.g,
                 CASE WHEN c.fc * g2.ntot > g2.nf * c.nc THEN 1 ELSE 0 END
                   AS x
          FROM cell c JOIN comp USING (mkey) CROSS JOIN gtot g2),
        cj AS (
          SELECT CAST(SUM(cjv * cjv) AS BIGINT) AS sum_cj2,
                 CAST(SUM(cjv) AS BIGINT) AS t
          FROM (SELECT g, CAST(SUM(x) AS BIGINT) AS cjv FROM x GROUP BY 1)),
        ri AS (
          SELECT CAST(SUM(riv * riv) AS BIGINT) AS sum_ri2,
                 CAST(COUNT(*) AS BIGINT) AS n_blocks
          FROM (SELECT mkey, CAST(SUM(x) AS BIGINT) AS riv FROM x GROUP BY 1))
        SELECT ri.n_blocks, cj.t, cj.sum_cj2, ri.sum_ri2,
               CASE WHEN 5 * cj.t - ri.sum_ri2 <= 0 THEN 0
                    ELSE (4 * (5 * cj.sum_cj2 - cj.t * cj.t) * 1000000)
                         // (5 * cj.t - ri.sum_ri2) END AS q_ppm,
               CASE WHEN 5 * cj.t - ri.sum_ri2 <= 0 THEN 0
                    ELSE (4 * (5 * cj.sum_cj2 - cj.t * cj.t) * 1000000)
                         // (5 * cj.t - ri.sum_ri2) END > 9487729
                 AS significant
        FROM cj CROSS JOIN ri""")))

  /** Shared joint contingency table for the correlation gates (q303,
    * q304): per returnflag, quantity × discount-cents cell counts.
    * Both value domains are bounded (≤50 × ≤11), so ONE partial-
    * aggregated scan collapses the corpus to ≤550 cells per group and
    * every downstream rank/pair computation is constant-size. Discount
    * cents go through the DECIMAL(18,2) lane — a raw double*100 cast
    * truncates 0.03→2 on Spark while DuckDB rounds to 3. */
  private def qdJointCounts(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag").as("flag"),
        col("l_quantity").cast("long").as("x"),
        (col("l_discount")
          .cast(org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
          .cast("long").as("y"))
      .agg(count(lit(1)).as("cnt"))

  /** DuckDB twin of [[qdJointCounts]] — a `def` (not a post-`defs` val)
    * so oracle strings can interpolate it during `defs` init. */
  private def QdJointSql: String =
    """joint AS (
          SELECT l_returnflag AS flag,
                 CAST(l_quantity AS BIGINT) AS x,
                 CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS y,
                 CAST(COUNT(*) AS BIGINT) AS cnt
          FROM lineitem GROUP BY 1, 2, 3)"""

  /** Frames of the shared Naive-Bayes split/score stage (q311 gates the
    * classifier, q313 its ranking quality) — single-sourced so the
    * classifier and its evaluation metric cannot drift apart. */
  private final case class NbStage(
      testCells: org.apache.spark.sql.DataFrame,
      scored: org.apache.spark.sql.DataFrame)

  /** Shared q311/q313 stage: md5 80/20 split, Laplace-smoothed train
    * counts, and the per-(cell, class) fixed-order IEEE score on the
    * ≤66-cell (qb × y) grid. */
  private def nbStage(s: org.apache.spark.sql.SparkSession,
      dir: String): NbStage = {
    import graft.functions.Kernels.md5Lower64Lo32
    // one md5 per row on a ~3-split scan: fan the pruned scan out so
    // the split-hash projection runs at full width (no-op at scale)
    val base = graft.operators.Skew.fanOutRead(Tables.lineitem(s, dir)
        .select(col("l_returnflag"), col("l_quantity"), col("l_discount"),
          col("l_orderkey"), col("l_linenumber"), col("l_partkey")))
      .select(col("l_returnflag").as("flag"),
        expr("CAST(l_quantity AS BIGINT) div 10").as("qb"),
        (col("l_discount")
          .cast(org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
          .cast("long").as("y"),
        (pmod(md5Lower64Lo32(concat(lit("nb:"),
          col("l_orderkey").cast("string"), lit("-"),
          col("l_linenumber").cast("string"), lit("-"),
          col("l_partkey").cast("string"))), lit(5L)) === 0)
          .as("is_test"))
      .cutLineage()
    val train = base.where(!col("is_test"))
    val priors = train.groupBy(col("flag"))
      .agg(count(lit(1)).as("nc"))
    val c1 = train.groupBy(col("flag"), col("qb"))
      .agg(count(lit(1)).as("cq"))
    val c2 = train.groupBy(col("flag"), col("y"))
      .agg(count(lit(1)).as("cy"))
    val testCells = base.where(col("is_test"))
      .groupBy(col("qb"), col("y"), col("flag").as("actual"))
      .agg(count(lit(1)).as("n"))
    val cells = testCells.select(col("qb"), col("y")).distinct()
    val scored = cells.crossJoin(broadcast(priors))
      .join(broadcast(c1), Seq("flag", "qb"), "left")
      .join(broadcast(c2), Seq("flag", "y"), "left")
      .select(col("qb"), col("y"), col("flag"),
        (col("nc").cast("double")
          * ((coalesce(col("cq"), lit(0L)) + 1).cast("double")
            / (col("nc") + 6).cast("double"))
          * ((coalesce(col("cy"), lit(0L)) + 1).cast("double")
            / (col("nc") + 11).cast("double"))).as("score"))
    NbStage(testCells, scored)
  }

  /** DuckDB twin of [[nbStage]] — a `def` (not a post-`defs` val) so
    * oracle strings can interpolate it during `defs` init. */
  private def NbStageSql: String =
    """base AS (
          SELECT l_returnflag AS flag,
                 CAST(l_quantity AS BIGINT) // 10 AS qb,
                 CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS y,
                 ((CAST(md5_number_lower('nb:' || CAST(l_orderkey AS VARCHAR)
                    || '-' || CAST(l_linenumber AS VARCHAR) || '-'
                    || CAST(l_partkey AS VARCHAR)) % 4294967296 AS BIGINT))
                  % 5 = 0) AS is_test
          FROM lineitem),
        priors AS (
          SELECT flag, CAST(COUNT(*) AS BIGINT) AS nc FROM base
          WHERE NOT is_test GROUP BY 1),
        c1 AS (
          SELECT flag, qb, CAST(COUNT(*) AS BIGINT) AS cq FROM base
          WHERE NOT is_test GROUP BY 1, 2),
        c2 AS (
          SELECT flag, y, CAST(COUNT(*) AS BIGINT) AS cy FROM base
          WHERE NOT is_test GROUP BY 1, 2),
        test_cells AS (
          SELECT qb, y, flag AS actual, CAST(COUNT(*) AS BIGINT) AS n
          FROM base WHERE is_test GROUP BY 1, 2, 3),
        cells AS (SELECT DISTINCT qb, y FROM test_cells),
        scored AS (
          SELECT ce.qb, ce.y, p.flag,
                 CAST(p.nc AS DOUBLE)
                   * (CAST(COALESCE(c1.cq, 0) + 1 AS DOUBLE)
                      / CAST(p.nc + 6 AS DOUBLE))
                   * (CAST(COALESCE(c2.cy, 0) + 1 AS DOUBLE)
                      / CAST(p.nc + 11 AS DOUBLE)) AS score
          FROM cells ce
          CROSS JOIN priors p
          LEFT JOIN c1 ON c1.flag = p.flag AND c1.qb = ce.qb
          LEFT JOIN c2 ON c2.flag = p.flag AND c2.y = ce.y)"""

  /** Exact integer moment buffer for the typed-Aggregator gate (q246):
    * associative/commutative adds — partition-split-invariant by
    * construction. */
  case class MomentBuf(n: Long, s: Long, s2: Long)

  object DollarMoments
      extends org.apache.spark.sql.expressions.Aggregator[Long, MomentBuf, MomentBuf] {
    def zero: MomentBuf = MomentBuf(0L, 0L, 0L)
    def reduce(b: MomentBuf, x: Long): MomentBuf =
      MomentBuf(b.n + 1L, b.s + x, b.s2 + x * x)
    def merge(a: MomentBuf, b: MomentBuf): MomentBuf =
      MomentBuf(a.n + b.n, a.s + b.s, a.s2 + b.s2)
    def finish(b: MomentBuf): MomentBuf = b
    def bufferEncoder: org.apache.spark.sql.Encoder[MomentBuf] =
      org.apache.spark.sql.Encoders.product[MomentBuf]
    def outputEncoder: org.apache.spark.sql.Encoder[MomentBuf] =
      org.apache.spark.sql.Encoders.product[MomentBuf]
  }
}
