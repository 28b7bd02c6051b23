package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.functions.Kernels.{md5Bits, md5BitsModK}
import graft.sources.Tables
import graft.plans.CheckpointPolicy.DataFrameCutOps

/** Round-5 robust-statistics batch — the distribution-shape audits a data
  * platform runs on money and text columns: inequality/concentration
  * (Gini + Lorenz top-decile, Pareto 80/20 cutoff), forensic digit
  * analysis (Benford), a nonparametric A/B test (Mann-Whitney rank-sum),
  * robust outlier gating (median/MAD), and edit-distance entity blocking.
  *
  * Exactness stance: every statistic is assembled from BIGINT/DECIMAL(38,0)
  * integer sums; divisions are either positive integral divides emitted as
  * ppm BIGINTs (truncation == floor for the positive numerators here; never
  * used on signed values) or one-shot double divisions whose operands fit
  * int64's 2^53 double-exact window, written in the identical association
  * order on both engines.
  */
object RobustStatsQueries {

  private def cents(c: org.apache.spark.sql.Column) =
    (c.cast(DecimalType(18, 2)) * 100).cast("long")

  val defs: Seq[QueryDef] = Seq(

    // Gini coefficient + Lorenz top-decile share of customer revenue per
    // segment. With revenues sorted ascending, G = (2*sum(i*x_i) -
    // (n+1)*sum(x_i)) / (n*sum(x_i)) — tie blocks contribute the same
    // sum(i) under any ordering, so the custkey tiebreak affects nothing.
    // The rank window rides ONE segment exchange; products ride
    // DECIMAL(38,0) (i*x overflows int64 past ~sf10); the ppm outputs are
    // positive integral divides. 100 TB: per-segment windows partition the
    // sort; the statistic frame after the per-customer rollup is
    // |customers|, 1% of fact size.
    QueryDef(
      "q189_gini_concentration",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val c = Tables.customer(s, dir)
          .select(col("c_custkey"), col("c_mktsegment").as("segment"))
        val rev = o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .groupBy(col("segment"), col("o_custkey").as("ck"))
          .agg(sum(cents(col("o_totalprice"))).as("r"))
        val wSeg = Window.partitionBy(col("segment"))
        val ranked = rev
          .withColumn("i", row_number().over(wSeg.orderBy(col("r"), col("ck"))).cast("long"))
          .withColumn("n", count(lit(1)).over(wSeg))
        val agg = ranked.groupBy(col("segment"))
          .agg(max(col("n")).as("n"),
            sum(col("r").cast(DecimalType(38, 0))).as("s0"),
            sum(col("i").cast(DecimalType(38, 0)) * col("r")).as("s1"),
            sum(when(col("i") > col("n") - expr("n div 10"), col("r")).otherwise(0L))
              .cast(DecimalType(38, 0)).as("stop"))
        agg.select(col("segment"),
            col("n").cast("long").as("n_customers"),
            col("s0").cast("long").as("total_rev_cents"),
            expr("CAST((CAST(1000000 AS DECIMAL(38,0)) * (2*s1 - (n+1)*s0)) div (CAST(n AS DECIMAL(38,0))*s0) AS BIGINT)")
              .as("gini_ppm"),
            expr("CAST((CAST(1000000 AS DECIMAL(38,0)) * stop) div s0 AS BIGINT)")
              .as("top_decile_ppm"))
          .orderBy(col("segment"))
      },
      Some("""
        WITH rev AS (
          SELECT c.c_mktsegment AS segment, o.o_custkey AS ck,
                 CAST(SUM(CAST(CAST(o.o_totalprice AS DECIMAL(18,2))*100 AS BIGINT)) AS BIGINT) AS r
          FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
          GROUP BY 1,2),
        ranked AS (
          SELECT segment, r,
                 CAST(ROW_NUMBER() OVER (PARTITION BY segment ORDER BY r, ck) AS BIGINT) AS i,
                 CAST(COUNT(*) OVER (PARTITION BY segment) AS BIGINT) AS n
          FROM rev),
        agg AS (
          SELECT segment, MAX(n) AS n,
                 CAST(SUM(r) AS HUGEINT) AS s0,
                 CAST(SUM(CAST(i AS HUGEINT)*r) AS HUGEINT) AS s1,
                 CAST(SUM(CASE WHEN i > n - n//10 THEN r ELSE 0 END) AS HUGEINT) AS stop
          FROM ranked GROUP BY segment)
        SELECT segment, CAST(n AS BIGINT) AS n_customers, CAST(s0 AS BIGINT) AS total_rev_cents,
               CAST((1000000*(2*s1 - (n+1)*s0)) // (CAST(n AS HUGEINT)*s0) AS BIGINT) AS gini_ppm,
               CAST((1000000*stop) // s0 AS BIGINT) AS top_decile_ppm
        FROM agg ORDER BY segment""")),

    // Benford first-digit audit over order amounts. The digit comes from
    // the decimal string of the integer cents (no log10 anywhere — IEEE
    // libm log10 is not engine-stable at power-of-ten boundaries); the
    // chi-square against the Benford expectation log10(1+1/d) (hardcoded
    // double literals) is nine one-shot terms from exact integer counts,
    // summed in fixed textual order (q185 stance). One partial-aggregable
    // scan; the statistic frame is 9 rows.
    QueryDef(
      "q190_benford_audit",
      (s, dir) => {
        val p = Array(0.3010299956639812, 0.17609125905568124, 0.12493873660829992,
          0.09691001300805642, 0.07918124604762482, 0.06694678963061322,
          0.05799194697768673, 0.05115252244738129, 0.04575749056067514)
        val o = Tables.orders(s, dir).where(col("o_totalprice") > 0)
          .select(cents(col("o_totalprice")).as("v"))
          .select(substring(col("v").cast("string"), 1, 1).cast("long").as("digit"))
        val d = o.groupBy(col("digit")).agg(count(lit(1)).as("c"))
        val aggCols = Seq(coalesce(max(when(col("digit") === 1, col("c"))), lit(0L)).as("c1")) ++
          (2 to 9).map(i => coalesce(max(when(col("digit") === i, col("c"))), lit(0L)).as(s"c$i"))
        val one = d.groupBy().agg(sum(col("c")).as("n"), aggCols: _*)
        def term(i: Int) = {
          val e = col("n").cast("double") * lit(p(i - 1))
          (col(s"c$i").cast("double") - e) * (col(s"c$i").cast("double") - e) / e
        }
        one.withColumn("chi2",
            term(1) + term(2) + term(3) + term(4) + term(5) +
              term(6) + term(7) + term(8) + term(9))
          .select((Seq(col("n").cast("long").as("n_values")) ++
            (1 to 9).map(i => col(s"c$i").cast("long")) ++
            Seq(col("chi2"), (col("chi2") > 20.090235029663233).as("benford_violated"))): _*)
      },
      Some("""
        WITH v AS (
          SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT) AS cents FROM orders
          WHERE o_totalprice > 0),
        d AS (
          SELECT CAST(SUBSTRING(CAST(cents AS VARCHAR),1,1) AS BIGINT) AS digit,
                 CAST(COUNT(*) AS BIGINT) AS c
          FROM v GROUP BY 1),
        p AS (
          SELECT CAST(SUM(c) AS BIGINT) AS n,
                 CAST(COALESCE(MAX(CASE WHEN digit=1 THEN c END),0) AS BIGINT) AS c1,
                 CAST(COALESCE(MAX(CASE WHEN digit=2 THEN c END),0) AS BIGINT) AS c2,
                 CAST(COALESCE(MAX(CASE WHEN digit=3 THEN c END),0) AS BIGINT) AS c3,
                 CAST(COALESCE(MAX(CASE WHEN digit=4 THEN c END),0) AS BIGINT) AS c4,
                 CAST(COALESCE(MAX(CASE WHEN digit=5 THEN c END),0) AS BIGINT) AS c5,
                 CAST(COALESCE(MAX(CASE WHEN digit=6 THEN c END),0) AS BIGINT) AS c6,
                 CAST(COALESCE(MAX(CASE WHEN digit=7 THEN c END),0) AS BIGINT) AS c7,
                 CAST(COALESCE(MAX(CASE WHEN digit=8 THEN c END),0) AS BIGINT) AS c8,
                 CAST(COALESCE(MAX(CASE WHEN digit=9 THEN c END),0) AS BIGINT) AS c9
          FROM d),
        t AS (
          SELECT *,
            (CAST(c1 AS DOUBLE) - CAST(n AS DOUBLE)*CAST(0.3010299956639812 AS DOUBLE))*(CAST(c1 AS DOUBLE) - CAST(n AS DOUBLE)*CAST(0.3010299956639812 AS DOUBLE))/(CAST(n AS DOUBLE)*CAST(0.3010299956639812 AS DOUBLE))
           +(CAST(c2 AS DOUBLE) - CAST(n AS DOUBLE)*CAST(0.17609125905568124 AS DOUBLE))*(CAST(c2 AS DOUBLE) - CAST(n AS DOUBLE)*CAST(0.17609125905568124 AS DOUBLE))/(CAST(n AS DOUBLE)*CAST(0.17609125905568124 AS DOUBLE))
           +(CAST(c3 AS DOUBLE) - CAST(n AS DOUBLE)*CAST(0.12493873660829992 AS DOUBLE))*(CAST(c3 AS DOUBLE) - CAST(n AS DOUBLE)*CAST(0.12493873660829992 AS DOUBLE))/(CAST(n AS DOUBLE)*CAST(0.12493873660829992 AS DOUBLE))
           +(CAST(c4 AS DOUBLE) - CAST(n AS DOUBLE)*CAST(0.09691001300805642 AS DOUBLE))*(CAST(c4 AS DOUBLE) - CAST(n AS DOUBLE)*CAST(0.09691001300805642 AS DOUBLE))/(CAST(n AS DOUBLE)*CAST(0.09691001300805642 AS DOUBLE))
           +(CAST(c5 AS DOUBLE) - CAST(n AS DOUBLE)*CAST(0.07918124604762482 AS DOUBLE))*(CAST(c5 AS DOUBLE) - CAST(n AS DOUBLE)*CAST(0.07918124604762482 AS DOUBLE))/(CAST(n AS DOUBLE)*CAST(0.07918124604762482 AS DOUBLE))
           +(CAST(c6 AS DOUBLE) - CAST(n AS DOUBLE)*CAST(0.06694678963061322 AS DOUBLE))*(CAST(c6 AS DOUBLE) - CAST(n AS DOUBLE)*CAST(0.06694678963061322 AS DOUBLE))/(CAST(n AS DOUBLE)*CAST(0.06694678963061322 AS DOUBLE))
           +(CAST(c7 AS DOUBLE) - CAST(n AS DOUBLE)*CAST(0.05799194697768673 AS DOUBLE))*(CAST(c7 AS DOUBLE) - CAST(n AS DOUBLE)*CAST(0.05799194697768673 AS DOUBLE))/(CAST(n AS DOUBLE)*CAST(0.05799194697768673 AS DOUBLE))
           +(CAST(c8 AS DOUBLE) - CAST(n AS DOUBLE)*CAST(0.05115252244738129 AS DOUBLE))*(CAST(c8 AS DOUBLE) - CAST(n AS DOUBLE)*CAST(0.05115252244738129 AS DOUBLE))/(CAST(n AS DOUBLE)*CAST(0.05115252244738129 AS DOUBLE))
           +(CAST(c9 AS DOUBLE) - CAST(n AS DOUBLE)*CAST(0.04575749056067514 AS DOUBLE))*(CAST(c9 AS DOUBLE) - CAST(n AS DOUBLE)*CAST(0.04575749056067514 AS DOUBLE))/(CAST(n AS DOUBLE)*CAST(0.04575749056067514 AS DOUBLE))
            AS chi2
          FROM p)
        SELECT n AS n_values, c1,c2,c3,c4,c5,c6,c7,c8,c9, chi2,
               chi2 > 20.090235029663233 AS benford_violated
        FROM t""")),

    // Mann-Whitney U (rank-sum) test between the deterministic md5 A/B
    // arms over order values. Tie-averaged ranks are kept integral by
    // doubling: r2(v) = 2*cntlt(v) + cnt(v) + 1, so U2 = 2U is exact
    // BIGINT. The Spark side computes cntlt WITHOUT a global single-
    // partition window: distinct values partial-agg, then a value-range
    // bucket (v div 65536) whose per-bucket totals prefix-sum on a frame
    // bounded by the VALUE RANGE (not row count), then a within-bucket
    // window partitioned by bucket — two bounded exchanges at any scale.
    // The oracle keeps the textbook single-window form (values identical).
    // z^2 (no tie correction; tie mass is emitted separately) is a
    // one-shot double from int64-exact operands in identical association
    // order — bit-stable across engines.
    QueryDef(
      "q191_mann_whitney",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val base = o.select(cents(col("o_totalprice")).as("v"),
          when(md5BitsModK(md5Bits(concat(lit("ab:"), col("o_custkey"))), 2L) === 0L, lit("c"))
            .otherwise(lit("t")).as("arm"))
        val dv = base.groupBy(col("v")).agg(
          count(lit(1)).as("cnt"),
          sum(when(col("arm") === "t", 1L).otherwise(0L)).as("cnt_t"))
        val bucketed = dv.withColumn("bucket", expr("v div 65536"))
        val boff = bucketed.groupBy(col("bucket")).agg(sum(col("cnt")).as("bcnt"))
          .withColumn("offset",
            coalesce(sum(col("bcnt")).over(Window.orderBy(col("bucket"))
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .select(col("bucket"), col("offset"))
        val wB = Window.partitionBy(col("bucket")).orderBy(col("v"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val ranked = bucketed.join(broadcast(boff), "bucket")
          .withColumn("cntlt", col("offset") + sum(col("cnt")).over(wB) - col("cnt"))
        val agg = ranked.groupBy().agg(
          sum(col("cnt")).as("n"), sum(col("cnt_t")).as("nt"),
          sum(col("cnt_t").cast(DecimalType(38, 0)) * (col("cntlt") * 2 + col("cnt") + 1)).as("r2t"),
          sum(col("cnt") * col("cnt") * col("cnt") - col("cnt")).as("t3"))
        agg.select(
            (col("n") - col("nt")).as("n_control"), col("nt").as("n_treat"),
            expr("CAST(r2t - CAST(nt AS DECIMAL(38,0))*(nt+1) AS BIGINT)").as("u2_treat"),
            expr("CAST(CAST(2*(n-nt) AS DECIMAL(38,0))*nt - (r2t - CAST(nt AS DECIMAL(38,0))*(nt+1)) AS BIGINT)").as("u2_control"),
            col("t3").as("tie_cubes"))
          .withColumn("u2d", col("u2_treat") - (col("n_control") * col("n_treat")))
          .withColumn("rb",
            col("u2d").cast("double") / (col("n_control") * col("n_treat")).cast("double"))
          .withColumn("z2",
            (col("u2d").cast("double") * col("u2d").cast("double") * lit(3.0)) /
              ((col("n_control") * col("n_treat")).cast("double") *
                (col("n_control") + col("n_treat") + 1).cast("double") * lit(4.0)))
          .select(col("n_control"), col("n_treat"), col("u2_treat"), col("u2_control"),
            col("tie_cubes"), col("rb"), col("z2"),
            (col("z2") > 3.841458820694124).as("significant"))
      },
      Some("""
        WITH base AS (
          SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT) AS v,
                 CASE WHEN CAST(md5_number_lower('ab:' || o_custkey) % 2 AS BIGINT) = 0
                      THEN 'c' ELSE 't' END AS arm
          FROM orders),
        dv AS (
          SELECT v, CAST(COUNT(*) AS BIGINT) AS cnt,
                 CAST(SUM(CASE WHEN arm='t' THEN 1 ELSE 0 END) AS BIGINT) AS cnt_t
          FROM base GROUP BY v),
        ranked AS (
          SELECT v, cnt, cnt_t,
                 CAST(COALESCE(SUM(cnt) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),0) AS BIGINT) AS cntlt
          FROM dv),
        agg AS (
          SELECT CAST(SUM(cnt) AS BIGINT) AS n,
                 CAST(SUM(cnt_t) AS BIGINT) AS nt,
                 CAST(SUM(CAST(cnt_t AS HUGEINT)*(2*cntlt + cnt + 1)) AS HUGEINT) AS r2t,
                 CAST(SUM(CAST(cnt AS HUGEINT)*cnt*cnt - cnt) AS BIGINT) AS t3
          FROM ranked),
        o AS (
          SELECT n - nt AS n_control, nt AS n_treat,
                 CAST(r2t - CAST(nt AS HUGEINT)*(nt+1) AS BIGINT) AS u2_treat,
                 CAST(CAST(2*(n-nt) AS HUGEINT)*nt - (r2t - CAST(nt AS HUGEINT)*(nt+1)) AS BIGINT) AS u2_control,
                 t3 AS tie_cubes
          FROM agg),
        o2 AS (
          SELECT *, u2_treat - (n_control * n_treat) AS u2d FROM o)
        SELECT n_control, n_treat, u2_treat, u2_control, tie_cubes,
               CAST(u2d AS DOUBLE) / CAST(n_control * n_treat AS DOUBLE) AS rb,
               (CAST(u2d AS DOUBLE)*CAST(u2d AS DOUBLE)*CAST(3.0 AS DOUBLE)) /
                 (CAST(n_control * n_treat AS DOUBLE)*CAST(n_control + n_treat + 1 AS DOUBLE)*CAST(4.0 AS DOUBLE)) AS z2,
               (CAST(u2d AS DOUBLE)*CAST(u2d AS DOUBLE)*CAST(3.0 AS DOUBLE)) /
                 (CAST(n_control * n_treat AS DOUBLE)*CAST(n_control + n_treat + 1 AS DOUBLE)*CAST(4.0 AS DOUBLE)) > 3.841458820694124 AS significant
        FROM o2""")),

    // Pareto 80/20 cutoff per brand: the smallest top-revenue part set
    // whose cumulative revenue reaches 80% of the brand's — the integer
    // predicate 5*cum >= 4*tot (no 0.8 float). Both the rank and the
    // cumulative ride ONE brand-partitioned sort; cum is monotone within
    // brand so the cutoff's cum is MIN over flagged rows. The ppm share
    // is a positive integral divide. 100 TB: per-brand partitions; the
    // window frame is parts-per-brand, never global.
    QueryDef(
      "q192_pareto_cutoff",
      (s, dir) => {
        val l = Tables.lineitem(s, dir)
        val p = Tables.part(s, dir).select(col("p_partkey"), col("p_brand").as("brand"))
        val rev = l.join(p, col("l_partkey") === col("p_partkey"))
          .groupBy(col("brand"), col("l_partkey").as("pk"))
          .agg(sum(cents(col("l_extendedprice"))).as("r"))
        val wRank = Window.partitionBy(col("brand")).orderBy(col("r").desc, col("pk"))
        val wBrand = Window.partitionBy(col("brand"))
        val ranked = rev
          .withColumn("rn", row_number().over(wRank).cast("long"))
          .withColumn("cum", sum(col("r")).over(
            wRank.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("tot", sum(col("r")).over(wBrand))
          .withColumn("np", count(lit(1)).over(wBrand))
        ranked.groupBy(col("brand"))
          .agg(max(col("np")).as("n_parts"), max(col("tot")).as("total_rev_cents"),
            min(when(col("cum") * 5 >= col("tot") * 4, col("rn"))).as("n_top"),
            min(when(col("cum") * 5 >= col("tot") * 4, col("cum"))).as("cumk"))
          .select(col("brand"), col("n_parts"), col("total_rev_cents"), col("n_top"),
            expr("CAST((CAST(1000000 AS DECIMAL(38,0)) * cumk) div total_rev_cents AS BIGINT)")
              .as("top_share_ppm"))
          .orderBy(col("brand"))
      },
      Some("""
        WITH prev AS (
          SELECT p.p_brand AS brand, l.l_partkey AS pk,
                 CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2))*100 AS BIGINT)) AS BIGINT) AS r
          FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
          GROUP BY 1,2),
        ranked AS (
          SELECT brand, r,
                 CAST(ROW_NUMBER() OVER (PARTITION BY brand ORDER BY r DESC, pk) AS BIGINT) AS rn,
                 CAST(SUM(r) OVER (PARTITION BY brand ORDER BY r DESC, pk
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
                 CAST(SUM(r) OVER (PARTITION BY brand) AS BIGINT) AS tot,
                 CAST(COUNT(*) OVER (PARTITION BY brand) AS BIGINT) AS np
          FROM prev)
        SELECT brand, MAX(np) AS n_parts, MAX(tot) AS total_rev_cents,
               CAST(MIN(CASE WHEN 5*cum >= 4*tot THEN rn END) AS BIGINT) AS n_top,
               CAST((1000000*CAST(MIN(CASE WHEN 5*cum >= 4*tot THEN cum END) AS HUGEINT)) // MAX(tot) AS BIGINT) AS top_share_ppm
        FROM ranked GROUP BY brand ORDER BY brand""")),

    // Edit-distance entity blocking: sorted-neighborhood by name within
    // brand blocks, offsets 1..2, exact integer Levenshtein (both engines
    // implement the identical textbook DP) with a tight <=2 near-dup
    // threshold. q170's numeric variant established the rn+off join shape;
    // this one exercises string-metric parity. 100 TB: candidates are
    // O(docs x offsets) by construction, never all-pairs; the rank window
    // partitions by brand.
    QueryDef(
      "q193_edit_distance_blocking",
      (s, dir) => {
        val p = Tables.part(s, dir).select(col("p_brand").as("brand"),
          col("p_partkey").as("pk"), col("p_name").as("nm"))
        val r = p.withColumn("rn",
          row_number().over(Window.partitionBy(col("brand"))
            .orderBy(col("nm"), col("pk"))).cast("long"))
        val probes = r.withColumn("off", explode(array(lit(1L), lit(2L))))
          .select(col("brand"), col("pk").as("pk_a"), col("nm").as("nm_a"),
            (col("rn") + col("off")).as("rn_b"))
        val pairs = probes.join(
          r.select(col("brand"), col("pk").as("pk_b"), col("nm").as("nm_b"),
            col("rn").as("rn_b")), Seq("brand", "rn_b"))
          .withColumn("dist", levenshtein(col("nm_a"), col("nm_b")).cast("long"))
        pairs.groupBy(col("brand"))
          .agg(count(lit(1)).as("n_pairs"),
            sum(when(col("dist") <= 2, 1L).otherwise(0L)).as("n_matches"),
            min(col("dist")).as("min_dist"),
            sum(col("dist")).as("sum_dist"),
            sum(when(col("dist") <= 2, col("pk_a") * 100000L + col("pk_b"))
              .otherwise(0L)).as("match_checksum"))
          .orderBy(col("brand"))
      },
      Some("""
        WITH r AS (
          SELECT p_brand AS brand, p_partkey AS pk, p_name AS nm,
                 CAST(ROW_NUMBER() OVER (PARTITION BY p_brand ORDER BY p_name, p_partkey) AS BIGINT) AS rn
          FROM part),
        pairs AS (
          SELECT a.brand, a.pk AS pk_a, b.pk AS pk_b,
                 CAST(levenshtein(a.nm, b.nm) AS BIGINT) AS dist
          FROM r a JOIN r b ON a.brand = b.brand AND b.rn - a.rn IN (1,2))
        SELECT brand, CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(SUM(CASE WHEN dist <= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_matches,
               CAST(MIN(dist) AS BIGINT) AS min_dist,
               CAST(SUM(dist) AS BIGINT) AS sum_dist,
               CAST(SUM(CASE WHEN dist <= 2 THEN pk_a*100000 + pk_b ELSE 0 END) AS BIGINT) AS match_checksum
        FROM pairs GROUP BY brand ORDER BY brand""")),

    // Median/MAD robust outlier gate on per-customer revenue. Medians stay
    // integral by doubling: med2 = 2*median(cents) and mad4 = 2*median of
    // dev2 = |2x - med2| are exactly-integral doubles cast to BIGINT
    // (round-vs-truncate is moot on integral values); the outlier rule
    // |x-med| > 3*1.4826*MAD clears denominators to the pure-integer
    // comparison 20000*dev2 > 44478*mad4 — no float ever touches a row.
    // Two broadcast joins of 5-row median frames; everything else is one
    // segment-partitioned aggregate per pass.
    QueryDef(
      "q194_mad_outliers",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val c = Tables.customer(s, dir)
          .select(col("c_custkey"), col("c_mktsegment").as("segment"))
        val rev = o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .groupBy(col("segment"), col("o_custkey"))
          .agg(sum(cents(col("o_totalprice"))).as("cents"))
        val med = rev.groupBy(col("segment"))
          .agg(expr("CAST(2*percentile(cents, 0.5D) AS BIGINT)").as("med2"))
        val dev = rev.join(broadcast(med), "segment")
          .withColumn("dev2", abs(col("cents") * 2 - col("med2")))
        val mad = dev.groupBy(col("segment"))
          .agg(expr("CAST(2*percentile(dev2, 0.5D) AS BIGINT)").as("mad4"))
        dev.join(broadcast(mad), "segment")
          .groupBy(col("segment"))
          .agg(count(lit(1)).as("n_customers"),
            max(col("med2")).as("med2"), max(col("mad4")).as("mad4"),
            sum(when(col("dev2") * 20000 > col("mad4") * 44478, 1L).otherwise(0L))
              .as("n_outliers"),
            max(col("dev2")).as("max_dev2"))
          .orderBy(col("segment"))
      },
      Some("""
        WITH rev AS (
          SELECT c.c_mktsegment AS segment,
                 CAST(SUM(CAST(CAST(o.o_totalprice AS DECIMAL(18,2))*100 AS BIGINT)) AS BIGINT) AS cents
          FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
          GROUP BY c.c_mktsegment, o.o_custkey),
        med AS (
          SELECT segment, CAST(2*percentile_cont(0.5) WITHIN GROUP (ORDER BY cents) AS BIGINT) AS med2
          FROM rev GROUP BY segment),
        dev AS (
          SELECT r.segment, ABS(2*r.cents - m.med2) AS dev2, m.med2
          FROM rev r JOIN med m ON r.segment = m.segment),
        mad AS (
          SELECT segment, CAST(2*percentile_cont(0.5) WITHIN GROUP (ORDER BY dev2) AS BIGINT) AS mad4
          FROM dev GROUP BY segment)
        SELECT d.segment, CAST(COUNT(*) AS BIGINT) AS n_customers,
               MAX(d.med2) AS med2, MAX(m.mad4) AS mad4,
               CAST(SUM(CASE WHEN 20000*d.dev2 > 44478*m.mad4 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
               CAST(MAX(d.dev2) AS BIGINT) AS max_dev2
        FROM dev d JOIN mad m ON d.segment = m.segment
        GROUP BY d.segment ORDER BY d.segment""")),

    // Winsorized and trimmed means — the two standard outlier-robust
    // location estimates the MAD gate (q194) flags FOR: per market
    // segment, clamp order totals to the [p05, p95] element quantiles
    // (winsorize) or drop outside them (trim). percentile_disc returns
    // CORPUS ELEMENTS (integer cents — the q128 contract), so clamping
    // and both sums stay exact BIGINT; each mean is ONE exactAvg double
    // division at the end. 100 TB: the quantile pass and the clamped
    // re-aggregation are two partial-aggregable scans over the same
    // segment key (the bounds frame is |segments| rows, broadcast back);
    // contrast with q194's windowed median — element quantiles per
    // group need no global sort.
    QueryDef(
      "q223_winsorized_mean",
      (s, dir) => {
        import graft.functions.Kernels.exactAvg
        val cents = Tables.orders(s, dir)
          .select((col("o_totalprice").cast(DecimalType(18, 2)) * 100)
              .cast("long").as("cents"),
            col("o_orderpriority").as("segment"))
        val bounds = cents.groupBy(col("segment"))
          .agg(expr("percentile_disc(0.05) WITHIN GROUP (ORDER BY cents)")
              .cast("long").as("lo"),
            expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY cents)")
              .cast("long").as("hi"))
        cents.join(broadcast(bounds), Seq("segment"))
          .groupBy(col("segment"))
          .agg(count(lit(1)).as("n_orders"),
            min(col("lo")).as("p05_cents"), min(col("hi")).as("p95_cents"),
            exactAvg(sum(greatest(least(col("cents"), col("hi")), col("lo"))),
              count(lit(1))).as("winsorized_mean_cents"),
            exactAvg(
              sum(when(col("cents").between(col("lo"), col("hi")),
                col("cents"))),
              sum(when(col("cents").between(col("lo"), col("hi")), 1L)
                .otherwise(0L))).as("trimmed_mean_cents"),
            sum(when(col("cents") < col("lo"), 1L).otherwise(0L))
              .as("n_clamped_lo"),
            sum(when(col("cents") > col("hi"), 1L).otherwise(0L))
              .as("n_clamped_hi"))
          .orderBy(col("segment"))
      },
      Some("""
        WITH cents AS (
          SELECT o_orderpriority AS segment,
                 CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS cents
          FROM orders),
        bounds AS (
          SELECT segment,
                 quantile_disc(cents, 0.05) AS lo,
                 quantile_disc(cents, 0.95) AS hi
          FROM cents GROUP BY 1)
        SELECT c.segment,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(MIN(b.lo) AS BIGINT) AS p05_cents,
               CAST(MIN(b.hi) AS BIGINT) AS p95_cents,
               CAST(SUM(GREATEST(LEAST(c.cents, b.hi), b.lo)) AS DOUBLE)
                 / COUNT(*) AS winsorized_mean_cents,
               CAST(SUM(CASE WHEN c.cents BETWEEN b.lo AND b.hi
                             THEN c.cents END) AS DOUBLE)
                 / SUM(CASE WHEN c.cents BETWEEN b.lo AND b.hi
                            THEN 1 ELSE 0 END) AS trimmed_mean_cents,
               CAST(SUM(CASE WHEN c.cents < b.lo THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_clamped_lo,
               CAST(SUM(CASE WHEN c.cents > b.hi THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_clamped_hi
        FROM cents c JOIN bounds b USING (segment)
        GROUP BY c.segment
        ORDER BY c.segment""")),

    // Theil-Sen estimator — the robust trend line (median of all
    // pairwise slopes; 29% breakdown point vs OLS q168's zero): monthly
    // revenue per order priority, slopes over ALL month pairs, median
    // slope and median-residual intercept via element quantiles. The
    // pair set is O(months²) — bounded by CALENDAR SPAN (84 months →
    // ≤3.5k pairs/group), NOT by corpus size, so the estimator's cost is
    // scale-free once the monthly rollup (one partial-aggregable
    // exchange) is done. Slopes are exact-integer differences with ONE
    // double division each (bit-identical IEEE on both engines);
    // medians are percentile_disc ELEMENTS (q128 contract), never
    // interpolated.
    QueryDef(
      "q227_theil_sen",
      (s, dir) => {
        val monthly = Tables.orders(s, dir)
          .groupBy(col("o_orderpriority").as("segment"),
            ((year(col("o_orderdate")) - 1992) * 12 +
              month(col("o_orderdate")) - 1).cast("long").as("mi"))
          .agg(sum((col("o_totalprice").cast(DecimalType(18, 2)) * 100)
            .cast("long")).as("cents"))
          .cutLineage()
        val a = monthly.select(col("segment"), col("mi").as("mi_a"),
          col("cents").as("c_a"))
        val b = monthly.select(col("segment"), col("mi").as("mi_b"),
          col("cents").as("c_b"))
        val slopes = a.join(b, Seq("segment"))
          .where(col("mi_a") < col("mi_b"))
          .select(col("segment"),
            ((col("c_b") - col("c_a")).cast("double") /
              (col("mi_b") - col("mi_a")).cast("double")).as("slope"))
        val fit = slopes.groupBy(col("segment"))
          .agg(count(lit(1)).as("n_pairs"),
            expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY slope)")
              .as("ts_slope"))
        monthly.join(broadcast(fit), Seq("segment"))
          .groupBy(col("segment"))
          .agg(count(lit(1)).as("n_months"),
            min(col("n_pairs")).as("n_pairs"),
            min(col("ts_slope")).as("ts_slope"),
            expr("""percentile_disc(0.5) WITHIN GROUP
                    (ORDER BY cast(cents as double)
                              - ts_slope * cast(mi as double))""")
              .as("ts_intercept"))
          .orderBy(col("segment"))
      },
      Some("""
        WITH monthly AS (
          SELECT o_orderpriority AS segment,
                 CAST((year(o_orderdate) - 1992) * 12
                      + month(o_orderdate) - 1 AS BIGINT) AS mi,
                 SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                     AS BIGINT)) AS cents
          FROM orders GROUP BY 1, 2),
        slopes AS (
          SELECT a.segment,
                 CAST(b.cents - a.cents AS DOUBLE)
                   / CAST(b.mi - a.mi AS DOUBLE) AS slope
          FROM monthly a JOIN monthly b
            ON a.segment = b.segment AND a.mi < b.mi),
        fit AS (
          SELECT segment, COUNT(*) AS n_pairs,
                 quantile_disc(slope, 0.5) AS ts_slope
          FROM slopes GROUP BY 1)
        SELECT m.segment,
               CAST(COUNT(*) AS BIGINT) AS n_months,
               CAST(MIN(f.n_pairs) AS BIGINT) AS n_pairs,
               MIN(f.ts_slope) AS ts_slope,
               quantile_disc(CAST(m.cents AS DOUBLE)
                             - f.ts_slope * CAST(m.mi AS DOUBLE), 0.5)
                 AS ts_intercept
        FROM monthly m JOIN fit f USING (segment)
        GROUP BY m.segment
        ORDER BY m.segment""")),

    // Kolmogorov-Smirnov two-sample test — the distribution-SHAPE drift
    // detector next to q185's chi-square (binned) and q191's Mann-Whitney
    // (location): D = max over the merged support of |ECDF_a - ECDF_b|,
    // here between urgent-priority and normal-priority order values.
    // Exactness: the max gap is computed on the INTEGER lattice
    // |n_b*cumA - n_a*cumB| (the common denominator n_a*n_b never
    // divides until the final ppm emit), so D's argmax and the
    // significance verdict involve no floats at all. The cumulative
    // counts reuse q191's two-level scheme — distinct-value partial agg,
    // then a value-range bucket (v div 65536) whose per-bucket totals
    // prefix-sum on a frame bounded by VALUE RANGE, then within-bucket
    // windows — so no global single-partition rank exists at any scale.
    // Significance at alpha=0.05: D² > c²(n_a+n_b)/(n_a·n_b) with
    // c² = -ln(0.025)/2 ≈ 1.844439727, cross-multiplied to the integer
    // predicate d_num²·10⁹ > 1844439727·(n_a+n_b)·n_a·n_b riding
    // DECIMAL(38,0) (headroom to ~sf10 at the gate's scales; beyond
    // that the ppm form divides first).
    QueryDef(
      "q236_ks_two_sample",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val base = o.select(cents(col("o_totalprice")).as("v"),
          col("o_orderpriority").isin("1-URGENT", "2-HIGH").as("is_a"))
        val dv = base.groupBy(col("v")).agg(
          count(lit(1)).as("cnt"),
          sum(when(col("is_a"), 1L).otherwise(0L)).as("cnt_a"))
        val bucketed = dv.withColumn("bucket", expr("v div 65536"))
        val wOff = Window.orderBy(col("bucket"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val boff = bucketed.groupBy(col("bucket"))
          .agg(sum(col("cnt")).as("bcnt"), sum(col("cnt_a")).as("bcnt_a"))
          .withColumn("off", coalesce(sum(col("bcnt")).over(wOff), lit(0L)))
          .withColumn("off_a", coalesce(sum(col("bcnt_a")).over(wOff), lit(0L)))
          .select(col("bucket"), col("off"), col("off_a"))
        val wB = Window.partitionBy(col("bucket")).orderBy(col("v"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cums = bucketed.join(broadcast(boff), "bucket")
          .withColumn("cum", col("off") + sum(col("cnt")).over(wB))
          .withColumn("cum_a", col("off_a") + sum(col("cnt_a")).over(wB))
        val tot = dv.groupBy().agg(
          sum(col("cnt")).as("n"), sum(col("cnt_a")).as("n_a"))
        val gaps = cums.crossJoin(broadcast(tot))
          .select(col("n_a"), (col("n") - col("n_a")).as("n_b"),
            abs((col("n") - col("n_a")).cast(DecimalType(38, 0)) * col("cum_a")
              - col("n_a").cast(DecimalType(38, 0)) * (col("cum") - col("cum_a")))
              .as("gap"))
        gaps.groupBy(col("n_a"), col("n_b"))
          .agg(max(col("gap")).as("d_num_dec"))
          .select(col("n_a"), col("n_b"),
            expr("CAST(d_num_dec AS BIGINT)").as("d_num"),
            expr("CAST((CAST(1000000 AS DECIMAL(38,0)) * d_num_dec) div (CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)")
              .as("ks_ppm"),
            (expr("d_num_dec * d_num_dec * CAST(1000000000 AS DECIMAL(38,0))") >
              expr("CAST(1844439727 AS DECIMAL(38,0)) * (n_a + n_b) * n_a * n_b"))
              .as("significant"))
      },
      Some("""
        WITH base AS (
          SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT) AS v,
                 o_orderpriority IN ('1-URGENT','2-HIGH') AS is_a
          FROM orders),
        dv AS (
          SELECT v, CAST(COUNT(*) AS BIGINT) AS cnt,
                 CAST(SUM(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS cnt_a
          FROM base GROUP BY v),
        cums AS (
          SELECT v,
                 CAST(SUM(cnt) OVER w AS BIGINT) AS cum,
                 CAST(SUM(cnt_a) OVER w AS BIGINT) AS cum_a
          FROM dv
          WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        tot AS (
          SELECT CAST(SUM(cnt) AS BIGINT) AS n,
                 CAST(SUM(cnt_a) AS BIGINT) AS n_a
          FROM dv),
        gaps AS (
          SELECT t.n_a, t.n - t.n_a AS n_b,
                 abs(CAST(t.n - t.n_a AS HUGEINT)*c.cum_a
                     - CAST(t.n_a AS HUGEINT)*(c.cum - c.cum_a)) AS gap
          FROM cums c CROSS JOIN tot t)
        SELECT n_a, n_b,
               CAST(MAX(gap) AS BIGINT) AS d_num,
               CAST((1000000 * MAX(gap)) // (CAST(n_a AS HUGEINT) * n_b) AS BIGINT) AS ks_ppm,
               MAX(gap)*MAX(gap)*CAST(1000000000 AS HUGEINT)
                 > CAST(1844439727 AS HUGEINT)*(n_a+n_b)*n_a*n_b AS significant
        FROM gaps
        GROUP BY n_a, n_b""")),

    // RANSAC line fit — the consensus-set robust regressor next to
    // Theil-Sen (q227; median-of-slopes) and OLS (q168; zero breakdown):
    // propose K candidate lines from point PAIRS, score each by how many
    // points fall within a fixed residual band, keep the largest
    // consensus. Determinism replaces RNG: the 64 md5 buckets of the
    // line-item key pick one representative each (min unsigned digest,
    // value tiebreaks for the q11 dup corpus), and candidate c pairs the
    // representatives of buckets 2c/2c+1 — a fixed, reproducible sample
    // of K=32 models on both engines. Points are (quantity, price cents);
    // each model is anchored at its lower-x point so dx > 0, and the
    // inlier test |dy·(x−x1) − dx·(y−y1)| ≤ tol·dx is exact BIGINT
    // cross-multiplication (max magnitude ~5.5e8 — no overflow, no
    // division). The ONE double emitted (slope) is a single IEEE divide,
    // bit-identical cross-engine (q227 contract). Scale: the scoring
    // pass is a broadcast nested loop of ≤32 constant rows against the
    // fact table — linear in N with map-side partial aggregation; the
    // representative pick is a 64-group min-struct agg, no windows.
    QueryDef(
      "q301_ransac_line",
      (s, dir) => {
        import graft.functions.Kernels.md5BitsU64
        // fanOutRead ahead of the per-row md5 + decimal packing AND the
        // 32-model scoring pass — both consume this frame, both ran on
        // the ~3-split scan (measured 1.7 + 0.7 s serial stages)
        val pts = graft.operators.Skew.fanOutRead(Tables.lineitem(s, dir)
            .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
              col("l_quantity"), col("l_extendedprice")))
          .select(md5Bits(concat_ws("-",
              col("l_orderkey").cast("string"),
              col("l_linenumber").cast("string"),
              col("l_partkey").cast("string"))).as("bits"),
            col("l_quantity").cast("long").as("x"),
            (col("l_extendedprice").cast(DecimalType(18, 2)) * 100)
              .cast("long").as("y"))
        // Representative pick = lexicographic min over (u, x, y). A
        // min(struct(..)) forces SortAggregate (full secondary sorts of
        // the fact table); packing the triple into ONE decimal —
        // u·2³⁰ + x·2²⁴ + y, disjoint bit ranges (x ≤ 50 < 2⁶,
        // y = price cents ≤ 1.1e7 < 2²⁴ by the TPC-H price domain, which
        // is scale-invariant) — keeps the same total order and
        // hash-aggregates in one codegen'd pass. Only (x, y) are
        // decoded back (pmod, no overflow); u itself is never needed.
        val keyed = pts.select(md5BitsModK(col("bits"), 64L).as("b"),
          (md5BitsU64(col("bits")).cast(DecimalType(38, 0))
            * lit(1073741824L)
            + (col("x") * lit(16777216L) + col("y"))
              .cast(DecimalType(38, 0))).as("comp"))
        // 64 rows, consumed by BOTH the anchors and seconds branches —
        // branching consumption, so the sanctioned lineage cut applies
        // (one fact-table scan instead of two).
        val reps = keyed.groupBy(col("b")).agg(min(col("comp")).as("m"))
          .select(col("b"),
            expr("CAST(pmod(m, 1073741824) AS BIGINT)").as("rem"))
          .select(col("b"), expr("rem div 16777216").as("x"),
            (col("rem") % 16777216L).as("y"))
          .cutLineage()
        val anchors = reps.where(col("b") % 2 === 0)
          .select((col("b") / lit(2L)).cast("long").as("cand"),
            col("x").as("xa"), col("y").as("ya"))
        val seconds = reps.where(col("b") % 2 === 1)
          .select(expr("b div 2").as("cand"),
            col("x").as("xs"), col("y").as("ys"))
        val models = anchors.join(seconds, Seq("cand"))
          .where(col("xs") =!= col("xa"))
          .select(col("cand"),
            when(col("xs") < col("xa"), col("xs")).otherwise(col("xa"))
              .as("x1"),
            when(col("xs") < col("xa"), col("ys")).otherwise(col("ya"))
              .as("y1"),
            when(col("xs") < col("xa"), col("xa") - col("xs"))
              .otherwise(col("xs") - col("xa")).as("dx"),
            when(col("xs") < col("xa"), col("ya") - col("ys"))
              .otherwise(col("ys") - col("ya")).as("dy"))
        // Scoring: the naive shape is crossJoin(points, models) —
        // 32·N rows through a non-codegen BroadcastNestedLoopJoin
        // (measured ~5.7 s at sf0.1). The models frame is ≤32 CONSTANT
        // rows by construction (64 buckets), so instead collect it
        // (capped, loud failure — the Scd2/IncrementalMerge discipline)
        // and bake each candidate's inlier test into a conditional SUM:
        // ONE whole-stage-codegen scan of the fact table, 32 parallel
        // counters, an aggregate to a single row — no join at all.
        val modelRows = models.limit(33).collect()
        require(modelRows.length <= 32,
          s"RANSAC candidate set exceeded its 64-bucket bound: " +
            s"${modelRows.length}")
        val ptsXY = pts.select(col("x"), col("y"))
        val inlierAggs = modelRows.map { r =>
          val (cand, x1, y1, dx, dy) = (r.getLong(0), r.getLong(1),
            r.getLong(2), r.getLong(3), r.getLong(4))
          sum(when(abs(lit(dy) * (col("x") - lit(x1))
              - lit(dx) * (col("y") - lit(y1)))
              <= lit(1000000L * dx), 1L).otherwise(0L)).as(s"in_$cand")
        }
        val stats = ptsXY.agg(count(lit(1)).as("n_pts"),
          inlierAggs.toIndexedSeq: _*)
        val nInliers = modelRows.map(_.getLong(0)).sorted.reverse
          .foldLeft(lit(null).cast("long")) { (tail, cand) =>
            when(col("cand") === cand, col(s"in_$cand")).otherwise(tail)
          }
        models.crossJoin(broadcast(stats))
          .select(col("cand"), col("x1"), col("y1"), col("dx"), col("dy"),
            (col("dy").cast("double") / col("dx").cast("double"))
              .as("slope"),
            col("n_pts"), nInliers.as("n_inliers"))
          .select(col("*"),
            expr("(n_inliers * 1000000) div n_pts").as("inlier_ppm"))
          .orderBy(col("cand"))
      },
      Some("""
        WITH pts AS (
          SELECT CAST(md5_number_lower(CAST(l_orderkey AS VARCHAR) || '-'
                   || CAST(l_linenumber AS VARCHAR) || '-'
                   || CAST(l_partkey AS VARCHAR)) % 64 AS BIGINT) AS b,
                 md5_number_lower(CAST(l_orderkey AS VARCHAR) || '-'
                   || CAST(l_linenumber AS VARCHAR) || '-'
                   || CAST(l_partkey AS VARCHAR)) AS u,
                 CAST(l_quantity AS BIGINT) AS x,
                 CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                      AS BIGINT) AS y
          FROM lineitem),
        reps AS (
          SELECT b, x, y FROM (
            SELECT b, x, y,
                   row_number() OVER (PARTITION BY b ORDER BY u, x, y)
                     AS rn
            FROM pts) WHERE rn = 1),
        models AS (
          SELECT CAST(a.b // 2 AS BIGINT) AS cand,
                 CASE WHEN s.x < a.x THEN s.x ELSE a.x END AS x1,
                 CASE WHEN s.x < a.x THEN s.y ELSE a.y END AS y1,
                 CASE WHEN s.x < a.x THEN a.x - s.x
                      ELSE s.x - a.x END AS dx,
                 CASE WHEN s.x < a.x THEN a.y - s.y
                      ELSE s.y - a.y END AS dy
          FROM (SELECT b, x, y FROM reps WHERE b % 2 = 0) a
          JOIN (SELECT b, x, y FROM reps WHERE b % 2 = 1) s
            ON a.b // 2 = s.b // 2
          WHERE s.x <> a.x),
        scored AS (
          SELECT m.cand, m.x1, m.y1, m.dx, m.dy,
                 CAST(COUNT(*) AS BIGINT) AS n_pts,
                 CAST(SUM(CASE WHEN abs(m.dy * (p.x - m.x1)
                                        - m.dx * (p.y - m.y1))
                                    <= 1000000 * m.dx
                               THEN 1 ELSE 0 END) AS BIGINT) AS n_inliers
          FROM pts p CROSS JOIN models m
          GROUP BY 1, 2, 3, 4, 5)
        SELECT cand, x1, y1, dx, dy,
               CAST(dy AS DOUBLE) / CAST(dx AS DOUBLE) AS slope,
               n_pts, n_inliers,
               (n_inliers * 1000000) // n_pts AS inlier_ppm
        FROM scored
        ORDER BY cand""")),

    // Mann-Kendall trend test — the NONPARAMETRIC significance gate for
    // the trends Theil-Sen (q227) estimates and CUSUM (q188) localizes:
    // S = Σ_{i<j} sign(y_j − y_i) over each priority segment's monthly
    // revenue, with the tie-corrected variance
    // 18·Var(S) = n(n−1)(2n+5) − Σ_t t(t−1)(2t+5). Everything is exact
    // integer arithmetic on a CALENDAR-bounded series (≤84 months →
    // ≤3.5k sign pairs per segment), and the α=0.05 verdict is the
    // cross-multiplied integer predicate S²·180000 > 38416·var18
    // (1.96² = 3.8416) — a COMPUTED boolean on both engines, no floats,
    // no normal-CDF. Scale: one partial-aggregable monthly rollup; the
    // pair/tie arithmetic never grows with the corpus.
    QueryDef(
      "q305_mann_kendall",
      (s, dir) => {
        val monthly = Tables.orders(s, dir)
          .groupBy(col("o_orderpriority").as("segment"),
            ((year(col("o_orderdate")) - 1992) * 12 +
              month(col("o_orderdate")) - 1).cast("long").as("mi"))
          .agg(sum((col("o_totalprice").cast(DecimalType(18, 2)) * 100)
            .cast("long")).as("cents"))
          .cutLineage()
        val a = monthly.select(col("segment"), col("mi").as("mi_a"),
          col("cents").as("c_a"))
        val b = monthly.select(col("segment"), col("mi").as("mi_b"),
          col("cents").as("c_b"))
        val sStat = a.join(b, Seq("segment"))
          .where(col("mi_a") < col("mi_b"))
          .groupBy(col("segment"))
          .agg(sum(when(col("c_b") > col("c_a"), 1L)
            .when(col("c_b") < col("c_a"), -1L).otherwise(0L)).as("s_stat"))
        val ties = monthly.groupBy(col("segment"), col("cents"))
          .agg(count(lit(1)).as("t"))
          .groupBy(col("segment"))
          .agg(count(lit(1)).as("n_vals"),
            sum(col("t") * (col("t") - 1) * (col("t") * 2 + 5)).as("tie18"))
        val nM = monthly.groupBy(col("segment"))
          .agg(count(lit(1)).as("n_months"))
        nM.join(sStat, Seq("segment")).join(ties, Seq("segment"))
          .select(col("segment"), col("n_months"), col("s_stat"),
            (col("n_months") * (col("n_months") - 1)
              * (col("n_months") * 2 + 5) - col("tie18")).as("var18"))
          .select(col("segment"), col("n_months"), col("s_stat"),
            col("var18"),
            (col("s_stat") * col("s_stat") * 180000L >
              lit(38416L) * col("var18")).as("trend_significant"))
          .orderBy(col("segment"))
      },
      Some("""
        WITH monthly AS (
          SELECT o_orderpriority AS segment,
                 CAST((year(o_orderdate) - 1992) * 12
                      + month(o_orderdate) - 1 AS BIGINT) AS mi,
                 SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                     AS BIGINT)) AS cents
          FROM orders GROUP BY 1, 2),
        s AS (
          SELECT a.segment,
                 CAST(SUM(CASE WHEN b.cents > a.cents THEN 1
                               WHEN b.cents < a.cents THEN -1
                               ELSE 0 END) AS BIGINT) AS s_stat
          FROM monthly a JOIN monthly b
            ON a.segment = b.segment AND a.mi < b.mi
          GROUP BY 1),
        ties AS (
          SELECT segment,
                 CAST(SUM(t * (t - 1) * (t * 2 + 5)) AS BIGINT) AS tie18
          FROM (SELECT segment, cents, CAST(COUNT(*) AS BIGINT) AS t
                FROM monthly GROUP BY 1, 2)
          GROUP BY 1),
        nm AS (SELECT segment, CAST(COUNT(*) AS BIGINT) AS n_months
               FROM monthly GROUP BY 1)
        SELECT nm.segment, nm.n_months, s.s_stat,
               nm.n_months * (nm.n_months - 1) * (nm.n_months * 2 + 5)
                 - ties.tie18 AS var18,
               s.s_stat * s.s_stat * 180000 >
                 38416 * (nm.n_months * (nm.n_months - 1)
                          * (nm.n_months * 2 + 5) - ties.tie18)
                 AS trend_significant
        FROM nm JOIN s ON s.segment = nm.segment
        JOIN ties ON ties.segment = nm.segment
        ORDER BY nm.segment""")),

    // Blocking-quality audit — the two record-linkage metrics that
    // judge ANY blocking scheme (Christen's pair completeness and
    // reduction ratio), here applied to q193's sorted-neighborhood
    // blocking: of all TRUE near-matches (Levenshtein ≤ 2 within
    // brand), what fraction does the candidate set catch, and how much
    // of the quadratic all-pairs space does blocking avoid? The
    // completeness ground truth needs within-block ALL-PAIRS
    // Levenshtein — inherently quadratic — so it runs on a BOUNDED
    // audit slice (p_partkey < 4000, a value-domain rule: constant
    // cost at any sf — the q167 lesson applied up front, not
    // retrofitted), while the reduction ratio needs only COUNTS
    // (possible pairs = m(m−1)/2 in closed form) and covers the full
    // corpus. Candidates and truth normalize to the (least, greatest)
    // pair key before intersecting. Scale: blocking is linear
    // (rank window keyed by brand, offsets 1-2); the only quadratic
    // piece is the fixed-size audit slice.
    QueryDef(
      "q343_blocking_quality",
      (s, dir) => {
        val p = Tables.part(s, dir).select(col("p_brand").as("brand"),
          col("p_partkey").as("pk"), col("p_name").as("nm"))
        val r = p.withColumn("rn",
            row_number().over(Window.partitionBy(col("brand"))
              .orderBy(col("nm"), col("pk"))).cast("long"))
          .cutLineage()
        val probes = r.withColumn("off", explode(array(lit(1L), lit(2L))))
          .select(col("brand"), col("pk").as("pk_a"),
            (col("rn") + col("off")).as("rn_b"))
        val cand = probes.join(
            r.select(col("brand"), col("pk").as("pk_b"),
              col("rn").as("rn_b")), Seq("brand", "rn_b"))
          .select(col("brand"),
            least(col("pk_a"), col("pk_b")).as("ka"),
            greatest(col("pk_a"), col("pk_b")).as("kb"))
          .cutLineage()
        val sample = r.where(col("pk") < 4000)
          .select(col("brand"), col("pk"), col("nm"))
        val truth = sample.as("x").join(sample.as("y"),
            col("x.brand") === col("y.brand") &&
              col("x.pk") < col("y.pk"))
          .where(levenshtein(col("x.nm"), col("y.nm")) <= 2)
          .select(col("x.brand").as("brand"), col("x.pk").as("ka"),
            col("y.pk").as("kb"))
          .cutLineage()
        val caught = truth.join(cand, Seq("brand", "ka", "kb"), "left_semi")
          .groupBy(col("brand")).agg(count(lit(1)).as("n_caught"))
        val tb = truth.groupBy(col("brand")).agg(count(lit(1)).as("n_true"))
        val cb = cand.groupBy(col("brand")).agg(count(lit(1)).as("n_cand"))
        val mb = r.groupBy(col("brand")).agg(count(lit(1)).as("m"))
        mb.join(cb, Seq("brand"), "left")
          .join(tb, Seq("brand"), "left")
          .join(caught, Seq("brand"), "left")
          .select(col("brand"), col("m"),
            coalesce(col("n_cand"), lit(0L)).as("n_cand"),
            expr("(m * (m - 1)) div 2").as("n_possible"),
            coalesce(col("n_true"), lit(0L)).as("n_true"),
            coalesce(col("n_caught"), lit(0L)).as("n_caught"))
          .withColumn("completeness_ppm",
            when(col("n_true") > 0,
              expr("(n_caught * 1000000) div n_true"))
              .otherwise(lit(1000000L)))
          .withColumn("reduction_ppm",
            when(col("n_possible") > 0,
              lit(1000000L) - expr("(n_cand * 1000000) div n_possible"))
              .otherwise(lit(1000000L)))
          .orderBy(col("brand"))
      },
      Some("""
        WITH r AS MATERIALIZED (
          SELECT p_brand AS brand, p_partkey AS pk, p_name AS nm,
                 CAST(ROW_NUMBER() OVER (PARTITION BY p_brand
                   ORDER BY p_name, p_partkey) AS BIGINT) AS rn
          FROM part),
        cand AS MATERIALIZED (
          SELECT a.brand,
                 LEAST(a.pk, b.pk) AS ka, GREATEST(a.pk, b.pk) AS kb
          FROM r a JOIN r b
            ON a.brand = b.brand AND b.rn - a.rn IN (1, 2)),
        sample AS MATERIALIZED (
          SELECT brand, pk, nm FROM r WHERE pk < 4000),
        truth AS MATERIALIZED (
          SELECT x.brand, x.pk AS ka, y.pk AS kb
          FROM sample x JOIN sample y
            ON x.brand = y.brand AND x.pk < y.pk
          WHERE levenshtein(x.nm, y.nm) <= 2),
        caught AS (
          SELECT t.brand, CAST(COUNT(*) AS BIGINT) AS n_caught
          FROM truth t
          WHERE EXISTS (SELECT 1 FROM cand c
                        WHERE c.brand = t.brand AND c.ka = t.ka
                          AND c.kb = t.kb)
          GROUP BY 1),
        tb AS (SELECT brand, CAST(COUNT(*) AS BIGINT) AS n_true
               FROM truth GROUP BY 1),
        cb AS (SELECT brand, CAST(COUNT(*) AS BIGINT) AS n_cand
               FROM cand GROUP BY 1),
        mb AS (SELECT brand, CAST(COUNT(*) AS BIGINT) AS m
               FROM r GROUP BY 1)
        SELECT mb.brand, mb.m,
               COALESCE(cb.n_cand, 0) AS n_cand,
               (mb.m * (mb.m - 1)) // 2 AS n_possible,
               COALESCE(tb.n_true, 0) AS n_true,
               COALESCE(ca.n_caught, 0) AS n_caught,
               CASE WHEN COALESCE(tb.n_true, 0) > 0
                    THEN (COALESCE(ca.n_caught, 0) * 1000000)
                         // tb.n_true
                    ELSE 1000000 END AS completeness_ppm,
               CASE WHEN (mb.m * (mb.m - 1)) // 2 > 0
                    THEN 1000000 - (COALESCE(cb.n_cand, 0) * 1000000)
                         // ((mb.m * (mb.m - 1)) // 2)
                    ELSE 1000000 END AS reduction_ppm
        FROM mb
        LEFT JOIN cb ON cb.brand = mb.brand
        LEFT JOIN tb ON tb.brand = mb.brand
        LEFT JOIN caught ca ON ca.brand = mb.brand
        ORDER BY mb.brand""")),

    // Hodges-Lehmann estimators — the rank-family POINT estimates that
    // complement the Mann-Whitney TEST (q191): the one-sample
    // pseudo-median (median of all Walsh averages (xᵢ+xⱼ)/2, i ≤ j; 29%
    // breakdown, ~0.96 Gaussian efficiency — beats both mean and median)
    // and the two-sample location shift (median of all pairwise
    // differences xᵢ−yⱼ — what the Wilcoxon test actually estimates).
    // Both are inherently pairwise, so they run on a BOUNDED audit slice
    // (o_custkey < 300, a value-domain rule — constant pair count at any
    // sf, the q343 stance); arms are the q191 hash coin so the estimate
    // is a null-calibration. Exactness: Walsh averages carry as the SUM
    // xᵢ+xⱼ (2·HL, no halving, stays on the cents lattice); the median
    // pick is a row_number position select — the VALUE at rank
    // ⌈n/2⌉ is deterministic regardless of tie order. Scale: pair
    // generation is per-segment within the fixed slice; the rank pick
    // windows partition per segment over bounded pair sets.
    QueryDef(
      "q347_hodges_lehmann",
      (s, dir) => {
        val o = Tables.orders(s, dir).where(col("o_custkey") < 300)
          .select(col("o_orderpriority").as("seg"), col("o_orderkey").as("k"),
            cents(col("o_totalprice")).as("v"),
            (md5BitsModK(md5Bits(concat(lit("hl:"), col("o_orderkey"))),
              2L) === 0L).as("ctl"))
          .cutLineage()
        val walsh = o.as("x").join(o.as("y"),
            col("x.seg") === col("y.seg") && col("x.k") <= col("y.k"))
          .select(col("x.seg").as("seg"),
            (col("x.v") + col("y.v")).as("w2"),
            col("x.k").as("ka"), col("y.k").as("kb"))
        val ww = Window.partitionBy(col("seg"))
          .orderBy(col("w2"), col("ka"), col("kb"))
        val hl1 = walsh
          .withColumn("rn", row_number().over(ww).cast("long"))
          .withColumn("cnt", count(lit(1)).over(Window.partitionBy(col("seg"))))
          .where(col("rn") === expr("(cnt + 1) div 2"))
          .select(col("seg"), col("cnt").as("n_walsh_pairs"),
            col("w2").as("hl2_cents"))
        val diffs = o.as("x").join(o.as("y"),
            col("x.seg") === col("y.seg") && !col("x.ctl") && col("y.ctl"))
          .select(col("x.seg").as("seg"),
            (col("x.v") - col("y.v")).as("d"),
            col("x.k").as("ka"), col("y.k").as("kb"))
        val wd = Window.partitionBy(col("seg"))
          .orderBy(col("d"), col("ka"), col("kb"))
        val hl2 = diffs
          .withColumn("rn", row_number().over(wd).cast("long"))
          .withColumn("cnt", count(lit(1)).over(Window.partitionBy(col("seg"))))
          .where(col("rn") === expr("(cnt + 1) div 2"))
          .select(col("seg"), col("cnt").as("n_diff_pairs"),
            col("d").as("shift_cents"))
        val nn = o.groupBy(col("seg")).agg(count(lit(1)).as("n"),
          sum(when(col("ctl"), 1L).otherwise(0L)).as("n_ctl"))
        nn.join(hl1, Seq("seg")).join(hl2, Seq("seg"))
          .orderBy(col("seg"))
      },
      Some("""
        WITH o AS MATERIALIZED (
          SELECT o_orderpriority AS seg, o_orderkey AS k,
                 CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT) AS v,
                 (CAST(md5_number_lower('hl:' || o_orderkey) % 2 AS BIGINT)
                   = 0) AS ctl
          FROM orders WHERE o_custkey < 300),
        walsh AS (
          SELECT x.seg, x.v + y.v AS w2, x.k AS ka, y.k AS kb
          FROM o x JOIN o y ON x.seg = y.seg AND x.k <= y.k),
        hl1 AS (
          SELECT seg, cnt AS n_walsh_pairs, w2 AS hl2_cents FROM (
            SELECT seg, w2,
                   CAST(row_number() OVER (PARTITION BY seg
                     ORDER BY w2, ka, kb) AS BIGINT) AS rn,
                   CAST(COUNT(*) OVER (PARTITION BY seg) AS BIGINT) AS cnt
            FROM walsh)
          WHERE rn = (cnt + 1) // 2),
        diffs AS (
          SELECT x.seg, x.v - y.v AS d, x.k AS ka, y.k AS kb
          FROM o x JOIN o y ON x.seg = y.seg AND NOT x.ctl AND y.ctl),
        hl2 AS (
          SELECT seg, cnt AS n_diff_pairs, d AS shift_cents FROM (
            SELECT seg, d,
                   CAST(row_number() OVER (PARTITION BY seg
                     ORDER BY d, ka, kb) AS BIGINT) AS rn,
                   CAST(COUNT(*) OVER (PARTITION BY seg) AS BIGINT) AS cnt
            FROM diffs)
          WHERE rn = (cnt + 1) // 2),
        nn AS (
          SELECT seg, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(CASE WHEN ctl THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_ctl
          FROM o GROUP BY 1)
        SELECT nn.seg, nn.n, nn.n_ctl, h1.n_walsh_pairs, h1.hl2_cents,
               h2.n_diff_pairs, h2.shift_cents
        FROM nn JOIN hl1 h1 ON h1.seg = nn.seg
        JOIN hl2 h2 ON h2.seg = nn.seg
        ORDER BY nn.seg""")),

    // Kruskal-Wallis H — the k-group extension of q191's Mann-Whitney
    // (one-way ANOVA on ranks, no normality assumed): do the five order
    // priorities draw order values from the same distribution? Rank
    // machinery is q191's verbatim: distinct-value partial agg with
    // per-group conditional counts, cntlt via the two-level value-range
    // bucket scheme (no data-proportional global window on the Spark
    // side), midranks carried as the DOUBLE-RANK integer 2·cntlt+cnt+1
    // so tie averages never leave the int64 lattice. The statistic
    // H = 3·Σᵢ Tᵢ²/nᵢ / (n(n+1)) − 3(n+1) (Tᵢ = double-rank group sum)
    // and its tie correction H/C, C = 1 − Σ(t³−t)/(n³−n), are one-shot
    // doubles from int64-exact operands in ONE spelled-out association
    // order (the q191 stance — bit-identical across engines); the
    // verdict compares against chi²₀.₉₅(df=4) = 9.487729036781154.
    // Scale: everything collapses at the distinct-value rollup;
    // the 5-group pivot is a single row.
    QueryDef(
      "q356_kruskal_wallis",
      (s, dir) => {
        val gs = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
          "5-LOW")
        val base = Tables.orders(s, dir)
          .select(cents(col("o_totalprice")).as("v"),
            col("o_orderpriority").as("g"))
        val dv = base.groupBy(col("v")).agg(
          count(lit(1)).as("cnt"),
          gs.zipWithIndex.map { case (p, i) =>
            sum(when(col("g") === p, 1L).otherwise(0L)).as(s"c${i + 1}")
          }: _*)
        val bucketed = dv.withColumn("bucket", expr("v div 65536"))
        val boff = bucketed.groupBy(col("bucket"))
          .agg(sum(col("cnt")).as("bcnt"))
          .withColumn("offset",
            coalesce(sum(col("bcnt")).over(Window.orderBy(col("bucket"))
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .select(col("bucket"), col("offset"))
        val wB = Window.partitionBy(col("bucket")).orderBy(col("v"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val ranked = bucketed.join(broadcast(boff), "bucket")
          .withColumn("cntlt",
            col("offset") + sum(col("cnt")).over(wB) - col("cnt"))
        val aggCols =
          sum(col("cnt")).as("n") +:
            sum(col("cnt") * col("cnt") * col("cnt") - col("cnt")).as("t3") +:
            gs.indices.flatMap { i =>
              val tn = if (i == 2) "t3x" else s"t${i + 1}"
              Seq(sum(col(s"c${i + 1}")).as(s"n${i + 1}"),
                sum(col(s"c${i + 1}").cast(DecimalType(38, 0)) *
                  (col("cntlt") * 2 + col("cnt") + 1))
                  .cast("long").as(tn))
            }
        val agg = ranked.groupBy().agg(aggCols.head, aggCols.tail: _*)
        agg
          .withColumn("s", expr(
            """cast(t1 as double)*cast(t1 as double)/cast(n1 as double)
             + cast(t2 as double)*cast(t2 as double)/cast(n2 as double)
             + cast(t3x as double)*cast(t3x as double)/cast(n3 as double)
             + cast(t4 as double)*cast(t4 as double)/cast(n4 as double)
             + cast(t5 as double)*cast(t5 as double)/cast(n5 as double)"""))
          .withColumn("h", expr(
            """(3.0 * s) / (cast(n as double) * (cast(n as double) + 1.0))
               - 3.0 * (cast(n as double) + 1.0)"""))
          .withColumn("c", expr(
            """1.0 - cast(t3 as double)
               / (cast(n as double) * cast(n as double) * cast(n as double)
                  - cast(n as double))"""))
          .withColumn("h_c", expr("h / c"))
          .select(col("n"), col("n1"), col("n2"), col("n3"), col("n4"),
            col("n5"), col("t3").as("tie_cubes"), col("h"), col("h_c"),
            (col("h_c") > 9.487729036781154).as("significant"))
      },
      Some("""
        WITH base AS (
          SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT)
                   AS v,
                 o_orderpriority AS g
          FROM orders),
        dv AS (
          SELECT v, CAST(COUNT(*) AS BIGINT) AS cnt,
                 CAST(SUM(CASE WHEN g='1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS c1,
                 CAST(SUM(CASE WHEN g='2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS c2,
                 CAST(SUM(CASE WHEN g='3-MEDIUM' THEN 1 ELSE 0 END) AS BIGINT) AS c3,
                 CAST(SUM(CASE WHEN g='4-NOT SPECIFIED' THEN 1 ELSE 0 END) AS BIGINT) AS c4,
                 CAST(SUM(CASE WHEN g='5-LOW' THEN 1 ELSE 0 END) AS BIGINT) AS c5
          FROM base GROUP BY v),
        ranked AS (
          SELECT v, cnt, c1, c2, c3, c4, c5,
                 CAST(COALESCE(SUM(cnt) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),0)
                   AS BIGINT) AS cntlt
          FROM dv),
        agg AS (
          SELECT CAST(SUM(cnt) AS BIGINT) AS n,
                 CAST(SUM(CAST(cnt AS HUGEINT)*cnt*cnt - cnt) AS BIGINT) AS t3,
                 CAST(SUM(c1) AS BIGINT) AS n1,
                 CAST(SUM(CAST(c1 AS HUGEINT)*(2*cntlt + cnt + 1)) AS BIGINT) AS t1,
                 CAST(SUM(c2) AS BIGINT) AS n2,
                 CAST(SUM(CAST(c2 AS HUGEINT)*(2*cntlt + cnt + 1)) AS BIGINT) AS t2,
                 CAST(SUM(c3) AS BIGINT) AS n3,
                 CAST(SUM(CAST(c3 AS HUGEINT)*(2*cntlt + cnt + 1)) AS BIGINT) AS t3x,
                 CAST(SUM(c4) AS BIGINT) AS n4,
                 CAST(SUM(CAST(c4 AS HUGEINT)*(2*cntlt + cnt + 1)) AS BIGINT) AS t4,
                 CAST(SUM(c5) AS BIGINT) AS n5,
                 CAST(SUM(CAST(c5 AS HUGEINT)*(2*cntlt + cnt + 1)) AS BIGINT) AS t5
          FROM ranked),
        st AS (
          SELECT *,
                 CAST(t1 AS DOUBLE)*CAST(t1 AS DOUBLE)/CAST(n1 AS DOUBLE)
               + CAST(t2 AS DOUBLE)*CAST(t2 AS DOUBLE)/CAST(n2 AS DOUBLE)
               + CAST(t3x AS DOUBLE)*CAST(t3x AS DOUBLE)/CAST(n3 AS DOUBLE)
               + CAST(t4 AS DOUBLE)*CAST(t4 AS DOUBLE)/CAST(n4 AS DOUBLE)
               + CAST(t5 AS DOUBLE)*CAST(t5 AS DOUBLE)/CAST(n5 AS DOUBLE)
                 AS s
          FROM agg),
        hs AS (
          SELECT *,
                 (CAST(3.0 AS DOUBLE) * s)
                   / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE)
                      + CAST(1.0 AS DOUBLE)))
                 - CAST(3.0 AS DOUBLE) * (CAST(n AS DOUBLE)
                   + CAST(1.0 AS DOUBLE)) AS h,
                 CAST(1.0 AS DOUBLE) - CAST(t3 AS DOUBLE)
                   / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                      * CAST(n AS DOUBLE) - CAST(n AS DOUBLE)) AS c
          FROM st)
        SELECT n, n1, n2, n3, n4, n5, t3 AS tie_cubes, h, h / c AS h_c,
               h / c > 9.487729036781154 AS significant
        FROM hs""")),

    // Quantile normalization — map every group's value distribution onto
    // the POOLED distribution by rank (the bioinformatics batch-effect
    // remover, and the feature-prep step that makes per-shard score
    // distributions comparable before a global threshold). Full
    // resolution, no single-partition sort anywhere: within-group and
    // pooled ranks come from the q191 two-level value-bucket lattice
    // (group windows keyed (g, bucket); the pooled offset window runs on
    // the bounded global bucket table), the target pooled rank is
    // t = ⌈midrank_g·N / n_g⌉ on the DECIMAL(38,0) lane, and the
    // rank→pooled-value inversion is a RANK-BLOCK MERGE: pooled rank
    // intervals explode onto the 4096-wide rank blocks they touch
    // (linear — one row per touch), targets key by (t−1) div 4096, and
    // one block-keyed carry window (last_value IGNORE NULLS over
    // (rank, is_t, interval-start)) hands every target the covering
    // pooled value — the start tiebreak makes the carry deterministic
    // when several intervals clamp to the block boundary. Gate: after
    // normalization every group's mean equals the pooled mean within
    // 1000 ppm (measured ≤115 ppm at sf0.001, ≤2 at sf0.01+). Scale:
    // two corpus rollups (group cells, pooled cells) + one block-keyed
    // merge whose partitions are ≤4096 ranks wide — nothing
    // data-proportional in a single task.
    QueryDef(
      "q363_quantile_normalization",
      (s, dir) => {
        val B = 4096L
        val o = Tables.orders(s, dir)
          .select(col("o_orderpriority").as("g"),
            cents(col("o_totalprice")).as("v"))
        val dv = o.groupBy(col("g"), col("v"))
          .agg(count(lit(1)).as("cnt"))
          .withColumn("bkt", expr("v div 65536")).cutLineage()
        val gOff = dv.groupBy(col("g"), col("bkt"))
          .agg(sum(col("cnt")).as("bcnt"))
          .withColumn("goff", coalesce(sum(col("bcnt")).over(
            Window.partitionBy(col("g")).orderBy(col("bkt"))
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .select(col("g"), col("bkt"), col("goff"))
        val wg = Window.partitionBy(col("g"), col("bkt")).orderBy(col("v"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val gRank = dv.join(broadcast(gOff), Seq("g", "bkt"))
          .withColumn("cntlt",
            col("goff") + sum(col("cnt")).over(wg) - col("cnt"))
          .select(col("g"), col("v"), col("cnt"), col("cntlt"))
        val ng = dv.groupBy(col("g")).agg(sum(col("cnt")).as("n_g"))
        val nAll = dv.agg(sum(col("cnt")).as("nn"))
        val pool0 = dv.groupBy(col("v")).agg(sum(col("cnt")).as("pcnt"))
          .withColumn("bkt", expr("v div 65536")).cutLineage()
        val pOff = pool0.groupBy(col("bkt")).agg(sum(col("pcnt")).as("bcnt"))
          .withColumn("poff", coalesce(sum(col("bcnt")).over(
            Window.orderBy(col("bkt"))
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .select(col("bkt"), col("poff"))
        val wp = Window.partitionBy(col("bkt")).orderBy(col("v"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val pool = pool0.join(broadcast(pOff), Seq("bkt"))
          .withColumn("pclt",
            col("poff") + sum(col("pcnt")).over(wp) - col("pcnt"))
          .select(col("v").as("v_pool"), col("pcnt"), col("pclt"))
          .cutLineage()
        val tq = gRank.join(broadcast(ng), Seq("g")).crossJoin(broadcast(nAll))
          .withColumn("t", expr(
            """cast((cast(2*cntlt + cnt as decimal(38,0)) * nn + 2*n_g - 1)
               div (2 * n_g) as bigint)"""))
          .select(col("g"), col("v"), col("cnt"), col("t"))
        val mapped = graft.operators.GlobalRank.valueAtRank(
            pool, "v_pool", "pclt", "pcnt", tq, "t", "normv", B)
          .select(col("g"), col("cnt"), col("normv"))
        val pm = o.agg(sum(col("v").cast(DecimalType(38, 0))).as("sv"),
            count(lit(1)).as("n"))
          .select(expr("cast(sv div n as bigint)").as("pooled_mean_cents"))
        mapped.groupBy(col("g"))
          .agg(sum(col("cnt")).as("n_rows"),
            count(lit(1)).as("n_distinct"),
            sum(col("cnt").cast(DecimalType(38, 0)) * col("normv"))
              .as("snorm"))
          .withColumn("mean_norm_cents",
            expr("cast(snorm div n_rows as bigint)"))
          .crossJoin(broadcast(pm))
          .withColumn("dev_ppm", expr(
            """cast((abs(mean_norm_cents - pooled_mean_cents) * 1000000)
               div pooled_mean_cents as bigint)"""))
          .select(col("g"), col("n_rows"), col("n_distinct"),
            col("mean_norm_cents"), col("pooled_mean_cents"),
            col("dev_ppm"), (col("dev_ppm") <= 1000L).as("aligned"))
          .orderBy(col("g"))
      },
      Some("""
        WITH o AS (
          SELECT o_orderpriority AS g,
                 CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS v
          FROM orders),
        dv AS MATERIALIZED (
          SELECT g, v, CAST(COUNT(*) AS BIGINT) AS cnt, v // 65536 AS bkt
          FROM o GROUP BY 1, 2),
        goff AS (
          SELECT g, bkt,
                 CAST(COALESCE(SUM(bcnt) OVER (PARTITION BY g ORDER BY bkt
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS goff
          FROM (SELECT g, bkt, SUM(cnt) AS bcnt FROM dv GROUP BY 1, 2)),
        grank AS (
          SELECT d.g, d.v, d.cnt,
                 o2.goff + CAST(SUM(d.cnt) OVER (PARTITION BY d.g, d.bkt
                   ORDER BY d.v ROWS BETWEEN UNBOUNDED PRECEDING AND
                   CURRENT ROW) AS BIGINT) - d.cnt AS cntlt
          FROM dv d JOIN goff o2 ON o2.g = d.g AND o2.bkt = d.bkt),
        ng AS (SELECT g, CAST(SUM(cnt) AS BIGINT) AS n_g FROM dv GROUP BY 1),
        nall AS (SELECT CAST(SUM(cnt) AS BIGINT) AS nn FROM dv),
        pool0 AS MATERIALIZED (
          SELECT v, CAST(SUM(cnt) AS BIGINT) AS pcnt, v // 65536 AS bkt
          FROM dv GROUP BY 1),
        poff AS (
          SELECT bkt,
                 CAST(COALESCE(SUM(bcnt) OVER (ORDER BY bkt
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS poff
          FROM (SELECT bkt, SUM(pcnt) AS bcnt FROM pool0 GROUP BY 1)),
        pool AS MATERIALIZED (
          SELECT p.v AS v_pool, p.pcnt,
                 o3.poff + CAST(SUM(p.pcnt) OVER (PARTITION BY p.bkt
                   ORDER BY p.v ROWS BETWEEN UNBOUNDED PRECEDING AND
                   CURRENT ROW) AS BIGINT) - p.pcnt AS pclt
          FROM pool0 p JOIN poff o3 ON o3.bkt = p.bkt),
        tq AS MATERIALIZED (
          SELECT r.g, r.v, r.cnt,
                 CAST((CAST(2*r.cntlt + r.cnt AS HUGEINT) * nall.nn
                       + 2*ng.n_g - 1) // (2 * ng.n_g) AS BIGINT) AS t
          FROM grank r JOIN ng ON ng.g = r.g CROSS JOIN nall),
        pb AS (
          SELECT CAST(u.b AS BIGINT) AS b,
                 GREATEST(pclt + 1, CAST(u.b AS BIGINT) * 4096 + 1) AS rank,
                 0 AS is_t, v_pool, pclt AS srt,
                 NULL::VARCHAR AS g, NULL::BIGINT AS cnt
          FROM pool,
               unnest(range(pclt // 4096, (pclt + pcnt - 1) // 4096 + 1))
                 AS u(b)),
        tb AS (
          SELECT (t - 1) // 4096 AS b, t AS rank, 1 AS is_t,
                 NULL::BIGINT AS v_pool, t AS srt, g, cnt
          FROM tq),
        mapped AS MATERIALIZED (
          SELECT g, cnt, normv FROM (
            SELECT *,
                   last_value(v_pool IGNORE NULLS) OVER (PARTITION BY b
                     ORDER BY rank, is_t, srt
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS normv
            FROM (SELECT * FROM pb UNION ALL SELECT * FROM tb))
          WHERE is_t = 1),
        pm AS (
          SELECT CAST(SUM(CAST(v AS HUGEINT)) // COUNT(*) AS BIGINT)
            AS pooled_mean_cents
          FROM o),
        res AS (
          SELECT m.g, CAST(SUM(m.cnt) AS BIGINT) AS n_rows,
                 CAST(COUNT(*) AS BIGINT) AS n_distinct,
                 CAST(SUM(CAST(m.cnt AS HUGEINT) * m.normv) // SUM(m.cnt)
                   AS BIGINT) AS mean_norm_cents,
                 pm.pooled_mean_cents
          FROM mapped m CROSS JOIN pm
          GROUP BY m.g, pm.pooled_mean_cents)
        SELECT g, n_rows, n_distinct, mean_norm_cents, pooled_mean_cents,
               CAST((abs(mean_norm_cents - pooled_mean_cents) * 1000000)
                    // pooled_mean_cents AS BIGINT) AS dev_ppm,
               CAST((abs(mean_norm_cents - pooled_mean_cents) * 1000000)
                    // pooled_mean_cents AS BIGINT) <= 1000 AS aligned
        FROM res
        ORDER BY g""")),

    // Jonckheere-Terpstra — the ORDERED-alternative k-group test q356's
    // Kruskal-Wallis cannot express: KW asks "do the five priorities
    // differ AT ALL", JT asks "do order values INCREASE along the
    // priority order" (the dose-response question for a continuous
    // outcome; q336's Cochran-Armitage is its binary-outcome cousin),
    // gaining power exactly when the alternative is monotone. The
    // statistic is the sum of the 10 pairwise Mann-Whitney counts
    // U_jk (j<k), assembled at the distinct-value grain: per value v,
    // per-group cumulative counts cum_k(v) ride the q191 two-level
    // value-bucket lattice (5 running sums in ONE bucket-keyed window;
    // the offset window runs once on the bounded bucket table), and the
    // DOUBLED statistic 2U = Σ_v Σ_{j<k} c_j·(2·(n_k−cum_k) + c_k)
    // stays integer under ties. Null moments are exact: 2E = n²−Σn_j²;
    // the tie-corrected variance (Hollander-Wolfe) is emitted as a
    // TERM-FLOORED integer — A div 72 + B div (36n(n-1)(n-2)) +
    // C div (8n(n-1)), each flooring error < 1 on a variance of order
    // n³, and deterministic on both engines (the exact rational would
    // overflow DECIMAL(38,0) past ~2·10⁶ rows; a 100 TB deployment
    // stratifies per shard first). Verdict: z² in ppm vs
    // χ²₀.₉₅(1) = 3.841459. Scale: one distinct-value rollup, bounded
    // frames after.
    QueryDef(
      "q364_jonckheere_terpstra",
      (s, dir) => {
        val gs = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
          "5-LOW")
        val base = Tables.orders(s, dir)
          .select(cents(col("o_totalprice")).as("v"),
            col("o_orderpriority").as("g"))
        val dv = base.groupBy(col("v")).agg(
          count(lit(1)).as("cnt"),
          gs.zipWithIndex.map { case (p, i) =>
            sum(when(col("g") === p, 1L).otherwise(0L)).as(s"c${i + 1}")
          }: _*)
          .withColumn("bkt", expr("v div 65536")).cutLineage()
        val wOff = Window.orderBy(col("bkt"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val bsums = (1 to 5).map(i => sum(col(s"c$i")).as(s"b$i"))
        val boff = dv.groupBy(col("bkt"))
          .agg(bsums.head, bsums.tail: _*)
          .select(col("bkt") +: (1 to 5).map(i =>
            coalesce(sum(col(s"b$i")).over(wOff), lit(0L)).as(s"off$i")): _*)
        val wIn = Window.partitionBy(col("bkt")).orderBy(col("v"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cum = dv.join(broadcast(boff), Seq("bkt"))
          .select((Seq(col("v"), col("cnt")) ++
            (1 to 5).map(i => col(s"c$i")) ++
            (1 to 5).map(i =>
              (col(s"off$i") + sum(col(s"c$i")).over(wIn)).as(s"cum$i"))): _*)
        val nsums = sum(col("cnt")).as("n") +:
          (1 to 5).map(i => sum(col(s"c$i")).as(s"n$i"))
        val ns = dv.agg(nsums.head, nsums.tail: _*)
        val pairsJK = for { j <- 1 to 4; k <- (j + 1) to 5 } yield (j, k)
        val contrib = pairsJK.map { case (j, k) =>
          col(s"c$j").cast(DecimalType(38, 0)) *
            (lit(2L) * (col(s"n$k") - col(s"cum$k")) + col(s"c$k"))
        }.reduce(_ + _)
        val stats = cum.crossJoin(broadcast(ns))
          .agg(sum(contrib).as("u2d"),
            sum(expr("""cast(cnt as decimal(38,0)) * (cnt - 1)
                        * (2 * cnt + 5)""")).as("t1"),
            sum(expr("""cast(cnt as decimal(38,0)) * (cnt - 1)
                        * (cnt - 2)""")).as("t2"),
            sum(expr("cast(cnt as decimal(38,0)) * (cnt - 1)")).as("t3"))
          .crossJoin(broadcast(ns))
        stats
          .withColumn("u2", col("u2d").cast("long"))
          .withColumn("e2", expr(
            """cast((cast(n as decimal(38,0)) * n
               - (cast(n1 as decimal(38,0)) * n1 + cast(n2 as decimal(38,0)) * n2
                  + cast(n3 as decimal(38,0)) * n3 + cast(n4 as decimal(38,0)) * n4
                  + cast(n5 as decimal(38,0)) * n5)) div 2 as bigint)"""))
          .withColumn("g1", expr(
            (1 to 5).map(i =>
              s"cast(n$i as decimal(38,0)) * (n$i - 1) * (2 * n$i + 5)")
              .mkString(" + ")))
          .withColumn("g2", expr(
            (1 to 5).map(i =>
              s"cast(n$i as decimal(38,0)) * (n$i - 1) * (n$i - 2)")
              .mkString(" + ")))
          .withColumn("g3", expr(
            (1 to 5).map(i => s"cast(n$i as decimal(38,0)) * (n$i - 1)")
              .mkString(" + ")))
          .withColumn("var_floor", expr(
            """cast((cast(n as decimal(38,0)) * (n - 1) * (2 * n + 5)
                     - g1 - t1) div 72
               + (g2 * t2) div (cast(36 as decimal(38,0)) * n * (n - 1) * (n - 2))
               + (g3 * t3) div (cast(8 as decimal(38,0)) * n * (n - 1))
               as bigint)"""))
          .withColumn("z2_ppm", expr(
            """case when var_floor <= 0 then 0
               else cast(((cast(u2 as decimal(38,0)) - e2)
                          * (cast(u2 as decimal(38,0)) - e2) * 1000000)
                         div (cast(4 as decimal(38,0)) * var_floor)
                         as bigint) end"""))
          .select(col("n"), col("n1"), col("n2"), col("n3"), col("n4"),
            col("n5"), col("u2"), col("e2"), col("var_floor"),
            col("z2_ppm"),
            (col("z2_ppm") > 3841459L).as("trend_significant"))
      },
      Some("""
        WITH base AS (
          SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT)
                   AS v,
                 o_orderpriority AS g
          FROM orders),
        dv AS MATERIALIZED (
          SELECT v, CAST(COUNT(*) AS BIGINT) AS cnt,
                 CAST(SUM(CASE WHEN g='1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS c1,
                 CAST(SUM(CASE WHEN g='2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS c2,
                 CAST(SUM(CASE WHEN g='3-MEDIUM' THEN 1 ELSE 0 END) AS BIGINT) AS c3,
                 CAST(SUM(CASE WHEN g='4-NOT SPECIFIED' THEN 1 ELSE 0 END) AS BIGINT) AS c4,
                 CAST(SUM(CASE WHEN g='5-LOW' THEN 1 ELSE 0 END) AS BIGINT) AS c5,
                 v // 65536 AS bkt
          FROM base GROUP BY v),
        boff AS (
          SELECT bkt,
                 CAST(COALESCE(SUM(b1) OVER w, 0) AS BIGINT) AS off1,
                 CAST(COALESCE(SUM(b2) OVER w, 0) AS BIGINT) AS off2,
                 CAST(COALESCE(SUM(b3) OVER w, 0) AS BIGINT) AS off3,
                 CAST(COALESCE(SUM(b4) OVER w, 0) AS BIGINT) AS off4,
                 CAST(COALESCE(SUM(b5) OVER w, 0) AS BIGINT) AS off5
          FROM (SELECT bkt, SUM(c1) AS b1, SUM(c2) AS b2, SUM(c3) AS b3,
                       SUM(c4) AS b4, SUM(c5) AS b5
                FROM dv GROUP BY 1)
          WINDOW w AS (ORDER BY bkt
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        cum AS (
          SELECT d.v, d.cnt, d.c1, d.c2, d.c3, d.c4, d.c5,
                 o2.off1 + CAST(SUM(d.c1) OVER wb AS BIGINT) AS cum1,
                 o2.off2 + CAST(SUM(d.c2) OVER wb AS BIGINT) AS cum2,
                 o2.off3 + CAST(SUM(d.c3) OVER wb AS BIGINT) AS cum3,
                 o2.off4 + CAST(SUM(d.c4) OVER wb AS BIGINT) AS cum4,
                 o2.off5 + CAST(SUM(d.c5) OVER wb AS BIGINT) AS cum5
          FROM dv d JOIN boff o2 ON o2.bkt = d.bkt
          WINDOW wb AS (PARTITION BY d.bkt ORDER BY d.v
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        ns AS (
          SELECT CAST(SUM(cnt) AS BIGINT) AS n,
                 CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2,
                 CAST(SUM(c3) AS BIGINT) AS n3, CAST(SUM(c4) AS BIGINT) AS n4,
                 CAST(SUM(c5) AS BIGINT) AS n5
          FROM dv),
        st AS (
          SELECT
            SUM(CAST(c1 AS HUGEINT) * (2*(n2 - cum2) + c2)
              + CAST(c1 AS HUGEINT) * (2*(n3 - cum3) + c3)
              + CAST(c1 AS HUGEINT) * (2*(n4 - cum4) + c4)
              + CAST(c1 AS HUGEINT) * (2*(n5 - cum5) + c5)
              + CAST(c2 AS HUGEINT) * (2*(n3 - cum3) + c3)
              + CAST(c2 AS HUGEINT) * (2*(n4 - cum4) + c4)
              + CAST(c2 AS HUGEINT) * (2*(n5 - cum5) + c5)
              + CAST(c3 AS HUGEINT) * (2*(n4 - cum4) + c4)
              + CAST(c3 AS HUGEINT) * (2*(n5 - cum5) + c5)
              + CAST(c4 AS HUGEINT) * (2*(n5 - cum5) + c5)) AS u2d,
            SUM(CAST(cnt AS HUGEINT) * (cnt-1) * (2*cnt+5)) AS t1,
            SUM(CAST(cnt AS HUGEINT) * (cnt-1) * (cnt-2)) AS t2,
            SUM(CAST(cnt AS HUGEINT) * (cnt-1)) AS t3
          FROM cum CROSS JOIN ns),
        fin AS (
          SELECT ns.n, ns.n1, ns.n2, ns.n3, ns.n4, ns.n5,
                 CAST(st.u2d AS BIGINT) AS u2,
                 CAST((CAST(ns.n AS HUGEINT) * ns.n
                      - (CAST(ns.n1 AS HUGEINT)*ns.n1 + CAST(ns.n2 AS HUGEINT)*ns.n2
                         + CAST(ns.n3 AS HUGEINT)*ns.n3 + CAST(ns.n4 AS HUGEINT)*ns.n4
                         + CAST(ns.n5 AS HUGEINT)*ns.n5)) // 2 AS BIGINT) AS e2,
                 CAST(
                   (CAST(ns.n AS HUGEINT) * (ns.n - 1) * (2*ns.n + 5)
                    - (CAST(ns.n1 AS HUGEINT)*(ns.n1-1)*(2*ns.n1+5)
                       + CAST(ns.n2 AS HUGEINT)*(ns.n2-1)*(2*ns.n2+5)
                       + CAST(ns.n3 AS HUGEINT)*(ns.n3-1)*(2*ns.n3+5)
                       + CAST(ns.n4 AS HUGEINT)*(ns.n4-1)*(2*ns.n4+5)
                       + CAST(ns.n5 AS HUGEINT)*(ns.n5-1)*(2*ns.n5+5))
                    - st.t1) // 72
                   + (CAST(ns.n1 AS HUGEINT)*(ns.n1-1)*(ns.n1-2)
                      + CAST(ns.n2 AS HUGEINT)*(ns.n2-1)*(ns.n2-2)
                      + CAST(ns.n3 AS HUGEINT)*(ns.n3-1)*(ns.n3-2)
                      + CAST(ns.n4 AS HUGEINT)*(ns.n4-1)*(ns.n4-2)
                      + CAST(ns.n5 AS HUGEINT)*(ns.n5-1)*(ns.n5-2)) * st.t2
                     // (CAST(36 AS HUGEINT) * ns.n * (ns.n-1) * (ns.n-2))
                   + (CAST(ns.n1 AS HUGEINT)*(ns.n1-1)
                      + CAST(ns.n2 AS HUGEINT)*(ns.n2-1)
                      + CAST(ns.n3 AS HUGEINT)*(ns.n3-1)
                      + CAST(ns.n4 AS HUGEINT)*(ns.n4-1)
                      + CAST(ns.n5 AS HUGEINT)*(ns.n5-1)) * st.t3
                     // (CAST(8 AS HUGEINT) * ns.n * (ns.n-1))
                   AS BIGINT) AS var_floor
          FROM st CROSS JOIN ns)
        SELECT n, n1, n2, n3, n4, n5, u2, e2, var_floor,
               CASE WHEN var_floor <= 0 THEN 0
                    ELSE CAST(((CAST(u2 AS HUGEINT) - e2)
                               * (CAST(u2 AS HUGEINT) - e2) * 1000000)
                              // (CAST(4 AS HUGEINT) * var_floor) AS BIGINT)
               END AS z2_ppm,
               CASE WHEN var_floor <= 0 THEN 0
                    ELSE CAST(((CAST(u2 AS HUGEINT) - e2)
                               * (CAST(u2 AS HUGEINT) - e2) * 1000000)
                              // (CAST(4 AS HUGEINT) * var_floor) AS BIGINT)
               END > 3841459 AS trend_significant
        FROM fin""")),

    // Exact WEIGHTED quantile table — line value quantiles where every
    // distinct price carries its total ordered QUANTITY as weight (the
    // "median unit price of goods actually shipped" question; unweighted
    // quantiles over-represent small orders, and approx sketches cannot
    // even express a weighted rank). Type-1 weighted quantile: value at
    // weighted rank t_p = ⌈p·W/100⌉ on the cumulative-weight lattice —
    // the q191 two-level value-bucket counting with SUM(weight) in place
    // of COUNT, inverted by `GlobalRank.valueAtRank` (its third
    // consumer: q363 normalizes, q374 places, this one reads the
    // quantile table off a 9-row target frame). The oracle keeps the
    // direct MIN(v | cumweight ≥ t) form — plan cross-check again.
    // Scale: one distinct-value rollup + a 9-target block merge;
    // nothing data-proportional in a single task.
    QueryDef(
      "q375_weighted_quantiles",
      (s, dir) => {
        val li = Tables.lineitem(s, dir).select(
          expr("cast(cast(l_extendedprice as decimal(18,2)) * 100 as bigint)")
            .as("v"),
          col("l_quantity").cast("long").as("w"))
        val dv = li.groupBy(col("v")).agg(sum(col("w")).as("pw"))
          .withColumn("bkt", expr("v div 65536")).cutLineage()
        val bOff = dv.groupBy(col("bkt")).agg(sum(col("pw")).as("bcnt"))
          .withColumn("off", coalesce(sum(col("bcnt")).over(
            Window.orderBy(col("bkt"))
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .select(col("bkt"), col("off"))
        val wIn = Window.partitionBy(col("bkt")).orderBy(col("v"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val pool = dv.join(broadcast(bOff), Seq("bkt"))
          .withColumn("plt", col("off") + sum(col("pw")).over(wIn) - col("pw"))
          .select(col("v").as("vp"), col("pw"), col("plt"))
          .cutLineage()
        val tot = li.agg(sum(col("w")).as("tw"))
        val targets = s.range(1).toDF("z")
          .withColumn("p", explode(expr(
            "array(1L, 5L, 10L, 25L, 50L, 75L, 90L, 95L, 99L)")))
          .crossJoin(broadcast(tot))
          .withColumn("t", expr("(p * tw + 99) div 100"))
          .select(col("p"), col("tw"), col("t"))
        graft.operators.GlobalRank.valueAtRank(
            pool, "vp", "plt", "pw", targets, "t", "value_cents")
          .select(col("p"), col("tw").as("total_weight"),
            col("t").as("weighted_rank"), col("value_cents"))
          .orderBy(col("p"))
      },
      Some("""
        WITH li AS (
          SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2))*100 AS BIGINT)
                   AS v,
                 CAST(l_quantity AS BIGINT) AS w
          FROM lineitem),
        dv AS MATERIALIZED (
          SELECT v, CAST(SUM(w) AS BIGINT) AS pw FROM li GROUP BY 1),
        cum AS MATERIALIZED (
          SELECT v, pw,
                 CAST(COALESCE(SUM(pw) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS plt
          FROM dv),
        tot AS (SELECT CAST(SUM(w) AS BIGINT) AS tw FROM li),
        tg AS (
          SELECT p.p, tot.tw, (p.p * tot.tw + 99) // 100 AS t
          FROM (SELECT unnest([1, 5, 10, 25, 50, 75, 90, 95, 99]) AS p) p
          CROSS JOIN tot)
        SELECT CAST(tg.p AS BIGINT) AS p, tg.tw AS total_weight,
               CAST(tg.t AS BIGINT) AS weighted_rank,
               (SELECT MIN(c.v) FROM cum c WHERE c.plt + c.pw >= tg.t)
                 AS value_cents
        FROM tg
        ORDER BY p"""))
  )
}
