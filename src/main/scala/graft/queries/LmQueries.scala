package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.Kernels.{md5Bits, md5BitsModK}
import graft.functions.TextKernels.tokens
import graft.sources.Tables
import graft.plans.CheckpointPolicy.DataFrameCutOps

/** Statistical language-model data-curation operators — the two scoring
  * primitives every pre-training corpus pipeline runs between dedup and
  * mixing (cf. CCNet's KenLM perplexity filter and DSIR importance
  * resampling):
  *
  *  - q202: held-out bigram-LM familiarity — train add-one-smoothed
  *    bigram counts on one half of the corpus, score the held-out half.
  *  - q203: DSIR-style hashed-feature importance weights — target
  *    distribution vs general distribution over 256 hashed unigram
  *    buckets, one importance ratio per document.
  *
  * Determinism stance: both scores are kept in INTEGER sum form
  * (numerator/denominator of the average probability resp. likelihood
  * ratio) with a SINGLE trailing double division, so cross-row float
  * summation order never enters — the same transcendental-free design as
  * the q172 BM25 (a true log-perplexity would hash-diverge across
  * engines' libm).
  */
object LmQueries {

  private val TrainSrc = Seq("src0", "src1", "src2", "src3", "src4")

  // Every bigram occurrence (non-distinct — counts need multiplicity) as
  // a (w1, bigram) struct array: size-1 bigrams for size tokens.
  private def bigramRows(df: org.apache.spark.sql.DataFrame) = {
    val ws = tokens(col("text"))
    // Guard: sequence(0, -1) would DESCEND for 1-token docs; emit empty.
    val idx = when(size(ws) >= 2, sequence(lit(0), size(ws) - 2))
      .otherwise(array().cast("array<int>"))
    df.select(col("doc_id"),
        explode(transform(idx,
          i => struct(element_at(ws, i + 1).as("w1"),
            concat_ws(" ", element_at(ws, i + 1), element_at(ws, i + 2)).as("bg"))))
          .as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.bg").as("bg"))
  }

  val defs: Seq[QueryDef] = Seq(

    // Held-out bigram-LM scoring (the KenLM-filter shape, log-free):
    // train c(w1,w2), c(w1·) and vocab size V on the en docs of
    // src0-src4; score the en docs of src5-src9 with add-one smoothing
    // P(w2|w1) = (c(w1,w2)+1)/(c(w1·)+V). Per doc: Σnum, Σden (exact
    // ints), unseen-bigram count, and the familiarity ratio as ONE
    // division. 100 TB: the model tables are vocab-sized (≪ corpus);
    // both joins hash-partition on the token key with map-side partial
    // counts — at real scale the head of the bigram table is
    // broadcastable and the tail stays in the shuffle join, and the
    // corpus side streams through linearly.
    QueryDef(
      "q202_bigram_lm_score",
      (s, dir) => {
        val d = Tables.documents(s, dir)
        val en = d.where(col("lang") === "en")
        val train = en.where(col("source").isin(TrainSrc: _*))
        val held  = en.where(!col("source").isin(TrainSrc: _*))

        // One aggregation pass over the exploded bigram stream: group by
        // (w1, bg) — bg determines w1, so this is the per-bg count with
        // w1 carried through — then roll c(w1·) up from the bigram-TYPE
        // table (vocab-sized, ≪ corpus) instead of re-scanning the
        // corpus. fanOutRead keeps the single pass at full width (no-op
        // at scale); the type table is materialized once for its two
        // consumers (context rollup + held-side join).
        val bigramC = graft.operators.Skew.fanOutRead(bigramRows(train))
          .groupBy(col("w1"), col("bg")).agg(count(lit(1)).as("bc"))
          .cutLineage()
        val contextC = bigramC.groupBy(col("w1")).agg(sum(col("bc")).as("cc"))
        val vocab = train
          .select(explode(tokens(col("text"))).as("tok"))
          .agg(count_distinct(col("tok")).as("v"))

        bigramRows(held)
          .join(bigramC.select(col("bg"), col("bc")), Seq("bg"), "left")
          .join(contextC, Seq("w1"), "left")
          .crossJoin(broadcast(vocab))
          .select(col("doc_id"),
            coalesce(col("bc"), lit(0L)).as("bcv"),
            coalesce(col("cc"), lit(0L)).as("ccv"),
            col("v"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_bigrams"),
            sum(when(col("bcv") === 0L, 1L).otherwise(0L)).as("n_unseen"),
            sum(col("bcv") + 1L).as("sum_num"),
            sum(col("ccv") + col("v")).as("sum_den"))
          .select(col("doc_id"), col("n_bigrams"), col("n_unseen"),
            col("sum_num"), col("sum_den"),
            (col("sum_num").cast("double") / col("sum_den")).as("familiarity"))
          .orderBy(col("doc_id"))
      },
      Some("""
        WITH toks AS (
          SELECT doc_id, source, lang, string_split(text, ' ') ws FROM documents
          WHERE lang = 'en'),
        tb AS (
          SELECT doc_id,
                 unnest(list_transform(range(1, len(ws)), i -> ws[i])) AS w1,
                 unnest(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])) AS bg
          FROM toks WHERE source IN ('src0','src1','src2','src3','src4')),
        bc AS (SELECT bg, COUNT(*) AS bc FROM tb GROUP BY 1),
        cc AS (SELECT w1, COUNT(*) AS cc FROM tb GROUP BY 1),
        vocab AS (
          SELECT COUNT(DISTINCT t) AS v
          FROM (SELECT unnest(ws) AS t FROM toks
                WHERE source IN ('src0','src1','src2','src3','src4'))),
        held AS (
          SELECT doc_id,
                 unnest(list_transform(range(1, len(ws)), i -> ws[i])) AS w1,
                 unnest(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])) AS bg
          FROM toks WHERE source NOT IN ('src0','src1','src2','src3','src4')),
        j AS (
          SELECT h.doc_id,
                 COALESCE(b.bc, 0) AS bcv,
                 COALESCE(c.cc, 0) AS ccv,
                 (SELECT v FROM vocab) AS v
          FROM held h
          LEFT JOIN bc b USING (bg)
          LEFT JOIN cc c USING (w1))
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_bigrams,
               CAST(SUM(CASE WHEN bcv = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_unseen,
               CAST(SUM(bcv + 1) AS BIGINT) AS sum_num,
               CAST(SUM(ccv + v) AS BIGINT) AS sum_den,
               CAST(SUM(bcv + 1) AS BIGINT)::DOUBLE
                 / CAST(SUM(ccv + v) AS BIGINT) AS familiarity
        FROM j
        GROUP BY doc_id
        ORDER BY doc_id""")),

    // DSIR-style importance weights: hashed unigram features (md5 u64
    // mod 256, cross-engine exact), target distribution = en docs,
    // general distribution = whole corpus. Per doc the importance ratio
    // is (Σ_tok (t_b+1)) · (G+B) / ((Σ_tok (g_b+1)) · (T+B)) — the
    // average smoothed target-vs-general likelihood ratio of the doc's
    // tokens, kept in exact int64 cross-multiplied form until the final
    // division. 100 TB: both feature tables are exactly 256 rows
    // (broadcast); scoring is a per-row map + one doc_id partial agg —
    // fully linear, no wide state. (At corpus sizes where the int64
    // cross-products would saturate, the two corpus-level constants fold
    // into the final double division instead — noted, not needed at
    // bench scale.)
    QueryDef(
      "q203_dsir_weights",
      (s, dir) => {
        val d = Tables.documents(s, dir)
        val tokRows = d.select(col("doc_id"), col("source"), col("lang"),
            explode(tokens(col("text"))).as("tok"))
          .withColumn("b", md5BitsModK(md5Bits(col("tok")), 256L))
        val tBuckets = tokRows.where(col("lang") === "en")
          .groupBy(col("b")).agg(count(lit(1)).as("tb"))
        val gBuckets = tokRows.groupBy(col("b")).agg(count(lit(1)).as("gb"))
        val totals = tokRows.agg(
          sum(when(col("lang") === "en", 1L).otherwise(0L)).as("tt"),
          count(lit(1)).as("gt"))

        tokRows
          .join(broadcast(tBuckets), Seq("b"), "left")
          .join(broadcast(gBuckets), Seq("b"))
          .crossJoin(broadcast(totals))
          .groupBy(col("doc_id"), col("source"), col("lang"))
          .agg(count(lit(1)).as("n_toks"),
            sum(coalesce(col("tb"), lit(0L)) + 1L).as("t_sum"),
            sum(col("gb") + 1L).as("g_sum"),
            max(col("tt")).as("tt"), max(col("gt")).as("gt"))
          .select(col("doc_id"), col("source"), col("lang"), col("n_toks"),
            col("t_sum"), col("g_sum"),
            ((col("t_sum") * (col("gt") + 256L)).cast("double") /
              (col("g_sum") * (col("tt") + 256L))).as("importance"))
          .orderBy(col("doc_id"))
      },
      Some("""
        WITH raw AS (
          SELECT doc_id, source, lang,
                 unnest(string_split(text, ' ')) AS tokstr
          FROM documents),
        tok AS (
          SELECT doc_id, source, lang,
                 CAST(md5_number_lower(tokstr) % 256 AS BIGINT) AS b
          FROM raw),
        tb AS (SELECT b, COUNT(*) AS tb FROM tok WHERE lang = 'en' GROUP BY 1),
        gb AS (SELECT b, COUNT(*) AS gb FROM tok GROUP BY 1),
        tot AS (
          SELECT CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS tt,
                 CAST(COUNT(*) AS BIGINT) AS gt
          FROM tok)
        SELECT t.doc_id, t.source, t.lang,
               CAST(COUNT(*) AS BIGINT) AS n_toks,
               CAST(SUM(COALESCE(tb.tb, 0) + 1) AS BIGINT) AS t_sum,
               CAST(SUM(gb.gb + 1) AS BIGINT) AS g_sum,
               (CAST(SUM(COALESCE(tb.tb, 0) + 1) AS BIGINT)
                  * (MAX(tot.gt) + 256))::DOUBLE
                 / (CAST(SUM(gb.gb + 1) AS BIGINT) * (MAX(tot.tt) + 256))
                 AS importance
        FROM tok t
        LEFT JOIN tb ON t.b = tb.b
        JOIN gb ON t.b = gb.b
        CROSS JOIN tot
        GROUP BY t.doc_id, t.source, t.lang
        ORDER BY t.doc_id""")),

    // Interpolated Kneser-Ney bigram scoring — the smoothing that
    // actually powers KenLM-style quality filters (q202's add-one is
    // the baseline strawman): the backoff distribution is the
    // CONTINUATION count (how many distinct contexts a word follows),
    // not raw frequency, so "Francisco" stops looking probable outside
    // "San Francisco". Discount d = 3/4 is the textbook constant and —
    // deliberately — a RATIONAL, so the whole model lives on the exact
    // ppm lattice: P_KN(w2|w1) = max(c−¾,0)/c(w1·) + ¾·N₁₊(w1·)/c(w1·)
    // · N₁₊(·w2)/N₁₊(··) becomes two floored integer divisions
    // (((4c−3)·10⁶) div 4c(w1·) and the cross-multiplied backoff term
    // on DECIMAL(38,0)); an unseen context scores the pure
    // continuation probability. Per held-out doc: bigram count, unseen
    // bigram/context counts, and the summed ppm mass — the
    // perplexity-filter signal without a transcendental (the q172/q202
    // stance). Scale: ONE aggregation pass builds the (w1,w2) bigram-type
    // table; the context, continuation, and total-fertility tables are
    // rollups of IT (vocab-sized, not corpus-sized), all joined on token
    // keys with map-side partials; the corpus side streams linearly.
    QueryDef(
      "q345_kneser_ney",
      (s, dir) => {
        val d = Tables.documents(s, dir)
        val en = d.where(col("lang") === "en")
        val train = en.where(col("source").isin(TrainSrc: _*))
        val held = en.where(!col("source").isin(TrainSrc: _*))
        // ONE aggregation pass over the bigram stream: grouping by
        // (w1, w2) — a bijection with bg, since tokens cannot contain
        // the space separator — yields the bigram counts directly, and
        // the other three model tables are pure rollups of that
        // (much smaller) bigram-TYPE table: c(w1·) = Σ_w2 bc,
        // N₁₊(w1·) = rows per w1, N₁₊(·w2) = rows per w2,
        // N₁₊(··) = total rows. The exploded corpus stream is scanned
        // once instead of four times (one full aggregate + a distinct);
        // fanOutRead keeps that single pass at full width (no-op at
        // scale), and the type table is the frame worth materializing —
        // it feeds three rollups plus the held-side join.
        val bigramC = graft.operators.Skew.fanOutRead(bigramRows(train)
            .withColumn("w2", expr("substring(bg, length(w1) + 2)")))
          .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("bc"))
          .cutLineage()
        val contextC = bigramC.groupBy(col("w1"))
          .agg(sum(col("bc")).as("cc"), count(lit(1)).as("n1w"))
        val contC = bigramC.groupBy(col("w2"))
          .agg(count(lit(1)).as("ncw"))
        val nbb = bigramC.agg(count(lit(1)).as("nbb"))
        bigramRows(held)
          .withColumn("w2", expr("substring(bg, length(w1) + 2)"))
          .join(bigramC.select(col("w1"), col("w2"), col("bc")),
            Seq("w1", "w2"), "left")
          .join(contextC, Seq("w1"), "left")
          .join(contC, Seq("w2"), "left")
          .crossJoin(broadcast(nbb))
          .select(col("doc_id"),
            coalesce(col("bc"), lit(0L)).as("bcv"),
            coalesce(col("cc"), lit(0L)).as("ccv"),
            coalesce(col("n1w"), lit(0L)).as("n1wv"),
            coalesce(col("ncw"), lit(0L)).as("ncwv"),
            col("nbb"))
          .withColumn("p_ppm",
            when(col("ccv") > 0,
              when(col("bcv") > 0,
                expr("((4 * bcv - 3) * 1000000) div (4 * ccv)"))
                .otherwise(lit(0L)) +
              expr("""cast((cast(n1wv as decimal(38,0)) * ncwv * 3000000)
                      div (cast(ccv as decimal(38,0)) * nbb * 4)
                      as bigint)"""))
              .otherwise(expr("(ncwv * 1000000) div nbb")))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_bigrams"),
            sum(when(col("bcv") === 0L, 1L).otherwise(0L)).as("n_unseen"),
            sum(when(col("ccv") === 0L, 1L).otherwise(0L))
              .as("n_unseen_ctx"),
            sum(col("p_ppm")).as("sum_p_ppm"))
          .withColumn("mean_p_ppm", expr("sum_p_ppm div n_bigrams"))
          .orderBy(col("doc_id"))
      },
      Some("""
        WITH toks AS (
          SELECT doc_id, source, string_split(text, ' ') AS ws
          FROM documents WHERE lang = 'en'),
        tb AS MATERIALIZED (
          SELECT doc_id,
                 unnest(list_transform(range(1, len(ws)), i -> ws[i]))
                   AS w1,
                 unnest(list_transform(range(1, len(ws)), i -> ws[i+1]))
                   AS w2
          FROM toks
          WHERE source IN ('src0','src1','src2','src3','src4')),
        bc AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS bc
               FROM tb GROUP BY 1, 2),
        cc AS (SELECT w1, CAST(COUNT(*) AS BIGINT) AS cc,
                      CAST(COUNT(DISTINCT w2) AS BIGINT) AS n1w
               FROM tb GROUP BY 1),
        ct AS (SELECT w2, CAST(COUNT(DISTINCT w1) AS BIGINT) AS ncw
               FROM tb GROUP BY 1),
        nbb AS (SELECT CAST(COUNT(*) AS BIGINT) AS nbb
                FROM (SELECT DISTINCT w1, w2 FROM tb)),
        held AS (
          SELECT doc_id,
                 unnest(list_transform(range(1, len(ws)), i -> ws[i]))
                   AS w1,
                 unnest(list_transform(range(1, len(ws)), i -> ws[i+1]))
                   AS w2
          FROM toks
          WHERE source NOT IN ('src0','src1','src2','src3','src4')),
        j AS (
          SELECT h.doc_id,
                 COALESCE(b.bc, 0) AS bcv,
                 COALESCE(c.cc, 0) AS ccv,
                 COALESCE(c.n1w, 0) AS n1wv,
                 COALESCE(t.ncw, 0) AS ncwv,
                 (SELECT nbb FROM nbb) AS nbb
          FROM held h
          LEFT JOIN bc b ON b.w1 = h.w1 AND b.w2 = h.w2
          LEFT JOIN cc c ON c.w1 = h.w1
          LEFT JOIN ct t ON t.w2 = h.w2),
        scored AS (
          SELECT doc_id, bcv, ccv,
                 CASE WHEN ccv > 0 THEN
                   (CASE WHEN bcv > 0
                         THEN ((4 * bcv - 3) * 1000000) // (4 * ccv)
                         ELSE 0 END)
                   + CAST((CAST(n1wv AS HUGEINT) * ncwv * 3000000)
                          // (CAST(ccv AS HUGEINT) * nbb * 4) AS BIGINT)
                 ELSE (ncwv * 1000000) // nbb END AS p_ppm
          FROM j)
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_bigrams,
               CAST(SUM(CASE WHEN bcv = 0 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_unseen,
               CAST(SUM(CASE WHEN ccv = 0 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_unseen_ctx,
               CAST(SUM(p_ppm) AS BIGINT) AS sum_p_ppm,
               CAST(SUM(p_ppm) AS BIGINT) // COUNT(*) AS mean_p_ppm
        FROM scored
        GROUP BY doc_id
        ORDER BY doc_id""")),

    // Good-Turing frequency smoothing — the count-of-counts view that
    // q345's Kneser-Ney discount approximates with a constant: N_r =
    // how many unigram types occur exactly r times, the GT adjusted
    // count r* = (r+1)·N_{r+1}/N_r, and the UNSEEN-MASS estimate
    // p₀ = N₁/N (the leave-one-out identity: singletons today predict
    // novel types tomorrow — the number a crawler uses to decide if a
    // source is mined out, and an LM uses to hold out probability for
    // OOV). All ratios are single floored ppm divisions on exact
    // counts. The r ≤ 5 rows are where GT is actually used (high-r
    // counts are kept raw — N_r is too noisy there, the textbook
    // caveat); r = 0 carries the unseen mass. Scale: one token count,
    // one count-of-counts rollup (frame size = max frequency, data-
    // bounded but tiny), one 6-row report — pure map-combine. The
    // smoothed band is RELATIVE (r ≤ min r + 4): the synthetic corpus
    // has a closed 31-type vocab whose rarest type occurs 26 times, so
    // an absolute r ≤ 5 cut would be vacuously empty at every SF;
    // anchoring at the observed minimum keeps the "noisiest tail of
    // the count-of-counts curve" semantics on any corpus.
    QueryDef(
      "q357_good_turing",
      (s, dir) => {
        val f = Tables.documents(s, dir)
          .select(explode(tokens(col("text"))).as("tok"))
          .groupBy(col("tok")).agg(count(lit(1)).as("r"))
        val tot = f.agg(sum(col("r")).as("n_tokens"),
          count(lit(1)).as("vocab"), min(col("r")).as("r_min"))
          .cutLineage()
        val cc = f.groupBy(col("r")).agg(count(lit(1)).as("n_r"))
          .cutLineage()
        val base = cc.crossJoin(broadcast(tot.select(col("r_min"))))
          .where(col("r") <= col("r_min") + 4).drop("r_min")
          .join(cc.select((col("r") - 1).as("r"), col("n_r").as("n_r1")),
            Seq("r"), "left")
          .select(col("r"), col("n_r"), coalesce(col("n_r1"), lit(0L))
            .as("n_r_plus1"))
        val zero = cc.where(col("r") === 1)
          .select(lit(0L).as("r"), lit(0L).as("n_r"),
            col("n_r").as("n_r_plus1"))
        zero.unionAll(base).crossJoin(broadcast(tot))
          .withColumn("gt_ppm",
            when(col("r") === 0L, expr("(n_r_plus1 * 1000000) div n_tokens"))
              .otherwise(when(col("n_r") > 0,
                expr("((r + 1) * n_r_plus1 * 1000000) div n_r"))
                .otherwise(0L)))
          .select(col("r"), col("n_r"), col("n_r_plus1"), col("gt_ppm"),
            col("n_tokens"), col("vocab"))
          .orderBy(col("r"))
      },
      Some("""
        WITH f AS MATERIALIZED (
          SELECT tok, CAST(COUNT(*) AS BIGINT) AS r FROM (
            SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
          GROUP BY 1),
        tot AS (SELECT CAST(SUM(r) AS BIGINT) AS n_tokens,
                       CAST(COUNT(*) AS BIGINT) AS vocab,
                       MIN(r) AS r_min FROM f),
        cc AS MATERIALIZED (
          SELECT r, CAST(COUNT(*) AS BIGINT) AS n_r FROM f GROUP BY 1),
        base AS (
          SELECT c.r, c.n_r, COALESCE(c1.n_r, 0) AS n_r_plus1
          FROM cc c CROSS JOIN tot t
          LEFT JOIN cc c1 ON c1.r = c.r + 1
          WHERE c.r <= t.r_min + 4),
        zero AS (
          SELECT CAST(0 AS BIGINT) AS r, CAST(0 AS BIGINT) AS n_r,
                 n_r AS n_r_plus1
          FROM cc WHERE r = 1),
        u AS (SELECT * FROM zero UNION ALL SELECT * FROM base)
        SELECT u.r, u.n_r, u.n_r_plus1,
               CASE WHEN u.r = 0
                    THEN (u.n_r_plus1 * 1000000) // t.n_tokens
                    WHEN u.n_r > 0
                    THEN ((u.r + 1) * u.n_r_plus1 * 1000000) // u.n_r
                    ELSE 0 END AS gt_ppm,
               t.n_tokens, t.vocab
        FROM u CROSS JOIN tot t
        ORDER BY u.r""")))
}
