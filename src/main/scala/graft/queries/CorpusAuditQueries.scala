package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextKernels._
import graft.operators.TextDedup
import graft.sources.Tables
import graft.plans.CheckpointPolicy.DataFrameCutOps

/** Round-7 corpus audits: span-level exact-duplication measurement and
  * rank-fusion retrieval over the `documents` corpus.
  *
  * Like the rest of the text surface these are DuckDB-parity exact gates:
  * shingle hashes are the q87 two-fold Horner 62-bit keys, so the oracle
  * reproduces every hash bit-for-bit.
  */
object CorpusAuditQueries {

  val defs: Seq[QueryDef] = Seq(

    // Duplicate-SPAN coverage (the Lee et al. 2022 "Deduplicating
    // Training Data Makes Language Models Better" audit shape): for each
    // document, how much of it is covered by 13-token windows that also
    // occur verbatim in ANOTHER document, and how long is the longest
    // such run? q87 answers "is a test doc contaminated by train"; this
    // answers the corpus-self-duplication question that decides whether
    // substring-level dedup is worth a rewrite pass. Windows hash via
    // TextDedup.ngramHash62Pos (one 8-byte digest per token, two Horner
    // folds — never a materialized 13-gram string); a window is
    // "duplicated" iff its hash occurs in >= 2 DISTINCT docs; runs of
    // consecutive duplicated positions collapse via the gaps-and-islands
    // row_number trick under a per-doc window (partitioned — lint-clean).
    // Scale: shuffles ride 8-byte hash / doc_id keys only; the dup-hash
    // set is bounded by true cross-doc duplication, and the islands pass
    // touches only duplicated positions. At 100 TB this is exactly the
    // suffix-dedup candidate audit you run before committing the rewrite.
    QueryDef(
      "q269_dup_span_coverage",
      (s, dir) => {
        val d = Tables.documents(s, dir)
        // sh feeds THREE consumers (the dup-hash df filter, the per-doc
        // totals, and the dup-position join) — materialize the window
        // pipeline once (pin-neutral cutLineage) instead of re-running
        // the posexplode + 13-lead window per consumer.
        val sh = TextDedup.ngramHash62Pos(
            d.select(col("doc_id"), tokens(col("text")).as("ws")),
            "doc_id", "ws", 13)
          .select(col("doc_id"), col("pos"), col("h62").as("h"))
          .cutLineage()
        val dupH = sh.select(col("h"), col("doc_id")).distinct()
          .groupBy(col("h")).agg(count(lit(1)).as("df"))
          .where(col("df") >= 2).select(col("h"))
        val perDoc = sh.groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_shingles"))
        val dupPos = sh.join(dupH, Seq("h")).select(col("doc_id"), col("pos"))
        val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
        val runs = dupPos
          .withColumn("grp", col("pos") - row_number().over(w))
          .groupBy(col("doc_id"), col("grp"))
          .agg(count(lit(1)).as("run_len"))
        val perDup = runs.groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_dup_spans"),
            sum(col("run_len")).as("n_dup_shingles"),
            max(col("run_len")).as("max_run"))
        perDoc.join(perDup, Seq("doc_id"), "left")
          .select(col("doc_id"), col("n_shingles"),
            coalesce(col("n_dup_shingles"), lit(0L)).as("n_dup_shingles"),
            coalesce(col("n_dup_spans"), lit(0L)).as("n_dup_spans"),
            when(col("max_run").isNull, lit(0L))
              .otherwise(col("max_run") + lit(12L)).as("max_dup_run_tokens"),
            (coalesce(col("n_dup_shingles"), lit(0L)).cast("double") /
              col("n_shingles")).as("dup_frac"))
          .orderBy(col("doc_id"))
      },
      Some("""
        WITH toks AS (
          SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        th AS (
          SELECT doc_id, list_transform(ws,
                   t -> CAST(md5_number_lower(t) % 2147483647 AS BIGINT)) AS hs
          FROM toks WHERE len(ws) >= 13),
        sh AS (
          SELECT doc_id, unnest(range(0, len(hs) - 12)) AS pos,
                 unnest(list_transform(range(1, len(hs) - 11),
                   i -> list_reduce(list_slice(hs, i, i + 12),
                          (a, x) -> (a * 131 + x) % 2147483647) * 2147483648 +
                        list_reduce(list_slice(hs, i, i + 12),
                          (a, x) -> (a * 137 + x) % 2147483647))) AS h
          FROM th),
        duph AS (
          SELECT h FROM (
            SELECT h, COUNT(DISTINCT doc_id) AS df FROM sh GROUP BY 1)
          WHERE df >= 2),
        per_doc AS (SELECT doc_id, COUNT(*) AS n_shingles FROM sh GROUP BY 1),
        dup_pos AS (SELECT doc_id, pos FROM sh JOIN duph USING (h)),
        runs AS (
          SELECT doc_id, grp, COUNT(*) AS run_len FROM (
            SELECT doc_id, pos,
                   pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
            FROM dup_pos) GROUP BY 1, 2),
        per_dup AS (
          SELECT doc_id, COUNT(*) AS n_dup_spans,
                 SUM(run_len) AS n_dup_shingles, MAX(run_len) AS max_run
          FROM runs GROUP BY 1)
        SELECT p.doc_id, CAST(p.n_shingles AS BIGINT) AS n_shingles,
               CAST(COALESCE(d.n_dup_shingles, 0) AS BIGINT) AS n_dup_shingles,
               CAST(COALESCE(d.n_dup_spans, 0) AS BIGINT) AS n_dup_spans,
               CAST(CASE WHEN d.max_run IS NULL THEN 0
                         ELSE d.max_run + 12 END AS BIGINT) AS max_dup_run_tokens,
               CAST(COALESCE(d.n_dup_shingles, 0) AS DOUBLE) / p.n_shingles
                 AS dup_frac
        FROM per_doc p LEFT JOIN per_dup d USING (doc_id)
        ORDER BY p.doc_id""")),

    // Reciprocal-rank fusion (Cormack/Clarke/Buettcher 2009) of two
    // retrieval rankers over the corpus: q172's BM25 and a query-term
    // density ranker (Σtf / doclen). At scale each ranker contributes
    // only its TRUNCATED top-50 — produced by orderBy().limit(50), which
    // plans as TakeOrderedAndProject (never a global sort) — and fusion
    // happens on the tiny union: rrf(d) = Σ_lists 1/(60 + rank_d). This
    // truncated-list fusion is exactly how distributed RRF ships (fusing
    // full rankings would mean ranking every doc globally). The two
    // row_number windows run over ≤50-row inputs (lint-allowlisted
    // bounded tables). BM25 per-doc scores pivot to fixed-order named
    // term columns before the final addition — float sums stay in one
    // deterministic order on both engines (the q172 contract). Absent
    // ranks coalesce to rank 0 / contribution 0.0.
    QueryDef(
      "q273_rrf_fusion",
      (s, dir) => {
        import graft.operators.Bm25
        val terms = Seq("dup", "vector", "merge", "stream", "hash")
        val d = Tables.documents(s, dir)
        val f = Bm25.termScores(d, "doc_id", "text", terms)
        val bm = Bm25.pivotedScore(f.scores, Seq("doc_id"), terms, "score1")
        val w1 = Window.orderBy(col("score1").desc, col("doc_id"))
        val top1 = bm.orderBy(col("score1").desc, col("doc_id")).limit(50)
          .withColumn("r1", row_number().over(w1).cast("long"))
        val den = f.tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("qtf"))
          .join(f.dl, "doc_id")
          .select(col("doc_id"),
            (col("qtf").cast("double") / col("dl").cast("double")).as("score2"))
        val w2 = Window.orderBy(col("score2").desc, col("doc_id"))
        val top2 = den.orderBy(col("score2").desc, col("doc_id")).limit(50)
          .withColumn("r2", row_number().over(w2).cast("long"))
        top1.select(col("doc_id"), col("r1"))
          .join(top2.select(col("doc_id"), col("r2")), Seq("doc_id"), "full_outer")
          .select(col("doc_id"),
            coalesce(col("r1"), lit(0L)).as("rank_bm25"),
            coalesce(col("r2"), lit(0L)).as("rank_density"),
            (coalesce(lit(1.0d) / (lit(60.0d) + col("r1").cast("double")),
              lit(0.0d)) +
             coalesce(lit(1.0d) / (lit(60.0d) + col("r2").cast("double")),
               lit(0.0d))).as("rrf_score"))
          .orderBy(col("rrf_score").desc, col("doc_id"))
          .limit(10)
      },
      Some(s"""
        WITH ${graft.operators.Bm25.scoredSql("'dup','vector','merge','stream','hash'")},
        bm AS (
          SELECT doc_id,
                 COALESCE(MAX(CASE WHEN tk = 'dup' THEN score_t END), 0.0::DOUBLE) +
                 COALESCE(MAX(CASE WHEN tk = 'vector' THEN score_t END), 0.0::DOUBLE) +
                 COALESCE(MAX(CASE WHEN tk = 'merge' THEN score_t END), 0.0::DOUBLE) +
                 COALESCE(MAX(CASE WHEN tk = 'stream' THEN score_t END), 0.0::DOUBLE) +
                 COALESCE(MAX(CASE WHEN tk = 'hash' THEN score_t END), 0.0::DOUBLE)
                   AS score1
          FROM scored GROUP BY 1),
        t1 AS (
          SELECT doc_id, row_number() OVER (ORDER BY score1 DESC, doc_id) AS r1
          FROM bm QUALIFY r1 <= 50),
        den AS (
          SELECT f.doc_id,
                 CAST(SUM(f.tf) AS DOUBLE) / CAST(MAX(l.dl) AS DOUBLE) AS score2
          FROM tf f JOIN dl l USING (doc_id) GROUP BY 1),
        t2 AS (
          SELECT doc_id, row_number() OVER (ORDER BY score2 DESC, doc_id) AS r2
          FROM den QUALIFY r2 <= 50),
        fused AS (
          SELECT COALESCE(t1.doc_id, t2.doc_id) AS doc_id,
                 CAST(COALESCE(t1.r1, 0) AS BIGINT) AS rank_bm25,
                 CAST(COALESCE(t2.r2, 0) AS BIGINT) AS rank_density,
                 COALESCE(1.0::DOUBLE / (60.0::DOUBLE + CAST(t1.r1 AS DOUBLE)),
                          0.0::DOUBLE) +
                 COALESCE(1.0::DOUBLE / (60.0::DOUBLE + CAST(t2.r2 AS DOUBLE)),
                          0.0::DOUBLE) AS rrf_score
          FROM t1 FULL OUTER JOIN t2 ON t1.doc_id = t2.doc_id)
        SELECT doc_id, rank_bm25, rank_density, rrf_score
        FROM fused
        ORDER BY rrf_score DESC, doc_id
        LIMIT 10""")),

    // Content-defined chunking (CDC — the rsync/LBFS/backup-dedup
    // boundary trick) vs fixed-stride chunking, head to head on the
    // same corpus: a token starts a new chunk iff its content hash
    // satisfies h % 8 == 0, so boundaries move WITH the content and an
    // insertion near a doc's head re-chunks only its neighborhood —
    // fixed-stride (8-token) chunks after the edit all shift and dedup
    // dies. Both methods share one pipeline: boundary flag → per-doc
    // cumulative chunk id (partitioned window) → ordered chunk rebuild
    // (q88's sort-before-concat contract) → 8-byte digest → corpus-wide
    // distinct. Output one row per method with chunk counts, duplicate
    // instances, and the chars-saved dedup ratio — the CDC row's higher
    // saved-ppm on the planted near-dup corpus IS the operator's value
    // statement. Scale: one doc_id exchange for the windows, digest-key
    // hash aggs after; chunks are bounded by token count (linear).
    QueryDef(
      "q277_cdc_chunk_dedup",
      (s, dir) => {
        import graft.functions.Kernels
        val d = Tables.documents(s, dir)
        val toks = d.select(col("doc_id"),
            posexplode(tokens(col("text"))).as(Seq("pos", "tok")))
          .select(col("doc_id"), col("pos").cast("long").as("pos"), col("tok"),
            (Kernels.md5BitsMod31(Kernels.md5Bits(col("tok"))) % 8 === 0)
              .as("isb"))
        val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
        val marked = toks
          .withColumn("cdc_chunk",
            sum(when(col("isb"), 1L).otherwise(0L))
              .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("fix_chunk", expr("pos div 8"))
        def stats(chunkCol: String, label: String) = {
          val chunks = marked
            .groupBy(col("doc_id"), col(chunkCol).as("ck"))
            .agg(array_sort(collect_list(struct(col("pos"), col("tok"))))
              .as("parts"))
            .select(
              concat_ws(" ", expr("transform(parts, p -> p.tok)")).as("chunk"))
            .select(Kernels.md5Bits(col("chunk")).as("h"),
              length(col("chunk")).cast("long").as("chars"))
          val per = chunks.groupBy(col("h"))
            .agg(count(lit(1)).as("n"), max(col("chars")).as("chars"))
          per.agg(sum(col("n")).as("n_chunks"),
              count(lit(1)).as("n_distinct_chunks"),
              sum(col("n") * col("chars")).as("chars_total"),
              sum(col("chars")).as("chars_distinct"))
            .select(lit(label).as("method"), col("n_chunks"),
              col("n_distinct_chunks"),
              (col("n_chunks") - col("n_distinct_chunks")).as("dup_instances"),
              col("chars_total"), col("chars_distinct"),
              expr("((chars_total - chars_distinct) * 1000000) div chars_total")
                .as("saved_ppm"))
        }
        stats("cdc_chunk", "cdc").unionByName(stats("fix_chunk", "fixed"))
          .orderBy(col("method"))
      },
      Some("""
        WITH toks AS (
          SELECT doc_id, unnest(range(0, len(string_split(text, ' ')))) AS pos,
                 unnest(string_split(text, ' ')) AS tok
          FROM documents),
        flagged AS (
          SELECT doc_id, pos, tok,
                 (CAST(md5_number_lower(tok) % 2147483647 AS BIGINT) % 8 = 0)
                   AS isb
          FROM toks),
        marked AS (
          SELECT doc_id, pos, tok,
                 SUM(CASE WHEN isb THEN 1 ELSE 0 END)
                   OVER (PARTITION BY doc_id ORDER BY pos
                         ROWS UNBOUNDED PRECEDING) AS cdc_chunk,
                 pos // 8 AS fix_chunk
          FROM flagged),
        cdc_chunks AS (
          SELECT md5_number_lower(string_agg(tok, ' ' ORDER BY pos)) AS h,
                 CAST(len(string_agg(tok, ' ' ORDER BY pos)) AS BIGINT) AS chars
          FROM marked GROUP BY doc_id, cdc_chunk),
        fix_chunks AS (
          SELECT md5_number_lower(string_agg(tok, ' ' ORDER BY pos)) AS h,
                 CAST(len(string_agg(tok, ' ' ORDER BY pos)) AS BIGINT) AS chars
          FROM marked GROUP BY doc_id, fix_chunk),
        cdc_per AS (SELECT h, COUNT(*) AS n, MAX(chars) AS chars
                    FROM cdc_chunks GROUP BY 1),
        fix_per AS (SELECT h, COUNT(*) AS n, MAX(chars) AS chars
                    FROM fix_chunks GROUP BY 1),
        cdc_s AS (
          SELECT 'cdc' AS method, CAST(SUM(n) AS BIGINT) AS n_chunks,
                 COUNT(*) AS n_distinct_chunks,
                 CAST(SUM(n) - COUNT(*) AS BIGINT) AS dup_instances,
                 CAST(SUM(n * chars) AS BIGINT) AS chars_total,
                 CAST(SUM(chars) AS BIGINT) AS chars_distinct
          FROM cdc_per),
        fix_s AS (
          SELECT 'fixed' AS method, CAST(SUM(n) AS BIGINT) AS n_chunks,
                 COUNT(*) AS n_distinct_chunks,
                 CAST(SUM(n) - COUNT(*) AS BIGINT) AS dup_instances,
                 CAST(SUM(n * chars) AS BIGINT) AS chars_total,
                 CAST(SUM(chars) AS BIGINT) AS chars_distinct
          FROM fix_per),
        u AS (SELECT * FROM cdc_s UNION ALL SELECT * FROM fix_s)
        SELECT method, n_chunks, n_distinct_chunks, dup_instances,
               chars_total, chars_distinct,
               ((chars_total - chars_distinct) * 1000000) // chars_total
                 AS saved_ppm
        FROM u
        ORDER BY method""")),

    // Exact nDCG@10 — the graded companion to q250's binary MRR: three
    // two-term queries ranked by q172's rational BM25, graded relevance
    // = number of the query's terms a document contains (gain 2^rel−1 ∈
    // {1,3}), and the 1/log₂(rank+1) discounts PINNED as micro integers
    // (rank 1..10 → 1000000, 630929, 500000, 430676, 386852, 356207,
    // 333333, 315464, 301029, 289064 — constants evaluated once at spec
    // time, the q276 stance: no transcendental runs at query time, both
    // engines walk the same integer lattice). IDCG needs no sort: with
    // two grades it is a closed form of (n_rel2, n_rel1) over the same
    // weight table. Each query's top-10 comes from orderBy+limit
    // (TakeOrderedAndProject) + a ≤10-row rank window; per-term score
    // sums add in fixed alphabetical order on both engines.
    QueryDef(
      "q283_ndcg_at10",
      (s, dir) => {
        import org.apache.spark.sql.DataFrame
        import s.implicits._
        val queriesDef = Seq((1L, "dup", "vector"), (2L, "merge", "stream"),
          (3L, "filter", "hash"))
        val allTerms = queriesDef.flatMap(q => Seq(q._2, q._3))
        val d = Tables.documents(s, dir)
        val f = graft.operators.Bm25.termScores(d, "doc_id", "text", allTerms)
        val tf = f.tf
        val scoredT = f.scores
          .select(col("doc_id"), col("tk"), col("score_t"))
          .cutLineage()
        val weights = Seq((1L, 1000000L), (2L, 630929L), (3L, 500000L),
          (4L, 430676L), (5L, 386852L), (6L, 356207L), (7L, 333333L),
          (8L, 315464L), (9L, 301029L), (10L, 289064L)).toDF("rank", "w")
        val ranked: DataFrame = queriesDef.map { case (qid, t1, t2) =>
          val sc = scoredT.where(col("tk").isin(t1, t2))
            .groupBy(col("doc_id"))
            .agg(coalesce(max(when(col("tk") === t1, col("score_t"))),
                lit(0.0d)).as("s1"),
              coalesce(max(when(col("tk") === t2, col("score_t"))),
                lit(0.0d)).as("s2"))
            .select(col("doc_id"), (col("s1") + col("s2")).as("score"))
          sc.orderBy(col("score").desc, col("doc_id")).limit(10)
            .withColumn("rank", row_number()
              .over(Window.orderBy(col("score").desc, col("doc_id")))
              .cast("long"))
            .select(lit(qid).as("query_id"), col("doc_id"), col("rank"))
        }.reduce(_ unionByName _)
        val qt = queriesDef.flatMap(q => Seq((q._1, q._2), (q._1, q._3)))
          .toDF("query_id", "tk")
        val rel = tf.join(broadcast(qt), "tk")
          .select(col("query_id"), col("doc_id"), col("tk")).distinct()
          .groupBy(col("query_id"), col("doc_id"))
          .agg(count(lit(1)).as("rel"))
        val dcg = ranked.join(rel, Seq("query_id", "doc_id"), "left")
          .withColumn("gain",
            when(col("rel") === 2, 3L).when(col("rel") === 1, 1L).otherwise(0L))
          .join(broadcast(weights), "rank")
          .groupBy(col("query_id"))
          .agg(sum(col("gain") * col("w")).as("dcg_micro"))
        val relCounts = rel.groupBy(col("query_id"))
          .agg(sum(when(col("rel") === 2, 1L).otherwise(0L)).as("n_rel2"),
            sum(when(col("rel") === 1, 1L).otherwise(0L)).as("n_rel1"))
        val idcg = relCounts.crossJoin(broadcast(weights))
          .withColumn("c",
            when(col("rank") <= col("n_rel2"), lit(3L) * col("w"))
              .when(col("rank") <= col("n_rel2") + col("n_rel1"), col("w"))
              .otherwise(lit(0L)))
          .groupBy(col("query_id"), col("n_rel2"), col("n_rel1"))
          .agg(sum(col("c")).as("idcg_micro"))
        dcg.join(idcg, Seq("query_id"))
          .select(col("query_id"), col("n_rel1"), col("n_rel2"),
            col("dcg_micro"), col("idcg_micro"),
            expr("(dcg_micro * 1000000) div idcg_micro").as("ndcg_ppm"))
          .orderBy(col("query_id"))
      },
      Some(s"""
        WITH ${graft.operators.Bm25.scoredSql(
          "'dup','vector','merge','stream','filter','hash'")},
        qt(query_id, tk) AS (
          VALUES (1, 'dup'), (1, 'vector'), (2, 'merge'), (2, 'stream'),
                 (3, 'filter'), (3, 'hash')),
        sq AS (
          SELECT 1 AS query_id, doc_id,
                 COALESCE(MAX(CASE WHEN tk = 'dup' THEN score_t END), 0.0::DOUBLE) +
                 COALESCE(MAX(CASE WHEN tk = 'vector' THEN score_t END), 0.0::DOUBLE)
                   AS score
          FROM scored WHERE tk IN ('dup','vector') GROUP BY doc_id
          UNION ALL
          SELECT 2, doc_id,
                 COALESCE(MAX(CASE WHEN tk = 'merge' THEN score_t END), 0.0::DOUBLE) +
                 COALESCE(MAX(CASE WHEN tk = 'stream' THEN score_t END), 0.0::DOUBLE)
          FROM scored WHERE tk IN ('merge','stream') GROUP BY doc_id
          UNION ALL
          SELECT 3, doc_id,
                 COALESCE(MAX(CASE WHEN tk = 'filter' THEN score_t END), 0.0::DOUBLE) +
                 COALESCE(MAX(CASE WHEN tk = 'hash' THEN score_t END), 0.0::DOUBLE)
          FROM scored WHERE tk IN ('filter','hash') GROUP BY doc_id),
        ranked AS (
          SELECT query_id, doc_id,
                 row_number() OVER (PARTITION BY query_id
                   ORDER BY score DESC, doc_id) AS rank
          FROM sq QUALIFY rank <= 10),
        w(rank, w) AS (
          VALUES (1, 1000000), (2, 630929), (3, 500000), (4, 430676),
                 (5, 386852), (6, 356207), (7, 333333), (8, 315464),
                 (9, 301029), (10, 289064)),
        rel AS (
          SELECT q.query_id, t.doc_id, COUNT(DISTINCT t.tk) AS rel
          FROM tf t JOIN qt q USING (tk)
          GROUP BY 1, 2),
        dcg AS (
          SELECT r.query_id,
                 CAST(SUM((CASE WHEN rel.rel = 2 THEN 3
                                WHEN rel.rel = 1 THEN 1 ELSE 0 END) * w.w)
                      AS BIGINT) AS dcg_micro
          FROM ranked r
          LEFT JOIN rel ON rel.query_id = r.query_id AND rel.doc_id = r.doc_id
          JOIN w ON w.rank = r.rank
          GROUP BY 1),
        rc AS (
          SELECT query_id,
                 CAST(SUM(CASE WHEN rel = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_rel2,
                 CAST(SUM(CASE WHEN rel = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_rel1
          FROM rel GROUP BY 1),
        idcg AS (
          SELECT rc.query_id, rc.n_rel2, rc.n_rel1,
                 CAST(SUM(CASE WHEN w.rank <= rc.n_rel2 THEN 3 * w.w
                               WHEN w.rank <= rc.n_rel2 + rc.n_rel1 THEN w.w
                               ELSE 0 END) AS BIGINT) AS idcg_micro
          FROM rc CROSS JOIN w
          GROUP BY 1, 2, 3)
        SELECT CAST(d.query_id AS BIGINT) AS query_id, i.n_rel1, i.n_rel2,
               d.dcg_micro, i.idcg_micro,
               (d.dcg_micro * 1000000) // i.idcg_micro AS ndcg_ppm
        FROM dcg d JOIN idcg i USING (query_id)
        ORDER BY query_id""")),

    // Duplication PROVENANCE matrix — q269 says how much of each doc is
    // duplicated; this says WHERE the copies come from: for every source
    // pair (src_a ≤ src_b), the number of distinct 13-gram window types
    // both sources contain. The diagonal (src_a = src_b, counting types
    // appearing in ≥2 docs of the same source) separates in-house
    // boilerplate from cross-source scraping — the call that decides
    // whether dedup should run within or across provenance boundaries.
    // Scale: the (source, h) frame is the only corpus-size shuffle
    // (8-byte keys); the pair join runs on the per-hash source LISTS
    // (≤ |sources| = bounded domain), never on documents.
    QueryDef(
      "q294_dup_provenance",
      (s, dir) => {
        val d = Tables.documents(s, dir)
        val sh = TextDedup.ngramHash62(
            d.select(col("doc_id"), col("source"), tokens(col("text")).as("ws"))
              .select(col("doc_id"), col("source"), col("ws")),
            "doc_id", "ws", 13)
          .join(d.select(col("doc_id"), col("source")), Seq("doc_id"))
          .select(col("source"), col("doc_id"), col("h62").as("h"))
        // perSrc feeds the same-source dup count AND both sides of the
        // cross-source type join — materialize once (the q269 stance)
        val perSrc = sh.select(col("source"), col("doc_id"), col("h")).distinct()
          .cutLineage()
        // same-source dup types: h present in >= 2 docs of that source
        val diag = perSrc.groupBy(col("source"), col("h"))
          .agg(count(lit(1)).as("nd"))
          .where(col("nd") >= 2)
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_shared_types"))
          .select(col("source").as("src_a"), col("source").as("src_b"),
            col("n_shared_types"))
        val srcH = perSrc.select(col("source"), col("h")).distinct()
        val cross = srcH.select(col("h"), col("source").as("src_a"))
          .join(srcH.select(col("h"), col("source").as("src_b")), Seq("h"))
          .where(col("src_a") < col("src_b"))
          .groupBy(col("src_a"), col("src_b"))
          .agg(count(lit(1)).as("n_shared_types"))
        diag.unionByName(cross)
          .where(col("n_shared_types") >= 5)
          .orderBy(col("src_a"), col("src_b"))
      },
      Some("""
        WITH toks AS (
          SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents),
        th AS (
          SELECT doc_id, source, list_transform(ws,
                   t -> CAST(md5_number_lower(t) % 2147483647 AS BIGINT)) AS hs
          FROM toks WHERE len(ws) >= 13),
        sh AS (
          SELECT DISTINCT doc_id, source,
                 unnest(list_transform(range(1, len(hs) - 11),
                   i -> list_reduce(list_slice(hs, i, i + 12),
                          (a, x) -> (a * 131 + x) % 2147483647) * 2147483648 +
                        list_reduce(list_slice(hs, i, i + 12),
                          (a, x) -> (a * 137 + x) % 2147483647))) AS h
          FROM th),
        diag AS (
          SELECT source AS src_a, source AS src_b,
                 COUNT(*) AS n_shared_types
          FROM (SELECT source, h, COUNT(*) AS nd
                FROM sh GROUP BY 1, 2 HAVING COUNT(*) >= 2)
          GROUP BY 1, 2),
        srch AS (SELECT DISTINCT source, h FROM sh),
        crossed AS (
          SELECT a.source AS src_a, b.source AS src_b,
                 COUNT(*) AS n_shared_types
          FROM srch a JOIN srch b
            ON a.h = b.h AND a.source < b.source
          GROUP BY 1, 2),
        u AS (SELECT * FROM diag UNION ALL SELECT * FROM crossed)
        SELECT src_a, src_b, CAST(n_shared_types AS BIGINT) AS n_shared_types
        FROM u
        WHERE n_shared_types >= 5
        ORDER BY src_a, src_b""")))
}
