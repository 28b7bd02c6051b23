package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.TextKernels._
import graft.operators.TextDedup
import graft.sources.Tables
import graft.plans.CheckpointPolicy.DataFrameCutOps

/** q51: the end-to-end training-data curation pipeline — per-doc quality
  * stats → quality gate → MinHash-LSH near-dup clusters → drop
  * non-canonical cluster members → per-language clean-corpus report with
  * drop accounting. The LLM-side counterpart of q47: one query
  * composing the whole curation story (every stage individually proven
  * by q24-q29/q48).
  *
  * Scale: stats are per-row; the only shuffles are the sketch build
  * (one), the LSH bucket join, the bounded component rounds, and the
  * final small aggregate. Nothing is all-pairs; the drop decision is a
  * broadcast-sized join (cluster members ≪ corpus).
  */
object CurationQueries {

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q51_corpus_curation",
      (s, dir) => {
        val d  = Tables.documents(s, dir)
        val ws = tokens(col("text"))
        val dRat = distinctRatio(ws)
        val sRat = stopwordRatio(ws, Seq("the", "a"))
        val stats = d.select(col("doc_id"), col("lang"),
          tokenCount(ws).as("n_tokens"),
          qualityScore(tokenCount(ws), dRat, sRat).as("quality"))

        // near-dup clusters over the FULL corpus (dedup before filtering,
        // the standard order: a high-quality dup of a low-quality doc
        // must still be caught)
        val shRows = TextDedup.shingleRows(
          d.select(col("doc_id"), ws.as("ws")), "doc_id", "ws", 3)
        val sig   = TextDedup.minhashSignatures(shRows, "doc_id", "_sh", 16)
        val pairs = TextDedup.lshCandidatePairs(sig, "doc_id", "sig", 4, 4)
          .select(col("id_a"), col("id_b"))
        val clusters = TextDedup.connectedComponents(pairs, "id_a", "id_b")
          .select(col("node").as("doc_id"), col("cluster_id"))

        val labeled = stats.join(clusters, Seq("doc_id"), "left")
          .select(col("doc_id"), col("lang"), col("n_tokens"), col("quality"),
            // canonical = not in a cluster, or the cluster's min member
            (col("cluster_id").isNull || col("cluster_id") === col("doc_id"))
              .as("is_canonical"),
            (col("quality") >= 0.5d).as("passes_quality"))

        labeled.groupBy(col("lang")).agg(
            count(lit(1)).as("n_docs"),
            sum(when(col("passes_quality") && col("is_canonical"), 1L).otherwise(0L)).as("n_kept"),
            sum(when(!col("is_canonical"), 1L).otherwise(0L)).as("n_dropped_neardup"),
            sum(when(!col("passes_quality") && col("is_canonical"), 1L).otherwise(0L)).as("n_dropped_quality"),
            sum(when(col("passes_quality") && col("is_canonical"), col("n_tokens"))
              .otherwise(0L)).as("kept_tokens"))
          .orderBy(col("lang"))
      },
      Some("""
        WITH RECURSIVE
        toks AS (SELECT doc_id, lang, text, string_split(text, ' ') ws FROM documents),
        stats AS (
          SELECT doc_id, lang,
                 len(ws)::BIGINT AS n_tokens,
                 (CASE WHEN len(ws) >= 20 THEN 1.0::DOUBLE ELSE len(ws)::DOUBLE / 20.0::DOUBLE END)
                   * (len(list_distinct(ws))::DOUBLE / len(ws))
                   * (CASE WHEN (len(list_filter(ws, w -> w = 'the' OR w = 'a'))::DOUBLE / len(ws))
                             BETWEEN 0.01::DOUBLE AND 0.5::DOUBLE THEN 1.0::DOUBLE ELSE 0.5::DOUBLE END)
                   AS quality
          FROM toks),
        sh AS (SELECT doc_id, list_distinct(list_transform(range(1, len(ws)-1),
                 i -> ws[i]||' '||ws[i+1]||' '||ws[i+2])) s FROM toks),
        hs AS (SELECT doc_id, list_transform(s, x -> (md5_number_lower(x) % 2147483647)::BIGINT) hv FROM sh),
        mh AS (SELECT doc_id, list_transform(range(0,16),
                 i -> list_min(list_transform(hv, h -> ((999983*i + 1000003)*h + 998244353*i) % 2147483647))) sig FROM hs),
        bands AS (SELECT doc_id, sig, b,
                 md5(sig[b*4+1]::VARCHAR || '|' || sig[b*4+2]::VARCHAR || '|' || sig[b*4+3]::VARCHAR || '|' || sig[b*4+4]::VARCHAR) bkey
                 FROM mh, (SELECT unnest(range(0,4)) b)),
        pairs AS (SELECT DISTINCT a.doc_id id_a, b.doc_id id_b
                  FROM bands a JOIN bands b ON a.b = b.b AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
        edges AS (SELECT id_a AS u, id_b AS v FROM pairs UNION SELECT id_b, id_a FROM pairs),
        reach AS (
          SELECT u AS node, u AS reachable FROM edges
          UNION
          SELECT r.node, e.v FROM reach r JOIN edges e ON e.u = r.reachable),
        clusters AS (SELECT node AS doc_id, MIN(reachable) AS cluster_id FROM reach GROUP BY node),
        labeled AS (
          SELECT s.doc_id, s.lang, s.n_tokens, s.quality,
                 (c.cluster_id IS NULL OR c.cluster_id = s.doc_id) AS is_canonical,
                 (s.quality >= 0.5::DOUBLE) AS passes_quality
          FROM stats s LEFT JOIN clusters c ON c.doc_id = s.doc_id)
        SELECT lang,
               COUNT(*) AS n_docs,
               CAST(SUM(CASE WHEN passes_quality AND is_canonical THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
               CAST(SUM(CASE WHEN NOT is_canonical THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped_neardup,
               CAST(SUM(CASE WHEN NOT passes_quality AND is_canonical THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped_quality,
               CAST(SUM(CASE WHEN passes_quality AND is_canonical THEN n_tokens ELSE 0 END) AS BIGINT) AS kept_tokens
        FROM labeled
        GROUP BY lang
        ORDER BY lang""")),

    // Token deny-list filtering — the blocklist pass every corpus
    // pipeline runs (bad-words / NSFW / boilerplate markers), done the
    // SCALE way: a BROADCAST hash semi-join of the per-doc distinct
    // token stream against the list, NOT an N-pattern regex alternation
    // re-scanned per document (regex cost grows with the list; the
    // hash join doesn't). The list here is DERIVED deterministically
    // (top-10 document-frequency tokens of length ≥ 5, ties broken by
    // token — a vocab-sized aggregate + top-k, the same discovery
    // shape as stopword induction); production swaps in a curated
    // input table, the plumbing is identical. Per-source audit: docs
    // flagged, hit mass, surviving token mass — the accounting a
    // filtering stage must publish. Scale: one distinct (doc, token)
    // shuffle, one vocab-sized partial aggregate, one broadcast join;
    // per-doc token sets never sit on one partition.
    QueryDef(
      "q339_blocklist_filter",
      (s, dir) => {
        val d = Tables.documents(s, dir)
          .select(col("doc_id"), col("source"), tokens(col("text")).as("ws"))
        // feeds the df-derivation AND the hit join — sanctioned cut
        val docTok = d
          .select(col("doc_id"), explode(col("ws")).as("tok")).distinct()
          .cutLineage()
        val block = docTok.where(length(col("tok")) >= 5)
          .groupBy(col("tok")).agg(count(lit(1)).as("df"))
          .orderBy(col("df").desc, col("tok")).limit(10)
        val hits = docTok
          .join(broadcast(block.select(col("tok"))), Seq("tok"))
          .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hit"))
        d.select(col("doc_id"), col("source"),
            size(col("ws")).cast("long").as("n_toks"))
          .join(hits, Seq("doc_id"), "left")
          .groupBy(col("source")).agg(
            count(lit(1)).as("n_docs"),
            sum(when(col("n_hit").isNotNull, 1L).otherwise(0L))
              .as("n_flagged"),
            sum(coalesce(col("n_hit"), lit(0L))).as("blocked_token_hits"),
            sum(when(col("n_hit").isNull, col("n_toks")).otherwise(0L))
              .as("kept_token_mass"))
          .withColumn("flagged_ppm",
            expr("(n_flagged * 1000000) div n_docs"))
          .orderBy(col("source"))
      },
      Some("""
        WITH toks AS (
          SELECT doc_id, source, string_split(text, ' ') AS ws
          FROM documents),
        dt AS (
          SELECT DISTINCT doc_id, tok FROM (
            SELECT doc_id, unnest(ws) AS tok FROM toks)),
        block AS (
          SELECT tok FROM (
            SELECT tok, COUNT(*) AS df
            FROM dt WHERE length(tok) >= 5 GROUP BY 1)
          ORDER BY df DESC, tok LIMIT 10),
        hits AS (
          SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_hit
          FROM dt JOIN block USING (tok) GROUP BY 1),
        docs AS (
          SELECT t.doc_id, t.source, CAST(len(t.ws) AS BIGINT) AS n_toks,
                 h.n_hit
          FROM toks t LEFT JOIN hits h ON t.doc_id = h.doc_id)
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN n_hit IS NOT NULL THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_flagged,
               CAST(SUM(COALESCE(n_hit, 0)) AS BIGINT)
                 AS blocked_token_hits,
               CAST(SUM(CASE WHEN n_hit IS NULL THEN n_toks ELSE 0 END)
                 AS BIGINT) AS kept_token_mass,
               (CAST(SUM(CASE WHEN n_hit IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) * 1000000) // COUNT(*) AS flagged_ppm
        FROM docs
        GROUP BY source
        ORDER BY source""")))
}
