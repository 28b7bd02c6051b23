package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.TextKernels._
import graft.operators.TextDedup
import graft.sources.Tables

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
        ORDER BY lang""")))
}
