package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.Scoring
import graft.sources.Tables

/** Hashed-linear quality-classifier gate: a deterministic (bucket,
  * weight) model table applied to the documents corpus via the
  * broadcast-join scorer — the shape of every classifier-based quality
  * filter. Weights are a fixed integer formula so the oracle rebuilds
  * the identical model; scores are exact BIGINTs.
  */
object ScoringQueries {

  val defs: Seq[QueryDef] = Seq(
    // The model is deliberately SPARSE (roughly a third of the 1024
    // buckets carry a weight): tokens that miss the model contribute 0
    // via the scorer's left join, and n_docs per source must still
    // equal the corpus — the every-document-scores contract.
    QueryDef(
      "q402_quality_classifier",
      (s, dir) => {
        val w = s.range(1024).where(pmod(col("id"), lit(3)) === 0)
          .select(col("id").cast("long").as("bkt"),
            ((col("id") * 37) % 21 - 10).cast("long").as("wgt"))
        val scored = Scoring.hashedLinearScore(Tables.documents(s, dir),
          Seq("doc_id", "source"), "text", w, numBuckets = 1024,
          bias = 3L, salt = "qc:")
        scored.groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("score") > 0, 1L).otherwise(0L)).as("n_positive"),
            sum(col("score")).as("score_sum"))
          .orderBy(col("source"))
      },
      Some("""
        WITH toks AS (
          SELECT doc_id, source, unnest(string_split(text, ' ')) AS w
          FROM documents),
        hashed AS (
          SELECT doc_id, source,
                 CAST(md5_number_lower('qc:' || w) % 1024 AS BIGINT) AS bkt
          FROM toks),
        wt AS (SELECT range AS bkt, (range * 37) % 21 - 10 AS wgt
               FROM range(1024) WHERE range % 3 = 0),
        scored AS (
          SELECT doc_id, source, SUM(COALESCE(wgt, 0)) + 3 AS score
          FROM hashed LEFT JOIN wt USING (bkt) GROUP BY 1, 2)
        SELECT source, COUNT(*) AS n_docs,
               CAST(SUM(CASE WHEN score > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_positive,
               CAST(SUM(score) AS BIGINT) AS score_sum
        FROM scored GROUP BY source
        ORDER BY source""")))
}
