package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextKernels.tokens

/** The repo's single-source BM25 scoring lattice (q172's contract),
  * shared by every retrieval gate (q172 top-k, q273 RRF fusion, q283
  * nDCG) so a constant tweak (k1/b or the idf form) cannot desynchronize
  * them.
  *
  * Rational-idf stance: Robertson's idf ln((N-df+0.5)/(df+0.5)) is
  * engine-dependent (ln), so scores use the rational ODDS argument
  * (2(N-df)+1)/(2df+1) — exact-integer cross-multiplied, divided ONCE;
  * the double is bit-identical across engines. This makes the scheme a
  * deterministic BM25 VARIANT, not log-idf BM25: dropping the ln is a
  * monotone PER-TERM transform, so per-term rankings are preserved, but
  * multi-term SUMMED scores weight rare terms far more heavily than
  * Robertson's weighting, and multi-term top-k (q172/q273/q283,
  * api.bm25TopK) can order differently than standard BM25. The contract
  * here is cross-engine determinism and internal consistency, not
  * rank-parity with log-idf implementations. tf saturation k1=1.2,
  * length normalization b=0.75
  * (tfn = 2.2·tf / (tf + 1.2·(0.25 + 0.75·dl/avgdl))).
  *
  * Scale: tf/df/dl are three partial-aggregated passes over the exploded
  * token stream; the query side is a handful of fixed terms, so scoring
  * is a broadcast of two tiny frames (term df, 1-row corpus stats)
  * against the doc-term counts — at 100 TB the only big exchange is the
  * token-stream aggregation itself. Consumers pivot per-term scores into
  * FIXED-ORDER named columns before adding (never a float SUM aggregate,
  * whose accumulation order no engine guarantees).
  */
object Bm25 {

  /** The scoring stage's frames: per-doc length `dl` (doc_id, dl),
    * per-(doc, term) counts `tf` (doc_id, tk, tf), and the BM25 term
    * scores `scores` (doc_id, tk, dl, score_t). */
  final case class Frames(dl: DataFrame, tf: DataFrame, scores: DataFrame)

  /** Score `terms` against every document of (idCol, textCol). */
  def termScores(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String]): Frames = {
    val toks = docs.select(col(idCol), explode(tokens(col(textCol))).as("tk"))
    val dl = toks.groupBy(col(idCol)).agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    val qtoks = toks.where(col("tk").isInCollection(terms))
    val df0 = qtoks.select(col(idCol), col("tk")).distinct()
      .groupBy(col("tk")).agg(count(lit(1)).as("df"))
    val tf = qtoks.groupBy(col(idCol), col("tk")).agg(count(lit(1)).as("tf"))
    val scores = tf.join(broadcast(df0), "tk")
      .join(dl, idCol)
      .crossJoin(broadcast(stats))
      .withColumn("avgdl",
        col("sum_dl").cast("double") / col("n_docs").cast("double"))
      .withColumn("idf",
        (lit(2L) * (col("n_docs") - col("df")) + lit(1L)).cast("double") /
          (lit(2L) * col("df") + lit(1L)).cast("double"))
      .withColumn("tfn",
        (col("tf").cast("double") * lit(2.2d)) /
          (col("tf").cast("double") +
            lit(1.2d) * (lit(0.25d) +
              lit(0.75d) * col("dl").cast("double") / col("avgdl"))))
      .select(col(idCol), col("tk"), col("dl"),
        (col("idf") * col("tfn")).as("score_t"))
    Frames(dl, tf, scores)
  }

  /** Pivot per-term scores into one summed score with a FIXED textual
    * addition order (the float-determinism contract). Input must carry
    * (groupCols..., tk, score_t). */
  def pivotedScore(scores: DataFrame, groupCols: Seq[String],
      terms: Seq[String], scoreName: String): DataFrame = {
    val termAggs = terms.map(t =>
      coalesce(max(when(col("tk") === t, col("score_t"))), lit(0.0d))
        .as("s_" + t))
    scores.groupBy(groupCols.map(col): _*)
      .agg(termAggs.head, termAggs.tail: _*)
      .select(groupCols.map(col) :+
        terms.map(t => col("s_" + t)).reduce(_ + _).as(scoreName): _*)
  }

  /** Oracle twin: the CTE block toks/dl/stats/qtoks/df/tf/scored, with
    * `scored` = (doc_id, tk, dl, score_t). `termsInList` is the SQL IN
    * list body, e.g. "'dup','vector'". No trailing comma — callers splice
    * it as the head of their WITH. */
  def scoredSql(termsInList: String): String = s"""toks AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS tk FROM documents),
        dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY 1),
        stats AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl FROM dl),
        qtoks AS (SELECT * FROM toks WHERE tk IN ($termsInList)),
        df AS (SELECT tk, COUNT(DISTINCT doc_id) AS df FROM qtoks GROUP BY 1),
        tf AS (SELECT doc_id, tk, COUNT(*) AS tf FROM qtoks GROUP BY 1, 2),
        scored AS (
          SELECT t.doc_id, t.tk, l.dl,
                 CAST(2 * (s.n_docs - f.df) + 1 AS DOUBLE) /
                   CAST(2 * f.df + 1 AS DOUBLE) *
                 ((CAST(t.tf AS DOUBLE) * 2.2::DOUBLE) /
                  (CAST(t.tf AS DOUBLE) +
                   1.2::DOUBLE * (0.25::DOUBLE + 0.75::DOUBLE * CAST(l.dl AS DOUBLE) /
                     (CAST(s.sum_dl AS DOUBLE) / CAST(s.n_docs AS DOUBLE))))) AS score_t
          FROM tf t JOIN df f USING (tk) JOIN dl l USING (doc_id) CROSS JOIN stats s)"""
}
