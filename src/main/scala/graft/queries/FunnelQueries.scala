package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Kernels.md5Lower64
import graft.functions.TextKernels._
import graft.operators.Similarity
import graft.sources.Tables

/** Round-4 batch 4 — the two remaining classification-flavored steps of
  * a pretraining data pipeline:
  *
  *  - q92: C4-style quality-filter FUNNEL — the ordered cascade of
  *    cheap heuristics every web corpus passes through, reported as
  *    per-stage attrition (how many docs each rule removes, of those
  *    that survived the previous rules). One pass, one aggregate.
  *  - q93: k-NN label propagation — semi-supervised classification of
  *    unlabeled documents from a small labeled seed set via embedding
  *    neighbors; the standard bootstrap for quality/domain classifiers
  *    when labels are scarce. Gated on the full confusion matrix
  *    (pure integer counts — no double aggregation anywhere).
  */
object FunnelQueries {

  private def dotSql(a: String, b: String): String =
    s"list_reduce(list_transform(range(1,65), i -> $a[i]::DOUBLE * $b[i]::DOUBLE), (x,y)->x+y)"

  val defs: Seq[QueryDef] = Seq(

    // Quality funnel with ordered short-circuit semantics: stage 1
    // length (≥ 20 tokens), stage 2 mean token length (≥ 5.2 chars),
    // stage 3 repetition (dup 3-shingle ratio < 0.015), stage 4 marker
    // density (topic-marker tokens ≥ 30% — the corpus's lang-ID
    // stand-in). Each doc is attributed to the FIRST stage that
    // rejects it — the funnel report every filtering pipeline
    // publishes. Thresholds are corpus calibration (config at scale,
    // chosen here so every stage has non-zero attrition); stages 1-2
    // are pure per-row arithmetic, stage 3 reuses the q59 two-level
    // shingle agg (one token-stream shuffle), the report is a tiny agg.
    QueryDef(
      "q92_quality_funnel",
      (s, dir) => {
        val d = Tables.documents(s, dir)
        val base = d.select(col("doc_id"), col("lang"),
          col("text"), tokens(col("text")).as("ws"))
          .select(col("doc_id"), col("lang"),
            size(col("ws")).cast("long").as("n_tokens"),
            (length(col("text")).cast("double") / size(col("ws")))
              .as("mean_tok_len"),
            (markerCount(col("ws"), Seq("query", "scan", "filter", "join")) +
              markerCount(col("ws"), Seq("data", "table", "row", "column")) +
              markerCount(col("ws"), Seq("fast", "slow", "batch", "hash")))
              .as("markers"))
        // stage-3 input: dup-shingle ratio per doc (q59's shape)
        val shRows = graft.operators.TextDedup.shingleRows(
          d.select(col("doc_id"), tokens(col("text")).as("ws")), "doc_id", "ws", 3)
        val rep = shRows.groupBy(col("doc_id"), col("_sh"))
          .agg(count(lit(1)).as("cnt"))
          .groupBy(col("doc_id"))
          .agg(sum(col("cnt")).as("n_sh"), count(lit(1)).as("n_dist"))
          .select(col("doc_id"),
            ((col("n_sh") - col("n_dist")).cast("double") / col("n_sh"))
              .as("dup_ratio"))
        val staged = base.join(rep, Seq("doc_id"), "left")
          .select(col("doc_id"), col("lang"), col("n_tokens"), col("markers"),
            col("mean_tok_len"), coalesce(col("dup_ratio"), lit(0.0d)).as("dup_ratio"))
          .select(col("doc_id"),
            when(col("n_tokens") < 20, "s1_too_short")
              .when(col("mean_tok_len") < lit(5.2d), "s2_short_tokens")
              .when(col("dup_ratio") >= lit(0.015d), "s3_repetitive")
              .when(col("markers").cast("double") / col("n_tokens") < lit(0.30d),
                "s4_low_marker_density")
              .otherwise("kept").as("stage"))
        staged.groupBy(col("stage"))
          .agg(count(lit(1)).as("n_docs"), sum(col("doc_id")).as("doc_id_sum"))
          .orderBy(col("stage"))
      },
      Some("""
        WITH base AS (
          SELECT doc_id, lang,
                 len(string_split(text, ' '))::BIGINT AS n_tokens,
                 length(text)::DOUBLE / len(string_split(text, ' ')) AS mean_tok_len,
                 len(list_filter(string_split(text, ' '), w ->
                   w IN ('query','scan','filter','join','data','table','row',
                         'column','fast','slow','batch','hash')))::BIGINT AS markers,
                 string_split(text, ' ') AS ws
          FROM documents),
        sh AS (
          SELECT doc_id, list_transform(range(1, len(ws)-1),
                   i -> ws[i]||' '||ws[i+1]||' '||ws[i+2]) AS s
          FROM base),
        rep AS (
          SELECT doc_id,
                 CASE WHEN len(s) > 0 THEN
                   (len(s) - len(list_distinct(s)))::DOUBLE / len(s)
                 ELSE 0.0 END AS dup_ratio
          FROM sh),
        staged AS (
          SELECT b.doc_id,
                 CASE WHEN b.n_tokens < 20 THEN 's1_too_short'
                      WHEN b.mean_tok_len < 5.2 THEN 's2_short_tokens'
                      WHEN coalesce(r.dup_ratio, 0.0) >= 0.015 THEN 's3_repetitive'
                      WHEN b.markers::DOUBLE / b.n_tokens < 0.30 THEN 's4_low_marker_density'
                      ELSE 'kept' END AS stage
          FROM base b LEFT JOIN rep r USING (doc_id))
        SELECT stage, COUNT(*) AS n_docs,
               CAST(SUM(doc_id) AS BIGINT) AS doc_id_sum
        FROM staged
        GROUP BY stage
        ORDER BY stage""")),

    // 5-NN label propagation. Seeds = a FIXED-SIZE labeled pool (the
    // 128 lowest deterministic doc hashes — labels are scarce and do
    // NOT grow with the corpus; a rate-based pool made eval×seeds
    // quadratic, tri-scale alpha 1.74 / 97 s at sf1, caught by the
    // curvature sweep). Every other vector is classified by majority
    // vote of its 5 nearest seeds (exact cosine, codegen'd VectorDot).
    // The BROADCAST side is the seed set — at 100 TB the unlabeled
    // corpus streams past a small labeled matrix, which is the right
    // dataflow for bootstrap classification (the reverse — broadcasting
    // the corpus — is impossible). The seed pick itself is a global
    // top-k (TakeOrdered — never a full sort). Vote ties break toward
    // the smaller label; the gate hashes the full confusion matrix
    // (true × predicted counts) — integers only, so cross-engine
    // determinism never rests on double aggregation.
    QueryDef(
      "q93_label_propagation",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        val tagged = e.select(col("vec_id"), col("embedding"),
          col("label").cast("long").as("label"),
          md5Lower64(concat(lit("seed:"), col("vec_id"))).as("h"))
        val seeds = tagged.orderBy(col("h"), col("vec_id")).limit(128)
          .select(col("vec_id").as("s_id"), col("embedding").as("s_vec"),
            col("label").as("s_label"))
        val eval = tagged
          .join(seeds.select(col("s_id").as("vec_id")), Seq("vec_id"), "left_anti")
          .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"),
            col("label").as("true_label"))
        val scored = eval.crossJoin(broadcast(seeds))
          .select(col("q_id"), col("true_label"), col("s_label"),
            Similarity.cosine(col("q_vec"), col("s_vec")).as("cos"), col("s_id"))
        val w = Window.partitionBy(col("q_id"))
          .orderBy(col("cos").desc, col("s_id"))
        val top5 = scored
          .select(col("q_id"), col("true_label"), col("s_label"),
            row_number().over(w).as("rnk"))
          .where(col("rnk") <= 5)
        val votes = top5.groupBy(col("q_id"), col("true_label"), col("s_label"))
          .agg(count(lit(1)).as("votes"))
        val wv = Window.partitionBy(col("q_id"))
          .orderBy(col("votes").desc, col("s_label"))
        val pred = votes
          .select(col("q_id"), col("true_label"), col("s_label"), col("votes"),
            row_number().over(wv).as("vr"))
          .where(col("vr") === 1)
        pred.groupBy(col("true_label"), col("s_label").as("predicted_label"))
          .agg(count(lit(1)).as("n_docs"))
          .orderBy(col("true_label"), col("predicted_label"))
      },
      Some(s"""
        WITH tagged AS (
          SELECT vec_id, embedding, CAST(label AS BIGINT) AS label,
                 md5_number_lower('seed:' || vec_id) AS h
          FROM embeddings),
        seeds AS (
          SELECT vec_id s_id, embedding s_vec, label s_label
          FROM tagged ORDER BY h, vec_id LIMIT 128),
        eval AS (
          SELECT vec_id q_id, embedding q_vec, label true_label
          FROM tagged WHERE vec_id NOT IN (SELECT s_id FROM seeds)),
        scored AS (
          SELECT q_id, true_label, s_label, s_id,
                 ${dotSql("q_vec", "s_vec")}
                   / (sqrt(${dotSql("q_vec", "q_vec")}) * sqrt(${dotSql("s_vec", "s_vec")}))
                   AS cos
          FROM eval CROSS JOIN seeds),
        top5 AS (
          SELECT q_id, true_label, s_label,
                 row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, s_id) AS rnk
          FROM scored QUALIFY rnk <= 5),
        votes AS (
          SELECT q_id, true_label, s_label, COUNT(*) AS votes
          FROM top5 GROUP BY 1, 2, 3),
        pred AS (
          SELECT q_id, true_label, s_label,
                 row_number() OVER (PARTITION BY q_id
                                    ORDER BY votes DESC, s_label) AS vr
          FROM votes QUALIFY vr = 1)
        SELECT true_label, s_label AS predicted_label, COUNT(*) AS n_docs
        FROM pred
        GROUP BY 1, 2
        ORDER BY true_label, predicted_label""")),

    // Conversion-latency histogram: per user, FIRST signup → first
    // purchase AT-OR-AFTER it, latency in whole hours (integer
    // epoch-µs floor division — no timestamp-rounding drift), bucketed
    // into capped day bins. The time-to-convert distribution is the
    // funnel metric q98's step counts don't expose. One user_id
    // partial-agg (min signup, min qualifying purchase via conditional
    // min) + an 8-row histogram frame. Users who never convert are
    // counted in a sentinel bucket (-1) so the frame accounts for the
    // whole cohort — the silent-drop trap a plain inner join would hit.
    QueryDef(
      "q215_time_to_convert",
      (s, dir) => {
        val e = Tables.events(s, dir)
        val su = e.where(col("event_type") === "signup")
          .groupBy(col("user_id")).agg(min(unix_micros(col("ts"))).as("s_us"))
        val pu = e.where(col("event_type") === "purchase")
          .select(col("user_id"), unix_micros(col("ts")).as("p_us"))
        val conv = su.join(pu, Seq("user_id"), "left")
          .groupBy(col("user_id"), col("s_us"))
          .agg(min(when(col("p_us") >= col("s_us"), col("p_us"))).as("c_us"))
        val bucketed = conv
          .withColumn("lat_us", col("c_us") - col("s_us")) // `/` on longs is double division — div below
          .select(
            when(col("c_us").isNull, lit(-1L))
              .otherwise(least(expr("lat_us div 86400000000"), lit(7L))).as("day_bucket"),
            expr("lat_us div 3600000000").as("hours"))
        bucketed.groupBy(col("day_bucket"))
          .agg(count(lit(1)).as("n_users"),
            min(col("hours")).as("min_hours"),
            max(col("hours")).as("max_hours"))
          .orderBy(col("day_bucket"))
      },
      Some("""
        WITH su AS (
          SELECT user_id, MIN(epoch_us(ts)) AS s_us
          FROM events WHERE event_type = 'signup' GROUP BY 1),
        pu AS (
          SELECT user_id, epoch_us(ts) AS p_us
          FROM events WHERE event_type = 'purchase'),
        conv AS (
          SELECT su.user_id, su.s_us,
                 MIN(CASE WHEN pu.p_us >= su.s_us THEN pu.p_us END) AS c_us
          FROM su LEFT JOIN pu ON pu.user_id = su.user_id
          GROUP BY 1, 2),
        bucketed AS (
          SELECT CASE WHEN c_us IS NULL THEN -1
                      ELSE LEAST((c_us - s_us) // 86400000000, 7) END AS day_bucket,
                 (c_us - s_us) // 3600000000 AS hours
          FROM conv)
        SELECT CAST(day_bucket AS BIGINT) AS day_bucket,
               CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(MIN(hours) AS BIGINT) AS min_hours,
               CAST(MAX(hours) AS BIGINT) AS max_hours
        FROM bucketed
        GROUP BY 1
        ORDER BY 1""")))
}
