package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Kernels
import graft.functions.Kernels.{md5Bits, md5BitsModK, md5Lower64}
import graft.functions.TextKernels._
import graft.sources.Tables

/** Corpus-preparation operators round 4: overlapping-window document
  * chunking (the tokenize-and-window step every pretraining pipeline
  * runs), rational BM25-style term scoring (transcendental-free so both
  * engines agree bit-for-bit — same stance as q75), and deterministic
  * per-language stratified rebalancing (downsample the dominant
  * language at a fixed hash rate).
  */
object CorpusQueries {

  val defs: Seq[QueryDef] = Seq(

    // Overlapping chunk windows: W=30 tokens, stride S=20 (10-token
    // overlap). One posexplode over the per-doc start sequence — the
    // token stream shuffles ONCE on doc_id at the split, chunk
    // assembly is a codegen'd slice+concat projection, and chunk count
    // is ceil(n/S) per doc so output scales linearly with the corpus.
    QueryDef(
      "q81_doc_chunking",
      (s, dir) => {
        val d = Tables.documents(s, dir)
        val ws = tokens(col("text"))
        val t = d.select(col("doc_id"), ws.as("ws"), size(ws).as("n"))
        t.select(col("doc_id"), col("ws"), col("n"),
            posexplode(sequence(lit(0), col("n") - 1, lit(20)))
              .as(Seq("chunk_idx", "start")))
          .select(col("doc_id"),
            col("chunk_idx").cast("long").as("chunk_idx"),
            concat_ws(" ", slice(col("ws"), col("start") + 1, lit(30)))
              .as("chunk_text"),
            least(lit(30), col("n") - col("start")).cast("long")
              .as("chunk_tokens"))
          .orderBy(col("doc_id"), col("chunk_idx"))
      },
      Some("""
        WITH toks AS (
          SELECT doc_id, string_split(text, ' ') AS ws,
                 len(string_split(text, ' ')) AS n
          FROM documents),
        starts AS (
          SELECT doc_id, ws, n, unnest(range(0, n, 20)) AS start FROM toks)
        SELECT doc_id,
               CAST(start // 20 AS BIGINT) AS chunk_idx,
               array_to_string(list_slice(ws, start + 1, least(start + 30, n)), ' ') AS chunk_text,
               CAST(least(30, n - start) AS BIGINT) AS chunk_tokens
        FROM starts
        ORDER BY doc_id, chunk_idx""")),

    // Rational BM25-style salient terms: tf × (N−df+0.5)/(df+0.5),
    // top 5 per doc. Deliberately NO ln(): IEEE add/sub/mul/div are
    // bit-deterministic across engines, transcendentals are not (the
    // q75 stance). Shape: one token-stream shuffle for tf, a tiny df
    // aggregate that broadcasts back onto tf, a 1-row count cross
    // join, and a per-doc top-k window — at 100 TB the df/vocab side
    // stays broadcast-sized while tf scales with the corpus.
    QueryDef(
      "q82_salient_terms",
      (s, dir) => {
        val d = Tables.documents(s, dir)
        val toks = d.select(col("doc_id"), explode(tokens(col("text"))).as("term"))
        val tf = toks.groupBy(col("doc_id"), col("term"))
          .agg(count(lit(1)).as("tf"))
        val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
        val n = d.agg(count(lit(1)).as("n"))
        val scored = tf.join(broadcast(df), Seq("term"))
          .crossJoin(broadcast(n))
          .select(col("doc_id"), col("term"), col("tf"), col("df"),
            (col("tf").cast("double") *
              ((col("n") - col("df") + lit(0.5d)) / (col("df") + lit(0.5d))))
              .as("score"))
        val w = Window.partitionBy(col("doc_id"))
          .orderBy(col("score").desc, col("term"))
        scored.select(col("doc_id"), row_number().over(w).cast("long").as("rank"),
            col("term"), col("tf"), col("df"), col("score"))
          .where(col("rank") <= 5)
          .orderBy(col("doc_id"), col("rank"))
      },
      Some("""
        WITH toks AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
        df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
        n AS (SELECT COUNT(*) AS n FROM documents),
        scored AS (
          SELECT t.doc_id, t.term, t.tf, d.df,
                 (t.tf::DOUBLE) * (((n.n - d.df) + 0.5::DOUBLE) / (d.df + 0.5::DOUBLE)) AS score
          FROM tf t JOIN df d USING (term) CROSS JOIN n),
        ranked AS (
          SELECT doc_id, term, tf, df, score,
                 row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rank
          FROM scored)
        SELECT doc_id, CAST(rank AS BIGINT) AS rank, term,
               CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df, score
        FROM ranked WHERE rank <= 5
        ORDER BY doc_id, rank""")),

    // Deterministic stratified rebalancing: downsample the dominant
    // language (en keeps 300‰, everything else 1000‰) by hash bucket —
    // the standard corpus-mix step before pretraining. Membership is a
    // pure function of doc_id (md5-u64 mod 1000, DuckDB-parity), so the
    // sample is reproducible on any cluster at any parallelism; the
    // gate checks per-language counts AND a doc_id checksum of the
    // kept set, not just sizes.
    QueryDef(
      "q83_stratified_sample",
      (s, dir) => {
        val d = Tables.documents(s, dir)
        val keepPerMille = when(col("lang") === "en", lit(300L)).otherwise(lit(1000L))
        val bucket = md5BitsModK(md5Bits(concat(lit("sample:"), col("doc_id"))), 1000L)
        d.select(col("doc_id"), col("lang"), col("n_chars"),
            bucket.as("bucket"), keepPerMille.as("keep_pm"))
          .where(col("bucket") < col("keep_pm"))
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_kept"),
            sum(col("doc_id")).as("kept_id_sum"),
            sum(col("n_chars")).as("kept_chars"))
          .orderBy(col("lang"))
      },
      Some("""
        WITH b AS (
          SELECT doc_id, lang, n_chars,
                 CAST(md5_number_lower('sample:' || doc_id) % 1000 AS BIGINT) AS bucket,
                 CASE WHEN lang = 'en' THEN 300 ELSE 1000 END AS keep_pm
          FROM documents)
        SELECT lang, COUNT(*) AS n_kept,
               CAST(SUM(doc_id) AS BIGINT) AS kept_id_sum,
               CAST(SUM(n_chars) AS BIGINT) AS kept_chars
        FROM b WHERE bucket < keep_pm
        GROUP BY lang
        ORDER BY lang""")),

    // Int8 scalar quantization of the embedding column — the storage
    // step that shrinks a 100 TB float table 4×. Per-vector absmax
    // scale, code = floor(x/scale + 0.5) (floor is IEEE-exact on both
    // engines; round() is not guaranteed to tie-break identically).
    // Shape: posexplode → one hash shuffle on vec_id for the scale agg;
    // the code/error agg reuses the same partitioning (exchange reuse,
    // no second shuffle family). Gate checks the code checksum AND the
    // max dequantization error, not just shapes.
    QueryDef(
      "q84_embed_quantize",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        val ex = e.select(col("vec_id"), explode(col("embedding")).as("xf"))
          .select(col("vec_id"), col("xf").cast("double").as("x"))
        val sc = ex.groupBy(col("vec_id"))
          .agg((max(abs(col("x"))) / lit(127.0d)).as("scale"))
        val qd = ex.join(sc, Seq("vec_id"))
          .select(col("vec_id"), col("x"), col("scale"),
            when(col("scale") === 0d, lit(0.0d))
              .otherwise(floor(col("x") / col("scale") + lit(0.5d))).as("q"))
        qd.groupBy(col("vec_id"), col("scale"))
          .agg(sum(col("q")).cast("long").as("q_sum"),
            min(col("q")).cast("long").as("q_min"),
            max(col("q")).cast("long").as("q_max"),
            max(abs(col("x") - col("q") * col("scale"))).as("max_err"))
          .orderBy(col("vec_id"))
      },
      Some("""
        WITH ex AS (
          SELECT vec_id, unnest(embedding)::DOUBLE AS x FROM embeddings),
        sc AS (
          SELECT vec_id, max(abs(x)) / CAST(127 AS DOUBLE) AS scale
          FROM ex GROUP BY 1),
        qd AS (
          SELECT e.vec_id, e.x, s.scale,
                 CASE WHEN s.scale = 0 THEN CAST(0 AS DOUBLE)
                      ELSE floor(e.x / s.scale + 0.5::DOUBLE) END AS q
          FROM ex e JOIN sc s USING (vec_id))
        SELECT vec_id, scale,
               CAST(SUM(q) AS BIGINT) AS q_sum,
               CAST(MIN(q) AS BIGINT) AS q_min,
               CAST(MAX(q) AS BIGINT) AS q_max,
               MAX(abs(x - q * scale)) AS max_err
        FROM qd
        GROUP BY vec_id, scale
        ORDER BY vec_id""")),

    // Inverted index (term → posting list): df, total tf, and the first
    // 10 doc ids per term. One token-stream shuffle for the per-doc tf,
    // one tiny per-term aggregate; posting arrays are explicitly sorted
    // then truncated so the output is deterministic at any parallelism
    // (collect_list alone is arrival-ordered — never gate on it raw).
    QueryDef(
      "q85_inverted_index",
      (s, dir) => {
        val d = Tables.documents(s, dir)
        val tf = d.select(col("doc_id"), explode(tokens(col("text"))).as("term"))
          .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
        tf.groupBy(col("term"))
          .agg(count(lit(1)).as("df"),
            sum(col("tf")).as("total_tf"),
            array_join(slice(sort_array(collect_list(col("doc_id"))), 1, 10)
              .cast("array<string>"), ",").as("postings"))
          .orderBy(col("term"))
      },
      Some("""
        WITH toks AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        tf AS (
          SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2)
        SELECT term, COUNT(*) AS df,
               CAST(SUM(tf) AS BIGINT) AS total_tf,
               array_to_string(list_slice(list_sort(list(doc_id)), 1, 10), ',') AS postings
        FROM tf
        GROUP BY term
        ORDER BY term""")),

    // Vocabulary OOV coverage: build the top-500 term vocabulary
    // (frequency with term-asc tiebreak, so the cut is deterministic),
    // then measure per-language out-of-vocabulary token mass — the
    // tokenizer-fit audit run before committing a vocab to a pretraining
    // corpus. The vocab side is top-k-bounded → broadcast; the token
    // stream joins it map-side, so the only shuffles are the tf aggregate
    // and the final per-language rollup. All outputs exact integers.
    QueryDef(
      "q112_vocab_coverage",
      (s, dir) => {
        val d = Tables.documents(s, dir)
        val toks = d.select(col("doc_id"), col("lang"),
          explode(tokens(col("text"))).as("term"))
        val vocab = toks.groupBy(col("term")).agg(count(lit(1)).as("tf"))
          .orderBy(col("tf").desc, col("term")).limit(500)
          .select(col("term"), lit(true).as("in_vocab"))
        toks.join(broadcast(vocab), Seq("term"), "left")
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_tokens"),
            sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"),
            countDistinct(col("doc_id")).as("n_docs"))
          .orderBy(col("lang"))
      },
      Some("""
        WITH toks AS (
          SELECT doc_id, lang, unnest(string_split(text, ' ')) AS term
          FROM documents),
        vocab AS (
          SELECT term FROM (
            SELECT term, COUNT(*) AS tf FROM toks GROUP BY 1)
          ORDER BY tf DESC, term LIMIT 500)
        SELECT t.lang, COUNT(*) AS n_tokens,
               CAST(SUM(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
               COUNT(DISTINCT t.doc_id) AS n_docs
        FROM toks t LEFT JOIN vocab v USING (term)
        GROUP BY t.lang
        ORDER BY t.lang""")),

    // Per-group fixed-SIZE deterministic sample: exactly 20 docs per
    // language, picked by hash order (md5-u64 ascending, doc_id
    // tiebreak) — the eval-set construction step where rate-based
    // sampling (q83) can't hit an exact budget. Membership is a pure
    // function of doc_id, so regenerating on a grown corpus keeps the
    // sample stable except where new docs hash below the per-group
    // cut — and the window is partitioned by lang (parallel), never
    // global. Gate sums the sampled ids per group.
    QueryDef(
      "q118_group_sample",
      (s, dir) => {
        val hOrd = Kernels.md5BitsOrderable(
          Kernels.md5Bits(concat(lit("gs:"), col("doc_id"))))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("lang")).orderBy(col("h"), col("doc_id"))
        Tables.documents(s, dir)
          .select(col("doc_id"), col("lang"), col("n_chars"), hOrd.as("h"))
          .withColumn("rn", row_number().over(w))
          .where(col("rn") <= 20)
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_sampled"),
            sum(col("doc_id")).as("sample_id_sum"),
            sum(col("n_chars")).as("sample_chars"))
          .orderBy(col("lang"))
      },
      Some("""
        WITH ranked AS (
          SELECT doc_id, lang, n_chars,
                 row_number() OVER (PARTITION BY lang
                   ORDER BY md5_number_lower('gs:' || doc_id), doc_id) AS rn
          FROM documents)
        SELECT lang, COUNT(*) AS n_sampled,
               CAST(SUM(doc_id) AS BIGINT) AS sample_id_sum,
               CAST(SUM(n_chars) AS BIGINT) AS sample_chars
        FROM ranked WHERE rn <= 20
        GROUP BY lang
        ORDER BY lang""")),

    // Document-length histogram + CDF: fixed-width 200-char bins (pure
    // integer div — no quantile state), then cumulative counts via a
    // window over the BIN table (bounded rows, never the corpus). The
    // curriculum/length-budget audit every pretraining mix runs; the
    // cumulative share is gated as an exact cross-multiplied permille.
    QueryDef(
      "q119_length_histogram",
      (s, dir) => {
        val d = Tables.documents(s, dir)
        val bins = d.selectExpr("n_chars div 200 AS bin", "n_chars")
          .groupBy(col("bin"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("bin_chars"))
        val w = Window.orderBy(col("bin"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wAll = Window.orderBy(col("bin"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        bins.withColumn("cum_docs", sum(col("n_docs")).over(w))
          .withColumn("total", sum(col("n_docs")).over(wAll)) // bin table only — bounded
          .selectExpr("bin", "n_docs", "bin_chars", "cum_docs",
            "(cum_docs * 1000) div total AS cum_permille")
          .orderBy(col("bin"))
      },
      Some("""
        WITH bins AS (
          SELECT CAST(n_chars // 200 AS BIGINT) AS bin,
                 COUNT(*) AS n_docs,
                 CAST(SUM(n_chars) AS BIGINT) AS bin_chars
          FROM documents GROUP BY 1),
        t AS (SELECT COUNT(*) AS total FROM documents)
        SELECT bin, n_docs, bin_chars,
               CAST(SUM(n_docs) OVER (ORDER BY bin
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_docs,
               CAST((CAST(SUM(n_docs) OVER (ORDER BY bin
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) * 1000)
                 // t.total AS BIGINT) AS cum_permille
        FROM bins, t
        ORDER BY bin""")),

    // Cross-source n-gram novelty — the "is another crawl dump worth
    // ingesting" audit: process sources in id order and measure, for
    // each one, how many of its distinct 5-grams are NOVEL (first seen
    // there) vs already covered by earlier sources, plus the cumulative
    // vocabulary curve. The diminishing-returns signal that decides
    // corpus-acquisition spend. Grams ride the string-free Horner-fold
    // hashes (TextDedup.ngramHash62, q87's k=13 contract at k=5) — no
    // 5-gram string is ever materialized. 100 TB: one token-stream
    // shuffle per doc for hashing, one (source, h) distinct + one
    // min-per-h partial agg on the 8-byte key; the per-source frame is
    // |sources| rows, so the cumulative window is bounded-global.
    QueryDef(
      "q224_source_novelty",
      (s, dir) => {
        val d = Tables.documents(s, dir)
          .select(col("doc_id"), col("source"), tokens(col("text")).as("ws"))
        val grams = graft.operators.TextDedup
          .ngramHash62(d, "doc_id", "ws", 5)
          .join(d.select(col("doc_id"), col("source")), Seq("doc_id"))
          .select(col("source"), col("h62").as("h")).distinct()
        val first = grams.groupBy(col("h"))
          .agg(min(col("source")).as("first_source"))
        val per = grams.join(first, Seq("h"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_grams"),
            sum(when(col("first_source") === col("source"), 1L).otherwise(0L))
              .as("n_novel"))
        per.select(col("source"), col("n_grams"), col("n_novel"),
            expr("1000000 * n_novel div n_grams").as("novelty_ppm"),
            sum(col("n_novel")).over(Window.orderBy(col("source"))
              .rowsBetween(Window.unboundedPreceding, Window.currentRow))
              .as("cum_vocab"))
          .orderBy(col("source"))
      },
      Some("""
        WITH toks AS (
          SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents),
        th AS (
          SELECT doc_id, source, list_transform(ws,
                   t -> CAST(md5_number_lower(t) % 2147483647 AS BIGINT)) AS hs
          FROM toks WHERE len(ws) >= 5),
        sh AS (
          SELECT DISTINCT source,
                 unnest(list_transform(range(1, len(hs) - 3),
                   i -> list_reduce(list_slice(hs, i, i + 4),
                          (a, x) -> (a * 131 + x) % 2147483647) * 2147483648 +
                        list_reduce(list_slice(hs, i, i + 4),
                          (a, x) -> (a * 137 + x) % 2147483647))) AS h
          FROM th),
        fs AS (SELECT h, MIN(source) AS first_source FROM sh GROUP BY 1),
        per AS (
          SELECT s.source, COUNT(*) AS n_grams,
                 SUM(CASE WHEN f.first_source = s.source THEN 1 ELSE 0 END)
                   AS n_novel
          FROM sh s JOIN fs f USING (h) GROUP BY 1)
        SELECT source,
               CAST(n_grams AS BIGINT) AS n_grams,
               CAST(n_novel AS BIGINT) AS n_novel,
               CAST(1000000 * n_novel // n_grams AS BIGINT) AS novelty_ppm,
               CAST(SUM(n_novel) OVER (ORDER BY source
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                 AS cum_vocab
        FROM per
        ORDER BY source""")),

    // Heaps-law vocabulary-growth curve — "how fast does the vocabulary
    // grow as the corpus grows?", the audit that tells a tokenizer/
    // dedup pipeline whether a corpus keeps yielding novel types
    // (vocab ∝ tokensᵝ, β<1) or has degenerated (near-linear growth =
    // boilerplate/noise; flat = saturated). Measured at power-of-2
    // doc-id checkpoints WITHOUT any global rank: a token's entire
    // contribution to every prefix is determined by its FIRST doc id
    // (one min-aggregate on the token key), docs and tokens bucket to
    // their ceiling power of 2 by a broadcast range join against the
    // ≤28-row checkpoint table, and prefix totals are a triangular
    // self-join over that bounded table — the corpus is scanned once,
    // nothing data-proportional sits in one partition. Gated output:
    // per checkpoint, exact doc/token/vocab counts, the type-token
    // ratio in ppm, and the Heaps sub-linearity boolean (ratio must
    // not rise vs the previous checkpoint).
    QueryDef(
      "q340_vocab_growth",
      (s, dir) => {
        val d = Tables.documents(s, dir)
          .select(col("doc_id"), tokens(col("text")).as("ws"))
        val firstDoc = d
          .select(col("doc_id"), explode(col("ws")).as("tok"))
          .groupBy(col("tok")).agg(min(col("doc_id")).as("fd"))
        val mx = d.agg(max(col("doc_id")).as("mxid"))
        val ckpt = mx.select(explode(expr("sequence(3, 30)")).as("j"),
            col("mxid"))
          .select(expr("shiftleft(1L, j)").as("k"), col("mxid"))
          .where(expr("k div 2") < col("mxid"))
          .select(col("k"))
        def bucket(df: org.apache.spark.sql.DataFrame, c: String) =
          df.join(broadcast(ckpt),
            col(c) <= col("k") &&
              (col("k") === 8L || col(c) > expr("k div 2")))
        val vb = bucket(firstDoc, "fd")
          .groupBy(col("k")).agg(count(lit(1)).as("v"))
        val db = bucket(
            d.select(col("doc_id"), size(col("ws")).cast("long")
              .as("n_toks")), "doc_id")
          .groupBy(col("k")).agg(count(lit(1)).as("m"),
            sum(col("n_toks")).as("s"))
        val per = db.join(vb, Seq("k"), "left")
          .select(col("k"), col("m"), col("s"),
            coalesce(col("v"), lit(0L)).as("v"))
        val pre = per.as("x").join(per.as("y"), col("y.k") <= col("x.k"))
          .groupBy(col("x.k").as("k"))
          .agg(sum(col("y.m")).as("n_docs"), sum(col("y.s")).as("n_tokens"),
            sum(col("y.v")).as("vocab"))
          .withColumn("ttr_ppm", expr("(vocab * 1000000) div n_tokens"))
        pre.as("a").join(pre.as("p"),
            col("p.k") === expr("a.k div 2"), "left")
          .select(col("a.k").as("k"), col("a.n_docs").as("n_docs"),
            col("a.n_tokens").as("n_tokens"), col("a.vocab").as("vocab"),
            col("a.ttr_ppm").as("ttr_ppm"),
            coalesce(col("a.ttr_ppm") <= col("p.ttr_ppm"), lit(true))
              .as("heaps_slowing"))
          .orderBy(col("k"))
      },
      Some("""
        WITH d AS (
          SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        fd AS (
          SELECT tok, MIN(doc_id) AS fd FROM (
            SELECT doc_id, unnest(ws) AS tok FROM d)
          GROUP BY 1),
        mx AS (SELECT MAX(doc_id) AS mxid FROM d),
        ckpt AS (
          SELECT (1::BIGINT << j) AS k
          FROM (SELECT unnest(range(3, 31)) AS j), mx
          WHERE (1::BIGINT << j) // 2 < mxid),
        vb AS (
          SELECT c.k, CAST(COUNT(*) AS BIGINT) AS v
          FROM fd JOIN ckpt c
            ON fd.fd <= c.k AND (c.k = 8 OR fd.fd > c.k // 2)
          GROUP BY 1),
        db AS (
          SELECT c.k, CAST(COUNT(*) AS BIGINT) AS m,
                 CAST(SUM(len(d.ws)) AS BIGINT) AS s
          FROM d JOIN ckpt c
            ON d.doc_id <= c.k AND (c.k = 8 OR d.doc_id > c.k // 2)
          GROUP BY 1),
        per AS (
          SELECT db.k, db.m, db.s, COALESCE(vb.v, 0) AS v
          FROM db LEFT JOIN vb ON vb.k = db.k),
        pre AS (
          SELECT x.k,
                 CAST(SUM(y.m) AS BIGINT) AS n_docs,
                 CAST(SUM(y.s) AS BIGINT) AS n_tokens,
                 CAST(SUM(y.v) AS BIGINT) AS vocab,
                 (CAST(SUM(y.v) AS BIGINT) * 1000000)
                   // CAST(SUM(y.s) AS BIGINT) AS ttr_ppm
          FROM per x JOIN per y ON y.k <= x.k
          GROUP BY 1)
        SELECT a.k, a.n_docs, a.n_tokens, a.vocab, a.ttr_ppm,
               COALESCE(a.ttr_ppm <= p.ttr_ppm, TRUE) AS heaps_slowing
        FROM pre a LEFT JOIN pre p ON p.k = a.k // 2
        ORDER BY a.k""")))
}
