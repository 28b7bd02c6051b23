package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Kernels.{md5Bits, md5BitsModK, md5Lower64}
import graft.functions.TextKernels._
import graft.operators.TextDedup
import graft.sources.Tables
import graft.plans.CheckpointPolicy.DataFrameCutOps

/** LLM-training-data text pipeline over the `documents` corpus: quality
  * stats, language-ID heuristic, fingerprints, MinHash+LSH near-dup,
  * SimHash sketches, and exact n-gram Jaccard verification.
  *
  * All sketch hashes are DuckDB-`md5_number_lower`-parity u64s so every
  * stage is oracle-checkable. Every query is linear in corpus size except
  * the LSH bucket self-join, which touches only same-bucket candidates.
  */
object TextQueries {

  private val Stops   = Seq("the", "a")
  private val QryWords = Seq("query", "scan", "filter", "join")
  private val DatWords = Seq("data", "table", "row", "column")
  private val PrfWords = Seq("fast", "slow", "batch", "hash")

  // Shared oracle CTEs (DuckDB): whitespace tokens and distinct 3-shingles.
  private val ToksCte =
    "toks AS (SELECT doc_id, lang, source, text, string_split(text, ' ') ws FROM documents)"
  private val ShCte =
    "sh AS (SELECT doc_id, list_distinct(list_transform(range(1, len(ws)-1), " +
      "i -> ws[i]||' '||ws[i+1]||' '||ws[i+2])) s FROM toks)"
  private val MhCte = // universal-hash minhash: base = md5 u64 mod (2^31-1), 16 affine perms
    "hs AS (SELECT doc_id, list_transform(s, x -> (md5_number_lower(x) % 2147483647)::BIGINT) hv FROM sh), " +
      "mh AS (SELECT doc_id, list_transform(range(0,16), " +
      "i -> list_min(list_transform(hv, h -> ((999983*i + 1000003)*h + 998244353*i) % 2147483647))) sig FROM hs)"
  private val BandsCte = // 4 bands x 4 rows
    "bands AS (SELECT doc_id, sig, b, md5(sig[b*4+1]::VARCHAR || '|' || sig[b*4+2]::VARCHAR || " +
      "'|' || sig[b*4+3]::VARCHAR || '|' || sig[b*4+4]::VARCHAR) bkey " +
      "FROM mh, (SELECT unnest(range(0,4)) b))"

  val defs: Seq[QueryDef] = Seq(

    // Text analysis: token counting, repetition/stopword ratios, composite
    // quality score — the standard pre-training corpus filters.
    QueryDef(
      "q24_text_stats",
      (s, dir) => {
        val d  = Tables.documents(s, dir)
        val ws = tokens(col("text"))
        val nTok = tokenCount(ws)
        val dRat = distinctRatio(ws)
        val sRat = stopwordRatio(ws, Stops)
        d.select(
            col("doc_id"), col("lang"), col("source"),
            nTok.as("n_tokens"),
            size(array_distinct(ws)).cast("long").as("n_distinct"),
            avgTokenLen(col("text"), ws).as("avg_token_len"),
            dRat.as("distinct_ratio"),
            sRat.as("stop_ratio"),
            qualityScore(nTok, dRat, sRat).as("quality"))
          .orderBy(col("doc_id"))
      },
      Some(s"""
        WITH $ToksCte,
        stats AS (
          SELECT doc_id, lang, source,
                 len(ws)::BIGINT AS n_tokens,
                 len(list_distinct(ws))::BIGINT AS n_distinct,
                 (length(text) - (len(ws) - 1))::DOUBLE / len(ws) AS avg_token_len,
                 len(list_distinct(ws))::DOUBLE / len(ws) AS distinct_ratio,
                 len(list_filter(ws, w -> w = 'the' OR w = 'a'))::DOUBLE / len(ws) AS stop_ratio
          FROM toks)
        SELECT doc_id, lang, source, n_tokens, n_distinct, avg_token_len,
               distinct_ratio, stop_ratio,
               (CASE WHEN n_tokens >= 20 THEN 1.0::DOUBLE ELSE n_tokens::DOUBLE / 20.0::DOUBLE END)
                 * distinct_ratio
                 * (CASE WHEN stop_ratio BETWEEN 0.01::DOUBLE AND 0.5::DOUBLE THEN 1.0::DOUBLE ELSE 0.5::DOUBLE END)
                 AS quality
        FROM stats
        ORDER BY doc_id""")),

    // Language-ID heuristic (marker-word n-gram scoring, deterministic
    // argmax) + per-(label, prediction) corpus profile.
    QueryDef(
      "q25_lang_profile",
      (s, dir) => {
        val d  = Tables.documents(s, dir)
        val ws = tokens(col("text"))
        val (cq, cd, cp) =
          (markerCount(ws, QryWords), markerCount(ws, DatWords), markerCount(ws, PrfWords))
        val predicted = when(cq >= cd && cq >= cp && cq > 0, "query")
          .when(cd >= cp && cd > 0, "data")
          .when(cp > 0, "perf")
          .otherwise("other")
        d.select(col("lang"), predicted.as("predicted_lang"), tokenCount(ws).as("n_tokens"))
          .groupBy(col("lang"), col("predicted_lang"))
          .agg(count(lit(1)).as("n_docs"),
            (sum(col("n_tokens")).cast("double") / count(lit(1))).as("avg_tokens"))
          .orderBy(col("lang"), col("predicted_lang"))
      },
      Some(s"""
        WITH $ToksCte,
        scored AS (
          SELECT lang,
                 len(list_filter(ws, w -> w = 'query' OR w = 'scan' OR w = 'filter' OR w = 'join'))::BIGINT AS cq,
                 len(list_filter(ws, w -> w = 'data' OR w = 'table' OR w = 'row' OR w = 'column'))::BIGINT AS cd,
                 len(list_filter(ws, w -> w = 'fast' OR w = 'slow' OR w = 'batch' OR w = 'hash'))::BIGINT AS cp,
                 len(ws)::BIGINT AS n_tokens
          FROM toks)
        SELECT lang,
               CASE WHEN cq >= cd AND cq >= cp AND cq > 0 THEN 'query'
                    WHEN cd >= cp AND cd > 0 THEN 'data'
                    WHEN cp > 0 THEN 'perf'
                    ELSE 'other' END AS predicted_lang,
               COUNT(*) AS n_docs,
               SUM(n_tokens)::DOUBLE / COUNT(*) AS avg_tokens
        FROM scored
        GROUP BY 1, 2
        ORDER BY 1, 2""")),

    // Document fingerprinting: exact-content u64 + winnowing-style
    // min-shingle fingerprint, with dup-group sizes.
    QueryDef(
      "q26_doc_fingerprint",
      (s, dir) => {
        val d  = Tables.documents(s, dir)
        val ws = tokens(col("text"))
        val shRows = TextDedup.shingleRows(
          d.select(col("doc_id"), ws.as("ws")), "doc_id", "ws", 3)
        val winnow = TextDedup.minShingleFingerprints(shRows, "doc_id", "_sh")
        // left join: docs with < k tokens produce no shingle rows, but the
        // oracle's per-doc shingle LIST still yields a row (winnow_fp NULL) —
        // an inner join would silently drop them on the Spark side only
        val fp = d.select(col("doc_id"),
            contentFingerprint(col("text")).as("content_fp"),
            rollingHash(col("text")).as("rolling_fp"))
          .join(winnow, Seq("doc_id"), "left")
        fp.select(col("doc_id"), col("content_fp"), col("rolling_fp"), col("winnow_fp"),
            count(lit(1)).over(Window.partitionBy(col("content_fp"))).as("exact_dup_group"),
            count(lit(1)).over(Window.partitionBy(col("winnow_fp"))).as("near_dup_group"))
          .orderBy(col("doc_id"))
      },
      Some(s"""
        WITH $ToksCte, $ShCte,
        fp AS (
          SELECT t.doc_id,
                 md5_number_lower(t.text)::VARCHAR AS content_fp,
                 list_reduce(list_transform(range(1, len(t.text)+1), i -> ascii(t.text[i])::BIGINT),
                   (a,c) -> (a*131 + c) % 2147483647) AS rolling_fp,
                 list_min(list_transform(sh.s, x -> md5_number_lower(x)))::VARCHAR AS winnow_fp
          FROM toks t JOIN sh ON sh.doc_id = t.doc_id)
        SELECT doc_id, content_fp, rolling_fp, winnow_fp,
               COUNT(*) OVER (PARTITION BY content_fp) AS exact_dup_group,
               COUNT(*) OVER (PARTITION BY winnow_fp) AS near_dup_group
        FROM fp
        ORDER BY doc_id""")),

    // MinHash (16 perms) + banded LSH (4x4): candidate near-dup pairs with
    // estimated Jaccard. The self-join is on (band, bucket) — never
    // all-pairs; the identical banding survives a 100 TB corpus.
    QueryDef(
      "q27_minhash_lsh",
      (s, dir) => {
        val d  = Tables.documents(s, dir)
        val shRows = TextDedup.shingleRows(
          d.select(col("doc_id"), tokens(col("text")).as("ws")), "doc_id", "ws", 3)
        val sig = TextDedup.minhashSignatures(shRows, "doc_id", "_sh", 16)
        TextDedup.lshCandidatePairs(sig, "doc_id", "sig", bands = 4, rowsPerBand = 4)
          .orderBy(col("id_a"), col("id_b"))
      },
      Some(s"""
        WITH $ToksCte, $ShCte, $MhCte, $BandsCte,
        pairs AS (
          SELECT DISTINCT a.doc_id id_a, b.doc_id id_b, a.sig sa, b.sig sb
          FROM bands a JOIN bands b ON a.b = b.b AND a.bkey = b.bkey AND a.doc_id < b.doc_id)
        SELECT id_a, id_b,
               len(list_filter(range(1,17), i -> sa[i] = sb[i]))::DOUBLE / 16 AS est_jaccard
        FROM pairs
        ORDER BY id_a, id_b""")),

    // SimHash 64-bit sketches (hi/lo 32-bit halves) over the token
    // multiset — the other classic near-dup sketch (hamming-ball lookup).
    QueryDef(
      "q28_simhash",
      (s, dir) => {
        val d  = Tables.documents(s, dir)
        TextDedup.simhashes(
            d.select(col("doc_id"), tokens(col("text")).as("ws")), "doc_id", "ws")
          .orderBy(col("doc_id"))
      },
      Some(s"""
        WITH $ToksCte,
        h AS (SELECT doc_id,
                list_transform(ws, t -> ((md5_number_lower(t) >> 32))::BIGINT) his,
                list_transform(ws, t -> ((md5_number_lower(t) & 4294967295))::BIGINT) los
              FROM toks)
        SELECT doc_id,
          CAST(list_sum(list_transform(range(0,32), b ->
            CASE WHEN list_sum(list_transform(his, h2 -> ((h2 >> b) & 1)*2 - 1)) > 0
                 THEN (1::BIGINT << b) ELSE 0::BIGINT END)) AS BIGINT) AS simhash_hi,
          CAST(list_sum(list_transform(range(0,32), b ->
            CASE WHEN list_sum(list_transform(los, h2 -> ((h2 >> b) & 1)*2 - 1)) > 0
                 THEN (1::BIGINT << b) ELSE 0::BIGINT END)) AS BIGINT) AS simhash_lo
        FROM h
        ORDER BY doc_id""")),

    // Token counting, BPE-ish: regex word/number/punctuation classes vs
    // whitespace counting (the two standard corpus token estimators).
    // Punctuated suffix derived from doc_id exercises the class split.
    QueryDef(
      "q42_token_regex",
      (s, dir) => {
        val d  = Tables.documents(s, dir)
        val rt = concat(col("text"), lit(" v"), col("doc_id") % 10, lit(".2, end!"))
        val bpe = "[a-z]+|[0-9]+|[^a-z0-9 ]"
        d.select(
            col("doc_id"),
            tokenCount(tokens(col("text"))).as("n_ws_tokens"),
            size(regexp_extract_all(rt, lit(bpe), lit(0))).cast("long").as("n_bpe_tokens"),
            size(regexp_extract_all(rt, lit("[^a-z0-9 ]"), lit(0))).cast("long").as("n_punct"))
          .orderBy(col("doc_id"))
      },
      Some("""
        WITH t AS (SELECT doc_id, text, text || ' v' || (doc_id % 10) || '.2, end!' AS rt FROM documents)
        SELECT doc_id,
               len(string_split(text, ' '))::BIGINT AS n_ws_tokens,
               len(regexp_extract_all(rt, '[a-z]+|[0-9]+|[^a-z0-9 ]'))::BIGINT AS n_bpe_tokens,
               len(regexp_extract_all(rt, '[^a-z0-9 ]'))::BIGINT AS n_punct
        FROM t
        ORDER BY doc_id""")),

    // Transitive dup clusters: LSH pairs → connected components →
    // canonical-document selection (keep the min doc_id per cluster) —
    // the last stage of a corpus-dedup pipeline. Spark side is iterative
    // min-label propagation; the oracle is a recursive CTE.
    QueryDef(
      "q48_dedup_clusters",
      (s, dir) => {
        val d = Tables.documents(s, dir)
        val shRows = TextDedup.shingleRows(
          d.select(col("doc_id"), tokens(col("text")).as("ws")), "doc_id", "ws", 3)
        val sig = TextDedup.minhashSignatures(shRows, "doc_id", "_sh", 16)
        val pairs = TextDedup.lshCandidatePairs(sig, "doc_id", "sig", 4, 4)
          .select(col("id_a"), col("id_b"))
        TextDedup.connectedComponents(pairs, "id_a", "id_b")
          .groupBy(col("cluster_id"))
          .agg(count(lit(1)).as("n_docs"), min(col("node")).as("keep_doc"),
            max(col("node")).as("drop_up_to"))
          .orderBy(col("cluster_id"))
      },
      Some(s"""
        WITH RECURSIVE $ToksCte, $ShCte, $MhCte, $BandsCte,
        pairs AS (
          SELECT DISTINCT a.doc_id id_a, b.doc_id id_b
          FROM bands a JOIN bands b ON a.b = b.b AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
        edges AS (SELECT id_a AS u, id_b AS v FROM pairs UNION SELECT id_b, id_a FROM pairs),
        reach AS (
          SELECT u AS node, u AS reachable FROM edges
          UNION
          SELECT r.node, e.v FROM reach r JOIN edges e ON e.u = r.reachable),
        labels AS (SELECT node, MIN(reachable) AS cluster_id FROM reach GROUP BY node)
        SELECT cluster_id, COUNT(*) AS n_docs, MIN(node) AS keep_doc, MAX(node) AS drop_up_to
        FROM labels GROUP BY cluster_id
        ORDER BY cluster_id""")),

    // Exact n-gram Jaccard verification of the LSH candidates → the final
    // verified near-duplicate pair list (est from sketches, exact on the
    // candidate set only).
    QueryDef(
      "q29_ngram_jaccard",
      (s, dir) => {
        val d  = Tables.documents(s, dir)
        val shRows = TextDedup.shingleRows(
          d.select(col("doc_id"), tokens(col("text")).as("ws")), "doc_id", "ws", 3)
        val sig  = TextDedup.minhashSignatures(shRows, "doc_id", "_sh", 16)
        val cands = TextDedup.lshCandidatePairs(sig, "doc_id", "sig", 4, 4)
          .select(col("id_a"), col("id_b"))
        // Exact shingle SETS only for the (few) candidate docs.
        val shSets = shRows.groupBy(col("doc_id")).agg(collect_set(col("_sh")).as("sh"))
        val shA = shSets.select(col("doc_id").as("id_a"), col("sh").as("sh_a"))
        val shB = shSets.select(col("doc_id").as("id_b"), col("sh").as("sh_b"))
        cands.join(shA, "id_a").join(shB, "id_b")
          .select(col("id_a"), col("id_b"),
            TextDedup.jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
          .where(col("jaccard") >= 0.5d)
          .orderBy(col("id_a"), col("id_b"))
      },
      Some(s"""
        WITH $ToksCte, $ShCte, $MhCte, $BandsCte,
        pairs AS (
          SELECT DISTINCT a.doc_id id_a, b.doc_id id_b
          FROM bands a JOIN bands b ON a.b = b.b AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
        j AS (
          SELECT id_a, id_b,
                 len(list_intersect(x.s, y.s))::DOUBLE / len(list_distinct(list_concat(x.s, y.s))) AS jaccard
          FROM pairs JOIN sh x ON x.doc_id = id_a JOIN sh y ON y.doc_id = id_b)
        SELECT id_a, id_b, jaccard
        FROM j
        WHERE jaccard >= 0.5::DOUBLE
        ORDER BY id_a, id_b""")),

    // PII-style redaction — the standard pre-training scrub pass: count
    // then redact email / URL / phone shapes with patterns in the
    // Java-regex ∩ RE2 common subset so both engines agree byte-for-byte.
    // PII-ish suffixes are synthesized deterministically from doc_id
    // (the corpus itself has none). Redaction order matters and is fixed:
    // email → URL → phone, so earlier replacements can't feed later
    // patterns.
    QueryDef(
      "q57_pii_redact",
      (s, dir) => {
        val d = Tables.documents(s, dir)
        val pii = concat(col("text"),
          lit(" contact user"), col("doc_id"), lit("@example.com or +9715"),
          pmod(col("doc_id") * 7919, lit(10000000)), lit(" visit https://site"),
          col("doc_id"), lit(".example/path now"))
        d.select(col("doc_id"), pii.as("t"))
          .select(col("doc_id"),
            regexp_count(col("t"), lit(EmailRe)).cast("long").as("n_emails"),
            regexp_count(col("t"), lit(UrlRe)).cast("long").as("n_urls"),
            regexp_count(col("t"), lit(PhoneRe)).cast("long").as("n_phones"),
            redactPii(col("t")).as("redacted"))
          .orderBy(col("doc_id"))
      },
      Some("""
        WITH pii AS (
          SELECT doc_id,
                 text || ' contact user' || doc_id || '@example.com or +9715' ||
                 (doc_id * 7919) % 10000000 || ' visit https://site' ||
                 doc_id || '.example/path now' AS t
          FROM documents)
        SELECT doc_id,
               CAST(len(regexp_extract_all(t, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS BIGINT) AS n_emails,
               CAST(len(regexp_extract_all(t, 'https?://[^ ]+')) AS BIGINT) AS n_urls,
               CAST(len(regexp_extract_all(t, '\+?[0-9][0-9-]{7,}')) AS BIGINT) AS n_phones,
               regexp_replace(regexp_replace(regexp_replace(t,
                 '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '[EMAIL]', 'g'),
                 'https?://[^ ]+', '[URL]', 'g'),
                 '\+?[0-9][0-9-]{7,}', '[PHONE]', 'g') AS redacted
        FROM pii
        ORDER BY doc_id""")),

    // Deterministic hash split + sampling — reproducible train/val/test
    // assignment and subsampling by content-independent key hash
    // (md5-u64 mod 100, cross-engine exact via md5_number_lower parity).
    // No RNG anywhere: re-running on a grown corpus keeps every existing
    // doc's assignment — the property that matters for training-data
    // lineage. Per-row map + one partial-agg shuffle; scales linearly.
    QueryDef(
      "q58_hash_split",
      (s, dir) => {
        val d = Tables.documents(s, dir)
        val bucket = md5BitsModK(md5Bits(concat(lit("split:"), col("doc_id"))), 100L)
        val split = when(col("bucket") < 80, "train")
          .when(col("bucket") < 90, "val").otherwise("test")
        d.select(col("source"), bucket.as("bucket"))
          .select(col("source"), split.as("split"), col("bucket"))
          .groupBy(col("source"), col("split"))
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("bucket") < 10, 1L).otherwise(0L)).as("n_sample_10pct"))
          .orderBy(col("source"), col("split"))
      },
      Some("""
        WITH b AS (
          SELECT source,
                 CAST(md5_number_lower('split:' || doc_id) % 100 AS BIGINT) AS bucket
          FROM documents)
        SELECT source,
               CASE WHEN bucket < 80 THEN 'train'
                    WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
               COUNT(*) AS n_docs,
               CAST(SUM(CASE WHEN bucket < 10 THEN 1 ELSE 0 END) AS BIGINT) AS n_sample_10pct
        FROM b
        GROUP BY 1, 2
        ORDER BY 1, 2""")),

    // Within-document repetition stats — the Gopher-style quality filter:
    // fraction of duplicated 3-grams and the hottest 3-gram's count per
    // doc. Two-level aggregation (per-(doc,shingle) count → per-doc
    // rollup) — NEVER count + countDistinct in one agg (the Expand trap);
    // the second groupBy reuses the first's hash partitioning on doc_id.
    QueryDef(
      "q59_repetition_stats",
      (s, dir) => {
        val d = Tables.documents(s, dir)
        val shRows = TextDedup.shingleRows(
          d.select(col("doc_id"), tokens(col("text")).as("ws")), "doc_id", "ws", 3)
        val perShingle = shRows.groupBy(col("doc_id"), col("_sh"))
          .agg(count(lit(1)).as("cnt"))
        perShingle.groupBy(col("doc_id"))
          .agg(sum(col("cnt")).cast("long").as("n_shingles"),
            count(lit(1)).as("n_distinct_shingles"),
            max(col("cnt")).cast("long").as("max_shingle_count"))
          .select(col("doc_id"), col("n_shingles"), col("n_distinct_shingles"),
            ((col("n_shingles") - col("n_distinct_shingles")).cast("double") /
              col("n_shingles")).as("dup_shingle_ratio"),
            col("max_shingle_count"))
          .orderBy(col("doc_id"))
      },
      Some(s"""
        WITH $ToksCte,
        shall AS (
          SELECT doc_id, list_transform(range(1, len(ws)-1),
                   i -> ws[i]||' '||ws[i+1]||' '||ws[i+2]) s
          FROM toks),
        stats AS (
          SELECT doc_id,
                 len(s)::BIGINT AS n_shingles,
                 len(list_distinct(s))::BIGINT AS n_distinct_shingles,
                 list_max(list_transform(list_distinct(s),
                   x -> len(list_filter(s, y -> y = x))))::BIGINT AS max_shingle_count
          FROM shall WHERE len(s) > 0)
        SELECT doc_id, n_shingles, n_distinct_shingles,
               (n_shingles - n_distinct_shingles)::DOUBLE / n_shingles AS dup_shingle_ratio,
               max_shingle_count
        FROM stats
        ORDER BY doc_id""")),

    // Train/test contamination detection — compose the deterministic hash
    // split (q58) with the winnowing NEAR-dup fingerprint (q26): a test
    // doc whose min-shingle fingerprint matches any train doc leaks eval
    // data through a near-duplicate (the corpus has no exact duplicates —
    // real leakage rarely is exact). Equi-join on the 64-bit fingerprint,
    // never all-pairs; the train side pre-aggregates to (fp → one
    // representative), keeping the join skew-free at 100 TB.
    QueryDef(
      "q60_split_contamination",
      (s, dir) => {
        val d = Tables.documents(s, dir)
        val shRows = TextDedup.shingleRows(
          d.select(col("doc_id"), tokens(col("text")).as("ws")), "doc_id", "ws", 3)
        val wfp = TextDedup.minShingleFingerprints(shRows, "doc_id", "_sh")
          .withColumn("bucket",
            md5BitsModK(md5Bits(concat(lit("split:"), col("doc_id"))), 100L))
        val train = wfp.where(col("bucket") < 80)
          .groupBy(col("winnow_fp"))
          .agg(min(col("doc_id")).as("train_doc"), count(lit(1)).as("n_train_dups"))
        val test = wfp.where(col("bucket") >= 90)
          .select(col("doc_id").as("test_doc"), col("winnow_fp"))
        test.join(train, Seq("winnow_fp"))
          .select(col("test_doc"), col("train_doc"), col("n_train_dups"),
            col("winnow_fp"))
          .orderBy(col("test_doc"), col("train_doc"))
      },
      Some(s"""
        WITH $ToksCte, $ShCte,
        fp AS (
          SELECT sh.doc_id,
                 list_min(list_transform(s, x -> md5_number_lower(x)))::VARCHAR AS winnow_fp,
                 CAST(md5_number_lower('split:' || sh.doc_id) % 100 AS BIGINT) AS bucket
          FROM sh),
        train AS (
          SELECT winnow_fp, MIN(doc_id) AS train_doc, COUNT(*) AS n_train_dups
          FROM fp WHERE bucket < 80 GROUP BY 1),
        test AS (
          SELECT doc_id AS test_doc, winnow_fp FROM fp WHERE bucket >= 90)
        SELECT test_doc, train_doc, n_train_dups, winnow_fp
        FROM test JOIN train USING (winnow_fp)
        ORDER BY test_doc, train_doc""")),

    // Sequence packing — assigning documents to fixed token-budget
    // training sequences. The scalable formulation: a deterministic
    // per-source order, a running token prefix-sum (one window pass), and
    // bin = floor(start_offset / budget) — no sequential greedy loop, no
    // driver involvement; at 100 TB each source partition packs
    // independently in one shuffle.
    QueryDef(
      "q72_sequence_packing",
      (s, dir) => {
        val budget = 1000L
        val d = Tables.documents(s, dir)
        val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val packed = d.select(col("source"), col("doc_id"),
            tokenCount(tokens(col("text"))).as("n_tokens"))
          .withColumn("cum", sum(col("n_tokens")).over(w))
          .withColumn("bin", ((col("cum") - col("n_tokens")) / budget)
            .cast("long"))
        packed.groupBy(col("source"), col("bin"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).cast("long").as("bin_tokens"),
            min(col("doc_id")).as("first_doc"),
            max(col("doc_id")).as("last_doc"))
          .orderBy(col("source"), col("bin"))
      },
      Some("""
        WITH t AS (
          SELECT source, doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
          FROM documents),
        c AS (
          SELECT source, doc_id, n_tokens,
                 SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM t),
        b AS (
          SELECT source, doc_id, n_tokens,
                 CAST(floor((cum - n_tokens) / 1000) AS BIGINT) AS bin
          FROM c)
        SELECT source, bin, COUNT(*) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens,
               MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
        FROM b
        GROUP BY 1, 2
        ORDER BY source, bin""")),

    // Unigram familiarity scoring — the language-model-quality proxy:
    // build corpus token frequencies, then score each doc by the average
    // corpus frequency of its tokens (rare-token-heavy docs score low —
    // the shape of a KenLM perplexity filter without transcendentals, so
    // both engines agree bit-for-bit: integer sums → ONE double
    // division). Token stream joins the frequency table on the token —
    // at 100 TB the vocab side is the small one (broadcast or
    // shuffle-join on token with AQE handling stopword skew).
    QueryDef(
      "q75_unigram_familiarity",
      (s, dir) => {
        val d = Tables.documents(s, dir)
        val toks = d.select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
        val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("tok_freq"))
        toks.join(vocab, Seq("tok"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_tokens"),
            sum(col("tok_freq")).cast("long").as("freq_sum"))
          .select(col("doc_id"), col("n_tokens"), col("freq_sum"),
            (col("freq_sum").cast("double") / col("n_tokens"))
              .as("avg_tok_familiarity"))
          .orderBy(col("doc_id"))
      },
      Some(s"""
        WITH $ToksCte,
        flat AS (SELECT doc_id, unnest(ws) AS tok FROM toks),
        vocab AS (SELECT tok, COUNT(*) AS tok_freq FROM flat GROUP BY 1),
        scored AS (
          SELECT f.doc_id, COUNT(*) AS n_tokens,
                 CAST(SUM(v.tok_freq) AS BIGINT) AS freq_sum
          FROM flat f JOIN vocab v USING (tok)
          GROUP BY 1)
        SELECT doc_id, n_tokens, freq_sum,
               freq_sum::DOUBLE / n_tokens AS avg_tok_familiarity
        FROM scored
        ORDER BY doc_id""")),

    // Canonical-representative selection — the step that turns dup
    // CLUSTERS (q48) into a deduped CORPUS: per cluster keep the
    // highest-quality member (q24's score), tie-broken by doc_id so the
    // choice is a total order. Composition is one extra broadcast-sized
    // join + per-cluster argmax window on top of the q48 pipeline; the
    // dropped-set checksum (sum of non-kept doc_ids) gates that both
    // engines drop EXACTLY the same documents, not just the same counts.
    QueryDef(
      "q94_cluster_representatives",
      (s, dir) => {
        val d = Tables.documents(s, dir)
        val shRows = TextDedup.shingleRows(
          d.select(col("doc_id"), tokens(col("text")).as("ws")), "doc_id", "ws", 3)
        val sig = TextDedup.minhashSignatures(shRows, "doc_id", "_sh", 16)
        val pairs = TextDedup.lshCandidatePairs(sig, "doc_id", "sig", 4, 4)
          .select(col("id_a"), col("id_b"))
        val labels = TextDedup.connectedComponents(pairs, "id_a", "id_b")
        val ws = tokens(col("text"))
        val qual = d.select(col("doc_id"),
          qualityScore(tokenCount(ws), distinctRatio(ws),
            stopwordRatio(ws, Stops)).as("quality"))
        val w = Window.partitionBy(col("cluster_id"))
          .orderBy(col("quality").desc, col("node"))
        labels.join(qual, labels("node") === qual("doc_id"))
          .select(col("cluster_id"), col("node"), col("quality"),
            row_number().over(w).as("pick"))
          .groupBy(col("cluster_id"))
          .agg(count(lit(1)).as("n_docs"),
            min(when(col("pick") === 1, col("node"))).as("rep_doc"),
            min(when(col("pick") === 1, col("quality"))).as("rep_quality"),
            sum(when(col("pick") =!= 1, col("node")).otherwise(0L))
              .as("dropped_id_sum"))
          .orderBy(col("cluster_id"))
      },
      Some(s"""
        WITH RECURSIVE $ToksCte, $ShCte, $MhCte, $BandsCte,
        pairs AS (
          SELECT DISTINCT a.doc_id id_a, b.doc_id id_b
          FROM bands a JOIN bands b ON a.b = b.b AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
        edges AS (SELECT id_a AS u, id_b AS v FROM pairs UNION SELECT id_b, id_a FROM pairs),
        reach AS (
          SELECT u AS node, u AS reachable FROM edges
          UNION
          SELECT r.node, e.v FROM reach r JOIN edges e ON e.u = r.reachable),
        labels AS (SELECT node, MIN(reachable) AS cluster_id FROM reach GROUP BY node),
        qual AS (
          SELECT doc_id,
                 (CASE WHEN len(ws) >= 20 THEN 1.0::DOUBLE ELSE len(ws)::DOUBLE / 20.0::DOUBLE END)
                   * (len(list_distinct(ws))::DOUBLE / len(ws))
                   * (CASE WHEN (len(list_filter(ws, w -> w = 'the' OR w = 'a'))::DOUBLE / len(ws))
                             BETWEEN 0.01::DOUBLE AND 0.5::DOUBLE THEN 1.0::DOUBLE ELSE 0.5::DOUBLE END)
                   AS quality
          FROM toks),
        picked AS (
          SELECT l.cluster_id, l.node, q.quality,
                 row_number() OVER (PARTITION BY l.cluster_id
                                    ORDER BY q.quality DESC, l.node) AS pick
          FROM labels l JOIN qual q ON q.doc_id = l.node)
        SELECT cluster_id, COUNT(*) AS n_docs,
               MIN(CASE WHEN pick = 1 THEN node END) AS rep_doc,
               MIN(CASE WHEN pick = 1 THEN quality END) AS rep_quality,
               CAST(SUM(CASE WHEN pick <> 1 THEN node ELSE 0 END) AS BIGINT)
                 AS dropped_id_sum
        FROM picked
        GROUP BY cluster_id
        ORDER BY cluster_id""")),

    // Leakage-proof train/test split: assignment hashes the dup-CLUSTER
    // id, not the doc id, so near-duplicates can never straddle the
    // split boundary (the failure q60 detects in a doc-hashed split).
    // Docs outside any cluster (never LSH-candidates) hash their own id
    // — they ARE their cluster. One broadcast-sized label join on top
    // of the q48 pipeline; the gate pins per-split membership checksums
    // AND the split-leaked cluster count, which must be literal zero.
    QueryDef(
      "q96_cluster_split",
      (s, dir) => {
        val d = Tables.documents(s, dir)
        val shRows = TextDedup.shingleRows(
          d.select(col("doc_id"), tokens(col("text")).as("ws")), "doc_id", "ws", 3)
        val sig = TextDedup.minhashSignatures(shRows, "doc_id", "_sh", 16)
        val pairs = TextDedup.lshCandidatePairs(sig, "doc_id", "sig", 4, 4)
          .select(col("id_a"), col("id_b"))
        val labels = TextDedup.connectedComponents(pairs, "id_a", "id_b")
        val assigned = d.select(col("doc_id"))
          .join(labels, d("doc_id") === labels("node"), "left")
          .select(col("doc_id"),
            coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
          .withColumn("bucket",
            md5BitsModK(md5Bits(concat(lit("csplit:"), col("cluster_id"))), 100L))
          .withColumn("split",
            when(col("bucket") < 80, "train")
              .when(col("bucket") < 90, "val").otherwise("test"))
        // two-level aggs (never count+countDistinct in one — the Expand
        // trap); the per-(split,cluster) stage reuses one partitioning
        val perCluster = assigned.groupBy(col("split"), col("cluster_id"))
          .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("ids"))
        val perSplit = perCluster.groupBy(col("split"))
          .agg(sum(col("n")).cast("long").as("n_docs"),
            sum(col("ids")).cast("long").as("id_sum"),
            count(lit(1)).as("n_clusters"))
        val leaked = perCluster.groupBy(col("cluster_id"))
          .agg(count(lit(1)).as("n_splits"))
          .agg(sum(when(col("n_splits") > 1, 1L).otherwise(0L))
            .as("leaked_clusters"))
        perSplit.crossJoin(leaked)
          .select(col("split"), col("n_docs"), col("id_sum"),
            col("n_clusters"), col("leaked_clusters"))
          .orderBy(col("split"))
      },
      Some(s"""
        WITH RECURSIVE $ToksCte, $ShCte, $MhCte, $BandsCte,
        pairs AS (
          SELECT DISTINCT a.doc_id id_a, b.doc_id id_b
          FROM bands a JOIN bands b ON a.b = b.b AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
        edges AS (SELECT id_a AS u, id_b AS v FROM pairs UNION SELECT id_b, id_a FROM pairs),
        reach AS (
          SELECT u AS node, u AS reachable FROM edges
          UNION
          SELECT r.node, e.v FROM reach r JOIN edges e ON e.u = r.reachable),
        labels AS (SELECT node, MIN(reachable) AS cluster_id FROM reach GROUP BY node),
        assigned AS (
          SELECT d.doc_id,
                 coalesce(l.cluster_id, d.doc_id) AS cluster_id,
                 CASE WHEN CAST(md5_number_lower('csplit:' || coalesce(l.cluster_id, d.doc_id)) % 100 AS BIGINT) < 80 THEN 'train'
                      WHEN CAST(md5_number_lower('csplit:' || coalesce(l.cluster_id, d.doc_id)) % 100 AS BIGINT) < 90 THEN 'val'
                      ELSE 'test' END AS split
          FROM documents d LEFT JOIN labels l ON l.node = d.doc_id),
        per_split AS (
          SELECT split, COUNT(*) AS n_docs,
                 CAST(SUM(doc_id) AS BIGINT) AS id_sum,
                 COUNT(DISTINCT cluster_id) AS n_clusters
          FROM assigned GROUP BY 1),
        leaked AS (
          SELECT CAST(SUM(CASE WHEN n_splits > 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS leaked_clusters
          FROM (SELECT cluster_id, COUNT(DISTINCT split) AS n_splits
                FROM assigned GROUP BY 1))
        SELECT split, n_docs, id_sum, n_clusters, leaked_clusters
        FROM per_split CROSS JOIN leaked
        ORDER BY split""")),

    // Cluster topic labels via c-TF-IDF: per dup-cluster term counts
    // scored tf × (C − cdf + 0.5)/(cdf + 0.5) (C = cluster count, cdf =
    // clusters containing the term — the q82 rational-BM25 stance, no
    // transcendentals), top-3 terms per cluster with full tiebreak. The
    // cluster-level df table is vocabulary-bounded → broadcast; the only
    // corpus-scale shuffles are the label join and the (cluster, term)
    // tf aggregate. This is the "what IS this duplicate family" audit
    // run after every dedup sweep.
    QueryDef(
      "q120_cluster_topics",
      (s, dir) => {
        val d = Tables.documents(s, dir)
        val shRows = TextDedup.shingleRows(
          d.select(col("doc_id"), tokens(col("text")).as("ws")), "doc_id", "ws", 3)
        val sig = TextDedup.minhashSignatures(shRows, "doc_id", "_sh", 16)
        val pairs = TextDedup.lshCandidatePairs(sig, "doc_id", "sig", 4, 4)
          .select(col("id_a"), col("id_b"))
        val labels = TextDedup.connectedComponents(pairs, "id_a", "id_b")
        val toks = d.select(col("doc_id"), explode(tokens(col("text"))).as("term"))
        val ct = labels.join(toks, labels("node") === toks("doc_id"))
          .groupBy(col("cluster_id"), col("term")).agg(count(lit(1)).as("tf"))
        val cdf = ct.groupBy(col("term")).agg(count(lit(1)).as("cdf"))
        val cCount = labels.agg(countDistinct(col("cluster_id")).as("c"))
        val w = Window.partitionBy(col("cluster_id"))
          .orderBy(col("score").desc, col("term"))
        ct.join(broadcast(cdf), Seq("term"))
          .crossJoin(broadcast(cCount))
          .select(col("cluster_id"), col("term"), col("tf"), col("cdf"),
            (col("tf").cast("double") *
              ((col("c") - col("cdf") + lit(0.5d)) / (col("cdf") + lit(0.5d))))
              .as("score"))
          .withColumn("rank", row_number().over(w).cast("long"))
          .where(col("rank") <= 3)
          .select(col("cluster_id"), col("rank"), col("term"), col("tf"),
            col("cdf"), col("score"))
          .orderBy(col("cluster_id"), col("rank"))
      },
      Some(s"""
        WITH RECURSIVE $ToksCte, $ShCte, $MhCte, $BandsCte,
        pairs AS (
          SELECT DISTINCT a.doc_id id_a, b.doc_id id_b
          FROM bands a JOIN bands b ON a.b = b.b AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
        edges AS (SELECT id_a AS u, id_b AS v FROM pairs UNION SELECT id_b, id_a FROM pairs),
        reach AS (
          SELECT u AS node, u AS reachable FROM edges
          UNION
          SELECT r.node, e.v FROM reach r JOIN edges e ON e.u = r.reachable),
        labels AS (SELECT node, MIN(reachable) AS cluster_id FROM reach GROUP BY node),
        tok AS (SELECT doc_id, unnest(ws) AS term FROM toks),
        ct AS (
          SELECT l.cluster_id, t.term, COUNT(*) AS tf
          FROM labels l JOIN tok t ON t.doc_id = l.node
          GROUP BY 1, 2),
        cdf AS (SELECT term, COUNT(*) AS cdf FROM ct GROUP BY 1),
        c AS (SELECT COUNT(DISTINCT cluster_id) AS c FROM labels),
        scored AS (
          SELECT ct.cluster_id, ct.term, ct.tf, cdf.cdf,
                 (ct.tf::DOUBLE) * (((c.c - cdf.cdf) + 0.5::DOUBLE)
                   / (cdf.cdf + 0.5::DOUBLE)) AS score
          FROM ct JOIN cdf USING (term) CROSS JOIN c),
        ranked AS (
          SELECT cluster_id, term, tf, cdf, score,
                 row_number() OVER (PARTITION BY cluster_id
                   ORDER BY score DESC, term) AS rank
          FROM scored)
        SELECT cluster_id, CAST(rank AS BIGINT) AS rank, term,
               CAST(tf AS BIGINT) AS tf, CAST(cdf AS BIGINT) AS cdf, score
        FROM ranked WHERE rank <= 3
        ORDER BY cluster_id, rank""")),

    // LSH blocking-quality audit — measure the sketch instead of
    // trusting it: on a 40% hash sample, compute EXACT ground truth
    // (every pair with Jaccard ≥ 0.5, via a shingle inverted index —
    // any true pair shares shingles, so no all-pairs scan is ever
    // needed) and compare the LSH candidate set against it. Precision
    // and recall land as exact cross-multiplied permille; the Jaccard
    // threshold itself is the integer identity 3·inter ≥ n_a + n_b
    // (inter/(n_a+n_b−inter) ≥ ½), so the audit has zero doubles. The
    // sample rate bounds the inverted-index fan-out (Σ df²) — the
    // audit's documented cost knob at 100 TB.
    QueryDef(
      "q152_lsh_quality_audit",
      (s, dir) => {
        val d = Tables.documents(s, dir)
          .where(md5BitsModK(md5Bits(concat(lit("audit:"), col("doc_id"))), 100L) < 40)
        // shRows feeds the signature pipeline AND the distinct-shingle
        // audit side (which itself fans to sizes + both inverted-index
        // join sides) — materialize the explode+window pipeline once
        val shRows = TextDedup.shingleRows(
          d.select(col("doc_id"), tokens(col("text")).as("ws")), "doc_id", "ws", 3)
          .cutLineage()
        val distinctSh = shRows.distinct()
        val sig = TextDedup.minhashSignatures(shRows, "doc_id", "_sh", 16)
        val cands = TextDedup.lshCandidatePairs(sig, "doc_id", "sig", 4, 4)
          .select(col("id_a"), col("id_b")).withColumn("is_cand", lit(true))
        val sizes = distinctSh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
        val inv = distinctSh
        val inter = inv.select(col("doc_id").as("id_a"), col("_sh"))
          .join(inv.select(col("doc_id").as("id_b"), col("_sh")), Seq("_sh"))
          .where(col("id_a") < col("id_b"))
          .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("inter"))
        val truth = inter
          .join(sizes.select(col("doc_id").as("id_a"), col("n").as("na")), "id_a")
          .join(sizes.select(col("doc_id").as("id_b"), col("n").as("nb")), "id_b")
          .where(col("inter") * 3 >= col("na") + col("nb"))
          .select(col("id_a"), col("id_b")).withColumn("is_true", lit(true))
        val joined = cands.join(truth, Seq("id_a", "id_b"), "full_outer")
        joined.agg(
            sum(when(col("is_true").isNotNull, 1L).otherwise(0L)).as("n_truth_pairs"),
            sum(when(col("is_cand").isNotNull, 1L).otherwise(0L)).as("n_candidates"),
            sum(when(col("is_true").isNotNull && col("is_cand").isNotNull, 1L)
              .otherwise(0L)).as("n_true_positive"))
          .selectExpr("n_truth_pairs", "n_candidates", "n_true_positive",
            "CASE WHEN n_truth_pairs > 0 THEN (n_true_positive * 1000) div n_truth_pairs END AS recall_permille",
            "CASE WHEN n_candidates > 0 THEN (n_true_positive * 1000) div n_candidates END AS precision_permille")
          .orderBy(col("n_truth_pairs"))
      },
      Some(s"""
        WITH RECURSIVE ${ToksCte.replace("FROM documents",
          "FROM documents WHERE CAST(md5_number_lower('audit:' || doc_id) % 100 AS BIGINT) < 40")},
        $ShCte, $MhCte, $BandsCte,
        cands AS (
          SELECT DISTINCT a.doc_id id_a, b.doc_id id_b
          FROM bands a JOIN bands b ON a.b = b.b AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
        inv AS (SELECT doc_id, unnest(s) AS g FROM sh),
        sizes AS (SELECT doc_id, len(s) AS n FROM sh),
        inter AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
          FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
        truth AS (
          SELECT i.id_a, i.id_b
          FROM inter i JOIN sizes x ON x.doc_id = i.id_a
                       JOIN sizes y ON y.doc_id = i.id_b
          WHERE i.inter * 3 >= x.n + y.n),
        joined AS (
          SELECT COALESCE(c.id_a, t.id_a) AS id_a,
                 c.id_a IS NOT NULL AS is_cand, t.id_a IS NOT NULL AS is_true
          FROM cands c FULL OUTER JOIN truth t
            ON c.id_a = t.id_a AND c.id_b = t.id_b)
        SELECT CAST(SUM(CASE WHEN is_true THEN 1 ELSE 0 END) AS BIGINT) AS n_truth_pairs,
               CAST(SUM(CASE WHEN is_cand THEN 1 ELSE 0 END) AS BIGINT) AS n_candidates,
               CAST(SUM(CASE WHEN is_true AND is_cand THEN 1 ELSE 0 END) AS BIGINT) AS n_true_positive,
               CAST(CASE WHEN SUM(CASE WHEN is_true THEN 1 ELSE 0 END) > 0
                    THEN (SUM(CASE WHEN is_true AND is_cand THEN 1 ELSE 0 END) * 1000)
                         // SUM(CASE WHEN is_true THEN 1 ELSE 0 END) END AS BIGINT) AS recall_permille,
               CAST(CASE WHEN SUM(CASE WHEN is_cand THEN 1 ELSE 0 END) > 0
                    THEN (SUM(CASE WHEN is_true AND is_cand THEN 1 ELSE 0 END) * 1000)
                         // SUM(CASE WHEN is_cand THEN 1 ELSE 0 END) END AS BIGINT) AS precision_permille
        FROM joined
        ORDER BY n_truth_pairs""")),

    // Flesch reading-ease banding per language — the classic readability
    // quality filter next to q24's ratio stats and q202's LM familiarity.
    // Syllables are vowel-group runs ([aeiouy]+ matches — the standard
    // heuristic, a plain character class identical in Java and RE2
    // regex); the synthetic corpus has no sentence punctuation, so
    // sentence segmentation is SPEC'D as fixed 15-token windows
    // (S = ceil(W/15)) — the segmentation is part of the operator
    // contract, mirrored verbatim in the oracle. The score never
    // becomes a float: FRE = 206.835 − 1.015·W/S − 84.6·Y/W is
    // cross-multiplied by 1000·S·W to the integer lattice
    // fre1000 = 206835·S·W − 1015·W² − 84600·Y·S, and the easy/standard/
    // hard band cuts (60, 30) compare against 60000·S·W / 30000·S·W —
    // pure BIGINT per doc. Scale: one linear scan, band rollup
    // partial-aggregates; no joins, no windows.
    QueryDef(
      "q239_readability_bands",
      (s, dir) => {
        val d = Tables.documents(s, dir)
        val ws = tokens(col("text"))
        val base = d.select(col("doc_id"), col("lang"),
            size(ws).cast("long").as("nw"),
            regexp_count(lower(col("text")), lit("[aeiouy]+"))
              .cast("long").as("ny"))
          .withColumn("ns", expr("(nw + 14) div 15"))
          .withColumn("fre1000",
            expr("206835*ns*nw - 1015*nw*nw - 84600*ny*ns"))
          .withColumn("band",
            when(expr("fre1000 >= 60000*ns*nw"), "easy")
              .when(expr("fre1000 >= 30000*ns*nw"), "standard")
              .otherwise("hard"))
        base.groupBy(col("lang"), col("band"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("nw")).as("n_tokens"),
            sum(col("doc_id")).as("doc_checksum"))
          .orderBy(col("lang"), col("band"))
      },
      Some("""
        WITH toks AS (
          SELECT doc_id, lang, text, string_split(text, ' ') ws FROM documents),
        m AS (
          SELECT doc_id, lang,
                 len(ws)::BIGINT AS nw,
                 len(regexp_extract_all(lower(text), '[aeiouy]+'))::BIGINT AS ny,
                 (len(ws)::BIGINT + 14) // 15 AS ns
          FROM toks),
        b AS (
          SELECT doc_id, lang, nw,
                 CASE WHEN 206835*ns*nw - 1015*nw*nw - 84600*ny*ns >= 60000*ns*nw
                        THEN 'easy'
                      WHEN 206835*ns*nw - 1015*nw*nw - 84600*ny*ns >= 30000*ns*nw
                        THEN 'standard'
                      ELSE 'hard' END AS band
          FROM m)
        SELECT lang, band,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(nw) AS BIGINT) AS n_tokens,
               CAST(SUM(doc_id) AS BIGINT) AS doc_checksum
        FROM b
        GROUP BY 1, 2
        ORDER BY lang, band""")),

    // Post-dedup weighted mix — the report a curation run hands the
    // training-mix planner AFTER near-dup clustering: each document is
    // down-weighted by its MinHash-LSH duplicate-cluster size (weight =
    // 10⁶ div |cluster| ppm, singletons keep 10⁶), so a family of N
    // near-copies contributes ~one document's worth of tokens instead
    // of N (the "count duplicates once" stance of every dedup paper,
    // without deleting anything). Per language: raw vs effective token
    // mass and both mix shares in ppm — the delta IS the skew that
    // naive token counting would have baked into the sampling weights.
    // Reuses the q27 signature path and q48/q120's large-star CC; every
    // new stage is a hash agg or broadcast of bounded tables.
    QueryDef(
      "q279_dedup_weighted_mix",
      (s, dir) => {
        val d = Tables.documents(s, dir)
        val shRows = TextDedup.shingleRows(
          d.select(col("doc_id"), tokens(col("text")).as("ws")), "doc_id", "ws", 3)
        val sig = TextDedup.minhashSignatures(shRows, "doc_id", "_sh", 16)
        val pairs = TextDedup.lshCandidatePairs(sig, "doc_id", "sig", 4, 4)
          .select(col("id_a"), col("id_b"))
        val labels = TextDedup.connectedComponents(pairs, "id_a", "id_b")
        val csize = labels.groupBy(col("cluster_id")).agg(count(lit(1)).as("cs"))
        val weighted = d
          .select(col("doc_id"), col("lang"),
            size(tokens(col("text"))).cast("long").as("n_tokens"))
          .join(labels.withColumnRenamed("node", "doc_id"), Seq("doc_id"), "left")
          .join(csize, Seq("cluster_id"), "left")
          .select(col("lang"), col("n_tokens"),
            coalesce(col("cs"), lit(1L)).as("cs"))
          .withColumn("eff_micro", expr("(n_tokens * 1000000) div cs"))
        val perLang = weighted.groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"),
            sum(col("eff_micro")).as("eff_micro"))
        val tot = perLang.agg(sum(col("n_tokens")).as("tok_tot"),
          sum(col("eff_micro")).as("eff_tot"))
        perLang.crossJoin(broadcast(tot))
          .select(col("lang"), col("n_docs"), col("n_tokens"),
            col("eff_micro"),
            // DECIMAL(38,0) lane: eff_micro is ALREADY micro-scaled, so
            // eff_micro*10^6 breaks int64 once per-language token mass
            // passes ~9*10^6 tokens (hit at the sf10 twin); same lane
            // for the raw share for symmetry
            expr("""cast((cast(n_tokens as decimal(38,0)) * 1000000)
                    div tok_tot as bigint)""").as("raw_share_ppm"),
            expr("""cast((cast(eff_micro as decimal(38,0)) * 1000000)
                    div eff_tot as bigint)""").as("eff_share_ppm"))
          .orderBy(col("lang"))
      },
      Some(s"""
        WITH RECURSIVE $ToksCte, $ShCte, $MhCte, $BandsCte,
        pairs AS (
          SELECT DISTINCT a.doc_id id_a, b.doc_id id_b
          FROM bands a JOIN bands b
            ON a.b = b.b AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
        edges AS (
          SELECT id_a AS u, id_b AS v FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
        reach AS (
          SELECT u AS node, u AS reachable FROM edges
          UNION
          SELECT r.node, e.v FROM reach r JOIN edges e ON e.u = r.reachable),
        labels AS (SELECT node, MIN(reachable) AS cluster_id
                   FROM reach GROUP BY node),
        csize AS (SELECT cluster_id, COUNT(*) AS cs FROM labels GROUP BY 1),
        weighted AS (
          SELECT t.lang, len(t.ws) AS n_tokens,
                 COALESCE(c.cs, 1) AS cs,
                 (len(t.ws) * 1000000) // COALESCE(c.cs, 1) AS eff_micro
          FROM toks t
          LEFT JOIN labels l ON l.node = t.doc_id
          LEFT JOIN csize c ON c.cluster_id = l.cluster_id),
        per_lang AS (
          SELECT lang, COUNT(*) AS n_docs,
                 CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
                 CAST(SUM(eff_micro) AS BIGINT) AS eff_micro
          FROM weighted GROUP BY 1),
        tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS tok_tot,
                       CAST(SUM(eff_micro) AS BIGINT) AS eff_tot
                FROM per_lang)
        SELECT p.lang, p.n_docs, p.n_tokens, p.eff_micro,
               CAST((CAST(p.n_tokens AS HUGEINT) * 1000000) // t.tok_tot
                 AS BIGINT) AS raw_share_ppm,
               CAST((CAST(p.eff_micro AS HUGEINT) * 1000000) // t.eff_tot
                 AS BIGINT) AS eff_share_ppm
        FROM per_lang p CROSS JOIN tot t
        ORDER BY p.lang""")),

    // RAKE keyword extraction (Rose et al.) — PHRASE-level salience,
    // the unsupervised keyword pass that complements the word-level
    // BM25/tf-idf family (q82/q172): candidate phrases are maximal
    // stopword-free token runs (delimiters = the corpus stopword set
    // {the, a}, phrases capped at 3 tokens), each word scores
    // deg/freq — deg counts co-occurrence mass (the word's phrase
    // LENGTH per occurrence), freq its occurrences — and a phrase
    // scores the sum of its words' scores. Everything on the exact
    // ppm lattice: word score = (deg·10⁶) div freq floored once,
    // phrase score = integer sum of word ppms, so both engines agree
    // bit-for-bit (true RAKE's float ratios would drift in sum order).
    // Segmentation is a stopword-prefix-count window KEYED by doc
    // (partition = one document's tokens); word stats and phrase
    // scores are vocab-/phrase-table-sized partial aggregates; top-15
    // by (score, phrase) is a TakeOrdered. Nothing all-pairs, nothing
    // global but the bounded top-k.
    QueryDef(
      "q344_rake_keywords",
      (s, dir) => {
        val d = Tables.documents(s, dir)
          .select(col("doc_id"), posexplode(tokens(col("text"))))
          .withColumnRenamed("pos", "pos").withColumnRenamed("col", "w")
          .withColumn("stop", col("w").isin("the", "a"))
        val wSeg = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val seg = d
          .withColumn("seg", sum(when(col("stop"), 1L).otherwise(0L))
            .over(wSeg))
          .where(!col("stop"))
          .cutLineage()
        val wLen = Window.partitionBy(col("doc_id"), col("seg"))
        val words = seg
          .withColumn("plen", count(lit(1)).over(wLen))
          .where(col("plen") <= 3)
          .cutLineage()
        val wordScore = words.groupBy(col("w"))
          .agg(sum(col("plen")).as("deg"), count(lit(1)).as("freq"))
          .withColumn("w_ppm", expr("(deg * 1000000) div freq"))
        val phrases = words.groupBy(col("doc_id"), col("seg"))
          .agg(concat_ws(" ",
            transform(array_sort(collect_list(struct(col("pos"), col("w")))),
              x => x.getField("w"))).as("phrase"))
          .groupBy(col("phrase")).agg(count(lit(1)).as("n_occ"))
          .cutLineage()
        phrases
          .select(col("phrase"), col("n_occ"),
            explode(split(col("phrase"), " ")).as("w"))
          .join(wordScore.select(col("w"), col("w_ppm")), Seq("w"))
          .groupBy(col("phrase"), col("n_occ"))
          .agg(sum(col("w_ppm")).as("score_ppm"),
            count(lit(1)).cast("long").as("n_words"))
          .orderBy(col("score_ppm").desc, col("phrase"))
          .limit(15)
      },
      Some("""
        WITH tok AS (
          SELECT doc_id, unnest(range(0, len(ws))) AS pos,
                 unnest(ws) AS w
          FROM (SELECT doc_id, string_split(text, ' ') AS ws
                FROM documents)),
        seg AS MATERIALIZED (
          SELECT doc_id, pos, w,
                 SUM(CASE WHEN w IN ('the', 'a') THEN 1 ELSE 0 END)
                   OVER (PARTITION BY doc_id ORDER BY pos
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS seg
          FROM tok
          QUALIFY NOT (w IN ('the', 'a'))),
        words AS MATERIALIZED (
          SELECT doc_id, seg, pos, w,
                 COUNT(*) OVER (PARTITION BY doc_id, seg) AS plen
          FROM seg
          QUALIFY plen <= 3),
        wordscore AS (
          SELECT w, (CAST(SUM(plen) AS BIGINT) * 1000000)
                   // CAST(COUNT(*) AS BIGINT) AS w_ppm
          FROM words GROUP BY 1),
        phrases AS MATERIALIZED (
          SELECT phrase, CAST(COUNT(*) AS BIGINT) AS n_occ FROM (
            SELECT doc_id, seg, string_agg(w, ' ' ORDER BY pos) AS phrase
            FROM words GROUP BY doc_id, seg)
          GROUP BY 1),
        pw AS (
          SELECT phrase, n_occ, unnest(string_split(phrase, ' ')) AS w
          FROM phrases)
        SELECT pw.phrase, pw.n_occ,
               CAST(SUM(ws.w_ppm) AS BIGINT) AS score_ppm,
               CAST(COUNT(*) AS BIGINT) AS n_words
        FROM pw JOIN wordscore ws ON ws.w = pw.w
        GROUP BY 1, 2
        ORDER BY score_ppm DESC, phrase
        LIMIT 15""")),

    // TextRank keywords (Mihalcea & Tarau) — the GRAPH-based salience
    // scorer that completes the keyword triad (q82 tf-idf = frequency,
    // q344 RAKE = phrase co-occurrence degree, TextRank = recursive
    // importance): words are nodes, adjacent-token co-occurrence the
    // undirected weighted edges, and rank is PageRank's damped fixpoint
    // on the q108 micro lattice — r(v) = 0.15·10⁶ + Σᵤ floor(17·wᵤᵥ·
    // r(u) / (20·Wᵤ)) with d = 17/20 rational, two audited synchronous
    // rounds from the uniform 10⁶ state (the bounded-sweep stance;
    // production loops the same round under CheckpointPolicy). A word
    // ranks high when its NEIGHBORS rank high — frequency alone doesn't
    // buy rank (the property RAKE's deg/freq can't express). Scale:
    // bigram extraction is a per-doc lead window (bounded partitions);
    // the graph tables are vocab-sized with partial-agg joins on token
    // keys; top-15 is a TakeOrdered — no global sort, nothing all-pairs.
    QueryDef(
      "q349_textrank",
      (s, dir) => {
        import org.apache.spark.sql.DataFrame
        val tok = Tables.documents(s, dir)
          .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "w")))
        val wD = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
        val e = tok.withColumn("w2", lead(col("w"), 1).over(wD))
          .where(col("w2").isNotNull && col("w") =!= col("w2"))
          .select(least(col("w"), col("w2")).as("a"),
            greatest(col("w"), col("w2")).as("b"))
          .groupBy(col("a"), col("b")).agg(count(lit(1)).as("wt"))
          .cutLineage()
        val dirE = e.select(col("a").as("u"), col("b").as("v"), col("wt"))
          .unionAll(e.select(col("b").as("u"), col("a").as("v"), col("wt")))
        val deg = dirE.groupBy(col("u"))
          .agg(sum(col("wt")).as("wdeg"), count(lit(1)).as("n_neighbors"))
          .cutLineage()
        def step(r: DataFrame): DataFrame =
          dirE.join(deg.select(col("u"), col("wdeg")), Seq("u"))
            .join(r.select(col("node").as("u"), col("r").as("ru")), Seq("u"))
            .groupBy(col("v").as("node"))
            .agg((lit(150000L) +
              sum(expr("(17 * wt * ru) div (20 * wdeg)"))).as("r"))
        val r0 = deg.select(col("u").as("node"), lit(1000000L).as("r"))
        val r2 = step(step(r0).cutLineage())
        r2.join(deg.select(col("u").as("node"), col("wdeg"),
            col("n_neighbors")), Seq("node"))
          .select(col("node").as("word"), col("wdeg"), col("n_neighbors"),
            col("r").as("rank_micro"))
          .orderBy(col("rank_micro").desc, col("word")).limit(15)
      },
      Some("""
        WITH d AS (
          SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        bg AS (
          SELECT unnest(list_transform(range(1, len(ws)), i -> ws[i]))
                   AS w1,
                 unnest(list_transform(range(1, len(ws)), i -> ws[i+1]))
                   AS w2
          FROM d),
        e AS MATERIALIZED (
          SELECT LEAST(w1, w2) AS a, GREATEST(w1, w2) AS b,
                 CAST(COUNT(*) AS BIGINT) AS wt
          FROM bg WHERE w1 <> w2 GROUP BY 1, 2),
        dirE AS MATERIALIZED (
          SELECT a AS u, b AS v, wt FROM e
          UNION ALL SELECT b, a, wt FROM e),
        deg AS MATERIALIZED (
          SELECT u, CAST(SUM(wt) AS BIGINT) AS wdeg,
                 CAST(COUNT(*) AS BIGINT) AS n_neighbors
          FROM dirE GROUP BY 1),
        r1 AS MATERIALIZED (
          SELECT de.v AS node,
                 150000 + CAST(SUM((17 * de.wt * 1000000)
                   // (20 * g.wdeg)) AS BIGINT) AS r
          FROM dirE de JOIN deg g ON g.u = de.u
          GROUP BY 1),
        r2 AS (
          SELECT de.v AS node,
                 150000 + CAST(SUM((17 * de.wt * r1.r)
                   // (20 * g.wdeg)) AS BIGINT) AS r
          FROM dirE de JOIN deg g ON g.u = de.u
          JOIN r1 ON r1.node = de.u
          GROUP BY 1)
        SELECT r2.node AS word, deg.wdeg, deg.n_neighbors,
               r2.r AS rank_micro
        FROM r2 JOIN deg ON deg.u = r2.node
        ORDER BY rank_micro DESC, word
        LIMIT 15""")),

    // Winnowing fingerprints (Schleimer-Wilkerson-Aiken, the MOSS
    // algorithm) — the POSITION-ROBUST fingerprint selection the flat
    // min-shingle family (q29) lacks: slide a window of w = 4
    // consecutive 4-gram hashes and keep each window's minimum
    // (leftmost-min variant; h62 makes intra-window ties measure-zero),
    // guaranteeing any shared run of ≥ w+k−1 tokens yields a shared
    // fingerprint (the detection floor q87's exact 13-grams can't give
    // below 13 tokens) at expected density 2/(w+1) ≈ 400k ppm. Hashes
    // are the string-free ngramHash62 Horner lattice; the min is a
    // per-doc BOUNDED window frame (4 rows); the min's position comes
    // from an equi-join on (doc, hash) + range predicate — shuffles
    // ride 8-byte keys. Gate per source: kgram/fingerprint counts, the
    // density vs the 2/(w+1) expectation, and the cross-doc shared-
    // fingerprint count (the clone-candidate feed). At 100 TB the
    // fingerprint set IS the dedup index — 40% of kgram count, built
    // with one bounded window and one hash join.
    QueryDef(
      "q355_winnowing",
      (s, dir) => {
        val d = Tables.documents(s, dir)
          .select(col("doc_id"), col("source"), tokens(col("text")).as("ws"))
        val sh = TextDedup.ngramHash62Pos(d, "doc_id", "ws", 4)
          .select(col("doc_id"), col("pos"), col("h62").as("h"))
          .cutLineage()
        val wd = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
          .rowsBetween(-3, 0)
        val win = sh.withColumn("mw", min(col("h")).over(wd))
          .where(col("pos") >= 3)
          .select(col("doc_id"), col("pos").as("e"), col("mw"))
        val fps = win.join(sh.select(col("doc_id"), col("pos"),
              col("h").as("mw")), Seq("doc_id", "mw"))
          .where(col("pos").between(col("e") - 3, col("e")))
          .groupBy(col("doc_id"), col("e"), col("mw"))
          .agg(min(col("pos")).as("fpos"))
          .select(col("doc_id"), col("mw").as("h"), col("fpos")).distinct()
          .cutLineage()
        val src = d.select(col("doc_id"), col("source"))
        val kg = sh.join(src, Seq("doc_id")).groupBy(col("source"))
          .agg(countDistinct(col("doc_id")).as("n_docs"),
            count(lit(1)).as("n_kgrams"))
        val fpAgg = fps.join(src, Seq("doc_id")).groupBy(col("source"))
          .agg(count(lit(1)).as("n_fingerprints"))
        val cross = fps.join(src, Seq("doc_id"))
          .select(col("source"), col("h"), col("doc_id")).distinct()
          .groupBy(col("source"), col("h"))
          .agg(count(lit(1)).as("df"))
          .where(col("df") >= 2)
          .groupBy(col("source")).agg(count(lit(1)).as("n_crossdoc_fp"))
        kg.join(fpAgg, Seq("source"))
          .join(cross, Seq("source"), "left")
          .select(col("source"), col("n_docs"), col("n_kgrams"),
            col("n_fingerprints"),
            expr("(n_fingerprints * 1000000) div n_kgrams")
              .as("density_ppm"),
            expr("""(n_fingerprints * 1000000) div n_kgrams
                    between 330000 and 470000""").as("within_expected"),
            coalesce(col("n_crossdoc_fp"), lit(0L)).as("n_crossdoc_fp"))
          .orderBy(col("source"))
      },
      Some("""
        WITH toks AS (
          SELECT doc_id, source, string_split(text, ' ') AS ws
          FROM documents),
        th AS (
          SELECT doc_id, list_transform(ws,
                   t -> CAST(md5_number_lower(t) % 2147483647 AS BIGINT)) AS hs
          FROM toks WHERE len(ws) >= 4),
        sh AS MATERIALIZED (
          SELECT doc_id, unnest(range(0, len(hs) - 3)) AS pos,
                 unnest(list_transform(range(1, len(hs) - 2),
                   i -> list_reduce(list_slice(hs, i, i + 3),
                          (a, x) -> (a * 131 + x) % 2147483647) * 2147483648 +
                        list_reduce(list_slice(hs, i, i + 3),
                          (a, x) -> (a * 137 + x) % 2147483647))) AS h
          FROM th),
        win AS (
          SELECT doc_id, pos AS e, mw FROM (
            SELECT doc_id, pos,
                   MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                     ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS mw
            FROM sh)
          WHERE pos >= 3),
        fps AS MATERIALIZED (
          SELECT DISTINCT doc_id, mw AS h, fpos FROM (
            SELECT w.doc_id, w.e, w.mw, MIN(s.pos) AS fpos
            FROM win w JOIN sh s
              ON s.doc_id = w.doc_id AND s.h = w.mw
             AND s.pos BETWEEN w.e - 3 AND w.e
            GROUP BY 1, 2, 3)),
        src AS (SELECT doc_id, source FROM toks),
        kg AS (
          SELECT t.source, CAST(COUNT(DISTINCT s.doc_id) AS BIGINT)
                   AS n_docs,
                 CAST(COUNT(*) AS BIGINT) AS n_kgrams
          FROM sh s JOIN src t USING (doc_id) GROUP BY 1),
        fpa AS (
          SELECT t.source, CAST(COUNT(*) AS BIGINT) AS n_fingerprints
          FROM fps f JOIN src t USING (doc_id) GROUP BY 1),
        crossd AS (
          SELECT source, CAST(COUNT(*) AS BIGINT) AS n_crossdoc_fp FROM (
            SELECT source, h, COUNT(*) AS df FROM (
              SELECT DISTINCT t.source, f.h, f.doc_id
              FROM fps f JOIN src t USING (doc_id))
            GROUP BY 1, 2)
          WHERE df >= 2 GROUP BY 1)
        SELECT kg.source, kg.n_docs, kg.n_kgrams, fpa.n_fingerprints,
               (fpa.n_fingerprints * 1000000) // kg.n_kgrams
                 AS density_ppm,
               (fpa.n_fingerprints * 1000000) // kg.n_kgrams
                 BETWEEN 330000 AND 470000 AS within_expected,
               COALESCE(c.n_crossdoc_fp, 0) AS n_crossdoc_fp
        FROM kg JOIN fpa ON fpa.source = kg.source
        LEFT JOIN crossd c ON c.source = kg.source
        ORDER BY kg.source""")),

    // Cohen's κ between two independent curation filters — the
    // agreement audit a pipeline runs BEFORE chaining filters: raw
    // percent-agreement overstates consensus when both filters pass
    // almost everything, κ subtracts the chance-agreement floor
    // (the inter-annotator-agreement statistic, here with the two
    // "annotators" being the length gate and the repetition gate the
    // quality funnel (q92) composes). Filter A: 200 ≤ n_chars ≤ 5000.
    // Filter B: modal-token share < 30% (max per-doc token count ·10 <
    // n_tokens·3 — the q59 repetition idea at doc grain). Exact
    // rational end-to-end: po = (a+d)/n, pe from the margins, and
    // κ = (n(a+d) − Σmargins)/(n² − Σmargins) emitted in SIGNED ppm
    // via the truncate-toward-zero |·|-split both engines share.
    // Scale: one token-count rollup per doc (partial-aggregable) + a
    // 4-cell contingency — nothing after the first agg sees data size.
    QueryDef(
      "q372_filter_agreement_kappa",
      (s, dir) => {
        val d = Tables.documents(s, dir)
        val toks = d.select(col("doc_id"), col("n_chars"),
            explode(tokens(col("text"))).as("w"))
          .groupBy(col("doc_id"), col("n_chars"), col("w"))
          .agg(count(lit(1)).as("c"))
          .groupBy(col("doc_id"), col("n_chars"))
          .agg(max(col("c")).as("max_c"), sum(col("c")).as("n_tokens"))
        val flags = toks
          .withColumn("fa", col("n_chars").between(200L, 5000L))
          .withColumn("fb", col("max_c") * 10 < col("n_tokens") * 3)
        val cells = flags.agg(
          sum(when(col("fa") && col("fb"), 1L).otherwise(0L)).as("a"),
          sum(when(col("fa") && !col("fb"), 1L).otherwise(0L)).as("b"),
          sum(when(!col("fa") && col("fb"), 1L).otherwise(0L)).as("c"),
          sum(when(!col("fa") && !col("fb"), 1L).otherwise(0L)).as("d"))
        cells
          .withColumn("n", expr("a + b + c + d"))
          .withColumn("po_ppm", expr("((a + d) * 1000000) div n"))
          .withColumn("pe_num", expr(
            "(a + b) * (a + c) + (c + d) * (b + d)"))
          .withColumn("pe_ppm", expr("(pe_num * 1000000) div (n * n)"))
          .withColumn("knum", expr("n * (a + d) - pe_num"))
          .withColumn("kden", expr("n * n - pe_num"))
          .withColumn("kappa_ppm", expr(
            """case when kden = 0 then 0
               when knum < 0 then -(((-knum) * 1000000) div kden)
               else (knum * 1000000) div kden end"""))
          .select(col("a"), col("b"), col("c"), col("d"), col("n"),
            col("po_ppm"), col("pe_ppm"), col("kappa_ppm"))
      },
      Some(s"""
        WITH $ToksCte,
        tc AS (
          SELECT t.doc_id, d.n_chars,
                 CAST(MAX(cnt) AS BIGINT) AS max_c,
                 CAST(SUM(cnt) AS BIGINT) AS n_tokens
          FROM (SELECT doc_id, w, COUNT(*) AS cnt
                FROM (SELECT doc_id, unnest(ws) AS w FROM toks)
                GROUP BY 1, 2) t
          JOIN documents d ON d.doc_id = t.doc_id
          GROUP BY 1, 2),
        flags AS (
          SELECT (n_chars BETWEEN 200 AND 5000) AS fa,
                 (max_c * 10 < n_tokens * 3) AS fb
          FROM tc),
        cells AS (
          SELECT CAST(SUM(CASE WHEN fa AND fb THEN 1 ELSE 0 END) AS BIGINT) AS a,
                 CAST(SUM(CASE WHEN fa AND NOT fb THEN 1 ELSE 0 END) AS BIGINT) AS b,
                 CAST(SUM(CASE WHEN NOT fa AND fb THEN 1 ELSE 0 END) AS BIGINT) AS c,
                 CAST(SUM(CASE WHEN NOT fa AND NOT fb THEN 1 ELSE 0 END) AS BIGINT) AS d
          FROM flags),
        fin AS (
          SELECT *, a + b + c + d AS n,
                 (a + b) * (a + c) + (c + d) * (b + d) AS pe_num
          FROM cells)
        SELECT a, b, c, d, n,
               ((a + d) * 1000000) // n AS po_ppm,
               (pe_num * 1000000) // (n * n) AS pe_ppm,
               CASE WHEN n * n - pe_num = 0 THEN 0
                    WHEN n * (a + d) - pe_num < 0
                    THEN -(((-(n * (a + d) - pe_num)) * 1000000)
                           // (n * n - pe_num))
                    ELSE ((n * (a + d) - pe_num) * 1000000)
                         // (n * n - pe_num) END AS kappa_ppm
        FROM fin""")),

    // Capture-recapture estimate of the TRUE duplicate count — the
    // ecology estimator (Lincoln-Petersen, Chapman's bias-corrected
    // form) applied to dedup QA: run two independent duplicate
    // catchers, treat each flagged-doc set as a "capture", and estimate
    // how many duplicates exist that BOTH methods missed — the question
    // "is my dedup recall 60% or 95%" that no single method can answer
    // about itself. Catcher A = winnowing min-shingle fingerprint
    // collision (q26's lattice); catcher B = full-64-bit SimHash
    // collision (q28's). Chapman N̂ = (a+1)(b+1) div (m+1) − 1, all
    // integer. The independence assumption is only approximate here
    // (both catchers over-sample strong duplicates), so N̂ reads as a
    // LOWER bound on the true dup population — stated as such; the
    // per-method coverage ratios a/N̂, b/N̂ are the actionable output.
    // Scale: two fingerprint rollups (group-count windows keyed by the
    // fingerprint — bounded by dup-group size) + a 4-cell contingency.
    QueryDef(
      "q376_capture_recapture",
      (s, dir) => {
        val d = Tables.documents(s, dir)
        val ws = tokens(col("text"))
        val winnow = TextDedup.minShingleFingerprints(
          TextDedup.shingleRows(
            d.select(col("doc_id"), ws.as("ws")), "doc_id", "ws", 3),
          "doc_id", "_sh")
        val aFlag = winnow.withColumn("ga",
            count(lit(1)).over(Window.partitionBy(col("winnow_fp"))))
          .select(col("doc_id"), (col("ga") > 1).as("fa"))
        val sh = TextDedup.simhashes(
          d.select(col("doc_id"), ws.as("ws")), "doc_id", "ws")
        val bFlag = sh.withColumn("gb",
            count(lit(1)).over(Window.partitionBy(col("simhash_hi"),
              col("simhash_lo"))))
          .select(col("doc_id"), (col("gb") > 1).as("fb"))
        val j = d.select(col("doc_id"))
          .join(aFlag, Seq("doc_id"), "left")
          .join(bFlag, Seq("doc_id"), "left")
          .select(coalesce(col("fa"), lit(false)).as("fa"),
            coalesce(col("fb"), lit(false)).as("fb"))
        j.agg(count(lit(1)).as("n_docs"),
            sum(when(col("fa"), 1L).otherwise(0L)).as("a"),
            sum(when(col("fb"), 1L).otherwise(0L)).as("b"),
            sum(when(col("fa") && col("fb"), 1L).otherwise(0L)).as("m"))
          .withColumn("union_observed", expr("a + b - m"))
          .withColumn("chapman_nhat", expr(
            "((a + 1) * (b + 1)) div (m + 1) - 1"))
          .withColumn("coverage_a_ppm", expr(
            "case when chapman_nhat <= 0 then 0 else (a * 1000000) div chapman_nhat end"))
          .withColumn("coverage_b_ppm", expr(
            "case when chapman_nhat <= 0 then 0 else (b * 1000000) div chapman_nhat end"))
          .select(col("n_docs"), col("a"), col("b"), col("m"),
            col("union_observed"), col("chapman_nhat"),
            col("coverage_a_ppm"), col("coverage_b_ppm"))
      },
      Some(s"""
        WITH $ToksCte, $ShCte,
        wfp AS (
          SELECT t.doc_id,
                 list_min(list_transform(sh.s, x -> md5_number_lower(x)))::VARCHAR
                   AS winnow_fp
          FROM toks t JOIN sh ON sh.doc_id = t.doc_id),
        afl AS (
          SELECT doc_id,
                 COUNT(*) OVER (PARTITION BY winnow_fp) > 1 AS fa
          FROM wfp),
        h AS (SELECT doc_id,
                list_transform(ws, t -> ((md5_number_lower(t) >> 32))::BIGINT) his,
                list_transform(ws, t -> ((md5_number_lower(t) & 4294967295))::BIGINT) los
              FROM toks),
        sim AS (
          SELECT doc_id,
            CAST(list_sum(list_transform(range(0,32), b ->
              CASE WHEN list_sum(list_transform(his, h2 -> ((h2 >> b) & 1)*2 - 1)) > 0
                   THEN (1::BIGINT << b) ELSE 0::BIGINT END)) AS BIGINT) AS hi,
            CAST(list_sum(list_transform(range(0,32), b ->
              CASE WHEN list_sum(list_transform(los, h2 -> ((h2 >> b) & 1)*2 - 1)) > 0
                   THEN (1::BIGINT << b) ELSE 0::BIGINT END)) AS BIGINT) AS lo
          FROM h),
        bfl AS (
          SELECT doc_id, COUNT(*) OVER (PARTITION BY hi, lo) > 1 AS fb
          FROM sim),
        flags AS (
          SELECT COALESCE(a.fa, false) AS fa, COALESCE(b.fb, false) AS fb
          FROM documents d
          LEFT JOIN afl a ON a.doc_id = d.doc_id
          LEFT JOIN bfl b ON b.doc_id = d.doc_id),
        cells AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(SUM(CASE WHEN fa THEN 1 ELSE 0 END) AS BIGINT) AS a,
                 CAST(SUM(CASE WHEN fb THEN 1 ELSE 0 END) AS BIGINT) AS b,
                 CAST(SUM(CASE WHEN fa AND fb THEN 1 ELSE 0 END) AS BIGINT)
                   AS m
          FROM flags)
        SELECT n_docs, a, b, m, a + b - m AS union_observed,
               ((a + 1) * (b + 1)) // (m + 1) - 1 AS chapman_nhat,
               CASE WHEN ((a + 1) * (b + 1)) // (m + 1) - 1 <= 0 THEN 0
                    ELSE (a * 1000000)
                         // (((a + 1) * (b + 1)) // (m + 1) - 1) END
                 AS coverage_a_ppm,
               CASE WHEN ((a + 1) * (b + 1)) // (m + 1) - 1 <= 0 THEN 0
                    ELSE (b * 1000000)
                         // (((a + 1) * (b + 1)) // (m + 1) - 1) END
                 AS coverage_b_ppm
        FROM cells"""))
  )
}
