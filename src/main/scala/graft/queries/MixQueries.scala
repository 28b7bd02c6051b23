package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Kernels
import graft.functions.Kernels.md5Lower64
import graft.functions.TextKernels._
import graft.operators.TextDedup
import graft.sources.Tables
import graft.plans.CheckpointPolicy.DataFrameCutOps

/** Corpus mixing + decontamination, round 4 batch 2 — the three named
  * techniques every pretraining data pipeline runs between raw corpus
  * and training mix:
  *
  *  - q87: EXACT n-gram decontamination (the GPT-3/PaLM eval-leakage
  *    check — 13-gram overlap between train and held-out splits),
  *    complementing q60's NEAR-dup winnowing check.
  *  - q88: paragraph-level first-occurrence dedup (the CCNet shape:
  *    drop repeated paragraphs corpus-wide, keep document remainders).
  *  - q89: temperature-flattened language rebalancing (upweight the
  *    tail toward uniform with T=2, i.e. sqrt-flattening — the
  *    multilingual mixing step; deterministic hash sampling, no RNG).
  */
object MixQueries {

  val defs: Seq[QueryDef] = Seq(

    // 13-gram exact decontamination. Train/test split reuses q58's
    // deterministic hash buckets; both sides hash their 13-grams via
    // TextDedup.ngramHash62 — tokens digested ONCE, windows combined
    // in pure int64 Horner arithmetic, so no 13-gram string is ever
    // materialized and the join key is 8 bytes. Train pre-aggregates
    // to DISTINCT hashes so the join is skew-free; per-test-doc
    // contamination is a distinct-count over join hits. At 100 TB both
    // sides are one token-stream shuffle + one hash-key join, all
    // partial-agg'd.
    QueryDef(
      "q87_ngram_decontam",
      (s, dir) => {
        val d = Tables.documents(s, dir)
        val sh = TextDedup.ngramHash62(
            d.select(col("doc_id"), tokens(col("text")).as("ws")), "doc_id", "ws", 13)
          .select(col("doc_id"), col("h62").as("h"))
          .groupBy(col("doc_id"), col("h")).agg(count(lit(1)).as("_dup"))
          .withColumn("bucket",
            Kernels.md5BitsModK(Kernels.md5Bits(concat(lit("split:"), col("doc_id"))), 100L))
        val train = sh.where(col("bucket") < 80)
          .select(col("h")).distinct()
        val test = sh.where(col("bucket") >= 90)
          .select(col("doc_id").as("test_doc"), col("h"))
        val perDoc = test.groupBy(col("test_doc"))
          .agg(count(lit(1)).as("n_shingles"))
        val contam = test.join(train, Seq("h"))
          .groupBy(col("test_doc"))
          .agg(count(lit(1)).as("n_contaminated"))
        contam.join(perDoc, Seq("test_doc"))
          .select(col("test_doc"), col("n_shingles"), col("n_contaminated"),
            (col("n_contaminated").cast("double") / col("n_shingles"))
              .as("contamination_frac"))
          .orderBy(col("test_doc"))
      },
      Some("""
        WITH toks AS (
          SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        th AS (
          SELECT doc_id, list_transform(ws,
                   t -> CAST(md5_number_lower(t) % 2147483647 AS BIGINT)) AS hs
          FROM toks WHERE len(ws) >= 13),
        sh AS (
          SELECT DISTINCT doc_id,
                 unnest(list_transform(range(1, len(hs) - 11),
                   i -> list_reduce(list_slice(hs, i, i + 12),
                          (a, x) -> (a * 131 + x) % 2147483647) * 2147483648 +
                        list_reduce(list_slice(hs, i, i + 12),
                          (a, x) -> (a * 137 + x) % 2147483647))) AS h
          FROM th),
        b AS (
          SELECT doc_id, h,
                 CAST(md5_number_lower('split:' || doc_id) % 100 AS BIGINT) AS bucket
          FROM sh),
        train AS (SELECT DISTINCT h FROM b WHERE bucket < 80),
        test AS (SELECT doc_id AS test_doc, h FROM b WHERE bucket >= 90),
        per_doc AS (SELECT test_doc, COUNT(*) AS n_shingles FROM test GROUP BY 1),
        contam AS (
          SELECT test_doc, COUNT(*) AS n_contaminated
          FROM test JOIN train USING (h) GROUP BY 1)
        SELECT c.test_doc, p.n_shingles, c.n_contaminated,
               c.n_contaminated::DOUBLE / p.n_shingles AS contamination_frac
        FROM contam c JOIN per_doc p USING (test_doc)
        ORDER BY test_doc""")),

    // Paragraph-level first-occurrence dedup (CCNet shape). Documents
    // split into non-overlapping 10-token segments; each segment keeps
    // only its globally-first occurrence (by doc_id, then position —
    // a total order, so the kept set is deterministic at any
    // parallelism). One window over the segment hash (the only
    // cross-doc shuffle, 8-byte key), then a per-doc rollup rebuilds
    // the deduped text. collect_list is order-free → the kept segments
    // are sorted by position before concat (never gate raw
    // collect_list); the transform() lambda touches ≤ a handful of
    // segments per doc — output assembly, not the hot path.
    QueryDef(
      "q88_paragraph_dedup",
      (s, dir) => {
        val d = Tables.documents(s, dir)
        val t = d.select(col("doc_id"), tokens(col("text")).as("ws"))
          .select(col("doc_id"), col("ws"), size(col("ws")).as("n"))
        val segs = t.select(col("doc_id"),
            explode(sequence(lit(0), col("n") - 1, lit(10))).as("st"),
            col("ws"), col("n"))
          .select(col("doc_id"), col("st"),
            concat_ws(" ", slice(col("ws"), col("st") + 1, lit(10))).as("seg"))
          .withColumn("h", md5Lower64(col("seg")))
        val w = Window.partitionBy(col("h")).orderBy(col("doc_id"), col("st"))
        val flagged = segs
          .withColumn("kept", row_number().over(w) === 1)
        flagged.groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_segs"),
            sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
            concat_ws(" ", transform(
              sort_array(collect_list(when(col("kept"),
                struct(col("st"), col("seg"))))),
              x => x.getField("seg"))).as("dedup_text"))
          .orderBy(col("doc_id"))
      },
      Some("""
        WITH toks AS (
          SELECT doc_id, string_split(text, ' ') AS ws,
                 len(string_split(text, ' ')) AS n
          FROM documents),
        segs AS (
          SELECT doc_id, unnest(range(0, n, 10)) AS st, ws, n FROM toks),
        seg AS (
          SELECT doc_id, st,
                 array_to_string(list_slice(ws, st + 1, least(st + 10, n)), ' ') AS seg
          FROM segs),
        flagged AS (
          SELECT doc_id, st, seg,
                 row_number() OVER (PARTITION BY md5_number_lower(seg)
                                    ORDER BY doc_id, st) = 1 AS kept
          FROM seg)
        SELECT doc_id, COUNT(*) AS n_segs,
               CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
               coalesce(string_agg(seg, ' ' ORDER BY st) FILTER (WHERE kept), '')
                 AS dedup_text
        FROM flagged
        GROUP BY doc_id
        ORDER BY doc_id""")),

    // Temperature-flattened language rebalancing: keep_rate(lang) =
    // sqrt(n_min / n_lang) — T=2 flattening toward uniform relative to
    // the smallest language. Every arithmetic op (divide, sqrt, floor,
    // integer mod) is IEEE-correctly-rounded or exact, so both engines
    // compute bit-identical thresholds — deliberately NO pow() (not
    // correctly-rounded, the q75/q82 transcendental stance). Membership
    // is a pure hash of doc_id: reproducible on any cluster, stable
    // under corpus growth. Two tiny broadcast aggregates + one per-row
    // filter — linear, one shuffle.
    QueryDef(
      "q89_temperature_mix",
      (s, dir) => {
        val d = Tables.documents(s, dir)
        val counts = d.groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
        val nMin = counts.agg(min(col("n_docs")).as("n_min"))
        val rates = counts.crossJoin(broadcast(nMin))
          .select(col("lang"), col("n_docs"),
            sqrt(col("n_min").cast("double") / col("n_docs").cast("double"))
              .as("keep_rate"))
          .select(col("lang"), col("n_docs"), col("keep_rate"),
            floor(col("keep_rate") * lit(1000000.0d)).cast("long").as("threshold"))
        val kept = d.select(col("doc_id"), col("lang"),
            Kernels.md5BitsModK(Kernels.md5Bits(concat(lit("mix:"), col("doc_id"))), 1000000L)
              .as("bucket"))
          .join(broadcast(rates), Seq("lang"))
          .where(col("bucket") < col("threshold"))
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_kept"), sum(col("doc_id")).as("kept_id_sum"))
        rates.join(kept, Seq("lang"), "left")
          .select(col("lang"), col("n_docs"), col("keep_rate"), col("threshold"),
            coalesce(col("n_kept"), lit(0L)).as("n_kept"),
            coalesce(col("kept_id_sum"), lit(0L)).as("kept_id_sum"))
          .orderBy(col("lang"))
      },
      Some("""
        WITH counts AS (
          SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY 1),
        nmin AS (SELECT MIN(n_docs) AS n_min FROM counts),
        rates AS (
          SELECT lang, n_docs,
                 sqrt(n_min::DOUBLE / n_docs::DOUBLE) AS keep_rate,
                 CAST(floor(sqrt(n_min::DOUBLE / n_docs::DOUBLE) * 1000000.0) AS BIGINT)
                   AS threshold
          FROM counts CROSS JOIN nmin),
        kept AS (
          SELECT d.lang, COUNT(*) AS n_kept,
                 CAST(SUM(d.doc_id) AS BIGINT) AS kept_id_sum
          FROM documents d JOIN rates r USING (lang)
          WHERE CAST(md5_number_lower('mix:' || d.doc_id) % 1000000 AS BIGINT)
                  < r.threshold
          GROUP BY 1)
        SELECT r.lang, r.n_docs, r.keep_rate, r.threshold,
               coalesce(k.n_kept, 0) AS n_kept,
               coalesce(k.kept_id_sum, 0) AS kept_id_sum
        FROM rates r LEFT JOIN kept k USING (lang)
        ORDER BY lang""")),

    // Deterministic global training-order shuffle + round-robin
    // sharding. The training order is a pure function of doc_id
    // (order by md5 hash), so any re-run on any cluster reproduces the
    // same epoch order. The global rank is computed the DISTRIBUTED
    // way — never a single-partition window: 256 range buckets from
    // the hash's high bits (arithmetic shift preserves the sign-flipped
    // order), a 256-row prefix-sum of bucket counts, then per-bucket
    // local row_number + offset. That is the terasort shape: the only
    // global structure is a tiny bucket-count exchange. The oracle
    // computes the same positions with a plain single-node row_number;
    // the order-sensitive checksum Σ(pos·doc_id) per shard gates that
    // the distributed rank is EXACTLY the sequential one.
    QueryDef(
      "q95_training_shuffle",
      (s, dir) => {
        val d = Tables.documents(s, dir)
        val hOrd = Kernels.md5BitsOrderable(
          Kernels.md5Bits(concat(lit("shuffle:"), col("doc_id"))))
        val based = d.select(col("doc_id"), hOrd.as("h"))
          .withColumn("bucket", shiftright(col("h"), 56))
        val counts = based.groupBy(col("bucket"))
          .agg(count(lit(1)).as("n"))
        val wOff = Window.orderBy(col("bucket"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
        val offsets = counts
          .select(col("bucket"), coalesce(sum(col("n")).over(wOff), lit(0L))
            .as("offset"))
        val wLocal = Window.partitionBy(col("bucket"))
          .orderBy(col("h"), col("doc_id"))
        val ranked = based.join(offsets, Seq("bucket"))
          .select(col("doc_id"),
            (col("offset") + row_number().over(wLocal)).as("pos"))
        ranked.select(col("doc_id"), col("pos"),
            ((col("pos") - 1) % 8).as("shard"))
          .groupBy(col("shard"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("doc_id")).as("id_sum"),
            sum(col("pos") * col("doc_id")).as("order_checksum"))
          .orderBy(col("shard"))
      },
      Some("""
        WITH h AS (
          SELECT doc_id, md5_number_lower('shuffle:' || doc_id) AS h
          FROM documents),
        ranked AS (
          SELECT doc_id,
                 row_number() OVER (ORDER BY h, doc_id) AS pos
          FROM h)
        SELECT (pos - 1) % 8 AS shard, COUNT(*) AS n_docs,
               CAST(SUM(doc_id) AS BIGINT) AS id_sum,
               CAST(SUM(pos * doc_id) AS BIGINT) AS order_checksum
        FROM ranked
        GROUP BY 1
        ORDER BY shard""")),

    // Capped waterfilling mix — the allocation step q89's temperature
    // weights feed into: give each language floor(sqrt(cap)) weight
    // (temperature 0.5) of a 90% token budget (high enough that the
    // flattening pushes small languages past their availability — both
    // branches and the redistribution are exercised by the data), but never MORE tokens
    // than it has (the availability cap). Closed form, no iteration:
    // sort languages by cap/weight (floor-div ratio key, lang
    // tiebreak — both engines sort by the identical composite);
    // a language is capped iff its proportional share of the budget
    // REMAINING after all earlier (scarcer) languages exceeds its cap,
    // and cappedness is monotone in that order (running-min flag).
    // Every comparison is cross-multiplied BIGINT; sqrt is correctly
    // rounded IEEE on integers < 2^53 then floored, so both engines
    // derive identical weights. The frame is |languages| rows — the
    // whole computation after one corpus aggregate is broadcast-sized,
    // which is exactly why the mix step never bottlenecks at 100 TB.
    QueryDef(
      "q166_waterfill_mix",
      (s, dir) => {
        val langs = Tables.documents(s, dir)
          .groupBy(col("lang")).agg(sum(col("n_chars")).as("cap"))
          .withColumn("wgt", floor(sqrt(col("cap"))).cast("long"))
        val all = Window.partitionBy(lit(1))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        // DECIMAL(38,0) lane on every cap-sized cross-multiplication:
        // cap is a per-language CHARACTER SUM (corpus-proportional), so
        // cap*10^9 and cap*(W-pw) break int64 around 10^10 chars/lang
        // (the q279 sf10-twin lesson applied ahead of the crash)
        val byRatio = Window.partitionBy(lit(1))
          .orderBy(expr("cast(cap as decimal(38,0)) * 1000000000 DIV wgt"),
            col("lang"))
        val prefix = byRatio.rowsBetween(Window.unboundedPreceding, -1)
        val runMin = byRatio.rowsBetween(Window.unboundedPreceding, 0)
        val flagged = langs
          .withColumn("B", expr("CAST(sum(cap) OVER " +
            "(PARTITION BY 1 ROWS BETWEEN UNBOUNDED PRECEDING AND " +
            "UNBOUNDED FOLLOWING) * 9 DIV 10 AS BIGINT)"))
          .withColumn("W", sum(col("wgt")).over(all))
          .withColumn("pc", coalesce(sum(col("cap")).over(prefix), lit(0L)))
          .withColumn("pw", coalesce(sum(col("wgt")).over(prefix), lit(0L)))
          .withColumn("cond",
            (col("cap").cast("decimal(38,0)") * (col("W") - col("pw")) <
              col("wgt").cast("decimal(38,0)") * (col("B") - col("pc")))
              .cast("int"))
          .withColumn("is_capped", min(col("cond")).over(runMin) === 1)
        flagged
          .withColumn("cap_c",
            sum(when(col("is_capped"), col("cap")).otherwise(0L)).over(all))
          .withColumn("cap_w",
            sum(when(col("is_capped"), col("wgt")).otherwise(0L)).over(all))
          .withColumn("alloc",
            when(col("is_capped"), col("cap")).otherwise(
              expr("cast(wgt as decimal(38,0)) * (B - cap_c) DIV (W - cap_w)")))
          .select(col("lang"), col("cap"), col("wgt"), col("is_capped"),
            col("alloc"))
          .orderBy(col("lang"))
      },
      Some("""
        WITH langs AS (
          SELECT lang, CAST(SUM(n_chars) AS BIGINT) AS cap,
                 CAST(floor(sqrt(CAST(SUM(n_chars) AS DOUBLE))) AS BIGINT) AS wgt
          FROM documents GROUP BY 1),
        tot AS (
          SELECT *,
                 (SUM(cap) OVER ()) * 9 // 10 AS B,
                 SUM(wgt) OVER () AS W,
                 COALESCE(SUM(cap) OVER w, 0) AS pc,
                 COALESCE(SUM(wgt) OVER w, 0) AS pw
          FROM langs
          WINDOW w AS (ORDER BY (CAST(cap AS HUGEINT) * 1000000000) // wgt, lang
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        flagged AS (
          SELECT *,
                 MIN(CASE WHEN CAST(cap AS HUGEINT) * (W - pw)
                               < CAST(wgt AS HUGEINT) * (B - pc)
                          THEN 1 ELSE 0 END)
                   OVER (ORDER BY (CAST(cap AS HUGEINT) * 1000000000) // wgt, lang
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) = 1
                   AS is_capped
          FROM tot),
        totals AS (
          SELECT *,
                 SUM(CASE WHEN is_capped THEN cap ELSE 0 END) OVER () AS cap_c,
                 SUM(CASE WHEN is_capped THEN wgt ELSE 0 END) OVER () AS cap_w
          FROM flagged)
        SELECT lang, cap, wgt, is_capped,
               CAST(CASE WHEN is_capped THEN CAST(cap AS HUGEINT)
                    ELSE CAST(wgt AS HUGEINT) * (B - cap_c) // (W - cap_w)
                    END AS BIGINT) AS alloc
        FROM totals
        ORDER BY lang""")),

    // Weighted sampling without replacement, deterministic: the
    // Duffield-Lund-Thorup priority-sampling scheme with the uniform
    // draw replaced by a content-keyed hash (u = md5 u64 mod 2⁵³) and
    // the priority u/w kept as an exact integer floor-divide — higher
    // weight → smaller priority → more likely in the per-segment top-k.
    // No RNG: re-running on a grown table keeps every surviving row's
    // priority, so samples are reproducible and incremental (the same
    // property q58 gives unweighted splits). One shuffle on the segment
    // key; the top-k window frame never materializes more than k rows
    // per group downstream. Weights are balance cents shifted positive.
    QueryDef(
      "q209_weighted_sample",
      (s, dir) => {
        val c = Tables.customer(s, dir)
        val u = Kernels.md5BitsModK(
          Kernels.md5Bits(concat(lit("ws:"), col("c_custkey"))), 9007199254740992L)
        val w = (col("c_acctbal").cast("decimal(18,2)") * 100).cast("long") + 100000L
        val ranked = c.select(col("c_mktsegment").as("segment"),
            col("c_custkey"), u.as("u"), w.as("w"))
          .select(col("segment"), col("c_custkey"),
            expr("u div w").as("priority"))
          .withColumn("rank", row_number().over(
            Window.partitionBy(col("segment"))
              .orderBy(col("priority"), col("c_custkey"))))
          .where(col("rank") <= 20)
        ranked.select(col("segment"), col("rank").cast("long").as("rank"),
            col("c_custkey"), col("priority"))
          .orderBy(col("segment"), col("rank"))
      },
      Some("""
        WITH p AS (
          SELECT c_mktsegment AS segment, c_custkey,
                 CAST((md5_number_lower('ws:' || c_custkey) % 9007199254740992)
                      // (CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) + 100000)
                      AS BIGINT) AS priority
          FROM customer),
        r AS (
          SELECT segment, c_custkey, priority,
                 row_number() OVER (PARTITION BY segment
                                    ORDER BY priority, c_custkey) AS rank
          FROM p)
        SELECT segment, CAST(rank AS BIGINT) AS rank, c_custkey, priority
        FROM r WHERE rank <= 20
        ORDER BY segment, rank""")),

    // FUZZY n-gram decontamination — q87's exact 13-gram check misses a
    // contaminated passage the moment one token was edited (typo fixes,
    // number substitutions, detokenization drift are the classic eval-
    // leakage camouflage). The center-skip key closes that hole at NO
    // extra hash cost: each 13-window hashes its 12 non-center tokens
    // (TextDedup.ngramHash62SkipCenter), so a window whose center was
    // substituted still matches, and since windows slide, ANY isolated
    // single-token edit ≥6 tokens from an overlap edge is the center of
    // some window — unlike the 13× blowup of hashing every wildcard
    // position. Exact-match counts ride along: per eval doc,
    // n_fuzzy ≥ n_exact by construction (an exact match is a fortiori
    // a skip match), and the gap is exactly the camouflaged mass.
    // Scale: identical topology to q87 — one digest per token, 8-byte
    // window keys, distinct-key semi-joins; nothing all-pairs.
    QueryDef(
      "q323_fuzzy_decontam",
      (s, dir) => {
        val d = Tables.documents(s, dir)
          .select(col("doc_id"), tokens(col("text")).as("ws"))
          .withColumn("bucket",
            Kernels.md5BitsModK(Kernels.md5Bits(concat(lit("split:"),
              col("doc_id"))), 100L))
          .where(col("bucket") < 80 || col("bucket") >= 90)
          .cutLineage()
        def withBucket(df: org.apache.spark.sql.DataFrame) =
          df.withColumn("bucket",
            Kernels.md5BitsModK(Kernels.md5Bits(concat(lit("split:"),
              col("doc_id"))), 100L))
        val exact = withBucket(TextDedup.ngramHash62(d, "doc_id", "ws", 13))
        val fuzzy = withBucket(
          TextDedup.ngramHash62SkipCenter(d, "doc_id", "ws", 13))
        val trainE = exact.where(col("bucket") < 80)
          .select(col("h62")).distinct()
        val trainF = fuzzy.where(col("bucket") < 80)
          .select(col("h62")).distinct()
        val testE = exact.where(col("bucket") >= 90)
          .select(col("doc_id").as("test_doc"), col("h62"))
        val testF = fuzzy.where(col("bucket") >= 90)
          .select(col("doc_id").as("test_doc"), col("h62"))
        val perDoc = testF.groupBy(col("test_doc"))
          .agg(count(lit(1)).as("n_windows"))
        val nExact = testE.join(trainE, Seq("h62"))
          .groupBy(col("test_doc")).agg(count(lit(1)).as("n_exact"))
        val nFuzzy = testF.join(trainF, Seq("h62"))
          .groupBy(col("test_doc")).agg(count(lit(1)).as("n_fuzzy"))
        nFuzzy.join(perDoc, Seq("test_doc"))
          .join(nExact, Seq("test_doc"), "left")
          .select(col("test_doc"), col("n_windows"),
            coalesce(col("n_exact"), lit(0L)).as("n_exact"),
            col("n_fuzzy"),
            (col("n_fuzzy") - coalesce(col("n_exact"), lit(0L)))
              .as("n_camouflaged"))
          .orderBy(col("test_doc"))
      },
      Some("""
        WITH toks AS (
          SELECT doc_id, string_split(text, ' ') AS ws,
                 CAST(md5_number_lower('split:' || doc_id) % 100 AS BIGINT)
                   AS bucket
          FROM documents),
        th AS (
          SELECT doc_id, bucket, list_transform(ws,
                   t -> CAST(md5_number_lower(t) % 2147483647 AS BIGINT))
                   AS hs
          FROM toks
          WHERE len(ws) >= 13 AND (bucket < 80 OR bucket >= 90)),
        ex AS (
          SELECT doc_id, bucket,
                 unnest(list_transform(range(1, len(hs) - 11),
                   i -> list_reduce(list_slice(hs, i, i + 12),
                          (a, x) -> (a * 131 + x) % 2147483647)
                        * 2147483648 +
                        list_reduce(list_slice(hs, i, i + 12),
                          (a, x) -> (a * 137 + x) % 2147483647))) AS h
          FROM th),
        fz AS (
          SELECT doc_id, bucket,
                 unnest(list_transform(range(1, len(hs) - 11),
                   i -> list_reduce(
                          list_concat(list_slice(hs, i, i + 5),
                                      list_slice(hs, i + 7, i + 12)),
                          (a, x) -> (a * 131 + x) % 2147483647)
                        * 2147483648 +
                        list_reduce(
                          list_concat(list_slice(hs, i, i + 5),
                                      list_slice(hs, i + 7, i + 12)),
                          (a, x) -> (a * 137 + x) % 2147483647))) AS h
          FROM th),
        train_e AS (SELECT DISTINCT h FROM ex WHERE bucket < 80),
        train_f AS (SELECT DISTINCT h FROM fz WHERE bucket < 80),
        test_e AS (SELECT doc_id AS test_doc, h FROM ex WHERE bucket >= 90),
        test_f AS (SELECT doc_id AS test_doc, h FROM fz WHERE bucket >= 90),
        per_doc AS (SELECT test_doc, CAST(COUNT(*) AS BIGINT) AS n_windows
                    FROM test_f GROUP BY 1),
        ne AS (SELECT test_doc, CAST(COUNT(*) AS BIGINT) AS n_exact
               FROM test_e JOIN train_e USING (h) GROUP BY 1),
        nf AS (SELECT test_doc, CAST(COUNT(*) AS BIGINT) AS n_fuzzy
               FROM test_f JOIN train_f USING (h) GROUP BY 1)
        SELECT f.test_doc, p.n_windows,
               COALESCE(e.n_exact, 0) AS n_exact, f.n_fuzzy,
               f.n_fuzzy - COALESCE(e.n_exact, 0) AS n_camouflaged
        FROM nf f
        JOIN per_doc p USING (test_doc)
        LEFT JOIN ne e USING (test_doc)
        ORDER BY f.test_doc""")))
}
