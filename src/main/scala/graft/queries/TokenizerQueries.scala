package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextKernels.tokens
import graft.sources.Tables
import graft.plans.CheckpointPolicy.DataFrameCutOps

/** Tokenizer-training primitives — the step a pre-training pipeline runs
  * AFTER curation (dedup q27/q87, quality q92, mixing q166) and BEFORE
  * tokenization (q42 counts with a fixed vocab; this is where that vocab
  * comes from). Distributed BPE induction is the canonical shape: one
  * corpus pass builds the distinct-word frequency table, then every merge
  * round runs on that VOCAB-SIZED table, never the corpus again — the
  * reason BPE trainers scale to 100 TB corpora on one machine's worth of
  * reduce state (the word table at web scale is ~10⁷ rows ≪ corpus).
  *
  * Determinism stance: symbol sequences are '·'-wrapped strings
  * ("abc" → "·a··b··c·"), so a merge is a plain leftmost
  * non-overlapping string replace — identical semantics in Spark
  * (UTF8String.replace) and DuckDB (replace) — and pair selection
  * breaks count ties on the pair string itself. No floats anywhere.
  */
object TokenizerQueries {

  /** Per-symbol wrap: each symbol sits between its own separators, so the
    * pattern "·a··b·" can only match a REAL (a,b) symbol boundary — a
    * pair inside a previously-merged symbol (e.g. "b·c" inside "·ab··c·")
    * has a letter, not '·', before it and cannot false-match; and because
    * each occurrence carries its own separators, consecutive disjoint
    * occurrences ("a b a b") all match in one replace pass. */
  private def charWrap(word: Column): Column =
    regexp_replace(word, "(.)", "·$1·")

  private def syms(seq: Column): Column = split(trim(seq, "·"), "··")

  val defs: Seq[QueryDef] = Seq(

    // Distributed BPE merge induction, 3 unrolled rounds: count adjacent
    // symbol pairs over the word-frequency table (weighted by word
    // count), take the argmax pair (count desc, pair asc — the published
    // BPE tie rule made total), splice it into every word, recount.
    // Emits per round: the chosen pair, its corpus count at selection
    // time, and the corpus symbol total AFTER the merge (monotonically
    // shrinking — each round's drop ≈ non-overlapping occurrence count).
    // 100 TB story: the corpus is touched exactly once (word counting =
    // one partial-aggregable exchange on the word); all three rounds run
    // on the distinct-word frame (localCheckpointed per round so the
    // plan stays constant-size, the CC/k-core loop discipline), and the
    // argmax pair is a 1-row broadcast. Pair explosion per word is
    // bounded by word length, and the pair table is sub-vocab-sized.
    QueryDef(
      "q217_bpe_merges",
      (s, dir) => {
        val words = Tables.documents(s, dir)
          .select(explode(tokens(col("text"))).as("w"))
          .where(length(col("w")) > 0)
        var wf = words.groupBy(col("w")).agg(count(lit(1)).as("freq"))
          .select(charWrap(col("w")).as("seq"), col("freq"))
          .cutLineage()

        def pairCounts(frame: DataFrame): DataFrame = {
          val ss = syms(col("seq"))
          val idx = when(size(ss) >= 2, sequence(lit(0), size(ss) - 2))
            .otherwise(array().cast("array<int>"))
          frame.select(col("freq"),
              explode(transform(idx, i =>
                concat_ws("·", element_at(ss, i + 1), element_at(ss, i + 2))))
                .as("pair"))
            .groupBy(col("pair")).agg(sum(col("freq")).as("cnt"))
        }

        val rounds = (1 to 3).map { r =>
          val top1 = pairCounts(wf)
            .orderBy(col("cnt").desc, col("pair").asc).limit(1)
            .select(col("pair"),
              concat(lit("·"), regexp_replace(col("pair"), "·", "··"), lit("·"))
                .as("pat"),
              concat(lit("·"), regexp_replace(col("pair"), "·", ""), lit("·"))
                .as("rep"),
              col("cnt"))
          wf = wf.crossJoin(broadcast(top1))
            .select(expr("replace(seq, pat, rep)").as("seq"), col("freq"),
              col("pair"), col("cnt"))
            .cutLineage()
          val out = wf
            .groupBy(col("pair"), col("cnt"))
            .agg(sum(col("freq") * size(syms(col("seq")))).as("corpus_symbols"))
            .select(lit(r.toLong).as("merge_round"),
              regexp_replace(col("pair"), "·", "+").as("pair"),
              col("cnt").as("pair_count"), col("corpus_symbols"))
          wf = wf.select(col("seq"), col("freq")).cutLineage()
          out
        }
        rounds.reduce(_.unionByName(_)).orderBy(col("merge_round"))
      },
      Some("""
        WITH words AS (
          SELECT unnest(string_split(text, ' ')) AS w FROM documents),
        w0 AS (
          SELECT regexp_replace(w, '(.)', '·\1·', 'g') AS seq,
                 COUNT(*) AS freq
          FROM words WHERE len(w) > 0 GROUP BY 1),
        s1 AS (SELECT freq, string_split(trim(seq, '·'), '··') AS ss FROM w0),
        e1 AS (SELECT freq, ss, unnest(range(0, len(ss) - 1)) AS i FROM s1),
        p1 AS (SELECT ss[i+1] || '·' || ss[i+2] AS pair, SUM(freq) AS cnt
               FROM e1 GROUP BY 1),
        t1 AS (SELECT pair, cnt FROM p1 ORDER BY cnt DESC, pair LIMIT 1),
        w1 AS (SELECT replace(w0.seq,
                              '·' || replace(t1.pair, '·', '··') || '·',
                              '·' || replace(t1.pair, '·', '') || '·') AS seq,
                      freq, t1.pair, t1.cnt
               FROM w0 CROSS JOIN t1),
        o1 AS (SELECT 1 AS merge_round, pair, cnt,
                      SUM(freq * len(string_split(trim(seq, '·'), '··'))) AS cs
               FROM w1 GROUP BY 1, 2, 3),
        s2 AS (SELECT freq, string_split(trim(seq, '·'), '··') AS ss FROM w1),
        e2 AS (SELECT freq, ss, unnest(range(0, len(ss) - 1)) AS i FROM s2),
        p2 AS (SELECT ss[i+1] || '·' || ss[i+2] AS pair, SUM(freq) AS cnt
               FROM e2 GROUP BY 1),
        t2 AS (SELECT pair, cnt FROM p2 ORDER BY cnt DESC, pair LIMIT 1),
        w2 AS (SELECT replace(w1.seq,
                              '·' || replace(t2.pair, '·', '··') || '·',
                              '·' || replace(t2.pair, '·', '') || '·') AS seq,
                      freq, t2.pair, t2.cnt
               FROM w1 CROSS JOIN t2),
        o2 AS (SELECT 2 AS merge_round, pair, cnt,
                      SUM(freq * len(string_split(trim(seq, '·'), '··'))) AS cs
               FROM w2 GROUP BY 1, 2, 3),
        s3 AS (SELECT freq, string_split(trim(seq, '·'), '··') AS ss FROM w2),
        e3 AS (SELECT freq, ss, unnest(range(0, len(ss) - 1)) AS i FROM s3),
        p3 AS (SELECT ss[i+1] || '·' || ss[i+2] AS pair, SUM(freq) AS cnt
               FROM e3 GROUP BY 1),
        t3 AS (SELECT pair, cnt FROM p3 ORDER BY cnt DESC, pair LIMIT 1),
        w3 AS (SELECT replace(w2.seq,
                              '·' || replace(t3.pair, '·', '··') || '·',
                              '·' || replace(t3.pair, '·', '') || '·') AS seq,
                      freq, t3.pair, t3.cnt
               FROM w2 CROSS JOIN t3),
        o3 AS (SELECT 3 AS merge_round, pair, cnt,
                      SUM(freq * len(string_split(trim(seq, '·'), '··'))) AS cs
               FROM w3 GROUP BY 1, 2, 3)
        SELECT CAST(merge_round AS BIGINT) AS merge_round,
               replace(pair, '·', '+') AS pair,
               CAST(cnt AS BIGINT) AS pair_count,
               CAST(cs AS BIGINT) AS corpus_symbols
        FROM (SELECT * FROM o1 UNION ALL SELECT * FROM o2
              UNION ALL SELECT * FROM o3)
        ORDER BY merge_round""")))
}
