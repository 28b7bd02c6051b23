package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.Pii
import graft.sources.Tables

/** PII scan + redaction gates — the pre-release scrub stage of a
  * training-data pipeline (C4/Dolma-style regex scrubbers).
  *
  * The synthetic corpus contains no organic PII, so both engines INJECT
  * the same deterministic PII shapes from doc_id arithmetic (emails on
  * doc_id%7, phones on %11, IPv4s on %13, 14-digit account runs on %17)
  * — the same construct-identically-on-both-sides discipline the
  * check-battery gates use for messy columns. Patterns are written in
  * the Java-regex ∩ RE2 dialect (classes + bounded repeats only) so
  * Spark and DuckDB match identically; DuckDB's regexp_replace gets the
  * 'g' flag to match Spark's replace-all default.
  */
object PiiQueries {

  private val emailPat = Pii.patterns.toMap.apply("email")
  private val phonePat = Pii.patterns.toMap.apply("phone")
  private val ipv4Pat = Pii.patterns.toMap.apply("ipv4")
  private val digitPat = Pii.patterns.toMap.apply("digit_run")

  // deterministic PII injection — Spark side
  private def augmented(docs: org.apache.spark.sql.DataFrame) =
    docs.select(col("doc_id"), concat(
      col("text"),
      when(pmod(col("doc_id"), lit(7)) === 0,
        concat(lit(" reach me at user"), col("doc_id").cast("string"),
          lit("@mail-example.com today"))).otherwise(lit("")),
      when(pmod(col("doc_id"), lit(11)) === 0,
        concat(lit(" call +1-555-"),
          (pmod(col("doc_id"), lit(9000)) + 1000).cast("string")))
        .otherwise(lit("")),
      when(pmod(col("doc_id"), lit(13)) === 0,
        concat(lit(" from host 10.0."),
          pmod(col("doc_id"), lit(256)).cast("string"), lit("."),
          pmod(col("doc_id") * 7, lit(256)).cast("string")))
        .otherwise(lit("")),
      when(pmod(col("doc_id"), lit(17)) === 0,
        concat(lit(" acct 4"),
          (col("doc_id") + lit(9000000000000L)).cast("string")))
        .otherwise(lit(""))).as("text"))

  // identical injection — DuckDB side
  private val augSql = """
        aug AS (
          SELECT doc_id, text
            || CASE WHEN doc_id % 7 = 0
                    THEN ' reach me at user' || doc_id || '@mail-example.com today'
                    ELSE '' END
            || CASE WHEN doc_id % 11 = 0
                    THEN ' call +1-555-' || (doc_id % 9000 + 1000)
                    ELSE '' END
            || CASE WHEN doc_id % 13 = 0
                    THEN ' from host 10.0.' || (doc_id % 256) || '.' || ((doc_id * 7) % 256)
                    ELSE '' END
            || CASE WHEN doc_id % 17 = 0
                    THEN ' acct 4' || (doc_id + 9000000000000)
                    ELSE '' END AS text
          FROM documents)"""

  val defs: Seq[QueryDef] = Seq(

    // PII SCAN: per-class documents-hit + match counts over the
    // augmented corpus. Map-only (regexp_extract_all projections, no
    // shuffle until the 4-row rollup) — at 100 TB this is a scan-cost
    // pass. The oracle recomputes every pattern with RE2.
    QueryDef(
      "q397_pii_scan",
      (s, dir) => {
        val sc = Pii.scan(augmented(Tables.documents(s, dir)), "text")
        Pii.patterns.map { case (cls, _) =>
          sc.agg(
            sum(when(col(s"${cls}_n") > 0, 1L).otherwise(0L)).as("docs_hit"),
            sum(col(s"${cls}_n").cast("long")).as("matches"))
            .select(lit(cls).as("pii_class"), col("docs_hit"), col("matches"))
        }.reduce(_ unionByName _).orderBy(col("pii_class"))
      },
      Some(s"""
        WITH $augSql,
        m AS (SELECT doc_id,
                     len(regexp_extract_all(text, '$emailPat')) AS email_n,
                     len(regexp_extract_all(text, '$phonePat')) AS phone_n,
                     len(regexp_extract_all(text, '$ipv4Pat')) AS ipv4_n,
                     len(regexp_extract_all(text, '$digitPat')) AS digit_run_n
              FROM aug)
        SELECT 'email' AS pii_class,
               CAST(SUM(CASE WHEN email_n > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_hit,
               CAST(SUM(email_n) AS BIGINT) AS matches FROM m
        UNION ALL
        SELECT 'phone', CAST(SUM(CASE WHEN phone_n > 0 THEN 1 ELSE 0 END) AS BIGINT),
               CAST(SUM(phone_n) AS BIGINT) FROM m
        UNION ALL
        SELECT 'ipv4', CAST(SUM(CASE WHEN ipv4_n > 0 THEN 1 ELSE 0 END) AS BIGINT),
               CAST(SUM(ipv4_n) AS BIGINT) FROM m
        UNION ALL
        SELECT 'digit_run', CAST(SUM(CASE WHEN digit_run_n > 0 THEN 1 ELSE 0 END) AS BIGINT),
               CAST(SUM(digit_run_n) AS BIGINT) FROM m
        ORDER BY pii_class""")),

    // PII REDACTION: rewrite every class to its placeholder (fixed
    // order), then PROVE the scrub — residual matches over the redacted
    // text must be zero, and both engines agree on how many documents
    // changed and by how many characters. Length arithmetic is integer.
    QueryDef(
      "q398_pii_redact",
      (s, dir) => {
        val red = Pii.redact(augmented(Tables.documents(s, dir)), "text")
        val res = Pii.scan(red.select(col("doc_id"), col("text"),
          col("text_raw")), "text")
        res.agg(
          sum(when(col("text") =!= col("text_raw"), 1L).otherwise(0L))
            .as("docs_redacted"),
          sum((length(col("text_raw")) - length(col("text"))).cast("long"))
            .as("chars_removed"),
          sum(col("pii_total").cast("long")).as("residual_matches"))
      },
      Some(s"""
        WITH $augSql,
        red AS (
          SELECT doc_id, text AS text_raw,
                 regexp_replace(
                   regexp_replace(
                     regexp_replace(
                       regexp_replace(text, '$emailPat', '<EMAIL>', 'g'),
                       '$phonePat', '<PHONE>', 'g'),
                     '$ipv4Pat', '<IPV4>', 'g'),
                   '$digitPat', '<DIGIT_RUN>', 'g') AS text
          FROM aug)
        SELECT CAST(SUM(CASE WHEN text <> text_raw THEN 1 ELSE 0 END) AS BIGINT) AS docs_redacted,
               CAST(SUM(length(text_raw) - length(text)) AS BIGINT) AS chars_removed,
               CAST(SUM(len(regexp_extract_all(text, '$emailPat'))
                      + len(regexp_extract_all(text, '$phonePat'))
                      + len(regexp_extract_all(text, '$ipv4Pat'))
                      + len(regexp_extract_all(text, '$digitPat'))) AS BIGINT) AS residual_matches
        FROM red""")))
}
