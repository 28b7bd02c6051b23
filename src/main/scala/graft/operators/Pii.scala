package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII scan + redaction over document text — the pre-training curation
  * stage every public pipeline runs before release (cf. the C4/Dolma
  * regex scrubbers): find emails / phone shapes / IPv4s / long digit
  * runs, count them per document, and rewrite them to typed placeholder
  * tokens.
  *
  * Engine-parity contract: every pattern is valid and IDENTICAL in Java
  * regex (Spark) and RE2 (DuckDB) — character classes, bounded repeats
  * and `\.` only; no backrefs, no lookaround, no `\b` subtleties across
  * engines. Replacement order is fixed (email → phone → ipv4 → digit
  * run) so overlapping classes resolve identically everywhere.
  *
  * Scale shape: pure per-row projections (regexp_extract_all /
  * regexp_replace are codegen'd) — no shuffle, no UDF; a 100 TB scrub
  * is a map-only pass whose cost is the scan itself.
  */
object Pii {

  /** (class name, pattern) in REDACTION ORDER. Digit-run last so it
    * cannot eat phone/ipv4 digits first. */
  val patterns: Seq[(String, String)] = Seq(
    "email" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "phone" -> "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{3,6}",
    "ipv4" -> "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}",
    "digit_run" -> "[0-9]{13,18}")

  def placeholder(cls: String): String = s"<${cls.toUpperCase}>"

  /** Matches of one class in `text` (count column). */
  def matchCount(text: Column, cls: String): Column = {
    val pat = patterns.toMap.apply(cls)
    size(regexp_extract_all(text, lit(pat), lit(0)))
  }

  /** Per-document scan: the input plus one `<cls>_n` count column per
    * class and a `pii_total`. */
  def scan(docs: DataFrame, textCol: String): DataFrame = {
    val withCounts = patterns.foldLeft(docs) { case (df, (cls, _)) =>
      df.withColumn(s"${cls}_n", matchCount(col(textCol), cls))
    }
    withCounts.withColumn("pii_total",
      patterns.map { case (cls, _) => col(s"${cls}_n") }.reduce(_ + _))
  }

  /** Redacted text: each class replaced by its placeholder token, in
    * the fixed class order. */
  def redactText(text: Column): Column =
    patterns.foldLeft(text) { case (c, (cls, pat)) =>
      regexp_replace(c, pat, placeholder(cls))
    }

  /** Redaction pass: text rewritten in place, original preserved as
    * `<textCol>_raw`. */
  def redact(docs: DataFrame, textCol: String): DataFrame =
    docs
      .withColumn(s"${textCol}_raw", col(textCol))
      .withColumn(textCol, redactText(col(textCol)))
}
