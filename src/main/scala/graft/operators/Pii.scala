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

  /** (class name, pattern) in REDACTION ORDER. `iban` before `cc`
    * before `digit_run`: an IBAN's 20-digit tail shape-matches the
    * 16-digit cc pattern and both shape-match the digit-run, so the
    * longer, more specific class must consume its text first. The
    * `phone` pattern is SHAPE-ONLY (`+N-NNN-NNN…` — no country-specific
    * grouping, no checksum exists for phone numbers); `cc` and `iban`
    * are shapes here and CHECKSUM-VALIDATED by [[luhnValid]] /
    * [[ibanValid]] in the detection path (redaction stays
    * shape-conservative: over-redacting a Luhn-failing 16-digit run is
    * safe, missing a valid card is not). */
  val patterns: Seq[(String, String)] = Seq(
    "email" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "phone" -> "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{3,6}",
    "ipv4" -> "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}",
    "iban" -> "DE[0-9]{20}",
    "cc" -> "[0-9]{16}",
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

  // ── checksum-validated classes ─────────────────────────────────────
  // The cc/iban patterns above are SHAPES; these validators separate a
  // real card/account number from a random digit run — the difference
  // between "the scrub removed 16-digit noise" and "the corpus leaked
  // payment data", which is the number a curation owner reports. Both
  // are pure column arithmetic over fixed-width substrings (no UDF, no
  // float), so a SQL oracle recomputes them exactly.

  /** Luhn checksum over a 16-digit string column: from the RIGHT, every
    * second digit doubles (9-wrapped); valid iff the sum is ≡ 0 mod 10.
    * For 16 digits the doubled set is the odd left-positions 1,3,…,15. */
  def luhnValid(x: Column): Column = {
    val terms = (1 to 16).map { i =>
      val d = substring(x, i, 1).cast("int")
      if (i % 2 == 1) when(d * 2 > 9, d * 2 - 9).otherwise(d * 2) else d
    }
    terms.reduce(_ + _) % 10 === 0
  }

  /** IBAN mod-97 (ISO 7064) for the fixed DE layout (DE + 2 check
    * digits + 18-digit BBAN): rearrange to BBAN ∥ "1314" (D=13, E=14)
    * ∥ check digits — a 24-digit number — and fold it through mod 97 in
    * 9/9/6-digit chunks of exact BIGINT arithmetic; valid iff 1. */
  def ibanValid(x: Column): Column = {
    val num = concat(substring(x, 5, 18), lit("1314"), substring(x, 3, 2))
    val r1 = substring(num, 1, 9).cast("long") % 97
    val r2 = (r1 * 1000000000L + substring(num, 10, 9).cast("long")) % 97
    val r3 = (r2 * 1000000L + substring(num, 19, 6).cast("long")) % 97
    r3 === 1
  }

  /** Count of CHECKSUM-VALID matches of a validated class in `text`
    * (`cls` ∈ {"cc", "iban"}): extract the shape candidates, keep the
    * ones whose checksum passes. Array HOF over a per-row candidate
    * list — still map-only. */
  def validMatchCount(text: Column, cls: String): Column = {
    val pat = patterns.toMap.apply(cls)
    val valid: Column => Column =
      if (cls == "cc") luhnValid else if (cls == "iban") ibanValid
      else throw new IllegalArgumentException(
        s"class '$cls' has no checksum validator (cc/iban only)")
    size(filter(regexp_extract_all(text, lit(pat), lit(0)), valid))
  }
}
