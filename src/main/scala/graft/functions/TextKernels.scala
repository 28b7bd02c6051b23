package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Text-analysis kernels for the LLM-training-data pipeline surface:
  * tokenization, shingling, quality stats, language-ID heuristics and
  * document fingerprints. All pure `Column => Column` (codegen-friendly,
  * no UDFs); every kernel has a DuckDB-expressible twin so the driver's
  * oracle can hash-compare results.
  *
  * Scale stance: every kernel is per-row (embarrassingly parallel, no
  * shuffle); the only shuffles in the downstream dedup/similarity
  * operators are the banded-bucket joins, never all-pairs.
  */
object TextKernels {

  /** Whitespace tokenization (documents.text is single-space separated). */
  def tokens(text: Column): Column = split(text, " ")

  /** k-word shingles as distinct set — the unit for MinHash / Jaccard.
    * Matches DuckDB list_transform(range(1, len-k+2), i -> ws[i]||' '||…). */
  def shingles(toks: Column, k: Int): Column = {
    val joined = transform(
      sequence(lit(0), size(toks) - k),
      i => concat_ws(" ", (0 until k).map(o => element_at(toks, i + o + 1)): _*))
    array_distinct(joined)
  }

  /** Token count as BIGINT (matches DuckDB len(string_split(..))). */
  def tokenCount(toks: Column): Column = size(toks).cast(LongType)

  /** Distinct-token ratio — a repetition / quality signal. */
  def distinctRatio(toks: Column): Column =
    size(array_distinct(toks)).cast("double") / size(toks)

  /** Count of tokens that appear in `words`. */
  def markerCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => words.map(w => t === w).reduce(_ || _))).cast(LongType)

  /** Stopword ratio over an explicit marker list. */
  def stopwordRatio(toks: Column, stops: Seq[String]): Column =
    markerCount(toks, stops).cast("double") / size(toks)

  /** Mean token length in characters (exact integer ratio → double). */
  def avgTokenLen(text: Column, toks: Column): Column =
    (length(text) - (size(toks) - 1)).cast("double") / size(toks)

  /** Composite quality score in [0,1]: penalizes very short docs and heavy
    * repetition, rewards healthy stopword presence. Same arithmetic shape
    * as the oracle SQL so IEEE doubles agree bit-for-bit. */
  def qualityScore(nTokens: Column, distinctRat: Column, stopRat: Column): Column = {
    val lengthOk = when(nTokens >= 20, lit(1.0d)).otherwise(nTokens.cast("double") / 20.0d)
    val stopOk   = when(stopRat.between(0.01d, 0.5d), lit(1.0d)).otherwise(lit(0.5d))
    lengthOk * distinctRat * stopOk
  }

  /** Exact-content fingerprint: DuckDB-parity md5 u64 of the raw text,
    * emitted as digit string (avoids decimal-vs-ubigint repr drift). */
  def contentFingerprint(text: Column): Column =
    Kernels.md5BitsU64(Kernels.md5Bits(text)).cast("string")

  /** Rabin-Karp polynomial rolling hash of the whole text:
    * h = Σ ascii(cᵢ)·B^(n-i) mod M, folded left-to-right as
    * h = (h·B + c) mod M with B=131, M=2³¹−1. h·B ≤ ~2³⁸ so the fold is
    * exact in int64 on both engines (DuckDB twin:
    * list_reduce over ascii codes). The per-window variant (subtract the
    * outgoing term) shares the same arithmetic; content-defined chunking
    * at 100 TB builds on exactly this fold. */
  val RollB = 131L
  val RollM = 2147483647L
  def rollingHash(text: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      RollingHash64(
        org.apache.spark.sql.GraftSqlBridge.expression(text), RollB, RollM))

  // ---- PII-style redaction (q57) ----------------------------------------
  // Patterns restricted to the Java-regex ∩ RE2 common subset so Spark and
  // DuckDB agree byte-for-byte. Redaction order is FIXED (email → URL →
  // phone): earlier replacement tokens ([EMAIL] etc.) contain no chars the
  // later patterns match, which also makes the full scrub idempotent
  // (redactPii(redactPii(x)) == redactPii(x), property-tested).
  val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val UrlRe   = "https?://[^ ]+"
  val PhoneRe = "\\+?[0-9][0-9-]{7,}"

  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "[EMAIL]"),
        UrlRe, "[URL]"),
      PhoneRe, "[PHONE]")
}
