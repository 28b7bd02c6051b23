package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML/markup text extraction — the FIRST stage of a crawl-corpus
  * pipeline, ahead of URL canonicalization ([[Urls]]), PII scrub
  * ([[Pii]]) and quality scoring ([[Scoring]]): strip the markup that
  * is not content (script/style/comment/title payloads and all tags),
  * decode the common entities, and cut boilerplate blocks by LINK
  * DENSITY (the classic readability heuristic: a block whose characters
  * are mostly anchor text is navigation/footer chrome, not content).
  *
  * Engine-parity contract (the q397 PII discipline): every pattern is
  * valid and IDENTICAL in Java regex (Spark) and RE2 (DuckDB) —
  * character classes, alternation, bounded repeats, `(?is)` inline
  * flags and lazy `.*?` only; no backrefs, no lookaround, no
  * capture-group REPLACEMENTS (the engines disagree on `$1` vs `\1`;
  * capture groups are used only for extraction, which both spell
  * identically). The block pipeline is higher-order array functions
  * (transform/filter/aggregate ↔ list_transform/list_filter/list_sum),
  * so a SQL oracle reproduces the extraction byte-for-byte.
  *
  * Fixed pipeline order (both engines):
  *   1. remove comments, then script, style and title ELEMENTS
  *      (payload included);
  *   2. rewrite block-closing tags (`</p> </div> </li> …` and `<br>`)
  *      to newlines and split into blocks;
  *   3. per block: anchor_chars = total length of `<a>…</a>` inner
  *      texts (raw); clean text = strip remaining tags → decode
  *      entities (`&nbsp; &lt; &gt; &quot; &#39;` first, `&amp;` LAST,
  *      so double-encoded text decodes exactly one level) → squeeze
  *      spaces → trim;
  *   4. drop empty blocks; drop blocks whose link density
  *      `anchor_chars / text_chars` ≥ `densityPct`% (integer cross-
  *      multiplication — no float); join survivors with one space.
  *
  * Scale shape: pure per-row projections — regex passes and array HOFs
  * are map-side, no shuffle, no UDF; a 100 TB extraction costs the scan
  * itself, exactly like the PII scrub it feeds.
  */
object Html {

  /** Elements whose PAYLOAD is never content (removed with their tags). */
  private val HiddenElems = Seq("script", "style", "title")

  /** Block-closing tags rewritten to newlines before the block split. */
  val BlockBreakPattern: String =
    "(?i)</(p|div|li|ul|ol|h[1-6]|tr|table|section|article|blockquote)>|<br[^>]*>"

  /** Anchor inner-text extraction pattern (capture group 1). */
  val AnchorPattern: String = "(?is)<a[^>]*>(.*?)</a>"

  /** Comments + hidden elements removed, payload included. */
  def stripHidden(html: Column): Column =
    HiddenElems.foldLeft(
      regexp_replace(html, "(?s)<!--.*?-->", " ")) { (c, el) =>
      regexp_replace(c, s"(?is)<$el[^>]*>.*?</$el>", " ")
    }

  /** One block's clean text: strip remaining tags, decode entities
    * (&amp; last), squeeze runs of spaces, trim. */
  def cleanBlock(b: Column): Column = {
    val noTags = regexp_replace(b, "<[^>]*>", " ")
    val decoded = Seq(
      "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (from, to)) => replace(c, lit(from), lit(to)) }
    trim(regexp_replace(decoded, " +", " "))
  }

  /** Total characters of anchor inner text in a raw block — the link-
    * density numerator. */
  def anchorChars(b: Column): Column =
    aggregate(regexp_extract_all(b, lit(AnchorPattern), lit(1)),
      lit(0), (acc, x) => acc + length(x))

  /** Adds `clean_text` (extracted content), `boilerplate_blocks`
    * (non-empty blocks cut by the link-density rule) and
    * `removed_chars` (markup + boilerplate characters removed). The
    * input column is preserved. */
  def extractText(df: DataFrame, htmlCol: String,
      densityPct: Int = 40): DataFrame = {
    val blocks = split(
      regexp_replace(stripHidden(col(htmlCol)), BlockBreakPattern, "\n"),
      "\n")
    // each block scored once: (clean text, anchor chars)
    val bs = transform(blocks,
      b => struct(cleanBlock(b).as("t"), anchorChars(b).as("ac")))
    def nonEmpty(s: Column) = length(s.getField("t")) > 0
    def boiler(s: Column) =
      s.getField("ac") * 100 >= lit(densityPct) * length(s.getField("t"))
    df
      .withColumn("__bs", bs)
      .withColumn("clean_text",
        array_join(transform(
          filter(col("__bs"), s => nonEmpty(s) && !boiler(s)),
          s => s.getField("t")), " "))
      .withColumn("boilerplate_blocks",
        size(filter(col("__bs"), s => nonEmpty(s) && boiler(s))).cast("long"))
      .withColumn("removed_chars",
        (length(col(htmlCol)) - length(col("clean_text"))).cast("long"))
      .drop("__bs")
  }
}
