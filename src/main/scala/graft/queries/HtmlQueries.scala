package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.Html
import graft.sources.Tables

/** HTML text-extraction gate — the missing first stage of the crawl
  * front door (ahead of q400's URL canonicalization): tag/script/style
  * stripping, entity decode, link-density boilerplate cut.
  *
  * The synthetic corpus is plain text, so both engines wrap each
  * document in the SAME deterministic page chrome from doc_id
  * arithmetic (title/style head; a script with `<` and `&&` inside on
  * %3; a comment; a 100%-link nav div; an h1; the document text with
  * encoded entities; a tag-list ul on %4; a low-link-density "read
  * more" paragraph on %5 that must SURVIVE the cut; a 100%-link
  * footer) — the construct-identically-on-both-sides discipline of the
  * PII gates. The oracle rebuilds the full extraction pipeline in
  * RE2 + list lambdas and the per-source clean-text checksum pins the
  * output byte-for-byte.
  */
object HtmlQueries {

  // deterministic page chrome — Spark side
  private def withHtml(docs: org.apache.spark.sql.DataFrame) =
    docs.select(col("doc_id"), col("source"), concat(
      lit("<html><head><title>Doc "), col("doc_id").cast("string"),
      lit("</title>"),
      lit("<style type=\"text/css\">body { margin: 0; } .nav a { color: #00f; }</style>"),
      when(pmod(col("doc_id"), lit(3)) === 0,
        concat(lit("<script>var x = 1 < 2 && doc_id > 0; alert(\""),
          col("doc_id").cast("string"), lit("\");</script>")))
        .otherwise(lit("")),
      lit("</head><body><!-- build "), col("doc_id").cast("string"),
      lit(" -->"),
      lit("<div class=\"nav\"><a href=\"/\">Home</a> <a href=\"/about\">About</a> <a href=\"/c/"),
      col("doc_id").cast("string"), lit("\">More</a></div>"),
      lit("<h1>Title "), col("doc_id").cast("string"), lit("</h1>"),
      lit("<p>"), col("text"), lit(" &amp; entities &lt;kept&gt;.</p>"),
      when(pmod(col("doc_id"), lit(4)) === 0,
        lit("<ul><li><a href=\"/t/1\">tag one</a></li><li><a href=\"/t/2\">tag two</a></li></ul>"))
        .otherwise(lit("")),
      when(pmod(col("doc_id"), lit(5)) === 0,
        concat(lit("<p>Read more: <a href=\"/n\">next "),
          col("doc_id").cast("string"), lit("</a> or go back.</p>")))
        .otherwise(lit("")),
      lit("<div class=\"footer\"><a href=\"/p\">Privacy</a> | <a href=\"/t\">Terms</a></div>"),
      lit("</body></html>")).as("html"))

  val defs: Seq[QueryDef] = Seq(

    // Extraction accounting per source: docs, markup+boilerplate chars
    // removed, boilerplate blocks cut, and the clean-text md5 checksum
    // (the byte-for-byte pin). Map-only until the tiny per-source
    // rollup — at 100 TB the extraction costs one scan, no shuffle.
    QueryDef(
      "q403_html_extract",
      (s, dir) => {
        val ex = Html.extractText(withHtml(Tables.documents(s, dir)), "html")
        ex.groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("removed_chars")).as("removed_chars"),
            sum(col("boilerplate_blocks")).as("boilerplate_blocks"),
            sum(graft.functions.Kernels.md5Lower64Lo32(col("clean_text")))
              .as("clean_checksum"))
          .orderBy(col("source"))
      },
      Some("""
        WITH h AS (
          SELECT doc_id, source,
            '<html><head><title>Doc ' || doc_id || '</title>'
            || '<style type="text/css">body { margin: 0; } .nav a { color: #00f; }</style>'
            || CASE WHEN doc_id % 3 = 0 THEN '<script>var x = 1 < 2 && doc_id > 0; alert("' || doc_id || '");</script>' ELSE '' END
            || '</head><body><!-- build ' || doc_id || ' -->'
            || '<div class="nav"><a href="/">Home</a> <a href="/about">About</a> <a href="/c/' || doc_id || '">More</a></div>'
            || '<h1>Title ' || doc_id || '</h1>'
            || '<p>' || text || ' &amp; entities &lt;kept&gt;.</p>'
            || CASE WHEN doc_id % 4 = 0 THEN '<ul><li><a href="/t/1">tag one</a></li><li><a href="/t/2">tag two</a></li></ul>' ELSE '' END
            || CASE WHEN doc_id % 5 = 0 THEN '<p>Read more: <a href="/n">next ' || doc_id || '</a> or go back.</p>' ELSE '' END
            || '<div class="footer"><a href="/p">Privacy</a> | <a href="/t">Terms</a></div>'
            || '</body></html>' AS html
          FROM documents),
        s1 AS (SELECT doc_id, source, html,
                 regexp_replace(
                   regexp_replace(
                     regexp_replace(
                       regexp_replace(html, '(?s)<!--.*?-->', ' ', 'g'),
                       '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
                     '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
                   '(?is)<title[^>]*>.*?</title>', ' ', 'g') AS h1
               FROM h),
        s2 AS (SELECT doc_id, source, html,
                 string_split(
                   regexp_replace(h1, '(?i)</(p|div|li|ul|ol|h[1-6]|tr|table|section|article|blockquote)>|<br[^>]*>', chr(10), 'g'),
                   chr(10)) AS blocks
               FROM s1),
        s3 AS (SELECT doc_id, source, html,
                 list_transform(blocks, b -> {
                   't': trim(regexp_replace(
                          replace(replace(replace(replace(replace(replace(
                            regexp_replace(b, '<[^>]*>', ' ', 'g'),
                            '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'),
                            '&quot;', '"'), '&#39;', chr(39)), '&amp;', '&'),
                          ' +', ' ', 'g')),
                   'ac': COALESCE(list_sum(list_transform(
                           regexp_extract_all(b, '(?is)<a[^>]*>(.*?)</a>', 1),
                           x -> length(x))), 0) }) AS bs
               FROM s2),
        s4 AS (SELECT doc_id, source, html,
                 array_to_string(list_transform(
                   list_filter(bs, s -> length(s['t']) > 0 AND s['ac'] * 100 < 40 * length(s['t'])),
                   s -> s['t']), ' ') AS clean_text,
                 len(list_filter(bs, s -> length(s['t']) > 0 AND s['ac'] * 100 >= 40 * length(s['t']))) AS boilerplate_blocks
               FROM s3)
        SELECT source, COUNT(*) AS n_docs,
               CAST(SUM(length(html) - length(clean_text)) AS BIGINT) AS removed_chars,
               CAST(SUM(boilerplate_blocks) AS BIGINT) AS boilerplate_blocks,
               CAST(SUM(CAST(md5_number_lower(clean_text) % 4294967296 AS BIGINT)) AS BIGINT) AS clean_checksum
        FROM s4 GROUP BY source
        ORDER BY source""")))
}
