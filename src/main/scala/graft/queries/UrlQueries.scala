package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.Urls
import graft.sources.Tables

/** URL canonicalization + domain-cap gates — the crawl-corpus front
  * door. The synthetic corpus has no URL column, so both engines build
  * the same messy URLs from doc_id arithmetic (mixed case, https://www,
  * default port :443, colliding paths via doc_id % 997, utm query
  * strings on %3, fragments on %5, trailing slashes on %4) and the
  * gates pin that canonicalization and the md5-rank domain cap agree
  * byte-for-byte.
  */
object UrlQueries {

  // deterministic messy URLs — Spark side
  private def withUrls(docs: org.apache.spark.sql.DataFrame) =
    docs.select(col("doc_id"), concat(
      lit("HTTPS://WWW.Site"), pmod(col("doc_id"), lit(40)).cast("string"),
      lit(".COM:443/P/"), pmod(col("doc_id"), lit(997)).cast("string"),
      when(pmod(col("doc_id"), lit(3)) === 0,
        concat(lit("?utm_source=feed&ref="), col("doc_id").cast("string")))
        .otherwise(lit("")),
      when(pmod(col("doc_id"), lit(5)) === 0, lit("#frag")).otherwise(lit("")),
      when(pmod(col("doc_id"), lit(4)) === 0, lit("/")).otherwise(lit("")))
      .as("url"))

  // identical URLs + canonicalization chain — DuckDB side
  private val canonSql = """
        u AS (
          SELECT doc_id,
                 'HTTPS://WWW.Site' || (doc_id % 40) || '.COM:443/P/' || (doc_id % 997)
                 || CASE WHEN doc_id % 3 = 0 THEN '?utm_source=feed&ref=' || doc_id ELSE '' END
                 || CASE WHEN doc_id % 5 = 0 THEN '#frag' ELSE '' END
                 || CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END AS url
          FROM documents),
        c1 AS (SELECT doc_id, url,
                      regexp_replace(lower(url), '^[a-z][a-z0-9+.-]*://', '') AS u1 FROM u),
        c2 AS (SELECT *, regexp_replace(u1, '#.*$', '') AS u2 FROM c1),
        c3 AS (SELECT *, regexp_replace(u2, '\?.*$', '') AS u3 FROM c2),
        c4 AS (SELECT *, regexp_replace(u3, '^www\.', '') AS u4 FROM c3),
        c5 AS (SELECT *, regexp_extract(u4, '^[^/]+') AS host0 FROM c4),
        canon AS (
          SELECT doc_id, url,
                 regexp_replace(host0, ':(80|443)$', '') AS url_host,
                 regexp_replace(host0, ':(80|443)$', '')
                   || regexp_replace(substring(u4, length(host0) + 1), '/+$', '')
                   AS url_canonical
          FROM c5)"""

  val defs: Seq[QueryDef] = Seq(

    // Canonicalization + canonical-key dedup accounting per host: how
    // many raw docs, how many distinct canonical urls survive, and how
    // many characters the scrub removed — the oracle rebuilds the exact
    // regex chain in RE2 (no capture-group replacements anywhere, the
    // dialect-shared subset).
    QueryDef(
      "q400_url_canonicalize",
      (s, dir) => {
        val c = Urls.withCanonical(withUrls(Tables.documents(s, dir)), "url")
        c.groupBy(col("url_host"))
          .agg(count(lit(1)).as("n_docs"),
            countDistinct(col("url_canonical")).as("n_canonical"),
            sum((length(col("url")) - length(col("url_canonical")))
              .cast("long")).as("chars_stripped"))
          .orderBy(col("url_host"))
      },
      Some(s"""
        WITH $canonSql
        SELECT url_host, COUNT(*) AS n_docs,
               CAST(COUNT(DISTINCT url_canonical) AS BIGINT) AS n_canonical,
               CAST(SUM(length(url) - length(url_canonical)) AS BIGINT) AS chars_stripped
        FROM canon GROUP BY url_host
        ORDER BY url_host""")),

    // Domain cap: at most 5 docs per host, chosen by md5-rank (stable
    // uniform sample, not data order). The kept-id checksum pins that
    // both engines keep the SAME documents, not merely the same count.
    QueryDef(
      "q401_domain_cap",
      (s, dir) => {
        val c = Urls.withCanonical(withUrls(Tables.documents(s, dir)), "url")
        Urls.capPerHost(c, "doc_id", cap = 5)
          .groupBy(col("url_host"))
          .agg(count(lit(1)).as("n_kept"),
            sum(col("doc_id")).as("kept_id_checksum"))
          .orderBy(col("url_host"))
      },
      Some(s"""
        WITH $canonSql,
        ranked AS (
          SELECT doc_id, url_host,
                 row_number() OVER (PARTITION BY url_host ORDER BY
                   CAST(md5_number_lower('cap:' || doc_id) % 4294967296 AS BIGINT),
                   doc_id) AS rn
          FROM canon)
        SELECT url_host, COUNT(*) AS n_kept,
               CAST(SUM(doc_id) AS BIGINT) AS kept_id_checksum
        FROM ranked WHERE rn <= 5
        GROUP BY url_host
        ORDER BY url_host""")),

    // Host-suffix blocklist with LONGEST-match precedence — the trio's
    // third stage. Multi-label hosts (sub{0..2}.site{0..19}.example.com)
    // against a rule set where an allow rule on one subdomain OVERRIDES
    // its parent's block (sub1.site5 allowed inside blocked site5) —
    // provable only if the longest suffix wins. Per-(suffix, action)
    // drop accounting with an id checksum pins that both engines route
    // every document to the same rule.
    QueryDef(
      "q407_host_blocklist",
      (s, dir) => {
        val hosts = Tables.documents(s, dir).select(col("doc_id"),
          concat(lit("sub"), pmod(col("doc_id"), lit(3)).cast("string"),
            lit(".site"), pmod(col("doc_id"), lit(20)).cast("string"),
            lit(".example.com")).as("url_host"))
        import s.implicits._
        val rules = Seq(
          ("site5.example.com", "block"),
          ("sub1.site5.example.com", "allow"),
          ("site17.example.com", "block"),
          ("sub2.site17.example.com", "block"))
          .toDF("suffix", "action")
        Urls.suffixPolicy(hosts, rules, "doc_id")
          .groupBy(col("policy_suffix"), col("policy_action"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("doc_id")).as("id_checksum"))
          .orderBy(col("policy_suffix"), col("policy_action"))
      },
      Some("""
        WITH u AS (
          SELECT doc_id,
                 'sub' || (doc_id % 3) || '.site' || (doc_id % 20)
                 || '.example.com' AS url_host
          FROM documents),
        rules(suffix, action) AS (VALUES
          ('site5.example.com', 'block'),
          ('sub1.site5.example.com', 'allow'),
          ('site17.example.com', 'block'),
          ('sub2.site17.example.com', 'block')),
        ex AS (
          SELECT doc_id, url_host,
                 unnest(list_transform(
                   range(0, len(string_split(url_host, '.'))),
                   i -> array_to_string(string_split(url_host, '.')[i+1:], '.')))
                   AS suffix
          FROM u),
        m AS (
          SELECT doc_id, suffix, action,
                 row_number() OVER (PARTITION BY doc_id
                   ORDER BY length(suffix) DESC, suffix DESC, action DESC) AS rn
          FROM ex JOIN rules USING (suffix)),
        v AS (SELECT doc_id, suffix AS policy_suffix, action AS policy_action
              FROM m WHERE rn = 1),
        j AS (SELECT u.doc_id,
                     COALESCE(v.policy_suffix, 'none') AS policy_suffix,
                     COALESCE(v.policy_action, 'allow') AS policy_action
              FROM u LEFT JOIN v USING (doc_id))
        SELECT policy_suffix, policy_action, COUNT(*) AS n_docs,
               CAST(SUM(doc_id) AS BIGINT) AS id_checksum
        FROM j GROUP BY policy_suffix, policy_action
        ORDER BY policy_suffix, policy_action""")))
}
