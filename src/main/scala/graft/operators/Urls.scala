package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** URL canonicalization + domain-level curation — the front door of a
  * web-crawl corpus pipeline (CC-style): dedup keys come from the
  * CANONICAL url, and per-domain caps keep one host from dominating the
  * mix.
  *
  * Canonical form (scheme-less, the dedup-key convention): lowercase;
  * scheme and leading `www.` stripped; fragment then query cut; the
  * default ports `:80`/`:443` removed from the host; trailing slashes
  * removed from the path. Every rewrite is a Java-regex ∩ RE2 pattern
  * with NO capture-group replacements (the two engines disagree on
  * `$1` vs `\1`), so a SQL oracle reproduces the canonicalization
  * byte-for-byte.
  *
  * Scale shape: per-row projections only — the canonical key and host
  * columns are map-side; the dedup/cap that follows shuffles once on
  * the canonical key resp. host, like any keyed aggregate.
  */
object Urls {

  /** Adds `outCol` (canonical url) and `url_host` columns. Staged
    * through intermediate columns so each regex runs once per row. */
  def withCanonical(df: DataFrame, urlCol: String,
      outCol: String = "url_canonical"): DataFrame =
    df
      .withColumn("__u1",
        regexp_replace(lower(col(urlCol)), "^[a-z][a-z0-9+.-]*://", ""))
      .withColumn("__u2", regexp_replace(col("__u1"), "#.*$", ""))
      .withColumn("__u3", regexp_replace(col("__u2"), "\\?.*$", ""))
      .withColumn("__u4", regexp_replace(col("__u3"), "^www\\.", ""))
      .withColumn("__host0", regexp_extract(col("__u4"), "^[^/]+", 0))
      .withColumn("__path", expr("substring(__u4, length(__host0) + 1)"))
      .withColumn("url_host", regexp_replace(col("__host0"), ":(80|443)$", ""))
      .withColumn(outCol,
        concat(col("url_host"), regexp_replace(col("__path"), "/+$", "")))
      .drop("__u1", "__u2", "__u3", "__u4", "__host0", "__path")

  /** Longest-suffix host policy — the public-suffix-list matching shape
    * that completes the domain-curation trio (canonicalize → cap →
    * blocklist): each host explodes into its dot-suffix chain (one row
    * per label, bounded by the label count), equi-joins the BROADCAST
    * `rules` table — (suffix, action), action ∈ {"allow", "block"} —
    * and the LONGEST matching suffix decides; unmatched hosts default
    * to allow. No per-row regex over the rule list: the chain explode
    * is map-side, the rules ride the closure like any small dim table,
    * and the longest-match argmax + verdict join are one exchange each
    * on the doc key. (When host cardinality ≪ docs, run this over
    * `distinct` hosts and join the verdict back — same operator, one
    * extra host-keyed exchange, |hosts|-sized intermediate.)
    *
    * Adds `policy_suffix` (matched rule suffix, or "none") and
    * `policy_action` ("allow"/"block"). Input must carry `url_host`. */
  def suffixPolicy(df: DataFrame, rules: DataFrame,
      idCol: String): DataFrame = {
    val labels = split(col("url_host"), "\\.")
    val chain = transform(sequence(lit(0), size(labels) - 1),
      i => array_join(slice(labels, i + 1, size(labels) - i), "."))
    val ex = df.select(col(idCol), explode(chain).as("suffix"))
    // longest suffix wins; a host's chain has strictly decreasing
    // lengths, so the (length, suffix, action) struct max is total
    val verdict = ex.join(broadcast(rules), Seq("suffix"))
      .groupBy(col(idCol))
      .agg(max(struct(length(col("suffix")).as("l"),
        col("suffix").as("s"), col("action").as("a"))).as("m"))
      .select(col(idCol), col("m.s").as("policy_suffix"),
        col("m.a").as("policy_action"))
    df.join(verdict, Seq(idCol), "left")
      .withColumn("policy_suffix", coalesce(col("policy_suffix"), lit("none")))
      .withColumn("policy_action", coalesce(col("policy_action"), lit("allow")))
  }

  /** Keep at most `cap` rows per host, chosen DETERMINISTICALLY by
    * md5-rank on the id (ties on the id itself) — a stable uniform
    * sample, not first-N data order. Input must carry `url_host`. */
  def capPerHost(df: DataFrame, idCol: String, cap: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("url_host"))
      .orderBy(graft.functions.Kernels.md5Lower64Lo32(
        concat(lit("cap:"), col(idCol).cast("string"))), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= cap)
      .drop("__rn")
  }
}
