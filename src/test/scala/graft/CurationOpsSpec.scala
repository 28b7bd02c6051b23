package graft

import org.apache.spark.sql.functions._
import graft.operators.{Pii, Urls}

/** Edge-case pins for the round-11 curation operators (the gates prove
  * engine parity on the synthetic corpus; these pin the semantic corners
  * the corpus doesn't hit).
  */
class CurationOpsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    Urls.withCanonical(urls.toDF("url"), "url")
      .select(col("url_canonical")).as[String].collect().toSeq

  test("url canonicalization: corners") {
    assert(canon("https://www.Foo.COM/") == Seq("foo.com"))
    assert(canon("HTTP://foo.com:80/a/b/") == Seq("foo.com/a/b"))
    // non-default port preserved; only :80/:443 are stripped
    assert(canon("https://foo.com:8080/x") == Seq("foo.com:8080/x"))
    // fragment cut BEFORE query, so '?' inside a fragment can't survive
    assert(canon("https://foo.com/p#frag?fake=1") == Seq("foo.com/p"))
    // www only stripped as a leading label, not mid-host
    assert(canon("https://awww.foo.com/x") == Seq("awww.foo.com/x"))
    // scheme-less input passes through the same pipeline
    assert(canon("www.foo.com/x?q=1") == Seq("foo.com/x"))
  }

  test("url canonicalization is idempotent") {
    val once = canon("HTTPS://WWW.Site7.COM:443/P/9/?utm=1#f")
    assert(canon(once.head) == once)
  }

  test("pii redaction: placeholders are a fixed point and scan zeros out") {
    val dirty = Seq((1L,
      "mail a.b@x-y.co or call +1-555-1234 from 10.1.2.3 acct 41234567890123"))
      .toDF("id", "text")
    val once = Pii.redact(dirty, "text").select(col("text")).as[String].head()
    assert(once ==
      "mail <EMAIL> or call <PHONE> from <IPV4> acct <DIGIT_RUN>")
    // idempotence: placeholders contain nothing any pattern can match
    val twice = Pii.redact(Seq((1L, once)).toDF("id", "text"), "text")
      .select(col("text")).as[String].head()
    assert(twice == once)
    // and the scan over redacted text is all-zero
    val residual = Pii.scan(Seq((1L, once)).toDF("id", "text"), "text")
      .select(col("pii_total")).as[Int].head()
    assert(residual == 0)
  }

  test("pii scan: clean text has zero counts") {
    val clean = Pii.scan(Seq((1L, "just ordinary words 12 and 345"))
      .toDF("id", "text"), "text")
    assert(clean.select(col("pii_total")).as[Int].head() == 0)
  }
}
