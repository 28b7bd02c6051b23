package graft

import org.apache.spark.sql.functions._
import graft.operators.{AnnIndex, Html, Pii, Scoring}

/** Round-12 hardening (round-11 verdict items 1-3 + all five advice
  * items), pinned at the unit level:
  *
  * 1. Manifest robustness: a malformed manifest line fails with a
  *    diagnosable IllegalStateException naming the path and line, not
  *    an opaque MatchError.
  * 2. The bucketed SRP layout now carries the same manifest contract
  *    as the partitioned layout — a probe with foreign planes is
  *    rejected loudly (the silent wrong-knob class cannot exist in ANY
  *    layout).
  * 3. appendIvf validates batch geometry against the stamped manifest —
  *    a wrong-dim append fails before any work.
  * 4. Centroid seeding is a RANK (k smallest ids), not the literal
  *    `id < k` predicate: a corpus whose id space starts at 1000 still
  *    trains exactly k centroids.
  * 5. hashedLinearScore left-joins a SPARSE model: documents none of
  *    whose tokens hit the model score as bias instead of vanishing,
  *    and null text scores.
  * 6. Html.extractText behavior corners: hidden-element payloads gone,
  *    entities decode one level, link-dense blocks cut, empty input
  *    survives.
  */
class Round12Spec extends SparkSpec {
  import spark.implicits._

  private def vec(seed: Int): Array[Float] =
    Array.tabulate(64)(d => (((seed * 31 + d * 17) % 13) - 6) / 6.0f)

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("readManifest: malformed line fails with path + line, not MatchError") {
    val dir = tmp("r12_manifest")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "_graft_index_manifest"),
      "kind=srp\nplanes6\n".getBytes("UTF-8"))
    val e = intercept[IllegalStateException] {
      AnnIndex.readManifest(spark, dir)
    }
    assert(e.getMessage.contains("planes6"))
    assert(e.getMessage.contains("_graft_index_manifest"))
  }

  test("bucketed SRP probe rejects foreign planes via the manifest") {
    val corpus = (0L until 64L).map(i => (i, vec(i.toInt)))
      .toDF("vec_id", "embedding")
    val path = tmp("r12_srpbkt") + "/idx"
    AnnIndex.buildSrpBucketed(corpus, "vec_id", "embedding",
      planes = 6, dim = 64, path = path,
      tableName = "r12_srp_bucketed", numBuckets = 4)
    val q = corpus.where(col("vec_id") < 2)
    // right knobs probe fine
    assert(AnnIndex.probeSrpBucketed(spark, "r12_srp_bucketed", q,
      "vec_id", "embedding", k = 3, planes = 6, dim = 64).count() > 0)
    // wrong planes = a different signature space — rejected loudly
    val e = intercept[IllegalStateException] {
      AnnIndex.probeSrpBucketed(spark, "r12_srp_bucketed", q,
        "vec_id", "embedding", k = 3, planes = 8, dim = 64).count()
    }
    assert(e.getMessage.contains("planes"))
  }

  test("appendIvf rejects a wrong-dim batch against the manifest") {
    val corpus = (0L until 64L).map(i => (i, vec(i.toInt)))
      .toDF("vec_id", "embedding")
    val path = tmp("r12_ivfdim") + "/ivf"
    AnnIndex.buildIvf(corpus, "vec_id", "embedding", numCells = 4, path = path)
    val batch = Seq((100L, vec(7))).toDF("vec_id", "embedding")
    val e = intercept[IllegalStateException] {
      AnnIndex.appendIvf(spark, path, batch, "vec_id", "embedding",
        dim = 32, stagePath = path + "_stage")
    }
    assert(e.getMessage.contains("dim"))
  }

  test("centroid seeding is a rank: non-0-based id space still seeds k") {
    // ids start at 1000 — the old `vid < k` predicate would seed ZERO
    // centroids here and write a degenerate index
    val corpus = (1000L until 1032L).map(i => (i, vec(i.toInt)))
      .toDF("vec_id", "embedding")
    val cent = AnnIndex.trainCentroidsKMeans(corpus, "vec_id", "embedding",
      k = 4, rounds = 1)
    assert(cent.count() == 4)
    val path = tmp("r12_ivfhigh") + "/ivf"
    AnnIndex.buildIvf(corpus, "vec_id", "embedding", numCells = 4, path = path)
    val centIds = spark.read.parquet(s"$path/centroids")
      .select(col("cid")).as[Long].collect().sorted.toVector
    assert(centIds == Vector(1000L, 1001L, 1002L, 1003L))
    assert(AnnIndex.readIndex(spark, s"$path/cells").count() == 32)
  }

  test("hashedLinearScore: all-miss and null-text docs score as bias") {
    val docs = Seq(
      (1L, "alpha beta"),          // tokens present, may hit or miss
      (2L, null.asInstanceOf[String]), // null text → bias
      (3L, "zz yy xx")             // tokens that miss an EMPTY model
    ).toDF("doc_id", "text")
    val emptyModel = spark.range(0)
      .select(col("id").as("bkt"), col("id").as("wgt"))
    val scored = Scoring.hashedLinearScore(docs, Seq("doc_id"), "text",
      emptyModel, numBuckets = 64, bias = 7L, salt = "t:")
      .orderBy("doc_id").collect()
    assert(scored.length == 3, "every input document must score")
    assert(scored.forall(_.getLong(1) == 7L),
      "an empty model scores every doc as bias")
  }

  test("Html.extractText corners") {
    val rows = Seq(
      // hidden payloads gone; entities decode ONE level; link-dense cut
      (1L, "<html><head><title>T</title><style>a{x:1}</style></head>" +
        "<body><script>if (1 < 2) { bad(); }</script>" +
        "<div><a href=\"/a\">Nav</a> <a href=\"/b\">Bar</a></div>" +
        "<p>Real &amp;amp; text stays.</p></body></html>"),
      (2L, ""),                       // empty input survives
      (3L, "plain text, no markup")   // pass-through
    ).toDF("doc_id", "html")
    val out = Html.extractText(rows, "html").orderBy("doc_id")
      .select("doc_id", "clean_text", "boilerplate_blocks").collect()
    assert(out(0).getString(1) == "Real &amp; text stays.",
      s"got '${out(0).getString(1)}'")
    assert(out(0).getLong(2) == 1L) // the nav div
    assert(out(1).getString(1) == "" && out(1).getLong(2) == 0L)
    assert(out(2).getString(1) == "plain text, no markup")
  }

  test("suffixPolicy: longest match wins, rules join is broadcast") {
    import graft.operators.Urls
    val hosts = Seq(
      (1L, "sub1.site5.example.com"),  // allow overrides parent block
      (2L, "sub0.site5.example.com"),  // parent block
      (3L, "a.b.other.org")            // no rule → allow
    ).toDF("doc_id", "url_host")
    val rules = Seq(
      ("site5.example.com", "block"),
      ("sub1.site5.example.com", "allow")).toDF("suffix", "action")
    val out = Urls.suffixPolicy(hosts, rules, "doc_id")
      .orderBy("doc_id")
      .select("policy_suffix", "policy_action").collect()
    assert(out(0).getString(1) == "allow" &&
      out(0).getString(0) == "sub1.site5.example.com")
    assert(out(1).getString(1) == "block" &&
      out(1).getString(0) == "site5.example.com")
    assert(out(2).getString(1) == "allow" && out(2).getString(0) == "none")
    // the rule table must ride as a broadcast, never shuffle the corpus
    val plan = Urls.suffixPolicy(hosts, rules, "doc_id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected a broadcast rules join, got:\n$plan")
  }

  test("pii patterns stay in the shared Java-regex ∩ RE2 dialect") {
    // compile every pattern with Java regex (RE2 validity is proven by
    // the DuckDB oracles); reject constructs RE2 lacks
    Pii.patterns.foreach { case (_, p) =>
      java.util.regex.Pattern.compile(p)
      assert(!p.contains("(?<") && !p.contains("(?=") && !p.contains("\\b"),
        s"pattern $p uses a construct outside the RE2 subset")
    }
  }
}
