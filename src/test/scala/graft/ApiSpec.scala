package graft

import org.apache.spark.sql.functions._
import graft.api._

/** The library facade compiles and behaves as documented — the "use as a
  * library" example from the README, executed. */
class ApiSpec extends SparkSpec {
  import spark.implicits._

  test("dedup + checks handles reach the oracle-gated operators") {
    val df = Seq((1L, "a", 2L), (1L, "b", 1L), (2L, "c", 9L)).toDF("k", "v", "ts")
    val latest = dedup.keepLatest(df, Seq(col("k")), col("ts"), col("v"))
      .orderBy("k").select("v").as[String].collect().toSeq
    assert(latest == Seq("a", "c"))
    val battery = Seq(
      checks.Check("k_not_null", "error", checks.notNull(df, "k")),
      checks.Check("v_unique", "warn", checks.unique(df, "v")))
    val verdict = checks.runVerdict(checks.summarize(battery)).collect()(0)
    assert(verdict.getString(3) == "pass")
  }

  test("nearDupClusters finds the planted near-dup pair, leaves others alone") {
    val base = "the quick brown fox jumps over the lazy dog near the old river bank today"
    val docs = Seq(
      (1L, base),
      (2L, base + " extra"), // near-dup of 1
      (3L, "completely different text about spark shuffles and parquet scans here now"),
      (4L, "yet another unrelated document mentioning joins aggregates and windows only"))
      .toDF("doc_id", "text")
    val clusters = nearDupClusters(docs, "doc_id", "text", threshold = 0.5)
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    // only the planted pair clusters; singletons are absent (no pairs)
    assert(clusters == Seq((1L, 1L), (2L, 1L)))
  }

  test("crossDocOverlap counts shared k-gram windows") {
    val docs = Seq(
      (1L, "a b c d e"),
      (2L, "a b c x y"),
      (3L, "p q r s t")).toDF("doc_id", "text")
    val got = crossDocOverlap(docs, "doc_id", "text", k = 3)
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    // doc1: windows {abc, bcd, cde}, shares abc with doc2
    assert(got == Seq((1L, 3L, 1L), (2L, 3L, 1L), (3L, 3L, 0L)))
  }

  test("bm25TopK ranks the term-bearing doc first") {
    val docs = Seq(
      (1L, "vector vector vector store"),
      (2L, "vector maybe"),
      (3L, "nothing relevant here at all")).toDF("doc_id", "text")
    val top = bm25TopK(docs, "doc_id", "text", Seq("vector"), k = 2)
      .select("doc_id").as[Long].collect().toSeq
    assert(top.head == 1L && top.size == 2)
  }

  test("topKNeighbors exact path returns the true nearest neighbor") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.9f, 0.1f)),
      (3L, Array(0.0f, 1.0f))).toDF("id", "vec")
    val nn = topKNeighbors(vecs, vecs, "id", "vec", k = 1, dim = 2, exact = true)
      .where(col("q_id") === 1L).select("n_id").as[Long].head()
    assert(nn == 2L)
  }

  test("globalRank matches a single-partition row_number without one") {
    val df = (1L to 100L).map(i => (i, (i * 37) % 101)).toDF("id", "v")
    val ranked = globalRank.withGlobalRank(df, "rn",
      expr("v div 10"), col("v"), col("id"))
    val got = ranked.orderBy("rn").select("v").as[Long].collect().toSeq
    assert(got == got.sorted && got.size == 100)
  }
}
