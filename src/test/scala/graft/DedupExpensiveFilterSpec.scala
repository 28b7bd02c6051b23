package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The injected DedupExpensiveFilter optimizer rule: pushed filters that
  * inline an expensive aliased expression N times must evaluate it once. */
class DedupExpensiveFilterSpec extends SparkSpec {
  import spark.implicits._

  private def physical(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("two-field predicate over an aliased from_json parses once, not twice") {
    val schema = StructType(Seq(
      StructField("a", LongType), StructField("b", LongType)))
    val df = Seq("""{"a":1,"b":2}""", """{"a":3,"b":4}""").toDF("js")
      .select(from_json(col("js"), schema).as("j"))
      .where(col("j.a") === 1L && col("j.b") === 2L)
      .select(col("j.a").as("a"))
    val n = "from_json".r.findAllIn(physical(df)).size
    // one parse for the (deduped) filter + one for the output projection —
    // without the rule the filter alone carries two
    assert(n <= 2, s"expected <=2 from_json, found $n:\n${physical(df)}")
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("md5-bucket band predicate digests once despite hex-substring fan-out") {
    // the q99 shape: hex-conv bucket (8 substrings of one md5) in a
    // pushed band filter — the rule must collapse the 8 digests to 1
    val df = spark.range(1L, 101L).toDF("k")
      .select(col("k"),
        (graft.functions.Kernels.md5Lower64(concat(lit("t:"), col("k"))) % 100)
          .cast("long").as("bucket"))
      .where(col("bucket") >= 3 && col("bucket") < 97)
      .select(col("k"))
    val n = "md5\\(".r.findAllIn(physical(df)).size
    assert(n == 1, s"expected exactly 1 md5, found $n:\n${physical(df)}")
    // values: same rows as the unoptimized reference computation
    val expect = (1L until 101L).filter { k =>
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"t:$k".getBytes("UTF-8"))
      val u64 = (0 until 8).map(i => (d(15 - i).toLong & 0xFF) << (8 * (7 - i)))
        .reduce(_ | _)
      val m = java.lang.Long.remainderUnsigned(u64, 100L)
      m >= 3 && m < 97
    }
    assert(df.collect().map(_.getLong(0)).toSeq.sorted == expect)
  }

  test("non-duplicated and non-deterministic predicates are untouched") {
    val df = Seq(1L, 2L).toDF("k")
      .where(md5(col("k").cast("string")) =!= "x")
    assert(!physical(df).contains("CommonExpressionRef"))
    val r = Seq(1L, 2L).toDF("k").where(rand() < 2.0 && rand() < 2.0)
    assert(r.count() == 2L) // rule must not merge distinct rand() calls
  }
}
