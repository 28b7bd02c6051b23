package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.functions.Kernels._

/** Unit tests for the shared column kernels. Expected md5 values were
  * computed independently (DuckDB md5_number_lower / python hashlib), so
  * these pin the cross-engine hash contract, not Spark's own output. */
class KernelsSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column): T =
    spark.range(1).select(c).collect()(0).getAs[T](0)

  test("surrogateKey matches dbt_utils expansion incl. null sentinel") {
    val got = Seq(("1", Option.empty[String]))
      .toDF("a", "b")
      .select(surrogateKey(col("a"), col("b")))
      .as[String].head()
    assert(got == "9902a3dc3ffe71035ef18229afae9987") // md5('1-_dbt_utils_surrogate_key_null_')
    val got2 = Seq(("42", "A", "2024-01-31")).toDF("a", "b", "c")
      .select(surrogateKey(col("a"), col("b"), col("c"))).as[String].head()
    assert(got2 == "b340791d1fd2500f20d2514687f76ae2") // md5('42-A-2024-01-31')
  }

  test("md5Lower64 equals DuckDB md5_number_lower") {
    val cases = Map(
      "abc" -> BigDecimal("8250560606382298838"),
      "hello world" -> BigDecimal("14109032780988074899"), // > Long.MaxValue
      "graft" -> BigDecimal("4229648949381425444"),
      "x" -> BigDecimal("11990653779475613941"))
    cases.foreach { case (s, want) =>
      val got = Seq(s).toDF("s").select(md5Lower64(col("s")))
        .collect()(0).getDecimal(0)
      assert(BigDecimal(got) == want, s"md5Lower64($s)")
    }
  }

  test("md5Lower64 hi/lo 32-bit split recombines to the full value") {
    val df = Seq("abc", "hello world", "graft").toDF("s")
    val rows = df.select(md5Lower64(col("s")), md5Lower64Hi32(col("s")), md5Lower64Lo32(col("s"))).collect()
    rows.foreach { r =>
      val full = BigDecimal(r.getDecimal(0))
      val hi = r.getLong(1); val lo = r.getLong(2)
      assert(BigDecimal(hi) * BigDecimal(4294967296L) + BigDecimal(lo) == full)
    }
  }

  test("monthsBetweenCalendar counts month boundaries, not 30-day spans") {
    val df = Seq(
      ("2024-01-31", "2024-02-01", 1),  // next day, but crosses a boundary
      ("2024-01-01", "2024-01-31", 0),  // 30 days, same month
      ("2023-11-15", "2024-02-01", 3),
      ("2024-03-01", "2024-01-31", -2)) // negative direction
      .toDF("b", "a", "want")
      .select(monthsBetweenCalendar(to_date(col("a")), to_date(col("b"))).as("got"), col("want"))
    df.collect().foreach(r => assert(r.getAs[Int]("got") == r.getAs[Int]("want")))
  }

  test("normalizeOrderId uppercases, strips non-alnum and SO/ORD prefixes") {
    val cases = Seq(
      "so-123" -> "123",
      "ORD 99x" -> "99X",
      "a-so-1" -> "ASO1", // prefix strip only at start
      "SORT42" -> "RT42") // SO prefix strips before ORD can match
    cases.foreach { case (in, want) =>
      assert(Seq(in).toDF("s").select(normalizeOrderId(col("s"))).as[String].head() == want)
    }
  }

  test("clamp and validLat/validLon") {
    val r = Seq((150.0, -200.0, 95.0)).toDF("pct", "lon", "lat")
      .select(
        clampPct100(col("pct")), validLon(col("lon")), validLat(col("lat")),
        validLat(lit(45.0)), validLon(lit(-179.9)))
      .collect()(0)
    assert(r.getDouble(0) == 100.0)
    assert(r.isNullAt(1) && r.isNullAt(2))
    assert(r.getDouble(3) == 45.0 && r.getDouble(4) == -179.9)
  }

  test("nullifTrim blanks to null, trims otherwise") {
    val rows = Seq("  ", " a ", "").toDF("s").select(nullifTrim(col("s"))).collect()
    assert(rows(0).isNullAt(0) && rows(2).isNullAt(0))
    assert(rows(1).getString(0) == "a")
  }

  test("moneyOut: decimal-exact then one double conversion") {
    val got = Seq(("54.27")).toDF("s")
      .select(moneyOut(col("s").cast("decimal(18,6)")))
      .as[Double].head()
    assert(got == 54.27)
  }
}
