package graft

import java.security.MessageDigest
import java.time.LocalDate
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.Kernels

/** Randomized kernel checks: 300 ScalaCheck-generated cases evaluated in
  * ONE DataFrame pass per kernel (a Spark job per forAll sample would be
  * minutes; a batched column eval is milliseconds), compared against
  * independent JVM reference implementations. */
class KernelPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], n: Int): List[A] =
    Gen.listOfN(n, g).apply(Gen.Parameters.default, Seed(42L)).get

  test("monthsBetweenCalendar == calendar month-boundary count (300 random date pairs)") {
    val dates = for {
      y1 <- Gen.choose(1990, 2030); m1 <- Gen.choose(1, 12); d1 <- Gen.choose(1, 28)
      y2 <- Gen.choose(1990, 2030); m2 <- Gen.choose(1, 12); d2 <- Gen.choose(1, 28)
    } yield (LocalDate.of(y1, m1, d1), LocalDate.of(y2, m2, d2))
    val cases = sample(dates, 300)
    val expected = cases.map { case (a, b) =>
      (a.getYear - b.getYear) * 12 + (a.getMonthValue - b.getMonthValue) }
    val got = cases.map { case (a, b) => (java.sql.Date.valueOf(a), java.sql.Date.valueOf(b)) }
      .toDF("a", "b")
      .select(Kernels.monthsBetweenCalendar(col("a"), col("b"))).as[Int].collect()
    assert(got.toSeq === expected)
  }

  test("clamp lands in [lo,hi] and is idempotent (300 random triples)") {
    val triples = for {
      v <- Gen.choose(-1000.0, 1000.0); lo <- Gen.choose(-100.0, 0.0); hi <- Gen.choose(0.0, 100.0)
    } yield (v, lo, hi)
    val cases = sample(triples, 300)
    val got = cases.toDF("v", "lo", "hi").select(
      Kernels.clamp(col("v"), col("lo"), col("hi")).as("c"),
      Kernels.clamp(Kernels.clamp(col("v"), col("lo"), col("hi")), col("lo"), col("hi")).as("cc"),
      col("lo"), col("hi")).collect()
    got.foreach { r =>
      assert(r.getDouble(0) >= r.getDouble(2) && r.getDouble(0) <= r.getDouble(3))
      assert(r.getDouble(0) === r.getDouble(1)) // idempotent
    }
  }

  test("normalizeOrderId: uppercase alnum, no SO/ORD prefix, idempotent (300 random ids)") {
    val ids = Gen.listOf(Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf('-', ' ', '#', '_', '/'))).map(_.mkString)
      .flatMap(s => Gen.oneOf(s, "SO-" + s, "ord" + s, "so_" + s))
    val cases = sample(ids, 300)
    val got = cases.toDF("s").select(
      Kernels.normalizeOrderId(col("s")).as("n"),
      Kernels.normalizeOrderId(Kernels.normalizeOrderId(col("s"))).as("nn")).collect()
    got.foreach { r =>
      assert(r.getString(0).matches("[A-Z0-9]*"))
      // normalizing twice only differs when the payload itself begins
      // with SO/ORD (the single-strip contract): pass 2 is a suffix of 1
      assert(r.getString(0).endsWith(r.getString(1)))
    }
  }

  test("surrogateKey == md5 of dbt-joined parts incl. null sentinel (300 random pairs)") {
    val parts = Gen.option(Gen.alphaNumStr)
    val cases = sample(Gen.zip(parts, parts), 300)
    val expected = cases.map { case (a, b) =>
      val s = Seq(a, b).map(_.getOrElse(Kernels.SkNullSentinel)).mkString("-")
      MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString }
    val got = cases.toDF("a", "b")
      .select(Kernels.surrogateKey(col("a"), col("b"))).as[String].collect()
    assert(got.toSeq === expected)
  }
}
