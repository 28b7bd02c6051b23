package graft

import org.apache.spark.sql.functions._
import graft.functions.Kernels

/** Native Md5Lower64Bits expression: DuckDB parity, unsigned derivations,
  * and agreement with the portable hex-based kernels. */
class NativeExprSpec extends SparkSpec {
  import spark.implicits._

  test("md5Bits u64 equals DuckDB md5_number_lower and the hex kernel") {
    val df = Seq("hello", "a", "spark scan fast", "").toDF("s")
    val r = df.select(
      Kernels.md5BitsU64(Kernels.md5Bits(col("s"))).cast("string").as("native"),
      Kernels.md5Lower64(col("s")).cast("string").as("hex")).collect()
    assert(r.forall(x => x.getString(0) === x.getString(1)))
    // pinned DuckDB value: md5_number_lower('hello')
    assert(r(0).getString(0) === ((2462390032L << 32) | 2443014585L).toString ||
      r(0).getString(0) === "10575884659879408057")
  }

  test("hi/lo halves and mod-p agree with the hex kernels") {
    val df = Seq("hello", "x y z", "graft").toDF("s")
    val bits = Kernels.md5Bits(col("s"))
    val r = df.select(
      Kernels.md5BitsHi32(bits).as("nh"), Kernels.md5Lower64Hi32(col("s")).as("hh"),
      Kernels.md5BitsLo32(bits).as("nl"), Kernels.md5Lower64Lo32(col("s")).as("hl"),
      Kernels.md5BitsMod31(bits).as("nm"),
      (Kernels.md5Lower64(col("s")) % 2147483647L).cast("long").as("hm")).collect()
    r.foreach { x =>
      assert(x.getLong(0) === x.getLong(1) && x.getLong(2) === x.getLong(3) &&
        x.getLong(4) === x.getLong(5))
    }
  }

  test("md5BitsModK equals the decimal u64 % k for assorted moduli") {
    val df = (Seq("hello", "x y z", "graft", "") ++
      (0 until 200).map(i => s"doc:$i")).toDF("s")
    val bits = Kernels.md5Bits(col("s"))
    Seq(100L, 1000L, 1000000L, 97L, 2L).foreach { k =>
      val r = df.select(
        Kernels.md5BitsModK(bits, k).as("fast"),
        (Kernels.md5Lower64(col("s")) % k).cast("long").as("slow")).collect()
      r.foreach(x => assert(x.getLong(0) === x.getLong(1), s"k=$k"))
    }
  }

  test("orderable image preserves unsigned order and is self-inverse") {
    val df = Seq("a", "b", "c", "hello", "zz").toDF("s")
    val got = df.select(Kernels.md5Bits(col("s")).as("bits"),
        Kernels.md5BitsOrderable(Kernels.md5Bits(col("s"))).as("ord"),
        Kernels.md5BitsU64(Kernels.md5Bits(col("s"))).as("u64"))
      .collect().sortBy(_.getLong(1))
    val byU64 = got.sortBy(r => r.getDecimal(2))
    assert(got.map(_.getLong(0)).toSeq === byU64.map(_.getLong(0)).toSeq)
    val back = df.select(
      Kernels.md5BitsOrderable(Kernels.md5BitsOrderable(Kernels.md5Bits(col("s")))).as("b2"),
      Kernels.md5Bits(col("s")).as("b")).collect()
    back.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("null input yields null; extension registers the SQL function") {
    val df = Seq(Option.empty[String], Option("x")).toDF("s")
    assert(df.select(Kernels.md5Bits(col("s"))).collect().head.isNullAt(0))
    // wiring smoke: the injector applies cleanly to a fresh extensions set
    new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
  }
}
