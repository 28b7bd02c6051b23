package graft

import java.security.MessageDigest
import org.scalacheck.{Gen, Prop, Properties}
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.Md5U64

/** ScalaCheck properties for the native hash helper — checked against an
  * independent BigInteger reference implementation of DuckDB's
  * md5_number_lower (last 8 digest bytes, little-endian, unsigned). */
object HashProperties extends Properties("Md5U64") {

  private def referenceU64(s: String): BigInt = {
    val d = MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    (8 to 15).foldRight(BigInt(0))((i, acc) => (acc << 8) | BigInt(d(i) & 0xff))
  }

  private val strings: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr, Gen.asciiPrintableStr,
    Gen.listOf(Gen.oneOf("spark", "row", "the", "a", " ", "|")).map(_.mkString))

  property("bits == reference md5_number_lower (unsigned)") =
    Prop.forAll(strings) { s =>
      val bits = Md5U64.hash(UTF8String.fromString(s))
      val unsigned = if (bits >= 0) BigInt(bits) else BigInt(bits) + (BigInt(1) << 64)
      unsigned == referenceU64(s)
    }

  property("hi/lo split recombines") = Prop.forAll(strings) { s =>
    val bits = Md5U64.hash(UTF8String.fromString(s))
    val hi = bits >>> 32
    val lo = bits & 0xffffffffL
    ((hi << 32) | lo) == bits
  }

  property("mod-p identity: u64 mod p == pmod(bits mod p + 4*[neg], p)") =
    Prop.forAll(strings) { s =>
      val p = 2147483647L
      val bits = Md5U64.hash(UTF8String.fromString(s))
      val unsigned = if (bits >= 0) BigInt(bits) else BigInt(bits) + (BigInt(1) << 64)
      val viaLongs = {
        val r = bits % p + (if (bits < 0) 4L else 0L)
        ((r % p) + p) % p
      }
      BigInt(viaLongs) == (unsigned mod BigInt(p))
    }

  property("sign-flip preserves unsigned order") =
    Prop.forAll(strings, strings) { (a, b) =>
      val (x, y) = (Md5U64.hash(UTF8String.fromString(a)), Md5U64.hash(UTF8String.fromString(b)))
      val ux = if (x >= 0) BigInt(x) else BigInt(x) + (BigInt(1) << 64)
      val uy = if (y >= 0) BigInt(y) else BigInt(y) + (BigInt(1) << 64)
      ((x ^ Long.MinValue) < (y ^ Long.MinValue)) == (ux < uy)
    }
}
