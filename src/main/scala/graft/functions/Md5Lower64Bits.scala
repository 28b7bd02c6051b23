package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static hash helper shared by interpreted eval and generated code. */
object Md5U64 {
  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** Raw 64 bits of DuckDB `md5_number_lower(s)`: the LAST 8 digest bytes
    * read little-endian (digest byte 15 is the value's top byte). Returned
    * as the signed-long bit pattern; callers reinterpret unsigned. */
  def hash(s: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var v = 0L
    var i = 15
    while (i >= 8) { v = (v << 8) | (d(i) & 0xffL); i -= 1 }
    v
  }
}

/** Native Catalyst expression for the cross-engine md5-u64 hash — the one
  * kernel where composing built-ins is measurably wrong: the functions-API
  * form (md5 → hex string → 8 substrings → concat → conv → decimal) round-
  * trips through strings and re-evaluates the digest per substring unless
  * carefully staged. This expression digests once and emits the long
  * directly, participates in whole-stage codegen (defineCodeGen), and
  * keeps the sketch pipelines branch-free.
  *
  * SQL name `md5_lower64_bits` via [[graft.GraftExtensions]].
  */
case class Md5Lower64Bits(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects STRING, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "md5_lower64_bits"

  override protected def nullSafeEval(input: Any): Any =
    Md5U64.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5U64.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Lower64Bits =
    copy(child = newChild)
}
