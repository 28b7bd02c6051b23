package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static helper shared by interpreted eval and generated code. */
object RollHash {
  /** Rabin-Karp polynomial fold h = (h·b + codeUnit) mod m over the
    * string's UTF-16 code units — identical to the per-character
    * ascii() fold for ASCII/BMP text (the corpus contract; the DuckDB
    * oracle indexes characters the same way). */
  def hash(s: UTF8String, b: Long, m: Long): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    while (i < str.length) { h = (h * b + str.charAt(i)) % m; i += 1 }
    h
  }
}

/** Native codegen'd Rabin-Karp rolling hash. The HOF form
  * (`aggregate(transform(split(text,"")), …)`) is CodegenFallback —
  * interpreted per character with an array materialization per row; this
  * is one compiled loop per value. */
case class RollingHash64(child: Expression, base: Long, mod: Long)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects STRING, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash64"

  override protected def nullSafeEval(input: Any): Any =
    RollHash.hash(input.asInstanceOf[UTF8String], base, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RollHash.hash($c, ${base}L, ${mod}L)")

  override protected def withNewChildInternal(newChild: Expression): RollingHash64 =
    copy(child = newChild)
}
