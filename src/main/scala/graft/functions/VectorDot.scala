package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Static helpers shared by interpreted eval and generated code. Elements
  * are read left-to-right and accumulated into a double starting at 0.0 —
  * the exact op order of DuckDB `list_reduce(list_transform(...))` and of
  * the HOF `aggregate(zip_with(...))` form this replaces, so results stay
  * bit-identical across engines. Arrays must be non-null-element
  * (embedding columns); lengths are truncated to the shorter side. */
object VecOps {
  def dot(a: ArrayData, aFloat: Boolean, b: ArrayData, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0d
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }
}

/** Native codegen'd dot product over array<float|double> columns — the
  * hot inner op of every cosine (similarity search, ANN, embedding
  * near-dup). The HOF form (`aggregate(zip_with(..))`) is CodegenFallback:
  * interpreted per element with boxing — measured ~10× slower end-to-end
  * on the pairwise-cosine queries. */
case class VectorDot(left: Expression, right: Expression) extends BinaryExpression {

  private def elemFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float|double>, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vector_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecOps.dot(a.asInstanceOf[ArrayData], elemFloat(left),
      b.asInstanceOf[ArrayData], elemFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VecOps.dot($a, ${elemFloat(left)}, $b, ${elemFloat(right)})")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)
}
