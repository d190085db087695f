package graft.ops.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Cosine similarity kernel — the hot-path twin of
  * `VectorOps.cosine` (dot / sqrt(normA) / sqrt(normB), all three
  * reductions folding left-to-right over indices, so results are
  * bit-identical to the HOF implementation and the DuckDB oracle; a
  * unit test enforces kernel == HOF).
  *
  * Why an expression: the HOF form is three interpreted
  * zip_with/aggregate passes per pair — on a candidate-pair verify
  * stage (q34: 10^5–10^6 pairs) that interpretation tax dominates
  * the query. This kernel is one fused loop inside whole-stage
  * codegen.
  */
object CosineKernel {
  def cosine(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = a.numElements()
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / math.sqrt(na) / math.sqrt(nb)
  }
}

/** cosine(array<float|double>, array<float|double>) → double. */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), ArrayType(FloatType | DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"cosine_sim needs two array<float|double>, got $other")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    CosineKernel.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left), isFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.ops.expressions.CosineKernel.cosine($a, $b, ${isFloat(left)}, ${isFloat(right)})")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

object CosineSim {
  import org.apache.spark.sql.graftshim.ColumnShim
  def apply(a: Column, b: Column): Column =
    ColumnShim.column(CosineSim(ColumnShim.expression(a), ColumnShim.expression(b)))
}
