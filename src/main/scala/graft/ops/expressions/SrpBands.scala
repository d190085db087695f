package graft.ops.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Signed-random-projection LSH signature, packed into band bucket
  * keys — the hot-path kernel twin of
  * `VectorOps.packBands(VectorOps.srpBits(v, nBits, dim), …)`
  * (same bits, same IEEE operation order, so the DuckDB oracle and
  * the HOF reference implementation agree bit-for-bit; a unit test
  * enforces kernel == HOF).
  *
  * Why an expression and not the HOF pipeline: nested
  * transform/aggregate lambdas are interpreted per element
  * (~nBits·dim evals/row, no codegen) — measured 45 s over 2000
  * vectors on a single input split. This kernel is a tight loop
  * inside whole-stage codegen.
  */
object SrpKernel {
  final val Mod: Long = 1000000007L
  final val PermMult: Long = 2654435761L

  def bands(v: ArrayData, isFloat: Boolean, nBits: Int, nBands: Int): ArrayData = {
    val dim = v.numElements()
    val r = nBits / nBands
    val out = new Array[Long](nBands)
    var i = 0
    while (i < nBits) {
      var acc = 0.0
      var dd = 0
      while (dd < dim) {
        val x = if (isFloat) v.getFloat(dd).toDouble else v.getDouble(dd)
        val h = ((i.toLong * dim + dd + 1) * PermMult % Mod).toDouble /
          1000000007.0 * 2.0 - 1.0
        acc += x * h
        dd += 1
      }
      if (acc > 0) out(i / r) |= (1L << (i % r))
      i += 1
    }
    ArrayData.toArrayData(out)
  }
}

/** array<float|double> embedding → array<long> of nBands SRP band
  * values (nBits/nBands bits each). */
case class SrpBands(child: Expression, nBits: Int, nBands: Int)
    extends UnaryExpression {

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      if (nBits % nBands == 0) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"nBits=$nBits not divisible by nBands=$nBands")
    case other => TypeCheckResult.TypeCheckFailure(
      s"srp_bands needs array<float|double>, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "srp_bands"

  override protected def nullSafeEval(input: Any): Any =
    SrpKernel.bands(input.asInstanceOf[ArrayData], isFloat, nBits, nBands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.ops.expressions.SrpKernel.bands($c, $isFloat, $nBits, $nBands)")

  override protected def withNewChildInternal(newChild: Expression): SrpBands =
    copy(child = newChild)
}

object SrpBands {
  import org.apache.spark.sql.graftshim.ColumnShim
  def apply(c: Column, nBits: Int, nBands: Int): Column =
    ColumnShim.column(SrpBands(ColumnShim.expression(c), nBits, nBands))
}
