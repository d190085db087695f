package graft.ops.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused seeded-hash embedding: text → polyHash once → dim values
  *   v_i = ((fp + (i+1)·PermMult) mod P)/P·2−1
  * — the V1 stand-in embedder (`VectorOps.embed`, kept as the HOF
  * reference with a bit-identity test; the DuckDB twin is
  * `TextVector.Sql.embed`).
  *
  * Why an expression: in the HOF form the fp sub-expression sits
  * INSIDE the transform lambda, so the full-text polyHash fold
  * re-runs once per dimension (64× per doc in the merge query —
  * measured most of q22's 1 s at sf0.1). Here the text is hashed
  * exactly once.
  */
object HashEmbedKernel {
  import HashKernel.Mod
  final val PermMult: Long = 2654435761L

  def embed(s: UTF8String, dim: Int): ArrayData = {
    val fp = HashKernel.polyHash(s)
    val out = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      out(i) = ((fp + (i + 1) * PermMult) % Mod).toDouble / 1000000007.0 * 2.0 - 1.0
      i += 1
    }
    ArrayData.toArrayData(out)
  }
}

/** string → array<double> seeded-hash embedding of size `dim`. */
case class HashEmbed(child: Expression, dim: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType) TypeCheckResult.TypeCheckFailure(
      s"hash_embed needs a string argument, got ${child.dataType}")
    else if (dim <= 0) TypeCheckResult.TypeCheckFailure(s"dim=$dim must be positive")
    else TypeCheckResult.TypeCheckSuccess
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "hash_embed"

  override protected def nullSafeEval(input: Any): Any =
    HashEmbedKernel.embed(input.asInstanceOf[UTF8String], dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.ops.expressions.HashEmbedKernel.embed($c, $dim)")

  override protected def withNewChildInternal(newChild: Expression): HashEmbed =
    copy(child = newChild)
}

object HashEmbed {
  import org.apache.spark.sql.graftshim.ColumnShim
  def apply(c: Column, dim: Int): Column =
    ColumnShim.column(HashEmbed(ColumnShim.expression(c), dim))
}
