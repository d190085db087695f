package graft.ops.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Random-feature document embedding: array<long> feature hashes →
  * array<double> of `dim` sums, where each hash contributes the
  * pseudo-random value ((h + (i+1)·PermMult) mod P)/P·2−1 to
  * dimension i — a random projection of the bag-of-features
  * indicator vector, so cosine between outputs tracks feature-set
  * overlap (the embedding-cosine near-dup family of the builder
  * brief; same seeded-hash family as `VectorOps.embed`, which the
  * DuckDB oracle reproduces exactly).
  *
  * Why an expression and not the HOF pipeline: nested
  * transform/aggregate lambdas are interpreted per element
  * (dim·|hs| evals/row, no codegen) — the same measured cliff that
  * motivated [[SrpBands]]. The HOF reference implementation
  * (`VectorOps.featureEmbedRef`) is kept for the bit-identity unit
  * test.
  */
object FeatureEmbedKernel {
  final val Mod: Long = 1000000007L
  final val PermMult: Long = 2654435761L

  def embed(hs: ArrayData, dim: Int): ArrayData = {
    val n = hs.numElements()
    val out = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      // left-to-right fold per dimension == DuckDB list_reduce order
      var acc = 0.0
      var j = 0
      while (j < n) {
        acc += ((hs.getLong(j) + (i + 1) * PermMult) % Mod).toDouble /
          1000000007.0 * 2.0 - 1.0
        j += 1
      }
      out(i) = acc
      i += 1
    }
    ArrayData.toArrayData(out)
  }
}

/** array<long> feature hashes → array<double> random-feature
  * embedding of size `dim`. */
case class FeatureEmbed(child: Expression, dim: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) =>
      if (dim > 0) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"dim=$dim must be positive")
    case other => TypeCheckResult.TypeCheckFailure(
      s"feature_embed needs array<long>, got $other")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "feature_embed"

  override protected def nullSafeEval(input: Any): Any =
    FeatureEmbedKernel.embed(input.asInstanceOf[ArrayData], dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.ops.expressions.FeatureEmbedKernel.embed($c, $dim)")

  override protected def withNewChildInternal(newChild: Expression): FeatureEmbed =
    copy(child = newChild)
}

object FeatureEmbed {
  import org.apache.spark.sql.graftshim.ColumnShim
  def apply(c: Column, dim: Int): Column =
    ColumnShim.column(FeatureEmbed(ColumnShim.expression(c), dim))
}
