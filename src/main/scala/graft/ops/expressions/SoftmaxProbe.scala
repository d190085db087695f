package graft.ops.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Fused per-row softmax-probe kernels ([[graft.pipeline.ProbeTrainer]]).
  *
  * The HOF formulation (transform over a typedLit weight matrix +
  * zip_with/aggregate folds, then a double posexplode into K·D
  * gradient rows) evaluated ~1.3M interpreted lambdas per GD round
  * at sf0.1 — 5 s for the q98 training trajectory. These kernels run
  * the same arithmetic as one tight JVM loop per row; the gradient
  * leaves each row as ONE primitive long array whose flat-index
  * explode feeds a whole-stage-codegen hash aggregate (map-side
  * combined to ≤ K·D+1 rows per partition).
  *
  * Determinism contract (shared with the DuckDB oracle replay —
  * graft.queries.Learn): logits fold features in ascending index
  * order from 0.0; the softmax denominator folds classes in
  * ascending order from 0.0; gradient terms and the loss quantize
  * as floor(x·1e6 + 0.5) BEFORE any cross-row summation; the argmax
  * is strict-> first-wins. All double ops are the identical
  * left-assoc sequences of the HOF form they replaced (PropertySpec
  * pins kernel ≡ HOF).
  */
private[graft] trait SoftmaxEval {
  def w: Array[Array[Double]]

  @transient protected lazy val kClasses: Int = w.length
  @transient protected lazy val dims: Int = w(0).length

  /** exp(w_k · x) for every class, ascending-j fold per class. */
  protected def expLogits(xs: ArrayData): Array[Double] = {
    val ez = new Array[Double](kClasses)
    var kk = 0
    while (kk < kClasses) {
      val wk = w(kk)
      var z = 0.0
      var j = 0
      while (j < dims) { z = z + xs.getDouble(j) * wk(j); j += 1 }
      // StrictMath: Spark's Exp/Log column functions are StrictMath
      // (fdlibm, platform-independent) — Math.exp differs by 1 ulp on
      // ~7% of inputs, which broke kernel == HOF bit-exactness
      ez(kk) = StrictMath.exp(z)
      kk += 1
    }
    ez
  }

  protected def foldSum(ez: Array[Double]): Double = {
    var den = 0.0
    var kk = 0
    while (kk < kClasses) { den = den + ez(kk); kk += 1 }
    den
  }
}

/** softmax_grad_loss(xb, y): the K·D micro-quantized gradient cells
  * of one example (row-major: cell k·D+j) with its micro loss
  * appended as element K·D — one output array per row, ready for
  * elementwise aggregation. */
case class SoftmaxGradLoss(left: Expression, right: Expression,
                           w: Array[Array[Double]])
    extends BinaryExpression with CodegenFallback with SoftmaxEval {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"softmax_grad_loss needs (array<double>, int), got $other")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "softmax_grad_loss"

  override protected def nullSafeEval(x: Any, yv: Any): Any = {
    val xs = x.asInstanceOf[ArrayData]
    val y = yv.asInstanceOf[Int]
    if (xs.numElements() != dims)
      throw new IllegalArgumentException(
        s"softmax_grad_loss: feature vector has ${xs.numElements()} " +
          s"elements, weights expect $dims")
    if (y < 0 || y >= kClasses)
      throw new IllegalArgumentException(
        s"softmax_grad_loss: label $y outside [0, $kClasses)")
    val ez = expLogits(xs)
    val den = foldSum(ez)
    val out = new Array[Long](kClasses * dims + 1)
    var kk = 0
    while (kk < kClasses) {
      val gk = ez(kk) / den - (if (y == kk) 1.0 else 0.0)
      var j = 0
      while (j < dims) {
        out(kk * dims + j) =
          math.floor(gk * xs.getDouble(j) * 1e6 + 0.5).toLong
        j += 1
      }
      kk += 1
    }
    out(kClasses * dims) =
      math.floor(-StrictMath.log(ez(y) / den) * 1e6 + 0.5).toLong
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SoftmaxGradLoss =
    copy(left = newLeft, right = newRight)
}

object SoftmaxGradLoss {
  import org.apache.spark.sql.graftshim.ColumnShim
  def apply(xb: Column, y: Column, w: Array[Array[Double]]): Column =
    ColumnShim.column(SoftmaxGradLoss(
      ColumnShim.expression(xb), ColumnShim.expression(y), w))
}

/** softmax_score(xb): (pred, p) — argmax class (strict->, first
  * wins) and its raw softmax probability. The corpus-wide scoring
  * pass at 100 TB: narrow, shuffle-free, one loop per row. */
case class SoftmaxScore(child: Expression, w: Array[Array[Double]])
    extends UnaryExpression with CodegenFallback with SoftmaxEval {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"softmax_score needs array<double>, got $other")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("pred", IntegerType, nullable = false),
    StructField("p", DoubleType, nullable = false)))
  override def prettyName: String = "softmax_score"

  override protected def nullSafeEval(x: Any): Any = {
    val xs = x.asInstanceOf[ArrayData]
    if (xs.numElements() != dims)
      throw new IllegalArgumentException(
        s"softmax_score: feature vector has ${xs.numElements()} " +
          s"elements, weights expect $dims")
    val ez = expLogits(xs)
    val den = foldSum(ez)
    var best = ez(0)
    var bestK = 0
    var kk = 1
    while (kk < kClasses) {
      if (ez(kk) > best) { best = ez(kk); bestK = kk }
      kk += 1
    }
    InternalRow(bestK, best / den)
  }

  override protected def withNewChildInternal(
      newChild: Expression): SoftmaxScore = copy(child = newChild)
}

object SoftmaxScore {
  import org.apache.spark.sql.graftshim.ColumnShim
  def apply(xb: Column, w: Array[Array[Double]]): Column =
    ColumnShim.column(SoftmaxScore(ColumnShim.expression(xb), w))
}

/** softmax_probs(xb): the FULL per-class probability vector, in
  * class order — q174's confident-learning input ([[SoftmaxScore]]
  * keeps only the argmax; noise estimation needs every class's
  * probability to compare against that class's own confidence
  * threshold). Same fold orders as the family contract above. */
case class SoftmaxProbs(child: Expression, w: Array[Array[Double]])
    extends UnaryExpression with CodegenFallback with SoftmaxEval {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"softmax_probs needs array<double>, got $other")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "softmax_probs"

  override protected def nullSafeEval(x: Any): Any = {
    val xs = x.asInstanceOf[ArrayData]
    if (xs.numElements() != dims)
      throw new IllegalArgumentException(
        s"softmax_probs: feature vector has ${xs.numElements()} " +
          s"elements, weights expect $dims")
    val ez = expLogits(xs)
    val den = foldSum(ez)
    val out = new Array[Any](kClasses)
    var kk = 0
    while (kk < kClasses) { out(kk) = ez(kk) / den; kk += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(
      newChild: Expression): SoftmaxProbs = copy(child = newChild)
}

object SoftmaxProbs {
  import org.apache.spark.sql.graftshim.ColumnShim
  def apply(xb: Column, w: Array[Array[Double]]): Column =
    ColumnShim.column(SoftmaxProbs(ColumnShim.expression(xb), w))
}
