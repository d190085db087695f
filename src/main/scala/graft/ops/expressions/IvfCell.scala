package graft.ops.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** IVF coarse quantizer: assign a vector to its nearest centroid by
  * cosine (argmax, first-wins on exact ties). The centroid matrix is
  * broadcast inside the expression (an IVF codebook is small driver
  * state by design — here 16×64 doubles).
  *
  * Cosine uses the engine's fixed operation order
  * (dot folded over dims ascending, then /sqrt(na)/sqrt(nb) — see
  * VectorOps.cosine), so the DuckDB oracle reproduces the assignment
  * exactly. Precondition: vectors and centroids are non-zero — a
  * zero norm makes every cosine NaN, where JVM comparison (NaN never
  * greater) and DuckDB (NaN above all doubles) disagree on the
  * argmax. CodegenFallback: the per-row work is one tight JVM loop
  * (K·dim mul-adds); codegen would only inline the call.
  */
case class IvfCell(child: Expression, cents: Array[Array[Double]])
    extends UnaryExpression with CodegenFallback {

  // computed once, not per element in the hot loop
  @transient private lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ivf_cell needs array<float|double>, got $other")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "ivf_cell"

  @transient private lazy val centNormSq: Array[Double] =
    cents.map(c => c.foldLeft(0.0)((acc, x) => acc + x * x))

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val dim = v.numElements()
    val x = new Array[Double](dim)
    var d = 0
    while (d < dim) {
      x(d) = if (isFloat) v.getFloat(d).toDouble else v.getDouble(d)
      d += 1
    }
    var vNorm = 0.0
    d = 0
    while (d < dim) { vNorm += x(d) * x(d); d += 1 }
    var best = Double.NegativeInfinity
    var bestJ = 0
    var j = 0
    while (j < cents.length) {
      val c = cents(j)
      var dot = 0.0
      var k = 0
      while (k < dim) { dot += x(k) * c(k); k += 1 }
      val cos = dot / math.sqrt(vNorm) / math.sqrt(centNormSq(j))
      if (cos > best) { best = cos; bestJ = j }
      j += 1
    }
    bestJ
  }

  override protected def withNewChildInternal(newChild: Expression): IvfCell =
    copy(child = newChild)
}

object IvfCell {
  import org.apache.spark.sql.graftshim.ColumnShim
  def apply(c: Column, cents: Array[Array[Double]]): Column =
    ColumnShim.column(IvfCell(ColumnShim.expression(c), cents))
}

/** Top-2 IVF assignment in one pass: array<int> of the vector's two
  * nearest centroids by cosine — [[IvfCell]]'s argmax plus the
  * runner-up, for spill-to-2 redundant indexing. Tie semantics match
  * the two-step oracle twin exactly: the winner is the FIRST index of
  * the max score; the runner-up is the first index of the max over
  * the remaining cells (i.e. argmax after masking the winner) — both
  * enforced by strict `>` updates below. One scan instead of the
  * score-vector HOF + self-union the first spill cut used (which
  * recomputed the scan subtree per branch). Same non-zero-norm
  * precondition as IvfCell. */
case class IvfCells2(child: Expression, cents: Array[Array[Double]])
    extends UnaryExpression with CodegenFallback {

  // with one centroid both slots resolve to index 0 and the
  // downstream explode would index the same row under one cell
  // twice — a geometry error, refused at construction
  require(cents.length >= 2,
    s"ivf_cells2 needs >= 2 centroids for distinct (winner, runner-up) " +
      s"assignment, got ${cents.length}")

  @transient private lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ivf_cells2 needs array<float|double>, got $other")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "ivf_cells2"

  @transient private lazy val centNormSq: Array[Double] =
    cents.map(c => c.foldLeft(0.0)((acc, x) => acc + x * x))

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val dim = v.numElements()
    val x = new Array[Double](dim)
    var d = 0
    while (d < dim) {
      x(d) = if (isFloat) v.getFloat(d).toDouble else v.getDouble(d)
      d += 1
    }
    var vNorm = 0.0
    d = 0
    while (d < dim) { vNorm += x(d) * x(d); d += 1 }
    var best = Double.NegativeInfinity
    var bestJ = 0
    var second = Double.NegativeInfinity
    var secondJ = 0
    var j = 0
    while (j < cents.length) {
      val c = cents(j)
      var dot = 0.0
      var k = 0
      while (k < dim) { dot += x(k) * c(k); k += 1 }
      val cos = dot / math.sqrt(vNorm) / math.sqrt(centNormSq(j))
      if (cos > best) {
        second = best; secondJ = bestJ
        best = cos; bestJ = j
      } else if (cos > second) {
        second = cos; secondJ = j
      }
      j += 1
    }
    ArrayData.toArrayData(Array(bestJ, secondJ))
  }

  override protected def withNewChildInternal(newChild: Expression): IvfCells2 =
    copy(child = newChild)
}

object IvfCells2 {
  import org.apache.spark.sql.graftshim.ColumnShim
  def apply(c: Column, cents: Array[Array[Double]]): Column =
    ColumnShim.column(IvfCells2(ColumnShim.expression(c), cents))
}
