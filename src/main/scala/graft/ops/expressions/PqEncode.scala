package graft.ops.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Product-quantization encode kernel: array<double> of m·sub dims →
  * array<int> of m sub-space centroid codes (argmin L2, FIRST
  * minimum on ties — the `array_position(dd, array_min(dd))` rule
  * the q78 HOF reference implements). The deterministic codebook is
  * the same integer-formula → double derivation the DuckDB oracle
  * computes inline; it is built once per (m, k, sub) and memoized
  * JVM-wide (driver state in spirit — what a trained k-means
  * codebook would be broadcast as).
  *
  * Why an expression: the HOF encode runs m·k·sub interpreted lambda
  * evals per row (~25M at sf0.1) — this keeps the encode inside
  * whole-stage codegen with a tight primitive loop. PropertySpec
  * pins kernel ≡ HOF bit-exactly.
  */
object PqKernel {
  final val PermMult: Long = 2654435761L
  final val Mod: Long = 1000000007L

  private val memo =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), Array[Array[Array[Double]]]]()

  def codebook(m: Int, k: Int, sub: Int): Array[Array[Array[Double]]] =
    memo.computeIfAbsent((m, k, sub), _ =>
      Array.tabulate(m, k, sub) { (mm, jj, ii) =>
        val v = (((mm * k + jj) * sub + ii + 1).toLong * PermMult) % Mod
        v.toDouble / 1000000007.0 * 2.0 - 1.0
      })

  def encode(x: ArrayData, m: Int, k: Int, sub: Int): ArrayData =
    encodeWith(x, codebook(m, k, sub))

  /** Same argmin-L2 loop against an arbitrary (e.g. TRAINED)
    * codebook — q91's encode. */
  def encodeWith(x: ArrayData, cb: Array[Array[Array[Double]]]): ArrayData = {
    val m = cb.length
    val k = cb(0).length
    val sub = cb(0)(0).length
    val out = new Array[Int](m)
    var mm = 0
    while (mm < m) {
      val cbm = cb(mm)
      var best = 0
      var bestD = Double.PositiveInfinity
      var jj = 0
      while (jj < k) {
        val cbj = cbm(jj)
        var a = 0.0
        var ii = 0
        while (ii < sub) {
          // left-to-right fold of (xi-ci)² — the HOF aggregate's
          // exact order
          val d = x.getDouble(mm * sub + ii) - cbj(ii)
          a = a + d * d
          ii += 1
        }
        // strict < keeps the FIRST minimum, matching array_position
        if (a < bestD) { bestD = a; best = jj }
        jj += 1
      }
      out(mm) = best
      mm += 1
    }
    ArrayData.toArrayData(out)
  }
}

/** array<double> → array<int> PQ codes under the engine's
  * deterministic codebook. */
case class PqEncode(child: Expression, m: Int, k: Int, sub: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_encode needs array<double>, got $other")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  override protected def nullSafeEval(input: Any): Any =
    PqKernel.encode(input.asInstanceOf[ArrayData], m, k, sub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.ops.expressions.PqKernel.encode($c, $m, $k, $sub)")

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

object PqEncode {
  import org.apache.spark.sql.graftshim.ColumnShim
  def apply(c: Column, m: Int, k: Int, sub: Int): Column =
    ColumnShim.column(PqEncode(ColumnShim.expression(c), m, k, sub))
}

/** array<double> → array<int> PQ codes under a caller-supplied
  * (trained) codebook, broadcast inside the expression like
  * IvfCell's centroids. CodegenFallback: one tight JVM loop per
  * row. */
case class PqEncodeWith(child: Expression, cb: Array[Array[Array[Double]]])
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_encode_with needs array<double>, got $other")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode_with"

  override protected def nullSafeEval(input: Any): Any =
    PqKernel.encodeWith(input.asInstanceOf[ArrayData], cb)

  override protected def withNewChildInternal(newChild: Expression): PqEncodeWith =
    copy(child = newChild)
}

object PqEncodeWith {
  import org.apache.spark.sql.graftshim.ColumnShim
  def apply(c: Column, cb: Array[Array[Array[Double]]]): Column =
    ColumnShim.column(PqEncodeWith(ColumnShim.expression(c), cb))
}

/** ADC (asymmetric distance computation) kernel: (query residual
  * array<double>, PQ codes array<int>) → approximate squared L2
  * against the codebook — Σ_m Σ_i (x[m·sub+i] − cb[m][code_m][i])².
  * Accumulation is the exact left-to-right two-level fold of the HOF
  * `aggregate(sequence…)` formulation it replaces (outer acc from
  * 0.0, inner from 0.0 per sub-space), so results are bit-identical
  * and the DuckDB oracle's list-fold twin keeps hash-matching —
  * PropertySpec pins kernel ≡ HOF.
  *
  * Why an expression: ADC is the candidate-scoring hot loop (probed
  * rows × PqM·PqSub flops); the HOF form evaluates ~3·MergeDim
  * interpreted lambdas + element_at calls per row, and spill-to-2
  * indexing doubled the rows it runs over. */
case class PqAdcWith(left: Expression, right: Expression,
                     cb: Array[Array[Array[Double]]])
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"pq_adc_with needs (array<double>, array<int>), got $other")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc_with"

  override protected def nullSafeEval(x: Any, codes: Any): Any = {
    val xs = x.asInstanceOf[ArrayData]
    val cs = codes.asInstanceOf[ArrayData]
    val m = cb.length
    val sub = cb(0)(0).length
    // malformed codes fail loudly and by name, not as an
    // ArrayIndexOutOfBounds deep in eval (the HOF form this kernel
    // replaced yielded a silent null via element_at)
    if (cs.numElements() < m)
      throw new IllegalArgumentException(
        s"pq_adc_with: codes array has ${cs.numElements()} entries, " +
          s"codebook expects $m sub-spaces")
    var acc = 0.0
    var mm = 0
    while (mm < m) {
      val code = cs.getInt(mm)
      if (code < 0 || code >= cb(mm).length)
        throw new IllegalArgumentException(
          s"pq_adc_with: code $code at sub-space $mm outside codebook " +
            s"[0, ${cb(mm).length})")
      val cbj = cb(mm)(code)
      var a = 0.0
      var ii = 0
      while (ii < sub) {
        val d = xs.getDouble(mm * sub + ii) - cbj(ii)
        a = a + d * d
        ii += 1
      }
      acc = acc + a
      mm += 1
    }
    acc
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcWith =
    copy(left = newLeft, right = newRight)
}

object PqAdcWith {
  import org.apache.spark.sql.graftshim.ColumnShim
  def apply(x: Column, codes: Column, cb: Array[Array[Array[Double]]]): Column =
    ColumnShim.column(
      PqAdcWith(ColumnShim.expression(x), ColumnShim.expression(codes), cb))
}
