package graft.ops.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Character-distribution entropy of a string, in MICRO-nats:
  * H = −Σ_c p_c·ln p_c over the code-point histogram, each term
  * micro-quantized (floor(t·1e6 + 0.5)) BEFORE an integer sum — so
  * the total is order-free and a SQL engine replaying the same
  * per-character terms lands on the same int64 (the engine's shared
  * exact-sum convention, graft.ops.Determinism).
  *
  * Why a kernel and not a DataFrame chain: Spark has no per-string
  * histogram builtin, so the declarative formulation is
  * explode(chars) → groupBy(doc, char) — a corpus-CHARACTER-sized
  * shuffle for a per-row scalar. This computes the histogram in one
  * pass inside whole-stage codegen; the hot path stays narrow
  * (same argument as TokenHashes vs the regex+transform chain).
  *
  * Cross-engine ln note: both engines evaluate p = c/n identically
  * (exact double division of small int64s); ln differs by ≤ 1 ulp
  * between libms, which flips a micro-quantized term only when
  * p·ln p·1e6 + 0.5 sits within ~1e-10 of an integer — verified
  * absent on the gate corpora by the oracle hash gate itself (the
  * q43/q72 libm argument at term, not rank, granularity).
  *
  * Empty string → 0 (a single-character string likewise: p = 1,
  * ln 1 = 0 — minimum entropy, the degenerate-repetition signal).
  */
object CharEntropyKernel {

  def entropyMicro(s: UTF8String): Long = {
    val str = s.toString
    val counts = new scala.collection.mutable.LongMap[Long]()
    var i = 0
    var n = 0L
    while (i < str.length) {
      val cp = str.codePointAt(i)
      val k = cp.toLong
      counts.update(k, counts.getOrElse(k, 0L) + 1L)
      n += 1L
      i += Character.charCount(cp)
    }
    if (n == 0L) return 0L
    var acc = 0L
    val it = counts.valuesIterator
    while (it.hasNext) {
      val c = it.next()
      val p = c.toDouble / n.toDouble
      acc += math.floor(-(p * math.log(p)) * 1e6 + 0.5).toLong
    }
    acc
  }
}

case class CharEntropy(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"char_entropy needs a string argument, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "char_entropy"

  override protected def nullSafeEval(input: Any): Any =
    CharEntropyKernel.entropyMicro(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.ops.expressions.CharEntropyKernel.entropyMicro($c)")

  override protected def withNewChildInternal(newChild: Expression): CharEntropy =
    copy(child = newChild)
}

object CharEntropy {
  import org.apache.spark.sql.graftshim.ColumnShim
  def apply(c: Column): Column =
    ColumnShim.column(CharEntropy(ColumnShim.expression(c)))
}
