package graft.ops.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** SimHash kernel: 64-bit document fingerprint from an array of
  * token hashes, returned as 4 × 16-bit band values (ready for LSH
  * bucketing; the full 64-bit value is never assembled, so no sign /
  * ANSI-overflow trap at bit 63).
  *
  * Bit i (i = band*16 + pos) is set iff
  *   Σ_tokens ( ((a_i·h + b_i) mod P) & 1 ) · 2 − 1  >  0,
  *   a_i = (i+1)·2654435761 mod P,  b_i = i·40503 + 1 mod P,  P = 1e9+7.
  * Per-bit rehashing (rather than `h >> i`) matters because polyHash
  * values only span ~30 bits. Exactly re-expressible in DuckDB SQL
  * (the q29 oracle twin).
  *
  * Capability extension over the reference (its only identity is
  * exact positional equality, /root/reference/process.py:21-24);
  * standard simhash construction from the public literature.
  */
object SimHashKernel {
  final val Mod: Long = 1000000007L
  final val PermMult: Long = 2654435761L
  final val NumBands = 4
  final val BandBits = 16

  def bands(hs: ArrayData): ArrayData = {
    val n = hs.numElements()
    val out = new Array[Long](NumBands)
    var b = 0
    while (b < NumBands) {
      var bandVal = 0L
      var p = 0
      while (p < BandBits) {
        val i = b * BandBits + p
        val a = ((i + 1) * PermMult) % Mod
        val c = (i * 40503L + 1) % Mod
        var s = 0L
        var t = 0
        while (t < n) {
          s += (((a * hs.getLong(t) + c) % Mod) & 1L) * 2 - 1
          t += 1
        }
        if (s > 0) bandVal |= (1L << p)
        p += 1
      }
      out(b) = bandVal
      b += 1
    }
    ArrayData.toArrayData(out)
  }
}

/** Codegen'd Catalyst expression: array<long> token hashes →
  * array<long> of 4 simhash band values. */
case class SimHashBands(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash_bands needs array<bigint>, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "simhash_bands"

  override protected def nullSafeEval(input: Any): Any =
    SimHashKernel.bands(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ops.expressions.SimHashKernel.bands($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHashBands =
    copy(child = newChild)
}

object SimHashBands {
  import org.apache.spark.sql.graftshim.ColumnShim
  def apply(c: Column): Column =
    ColumnShim.column(SimHashBands(ColumnShim.expression(c)))
}
