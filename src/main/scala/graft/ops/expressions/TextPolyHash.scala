package graft.ops.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static hash kernel shared by interpreted eval and generated code.
  * Polynomial rolling hash over Unicode code points:
  *   acc := (acc * 31 + codePoint) mod 1_000_000_007
  * Chosen because it is exactly re-expressible in ANSI SQL
  * (DuckDB oracle: list_reduce over regexp_extract_all codepoints),
  * unlike Spark's Murmur3 `hash()`. Result is in [0, 1e9), so
  * downstream int64 arithmetic (minhash perms: h * a + b with
  * a,b < 1e9) cannot overflow — this matters under ANSI mode where
  * overflow throws instead of wrapping.
  */
object HashKernel {
  final val Mod: Long = 1000000007L

  def polyHash(s: UTF8String): Long = {
    // Iterate code points of the decoded string. Testdata is ASCII,
    // but the definition must hold for any input to stay
    // oracle-consistent (DuckDB's ascii() yields full code points).
    val str = s.toString
    var acc = 0L
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      acc = (acc * 31L + cp) % Mod
      i += Character.charCount(cp)
    }
    acc
  }
}

/** Custom Catalyst expression: stays inside whole-stage codegen
  * (no UDF serialization, no row-at-a-time Scala closure).
  * Equivalent of reference's content hashing needs (dedup keys,
  * fingerprints — capability extension over
  * /root/reference/process.py's positional identity).
  */
case class TextPolyHash(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"text_poly_hash needs a string argument, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "text_poly_hash"

  override protected def nullSafeEval(input: Any): Any =
    HashKernel.polyHash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ops.expressions.HashKernel.polyHash($c)")

  override protected def withNewChildInternal(newChild: Expression): TextPolyHash =
    copy(child = newChild)
}

object TextPolyHash {
  import org.apache.spark.sql.graftshim.ColumnShim
  /** Column-API entry point. */
  def apply(c: Column): Column =
    ColumnShim.column(TextPolyHash(ColumnShim.expression(c)))
}
