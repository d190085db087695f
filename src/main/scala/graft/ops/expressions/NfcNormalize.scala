package graft.ops.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization kernel (shared by interpreted eval and
  * generated code). Canonical composition: combining sequences
  * (e.g. `e` + U+0301) collapse to their precomposed form (`é`), so
  * visually-identical text hashes/compares identically — a
  * prerequisite for exact dedup over web-scraped corpora, where the
  * same string arrives in both encodings (W3C recommends NFC for
  * interchange; crawls contain both).
  *
  * Fast path: `Normalizer.isNormalized` is a scan with no
  * allocation, and real corpora are overwhelmingly already-NFC
  * (all-ASCII trivially so) — the rewrite allocates only for rows
  * that actually need composing.
  *
  * Oracle twin: DuckDB `nfc_normalize(text)` (both sides implement
  * Unicode canonical composition — same UAX #15 definition).
  */
object NfcKernel {
  import java.text.Normalizer

  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}

/** string → string NFC normalization; stays inside whole-stage
  * codegen (capability extension — text cleaning for dedup keys;
  * the reference hashes raw model inputs and would treat the two
  * encodings of `é` as distinct documents). */
case class NfcNormalize(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize needs a string argument, got ${child.dataType}")
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(input: Any): Any =
    NfcKernel.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ops.expressions.NfcKernel.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  import org.apache.spark.sql.graftshim.ColumnShim
  /** Column-API entry point. */
  def apply(c: Column): Column =
    ColumnShim.column(NfcNormalize(ColumnShim.expression(c)))
}
