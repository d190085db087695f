package graft.ops.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Total syllable estimate of a text: Σ over tokens of
  * max(1, maximal-[aeiouy]+-run count) — the standard vowel-group
  * heuristic the q148 Flesch profile consumes, fused into one scan.
  * Reproduces the HOF definition EXACTLY (unit-enforced by the q148
  * parity spec):
  *   aggregate(transform(tokens(text), t ->
  *     greatest(len(regexp_extract_all(lower(t), '[aeiouy]+')), 1)),
  *     0, +)
  * with tokens per the TokenPattern grammar (TokenHashesKernel's
  * scanner): an alnum run contributes max(1, its vowel runs) —
  * case-insensitive, so `lower` never needs to materialize — and a
  * single-symbol token contributes 1 (no ASCII vowel, floored).
  *
  * Why a kernel: the HOF lambda chain is interpreted per TOKEN
  * (a regexp match per word, no cross-iteration CSE); this keeps the
  * hot path inside whole-stage codegen and makes the cost one linear
  * byte scan (the TextStats argument — at sf0.1 the parquet scan
  * dominates either way, but the lambda's cost grows with token
  * count while the kernel's grows with bytes).
  */
object SyllableCountKernel {

  private def isAlnum(cp: Int): Boolean =
    (cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z') || (cp >= '0' && cp <= '9')
  private def isWs(cp: Int): Boolean =
    cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B || cp == '\f' || cp == '\r'
  private def isVowel(c: Char): Boolean = c match {
    case 'a' | 'e' | 'i' | 'o' | 'u' | 'y' |
         'A' | 'E' | 'I' | 'O' | 'U' | 'Y' => true
    case _ => false
  }

  def syllables(s: UTF8String): Long = {
    val str = s.toString
    val n = str.length
    var syl = 0L
    var i = 0
    while (i < n) {
      val cp = str.codePointAt(i)
      if (isAlnum(cp)) {
        var runs = 0L
        var inV = false
        while (i < n && isAlnum(str.charAt(i))) { // alnum ⊂ BMP: charAt safe
          val v = isVowel(str.charAt(i))
          if (v && !inV) runs += 1L
          inV = v
          i += 1
        }
        syl += (if (runs == 0L) 1L else runs)
      } else if (isWs(cp)) {
        i += Character.charCount(cp)
      } else {
        syl += 1L // symbol token: zero vowel groups, floored to 1
        i += Character.charCount(cp)
      }
    }
    syl
  }
}

case class SyllableCount(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"syllable_count needs a string argument, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "syllable_count"

  override protected def nullSafeEval(input: Any): Any =
    SyllableCountKernel.syllables(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.ops.expressions.SyllableCountKernel.syllables($c)")

  override protected def withNewChildInternal(newChild: Expression): SyllableCount =
    copy(child = newChild)
}

object SyllableCount {
  import org.apache.spark.sql.graftshim.ColumnShim
  def apply(c: Column): Column =
    ColumnShim.column(SyllableCount(ColumnShim.expression(c)))
}
