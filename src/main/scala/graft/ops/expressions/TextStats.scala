package graft.ops.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused text analytics: one scan of the text producing the q26
  * stats struct — token count, sentence count, language argmax,
  * quality score. Each field reproduces its HOF/oracle definition
  * EXACTLY (unit-enforced):
  *  - tokens: the TokenPattern grammar (TokenHashesKernel's scanner);
  *  - sentences: segments of `split(text, SentencePattern)` (greedy
  *    `[.!?]+[ws]*` delimiters, trailing empties kept) that contain
  *    any non-SPACE character (Spark `trim` strips 0x20 only);
  *  - lang_pred: per-dict token hit counts, argmax with the fixed
  *    en>de>fr>es tie order, 'und' on all-zero;
  *  - quality: 0.4·min(n/100,1) + 0.3·(distinct/n) + 0.3·(stop/n)
  *    in that exact IEEE association (NaN for n=0, same both
  *    engines; rounding stays a column op outside).
  *
  * Why an expression: four separate interpreted HOF pipelines over
  * the same tokens (two of them re-filtering per dictionary) were
  * most of q26's ~1 s at sf0.1, on the scan's single split — and a
  * repartition costs more than this narrow pass saves.
  */
object TextStatsKernel {
  import graft.ops.TextOps

  private val dictLangs: Array[UTF8String] =
    TextOps.LangDicts.map(d => UTF8String.fromString(d._1)).toArray
  private val dictSets: Array[java.util.HashSet[String]] =
    TextOps.LangDicts.map { case (_, ws) =>
      val s = new java.util.HashSet[String]()
      ws.foreach(s.add)
      s
    }.toArray
  private val und = UTF8String.fromString("und")

  // same grammar predicates as TokenHashesKernel (int code points)
  private def isAlnum(cp: Int): Boolean =
    (cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z') || (cp >= '0' && cp <= '9')
  private def isWs(cp: Int): Boolean =
    cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B || cp == '\f' || cp == '\r'

  def stats(s: UTF8String): InternalRow = {
    val str = s.toString
    val n = str.length

    // ---- token pass: count, distinct set, per-dict hits ----
    var nTok = 0L
    val distinct = new java.util.HashSet[String]()
    val hits = new Array[Long](dictSets.length)
    var i = 0
    while (i < n) {
      val cp = str.codePointAt(i)
      var tok: String = null
      if (isAlnum(cp)) {
        val st = i
        while (i < n && isAlnum(str.charAt(i))) i += 1 // alnum ⊂ BMP
        tok = str.substring(st, i)
      } else if (isWs(cp)) {
        i += Character.charCount(cp)
      } else {
        val st = i
        i += Character.charCount(cp)
        tok = str.substring(st, i)
      }
      if (tok != null) {
        nTok += 1
        distinct.add(tok)
        var d = 0
        while (d < dictSets.length) {
          if (dictSets(d).contains(tok)) hits(d) += 1
          d += 1
        }
      }
    }

    // ---- sentence pass: greedy [.!?]+[ws]* delimiters ----
    var nSent = 0L
    var segHasContent = false
    i = 0
    while (i < n) {
      val c = str.charAt(i)
      if (c == '.' || c == '!' || c == '?') {
        if (segHasContent) nSent += 1
        segHasContent = false
        while (i < n && { val c2 = str.charAt(i); c2 == '.' || c2 == '!' || c2 == '?' }) i += 1
        while (i < n && isWs(str.charAt(i))) i += 1
      } else {
        if (c != ' ') segHasContent = true
        i += 1
      }
    }
    if (segHasContent) nSent += 1

    // ---- argmax with fixed tie order; quality in exact IEEE order ----
    var best = 0L
    var d = 0
    while (d < hits.length) { if (hits(d) > best) best = hits(d); d += 1 }
    var pred = und
    if (best > 0) {
      d = 0
      var done = false
      while (d < hits.length && !done) {
        if (hits(d) == best) { pred = dictLangs(d); done = true }
        d += 1
      }
    }
    val nd = nTok.toDouble
    val quality = 0.4 * math.min(nd / 100.0, 1.0) +
      0.3 * (distinct.size().toDouble / nd) +
      0.3 * (hits(0).toDouble / nd)

    new GenericInternalRow(Array[Any](nTok, nSent, pred, quality))
  }
}

/** string → struct<n_tokens bigint, n_sentences bigint,
  * lang_pred string, quality double>. */
case class TextStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"text_stats needs a string argument, got ${child.dataType}")

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_sentences", LongType, nullable = false),
    StructField("lang_pred", StringType, nullable = false),
    StructField("quality", DoubleType, nullable = false)))
  override def prettyName: String = "text_stats"

  override protected def nullSafeEval(input: Any): Any =
    TextStatsKernel.stats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.ops.expressions.TextStatsKernel.stats($c)")

  override protected def withNewChildInternal(newChild: Expression): TextStats =
    copy(child = newChild)
}

object TextStats {
  import org.apache.spark.sql.graftshim.ColumnShim
  def apply(c: Column): Column =
    ColumnShim.column(TextStats(ColumnShim.expression(c)))
}
