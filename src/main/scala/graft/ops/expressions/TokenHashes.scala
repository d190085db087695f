package graft.ops.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused tokenize + hash: text → array<long> of per-token polyHash
  * values, in one codegen'd scan — no regex engine, no intermediate
  * token-string array.
  *
  * The scanner implements EXACTLY the engine's token grammar
  * (TextOps.TokenPattern = `([A-Za-z0-9]+|[^A-Za-z0-9\s])`): maximal
  * ASCII-alnum runs, else any single non-whitespace code point, with
  * Java's `\s` = [ \t\n\x0B\f\r]. TokenHashesKernel is
  * property-tested equal to `transform(tokens(text), polyHash)`
  * (TextOpsSpec), and the hash is HashKernel.polyHash per token —
  * the same value the DuckDB oracle computes from the regex twin.
  */
object TokenHashesKernel {
  private def isAlnum(cp: Int): Boolean =
    (cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z') || (cp >= '0' && cp <= '9')
  private def isWs(cp: Int): Boolean =
    cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B || cp == '\f' || cp == '\r'

  def tokenHashes(s: UTF8String): ArrayData = {
    val str = s.toString
    val n = str.length
    val out = new java.util.ArrayList[Long]()
    var i = 0
    while (i < n) {
      val cp = str.codePointAt(i)
      if (isAlnum(cp)) {
        var acc = 0L
        while (i < n && isAlnum(str.charAt(i))) { // alnum ⊂ BMP: charAt safe
          acc = (acc * 31L + str.charAt(i)) % HashKernel.Mod
          i += 1
        }
        out.add(acc)
      } else if (isWs(cp)) {
        i += Character.charCount(cp)
      } else {
        out.add(cp % HashKernel.Mod)
        i += Character.charCount(cp)
      }
    }
    val arr = new Array[Long](out.size())
    var j = 0
    while (j < arr.length) { arr(j) = out.get(j); j += 1 }
    ArrayData.toArrayData(arr)
  }
}

case class TokenHashes(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"token_hashes needs a string argument, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "token_hashes"

  override protected def nullSafeEval(input: Any): Any =
    TokenHashesKernel.tokenHashes(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.ops.expressions.TokenHashesKernel.tokenHashes($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenHashes =
    copy(child = newChild)
}

object TokenHashes {
  import org.apache.spark.sql.graftshim.ColumnShim
  def apply(c: Column): Column =
    ColumnShim.column(TokenHashes(ColumnShim.expression(c)))
}
