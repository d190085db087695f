package graft.ops.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Streaming chunk scanner: emits (pos, chunk) pairs lazily, one
  * ≤n-token window at a time, without ever materializing the token
  * array or the chunk list for the whole document. Token grammar is
  * EXACTLY the engine's (TextOps.TokenPattern — maximal ASCII-alnum
  * runs, else any single non-whitespace code point, Java `\s`
  * whitespace set); chunks re-join their tokens with a single
  * space, identical to `TextOps.chunksOf` (= the reference's
  * `' '.join(chunk)`, `/root/reference/run_extra.py:64-74`).
  */
object ChunkGenKernel {
  private def isAlnum(c: Char): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
  private def isWs(cp: Int): Boolean =
    cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B || cp == '\f' || cp == '\r'

  def chunkIterator(s: UTF8String, n: Int): Iterator[(Int, UTF8String)] =
    new Iterator[(Int, UTF8String)] {
      private val str = s.toString
      private val len = str.length
      private var i = 0
      private var pos = 0

      // append the next token to sb (with a leading space unless
      // first); false at end of input
      private def appendToken(sb: java.lang.StringBuilder, first: Boolean): Boolean = {
        while (i < len && isWs(str.codePointAt(i))) i += Character.charCount(str.codePointAt(i))
        if (i >= len) return false
        if (!first) sb.append(' ')
        val cp = str.codePointAt(i)
        if (isAlnum(str.charAt(i))) { // alnum ⊂ BMP: charAt safe
          while (i < len && isAlnum(str.charAt(i))) { sb.append(str.charAt(i)); i += 1 }
        } else {
          sb.appendCodePoint(cp); i += Character.charCount(cp)
        }
        true
      }

      private var nextChunk: (Int, UTF8String) = _
      private def advance(): Unit = {
        val sb = new java.lang.StringBuilder
        var k = 0
        while (k < n && appendToken(sb, first = k == 0)) k += 1
        nextChunk =
          if (k == 0) null
          else { val c = (pos, UTF8String.fromString(sb.toString)); pos += 1; c }
      }
      advance()

      override def hasNext: Boolean = nextChunk != null
      override def next(): (Int, UTF8String) = {
        val c = nextChunk; advance(); c
      }
    }
}

/** chunk_explode(text, n): Generator (UDTF) form of the chunker —
  * one output row `(pos, chunk)` per ≤n-token window of `text`,
  * produced lazily. Row-identical to
  * `posexplode(TextOps.chunksOf(tokens(text), n))` (property-tested
  * in GeneratorSpec), but the long-document memory profile differs:
  * the HOF+posexplode form materializes the full token array AND the
  * full chunk array per row before exploding, while this generator
  * holds one chunk at a time — the shape that survives
  * pathological multi-MB documents in a 100-TB corpus. Plans into
  * GenerateExec, which pipelines rows into the downstream stage
  * (eval-mode generator: one interpreted call per INPUT row, then
  * kernel-speed scanning — the per-row regex/lambda tax of the HOF
  * form is what it avoids).
  *
  * DuckDB oracle twin: `TextVector.Sql.chunks` + positional unnest.
  */
case class ChunkExplode(child: Expression, n: Int)
  extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType = new StructType()
    .add("pos", IntegerType, nullable = false)
    .add("chunk", StringType, nullable = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType =>
      if (n > 0) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"chunk size n=$n must be positive")
    case other =>
      TypeCheckResult.TypeCheckFailure(s"chunk_explode needs string, got $other")
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Iterator.empty
    else ChunkGenKernel.chunkIterator(v.asInstanceOf[UTF8String], n).map {
      case (p, c) => InternalRow(p, c)
    }
  }

  override def prettyName: String = "chunk_explode"
  override protected def withNewChildInternal(newChild: Expression): ChunkExplode =
    copy(child = newChild)
}

object ChunkExplode {
  import org.apache.spark.sql.graftshim.ColumnShim
  /** Column form; alias the two generated columns with
    * `.as(Seq("pos", "chunk"))` (or rely on the element-schema
    * names). */
  def apply(text: Column, n: Int): Column =
    ColumnShim.column(ChunkExplode(ColumnShim.expression(text), n))
}
