package graft.ops.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One BPE merge application: replace every adjacent (a, b) symbol
  * pair with the fused symbol a+b, scanning left-to-right greedily
  * (after a merge the cursor skips PAST the fused pair — "aaa" under
  * merge (a,a) becomes [aa, a], the standard BPE convention). One
  * tight JVM pass per row; the symbols array is a tokenized word
  * (bounded length), so CodegenFallback costs nothing measurable.
  */
object BpeMergeKernel {
  def merge(arr: ArrayData, a: UTF8String, b: UTF8String): ArrayData = {
    val n = arr.numElements()
    val out = new java.util.ArrayList[UTF8String](n)
    var i = 0
    while (i < n) {
      val cur = arr.getUTF8String(i)
      if (i + 1 < n && cur.equals(a) && arr.getUTF8String(i + 1).equals(b)) {
        out.add(UTF8String.concat(a, b))
        i += 2
      } else {
        out.add(cur)
        i += 1
      }
    }
    ArrayData.toArrayData(out.toArray(new Array[UTF8String](out.size())))
  }
}

/** array<string> symbols → array<string> with one (a, b) merge
  * applied. */
case class BpeMerge(child: Expression, a: String, b: String)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_merge needs array<string>, got $other")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_merge"

  @transient private lazy val ua = UTF8String.fromString(a)
  @transient private lazy val ub = UTF8String.fromString(b)

  override protected def nullSafeEval(input: Any): Any =
    BpeMergeKernel.merge(input.asInstanceOf[ArrayData], ua, ub)

  override protected def withNewChildInternal(newChild: Expression): BpeMerge =
    copy(child = newChild)
}

object BpeMerge {
  import org.apache.spark.sql.graftshim.ColumnShim
  def apply(c: Column, a: String, b: String): Column =
    ColumnShim.column(BpeMerge(ColumnShim.expression(c), a, b))
}

/** Apply a whole TRAINED merge table in training order — the BPE
  * ENCODE step. Each merge was learned on the corpus state produced
  * by fully applying its predecessors, so in-order application
  * reproduces the training-state tokenization (the merge-rank
  * convention HF tokenizers serialize). One kernel invocation per
  * row instead of a |merges|-deep expression chain. */
case class BpeApply(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_apply needs array<string>, got $other")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_apply"

  @transient private lazy val table: Array[(UTF8String, UTF8String)] =
    merges.map { case (a, b) =>
      (UTF8String.fromString(a), UTF8String.fromString(b))
    }.toArray

  override protected def nullSafeEval(input: Any): Any = {
    var cur = input.asInstanceOf[ArrayData]
    var i = 0
    while (i < table.length) {
      cur = BpeMergeKernel.merge(cur, table(i)._1, table(i)._2)
      i += 1
    }
    cur
  }

  override protected def withNewChildInternal(newChild: Expression): BpeApply =
    copy(child = newChild)
}

object BpeApply {
  import org.apache.spark.sql.graftshim.ColumnShim
  def apply(c: Column, merges: Seq[(String, String)]): Column =
    ColumnShim.column(BpeApply(ColumnShim.expression(c), merges))
}
