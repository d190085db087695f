package graft.ops.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused tokenize + shingle + hash: text → array<long> of DISTINCT
  * k-shingle polyHash values, one codegen'd scan — no regex, no
  * intermediate token or shingle strings.
  *
  * Equality contract (unit-enforced): output ==
  * `array_distinct(transform(shinglesOf(tokens(text), k), polyHash))`
  * — i.e. the hash of each window of k tokens joined by a single
  * space, first-occurrence order. It holds because polyHash is a
  * left fold, so hashes compose over concatenation:
  * H(x ++ y) = (H(x)·31^cpLen(y) + H(y)) mod P. The scanner records
  * each token's (hash, 31^cpLen) during the same pass the token
  * grammar is decoded (TokenHashesKernel's grammar), then each
  * window folds per TOKEN instead of per character:
  * acc ← ((acc·31 + 32)·pw_t + H_t) mod P    (32 = ' ').
  * All products stay < (1e9+7)² < 2^63 — ANSI-safe.
  *
  * Why an expression: building 3-token shingle STRINGS via the HOF
  * pipeline is ~|tokens| interpreted array_join(slice(…)) evals per
  * row — measured ~2 s of q24's 3 s at sf0.1. Downstream set ops
  * (minhash, Jaccard) only ever consume the hashes.
  */
object ShingleHashKernel {
  import HashKernel.Mod

  def shingleHashes(s: UTF8String, k: Int): ArrayData = {
    val str = s.toString
    val n = str.length
    val hashes = new java.util.ArrayList[Long]() // per-token H
    val pows = new java.util.ArrayList[Long]()   // per-token 31^cpLen
    var i = 0
    while (i < n) {
      val cp = str.codePointAt(i)
      if (cp < 128 &&
        ((cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z') || (cp >= '0' && cp <= '9'))) {
        var acc = 0L
        var pw = 1L
        var run = true
        while (i < n && run) { // alnum ⊂ BMP: charAt safe
          val c = str.charAt(i)
          if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
            acc = (acc * 31L + c) % Mod
            pw = pw * 31L % Mod
            i += 1
          } else run = false
        }
        hashes.add(acc); pows.add(pw)
      } else if (cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B || cp == '\f' || cp == '\r') {
        i += 1 // ws ⊂ BMP
      } else {
        hashes.add(cp % Mod); pows.add(31L)
        i += Character.charCount(cp)
      }
    }
    val nTok = hashes.size()
    val seen = new java.util.HashSet[Long]()
    val out = new java.util.ArrayList[Long]()
    var w = 0
    while (w <= nTok - k) {
      var acc = hashes.get(w)
      var t = w + 1
      while (t < w + k) {
        acc = (acc * 31L + 32L) % Mod
        acc = acc * pows.get(t) % Mod
        acc = (acc + hashes.get(t)) % Mod
        t += 1
      }
      if (seen.add(acc)) out.add(acc)
      w += 1
    }
    val arr = new Array[Long](out.size())
    var j = 0
    while (j < arr.length) { arr(j) = out.get(j); j += 1 }
    ArrayData.toArrayData(arr)
  }
}

/** text → array<long> of distinct k-shingle polyhashes. */
case class ShingleHashes(child: Expression, k: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType) TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes needs a string argument, got ${child.dataType}")
    else if (k <= 0) TypeCheckResult.TypeCheckFailure(s"k=$k must be positive")
    else TypeCheckResult.TypeCheckSuccess
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override protected def nullSafeEval(input: Any): Any =
    ShingleHashKernel.shingleHashes(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.ops.expressions.ShingleHashKernel.shingleHashes($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {
  import org.apache.spark.sql.graftshim.ColumnShim
  def apply(c: Column, k: Int): Column =
    ColumnShim.column(ShingleHashes(ColumnShim.expression(c), k))
}

/** MinHash signature kernel: array<long> hash set → array<long> of
  * nPerms minima under the engine's permutation family
  *   a_j = (j+1)·PermMult mod P,  b_j = (j·40503 + 1) mod P,
  *   sig_j = min over h of (a_j·h + b_j) mod P
  * — the exact formula q24's HOF pipeline and the DuckDB oracle
  * compute. Inputs are floor-modded into [0, P) first: a no-op for
  * the engine's own polyhashes (already < P), but it keeps the
  * SQL-registered `minhash_sig` total over ARBITRARY array<long>
  * values (a,h < P ⇒ a·h < ~1e18 — no silent Long wrap, ANSI-safe).
  * Empty input → empty signature (callers exclude shingle-less docs;
  * the HOF's array_min(empty) = NULL row never survives a band join
  * either).
  *
  * Why an expression: nPerms·|hs| interpreted lambda evals per row
  * (~56M at sf0.1) — the second-largest interpretation tax in q24.
  */
object MinHashKernel {
  import HashKernel.Mod
  final val PermMult: Long = 2654435761L

  def signature(hs: ArrayData, nPerms: Int): ArrayData = {
    val n = hs.numElements()
    if (n == 0) return ArrayData.toArrayData(Array.emptyLongArray)
    val out = new Array[Long](nPerms)
    var j = 0
    while (j < nPerms) {
      val a = (j + 1) * PermMult % Mod
      val b = (j.toLong * 40503L + 1L) % Mod
      var mn = Long.MaxValue
      var i = 0
      while (i < n) {
        val h = java.lang.Math.floorMod(hs.getLong(i), Mod)
        val v = (a * h + b) % Mod
        if (v < mn) mn = v
        i += 1
      }
      out(j) = mn
      j += 1
    }
    ArrayData.toArrayData(out)
  }
}

/** array<long> → array<long> minhash signature of nPerms entries. */
case class MinHashSig(child: Expression, nPerms: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) =>
      if (nPerms > 0) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"nPerms=$nPerms must be positive")
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig needs array<long>, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    MinHashKernel.signature(input.asInstanceOf[ArrayData], nPerms)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.ops.expressions.MinHashKernel.signature($c, $nPerms)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  import org.apache.spark.sql.graftshim.ColumnShim
  def apply(c: Column, nPerms: Int): Column =
    ColumnShim.column(MinHashSig(ColumnShim.expression(c), nPerms))
}
