package graft.ops.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
  * SIGMOD'03 — the MOSS algorithm): text → the SORTED DISTINCT set
  * of window-minimum k-shingle polyhashes, one codegen'd scan.
  *
  * Semantics (the oracle states the same thing as SQL window
  * functions; WinnowSpec pins the two row-for-row):
  *   - g[0..m-1] = positional k-token-shingle polyhashes, m =
  *     nTokens-k+1 (ShingleHashKernel's composition identity: g[i] ==
  *     polyHash of the i-th window of k tokens joined by ' '), in
  *     POSITION order, duplicates kept — winnowing needs positions,
  *     unlike the minhash path's distinct set;
  *   - fingerprints = { min(g[i..i+w-1]) : 0 <= i <= m-w }, i.e. the
  *     minimum of every window of w consecutive shingle hashes; for
  *     0 < m < w the single truncated window [0,m) contributes
  *     min(g) (a short document still gets one fingerprint); m <= 0
  *     → empty;
  *   - returned sorted ascending, distinct (set semantics — the
  *     guarantee downstream joins need; also makes the value
  *     deterministic and engine-comparable byte-for-byte).
  *
  * Why winnowing beats "every k-shingle" for overlap detection at
  * corpus scale: the fingerprint DENSITY is 2/(w+1) (~0.4 at w=4)
  * instead of 1, yet any shared run of w+k-1 tokens between two
  * documents is GUARANTEED to share at least one selected
  * fingerprint (the winnowing guarantee) — recall 1.0 on long-enough
  * overlaps with a ~2.5× smaller index, and both documents pick the
  * SAME fingerprint for a shared span because the selection is a
  * pure function of content (local minima), not position.
  *
  * The window minima are computed with a monotonically-increasing
  * index deque — O(m) total, O(w) extra state — not the naive
  * O(m·w) rescan; at 100 TB the shingle stream per executor is the
  * hot loop.
  */
object WinnowKernel {
  import HashKernel.Mod

  def fingerprints(s: UTF8String, k: Int, w: Int): ArrayData = {
    // pass 1 over code points: per-token (polyhash, 31^cpLen), the
    // TokenHashesKernel grammar (maximal ASCII-alnum runs | any
    // single non-ws code point; ws = Java \s)
    val str = s.toString
    val n = str.length
    val hashes = new java.util.ArrayList[Long]()
    val pows = new java.util.ArrayList[Long]()
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
    val m = nTok - k + 1
    if (m <= 0) return ArrayData.toArrayData(Array.emptyLongArray)

    // pass 2: positional shingle hashes via the concatenation
    // identity H(x++" "++y) = ((H(x)·31+32)·31^cpLen(y)+H(y)) mod P
    val g = new Array[Long](m)
    var s0 = 0
    while (s0 < m) {
      var acc = hashes.get(s0)
      var t = s0 + 1
      while (t < s0 + k) {
        acc = (acc * 31L + 32L) % Mod
        acc = acc * pows.get(t) % Mod
        acc = (acc + hashes.get(t)) % Mod
        t += 1
      }
      g(s0) = acc
      s0 += 1
    }

    // pass 3: sliding-window minima via index deque (front = index of
    // the current window's minimum; indices in the deque are strictly
    // increasing with strictly increasing g — ties keep the EARLIEST
    // index, which changes nothing: the min VALUE is what's emitted)
    val out = new java.util.HashSet[Long]()
    val deque = new Array[Int](m)
    var head = 0
    var tail = 0 // exclusive
    var j = 0
    while (j < m) {
      while (tail > head && g(deque(tail - 1)) >= g(j)) tail -= 1
      deque(tail) = j; tail += 1
      if (j >= w && deque(head) <= j - w) head += 1
      // first full window ends at j = w-1; a shorter-than-w stream
      // emits its single truncated window's min at the last element
      if (j >= w - 1 || j == m - 1) out.add(g(deque(head)))
      j += 1
    }
    val arr = new Array[Long](out.size())
    val it = out.iterator()
    var a = 0
    while (it.hasNext) { arr(a) = it.next(); a += 1 }
    java.util.Arrays.sort(arr)
    ArrayData.toArrayData(arr)
  }
}

/** text → sorted distinct array<long> of winnowing fingerprints
  * (k-token shingles, window w). */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType) TypeCheckResult.TypeCheckFailure(
      s"winnow_fingerprints needs a string argument, got ${child.dataType}")
    else if (k <= 0 || w <= 0) TypeCheckResult.TypeCheckFailure(
      s"k=$k and w=$w must be positive")
    else TypeCheckResult.TypeCheckSuccess
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprints"

  override protected def nullSafeEval(input: Any): Any =
    WinnowKernel.fingerprints(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.ops.expressions.WinnowKernel.fingerprints($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

object WinnowFingerprints {
  import org.apache.spark.sql.graftshim.ColumnShim
  def apply(c: Column, k: Int, w: Int): Column =
    ColumnShim.column(WinnowFingerprints(ColumnShim.expression(c), k, w))
}
