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

  /** Two independent polynomial hashes folded in ONE code-point scan,
    * packed as h1·mod2 + h2 — half of the 128-bit exact-dup
    * fingerprint (the other half uses a disjoint (base, mod) family).
    * Bounds keep every intermediate inside int64 under ANSI mode:
    * acc < mod ≤ 2³¹−1, acc·base ≤ (2³¹−1)·65599 < 2⁴⁸, and the pack
    * h1·mod2 + h2 < 2³¹·2³¹ < 2⁶³ — same arithmetic is exactly
    * re-playable in DuckDB BIGINT (TextVector.Sql.polyHashPacked). */
  def polyHashPacked(s: UTF8String, base1: Long, mod1: Long,
                     base2: Long, mod2: Long): Long = {
    val str = s.toString
    var a1 = 0L
    var a2 = 0L
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      a1 = (a1 * base1 + cp) % mod1
      a2 = (a2 * base2 + cp) % mod2
      i += Character.charCount(cp)
    }
    a1 * mod2 + a2
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

/** Two independent polynomial hashes over the same string, folded in
  * one code-point scan and packed into a single BIGINT (h1·mod2+h2).
  * Two instances with disjoint (base, mod) families form the 128-bit
  * exact-dup fingerprint ([[graft.ops.TextOps.fingerprintHi]] /
  * `fingerprintLo`) — the keyspace widening the single ~2³⁰-range
  * polyhash needs before a 100 TB corpus: one 30-bit hash
  * birthday-collides from ~10^4.5 documents, and a false "exact"
  * verdict silently DROPS a document, so exact-dup keys must never
  * ride on it alone. ~123 combined bits put the first expected
  * collision past 10¹⁸ documents.
  */
case class TextPolyHashPacked(child: Expression, base1: Long, mod1: Long,
                              base2: Long, mod2: Long)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType) TypeCheckResult.TypeCheckFailure(
      s"text_poly_hash_packed needs a string argument, got ${child.dataType}")
    // the int64-safety envelope documented on HashKernel.polyHashPacked
    else if (mod1 <= 0 || mod1 > 2147483647L || mod2 <= 0 || mod2 > 2147483647L)
      TypeCheckResult.TypeCheckFailure(s"mods must be in (0, 2^31): $mod1, $mod2")
    else if (base1 <= 0 || base1 > 65599L || base2 <= 0 || base2 > 65599L)
      TypeCheckResult.TypeCheckFailure(s"bases must be in (0, 65599]: $base1, $base2")
    else TypeCheckResult.TypeCheckSuccess
  override def dataType: DataType = LongType
  override def prettyName: String = "text_poly_hash_packed"

  override protected def nullSafeEval(input: Any): Any =
    HashKernel.polyHashPacked(input.asInstanceOf[UTF8String],
      base1, mod1, base2, mod2)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.ops.expressions.HashKernel.polyHashPacked($c, ${base1}L, ${mod1}L, ${base2}L, ${mod2}L)")

  override protected def withNewChildInternal(newChild: Expression): TextPolyHashPacked =
    copy(child = newChild)
}

object TextPolyHashPacked {
  import org.apache.spark.sql.graftshim.ColumnShim
  def apply(c: Column, base1: Long, mod1: Long,
            base2: Long, mod2: Long): Column =
    ColumnShim.column(TextPolyHashPacked(
      ColumnShim.expression(c), base1, mod1, base2, mod2))
}
