package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.ops.expressions.TextPolyHash

/** Vector operators (reference surface: model-encode V1 `run.py:42`,
  * scale+concat merge V2 `process.py:126`, weighted pooling V3
  * `run_extra.py:46-48`; extensions: cosine similarity / ANN —
  * SURVEY.md §2.7).
  *
  * All reductions fold LEFT-TO-RIGHT over array indices (Spark
  * `aggregate` HOF == DuckDB `list_reduce` order), so dot products
  * are bit-identical across engines — no tolerance needed.
  * Embeddings arrive as ArrayType(FloatType); every op widens to
  * double FIRST (float→double is exact) and stays there.
  */
object VectorOps {

  /** float[] -> double[] (exact widening). DuckDB: `v::DOUBLE[]`. */
  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Sequential-fold dot product.
    * DuckDB: list_reduce(list_prepend(0.0, list_transform(
    *   list_zip(a::DOUBLE[], b::DOUBLE[]), p -> p[1]*p[2])), (x,y)->x+y)
    * (shared snippet: graft.queries.TextVector.Sql.dot). */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(toDouble(a), toDouble(b), (x, y) => x * y),
      lit(0.0),
      (acc, v) => acc + v)

  /** Sequential-fold squared L2 norm. */
  def normSq(a: Column): Column = dot(a, a)

  /** Cosine similarity with fixed op order: dot / sqrt(na) / sqrt(nb).
    * (Two divisions, NOT dot/(sqrt(na)*sqrt(nb)) — order is part of
    * the cross-engine contract.) */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / sqrt(normSq(a)) / sqrt(normSq(b))

  /** V2 (`process.py:126`): concat(title*w, abstract*(1-w)), w=0.2.
    * DuckDB: list_concat(list_transform(a::DOUBLE[], x -> x*w), ...). */
  def scaleConcat(title: Column, abstr: Column, w: Double): Column =
    concat(
      transform(toDouble(title), x => x * lit(w)),
      transform(toDouble(abstr), x => x * lit(1.0 - w)))

  /** Signed-random-projection (SRP) signature bits for cosine LSH:
    * bit i = 1 iff dot(v, H_i) > 0 over DETERMINISTIC pseudo-random
    * hyperplanes H_i[d] = hash(i·dim+d) scaled to [-1,1) — the same
    * seeded-hash family as [[embed]], so the DuckDB oracle can
    * reproduce the planes exactly. Fixed fold order per bit. */
  def srpBits(v: Column, nBits: Int, dim: Int): Column =
    transform(
      sequence(lit(0L), lit(nBits.toLong - 1)),
      i => when(
        aggregate(
          zip_with(toDouble(v), sequence(lit(0L), lit(dim.toLong - 1)),
            (x, dd) => x *
              (((i * dim + dd + 1) * lit(2654435761L) % lit(1000000007L))
                .cast("double") / lit(1000000007.0) * lit(2.0) - lit(1.0))),
          lit(0.0), (acc, p) => acc + p) > 0, lit(1L)).otherwise(lit(0L)))

  /** Pack an array of 0/1 bit longs into nBands integer band values
    * (bandBits bits each, little-endian within the band) — LSH
    * bucket keys. pow(2,p) is exact in double for p ≤ 52.
    * Range audit (r17): every ±coordinate here is (h mod P)/P·2−1 —
    * the divisor IS the reducing modulus in the same expression, so
    * the scaling cannot drift independently (MixRangeSpec sweep). */
  def packBands(bits: Column, nBands: Int, bandBits: Int): Column =
    transform(
      sequence(lit(0L), lit(nBands.toLong - 1)),
      b => aggregate(
        sequence(lit(0L), lit(bandBits.toLong - 1)),
        lit(0L),
        (acc, p) => acc +
          element_at(bits, (b * bandBits + p + 1).cast("int")) *
          pow(lit(2.0), p.cast("double")).cast("long")))

  /** HOF reference implementation of
    * [[graft.ops.expressions.FeatureEmbed]] (random-feature
    * embedding of an array<long> hash set) — kept only for the
    * bit-identity unit test; anything hot uses the codegen kernel. */
  def featureEmbedRef(hs: Column, dim: Int): Column =
    transform(
      sequence(lit(0L), lit(dim.toLong - 1)),
      i => aggregate(hs, lit(0.0), (acc, h) =>
        // parens matter: acc + (x/P·2 − 1), the kernel's IEEE order
        acc + (((h + (i + 1) * lit(2654435761L)) % lit(1000000007L))
          .cast("double") / lit(1000000007.0) * lit(2.0) - lit(1.0))))

  /** V1 stand-in embedder: deterministic seeded-hash vector in
    * [-1, 1)^dim (the reference's InstructorXL is a model artifact;
    * the interface is what we re-express — SURVEY.md §7.1).
    *   fp    = polyHash(text)            (TextPolyHash, < 1e9)
    *   h_i   = (fp + (i+1) * 2654435761) mod 1e9+7   (int64-safe)
    *   v_i   = h_i / 1e9+7 * 2 - 1
    * DuckDB twin: list_transform(range(0, dim), i -> ...).
    */
  def embed(text: Column, dim: Int): Column = {
    val fp = TextPolyHash(text)
    transform(
      sequence(lit(0L), lit(dim.toLong - 1)),
      i => {
        val h = (fp + (i + 1) * lit(2654435761L)) % lit(1000000007L)
        h.cast("double") / lit(1000000007.0) * lit(2.0) - lit(1.0)
      })
  }
}
