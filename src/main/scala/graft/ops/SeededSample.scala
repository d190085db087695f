package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The engine's seeded pseudo-random sampling device, shared by the
  * oracle-gated ANN queries (graft.queries.TextVector) and the
  * persisted index build (graft.pipeline.AnnIndex) so the two can
  * never drift: rank rows by the hash permutation (id·Mult) mod Mod
  * and keep the first n. Deterministic (a SQL engine replays it as
  * `ORDER BY (id*Mult)%Mod, id LIMIT n`), unbiased w.r.t. id order —
  * the id-prefix slice it replaced contained the evaluated queries
  * and flattered measured recall. The plan is a bounded top-N
  * (TakeOrderedAndProject: per-partition heads + driver merge,
  * pinned in ScaleSpec), never a global sort — at 1e9 rows the
  * sample costs one scan, no shuffle. */
object SeededSample {

  /** Knuth multiplicative-hash constant — also the permutation
    * multiplier of the MinHash family kernels. */
  val Mult = 2654435761L
  val Mod  = 1000000007L

  /** The n sample rows of `df`, selected by hash rank. Row order of
    * the RESULT is the hash order; callers that need a pinned fold
    * order re-sort on the id.
    *
    * Range audit (r17): RANK-based — membership depends only on the
    * hash ORDER, never its range; no threshold scaling to drift
    * (MixRangeSpec's site sweep). The affine hash's exact [0, P)
    * range is itself pinned there.
    *
    * The rank reduces the id into the modular field BEFORE the
    * multiply: the raw product id·Mult wraps Long for ids ≳3.5e9
    * (negative ranks; an error under spark.sql.ansi.enabled), while
    * (id mod Mod)·Mult ≤ (Mod−1)·Mult ≈ 2.65e18 < Long.MaxValue —
    * and equals the unwrapped hash by modular arithmetic, so sample
    * membership is unchanged for every id the raw form handled. Same
    * guard pattern as the split hashes in graft.queries.Clusters. */
  def top(df: DataFrame, idCol: String, n: Int): DataFrame =
    df.withColumn("__h", pmod(col(idCol), lit(Mod)) * lit(Mult) % lit(Mod))
      .orderBy(col("__h"), col(idCol)).limit(n)
      .drop("__h")
}
