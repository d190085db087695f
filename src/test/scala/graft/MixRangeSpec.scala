package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The mix()/house-hash RANGE AND DISTRIBUTION pins — round-17
  * verdict #1.
  *
  * Why this spec exists: round 16 found that `Sketch.mix`'s output
  * lies in [0, ~1e9+7), not the previously-documented [0, 2^31) —
  * and q172's Poisson inverse-CDF thresholds, scaled by 2^31, were
  * silently drawing Bernoulli(0.21) weights instead of Poisson(1).
  * The oracle gate CANNOT see that bug class: both engines replay
  * the same mis-scaled derivation and hash-match each other
  * perfectly. The only defense is to pin the hash's distribution and
  * every threshold derivation against the TRUE modulus in a test, so
  * the next range drift fails here instead of shipping.
  *
  * Audit of every site that turns a hash into a
  * probability/threshold/bucket (round-17 sweep — each site also
  * carries a range-audit note in its derivation comment):
  *
  *  - q172 Poisson draw (`Sketch.PoisT` on `mix`): the one true
  *    inverse-CDF threshold consumer — thresholds must scale by P.
  *    Pinned exactly below, plus measured moments.
  *  - q94/q97/q110/q120/q138 KMV-style samples and
  *    `SeededSample.top` / q122 / q127: RANK-based (order by hash /
  *    min-of-clocks, keep k) — sample membership depends only on the
  *    hash ORDER, never on its range. Range-free by construction.
  *  - q64 weighted sample: u = (h+1)/(P+1) with h = (k mod P)·Mult
  *    mod P — scaled by the true modulus of ITS hash (the affine
  *    house hash, range exactly [0, P)); pinned below.
  *  - q38/q40/q65 splits, q69 shard assign, CMS/Bloom `rowBucket`,
  *    HLL bucket: MODULO buckets (h mod m). Range-independent up to
  *    the ≤ 1-part-in-(P/m) occupancy skew of a non-divisible
  *    modulus (~1e-8 at m = 10) — no scaling assumption to drift.
  *  - SRP/HashEmbed/PQ/FeatureEmbed ±1 coordinates: (h mod P)/P
  *    · 2 − 1 — the divisor IS the reducing modulus, in the same
  *    expression; cannot drift independently.
  *  - q176 JL signs: PARITY of the affine hash — range-free.
  *  - HLL register value: low-bit extraction (hv >> 8 mod 2^22) —
  *    bit-level, range-free given the range pin below.
  *  - r18 `TextPolyHashPacked` (fp_hi/fp_lo — q23's and DedupIndex's
  *    128-bit exact-dup key): EQUALITY-ONLY consumers (groupBy /
  *    join keys) — no threshold, probability, or bucket derivation
  *    anywhere. Range [0, mod1·mod2) pinned below so any FUTURE
  *    consumer that scales by the range has a tested bound to cite
  *    (the drift this spec exists to catch starts with an untested
  *    range comment).
  */
class MixRangeSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val P = 1000000007L
  private val N = 200000L

  test("mix(): range is [0, P + 2^14) with negligible mass above P") {
    val h = spark.range(N).select(graft.queries.Sketch.mix(col("id")).as("h"))
      .agg(min($"h").as("mn"), max($"h").as("mx"),
        sum(when($"h" >= P, 1L).otherwise(0L)).as("over"))
      .head()
    assert(h.getLong(0) >= 0L, s"mix produced a negative value: ${h.getLong(0)}")
    assert(h.getLong(1) < P + (1L << 14),
      s"mix exceeded its documented bound: ${h.getLong(1)}")
    // the spill region [P, P + 2^14) holds < 2^14/P ≈ 1.6e-5 of the
    // mass; allow 10× the expectation before failing
    assert(h.getLong(2) <= (N * 10 * (1L << 14)) / P + 1,
      s"too much mass above P: ${h.getLong(2)} of $N")
  }

  test("mix(): near-uniform over [0, P) — moments and 64-bucket chi-square") {
    val r = spark.range(N)
      .select(graft.queries.Sketch.mix(col("id")).cast("double").as("h"))
      .agg(avg($"h").as("mean"), avg($"h" * $"h").as("m2")).head()
    val mean = r.getDouble(0)
    val varc = r.getDouble(1) - mean * mean
    val uMean = P / 2.0
    val uVar = P.toDouble * P.toDouble / 12.0
    assert(math.abs(mean / uMean - 1.0) < 0.01,
      f"mean $mean%.0f drifts from uniform P/2 = $uMean%.0f")
    assert(math.abs(varc / uVar - 1.0) < 0.03,
      f"variance $varc%.3e drifts from uniform P^2/12 = $uVar%.3e")
    // chi-square over 64 equal-width buckets of [0, P): df = 63,
    // sd ≈ 11.2 — a bound of 150 only fails on real non-uniformity
    // the claim is uniformity over [0, P); the tiny spill region
    // [P, P + 2^14) (range test above) is excluded from the buckets
    val width = P / 64 + 1
    val counts = spark.range(N)
      .select(graft.queries.Sketch.mix(col("id")).as("h"))
      .filter($"h" < P)
      .select(($"h" / width).cast("int").as("b"))
      .groupBy($"b").count().collect().map(r => r.getInt(0) -> r.getLong(1))
      .toMap
    assert(counts.keySet.subsetOf((0 until 64).toSet), s"bucket out of range")
    val exp = N.toDouble / 64.0
    val chi2 = (0 until 64).map { b =>
      val c = counts.getOrElse(b, 0L).toDouble
      (c - exp) * (c - exp) / exp
    }.sum
    assert(chi2 < 150.0, f"64-bucket chi-square $chi2%.1f — mix is not uniform")
  }

  test("q172 PoisT thresholds are EXACTLY the Poisson(1) inverse CDF scaled by P") {
    // the derivation the r16 bug violated: threshold k = floor(CDF(k)·P)
    // with CDF(k) = e^{-1}·Σ_{i≤k} 1/i! — any rescaling (2^31, 2^30,
    // a new P) breaks this equality and fails here
    val e1 = math.exp(-1.0)
    var term = 1.0
    var cdf = 0.0
    val want = (0 to 6).map { k =>
      if (k > 0) term /= k
      cdf += term
      math.floor(e1 * cdf * P).toLong
    }
    assert(graft.queries.Sketch.PoisT.toSeq == want,
      s"PoisT ${graft.queries.Sketch.PoisT.toSeq} != derived $want — " +
        "threshold scaling drifted from mix()'s modulus")
  }

  test("q172 Poisson weights: measured moments are Poisson(1), not Bernoulli") {
    // replicate q172's exact hash-input form mix(doc_id·41 + b) over a
    // (5000 ids × 40 replicates) grid = 200k draws; Poisson(1) has
    // mean = variance = 1 (the r16 bug's weights measured mean 0.21)
    val w = spark.range(5000L)
      .select(col("id"), explode(sequence(lit(1L), lit(40L))).as("b"))
      .select(graft.queries.Sketch.poissonW(
        graft.queries.Sketch.mix(col("id") * lit(41L) + col("b")))
        .cast("double").as("w"))
      .agg(avg($"w").as("mean"), avg($"w" * $"w").as("m2")).head()
    val mean = w.getDouble(0)
    val varc = w.getDouble(1) - mean * mean
    assert(math.abs(mean - 1.0) < 0.02, f"Poisson weight mean $mean%.4f != 1")
    assert(math.abs(varc - 1.0) < 0.05, f"Poisson weight variance $varc%.4f != 1")
  }

  test("affine house hash: range exactly [0, P), q64's u = (h+1)/(P+1) lands in (0, 1]") {
    import graft.ops.SeededSample.{Mod, Mult}
    val stats = spark.range(N)
      .select((pmod(col("id"), lit(Mod)) * lit(Mult) % lit(Mod)).as("h"))
      .select($"h", (($"h" + lit(1L)).cast("double") / lit(1000000008.0)).as("u"))
      .agg(min($"h").as("hmn"), max($"h").as("hmx"),
        min($"u").as("umn"), max($"u").as("umx"), avg($"u").as("uavg"))
      .head()
    assert(stats.getLong(0) >= 0L && stats.getLong(1) < P,
      s"affine hash left [0, P): ${stats.getLong(0)}..${stats.getLong(1)}")
    assert(stats.getDouble(2) > 0.0 && stats.getDouble(3) <= 1.0,
      s"u left (0, 1]: ${stats.getDouble(2)}..${stats.getDouble(3)}")
    assert(math.abs(stats.getDouble(4) - 0.5) < 0.01,
      f"u mean ${stats.getDouble(4)}%.4f drifts from 0.5 — -ln(u) clocks would bias")
  }

  test("packed 128-bit fingerprint halves: ranges are [0, mod1*mod2), non-negative") {
    // the r18 audit row: fp_hi/fp_lo have equality-only consumers
    // today; this pins the TRUE range so a future threshold consumer
    // scales by a tested bound instead of a drifting comment
    import graft.ops.TextOps
    val hiBound = graft.ops.expressions.HashKernel.Mod * TextOps.FpHiMod2
    val loBound = TextOps.FpLoMod1 * TextOps.FpLoMod2
    val r = Tables.documents(spark, sf)
      .select(TextOps.fingerprintHi($"text").as("hi"),
        TextOps.fingerprintLo($"text").as("lo"))
      .agg(min($"hi").as("himn"), max($"hi").as("himx"),
        min($"lo").as("lomn"), max($"lo").as("lomx"))
      .head()
    assert(r.getLong(0) >= 0L && r.getLong(1) < hiBound,
      s"fp_hi left [0, $hiBound): ${r.getLong(0)}..${r.getLong(1)}")
    assert(r.getLong(2) >= 0L && r.getLong(3) < loBound,
      s"fp_lo left [0, $loBound): ${r.getLong(2)}..${r.getLong(3)}")
  }
}
