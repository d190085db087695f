package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.Determinism.{roundFix, Oracles}

/** Oracle-gated sketch queries — the three classic streaming/sketch
  * families (HyperLogLog cardinality, Count-Min frequency, Bloom
  * membership) built from scratch on deterministic integer
  * primitives, so the ESTIMATES themselves hash-match a DuckDB
  * replay.
  *
  * Why this exists next to [[graft.ops.Sketches]] (which wraps
  * Spark's builtin HLL++/CountMinSketch/BloomFilter): the builtins'
  * internals are engine-private, so their gates are error-bound
  * specs only (SketchSpec) — an approximate answer normally forfeits
  * the oracle. These queries show it doesn't have to: a sketch is
  * just (deterministic hash → integer registers → fixed arithmetic),
  * and each stage here is expressible identically in Spark and ANSI
  * SQL. The builtins remain the production path (64-bit hashes,
  * tuned bias tables); this pack is the correctness-auditable twin
  * at modest hash width — the same relationship HashEmbed has to
  * BatchEncoder.
  *
  * The shared hash is a Murmur-style finalizer in the modular field
  * (multiply stages reduced mod P = 1e9+7 so no product exceeds
  * 2^61 — Long-safe even under ANSI mode, replayable in any BIGINT
  * engine; xor/shift stages mix the bits an affine hash leaves
  * structured). The house k·Mult mod P hash is NOT usable here:
  * consecutive keys form an arithmetic progression whose register
  * max-statistics correlate — measured 91% HLL error on user_id vs
  * 1.8% with this finalizer, same m.
  *
  * Scale shapes (all three hold at 100 TB):
  *  - HLL: one scan → 256-group partial agg; constant state.
  *  - CMS: one scan → 3×64-counter aggs + per-key agg, tiny
  *    broadcast joins back; no all-pairs anything.
  *  - Bloom: the ≤8192-row distinct bit set broadcasts; candidates
  *    probe it with three equi-joins — the cross-job prefilter shape
  *    of Sketches.bloomPrefilter, but with the filter as a RELATION
  *    (shuffle-free probe, auditable contents) instead of a
  *    driver-held byte array.
  */
object Sketch {

  private val P = 1000000007L
  /** Stage multipliers: Mult mod P (the house Knuth constant reduced
    * into the field), then two public 30-bit primes. */
  private val C1 = 654435747L
  private val C2 = 961748941L
  private val C3 = 920419813L

  /** Modular Murmur-style finalizer. Range: the last multiply
    * reduces mod P, and the final xor-shift flips only bits below
    * bit 14 of that value, so the result lies in [0, P + 2^14) and
    * is near-uniform over [0, P) (the xor stage is a bijection that
    * moves each value by < 2^14 ≈ 1.6e-5·P). Uniformity consumers
    * (q172's inverse-CDF thresholds) must scale by P, not by a
    * power of two — scaling by 2^31 silently compresses the top 53%
    * of the CDF into never-reached territory (the q172 differential
    * caught exactly that). Range, moments, bucket uniformity and the
    * PoisT scaling are PINNED in MixRangeSpec (r17 verdict #1) so
    * the next range drift fails a test instead of shipping. */
  private[graft] def mix(k: Column): Column = {
    val s1 = pmod(k.cast("long"), lit(P)) * lit(C1) % lit(P)
    val x1 = s1.bitwiseXOR(shiftright(s1, 15))
    val s2 = x1 * lit(C2) % lit(P)
    val x2 = s2.bitwiseXOR(shiftright(s2, 13))
    val s3 = x2 * lit(C3) % lit(P)
    s3.bitwiseXOR(shiftright(s3, 16))
  }

  /** DuckDB twin of [[mix]] — same constants, same stage order.
    * Callers wrap it in a CTE so the text is evaluated once. */
  private def sqlMix(k: String): String = {
    val s1 = s"(($k % $P) * $C1 % $P)"
    val x1 = s"xor($s1, $s1 >> 15)"
    val s2 = s"($x1 * $C2 % $P)"
    val x2 = s"xor($s2, $s2 >> 13)"
    val s3 = s"($x2 * $C3 % $P)"
    s"xor($s3, $s3 >> 16)"
  }

  /** HLL registers: m = 256 buckets from the hash's low 8 bits; the
    * rank is the first-1 position in the next W = 22 bits, computed
    * as W+1 − length(bin(v)) — a STRING-length formulation both
    * engines share exactly (no floating log2 at the integer stage). */
  // Range audit (r17): bucket = hv mod 256 and the register value =
  // (hv >> 8) mod 2^22 are modulo/bit extractions — range-free given
  // MixRangeSpec's [0, P + 2^14) range pin.
  private val HllM = 256
  private val HllW = 22

  private def hllRow(df: DataFrame, keyCol: String): DataFrame = {
    // registers over DISTINCT keys: identical to per-row registers
    // (max is duplicate-insensitive), and the distinct lets the exact
    // count ride along as sum-of-bucket-counts — one linear plan, no
    // join back (a literal-keyed 1-row self-join folds to a BNLJ)
    val dk = df.select(col(keyCol)).distinct()
    val hv = mix(col(keyCol))
    val bucket = hv % lit(HllM.toLong)
    val v = shiftright(hv, 8) % lit(1L << HllW)
    val rho = when(v === 0, lit(HllW + 1))
      .otherwise(lit(HllW + 1) - length(bin(v)))
    val regs = dk.select(bucket.as("bucket"), rho.as("rho"))
      .groupBy("bucket")
      .agg(max("rho").as("mr"), count(lit(1)).as("nb"))
    // alpha_m and both corrections written as the SAME literal
    // expressions the SQL twin evaluates — identical IEEE operand
    // order, residual ulp differences killed by roundFix(…, 6)
    val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(256.0))
    val z = regs.agg(
      (sum(pow(lit(2.0), -col("mr"))) + (lit(256.0) - count(lit(1))))
        .as("zsum"),
      (lit(HllM) - count(lit(1))).as("v_empty"),
      sum("nb").as("n_exact"))
    val raw = alpha * lit(256.0) * lit(256.0) / col("zsum")
    z.select(
      lit(keyCol).as("col_name"), col("n_exact"), col("v_empty"),
      roundFix(
        when(raw <= lit(640.0) && col("v_empty") > 0,
          lit(256.0) * log(lit(256.0) / col("v_empty")))
          .otherwise(raw), 6).as("est_distinct"))
  }

  /** One HLL SELECT-block per key column for the oracle. */
  private def sqlHll(keyCol: String): String = {
    s"""(WITH dk AS (SELECT DISTINCT $keyCol AS k FROM events),
       |h AS (SELECT ${sqlMix("k")} AS hv FROM dk),
       |r AS (SELECT hv % $HllM AS bucket,
       |  CASE WHEN (hv // $HllM) % ${1L << HllW} = 0 THEN ${HllW + 1}
       |       ELSE ${HllW + 1} - length(bin((hv // $HllM) % ${1L << HllW})) END AS rho
       |  FROM h),
       |regs AS (SELECT bucket, max(rho) AS mr, count(*) AS nb
       |         FROM r GROUP BY bucket),
       |z AS (SELECT sum(pow(2.0, -mr)) + (256.0 - count(*)) AS zsum,
       |             $HllM - count(*) AS v_empty,
       |             CAST(sum(nb) AS BIGINT) AS n_exact FROM regs)
       |SELECT '$keyCol' AS col_name, n_exact, v_empty,
       |  floor((CASE WHEN 0.7213/(1.0+1.079/256.0)*256.0*256.0/zsum <= 640.0
       |                   AND v_empty > 0
       |              THEN 256.0 * ln(256.0/v_empty)
       |              ELSE 0.7213/(1.0+1.079/256.0)*256.0*256.0/zsum
       |         END)*1000000.0+0.5)/1000000.0 AS est_distinct
       |FROM z)""".stripMargin
  }

  /** q97 bottom-k sample size per group: the QuantSampleK rows with
    * the smallest key hashes form a fixed-size uniform sample of the
    * group REGARDLESS of its row count (the KMV / bottom-k device) —
    * bounded per-group state where q42's exact quantiles materialize
    * a full per-group sorted array. Rank stderr at k=256 is
    * √(p(1−p)/k) ≈ 3% at the median — the classic sample-quantile
    * trade. */
  private val QuantSampleK = 256

  /** The q97 chain over any (g, id, value) frame (spec hook: planted
    * distributions; id must be unique — it seeds the sample and
    * breaks rank ties). Scale shape: the bottom-k-by-hash sample runs
    * on [[graft.plans.TopK.perKey]] — the two-phase partial top-k
    * operator, so each input partition reduces a group to ≤ k rows
    * BEFORE the shuffle (skew-immune, no full sort, no content-key
    * window); the per-group sorted array is then bounded by k, never
    * by group size, and the exact row count rides along as a plain
    * partial-combine count. Estimates use q42's interpolation formula
    * verbatim, so the two queries differ only in what they sort:
    * q42 the whole group (exact, reducer-bound at 100 TB), q97 a
    * 256-row sample (approximate, constant state — what a curation
    * report runs corpus-wide). */
  private[graft] def sampleQuantiles(rows: DataFrame): DataFrame = {
    val spark = rows.sparkSession
    import spark.implicits._
    val hashed = rows.select($"g", $"id", $"value", mix($"id").as("hv"))
    val sampled = graft.plans.TopK.perKey(hashed, Seq("g"),
      Seq("hv" -> true, "id" -> true), QuantSampleK)
    val est = sampled.groupBy($"g")
      .agg(sort_array(collect_list($"value")).as("vs"))
      .withColumn("m", size($"vs").cast("bigint"))
    val totals = hashed.groupBy($"g").agg(count(lit(1)).as("n"))
    est.join(totals, "g")
      .select($"g", $"n", $"m".as("n_sample"),
        roundFix(interpAt(lit(0.5)), 6).as("p50_est"),
        roundFix(interpAt(lit(0.95)), 6).as("p95_est"))
      .orderBy($"g")
  }

  /** Linear interpolation at percentile p over a KMV sample row
    * (columns `vs`: sorted value array, `m`: BIGINT sample size) —
    * ONE expression tree for every sample-quantile consumer
    * (q97/q110/q120), with [[sqlInterp]] as its DuckDB twin. A
    * one-sided reassociation of the arithmetic can therefore never
    * break a single query's cross-engine hash in isolation. */
  private def interpAt(p: Column): Column = {
    val idx = (col("m") - 1).cast("double") * p
    val vlo = element_at(col("vs"), floor(idx).cast("int") + 1)
    val vhi = element_at(col("vs"), ceil(idx).cast("int") + 1)
    vlo + (vhi - vlo) * (idx - floor(idx))
  }
  /** DuckDB twin of [[interpAt]] over the same (vs, m) CTE row. */
  private def sqlInterp(p: String): String = {
    val idx = s"(CAST(m - 1 AS DOUBLE) * $p)"
    val vlo = s"vs[CAST(floor($idx) AS BIGINT) + 1]"
    val vhi = s"vs[CAST(ceil($idx) AS BIGINT) + 1]"
    s"$vlo + ($vhi - $vlo) * ($idx - floor($idx))"
  }

  /** CMS geometry: depth 3 (one row per stage multiplier), width 64. */
  private val CmsW = 64L
  /** Bloom geometry: 8192 bits, 3 probes per key. */
  private val BloomBits = 8192L

  /** Row-i bucket: affine post-scramble of the mixed hash (hv is
    * already uniform; distinct multipliers decorrelate the rows). */
  /** Range audit (r17): MODULO bucket — range-independent, no
    * scaling assumption to drift; hv < P + 2^14 and mult < 2^30 keep
    * the product under 2^61 (Long-safe, ANSI-safe). */
  private def rowBucket(hv: Column, mult: Long, width: Long): Column =
    hv * lit(mult) % lit(P) % lit(width)
  private def sqlRowBucket(hv: String, mult: Long, width: Long): String =
    s"$hv * $mult % $P % $width"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // HyperLogLog distinct-count, oracle-replayable end to end: the
    // two key columns exercise BOTH estimator branches (event_id →
    // raw harmonic-mean estimate; user_id at |keys| ≪ m → the
    // linear-counting small-range correction). Plan: per column one
    // scan → 256-group hash agg (partial+final, constant state) →
    // 1-row fold; the exact count_distinct rides along as the
    // self-check column. measured sf0.01: est/exact = 10579/10000
    // (event_id), 152.7/150 (user_id).
    "q94_hll_distinct" -> { (s, d) =>
      val ev = Tables.events(s, d)
      hllRow(ev, "event_id").unionByName(hllRow(ev, "user_id"))
        .orderBy("col_name")
    },

    // Count-Min heavy hitters: 3×64 integer counters over one scan,
    // est(k) = min over the key's 3 counters — never an undercount
    // (each counter ≥ the key's own row count by construction; the
    // oracle gate pins the exact overestimates). The counter tables
    // are 64 rows each — broadcast equi-joins back onto the per-key
    // truth, so the only corpus-sized shuffle is the per-key agg
    // itself.
    "q95_cms_heavy" -> { (s, d) =>
      import s.implicits._
      val hv = mix($"user_id")
      val b = Tables.events(s, d).select($"user_id",
        rowBucket(hv, C1, CmsW).as("b1"),
        rowBucket(hv, C2, CmsW).as("b2"),
        rowBucket(hv, C3, CmsW).as("b3"))
      // ONE corpus pass: the per-key exact counts carry their three
      // bucket ids, so each depth's 64 counters are a rollup of this
      // key-width aggregate (Σ true_n per bucket ≡ the row count per
      // bucket) — the old per-depth groupBys re-scanned events 4×
      // (measured at sf0.1: 0.62 → 0.49 s isolated, and 1.15 s
      // inside the full-catalog run where the rescans also paid
      // cache pressure). Persisted: 4 consumers, O(distinct users)
      // rows, never the event stream.
      val truth = b.groupBy($"user_id", $"b1", $"b2", $"b3")
        .agg(count(lit(1)).as("true_n"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val c1 = truth.groupBy($"b1").agg(sum($"true_n").as("n1"))
      val c2 = truth.groupBy($"b2").agg(sum($"true_n").as("n2"))
      val c3 = truth.groupBy($"b3").agg(sum($"true_n").as("n3"))
      truth.join(c1, "b1").join(c2, "b2").join(c3, "b3")
        .select($"user_id", $"true_n",
          least($"n1", $"n2", $"n3").as("est_n"))
        .orderBy($"true_n".desc, $"user_id").limit(10)
    },

    // Bloom membership as a RELATION: the member set's 3 probe bits
    // (distinct, ≤8192 rows) broadcast; each candidate passes iff all
    // three of its bits are present. Members can never fail (their
    // bits are in the set by construction — the spec asserts zero
    // false negatives); false positives pass and are exposed by the
    // is_member column. This is Sketches.bloomPrefilter's cross-job
    // shape with the filter auditable as data instead of opaque
    // driver bytes.
    "q96_bloom_filter" -> { (s, d) =>
      import s.implicits._
      val members = Tables.orders(s, d).select($"o_custkey").distinct()
      val mh = members.select($"o_custkey", mix($"o_custkey").as("hv"))
      val bitsSet = mh.select(explode(array(
        rowBucket($"hv", C1, BloomBits), rowBucket($"hv", C2, BloomBits),
        rowBucket($"hv", C3, BloomBits))).as("bit")).distinct()
      // candidates straddle the member set BY CONSTRUCTION: every 7th
      // customer key (members at every SF — sf0.001's orders cover
      // all customers) plus the same keys offset by 1e6 (guaranteed
      // non-members: custkeys are far below 1e6), so both the
      // no-false-negative and the false-positive-rate properties are
      // exercised at every shipped SF
      val candKeys = Tables.customer(s, d)
        .filter($"c_custkey" % 7 === 0).select($"c_custkey")
      val cand = candKeys
        .union(candKeys.select(($"c_custkey" + lit(1000000L)).as("c_custkey")))
        .select($"c_custkey", mix($"c_custkey").as("hv"))
      def present(i: Int) = bitsSet
        .withColumnRenamed("bit", s"bit$i").withColumn(s"p$i", lit(true))
      val flagged = cand
        .withColumn("bit1", rowBucket($"hv", C1, BloomBits))
        .withColumn("bit2", rowBucket($"hv", C2, BloomBits))
        .withColumn("bit3", rowBucket($"hv", C3, BloomBits))
        .join(present(1), Seq("bit1"), "left")
        .join(present(2), Seq("bit2"), "left")
        .join(present(3), Seq("bit3"), "left")
        .select($"c_custkey",
          (coalesce($"p1", lit(false)) && coalesce($"p2", lit(false)) &&
            coalesce($"p3", lit(false))).as("bloom_pass"))
      val mem = members.select($"o_custkey".as("c_custkey"),
        lit(true).as("is_member"))
      flagged.join(mem, Seq("c_custkey"), "left")
        .select($"c_custkey", $"bloom_pass",
          coalesce($"is_member", lit(false)).as("is_member"))
        .orderBy($"c_custkey")
    },

    // Approximate grouped quantiles — the fourth classic sketch
    // family (class doc at [[sampleQuantiles]]; q42 is the exact
    // sibling this replaces at scale). The deterministic bottom-k
    // sample makes the ESTIMATE itself oracle-replayable: both
    // engines select the identical 256 rows per group (same hash,
    // same total order), so the interpolated quantiles hash-match.
    // The exact n rides along as the self-check column; SketchSpec
    // bounds the estimate's rank error against a planted uniform.
    "q97_approx_quantiles" -> { (s, d) =>
      import s.implicits._
      sampleQuantiles(Tables.events(s, d)
        .filter($"value".isNotNull)
        .select($"event_type".as("g"), $"event_id".as("id"), $"value"))
        .select($"g".as("event_type"), $"n", $"n_sample",
          $"p50_est", $"p95_est")
    },

    // Adaptive quality floor — the q97 sketch put to its curation
    // use: real pipelines drop "the worst FloorP of each domain",
    // not "quality < 0.4", because score distributions differ per
    // language/source; the cutoff must come from the corpus itself.
    // The per-domain p20 threshold derives from the KMV bottom-k
    // sample (constant per-group state at any corpus size — q42's
    // exact per-group sort is the reducer-bound alternative), then
    // broadcasts back over one quality-kernel pass for the keep
    // decision. Both engines select the identical sample rows and
    // interpolate identically, so the THRESHOLD and every keep
    // verdict hash-match. Output: per-domain report (n_docs,
    // thr_micro, n_kept). Token-less docs are out of scope of a
    // quality floor and are excluded both sides.
    "q110_adaptive_floor" -> { (s, d) =>
      import s.implicits._
      val docs = Tables.documents(s, d)
        .repartition($"doc_id")
        .select($"doc_id", $"lang",
          graft.ops.expressions.TextStats($"text").as("st"))
        .select($"doc_id", $"lang",
          $"st".getField("quality").as("quality"),
          $"st".getField("n_tokens").as("nt"))
        .filter($"nt" > 0L)
        // two consumers: the sample and the keep pass (clearCache
        // lifecycle as everywhere)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val thr = adaptiveFloorThresholds(docs)
      docs.join(broadcast(thr), Seq("lang"))
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_docs"),
          floor(max($"thr") * lit(1e6) + lit(0.5)).cast("long").as("thr_micro"),
          sum(when($"quality" >= $"thr", 1L).otherwise(0L)).as("n_kept"))
        .orderBy($"lang")
    },

    // CCNet-style perplexity split (Wenzek et al., LREC 2020): label
    // every document head / middle / tail by PER-DOMAIN terciles of
    // its reference-LM surprisal — the published recipe keeps head
    // (closest to the curated reference), samples middle, drops
    // tail, and the cuts must come from each language's own score
    // distribution (absolute perplexity is not comparable across
    // languages). Composes two gated stages: q102's Stupid-Backoff
    // scorer supplies xent; q110's KMV bottom-k device supplies the
    // per-domain 1/3–2/3 cutpoints with constant per-group state
    // (CCNet itself hand-tunes the cut fractions; the tercile is the
    // symmetric default). Both engines select the identical sample
    // rows, interpolate identically over exact 6-dp scores, and
    // label by the same comparisons — the report (n_docs, mean
    // surprisal per (lang, bucket)) hash-matches. Scale shape: the
    // scorer's shape is q102's; downstream of it everything is
    // id-width — the sample is the bounded-heap TopKPerKey, the
    // threshold table is O(domains) broadcast back, the rollup
    // map-side-combines to ≤ 3·domains rows.
    "q120_perplexity_split" -> { (s, d) =>
      perplexitySplit(Tables.documents(s, d))
    },

    // Weighted sampling WITHOUT replacement (the Efraimidis &
    // Spirakis 2006 k-sample, realized as an integer TOKEN RACE):
    // give every (doc, token-slot) a permuted integer hash and let
    // each doc's clock be the MIN over its slots — the doc holding
    // the corpus-wide minimum wins with probability w/Σw EXACTLY
    // (the min lands uniformly over token slots), and the k smallest
    // clocks are the without-replacement sample. Weight = token
    // count, the curation use: a token-budget-proportional subsample
    // preserves the token-mass distribution where q122's uniform
    // stratified draw (deliberately) does not — the two samplers
    // answer different questions and ship side by side. The float
    // formulation (−ln(u)/w exponential clocks) was BUILT AND
    // REJECTED here: resolving clocks that span [1e−12, 20] needs a
    // 1e17 fixed point, which puts ln's 1-ulp libm noise IN THE
    // RANKED DIGITS — the exact failure the q43/Determinism doctrine
    // exists to prevent. The race is pure int64 arithmetic (the
    // MinHash permutation family's form), bit-identical anywhere.
    //
    // Scale shape: one pass computes per-doc slot-hash minima (a
    // fold over the token count — O(corpus tokens), the tokenize
    // cost's shape); global top-k is a TakeOrdered (per-partition
    // heads + driver merge), never a global sort; the final
    // row_number runs over k rows.
    "q127_weighted_sample" -> { (s, d) =>
      weightedSample(Tables.documents(s, d))
    },

    // Per-class embedding diversity WITHOUT a pairwise join: the
    // mean squared pairwise L2 distance obeys the variance identity
    //   (1/n²)·Σᵢ Σⱼ ||xᵢ−xⱼ||² = 2·( E||x||² − ||E x||² ),
    // so a statistic that reads as O(n²) per group (the reason
    // diversity reports usually subsample) is exactly computable in
    // ONE pass: per-row squared norms and per-dimension sums, each
    // micro-quantized BEFORE the order-free BIGINT aggregation (the
    // Determinism convention), then a fixed-order 64-term fold over
    // the per-group dimension sums rebuilds ||E x||². Published use:
    // corpus diversity reports next to q108's outlier table — a
    // collapsed or near-duplicate-heavy class scores low;
    // SemDeDup-style pruning (q104) raises it. Scale shape: the
    // dim explode emits 64 id-free (label, dim, xm) rows per vector
    // into a map-side-combined agg whose output is 64·|classes|
    // rows FOREVER; the squared-dim fold stays double (a BIGINT
    // Σdsum² would overflow int64 at n ≈ 10⁴ per class — measured
    // bound, not a guess); no sampling cap at any corpus size.
    "q114_embed_diversity" -> { (s, d) =>
      import s.implicits._
      embedDiversity(Tables.embeddings(s, d).select($"label", $"embedding"))
    },

    // Int8 scalar quantization report — the decision table for
    // compressing the embedding store 4× (float32 → int8, the
    // standard serving-layer trick next to q90's PQ, which
    // compresses harder but lossier). Per-dim SYMMETRIC scale
    // s_d = max|x_d|/127 (the ONNX/FAISS ScalarQuantizer
    // convention); report per dim: the max-abs calibration stat,
    // how many values saturate (|code| = 127 — heavy-tailed dims
    // saturate more and argue for clipping calibration instead),
    // and the reconstruction SSE — what a serving team reads to
    // decide int8-vs-PQ per deployment.
    //
    // Determinism: the calibration stat is a MAX (order-free and
    // exact in fp — no summation ambiguity), codes are integer
    // floor(x/s + 0.5) clamps, and the only float aggregate (SSE)
    // pico-quantizes each term to int64 before the order-free sum.
    //
    // Scale shape: two narrow passes over the table (max-abs, then
    // code+error), each a posexplode into a map-side-combined agg
    // whose output is 64 rows; the 64-row calibration table rides
    // back as a broadcast join — nothing O(corpus) at the driver,
    // no wide shuffle (id-free explode rows).
    "q131_int8_quant" -> { (s, d) =>
      import s.implicits._
      int8Quant(Tables.embeddings(s, d).select($"embedding"))
    },

    // Pairwise source-overlap matrix — estimated shingle-set
    // Jaccard between every provider pair from per-source KMV
    // (bottom-k) sketches: the crawl-procurement view ABOVE q128
    // (q128 says how redundant each source is with the corpus;
    // this says WHICH PAIRS duplicate each other, i.e. which feed
    // to cut). Estimator: per source, the OverlapK smallest mixed
    // shingle hashes form a uniform set sample; for a pair, take
    // the bottom-k of the sketch UNION and count members present
    // in both sketches — the classic KMV union-resemblance device
    // (Beyer et al. 2007, Bar-Yossef et al. 2002), DETERMINISTIC
    // given the hash, so the oracle replays it exactly (the q94/q95
    // auditable-sketch doctrine: approximate answer, exact gate).
    //
    // Scale shape: the only corpus-scale pass is shingle-hash →
    // distinct → bottom-k via TopK.perKey (per-partition partial
    // top-k BEFORE the shuffle — skew-immune, ≤ k rows per source
    // cross the wire). Everything pairwise runs on the O(sources·k)
    // sketch table: sources² pairs × 2k rows — thousands, not
    // corpus-sized; at 10⁴ sources you'd shard the pair loop, the
    // sketch pass is unchanged. Every pair reports (q112's
    // keep-zero convention) via the left join back to the pair set.
    "q138_source_overlap" -> { (s, d) =>
      sourceOverlap(Tables.documents(s, d))
    },

    // Robust per-source length fences — median ± 3·MAD (the robust
    // z-score / Hampel-filter convention, Leys et al. 2013) over
    // token counts: the outlier gate a curation team runs per
    // provider BEFORE trusting mean/stddev stats that the outliers
    // themselves corrupt. Medians are EXACT lower medians computed
    // from the per-source length HISTOGRAM (the q132 device): the
    // corpus-scale work is one tokenize pass map-side-combining to
    // O(sources × distinct lengths) rows; every window after that
    // runs over the aggregated histogram, partitioned by source —
    // never O(corpus) through a window. Integer-exact throughout
    // (lower median, integer MAD, integer fences: no interpolation,
    // no float boundary).
    "q135_mad_fences" -> { (s, d) =>
      madFences(Tables.documents(s, d))
    },

    // Per-class Fréchet embedding distance, diagonal-covariance form
    // (the Gaussian Fréchet/Wasserstein-2 closed form, Dowson &
    // Landau 1982; FID, Heusel et al. 2017 — with diagonal Σ the
    // trace term collapses to Σ_d (σ1−σ2)², so the whole distance is
    // per-dimension arithmetic): for each label, d²(label group,
    // complement) = Σ_d (μA−μB)² + σA² + σB² − 2σAσB. The
    // distribution-level dual of q114's within-class diversity: HOW
    // FAR each class sits from the rest of the embedding mass — the
    // embedding-drift / synthetic-data screen (a generated slice
    // shows a large FID against the organic remainder long before
    // per-doc filters notice). Determinism: per-dim Σx and Σx² are
    // int64 micro sums (q114's device); means/variances/sqrts are
    // ONE fixed-order double expression over those exact integers
    // (sqrt is IEEE-correctly-rounded — engine-identical), each dim
    // term micro-quantizes BEFORE the order-free integer sum.
    //
    // Scale shape: ONE posexplode pass map-side-combines to
    // O(labels·dims) rows; the complement stats are global-minus-
    // group off a broadcast O(dims) frame — no second corpus pass,
    // no per-pair work, nothing O(corpus) after the scan.
    "q143_group_frechet" -> { (s, d) =>
      import s.implicits._
      fidDiag(Tables.embeddings(s, d).select($"label", $"embedding"))
    },

    // Nearest-other-centroid confusability per class (the
    // nearest-class-mean geometry, Mensink et al. 2013): for each
    // label, which OTHER label's centroid sits closest and at what
    // squared distance — the embedding-space analog of q144's
    // label-confusion cross-tab. Two classes whose centroids nearly
    // coincide are indistinguishable to any centroid-based router or
    // balanced sampler; the table says WHICH merges are happening
    // before a per-class quota trusts the labels. Determinism:
    // centroids derive from q114's per-dim int64 micro sums; each
    // dim's (μA−μB)² term is ONE fixed-order double expression over
    // those exact integers, micro-quantized BEFORE the order-free
    // integer sum over dims; the argmin breaks ties on the smaller
    // label id.
    //
    // Scale shape: ONE posexplode pass map-side-combines to
    // O(labels·dims) rows; the pairwise work is a self-join of that
    // tiny frame (labels²·dims rows — thousands), nothing O(corpus)
    // after the scan.
    "q150_centroid_confusion" -> { (s, d) =>
      import s.implicits._
      centroidConfusion(Tables.embeddings(s, d).select($"label", $"embedding"))
    },

    // Greedy k-center coreset over the embeddings (Gonzalez 1985's
    // farthest-point 2-approximation; Sener & Savarese 2018 use
    // exactly this selection as the active-learning/data-selection
    // coreset): start from the smallest vec_id, then K−1 times pick
    // the point FARTHEST from every chosen center. The output is
    // the selection trajectory (rank, vec_id, distance-to-nearest-
    // center at selection) — the radius column is the classic
    // decreasing coverage-radius curve, and the chosen ids are the
    // maximally-spread sample a labeling/eval budget buys (q122
    // samples uniformly per domain; this samples for geometric
    // coverage). Determinism: per-dim squared differences
    // micro-quantize before the order-free int64 sum over dims (the
    // q150 device, point-to-point), and the argmax breaks ties on
    // the smaller vec_id; the oracle replays every iteration as an
    // unrolled CTE chain (the q92/q129 full-trajectory doctrine).
    //
    // Scale shape: K linear passes over the vectors (each pass one
    // narrow zip_with + a bounded-heap top-1), one 64-float center
    // collected per pass — nothing O(corpus) is ever shuffled or
    // collected, and K is a constant.
    "q156_kcenter_coreset" -> { (s, d) =>
      import s.implicits._
      kcenterCoreset(Tables.embeddings(s, d).select($"vec_id", $"embedding"))
    },

    // Per-dimension Fisher discriminant ratio of the labeled
    // embeddings (Fisher 1936; Ho & Basu 2002 call exactly this the
    // F1 class-separability complexity measure): for each dimension,
    // between-class scatter Σ_c n_c(μ_c − μ)² over within-class
    // scatter Σ_c n_c σ_c² — the "can a linear probe even work on
    // these labels" number read BEFORE training q98 (ratio ≈ 0
    // everywhere means the probe will learn priors, not features),
    // and the per-dim view that says WHICH coordinates carry the
    // label signal (q129's top-PC says where variance lives; this
    // says where DISCRIMINATION lives — not the same dims when the
    // nuisance variance dominates). Determinism: per-(label, dim)
    // Σx/Σx² are int64 micro sums (q143's device); both scatter
    // terms are fixed-order double expressions over those exact
    // integers, micro-quantized per label BEFORE the order-free
    // integer sum over labels; the final ratio is ONE double
    // division. An all-constant dim (zero within-scatter) reports
    // ratio 0, guarded. Scale shape: ONE posexplode pass map-side-
    // combines to O(labels·dims) rows; everything after runs on that
    // tiny frame (the global moments derive from it — no second
    // corpus pass).
    "q166_fisher_ratio" -> { (s, d) =>
      import s.implicits._
      fisherRatio(Tables.embeddings(s, d).select($"label", $"embedding"))
    },

    // Poisson-bootstrap confidence intervals (Chamandy et al. 2012,
    // "Estimating Uncertainty for Massive Data Streams" — Google's
    // distributed bootstrap; Efron 1979 underneath): every corpus
    // statistic the audit pack reports is a point estimate, and
    // this is the operator that says HOW SURE. Classic resampling
    // draws n rows with replacement — impossible distributed — but
    // the multinomial replicate weights converge to iid Poisson(1),
    // so each row draws its weight for each of the B replicates
    // from a hash of (doc_id, b): one pass, embarrassingly
    // parallel, reproducible by seed. Metric here: mean document
    // token length per source; CI = the 2nd / (B−1)th order
    // statistics of the B weighted replicate means (≈ 2.5%/97.5% at
    // B = 40). Determinism: the Poisson inverse-CDF is integer
    // thresholds on mix()'s near-uniform-over-[0, P) output — zero
    // floating-point until the final single-division mean,
    // micro-rounded.
    //
    // Scale shape: the B-way explode inflates rows BEFORE the
    // map-side combine, so the shuffle carries O(sources × B)
    // partials, never the corpus; the order statistics run on that
    // tiny frame. Weighted sums stay in int64 (micro headroom
    // ~9e12 token-weight units per (source, replicate) — comment
    // bound, not a runtime reach at any plausible shard).
    "q172_bootstrap_ci" -> { (s, d) =>
      bootstrapCi(bootInput(Tables.documents(s, d)))
    },

    // EXACT verbatim-passage syndication matrix: for every provider
    // pair that shares at least one W-word shingle, the exact count
    // of distinct shared shingle types, each side's type total, and
    // the exact Jaccard — the one-shot AUDIT twin of q138 (whose
    // KMV bottom-k sketch ESTIMATES this same Jaccard in constant
    // state for routine monitoring; a procurement dispute or a
    // provenance-spoofing investigation wants the exact number and
    // the exact shared-passage count, q128/q180 say how much
    // duplication exists, this says between WHOM it flows). Pairs
    // sharing nothing are absent by design — the sparse complement
    // of q138's every-pair report.
    //
    // Scale shape: one shingle pass → DISTINCT (source, shingle)
    // table (map-side combined); the pair join is keyed on the
    // shingle hash with fan-out ≤ carrying-sources² per shingle —
    // bounded by |providers|² (provider cardinality is 10s–100s; at
    // q24-style document cardinality this join would need the
    // banded/capped devices, which is exactly why the DOCUMENT-pair
    // problem runs through LSH while the PROVIDER-pair audit can
    // afford exactness); per-source type totals broadcast back.
    "q181_syndication" -> { (s, d) =>
      syndication(Tables.documents(s, d))
    }
  )

  /** q172: replicate count and the order-statistic picks (2nd and
    * 39th of 40 ≈ the 2.5%/97.5% percentile bootstrap). */
  private val BootB  = 40
  private val BootLo = 2
  private val BootHi = BootB - 1

  /** q172: Poisson(1) inverse-CDF thresholds scaled to mix()'s
    * actual near-uniform range — floor(CDF(k) · P) for k = 0..6
    * (P = 1e9+7, the modulus the finalizer's last reduce bounds the
    * hash by; see [[mix]]'s range note — 2^31 scaling was the bug
    * the randomized differential caught: it made the weights
    * Bernoulli(0.21) instead of Poisson(1)). A hash above the last
    * bucket draws weight 7 (residual mass 8.3e-5); measured
    * calibration over 2e5 hashes: mean 1.0006, variance 0.997. */
  private[graft] val PoisT: Array[Long] = Array(367879443L, 735758887L,
    919698609L, 981011849L, 996340160L, 999405822L, 999916765L)

  private[graft] def poissonW(h: Column): Column =
    PoisT.zipWithIndex.foldRight(lit(PoisT.length.toLong)) {
      case ((t, k), rest) => when(h < lit(t), lit(k.toLong)).otherwise(rest)
    }

  private def sqlPoissonW(h: String): String =
    "CASE " + PoisT.zipWithIndex.map { case (t, k) =>
      s"WHEN $h < $t THEN $k" }.mkString(" ") +
      s" ELSE ${PoisT.length} END"

  /** The q172 chain over any (source, doc_id, len) frame (spec
    * hook: planted two-source frame with hand-replayed replicate
    * weights — SketchSpec). Replicates whose total weight is 0 are
    * dropped identically in both engines (probability e^{-n} per
    * replicate — deterministic either way, and dropping avoids
    * engine-specific NULL ordering in the rank window). */
  private[graft] def bootstrapCi(docs: DataFrame): DataFrame = {
    // both partials scan the frame — persist the id-width projection
    // so the tokenize upstream runs once (the absorb path in
    // GovernanceMaintenance persists its own copy the same way)
    val in = docs
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    bootstrapCiFromCounts(bootRepPartials(in), bootPointPartials(in))
  }

  /** q172's (source, doc_id, len) projection off a raw document
    * frame — shared by the gated query and the maintenance absorb. */
  private[graft] def bootInput(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select($"source", $"doc_id",
      graft.ops.TextOps.tokenCount($"text").cast("long").as("len"))
  }

  /** q172's replicate sufficient statistic: per-(source, replicate)
    * weighted sums. The Poisson weight is a pure function of
    * (doc_id, b), so disjoint deliveries SUM — the additive fact
    * [[graft.pipeline.GovernanceMaintenance]] leans on to serve the
    * full-corpus CI incrementally at O(batch) per delivery. */
  private[graft] def bootRepPartials(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select($"source", $"doc_id", $"len",
        explode(sequence(lit(1), lit(BootB))).as("b"))
      .withColumn("w", poissonW(mix($"doc_id" * lit(41L) + $"b")))
      .groupBy($"source", $"b")
      .agg(sum($"w" * $"len").as("s"), sum($"w").as("wsum"))
  }

  /** q172's point-estimate sufficient statistic (additive). */
  private[graft] def bootPointPartials(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.groupBy($"source")
      .agg(count(lit(1)).as("n_docs"), sum($"len").as("lsum"))
  }

  /** q172 over pre-aggregated replicate/point partials. */
  private[graft] def bootstrapCiFromCounts(reps: DataFrame,
                                           point: DataFrame): DataFrame = {
    val spark = reps.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val meanMicro = (s: Column, n: Column) =>
      floor(s.cast("double") / n.cast("double") * lit(1e6) + lit(0.5))
        .cast("long")
    val rm = reps
      .filter($"wsum" > 0L)
      .withColumn("mean_micro", meanMicro($"s", $"wsum"))
    // rank window over the O(sources × B) aggregate output — the
    // PlanAudit-sanctioned shape (bounded input, never the corpus)
    val win = Window.partitionBy($"source").orderBy($"mean_micro", $"b")
    val ci = rm
      .withColumn("rn", row_number().over(win))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_boot"),
        max(when($"rn" === BootLo, $"mean_micro")).as("ci_lo_micro"),
        max(when($"rn" === BootHi, $"mean_micro")).as("ci_hi_micro"))
    point
      .select($"source", $"n_docs",
        meanMicro($"lsum", $"n_docs").as("mean_micro"))
      .join(ci, Seq("source"))
      .select($"source", $"n_docs", $"mean_micro", $"n_boot",
        $"ci_lo_micro", $"ci_hi_micro")
      .orderBy($"source")
  }

  /** q156: coreset size. */
  private val KcenterK = 8

  /** The q156 chain over any (vec_id, embedding) frame (spec hook:
    * planted collinear geometry with a hand-computed selection
    * order — SketchSpec). Fewer vectors than K yields one row per
    * vector (the whole set is the coreset). */
  private[graft] def kcenterCoreset(emb: DataFrame): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val vecs = emb
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      def d2To(center: Array[Double]) = aggregate(
        zip_with($"v", typedLit(center), (x, y) =>
          floor((x - y) * (x - y) * lit(1e6) + lit(0.5)).cast("bigint")),
        lit(0L), (acc, t) => acc + t)
      val first = vecs.orderBy($"vec_id").limit(1).collect()
      if (first.isEmpty) {
        Seq.empty[(Long, Long, Long)].toDF("rn", "vec_id", "radius_micro")
      } else {
        val chosen = scala.collection.mutable.ArrayBuffer(
          (1L, first(0).getLong(0), 0L))
        var center = first(0).getSeq[Double](1).toArray
        var cur = vecs.withColumn("md", d2To(center))
        var done = false
        while (chosen.length < KcenterK && !done) {
          val nxt = cur
            .filter(!$"vec_id".isin(chosen.map(_._2).toSeq: _*))
            .orderBy($"md".desc, $"vec_id").limit(1)
            .select($"vec_id", $"v", $"md").collect()
          if (nxt.isEmpty) done = true
          else {
            chosen += ((chosen.length + 1L, nxt(0).getLong(0), nxt(0).getLong(2)))
            center = nxt(0).getSeq[Double](1).toArray
            cur = cur.withColumn("md", least($"md", d2To(center)))
          }
        }
        chosen.toSeq.toDF("rn", "vec_id", "radius_micro").orderBy($"rn")
      }
    } finally vecs.unpersist()
  }

  /** The q150 chain over any (label, embedding) frame (spec hook:
    * planted centroids with closed-form pairwise distances —
    * SketchSpec). A single-label corpus has no other centroid and
    * reports no row (a confusability table needs ≥ 2 classes). */
  private[graft] def centroidConfusion(emb: DataFrame): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val per = emb.select($"label".cast("bigint").as("label"),
        posexplode($"embedding".cast("array<double>")))
      .withColumnRenamed("pos", "dim").withColumnRenamed("col", "x")
      .groupBy($"label", $"dim").agg(
        count(lit(1)).as("n"),
        sum(floor($"x" * lit(1e6) + lit(0.5)).cast("bigint")).as("s1"))
    val a = per.select($"label".as("la"), $"dim",
      $"n".as("na"), $"s1".as("sa"))
    val b = per.select($"label".as("lb"), $"dim",
      $"n".as("nb"), $"s1".as("sb"))
    val mua = $"sa".cast("double") / lit(1e6) / $"na".cast("double")
    val mub = $"sb".cast("double") / lit(1e6) / $"nb".cast("double")
    val d2 = a.join(b, Seq("dim")).filter($"la" =!= $"lb")
      .select($"la", $"lb", $"na",
        floor((mua - mub) * (mua - mub) * lit(1e6) + lit(0.5))
          .cast("bigint").as("term"))
      .groupBy($"la", $"lb")
      .agg(min($"na").as("n_docs"), sum($"term").as("d2_micro"))
    d2.groupBy($"la")
      .agg(min($"n_docs").as("n_docs"),
        min(struct($"d2_micro", $"lb")).as("best"))
      .select($"la".as("label"), $"n_docs",
        $"best".getField("lb").as("nearest"),
        $"best".getField("d2_micro").as("d2_micro"))
      .orderBy($"label")
  }

  /** q138 sketch size (bottom-k per source) and shingle width. At
    * k=128 the resemblance stderr is ≈ √(J(1−J)/k) ≤ 4.4% — the
    * report-grade trade; the GATE is exact either way because both
    * engines replay the same deterministic sketch. */
  private val OverlapK = 128
  private val OverlapShingleW = 3

  /** q181: the exact pair join is affordable ONLY at provider
    * cardinality (10s–100s; fan-out per shingle is
    * carrying-sources²) — this bound is the in-plan tripwire against
    * a caller keying it by doc_id, where the same join explodes to
    * carrying-docs² per shingle. 1024 is ~10× real provider counts;
    * document-scale dedup runs through q24's banded/capped LSH. */
  private[graft] val SyndicationMaxSources = 1024

  /** The q181 chain over any (source, text) frame (spec hook:
    * planted corpora with hand-enumerable shingle sets —
    * SketchSpec). Shares q138's shingle width so the exact matrix
    * and the KMV estimate audit the same underlying sets. */
  private[graft] def syndication(docs: DataFrame,
                                 maxSources: Int = SyndicationMaxSources): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // persisted (the q93 multi-reference device; lifecycle is the
    // Verify/Bench clearCache contract): the distinct (source,
    // shingle) table feeds FOUR plan references — the type totals,
    // the r18 cardinality guard, and both pair-join sides — and the
    // scan+shingle+distinct chain would otherwise run once per
    // reference (measured +49% on the gate corpus when the guard
    // added the fourth)
    val ss = docs.select($"source", explode(
        graft.ops.expressions.ShingleHashes($"text", OverlapShingleW)).as("h"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ts = ss.groupBy($"source").agg(count(lit(1)).as("types"))
    // cardinality guard (J1's in-plan raise_error device, r17 verdict
    // ask): a 1-row source count that THROWS above the bound, crossed
    // into the pair join's left input — the quadratic join cannot
    // stream a row before the guard row materializes, so document-
    // keyed misuse dies with a diagnosis instead of an OOM hours in.
    // O(sources) agg rows — the cost is one more pass over ts's input.
    val guard = ss.select($"source").distinct()
      .agg(count(lit(1)).as("n_src"))
      .select(when($"n_src" > lit(maxSources.toLong),
          raise_error(concat(
            lit("syndication: source cardinality "), $"n_src",
            lit(s" exceeds $maxSources — the exact provider-pair join is " +
              "quadratic per shingle; document-scale inputs must use the " +
              "banded near-dup family (q24), or raise maxSources deliberately"))))
        .otherwise($"n_src").as("n_src_ok"))
    // the guard column must be CONSUMED (filter), not dropped: column
    // pruning would otherwise strip the raise_error projection and
    // keep only the 1-row count for the cross join
    val shared = ss.select($"h", $"source".as("src_a"))
      .crossJoin(broadcast(guard))
      .filter($"n_src_ok" >= lit(0L)).drop("n_src_ok")
      .join(ss.select($"h", $"source".as("src_b")), Seq("h"))
      .filter($"src_a" < $"src_b")
      .groupBy($"src_a", $"src_b")
      .agg(count(lit(1)).as("n_shared"))
    shared
      .join(broadcast(ts.select($"source".as("src_a"), $"types".as("types_a"))),
        Seq("src_a"))
      .join(broadcast(ts.select($"source".as("src_b"), $"types".as("types_b"))),
        Seq("src_b"))
      .select($"src_a", $"src_b", $"n_shared", $"types_a", $"types_b",
        floor($"n_shared".cast("double") /
          ($"types_a" + $"types_b" - $"n_shared").cast("double")
          * lit(1e6) + lit(0.5)).cast("long").as("jaccard_micro"))
      .orderBy($"src_a", $"src_b")
  }

  /** The q138 chain over any (source, text) frame (spec hook:
    * planted shingle sets with closed-form sketch intersections —
    * SketchSpec). Every (s1 < s2) pair reports; a pair with an
    * empty union reports zeros. */
  private[graft] def sourceOverlap(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val sh = docs
      .select($"source", explode(
        graft.ops.expressions.ShingleHashes($"text", OverlapShingleW)).as("h0"))
      .select($"source", mix($"h0").as("h"))
      .distinct()
    // r19: the sketch feeds BOTH pair sides (r1 and r2) — unpersisted
    // each side re-ran the corpus shingle pass + distinct + top-K
    // (plans/r19/q138_source_overlap_before.txt: 8 scans, 2 of them
    // full shingle passes). Persisting the O(sources·k) sketch (the
    // SparkEntry cache contract) makes the corpus pass run ONCE.
    // Measured 0.80 s → 0.44 s clean at sf0.1.
    val sk = graft.plans.TopK.perKey(sh, Seq("source"),
        Seq("h" -> true), OverlapK)
      .select($"source", $"h")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // O(sources·k) rows from here on; pair set from the CORPUS so
    // shingle-less sources still report
    val srcs = docs.select($"source").distinct()
    // the O(sources²) pair spine feeds both sketch sides and the
    // final left join — persisted (r19) so the corpus's source
    // column scans twice total instead of six times
    val pairs = srcs.as("a").join(srcs.as("b"),
        col("a.source") < col("b.source"))
      .select(col("a.source").as("s1"), col("b.source").as("s2"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val r1 = pairs.join(sk, $"source" === $"s1")
      .select($"s1", $"s2", $"h", lit(1).as("side"))
    val r2 = pairs.join(sk, $"source" === $"s2")
      .select($"s1", $"s2", $"h", lit(2).as("side"))
    val byH = r1.unionByName(r2)
      .groupBy($"s1", $"s2", $"h")
      .agg((max(when($"side" === 1, 1).otherwise(0)) === 1 &&
        max(when($"side" === 2, 1).otherwise(0)) === 1).as("in_both"))
    val w = Window.partitionBy($"s1", $"s2").orderBy($"h")
    val agg = byH
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= OverlapK)
      .groupBy($"s1", $"s2")
      .agg(count(lit(1)).as("u_size"),
        sum(when($"in_both", 1L).otherwise(0L)).as("n_inter"))
    pairs.join(agg, Seq("s1", "s2"), "left")
      .select($"s1", $"s2",
        coalesce($"u_size", lit(0L)).as("u_size"),
        coalesce($"n_inter", lit(0L)).as("n_inter"))
      .withColumn("jaccard_micro",
        when($"u_size" > 0L, expr("(n_inter * 1000000) div u_size"))
          .otherwise(lit(0L)))
      .orderBy($"s1", $"s2")
  }

  /** The q143 chain over any (label, embedding) frame (spec hook:
    * planted two-class geometries with closed-form distances —
    * SketchSpec). A label that IS the whole corpus (empty
    * complement) reports n_b = 0 and distance 0. */
  private[graft] def fidDiag(emb: DataFrame): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val e = emb.select($"label".cast("bigint").as("label"),
        posexplode($"embedding".cast("array<double>")))
      .withColumnRenamed("pos", "dim").withColumnRenamed("col", "x")
    val per = e.groupBy($"label", $"dim").agg(
      count(lit(1)).as("n"),
      sum(floor($"x" * lit(1e6) + lit(0.5)).cast("bigint")).as("s1"),
      sum(floor($"x" * $"x" * lit(1e6) + lit(0.5)).cast("bigint")).as("s2"))
    val glob = per.groupBy($"dim").agg(
      sum($"n").as("gn"), sum($"s1").as("g1"), sum($"s2").as("g2"))
    val j = per.join(broadcast(glob), Seq("dim")).withColumn("nb", $"gn" - $"n")
    val muA = $"s1".cast("double") / lit(1e6) / $"n".cast("double")
    val exA = $"s2".cast("double") / lit(1e6) / $"n".cast("double")
    val muB = ($"g1" - $"s1").cast("double") / lit(1e6) / $"nb".cast("double")
    val exB = ($"g2" - $"s2").cast("double") / lit(1e6) / $"nb".cast("double")
    val varA = greatest(exA - muA * muA, lit(0.0))
    val varB = greatest(exB - muB * muB, lit(0.0))
    val term = (muA - muB) * (muA - muB) + varA + varB -
      lit(2.0) * sqrt(varA) * sqrt(varB)
    j.select($"label", $"n", $"nb",
        when($"nb" > 0L, floor(term * lit(1e6) + lit(0.5)).cast("bigint"))
          .otherwise(lit(0L)).as("term_micro"))
      .groupBy($"label")
      .agg(min($"n").as("n_a"), min($"nb").as("n_b"),
        sum($"term_micro").as("fid_micro"))
      .orderBy($"label")
  }

  /** The q166 chain over any (label, embedding) frame (spec hook:
    * planted two-class geometry with a closed-form ratio —
    * SketchSpec). */
  private[graft] def fisherRatio(emb: DataFrame): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val e = emb.select($"label".cast("bigint").as("label"),
        posexplode($"embedding".cast("array<double>")))
      .withColumnRenamed("pos", "dim").withColumnRenamed("col", "x")
    val per = e.groupBy($"label", $"dim").agg(
      count(lit(1)).as("n"),
      sum(floor($"x" * lit(1e6) + lit(0.5)).cast("bigint")).as("s1"),
      sum(floor($"x" * $"x" * lit(1e6) + lit(0.5)).cast("bigint")).as("s2"))
    val glob = per.groupBy($"dim").agg(
      sum($"n").as("gn"), sum($"s1").as("g1"))
    val j = per.join(broadcast(glob), Seq("dim"))
    val muC = $"s1".cast("double") / lit(1e6) / $"n".cast("double")
    val exC = $"s2".cast("double") / lit(1e6) / $"n".cast("double")
    val mu = $"g1".cast("double") / lit(1e6) / $"gn".cast("double")
    val varC = greatest(exC - muC * muC, lit(0.0))
    j.select($"dim",
        floor($"n".cast("double") * (muC - mu) * (muC - mu)
          * lit(1e6) + lit(0.5)).cast("bigint").as("tb"),
        floor($"n".cast("double") * varC * lit(1e6) + lit(0.5))
          .cast("bigint").as("tw"))
      .groupBy($"dim")
      .agg(sum($"tb").as("between_micro"), sum($"tw").as("within_micro"))
      .select($"dim".cast("bigint").as("dim"), $"between_micro", $"within_micro",
        when($"within_micro" > 0L,
          floor($"between_micro".cast("double")
            / $"within_micro".cast("double") * lit(1e6) + lit(0.5))
            .cast("bigint")).otherwise(lit(0L)).as("ratio_micro"))
      .orderBy($"dim")
  }

  /** The q135 chain over any (source, text) frame (spec hook:
    * planted token counts with hand-computed medians/MADs —
    * SketchSpec). Lower median = min value whose running histogram
    * count reaches ceil(n/2) (2·cum ≥ n in integers). */
  private[graft] def madFences(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // r19: the histogram feeds the median, the deviation histogram
    // AND the final fence count — unpersisted, each consumer re-ran
    // the corpus tokenCount scan (4 scans,
    // plans/r19/q135_mad_fences_before.txt). Persisting the
    // O(sources·distinct-lengths) histogram (SparkEntry cache
    // contract) makes it one pass. 0.89 s → 0.57 s clean at sf0.1.
    val h = docs
      .select($"source", graft.ops.TextOps.tokenCount($"text").cast("long").as("n_tok"))
      .groupBy($"source", $"n_tok").agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // lower median of a per-source histogram (value col -> med col)
    def lowerMedian(hist: DataFrame, v: String, out: String): DataFrame = {
      val w = Window.partitionBy($"source").orderBy(col(v))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy($"source")
      hist
        .withColumn("cum", sum($"c").over(w))
        .withColumn("n", sum($"c").over(wAll))
        .filter($"cum" * 2 >= $"n")
        .groupBy($"source", $"n")
        .agg(min(col(v)).as(out))
    }
    val med = lowerMedian(h, "n_tok", "med")              // (source, n, med)
    val devH = h.join(med.select($"source", $"med"), Seq("source"))
      .select($"source", abs($"n_tok" - $"med").as("dev"), $"c")
      .groupBy($"source", $"dev").agg(sum($"c").as("c"))
    val mad = lowerMedian(devH, "dev", "mad")
      .select($"source", $"mad")
    val fences = med.join(mad, Seq("source"))
      .select($"source", $"n".as("n_docs"), $"med", $"mad",
        ($"med" - lit(3L) * $"mad").as("lo"),
        ($"med" + lit(3L) * $"mad").as("hi"))
    h.join(fences, Seq("source"))
      .groupBy($"source", $"n_docs", $"med", $"mad", $"lo", $"hi")
      .agg(sum(when($"n_tok" < $"lo", $"c").otherwise(0L)).as("n_low"),
        sum(when($"n_tok" > $"hi", $"c").otherwise(0L)).as("n_high"))
      .orderBy($"source")
  }

  /** The q131 chain over any (embedding) frame (spec hook: planted
    * exactly-representable / saturating / constant-zero dims —
    * SketchSpec). See the entry comment for the conventions. */
  private[graft] def int8Quant(emb: DataFrame): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val ed = emb.select(
      posexplode(graft.ops.VectorOps.toDouble($"embedding"))
        .as(Seq("dim", "xv")))
    val ma = ed.groupBy($"dim").agg(max(abs($"xv")).as("ma"))
    ed.join(broadcast(ma), Seq("dim"))
      .select($"dim", $"xv", $"ma", ($"ma" / lit(127.0)).as("sc"))
      // CaseWhen evaluates lazily, so the ma = 0 (constant-zero dim)
      // branch never executes the ANSI-throwing x/0 division
      .select($"dim", $"xv", $"ma", $"sc",
        when($"ma" === 0.0, lit(0L)).otherwise(
          greatest(lit(-127L), least(lit(127L),
            floor($"xv" / $"sc" + lit(0.5))))).as("code"))
      .select($"dim", $"ma", $"code",
        ($"xv" - $"code".cast("double") * $"sc").as("e"))
      .groupBy($"dim", $"ma")
      .agg(sum(when(abs($"code") === 127L, 1L).otherwise(0L)).as("n_sat"),
        sum(floor($"e" * $"e" * lit(1e12) + lit(0.5))).as("sse_pico"))
      .select($"dim".cast("bigint").as("dim"),
        floor($"ma" * lit(1e6) + lit(0.5)).as("maxabs_micro"),
        $"n_sat", $"sse_pico")
      .orderBy($"dim")
  }

  /** The q114 stage over any (label, embedding) frame (spec hook:
    * planted collapsed / antipodal classes with closed-form
    * diversity — SketchSpec). See the q114 entry comment for the
    * identity and the scale shape. */
  private[graft] def embedDiversity(emb: DataFrame): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val stats = emb.select($"label",
        floor(graft.ops.VectorOps.normSq($"embedding") * lit(1e6) + lit(0.5))
          .as("sqm"))
      .groupBy($"label").agg(count(lit(1)).as("n"), sum($"sqm").as("sq_sum"))
    val dims = emb
      .select($"label",
        posexplode(graft.ops.VectorOps.toDouble($"embedding"))
          .as(Seq("dim", "x")))
      .select($"label", $"dim", floor($"x" * lit(1e6) + lit(0.5)).as("xm"))
      .groupBy($"label", $"dim").agg(sum($"xm").as("dsum"))
      .groupBy($"label")
      .agg(sort_array(collect_list(struct($"dim", $"dsum"))).as("ds"))
    val nD = $"n".cast("double")
    stats.join(dims, Seq("label"))
      .withColumn("mu_sq", aggregate($"ds", lit(0.0), (acc, p) =>
        acc + (p.getField("dsum").cast("double") / (nD * lit(1e6))) *
          (p.getField("dsum").cast("double") / (nD * lit(1e6)))))
      .withColumn("m2", $"sq_sum".cast("double") / lit(1e6) / nD)
      .select($"label".cast("bigint").as("label"), $"n",
        floor($"m2" * lit(1e6) + lit(0.5)).as("mean_sqnorm_micro"),
        floor($"mu_sq" * lit(1e6) + lit(0.5)).as("mu_sqnorm_micro"),
        // clamped at 0: m2 and mu_sq carry INDEPENDENT quantization
        // errors (per-row norms vs per-coordinate sums), so a
        // collapsed class can land at −1 micro — an impossible value
        // for a nonnegative statistic; both engines clamp
        greatest(lit(0L),
          floor((lit(2.0) * ($"m2" - $"mu_sq")) * lit(1e6) + lit(0.5)))
          .as("diversity_micro"))
      .orderBy($"label")
  }

  /** q127: sample size. */
  private val WSampleK = 20

  /** The q127 chain over any (doc_id, text) frame (spec hook:
    * planted heavy/light corpus — SketchSpec). Range audit (r17):
    * RANK-based (global min-of-clocks order, keep k) — no threshold
    * scaling to drift (MixRangeSpec's site sweep). Slot hash =
    * ((doc_id mod P)·Mult + t) mod P · Mult mod P — the MinHash
    * permutation family's integer form, every operand < 2.66e18 so
    * no int64 wrap under ANSI. */
  private[graft] def weightedSample(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    import graft.ops.SeededSample.{Mod, Mult}
    val clock = array_min(transform(sequence(lit(1L), $"w"),
      t => (pmod(pmod($"doc_id", lit(Mod)) * lit(Mult) + t, lit(Mod)) *
        lit(Mult)) % lit(Mod)))
    val top = docs
      .select($"doc_id", graft.ops.TextOps.tokenCount($"text")
        .cast("bigint").as("w"))
      .filter($"w" > 0L)
      .select($"doc_id", $"w", clock.as("clock"))
      .orderBy($"clock", $"doc_id").limit(WSampleK)
    top.withColumn("rn",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy($"clock", $"doc_id")).cast("bigint"))
      .select($"rn", $"doc_id", $"w", $"clock")
      .orderBy($"rn")
  }

  /** The q120 chain over any (doc_id, lang, text) frame (spec hook:
    * planted two-language corpus with separated score strata — see
    * the q120 entry comment for the recipe, scale shape, and
    * cross-engine argument). Reference predicate is q102's even-half
    * convention. */
  private[graft] def perplexitySplit(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    import graft.ops.Determinism.{avgExact, roundFix}
    val sb = Corpus.stupidBackoffSurprisal(docs,
      pmod($"doc_id", lit(2L)) === 0)
    // persisted: the scored frame feeds the KMV sample AND the
    // label pass (clearCache lifecycle as everywhere)
    val scored = sb.select($"doc_id", $"xent")
      .join(docs.select($"doc_id", $"lang"), "doc_id")
      .withColumn("hv", mix($"doc_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sampled = graft.plans.TopK.perKey(scored, Seq("lang"),
      Seq("hv" -> true, "doc_id" -> true), QuantSampleK)
    val est = sampled.groupBy($"lang")
      .agg(sort_array(collect_list($"xent")).as("vs"))
      .withColumn("m", size($"vs").cast("bigint"))
    val th = est.select($"lang",
      interpAt(lit(1.0) / lit(3.0)).as("t1"),
      interpAt(lit(2.0) / lit(3.0)).as("t2"))
    scored.join(broadcast(th), Seq("lang"))
      .select($"lang",
        when($"xent" < $"t1", "head")
          .when($"xent" < $"t2", "middle")
          .otherwise("tail").as("bucket"),
        $"xent")
      .groupBy($"lang", $"bucket")
      .agg(count(lit(1)).as("n_docs"),
        roundFix(avgExact($"xent"), 6).as("mean_xent"))
      .orderBy($"lang", $"bucket")
  }

  /** The q110 threshold stage, factored for consumers
    * ([[graft.pipeline.CurationExport]] uses it as its production
    * quality floor): per-domain FloorP-quantile thresholds from the
    * deterministic KMV bottom-k sample. Input: (lang, doc_id,
    * quality) with token-less docs already excluded; output:
    * (lang, thr) — O(domains) rows, broadcastable. ONE definition —
    * the query, its oracle, and the export cannot drift. */
  private[graft] def adaptiveFloorThresholds(scored: DataFrame): DataFrame = {
    val spark = scored.sparkSession
    import spark.implicits._
    val hashed = scored.select($"lang", $"doc_id", $"quality",
      mix($"doc_id").as("hv"))
    val sampled = graft.plans.TopK.perKey(hashed, Seq("lang"),
      Seq("hv" -> true, "doc_id" -> true), QuantSampleK)
    val est = sampled.groupBy($"lang")
      .agg(sort_array(collect_list($"quality")).as("vs"))
      .withColumn("m", size($"vs").cast("bigint"))
    est.select($"lang", interpAt(lit(FloorP)).as("thr"))
  }

  /** q110's floor percentile: drop the worst 20% of each domain. */
  private val FloorP = 0.2

  val oracles: Map[String, String] = Map(

    "q94_hll_distinct" ->
      s"""SELECT * FROM (
         |${sqlHll("event_id")}
         |UNION ALL
         |${sqlHll("user_id")}
         |) ORDER BY col_name""".stripMargin,

    // Twin of q181: q138's shingle-set derivation (same width, same
    // polyhash) WITHOUT the KMV mix/rank — exact distinct sets,
    // ordered pair join, one micro-rounded division.
    "q181_syndication" ->
      s"""WITH s0 AS (SELECT source, unnest(list_distinct(list_transform(
         |          ${TextVector.Sql.shingleSet("text", OverlapShingleW)},
         |          t -> ${TextVector.Sql.polyHash("t")}))) AS h
         |        FROM documents),
         |sh AS (SELECT DISTINCT source, h FROM s0),
         |ts AS (SELECT source, CAST(count(*) AS BIGINT) AS types
         |       FROM sh GROUP BY source),
         |shared AS (SELECT a.source AS src_a, b.source AS src_b,
         |             CAST(count(*) AS BIGINT) AS n_shared
         |           FROM sh a JOIN sh b
         |             ON a.h = b.h AND a.source < b.source
         |           GROUP BY 1, 2)
         |SELECT src_a, src_b, n_shared, ta.types AS types_a,
         |  tb.types AS types_b,
         |  CAST(floor(CAST(n_shared AS DOUBLE)
         |    / CAST(ta.types + tb.types - n_shared AS DOUBLE)
         |    * 1000000.0 + 0.5) AS BIGINT) AS jaccard_micro
         |FROM shared JOIN ts ta ON ta.source = src_a
         |JOIN ts tb ON tb.source = src_b
         |ORDER BY src_a, src_b""".stripMargin,

    "q95_cms_heavy" ->
      s"""WITH h AS (SELECT user_id, ${sqlMix("user_id")} AS hv FROM events),
         |b AS (SELECT user_id,
         |  ${sqlRowBucket("hv", C1, CmsW)} AS b1,
         |  ${sqlRowBucket("hv", C2, CmsW)} AS b2,
         |  ${sqlRowBucket("hv", C3, CmsW)} AS b3 FROM h),
         |c1 AS (SELECT b1, count(*) AS n1 FROM b GROUP BY b1),
         |c2 AS (SELECT b2, count(*) AS n2 FROM b GROUP BY b2),
         |c3 AS (SELECT b3, count(*) AS n3 FROM b GROUP BY b3),
         |t AS (SELECT user_id, b1, b2, b3, count(*) AS true_n
         |      FROM b GROUP BY user_id, b1, b2, b3)
         |SELECT user_id, true_n, least(n1, n2, n3) AS est_n
         |FROM t JOIN c1 USING (b1) JOIN c2 USING (b2) JOIN c3 USING (b3)
         |ORDER BY true_n DESC, user_id LIMIT 10""".stripMargin,

    // Twin of q127: same integer slot-hash race — pure int64
    // arithmetic, no float anywhere.
    "q127_weighted_sample" -> {
      import graft.ops.SeededSample.{Mod, Mult}
      s"""WITH t AS (SELECT doc_id,
         |             CAST(len(${TextVector.Sql.toks("text")}) AS BIGINT) AS w
         |           FROM documents),
         |c AS (SELECT doc_id, w,
         |        list_min(list_transform(range(1, w + 1), t ->
         |          ((doc_id % $Mod) * $Mult + t) % $Mod * $Mult % $Mod)) AS clock
         |      FROM t WHERE w > 0),
         |r AS (SELECT doc_id, w, clock,
         |        CAST(row_number() OVER (ORDER BY clock, doc_id) AS BIGINT) AS rn
         |      FROM c)
         |SELECT rn, doc_id, w, clock FROM r
         |WHERE rn <= $WSampleK ORDER BY rn""".stripMargin
    },

    "q96_bloom_filter" ->
      s"""WITH members AS (SELECT DISTINCT o_custkey FROM orders),
         |mh AS (SELECT o_custkey, ${sqlMix("o_custkey")} AS hv FROM members),
         |bits AS (SELECT DISTINCT bit FROM (
         |  SELECT ${sqlRowBucket("hv", C1, BloomBits)} AS bit FROM mh
         |  UNION ALL
         |  SELECT ${sqlRowBucket("hv", C2, BloomBits)} AS bit FROM mh
         |  UNION ALL
         |  SELECT ${sqlRowBucket("hv", C3, BloomBits)} AS bit FROM mh)),
         |candkeys AS (SELECT c_custkey FROM customer WHERE c_custkey % 7 = 0
         |             UNION ALL
         |             SELECT c_custkey + 1000000 AS c_custkey FROM customer
         |             WHERE c_custkey % 7 = 0),
         |cand AS (SELECT c_custkey, ${sqlMix("c_custkey")} AS hv FROM candkeys)
         |SELECT c.c_custkey,
         |  (EXISTS (SELECT 1 FROM bits
         |           WHERE bit = ${sqlRowBucket("c.hv", C1, BloomBits)})
         |   AND EXISTS (SELECT 1 FROM bits
         |           WHERE bit = ${sqlRowBucket("c.hv", C2, BloomBits)})
         |   AND EXISTS (SELECT 1 FROM bits
         |           WHERE bit = ${sqlRowBucket("c.hv", C3, BloomBits)})) AS bloom_pass,
         |  EXISTS (SELECT 1 FROM members m
         |          WHERE m.o_custkey = c.c_custkey) AS is_member
         |FROM cand c ORDER BY c.c_custkey""".stripMargin,

    "q97_approx_quantiles" -> {
      s"""WITH e AS (SELECT event_type, event_id, value,
         |             ${sqlMix("event_id")} AS hv
         |           FROM events WHERE value IS NOT NULL),
         |r AS (SELECT event_type, value,
         |        row_number() OVER (PARTITION BY event_type
         |                           ORDER BY hv, event_id) AS rn
         |      FROM e),
         |sm AS (SELECT event_type, list_sort(list(value)) AS vs,
         |         count(*) AS m
         |       FROM r WHERE rn <= $QuantSampleK GROUP BY 1),
         |t AS (SELECT event_type, count(*) AS n FROM e GROUP BY 1)
         |SELECT sm.event_type, t.n, sm.m AS n_sample,
         |  ${Oracles.fround(sqlInterp("0.5"), 6)} AS p50_est,
         |  ${Oracles.fround(sqlInterp("0.95"), 6)} AS p95_est
         |FROM sm JOIN t ON sm.event_type = t.event_type
         |ORDER BY sm.event_type""".stripMargin
    },

    // Twin of q120: q102's scoring replay (Corpus.sbOracleCtes — ONE
    // definition with the q102 oracle), the q110 sample/interpolation
    // device at the 1/3–2/3 cutpoints, identical label comparisons,
    // exact-sum bucket means.
    "q120_perplexity_split" -> {
      def q(p: String): String = {
        val idx = s"(CAST(m - 1 AS DOUBLE) * $p)"
        val vlo = s"vs[CAST(floor($idx) AS BIGINT) + 1]"
        val vhi = s"vs[CAST(ceil($idx) AS BIGINT) + 1]"
        s"$vlo + ($vhi - $vlo) * ($idx - floor($idx))"
      }
      // composed without an outer stripMargin (Corpus.bpeOracle's
      // note); CTE names stay clear of the embedded chain's
      // (t/pos/refpos/uni/tot/bi/s/sb — the q113 rebind lesson)
      "WITH " + Corpus.sbOracleCtes + ",\n" +
        s"""sc AS (SELECT sb.doc_id, d2.lang, sb.xent,
           |          ${sqlMix("sb.doc_id")} AS hv
           |        FROM sb JOIN (SELECT doc_id, lang FROM documents) d2
           |          ON d2.doc_id = sb.doc_id),
           |r AS (SELECT lang, doc_id, xent,
           |        row_number() OVER (PARTITION BY lang
           |                           ORDER BY hv, doc_id) AS rn
           |      FROM sc),
           |sm AS (SELECT lang, list_sort(list(xent)) AS vs, count(*) AS m
           |       FROM r WHERE rn <= $QuantSampleK GROUP BY 1),
           |th AS (SELECT lang, ${q("(CAST(1.0 AS DOUBLE)/3.0)")} AS t1,
           |         ${q("(CAST(2.0 AS DOUBLE)/3.0)")} AS t2 FROM sm),
           |lab AS (SELECT sc.lang,
           |          CASE WHEN sc.xent < th.t1 THEN 'head'
           |               WHEN sc.xent < th.t2 THEN 'middle'
           |               ELSE 'tail' END AS bucket, sc.xent
           |        FROM sc JOIN th ON th.lang = sc.lang)
           |SELECT lang, bucket, count(*) AS n_docs,
           |  ${Oracles.fround(Oracles.favg("xent"), 6)} AS mean_xent
           |FROM lab GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    },

    // Twin of q110: same sample selection and interpolation over the
    // quality column (Sql.quality ≡ the TextStats kernel — the
    // q26/q39/q41 contract), then the keep count under the derived
    // threshold.
    "q110_adaptive_floor" -> {
      def q(p: String): String = {
        val idx = s"(CAST(m - 1 AS DOUBLE) * $p)"
        val vlo = s"vs[CAST(floor($idx) AS BIGINT) + 1]"
        val vhi = s"vs[CAST(ceil($idx) AS BIGINT) + 1]"
        s"$vlo + ($vhi - $vlo) * ($idx - floor($idx))"
      }
      s"""WITH d AS (SELECT doc_id, lang, ${TextVector.Sql.toks("text")} AS toks
         |           FROM documents),
         |e AS (SELECT doc_id, lang,
         |        ${TextVector.Sql.quality("toks")} AS quality,
         |        ${sqlMix("doc_id")} AS hv
         |      FROM d WHERE len(toks) > 0),
         |r AS (SELECT lang, quality,
         |        row_number() OVER (PARTITION BY lang
         |                           ORDER BY hv, doc_id) AS rn
         |      FROM e),
         |sm AS (SELECT lang, list_sort(list(quality)) AS vs,
         |         count(*) AS m
         |       FROM r WHERE rn <= $QuantSampleK GROUP BY 1),
         |th AS (SELECT lang, ${q(FloorP.toString)} AS thr FROM sm)
         |SELECT e.lang, count(*) AS n_docs,
         |  CAST(floor(max(th.thr) * 1000000.0 + 0.5) AS BIGINT) AS thr_micro,
         |  CAST(sum(CASE WHEN e.quality >= th.thr THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_kept
         |FROM e JOIN th ON th.lang = e.lang
         |GROUP BY 1 ORDER BY 1""".stripMargin
    },

    // Twin of q114: identical quantize-then-BIGINT-sum stages, the
    // per-row squared norm via the shared Sql.dot fold, and the same
    // fixed-order (dim ASC) squared-mean fold over the per-class
    // dimension sums.
    "q114_embed_diversity" -> {
      val dot = TextVector.Sql.dot("v", "v")
      s"""WITH e AS (SELECT CAST(label AS BIGINT) AS label,
         |             CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |st AS (SELECT label, count(*) AS n,
         |         CAST(sum(CAST(floor(($dot) * 1000000.0 + 0.5) AS BIGINT))
         |           AS BIGINT) AS sq_sum
         |       FROM e GROUP BY 1),
         |bd AS (SELECT label, u.i AS dim,
         |         CAST(sum(CAST(floor(v[CAST(u.i AS INTEGER) + 1] * 1000000.0
         |           + 0.5) AS BIGINT)) AS BIGINT) AS dsum
         |       FROM e, unnest(range(0, len(v))) u(i) GROUP BY 1, 2),
         |dl AS (SELECT label, list(dsum ORDER BY dim) AS ds FROM bd GROUP BY 1),
         |f AS (SELECT st.label, st.n,
         |        CAST(st.sq_sum AS DOUBLE) / 1000000.0 / CAST(st.n AS DOUBLE)
         |          AS m2,
         |        list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |          list_transform(dl.ds, w ->
         |            (CAST(w AS DOUBLE) / (CAST(st.n AS DOUBLE) * 1000000.0))
         |            * (CAST(w AS DOUBLE) / (CAST(st.n AS DOUBLE) * 1000000.0)))),
         |          (a, b) -> a + b) AS mu_sq
         |      FROM st JOIN dl ON dl.label = st.label)
         |SELECT label, n,
         |  CAST(floor(m2 * 1000000.0 + 0.5) AS BIGINT) AS mean_sqnorm_micro,
         |  CAST(floor(mu_sq * 1000000.0 + 0.5) AS BIGINT) AS mu_sqnorm_micro,
         |  greatest(CAST(0 AS BIGINT),
         |    CAST(floor((2.0 * (m2 - mu_sq)) * 1000000.0 + 0.5) AS BIGINT))
         |    AS diversity_micro
         |FROM f ORDER BY label""".stripMargin
    },

    // Twin of q135: same histogram → running-count lower medians
    // (2·cum ≥ n), same integer fences.
    "q135_mad_fences" ->
      s"""WITH t AS (SELECT source,
         |             CAST(len(${TextVector.Sql.toks("text")}) AS BIGINT) AS n_tok
         |           FROM documents),
         |h AS (SELECT source, n_tok, CAST(count(*) AS BIGINT) AS c
         |      FROM t GROUP BY 1, 2),
         |m0 AS (SELECT source, n_tok,
         |         sum(c) OVER (PARTITION BY source ORDER BY n_tok
         |           ROWS UNBOUNDED PRECEDING) AS cum,
         |         sum(c) OVER (PARTITION BY source) AS n FROM h),
         |med AS (SELECT source, CAST(max(n) AS BIGINT) AS n_docs,
         |          CAST(min(n_tok) AS BIGINT) AS med
         |        FROM m0 WHERE 2*cum >= n GROUP BY source),
         |dh AS (SELECT h.source, abs(h.n_tok - med.med) AS dev,
         |         CAST(sum(c) AS BIGINT) AS c
         |       FROM h JOIN med ON h.source = med.source GROUP BY 1, 2),
         |m1 AS (SELECT source, dev,
         |         sum(c) OVER (PARTITION BY source ORDER BY dev
         |           ROWS UNBOUNDED PRECEDING) AS cum,
         |         sum(c) OVER (PARTITION BY source) AS n FROM dh),
         |mad AS (SELECT source, CAST(min(dev) AS BIGINT) AS mad
         |        FROM m1 WHERE 2*cum >= n GROUP BY source),
         |f AS (SELECT med.source, n_docs, med.med, mad.mad,
         |        med.med - 3*mad.mad AS lo, med.med + 3*mad.mad AS hi
         |      FROM med JOIN mad ON med.source = mad.source)
         |SELECT f.source, n_docs, med, mad, lo, hi,
         |  CAST(sum(CASE WHEN h.n_tok < lo THEN c ELSE 0 END) AS BIGINT)
         |    AS n_low,
         |  CAST(sum(CASE WHEN h.n_tok > hi THEN c ELSE 0 END) AS BIGINT)
         |    AS n_high
         |FROM f JOIN h ON f.source = h.source
         |GROUP BY 1, 2, 3, 4, 5, 6
         |ORDER BY f.source""".stripMargin,

    // Twin of q138: same mixed distinct-shingle sketch, bottom-k per
    // source via the q97 row_number-over-hash device, union bottom-k
    // membership counts. h is unique per source (DISTINCT after the
    // mix) and per pair (GROUP BY s1,s2,h), so the ORDER BY h ranks
    // are tie-free — the sketch is deterministic in both engines.
    "q138_source_overlap" ->
      s"""WITH s0 AS (SELECT source, unnest(list_distinct(list_transform(
         |          ${TextVector.Sql.shingleSet("text", OverlapShingleW)},
         |          t -> ${TextVector.Sql.polyHash("t")}))) AS h0
         |        FROM documents),
         |sh AS (SELECT DISTINCT source, ${sqlMix("h0")} AS h FROM s0),
         |sk AS (SELECT source, h FROM (
         |         SELECT source, h, row_number() OVER (
         |           PARTITION BY source ORDER BY h) AS rn FROM sh)
         |       WHERE rn <= $OverlapK),
         |srcs AS (SELECT DISTINCT source FROM documents),
         |pairs AS (SELECT a.source AS s1, b.source AS s2
         |          FROM srcs a JOIN srcs b ON a.source < b.source),
         |r AS (SELECT p.s1, p.s2, sk.h, 1 AS side
         |      FROM pairs p JOIN sk ON sk.source = p.s1
         |      UNION ALL
         |      SELECT p.s1, p.s2, sk.h, 2 AS side
         |      FROM pairs p JOIN sk ON sk.source = p.s2),
         |byh AS (SELECT s1, s2, h,
         |          (max(CASE WHEN side = 1 THEN 1 ELSE 0 END) = 1 AND
         |           max(CASE WHEN side = 2 THEN 1 ELSE 0 END) = 1)
         |            AS in_both
         |        FROM r GROUP BY s1, s2, h),
         |rk AS (SELECT s1, s2, in_both, row_number() OVER (
         |         PARTITION BY s1, s2 ORDER BY h) AS rn FROM byh),
         |agg AS (SELECT s1, s2, CAST(count(*) AS BIGINT) AS u_size,
         |          CAST(sum(CASE WHEN in_both THEN 1 ELSE 0 END)
         |            AS BIGINT) AS n_inter
         |        FROM rk WHERE rn <= $OverlapK GROUP BY s1, s2)
         |SELECT p.s1, p.s2,
         |  coalesce(agg.u_size, CAST(0 AS BIGINT)) AS u_size,
         |  coalesce(agg.n_inter, CAST(0 AS BIGINT)) AS n_inter,
         |  CASE WHEN coalesce(agg.u_size, CAST(0 AS BIGINT)) > 0
         |    THEN (coalesce(agg.n_inter, CAST(0 AS BIGINT)) * 1000000)
         |         // coalesce(agg.u_size, CAST(1 AS BIGINT))
         |    ELSE CAST(0 AS BIGINT) END AS jaccard_micro
         |FROM pairs p LEFT JOIN agg USING (s1, s2)
         |ORDER BY s1, s2""".stripMargin,

    // Twin of q143: q114's per-dim int64 micro sums, the identical
    // fixed-order mean/variance/sqrt expression over the exact
    // integers, per-dim terms micro-quantized before the BIGINT sum.
    // Twin of q166: the q143 per-(label, dim) micro-sum device, the
    // same fixed-order scatter expressions micro-quantized per label
    // before the BIGINT dim sums, one final double division.
    "q166_fisher_ratio" ->
      s"""WITH e AS (SELECT CAST(label AS BIGINT) AS label,
         |             CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |pd AS (SELECT label, CAST(u.i AS BIGINT) AS dim,
         |         CAST(count(*) AS BIGINT) AS n,
         |         CAST(sum(CAST(floor(v[CAST(u.i AS INTEGER) + 1]
         |           * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS s1,
         |         CAST(sum(CAST(floor(v[CAST(u.i AS INTEGER) + 1]
         |           * v[CAST(u.i AS INTEGER) + 1]
         |           * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS s2
         |       FROM e, unnest(range(0, len(v))) u(i) GROUP BY 1, 2),
         |g AS (SELECT dim, CAST(sum(n) AS BIGINT) AS gn,
         |        CAST(sum(s1) AS BIGINT) AS g1
         |      FROM pd GROUP BY 1),
         |t0 AS (SELECT pd.dim,
         |         CAST(pd.n AS DOUBLE) AS nd,
         |         CAST(pd.s1 AS DOUBLE) / 1000000.0 / CAST(pd.n AS DOUBLE) AS muc,
         |         CAST(pd.s2 AS DOUBLE) / 1000000.0 / CAST(pd.n AS DOUBLE) AS exc,
         |         CAST(g.g1 AS DOUBLE) / 1000000.0 / CAST(g.gn AS DOUBLE) AS mu
         |       FROM pd JOIN g USING (dim)),
         |tm AS (SELECT dim,
         |         CAST(floor(nd * (muc - mu) * (muc - mu)
         |           * 1000000.0 + 0.5) AS BIGINT) AS tb,
         |         CAST(floor(nd * greatest(exc - muc * muc, 0.0)
         |           * 1000000.0 + 0.5) AS BIGINT) AS tw
         |       FROM t0),
         |agg AS (SELECT dim, CAST(sum(tb) AS BIGINT) AS between_micro,
         |          CAST(sum(tw) AS BIGINT) AS within_micro
         |        FROM tm GROUP BY dim)
         |SELECT dim, between_micro, within_micro,
         |  CASE WHEN within_micro > 0
         |    THEN CAST(floor(CAST(between_micro AS DOUBLE)
         |      / CAST(within_micro AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)
         |    ELSE CAST(0 AS BIGINT) END AS ratio_micro
         |FROM agg ORDER BY dim""".stripMargin,

    "q143_group_frechet" ->
      s"""WITH e AS (SELECT CAST(label AS BIGINT) AS label,
         |             CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |pd AS (SELECT label, CAST(u.i AS BIGINT) AS dim,
         |         CAST(count(*) AS BIGINT) AS n,
         |         CAST(sum(CAST(floor(v[CAST(u.i AS INTEGER) + 1]
         |           * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS s1,
         |         CAST(sum(CAST(floor(v[CAST(u.i AS INTEGER) + 1]
         |           * v[CAST(u.i AS INTEGER) + 1]
         |           * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS s2
         |       FROM e, unnest(range(0, len(v))) u(i) GROUP BY 1, 2),
         |g AS (SELECT dim, CAST(sum(n) AS BIGINT) AS gn,
         |        CAST(sum(s1) AS BIGINT) AS g1,
         |        CAST(sum(s2) AS BIGINT) AS g2
         |      FROM pd GROUP BY 1),
         |t0 AS (SELECT pd.label, pd.n, g.gn - pd.n AS nb,
         |         CAST(pd.s1 AS DOUBLE) / 1000000.0 / CAST(pd.n AS DOUBLE) AS mua,
         |         CAST(pd.s2 AS DOUBLE) / 1000000.0 / CAST(pd.n AS DOUBLE) AS exa,
         |         CASE WHEN g.gn - pd.n > 0
         |           THEN CAST(g.g1 - pd.s1 AS DOUBLE) / 1000000.0
         |                / CAST(g.gn - pd.n AS DOUBLE) ELSE 0.0 END AS mub,
         |         CASE WHEN g.gn - pd.n > 0
         |           THEN CAST(g.g2 - pd.s2 AS DOUBLE) / 1000000.0
         |                / CAST(g.gn - pd.n AS DOUBLE) ELSE 0.0 END AS exb
         |       FROM pd JOIN g USING (dim)),
         |t1 AS (SELECT label, n, nb, mua, mub,
         |         greatest(exa - mua * mua, 0.0) AS vara,
         |         greatest(exb - mub * mub, 0.0) AS varb
         |       FROM t0),
         |tm AS (SELECT label, n, nb,
         |         CASE WHEN nb > 0
         |           THEN CAST(floor(((mua - mub) * (mua - mub) + vara + varb
         |             - 2.0 * sqrt(vara) * sqrt(varb)) * 1000000.0 + 0.5)
         |             AS BIGINT)
         |           ELSE CAST(0 AS BIGINT) END AS term_micro
         |       FROM t1)
         |SELECT label, CAST(min(n) AS BIGINT) AS n_a,
         |  CAST(min(nb) AS BIGINT) AS n_b,
         |  CAST(sum(term_micro) AS BIGINT) AS fid_micro
         |FROM tm GROUP BY label ORDER BY label""".stripMargin,

    // Twin of q150: q114's per-dim micro sums, the same fixed-order
    // squared-mean-difference terms micro-quantized before the
    // BIGINT dim sum, argmin tie-broken on the smaller label id.
    // Twin of q156: every greedy iteration replayed as an unrolled,
    // MATERIALIZED CTE pair (c_k = argmax, m_k = least-distance
    // update — inlined, the chain re-evaluates 2^K times), same
    // per-dim micro-quantize-then-sum distance, same (md DESC,
    // vec_id) tie order.
    "q156_kcenter_coreset" -> kcenterOracle,

    "q150_centroid_confusion" ->
      s"""WITH e AS (SELECT CAST(label AS BIGINT) AS label,
         |             CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |pd AS (SELECT label, CAST(u.i AS BIGINT) AS dim,
         |         CAST(count(*) AS BIGINT) AS n,
         |         CAST(sum(CAST(floor(v[CAST(u.i AS INTEGER) + 1]
         |           * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS s1
         |       FROM e, unnest(range(0, len(v))) u(i) GROUP BY 1, 2),
         |pr AS (SELECT a.label AS la, b.label AS lb, a.n AS na,
         |         CAST(floor(
         |           (CAST(a.s1 AS DOUBLE) / 1000000.0 / CAST(a.n AS DOUBLE)
         |            - CAST(b.s1 AS DOUBLE) / 1000000.0 / CAST(b.n AS DOUBLE))
         |           * (CAST(a.s1 AS DOUBLE) / 1000000.0 / CAST(a.n AS DOUBLE)
         |            - CAST(b.s1 AS DOUBLE) / 1000000.0 / CAST(b.n AS DOUBLE))
         |           * 1000000.0 + 0.5) AS BIGINT) AS term
         |       FROM pd a JOIN pd b ON a.dim = b.dim AND a.label <> b.label),
         |d2 AS (SELECT la, lb, CAST(min(na) AS BIGINT) AS n_docs,
         |         CAST(sum(term) AS BIGINT) AS d2_micro
         |       FROM pr GROUP BY la, lb),
         |r AS (SELECT la, n_docs, lb, d2_micro, row_number() OVER (
         |        PARTITION BY la ORDER BY d2_micro, lb) AS rn FROM d2)
         |SELECT la AS label, n_docs, lb AS nearest, d2_micro
         |FROM r WHERE rn = 1 ORDER BY label""".stripMargin,

    // Twin of q131: max-abs is exact (no fp-sum ambiguity), the code
    // is the same lazy-CASE clamp chain, and the SSE pico-quantizes
    // each term before the order-free BIGINT sum.
    "q131_int8_quant" ->
      s"""WITH e AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |ed AS (SELECT CAST(u.i AS INTEGER) AS dim,
         |         v[CAST(u.i AS INTEGER) + 1] AS xv
         |       FROM e, unnest(range(0, len(v))) u(i)),
         |ma AS (SELECT dim, max(abs(xv)) AS ma FROM ed GROUP BY dim),
         |cd AS (SELECT ed.dim, xv, ma.ma,
         |         CASE WHEN ma.ma = 0.0 THEN CAST(0 AS BIGINT)
         |           ELSE greatest(CAST(-127 AS BIGINT), least(CAST(127 AS BIGINT),
         |             CAST(floor(xv / (ma.ma / 127.0) + 0.5) AS BIGINT))) END AS code
         |       FROM ed JOIN ma USING (dim)),
         |er AS (SELECT dim, ma, code,
         |         xv - CAST(code AS DOUBLE) * (ma / 127.0) AS e FROM cd)
         |SELECT CAST(dim AS BIGINT) AS dim,
         |  CAST(floor(ma * 1000000.0 + 0.5) AS BIGINT) AS maxabs_micro,
         |  CAST(sum(CASE WHEN abs(code) = 127 THEN 1 ELSE 0 END) AS BIGINT) AS n_sat,
         |  CAST(sum(CAST(floor(e * e * 1000000000000.0 + 0.5) AS BIGINT)) AS BIGINT)
         |    AS sse_pico
         |FROM er GROUP BY dim, ma ORDER BY dim""".stripMargin,

    // Twin of q172: same mix() hash (sqlMix), same integer Poisson
    // thresholds, same single-division micro means, same 2nd/39th
    // order-statistic picks. DuckDB range(1, B+1) = Spark
    // sequence(1, B) = replicates 1..B.
    "q172_bootstrap_ci" -> {
      val mm = (s: String, n: String) =>
        s"CAST(floor(CAST($s AS DOUBLE) / CAST($n AS DOUBLE) " +
          "* 1000000.0 + 0.5) AS BIGINT)"
      s"""WITH dl AS (
         |  SELECT source, doc_id,
         |    CAST(len(${TextVector.Sql.toks("text")}) AS BIGINT) AS len
         |  FROM documents),
         |r AS (SELECT source, doc_id, len, u.b AS b,
         |        ${sqlMix(s"(doc_id * 41 + u.b)")} AS h
         |      FROM dl, unnest(range(1, ${BootB + 1})) u(b)),
         |rw AS (SELECT source, b, len,
         |         CAST(${sqlPoissonW("h")} AS BIGINT) AS w FROM r),
         |rm AS (SELECT source, b,
         |         CAST(sum(w * len) AS BIGINT) AS s,
         |         CAST(sum(w) AS BIGINT) AS wsum
         |       FROM rw GROUP BY 1, 2),
         |rm2 AS (SELECT source, b, ${mm("s", "wsum")} AS mean_micro
         |        FROM rm WHERE wsum > 0),
         |rk AS (SELECT source, mean_micro,
         |         row_number() OVER (PARTITION BY source
         |                            ORDER BY mean_micro, b) AS rn
         |       FROM rm2),
         |ci AS (SELECT source, CAST(count(*) AS BIGINT) AS n_boot,
         |         max(CASE WHEN rn = $BootLo THEN mean_micro END) AS ci_lo_micro,
         |         max(CASE WHEN rn = $BootHi THEN mean_micro END) AS ci_hi_micro
         |       FROM rk GROUP BY 1),
         |pt AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |         ${mm("sum(len)", "count(*)")} AS mean_micro
         |       FROM dl GROUP BY 1)
         |SELECT pt.source, n_docs, mean_micro, n_boot,
         |  ci_lo_micro, ci_hi_micro
         |FROM pt JOIN ci ON ci.source = pt.source
         |ORDER BY pt.source""".stripMargin
    }
  )

  /** q156's full-trajectory replay (see the oracle-map comment). */
  private def kcenterOracle: String = {
    def d2(a: String, b: String): String =
      s"CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), " +
        s"list_transform(range(1, len($a) + 1), i -> " +
        s"CAST(floor(($a[CAST(i AS INTEGER)] - $b[CAST(i AS INTEGER)]) " +
        s"* ($a[CAST(i AS INTEGER)] - $b[CAST(i AS INTEGER)]) " +
        s"* 1000000.0 + 0.5) AS BIGINT))), (x, y) -> x + y) AS BIGINT)"
    val steps = (2 to KcenterK).map { k =>
      val excl = (1 until k).map(j => s"SELECT vec_id FROM c$j")
        .mkString(" UNION ALL ")
      s"""c$k AS (SELECT vec_id, v, md FROM m${k - 1}
         |  WHERE vec_id NOT IN ($excl)
         |  ORDER BY md DESC, vec_id LIMIT 1),
         |m$k AS (SELECT m.vec_id, m.v, least(m.md, ${d2("m.v", "c.v")}) AS md
         |  FROM m${k - 1} m CROSS JOIN c$k c)""".stripMargin
    }.mkString(",\n")
    val out = (s"SELECT CAST(1 AS BIGINT) AS rn, vec_id, " +
      s"CAST(0 AS BIGINT) AS radius_micro FROM c1") +:
      (2 to KcenterK).map(k =>
        s"SELECT CAST($k AS BIGINT) AS rn, vec_id, md AS radius_micro FROM c$k")
    graft.ops.Determinism.Oracles.materializeCtes(
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
         |           FROM embeddings),
         |c1 AS (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 1),
         |m1 AS (SELECT e.vec_id, e.v, ${d2("e.v", "c.v")} AS md
         |       FROM e CROSS JOIN c1 c),
         |$steps
         |SELECT rn, vec_id, radius_micro FROM (
         |${out.mkString("\nUNION ALL\n")}
         |) ORDER BY rn""".stripMargin)
  }
}
