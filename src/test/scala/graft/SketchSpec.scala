package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Sketches

/** Error-bound gates for the approximate sketches (estimates are not
  * cross-engine oracle-comparable by design — these specs bound them
  * against exact answers instead, the same gate style as streaming).
  */
class SketchSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("approx_count_distinct lands within its configured rsd of the exact count") {
    val orders = Tables.orders(spark, sf)
    val exact = orders.select(countDistinct($"o_custkey")).head().getLong(0)
    val rsd = 0.02
    val est = Sketches.approxDistinct(orders, "o_custkey", rsd)
    // 5 sigma of slack on a 2% rsd — flake-proof but still tight
    assert(math.abs(est - exact).toDouble / exact <= 5 * rsd,
      s"HLL estimate $est vs exact $exact exceeds ${5 * rsd}")
  }

  test("bloom prefilter: members never drop, pass-through volume is bounded, join result identical") {
    val orders = Tables.orders(spark, sf)
    // the "small" side: customers with any high-priority order
    val keys = orders.filter($"o_orderpriority" === "1-URGENT")
      .select($"o_custkey").distinct()
    val nKeys = keys.count()
    val bloom = Sketches.bloomOf(keys, "o_custkey", nKeys, 0.03)

    val pre = Sketches.bloomPrefilter(orders, "o_custkey", bloom)
    // no false negatives: the exact join over the prefiltered side
    // equals the exact join over the raw side
    val joined = pre.join(keys, "o_custkey").select($"o_orderkey")
    val expected = orders.join(keys, "o_custkey").select($"o_orderkey")
    assert(joined.except(expected).isEmpty && expected.except(joined).isEmpty,
      "bloom prefilter changed the join result")

    // volume bound: survivors <= matches + ~fpp * non-matches (5x slack)
    val matches = expected.count()
    val nonMatches = orders.count() - matches
    val survivors = pre.count()
    assert(survivors >= matches, "a member row was dropped")
    assert(survivors - matches <= math.max(50, (5 * 0.03 * nonMatches).toLong),
      s"bloom passed ${survivors - matches} of $nonMatches non-matches at fpp 0.03")
  }

  test("count-min sketch never undercounts and overcounts within eps * N") {
    val docs = Tables.documents(spark, sf)
    val eps = 0.01
    val cms = Sketches.countMinOf(docs, "lang", eps, confidence = 0.99)
    val exact = docs.groupBy($"lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    for ((lang, cnt) <- exact) {
      val est = cms.estimateCount(lang)
      assert(est >= cnt, s"CMS undercounted $lang: $est < $cnt")
      assert(est - cnt <= (eps * n * 3).toLong + 1,
        s"CMS overcounted $lang: $est vs $cnt (N=$n)")
    }
  }

  // ---- the oracle-gated from-scratch sketches (graft.queries.Sketch):
  // the oracle pins the VALUES; these specs pin the QUALITY bounds the
  // hash-match alone cannot express.

  test("q94 from-scratch HLL: both estimator branches within 15% of exact") {
    val rows = graft.queries.Sketch.queries("q94_hll_distinct")(spark, sf)
      .collect()
    assert(rows.length == 2)
    for (r <- rows) {
      val exact = r.getAs[Long]("n_exact").toDouble
      val est = r.getAs[Double]("est_distinct")
      val rel = math.abs(est - exact) / exact
      // m=256 → rsd ≈ 6.5%; 15% is >2 sigma of slack on the raw
      // branch and generous for linear counting (measured: 1.8% on
      // user_id, 5.8% on event_id at sf0.01; 2.5%/4.1% at sf0.001)
      assert(rel <= 0.15,
        s"${r.getAs[String]("col_name")}: est $est vs exact $exact ($rel)")
    }
    // the two columns land in DIFFERENT estimator branches at every
    // shipped SF: user_id (tens-hundreds of keys) in linear counting
    // (empty registers remain), event_id (thousands) in the raw
    // harmonic-mean branch (registers saturated)
    val byName = rows.map(r => r.getAs[String]("col_name") -> r).toMap
    assert(byName("user_id").getAs[Number]("v_empty").longValue > 0)
  }

  test("q95 from-scratch CMS: one-sided error, top-1 is the true max user") {
    val rows = graft.queries.Sketch.queries("q95_cms_heavy")(spark, sf)
      .collect()
    assert(rows.length == 10)
    for (r <- rows)
      assert(r.getAs[Long]("est_n") >= r.getAs[Long]("true_n"),
        s"CMS undercounted user ${r.getAs[Long]("user_id")}")
    val trueTop = Tables.events(spark, sf).groupBy($"user_id")
      .agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"user_id").head()
    assert(rows.head.getAs[Long]("user_id") == trueTop.getAs[Long]("user_id"))
  }

  test("q96 from-scratch Bloom: zero false negatives, bounded fp rate") {
    val rows = graft.queries.Sketch.queries("q96_bloom_filter")(spark, sf)
      .collect()
    val members = rows.filter(_.getAs[Boolean]("is_member"))
    val nonMembers = rows.filter(!_.getAs[Boolean]("is_member"))
    assert(members.nonEmpty && nonMembers.nonEmpty,
      "candidate set must straddle the member set for the test to bite")
    assert(members.forall(_.getAs[Boolean]("bloom_pass")),
      "bloom dropped a true member (false negative)")
    val fp = nonMembers.count(_.getAs[Boolean]("bloom_pass"))
    // k=3, 8192 bits, ≤1500 member keys → fill ≈ 42%, fpp ≈ 7.5%;
    // 25% tolerates the small candidate sample at sf0.001
    assert(fp.toDouble / nonMembers.length <= 0.25,
      s"false-positive rate ${fp.toDouble / nonMembers.length} too high")
  }

  test("q97 sample quantiles: bounded rank error on a planted uniform, sample capped at 256") {
    // 20000 rows, values a pseudo-random permutation of 0..19999
    // (multiplier coprime to 20000), one group — exact p50 = 9999.5,
    // p95 = 18999.05. Rank stderr at k=256 is ~3.1% (p50) / ~1.4%
    // (p95); an 8%-of-range bound is >2.5 sigma yet still proves the
    // estimate tracks the distribution. Deterministic hash → no flake.
    val n = 20000
    val rows = (1 to n).map(i =>
      ("a", i.toLong, ((i.toLong * 654435747L) % n).toDouble))
      .toDF("g", "id", "value")
    val r = graft.queries.Sketch.sampleQuantiles(rows).collect()
    assert(r.length == 1)
    assert(r(0).getLong(1) == n && r(0).getLong(2) == 256,
      s"expected n=$n, n_sample=256: ${r(0)}")
    val (p50, p95) = (r(0).getDouble(3), r(0).getDouble(4))
    assert(math.abs(p50 - 9999.5) <= 0.08 * n, s"p50 estimate $p50 off")
    assert(math.abs(p95 - 18999.05) <= 0.08 * n, s"p95 estimate $p95 off")
    assert(p50 < p95)
    // a group smaller than the sample cap degrades to EXACT quantiles
    val small = (1 to 99).map(i => ("b", i.toLong, i.toDouble))
      .toDF("g", "id", "value")
    val e = graft.queries.Sketch.sampleQuantiles(small).collect()(0)
    assert(e.getLong(2) == 99 && e.getDouble(3) == 50.0,
      s"sub-cap group must be exact: $e")
  }

  test("q127 weighted sample matches the integer token-race clocks computed independently") {
    import graft.ops.SeededSample.{Mod, Mult}
    // 5 heavy docs (200 tokens) among 60 light ones (2 tokens): a
    // heavy doc's clock is the min over 100x more slots, so the
    // top-20 should be weight-tilted; the exact expected list is
    // computed HERE with the same integer formula — pure int64, so
    // the comparison is EXACT (the rejected float formulation needed
    // an ulp band; see the q127 entry comment)
    val docs = ((1L to 5L).map(i => (i, (0 until 200).map(j => s"h${i}w$j").mkString(" "))) ++
      (100L to 159L).map(i => (i, s"l${i}a l${i}b"))).toDF("doc_id", "text")
    val got = graft.queries.Sketch.weightedSample(docs)
      .select($"rn", $"doc_id", $"w", $"clock")
      .as[(Long, Long, Long, Long)].collect()
    def clock(id: Long, w: Long): Long =
      (1L to w).map(t => ((id % Mod) * Mult + t) % Mod * Mult % Mod).min
    val expected = ((1L to 5L).map(i => (i, 200L)) ++
      (100L to 159L).map(i => (i, 2L)))
      .map { case (id, w) => (id, w, clock(id, w)) }
      .sortBy(t => (t._3, t._1)).take(20)
      .zipWithIndex.map { case ((id, w, c), i) => (i + 1L, id, w, c) }
    assert(got.toSeq == expected,
      s"sample diverges from independent clocks:\n got=${got.toSeq}\n exp=$expected")
    assert(got.count(_._2 <= 5L) == 5,
      "all heavy docs should make a 20-slot sample at 100x weight")
  }

  test("q114 diversity: collapsed class = 0, antipodal halves = closed-form 2, dedup raises it") {
    // The variance identity's closed forms on planted unit vectors:
    // label 0 — four identical copies: E||x||² = ||μ||² = 1 → 0;
    // label 1 — halves at ±e1: μ = 0 → 2·E||x||² = 2;
    // label 2 — 3:1 at ±e1: μ = 0.5·e1 → 2·(1 − 0.25) = 1.5.
    val mk = (s: Float) => Array(s, 0f, 0f, 0f)
    val rows = Seq(
      (0, mk(1f)), (0, mk(1f)), (0, mk(1f)), (0, mk(1f)),
      (1, mk(1f)), (1, mk(1f)), (1, mk(-1f)), (1, mk(-1f)),
      (2, mk(1f)), (2, mk(1f)), (2, mk(1f)), (2, mk(-1f)))
      .toDF("label", "embedding")
    val r = graft.queries.Sketch.embedDiversity(rows)
      .collect().map(x => x.getLong(0) -> x.getLong(4)).toMap
    assert(r == Map(0L -> 0L, 1L -> 2000000L, 2L -> 1500000L), r.toString)
    // dedup (the q104 use case) RAISES the skewed class's diversity:
    // collapsing label 2's three +e1 copies to one gives the
    // antipodal closed form 2
    val deduped = Seq((2, mk(1f)), (2, mk(-1f))).toDF("label", "embedding")
    val d = graft.queries.Sketch.embedDiversity(deduped).collect()(0)
    assert(d.getLong(4) == 2000000L, d.toString)
  }

  test("q114's variance identity equals literal brute-force mean pairwise distance") {
    // the identity replaces the O(n²) pair scan — prove it AGAINST
    // that scan on deterministic pseudo-random vectors (the hash
    // permutation, no RNG). Tolerance: coordinates and norms each
    // quantize at 0.5 micro before aggregation, compounding to a
    // few micro on the final statistic.
    val dim = 8
    val vecs = (0 until 40).map { i =>
      val label = i % 3
      val v = Array.tabulate(dim) { d =>
        ((((i * dim + d + 1).toLong * 2654435761L) % 1000000007L).toFloat
          / 1000000007.0f) * 2.0f - 1.0f
      }
      (label, v)
    }
    val got = graft.queries.Sketch.embedDiversity(vecs.toDF("label", "embedding"))
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    vecs.groupBy(_._1).foreach { case (label, members) =>
      val xs = members.map(_._2.map(_.toDouble))
      val n = xs.length
      val brute = (for (a <- xs; b <- xs) yield
        a.zip(b).map { case (p, q) => (p - q) * (p - q) }.sum).sum / (n.toDouble * n)
      val bruteMicro = math.round(brute * 1e6)
      assert(math.abs(got(label.toLong) - bruteMicro) <= 10L,
        s"label $label: identity ${got(label.toLong)} vs brute $bruteMicro")
    }
  }

  test("q131 int8 quant: exact-grid dim reconstructs losslessly, saturation counted, zero dim inert") {
    // dim 0: values ON the int8 grid (k/127) — codes recover k
    //        exactly, SSE = 0, both extremes saturate;
    // dim 1: off-grid values — max still saturates (by construction
    //        the calibration point codes to ±127), SSE > 0;
    // dim 2: constant zero — scale 0, everything maps to code 0, no
    //        saturation, no error (and no ANSI divide-by-zero)
    val rows = Seq(
      Array(1.0f, 0.3f, 0.0f),
      Array(64f / 127f, -0.7f, 0.0f),
      Array(-1.0f, 0.11f, 0.0f))
    val out = graft.queries.Sketch.int8Quant(rows.map(r => Tuple1(r.toSeq))
        .toDF("embedding"))
      .select($"dim", $"maxabs_micro", $"n_sat", $"sse_pico")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(out.length == 3)
    val (_, ma0, sat0, sse0) = out(0)
    assert(ma0 == 1000000L && sat0 == 2L && sse0 == 0L,
      s"grid dim: $ma0 $sat0 $sse0")
    val (_, ma1, sat1, sse1) = out(1)
    assert(ma1 == 700000L && sat1 == 1L && sse1 > 0L,
      s"off-grid dim: $ma1 $sat1 $sse1")
    val (_, ma2, sat2, sse2) = out(2)
    assert(ma2 == 0L && sat2 == 0L && sse2 == 0L,
      s"zero dim: $ma2 $sat2 $sse2")
  }

  test("q138 overlap: planted shingle sets with closed-form sketch intersections") {
    // Below the k=128 cap KMV degenerates to the EXACT distinct
    // shingle sets, so every expectation is closed-form:
    //   A "a b c d"  -> 3-shingles {a b c, b c d}
    //   B "a b c e"  -> {a b c, b c e}   |A∩B|=1, |A∪B|=3
    //   C "x y"      -> <3 tokens, NO shingles (empty sketch)
    //   F "z z"      -> empty sketch too -> (C,F) exercises the
    //                   left-join keep-zero path (no union rows)
    // At the cap: D and E share one 200-distinct-token text ->
    // 198 shingles each, identical sets, so their bottom-128
    // sketches are identical whatever the hash order: union
    // bottom-128 has all members in both (128, 128, J=1.0). Any
    // disjoint pair against D/E unions to >=128 rows -> u_size
    // pinned at the cap with 0 intersections.
    val big = (1 to 200).map(i => s"t$i").mkString(" ")
    val docs = Seq(
      ("A", "a b c d"), ("B", "a b c e"), ("C", "x y"),
      ("D", big), ("E", big), ("F", "z z")
    ).toDF("source", "text")
    val out = graft.queries.Sketch.sourceOverlap(docs)
      .as[(String, String, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("A", "B", 3L, 1L, 333333L),
      ("A", "C", 2L, 0L, 0L),
      ("A", "D", 128L, 0L, 0L),
      ("A", "E", 128L, 0L, 0L),
      ("A", "F", 2L, 0L, 0L),
      ("B", "C", 2L, 0L, 0L),
      ("B", "D", 128L, 0L, 0L),
      ("B", "E", 128L, 0L, 0L),
      ("B", "F", 2L, 0L, 0L),
      ("C", "D", 128L, 0L, 0L),
      ("C", "E", 128L, 0L, 0L),
      ("C", "F", 0L, 0L, 0L),
      ("D", "E", 128L, 128L, 1000000L),
      ("D", "F", 128L, 0L, 0L),
      ("E", "F", 128L, 0L, 0L)))
  }

  test("q135 fences: hand-computed lower medians and MAD, singleton source degenerate") {
    // source X token counts 10,12,12,13,50: lower median = 12
    // (n=5, rank 3), deviations {2,0,0,1,38} -> sorted 0,0,1,2,38,
    // MAD = 1; fences [9,15]: nothing below, one above (50).
    // source Y: a single 7-token doc -> med 7, MAD 0, fences
    // degenerate to [7,7], no outliers (the n=1 corner: 2*cum >= n
    // picks the only row; MAD 0 must not flag the doc itself).
    def doc(n: Int) = Seq.fill(n)("tok").mkString(" ")
    val docs = Seq(
      ("X", doc(10)), ("X", doc(12)), ("X", doc(12)), ("X", doc(13)),
      ("X", doc(50)),
      ("Y", doc(7))
    ).toDF("source", "text")
    val out = graft.queries.Sketch.madFences(docs)
      .select($"source", $"n_docs", $"med", $"mad", $"lo", $"hi",
        $"n_low", $"n_high")
      .as[(String, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    assert(out == Seq(
      ("X", 5L, 12L, 1L, 9L, 15L, 0L, 1L),
      ("Y", 1L, 7L, 0L, 7L, 7L, 0L, 0L)))
  }

  test("q143 group Fréchet: planted two-class geometry matches the closed form, lone label inert") {
    def micro(v: Double): Long = math.floor(v * 1e6 + 0.5).toLong
    // dim 0: A = {0.0, 0.2} (mu .1, var .01), B = {0.1, 0.3}
    // (mu .2, var .01); dim 1 identical across classes -> 0.
    // d2 = (mu_A - mu_B)^2 + var_A + var_B - 2*sigma_A*sigma_B
    //    = 0.01 + 0.01 + 0.01 - 2*0.01 = 0.01
    val emb = Seq(
      (0, Seq(0.0, 0.5)), (0, Seq(0.2, 0.5)),
      (1, Seq(0.1, 0.5)), (1, Seq(0.3, 0.5)))
      .toDF("label", "embedding")
    val out = graft.queries.Sketch.fidDiag(emb)
      .as[(Long, Long, Long, Long)].collect().toSeq
    // replicate the engine's exact pipeline: per-dim micro sums ->
    // fixed-order double expression -> micro term
    def term(as: Seq[Double], bs: Seq[Double]): Long = {
      def s1(v: Seq[Double]) = v.map(x => micro(x)).sum
      def s2(v: Seq[Double]) = v.map(x => micro(x * x)).sum
      val (na, nb) = (as.length.toDouble, bs.length.toDouble)
      val mua = s1(as).toDouble / 1e6 / na; val exa = s2(as).toDouble / 1e6 / na
      val mub = s1(bs).toDouble / 1e6 / nb; val exb = s2(bs).toDouble / 1e6 / nb
      val vara = math.max(exa - mua * mua, 0.0)
      val varb = math.max(exb - mub * mub, 0.0)
      micro((mua - mub) * (mua - mub) + vara + varb -
        2.0 * math.sqrt(vara) * math.sqrt(varb))
    }
    val d0 = term(Seq(0.0, 0.2), Seq(0.1, 0.3))
    val d1 = term(Seq(0.5, 0.5), Seq(0.5, 0.5))
    val expected = d0 + d1
    assert(out == Seq((0L, 2L, 2L, expected), (1L, 2L, 2L, expected)),
      s"got $out, want fid $expected")
    assert(math.abs(expected - 10000L) <= 2, s"d2 $expected not ~ 0.01")

    // a label that IS the corpus: empty complement reports 0, not NaN
    val lone = Seq((7, Seq(0.1, 0.2))).toDF("label", "embedding")
    assert(graft.queries.Sketch.fidDiag(lone)
      .as[(Long, Long, Long, Long)].collect().toSeq == Seq((7L, 1L, 0L, 0L)))
  }

  test("q150 centroid confusion: planted centroids pick the true nearest class, lone label reports nothing") {
    def micro(v: Double): Long = math.floor(v * 1e6 + 0.5).toLong
    // centroids: L0 = (0.1, 0), L1 = (0.15, 0), L2 = (0.9, 0.5)
    val emb = Seq(
      (0, Seq(0.0, 0.0)), (0, Seq(0.2, 0.0)),
      (1, Seq(0.15, 0.0)),
      (2, Seq(0.9, 0.5)))
      .toDF("label", "embedding")
    val out = graft.queries.Sketch.centroidConfusion(emb)
      .as[(Long, Long, Long, Long)].collect().toSeq
    // replay the engine's quantized pipeline per dim pair
    def cent(vs: Seq[Seq[Double]]): Seq[Double] = {
      val n = vs.length.toDouble
      vs.head.indices.map(d =>
        vs.map(v => micro(v(d))).sum.toDouble / 1e6 / n)
    }
    def d2(a: Seq[Double], b: Seq[Double]): Long =
      a.zip(b).map { case (x, y) => micro((x - y) * (x - y)) }.sum
    val c0 = cent(Seq(Seq(0.0, 0.0), Seq(0.2, 0.0)))
    val c1 = cent(Seq(Seq(0.15, 0.0)))
    val c2 = cent(Seq(Seq(0.9, 0.5)))
    assert(out == Seq(
      (0L, 2L, 1L, d2(c0, c1)),
      (1L, 1L, 0L, d2(c1, c0)),
      (2L, 1L, 1L, d2(c2, c1))), s"got $out")
    assert(d2(c0, c1) == 2500L && d2(c2, c1) == 812500L)
    // one class only: no other centroid, no row
    assert(graft.queries.Sketch.centroidConfusion(
      Seq((7, Seq(0.1, 0.2))).toDF("label", "embedding")).count() == 0L)
  }

  test("q156 k-center: planted collinear geometry selects in the exact farthest-point order, short set clamps") {
    // points on a line: v1=0, v2=10, v3=1, v4=6, v5=0.5 — greedy
    // from min-id v1: v2 (d²=100), v4 (min-dist 16 to v2), v3 (1 to
    // v1), v5 (0.25 to v1); radii decrease, 5 < K rows (the clamp)
    val emb = Seq(
      (1L, Seq(0.0, 0.0)), (2L, Seq(10.0, 0.0)), (3L, Seq(1.0, 0.0)),
      (4L, Seq(6.0, 0.0)), (5L, Seq(0.5, 0.0)))
      .toDF("vec_id", "embedding")
    val out = graft.queries.Sketch.kcenterCoreset(emb)
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, 1L, 0L),
      (2L, 2L, 100000000L),
      (3L, 4L, 16000000L),
      (4L, 3L, 1000000L),
      (5L, 5L, 250000L)), s"q156 trajectory diverges: $out")
    // the radius sequence is non-increasing after the seed — the
    // Gonzalez coverage-radius property
    val radii = out.drop(1).map(_._3)
    assert(radii == radii.sortBy(-_), "coverage radii must not increase")
    // a singleton set is its own coreset
    assert(graft.queries.Sketch.kcenterCoreset(
      Seq((9L, Seq(1.0, 2.0))).toDF("vec_id", "embedding"))
      .as[(Long, Long, Long)].collect().toSeq == Seq((1L, 9L, 0L)))
  }

  test("q166 Fisher ratio: separated classes score the closed form, constant dim guards to 0") {
    // dim 0: A = {0, 2} (mu 1, var 1), B = {4, 6} (mu 5, var 1),
    // global mu 3 → between = 2·4 + 2·4 = 16, within = 2 + 2 = 4,
    // ratio = 4 exactly. dim 1: constant 7 → both scatters 0,
    // guarded ratio 0.
    val emb = Seq(
      (0, Seq(0.0, 7.0)), (0, Seq(2.0, 7.0)),
      (1, Seq(4.0, 7.0)), (1, Seq(6.0, 7.0)))
      .toDF("label", "embedding")
    val out = graft.queries.Sketch.fisherRatio(emb)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (0L, 16000000L, 4000000L, 4000000L),
      (1L, 0L, 0L, 0L)), s"q166 diverges: $out")
  }

  test("randomized differential: q166 matches an in-memory scatter reference on random labeled vectors") {
    def micro(v: Double): Long = math.floor(v * 1e6 + 0.5).toLong
    val rnd = new scala.util.Random(20260821L)
    for (trial <- 1 to 3) {
      val dims = 3
      val vecs = (0 until 25).map { _ =>
        (rnd.nextInt(3), Vector.fill(dims)(rnd.nextDouble() * 2 - 1)) }
      val df = vecs.toDF("label", "embedding")
      val got = graft.queries.Sketch.fisherRatio(df)
        .as[(Long, Long, Long, Long)].collect().toSeq
      val want = (0 until dims).map { d =>
        val per = vecs.groupBy(_._1).toSeq.map { case (_, vs) =>
          val xs = vs.map(_._2(d))
          (xs.size.toLong, xs.map(micro).sum,
            xs.map(x => micro(x * x)).sum)
        }
        val (gn, g1) = (per.map(_._1).sum, per.map(_._2).sum)
        val mu = g1.toDouble / 1e6 / gn.toDouble
        val tb = per.map { case (n, s1, _) =>
          val muC = s1.toDouble / 1e6 / n.toDouble
          micro(n.toDouble * (muC - mu) * (muC - mu)) }.sum
        val tw = per.map { case (n, s1, s2) =>
          val muC = s1.toDouble / 1e6 / n.toDouble
          val exC = s2.toDouble / 1e6 / n.toDouble
          micro(n.toDouble * math.max(exC - muC * muC, 0.0)) }.sum
        val ratio = if (tw > 0)
          math.floor(tb.toDouble / tw.toDouble * 1e6 + 0.5).toLong else 0L
        (d.toLong, tb, tw, ratio)
      }
      assert(got == want, s"trial $trial: q166 diverges\n got $got\nwant $want")
    }
  }

  test("q172 bootstrap CI: constant lengths degenerate to the point; mixed lengths bracket it") {
    val a = (1L to 30L).map(i => ("srcA", i, 50L))
    val b = (31L to 60L).map(i => ("srcB", i, if (i % 2 == 0) 10L else 90L))
    val out = graft.queries.Sketch.bootstrapCi(
      (a ++ b).toDF("source", "doc_id", "len"))
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    val Seq((sa, na, ma, ba, loA, hiA), (sb, nb, mb, bb, loB, hiB)) = out
    // srcA: every replicate resamples only 50-token docs — every
    // replicate mean is exactly 50e6 and the interval is the point
    assert((sa, na, ma, ba, loA, hiA) ==
      ("srcA", 30L, 50000000L, 40L, 50000000L, 50000000L), s"srcA: $out")
    // srcB: alternating 10/90 → point mean exact, a proper interval
    // inside the data range that brackets the point estimate
    assert(sb == "srcB" && nb == 30L && mb == 50000000L && bb == 40L)
    assert(loB < hiB && loB >= 10000000L && hiB <= 90000000L)
    assert(loB <= mb && mb <= hiB, s"srcB CI misses the mean: $out")
  }

  test("randomized differential: q172 matches an in-memory hash/Poisson/order-statistic replay") {
    // full-chain replay: the mix() stages, the integer Poisson
    // thresholds, the per-replicate weighted means, the 2nd/39th
    // order statistics — any drift in any stage moves an integer
    val P = 1000000007L
    def mix(k: Long): Long = {
      val s1 = (k % P) * 654435747L % P
      val x1 = s1 ^ (s1 >> 15)
      val s2 = x1 * 961748941L % P
      val x2 = s2 ^ (s2 >> 13)
      val s3 = x2 * 920419813L % P
      s3 ^ (s3 >> 16)
    }
    val thresholds = Seq(367879443L, 735758887L, 919698609L,
      981011849L, 996340160L, 999405822L, 999916765L)
    def pois(h: Long): Long = thresholds.count(h >= _).toLong
    def mm(s: Long, n: Long): Long =
      math.floor(s.toDouble / n.toDouble * 1e6 + 0.5).toLong
    val rnd = new scala.util.Random(20260817L)
    for (trial <- 1 to 3) {
      val docs = (0L until 60L).map(id =>
        (s"s${id % 3}", id * 13 + trial, 5L + rnd.nextInt(200)))
      val want = docs.groupBy(_._1).toSeq.map { case (src, g) =>
        val reps = (1L to 40L).flatMap { b =>
          val (s, w) = g.foldLeft((0L, 0L)) { case ((s, w), (_, id, len)) =>
            val wi = pois(mix(id * 41 + b))
            (s + wi * len, w + wi)
          }
          if (w > 0) Some((mm(s, w), b)) else None
        }.sorted
        assert(reps.size == 40, s"trial $trial: a replicate emptied")
        (src, g.size.toLong, mm(g.map(_._3).sum, g.size.toLong), 40L,
          reps(1)._1, reps(38)._1)
      }.sortBy(_._1)
      val got = graft.queries.Sketch.bootstrapCi(
        docs.toDF("source", "doc_id", "len"))
        .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
      assert(got == want, s"trial $trial: q172 diverges\n got $got\nwant $want")
    }
  }

  test("q181 planted syndication: exact shared-shingle counts and Jaccard; disjoint pairs absent") {
    // W = 3 word shingles: srcA {a b c, b c d} (a duplicate doc must
    // not inflate the DISTINCT type sets), srcB {b c d, c d e},
    // srcC {x y z} — only (A, B) share, J = 1/(2+2-1) = 1/3
    val docs = Seq(
      ("srcA", "a b c d"), ("srcA", "a b c d"),
      ("srcB", "b c d e"),
      ("srcC", "x y z")).toDF("source", "text")
    val got = graft.queries.Sketch.syndication(docs)
      .as[(String, String, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("srcA", "srcB", 1L, 2L, 2L, 333333L)),
      s"q181 diverges: $got")
    // the gate corpus carries cross-source verbatim shingles at every
    // shipped SF — the gated query must exercise, never hash-match
    // an empty table
    val real = SparkEntry.queries("q181_syndication")(
      spark, "/root/testdata/sf0.01").collect()
    assert(real.nonEmpty, "gate-scale corpus should carry shared shingles")
    spark.catalog.clearCache()
  }

  test("q181 cardinality guard: document-keyed misuse raises in-plan; at-bound input passes") {
    // r17 verdict ask: nothing stopped a caller keying the exact
    // quadratic pair join by doc_id. Over the bound, the in-plan
    // guard must THROW with a diagnosis (not OOM); at the bound, the
    // result is the ordinary matrix.
    val docs = (0 until 8).map(i => (s"doc$i", "a b c d e")).toDF("source", "text")
    val err = intercept[Exception] {
      graft.queries.Sketch.syndication(docs, maxSources = 4).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(err).exists(_.contains("source cardinality")),
      s"guard should name the violation, got: ${msgs(err).mkString(" | ")}")
    // exactly at the bound: passes and reports all pairs
    val ok = graft.queries.Sketch.syndication(docs, maxSources = 8).collect()
    assert(ok.length == 8 * 7 / 2, s"at-bound run should report all pairs: ${ok.length}")
    spark.catalog.clearCache()
  }

  test("randomized differential: q181 matches an in-memory reference on random corpora") {
    // guards the distinct-set and pair logic (per-doc shingle dedup,
    // per-source type union, ordered pairs, the Jaccard rounding)
    // against an independent reference — W = 3 word shingles on a
    // small vocabulary force heavy cross-source sharing
    val rnd = new scala.util.Random(20260817L)
    for (_ <- 1 to 3) {
      val nSrc = 2 + rnd.nextInt(3)
      val vocab = (0 until 6).map(i => s"v$i")
      val rows = (0 until nSrc).flatMap { si =>
        (0 until 2 + rnd.nextInt(3)).map { _ =>
          (s"src$si",
            Vector.fill(3 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size)))
              .mkString(" "))
        }
      }
      val docs = rows.toDF("source", "text")
      // reference: distinct 3-word shingle STRINGS per source (the
      // kernel hashes them; equal strings hash equal, and collisions
      // on a 6-token vocabulary of 3-grams are impossible for the
      // polyhash's range)
      val sets = rows.groupBy(_._1).map { case (src, g) =>
        src -> g.flatMap { case (_, t) =>
          t.split(" ").sliding(3).filter(_.length == 3).map(_.mkString(" "))
        }.toSet
      }
      val srcs = sets.keys.toSeq.sorted
      val want = (for {
        i <- srcs.indices; j <- (i + 1) until srcs.length
        a = srcs(i); b = srcs(j)
        shared = (sets(a) & sets(b)).size if shared > 0
      } yield (a, b, shared.toLong, sets(a).size.toLong, sets(b).size.toLong,
        math.floor(shared.toDouble /
          (sets(a).size + sets(b).size - shared).toDouble * 1e6 + 0.5).toLong))
        .sortBy(r => (r._1, r._2))
      val got = graft.queries.Sketch.syndication(docs)
        .as[(String, String, Long, Long, Long, Long)].collect().toSeq
      assert(got == want, s"q181 random differential:\n got $got\nwant $want")
      spark.catalog.clearCache()
    }
  }
}
