package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipeline.ProbeTrainer

/** ProbeTrainer (graft.pipeline) + q98 — distributed softmax-probe
  * training pinned against a single-process reference implementing
  * the same micro-quantized full-batch GD, plus learning floors
  * (the synthetic labels carry weak linear signal, so the floors
  * assert clearly-above-chance, not benchmark accuracy).
  */
class LearnSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val sf3 = "/root/testdata/sf0.001"
  private val sf2 = "/root/testdata/sf0.01"

  /** The trainer's exact arithmetic, single-process: int64 micro
    * weights, ordered-fold logits, per-term floor(x*1e6+0.5)
    * quantization, floor(lr*g/n+0.5) updates. */
  private def refTrain(rows: Seq[(Int, Array[Double])], k: Int,
                       rounds: Int, lr: Double)
      : (Array[Array[Long]], Seq[Double]) = {
    val xb = rows.map { case (_, v) => 1.0 +: v }
    val n = rows.length
    val d = xb.head.length
    val wm = Array.fill(k, d)(0L)
    val losses = Seq.newBuilder[Double]
    for (_ <- 1 to rounds) {
      val w = wm.map(_.map(_.toDouble / 1e6))
      var lossSum = 0L
      val gm = Array.fill(k, d)(0L)
      rows.indices.foreach { i =>
        val x = xb(i)
        val ez = w.map { wl =>
          var acc = 0.0
          var j = 0
          while (j < d) { acc += x(j) * wl(j); j += 1 }
          StrictMath.exp(acc)
        }
        val den = ez.foldLeft(0.0)(_ + _)
        lossSum += math.floor(-StrictMath.log(ez(rows(i)._1) / den) * 1e6 + 0.5).toLong
        var kk = 0
        while (kk < k) {
          val gk = ez(kk) / den - (if (rows(i)._1 == kk) 1.0 else 0.0)
          var j = 0
          while (j < d) {
            gm(kk)(j) += math.floor(gk * x(j) * 1e6 + 0.5).toLong
            j += 1
          }
          kk += 1
        }
      }
      losses += lossSum.toDouble / 1e6 / n
      for (kk <- 0 until k; j <- 0 until d)
        wm(kk)(j) -= math.floor(lr * gm(kk)(j).toDouble / n + 0.5).toLong
    }
    (wm, losses.result())
  }

  private def load(sf: String): Seq[(Int, Array[Double])] =
    Tables.embeddings(spark, sf)
      .select($"label", transform($"embedding", _.cast("double")))
      .as[(Int, Array[Double])].collect().toSeq

  test("distributed training matches the single-process reference exactly, loss decreases") {
    val emb = Tables.embeddings(spark, sf3)
    val (wm, stats) = ProbeTrainer.train(emb)
    val (want, refLosses) = refTrain(load(sf3), ProbeTrainer.NumClasses,
      ProbeTrainer.Rounds, ProbeTrainer.Lr)
    assert(wm.map(_.toSeq).toSeq == want.map(_.toSeq).toSeq,
      "trained micro-weights diverge from the reference trajectory")
    // the distributed per-round loss sums are the reference's
    val refMicroSums = refLosses // already per-round means
    assert(stats.length == ProbeTrainer.Rounds)
    stats.zip(refMicroSums).foreach { case (s, want) =>
      val got = s.lossMicroSum.toDouble / 1e6 / emb.count()
      assert(math.abs(got - want) < 1e-9,
        s"round ${s.rn}: loss $got != reference $want")
    }
    // full-batch GD at this lr descends every round
    val l = stats.map(_.lossMicroSum)
    assert(l.zip(l.tail).forall { case (a, b) => b < a },
      s"loss not strictly decreasing: $l")
  }

  test("the probe learns clearly above chance at both scales") {
    // 10 balanced classes -> chance 0.10; measured 0.342 (sf0.001)
    // and 0.39 (sf0.01) at the registered geometry
    for ((sf, floor) <- Seq(sf3 -> 0.15, sf2 -> 0.15)) {
      val out = SparkEntry.queries("q98_linear_probe")(spark, sf)
      val acc = out.select(avg(when($"pred" === $"label", 1.0).otherwise(0.0)))
        .as[Double].head()
      assert(acc >= floor, s"$sf: accuracy $acc below floor $floor")
    }
  }

  test("q99 temperature resampling: smallest domain kept whole, mixture provably flattened") {
    for (sf <- Seq(sf3, sf2)) {
      val out = SparkEntry.queries("q99_domain_mixture")(spark, sf)
        .select($"lang", $"n_tokens", $"rate", $"n_kept", $"kept_tokens",
          $"n_docs")
        .as[(String, Long, Double, Long, Long, Long)].collect()
      assert(out.length >= 3, s"$sf: expected several domains, got ${out.length}")
      // the smallest-token domain downsamples nothing
      val smallest = out.minBy(_._2)
      assert(smallest._3 == 1.0, s"$sf: smallest domain rate ${smallest._3} != 1")
      // rates decrease as domains grow (tau < 1)
      val byTok = out.sortBy(_._2)
      byTok.zip(byTok.tail).foreach { case (a, b) =>
        assert(a._3 >= b._3, s"$sf: rate not monotone: $a vs $b")
      }
      // kept docs bounded by the domain's docs; a rate-1 domain
      // keeps every document (the hash compare cannot drop at 1.0)
      out.foreach { case (lang, _, rate, nKept, _, nDocs) =>
        assert(nKept >= 0 && nKept <= nDocs, s"$sf/$lang kept bounds")
        if (rate == 1.0)
          assert(nKept == nDocs, s"$sf/$lang: rate-1 domain dropped docs")
      }
      // the TEMPERED mixture is flatter: max/min kept-token ratio
      // strictly below the raw ratio (that is the point of the op)
      val rawRatio = out.map(_._2).max.toDouble / out.map(_._2).min
      val keptCounts = out.map(_._5).filter(_ > 0)
      val keptRatio = keptCounts.max.toDouble / keptCounts.min
      assert(keptRatio < rawRatio,
        s"$sf: kept ratio $keptRatio not flatter than raw $rawRatio")
    }
  }

  test("a GD round plans the kernel + partial aggregation, no UDF, no join") {
    // train()'s driver loop hides round internals from the
    // whole-catalog audit (the ClusterSpec device): one round's
    // gradient job must be kernel -> explode -> hash aggregate with
    // map-side combine — the shape that collects 651 longs, not data
    val base = Tables.embeddings(spark, sf3)
      .select($"label".cast("int").as("y"),
        concat(array(lit(1.0)),
          transform($"embedding", v => v.cast("double"))).as("xb"))
    val w = Array.fill(ProbeTrainer.NumClasses, 65)(0.001)
    val round = base
      .select(posexplode(graft.ops.expressions
        .SoftmaxGradLoss($"xb", $"y", w)).as(Seq("i", "v")))
      .groupBy($"i").agg(sum($"v"))
    val plan = round.queryExecution.executedPlan.toString
    assert(plan.contains("partial_sum"),
      s"gradient aggregate lost its map-side combine:\n$plan")
    assert(!plan.toLowerCase.contains("scalaudf") && !plan.contains("Join"),
      s"unexpected operator in the gradient round:\n$plan")
  }

  test("q100 funnel: planted duplicates and junk drop at their stage, counts monotone") {
    def clean(lang: String, id: Long, seed: Int) =
      (id, lang, (0 until 30).map(i => s"w${seed}x$i").mkString(" "))
    val en = (0L until 10L).map(i => clean("en", i, i.toInt)) ++ Seq(
      (100L, "en", (0 until 30).map(i => s"w0x$i").mkString(" ")), // dup of doc 0
      (101L, "en", ("junk " * 30).trim),                           // repetitive: ratio 1/30
      (102L, "en", "too short to pass"))                           // 4 tokens
    val de = (200L until 206L).map(i => clean("de", i, i.toInt))
    val fr = (300L until 303L).map(i => clean("fr", i, i.toInt))
    val docs = (en ++ de ++ fr).toDF("doc_id", "lang", "text")
    val out = graft.queries.Learn.curationFunnel(docs)
      .select($"lang", $"n_raw", $"n_dedup", $"n_quality", $"rate", $"n_kept")
      .as[(String, Long, Long, Long, Double, Long)].collect()
      .map(r => r._1 -> r).toMap
    // en: 13 raw, dup drops at dedup, junk+short drop at quality
    assert(out("en")._2 == 13 && out("en")._3 == 12 && out("en")._4 == 10,
      s"en funnel wrong: ${out("en")}")
    // clean langs: nothing drops before mixing
    assert(out("de")._2 == 6 && out("de")._3 == 6 && out("de")._4 == 6)
    assert(out("fr")._2 == 3 && out("fr")._3 == 3 && out("fr")._4 == 3)
    // smallest surviving domain mixes at rate 1 and keeps everything
    assert(out("fr")._5 == 1.0 && out("fr")._6 == 3, s"fr: ${out("fr")}")
    // monotone everywhere
    out.values.foreach { case (lang, raw, dd, q, _, kept) =>
      assert(raw >= dd && dd >= q && q >= kept, s"$lang funnel not monotone")
    }
    spark.catalog.clearCache() // curationFunnel persist contract
  }

  test("q99 is reproducible and partitioning-invariant: same docs kept on re-run") {
    val a = SparkEntry.queries("q99_domain_mixture")(spark, sf2).collect()
    val b = SparkEntry.queries("q99_domain_mixture")(spark, sf2).collect()
    assert(a.sameElements(b), "re-run diverged — keep decisions are not deterministic")
  }

  test("q103 DSIR: planted branches — target-affine wins, junk negative, empty neutral") {
    // target half (even ids) speaks a fixed vocabulary; candidates:
    // one target-affine doc, two junk-vocabulary docs (buckets unseen
    // in target -> negative log-ratio), one empty doc (neutral 0,
    // restored by the roster join). Expected order exercises all
    // three scoring branches.
    val tgt = (0L until 10L by 2).map(i =>
      (i, "en", "alpha beta gamma delta epsilon"))
    val cands = Seq(
      (1L, "en", "alpha beta gamma alpha beta"),
      (3L, "en", "zork mumble frotz plugh"),
      (5L, "en", "xyzzy grue bletch"),
      (7L, "en", ""))
    val docs = (tgt ++ cands).toDF("doc_id", "lang", "text")
    val out = graft.queries.Learn
      .dsirSelect(docs, pmod($"doc_id", lit(2L)) === 0L)
      .as[(String, Long, Long, Long, Long)].collect()
    spark.catalog.clearCache() // dsirSelect persist contract
    assert(out.map(_._3).toSet == Set(1L, 3L, 5L, 7L),
      s"candidate roster wrong: ${out.toSeq}")
    val byDoc = out.map(r => r._3 -> r).toMap
    assert(byDoc(1L)._2 == 1L && byDoc(1L)._5 > 0,
      s"target-affine doc not ranked first positive: ${byDoc(1L)}")
    assert(byDoc(7L)._5 == 0L && byDoc(7L)._4 == 0L,
      s"empty doc not neutral: ${byDoc(7L)}")
    Seq(3L, 5L).foreach { id =>
      assert(byDoc(id)._5 < 0, s"junk doc $id not negative: ${byDoc(id)}")
    }
    // neutral outranks negative, so the empty doc sits at rn=2
    assert(byDoc(7L)._2 == 2L, s"empty doc rank: ${byDoc(7L)}")
  }

  test("q103 randomized differential: selection matches a single-process reference") {
    // seeded random corpus with overlapping target/raw vocabularies;
    // the reference replays the exact arithmetic (per-token polyhash
    // buckets, Laplace ratio, micro-rounded ln, integer sums, rank)
    import org.apache.spark.unsafe.types.UTF8String
    val B = 256L; val topN = 8 // DsirBuckets / DsirTopN
    val rnd = new scala.util.Random(12345)
    val langs = Seq("en", "de", "fr")
    val vocab = (0 until 25).map(i => s"w$i")
    val docs: Seq[(Long, String, String)] = (0L until 48L).map { id =>
      val lang = langs(rnd.nextInt(langs.length))
      val nw = rnd.nextInt(13) // 0..12 words; 0 = empty doc
      val pool = if (id % 2 == 0) vocab.take(15) else vocab.drop(5)
      (id, lang, Seq.fill(nw)(pool(rnd.nextInt(pool.length))).mkString(" "))
    }
    def toks(t: String): Seq[String] =
      raw"[A-Za-z0-9]+|[^A-Za-z0-9 \t\n\x0B\f\r]".r.findAllIn(t).toSeq
    def bucket(w: String): Long =
      graft.ops.expressions.HashKernel.polyHash(UTF8String.fromString(w)) % B
    val pos = docs.flatMap { case (id, _, t) =>
      toks(t).map(w => (id, id % 2 == 0, bucket(w))) }
    val ct = pos.filter(_._2).groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val cr = pos.filterNot(_._2).groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val nt = ct.values.sum; val nr = cr.values.sum
    val lr = cr.map { case (b, c) =>
      b -> math.floor(math.log(
        ((ct.getOrElse(b, 0L) + 1).toDouble * (nr + B).toDouble) /
          ((c + 1).toDouble * (nt + B).toDouble)) * 1e6 + 0.5).toLong }
    val scored = pos.filterNot(_._2).groupBy(_._1).view
      .mapValues(ps => (ps.size.toLong, ps.map(p => lr(p._3)).sum)).toMap
    val want = docs.filter(_._1 % 2 == 1)
      .map { case (id, lang, _) =>
        val (ntk, lw) = scored.getOrElse(id, (0L, 0L)); (lang, id, ntk, lw) }
      .groupBy(_._1).toSeq.flatMap { case (lang, rows) =>
        rows.sortBy(r => (-r._4, r._2)).take(topN).zipWithIndex
          .map { case ((l, id, ntk, lw), i) => (l, (i + 1).toLong, id, ntk, lw) }
      }.sortBy(r => (r._1, r._2))
    val got = graft.queries.Learn
      .dsirSelect(docs.toDF("doc_id", "lang", "text"),
        pmod($"doc_id", lit(2L)) === 0L)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    spark.catalog.clearCache()
    assert(got == want, s"differential mismatch:\n got: $got\nwant: $want")
  }

  test("q103 respects the per-domain budget, selects only candidates, reruns identically") {
    val a = SparkEntry.queries("q103_dsir_select")(spark, sf2).collect()
    val b = SparkEntry.queries("q103_dsir_select")(spark, sf2).collect()
    spark.catalog.clearCache()
    assert(a.sameElements(b), "re-run diverged")
    assert(a.nonEmpty)
    a.foreach { r =>
      assert(r.getAs[Long]("doc_id") % 2 == 1, s"target doc selected: $r")
    }
    a.groupBy(_.getAs[String]("lang")).foreach { case (lang, rows) =>
      assert(rows.length <= 8, s"$lang: budget exceeded (${rows.length})")
      assert(rows.map(_.getAs[Long]("rn")).sorted.sameElements(
        (1L to rows.length.toLong)), s"$lang: ranks not contiguous")
      // within a domain, selection order is by importance weight
      val lw = rows.sortBy(_.getAs[Long]("rn")).map(_.getAs[Long]("lw_micro"))
      assert(lw.zip(lw.tail).forall { case (x, y) => x >= y },
        s"$lang: lw not descending: ${lw.toSeq}")
    }
  }

  test("q129 top-PC: planted dominant direction recovered, mean exact, lambda matches the planted variance") {
    // 420 vectors (20 full cycles of the 21 s-values) = mean (0.1
    // per dim) + s_i * axis, where axis is
    // the unit diag(8,..,8,1,..,1)/norm-ish direction: plant ALL
    // variance along ONE known unit direction, so the 8-step iterate
    // must align with it and lambda must equal Var(s) along it
    val dims = 64
    val axis0 = Array.tabulate(dims)(d => if (d < 8) 1.0 else 0.0)
    val nrm = math.sqrt(axis0.map(a => a * a).sum)
    val axis = axis0.map(_ / nrm)
    val rows = (0 until 420).map { i =>
      val s = (i % 21 - 10) / 50.0 // in [-0.2, 0.2], mean 0, known var
      Tuple1(Array.tabulate(dims)(d => (0.1 + s * axis(d)).toFloat).toSeq)
    }
    val emb = rows.toDF("embedding")
    val out = graft.queries.Learn.topPc(emb)
      .select($"dim", $"mean_micro", $"pc_micro", $"lambda_micro")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(out.length == dims)
    // mean: 0.1 everywhere plus s-mean*axis (s-mean = 0 by symmetry)
    out.foreach { case (d, m, _, _) =>
      assert(math.abs(m - 100000L) <= 3L, s"dim $d mean_micro $m != ~100000")
    }
    // direction: |cos(pc, axis)| > 0.999
    val pc = out.map(_._3.toDouble / 1e6)
    val cos = pc.zip(axis).map { case (a, b) => a * b }.sum /
      math.sqrt(pc.map(a => a * a).sum)
    assert(math.abs(cos) > 0.999, f"planted axis not recovered: |cos|=$cos%.4f")
    // lambda = mean squared projection = Var(s): s uniform over
    // {-10..10}/50 -> E[s^2] = (2/21)*sum_{1..10}(k/50)^2 = 0.0147...
    val varS = (1 to 10).map(k => math.pow(k / 50.0, 2)).sum * 2 / 21
    val lam = out.head._4.toDouble / 1e6
    assert(math.abs(lam - varS) < 0.001,
      f"lambda $lam%.4f != planted variance $varS%.4f")
    spark.catalog.clearCache() // topPc persist contract
  }

  test("q130 whitening: planted variance vanishes from the residual, projection recovers s") {
    // same construction as the q129 case: every vector is EXACTLY
    // mean + s_i·axis, so removing mean + top-PC must leave a
    // near-zero residual and proj must recover ±s_i (global sign
    // free — the iterate's sign is data-determined but consistent)
    val dims = 64
    val axis0 = Array.tabulate(dims)(d => if (d < 8) 1.0 else 0.0)
    val nrm = math.sqrt(axis0.map(a => a * a).sum)
    val axis = axis0.map(_ / nrm)
    val rows = (0 until 420).map { i =>
      val s = (i % 21 - 10) / 50.0
      (i.toLong, Array.tabulate(dims)(d => (0.1 + s * axis(d)).toFloat).toSeq)
    }
    val emb = rows.toDF("vec_id", "embedding")
    val out = graft.queries.Learn.whitenReport(emb)
      .select($"vec_id", $"norm_micro", $"proj_micro", $"resid_micro")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(out.length == 420)
    // the corpus is rank-1 around its mean: whitening removes ALL of
    // it (residual ≤ the iterate's micro-rounding, not a fraction)
    val maxResid = out.map(_._4).max
    assert(maxResid <= 10L, s"rank-1 corpus left resid_micro $maxResid")
    // projection = ±s_i uniformly: one global sign, micro-accurate
    val sgns = out.collect { case (id, _, p, _) if (id % 21).toInt != 10 =>
      math.signum(p.toDouble) * math.signum((id % 21 - 10).toDouble)
    }.distinct
    assert(sgns.length == 1, s"projection sign not uniform: $sgns")
    out.foreach { case (id, _, p, _) =>
      val s = ((id % 21) - 10) / 50.0
      assert(math.abs(math.abs(p) - math.abs(s) * 1e6) <= 200,
        s"vec $id |proj_micro|=${math.abs(p)} != |s|*1e6=${math.abs(s) * 1e6}")
    }
    spark.catalog.clearCache() // pcFit persist contract
  }

  test("q132 sweep: closed-form cumulatives, ties merge, unscored/textless docs excluded") {
    // scores planted at three distinct 6-dp values with a tie;
    // token counts chosen so every cumulative is hand-checkable
    val scored = Seq(
      (1L, 0.9),  // 2 tokens
      (2L, 0.5),  // 3 tokens
      (3L, 0.5),  // 5 tokens
      (4L, 0.1),  // 7 tokens
      (9L, 0.8)   // no matching document text — must be excluded
    ).toDF("vec_id", "score")
    val docs = Seq(
      (1L, "a a"), (2L, "b b b"), (3L, "c c c c c"), (4L, "d d d d d d d"),
      (8L, "unscored text")
    ).toDF("doc_id", "text")
    val out = graft.queries.Learn.thresholdSweep(scored, docs)
      .select($"score_micro", $"n_docs", $"n_tokens", $"cum_docs", $"cum_tokens")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(out.toSeq == Seq(
      (900000L, 1L, 2L, 1L, 2L),
      (500000L, 2L, 8L, 3L, 10L),
      (100000L, 1L, 7L, 4L, 17L)))
  }

  test("q136 alloc: water level lands between caps, zero-avail source inert, budget conserved") {
    // avail Z=0, A=10, B=20, C=100, D=270 -> total 400, budget
    // 400·19 div 20 = 380. Ascending greedy: Z,A,B capped
    // trivially; C capped because 100·2 <= 380-30; D uncapped
    // (270 > 250) -> level = 380-130 = 250. Epochs: capped sources
    // exactly 1e6; D = 250e6 div 270 = 925925 (floor).
    def doc(n: Int) = Seq.fill(n)("tok").mkString(" ")
    val docs = Seq(
      ("Z", ""), ("A", doc(10)), ("B", doc(20)), ("C", doc(100)),
      ("D", doc(270))
    ).toDF("source", "text")
    val out = graft.queries.Learn.tokenAlloc(docs)
      .as[(String, Long, Long, Boolean, Long)].collect().toSeq
    assert(out == Seq(
      ("A", 10L, 10L, true, 1000000L),
      ("B", 20L, 20L, true, 1000000L),
      ("C", 100L, 100L, true, 1000000L),
      ("D", 270L, 250L, false, 925925L),
      ("Z", 0L, 0L, true, 0L)))
    // allocation exactly exhausts the 380-token budget
    assert(out.map(_._3).sum == 380L)
  }

  test("q136 alloc: exatoken availabilities allocate exactly (int64 cross-products would overflow)") {
    // avail A=3e18, B=6e18 -> total 9e18 (fits int64; every PRODUCT
    // in the chain does not: 9e18·19, 3e18·10^6, 5.55e18·10^6 all
    // cross 2^63 — the decimal arithmetic this test pins).
    // b = 9e18·19 div 20 = 8.55e18. A capped (3e18·2 ≤ 8.55e18);
    // B uncapped (6e18 > 8.55e18−3e18) -> level 5.55e18.
    // epochs: A exactly 1e6; B = 5.55e18·1e6 div 6e18 = 925000.
    val avail = Seq(
      ("A", 3000000000000000000L), ("B", 6000000000000000000L))
      .toDF("source", "avail")
    val out = graft.queries.Learn.allocOf(avail)
      .as[(String, Long, Long, Boolean, Long)].collect().toSeq
    assert(out == Seq(
      ("A", 3000000000000000000L, 3000000000000000000L, true, 1000000L),
      ("B", 6000000000000000000L, 5550000000000000000L, false, 925000L)))
  }

  test("score() runs on an UNLABELED frame — the production full-corpus call") {
    // labels exist only on the training slice; the corpus being
    // scored has none, so score must not demand the column
    val emb = Tables.embeddings(spark, sf3)
    val (wm, _) = ProbeTrainer.train(emb)
    val unlabeled = emb.select($"vec_id", $"embedding")
    val out = ProbeTrainer.score(unlabeled, wm)
    assert(!out.columns.contains("label"), "phantom label column")
    val preds = out.select($"vec_id", $"pred").as[(Long, Int)].collect().toMap
    // identical predictions to the labeled scoring path
    val labeled = ProbeTrainer.score(emb, wm)
      .select($"vec_id", $"pred").as[(Long, Int)].collect().toMap
    assert(preds == labeled, "unlabeled scoring diverged from labeled")
  }

  test("training an empty labeled slice fails loudly, not deep in the round loop") {
    val empty = Tables.embeddings(spark, sf3).filter($"vec_id" < 0)
    val e = intercept[IllegalArgumentException] {
      ProbeTrainer.train(empty)
    }
    assert(e.getMessage.contains("empty labeled set"), e.getMessage)
  }

  test("q113 calibration bins: hand-built scored frame yields known bins, accuracy, confidence") {
    // 4 rows at confidence 0.25 (bin 2), half correct; 2 rows at the
    // 1.0 top edge — which must FOLD into the last bin (9), not open
    // an 11th bin — half correct.
    val scored = Seq(
      (0, 0, 0.25), (0, 0, 0.25), (0, 1, 0.25), (0, 1, 0.25),
      (3, 3, 1.0), (3, 4, 1.0)).toDF("label", "pred", "score")
    val r = graft.queries.Learn.calibrationBins(scored)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        x.getLong(3), x.getLong(4)))
    assert(r.toSeq == Seq(
      (2L, 4L, 2L, 250000L, 500000L),
      (9L, 2L, 1L, 1000000L, 500000L)), r.toSeq.toString)
  }

  test("scores are calibrated softmax winners: in (1/K, 1], pred in [0, K)") {
    val out = SparkEntry.queries("q98_linear_probe")(spark, sf3).collect()
    assert(out.length == Tables.embeddings(spark, sf3).count())
    out.foreach { r =>
      val (pred, score) = (r.getAs[Int]("pred"), r.getAs[Double]("score"))
      assert(pred >= 0 && pred < ProbeTrainer.NumClasses)
      // the winning class of a K-way softmax carries >= 1/K mass
      assert(score >= 1.0 / ProbeTrainer.NumClasses - 1e-6 && score <= 1.0,
        s"vec ${r.getAs[Long]("vec_id")}: winner probability $score out of range")
    }
  }

  test("q151 DoReMi weights: planted hard source upweights by the exact closed form, easy source floors at excess 0") {
    import spark.implicits._
    // s1: "x x x" — all high-frequency tokens, BELOW corpus mean
    // surprisal → excess clamps to 0, weight multiplier 1.
    // s2: "x y" — carries the rare token → above-mean loss, excess
    // > 0, multiplier (1 + 0.1·excess)^8. Corpus: x=4, y=1, N=5.
    val docs = Seq((1L, "s1", "x x x"), (2L, "s2", "x y"))
      .toDF("doc_id", "source", "text")
    def m(v: Double): Long = math.floor(v * 1e6 + 0.5).toLong
    def surpSum(cs: Seq[(Long, Long)], n: Long): Long = // Σ micro(c·−ln(cw/N))
      cs.map { case (c, cw) =>
        m(-c.toDouble * math.log(cw.toDouble / n.toDouble)) }.sum
    def lossOf(st: Long, ns: Long): Long =
      math.floor(st.toDouble / ns.toDouble + 0.5).toLong
    val loss1 = lossOf(surpSum(Seq((3L, 4L)), 5L), 3L)
    val loss2 = lossOf(surpSum(Seq((1L, 4L), (1L, 1L)), 5L), 2L)
    val corpus = lossOf(surpSum(Seq((4L, 4L), (1L, 1L)), 5L), 5L)
    val e1 = math.max(loss1 - corpus, 0L); val e2 = math.max(loss2 - corpus, 0L)
    def rw(e: Long): Long = m(math.pow(1.0 + 0.1 * (e.toDouble / 1e6), 8.0))
    val (r1, r2) = (rw(e1), rw(e2)); val rsum = r1 + r2
    def w(r: Long): Long =
      math.floor(r.toDouble * 1e6 / rsum.toDouble + 0.5).toLong
    val out = graft.queries.Learn.doremiWeights(docs)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("s1", 3L, loss1, e1, w(r1)),
      ("s2", 2L, loss2, e2, w(r2))), s"q151 diverges: $out")
    assert(e1 == 0L, "the easy source must clamp to zero excess")
    assert(e2 > 0L && w(r2) > w(r1),
      "the hard source must upweight past the easy one")
    // weights are a normalized mixture (micro rounding: ±1 per source)
    assert(math.abs(out.map(_._5).sum - 1000000L) <= out.length.toLong)
  }

  test("q163 temperature mix: sqrt damping lifts the minority by the exact replayed integers") {
    import spark.implicits._
    // dyadic masses so one sqrt is EXACT: en 12 of 16 (3/4), fr 4 of
    // 16 (1/4 → sqrt = 1/2 exactly, q_fr = 500000000)
    val docs = Seq(
      (1L, "en", (1 to 12).map(_ => "w").mkString(" ")),
      (2L, "fr", "w w w w"))
      .toDF("doc_id", "lang", "text")
    def nano(v: Double): Long = math.floor(v * 1e9 + 0.5).toLong
    val qEn = nano(math.sqrt(12.0 / 16.0)); val qFr = nano(math.sqrt(4.0 / 16.0))
    assert(qFr == 500000000L)
    val qsum = qEn + qFr
    def w(q: Long): Long = q * 1000000L / qsum
    def epochs(q: Long, c: Long): Long =
      (BigInt(q) * 16L * 1000000L / (BigInt(qsum) * c)).toLong
    val out = graft.queries.Learn.temperatureMix(docs)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("en", 12L, 750000L, w(qEn), epochs(qEn, 12L)),
      ("fr", 4L, 250000L, w(qFr), epochs(qFr, 4L))), s"q163 diverges: $out")
    // the damping law: minority lifted above its raw share, majority
    // below, and the minority's epoch multiplier exceeds 1×
    assert(w(qFr) > 250000L && w(qEn) < 750000L)
    assert(epochs(qFr, 4L) > 1000000L && epochs(qEn, 12L) < 1000000L)
  }

  test("q174 label noise: planted probabilities give the hand-computed CL matrix") {
    // two classes; pm in micro. t_0 = mean p_0 over label-0 examples
    // = (900000 + 800000) / 2 = 850000; t_1 = mean p_1 over label-1
    // = (50000 + 800000) / 2 = 425000.
    //  v1 (y=0): p0 900000 ≥ t0, p1 100000 < t1 → (0, 0)
    //  v2 (y=0): p0 800000 < t0, p1 200000 < t1 → drops (no confident class)
    //  v3 (y=1): p0 950000 ≥ t0, p1  50000 < t1 → (1, 0)  — the flip
    //  v4 (y=1): p0 200000 < t0, p1 800000 ≥ t1 → (1, 1)
    val px = Seq(
      (1L, 0, 0, 900000L), (1L, 0, 1, 100000L),
      (2L, 0, 0, 800000L), (2L, 0, 1, 200000L),
      (3L, 1, 0, 950000L), (3L, 1, 1, 50000L),
      (4L, 1, 0, 200000L), (4L, 1, 1, 800000L)
    ).toDF("vec_id", "label", "j", "pm")
    val out = graft.queries.Learn.labelNoise(px)
      .as[(Int, Int, Long, Long)].collect().toSeq
    val third = math.floor(1.0 / 3.0 * 1e6 + 0.5).toLong
    assert(out == Seq(
      (0, 0, 1L, third), (1, 0, 1L, third), (1, 1, 1L, third)),
      s"q174 diverges: $out")
  }

  test("q176 JL distortion: Scala replay of the exact fold arithmetic on seeded vectors") {
    val P = 1000000007L; val M = 2654435761L
    def sign(i: Int, j: Int): Double =
      if ((j.toLong * 64 + i + 1) * M % P % 2 == 0) 1.0 else -1.0
    // float-rounded then widened — the gated chain casts the
    // array<float> column to double, so the replay must too
    def vec(id: Long): Array[Double] =
      Array.tabulate(64)(i =>
        (((id * 31 + i) % 97).toDouble / 97.0 - 0.5).toFloat.toDouble)
    def proj(x: Array[Double]): Array[Double] =
      Array.tabulate(16) { j =>
        var a = 0.0; var i = 0
        while (i < 64) { a = a + x(i) * sign(i, j); i += 1 }
        a / 4.0
      }
    def d2(a: Array[Double], b: Array[Double]): Long = {
      var s = 0L; var i = 0
      while (i < a.length) {
        s += math.floor((a(i) - b(i)) * (a(i) - b(i)) * 1e6 + 0.5).toLong
        i += 1
      }
      s
    }
    val n = 40L
    def agg(stride: Long): (Long, Long, Long, Long, Long) = {
      val r = (0L until n).filter(_ + stride < n).map { id =>
        val (a, b) = (vec(id), vec(id + stride))
        (d2(a, b), d2(proj(a), proj(b)))
      }.filter(_._1 > 0L).map { case (o, p) =>
        math.floor(p.toDouble / o.toDouble * 1e6 + 0.5).toLong }
      (stride, r.size.toLong,
        math.floor(r.sum.toDouble / r.size.toDouble + 0.5).toLong,
        r.min, r.max)
    }
    val emb = (0L until n).map(id =>
      (id, vec(id).map(_.toFloat).toSeq)).toDF("vec_id", "embedding")
    val out = graft.queries.Learn.jlDistortion(emb)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(agg(1L), agg(17L)), s"q176 diverges: $out")
  }
}
