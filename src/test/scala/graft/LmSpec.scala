package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Stupid-Backoff bigram surprisal (q102) — the backoff branch is
  * nearly dormant on the shared-vocabulary testdata (the reference
  * half covers almost every bigram), so planted reference/target
  * splits pin each scoring branch against hand-computed values.
  */
class LmSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("PMI collocations: a planted always-together pair tops its language, rare pairs floored out") {
    // 6 docs of "qq zz aa<i> ab<i>": bigram (qq,zz) count 6 clears
    // the >=5 floor, every other bigram counts 1 and is floored out.
    // Closed form: c(qq)=c(zz)=6, n_uni=24, n_bi=3*6=18 ->
    // pmi = ln(6*24*24 / (18*6*6)) = ln(16/3)
    val docs = (1L to 6L).map(i => ("en", s"qq zz aa$i ab$i"))
      .toDF("lang", "text")
    val out = graft.queries.Corpus.pmiBigrams(docs)
      .select($"lang", $"w1", $"w2", $"n_ab", $"pmi_micro", $"rn")
      .as[(String, String, String, Long, Long, Long)].collect()
    assert(out.length == 1, s"only the floored pair reports: ${out.toSeq}")
    val (lang, w1, w2, nab, pmi, rn) = out.head
    assert((lang, w1, w2, nab, rn) == (("en", "qq", "zz", 6L, 1L)))
    val expect = math.floor(math.log(6.0 * 24 * 24 / (18.0 * 6 * 6)) * 1e6 + 0.5).toLong
    assert(math.abs(pmi - expect) <= 1L, s"pmi $pmi vs closed-form $expect")
    spark.catalog.clearCache() // pmiBigrams persist contract
  }

  test("planted LM: unigram, bigram, backoff and OOV branches score exactly") {
    // reference: "the cat sat on the mat" — uni: the:2 cat:1 sat:1
    // on:1 mat:1 (N=6, V=5); bigrams all count 1
    val docs = Seq(
      (0L, "the cat sat on the mat"), // the reference slice
      (10L, "the cat sat"),  // first-token unigram + two seen bigrams
      (11L, "mat dog the")   // OOV 'dog' + two unseen bigrams
    ).toDF("doc_id", "text")
    val out = graft.queries.Corpus
      .stupidBackoffSurprisal(docs, $"doc_id" === 0L)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    spark.catalog.clearCache() // position-frame persist contract

    def micro(x: Double) = math.floor(x * 1e6 + 0.5)
    def xentOf(surps: Seq[Double]) = {
      val s = surps.map(s => micro(s)).sum / 1e6 / surps.length
      math.floor(s * 1e6 + 0.5) / 1e6
    }
    val puni = (c: Long) => (c.toDouble + 1.0) / (6.0 + 5.0)
    // doc 10: -ln p(the), -ln c(the,cat)/c(the), -ln c(cat,sat)/c(cat)
    val want10 = xentOf(Seq(-math.log(puni(2)),
      -math.log(1.0 / 2.0), -math.log(1.0 / 1.0)))
    // doc 11: -ln p(mat), then two backoffs: 0.4*p(dog=OOV), 0.4*p(the)
    val want11 = xentOf(Seq(-math.log(puni(1)),
      -math.log(0.4 * puni(0)), -math.log(0.4 * puni(2))))
    assert(out(10L) == ((3L, 0L, want10)), s"doc 10: ${out(10L)} != $want10")
    assert(out(11L) == ((3L, 2L, want11)), s"doc 11: ${out(11L)} != $want11")
  }

  test("planted KN: discount, interpolation, unseen-context, first-token and OOV branches score exactly") {
    // train doc 0: "a b a b" — uni a:2 b:2 (V 2); bigrams (a,b):2
    // (b,a):1 → N₁₊(··) 2; ctx a: (cv 2, n1p 1), b: (cv 1, n1p 1);
    // continuation counts a:1 b:1. p_cont denominator = 2 + 2 + 1.
    val docs = Seq(
      (0L, "en", "a b a b"), // the train half
      (1L, "en", "a b c"),   // first-token + seen-bigram + OOV branch
      (3L, "fr", "z q")      // OOV first token + unseen context
    ).toDF("doc_id", "lang", "text")
    val out = graft.queries.Corpus
      .knCrossEntropy(docs, pmod($"doc_id", lit(2L)) === 0)
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    spark.catalog.clearCache() // position-frame persist contract

    def micro(x: Double) = math.floor(x * 1e6 + 0.5)
    def xentOf(surps: Seq[Double]) = {
      val s = surps.map(micro).sum / 1e6 / surps.length
      math.floor(s * 1e6 + 0.5) / 1e6
    }
    def pcont(n1w: Long) = (n1w.toDouble + 1.0) / (2.0 + 2.0 + 1.0)
    def pfull(cb: Long, n1p: Long, pc: Double, cv: Long) =
      (math.max(cb.toDouble - 0.75, 0.0) + 0.75 * n1p.toDouble * pc) /
        cv.toDouble
    // en: p(a|∅) = p_cont(a) = 0.4; p(b|a) = (2−¾ + ¾·1·0.4)/2 =
    // 0.775; p(c|b) = (0 + ¾·1·0.2)/1 = 0.15 (c is OOV)
    val wantEn = xentOf(Seq(-math.log(pcont(1)),
      -math.log(pfull(2, 1, pcont(1), 2)),
      -math.log(pfull(0, 1, pcont(0), 1))))
    // fr: both positions have no usable context → pure p_cont of an
    // unseen word = 0.2; both tokens OOV
    val wantFr = xentOf(Seq(-math.log(pcont(0)), -math.log(pcont(0))))
    assert(out("en") == ((3L, 1L, wantEn)), s"en: ${out("en")} != $wantEn")
    assert(out("fr") == ((2L, 2L, wantFr)), s"fr: ${out("fr")} != $wantFr")
  }

  test("perplexity split: buckets partition each language and means order head < middle < tail") {
    // q120 (Sketch.perplexitySplit) on a planted two-lang corpus:
    // per lang, 12 docs in three clean surprisal strata — reference
    // docs (even ids) score seen bigrams (low), odd docs mix seen /
    // backoff / OOV tokens to spread scores. The law under test is
    // structural (the oracle gates exact values): the three buckets
    // PARTITION the language's docs and their mean surprisals are
    // strictly ordered.
    // every doc scores a DISTINCT xent (terciles over ties can empty
    // a bucket — the first cut of this spec planted 8-way-tied lows
    // and head came out empty): reference docs (even i) repeat the
    // same seen bigrams at different lengths, odd docs append i
    // distinct OOV tokens to a seen prefix
    def doc(lang: String, i: Long, text: String) =
      (lang.hashCode.toLong * 100 + i, lang, text)
    val mk = (lang: String, pad: String) => (0L until 12L).map { i =>
      val t =
        if (i % 2 == 0) Seq.fill(i.toInt / 2 + 2)(s"$pad extra").mkString(" ")
        else s"$pad extra " +
          (0L until i).map(j => s"oov$lang$i$j").mkString(" ")
      doc(lang, i, t)
    }
    val docs = (mk("en", "en0") ++ mk("fr", "fr0"))
      .toDF("doc_id", "lang", "text")
    val out = graft.queries.Sketch.perplexitySplit(docs)
      .as[(String, String, Long, Double)].collect()
    spark.catalog.clearCache() // scored-frame persist contract
    for (lang <- Seq("en", "fr")) {
      val rows = out.filter(_._1 == lang).map(r => r._2 -> (r._3, r._4)).toMap
      assert(rows.keySet == Set("head", "middle", "tail"),
        s"$lang buckets incomplete: $rows")
      assert(rows.values.map(_._1).sum == 12L,
        s"$lang buckets do not partition the docs: $rows")
      assert(rows("head")._2 < rows("middle")._2 &&
        rows("middle")._2 < rows("tail")._2,
        s"$lang bucket means not ordered: $rows")
    }
  }

  test("randomized differential: q168 matches an in-memory KN reference on random corpora") {
    // the planted case pins each branch once; this pins the full
    // joined arithmetic (five count tables, coalesces, branch
    // routing) on inputs nobody hand-picked
    val rnd = new scala.util.Random(20260817L)
    for (trial <- 1 to 3) {
      val docs = (0L until 30L).map { id =>
        val lang = if (rnd.nextBoolean()) "en" else "fr"
        val toks = Vector.fill(rnd.nextInt(8))(s"w${rnd.nextInt(6)}")
        (id, lang, toks.mkString(" "))
      }
      val df = docs.toDF("doc_id", "lang", "text")
      val out = graft.queries.Corpus
        .knCrossEntropy(df, pmod($"doc_id", lit(2L)) === 0)
        .as[(String, Long, Long, Double)].collect().toSeq
      spark.catalog.clearCache() // position-frame persist contract

      def toksOf(t: String) = t.split(" ").filter(_.nonEmpty).toVector
      def positions(ds: Seq[(Long, String, String)]) = ds.flatMap { d =>
        val ts = toksOf(d._3)
        ts.zipWithIndex.map { case (w, i) =>
          (d._2, if (i == 0) None else Some(ts(i - 1)), w) }
      }
      val train = positions(docs.filter(_._1 % 2 == 0))
      val eval = positions(docs.filter(_._1 % 2 != 0))
      val uni = train.groupBy(_._3).view.mapValues(_.size.toLong).toMap
      val bi = train.collect { case (_, Some(p), w) => (p, w) }
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val ctx = bi.toSeq.groupBy(_._1._1).view
        .mapValues(es => (es.map(_._2).sum, es.size.toLong)).toMap
      val n1w = bi.keys.toSeq.groupBy(_._2).view
        .mapValues(_.size.toLong).toMap
      val (nbb, v) = (bi.size.toLong, uni.size.toLong)
      def pcont(w: String) = (n1w.getOrElse(w, 0L).toDouble + 1.0) /
        (nbb.toDouble + v.toDouble + 1.0)
      def surp(prev: Option[String], w: String): Double = -math.log(
        prev.flatMap(ctx.get) match {
          case Some((cv, n1p)) =>
            (math.max(bi.getOrElse((prev.get, w), 0L).toDouble - 0.75, 0.0)
              + 0.75 * n1p.toDouble * pcont(w)) / cv.toDouble
          case None => pcont(w)
        })
      def micro(x: Double) = math.floor(x * 1e6 + 0.5)
      val want = eval.groupBy(_._1).toSeq.sortBy(_._1).map { case (l, ps) =>
        val ss = ps.map(p => surp(p._2, p._3))
        val xent = math.floor(
          ss.map(micro).sum / 1e6 / ss.length * 1e6 + 0.5) / 1e6
        (l, ps.size.toLong,
          ps.count(p => !uni.contains(p._3)).toLong, xent)
      }
      assert(out == want, s"trial $trial: q168 diverges\n got $out\nwant $want")
    }
  }

  test("q102 on the corpus: reference-side docs never back off, scores well-formed") {
    val out = SparkEntry.queries("q102_bigram_surprisal")(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long, Double)].collect()
    assert(out.length ==
      Tables.documents(spark, "/root/testdata/sf0.001").count())
    out.foreach { case (id, nTok, nBo, xent) =>
      assert(nTok > 0 && nBo >= 0 && nBo < nTok && xent >= 0,
        s"doc $id malformed: ($nTok, $nBo, $xent)")
      // the LM trained on the even half: those docs' bigrams are in
      // the model by construction, so they can never back off
      if (id % 2 == 0) assert(nBo == 0, s"reference doc $id backed off")
    }
  }

  test("q133 packing: start-offset rule, one-doc overshoot only, sources independent") {
    // source A: token counts 300,300,300,100,600 -> offsets
    // 0,300,600,900,1000 -> shards 0,0,1,1,1 (budget 512): shard 0
    // holds 600 tokens (over budget by its LAST doc only), shard 1
    // the rest. source B: a single tiny doc -> one shard.
    def doc(n: Int) = Seq.fill(n)("w").mkString(" ")
    val docs = Seq(
      ("A", 1L, doc(300)), ("A", 2L, doc(300)), ("A", 3L, doc(300)),
      ("A", 4L, doc(100)), ("A", 5L, doc(600)),
      ("B", 9L, doc(7))
    ).toDF("source", "doc_id", "text")
    val out = graft.queries.Corpus.tokenPacking(docs)
      .select($"source", $"shard", $"n_docs", $"n_tokens",
        $"first_doc", $"last_doc")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("A", 0L, 2L, 600L, 1L, 2L),
      ("A", 1L, 3L, 1000L, 3L, 5L),
      ("B", 0L, 1L, 7L, 9L, 9L)))
    // manifest reconciles: every doc in exactly one shard
    assert(out.map(_._3).sum == 6L)
  }

  test("skew-free prefix sum: two-phase multi-bucket scan ≡ single window; q133/q54 bucket-width-invariant") {
    import org.apache.spark.sql.expressions.Window
    // direct equality on a frame with a dominant key, ord gaps, and
    // several buckets at width 4 (gapped ords leave EMPTY buckets —
    // the offset window must carry over them)
    val rows = Seq(
      ("a", 1L, 5L), ("a", 3L, 7L), ("a", 4L, 1L), ("a", 9L, 2L),
      ("a", 12L, 8L), ("a", 17L, 3L), ("a", 33L, 9L),
      ("b", 2L, 4L), ("b", 40L, 6L)).toDF("k", "ord", "v")
    val w = Window.partitionBy($"k").orderBy($"ord")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ref = rows.withColumn("off", sum($"v").over(w) - $"v")
      .select($"k", $"ord", $"off").as[(String, Long, Long)].collect().toSet
    val got = graft.ops.PrefixSum.exclusive(rows, "k", "ord", "v", "off", 4L)
      .select($"k", $"ord", $"off").as[(String, Long, Long)].collect().toSet
    assert(got == ref, "two-phase scan diverged from the single window")

    // the q133 plant at bucketWidth 2 — every doc its own bucket
    // family — reproduces the default-width shards exactly
    def doc(n: Int) = Seq.fill(n)("w").mkString(" ")
    val docs = Seq(
      ("A", 1L, doc(300)), ("A", 2L, doc(300)), ("A", 3L, doc(300)),
      ("A", 4L, doc(100)), ("A", 5L, doc(600)),
      ("B", 9L, doc(7))).toDF("source", "doc_id", "text")
    val narrow = graft.queries.Corpus.tokenPacking(docs, bucketWidth = 2L)
      .select($"source", $"shard", $"n_docs", $"n_tokens",
        $"first_doc", $"last_doc")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(narrow == Seq(
      ("A", 0L, 2L, 600L, 1L, 2L),
      ("A", 1L, 3L, 1000L, 3L, 5L),
      ("B", 0L, 1L, 7L, 9L, 9L)), "q133 shards changed with bucket width")

    // q54's packer: multi-bucket output == effectively-single-bucket
    // output on the same frame
    val langDocs = Seq(
      (1L, "en", doc(300)), (2L, "en", doc(300)), (3L, "en", doc(300)),
      (4L, "en", doc(100)), (5L, "en", doc(600)), (9L, "fr", doc(7)))
      .toDF("doc_id", "lang", "text")
    val seqNarrow = graft.queries.Quality.seqPack(langDocs, bucketWidth = 2L)
      .collect().toSeq
    val seqWide = graft.queries.Quality.seqPack(langDocs, bucketWidth = 1L << 20)
      .collect().toSeq
    assert(seqNarrow == seqWide, "q54 sequences changed with bucket width")

    // property sweep: random frames × every bucket-width regime
    // (1 = every ord its own bucket, primes that straddle gaps, one
    // giant bucket) all equal the single-window form
    val rnd = new scala.util.Random(20260815L)
    for (trial <- 1 to 3) {
      val rows2 = (0 until 60).map { _ =>
        (s"k${rnd.nextInt(3)}", rnd.nextInt(500).toLong, rnd.nextInt(9).toLong)
      }.distinctBy(r => (r._1, r._2)) // ord unique per key (the contract)
      val df = rows2.toDF("k", "ord", "v")
      val want = df.withColumn("off", sum($"v").over(w) - $"v")
        .select($"k", $"ord", $"off").as[(String, Long, Long)].collect().toSet
      for (bw <- Seq(1L, 2L, 7L, 97L, 1L << 20)) {
        val got2 = graft.ops.PrefixSum.exclusive(df, "k", "ord", "v", "off", bw)
          .select($"k", $"ord", $"off").as[(String, Long, Long)].collect().toSet
        assert(got2 == want, s"trial $trial width $bw diverged")
      }
    }
  }

  test("prefix sum sparse ordinals: 2^40-spaced ids route through the recursive scan, same integers, no unbounded broadcast") {
    import org.apache.spark.sql.expressions.Window
    // 64-bit-hash-style ordinals: every row its own bucket at any
    // realistic width, so the offset frame is O(rows). The counted
    // guard must take the recursive path instead of broadcasting it.
    val sp = 1L << 40
    val rows = Seq(
      ("a", 0L, 5L), ("a", sp, 7L), ("a", 2 * sp, 1L), ("a", 3 * sp, 2L),
      ("a", 5 * sp, 8L), ("b", 2 * sp, 4L), ("b", 1L << 62, 6L))
      .toDF("k", "ord", "v")
    val w = Window.partitionBy($"k").orderBy($"ord")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = rows.withColumn("off", sum($"v").over(w) - $"v")
      .select($"k", $"ord", $"off").as[(String, Long, Long)].collect().toSet

    // threshold forced to 2 rows: the 7-row offset frame exceeds it at
    // several levels, so the scan must recurse (levels > 1) before the
    // 2^20-per-level domain collapse bottoms out in a broadcast
    val (rec, levels) = graft.ops.PrefixSum.impl(
      rows, "k", "ord", "v", "off",
      graft.ops.PrefixSum.DefaultBucketWidth,
      maxBroadcastBuckets = 2L, depth = 0)
    assert(levels > 1, s"sparse plant should recurse, got levels=$levels")
    val got = rec.select($"k", $"ord", $"off")
      .as[(String, Long, Long)].collect().toSet
    assert(got == want, "recursive sparse-path scan diverged from the single window")

    // the default threshold on the same frame stays on the dense
    // broadcast path (7 buckets is tiny) and agrees too
    val (dense, denseLevels) = graft.ops.PrefixSum.impl(
      rows, "k", "ord", "v", "off",
      graft.ops.PrefixSum.DefaultBucketWidth,
      graft.ops.PrefixSum.DefaultMaxBroadcastBuckets, depth = 0)
    assert(denseLevels == 1, s"tiny frame should broadcast, got $denseLevels")
    assert(dense.select($"k", $"ord", $"off")
      .as[(String, Long, Long)].collect().toSet == want)
  }
}
