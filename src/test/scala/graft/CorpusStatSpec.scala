package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Corpus-statistics queries (q139 Zipf slope, q140 lexical
  * diversity, q141 distinct-n, q142 burstiness) on planted corpora
  * with closed-form answers. Where a statistic passes through libm
  * (ln), the expected value is computed in the TEST with the same
  * java.lang.Math calls and the same micro-quantization order the
  * engine uses — equality is exact, not approximate.
  */
class CorpusStatSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def micro(v: Double): Long = math.floor(v * 1e6 + 0.5).toLong

  test("q139 Zipf slope: an exact power law recovers slope -1 and intercept ln C") {
    // freqs 12/i at ranks i = 1..4: alpha 12, beta 6, gamma 4,
    // delta 3 — ln f = ln 12 − 1·ln rank exactly
    val words =
      Seq.fill(12)("alpha") ++ Seq.fill(6)("beta") ++
        Seq.fill(4)("gamma") ++ Seq.fill(3)("delta")
    // spread over 5 docs so no doc-level accident hides a bug
    val docs = words.grouped(5).zipWithIndex
      .map { case (ws, i) => (i.toLong, "en", ws.mkString(" ")) }
      .toSeq.toDF("doc_id", "lang", "text")
    val out = graft.queries.Corpus.zipfSlope(docs)
      .as[(String, Long, Long, Long)].collect().toSeq
    // replicate the engine's quantize-then-sum pipeline exactly
    val freqs = Seq(12L, 6L, 4L, 3L)
    val terms = freqs.zipWithIndex.map { case (f, i0) =>
      val x = math.log((i0 + 1).toDouble); val y = math.log(f.toDouble)
      (micro(x), micro(y), micro(x * y), micro(x * x))
    }
    val (sx, sy, sxy, sxx) = (terms.map(_._1).sum, terms.map(_._2).sum,
      terms.map(_._3).sum, terms.map(_._4).sum)
    val k = freqs.length.toDouble
    def d(l: Long) = l.toDouble / 1e6
    val den = k * d(sxx) - d(sx) * d(sx)
    val slope = (k * d(sxy) - d(sx) * d(sy)) / den
    val icept = (d(sy) - slope * d(sx)) / k
    assert(out == Seq(("en", 4L, micro(slope), micro(icept))))
    // and the recovered law is the planted one to micro precision
    assert(math.abs(micro(slope) + 1000000L) <= 5,
      s"slope ${micro(slope)} not ≈ -1")
    assert(math.abs(micro(icept) - micro(math.log(12.0))) <= 5,
      s"intercept ${micro(icept)} not ≈ ln 12")
  }

  test("q140 lexical diversity: counts, ratios and Herdan's C on a planted vocabulary") {
    // en tokens: aa×3 bb×2 cc×1 → N=6, V=3, hapax {cc}, dis {bb}
    val docs = Seq(
      (1L, "en", "aa aa bb"), (2L, "en", "aa bb cc"),
      (3L, "fr", "zz")) // 1-token lang: Herdan guard (ln 1 = 0)
      .toDF("doc_id", "lang", "text")
    val out = graft.queries.Corpus.lexicalDiversity(docs)
      .as[(String, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    val herdan = micro(math.log(3.0) / math.log(6.0))
    assert(out == Seq(
      ("en", 6L, 3L, 1L, 1L, 500000L, 333333L, herdan),
      ("fr", 1L, 1L, 1L, 0L, 1000000L, 1000000L, 0L)))
  }

  test("q141 distinct-n: planted gram counts, short-doc zero rows kept") {
    val docs = Seq(
      (1L, "en", "aa bb aa bb"), // 1-grams 4/2, 2-grams 3/2, 3-grams 2/2
      (2L, "fr", "xx")) // 1 token: n=2,3 report ZERO rows, not absent
      .toDF("doc_id", "lang", "text")
    val out = graft.queries.Corpus.distinctNgrams(docs)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("en", 1L, 4L, 2L, 500000L),
      ("en", 2L, 3L, 2L, 666666L),
      ("en", 3L, 2L, 2L, 1000000L),
      ("fr", 1L, 1L, 1L, 1000000L),
      ("fr", 2L, 0L, 0L, 0L),
      ("fr", 3L, 0L, 0L, 0L)))
  }

  test("q144 lang confusion: mislabeled docs land off-diagonal with exact fractions") {
    val docs = Seq(
      (1L, "en", "the value of the fast thing"),
      (2L, "en", "a value is fast and the thing is fast"),
      (3L, "en", "the fast value"),
      (4L, "en", "der die das ist nicht gut"), // German text labeled en
      (5L, "fr", "le la les et est bien")).toDF("doc_id", "lang", "text")
    val out = graft.queries.Corpus.langConfusion(docs)
      .as[(String, String, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("en", "de", 1L, 250000L),
      ("en", "en", 3L, 750000L),
      ("fr", "fr", 1L, 1000000L)))
  }

  test("q145 length tail: exact geometric tail matches the replayed Hill arithmetic, singleton inert") {
    // source A lengths 64,32,16,8,4,2: k = 5, x_ref = 2, terms
    // ln(2^5..2^1) — replicate the engine's quantize/divide pipeline
    def doc(n: Int) = Seq.fill(n)("w").mkString(" ")
    val lens = Seq(64, 32, 16, 8, 4, 2)
    val docs = (lens.zipWithIndex.map { case (n, i) =>
      (i.toLong, "A", doc(n))
    } :+ ((99L, "B", doc(7)))).toDF("doc_id", "source", "text")
    val out = graft.queries.Corpus.lengthTail(docs)
      .as[(String, Long, Long, Long)].collect().toSeq
    val terms = Seq(64, 32, 16, 8, 4).map(x =>
      micro(math.log(x.toDouble / 2.0)))
    val t = terms.sum
    val hillInv = t / 5
    val alpha = (5L * 1000000000000L) / t
    assert(out == Seq(("A", 5L, hillInv, alpha), ("B", 0L, 0L, 0L)))
    // the planted tail is exact: H = 3·ln 2
    assert(math.abs(hillInv - micro(3 * math.log(2.0))) <= 2)
  }

  test("q146 Gini: uniform corpus scores 0, one-doc-holds-all scores (n-1)/n") {
    def doc(n: Int) = Seq.fill(n)("w").mkString(" ")
    val docs = Seq(
      (1L, "en", doc(5)), (2L, "en", doc(5)),
      (3L, "en", doc(5)), (4L, "en", doc(5)),
      (5L, "fr", ""), (6L, "fr", ""), (7L, "fr", ""), (8L, "fr", doc(10)))
      .toDF("doc_id", "lang", "text")
    val out = graft.queries.Corpus.giniLengths(docs)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("en", 4L, 20L, 0L),
      ("fr", 4L, 10L, 750000L)))
  }

  test("q147 edit verify: a planted near-dup pair scores its exact edit distance, unrelated docs emit no pair") {
    // A and B share a 10-token prefix and differ in the last word by
    // two characters (kk -> zz): 3-shingle jaccard 8/10 ≥ 0.5 so the
    // q24 stage emits the pair; levenshtein = 2 exactly
    val a = "aa bb cc dd ee ff gg hh ii jj kk"
    val b = "aa bb cc dd ee ff gg hh ii jj zz"
    val docs = Seq(
      (1L, "en", a), (2L, "en", b),
      (3L, "en", "qq rr ss tt uu vv ww xx yy")).toDF("doc_id", "lang", "text")
    val out = graft.queries.TextVector.queries("q147_editdist_verify")(
        spark, sf) // schema check only — planted run below
    assert(out.columns.toSeq ==
      Seq("id_a", "id_b", "dist", "max_len", "esim_micro"))
    // drive the chain on the planted frame via the private hook
    val pairs = graft.queries.TextVector.nearDupPairs(docs)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSeq
    assert(pairs == Seq((1L, 2L)), s"planted pair not found: $pairs")
    val t = docs.select($"doc_id", $"text")
    val verified = graft.queries.TextVector.nearDupPairs(docs)
      .select($"id_a", $"id_b")
      .join(t.select($"doc_id".as("id_a"), $"text".as("ta")), Seq("id_a"))
      .join(t.select($"doc_id".as("id_b"), $"text".as("tb")), Seq("id_b"))
      .select($"id_a", $"id_b", levenshtein($"ta", $"tb").as("dist"))
      .as[(Long, Long, Int)].collect().toSeq
    assert(verified == Seq((1L, 2L, 2)),
      s"edit distance diverged: $verified")
  }

  test("q157 containment: a planted subset pair scores one-sided containment 1, the superset side 0.8") {
    // B = A + two extra tokens: every one of A's 8 3-shingles
    // appears in B's 10, so C(A→B) = 8/8 = 1 (full inclusion — the
    // "excerpt" signature) while C(B→A) = 8/10; Jaccard 8/10 ≥ 0.5
    // keeps the pair in the q24 stage (the q147 fixture device)
    val a = "aa bb cc dd ee ff gg hh ii jj"
    val b = a + " kk ll"
    val docs = Seq(
      (1L, "en", a), (2L, "en", b),
      (3L, "en", "qq rr ss tt uu vv ww xx yy")).toDF("doc_id", "lang", "text")
    val sh = docs.select($"doc_id",
        graft.ops.expressions.ShingleHashes($"text", 3).as("hs"))
      .filter(size($"hs") > 0)
    val out = graft.queries.TextVector.nearDupPairs(docs)
      .select($"id_a", $"id_b")
      .join(sh.select($"doc_id".as("id_a"), $"hs".as("ha")), Seq("id_a"))
      .join(sh.select($"doc_id".as("id_b"), $"hs".as("hb")), Seq("id_b"))
      .select($"id_a", $"id_b",
        size($"ha").cast("long"), size($"hb").cast("long"),
        size(array_intersect($"ha", $"hb")).cast("long"))
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 2L, 8L, 10L, 8L)),
      s"planted containment pair diverges: $out")
    // and the gated chain reports the micro ratios for this shape
    val cols = graft.queries.TextVector.queries("q157_containment")(
      spark, sf).columns.toSeq
    assert(cols == Seq("id_a", "id_b", "n_a", "n_b", "n_common",
      "cont_ab_micro", "cont_ba_micro"))
  }

  test("q148 readability: hand-computed Flesch on planted syllable/sentence counts") {
    // doc 1: "aa bb. cc dd." -> W=4 (the '.' tokens are split by the
    // sentence pass, tokens pattern counts letters+dots... plant
    // carefully: tokens = [aa, bb, ., cc, dd, .] — W counts ALL
    // tokens including punctuation (the tokenizer's definition);
    // syllables: 'aa','cc' etc = 1 vowel group, '.' has none -> floor 1
    val text = "aa bb. cc dd."
    val docs = Seq((1L, "en", text)).toDF("doc_id", "lang", "text")
    val out = graft.queries.Quality.readability(docs)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    // replicate the engine arithmetic: W = 6 tokens (aa bb . cc dd .),
    // S = 2 sentences, syllables = aa(1) bb(1) .(floor 1) cc(1) dd(1)
    // .(floor 1) = 6
    val (wc, sc, syl) = (6.0, 2.0, 6.0)
    val f = 206.835 - 1.015 * (wc / sc) - 84.6 * (syl / wc)
    val fm = micro(f)
    val mean = math.floor(fm.toDouble / 1.0 + 0.5).toLong
    assert(out == Seq(("en", 1L, mean, fm, fm)), s"got $out want fm=$fm")
  }

  test("SyllableCount kernel ≡ the HOF definition on testdata, edge strings and random corpora; SQL face agrees") {
    // the q148 chain swapped its interpreted per-token regexp HOF for
    // the codegen kernel — this pins bit-equality of the two
    def hof(c: org.apache.spark.sql.Column) = aggregate(
      transform(graft.ops.TextOps.tokens(c), t => greatest(
        size(regexp_extract_all(lower(t), lit("[aeiouy]+"), lit(0)))
          .cast("long"), lit(1L))),
      lit(0L), (acc, x) => acc + x)
    def diff(df: org.apache.spark.sql.DataFrame): Long =
      df.filter(graft.ops.expressions.SyllableCount($"text") =!= hof($"text"))
        .count()
    assert(diff(Tables.documents(spark, sf)) == 0L, "kernel diverges on testdata")
    val rnd = new scala.util.Random(20260815L)
    val edge = Seq("", " ", "...", "a", "Y", "bcd", "AEIOUY", "a1a",
      "ab-yz! aeiou?", "ÄÖÜ é ß", "ttuu", "w3 w3y yyy")
    val fuzz = (1 to 200).map { _ =>
      (1 to rnd.nextInt(12)).map(_ => rnd.nextInt(4) match {
        case 0 => s"w${rnd.nextInt(10)}"
        case 1 => "aeiouy".substring(0, 1 + rnd.nextInt(5))
        case 2 => Seq(".", "!", "?", ",", "-").apply(rnd.nextInt(5))
        case _ => "XYZ"
      }).mkString(" ")
    }
    assert(diff((edge ++ fuzz).toDF("text")) == 0L, "kernel diverges on fuzz")
    // SQL registry face
    assert(spark.sql("SELECT syllable_count('aa bb. cc')").head().getLong(0) ==
      Seq("aa" -> 1, "bb" -> 1, "." -> 1, "cc" -> 1).map(_._2).sum.toLong)
  }

  test("q149 Heaps fit: exact power-law (N, V) points recover beta = 0.5 and ln k = ln 2") {
    // three sources on V = 2·N^0.5 exactly: (4, 4), (16, 8), (64, 16)
    def src(n: Int, v: Int) =
      (0 until n).map(i => s"t${i % v}").mkString(" ")
    val docs = Seq(
      (1L, "en", "A", src(4, 4)), (2L, "en", "B", src(16, 8)),
      (3L, "en", "C", src(64, 16)))
      .toDF("doc_id", "lang", "source", "text")
    val out = graft.queries.Corpus.heapsFit(docs)
      .as[(String, Long, Long, Long)].collect().toSeq
    // replicate the engine's quantize-then-sum pipeline exactly
    val pts = Seq((4, 4), (16, 8), (64, 16)).map { case (n, v) =>
      val x = math.log(n.toDouble); val y = math.log(v.toDouble)
      (micro(x), micro(y), micro(x * y), micro(x * x))
    }
    val (sx, sy, sxy, sxx) = (pts.map(_._1).sum, pts.map(_._2).sum,
      pts.map(_._3).sum, pts.map(_._4).sum)
    val k = 3.0
    def d(l: Long) = l.toDouble / 1e6
    val den = k * d(sxx) - d(sx) * d(sx)
    val beta = (k * d(sxy) - d(sx) * d(sy)) / den
    val lnk = (d(sy) - beta * d(sx)) / k
    assert(out == Seq(("en", 3L, micro(beta), micro(lnk))))
    assert(math.abs(micro(beta) - 500000L) <= 5, s"beta ${micro(beta)}")
    assert(math.abs(micro(lnk) - micro(math.log(2.0))) <= 5)
  }

  test("randomized differential: q140/q141/q146 match in-memory references on random corpora") {
    // the planted cases above pin specific shapes; this pins the full
    // semantics on inputs nobody hand-picked (the CleaningSpec
    // differential discipline)
    val rnd = new scala.util.Random(20260815L)
    for (trial <- 1 to 3) {
      val docs = (0L until 40L).map { id =>
        val lang = if (rnd.nextBoolean()) "en" else "fr"
        val toks = Vector.fill(rnd.nextInt(9))(s"w${rnd.nextInt(10)}")
        (id, lang, toks.mkString(" "))
      }
      val df = docs.toDF("doc_id", "lang", "text")
      val byLang = docs.groupBy(_._2).map { case (l, ds) =>
        l -> ds.map(_._3.split(" ").filter(_.nonEmpty).toVector)
      }

      // ---- q140 reference ----
      val wantDiv = byLang.collect {
        case (l, ts) if ts.exists(_.nonEmpty) =>
          val counts = ts.flatten.groupBy(identity).map(_._2.size)
          val (nTok, nTyp) = (ts.map(_.size).sum.toLong, counts.size.toLong)
          val hap = counts.count(_ == 1).toLong
          val dis = counts.count(_ == 2).toLong
          val herdan = if (nTok > 1)
            micro(math.log(nTyp.toDouble) / math.log(nTok.toDouble)) else 0L
          (l, nTok, nTyp, hap, dis,
            nTyp * 1000000L / nTok, hap * 1000000L / nTyp, herdan)
      }.toSeq.sortBy(_._1)
      val gotDiv = graft.queries.Corpus.lexicalDiversity(df)
        .as[(String, Long, Long, Long, Long, Long, Long, Long)]
        .collect().toSeq
      assert(gotDiv == wantDiv, s"trial $trial: q140 diverges")

      // ---- q141 reference (distinct gram STRINGS — a hash
      // collision in the engine would surface here) ----
      val wantN = byLang.toSeq.flatMap { case (l, ts) =>
        (1 to 3).map { n =>
          val tot = ts.map(t => math.max(t.size - n + 1, 0).toLong).sum
          val dis = ts.flatMap(_.sliding(n).filter(_.size == n)
            .map(_.mkString(" "))).toSet.size.toLong
          val m = if (tot > 0) dis * 1000000L / tot else 0L
          (l, n.toLong, tot, dis, m)
        }
      }.sortBy(r => (r._1, r._2))
      val gotN = graft.queries.Corpus.distinctNgrams(df)
        .as[(String, Long, Long, Long, Long)].collect().toSeq
      assert(gotN == wantN, s"trial $trial: q141 diverges")

      // ---- q146 reference: Gini over sorted doc lengths ----
      val wantG = byLang.map { case (l, ts) =>
        val xs = ts.map(_.size.toLong).sorted
        val n = xs.size.toLong
        val s = xs.sum
        val t2 = xs.zipWithIndex.map { case (x, i0) =>
          2L * (i0 + 1) * x }.sum
        val g = if (s > 0)
          micro(t2.toDouble / (n.toDouble * s.toDouble) -
            (n + 1).toDouble / n.toDouble)
        else 0L
        (l, n, s, g)
      }.toSeq.sortBy(_._1)
      val gotG = graft.queries.Corpus.giniLengths(df)
        .as[(String, Long, Long, Long)].collect().toSeq
      assert(gotG == wantG, s"trial $trial: q146 diverges")
    }
  }

  test("randomized differential: q159/q162 match in-memory references on random corpora") {
    val rnd = new scala.util.Random(20260816L)
    for (trial <- 1 to 3) {
      val docs = (0L until 40L).map { id =>
        val src = s"s${rnd.nextInt(3)}"
        val lang = if (rnd.nextBoolean()) "en" else "fr"
        val toks = Vector.fill(rnd.nextInt(9))(s"w${rnd.nextInt(10)}")
        (id, src, lang, toks.mkString(" "))
      }
      val df = docs.toDF("doc_id", "source", "lang", "text")
      def toksOf(t: String) = t.split(" ").filter(_.nonEmpty).toVector

      // ---- q162 reference: exact frequency spectrum + the integer
      // Chao1/jackknife arithmetic (langs with zero tokens have no
      // count rows and are out of the frame, like the engine) ----
      val wantC = docs.groupBy(_._3).collect {
        case (l, ds) if ds.exists(d => toksOf(d._4).nonEmpty) =>
          val counts = ds.flatMap(d => toksOf(d._4))
            .groupBy(identity).map(_._2.size.toLong)
          val nTok = counts.sum; val nTyp = counts.size.toLong
          val n1 = counts.count(_ == 1L).toLong
          val n2 = counts.count(_ == 2L).toLong
          (l, nTok, nTyp, n1, n2,
            nTyp * 1000000L + (n1 * (n1 - 1L) * 1000000L) / (2L * (n2 + 1L)),
            nTyp + n1)
      }.toSeq.sortBy(_._1)
      val gotC = graft.queries.Corpus.chaoRichness(df)
        .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
      assert(gotC == wantC, s"trial $trial: q162 diverges")

      // ---- q159 reference: cross-multiplied CDF differences over
      // the shared support, step-weighted, one double conversion ----
      val allLens = docs.map(d => toksOf(d._4).size.toLong)
      val support = allLens.distinct.sorted
      val corpusCnt = allLens.groupBy(identity).view.mapValues(_.size.toLong)
      val nC = allLens.size.toLong
      val wantW = docs.groupBy(_._2).toSeq.sortBy(_._1).map { case (src, ds) =>
        val lens = ds.map(d => toksOf(d._4).size.toLong)
        val nS = lens.size.toLong
        val cnt = lens.groupBy(identity).view.mapValues(_.size.toLong)
        var cumS = 0L; var cumC = 0L; var w1 = 0L; var ks = 0L
        for (k <- support.indices) {
          cumS += cnt.getOrElse(support(k), 0L)
          cumC += corpusCnt(support(k))
          val dd = math.abs(cumS * nC - cumC * nS)
          ks = math.max(ks, dd)
          if (k < support.length - 1) w1 += dd * (support(k + 1) - support(k))
        }
        (src, nS,
          math.floor(w1.toDouble / (nS.toDouble * nC.toDouble) * 1e6 + 0.5).toLong,
          math.floor(ks.toDouble / (nS.toDouble * nC.toDouble) * 1e6 + 0.5).toLong)
      }
      val gotW = graft.queries.Corpus.lengthDrift(df)
        .as[(String, Long, Long, Long)].collect().toSeq
      assert(gotW == wantW, s"trial $trial: q159 diverges")
    }
  }

  test("randomized differential: q160/q163 match in-memory references on random corpora") {
    def toksOf(t: String) = t.split(" ").filter(_.nonEmpty).toVector
    val rnd = new scala.util.Random(20260819L)
    for (trial <- 1 to 3) {
      val docs = (0L until 30L).map { id =>
        val src = s"s${rnd.nextInt(3)}"
        val lang = if (rnd.nextBoolean()) "en" else "fr"
        val toks = Vector.fill(rnd.nextInt(7))(s"w${rnd.nextInt(8)}")
        (id, src, lang, toks.mkString(" "))
      }
      val df = docs.toDF("doc_id", "source", "lang", "text")

      // ---- q160 reference: BigInt cross-products, engine-order
      // double division ----
      val tf = docs.flatMap(d => toksOf(d._4).map(w => (d._2, w)))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val ct = tf.toSeq.groupBy(_._1._2).view
        .mapValues(_.map(_._2).sum).toMap
      val ni = tf.toSeq.groupBy(_._1._1).view
        .mapValues(_.map(_._2).sum).toMap
      val nTot = ni.values.sum
      val top = ct.toSeq.sortBy { case (w, c) => (-c, w) }.take(20)
      val wantD = top.map { case (w, c) =>
        val s = ni.toSeq.map { case (src, nI) =>
          (BigInt(tf.getOrElse((src, w), 0L)) * nTot - BigInt(nI) * c).abs
        }.sum
        (w, c, math.floor(s.toDouble /
          (2.0 * c.toDouble * nTot.toDouble) * 1e6 + 0.5).toLong)
      }.sortBy { case (w, c, _) => (-c, w) }
      val gotD = graft.queries.Corpus.termDispersion(df)
        .as[(String, Long, Long)].collect().toSeq
      assert(gotD == wantD, s"trial $trial: q160 diverges")

      // ---- q163 reference: nano-quantized sqrt damping, BigInt
      // integral divisions ----
      val byLang = docs.groupBy(_._3).view
        .mapValues(_.map(d => toksOf(d._4).size.toLong).sum).toMap
      val n = byLang.values.sum
      val q = byLang.view.mapValues(c =>
        math.floor(math.sqrt(c.toDouble / n.toDouble) * 1e9 + 0.5).toLong)
        .toMap
      val qs = q.values.sum
      val wantT = byLang.toSeq.sortBy(_._1).map { case (l, c) =>
        val w = (BigInt(q(l)) * 1000000 / qs).toLong
        val ep = if (c > 0)
          (BigInt(q(l)) * n * 1000000 / (BigInt(qs) * c)).toLong else 0L
        (l, c, (BigInt(c) * 1000000 / n).toLong, w, ep)
      }
      val gotT = graft.queries.Learn.temperatureMix(df)
        .as[(String, Long, Long, Long, Long)].collect().toSeq
      assert(gotT == wantT, s"trial $trial: q163 diverges")
    }
  }

  test("randomized differential: q161/q165 match in-memory langId-chain references on random corpora") {
    // the langId replica: same dicts, same argmax tie order, same
    // 'und' fallback (PropertySpec pins the kernel ≡ the HOF; this
    // pins the CHAINS built on it — joins, coalesces, rollups)
    def toksOf(t: String) =
      graft.ops.TextOps.TokenPattern.r.findAllIn(t).toVector
    def langOf(toks: Seq[String]): String = {
      val scores = graft.ops.TextOps.LangDicts.map { case (l, d) =>
        l -> toks.count(d.toSet) }
      val best = scores.map(_._2).max
      scores.find { case (_, s) => s == best && best > 0 }
        .map(_._1).getOrElse("und")
    }
    def sentsOf(t: String) = t
      .split(s"[.!?]+[${" \\t\\n\\x0B\\f\\r"}]*").toVector
      .filter(_.trim.nonEmpty)
    def micro(v: Double): Long = math.floor(v * 1e6 + 0.5).toLong
    val words = Seq("the", "value", "der", "nicht", "le", "los", "zz")
    val rnd = new scala.util.Random(20260818L)
    for (trial <- 1 to 3) {
      val docs = (0L until 30L).map { id =>
        val src = s"s${rnd.nextInt(3)}"
        val lang = Seq("en", "de", "fr")(rnd.nextInt(3))
        val sents = Vector.fill(1 + rnd.nextInt(3))(
          Vector.fill(1 + rnd.nextInt(4))(words(rnd.nextInt(words.size)))
            .mkString(" "))
        (id, src, lang, sents.mkString(". ") + ".")
      }
      val df = docs.toDF("doc_id", "source", "lang", "text")

      // ---- q161 reference ----
      val perDoc = docs.map { d =>
        val labels = sentsOf(d._4).map(s => langOf(toksOf(s)))
        val byLang = labels.groupBy(identity).view.mapValues(_.size).toMap
        val n = labels.size.toDouble
        val ent = byLang.values
          .map(c => micro(-(c / n) * math.log(c / n))).sum
        val cmi = micro(1.0 - byLang.values.max / n)
        (d._2, byLang.size, ent, cmi)
      }
      val wantCs = perDoc.groupBy(_._1).toSeq.sortBy(_._1).map {
        case (src, ds) =>
          val nDocs = ds.size.toLong
          val nMixed = ds.count(_._2 >= 2).toLong
          (src, nDocs, nMixed, nMixed * 1000000L / nDocs,
            ds.map(_._3).sum / nDocs, ds.map(_._4).sum / nDocs)
      }
      val gotCs = graft.queries.Corpus.codeSwitch(df)
        .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
      spark.catalog.clearCache() // q161 cnt persist contract
      assert(gotCs == wantCs, s"trial $trial: q161 diverges")

      // ---- q165 reference: one-vs-rest kappa off the doc-level
      // confusion, signed division replicated with BigInt ----
      val conf = docs.map(d => (d._3, langOf(toksOf(d._4))))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val n = docs.size.toLong
      val rows = conf.toSeq.groupBy(_._1._1).view
        .mapValues(_.map(_._2).sum).toMap
      val cols = conf.toSeq.groupBy(_._1._2).view
        .mapValues(_.map(_._2).sum).toMap
      val classes = (rows.keySet ++ cols.keySet).toSeq.sorted
      val wantK = classes.map { l =>
        val (r, c) = (rows.getOrElse(l, 0L), cols.getOrElse(l, 0L))
        val tp = conf.getOrElse((l, l), 0L)
        val tn = n - r - c + tp
        val a = BigInt(tp + tn) * n
        val b = BigInt(r) * c + BigInt(n - r) * (n - c)
        val nn = BigInt(n) * n
        val kappa =
          if (nn > b)
            ((if (a >= b) 1 else -1) * ((a - b).abs * 1000000 / (nn - b)))
              .toLong
          else 0L
        (l, r, c, tp, (BigInt(tp + tn) * 1000000 / n).toLong,
          (b * 1000000 / nn).toLong, kappa)
      }
      val gotK = graft.queries.Corpus.labelAgreement(df)
        .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
      spark.catalog.clearCache() // q165 conf persist contract
      assert(gotK == wantK, s"trial $trial: q165 diverges")
    }
  }

  test("q142 burstiness: bursty term tops, even term follows, sub-floor term excluded") {
    // tt: 3 per doc × 5 docs (cf 15, df 5 → 3.0); uu: 1 × 5 (1.0);
    // vv: 5 per doc but only 4 docs — under the df floor, excluded
    val base = (1 to 5).map { i =>
      val extra = if (i <= 4) " vv vv vv vv vv" else ""
      (i.toLong, "en", s"tt tt tt uu$extra")
    }
    val docs = base.toDF("doc_id", "lang", "text")
    val out = graft.queries.Corpus.burstiness(docs)
      .as[(String, String, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("en", "tt", 15L, 5L, 3000000L, 1L),
      ("en", "uu", 5L, 5L, 1000000L, 2L)))
  }

  test("q152 Good-Turing: planted frequency spectrum recovers exact discounts, zero guards hold") {
    // counts: a=1 (N1=1), b=2, f=2 (N2=2), c=3 (N3=1), d=4 (N4=1)
    // N = 12 tokens, V = 5 types
    val docs = Seq((1L, "en", "a b b f f c c c d d d d"))
      .toDF("doc_id", "lang", "text")
    val out = graft.queries.Corpus.goodTuring(docs)
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    assert(out == Seq(("en", 12L, 5L, 1L, 2L, 1L, 1L,
      1000000L / 12L,       // p0 = N1/N
      4000000L,             // r*1 = 2·N2/N1 = 4
      1500000L,             // r*2 = 3·N3/N2 = 1.5
      4000000L)))           // r*3 = 4·N4/N3 = 4
    // no hapax: p0 = 0 and the r* chain guards its zero denominators
    val none = Seq((1L, "fr", "g g h h")).toDF("doc_id", "lang", "text")
    val o2 = graft.queries.Corpus.goodTuring(none)
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    assert(o2 == Seq(("fr", 4L, 2L, 0L, 2L, 0L, 0L, 0L, 0L, 0L, 0L)))
  }

  test("q153 source KL: planted two-source corpus matches the replayed per-term arithmetic; identical source scores 0") {
    // s1: x x y (N=3); s2: x y y y (N=4); corpus: x=3, y=4, N=7
    val docs = Seq((1L, "s1", "x x y"), (2L, "s2", "x y y y"))
      .toDF("doc_id", "source", "text")
    def term(csw: Long, ns: Long, cw: Long, n: Long): Long =
      math.floor((csw.toDouble / ns.toDouble) *
        math.log((csw.toDouble * n.toDouble) / (ns.toDouble * cw.toDouble))
        * 1e6 + 0.5).toLong
    val want = Seq(
      ("s1", 3L, 2L, term(2, 3, 3, 7) + term(1, 3, 4, 7)),
      ("s2", 4L, 2L, term(1, 4, 3, 7) + term(3, 4, 4, 7)))
    val out = graft.queries.Corpus.sourceKl(docs)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(out == want, s"q153 diverges: $out vs $want")
    // a source distributed exactly like the corpus has KL = 0
    val same = Seq((1L, "a", "x x y"), (2L, "b", "x x y"))
      .toDF("doc_id", "source", "text")
    val o2 = graft.queries.Corpus.sourceKl(same)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(o2.forall(_._4 == 0L), s"identical sources must score 0: $o2")
  }

  test("q154 entropy rate: alternating text scores H1 = ln 2 with conditional rate ~0; constant text scores 0") {
    // en: "a b a b a b" — unigrams a=3,b=3 (H1 = ln 2); pairs
    // ab=3, ba=2 (H2 < 2·H1: the chain is deterministic given the
    // previous token up to the 3/5-2/5 split)
    // fr: "c c c c" — both entropies 0 (one type, one pair)
    val docs = Seq((1L, "en", "a b a b a b"), (2L, "fr", "c c c c"))
      .toDF("doc_id", "lang", "text")
    def plogp(c: Long, n: Long): Long =
      math.floor(-(c.toDouble / n.toDouble) *
        math.log(c.toDouble / n.toDouble) * 1e6 + 0.5).toLong
    val h1 = plogp(3, 6) * 2
    val h2 = plogp(3, 5) + plogp(2, 5)
    val out = graft.queries.Corpus.entropyRate(docs)
      .as[(String, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    assert(out == Seq(
      ("en", 6L, 2L, 5L, 2L, h1, h2, h2 - h1),
      ("fr", 4L, 1L, 3L, 1L, 0L, 0L, 0L)), s"q154 diverges: $out")
    // quantize-THEN-sum: h1 is 2·micro(½ln2), one ulp above
    // micro(ln 2) — the order the oracle replays
    assert(math.abs(h1 - micro(math.log(2.0))) <= 1L)
  }

  test("q154 entropy rate: a language of single-token documents keeps its H1 row with zero bigrams and null h2/cond") {
    // Round-15 advisor note: the inner nbi join silently dropped any
    // language with no bigram evidence. 'de' is two one-token docs —
    // unigram H1 = ln 2 over {x, y}, zero bigrams; it must report,
    // not vanish, and the undefined H2/cond surface as nulls.
    val docs = Seq((1L, "de", "x"), (2L, "de", "y"),
      (3L, "fr", "c c")).toDF("doc_id", "lang", "text")
    def plogp(c: Long, n: Long): Long =
      math.floor(-(c.toDouble / n.toDouble) *
        math.log(c.toDouble / n.toDouble) * 1e6 + 0.5).toLong
    val out = graft.queries.Corpus.entropyRate(docs)
      .as[(String, Long, Long, Long, Long, Long, Option[Long], Option[Long])]
      .collect().toSeq
    assert(out == Seq(
      ("de", 2L, 2L, 0L, 0L, plogp(1, 2) * 2, None, None),
      ("fr", 2L, 1L, 1L, 1L, 0L, Some(0L), Some(0L))),
      s"q154 single-token-language contract diverges: $out")
  }

  test("q155 concentration: two equal groups score HHI 0.5 / eff 2; a monopoly scores 1 / eff 1") {
    val docs = Seq(
      (1L, "A", "en", "t t t"), (2L, "A", "en", "t"),
      (3L, "B", "fr", "t t t t"))
      .toDF("doc_id", "source", "lang", "text")
    val out = graft.queries.Corpus.concentration(docs)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    // both dims: two groups of 4 tokens each — shares 1/2, HHI 1/2,
    // effective group count exactly 2
    assert(out == Seq(
      ("lang", 2L, 8L, 500000L, 2000000L),
      ("source", 2L, 8L, 500000L, 2000000L)), s"q155 diverges: $out")
    val mono = Seq((1L, "A", "en", "t t")).toDF("doc_id", "source", "lang", "text")
    val o2 = graft.queries.Corpus.concentration(mono)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(o2 == Seq(
      ("lang", 1L, 2L, 1000000L, 1000000L),
      ("source", 1L, 2L, 1000000L, 1000000L)))
  }

  test("q162 chao richness: planted spectra recover the exact bias-corrected Chao1 and jackknife") {
    // en: aa×3 bb×2 cc dd → V 4, N₁ 2, N₂ 1 → chao1 = 4 + 2·1/(2·2)
    // = 4.5, jack1 = 6; fr: two hapaxes, NO doubletons — the
    // bias-corrected form's whole point (n₂ = 0 divides fine):
    // 2 + 2·1/2 = 3, jack1 = 4; de: single hapax → V exactly
    val docs = Seq(
      (1L, "en", "aa aa bb cc"), (2L, "en", "aa bb dd"),
      (3L, "fr", "x y"), (4L, "de", "z"))
      .toDF("doc_id", "lang", "text")
    val out = graft.queries.Corpus.chaoRichness(docs)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("de", 1L, 1L, 1L, 0L, 1000000L, 2L),
      ("en", 7L, 4L, 2L, 1L, 4500000L, 6L),
      ("fr", 2L, 2L, 2L, 0L, 3000000L, 4L)), s"q162 diverges: $out")
  }

  test("q165 label agreement: planted confusions score exact kappa, perfect disagreement -1, single class 0") {
    // en: 1 hit + 1 miss; de: 2 hits → per-class one-vs-rest:
    // po = 3/4, pe = 1/2, kappa = (3/4 − 1/2)/(1 − 1/2) = 1/2
    val docs = Seq(
      (1L, "en", "the value"), (2L, "en", "der ist"),
      (3L, "de", "der ist nicht"), (4L, "de", "das und"))
      .toDF("doc_id", "lang", "text")
    val out = graft.queries.Corpus.labelAgreement(docs)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("de", 2L, 3L, 2L, 750000L, 500000L, 500000L),
      ("en", 2L, 1L, 1L, 750000L, 500000L, 500000L)), s"q165 diverges: $out")
    // systematic disagreement: binary kappa hits exactly −1 (the
    // signed path — Spark div truncates, DuckDB // floors; the abs
    // split keeps both on nonnegative operands)
    val swapped = Seq((1L, "en", "der ist"), (2L, "de", "the value"))
      .toDF("doc_id", "lang", "text")
    val o2 = graft.queries.Corpus.labelAgreement(swapped)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(o2 == Seq(
      ("de", 1L, 1L, 0L, 0L, 500000L, -1000000L),
      ("en", 1L, 1L, 0L, 0L, 500000L, -1000000L)), s"q165 sign: $o2")
    // degenerate single class: pe = 1 → guarded 0, not a crash
    val mono = Seq((1L, "en", "the value"), (2L, "en", "the a"))
      .toDF("doc_id", "lang", "text")
    val o3 = graft.queries.Corpus.labelAgreement(mono)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(o3 == Seq(("en", 2L, 2L, 2L, 1000000L, 1000000L, 0L)))
  }

  test("q159 length drift: planted length sets score their exact W1/KS, identical sources score 0") {
    // srcA lengths {1, 3}, srcB {3, 3} → corpus {1: 1/4, 3: 3/4}.
    // On [1, 3): |F_A − F_c| = |1/2 − 1/4| = 1/4 over width 2 → W1 =
    // 1/2 both sources (B: |0 − 1/4| · 2); KS = 1/4.
    val docs = Seq(
      (1L, "srcA", "a"), (2L, "srcA", "a b c"),
      (3L, "srcB", "a b c"), (4L, "srcB", "a b c"))
      .toDF("doc_id", "source", "text")
    val out = graft.queries.Corpus.lengthDrift(docs)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("srcA", 2L, 500000L, 250000L),
      ("srcB", 2L, 500000L, 250000L)), s"q159 diverges: $out")
    // identical length distributions → both drift stats exactly 0
    val same = Seq(
      (1L, "srcA", "a"), (2L, "srcA", "a b c"),
      (3L, "srcB", "a"), (4L, "srcB", "a b c"))
      .toDF("doc_id", "source", "text")
    val o2 = graft.queries.Corpus.lengthDrift(same)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(o2 == Seq(("srcA", 2L, 0L, 0L), ("srcB", 2L, 0L, 0L)))
  }

  test("q160 term dispersion: concentrated term scores its exact DP, evenly-spread term scores 0") {
    // srcA "x x x y z", srcB "y y y y z": N = 10, n_A = n_B = 5.
    //   x (ct 3): ½(|3/3 − 1/2| + |0/3 − 1/2|) = 1/2
    //   y (ct 5): ½(|1/5 − 1/2| + |4/5 − 1/2|) = 3/10
    //   z (ct 2): in both sources at exactly the source shares → 0
    val docs = Seq(
      (1L, "srcA", "x x x y z"), (2L, "srcB", "y y y y z"))
      .toDF("doc_id", "source", "text")
    val out = graft.queries.Corpus.termDispersion(docs)
      .as[(String, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("y", 5L, 300000L), ("x", 3L, 500000L), ("z", 2L, 0L)),
      s"q160 diverges: $out")
  }

  test("q161 code switch: a planted bilingual doc scores CMI 1/2 and entropy ln 2, monolingual scores 0") {
    val docs = Seq(
      (1L, "srcA", "the value is fast. der ist nicht ein."),
      (2L, "srcA", "the value is fast."),
      (3L, "srcB", "xyzzy plugh."))
      .toDF("doc_id", "source", "text")
    val out = graft.queries.Corpus.codeSwitch(docs)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    // doc 1: sentences en + de → n_langs 2, CMI 1 − 1/2, entropy
    // 2·micro(−½ln½) (quantize-then-sum); doc 2: en only → 0/0;
    // srcA means integer-divide by 2. doc 3: one 'und' sentence —
    // a single label, NOT mixed.
    val ent = 2L * micro(-0.5 * math.log(0.5))
    assert(out == Seq(
      ("srcA", 2L, 1L, 500000L, ent / 2L, 250000L),
      ("srcB", 1L, 0L, 0L, 0L, 0L)), s"q161 diverges: $out")
  }

  test("q173 padding waste: rung boundaries, top-rung truncation, zero-token drop") {
    val docs = Seq(("en", 16L), ("en", 17L), ("en", 0L), ("de", 600L))
      .toDF("lang", "len")
    val out = graft.queries.Quality.paddingWaste(docs)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    // en/16: exact fit → waste 0; en/32: one 17-token doc → 15/32;
    // de: 600 truncates to the 512 rung → exact fit; zero-token drops.
    val w32 = math.floor(15.0 / 32.0 * 1e6 + 0.5).toLong
    assert(out == Seq(
      ("de", 512L, 1L, 512L, 512L, 0L),
      ("en", 16L, 1L, 16L, 16L, 0L),
      ("en", 32L, 1L, 17L, 32L, w32)), s"q173 diverges: $out")
  }

  test("q175 TextTiling: the V-shaped cohesion valley fires; uniform and single-block docs emit nothing") {
    // doc 1 blocks (width 10): [a×10][a×6 b×4][b×10][b×10] →
    // overlaps 6, 4, 10 — gap 1 is the strict local minimum below
    // the mean (4·3 < 20) → ONE boundary at token offset 20 with
    // evidence (4, prev 6, next 10). doc 2: 20 uniform tokens → one
    // gap, below-mean test can't hold → nothing. doc 3: one block.
    val d1 = (Seq.fill(16)("a") ++ Seq.fill(24)("b")).mkString(" ")
    val d2 = Seq.fill(20)("c").mkString(" ")
    val docs = Seq((1L, d1), (2L, d2), (3L, "tiny doc here"))
      .toDF("doc_id", "text")
    val out = graft.queries.Corpus.textTiling(docs)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 4L, 1L, 20L, 4L, 6L, 10L)),
      s"q175 diverges: $out")
  }

  test("q177 planted LOO novelty: hand-computed smoothed probabilities and unique terms") {
    // srcA = "a a b", srcB = "b c"; cw: a=2 b=2 c=1; N=5, V=3.
    // LOO-A denom 5−3+3=5: a→(2−2+1)/5, b→(2−1+1)/5; unique: a.
    // LOO-B denom 5−2+3=6: b→2/6, c→1/6; unique: c.
    val docs = Seq(("srcA", "a a b"), ("srcB", "b c"))
      .toDF("source", "text")
    def m(x: Double) = math.floor(x * 1e6 + 0.5).toLong
    val stA = m(-2.0 * math.log(1.0 / 5.0)) + m(-1.0 * math.log(2.0 / 5.0))
    val stB = m(-1.0 * math.log(2.0 / 6.0)) + m(-1.0 * math.log(1.0 / 6.0))
    val out = graft.queries.Corpus.looNovelty(docs)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("srcA", 3L, 2L, 1L, math.floor(stA.toDouble / 3.0 + 0.5).toLong),
      ("srcB", 2L, 2L, 1L, math.floor(stB.toDouble / 2.0 + 0.5).toLong)),
      s"q177 diverges: $out")
  }

  test("q179 planted stylometry: exact Scala replay of moments and z-scores; single source scores 0") {
    // three sources, five terms (all inside the F=32 marker set):
    // srcA "the cat sat", srcB "the the dog", srcC "mouse mouse mouse"
    val docs = Seq(("srcA", "the cat sat"), ("srcB", "the the dog"),
      ("srcC", "mouse mouse mouse")).toDF("source", "text")
    val counts = Map(("srcA", "the") -> 1L, ("srcA", "cat") -> 1L,
      ("srcA", "sat") -> 1L, ("srcB", "the") -> 2L, ("srcB", "dog") -> 1L,
      ("srcC", "mouse") -> 3L)
    val sources = Seq("srcA", "srcB", "srcC")
    val nS = Map("srcA" -> 3L, "srcB" -> 3L, "srcC" -> 3L)
    val terms = Seq("cat", "dog", "mouse", "sat", "the")
    def fq(s: String, w: String): Long =
      math.floor(counts.getOrElse((s, w), 0L).toDouble / nS(s).toDouble
        * 1e6 + 0.5).toLong
    // the EXACT engine arithmetic: int64 moment sums, fixed-order
    // double mu/var/z, micro-quantized |z|
    def zq(s: String, w: String): Long = {
      val fs = sources.map(fq(_, w))
      val sf = fs.sum; val sf2 = fs.map(v => v * v).sum; val sc = fs.size
      val mu = sf.toDouble / sc.toDouble
      val varr = sf2.toDouble / sc.toDouble - mu * mu
      if (varr <= 0.0) 0L
      else math.floor(math.abs((fq(s, w).toDouble - mu) / math.sqrt(varr))
        * 1e6 + 0.5).toLong
    }
    val want = sources.map { s =>
      val zs = terms.map(w => (w, zq(s, w)))
      val delta = math.floor(zs.map(_._2).sum.toDouble
        / terms.size.toDouble + 0.5).toLong
      val top = zs.sortBy { case (w, z) => (-z, w) }.head
      (s, nS(s), delta, top._1, top._2)
    }
    val out = graft.queries.Corpus.stylometry(docs)
      .as[(String, Long, Long, String, Long)].collect().toSeq
    assert(out == want, s"q179 diverges:\n got $out\nwant $want")
    // the monolingual-feed degenerate: one source, every marker has
    // zero cross-source variance -> the guard scores 0, never NaN
    val one = Seq(("only", "x y z")).toDF("source", "text")
    val o = graft.queries.Corpus.stylometry(one)
      .as[(String, Long, Long, String, Long)].collect().toSeq
    assert(o.map(r => (r._1, r._2, r._3)) == Seq(("only", 3L, 0L)),
      s"single-source corpus must score delta 0: $o")
    spark.catalog.clearCache()
  }

  test("randomized differential: q179 matches an in-memory reference on random corpora") {
    // guards the full moment/z chain (marker selection, micro
    // frequencies, int64 moment sums, fixed-order double z, rank-1
    // tie-break) against an INDEPENDENT reference on corpora the
    // planted fixture cannot anticipate
    val rnd = new scala.util.Random(20260816L)
    for (_ <- 1 to 3) {
      val nSrc = 2 + rnd.nextInt(4)
      val vocab = (0 until 12).map(i => s"w$i")
      val docs = (0 until nSrc).flatMap { si =>
        (0 until 1 + rnd.nextInt(3)).map { _ =>
          (s"src$si",
            Vector.fill(3 + rnd.nextInt(40))(vocab(rnd.nextInt(vocab.size)))
              .mkString(" "))
        }
      }.toDF("source", "text")

      // reference: plain Scala, same arithmetic
      val rows = docs.as[(String, String)].collect()
      val counts = rows.flatMap { case (src, t) =>
        t.split(" ").map(w => (src, w)) }
        .groupBy(identity).map { case (k, g) => k -> g.length.toLong }
      val nS = counts.groupBy(_._1._1).map { case (s0, g) => s0 -> g.values.sum }
      val sources = nS.keys.toSeq.sorted
      val markers = counts.groupBy(_._1._2)
        .map { case (w, g) => (w, g.values.sum) }.toSeq
        .sortBy { case (w, ct) => (-ct, w) }
        .take(graft.queries.Corpus.DeltaMarkers).map(_._1)
      def fq(s0: String, w: String): Long =
        math.floor(counts.getOrElse((s0, w), 0L).toDouble
          / nS(s0).toDouble * 1e6 + 0.5).toLong
      def zq(s0: String, w: String): Long = {
        val fs = sources.map(fq(_, w))
        val sf = fs.sum; val sf2 = fs.map(v => v * v).sum; val sc = fs.size
        val mu = sf.toDouble / sc.toDouble
        val varr = sf2.toDouble / sc.toDouble - mu * mu
        if (varr <= 0.0) 0L
        else math.floor(math.abs((fq(s0, w).toDouble - mu)
          / math.sqrt(varr)) * 1e6 + 0.5).toLong
      }
      val want = sources.map { s0 =>
        val zs = markers.map(w => (w, zq(s0, w)))
        val delta = math.floor(zs.map(_._2).sum.toDouble
          / markers.size.toDouble + 0.5).toLong
        val top = zs.sortBy { case (w, z) => (-z, w) }.head
        (s0, nS(s0), delta, top._1, top._2)
      }
      val got = graft.queries.Corpus.stylometry(docs)
        .as[(String, Long, Long, String, Long)].collect().toSeq
      assert(got == want, s"q179 random differential:\n got $got\nwant $want")
      spark.catalog.clearCache()
    }
  }

  test("randomized differential: q173/q175 match in-memory references on random corpora") {
    val rnd = new scala.util.Random(20260818L)
    for (trial <- 1 to 3) {
      val docs = (0L until 40L).map { id =>
        val toks = Vector.fill(rnd.nextInt(45))(s"w${rnd.nextInt(5)}")
        (id, if (id % 2 == 0) "en" else "fr", toks)
      }

      // ---- q173 reference ----
      val rungs = Seq(16L, 32L, 64L, 128L, 256L, 512L)
      val wantP = docs
        .filter(_._3.nonEmpty)
        .map { case (_, lang, toks) =>
          val len = math.min(toks.size.toLong, 512L)
          (lang, rungs.find(len <= _).get, len)
        }
        .groupBy(r => (r._1, r._2)).toSeq
        .map { case ((lang, b), g) =>
          val n = g.size.toLong; val real = g.map(_._3).sum
          (lang, b, n, real, b * n,
            math.floor((b * n - real).toDouble / (b * n).toDouble * 1e6
              + 0.5).toLong)
        }.sortBy(r => (r._1, r._2))
      val gotP = graft.queries.Quality.paddingWaste(
        docs.map { case (_, lang, toks) =>
          (lang, toks.size.toLong) }.toDF("lang", "len"))
        .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
      assert(gotP == wantP, s"trial $trial: q173 diverges")

      // ---- q175 reference ----
      val wantT = docs.flatMap { case (id, _, toks) =>
        if (toks.isEmpty) Nil else {
          val blocks = toks.zipWithIndex.groupBy(_._2 / 10).view
            .mapValues(_.map(_._1)).toMap
          val nb = blocks.keys.max + 1
          if (nb < 2) Nil else {
            val ov = (0 until nb - 1).map { g =>
              val ca = blocks(g).groupBy(identity).view.mapValues(_.size).toMap
              val cb = blocks(g + 1).groupBy(identity).view.mapValues(_.size).toMap
              ca.map { case (t, c) => math.min(c, cb.getOrElse(t, 0)) }.sum.toLong
            }
            val tot = ov.sum; val n = ov.size
            (0 until n).flatMap { g =>
              val o = ov(g)
              val prv = if (g > 0) Some(ov(g - 1)) else None
              val nxt = if (g < n - 1) Some(ov(g + 1)) else None
              if (prv.forall(o < _) && nxt.forall(o < _) && o * n < tot)
                Some((id, nb.toLong, g.toLong, (g + 1) * 10L, o,
                  prv.getOrElse(-1L), nxt.getOrElse(-1L)))
              else None
            }
          }
        }
      }.sortBy(r => (r._1, r._3))
      val gotT = graft.queries.Corpus.textTiling(
        docs.map { case (id, _, toks) => (id, toks.mkString(" ")) }
          .toDF("doc_id", "text"))
        .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
      assert(gotT == wantT, s"trial $trial: q175 diverges\n got $gotT\nwant $wantT")
    }
  }
}
