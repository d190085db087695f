package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column
import graft.ops.TextOps
import graft.ops.expressions.HashKernel
import org.apache.spark.unsafe.types.UTF8String

/** Property-based invariants (SURVEY §5.3) over seeded ScalaCheck
  * generators (raw Gen — the scalatestplus bridge is not in the
  * offline cache). Kernel-level properties run on the driver;
  * column-level properties evaluate one batched DataFrame per
  * property to keep the suite fast.
  */
class PropertySpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val asciiText: Gen[String] =
    Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumChar, 2 -> Gen.const(' '), 1 -> Gen.oneOf('.', ',', '!'))
    ).map(_.mkString)

  test("polyhash is total, non-negative, and < 1e9+7 on arbitrary unicode") {
    samples(Gen.asciiPrintableStr, 100).foreach { s =>
      val h = HashKernel.polyHash(UTF8String.fromString(s))
      assert(h >= 0 && h < HashKernel.Mod, s"polyhash($s) = $h")
    }
    samples(Gen.listOf(Gen.choose('\u0000', '\uffff')).map(_.mkString), 100)
      .foreach { s =>
        val h = HashKernel.polyHash(UTF8String.fromString(s))
        assert(h >= 0 && h < HashKernel.Mod)
      }
  }

  test("polyhash of the empty string is 0; single-char is its code point mod P") {
    assert(HashKernel.polyHash(UTF8String.fromString("")) == 0L)
    val cps = samples(Gen.choose(1, 0x10FFFF)
      .suchThat(cp => !(0xD800 to 0xDFFF).contains(cp)), 100)
    cps.foreach { cp =>
      val s = new String(Character.toChars(cp))
      assert(HashKernel.polyHash(UTF8String.fromString(s)) == cp % HashKernel.Mod)
    }
  }

  test("packed 128-bit fingerprint == two independent single-family folds, on fuzz") {
    // independent reference: each component hash re-folded separately
    // (polyHashPacked folds BOTH families in one scan — a bug in the
    // fused loop's dual-accumulator bookkeeping shows up here), then
    // packed the documented way; plus unpacking recovers the classic
    // hash, the migration hook Fingerprint128Spec relies on
    def fold(s: String, base: Long, mod: Long): Long = {
      var acc = 0L; var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        acc = (acc * base + cp) % mod
        i += Character.charCount(cp)
      }
      acc
    }
    // surrogate-free chars: a LONE surrogate does not survive the
    // UTF8String round-trip (it encodes as replacement bytes), so the
    // kernel would legitimately hash a different string than the
    // generator produced -- not the property under test
    val bmpChar = Gen.choose('\u0020', '\uffff')
      .suchThat(c => !Character.isSurrogate(c))
    val texts = samples(Gen.asciiPrintableStr, 100) ++
      samples(Gen.listOf(bmpChar).map(_.mkString), 100)
    texts.foreach { s =>
      val u = UTF8String.fromString(s)
      val hi = HashKernel.polyHashPacked(u, 31L, HashKernel.Mod, 131L, TextOps.FpHiMod2)
      val lo = HashKernel.polyHashPacked(u, 257L, TextOps.FpLoMod1, 65599L, TextOps.FpLoMod2)
      assert(hi == fold(s, 31L, HashKernel.Mod) * TextOps.FpHiMod2 +
        fold(s, 131L, TextOps.FpHiMod2), s"fp_hi fused != reference for $s")
      assert(lo == fold(s, 257L, TextOps.FpLoMod1) * TextOps.FpLoMod2 +
        fold(s, 65599L, TextOps.FpLoMod2), s"fp_lo fused != reference for $s")
      assert(hi / TextOps.FpHiMod2 == HashKernel.polyHash(u),
        "fp_hi high word must unpack to the classic polyhash")
      assert(hi >= 0L && lo >= 0L, "packed halves must stay non-negative (int64-safe)")
    }
    // distinct short strings never collide on the wide key (2^123
    // keyspace — a fuzz collision means a kernel bug, not bad luck)
    val distinct = texts.distinct
    val keys = distinct.map { s =>
      val u = UTF8String.fromString(s)
      (HashKernel.polyHashPacked(u, 31L, HashKernel.Mod, 131L, TextOps.FpHiMod2),
        HashKernel.polyHashPacked(u, 257L, TextOps.FpLoMod1, 65599L, TextOps.FpLoMod2))
    }
    assert(keys.distinct.size == distinct.size, "wide-key collision on fuzz input")
  }

  test("chunks partition the token stream: rejoin == token join, counts add up") {
    val texts = samples(asciiText, 80)
    val rows = texts.toDF("text")
      .select($"text", TextOps.tokens($"text").as("toks"))
      .select(
        size($"toks").as("n_toks"),
        array_join($"toks", " ").as("joined"),
        TextOps.chunksOf($"toks", 7).as("chunks"))
      .select($"n_toks", $"joined",
        size($"chunks").as("n_chunks"),
        array_join($"chunks", " ").as("rejoined"))
      .collect()
    rows.foreach { r =>
      val (n, joined, nc, rejoined) =
        (r.getInt(0), r.getString(1), r.getInt(2), r.getString(3))
      assert(rejoined == joined, "chunk rejoin must lose nothing (no tail-drop)")
      assert(nc == math.ceil(n / 7.0).toInt, s"$n tokens → $nc chunks")
    }
  }

  test("shingle count is max(0, n_tokens - k + 1) before dedup") {
    val texts = samples(asciiText, 80)
    texts.toDF("text")
      .select(TextOps.tokenCount($"text").as("n"),
        size(TextOps.shingles($"text", 3)).as("n_sh"))
      .collect()
      .foreach { r =>
        assert(r.getInt(1) == math.max(0, r.getInt(0) - 2))
      }
  }

  test("TokenHashes fused scanner == regex tokens + polyhash, on fuzz and real data") {
    val texts = samples(asciiText, 80) ++
      samples(Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(' ', '\t', '\n', 'é', '→', '!', '.')))
        .map(_.mkString), 40)
    val fuzz = texts.toDF("text").select(
      graft.ops.expressions.TokenHashes($"text").as("fused"),
      transform(TextOps.tokens($"text"),
        t => graft.ops.expressions.TextPolyHash(t)).as("ref"))
    assert(fuzz.filter($"fused" =!= $"ref").count() == 0)
    val real = Tables.documents(spark, sf).select(
      graft.ops.expressions.TokenHashes($"text").as("fused"),
      transform(TextOps.tokens($"text"),
        t => graft.ops.expressions.TextPolyHash(t)).as("ref"))
    assert(real.filter($"fused" =!= $"ref").count() == 0)
  }

  test("FeatureEmbed codegen kernel == HOF reference, bit-exact") {
    val texts = samples(asciiText, 60)
    val df = texts.toDF("text")
      .select(TextOps.tokens($"text").as("toks"))
      .select(array_distinct(TextOps.shinglesOf($"toks", 2)).as("sh"))
      .filter(size($"sh") > 0)
      .select(transform($"sh",
        t => graft.ops.expressions.TextPolyHash(t)).as("hs"))
      .select(
        graft.ops.expressions.FeatureEmbed($"hs", 8).as("fused"),
        graft.ops.VectorOps.featureEmbedRef($"hs", 8).as("ref"))
    assert(df.filter($"fused" =!= $"ref").count() == 0)
  }

  test("ShingleHashes fused kernel == distinct(polyhash(shingle strings)), on fuzz and real data") {
    val texts = samples(asciiText, 80) ++
      samples(Gen.listOf(Gen.oneOf(Gen.alphaNumChar,
        Gen.oneOf(' ', '\t', '\n', 'é', '→', '!', '.'))).map(_.mkString), 40)
    for (k <- Seq(2, 3)) {
      val fuzz = texts.toDF("text")
        .select($"text", TextOps.tokens($"text").as("toks"))
        .select(
          graft.ops.expressions.ShingleHashes($"text", k).as("fused"),
          array_distinct(transform(TextOps.shinglesOf($"toks", k),
            t => graft.ops.expressions.TextPolyHash(t))).as("ref"))
      assert(fuzz.filter($"fused" =!= $"ref").count() == 0, s"k=$k fuzz mismatch")
    }
    val real = Tables.documents(spark, sf)
      .select($"text", TextOps.tokens($"text").as("toks"))
      .select(
        graft.ops.expressions.ShingleHashes($"text", 3).as("fused"),
        array_distinct(transform(TextOps.shinglesOf($"toks", 3),
          t => graft.ops.expressions.TextPolyHash(t))).as("ref"))
    assert(real.filter($"fused" =!= $"ref").count() == 0)
  }

  test("TextStats fused kernel == the four HOF stat columns, incl. NaN and ties") {
    import org.apache.spark.sql.DataFrame
    val texts = samples(asciiText, 80) ++
      samples(Gen.listOf(Gen.oneOf(Gen.alphaNumChar,
        Gen.oneOf(' ', '\t', '\n', '.', '!', '?', 'é', '→'))).map(_.mkString), 60) ++
      Seq("", "...", " \t ", "the der le el", "a. b! c? d", ".!? .", "x.\t.y")
    // the HOF quality reference THROWS under ANSI for zero-token
    // text (x/0), so the comparison domain is n_tokens > 0 — the
    // kernel is total (NaN) there, pinned separately below
    def cols(df: DataFrame) = df
      .select($"text", TextOps.tokens($"text").as("toks"))
      .filter(size($"toks") > 0)
      .select(
        graft.ops.expressions.TextStats($"text").as("st"),
        size($"toks").cast("bigint").as("rn"),
        size(TextOps.sentences($"text")).cast("bigint").as("rs"),
        TextOps.langIdOf($"toks").as("rl"),
        TextOps.qualityScoreOf($"toks").as("rq"))
    val all = cols(texts.toDF("text"))
      .unionByName(cols(Tables.documents(spark, sf).select($"text")))
    val bad = all.filter(
      $"st.n_tokens" =!= $"rn" || $"st.n_sentences" =!= $"rs" ||
        $"st.lang_pred" =!= $"rl" || !($"st.quality" <=> $"rq"))
    assert(bad.count() == 0)
    // zero-token text: total, no ANSI fault — a poison row must not
    // kill a 100-TB job. (n_sentences still follows the space-only
    // trim rule: " \t " is one non-empty segment, "" is none.)
    val empty = Seq(("", 0L), (" \t ", 1L)).toDF("text", "want_sent")
      .select($"want_sent", graft.ops.expressions.TextStats($"text").as("st"))
      .select($"want_sent", $"st.n_tokens", $"st.n_sentences",
        $"st.lang_pred", isnan($"st.quality"))
      .collect()
    empty.foreach { r =>
      assert(r.getLong(1) == 0 && r.getLong(2) == r.getLong(0) &&
        r.getString(3) == "und" && r.getBoolean(4))
    }
  }

  test("HashEmbed codegen kernel == HOF embed, bit-exact") {
    val texts = samples(asciiText, 60) ++ Seq("", "é→!")
    val df = texts.toDF("text").select(
      graft.ops.expressions.HashEmbed($"text", 8).as("fused"),
      graft.ops.VectorOps.embed($"text", 8).as("ref"))
    assert(df.filter($"fused" =!= $"ref").count() == 0)
  }

  test("MinHashSig kernel == HOF permutation minima") {
    val hsGen = Gen.nonEmptyListOf(Gen.choose(0L, 1000000006L))
    val df = samples(hsGen, 80).toDF("hs")
      .select(
        graft.ops.expressions.MinHashSig($"hs", 16).as("fused"),
        transform(sequence(lit(0L), lit(15L)), j => {
          val a = (j + 1) * lit(2654435761L) % lit(1000000007L)
          val b = (j * lit(40503L) + 1) % lit(1000000007L)
          array_min(transform($"hs", h => (a * h + b) % lit(1000000007L)))
        }).as("ref"))
    assert(df.filter($"fused" =!= $"ref").count() == 0)
  }

  test("PqEncode codegen kernel == HOF argmin reference, incl. first-min ties") {
    val M = 4; val K = 8; val Sub = 16
    // random vectors in the embedding's value range + an all-zero
    // vector (every sub-space distance tie resolves to the FIRST min)
    val vecs = samples(Gen.listOfN(M * Sub,
      Gen.choose(-2000000, 2000000).map(_ / 1000.0)), 60) ++
      Seq(List.fill(M * Sub)(0.0))
    val cb = graft.ops.expressions.PqKernel.codebook(M, K, Sub)
    val cbLit = typedLit(cb.map(_.map(_.toSeq).toSeq).toSeq)
    def cbAt(m: Column, j: Column, i: Column): Column =
      element_at(element_at(element_at(cbLit,
        (m + 1).cast("int")), (j + 1).cast("int")), (i + 1).cast("int"))
    def xAt(x: Column, m: Column, i: Column): Column =
      element_at(x, (m * Sub + i + 1).cast("int"))
    val df = vecs.toDF("x")
      .withColumn("dd", transform(sequence(lit(0), lit(M - 1)), m =>
        transform(sequence(lit(0), lit(K - 1)), j =>
          aggregate(sequence(lit(0), lit(Sub - 1)), lit(0.0), (a, i) =>
            a + (xAt($"x", m, i) - cbAt(m, j, i)) * (xAt($"x", m, i) - cbAt(m, j, i))))))
      .select(
        graft.ops.expressions.PqEncode($"x", M, K, Sub).as("fused"),
        transform(sequence(lit(1), lit(M)), m =>
          (array_position(element_at($"dd", m), array_min(element_at($"dd", m))) - 1)
            .cast("int")).as("ref"))
    assert(df.filter($"fused" =!= $"ref").count() == 0)
  }

  test("IvfCells2 kernel == [IvfCell, masked-argmax HOF], incl. tie order") {
    val K = 8; val Dim = 16
    val rnd = new scala.util.Random(11)
    val cents = Array.fill(K, Dim)(rnd.nextInt(2000001) / 1000.0 - 1000.0)
    val vecs = (1 to 60).map(_ =>
      List.fill(Dim)(rnd.nextInt(2000001) / 1000.0 - 1000.0)) ++
      // force score ties: a vector equal to a centroid duplicated in
      // the codebook would need equal centroids; instead reuse an
      // input twice so at least determinism across rows is exercised
      (1 to 5).map(_ => cents(3).toList)
    val centsSeq: Seq[Seq[Double]] = cents.map(_.toSeq).toSeq
    val df = vecs.toDF("x")
      .withColumn("cell", graft.ops.expressions.IvfCell($"x", cents))
      .withColumn("sc", transform(typedLit(centsSeq),
        c => graft.ops.VectorOps.cosine($"x", c)))
      .withColumn("m2", transform($"sc",
        (e, i) => when(i === $"cell", lit(-2.0)).otherwise(e)))
      .select(
        graft.ops.expressions.IvfCells2($"x", cents).as("fused"),
        array($"cell",
          (array_position($"m2", array_max($"m2")) - 1).cast("int")).as("ref"))
    assert(df.filter($"fused" =!= $"ref").count() == 0)
  }

  test("SoftmaxGradLoss/SoftmaxScore kernels == HOF softmax reference, bit-exact") {
    val K = 10; val D = 65
    val rnd = new scala.util.Random(20260814L)
    val w = Array.fill(K, D)(rnd.nextInt(2000001).toLong - 1000000L)
      .map(_.map(_.toDouble / 1e6))
    val wLit = typedLit(w.map(_.toSeq).toSeq)
    val rows = (1 to 60).map { _ =>
      (List.fill(D)(rnd.nextInt(2000001) / 1000000.0 - 1.0), rnd.nextInt(K))
    }
    // the HOF formulation the kernels replaced: ez via ordered
    // zip_with + left-assoc aggregate folds, den via ordered fold,
    // per-cell micro terms via the flat k*D+j indexing
    val ez = transform(wLit, wl =>
      exp(aggregate(zip_with($"xb", wl, (a, b) => a * b),
        lit(0.0), (acc, v) => acc + v)))
    val den = aggregate($"ez", lit(0.0), (acc, v) => acc + v)
    val refCells = flatten(transform($"ez", (e, k) =>
      transform($"xb", x => floor(
        (e / $"den" - when($"y" === k, 1.0).otherwise(0.0)) * x * lit(1e6)
          + lit(0.5)).cast("long")))) // k-major, j-minor == kernel layout
    val refLoss = floor(-log(element_at($"ez", $"y" + 1) / $"den") *
      lit(1e6) + lit(0.5)).cast("long")
    val refPred = (array_position($"ez", array_max($"ez")) - 1).cast("int")
    val refP = array_max($"ez") / $"den"
    val df = rows.toDF("xb", "y")
      .withColumn("ez", ez).withColumn("den", den)
      .select(
        graft.ops.expressions.SoftmaxGradLoss($"xb", $"y", w).as("fused"),
        concat(refCells, array(refLoss)).as("ref"),
        graft.ops.expressions.SoftmaxScore($"xb", w).as("s"),
        refPred.as("rp"), refP.as("rq"))
    assert(df.filter($"fused" =!= $"ref").count() == 0,
      "gradient/loss cells diverge from the HOF reference")
    assert(df.filter($"s.pred" =!= $"rp" || $"s.p" =!= $"rq").count() == 0,
      "score kernel diverges from the HOF reference")
  }

  test("PqAdcWith kernel == nested-aggregate HOF fold, bit-exact") {
    val M = 4; val K = 8; val Sub = 16
    val cb = graft.ops.expressions.PqKernel.codebook(M, K, Sub)
    val cbLit = typedLit(cb.map(_.map(_.toSeq).toSeq).toSeq)
    val rnd = new scala.util.Random(7)
    val rows = (1 to 60).map { _ =>
      (List.fill(M * Sub)(rnd.nextInt(4000001) / 1000.0 - 2000.0),
        List.fill(M)(rnd.nextInt(K)))
    }
    // the exact HOF formulation the kernel replaced: outer fold over
    // sub-spaces from 0.0, inner left-to-right fold of (xi − ci)²
    def cbAt(m: Column, j: Column, i: Column): Column =
      element_at(element_at(element_at(cbLit,
        (m + 1).cast("int")), (j + 1).cast("int")), (i + 1).cast("int"))
    val ref = aggregate(sequence(lit(0), lit(M - 1)), lit(0.0), (acc, m) =>
      acc + aggregate(sequence(lit(0), lit(Sub - 1)), lit(0.0), (a, i) =>
        a + (element_at($"x", (m * Sub + i + 1).cast("int")) -
          cbAt(m, element_at($"codes", (m + 1).cast("int")), i)) *
          (element_at($"x", (m * Sub + i + 1).cast("int")) -
            cbAt(m, element_at($"codes", (m + 1).cast("int")), i))))
    val df = rows.toDF("x", "codes")
      .select(
        graft.ops.expressions.PqAdcWith($"x", $"codes", cb).as("fused"),
        ref.as("ref"))
    assert(df.filter($"fused" =!= $"ref").count() == 0)
  }

  test("CosineSim codegen kernel == HOF cosine, bit-exact") {
    val vecs = samples(Gen.listOfN(16,
      Gen.choose(-1000000, 1000000).map(_ / 1000.0)), 60)
    val df = vecs.grouped(2).collect { case Seq(a, b) => (a, b) }.toSeq
      .toDF("a", "b")
      .select(
        graft.ops.expressions.CosineSim($"a", $"b").as("fused"),
        graft.ops.VectorOps.cosine($"a", $"b").as("ref"))
    assert(df.filter($"fused" =!= $"ref").count() == 0)
  }

  test("anti-join == set difference; semi ∪ anti partitions the left side") {
    val cases = samples(Gen.zip(
      Gen.listOf(Gen.choose(0L, 50L)), Gen.listOf(Gen.choose(0L, 50L))), 12)
    cases.foreach { case (as, bs) =>
      val l = as.toDF("id"); val r = bs.toDF("id")
      val anti = l.join(r, Seq("id"), "left_anti")
        .collect().map(_.getLong(0)).toSet
      val semi = l.join(r, Seq("id"), "left_semi")
        .collect().map(_.getLong(0)).toSet
      assert(anti == as.toSet.diff(bs.toSet))
      assert(semi == as.toSet.intersect(bs.toSet))
      assert((anti ++ semi) == as.toSet && anti.intersect(semi).isEmpty)
    }
  }

  test("SeededSample selects the same rows under any input partitioning") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // the determinism contract behind every trained codebook: the
    // sample is a pure function of the ids, not of partition layout
    // or row order (the (hash, id) rank has no ties — id breaks them)
    val base = spark.range(0, 5000).select($"id".as("vec_id"),
      (rand(42) * 100).cast("int").as("payload"))
    def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      graft.ops.SeededSample.top(df, "vec_id", 137)
        .select($"vec_id").as[Long].collect().sorted.toSeq
    val a = ids(base.repartition(1))
    val b = ids(base.repartition(13, $"payload"))
    val c = ids(base.orderBy($"payload"))
    assert(a.length == 137)
    assert(a == b && b == c,
      s"sample membership depends on partitioning: ${a.take(5)} vs ${b.take(5)}")
  }
}
