package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{TextOps, VectorOps, WeightedAvgVec}

/** Kernel unit tests (SURVEY §5.2): tokenizer/chunker boundaries —
  * including the reference's 512-token limit exactly at 512/513
  * (`script512.py:23`, `run_extra.py:68-69`) — pooling semantics vs
  * hand-computed np.average, and lang-ID tie order.
  */
class TextOpsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def chunksOfText(text: String, n: Int): Seq[Seq[String]] =
    Seq(text).toDF("text")
      .select(TextOps.tokens($"text").as("toks"))
      .select(TextOps.chunksOf($"toks", n).as("c"))
      .collect().map(_.getSeq[String](0)).toSeq

  test("chunker at the reference's 512-token boundary: 512 → 1 chunk, 513 → 2") {
    val t512 = (0 until 512).map(i => s"w$i").mkString(" ")
    val t513 = (0 until 513).map(i => s"w$i").mkString(" ")
    val c512 = chunksOfText(t512, 512)
    val c513 = chunksOfText(t513, 512)
    assert(c512.head.length == 1, s"512 tokens → ${c512.head.length} chunks")
    assert(c513.head.length == 2, s"513 tokens → ${c513.head.length} chunks")
    assert(c513.head.last == "w512", "tail chunk must carry the overflow token")
    // chunks partition the tokens: rejoining loses nothing
    assert(c513.head.mkString(" ") == t513)
  }

  test("tokenizer: punctuation splits, symbols are single tokens, empty text → 0") {
    val df = Seq("a,b c", "", "x.y!z").toDF("text")
      .select(TextOps.tokenCount($"text").as("n"))
    assert(df.collect().map(_.getInt(0)).toSeq == Seq(4, 0, 5))
  }

  test("chunker/shingler degenerate inputs: empty text and fewer tokens than k") {
    assert(chunksOfText("", 16).head.isEmpty)
    val sh = Seq("one two").toDF("text")
      .select(TextOps.shingles($"text", 3).as("s"))
      .collect()(0).getSeq[String](0)
    assert(sh.isEmpty)
  }

  test("weighted pooling matches np.average semantics (run_extra.py:46-48)") {
    // np.average([[1,2],[3,4],[5,6]], axis=0, weights=[1,2,3])
    //   = [(1*1+3*2+5*3)/6, (2*1+4*2+6*3)/6] = [22/6, 28/6]
    val df = Seq(
      (1L, Seq(1.0, 2.0), 1.0),
      (1L, Seq(3.0, 4.0), 2.0),
      (1L, Seq(5.0, 6.0), 3.0)
    ).toDF("id", "vec", "w")
    val out = df.groupBy("id").agg(WeightedAvgVec.asUdaf($"vec", $"w").as("p"))
      .collect()(0).getSeq[Double](1)
    assert(math.abs(out(0) - 22.0 / 6) < 1e-12 && math.abs(out(1) - 28.0 / 6) < 1e-12)
  }

  test("weighted pooling is permutation-insensitive (to fp tolerance) and skips empty vectors") {
    val rows = (1 to 20).map(i => (1L, Seq(i * 1.0, i * i * 1.0), i * 0.5))
    val fwd = rows.toDF("id", "vec", "w")
    val rev = rows.reverse.toDF("id", "vec", "w")
    def pool(df: org.apache.spark.sql.DataFrame): Seq[Double] =
      df.groupBy("id").agg(WeightedAvgVec.asUdaf($"vec", $"w").as("p"))
        .collect()(0).getSeq[Double](1)
    val (a, b) = (pool(fwd), pool(rev))
    assert(a.zip(b).forall { case (x, y) => math.abs(x - y) < 1e-9 })

    val withEmpty = (Seq((1L, Seq.empty[Double], 5.0)) ++ rows).toDF("id", "vec", "w")
    assert(pool(withEmpty).zip(a).forall { case (x, y) => math.abs(x - y) < 1e-9 })
  }

  test("langId fixed tie order: en wins exact ties, all-miss → und") {
    // "is" hits en only, "ist" hits de only → 1:1 tie, broken toward
    // en by the fixed fold order; "und und ist" is unambiguously de
    // (und is a German stopword — 3 de hits vs 0 en).
    val df = Seq("is ist", "und und ist", "zzz qqq").toDF("text")
      .select(TextOps.langId($"text").as("l"))
    assert(df.collect().map(_.getString(0)).toSeq == Seq("en", "de", "und"))
  }

  test("SrpBands kernel is bit-identical to the HOF reference implementation") {
    val df = Tables.embeddings(spark, sf)
      .select($"vec_id",
        graft.ops.expressions.SrpBands($"embedding", 24, 4).as("kernel"),
        VectorOps.packBands(VectorOps.srpBits($"embedding", 24, 64), 4, 6).as("hof"))
    val bad = df.filter($"kernel" =!= $"hof").count()
    assert(bad == 0, s"$bad rows where kernel bands != HOF bands")
  }

  test("embed stand-in is deterministic and in [-1, 1)") {
    val df = Seq("hello world", "hello world", "other").toDF("text")
      .select(VectorOps.embed($"text", 16).as("e"))
    val rows = df.collect().map(_.getSeq[Double](0))
    assert(rows(0) == rows(1), "same text must embed identically")
    assert(rows(0) != rows(2), "different text should differ")
    assert(rows.flatten.forall(x => x >= -1.0 && x < 1.0))
  }

  test("CharEntropy kernel: closed forms, quantize-THEN-sum contract, degenerates, SQL parity") {
    def h(s: String): Long =
      Seq(s).toDF("t")
        .select(graft.ops.expressions.CharEntropy($"t")).collect()(0).getLong(0)
    // constant string: p = 1, ln 1 = 0 — exactly zero entropy
    assert(h("aaaaaa") == 0L)
    assert(h("x") == 0L)
    assert(h("") == 0L)
    // two equiprobable chars: each term -(0.5·ln 0.5)·1e6 =
    // 346573.59… quantizes to 346574, sum 693148 — NOT
    // round(ln 2·1e6) = 693147: the contract quantizes terms
    // before summing (order-free exactness beats last-digit purism)
    assert(h("ab") == 693148L)
    assert(h("aabb") == 693148L)  // same distribution, same value
    // four equiprobable: 4 · quantize(-(0.25·ln 0.25)·1e6) =
    // 4 · 346574 (term value identical to the p=0.5 case: funny
    // coincidence of 0.25·ln 4 = 0.5·ln 2)
    assert(h("abcd") == 4 * 346574L)
    // null propagates; SQL registry path agrees with the Column API
    val viaSql = Seq("entropy test").toDF("t")
      .selectExpr("char_entropy(t)").collect()(0).getLong(0)
    assert(viaSql == h("entropy test"))
    val n = Seq[String](null).toDF("t")
      .select(graft.ops.expressions.CharEntropy($"t")).collect()(0)
    assert(n.isNullAt(0))
  }
}
