package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipeline.BpeTrainer

/** BpeTrainer (graft.pipeline) — the iterative tokenizer-induction
  * loop, pinned against a straightforward single-process reference
  * implementation run on the same text (the VERDICT's done
  * criterion), plus the q87 contract: round 1 of training IS q87's
  * top merge pair.
  */
class BpeSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  /** Naive in-memory BPE: same conventions as the trainer (character
    * seeding, count desc / pair asc argmax, greedy left-to-right
    * apply with skip-past-merge, minFreq stop). */
  private def refTrain(words: Map[String, Long], n: Int,
                       minFreq: Long = 2L): Seq[(String, String, Long)] = {
    var vocab: Seq[(Vector[String], Long)] =
      words.toSeq.map { case (w, f) => (w.split("").toVector, f) }
    val out = Seq.newBuilder[(String, String, Long)]
    var continue = true
    var round = 0
    while (round < n && continue) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      vocab.foreach { case (syms, f) =>
        syms.iterator.zip(syms.iterator.drop(1)).foreach { p =>
          counts(p) = counts.getOrElse(p, 0L) + f
        }
      }
      val best = counts.toSeq
        .sortBy { case ((a, b), c) => (-c, a, b) }.headOption
      best match {
        case Some(((a, b), c)) if c >= minFreq =>
          out += ((a, b, c))
          vocab = vocab.map { case (syms, f) =>
            val merged = Vector.newBuilder[String]
            var i = 0
            while (i < syms.length) {
              if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
                merged += (a + b); i += 2
              } else { merged += syms(i); i += 1 }
            }
            (merged.result(), f)
          }
          round += 1
        case _ => continue = false
      }
    }
    out.result()
  }

  test("trained merges match the single-process reference on a toy corpus") {
    val docs = Seq(
      "low low low low low",
      "lower lower newest newest newest",
      "newest newest newest widest widest").toDF("text")
    val got = BpeTrainer.train(spark, docs, "text", nMerges = 8)
      .map(m => (m.a, m.b, m.n))
    val words = docs.select(explode(graft.ops.TextOps.tokens($"text")).as("w"))
      .groupBy("w").count().as[(String, Long)].collect().toMap
    val want = refTrain(words, 8)
    assert(got == want, s"merge sequences diverge:\n$got\nvs\n$want")
    assert(got.nonEmpty && got.head._1 == "e" && got.head._2 == "s",
      s"'es' (freq 8 in newest/widest) must win round 1: $got")
  }

  test("trained merges match the reference on sf0.001 documents") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val got = BpeTrainer.train(spark, docs, "text", nMerges = 6)
      .map(m => (m.a, m.b, m.n))
    val words = docs.select(explode(graft.ops.TextOps.tokens($"text")).as("w"))
      .groupBy("w").count().as[(String, Long)].collect().toMap
    val want = refTrain(words, 6)
    assert(got == want, s"merge sequences diverge on real data:\n$got\nvs\n$want")
    assert(got.size == 6)
  }

  test("encode replays the merge table losslessly and fuses the trained pieces") {
    val docs = Seq(
      "low low low low low",
      "lower lower newest newest newest",
      "newest newest newest widest widest").toDF("text")
    val merges = BpeTrainer.train(spark, docs, "text", nMerges = 8)
    val out = BpeTrainer.encode(docs, "text", merges)
      .select($"text", $"bpe_tokens").as[(String, Seq[String])].collect()
    out.foreach { case (text, pieces) =>
      // lossless: pieces concatenate back to the words in order
      assert(pieces.mkString("") ==
        spark.range(1).select(concat_ws("",
          graft.ops.TextOps.tokens(lit(text)))).as[String].head(),
        s"pieces of '$text' do not reassemble")
    }
    // the trained merges actually fuse: some multi-char piece from
    // the merge table appears in the encoded output
    val fused = merges.map(m => m.a + m.b).toSet
    val seen = out.flatMap(_._2).toSet
    assert(fused.exists(seen.contains),
      s"no trained piece of $fused appears in encode output $seen")
    // and encoding matches the reference dynamics: applying the same
    // merge list in order to each word's characters
    val wordsOf = out.flatMap { case (t, _) => t.split(" ") }.distinct
    wordsOf.foreach { w =>
      var syms = w.split("").toVector
      merges.foreach { m =>
        val merged = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == m.a && syms(i + 1) == m.b) {
            merged += (m.a + m.b); i += 2
          } else { merged += syms(i); i += 1 }
        }
        syms = merged.result()
      }
      val enc = BpeTrainer.encode(Seq(w).toDF("text"), "text", merges)
        .select($"bpe_tokens").as[Seq[String]].head()
      assert(enc == syms, s"word '$w': kernel $enc != reference $syms")
    }
  }

  test("round 1 of training is exactly q87's top merge pair") {
    val sfDir = "/root/testdata/sf0.001"
    val first = BpeTrainer.train(spark, Tables.documents(spark, sfDir),
      "text", nMerges = 1).head
    val q87 = SparkEntry.queries("q87_bpe_pairs")(spark, sfDir)
      .filter($"rn" === 1).select($"pair", $"n").as[(String, Long)].head()
    assert(first.a + first.b == q87._1 && first.n == q87._2,
      s"trainer round 1 (${first.a}+${first.b}, ${first.n}) != q87 top $q87")
  }
}
