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
}
