package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.GenerateExec
import graft.ops.TextOps
import graft.ops.expressions.ChunkExplode

/** The Generator (UDTF) form of the chunker: row-identity with the
  * HOF+posexplode formulation, edge cases, and the physical-plan
  * contract (plans as GenerateExec).
  */
class GeneratorSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  // deliberately != the query's 16 to probe window boundaries
  private val N = 7

  private def genForm(df: DataFrame): DataFrame =
    df.select($"doc_id", ChunkExplode($"text", N).as(Seq("pos", "chunk")))

  private def hofForm(df: DataFrame): DataFrame =
    df.select($"doc_id", TextOps.tokens($"text").as("toks"))
      .select($"doc_id",
        posexplode(TextOps.chunksOf($"toks", N)).as(Seq("pos", "chunk")))

  private def rows(df: DataFrame): Seq[(Long, Int, String)] =
    df.as[(Long, Int, String)].collect().sorted.toSeq

  test("ChunkExplode ≡ posexplode(chunksOf(tokens)) on sf0.001 documents") {
    val docs = Tables.documents(spark, sf)
    assert(rows(genForm(docs)) == rows(hofForm(docs)))
  }

  test("edge cases: empty, whitespace, null, exact-multiple, unicode") {
    val docs = Seq(
      (0L, ""),                                   // no tokens → no rows
      (1L, "   \t \n "),                          // whitespace only → no rows
      (2L, null.asInstanceOf[String]),            // null → no rows
      (3L, Seq.fill(2 * N)("tok").mkString(" ")), // exact multiple: 2 full windows
      (4L, "one"),                                // single token
      (5L, "a-b €x, π!")                          // symbols are single tokens
    ).toDF("doc_id", "text")
    val got = rows(genForm(docs))
    assert(rows(hofForm(docs)) == got)
    assert(!got.exists(r => Set(0L, 1L, 2L).contains(r._1)))
    assert(got.count(_._1 == 3L) == 2 &&
      got.filter(_._1 == 3L).map(_._3).forall(_ == Seq.fill(N)("tok").mkString(" ")))
    // 8 tokens (a - b € x , π !) at N=7 → a full window + the tail
    assert(got.filter(_._1 == 5L).map(_._3) == Seq("a - b € x , π", "!"))
  }

  test("property: kernel chunking ≡ HOF chunking on random unicode strings") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import org.apache.spark.unsafe.types.UTF8String
    val textGen = Gen.listOf(Gen.frequency(
      6 -> Gen.alphaNumChar.map(_.toString),
      2 -> Gen.oneOf(" ", "\t", "\n"),
      1 -> Gen.oneOf("€", "π", "!", ","),
      1 -> Gen.const("𝕏") // 𝕏: astral plane → surrogate pair
    )).map(_.mkString)
    val texts = (0 until 60).flatMap(i =>
      textGen.apply(Gen.Parameters.default, Seed(7L + i)))
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    assert(rows(genForm(df)) == rows(hofForm(df)))
    // the kernel's lazy iterator agrees with itself driver-side
    texts.foreach { t =>
      val it = graft.ops.expressions.ChunkGenKernel
        .chunkIterator(UTF8String.fromString(t), N)
      val chunks = it.map(_._2.toString).toSeq
      assert(chunks.forall(c => TextOps.TokenPattern.r.findAllIn(c).size <= N))
    }
  }

  test("plans as GenerateExec (no UDF, no array materialization op)") {
    val plan = genForm(Tables.documents(spark, sf)).queryExecution.executedPlan
    assert(plan.exists(_.isInstanceOf[GenerateExec]),
      s"expected GenerateExec in:\n$plan")
  }
}
