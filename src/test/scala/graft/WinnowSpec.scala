package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ops.TextOps
import graft.ops.expressions.WinnowFingerprints

/** Pins the O(m)-deque WinnowKernel to the declarative reference the
  * oracle SQL states: positional k-shingle polyhashes → SQL-window
  * minima over every w-window → distinct, sorted. Also the winnowing
  * GUARANTEE (a shared run of w+k-1 tokens shares a fingerprint) on
  * constructed pairs, and the corpus queries' smoke behavior.
  */
class WinnowSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  /** Reference implementation: window-function formulation over
    * positional shingle hashes (TextOps.shingles keeps positions;
    * fingerprint = polyHash of the shingle string — the identity
    * ShingleHashKernel's composition is already pinned to). */
  private def reference(texts: Seq[String], k: Int, w: Int): Map[String, Seq[Long]] = {
    val df = texts.zipWithIndex.toDF("text", "id")
      .select($"id", $"text",
        posexplode(transform(TextOps.shingles($"text", k), s => TextOps.fingerprint(s)))
          .as(Seq("pos", "h")))
      .withColumn("m", count(lit(1)).over(Window.partitionBy($"id")))
      .withColumn("wm", min($"h").over(Window.partitionBy($"id").orderBy($"pos")
        .rowsBetween(Window.currentRow, w - 1)))
      .filter($"pos" <= $"m" - w || ($"m" < w && $"pos" === 0))
      .select($"text", $"wm")
      .distinct()
    df.collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (t, vs) => t -> vs.map(_._2).sorted.toSeq }
  }

  private def kernel(texts: Seq[String], k: Int, w: Int): Map[String, Seq[Long]] =
    texts.toDF("text")
      .select($"text", WinnowFingerprints($"text", k, w).as("fp"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSeq).toMap

  test("kernel == window-function reference on the documents corpus") {
    val texts = spark.read.parquet(s"$sf/documents.parquet")
      .select($"text").collect().map(_.getString(0)).toSeq
    for ((k, w) <- Seq((5, 4), (3, 4), (2, 1), (3, 9))) {
      val ref = reference(texts, k, w)
      val got = kernel(texts, k, w)
      for (t <- texts) {
        assert(got(t) == ref.getOrElse(t, Seq.empty[Long]),
          s"k=$k w=$w mismatch on ${t.take(40)}…")
      }
    }
  }

  test("degenerate inputs: empty, fewer tokens than k, fewer shingles than w") {
    val got = kernel(Seq("", "a b", "a b c d e f", "x"), 5, 4)
    assert(got("") == Seq.empty[Long])
    assert(got("a b") == Seq.empty[Long], "m <= 0 → no fingerprints")
    // 6 tokens, k=5 → m=2 < w=4 → exactly one truncated-window min
    assert(got("a b c d e f").length == 1)
    assert(got("x") == Seq.empty[Long])
  }

  test("ties and duplicate shingles winnow to set semantics") {
    // identical repeated token → every shingle hash identical → one fp
    val got = kernel(Seq(("q " * 30).trim), 3, 4)
    assert(got.values.head.length == 1)
  }

  test("winnowing guarantee: docs sharing a run of w+k-1 tokens share a fingerprint") {
    val shared = (0 until 8).map(i => s"s$i").mkString(" ") // w+k-1 = 8 tokens
    val a = s"left junk tokens before $shared and after stuff"
    val b = s"completely different prefix words here $shared unrelated tail"
    val got = kernel(Seq(a, b), 5, 4)
    assert(got(a).toSet.intersect(got(b).toSet).nonEmpty,
      "shared 8-token run must contribute a common fingerprint")
  }

  test("fingerprints are sorted distinct and a subset of all shingle hashes") {
    val texts = spark.read.parquet(s"$sf/documents.parquet")
      .select($"text").limit(50).collect().map(_.getString(0)).toSeq
    val all = texts.toDF("text")
      .select($"text",
        transform(TextOps.shingles($"text", 5), s => TextOps.fingerprint(s)).as("g"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSet).toMap
    val got = kernel(texts, 5, 4)
    for (t <- texts) {
      val fp = got(t)
      assert(fp == fp.distinct.sorted, "output must be sorted distinct")
      assert(fp.toSet.subsetOf(all(t)), "fingerprints ⊆ shingle hashes")
    }
  }

  test("SQL surface: winnow_fingerprints is callable from spark.sql") {
    val n = spark.sql(
      "SELECT winnow_fingerprints('a b c d e f g h i j', 5, 4) AS fp")
      .selectExpr("size(fp)").collect()(0).getInt(0)
    assert(n >= 1)
  }

  test("corpus queries run at sf0.001 with expected shapes") {
    val q = graft.queries.Corpus.queries
    val shard = q("q69_shard_assign")(spark, sf).collect()
    assert(shard.nonEmpty && shard.forall(_.getAs[Long]("slot") <= 5))
    val idx = q("q70_inverted_index")(spark, sf)
    val r = idx.collect()
    if (r.nonEmpty) {
      // positions CSV is ordered and tf-consistent
      val row = r.head
      val pos = row.getAs[String]("positions").split(",").map(_.toInt).toSeq
      assert(pos == pos.sorted && pos.length == row.getAs[Long]("tf"))
    }
    // CDC chunks: every reported chunk is stored at least twice
    val cdc = q("q71_cdc_chunks")(spark, sf).collect()
    assert(cdc.forall(_.getAs[Long]("n_copies") >= 2))
    spark.catalog.clearCache() // q68 cache contract
  }
}
