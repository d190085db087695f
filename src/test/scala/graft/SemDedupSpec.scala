package graft

import org.scalatest.funsuite.AnyFunSuite

/** q104 SemDeDup — planted-duplicate behavior of the factored
  * [[graft.queries.TextVector.semDedup]] chain (the wired query runs
  * the same code over the embeddings table and is oracle-gated).
  */
class SemDedupSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  // 20 near-orthogonal base vectors (one-hot in 24 dims, with a
  // deterministic small off-axis component so no two share an axis
  // value pattern), plus exact duplicates of the first 5 under
  // higher ids: a duplicate lands in its original's cell (identical
  // vector, identical assignment) and scores cosine 1.
  private def planted(): Seq[(Long, Array[Float])] = {
    val base = (0 until 20).map { i =>
      val v = Array.fill(24)(0.0f)
      v(i % 24) = 1.0f
      v((i + 7) % 24) = 0.1f + 0.01f * i
      (i.toLong, v)
    }
    val dups = (0 until 5).map(i => (100L + i, base(i)._2.clone))
    base ++ dups
  }

  test("planted exact duplicates drop; originals and singletons survive") {
    val emb = planted().toDF("vec_id", "embedding")
    val out = graft.queries.TextVector.semDedup(emb, 0.9)
      .as[(Long, Long, Long, Long)].collect()
    spark.catalog.clearCache() // semDedup persist contract
    // totals: every vector is assigned exactly one cell
    assert(out.map(_._2).sum == 25, s"cell totals: ${out.toSeq}")
    // exactly the 5 planted duplicates drop (one-hot originals sit
    // at cosine < 0.9 from each other; each dup is bit-identical to
    // its lower-id original, so keep-first drops the dup)
    assert(out.map(_._3).sum == 5, s"drop counts: ${out.toSeq}")
    out.foreach { case (cell, n, d, k) =>
      assert(k == n - d, s"cell $cell: kept $k != $n - $d")
      assert(d >= 0 && d <= n, s"cell $cell: drop count out of range")
    }
  }

  test("threshold above any planted similarity drops nothing") {
    // tau above cosine 1 is unreachable — the report must show the
    // corpus untouched (the operator is threshold-parametric)
    val emb = planted().toDF("vec_id", "embedding")
    val out = graft.queries.TextVector.semDedup(emb, 1.5)
      .as[(Long, Long, Long, Long)].collect()
    spark.catalog.clearCache()
    assert(out.map(_._2).sum == 25)
    assert(out.map(_._3).sum == 0, s"unexpected drops: ${out.toSeq}")
  }

  test("q108 outliers: a vector in the corpus's negative half-space ranks worst in its cell") {
    // 30 clustered base vectors near axis e0/e1, plus one planted
    // far-off-distribution vector pointing AWAY from both clusters:
    // whatever cell it lands in, its centroid affinity is the lowest
    // there, so the shortlist must surface it at rn=1
    val base = (0 until 30).map { i =>
      val v = Array.fill(8)(0.05f)
      v(i % 2) = 1.0f
      (i.toLong, v)
    }
    val off = {
      val v = Array.fill(8)(-1.0f)
      (999L, v)
    }
    val emb = (base :+ off).toDF("vec_id", "embedding")
    val out = graft.queries.TextVector.embedOutliers(emb, 1)
      .as[(Long, Long, Long, Long)].collect()
    spark.catalog.clearCache()
    assert(out.exists(r => r._3 == 999L && r._2 == 1L),
      s"planted outlier not surfaced at rn=1: ${out.toSeq}")
    // affinity of the planted outlier is the worst in the report
    val worst = out.minBy(_._4)
    assert(worst._3 == 999L, s"outlier not worst-affinity: ${out.toSeq}")
  }

  test("randomized differential: report matches a single-process reference") {
    // seeded random vectors + planted duplicate pairs; the reference
    // replays the exact chain — seeded-sample order, Lloyd training,
    // cosine cell assignment, keep-first within-cell pairwise drop
    val rnd = new scala.util.Random(4242)
    val base: Seq[(Long, Array[Float])] = (0L until 50L).map { id =>
      (id, Array.fill(8)(rnd.nextFloat() * 2f - 1f))
    }
    val dups = Seq(200L -> base(3)._2.clone, 201L -> base(17)._2.clone)
    val all = base ++ dups
    val tau = 0.9

    // reference: SeededSample order -> sample -> Kmeans.train ->
    // assignCell -> pairwise keep-first -> per-cell rollup
    val n = all.length.toLong
    val ivfK = graft.queries.TextVector.ivfCellsFor(n)
    val sampleN = math.min(n, math.max(400L, 16L * ivfK)).toInt
    val sample = all
      .sortBy { case (id, _) =>
        ((id % graft.ops.SeededSample.Mod) * graft.ops.SeededSample.Mult %
          graft.ops.SeededSample.Mod, id) }
      .take(sampleN).sortBy(_._1).map(_._2.map(_.toDouble))
    val cents = graft.ops.Kmeans.train(sample.toArray,
      math.min(ivfK, sampleN), 4)
    val normSq = cents.map(c => c.foldLeft(0.0)((a, v) => a + v * v))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / math.sqrt(na) / math.sqrt(nb)
    }
    val assigned = all.map { case (id, v) =>
      (id, v.map(_.toDouble),
        graft.ops.Kmeans.assignCell(v.map(_.toDouble), cents, normSq)) }
    val dropped = (for {
      (ia, va, ca) <- assigned
      (ib, vb, cb) <- assigned
      if ca == cb && ia < ib && cos(va, vb) >= tau
    } yield ib).toSet
    val want = assigned.groupBy(_._3).toSeq.map { case (cell, members) =>
      val d = members.count(m => dropped(m._1)).toLong
      (cell.toLong, members.size.toLong, d, members.size - d)
    }.sortBy(_._1)

    val got = graft.queries.TextVector
      .semDedup(all.toDF("vec_id", "embedding"), tau)
      .as[(Long, Long, Long, Long)].collect().toSeq
    spark.catalog.clearCache()
    assert(got == want, s"differential mismatch:\n got: $got\nwant: $want")
  }

  test("rerun is deterministic on the real table") {
    val a = SparkEntry.queries("q104_semdedup")(spark, "/root/testdata/sf0.001").collect()
    val b = SparkEntry.queries("q104_semdedup")(spark, "/root/testdata/sf0.001").collect()
    spark.catalog.clearCache()
    assert(a.sameElements(b), "semDedup re-run diverged")
    // the report partitions the corpus
    val n = Tables.embeddings(spark, "/root/testdata/sf0.001").count()
    assert(a.map(_.getAs[Long]("n_vecs")).sum == n)
  }

  test("q115 corpus map: planted clusters give exact share, purity, tie-break, cohesion") {
    // explicit 2-cell codebook; cell 0 holds labels (0,0,1) on the
    // +e1 axis (scaled copies — cosine to centroid exactly 1), cell
    // 1 holds a 1-1 label TIE (7 vs 5), which must resolve to the
    // SMALLEST label per the min(struct) argmax contract
    val e = (i: Int, s: Float) => { val v = Array.fill(4)(0.0f); v(i) = s; v }
    val cents = Array(Array(1.0, 0.0, 0.0, 0.0), Array(0.0, 1.0, 0.0, 0.0))
    val rows = Seq(
      (0L, 0L, e(0, 1f)), (1L, 0L, e(0, 2f)), (2L, 1L, e(0, 1f)),
      (10L, 7L, e(1, 1f)), (11L, 5L, e(1, 3f)))
      .toDF("vec_id", "label", "embedding")
    val out = graft.queries.TextVector.corpusMap(rows, Some(cents))
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    spark.catalog.clearCache() // corpusMap persist contract
    assert(out.toSeq == Seq(
      (0L, 3L, 600000L, 0L, 2L, 666667L, 1000000L),
      (1L, 2L, 400000L, 5L, 1L, 500000L, 1000000L)), out.toSeq.toString)
  }
}
