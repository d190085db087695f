package graft

import org.scalatest.funsuite.AnyFunSuite

/** graft.ops.Kmeans — the trained IVF codebook (q33/q90). Training
  * quality is judged on PLANTED clusters: points drawn around known
  * centers must co-locate in the same IVF cell more often after
  * training than under the naive first-k codebook (the round-6
  * "untrained codebook" shortcut this trainer replaces).
  */
class KmeansSpec extends AnyFunSuite {

  private val Dim = 16
  private val K = 16
  private val PerCluster = 20

  /** Deterministic pseudo-random double in [-1, 1) from a seed chain
    * (no Random: fixed across JVMs and reruns). */
  private def unit(seed: Long): Double = {
    val h = (seed * 2654435761L + 40503L) % 1000000007L
    (java.lang.Math.floorMod(h, 1000000007L).toDouble / 1000000007.0) * 2.0 - 1.0
  }

  /** 16 well-separated planted centers; PerCluster points each at
    * small radius. Points ordered CLUSTER-MAJOR, so the naive
    * first-16 init takes all its seeds from cluster 0 — the
    * degenerate init k-means must recover from. */
  private def planted(): (Array[Array[Double]], Array[Int]) = {
    val centers = Array.tabulate(K) { c =>
      Array.tabulate(Dim)(d => unit(c * 131L + d * 7L + 1L) * 10.0)
    }
    val pts = Array.newBuilder[Array[Double]]
    val truth = Array.newBuilder[Int]
    for (c <- 0 until K; p <- 0 until PerCluster) {
      val noise = Array.tabulate(Dim)(d => unit(c * 7919L + p * 104729L + d + 13L) * 0.5)
      pts += centers(c).zip(noise).map { case (a, b) => a + b }
      truth += c
    }
    (pts.result(), truth.result())
  }

  /** Fraction of same-planted-cluster pairs assigned to the same
    * cell — the ANN-recall proxy: a probe finds a neighbor only if
    * they land in the same inverted list (nprobe=1). */
  private def colocation(cents: Array[Array[Double]],
                         pts: Array[Array[Double]], truth: Array[Int]): Double = {
    val normSq = cents.map(c => c.foldLeft(0.0)((a, v) => a + v * v))
    val cell = pts.map(graft.ops.Kmeans.assignCell(_, cents, normSq))
    var same = 0; var total = 0
    for (i <- pts.indices; j <- i + 1 until pts.length if truth(i) == truth(j)) {
      total += 1
      if (cell(i) == cell(j)) same += 1
    }
    same.toDouble / total
  }

  test("training is deterministic and preserves codebook shape") {
    val (pts, _) = planted()
    val a = graft.ops.Kmeans.train(pts, K, 4)
    val b = graft.ops.Kmeans.train(pts.map(_.clone), K, 4)
    assert(a.length == K && a.forall(_.length == Dim))
    assert(a.zip(b).forall { case (x, y) => x.sameElements(y) },
      "same input must train bit-identical centroids")
  }

  test("trained codebook beats the naive first-k codebook on planted-cluster recall") {
    val (pts, truth) = planted()
    val naive = pts.take(K).map(_.clone) // round-6 shortcut: first 16 vectors
    val trained = graft.ops.Kmeans.train(pts, K, 4)
    val naiveRec = colocation(naive, pts, truth)
    val trainedRec = colocation(trained, pts, truth)
    assert(trainedRec >= naiveRec,
      f"trained recall $trainedRec%.3f below naive $naiveRec%.3f")
    assert(trainedRec > 0.8,
      f"trained recall $trainedRec%.3f too low for well-separated planted clusters")
  }

  test("L2 training reduces quantization error vs the naive first-k codebook (q91's PQ metric)") {
    val (pts, _) = planted()
    val sub = pts.map(_.take(8)) // a PQ-style sub-space slice
    val naive = sub.take(K).map(_.clone)
    val trained = graft.ops.Kmeans.trainL2(sub, K, 3)
    def qErr(cents: Array[Array[Double]]): Double =
      sub.map { x =>
        val c = cents(graft.ops.Kmeans.assignCellL2(x, cents))
        x.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum
      }.sum
    val (ne, te) = (qErr(naive), qErr(trained))
    assert(te < ne, f"trained quantization error $te%.2f not below naive $ne%.2f")
  }

  test("an emptied cell keeps its previous centroid instead of going NaN") {
    // 3 identical points, k=2: after round 1 both seeds sit on the
    // same location's mean; cell 1 empties (first-wins sends all
    // points to cell 0) and must retain a finite centroid
    val pts = Array.fill(3)(Array.tabulate(4)(_.toDouble + 1.0))
    val cents = graft.ops.Kmeans.train(pts, 2, 3)
    assert(cents.forall(_.forall(v => !v.isNaN && !v.isInfinite)))
  }
}
