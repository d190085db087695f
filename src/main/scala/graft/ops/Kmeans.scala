package graft.ops

/** Deterministic Lloyd's k-means for ANN codebooks (q33's IVF coarse
  * quantizer, q90's IVF+PQ). The codebook of an IVF index is small
  * driver state — training runs on a bounded sample COLLECTED to the
  * driver, then the trained centroids broadcast back inside the
  * assignment expression (IvfCell), the same life-cycle a production
  * index build gives its quantizer (train on a sample, apply to the
  * corpus; k-means|| would distribute the training step itself, but
  * the sample is bounded by construction so a driver loop is the
  * simpler correct form).
  *
  * Everything is ORDER-PINNED so a SQL engine can replay training
  * bit-for-bit (the DuckDB oracle re-derives the same centroids):
  *   - init: the first k sample vectors in sample order;
  *   - assignment: cosine argmax, strict >, first index wins — the
  *     EXACT operation order of [[graft.ops.expressions.IvfCell]]
  *     (dot folded over dims ascending, then /sqrt(|x|)/sqrt(|c|));
  *   - update: elementwise mean of the assigned vectors folded IN
  *     SAMPLE ORDER starting from the first assigned vector (DuckDB
  *     list_reduce semantics), then one divide by the count;
  *   - an emptied cell keeps its previous centroid;
  *   - a FIXED iteration count (no data-dependent early stop).
  *
  * No randomness: the sample is a deterministic id-prefix slice and
  * the init is positional, so the same corpus always trains the same
  * codebook on any engine.
  */
object Kmeans {

  /** Cosine argmax assignment — IvfCell's arithmetic, shared so the
    * trainer can never drift from the apply-side kernel. */
  def assignCell(x: Array[Double], cents: Array[Array[Double]],
                 centNormSq: Array[Double]): Int = {
    var vNorm = 0.0
    var d = 0
    while (d < x.length) { vNorm += x(d) * x(d); d += 1 }
    var best = Double.NegativeInfinity
    var bestJ = 0
    var j = 0
    while (j < cents.length) {
      val c = cents(j)
      var dot = 0.0
      var k = 0
      while (k < x.length) { dot += x(k) * c(k); k += 1 }
      val cos = dot / math.sqrt(vNorm) / math.sqrt(centNormSq(j))
      if (cos > best) { best = cos; bestJ = j }
      j += 1
    }
    bestJ
  }

  /** Squared-L2 argmin assignment (strict <, first index wins) —
    * PqKernel.encode's arithmetic: the (x-c)² terms fold over dims
    * ascending from 0.0. The PQ-codebook metric (sub-space distance
    * IS the quantization error being minimized, unlike the IVF
    * router's cosine). */
  def assignCellL2(x: Array[Double], cents: Array[Array[Double]]): Int = {
    var best = Double.PositiveInfinity
    var bestJ = 0
    var j = 0
    while (j < cents.length) {
      val c = cents(j)
      var a = 0.0
      var k = 0
      while (k < x.length) { val d = x(k) - c(k); a += d * d; k += 1 }
      if (a < best) { best = a; bestJ = j }
      j += 1
    }
    bestJ
  }

  /** Train k centroids on `samples` (caller supplies them in the
    * pinned order, e.g. sorted by vector id) with `iters` Lloyd
    * rounds. Returns the trained codebook. */
  def train(samples: Array[Array[Double]], k: Int, iters: Int): Array[Array[Double]] =
    lloyd(samples, k, iters, cosine = true)

  /** Squared-L2 variant of [[train]] — same init/update/empty-cell
    * conventions, L2 assignment. */
  def trainL2(samples: Array[Array[Double]], k: Int, iters: Int): Array[Array[Double]] =
    lloyd(samples, k, iters, cosine = false)

  private def lloyd(samples: Array[Array[Double]], k: Int, iters: Int,
                    cosine: Boolean): Array[Array[Double]] = {
    require(samples.length >= k,
      s"k-means needs at least k=$k samples, got ${samples.length}")
    var cents = samples.take(k).map(_.clone)
    var it = 0
    while (it < iters) {
      val normSq = cents.map(c => c.foldLeft(0.0)((acc, v) => acc + v * v))
      val assign = samples.map(x =>
        if (cosine) assignCell(x, cents, normSq) else assignCellL2(x, cents))
      cents = Array.tabulate(k) { j =>
        val mine = samples.indices.filter(assign(_) == j)
        if (mine.isEmpty) cents(j).clone
        else {
          // fold starts FROM the first member (list_reduce shape),
          // adds the rest in sample order, divides once at the end
          val acc = samples(mine.head).clone
          mine.tail.foreach { i =>
            val v = samples(i)
            var d = 0
            while (d < acc.length) { acc(d) += v(d); d += 1 }
          }
          val n = mine.size.toDouble
          var d = 0
          while (d < acc.length) { acc(d) /= n; d += 1 }
          acc
        }
      }
      it += 1
    }
    cents
  }
}
