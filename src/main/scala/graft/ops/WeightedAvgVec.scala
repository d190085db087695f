package graft.ops

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Input row for the pooling aggregate: one chunk vector + weight. */
case class VecW(vec: Seq[Double], w: Double)

/** Running (weighted element sums, weight sum). */
case class VecWBuf(sums: Seq[Double], wsum: Double)

/** A1/V3 — length-weighted mean of vectors
  * (reference: np.average(chunks, axis=0, weights=[len(chunk)...]),
  * /root/reference/run_extra.py:46-48).
  *
  * Typed Aggregator => map-side partial aggregation: each partition
  * reduces its chunks to ONE (sums, wsum) pair before the shuffle,
  * so the shuffle moves O(groups) vectors, not O(rows) — the
  * property that lets pooling scale to 100 TB of chunked documents.
  *
  * Merge order over partitions is runtime-dependent, so downstream
  * oracle-compared queries round the result (Determinism.roundFix,
  * 6 dp) — double-sum divergence is ~1e-13 relative, far below it.
  */
class WeightedAvgVec extends Aggregator[VecW, VecWBuf, Seq[Double]] {

  override def zero: VecWBuf = VecWBuf(Seq.empty, 0.0)

  override def reduce(b: VecWBuf, in: VecW): VecWBuf = {
    if (in.vec == null || in.vec.isEmpty) return b
    if (b.sums.isEmpty) {
      VecWBuf(in.vec.map(_ * in.w), in.w)
    } else {
      require(b.sums.length == in.vec.length,
        s"vector dim mismatch: ${b.sums.length} vs ${in.vec.length}")
      val s = new Array[Double](b.sums.length)
      var i = 0
      while (i < s.length) { s(i) = b.sums(i) + in.vec(i) * in.w; i += 1 }
      VecWBuf(s.toIndexedSeq, b.wsum + in.w)
    }
  }

  override def merge(a: VecWBuf, b: VecWBuf): VecWBuf = {
    if (a.sums.isEmpty) b
    else if (b.sums.isEmpty) a
    else {
      val s = new Array[Double](a.sums.length)
      var i = 0
      while (i < s.length) { s(i) = a.sums(i) + b.sums(i); i += 1 }
      VecWBuf(s.toIndexedSeq, a.wsum + b.wsum)
    }
  }

  override def finish(r: VecWBuf): Seq[Double] =
    if (r.wsum == 0.0) Seq.empty else r.sums.map(_ / r.wsum)

  override def bufferEncoder: Encoder[VecWBuf] = Encoders.product[VecWBuf]
  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

object WeightedAvgVec {
  import org.apache.spark.sql.functions.udaf
  /** Untyped registration: weighted_avg_vec(vec, w). */
  lazy val asUdaf = udaf(new WeightedAvgVec, Encoders.product[VecW])
}
