package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame

/** ANN result QUALITY (not just hash-correctness): recall@5 of the
  * PQ rankings against the exact L2 top-5, computed brute-force on
  * the driver (500 × 64 floats at sf0.01 — trivial). The trained
  * codebook (q91) must not lose to the closed-form demo codebook
  * (q78) it replaced; q90's refine stage must clear an absolute
  * floor AND be monotone non-decreasing in nprobe (probing more
  * inverted lists can only add candidates).
  */
class AnnRecallSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private lazy val vecs: Map[Long, Array[Double]] =
    Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap

  private def exactTop5(qid: Long): Set[Long] = {
    val q = vecs(qid)
    vecs.toSeq.map { case (id, v) =>
      val d = q.zip(v).map { case (a, b) => (a - b) * (a - b) }.sum
      (id, d)
    }.sortBy { case (id, d) => (d, id) }.take(5).map(_._1).toSet
  }

  private def recallOf(df: DataFrame): Double = {
    val got = df.select($"query_id", $"vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (q, rows) => q -> rows.map(_._2).toSet }
    val hits = got.map { case (q, ids) => (ids intersect exactTop5(q)).size }.sum
    hits.toDouble / (got.size * 5)
  }

  private def recall(name: String): Double =
    recallOf(SparkEntry.queries(name)(spark, sf))

  test("trained PQ (q91) recall@5 is at least the untrained codebook's (q78)") {
    val (trained, naive) = (recall("q91_pq_trained"), recall("q78_pq_ann"))
    assert(trained >= naive,
      f"trained PQ recall $trained%.2f below untrained $naive%.2f")
    // 8 sub-spaces × 16 centroids, seeded-random 400-vector sample:
    // ADC-only ranking (no refine) on near-isotropic unit vectors —
    // coarse by construction (the compression trade). The floor was
    // 0.4 when the sample was the id-prefix slice — which CONTAINED
    // the three evaluated queries, quantizing their neighborhoods
    // flatteringly; the unbiased seeded sample measures 0.33. q90's
    // refine stage, not a biased sample, is the real recall answer.
    assert(trained >= 0.3, f"trained PQ recall $trained%.2f implausibly low")
  }

  test("q90 (IVFADC + exact refine) holds the floor and is monotone in nprobe") {
    // CELL recall can only grow with nprobe; with the CONSTANT
    // rerank shortlist (rerankDepthFor — round 11) a larger probed
    // pool can in principle evict a borderline true neighbor by ADC
    // noise, so monotonicity is asserted to one-hit tolerance
    // (1/15 ≈ 0.067), not exactly.
    val sweep = (1 to 4).map { np =>
      np -> recallOf(graft.queries.TextVector.ivfPq(spark, sf, np))
    }
    info("recall@5 vs nprobe: " +
      sweep.map { case (np, r) => f"np=$np%d:$r%.3f" }.mkString("  "))
    sweep.sliding(2).foreach {
      case Seq((npA, a), (npB, b)) =>
        assert(b >= a - (1.0 / 15) - 1e-9,
          f"recall dropped > one hit: np=$npA%d:$a%.3f > np=$npB%d:$b%.3f")
      case _ =>
    }
    // the REGISTERED query uses the ivfNprobeFor policy (np =
    // 2·ceil(√nlist) — a probed fraction that shrinks as 2/√nlist)
    // and the constant shortlist: measured 0.933 at sf0.001
    // (nlist=22, np=10). 0.85 floor leaves one-hit margin.
    val atPolicy = recall("q90_ivf_pq")
    info(f"policy recall@5 = $atPolicy%.3f")
    assert(atPolicy >= 0.85, f"q90 recall@5 $atPolicy%.2f below 0.85 floor")
    val out = SparkEntry.queries("q90_ivf_pq")(spark, sf)
      .select($"query_id", $"vec_id").as[(Long, Long)].collect()
    assert(out.length == 15, s"3 queries × top-5 expected, got ${out.length}")
  }

  test("q90 rerank depth is a constant multiple of k, never a corpus fraction") {
    // round 10's depth tracked the probed-candidate count and reached
    // n/2 at the registered geometry — the rerank join grew linearly
    // with the corpus. The depth function now takes ONLY the ask k
    // (its signature admits no corpus argument): 20·k, so the
    // exact-refine equi-join is O(k·|queries|) at every scale.
    (1 to 50).foreach { k =>
      assert(graft.queries.TextVector.rerankDepthFor(k) == 20 * k)
    }
  }

  test("q90 recall holds at sf0.1 (the bench scale: 4x corpus, same geometry)") {
    val sf01 = "/root/testdata/sf0.1"
    val vecs01: Map[Long, Array[Double]] =
      Tables.embeddings(spark, sf01)
        .select($"vec_id", $"embedding").collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
        .toMap
    def exact5(qid: Long): Set[Long] = {
      val q = vecs01(qid)
      vecs01.toSeq.map { case (id, v) =>
        (id, q.zip(v).map { case (a, b) => (a - b) * (a - b) }.sum)
      }.sortBy { case (id, d) => (d, id) }.take(5).map(_._1).toSet
    }
    val got = SparkEntry.queries("q90_ivf_pq")(spark, sf01)
      .select($"query_id", $"vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (q, rows) => q -> rows.map(_._2).toSet }
    val r = got.map { case (q, ids) => (ids intersect exact5(q)).size }.sum
      .toDouble / (got.size * 5)
    info(f"sf0.1 recall@5 = $r%.3f")
    // 0.867 measured (round 11: nlist=√n=44, policy np=14, constant
    // depth 100). The depth-saturated ceiling at np=14 is 0.933 — the
    // one-hit gap is a true rank-3 neighbor whose ADC lands at
    // ~rank 130 of 1270 candidates: on near-isotropic vectors the
    // candidate d2 spread is small relative to residual-quantization
    // noise, and NEITHER PqKRank=128 nor PqM=16 moved it (measured),
    // so the honest fix is not a deeper corpus-fraction shortlist.
    // 0.85 floor leaves one-hit margin at 15 result rows.
    assert(r >= 0.85, f"q90 recall@5 $r%.2f at sf0.1 below 0.85 floor")
  }
}
