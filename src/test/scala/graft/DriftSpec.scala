package graft

import org.scalatest.funsuite.AnyFunSuite

/** q116 distribution drift — closed-form behavior of the factored
  * [[graft.queries.Corpus.distDrift]] chain (the wired query runs
  * the same code over q107's derived snapshots and is oracle-gated).
  */
class DriftSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def drift(prev: Seq[(String, String)],
                    cur: Seq[(String, String)]): Map[String, (Long, Long, Long)] =
    try graft.queries.Corpus.distDrift(
        prev.toDF("lang", "text"), cur.toDF("lang", "text"))
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    finally spark.catalog.clearCache() // distDrift persist contract

  test("identical snapshots diverge exactly zero; disjoint vocab approaches ln 2") {
    // lang "same": byte-identical halves — every bucket has
    // p == q == m (IEEE: (x+x)/2 = x), ln(1) = 0.0 exactly, so
    // jsd_nano is EXACTLY 0, not merely small. lang "shift":
    // disjoint vocabularies at n >> B (so the B Laplace
    // pseudo-counts don't damp the empirical mass — at n ≈ B the
    // smoothing dominates BY DESIGN, the tiny-snapshot regime where
    // a drift verdict would be noise anyway) — JSD must sit near
    // its ln 2 ≈ 0.6931 bound, strictly below it.
    val oldShift = ("alpha beta gamma " * 3000).trim
    val newShift = ("omega sigma theta " * 3000).trim
    val out = drift(
      prev = Seq(("same", "alpha beta gamma delta epsilon zeta"),
        ("shift", oldShift)),
      cur = Seq(("same", "alpha beta gamma delta epsilon zeta"),
        ("shift", newShift)))
    val (sameOld, sameNew, sameJsd) = out("same")
    assert(sameOld == 6L && sameNew == 6L, out.toString)
    assert(sameJsd == 0L, s"identical halves must diverge exactly 0: $out")
    val (_, _, shiftJsd) = out("shift")
    assert(shiftJsd > 600000000L && shiftJsd < 693147181L,
      s"disjoint vocab at n >> B should approach ln2 from below: $out")
  }

  test("divergence is symmetric and grows with the shifted mass") {
    val base = Seq(("l", "alpha beta gamma delta alpha beta gamma delta"))
    val mild = Seq(("l", "alpha beta gamma omega alpha beta gamma delta"))
    val wild = Seq(("l", "omega sigma theta psi omega sigma theta psi"))
    val dMild = drift(base, mild)("l")._3
    val dWild = drift(base, wild)("l")._3
    assert(dMild > 0L, s"a one-token shift must register: $dMild")
    assert(dWild > dMild,
      s"full replacement must out-diverge a one-token edit: $dMild vs $dWild")
    // symmetry (JSD property KL lacks): swapping old/new is identical
    assert(drift(mild, base)("l")._3 == dMild, "JSD must be symmetric")
  }

  test("a lang present on only one side still reports (Laplace-smoothed, no NaN)") {
    val out = drift(
      prev = Seq(("l", "alpha beta"), ("gone", "omega sigma")),
      cur = Seq(("l", "alpha beta")))
    assert(out.contains("gone"), out.toString)
    val (oldN, newN, jsd) = out("gone")
    assert(oldN == 2L && newN == 0L, out.toString)
    assert(jsd > 0L, s"one-sided lang must register positive drift: $out")
  }
}
