package graft

import org.scalatest.funsuite.AnyFunSuite

/** Bench's contamination gates (r18 verdict #1): the noisy-rerun
  * phase must be load-gated exactly like bench start — the r18
  * driver artifact re-measured 33 queries at rerun_load_start 9.41,
  * so the kept minima and committed spreads were taken on a loaded
  * machine and a judge re-bench was needed to refute the phantom
  * movers for the fourth consecutive round. These tests pin the gate
  * ORDER (gate strictly before any re-measure and before the
  * telemetry bracket), the skip semantics (busy gate keeps the
  * first-slot values untouched), and the decay-wait helper both
  * gates share.
  */
class BenchGateSpec extends AnyFunSuite {

  test("awaitLoadDecay proceeds once load decays, gives up at the deadline") {
    val decaying = Iterator(5.0, 3.0, 1.2)
    assert(Bench.awaitLoadDecay(2.0, 60, () => decaying.next(), sleepMs = 1) == 1.2)
    // deadline already passed: the still-hot reading comes back for
    // the caller to refuse/skip on
    assert(Bench.awaitLoadDecay(2.0, 0, () => 7.0) == 7.0)
    // /proc unavailable (-1): returned immediately, never spins
    assert(Bench.awaitLoadDecay(2.0, 60, () => -1.0) == -1.0)
  }

  test("the rerun gate runs BEFORE the telemetry bracket and any re-measure; busy gate skips the phase whole") {
    val log = scala.collection.mutable.ArrayBuffer[String]()
    val rs = Seq(
      Bench.Q("qa", 1.0, noisy = true, 0.9, 3.0),
      Bench.Q("qb", 2.0, noisy = false, 1.9, 2.1))
    val (r1, m1, skipped1) = Bench.rerunNoisyPhase(rs,
      () => { log += "gate"; false },
      () => log += "bracket",
      n => { log += s"measure:$n"; (0.5, false, 0.5, 0.5) })
    assert(skipped1, "busy gate must report the skip")
    assert(m1.isEmpty && r1 == rs,
      "a skipped phase must keep the first-slot values untouched")
    assert(log.toSeq == Seq("gate"),
      s"gate must be the ONLY thing that ran, got $log")
  }

  test("an idle gate re-measures: gate -> bracket -> measures, min kept, spread unioned") {
    val log = scala.collection.mutable.ArrayBuffer[String]()
    val rs = Seq(
      Bench.Q("qa", 1.0, noisy = true, 0.9, 3.0),
      Bench.Q("qb", 2.0, noisy = false, 1.9, 2.1))
    val (r2, m2, skipped2) = Bench.rerunNoisyPhase(rs,
      () => { log += "gate"; true },
      () => log += "bracket",
      n => { log += s"measure:$n"; (0.5, false, 0.4, 0.6) })
    assert(!skipped2 && m2("qa") == ((1.0, 0.5)))
    assert(log.toSeq == Seq("gate", "bracket", "measure:qa"),
      s"order must be gate, bracket, then measures only: $log")
    val qa = r2.find(_.name == "qa").get
    assert(qa.median == 0.5 && qa.lo == 0.4 && qa.hi == 3.0,
      s"min-of-medians + unioned spread expected, got $qa")
    assert(r2.find(_.name == "qb").get == rs(1),
      "non-noisy queries must pass through unchanged")
  }

  test("no (live) noisy query: the gate is never consulted and nothing re-measures") {
    // a FAILED noisy query (median -1) must not trigger the phase
    // either — there is nothing to re-keep for it
    val rs = Seq(
      Bench.Q("qb", 2.0, noisy = false, 1.9, 2.1),
      Bench.Q("qf", -1.0, noisy = true, 0.0, 0.0))
    val (r, m, skipped) = Bench.rerunNoisyPhase(rs,
      () => fail("gate consulted with no noisy query"),
      () => fail("telemetry bracket started"),
      _ => fail("re-measured"))
    assert(!skipped && m.isEmpty && r == rs)
  }
}
