package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench publication policy is load-bearing for the BASELINE gate
  * (round-13 verdict ask #5): `medOf`'s upper-middle even-length median
  * and `finalMedian`'s switch at 1 qualified rep manufactured three
  * phantom regressions and a fake 2.17× gate breach. Every rule that
  * decides WHICH number an entry publishes is pinned here. */
class BenchPolicySpec extends AnyFunSuite {

  test("median: odd length is the middle element") {
    assert(BenchPolicy.median(Seq(3.0, 1.0, 2.0)) === 2.0)
    assert(BenchPolicy.median(Seq(5.0)) === 5.0)
  }

  test("median: even length AVERAGES the two middles (round-13 bug: " +
    "upper middle made a 2-rep median the worse rep)") {
    assert(BenchPolicy.median(Seq(0.359, 1.531)) === (0.359 + 1.531) / 2)
    assert(BenchPolicy.median(Seq(4.0, 1.0, 3.0, 2.0)) === 2.5)
  }

  test("median rejects an empty series loudly") {
    intercept[IllegalArgumentException](BenchPolicy.median(Seq.empty))
  }

  test("floor: 5th-smallest observation, not the minimum — one lucky " +
    "outlier must not collapse the qualification bar") {
    val obs = Seq(0.0275, 0.09, 0.10, 0.11, 0.12, 0.13, 0.14)
    assert(BenchPolicy.floor(obs, None) === 0.12)
    // short series: last element when fewer than 5 observations
    assert(BenchPolicy.floor(Seq(0.2, 0.1), None) === 0.2)
  }

  test("floor: hint accepted inside the plausibility window " +
    "[obs/20, obs) — the idle prior-round floor survives a sweep " +
    "that ran loaded end to end") {
    val loaded = Seq(0.5, 0.52, 0.55, 0.6, 0.61)
    assert(BenchPolicy.floor(loaded, Some(0.08)) === 0.08)
    // too small to be the same machine: rejected
    assert(BenchPolicy.floor(loaded, Some(0.01)) === 0.61)
    // larger than today's own observation: today's wins
    assert(BenchPolicy.floor(loaded, Some(0.7)) === 0.61)
    // no observations at all: hint or MaxValue
    assert(BenchPolicy.floor(Seq.empty, Some(0.1)) === 0.1)
    assert(BenchPolicy.floor(Seq.empty, None) === Double.MaxValue)
  }

  test("repQualifies: compute canary within QualRatio of the ENTRY's " +
    "own floor (JIT warmth is entry-local)") {
    assert(BenchPolicy.repQualifies(0.12, 0.10, 0.10, None, None))
    assert(!BenchPolicy.repQualifies(0.14, 0.10, 0.10, None, None))
    // early-sweep entry: canaries ~1.6x the global (end-of-sweep)
    // floor from JIT drift alone — reps calm RELATIVE TO THEIR ENTRY
    // qualify (the round-14 fix for 75/102 entries zeroed on an idle
    // box by a global-minimum bar)
    assert(BenchPolicy.repQualifies(0.055, 0.05, 0.031, None, None))
  }

  test("repQualifies: an entry whose own floor exceeds the cap over " +
    "the global floor is a LOADED PATCH — nothing in it qualifies, " +
    "however self-consistent its canaries look") {
    // entry floor 3.2x global (round 13's 4.7-5.9x apply patches):
    // a rep at 1.0x its entry floor must NOT self-normalize in
    assert(!BenchPolicy.repQualifies(0.10, 0.10, 0.031, None, None))
  }

  test("repQualifies: the I/O canary disqualifies a rep the compute " +
    "canary reads as calm (the round-13 cold-cache hole)") {
    // compute calm, disk busy: 3x the I/O floor
    assert(!BenchPolicy.repQualifies(0.10, 0.10, 0.10, Some(0.30), Some(0.10)))
    // both calm
    assert(BenchPolicy.repQualifies(0.10, 0.10, 0.10, Some(0.15), Some(0.10)))
    // no I/O series for the rep: compute alone decides
    assert(BenchPolicy.repQualifies(0.10, 0.10, 0.10, None, Some(0.10)))
  }

  test("publishedMedian: fewer than MinQualifiedReps qualified reps " +
    "fall back to the all-reps median (1-2 lucky reps must not " +
    "override 11 honest ones)") {
    val all = Seq(0.36, 0.40, 0.45, 0.50, 0.55, 0.60, 0.65, 0.70,
      0.75, 0.36, 0.40, 1.53, 1.53)
    val twoQualified = Seq(1.53, 1.531)
    val (m, usedQ) = BenchPolicy.publishedMedian(all, twoQualified)
    assert(!usedQ)
    assert(m === BenchPolicy.median(all))
  }

  test("publishedMedian: at MinQualifiedReps the qualified median " +
    "takes over") {
    val all = Seq(1.0, 2.0, 3.0, 4.0, 5.0)
    val q = Seq(1.0, 1.1, 1.2)
    val (m, usedQ) = BenchPolicy.publishedMedian(all, q)
    assert(usedQ)
    assert(m === 1.1)
  }

  test("adjudicate: noise when the rep min overlaps the prior median") {
    val c = BenchPolicy.adjudicate(prev = 1.0, curMin = 1.05,
      worstCanaryRatio = 1.0, qualifiedReps = 5)
    assert(c.startsWith("noise:"))
  }

  test("adjudicate: machine-load when a rep canary exceeded the bar") {
    val c = BenchPolicy.adjudicate(prev = 1.0, curMin = 1.5,
      worstCanaryRatio = 2.4, qualifiedReps = 5)
    assert(c.startsWith("machine-load:"))
  }

  test("adjudicate: unattributed otherwise") {
    val c = BenchPolicy.adjudicate(prev = 1.0, curMin = 1.5,
      worstCanaryRatio = 1.0, qualifiedReps = 5)
    assert(c.startsWith("unattributed:"))
  }

  test("adjudicate: a loaded patch (uniformly elevated canaries, no " +
    "excursion) is machine-load evidence even at excursion 1.0") {
    val c = BenchPolicy.adjudicate(prev = 1.0, curMin = 1.5,
      worstCanaryRatio = 1.0, qualifiedReps = 5, loadedPatch = true)
    assert(c.startsWith("machine-load:"))
    assert(c.contains("loaded-patch cap"))
  }

  test("adjudicate: under MinQualifiedReps the cause says the " +
    "adjudication came from all-reps data (round-13 bug: 'noise' " +
    "was asserted against a qualified median simultaneously " +
    "published as truth)") {
    val c = BenchPolicy.adjudicate(prev = 1.0, curMin = 1.05,
      worstCanaryRatio = 1.0, qualifiedReps = 2)
    assert(c.startsWith("insufficient-qualified-reps (2)"))
    assert(c.contains("noise:"))
  }
}
