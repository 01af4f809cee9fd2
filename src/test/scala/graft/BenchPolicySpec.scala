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

  test("repQualifies: hypervisor steal past StealFracCap disqualifies " +
    "a rep BOTH canaries read as calm (the round-16-named mechanism)") {
    // the measured shape: a stolen replica rep at ~15% steal share
    // with calm canaries (steal hits the canary less than the body)
    assert(!BenchPolicy.repQualifies(0.10, 0.10, 0.10, Some(0.12),
      Some(0.10), stealFrac = Some(0.15)))
    // a calm rep's share (<=0.5% measured) passes
    assert(BenchPolicy.repQualifies(0.10, 0.10, 0.10, Some(0.12),
      Some(0.10), stealFrac = Some(0.004)))
    // no steal reading (non-Linux): the bar is skipped
    assert(BenchPolicy.repQualifies(0.10, 0.10, 0.10, Some(0.12),
      Some(0.10), stealFrac = None))
  }

  test("qualifiedReps: a parallel steal series drops exactly the " +
    "stolen reps; entries without the series are unaffected") {
    val ts = Seq(4.5, 4.6, 4.4, 2.4)
    val cs = Seq(0.033, 0.032, 0.034, 0.031)
    val ios = Seq(0.14, 0.15, 0.14, 0.13)
    // reps 1-3 carry 17-35 steal-seconds (the measured replica shape:
    // frac 0.12-0.24 at 32 cores); rep 4 is calm
    val steal = Seq(25000L, 35000L, 17500L, 150L)
    val q = SweepPublication.qualifiedReps(ts, cs, ios, preRequeue = 4,
      fSweepC = 0.031, fReqC = 0.031, fSweepIo = 0.13, fReqIo = 0.13,
      stealMs = steal, cores = 32)
    assert(q == Seq(2.4), s"got $q")
    val noSeries = SweepPublication.qualifiedReps(ts, cs, ios,
      preRequeue = 4, fSweepC = 0.031, fReqC = 0.031,
      fSweepIo = 0.13, fReqIo = 0.13)
    assert(noSeries == ts, s"got $noSeries")
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

  test("adjudicate: an isolated ledger measurement overlapping the " +
    "prior median clears the entry as environment") {
    val c = BenchPolicy.adjudicate(prev = 1.0, curMin = 1.5,
      worstCanaryRatio = 1.0, qualifiedReps = 5,
      isolated = Some((1.05, "BenchOne", "2026-08-16")))
    assert(c.startsWith("environment:"))
    assert(c.contains("BenchOne") && c.contains("2026-08-16"))
  }

  test("adjudicate: an isolated measurement that reproduces the shift " +
    "off-sweep says so — and never clears it as environment") {
    val c = BenchPolicy.adjudicate(prev = 1.0, curMin = 1.5,
      worstCanaryRatio = 1.0, qualifiedReps = 5,
      isolated = Some((1.45, "BenchOne", "2026-08-16")))
    assert(c.startsWith("reproduced-isolated:"))
  }

  test("adjudicate: the ledger refines ONLY the unattributed branch — " +
    "noise and machine-load verdicts keep their in-artifact evidence") {
    val noise = BenchPolicy.adjudicate(prev = 1.0, curMin = 1.05,
      worstCanaryRatio = 1.0, qualifiedReps = 5,
      isolated = Some((1.45, "BenchOne", "2026-08-16")))
    assert(noise.startsWith("noise:"))
    val mload = BenchPolicy.adjudicate(prev = 1.0, curMin = 1.5,
      worstCanaryRatio = 2.0, qualifiedReps = 5,
      isolated = Some((1.05, "BenchOne", "2026-08-16")))
    assert(mload.startsWith("machine-load:"))
  }

  // ---- FIXTURE REPLAY through the full publication wiring (round-14
  // verdict ask #6): the policy functions above are each pinned, but
  // every round's failure mode appeared in the wiring BETWEEN them —
  // which floor a rep is judged against, which series a median is
  // taken over, which min feeds adjudication. This fixture is a
  // recorded-sweep shape (times + both canaries per rep, a requeue
  // phase, a prior artifact, an isolated ledger) pushed through
  // SweepPublication — the same object Bench.main publishes from. ----

  private def fixture: SweepPublication = {
    def n(x: Double, k: Int) = Seq.fill(k)(x)
    val entries = Seq("qA_coldcache", "qB_diverge", "qC_noise",
      "qD_mload", "qE_ledger_env", "qF_ledger_repro", "qG_unattr",
      "qH_crossphase", "q06_x10_canary")
    SweepPublication(
      entries = entries,
      repTimes = Map(
        // round-13 x10 shape: 10 honest reps under a slightly-busy
        // compute canary, 2 cache-cold reps that are the only ones
        // whose canaries look calm — the OLD policy published their
        // 1.53s "median"; the fixed policy must stay all-reps
        "qA_coldcache" -> (Seq(0.36, 0.40, 0.45, 0.50, 0.55, 0.60,
          0.65, 0.70, 0.75, 0.38) ++ Seq(1.53, 1.531)),
        // 9 fast reps under a busy compute canary + 4 calm slow reps:
        // qualified median 0.55 vs all-reps 0.30 — must publish the
        // qualified number AND a divergence entry carrying both
        "qB_diverge" -> (n(0.30, 9) ++ n(0.55, 4)),
        "qC_noise" -> Seq(1.02, 1.30, 1.30, 1.35, 1.32),
        "qD_mload" -> Seq(1.50, 1.52, 1.48, 1.51, 1.50),
        "qE_ledger_env" -> n(1.5, 5),
        "qF_ledger_repro" -> n(1.5, 5),
        "qG_unattr" -> n(1.5, 5),
        // 3 sweep reps under a JIT-cold 0.13s canary + 1 requeued rep
        // under an end-of-sweep 0.05s canary: whole-series excursion
        // 2.6x would mislabel the regression machine-load; per-phase
        // excursion is 1.0 and the verdict must stay unattributed
        "qH_crossphase" -> Seq(1.5, 1.5, 1.5, 1.5),
        "q06_x10_canary" -> n(0.10, 5)),
      repCanaries = Map(
        "qA_coldcache" -> (n(0.14, 10) ++ n(0.10, 2)),
        "qB_diverge" -> (n(0.14, 9) ++ n(0.10, 4)),
        "qC_noise" -> n(0.10, 5),
        "qD_mload" -> Seq(0.10, 0.10, 0.10, 0.13, 0.10),
        "qE_ledger_env" -> n(0.10, 5),
        "qF_ledger_repro" -> n(0.10, 5),
        "qG_unattr" -> n(0.10, 5),
        "qH_crossphase" -> (n(0.13, 3) :+ 0.05),
        "q06_x10_canary" -> n(0.10, 5)),
      repIoCanaries = Map(
        "qA_coldcache" -> n(0.55, 12),
        "qB_diverge" -> n(0.55, 13),
        "qC_noise" -> n(0.55, 5),
        "qD_mload" -> n(0.55, 5),
        "qE_ledger_env" -> n(0.55, 5),
        "qF_ledger_repro" -> n(0.55, 5),
        "qG_unattr" -> n(0.55, 5),
        "qH_crossphase" -> n(0.55, 4),
        "q06_x10_canary" -> n(0.55, 5)),
      preRequeueReps = Map(
        "qA_coldcache" -> 12, "qB_diverge" -> 13, "qC_noise" -> 5,
        "qD_mload" -> 5, "qE_ledger_env" -> 5, "qF_ledger_repro" -> 5,
        "qG_unattr" -> 5, "qH_crossphase" -> 3, "q06_x10_canary" -> 5),
      fSweepC = 0.10, fReqC = 0.05, fSweepIo = 0.5, fReqIo = 0.5,
      prevMedians = Map("qC_noise" -> 1.0, "qD_mload" -> 1.0,
        "qE_ledger_env" -> 1.0, "qF_ledger_repro" -> 1.0,
        "qG_unattr" -> 1.0, "qH_crossphase" -> 1.0,
        "q06_x10_canary" -> 0.01),
      isolatedLedger = Map(
        "qE_ledger_env" -> IsolatedMeasure(1.05, "BenchOne", "2026-08-16"),
        "qF_ledger_repro" -> IsolatedMeasure(1.45, "BenchOne", "2026-08-16")))
  }

  private def parseJson(s: String) =
    new com.fasterxml.jackson.databind.ObjectMapper().readTree(s)

  test("fixture replay: every published median lies inside its own " +
    "rep spread — the invariant round 13 broke") {
    val pub = fixture
    pub.entries.foreach { n =>
      val m = pub.finalMedian(n)
      val (lo, hi) = pub.spreadOf(n)
      assert(m >= lo && m <= hi, s"$n: median $m outside [$lo, $hi]")
    }
  }

  test("fixture replay: the qualified switch happens only at >= " +
    "MinQualifiedReps — 2 lucky cache-cold reps publish the all-reps " +
    "median, 4 qualified reps publish theirs") {
    val pub = fixture
    assert(pub.qualifiedOf("qA_coldcache").length === 2)
    assert(pub.finalMedian("qA_coldcache") ===
      BenchPolicy.median(pub.repTimes("qA_coldcache")))
    assert(pub.qualifiedOf("qB_diverge").length === 4)
    assert(pub.finalMedian("qB_diverge") === 0.55)
  }

  test("fixture replay: a >1.2x qualified-vs-all-reps disagreement " +
    "publishes BOTH numbers in median_divergence; agreeing entries " +
    "and sub-3-qualified entries do not appear") {
    val pub = fixture
    val div = parseJson(pub.divergenceJson)
    assert(div.has("qB_diverge"))
    assert(div.get("qB_diverge").get("qualified").asDouble() === 0.55)
    assert(div.get("qB_diverge").get("all_reps").asDouble() === 0.30)
    assert(!div.has("qA_coldcache")) // 2 qualified: all-reps published
    assert(!div.has("qC_noise"))
    assert(div.size() === 1)
  }

  test("fixture replay: regression adjudication — noise from rep-min " +
    "overlap, machine-load from PER-PHASE excursion only, ledger " +
    "refinement, and the canary series excluded") {
    val pub = fixture
    val causes = pub.regressions.map(r => r._1 -> r._5).toMap
    assert(causes("qC_noise").startsWith("noise:"))
    assert(causes("qD_mload").startsWith("machine-load:"))
    assert(causes("qE_ledger_env").startsWith("environment:"))
    assert(causes("qF_ledger_repro").startsWith("reproduced-isolated:"))
    assert(causes("qG_unattr").startsWith("unattributed:"))
    // the cross-phase entry: whole-series canary excursion is 2.6x but
    // per-phase is 1.0 — machine-load must NOT be claimed
    assert(causes("qH_crossphase").startsWith("unattributed:"))
    // the interleaved canary series is machine state, not a query
    assert(!causes.contains("q06_x10_canary"))
  }

  test("fixture replay: every emitted artifact fragment is valid JSON " +
    "and the fields are mutually consistent") {
    val pub = fixture
    val qs = parseJson(pub.qjson)
    val qual = parseJson(pub.qualifiedJson)
    val canary = parseJson(pub.repCanaryJson)
    val io = parseJson(pub.repIoCanaryJson)
    val efr = parseJson(pub.entryFloorRatioJson)
    val regs = parseJson(pub.regressionsJson)
    pub.entries.foreach { n =>
      assert(qs.has(n) && qual.has(n) && canary.has(n) && io.has(n) &&
        efr.has(n), s"$n missing from an artifact field")
      assert(math.abs(qs.get(n).asDouble() - pub.finalMedian(n)) < 1e-4)
      assert(qual.get(n).asInt() === pub.qualifiedOf(n).length)
      assert(canary.get(n).size() === pub.repTimes(n).length)
    }
    assert(regs.isArray && regs.size() === pub.regressions.length)
    // a regression row's cur is the same published median qjson carries
    val it = regs.elements()
    while (it.hasNext) {
      val r = it.next()
      assert(math.abs(r.get("cur").asDouble() -
        qs.get(r.get("q").asText()).asDouble()) < 1e-4)
    }
  }

  // ---- STALE FALLBACK (round-17, the round-16 verdict's #1 ask:
  // steal-aware publication end-to-end — a sweep that never earned 3
  // quiet reps for an entry must not anchor the published number on
  // its dirty all-reps median when the prior artifact holds a
  // qualified one) ----

  test("stale fallback: a thin entry republishes the prior QUALIFIED " +
    "median, marked in stale with the prior sweep's generated stamp") {
    val pub = fixture.copy(
      prevMedians = fixture.prevMedians + ("qA_coldcache" -> 0.47),
      prevQualified = Map("qA_coldcache" -> 5),
      prevGenerated = "2026-08-15T10:00:00Z")
    // 2 qualified reps → the sweep's own number would be the dirty
    // all-reps median; the published value must be the prior 0.47
    assert(pub.qualifiedOf("qA_coldcache").length === 2)
    assert(pub.isStale("qA_coldcache"))
    assert(pub.publishedValue("qA_coldcache") === 0.47)
    val qs = parseJson(pub.qjson)
    assert(qs.get("qA_coldcache").asDouble() === 0.47)
    val stale = parseJson(pub.staleJson)
    assert(stale.has("qA_coldcache") && stale.size() === 1)
    val e = stale.get("qA_coldcache")
    assert(e.get("fallback").asDouble() === 0.47)
    assert(e.get("since").asText() === "2026-08-15T10:00:00Z")
    assert(e.get("qualified_reps").asInt() === 2)
    // the dirty number stays visible for transparency
    assert(math.abs(e.get("measured_all_reps").asDouble() -
      BenchPolicy.median(pub.repTimes("qA_coldcache"))) < 1e-4)
  }

  test("stale fallback: a prior value that was ITSELF a marked " +
    "fallback inherits the original since label — a value frozen " +
    "across consecutive dirty sweeps still names the sweep that " +
    "measured it") {
    val pub = fixture.copy(
      prevMedians = fixture.prevMedians + ("qA_coldcache" -> 0.47),
      prevQualified = Map("qA_coldcache" -> 1), // prior sweep was thin too
      prevStaleSince = Map("qA_coldcache" -> "2026-08-10T09:00:00Z"),
      prevGenerated = "2026-08-15T10:00:00Z")
    assert(pub.isStale("qA_coldcache"))
    assert(pub.publishedValue("qA_coldcache") === 0.47)
    assert(parseJson(pub.staleJson).get("qA_coldcache")
      .get("since").asText() === "2026-08-10T09:00:00Z")
  }

  test("stale fallback: NO fallback when the prior value is " +
    "untrustworthy (thin there, not marked stale) — the all-reps " +
    "median publishes, flagged only by qualified_reps") {
    val pub = fixture.copy(
      prevMedians = fixture.prevMedians + ("qA_coldcache" -> 0.47),
      prevQualified = Map("qA_coldcache" -> 2))
    assert(!pub.isStale("qA_coldcache"))
    assert(pub.publishedValue("qA_coldcache") ===
      BenchPolicy.median(pub.repTimes("qA_coldcache")))
    assert(parseJson(pub.staleJson).size() === 0)
  }

  test("stale fallback: an entry that EARNED its qualified median " +
    "never falls back, and a stale entry never appears in regressions") {
    val pub = fixture.copy(
      prevMedians = fixture.prevMedians ++
        Map("qB_diverge" -> 0.10, "qA_coldcache" -> 0.47),
      prevQualified = Map("qB_diverge" -> 5, "qA_coldcache" -> 5),
      prevGenerated = "2026-08-15T10:00:00Z")
    // qB has 4 qualified reps: its own number wins even though the
    // prior median exists (and would otherwise flag a 5.5x regression)
    assert(!pub.isStale("qB_diverge"))
    assert(pub.publishedValue("qB_diverge") === 0.55)
    // qA republishes prev (cur == prev) → cannot regress against itself
    assert(!pub.regressions.exists(_._1 == "qA_coldcache"))
    // qB regressed for real (0.10 → 0.55) and still appears
    assert(pub.regressions.exists(_._1 == "qB_diverge"))
  }

  // ---- CALMER-PRIOR FALLBACK + BOUNDED CHAINS (round 18: the
  // round-17 verdict's #1 ask — a dirty sweep must not overwrite a
  // calm sweep's qualified numbers — and the ADVICE finding that an
  // unbounded fallback chain can freeze a number forever) ----

  test("calmer-prior: a qualified entry on a DIRTY sweep republishes " +
    "the calm prior artifact's qualified median, marked with this " +
    "sweep's measured number") {
    val pub = fixture.copy(
      prevMedians = fixture.prevMedians + ("qB_diverge" -> 0.40),
      prevQualified = Map("qB_diverge" -> 5),
      prevGenerated = "2026-08-15T10:00:00Z",
      curSweepStealSec = 900.0, prevSweepStealSec = Some(12.0))
    assert(pub.qualifiedOf("qB_diverge").length >=
      BenchPolicy.MinQualifiedReps) // earned its median...
    assert(pub.isCalmerPrior("qB_diverge")) // ...but the sweep is dirty
    assert(pub.publishedValue("qB_diverge") === 0.40)
    assert(pub.publishedSource("qB_diverge") === "calmer_prior")
    val cp = parseJson(pub.calmerPriorJson)
    assert(cp.get("sweep_steal_sec").asDouble() === 900.0)
    val e = cp.get("entries").get("qB_diverge")
    assert(e.get("fallback").asDouble() === 0.40)
    assert(e.get("since").asText() === "2026-08-15T10:00:00Z")
    assert(e.get("rounds").asInt() === 1)
    // this sweep's qualified median stays visible beside the fallback
    assert(e.get("measured_qualified").asDouble() === 0.55)
    // a fallback-published entry cannot regress against itself
    assert(!pub.regressions.exists(_._1 == "qB_diverge"))
  }

  test("calmer-prior is VALUE-BLIND: it fires even when the prior " +
    "number is WORSE than this sweep's — box conditions decide, " +
    "never which number is smaller") {
    val pub = fixture.copy(
      prevMedians = fixture.prevMedians + ("qB_diverge" -> 0.90),
      prevQualified = Map("qB_diverge" -> 5),
      prevGenerated = "2026-08-15T10:00:00Z",
      curSweepStealSec = 900.0, prevSweepStealSec = Some(12.0))
    assert(pub.publishedValue("qB_diverge") === 0.90) // worse, still wins
  }

  test("calmer-prior does NOT fire on a calm sweep, on a dirty-prior " +
    "artifact, on a thin entry (stale owns that), or without a prior " +
    "steal reading (pre-round-18 artifact)") {
    val calm = fixture.copy(
      prevMedians = fixture.prevMedians + ("qB_diverge" -> 0.40),
      prevQualified = Map("qB_diverge" -> 5),
      curSweepStealSec = 8.0, prevSweepStealSec = Some(12.0))
    assert(!calm.isCalmerPrior("qB_diverge"))
    assert(calm.publishedValue("qB_diverge") === 0.55)
    val dirtyPrev = calm.copy(curSweepStealSec = 900.0,
      prevSweepStealSec = Some(800.0))
    assert(!dirtyPrev.isCalmerPrior("qB_diverge"))
    val noPrevSteal = calm.copy(curSweepStealSec = 900.0,
      prevSweepStealSec = None)
    assert(!noPrevSteal.isCalmerPrior("qB_diverge"))
    // qA has 2 qualified reps: the stale path owns it, calmer-prior
    // must never double-claim
    val thin = fixture.copy(
      prevMedians = fixture.prevMedians + ("qA_coldcache" -> 0.47),
      prevQualified = Map("qA_coldcache" -> 5),
      curSweepStealSec = 900.0, prevSweepStealSec = Some(12.0))
    assert(thin.isStale("qA_coldcache"))
    assert(!thin.isCalmerPrior("qA_coldcache"))
  }

  test("calmer-prior chain: inherits the ORIGINAL since label across " +
    "consecutive dirty sweeps and expires at MaxFallbackRounds — the " +
    "sweep's own measured median then publishes") {
    val base = fixture.copy(
      prevMedians = fixture.prevMedians + ("qB_diverge" -> 0.40),
      prevQualified = Map.empty, // prev sweep did not qualify it itself
      prevGenerated = "2026-08-15T10:00:00Z",
      curSweepStealSec = 900.0, prevSweepStealSec = Some(700.0))
    // prev artifact carried it as calmer_prior at rounds=2
    val inherited = base.copy(prevCalmerPrior =
      Map("qB_diverge" -> (("2026-08-10T09:00:00Z", 2))))
    assert(inherited.calmerPrior("qB_diverge") ===
      Some((0.40, "2026-08-10T09:00:00Z", 3)))
    // at the bound: expires, this sweep's qualified median publishes
    val expired = base.copy(prevCalmerPrior =
      Map("qB_diverge" -> (("2026-08-10T09:00:00Z",
        BenchPolicy.MaxFallbackRounds))))
    assert(!expired.isCalmerPrior("qB_diverge"))
    assert(expired.publishedValue("qB_diverge") === 0.55)
  }

  test("stale chain: bounded at MaxFallbackRounds — an entry frozen " +
    "that long force-publishes its measured median and is named in " +
    "stale_expired") {
    val atBound = fixture.copy(
      prevMedians = fixture.prevMedians + ("qA_coldcache" -> 0.47),
      prevQualified = Map("qA_coldcache" -> 1),
      prevStaleSince = Map("qA_coldcache" -> "2026-08-10T09:00:00Z"),
      prevStaleRounds = Map("qA_coldcache" ->
        BenchPolicy.MaxFallbackRounds),
      prevGenerated = "2026-08-15T10:00:00Z")
    assert(!atBound.isStale("qA_coldcache"))
    assert(atBound.publishedValue("qA_coldcache") ===
      BenchPolicy.median(atBound.repTimes("qA_coldcache")))
    assert(atBound.staleExpired === Seq("qA_coldcache"))
    assert(parseJson(s"""{"x":${atBound.staleExpiredJson}}""")
      .get("x").get(0).asText() === "qA_coldcache")
    // one round BELOW the bound still inherits, rounds incremented
    val below = atBound.copy(prevStaleRounds = Map("qA_coldcache" ->
      (BenchPolicy.MaxFallbackRounds - 1)))
    assert(below.isStale("qA_coldcache"))
    assert(parseJson(below.staleJson).get("qA_coldcache")
      .get("rounds").asInt() === BenchPolicy.MaxFallbackRounds)
    assert(below.staleExpired.isEmpty)
  }

  test("CROSS-CHAIN: a prior value published via calmer_prior does " +
    "not reset the stale chain — the inherited since/rounds carry " +
    "(prevQualified records the dirty sweep's reps, not provenance)") {
    val pub = fixture.copy(
      prevMedians = fixture.prevMedians + ("qA_coldcache" -> 0.47),
      prevQualified = Map("qA_coldcache" -> 5), // that sweep's own reps
      prevCalmerPrior = Map("qA_coldcache" ->
        (("2026-08-10T09:00:00Z", 2))),
      prevGenerated = "2026-08-16T10:00:00Z")
    // qA is thin THIS sweep: the stale fallback must continue the
    // calmer-prior chain (original since, rounds 2 -> 3), never
    // restart at rounds=1 with a label naming a sweep that measured
    // nothing
    assert(pub.isStale("qA_coldcache"))
    assert(pub.staleFallback("qA_coldcache") ===
      Some((0.47, "2026-08-10T09:00:00Z", 3)))
    // at the bound the cross-chain expires too — and is NAMED
    val atBound = pub.copy(prevCalmerPrior = Map("qA_coldcache" ->
      (("2026-08-10T09:00:00Z", BenchPolicy.MaxFallbackRounds))))
    assert(!atBound.isStale("qA_coldcache"))
    assert(atBound.staleExpired === Seq("qA_coldcache"))
  }

  test("calmer-prior expiry is VISIBLE: calmer_prior_expired names a " +
    "qualified dirty-sweep entry whose inherited chain hit the bound") {
    val pub = fixture.copy(
      prevMedians = fixture.prevMedians + ("qB_diverge" -> 0.40),
      prevCalmerPrior = Map("qB_diverge" ->
        (("2026-08-10T09:00:00Z", BenchPolicy.MaxFallbackRounds))),
      curSweepStealSec = 900.0, prevSweepStealSec = Some(700.0))
    assert(!pub.isCalmerPrior("qB_diverge"))
    assert(pub.calmerPriorExpired === Seq("qB_diverge"))
    assert(pub.publishedValue("qB_diverge") === 0.55) // measured wins
    assert(parseJson(s"""{"x":${pub.calmerPriorExpiredJson}}""")
      .get("x").get(0).asText() === "qB_diverge")
  }

  test("isolated ledger parsing: the bench_isolated.json shape round-" +
    "trips, a missing file reads empty") {
    val tmp = java.nio.file.Files.createTempFile("ledger", ".json")
    java.nio.file.Files.writeString(tmp,
      """{"q27_dedup_exact": {"sec": 0.293, "tool": "BenchOne", """ +
      """"date": "2026-08-16", "note": "30 reps"},""" + "\n" +
      """ "q06_zorder_2ndcol": {"sec": 0.2055, "tool": "LayoutTrace", """ +
      """"date": "2026-08-16", "note": "x"}}""")
    val m = SweepPublication.loadIsolatedLedger(tmp.toString)
    assert(m("q27_dedup_exact") ===
      IsolatedMeasure(0.293, "BenchOne", "2026-08-16"))
    assert(m("q06_zorder_2ndcol").tool === "LayoutTrace")
    assert(SweepPublication.loadIsolatedLedger("/nonexistent/x.json")
      === Map.empty)
    java.nio.file.Files.delete(tmp)
  }

  test("isolated ledger parsing survives hand-edits: reordered keys " +
    "and a brace inside the note must not silently drop the entry") {
    val tmp = java.nio.file.Files.createTempFile("ledger", ".json")
    java.nio.file.Files.writeString(tmp,
      """{"q251_webcrawl_prep": {"note": "spread {0.39, 0.50} warm", """ +
      """"tool": "BenchOne", "date": "2026-08-16", "sec": 0.466},""" +
      "\n" +
      """ "q99_malformed": {"tool": "BenchOne"}}""")
    val m = SweepPublication.loadIsolatedLedger(tmp.toString)
    assert(m("q251_webcrawl_prep") ===
      IsolatedMeasure(0.466, "BenchOne", "2026-08-16"))
    assert(!m.contains("q99_malformed")) // incomplete: skipped, not garbage
    java.nio.file.Files.delete(tmp)
  }
}
