package graft

/** Publication policy for the bench sweep — every rule that decides
  * WHICH number an entry publishes, extracted from [[Bench]] so the
  * rules are unit-testable (round-13 verdict ask #5: `medOf`,
  * qualification, and the final-median switch turned out to be
  * load-bearing for the BASELINE gate, and none had a spec).
  *
  * The model: every timed rep is followed back-to-back by two fixed
  * canaries — a 32-task compute job (scheduler + JVM state) and a
  * fixed ~100 MB parquet read (page-cache / disk state; the round-13
  * x10 bimodality was invisible to the compute canary because cache
  * eviction is exactly what a table-scan probe is sensitive to and a
  * `spark.range` canary never touches disk). A rep QUALIFIES when both
  * canaries ran within their ratio of their floor, i.e. the box was
  * quiet — for CPU and for I/O — during that rep. Published medians
  * switch to qualified-reps-only at [[MinQualifiedReps]], never below
  * (round-13 verdict #1: `q.nonEmpty` let 1–2 lucky-canary reps
  * override 11 honest ones, and the upper-middle median of 2 published
  * the WORSE rep — three phantom regressions and a fake 2.17× gate
  * breach came from exactly that).
  */
object BenchPolicy {

  /** Compute-canary qualification bar: a rep counts only when its
    * back-to-back canary ran within this ratio of the floor. Below
    * ~1.25 ordinary JIT/GC jitter disqualifies honest reps; above ~1.5
    * load poisoning slips through. */
  val QualRatio = 1.3

  /** I/O-canary bar — wider than the compute bar: a warm ~100 MB read
    * has proportionally more jitter (readahead, dirty-page writeback)
    * and the signal being screened for (cache eviction / disk
    * contention) shows up as a MULTIPLE, not a percentage. */
  val IoQualRatio = 2.0

  /** How far an entry's own canary floor may sit above the global
    * floor before the whole entry counts as a LOADED PATCH and nothing
    * in it qualifies. The compute canary's wall is dominated by task
    * scheduling, which JIT-warms across the sweep (measured by
    * `graft.trace.CanarySettle`: ~0.13 s on run 1, ~0.05 s by run 60,
    * ~0.03 s fully warm after hundreds) — so a global-minimum floor is
    * an END-OF-SWEEP state that early reps cannot reach, and judging
    * them against it disqualified honest idle-box reps wholesale
    * (round 14's first sweep: 75 of 102 entries at 0 qualified reps on
    * an otherwise idle machine). Each rep is therefore judged against
    * its ENTRY's own canary minimum — JIT state is entry-local; a load
    * excursion mid-entry still spikes that rep's canary above its
    * neighbors' — while this cap keeps an entry that ran entirely
    * inside a loaded window (round 13's 4.7–5.9× apply patches) from
    * self-normalizing its bar.
    *
    * 3.0, not 2.0 (round 15): three idle-box validation sweeps — with
    * the canary PRE-WARMED to steady state and every pair measured
    * settled — still show STRUCTURAL mid-sweep entry floors of
    * 1.4–2.5× the (prior-hint-tightened) global floor on a machine
    * known quiet, so a 2.0 cap zeroes heavy mid-sweep entries (the
    * LSH x10 family) on JIT/sweep position alone, while the condition
    * the cap exists to catch measured 4.7–5.9×. 3.0 sits in the wide
    * gap between structural noise and that signal. */
  val EntryFloorCapRatio = 3.0

  /** Minimum qualified reps before the published median abandons the
    * all-reps median. With fewer, the all-reps median is the more
    * honest estimate (the round-13 lesson). */
  val MinQualifiedReps = 3

  /** Max hypervisor-steal share of a rep's CPU budget
    * (steal_ms / (wall_ms × cores)) before the rep is disqualified —
    * the DIRECT bar for the round-16-named mechanism the canary pair
    * could only proxy: a guest throttled by its shared host is not
    * measuring the engine. Measured separation is wide: the stolen
    * replica/q51 reps read 10–17%, calm reps ≤0.5% — 5% sits in the
    * gap with margin for bursty hosts. Reps without a steal reading
    * (non-Linux) skip the bar. */
  val StealFracCap = 0.05

  /** Sweep-level steal (whole-sweep /proc/stat delta, seconds) at or
    * under which a sweep counts as CALM for the calmer-prior
    * publication policy. Round-17 separation: calm same-day sweeps ran
    * single-digit-to-tens of steal-seconds, the dirty final sweep 922.
    * 60 s over a ~30-60 min sweep is <0.2% of the box's CPU budget. */
  val CalmSweepStealSec = 60.0

  /** Sweep-level steal above which the sweep counts as DIRTY: entries
    * with a calm-sweep qualified prior median republish it (marked in
    * `calmer_prior`) instead of overwriting it with this sweep's
    * number. The per-rep canary/steal bars catch excursions; this
    * catches SUSTAINED steal inside timed bodies that per-rep bars
    * can't see (round 17: flagship published 0.394 s from 4
    * canary-clean reps on a 922-steal-second sweep while same-day calm
    * sweeps measured 0.16-0.22 s). The wide gap between the bars means
    * a middling sweep (60-300 s) neither freezes nor inherits. */
  val DirtySweepStealSec = 300.0

  /** Maximum CONSECUTIVE sweeps a published value may be inherited
    * (stale fallback or calmer-prior) before it expires and the sweep's
    * own measured median force-publishes: a frozen number on a
    * chronically noisy box must not outlive its credibility — an
    * inherited value is exempt from regression detection by
    * construction (cur == prev), so an unbounded chain could hide a
    * real regression indefinitely. */
  val MaxFallbackRounds = 3

  /** The reference's published Q1 wall at sf1 = 6,001,215 rows
    * (BASELINE.md: 0.707 s) — the matched-volume gate denominator,
    * computed here ONCE so the artifact carries the ratio itself
    * instead of every judge re-deriving it. */
  val BaselineSf1Q1Sec = 0.707

  /** Median with the two middles AVERAGED on even length. Round 13
    * published `sorted(len/2)` — the UPPER middle — so a 2-rep
    * "median" was the worse rep. */
  def median(xs: Seq[Double]): Double = {
    require(xs.nonEmpty, "median of an empty series")
    val s = xs.sorted
    if (s.length % 2 == 1) s(s.length / 2)
    else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
  }

  /** Canary floor from a series of observations: the 5th-SMALLEST
    * observation (a single lucky outlier as the floor would collapse
    * the qualification bar until nothing qualifies — a floor needs a
    * few witnesses before it disqualifies the fleet), refined by the
    * prior artifact's floor when it is plausibly the same machine.
    * The hint plausibility window is [obs/20, obs): on a box loaded
    * end-to-end today's own minimum never dips to idle, and a tight
    * window would reject exactly the idle prior-round floor the hint
    * exists to supply. The asymmetry justifies the width: accepting a
    * too-small hint merely makes the bar strict (honest), rejecting a
    * valid hint fakes quiet-box numbers. */
  def floor(observations: Seq[Double], hint: Option[Double]): Double = {
    val all = observations.sorted
    if (all.isEmpty) return hint.getOrElse(Double.MaxValue)
    val obs = all(math.min(all.length - 1, 4))
    hint.filter(h => h < obs && h >= obs / 20).getOrElse(obs)
  }

  /** One rep's qualification verdict:
    *  - the compute canary within [[QualRatio]] of the ENTRY's own
    *    canary floor (JIT warmth is entry-local — see
    *    [[EntryFloorCapRatio]]) …
    *  - … with that entry floor itself within [[EntryFloorCapRatio]]
    *    of the global phase floor (else the whole entry ran in a
    *    loaded patch and nothing in it qualifies) …
    *  - … AND, when an I/O canary series exists for the rep, the I/O
    *    canary within [[IoQualRatio]] of the GLOBAL I/O floor. The I/O
    *    bar stays global on purpose: the warm ~100 MB read has no JIT
    *    drift to normalize away, and an entry-local I/O floor would
    *    mask exactly the entry-long cache-eviction condition the
    *    canary exists to catch.
    * Entries without an I/O series qualify on compute alone. */
  def repQualifies(canary: Double, entryFloor: Double,
                   globalFloor: Double,
                   ioCanary: Option[Double],
                   ioFloor: Option[Double],
                   stealFrac: Option[Double] = None): Boolean =
    canary <= QualRatio * entryFloor &&
      entryFloor <= EntryFloorCapRatio * globalFloor &&
      ((ioCanary, ioFloor) match {
        case (Some(c), Some(f)) => c <= IoQualRatio * f
        case _ => true
      }) &&
      stealFrac.forall(_ <= StealFracCap)

  /** The published median: over qualified reps ONLY at or above
    * [[MinQualifiedReps]], over ALL reps otherwise. Returns the value
    * and whether the qualified series was used. */
  def publishedMedian(all: Seq[Double],
                      qualified: Seq[Double]): (Double, Boolean) =
    if (qualified.length >= MinQualifiedReps) (median(qualified), true)
    else (median(all), false)

  /** Mechanical cause for a cross-round regression entry. With fewer
    * than [[MinQualifiedReps]] qualified reps the adjudication is FROM
    * ALL-REPS DATA and says so — round 13 labeled an entry "noise"
    * from its all-reps spread while simultaneously publishing a
    * qualified median that asserted the opposite; both claims cannot
    * ride one artifact.
    *
    * Machine-load evidence is ENTRY-LOCAL, matching the qualification
    * bar: `worstCanaryRatio` is the entry's max/min canary excursion
    * (a global-floor ratio would read 2-4× on an idle box from JIT
    * drift alone and auto-label every early-sweep plan regression
    * "machine-load"), and `loadedPatch` is the entry-floor-over-cap
    * condition (uniformly elevated canaries — no excursion, but the
    * whole entry ran loaded).
    *
    * `isolated` (sec, tool, date) is a recorded quiet-box isolated
    * re-measurement from the `bench_isolated.json` ledger (round-14
    * verdict ask #2) and refines ONLY the otherwise-unattributed
    * branch — noise/machine-load verdicts already carry in-artifact
    * evidence. The isolated number either fails to reproduce the
    * regression off-sweep (it overlaps the prior median → sweep
    * context, not plan) or confirms the shift is real off-sweep — in
    * which case attribution between "the plan changed" and "the PRIOR
    * median was the unrepresentative one" needs git evidence the
    * policy cannot see, and the label says so. */
  def adjudicate(prev: Double, curMin: Double,
                 worstCanaryRatio: Double, qualifiedReps: Int,
                 loadedPatch: Boolean = false,
                 isolated: Option[(Double, String, String)] = None)
      : String = {
    val base =
      if (curMin <= prev * 1.1)
        f"noise: rep min $curMin%.3f overlaps prior median $prev%.3f"
      else if (loadedPatch)
        "machine-load: entry canary floor over the loaded-patch cap " +
          "for its whole phase"
      else if (worstCanaryRatio >= 1.25)
        f"machine-load: canary excursion up to $worstCanaryRatio%.2fx " +
          "the entry floor during reps"
      else isolated match {
        case Some((iso, tool, date)) if iso <= prev * 1.15 =>
          f"environment: $tool isolated re-measure $iso%.3fs ($date) " +
            f"overlaps prior median $prev%.3f - the regression does " +
            "not reproduce off-sweep"
        case Some((iso, tool, date)) =>
          f"reproduced-isolated: $tool re-measure $iso%.3fs ($date) " +
            "confirms the shift off-sweep - either the plan changed " +
            "or the prior median was the unrepresentative number; " +
            "see probe_notes"
        case None =>
          "unattributed: re-measure isolated (BenchOne); suspect plan"
      }
    if (qualifiedReps < MinQualifiedReps)
      s"insufficient-qualified-reps ($qualifiedReps): " +
        s"adjudicated from all reps — $base"
    else base
  }
}
