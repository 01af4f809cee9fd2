#!/usr/bin/env python3
"""Round-19 publication-quality checks over bench.json: everything the
round-18 checker pinned, plus the round-19 artifact-contract bars —
bench_cpus stamped in env (the core-count key for floors/fallback
chains/prior lookup), and the reconciliation targets the round-18
verdict named (apply ~1.4s, encode32k <=0.7, recopy ~3s calm)."""
import json, sys

b = json.load(open(sys.argv[1] if len(sys.argv) > 1 else "bench.json"))
q, qual = b["queries"], b["qualified_reps"]
stale = b.get("stale", {})
cp = b.get("calmer_prior", {})
cpe = cp.get("entries", {})
fails = []

def check(name, ok, detail):
    print(("PASS " if ok else "FAIL ") + name + ": " + detail)
    if not ok:
        fails.append(name)

exp = set(b.get("stale_expired", []) + b.get("calmer_prior_expired", []))

def fb(name):
    return name in stale or name in cpe or name in exp

h = b["headline"]
check("flagship evidence (>=4 steal-clean reps or calm-prior fallback)",
      h["qualified_reps_flagship"] >= 4
      or h.get("flagship_source") in ("calmer_prior", "stale"),
      f'{h["qualified_reps_flagship"]} reps, value {h["value"]}, '
      f'source {h.get("flagship_source")}')
check("x10 evidence (>=4 steal-clean reps or calm-prior fallback)",
      h["qualified_reps_x10"] >= 4
      or h.get("x10_source") in ("calmer_prior", "stale"),
      f'{h["qualified_reps_x10"]} reps, {h["q06_x10_6Mrows"]}s = '
      f'{h["x10_vs_baseline_sf1"]}x baseline sf1, '
      f'source {h.get("x10_source")}')
check("gate<2x", h["x10_vs_baseline_sf1"] < 2.0, str(h["x10_vs_baseline_sf1"]))

# ---- round-19 artifact-contract bars ----
env = b.get("env", {})
check("env carries bench_cpus (core-count key for prior/floors/chains)",
      isinstance(env.get("bench_cpus"), int), str(env.get("bench_cpus")))

fam = [n for n in q if n.startswith(("q06_", "q00_", "q275_"))]
thin = [n for n in fam if qual.get(n, 0) < 3 and not fb(n)]
check("headline/layout families all >=3 reps or fallback-marked",
      not thin, f"thin unmarked: {thin}" if thin else
      f"{len(fam)} entries covered")

zo, li = q.get("q06_zorder_2ndcol"), q.get("q06_linear_2ndcol")
check("zorder pair tie-or-better AS THE PRIMARY NUMBER",
      zo is not None and li is not None and zo <= li * 1.15,
      f"zorder {zo} vs linear {li}")

zero = [n for n in q if qual.get(n, 0) == 0 and not fb(n)]
check("zero 0-qualified unmarked entries", not zero, f"{zero}")

enc = q.get("q279_bpe_encode32k")
check("encode32k <= 0.7s", enc is not None and enc <= 0.7,
      f"{enc}s, {qual.get('q279_bpe_encode32k')} reps, "
      f"fallback={fb('q279_bpe_encode32k')}")
for n in ("q279_bpe_encode200", "q279_bpe_encode"):
    check(f"{n}>=3 reps or fallback", qual.get(n, 0) >= 3 or fb(n),
          f"{qual.get(n)} reps")

regs = b.get("regressions", [])
unattr = [r["q"] for r in regs if "unattributed" in r["cause"]]
check("zero unattributed regressions", not unattr, f"{unattr}")

apply_t = q.get("q06_replica72M_apply_delta")
check("apply reflects engine work (published <3s)", apply_t is not None
      and apply_t < 3.0,
      f"{apply_t}s, fallback={fb('q06_replica72M_apply_delta')}")

recopy = q.get("q06_replica72M_recopy")
check("recopy reflects a calm measurement (published <6s)",
      recopy is not None and recopy < 6.0,
      f"{recopy}s, fallback={fb('q06_replica72M_recopy')}")

jo = q.get("q113_bucketed_join_only")
check("join-only probe present", jo is not None,
      f"{jo}s ({qual.get('q113_bucketed_join_only')} reps)")

# ---- the round-19 x10-tier work is visible in the published table ----
tier = {"q29_x10_50kdocs": 3.6, "q112_x10_50kdocs": 2.8,
        "q51_x10_50kdocs": 3.2, "q152_x10_50kdocs": 3.2,
        "q143_x10_50kdocs": 2.8}
bad = [n for n, bar in tier.items()
       if q.get(n) is None or (q[n] > bar and not fb(n))]
check("x10 heavy tier at/below round-19 bars (or fallback-marked)",
      not bad,
      ", ".join(f"{n}={q.get(n)}" for n in tier))

# ---- round-18 policy coherence bars ----
sweep_steal = cp.get("sweep_steal_sec")
dirty_bar = cp.get("dirty_bar_sec", 300)
check("calmer-prior fires only on a dirty sweep",
      not cpe or (sweep_steal is not None and sweep_steal > dirty_bar),
      f"{len(cpe)} entries at sweep_steal {sweep_steal}s")
max_rounds = cp.get("max_rounds", 3)
over = [n for n, e in list(stale.items()) + list(cpe.items())
        if e.get("rounds", 1) > max_rounds]
check("no fallback chain past max_rounds", not over, f"{over}")
print(f"     stale_expired this sweep: {b.get('stale_expired', [])}")
print(f"     calmer_prior_expired this sweep: {b.get('calmer_prior_expired', [])}")

print(f"\nstale entries: {len(stale)}: {sorted(stale)[:10]}")
print(f"calmer_prior entries: {len(cpe)}: {sorted(cpe)[:10]}")
print(f"regressions: {len(regs)}; causes: "
      + str(sorted(set(r['cause'].split(':')[0] for r in regs))))
print("box_sweep_delta:", env.get("box_sweep_delta"))
print("calm_reached:", json.dumps(env.get("qualification", {}).get("calm_reached")))
sub3 = [n for n in q if qual.get(n, 0) < 3]
print(f"entries <3 qualified: {len(sub3)} (of {len(q)}); fallback-covered: "
      f"{len([n for n in sub3 if fb(n)])}")
print("\n" + ("ALL CHECKS PASS" if not fails else f"FAILURES: {fails}"))
sys.exit(0 if not fails else 1)
