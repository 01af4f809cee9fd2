#!/usr/bin/env python3
"""Round-17 publication-quality checks over bench.json (the verdict's
'done' bars for the re-sweep): headline qualification depth, zero
0-qualified entries in the headline/layout families, zorder pair
ordering, stale-fallback accounting, regression causes, encode32k."""
import json, sys

b = json.load(open(sys.argv[1] if len(sys.argv) > 1 else "bench.json"))
q, qual = b["queries"], b["qualified_reps"]
stale = b.get("stale", {})
fails = []

def check(name, ok, detail):
    print(("PASS " if ok else "FAIL ") + name + ": " + detail)
    if not ok:
        fails.append(name)

h = b["headline"]
check("flagship>=4 steal-clean reps", h["qualified_reps_flagship"] >= 4,
      f'{h["qualified_reps_flagship"]} reps, value {h["value"]}')
check("x10>=4 steal-clean reps", h["qualified_reps_x10"] >= 4,
      f'{h["qualified_reps_x10"]} reps, {h["q06_x10_6Mrows"]}s = '
      f'{h["x10_vs_baseline_sf1"]}x baseline sf1')
check("gate<2x", h["x10_vs_baseline_sf1"] < 2.0, str(h["x10_vs_baseline_sf1"]))

fam = [n for n in q if n.startswith(("q06_", "q00_", "q275_"))]
thin = [n for n in fam if qual.get(n, 0) < 3 and n not in stale]
check("headline/layout families all >=3 reps or stale-marked", not thin,
      f"thin unmarked: {thin}" if thin else f"{len(fam)} entries covered")

zo, li = q.get("q06_zorder_2ndcol"), q.get("q06_linear_2ndcol")
check("zorder pair tie-or-better",
      zo is not None and li is not None and zo <= li * 1.15,
      f"zorder {zo} vs linear {li}")

zero = [n for n in q if qual.get(n, 0) == 0 and n not in stale]
check("zero 0-qualified unmarked entries", not zero, f"{zero}")

enc = q.get("q279_bpe_encode32k")
check("encode32k <= 0.7s", enc is not None and enc <= 0.7,
      f"{enc}s, {qual.get('q279_bpe_encode32k')} reps")
for n in ("q279_bpe_encode200", "q279_bpe_encode"):
    check(f"{n}>=3 reps or stale", qual.get(n, 0) >= 3 or n in stale,
          f"{qual.get(n)} reps")

regs = b.get("regressions", [])
unattr = [r["q"] for r in regs if "unattributed" in r["cause"]]
check("zero unattributed regressions", not unattr, f"{unattr}")

apply_t = q.get("q06_replica72M_apply_delta")
check("apply reflects codegen fix (<3s in-sweep)", apply_t is not None
      and apply_t < 3.0, f"{apply_t}s")

jo = q.get("q113_bucketed_join_only")
check("join-only probe present", jo is not None,
      f"{jo}s ({qual.get('q113_bucketed_join_only')} reps)")

print(f"\nstale entries: {len(stale)}: {sorted(stale)[:10]}")
print(f"regressions: {len(regs)}; causes: "
      + str(sorted(set(r['cause'].split(':')[0] for r in regs))))
env = b.get("env", {})
print("box_sweep_delta:", env.get("box_sweep_delta"))
print("calm_reached:", json.dumps(env.get("qualification", {}).get("calm_reached")))
sub3 = [n for n in q if qual.get(n, 0) < 3]
print(f"entries <3 qualified: {len(sub3)} (of {len(q)}); stale-covered: "
      f"{len([n for n in sub3 if n in stale])}")
print("\n" + ("ALL CHECKS PASS" if not fails else f"FAILURES: {fails}"))
