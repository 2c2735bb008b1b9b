#!/usr/bin/env python3
"""Classify a graft bench artifact: real regression vs host contention.

Reads the file artifact graft.Bench writes (SPARK_GRAFT_BENCH_OUT,
default target/bench.json) — which since round 6 records, per query,
the 1-minute system load average observed at the start of every timed
pass, plus per-pass host metadata — and prints one line per suspect
query so a noisy run can be interpreted WITHOUT a re-run:

- pass spread > 2x with load >= ~0.8*cpus on the slow pass(es)
  → CONTENTION: the host was busy; trust the min.
- pass spread > 2x on a quiet host
  → INVESTIGATE: spread came from somewhere else (GC, first-touch,
    a real intermittent regression) — isolate with
    SPARK_GRAFT_BENCH_ONLY=<query>.
- optionally, with a baseline artifact (--baseline), queries whose
  min regressed > 1.5x are listed with the loads seen this run.

Usage: python3 tools/bench_triage.py [bench.json] [--baseline prev.json]
"""
import json
import sys

args = [a for a in sys.argv[1:] if not a.startswith("--")]
path = args[0] if args else "target/bench.json"
baseline_path = None
if "--baseline" in sys.argv:
    baseline_path = sys.argv[sys.argv.index("--baseline") + 1]

d = json.load(open(path))
cpus = int(d.get("host", {}).get("cpus", 0)) or 32
busy = 0.8 * cpus
passes = d.get("passes", {})
loads = d.get("loads", {})

print(f"total={d['value']}s n={len(d['queries'])} cpus={cpus} "
      f"pass_loads={d.get('host', {}).get('load_pass_start')}")

suspects = 0
for q in sorted(passes):
    ts = [t for t in passes[q] if t >= 0]
    if len(ts) < 2 or min(ts) <= 0:
        continue
    spread = max(ts) / min(ts)
    if spread <= 2.0:
        continue
    suspects += 1
    ls = loads.get(q, [])
    slow_loads = [ls[i] for i, t in enumerate(passes[q])
                  if i < len(ls) and t > 2.0 * min(ts)]
    verdict = ("CONTENTION (trust the min)"
               if slow_loads and min(slow_loads) >= busy
               else "INVESTIGATE (quiet host — isolate with "
                    f"SPARK_GRAFT_BENCH_ONLY={q})")
    print(f"  {q}: passes={passes[q]} loads={ls} spread={spread:.1f}x "
          f"-> {verdict}")
if suspects == 0:
    print("  no query with pass spread > 2x — artifact is clean")

if baseline_path:
    b = json.load(open(baseline_path))
    print(f"vs baseline {baseline_path} (total {b['value']}s):")
    regressed = 0
    for q, t in sorted(d["queries"].items()):
        prev = b.get("queries", {}).get(q)
        if prev is None or prev <= 0 or t <= 0:
            continue
        if t / prev > 1.5:
            regressed += 1
            print(f"  {q}: {prev}s -> {t}s ({t / prev:.1f}x) "
                  f"loads={loads.get(q)}")
    if regressed == 0:
        print("  no query regressed > 1.5x")
