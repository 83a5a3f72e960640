#!/usr/bin/env python3
"""Aggregate the round-6 aligned-vs-legacy scaling A/B campaign files into
the BENCH/BASELINE.md table + medians. Flags neighbor-burst legs (apply
task-CPU far above the arm's boot norm) instead of averaging them in.

Usage: aggregate_ab_r06.py BENCH/scaling_r06_ab.jsonl BENCH/scaling_r06_ab2.jsonl
"""
import json, statistics, sys

rows = []
for path in sys.argv[1:]:
    for line in open(path):
        line = line.strip()
        if not line or not line.startswith('{'):
            continue
        d = json.loads(line)
        if d.get('metric') == 'scaling_leg_pair':
            rows.append(d)

rows.sort(key=lambda d: d['t'])

# burst flag: apply_cpu_sec_4n > 1.5x the arm's median (identical work per leg)
for kind in ('aligned', 'legacy'):
    cpus = [d['apply_cpu_sec_4n'] for d in rows
            if d['kind'] == kind and (d.get('apply_cpu_sec_4n') or 0) > 0]
    med = statistics.median(cpus) if cpus else None
    for d in rows:
        if d['kind'] == kind:
            c = d.get('apply_cpu_sec_4n') or 0
            d['burst'] = bool(med and c > 1.5 * med)

print("| # | arm | classify eff | apply T(2) | apply T(8) | apply eff raw | apply CPU(2)/CPU(8) | eff CPU-adj | note |")
print("|---|---|---|---|---|---|---|---|---|")
i = 0
for d in rows:
    i += 1
    if d['kind'] == 'narrow':
        print(f"| {i} | pure-CPU control | {d['classify_eff']:.3f} | — | — | — | — | — | no-shuffle ceiling |")
        continue
    note = 'FLAGGED neighbor burst — excluded' if d['burst'] else ''
    cpu = f"{d['apply_cpu_sec_n']:.0f} / {d['apply_cpu_sec_4n']:.0f}"
    adj = d['apply_eff_cpu_adj']
    print(f"| {i} | {d['kind']} | {d['classify_eff']:.3f} | {d['apply_sec_n']:.1f} s | "
          f"{d['apply_sec_4n']:.1f} s | {d['apply_eff']:.3f} | {cpu} | {adj:.3f} | {note} |")

def med(vals):
    return statistics.median(vals) if vals else float('nan')

print()
for kind in ('aligned', 'legacy'):
    ok = [d for d in rows if d['kind'] == kind and not d['burst']]
    print(f"{kind}: n={len(ok)}"
          f" raw_median={med([d['apply_eff'] for d in ok]):.3f}"
          f" cpu_adj_median={med([d['apply_eff_cpu_adj'] for d in ok]):.3f}"
          f" t8_median={med([d['apply_sec_4n'] for d in ok]):.1f}s"
          f" t2_median={med([d['apply_sec_n'] for d in ok]):.1f}s"
          f" raw_best={max(d['apply_eff'] for d in ok):.3f}")
narrow = [d['classify_eff'] for d in rows if d['kind'] == 'narrow']
print(f"narrow control: n={len(narrow)} median={med(narrow):.3f} "
      f"min={min(narrow):.3f} max={max(narrow):.3f}")
al = [d for d in rows if d['kind'] == 'aligned' and not d['burst']]
print("aligned raw/same-iteration-control pairs:",
      [f"{d['apply_eff']:.3f}" for d in al])
