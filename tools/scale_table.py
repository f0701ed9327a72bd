"""Regenerate SCALE.md's results table from a ScaleStress log.

Usage: python3 tools/scale_table.py /tmp/scale_rN.log
Prints the markdown table (per-scale seconds + ratios for whatever scales
the log contains) and summary/failure notes on stderr; paste the table
between the `| query |` header and the blank line after `| **total** |`
in SCALE.md. The ratio values come from the harness itself, so this
script never recomputes them differently.

A failed query is recorded by ScaleStress as -1.0 seconds and EXCLUDED
from that scale's total_sec — so totals across scales would silently
compare different query sets. This script refuses to print a total row
in that case and lists the failures instead.
"""
import json
import sys

log = open(sys.argv[1]).read().splitlines()
runs = {}     # scale -> {query: sec}
ratios = {}   # scale -> {query: ratio}
totals = {}
scale_order = []
for line in log:
    line = line.strip()
    if not line.startswith('{"scale"'):
        continue
    d = json.loads(line)
    if "queries" in d:
        runs[d["scale"]] = d["queries"]
        totals[d["scale"]] = d["total_sec"]
        scale_order.append(d["scale"])
    elif "time_ratios_vs_x1" in d:
        ratios[d["scale"]] = d["time_ratios_vs_x1"]

order = list(runs["x1"].keys())
mults = [s for s in scale_order if s != "x1"]
failed = sorted({q for s in scale_order for q in order if runs[s][q] < 0})

hdr = " | ".join(f"{s} (s)" for s in scale_order)
rat_hdr = " | ".join("×" + s[1:] for s in mults)
print(f"| query | {hdr} | {rat_hdr} |")
print("|---" * (1 + len(scale_order) + len(mults)) + "|")
for q in order:
    secs = " | ".join(f"{runs[s][q]:.3f}" if runs[s][q] >= 0 else "FAIL"
                      for s in scale_order)
    rats = " | ".join(f"{ratios[s][q]}" if ratios[s][q] >= 0 else "FAIL"
                      for s in mults)
    print(f"| {q} | {secs} | {rats} |")
if failed:
    print(f"NOT printing a total row: failed queries {failed} are excluded "
          f"from their scale's total_sec, so totals would compare different "
          f"query sets. Fix the failures and re-sweep.", file=sys.stderr)
else:
    t = totals
    secs = " | ".join(f"**{t[s]:.1f}**" for s in scale_order)
    rats = " | ".join(f"**{t[s] / t['x1']:.1f}**" for s in mults)
    print(f"| **total** | {secs} | {rats} |")

if mults:
    top = sorted(((q, ratios[mults[-1]][q]) for q in order),
                 key=lambda kv: -kv[1])
    print(f"top {mults[-1]} ratios:", top[:5], file=sys.stderr)
