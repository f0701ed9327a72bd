"""Regenerate SCALE.md's results table from a ScaleStress log.

Usage: python3 tools/scale_table.py /tmp/scale_rN.log
Prints the markdown table (x1/x10/x30/x100 seconds + ratios) and a
summary line; paste the table between the `| query |` header and the
blank line after `| **total** |` in SCALE.md. The ratio lines come from
the harness itself, so this script never recomputes them differently.
"""
import json
import sys

log = open(sys.argv[1]).read().splitlines()
runs = {}     # scale -> {query: sec}
ratios = {}   # scale -> {query: ratio}
totals = {}
for line in log:
    line = line.strip()
    if not line.startswith('{"scale"'):
        continue
    d = json.loads(line)
    if "queries" in d:
        runs[d["scale"]] = d["queries"]
        totals[d["scale"]] = d["total_sec"]
    elif "time_ratios_vs_x1" in d:
        ratios[d["scale"]] = d["time_ratios_vs_x1"]

order = list(runs["x1"].keys())
print("| query | x1 (s) | x10 (s) | x30 (s) | x100 (s) | ×10 | ×30 | ×100 |")
print("|---|---|---|---|---|---|---|---|")
for q in order:
    print(f'| {q} | {runs["x1"][q]:.3f} | {runs["x10"][q]:.3f} | '
          f'{runs["x30"][q]:.3f} | {runs["x100"][q]:.3f} | '
          f'{ratios["x10"][q]} | {ratios["x30"][q]} | {ratios["x100"][q]} |')
t = totals
r10, r30, r100 = t["x10"] / t["x1"], t["x30"] / t["x1"], t["x100"] / t["x1"]
print(f'| **total** | **{t["x1"]:.1f}** | **{t["x10"]:.1f}** | '
      f'**{t["x30"]:.1f}** | **{t["x100"]:.1f}** | '
      f'**{r10:.1f}** | **{r30:.1f}** | **{r100:.1f}** |')

vals = sorted(((q, ratios["x100"][q]) for q in order), key=lambda kv: -kv[1])
print("\ntop x100 ratios:", vals[:5], file=sys.stderr)
failed = [q for q in order if runs["x100"][q] < 0]
if failed:
    print("FAILED at x100:", failed, file=sys.stderr)
