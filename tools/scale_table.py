"""Regenerate SCALE.md's results table from one or more ScaleStress logs.

Usage: python3 tools/scale_table.py /tmp/scale_a.log [/tmp/scale_b.log ...]

With ONE log: per-scale seconds + the harness's own ratios, verbatim (this
script never recomputes a single sweep's ratios differently).

With SEVERAL logs (same-code sweeps): spill-heavy queries swing ±40%
between identical sweeps, so a one-shot number is weak evidence. Seconds
are reported as `min (med)` across sweeps per scale, and each ratio cell
carries the band of the PER-SWEEP harness ratios as `med [min-max]` — a
ratio only counts as reproduced when the whole band sits where the claim
needs it. Paste the table between the `| query |` header and the blank
line after `| **total** |` in SCALE.md.

A failed query is recorded by ScaleStress as -1.0 seconds and EXCLUDED
from that scale's total_sec — so totals across scales would silently
compare different query sets. This script refuses to print a total row
in that case and lists the failures instead. Incomplete logs (no x1 run,
or a scale missing a query present at x1 — e.g. an interrupted sweep)
produce a clear note, not a stack trace.
"""
import json
import statistics
import sys


def parse(path):
    """One log -> (runs: scale->{q:sec}, ratios: scale->{q:ratio},
    totals: scale->sec, scale_order, skipped: scale->set(q)).

    Lines may carry tmux/ANSI escape prefixes (pipe-pane capture); the JSON
    is located by substring, not line anchor. A `"skipped"` array records
    queries the harness excluded at that scale BY DESIGN (ScaleStress
    `maxMult` — declared super-linear baselines); they are rendered as
    by-design gaps, not failures."""
    runs, ratios, totals, scale_order, skipped = {}, {}, {}, [], {}
    for line in open(path, errors="replace").read().splitlines():
        i = line.find('{"scale"')
        if i < 0:
            continue
        d = json.JSONDecoder().raw_decode(line[i:])[0]
        if "queries" in d:
            sc = d["scale"]
            if sc in runs:
                # Per-scale-point JVM recycling (tools/sweep.sh, round 17)
                # re-runs x1 in every fresh JVM, so one log can carry the
                # same scale several times: merge repeats by per-query min
                # (the Bench min-of-N protocol; a -1 failure never beats a
                # clean run) and keep the smaller comparable-set total.
                for q, v in d["queries"].items():
                    old = runs[sc].get(q)
                    if old is None or old < 0 or (0 <= v < old):
                        runs[sc][q] = v
                totals[sc] = min(totals[sc], d["total_sec"])
                skipped[sc] |= set(d.get("skipped", []))
            else:
                runs[sc] = d["queries"]
                totals[sc] = d["total_sec"]
                scale_order.append(sc)
                skipped[sc] = set(d.get("skipped", []))
        elif "time_ratios_vs_x1" in d:
            ratios[d["scale"]] = d["time_ratios_vs_x1"]
    return runs, ratios, totals, scale_order, skipped


def fail(msg):
    print(f"incomplete log: {msg}", file=sys.stderr)
    sys.exit(1)


paths = sys.argv[1:]
if not paths:
    fail("no log files given")
sweeps = [parse(p) for p in paths]

# validate every sweep is complete and consistent before aggregating
for p, (runs, ratios, totals, scale_order, skipped) in zip(paths, sweeps):
    if "x1" not in runs:
        fail(f"{p} has no x1 run — sweep did not reach the base scale")
    base_qs = list(runs["x1"].keys())
    for s in scale_order:
        missing = [q for q in base_qs
                   if q not in runs[s] and q not in skipped.get(s, set())]
        if missing:
            fail(f"{p} scale {s} is missing queries present at x1 "
                 f"(interrupted sweep?): {missing}")
    for s in scale_order:
        if s != "x1" and s not in ratios:
            fail(f"{p} has a {s} run but no time_ratios_vs_x1 line for it "
                 f"(sweep interrupted before the summary)")

runs0, _, _, scale_order, skipped0 = sweeps[0]
order = list(runs0["x1"].keys())
for p, (runs, _, _, so, sk) in zip(paths, sweeps):
    if so != scale_order or list(runs["x1"].keys()) != order or sk != skipped0:
        fail(f"{p} covers different scales/queries/skips than {paths[0]} — "
             f"aggregate only same-shape sweeps")

mults = [s for s in scale_order if s != "x1"]
multi = len(sweeps) > 1
failed = sorted({q for runs, _, _, _, _ in sweeps
                 for s in scale_order for q in order
                 if q in runs[s] and runs[s][q] < 0})
# queries capped at some scale (by-design super-linear baselines): excluded
# from every scale's total so the total row compares one fixed query set
capped = sorted({q for s in scale_order for q in skipped0.get(s, set())})


def sec_cell(s, q):
    if q in skipped0.get(s, set()):
        return "—"
    vals = [runs[s][q] for runs, _, _, _, _ in sweeps]
    if any(v < 0 for v in vals):
        return "FAIL"
    if not multi:
        return f"{vals[0]:.3f}"
    return f"{min(vals):.3f} ({statistics.median(vals):.3f})"


def ratio_cell(s, q):
    if q in skipped0.get(s, set()):
        return "—"
    vals = [ratios[s][q] for _, ratios, _, _, _ in sweeps]
    if any(v < 0 for v in vals):
        return "FAIL"
    if not multi:
        return f"{vals[0]}"
    return (f"{statistics.median(vals):.1f} "
            f"[{min(vals):.1f}–{max(vals):.1f}]")


hdr = " | ".join(f"{s} (s)" + (" min (med)" if multi else "")
                 for s in scale_order)
rat_hdr = " | ".join("×" + s[1:] + (" med [band]" if multi else "")
                     for s in mults)
print(f"| query | {hdr} | {rat_hdr} |")
print("|---" * (1 + len(scale_order) + len(mults)) + "|")
for q in order:
    secs = " | ".join(sec_cell(s, q) for s in scale_order)
    rats = " | ".join(ratio_cell(s, q) for s in mults)
    print(f"| {q} | {secs} | {rats} |")
if failed:
    print(f"NOT printing a total row: failed queries {failed} are excluded "
          f"from their scale's total_sec, so totals would compare different "
          f"query sets. Fix the failures and re-sweep.", file=sys.stderr)
else:
    # recompute totals over the fixed uncapped query set (round-9-era harness
    # total_sec included capped queries at the scales where they DID run;
    # round-10 ScaleStress already excludes them, so for new logs this
    # recompute is an identity). Auxiliary *_build lines (the separately-swept
    # IVF index build) stay out of totals like in the harness — the serve-path
    # llm_ann_ivf entry is the one in the comparable set.
    def tot(runs, s):
        return sum(runs[s][q] for q in order
                   if q not in capped and not q.endswith("_build"))

    def tot_cell(s):
        vals = [tot(runs, s) for runs, _, _, _, _ in sweeps]
        if not multi:
            return f"**{vals[0]:.1f}**"
        return f"**{min(vals):.1f} ({statistics.median(vals):.1f})**"

    def tot_ratio(s):
        vals = [tot(runs, s) / tot(runs, "x1") for runs, _, _, _, _ in sweeps]
        if not multi:
            return f"**{vals[0]:.1f}**"
        return (f"**{statistics.median(vals):.1f} "
                f"[{min(vals):.1f}–{max(vals):.1f}]**")

    secs = " | ".join(tot_cell(s) for s in scale_order)
    rats = " | ".join(tot_ratio(s) for s in mults)
    print(f"| **total** | {secs} | {rats} |")
    if capped:
        print(f"total row excludes by-design-capped queries: {capped}",
              file=sys.stderr)

if mults:
    last = mults[-1]
    measurable = [q for q in order if q not in skipped0.get(last, set())]
    def med_ratio(q):
        vals = [ratios[last][q] for _, ratios, _, _, _ in sweeps]
        return statistics.median(vals) if all(v >= 0 for v in vals) else -1.0
    top = sorted(((q, med_ratio(q)) for q in measurable), key=lambda kv: -kv[1])
    label = f"median of {len(sweeps)} sweeps" if multi else "single sweep"
    print(f"top {last} ratios ({label}):", top[:5], file=sys.stderr)
