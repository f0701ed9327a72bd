#!/usr/bin/env bash
# The round-17 ANN frontier sweep (r16 verdict items #1/#2): recall@5 +
# cold build seconds per (corpus, nprobe law, centroid source) point, ONE
# point per fresh JVM (the r16 sweep-recycling discipline). Corpora are
# the two growth regimes: ScaleStress isometric dirs (new content — the
# regime whose recall decays under the shipped log law) and JitterEmb
# dirs (near-dup families — recall 1.00 at every r16 point). Laws: the
# shipped log (3+2b), sqrt-of-cells (3+c·2^ceil(b/2), candidate volume
# ~N^1.25), and a constant-fraction anchor (1/k of all cells — the
# quadratic-build corner, ×100 only: at ×300 its candidate sort alone is
# a ~10^10-row spill exercise that teaches nothing beyond the ×100
# anchor). Centroid sources: oblivious (shipped) vs trained k-means at
# the same cell count (placement measured independently of budget).
#
# Usage: tools/recall_frontier.sh <logfile> [point ...]
#   point = <dir>|<law>[|<centroids>]   e.g. '/tmp/graft_scale/x100|sqrt:2|trained'
#   With no points, runs the round-17 probe-LAW matrix (oblivious).
set -uo pipefail
LOG=${1:?usage: tools/recall_frontier.sh <logfile> [point ...]}
shift || true
if [ $# -gt 0 ]; then POINTS=("$@"); else POINTS=(
  '/tmp/graft_scale/x100|log'
  '/tmp/graft_scale/x100|sqrt:1'
  '/tmp/graft_scale/x100|sqrt:2'
  '/tmp/graft_scale/x100|frac:32'
  '/tmp/graft_scale/x300|log'
  '/tmp/graft_scale/x300|sqrt:1'
  '/tmp/graft_scale/x300|sqrt:2'
  '/tmp/graft_scale/j100|sqrt:2'
  '/tmp/graft_scale/j300|sqrt:2'
); fi
for p in "${POINTS[@]}"; do
  IFS='|' read -r dir law cent which <<< "$p"
  cent=${cent:-oblivious}
  which=${which:-ivf}
  echo "[frontier] $dir law=$law centroids=$cent which=$which (fresh JVM)" >&2
  # stderr goes to a per-point file and the exit status is checked: a
  # crashed probe JVM must leave a loud FAILED marker, not a silently
  # missing frontier point (r17 advisory — one j300 JVM died unseen).
  # $which is part of the point identity: ivf vs ivfpq on the same
  # dir/law/centroids must not overwrite each other's stderr (r18 ADVICE)
  ERRF="$LOG.$(echo "$dir|$law|$cent|$which" | tr '/|:' '___').stderr"
  if ! SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-24g} \
    tools/run_tool.sh graft.tools.RecallProbe "$dir" 997 "$law" "$which" "$cent" \
    2>"$ERRF" | grep '"law"' | tee -a "$LOG"; then
    echo "[frontier] FAILED $dir|$law|$cent|$which — stderr in $ERRF" | tee -a "$LOG" >&2
  fi
done
echo "[frontier] done — $LOG" >&2
